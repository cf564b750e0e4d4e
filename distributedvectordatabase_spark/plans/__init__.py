"""Physical-plan introspection (scale guardrails).

The reference has no optimizer to inspect (SURVEY §4); here the
optimizer IS the engine, so plan shape is part of the contract: a kNN
that stops pruning partitions or a join that stops broadcasting is a
100× regression at 100 TB even though every correctness test stays
green. These helpers read the formatted physical plan so tests can pin
the shapes.
"""

from distributedvectordatabase_spark.plans.inspect import (  # noqa: F401
    physical_plan,
    scan_read_schema,
    scan_pushed_filters,
    scan_partition_filters,
    has_take_ordered,
    has_broadcast,
    codegen_stage_count,
)
