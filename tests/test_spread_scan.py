"""r11 scan-parallelism floor (sources/tables._spread_scan): the driver
testdata is single-file/single-row-group parquet, so without a spread
the scan stage runs on one core. The opt-in ``load_table(spread=True)``
repartitions to the session's parallelism — these tests pin that it (a)
changes no rows, (b) actually raises partition count on under-split
inputs, (c) stays a no-op for tiny dimension tables, and (d) the
default path's plan is untouched (no exchange added to the ~50 queries
that don't opt in)."""

from __future__ import annotations

import os

import pytest

from distributedvectordatabase_spark.sources.tables import (
    _MIN_ROWS_PER_SPLIT,
    _parquet_layout,
    load_table,
)

SF = "/root/testdata/sf0.01"


def test_spread_preserves_rows(spark):
    plain = load_table(spark, "documents", SF)
    spread = load_table(spark, "documents", SF, spread=True)
    a = sorted(tuple(r) for r in plain.select("doc_id", "text").collect())
    b = sorted(tuple(r) for r in spread.select("doc_id", "text").collect())
    assert a == b


def test_spread_raises_partition_count(spark):
    # rows derived from the actual parquet footer, not a hard-coded
    # count, so regenerated testdata at another size stays meaningful
    # (ADVICE r11); a local[1] session can't demonstrate a raise at all
    if spark.sparkContext.defaultParallelism <= 1:
        pytest.skip("defaultParallelism == 1: no spread target to hit")
    _splits, rows = _parquet_layout(os.path.join(SF, "documents.parquet"))
    spread = load_table(spark, "documents", SF, spread=True)
    n = spread.rdd.getNumPartitions()
    target = min(
        spark.sparkContext.defaultParallelism,
        max(1, rows // _MIN_ROWS_PER_SPLIT),
    )
    assert n == target and n > 1


def test_spread_noop_for_tiny_dimension_tables(spark):
    # region has 5 rows: rows // _MIN_ROWS_PER_SPLIT == 0 -> target 1,
    # which the 1-row-group layout already satisfies -> no repartition
    spread = load_table(spark, "region", SF, spread=True)
    assert (
        "Repartition"
        not in spread._jdf.queryExecution().logical().toString()
    )


def test_default_path_plan_unchanged(spark):
    plain = load_table(spark, "documents", SF)
    assert (
        "Repartition" not in plain._jdf.queryExecution().logical().toString()
    )
