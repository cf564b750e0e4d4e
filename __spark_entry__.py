"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All declared queries live in distributedvectordatabase_spark/catalog.py
— one entry per implemented operator from SURVEY.md §2, each generated
in both the Spark and DuckDB dialects from a shared template so the
two engines compute structurally identical queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributedvectordatabase_spark.catalog import build_catalog

_CATALOG = build_catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: batch exact kNN
    (20 self-queries × embeddings, k=10, squared-L2) via the Arrow
    partial-top-k scan — the reference engine's core operation."""
    return _CATALOG["knn_l2"].run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.run for name, q in _CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted (rows-only check) only
    for ann_ivf_recall (KMeans init genuinely not SQL-expressible — its
    accuracy contract is the pytest recall-sweep invariants).
    pca_project_16 gained a full hash oracle in r8: an independent
    NumPy eigh fit inlined as DOUBLE[] literals, projected by DuckDB
    itself (catalog._pca_oracle)."""
    return {name: q.oracle for name, q in _CATALOG.items() if q.oracle is not None}
