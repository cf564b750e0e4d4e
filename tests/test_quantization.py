"""The shared q6 floor-round quantization rule (r11 hoist, VERDICT r10
"What's wrong" #3): ONE definition in functions/text.py, with every
call site — the catalog SQL/DataFrame macros, operators/gopher.py,
operators/substring_dedup.py — pinned to it so a future quantum change
cannot drift a gate out of sync with the operators pinned against it.
"""

from __future__ import annotations

import duckdb
import pytest

from distributedvectordatabase_spark import catalog
from distributedvectordatabase_spark.functions import text as T
from distributedvectordatabase_spark.operators import gopher

# values chosen to straddle representability + half-up boundaries
BOUNDARY = [0.0, 1.0 / 3.0, 0.1234565, 0.1234575, 0.9999995, 2.5e-7,
            -0.1234565, 1.6180339887, 123456.789012345]


def test_call_sites_share_one_definition():
    # gopher imports the shared helper under its historical local name
    assert gopher._q6 is T.q6_col
    # the catalog macros delegate (same rendered SQL / same python value)
    assert catalog._qz("x") == T.q6_sql("x")
    assert catalog._qz("x", 2) == T.q6_sql("x", 2)
    for v in BOUNDARY:
        assert catalog._qz_py(v) == T.q6_py(v)


def test_substring_dedup_uses_shared_helper():
    import inspect

    src = inspect.getsource(
        __import__(
            "distributedvectordatabase_spark.operators.substring_dedup",
            fromlist=["substring_stats"],
        )
    )
    assert "q6_col" in src
    # no private re-definition of the quantum anywhere in the module
    assert "1000000.0" not in src


@pytest.mark.parametrize("scale", [2, 6])
def test_three_twins_agree_bitwise(spark, scale):
    """q6_sql (Spark dialect), q6_sql (DuckDB dialect), q6_col and
    q6_py all produce the identical double on boundary inputs."""
    from pyspark.sql import functions as F

    py = [T.q6_py(v, scale) for v in BOUNDARY]

    df = spark.createDataFrame([(v,) for v in BOUNDARY], "x double")
    got_col = [r[0] for r in df.select(T.q6_col("x", scale)).collect()]
    got_sql = [r[0] for r in df.select(F.expr(T.q6_sql("x", scale))).collect()]

    con = duckdb.connect()
    got_duck = [
        con.sql(f"SELECT {T.q6_sql(repr(v) + '::DOUBLE', scale)}").fetchone()[0]
        for v in BOUNDARY
    ]
    con.close()

    assert got_col == py
    assert got_sql == py
    assert got_duck == py
