"""asof_join unit tests: inclusive tie semantics, no-match NULLs,
tolerance windows, per-key isolation."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(10), "b"), (1, ts(2), "c"), (2, ts(7), "d"), (3, ts(9), "e")],
        schema="k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(5), 50.0), (1, ts(8), 80.0), (2, ts(1), 10.0)],
        schema="k long, ts timestamp, v double",
    )
    return left, right


def test_backward_inclusive_semantics(spark, frames):
    left, right = frames
    out = {r.tag: r.v for r in asof_join(left, right, on=["k"]).collect()}
    assert out["a"] == 50.0  # ts(5) matches right ts(5) — inclusive
    assert out["b"] == 80.0  # latest at-or-before ts(10)
    assert out["c"] is None  # nothing at-or-before ts(2) for k=1
    assert out["d"] == 10.0  # k=2 matches its own side only
    assert out["e"] is None  # k=3 has no right rows at all


def test_left_rows_and_columns_preserved(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["k"])
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_tolerance_cuts_stale_matches(spark, frames):
    left, right = frames
    out = {
        r.tag: r.v
        for r in asof_join(left, right, on=["k"], tolerance_seconds=2).collect()
    }
    assert out["a"] == 50.0  # gap 0 ≤ 2
    assert out["b"] == 80.0  # gap 2 ≤ 2
    assert out["d"] is None  # gap 6 > 2 → stale, nulled
