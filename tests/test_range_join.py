"""time_range_join: exactness vs a naive inequality join, boundary
inclusivity, key isolation, no duplicate pairs from bucket expansion."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.range_join import time_range_join


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, 10, ts(0)),
        (1, 11, ts(299)),   # 299 s after 10 → within 300 s
        (1, 12, ts(300)),   # exactly 300 s after 10 → inclusive boundary
        (1, 13, ts(601)),   # 301 s after 12 → outside
        (2, 20, ts(0)),     # other key, same times — must not pair with k=1
        (2, 21, ts(100)),
    ]
    return spark.createDataFrame(rows, schema="k long, eid long, ts timestamp")


def test_matches_naive_inequality_join(spark, events):
    got = {
        (r.eid, r.eid_r)
        for r in time_range_join(events, events, on=["k"], gap_seconds=300)
        .filter(F.col("eid") < F.col("eid_r"))
        .collect()
    }
    a, b = events.alias("a"), events.alias("b")
    want = {
        (r[0], r[1])
        for r in a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.eid") < F.col("b.eid"))
            & (
                F.abs(F.unix_micros("a.ts") - F.unix_micros("b.ts"))
                <= 300 * 1_000_000
            ),
        )
        .select(F.col("a.eid"), F.col("b.eid"))
        .collect()
    }
    assert got == want
    assert (10, 12) in got  # inclusive boundary (exactly 300 s)
    assert (12, 13) not in got  # 301 s apart
    assert all(not (x // 10 == 1 and y // 10 == 2) for x, y in got)  # key isolation


def test_no_duplicate_pairs_from_expansion(spark, events):
    pairs = time_range_join(events, events, on=["k"], gap_seconds=300).select(
        "eid", "eid_r"
    )
    assert pairs.count() == pairs.distinct().count()
