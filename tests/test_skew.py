"""salted_aggregate: identical results to plain groupBy on a corpus
with a deliberate heavy-hitter key, and rejection of non-decomposable
aggregates."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.skew import salted_aggregate


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key owning 90% of rows + a long tail
    hot = spark.range(9000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 97)).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_matches_plain_groupby(spark, skewed):
    got = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in salted_aggregate(
            skewed,
            keys=["k"],
            aggs={"n": ("count", "*"), "total": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
            salt_buckets=8,
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.lo, r.hi)
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want
    assert got["hot"][0] == 9000


def test_salting_actually_fans_out(spark, skewed):
    """The hot key's phase-1 rows must land in multiple salt buckets."""
    salted = skewed.withColumn(
        "_salt", F.abs(F.hash(*[F.col(c) for c in skewed.columns])) % 8
    )
    n_buckets = (
        salted.filter(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_buckets > 1


def test_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(skewed, keys=["k"], aggs={"a": ("avg", "v")})
