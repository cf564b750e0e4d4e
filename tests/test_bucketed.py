"""Bucketed co-located joins: same results as plain joins, but the
plan has no Exchange on either side — the shuffle was paid once at
write time."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.plans import physical_plan
from distributedvectordatabase_spark.sources.bucketed import bucketize, join_is_shuffle_free
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    orders = load_table(spark, "orders", SF_SMALL).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, "lineitem", SF_SMALL).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    bo = bucketize(spark, orders, "b_orders", "o_orderkey", buckets=8)
    bl = bucketize(
        spark,
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        buckets=8,
    )
    return bo, bl


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    bo, bl = bucketed_pair
    # force the merge-join path: at this toy size Spark would otherwise
    # broadcast (a BroadcastExchange), hiding the co-location guarantee
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = physical_plan(joined)
        assert join_is_shuffle_free(joined), plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join on raw Parquet reads shuffles both sides."""
    orders = load_table(spark, "orders", SF_SMALL).select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, "lineitem", SF_SMALL).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    # defeat broadcast so the comparison is shuffle-vs-bucketed, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(lineitem, "o_orderkey")
        assert "Exchange" in physical_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match_plain(spark, bucketed_pair):
    bo, bl = bucketed_pair
    got = (
        bo.join(bl, "o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
        )
        .first()
    )
    orders = load_table(spark, "orders", SF_SMALL)
    lineitem = load_table(spark, "lineitem", SF_SMALL)
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
        )
        .first()
    )
    assert (got.n, got.q) == (want.n, want.q)
