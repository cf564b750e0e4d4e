"""Bucketed managed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of repeated star-schema joins is the
exchange: every ``orders ⋈ lineitem`` re-shuffles both fact tables on
the join key. Spark's native bucketing (``bucketBy`` + ``saveAsTable``,
no Hive required) persists each table pre-hash-partitioned on its key;
two tables bucketed on the same key with compatible bucket counts join
with **zero Exchange** — the SortMergeJoin reads co-located buckets
directly. The write pays the shuffle once; every subsequent join is
scan + merge.

This generalizes what the vector store does for kNN (LSH-bucketed
Parquet ≙ hash-bucketed fact table) to the relational surface.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a managed Parquet table bucketed (and
    optionally sorted) on ``key``; returns the bucketed table handle.

    Joins between tables bucketized on the same key (equal bucket
    counts, or one a multiple of the other with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) plan without
    a shuffle on either side.
    """
    # idempotent across crashed sessions: a managed-table location left
    # behind by a dead session blocks saveAsTable even after DROP TABLE
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    shutil.rmtree(loc, ignore_errors=True)

    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True if the join plan contains no Exchange (the bucketed-join
    guarantee). Uses the pre-AQE formatted plan, where a bucketed SMJ
    shows both sides scanning ``SelectedBucketsCount`` directly."""
    from distributedvectordatabase_spark.plans import physical_plan

    return "Exchange" not in physical_plan(joined)
