"""Shard-distribution analytics (reference O14/O15).

Re-expresses performance_analysis.py:186-237 (counts, percentages,
min/max/avg, imbalance factor) and generate_report.py:248-270
(coefficient of variation + quality buckets) as DataFrame aggregations
— partial+final hash aggregation, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_distribution(bucketed: DataFrame, shard_col: str = "shard_id") -> DataFrame:
    """Per-shard count + percentage of total (reference
    performance_analysis.py:199-215). Window over an unpartitioned
    frame is fine: the input is already one row per shard."""
    counts = bucketed.groupBy(shard_col).agg(F.count("*").alias("n_vectors"))
    total = Window.partitionBy()
    return (
        counts.withColumn(
            "pct", F.round(F.col("n_vectors") * 100.0 / F.sum("n_vectors").over(total), 6)
        )
        .orderBy(shard_col)
    )


def distribution_metrics(bucketed: DataFrame, shard_col: str = "shard_id") -> DataFrame:
    """Single-row global metrics: min/max/avg/stddev of per-shard
    counts, imbalance factor (max-min)/avg
    (performance_analysis.py:224-235) and CV = std/avg with the
    reference's quality thresholds (generate_report.py:261-268).
    Population stddev — numpy's np.std default, which the reference
    uses."""
    counts = bucketed.groupBy(shard_col).agg(F.count("*").alias("n"))
    m = counts.agg(
        F.min("n").alias("min_count"),
        F.max("n").alias("max_count"),
        F.avg("n").alias("avg_count"),
        F.coalesce(F.stddev_pop("n"), F.lit(0.0)).alias("std_count"),
    )
    cv = F.when(F.col("avg_count") > 0, F.col("std_count") / F.col("avg_count")).otherwise(F.lit(0.0))
    return m.select(
        "min_count",
        "max_count",
        F.round("avg_count", 6).alias("avg_count"),
        F.round("std_count", 6).alias("std_count"),
        F.round(
            F.when(
                F.col("avg_count") > 0,
                (F.col("max_count") - F.col("min_count")) / F.col("avg_count"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("imbalance_factor"),
        F.round(cv, 6).alias("cv"),
        F.when(cv < 0.1, F.lit("excellent"))
        .when(cv < 0.2, F.lit("good"))
        .when(cv < 0.3, F.lit("acceptable"))
        .otherwise(F.lit("uneven"))
        .alias("distribution_quality"),
    )
