"""Time-range join — inequality join made shuffle-joinable.

``left ⋈ right ON key AND |left.ts - right.ts| <= gap`` is a theta
join; planned naively it is a per-key cross product. The scale form is
the classic bucket trick: bucket timestamps into windows of width
``gap``; any qualifying pair's buckets differ by at most 1, so
expanding ONE side to (b-1, b, b+1) turns the predicate into an
equi-join on (key, bucket) + an exact residual filter. Work is
proportional to pairs within ±1 bucket (≈ 3× the true candidates),
never to the per-key cross product, and the join shuffles on
(key, bucket) — skew-safe for hot keys with spread timestamps.

The reference has no joins at all (SURVEY §2.2); this rounds out the
temporal-join family next to operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    gap_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of rows within ``gap_seconds`` of each other (|Δt| ≤
    gap, inclusive) sharing the ``on`` keys. Right-side non-key columns
    come back suffixed. Exact — the bucket expansion only bounds the
    candidate set; the residual filter applies the true predicate."""
    gap_us = gap_seconds * 1_000_000

    l = left.withColumn("_lus", F.unix_micros(F.col(left_ts)))
    r = right.withColumn("_rus", F.unix_micros(F.col(right_ts)))
    r = r.select(
        *on,
        "_rus",
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in set(on)
        ],
        F.floor(F.col("_rus") / gap_us).cast("long").alias("_bucket"),
    )
    l = l.select(
        "*",
        F.explode(
            F.array(
                F.floor(F.col("_lus") / gap_us) - 1,
                F.floor(F.col("_lus") / gap_us),
                F.floor(F.col("_lus") / gap_us) + 1,
            )
        ).alias("_bucket"),
    )
    joined = l.join(r, on=[*on, "_bucket"]).filter(
        F.abs(F.col("_lus") - F.col("_rus")) <= gap_us
    )
    return joined.drop("_bucket", "_lus", "_rus")
