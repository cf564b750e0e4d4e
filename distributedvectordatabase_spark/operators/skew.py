"""Skew-resilient aggregation (salting).

The reference has no aggregation framework at all (SURVEY §2.2); at
100 TB the failure mode it never hits is a heavy-hitter group key — one
reduce task owning a whole key's rows while 999 executors idle. Spark's
map-side partial aggregation already defuses skew for algebraic
aggregates; ``salted_aggregate`` is the explicit two-phase form for the
cases partials don't cover well (very high-cardinality partial maps, or
a downstream that needs the exchange keyed by (key, salt) — e.g. a
skewed join built on the aggregated side).

Phase 1 groups by (keys…, salt) where salt = hash(all columns) % B, so
one hot key fans out over B reduce tasks; phase 2 re-aggregates the B
partial rows per key. Exact for decomposable aggregates (sum, count,
min, max) — results are identical to a plain groupBy, which is what the
catalog's oracle checks.

AQE's skew-join splitting (enabled in session.py) covers the join-side
story; this covers the aggregation side explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# phase-1 partial → phase-2 merge for each supported aggregate
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps output column → (agg, input column), e.g.
    ``{"n": ("count", "*"), "total": ("sum", "value")}``. Exact for
    sum/count/min/max (decomposable); identical results to
    ``df.groupBy(keys).agg(...)`` by construction.
    """
    unsupported = {a for a, _ in aggs.values()} - set(_MERGES)
    if unsupported:
        raise ValueError(f"non-decomposable aggregates: {sorted(unsupported)}")

    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % salt_buckets).alias("_salt")

    def phase1(agg: str, col: str) -> Column:
        if agg == "count":
            return F.count("*") if col == "*" else F.count(col)
        return getattr(F, agg)(col)

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[phase1(a, c).alias(out) for out, (a, c) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_MERGES[a](out).alias(out) for out, (a, _) in aggs.items()]
    )
