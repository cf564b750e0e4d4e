"""As-of (temporal) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row with
``right.ts <= left.ts`` (backward direction, inclusive) within the same
key — the standard way to join events to the most recent quote/state
before them. The reference has no joins at all (SURVEY §2.2); this is
part of the extension surface a time-aware pipeline needs.

Spark-first implementation — **no per-row lookups, no pandas**:
tag and union both sides, sort each key's rows by (ts, right-first),
and carry the right side's payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key, O(n log n) per key, spill-safe — the shape
that survives 100 TB (a pandas ``merge_asof`` per group would pin
whole keys in one worker's memory; the window form streams).

Right rows must be unique per (key, ts) — pre-aggregate the right side
if not — which also makes the result deterministic (DuckDB's ASOF JOIN,
the oracle, has the same requirement for a well-defined answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: left columns + the right side's
    ``value_cols`` from the latest right row at-or-before each left
    row's timestamp (NULL when none, or when older than ``tolerance``).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]

    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )

    # within one timestamp, right rows sort first → inclusive (<=) semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in value_cols]
    carried_ts = F.last(
        F.when(F.col("_is_right") == 1, F.col("_ts")), ignorenulls=True
    ).over(w).alias("_c_ts")

    joined = (
        r.unionByName(l)
        .select("*", *carried, carried_ts)
        .filter(F.col("_is_right") == 0)
    )

    outs = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    if tolerance_seconds is None:
        vals = [F.col(f"_c_{c}").alias(c) for c in value_cols]
    else:
        in_tol = F.unix_micros("_ts") - F.unix_micros("_c_ts") <= tolerance_seconds * 1_000_000
        vals = [
            F.when(in_tol, F.col(f"_c_{c}")).alias(c) for c in value_cols
        ]
    return joined.select(*outs, *vals)
