"""Z-order (Morton-curve) clustering for multi-dimensional data
skipping.

North-star layout surface (absent in the reference, which shards on a
single LSH bucket key — shard_node.py's one-dimensional layout): at
100 TB, scan cost is decided by how many parquet files / row groups a
predicate can SKIP via min-max statistics. A layout sorted on one
column skips perfectly on that column and not at all on others; a
Z-order layout interleaves the bits of several bucketed columns so a
selective box predicate on ANY subset of them prunes — the same trick
Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's mortonEncode apply.

Spark-first: the Morton key is a pure codegen expression (shiftright /
bitwiseAND / shiftleft / sum — whole-stage codegen, no UDF), the
layout move is one ``repartitionByRange(zkey)`` (Spark samples range
boundaries — equi-depth output files even on skewed keys) plus a
``sortWithinPartitions`` so row groups WITHIN each file are also
tight. Cost at scale: exactly one shuffle of the table, paid once at
write time; every later scan with a predicate on any Z-ordered column
reads only the overlapping files (verified against parquet footer
min-max stats in tests/test_zorder.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bucket(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Linear min-max bucketing of ``col`` into [0, 2^bits): the rank
    proxy Morton interleaving needs. Stats come in as columns (one
    broadcast row from an ``agg``), so the whole thing stays one scan +
    one tiny crossJoin. Degenerate range (min == max) maps to 0."""
    n = 1 << bits
    span = cmax.cast("double") - cmin.cast("double")
    scaled = F.floor((col.cast("double") - cmin.cast("double")) * float(n) / span)
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(n - 1))
    ).cast("long")


def morton_key(bucketed: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each (already-bucketed,
    [0, 2^bits)) column: column i contributes its bit b at output
    position ``b * n + i``. Disjoint positions, so the combine is a
    plain sum — one flat codegen expression, no UDF."""
    n = len(bucketed)
    if n < 1:
        raise ValueError("morton_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows a signed 64-bit key")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(1), b * n + i)
        for i, c in enumerate(bucketed)
        for b in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8, key_col: str = "zkey") -> DataFrame:
    """Append a Morton key over ``cols`` (numeric), min-max bucketed to
    ``bits`` bits each. Two jobs: one tiny stats agg (2·|cols| scalars,
    broadcast), one scan that computes the key inline."""
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    bucketed = [
        minmax_bucket(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits)
        for c in cols
    ]
    return with_stats.withColumn(key_col, morton_key(bucketed, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_files: int,
    bits: int = 8,
) -> DataFrame:
    """Return ``df`` physically arranged along the Z-curve: range-
    partitioned into ``num_files`` splits on the Morton key (sampled
    boundaries → equi-depth files even under skew) and sorted within
    each, so both file-level AND row-group-level min-max stats are
    tight on every Z-ordered column. Write the result with
    ``.write.parquet(...)`` to materialize the layout."""
    keyed = zorder_key(df, cols, bits=bits)
    return (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
    )
