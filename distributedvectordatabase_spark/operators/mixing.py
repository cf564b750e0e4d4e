"""Deterministic weighted corpus mixing (per-source up/down-sampling).

The reference has no data-curation surface; this operator is part of
the north-star LLM-pipeline extension (SURVEY §2.5): given per-source
mixture *rates*, emit the epoch-expanded training corpus a sampler
would feed a trainer. Rate semantics follow how production mixtures
are specified (epochs per source):

- rate 2.0  -> every document appears exactly twice (epochs 0, 1)
- rate 2.5  -> twice, plus a deterministic 50% sample as epoch 2
- rate 0.25 -> a deterministic 25% sample (epoch 0 only)
- rate 0.0  -> the source is dropped

Determinism is the design constraint: the keep/drop decision for the
fractional epoch is a content-free md5 over ``(id, epoch, salt)`` —
no RNG, no ``rand()`` seed that shifts with partitioning, no
partition-index sensitivity. The same (corpus, rates, salt) produces
the same mixed corpus on 1 executor or 1000, which is what makes
training runs reproducible and incremental re-mixes diffable.

Scale shape: the whole operator is a map-side ``explode`` of a
per-row epoch sequence plus a scalar filter — zero shuffles, zero
collects, streams through the scan at any corpus size. The rate
lookup is a literal ``CASE``/``map`` expression (mixtures are
O(10-100) sources), never a join.
"""

from __future__ import annotations

import math
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.text import SPARK, hash64

# Denominator of the hash-uniform grid. 1e6 keeps u on the same 1e-6
# lattice the catalog's _qz canonicalization uses; k/1e6 is one
# correctly-rounded IEEE division in every engine, so thresholds
# compare identically everywhere.
_U_GRID = 1_000_000


def _epoch_u(id_col: str, salt: str) -> Column:
    """Uniform-in-[0,1) hash of (id, epoch, salt) on the 1e-6 grid.

    md5-based (functions.text.hash64) rather than xxhash64 so the
    DuckDB oracle can reproduce it byte-for-byte; the 60-bit value is
    unbiased mod 1e6 to ~1e-13.
    """
    h = hash64(
        f"concat(cast({id_col} as string), ':', cast(epoch as string), ':', '{salt}')",
        SPARK,
    )
    return F.expr(f"({h} % {_U_GRID}) / cast({_U_GRID} as double)")


def mix_corpus(
    df: DataFrame,
    rates: dict[str, float],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Epoch-expand ``df`` according to per-source mixture rates.

    Returns the input columns plus an ``epoch`` int column; a document
    with rate r appears floor(r) times unconditionally and once more
    with probability frac(r), decided by the deterministic hash above.

    ``rates`` maps ``source_col`` values to rates (>= 0); sources not
    listed get ``default_rate``. Rates are quantized to the 1e-6 grid
    (the hash-uniform resolution — finer fractions would silently
    truncate).
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("mixture rates must be >= 0")

    def parts(r: float) -> tuple[int, float]:
        grid = round(r * _U_GRID) / _U_GRID
        full = math.floor(grid)
        return full, grid - full

    rate_parts = {s: parts(r) for s, r in rates.items()}
    d_full, d_frac = parts(default_rate)

    def mapped(py_of_rate, default_val) -> Column:
        pairs = chain.from_iterable(
            (F.lit(s), F.lit(py_of_rate(p))) for s, p in rate_parts.items()
        )
        m = F.create_map(*pairs) if rate_parts else None
        looked = m[F.col(source_col)] if m is not None else F.lit(None)
        return F.coalesce(looked, F.lit(default_val))

    full = mapped(lambda p: p[0], d_full)
    frac = mapped(lambda p: p[1], d_frac)
    n_epochs = full + F.when(frac > 0, F.lit(1)).otherwise(F.lit(0))

    # Guarded sequence: sequence(0, -1) in Spark is the *descending*
    # [0, -1], so rate 0 must produce an empty array, not two epochs.
    epochs = F.when(
        n_epochs > 0, F.sequence(F.lit(0), (n_epochs - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))

    out = df.withColumn("epoch", F.explode(epochs))
    keep = (F.col("epoch") < full) | (_epoch_u(id_col, salt) < frac)
    return out.where(keep)


def stratified_sample(
    df: DataFrame,
    k: int,
    *,
    strata_cols: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    salt: str = "strat",
    prefilter: bool | None = None,
    prefilter_safety: float = 4.0,
    weight_col: str | None = None,
) -> DataFrame:
    """Exactly ``min(k, n_stratum)`` rows per stratum, deterministically.

    Rows rank within each stratum by the (id, salt) grid hash (ties
    broken by id, so the sample is total-ordered and reproducible
    across engines, runs, and cluster layouts — ``TABLESAMPLE`` and
    ``rand(seed)`` are neither). Output adds ``sample_rank`` (1-based
    within the stratum).

    ``id_col`` must uniquely identify rows (it is both the rank
    tie-break and the joinback key).

    Scale shape: the ranking decision needs only (strata, id) — so the
    window runs on that *narrow* projection (Parquet column-pruning
    skips the payload columns entirely) and the winners join back to
    the full table, which is scanned once with no shuffle (the winner
    side is O(strata · k) rows — AQE broadcasts it). Never shuffles a
    payload byte; at 1M × ~500 B local docs that's timing-neutral
    (the avoided shuffle was already page-cache cheap, BASELINE.md)
    but it is the form that survives multi-KB documents and real
    network shuffle.

    On top of that, ``prefilter`` (the default) shrinks the *ranked*
    row count too: because the hash is uniform, the k winners of a
    stratum of n rows almost surely sit below ``safety * k / n`` on
    the u grid, and that predicate keeps a prefix of the u-order — so
    ranking only rows with ``u <= safety * k / n`` (per-stratum n from
    a cheap count-aggregate, broadcast back) is *provably exact
    whenever enough survivors exist*, which one more count verifies;
    any shortfall (P ≈ Binomial(n, ck/n) < k — vanishing at safety 4)
    falls back to the full narrow window for correctness. Rank-shuffle
    rows drop from O(table) to O(strata · safety · k) — decisive when
    the narrow projection alone is still terabytes.

    ``weight_col`` switches to probability-proportional-to-weight
    order sampling (Ohlsson's *sequential Poisson sampling*, the
    order-sampling sibling of Efraimidis-Spirakis): each row's rank
    key becomes ``u / w`` and the k SMALLEST keys win, so a row with
    twice the weight is ~twice as likely to be drawn — the shape of
    mixture sampling where documents carry quality weights. The key
    is deliberately ``u / w`` (one correctly-rounded IEEE division of
    engine-identical operands) rather than the E-S ``u^(1/w)`` form,
    whose pow/log evaluation is not bit-reproducible across engines —
    the two induce the same inclusion ORDER family, and u/w keeps the
    sample oracle-exact. Rows with NULL or non-positive weight are
    excluded (weight 0 = never sampled, mirroring mix rate 0). The
    prefilter stays provably exact: survivors keep ``u <= t·w`` with
    ``t = safety·k / Σw`` (a key-prefix, expected safety·k rows), and
    the same shortfall count falls back to the full window.
    """
    if k <= 0:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    u = (
        F.pmod(
            F.expr(hash64(f"concat(cast({id_col} as string), ':', '{salt}')", SPARK)),
            F.lit(_U_GRID),
        )
        / F.lit(float(_U_GRID))
    ).alias("_u")
    if weight_col is not None:
        df = df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        key = (F.col("_u") / F.col(weight_col).cast("double")).alias("_key")
        narrow = df.select(*strata_cols, id_col, weight_col).withColumn(
            "_u", u
        ).withColumn("_key", key)
        w = Window.partitionBy(*strata_cols).orderBy("_key", id_col)
    else:
        narrow = df.select(*strata_cols, id_col).withColumn("_u", u)
        w = Window.partitionBy(*strata_cols).orderBy("_u", id_col)

    def winners_of(pool: DataFrame) -> DataFrame:
        return (
            pool.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k)
            .select(id_col, "sample_rank")
        )

    pool, cached = narrow, None
    if prefilter is not False:
        aggs = [F.count("*").alias("_n")]
        if weight_col is not None:
            aggs.append(F.sum(F.col(weight_col).cast("double")).alias("_sw"))
        counts = df.groupBy(*strata_cols).agg(*aggs)
        if weight_col is not None:
            # survivors keep u <= t·w (⇔ key = u/w <= t): a prefix of
            # the key order, expected safety·k rows per stratum
            t = F.lit(prefilter_safety) * F.lit(float(k)) / F.col("_sw")
            keep = F.col("_u") <= t * F.col(weight_col).cast("double")
        else:
            thresh = F.least(
                F.lit(1.0), F.lit(prefilter_safety) * F.lit(float(k)) / F.col("_n")
            )
            keep = F.col("_u") <= thresh
        survivors = (
            narrow.join(F.broadcast(counts), list(strata_cols))
            .where(keep)
            .cache()
        )
        # Shortfall check LEFT-joins the full per-stratum counts against
        # the survivor counts: a stratum whose rows ALL landed above the
        # threshold has no survivor group at all (P ≈ e^(-safety·k) per
        # stratum), and grouping survivors alone would silently drop it.
        surv_counts = survivors.groupBy(*strata_cols).agg(
            F.count("*").alias("_m")
        )
        short = (
            counts.join(surv_counts, list(strata_cols), "left")
            .where(
                F.coalesce(F.col("_m"), F.lit(0))
                < F.least(F.lit(k), F.col("_n"))
            )
            .limit(1)
            .count()
        )
        # shortfall is the vanishing-probability path, kept for
        # exactness (not silently approximate): rank the full narrow
        # projection instead
        if short:
            survivors.unpersist()
        else:
            pool, cached = survivors.drop("_n", "_sw"), survivors

    winners = winners_of(pool)
    if cached is not None:
        # Materialize the O(strata·k) winner set eagerly so the cached
        # survivor projection can be released now instead of leaking in
        # executor storage for the session's lifetime.
        winners = winners.localCheckpoint(eager=True)
        cached.unpersist()
    return df.join(winners, id_col)


def mixture_report(
    df: DataFrame,
    mixed: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-source audit of a mix: input size, output size, achieved
    rate (out/in on the 1e-6 grid), epochs used, and optionally the
    summed weight column (e.g. token counts) in the output.

    Sources dropped by rate 0 still appear (docs_out = 0): a mixture
    audit must show what was excluded, not just what survived. Two
    tiny aggregates plus a broadcast join of O(n_sources) rows.
    """
    inp = df.groupBy(source_col).agg(F.count(id_col).alias("docs_in"))
    aggs = [
        F.count("*").alias("docs_out"),
        (F.max("epoch") + F.lit(1)).alias("epochs_used"),
    ]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("long").alias("weight_out"))
    got = mixed.groupBy(source_col).agg(*aggs)
    joined = inp.join(F.broadcast(got), source_col, "left")
    fills: dict[str, int] = {"docs_out": 0, "epochs_used": 0}
    if weight_col is not None:
        fills["weight_out"] = 0
    rate = F.floor(
        F.col("docs_out") / F.col("docs_in") * F.lit(float(_U_GRID)) + F.lit(0.5)
    ) / F.lit(float(_U_GRID))
    return joined.fillna(fills).withColumn("rate_achieved", rate)
