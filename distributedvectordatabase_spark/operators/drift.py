"""Embedding / feature drift monitoring between two corpus snapshots.

North-star surface (absent in the reference, which has no notion of
corpus health over time): a production training-data pipeline
re-embeds, re-crawls, and re-ingests continuously — before a new
snapshot feeds training or serving, you want to know whether its
FEATURE DISTRIBUTION moved. The standard monitors:

- **PSI** (population stability index) per embedding dimension:
  fixed-width bins over the pooled min-max range, Laplace-smoothed
  proportions, ``Σ (p_cur − p_ref) · ln(p_cur / p_ref)``. The usual
  reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
- **SMD** (standardized mean difference) per dimension:
  ``(μ_cur − μ_ref) / sqrt((σ²_ref + σ²_cur) / 2)`` — catches pure
  location shifts PSI's coarse bins can blur.

Spark-first and scale-shaped: one ``posexplode`` of the vector column
(N·d skinny rows that die into the aggregations), one groupBy for the
per-dimension moments, one groupBy on (dim, bin) for the histograms —
all map-side-combinable, shuffle O(d · bins), never O(rows). No UDFs;
``ln`` / ``floor`` / conditional sums only, so the whole monitor is
restatable in DuckDB for the hash oracle (gate ``embedding_drift``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    bins: int = 10,
) -> DataFrame:
    """Per-dimension drift of ``cur`` vs ``ref`` (both holding an
    ``array`` column ``vec_col``): returns one row per dimension with
    (dim, n_ref, n_cur, mean_ref, mean_cur, smd, psi)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")

    def explode(df: DataFrame, side: int) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(vec_col)).alias("dim", "val"))
            .withColumn("val", F.col("val").cast("double"))
            .withColumn("side", F.lit(side))
        )

    both = explode(ref, 0).unionByName(explode(cur, 1))

    # Pooled per-dimension range → shared fixed-width bin edges. The
    # range/moment/psi frames are O(d) rows at ANY corpus size, so
    # every join below broadcasts its tiny side explicitly (the repo
    # convention — aggregates carry no size stats, so without the hint
    # the planner sort-merges a d-row join against N·d exploded rows;
    # plan-asserted join-strategy test in tests/test_drift.py).
    rng = both.groupBy("dim").agg(
        F.min("val").alias("vmin"), F.max("val").alias("vmax")
    )
    span = F.col("vmax").cast("double") - F.col("vmin").cast("double")
    binned = both.join(F.broadcast(rng), "dim").withColumn(
        "bin",
        F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col("val").cast("double") - F.col("vmin").cast("double"))
                    * float(bins)
                    / span
                ),
                F.lit(bins - 1),
            )
        ).cast("int"),
    )

    # Moments per (dim, side) → means/variances for SMD; counts feed
    # the smoothed proportions.
    mom = binned.groupBy("dim").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n_cur"),
        F.avg(F.when(F.col("side") == 0, F.col("val"))).alias("mean_ref"),
        F.avg(F.when(F.col("side") == 1, F.col("val"))).alias("mean_cur"),
        F.coalesce(
            F.var_samp(F.when(F.col("side") == 0, F.col("val"))), F.lit(0.0)
        ).alias("var_ref"),
        F.coalesce(
            F.var_samp(F.when(F.col("side") == 1, F.col("val"))), F.lit(0.0)
        ).alias("var_cur"),
    )

    # Histogram per (dim, bin): Laplace-smoothed proportions so empty
    # bins never divide by zero; PSI sums over the FULL bin grid
    # (smoothing contributes where one side is absent), realized via
    # the per-dim bin counts observed on either side.
    hist = binned.groupBy("dim", "bin").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c_cur"),
    )
    h = hist.join(F.broadcast(mom.select("dim", "n_ref", "n_cur")), "dim")
    p_ref = (F.col("c_ref") + 1.0) / (F.col("n_ref") + float(bins))
    p_cur = (F.col("c_cur") + 1.0) / (F.col("n_cur") + float(bins))
    # Bins observed on NEITHER side still contribute smoothing mass;
    # account for them in closed form: each adds
    # (1/(n_cur+bins) - 1/(n_ref+bins)) * ln(ratio of the two priors).
    observed = h.groupBy("dim").agg(
        F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_obs"),
        F.count("*").alias("n_bins_obs"),
    )
    prior_cur = 1.0 / (F.col("n_cur") + float(bins))
    prior_ref = 1.0 / (F.col("n_ref") + float(bins))
    out = (
        mom.join(F.broadcast(observed), "dim")
        .withColumn(
            "psi",
            F.col("psi_obs")
            + (F.lit(float(bins)) - F.col("n_bins_obs"))
            * (prior_cur - prior_ref)
            * F.log(prior_cur / prior_ref),
        )
        .withColumn(
            "smd",
            F.when(
                (F.col("var_ref") + F.col("var_cur")) <= 0, F.lit(0.0)
            ).otherwise(
                (F.col("mean_cur") - F.col("mean_ref"))
                / F.sqrt((F.col("var_ref") + F.col("var_cur")) / 2.0)
            ),
        )
    )
    return out.select(
        "dim", "n_ref", "n_cur", "mean_ref", "mean_cur", "smd", "psi"
    )
