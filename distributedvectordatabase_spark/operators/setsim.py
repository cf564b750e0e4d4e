"""Exact set-similarity self-join via prefix filtering (AllPairs).

Finds ALL pairs with Jaccard ≥ θ — not an approximation. MinHash
banding (operators/dedup.py) trades recall for speed (2 bands × 6 rows
catches ~78% of J=0.9 pairs); this operator is the exact counterpart,
still sub-quadratic on real corpora: the prefix-filtering principle
(Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search", WWW'07;
PPJoin, Xiao et al. TODS'11).

Principle: order every set by ascending global item frequency (rarest
first). If J(x,y) ≥ θ then |x∩y| ≥ ⌈θ·max(|x|,|y|)⌉, so x and y must
share an element within their first |s| − ⌈θ·|s|⌉ + 1 items — the
*prefix*. Candidates = pairs sharing ≥1 prefix item; by construction
prefixes hold each set's globally rarest items, so the equi-join
buckets are the smallest possible and candidate count stays near-linear
even when some items are stop-word-frequent. A length filter
(θ·|x| ≤ |y| ≤ |x|/θ) prunes inside the join condition, then exact
Jaccard verification keeps true pairs only.

Shuffle profile at scale: one groupBy for global frequencies (tiny,
broadcast back), one groupBy to order each set, one equi-join on
prefix item, one verify join on id. Every stage is built-in Catalyst
operators — no Python in the hot path.

Residual skew risk at 100×: the equi-join on the prefix item can
concentrate on the hottest still-prefix-eligible token when the corpus
has near-duplicate frequency mass (rarest-first ordering bounds this,
but not adversarially). Escape hatches, in order: (1) AQE skew-join
splitting is already on (session.py) and splits an oversized bucket at
runtime; (2) partition the join additionally by a set-length band
(θ-compatible lengths only, so it's results-preserving); (3) salt the
hot item's bucket and union the candidate sets. None is wired in by
default because (1) has handled every measured case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["similarity_join"]


def similarity_join(
    df: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs (id_a < id_b, jaccard) with Jaccard(set_a, set_b) ≥
    ``threshold``. ``set_col`` must hold distinct-element arrays;
    empty sets never pair.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # cached: consumed by the frequency agg, the ordering agg, and both
    # sides of the verify join — without it Catalyst re-evaluates the
    # (possibly expensive) set expression once per consumer.
    sized = (
        df.select(F.col(id_col).alias("sid"), F.col(set_col).alias("items"))
        .where(F.size("items") > 0)
        .cache()
    )
    freq = (
        sized.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("freq"))
    )
    # canonical order: ascending global frequency, item string tie-break
    ordered = (
        sized.select("sid", F.explode("items").alias("item"))
        .join(F.broadcast(freq), "item")
        .groupBy("sid")
        .agg(F.array_sort(F.collect_list(F.struct("freq", "item"))).alias("oi"))
    )
    prefix = ordered.select(
        "sid",
        F.size("oi").alias("n"),
        F.explode(
            F.expr(
                "transform("
                # −1e-9 before ceil: 0.9*10 is 9.000000000000002 in
                # doubles; bare ceil would overshoot the overlap bound
                # and shrink the prefix below the completeness guarantee
                f"  slice(oi, 1, size(oi) - cast(ceil({threshold!r} * size(oi) - 1e-9) as int) + 1),"
                "  s -> s.item)"
            )
        ).alias("item"),
    ).cache()  # both sides of the candidate self-join read this
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.item") == F.col("b.item"),
                F.col("a.sid") < F.col("b.sid"),
                # length filter: θ·|a| ≤ |b| ≤ |a|/θ is required for
                # J ≥ θ (epsilon guards the float-product boundary)
                F.col("b.n") * F.lit(threshold) - F.lit(1e-9) <= F.col("a.n"),
                F.col("a.n") * F.lit(threshold) - F.lit(1e-9) <= F.col("b.n"),
            ],
        )
        .select(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .distinct()
    )
    sa = sized.select(
        F.col("sid").alias("id_a"),
        F.col("items").alias("items_a"),
        F.size("items").alias("_na"),
    )
    sb = sized.select(
        F.col("sid").alias("id_b"),
        F.col("items").alias("items_b"),
        F.size("items").alias("_nb"),
    )
    # |a ∪ b| = |a| + |b| − |a ∩ b| exactly (distinct-element arrays),
    # so verification costs ONE array op per candidate pair instead of
    # two (r12). The intersect is projected first so its two uses stay
    # one evaluation (CollapseProject multi-use guard).
    jac = (F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))).cast(
        "double"
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", "_na", "_nb",
            F.size(F.array_intersect("items_a", "items_b")).alias("_inter"),
        )
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
