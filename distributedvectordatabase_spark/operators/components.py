"""Connected components over a pair graph (dedup clustering).

The dedup operators (MinHash/SimHash/cosine, operators/dedup.py) emit
*pairs*; a curation pipeline needs *clusters* — near-duplication is not
transitive, so A~B and B~C must collapse into one group {A,B,C} before
picking a survivor per group. The reference has no analog (its dedup
surface is empty, SURVEY §2.2); this is north-star pipeline territory.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), the canonical
shuffle-based CC. Each round is two groupBy-shuffles on node id; the
edge set converges to a star forest (every node → its component's
minimum id) in O(log n) rounds — unlike naive min-label propagation,
which needs O(diameter) rounds and dies on chain-shaped graphs at
scale. Per-node state is a single window MIN (no collect_set arrays),
so a million-member component never materializes one node's neighbor
list in an executor. Each iteration ends in ``localCheckpoint`` to
truncate lineage (iterative plans otherwise grow without bound) and a
convergence check on the edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["connected_components", "cluster_survivors"]


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to the minimum of
    u's neighborhood (including u itself)."""
    nbrs = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    w = Window.partitionBy("src")
    with_mn = nbrs.withColumn(
        "mn", F.least(F.min("dst").over(w), F.col("src"))
    )
    return (
        with_mn.where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges larger→smaller, then connect each node's smaller
    neighbors (and the node itself) to the minimum of that set."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    w = Window.partitionBy("src")
    with_mn = directed.withColumn("mn", F.min("dst").over(w))
    members = with_mn.select(F.col("dst").alias("v"), "mn").union(
        with_mn.select(F.col("src").alias("v"), "mn")
    )
    return (
        members.where(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    the component id is the minimum node id in the component.

    ``edges`` is undirected (each pair listed once, either order);
    self-loops are dropped. Returns one row per distinct node.
    """
    cur = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # Lazy checkpoint (r11): the convergence check below is the
        # round's first action and materializes the checkpoint as a
        # side effect, so eager=True's separate materialization job per
        # round is pure overhead (3 driver actions/round → 1).
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # Convergence = the edge set IS a star forest, checked directly
        # on nxt instead of diffing against cur — this detects the
        # fixpoint on the round that PRODUCES it, saving one full
        # large+small-star round (4 shuffles + checkpoint) every call.
        # Soundness: small-star output always orients child→min
        # (dst < src by construction), so if additionally every src has
        # exactly one dst and no dst ever appears as a src, the edges
        # are disjoint two-level stars whose root is smaller than every
        # child — i.e. min-rooted stars, on which both star operations
        # are identities (the SoCC'14 fixpoint). Conversely the
        # algorithm's fixpoint is exactly such a forest, so the check
        # is necessary too — no early or late stop.
        #
        # Both conditions fold into ONE degree pass (r11): a node v
        # violates the star-forest shape iff it appears more than once
        # as a src (multi-out) or appears as both a src and a dst (a
        # root that is also a child) — the same two conditions the
        # former two-job check (count>1 filter + dst⋈src) computed,
        # now a single aggregation and a single driver action.
        deg = (
            nxt.select(F.col("src").alias("v"), F.lit(1).alias("s"), F.lit(0).alias("d"))
            .unionAll(
                nxt.select(F.col("dst").alias("v"), F.lit(0).alias("s"), F.lit(1).alias("d"))
            )
            .groupBy("v")
            .agg(F.sum("s").alias("ns"), F.sum("d").alias("nd"))
        )
        bad = deg.where(
            (F.col("ns") > 1) | ((F.col("ns") > 0) & (F.col("nd") > 0))
        )
        if bad.isEmpty():
            cur = nxt
            break
        cur = nxt
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # cur is a star forest: every non-root points at its component min.
    assignments = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = (
        cur.select(F.col("dst").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    return assignments.unionByName(roots).distinct()


def cluster_survivors(assignments: DataFrame) -> DataFrame:
    """One survivor (minimum node id) per cluster with the cluster
    size — the keep-one policy a dedup pipeline applies downstream."""
    return assignments.groupBy("component").agg(
        F.min("node").alias("survivor"), F.count("*").alias("cluster_size")
    )
