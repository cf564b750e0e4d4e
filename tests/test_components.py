"""Connected components (large-star/small-star) and the exact
prefix-filtered set-similarity join, against in-process oracles."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.components import (
    cluster_survivors,
    connected_components,
)
from distributedvectordatabase_spark.operators.setsim import similarity_join


def _cc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component id = min node id."""
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for x, y in edges:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = connected_components(df).collect()
    assert len(got) == len({r["node"] for r in got}), "duplicate node rows"
    return {r["node"]: r["component"] for r in got}


def test_chain_converges_logarithmically(spark):
    """A 64-node path is the worst case for naive min-propagation
    (diameter 63); star-contraction must still finish in max_iter."""
    edges = [(i, i + 1) for i in range(63)]
    assert _run_cc(spark, edges) == {i: 0 for i in range(64)}


def test_two_components_and_orientation(spark):
    edges = [(5, 3), (3, 9), (20, 10), (10, 30), (30, 20)]
    assert _run_cc(spark, edges) == {3: 3, 5: 3, 9: 3, 10: 10, 20: 10, 30: 10}


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2)]
    assert _run_cc(spark, edges) == {1: 1, 2: 1}


def test_random_graphs_match_union_find(spark):
    for seed in range(4):
        rng = random.Random(seed)
        n = rng.randint(2, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(1, 2 * n))
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        assert _run_cc(spark, edges) == _cc_oracle(edges), f"seed={seed}"


def test_cluster_survivors(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], ["src", "dst"])
    got = {
        r["component"]: (r["survivor"], r["cluster_size"])
        for r in cluster_survivors(connected_components(df)).collect()
    }
    assert got == {1: (1, 3), 7: (7, 2)}


# ---------------------------------------------------------------------------
# prefix-filtered similarity join
# ---------------------------------------------------------------------------


def _setsim_oracle(
    sets: dict[int, frozenset[str]], theta: float
) -> set[tuple[int, int, float]]:
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= theta:
            out.add((ia, ib, round(j, 6)))
    return out


def _run_setsim(spark, sets: dict[int, frozenset[str]], theta: float):
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in sets.items()], ["sid", "items"]
    )
    rows = similarity_join(df, "sid", "items", theta).collect()
    return {(r["id_a"], r["id_b"], round(r["jaccard"], 6)) for r in rows}


def test_setsim_exact_on_handmade_sets(spark):
    sets = {
        1: frozenset("abcdefghij"),
        2: frozenset("abcdefghiX"),  # J = 9/11 with 1
        3: frozenset("abcdefghij"),  # J = 1.0 with 1
        4: frozenset("zy"),
        5: frozenset(),
    }
    for theta in (0.5, 0.8, 0.82, 1.0):
        assert _run_setsim(spark, sets, theta) == _setsim_oracle(sets, theta), theta


def test_setsim_random_corpora_complete(spark):
    """Prefix filtering is exact: every brute-force pair must appear,
    including boundary cases where θ·|s| lands on an integer."""
    for seed in range(3):
        rng = random.Random(100 + seed)
        vocab = [f"w{i}" for i in range(30)]
        sets = {
            i: frozenset(rng.sample(vocab, rng.randint(1, 12)))
            for i in range(40)
        }
        for theta in (0.5, 2 / 3, 0.9):
            assert _run_setsim(spark, sets, theta) == _setsim_oracle(sets, theta), (
                seed,
                theta,
            )


def test_setsim_no_python_in_hot_path(spark):
    """The join plan must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython stages (UDF-free candidate generation + verify)."""
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["a", "c"])], ["sid", "items"])
    plan = similarity_join(df, "sid", "items", 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_brute_neardup_corpus_guard(spark, monkeypatch):
    """brute_cosine_neardup_pairs refuses corpora past broadcast size
    instead of OOMing the driver; the LSH path is the documented out."""
    import importlib

    import pytest
    from pyspark.sql import functions as F

    dedupmod = importlib.import_module("distributedvectordatabase_spark.operators.dedup")
    corpus = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    monkeypatch.setattr(dedupmod, "MAX_BRUTE_CORPUS", 5)
    with pytest.raises(ValueError, match="MAX_BRUTE_CORPUS"):
        dedupmod.brute_cosine_neardup_pairs(corpus, threshold=0.9)


def test_minhash_neardup_join_cross_corpus(spark):
    """Incremental form: a new batch joined against an existing corpus.
    Consistency: splitting the self-join corpus into (new, existing)
    must reproduce exactly the cross-split subset of the self-join
    pairs."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.dedup import (
        minhash_neardup_join,
        minhash_neardup_pairs,
    )
    from distributedvectordatabase_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, "documents", SF_SMALL)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    got = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in minhash_neardup_join(
            new, corpus, threshold=0.7, bands=4, rows=3, shingle_n=3
        ).collect()
    }
    self_pairs = minhash_neardup_pairs(
        docs, threshold=0.7, bands=4, rows=3, shingle_n=3
    ).collect()
    want = set()
    for r in self_pairs:
        a_new, b_new = r.doc_a % 5 == 0, r.doc_b % 5 == 0
        if a_new and not b_new:
            want.add((r.doc_a, r.doc_b, r.jaccard))
        elif b_new and not a_new:
            want.add((r.doc_b, r.doc_a, r.jaccard))
    assert got == want
    assert len(got) > 0  # the testdata's planted dups must cross the split


def test_chain_graph_needs_multiple_rounds_and_converges(spark):
    """A 64-node chain is the multi-round worst case for star
    contraction (diameter >> 1) — the star-forest convergence check
    must not stop early on it."""
    import distributedvectordatabase_spark.operators.components as C

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    out = C.connected_components(edges)
    rows = out.collect()
    assert len(rows) == 64
    assert {r.component for r in rows} == {0}
