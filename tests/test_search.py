"""Unit tests for operators/search.bm25_topk (lexical ranked retrieval)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from distributedvectordatabase_spark.operators.search import bm25_topk


def _bm25_ref(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Straightforward reference implementation (floats, no quantize)."""
    toks = {i: [t for t in s.split(" ") if t] for i, s in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for t in sorted(set(terms)):
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, v in toks.items():
            tf = v.count(t)
            if tf == 0:
                continue
            dl = len(v)
            c = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))
            out[i] = out.get(i, 0.0) + c
    return out


CORPUS = {
    1: "spark shuffles data across the cluster",
    2: "spark spark spark joins tables",
    3: "the cluster stores data data data",
    4: "unrelated words only here",
    5: "spark data cluster spark data",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    pdf = pd.DataFrame(
        {"doc_id": list(CORPUS), "text": [CORPUS[i] for i in CORPUS]}
    )
    return spark.createDataFrame(pdf)


def test_bm25_matches_reference(spark, docs_df):
    got = {
        r.doc_id: r.score
        for r in bm25_topk(docs_df, ["spark", "data"], k=10).collect()
    }
    want = _bm25_ref(CORPUS, ["spark", "data"])
    assert set(got) == set(want)  # doc 4 matches nothing -> absent
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-6)


def test_bm25_ranking_and_k(spark, docs_df):
    rows = bm25_topk(docs_df, ["spark"], k=2).collect()
    assert [r.rnk for r in rows] == [1, 2]
    # doc 2 has tf=3 of "spark" in 5 tokens -> highest score
    assert rows[0].doc_id == 2
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_duplicate_query_terms_collapse(spark, docs_df):
    once = bm25_topk(docs_df, ["spark"], k=5).collect()
    twice = bm25_topk(docs_df, ["spark", "spark"], k=5).collect()
    assert [(r.doc_id, r.score) for r in once] == [(r.doc_id, r.score) for r in twice]


def test_bm25_unknown_term_empty(spark, docs_df):
    assert bm25_topk(docs_df, ["zzz"], k=5).count() == 0


def test_bm25_requires_terms(spark, docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [], k=5)


def test_bm25_rare_term_outranks_common_on_equal_tf(spark):
    """idf ordering: a doc matching only the rare term beats a doc
    matching only the common term at equal tf and length."""
    corpus = {i: "filler words here now" for i in range(1, 9)}
    corpus[1] = "rareterm words here now"
    for i in range(2, 9):
        corpus[i] = "common words here now" if i < 6 else "other stuff here now"
    pdf = pd.DataFrame({"doc_id": list(corpus), "text": [corpus[i] for i in corpus]})
    df = spark.createDataFrame(pdf)
    rows = bm25_topk(df, ["rareterm", "common"], k=8).collect()
    assert rows[0].doc_id == 1


def test_rrf_fuse_matches_reference(spark):
    from distributedvectordatabase_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rnk int")
    b = spark.createDataFrame([(3, 1), (4, 2), (1, 3)], "doc_id long, rnk int")
    got = {r.doc_id: r.rrf_score for r in rrf_fuse(a, b, k=10, c=60).collect()}
    want = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 62,
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    # ranking: docs 1 and 3 tie on score -> id ascending breaks it
    rows = rrf_fuse(a, b, k=10, c=60).collect()
    assert [r.doc_id for r in rows[:2]] == [1, 3]


def test_rrf_fuse_respects_k(spark):
    from distributedvectordatabase_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc_id long, rnk int")
    b = spark.createDataFrame([(i + 10, i) for i in range(1, 8)], "doc_id long, rnk int")
    rows = rrf_fuse(a, b, k=5).collect()
    assert len(rows) == 5
    assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]


def test_hybrid_topk_end_to_end(spark):
    """Hybrid search on the sf0.001 testdata: legs agree with running
    each side separately and fusing driver-side."""
    from distributedvectordatabase_spark.operators.knn import knn_single
    from distributedvectordatabase_spark.operators.search import bm25_topk, hybrid_topk
    from distributedvectordatabase_spark.sources.tables import load_table

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", SF)
    emb = load_table(spark, "embeddings", SF)
    qvec = emb.orderBy("vec_id").first().embedding
    terms = ["vector", "query"]
    k, fetch = 10, 40

    got = hybrid_topk(docs, emb, qvec, terms, k=k, fetch_k=fetch).collect()

    vec = knn_single(emb, qvec, k=fetch, metric="cosine").collect()
    vec_rnk = {r.neighbor_id: i + 1 for i, r in enumerate(vec)}
    txt = bm25_topk(docs, terms, k=fetch).collect()
    txt_rnk = {r.doc_id: r.rnk for r in txt}
    scores = {}
    for d in set(vec_rnk) | set(txt_rnk):
        s = 0.0
        if d in vec_rnk:
            s += 1.0 / (60.0 + vec_rnk[d])
        if d in txt_rnk:
            s += 1.0 / (60.0 + txt_rnk[d])
        scores[d] = s
    want = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    assert [(r.doc_id) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.rrf_score == pytest.approx(s, rel=1e-12)


def test_rrf_fuse_batched_by_query(spark):
    """by=["qid"] fuses a whole query batch in one plan: each group
    must match fusing that query's legs alone."""
    from distributedvectordatabase_spark.operators.search import rrf_fuse

    a_rows = [(q, d, r) for q in (100, 200) for r, d in enumerate([1, 2, 3], 1)]
    b_rows = [(100, 3, 1), (100, 4, 2), (200, 9, 1), (200, 1, 2)]
    a = spark.createDataFrame(a_rows, "qid long, doc_id long, rnk int")
    b = spark.createDataFrame(b_rows, "qid long, doc_id long, rnk int")
    got = rrf_fuse(a, b, k=10, c=60, by=["qid"]).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    for q in (100, 200):
        single = rrf_fuse(
            a.filter(f"qid = {q}").drop("qid"),
            b.filter(f"qid = {q}").drop("qid"),
            k=10,
            c=60,
        ).collect()
        batch = sorted(by_q[q], key=lambda r: r.rnk)
        assert [(r.doc_id, r.rrf_score, r.rnk) for r in batch] == [
            (r.doc_id, r.rrf_score, r.rnk) for r in single
        ]


def test_bm25_property_random_corpora(spark):
    """Randomized corpora vs the reference implementation: scores agree
    to quantization tolerance and ranking order matches exactly under
    the (score desc, id) tie-break."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    corpus_strategy = st.dictionaries(
        keys=st.integers(min_value=1, max_value=50),
        values=st.lists(words, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=12,
    )
    terms_strategy = st.lists(words, min_size=1, max_size=3)

    @settings(max_examples=15, deadline=None)
    @given(corpus=corpus_strategy, terms=terms_strategy)
    def run(corpus, terms):
        pdf = pd.DataFrame(
            {"doc_id": list(corpus), "text": [corpus[i] for i in corpus]}
        )
        df = spark.createDataFrame(pdf, "doc_id long, text string")
        got = bm25_topk(df, terms, k=100).collect()
        want = _bm25_ref(corpus, terms)
        assert {r.doc_id for r in got} == set(want)
        # quantized-score tolerance: each per-term contribution is
        # floor-quantized at 1e-6, so totals drift <= |terms| * 1e-6
        for r in got:
            assert abs(r.score - want[r.doc_id]) <= len(set(terms)) * 1e-6 + 1e-9
        # rank agreement, skipping orderings that quantization slack
        # could legitimately permute: the operator sums per-term
        # QUANTIZED contributions while the reference quantizes the
        # raw total, so two docs within slack of each other may order
        # either way — only adjacent pairs separated by more than the
        # slack must agree
        q = lambda x: __import__("math").floor(x * 1e6 + 0.5) / 1e6
        slack = 2 * len(set(terms)) * 1e-6
        order = sorted(want, key=lambda d: (-q(want[d]), d))
        got_ids = [r.doc_id for r in got]
        for i in range(len(order) - 1):
            a, b = order[i], order[i + 1]
            if q(want[a]) - q(want[b]) > slack:
                assert got_ids.index(a) < got_ids.index(b), (a, b)

    run()


def test_bm25_batch_equals_per_query_loop(spark, docs_df):
    """bm25_topk_batch must be row-identical, scores included, to
    running bm25_topk once per query — including a query whose terms
    match nothing (absent from the output, like the single form)."""
    from distributedvectordatabase_spark.operators.search import bm25_topk_batch

    qsets = {
        0: ["spark", "data"],
        1: ["cluster"],
        2: ["spark", "spark", "joins"],  # dup term collapses
        3: ["nomatch"],
    }
    queries = spark.createDataFrame(
        [(q, ts) for q, ts in qsets.items()], "qid long, terms array<string>"
    )
    got = {
        (r.qid, r.doc_id): (r.score, r.rnk)
        for r in bm25_topk_batch(docs_df, queries, k=3).collect()
    }
    want = {}
    for q, ts in qsets.items():
        for r in bm25_topk(docs_df, ts, k=3).collect():
            want[(q, r.doc_id)] = (r.score, r.rnk)
    assert got == want
    assert not any(q == 3 for q, _ in got)


def test_hybrid_batch_equals_per_query_loop(spark):
    """hybrid_topk_batch vs a hybrid_topk loop on real testdata."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.search import (
        hybrid_topk,
        hybrid_topk_batch,
    )
    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    qterms = {0: ["dup", "vector"], 1: ["query", "the"], 2: ["vector"]}
    queries = spark.createDataFrame(
        [(q, qvecs[q], qterms[q]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )
    got = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_topk_batch(
            docs, emb, queries, k=5, dist_quantize=6
        ).collect()
    }
    want = {}
    for q in qvecs:
        for r in hybrid_topk(
            docs, emb, qvecs[q], qterms[q], k=5, dist_quantize=6
        ).collect():
            want[(q, r.doc_id)] = (round(r.rrf_score, 9), r.rnk)
    assert got == want and len(got) == 15


def test_hybrid_serve_batch_equals_oneshot_batch(spark, tmp_path):
    """hybrid_serve_batch (persisted VectorStore + TextIndex) must
    reproduce hybrid_topk_batch exactly in exact mode, and keep the
    pruned mode sane."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
        hybrid_topk_batch,
    )
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    store = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64))
    store.write(emb)
    index = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    index.build(docs)
    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    qterms = {0: ["dup", "vector"], 1: ["query", "the"], 2: ["vector"]}
    queries = spark.createDataFrame(
        [(q, qvecs[q], qterms[q]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )
    got = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, store, index, queries, k=5, dist_quantize=6
        ).collect()
    }
    want = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_topk_batch(
            docs, emb, queries, k=5, dist_quantize=6
        ).collect()
    }
    assert got == want and len(got) == 15
    # pruned semantic leg: still k results per query, fused sanely
    pruned = hybrid_serve_batch(
        spark, store, index, queries, k=5, num_candidates=3, dist_quantize=6
    )
    rows = pruned.collect()
    assert {r.qid for r in rows} == {0, 1, 2}
    assert all(1 <= r.rnk <= 5 for r in rows)


def test_hybrid_batch_accepts_custom_column_names(spark, tmp_path):
    """Regression: knn's output always carries the literal 'qid'
    column, so the batch hybrids must canonicalize caller column
    names up front instead of referencing them downstream."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
        hybrid_topk_batch,
    )
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    qv = list(emb.filter(F.col("vec_id") == 0).first().embedding)
    queries = spark.createDataFrame(
        [(7, qv, ["dup", "vector"])],
        "my_qid long, my_vec array<float>, my_terms array<string>",
    )
    got = hybrid_topk_batch(
        docs, emb, queries, k=3,
        qid_col="my_qid", qvec_col="my_vec", terms_col="my_terms",
    ).collect()
    assert {r.qid for r in got} == {7} and len(got) == 3
    store = VectorStore(str(tmp_path / "vs2"), SignLSH(dim=64))
    store.write(emb)
    index = TextIndex(str(tmp_path / "ix2"), n_buckets=8)
    index.build(docs)
    got2 = hybrid_serve_batch(
        spark, store, index, queries, k=3,
        qid_col="my_qid", qvec_col="my_vec", terms_col="my_terms",
    ).collect()
    assert {r.qid for r in got2} == {7} and len(got2) == 3


def test_hybrid_serve_batch_sq_leg(spark, tmp_path):
    """use_sq=True serves the semantic leg from the SQ8 codes sidecar;
    with full rerank budget on l2sq the fused rows match the raw-leg
    serve (rank-by-L2 both ways)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    store = VectorStore(str(tmp_path / "vs3"), SignLSH(dim=64))
    store.write(emb)
    store.build_sq(spark)
    index = TextIndex(str(tmp_path / "ix3"), n_buckets=8)
    index.build(docs)
    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 2).collect()
    }
    queries = spark.createDataFrame(
        [(q, qvecs[q], ["dup", "vector"]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )
    raw = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, store, index, queries, k=5, metric="l2sq", dist_quantize=6
        ).collect()
    }
    sq = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, store, index, queries, k=5, use_sq=True, sq_rerank=4,
            dist_quantize=6,
        ).collect()
    }
    assert sq == raw and len(sq) == 10


def test_hybrid_serve_batch_excludes_deleted_docs(spark, tmp_path):
    """Take-down parity end-to-end (r6): a doc deleted from BOTH
    persisted structures must vanish from hybrid serving, and the
    surviving rows must equal a serve over freshly built stores
    without it — the text leg's BM25 stats decrement exactly."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    store = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64))
    store.write(emb)
    index = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    index.build(docs)
    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 2).collect()
    }
    qterms = {0: ["dup", "vector"], 1: ["query", "the"]}
    queries = spark.createDataFrame(
        [(q, qvecs[q], qterms[q]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )

    def serve(s, ix):
        return {
            (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
            for r in hybrid_serve_batch(
                spark, s, ix, queries, k=5, dist_quantize=6
            ).collect()
        }

    before = serve(store, index)
    victims = sorted({d for _, d in before})[:2]
    store.delete(spark, victims)
    index.delete(spark, victims)
    got = serve(store, index)
    assert not {d for _, d in got} & set(victims)

    fresh_store = VectorStore(str(tmp_path / "vs_f"), SignLSH(dim=64))
    fresh_store.write(emb.filter(~F.col("vec_id").isin(victims)))
    fresh_index = TextIndex(str(tmp_path / "ix_f"), n_buckets=8)
    fresh_index.build(docs.filter(~F.col("doc_id").isin(victims)))
    want = serve(fresh_store, fresh_index)
    assert got == want


def test_hybrid_serve_batch_bq_leg(spark, tmp_path):
    """use_bq=True serves the semantic leg from the 1-bit binary
    sidecar; at full rerank budget the fused rows match the raw-leg
    serve (the rerank is exact in the same metric)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    store = VectorStore(str(tmp_path / "vs4"), SignLSH(dim=64))
    store.write(emb)
    store.build_bq(spark, n_bits=256)
    index = TextIndex(str(tmp_path / "ix4"), n_buckets=8)
    index.build(docs)
    n = emb.count()
    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 2).collect()
    }
    queries = spark.createDataFrame(
        [(q, qvecs[q], ["dup", "vector"]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )
    raw = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, store, index, queries, k=5, metric="l2sq", dist_quantize=6
        ).collect()
    }
    bq = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, store, index, queries, k=5, use_bq=True,
            bq_rerank=n,  # full shortlist -> exact rerank == raw leg
            dist_quantize=6,
        ).collect()
    }
    assert bq == raw and len(bq) == 10
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ONE compressed leg"):
        hybrid_serve_batch(
            spark, store, index, queries, k=5, use_sq=True, use_bq=True
        )


def test_hybrid_serve_batch_ivf_leg_equals_manual_composition(spark, tmp_path):
    """r7 (VERDICT r6 #7): hybrid_serve_batch auto-detects an IVFStore
    and serves the semantic leg probed — pinned row-identical to
    composing IVFStore.knn + TextIndex.bm25_batch + rrf_fuse by hand,
    at full probe (the exact invariant) and at a pruned n_probe; the
    SQ codes leg routes to knn_sq; the wrong pruning knob raises."""
    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
        rrf_fuse,
    )
    from distributedvectordatabase_spark.sources.ivf_store import IVFStore
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    store = IVFStore(str(tmp_path / "ivf"), n_cells=8, id_col="doc_id")
    store.build(emb)
    store.build_sq(spark)
    index = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    index.build(docs)

    qvecs = {
        int(r.doc_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("doc_id") < 3).collect()
    }
    qterms = {0: ["dup", "vector"], 1: ["query", "the"], 2: ["vector"]}
    queries = spark.createDataFrame(
        [(q, qvecs[q], qterms[q]) for q in qvecs],
        "qid long, qvec array<double>, terms array<string>",
    )

    def manual(n_probe, use_sq=False):
        fetch = 20  # 4 * k
        qv = queries.select("qid", "qvec")
        if use_sq:
            hits = store.knn_sq(spark, qv, k=fetch, n_probe=n_probe, rerank=2)
        else:
            hits = store.knn(spark, qv, k=fetch, n_probe=n_probe,
                             metric="cosine")
        vec_leg = hits.select(
            "qid", F.col("neighbor_id").alias("doc_id"),
            F.row_number().over(
                Window.partitionBy("qid").orderBy("dist", "neighbor_id")
            ).alias("rnk"),
        )
        text_leg = index.bm25_batch(
            spark, queries.select("qid", "terms"), k=fetch
        ).select("qid", "doc_id", "rnk")
        return rrf_fuse(vec_leg, text_leg, k=5, id_col="doc_id", by=["qid"])

    def rows(df):
        return sorted(
            (r.qid, r.doc_id, round(r.rrf_score, 9), r.rnk)
            for r in df.collect()
        )

    # full probe (default): the exact-serving shape
    got = rows(hybrid_serve_batch(spark, store, index, queries, k=5))
    assert got == rows(manual(store.n_cells)) and len(got) == 15
    # pruned probe
    got_p = rows(hybrid_serve_batch(spark, store, index, queries, k=5,
                                    n_probe=2))
    assert got_p == rows(manual(2))
    # SQ codes leg
    got_sq = rows(hybrid_serve_batch(spark, store, index, queries, k=5,
                                     n_probe=2, use_sq=True))
    assert got_sq == rows(manual(2, use_sq=True))
    # the LSH knob against an IVF store (and vice versa) raises
    with pytest.raises(ValueError, match="n_probe instead"):
        hybrid_serve_batch(spark, store, index, queries, k=5,
                           num_candidates=2)


def test_hybrid_serve_ivf_plan_pruned_on_both_legs(spark, tmp_path):
    """The served plan prunes BOTH legs: the IVF semantic leg's raw
    scan lists only the probed cells' directories, and the BM25 leg's
    postings scan lists only the query terms' hash buckets."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
    )
    from distributedvectordatabase_spark.plans import scan_partition_filters
    from distributedvectordatabase_spark.sources.ivf_store import IVFStore
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    store = IVFStore(str(tmp_path / "ivf"), n_cells=8, id_col="doc_id")
    store.build(emb)
    index = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    index.build(docs)

    queries = spark.createDataFrame(
        [(0, [float(x) for x in emb.first().embedding], ["dup", "vector"])],
        "qid long, qvec array<double>, terms array<string>",
    )
    served = hybrid_serve_batch(spark, store, index, queries, k=5, n_probe=2)
    filters = scan_partition_filters(served)
    assert any("cell_id" in f for f in filters), filters
    assert any("term_bucket" in f for f in filters), filters


def test_hybrid_serve_batch_filtered(spark, tmp_path):
    """r8: filtered hybrid search — hybrid_serve_batch(where=...) must
    equal the hand-composed legs: exact kNN over the predicate-filtered
    corpus, and BM25 with corpus-global stats where the filter is a
    hard constraint applied BEFORE the top-k cut (rank among allowed ==
    rank order of the unfiltered run restricted to allowed ids). Both
    store kinds must agree with the same expectation."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
        rrf_fuse,
    )
    from distributedvectordatabase_spark.sources.ivf_store import IVFStore
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    vs = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64))
    vs.write(emb)  # label column rides into the store
    ivf = IVFStore(str(tmp_path / "ivf"), n_cells=8, meta_cols=("label",))
    ivf.build(emb)
    index = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    index.build(docs)

    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 3).collect()
    }
    qterms = {0: ["dup", "vector"], 1: ["query", "the"], 2: ["vector"]}
    queries = spark.createDataFrame(
        [(q, qvecs[q], qterms[q]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )
    where, k, fetch = "label = 3", 5, 20
    allowed = {
        int(r.vec_id) for r in emb.filter(F.col("label") == 3).collect()
    }

    # ---- hand-composed expectation
    vec_hand = knn(
        emb.filter(where), queries.select("qid", "qvec"), k=fetch,
        metric="cosine",
    ).select("qid", F.col("neighbor_id").alias("doc_id"), "rnk")
    big = index.bm25_batch(
        spark, queries.select("qid", "terms"), k=100_000
    ).toPandas()
    big = big[big.doc_id.isin(allowed)].sort_values(["qid", "rnk"])
    big["rnk"] = big.groupby("qid").cumcount() + 1
    big = big[big.rnk <= fetch]
    text_hand = spark.createDataFrame(
        big[["qid", "doc_id", "rnk"]], "qid long, doc_id long, rnk int"
    )
    want = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in rrf_fuse(
            vec_hand, text_hand, k=k, c=60, id_col="doc_id", by=["qid"]
        ).collect()
    }
    assert want and all(d in allowed for (_, d) in want)

    for store in (vs, ivf):
        got = {
            (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
            for r in hybrid_serve_batch(
                spark, store, index, queries, k=k, where=where
            ).collect()
        }
        assert got == want, type(store).__name__

    # pruned legs still honor the predicate (subset semantics)
    pruned = hybrid_serve_batch(
        spark, vs, index, queries, k=k, where=where, num_candidates=2
    ).collect()
    assert pruned and all(r.doc_id in allowed for r in pruned)
    probed = hybrid_serve_batch(
        spark, ivf, index, queries, k=k, where=where, n_probe=4
    ).collect()
    assert probed and all(r.doc_id in allowed for r in probed)

    # r9: the compressed leg filters too — allowed ids semi-join into
    # the codes scan before the shortlist (hard constraint holds)
    vs.build_sq(spark)
    comp = hybrid_serve_batch(
        spark, vs, index, queries, k=k, where=where, use_sq=True,
        sq_rerank=4,
    ).collect()
    assert comp and all(r.doc_id in allowed for r in comp)


def test_hybrid_filtered_snapshot_serving(spark, tmp_path):
    """r8: where composes with as_of — a pinned filtered serve must
    equal filtered serving over fresh builds of the historical corpora
    (reproducible filtered retrieval through later appends)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
    )
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    d1, d2 = docs.filter("doc_id < 250"), docs.filter("doc_id >= 250")
    e1, e2 = emb.filter("vec_id < 250"), emb.filter("vec_id >= 250")

    vs = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64))
    vs.write(e1)
    ix = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    ix.build(d1)
    g_store, g_ix = vs.current_gen(), ix.current_gen()
    vs.append(e2)
    ix.append(d2)

    qvecs = {
        int(r.vec_id): list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 2).collect()
    }
    queries = spark.createDataFrame(
        [(q, qvecs[q], ["dup", "vector"]) for q in qvecs],
        "qid long, qvec array<float>, terms array<string>",
    )
    got = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, vs, ix, queries, k=5, where="label = 3",
            store_as_of=g_store, index_as_of=g_ix,
        ).collect()
    }
    fvs = VectorStore(str(tmp_path / "fvs"), SignLSH(dim=64))
    fvs.write(e1)
    fix = TextIndex(str(tmp_path / "fix"), n_buckets=8)
    fix.build(d1)
    want = {
        (r.qid, r.doc_id): (round(r.rrf_score, 9), r.rnk)
        for r in hybrid_serve_batch(
            spark, fvs, fix, queries, k=5, where="label = 3"
        ).collect()
    }
    assert got == want and got
    # post-append docs never surface in the pinned serve
    assert all(d < 250 for (_, d) in got)
