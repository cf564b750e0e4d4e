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
