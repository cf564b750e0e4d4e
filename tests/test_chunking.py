"""Unit tests for operators/chunking (chunk_documents, pack_documents)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}),
        "doc_id long, text string",
    )


def test_chunks_short_doc_is_single_chunk(spark):
    df = _df(spark, [(1, "a b c")])
    rows = chunk_documents(df, max_tokens=8, overlap=2).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0
    assert rows[0].chunk_text == "a b c"
    assert rows[0].n_tokens == 3


def test_chunks_empty_doc_yields_one_empty_chunk(spark):
    df = _df(spark, [(1, "")])
    rows = chunk_documents(df, max_tokens=8, overlap=2).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == ""
    assert rows[0].n_tokens == 0


def test_chunks_overlap_and_coverage(spark):
    words = [f"w{i}" for i in range(10)]
    df = _df(spark, [(1, " ".join(words))])
    rows = sorted(
        chunk_documents(df, max_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 2 over 10 tokens: windows starting at 0,2,4,6 (ceil((10-4)/2)=3, +1)
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w2 w3 w4 w5"
    assert rows[-1].chunk_text == "w6 w7 w8 w9"
    # consecutive windows share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split(" ")[-2:] == b.chunk_text.split(" ")[:2]
    # every source token appears in some chunk
    covered = {t for r in rows for t in r.chunk_text.split(" ")}
    assert covered == set(words)


def test_chunks_validates_params(spark):
    df = _df(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0, overlap=0)


def test_pack_budget_invariant(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, 41),
            "lang": ["en" if i % 2 else "de" for i in range(1, 41)],
            "text": [" ".join(["x"] * (5 + 7 * (i % 9))) for i in range(1, 41)],
        }
    )
    df = spark.createDataFrame(pdf, "doc_id long, lang string, text string")
    out = pack_documents(df, budget=40).toPandas()
    # invariant: per (lang, pack), total < budget + max member
    g = out.groupby(["lang", "pack_id"])["n_tokens"]
    for (lang, pack), s in g:
        assert s.sum() < 40 + s.max(), (lang, pack, s.sum(), s.max())
    # packs are contiguous id ranges per lang
    for lang, grp in out.groupby("lang"):
        grp = grp.sort_values("doc_id")
        assert (grp["pack_id"].diff().fillna(0) >= 0).all()
    # every doc packed exactly once
    assert len(out) == 40


def test_pack_oversized_doc_gets_own_packs(spark):
    df = spark.createDataFrame(
        [(1, "en", " ".join(["x"] * 100)), (2, "en", "x x")],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r.pack_id for r in pack_documents(df, budget=40).collect()}
    # the 100-token doc occupies pack 0 alone; the next doc starts past it
    assert out[1] == 0
    assert out[2] > 0


def test_chunk_then_index_retrieval_composes(spark, tmp_path):
    """RAG-shaped composition: chunk the corpus, index the CHUNKS in a
    TextIndex, and chunk-level BM25 must equal the one-shot operator
    over the chunk frame — operators compose without glue code."""
    from distributedvectordatabase_spark.operators.search import bm25_topk
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    chunks = (
        chunk_documents(docs, max_tokens=16, overlap=4)
        .select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
    )
    ix = TextIndex(str(tmp_path / "chunk_ix"), n_buckets=8)
    ix.build(chunks)
    terms = ["vector", "query"]
    want = [(r.doc_id, r.score, r.rnk) for r in bm25_topk(chunks, terms, k=10).collect()]
    got = [(r.doc_id, r.score, r.rnk) for r in ix.bm25(spark, terms, k=10).collect()]
    assert got == want
    assert len(got) == 10


def test_pack_and_chunk_over_precomputed_bpe_tokens(spark, tmp_path):
    """r7 (VERDICT r6 #6): pack_documents/chunk_documents accept the
    bpe_apply output, so budgets and windows count REAL tokenizer
    tokens. Pack budgets respected in BPE token counts; chunk windows
    preserve token identity (no space re-joining of BPE pieces), and
    non-overlapping windows reconstruct the original arrays exactly."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.bpe import bpe_apply, bpe_train
    from distributedvectordatabase_spark.operators.chunking import (
        chunk_documents,
        pack_documents,
    )
    from distributedvectordatabase_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, "documents", SF_SMALL).limit(120)
    merges = bpe_train(docs, n_merges=10)
    toked = docs.select("doc_id", "lang").join(
        bpe_apply(docs, merges), "doc_id"
    )
    n_by_doc = {
        r.doc_id: len(r.bpe_tokens) for r in toked.collect()
    }

    budget = 64
    packs = pack_documents(toked, budget=budget, tokens_col="bpe_tokens")
    rows = packs.collect()
    # n_tokens counts BPE tokens, not whitespace words
    assert all(r.n_tokens == n_by_doc[r.doc_id] for r in rows)
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r.lang, r.pack_id), []).append(r.n_tokens)
    for ns in by_pack.values():
        assert sum(ns) < budget + max(ns)

    # chunking over token arrays: windows are token slices, and with
    # overlap=0 flattening the windows reconstructs the original array
    chunks = chunk_documents(
        toked, max_tokens=16, overlap=0, tokens_col="bpe_tokens"
    )
    assert "chunk_tokens" in chunks.columns and "chunk_text" not in chunks.columns
    recon = {
        r.doc_id: list(r.toks)
        for r in chunks.groupBy("doc_id").agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_tokens"))
                ).getField("chunk_tokens")
            ).alias("toks")
        ).collect()
    }
    orig = {r.doc_id: list(r.bpe_tokens) for r in toked.collect()}
    assert recon == orig
    # every window bounded by max_tokens
    assert chunks.filter(F.col("n_tokens") > 16).count() == 0
