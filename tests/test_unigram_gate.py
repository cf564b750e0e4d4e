"""The doc_unigram_tokens gate vs the unigram operator (VERDICT r9 #3).

The gate is the unigram family's EXTERNAL check: EM training stays
pytest-gated (KMeans-class), but the Viterbi apply is dual-dialect SQL
over the frozen piece table. These tests pin that the SQL DP IS
viterbi_segment: per-doc fingerprints, piece counts, and micro-log-prob
sums recomputed in Python through the real operator must match the
gate's Spark output exactly, and the frozen table must cover the
testdata alphabet (so the UNK fallback never alters parity)."""

from __future__ import annotations

import hashlib

from distributedvectordatabase_spark.catalog import (
    _UNIGRAM_L,
    _UNIGRAM_PIECES,
    build_catalog,
)
from distributedvectordatabase_spark.operators.unigram import viterbi_segment
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _expected(doc_texts):
    """Per-doc (n_words, n_pieces, lp_micro, pieces_fp) through the
    Python operator — the same DP, same float sums, same order."""
    import math

    out = {}
    for doc_id, text in doc_texts:
        words = [t for t in (text or "").split(" ") if t]
        segs, np_total, lp = [], 0, 0.0
        for w in words:
            pieces = viterbi_segment(w, _UNIGRAM_PIECES, _UNIGRAM_L)
            segs.append("|".join(pieces))
            np_total += len(pieces)
            wlp = 0.0
            for p in pieces:
                wlp += _UNIGRAM_PIECES.get(p, -20.0)
            lp += math.floor(wlp * 1000000.0 + 0.5)
        fp = hashlib.md5(" ".join(segs).encode()).hexdigest()
        out[doc_id] = (len(words), np_total, int(lp), fp)
    return out


def test_gate_matches_viterbi_segment_bitwise(spark):
    docs = load_table(spark, "documents", SF_DIR)
    want = _expected([(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()])
    gate = build_catalog()["doc_unigram_tokens"].run(spark, SF_DIR)
    got = {
        r.doc_id: (r.n_words, r.n_pieces, r.lp_micro, r.pieces_fp)
        for r in gate.collect()
    }
    assert got == want


def test_piece_table_covers_testdata_alphabet(spark):
    """Every single character of the documents corpus must be in the
    frozen table — otherwise the -20.0 UNK fallback fires and the gate
    tests the fallback rather than the trained pieces."""
    docs = load_table(spark, "documents", SF_DIR)
    from pyspark.sql import functions as F

    chars = {
        r.c
        for r in docs.select(
            F.explode(F.split("text", "")).alias("c")
        ).filter("c <> '' AND c <> ' '").distinct().collect()
    }
    assert chars <= {p for p in _UNIGRAM_PIECES if len(p) == 1}, (
        sorted(chars - set(_UNIGRAM_PIECES))
    )


def test_tie_break_prefers_longer_piece(spark):
    """'window' can segment w|indow or wind|ow (among others); the
    longest-first strict-> convention must pick the same split in SQL
    as in Python. Run the gate's Spark dialect on a planted doc."""
    from distributedvectordatabase_spark.catalog import _q_doc_unigram_tokens
    from distributedvectordatabase_spark.functions.text import SPARK

    planted = spark.createDataFrame(
        [(1, "window window order"), (2, "")],
        "doc_id long, text string",
    )
    planted.createOrReplaceTempView("documents")
    try:
        rows = {r.doc_id: r for r in spark.sql(_q_doc_unigram_tokens(SPARK)).collect()}
    finally:
        # register_views caches per session — invalidate so later tests
        # in this session re-register the real testdata view we shadowed
        from distributedvectordatabase_spark.sources import tables as _tables

        spark.catalog.dropTempView("documents")
        _tables._REGISTERED.pop(spark, None)
    want = _expected([(1, "window window order"), (2, "")])
    assert (rows[1].n_words, rows[1].n_pieces, rows[1].lp_micro, rows[1].pieces_fp) == want[1]
    # empty doc: zeroed counts, md5('') fingerprint
    assert rows[2].n_words == 0 and rows[2].pieces_fp == hashlib.md5(b"").hexdigest()
