"""Unigram-LM tokenizer (operators/unigram.py).

Pins: analytic forward-backward values on a hand-solvable lattice, the
EM invariant (corpus log-likelihood non-decreasing within every
round), bitwise layout independence of training (nano-quantized int64
aggregation), Viterbi semantics incl. tie-break and UNK fallback,
apply round-trip (pieces concatenate back to the word) and both
joinback strategies, and pruning invariants (chars never pruned,
vocab_size respected)."""

from __future__ import annotations

import math

import pytest

from distributedvectordatabase_spark.operators.unigram import (
    _lattice_expected_counts,
    unigram_apply,
    unigram_train,
    viterbi_segment,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # small, repetitive corpus with clear multi-char units
    texts = [
        "lowering the lower flow slowly",
        "the lowest low flows lower",
        "slow flows lower the low flow",
        "newest estimate of the newer west",
        "the widest wide widths widen",
    ] * 4
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ------------------------------------------------------------ lattice math


def test_lattice_matches_hand_computation():
    """word 'ab' with vocab {a, b, ab}: two paths — [ab] and [a, b].
    P([ab]) ∝ p_ab, P([a,b]) ∝ p_a·p_b; expected counts follow in
    closed form."""
    vocab = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.5)}
    counts, z = _lattice_expected_counts("ab", 1, vocab, max_len=8)
    w_ab, w_a_b = 0.5, 0.3 * 0.2
    Z = w_ab + w_a_b
    assert z == pytest.approx(math.log(Z), abs=1e-12)
    assert counts["ab"] == pytest.approx(w_ab / Z, abs=1e-12)
    assert counts["a"] == pytest.approx(w_a_b / Z, abs=1e-12)
    assert counts["b"] == pytest.approx(w_a_b / Z, abs=1e-12)


def test_lattice_rejects_uncovered_char():
    with pytest.raises(ValueError):
        _lattice_expected_counts("ax", 1, {"a": -1.0}, max_len=8)


# ----------------------------------------------------------------- training


@pytest.fixture(scope="module")
def trained(corpus):
    vocab, report = unigram_train(
        corpus, vocab_size=40, seed_size=200, em_iters=2, max_piece_len=6
    )
    return vocab, report


def test_em_loglik_nondecreasing(trained):
    _, report = trained
    for rnd in report:
        for a, b in zip(rnd, rnd[1:]):
            assert b >= a - 1e-6, report


def test_vocab_size_and_char_coverage(trained, corpus):
    vocab, _ = trained
    assert len(vocab) <= 40
    corpus_chars = set("".join(t.text.replace(" ", "") for t in corpus.collect()))
    assert {p for p in vocab if len(p) == 1} >= corpus_chars
    # probabilities normalized: logsumexp(vocab) == 0
    total = sum(math.exp(lp) for lp in vocab.values())
    assert total == pytest.approx(1.0, abs=1e-9)
    # the corpus's dominant unit survives pruning
    assert any(p in vocab for p in ("low", "lowe", "lower", "ow"))


def test_training_is_layout_independent(corpus, trained):
    vocab_a, _ = trained
    vocab_b, _ = unigram_train(
        corpus.repartition(7, "doc_id"),
        vocab_size=40,
        seed_size=200,
        em_iters=2,
        max_piece_len=6,
    )
    assert vocab_a.keys() == vocab_b.keys()
    for p in vocab_a:
        assert vocab_a[p] == vocab_b[p], p  # bitwise, not approx


def test_vocab_size_below_char_count_rejected(corpus):
    with pytest.raises(ValueError):
        unigram_train(corpus, vocab_size=3, seed_size=50)


# ------------------------------------------------------------------ viterbi


def test_viterbi_prefers_higher_probability():
    vocab = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.5)}
    assert viterbi_segment("ab", vocab) == ["ab"]
    vocab["ab"] = math.log(0.05)  # now the two-piece path wins
    assert viterbi_segment("ab", vocab) == ["a", "b"]


def test_viterbi_unk_fallback():
    vocab = {"a": -1.0}
    assert viterbi_segment("axa", vocab) == ["a", "x", "a"]


def test_viterbi_respects_max_piece_len():
    vocab = {"abcd": -0.1, "ab": -1.0, "cd": -1.0, "a": -3.0, "b": -3.0, "c": -3.0, "d": -3.0}
    assert viterbi_segment("abcd", vocab, max_piece_len=2) == ["ab", "cd"]


# -------------------------------------------------------------------- apply


def test_apply_round_trips_and_compresses(spark, corpus, trained):
    vocab, _ = trained
    out = unigram_apply(corpus, vocab, max_piece_len=6)
    rows = {r.doc_id: r.uni_tokens for r in out.collect()}
    assert set(rows) == set(r.doc_id for r in corpus.select("doc_id").collect())
    n_pieces = n_chars = 0
    for r in corpus.collect():
        joined = "".join(rows[r.doc_id])
        assert joined == r.text.replace(" ", "")
        n_pieces += len(rows[r.doc_id])
        n_chars += len(joined)
    # a trained model must beat char-level segmentation clearly
    assert n_pieces < 0.6 * n_chars


def test_apply_joinback_strategies_identical(spark, corpus, trained):
    vocab, _ = trained
    a = unigram_apply(corpus, vocab, broadcast_vocab=True).collect()
    b = unigram_apply(corpus, vocab, broadcast_vocab=False).collect()
    assert {r.doc_id: r.uni_tokens for r in a} == {r.doc_id: r.uni_tokens for r in b}


def test_apply_handles_empty_and_null_text(spark, trained):
    vocab, _ = trained
    df = spark.createDataFrame(
        [(1, "low flow"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.uni_tokens for r in unigram_apply(df, vocab).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2] == [] and rows[3] == [] and rows[4] == []
    assert "".join(rows[1]) == "lowflow"
