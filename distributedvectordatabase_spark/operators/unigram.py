"""Unigram-LM tokenizer training and application (Kudo 2018, the
SentencePiece unigram model) — the second of the two tokenizer
families production LLM pipelines train (BPE is ``operators/bpe.py``;
Llama/T5-class models tokenize with exactly this algorithm).

The reference pipeline never trains a tokenizer (it embeds whole
captions, generate_coco_embeddings.py); a training-data engine needs
both families. Like the BPE trainer, every iteration here is
VOCABULARY-bounded — the corpus is folded to ``(word, freq)`` once
(``bpe.word_vocab``, one map-side-combinable pass) and all EM work
runs over the distinct words, each carrying its frequency:

- **seed**: every substring up to ``max_piece_len`` of every distinct
  word, counted with word frequency (one vocab-sized explode, counts
  weighted by occurrences), scored ``count·len`` per SentencePiece's
  seed heuristic; the top ``seed_size`` pieces plus ALL single
  characters (coverage guarantee: every word stays segmentable).
- **EM**: the E-step runs forward-backward over each word's
  segmentation lattice inside an Arrow-batched ``mapInPandas`` against
  the broadcast piece table, emitting per-batch pre-combined expected
  counts; the M-step is one vocab-sized aggregation plus a bounded
  O(|V|) driver collect (the piece table is model state — the same
  class as the BPE argmax and the IVF centroids).
- **pruning**: between EM rounds the vocabulary shrinks by
  ``shrink`` (lowest expected count first — the standard
  reimplementation simplification of Kudo's exact leave-one-out loss;
  single characters are never pruned), until ``vocab_size`` remains.
- **apply**: Viterbi segmentation once per DISTINCT word (the
  ``bpe_apply`` pattern: Arrow UDF over the distinct words, size-aware
  broadcast joinback) — Python cost O(vocabulary), never O(corpus).

Determinism / layout independence: each word's lattice is evaluated in
one Python pass (bit-deterministic for a given piece table), its
per-piece expected contribution is floor-quantized to integer
NANO-units before leaving the task, and cross-word aggregation is
exact int64 addition — commutative, so repartitioning the vocabulary
cannot move a bit (pinned in tests/test_unigram.py). The per-EM-round
corpus log-likelihood is accumulated the same way and must be
non-decreasing (the EM invariant, also pinned).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_vocab

__all__ = ["unigram_train", "unigram_apply", "viterbi_segment", "word_vocab"]

NANO = 1_000_000_000
UNK_LP = -20.0  # per-char fallback for pieces unseen at training time


def _quant(x: float) -> int:
    return int(math.floor(x * NANO + 0.5))


def _lattice_expected_counts(
    word: str, freq: int, vocab: dict[str, float], max_len: int
):
    """Forward-backward over one word's segmentation lattice.

    Returns ``(counts, z)``: expected occurrence count per piece under
    the current model (NOT yet frequency-weighted) and the word's
    log-partition ``z``. Pure sequential float64 — bit-deterministic
    for a given (word, vocab). Raises if the word has a character
    outside the vocabulary (training seeds always include all chars).
    """
    n = len(word)
    NEG = float("-inf")
    # edges[i] = list of (j, piece, lp) for pieces word[j:i]
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = vocab.get(piece)
            if lp is not None:
                edges[i].append((j, piece, lp))
        if not edges[i]:
            raise ValueError(
                f"word {word!r} not segmentable at position {i} — "
                "single characters must all be in the vocabulary"
            )
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        tot = NEG
        for j, _, lp in edges[i]:
            s = alpha[j] + lp
            tot = s if tot == NEG else (
                max(tot, s) + math.log1p(math.exp(-abs(tot - s)))
            )
        alpha[i] = tot
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        tot = NEG
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:i]
            lp = vocab.get(piece)
            if lp is None:
                continue
            s = lp + beta[i]
            tot = s if tot == NEG else (
                max(tot, s) + math.log1p(math.exp(-abs(tot - s)))
            )
        beta[j] = tot
    z = alpha[n]
    counts: dict[str, float] = {}
    for i in range(1, n + 1):
        for j, piece, lp in edges[i]:
            w = math.exp(alpha[j] + lp + beta[i] - z)
            counts[piece] = counts.get(piece, 0.0) + w
    return counts, z


def _seed_pieces(
    wv: DataFrame, seed_size: int, max_piece_len: int
) -> list[tuple[str, int]]:
    """Top-``seed_size`` substrings by count·len (ties: piece asc) plus
    every single character. One vocab-sized explode; the collect is
    O(seed_size) — bounded model state."""
    subs = wv.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(i, least(length(word), i + {max_piece_len - 1})), "
                "j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
        "freq",
    ).groupBy("piece").agg(F.sum("freq").cast("bigint").alias("cnt"))
    scored = subs.withColumn("score", F.col("cnt") * F.length("piece"))
    top = (
        scored.where(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), F.col("piece"))
        .limit(int(seed_size))
        .select("piece", "score")
    )
    chars = scored.where(F.length("piece") == 1).select("piece", "score")
    rows = top.unionAll(chars).collect()
    return sorted((r.piece, int(r.score)) for r in rows)


def _em_step(
    wv: DataFrame, vocab: dict[str, float], max_piece_len: int
) -> tuple[dict[str, int], int]:
    """One E-step over the distinct vocabulary: returns (piece →
    frequency-weighted expected count in NANO-units, corpus
    log-likelihood in NANO-units). Both are exact int64 sums of
    per-word quantized contributions — layout-independent."""
    spark = wv.sparkSession
    bvocab = spark.sparkContext.broadcast(vocab)
    L = int(max_piece_len)

    def run(it):
        v = bvocab.value
        acc: dict[str, int] = {}
        ll = 0
        for pdf in it:
            for word, freq in zip(pdf["word"], pdf["freq"]):
                counts, z = _lattice_expected_counts(str(word), int(freq), v, L)
                f = int(freq)
                for piece, c in counts.items():
                    acc[piece] = acc.get(piece, 0) + _quant(c * f)
                ll += _quant(z * f)
        # NULL piece key carries the log-likelihood partial (no piece
        # string can collide with NULL)
        yield pd.DataFrame(
            {
                "piece": pd.Series(list(acc.keys()) + [None], dtype="object"),
                "nano": pd.Series(list(acc.values()) + [ll], dtype="int64"),
            }
        )

    agg = (
        wv.mapInPandas(run, "piece string, nano long")
        .groupBy("piece")
        .agg(F.sum("nano").cast("bigint").alias("nano"))
        .collect()
    )
    counts = {r.piece: int(r.nano) for r in agg}
    ll = counts.pop(None, 0)
    return counts, ll


def _m_step(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    logt = math.log(total)
    return {p: math.log(c) - logt for p, c in counts.items() if c > 0}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 512,
    seed_size: int = 4096,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
    text_col: str = "text",
    wv: DataFrame | None = None,
):
    """Train a unigram-LM piece vocabulary; returns ``(vocab, report)``
    where ``vocab`` is {piece: log-prob} (final EM round, normalized)
    and ``report`` lists per-round corpus log-likelihoods (each round's
    inner EM sequence is non-decreasing — the EM invariant).

    ``wv`` lets callers reuse an existing ``word_vocab`` frame (the
    single corpus pass); it is localCheckpointed here so the many EM
    passes over it don't replay upstream lineage."""
    if wv is None:
        wv = word_vocab(docs, text_col)
    wv = wv.localCheckpoint(eager=True)
    try:
        seeds = _seed_pieces(wv, seed_size, max_piece_len)
        total = sum(s for _, s in seeds)
        vocab = {p: math.log(s) - math.log(total) for p, s in seeds if s > 0}
        n_chars = sum(1 for p in vocab if len(p) == 1)
        if vocab_size < n_chars:
            raise ValueError(
                f"vocab_size={vocab_size} below the {n_chars} single "
                "characters needed for coverage"
            )
        report: list[list[float]] = []
        while True:
            lls: list[float] = []
            counts: dict[str, int] = {}
            for _ in range(max(int(em_iters), 1)):
                counts, ll_nano = _em_step(wv, vocab, max_piece_len)
                # coverage floor: a char fully absorbed into longer
                # pieces can round to 0 expected nanos — without it in
                # the vocabulary some future word becomes unsegmentable
                for p in vocab:
                    if len(p) == 1:
                        counts[p] = max(counts.get(p, 0), 1)
                vocab = _m_step(counts)
                lls.append(ll_nano / NANO)
            report.append(lls)
            if len(vocab) <= int(vocab_size):
                break
            # prune lowest expected-count multi-char pieces (chars are
            # never pruned); shrink by `shrink`, floor at vocab_size
            keep_n = max(int(vocab_size), int(len(vocab) * float(shrink)))
            multi = sorted(
                ((p, counts.get(p, 0)) for p in vocab if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )
            room = max(keep_n - n_chars, 0)
            kept = {p for p, _ in multi[:room]} | {p for p in vocab if len(p) == 1}
            if len(kept) == len(vocab):  # nothing prunable: done
                break
            vocab = {p: lp for p, lp in vocab.items() if p in kept}
            # renormalize after the cut (exact: over quantized counts,
            # same single-char floor)
            vocab = _m_step(
                {
                    p: max(counts.get(p, 0), 1) if len(p) == 1 else counts[p]
                    for p in vocab
                    if len(p) == 1 or counts.get(p, 0) > 0
                }
            )
        return vocab, report
    finally:
        wv.unpersist()


def viterbi_segment(
    word: str, vocab: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Best segmentation under the piece log-probs (max total log-prob;
    ties resolve toward the LONGER piece at each boundary — strict-`>`
    keeps the first candidate, and candidates are scanned longest
    first). Characters absent from the vocabulary fall back to
    single-char pieces at ``UNK_LP`` so apply never fails on unseen
    text."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - int(max_piece_len)), i):
            piece = word[j:i]
            lp = vocab.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = UNK_LP
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def unigram_apply(
    docs: DataFrame,
    vocab: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "uni_tokens",
    max_piece_len: int = 8,
    broadcast_vocab: bool | None = None,
    broadcast_max_vocab: int = 1_000_000,
) -> DataFrame:
    """(id_col, out_col) — each document's text as unigram-LM pieces,
    word boundaries respected. The ``bpe_apply`` contract exactly:
    Viterbi runs once per DISTINCT word (Arrow UDF), the tokenized
    vocabulary joins back size-aware (broadcast under
    ``broadcast_max_vocab`` rows, shuffled hash join above), empty/NULL
    texts yield empty arrays."""
    vb = dict(vocab)
    L = int(max_piece_len)

    @F.pandas_udf("array<string>")
    def tokenize(words: pd.Series) -> pd.Series:
        return words.map(lambda w: viterbi_segment(str(w), vb, L))

    exploded = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != "")
        ).alias("pos", "word"),
    )
    vocab_tokens = (
        exploded.select("word").distinct().withColumn("toks", tokenize("word"))
    )
    if broadcast_vocab is None:
        vocab_tokens = vocab_tokens.localCheckpoint(eager=True)
        broadcast_vocab = vocab_tokens.count() <= int(broadcast_max_vocab)
    build_side = F.broadcast(vocab_tokens) if broadcast_vocab else vocab_tokens
    tokenized = (
        exploded.join(build_side, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "toks"))
                ).getField("toks")
            ).alias(out_col)
        )
    )
    return (
        docs.select(id_col).distinct()
        .join(tokenized, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast("array<string>")),
        )
    )
