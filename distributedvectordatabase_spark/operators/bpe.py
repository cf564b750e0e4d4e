"""BPE tokenizer training and application (Sennrich et al. 2016) —
distributed over Spark with every loop iteration VOCABULARY-bounded.

The reference pipeline embeds pre-tokenized text and never trains a
tokenizer (generate_coco_embeddings.py consumes captions whole); a
training-data engine needs one, and the classic algorithm maps onto
Spark cleanly if the corpus-sized work is paid exactly once:

- **one corpus pass** folds the text to a ``(word, freq)`` vocabulary
  (whitespace words, the same split as the ``bpe_pair_stats`` gate) —
  map-side-combinable word count, the only scan of the documents;
- **each merge iteration** runs over the distinct vocabulary with each
  word carrying its frequency: adjacent-pair counts are one
  vocab-sized explode + one aggregation, and the argmax pair merges
  via a pure Catalyst ``aggregate`` left-fold over the symbol arrays
  (greedy non-overlapping left-to-right, the textbook single-pass
  semantics) — no Python in the loop, no corpus re-scan, lineage
  truncated per iteration with ``localCheckpoint``;
- **apply** tokenizes the corpus by folding the merge list over the
  DISTINCT words (an Arrow-batched pandas_udf — chaining 100 merge
  folds as nested Catalyst lambdas would blow past codegen limits)
  and broadcast-joining the results back: tokenization cost is
  O(vocabulary), not O(corpus).

At 100 TB the vocabulary is millions of rows against a corpus of
trillions of tokens, so vocab-bounded iterations are the difference
between a tokenizer you can train and one you cannot.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_train_from_vocab", "bpe_apply", "word_vocab"]


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace words — the single corpus pass
    shared by training and application. Same split as the
    ``bpe_pair_stats`` gate: split on ' ', empties dropped."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right single-pass merge of adjacent pair (a, b)
    inside the ``syms`` array, as one Catalyst ``aggregate`` fold.

    State is (acc, just): ``just`` marks that the PREVIOUS element was
    consumed by a merge, so overlapping chains don't cascade —
    'aaaa' under (a,a) becomes [aa, aa], never [aaa, a]. Comparison is
    against current symbols, so later iterations merge merged tokens
    naturally."""
    lit_a, lit_b = F.lit(a), F.lit(b)
    merged = F.lit(a + b)

    def step(s, x):
        # try_element_at: NULL (not an ANSI error) on the empty
        # accumulator; NULL == lit_a is NULL and when() treats it as
        # false, so the guard needs no size() conjunct
        hit = (
            ~s.getField("just")
            & (F.try_element_at(s.getField("acc"), F.lit(-1)) == lit_a)
            & (x == lit_b)
        )
        return F.when(
            hit,
            F.struct(
                F.concat(
                    F.slice(
                        s.getField("acc"), 1, F.size(s.getField("acc")) - 1
                    ),
                    F.array(merged),
                ).alias("acc"),
                F.lit(True).alias("just"),
            ),
        ).otherwise(
            F.struct(
                F.concat(s.getField("acc"), F.array(x)).alias("acc"),
                F.lit(False).alias("just"),
            )
        )

    zero = F.struct(
        F.array().cast("array<string>").alias("acc"), F.lit(False).alias("just")
    )
    return F.aggregate(F.col("syms"), zero, step, lambda s: s.getField("acc"))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over a document corpus; returns
    [(a, b, pair_count)] in merge order. One corpus pass folds to the
    (word, freq) vocabulary, then :func:`bpe_train_from_vocab` runs the
    vocab-bounded merge loop."""
    return bpe_train_from_vocab(
        word_vocab(docs, text_col), n_merges, checkpoint_every=checkpoint_every
    )


def bpe_train_from_vocab(
    vocab_df: DataFrame,
    n_merges: int = 50,
    checkpoint_every: int = 8,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) vocabulary —
    the corpus' sufficient statistic for BPE, which is exactly what
    ``TokenizerStore`` persists (training never needs the corpus twice).
    Deterministic: argmax pair ties break on (a, b)
    lexicographically, so two engines (or two cluster sizes) learn the
    identical tokenizer. Stops early when no pair occurs twice.

    The driver holds only the merge list (n_merges rows) and a 1-row
    argmax per iteration; everything else stays distributed. Symbol
    arrays are rewritten in place per iteration (a vocab-sized
    projection, no shuffle) and ``localCheckpoint`` every
    ``checkpoint_every`` iterations keeps the plan from growing
    unboundedly."""
    vocab = vocab_df.select(
        F.split(F.col(word_col), "").alias("syms"), F.col(freq_col).alias("freq")
    )
    # tokens of length 1 can never merge; keep them out of the loop
    vocab = vocab.filter(F.size("syms") >= 2).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for it in range(int(n_merges)):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.select(_merge_expr(a, b).alias("syms"), "freq").filter(
            F.size("syms") >= 2
        )
        if (it + 1) % int(checkpoint_every) == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def _apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference application of a merge list to one word (greedy
    left-to-right per merge, merges in learned order) — the same
    semantics as _merge_expr, in plain Python for the Arrow UDF."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    broadcast_vocab: bool | None = None,
    broadcast_max_vocab: int = 1_000_000,
) -> DataFrame:
    """(id_col, out_col) — each document's text as BPE tokens under the
    learned merge list, word boundaries respected (tokens never span
    words, the Sennrich formulation).

    Tokenization runs once per DISTINCT word (Arrow-batched pandas_udf
    folding the merge list; chaining the fold as nested Catalyst
    lambdas would exceed codegen method limits past a few dozen
    merges) and joins back to the exploded corpus by word — so the
    Python cost is O(vocabulary) however large the corpus.

    The joinback is size-aware: ``broadcast_vocab=None`` (default)
    materializes the tokenized vocabulary once (``localCheckpoint`` —
    also keeps the pandas_udf from re-running per join partition) and
    broadcasts it only while it fits ``broadcast_max_vocab`` rows; a
    realistic zipfian web vocabulary (millions of distinct words at
    100 TB) takes the shuffled hash join on ``word`` instead — corpus
    side shuffles once, hot words are probe-side duplicates so skew
    costs nothing. Both paths are row-identical (pinned in
    tests/test_bpe.py). Pass True/False to pin the strategy and skip
    the count."""
    pair_list = [(m[0], m[1]) for m in merges]

    @F.pandas_udf("array<string>")
    def tokenize(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _apply_merges_py(w, pair_list))

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
    # empty / whitespace-only / NULL texts posexplode to zero rows and
    # would vanish from the output, breaking downstream inner joins on
    # the doc id — left-join back onto the full id set so every input
    # document yields a row, with an empty token array.
    return (
        docs.select(id_col)
        .join(tokenized, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast("array<string>")),
        )
    )
