"""Gopher repetition filtering (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", App. A) —
the DataFrame scale path behind the ``doc_gopher_repetition`` gate
(catalog._q_doc_gopher_repetition).

Per document: the fraction of word-characters covered by the single
most-covering word 2-gram (``top2_frac``), the fraction of 5-gram
occurrence characters belonging to duplicated 5-grams (``dup5_frac``),
the type-token ratio, and the composed keep/drop verdict at the paper
thresholds (top-2-gram char coverage ≤ 0.20, duplicated-5-gram char
fraction ≤ 0.15).

100 TB shape:

- Shingles materialize ONCE per document (one projection); each n-gram
  pass is a map-side-combinable ``groupBy(doc_id, shingle).count()`` —
  partial aggregation collapses within-doc repeats before the shuffle,
  so shuffled bytes are bounded by per-doc DISTINCT shingles, and the
  highly-repetitive documents the filter exists to catch are exactly
  the ones that compress the most.
- The per-doc roll-ups (``t2``/``t5``) emit ONE row per document;
  the join-back is a skinny doc_id-keyed join, never corpus × corpus.
- Shuffle keys are (doc_id, shingle) then (doc_id): no global windows,
  no driver-side state, nothing quadratic in corpus size.

Determinism matches the gate bit-for-bit (pinned in tests/test_gopher.py):
every tally is integer (sum order irrelevant), the verdict is integer
cross-multiplication, and the reported fractions are one IEEE division
quantized to 1e-6 by the shared floor-round rule.

Reference parity: the reference repo has no curation-quality surface at
all (its pipeline stops at embeddings — scripts/generate_coco_embeddings.py);
this operator family is part of the training-data pipeline layer the
100 TB engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    SPARK,
    q6_col as _q6,
    sum_token_lengths,
    tokens,
    word_shingles,
)

# Rae et al. 2021 App. A thresholds, expressed as integer cross-ratios
# (top2_chars/total_chars <= 1/5; dup5_chars/all5_chars <= 3/20).
TOP2_NUM, TOP2_DEN = 1, 5
DUP5_NUM, DUP5_DEN = 3, 20


def gopher_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-doc Gopher repetition profile + keep verdict.

    Output columns match the ``doc_gopher_repetition`` gate exactly:
    (doc_id, n_words, n_types, total_chars, top2_chars, dup5_chars,
    all5_chars, ttr, top2_frac, dup5_frac, keep).
    """
    # tokens_col: reuse a persisted token column instead of paying
    # tokenize x 3 corpus passes (the one-tokenize-pass pattern at
    # 100 TB; same knob as substring_dedup/_tokenized)
    if tokens_col is not None:
        base = docs.select(
            F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("toks")
        )
    else:
        toks = tokens(text_col, SPARK)
        base = docs.select(F.col(id_col).alias("doc_id"), F.expr(toks).alias("toks"))
    st = base.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.size(F.array_distinct("toks")).alias("n_types"),
        F.expr(sum_token_lengths("toks", SPARK)).alias("total_chars"),
        F.expr(word_shingles("toks", 2, SPARK)).alias("sh2"),
        F.expr(word_shingles("toks", 5, SPARK)).alias("sh5"),
    )

    c2 = (
        st.select("doc_id", F.explode("sh2").alias("s"))
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("c"))
    )
    t2 = c2.groupBy("doc_id").agg(
        F.max(F.col("c") * (F.length("s") - 1)).cast("bigint").alias("top2_chars")
    )

    c5 = (
        st.select("doc_id", F.explode("sh5").alias("s"))
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("c"))
    )
    occ5 = F.col("c") * (F.length("s") - 4)
    t5 = c5.groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") >= 2, occ5).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dup5_chars"),
        F.sum(occ5).cast("bigint").alias("all5_chars"),
    )

    top2 = F.coalesce(F.col("top2_chars"), F.lit(0))
    dup5 = F.coalesce(F.col("dup5_chars"), F.lit(0))
    all5 = F.coalesce(F.col("all5_chars"), F.lit(0))
    return (
        st.drop("sh2", "sh5")
        .join(t2, "doc_id", "left")
        .join(t5, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_types").cast("bigint").alias("n_types"),
            F.col("total_chars").cast("bigint").alias("total_chars"),
            top2.cast("bigint").alias("top2_chars"),
            dup5.cast("bigint").alias("dup5_chars"),
            all5.cast("bigint").alias("all5_chars"),
            _q6(
                F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                    F.col("n_types").cast("double") / F.col("n_words")
                )
            ).alias("ttr"),
            _q6(
                F.when(F.col("total_chars") == 0, F.lit(0.0)).otherwise(
                    top2.cast("double") / F.col("total_chars")
                )
            ).alias("top2_frac"),
            _q6(
                F.when(all5 == 0, F.lit(0.0)).otherwise(
                    dup5.cast("double") / all5
                )
            ).alias("dup5_frac"),
            F.when(
                (top2 * TOP2_DEN <= F.col("total_chars") * TOP2_NUM)
                & (dup5 * DUP5_DEN <= all5 * DUP5_NUM),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("keep"),
        )
    )


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """The curation form: input rows that PASS the repetition rules,
    original schema preserved (the pass a pipeline chains before
    tokenization/mixing). One skinny semi-join against the verdicts."""
    keep = (
        gopher_repetition(docs, text_col, id_col, tokens_col)
        .filter(F.col("keep") == 1)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(keep, id_col, "left_semi")
