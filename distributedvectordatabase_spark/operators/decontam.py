"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark corpus.

The reference has no text surface at all (SURVEY §2.2); this is
north-star training-data-pipeline tooling (the GPT-3/PaLM-style
"n-gram overlap with eval sets" decontamination pass), built from the
same dialect-shared shingle primitives as the dedup family so the
DuckDB oracle computes the identical function.

Shape at 100 TB: the benchmark side (eval suites) is tiny — its
distinct n-gram set is broadcast, so the training corpus is scanned
once, map-side joined, and partially aggregated per doc; the only
shuffle carries O(docs) pre-aggregated (doc, hit-count) rows, never
the exploded n-grams. Contrast with self-join dedup: decontamination
is asymmetric, which is exactly what makes the broadcast plan valid
regardless of training-corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions import text as T


def _shingle_expr(text_col: str, n: int) -> str:
    """Distinct word n-gram shingles (Spark dialect of the shared
    template — byte-identical to the DuckDB oracle's shingles)."""
    return f"array_distinct({T.word_shingles(T.tokens(text_col, T.SPARK), n, T.SPARK)})"


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Per-document n-gram overlap of ``docs`` against ``benchmark``.

    Returns (id_col, n_shingles, n_hits, contamination) for documents
    with at least ``min_hits`` distinct n-grams appearing anywhere in
    the benchmark corpus — the rows a curation pipeline drops (or
    audits) before training. ``contamination`` is the contaminated
    share of the doc's distinct n-grams in [0, 1].

    Plan: benchmark shingles → distinct → **broadcast**; the training
    side is ONE scan — shingles exploded once, map-side LEFT-joined
    against the broadcast set with a hit marker, and both the total
    and the hit count fall out of one partial-aggregated groupBy
    (``count(*)`` = distinct shingles, ``count(_hit)`` = overlapping
    ones), so the only shuffle carries O(docs) pre-aggregated rows.
    (Computing the total as ``size(shingles)`` in a sibling projection
    instead is a trap: Catalyst inlines the projection above the
    Generate and re-evaluates the whole tokenize+shingle pipeline per
    exploded row — measured 2× slower than even a second scan.)
    Docs shorter than ``n`` words have no shingles and are never
    flagged.
    """
    sh = _shingle_expr(text_col, n)
    bench_sh = (
        benchmark.select(F.explode(F.expr(sh)).alias("shingle")).distinct()
    )
    doc_sh = docs.select(
        F.col(id_col), F.explode(F.expr(sh)).alias("shingle")
    )
    return (
        doc_sh.join(
            F.broadcast(bench_sh.withColumn("_hit", F.lit(1))), "shingle", "left"
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shingles"), F.count("_hit").alias("n_hits"))
        .filter(F.col("n_hits") >= int(min_hits))
        .select(
            id_col,
            "n_shingles",
            "n_hits",
            (F.col("n_hits") / F.col("n_shingles")).alias("contamination"),
        )
    )
