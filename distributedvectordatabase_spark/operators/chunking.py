"""Document chunking and sequence packing — training-data shaping ops.

Two shapes every LLM data pipeline needs between "curated corpus" and
"training batches", absent from the reference (its corpus surface is
vectors only) and from the engine until r4:

- **chunk_documents**: split each document into overlapping sliding
  windows of at most ``max_tokens`` tokens (stride = max_tokens −
  overlap) — the standard long-document treatment for both training
  and retrieval indexing. Pure Catalyst: the token array materializes
  once per row, chunk windows are `transform(sequence(...))` over
  column references (cheap attribute lookups, unlike the O(words²)
  shingle trap fixed in functions/text.py), then one posexplode.
  Deterministic, SQL-expressible, dual-dialect oracle.

- **pack_documents**: assign documents to fixed-token-budget packs
  (greedy, in id order within a partition column) — sequence packing
  for training efficiency. Exact first-fit is inherently sequential;
  the scalable deterministic form used here is cumulative-sum
  segmentation: pack = floor((running_total − n_tokens) / budget),
  which guarantees every pack's total ≤ budget + max_doc_tokens − 1
  and is a single window cumsum per partition (docs beyond the budget
  singleton their own pack). The window partitions by ``part_col``
  (default ``lang``), so no global single-task sort exists at scale.

Both accept a PRECOMPUTED token-array column (``tokens_col`` — e.g.
``operators/bpe.bpe_apply`` / ``TokenizerStore.apply`` output, r7):
a training pipeline packs and windows by REAL tokenizer tokens, not
whitespace words, and re-tokenizing inside the shaping op would both
miscount (BPE tokens ≠ words) and pay the tokenize twice. With
``tokens_col`` the plans are unchanged — the array just arrives as a
column reference instead of a split() expression — and chunk output
carries ``chunk_tokens`` (token array) instead of ``chunk_text``
(re-joining BPE pieces with spaces would corrupt the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions import text as T

__all__ = ["chunk_documents", "pack_documents"]


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(id_col, chunk_id, chunk_text, n_tokens) — sliding windows over
    the whitespace tokens; the last window may be shorter; documents
    shorter than one window produce exactly one chunk. chunk_id is
    0-based window index; windows start every ``max_tokens - overlap``
    tokens.

    With ``tokens_col`` (a precomputed ``array<string>``, e.g. BPE
    tokens), windows slide over THAT array and the output carries
    ``chunk_tokens`` (the window's token array) in place of
    ``chunk_text`` — token identity is preserved exactly, and
    n_tokens counts real tokenizer tokens."""
    max_tokens = int(max_tokens)
    overlap = int(overlap)
    if max_tokens <= 0 or overlap < 0 or overlap >= max_tokens:
        raise ValueError("need max_tokens > 0 and 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = (
        F.col(tokens_col) if tokens_col is not None
        else F.expr(T.tokens(text_col, T.SPARK))
    )
    base = docs.select(F.col(id_col), toks.alias("toks")).withColumn(
        "n", F.size("toks")
    )
    # number of windows: 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("n") - F.lit(max_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    if tokens_col is not None:
        chunks = base.withColumn(
            "chunk",
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(F.col("toks"), i * stride + 1, max_tokens),
            ),
        )
        return chunks.select(
            id_col,
            F.posexplode("chunk").alias("chunk_id", "chunk_tokens"),
        ).withColumn("n_tokens", F.size("chunk_tokens"))
    chunks = base.withColumn(
        "chunk",
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("toks"), i * stride + 1, max_tokens)
            ),
        ),
    )
    return (
        chunks.select(
            id_col,
            F.posexplode("chunk").alias("chunk_id", "chunk_text"),
        )
        .withColumn(
            "n_tokens", F.size(F.expr(T.tokens("chunk_text", T.SPARK)))
        )
    )


def pack_documents(
    docs: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str = "lang",
    tokens_col: str | None = None,
) -> DataFrame:
    """(part_col, pack_id, id_col, n_tokens) — deterministic
    token-budget packing by cumulative-sum segmentation within each
    ``part_col`` group, docs taken in ascending id order.

    With ``tokens_col`` (a precomputed ``array<string>``, e.g. BPE
    tokens), the budget counts REAL tokenizer tokens — what a training
    pipeline actually packs sequences by — instead of whitespace words.

    Invariant (tested): within a (part, pack), sum(n_tokens) <
    budget + max(n_tokens of its docs); packs are contiguous id ranges
    per part. One window cumsum per partition — scales as long as no
    single ``part_col`` group must be processed by one task beyond its
    size (pre-split hot groups upstream if needed)."""
    from pyspark.sql import Window

    budget = int(budget)
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = (
        F.col(tokens_col) if tokens_col is not None
        else F.expr(T.tokens(text_col, T.SPARK))
    )
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(part_col, id_col, F.size(toks).alias("n_tokens"))
    return base.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)
        ).cast("int"),
    ).select(part_col, "pack_id", id_col, "n_tokens")
