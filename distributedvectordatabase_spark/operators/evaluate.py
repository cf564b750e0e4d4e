"""Retrieval-quality evaluation: recall@k, precision@k, MRR, AP@k,
nDCG@k over a ranked result set vs graded relevance judgments.

North-star surface (absent in the reference, which measures only
latency — benchmark_performance.py — never ranking quality): a
training-data / RAG pipeline that ships an ANN index, a BM25 index, or
a hybrid ranker needs the standard IR metrics computed AT SCALE — the
result set is (n_queries × k) rows and qrels (n_queries × judged)
rows, both potentially huge when evaluating against full click logs.

Spark-first: everything is built-in expressions (joins, windows,
conditional aggregates) — one shuffle to join results to qrels on
(query, doc), one window per query for cumulative hits (AP) and ideal
ranking (IDCG), one groupBy per query. Partitioning is by query id
throughout, so skew is bounded by k and the per-query judgment count;
no UDFs, no collect.

Definitions (the trec_eval conventions):
- queries evaluated = queries with >= 1 positive judgment (standard
  trec_eval behavior; unjudged queries are dropped, queries with
  judgments but no results score 0),
- recall@k    = |relevant ∩ top-k| / |relevant|,
- precision@k = |relevant ∩ top-k| / k,
- mrr@k       = 1 / rank of the first relevant hit (0 if none),
- ap@k        = Σ_{hit ranks r} P(r) / min(|relevant|, k),
- dcg@k       = Σ_{hits at rank r} (2^rel − 1) / log2(r + 1),
- ndcg@k      = dcg@k / idcg@k  (idcg from the qrels' ideal ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query IR metrics for ``results`` (one row per retrieved doc,
    ``rank_col`` = 1-based rank) against ``qrels`` (one row per judged
    (query, doc) with graded ``rel_col`` >= 0; only rel > 0 counts as
    relevant).

    Returns one row per judged query:
    (query_col, n_rel, hits, recall_at_k, precision_at_k, mrr, ap, ndcg).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d, r, rel = query_col, doc_col, rank_col, rel_col

    rel_rows = qrels.filter(F.col(rel) > 0).select(q, d, rel)
    totals = rel_rows.groupBy(q).agg(F.count("*").alias("n_rel"))

    # Ideal DCG: the qrels' best-first ordering. Tie-break by doc id
    # for a deterministic plan; equal grades contribute identically at
    # any position ordering among themselves, so the sum is invariant.
    w_ideal = Window.partitionBy(q).orderBy(F.col(rel).desc(), F.col(d))
    ideal = (
        rel_rows.withColumn("pos", F.row_number().over(w_ideal))
        .filter(F.col("pos") <= k)
        .groupBy(q)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rel).cast("double")) - 1.0)
                / F.log2(F.col("pos") + 1.0)
            ).alias("idcg")
        )
    )

    topk = results.filter(F.col(r) <= k).select(q, d, r)
    hitcol = F.col(rel).isNotNull().cast("int")
    # qrels are eval-set-sized by nature (human/synthetic judgments,
    # never corpus-sized) — broadcast them; the derived frame has no
    # stats, so without the hint Spark falls back to a sort-merge join
    joined = topk.join(F.broadcast(rel_rows), on=[q, d], how="left").withColumn(
        "hit", hitcol
    )
    w_rank = Window.partitionBy(q).orderBy(r)
    joined = joined.withColumn("cum_hits", F.sum("hit").over(w_rank))

    per = joined.groupBy(q).agg(
        F.sum("hit").alias("hits"),
        F.coalesce(
            F.max(F.when(F.col("hit") == 1, F.lit(1.0) / F.col(r))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(
            F.when(
                F.col("hit") == 1,
                (F.pow(F.lit(2.0), F.col(rel).cast("double")) - 1.0)
                / F.log2(F.col(r) + 1.0),
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("hit") == 1, F.col("cum_hits").cast("double") / F.col(r)
            ).otherwise(0.0)
        ).alias("ap_num"),
    )

    # all three sides are one-row-per-judged-query aggregates —
    # broadcast the probe sides (same missing-stats reason as above)
    return (
        totals.join(F.broadcast(ideal), on=q)
        .join(F.broadcast(per), on=q, how="left")
        .select(
            F.col(q),
            F.col("n_rel"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_rel")).alias("recall_at_k"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(float(k))).alias(
                "precision_at_k"
            ),
            F.coalesce(F.col("mrr"), F.lit(0.0)).alias("mrr"),
            (
                F.coalesce(F.col("ap_num"), F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(k)).cast("double")
            ).alias("ap"),
            (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg"),
        )
    )


def macro_metrics(per_query: DataFrame, query_col: str = "qid") -> DataFrame:
    """Macro-average of :func:`ranking_metrics` output: one row with
    the mean of each metric over judged queries (the headline numbers
    an eval report quotes)."""
    return per_query.agg(
        F.count(query_col).alias("n_queries"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("precision_at_k").alias("precision_at_k"),
        F.avg("mrr").alias("mrr"),
        F.avg("ap").alias("map"),
        F.avg("ndcg").alias("ndcg"),
    )
