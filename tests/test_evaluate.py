"""Retrieval-eval operator: hand-computed metric values on tiny
fixtures, trec_eval edge conventions, macro averages, and plan shape
(built-ins only — no Python UDFs)."""

import math

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.evaluate import (
    macro_metrics,
    ranking_metrics,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, schema="qid long, doc_id long, rnk int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, schema="qid long, doc_id long, rel int")


def test_hand_computed_binary_metrics(spark):
    """q1: top-3 = [hit, miss, hit] of 4 relevant.
    recall = 2/4; precision = 2/3; mrr = 1 (rank 1 hit);
    ap = (1/1 + 2/3) / min(4,3); dcg = 1/log2(2) + 1/log2(4);
    idcg = 1/log2(2) + 1/log2(3) + 1/log2(4)."""
    res = _results(spark, [(1, 10, 1), (1, 99, 2), (1, 11, 3)])
    qr = _qrels(spark, [(1, 10, 1), (1, 11, 1), (1, 12, 1), (1, 13, 1)])
    row = ranking_metrics(res, qr, k=3, doc_col="doc_id").first()
    assert row.n_rel == 4 and row.hits == 2
    assert abs(row.recall_at_k - 0.5) < 1e-12
    assert abs(row.precision_at_k - 2 / 3) < 1e-12
    assert abs(row.mrr - 1.0) < 1e-12
    assert abs(row.ap - (1.0 + 2 / 3) / 3) < 1e-12
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(row.ndcg - dcg / idcg) < 1e-12


def test_graded_relevance_gain(spark):
    """rel=2 at rank 2: dcg = (2^2-1)/log2(3); ideal puts it at rank 1
    (idcg = 3/log2(2) + 1/log2(3) with the rel=1 doc second)."""
    res = _results(spark, [(1, 5, 1), (1, 7, 2)])
    qr = _qrels(spark, [(1, 7, 2), (1, 8, 1)])
    row = ranking_metrics(res, qr, k=2, doc_col="doc_id").first()
    dcg = 3.0 / math.log2(3)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3)
    assert abs(row.ndcg - dcg / idcg) < 1e-12
    assert abs(row.mrr - 0.5) < 1e-12


def test_no_relevant_retrieved_scores_zero(spark):
    res = _results(spark, [(1, 99, 1), (1, 98, 2)])
    qr = _qrels(spark, [(1, 1, 1)])
    row = ranking_metrics(res, qr, k=2, doc_col="doc_id").first()
    assert row.hits == 0
    assert row.recall_at_k == 0.0 and row.mrr == 0.0 and row.ap == 0.0 and row.ndcg == 0.0


def test_judged_query_with_no_results_scores_zero(spark):
    """trec_eval convention: judged queries missing from the run still
    count (as zeros) — a ranker can't improve its macro score by
    silently dropping hard queries."""
    res = _results(spark, [(1, 10, 1)])
    qr = _qrels(spark, [(1, 10, 1), (2, 20, 1)])
    out = {r.qid: r for r in ranking_metrics(res, qr, k=5, doc_col="doc_id").collect()}
    assert set(out) == {1, 2}
    assert out[2].hits == 0 and out[2].ndcg == 0.0 and out[2].mrr == 0.0


def test_unjudged_query_dropped_and_rel_zero_not_relevant(spark):
    """Queries with no positive judgments are excluded (rel=0 rows are
    explicit negatives, not relevance)."""
    res = _results(spark, [(1, 10, 1), (3, 30, 1)])
    qr = _qrels(spark, [(1, 10, 1), (3, 30, 0)])
    out = ranking_metrics(res, qr, k=5, doc_col="doc_id")
    assert [r.qid for r in out.collect()] == [1]


def test_ranks_past_k_ignored(spark):
    res = _results(spark, [(1, 10, 1), (1, 11, 7)])
    qr = _qrels(spark, [(1, 10, 1), (1, 11, 1)])
    row = ranking_metrics(res, qr, k=5, doc_col="doc_id").first()
    assert row.hits == 1 and abs(row.recall_at_k - 0.5) < 1e-12


def test_macro_metrics_averages(spark):
    res = _results(spark, [(1, 10, 1), (2, 99, 1)])
    qr = _qrels(spark, [(1, 10, 1), (2, 20, 1)])
    per = ranking_metrics(res, qr, k=1, doc_col="doc_id")
    m = macro_metrics(per).first()
    assert m.n_queries == 2
    assert abs(m.recall_at_k - 0.5) < 1e-12  # (1.0 + 0.0) / 2
    assert abs(m.mrr - 0.5) < 1e-12
    assert abs(m.ndcg - 0.5) < 1e-12


def test_k_validation():
    with pytest.raises(ValueError, match="k must be"):
        ranking_metrics(None, None, k=0)


def test_no_python_udfs_in_plan(spark):
    """The whole metric algebra stays JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes anywhere in the plan."""
    res = _results(spark, [(1, 10, 1)])
    qr = _qrels(spark, [(1, 10, 1)])
    plan = ranking_metrics(res, qr, k=3, doc_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_self_excluded_fixture_gate_values(spark):
    """The catalog gate's qrels exclude the self row, so rank-1 self
    hits must NOT yield mrr == 1 for every query: at least one fixture
    query has its first relevant hit past rank 1."""
    from distributedvectordatabase_spark.catalog import _run_retrieval_eval

    from tests.conftest import SF_SMALL

    rows = _run_retrieval_eval(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(0.0 <= r.ndcg <= 1.0 and 0.0 <= r.mrr <= 1.0 for r in rows)
    assert any(r.mrr < 1.0 for r in rows)
