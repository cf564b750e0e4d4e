"""Binary quantization (operators/bq.py): exact sign-bit pack, integer
Hamming identities, plan shape (no join nodes, partial-before-final
top-k), full-rerank equality with exact kNN, and monotone recall in
the rerank budget."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.bq import (
    BITS_PER_WORD,
    bq_encode,
    bq_knn,
    bq_topk,
    n_words,
)
from distributedvectordatabase_spark.operators.knn import knn, recall_at_k
from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture
from tests.conftest import SF_DIR

DIM = 64


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return queries_fixture(spark, SF_DIR, n=8)


def _np_pack(v: np.ndarray) -> list[int]:
    out = []
    for w in range(n_words(len(v))):
        x = 0
        for j in range(BITS_PER_WORD):
            i = w * BITS_PER_WORD + j
            if i < len(v) and v[i] > 0:
                x |= 1 << j
        out.append(x)
    return out


def test_encode_matches_numpy_reference(corpus):
    rows = corpus.orderBy("vec_id").limit(20).collect()
    enc = bq_encode(corpus, DIM).orderBy("vec_id").limit(20).collect()
    for r, e in zip(rows, enc):
        assert list(e.bq_code) == _np_pack(np.array(r.embedding)), r.vec_id


def test_encode_word_width_avoids_sign_bit(corpus):
    """32-bit words: every packed word fits in [0, 2^32) so the DuckDB
    oracle's checked ``<<`` arithmetic is reproducible."""
    mx = (
        bq_encode(corpus, DIM)
        .select(F.explode("bq_code").alias("w"))
        .agg(F.max("w"), F.min("w"))
        .first()
    )
    assert 0 <= mx[1] and mx[0] < 2**32


def test_self_query_is_rank1_at_hamming_zero(spark, corpus, queries):
    codes = bq_encode(corpus, DIM)
    qcodes = bq_encode(queries, DIM, "qvec", out_col="qcode")
    top = bq_topk(
        codes.select("vec_id", "bq_code"), qcodes.select("qid", "qcode"), k=5
    )
    r1 = {r.qid: (r.neighbor_id, r.hamming) for r in top.collect() if r.rnk == 1}
    assert r1 == {q: (q, 0) for q in r1}


def test_topk_plan_has_no_join_and_partial_topk(spark, corpus, queries):
    """The scoring stage must be a literal fan-out over ONE corpus scan
    (no join operator of any kind) with the partial window before the
    final qid exchange."""
    codes = bq_encode(corpus, DIM)
    qcodes = bq_encode(queries, DIM, "qvec", out_col="qcode")
    top = bq_topk(
        codes.select("vec_id", "bq_code"), qcodes.select("qid", "qcode"), k=5
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 2  # partial (qid, _part) then final (qid)


def test_full_rerank_budget_equals_exact_knn(spark, corpus, queries):
    n = corpus.count()
    approx = bq_knn(corpus, queries, dim=DIM, k=5, rerank=(n // 5) + 1)
    exact = knn(corpus, queries, k=5, metric="l2sq")
    a = sorted((r.qid, r.neighbor_id, r.rnk) for r in approx.collect())
    e = sorted((r.qid, r.neighbor_id, r.rnk) for r in exact.collect())
    assert a == e


def test_recall_monotone_in_rerank_and_floor(spark, corpus, queries):
    """More rerank budget can only help (the shortlist grows by
    construction); pin a conservative floor at rerank=8 on the iid
    gaussian testdata — sign-bit Hamming is an ANGULAR proxy scoring
    an L2 ground truth here, the honest worst case."""
    exact = knn(corpus, queries, k=10, metric="l2sq")
    r2 = recall_at_k(exact, bq_knn(corpus, queries, dim=DIM, k=10, rerank=2), 10)
    r8 = recall_at_k(exact, bq_knn(corpus, queries, dim=DIM, k=10, rerank=8), 10)
    assert r8 >= r2
    assert r8 >= 0.60, r8


def test_partitioning_independence(spark, corpus, queries):
    codes = bq_encode(corpus, DIM).select("vec_id", "bq_code")
    qcodes = bq_encode(queries, DIM, "qvec", out_col="qcode").select("qid", "qcode")
    a = bq_topk(codes, qcodes, k=7).collect()
    b = bq_topk(codes.repartition(13), qcodes, k=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
