"""Property-based tests (hypothesis) for the seeded sign-LSH, plus a
four-way implementation-consistency check: the numpy driver path, the
pandas_udf batch path, the pure-Catalyst expression, and the registered
SQL function must bucket every vector identically — ingest-time and
query-time routing disagreeing is the worst silent failure this engine
could have."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.operators.knn import batch_topk

LSH = SignLSH()  # engine default: dim 64, 4 fns × 3 tables, seed 42

vec64 = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=64,
    max_size=64,
)


@given(vec64)
@settings(max_examples=200, deadline=None)
def test_candidate_shards_properties(v):
    for nc in (1, 2, 3):
        cands = LSH.candidate_shards(v, num_candidates=nc)
        assert len(cands) == nc
        assert len(set(cands)) == nc
        assert all(0 <= c < LSH.num_tables for c in cands)
        assert cands[0] == int(LSH.bucket_of(np.array(v))[0])


@given(vec64, st.floats(min_value=0.001, max_value=1000, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_bucket_invariant_under_positive_scaling(v, scale):
    """Sign bits don't move under positive scaling — this is why the
    reference's pre-normalization can't change any bucket (SURVEY §1.2)
    and why we skip it in the hashed expression."""
    a = np.array(v, dtype=np.float64)
    assert LSH.bucket_of(a)[0] == LSH.bucket_of(a * scale)[0]


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_bucket_range_for_any_seed(seed):
    lsh = SignLSH(dim=8, seed=seed)
    v = np.random.RandomState(seed).randn(16, 8)
    b = lsh.bucket_of(v)
    assert ((b >= 0) & (b < lsh.num_tables)).all()


def test_all_bucket_impls_agree(spark):
    """numpy == pandas_udf == Catalyst expr == registered SQL function,
    over 300 random vectors (including zero and tiny-norm vectors)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.functions.register import register_sql_functions

    rng = np.random.RandomState(7)
    X = rng.randn(300, 64).astype(np.float32)
    X[0] = 0.0  # zero vector
    X[1] *= 1e-30  # denormal-ish norms
    want = LSH.bucket_of(X)

    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        schema="vec_id long, embedding array<float>",
    )
    udf_ids = [r.b for r in LSH.assign(df, out="b").orderBy("vec_id").select("b").collect()]
    expr_ids = [
        r.b
        for r in df.withColumn("b", LSH.bucket_expr("embedding")).orderBy("vec_id").select("b").collect()
    ]
    register_sql_functions(spark, LSH)
    df.createOrReplaceTempView("lshprop")
    sql_ids = [
        r.b for r in spark.sql("SELECT lsh_bucket(embedding) AS b FROM lshprop ORDER BY vec_id").collect()
    ]
    assert udf_ids == list(want)
    assert expr_ids == list(want)
    assert sql_ids == list(want)


# -- batch_topk: the vectorized kNN inner kernel --------------------------

topk_case = st.tuples(
    st.integers(min_value=1, max_value=8),    # nq
    st.integers(min_value=1, max_value=40),   # ncols
    st.integers(min_value=1, max_value=15),   # k
    st.integers(min_value=0, max_value=2**31),  # seed
)


@given(topk_case)
@settings(max_examples=200, deadline=None)
def test_batch_topk_matches_per_row_lexsort(case):
    """The whole-matrix two-argsort ranking must equal the obvious
    per-row np.lexsort oracle for every (dist, id) tie pattern —
    including duplicated distances (quantized values force ties) and
    k > ncols."""
    nq, nc, k, seed = case
    rng = np.random.RandomState(seed)
    # quantize to force distance ties; shuffled non-contiguous ids
    D = np.round(rng.rand(nq, nc) * 5) / 5.0
    ids = rng.permutation(nc * 7)[:nc].astype(np.int64)

    sel_id, sel_d = batch_topk(D, ids, k, take=2 * k)

    kk = min(k, nc)
    assert sel_id.shape == (nq, kk) and sel_d.shape == (nq, kk)
    for i in range(nq):
        order = np.lexsort((ids, D[i]))[:kk]
        assert list(sel_id[i]) == list(ids[order]), (i, seed)
        assert list(sel_d[i]) == list(D[i][order]), (i, seed)


def test_batch_topk_boundary_tie_regression():
    """50 equidistant neighbors, k=10, take=20: the prefilter can keep
    an arbitrary 20 of the tie group, but the result must still be the
    10 smallest ids (the fallback re-rank)."""
    D = np.full((1, 50), 0.25)
    ids = np.arange(50, 0, -1).astype(np.int64)  # 50..1 reversed
    sel_id, sel_d = batch_topk(D, ids, k=10, take=20)
    assert list(sel_id[0]) == list(range(1, 11))
    assert (sel_d == 0.25).all()
