"""Property-based tests for operators.knn.batch_topk — the argpartition
prefilter + boundary-tie guard is the subtlest numpy code in the hot
path, so it gets a brute-force reference check under adversarial tie
structure (few distinct values force tie groups straddling the `take`
boundary, exactly the case the guard exists for)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedvectordatabase_spark.operators.knn import batch_topk


def _reference_topk(D, ids, k):
    """Plain per-row lexsort by (value, id) — O(nc log nc), obviously
    correct."""
    out_id, out_d = [], []
    for row in D:
        order = np.lexsort((ids, row))[: min(k, len(ids))]
        out_id.append(ids[order])
        out_d.append(row[order])
    return np.array(out_id), np.array(out_d)


@settings(max_examples=200, deadline=None)
@given(
    nq=st.integers(1, 5),
    nc=st.integers(1, 40),
    k=st.integers(1, 12),
    n_values=st.integers(1, 4),  # few distinct distances → wide tie groups
    seed=st.integers(0, 2**31 - 1),
)
def test_matches_bruteforce_under_ties(nq, nc, k, n_values, seed):
    rng = np.random.default_rng(seed)
    values = rng.uniform(0.0, 4.0, size=n_values)
    D = values[rng.integers(0, n_values, size=(nq, nc))]
    ids = rng.permutation(np.arange(nc, dtype=np.int64) * 3 + 1)
    sel_id, sel_d = batch_topk(D, ids, k, take=2 * k)
    ref_id, ref_d = _reference_topk(D, ids, k)
    np.testing.assert_array_equal(sel_id, ref_id)
    np.testing.assert_array_equal(sel_d, ref_d)


@settings(max_examples=50, deadline=None)
@given(
    nc=st.integers(1, 30),
    k=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_masked_inf_rows_survive(nc, k, seed):
    """+inf entries (shard-masked rows) must sort last and never panic
    the boundary-tie guard; all-inf rows yield inf distances whose ids
    are irrelevant by contract."""
    rng = np.random.default_rng(seed)
    D = rng.uniform(0.0, 1.0, size=(3, nc))
    mask = rng.random((3, nc)) < 0.5
    D[mask] = np.inf
    ids = np.arange(nc, dtype=np.int64)
    sel_id, sel_d = batch_topk(D, ids, k, take=2 * k)
    for r in range(3):
        finite_ref = np.lexsort((ids, D[r]))[: min(k, nc)]
        finite_n = int(np.isfinite(D[r]).sum())
        got_finite = sel_d[r][np.isfinite(sel_d[r])]
        want_finite = D[r][finite_ref][np.isfinite(D[r][finite_ref])]
        np.testing.assert_array_equal(got_finite, want_finite)
        # finite entries come first and are capped by what exists
        assert len(got_finite) == min(k, finite_n, nc)
