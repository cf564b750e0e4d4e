"""Property-based tests (hypothesis) for SQ8 scalar quantization:
driver-side numpy invariants (no Spark session needed) — the defining
error bound, code-range totality, determinism, and the asymmetric
distance estimate's error bound that makes rerank shortlists sound."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from distributedvectordatabase_spark.operators.sq import SQParams

DIM = 8

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32)
vec = st.lists(finite, min_size=DIM, max_size=DIM)
mat = st.lists(vec, min_size=2, max_size=16)


def _params(X: np.ndarray) -> SQParams:
    return SQParams(vmin=X.min(axis=0), vmax=X.max(axis=0))


@given(mat)
@settings(max_examples=200, deadline=None)
def test_roundtrip_error_within_half_cell(rows):
    X = np.array(rows, dtype=np.float64)
    p = _params(X)
    err = np.abs(p.decode_np(p.encode_np(X)) - X)
    # in-range coordinates (training data IS in range) stay within Δ/2
    assert np.all(err <= p.delta[None, :] / 2.0 + 1e-9)


@given(mat)
@settings(max_examples=200, deadline=None)
def test_codes_total_and_deterministic(rows):
    X = np.array(rows, dtype=np.float64)
    p = _params(X)
    c1, c2 = p.encode_np(X), p.encode_np(X.copy())
    assert c1.dtype == np.uint8 and np.array_equal(c1, c2)
    # train-range extremes land on the boundary codes
    assert np.all(c1.min(axis=0) == 0) or np.all(p.delta == 0)


@given(mat, vec)
@settings(max_examples=200, deadline=None)
def test_out_of_range_saturates(rows, q):
    X = np.array(rows, dtype=np.float64)
    p = _params(X)
    far = np.array([q], dtype=np.float64) * 10.0
    codes = p.encode_np(far)
    assert np.all((codes >= 0) & (codes <= 255))


@given(mat, vec)
@settings(max_examples=100, deadline=None)
def test_asymmetric_distance_error_bound(rows, q):
    """|est - true| per squared-L2 is bounded by the reconstruction
    error: ||q-x̂||² vs ||q-x||² differ by at most
    (2·||q-x|| + ||x-x̂||)·||x-x̂|| — check the direct triangle form
    ‖sqrt(est) - sqrt(true)‖ <= ||x - x̂|| <= ||Δ||/2."""
    X = np.array(rows, dtype=np.float64)
    p = _params(X)
    Q = np.array(q, dtype=np.float64)
    Xh = p.decode_np(p.encode_np(X))
    true_d = np.sqrt(((X - Q[None, :]) ** 2).sum(axis=1))
    est_d = np.sqrt(((Xh - Q[None, :]) ** 2).sum(axis=1))
    bound = np.sqrt((p.delta**2).sum()) / 2.0 + 1e-6
    assert np.all(np.abs(est_d - true_d) <= bound)
