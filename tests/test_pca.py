"""PCA invariants (reference O3, load_coco_embeddings.py:24-36).
Since r8 the declared query is HASH-checked by an independent NumPy
eigh oracle (catalog._pca_oracle); these tests keep the complementary
contracts: explained variance behavior, orthonormal-projection norm
bound, and run-to-run determinism."""

import math

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.pca import pca_reduce
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _explained(df):
    return df.select("explained_variance_sum").first()[0]


def test_output_shape_and_explained_variance_monotone(spark):
    emb = load_table(spark, "embeddings", SF_SMALL)
    n = emb.count()
    r16 = pca_reduce(emb, k=16)
    assert r16.count() == n
    assert all(len(r.pca) == 16 for r in r16.limit(20).collect())
    e4, e16 = _explained(pca_reduce(emb, k=4)), _explained(r16)
    assert 0.0 < e4 <= e16 <= 1.0 + 1e-9, (e4, e16)


def test_projection_norm_bounded_by_input_norm(spark):
    """Projection onto an orthonormal basis cannot grow the norm:
    ||P^T x||^2 <= ||x||^2 for every row."""
    emb = load_table(spark, "embeddings", SF_SMALL)
    sq = "aggregate(transform({c}, x -> cast(x*x as double)), 0.0D, (s, x) -> s + x)"
    joined = (
        pca_reduce(emb, k=16)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            F.expr(sq.format(c="pca")).alias("proj_sq"),
            F.expr(sq.format(c="embedding")).alias("in_sq"),
        )
    )
    bad = joined.filter(F.col("proj_sq") > F.col("in_sq") + 1e-6).count()
    assert bad == 0


def test_components_sign_canonical(spark):
    """Every component's largest-|loading| coordinate is positive after
    canonicalization, and flipping an input copy of the basis by the
    computed signs is idempotent — the property that makes projections
    deterministic under eigen-sign indeterminacy."""
    import numpy as np
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    from distributedvectordatabase_spark.operators.pca import component_signs

    emb = load_table(spark, "embeddings", SF_SMALL)
    feats = emb.select(array_to_vector(F.col("embedding")).alias("_features"))
    model = PCA(k=8, inputCol="_features", outputCol="_p").fit(feats)
    pc = np.asarray(model.pc.toArray(), dtype=np.float64)
    signs = np.array(component_signs(model.pc))
    canon = pc * signs  # what pca_reduce effectively projects with
    for j in range(canon.shape[1]):
        assert canon[np.argmax(np.abs(canon[:, j])), j] > 0
    assert component_signs(canon) == [1.0] * canon.shape[1]


def test_sign_canonical_output_pinned(spark):
    """Projections are invariant to an adversarial sign flip of the
    basis: projecting with (pc * flip) then canonicalizing equals
    projecting with canonical pc — i.e. the output no longer depends
    on which sign the eigensolver happened to return."""
    import numpy as np
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    from distributedvectordatabase_spark.operators.pca import component_signs

    emb = load_table(spark, "embeddings", SF_SMALL)
    feats = emb.select("vec_id", array_to_vector(F.col("embedding")).alias("_features"))
    model = PCA(k=4, inputCol="_features", outputCol="_p").fit(feats)
    pc = np.asarray(model.pc.toArray(), dtype=np.float64)
    X = np.array(
        [r._features.toArray() for r in feats.orderBy("vec_id").collect()]
    )
    flip = np.array([1.0, -1.0, -1.0, 1.0])
    base = X @ (pc * np.array(component_signs(pc)))
    flipped_basis = pc * flip
    after_canon = X @ (flipped_basis * np.array(component_signs(flipped_basis)))
    np.testing.assert_allclose(after_canon, base, rtol=0, atol=1e-12)


def test_matches_numpy_eigendecomposition_oracle(spark):
    """True-value oracle for O3 (reference runs sklearn PCA,
    load_coco_embeddings.py:24-36): Spark ML PCA's sign-canonicalized
    projections must match a NumPy covariance-eigendecomposition PCA
    canonicalized the same way. Spark ML computes components from the
    (n-1)-normalized covariance but transform() does NOT mean-center,
    so the oracle is X @ V_canon with V from eigh(cov(X)). Components
    with well-separated eigenvalues are unique up to sign, which the
    canonicalization fixes — making values comparable to float
    tolerance, a strictly stronger check than the invariants above."""
    import numpy as np

    from distributedvectordatabase_spark.operators.pca import component_signs

    emb = load_table(spark, "embeddings", SF_SMALL)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)

    k = 6
    cov = np.cov(X, rowvar=False)  # (n-1) normalization, like Spark ML
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    # skip if any adjacent kept eigenvalues are near-degenerate (rotation
    # within the subspace would make per-component comparison ill-posed)
    lam = evals[order]
    if np.any(np.abs(np.diff(lam)) / lam[:-1] < 1e-6):
        pytest.skip("degenerate eigenvalues: per-component compare ill-posed")
    V = evecs[:, order]
    V = V * np.array(component_signs(V))
    want = X @ V

    got_rows = pca_reduce(emb, k=k).orderBy("vec_id").collect()
    got = np.array([list(r.pca) for r in got_rows])
    # pca_reduce quantizes to 1e-6; compare at that grain
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)
    emb = load_table(spark, "embeddings", SF_SMALL)

    def canon(df):
        return sorted(
            (r.vec_id, tuple(r.pca)) for r in df.limit(50).collect()
        )

    a, b = canon(pca_reduce(emb, k=8)), canon(pca_reduce(emb, k=8))
    assert a == b
    for (_, va), (_, vb) in zip(a, b):
        assert all(math.isfinite(x) for x in va) and va == vb
