"""OPQ-lite (PCA rotation + PQ fit together): the rotation must be
orthogonal (L2-preserving), beat unrotated PQ on correlated data, and
round-trip through IVFStore.build_pq(opq=True)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.knn import knn, recall_at_k
from distributedvectordatabase_spark.operators.opq import (
    OPQModel,
    fit_rotation,
    opq_encode,
    opq_search,
    opq_train,
)
from distributedvectordatabase_spark.operators.pq import (
    pq_encode,
    pq_reconstruction_mse,
    pq_search,
    pq_train,
)
from distributedvectordatabase_spark.sources.ivf_store import IVFStore

K = 10


@pytest.fixture(scope="module")
def lowrank(spark):
    """2k × 64-D corpus on a seeded rank-8 subspace (+1% noise) — the
    correlated geometry where blockwise PQ loses and a PCA rotation
    wins (the small twin of the BASELINE rank-32 512-D probe)."""
    rng = np.random.RandomState(5)
    P = rng.standard_normal((8, 64)) / np.sqrt(8)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            r = np.random.RandomState(int(ids[0]) % (2**31))
            Z = r.standard_normal((len(ids), 8))
            X = Z @ P + 0.01 * r.standard_normal((len(ids), 64))
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    return (
        spark.range(2000, numPartitions=8)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
        .cache()
    )


@pytest.fixture(scope="module")
def queries(lowrank):
    return (
        lowrank.orderBy("vec_id")
        .limit(20)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .cache()
    )


def test_rotation_is_orthogonal(spark, lowrank):
    R = fit_rotation(lowrank)
    assert R.shape == (64, 64)
    np.testing.assert_allclose(R.T @ R, np.eye(64), atol=1e-8)


def test_opq_beats_plain_pq_on_correlated_data(spark, lowrank, queries):
    """The point of the rotation: on rank-8-in-64-D data, blockwise
    subspaces without rotation each see near-isotropic noise; in the
    PCA basis the variance concentrates in the first block, so the
    same m·nbits budget loses far less — raw-ADC recall and MSE must
    both improve."""
    model = opq_train(lowrank, m=8, nbits=4, seed=7)
    cb_plain = pq_train(lowrank, m=8, nbits=4, seed=7)

    exact = knn(lowrank, queries, k=K)
    codes_opq = opq_encode(lowrank, model).cache()
    codes_pq = pq_encode(lowrank, cb_plain).cache()

    r_opq = recall_at_k(exact, opq_search(codes_opq, model, queries, k=K), K)
    r_pq = recall_at_k(exact, pq_search(codes_pq, cb_plain, queries, k=K), K)
    assert r_opq > r_pq, (r_opq, r_pq)

    mse_opq = pq_reconstruction_mse(lowrank, model.cb, rotation=model.R)
    mse_pq = pq_reconstruction_mse(lowrank, cb_plain)
    assert mse_opq < mse_pq, (mse_opq, mse_pq)


def test_opq_rerank_uses_original_space(spark, lowrank, queries):
    """Exact rerank probes the ORIGINAL vectors (the rotation is
    L2-preserving), so rerank recall is >= raw-ADC recall and the
    self-query lands at rank 1 with ~0 distance."""
    model = opq_train(lowrank, m=8, nbits=4, seed=7)
    codes = opq_encode(lowrank, model).cache()
    raw = recall_at_k(exact := knn(lowrank, queries, k=K),
                      opq_search(codes, model, queries, k=K), K)
    rer = opq_search(codes, model, queries, k=K, rerank=4, corpus=lowrank)
    r_rer = recall_at_k(exact, rer, K)
    assert r_rer >= raw
    top1 = {r.qid: r for r in rer.collect() if r.rnk == 1}
    assert all(r.neighbor_id == qid and r.dist <= 1e-9 for qid, r in top1.items())


def test_opq_model_roundtrip():
    rng = np.random.RandomState(0)
    from distributedvectordatabase_spark.operators.pq import PQCodebook

    m = OPQModel(
        R=rng.standard_normal((8, 8)),
        cb=PQCodebook(centroids=rng.standard_normal((2, 4, 4)), dim=8),
    )
    back = OPQModel.from_dict(m.to_dict())
    np.testing.assert_array_equal(back.R, m.R)
    np.testing.assert_array_equal(back.cb.centroids, m.cb.centroids)


def test_ivfstore_opq_roundtrip(spark, lowrank, queries, tmp_path):
    """build_pq(opq=True) persists the rotation; knn_pq applies it and
    stays exact on self-queries; append encodes with the same basis."""
    store = IVFStore(str(tmp_path / "idx"), n_cells=4)
    store.build(lowrank.filter("vec_id < 1800"))
    store.build_pq(spark, m=8, nbits=4, opq=True)
    assert store.pq_rotation() is not None and store.pq_is_residual()

    res = store.knn_pq(spark, queries.limit(5), k=5, n_probe=4, rerank=4)
    top1 = {r.qid: r for r in res.collect() if r.rnk == 1}
    assert all(r.neighbor_id == qid and r.dist <= 1e-9 for qid, r in top1.items())

    store.append(lowrank.filter("vec_id >= 1800"))
    codes = spark.read.parquet(store._pq_path)
    assert codes.count() == 2000
    q = (
        lowrank.filter("vec_id = 1900")
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    top = store.knn_pq(spark, q, k=3, n_probe=4, rerank=2).collect()
    best = min(top, key=lambda r: r.rnk)
    assert best.neighbor_id == 1900 and best.dist <= 1e-9
