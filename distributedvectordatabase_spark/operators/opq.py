"""OPQ-lite: PCA-rotated product quantization as a first-class pipeline.

Product quantization chops the vector into ``m`` contiguous coordinate
blocks and quantizes each independently — which fights correlated
coordinates: variance that straddles a block boundary is quantized
twice, badly. OPQ (Ge et al., "Optimized Product Quantization",
CVPR 2013) fixes this with an orthogonal change of basis before the
split; its PCA-initialized variant (their §4.1 "OPQ-P", also the
classic "PCA + PQ" recipe from Jégou et al.) is rotation = the
principal axes, which decorrelates coordinates in one shot. An
orthogonal rotation preserves every L2 distance exactly, so search
semantics are unchanged — only the quantization error drops.

This was validated piecewise in r4 (`pca_reduce` → `pq_train`,
tests/test_pq.py: 0.92 recall on the rank-32 512-D synthetic vs
0.11–0.28 unrotated); this module packages it as one model object:

- :func:`fit_rotation` — distributed covariance eigenbasis
  (pyspark.ml PCA with k = dim, sign-canonicalized like
  operators/pca.pca_reduce) returned as a (dim, dim) numpy matrix.
- :func:`opq_train` — fit rotation + codebooks together → OPQModel.
- :func:`opq_encode` / :func:`opq_search` — the pq_encode / pq_search
  surface with the model's rotation applied inside the same Arrow
  passes (no rotated copy of the corpus is ever materialized); exact
  rerank probes the ORIGINAL vectors (valid because the rotation is
  L2-preserving).

`IVFStore.build_pq(opq=True)` composes the same rotation with
residual encoding (rotation fit on the residuals, persisted in the
codebook sidecar) — OPQ-IVFPQ-lite.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.pq import (
    PQCodebook,
    pq_encode,
    pq_search,
    pq_train,
)

__all__ = ["OPQModel", "fit_rotation", "opq_train", "opq_encode", "opq_search"]


def fit_rotation(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int | None = None,
) -> np.ndarray:
    """Sign-canonical full PCA basis of ``vec_col`` as a (dim, dim)
    numpy rotation (columns = components, max-|loading| positive —
    same canonicalization as operators/pca.pca_reduce, so the basis is
    deterministic for a given Spark/BLAS build). The covariance pass
    is distributed; only the dim×dim eigenproblem runs driver-side.

    ``m`` enables **eigenvalue allocation** (Ge et al. §3.3, the step
    that makes OPQ-P work): raw PCA order concentrates all variance in
    the first subspace block, which then drowns its few centroids
    while the noise blocks waste theirs — measurably WORSE than no
    rotation on low-rank data (0.13 vs 0.60 recall on the rank-8
    fixture, tests/test_opq.py). Components are instead assigned
    greedily, largest eigenvalue first, to the open block with the
    smallest current eigenvalue SUM, so every block carries a
    comparable share of variance and each quantizer's bit budget is
    actually used. (The paper balances the eigenvalue PRODUCT; a
    naive log-sum greedy of that is ill-conditioned — with λ < 1 the
    log is negative, so the first block "shrinks" as it hoards and
    greedy-min feeds it every top component, reproducing exactly the
    degenerate layout allocation exists to prevent, and near-zero
    eigenvalues make log terms unbounded. The capacity-limited SUM
    balance is the robust surrogate and coincides with product
    balance when block sizes are equal and eigenvalues comparable.)
    Pass the same ``m`` you will train PQ with."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    from distributedvectordatabase_spark.operators.pca import component_signs

    dim = len(df.select(vec_col).first()[0])
    feats = df.select(array_to_vector(F.col(vec_col)).alias("_features"))
    model = PCA(k=dim, inputCol="_features", outputCol="_pca").fit(feats)
    R = np.asarray(model.pc.toArray(), dtype=np.float64)  # (dim, dim)
    R = R * np.asarray(component_signs(model.pc), dtype=np.float64)[None, :]
    if m is None:
        return R
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ev = np.asarray(model.explainedVariance.toArray(), dtype=np.float64)
    order = np.argsort(-ev)  # λ descending (Spark already sorts; be safe)
    buckets: list[list[int]] = [[] for _ in range(m)]
    var_sum = np.zeros(m)
    for i in order:
        open_b = [j for j in range(m) if len(buckets[j]) < dsub]
        j = min(open_b, key=lambda j: var_sum[j])
        buckets[j].append(int(i))
        var_sum[j] += ev[i]
    perm = [i for b in buckets for i in b]
    return R[:, perm]


@dataclass(frozen=True)
class OPQModel:
    """Rotation + codebooks fit together; ``R`` is orthogonal
    (dim, dim), ``cb`` is trained on the rotated vectors."""

    R: np.ndarray
    cb: PQCodebook

    @property
    def dim(self) -> int:
        return self.cb.dim

    def to_dict(self) -> dict:
        return {**self.cb.to_dict(), "rotation": self.R.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "OPQModel":
        return cls(
            R=np.array(d["rotation"], dtype=np.float64),
            cb=PQCodebook.from_dict(d),
        )


def opq_train(
    df: DataFrame,
    m: int = 8,
    nbits: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **pq_kwargs,
) -> OPQModel:
    """Fit the PCA rotation (with eigenvalue allocation for ``m``
    subspaces) and the PQ codebooks (on rotated vectors) in one call;
    ``pq_kwargs`` pass through to pq_train (sample, seed, iters)."""
    R = fit_rotation(df, vec_col=vec_col, id_col=id_col, m=m)
    cb = pq_train(
        df, vec_col=vec_col, m=m, nbits=nbits, id_col=id_col,
        rotation=R, **pq_kwargs,
    )
    return OPQModel(R=R, cb=cb)


def opq_encode(
    df: DataFrame,
    model: OPQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """pq_encode in the model's basis — same (id, codes) output."""
    return pq_encode(
        df, model.cb, id_col=id_col, vec_col=vec_col,
        keep_cols=keep_cols, rotation=model.R,
    )


def opq_search(
    codes: DataFrame,
    model: OPQModel,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 0,
    corpus: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """pq_search in the model's basis; ``corpus`` (for rerank) stays
    the ORIGINAL vectors — the rotation is orthogonal, so the exact
    rescored distances are the original-space distances."""
    return pq_search(
        codes, model.cb, queries, k=k, rerank=rerank, corpus=corpus,
        rotation=model.R, **kw,
    )
