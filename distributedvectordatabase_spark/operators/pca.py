"""PCA dimensionality reduction (reference O3).

The reference fits sklearn PCA on the whole corpus driver-side to
project 2048-D ResNet embeddings to 512-D before ingest
(load_coco_embeddings.py:24-36, duplicated in performance_analysis.py
and visualize_results.py). Spark-native: ``pyspark.ml.feature.PCA``
computes the covariance eigenbasis distributed (one pass + a small
driver-side eigendecomposition), so it scales to corpora that never
fit on the driver.

Sign canonicalization: an eigenvector is only defined up to ±1, so raw
projections are run-/library-dependent in sign. ``pca_reduce`` flips
each component so its largest-|loading| coordinate is positive (ties:
first index wins), making the output deterministic for a given Spark/
BLAS version — pinned by tests/test_pca.py, and since r8 hash-checked
against an INDEPENDENT NumPy ``eigh`` fit by the driver's DuckDB
oracle (catalog._pca_oracle: components inlined as literals, DuckDB
does its own projection matmul — probed exact at the 1e-6 quantum on
the gate corpus, whose eigengaps leave cross-library eigenvector noise
around 1e-11). Rotation within DEGENERATE eigenvalue subspaces would
remain implementation-defined; tests additionally assert the
*invariants* (explained variance ordering, projection norms ≤ input
norms, reconstruction error decreasing in k).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def component_signs(pc) -> list[float]:
    """±1 per principal component: +1 if the component's largest-
    absolute loading is positive, else -1 (so flipping by these signs
    canonicalizes every component to max-|loading|-positive form)."""
    arr = np.asarray(pc.toArray() if hasattr(pc, "toArray") else pc, dtype=np.float64)
    signs = []
    for j in range(arr.shape[1]):
        v = arr[np.argmax(np.abs(arr[:, j])), j]
        signs.append(-1.0 if v < 0 else 1.0)
    return signs


def pca_reduce(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` (array<float>) onto its top-k principal
    components, sign-canonicalized (see module docstring); returns
    (id_col, out_col array<double>, explained sum)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(id_col, array_to_vector(F.col(vec_col)).alias("_features"))
    model = PCA(k=k, inputCol="_features", outputCol="_pca").fit(feats)
    explained = float(sum(model.explainedVariance.toArray()))
    signs = F.array(*[F.lit(s) for s in component_signs(model.pc)])
    # engine-stable quantize (catalog._qz form), not round(): floor /
    # IEEE multiply-divide are bit-deterministic across engines
    qz = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        model.transform(feats)
        .select(
            id_col,
            F.zip_with(
                vector_to_array("_pca"), signs, lambda x, s: qz(x * s)
            ).alias(out_col),
        )
        .withColumn("explained_variance_sum", qz(F.lit(explained)))
    )
