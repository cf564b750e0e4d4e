"""PCA dimensionality reduction (reference O3).

The reference fits sklearn PCA on the whole corpus driver-side to
project 2048-D ResNet embeddings to 512-D before ingest
(load_coco_embeddings.py:24-36, duplicated in performance_analysis.py
and visualize_results.py). Spark-native: ``pyspark.ml.feature.PCA``
computes the covariance eigenbasis distributed (one pass + a small
driver-side eigendecomposition), so it scales to corpora that never
fit on the driver.

No SQL oracle: eigenvector sign/rotation is implementation-defined, so
this is a rows-only declared query; tests assert the *invariants*
(explained variance ordering, projection norms ≤ input norms,
reconstruction error decreasing in k) instead of golden values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_reduce(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` (array<float>) onto its top-k principal
    components; returns (id_col, out_col array<double>, explained sum)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(id_col, array_to_vector(F.col(vec_col)).alias("_features"))
    model = PCA(k=k, inputCol="_features", outputCol="_pca").fit(feats)
    explained = float(sum(model.explainedVariance.toArray()))
    return (
        model.transform(feats)
        .select(
            id_col,
            F.transform(vector_to_array("_pca"), lambda x: F.round(x, 6)).alias(out_col),
        )
        .withColumn("explained_variance_sum", F.round(F.lit(explained), 6))
    )
