"""IVF-style approximate nearest neighbor — the 100 TB scale path.

The reference's only ANN mechanism is LSH shard pruning (probe 2 of 3
shards). An IVF (inverted-file) index generalizes that: partition the
corpus into n_cells Voronoi cells around KMeans centroids, store
cell_id as a partition column, and probe only the n_probe cells whose
centroids are nearest the query. Same Spark shape as the LSH path —
``cell_id IN (...)`` partition pruning + per-query equi-join — so scan
cost drops by ~n_probe/n_cells while the plan stays declarative.

Centroid fit is ``pyspark.ml.clustering.KMeans`` (distributed Lloyd's;
the model is a tiny driver-side matrix, broadcast for assignment).
Rows-only declared query (KMeans init isn't SQL-expressible); tests
assert recall against exact kNN instead.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.knn import _dist_expr


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate kNN via KMeans cells + centroid probing —
    **build-then-query demo only, refits KMeans on every call**.

    Kept as the plan-shape reference for what the IVF probe looks like
    as one self-contained DataFrame expression; it is deliberately NOT
    exported from ``operators.__init__`` so nobody ships a
    refit-per-query into production. For real workloads use
    :class:`distributedvectordatabase_spark.sources.ivf_store.IVFStore`
    (build once → cell-partitioned parquet → partition-pruned probes),
    which is what the declared ann_ivf_* queries run.

    Returns (qid, neighbor_id, dist, rnk) like exact knn().
    """
    import warnings

    warnings.warn(
        "ivf_knn refits KMeans on every call; use IVFStore.build()/knn() "
        "for anything beyond a one-off exploration",
        stacklevel=2,
    )
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    feats = corpus.select(
        id_col, vec_col, array_to_vector(F.col(vec_col)).alias("_features")
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="_cell").fit(feats)
    assigned = model.transform(feats).select(id_col, vec_col, "_cell")

    from distributedvectordatabase_spark.operators.knn import collect_query_batch

    centers = np.array([np.asarray(c) for c in model.clusterCenters()])  # (n_cells, d)
    qrows = collect_query_batch(queries, qid_col, qvec_col)
    probe_pairs = []
    for r in qrows:
        qv = np.asarray(list(r[qvec_col]), dtype=np.float64)
        d2 = ((centers - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d2)[:n_probe]:
            probe_pairs.append((int(r[qid_col]), int(cell)))
    probe_df = spark.createDataFrame(probe_pairs, schema=f"{qid_col} long, _cell int")

    pairs = assigned.join(
        F.broadcast(queries.select(qid_col, qvec_col).join(probe_df, qid_col)), on="_cell"
    )
    scored = pairs.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("neighbor_id"),
        (
            F.floor(_dist_expr(metric, qvec_col, vec_col) * F.lit(1e6) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("dist"),
    )
    w = Window.partitionBy("qid").orderBy("dist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= max(int(k), 1))
        .select("qid", "neighbor_id", "dist", "rnk")
    )
