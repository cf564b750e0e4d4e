#!/usr/bin/env python
"""Scale probe (opt-in; not part of the driver BENCH contract).

The driver testdata's embeddings table is small (2k rows at sf0.1), so
``bench.py``'s vector numbers are overhead-dominated. This probe
generates an N-row 64-D corpus *distributed* (one pandas_udf batch per
partition — the driver never holds the data), builds the bucketed
store, and measures the paths whose scaling actually matters:

- bucketed ingest (LSH assign + partitioned write) rows/s
- exact batch kNN via the Arrow/BLAS partial top-k (scan-bound path)
- LSH-pruned kNN (partition pruning + per-query equi-join)

Usage: python bench_scale.py [N_ROWS] [DIM]   (default 500_000 64; DIM=512
matches the reference design point, generate_coco_embeddings.py 512-D PCA)
Prints one JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.knn import knn, recall_at_k
from distributedvectordatabase_spark.session import get_spark
from distributedvectordatabase_spark.sources.vector_store import VectorStore

DIM = 64  # overridden by argv[2]


def synth_corpus(spark, n_rows: int, partitions: int, dim: int = DIM):
    """Deterministic synthetic corpus, generated inside executors."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            X = rng.standard_normal((len(ids), dim)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    return (
        spark.range(n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else DIM
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dvdb-bench-scale", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="dvdb_scale_")
    from distributedvectordatabase_spark.functions.lsh import SignLSH

    store = VectorStore(os.path.join(tmp, "store"), SignLSH(dim=dim))
    corpus = synth_corpus(spark, n_rows, partitions=int(cpus), dim=dim)

    # absorb Python-worker launch so the ingest number measures
    # generate+assign+shuffle+write, not process startup
    spark.range(int(cpus)).mapInPandas(lambda it: it, schema="id long").count()

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    store.write(corpus, validate_dim=False)
    timings["ingest_bucketed_write"] = round(time.perf_counter() - t0, 3)

    loaded = store.read(spark)
    queries = (
        loaded.orderBy("vec_id")
        .limit(20)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .cache()
    )
    queries.count()

    def timed_min(fn, reps: int = 2) -> float:
        """Min of ``reps`` runs — the VM's CPU-steal noise is multiplicative,
        so the minimum is the honest steady-state estimate."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    exact = knn(loaded, queries, k=10, impl="arrow")
    timings["knn_exact_arrow_20q"] = timed_min(lambda: exact.count())

    big_queries = (
        loaded.orderBy("vec_id")
        .limit(200)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .cache()
    )
    big_queries.count()
    exact_big = knn(loaded, big_queries, k=10, impl="arrow")
    timings["knn_exact_arrow_200q"] = timed_min(lambda: exact_big.count())

    approx = store.knn(spark, queries, k=10, pruned=True, num_candidates=2)
    timings["knn_pruned_2of3_20q"] = timed_min(lambda: approx.count())

    approx_expr = store.knn(spark, queries, k=10, pruned=True, num_candidates=2, impl="expr")
    timings["knn_pruned_expr_20q"] = timed_min(lambda: approx_expr.count())

    recall = round(recall_at_k(exact, approx, 10), 4)

    # IVFPQ: cell-partitioned compressed index — the path whose scan
    # cost is bytes-of-codes, not bytes-of-floats
    from distributedvectordatabase_spark.sources.ivf_store import IVFStore

    ivf = IVFStore(os.path.join(tmp, "ivfpq"), n_cells=16)
    t0 = time.perf_counter()
    ivf.build(loaded)
    timings["ivf_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ivf.build_pq(spark, m=16, nbits=6)
    timings["ivfpq_encode"] = round(time.perf_counter() - t0, 3)
    ivfpq = ivf.knn_pq(spark, queries, k=10, n_probe=4, rerank=4)
    timings["ivfpq_probe4_rerank4_20q"] = timed_min(lambda: ivfpq.count())
    recall_ivfpq = round(recall_at_k(exact, ivfpq, 10), 4)

    print(
        json.dumps(
            {
                "metric": "scale_probe_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "n_rows": n_rows,
                "dim": dim,
                "recall_at_10_pruned": recall,
                "recall_at_10_ivfpq": recall_ivfpq,
                "ingest_rows_per_s": round(n_rows / timings["ingest_bucketed_write"]),
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
