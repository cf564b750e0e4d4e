"""NPZ embedding-corpus source/sink (reference O1 parity).

The reference's corpus interchange format is a NumPy ``.npz`` with
parallel arrays ``embeddings: float32[n, d]`` and ``image_ids: int[n]``
(load_coco_embeddings.py:17-22, generate_coco_embeddings.py:87-91).
Parquet is our canonical format; NPZ support exists to onboard such a
corpus without a separate conversion step.

NPZ is a single compressed blob with no row-group structure, so it is
inherently a driver-side read (the reference loads it fully into RAM
too). The Spark-side pattern is: driver loads → Arrow-backed
``createDataFrame`` in slices → immediately land as Parquet via
``VectorStore.write`` and never touch the NPZ again. For corpora that
exceed driver memory, convert file-per-shard NPZs in parallel with
``spark.read.format("binaryFile")`` + mapInPandas; that variant is the
same ``_npz_to_pandas`` body per file.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

EMB_KEY = "embeddings"
ID_KEY = "image_ids"


def _npz_to_pandas(buf: bytes | str, id_col: str, vec_col: str) -> pd.DataFrame:
    src = io.BytesIO(buf) if isinstance(buf, (bytes, bytearray)) else buf
    with np.load(src) as z:
        emb = np.asarray(z[EMB_KEY], dtype=np.float32)
        ids = (
            np.asarray(z[ID_KEY], dtype=np.int64)
            if ID_KEY in z.files
            else np.arange(len(emb), dtype=np.int64)
        )
    if emb.ndim != 2 or len(ids) != len(emb):
        raise ValueError(f"malformed npz: embeddings {emb.shape}, ids {ids.shape}")
    return pd.DataFrame({id_col: ids, vec_col: list(emb)})


def read_npz(
    spark: SparkSession,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """Load an NPZ corpus as a (id, float32-array) DataFrame."""
    pdf = _npz_to_pandas(path, id_col, vec_col)
    df = spark.createDataFrame(pdf, schema=f"{id_col} long, {vec_col} array<float>")
    return df.repartition(partitions) if partitions else df


# NPZ is a single in-RAM blob, so the export is inherently driver-side;
# the guard turns an accidental 100 TB `write_npz(corpus)` into an
# explicit raise instead of a driver OOM (operators/knn.MAX_QUERY_BATCH
# pattern). Raise it deliberately for a bigger one-off export.
MAX_EXPORT_ROWS = 5_000_000


def write_npz(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = MAX_EXPORT_ROWS,
) -> None:
    """Export a vector DataFrame to the reference's NPZ interchange
    format (driver-side collect — export tool, not a data path)."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"write_npz is a driver-side export tool: {n} rows exceeds "
            f"max_rows={max_rows}. NPZ has no row groups to stream into — "
            "export shards (sources/export.py) or raise max_rows knowingly."
        )
    pdf = df.select(id_col, vec_col).toPandas()
    np.savez_compressed(
        path,
        **{
            EMB_KEY: np.array(list(pdf[vec_col]), dtype=np.float32),
            ID_KEY: pdf[id_col].to_numpy(dtype=np.int64),
        },
    )
