"""Sharded training-data export sink with a verifiable manifest.

The end of the north-star pipeline (SURVEY §2.5): after curation,
chunking, packing and mixing, the corpus leaves the engine as a set
of *training shards* a data loader streams sequentially. The sink's
contracts are the ones that matter at 100 TB:

- **Deterministic placement**: ``shard = md5-hash(id) mod n_shards``
  — a document lands in the same shard on any cluster layout, any
  run, any engine (same grid hash as the mixing/sampling family), so
  re-exports are diffable and a resumed export is consistent.
- **Deterministic within-shard order**: rows are sorted by a content-
  free hash of the id inside each shard (a reproducible interleave —
  sorted-by-id order would replay curation order, which is usually
  source-clustered; the hash order is a deterministic shuffle).
- **One writer task per shard**: the exchange hash-partitions on the
  shard column, so every shard directory is written by exactly one
  task as one file run — no cross-task interleaving to make order
  ambiguous.
- **Manifest**: per-shard row counts (plus optional summed weight,
  e.g. token counts) written next to the data; ``verify_export``
  re-aggregates the data and compares, so a truncated or partial
  write is detectable before a training run consumes it.

The payload format is Parquet by default (columnar, splittable,
schema-carrying) — the idiomatic Spark sink. ``fmt="jsonl"`` writes
JSON-lines shards instead for loaders that stream text (HF datasets /
Megatron-style ingestion): same placement, same within-shard order
(one writer task per shard preserves row order in the text file),
same manifest + verification. JSONL carries no schema and no binary
columns faithfully — keep those exports Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.text import SPARK, hash64

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


def _shard_col(id_col: str, n_shards: int):
    h = hash64(f"cast({id_col} as string)", SPARK)
    return F.pmod(F.expr(h), F.lit(n_shards)).cast("int")


def _order_col(id_col: str):
    return F.expr(hash64(f"concat(cast({id_col} as string), ':order')", SPARK))


_FORMATS = ("parquet", "jsonl")


def export_shards(
    df: DataFrame,
    path: str,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    weight_col: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic shards plus a
    manifest; returns the manifest DataFrame (shard, n_rows[, weight]).

    ``id_col`` must uniquely identify rows (it is the placement and
    order key). ``fmt`` is ``"parquet"`` (default) or ``"jsonl"``
    (JSON-lines text shards; recorded in the manifest so readers and
    verification need no out-of-band knowledge). The write is
    all-or-nothing per directory (Spark's job-commit protocol); the
    manifest is written after the data, so a manifest's presence
    implies the data committed.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be >= 1")
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    clash = {"shard", "_ord"} & set(df.columns)
    if clash:
        # withColumn would silently OVERWRITE these, corrupting the
        # exported payload and its placement — refuse instead.
        raise ValueError(
            f"df already has reserved export column(s) {sorted(clash)}; "
            "rename them before export_shards"
        )
    sharded = df.withColumn("shard", _shard_col(id_col, n_shards)).withColumn(
        "_ord", _order_col(id_col)
    )
    writer = (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord", id_col)
        .drop("_ord")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    data_path = os.path.join(path, DATA_DIR)
    if fmt == "jsonl":
        writer.json(data_path)
    else:
        writer.parquet(data_path)
    spark = df.sparkSession
    manifest = _aggregate_manifest(_read_data(spark, path, fmt), weight_col, fmt)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST_DIR)
    )
    return read_manifest(spark, path)


def _read_data(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    data_path = os.path.join(path, DATA_DIR)
    if fmt == "jsonl":
        return spark.read.json(data_path)
    return spark.read.parquet(data_path)


def _manifest_format(manifest: DataFrame) -> str:
    if "format" in manifest.columns:
        return manifest.select("format").first()[0]
    return "parquet"  # pre-format manifests are parquet exports


def _aggregate_manifest(
    data: DataFrame, weight_col: str | None, fmt: str
) -> DataFrame:
    aggs = [F.count("*").alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).cast("long").alias("weight"))
    out = data.groupBy("shard").agg(*aggs).withColumn("format", F.lit(fmt))
    if weight_col is not None:
        # record WHICH column the weight summed, so verify_export can
        # re-aggregate without out-of-band knowledge
        out = out.withColumn("weight_src", F.lit(weight_col))
    return out


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, MANIFEST_DIR))


def read_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the export back (format taken from the manifest);
    ``shards`` partition-prunes to a subset (a loader resuming mid-run
    reads only what it still needs)."""
    data = _read_data(spark, path, _manifest_format(read_manifest(spark, path)))
    if shards is not None:
        data = data.where(F.col("shard").isin([int(s) for s in shards]))
    return data


def verify_export(spark: SparkSession, path: str) -> None:
    """Re-aggregate the data and compare against the manifest; raises
    ``ValueError`` on any divergence (missing shard, row-count or
    weight mismatch — a truncated write a loader must not consume)."""
    manifest = read_manifest(spark, path)
    weight_src = None
    if "weight_src" in manifest.columns:
        weight_src = manifest.select("weight_src").first()[0]
    fmt = _manifest_format(manifest)
    data = _read_data(spark, path, fmt)
    if weight_src is not None and weight_src not in data.columns:
        raise ValueError(
            f"manifest records weight column {weight_src!r} not present in the data"
        )
    got = _aggregate_manifest(data, weight_src, fmt)
    if "format" not in manifest.columns:
        got = got.drop("format")  # pre-format manifest: compare legacy shape
    diff = got.exceptAll(manifest).unionAll(manifest.exceptAll(got))
    bad = diff.limit(1).collect()
    if bad:
        raise ValueError(f"export does not match its manifest, e.g. {bad[0]}")
