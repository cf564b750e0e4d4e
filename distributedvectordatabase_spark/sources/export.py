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

``fmt="wds"`` writes **WebDataset-style tar shards** — the container
multimodal training loaders stream (one ``{key}.json`` metadata member
per sample, plus ``{key}.txt`` for a text column and ``{key}.<col>``
raw-bytes members for binary columns, grouped by key prefix per the
WebDataset convention). Tar bytes are fully deterministic (zeroed
mtime/uid/gid, USTAR, canonical sorted-key JSON, members in
within-shard hash order — keys sort lexicographically in row order,
so sequential tar reads replay the deterministic shuffle), written
tmp+fsync+rename per shard (the engine's atomic-sidecar discipline —
a crash never leaves a torn shard visible). Spark has no tar
FileFormat, so this is the one sink that runs as imperative
per-partition logic (``mapInPandas`` over the shard-sorted exchange:
each shard still has exactly one writer, batches stream through
bounded memory, tars stream to disk). The writer targets a
POSIX-visible path (local/NFS/FUSE-mounted object store);
``read_shards``/``verify_export`` re-read the tars through Spark's
``binaryFile`` source and return the member-level view
(shard, key, json, text, n_members).
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


_FORMATS = ("parquet", "jsonl", "wds")


def _write_wds(sharded: DataFrame, data_path: str, id_col: str) -> None:
    """Stream the shard-sorted exchange into one deterministic tar per
    shard. Input must be repartitioned on ``shard`` and sorted by
    (shard, _ord, id) — every shard then arrives contiguously inside
    exactly one partition, so one task owns each tar end to end.
    Memory is bounded by one Arrow batch; tar bytes stream to a tmp
    file and land via fsync + os.replace (atomic, crash-safe)."""
    import json
    import tarfile

    fields = {f.name: f.dataType.simpleString() for f in sharded.schema.fields}
    bin_cols = sorted(n for n, t in fields.items() if t == "binary")
    has_text = "text" in fields and fields["text"] == "string"
    json_cols = [
        c for c in sharded.columns if c not in {"_ord", "shard", *bin_cols}
    ]

    def _member(tf, name: str, payload: bytes) -> None:
        info = tarfile.TarInfo(name=name)
        info.size = len(payload)
        info.mtime = 0
        info.uid = info.gid = 0
        info.uname = info.gname = ""
        info.mode = 0o644
        import io

        tf.addfile(info, io.BytesIO(payload))

    def write_partition(it):
        import pandas as pd

        cur_shard = None
        tf = None
        tmp = final = None
        n_rows = 0
        stats: list[tuple[int, int, int]] = []

        def close_current():
            nonlocal tf, n_rows
            if tf is None:
                return
            tf.close()
            fd = os.open(tmp, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
            try:
                os.replace(tmp, final)
            except FileNotFoundError:
                # our tmp was swept by a sibling attempt that already
                # published a complete tar — lost the race, fine
                if not os.path.exists(final):
                    raise
            # A failed/killed attempt leaves its private tmp behind
            # forever (ADVICE r10) — sweep stale attempt files once a
            # COMPLETE tar has been published. Racing a still-writing
            # speculative attempt is benign: its fd keeps working and
            # its os.replace hits the FileNotFoundError branch above.
            import glob as _glob

            for stale in _glob.glob(f"{final}.attempt-*.tmp"):
                try:
                    os.remove(stale)
                except OSError:
                    pass
            stats.append((int(cur_shard), n_rows, os.path.getsize(final)))
            tf = None
            n_rows = 0

        for pdf in it:
            for row in pdf.to_dict("records"):
                shard = int(row["shard"])
                if shard != cur_shard:
                    close_current()
                    cur_shard = shard
                    d = os.path.join(data_path, f"shard={shard}")
                    os.makedirs(d, exist_ok=True)
                    final = os.path.join(d, "part-000.tar")
                    # attempt-unique tmp name (ADVICE r9): with
                    # speculative execution two attempts of this task
                    # run concurrently — a shared tmp path would
                    # interleave writes and os.replace could publish a
                    # torn tar. Each attempt stages privately; whichever
                    # replace lands last wins with a COMPLETE file.
                    from pyspark import TaskContext

                    ctx = TaskContext.get()
                    attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
                    tmp = f"{final}.attempt-{attempt}.tmp"
                    tf = tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT)
                key = f"{int(row['_ord']):015x}-{row[id_col]}"
                meta = {}
                for c in json_cols:
                    v = row[c]
                    if hasattr(v, "item"):  # numpy scalar -> python
                        v = v.item()
                    elif not isinstance(v, (str, int, float, bool, type(None), list, dict)):
                        v = str(v)
                    # NULL numerics surface as float NaN in pandas
                    # records; bare NaN is invalid strict JSON (ADVICE
                    # r9) — normalize to null, and fail loudly if any
                    # non-finite value slips through anyway.
                    if isinstance(v, float) and v != v:
                        v = None
                    meta[c] = v
                _member(
                    tf,
                    f"{key}.json",
                    json.dumps(
                        meta, sort_keys=True, separators=(",", ":"), allow_nan=False
                    ).encode(),
                )
                if has_text and row["text"] is not None:
                    _member(tf, f"{key}.txt", str(row["text"]).encode())
                for c in bin_cols:
                    if row[c] is not None:
                        _member(tf, f"{key}.{c}", bytes(row[c]))
                n_rows += 1
        close_current()
        yield pd.DataFrame(
            {
                "shard": pd.Series([s for s, _, _ in stats], dtype="int32"),
                "n_rows": pd.Series([n for _, n, _ in stats], dtype="int64"),
                "n_bytes": pd.Series([b for _, _, b in stats], dtype="int64"),
            }
        )

    # the collect is bounded: one row per written shard
    sharded.mapInPandas(write_partition, "shard int, n_rows long, n_bytes long").collect()


def _read_wds_members(spark: SparkSession, data_path: str) -> DataFrame:
    """Member-level view of a wds export: (shard, key, json, text,
    n_members) per sample, parsed from the tars via the binaryFile
    source (shard pruning still works — it's a directory filter)."""
    import json as _json
    import tarfile

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .option("recursiveFileLookup", "true")
        .load(data_path)
        .select("path", "content")
    )

    def parse(it):
        import io
        import re

        import pandas as pd

        for pdf in it:
            shards, keys, jsons, texts, counts = [], [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard=(\d+)", str(path))
                shard = int(m.group(1)) if m else -1
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for info in tf:
                        key, _, ext = info.name.rpartition(".")
                        if key not in samples:
                            samples[key] = {"json": None, "text": None, "n": 0}
                            order.append(key)
                        samples[key]["n"] += 1
                        if ext == "json":
                            samples[key]["json"] = tf.extractfile(info).read().decode()
                        elif ext == "txt":
                            samples[key]["text"] = tf.extractfile(info).read().decode()
                for key in order:
                    s = samples[key]
                    shards.append(shard)
                    keys.append(key)
                    jsons.append(s["json"])
                    texts.append(s["text"])
                    counts.append(s["n"])
            yield pd.DataFrame(
                {
                    "shard": pd.Series(shards, dtype="int32"),
                    "key": pd.Series(keys, dtype="object"),
                    "json": pd.Series(jsons, dtype="object"),
                    "text": pd.Series(texts, dtype="object"),
                    "n_members": pd.Series(counts, dtype="int32"),
                }
            )

    return bf.mapInPandas(
        parse, "shard int, key string, json string, text string, n_members int"
    )


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
    exchange = sharded.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "_ord", id_col
    )
    data_path = os.path.join(path, DATA_DIR)
    if fmt == "wds":
        import shutil

        # overwrite semantics match the Spark writers': clear, rewrite
        if os.path.exists(data_path):
            shutil.rmtree(data_path)
        os.makedirs(data_path, exist_ok=True)
        _write_wds(exchange, data_path, id_col)
    else:
        writer = exchange.drop("_ord").write.mode("overwrite").partitionBy("shard")
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
    if fmt == "wds":
        return _read_wds_members(spark, data_path)
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
        if fmt == "wds":
            # the member view carries metadata as canonical JSON; pull
            # the recorded weight column back out of it
            w = F.get_json_object("json", f"$.{weight_col}").cast("double")
            aggs.append(F.sum(w).cast("long").alias("weight"))
        else:
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
    if weight_src is not None and fmt != "wds" and weight_src not in data.columns:
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
