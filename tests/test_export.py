"""sources/export: sharded training-export sink contracts —
deterministic placement and order, manifest verification, pruned
resume reads."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.sources.export import (
    export_shards,
    read_manifest,
    read_shards,
    verify_export,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR

N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR)


@pytest.fixture()
def out_dir(tmp_path):
    yield str(tmp_path / "export")


def test_round_trip_preserves_rows(spark, docs, out_dir):
    export_shards(docs, out_dir, n_shards=N_SHARDS)
    back = read_shards(spark, out_dir).drop("shard")
    assert back.count() == docs.count()
    assert back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0


def test_placement_and_order_are_layout_independent(spark, docs, out_dir):
    a_dir, b_dir = out_dir + "_a", out_dir + "_b"
    export_shards(docs, a_dir, n_shards=N_SHARDS)
    export_shards(docs.repartition(11), b_dir, n_shards=N_SHARDS)

    def shard_sequences(path):
        seqs = {}
        for d in sorted(glob.glob(os.path.join(path, "data", "shard=*"))):
            files = glob.glob(os.path.join(d, "*.parquet"))
            assert len(files) == 1, f"expected one file per shard, got {files}"
            seqs[os.path.basename(d)] = pq.read_table(files[0])["doc_id"].to_pylist()
        return seqs

    a, b = shard_sequences(a_dir), shard_sequences(b_dir)
    assert set(a) == set(b) and len(a) == N_SHARDS
    for shard, seq in a.items():
        assert seq == b[shard], f"{shard} order differs across layouts"
    shutil.rmtree(a_dir, ignore_errors=True)
    shutil.rmtree(b_dir, ignore_errors=True)


def test_manifest_counts_and_weight(spark, docs, out_dir):
    man = export_shards(docs, out_dir, n_shards=N_SHARDS, weight_col="n_chars")
    rows = {r["shard"]: r for r in man.collect()}
    assert len(rows) == N_SHARDS
    assert sum(r["n_rows"] for r in rows.values()) == docs.count()
    total_w = docs.agg(F.sum("n_chars")).first()[0]
    assert sum(r["weight"] for r in rows.values()) == total_w
    verify_export(spark, out_dir)


def test_verify_detects_missing_shard(spark, docs, out_dir):
    export_shards(docs, out_dir, n_shards=N_SHARDS, weight_col="n_chars")
    victim = sorted(glob.glob(os.path.join(out_dir, "data", "shard=*")))[0]
    shutil.rmtree(victim)
    with pytest.raises(ValueError, match="does not match its manifest"):
        verify_export(spark, out_dir)


def test_read_shards_partition_prunes(spark, docs, out_dir):
    export_shards(docs, out_dir, n_shards=N_SHARDS)
    sub = read_shards(spark, out_dir, shards=[1, 2])
    assert set(r["shard"] for r in sub.select("shard").distinct().collect()) == {1, 2}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan.split("PartitionFilters")[1][:80]


def test_bad_n_shards_rejected(spark, docs, out_dir):
    with pytest.raises(ValueError, match="n_shards"):
        export_shards(docs, out_dir, n_shards=0)


def test_reserved_column_collision_rejected(spark, docs, out_dir):
    """Regression: a pre-existing 'shard' or '_ord' column would be
    silently overwritten (corrupting payload + placement); the sink
    must refuse instead."""
    with pytest.raises(ValueError, match="reserved export column"):
        export_shards(docs.withColumn("shard", F.lit(0)), out_dir, n_shards=2)
    with pytest.raises(ValueError, match="reserved export column"):
        export_shards(docs.withColumn("_ord", F.lit(0)), out_dir, n_shards=2)


def test_jsonl_export_roundtrip_and_verify(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text", "lang")
    man = export_shards(
        docs, str(tmp_path / "ej"), n_shards=4, id_col="doc_id", fmt="jsonl"
    )
    assert {r.format for r in man.collect()} == {"jsonl"}
    verify_export(spark, str(tmp_path / "ej"))
    back = read_shards(spark, str(tmp_path / "ej"))
    assert back.count() == docs.count()
    # payload survives the text round-trip
    want = {(r.doc_id, r.text, r.lang) for r in docs.collect()}
    got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert got == want
    # data files are .json text, not parquet
    import os
    files = [
        f for root, _, fs in os.walk(str(tmp_path / "ej" / "data"))
        for f in fs if f.startswith("part-")
    ]
    assert files and all(f.endswith(".json") for f in files)


def test_jsonl_shard_bytes_layout_independent(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    export_shards(docs.repartition(3), str(tmp_path / "a"), n_shards=2,
                  id_col="doc_id", fmt="jsonl")
    export_shards(docs.repartition(11), str(tmp_path / "b"), n_shards=2,
                  id_col="doc_id", fmt="jsonl")
    import os

    def shard_bytes(base, shard):
        d = os.path.join(base, "data", f"shard={shard}")
        chunks = []
        for f in sorted(os.listdir(d)):
            if f.startswith("part-"):
                with open(os.path.join(d, f), "rb") as fh:
                    chunks.append(fh.read())
        return b"".join(chunks)

    for s in (0, 1):
        assert shard_bytes(str(tmp_path / "a"), s) == shard_bytes(str(tmp_path / "b"), s)


def test_export_rejects_unknown_format(spark, tmp_path):
    docs = load_table(spark, "documents", SF_DIR)
    with pytest.raises(ValueError, match="fmt"):
        export_shards(docs, str(tmp_path / "x"), n_shards=2, fmt="csv")
