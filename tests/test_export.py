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


# ------------------------------------------------------------------ wds (tar)


def test_wds_export_roundtrip_and_verify(spark, docs, out_dir):
    mani = export_shards(docs, out_dir, n_shards=N_SHARDS, fmt="wds",
                         weight_col="n_chars")
    rows = {r.shard: (r.n_rows, r.weight) for r in mani.collect()}
    assert sum(n for n, _ in rows.values()) == docs.count()
    assert sum(w for _, w in rows.values()) == docs.agg(F.sum("n_chars")).first()[0]
    # member view: every sample has json + txt members, text round-trips
    back = read_shards(spark, out_dir)
    assert back.count() == docs.count()
    assert back.filter("json IS NULL OR text IS NULL").count() == 0
    assert back.filter("n_members != 2").count() == 0
    one = back.orderBy("key").first()
    import json as _json

    meta = _json.loads(one.json)
    src = docs.filter(F.col("doc_id") == meta["doc_id"]).first()
    assert one.text == src.text and meta["lang"] == src.lang
    verify_export(spark, out_dir)


def test_wds_tar_bytes_layout_independent(spark, docs, out_dir):
    a_dir, b_dir = out_dir + "_a", out_dir + "_b"
    export_shards(docs, a_dir, n_shards=N_SHARDS, fmt="wds")
    export_shards(docs.repartition(13), b_dir, n_shards=N_SHARDS, fmt="wds")
    for d in sorted(glob.glob(os.path.join(a_dir, "data", "shard=*"))):
        shard = os.path.basename(d)
        fa = os.path.join(d, "part-000.tar")
        fb = os.path.join(b_dir, "data", shard, "part-000.tar")
        with open(fa, "rb") as f1, open(fb, "rb") as f2:
            assert f1.read() == f2.read(), f"{shard} tar bytes differ across layouts"


def test_wds_members_ordered_and_grouped(spark, docs, out_dir):
    """WebDataset contract: a sample's members are adjacent (json, txt
    in order) and keys ascend lexicographically — sequential tar reads
    replay the deterministic within-shard shuffle."""
    import tarfile

    export_shards(docs, out_dir, n_shards=2, fmt="wds")
    for d in glob.glob(os.path.join(out_dir, "data", "shard=*")):
        with tarfile.open(os.path.join(d, "part-000.tar")) as tf:
            names = tf.getnames()
            info = tf.getmember(names[0])
        assert names, d
        keys = [n.rpartition(".")[0] for n in names]
        exts = [n.rpartition(".")[2] for n in names]
        # pairs: (k.json, k.txt), keys non-decreasing across samples
        assert exts == ["json", "txt"] * (len(names) // 2)
        assert keys[0::2] == keys[1::2]
        assert keys[0::2] == sorted(set(keys))
        assert info.mtime == 0 and info.uid == 0 and info.uname == ""


def test_wds_binary_column_member(spark, out_dir):
    rows = [(1, "hello", bytearray(b"\x00\x01\xffpayload")), (2, "world", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, blob binary")
    export_shards(df, out_dir, n_shards=1, fmt="wds")
    import tarfile

    with tarfile.open(os.path.join(out_dir, "data", "shard=0", "part-000.tar")) as tf:
        blobs = {n: tf.extractfile(n).read() for n in tf.getnames() if n.endswith(".blob")}
        jsons = [n for n in tf.getnames() if n.endswith(".json")]
    assert len(jsons) == 2
    assert list(blobs.values()) == [b"\x00\x01\xffpayload"]  # None -> no member
    # binary excluded from the json metadata
    import json as _json

    with tarfile.open(os.path.join(out_dir, "data", "shard=0", "part-000.tar")) as tf:
        for n in jsons:
            assert "blob" not in _json.loads(tf.extractfile(n).read())
    # member view counts members per sample correctly
    back = read_shards(spark, out_dir).orderBy("key").collect()
    assert [r.n_members for r in back] in ([3, 2], [2, 3])


def test_wds_null_numeric_metadata_is_strict_json(spark, out_dir):
    """NULL numeric metadata surfaces as float NaN in pandas records;
    the member json must emit strict-JSON null, not a bare NaN that
    WebDataset loaders and get_json_object reject (ADVICE r9)."""
    rows = [(1, "hello", 0.5), (2, "world", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    export_shards(df, out_dir, n_shards=1, fmt="wds")
    import json as _json
    import tarfile

    with tarfile.open(os.path.join(out_dir, "data", "shard=0", "part-000.tar")) as tf:
        metas = [
            _json.loads(tf.extractfile(n).read().decode())
            for n in tf.getnames()
            if n.endswith(".json")
        ]
    by_id = {m["doc_id"]: m for m in metas}
    assert by_id[2]["score"] is None
    assert by_id[1]["score"] == 0.5
    # strict parse: the raw bytes must not contain a bare NaN token
    with tarfile.open(os.path.join(out_dir, "data", "shard=0", "part-000.tar")) as tf:
        for n in tf.getnames():
            if n.endswith(".json"):
                _json.loads(tf.extractfile(n).read().decode(), parse_constant=_fail_const)


def _fail_const(name):
    raise AssertionError(f"non-strict JSON constant in member metadata: {name}")


def test_wds_verify_detects_truncated_tar(spark, docs, out_dir):
    export_shards(docs, out_dir, n_shards=N_SHARDS, fmt="wds", weight_col="n_chars")
    victim = glob.glob(os.path.join(out_dir, "data", "shard=*", "*.tar"))[0]
    size = os.path.getsize(victim)
    with open(victim, "rb") as f:
        head = f.read(max(size // 2, 1536))
    with open(victim, "wb") as f:
        f.write(head)  # torn shard: half the members gone
    with pytest.raises(Exception):
        verify_export(spark, out_dir)
