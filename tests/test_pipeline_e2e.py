"""End-to-end composition of the training-data pipeline: the north
star is not each operator alone but that a user can chain them —
curate → exact-dedup → weighted mix → chunk → pack → export — as one
declarative flow on real testdata, with conservation invariants
holding at every stage boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.chunking import (
    chunk_documents,
    pack_documents,
)
from distributedvectordatabase_spark.operators.mixing import mix_corpus
from distributedvectordatabase_spark.sources.export import (
    export_shards,
    read_shards,
    verify_export,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR

PACK_BUDGET = 128
N_SHARDS = 4


@pytest.fixture(scope="module")
def pipeline(spark):
    """Run the full chain once; stages exposed for per-boundary asserts."""
    docs = load_table(spark, "documents", SF_DIR)

    # 1. curation gate: minimum length + keep-first exact dedup
    gated = docs.where(F.size(F.split(F.col("text"), r"\s+")) >= 10)
    w = F.row_number().over(Window.partitionBy(F.md5("text")).orderBy("doc_id"))
    deduped = gated.withColumn("_rn", w).where(F.col("_rn") == 1).drop("_rn")

    # 2. weighted mixture: double src0, drop src1
    mixed = mix_corpus(deduped, {"src0": 2.0, "src1": 0.0})
    # epoch-expanded docs need a unique id downstream (chunk/pack/export
    # key): fold the epoch into the id deterministically
    remixed = mixed.withColumn(
        "doc_id", F.col("doc_id") * 10 + F.col("epoch")
    ).drop("epoch")

    # 3. shape: sliding-window chunks, then token-budget packs of chunks
    chunks = chunk_documents(remixed, max_tokens=32, overlap=8)
    packable = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    ).withColumn("lang", F.lit("all"))
    packs = pack_documents(packable, budget=PACK_BUDGET)

    return {
        "docs": docs,
        "deduped": deduped,
        "mixed": mixed,
        "remixed": remixed,
        "chunks": chunks,
        "packable": packable,
        "packs": packs,
    }


def test_mixture_conserves_and_drops(pipeline):
    dd, mixed = pipeline["deduped"], pipeline["mixed"]
    n_src0 = dd.where(F.col("source") == "src0").count()
    n_src1 = dd.where(F.col("source") == "src1").count()
    assert n_src0 > 0 and n_src1 > 0  # the gate must actually bite
    assert mixed.count() == dd.count() + n_src0 - n_src1
    assert mixed.where(F.col("source") == "src1").count() == 0


def test_epoch_fold_keeps_ids_unique(pipeline):
    remixed = pipeline["remixed"]
    assert remixed.select("doc_id").distinct().count() == remixed.count()


def test_chunks_cover_every_mixed_doc(pipeline):
    remixed, chunks = pipeline["remixed"], pipeline["chunks"]
    assert chunks.select("doc_id").distinct().count() == remixed.count()
    # token conservation: non-overlap chunks tile the doc exactly, so
    # summed chunk tokens >= doc tokens (overlap re-counts stride rows)
    doc_toks = remixed.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("t")
    ).first()["t"]
    chunk_toks = chunks.select(F.sum("n_tokens")).first()[0]
    assert chunk_toks >= doc_toks


def test_packs_respect_budget_overflow_rule(pipeline):
    packs, packable = pipeline["packs"], pipeline["packable"]
    agg = packs.groupBy("lang", "pack_id").agg(
        F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m")
    )
    bad = agg.where(F.col("s") >= PACK_BUDGET + F.col("m"))
    assert bad.count() == 0
    assert packs.count() == packable.count()  # every chunk packed once


def test_export_round_trips_the_packed_corpus(spark, pipeline, tmp_path):
    out = str(tmp_path / "pipeline_export")
    packs = pipeline["packs"]
    man = export_shards(packs, out, n_shards=N_SHARDS, weight_col="n_tokens")
    verify_export(spark, out)
    total_rows = sum(r["n_rows"] for r in man.collect())
    assert total_rows == packs.count()
    back = read_shards(spark, out)
    assert back.select(F.sum("n_tokens")).first()[0] == (
        packs.select(F.sum("n_tokens")).first()[0]
    )
