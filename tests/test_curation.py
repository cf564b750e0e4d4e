"""End-to-end curation chain (operators/curation.py) with the
tokenize-once discipline: every stage consumes the staged token column,
no post-staging plan re-tokenizes raw text, and each planted defect is
removed by exactly the stage built to catch it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.curation import (
    curate_corpus,
    plan_tokenizes,
)

# ---- planted corpus -------------------------------------------------------
# Blocks of 7 distinct words; doc CLEAN_B2 swaps adjacent blocks of
# CLEAN_B1 — every shared run is 7 tokens (< the substring k=8, so trim
# leaves both alone) while the 3-shingle Jaccard stays ~0.6 (> the 0.5
# test threshold, so MinHash dedup catches the reorder).
_B = [
    ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"],
    ["hotel", "india", "juliet", "kilo", "lima", "mike", "november"],
    ["oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform"],
    ["victor", "whiskey", "xray", "yankee", "zulu", "anchor", "beacon"],
    ["cedar", "dune", "ember", "fjord", "grove", "harbor", "isle"],
    ["jade", "knoll", "lagoon", "mesa", "nectar", "opal", "prairie"],
]
CLEAN_B1 = " ".join(w for b in _B for w in b)
CLEAN_B2 = " ".join(
    w for b in (_B[1], _B[0], _B[3], _B[2], _B[5], _B[4]) for w in b
)
CLEAN_A = (
    "quartz raven stone timber umbra vapor willow xenon yarrow zephyr "
    "amber basalt copper dawn eagle falcon garnet heron iris jasper"
)
SPAM = " ".join(["yes no"] * 15)  # top-2-gram covers everything -> gopher drop
BOILER = "click here to accept all cookies and continue to site"  # 10 words
UNIQ_C = (
    "maple north otter pine quill reef salmon thistle urchin vine "
    "walnut yucca acorn birch"
)
UNIQ_D = (
    "comet drift ferry gulch hollow inlet jetty krill lantern marsh "
    "nimbus orchard pebble quarry"
)

ROWS = [
    (0, "a", CLEAN_A),
    (1, "a", CLEAN_B1),
    (2, "a", CLEAN_B2),  # reordered near-dup of 1 -> dedup keeps 1
    (3, "b", SPAM),  # gopher drop
    (4, "b", UNIQ_C + " " + BOILER),  # shared boilerplate -> trimmed
    (5, "b", UNIQ_D + " " + BOILER),
]


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, source string, text string")
    work = str(tmp_path_factory.mktemp("curation"))
    res = curate_corpus(
        spark,
        docs,
        work,
        minhash_threshold=0.5,
        minhash_bands=6,
        minhash_rows=1,
        shingle_n=3,
        rates={"a": 2.0, "b": 1.0},
        pack_budget=32,
        n_shards=2,
        collect_stats=True,
    )
    yield res
    res.trimmed.unpersist()
    res.deduped.unpersist()


def test_stage_counts(chain):
    s = chain.stats
    assert s["n_input"] == 6
    assert s["n_gopher_kept"] == 5  # SPAM dropped
    assert s["n_after_dedup"] == 4  # reorder near-dup of doc 1 dropped
    # rates: 3 surviving src-a docs x2 epochs... doc 2 was deduped, so
    # src a contributes docs {0,1} x2 = 4; src b contributes {4,5} x1 = 2
    assert s["n_mixed"] == 6
    assert s["n_exported"] == 6


def test_dedup_keeps_min_id(chain):
    kept = {r.doc_id for r in chain.deduped.select("doc_id").collect()}
    assert kept == {0, 1, 4, 5}


def test_boilerplate_trimmed(chain):
    t = {r.doc_id: r for r in chain.trimmed.collect()}
    # the 10-token boilerplate is removed from BOTH docs, nothing else
    for d, uniq in ((4, UNIQ_C), (5, UNIQ_D)):
        assert t[d].text == uniq
        assert t[d].toks == uniq.split()
    # clean docs untouched
    assert t[0].text == CLEAN_A
    assert t[1].text == CLEAN_B1


def test_mix_epochs(chain):
    eps = (
        chain.mixed.groupBy("source", "doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    for r in eps:
        assert r.n == (2 if r.source == "a" else 1), r


def test_tokenize_once_plans(chain):
    """The tokenize-once contract: NO post-staging stage plan contains
    the whitespace tokenizer — tokens come from the staged parquet
    column (or from the trim's own surviving-token output)."""
    for name in ("gophered", "trimmed", "deduped", "selected", "mixed", "packs"):
        df = getattr(chain, name)
        assert not plan_tokenizes(df), f"stage {name} re-tokenizes"


def test_plan_detector_sees_tokenize(spark):
    """Sanity: the detector DOES fire on a stage that tokenizes."""
    from distributedvectordatabase_spark.operators.gopher import gopher_filter

    docs = spark.createDataFrame(ROWS, "doc_id long, source string, text string")
    assert plan_tokenizes(gopher_filter(docs))  # no tokens_col -> tokenizes


def test_export_round_trip(spark, chain):
    from distributedvectordatabase_spark.sources.export import read_shards

    back = read_shards(spark, chain.export_path)
    assert back.count() == 6
    assert set(back.columns) >= {"sample_id", "doc_id", "epoch", "source", "pack_id", "n_tokens", "text"}
    # exported text is the TRIMMED text
    t4 = back.filter("doc_id = 4").select("text").first()[0]
    assert t4 == UNIQ_C


def test_dsir_selection(spark, tmp_path):
    docs = spark.createDataFrame(ROWS, "doc_id long, source string, text string")
    target = spark.createDataFrame([(0,)], "doc_id long")
    res = curate_corpus(
        spark,
        docs,
        str(tmp_path),
        minhash_threshold=0.5,
        minhash_bands=6,
        minhash_rows=1,
        shingle_n=3,
        target_ids=target,
        select_k=2,
        pack_budget=32,
        n_shards=2,
        collect_stats=True,
    )
    assert res.stats["n_selected"] == 2
    picked = {r.doc_id for r in res.selected.select("doc_id").collect()}
    assert 0 in picked  # the target doc scores itself highest
    assert not plan_tokenizes(res.selected)
    res.trimmed.unpersist()
    res.deduped.unpersist()
