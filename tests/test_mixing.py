"""operators/mixing: deterministic weighted corpus mixing semantics.

The catalog gate (mix_weighted_sources, exact-checked in test_catalog)
pins the engine-vs-oracle parity; these tests pin the *operator
contract*: rate semantics per regime, partition-layout independence
(the determinism claim), and the audit report's accounting.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.mixing import mix_corpus, mixture_report
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR).select("doc_id", "source").cache()


def test_integer_rate_replicates_exactly(spark, docs):
    out = mix_corpus(docs, {}, default_rate=2.0)
    n_in = docs.count()
    assert out.count() == 2 * n_in
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.collect_set("epoch").alias("epochs")
    )
    bad = per_doc.where((F.col("n") != 2) | (F.array_sort("epochs") != F.array(F.lit(0), F.lit(1))))
    assert bad.count() == 0


def test_zero_rate_drops_source(spark, docs):
    out = mix_corpus(docs, {"src0": 0.0})
    assert out.where(F.col("source") == "src0").count() == 0
    # everything else untouched at the 1.0 default
    rest_in = docs.where(F.col("source") != "src0").count()
    assert out.count() == rest_in


def test_fractional_rate_samples_near_target(spark, docs):
    out = mix_corpus(docs, {}, default_rate=0.5)
    n_in, n_out = docs.count(), out.count()
    # deterministic hash sample: binomial-like tolerance at n=500
    assert 0.38 * n_in <= n_out <= 0.62 * n_in
    assert out.agg(F.max("epoch")).first()[0] == 0


def test_mixed_regimes_epoch_bounds(spark, docs):
    out = mix_corpus(docs, {"src0": 2.5, "src1": 0.25, "src2": 0.0})
    by_src = {
        r["source"]: r
        for r in out.groupBy("source")
        .agg(F.max("epoch").alias("max_epoch"), F.count("*").alias("n"))
        .collect()
    }
    assert "src2" not in by_src
    assert by_src["src0"]["max_epoch"] == 2  # epochs 0,1 full + partial 2
    assert by_src["src1"]["max_epoch"] == 0
    n0_in = docs.where(F.col("source") == "src0").count()
    # full epochs are unconditional
    assert by_src["src0"]["n"] >= 2 * n0_in
    assert by_src["src0"]["n"] <= 3 * n0_in


def test_partition_layout_independence(spark, docs):
    """The keep/drop decision must not depend on physical layout."""
    rates = {"src0": 1.5, "src1": 0.3}
    a = mix_corpus(docs, rates).select("doc_id", "epoch")
    b = mix_corpus(docs.repartition(13, "doc_id"), rates).select("doc_id", "epoch")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_epoch_sample_is_independent_per_epoch(spark, docs):
    """Rate 1.5's fractional epoch keeps a *different* subset than a
    0.5 sample at epoch 0 would — the hash is keyed on the epoch, so
    repeated fractional epochs don't resample the same documents."""
    out = mix_corpus(docs, {}, default_rate=1.5)
    epoch1 = {r["doc_id"] for r in out.where(F.col("epoch") == 1).collect()}
    half = mix_corpus(docs, {}, default_rate=0.5)
    epoch0 = {r["doc_id"] for r in half.collect()}
    assert epoch1 != epoch0  # overwhelmingly likely under any 60-bit hash
    # but both are ~half-sized samples
    n = docs.count()
    assert 0.38 * n <= len(epoch1) <= 0.62 * n


def test_negative_rate_rejected(spark, docs):
    with pytest.raises(ValueError, match="rates must be >= 0"):
        mix_corpus(docs, {"src0": -1.0})


def test_report_accounts_for_dropped_sources(spark, docs):
    rates = {"src0": 2.0, "src1": 0.0}
    mixed = mix_corpus(docs, rates)
    rep = {r["source"]: r for r in mixture_report(docs, mixed).collect()}
    assert set(rep) == {r["source"] for r in docs.select("source").distinct().collect()}
    assert rep["src1"]["docs_out"] == 0
    assert rep["src1"]["epochs_used"] == 0
    assert rep["src1"]["rate_achieved"] == 0.0
    assert rep["src0"]["docs_out"] == 2 * rep["src0"]["docs_in"]
    assert rep["src0"]["rate_achieved"] == 2.0


def test_stratified_exact_quota(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    out = stratified_sample(docs, 3)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per) == set(sizes)
    for s, n in sizes.items():
        assert per[s] == min(3, n), s


def test_stratified_prefilter_equals_full_window(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    fast = stratified_sample(docs, 4).select("doc_id", "source", "sample_rank")
    full = stratified_sample(docs, 4, prefilter=False).select(
        "doc_id", "source", "sample_rank"
    )
    assert fast.exceptAll(full).count() == 0
    assert full.exceptAll(fast).count() == 0


def test_stratified_quota_exceeding_stratum_returns_all(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    out = stratified_sample(docs, 10_000)
    assert out.count() == docs.count()


def test_stratified_deterministic_across_layout(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    a = stratified_sample(docs, 5).select("doc_id", "sample_rank")
    b = stratified_sample(docs.repartition(17), 5).select("doc_id", "sample_rank")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_stratified_shortfall_falls_back_to_exact(spark, docs):
    """A starved prefilter (safety « 1 keeps ~k/10 rows per stratum)
    must detect the shortfall and fall back to the full window — the
    result stays exact, never silently approximate."""
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    starved = stratified_sample(docs, 10, prefilter_safety=0.1).select(
        "doc_id", "source", "sample_rank"
    )
    full = stratified_sample(docs, 10, prefilter=False).select(
        "doc_id", "source", "sample_rank"
    )
    assert starved.exceptAll(full).count() == 0
    assert full.exceptAll(starved).count() == 0


def test_stratified_fully_starved_stratum_not_dropped(spark, docs):
    """Regression: a stratum whose rows ALL hash above the prefilter
    threshold produces no survivor group at all; the shortfall check
    must see it as _m = 0 (left join against the full counts), not
    skip it and silently drop the stratum from the sample.

    k=1 at safety 0.5 gives thresh = 0.005 on ~100-row strata, so
    P(stratum fully starved) ≈ 0.6 — with 5 sources some strata are
    empty and some are not, which is exactly the shape the original
    survivors-only group-by missed."""
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    out = stratified_sample(docs, 1, prefilter_safety=0.5).select(
        "doc_id", "source", "sample_rank"
    )
    full = stratified_sample(docs, 1, prefilter=False).select(
        "doc_id", "source", "sample_rank"
    )
    n_sources = docs.select("source").distinct().count()
    assert out.select("source").distinct().count() == n_sources
    assert out.exceptAll(full).count() == 0
    assert full.exceptAll(out).count() == 0


def test_stratified_rejects_bad_k(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    with pytest.raises(ValueError, match="k must be"):
        stratified_sample(docs, 0)


def test_plan_has_no_shuffle(spark, docs):
    """mix_corpus is map-side only: explode + filter, no exchange."""
    plan = mix_corpus(docs, {"src0": 2.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_prefilter_equals_full_window(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample
    from distributedvectordatabase_spark.sources.tables import load_table

    wd = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "n_chars")
    fast = stratified_sample(wd, 4, weight_col="n_chars").select(
        "doc_id", "source", "sample_rank"
    )
    full = stratified_sample(wd, 4, weight_col="n_chars", prefilter=False).select(
        "doc_id", "source", "sample_rank"
    )
    assert fast.exceptAll(full).count() == 0
    assert full.exceptAll(fast).count() == 0


def test_weighted_sample_biases_toward_heavy_rows(spark, docs):
    """PPS order sampling: doubling a row's weight ~doubles its draw
    odds, so the sampled rows' mean weight must exceed the population
    mean (statistically overwhelming over 20 strata × wide weights)."""
    from distributedvectordatabase_spark.operators.mixing import stratified_sample
    from distributedvectordatabase_spark.sources.tables import load_table

    wd = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "n_chars")
    got = stratified_sample(wd, 3, weight_col="n_chars")
    mean_sample = got.agg(F.avg("n_chars")).first()[0]
    mean_pop = wd.agg(F.avg("n_chars")).first()[0]
    assert mean_sample > mean_pop


def test_weighted_sample_excludes_nonpositive_weights(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample

    wd = docs.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    got = stratified_sample(wd, 1000, weight_col="w")
    assert got.where(F.col("doc_id") % 2 == 0).count() == 0
    # all positive-weight rows sampled at quota >= stratum size
    assert got.count() == wd.where(F.col("w") > 0).count()


def test_weighted_sample_layout_independent(spark, docs):
    from distributedvectordatabase_spark.operators.mixing import stratified_sample
    from distributedvectordatabase_spark.sources.tables import load_table

    wd = load_table(spark, "documents", SF_DIR).select("doc_id", "source", "n_chars")
    a = stratified_sample(wd, 5, weight_col="n_chars").select("doc_id", "sample_rank")
    b = stratified_sample(wd.repartition(17), 5, weight_col="n_chars").select(
        "doc_id", "sample_rank"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
