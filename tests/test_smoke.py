"""Pre-snapshot smoke gate (VERDICT r2 process fix): the cheapest
possible proof that the harness surface is alive — the catalog builds,
every declared query has a runnable callable and (when present) a
syntactically valid DuckDB oracle, and entry() produces rows on
sf0.001. Run this before every commit: it would have caught the r2
NameError in seconds.

    python -m pytest tests/test_smoke.py -q
"""

import duckdb

import __spark_entry__ as entrymod
from distributedvectordatabase_spark.catalog import build_catalog
from tests.conftest import SF_SMALL


# Entries deliberately placed PAST the driver's 50-gate correctness
# window (position 51+): still exact-checked by tests/test_catalog.py
# and benched, but their driver slot was ceded to a higher-value gate.
# Adding an entry here requires a COVERAGE.md note saying what took the
# slot and why.
DOCUMENTED_OVERFLOW = {
    "tpch_q1_pricing",
    "tpch_q3_topk_revenue",
    "customer_rank_analytics",
    "order_part_lists",
    "sales_grouping_sets",
    "returnflag_pivot_unpivot",
    # r8 rotation (VERDICT r7 #4, rolling-freshness policy): ceded
    # their slots to the returning r6-demoted relational gates
    # (priority_stats, order_window_ranks, source_regex_stats,
    # lineitem_price_stats) after 3+ rounds externally hash-green.
    # (events_value_histogram, customer_set_ops and doc_packs returned
    # to the window in r11.)
    "mix_weighted_sources",
    "strat_sample_quota",
    # r9 rotation (VERDICT r8 #1): hybrid_filtered_topk — born in
    # overflow in r8 — took strat_sample_weighted's slot (externally
    # hash-green r6-r8; its quota sibling already strict-checked here).
    "strat_sample_weighted",
    # r10 rotation (VERDICT r9 #1): the six r9-surface gates (never
    # externally checked) took these six slots. All demotions were
    # externally hash-green 2-4 consecutive rounds (bpe_pair_stats
    # r7-r9; the four relational gates r2-r5 + r8-r9 after their own
    # freshness rotation; hybrid_rrf_topk r6-r9) and stay bit-for-bit
    # green under tests/exact_compare.py.
    "bpe_pair_stats",
    "priority_stats",
    "order_window_ranks",
    "source_regex_stats",
    "lineitem_price_stats",
    "hybrid_rrf_topk",
    # r11 rotation (VERDICT r10 #1/#2/#8): doc_unigram_tokens entered
    # the window (it was the only hash-oracle gate never externally
    # verified), together with doc_langid, curation_pipeline_langid and
    # the three stalest r6/r8 demotions (events_value_histogram,
    # customer_set_ops, doc_packs). These six cede — all externally
    # hash-green every round since r1/r2; dedup_minhash is the
    # verdict's own suggested demotion (its shingle scale path stays
    # in-window).
    "dedup_minhash",
    "events_salted_agg",
    "events_json_extract",
    "centroid_assign",
    "embedding_quantize_error",
    "doc_sample_fingerprint",
}


def test_catalog_builds_and_is_window_sized():
    cat = build_catalog()
    names = list(cat)
    overflow = set(names[50:])
    assert overflow <= DOCUMENTED_OVERFLOW, (
        f"undocumented entries past the driver's 50-gate window: "
        f"{sorted(overflow - DOCUMENTED_OVERFLOW)} — the driver's correctness "
        "run checks only the first 50; merge/demote queries or document the "
        "overflow (see COVERAGE.md totals)"
    )
    assert not (DOCUMENTED_OVERFLOW & set(names[:50])), (
        "a documented-overflow entry moved back inside the gate window; "
        "update DOCUMENTED_OVERFLOW"
    )
    for name, q in cat.items():
        assert callable(q.run), name
        assert q.oracle is None or isinstance(q.oracle, str), name


def test_oracles_parse_in_duckdb():
    """Every oracle must at least PREPARE against the real schemas —
    catches dialect typos without paying query execution."""
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    for name, q in build_catalog().items():
        if q.oracle is not None:
            try:
                con.sql(f"PREPARE _smoke AS {q.oracle}")
                con.sql("DEALLOCATE _smoke")
            except Exception as exc:  # pragma: no cover - assertion detail
                raise AssertionError(f"oracle for {name!r} fails to prepare: {exc}")


def test_entry_runs_on_smallest_sf(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
