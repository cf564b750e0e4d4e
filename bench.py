#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is materialized via a count() over the full result (forces
the complete plan — scans, shuffles, window top-k — without paying
driver-side collect serialization for wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributedvectordatabase_spark.catalog import build_catalog
from distributedvectordatabase_spark.session import get_spark

# Headline set: vector search (exact, pruned, ANN), LSH sharding stats,
# dedup + text analysis, event-stream analytics, relational star schema.
# The headline lists the *registered scale paths* only: unigram
# dedup_minhash (the documented saturated-vocab worst case, catalog.py
# MINHASH_* notes) moved to EXTRA in r4 — it was 16% of the r3 headline
# while the shingle variant is the path a user should run; its number
# is still measured and reported under "extra" (BASELINE.md footnote).
HEADLINE = [
    "knn_l2",
    "knn_cosine",
    "knn_filtered",
    "knn_pruned_2of3",
    "store_shard_distribution",
    "dedup_exact",
    "curation_pipeline",
    "dedup_minhash_shingle",
    "dedup_simhash",
    "multimodal_pipeline",
    "doc_quality",
    "events_sessions",
    "events_windowed",
    "events_asof_purchase",
    "events_salted_agg",
    "tpch_q1_pricing",
    "tpch_q3_topk_revenue",
    "tpch_q5_nation_revenue",
    "tpch_q17_small_qty",
    "customer_rank_analytics",
    "returnflag_pivot_unpivot",
    "decontam_overlap",
    "semantic_search_topk",
    "order_window_ranks",
    "order_part_lists",
    "lineitem_price_stats",
    "doc_tfidf_top3",
    "doc_bm25_topk",
    "hybrid_rrf_topk",
    "doc_chunks",
    "doc_sample_fingerprint",
    "embedding_neardup",
    "setsim_pairs",
    "dedup_clusters",
]

# Measured and reported but not part of headline_total: documented
# worst-case baselines and paths whose gate slot was ceded (driver caps
# the gated catalog at 50), kept honest in the record. Names not in the
# catalog resolve through EXTRA_RUNNERS.
EXTRA = [
    "dedup_minhash",
    "dedup_minhash_capped",
    "ann_ivf_topk",
    "events_approx_distinct",
    # ceded gate slots (catalog.py overflow); still exact-checked in
    # tests and measured here
    "events_value_histogram",
    "customer_set_ops",
    "doc_packs",
    "mix_weighted_sources",
    "strat_sample_quota",
    "strat_sample_weighted",
    # r6 rotation moved these three INTO the driver's gate window;
    # they stay here (not headline) so round-over-round bench deltas
    # keep comparing like with like
    "doc_pii_scrub",
    "doc_lm_score",
    "knn_hamming",
    # r6: BPE merge-step statistics (catalog overflow slot)
    "bpe_pair_stats",
    # r8 rotation promoted these two back into the gate window; they
    # join the bench record here (the other two returning gates,
    # order_window_ranks / lineitem_price_stats, were in HEADLINE all
    # along) so every gated query has a measured number
    "priority_stats",
    "source_regex_stats",
    # r8: filtered hybrid serving (overflow gate)
    "hybrid_filtered_topk",
    # r9: retrieval-quality eval over the exact-kNN ranker
    # (operators/evaluate.py; in-window since the r10 rotation)
    "retrieval_eval_metrics",
    # r9: Morton layout key (operators/zorder.py; in-window since r10)
    "events_zorder_key",
    # r9: snapshot drift monitor (operators/drift.py; in-window since r10)
    "embedding_drift",
    # r9: Gopher n-gram repetition filter (in-window since r10)
    "doc_gopher_repetition",
    # r9: DSIR importance weights (operators/dsir.py; in-window since r10)
    "doc_dsir_weights",
    # r9: exact repeated-substring detection (in-window since r10)
    "doc_substring_dedup",
    # r10: unigram-LM Viterbi apply gate (overflow; operators/unigram.py)
    "doc_unigram_tokens",
    # r10: Lee-et-al substring TRIM (operators/substring_dedup; the
    # stats form is the doc_substring_dedup gate)
    "substring_trim",
    # r11: language identification from raw text (operators/langid.py)
    # + the derived-lang curation pass (both in-window gates)
    "doc_langid",
    "curation_pipeline_langid",
    # r12 (VERDICT r11 #6): the three declared queries that had no
    # timing record in either block — additions-only
    "events_json_extract",
    "centroid_assign",
    "embedding_quantize_error",
]

# r12 (VERDICT r11 #6): noop-sink twins for gates whose count() number
# under-measures the real computation (count() prunes pure projections
# and join-eliminates LEFT JOINs on unique keys — guide §1.4, measured
# in OPTIMIZATION_r11.md). Reported as "<name>__noop" in the extra
# block; the count-action numbers above are UNCHANGED, so the driver's
# round-over-round comparison keeps its methodology and additionally
# sees the real work.
NOOP_TWINS = [
    "doc_langid",
    "doc_substring_dedup",
    "doc_quality",
    "doc_gopher_repetition",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(
        app_name="dvdb-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = build_catalog()

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup (the reference's latency plots likewise
    # exclude server startup), and one no-op mapInPandas so Python-worker
    # launch isn't billed to the first Arrow-path query.
    catalog["lsh_buckets"].run(spark, sf_dir).count()
    spark.range(int(cpus)).mapInPandas(lambda it: it, schema="id long").count()

    # min-of-N per query (headline convention since r5; BASELINE.md):
    # the VM shows multiplicative CPU-steal noise with 34-60 s spreads
    # on identical plans, so the MINIMUM is the honest steady-state
    # estimate; the MEDIAN is emitted alongside so round-over-round
    # deltas separate plan changes from scheduler weather without
    # prose caveats.
    # r8 (VERDICT r7 #8): 5 repeats for the official run, and p25
    # emitted next to min/median, so round-over-round deltas separate
    # plan changes from scheduler weather without prose caveats.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))

    from distributedvectordatabase_spark.catalog import (
        _run_ann_ivf,
        _run_events_approx_distinct,
    )

    def _run_dedup_minhash_capped(spark, sf_dir):
        # the saturated-vocab worst case with the per-band-key cap
        # (operators/dedup.minhash_band_pairs) bounding the pair
        # output — measured next to the uncapped form above it
        from distributedvectordatabase_spark.operators.dedup import (
            minhash_neardup_pairs,
        )
        from distributedvectordatabase_spark.sources.tables import load_table

        # no spread=True here, unlike the catalog's dedup_minhash
        # runner: an r11 A/B measured the capped form SLOWER with the
        # scan spread (2.28 -> 2.62 s) — the cap drops the saturated
        # verification mass that made parallelizing the scan pay, so
        # the extra exchange is pure overhead (OPTIMIZATION_r11.md)
        docs = load_table(spark, "documents", sf_dir)
        return minhash_neardup_pairs(
            docs, threshold=0.9, bands=2, rows=6, max_band_freq=500
        )

    def _run_substring_trim(spark, sf_dir):
        # the Lee-et-al span-removal pass (operators/substring_dedup,
        # r10) — the stats form is gated as doc_substring_dedup; this
        # measures the trim's extra cost (span explode + anti-join +
        # per-doc reassembly)
        from distributedvectordatabase_spark.operators.substring_dedup import (
            substring_trim,
        )
        from distributedvectordatabase_spark.sources.tables import load_table

        return substring_trim(load_table(spark, "documents", sf_dir), k=8)

    extra_runners = {
        "ann_ivf_topk": _run_ann_ivf,
        "events_approx_distinct": _run_events_approx_distinct,
        "dedup_minhash_capped": _run_dedup_minhash_capped,
        "substring_trim": _run_substring_trim,
    }

    def time_query(name: str, action: str = "count") -> tuple[float, float, float]:
        run = catalog[name].run if name in catalog else extra_runners[name]
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = run(spark, sf_dir)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.perf_counter() - t0)
        times.sort()
        p25_idx = max(0, round(0.25 * (len(times) - 1)))
        return (
            round(times[0], 4),
            round(times[p25_idx], 4),
            round(times[len(times) // 2], 4),
        )

    timed = {name: time_query(name) for name in HEADLINE}
    timed_extra = {name: time_query(name) for name in EXTRA}
    timed_extra.update(
        {f"{name}__noop": time_query(name, action="noop") for name in NOOP_TWINS}
    )
    timings = {name: t[0] for name, t in timed.items()}
    p25s = {name: t[1] for name, t in timed.items()}
    medians = {name: t[2] for name, t in timed.items()}
    extra = {name: t[0] for name, t in timed_extra.items()}
    extra_medians = {name: t[2] for name, t in timed_extra.items()}

    total = round(sum(timings.values()), 4)
    # Two lines since r12 (VERDICT r11 #8): the driver's finite tail
    # capture clipped the FRONT of r10's single huge JSON line and the
    # whole round-over-round comparison was lost (BENCH_r10 parsed:
    # null). The optional diagnostic maps (p25/median/extra_median) now
    # ride a separate line printed FIRST; the contract line — metric /
    # unit / sf / queries / extra / value(+p25/median scalars) — prints
    # LAST and is less than half the size, so a tail capture keeps it
    # whole. Within the contract line value/value_median stay LAST
    # (VERDICT r6 #8: when truncation does hit, the tail keeps the
    # headline totals). All keys are additions/moves of optional
    # diagnostics; the contract keys are unchanged.
    print(
        json.dumps(
            {
                "metric": "headline_diagnostics",
                "unit": "sec",
                "sf": sf,
                "p25": p25s,
                "median": medians,
                "extra_median": extra_medians,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "unit": "sec",
                "sf": sf,
                "repeats": repeats,
                "queries": timings,
                "extra": extra,
                "value": total,
                "value_p25": round(sum(p25s.values()), 4),
                "value_median": round(sum(medians.values()), 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
