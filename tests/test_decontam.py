"""Benchmark-decontamination operator: known-overlap fixtures + the
broadcast plan shape (the benchmark side must broadcast — the training
corpus is never shuffled un-aggregated)."""

from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.decontam import ngram_contamination
from distributedvectordatabase_spark.plans.inspect import has_broadcast


def test_known_overlap_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # shingles: "a b c", "b c d" — 1 hit
            (2, "x y z w"),      # no overlap
            (3, "a b c q r"),    # "a b c", "b c q", "c q r" — 3 hits
            (4, "a b"),          # too short for a 3-shingle
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c q r s")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    assert set(out) == {1, 3}
    assert (out[1].n_shingles, out[1].n_hits) == (2, 1)
    assert abs(out[1].contamination - 0.5) < 1e-12
    assert (out[3].n_shingles, out[3].n_hits) == (3, 3)
    assert abs(out[3].contamination - 1.0) < 1e-12


def test_min_hits_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (3, "a b c q r")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, "a b c q r s")], "doc_id long, text string")
    out = ngram_contamination(docs, bench, n=3, min_hits=2)
    assert [r.doc_id for r in out.collect()] == [3]


def test_duplicate_shingles_counted_once(spark):
    """Distinct semantics on both sides: repeats within a doc or the
    benchmark never inflate the hit count."""
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "a b c"), (101, "a b c")], "doc_id long, text string"
    )
    rows = ngram_contamination(docs, bench, n=3).collect()
    assert len(rows) == 1
    # doc shingles (distinct): "a b c", "b c a", "c a b" — one of them hits
    assert (rows[0].n_shingles, rows[0].n_hits) == (3, 1)


def test_benchmark_side_broadcasts(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, "w1 w2 w3")], "doc_id long, text string")
    out = ngram_contamination(docs, bench, n=3)
    assert has_broadcast(out), "benchmark shingle set must broadcast"


def test_empty_and_short_benchmark(spark):
    """An empty benchmark (or one with only sub-n docs) flags nothing;
    min_hits=0 returns every doc that has shingles (n_hits may be 0)."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_contamination(docs, empty, n=3).count() == 0
    short = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    assert ngram_contamination(docs, short, n=3).count() == 0
    allrows = ngram_contamination(docs, short, n=3, min_hits=0).collect()
    # doc 2 has no 3-shingles, so only doc 1 appears — with zero hits
    assert [(r.doc_id, r.n_hits) for r in allrows] == [(1, 0)]
