"""Exact kNN correctness vs the DuckDB oracle + reference-semantics
invariants (self-query distance 0, k clamping, tie determinism)."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.vector import duckdb_cosine_dist, duckdb_l2sq
from distributedvectordatabase_spark.operators.knn import knn, knn_single
from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture
from tests.conftest import SF_DIR, assert_matches_oracle


def _oracle_knn_sql(metric_sql: str, n_queries: int, k: int) -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
      SELECT q.qid, e.vec_id AS neighbor_id, {metric_sql} AS dist
      FROM q CROSS JOIN embeddings e
    ),
    ranked AS (
      SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, round(dist, 6) AS dist, rnk
    FROM ranked WHERE rnk <= {k}
    """


@pytest.mark.parametrize("impl", ["expr", "arrow"])
@pytest.mark.parametrize("metric,metric_sql", [
    ("l2sq", duckdb_l2sq("qvec", "e.embedding")),
    ("cosine", duckdb_cosine_dist("qvec", "e.embedding")),
])
def test_knn_matches_oracle(spark, oracle, impl, metric, metric_sql):
    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=10)
    res = knn(corpus, queries, k=5, metric=metric, impl=impl).withColumn(
        "dist", F.round("dist", 6)
    )
    assert_matches_oracle(res, oracle, _oracle_knn_sql(metric_sql, 10, 5))


def test_self_query_distance_zero(spark):
    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=10)
    top1 = knn(corpus, queries, k=1, metric="l2sq").collect()
    assert len(top1) == 10
    for r in top1:
        assert r.neighbor_id == r.qid, "self-query must return itself first"
        assert abs(r.dist) < 1e-9


def test_k_clamped_to_corpus_size(spark):
    corpus = load_table(spark, "embeddings", SF_DIR).limit(3)
    queries = queries_fixture(spark, SF_DIR, n=2)
    res = knn(corpus, queries, k=100, metric="l2sq")
    counts = {r.qid: r.cnt for r in res.groupBy("qid").agg(F.count("*").alias("cnt")).collect()}
    assert all(v == 3 for v in counts.values())


def test_knn_single_topk_plan_and_result(spark, oracle):
    corpus = load_table(spark, "embeddings", SF_DIR)
    qvec = corpus.orderBy("vec_id").first().embedding
    res = knn_single(corpus, qvec, k=5, metric="l2sq")
    # plan: must be TakeOrderedAndProject (per-partition heap, no global sort)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = res.collect()
    assert rows[0].neighbor_id == 0 and abs(rows[0].dist) < 1e-9
    assert [r.neighbor_id for r in rows] == [
        r[0]
        for r in oracle.sql(
            f"""SELECT e.vec_id FROM embeddings e
               CROSS JOIN (SELECT embedding qv FROM embeddings WHERE vec_id=0) q
               ORDER BY {duckdb_l2sq('q.qv', 'e.embedding')}, e.vec_id LIMIT 5"""
        ).fetchall()
    ]


def test_large_query_batch_matches_oracle(spark, oracle):
    """200-query batch (10× the catalog fixture): the per-batch partial
    top-k and the tie slack must hold at larger fan-in, both impls."""
    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=200)
    want = oracle.sql(
        f"""
        WITH q AS (SELECT vec_id qid, embedding qv FROM embeddings ORDER BY vec_id LIMIT 200),
        ranked AS (
          SELECT q.qid, e.vec_id nid,
                 row_number() OVER (PARTITION BY q.qid
                     ORDER BY {duckdb_l2sq('q.qv', 'e.embedding')}, e.vec_id) rnk
          FROM q CROSS JOIN embeddings e
        )
        SELECT qid, nid, rnk FROM ranked WHERE rnk <= 5
        """
    ).fetchall()
    want_set = {(r[0], r[1], r[2]) for r in want}
    for impl in ("arrow", "expr"):
        got = knn(corpus, queries, k=5, metric="l2sq", impl=impl)
        got_set = {(r.qid, r.neighbor_id, r.rnk) for r in got.collect()}
        assert got_set == want_set, f"{impl}: {len(got_set ^ want_set)} mismatches"


def test_partition_count_determinism(spark):
    """The rescored merge makes kNN output independent of partition
    count and Arrow batch split: identical canonical rows whether the
    corpus arrives as 1, 7, or default partitions (locks in the
    _rescored_topk determinism fix structurally)."""
    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=20)

    def canon(df):
        return sorted(
            (r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect()
        )

    base = canon(knn(corpus, queries, k=10, metric="l2sq"))
    for nparts in (1, 7):
        got = canon(knn(corpus.repartition(nparts), queries, k=10, metric="l2sq"))
        assert got == base, f"output differs at repartition({nparts})"


def test_large_magnitude_boundary_ties_deterministic(spark):
    """Adversarial case for the slate guard: many exact-duplicate
    candidates tied AT the 2k slate boundary, at l2sq magnitude ~1e9
    where BLAS-vs-sequential float64 divergence (~1e-16 relative, so
    ~1e-7 absolute) dwarfs the old absolute eps=1e-9 — the relative
    epsilon must still admit every tied candidate, keeping the arrow
    output equal to the expr impl and invariant to partitioning."""
    import numpy as np

    dim = 16
    scale = 2_000.0  # dists ~ dim * scale^2 ~ 6e7..1e9
    rng = np.random.default_rng(99)
    base = (rng.standard_normal(dim) * scale).astype(np.float32)
    far = (rng.standard_normal(dim) * scale).astype(np.float32)
    rows = [(0, [float(x) for x in base])]
    # 5 near-distinct neighbors, then 40 identical 'far' duplicates that
    # all tie exactly at and beyond the k..2k slate boundary
    for i in range(1, 6):
        rows.append((i, [float(x) for x in base + rng.standard_normal(dim).astype(np.float32)]))
    for i in range(6, 46):
        rows.append((i, [float(x) for x in far]))
    corpus = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(0, rows[0][1])], schema="qid long, qvec array<float>"
    )

    def canon(df):
        return sorted((r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect())

    want = canon(knn(corpus, queries, k=10, metric="l2sq", impl="expr"))
    for nparts in (1, 5):
        got = canon(knn(corpus.repartition(nparts), queries, k=10, metric="l2sq"))
        assert got == want, f"arrow != expr at repartition({nparts})"


def test_rescore_rejected_on_expr_impl(spark):
    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=2)
    with pytest.raises(ValueError, match="arrow"):
        knn(corpus, queries, k=3, impl="expr", rescore="joinback")


def test_query_batch_collect_guard(spark, monkeypatch):
    """The driver-side query collect is capped: an over-size query set
    raises instead of OOMing the driver (the join-based path is the
    documented fallback)."""
    # operators/__init__ re-exports the knn *function* under the same
    # name, so fetch the module object itself for the monkeypatch
    import importlib

    knnmod = importlib.import_module("distributedvectordatabase_spark.operators.knn")

    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=20)
    monkeypatch.setattr(knnmod, "MAX_QUERY_BATCH", 5)
    with pytest.raises(ValueError, match="MAX_QUERY_BATCH"):
        knn(corpus, queries, k=3)


def test_joinback_rescore_identical_to_carry(spark):
    """rescore='joinback' (merge shuffle without vectors, corpus
    point-lookup join) must produce byte-identical results to the
    default carry path — same slate, same sequential re-score."""
    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=20)

    def canon(df):
        return sorted(
            (r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect()
        )

    for metric in ("l2sq", "cosine"):
        carry = canon(knn(corpus, queries, k=10, metric=metric))
        joinback = canon(knn(corpus, queries, k=10, metric=metric, rescore="joinback"))
        assert carry == joinback, metric


def test_pruned_joinback_identical_to_carry(spark):
    from distributedvectordatabase_spark.functions.lsh import SignLSH
    from distributedvectordatabase_spark.operators.knn import knn_pruned

    lsh = SignLSH()
    corpus = lsh.assign(load_table(spark, "embeddings", SF_DIR))
    queries = queries_fixture(spark, SF_DIR, n=20)

    def canon(df):
        return sorted(
            (r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect()
        )

    carry = canon(knn_pruned(corpus, queries, lsh, k=10))
    joinback = canon(knn_pruned(corpus, queries, lsh, k=10, rescore="joinback"))
    assert carry == joinback


def test_filtered_knn_global_predicate_pushdown(spark):
    """filtered_knn's global predicate must reach the Parquet scan as a
    pushed filter (filtered search reads less, never post-filters), and
    results must equal kNN over the pre-filtered corpus."""
    from distributedvectordatabase_spark.operators.knn import filtered_knn
    from distributedvectordatabase_spark.plans.inspect import scan_pushed_filters

    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = queries_fixture(spark, SF_DIR, n=5)
    res = filtered_knn(corpus, queries, k=5, predicate="label = 3")
    pushed = " ".join(scan_pushed_filters(res))
    assert "label" in pushed, f"label predicate not pushed: {pushed!r}"

    def canon(df):
        return sorted(
            (r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect()
        )

    want = knn(corpus.filter(F.col("label") == 3), queries, k=5)
    assert canon(res) == canon(want)


@pytest.mark.parametrize("impl", ["expr", "arrow"])
def test_filtered_knn_per_query_constraint(spark, impl):
    """Per-query label constraint: every neighbor shares its query's
    label, and the result equals per-label brute-force search (both
    impls, byte-identical dist)."""
    from distributedvectordatabase_spark.operators.knn import filtered_knn

    corpus = load_table(spark, "embeddings", SF_DIR)
    queries = (
        corpus.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.col("label").alias("qlabel"),
        )
    )
    res = filtered_knn(
        corpus, queries, k=5, filter_col="label", qfilter_col="qlabel", impl=impl
    )
    rows = res.collect()
    labels = {r.vec_id: r.label for r in corpus.select("vec_id", "label").collect()}
    assert len(rows) == 8 * 5
    for r in rows:
        assert labels[r.neighbor_id] == labels[r.qid], r

    # brute reference: filter first, search second, one query at a time
    def canon(df):
        return sorted(
            (r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect()
        )

    want = []
    for q in queries.collect():
        sub = corpus.filter(F.col("label") == q.qlabel)
        one = knn(
            sub,
            spark.createDataFrame(
                [(q.qid, list(q.qvec))], schema="qid long, qvec array<float>"
            ),
            k=5,
        )
        want.extend(canon(one))
    assert canon(res) == sorted(want)


def test_filtered_knn_absent_constraint_value(spark):
    """A query constrained to a value no corpus row has yields no rows
    for that query (and doesn't disturb the others); k larger than the
    allowed group clamps to the group size."""
    from distributedvectordatabase_spark.operators.knn import filtered_knn

    corpus = load_table(spark, "embeddings", SF_DIR)
    first = corpus.orderBy("vec_id").limit(2).collect()
    queries = spark.createDataFrame(
        [
            (first[0].vec_id, list(first[0].embedding), int(first[0].label)),
            (9999, list(first[1].embedding), 424242),  # label that doesn't exist
        ],
        "qid long, qvec array<float>, qlabel int",
    )
    rows = filtered_knn(
        corpus, queries, k=5, filter_col="label", qfilter_col="qlabel"
    ).collect()
    assert {r.qid for r in rows} == {first[0].vec_id}
    assert len(rows) == 5

    # k > group size: every group member returned, nothing more
    group_n = corpus.filter(F.col("label") == first[0].label).count()
    all_rows = filtered_knn(
        corpus,
        queries.filter(F.col("qid") == first[0].vec_id),
        k=group_n + 100,
        filter_col="label",
        qfilter_col="qlabel",
    ).collect()
    assert len(all_rows) == group_n


def test_filtered_knn_negative_and_null_constraints(spark):
    """Regression: raw negative filter values used to wrap around the
    dense Arrow mask (a qlabel=-1 query silently got another label's
    neighbors); values are now dictionary-encoded. NULL constraints
    match nothing; both impls agree."""
    from distributedvectordatabase_spark.operators.knn import filtered_knn

    rows = [
        (i, [float(i), float(i % 7)], -1 if i % 2 == 0 else 5)
        for i in range(40)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = spark.createDataFrame(
        [
            (0, [0.0, 0.0], -1),
            (1, [1.0, 1.0], 5),
            (2, [2.0, 2.0], None),
            (3, [3.0, 3.0], 424242),  # absent value
        ],
        "qid long, qvec array<float>, qlabel int",
    )
    labels = {r[0]: r[2] for r in rows}

    def canon(df):
        return sorted(
            (r.qid, r.neighbor_id, r.rnk, repr(r.dist)) for r in df.collect()
        )

    arrow = filtered_knn(
        corpus, queries, k=3, filter_col="label", qfilter_col="qlabel", impl="arrow"
    )
    expr = filtered_knn(
        corpus, queries, k=3, filter_col="label", qfilter_col="qlabel", impl="expr"
    )
    a = canon(arrow)
    assert a == canon(expr)
    got = arrow.collect()
    assert {r.qid for r in got} == {0, 1}  # NULL + absent yield nothing
    for r in got:
        want = -1 if r.qid == 0 else 5
        assert labels[r.neighbor_id] == want, r

    # joinback path hits the same mask (used to crash on a fully-masked
    # batch when carrying vectors)
    jb = filtered_knn(
        corpus, queries, k=3, filter_col="label", qfilter_col="qlabel",
        impl="arrow", rescore="joinback",
    )
    assert canon(jb) == a


def test_filtered_knn_string_constraint_values(spark):
    """Dictionary encoding makes non-integral constraint types work on
    the arrow path too."""
    from distributedvectordatabase_spark.operators.knn import filtered_knn

    corpus = spark.createDataFrame(
        [(i, [float(i)], "en" if i % 2 else "de") for i in range(20)],
        "vec_id long, embedding array<float>, lang string",
    )
    queries = spark.createDataFrame(
        [(0, [0.0], "de"), (1, [1.0], "en")],
        "qid long, qvec array<float>, qlang string",
    )
    res = filtered_knn(
        corpus, queries, k=4, filter_col="lang", qfilter_col="qlang"
    ).collect()
    langs = {i: ("en" if i % 2 else "de") for i in range(20)}
    assert len(res) == 8
    for r in res:
        assert langs[r.neighbor_id] == ("de" if r.qid == 0 else "en")


def test_local_query_relation_round_trips_exactly(spark):
    """The VALUES LocalRelation the rescore builds from collected query
    rows (r12) must reproduce every double bit-for-bit — repr literals
    parse back correctly-rounded on the JVM side."""
    import math

    from distributedvectordatabase_spark.operators.knn import local_query_relation

    vals = [
        0.1, -0.1, 1e-308, 1.7976931348623157e308, 123456.789e-30,
        -0.0, 2.0 ** -1074, 1 / 3, math.pi, 6.02214076e23,
    ]
    rows = [{"qid": 7, "qvec": vals}]
    out = local_query_relation(spark, rows, "qid", "qvec").collect()
    assert len(out) == 1 and out[0]["qid"] == 7
    got = list(out[0]["qvec"])
    import struct

    assert [struct.pack(">d", x) for x in got] == [
        struct.pack(">d", x) for x in vals
    ]


def test_local_query_relation_empty(spark):
    from distributedvectordatabase_spark.operators.knn import local_query_relation

    df = local_query_relation(spark, [], "qid", "qvec")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["qid", "qvec"]


def test_knn_rescore_side_is_local_relation(spark):
    """The deterministic rescore must NOT re-execute the query subplan
    as a broadcast-build job: the final plan carries exactly one scan
    of the corpus source and a LocalTableScan for the q side (r12)."""
    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.sources.tables import (
        load_table,
        queries_fixture,
    )

    sf = "/root/testdata/sf0.001"
    corpus = load_table(spark, "embeddings", sf)
    queries = queries_fixture(spark, sf, n=3)
    plan = (
        knn(corpus, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LocalTableScan" in plan
    assert plan.count("Scan parquet") == 1
