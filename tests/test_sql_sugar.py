"""knn(...) SQL table-factor sugar: one SQL line must produce rows
identical to the Python store API, with the same physical plan
properties (partition pruning, TakeOrderedAndProject top-k) — the
SQL-facing mirror of the reference's single query-by-vector call
(coordinator_server.py:76-141)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.plans import (
    has_take_ordered,
    scan_partition_filters,
)
from distributedvectordatabase_spark.sources.ivf_store import IVFStore
from distributedvectordatabase_spark.sources.tables import load_table
from distributedvectordatabase_spark.sources.vector_store import VectorStore
from distributedvectordatabase_spark.sql import rewrite, sql
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    emb = load_table(spark, "embeddings", SF_SMALL)
    base = tmp_path_factory.mktemp("sqlsugar")
    vs = VectorStore(str(base / "lsh"))
    vs.write(emb)
    ivf = IVFStore(str(base / "ivf"), n_cells=8)
    ivf.build(emb)
    return vs, ivf


def _vec(spark, vid: int) -> tuple[str, list[float]]:
    row = (
        load_table(spark, "embeddings", SF_SMALL)
        .filter(F.col("vec_id") == vid)
        .first()
    )
    xs = [float(x) for x in row.embedding]
    return "array(" + ", ".join(repr(x) for x in xs) + ")", xs


def _vec_sql(spark, vid: int) -> str:
    return _vec(spark, vid)[0]


def test_knn_sql_matches_store_api(spark, stores):
    vs, _ = stores
    vec, xs = _vec(spark, 7)
    got = sql(spark, f"SELECT * FROM knn('{vs.path}', {vec}, 5)").collect()
    q = spark.createDataFrame([(0, xs)], "qid long, qvec array<double>")
    want = vs.knn(spark, q, k=5).select("neighbor_id", "dist", "rnk").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got and min(r.rnk for r in got) == 1
    # self-query: the stored vector itself is rank 1
    assert [r.neighbor_id for r in sorted(got, key=lambda r: r.rnk)][0] == 7


def test_knn_sql_plan_pruned_and_take_ordered(spark, stores):
    vs, _ = stores
    vec = _vec_sql(spark, 3)
    df = sql(spark, f"SELECT * FROM knn('{vs.path}', {vec}, 5)")
    assert has_take_ordered(df)
    pf = scan_partition_filters(df)
    assert any("shard_id" in f for f in pf), pf


def test_knn_sql_ivf_store_and_composability(spark, stores):
    """knn(...) detects the IVF store from its sidecar and composes
    with ordinary SQL (joins, filters) like any table."""
    _, ivf = stores
    vec = _vec_sql(spark, 11)
    df = sql(
        spark,
        f"""
        SELECT r.neighbor_id, r.rnk, e.embedding
        FROM knn('{ivf.path}', {vec}, 3, 8) r
        JOIN parquet.`{SF_SMALL}/embeddings.parquet` e
          ON e.vec_id = r.neighbor_id
        ORDER BY r.rnk
        """,
    )
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0].neighbor_id == 11  # full probe → exact self-hit
    pf = scan_partition_filters(df)
    assert any("cell_id" in f for f in pf), pf


@pytest.fixture(scope="module")
def ivf_meta(spark, tmp_path_factory):
    emb = load_table(spark, "embeddings", SF_SMALL)
    store = IVFStore(
        str(tmp_path_factory.mktemp("sqlsugar_meta") / "ivf"),
        n_cells=8,
        meta_cols=("label",),
    )
    store.build(emb)
    return store


def test_knn_sql_filtered_matches_python_path(spark, ivf_meta):
    """r8 (VERDICT r7 #6): the where/n_probe/escalate knobs — the SQL
    factor must be row-identical to IVFStore.knn's exact-with-
    escalation filtered search, with the predicate pushed down next to
    the probed-cell pruning."""
    vec, xs = _vec(spark, 7)
    got = sql(
        spark,
        f"SELECT * FROM knn('{ivf_meta.path}', {vec}, 5, "
        "n_probe => 2, where => 'label = 3')",
    ).collect()
    q = spark.createDataFrame([(0, xs)], "qid long, qvec array<double>")
    want = (
        ivf_meta.knn(spark, q, k=5, n_probe=2, where="label = 3")
        .select("neighbor_id", "dist", "rnk")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # every hit satisfies the predicate, and escalation filled to k
    labels = {
        r.label
        for r in load_table(spark, "embeddings", SF_SMALL)
        .filter(F.col("vec_id").isin([x.neighbor_id for x in got]))
        .collect()
    }
    assert labels == {3} and len(got) == 5
    # escalate => false pins the probe set (subset-of-exact semantics)
    pinned = sql(
        spark,
        f"SELECT * FROM knn('{ivf_meta.path}', {vec}, 5, "
        "n_probe => 2, where => 'label = 3', escalate => false)",
    ).collect()
    want_pinned = (
        ivf_meta.knn(spark, q, k=5, n_probe=2, where="label = 3", escalate=False)
        .select("neighbor_id", "dist", "rnk")
        .collect()
    )
    assert sorted(map(tuple, pinned)) == sorted(map(tuple, want_pinned))


def test_knn_sql_filtered_plan_pruned(spark, ivf_meta):
    vec = _vec_sql(spark, 3)
    df = sql(
        spark,
        f"SELECT * FROM knn('{ivf_meta.path}', {vec}, 5, "
        "n_probe => 2, where => 'label = 3', escalate => false)",
    )
    pf = scan_partition_filters(df)
    assert any("cell_id" in f for f in pf), pf
    # the metadata predicate reached the scan (pushed filter), not a
    # post-score discard
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "label" in plan


def test_knn_sql_named_args_lsh_and_errors(spark, stores):
    vs, _ = stores
    vec, xs = _vec(spark, 5)
    got = sql(
        spark,
        f"SELECT * FROM knn('{vs.path}', {vec}, 4, "
        "probes => 2, metric => 'cosine', where => 'vec_id % 2 = 1')",
    ).collect()
    assert got and all(r.neighbor_id % 2 == 1 for r in got)
    with pytest.raises(ValueError, match="escalate"):
        sql(
            spark,
            f"SELECT * FROM knn('{vs.path}', {vec}, 4, escalate => true)",
        )
    with pytest.raises(ValueError, match="unknown option"):
        sql(spark, f"SELECT * FROM knn('{vs.path}', {vec}, 4, bogus => 1)")
    with pytest.raises(ValueError, match="both positionally and named"):
        sql(spark, f"SELECT * FROM knn('{vs.path}', {vec}, 4, 2, probes => 3)")
    with pytest.raises(ValueError, match="true or false"):
        sql(
            spark,
            f"SELECT * FROM knn('{vs.path}', {vec}, 4, escalate => maybe)",
        )


def test_knn_sql_named_arg_edges_raise(spark, stores, ivf_meta):
    """ADVICE r8 #5: both probe spellings named must raise (not let
    probes silently win), and escalate => on an unfiltered IVF store
    must raise like the LSH branch does (the unfiltered sugar path is a
    fixed-probe pruned scan that never escalates)."""
    vs, _ = stores
    vec = _vec_sql(spark, 5)
    with pytest.raises(ValueError, match="both probes => and n_probe =>"):
        sql(
            spark,
            f"SELECT * FROM knn('{vs.path}', {vec}, 4, "
            "probes => 2, n_probe => 3)",
        )
    with pytest.raises(ValueError, match="filtered IVF"):
        sql(
            spark,
            f"SELECT * FROM knn('{ivf_meta.path}', {vec}, 4, "
            "escalate => true)",
        )
    # explicit escalate stays accepted where it acts: filtered IVF
    got = sql(
        spark,
        f"SELECT * FROM knn('{ivf_meta.path}', {vec}, 4, "
        "where => 'label = 2', escalate => true)",
    ).collect()
    assert len(got) == 4


def test_knn_sql_metric_and_errors(spark, stores):
    vs, _ = stores
    vec = _vec_sql(spark, 2)
    cos = sql(
        spark, f"SELECT * FROM knn('{vs.path}', {vec}, 4, 2, 'cosine')"
    ).collect()
    assert len(cos) == 4
    with pytest.raises(ValueError, match="no vector store"):
        sql(spark, "SELECT * FROM knn('/nonexistent', array(1.0), 3)")
    with pytest.raises(ValueError, match="string literal"):
        sql(spark, "SELECT * FROM knn(unquoted_path, array(1.0), 3)")
    with pytest.raises(ValueError, match="takes"):
        sql(spark, f"SELECT * FROM knn('{vs.path}', {vec})")


def test_rewrite_leaves_plain_sql_untouched(spark):
    q = "SELECT count(*) FROM range(3) WHERE id < 2"
    assert rewrite(spark, q) == q
    # 'knn' as part of a longer identifier must not trigger
    q2 = "SELECT my_knn(x) FROM t"
    assert rewrite(spark, q2) == q2


# -- bm25(...) table factor -------------------------------------------------

from distributedvectordatabase_spark.sources.text_index import TextIndex


@pytest.fixture(scope="module")
def text_index(spark, tmp_path_factory):
    ix = TextIndex(str(tmp_path_factory.mktemp("sqlix") / "index"), n_buckets=8)
    ix.build(load_table(spark, "documents", SF_SMALL))
    return ix


def test_bm25_sql_matches_index_api(spark, text_index):
    got = sql(
        spark,
        f"SELECT * FROM bm25('{text_index.path}', array('dup', 'vector'), 5)",
    ).collect()
    want = text_index.bm25(spark, ["dup", "vector"], k=5).collect()
    assert [(r.doc_id, r.score, r.rnk) for r in got] == [
        (r.doc_id, r.score, r.rnk) for r in want
    ]


def test_bm25_sql_composes_with_plain_sql(spark, text_index):
    # the table factor is a normal table — filterable, projectable
    df = sql(
        spark,
        f"""
        SELECT doc_id, score FROM bm25('{text_index.path}', array('dup'), 10)
        WHERE rnk <= 3
        """,
    )
    assert df.count() == 3


def test_bm25_sql_errors(spark, text_index):
    with pytest.raises(ValueError, match="takes"):
        sql(spark, f"SELECT * FROM bm25('{text_index.path}', array('a'))")
    with pytest.raises(ValueError, match="no text index"):
        sql(spark, "SELECT * FROM bm25('/nonexistent', array('a'), 3)")
    with pytest.raises(ValueError, match="empty"):
        sql(spark, f"SELECT * FROM bm25('{text_index.path}', array(), 3)")


# -- hybrid(...) table factor (r6) -------------------------------------------


def test_hybrid_sql_matches_serve_api(spark, stores, text_index):
    """hybrid('<store>','<index>', vec, terms, k) must return exactly
    the hybrid_serve_batch rows for the same single query — exact and
    LSH-pruned forms."""
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch

    vs, _ = stores
    vec_sql, xs = _vec(spark, 3)
    terms_sql = "array('dup', 'vector')"
    q = spark.createDataFrame(
        [(0, xs, ["dup", "vector"])],
        "qid long, qvec array<double>, terms array<string>",
    )

    got = sql(
        spark,
        f"SELECT * FROM hybrid('{vs.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5)",
    ).collect()
    want = hybrid_serve_batch(spark, vs, text_index, q, k=5).drop("qid").collect()
    key = lambda r: (r.rnk, r.doc_id, round(r.rrf_score, 12))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want)) and len(got) == 5

    pruned = sql(
        spark,
        f"SELECT * FROM hybrid('{vs.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5, 2)",
    ).collect()
    want_p = hybrid_serve_batch(
        spark, vs, text_index, q, k=5, num_candidates=2
    ).drop("qid").collect()
    assert sorted(map(key, pruned)) == sorted(map(key, want_p))


def test_hybrid_sql_composes_and_errors(spark, stores, text_index):
    vs, _ = stores
    vec_sql = _vec_sql(spark, 1)
    n = sql(
        spark,
        f"SELECT count(*) AS n FROM hybrid('{vs.path}', '{text_index.path}', "
        f"{vec_sql}, array('query'), 3) WHERE rnk <= 2",
    ).first().n
    assert n == 2
    with pytest.raises(ValueError, match="no vector store"):
        sql(
            spark,
            f"SELECT * FROM hybrid('/nope', '{text_index.path}', "
            f"{vec_sql}, array('x'), 3)",
        )
    with pytest.raises(ValueError, match="takes"):
        sql(spark, f"SELECT * FROM hybrid('{vs.path}', {vec_sql}, 3)")


def test_hybrid_sql_auto_detects_ivf_store(spark, stores, text_index):
    """r7 (VERDICT r6 #7): hybrid(...) detects an IVF store from its
    _centroids.json (the knn(...) rule) and serves the probed semantic
    leg — rows identical to hybrid_serve_batch over the same IVFStore,
    full-probe and pruned."""
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch

    _, ivf = stores
    vec_sql, xs = _vec(spark, 3)
    terms_sql = "array('dup', 'vector')"
    q = spark.createDataFrame(
        [(0, xs, ["dup", "vector"])],
        "qid long, qvec array<double>, terms array<string>",
    )
    key = lambda r: (r.rnk, r.doc_id, round(r.rrf_score, 12))  # noqa: E731

    got = sql(
        spark,
        f"SELECT * FROM hybrid('{ivf.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5)",
    ).collect()
    want = hybrid_serve_batch(spark, ivf, text_index, q, k=5).drop("qid").collect()
    assert sorted(map(key, got)) == sorted(map(key, want)) and len(got) == 5

    pruned = sql(
        spark,
        f"SELECT * FROM hybrid('{ivf.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5, 2)",
    ).collect()
    want_p = hybrid_serve_batch(
        spark, ivf, text_index, q, k=5, n_probe=2
    ).drop("qid").collect()
    assert sorted(map(key, pruned)) == sorted(map(key, want_p))


def test_hybrid_sql_named_probe_args(spark, stores, text_index):
    """r8: named probe knobs on hybrid(...) — n_probe names the IVF
    store's knob (matching store kind enforced), num_candidates the
    LSH store's; rows identical to the positional form."""
    vs, ivf = stores
    vec_sql, _ = _vec(spark, 3)
    terms_sql = "array('dup', 'vector')"
    key = lambda r: (r.rnk, r.doc_id, round(r.rrf_score, 12))  # noqa: E731

    pos = sql(
        spark,
        f"SELECT * FROM hybrid('{ivf.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5, 2)",
    ).collect()
    named = sql(
        spark,
        f"SELECT * FROM hybrid('{ivf.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5, n_probe => 2)",
    ).collect()
    assert sorted(map(key, pos)) == sorted(map(key, named))

    with pytest.raises(ValueError, match="IVF store's knob"):
        sql(
            spark,
            f"SELECT * FROM hybrid('{vs.path}', '{text_index.path}', "
            f"{vec_sql}, {terms_sql}, 5, n_probe => 2)",
        )
    with pytest.raises(ValueError, match="LSH store's knob"):
        sql(
            spark,
            f"SELECT * FROM hybrid('{ivf.path}', '{text_index.path}', "
            f"{vec_sql}, {terms_sql}, 5, num_candidates => 2)",
        )
    with pytest.raises(ValueError, match="more than once"):
        sql(
            spark,
            f"SELECT * FROM hybrid('{ivf.path}', '{text_index.path}', "
            f"{vec_sql}, {terms_sql}, 5, 2, n_probe => 2)",
        )


def test_hybrid_sql_where_matches_python_path(spark, ivf_meta, text_index):
    """r8: hybrid(..., where => ...) — filtered hybrid serving through
    the SQL factor, row-identical to hybrid_serve_batch(where=...)."""
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch

    vec_sql, xs = _vec(spark, 3)
    terms_sql = "array('dup', 'vector')"
    q = spark.createDataFrame(
        [(0, xs, ["dup", "vector"])],
        "qid long, qvec array<double>, terms array<string>",
    )
    key = lambda r: (r.rnk, r.doc_id, round(r.rrf_score, 12))  # noqa: E731
    got = sql(
        spark,
        f"SELECT * FROM hybrid('{ivf_meta.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5, where => 'label = 3')",
    ).collect()
    want = hybrid_serve_batch(
        spark, ivf_meta, text_index, q, k=5, where="label = 3"
    ).drop("qid").collect()
    assert sorted(map(key, got)) == sorted(map(key, want)) and got
    labels = {
        r.label
        for r in load_table(spark, "embeddings", SF_SMALL)
        .filter(F.col("vec_id").isin([x.doc_id for x in got]))
        .collect()
    }
    assert labels == {3}


def test_knn_and_hybrid_sql_as_of_snapshots(spark, tmp_path, text_index):
    """r8: as_of / store_as_of / index_as_of named options — time-travel
    serving from one SQL line, identical to the Python as_of_gen path
    and blind to post-pin appends."""
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch

    emb = load_table(spark, "embeddings", SF_SMALL)
    e1, e2 = emb.filter("vec_id < 250"), emb.filter("vec_id >= 250")
    vs = VectorStore(str(tmp_path / "vs"), )
    vs.write(e1)
    g = vs.current_gen()
    vs.append(e2)

    vec, xs = _vec(spark, 300)  # a post-pin vector as the query
    pinned = sql(
        spark,
        f"SELECT * FROM knn('{vs.path}', {vec}, 5, as_of => {g})",
    ).collect()
    q = spark.createDataFrame([(0, xs)], "qid long, qvec array<double>")
    want = (
        vs.knn(spark, q, k=5, as_of_gen=g)
        .select("neighbor_id", "dist", "rnk")
        .collect()
    )
    assert sorted(map(tuple, pinned)) == sorted(map(tuple, want))
    assert pinned and all(r.neighbor_id < 250 for r in pinned)
    live = sql(spark, f"SELECT * FROM knn('{vs.path}', {vec}, 5)").collect()
    assert any(r.neighbor_id >= 250 for r in live)  # self-hit at least

    ig = text_index.current_gen()
    got = sql(
        spark,
        f"SELECT * FROM hybrid('{vs.path}', '{text_index.path}', "
        f"{vec}, array('dup', 'vector'), 5, "
        f"store_as_of => {g}, index_as_of => {ig})",
    ).collect()
    qh = spark.createDataFrame(
        [(0, xs, ["dup", "vector"])],
        "qid long, qvec array<double>, terms array<string>",
    )
    want_h = hybrid_serve_batch(
        spark, vs, text_index, qh, k=5, store_as_of=g, index_as_of=ig
    ).drop("qid").collect()
    key = lambda r: (r.rnk, r.doc_id, round(r.rrf_score, 12))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want_h)) and got


def test_hybrid_sql_compressed_leg_with_where(spark, stores, text_index):
    """r9: use_sq => true routes the semantic leg through the SQ8 codes
    sidecar, composing with where — rows identical to
    hybrid_serve_batch(use_sq=True, where=...)."""
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch

    vs, _ = stores
    vs.build_sq(spark)
    vec_sql, xs = _vec(spark, 3)
    terms_sql = "array('dup', 'vector')"
    q = spark.createDataFrame(
        [(0, xs, ["dup", "vector"])],
        "qid long, qvec array<double>, terms array<string>",
    )
    key = lambda r: (r.rnk, r.doc_id, round(r.rrf_score, 12))  # noqa: E731

    got = sql(
        spark,
        f"SELECT * FROM hybrid('{vs.path}', '{text_index.path}', "
        f"{vec_sql}, {terms_sql}, 5, use_sq => true, "
        "where => 'vec_id % 2 = 1')",
    ).collect()
    want = hybrid_serve_batch(
        spark, vs, text_index, q, k=5, use_sq=True, where="vec_id % 2 = 1"
    ).drop("qid").collect()
    assert sorted(map(key, got)) == sorted(map(key, want)) and got
    assert all(r.doc_id % 2 == 1 for r in got)
    # both compressed legs at once stays a refusal
    with pytest.raises(ValueError, match="ONE compressed leg"):
        sql(
            spark,
            f"SELECT * FROM hybrid('{vs.path}', '{text_index.path}', "
            f"{vec_sql}, {terms_sql}, 5, use_sq => true, use_bq => true)",
        )
