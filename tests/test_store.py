"""VectorStore: write/read round-trip, partition pruning, append with
auto-ids, dimension enforcement, pruned-kNN recall, stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.operators.knn import knn, recall_at_k
from distributedvectordatabase_spark.operators.stats import distribution_metrics, shard_distribution
from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture
from distributedvectordatabase_spark.sources.vector_store import DimensionMismatchError, VectorStore
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "emb")
    vs = VectorStore(path, SignLSH(dim=64))
    vs.write(load_table(spark, "embeddings", SF_DIR))
    return vs


def test_roundtrip_counts_and_buckets(spark, store):
    src = load_table(spark, "embeddings", SF_DIR)
    back = store.read(spark)
    assert back.count() == src.count() == 500
    # every row kept its id and landed in its LSH bucket
    pdf = back.select("vec_id", "embedding", "shard_id").orderBy("vec_id").toPandas()
    want = store.lsh.bucket_of(np.array(list(pdf["embedding"])))
    assert pdf["shard_id"].astype(int).tolist() == want.tolist()


def test_partition_pruning_in_plan(spark, store):
    df = store.read(spark).filter(F.col("shard_id") == 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan
    assert df.select("shard_id").distinct().collect()[0][0] == 1


def test_pruned_knn_recall(spark, store):
    queries = queries_fixture(spark, SF_DIR, n=10)
    exact = knn(load_table(spark, "embeddings", SF_DIR), queries, k=10)
    approx = store.knn(spark, queries, k=10, pruned=True, num_candidates=2)
    r = recall_at_k(exact, approx, k=10)
    assert r >= 0.5, f"2-of-3-shard probe recall collapsed: {r}"
    # probing every shard must be exact
    full = store.knn(spark, queries, k=10, pruned=True, num_candidates=3)
    assert recall_at_k(exact, full, k=10) == 1.0


def test_append_auto_ids_globally_unique(spark, store):
    rng = np.random.RandomState(0)
    extra = spark.createDataFrame(
        [(rng.standard_normal(64).astype(float).tolist(),) for _ in range(10)],
        schema="embedding array<float>",
    )
    store.append(extra)
    back = store.read(spark)
    assert back.count() == 510
    assert back.select("vec_id").distinct().count() == 510  # no collisions


def test_dimension_enforced(spark, store):
    bad = spark.createDataFrame([([1.0, 2.0],)], schema="embedding array<float>")
    with pytest.raises(DimensionMismatchError):
        store.append(bad)


def test_stats_and_distribution(spark, store):
    stats = store.shard_stats(spark)
    rows = stats.collect()
    assert sum(r.total_vectors for r in rows) == 510
    assert all(r.dimension == 64 for r in rows)
    sys_stats = store.system_stats(spark).first()
    assert sys_stats.total_vectors == 510

    dist = shard_distribution(store.read(spark)).collect()
    assert abs(sum(r.pct for r in dist) - 100.0) < 1e-4
    m = distribution_metrics(store.read(spark)).first()
    assert m.min_count <= m.avg_count <= m.max_count
    assert m.distribution_quality in {"excellent", "good", "acceptable", "uneven"}
    assert abs(m.imbalance_factor - (m.max_count - m.min_count) / m.avg_count) < 1e-4


def test_compact_shrinks_files_preserves_content(spark, tmp_path):
    """Five small appends fragment the store; compact() must restore
    <= files_per_shard files per shard with identical content."""
    import glob
    import os

    from distributedvectordatabase_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, "embeddings", SF_SMALL)
    s = VectorStore(str(tmp_path / "frag"))
    s.write(emb.filter(F.col("vec_id") < 100))
    for lo in range(100, 500, 100):
        s.append(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)),
        )

    def files():
        return glob.glob(os.path.join(s.path, "shard_id=*", "*.parquet"))

    before_rows = {(r.vec_id,) for r in s.read(spark).select("vec_id").collect()}
    n_before = len(files())
    s.compact(spark)
    n_after = len(files())
    assert n_after < n_before
    assert n_after <= s.lsh.num_tables * s.files_per_shard
    after_rows = {(r.vec_id,) for r in s.read(spark).select("vec_id").collect()}
    assert after_rows == before_rows and len(after_rows) == 500


def test_delete_hides_rows_and_knn_excludes(spark, tmp_path):
    path = str(tmp_path / "del_store")
    vs = VectorStore(path, SignLSH(dim=64))
    vs.write(load_table(spark, "embeddings", SF_DIR))
    vs.delete(spark, [0, 1, 2])
    back = vs.read(spark)
    assert back.count() == 497
    assert back.filter(F.col("vec_id").isin([0, 1, 2])).count() == 0
    # search never returns a deleted vector
    queries = queries_fixture(spark, SF_DIR, n=5)
    hits = vs.knn(spark, queries, k=10, pruned=False)
    assert hits.filter(F.col("neighbor_id").isin([0, 1, 2])).count() == 0
    # raw files untouched (merge-on-read: delete wrote only tombstones)
    assert spark.read.parquet(path).count() == 500


def test_delete_then_append_same_id_is_upsert(spark, tmp_path):
    path = str(tmp_path / "upsert_store")
    vs = VectorStore(path, SignLSH(dim=4))
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    vs.write(df)
    new = spark.createDataFrame(
        [(3, [9.0, 9.0, 9.0, 9.0])], "vec_id long, embedding array<float>"
    )
    vs.upsert(new)
    back = vs.read(spark)
    assert back.count() == 5  # still 5 live ids
    got = back.filter(F.col("vec_id") == 3).select("embedding").first()[0]
    assert [float(x) for x in got] == [9.0, 9.0, 9.0, 9.0]
    # upserting a brand-new id inserts it
    vs.upsert(
        spark.createDataFrame(
            [(42, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
        )
    )
    assert vs.read(spark).count() == 6


def test_compact_folds_tombstones_physically(spark, tmp_path):
    import os

    path = str(tmp_path / "fold_store")
    vs = VectorStore(path, SignLSH(dim=64))
    vs.write(load_table(spark, "embeddings", SF_DIR))
    vs.delete(spark, list(range(10)))
    live_before = {r.vec_id for r in vs.read(spark).select("vec_id").collect()}
    vs.compact(spark)
    assert not os.path.exists(os.path.join(path, "_tombstones"))
    assert spark.read.parquet(path).count() == 490  # physically gone
    assert {r.vec_id for r in vs.read(spark).select("vec_id").collect()} == live_before
    # deletes keep working after the fold
    vs.delete(spark, [10])
    assert vs.read(spark).count() == 489


def test_auto_id_never_reuses_a_deleted_id(spark, tmp_path):
    path = str(tmp_path / "reuse_store")
    vs = VectorStore(path, SignLSH(dim=4))
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    vs.write(df)
    vs.delete(spark, [4])  # the max id
    rng = np.random.RandomState(1)
    vs.append(
        spark.createDataFrame(
            [(rng.standard_normal(4).astype(float).tolist(),)],
            "embedding array<float>",
        )
    )
    back = vs.read(spark)
    assert back.count() == 5
    new_id = back.agg(F.max("vec_id")).first()[0]
    assert new_id > 4  # the tombstoned id was not reissued (and the new
    # row is visible — a reissued id 4 would have been silently killed)


def test_legacy_store_without_gen_column(spark, tmp_path):
    """A store written before delete support (no _gen column): reads
    treat every row as gen 0, delete works, and append demands the
    compact() upgrade instead of mixing file schemas."""
    import json as _json
    import os

    path = str(tmp_path / "legacy_store")
    lsh = SignLSH(dim=4)
    df = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    # simulate the old on-disk format: partitioned parquet + _lsh.json,
    # no _gen column
    lsh.assign(df, vec_col="embedding", out="shard_id").write.partitionBy(
        "shard_id"
    ).parquet(path)
    with open(os.path.join(path, "_lsh.json"), "w") as f:
        _json.dump(
            {"dim": 4, "num_fns": lsh.num_fns, "num_tables": lsh.num_tables,
             "seed": lsh.seed, "id_col": "vec_id", "vec_col": "embedding"},
            f,
        )
    vs = VectorStore(path)
    assert vs.read(spark).count() == 5
    vs.delete(spark, [0])
    assert vs.read(spark).count() == 4
    with pytest.raises(ValueError, match="compact"):
        vs.append(df.filter(F.col("vec_id") == 0).drop("vec_id"))
    vs.compact(spark)  # the upgrade path: rewrites with _gen
    assert "_gen" in spark.read.parquet(path).columns
    vs.append(
        spark.createDataFrame(
            [([7.0, 7.0, 7.0, 7.0],)], "embedding array<float>"
        )
    )
    assert vs.read(spark).count() == 5


def test_delete_where_predicate_sweep(spark, tmp_path):
    """Retention-style predicate delete: tombstones only LIVE matching
    rows, returns the count, composes with prior deletes."""
    path = str(tmp_path / "pred_store")
    vs = VectorStore(path, SignLSH(dim=64))
    vs.write(load_table(spark, "embeddings", SF_DIR))
    vs.delete(spark, [0])  # id 0 already dead; predicate must not re-count it
    n = vs.delete_where(spark, F.col("vec_id") < 10)
    assert n == 9
    assert vs.read(spark).count() == 490
    # SQL-string predicate form, nothing left to match
    assert vs.delete_where(spark, "vec_id < 10") == 0
    assert vs.read(spark).count() == 490
