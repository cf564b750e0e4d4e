"""SQL scalar-function registration + NPZ source round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.functions.register import register_sql_functions
from distributedvectordatabase_spark.sources.npz import read_npz, write_npz
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def registered(spark):
    names = register_sql_functions(spark)
    load_table(spark, "embeddings", SF_SMALL).createOrReplaceTempView("emb_fn_test")
    return names


def test_registers_expected_functions(registered):
    assert {"l2sq", "cosine_sim", "lsh_bucket", "l2_normalize", "ws_tokens"} <= set(registered)


def test_sql_l2sq_matches_dataframe_expr(spark, registered):
    from distributedvectordatabase_spark.functions.vector import l2_norm

    got = spark.sql(
        "SELECT vec_id, l2sq(embedding, embedding) AS z, "
        "round(l2_norm(embedding), 6) AS n FROM emb_fn_test ORDER BY vec_id LIMIT 50"
    ).collect()
    assert all(r.z == 0.0 for r in got)
    want = (
        load_table(spark, "embeddings", SF_SMALL)
        .select("vec_id", F.round(l2_norm("embedding"), 6).alias("n"))
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    assert [r.n for r in got] == [r.n for r in want]


def test_sql_lsh_bucket_matches_pandas_udf_assign(spark, registered):
    """SQL callers and the DataFrame API must bucket identically."""
    lsh = SignLSH()
    sql_buckets = {
        r.vec_id: r.b
        for r in spark.sql("SELECT vec_id, lsh_bucket(embedding) AS b FROM emb_fn_test").collect()
    }
    df_buckets = {
        r.vec_id: r.shard_id
        for r in lsh.assign(load_table(spark, "embeddings", SF_SMALL)).collect()
    }
    assert sql_buckets == df_buckets


def test_sql_cosine_self_similarity_is_one(spark, registered):
    rows = spark.sql(
        "SELECT round(cosine_sim(embedding, embedding), 6) AS s FROM emb_fn_test LIMIT 20"
    ).collect()
    assert all(r.s == 1.0 for r in rows)


def test_sql_tokens(spark, registered):
    row = spark.sql("SELECT ws_tokens('a  b c') AS t, n_ws_tokens('a  b c') AS n").first()
    assert row.t == ["a", "b", "c"] and row.n == 3


def test_npz_roundtrip(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF_SMALL).limit(100)
    p = str(tmp_path / "corpus.npz")
    write_npz(emb, p)
    back = read_npz(spark, p)
    assert back.count() == 100
    a = {r.vec_id: list(r.embedding) for r in emb.collect()}
    b = {r.vec_id: list(r.embedding) for r in back.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert np.allclose(a[k], b[k])


def test_npz_write_guards_oversized_export(spark, tmp_path):
    """r8: write_npz is driver-side by nature — an over-limit corpus
    must raise the explicit export-tool error, never OOM the driver."""
    import pytest

    emb = load_table(spark, "embeddings", SF_SMALL).limit(100)
    with pytest.raises(ValueError, match="driver-side export tool"):
        write_npz(emb, str(tmp_path / "big.npz"), max_rows=50)


def test_npz_without_ids_autogenerates(spark, tmp_path):
    p = str(tmp_path / "noids.npz")
    np.savez_compressed(p, embeddings=np.random.RandomState(0).randn(10, 8).astype(np.float32))
    df = read_npz(spark, p)
    assert [r.vec_id for r in df.orderBy("vec_id").collect()] == list(range(10))
