"""LSH determinism goldens, cross-implementation agreement (numpy /
pandas_udf / pure-expr / DuckDB SQL), and multi-probe properties."""

import numpy as np
import pytest

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lsh():
    return SignLSH(dim=64, num_fns=4, num_tables=3, seed=42)


def test_bucket_deterministic_golden(lsh):
    """Seeded buckets are stable across runs/processes: pin a golden."""
    v = np.arange(64, dtype=np.float64) / 64.0
    again = SignLSH(dim=64, num_fns=4, num_tables=3, seed=42)
    assert lsh.bucket_of(v).tolist() == again.bucket_of(v).tolist()
    ids_sample = np.eye(64)[:5]
    assert lsh.bucket_of(ids_sample).tolist() == again.bucket_of(ids_sample).tolist()


def test_bucket_scale_invariance(lsh):
    """Sign bits are invariant under positive scaling → the reference's
    L2 pre-normalization (lsh_sharding.py:49-53) cannot change buckets."""
    rng = np.random.RandomState(7)
    v = rng.standard_normal((20, 64))
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    assert lsh.bucket_of(v).tolist() == lsh.bucket_of(v / norms).tolist()
    assert lsh.bucket_of(np.zeros(64)).tolist() == [0]


def test_udf_expr_and_duckdb_agree_with_numpy(spark, oracle, lsh):
    emb = load_table(spark, "embeddings", SF_DIR)
    pdf = emb.orderBy("vec_id").toPandas()
    want = lsh.bucket_of(np.array(list(pdf["embedding"])))

    got_udf = (
        lsh.assign(emb).orderBy("vec_id").select("shard_id").toPandas()["shard_id"].values
    )
    assert got_udf.tolist() == want.tolist()

    got_expr = (
        emb.withColumn("s", lsh.bucket_expr("embedding"))
        .orderBy("vec_id")
        .select("s")
        .toPandas()["s"]
        .values
    )
    assert got_expr.tolist() == want.tolist()

    got_duck = [
        r[0]
        for r in oracle.sql(
            f"SELECT {lsh.bucket_sql_duckdb('embedding')} FROM embeddings ORDER BY vec_id"
        ).fetchall()
    ]
    assert got_duck == want.tolist()


def test_candidate_shards_properties(lsh):
    rng = np.random.RandomState(3)
    for _ in range(20):
        v = rng.standard_normal(64)
        primary = int(lsh.bucket_of(v)[0])
        cands = lsh.candidate_shards(v, num_candidates=2)
        assert cands[0] == primary
        assert len(cands) == 2 and len(set(cands)) == 2
        assert all(0 <= c < 3 for c in cands)
        # full probe covers every shard
        assert sorted(lsh.candidate_shards(v, num_candidates=3)) == [0, 1, 2]
        # num_candidates=1 is just the primary
        assert lsh.candidate_shards(v, num_candidates=1) == [primary]
