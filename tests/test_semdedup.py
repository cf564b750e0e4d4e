"""SemDeDup: cluster assignment, within-cell edge correctness vs a
driver-side brute force, both keep policies, conservation, and
determinism under repartitioning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.operators.semdedup import (
    assign_members,
    fit_centroids,
    semantic_dedup,
    semantic_dup_members,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR

DIM = 8


def _planted(spark):
    """Three well-separated cluster cores; cores 0 and 1 carry planted
    near-duplicate copies (tiny noise), core 2 is all-distinct."""
    rng = np.random.RandomState(7)
    cores = np.eye(3, DIM) * 10.0
    rows = []
    vid = 0
    for c in range(3):
        n_dup = [4, 3, 0][c]
        base = cores[c] + rng.standard_normal(DIM) * 0.01
        for _ in range(n_dup):  # planted dup group around `base`
            rows.append((vid, (base + rng.standard_normal(DIM) * 1e-4).tolist()))
            vid += 1
        for _ in range(5):  # distinct members of the same cluster
            rows.append((vid, (cores[c] + rng.standard_normal(DIM) * 1.5).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")
    return df, cores


@pytest.fixture(scope="module")
def planted(spark):
    df, cores = _planted(spark)
    return df.cache(), cores


def test_assign_members_matches_numpy(spark, planted):
    df, cores = planted
    got = assign_members(df, cores).orderBy("vec_id").collect()
    X = np.array([list(r.embedding) for r in df.orderBy("vec_id").collect()])
    C = cores
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want_cell = d2.argmin(axis=1)
    assert [r.cell_id for r in got] == want_cell.tolist()
    sims = np.einsum("ij,ij->i", X, C[want_cell]) / (
        np.linalg.norm(X, axis=1) * np.linalg.norm(C[want_cell], axis=1)
    )
    np.testing.assert_allclose([r.cent_sim for r in got], sims, atol=1e-12)


def test_dup_members_match_brute_force(spark, planted):
    df, cores = planted
    th = 0.999
    mem = semantic_dup_members(df, cores, threshold=th).collect()
    # brute-force oracle: within-cell cosine pairs -> union-find
    rows = df.orderBy("vec_id").collect()
    X = np.array([list(r.embedding) for r in rows])
    ids = np.array([r.vec_id for r in rows])
    cell = ((X[:, None, :] - cores[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    parent = {int(i): int(i) for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    expected_nodes = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cell[i] == cell[j] and Xn[i] @ Xn[j] >= th:
                expected_nodes |= {int(ids[i]), int(ids[j])}
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    assert {r.vec_id for r in mem} == expected_nodes
    got_comp = {r.vec_id: r.component for r in mem}
    for n in expected_nodes:
        assert got_comp[n] == find(n)


def test_keep_policies(spark, planted):
    df, cores = planted
    th = 0.999
    m_min = semantic_dup_members(df, cores, threshold=th, keep="min_id").collect()
    for r in m_min:
        assert r.is_survivor == (r.vec_id == r.component)
    m_far = semantic_dup_members(df, cores, threshold=th, keep="far_from_centroid")
    rows = m_far.collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        surv = [r for r in members if r.is_survivor]
        assert len(surv) == 1
        # the survivor is the member FARTHEST from its centroid
        want = min(members, key=lambda r: (r.cent_sim, r.vec_id))
        assert surv[0].vec_id == want.vec_id
    with pytest.raises(ValueError, match="keep"):
        semantic_dup_members(df, cores, threshold=th, keep="bogus")


def test_dedup_conservation_and_passthrough(spark, planted):
    df, cores = planted
    th = 0.999
    kept = semantic_dedup(df, cores, threshold=th)
    mem = semantic_dup_members(df, cores, threshold=th)
    n_dropped = mem.filter("not is_survivor").count()
    assert kept.count() == df.count() - n_dropped
    assert kept.columns == df.columns
    # every dup group contributes exactly one survivor; non-dup rows untouched
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    all_ids = {r.vec_id for r in df.select("vec_id").collect()}
    dup_ids = {r.vec_id for r in mem.collect()}
    assert (all_ids - dup_ids) <= kept_ids
    for r in mem.collect():
        assert (r.vec_id in kept_ids) == r.is_survivor


def test_partitioning_independent(spark, planted):
    df, cores = planted
    a = sorted(r.vec_id for r in semantic_dedup(df, cores, threshold=0.999).collect())
    b = sorted(
        r.vec_id
        for r in semantic_dedup(df.repartition(7), cores, threshold=0.999).collect()
    )
    assert a == b


def test_fit_centroids_and_int_shorthand(spark, planted):
    df, _ = planted
    C = fit_centroids(df, 3)
    assert C.shape == (3, DIM)
    # int shorthand fits internally and produces a valid dedup
    out = semantic_dedup(df, 3, threshold=0.999)
    assert 0 < out.count() <= df.count()


def test_runs_on_real_embeddings(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    C = fit_centroids(emb, 8)
    kept = semantic_dedup(emb, C, threshold=0.95)
    assert 0 < kept.count() <= emb.count()
