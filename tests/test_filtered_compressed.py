"""Filtered + snapshot serving on the compressed legs (r9, VERDICT r8
#2): at 100 TB serving lives on the SQ8/BQ/PQ rungs — falling back to
the raw leg for a metadata filter or a snapshot pin would re-read
4-32x the bytes. Contracts pinned here:

- ``where`` is filter-then-rank: matching ids are read once off the
  raw table (predicate + id pushed) and semi-joined into the codes
  scan BEFORE the shortlist cut, with store-global trained params (the
  ``bm25_batch(allowed_ids=)`` hard-constraint contract). At full
  budget (shortlist covers every matching row) the result EQUALS exact
  filtered kNN.
- ``as_of_gen`` reconstructs codes-as-of via the rows' ``_gen``
  (builds keep it, appends sync it), floored at the sidecar's
  ``built_gen`` (rows deleted before the build are physically absent
  from codes — older snapshots raise with a pointer to the raw leg).
- partition pruning on the codes scan survives the filter semi-join
  (the join sits ABOVE the scan).
- ``hybrid_serve_batch(where=, use_sq=True)`` equals the hand
  composition of the filtered compressed leg + filtered BM25 + RRF.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.operators.knn import knn
from distributedvectordatabase_spark.plans import scan_partition_filters
from distributedvectordatabase_spark.sources.ivf_store import IVFStore
from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture
from distributedvectordatabase_spark.sources.vector_store import VectorStore
from tests.conftest import SF_SMALL

WHERE_VS = "vec_id % 2 = 1"
WHERE_IVF = "label = 3"


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def vs(spark, tmp_path_factory):
    emb = load_table(spark, "embeddings", SF_SMALL)
    s = VectorStore(
        str(tmp_path_factory.mktemp("fcomp_vs") / "vs"), SignLSH(dim=64, seed=3)
    )
    s.write(emb.select("vec_id", "embedding"))
    s.build_sq(spark)
    s.build_bq(spark)
    return s


@pytest.fixture(scope="module")
def ivf(spark, tmp_path_factory):
    emb = load_table(spark, "embeddings", SF_SMALL)
    s = IVFStore(
        str(tmp_path_factory.mktemp("fcomp_ivf") / "ivf"),
        n_cells=4,
        meta_cols=("label",),
    )
    s.build(emb)
    s.build_sq(spark)
    s.build_pq(spark, m=8, nbits=6)
    s.build_bq(spark)
    return s


def test_vs_sq_bq_filtered_equal_exact_at_full_budget(spark, vs):
    """Full budget (unpruned scan, shortlist >= matching count) makes
    the compressed filtered search EXACTLY the filtered kNN — the
    rerank is exact and the shortlist covers every allowed row."""
    q = queries_fixture(spark, SF_SMALL, n=3)
    want = _rows(knn(vs.read(spark).filter(WHERE_VS), q, k=5))
    got_sq = _rows(vs.knn_sq(spark, q, k=5, rerank=10, pruned=False, where=WHERE_VS))
    got_bq = _rows(vs.knn_bq(spark, q, k=5, rerank=20, pruned=False, where=WHERE_VS))
    assert got_sq == want
    assert got_bq == want
    assert all(r[1] % 2 == 1 for r in got_sq)  # hard constraint


def test_vs_sq_filtered_is_filter_then_rank(spark, vs):
    """The where leg is the semi-join form of filtering the codes scan
    itself: identical rows to running the same compressed rank over
    pre-filtered codes with the SAME trained bounds (a filter narrows
    candidates; it never retrains the quantizer)."""
    from distributedvectordatabase_spark.operators.sq import sq_search

    q = queries_fixture(spark, SF_SMALL, n=3)
    got = _rows(vs.knn_sq(spark, q, k=5, rerank=0, pruned=False, where=WHERE_VS))
    want = _rows(
        sq_search(
            vs._sq_codes(spark).filter(WHERE_VS),
            vs.sq_params(), q, k=5, id_col=vs.id_col,
        )
    )
    assert got == want and got


def test_vs_compressed_filtered_keeps_partition_pruning(spark, vs):
    """The allowed-ids semi-join sits ABOVE the codes scan: the LSH
    shard IN-list must still reach the _sq/_bq scans as partition
    filters."""
    q = queries_fixture(spark, SF_SMALL, n=3)
    for df in (
        vs.knn_sq(spark, q, k=5, pruned=True, where=WHERE_VS),
        vs.knn_bq(spark, q, k=5, pruned=True, where=WHERE_VS),
    ):
        pf = scan_partition_filters(df)
        assert any("shard_id" in f for f in pf), pf


def test_ivf_compressed_filtered_equal_exact_at_full_probe(spark, ivf):
    """Full probe + full rerank budget == exact filtered kNN for all
    three IVF compressed rungs; every hit satisfies the metadata
    predicate (meta co-located by build(meta_cols=...))."""
    q = queries_fixture(spark, SF_SMALL, n=3)
    want = _rows(
        knn(
            ivf.read(spark).filter(WHERE_IVF).select("vec_id", "embedding"),
            q, k=5,
        )
    )
    got_sq = _rows(ivf.knn_sq(spark, q, k=5, n_probe=4, rerank=20, where=WHERE_IVF))
    got_pq = _rows(ivf.knn_pq(spark, q, k=5, n_probe=4, rerank=20, where=WHERE_IVF))
    got_bq = _rows(
        ivf.knn_bq(spark, q, k=5, n_probe=4, rerank=20, where=WHERE_IVF,
                   metric="l2sq")
    )
    assert got_sq == want
    assert got_pq == want
    assert got_bq == want
    hit_ids = [r[1] for r in got_sq]
    labels = {
        r.label
        for r in load_table(spark, "embeddings", SF_SMALL)
        .filter(F.col("vec_id").isin(hit_ids))
        .collect()
    }
    assert labels == {3}


def test_ivf_compressed_filtered_keeps_cell_pruning(spark, ivf):
    q = queries_fixture(spark, SF_SMALL, n=3)
    for df in (
        ivf.knn_sq(spark, q, k=5, n_probe=2, where=WHERE_IVF),
        ivf.knn_pq(spark, q, k=5, n_probe=2, where=WHERE_IVF),
        ivf.knn_bq(spark, q, k=5, n_probe=2, where=WHERE_IVF),
    ):
        pf = scan_partition_filters(df)
        assert any("cell_id" in f for f in pf), pf


def test_ivf_compressed_filtered_probed_subset(spark, ivf):
    """At a reduced probe budget the compressed filtered result is a
    subset of the allowed corpus (hard constraint), with the documented
    non-escalation caveat: under-k rows are legal when the filter
    starves the probed cells."""
    q = queries_fixture(spark, SF_SMALL, n=3)
    got = ivf.knn_sq(spark, q, k=5, n_probe=1, rerank=4, where=WHERE_IVF).collect()
    allowed = {
        r.vec_id for r in ivf.read(spark).filter(WHERE_IVF).select("vec_id").collect()
    }
    assert all(r.neighbor_id in allowed for r in got)


def test_vs_sq_snapshot_matches_exact_historical(spark, tmp_path):
    """as_of_gen on the SQ leg: append after the build (codes sync
    inline, per-row _gen), then a snapshot pinned before the append
    equals exact kNN over the historical corpus — no post-pin row
    leaks; composes with where."""
    emb = load_table(spark, "embeddings", SF_SMALL)
    s = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64, seed=3))
    s.write(emb.select("vec_id", "embedding"))
    s.build_sq(spark)
    g1 = s.current_gen()
    s.append(emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding"))
    q = queries_fixture(spark, SF_SMALL, n=3)
    snap = _rows(s.knn_sq(spark, q, k=5, rerank=10, pruned=False, as_of_gen=g1))
    want = _rows(knn(s.read(spark, as_of_gen=g1), q, k=5))
    assert snap == want
    assert all(r[1] < 1000 for r in snap)
    # where composes with the pin
    snap_f = _rows(
        s.knn_sq(spark, q, k=5, rerank=10, pruned=False,
                 as_of_gen=g1, where=WHERE_VS)
    )
    want_f = _rows(knn(s.read(spark, as_of_gen=g1).filter(WHERE_VS), q, k=5))
    assert snap_f == want_f


def test_vs_bq_snapshot_serves_while_live_is_stale(spark, tmp_path):
    """The rebuild-don't-sync BQ sidecar after an append: the LIVE read
    correctly refuses (stale codes), but a snapshot pinned at the
    sidecar's synced gen still serves — the codes ARE complete through
    that gen."""
    emb = load_table(spark, "embeddings", SF_SMALL)
    s = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64, seed=3))
    s.write(emb.select("vec_id", "embedding"))
    s.build_bq(spark)
    g1 = s.current_gen()
    s.append(emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding"))
    q = queries_fixture(spark, SF_SMALL, n=3)
    with pytest.raises(ValueError, match="stale"):
        s.knn_bq(spark, q, k=5)
    snap = _rows(s.knn_bq(spark, q, k=5, rerank=20, pruned=False, as_of_gen=g1))
    want = _rows(knn(s.read(spark, as_of_gen=g1), q, k=5))
    assert snap == want
    # and a snapshot BEYOND the synced horizon refuses
    with pytest.raises(ValueError, match="synced through"):
        s.knn_bq(spark, q, k=5, as_of_gen=s.current_gen())


def test_compressed_snapshot_floor_raises_below_built_gen(spark, tmp_path):
    """Rows deleted before a (re)build never reached the codes table,
    so a snapshot older than built_gen must raise — on both store
    kinds — instead of silently serving an incomplete corpus."""
    emb = load_table(spark, "embeddings", SF_SMALL)
    q = queries_fixture(spark, SF_SMALL, n=3)

    s = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64, seed=3))
    s.write(emb.select("vec_id", "embedding"))
    g1 = s.current_gen()
    s.delete(spark, [5, 7])
    s.build_sq(spark)  # built_gen > g1; rows 5,7 absent from codes
    with pytest.raises(ValueError, match="built"):
        s.knn_sq(spark, q, k=5, as_of_gen=g1)
    # at or after the floor: serves, and the snapshot excludes the dead
    g2 = s.current_gen()
    snap = _rows(s.knn_sq(spark, q, k=5, rerank=10, pruned=False, as_of_gen=g2))
    assert snap == _rows(knn(s.read(spark, as_of_gen=g2), q, k=5))

    ivf = IVFStore(str(tmp_path / "ivf"), n_cells=4)
    ivf.build(emb.select("vec_id", "embedding"))
    g1 = ivf.current_gen()
    ivf.delete(spark, [5, 7])
    ivf.build_sq(spark)
    with pytest.raises(ValueError, match="built"):
        ivf.knn_sq(spark, q, k=5, as_of_gen=g1)


def test_hybrid_serve_filtered_compressed_matches_hand_composition(
    spark, tmp_path
):
    """hybrid_serve_batch(where=, use_sq=True) — the r9 serving shape —
    equals composing the filtered SQ leg + bm25_batch(allowed_ids=) +
    rrf_fuse by hand."""
    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
        rrf_fuse,
    )
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from pyspark.sql import Window

    docs = load_table(spark, "documents", SF_SMALL)
    emb = load_table(spark, "embeddings", SF_SMALL).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    store = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64, seed=5),
                        id_col="doc_id")
    store.write(emb)
    store.build_sq(spark)
    ix = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    ix.build(docs)

    qvec = [float(x) for x in emb.filter("doc_id = 42").first().embedding]
    queries = spark.createDataFrame(
        [(0, qvec, ["dup", "vector", "query"])],
        "qid long, qvec array<double>, terms array<string>",
    )
    where = "doc_id % 2 = 1"
    fetch = 16
    got = _rows(
        hybrid_serve_batch(
            spark, store, ix, queries, k=8, fetch_k=fetch,
            use_sq=True, sq_rerank=4, where=where,
        )
    )

    qv = queries.select("qid", "qvec")
    hits = store.knn_sq(spark, qv, k=fetch, rerank=4, pruned=False, where=where)
    vec_leg = hits.select(
        "qid", F.col("neighbor_id").alias("doc_id"),
        F.row_number().over(
            Window.partitionBy("qid").orderBy("dist", "neighbor_id")
        ).alias("rnk"),
    )
    allowed = store.read(spark).filter(where).select(
        F.col("doc_id").alias("doc_id")
    )
    text_leg = ix.bm25_batch(
        spark, queries.select("qid", "terms"), k=fetch, allowed_ids=allowed
    ).select("qid", "doc_id", "rnk")
    want = _rows(rrf_fuse(vec_leg, text_leg, k=8, id_col="doc_id", by=["qid"]))
    assert got == want and got
    assert all(r[1] % 2 == 1 for r in got)
