"""As-of-generation snapshot reads (training reproducibility): pin
``store.current_gen()`` when a run starts and ``read(as_of_gen=...)``
reconstructs exactly the corpus that run saw through later appends,
deletes, and upserts — until a compact() truncates history (VACUUM
semantics), which is pinned here too. The reference has no delete, let
alone time travel (coordinator_server.py: add/search/stats only); this
is the reproducibility surface a training-data store needs."""

import pytest
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.sources.ivf_store import IVFStore
from distributedvectordatabase_spark.sources.tables import load_table
from distributedvectordatabase_spark.sources.vector_store import VectorStore
from tests.conftest import SF_SMALL


def _ids(df):
    return {r.vec_id for r in df.select("vec_id").collect()}


def _mutation_history(spark, store, emb, append_fn):
    """Shared scenario: initial write → append → delete → upsert, a
    pinned snapshot gen at each step; returns the pinned gens plus the
    expected id set at each."""
    g1 = store.current_gen()
    append_fn(emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 500)))
    g2 = store.current_gen()
    store.delete(spark, [0, 300])
    g3 = store.current_gen()
    # upsert relocates id 1 to a new embedding (delete-gen + append-gen)
    new_vec = [9.0] * 64
    store.upsert(
        spark.createDataFrame(
            [(1, new_vec)], schema="vec_id long, embedding array<float>"
        )
    )
    want = {
        g1: set(range(300)),
        g2: set(range(500)),
        g3: set(range(500)) - {0, 300},
    }
    return g1, g2, g3, want


@pytest.mark.parametrize("kind", ["vector", "ivf"])
def test_snapshot_reads_reconstruct_history(spark, tmp_path, kind):
    emb = load_table(spark, "embeddings", SF_SMALL).select("vec_id", "embedding")
    if kind == "vector":
        store = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64))
        store.write(emb.filter(F.col("vec_id") < 300))
        append_fn = store.append
    else:
        store = IVFStore(str(tmp_path / "ivf"), n_cells=8)
        store.build(emb.filter(F.col("vec_id") < 300))
        append_fn = store.append

    g1, g2, g3, want = _mutation_history(spark, store, emb, append_fn)

    # every pinned snapshot reconstructs its historical id set — even
    # though later ops (delete, upsert) have since landed
    for g, ids in want.items():
        assert _ids(store.read(spark, as_of_gen=g)) == ids, g
    # the pre-delete snapshot still contains the later-deleted rows
    assert {0, 300} <= _ids(store.read(spark, as_of_gen=g2))
    # snapshot at the current gen == the live read
    now = store.current_gen()
    assert _ids(store.read(spark, as_of_gen=now)) == _ids(store.read(spark))
    # the pre-upsert snapshot sees id 1's ORIGINAL embedding; live sees
    # the replacement
    old_emb = {
        r.vec_id: list(r.embedding)
        for r in emb.filter("vec_id = 1").collect()
    }[1]
    snap_emb = [
        list(r.embedding)
        for r in store.read(spark, as_of_gen=g3).filter("vec_id = 1").collect()
    ]
    live_emb = [
        list(r.embedding)
        for r in store.read(spark).filter("vec_id = 1").collect()
    ]
    assert snap_emb == [[pytest.approx(v) for v in old_emb]]
    assert live_emb == [[pytest.approx(9.0)] * 64]
    # gen 0 predates the first write: empty corpus
    assert store.read(spark, as_of_gen=0).count() == 0


def test_compact_truncates_snapshot_history(spark, tmp_path):
    """compact() folds tombstones physically (VACUUM semantics): a
    snapshot older than the compaction no longer resurrects dead rows —
    surviving rows keep their original _gen, so post-compact snapshots
    of the surviving set stay exact."""
    emb = load_table(spark, "embeddings", SF_SMALL).select("vec_id", "embedding")
    store = IVFStore(str(tmp_path / "ivf"), n_cells=8)
    store.build(emb.filter(F.col("vec_id") < 300))
    append_fn = store.append
    g1, g2, g3, _ = _mutation_history(spark, store, emb, append_fn)

    store.compact(spark)
    # dead rows (0, 300) and id 1's original version were dropped by
    # the rewrite, so the g2 snapshot now shows the SURVIVORS written
    # at gen <= g2 — not the historical full set
    assert _ids(store.read(spark, as_of_gen=g2)) == set(range(500)) - {0, 300, 1}
    # snapshots at or after the compacted state remain exact
    now = store.current_gen()
    assert _ids(store.read(spark, as_of_gen=now)) == _ids(store.read(spark))


def test_text_index_snapshot_bm25_equals_fresh_build(spark, tmp_path):
    """r7 (VERDICT r6 #4): BM25 at a pinned generation is byte-identical
    to a fresh build over that historical corpus — postings, document
    frequencies, AND the n_docs/avgdl stats all resolve as-of (the
    live-stats sidecar is gen-current only, so the snapshot recounts
    from the as-of doclens)."""
    from distributedvectordatabase_spark.sources.text_index import TextIndex

    docs = load_table(spark, "documents", SF_SMALL)
    d1 = docs.filter(F.col("doc_id") % 3 == 0)
    d2 = docs.filter(F.col("doc_id") % 3 == 1)
    terms = ["dup", "vector", "query"]

    ix = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    ix.build(d1)
    g1 = ix.current_gen()
    ix.append(d2)
    g2 = ix.current_gen()
    victims = [int(r.doc_id) for r in d1.limit(5).collect()]
    ix.delete(spark, victims)
    g3 = ix.current_gen()

    def scores(index, **kw):
        return [
            (r.doc_id, r.score, r.rnk)
            for r in index.bm25(spark, terms, k=10, **kw).collect()
        ]

    f1 = TextIndex(str(tmp_path / "f1"), n_buckets=8)
    f1.build(d1)
    f2 = TextIndex(str(tmp_path / "f2"), n_buckets=8)
    f2.build(d1.union(d2))
    f3 = TextIndex(str(tmp_path / "f3"), n_buckets=8)
    f3.build(d1.union(d2).filter(~F.col("doc_id").isin(victims)))

    assert scores(ix, as_of_gen=g1) == scores(f1)
    assert scores(ix, as_of_gen=g2) == scores(f2)
    assert scores(ix, as_of_gen=g3) == scores(f3)
    # snapshot at the current gen == the live serve
    assert scores(ix, as_of_gen=ix.current_gen()) == scores(ix)
    # batch form honors the same pin
    q = spark.createDataFrame([(7, terms)], "qid long, terms array<string>")
    batch_snap = [
        (r.doc_id, r.score, r.rnk)
        for r in ix.bm25_batch(spark, q, k=10, as_of_gen=g1).collect()
    ]
    assert batch_snap == scores(f1)


def test_sig_store_snapshot_join_equals_fresh_build(spark, tmp_path):
    """join_batch at a pinned generation collides against exactly the
    historical corpus — equal to a fresh build of it."""
    from distributedvectordatabase_spark.sources.sig_store import SigStore

    docs = load_table(spark, "documents", SF_SMALL)
    c1 = docs.filter(F.col("doc_id") % 5 == 1)
    c2 = docs.filter(F.col("doc_id") % 5 == 2)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    sig = SigStore(str(tmp_path / "sig"), bands=4, rows=3, shingle_n=3)
    sig.build(c1)
    g1 = sig.current_gen()
    sig.append(c2)
    g2 = sig.current_gen()
    victims = [int(r.doc_id) for r in c1.limit(10).collect()]
    sig.delete(spark, victims)
    g3 = sig.current_gen()

    def hits(store, **kw):
        return sorted(
            (r.new_id, r.corpus_id, r.jaccard)
            for r in store.join_batch(batch, threshold=0.5, **kw).collect()
        )

    f1 = SigStore(str(tmp_path / "f1"), bands=4, rows=3, shingle_n=3)
    f1.build(c1)
    f2 = SigStore(str(tmp_path / "f2"), bands=4, rows=3, shingle_n=3)
    f2.build(c1.union(c2))
    f3 = SigStore(str(tmp_path / "f3"), bands=4, rows=3, shingle_n=3)
    f3.build(c1.union(c2).filter(~F.col("doc_id").isin(victims)))

    assert hits(sig, as_of_gen=g1) == hits(f1)
    assert hits(sig, as_of_gen=g2) == hits(f2)
    assert hits(sig, as_of_gen=g3) == hits(f3)
    assert hits(sig, as_of_gen=sig.current_gen()) == hits(sig)


def test_hybrid_serve_at_pinned_gens_equals_fresh_builds(spark, tmp_path):
    """hybrid_serve_batch(store_as_of=, index_as_of=) == serving over
    fresh builds of the historical corpora (each store pins its own
    gen counter)."""
    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
    )
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    docs = load_table(spark, "documents", SF_SMALL)
    emb = load_table(spark, "embeddings", SF_SMALL).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    d1 = docs.filter(F.col("doc_id") < 300)
    d2 = docs.filter(F.col("doc_id") >= 300)
    e1 = emb.filter(F.col("doc_id") < 300)
    e2 = emb.filter(F.col("doc_id") >= 300)

    store = VectorStore(str(tmp_path / "vs"), SignLSH(dim=64, seed=5),
                        id_col="doc_id")
    store.write(e1)
    ix = TextIndex(str(tmp_path / "ix"), n_buckets=8)
    ix.build(d1)
    sg, ig = store.current_gen(), ix.current_gen()
    store.append(e2)
    ix.append(d2)

    qvec = [float(x) for x in emb.filter("doc_id = 42").first().embedding]
    queries = spark.createDataFrame(
        [(0, qvec, ["dup", "vector", "query"])],
        "qid long, qvec array<double>, terms array<string>",
    )

    snap = sorted(
        (r.qid, r.doc_id, r.rrf_score, r.rnk)
        for r in hybrid_serve_batch(
            spark, store, ix, queries, k=8,
            store_as_of=sg, index_as_of=ig,
        ).collect()
    )
    fresh_store = VectorStore(str(tmp_path / "fvs"), SignLSH(dim=64, seed=5),
                              id_col="doc_id")
    fresh_store.write(e1)
    fresh_ix = TextIndex(str(tmp_path / "fix"), n_buckets=8)
    fresh_ix.build(d1)
    want = sorted(
        (r.qid, r.doc_id, r.rrf_score, r.rnk)
        for r in hybrid_serve_batch(
            spark, fresh_store, fresh_ix, queries, k=8,
        ).collect()
    )
    assert snap == want

    # r9: snapshot serving now reaches the compressed leg — codes rows
    # carry _gen, so a snapshot AT OR AFTER the sidecar build serves
    # (identical to the live compressed serve when pinned at head)...
    store.build_sq(spark)
    g_head = store.current_gen()
    live_sq = sorted(
        (r.qid, r.doc_id, r.rrf_score, r.rnk)
        for r in hybrid_serve_batch(
            spark, store, ix, queries, k=8, use_sq=True, sq_rerank=4,
        ).collect()
    )
    snap_sq = sorted(
        (r.qid, r.doc_id, r.rrf_score, r.rnk)
        for r in hybrid_serve_batch(
            spark, store, ix, queries, k=8, use_sq=True, sq_rerank=4,
            store_as_of=g_head, index_as_of=ix.current_gen(),
        ).collect()
    )
    assert snap_sq == live_sq
    # ...while a snapshot OLDER than the build floor raises: rows
    # deleted before the build are physically absent from the codes
    import pytest as _pytest

    with _pytest.raises(ValueError, match="built"):
        hybrid_serve_batch(
            spark, store, ix, queries, k=8, use_sq=True, store_as_of=sg
        )
