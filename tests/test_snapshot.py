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
