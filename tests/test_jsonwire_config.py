"""JSON wire-format source + YAML config model (reference parity:
shard_server.py:29-43/71-93 wire shapes, coordinator.yaml /
shard_node.yaml config keys)."""

import json

import pytest

from distributedvectordatabase_spark import config as engcfg
from distributedvectordatabase_spark.sources.jsonwire import (
    read_insert_payloads,
    read_query_payload,
)


@pytest.fixture()
def wire_dir(tmp_path):
    return tmp_path


def _payload(path, vectors, ids=None):
    doc = {"vectors": vectors}
    if ids is not None:
        doc["ids"] = ids
    path.write_text(json.dumps(doc))


def test_insert_payload_explicit_ids(spark, wire_dir):
    p = wire_dir / "batch0.json"
    _payload(p, [[1.0, 2.0], [3.0, 4.0]], ids=[10, 20])
    df = read_insert_payloads(spark, str(p), dim=2)
    rows = {r.vec_id: list(r.embedding) for r in df.collect()}
    assert rows == {10: [1.0, 2.0], 20: [3.0, 4.0]}


def test_insert_payload_auto_ids_single_file(spark, wire_dir):
    p = wire_dir / "batch0.json"
    _payload(p, [[1.0, 2.0], [3.0, 4.0]])
    df = read_insert_payloads(spark, str(p))
    assert sorted(r.vec_id for r in df.collect()) == [0, 1]


def test_insert_payload_auto_ids_refused_across_files(spark, wire_dir):
    _payload(wire_dir / "a.json", [[1.0, 2.0]])
    _payload(wire_dir / "b.json", [[3.0, 4.0]])
    with pytest.raises(ValueError, match="collide"):
        read_insert_payloads(spark, str(wire_dir))


def test_insert_payload_dim_enforced(spark, wire_dir):
    p = wire_dir / "bad.json"
    _payload(p, [[1.0, 2.0, 3.0]], ids=[1])
    with pytest.raises(ValueError, match="dimension 2"):
        read_insert_payloads(spark, str(p), dim=2)


def test_insert_reads_reference_shaped_fixture_and_feeds_knn(spark, wire_dir):
    """End-to-end: wire payload → store-shaped frame → kNN query from a
    query-wire file, the reference's insert→search round trip."""
    from distributedvectordatabase_spark.operators.knn import knn

    corpus = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [5.0, 5.0]]
    _payload(wire_dir / "ins.json", corpus, ids=[0, 1, 2, 3])
    (wire_dir / "q.json").write_text(json.dumps({"query_vector": [1.0, 0.1], "k": 2}))

    emb = read_insert_payloads(spark, str(wire_dir / "ins.json"), dim=2)
    queries = read_query_payload(spark, str(wire_dir / "q.json"))
    kval = queries.first().k
    hits = knn(emb, queries, k=kval).collect()
    assert [h.neighbor_id for h in hits] == [0, 2]  # nearest then next


def test_query_payload_multiple_files_ordered(spark, wire_dir):
    (wire_dir / "q0.json").write_text(json.dumps({"query_vector": [1.0], "k": 1}))
    (wire_dir / "q1.json").write_text(json.dumps({"query_vector": [2.0], "k": 3}))
    rows = read_query_payload(spark, str(wire_dir)).orderBy("qid").collect()
    assert [r.qid for r in rows] == [0, 1]
    assert [r.k for r in rows] == [1, 3]
    assert [list(r.qvec) for r in rows] == [[1.0], [2.0]]


def test_config_reference_yaml_round_trip(tmp_path):
    (tmp_path / "coordinator.yaml").write_text(
        """
nodes:
  - host: localhost
    port: 6001
sharding_strategy: lsh
replication_factor: 1
lsh_config:
  num_hash_functions: 4
  num_hash_tables: 3
  input_dim: 64
"""
    )
    (tmp_path / "shard_node.yaml").write_text(
        """
index_type: HNSW
index_params:
  space: cosine
storage_path: data/shard_2
"""
    )
    with pytest.warns(UserWarning, match="FlatL2"):
        cfg = engcfg.from_yaml(
            str(tmp_path / "coordinator.yaml"), str(tmp_path / "shard_node.yaml")
        )
    assert (cfg.lsh.dim, cfg.lsh.num_fns, cfg.lsh.num_tables) == (64, 4, 3)
    assert cfg.metric == "l2sq"  # effective reference semantics
    assert cfg.storage_path == "data/shard_2"
    assert cfg.declared_index_type == "HNSW" and cfg.declared_space == "cosine"
    assert cfg.extras["replication_factor"] == 1
    store = cfg.vector_store()
    assert store.path == "data/shard_2" and store.lsh is cfg.lsh


def test_config_rejects_unknown_strategy():
    with pytest.raises(ValueError, match="sharding_strategy"):
        engcfg.from_dict({"sharding_strategy": "range"})


def test_insert_payload_id_length_mismatch_rejected(spark, wire_dir):
    """ids, when present, must be parallel to vectors — a short (or
    long) ids list raises the module's ValueError up front instead of
    an ANSI array-index engine error mid-job (or, on ANSI-off
    deployments, silently assigning colliding positional ids)."""
    p = wire_dir / "bad.json"
    _payload(p, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], ids=[2, 5])
    with pytest.raises(ValueError, match="different length"):
        read_insert_payloads(spark, str(p))
    p2 = wire_dir / "bad2.json"
    _payload(p2, [[1.0, 2.0]], ids=[1, 2, 3])
    with pytest.raises(ValueError, match="different length"):
        read_insert_payloads(spark, str(p2))
