"""Reference YAML config model → engine objects (SURVEY §1.1 "Config
model").

The reference configures the system with two YAML files:

- coordinator: ``nodes, sharding_strategy, replication_factor,
  query_timeout, consistency_mode, lsh_config{num_hash_functions,
  num_hash_tables, input_dim}`` (coordinator/coordinator.py:33-38,
  config/coordinator.yaml:1-19)
- shard node: ``storage_path, index_type, index_params{space, M,
  ef_construction, ef_search}, monitoring`` (config/shard_node.yaml:1-11,
  shard/shard_node.py:28-29)

A user of the reference can point this module at the same YAML and get
the equivalent Spark-engine objects: ``lsh_config`` → :class:`SignLSH`
(the sharding function), ``storage_path`` → :class:`VectorStore`
(the bucketed parquet store). Keys with no Spark analogue (nodes,
timeouts, consistency/availability flags — Spark's scheduler owns
placement and retry) are preserved on the dataclass for inspection but
drive nothing, and ``index_type: HNSW`` / ``space: cosine`` get the
same treatment the reference gives them: *ignored*. The reference
declares HNSW/cosine in config but unconditionally builds exact
FlatL2 (shard/shard_node.py:44-48); we surface that mismatch with a
warning instead of silently honoring a config key the engine never
honored.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from distributedvectordatabase_spark.functions.lsh import SignLSH


@dataclass
class EngineConfig:
    """Parsed union of the reference's coordinator + shard configs."""

    lsh: SignLSH
    storage_path: str | None = None
    metric: str = "l2sq"  # effective reference semantics: exact squared-L2
    declared_index_type: str | None = None
    declared_space: str | None = None
    extras: dict = field(default_factory=dict)

    def vector_store(self, path: str | None = None):
        from distributedvectordatabase_spark.sources.vector_store import VectorStore

        p = path or self.storage_path
        if not p:
            raise ValueError("no storage_path in config and none given")
        return VectorStore(p, self.lsh)


def from_yaml(*paths: str) -> EngineConfig:
    """Build an :class:`EngineConfig` from reference-format YAML file(s)
    — typically the coordinator config, the shard config, or both
    (later files win on key conflicts)."""
    import yaml

    merged: dict = {}
    for p in paths:
        with open(p) as f:
            doc = yaml.safe_load(f) or {}
        if not isinstance(doc, dict):
            raise ValueError(f"{p}: expected a YAML mapping at top level")
        merged.update(doc)
    return from_dict(merged)


def from_dict(cfg: dict) -> EngineConfig:
    lsh_cfg = cfg.get("lsh_config") or {}
    lsh = SignLSH(
        dim=int(lsh_cfg.get("input_dim", 512)),
        num_fns=int(lsh_cfg.get("num_hash_functions", 4)),
        num_tables=int(lsh_cfg.get("num_hash_tables", 3)),
    )
    index_type = cfg.get("index_type")
    space = (cfg.get("index_params") or {}).get("space")
    if index_type and str(index_type).upper() != "FLATL2":
        warnings.warn(
            f"config declares index_type={index_type!r} but the effective "
            "search is exact squared-L2, matching the reference, which "
            "declares HNSW yet unconditionally builds FlatL2 "
            "(shard_node.py:44-48); use IVFStore explicitly for ANN",
            stacklevel=2,
        )
    strategy = cfg.get("sharding_strategy", "lsh")
    if strategy != "lsh":
        raise ValueError(
            f"unknown sharding_strategy {strategy!r}: the reference "
            "implements only 'lsh' (coordinator.py:33-38), as do we"
        )
    known = {"lsh_config", "index_type", "index_params", "storage_path", "sharding_strategy"}
    return EngineConfig(
        lsh=lsh,
        storage_path=cfg.get("storage_path"),
        declared_index_type=index_type,
        declared_space=space,
        extras={k: v for k, v in cfg.items() if k not in known},
    )
