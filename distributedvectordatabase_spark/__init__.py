"""distributedvectordatabase_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system NiharR007/DistributedVectorDatabase
(a coordinator/shard LSH-routed exact-kNN vector engine), extended into a
full analytics surface for large-scale training-data pipelines:

- exact + LSH-pruned vector similarity search (kNN, L2^2 / cosine)
  [reference: shard/shard_node.py:101-133, coordinator/coordinator.py:132-254]
- seeded sign-LSH sharding + multi-probe candidate pruning
  [reference: sharding/lsh_sharding.py]
- bucketed/partitioned Parquet vector store (the "index" is the table)
  [reference: shard/shard_node.py:51-99,135-145]
- shard-distribution statistics [reference: performance_analysis.py:186-237]
- PCA dimensionality reduction [reference: load_coco_embeddings.py:24-36]
- dedup (exact hash, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
- text analysis (tokenization, language-id heuristic, quality scoring,
  fingerprinting), JSON/event analytics, relational star-schema queries
- Structured Streaming ingest into the bucketed store

Design stance: the "coordinator" is the Spark driver, "shards" are
partitions; every operator is declared via the DataFrame/SQL API so
Catalyst provides pushdown, pruning, AQE, and whole-stage codegen.
"""

from distributedvectordatabase_spark.session import get_spark
from distributedvectordatabase_spark.sql import sql

__all__ = ["get_spark", "sql"]
__version__ = "0.1.0"
