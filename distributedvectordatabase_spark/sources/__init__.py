from distributedvectordatabase_spark.sources.export import (
    export_shards,
    read_manifest,
    read_shards,
    verify_export,
)
from distributedvectordatabase_spark.sources.ivf_store import IVFStore
from distributedvectordatabase_spark.sources.jsonwire import (
    read_insert_payloads,
    read_query_payload,
)
from distributedvectordatabase_spark.sources.npz import read_npz, write_npz
from distributedvectordatabase_spark.sources.sig_store import SigStore
from distributedvectordatabase_spark.sources.tables import TABLES, load_table, load_tables
from distributedvectordatabase_spark.sources.text_index import TextIndex
from distributedvectordatabase_spark.sources.tokenizer_store import TokenizerStore
from distributedvectordatabase_spark.sources.vector_store import VectorStore

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_npz",
    "write_npz",
    "read_insert_payloads",
    "read_query_payload",
    "VectorStore",
    "IVFStore",
    "TextIndex",
    "SigStore",
    "TokenizerStore",
    "export_shards",
    "read_manifest",
    "read_shards",
    "verify_export",
]
