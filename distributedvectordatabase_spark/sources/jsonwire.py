"""Reference JSON wire-format source (SURVEY §1.1 "JSON wire format").

The reference moves vectors over HTTP as JSON payloads:

- insert: ``{"vectors": [[...], ...], "ids": [...]?}``
  (shard/shard_server.py:29-43; fixture /root/reference/test_vectors.json)
- query:  ``{"query_vector": [...], "k": int}``
  (shard/shard_server.py:71-93; fixture /root/reference/test_query.json)

Spark-first re-expression: each payload file is ONE json document, so
``spark.read.json(multiLine=true)`` with an explicit schema yields one
row per payload, and ``posexplode(vectors)`` fans it into (vec_id,
embedding) rows — fully declarative, no driver-side parsing, scales to
directories of payload files. Dim enforcement mirrors the reference's
insert-time ValueError (shard/shard_node.py:72-74); auto-ID assignment
mirrors its per-shard sequential ``next_id`` (shard/shard_node.py:77-80)
— including, deliberately, its documented collision caveat across
independent payloads, which is why auto-IDs are only allowed for a
single payload file here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INSERT_WIRE_SCHEMA = "vectors array<array<float>>, ids array<bigint>"
QUERY_WIRE_SCHEMA = "query_vector array<float>, k int"


def read_insert_payloads(
    spark: SparkSession,
    path: str,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Read insert-wire JSON payload file(s) into a (id, vector) frame.

    ``path`` may be a single payload file or a directory/glob of them.
    When a payload carries no ``ids``, positions within the payload are
    used (the reference's sequential auto-ID) — allowed only when the
    input is a single payload, because independent payloads would
    collide exactly like the reference's per-shard ``next_id`` does.
    ``dim`` enforces the fixed vector dimension at read time (reference
    rejects mismatches with ValueError at insert).
    """
    payloads = spark.read.schema(INSERT_WIRE_SCHEMA).option("multiLine", "true").json(
        path
    )
    # explicit ids must cover every vector — checked BEFORE the explode
    # job so the failure is this ValueError, not an ANSI
    # INVALID_ARRAY_INDEX from element_at mid-job (and never the
    # ANSI-off silent fallback to positional ids, which could collide
    # with explicit ones)
    bad_len = payloads.filter(
        F.col("ids").isNotNull() & (F.size("ids") != F.size("vectors"))
    ).count()
    if bad_len:
        raise ValueError(
            f"{bad_len} payload(s) supply 'ids' with a different length "
            "than 'vectors' (reference semantics: ids, when given, are "
            "parallel to vectors — shard/shard_server.py:29-43)"
        )
    rows = payloads.select(
        F.input_file_name().alias("_src"),
        F.posexplode("vectors").alias("_pos", vec_col),
        F.col("ids"),
    ).select(
        "_src",
        "_pos",
        vec_col,
        F.coalesce(
            F.try_element_at("ids", F.col("_pos") + 1), F.col("_pos").cast("long")
        ).alias(id_col),
        F.col("ids").isNull().alias("_auto"),
    )

    # guardrails are tiny aggregates over payload metadata, not the vectors
    meta = rows.groupBy().agg(
        F.countDistinct(F.when(F.col("_auto"), F.col("_src"))).alias("auto_files"),
        F.countDistinct("_src").alias("n_files"),
        F.sum(
            F.when(F.size(vec_col) != F.lit(dim), 1).otherwise(0)
            if dim is not None
            else F.lit(0)
        ).alias("bad_dim"),
    ).first()
    if dim is not None and meta["bad_dim"]:
        raise ValueError(
            f"{meta['bad_dim']} vectors do not match dimension {dim} "
            "(reference semantics: shard_node.py:72-74 rejects the insert)"
        )
    if meta["auto_files"] and meta["n_files"] > 1:
        raise ValueError(
            "auto-generated ids are positions within a payload and would "
            "collide across the multiple payload files read here — supply "
            "'ids' in each payload (the reference has the same latent "
            "collision, shard_node.py:77-80 / SURVEY §1.1; we refuse it)"
        )
    return rows.select(id_col, vec_col)


def read_query_payload(
    spark: SparkSession,
    path: str,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Read query-wire JSON file(s) into a (qid, qvec, k) queries frame.

    qid is the payload's position in filename order (the wire format
    has no query id; the reference handles one query per request).
    """
    payloads = (
        spark.read.schema(QUERY_WIRE_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .select(F.input_file_name().alias("_src"), "query_vector", "k")
    )
    from pyspark.sql import Window

    w = Window.orderBy("_src")
    return payloads.select(
        (F.row_number().over(w) - 1).cast("long").alias(qid_col),
        F.col("query_vector").alias(qvec_col),
        "k",
    )
