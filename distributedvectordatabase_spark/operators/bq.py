"""Binary quantization (BQ) — 1-bit-per-dimension vector compression
with Hamming-distance search + exact rerank.

The rung *below* SQ8 on the compression ladder (binary 1 bit/dim →
SQ8 1 byte/dim → PQ sub-byte codebooks): each dimension keeps only its
sign, so a 64-D float64 embedding collapses from 512 bytes to 8 — a
64× scan-byte cut. The classic recipe (Charikar 2002 sign projections
applied identity-first; FAISS ``IndexBinaryFlat`` + refine): Hamming
distance between sign patterns is a monotone estimator of angular
distance, so a Hamming shortlist + exact-distance rerank recovers high
recall at a fraction of the IO. At 100 TB this is the cheapest
possible first-pass scan — the corpus never leaves packed-integer form
until the shortlist joinback.

The reference ships raw FlatL2 only (shard/shard_node.py:42-49); this
module is scale-path depth beyond it, mirroring the SQ8/PQ designs.

Spark-first — everything is Catalyst integer arithmetic, no Python in
the hot path, no join node in the scoring stage:

- **encode** — one scan, no shuffle: 32 sign bits OR-folded into each
  bigint word (32, not 64, because DuckDB's checked ``<<`` refuses to
  set a bigint's sign bit, and oracle parity matters more than halving
  an already-tiny code column). The OR chain is one codegen-fused
  projection.
- **search** — the bounded query batch is collected driver-side (the
  exact-kNN pattern, knn.py:61-79) and fanned out as a LITERAL array
  explode against ONE corpus scan — q rows per corpus row, no join
  operator at all (the plan sweep forbids cartesian/BNLJ).
  ``hamming = Σ_w bit_count(q_w XOR e_w)``; top-k in two phases: a
  per-input-partition ``row_number`` prefilter keeps k rows per
  (query, partition), so the merge exchange carries
  O(queries · k · partitions) rows — never the corpus.
- **rerank** — the R·k Hamming shortlist (tiny by construction) is
  broadcast back onto the corpus by id for exact squared-L2 rescoring;
  the shortlist scan itself reads only packed codes.

Hamming distances are INTEGERS, so unlike every float-distance gate
there is no quantization step and no cross-engine ulp risk: the
catalog's ``knn_hamming`` gate hash-compares bit-for-bit by nature.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributedvectordatabase_spark.operators.knn import _dist_expr, collect_query_batch

BITS_PER_WORD = 32


def n_words(dim: int) -> int:
    return (int(dim) + BITS_PER_WORD - 1) // BITS_PER_WORD


def _pack_word(vec_col: str, w: int, dim: int) -> Column:
    """One packed word: OR of ``1 << j`` over the word's positive dims
    (element_at is 1-based; dims past ``dim`` in the last word stay 0)."""
    bits = []
    for j in range(BITS_PER_WORD):
        i = w * BITS_PER_WORD + j
        if i >= dim:
            break
        bits.append(
            F.when(
                F.element_at(F.col(vec_col), i + 1) > F.lit(0.0),
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return reduce(lambda a, b: a.bitwiseOR(b), bits)


def bq_encode(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    out_col: str = "bq_code",
    n_bits: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Append ``out_col: array<bigint>`` — the sign-bit pack of
    ``vec_col`` (ceil(bits/32) words, 32 bits each). No shuffle either
    way.

    ``n_bits=None`` (default) packs the RAW dimension signs — a pure
    Catalyst projection, codegen-fused, and exactly reproducible in
    the DuckDB oracle (the ``knn_hamming`` gate).

    ``n_bits=B`` packs the signs of B seeded gaussian projections
    instead (sign-random-projection / SimHash for vectors, Charikar
    2002) — the scale path: identity signs give only dim+1 Hamming
    levels, so at 500k×64-D the shortlist drowns in ties (recall 0.16,
    BASELINE.md), while B=256 decouples code length from dim. Runs as
    an Arrow ``pandas_udf`` matmul — B·dim literal expressions would
    blow past janino's method limit (the 512-D identity pack already
    trips the codegen fallback), and one BLAS GEMM per batch is the
    faster shape anyway. ``np.random.default_rng(seed)`` streams are
    stable across platforms, so codes are deterministic."""
    if n_bits is None:
        words = F.array(*[_pack_word(vec_col, w, dim) for w in range(n_words(dim))])
        return df.withColumn(out_col, words)

    B = int(n_bits)
    if B % BITS_PER_WORD:
        raise ValueError(f"n_bits must be a multiple of {BITS_PER_WORD}")
    R = np.random.default_rng(int(seed)).standard_normal((int(dim), B))
    weights = (np.int64(1) << np.arange(BITS_PER_WORD, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _pack(vs: pd.Series) -> pd.Series:
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        S = (X @ R) > 0
        codes = np.empty((len(X), B // BITS_PER_WORD), dtype=np.int64)
        for w in range(B // BITS_PER_WORD):
            codes[:, w] = S[:, w * BITS_PER_WORD:(w + 1) * BITS_PER_WORD] @ weights
        return pd.Series(list(codes))

    return df.withColumn(out_col, _pack(F.col(vec_col)))


def _hamming(qcode: str, code: str, words: int) -> Column:
    terms = [
        F.bit_count(
            F.element_at(F.col(qcode), w + 1).bitwiseXOR(
                F.element_at(F.col(code), w + 1)
            )
        ).cast("long")
        for w in range(words)
    ]
    return reduce(lambda x, y: x + y, terms)


def bq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "bq_code",
    qid_col: str = "qid",
    qcode_col: str = "qcode",
    shard_map: dict | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Hamming top-k of every query code against the corpus codes.

    Returns (qid, neighbor_id, hamming, rnk), rnk 1..k ordered by
    (hamming, neighbor_id) — a total order, so the result is exactly
    reproducible, and integer-only: no float ever enters the plan.

    The query side is collected under the exact-kNN batch cap and
    fanned out as a literal-array explode, so the scoring stage is one
    corpus scan with zero join operators; the partial-then-final
    window pair keeps the merge exchange at O(q·k·partitions) rows.

    ``shard_map`` (qid → iterable of candidate shard ids) restricts
    each query to its own shards: the allowed set rides the literal
    struct and an ``array_contains(_q.shards, shard_col)`` filter drops
    foreign (query, row) pairs right after the fan-out — the
    VectorStore's per-query LSH masking, still join-free. Callers
    should ALSO pre-filter the corpus to the union of all shards so
    Catalyst prunes partitions."""
    k = max(int(k), 1)
    qrows = collect_query_batch(queries, qid_col, qcode_col)
    if not qrows:
        raise ValueError("bq_topk requires at least one query")
    words = len(qrows[0][1])

    def _struct(r):
        fields = [
            F.lit(int(r[0])).cast("long").alias("qid"),
            F.array(*[F.lit(int(wd)).cast("long") for wd in r[1]]).alias("qcode"),
        ]
        if shard_map is not None:
            fields.append(
                F.array(
                    *[F.lit(int(s)).cast("long") for s in sorted(shard_map[int(r[0])])]
                ).alias("shards")
            )
        return F.struct(*fields)

    qlit = F.array(*[_struct(r) for r in qrows])
    base_cols = [
        F.col(id_col).alias("neighbor_id"),
        F.col(code_col),
        F.spark_partition_id().alias("_part"),
        F.explode(qlit).alias("_q"),
    ]
    if shard_map is not None:
        base_cols.insert(2, F.col(shard_col).cast("long").alias("_shard"))
    fanned = corpus.select(*base_cols)
    if shard_map is not None:
        fanned = fanned.filter(F.array_contains(F.col("_q.shards"), F.col("_shard")))
    scored = fanned.select(
        F.col("_q.qid").alias("qid"),
        "neighbor_id",
        _hamming("_q.qcode", code_col, words).alias("hamming"),
        "_part",
    )
    pre = Window.partitionBy("qid", "_part").orderBy("hamming", "neighbor_id")
    fin = Window.partitionBy("qid").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= k)
        .withColumn("rnk", F.row_number().over(fin))
        .filter(F.col("rnk") <= k)
        .select("qid", "neighbor_id", "hamming", "rnk")
    )


def bq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    n_bits: int | None = None,
    seed: int = 42,
    metric: str = "l2sq",
) -> DataFrame:
    """Approximate kNN: Hamming shortlist of ``rerank * k`` candidates
    per query over the 1-bit codes, then exact rerank on the raw
    vectors (the FAISS binary+refine pattern).

    Returns (qid, neighbor_id, dist, rnk) shaped like operators/knn.knn
    — the final top-k is by exact float distance, so at full rerank
    budget (rerank·k ≥ corpus) it EQUALS exact kNN in the same metric.
    The shortlist scan reads only the packed codes; raw vectors are
    touched only for the broadcast R·k joinback.

    ``metric`` picks the rerank distance (``"l2sq"`` | ``"cosine"``,
    the knn() metrics). Sign codes are SCALE-INVARIANT — ``sign(x@R)
    == sign((x/|x|)@R)`` — so the Hamming shortlist always estimates
    ANGULAR order and normalizing inputs before encoding is a no-op by
    construction (that is also why no norm column needs persisting).
    ``metric="cosine"`` is therefore the honest pairing: the shortlist
    and the rerank agree on what "near" means, and on L2-normalized
    embeddings it coincides with L2 order. ``l2sq`` against
    non-normalized data keeps working but pays the known recall floor
    — norms dominate L2 yet are invisible to signs (BASELINE.md
    records the measured decomposition)."""
    k = max(int(k), 1)
    fetch = max(int(rerank), 1) * k
    ccodes = bq_encode(
        corpus.select(id_col, vec_col), dim, vec_col, n_bits=n_bits, seed=seed
    )
    qcodes = bq_encode(
        queries.select(qid_col, qvec_col), dim, qvec_col, out_col="qcode",
        n_bits=n_bits, seed=seed,
    )
    shortlist = bq_topk(
        ccodes.select(id_col, "bq_code"),
        qcodes.select(qid_col, "qcode"),
        k=fetch,
        id_col=id_col,
        qid_col=qid_col,
    )
    rescored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col)
        .join(F.broadcast(shortlist.select("qid", "neighbor_id")), "neighbor_id")
        .join(
            F.broadcast(
                queries.select(
                    F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qvec")
                )
            ),
            "qid",
        )
        .select(
            "qid", "neighbor_id", _dist_expr(metric, "_qvec", vec_col).alias("dist")
        )
    )
    w = Window.partitionBy("qid").orderBy("dist", "neighbor_id")
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "neighbor_id", "dist", "rnk")
    )
