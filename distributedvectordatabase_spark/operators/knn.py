"""Exact and pruned k-nearest-neighbor search, Spark-first.

Re-expresses the reference's entire search path — coordinator fan-out,
per-shard FAISS top-k, global merge (reference
coordinator/coordinator.py:132-254 + shard/shard_node.py:101-133) — as
a declarative plan:

    broadcast(queries) ⨯ corpus  →  distance  →  per-query top-k

Two implementations, same semantics:

- ``impl="expr"`` — pure Catalyst: higher-order-function distance
  expression + window top-k. Whole-stage-codegen'd, zero Python. The
  shuffle moves the scored (qid, id, dist) triples — fine for modest
  query batches, and it is the form the DuckDB oracle mirrors 1:1.
- ``impl="arrow"`` — the scale path: queries are broadcast as a numpy
  matrix, ``mapInPandas`` computes a BLAS distance-matrix per Arrow
  batch of the corpus and keeps only the per-(query, partition) top-k
  **before** any exchange. The follow-up merge window then shuffles
  only O(n_queries · k · n_partitions) rows — this is exactly the
  reference's per-shard-FAISS-topk + coordinator argsort merge
  (shard/shard_node.py:127, coordinator/coordinator.py:211-249), but
  vectorized and spill-safe. At 100 TB this is the only viable shape:
  the corpus is scanned once, never shuffled.

Semantics pinned for reproducibility / oracle checks:
- ties broken by (dist, neighbor_id) ascending — the reference's
  argsort tie order is undefined (coordinator/coordinator.py:229);
- k clamped to >=1 (coordinator.py:145-147) and implicitly to corpus
  size (row_number runs out; reference shard_node.py:118-120);
- distances are float64 over float32-stored vectors, clamped at >= 0
  (BLAS norm-identity can yield -1e-16 for exact matches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.vector import cosine_dist, l2sq

_METRICS = {"l2sq", "cosine"}

# Driver-side cap on the collected query batch. Every search entry point
# broadcasts the query set as a numpy matrix (the reference coordinator
# does the same with its request batch, coordinator/coordinator.py:132),
# which is only sane for bounded batches — a 10M-row "query set" is a
# similarity JOIN, not a search, and must go through the join-based
# impl="expr" path (or setsim/near-dup operators) instead.
MAX_QUERY_BATCH = 100_000

# rescore="auto" switches carry -> joinback at this query dimension:
# a 2k-slate row then carries >= 2 KB of float64 vector through the
# merge shuffle, which costs more than the joinback's second (hash,
# partition-prunable) probe of the corpus by id.
AUTO_JOINBACK_DIM = 256


def collect_query_batch(
    queries: DataFrame, qid_col: str, qvec_col: str, *extra_cols: str
) -> list:
    """Collect the query side with an explicit cap (guards the driver
    against an unbounded collect; see MAX_QUERY_BATCH). ``extra_cols``
    ride along for callers that need per-query metadata (e.g.
    filtered_knn's constraint column)."""
    rows = (
        queries.select(qid_col, qvec_col, *extra_cols)
        .limit(MAX_QUERY_BATCH + 1)
        .collect()
    )
    if len(rows) > MAX_QUERY_BATCH:
        raise ValueError(
            f"query batch exceeds MAX_QUERY_BATCH={MAX_QUERY_BATCH}; "
            "for corpus-scale query sets use the join-based impl='expr' "
            "path or the near-dup/setsim operators instead of broadcast kNN"
        )
    return rows


def _dlit(x: float) -> str:
    """A Spark SQL double literal that parses back to exactly ``x``
    (repr round-trips through correctly-rounded decimal parsing on
    both sides; the D suffix keeps the literal DOUBLE, not DECIMAL)."""
    return repr(float(x)) + "D"


def local_query_relation(spark, qrows: list, qid_col: str, qvec_col: str) -> DataFrame:
    """The already-collected query batch as a VALUES LocalRelation.

    The deterministic re-score (``_rescored_topk``) broadcast-joins the
    query vectors back to the candidate slate. Referencing the original
    ``queries`` plan there makes the broadcast build re-run the whole
    query-side subplan (e.g. a TakeOrdered scan of the corpus) as its
    own Spark job — once per search call — even though the exact same
    rows were just collected to the driver to build the numpy payload.
    Rebuilding the q side from those rows as a literal VALUES relation
    is row-identical by construction (same qid/qvec pairs; double
    literals round-trip exactly, and every distance expression casts
    its inputs to array<double> anyway) and broadcasts driver-side with
    NO job at all (LocalTableScan collects without submitting tasks) —
    one fewer job + one fewer corpus-scan subtree per query batch
    (guide §5: the driver should do almost no data work, and bounded
    work it already did should not be re-done as a cluster job)."""
    if not qrows:
        return spark.sql(
            f"SELECT CAST(NULL AS BIGINT) AS `{qid_col}`, "
            f"CAST(NULL AS ARRAY<DOUBLE>) AS `{qvec_col}` WHERE 1=0"
        )
    rows_sql = ", ".join(
        "({}L, array({}))".format(
            int(r[qid_col]), ",".join(_dlit(x) for x in r[qvec_col])
        )
        for r in qrows
    )
    return spark.sql(
        f"SELECT col1 AS `{qid_col}`, col2 AS `{qvec_col}` FROM VALUES {rows_sql}"
    )


def _dist_expr(metric: str, a, b) -> Column:
    if metric == "l2sq":
        return l2sq(a, b)
    if metric == "cosine":
        return cosine_dist(a, b)
    raise ValueError(f"unknown metric {metric!r}; use one of {sorted(_METRICS)}")


def batch_topk(D: np.ndarray, ids: np.ndarray, k: int, take: int):
    """Vectorized per-row top-k by (value, id) over a distance matrix.

    Returns (sel_id, sel_d) of shape (nq, min(k, ncols)), each row
    ordered by (distance, id) ascending — the whole batch is ranked
    with two stable argsorts (sort by id, then stable re-sort by dist
    = a row-wise lexsort) after an argpartition prefilter to ``take``
    columns.

    Exact under arbitrary ties: argpartition selects by distance only,
    so a tie group straddling the ``take`` boundary could hide an
    equal-distance neighbor with a smaller id. Rows where the k-th
    selected distance still has unselected duplicates are detected and
    re-ranked over all columns — the fallback costs a full row sort but
    only fires on pathological tie widths (e.g. > take duplicates of
    one vector), keeping the hot path at O(nc + take log take).
    """
    nq, nc = D.shape
    t = min(take, nc)
    if t < nc:
        part = np.argpartition(D, t - 1, axis=1)[:, :t]
    else:
        part = np.broadcast_to(np.arange(nc), (nq, nc))
    d_part = np.take_along_axis(D, part, axis=1)
    ids_part = ids[part]
    o1 = np.argsort(ids_part, axis=1, kind="stable")
    o2 = np.argsort(np.take_along_axis(d_part, o1, axis=1), axis=1, kind="stable")
    order = np.take_along_axis(o1, o2, axis=1)[:, :k]
    sel_id = np.take_along_axis(ids_part, order, axis=1)
    sel_d = np.take_along_axis(d_part, order, axis=1)
    if t < nc and sel_d.shape[1] > 0:
        # boundary-tie guard: the k-th kept distance must not have more
        # duplicates in the full row than made it into the prefilter
        kth = sel_d[:, -1]
        n_total = (D == kth[:, None]).sum(axis=1)
        n_in_take = (d_part == kth[:, None]).sum(axis=1)
        # kth == inf means every finite entry was already selected
        # (inf marks masked rows; their identity never matters)
        bad = np.flatnonzero((n_total > n_in_take) & np.isfinite(kth))
        if len(bad):
            fix_id, fix_d = batch_topk(D[bad], ids, k, take=nc)
            sel_id[bad], sel_d[bad] = fix_id, fix_d
    return sel_id, sel_d


def _final_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy("dist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "neighbor_id", "dist", "rnk")
    )


def _rescored_topk(
    partial: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    qid_col: str,
    qvec_col: str,
    join_corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qrows: list | None = None,
) -> DataFrame:
    """Deterministic final top-k over an Arrow partial that carries the
    neighbor vectors (``nvec``).

    ``qrows`` — the already-collected query batch; when given, the
    broadcast q side is rebuilt from it as a literal LocalRelation
    (:func:`local_query_relation`) instead of re-executing the
    ``queries`` subplan as a broadcast-build job.

    The BLAS distance matrix sums in batch order, so its float64 values
    can land on either side of a rounding boundary depending on
    parallelism — the oracle's sequential sum is one fixed order. BLAS
    distances are therefore used only to *select* a 2k candidate slate
    per query; the reported ``dist`` (and the final (dist, id) ordering)
    is recomputed with the same sequential ``aggregate(zip_with(...))``
    expression the SQL oracle uses, making the output independent of
    partition count and batch split.

    Slate sufficiency: this assumes the true sequential-sum top-k lies
    inside the BLAS-selected slate, which holds while BLAS-vs-sequential
    divergence (ulp-scale) is smaller than the k→2k distance gap. For
    duplicate-heavy corpora where many candidates tie near the slate
    boundary, the epsilon guard below widens the slate to include every
    candidate within ``eps`` of the 2k-th distance (mirroring the
    boundary-tie guard in batch_topk).

    Scale note: the default slate carries each candidate's full vector
    (``nvec``) through the merge shuffle — free at 64-D, ~4 KB/row at
    512-D. When ``join_corpus`` is given (knn(..., rescore="joinback")),
    the partial omits ``nvec`` and the ≤ nq·(2k+ties) winner ids join
    back to the corpus by id before re-scoring — the merge shuffle then
    moves only (qid, id, dist) triples, the right trade at high
    dimension (the join is a hash probe on the id, partition-prunable
    on a bucketed/sorted corpus)."""
    # Relative epsilon: BLAS-vs-sequential float64 divergence scales
    # with the distance magnitude (~1e-16 relative), so an absolute
    # guard under-widens for large-magnitude l2sq (unnormalized
    # high-dim vectors, dist >= ~1e7). 1e-9 relative keeps ~6 orders
    # of headroom over ulp-scale divergence while still only admitting
    # genuine boundary ties.
    eps = 1e-9
    w = Window.partitionBy("qid").orderBy("dist", "neighbor_id")
    wq = Window.partitionBy("qid")
    slate_cols = ["qid", "neighbor_id"] + (["nvec"] if join_corpus is None else [])
    slate = (
        partial.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "_cut",
            F.max(F.when(F.col("rnk") <= 2 * k, F.col("dist"))).over(wq),
        )
        .filter(
            (F.col("rnk") <= 2 * k)
            | (
                F.col("dist")
                <= F.col("_cut")
                + F.lit(eps) * F.greatest(F.lit(1.0), F.abs(F.col("_cut")))
            )
        )
        .select(*slate_cols)
    )
    if join_corpus is not None:
        slate = slate.join(
            join_corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
            ),
            "neighbor_id",
        )
    if qrows is not None:
        queries = local_query_relation(
            partial.sparkSession, qrows, qid_col, qvec_col
        )
    q = F.broadcast(
        queries.select(F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qvec"))
    )
    rescored = slate.join(q, "qid").select(
        "qid", "neighbor_id", _dist_expr(metric, "_qvec", "nvec").alias("dist")
    )
    return _final_topk(rescored, k)


def knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    impl: str = "arrow",
    rescore: str = "auto",
) -> DataFrame:
    """Batch exact kNN: for every query row, the k nearest corpus rows.

    Returns (qid, neighbor_id, dist, rnk), rnk in 1..k ordered by
    (dist, neighbor_id) ascending.

    ``rescore`` (arrow impl only) picks how the deterministic re-score
    gets the candidate vectors: ``"carry"`` ships them inside the
    partial (one scan; +dim×8 bytes per slate row through the merge
    shuffle), ``"joinback"`` ships only (qid, id, dist) and joins the
    ≤ nq·2k winners back to the corpus by id — identical results, the
    better trade at high dimension or huge query batches. The default
    ``"auto"`` picks joinback at query dim >= 256 (a 2k-slate row then
    carries >= 2 KB of vector through the merge shuffle), carry below
    (the joinback's second corpus probe costs more than shipping small
    vectors). Resolved from the already-collected query batch — no
    extra Spark job.
    """
    k = max(int(k), 1)
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}")
    if rescore not in ("auto", "carry", "joinback"):
        raise ValueError(
            f"unknown rescore {rescore!r}; use 'auto', 'carry' or 'joinback'"
        )
    if impl == "expr" and rescore not in ("auto", "carry"):
        raise ValueError(
            "rescore applies to impl='arrow' only: the expr impl already "
            "scores with the sequential aggregate(zip_with(...)) expression, "
            "so there is nothing to re-score; drop rescore or use impl='arrow'"
        )
    if impl == "arrow":
        qrows = collect_query_batch(queries, qid_col, qvec_col)
        if rescore == "auto":
            dim = len(qrows[0][qvec_col]) if qrows else 0
            rescore = "joinback" if dim >= AUTO_JOINBACK_DIM else "carry"
        carry = rescore == "carry"
        partial = _arrow_partial_topk(
            corpus, queries, k, metric, id_col, vec_col, qid_col, qvec_col,
            qrows=qrows, carry_vectors=carry,
        )
        return _rescored_topk(
            partial, queries, k, metric, qid_col, qvec_col,
            join_corpus=None if carry else corpus, id_col=id_col, vec_col=vec_col,
            qrows=qrows,
        )
    if impl == "expr":
        pairs = corpus.join(F.broadcast(queries.select(qid_col, qvec_col)))
        scored = pairs.select(
            F.col(qid_col).alias("qid"),
            F.col(id_col).alias("neighbor_id"),
            _dist_expr(metric, qvec_col, vec_col).alias("dist"),
        )
        return _final_topk(scored, k)
    raise ValueError(f"unknown impl {impl!r}; use 'arrow' or 'expr'")


def _arrow_partial_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    shard_col: str | None = None,
    cand_map: dict[int, frozenset] | None = None,
    qrows: list | None = None,
    carry_vectors: bool = True,
) -> DataFrame:
    """mapInPandas partial top-k: per Arrow batch, a (nq × batch) BLAS
    distance matrix; emit the k best (with 2k tie slack) per query.

    With ``shard_col``/``cand_map``, rows outside a query's candidate
    shards are masked to +inf before the top-k — the pruned search then
    runs on the same BLAS path as the exact one instead of interpreted
    per-pair expressions (10× at 500k rows; see bench_scale.py).
    ``qrows`` lets a caller that already collected the query batch (e.g.
    IVFStore centroid probing) reuse it instead of a second collect."""
    if qrows is None:
        qrows = collect_query_batch(queries, qid_col, qvec_col)
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[qvec_col]) for r in qrows], dtype=np.float64)
    spark = corpus.sparkSession
    take = 2 * k  # slack so dist-ties at the k boundary survive to the merge

    # Candidate shards as a dense (nq × n_shards) boolean lookup so the
    # per-batch mask is one fancy-index, not an np.isin per query row.
    if cand_map is not None:
        n_shards = max((s for ss in cand_map.values() for s in ss), default=-1) + 1
        allowed_lut = np.zeros((len(qids), max(n_shards, 1)), dtype=bool)
        for i, qid in enumerate(qids):
            for s in cand_map.get(int(qid), ()):
                allowed_lut[i, s] = True
        bc_payload = (qids, Q, allowed_lut)
    else:
        bc_payload = (qids, Q, None)
    bc = spark.sparkContext.broadcast(bc_payload)

    def scan(batches):
        qids, Q, allowed_lut = bc.value
        nq = len(Q)
        qn = np.einsum("ij,ij->i", Q, Q)
        qnorm = np.sqrt(qn)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col].values), dtype=np.float64)
            ids = pdf[id_col].values.astype(np.int64)
            if metric == "l2sq":
                D = qn[:, None] + np.einsum("ij,ij->i", X, X)[None, :] - 2.0 * (Q @ X.T)
                np.maximum(D, 0.0, out=D)
            else:  # cosine distance with zero-norm guard
                xnorm = np.sqrt(np.einsum("ij,ij->i", X, X))
                denom = qnorm[:, None] * xnorm[None, :]
                sim = np.divide(Q @ X.T, denom, out=np.zeros((len(Q), len(X))), where=denom != 0)
                D = 1.0 - sim
            if allowed_lut is not None:
                shards = pdf[shard_col].values.astype(np.int64)
                in_range = (shards >= 0) & (shards < allowed_lut.shape[1])
                ok = np.zeros((nq, len(shards)), dtype=bool)
                ok[:, in_range] = allowed_lut[:, shards[in_range]]
                D[~ok] = np.inf
            sel_id, sel_d = batch_topk(D, ids, k, take)
            keep = np.isfinite(sel_d).ravel()  # drop shard-masked rows
            if not keep.any():
                # fully-masked batch: yielding an all-empty frame with an
                # object nvec column trips Arrow's type inference
                continue
            out = {
                "qid": np.repeat(qids, sel_d.shape[1])[keep],
                "neighbor_id": sel_id.ravel()[keep],
                "dist": sel_d.ravel()[keep],
            }
            if carry_vectors:
                # carry the winners' vectors so the merge can re-score
                # with the deterministic sequential expression (no second
                # scan): map selected ids back to batch row positions
                sorter = np.argsort(ids, kind="stable")
                pos = sorter[np.searchsorted(ids, sel_id.ravel()[keep], sorter=sorter)]
                out["nvec"] = list(X[pos])
            yield pd.DataFrame(out)

    cols = [id_col, vec_col] + ([shard_col] if cand_map is not None else [])
    schema = "qid long, neighbor_id long, dist double"
    if carry_vectors:
        schema += ", nvec array<double>"
    return corpus.select(*cols).mapInPandas(scan, schema=schema)


def knn_single(
    corpus: DataFrame,
    query_vector,
    k: int = 10,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query kNN as ORDER BY dist LIMIT k → TakeOrderedAndProject
    (per-partition heap, driver merge; no full sort, no shuffle)."""
    k = max(int(k), 1)
    q = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _dist_expr(metric, q, vec_col).alias("dist"),
        )
        .orderBy("dist", "neighbor_id")
        .limit(k)
    )


def knn_pruned(
    corpus_bucketed: DataFrame,
    queries: DataFrame,
    lsh,
    k: int = 10,
    num_candidates: int = 2,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    shard_col: str = "shard_id",
    impl: str = "arrow",
    rescore: str = "auto",
) -> DataFrame:
    """LSH-pruned approximate kNN (the reference's 2-of-3 shard probe:
    coordinator/coordinator.py:150-175, sharding/lsh_sharding.py:98-161,
    multi-probe bit-flip policy corrected per SURVEY §4).

    ``corpus_bucketed`` must carry ``shard_col`` (SignLSH.assign /
    VectorStore.read). Candidate shards are computed driver-side from
    the seeded LSH — the queries are the small user-supplied side, as
    in the reference's coordinator — then applied as:

    1. ``shard_id IN (union of candidates)``: a literal predicate
       Catalyst turns into Parquet **partition pruning** — pruned
       shards are never read from disk;
    2. an equi-join on (qid ↔ candidate shard) so each query pairs
       only with rows of its own candidate shards — or, with
       ``impl="arrow"`` (default), per-batch shard masking inside the
       same Arrow/BLAS partial top-k scan the exact path uses; the
       expression-join form (``impl="expr"``) scores pairs with
       interpreted lambdas and is ~10× slower at 500k rows.
    """
    k = max(int(k), 1)
    if impl == "expr" and rescore not in ("auto", "carry"):
        raise ValueError(
            "rescore applies to impl='arrow' only: the expr impl already "
            "scores with the sequential aggregate(zip_with(...)) expression"
        )
    qrows = collect_query_batch(queries, qid_col, qvec_col)
    if rescore == "auto":
        dim = len(qrows[0][qvec_col]) if qrows else 0
        rescore = "joinback" if dim >= AUTO_JOINBACK_DIM else "carry"
    cand_pairs = [
        (int(r[qid_col]), int(s))
        for r in qrows
        for s in lsh.candidate_shards(list(r[qvec_col]), num_candidates=num_candidates)
    ]
    spark = corpus_bucketed.sparkSession
    all_shards = sorted({s for _, s in cand_pairs})
    pruned = corpus_bucketed.filter(F.col(shard_col).isin(all_shards))

    if impl == "arrow":
        cand_map = {}
        for qid, s in cand_pairs:
            cand_map.setdefault(qid, set()).add(s)
        cand_map = {q: frozenset(s) for q, s in cand_map.items()}
        carry = rescore == "carry"
        partial = _arrow_partial_topk(
            pruned, queries, k, metric, id_col, vec_col, qid_col, qvec_col,
            shard_col=shard_col, cand_map=cand_map, qrows=qrows,
            carry_vectors=carry,
        )
        return _rescored_topk(
            partial, queries, k, metric, qid_col, qvec_col,
            join_corpus=None if carry else pruned, id_col=id_col, vec_col=vec_col,
            qrows=qrows,
        )

    cand_df = spark.createDataFrame(cand_pairs, schema=f"{qid_col} long, {shard_col} int")
    pairs = pruned.join(
        F.broadcast(queries.select(qid_col, qvec_col).join(cand_df, qid_col)),
        on=shard_col,
    )
    scored = pairs.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("neighbor_id"),
        _dist_expr(metric, qvec_col, vec_col).alias("dist"),
    )
    return _final_topk(scored, k)


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int) -> float:
    """recall@k of an approximate kNN result vs the exact one (the
    reference never measures its LSH recall; we do — SURVEY §5.3)."""
    e = exact.filter(F.col("rnk") <= k).select("qid", "neighbor_id")
    a = approx.filter(F.col("rnk") <= k).select("qid", "neighbor_id")
    hits = e.join(a, ["qid", "neighbor_id"]).count()
    total = e.count()
    return hits / total if total else 1.0


def filtered_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "l2sq",
    predicate=None,
    filter_col: str | None = None,
    qfilter_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    impl: str = "arrow",
    rescore: str = "auto",
) -> DataFrame:
    """Metadata-filtered exact kNN — attribute predicates composed with
    vector search (the reference lists metadata filtering as explicit
    future work: COCO_INSTRUCTIONS.md:121-125, generate_report.py:298;
    in Spark it composes for free because search is just a plan).

    Two orthogonal filter forms, combinable:

    - ``predicate``: a global restriction (Column or SQL string)
      applied to the corpus before search. Declared as a plain
      ``filter``, so Catalyst pushes it into the Parquet scan
      (``PushedFilters`` — asserted in tests/test_knn.py): filtered
      search reads *less* than unfiltered, it never post-filters a
      full scan. This is the "WHERE label = 3 AND ... ORDER BY
      dist LIMIT k" shape a vector DB calls filtered search.
    - ``filter_col`` (+ optional ``qfilter_col``, default same name on
      the query side): a per-query equality constraint — each query
      only matches corpus rows whose ``filter_col`` equals the query's
      own value (e.g. tenant-scoped or same-label search). Semantics
      are exact post-filter kNN: the top-k *within* the allowed subset,
      identical to filtering first and searching second.

    The per-query form reuses the pruned-search machinery: the distinct
    constraint values become an ``isin`` corpus predicate (Parquet
    row-group pushdown; partition pruning when the corpus is stored
    partitioned by ``filter_col``, e.g. a VectorStore sharded on it),
    and the Arrow scan masks each batch per query exactly like
    ``knn_pruned``'s candidate-shard masking — one corpus scan for the
    whole query batch, no per-query jobs. Constraint values are
    dictionary-encoded driver-side to dense mask indices (a broadcast
    value→index join on the corpus side), so any equality-comparable
    type works — negative ints, sparse tenant ids, strings. A NULL
    constraint matches nothing (SQL equality), so that query yields no
    rows.
    """
    k = max(int(k), 1)
    if predicate is not None:
        pred = predicate if isinstance(predicate, Column) else F.expr(predicate)
        corpus = corpus.filter(pred)
    if filter_col is None:
        return knn(
            corpus, queries, k=k, metric=metric, id_col=id_col, vec_col=vec_col,
            qid_col=qid_col, qvec_col=qvec_col, impl=impl, rescore=rescore,
        )
    qf = qfilter_col or filter_col
    if impl == "expr":
        # the equality join IS the constraint — no driver collect, no
        # cap: this is the path for corpus-scale constrained matching
        if rescore not in ("auto", "carry"):
            raise ValueError(
                "rescore applies to impl='arrow' only: the expr impl already "
                "scores with the sequential aggregate(zip_with(...)) expression"
            )
        pairs = corpus.join(
            F.broadcast(queries.select(qid_col, qvec_col, F.col(qf).alias("_qf"))),
            on=F.col(filter_col) == F.col("_qf"),
        )
        scored = pairs.select(
            F.col(qid_col).alias("qid"),
            F.col(id_col).alias("neighbor_id"),
            _dist_expr(metric, qvec_col, vec_col).alias("dist"),
        )
        return _final_topk(scored, k)
    if impl != "arrow":
        raise ValueError(f"unknown impl {impl!r}; use 'arrow' or 'expr'")

    qrows = collect_query_batch(queries, qid_col, qvec_col, qf)
    # dictionary-encode constraint values: the Arrow mask is a dense
    # boolean LUT, so raw values must become contiguous indices — raw
    # negative values would wrap and sparse large ids would blow the
    # LUT allocation (value 1e9 → a multi-GB mask)
    value_to_idx: dict = {}
    cand_map: dict[int, frozenset] = {}
    for r in qrows:
        v = r[qf]
        if v is None:
            continue  # NULL matches nothing; the query stays fully masked
        idx = value_to_idx.setdefault(v, len(value_to_idx))
        cand_map[int(r[qid_col])] = frozenset([idx])
    spark = corpus.sparkSession
    pruned = corpus.filter(F.col(filter_col).isin(list(value_to_idx)))
    if value_to_idx:
        map_df = spark.createDataFrame(
            [(v, i) for v, i in value_to_idx.items()], ["_fval", "_fidx"]
        )
        masked = pruned.join(
            F.broadcast(map_df), F.col(filter_col) == F.col("_fval")
        ).drop("_fval")
    else:
        masked = pruned.withColumn("_fidx", F.lit(0))  # pruned is already empty

    if rescore == "auto":
        dim = len(qrows[0][qvec_col]) if qrows else 0
        rescore = "joinback" if dim >= AUTO_JOINBACK_DIM else "carry"
    carry = rescore == "carry"
    partial = _arrow_partial_topk(
        masked, queries, k, metric, id_col, vec_col, qid_col, qvec_col,
        shard_col="_fidx", cand_map=cand_map,
        qrows=[{qid_col: r[qid_col], qvec_col: r[qvec_col]} for r in qrows],
        carry_vectors=carry,
    )
    return _rescored_topk(
        partial, queries, k, metric, qid_col, qvec_col,
        join_corpus=None if carry else pruned, id_col=id_col, vec_col=vec_col,
        qrows=[{qid_col: r[qid_col], qvec_col: r[qvec_col]} for r in qrows],
    )
