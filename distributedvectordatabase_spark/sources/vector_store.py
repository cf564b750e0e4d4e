"""Bucketed Parquet vector store — the Spark-native "index".

The reference's index is a RAM-resident FAISS FlatL2 per shard node,
fed by a coordinator that LSH-routes and HTTP-scatters batches
(shard/shard_node.py:42-99, coordinator/coordinator.py:63-109) and
persisted via faiss.write_index (shard/shard_node.py:135-145). Here
the index **is** a Parquet table partitioned by ``shard_id``:

- "index build" = ``assign shard_id → write.partitionBy(shard_id)``;
  the group-by-shard scatter is Spark's exchange (free, parallel,
  retried) instead of a ThreadPoolExecutor of HTTP POSTs;
- "load index" = ``spark.read.parquet(path)`` — shard_id comes back
  as a partition column, so ``shard_id IN (...)`` predicates become
  Catalyst **partition pruning** (directories never read);
- "save index" = already durable; append ingest is an append-mode
  write (the reference's 1000-row batch loop + 1 s pacing,
  load_coco_embeddings.py:38-115, collapses into the writer).

Scale notes: at 100 TB, num_tables stays small (it's a routing
modulus, not a parallelism unit) while *files per shard partition*
carry the parallelism; we repartition by shard_id plus a spread key
so each partition directory holds many similarly-sized files and no
single task owns a whole shard.

Deviation (SURVEY §4): auto-generated IDs are globally unique
(max_id + monotonic offset), not the reference's per-shard counters
which collide across shards (shard/shard_node.py:49,77-80).

Beyond the reference (which has no delete/update endpoint —
coordinator_server.py exposes only add_vectors/search/stats):
merge-on-read DELETE/UPSERT, the operation a training-data store
needs for take-downs. Every written row carries a ``_gen``
generation; ``delete()`` appends (id, gen) tombstones to the hidden
``_tombstones/`` sidecar (underscore-prefixed, so Spark's file index
never scans it as data); ``read()`` drops a row when a tombstone for
its id has gen >= the row's — one broadcast join of a tiny
aggregated tombstone table above the scan, so shard partition
pruning and filter pushdown are unaffected. ``compact()`` folds
tombstones in physically and clears them. The delete gen is
persisted to the sidecar config BEFORE tombstones are written and
the write gen only AFTER a successful data write, so a crash
anywhere leaves at most an unused gen number, never a resurrected
or wrongly-killed row.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.sources.tombstones import (
    atomic_dump_json,
    locked_writer,
)
from distributedvectordatabase_spark.functions.vector import l2sq


class DimensionMismatchError(ValueError):
    """Reference semantics: inserting a wrong-dimension vector is an
    error (shard/shard_node.py:72-74)."""


class VectorStore:
    def __init__(
        self,
        path: str,
        lsh: SignLSH | None = None,
        id_col: str | None = None,
        vec_col: str | None = None,
        files_per_shard: int = 4,
    ):
        self.path = path
        # The store's LSH config (projection seed/shape) determines the
        # on-disk shard assignment, so on reopen the persisted sidecar
        # is authoritative: a default-constructed SignLSH against a
        # store built with different parameters would silently bucket
        # queries wrong (the TextIndex reopen bug class). An EXPLICIT
        # lsh argument still wins — callers who pass one own the match.
        cfg = None
        if lsh is None or id_col is None or vec_col is None:
            cfg_path = os.path.join(path, "_lsh.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    cfg = json.load(f)
        if lsh is None and cfg is not None:
            lsh = SignLSH(
                dim=int(cfg["dim"]),
                num_fns=int(cfg["num_fns"]),
                num_tables=int(cfg["num_tables"]),
                seed=int(cfg["seed"]),
            )
        self.lsh = lsh or SignLSH()
        self.id_col = id_col or (cfg or {}).get("id_col", "vec_id")
        self.vec_col = vec_col or (cfg or {}).get("vec_col", "embedding")
        self.files_per_shard = files_per_shard

    @property
    def _lsh_config_path(self) -> str:
        return os.path.join(self.path, "_lsh.json")

    @property
    def _tombstone_path(self) -> str:
        return os.path.join(self.path, "_tombstones")

    # underscore-prefixed entries are invisible to spark.read.parquet
    # on self.path, so the SQ8 codes table and its bounds sidecar can
    # live inside the store directory without polluting the raw scan
    @property
    def _sq_path(self) -> str:
        return os.path.join(self.path, "_sq")

    @property
    def _sq_params_path(self) -> str:
        return os.path.join(self.path, "_sq_params.json")

    @property
    def _bq_path(self) -> str:
        return os.path.join(self.path, "_bq")

    @property
    def _bq_params_path(self) -> str:
        return os.path.join(self.path, "_bq_params.json")

    def _gen(self) -> int:
        """Last persisted write/delete generation (0 for a new or
        pre-generation store)."""
        if os.path.exists(self._lsh_config_path):
            with open(self._lsh_config_path) as f:
                return int(json.load(f).get("gen", 0))
        return 0

    def _lsh_config(self) -> dict:
        if os.path.exists(self._lsh_config_path):
            with open(self._lsh_config_path) as f:
                return json.load(f)
        return {}

    def _aborted_gens(self) -> tuple:
        """Gens burned by crashed appends (tombstones.heal_pending) —
        their orphan rows are filtered from every read and reclaimed
        physically by compact()."""
        return tuple(self._lsh_config().get("aborted_gens", ()))

    def _write_lsh_config(self, gen: int | None = None, **extras) -> None:
        """Persist the sidecar, PRESERVING commit-protocol fields
        (pending_gen/aborted_gens) unless overridden via ``extras`` —
        the LSH fields themselves are always refreshed from self."""
        os.makedirs(self.path, exist_ok=True)
        cfg = self._lsh_config()
        cfg.update(
            {
                "dim": self.lsh.dim,
                "num_fns": self.lsh.num_fns,
                "num_tables": self.lsh.num_tables,
                "seed": self.lsh.seed,
                "id_col": self.id_col,
                "vec_col": self.vec_col,
                "gen": self._gen() if gen is None else int(gen),
            }
        )
        cfg.update(extras)
        atomic_dump_json(self._lsh_config_path, cfg)

    # -- ingest -------------------------------------------------------------

    def _prepare(self, df: DataFrame, validate_dim: bool, gen: int = 1) -> DataFrame:
        """``validate_dim`` is free: the bucketing pandas_udf checks the
        vector length in-flight (SignLSH.bucket_udf), so validation
        costs zero extra scans — the old eager form pre-scanned the
        whole input once before writing. ``validate_dim=True`` only
        controls whether the worker error is surfaced as
        DimensionMismatchError by write()/append()."""
        if self.id_col not in df.columns:
            df = df.withColumn(self.id_col, F.monotonically_increasing_id())
        df = df.withColumn("_gen", F.lit(int(gen)))
        out = self.lsh.assign(df, vec_col=self.vec_col, out="shard_id")
        # Spread each shard over several writer tasks so one task never
        # owns a whole shard directory (skew + parallelism at scale).
        # files_per_shard is a MINIMUM: with few shards (the reference
        # default is 3 tables) a fixed 3×4=12-way fan-in leaves most of
        # the cluster idle and each task's working set grows with the
        # input (the 2M-row scale probe showed superlinear ingest —
        # 6.4× time for 4× rows). Scaling the spread to ~2 waves of the
        # cluster's cores keeps tasks bounded; layout varies with
        # parallelism but content (shard_id assignment) does not, and
        # compact() restores files_per_shard files per shard whenever
        # the file count matters more than ingest speed.
        parallelism = out.sparkSession.sparkContext.defaultParallelism
        spread_n = max(
            self.files_per_shard,
            -(-2 * parallelism // max(self.lsh.num_tables, 1)),
        )
        spread = (F.abs(F.hash(self.id_col)) % spread_n).alias("_spread")
        return out.repartition(
            self.lsh.num_tables * spread_n, F.col("shard_id"), spread
        )

    @property
    def _sink_log_path(self) -> str:
        return os.path.join(self.path, "_spark_metadata")

    def _write(self, df: DataFrame, mode: str, validate_dim: bool) -> None:
        if mode == "append" and os.path.exists(self._sink_log_path):
            # FileStreamSink stores a transaction log; once present,
            # batch reads list ONLY sink-logged files, so a batch
            # append here would write rows no read can ever see
            raise ValueError(
                "store is an active streaming sink (_spark_metadata "
                "present): batch-appended files would be invisible to "
                "reads; run compact(spark) to finalize the sink first"
            )
        if mode == "append" and os.path.exists(self._lsh_config_path):
            raw = df.sparkSession.read.parquet(self.path)
            if "_gen" not in raw.columns:
                raise ValueError(
                    "store predates delete support (no _gen column); run "
                    "compact(spark) once to upgrade before appending"
                )
        from distributedvectordatabase_spark.sources.tombstones import (
            heal_pending,
            next_gen,
        )

        cfg = heal_pending(self._lsh_config())
        gen = next_gen(cfg)
        if mode == "append":
            # phase 1 (tombstones.heal_pending protocol, shared with
            # TextIndex/IVFStore): persist the write intent BEFORE any
            # data job — a crash from here on leaves rows no read sees
            self._write_lsh_config(
                pending_gen=gen,
                aborted_gens=cfg.get("aborted_gens", []),
            )
        # keep the SQ8 codes sidecar in sync on append: pin the
        # prepared batch so the raw write and the codes write see the
        # SAME rows (a non-deterministic input recomputed per write
        # would let the two tables silently diverge — the IVFStore
        # append contract). A static overwrite drops the whole store
        # dir, sidecars included, so only append needs the sync.
        sync_sq = mode == "append" and os.path.exists(self._sq_params_path)
        try:
            out = self._prepare(df, validate_dim, gen=gen)
            if sync_sq:
                out = out.cache()
            out.write.mode(mode).partitionBy("shard_id").parquet(self.path)
            # THE commit: gen bumps and the intent clears in one dump,
            # only AFTER the data lands — a crash mid-write leaves the
            # orphan rows above the committed horizon (invisible via
            # filter_committed) for the next writer to heal. It must
            # also land BEFORE the SQ encode below: if that second write
            # fails, _gen (g+1) != the SQ synced gen (g) and knn_sq's
            # staleness guard trips — persisting after would leave both
            # at g and the guard would pass on codes missing these rows.
            self._write_lsh_config(gen=gen, pending_gen=None)
            if sync_sq:
                from distributedvectordatabase_spark.operators.sq import sq_encode

                try:
                    # encoded with the EXISTING bounds (standard SQ
                    # ingest — out-of-range values saturate; periodic
                    # build_sq refresh is a caller policy). Not atomic
                    # with the raw write: if this fails, the staleness
                    # guard refuses knn_sq until build_sq regenerates
                    # the codes from raw (derived data).
                    (
                        sq_encode(out, self.sq_params(), id_col=self.id_col,
                                  vec_col=self.vec_col,
                                  keep_cols=("shard_id", "_gen"))
                        .write.mode("append")
                        .partitionBy("shard_id")
                        .parquet(self._sq_path)
                    )
                finally:
                    out.unpersist()
                self._sq_record_gen(gen)
        except Exception as e:  # surface the in-flight dim check typed
            if validate_dim and "dimension mismatch" in str(e):
                raise DimensionMismatchError(
                    f"vector dimension mismatch: expected {self.lsh.dim}"
                ) from e
            raise

    @locked_writer
    def write(self, df: DataFrame, mode: str = "overwrite", validate_dim: bool = True) -> None:
        """Build (or rebuild) the index: bucket + partitioned write."""
        self._write(df, mode, validate_dim)

    @locked_writer
    def append(self, df: DataFrame, validate_dim: bool = True) -> None:
        """Append ingest (reference add_vectors); auto-IDs continue past
        the current max id, globally unique."""
        spark = df.sparkSession
        if self.id_col not in df.columns and os.path.exists(self.path):
            # max over the RAW rows plus tombstoned ids — a deleted id
            # must never be reissued (its tombstone would silently kill
            # the new row)
            from distributedvectordatabase_spark.sources.tombstones import (
                max_tombstoned_id,
            )

            start = (
                spark.read.parquet(self.path).agg(F.max(self.id_col)).first()[0]
                or 0
            )
            start = max(
                start, max_tombstoned_id(spark, self._tombstone_path, self.id_col)
            )
            df = df.withColumn(
                self.id_col, F.monotonically_increasing_id() + F.lit(start + 1)
            )
        self._write(df, "append", validate_dim)

    @locked_writer
    def compact(self, spark: SparkSession) -> None:
        """Rewrite the store into ``files_per_shard`` files per shard.

        Streaming / repeated append ingest leaves one file per
        (micro-batch, writer task) — at 100 TB that means millions of
        small files, and open/footer overhead starts to dominate scan
        time. Compaction restores the build-time layout: read,
        repartition on (shard_id, spread), rewrite. The new copy is
        fully materialized in a sibling directory before the old one is
        removed, so a failed compaction never loses the store.

        Also folds tombstones in: only live rows are rewritten (with
        their ``_gen``), and the swap drops the ``_tombstones/``
        sidecar with the old directory — physical deletion happens
        here, exactly like merge-on-read table formats.

        On a store fed by ``stream_ingest_vectors`` this additionally
        FINALIZES the streaming sink: the ``_spark_metadata``
        transaction log is not carried over, so the store leaves the
        sink era (batch append/upsert become legal) and the finished
        stream cannot be resumed into it — by design, since a resumed
        sink's fresh log would hide the compacted files."""
        import shutil

        tmp = self.path.rstrip("/") + "__compacting"
        spread = (F.abs(F.hash(self.id_col)) % self.files_per_shard).alias("_spread")
        (
            self._read_live(spark)
            .repartition(self.lsh.num_tables * self.files_per_shard, F.col("shard_id"), spread)
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(tmp)
        )
        if os.path.exists(self._lsh_config_path):
            # aborted/pending clear — the live rewrite above dropped
            # their orphan rows physically
            cfg = self._lsh_config()
            cfg["aborted_gens"] = []
            cfg["pending_gen"] = None
            atomic_dump_json(
                os.path.join(tmp, os.path.basename(self._lsh_config_path)), cfg
            )
        # carry the SQ8 sidecar, folding tombstones into the codes
        # table the same way the raw rewrite above does (the swap IS
        # the physical delete for both tables)
        if os.path.exists(self._sq_params_path):
            (
                self._sq_codes_live(spark)
                .write.mode("overwrite")
                .partitionBy("shard_id")
                .parquet(os.path.join(tmp, os.path.basename(self._sq_path)))
            )
            shutil.copy(
                self._sq_params_path,
                os.path.join(tmp, os.path.basename(self._sq_params_path)),
            )
        # same carry for the binary sidecar (no params beyond dim/gen)
        if os.path.exists(self._bq_params_path):
            from distributedvectordatabase_spark.sources.tombstones import (
                filter_live,
            )

            (
                filter_live(
                    spark, self._committed(spark.read.parquet(self._bq_path)),
                    self._tombstone_path, self.id_col,
                )
                .write.mode("overwrite")
                .partitionBy("shard_id")
                .parquet(os.path.join(tmp, os.path.basename(self._bq_path)))
            )
            shutil.copy(
                self._bq_params_path,
                os.path.join(tmp, os.path.basename(self._bq_params_path)),
            )
        shutil.rmtree(self.path)
        shutil.move(tmp, self.path)

    # -- delete / upsert ----------------------------------------------------

    @locked_writer
    def delete(self, spark: SparkSession, ids) -> None:
        """Merge-on-read delete: hide every current row whose id is in
        ``ids`` (a list/iterable or a one-column DataFrame). O(deleted)
        bytes written, nothing rewritten — ``compact()`` reclaims the
        space. Rows appended AFTER the delete are untouched, so
        delete-then-append of the same id is a well-defined upsert."""
        from distributedvectordatabase_spark.sources.tombstones import (
            heal_pending,
            next_gen,
        )

        cfg = heal_pending(self._lsh_config())
        gen = next_gen(cfg)
        # persist the gen BEFORE the tombstones exist: if we crashed
        # between the two, a burned gen number is harmless, while the
        # reverse order could hand a later append the tombstone's own
        # gen and wrongly kill its rows. A crashed append's orphans are
        # healed into aborted_gens FIRST, or bumping the horizon past
        # them would surface them as committed.
        self._write_lsh_config(
            gen=gen,
            pending_gen=cfg.get("pending_gen"),
            aborted_gens=cfg.get("aborted_gens", []),
        )
        from distributedvectordatabase_spark.sources.tombstones import (
            append_tombstones,
        )

        append_tombstones(spark, self._tombstone_path, self.id_col, ids, gen)
        # a delete never desyncs the codes tables (both sides filter
        # the same tombstones at read), so the sidecars stay current
        if os.path.exists(self._sq_params_path):
            self._sq_record_gen(gen)
        if os.path.exists(self._bq_params_path):
            self._bq_record_gen(gen)

    @locked_writer
    def delete_where(self, spark: SparkSession, predicate) -> int:
        """Predicate delete (retention sweeps, policy take-downs):
        tombstone every LIVE row matching ``predicate`` (a Column or a
        SQL string). Returns the number of ids tombstoned. One scan to
        find the ids; the delete itself stays O(deleted)."""
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        # pin the matching ids BEFORE tombstoning: the tombstone write
        # must not re-execute a plan that reads the tombstone dir it is
        # appending to (self-referential read-under-write)
        ids = (
            self.read(spark)
            .filter(cond)
            .select(self.id_col)
            .localCheckpoint(eager=True)
        )
        n = ids.count()
        if n:
            self.delete(spark, ids)
        return n

    @locked_writer
    def upsert(self, df: DataFrame, validate_dim: bool = True) -> None:
        """Replace-by-id: tombstone the incoming ids, then append the
        new rows (their write gen is strictly greater than the delete
        gen, so they survive the tombstone). Ids absent from the store
        insert cleanly — the stray tombstones match nothing."""
        if self.id_col not in df.columns:
            raise ValueError(f"upsert requires an explicit {self.id_col!r} column")
        self.delete(df.sparkSession, df.select(self.id_col))
        self._write(df, "append", validate_dim)

    # -- SQ8 compressed sidecar ---------------------------------------------

    @locked_writer
    def build_sq(self, spark: SparkSession) -> None:
        """Build (or rebuild) the SQ8 codes sidecar: exact per-dim
        min/max bounds over the live rows, then one encode scan into a
        shard-partitioned ``_sq/`` table (1 byte/dim — 8× under the
        float64 arrays). knn_sq() then scans an 8× smaller table with
        the same LSH partition pruning as the raw path and rescored
        shortlists probing the raw vectors only."""
        from distributedvectordatabase_spark.operators.sq import sq_encode, sq_train

        if os.path.exists(self._sink_log_path):
            raise ValueError(
                "store is an active streaming sink (_spark_metadata "
                "present); run compact(spark) to finalize it before build_sq"
            )
        live = self._read_live(spark)
        params = sq_train(live, vec_col=self.vec_col)
        (
            sq_encode(live, params, id_col=self.id_col, vec_col=self.vec_col,
                      keep_cols=("shard_id", "_gen"))
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(self._sq_path)
        )
        atomic_dump_json(
            self._sq_params_path,
            # built_gen: the snapshot floor — rows deleted before this
            # build are physically absent from the codes (r9)
            {**params.to_dict(), "gen": self._gen(), "built_gen": self._gen()},
        )

    def sq_params(self):
        from distributedvectordatabase_spark.operators.sq import SQParams

        with open(self._sq_params_path) as f:
            return SQParams.from_dict(json.load(f))

    def _sq_record_gen(self, gen: int) -> None:
        with open(self._sq_params_path) as f:
            side = json.load(f)
        side["gen"] = int(gen)
        atomic_dump_json(self._sq_params_path, side)

    def _sq_synced_gen(self) -> int:
        with open(self._sq_params_path) as f:
            return int(json.load(f).get("gen", 0))

    def _sq_codes_live(self, spark: SparkSession) -> DataFrame:
        return self._sq_codes(spark)

    def _sq_codes(
        self, spark: SparkSession, as_of_gen: int | None = None
    ) -> DataFrame:
        from distributedvectordatabase_spark.sources.tombstones import (
            filter_as_of,
            filter_live,
        )

        from distributedvectordatabase_spark.sources.scan_cache import cached_parquet

        df = self._committed(cached_parquet(spark, self._sq_path))
        if as_of_gen is None:
            return filter_live(spark, df, self._tombstone_path, self.id_col)
        return filter_as_of(
            spark, df, self._tombstone_path, self.id_col, as_of_gen
        )

    def _allowed_ids(
        self, spark: SparkSession, where: str, as_of_gen: int | None
    ) -> DataFrame:
        """(id) rows matching a metadata predicate — one pass over the
        store's own table (predicate + id column push to the raw scan),
        semi-joined into a compressed codes scan BEFORE its shortlist
        (the ``bm25_batch(allowed_ids=)`` hard-constraint contract)."""
        return (
            self.read(spark, as_of_gen=as_of_gen)
            .filter(where)
            .select(self.id_col)
        )

    def _check_codes_gens(
        self, side_gen: int, as_of_gen: int | None, side: dict, what: str
    ) -> None:
        """Shared staleness/snapshot validation for the SQ/BQ legs: a
        LIVE read requires codes synced to the store head; a SNAPSHOT
        read only requires codes synced AT LEAST to the pinned gen
        (rows at gens ≤ as_of_gen are all present) plus the build-time
        floor (rows deleted before the build never reached the codes —
        tombstones.check_codes_snapshot_floor)."""
        from distributedvectordatabase_spark.sources.tombstones import (
            check_codes_snapshot_floor,
        )

        if as_of_gen is None:
            if side_gen != self._gen():
                raise ValueError(
                    f"{what} codes are stale: the store was written without "
                    f"a codes sync since the last build_{what}; re-run "
                    f"build_{what}(spark)"
                )
            return
        check_codes_snapshot_floor(side, as_of_gen, what)
        if int(as_of_gen) > side_gen:
            raise ValueError(
                f"{what} codes are synced through gen {side_gen} and cannot "
                f"serve a snapshot at gen {as_of_gen}; re-run "
                f"build_{what}(spark)"
            )

    def knn_sq(self, spark: SparkSession, queries: DataFrame, k: int = 10,
               rerank: int = 0, pruned: bool = True, num_candidates: int = 2,
               qid_col: str = "qid", qvec_col: str = "qvec",
               where: str | None = None,
               as_of_gen: int | None = None) -> DataFrame:
        """Top-k over the SQ8 codes instead of the raw vectors — same
        LSH multi-probe pruning as knn(pruned=True) (candidate shards
        become partition-pruning predicates + per-query Arrow masks on
        the codes scan), but the scan reads 1 byte/dim. ``rerank=R``
        exact-rescored the R·k shortlist against the raw store (the
        FAISS refine pattern) — at 100 TB the raw floats are touched
        only for the ≤ nq·R·k shortlist ids.

        ``where`` (r9) filters with a SQL predicate over the RAW
        store's columns: matching ids are read once off the raw scan
        (predicate + id column pushed) and semi-joined into the codes
        scan BEFORE the shortlist cut — filter-then-rank, never
        score-then-discard, with the store-global trained bounds (a
        filter narrows candidates, it does not retrain the quantizer —
        the bm25_batch(allowed_ids=) contract). Shard partition
        pruning on the codes scan is unaffected (the semi-join sits
        above it). Results are a hard-constrained top-k among matching
        rows; exact filtered kNN at full budget (pinned in tests).

        ``as_of_gen`` (r9) serves the snapshot corpus at that pinned
        generation: codes rows carry the raw rows' ``_gen`` (build and
        the append sync both keep it), so the same
        ``tombstones.filter_as_of`` reconstruction applies to the
        codes scan, and the rerank probes the snapshot raw rows. Two
        validity bounds, both raising explicitly: the sidecar's
        ``built_gen`` floor (rows deleted before the build never
        reached the codes) and the sync horizon (the snapshot must be
        covered by synced codes)."""
        if not os.path.exists(self._sq_params_path):
            raise ValueError("no SQ sidecar: run build_sq(spark) first")
        with open(self._sq_params_path) as f:
            side = json.load(f)
        self._check_codes_gens(int(side.get("gen", 0)), as_of_gen, side, "sq")
        from distributedvectordatabase_spark.operators.knn import collect_query_batch
        from distributedvectordatabase_spark.operators.sq import sq_search

        params = self.sq_params()
        codes = self._sq_codes(spark, as_of_gen)
        cand_map = None
        if pruned:
            qrows = collect_query_batch(queries, qid_col, qvec_col)
            cand_map = {
                int(r[qid_col]): frozenset(
                    int(s) for s in self.lsh.candidate_shards(
                        list(r[qvec_col]), num_candidates=num_candidates
                    )
                )
                for r in qrows
            }
            all_shards = sorted({s for ss in cand_map.values() for s in ss})
            # literal IN-list → Catalyst partition pruning on _sq/
            codes = codes.filter(F.col("shard_id").isin(all_shards))
        if where is not None:
            codes = codes.join(
                self._allowed_ids(spark, where, as_of_gen),
                self.id_col, "left_semi",
            )
        return sq_search(
            codes, params, queries, k=k, id_col=self.id_col,
            qid_col=qid_col, qvec_col=qvec_col,
            rerank=rerank,
            corpus=self.read(spark, as_of_gen=as_of_gen) if rerank else None,
            vec_col=self.vec_col,
            shard_col="shard_id" if pruned else None, cand_map=cand_map,
        )

    # -- binary (1-bit) compressed sidecar ----------------------------------

    _BQ_KEEP = object()  # build_bq default: adopt the persisted config

    @locked_writer
    def build_bq(self, spark: SparkSession, n_bits=_BQ_KEEP,
                 seed=_BQ_KEEP, normalize=_BQ_KEEP) -> None:
        """Build (or rebuild) the binary codes sidecar: one projection
        scan packs each vector's sign bits into ceil(dim/32) bigint
        words (operators/bq.py), written as a shard-partitioned
        ``_bq/`` table — 64× fewer scan bytes than the float64 arrays,
        the cheapest first-pass scan on the compression ladder.

        Unlike SQ8 there are NO trained parameters (the pack is a pure
        function of the raw vector), so this sidecar deliberately has
        no append-sync path: a batch append bumps the store generation,
        knn_bq's staleness guard trips, and the fix is re-running this
        one cheap scan — simpler than the SQ bounds-sync machinery for
        a sidecar that costs a projection to regenerate.

        ``n_bits=B`` switches to B seeded sign-random-projections
        (super-bit codes) instead of raw-dimension signs — the scale
        path: identity signs give only dim+1 Hamming levels, which
        drowns the shortlist in ties at corpus scale (BASELINE.md:
        recall 0.16 at 500k×64-D identity vs 0.8+ at B=256). The
        (n_bits, seed) pair is persisted in the sidecar config and is
        AUTHORITATIVE at query time — knn_bq encodes queries from it,
        never from caller arguments, so a store reopened elsewhere
        cannot mis-encode (the r4 TextIndex reopen bug class). For the
        same reason a REBUILD with default arguments keeps the
        persisted config — a post-append refresh cannot silently
        switch a 256-bit store back to identity codes; pass n_bits
        explicitly to change the encoding.

        ``normalize=True`` declares the store's BQ domain NORMALIZED
        (cosine): knn_bq then reranks by cosine distance by default,
        so the angular Hamming shortlist and the final metric agree —
        the corpus where 1-bit codes actually earn their 64×
        (BASELINE.md: recall collapses when Hamming's angular order
        scores an L2 oracle on non-normalized data). The flag is
        persisted and reopen-authoritative like (n_bits, seed). It
        does NOT re-scale the stored codes: ``sign(x@R) ==
        sign((x/|x|)@R)``, so sign codes are scale-invariant by
        construction and no normalization pass (or persisted norm
        column) is needed — the flag changes what the RERANK means,
        which is the only place a norm could matter."""
        from distributedvectordatabase_spark.operators.bq import bq_encode

        if os.path.exists(self._sink_log_path):
            raise ValueError(
                "store is an active streaming sink (_spark_metadata "
                "present); run compact(spark) to finalize it before build_bq"
            )
        prev = {}
        if os.path.exists(self._bq_params_path):
            with open(self._bq_params_path) as f:
                prev = json.load(f)
        if n_bits is VectorStore._BQ_KEEP:
            n_bits = prev.get("n_bits")
        if seed is VectorStore._BQ_KEEP:
            seed = prev.get("seed", 42)
        if normalize is VectorStore._BQ_KEEP:
            normalize = bool(prev.get("normalize", False))
        live = self._read_live(spark)
        (
            bq_encode(live, self.lsh.dim, vec_col=self.vec_col,
                      n_bits=n_bits, seed=seed)
            .select(self.id_col, "bq_code", "shard_id", "_gen")
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(self._bq_path)
        )
        atomic_dump_json(
            self._bq_params_path,
            {"dim": self.lsh.dim, "gen": self._gen(),
             "n_bits": n_bits, "seed": int(seed),
             "normalize": bool(normalize),
             # snapshot floor: rows deleted before this build are
             # physically absent from the codes (r9)
             "built_gen": self._gen()},
        )

    def _bq_record_gen(self, gen: int) -> None:
        with open(self._bq_params_path) as f:
            side = json.load(f)
        side["gen"] = int(gen)
        atomic_dump_json(self._bq_params_path, side)

    def _bq_synced_gen(self) -> int:
        with open(self._bq_params_path) as f:
            return int(json.load(f).get("gen", 0))

    def knn_bq(self, spark: SparkSession, queries: DataFrame, k: int = 10,
               rerank: int = 2, pruned: bool = True, num_candidates: int = 2,
               qid_col: str = "qid", qvec_col: str = "qvec",
               metric: str | None = None,
               where: str | None = None,
               as_of_gen: int | None = None) -> DataFrame:
        """Top-k via the binary sidecar: Hamming shortlist of
        ``rerank·k`` candidates over the 1-bit codes (with the same LSH
        multi-probe pruning as knn(pruned=True): a literal shard
        IN-list prunes partitions, per-query shard sets mask inside the
        fan-out), then exact rerank against the raw store — rerank is
        mandatory because sign bits alone carry no usable distance
        scale. Returns (qid, neighbor_id, dist, rnk) like knn(); at
        full budget over an unpruned scan it EQUALS exact kNN in the
        same metric (pinned in tests).

        ``metric=None`` adopts the store's persisted domain: a
        ``build_bq(normalize=True)`` store reranks by cosine (the
        honest pairing — the Hamming shortlist is angular by
        construction), others by squared L2. Pass ``"l2sq"``/
        ``"cosine"`` to override per call.

        ``where`` / ``as_of_gen`` (r9): filtered and snapshot serving
        on the 1-bit leg, same contracts as :meth:`knn_sq` — matching
        ids semi-join into the codes scan BEFORE the Hamming shortlist
        (hard constraint, partition pruning unaffected), and snapshot
        reads reconstruct codes-as-of via the rows' ``_gen`` subject to
        the ``built_gen`` floor and the sync horizon (for this
        rebuild-don't-sync sidecar the two coincide)."""
        if not os.path.exists(self._bq_params_path):
            raise ValueError("no binary sidecar: run build_bq(spark) first")
        from distributedvectordatabase_spark.operators.bq import bq_encode, bq_topk
        from distributedvectordatabase_spark.operators.knn import (
            _dist_expr,
            collect_query_batch,
        )
        from distributedvectordatabase_spark.sources.tombstones import (
            filter_as_of,
            filter_live,
        )

        k = max(int(k), 1)
        fetch = max(int(rerank), 1) * k
        with open(self._bq_params_path) as f:
            side = json.load(f)
        self._check_codes_gens(int(side.get("gen", 0)), as_of_gen, side, "bq")
        if metric is None:
            metric = "cosine" if side.get("normalize") else "l2sq"
        from distributedvectordatabase_spark.sources.scan_cache import cached_parquet

        raw_codes = self._committed(cached_parquet(spark, self._bq_path))
        if as_of_gen is None:
            codes = filter_live(
                spark, raw_codes, self._tombstone_path, self.id_col
            )
        else:
            codes = filter_as_of(
                spark, raw_codes, self._tombstone_path, self.id_col, as_of_gen
            )
        shard_map = None
        if pruned:
            qrows = collect_query_batch(queries, qid_col, qvec_col)
            shard_map = {
                int(r[qid_col]): frozenset(
                    int(s) for s in self.lsh.candidate_shards(
                        list(r[qvec_col]), num_candidates=num_candidates
                    )
                )
                for r in qrows
            }
            all_shards = sorted({s for ss in shard_map.values() for s in ss})
            # literal IN-list → Catalyst partition pruning on _bq/
            codes = codes.filter(F.col("shard_id").isin(all_shards))
        if where is not None:
            codes = codes.join(
                self._allowed_ids(spark, where, as_of_gen),
                self.id_col, "left_semi",
            )
        # the persisted (n_bits, seed) are authoritative: queries MUST
        # be encoded exactly like the stored codes were
        qcodes = bq_encode(
            queries, self.lsh.dim, qvec_col, out_col="qcode",
            n_bits=side.get("n_bits"), seed=int(side.get("seed", 42)),
        )
        shortlist = bq_topk(
            codes, qcodes.select(qid_col, "qcode"), k=fetch,
            id_col=self.id_col, qid_col=qid_col,
            shard_map=shard_map,
        )
        raw = self.read(spark, as_of_gen=as_of_gen).select(
            F.col(self.id_col).alias("neighbor_id"), self.vec_col
        )
        rescored = (
            raw.join(F.broadcast(shortlist.select("qid", "neighbor_id")), "neighbor_id")
            .join(
                F.broadcast(
                    queries.select(
                        F.col(qid_col).alias("qid"), F.col(qvec_col).alias("_qvec")
                    )
                ),
                "qid",
            )
            .select(
                "qid",
                "neighbor_id",
                _dist_expr(metric, "_qvec", self.vec_col).alias("dist"),
            )
        )
        w = Window.partitionBy("qid").orderBy("dist", "neighbor_id")
        return (
            rescored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("qid", "neighbor_id", "dist", "rnk")
        )

    # -- read / query -------------------------------------------------------

    def _read_live(self, spark: SparkSession) -> DataFrame:
        """All live rows, ``_gen`` retained (internal; read() drops it).

        The tombstone side aggregates to one row per deleted id and is
        broadcast — deletes are rare relative to the corpus, and the
        join sits ABOVE the scan, so shard_id partition pruning and
        predicate pushdown on the store side are unaffected. If
        tombstones ever grow large, compact() folds them away.
        """
        from distributedvectordatabase_spark.sources.tombstones import filter_live

        from distributedvectordatabase_spark.sources.scan_cache import cached_parquet

        return filter_live(
            spark, self._committed(cached_parquet(spark, self.path)),
            self._tombstone_path, self.id_col,
        )

    def _committed(self, df: DataFrame) -> DataFrame:
        """Scan-level commit filter (tombstones.filter_committed): rows
        above the persisted gen (crashed/in-flight append) or in the
        aborted list are invisible to every read."""
        from distributedvectordatabase_spark.sources.tombstones import (
            filter_committed,
        )

        return filter_committed(df, self._gen(), self._aborted_gens())

    def current_gen(self) -> int:
        """The store's persisted write/delete generation — pin it when
        a training run starts and ``read(as_of_gen=...)`` reconstructs
        exactly the corpus that run saw (see tombstones.filter_as_of
        for the semantics and the compaction-bounded history caveat)."""
        return self._gen()

    def read(self, spark: SparkSession, as_of_gen: int | None = None) -> DataFrame:
        if as_of_gen is None:
            return self._read_live(spark).drop("_gen")
        from distributedvectordatabase_spark.sources.tombstones import filter_as_of

        # aborted gens were never committed at ANY point in history, so
        # the snapshot excludes them regardless of as_of_gen
        from distributedvectordatabase_spark.sources.scan_cache import cached_parquet

        return filter_as_of(
            spark, self._committed(cached_parquet(spark, self.path)),
            self._tombstone_path, self.id_col, as_of_gen,
        ).drop("_gen")

    def knn(self, spark: SparkSession, queries: DataFrame, k: int = 10, pruned: bool = True,
            num_candidates: int = 2, metric: str = "l2sq",
            as_of_gen: int | None = None, **kw) -> DataFrame:
        """``as_of_gen`` searches the snapshot corpus at that pinned
        generation (read(as_of_gen=...) semantics) — shard layout and
        LSH config are immutable across gens, so pruning stays exact."""
        from distributedvectordatabase_spark.operators.knn import knn, knn_pruned

        corpus = self.read(spark, as_of_gen=as_of_gen)
        if pruned:
            return knn_pruned(
                corpus, queries, self.lsh, k=k, num_candidates=num_candidates,
                metric=metric, id_col=self.id_col, vec_col=self.vec_col, **kw,
            )
        return knn(corpus, queries, k=k, metric=metric,
                   id_col=self.id_col, vec_col=self.vec_col, **kw)

    # -- stats (reference get_stats / get_system_stats) ---------------------

    def shard_stats(self, spark: SparkSession) -> DataFrame:
        """Per-shard stats record (reference shard/shard_node.py:147-185,
        minus the zero-vector 'sample ids' bug — we report id bounds)."""
        bytes_per_vec = 4 * self.lsh.dim  # float32 storage
        return (
            self.read(spark)
            .groupBy("shard_id")
            .agg(
                F.count("*").alias("total_vectors"),
                F.lit(self.lsh.dim).alias("dimension"),
                F.min(self.id_col).alias("min_id"),
                F.max(self.id_col).alias("max_id"),
            )
            .withColumn(
                "memory_usage_mb",
                F.round(F.col("total_vectors") * F.lit(bytes_per_vec) / (1024.0 * 1024.0), 6),
            )
            .orderBy("shard_id")
        )

    def system_stats(self, spark: SparkSession) -> DataFrame:
        """Global roll-up (reference coordinator_server.py:53-58)."""
        return self.shard_stats(spark).agg(
            F.sum("total_vectors").alias("total_vectors"),
            F.count("*").alias("num_shards"),
            F.max("dimension").alias("dimension"),
        )
