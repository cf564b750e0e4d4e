"""IVF (inverted-file) vector store — build-once / query-many ANN.

``operators/ann.py.ivf_knn`` fits KMeans per call, which is the honest
cold-start cost but not how an index is used. This store separates the
phases the way the reference separates index build from search
(shard/shard_node.py:51-99 build vs :101-133 search):

- **build**: distributed KMeans over the corpus → per-row cell
  assignment → Parquet ``partitionBy("cell_id")``; the tiny centroid
  matrix is persisted next to the data as JSON. At 100 TB the KMeans
  pass and the partitioned write are the only full scans.
- **query**: load centroids (KBs), rank cells per query driver-side,
  then ``cell_id IN (...)`` + per-query equi-join — Catalyst partition
  pruning skips the unprobed cells' files entirely, so query cost is
  ~n_probe/n_cells of a full scan, same shape as the LSH-pruned path.

Append ingest assigns new rows to the *existing* centroids (no refit),
matching standard IVF semantics; periodic rebuild is a caller policy.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from distributedvectordatabase_spark.sources.tombstones import (
    atomic_dump_json,
    locked_writer,
)

from distributedvectordatabase_spark.operators.knn import (
    _arrow_partial_topk,
    _dist_expr,
    _final_topk,
    _rescored_topk,
    collect_query_batch,
)


class IVFStore:
    def __init__(
        self,
        path: str,
        n_cells: int | None = None,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        meta_cols: tuple | None = None,
    ):
        self.path = path
        # reopening a built store: the persisted centroid sidecar's
        # n_cells / meta_cols are authoritative (same reopen contract
        # as VectorStore/_lsh.json); an explicit argument wins for
        # builds
        side: dict = {}
        cpath = os.path.join(path, "_centroids.json")
        if os.path.exists(cpath):
            with open(cpath) as f:
                side = json.load(f)
        self.n_cells = int(side["n_cells"]) if n_cells is None and side else (n_cells or 16)
        self.meta_cols = (
            tuple(side.get("meta_cols", ())) if meta_cols is None else tuple(meta_cols)
        )
        self.seed = seed
        self.id_col = id_col
        self.vec_col = vec_col

    @property
    def _centroid_path(self) -> str:
        return os.path.join(self.path, "_centroids.json")

    @property
    def _tombstone_path(self) -> str:
        return os.path.join(self.path, "_tombstones")

    def _gen(self) -> int:
        """Last persisted (committed) write/delete generation (see
        sources/tombstones.py for the ordering contract)."""
        if os.path.exists(self._centroid_path):
            with open(self._centroid_path) as f:
                return int(json.load(f).get("gen", 0))
        return 0

    def _aborted_gens(self) -> tuple:
        """Gens burned by crashed appends (tombstones.heal_pending) —
        their orphan rows are filtered from every read and reclaimed
        physically by compact()."""
        if os.path.exists(self._centroid_path):
            with open(self._centroid_path) as f:
                return tuple(json.load(f).get("aborted_gens", ()))
        return ()

    def ingest_batch(self) -> int:
        """Last streaming batch id whose append COMMITTED (recorded by
        the same sidecar dump that bumps gen — stream_ivf_ingest's
        exactly-once marker). -1 if the store never streamed."""
        if os.path.exists(self._centroid_path):
            with open(self._centroid_path) as f:
                return int(json.load(f).get("ingest_batch", -1))
        return -1

    # underscore-prefixed entries are invisible to spark.read.parquet
    # on self.path, so the compressed table and its codebook can live
    # inside the store directory without polluting the raw scan
    @property
    def _pq_path(self) -> str:
        return os.path.join(self.path, "_pq")

    @property
    def _pq_codebook_path(self) -> str:
        return os.path.join(self.path, "_pq_codebook.json")

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

    # -- build ---------------------------------------------------------------

    @locked_writer
    def build(
        self,
        df: DataFrame,
        split_threshold: float | None = None,
        max_split_rounds: int = 3,
    ) -> None:
        """Fit KMeans cells and write the cell-partitioned table.

        ``split_threshold=t`` bounds cell skew: KMeans minimizes SSE,
        not balance, so a dense region (one tight mode holding most of
        the mass) collapses into ONE cell — and at 100 TB a hot cell is
        a straggler scan on every probe that touches it (the same
        failure class as the MinHash hot band keys, which got a cap +
        audit in r5). After the initial fit, any cell holding more than
        ``t×`` the mean count is recursively re-fit: KMeans splits it
        into ``ceil(size/(t·mean))`` subcells, the parent centroid is
        replaced by the subcentroids, and ONE global nearest-centroid
        reassignment pass restores the store invariant (every row in
        its nearest cell — exactly what append/query assume), repeated
        up to ``max_split_rounds`` or until no cell exceeds the bound.
        Cost per round: one bounded per-cell fit per oversized cell +
        one matmul projection over the corpus — never an extra
        shuffle; the partitioned write at the end is unchanged. Audit
        via :meth:`cell_metrics` / :meth:`cell_distribution`; probed
        in tests + BASELINE.md on a planted-hot-mode corpus."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = df.select(
            self.id_col, self.vec_col, *self.meta_cols,
            array_to_vector(F.col(self.vec_col)).alias("_f"),
        )
        model = KMeans(
            k=self.n_cells, seed=self.seed, featuresCol="_f", predictionCol="cell_id"
        ).fit(feats)
        assigned = model.transform(feats).select(
            self.id_col, self.vec_col, *self.meta_cols, "cell_id"
        )
        centers = [list(map(float, np.asarray(c))) for c in model.clusterCenters()]
        if split_threshold is not None:
            assigned, centers = self._split_oversized(
                assigned, centers, float(split_threshold), int(max_split_rounds)
            )
            self.n_cells = len(centers)
        assigned = assigned.withColumn("_gen", F.lit(1))
        # the static overwrite drops the whole store dir, tombstones and
        # sidecars included — a rebuild starts a fresh delete history
        assigned.write.mode("overwrite").partitionBy("cell_id").parquet(self.path)
        radii = self._cell_radii_of(
            df.sparkSession.read.parquet(self.path), np.array(centers, dtype=np.float64)
        )
        atomic_dump_json(
            self._centroid_path,
            {"n_cells": self.n_cells, "seed": self.seed, "centers": centers,
             "gen": 1, "meta_cols": list(self.meta_cols), "radii": radii},
        )

    def _cell_radii_of(self, df: DataFrame, C: np.ndarray) -> list:
        """Per-cell radius (max member distance to the cell centroid) —
        one batched matmul + one tiny aggregation. The radii power the
        triangle-inequality cell bound in filtered search: any point of
        cell c is at least (||q - centroid_c|| - r_c) from q, so cells
        whose bound exceeds the current kth distance can be pruned
        EXACTLY instead of heuristically."""

        @F.pandas_udf("double")
        def cdist(vecs: pd.Series, cells: pd.Series) -> pd.Series:
            X = np.array(list(vecs.values), dtype=np.float64)
            cc = C[cells.to_numpy()]
            return pd.Series(np.sqrt(((X - cc) ** 2).sum(axis=1)))

        radii = [0.0] * len(C)
        for r in (
            df.select(F.col("cell_id"), cdist(F.col(self.vec_col), F.col("cell_id")).alias("_d"))
            .groupBy("cell_id")
            .agg(F.max("_d").alias("r"))
            .collect()
        ):
            radii[int(r["cell_id"])] = float(r["r"])
        return radii

    def cell_radii(self) -> np.ndarray | None:
        """Radii from the sidecar (None on stores built before radii
        existed — filtered search then falls back to fill-to-k).
        Deletes only shrink cells, so a stale radius stays a valid
        upper bound; appends extend it exactly (see append)."""
        with open(self._centroid_path) as f:
            side = json.load(f)
        return np.array(side["radii"], dtype=np.float64) if "radii" in side else None

    def _split_oversized(
        self,
        assigned: DataFrame,
        centers: list,
        t: float,
        max_rounds: int,
        keep_cols: tuple = (),
    ) -> tuple:
        """Recursive oversized-cell split (see build). Returns the
        rebalanced (assignment df, centers). Bounded driver state:
        per-round cell counts (O(n_cells) rows) and the centroid
        matrix. ``keep_cols`` ride through the reassignment unchanged
        (compact passes ``_gen`` so snapshot history survives a
        rebalance)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        if t <= 1.0:
            raise ValueError("split_threshold must exceed 1 (t x mean cells split)")
        assigned = assigned.localCheckpoint(eager=True)
        for rnd in range(max_rounds):
            sizes = {
                int(r["cell_id"]): int(r["n"])
                for r in assigned.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
            }
            total = sum(sizes.values())
            mean = total / max(len(centers), 1)
            oversized = sorted(c for c, s in sizes.items() if s > t * mean)
            if not oversized:
                break
            new_centers = [c for i, c in enumerate(centers) if i not in set(oversized)]
            for c in oversized:
                m = max(2, -(-sizes[c] // int(max(t * mean, 1))))
                sub = assigned.filter(F.col("cell_id") == c).select(
                    array_to_vector(F.col(self.vec_col)).alias("_f")
                )
                subm = KMeans(
                    k=min(m, sizes[c]), seed=self.seed + 1 + c, featuresCol="_f",
                    predictionCol="_sub",
                ).fit(sub)
                new_centers.extend(
                    [list(map(float, np.asarray(sc))) for sc in subm.clusterCenters()]
                )
            centers = new_centers
            # one global nearest-centroid pass: restores the invariant
            # every row sits in its nearest cell of the FINAL set
            C = np.array(centers, dtype=np.float64)

            @F.pandas_udf("int")
            def nearest(vecs: pd.Series) -> pd.Series:
                X = np.array(list(vecs.values), dtype=np.float64)
                d2 = (
                    (X ** 2).sum(1)[:, None]
                    - 2.0 * X @ C.T
                    + (C ** 2).sum(1)[None, :]
                )
                return pd.Series(d2.argmin(axis=1), dtype="int32")

            assigned = assigned.select(
                self.id_col, self.vec_col, *self.meta_cols, *keep_cols,
                nearest(F.col(self.vec_col)).alias("cell_id"),
            ).localCheckpoint(eager=True)
        return assigned, centers

    def centroids(self) -> np.ndarray:
        with open(self._centroid_path) as f:
            return np.array(json.load(f)["centers"], dtype=np.float64)

    # -- balance audit -------------------------------------------------------

    def cell_distribution(self, spark: SparkSession) -> DataFrame:
        """Per-cell live count + pct — the O15 shard analytics applied
        to IVF cells (one partial+final aggregation, no driver loop)."""
        from distributedvectordatabase_spark.operators.stats import shard_distribution

        return shard_distribution(self._read_live(spark), shard_col="cell_id")

    def cell_metrics(self, spark: SparkSession) -> DataFrame:
        """One-row balance audit (min/max/avg/CV/imbalance + quality
        bucket) over live cell counts — a hot cell here is a straggler
        scan at scale; rebuild with ``split_threshold`` to bound it."""
        from distributedvectordatabase_spark.operators.stats import distribution_metrics

        return distribution_metrics(self._read_live(spark), shard_col="cell_id")

    # -- ingest --------------------------------------------------------------

    @locked_writer
    def append(self, df: DataFrame, ingest_batch: int | None = None) -> None:
        """Assign new rows to the existing centroids (no refit) and
        append — the nearest-centroid math runs as a pandas_udf batch
        matmul, no shuffle beyond the partitioned write.

        Crash-atomic (tombstones.heal_pending two-phase protocol): the
        sidecar persists a ``pending_gen`` intent before any data job
        runs, and the final sidecar dump — one file write — commits the
        gen, clears the intent, and (for ``stream_ivf_ingest``) records
        ``ingest_batch`` in the same dump, so "batch committed" and
        "rows visible" are literally the same event. A crash anywhere
        in between leaves the orphan rows above the committed horizon
        (invisible to every read via filter_committed); the next writer
        heals the intent into ``aborted_gens`` and the replay lands
        under a fresh gen. ``compact()`` reclaims aborted rows
        physically."""
        from pyspark.sql.functions import pandas_udf

        from distributedvectordatabase_spark.sources.tombstones import (
            heal_pending,
            next_gen,
        )

        C = self.centroids()

        @pandas_udf("int")
        def nearest_cell(vecs: pd.Series) -> pd.Series:
            X = np.array(list(vecs.values), dtype=np.float64)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(d2.argmin(axis=1), dtype="int32")

        if os.path.exists(self._centroid_path):
            raw_cols = df.sparkSession.read.parquet(self.path).columns
            if "_gen" not in raw_cols:
                raise ValueError(
                    "store predates delete support (no _gen column); run "
                    "compact(spark) once to upgrade before appending"
                )
        with open(self._centroid_path) as f:
            side = json.load(f)
        side = heal_pending(side)
        gen = next_gen(side)
        # phase 1: persist the write intent BEFORE any data job — a
        # crash from here on leaves rows that no read will ever see
        side["pending_gen"] = gen
        atomic_dump_json(self._centroid_path, side)
        out = df.select(self.id_col, self.vec_col, *self.meta_cols).withColumn(
            "cell_id", nearest_cell(F.col(self.vec_col))
        ).withColumn("_gen", F.lit(gen))
        has_pq = os.path.exists(self._pq_codebook_path)
        has_sq = os.path.exists(self._sq_params_path)
        has_bq = os.path.exists(self._bq_params_path)
        old_radii = self.cell_radii()
        # pin the assigned batch so the raw write, the codes writes and
        # the radius aggregation all see the SAME rows — without this,
        # a non-deterministic input (stream batch, sample, generated
        # ids) would be recomputed per action and the tables could
        # silently diverge
        out = out.cache()
        if old_radii is not None:
            # widen the radii BEFORE the data lands: a too-large radius
            # is merely conservative for the filtered-search bound, but
            # a crash between the data write and a later radius update
            # would leave radii too SMALL — and wrongly prune cells
            # holding the new rows
            batch = self._cell_radii_of(out, self.centroids())
            merged = [max(a, b) for a, b in zip(old_radii.tolist(), batch)]
            with open(self._centroid_path) as f:
                side = json.load(f)
            side["radii"] = merged
            atomic_dump_json(self._centroid_path, side)
        out.write.mode("append").partitionBy("cell_id").parquet(self.path)
        # keep the IVFPQ codes table in sync: new rows are encoded with
        # the EXISTING codebook (standard IVFPQ ingest — codes are only
        # as good as the codebook, so periodic build_pq refresh is a
        # caller policy, same as centroid rebuild). A failure in any of
        # these writes aborts the append BEFORE the phase-2 commit, so
        # both the raw rows and any partial codes stay invisible
        # orphans (healed on the next write, reclaimed by compact) —
        # the two tables can never serve out of sync.
        try:
            if has_pq:
                from distributedvectordatabase_spark.operators.pq import pq_encode

                (
                    pq_encode(out, self.pq_codebook(), id_col=self.id_col,
                              vec_col=self.vec_col, keep_cols=("cell_id", "_gen"),
                              cell_centroids=C if self.pq_is_residual() else None,
                              rotation=self.pq_rotation())
                    .write.mode("append")
                    .partitionBy("cell_id")
                    .parquet(self._pq_path)
                )
            if has_sq:
                from distributedvectordatabase_spark.operators.sq import sq_encode

                (
                    sq_encode(out, self.sq_params(), id_col=self.id_col,
                              vec_col=self.vec_col, keep_cols=("cell_id", "_gen"))
                    .write.mode("append")
                    .partitionBy("cell_id")
                    .parquet(self._sq_path)
                )
            if has_bq:
                from distributedvectordatabase_spark.operators.bq import bq_encode

                # the persisted (n_bits, seed) are authoritative — new
                # codes must be bit-compatible with the stored ones
                with open(self._bq_params_path) as f:
                    bside = json.load(f)
                (
                    bq_encode(out, int(bside["dim"]), vec_col=self.vec_col,
                              n_bits=bside.get("n_bits"),
                              seed=int(bside.get("seed", 42)))
                    .select(self.id_col, "bq_code", "cell_id", "_gen")
                    .write.mode("append")
                    .partitionBy("cell_id")
                    .parquet(self._bq_path)
                )
        finally:
            out.unpersist()
        # phase 2 — THE commit: one sidecar dump bumps gen, clears the
        # intent, and stamps the ingest batch id; rows become visible
        # and the streaming marker advances in the same file write
        with open(self._centroid_path) as f:
            side = json.load(f)
        side["gen"] = int(gen)
        side["pending_gen"] = None
        if ingest_batch is not None:
            side["ingest_batch"] = int(ingest_batch)
        atomic_dump_json(self._centroid_path, side)

    @locked_writer
    def compact(
        self,
        spark: SparkSession,
        files_per_cell: int = 1,
        split_threshold: float | None = None,
        max_split_rounds: int = 3,
    ) -> None:
        """Rewrite each cell into ``files_per_cell`` files. Appends leave
        one file per (batch, writer task); compaction restores the
        build-time layout. Same crash-safety as VectorStore.compact:
        the new copy is complete before the old one is removed.

        ``split_threshold=t`` rebalances while it rewrites (r7, VERDICT
        r6 #5): ``build(split_threshold=)`` bounds hot cells at build
        time, but streamed/batch appends assign to FROZEN centroids, so
        a drifting ingest re-skews cells — and at 100 TB a hot cell is
        a straggler on every probe that routes to it. The same
        recursive split (:meth:`_split_oversized`) runs over the live
        rows (``_gen`` rides through, so snapshot history survives),
        the sidecar adopts the new centroid set with exact recomputed
        radii, and the PQ/SQ/BQ code tables re-encode from the
        rewritten rows under their EXISTING trained params (codebook /
        bounds / bit config are corpus-level artifacts, untouched by a
        re-cell; residual PQ codes re-derive against the new centroids,
        which is what knn_pq decodes against). Full-probe search is
        invariant under any cell layout, so n_probe=n_cells results
        stay pinned equal to exact — asserted in tests."""
        import shutil

        tmp = self.path.rstrip("/") + "__compacting"
        with open(self._centroid_path) as f:
            side = json.load(f)
        live = self._read_live(spark)
        if split_threshold is not None:
            live, centers = self._split_oversized(
                live, side["centers"], float(split_threshold),
                int(max_split_rounds), keep_cols=("_gen",),
            )
            self.n_cells = len(centers)
            side["centers"] = centers
            side["n_cells"] = self.n_cells
        spread = (F.abs(F.hash(self.id_col)) % files_per_cell).alias("_spread")
        (
            live
            .repartition(self.n_cells * files_per_cell, F.col("cell_id"), spread)
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(tmp)
        )
        if split_threshold is not None and "radii" in side:
            # cells changed: exact radii over the final layout (the
            # no-split path keeps the old radii — deletes only shrink
            # cells, so they remain valid upper bounds for free)
            side["radii"] = self._cell_radii_of(
                spark.read.parquet(tmp),
                np.array(side["centers"], dtype=np.float64),
            )
        # the centroid sidecar lives inside the store dir — carry it
        # over, along with the IVFPQ sidecars if built. Tombstones are
        # NOT carried: this rewrite folds them into both tables (live
        # codes rewritten below), so the swap is the physical delete.
        # Aborted/pending gens clear too — the live rewrite just
        # dropped their orphan rows physically.
        side["aborted_gens"] = []
        side["pending_gen"] = None
        atomic_dump_json(os.path.join(tmp, os.path.basename(self._centroid_path)), side)
        rebal = live if split_threshold is not None else None
        if os.path.exists(self._pq_path):
            if rebal is not None:
                from distributedvectordatabase_spark.operators.pq import pq_encode

                C = np.array(side["centers"], dtype=np.float64)
                codes = pq_encode(
                    rebal, self.pq_codebook(), id_col=self.id_col,
                    vec_col=self.vec_col, keep_cols=("cell_id", "_gen"),
                    cell_centroids=C if self.pq_is_residual() else None,
                    rotation=self.pq_rotation(),
                )
            else:
                codes = self._codes_live(spark)
            (
                codes.write.mode("overwrite")
                .partitionBy("cell_id")
                .parquet(os.path.join(tmp, os.path.basename(self._pq_path)))
            )
        if os.path.exists(self._pq_codebook_path):
            shutil.copy(
                self._pq_codebook_path,
                os.path.join(tmp, os.path.basename(self._pq_codebook_path)),
            )
        if os.path.exists(self._sq_params_path):
            if rebal is not None:
                from distributedvectordatabase_spark.operators.sq import sq_encode

                codes = sq_encode(
                    rebal, self.sq_params(), id_col=self.id_col,
                    vec_col=self.vec_col, keep_cols=("cell_id", "_gen"),
                )
            else:
                codes = self._sq_codes_live(spark)
            (
                codes.write.mode("overwrite")
                .partitionBy("cell_id")
                .parquet(os.path.join(tmp, os.path.basename(self._sq_path)))
            )
            shutil.copy(
                self._sq_params_path,
                os.path.join(tmp, os.path.basename(self._sq_params_path)),
            )
        if os.path.exists(self._bq_params_path):
            if rebal is not None:
                from distributedvectordatabase_spark.operators.bq import bq_encode

                with open(self._bq_params_path) as f:
                    bside = json.load(f)
                codes = bq_encode(
                    rebal, int(bside["dim"]), vec_col=self.vec_col,
                    n_bits=bside.get("n_bits"),
                    seed=int(bside.get("seed", 42)),
                ).select(self.id_col, "bq_code", "cell_id", "_gen")
            else:
                codes = self._bq_codes_live(spark)
            (
                codes.write.mode("overwrite")
                .partitionBy("cell_id")
                .parquet(os.path.join(tmp, os.path.basename(self._bq_path)))
            )
            shutil.copy(
                self._bq_params_path,
                os.path.join(tmp, os.path.basename(self._bq_params_path)),
            )
        shutil.rmtree(self.path)
        shutil.move(tmp, self.path)

    # -- IVFPQ ---------------------------------------------------------------

    def _residual_df(self, df: DataFrame, MU: np.ndarray) -> DataFrame:
        """(id, _resid) — residual vectors as a column, for fitting the
        OPQ rotation in residual space. One Arrow pass, no shuffle."""
        from pyspark.sql.functions import pandas_udf

        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(MU)

        @pandas_udf("array<double>")
        def resid(vecs: pd.Series, cells: pd.Series) -> pd.Series:
            M = bc.value
            X = np.array(list(vecs.values), dtype=np.float64)
            X = X - M[cells.values.astype(np.int64)]
            return pd.Series(list(X))

        return df.select(
            self.id_col, resid(F.col(self.vec_col), F.col("cell_id")).alias("_resid")
        )

    @locked_writer
    def build_pq(
        self,
        spark: SparkSession,
        m: int = 16,
        nbits: int = 6,
        residual: bool = True,
        opq: bool = False,
    ) -> None:
        """Train PQ codebooks over the built store and write the
        compressed (id, codes) table, cell-partitioned like the raw
        one — together they form an IVFPQ index: cell routing prunes
        partitions, ADC scans only codes, rerank probes raw vectors
        for the shortlist ids alone. ``append`` keeps the codes table
        in sync by encoding new rows with the existing codebook;
        re-run build_pq to refresh codebooks after heavy drift.

        ``residual=True`` (default — the standard IVFPQ formulation,
        Jégou et al. §IV-A / FAISS IndexIVFPQ) trains and encodes the
        residual ``x - centroid[cell]`` instead of the raw vector:
        per-cell residuals span a much smaller domain than the corpus,
        so the same m·nbits budget loses less to quantization and ADC
        recall rises (see tests/test_ivf_store.py raw-vs-residual
        comparison). ``residual=False`` keeps the raw-vector encoding
        for A/B measurement.

        ``opq=True`` additionally fits an orthogonal PCA rotation (on
        the residuals when ``residual``, else the raw vectors —
        operators/opq.fit_rotation) and trains/encodes in that basis:
        OPQ-IVFPQ-lite (Ge et al. CVPR 2013, PCA-initialized variant).
        The rotation is L2-preserving, so distances and rerank
        semantics are unchanged — only quantization error drops. The
        matrix persists in the codebook sidecar; append/knn_pq apply
        it automatically."""
        import json as _json

        from distributedvectordatabase_spark.operators.pq import pq_encode, pq_train

        # live rows only, _gen retained: the codes table mirrors the raw
        # rows' generations so later deletes filter both tables alike
        df = self._read_live(spark)
        MU = self.centroids() if residual else None
        R = None
        if opq:
            from distributedvectordatabase_spark.operators.opq import fit_rotation

            base = (
                self._residual_df(df, MU).withColumnRenamed("_resid", "_fitvec")
                if residual
                else df.select(self.id_col, F.col(self.vec_col).alias("_fitvec"))
            )
            R = fit_rotation(base, vec_col="_fitvec", id_col=self.id_col, m=m)
        cb = pq_train(df, vec_col=self.vec_col, m=m, nbits=nbits,
                      id_col=self.id_col, cell_centroids=MU, rotation=R)
        (
            pq_encode(df, cb, id_col=self.id_col, vec_col=self.vec_col,
                      keep_cols=("cell_id", "_gen"), cell_centroids=MU, rotation=R)
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(self._pq_path)
        )
        # built_gen: the snapshot floor — rows deleted before this build
        # are physically absent from the codes (r9)
        side = {**cb.to_dict(), "residual": bool(residual),
                "built_gen": self._gen()}
        if R is not None:
            side["rotation"] = R.tolist()
        atomic_dump_json(self._pq_codebook_path, side)

    def pq_codebook(self):
        import json as _json

        from distributedvectordatabase_spark.operators.pq import PQCodebook

        with open(self._pq_codebook_path) as f:
            return PQCodebook.from_dict(_json.load(f))

    def pq_is_residual(self) -> bool:
        import json as _json

        with open(self._pq_codebook_path) as f:
            return bool(_json.load(f).get("residual", False))

    def pq_rotation(self) -> np.ndarray | None:
        import json as _json

        with open(self._pq_codebook_path) as f:
            r = _json.load(f).get("rotation")
        return np.array(r, dtype=np.float64) if r is not None else None

    # -- IVF-SQ8 -------------------------------------------------------------

    @locked_writer
    def build_sq(self, spark: SparkSession) -> None:
        """Build (or rebuild) the SQ8 codes sidecar: exact per-dim
        min/max bounds over the live rows, one encode scan into a
        cell-partitioned ``_sq/`` table (1 byte/dim) — together with
        the centroids this is FAISS IndexIVFScalarQuantizer: cell
        routing prunes partitions, the asymmetric scan reads only
        codes, rerank probes raw vectors for the shortlist ids alone.
        The practical high-D recipe when PQ's sub-byte codes lose to
        distance concentration (BASELINE.md: SQ8 holds recall 1.0 at
        512-D iid gaussian where PQ ADC drops to 0.11). ``append``
        keeps the codes in sync with the existing bounds."""
        from distributedvectordatabase_spark.operators.sq import sq_encode, sq_train

        df = self._read_live(spark)
        params = sq_train(df, vec_col=self.vec_col)
        (
            sq_encode(df, params, id_col=self.id_col, vec_col=self.vec_col,
                      keep_cols=("cell_id", "_gen"))
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(self._sq_path)
        )
        # built_gen: snapshot floor (r9) — see build_pq
        atomic_dump_json(
            self._sq_params_path,
            {**params.to_dict(), "built_gen": self._gen()},
        )

    def sq_params(self):
        from distributedvectordatabase_spark.operators.sq import SQParams

        with open(self._sq_params_path) as f:
            return SQParams.from_dict(json.load(f))

    def _sq_codes_live(self, spark: SparkSession) -> DataFrame:
        return self._any_codes(spark, self._sq_path)

    def knn_sq(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        rerank: int = 2,
        qid_col: str = "qid",
        qvec_col: str = "qvec",
        where: str | None = None,
        as_of_gen: int | None = None,
    ) -> DataFrame:
        """IVF-SQ8 search: probe the ``n_probe`` nearest cells
        (partition pruning on the codes table), asymmetric-scan only
        those cells' 1-byte/dim codes with a per-query cell mask, then
        exact-rerank the shortlist against the raw vectors of the same
        probed cells. ``rerank=0`` returns the SQ-estimate distances.

        ``where``/``as_of_gen`` (r9): filtered + snapshot serving on
        the compressed leg. Matching ids are read once off the raw
        table (predicate + id pushed next to the same cell pruning;
        ``build(meta_cols=)`` co-locates the metadata) and semi-joined
        into the codes scan BEFORE the shortlist cut — a hard
        constraint with store-global trained bounds, never
        score-then-discard. A snapshot read reconstructs codes-as-of
        via the rows' ``_gen`` (appends sync inline), floor-checked
        against the sidecar's ``built_gen``. NOTE: unlike the raw
        ``knn(where=)``, the compressed leg does not escalate — a
        selective filter inside few probed cells may return under k
        rows; widen ``n_probe`` or use the raw leg for exactness."""
        n_probe = max(int(n_probe), 1)  # 0 probes nothing and would silently return empty
        from distributedvectordatabase_spark.operators.sq import sq_search

        self._check_codes_snapshot(self._sq_params_path, as_of_gen, "sq")
        C = self.centroids()
        qrows = collect_query_batch(queries, qid_col, qvec_col)
        cand_map: dict[int, frozenset] = {}
        for r in qrows:
            qv = np.asarray(list(r[qvec_col]), dtype=np.float64)
            order = np.argsort(((C - qv) ** 2).sum(axis=1))[:n_probe]
            cand_map[int(r[qid_col])] = frozenset(int(c) for c in order)
        probed = sorted({c for s in cand_map.values() for c in s})
        codes = self._any_codes(spark, self._sq_path, as_of_gen).drop(
            "_gen"
        ).filter(F.col("cell_id").isin(probed))
        if where is not None:
            codes = codes.join(
                self._allowed_ids(spark, where, as_of_gen),
                self.id_col, "left_semi",
            )
        corpus = self.read(spark, as_of_gen=as_of_gen).filter(
            F.col("cell_id").isin(probed)
        )
        return sq_search(
            codes, self.sq_params(), queries, k=k,
            id_col=self.id_col, qid_col=qid_col, qvec_col=qvec_col,
            rerank=rerank, corpus=corpus if rerank else None,
            vec_col=self.vec_col, shard_col="cell_id", cand_map=cand_map,
        )

    def knn_pq(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        rerank: int = 4,
        qid_col: str = "qid",
        qvec_col: str = "qvec",
        where: str | None = None,
        as_of_gen: int | None = None,
    ) -> DataFrame:
        """IVFPQ search: probe the ``n_probe`` nearest cells (partition
        pruning on the compressed table), ADC-scan only those cells'
        codes with a per-query cell mask, then exact-rerank the
        shortlist against the raw vectors of the same probed cells —
        both probes prune partitions, and the float column is read only
        for ≤ nq·rerank·k shortlist rows. ``rerank=0`` returns raw ADC
        distances. ``where``/``as_of_gen``: filtered + snapshot
        serving, same contracts and non-escalation caveat as
        :meth:`knn_sq`."""
        n_probe = max(int(n_probe), 1)  # 0 probes nothing and would silently return empty
        from distributedvectordatabase_spark.operators.pq import pq_search

        self._check_codes_snapshot(self._pq_codebook_path, as_of_gen, "pq")
        C = self.centroids()
        qrows = collect_query_batch(queries, qid_col, qvec_col)
        cand_map: dict[int, frozenset] = {}
        for r in qrows:
            qv = np.asarray(list(r[qvec_col]), dtype=np.float64)
            order = np.argsort(((C - qv) ** 2).sum(axis=1))[:n_probe]
            cand_map[int(r[qid_col])] = frozenset(int(c) for c in order)
        probed = sorted({c for s in cand_map.values() for c in s})
        codes = self._any_codes(spark, self._pq_path, as_of_gen).drop(
            "_gen"
        ).filter(F.col("cell_id").isin(probed))
        if where is not None:
            codes = codes.join(
                self._allowed_ids(spark, where, as_of_gen),
                self.id_col, "left_semi",
            )
        corpus = self.read(spark, as_of_gen=as_of_gen).filter(
            F.col("cell_id").isin(probed)
        )
        return pq_search(
            codes, self.pq_codebook(), queries, k=k,
            id_col=self.id_col, qid_col=qid_col, qvec_col=qvec_col,
            rerank=rerank, corpus=corpus, vec_col=self.vec_col,
            shard_col="cell_id", cand_map=cand_map,
            cell_centroids=C if self.pq_is_residual() else None,
            rotation=self.pq_rotation(),
        )

    # -- IVF-BQ ----------------------------------------------------------------

    _BQ_KEEP = object()  # build_bq default: adopt the persisted config

    @locked_writer
    def build_bq(self, spark: SparkSession, n_bits=_BQ_KEEP,
                 seed=_BQ_KEEP, normalize=_BQ_KEEP) -> None:
        """Build (or rebuild) the binary codes sidecar inside the IVF
        layout: one projection scan packs sign bits into ceil(bits/32)
        bigint words (operators/bq.py), written cell-partitioned to
        ``_bq/`` — FAISS ``IndexBinaryIVF`` shape: cell routing prunes
        partitions, the Hamming scan reads 1 bit/dim, exact rerank
        touches raw vectors only for the shortlist. This completes the
        compression matrix — flat {exact, SQ8, BQ} × IVF {exact, PQ,
        SQ8, BQ} — so the cheapest first-pass scan also gets the
        ~n_probe/n_cells IO cut.

        Config semantics mirror ``VectorStore.build_bq``: the
        (n_bits, seed, normalize) triple is persisted and AUTHORITATIVE
        at query time (queries are encoded from it, never from caller
        args), and a default-argument rebuild keeps the persisted
        config. One deliberate difference: ``append`` here keeps the
        codes table in sync inline (the PQ/SQ pattern — the encode is a
        pure function of the persisted params), so there is no
        staleness generation to guard and streamed stores
        (``stream_ivf_ingest``) stay BQ-queryable without a rebuild."""
        from distributedvectordatabase_spark.operators.bq import bq_encode

        prev = {}
        if os.path.exists(self._bq_params_path):
            with open(self._bq_params_path) as f:
                prev = json.load(f)
        if n_bits is IVFStore._BQ_KEEP:
            n_bits = prev.get("n_bits")
        if seed is IVFStore._BQ_KEEP:
            seed = prev.get("seed", 42)
        if normalize is IVFStore._BQ_KEEP:
            normalize = bool(prev.get("normalize", False))
        dim = int(self.centroids().shape[1])
        (
            bq_encode(self._read_live(spark), dim, vec_col=self.vec_col,
                      n_bits=n_bits, seed=int(seed))
            .select(self.id_col, "bq_code", "cell_id", "_gen")
            .write.mode("overwrite")
            .partitionBy("cell_id")
            .parquet(self._bq_path)
        )
        atomic_dump_json(
            self._bq_params_path,
            {"dim": dim,
             "n_bits": None if n_bits is None else int(n_bits),
             "seed": int(seed), "normalize": bool(normalize),
             # snapshot floor (r9) — see build_pq
             "built_gen": self._gen()},
        )

    def _bq_codes_live(self, spark: SparkSession) -> DataFrame:
        return self._any_codes(spark, self._bq_path)

    def knn_bq(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        rerank: int = 2,
        qid_col: str = "qid",
        qvec_col: str = "qvec",
        metric: str | None = None,
        where: str | None = None,
        as_of_gen: int | None = None,
    ) -> DataFrame:
        """IVF-BQ search: probe the ``n_probe`` nearest cells (literal
        IN-list → Catalyst partition pruning on the 1-bit codes table),
        Hamming-scan only those cells with a per-query cell mask inside
        the join-free fan-out (bq_topk's shard_map), then exact-rerank
        the ``rerank·k`` shortlist against the raw vectors of the same
        probed cells. Rerank is mandatory — sign bits alone carry no
        usable distance scale.

        ``metric=None`` adopts the persisted domain: a
        ``build_bq(normalize=True)`` store reranks by cosine (the
        honest pairing — the Hamming shortlist is angular by
        construction), others by squared L2. Returns
        (qid, neighbor_id, dist, rnk), the knn() shape.
        ``where``/``as_of_gen``: filtered + snapshot serving, same
        contracts and non-escalation caveat as :meth:`knn_sq`."""
        n_probe = max(int(n_probe), 1)  # 0 probes nothing and would silently return empty
        from distributedvectordatabase_spark.operators.bq import bq_encode, bq_topk

        if not os.path.exists(self._bq_params_path):
            raise ValueError("no binary sidecar: run build_bq(spark) first")
        self._check_codes_snapshot(self._bq_params_path, as_of_gen, "bq")
        with open(self._bq_params_path) as f:
            side = json.load(f)
        if metric is None:
            metric = "cosine" if side.get("normalize") else "l2sq"
        k = max(int(k), 1)
        fetch = max(int(rerank), 1) * k
        C = self.centroids()
        qrows = collect_query_batch(queries, qid_col, qvec_col)
        cand_map: dict[int, frozenset] = {}
        for r in qrows:
            qv = np.asarray(list(r[qvec_col]), dtype=np.float64)
            order = np.argsort(((C - qv) ** 2).sum(axis=1))[:n_probe]
            cand_map[int(r[qid_col])] = frozenset(int(c) for c in order)
        probed = sorted({c for s in cand_map.values() for c in s})
        codes = self._any_codes(spark, self._bq_path, as_of_gen).drop(
            "_gen"
        ).filter(F.col("cell_id").isin(probed))
        if where is not None:
            codes = codes.join(
                self._allowed_ids(spark, where, as_of_gen),
                self.id_col, "left_semi",
            )
        # persisted (n_bits, seed) are authoritative for query encoding
        qcodes = bq_encode(
            queries, int(side["dim"]), qvec_col, out_col="qcode",
            n_bits=side.get("n_bits"), seed=int(side.get("seed", 42)),
        )
        shortlist = bq_topk(
            codes, qcodes.select(qid_col, "qcode"), k=fetch,
            id_col=self.id_col, qid_col=qid_col,
            shard_map=cand_map, shard_col="cell_id",
        )
        raw = (
            self.read(spark, as_of_gen=as_of_gen)
            .filter(F.col("cell_id").isin(probed))
            .select(F.col(self.id_col).alias("neighbor_id"), self.vec_col)
        )
        rescored = (
            raw.join(
                F.broadcast(shortlist.select("qid", "neighbor_id")), "neighbor_id"
            )
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

    # -- delete / upsert -----------------------------------------------------

    @locked_writer
    def delete(self, spark: SparkSession, ids) -> None:
        """Merge-on-read delete (same mechanics as VectorStore.delete —
        see sources/tombstones.py): tombstones filter BOTH the raw
        table and the PQ codes table, so ADC shortlists never spend
        slots on dead ids and ``rerank=0`` results stay correct.
        ``compact()`` folds both tables physically."""
        from distributedvectordatabase_spark.sources.tombstones import (
            append_tombstones,
            heal_pending,
            next_gen,
        )

        with open(self._centroid_path) as f:
            side = json.load(f)
        # heal any crashed append first: its orphan rows must move to
        # aborted_gens BEFORE this delete bumps the committed horizon
        # past them, or they would surface as committed rows
        side = heal_pending(side)
        gen = next_gen(side)
        side["gen"] = int(gen)  # gen durable BEFORE its tombstones exist
        atomic_dump_json(self._centroid_path, side)
        append_tombstones(spark, self._tombstone_path, self.id_col, ids, gen)

    @locked_writer
    def delete_where(self, spark: SparkSession, predicate) -> int:
        """Predicate delete (VectorStore.delete_where parity — r7):
        tombstone every LIVE row matching ``predicate`` (a Column or a
        SQL string), typically over the co-located metadata columns
        (``build(meta_cols=...)``) — retention sweeps and policy
        take-downs by attribute, not id list. Returns the number of
        ids tombstoned. One scan to find the ids; the delete itself
        stays O(deleted)."""
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        # pin the matching ids BEFORE tombstoning: the tombstone write
        # must not re-execute a plan that reads the tombstone dir it
        # is appending to (self-referential read-under-write)
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
    def upsert(self, df: DataFrame) -> None:
        """Replace-by-id: tombstone the incoming ids, then append (the
        new rows' gen out-ranks the tombstone). Codes stay in sync via
        append's encode path."""
        self.delete(df.sparkSession, df.select(self.id_col))
        self.append(df)

    # -- query ---------------------------------------------------------------

    def _committed(self, df: DataFrame) -> DataFrame:
        """Scan-level commit filter: rows above the persisted gen
        (in-flight or crashed append) and aborted-gen orphans are
        invisible — both literal pushdown predicates, applied under
        every read BEFORE the tombstone anti-join."""
        from distributedvectordatabase_spark.sources.tombstones import (
            filter_committed,
        )

        return filter_committed(df, self._gen(), self._aborted_gens())

    def _read_live(self, spark: SparkSession) -> DataFrame:
        from distributedvectordatabase_spark.sources.tombstones import filter_live

        from distributedvectordatabase_spark.sources.scan_cache import cached_parquet

        return filter_live(
            spark, self._committed(cached_parquet(spark, self.path)),
            self._tombstone_path, self.id_col,
        )

    def _codes_live(self, spark: SparkSession) -> DataFrame:
        return self._any_codes(spark, self._pq_path)

    def _any_codes(
        self, spark: SparkSession, path: str, as_of_gen: int | None = None
    ) -> DataFrame:
        """Shared codes-table read for the PQ/SQ/BQ sidecars: committed
        rows, tombstone-filtered live or reconstructed as-of (codes
        rows carry the raw rows' ``_gen`` — build keeps it, append
        syncs it inline)."""
        from distributedvectordatabase_spark.sources.tombstones import (
            filter_as_of,
            filter_live,
        )

        from distributedvectordatabase_spark.sources.scan_cache import cached_parquet

        df = self._committed(cached_parquet(spark, path))
        if as_of_gen is None:
            return filter_live(spark, df, self._tombstone_path, self.id_col)
        return filter_as_of(
            spark, df, self._tombstone_path, self.id_col, as_of_gen
        )

    def _allowed_ids(
        self, spark: SparkSession, where: str, as_of_gen: int | None
    ) -> DataFrame:
        """(id) rows matching a metadata predicate — one pass over the
        raw table (predicate + id column pushed; ``build(meta_cols=)``
        co-locates the metadata), semi-joined into a compressed codes
        scan BEFORE its shortlist (the bm25_batch(allowed_ids=)
        hard-constraint contract)."""
        return (
            self.read(spark, as_of_gen=as_of_gen)
            .filter(where)
            .select(self.id_col)
        )

    def _check_codes_snapshot(self, side_path: str, as_of_gen: int | None,
                              what: str) -> None:
        """Snapshot floor for a compressed leg (r9): appends sync codes
        inline (a pure function of persisted params), so the only
        unreconstructable history is rows deleted before the sidecar's
        (re)build — tombstones.check_codes_snapshot_floor."""
        if as_of_gen is None:
            return
        from distributedvectordatabase_spark.sources.tombstones import (
            check_codes_snapshot_floor,
        )

        with open(side_path) as f:
            check_codes_snapshot_floor(json.load(f), as_of_gen, what)

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
            spark,
            self._committed(cached_parquet(spark, self.path)),
            self._tombstone_path,
            self.id_col, as_of_gen,
        ).drop("_gen")

    def knn(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        metric: str = "l2sq",
        qid_col: str = "qid",
        qvec_col: str = "qvec",
        impl: str = "arrow",
        rescore: str = "auto",
        where: str | None = None,
        escalate: bool = True,
        as_of_gen: int | None = None,
    ) -> DataFrame:
        """Probe the ``n_probe`` nearest cells per query; partition
        pruning limits the scan to probed cells' directories.
        ``as_of_gen`` searches the snapshot corpus at that pinned
        generation (read(as_of_gen=...) semantics) — centroids and cell
        layout are fixed between compactions, so pruning stays exact.

        ``impl="arrow"`` (default) scores the probed rows on the same
        BLAS partial-top-k scan as exact/pruned kNN with a per-query
        cell mask — the interpreted ``aggregate/zip_with`` expression
        path (``impl="expr"``) is ~25× slower per pair at 500k rows
        (BASELINE.md scale probe) and kept only as the plan-shape
        reference.

        ``where`` is a SQL predicate over the store's metadata columns
        (``build(..., meta_cols=...)`` co-locates them with the
        vectors): the filter is applied to the probed scan itself, so
        Catalyst pushes it to the parquet reader NEXT TO the cell
        pruning — pre-filtering, the 100 TB shape, never
        score-then-discard over unfiltered candidates. Because a
        selective predicate can starve a probe (the k nearest matching
        rows may live outside the probed cells), ``escalate=True``
        re-runs the starved queries with the probe count doubled. A
        query is starved while it has under k rows, OR — for l2sq on a
        store with radius sidecars — while some unprobed cell's
        triangle-inequality bound ``(||q-c|| - r_c)^2`` still
        undercuts its kth distance; with that bound the loop
        terminates only when no unprobed cell can possibly hold a
        closer match, so the escalated result is EXACT filtered kNN
        over the live store, at a scan cost that stays proportional to
        the probed cells. (Other metrics / radius-less stores fall
        back to fill-to-k, which guarantees k rows but not exactness.)
        Driver state stays bounded: the loop inspects at most
        (batch x k) result rows and O(n_cells) bounds per round, never
        corpus rows."""
        # clamp at entry: n_probe=0 must probe one cell, not loop the
        # escalation forever on cur = min(0*2, n_cells) == 0
        n_probe = max(int(n_probe), 1)
        C = self.centroids()
        qrows = collect_query_batch(queries, qid_col, qvec_col)
        result = self._knn_probe(
            spark, queries, qrows, C, k, n_probe, metric, qid_col, qvec_col,
            impl, rescore, where, as_of_gen,
        )
        if where is None or not escalate or n_probe >= self.n_cells:
            return result

        import pandas as pd_

        kk = max(int(k), 1)
        radii = self.cell_radii() if metric == "l2sq" else None
        qinfo = {}
        for r in qrows:
            qv = np.asarray(list(r[qvec_col]), dtype=np.float64)
            d2 = ((C - qv) ** 2).sum(axis=1)
            qinfo[int(r[qid_col])] = (np.argsort(d2), d2)

        def still_starved(qid: int, cur: int, counts: dict, kth: dict) -> bool:
            if cur >= self.n_cells:
                return False
            if counts.get(qid, 0) < kk:
                return True
            if radii is None:
                return False
            order, d2 = qinfo[qid]
            unprobed = order[cur:]
            lb = np.maximum(np.sqrt(d2[unprobed]) - radii[unprobed], 0.0) ** 2
            # slack keeps the prune conservative against float-sum
            # divergence between the BLAS kth distance and this bound
            kd = kth[qid]
            return bool((lb <= kd * (1.0 + 1e-9) + 1e-12).any())

        out = result.toPandas()  # bounded: <= batch x k rows
        cur = int(n_probe)
        active = {int(r[qid_col]): r for r in qrows}
        while cur < self.n_cells and active:
            counts = out.groupby("qid").size().to_dict() if len(out) else {}
            kth = (
                out[out["rnk"] == kk].set_index("qid")["dist"].to_dict()
                if len(out)
                else {}
            )
            active = {
                qid: r for qid, r in active.items()
                if still_starved(qid, cur, counts, kth)
            }
            if not active:
                break
            cur = min(cur * 2, self.n_cells)
            starved_ids = list(active)
            sub = self._knn_probe(
                spark,
                queries.filter(F.col(qid_col).isin(starved_ids)),
                list(active.values()), C, k, cur, metric, qid_col, qvec_col,
                impl, rescore, where, as_of_gen,
            ).toPandas()
            out = pd_.concat(
                [out[~out["qid"].isin(starved_ids)], sub], ignore_index=True
            )
        return spark.createDataFrame(out, schema=result.schema) if len(out) else result

    def _knn_probe(
        self,
        spark: SparkSession,
        queries: DataFrame,
        qrows: list,
        C: np.ndarray,
        k: int,
        n_probe: int,
        metric: str,
        qid_col: str,
        qvec_col: str,
        impl: str,
        rescore: str,
        where: str | None,
        as_of_gen: int | None = None,
    ) -> DataFrame:
        probe_pairs = []
        cand_map: dict[int, frozenset] = {}
        for r in qrows:
            qv = np.asarray(list(r[qvec_col]), dtype=np.float64)
            order = np.argsort(((C - qv) ** 2).sum(axis=1))[:n_probe]
            probe_pairs.extend((int(r[qid_col]), int(c)) for c in order)
            cand_map[int(r[qid_col])] = frozenset(int(c) for c in order)
        probed_cells = sorted({c for _, c in probe_pairs})
        k = max(int(k), 1)

        corpus = self.read(spark, as_of_gen=as_of_gen).filter(
            F.col("cell_id").isin(probed_cells)
        )
        if where is not None:
            corpus = corpus.filter(where)
        if impl == "arrow":
            if rescore == "auto":
                from distributedvectordatabase_spark.operators.knn import (
                    AUTO_JOINBACK_DIM,
                )

                dim = len(list(qrows[0][qvec_col])) if qrows else 0
                rescore = "joinback" if dim >= AUTO_JOINBACK_DIM else "carry"
            carry = rescore == "carry"
            partial = _arrow_partial_topk(
                corpus, queries, k, metric, self.id_col, self.vec_col,
                qid_col, qvec_col, shard_col="cell_id", cand_map=cand_map,
                qrows=qrows, carry_vectors=carry,
            )
            return _rescored_topk(
                partial, queries, k, metric, qid_col, qvec_col,
                join_corpus=None if carry else corpus,
                id_col=self.id_col, vec_col=self.vec_col,
                qrows=qrows,
            )

        probe_df = spark.createDataFrame(probe_pairs, schema=f"{qid_col} long, cell_id int")
        pairs = corpus.join(
            F.broadcast(queries.select(qid_col, qvec_col).join(probe_df, qid_col)),
            on="cell_id",
        )
        scored = pairs.select(
            F.col(qid_col).alias("qid"),
            F.col(self.id_col).alias("neighbor_id"),
            _dist_expr(metric, qvec_col, self.vec_col).alias("dist"),
        )
        return _final_topk(scored, k)
