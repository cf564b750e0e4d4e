"""Shared merge-on-read tombstone mechanics for the stores.

Both VectorStore and IVFStore implement delete the same way (the
reference has no delete endpoint at all — coordinator_server.py
exposes only add_vectors/search/stats — but a training-data store
needs take-downs): every written row carries a ``_gen`` generation,
``delete`` appends (id, ``_del_gen``) rows to a hidden
``_tombstones/`` directory inside the store (underscore-prefixed, so
Spark's file index never treats it as data), and reads drop a row
when a tombstone for its id carries a gen >= the row's own. The
filter is ONE broadcast join of the aggregated tombstone table above
the scan — partition pruning and predicate pushdown on the store side
are unaffected — and compaction folds tombstones in physically.

Generation ordering makes the scheme crash-safe without transactions:
a delete persists its gen to the store's config sidecar BEFORE its
tombstones exist, a write persists its gen only AFTER its data lands,
so any crash burns at most an unused gen number — never a resurrected
row, never a wrongly-killed one (the survival rule is strict
``row._gen > tombstone gen``).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEN_COL = "_gen"
DEL_GEN_COL = "_del_gen"


def atomic_dump_json(path: str, obj) -> None:
    """Persist a sidecar with an ATOMIC replace, never truncate-in-place.

    The whole commit protocol rests on 'one sidecar dump is the commit
    point' — an ``open(path, "w")`` + ``json.dump`` truncates first and
    writes second, so a crash mid-dump leaves a torn/empty JSON. For
    IVFStore that file also holds the centroids: the store would become
    permanently unreadable, strictly worse than the pre-append state
    the protocol promises. Write to a temp file in the SAME directory
    (rename is only atomic within a filesystem), fsync, then
    ``os.replace`` over the target — readers see either the old
    complete sidecar or the new complete one, never a prefix."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


class WriterLeaseHeld(RuntimeError):
    """Another live writer holds this store's lease.

    The two-phase sidecar commit is crash-safe but SINGLE-WRITER: two
    concurrent appenders would race the sidecar read-modify-write —
    both heal, both allocate gen G+1, the losing dump silently orphans
    the winner's committed rows above the horizon. The lease turns that
    silent corruption into this explicit refusal."""


class writer_lease:
    """Exclusive writer lease for one store directory.

    ``O_CREAT | O_EXCL`` on a SIBLING ``<path>__writer.lock`` file is
    the mutual-exclusion primitive (atomic on POSIX local and on HDFS/
    object-store ports of this layout via create-if-absent; a sibling,
    not a member, because ``compact()`` rmtree-swaps the store dir
    itself mid-lease). The lock file records pid + acquire time; a
    holder that died without releasing is detected by liveness
    (same-host pid probe) or by the ``stale_after_s`` wall-clock
    horizon, and the lease is TAKEN OVER by atomically swapping the
    lock file — refusal is the default, the takeover only fires on
    provable staleness. Re-entrant within one process (``train`` calls
    ``retrain``, ``delete_where`` calls ``delete`` — the inner scope
    detects its own pid and leaves release to the outer). Used as a
    context manager around every gen-allocating write (append/delete/
    compact/build) in all five stores."""

    def __init__(self, store_path: str, stale_after_s: float = 3600.0):
        self.lock_path = store_path.rstrip("/") + "__writer.lock"
        self.stale_after_s = float(stale_after_s)
        self._held = False

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        return True

    def _try_takeover(self) -> bool:
        """Replace a provably-stale lock. Returns True if we now hold it."""
        try:
            with open(self.lock_path) as f:
                cur = json.load(f)
        except (OSError, ValueError):
            cur = {}
        pid = int(cur.get("pid", -1))
        ts = float(cur.get("ts", 0.0))
        same_host = cur.get("host") == os.uname().nodename
        stale = (same_host and pid > 0 and not self._pid_alive(pid)) or (
            time.time() - ts > self.stale_after_s
        )
        if not stale:
            return False
        # Atomic swap: whoever's replace lands last owns the lease, and
        # both contenders believed the old holder dead — the ts in the
        # new file restarts the staleness clock for the loser.
        atomic_dump_json(self.lock_path, self._payload())
        return True

    def _payload(self) -> dict:
        return {"pid": os.getpid(), "ts": time.time(), "host": os.uname().nodename}

    def __enter__(self):
        # a store's first write may precede its parent directory (the
        # store dir itself is created by the data write)
        parent = os.path.dirname(self.lock_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        try:
            fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(self.lock_path) as f:
                    cur = json.load(f)
            except (OSError, ValueError):
                cur = {}
            if (
                int(cur.get("pid", -1)) == os.getpid()
                and cur.get("host") == os.uname().nodename
            ):
                # re-entrant: this process already holds the lease (an
                # outer mutator called an inner one) — no-op scope, the
                # outer owner releases
                return self
            if not self._try_takeover():
                raise WriterLeaseHeld(
                    f"store lease {self.lock_path!r} is held by a live "
                    "writer; concurrent writers would race the sidecar "
                    "commit (both allocate the same generation, the losing "
                    "dump orphans the winner's rows) — retry after it "
                    "finishes, or remove the lock if the holder is known dead"
                ) from None
            self._held = True
            return self
        with os.fdopen(fd, "w") as f:
            json.dump(self._payload(), f)
        self._held = True
        return self

    def __exit__(self, *exc):
        if self._held:
            try:
                os.unlink(self.lock_path)
            except OSError:
                pass
            self._held = False
        return False


def append_tombstones(
    spark: SparkSession, tomb_dir: str, id_col: str, ids, gen: int
) -> None:
    """Record ``ids`` (list/iterable or one-column DataFrame) as
    deleted-at-``gen``. O(deleted) bytes; nothing else is touched."""
    if isinstance(ids, DataFrame):
        tomb = ids.select(F.col(ids.columns[0]).cast("long").alias(id_col))
    else:
        tomb = spark.createDataFrame([(int(i),) for i in ids], f"{id_col} long")
    tomb.withColumn(DEL_GEN_COL, F.lit(int(gen))).coalesce(1).write.mode(
        "append"
    ).parquet(tomb_dir)


def filter_live(
    spark: SparkSession, df: DataFrame, tomb_dir: str, id_col: str
) -> DataFrame:
    """Drop tombstoned rows from ``df`` (which carries ``_gen``; a
    missing column means a pre-generation store — every row reads as
    gen 0). Keeps ``_gen`` in the output so callers can rewrite or
    re-filter; public read paths drop it themselves."""
    if GEN_COL not in df.columns:
        df = df.withColumn(GEN_COL, F.lit(0))
    if not os.path.exists(tomb_dir):
        return df
    tomb = (
        spark.read.parquet(tomb_dir)
        .groupBy(id_col)
        .agg(F.max(DEL_GEN_COL).alias("_tomb_gen"))
    )
    return (
        df.join(F.broadcast(tomb), id_col, "left")
        .filter(F.col("_tomb_gen").isNull() | (F.col(GEN_COL) > F.col("_tomb_gen")))
        .drop("_tomb_gen")
    )


def filter_as_of(
    spark: SparkSession, df: DataFrame, tomb_dir: str, id_col: str, gen: int
) -> DataFrame:
    """Snapshot read at generation ``gen``: exactly the rows that
    ``filter_live`` would have returned when the store's persisted gen
    was ``gen`` — rows written at ``_gen <= gen`` minus tombstones
    recorded at ``_del_gen <= gen`` (same strict survival rule).
    Time travel for training reproducibility: pin
    ``store.current_gen()`` when a run starts and the exact corpus the
    model saw stays reconstructable through later appends/deletes.

    The filters compose with the live read's plan shape: the row-side
    ``_gen <= gen`` is a pushable scan predicate, the tombstone side
    shrinks (never grows) before the same broadcast anti-filter.
    History is bounded by compaction, not forever: ``compact()``
    physically folds tombstones and drops dead rows (VACUUM
    semantics), so snapshots older than the last compact see the
    post-compact physical state — surviving rows keep their original
    ``_gen`` through the rewrite, so snapshots at or after it stay
    exact."""
    if GEN_COL not in df.columns:
        df = df.withColumn(GEN_COL, F.lit(0))
    df = df.filter(F.col(GEN_COL) <= int(gen))
    if not os.path.exists(tomb_dir):
        return df
    tomb = (
        spark.read.parquet(tomb_dir)
        .filter(F.col(DEL_GEN_COL) <= int(gen))
        .groupBy(id_col)
        .agg(F.max(DEL_GEN_COL).alias("_tomb_gen"))
    )
    return (
        df.join(F.broadcast(tomb), id_col, "left")
        .filter(F.col("_tomb_gen").isNull() | (F.col(GEN_COL) > F.col("_tomb_gen")))
        .drop("_tomb_gen")
    )


def filter_committed(
    df: DataFrame, committed_gen: int | None = None, aborted_gens=()
) -> DataFrame:
    """Drop rows from writes that never committed their sidecar: rows
    above the persisted commit horizon (an append crashed between its
    data job and its sidecar commit — invisible until the next writer
    heals them) and rows whose gen sits in the sidecar's aborted list
    (healed crash leftovers, physically reclaimed by ``compact``).
    Rows without a ``_gen`` column predate generations and are always
    committed. Both predicates are literal scan filters — they push
    down next to the store's partition pruning."""
    if GEN_COL not in df.columns:
        return df
    if committed_gen is not None:
        df = df.filter(F.col(GEN_COL) <= int(committed_gen))
    ab = [int(g) for g in aborted_gens or ()]
    if ab:
        df = df.filter(~F.col(GEN_COL).isin(ab))
    return df


def heal_pending(side: dict) -> dict:
    """Fold a crash-orphaned ``pending_gen`` into ``aborted_gens``.

    Writers follow a two-phase commit on the sidecar: (1) persist
    ``pending_gen = G+1`` as the write intent, (2) write data rows at
    that gen, (3) persist ``gen = G+1`` and clear the intent — one
    atomic sidecar dump, so the commit point is a single file write
    (streaming ingest rides its batch id on the same dump). A sidecar
    with a live ``pending_gen`` therefore marks a crashed write whose
    rows may exist physically; every subsequent gen allocation calls
    this first so those rows stay invisible forever (filter_committed)
    and the replay's rows take a FRESH gen number."""
    pending = side.get("pending_gen")
    if pending is not None:
        ab = set(int(g) for g in side.get("aborted_gens", ()))
        ab.add(int(pending))
        side["aborted_gens"] = sorted(ab)
        side["pending_gen"] = None
    return side


def next_gen(side: dict) -> int:
    """Allocate the next write/delete generation: above the committed
    gen AND every burned number (pending intents, aborted gens), so a
    healed crash's orphan rows can never share a gen with committed
    ones."""
    candidates = [int(side.get("gen", 0))]
    if side.get("pending_gen") is not None:
        candidates.append(int(side["pending_gen"]))
    candidates.extend(int(g) for g in side.get("aborted_gens", ()))
    return max(candidates) + 1


def locked_writer(fn):
    """Method decorator: hold the store's writer lease for the duration
    of a mutator (``self.path`` is the store dir — the shared layout of
    all five stores). Re-entrant, so wrapped mutators may call each
    other."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with writer_lease(self.path):
            return fn(self, *args, **kwargs)

    return wrapper


def max_tombstoned_id(spark: SparkSession, tomb_dir: str, id_col: str) -> int:
    """Largest id ever deleted (0 if none) — auto-id allocation must
    clear this too, or a reissued id would be silently killed by its
    old tombstone."""
    if not os.path.exists(tomb_dir):
        return 0
    v = spark.read.parquet(tomb_dir).agg(F.max(id_col)).first()[0]
    return int(v or 0)
