"""SQL-facing search sugar: ``knn('<store>', <vector>, k)`` and
``bm25('<index>', <terms>, k)`` as tables.

The reference's entire user surface is one query-by-vector call
(`coordinator_server.py:76-141`: POST /search {"vector": [...], "k"}).
The Spark-side mirror should be one SQL line, so SQL users never touch
the Python store classes:

    from distributedvectordatabase_spark.sql import sql
    sql(spark, "SELECT * FROM knn('/path/to/store', array(0.1, ...), 10)")
    sql(spark, "SELECT * FROM bm25('/path/to/index', array('dup'), 10)")

``knn(...)`` is rewritten — not interpreted per-row — into the store's
pruned search plan (the same DataFrame `VectorStore.knn` /
`IVFStore.knn` returns) registered as a temp view and substituted into
the query text, so the executed plan keeps every property the Python
path has: partition pruning on the probed shards/cells, Arrow partial
top-k before the exchange, TakeOrderedAndProject for the single-query
top-k (asserted in tests/test_sql_sugar.py). A Python UDTF could not
do this: a worker-side function cannot launch a distributed scan.

Grammar (a table factor, case-insensitive name):

    knn('<store_path>', <vector expr>, <k> [, <probes> [, '<metric>']]
        [, probes|n_probe => <int>] [, metric => '<m>']
        [, where => '<sql predicate>'] [, escalate => true|false]
        [, as_of => <gen>])

Named options (r8, SQL-standard ``name => value`` syntax, after the
positionals): ``where`` is a predicate over the store's metadata
columns — on an IVF store the factor routes through ``IVFStore.knn``'s
exact-with-escalation filtered search (the predicate pushes down next
to the probed-cell pruning; ``escalate => false`` pins the probe set);
on the LSH store it pre-filters the probed scan (exact within the
probed shards; no escalation bound exists, so ``escalate`` raises).

- ``store_path``: a string literal; the store kind is detected from
  its sidecar (``_lsh.json`` → LSH-bucketed VectorStore,
  ``_centroids.json`` → IVFStore).
- ``vector expr``: any SQL expression evaluating to a numeric array
  (e.g. ``array(0.1, 0.2)`` or a scalar subquery).
- ``k``: integer literal.
- ``probes``: optional integer — ``num_candidates`` for the LSH store
  (default 2), ``n_probe`` for the IVF store (default 4).
- ``metric``: optional string literal, ``'l2sq'`` (default) or
  ``'cosine'``.

Result columns: (neighbor_id, dist, rnk) — usable anywhere a table is.

``bm25(...)`` is the text leg's mirror — rewritten into the persistent
inverted index's partition-pruned scoring plan (TextIndex.bm25):

    bm25('<index_path>', <terms expr>, <k>)

- ``index_path``: a string literal naming a built TextIndex dir;
- ``terms expr``: any SQL expression evaluating to array<string>;
- ``k``: integer literal.

Result columns: (doc_id, score, rnk). The two compose in one query —
hybrid search is a plain SQL join over the two table factors.

``hybrid(...)`` (r6) is the pre-fused form — one SQL line for the
engine's flagship composed query, rewritten into the
``hybrid_serve_batch`` plan over both persisted structures (exact or
LSH-pruned semantic leg + term-bucket-pruned BM25 leg, RRF-fused):

    hybrid('<store_path>', '<index_path>', <vector expr>, <terms expr>,
           <k> [, <probes>] [, n_probe|num_candidates => <int>]
           [, where => '<sql predicate>']
           [, store_as_of => <gen>] [, index_as_of => <gen>]
           [, use_sq => true] [, use_bq => true])

``as_of``/``store_as_of``/``index_as_of`` (r8) pin the search to a
snapshot generation (``current_gen()`` semantics — time-travel serving
from one SQL line, composing with ``where`` for reproducible filtered
retrieval).

``where`` on hybrid(...) (r8) serves FILTERED hybrid search: the
predicate (over the store's metadata columns) restricts both legs —
exact-with-escalation on an IVF semantic leg, pre-filtered scan on an
LSH one, and a hard pre-top-k constraint on the BM25 leg with
corpus-global statistics (hybrid_serve_batch(where=...) semantics).

``use_sq``/``use_bq`` (r9) route the semantic leg through the store's
compressed codes sidecar (SQ8 / 1-bit Hamming + exact rerank) — and
both ``where`` and the ``*_as_of`` pins compose with them: allowed ids
semi-join into the codes scan before the shortlist, snapshots
reconstruct codes-as-of via per-row generations (floored at the
sidecar's build).

- ``store_path``: a built VectorStore dir (the serving store);
- ``index_path``: a built TextIndex dir;
- ``probes``: optional integer — ``num_candidates`` for the LSH
  multi-probe semantic leg; omitted = exact scan.

Result columns: (doc_id, rrf_score, rnk) — pinned row-identical to
``hybrid_serve_batch`` in tests/test_sql_sugar.py.
"""

from __future__ import annotations

import itertools
import os
import re

from pyspark.sql import DataFrame, SparkSession

_SUGAR_TOKEN = re.compile(r"(?i)(?<![A-Za-z0-9_])(knn|bm25|hybrid)\s*\(")
_VIEW_IDS = itertools.count()


def _balanced_span(text: str, open_paren: int) -> int:
    """Index just past the ')' matching ``text[open_paren] == '('``,
    honoring single-quoted strings."""
    depth, i, n = 0, open_paren, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n and text[i] != "'":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in knn(...) call")


def _split_args(argtext: str) -> list[str]:
    """Top-level comma split, honoring nesting and quoted strings."""
    args, depth, cur, i, n = [], 0, [], 0, len(argtext)
    while i < n:
        ch = argtext[i]
        if ch == "'":
            j = i + 1
            while j < n and argtext[j] != "'":
                j += 1
            cur.append(argtext[i : j + 1])
            i = j + 1
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _string_literal(arg: str, what: str) -> str:
    if len(arg) >= 2 and arg[0] == "'" and arg[-1] == "'":
        return arg[1:-1]
    raise ValueError(f"knn(...) {what} must be a string literal, got {arg!r}")


_NAMED_ARG = re.compile(r"(?s)^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=>\s*(.+)$")


def _split_named(args: list[str], fname: str, allowed: set[str]):
    """Split a factor's argument list into the positional prefix and
    the trailing ``name => value`` options (SQL-standard named-argument
    syntax). Named args must follow all positional ones; unknown names
    raise with the allowed set."""
    pos: list[str] = []
    named: dict[str, str] = {}
    for a in args:
        m = _NAMED_ARG.match(a)
        if m:
            key = m.group(1).lower()
            if key not in allowed:
                raise ValueError(
                    f"{fname}(...) unknown option {key!r} — "
                    f"supported: {sorted(allowed)}"
                )
            named[key] = m.group(2).strip()
        elif named:
            raise ValueError(
                f"{fname}(...) positional argument {a!r} after a named one"
            )
        else:
            pos.append(a)
    return pos, named


def _bool_opt(named: dict, key: str, default: bool) -> bool:
    if key not in named:
        return default
    v = named[key].lower()
    if v in ("true", "false"):
        return v == "true"
    raise ValueError(f"{key} => expects true or false, got {named[key]!r}")


def _knn_view(spark: SparkSession, args: list[str]) -> str:
    args, named = _split_named(
        args, "knn", {"probes", "n_probe", "metric", "where", "escalate", "as_of"}
    )
    if not 3 <= len(args) <= 5:
        raise ValueError(
            "knn(...) takes (store_path, vector, k[, probes[, metric]]"
            "[, probes|n_probe|metric|where|escalate => ...]), "
            f"got {len(args)} positional arguments"
        )
    path = _string_literal(args[0], "store path")
    k = int(args[2])
    probes = int(args[3]) if len(args) >= 4 else None
    metric = _string_literal(args[4], "metric") if len(args) == 5 else "l2sq"
    if "probes" in named or "n_probe" in named:
        if probes is not None:
            raise ValueError("knn(...) probes given both positionally and named")
        if "probes" in named and "n_probe" in named:
            raise ValueError(
                "knn(...) got both probes => and n_probe => — they are "
                "the same knob (n_probe is the IVF spelling); pass one"
            )
        probes = int(named.get("probes", named.get("n_probe")))
    if "metric" in named:
        if len(args) == 5:
            raise ValueError("knn(...) metric given both positionally and named")
        metric = _string_literal(named["metric"], "metric")
    where = _string_literal(named["where"], "where") if "where" in named else None
    escalate = _bool_opt(named, "escalate", True)
    as_of = int(named["as_of"]) if "as_of" in named else None

    # evaluate the vector expression once, driver-side (it is a literal
    # or scalar subquery — the per-row form would be a different op)
    vec = spark.sql(
        f"SELECT cast({args[1]} as array<double>) AS v"
    ).first()[0]
    if vec is None:
        raise ValueError(f"knn(...) vector expression evaluated to NULL: {args[1]}")

    vec = [float(x) for x in vec]

    # One query → the knn_single plan: prune the scan to the probed
    # shards/cells (literal IN → Catalyst partition pruning), then
    # ORDER BY dist LIMIT k → TakeOrderedAndProject (per-partition
    # bounded heap + driver merge, no full sort, no shuffle). This is
    # the exact plan shape the Python path produces for one query.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import knn_single

    if os.path.exists(os.path.join(path, "_centroids.json")):
        import numpy as np

        from distributedvectordatabase_spark.sources.ivf_store import IVFStore

        store = IVFStore(path)  # sidecar-config reopen
        n_probe = probes if probes else 4
        if where is None and "escalate" in named:
            # mirror the LSH branch: never silently ignore a named knob.
            # The unfiltered sugar path is a fixed-probe pruned scan
            # (IVFStore.knn itself only escalates starved FILTERED
            # probes — an unfiltered probe always fills k).
            raise ValueError(
                "knn(...) escalate => applies to filtered IVF search "
                "(where => ...) only; an unfiltered probe always fills "
                "k — widen probes/n_probe to trade recall for scan cost"
            )
        if where is not None:
            # metadata-filtered search: route through the Python path
            # itself (IVFStore.knn) — the predicate pushes down NEXT TO
            # the probed-cell pruning, and escalate=true keeps the
            # exact-with-escalation semantics (triangle-inequality
            # probe widening until no unprobed cell can hold a closer
            # match). One query row, so the filtered scan stays a
            # single pruned pass.
            queries = spark.createDataFrame(
                [(0, vec)], "qid long, qvec array<double>"
            )
            res = store.knn(
                spark, queries, k=k, n_probe=n_probe, metric=metric,
                where=where, escalate=escalate, as_of_gen=as_of,
            ).select("neighbor_id", "dist", "rnk")
            name = f"_knn_sugar_{next(_VIEW_IDS)}"
            res.createOrReplaceTempView(name)
            return name
        C = store.centroids()
        qv = np.asarray(vec, dtype=np.float64)
        cells = [
            int(c) for c in np.argsort(((C - qv) ** 2).sum(axis=1))[:n_probe]
        ]
        corpus = store.read(spark, as_of_gen=as_of).filter(
            F.col("cell_id").isin(cells)
        )
    elif os.path.exists(os.path.join(path, "_lsh.json")):
        from distributedvectordatabase_spark.sources.vector_store import VectorStore

        store = VectorStore(path)  # sidecar-config reopen
        if "escalate" in named:
            raise ValueError(
                "knn(...) escalate => applies to IVF stores only (the LSH "
                "store has no per-shard radius bound to escalate against)"
            )
        shards = store.lsh.candidate_shards(vec, probes if probes else 2)
        corpus = store.read(spark, as_of_gen=as_of).filter(
            F.col("shard_id").isin(shards)
        )
        if where is not None:
            # pre-filter the probed scan: the predicate pushes to the
            # parquet reader next to the shard pruning (never
            # score-then-discard). Exact within the probed shards —
            # fill-to-k escalation is the IVF store's contract.
            corpus = corpus.filter(where)
    else:
        raise ValueError(
            f"no vector store found at {path!r} (expected an _lsh.json "
            "or _centroids.json sidecar)"
        )
    res = knn_single(
        corpus, vec, k=k, metric=metric,
        id_col=store.id_col, vec_col=store.vec_col,
    ).withColumn(
        # rnk over the ≤k surviving rows (post-limit — a singleton
        # window over k rows, not a corpus sort)
        "rnk",
        F.row_number().over(Window.orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())),
    )
    name = f"_knn_sugar_{next(_VIEW_IDS)}"
    res.select("neighbor_id", "dist", "rnk").createOrReplaceTempView(name)
    return name


def _bm25_view(spark: SparkSession, args: list[str]) -> str:
    if len(args) != 3:
        raise ValueError(
            f"bm25(...) takes (index_path, terms, k), got {len(args)} arguments"
        )
    path = _string_literal(args[0], "index path")
    k = int(args[2])
    terms = spark.sql(f"SELECT cast({args[1]} as array<string>) AS t").first()[0]
    if not terms:
        raise ValueError(f"bm25(...) terms expression evaluated empty: {args[1]}")
    if not os.path.exists(os.path.join(path, "_stats.json")):
        raise ValueError(
            f"no text index found at {path!r} (expected a _stats.json sidecar)"
        )
    from distributedvectordatabase_spark.sources.text_index import TextIndex

    res = TextIndex(path).bm25(spark, [str(t) for t in terms], k=k)
    name = f"_bm25_sugar_{next(_VIEW_IDS)}"
    res.createOrReplaceTempView(name)
    return name


def _hybrid_view(spark: SparkSession, args: list[str]) -> str:
    args, named = _split_named(
        args, "hybrid",
        {"probes", "n_probe", "num_candidates", "where",
         "store_as_of", "index_as_of", "use_sq", "use_bq"},
    )
    if not 5 <= len(args) <= 6:
        raise ValueError(
            "hybrid(...) takes (store_path, index_path, vector, terms, "
            "k[, probes][, probes|n_probe|num_candidates => ...]), "
            f"got {len(args)} positional arguments"
        )
    store_path = _string_literal(args[0], "store path")
    index_path = _string_literal(args[1], "index path")
    k = int(args[4])
    probes = int(args[5]) if len(args) == 6 else None
    named_probe = [k_ for k_ in ("probes", "n_probe", "num_candidates") if k_ in named]
    if named_probe:
        if probes is not None or len(named_probe) > 1:
            raise ValueError("hybrid(...) probe count given more than once")
        probes = int(named[named_probe[0]])
        # the EXPLICIT knob name must match the store kind — mirror of
        # hybrid_serve_batch's wrong-knob raise
        if named_probe[0] == "n_probe" and not os.path.exists(
            os.path.join(store_path, "_centroids.json")
        ):
            raise ValueError("hybrid(...) n_probe => is the IVF store's knob")
        if named_probe[0] == "num_candidates" and not os.path.exists(
            os.path.join(store_path, "_lsh.json")
        ):
            raise ValueError(
                "hybrid(...) num_candidates => is the LSH store's knob"
            )
    vec = spark.sql(f"SELECT cast({args[2]} as array<double>) AS v").first()[0]
    if vec is None:
        raise ValueError(f"hybrid(...) vector expression evaluated to NULL: {args[2]}")
    terms = spark.sql(f"SELECT cast({args[3]} as array<string>) AS t").first()[0]
    if not terms:
        raise ValueError(f"hybrid(...) terms expression evaluated empty: {args[3]}")
    # the store kind auto-detects from its sidecar, same as knn(...):
    # _centroids.json → IVF (probes = n_probe), _lsh.json → LSH
    # VectorStore (probes = num_candidates)
    if os.path.exists(os.path.join(store_path, "_centroids.json")):
        from distributedvectordatabase_spark.sources.ivf_store import IVFStore

        store = IVFStore(store_path)  # sidecar-config reopen
        probe_kw = {"n_probe": probes}
    elif os.path.exists(os.path.join(store_path, "_lsh.json")):
        from distributedvectordatabase_spark.sources.vector_store import VectorStore

        store = VectorStore(store_path)  # sidecar-config reopen
        probe_kw = {"num_candidates": probes}
    else:
        raise ValueError(
            f"no vector store found at {store_path!r} (hybrid(...) serves "
            "from a built store — an _lsh.json or _centroids.json sidecar)"
        )
    if not os.path.exists(os.path.join(index_path, "_stats.json")):
        raise ValueError(
            f"no text index found at {index_path!r} (expected a _stats.json sidecar)"
        )
    from distributedvectordatabase_spark.operators.search import hybrid_serve_batch
    from distributedvectordatabase_spark.sources.text_index import TextIndex

    queries = spark.createDataFrame(
        [(0, [float(x) for x in vec], [str(t) for t in terms])],
        "qid long, qvec array<double>, terms array<string>",
    )
    res = hybrid_serve_batch(
        spark,
        store,
        TextIndex(index_path),
        queries,
        k=k,
        where=(
            _string_literal(named["where"], "where") if "where" in named else None
        ),
        store_as_of=(
            int(named["store_as_of"]) if "store_as_of" in named else None
        ),
        index_as_of=(
            int(named["index_as_of"]) if "index_as_of" in named else None
        ),
        # r9: the compressed legs serve filtered/snapshot too — the
        # sugar exposes them directly (knn_sq/knn_bq raise their own
        # clear errors when the sidecar is missing or stale)
        use_sq=_bool_opt(named, "use_sq", False),
        use_bq=_bool_opt(named, "use_bq", False),
        **probe_kw,
    ).drop("qid")
    name = f"_hybrid_sugar_{next(_VIEW_IDS)}"
    res.createOrReplaceTempView(name)
    return name


def rewrite(spark: SparkSession, query: str) -> str:
    """Replace every ``knn(...)`` / ``bm25(...)`` table factor in
    ``query`` with the name of a temp view holding the corresponding
    pruned search plan."""
    out, pos = [], 0
    while True:
        m = _SUGAR_TOKEN.search(query, pos)
        if not m:
            out.append(query[pos:])
            return "".join(out)
        open_paren = query.index("(", m.start())
        end = _balanced_span(query, open_paren)
        args = _split_args(query[open_paren + 1 : end - 1])
        out.append(query[pos : m.start()])
        factory = {
            "knn": _knn_view,
            "bm25": _bm25_view,
            "hybrid": _hybrid_view,
        }[m.group(1).lower()]
        out.append(factory(spark, args))
        pos = end


def sql(spark: SparkSession, query: str) -> DataFrame:
    """``spark.sql`` with the ``knn(...)`` / ``bm25(...)`` table-factor
    extensions."""
    return spark.sql(rewrite(spark, query))
