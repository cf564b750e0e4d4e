"""The declared-query catalog: every operator from SURVEY §2 exposed as
a named query with (a) a Spark runner and (b) a DuckDB oracle.

Two kinds of entries:

- **SQL-templated**: one template, rendered per dialect via
  functions/text.py primitives — Spark runs ``spark.sql(render("spark"))``
  (pure Catalyst, whole-stage codegen), the oracle is
  ``render("duckdb")``. Structural parity by construction.
- **DataFrame-API**: vector/LSH operators whose Spark side is the
  engine's real API (arrow kNN, pandas_udf bucketing, partitioned
  store); their oracles are generated SQL embedding the same seeded
  projection constants.

Money aggregations cast to DECIMAL before summing: double summation
order differs between engines (Spark partial aggs vs DuckDB sequential)
and at 60k+ rows the drift exceeds the 1e-6 canonical rounding; decimal
sums are exact and therefore engine-independent. The cast itself goes
through `_dec`, which floor-quantizes the double FIRST — a raw
``cast(double as decimal)`` rounds shortest-repr half-up in Spark but
exact-binary in DuckDB and diverges at half boundaries (r4,
tests/test_engine_parity.py).

Float canonicalization is floor-based (`_qz` for doubles, `_dq` for
exact decimals, `_qz_col`/`_qz_py` twins for DataFrame/Python sides) —
never ``round(double, n)``, which differs by one ulp between engines on
identical inputs; see the helper docstrings and FIXTURES.md §4.
"""

from __future__ import annotations

import functools
import os
import tempfile
import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from distributedvectordatabase_spark.functions import text as T
from distributedvectordatabase_spark.functions.lsh import SignLSH
from distributedvectordatabase_spark.functions.text import DUCKDB, SPARK

N_QUERIES = 20  # FIXTURES.md query fixture: first 20 embeddings, self-queried
KNN_K = 10
# the scale the driver (and tests/exact_compare) run the DuckDB oracle at —
# oracles that inline data-derived literals (pca_project_16) derive them here
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
NEARDUP_COS = 0.35  # max pairwise cosine in testdata is ~0.51
# The driver's synthetic documents corpus has a ~40-word vocabulary —
# median pairwise Jaccard is 0.63, so banding must be deep (rows=6) and
# the threshold high (0.9) for the candidate set to stay sub-quadratic.
# On a realistic web corpus (baseline J≈0) shallower bands raise recall.
MINHASH_JACCARD = 0.9
MINHASH_BANDS = 2
MINHASH_ROWS = 6
SIMHASH_MAX_HAMMING = 2
# 32 bits (not the textbook-toy 16): on this small-vocab corpus a 16-bit
# simhash marks most pairs as dups and the pigeonhole chunks degenerate
# into ~64-value buckets; 32 bits keeps hamming<=2 meaningful and the
# candidate join selective.
SIMHASH_BITS = 32

_LSH = SignLSH()  # dim=64, 4 fns × 3 tables, seed 42 — the engine default


@dataclass
class Query:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL; None → rows-only check. May be a zero-arg callable for
    # oracles that are expensive to render (pca_project_16 fits an
    # eigenbasis over ORACLE_SF_DIR): resolved lazily on first access
    # and cached, so build_catalog() itself never pays a parquet read +
    # O(d²n) eigh for a gate that may not run (ADVICE r8).
    _oracle_src: str | Callable[[], str | None] | None

    @property
    def oracle(self) -> str | None:
        if callable(self._oracle_src):
            self._oracle_src = self._oracle_src()
        return self._oracle_src


def _register(spark: SparkSession, sf_dir: str) -> None:
    from distributedvectordatabase_spark.sources.tables import register_views

    register_views(spark, sf_dir)


def _sql_query(name: str, render: Callable[[str], str]) -> Query:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(render(SPARK))

    return Query(name, run, render(DUCKDB))


# ---------------------------------------------------------------------------
# dialect helpers shared by templates
# ---------------------------------------------------------------------------

def _asize(d: str) -> str:
    return "size" if d == SPARK else "len"


def _adistinct(d: str) -> str:
    return "array_distinct" if d == SPARK else "list_distinct"


def _jaccard(a: str, b: str, d: str) -> str:
    """Jaccard of two distinct-element arrays."""
    if d == SPARK:
        return f"cast(size(array_intersect({a}, {b})) as double) / nullif(size(array_union({a}, {b})), 0)"
    return f"cast(len(list_intersect({a}, {b})) as double) / nullif(len(list_distinct({a} || {b})), 0)"


def _dot(a: str, b: str, d: str) -> str:
    if d == SPARK:
        return (
            f"aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>), "
            f"(x, y) -> x * y), cast(0.0 as double), (s, x) -> s + x)"
        )
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def _l2sq(a: str, b: str, d: str) -> str:
    if d == SPARK:
        return (
            f"aggregate(zip_with(cast({a} as array<double>), cast({b} as array<double>), "
            f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), (s, x) -> s + x)"
        )
    # explicit multiply, not `^ 2`: integer-exponent pow is *usually*
    # exact x*x but libm gives no guarantee, and Spark's side multiplies
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> ((({a})::DOUBLE[])[i] - (({b})::DOUBLE[])[i])"
        f" * ((({a})::DOUBLE[])[i] - (({b})::DOUBLE[])[i])))"
    )


def _l2norm(a: str, d: str) -> str:
    return f"sqrt({_dot(a, a, d)})"


def _cos_sim(a: str, b: str, d: str) -> str:
    den = f"({_l2norm(a, d)} * {_l2norm(b, d)})"
    return f"(case when {den} = 0 then 0.0 else {_dot(a, b, d)} / {den} end)"


def _cos_dist(a: str, b: str, d: str) -> str:
    return f"(1.0 - {_cos_sim(a, b, d)})"


def _dec(expr: str, spec: str = "18,4") -> str:
    """Engine-stable DOUBLE → DECIMAL(p,s).

    A direct ``cast(double as decimal)`` is NOT engine-stable at
    rounding half-boundaries: Spark rounds the double's *shortest
    decimal repr* half-up (BigDecimal.valueOf) while DuckDB rounds the
    *exact binary expansion*, so e.g. 11651.54645 (binary value
    ...544999...) casts to 11651.5465 in Spark but 11651.5464 in
    DuckDB — verified by a 900k-value fuzz (r4). Data-dependent: a
    single half-boundary price in a regenerated testdata flips a whole
    aggregate's hash (the r3 sales_grouping_sets failure class).

    Fix: quantize with :func:`_qz` (floor-based, identical IEEE ops in
    both engines) at the target scale FIRST. The quantized double is
    within one ulp of an exact s-decimal grid point — 11 orders of
    magnitude inside the cast's half-grid boundary — so the subsequent
    decimal cast lands on the same grid point in both engines.
    """
    scale = int(spec.split(",")[1])
    return f"cast({_qz(expr, scale)} as decimal({spec}))"


def _qz(expr: str, scale: int = 6) -> str:
    """Engine-stable quantization of a DOUBLE to `scale` decimals.

    ``round(double, n)`` is NOT engine-stable: Spark routes through
    BigDecimal on the shortest decimal repr while DuckDB rounds the
    exact binary expansion, so identical inputs can produce doubles
    one ulp apart — which the driver's full-precision CSV hash then
    flags (observed on sales_grouping_sets / knn_cosine in r3).
    floor/bigint-cast/IEEE-multiply-divide are all correctly-rounded
    single operations in both engines, so this form is bit-identical
    given bit-identical inputs. Half-up toward +inf on negatives
    (floor(x+0.5)), which both dialects share by construction.

    Delegates to the ONE shared definition in functions/text.py (r11
    hoist — gopher/substring_dedup/the catalog all quantize through the
    same helper, pinned in tests/test_quantization.py).
    """
    return T.q6_sql(expr, scale)


def _dq(dec_expr: str, scale: int = 2) -> str:
    """Engine-stable DECIMAL → DOUBLE at `scale` decimals.

    Even ``cast(decimal as double)`` on the *identical exact decimal*
    diverges between engines once the value needs >15.95 significant
    digits (Spark BigDecimal.doubleValue vs DuckDB int128/10^s — both
    double-round differently), and DuckDB *truncates* decimal
    scale-reduction casts while Spark half-ups. The only shared-exact
    path is integer arithmetic: scale the exact decimal, half-up via
    floor(+0.5) (exact decimal ops in both engines), cast the integer
    to bigint (exact), then one IEEE division (correctly rounded in
    both). Keep 10^scale × |value| within bigint — scale 2 ("cents")
    holds to ~9.2e16, safe for TPC-H money sums far past sf100.
    """
    m = 10**scale
    return f"(cast(floor(({dec_expr}) * {m} + 0.5) as bigint) / cast({m} as double))"


def _qsum(term: str) -> str:
    """Order-independent sum of a per-row double expression: quantize
    each term to 6 decimals (a deterministic double whose decimal(38,6)
    image is exact in both engines), then sum exactly in decimal.
    Plain ``sum(double)`` depends on accumulation order (Spark partial
    aggs vs DuckDB sequential), which diverges data-dependently below
    1e-6 — the same residual-risk class as round() was."""
    return f"sum(cast({_qz(term)} as decimal(38,6)))"


def _qavg(term: str, count: str = "count(*)") -> str:
    """Engine-stable mean of a per-row double expression: exact decimal
    sum of quantized terms (see _qsum), quantized to a deterministic
    double, one IEEE divide, re-quantized."""
    return _qz(f"{_dq(_qsum(term), 6)} / {count}")


def _qz_py(x: float, scale: int = 6) -> float:
    """Python twin of :func:`_qz` — same IEEE ops on the same doubles."""
    return T.q6_py(x, scale)


def _qz_col(col, scale: int = 6):
    """DataFrame twin of :func:`_qz` — identical floor-based ops, so a
    runner using this matches an oracle using ``_qz`` bit-for-bit."""
    return T.q6_col(col, scale)


def _hour(ts: str, d: str) -> str:
    if d == SPARK:
        return f"date_format(date_trunc('hour', {ts}), 'yyyy-MM-dd HH:mm')"
    return f"strftime(date_trunc('hour', {ts}), '%Y-%m-%d %H:%M')"


def _day(ts: str, d: str) -> str:
    return f"date_format({ts}, 'yyyy-MM-dd')" if d == SPARK else f"strftime({ts}, '%Y-%m-%d')"


def _micros(ts: str, d: str) -> str:
    return f"unix_micros({ts})" if d == SPARK else f"epoch_us({ts})"


def _json_int(col: str, path: str, d: str) -> str:
    if d == SPARK:
        return f"cast(get_json_object({col}, '{path}') as int)"
    return f"json_extract_string({col}, '{path}')::INT"


def _xor_popcount(a: str, b: str, d: str) -> str:
    if d == SPARK:
        return f"bit_count({a} ^ {b})"
    return f"bit_count(xor(({a})::BIGINT, ({b})::BIGINT))"


def _elem(arr: str, i0: int, d: str) -> str:
    """0-based element access in both dialects."""
    return f"{arr}[{i0}]" if d == SPARK else f"{arr}[{i0 + 1}]"


# ---------------------------------------------------------------------------
# text / document queries (SURVEY §2.3 X3, X4 + north-star text analysis)
# ---------------------------------------------------------------------------

def _q_doc_quality(d: str) -> str:
    """Merged per-document text-analysis profile (token stats + quality
    gates + Gopher-style repetition + n-gram language-ID, true vs
    predicted lang) — one scan, all per-row scalar
    arithmetic, embarrassingly parallel at any scale. Tokenization and
    shingling are materialized once in the inner projection; both
    engines keep multi-use non-trivial aliases single-evaluated."""
    toks = T.tokens("text", d)
    stop = "marker_hits"
    n = "n_ws_tokens"
    stop_ratio = f"(cast({stop} as double) / nullif({n}, 0))"
    # DuckDB regexp_replace is first-match-only without the 'g' flag
    strip = (
        "regexp_replace(text, '[^A-Za-z]', '')"
        if d == SPARK
        else "regexp_replace(text, '[^A-Za-z]', '', 'g')"
    )
    alpha_ratio = "(cast(alpha_len as double) / nullif(text_len, 0))"
    score = (
        f"least(1.0, cast({n} as double) / 100.0) * 0.4"
        f" + least({stop_ratio} * 5.0, 1.0) * 0.3 + {alpha_ratio} * 0.3"
    )
    n2, nd2 = f"{_asize(d)}(sh2)", f"{_asize(d)}({_adistinct(d)}(sh2))"
    return f"""
    SELECT doc_id,
           lang,
           pred_lang,
           n_ws_tokens,
           n_bpe_tokens,
           text_len,
           (cast(floor((cast(sum_tok_len as double) / nullif(n_ws_tokens, 0)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_token_len,
           (cast(floor(({stop_ratio}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS stopword_ratio,
           (cast(floor(({alpha_ratio}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS alpha_ratio,
           (cast(floor(({score}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS quality_score,
           {n2} AS n_2grams,
           (cast(floor((CASE WHEN {n2} = 0 THEN 0.0
                 ELSE 1.0 - cast({nd2} as double) / {n2} END) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS dup_2gram_frac
    FROM (
      SELECT doc_id,
             lang,
             {T.lang_id_expr('text', d)} AS pred_lang,
             {_asize(d)}({toks}) AS n_ws_tokens,
             {_asize(d)}({T.regex_tokens('text', d)}) AS n_bpe_tokens,
             length(text) AS text_len,
             {T.sum_token_lengths(toks, d)} AS sum_tok_len,
             {T.marker_score(toks, T.STOPWORDS_EN, d)} AS marker_hits,
             length({strip}) AS alpha_len,
             {T.word_shingles(toks, 2, d)} AS sh2
      FROM documents
    ) t
    """


def _q_curation_pipeline(d: str) -> str:
    """The north-star end-to-end: a training-data curation pass over
    the documents table — quality gate (length + stopword + alpha
    ratios), language filter, exact-dedup keep-first — reporting what
    survives each stage per language. One declarative plan: Catalyst
    fuses the gates into the scan and the dedup into one shuffle."""
    toks = T.tokens("text", d)
    n = f"{_asize(d)}({toks})"
    stop = T.marker_score(toks, T.STOPWORDS_EN, d)
    stop_ratio = f"(cast({stop} as double) / nullif({n}, 0))"
    strip = (
        "regexp_replace(text, '[^A-Za-z]', '')"
        if d == SPARK
        else "regexp_replace(text, '[^A-Za-z]', '', 'g')"
    )
    alpha_ratio = f"(cast(length({strip}) as double) / nullif(length(text), 0))"
    return f"""
    WITH gated AS (
      SELECT doc_id, lang, md5(text) AS content_hash
      FROM documents
      WHERE {n} >= 10
        AND {alpha_ratio} >= 0.5
        AND ({T.lang_id_expr('text', d)} <> 'en' OR {stop_ratio} > 0)
    ),
    kept AS (
      SELECT lang, content_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
      FROM gated
      GROUP BY lang, content_hash
    )
    SELECT lang,
           count(*) AS docs_kept,
           cast(sum(n_copies) as bigint) AS docs_after_gates,
           cast(sum(n_copies) - count(*) as bigint) AS dups_removed
    FROM kept
    GROUP BY lang
    """


def _q_doc_langid(d: str) -> str:
    """Language identification from RAW TEXT (operators/langid.py —
    the CCNet/fastText-style hashed char-n-gram classifier, VERDICT r10
    #1). The frozen per-language micro log-prob tables are inlined as
    constant-folded array literals; per-doc scores are exact bigint
    sums (summation order cannot move a bit) and the argmax ties break
    toward the fixed LANGS order, so the gate has NO float parity
    surface at all. Note the testdata's ``lang`` label is synthetic
    (every doc shares one English-ish vocabulary), so ``agree`` is a
    determinism check, not an accuracy claim — accuracy on real
    multilingual text is pinned in tests/test_langid.py.

    100 TB shape: one scan, pure per-row expression work — grams and
    buckets materialize once per row (multi-use aliases survive
    CollapseProject), then five integer folds. No shuffle, no join."""
    from distributedvectordatabase_spark.operators import langid as LID

    gs = LID.grams_sql("lt", d)
    bks = LID.buckets_sql("gs", d)
    score_cols = {lang: f"score_{lang}_micro" for lang in LID.LANGS}
    tbl = (lambda lang: None) if d == SPARK else (lambda lang: f"t_{lang}")
    scores = ",\n             ".join(
        f"{LID.score_sql('bks', lang, d, tbl(lang))} AS score_{lang}_micro"
        for lang in LID.LANGS
    )
    pred = LID.pred_sql(score_cols)
    mdl = "" if d == SPARK else f"mdl AS ({LID.model_cte_sql(d)}),"
    src = "b" if d == SPARK else "b CROSS JOIN mdl"
    return f"""
    WITH {mdl}
    lowered AS (
      SELECT doc_id, lang, lower(coalesce(text, '')) AS lt FROM documents
    ),
    g AS (SELECT doc_id, lang, {gs} AS gs FROM lowered),
    b AS (SELECT doc_id, lang, {bks} AS bks FROM g),
    s AS (
      SELECT doc_id, lang, cast({_asize(d)}(bks) as bigint) AS n_grams,
             {scores}
      FROM {src}
    )
    SELECT doc_id, lang, n_grams,
           score_en_micro, score_de_micro, score_es_micro,
           score_fr_micro, score_zh_micro,
           {pred} AS lang_pred,
           CASE WHEN {pred} = lang THEN 1 ELSE 0 END AS agree
    FROM s
    """


def _run_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame mirror of ``_q_doc_langid`` over a spread scan (r11):
    identical expressions and output columns, but the input repartitions
    to the session's parallelism first (sources/tables._spread_scan) so
    the ~1,430-gram-per-doc md5 scoring runs on every core instead of
    the testdata's single row group. Real cost at sf0.1 (noop sink):
    8.5 s → ~1 s; the bench's count() number barely moves either way
    because count prunes the pure projection entirely."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators import langid as LID
    from distributedvectordatabase_spark.sources.tables import load_table

    gs = LID.grams_sql("lt", SPARK)
    bks = LID.buckets_sql("gs", SPARK)
    score_names = {lang: f"score_{lang}_micro" for lang in LID.LANGS}
    pred = LID.pred_sql(score_names)
    docs = load_table(spark, "documents", sf_dir, spread=True)
    b = (
        docs.select(
            "doc_id", "lang", F.expr("lower(coalesce(text, ''))").alias("lt")
        )
        .withColumn("gs", F.expr(gs))
        .withColumn("bks", F.expr(bks))
    )
    s = b.select(
        "doc_id",
        "lang",
        F.expr(f"cast({_asize(SPARK)}(bks) as bigint)").alias("n_grams"),
        *[
            F.expr(LID.score_sql("bks", lang, SPARK)).alias(score_names[lang])
            for lang in LID.LANGS
        ],
    )
    # lang_pred projected FIRST, agree derived from the column in a
    # follow-up select (r12, ADVICE r11): the argmax CASE is non-cheap
    # and referencing it twice in one projection re-expands it twice —
    # CollapseProject's multi-use guard keeps the two-Project form, so
    # the CASE is evaluated exactly once per row (the restructured
    # curation runner's shape).
    return s.select(
        "doc_id",
        "lang",
        "n_grams",
        "score_en_micro",
        "score_de_micro",
        "score_es_micro",
        "score_fr_micro",
        "score_zh_micro",
        F.expr(pred).alias("lang_pred"),
    ).withColumn("agree", F.expr("CASE WHEN lang_pred = lang THEN 1 ELSE 0 END"))


def _q_curation_pipeline_langid(d: str) -> str:
    """The curation pipeline with language DERIVED from raw text by the
    frozen classifier instead of read from a pre-labeled column — what
    a real crawl pipeline runs, since no crawl ships lang labels
    (VERDICT r10 #1). Same quality gates and keep-first dedup as
    curation_pipeline; the grouping key and the en-conditioned stopword
    gate both use ``lang_pred``.

    The Spark side does NOT execute this template (r11): Catalyst's
    PushDownPredicate substitutes the ``lang_pred`` alias into the
    WHERE clause and pushes it through every CTE projection down to the
    scan, re-expanding the argmax CASE's ~30 score references into ~30
    full copies of the gram→bucket→fold pipeline per row (CASE arms are
    conditionally evaluated, so codegen subexpression elimination
    cannot merge them) — measured 70.9 s vs doc_langid's 0.11 s at
    sf0.1. The registered runner is :func:`_run_curation_pipeline_langid`,
    which computes the identical result with no filter below the first
    aggregate. DuckDB (the oracle) materializes CTEs and is fine."""
    from distributedvectordatabase_spark.operators import langid as LID

    toks = T.tokens("text", d)
    n = f"{_asize(d)}({toks})"
    stop = T.marker_score(toks, T.STOPWORDS_EN, d)
    stop_ratio = f"(cast({stop} as double) / nullif({n}, 0))"
    strip = (
        "regexp_replace(text, '[^A-Za-z]', '')"
        if d == SPARK
        else "regexp_replace(text, '[^A-Za-z]', '', 'g')"
    )
    alpha_ratio = f"(cast(length({strip}) as double) / nullif(length(text), 0))"
    gs = LID.grams_sql("lt", d)
    bks = LID.buckets_sql("gs", d)
    score_cols = {lang: f"score_{lang}_micro" for lang in LID.LANGS}
    tbl = (lambda lang: None) if d == SPARK else (lambda lang: f"t_{lang}")
    scores = ",\n             ".join(
        f"{LID.score_sql('bks', lang, d, tbl(lang))} AS score_{lang}_micro"
        for lang in LID.LANGS
    )
    pred = LID.pred_sql(score_cols)
    mdl = "" if d == SPARK else f"mdl AS ({LID.model_cte_sql(d)}),"
    src = "b" if d == SPARK else "b CROSS JOIN mdl"
    return f"""
    WITH {mdl}
    lowered AS (
      SELECT doc_id, text, lower(coalesce(text, '')) AS lt FROM documents
    ),
    g AS (SELECT doc_id, text, {gs} AS gs FROM lowered),
    b AS (SELECT doc_id, text, {bks} AS bks FROM g),
    s AS (
      SELECT doc_id, text,
             {scores}
      FROM {src}
    ),
    p AS (SELECT doc_id, text, {pred} AS lang_pred FROM s),
    gated AS (
      SELECT lang_pred AS lang, doc_id, md5(text) AS content_hash
      FROM p
      WHERE {n} >= 10
        AND {alpha_ratio} >= 0.5
        AND (lang_pred <> 'en' OR {stop_ratio} > 0)
    ),
    kept AS (
      SELECT lang, content_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
      FROM gated
      GROUP BY lang, content_hash
    )
    SELECT lang,
           count(*) AS docs_kept,
           cast(sum(n_copies) as bigint) AS docs_after_gates,
           cast(sum(n_copies) - count(*) as bigint) AS dups_removed
    FROM kept
    GROUP BY lang
    """


def _run_curation_pipeline_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form of ``_q_curation_pipeline_langid`` with the plan
    shape fixed (r11, guide §1.2 step 1): same per-row expressions, but

    - the two lang-INDEPENDENT gates (token count, alpha ratio) filter
      directly over the scan, where the pushed-down condition only
      references the raw ``text`` column — nothing to re-expand;
    - the classifier runs once per surviving row as a stack of
      projections (multi-use non-cheap aliases survive CollapseProject,
      the doc_langid shape);
    - the lang-DEPENDENT gate (``lang_pred <> 'en' OR stop_ratio > 0``)
      is folded into the first aggregate as a conditional count instead
      of a WHERE, so no Filter ever sits below the aggregate to trigger
      the PushDownPredicate alias re-expansion the template docstring
      describes. Groups with zero gated rows are dropped above the
      aggregate (``n_copies > 0`` is on an aggregate result, which
      cannot push down).

    Results identical to the template/oracle (pinned in
    tests/test_langid.py and the driver's hash check): 70.9 s → scan-
    rate at sf0.1."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators import langid as LID
    from distributedvectordatabase_spark.sources.tables import load_table

    toks = T.tokens("text", SPARK)
    n = f"{_asize(SPARK)}({toks})"
    stop = T.marker_score(toks, T.STOPWORDS_EN, SPARK)
    stop_ratio = f"(cast({stop} as double) / nullif({n}, 0))"
    strip = "regexp_replace(text, '[^A-Za-z]', '')"
    alpha_ratio = f"(cast(length({strip}) as double) / nullif(length(text), 0))"

    gs = LID.grams_sql("lt", SPARK)
    bks = LID.buckets_sql("gs", SPARK)
    score_names = {lang: f"score_{lang}_micro" for lang in LID.LANGS}
    pred = LID.pred_sql(score_names)

    docs = load_table(spark, "documents", sf_dir, spread=True)
    staged = (
        docs.filter(F.expr(f"{n} >= 10 AND {alpha_ratio} >= 0.5"))
        .select(
            "doc_id",
            "text",
            F.expr("lower(coalesce(text, ''))").alias("lt"),
        )
        .withColumn("gs", F.expr(gs))
        .withColumn("bks", F.expr(bks))
    )
    for lang in LID.LANGS:
        staged = staged.withColumn(
            score_names[lang], F.expr(LID.score_sql("bks", lang, SPARK))
        )
    p = staged.withColumn("lang_pred", F.expr(pred))
    gated_ok = (F.col("lang_pred") != F.lit("en")) | F.expr(f"{stop_ratio} > 0")
    p2 = p.select(
        F.col("lang_pred").alias("lang"),
        F.expr("md5(text)").alias("content_hash"),
        gated_ok.alias("ok"),
    )
    kept = (
        p2.groupBy("lang", "content_hash")
        .agg(F.count(F.when(F.col("ok"), F.lit(1))).alias("n_copies"))
        .filter(F.col("n_copies") > 0)
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("docs_kept"),
        F.sum("n_copies").cast("bigint").alias("docs_after_gates"),
        (F.sum("n_copies") - F.count("*")).cast("bigint").alias("dups_removed"),
    )


def _q_doc_tfidf_top3(d: str) -> str:
    """TF-IDF feature extraction: top-3 terms per document by
    tf * ln(N/df), ties broken by term. Ranking happens on the
    1e-6-rounded score so both engines rank identical keys. At scale
    this is two shuffles (doc-term TF, term DF) plus a broadcast of
    the tiny DF side — the standard two-pass formulation."""
    toks = T.tokens("text", d)
    if d == SPARK:
        ex = f"ex AS (SELECT doc_id, term FROM documents LATERAL VIEW explode({toks}) e AS term)"
    else:
        ex = f"ex AS (SELECT doc_id, unnest({toks}) AS term FROM documents)"
    return f"""
    WITH {ex},
    tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
    idf AS (SELECT term, count(distinct doc_id) AS df FROM ex GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             (cast(floor((tf.tf * (cast(floor((ln(cast(n.n_docs as double) / idf.df)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double))) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS tfidf
      FROM tf JOIN idf ON tf.term = idf.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) ranked
    WHERE rnk <= 3
    """


def _run_doc_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form of _q_doc_tfidf_top3 with the exploded (doc,
    term) frame cached — the SQL template's `ex` CTE feeds both TF and
    DF aggregations, and Catalyst inlines CTEs, so the template
    tokenizes the corpus twice. Caching halves the work; every
    expression mirrors the template so values stay oracle-identical."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    ex = docs.select(
        "doc_id", F.explode(F.expr(T.tokens("text", SPARK))).alias("term")
    ).cache()
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = ex.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # n_docs rides the plan as a broadcast one-row aggregate (the
    # template's own CROSS JOIN n shape) instead of a docs.count()
    # driver job — one fewer blocking action per call (guide §5), same
    # value: count(*) is an exact integer, and casting it to double in
    # the ln argument equals the old Python-float literal bit for bit.
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = tf.join(idf, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        # the ln() is quantized BEFORE the tf multiply: Java Math.log and
        # DuckDB's libm log may differ by one ulp on the same argument,
        # and tf (up to ~200) amplifies that past the final 1e-6 grain —
        # a deterministic log factor makes the product engine-identical
        _qz_col(
            F.col("tf")
            * _qz_col(F.log(F.col("n_docs").cast("double") / F.col("df")))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


def _q_doc_substring_dedup(d: str) -> str:
    """Exact repeated-substring detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    fingerprint variant of their suffix-array pass): every {K}-word
    window that occurs ≥ 2 times ANYWHERE in the corpus marks its span;
    overlapping marks merge into maximal spans per document
    (gaps-and-islands over start positions), and the gate reports the
    per-doc duplicated-token mass the trim pass would remove. This is
    corpus-global repetition — MinHash/SimHash find near-duplicate
    DOCUMENTS, the Gopher gate finds within-doc repetition; repeated
    boilerplate SPANS across documents (headers, licence blocks,
    navigation chrome) are exactly what neither catches.

    All arithmetic is integer (positions, window counts, span
    lengths); the only double is the final int/int fraction. Scale
    shape: one posexplode of K-shingles (corpus × ~len rows, the scan
    pass), repeated-window detection is a map-side-combinable count
    keyed by shingle, the span merge windows over each doc's own marks
    only — shuffle keys are (shingle) then (doc_id), nothing joins the
    corpus against itself row-by-row."""
    K = 8
    toks = T.tokens("text", d)
    if d == SPARK:
        ex = (
            "SELECT doc_id, pos, s FROM st "
            "LATERAL VIEW posexplode(shk) e AS pos, s"
        )
    else:
        # DuckDB: unnest WITH ORDINALITY via generate_subscripts idiom
        ex = (
            "SELECT doc_id, unnest(range(len(shk))) AS pos, "
            "unnest(shk) AS s FROM st"
        )
    prev_end = (
        f"max(pos + {K} - 1) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    dup_frac = (
        "(cast(floor((CASE WHEN n_words = 0 THEN 0.0 "
        "ELSE cast(coalesce(dup_tokens, 0) as double) / n_words END) "
        "* cast(1000000 as double) + cast(0.5 as double)) as bigint) "
        "/ cast(1000000 as double))"
    )
    return f"""
    WITH base AS (SELECT doc_id, {toks} AS toks FROM documents),
    st AS (
      SELECT doc_id, {_asize(d)}(toks) AS n_words,
             {T.word_shingles('toks', K, d)} AS shk
      FROM base
    ),
    sh AS ({ex}),
    dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
    marks AS (
      SELECT sh.doc_id, sh.pos FROM sh JOIN dup ON dup.s = sh.s
    ),
    islands AS (
      SELECT doc_id, pos,
             CASE WHEN {prev_end} IS NULL OR pos > {prev_end} + 1
                  THEN 1 ELSE 0 END AS is_new
      FROM marks
    ),
    grouped AS (
      SELECT doc_id, pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM islands
    ),
    spans AS (
      SELECT doc_id, island,
             min(pos) AS s_start, max(pos) + {K} - 1 AS s_end
      FROM grouped GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id,
             cast(count(*) as bigint) AS n_spans,
             cast(sum(s_end - s_start + 1) as bigint) AS dup_tokens
      FROM spans GROUP BY doc_id
    ),
    mark_counts AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_dup_windows
      FROM marks GROUP BY doc_id
    )
    SELECT st.doc_id,
           cast(st.n_words as bigint) AS n_words,
           cast(coalesce(m.n_dup_windows, 0) as bigint) AS n_dup_windows,
           cast(coalesce(p.n_spans, 0) as bigint) AS n_spans,
           cast(coalesce(p.dup_tokens, 0) as bigint) AS dup_tokens,
           {dup_frac} AS dup_frac,
           CASE WHEN coalesce(p.dup_tokens, 0) = 0 THEN 1 ELSE 0 END AS clean
    FROM st
    LEFT JOIN per_doc p ON p.doc_id = st.doc_id
    LEFT JOIN mark_counts m ON m.doc_id = st.doc_id
    """


def _run_doc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator form of ``_q_doc_substring_dedup`` (r11): same rows
    (pinned window≡join in tests/test_substring_dedup.py and against
    the DuckDB oracle), but the marks pass uses the ``via="window"``
    strategy — ONE pass over the shingle explode + one shuffle instead
    of the join form's two explode evaluations (the BASELINE r11
    window-vs-join section measured window faster at every probed
    scale, 85.5 s vs 129.8 s at 1M docs, including a planted
    30%-hot-shingle skew), plus the spread-scan fix so the explode
    parallelizes on the single-row-group testdata."""
    from distributedvectordatabase_spark.operators.substring_dedup import (
        substring_stats,
    )
    from distributedvectordatabase_spark.sources.tables import load_table

    return substring_stats(
        load_table(spark, "documents", sf_dir, spread=True), k=8, via="window"
    )


def _q_doc_dsir_weights(d: str) -> str:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram profile is, then
    select the top fraction. Features are unigrams + word bigrams
    hashed into {B} buckets; the target distribution comes from the
    corpus's own `lang = 'en'` slice (stand-in for the paper's
    high-quality target corpus — any target predicate slots in);
    per-bucket log-ratio λ_b = ln(p_target(b) / p_raw(b)) with add-one
    smoothing; a document's weight is Σ_b n_b(doc)·λ_b and the top 20%
    by weight are flagged ``selected``.

    Determinism discipline (the lm-score gate's): the ln argument is a
    single IEEE division of two EXACT integer products ((tc+1)(RC+B)
    over (rc+1)(TC+B) — no intermediate float), each λ_b is
    floor-quantized to integer micro-units, and per-doc weights are
    exact bigint dot products — summation order can't move a bit. The
    selection cut is integer cross-multiplication (rank·5 ≤ n_docs).

    Scale shape: the corpus is touched once (tokenize + shingle +
    per-(doc, term) count); buckets fold that to ≤ {B} rows per doc;
    the λ table is {B} rows — broadcast-sized at any corpus scale (the
    DataFrame form in operators/dsir.py broadcasts it); only the gate's
    final rank is a global window over one skinny row per doc, and the
    production path (dsir_select) replaces it with a top-k. The final
    BROADCAST(docs) hint is likewise gate-only decoration (the lang
    join-back for a driver-sized result); the production path returns
    weights keyed by doc_id with no corpus join at all."""
    B = 512
    toks = T.tokens("text", d)
    sh2 = T.word_shingles("toks", 2, d)
    if d == SPARK:
        exu = "SELECT doc_id, w AS s FROM base LATERAL VIEW explode(toks) eu AS w"
        exb = "SELECT doc_id, w AS s FROM base LATERAL VIEW explode(sh2) eb AS w"
    else:
        exu = "SELECT doc_id, unnest(toks) AS s FROM base"
        exb = "SELECT doc_id, unnest(sh2) AS s FROM base"
    logr = (
        "ln(cast((coalesce(tc, 0) + 1) * rtot as double)"
        " / cast((rc + 1) * ttot as double))"
    )
    lam_u = f"cast(floor(({logr}) * cast(1000000 as double) + cast(0.5 as double)) as bigint)"
    return f"""
    WITH base AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ),
    base2 AS (SELECT doc_id, {sh2} AS sh2 FROM base),
    occ AS ({exu} UNION ALL {exb.replace('base', 'base2')}),
    term AS (SELECT doc_id, s, count(*) AS c FROM occ GROUP BY doc_id, s),
    dt AS (
      SELECT doc_id, {T.hash64('s', d)} % {B} AS bkt, cast(sum(c) as bigint) AS k
      FROM term GROUP BY doc_id, {T.hash64('s', d)} % {B}
    ),
    raw AS (SELECT bkt, cast(sum(k) as bigint) AS rc FROM dt GROUP BY bkt),
    tgt AS (
      SELECT dt.bkt, cast(sum(dt.k) as bigint) AS tc
      FROM dt JOIN documents tdoc ON tdoc.doc_id = dt.doc_id AND tdoc.lang = 'en'
      GROUP BY dt.bkt
    ),
    tot_r AS (SELECT cast(sum(rc) as bigint) + {B} AS rtot FROM raw),
    tot_t AS (SELECT cast(coalesce(sum(tc), 0) as bigint) + {B} AS ttot FROM tgt),
    lam AS (
      -- hint is a comment to DuckDB; in Spark it pins the ≤{B}-row
      -- derived sides to broadcast (aggregates carry no size stats,
      -- so the planner would otherwise sort-merge a 512-row join)
      SELECT /*+ BROADCAST(tgt) */ raw.bkt, {lam_u} AS lam_u
      FROM raw LEFT JOIN tgt ON tgt.bkt = raw.bkt
      CROSS JOIN tot_r CROSS JOIN tot_t
    ),
    scored AS (
      SELECT /*+ BROADCAST(lam) */ dt.doc_id,
             cast(sum(dt.k) as bigint) AS n_feats,
             cast(sum(dt.k * lam.lam_u) as bigint) AS weight_micro
      FROM dt JOIN lam ON lam.bkt = dt.bkt
      GROUP BY dt.doc_id
    ),
    ranked AS (
      SELECT doc_id, n_feats, weight_micro,
             row_number() OVER (ORDER BY weight_micro DESC, doc_id) AS rnk
      FROM scored
    ),
    n AS (SELECT cast(count(*) as bigint) AS n_docs FROM documents)
    SELECT /*+ BROADCAST(docs) */ r.doc_id, docs.lang, r.n_feats, r.weight_micro,
           (cast(r.weight_micro as double) / cast(1000000 as double)) AS weight,
           cast(r.rnk as bigint) AS rnk,
           CASE WHEN r.rnk * 5 <= n.n_docs THEN 1 ELSE 0 END AS selected
    FROM ranked r
    JOIN documents docs ON docs.doc_id = r.doc_id
    CROSS JOIN n
    """


def _run_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame mirror of ``_q_doc_dsir_weights`` (r12, VERDICT r11
    #7) with one plan-shape fix, no persist and no extra driver
    actions (the r11 persist restructure measured SLOWER and was
    reverted — OPTIMIZATION_r11.md negative results): the per-bucket
    raw and target counts fold into ONE aggregation over ``dt`` joined
    with the broadcast (doc_id, lang) slice — ``rc = sum(k)``,
    ``tc = sum(k) FILTER (lang = 'en')`` as a conditional sum (the
    langid-gate pattern), instead of the template's two separate
    aggregations + LEFT JOIN. One fewer pass over ``dt`` and one fewer
    join; identical exact bigints (the doc_id join is key-preserving,
    conditional-sum nulls reproduce the LEFT JOIN's missing-bucket
    nulls). Measured at sf0.1 (idle, min-of-5): noop 3.38 → 2.60 s,
    count 1.95 → 1.79 s. A spread-scan variant of the heavy pipeline
    was A/B'd and REJECTED (noop 3.50, count 2.88 — the repartition
    exchange rides every inlined copy of the ``dt`` subtree and costs
    more than it parallelizes; OPTIMIZATION_r12.md).

    Every arithmetic expression is the template's verbatim (exact
    integer products, one IEEE divide inside ln, floor-quantized
    micro-units, exact bigint dot products), so rows are byte-identical
    to the DuckDB oracle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.sources.tables import load_table

    B = 512
    toks = T.tokens("text", SPARK)
    sh2 = T.word_shingles("toks", 2, SPARK)
    heavy = load_table(spark, "documents", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    base = heavy.select("doc_id", F.expr(toks).alias("toks"))
    occ = base.select("doc_id", F.explode("toks").alias("s")).unionAll(
        base.select("doc_id", F.expr(sh2).alias("sh2")).select(
            "doc_id", F.explode("sh2").alias("s")
        )
    )
    term = occ.groupBy("doc_id", "s").agg(F.count("*").alias("c"))
    dt = term.groupBy(
        "doc_id", F.expr(f"{T.hash64('s', SPARK)} % {B}").alias("bkt")
    ).agg(F.expr("cast(sum(c) as bigint)").alias("k"))
    # merged raw+target bucket stats: one aggregation, conditional sum
    lang = docs.select("doc_id", "lang")
    bs = (
        dt.join(F.broadcast(lang), "doc_id")
        .groupBy("bkt")
        .agg(
            F.expr("cast(sum(k) as bigint)").alias("rc"),
            F.expr(
                "cast(sum(CASE WHEN lang = 'en' THEN k END) as bigint)"
            ).alias("tc"),
        )
    )
    tots = bs.agg(
        F.expr(f"cast(sum(rc) as bigint) + {B}").alias("rtot"),
        F.expr(f"cast(coalesce(sum(tc), 0) as bigint) + {B}").alias("ttot"),
    )
    logr = (
        "ln(cast((coalesce(tc, 0) + 1) * rtot as double)"
        " / cast((rc + 1) * ttot as double))"
    )
    lam = bs.crossJoin(F.broadcast(tots)).select(
        "bkt",
        F.expr(
            f"cast(floor(({logr}) * cast(1000000 as double)"
            " + cast(0.5 as double)) as bigint)"
        ).alias("lam_u"),
    )
    scored = (
        dt.join(F.broadcast(lam), "bkt")
        .groupBy("doc_id")
        .agg(
            F.expr("cast(sum(k) as bigint)").alias("n_feats"),
            F.expr("cast(sum(k * lam_u) as bigint)").alias("weight_micro"),
        )
    )
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("weight_micro").desc(), "doc_id")
        ),
    )
    n = docs.agg(F.expr("cast(count(*) as bigint)").alias("n_docs"))
    return (
        ranked.join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "lang",
            "n_feats",
            "weight_micro",
            F.expr(
                "cast(weight_micro as double) / cast(1000000 as double)"
            ).alias("weight"),
            F.expr("cast(rnk as bigint)").alias("rnk"),
            F.expr("CASE WHEN rnk * 5 <= n_docs THEN 1 ELSE 0 END").alias(
                "selected"
            ),
        )
    )


def _q_doc_gopher_repetition(d: str) -> str:
    """Gopher-style n-gram repetition FILTER (Rae et al. 2021, App. A —
    the repetition rules large-scale curation applies before training):
    per document, the fraction of word-characters covered by the single
    most-covering 2-gram (``top2_frac``) and the fraction of 5-gram
    occurrence characters that belong to duplicated 5-grams
    (``dup5_frac``), plus type-token ratio and the composed keep/drop
    verdict at the Gopher thresholds (top-2-gram ≤ 0.20, dup-5-gram ≤
    0.15). Complements ``doc_quality``'s scalar per-row profile with
    the explode+aggregate form the real rules need — counts are per
    (doc, shingle), not derivable row-locally.

    Determinism architecture: every count/char tally is INTEGER (so
    engine sum order is irrelevant), the keep verdict is evaluated as
    integer cross-multiplication (``top2*5 <= chars`` etc. — no float
    compare at the threshold), and the reported fractions are one IEEE
    division of identical ints, quantized 1e-6 by the shared
    floor-round macro. The 100 TB shape: shingles materialize once per
    doc, both n-gram passes are map-side-combinable groupBys keyed by
    (doc_id, shingle) — no join against the corpus, shuffle bounded by
    distinct shingles, and the verdict join-back is per-doc skinny."""
    toks = T.tokens("text", d)
    q6 = "(cast(floor(({x}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double))"
    if d == SPARK:
        ex2 = "SELECT doc_id, s FROM st LATERAL VIEW explode(sh2) e2 AS s"
        ex5 = "SELECT doc_id, s FROM st LATERAL VIEW explode(sh5) e5 AS s"
    else:
        ex2 = "SELECT doc_id, unnest(sh2) AS s FROM st"
        ex5 = "SELECT doc_id, unnest(sh5) AS s FROM st"
    # empty docs guard to 0.0 like dup5_frac (ADVICE r9: an unguarded
    # n_words/total_chars = 0 yielded NULL here while the sibling
    # fractions yielded 0.0 — both engines agreed, but the output
    # contract was inconsistent)
    ttr = q6.format(
        x="CASE WHEN n_words = 0 THEN 0.0 "
        "ELSE cast(n_types as double) / n_words END"
    )
    top2_frac = q6.format(
        x="CASE WHEN total_chars = 0 THEN 0.0 "
        "ELSE cast(coalesce(top2_chars, 0) as double) / total_chars END"
    )
    dup5_frac = q6.format(
        x="CASE WHEN coalesce(all5_chars, 0) = 0 THEN 0.0 "
        "ELSE cast(coalesce(dup5_chars, 0) as double) / all5_chars END"
    )
    return f"""
    WITH base AS (SELECT doc_id, {toks} AS toks FROM documents),
    st AS (
      SELECT doc_id,
             {_asize(d)}(toks) AS n_words,
             {_asize(d)}({_adistinct(d)}(toks)) AS n_types,
             {T.sum_token_lengths('toks', d)} AS total_chars,
             {T.word_shingles('toks', 2, d)} AS sh2,
             {T.word_shingles('toks', 5, d)} AS sh5
      FROM base
    ),
    c2 AS (SELECT doc_id, s, count(*) AS c FROM ({ex2}) x GROUP BY doc_id, s),
    t2 AS (SELECT doc_id, cast(max(c * (length(s) - 1)) as bigint) AS top2_chars
           FROM c2 GROUP BY doc_id),
    c5 AS (SELECT doc_id, s, count(*) AS c FROM ({ex5}) y GROUP BY doc_id, s),
    t5 AS (SELECT doc_id,
                  cast(sum(CASE WHEN c >= 2 THEN c * (length(s) - 4) ELSE 0 END) as bigint) AS dup5_chars,
                  cast(sum(c * (length(s) - 4)) as bigint) AS all5_chars
           FROM c5 GROUP BY doc_id)
    SELECT st.doc_id,
           cast(n_words as bigint) AS n_words,
           cast(n_types as bigint) AS n_types,
           cast(total_chars as bigint) AS total_chars,
           cast(coalesce(top2_chars, 0) as bigint) AS top2_chars,
           cast(coalesce(dup5_chars, 0) as bigint) AS dup5_chars,
           cast(coalesce(all5_chars, 0) as bigint) AS all5_chars,
           {ttr} AS ttr,
           {top2_frac} AS top2_frac,
           {dup5_frac} AS dup5_frac,
           CASE WHEN coalesce(top2_chars, 0) * 5 <= total_chars
                 AND coalesce(dup5_chars, 0) * 20 <= coalesce(all5_chars, 0) * 3
                THEN 1 ELSE 0 END AS keep
    FROM st
    LEFT JOIN t2 ON st.doc_id = t2.doc_id
    LEFT JOIN t5 ON st.doc_id = t5.doc_id
    """


def _q_bpe_pair_stats(d: str) -> str:
    """One BPE merge step's statistics (Sennrich 2016 — the loop body
    of tokenizer training): frequency of every adjacent character pair,
    weighted by word frequency; top-20 by (count desc, pair). The gate
    is all-integer, so it hash-compares with zero float parity surface.

    The 100 TB shape is the point: the corpus-sized work is ONE
    whitespace tokenize + word-frequency aggregation (map-side
    combinable, the word-count plan), and the pair explode runs over
    the DISTINCT VOCABULARY — millions of rows, not the corpus — each
    word carrying its frequency. Exploding pairs straight off the
    corpus would multiply the scan by avg word length; folding to
    vocab first makes every later merge iteration vocabulary-bounded.
    Pairs come from ``transform(sequence(...))`` / ``list_transform(
    range(...))`` — a codegen-fused projection, no join, and the
    length >= 2 guard keeps Spark's descending-sequence corner out."""
    toks = T.tokens("text", d)
    if d == SPARK:
        words = f"SELECT word FROM documents LATERAL VIEW explode({toks}) e AS word"
        mk = "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"
        ex = "SELECT freq, pair FROM wp LATERAL VIEW explode(pairs) e AS pair"
    else:
        words = f"SELECT unnest({toks}) AS word FROM documents"
        mk = "list_transform(range(1, length(word)), i -> substring(word, i, 2))"
        ex = "SELECT freq, unnest(pairs) AS pair FROM wp"
    return f"""
    WITH w AS ({words}),
    vf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
    wp AS (SELECT freq, {mk} AS pairs FROM vf WHERE length(word) >= 2),
    p AS ({ex}),
    agg AS (SELECT pair, cast(sum(freq) as bigint) AS cnt FROM p GROUP BY pair)
    SELECT pair, cnt, rnk FROM (
      SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
      FROM agg
    ) r WHERE rnk <= 20
    """


# Frozen unigram-LM piece table for the doc_unigram_tokens gate:
# trained ONCE via operators/unigram.unigram_train on the sf0.001
# documents corpus (vocab_size=80, seed_size=600, max_piece_len=5,
# em_iters=2) and inlined as literals so the gate is self-contained
# and deterministic at every sf — the _pca_oracle trick (r8). EM
# training itself stays pytest-gated (KMeans-class, not
# SQL-expressible); what the gate hash-checks externally is the
# VITERBI APPLY — the serving-path DP both engines must segment
# identically. Single-char coverage of the testdata alphabet is
# asserted in tests/test_unigram_gate.py; unseen single chars fall
# back to the operator's UNK_LP (-20.0) in both dialects.
_UNIGRAM_PIECES: dict[str, float] = {
    "a": -3.5845020541792323, "agg": -3.561152006499878,
    "b": -31.144032746924207, "batch": -3.607322310466902,
    "big": -3.629545447251612, "c": -4.723138615682071,
    "can": -27.848195880919878, "colum": -3.8989009346976573,
    "cus": -26.63317324040736, "cust": -24.45194900441758,
    "custo": -3.630669675472891, "d": -31.144032746924207,
    "dat": -25.962249196632122, "data": -3.622826497201526,
    "dup": -7.053471079991322, "e": -31.144032746924207,
    "f": -31.144032746924207, "fast": -3.6040310293828277,
    "filte": -3.599659437721332, "g": -31.144032746924207,
    "ge": -28.94680816958799, "gg": -26.020068767520947,
    "group": -3.5812904717489538, "h": -31.144032746924207,
    "hash": -3.5931376754749422, "i": -31.144032746924207,
    "indo": -28.746137474125838, "indow": -4.230453535223024,
    "j": -31.144032746924207, "join": -3.579151433500204,
    "k": -31.144032746924207, "key": -3.5695819824840527,
    "l": -31.144032746924207, "line": -3.5685243409259186,
    "low": -27.925156922056008, "m": -22.81848443976281,
    "mall": -27.885936208902724, "me": -23.01721902619809,
    "mer": -3.630669679269289, "merge": -3.5802203806987336,
    "n": -3.8988932958252356, "o": -31.144032746924207,
    "olumn": -4.72315603360336, "omer": -24.45194900441758,
    "orde": -23.19954058299205, "order": -3.538329441872257,
    "ort": -27.848195880919878, "ow": -12.387889769088861,
    "p": -31.144032746924207, "park": -27.848195880919878,
    "part": -3.5507134981796717, "q": -31.144032746924207,
    "query": -3.5812904717489538, "r": -2.898833048798121,
    "ream": -25.180453403305762, "ro": -27.647525185457727,
    "row": -3.657041224672696, "s": -3.5974751414062744,
    "sca": -30.450885566364263, "scan": -3.5291462906854036,
    "slo": -28.19959376775777, "slow": -3.5953068737702623,
    "small": -3.6205968417045504, "sort": -3.5393556063629816,
    "spark": -3.6073223104965706, "st": -25.180453403305762,
    "strea": -22.81848443976281, "t": -31.144032746924207,
    "table": -3.615044356560812, "the": -3.607322310466902,
    "tomer": -26.63317324040736, "tream": -3.597480792537233,
    "u": -31.144032746924207, "v": -31.144032746924207,
    "value": -3.564304925383208, "vecto": -3.5845076327007277,
    "w": -3.5373063545882815, "wind": -16.644244223869052,
    "windo": -4.230453535223024, "y": -31.144032746924207,
}
_UNIGRAM_L = 5
_UNIGRAM_UNK = -20.0  # == operators.unigram.UNK_LP


def _unigram_lookup(expr: str) -> str:
    """CASE-table piece lookup — identical syntax in both dialects, so
    both engines bind the SAME double for every piece (decimal literal
    -> nearest double is IEEE-defined)."""
    arms = " ".join(
        f"WHEN '{p}' THEN CAST({lp!r} AS DOUBLE)"
        for p, lp in sorted(_UNIGRAM_PIECES.items())
    )
    return f"(CASE {expr} {arms} END)"


def _q_doc_unigram_tokens(d: str) -> str:
    """Unigram-LM (SentencePiece-family, Kudo 2018) Viterbi APPLY as a
    dual-dialect SQL program — the external gate for the
    operators/unigram.py tokenizer family (VERDICT r9 #3). Each
    distinct word is segmented by the max-log-prob dynamic program
    over the frozen piece table above (ties resolve toward the LONGER
    piece: candidates are scanned longest-first with strict ``>`` —
    viterbi_segment's exact convention, pinned bit-for-bit against the
    Python operator in tests/test_unigram_gate.py). Spark runs the DP
    as ``aggregate`` higher-order folds (pure Catalyst, no UDF);
    DuckDB as recursive CTEs. Bit parity holds because both engines
    fold the SAME IEEE additions in the SAME order over the SAME
    parsed literals, and every comparison is strict.

    100 TB shape: the corpus contributes ONE tokenize + distinct-word
    fold (the bpe_apply/word_vocab statistic — vocabulary-bounded);
    the DP runs per DISTINCT word only; the join-back is the
    size-aware vocabulary join. Per-doc outputs are integer counts, a
    micro-quantized exact-bigint log-prob sum (summation order cannot
    move a bit), and an md5 fingerprint of the doc's full
    segmentation in token order."""
    L = _UNIGRAM_L
    toks = T.tokens("text", d)
    if d == SPARK:
        ex = (
            "SELECT doc_id, pos, w FROM base "
            "LATERAL VIEW posexplode(toks) e AS pos, w"
        )

        def cand(l: int) -> str:
            look = _unigram_lookup(f"substring(w, greatest(i - {l} + 1, 1), {l})")
            if l == 1:
                look = f"coalesce({look}, CAST({_UNIGRAM_UNK!r} AS DOUBLE))"
            return (
                f"IF(i >= {l}, named_struct("
                f"'s', coalesce({look} + element_at(acc.best, greatest(i - {l} + 1, 1)), CAST(-1e18 AS DOUBLE)), "
                f"'j', i - {l}), "
                "named_struct('s', CAST(-1e18 AS DOUBLE), 'j', -1))"
            )

        cands = ", ".join(cand(l) for l in range(L, 0, -1))
        pick = (
            f"aggregate(array({cands}), "
            "named_struct('s', CAST(-1e18 AS DOUBLE), 'j', -1), "
            "(p, c) -> IF(c.s > p.s, c, p))"
        )
        dp = (
            "aggregate(sequence(1, length(w)), "
            "named_struct('best', array(CAST(0.0 AS DOUBLE)), 'back', array(0)), "
            f"(acc, i) -> aggregate(array({pick}), acc, "
            "(a2, c) -> named_struct("
            "'best', concat(a2.best, array(c.s)), "
            "'back', concat(a2.back, array(c.j)))))"
        )
        piece = (
            "substring(w, element_at(dpa.back, a3.i + 1) + 1, "
            "a3.i - element_at(dpa.back, a3.i + 1))"
        )
        bt = (
            "aggregate(sequence(1, n), "
            "named_struct('i', n, 's', CAST('' AS STRING), 'np', 0), "
            "(a3, step) -> IF(a3.i <= 0, a3, named_struct("
            "'i', element_at(dpa.back, a3.i + 1), "
            f"'s', CASE WHEN a3.s = '' THEN {piece} "
            f"ELSE concat({piece}, '|', a3.s) END, "
            "'np', a3.np + 1)))"
        )
        word_sql = f"""
        dp AS (SELECT w, length(w) AS n, {dp} AS dpa FROM dw),
        segw AS (
          SELECT w, n, {bt} AS bt,
                 element_at(dpa.best, n + 1) AS lp_word
          FROM dp
        ),
        seg2 AS (
          SELECT w, bt.s AS seg, bt.np AS np,
                 CAST(floor(lp_word * 1000000.0 + 0.5) AS BIGINT) AS lpw_micro
          FROM segw
        )"""
        fp = (
            "md5(array_join(transform("
            "array_sort(collect_list(struct(pos, seg))), x -> x.seg), ' '))"
        )
    else:
        ex = (
            "SELECT doc_id, unnest(range(len(toks))) AS pos, "
            "unnest(toks) AS w FROM base"
        )

        def cand_d(l: int) -> str:
            look = _unigram_lookup(f"substr(w, greatest(i - {l} + 2, 1), {l})")
            if l == 1:
                look = f"coalesce({look}, CAST({_UNIGRAM_UNK!r} AS DOUBLE))"
            return (
                f"CASE WHEN i + 1 >= {l} THEN "
                f"{{'s': coalesce({look} + best[greatest(i - {l} + 2, 1)], CAST(-1e18 AS DOUBLE)), 'j': i + 1 - {l}}} "
                "ELSE {'s': CAST(-1e18 AS DOUBLE), 'j': -1} END"
            )

        cands_d = ", ".join(cand_d(l) for l in range(L, 0, -1))
        pick_d = (
            f"list_reduce([{{'s': CAST(-1e18 AS DOUBLE), 'j': -1}}, {cands_d}], "
            "(a, c) -> CASE WHEN c.s > a.s THEN c ELSE a END)"
        )
        piece_d = "substr(w, back[i + 1] + 1, i - back[i + 1])"
        word_sql = f"""
        r AS (
          SELECT w, length(w) AS n, 0 AS i,
                 [CAST(0 AS DOUBLE)] AS best, [0] AS back
          FROM dw
          UNION ALL
          SELECT w, n, i + 1,
                 list_append(best, ({pick_d}).s),
                 list_append(back, ({pick_d}).j)
          FROM r WHERE i < n
        ),
        dpn AS (SELECT w, n, best, back FROM r WHERE i = n),
        bt AS (
          SELECT w, n, back, n AS i, CAST('' AS VARCHAR) AS s, 0 AS np,
                 best[n + 1] AS lp_word
          FROM dpn
          UNION ALL
          SELECT w, n, back, back[i + 1] AS i,
                 CASE WHEN s = '' THEN {piece_d}
                      ELSE {piece_d} || '|' || s END,
                 np + 1, lp_word
          FROM bt WHERE i > 0
        ),
        seg2 AS (
          SELECT w, s AS seg, np,
                 CAST(floor(lp_word * 1000000.0 + 0.5) AS BIGINT) AS lpw_micro
          FROM bt WHERE i = 0
        )"""
        fp = "md5(string_agg(seg, ' ' ORDER BY pos))"
    recursive = "RECURSIVE " if d != SPARK else ""
    return f"""
    WITH {recursive}base AS (SELECT doc_id, {toks} AS toks FROM documents),
    ex AS ({ex}),
    dw AS (SELECT DISTINCT w FROM ex),
    {word_sql},
    joined AS (
      SELECT e.doc_id, e.pos, s.seg, s.np, s.lpw_micro
      FROM ex e JOIN seg2 s ON s.w = e.w
    ),
    agg AS (
      SELECT doc_id,
             cast(count(*) as bigint) AS n_words,
             cast(sum(np) as bigint) AS n_pieces,
             cast(sum(lpw_micro) as bigint) AS lp_micro,
             {fp} AS pieces_fp
      FROM joined GROUP BY doc_id
    )
    SELECT b.doc_id,
           cast(coalesce(a.n_words, 0) as bigint) AS n_words,
           cast(coalesce(a.n_pieces, 0) as bigint) AS n_pieces,
           cast(coalesce(a.lp_micro, 0) as bigint) AS lp_micro,
           (cast(coalesce(a.lp_micro, 0) as double) / cast(1000000 as double)) AS lp,
           coalesce(a.pieces_fp, md5('')) AS pieces_fp
    FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
    """


def _q_doc_sample_fingerprint(d: str) -> str:
    """Deterministic ~1/8 sample via content-independent hashing of the
    key — reproducible across engines, runs, and cluster sizes, unlike
    TABLESAMPLE/rand(seed) whose streams are engine-specific (the
    portable trick for train/test splits and sampled profiling at
    100 TB: the predicate is a cheap scan filter, no shuffle) — plus
    the rolling-hash document fingerprint of each sampled doc."""
    s = "string" if d == SPARK else "varchar"
    return f"""
    SELECT doc_id, lang, n_chars, {T.fingerprint('text', d)} AS fp
    FROM documents
    WHERE substring(md5(cast(doc_id as {s})), 1, 1) IN ('0', '1')
    """


def _q_doc_lm_score(d: str) -> str:
    """Char-trigram language-model quality score — the perplexity
    filter of CCNet-style curation pipelines, self-trained: the corpus
    itself supplies the trigram statistics, and each document is scored
    by the mean smoothed log-probability of its trigrams
    ``ln((c3 + 0.5) / (c2 + 32))`` (add-½ smoothing against a 64-symbol
    pseudo-alphabet; c2 = the trigram's 2-char context count). Junk
    documents (rare character sequences) score low; fluent ones score
    near the corpus mode — exactly how ppl-based quality filters rank.

    Determinism discipline (the BM25 gate's): each per-trigram log is
    floor-quantized to integer micro-units FIRST, the per-doc total is
    an exact bigint sum (order-independent), and only the final mean is
    a float division, re-quantized. Scale shape: two groupBy passes
    over the exploded trigrams (counts are corpus-global, reused by
    every doc) and one join back — all shuffles on trigram keys, no
    driver state."""
    D = T._d(d)
    sh3 = T.char_shingles("text", 3, d)
    arr = f"{D['filter']}({sh3}, s -> length(s) = 3)"
    if d == SPARK:
        tri = (
            "tri AS (SELECT doc_id, t3 FROM docs3 "
            "LATERAL VIEW explode(arr3) e AS t3)"
        )
    else:
        tri = "tri AS (SELECT doc_id, unnest(arr3) AS t3 FROM docs3)"
    logp = "ln((c3.c3 + 0.5) / (c2.c2 + 32.0))"
    micro = f"cast(floor(({logp}) * cast(1000000 as double) + cast(0.5 as double)) as bigint)"
    return f"""
    WITH docs3 AS (SELECT doc_id, {arr} AS arr3 FROM documents),
    {tri},
    -- everything downstream works on per-(doc, trigram) COUNTS, not
    -- occurrences: k occurrences of a trigram contribute k·micro
    -- exactly (integer arithmetic), and the corpus-size row stream
    -- shrinks before any join
    dt AS (SELECT doc_id, t3, count(*) AS k FROM tri GROUP BY doc_id, t3),
    -- bigint casts: DuckDB's sum(bigint) widens to DECIMAL, Spark's
    -- stays bigint — pin the shared type so the smoothing arithmetic
    -- and the output schema agree across engines
    c3 AS (SELECT t3, cast(sum(k) as bigint) AS c3 FROM dt GROUP BY t3),
    -- context counts derive from the tiny c3 table (sum of trigram
    -- counts grouped by their 2-char prefix == count of trigrams per
    -- prefix, exactly), never a second corpus pass
    c2 AS (SELECT substring(t3, 1, 2) AS t2, cast(sum(c3) as bigint) AS c2 FROM c3 GROUP BY substring(t3, 1, 2)),
    scored AS (
      SELECT dt.doc_id, cast(sum(dt.k * {micro}) as bigint) AS sum_u,
             cast(sum(dt.k) as bigint) AS n_tri
      FROM dt
      JOIN c3 ON c3.t3 = dt.t3
      JOIN c2 ON c2.t2 = substring(dt.t3, 1, 2)
      GROUP BY dt.doc_id
    )
    SELECT d.doc_id, d.lang, cast(coalesce(s.n_tri, 0) as bigint) AS n_tri,
           {_qz("cast(s.sum_u as double) / nullif(s.n_tri, 0) / cast(1000000 as double)")} AS lm_score
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """


def doc_lm_score_df(docs: DataFrame) -> DataFrame:
    """DataFrame form of _q_doc_lm_score with identical arithmetic
    (every scoring expression is the template's own SQL text via
    F.expr, so parsing/typing match the oracle's Spark dialect), but
    the per-(doc, trigram) count table is PERSISTED (memory+disk,
    lineage kept — localCheckpoint would truncate lineage and die on
    block eviction at probe scale) instead of re-exploded per CTE
    reference — engines inline CTEs, so the pure-SQL form pays the
    corpus explode for each of its three consumers; this pays it once
    (1.75× at the 200k-doc probe). ``docs`` needs (doc_id, text,
    lang).

    The persist is session-lifetime (the returned DataFrame is lazy,
    so this function has no point to release it); callers scoring the
    same corpus repeatedly share the cache, and a caller that needs
    the storage back unpersists via
    ``spark.catalog.clearCache()`` or tracks the intermediate
    themselves. At gate scale the table is KBs; the 1M-doc probe's is
    a few GB of memory+disk."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    D = T._d(SPARK)
    sh3 = T.char_shingles("text", 3, SPARK)
    arr = f"{D['filter']}({sh3}, s -> length(s) = 3)"
    dt = (
        docs.selectExpr("doc_id", f"explode({arr}) AS t3")
        .groupBy("doc_id", "t3")
        .agg(F.count("*").alias("k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c3 = dt.groupBy("t3").agg(F.expr("sum(k)").alias("c3"))
    c2 = (
        c3.groupBy(F.expr("substring(t3, 1, 2)").alias("t2"))
        .agg(F.expr("sum(c3)").alias("c2"))
    )
    micro = (
        "cast(floor((ln((c3 + 0.5) / (c2 + 32.0))) * cast(1000000 as double)"
        " + cast(0.5 as double)) as bigint)"
    )
    scored = (
        dt.join(F.broadcast(c3), "t3")
        .join(F.broadcast(c2), F.expr("substring(t3, 1, 2)") == F.col("t2"))
        .groupBy("doc_id")
        .agg(
            F.expr(f"cast(sum(k * {micro}) as bigint)").alias("sum_u"),
            F.expr("cast(sum(k) as bigint)").alias("n_tri"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(scored.withColumnRenamed("n_tri", "_nt"), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.expr("cast(coalesce(_nt, 0) as bigint)").alias("n_tri"),
            F.expr(
                _qz(
                    "cast(sum_u as double) / nullif(_nt, 0) / cast(1000000 as double)"
                )
            ).alias("lm_score"),
        )
    )


def _run_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return doc_lm_score_df(spark.table("documents"))


def _q_doc_pii_scrub(d: str) -> str:
    """PII redaction pass (training-data scrubbing: emails, IPv4s,
    +prefixed phones, long id runs — functions/text.PII_RULES applied
    in order on the progressively-scrubbed text, so a digit run inside
    an already-redacted email never double-counts). The synthetic
    corpus carries no PII, so the gate INJECTS deterministic synthetic
    PII derived from doc_id (doc_id % 4 picks the kind) and then
    verifies both engines redact and count it identically — pure
    string ops in the Java-regex ∩ RE2 subset, no float boundary
    anywhere. Scale shape: per-row scalar expressions fused into the
    scan, embarrassingly parallel."""
    s = "string"  # DuckDB aliases STRING to VARCHAR
    seeded = f"""
      SELECT doc_id, source,
             text || CASE cast(doc_id % 4 AS int)
               WHEN 0 THEN ' contact user' || cast(doc_id AS {s}) || '@mail.example.com for details'
               WHEN 1 THEN ' origin host 10.' || cast(doc_id % 200 AS {s}) || '.0.' || cast(doc_id % 50 AS {s}) || ' logged'
               WHEN 2 THEN ' call +1 (415) 555-' || lpad(cast(doc_id % 10000 AS {s}), 4, '0') || ' today'
               ELSE ' case id 90210' || lpad(cast(doc_id % 10000 AS {s}), 6, '0') || ' filed'
             END AS txt
      FROM documents
    """
    steps, prev, carry = [], "seeded", []
    for i, (kind, pattern, token) in enumerate(T.PII_RULES):
        cnt = T.pii_count("txt", pattern, d)
        rep = T.pii_replace("txt", pattern, token, d)
        cols = ", ".join(["doc_id", "source"] + carry)
        steps.append(
            f"s{i} AS (SELECT {cols}, {cnt} AS n_{kind}, {rep} AS txt FROM {prev})"
        )
        carry.append(f"n_{kind}")
        prev = f"s{i}"
    counts = ", ".join(carry)
    return f"""
    WITH seeded AS ({seeded}),
    {", ".join(steps)}
    SELECT doc_id, source, {counts}, txt AS scrubbed_text
    FROM {prev}
    """


# BM25 gate query: one rare term ("dup" — the planted-duplicate marker,
# df ≈ 5% of docs) plus two common ones, so the ranking exercises both
# the idf spread and the length normalization.
BM25_TERMS = ("dup", "vector", "query")
BM25_K = 15
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_oracle_sql(
    terms=BM25_TERMS, k: int = BM25_K, k1: float = BM25_K1, b: float = BM25_B
) -> str:
    """DuckDB twin of operators/search.bm25_topk — same tokenizer, same
    Lucene-form idf, same per-term 1e-6 quantization + exact decimal
    sum (order-independent score), same (score desc, doc_id) ranking.
    Literals are rendered with repr() so both engines parse the exact
    same doubles."""
    terms_sql = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    k1p1, k1r, omb, br = repr(k1 + 1.0), repr(k1), repr(1.0 - b), repr(b)
    return f"""
    WITH base AS (
      SELECT doc_id, {T.tokens('text', DUCKDB)} AS toks FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, sum(len(toks)) AS total_len FROM base),
    filt AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base
    ),
    tfq AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM filt
      WHERE term IN ({terms_sql})
      GROUP BY doc_id, dl, term
    ),
    dft AS (
      SELECT term, count(*) AS df FROM tfq GROUP BY term
    ),
    contrib AS (
      SELECT t.doc_id,
             {_qz(f"ln((s.n_docs - d2.df + 0.5) / (d2.df + 0.5) + 1.0)"
                  f" * (t.tf * {k1p1})"
                  f" / (t.tf + {k1r} * ({omb} + ({br} * t.dl)"
                  f" / (cast(s.total_len as double) / s.n_docs)))")} AS c
      FROM tfq t JOIN dft d2 USING (term) CROSS JOIN stats s
    ),
    sc AS (
      SELECT doc_id, sum(cast(c as decimal(38,6))) AS score_dec
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id,
           (cast(floor(score_dec * 1000000 + 0.5) as bigint) / cast(1000000 as double)) AS score,
           rnk
    FROM (
      SELECT doc_id, score_dec,
             row_number() OVER (ORDER BY score_dec DESC, doc_id) AS rnk
      FROM sc
    ) x
    WHERE rnk <= {k}
    """


CHUNK_MAX_TOKENS = 32
CHUNK_OVERLAP = 8
PACK_BUDGET = 256


def _q_doc_chunks(d: str) -> str:
    """Sliding-window document chunking (training-data shaping): at
    most CHUNK_MAX_TOKENS tokens per chunk, stride = max - overlap.
    Oracle twin of operators/chunking.chunk_documents."""
    mt, ov = CHUNK_MAX_TOKENS, CHUNK_OVERLAP
    stride = mt - ov
    tok = T.tokens("text", d)
    tok_col = T.tokens("col", SPARK)
    tok_chunk = T.tokens("chunk_text", DUCKDB)
    if d == SPARK:
        return f"""
        WITH b AS (
          SELECT doc_id, {tok} AS toks FROM documents
        ),
        c AS (
          SELECT doc_id,
                 transform(
                   sequence(0, cast(1 + ceil(greatest(size(toks) - {mt}, 0) / {stride}) as int) - 1),
                   i -> concat_ws(' ', slice(toks, i * {stride} + 1, {mt}))
                 ) AS chunk
          FROM b
        )
        SELECT doc_id, pos AS chunk_id, col AS chunk_text,
               size({tok_col}) AS n_tokens
        FROM c LATERAL VIEW posexplode(chunk) AS pos, col
        """
    return f"""
    WITH b AS (
      SELECT doc_id, {tok} AS toks FROM documents
    ),
    c AS (
      SELECT doc_id,
             list_transform(
               range(0, cast(1 + ceil(greatest(len(toks) - {mt}, 0) / {stride}) as int)),
               i -> array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {mt}), ' ')
             ) AS chunk
      FROM b
    ),
    e AS (
      SELECT doc_id, generate_subscripts(chunk, 1) - 1 AS chunk_id,
             unnest(chunk) AS chunk_text
      FROM c
    )
    SELECT doc_id, chunk_id, chunk_text, len({tok_chunk}) AS n_tokens FROM e
    """


def _run_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gates operators/chunking.chunk_documents (the DataFrame form)."""
    from distributedvectordatabase_spark.operators.chunking import chunk_documents
    from distributedvectordatabase_spark.sources.tables import load_table

    return chunk_documents(
        load_table(spark, "documents", sf_dir),
        max_tokens=CHUNK_MAX_TOKENS,
        overlap=CHUNK_OVERLAP,
    )


def _q_doc_packs(d: str) -> str:
    """Token-budget sequence packing by cumulative-sum segmentation
    within each language group (oracle twin of
    operators/chunking.pack_documents)."""
    tok = T.tokens("text", d)
    ln = "size" if d == SPARK else "len"
    return f"""
    WITH b AS (
      SELECT lang, doc_id, {ln}({tok}) AS n_tokens FROM documents
    )
    SELECT lang,
           cast(floor((sum(n_tokens) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens) / {PACK_BUDGET}) as int) AS pack_id,
           doc_id, n_tokens
    FROM b
    """


def _run_doc_packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributedvectordatabase_spark.operators.chunking import pack_documents
    from distributedvectordatabase_spark.sources.tables import load_table

    return pack_documents(
        load_table(spark, "documents", sf_dir), budget=PACK_BUDGET
    )


# Mixture for the mix_weighted_sources gate: upsample src0 2.5 epochs,
# sample src1 down to 25%, drop src2, keep the other 17 sources at 1.0.
# Exercises every rate regime (integer replication, fractional Bernoulli
# epoch, pure downsample, drop, default).
MIX_RATES: dict[str, float] = {"src0": 2.5, "src1": 0.25, "src2": 0.0}
MIX_DEFAULT_RATE = 1.0
MIX_SALT = "mix"


def _q_mix_weighted(d: str) -> str:
    """Oracle twin of operators/mixing.mix_corpus + mixture_report:
    deterministic per-source epoch expansion via the shared md5 grid
    hash, audited per source (input/output size, epochs, token mass,
    achieved rate). Sources dropped by rate 0 still report a row."""
    import math

    def grid(r: float) -> float:
        return round(r * 1_000_000) / 1_000_000

    full_arms = " ".join(
        f"WHEN '{s}' THEN {math.floor(grid(r))}" for s, r in MIX_RATES.items()
    )
    frac_arms = " ".join(
        f"WHEN '{s}' THEN cast({grid(r) - math.floor(grid(r))!r} as double)"
        for s, r in MIX_RATES.items()
    )
    d_full = math.floor(grid(MIX_DEFAULT_RATE))
    d_frac = grid(MIX_DEFAULT_RATE) - d_full
    n_epoch_rows = max(
        math.ceil(grid(r)) for r in [*MIX_RATES.values(), MIX_DEFAULT_RATE]
    )
    epoch_values = ", ".join(f"({e})" for e in range(n_epoch_rows))
    u = (
        "("
        + T.hash64(
            "concat(cast(doc_id as string), ':', cast(epoch as string), "
            f"':', '{MIX_SALT}')",
            d,
        )
        + " % 1000000) / cast(1000000 as double)"
    )
    toks = T.tokens("text", d)
    return f"""
    WITH rated AS (
      SELECT doc_id, source,
             CASE source {full_arms} ELSE {d_full} END AS n_full,
             CASE source {frac_arms} ELSE cast({d_frac!r} as double) END AS frac,
             {_asize(d)}({toks}) AS n_toks
      FROM documents
    ),
    mixed AS (
      SELECT r.source, r.doc_id, e.epoch, r.n_toks
      FROM rated r CROSS JOIN (VALUES {epoch_values}) AS e(epoch)
      WHERE e.epoch < r.n_full + (CASE WHEN r.frac > 0 THEN 1 ELSE 0 END)
        AND (e.epoch < r.n_full OR {u} < r.frac)
    ),
    agg AS (
      SELECT source, count(*) AS docs_out, max(epoch) + 1 AS epochs_used,
             cast(sum(n_toks) as bigint) AS weight_out
      FROM mixed GROUP BY source
    ),
    inp AS (
      SELECT source, count(doc_id) AS docs_in FROM documents GROUP BY source
    )
    SELECT inp.source,
           docs_in,
           coalesce(docs_out, cast(0 as bigint)) AS docs_out,
           coalesce(epochs_used, 0) AS epochs_used,
           coalesce(weight_out, cast(0 as bigint)) AS weight_out,
           {_qz('cast(coalesce(docs_out, 0) as double) / docs_in')} AS rate_achieved
    FROM inp LEFT JOIN agg ON inp.source = agg.source
    """


def _run_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gates operators/mixing (deterministic weighted source mixing)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.mixing import (
        mix_corpus,
        mixture_report,
    )
    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    mixed = mix_corpus(
        docs, MIX_RATES, default_rate=MIX_DEFAULT_RATE, salt=MIX_SALT
    ).withColumn("n_toks", F.expr(f"{_asize(SPARK)}({T.tokens('text', SPARK)})"))
    return mixture_report(docs, mixed, weight_col="n_toks").select(
        "source", "docs_in", "docs_out", "epochs_used", "weight_out", "rate_achieved"
    )


STRAT_K = 5
STRAT_SALT = "strat"


def _q_strat_sample(d: str) -> str:
    """Oracle twin of operators/mixing.stratified_sample: exact
    per-source quota of STRAT_K docs, ranked by the (id, salt) grid
    hash with id tie-break — the full-window form, which the Spark
    side's survivor-prefilter path must equal exactly."""
    u = (
        "("
        + T.hash64(f"concat(cast(doc_id as string), ':', '{STRAT_SALT}')", d)
        + " % 1000000) / cast(1000000 as double)"
    )
    return f"""
    WITH h AS (
      SELECT doc_id, source, lang, n_chars, {u} AS u FROM documents
    ),
    r AS (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
               AS sample_rank
      FROM h
    )
    SELECT doc_id, source, lang, n_chars, sample_rank
    FROM r WHERE sample_rank <= {STRAT_K}
    """


def _run_strat_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gates operators/mixing.stratified_sample (prefilter scale path)."""
    from distributedvectordatabase_spark.operators.mixing import stratified_sample
    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return stratified_sample(docs, STRAT_K, salt=STRAT_SALT).select(
        "doc_id", "source", "lang", "n_chars", "sample_rank"
    )


STRATW_K = 5
STRATW_SALT = "stratw"


def _q_strat_sample_weighted(d: str) -> str:
    """Oracle twin of stratified_sample(weight_col=...): per-source
    probability-proportional-to-weight order sample (Ohlsson sequential
    Poisson) — rank key u / n_chars, k smallest win. The key is one
    IEEE division of engine-identical operands, so ordering (and the
    sample) is bit-exact across engines; the E-S u^(1/w) form would
    need pow/log, which is not."""
    u = (
        "("
        + T.hash64(f"concat(cast(doc_id as string), ':', '{STRATW_SALT}')", d)
        + " % 1000000) / cast(1000000 as double)"
    )
    return f"""
    WITH h AS (
      SELECT doc_id, source, n_chars, {u} / cast(n_chars as double) AS key
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    ),
    r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY key, doc_id)
               AS sample_rank
      FROM h
    )
    SELECT doc_id, source, n_chars, sample_rank
    FROM r WHERE sample_rank <= {STRATW_K}
    """


def _run_strat_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gates operators/mixing.stratified_sample's weighted path
    (weight-aware survivor prefilter must equal the full window)."""
    from distributedvectordatabase_spark.operators.mixing import stratified_sample
    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return stratified_sample(
        docs, STRATW_K, salt=STRATW_SALT, weight_col="n_chars"
    ).select("doc_id", "source", "n_chars", "sample_rank")


def _run_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical ranked retrieval (BM25 top-k) — the text-side twin of
    vector kNN and the second leg of hybrid search. Gates
    operators/search.bm25_topk."""
    from distributedvectordatabase_spark.operators.search import bm25_topk
    from distributedvectordatabase_spark.sources.tables import load_table

    return bm25_topk(
        load_table(spark, "documents", sf_dir),
        list(BM25_TERMS),
        k=BM25_K,
        k1=BM25_K1,
        b=BM25_B,
    )


HYBRID_K = 10
HYBRID_FETCH = 40
RRF_C = 60


def _run_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval end-to-end (the reference's whole user surface
    is query-by-vector, coordinator_server.py:76-141; real systems pair
    it with a lexical leg): exact cosine kNN over embeddings + BM25
    over documents, fused with reciprocal-rank fusion. Gates
    operators/search.hybrid_topk (and through it rrf_fuse), with the
    semantic leg ranked on the 1e-6-quantized distance so rank
    positions — the only thing RRF consumes — are engine-deterministic
    (see hybrid_topk's dist_quantize doc)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.search import hybrid_topk
    from distributedvectordatabase_spark.sources.tables import load_table

    corpus = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    qvec = corpus.filter(F.col("vec_id") == 0).first().embedding
    out = hybrid_topk(
        docs,
        corpus,
        qvec,
        list(BM25_TERMS),
        k=HYBRID_K,
        fetch_k=HYBRID_FETCH,
        rrf_c=RRF_C,
        metric="cosine",
        dist_quantize=6,
    )
    return out.select("doc_id", _qz_col("rrf_score").alias("rrf_score"), "rnk")


def hybrid_rrf_oracle_sql(
    k: int = HYBRID_K, fetch: int = HYBRID_FETCH, c: int = RRF_C
) -> str:
    """DuckDB twin of the hybrid gate: same over-fetch depth per leg,
    same quantized-distance semantic ranking, same BM25 leg as
    bm25_oracle_sql, same full-outer RRF (a missing leg contributes 0).
    1.0/(c + rank) on exact integer ranks is two correctly-rounded IEEE
    ops, so the raw fused score is engine-identical and safe to rank on."""
    cd = _cos_dist("q.qvec", "e.embedding", DUCKDB)
    cf = repr(float(c))
    return f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    vd AS (
      SELECT e.vec_id AS doc_id, {_qz(cd)} AS qdist
      FROM q CROSS JOIN embeddings e
      ORDER BY {cd}, e.vec_id
      LIMIT {fetch}
    ),
    vec AS (
      SELECT doc_id, row_number() OVER (ORDER BY qdist, doc_id) AS rnk FROM vd
    ),
    txt AS (SELECT doc_id, rnk FROM ({bm25_oracle_sql(k=fetch)}) b),
    fused AS (
      SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
             coalesce(1.0 / ({cf} + v.rnk), 0.0)
             + coalesce(1.0 / ({cf} + t.rnk), 0.0) AS rrf
      FROM vec v FULL OUTER JOIN txt t ON v.doc_id = t.doc_id
    )
    SELECT doc_id, {_qz('rrf')} AS rrf_score, rnk
    FROM (
      SELECT doc_id, rrf,
             row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused
    ) x
    WHERE rnk <= {k}
    """


HYBRID_WHERE_LABEL = 3


def _hybrid_serve_stores(spark: SparkSession, sf_dir: str):
    """Build-once persistent VectorStore + TextIndex pair for the
    filtered-serve gate (the _ivf_gate_store pattern: fingerprint-keyed
    /tmp dirs, rebuilt when the driver regenerates testdata)."""
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.text_index import TextIndex
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    vs = VectorStore(_gate_tmp_path("dvdb_hybrid_gate_vs", sf_dir))
    if not os.path.exists(vs._lsh_config_path):
        vs.write(load_table(spark, "embeddings", sf_dir))
    ix = TextIndex(
        _gate_tmp_path("dvdb_hybrid_gate_ix", sf_dir, table="documents"),
        n_buckets=8,
    )
    if not os.path.exists(ix._stats_path):
        ix.build(load_table(spark, "documents", sf_dir))
    return vs, ix


def _run_hybrid_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered hybrid serving (r8): metadata-filtered search is the
    reference's own declared future work (COCO_INSTRUCTIONS.md:121-125)
    and hybrid retrieval is the engine's flagship composed query — this
    gate composes them end-to-end THROUGH the persisted stores:
    hybrid_serve_batch(where=...) restricts the semantic leg to
    matching rows (predicate pushed next to the shard pruning) and
    applies the same predicate to the BM25 leg as a hard pre-top-k
    constraint with corpus-global statistics (the standard IR filtered-
    retrieval contract — a filter narrows candidates, it does not
    re-weight the collection)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.search import (
        hybrid_serve_batch,
    )
    from distributedvectordatabase_spark.sources.tables import load_table

    vs, ix = _hybrid_serve_stores(spark, sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    queries = spark.createDataFrame(
        [(0, qvec, list(BM25_TERMS))],
        "qid long, qvec array<double>, terms array<string>",
    )
    out = hybrid_serve_batch(
        spark, vs, ix, queries,
        k=HYBRID_K, fetch_k=HYBRID_FETCH, rrf_c=RRF_C,
        metric="cosine", dist_quantize=6,
        where=f"label = {HYBRID_WHERE_LABEL}",
    )
    return out.select("doc_id", _qz_col("rrf_score").alias("rrf_score"), "rnk")


def hybrid_filtered_oracle_sql(
    k: int = HYBRID_K, fetch: int = HYBRID_FETCH, c: int = RRF_C,
    label: int = HYBRID_WHERE_LABEL,
) -> str:
    """DuckDB twin of the filtered-serve gate: the semantic CTE adds
    the label predicate before its fetch cut (exact filtered kNN); the
    lexical leg ranks the FULL corpus with global df/idf/avgdl, then
    applies the filter before the fetch cut and re-ranks among the
    survivors — exactly bm25_batch(allowed_ids=...)'s semi-join-before-
    window semantics. Fusion identical to hybrid_rrf_oracle_sql."""
    cd = _cos_dist("q.qvec", "e.embedding", DUCKDB)
    cf = repr(float(c))
    return f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    vd AS (
      SELECT e.vec_id AS doc_id, {_qz(cd)} AS qdist
      FROM q CROSS JOIN embeddings e
      WHERE e.label = {label}
      ORDER BY {cd}, e.vec_id
      LIMIT {fetch}
    ),
    vec AS (
      SELECT doc_id, row_number() OVER (ORDER BY qdist, doc_id) AS rnk FROM vd
    ),
    allb AS (
      SELECT b.doc_id, b.rnk AS orig
      FROM ({bm25_oracle_sql(k=1000000)}) b
      JOIN embeddings em ON em.vec_id = b.doc_id
      WHERE em.label = {label}
    ),
    txt AS (
      SELECT doc_id, rnk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY orig) AS rnk FROM allb
      ) t WHERE rnk <= {fetch}
    ),
    fused AS (
      SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
             coalesce(1.0 / ({cf} + v.rnk), 0.0)
             + coalesce(1.0 / ({cf} + t.rnk), 0.0) AS rrf
      FROM vec v FULL OUTER JOIN txt t ON v.doc_id = t.doc_id
    )
    SELECT doc_id, {_qz('rrf')} AS rrf_score, rnk
    FROM (
      SELECT doc_id, rrf,
             row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused
    ) x
    WHERE rnk <= {k}
    """


def _q_decontam(d: str) -> str:
    """Benchmark decontamination (GPT-3/PaLM-style n-gram overlap):
    a deterministic md5 key split carves ~1/16 of documents out as the
    "benchmark" corpus; every remaining (training) doc is scored by how
    many of its distinct 3-word shingles appear anywhere in the
    benchmark. Oracle twin of operators/decontam.ngram_contamination
    (whose plan broadcasts the benchmark shingle set — the train side
    is scanned once, never shuffled un-aggregated)."""
    s = "string" if d == SPARK else "varchar"
    shs = f"{_adistinct(d)}({T.word_shingles(T.tokens('text', d), 3, d)})"
    if d == SPARK:
        explode_bench = "SELECT DISTINCT explode(shs) AS shingle FROM d WHERE is_bench"
        explode_docs = "SELECT doc_id, explode(shs) AS shingle FROM d WHERE NOT is_bench"
        asize = "size"
    else:
        explode_bench = "SELECT DISTINCT unnest(shs) AS shingle FROM d WHERE is_bench"
        explode_docs = "SELECT doc_id, unnest(shs) AS shingle FROM d WHERE NOT is_bench"
        asize = "len"
    return f"""
    WITH d AS (
      SELECT doc_id, {shs} AS shs,
             substring(md5(cast(doc_id as {s})), 1, 1) = 'f' AS is_bench
      FROM documents
    ),
    bench AS ({explode_bench}),
    ds AS ({explode_docs}),
    hits AS (
      SELECT ds.doc_id, count(*) AS n_hits
      FROM ds JOIN bench ON ds.shingle = bench.shingle
      GROUP BY ds.doc_id
    )
    SELECT d.doc_id, {asize}(d.shs) AS n_shingles, h.n_hits,
           {_qz(f"cast(h.n_hits as double) / {asize}(d.shs)")} AS contamination
    FROM d JOIN hits h ON d.doc_id = h.doc_id
    WHERE NOT d.is_bench
    """


def _run_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared decontamination pass: deterministic benchmark split +
    broadcast n-gram overlap via operators/decontam."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.decontam import ngram_contamination
    from distributedvectordatabase_spark.sources.tables import load_table

    # train side over the spread scan (guide §2.5: the shingle+md5
    # expression work otherwise single-threads on the one-row-group
    # testdata layout); the benchmark side — a ~1/16 slice that only
    # feeds the broadcast shingle set — stays on the plain scan so the
    # broadcast build never pays a repartition. (The r11 blanket-spread
    # A/B taxed BOTH references and lost; this is the asymmetric form.)
    docs = load_table(spark, "documents", sf_dir, spread=True)
    bench_docs = load_table(spark, "documents", sf_dir)
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f"
    out = ngram_contamination(
        docs.filter(~is_bench), bench_docs.filter(is_bench), n=3
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        _qz_col(F.col("n_hits").cast("double") / F.col("n_shingles")).alias(
            "contamination"
        ),
    )


def _q_dedup_exact(d: str) -> str:
    return """
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    """


def _minhash_cte(
    d: str,
    toks_expr: str | None = None,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> str:
    toks = toks_expr or f"{_adistinct(d)}({T.tokens('text', d)})"
    sigs = ", ".join(
        f"{T.minhash_sig('toks', j, d)} AS h{j}" for j in range(bands * rows)
    )
    band_sql = "\n      UNION ALL\n".join(
        "SELECT doc_id, {b} AS band, concat({hs}) AS band_key FROM sig".format(
            b=b,
            hs=", ".join(f"h{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    sig AS (SELECT doc_id, toks, {sigs} FROM t),
    bands AS ({band_sql}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    """


def _minhash_verify_sql(d: str, threshold: float) -> str:
    return f"""
    SELECT doc_a, doc_b, (cast(floor((jaccard) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS jaccard
    FROM (
      SELECT c.doc_a, c.doc_b, {_jaccard('ta.toks', 'tb.toks', d)} AS jaccard
      FROM cand c
      JOIN t ta ON ta.doc_id = c.doc_a
      JOIN t tb ON tb.doc_id = c.doc_b
    ) v
    WHERE jaccard >= {threshold}
    """


def _q_dedup_minhash(d: str) -> str:
    return _minhash_cte(d) + _minhash_verify_sql(d, MINHASH_JACCARD)


# Shingle-input MinHash: on low-vocab corpora (this testdata: ~40-word
# vocabulary, median unigram Jaccard 0.63) unigram token sets saturate
# and banding goes near-quadratic; 3-word shingles restore a bimodal
# similarity distribution (true dups ≥0.9, everything else ≈0), so the
# band join touches only real candidates — the recommended MinHash
# input on any real corpus.
SHINGLE_BANDS = 4
SHINGLE_ROWS = 3
SHINGLE_JACCARD = 0.9


def _shingle_toks(d: str) -> str:
    return f"{_adistinct(d)}({T.word_shingles(T.tokens('text', d), 3, d)})"


def _q_dedup_minhash_shingle(d: str) -> str:
    return (
        _minhash_cte(d, toks_expr=_shingle_toks(d), bands=SHINGLE_BANDS, rows=SHINGLE_ROWS)
        + _minhash_verify_sql(d, SHINGLE_JACCARD)
    )


def _q_dedup_simhash(d: str) -> str:
    # md5 digests hoisted into their own CTE so each token is hashed
    # once, not once per signature bit (32x fewer md5 calls).
    hs = T.token_hashes(T.tokens("text", d), d)
    sh = T.simhash_from_hashes("hs", d, bits=SIMHASH_BITS)
    return f"""
    WITH h AS (SELECT doc_id, {hs} AS hs FROM documents),
         s AS (SELECT doc_id, {sh} AS sh FROM h)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {_xor_popcount('a.sh', 'b.sh', d)} AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE {_xor_popcount('a.sh', 'b.sh', d)} <= {SIMHASH_MAX_HAMMING}
    """



def _shingle_sets(d: str) -> str:
    """(doc_id, distinct 3-shingle set) with empty sets dropped."""
    ln = "size" if d == SPARK else "len"
    sh = f"{_adistinct(d)}({T.word_shingles(T.tokens('text', d), 3, d)})"
    return (
        f"(SELECT doc_id, sh FROM (SELECT doc_id, {sh} AS sh FROM documents) "
        f"WHERE {ln}(sh) > 0)"
    )


# Exact set-similarity join + dup clustering. θ chosen for the driver
# corpus's bimodal 3-shingle Jaccard (true dups ≥0.9, everything else
# ≈0); the exact prefix-filter join is recall-1 at θ by construction,
# which is what lets the Spark runner match a brute-force O(n²) oracle.
SETSIM_JACCARD = 0.9


def _setsim_edges(d: str) -> str:
    j = _jaccard("a.sh", "b.sh", d)
    return f"""
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {j} AS jaccard
      FROM sh_sets a JOIN sh_sets b ON a.doc_id < b.doc_id
      WHERE {j} >= {SETSIM_JACCARD}
    """


def _q_setsim_pairs(d: str) -> str:
    """Oracle: brute-force O(n²) all-pairs Jaccard over 3-shingles.
    The Spark runner computes the SAME pairs with the prefix-filtered
    AllPairs join (operators/setsim.py) — exact, so the outputs are
    identical, but sub-quadratic: only pairs sharing a rare-prefix
    shingle are ever scored."""
    return f"""
    WITH sh_sets AS {_shingle_sets(d)}
    SELECT doc_a, doc_b, (cast(floor((jaccard) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS jaccard
    FROM ({_setsim_edges(d)}) e
    """


def _run_setsim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.setsim import similarity_join
    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir, spread=True)
    sets = docs.select(
        "doc_id",
        F.expr(
            f"array_distinct({T.word_shingles(T.tokens('text', SPARK), 3, SPARK)})"
        ).alias("sh"),
    )
    pairs = similarity_join(sets, "doc_id", "sh", SETSIM_JACCARD)
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        _qz_col("jaccard").alias("jaccard"),
    )


def _q_dedup_clusters(d: str) -> str:
    """Oracle: transitive closure of the ≥θ near-dup graph via a
    recursive CTE (label propagation to fixpoint), min label = cluster
    id. The Spark runner is the scale path: exact prefix-filter edges →
    large-star/small-star connected components (operators/components.py),
    O(log n) shuffle rounds instead of O(n²) memory."""
    return f"""
    WITH RECURSIVE sh_sets AS {_shingle_sets(d)},
    edges AS ({_setsim_edges(d)}),
    bidir AS (
      SELECT doc_a AS x, doc_b AS y FROM edges
      UNION
      SELECT doc_b, doc_a FROM edges
    ),
    reach(node, comp) AS (
      SELECT x, x FROM bidir
      UNION
      SELECT b.y, r.comp FROM reach r JOIN bidir b ON b.x = r.node
    ),
    assign AS (SELECT node, min(comp) AS cluster_id FROM reach GROUP BY node)
    SELECT node AS doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM assign
    """


def _run_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.components import (
        connected_components,
    )

    edges = _run_setsim_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    assignments = connected_components(edges)
    w = Window.partitionBy("component")
    return assignments.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# event queries (X6 time buckets, X7 JSON, sessionization)
# ---------------------------------------------------------------------------


def _q_events_json(d: str) -> str:
    k = _json_int("props", "$.k", d)
    return f"""
    SELECT event_type,
           count(*) AS n_events,
           (cast(floor((cast(sum({k}) as double) / count(*)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_k,
           max({k}) AS max_k, min({k}) AS min_k
    FROM events
    GROUP BY event_type
    """


def _q_events_sessions(d: str) -> str:
    """Sessionization (lag: 30-min-gap session starts) merged with
    next-event gap analytics (lead) — one user_id window shuffle feeds
    both. Gap sums stay integer micros (exact, engine-independent) and
    only convert to seconds at the end."""
    gap_us = 30 * 60 * 1_000_000
    m = _micros("ts", d)
    w = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return f"""
    WITH o AS (
      SELECT user_id,
             CASE WHEN lag({m}) {w} IS NULL
                       OR {m} - lag({m}) {w} > {gap_us}
                  THEN 1 ELSE 0 END AS new_sess,
             lead({m}) {w} - {m} AS gap_us
      FROM events
    )
    SELECT user_id,
           cast(sum(new_sess) as bigint) AS n_sessions,
           count(*) AS n_events,
           (cast(floor((cast(sum(gap_us) as double) / nullif(count(gap_us), 0) / 1e6) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_gap_s,
           (cast(floor((max(gap_us) / 1e6) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS max_gap_s
    FROM o
    GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# relational star-schema queries (X8)
# ---------------------------------------------------------------------------

_REVENUE = "l_extendedprice"  # with discount applied below


def _rev(d: str) -> str:
    return f"sum({_dec('l_extendedprice', '14,4')} * {_dec('1 - l_discount', '8,4')})"


def _q_tpch_q1(d: str) -> str:
    charge = (
        f"sum({_dec('l_extendedprice', '14,4')} * {_dec('1 - l_discount', '8,4')}"
        f" * {_dec('1 + l_tax', '8,4')})"
    )
    return f"""
    SELECT l_returnflag, l_linestatus,
           (cast(floor((sum({_dec('l_quantity', '14,4')})) * 10000 + 0.5) as bigint) / cast(10000 as double)) AS sum_qty,
           (cast(floor((sum({_dec('l_extendedprice', '14,4')})) * 100 + 0.5) as bigint) / cast(100 as double)) AS sum_base_price,
           (cast(floor(({_rev(d)}) * 100 + 0.5) as bigint) / cast(100 as double)) AS sum_disc_price,
           (cast(floor(({charge}) * 100 + 0.5) as bigint) / cast(100 as double)) AS sum_charge,
           (cast(floor(((cast(floor((sum({_dec('l_quantity', '14,4')})) * 10000 + 0.5) as bigint) / cast(10000 as double)) / count(*)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_qty,
           (cast(floor(((cast(floor((sum({_dec('l_extendedprice', '14,4')})) * 100 + 0.5) as bigint) / cast(100 as double)) / count(*)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_price,
           (cast(floor(((cast(floor((sum({_dec('l_discount', '8,4')})) * 10000 + 0.5) as bigint) / cast(10000 as double)) / count(*)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """


def _q_tpch_q3(d: str) -> str:
    return f"""
    SELECT o.o_orderkey, {_day('o.o_orderdate', d)} AS orderdate, o.o_orderpriority,
           (cast(floor(({_rev(d)}) * 100 + 0.5) as bigint) / cast(100 as double)) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < timestamp '1999-01-01 00:00:00'
      AND l.l_shipdate > timestamp '1999-01-01 00:00:00'
    GROUP BY o.o_orderkey, {_day('o.o_orderdate', d)}, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """


def _q_tpch_q5(d: str) -> str:
    return f"""
    SELECT n.n_name, (cast(floor(({_rev(d)}) * 100 + 0.5) as bigint) / cast(100 as double)) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o.o_orderdate < timestamp '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """



def _q_sales_grouping_sets(d: str) -> str:
    """GROUPING SETS superset of ROLLUP(l_returnflag, l_linestatus):
    four aggregation grains — (flag, status), (flag), (status), grand
    total — in one scan with one expanded shuffle. Covers the rollup
    hierarchy plus the cross grain the rollup can't express."""
    return f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_items,
           (cast(floor((sum({_dec('l_quantity', '14,4')})) * 10000 + 0.5) as bigint) / cast(10000 as double)) AS sum_qty,
           (cast(floor(({_rev(d)}) * 100 + 0.5) as bigint) / cast(100 as double)) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
    """


def _q_customer_rank_analytics(d: str) -> str:
    """Ranking-window family over per-customer revenue (merged decile +
    per-nation top-k gates): ntile spend deciles plus row_number rank
    within the customer's nation, over the orders⋈customer aggregate.
    Both engines define ntile identically (equal-height buckets,
    earlier buckets take the remainder) and the (revenue, custkey)
    order is tie-free, so values match exactly.

    Scale note: the un-partitioned ntile OVER (ORDER BY ...) funnels
    its input through ONE window task. Acceptable here because the
    window input is the per-customer aggregate (orders of magnitude
    smaller than the fact table after the group-by); for
    decile-bucketing a full-size table, use approx percentile
    cut-points + a broadcast range join instead of ntile. The customer
    dimension join is broadcastable."""
    return f"""
    WITH spend AS (
      SELECT o_custkey, sum({_dec('o_totalprice', '16,4')}) AS revenue
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_nationkey, s.o_custkey,
           (cast(floor((s.revenue) * 10000 + 0.5) as bigint) / cast(10000 as double)) AS revenue,
           ntile(10) OVER (ORDER BY s.revenue DESC, s.o_custkey) AS decile,
           row_number() OVER (PARTITION BY c.c_nationkey
                              ORDER BY s.revenue DESC, s.o_custkey) AS nation_rank
    FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
    """


def _q_order_window_ranks(d: str) -> str:
    """Per-order window functions in one pass (merged running-revenue +
    percent-rank gates): a cumulative frame (unbounded-preceding sum
    per customer) and the percent_rank/cume_dist ranking pair per
    priority. Every ORDER BY includes the key, so ranks and frames are
    tie-free and deterministic across engines; Catalyst evaluates the
    two window specs over one scan with one sort per spec."""
    wr = "OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)"
    return f"""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           (cast(floor((sum({_dec('o_totalprice', '16,4')}) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) * 100 + 0.5) as bigint) / cast(100 as double)) AS running_revenue,
           (cast(floor((percent_rank() {wr}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS price_pct_rank,
           (cast(floor((cume_dist() {wr}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS price_cume_dist
    FROM orders
    """


def _q_priority_stats(d: str) -> str:
    """Per-priority order profile: counts, distinct customers, exact
    decimal totals, plus exact continuous quantiles (median/p90).

    The quantiles are computed by explicit rank selection + the
    canonical linear interpolation (idx = p·(n−1); lo/hi ranks; lo +
    (hi−lo)·frac) instead of Spark ``percentile`` / DuckDB
    ``quantile_cont``: the builtins implement the same definition but
    not necessarily the same *expression shape*, and a one-ulp
    interpolation difference is a data-dependent hash flip. With the
    formula written once in shared SQL, every arithmetic step is the
    same IEEE operation in both engines.

    Scale note: rank selection needs one window sort partitioned by the
    (low-cardinality, skew-prone) group key — the right shape for a
    correctness gate over `orders`; for ad-hoc quantiles on a fact
    table at 100 TB reach for approx_percentile instead, which never
    needs the global per-group sort."""
    def quant(p: str) -> tuple[str, str, str]:
        idx = f"cast({p} as double) * (n - 1)"
        lo = f"cast(floor({idx}) as bigint) + 1"
        hi = f"least(cast(floor({idx}) as bigint) + 2, n)"
        frac = f"max({idx} - floor({idx}))"
        return (
            f"max(CASE WHEN rn = {lo} THEN v END)",
            f"max(CASE WHEN rn = {hi} THEN v END)",
            frac,
        )

    m_lo, m_hi, m_f = quant("0.5")
    p_lo, p_hi, p_f = quant("0.9")
    return f"""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice AS v,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    base AS (
      SELECT o_orderpriority,
             count(*) AS n_orders,
             count(distinct o_custkey) AS n_customers,
             {_dq(f"sum({_dec('o_totalprice', '16,4')})", 2)} AS total_price
      FROM orders GROUP BY o_orderpriority
    ),
    q AS (
      SELECT o_orderpriority,
             {m_lo} AS m_lo, {m_hi} AS m_hi, {m_f} AS m_f,
             {p_lo} AS p_lo, {p_hi} AS p_hi, {p_f} AS p_f
      FROM ranked GROUP BY o_orderpriority
    )
    SELECT b.o_orderpriority, b.n_orders, b.n_customers, b.total_price,
           {_qz("q.m_lo + (q.m_hi - q.m_lo) * q.m_f")} AS median_price,
           {_qz("q.p_lo + (q.p_hi - q.p_lo) * q.p_f")} AS p90_price
    FROM base b JOIN q ON b.o_orderpriority = q.o_orderpriority
    """



def _q_lineitem_price_stats(d: str) -> str:
    """Statistical aggregates: Pearson correlation, sample covariance
    and stddev of (quantity, extendedprice) per return flag — computed
    from EXACT DECIMAL co-moments, not the corr/covar_samp/stddev_samp
    builtins. The builtins use different internal update algorithms in
    the two engines (co-moment streaming vs naive sums, different
    accumulation order), so their doubles diverge below 1e-6 in a
    data-dependent way — a residual hash-flip risk every time the
    testdata regenerates. Decimal sums of x, y, x², y², xy are exact
    and engine-identical; each is quantized to a deterministic double
    (catalog._dq), and the textbook formulas then run in IEEE doubles
    identically in both engines. Still one scan with partial+final
    map-side-combined aggregation — five decimal sums instead of three
    streaming moments.

    Scale bound: the integer-quantized Σy² fits bigint up to ~sf100 of
    TPC-H lineitem (8.7e17 at sf100 vs 9.2e18); past that, widen to a
    two-level aggregation or drop to the builtins and a looser gate."""
    # Product operand width is dialect-specific but the products stay
    # EXACT in both: DuckDB multiplies decimal(14,4) on int64 and
    # overflows on price², so it gets decimal(19,4) (int128 path,
    # result (38,8) exact); Spark keeps (14,4) because its product type
    # (29,8) is exact under the 38-precision cap, while widening to
    # (19,4) there would produce (39,8) -> precision-capped (38,7) and
    # silently ROUND each product.
    p44 = "14,4" if d == SPARK else "19,4"
    sx = f"sum({_dec('l_quantity', '14,4')})"
    sy = f"sum({_dec('l_extendedprice', '14,4')})"
    sxx = f"sum({_dec('l_quantity', p44)} * {_dec('l_quantity', p44)})"
    syy = f"sum({_dec('l_extendedprice', p44)} * {_dec('l_extendedprice', p44)})"
    sxy = f"sum({_dec('l_quantity', p44)} * {_dec('l_extendedprice', p44)})"
    n = "cast(count(*) as double)"
    return f"""
    SELECT l_returnflag,
           n_items,
           {_qz("(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))")} AS qty_price_corr,
           {_qz("(sxy - sx * sy / n) / (n - 1)")} AS qty_price_covar,
           {_qz("sqrt((n * sxx - sx * sx) / (n * (n - 1)))")} AS qty_stddev
    FROM (
      SELECT l_returnflag,
             count(*) AS n_items,
             {n} AS n,
             {_dq(sx, 4)} AS sx,
             {_dq(sy, 4)} AS sy,
             {_dq(sxx, 4)} AS sxx,
             {_dq(syy, 0)} AS syy,
             {_dq(sxy, 0)} AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    ) m
    """


def _q_order_part_lists(d: str) -> str:
    """Array aggregation: per-order sorted part-key list (emitted as a
    joined string so the cross-engine value compare stays scalar).
    Spark's collect_list is order-nondeterministic under parallelism —
    the sort_array makes the result well-defined, the rule for ANY
    array_agg at scale."""
    if d == SPARK:
        lst = "array_join(sort_array(collect_list(l_partkey)), ',')"
    else:
        lst = "array_to_string(list_sort(list(l_partkey)), ',')"
    return f"""
    SELECT l_orderkey, count(*) AS n_items, {lst} AS part_keys
    FROM lineitem
    GROUP BY l_orderkey
    """



def _q_customer_set_ops(d: str) -> str:
    """Both SQL set-ops in one gate (SURVEY §2.2 set-ops row), tagged:
    EXCEPT (customers who never ordered) and INTERSECT (customers who
    ordered in both halves of the date range). Catalyst plans both as
    aggregate + left-anti/left-semi joins — no full materialization of
    either side; the tag is a literal projection on top."""
    return """
    SELECT 'never_ordered' AS tag, c_custkey AS custkey FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    ) a
    UNION ALL
    SELECT 'repeat_both_halves' AS tag, custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate < DATE '1998-01-01'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= DATE '1998-01-01'
    ) b
    """


def _run_returnflag_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (DataFrame.unpivot/melt): the pivot result folded back to
    long form — reshaping both ways is a projection-only operation, no
    extra shuffle beyond the pivot's aggregation."""
    wide = _run_returnflag_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["rev_open", "rev_finished"],
        variableColumnName="status",
        valueColumnName="revenue",
    )


def _returnflag_unpivot_oracle() -> str:
    pivot = _returnflag_pivot_oracle()
    return f"""
    WITH wide AS ({pivot})
    SELECT l_returnflag, 'rev_open' AS status, rev_open AS revenue FROM wide
    UNION ALL
    SELECT l_returnflag, 'rev_finished' AS status, rev_finished AS revenue FROM wide
    """


def _q_source_regex_stats(d: str) -> str:
    """Regex scalar functions (string-function family): extract the
    numeric id from the source tag, bucket sources mod 4, aggregate.
    regexp_extract shares capture-group semantics across engines;
    the pattern uses [0-9] instead of \\d because string-literal escape
    rules differ (Spark eats the backslash, DuckDB keeps it)."""
    return """
    SELECT cast(regexp_extract(source, 'src([0-9]+)', 1) as int) % 4 AS source_bucket,
           count(*) AS n_docs,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM documents
    GROUP BY cast(regexp_extract(source, 'src([0-9]+)', 1) as int) % 4
    """


def _q_events_value_histogram(d: str) -> str:
    """Fixed-width histogram of the event value distribution — binning
    as arithmetic (floor(v/width)) instead of engine-specific
    width_bucket, so both dialects share one expression. One scan,
    partial+final aggregation; bins, not rows, cross the shuffle."""
    return f"""
    SELECT cast(floor(value / 10.0) as int) AS bin,
           count(*) AS n_events,
           (cast(floor((sum({_dec('value', '18,4')})) * 10000 + 0.5) as bigint) / cast(10000 as double)) AS bin_sum
    FROM events
    GROUP BY cast(floor(value / 10.0) as int)
    """


def _q_events_zorder_key(d: str) -> str:
    """Morton (Z-order) key over min-max-bucketed (user_id, value) —
    the layout key operators/zorder.py clusters on, restated as one
    flat bit-twiddling expression per dialect so the interleave itself
    is hash-checked. 8 bits per dimension; column 0 (user bucket) owns
    even output bits, column 1 (value bucket) odd bits. The aggregate
    roll-up (count + id checksum per key prefix) keeps the gate output
    small while still pinning every row's full key through the md5-free
    integer checksum."""
    shl = (lambda x, k: f"shiftleft({x}, {k})") if d == SPARK else (
        lambda x, k: f"(({x}) << {k})"
    )
    shr = (lambda x, k: f"shiftright({x}, {k})") if d == SPARK else (
        lambda x, k: f"(({x}) >> {k})"
    )

    def bucket(col: str, mn: str, mx: str) -> str:
        span = f"(cast({mx} as double) - cast({mn} as double))"
        scaled = (
            f"floor((cast({col} as double) - cast({mn} as double)) * 256.0 / {span})"
        )
        return (
            f"cast(case when {span} <= 0 then 0 "
            f"else least(greatest({scaled}, 0.0), 255.0) end as bigint)"
        )

    ub = bucket("user_id", "s.umin", "s.umax")
    vb = bucket("value", "s.vmin", "s.vmax")
    terms = []
    for b in range(8):
        terms.append(shl(f"({shr('ub', b)} & 1)", 2 * b))
        terms.append(shl(f"({shr('vb', b)} & 1)", 2 * b + 1))
    zkey = " + ".join(terms)
    return f"""
    WITH s AS (
      SELECT min(user_id) AS umin, max(user_id) AS umax,
             min(value) AS vmin, max(value) AS vmax
      FROM events
    ),
    b AS (
      SELECT event_id, {ub} AS ub, {vb} AS vb
      FROM events CROSS JOIN s
    ),
    z AS (SELECT event_id, ({zkey}) AS zkey FROM b)
    SELECT cast({("shiftright(zkey, 8)" if d == SPARK else "(zkey >> 8)")} as bigint) AS z_block,
           count(*) AS n_events,
           cast(sum(zkey * 1000003 + event_id) as bigint) AS z_checksum
    FROM z
    GROUP BY 1
    """


DRIFT_BINS = 10


def _run_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift monitor (operators/drift.py): the even-vec_id
    half of the embeddings table as the reference snapshot, the odd
    half as the candidate — per-dimension PSI + standardized mean
    difference. (The halves come from one corpus, so the gate pins the
    metric algebra; drifted inputs are exercised in tests/test_drift.py
    where a shifted copy must cross the 0.25 PSI alarm.)"""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.drift import embedding_drift
    from distributedvectordatabase_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    out = embedding_drift(ref, cur, bins=DRIFT_BINS)
    return out.select(
        "dim",
        "n_ref",
        "n_cur",
        _qz_col("mean_ref").alias("mean_ref"),
        _qz_col("mean_cur").alias("mean_cur"),
        _qz_col("smd").alias("smd"),
        _qz_col("psi").alias("psi"),
    )


def embedding_drift_oracle_sql(bins: int = DRIFT_BINS) -> str:
    """DuckDB restatement of the drift monitor: unnest-with-subscripts
    explode, pooled fixed-width bins, Laplace-smoothed PSI with the
    closed-form correction for bins observed on neither side."""
    b = float(bins)
    return f"""
    WITH ex AS (
      SELECT (vec_id % 2) AS side,
             cast(generate_subscripts(embedding, 1) - 1 AS int) AS dim,
             cast(unnest(embedding) AS double) AS val
      FROM embeddings
    ),
    rng AS (
      SELECT dim, min(val) AS vmin, max(val) AS vmax FROM ex GROUP BY dim
    ),
    binned AS (
      SELECT ex.dim, ex.side, ex.val,
             CASE WHEN (rng.vmax - rng.vmin) <= 0 THEN 0
                  ELSE cast(least(floor((ex.val - rng.vmin) * {b} / (rng.vmax - rng.vmin)), {bins - 1}.0) AS int)
             END AS bin
      FROM ex JOIN rng USING (dim)
    ),
    mom AS (
      SELECT dim,
             cast(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS bigint) AS n_ref,
             cast(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS bigint) AS n_cur,
             avg(CASE WHEN side = 0 THEN val END) AS mean_ref,
             avg(CASE WHEN side = 1 THEN val END) AS mean_cur,
             coalesce(var_samp(CASE WHEN side = 0 THEN val END), 0.0) AS var_ref,
             coalesce(var_samp(CASE WHEN side = 1 THEN val END), 0.0) AS var_cur
      FROM binned GROUP BY dim
    ),
    hist AS (
      SELECT dim, bin,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c_ref,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c_cur
      FROM binned GROUP BY dim, bin
    ),
    obs AS (
      SELECT h.dim,
             sum(((h.c_cur + 1.0) / (m.n_cur + {b}) - (h.c_ref + 1.0) / (m.n_ref + {b}))
                 * ln(((h.c_cur + 1.0) / (m.n_cur + {b})) / ((h.c_ref + 1.0) / (m.n_ref + {b})))) AS psi_obs,
             count(*) AS n_bins_obs
      FROM hist h JOIN mom m USING (dim) GROUP BY h.dim
    )
    SELECT m.dim, m.n_ref, m.n_cur,
           {_qz('m.mean_ref')} AS mean_ref,
           {_qz('m.mean_cur')} AS mean_cur,
           {_qz('CASE WHEN (m.var_ref + m.var_cur) <= 0 THEN 0.0 ELSE (m.mean_cur - m.mean_ref) / sqrt((m.var_ref + m.var_cur) / 2.0) END')} AS smd,
           {_qz(f'o.psi_obs + ({b} - o.n_bins_obs) * (1.0 / (m.n_cur + {b}) - 1.0 / (m.n_ref + {b})) * ln((1.0 / (m.n_cur + {b})) / (1.0 / (m.n_ref + {b})))')} AS psi
    FROM mom m JOIN obs o USING (dim)
    """


def _run_events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-count (SURVEY §2.2 approximate-ops row
    beyond LSH): HyperLogLog++ per-group user cardinality. The
    groupBy is a two-phase partial+final HLL merge — each executor
    ships a fixed-size sketch, not its user_ids, so the shuffle is
    O(groups), not O(rows), at any scale. Rows-only for the driver
    (DuckDB's HLL estimates differ); tests assert <=5% relative error
    vs the exact count."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               approx_count_distinct(user_id) AS approx_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
        """
    )


def _returnflag_pivot_oracle() -> str:
    """Conditional-aggregation form of the pivot — the portable SQL
    equivalent of RelationalGroupedDataset.pivot."""
    rev = f"{_dec('l_extendedprice', '14,4')} * {_dec('1 - l_discount', '8,4')}"
    return f"""
    SELECT l_returnflag,
           (cast(floor((sum(CASE WHEN l_linestatus = 'O' THEN {rev} END)) * 100 + 0.5) as bigint) / cast(100 as double)) AS rev_open,
           (cast(floor((sum(CASE WHEN l_linestatus = 'F' THEN {rev} END)) * 100 + 0.5) as bigint) / cast(100 as double)) AS rev_finished
    FROM lineitem
    GROUP BY l_returnflag
    """


def _run_returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT via the native DataFrame operator. Explicit value list
    ['O','F'] so Spark skips the extra distinct-values collect job —
    at 100 TB an implicit pivot would scan the table twice. Decimal
    sum keeps the result engine-exact (see module docstring)."""
    from pyspark.sql import functions as F

    _register(spark, sf_dir)
    rev = F.expr(f"{_dec('l_extendedprice', '14,4')} * {_dec('1 - l_discount', '8,4')}")
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(rev))
        .select(
            "l_returnflag",
            F.expr("cast(floor(`O` * 100 + 0.5) as bigint) / cast(100 as double)").alias("rev_open"),
            F.expr("cast(floor(`F` * 100 + 0.5) as bigint) / cast(100 as double)").alias("rev_finished"),
        )
    )


# ---------------------------------------------------------------------------
# vector analytics (X5 centroids, norms, near-dup)
# ---------------------------------------------------------------------------

def _flat_cte(d: str) -> str:
    if d == SPARK:
        return (
            "flat AS (SELECT vec_id, label, pos + 1 AS dim_idx, cast(val as double) AS val "
            "FROM embeddings LATERAL VIEW posexplode(embedding) ex AS pos, val)"
        )
    return (
        "flat AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim_idx, "
        "unnest(embedding)::DOUBLE AS val FROM embeddings)"
    )


def _q_label_centroid_dispersion(d: str) -> str:
    """Per-label centroid (X5) merged with per-label dispersion: each
    (label, dim) centroid row also carries the label's vector count and
    mean squared distance to its centroid. The flat explode shuffles
    once on (label, dim); the dispersion side re-joins the tiny centroid
    frame (labels × dims rows — always broadcastable)."""
    return f"""
    WITH {_flat_cte(d)},
    cent AS (SELECT label, dim_idx, {_qavg("val")} AS m FROM flat GROUP BY label, dim_idx),
    per_vec AS (
      SELECT f.vec_id, f.label, {_qsum("(f.val - c.m) * (f.val - c.m)")} AS sq
      FROM flat f JOIN cent c ON f.label = c.label AND f.dim_idx = c.dim_idx
      GROUP BY f.vec_id, f.label
    ),
    disp AS (
      SELECT label, count(*) AS n_vectors,
             {_qz(_dq("sum(sq)", 6) + " / count(*)")} AS avg_sq
      FROM per_vec GROUP BY label
    )
    SELECT c.label, c.dim_idx, c.m AS mean_val,
           d2.n_vectors, d2.avg_sq AS avg_sq_dist_to_centroid
    FROM cent c JOIN disp d2 ON c.label = d2.label
    """


def _q_centroid_assign(d: str) -> str:
    """Nearest-centroid classification: assign each embedding to the
    closest per-label mean vector and report the confusion counts vs
    the true label. Distances are ranked on the 1e-6-rounded value
    (like doc_tfidf_top3) so both engines rank identical keys. At
    scale: the centroid side is O(labels × dims) — always broadcast —
    and the per-vector argmin is a window over labels-per-vector rows."""
    return f"""
    WITH {_flat_cte(d)},
    cent AS (
      SELECT label AS c_label, dim_idx, {_qavg("val")} AS m
      FROM flat GROUP BY label, dim_idx
    ),
    dist AS (
      SELECT f.vec_id, f.label AS true_label, c.c_label,
             {_dq(_qsum("(f.val - c.m) * (f.val - c.m)"), 6)} AS d2
      FROM flat f JOIN cent c ON f.dim_idx = c.dim_idx
      GROUP BY f.vec_id, f.label, c.c_label
    ),
    best AS (
      SELECT vec_id, true_label, c_label AS assigned_label,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
      FROM dist
    )
    SELECT true_label, assigned_label, count(*) AS n_vectors
    FROM best WHERE rn = 1
    GROUP BY true_label, assigned_label
    """


def _q_embedding_quantize_error(d: str) -> str:
    """Int8 scalar quantization (the standard vector-compression step
    before ANN at scale: 4× smaller than float32): per-dimension
    max-abs scale, symmetric round-to-127 quantize, and the resulting
    reconstruction error per label. Per-row math is IEEE-identical in
    both engines; only exact aggregates (max) feed the scale, so the
    quantized values match bit-for-bit."""
    qv = "floor(f.val / nullif(s.s, 0) * 127 + 0.5)"
    recon = f"{qv} * s.s / 127"
    return f"""
    WITH {_flat_cte(d)},
    scale AS (SELECT dim_idx, max(abs(val)) AS s FROM flat GROUP BY dim_idx),
    err AS (
      SELECT f.vec_id, f.label,
             {_qsum(f"CASE WHEN s.s = 0 OR s.s IS NULL THEN 0.0 ELSE (f.val - {recon}) * (f.val - {recon}) END")} AS sq_err
      FROM flat f JOIN scale s ON f.dim_idx = s.dim_idx
      GROUP BY f.vec_id, f.label
    )
    SELECT label, count(*) AS n_vectors,
           {_qz(_dq("sum(sq_err)", 6) + " / count(*)")} AS mean_sq_err,
           {_qz("cast(max(sq_err) as double)")} AS max_sq_err
    FROM err
    GROUP BY label
    """


def _q_vector_norms(d: str) -> str:
    norm = _l2norm("embedding", d)
    first = _elem("embedding", 0, d)
    return f"""
    SELECT vec_id, {_asize(d)}(embedding) AS dim,
           (cast(floor(({norm}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS l2_norm,
           (cast(floor((cast({first} as double) / nullif({norm}, 0)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS first_normalized
    FROM embeddings
    """


def _q_embedding_neardup_lsh(d: str) -> str:
    """LSH-bucketed near-dup: candidate pairs restricted to the same
    sign-LSH bucket (the 100 TB path — the self-join shuffles per
    bucket, never the full cross product). Both dialects compute the
    identical seeded buckets, so results are deterministic even though
    bucketing can drop cross-bucket pairs the brute-force query finds."""
    bucket = (
        _LSH.bucket_sql_spark("embedding") if d == SPARK else _LSH.bucket_sql_duckdb("embedding")
    )
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
    SELECT id_a, id_b, (cast(floor((cosine_sim) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS cosine_sim
    FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos_sim('a.embedding', 'b.embedding', d)} AS cosine_sim
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) p
    WHERE cosine_sim >= {NEARDUP_COS}
    """


def _q_events_windowed(d: str) -> str:
    """Batch form of streaming.windowed_event_counts — same plan shape
    the streaming query runs, so the oracle checks the streaming agg."""
    return f"""
    SELECT {_hour('ts', d)} AS window_start, event_type,
           count(*) AS n_events,
           (cast(floor((sum({_dec('value')})) * 10000 + 0.5) as bigint) / cast(10000 as double)) AS sum_value
    FROM events
    GROUP BY 1, 2
    """


def _q_tpch_q17_small_qty(d: str) -> str:
    """Correlated-scalar-subquery query (TPC-H Q17 shape): revenue of
    line items whose quantity is under 20% of their part's average."""
    return f"""
    SELECT (cast(floor(((cast(floor((sum({_dec('l.l_extendedprice', '14,4')})) * 100 + 0.5) as bigint) / cast(100 as double)) / cast(7 as double)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double))
             AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """


def _q_embedding_neardup(d: str) -> str:
    return f"""
    SELECT id_a, id_b, (cast(floor((cosine_sim) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS cosine_sim
    FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos_sim('a.embedding', 'b.embedding', d)} AS cosine_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) p
    WHERE cosine_sim >= {NEARDUP_COS}
    """


# ---------------------------------------------------------------------------
# kNN / LSH oracle SQL (generated; DataFrame-API Spark side)
# ---------------------------------------------------------------------------

def knn_oracle_sql(metric: str, n_queries: int = N_QUERIES, k: int = KNN_K) -> str:
    mexpr = _l2sq("q.qvec", "e.embedding", DUCKDB) if metric == "l2sq" else _cos_dist(
        "q.qvec", "e.embedding", DUCKDB
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
      SELECT q.qid, e.vec_id AS neighbor_id, {mexpr} AS dist
      FROM q CROSS JOIN embeddings e
    ),
    ranked AS (
      SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, (cast(floor((dist) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS dist, rnk
    FROM ranked WHERE rnk <= {k}
    """


def knn_single_oracle_sql(k: int = KNN_K) -> str:
    m = _l2sq("q.qvec", "e.embedding", DUCKDB)
    return f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS neighbor_id, (cast(floor(({m}) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS dist
    FROM q CROSS JOIN embeddings e
    ORDER BY {m}, e.vec_id
    LIMIT {k}
    """


def pruned_recall_oracle_sql(lsh: SignLSH) -> str:
    """recall@k of the 2-of-3 pruned search vs exact, as one row —
    both sides are the existing oracle queries, joined on hits."""
    exact = knn_oracle_sql("l2sq")
    approx = pruned_knn_oracle_sql(lsh)
    return f"""
    SELECT (cast(floor((
        cast((SELECT count(*) FROM ({exact}) e JOIN ({approx}) a
              USING (qid, neighbor_id)) as double)
        / (SELECT count(*) FROM ({exact}))) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS recall_at_k
    """


def lsh_bucket_oracle_sql(lsh: SignLSH) -> str:
    return f"SELECT vec_id, {lsh.bucket_sql_duckdb('embedding')} AS shard_id FROM embeddings"




def pruned_knn_oracle_sql(
    lsh: SignLSH, n_queries: int = N_QUERIES, k: int = KNN_K, num_candidates: int = 2
) -> str:
    """Replicates the corrected multi-probe candidate enumeration in pure
    SQL: per query, primary bucket from the 12 seeded sign bits, plus
    the bucket reached by flipping the |dot|-closest bit that lands in
    a different bucket; sequential-fill fallback. num_candidates=2."""
    assert num_candidates == 2, "oracle SQL is generated for the default 2-probe"
    dots = ", ".join(
        f"{_dot('qvec', '[' + ', '.join(repr(float(x)) for x in lsh.projections[:, j]) + ']', DUCKDB)} AS d{j}"
        for j in range(lsh.num_bits)
    )
    bitsum = " + ".join(f"(CASE WHEN d{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(lsh.num_bits))
    dlist = "[" + ", ".join(f"d{j}" for j in range(lsh.num_bits)) + "]"
    m = _l2sq("q.qvec", "e.embedding", DUCKDB)
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    qd AS (SELECT qid, qvec, {dots} FROM q),
    qb AS (SELECT *, ({bitsum})::BIGINT AS bitsum FROM qd),
    qp AS (SELECT qid, qvec, bitsum, bitsum % {lsh.num_tables} AS prim FROM qb),
    flips AS (
      SELECT qp.qid, gs - 1 AS j, abs(d) AS absd,
             ((qp.bitsum + (CASE WHEN d > 0 THEN -1 ELSE 1 END) * (1::BIGINT << (gs - 1)))
              % {lsh.num_tables}) AS fb
      FROM (SELECT qid, generate_subscripts(ds, 1) AS gs, unnest(ds) AS d
            FROM (SELECT qid, {dlist} AS ds FROM qb) x) u
      JOIN qp ON qp.qid = u.qid
    ),
    probe AS (
      SELECT qid, fb, row_number() OVER (PARTITION BY qid ORDER BY absd, j) AS rn
      FROM flips f JOIN qp USING (qid)
      WHERE fb <> qp.prim
    ),
    cand AS (
      SELECT qid, prim AS shard_id FROM qp
      UNION ALL
      SELECT qp.qid,
             coalesce(p.fb, CASE WHEN qp.prim = 0 THEN 1 ELSE 0 END) AS shard_id
      FROM qp LEFT JOIN (SELECT qid, fb FROM probe WHERE rn = 1) p USING (qid)
    ),
    corpus AS (
      SELECT vec_id, embedding, {lsh.bucket_sql_duckdb('embedding')} AS shard_id
      FROM embeddings
    ),
    scored AS (
      SELECT q.qid, e.vec_id AS neighbor_id, {m} AS dist
      FROM q
      JOIN cand c ON c.qid = q.qid
      JOIN corpus e ON e.shard_id = c.shard_id
    ),
    ranked AS (
      SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, (cast(floor((dist) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS dist, rnk
    FROM ranked WHERE rnk <= {k}
    """


def knn_filtered_oracle_sql(n_queries: int = N_QUERIES, k: int = KNN_K) -> str:
    """Metadata-filtered kNN oracle: each query restricted to corpus
    rows sharing its label — filter-then-search semantics, expressed
    as the equi-join the relational form makes explicit."""
    mexpr = _l2sq("q.qvec", "e.embedding", DUCKDB)
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec, label AS qlabel
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
      SELECT q.qid, e.vec_id AS neighbor_id, {mexpr} AS dist
      FROM q JOIN embeddings e ON e.label = q.qlabel
    ),
    ranked AS (
      SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, (cast(floor((dist) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS dist, rnk
    FROM ranked WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# DataFrame-API runners
# ---------------------------------------------------------------------------

def _run_knn(metric: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from distributedvectordatabase_spark.operators.knn import knn
        from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

        corpus = load_table(spark, "embeddings", sf_dir)
        queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
        return knn(corpus, queries, k=KNN_K, metric=metric).withColumn(
            "dist", _qz_col("dist")
        )

    return run


def _run_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered search (the reference's declared future work,
    COCO_INSTRUCTIONS.md:121-125): each fixture query constrained to
    its own label. The label constraint becomes an ``isin`` scan
    predicate plus per-query Arrow masking — one corpus scan for the
    whole batch, same BLAS path as exact kNN."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import filtered_knn
    from distributedvectordatabase_spark.sources.tables import load_table

    corpus = load_table(spark, "embeddings", sf_dir)
    queries = (
        corpus.orderBy("vec_id")
        .limit(N_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.col("label").alias("qlabel"),
        )
    )
    return filtered_knn(
        corpus, queries, k=KNN_K, metric="l2sq",
        filter_col="label", qfilter_col="qlabel",
    ).withColumn("dist", _qz_col("dist"))


def _run_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic search: Arrow kNN over embeddings, then the
    neighbor ids broadcast-join back to the documents table for the
    human-facing payload (lang, source, length). At scale the join
    side is O(n_queries * k) rows — always tiny, always broadcastable
    — while documents stays a pruned column scan."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    corpus = load_table(spark, "embeddings", sf_dir)
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    hits = knn(corpus, queries, k=KNN_K, metric="cosine")
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return (
        docs.join(F.broadcast(hits), docs.doc_id == hits.neighbor_id)
        .select(
            "qid",
            "rnk",
            "doc_id",
            "lang",
            "source",
            "n_chars",
            _qz_col("dist").alias("dist"),
        )
    )


def semantic_search_oracle_sql(n_queries: int = N_QUERIES, k: int = KNN_K) -> str:
    mexpr = _cos_dist("q.qvec", "e.embedding", DUCKDB)
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
      SELECT q.qid, e.vec_id AS neighbor_id, {mexpr} AS dist
      FROM q CROSS JOIN embeddings e
    ),
    ranked AS (
      SELECT qid, neighbor_id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS rnk
      FROM scored
    )
    SELECT r.qid, r.rnk, d.doc_id, d.lang, d.source, d.n_chars,
           (cast(floor((r.dist) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS dist
    FROM ranked r JOIN documents d ON d.doc_id = r.neighbor_id
    WHERE r.rnk <= {k}
    """


def _run_knn_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import knn_single
    from distributedvectordatabase_spark.sources.tables import load_table

    corpus = load_table(spark, "embeddings", sf_dir)
    qvec = corpus.filter(F.col("vec_id") == 0).first().embedding
    return knn_single(corpus, qvec, k=KNN_K).withColumn("dist", _qz_col("dist"))


def _run_knn_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import knn_pruned
    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    corpus = _LSH.assign(load_table(spark, "embeddings", sf_dir))
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    return knn_pruned(corpus, queries, _LSH, k=KNN_K, num_candidates=2).withColumn(
        "dist", _qz_col("dist")
    )


def _run_pruned_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared recall@k measurement of the pruned search (the quality
    metric the reference never reports, SURVEY §5.3) — exact and pruned
    results joined on hits, one row out."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.knn import knn, knn_pruned
    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    corpus = load_table(spark, "embeddings", sf_dir)
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    exact = knn(corpus, queries, k=KNN_K).select("qid", "neighbor_id")
    approx = knn_pruned(
        _LSH.assign(corpus), queries, _LSH, k=KNN_K, num_candidates=2
    ).select("qid", "neighbor_id")
    hits = exact.join(approx, ["qid", "neighbor_id"]).count()
    total = exact.count()
    return spark.createDataFrame(
        [(_qz_py(hits / total),)], schema="recall_at_k double"
    )


def _run_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distributedvectordatabase_spark.sources.tables import load_table

    return _LSH.assign(load_table(spark, "embeddings", sf_dir)).select("vec_id", "shard_id")




def _gate_tmp_path(kind: str, sf_dir: str, table: str = "embeddings") -> str:
    """Fingerprint-keyed /tmp path for a build-once gate store.

    Keyed by (sf basename, source mtime, size) so (a) the driver's
    per-round testdata regeneration invalidates stale builds and (b)
    two concurrent harness runs on the same machine never collide on a
    half-written store. Stale sibling fingerprints of the same sf are
    pruned — without cleanup /tmp accumulates one store per
    regeneration — but only when untouched for over an hour: a sibling
    with a fresh mtime may be a CONCURRENT run's live store (its
    testdata predates/postdates ours), and rmtree'ing it would fail
    that run's lazy scans mid-gate."""
    import shutil
    import time

    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    base = os.path.basename(os.path.normpath(sf_dir))
    fp = f"{base}-{int(st.st_mtime)}-{st.st_size}"
    root = os.path.join(tempfile.gettempdir(), kind)
    if os.path.isdir(root):
        cutoff = time.time() - 3600
        for d in os.listdir(root):
            p = os.path.join(root, d)
            try:
                quiet = os.path.getmtime(p) < cutoff
            except OSError:
                continue
            if d.startswith(f"{base}-") and d != fp and quiet:
                shutil.rmtree(p, ignore_errors=True)
    return os.path.join(root, fp)


def _run_store_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ingest round-trip + distribution analytics in one gate
    (merged O7/O8/O17 store round-trip with the O14 per-shard
    distribution and O15 imbalance/CV metrics, reference
    performance_analysis.py:186-237 + generate_report.py:248-270):
    bucketed partitioned write → read back → per-shard counts with
    global balance columns via an unpartitioned window (fine: input is
    one row per shard by then)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.sources.vector_store import VectorStore

    path = _gate_tmp_path("dvdb_store_gate", sf_dir)
    vs = VectorStore(path, _LSH)
    # build once per testdata fingerprint (_gate_tmp_path keys the dir
    # by source mtime+size, so a regenerated sf_dir gets a fresh build;
    # Spark's parquet writer drops _SUCCESS on commit, making it the
    # completed-build marker — same pattern as the IVF gate's centroid
    # sidecar check)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        vs.write(load_table(spark, "embeddings", sf_dir))
    counts = (
        vs.read(spark)
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_vectors"))
        .select(F.col("shard_id").cast("int").alias("shard_id"), "n_vectors")
    )
    w = Window.partitionBy()
    avg = F.avg("n_vectors").over(w)
    std = F.coalesce(F.stddev_pop("n_vectors").over(w), F.lit(0.0))
    cv = F.when(avg > 0, std / avg).otherwise(F.lit(0.0))
    imb = F.when(
        avg > 0, (F.max("n_vectors").over(w) - F.min("n_vectors").over(w)) / avg
    ).otherwise(F.lit(0.0))
    return counts.select(
        "shard_id",
        "n_vectors",
        _qz_col(F.col("n_vectors") * 100.0 / F.sum("n_vectors").over(w)).alias("pct"),
        _qz_col(imb).alias("imbalance_factor"),
        _qz_col(cv).alias("cv"),
        F.when(cv < 0.1, F.lit("excellent"))
        .when(cv < 0.2, F.lit("good"))
        .when(cv < 0.3, F.lit("acceptable"))
        .otherwise(F.lit("uneven"))
        .alias("distribution_quality"),
    )


def _store_counts_oracle(lsh: SignLSH) -> str:
    return f"""
    WITH b AS ({lsh_bucket_oracle_sql(lsh)}),
    c AS (SELECT shard_id, count(*) AS n_vectors FROM b GROUP BY shard_id)
    SELECT shard_id, n_vectors,
           (cast(floor((n_vectors * 100.0 / sum(n_vectors) OVER ()) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS pct,
           (cast(floor((CASE WHEN avg(n_vectors) OVER () > 0
                 THEN (max(n_vectors) OVER () - min(n_vectors) OVER ())
                      / avg(n_vectors) OVER ()
                 ELSE 0.0 END) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS imbalance_factor,
           (cast(floor((CASE WHEN avg(n_vectors) OVER () > 0
                 THEN coalesce(stddev_pop(n_vectors) OVER (), 0.0)
                      / avg(n_vectors) OVER ()
                 ELSE 0.0 END) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS cv,
           CASE WHEN (CASE WHEN avg(n_vectors) OVER () > 0
                      THEN coalesce(stddev_pop(n_vectors) OVER (), 0.0)
                           / avg(n_vectors) OVER () ELSE 0.0 END) < 0.1
                THEN 'excellent'
                WHEN (CASE WHEN avg(n_vectors) OVER () > 0
                      THEN coalesce(stddev_pop(n_vectors) OVER (), 0.0)
                           / avg(n_vectors) OVER () ELSE 0.0 END) < 0.2
                THEN 'good'
                WHEN (CASE WHEN avg(n_vectors) OVER () > 0
                      THEN coalesce(stddev_pop(n_vectors) OVER (), 0.0)
                           / avg(n_vectors) OVER () ELSE 0.0 END) < 0.3
                THEN 'acceptable'
                ELSE 'uneven' END AS distribution_quality
    FROM c
    """


def _run_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API MinHash-LSH: signatures computed once and cached;
    the SQL-template form re-tokenizes per CTE reference (Catalyst
    inlines CTEs) and is ~20× slower at sf0.1. Oracle stays the SQL
    template — same salts, same band keys, identical results."""
    from distributedvectordatabase_spark.operators.dedup import minhash_neardup_pairs
    from distributedvectordatabase_spark.sources.tables import load_table

    return minhash_neardup_pairs(
        load_table(spark, "documents", sf_dir, spread=True),
        threshold=MINHASH_JACCARD,
        bands=MINHASH_BANDS,
        rows=MINHASH_ROWS,
    )


def _run_dedup_minhash_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-input MinHash-LSH — the registered scale path. 3-word
    shingles keep the similarity distribution bimodal so banding stays
    sub-quadratic on low-vocab corpora (see SHINGLE_* constants)."""
    from distributedvectordatabase_spark.operators.dedup import minhash_neardup_pairs
    from distributedvectordatabase_spark.sources.tables import load_table

    return minhash_neardup_pairs(
        load_table(spark, "documents", sf_dir, spread=True),
        threshold=SHINGLE_JACCARD,
        bands=SHINGLE_BANDS,
        rows=SHINGLE_ROWS,
        shingle_n=3,
    )


def _run_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole-banded SimHash join (scale path: no O(n²) cross join);
    identical results to the oracle's self-join by construction."""
    from distributedvectordatabase_spark.operators.dedup import simhash_neardup_pairs
    from distributedvectordatabase_spark.sources.tables import load_table

    return simhash_neardup_pairs(
        load_table(spark, "documents", sf_dir, spread=True),
        max_hamming=SIMHASH_MAX_HAMMING,
        bits=SIMHASH_BITS,
    )


def _run_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force all-pairs cosine baseline via the sharded-BLAS scan
    (each partition scores against the broadcast normalized corpus):
    ~80x faster than the interpreted expression self-join at sf0.1.
    Oracle stays the SQL cross-join template — identical pairs."""
    from distributedvectordatabase_spark.operators.dedup import brute_cosine_neardup_pairs
    from distributedvectordatabase_spark.sources.tables import load_table

    return brute_cosine_neardup_pairs(
        load_table(spark, "embeddings", sf_dir), threshold=NEARDUP_COS
    )


def _run_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS-per-bucket near-dup (pandas_udf bucketing + applyInPandas
    cosine matrix): ~25× faster than the SQL-template self-join, whose
    inlined bucket expression and per-pair interpreted lambdas dominate.
    Oracle stays the SQL template — identical buckets and pairs."""
    from distributedvectordatabase_spark.operators.dedup import lsh_cosine_neardup_pairs
    from distributedvectordatabase_spark.sources.tables import load_table

    return lsh_cosine_neardup_pairs(
        load_table(spark, "embeddings", sf_dir), _LSH, threshold=NEARDUP_COS
    )


def _run_embedding_neardup_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both embedding near-dup strategies in one tagged gate: the
    broadcast-corpus brute-force baseline (small-scale reference) and
    the LSH-bucketed scale path, whose bucketing can drop cross-bucket
    pairs — surfacing exactly that recall difference in one result."""
    from pyspark.sql import functions as F

    brute = _run_embedding_neardup(spark, sf_dir)
    lsh = _run_embedding_neardup_lsh(spark, sf_dir)
    return brute.select(F.lit("brute").alias("method"), "*").unionByName(
        lsh.select(F.lit("lsh_bucketed").alias("method"), "*")
    )


def _embedding_neardup_both_oracle() -> str:
    return f"""
    SELECT 'brute' AS method, * FROM ({_q_embedding_neardup(DUCKDB)}) a
    UNION ALL
    SELECT 'lsh_bucketed' AS method, * FROM ({_q_embedding_neardup_lsh(DUCKDB)}) b
    """


def _run_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the Structured Streaming windowed aggregation in batch mode
    (identical plan minus the watermark), making the streaming operator
    oracle-checkable."""
    from distributedvectordatabase_spark.sources.tables import load_table
    from distributedvectordatabase_spark.streaming import windowed_event_counts

    return windowed_event_counts(load_table(spark, "events", sf_dir), window="1 hour")


def _run_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each non-purchase event picks up the value of the
    same user's latest purchase at-or-before it (window-function impl;
    oracle is DuckDB's native ASOF JOIN)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.asof import asof_join
    from distributedvectordatabase_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.col("value").cast("decimal(18,4)")).alias("purchase_value"))
    )
    others = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = asof_join(
        others, purchases, on=["user_id"], value_cols=["purchase_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        _qz_col(F.col("purchase_value").cast("double")).alias("last_purchase_value"),
    )


def _events_asof_oracle() -> str:
    return """
    WITH p AS (
      SELECT user_id, ts, max(value::DECIMAL(18,4)) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ),
    o AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type <> 'purchase'
    )
    SELECT o.event_id, o.user_id, o.event_type,
           (cast(floor(((p.purchase_value)::DOUBLE) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS last_purchase_value
    FROM o ASOF LEFT JOIN p
      ON o.user_id = p.user_id AND o.ts >= p.ts
    """


def _run_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucket expansion: per user, how many ordered event
    pairs fall within 5 minutes of each other. Oracle is the naive
    inequality self-join — identical result, different join strategy."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.range_join import time_range_join
    from distributedvectordatabase_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select("user_id", "event_id", "ts")
    pairs = time_range_join(ev, ev, on=["user_id"], gap_seconds=300)
    return (
        pairs.filter(F.col("event_id") < F.col("event_id_r"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_close_pairs"))
    )


def _events_range_join_oracle() -> str:
    return """
    SELECT a.user_id, count(*) AS n_close_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300 * 1000000
    GROUP BY a.user_id
    """


def _run_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline, merged decode + frame-sampling gate:
    documents → media table (payload bytes + typed metadata) →
    Arrow-batched mapInPandas decode (deterministic fake decoder) and
    fixed-stride frame sampling → one per-format roll-up. The payload
    column dies inside both mapInPandas stages; only tiny feature rows
    shuffle. The oracle reproduces the fake decoder arithmetic
    (md5-derived brightness) and the frame-count function in SQL."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.multimodal import (
        as_media_table,
        decode_stats,
        format_stats,
        sample_frames,
    )
    from distributedvectordatabase_spark.sources.tables import load_table

    media = as_media_table(load_table(spark, "documents", sf_dir))
    fmt = format_stats(decode_stats(media, decoder="fake"))
    frames = (
        sample_frames(media, every_n_bytes=64, max_frames=8)
        .join(media.select("item_id", "format"), "item_id")
        .groupBy("format")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.length("frame_payload")).alias("frame_bytes"),
        )
    )
    return fmt.join(frames, "format")


def _multimodal_stats_oracle() -> str:
    return """
    WITH m AS (
      SELECT ['jpeg','png','webp'][(doc_id % 3) + 1] AS format,
             64 + (doc_id % 8) * 16 AS width,
             64 + (doc_id % 5) * 32 AS height,
             octet_length(text::BLOB)::BIGINT AS n_bytes,
             ('0x' || substr(md5(text), 1, 8))::BIGINT / 4294967296.0 AS brightness,
             least(8, greatest(1, octet_length(text::BLOB) // 64))::BIGINT AS n_frames,
             least(octet_length(text::BLOB),
                   least(8, greatest(1, octet_length(text::BLOB) // 64)) * 64)::BIGINT
               AS frame_bytes
      FROM documents
    )
    SELECT format, count(*) AS n_items, (sum(n_bytes))::BIGINT AS total_bytes,
           (cast(floor((avg(brightness)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_brightness,
           (cast(floor((avg(width * height)) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS avg_pixels,
           (sum(n_frames))::BIGINT AS n_frames,
           (sum(frame_bytes))::BIGINT AS frame_bytes
    FROM m
    GROUP BY format
    """


@functools.lru_cache(maxsize=4)
def _pca_oracle_for(sf_dir: str) -> str | None:
    """DuckDB oracle for ``pca_project_16`` (r8 — the gate was rows-only
    since r1): an INDEPENDENT NumPy ``eigh`` fit of the sf0.01
    covariance, sign-canonicalized the same way as operators/pca.py,
    with the 16 components inlined as DOUBLE[] literals and the
    projection recomputed per row by DuckDB's ``list_dot_product``.

    Lazy + cached (ADVICE r8): the catalog stores the CALLABLE, so the
    parquet read + O(d²n) eigh runs only when something actually asks
    for this oracle (the driver's oracle_sql() call, the strict local
    gates) — never as an import/build_catalog side effect — and runs at
    most once per sf_dir per process. ``SPARK_GRAFT_ORACLE_SF_DIR`` is
    therefore read at oracle-FETCH time: a harness that points the
    oracle scale elsewhere before collecting oracle_sql() gets a fit on
    that data, keeping the eigenbasis and the compared table in sync.

    Nothing flows from the Spark run into the oracle: NumPy reads the
    parquet itself, fits its own eigenbasis, and DuckDB does its own
    matmul — so the gate hash-checks the fit (eigenvectors agree
    post-quantization), the projection arithmetic (uncentered ``x·V``,
    Spark ML's convention), the sign canonicalization, and the
    explained-variance proportion at once. Probed before gating: all
    sf0.01 projections agree at far below the 1e-6 quantum (eigengap
    λ15−λ16 ≈ 2.8% of λ0, so cross-library eigenvector noise is
    ~1e-11). The quantization mirrors the Spark side exactly: inner
    qz inside pca_reduce, outer _qz in the gate projection.

    Returns None (rows-only fallback) when the oracle-scale testdata
    is absent, so importing the catalog never hard-fails."""
    import numpy as np

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        return None
    import pyarrow.parquet as pq

    t = pq.read_table(emb_path, columns=["embedding"])
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n, _d = X.shape
    Xc = X - X.mean(axis=0)
    C = (Xc.T @ Xc) / (n - 1)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:16]
    W = V[:, order]
    for j in range(W.shape[1]):
        if W[np.argmax(np.abs(W[:, j])), j] < 0:
            W[:, j] = -W[:, j]
    explained = _qz_py(float(w[order].sum() / w.sum()))
    comp_rows = ",\n      ".join(
        f"({j}, [{', '.join(repr(float(c)) for c in W[:, j])}]::DOUBLE[])"
        for j in range(W.shape[1])
    )
    proj = _qz(_qz("list_dot_product((e.embedding)::DOUBLE[], c.coefs)"))
    return f"""
    WITH comp(dim_idx, coefs) AS (VALUES
      {comp_rows}
    )
    SELECT e.vec_id, c.dim_idx, {proj} AS value,
           {explained!r} AS explained_variance_sum
    FROM embeddings e CROSS JOIN comp c
    """


def _pca_oracle() -> str | None:
    """Zero-arg lazy wrapper stored in the catalog: resolves the oracle
    scale from the environment at fetch time and delegates to the
    per-sf_dir cached fit."""
    return _pca_oracle_for(
        os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    )


def _run_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-query form of pca_reduce: posexploded to scalar rows
    (vec_id, dim_idx, component value, explained sum) — list columns
    must never reach a declared query's output (the driver canonicalizer
    sorts rows and cannot hash Python lists)."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.pca import pca_reduce
    from distributedvectordatabase_spark.sources.tables import load_table

    reduced = pca_reduce(load_table(spark, "embeddings", sf_dir), k=16)
    return reduced.select(
        "vec_id",
        F.posexplode("pca").alias("dim_idx", "value"),
        "explained_variance_sum",
    ).select("vec_id", "dim_idx", _qz_col("value").alias("value"), "explained_variance_sum")


def _ivf_gate_store(sf_dir: str):
    """Build-once IVF store for the declared queries, keyed by a
    fingerprint of the source parquet (mtime+size): the driver
    regenerates /root/testdata between rounds, and a stale /tmp store
    built from older data would silently skew the recall gate."""
    from distributedvectordatabase_spark.sources.ivf_store import IVFStore

    return IVFStore(_gate_tmp_path("dvdb_ivf_gate", sf_dir), n_cells=16, seed=42)


def _run_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN through the persistent store: build once per sf_dir
    (KMeans fit + cell-partitioned write), then query with partition
    pruning — the build/query split a real index workload uses, and
    ~5 s less KMeans per bench call than the fit-per-query operator."""
    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    store = _ivf_gate_store(sf_dir)
    if not os.path.exists(store._centroid_path):
        store.build(load_table(spark, "embeddings", sf_dir))
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    return store.knn(spark, queries, k=KNN_K, n_probe=4)


def _run_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k probe sweep of the IVF store vs exact kNN — quantifies
    the accuracy/latency trade the ANN path makes, mirroring
    knn_pruned_recall for the LSH path (reference semantics:
    sharding/lsh_sharding.py:98-161 trades recall for probe count but
    never measures it; we do for both pruned paths). One row per
    n_probe in {4, n_cells/2, n_cells}: recall must be nondecreasing in probes and
    exactly 1.0 at n_probe = n_cells (probing every cell IS the exact
    search) — deterministic invariants asserted in
    tests/test_ivf_store.py, stronger than an arbitrary floor on this
    unclustered corpus (measured recall@10 ≈ 0.65-0.76 at n_probe=4)."""
    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    store = _ivf_gate_store(sf_dir)
    corpus = load_table(spark, "embeddings", sf_dir)
    if not os.path.exists(store._centroid_path):
        store.build(corpus)
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    exact = knn(corpus, queries, k=KNN_K).select("qid", "neighbor_id").cache()
    total = exact.count()
    rows = []
    # Sweep derived from the store so the "full probe == exact" last
    # point survives any future n_cells change.
    for n_probe in sorted({4, store.n_cells // 2, store.n_cells}):
        approx = store.knn(spark, queries, k=KNN_K, n_probe=n_probe).select(
            "qid", "neighbor_id"
        )
        hits = exact.join(approx, ["qid", "neighbor_id"]).count()
        rows.append((n_probe, _qz_py(hits / total)))
    exact.unpersist()
    # Self-asserting (r9, VERDICT r8 #5): the driver can't oracle a
    # KMeans-seeded sweep, so the runner pins its own floors — a silent
    # cell-routing regression turns this gate into `err` instead of
    # quietly-wrong rows. Floors: recall nondecreasing in probes;
    # full probe is EXACTLY the exact search (1.0 after quantization);
    # n_probe=4 has measured 0.65-0.76 across driver regenerations of
    # this corpus, floored at 0.5 (half the probe budget of a 16-cell
    # store must beat a coin flip by a wide margin, but the floor stays
    # clear of regeneration noise).
    if any(b[1] < a[1] for a, b in zip(rows, rows[1:])):
        raise AssertionError(f"IVF recall sweep not nondecreasing: {rows}")
    if rows[-1][1] != 1.0:
        raise AssertionError(
            f"full probe (n_probe=n_cells) must equal exact kNN, got {rows[-1]}"
        )
    if rows[0][1] < 0.5:
        raise AssertionError(
            f"recall@{KNN_K} at n_probe=4 fell below the 0.5 floor: {rows[0]}"
        )
    return spark.createDataFrame(rows, schema="n_probe int, recall_at_k double")


def _run_ann_ivf_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with n_probe = n_cells: probing every cell degenerates to
    the exact search (cell assignment only routes; a full probe scans
    everything), so exact-kNN SQL IS this query's oracle — the
    hash-checked gate on the IVF store's partition-pruned scan path
    (sources/ivf_store.py), which the approximate probe runner
    (_run_ann_ivf, bench-only since r4) couldn't give as a rows-only
    gate. Complements ann_ivf_recall's sweep, whose last point asserts
    the same identity against Spark-side exact kNN."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    store = _ivf_gate_store(sf_dir)
    if not os.path.exists(store._centroid_path):
        store.build(load_table(spark, "embeddings", sf_dir))
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    return store.knn(
        spark, queries, k=KNN_K, n_probe=store.n_cells
    ).withColumn("dist", _qz_col("dist"))


def _run_media_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 media→embedding inference declared end-to-end (reference
    generate_coco_embeddings.py:27-83): documents → media fixture →
    Arrow-batched fake-model inference → embeddings exploded to scalar
    rows so the value-hash gate checks every component."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.multimodal import (
        as_media_table,
        infer_embeddings,
    )
    from distributedvectordatabase_spark.sources.tables import load_table

    media = as_media_table(load_table(spark, "documents", sf_dir))
    emb = infer_embeddings(media)
    return emb.select(
        "item_id", F.posexplode("embedding").alias("dim_idx", "value")
    ).select("item_id", "dim_idx", _qz_col("value").alias("value"))


def _media_infer_oracle(dim: int = 16) -> str:
    """The fake model is md5-derived, so DuckDB reproduces it exactly:
    component i = ('0x'||substr(md5(text || '|' || i),1,8))::BIGINT
    / 2^32 * 2 - 1 (all float64-exact operations)."""
    return f"""
    SELECT d.doc_id AS item_id, t.i AS dim_idx,
           (cast(floor((('0x' || substr(md5(d.text || '|' || t.i), 1, 8))::BIGINT
                 / 4294967296.0 * 2 - 1) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS value
    FROM documents d, generate_series(0, {dim - 1}) t(i)
    """


def _run_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (salting) over the events table;
    results provably identical to the plain group-by the oracle runs."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.skew import salted_aggregate
    from distributedvectordatabase_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,4)")
    )
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "*"),
            "sum_value": ("sum", "value_dec"),
            "max_value": ("max", "value_dec"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n_events",
        _qz_col(F.col("sum_value").cast("double")).alias("sum_value"),
        _qz_col(F.col("max_value").cast("double")).alias("max_value"),
    )


EMB_DIM = 64  # testdata embeddings dimension (TESTDATA.md)


_BQ_CODES: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _bq_corpus_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached packed corpus codes for the knn_hamming gate —
    the same keying as tables._LOADED (mtime+size invalidates on
    testdata regeneration) plus a memory+disk persist: the identity
    sign-pack is a wide codegen projection that otherwise re-runs on
    every bench rep (~2× the whole scan-bound query, VERDICT r5 #5).
    The persisted table is 2 bigints/row — KBs at gate scale. Persist
    is session-lifetime, the doc_lm_score_df contract; stores persist
    codes durably via VectorStore.build_bq instead."""
    import os as _os

    from pyspark.storagelevel import StorageLevel

    from distributedvectordatabase_spark.operators.bq import bq_encode
    from distributedvectordatabase_spark.sources.tables import load_table

    st = _os.stat(_os.path.join(sf_dir, "embeddings.parquet"))
    key = (sf_dir, st.st_mtime_ns, st.st_size)
    cache = _BQ_CODES.setdefault(spark, {})
    hit = cache.get(key)
    if hit is not None:
        return hit
    codes = (
        bq_encode(load_table(spark, "embeddings", sf_dir), EMB_DIM)
        .select("vec_id", "bq_code")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cache[key] = codes
    return codes


def _run_knn_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized Hamming top-k (operators/bq.py): sign-bit pack
    to 2×32-bit words, Hamming shortlist over the fixture queries. All
    columns are integers — the one ANN gate with zero float parity
    surface (no quantize step at all). Corpus codes come from the
    session cache (_bq_corpus_codes) so bench reps measure the scan,
    not the re-encode; rows are byte-identical either way (the pack is
    deterministic)."""
    from distributedvectordatabase_spark.operators.bq import bq_encode, bq_topk
    from distributedvectordatabase_spark.sources.tables import queries_fixture

    qcodes = bq_encode(
        queries_fixture(spark, sf_dir, n=N_QUERIES), EMB_DIM, "qvec", out_col="qcode"
    )
    return bq_topk(
        _bq_corpus_codes(spark, sf_dir),
        qcodes.select("qid", "qcode"),
        k=KNN_K,
    )


def knn_hamming_oracle_sql(n_queries: int = N_QUERIES, k: int = KNN_K) -> str:
    """Replicates bq_encode + bq_topk in pure DuckDB SQL: the same
    32-bit sign-pack (checked ``<<`` makes bit 63 unusable, hence the
    word width — see operators/bq.py), integer Hamming, (hamming, id)
    total order."""
    words = []
    for w in range(EMB_DIM // 32):
        bits = " | ".join(
            f"(CASE WHEN embedding[{w * 32 + j + 1}] > 0 "
            f"THEN (1::BIGINT << {j}) ELSE 0::BIGINT END)"
            for j in range(32)
        )
        words.append(f"({bits})")
    ham = " + ".join(
        f"bit_count(xor(q.qcode[{w + 1}], p.code[{w + 1}]))"
        for w in range(EMB_DIM // 32)
    )
    return f"""
    WITH packed AS (
      SELECT vec_id, [{", ".join(words)}] AS code FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, code AS qcode
      FROM packed ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
      SELECT q.qid, p.vec_id AS neighbor_id, ({ham})::BIGINT AS hamming
      FROM q CROSS JOIN packed p
    ),
    ranked AS (
      SELECT qid, neighbor_id, hamming,
             row_number() OVER (PARTITION BY qid ORDER BY hamming, neighbor_id) AS rnk
      FROM scored
    )
    SELECT qid, neighbor_id, hamming, rnk FROM ranked WHERE rnk <= {k}
    """


def _salted_event_counts_oracle() -> str:
    return """
    SELECT event_type, count(*) AS n_events,
           (cast(floor(((sum(value::DECIMAL(18,4)))::DOUBLE) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS sum_value,
           (cast(floor(((max(value::DECIMAL(18,4)))::DOUBLE) * cast(1000000 as double) + cast(0.5 as double)) as bigint) / cast(1000000 as double)) AS max_value
    FROM events
    GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------------

def _run_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation end-to-end: exact kNN top-k as the
    ranker under test, same-label membership (excluding self) as the
    relevance judgments, and operators/evaluate.ranking_metrics for
    recall@k / precision@k / MRR / AP@k / nDCG@k per query. The
    reference never measures ranking quality (benchmark_performance.py
    is latency-only); an LLM-data pipeline shipping an index must."""
    from pyspark.sql import functions as F

    from distributedvectordatabase_spark.operators.evaluate import ranking_metrics
    from distributedvectordatabase_spark.operators.knn import knn
    from distributedvectordatabase_spark.sources.tables import load_table, queries_fixture

    corpus = load_table(spark, "embeddings", sf_dir)
    queries = queries_fixture(spark, sf_dir, n=N_QUERIES)
    results = knn(corpus, queries, k=KNN_K, metric="l2sq")
    qmeta = (
        corpus.orderBy("vec_id")
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"))
    )
    # Judged relevant = same label, excluding the query row itself (so
    # the guaranteed rank-1 self hit is NOT a free win).
    qrels = (
        F.broadcast(qmeta)
        .join(corpus, corpus["label"] == qmeta["qlabel"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), F.lit(1).alias("rel"))
    )
    per = ranking_metrics(results, qrels, k=KNN_K, doc_col="neighbor_id")
    return per.select(
        "qid",
        "n_rel",
        "hits",
        _qz_col("recall_at_k").alias("recall_at_k"),
        _qz_col("precision_at_k").alias("precision_at_k"),
        _qz_col("mrr").alias("mrr"),
        _qz_col("ap").alias("ap"),
        _qz_col("ndcg").alias("ndcg"),
    )


def retrieval_eval_oracle_sql(n_queries: int = N_QUERIES, k: int = KNN_K) -> str:
    """Full relational restatement of the eval gate: the exact-kNN
    oracle CTE feeds the trec_eval-convention metric algebra (windowed
    cumulative hits for AP, best-first qrels window for IDCG)."""
    return f"""
    WITH res AS ({knn_oracle_sql("l2sq", n_queries, k)}),
    q AS (
      SELECT vec_id AS qid, label AS qlabel
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    qrels AS (
      SELECT q.qid, e.vec_id AS neighbor_id, 1 AS rel
      FROM q JOIN embeddings e ON e.label = q.qlabel AND e.vec_id <> q.qid
    ),
    totals AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid),
    ideal AS (
      SELECT qid, sum((pow(2.0, rel) - 1.0) / log2(pos + 1.0)) AS idcg
      FROM (
        SELECT qid, rel,
               row_number() OVER (PARTITION BY qid ORDER BY rel DESC, neighbor_id) AS pos
        FROM qrels
      ) i WHERE pos <= {k} GROUP BY qid
    ),
    j AS (
      SELECT r.qid, r.rnk,
             CASE WHEN qr.rel IS NULL THEN 0 ELSE 1 END AS hit,
             coalesce(qr.rel, 0) AS rel
      FROM res r
      LEFT JOIN qrels qr ON qr.qid = r.qid AND qr.neighbor_id = r.neighbor_id
    ),
    jc AS (
      SELECT *, sum(hit) OVER (PARTITION BY qid ORDER BY rnk) AS cum_hits FROM j
    ),
    per AS (
      SELECT qid,
             sum(hit) AS hits,
             coalesce(max(CASE WHEN hit = 1 THEN 1.0 / rnk END), 0.0) AS mrr,
             sum(CASE WHEN hit = 1
                 THEN (pow(2.0, rel) - 1.0) / log2(rnk + 1.0) ELSE 0.0 END) AS dcg,
             sum(CASE WHEN hit = 1
                 THEN cast(cum_hits AS double) / rnk ELSE 0.0 END) AS ap_num
      FROM jc GROUP BY qid
    )
    SELECT t.qid, t.n_rel,
           cast(coalesce(p.hits, 0) AS bigint) AS hits,
           {_qz('cast(coalesce(p.hits, 0) as double) / t.n_rel')} AS recall_at_k,
           {_qz(f'cast(coalesce(p.hits, 0) as double) / {k}.0')} AS precision_at_k,
           {_qz('coalesce(p.mrr, 0.0)')} AS mrr,
           {_qz(f'coalesce(p.ap_num, 0.0) / least(t.n_rel, {k})')} AS ap,
           {_qz('coalesce(p.dcg, 0.0) / i.idcg')} AS ndcg
    FROM totals t
    JOIN ideal i USING (qid)
    LEFT JOIN per p USING (qid)
    """


def build_catalog() -> dict[str, Query]:
    qs = [
        # vector search (O9/O11/X1, O10 pruning, O13)
        Query("knn_l2", _run_knn("l2sq"), knn_oracle_sql("l2sq")),
        Query("knn_cosine", _run_knn("cosine"), knn_oracle_sql("cosine")),
        Query("knn_single_topk", _run_knn_single, knn_single_oracle_sql()),
        Query("semantic_search_topk", _run_semantic_search, semantic_search_oracle_sql()),
        Query("knn_pruned_2of3", _run_knn_pruned, pruned_knn_oracle_sql(_LSH)),
        Query("knn_pruned_recall", _run_pruned_recall, pruned_recall_oracle_sql(_LSH)),
        # LSH sharding (O4-O6); the store gate below carries the
        # O14/O15 distribution + imbalance metrics
        Query("lsh_buckets", _run_lsh_buckets, lsh_bucket_oracle_sql(_LSH)),
        # store round-trip (O7/O8/O17/O18) + distribution stats (O14/O15)
        Query("store_shard_distribution", _run_store_counts, _store_counts_oracle(_LSH)),
        # metadata-filtered search (the reference's declared future work)
        Query("knn_filtered", _run_knn_filtered, knn_filtered_oracle_sql()),
        # PCA (O3) — no SQL oracle (sign/rotation indeterminacy); rows-only
        Query("pca_project_16", _run_pca, _pca_oracle),
        # ANN scale path — the recall gate quantifies the n_probe
        # accuracy trade and runs the probe path internally (rows-only:
        # centroid init not SQL-expressible). The raw approximate top-k
        # (ann_ivf_topk) left the gated set in r4 for knn_filtered —
        # it stays a catalog runner, benched under BENCH "extra" and
        # exact-checked at full probe by ann_ivf_exact_probe.
        Query("ann_ivf_recall", _run_ann_ivf_recall, None),
        # full probe == exact search, so exact-kNN SQL is its oracle —
        # the hash-checked gate on the IVF store's scan path
        Query("ann_ivf_exact_probe", _run_ann_ivf_exact, knn_oracle_sql("l2sq")),
        # O2 media→embedding inference (md5 fake model = exact oracle)
        Query("media_infer_embeddings", _run_media_infer, _media_infer_oracle()),
        # text analysis (X4 + north star; doc_quality absorbs the old
        # token-stats/repetition queries, doc_sample_fingerprint the old
        # fingerprint/sample-hash ones)
        _sql_query("doc_quality", _q_doc_quality),
        Query("doc_tfidf_top3", _run_doc_tfidf_top3, _q_doc_tfidf_top3(DUCKDB)),
        # language identification from raw text (r11, VERDICT r10 #1):
        # the frozen hashed-char-n-gram classifier — integer-only
        # scoring, no float parity surface
        # r11: Spark side runs the spread-scan DataFrame mirror (the
        # scoring otherwise single-threads on the one-row-group
        # testdata); oracle stays the shared template.
        Query("doc_langid", _run_doc_langid, _q_doc_langid(DUCKDB)),
        # lexical ranked retrieval (north star: hybrid search's text leg)
        Query("doc_bm25_topk", _run_bm25, bm25_oracle_sql()),
        # training-data shaping (north star): sliding-window chunking
        Query("doc_chunks", _run_doc_chunks, _q_doc_chunks(DUCKDB)),
        # dedup family (X2/X3 + north star); shingle MinHash is the
        # headline scale path (unigram form stays bench-only — see bench.py)
        _sql_query("dedup_exact", _q_dedup_exact),
        _sql_query("curation_pipeline", _q_curation_pipeline),
        # the derived-lang curation pass (r11): same gates/dedup, but
        # language comes from the classifier, as a real crawl requires
        # r11: the Spark side runs the restructured DataFrame form (the
        # template's WHERE triggers a ~650× PushDownPredicate expression
        # re-expansion; see _q_curation_pipeline_langid's docstring);
        # the oracle stays the shared template.
        Query(
            "curation_pipeline_langid",
            _run_curation_pipeline_langid,
            _q_curation_pipeline_langid(DUCKDB),
        ),
        # benchmark decontamination (north star: eval-overlap pass)
        Query("decontam_overlap", _run_decontam, _q_decontam(DUCKDB)),
        Query(
            "dedup_minhash_shingle",
            _run_dedup_minhash_shingle,
            _q_dedup_minhash_shingle(DUCKDB),
        ),
        Query("dedup_simhash", _run_dedup_simhash, _q_dedup_simhash(DUCKDB)),
        Query("setsim_pairs", _run_setsim_pairs, _q_setsim_pairs(DUCKDB)),
        Query("dedup_clusters", _run_dedup_clusters, _q_dedup_clusters(DUCKDB)),
        # brute baseline + LSH-bucketed scale path, tagged in one gate
        Query(
            "embedding_neardup",
            _run_embedding_neardup_both,
            _embedding_neardup_both_oracle(),
        ),
        # multimodal binary-column plumbing (north star): decode +
        # frame-sampling merged per-format roll-up
        Query("multimodal_pipeline", _run_multimodal_stats, _multimodal_stats_oracle()),
        # vector analytics (X5; centroid+dispersion merged into one gate)
        _sql_query("label_centroid_dispersion", _q_label_centroid_dispersion),
        _sql_query("vector_norms", _q_vector_norms),
        # events (X6/X7); hour-bucket aggregation gates through
        # events_windowed (same plan the streaming operator runs)
        _sql_query("events_sessions", _q_events_sessions),
        # events_daily_active was folded out in r4 to keep the catalog at the
        # driver's 50-gate cap when ann_ivf_exact_probe came in: its day
        # bucketing is events_windowed/events_sessions coverage, its
        # distinct-user counting is events_approx_distinct's (exact-checked
        # in tests/test_catalog.py).
        Query("events_windowed", _run_events_windowed, _q_events_windowed(DUCKDB)),
        Query("events_asof_purchase", _run_events_asof, _events_asof_oracle()),
        # approximate-distinct (§2.2, HLL++) left the gated set in r4
        # for decontam_overlap: its estimates are engine-specific so it
        # could only ever be a rows-only gate, while its ≤5% relative
        # error stays pinned in tests/test_catalog.py and its runtime
        # stays benched under BENCH "extra".
        Query("events_range_join", _run_events_range_join, _events_range_join_oracle()),
        # relational star schema (X8). Second r6 rotation: tpch_q5
        # (6-table join — the deepest relational plan) and tpch_q17
        # (correlated-agg subquery) stay as the in-window relational
        # representatives; the six single-mechanism gates hash-green
        # since r2-r3 (tpch_q1_pricing, tpch_q3_topk_revenue,
        # customer_rank_analytics, order_part_lists,
        # sales_grouping_sets, returnflag_pivot_unpivot) cede their
        # slots to the six overflow entries the driver has NEVER
        # hash-checked, so after r6 every oracle-able declared query
        # has been externally verified in at least one round.
        _sql_query("tpch_q5_nation_revenue", _q_tpch_q5),
        _sql_query("tpch_q17_small_qty", _q_tpch_q17_small_qty),
        # r10 rotation (VERDICT r9 #1): the entire r9 surface — six
        # gates with full hash oracles the driver has NEVER checked
        # (the largest unverified batch any round carried) — enters
        # the window. Six externally-green gates cede their slots
        # (bpe_pair_stats r7-r9; priority_stats/order_window_ranks/
        # source_regex_stats/lineitem_price_stats r8-r9 on top of
        # r2-r5; hybrid_rrf_topk r6-r9) and stay bit-for-bit checked
        # by tests/exact_compare.py.
        Query("retrieval_eval_metrics", _run_retrieval_eval, retrieval_eval_oracle_sql()),
        _sql_query("events_zorder_key", _q_events_zorder_key),
        Query("embedding_drift", _run_embedding_drift, embedding_drift_oracle_sql()),
        _sql_query("doc_gopher_repetition", _q_doc_gopher_repetition),
        Query(
            "doc_dsir_weights", _run_doc_dsir_weights, _q_doc_dsir_weights(DUCKDB)
        ),
        # r11: Spark side runs the operator's window-strategy form
        # (one explode pass; measured faster at every probed scale);
        # oracle stays the shared template.
        Query(
            "doc_substring_dedup",
            _run_doc_substring_dedup,
            _q_doc_substring_dedup(DUCKDB),
        ),
        # r9 rotation (VERDICT r8 #1): hybrid_filtered_topk — the
        # engine's most composed query (exact filtered semantic leg +
        # hard-constraint BM25 leg through two persisted stores, RRF
        # fused) and the only hash-oracle gate the driver had never
        # checked — enters the window. strat_sample_weighted cedes
        # (externally hash-green r6-r8, single-mechanism, its quota
        # sibling already strict-checked in overflow since r8).
        Query("hybrid_filtered_topk", _run_hybrid_filtered,
              hybrid_filtered_oracle_sql()),
        # r6 gate rotation (VERDICT r5 #1): the four r5 query families
        # enter the driver's 50-gate window so the external DuckDB
        # oracle hash-checks them; four long-stable single-mechanism
        # relational gates (priority_stats, order_window_ranks,
        # source_regex_stats, lineitem_price_stats — hash-green since
        # r2-r3) cede their slots and stay strict-checked locally.
        # PII redaction over deterministically injected synthetic PII
        # (the testdata itself is clean).
        _sql_query("doc_pii_scrub", _q_doc_pii_scrub),
        # char-trigram LM quality score (CCNet-style ppl filter,
        # self-trained on the corpus). Spark side runs the
        # materialize-dt-once DataFrame form.
        Query("doc_lm_score", _run_doc_lm_score, _q_doc_lm_score(DUCKDB)),
        # binary-quantized Hamming search (operators/bq.py) — the 1-bit
        # rung of the compression ladder. Integer-only output, so the
        # gate has no float parity surface at all.
        Query("knn_hamming", _run_knn_hamming, knn_hamming_oracle_sql()),
        # r11 rotation (VERDICT r10 #2/#8): doc_unigram_tokens — the
        # only hash-oracle gate never externally verified (born in
        # overflow r10) — enters the window, alongside the three
        # STALEST r6/r8 demotions not externally re-checked in 4+
        # rounds (events_value_histogram green r6 only; customer_set_ops
        # and doc_packs green through r7). Six long-green gates cede
        # (dedup_minhash per the verdict's own suggestion — its shingle
        # sibling stays; events_salted_agg, events_json_extract,
        # centroid_assign, embedding_quantize_error,
        # doc_sample_fingerprint — all externally hash-green r2-r10)
        # and stay bit-for-bit checked by tests/exact_compare.py.
        _sql_query("doc_unigram_tokens", _q_doc_unigram_tokens),
        _sql_query("events_value_histogram", _q_events_value_histogram),
        _sql_query("customer_set_ops", _q_customer_set_ops),
        Query("doc_packs", _run_doc_packs, _q_doc_packs(DUCKDB)),
        # position 51+: past the driver's 50-gate cap, but still
        # exact-checked by tests/test_catalog.py (and benched where in
        # bench.py's lists). Slot cessions, r4: events_value_histogram →
        # doc_bm25_topk; customer_set_ops → doc_chunks; doc_packs joins
        # as chunking's companion. Slot cessions, r6 first rotation:
        # priority_stats, order_window_ranks, source_regex_stats,
        # lineitem_price_stats → hybrid_rrf_topk, doc_pii_scrub,
        # doc_lm_score, knn_hamming (VERDICT r5 next-round #1). Second
        # r6 rotation: the six r2-r3 relational gates below cede to the
        # six r4/r5 overflow entries above, completing external
        # hash-verification coverage of every oracle-able declared
        # query. Everything here was driver-green for 3+ consecutive
        # rounds before demotion and stays strict-checked by
        # tests/exact_compare.py (driver-style bit-for-bit).
        _sql_query("tpch_q1_pricing", _q_tpch_q1),
        _sql_query("tpch_q3_topk_revenue", _q_tpch_q3),
        _sql_query("customer_rank_analytics", _q_customer_rank_analytics),
        _sql_query("order_part_lists", _q_order_part_lists),
        _sql_query("sales_grouping_sets", _q_sales_grouping_sets),
        Query(
            "returnflag_pivot_unpivot",
            _run_returnflag_unpivot,
            _returnflag_unpivot_oracle(),
        ),
        # r8 rotation (remaining): these cede their slots to the
        # returning r6-demoted relational gates (rolling-freshness
        # policy, VERDICT r7 #4); externally hash-green for 3+ rounds
        # and bit-for-bit green under tests/exact_compare.py.
        # (events_value_histogram, customer_set_ops and doc_packs
        # returned to the window in the r11 rotation above.)
        Query("mix_weighted_sources", _run_mix_weighted, _q_mix_weighted(DUCKDB)),
        Query("strat_sample_quota", _run_strat_sample, _q_strat_sample(DUCKDB)),
        # r9 rotation: strat_sample_weighted demoted here after three
        # rounds externally hash-green (r6-r8), ceding its slot to
        # hybrid_filtered_topk (VERDICT r8 #1). Stays bit-for-bit green
        # under tests/exact_compare.py beside its quota sibling.
        Query(
            "strat_sample_weighted",
            _run_strat_sample_weighted,
            _q_strat_sample_weighted(DUCKDB),
        ),
        # r10 rotation (VERDICT r9 #1): these six cede their slots to
        # the six r9-surface gates above (retrieval_eval_metrics,
        # events_zorder_key, embedding_drift, doc_gopher_repetition,
        # doc_dsir_weights, doc_substring_dedup — the driver had never
        # hash-checked any of them). All six demotions were externally
        # hash-green 2-4 consecutive rounds and stay bit-for-bit green
        # under tests/exact_compare.py like every prior demotion.
        _sql_query("bpe_pair_stats", _q_bpe_pair_stats),
        _sql_query("priority_stats", _q_priority_stats),
        _sql_query("order_window_ranks", _q_order_window_ranks),
        _sql_query("source_regex_stats", _q_source_regex_stats),
        _sql_query("lineitem_price_stats", _q_lineitem_price_stats),
        Query("hybrid_rrf_topk", _run_hybrid_rrf, hybrid_rrf_oracle_sql()),
        # r11 rotation: these six cede their slots to doc_langid,
        # curation_pipeline_langid, doc_unigram_tokens and the three
        # returning stale demotions (VERDICT r10 #1/#2/#8). All were
        # externally hash-green every round since r1/r2 (dedup_minhash
        # is the verdict's own demotion candidate — the shingle scale
        # path stays in-window) and stay bit-for-bit green under
        # tests/exact_compare.py like every prior demotion.
        Query("dedup_minhash", _run_dedup_minhash, _q_dedup_minhash(DUCKDB)),
        Query("events_salted_agg", _run_salted_event_counts, _salted_event_counts_oracle()),
        _sql_query("events_json_extract", _q_events_json),
        _sql_query("centroid_assign", _q_centroid_assign),
        _sql_query("embedding_quantize_error", _q_embedding_quantize_error),
        _sql_query("doc_sample_fingerprint", _q_doc_sample_fingerprint),
    ]
    return {q.name: q for q in qs}
