"""SQL-function registration — the engine's UDF story (SURVEY §2.2).

The reference exposes no user-extensible functions (its one pluggable
point, ``sharding_strategy``, accepts only ``'lsh'``;
coordinator/coordinator.py:50-57). Here every vector/text primitive is
registered as a **SQL scalar function** (``CREATE TEMPORARY FUNCTION …
RETURN <expr>``), so SQL users call ``l2sq(a, b)`` or
``lsh_bucket(vec)`` directly. These are declarative function bodies —
Catalyst inlines them into the calling plan and whole-stage-codegens
them; nothing here drops to a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from distributedvectordatabase_spark.functions.lsh import SignLSH


def _sum_expr(arr: str) -> str:
    return f"aggregate({arr}, cast(0.0 as double), (s, x) -> s + x)"


def _dot(a: str, b: str) -> str:
    return _sum_expr(f"zip_with(cast({a} as array<double>), cast({b} as array<double>), (x, y) -> x * y)")


def register_sql_functions(spark: SparkSession, lsh: SignLSH | None = None) -> list[str]:
    """Register the engine's scalar functions for this session's SQL.

    Returns the registered function names. ``lsh`` parameterizes
    ``lsh_bucket`` (defaults to the engine's seeded default, so SQL and
    the DataFrame API bucket identically).
    """
    lsh = lsh or SignLSH()
    l2norm = f"sqrt({_dot('a', 'a')})"
    bnorm = f"sqrt({_dot('b', 'b')})"
    cos = f"(case when {l2norm} * {bnorm} = 0 then 0.0 else {_dot('a', 'b')} / ({l2norm} * {bnorm}) end)"

    defs: dict[str, str] = {
        "vec_dot": f"(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN {_dot('a', 'b')}",
        "l2sq": (
            "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
            + _sum_expr("zip_with(cast(a as array<double>), cast(b as array<double>), (x, y) -> (x - y) * (x - y))")
        ),
        "l2_norm": f"(a ARRAY<FLOAT>) RETURNS DOUBLE RETURN {l2norm}",
        "l2_normalize": (
            "(a ARRAY<FLOAT>) RETURNS ARRAY<DOUBLE> RETURN "
            f"transform(cast(a as array<double>), x -> x / (case when {l2norm} = 0 then 1.0 else {l2norm} end))"
        ),
        "cosine_sim": f"(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN {cos}",
        "cosine_dist": f"(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN (1.0 - {cos})",
        "lsh_bucket": (
            f"(a ARRAY<FLOAT>) RETURNS INT RETURN {lsh.bucket_sql_spark('a')}"
        ),
        "ws_tokens": (
            "(t STRING) RETURNS ARRAY<STRING> RETURN filter(split(t, ' ', -1), x -> x <> '')"
        ),
        "n_ws_tokens": (
            "(t STRING) RETURNS INT RETURN size(filter(split(t, ' ', -1), x -> x <> ''))"
        ),
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
    return list(defs)
