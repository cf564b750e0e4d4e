"""Cross-engine numeric-primitive parity pins.

The oracle gate hashes full-precision CSV, so every numeric primitive
the catalog's dual-dialect templates rely on must behave BIT-identically
in Spark and DuckDB. These tests pin the behaviors we depend on — and
would catch an engine upgrade silently changing one of them:

- `_dec` (double → decimal) must be half-boundary stable. A raw
  ``cast(double as decimal)`` is NOT: Spark rounds the shortest decimal
  repr half-up while DuckDB rounds the exact binary expansion, so
  11651.54645 (binary ...544999...) casts to .5465 vs .5464 — a
  data-dependent one-cell divergence that flips a whole aggregate's
  hash when the testdata happens to contain a boundary value (the r3
  sales_grouping_sets failure class).
- the sequential-fold distance expressions (Spark aggregate/zip_with
  vs DuckDB list_dot_product / list_sum-of-transform) must produce
  bitwise-equal doubles, or kNN neighbor ranking diverges on near-tied
  candidates.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from distributedvectordatabase_spark.catalog import _dec, _qz

# Doubles whose exact binary value sits just under the scale-4 half
# boundary while their shortest repr sits ON it — the divergence class.
HALF_BOUNDARY_VALUES = [
    11651.54645,
    74241.06625,
    80233.68505,
    0.00005,
    2.5e-5,
    123.45675,
]


def _duck_eval(expr: str, x: float) -> object:
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {expr} AS v FROM (SELECT cast(? as double) AS x)", [x]).fetchone()[0]
    finally:
        con.close()


def _spark_eval(spark, expr: str, x: float) -> object:
    return (
        spark.createDataFrame([(float(x),)], "x double")
        .selectExpr(f"{expr} AS v")
        .collect()[0][0]
    )


@pytest.mark.parametrize("x", HALF_BOUNDARY_VALUES)
def test_dec_is_half_boundary_stable(spark, x):
    expr = _dec("x", "18,4")
    s = _spark_eval(spark, f"cast({expr} as string)", x)
    d = _duck_eval(f"cast({expr} as varchar)", x)
    from decimal import Decimal

    assert Decimal(s) == Decimal(d), f"_dec diverged on {x!r}: spark={s} duck={d}"


@pytest.mark.parametrize("x", [11651.54645, 74241.06625])
def test_raw_decimal_cast_divergence_is_real(spark, x):
    """Documents WHY _dec quantizes: the raw cast genuinely diverges on
    these inputs. If an engine upgrade makes this pass, _dec's _qz
    detour becomes optional (but stays harmless)."""
    from decimal import Decimal

    s = _spark_eval(spark, "cast(cast(x as decimal(18,4)) as string)", x)
    d = _duck_eval("cast(cast(x as decimal(18,4)) as varchar)", x)
    assert Decimal(s) != Decimal(d), (
        "raw double->decimal cast now agrees across engines; "
        "_dec's quantization detour is no longer load-bearing"
    )


def test_qz_bitwise_stable(spark):
    rng = np.random.default_rng(11)
    xs = np.concatenate(
        [rng.uniform(-1e6, 1e6, 500), np.array(HALF_BOUNDARY_VALUES)]
    )
    expr = _qz("x", 6)
    sdf = (
        spark.createDataFrame(pd.DataFrame({"x": xs}))
        .selectExpr(f"{expr} AS v")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": xs}))
    ddf = con.execute(f"SELECT {expr} AS v FROM t").fetchdf()
    con.close()
    a = sdf["v"].to_numpy()
    b = ddf["v"].to_numpy()
    assert (a.view(np.int64) == b.view(np.int64)).all()


def test_distance_expressions_bitwise_equal(spark):
    """The kNN dist the rescore emits (sequential Spark fold) and the
    oracle's DuckDB form must agree bit-for-bit, or near-tied neighbor
    ranking diverges engine-to-engine."""
    from distributedvectordatabase_spark.catalog import _cos_dist, _l2sq, DUCKDB, SPARK

    import pyarrow as pa

    rng = np.random.default_rng(5)
    n, dim = 2000, 64
    A = rng.standard_normal((n, dim)).astype(np.float32)
    B = rng.standard_normal((n, dim)).astype(np.float32)
    B[:50] = A[:50]  # exact dups
    B[50:100] = A[50:100] + np.float32(1e-7)  # near dups
    pdf = pd.DataFrame({"a": list(map(list, A)), "b": list(map(list, B))})

    s_l2 = _l2sq("a", "b", SPARK)
    s_cos = _cos_dist("a", "b", SPARK)
    d_l2 = _l2sq("a", "b", DUCKDB)
    d_cos = _cos_dist("a", "b", DUCKDB)

    sdf = (
        spark.createDataFrame(pdf, "a array<float>, b array<float>")
        .selectExpr(f"{s_l2} AS l2", f"{s_cos} AS cos")
        .toPandas()
    )
    # Register as a TYPED arrow table (list<float32>), matching the
    # parquet storage the real gates read. Registering the raw pandas
    # frame would stringify the list column to VARCHAR, and the
    # ::DOUBLE[] cast would then re-parse shortest-repr strings —
    # a ~1e-6 round-trip error that has nothing to do with the engines.
    f32list = pa.list_(pa.float32())
    tbl = pa.table(
        {
            "a": pa.array([list(map(float, r)) for r in A], type=f32list),
            "b": pa.array([list(map(float, r)) for r in B], type=f32list),
        }
    )
    con = duckdb.connect()
    con.register("t", tbl)
    ddf = con.execute(f"SELECT {d_l2} AS l2, {d_cos} AS cos FROM t").fetchdf()
    con.close()
    for c in ["l2", "cos"]:
        a = sdf[c].to_numpy()
        b = ddf[c].to_numpy()
        diffs = int((a.view(np.int64) != b.view(np.int64)).sum())
        assert diffs == 0, f"{c}: {diffs} bitwise diffs"
