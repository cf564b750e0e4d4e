"""Exact (bitwise, driver-style) oracle comparison for catalog queries.

The pytest harness (conftest.assert_matches_oracle) allows atol=2e-6,
which hides one-ulp float canonicalization divergence that the driver's
sha256-of-CSV hash check does NOT forgive. This module reproduces the
driver's exact check: canonicalize (sort columns by name, round doubles
to 1e-6, sort rows), serialize to CSV, compare byte-for-byte.

Run as a script to check specific queries:

    python -m tests.exact_compare knn_cosine sales_grouping_sets
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

from tests.conftest import SF_DIR, canonicalize


def canonicalize_raw(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-worst-case canonical form: sort columns/rows but do NOT
    re-round doubles — values are hashed as the engines returned them,
    so a one-ulp divergence between Spark's and DuckDB's round() is
    visible (conftest.canonicalize's own .round(6) would mask it)."""
    from decimal import Decimal

    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype == object and out[c].map(
            lambda x: isinstance(x, Decimal) or x is None
        ).all():
            out[c] = out[c].astype("float64")
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64") + 0.0
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def exact_mismatches(
    got: pd.DataFrame, want: pd.DataFrame, raw: bool = True
) -> pd.DataFrame:
    """Return rows whose CSV serialization differs (empty == exact match)."""
    canon = canonicalize_raw if raw else canonicalize
    g = canon(got)
    w = canon(want)
    if list(g.columns) != list(w.columns) or len(g) != len(w):
        raise AssertionError(
            f"shape mismatch: {list(g.columns)}x{len(g)} vs {list(w.columns)}x{len(w)}"
        )
    # Full-precision serialization (pandas shortest-repr): two doubles that
    # differ by one ulp AFTER the 1e-6 round produce different lines, which
    # is the strictest reading of "hash the CSV" a driver can implement.
    gcsv = g.to_csv(index=False).splitlines()
    wcsv = w.to_csv(index=False).splitlines()
    bad = [i for i, (a, b) in enumerate(zip(gcsv, wcsv)) if a != b]
    rows = []
    for i in bad:
        rows.append({"line": i, "spark": gcsv[i], "oracle": wcsv[i]})
    return pd.DataFrame(rows)


def main(names: list[str]) -> int:
    from distributedvectordatabase_spark.catalog import build_catalog
    from distributedvectordatabase_spark.session import get_spark
    from distributedvectordatabase_spark.sources.tables import TABLES

    spark = get_spark(app_name="exact-compare", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    cat = build_catalog()
    if not names:
        names = sorted(n for n, q in cat.items() if q.oracle is not None)
    rc = 0
    for name in names:
        q = cat[name]
        if q.oracle is None:
            print(f"{name}: SKIP (rows-only)")
            continue
        got = q.run(spark, SF_DIR).toPandas()
        want = con.sql(q.oracle).df()
        try:
            diff = exact_mismatches(got, want)
        except AssertionError as e:
            print(f"{name}: SHAPE FAIL {e}")
            rc = 1
            continue
        if len(diff):
            print(f"{name}: EXACT FAIL ({len(diff)} rows)")
            print(diff.head(5).to_string())
            rc = 1
        else:
            print(f"{name}: exact ok")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
