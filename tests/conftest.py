"""Shared fixtures: one SparkSession per test run + a DuckDB oracle
comparator that mirrors the driver's canonicalization (FIXTURES.md §4:
round doubles to 1e-6, sort columns by name, sort rows, compare)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd
import pytest

from distributedvectordatabase_spark.session import get_spark
from distributedvectordatabase_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # AQE off for the shared TEST session only (r12): adaptive
    # re-optimization adds a driver round per shuffle stage, which at
    # test scale (tiny frames, thousands of jobs) is pure fixed
    # overhead — measured ~17% of a BPE train. Results are identical
    # either way (AQE never changes semantics); production sessions
    # (session.get_spark defaults) keep AQE on, and the few tests that
    # assert AQE-specific plan shapes flip the conf on locally
    # (spark.sql.adaptive.enabled is runtime-settable per query).
    s = get_spark(
        app_name="dvdb-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, doubles
    rounded to 1e-6, timestamps stringified, rows sorted."""
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype == object and out[c].map(lambda x: isinstance(x, Decimal) or x is None).all():
            out[c] = out[c].astype("float64")
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64").round(6) + 0.0  # +0.0 folds -0.0
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_matches_oracle(spark_df, oracle_con, sql: str):
    """Run the Spark DataFrame and the DuckDB SQL; assert canonical
    equality (row count, schema names, values)."""
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=2e-6, rtol=0)
