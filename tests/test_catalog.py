"""Driver-gate simulation: every catalog query runs on Spark at sf0.01
and matches its DuckDB oracle (canonicalized). This is the same check
the driver performs for CORRECTNESS_r{N}.json — and since r4 it is the
*strict* form: full-precision, bit-for-bit equality of the serialized
results (tests/exact_compare.py), not the atol=2e-6 tolerance the rest
of the suite uses. The tolerance compare is what let the r3 one-ulp
round() divergence ship: locally green, driver hash-mismatch."""

import pytest

import __spark_entry__ as entrymod
from distributedvectordatabase_spark.catalog import build_catalog
from tests.conftest import SF_DIR, SF_SMALL, assert_matches_oracle
from tests.exact_compare import exact_mismatches

CATALOG = build_catalog()
WITH_ORACLE = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    q = CATALOG[name]
    got = q.run(spark, SF_DIR).toPandas()
    want = oracle.sql(q.oracle).df()
    diff = exact_mismatches(got, want)
    assert not len(diff), f"{len(diff)} rows differ at full precision:\n{diff.head(5)}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = CATALOG[name].run(spark, SF_DIR)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_approx_distinct_within_tolerance(spark, oracle):
    """HLL++ estimate per event_type within 5% of the exact distinct
    count (rows-only for the driver, so accuracy is asserted here)."""
    from distributedvectordatabase_spark.catalog import _run_events_approx_distinct

    got = {
        r["event_type"]: r["approx_users"]
        for r in _run_events_approx_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r[0]: r[1]
        for r in oracle.sql(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY event_type"
        ).fetchall()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(0.05 * n, 1), (et, got[et], n)


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30
    # smoke one callable through the public contract
    assert qs["tpch_q1_pricing"](spark, SF_SMALL).count() > 0


def test_queries_pin_utc_regardless_of_caller_tz(spark, oracle):
    """The driver's harness session is not ours and may carry any
    timezone; load_table pins UTC so timestamp queries stay
    oracle-equivalent. Asia/Kolkata (+5:30) is the hard case: a
    non-whole-hour offset shifts every hour bucket if the pin fails."""
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        for name in ("events_windowed", "events_sessions"):
            q = CATALOG[name]
            assert_matches_oracle(q.run(spark, SF_DIR), oracle, q.oracle)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
