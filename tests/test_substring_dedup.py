"""Exact repeated-substring detection (operators/substring_dedup.py)
and its gate.

Pins: (1) the DataFrame scale path reproduces the hash-gated SQL form
bit-for-bit on real testdata, (2) planted cross-doc boilerplate and
within-doc self-repeats produce the expected spans and the trim
removes exactly the duplicated mass, (3) clean docs survive trimming
verbatim, (4) no Python UDFs in the plan."""

from __future__ import annotations

from distributedvectordatabase_spark.operators.substring_dedup import (
    duplicated_spans,
    substring_stats,
    substring_trim,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_matches_gate_bitwise(spark):
    from distributedvectordatabase_spark.catalog import build_catalog

    docs = load_table(spark, "documents", SF_DIR)
    got = {r.doc_id: r.asDict() for r in substring_stats(docs).collect()}
    gate = build_catalog()["doc_substring_dedup"].run(spark, SF_DIR)
    want = {r.doc_id: r.asDict() for r in gate.collect()}
    assert got == want


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_BOILER = "this material is licensed under the creative commons attribution share alike"


def _planted(spark):
    uniq1 = " ".join(f"a{i}" for i in range(20))
    uniq2 = " ".join(f"b{i}" for i in range(20))
    clean = " ".join(f"c{i}" for i in range(30))
    return _mk(
        spark,
        [
            (1, uniq1 + " " + _BOILER),
            (2, _BOILER + " " + uniq2),
            (3, clean),
        ],
    )


def test_planted_boilerplate_spans(spark):
    docs = _planted(spark)
    spans = {
        r.doc_id: (r.s_start, r.s_end)
        for r in duplicated_spans(docs, k=8).collect()
    }
    # _BOILER is 11 words; doc 1 carries it at positions 20..30, doc 2
    # at 0..10; the 4 overlapping 8-windows merge to one maximal span.
    assert spans == {1: (20, 30), 2: (0, 10)}
    stats = {r.doc_id: r for r in substring_stats(docs, k=8).collect()}
    assert stats[1].dup_tokens == 11 and stats[1].n_spans == 1
    assert stats[2].dup_tokens == 11 and stats[2].n_dup_windows == 4
    assert stats[3].clean == 1 and stats[3].dup_tokens == 0


def test_self_repeat_within_one_doc(spark):
    block = " ".join(f"s{i}" for i in range(10))
    docs = _mk(spark, [(7, block + " zz " + block)])
    stats = substring_stats(docs, k=8).collect()[0]
    assert stats.n_spans == 2 and stats.dup_tokens == 20


def test_trim_removes_exactly_the_spans(spark):
    docs = _planted(spark)
    out = {r.doc_id: r for r in substring_trim(docs, k=8).collect()}
    assert out[1].text_trimmed == " ".join(f"a{i}" for i in range(20))
    assert out[2].text_trimmed == " ".join(f"b{i}" for i in range(20))
    assert out[3].text_trimmed == " ".join(f"c{i}" for i in range(30))
    assert out[1].kept_words == 20 and out[1].n_words == 31
    # trimmed mass == the stats' duplicated-token mass
    stats = {r.doc_id: r for r in substring_stats(docs, k=8).collect()}
    for d in (1, 2, 3):
        assert out[d].n_words - out[d].kept_words == stats[d].dup_tokens


def test_trim_drops_everything_for_pure_boilerplate(spark):
    docs = _mk(spark, [(1, _BOILER), (2, _BOILER)])
    out = {r.doc_id: r for r in substring_trim(docs, k=8).collect()}
    assert out[1].text_trimmed == "" and out[1].kept_words == 0


def test_plan_has_no_python_udfs(spark):
    docs = _mk(spark, [(1, "a b c")])
    plan = (
        substring_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_window_strategy_identical_to_join(spark):
    """The one-shuffle window form of duplicate detection must produce
    exactly the join form's rows on real testdata."""
    from distributedvectordatabase_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_DIR)
    a = {r.doc_id: r.asDict() for r in substring_stats(docs, via="join").collect()}
    b = {r.doc_id: r.asDict() for r in substring_stats(docs, via="window").collect()}
    assert a == b
    import pytest

    with pytest.raises(ValueError, match="via"):
        substring_stats(docs, via="nope").collect()
