"""Gopher repetition filtering (operators/gopher.py) and its gate.

Pins: (1) the DataFrame scale path reproduces the hash-gated SQL form
bit-for-bit on real testdata (every column, exact — the integers ARE
exact and the fractions share the q6 quantization), (2) planted
spam/diverse/empty inputs trip exactly the intended rule,
(3) gopher_filter keeps precisely the keep==1 rows with the original
schema, (4) no Python UDFs anywhere in the plan."""

from __future__ import annotations

from distributedvectordatabase_spark.operators.gopher import (
    gopher_filter,
    gopher_repetition,
)
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_matches_gate_bitwise(spark):
    from distributedvectordatabase_spark.catalog import build_catalog

    docs = load_table(spark, "documents", SF_DIR)
    got = {r.doc_id: r.asDict() for r in gopher_repetition(docs).collect()}
    gate = build_catalog()["doc_gopher_repetition"].run(spark, SF_DIR)
    want = {r.doc_id: r.asDict() for r in gate.collect()}
    assert got == want


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_rules(spark):
    spam2 = " ".join(["buy now"] * 30)  # one 2-gram covers everything
    dup5 = " ".join(["a b c d e"] * 10) + " " + " ".join(
        f"w{i}" for i in range(40)
    )  # repeated 5-gram block, but no dominant 2-gram
    clean = " ".join(f"tok{i}" for i in range(60))
    docs = _mk(spark, [(1, spam2), (2, dup5), (3, clean), (4, "")])
    out = {r.doc_id: r for r in gopher_repetition(docs).collect()}
    assert out[1].keep == 0 and out[1].top2_frac > 0.2
    assert out[2].keep == 0 and out[2].dup5_frac > 0.15
    assert out[3].keep == 1 and out[3].dup5_frac == 0.0
    # empty doc: all-zero profile, fractions guarded to 0.0 (ADVICE r9)
    assert out[4].n_words == 0
    assert out[4].ttr == 0.0 and out[4].top2_frac == 0.0
    assert out[4].keep == 1


def test_filter_keeps_survivors_with_schema(spark):
    docs = _mk(
        spark,
        [(1, " ".join(["x y"] * 30)), (2, " ".join(f"t{i}" for i in range(50)))],
    )
    kept = gopher_filter(docs)
    assert kept.columns == docs.columns
    assert [r.doc_id for r in kept.collect()] == [2]


def test_plan_has_no_python_udfs(spark):
    docs = _mk(spark, [(1, "a b c")])
    plan = (
        gopher_repetition(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_pretokenized_column_matches_text_path(spark):
    """tokens_col reuses a persisted token column (the tokenize-once
    pattern); output must equal the text path exactly."""
    from pyspark.sql import functions as F
    from distributedvectordatabase_spark.functions.text import SPARK, tokens

    docs = _mk(spark, [(1, " ".join(["x y"] * 20)), (2, "a  b   c"), (3, "")])
    pre = docs.withColumn("toks_pre", F.expr(tokens("text", SPARK)))
    a = {r.doc_id: r.asDict() for r in gopher_repetition(docs).collect()}
    b = {
        r.doc_id: r.asDict()
        for r in gopher_repetition(pre, tokens_col="toks_pre").collect()
    }
    assert a == b
