"""Property tests for the zip_with word-shingle formulation.

r4 replaced the naive ``transform(sequence(...), i -> concat_ws(' ',
slice(toks, i, n)))`` Spark shingle (which re-evaluates the tokenizer
expression per lambda element — O(words²) per doc) with a zip_with fold
over shifted slices. The two must be extensionally identical — same
strings, same order, same empty-array behavior — for every input, since
five oracle gates (decontam, minhash ×2, doc_quality, fingerprint)
hash their output.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions import text as T


def _naive_spark_shingles(toks_expr: str, n: int) -> str:
    """The pre-r4 formulation, kept as the reference semantics."""
    return (
        f"case when size({toks_expr}) < {n} then array() "
        f"else transform(sequence(1, size({toks_expr}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_expr}, i, {n}))) end"
    )


# Words: non-empty, no spaces (the tokenizer guarantees both).
words = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters=" "),
    min_size=1,
    max_size=8,
)
docs = st.lists(st.lists(words, min_size=0, max_size=12), min_size=1, max_size=20)


@settings(max_examples=25, deadline=None)
@given(docs=docs, n=st.integers(min_value=1, max_value=4))
def test_zipwith_shingles_match_naive(spark, docs, n):
    pdf = pd.DataFrame({"toks": docs})
    df = spark.createDataFrame(pdf, "toks array<string>")
    out = df.selectExpr(
        f"{T.word_shingles('toks', n, T.SPARK)} AS fast",
        f"{_naive_spark_shingles('toks', n)} AS naive",
    ).collect()
    for row in out:
        assert row.fast == row.naive


def test_zipwith_shingles_match_duckdb(spark):
    """Spark zip_with shingles == DuckDB list_transform shingles on a
    deterministic corpus (the dialect pair the oracle gates rely on)."""
    import duckdb
    import pyarrow as pa

    corpus = [
        [],
        ["a"],
        ["a", "b"],
        ["a", "b", "c"],
        ["a", "b", "c", "d", "e"],
        ["x"] * 10,
        ["w1", "w2", "w3", "w4"],
    ]
    n = 3
    pdf = pd.DataFrame({"toks": corpus})
    sdf = (
        spark.createDataFrame(pdf, "toks array<string>")
        .selectExpr(f"{T.word_shingles('toks', n, T.SPARK)} AS sh")
        .toPandas()
    )
    tbl = pa.table({"toks": pa.array(corpus, type=pa.list_(pa.string()))})
    con = duckdb.connect()
    con.register("t", tbl)
    ddf = con.execute(
        f"SELECT {T.word_shingles('toks', n, T.DUCKDB)} AS sh FROM t"
    ).fetchdf()
    con.close()
    for a, b in zip(sdf["sh"], ddf["sh"]):
        assert list(a) == list(b)
