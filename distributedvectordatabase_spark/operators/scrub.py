"""PII scrubbing — the redaction pass of a training-data pipeline.

The reference has no text handling at all; this is north-star surface
(SURVEY §2.3): before exporting training shards, emails / IPs /
phone numbers / long id runs are replaced with typed placeholder
tokens. Rules live in ``functions/text.PII_RULES`` (the Java-regex ∩
RE2 common subset, shared verbatim with the ``doc_pii_scrub`` catalog
gate and its DuckDB oracle) and apply IN ORDER on the progressively
scrubbed text, so a digit run inside an already-redacted email is
never double-counted.

Scale shape: every rule is a Catalyst ``regexp_replace`` /
``regexp_extract_all`` expression fused into the scan — whole-stage
codegen, no UDF, no shuffle, embarrassingly parallel at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedvectordatabase_spark.functions.text import (
    PII_RULES,
    SPARK,
    pii_count,
    pii_replace,
)

_TMP = "_pii_txt"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    counts: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``{text_col}_scrubbed``) with every
    PII rule applied, plus one ``n_<kind>`` count column per rule when
    ``counts`` (the redaction audit a compliance pass wants)."""
    out_col = out_col or f"{text_col}_scrubbed"
    clash = ({out_col, _TMP} | {f"n_{k}" for k, _, _ in PII_RULES if counts}) & set(
        df.columns
    )
    if clash:
        raise ValueError(f"scrub_pii output columns already exist: {sorted(clash)}")
    out = df.withColumn(_TMP, F.col(text_col))
    for kind, pattern, token in PII_RULES:
        if counts:
            out = out.withColumn(f"n_{kind}", F.expr(pii_count(_TMP, pattern, SPARK)))
        out = out.withColumn(_TMP, F.expr(pii_replace(_TMP, pattern, token, SPARK)))
    return out.withColumn(out_col, F.col(_TMP)).drop(_TMP)
