"""PII scrubbing: redaction correctness, rule ordering (no double
counting), column-collision guard, clean-corpus no-op, and plan shape
(pure codegen expressions, no UDF/shuffle)."""

import pytest

from distributedvectordatabase_spark.operators.scrub import scrub_pii
from distributedvectordatabase_spark.plans import physical_plan
from distributedvectordatabase_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def samples(spark):
    return spark.createDataFrame(
        [
            (0, "write john.doe+x@mail.example.com or 10.1.2.3 now"),
            (1, "call +1 (415) 555-0134 re case 902101234567 today"),
            (2, "plain text only"),
            (3, "id 123456789 and user123456789@example.org twice"),
        ],
        "doc_id long, text string",
    ).cache()


def test_redaction_and_counts(spark, samples):
    rows = {r.doc_id: r for r in scrub_pii(samples).collect()}
    assert rows[0].text_scrubbed == "write <EMAIL> or <IP> now"
    assert (rows[0].n_email, rows[0].n_ip, rows[0].n_phone, rows[0].n_idnum) == (1, 1, 0, 0)
    assert rows[1].text_scrubbed == "call <PHONE> re case <ID> today"
    assert (rows[1].n_phone, rows[1].n_idnum) == (1, 1)
    assert rows[2].text_scrubbed == "plain text only"
    assert sum([rows[2].n_email, rows[2].n_ip, rows[2].n_phone, rows[2].n_idnum]) == 0


def test_rule_order_prevents_double_count(spark, samples):
    # doc 3: the digits inside the email are consumed by the email rule
    # FIRST, so idnum counts only the bare run
    r = {x.doc_id: x for x in scrub_pii(samples).collect()}[3]
    assert r.n_email == 1
    assert r.n_idnum == 1
    assert r.text_scrubbed == "id <ID> and <EMAIL> twice"


def test_column_collision_raises(spark, samples):
    with pytest.raises(ValueError, match="already exist"):
        scrub_pii(samples.withColumn("n_email", samples.doc_id))
    with pytest.raises(ValueError, match="already exist"):
        scrub_pii(samples, out_col="text")


def test_clean_corpus_is_noop(spark):
    docs = load_table(spark, "documents", SF_DIR)
    out = scrub_pii(docs).filter(
        "n_email + n_ip + n_phone + n_idnum > 0 or text_scrubbed <> text"
    )
    assert out.count() == 0


def test_plan_is_pure_codegen(spark, samples):
    plan = physical_plan(scrub_pii(samples))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
