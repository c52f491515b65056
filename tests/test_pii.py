"""PII scan/redaction: pattern hits on hand-written text, redaction
idempotence and typed placeholders, planted-class recovery, and
Spark/DuckDB agreement of the registered audit."""

import duckdb
import pytest

from macrobase_spark.operators.pii import (
    generate_pii_docs,
    pii_counts,
    pii_redact,
)
from macrobase_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.01"


def test_counts_on_hand_text(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a@b.co and c.d+x@e-f.org, call +123-555-0042, host 10.0.0.1"),
            (1, "nothing here 1234"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_counts(df).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ip"]) == (2, 1, 1)
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ip"]) == (0, 0, 0)


def test_redaction_replaces_and_is_idempotent(spark):
    df = spark.createDataFrame(
        [(0, "a@b.co calls +123-555-0042 from 10.0.0.1")],
        "doc_id long, text string",
    )
    red = pii_redact(df).collect()[0]["redacted"]
    assert red == "<EMAIL> calls <PHONE> from <IP>"
    again = pii_redact(
        spark.createDataFrame([(0, red)], "doc_id long, text string")
    ).collect()[0]["redacted"]
    assert again == red


def test_fixture_class_recovery(spark):
    from pyspark.sql import functions as F

    from macrobase_spark.operators.pii import _CLASS_EXPR

    n = 400
    classed = pii_counts(generate_pii_docs(spark, n)).withColumn(
        "pii_class", F.expr(_CLASS_EXPR.strip())
    )
    got = {
        r["pii_class"]: r["count"]
        for r in classed.groupBy("pii_class").count().collect()
    }
    expect: dict[str, int] = {}
    for i in range(n):
        if i % 11 == 3:
            c = "pii_light"
        elif i % 13 == 4:
            c = "pii_light"
        elif i % 17 == 6:
            c = "pii_heavy"
        else:
            c = "clean"
        expect[c] = expect.get(c, 0) + 1
    assert got == expect


def test_registered_query_matches_oracle(spark):
    got = sorted(tuple(r) for r in QUERIES["pii_scan_documents"](spark, SF).collect())
    want = sorted(duckdb.sql(ORACLES["pii_scan_documents"]).fetchall())
    assert got == want
    assert len(got) == 3


def test_counts_are_redaction_consistent(spark):
    """A phone-shaped local part inside an email must count as ONE email
    and ZERO phones — exactly what redaction rewrites."""
    df = spark.createDataFrame(
        [(0, "reach me at 123-555-0042@example.com thanks")],
        "doc_id long, text string",
    )
    r = pii_counts(df).collect()[0]
    assert (r["n_email"], r["n_phone"], r["n_ip"]) == (1, 0, 0)
    red = pii_redact(df).collect()[0]["redacted"]
    assert red == "reach me at <EMAIL> thanks"
