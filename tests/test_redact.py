from __future__ import annotations

from pyspark.sql import functions as F

from sonata_neo4j_loader_spark.operators import redact

SF_DIR = "/root/testdata/sf0.01"


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return redact.redact_pii(df).collect()[0]


def test_all_three_classes(spark):
    r = _one(
        spark,
        "mail a.b+1@ex-a.co then +1-555-123-4567 or (555) 111-2222 "
        "from 10.7.0.49 end 1.2.3.4",
    )
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 2, 2)
    assert r.redacted_text == (
        "mail <EMAIL> then <PHONE> or <PHONE> from <IP> end <IP>"
    )


def test_counts_are_class_sequential(spark):
    # the IPv4 inside the email's domain is swallowed by the email pass:
    # attributed to email, NOT double-counted as an IP
    r = _one(spark, "ping a@1.2.3.4.com and 5.6.7.8")
    assert (r.n_email, r.n_ipv4) == (1, 1)
    assert r.redacted_text == "ping <EMAIL> and <IP>"


def test_clean_text_untouched_and_null_passthrough(spark):
    df = spark.createDataFrame([("no pii here",), (None,)], "text string")
    rows = {r.text: r for r in redact.redact_pii(df).collect()}
    assert rows["no pii here"].redacted_text == "no pii here"
    assert rows["no pii here"].n_email == 0
    assert rows[None].redacted_text is None and rows[None].n_email is None


def test_redaction_is_shuffle_free(spark):
    # pure column expressions: composed onto a parquet scan the operator
    # must add no Exchange (it rides the scan's codegen stage)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        redact.redact_pii(docs.select("doc_id", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_staged_query_counts(spark):
    # the planted-PII staged query: every doc has >=1 email, the modular
    # subsets get the rest (full value adjudication runs in the staged
    # oracle gate; this pins the planting logic's shape)
    import __spark_entry__ as entry

    out = entry.docs_pii_redacted(spark, SF_DIR)
    agg = out.agg(
        F.min("n_email").alias("min_e"),
        F.sum("n_email").alias("sum_e"),
        F.sum("n_phone").alias("sum_p"),
        F.sum("n_ipv4").alias("sum_i"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert agg.n == 500
    assert agg.min_e == 1
    assert agg.sum_e == 500 + 100  # every doc + every 5th
    assert agg.sum_p == 167  # doc_id % 3 == 0
    assert agg.sum_i == 125  # doc_id % 4 == 0
    assert "<EMAIL>" not in "".join(
        out.select("redacted_md5").limit(1).collect()[0]
    )  # md5, not raw text
