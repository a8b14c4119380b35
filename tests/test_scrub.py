"""PII scrubbing — redaction behavior and audit counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from rel_db_to_graph_spark.operators.scrub import redaction_counts, scrub_pii


def _scrub_one(spark, text: str):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(scrub_pii(F.col("t")).alias("s"),
                     redaction_counts(F.col("t")).alias("n")).collect()[0]


def test_email_redacted(spark):
    r = _scrub_one(spark, "contact john.doe+x@example.co.uk today")
    assert r.s == "contact <EMAIL> today" and r.n == 1


def test_url_before_email(spark):
    # the URL swallows the embedded credentials; no half-redacted email
    r = _scrub_one(spark, "see http://user@host.com/path?a=1 ok")
    assert r.s == "see <URL> ok" and r.n == 1


def test_ip_and_phone(spark):
    r = _scrub_one(spark, "from 192.168.0.1 call +1 (555) 123-4567 now")
    assert r.s == "from <IP> call <PHONE> now" and r.n == 2


def test_clean_text_untouched(spark):
    text = "nothing sensitive here at all"
    r = _scrub_one(spark, text)
    assert r.s == text and r.n == 0


def test_multiple_occurrences_all_redacted(spark):
    r = _scrub_one(spark, "a@b.com and c@d.org and http://x.io")
    assert r.s == "<EMAIL> and <EMAIL> and <URL>" and r.n == 3
