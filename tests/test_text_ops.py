"""Unit tests for text operators on constructed rows — the driver corpus
contains no PII-shaped spans, so replacement semantics are pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.operators import text


def test_redact_pii_replaces_and_counts(spark):
    rows = [
        (1, "contact me at alice.smith+news@example.co.uk today"),
        (2, "see https://example.com/a?b=1 and http://x.io/z"),
        (3, "call 555-867-5309 or 555 123 4567 now"),
        (4, "clean text with no sensitive spans"),
        (5, "mixed: bob@corp.io via https://corp.io at 212-555-0199"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.redact_pii(df).collect()}

    assert out[1]["n_emails"] == 1 and out[1]["redacted"] == (
        "contact me at [EMAIL] today"
    )
    assert out[2]["n_urls"] == 2 and out[2]["redacted"] == "see [URL] and [URL]"
    # both phone formats match the pattern
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted"] == "call [PHONE] or [PHONE] now"
    assert out[4]["redacted"] == rows[3][1]
    assert (out[4]["n_urls"], out[4]["n_emails"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[5]["redacted"] == "mixed: [EMAIL] via [URL] at [PHONE]"


def test_redact_pii_hash_matches_redacted(spark):
    df = spark.createDataFrame([(1, "x bob@corp.io y")], ["doc_id", "text"])
    r = text.redact_pii(df).select("redacted", "redacted_hash").first()
    expect = df.sparkSession.createDataFrame([(r["redacted"],)], ["t"]).select(
        F.md5("t")
    ).first()[0]
    assert r["redacted_hash"] == expect
