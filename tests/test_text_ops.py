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


def test_chunk_documents_windows(spark):
    from mdio_python_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, words), (2, "short text")], ["doc_id", "text"])
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    }
    # doc 1: starts at 0, 48, 96 -> sizes 64, 52, 4
    assert [(rows[(1, i)]["chunk_start"], rows[(1, i)]["n_chunk_tokens"]) for i in range(3)] == [
        (0, 64),
        (48, 52),
        (96, 4),
    ]
    # doc 2: one short chunk
    assert rows[(2, 0)]["chunk_start"] == 0
    assert rows[(2, 0)]["n_chunk_tokens"] == 2
    assert len(rows) == 4
    # overlap: chunk 1 of doc 1 starts inside chunk 0 (48 < 64)
    # hashes are deterministic and distinct across different windows
    assert rows[(1, 0)]["chunk_hash"] != rows[(1, 1)]["chunk_hash"]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from mdio_python_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=16, overlap=16)


def test_build_vocab_rank_and_tokenize_ids(spark):
    from mdio_python_spark.operators.text import build_vocab, tokenize_ids

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b zzz")], "doc_id long, text string"
    )
    vocab = {r.token: r.token_id for r in build_vocab(docs, vocab_size=2).collect()}
    # a(3) -> 0, b(2) -> 1; c/zzz out of vocab
    assert vocab == {"a": 0, "b": 1}
    out = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in tokenize_ids(
            docs, build_vocab(docs, vocab_size=2), oov_id=2
        ).collect()
    }
    assert out == {1: (4, 1), 2: (3, 1)}


def test_tokenize_ids_hash_is_order_sensitive(spark):
    from mdio_python_spark.functions.scalars import hash64
    from mdio_python_spark.operators.text import build_vocab, tokenize_ids
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b a")], "doc_id long, text string"
    )
    v = build_vocab(docs, vocab_size=2)
    rows = {r.doc_id: r.ids_hash for r in tokenize_ids(docs, v, 2).collect()}
    assert rows[1] != rows[2]  # same multiset, different order
    expect = spark.range(1).select(hash64(F.lit("0 1")).alias("h")).head()["h"]
    # "a b" with a->0 (freq ties broken lexically at equal counts): a=0, b=1
    assert rows[1] == expect
