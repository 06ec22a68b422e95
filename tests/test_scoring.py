"""Operator tests for hashed linear scoring: weight range, determinism,
label thresholds, case folding."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.operators.scoring import _HALF, _M, model_score, token_weight


def test_token_weights_in_range_and_deterministic(spark):
    toks = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "", "alpha"]], "token string"
    )
    rows = toks.select("token", token_weight(F.col("token")).alias("w")).collect()
    by_tok = {}
    for r in rows:
        assert -_HALF <= r.w <= _HALF
        if r.token in by_tok:
            assert by_tok[r.token] == r.w  # same token -> same weight
        by_tok[r.token] = r.w


def test_model_score_bounds_and_labels(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "x"), (3, "ALPHA BETA GAMMA DELTA")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in model_score(docs).collect()}
    for r in out.values():
        assert -1.0 <= r.score <= 1.0
        assert r.label in ("keep", "review", "drop")
        assert r.weight_sum == round(r.score * r.n_tokens * _HALF)
    # case folding: doc 3 is doc 1 uppercased -> identical score
    assert out[1].score == out[3].score
    assert out[1].label == out[3].label


def test_weight_arithmetic_never_overflows_int64(spark):
    # the scramble multiply's max intermediate must fit int64 (Java wraps
    # silently — this pins the constant choice)
    assert (_M - 1) * 2_654_435_761 < 2**63
