"""Unit tests for lexical retrieval (BM25, term stats) and temperature
resampling — independent pure-python recomputation on small inputs, plus
determinism and plan-shape properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from mdio_python_spark.operators.curation import temperature_resample
from mdio_python_spark.operators.retrieval import (
    B,
    K1,
    bm25_scores,
    bm25_topk,
    term_stats,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark shuffles the hash join build side"),
    (3, "hash hash hash collisions everywhere hash"),
    (4, "a vector of values"),
    (5, ""),
]


@pytest.fixture
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _py_bm25(terms):
    """Independent reference implementation (plain python floats)."""
    toks = {i: t.lower().strip().split() or [""] for i, t in DOCS}
    # split('', r'\s+') yields [''] in Spark/DuckDB; python split() yields []
    toks = {i: (tk if tk else [""]) for i, tk in toks.items()}
    n = len(DOCS)
    sum_dl = sum(len(tk) for tk in toks.values())
    scores = {}
    for i, tk in toks.items():
        dl = len(tk)
        s = 0.0
        for term in terms:
            tf = sum(1 for x in tk if x == term)
            if tf == 0:
                continue
            df = sum(1 for tk2 in toks.values() if term in tk2)
            idf = (n - df + 0.5) / (df + 0.5)
            norm = (1.0 - B) + B * dl * n / sum_dl
            s += idf * ((tf * (K1 + 1.0)) / (tf + K1 * norm))
        if s > 0:
            scores[i] = s
    return scores


def test_bm25_scores_match_reference(spark, docs_df):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs_df, ["hash", "vector"]).collect()
    }
    want = _py_bm25(["hash", "vector"])
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), (k, got[k], want[k])


def test_bm25_rare_term_outranks_common(spark, docs_df):
    # "vector" appears in 1 doc, "the" in 2: doc 4 (rare term) must
    # outrank docs matching only the common term.
    top = bm25_topk(docs_df, ["vector", "the"], k=5).collect()
    assert top[0]["doc_id"] == 4
    assert [r["rank"] for r in top] == list(range(1, len(top) + 1))


def test_bm25_two_phase_equals_global(spark):
    """The bucketed two-phase top-k must equal a direct global window."""
    docs = spark.createDataFrame(
        [(i, ("hash " * (i % 7)) + ("spark " * (i % 3))) for i in range(1, 301)],
        ["doc_id", "text"],
    )
    got = bm25_topk(docs, ["hash", "spark"], k=10).collect()
    scored = bm25_scores(docs, ["hash", "spark"])
    want = (
        scored.orderBy(F.col("score").desc(), "doc_id").limit(10).collect()
    )
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_term_stats_counts(spark, docs_df):
    rows = {
        r["term"]: (r["collection_freq"], r["doc_freq"])
        for r in term_stats(docs_df, ["hash", "the", "missing"]).collect()
    }
    assert rows == {"hash": (5, 2), "the": (3, 2), "missing": (0, 0)}


def test_bm25_no_corpus_shuffle_before_stats(spark):
    """tf computation must be a pure projection: the only exchanges are
    the 1-row stats broadcast and the (pruned) rank windows — never a
    hash repartition of the corpus keyed on doc-side columns."""
    from mdio_python_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        bm25_topk(docs, ["hash", "spark"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_temperature_resample_sqrt_shares(spark):
    """Post-sample sizes must track sqrt(n_s) * sqrt(n_min) within
    hash-sampling noise, and the smallest stratum keeps ~everything."""
    rows = [(i, "big" if i % 10 else "small") for i in range(1, 5001)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = temperature_resample(df).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    n_small, n_big = 500, 4500
    assert got["small"] == n_small  # rate 1.0: keeps everything, exactly
    expected_big = math.sqrt(n_small * n_big)
    assert abs(got["big"] - expected_big) / expected_big < 0.15


def test_temperature_resample_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1, 2001)], ["doc_id", "source"]
    )
    a = sorted(r["doc_id"] for r in temperature_resample(df).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(df.repartition(7)).collect()
    )
    assert a == b  # stable under physical re-layout (hash, not RNG)
