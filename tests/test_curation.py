"""Operator-level tests for curation: contamination detection on planted
overlaps, repetition scores on crafted docs, sampling determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_planted_ngram_overlap(spark):
    eval_doc = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    train = _docs(
        spark,
        [
            # quotes the full eval 8-gram inside a longer doc
            (1, "intro words " + eval_doc + " trailing words here"),
            # shares only a 7-gram prefix — must NOT be contaminated
            (2, "alpha beta gamma delta epsilon zeta eta iota kappa"),
            (3, "completely unrelated text with eight tokens padding x"),
        ],
    )
    out = {
        r.doc_id: (r.n_contaminated, r.contaminated)
        for r in curation.contamination(train, _docs(spark, [(99, eval_doc)]), n=8).collect()
    }
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_contamination_drops_docs_shorter_than_n(spark):
    train = _docs(spark, [(1, "too short for any gram")])
    ev = _docs(spark, [(2, "a b c d e f g h")])
    assert curation.contamination(train, ev, n=8).count() == 0


def test_repetition_features_crafted_doc(spark):
    # "x y" occurs 3x (overlapping "y x" 2x); 5 bigrams total, 2 distinct
    df = _docs(spark, [(1, "x y x y x y")])
    r = curation.repetition_features(df).collect()[0]
    assert r.n_bigrams == 5
    assert r.n_distinct_bigrams == 2
    assert r.top_bigram == "x y"
    assert r.top_bigram_count == 3
    assert abs(r.dup_bigram_frac - 3 / 5) < 1e-12
    # char mass: "x y" 3*3=9 of total 5*3=15
    assert abs(r.top_bigram_char_frac - 9 / 15) < 1e-12


def test_repetition_top_bigram_tie_breaks_lexicographically_greater(spark):
    df = _docs(spark, [(1, "a b c d")])  # "a b","b c","c d" all count 1
    r = curation.repetition_features(df).collect()[0]
    assert r.top_bigram == "c d"


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    rows = [(i, f"src{i % 4}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = {r.doc_id for r in curation.stratified_sample(df, rates).collect()}
    b = {r.doc_id for r in curation.stratified_sample(df, rates).collect()}
    assert a == b  # deterministic across runs
    by_src = {
        s: len([d for d in a if d % 4 == int(s[-1])]) for s in ("src0", "src1", "src2", "src3")
    }
    assert by_src["src0"] == 500  # rate 1.0 keeps everything
    assert by_src["src2"] == 0  # rate 0.0 drops everything
    assert 150 < by_src["src1"] < 350  # ~0.5 of 500
    assert by_src["src3"] == 0  # default_rate 0.0


def test_eval_split_pred_partitions_corpus(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    pred = curation.eval_split_pred()
    n_eval = df.where(pred).count()
    n_train = df.where(~pred).count()
    assert n_eval + n_train == 1000
    assert 20 < n_eval < 90  # ~1/20


def test_assign_split_partitions_and_stability(spark):
    import pytest

    from mdio_python_spark.operators.curation import assign_split
    from mdio_python_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = assign_split(docs).select("doc_id", "split")
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / total == pytest.approx(0.8, abs=0.1)
    # stability under corpus growth: a doc's split never changes when the
    # input shrinks/grows (the property randomSplit lacks)
    sub = assign_split(docs.limit(50)).select("doc_id", "split").collect()
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)
