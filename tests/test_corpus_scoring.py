"""Operator-level invariants for the round-5b corpus-scoring family:
bigram LM predictability, DSIR importance weights, lexical diversity,
n-gram novelty — each checked on crafted corpora with hand-computable
exact answers (the oracle-parity suite covers cross-engine equality;
these pin the SEMANTICS)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mdio_python_spark.operators import curation, dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hash64(s: str) -> int:
    """Pure-python twin of functions.scalars.hash64 (60-bit md5 prefix)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _find_doc_id(eval_member: bool, start: int = 0) -> int:
    """Lowest doc_id >= start whose deterministic eval-split membership
    matches ``eval_member`` (split = hash('eval' || id) % 20 == 0)."""
    i = start
    while True:
        if (_hash64(f"eval{i}") % 20 == 0) == eval_member:
            return i
        i += 1


# --------------------------------------------------------------------------
# bigram LM
# --------------------------------------------------------------------------


def test_bigram_lm_deterministic_corpus_scores_one(spark):
    """When every prefix word has exactly one continuation in the corpus,
    every conditional probability is 1 and every doc scores exactly 1.0."""
    docs = _docs(spark, [(1, "a b c"), (2, "a b c a b c")])
    out = {r.doc_id: r for r in text.bigram_lm_scores(docs).collect()}
    # doc 2 also contains the bigram "c a" (the only continuation of c)
    assert out[1].n_bigrams == 2 and out[1].lm_score == 1.0
    assert out[2].n_bigrams == 5 and out[2].lm_score == 1.0


def test_bigram_lm_split_prefix_halves_score(spark):
    """'a' continues to 'b' and to 'c' twice each -> every p(.|a) = 0.5."""
    docs = _docs(spark, [(1, "a b"), (2, "a c"), (3, "a b"), (4, "a c")])
    for r in text.bigram_lm_scores(docs).collect():
        assert r.n_bigrams == 1 and r.lm_score == 0.5


def test_bigram_lm_drops_docs_without_bigrams(spark):
    docs = _docs(spark, [(1, "solo"), (2, "two tokens")])
    got = {r.doc_id for r in text.bigram_lm_scores(docs).collect()}
    assert got == {2}


# --------------------------------------------------------------------------
# DSIR importance weights
# --------------------------------------------------------------------------


def test_dsir_identical_distributions_weight_one(spark):
    """One eval doc and one train doc with identical text: every bucket
    has t_cnt == r_cnt, every ratio is exactly 1, weight is exactly 1."""
    eval_id = _find_doc_id(True)
    train_id = _find_doc_id(False)
    docs = _docs(spark, [(eval_id, "x y x z"), (train_id, "x y x z")])
    rows = curation.dsir_importance_weights(docs).collect()
    assert {r.doc_id for r in rows} == {train_id}  # eval side never scored
    assert rows[0].n_grams == 3 and rows[0].dsir_weight == 1.0


def test_dsir_upweights_target_like_docs(spark):
    """A train doc matching the eval text must outweigh a disjoint one."""
    eval_id = _find_doc_id(True)
    t1 = _find_doc_id(False)
    t2 = _find_doc_id(False, t1 + 1)
    docs = _docs(
        spark,
        [
            (eval_id, "alpha beta alpha beta alpha beta"),
            (t1, "alpha beta alpha beta"),
            (t2, "gamma delta gamma delta"),
        ],
    )
    w = {r.doc_id: r.dsir_weight for r in curation.dsir_importance_weights(docs).collect()}
    assert w[t1] > w[t2]


# --------------------------------------------------------------------------
# vocab diversity
# --------------------------------------------------------------------------


def _sourced(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_diversity_degenerate_and_uniform_sources(spark):
    docs = _sourced(
        spark,
        [
            (1, "flat", "same same same same"),
            (2, "rich", "w0 w1 w2 w3"),
        ],
    )
    out = {r.source: r for r in text.vocab_diversity(docs).collect()}
    flat, rich = out["flat"], out["rich"]
    assert flat.n_tokens == 4 and flat.n_types == 1
    assert flat.simpson_index == 0.0  # single type: 1 - 1 = 0
    assert flat.type_token_ratio == 0.25
    assert rich.n_tokens == 4 and rich.n_types == 4
    assert rich.type_token_ratio == 1.0
    assert rich.simpson_index == 0.75  # 1 - 4 * (1/4)^2


# --------------------------------------------------------------------------
# n-gram novelty
# --------------------------------------------------------------------------

_EIGHT = "t1 t2 t3 t4 t5 t6 t7 t8"


def test_novelty_exact_copy_scores_zero(spark):
    docs = _docs(spark, [(1, _EIGHT), (2, _EIGHT)])
    out = {r.doc_id: r for r in dedup.ngram_novelty(docs, n=8).collect()}
    assert out[1].novelty_frac == 1.0  # first occurrence
    assert out[2].novelty_frac == 0.0  # exact copy of a lower id
    assert out[1].n_grams == out[2].n_grams == 1


def test_novelty_partial_overlap_fraction(spark):
    # doc 2 = doc 1 shifted by one token: shares 1 of its 2 8-grams
    docs = _docs(spark, [(1, _EIGHT + " t9"), (2, _EIGHT + " fresh")])
    out = {r.doc_id: r for r in dedup.ngram_novelty(docs, n=8).collect()}
    assert out[1].n_grams == 2 and out[1].novelty_frac == 1.0
    assert out[2].n_grams == 2 and out[2].n_novel == 1
    assert out[2].novelty_frac == 0.5


def test_novelty_short_docs_drop(spark):
    docs = _docs(spark, [(1, "only seven tokens in this short doc")])
    assert dedup.ngram_novelty(docs, n=8).count() == 0
