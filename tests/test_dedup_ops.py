"""Operator-level tests for the dedup family: recall properties the oracle
hash-match alone doesn't pin (pigeonhole soundness of banding, greedy-drop
consistency, shingle construction edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.operators import dedup, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_short_docs_yield_no_shingles(spark):
    df = _docs(spark, [(1, "one two"), (2, ""), (3, "a b c d")])
    out = dedup.word_shingles(df, n=3, distinct=False).collect()
    got = {(r.doc_id, r.shingle) for r in out}
    assert got == {(3, "a b c"), (3, "b c d")}


def test_shingle_hashes_match_string_hash(spark):
    df = _docs(spark, [(1, "x y z w")])
    strings = dedup.word_shingles(df, n=3, distinct=False)
    from mdio_python_spark.functions.scalars import hash64

    expected = {
        r[0] for r in strings.select(hash64(F.col("shingle"))).collect()
    }
    got = {r.sh for r in dedup.shingle_hashes(df, n=3).collect()}
    assert got == expected


def test_simhash_band_pairs_pigeonhole_recall(spark):
    """Every pair within max_hamming MUST be found (banding is lossless for
    hamming < num_bands); verified against the quadratic all-pairs scan."""
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "alpha beta gamma delta epsilon"),
            (4, "totally different words entirely here"),
            (5, "alpha beta gamma delta epsilon eta"),
        ],
    )
    sim = dedup.simhash(docs, bits=16)
    banded = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_band_pairs(
            sim, bits=16, num_bands=4, max_hamming=3
        ).collect()
    }
    rows = {r.doc_id: r.simhash for r in sim.collect()}
    brute = {
        (a, b)
        for a in rows
        for b in rows
        if a < b and bin(rows[a] ^ rows[b]).count("1") <= 3
    }
    assert banded == brute
    assert (1, 3) in banded  # identical docs -> hamming 0


def test_embedding_near_dup_drops_greedy_keep_min(spark):
    emb = spark.createDataFrame(
        [
            (10, [1.0, 1.0, 1.0, 1.0]),
            (20, [1.0, 1.0, 1.0, 0.9]),  # near-dup of 10, same sign bucket
            (30, [1.0, 1.0, 1.0, 1.1]),  # near-dup of both
            (40, [-1.0, -1.0, 1.0, 1.0]),  # different bucket
        ],
        "vec_id long, embedding array<double>",
    )
    drops = {
        r.drop_id: (r.keep_id, r.n_near_dups)
        for r in similarity.embedding_near_dup_drops(
            emb, threshold=0.95, bits=4
        ).collect()
    }
    assert set(drops) == {20, 30}
    assert drops[20][0] == 10
    assert drops[30][0] == 10
    assert drops[30][1] == 2  # (10,30) and (20,30)
