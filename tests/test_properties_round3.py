"""Property-based tests (hypothesis) for round-3 operators: ordered
export vs row_number, salted join vs plain join, chunking coverage
invariants. Spark-backed properties use few, large-ish examples (each
example costs a job); the properties are the point, not the example
count."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),
        min_size=1,
        max_size=60,
    )
)
@settings(**SPARK_SETTINGS)
def test_ordered_export_equals_global_row_number(spark, rows):
    from mdio_python_spark.operators.grid import ordered_export

    df = spark.createDataFrame(rows, ["a", "b"])
    got = ordered_export(df, ["a", "b"]).collect()
    w = Window.orderBy("a", "b")
    want = (
        df.withColumn("export_ordinal", F.row_number().over(w).cast("long"))
        .collect()
    )
    # compare as multisets of (a, b, ordinal): ties in (a, b) may permute
    # within their ordinal range, exactly like row_number's arbitrary ties
    got_keys = sorted((r["a"], r["b"]) for r in got)
    want_keys = sorted((r["a"], r["b"]) for r in want)
    assert got_keys == want_keys
    assert sorted(r["export_ordinal"] for r in got) == list(
        range(1, len(rows) + 1)
    )
    # ordinals must respect the (a, b) total preorder
    by_ord = sorted(got, key=lambda r: r["export_ordinal"])
    keys = [(r["a"], r["b"]) for r in by_ord]
    assert keys == sorted(keys)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100)),
        min_size=0,
        max_size=50,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 100)),
        min_size=0,
        max_size=20,
    ),
    salt=st.sampled_from([2, 4, 16]),
)
@settings(**SPARK_SETTINGS)
def test_salted_join_equals_plain_join(spark, left, right, salt):
    from mdio_python_spark.operators.joins import salted_join

    ldf = spark.createDataFrame(left, ["k", "v"]) if left else None
    rdf = spark.createDataFrame(right, ["k", "w"]) if right else None
    if ldf is None or rdf is None:
        return
    got = sorted(map(tuple, salted_join(ldf, rdf, "k", salt=salt).collect()))
    want = sorted(map(tuple, ldf.join(rdf, "k").collect()))
    assert got == want


@given(
    n_tokens=st.integers(0, 300),
    chunk=st.sampled_from([8, 32, 64]),
    overlap=st.sampled_from([0, 4, 7]),
)
@settings(**SPARK_SETTINGS)
def test_chunking_covers_every_token(spark, n_tokens, chunk, overlap):
    from mdio_python_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    stride = chunk - overlap
    n_effective = max(n_tokens, 1)  # empty text tokenizes to ['']
    # chunk starts are exactly the stride grid below n_effective
    assert [r["chunk_start"] for r in rows] == list(
        range(0, n_effective, stride)
    )
    # every token position is covered by at least one chunk
    covered = set()
    for r in rows:
        covered |= set(
            range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"])
        )
    assert covered == set(range(n_effective))
    # all chunks are full-size except possibly the tail run
    for r in rows[:-1]:
        assert (
            r["n_chunk_tokens"] == chunk
            or r["chunk_start"] + r["n_chunk_tokens"] == n_effective
        )


@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    ).filter(lambda v: len(v) % 4 == 0)
)
@settings(**SPARK_SETTINGS)
def test_pq_self_encoding_is_exact(spark, vals):
    """A vector that IS a codeword must encode to itself with zero
    reconstruction error in every subspace."""
    from mdio_python_spark.operators.similarity import pq_codebooks, pq_encode

    rows = [(i, vals) for i in range(8)]  # 8 identical rows = codebook
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books, sub = pq_codebooks(df, n_subspaces=4, n_codes=8)
    got = pq_encode(df, books, sub).collect()
    for r in got:
        # identical codewords: ties break to code 0
        assert [r[f"code_{m}"] for m in range(4)] == [0, 0, 0, 0]


def test_pq_rejects_indivisible_dim(spark):
    from mdio_python_spark.operators.similarity import pq_codebooks

    df = spark.createDataFrame(
        [(i, [float(i)] * 10) for i in range(8)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError):
        pq_codebooks(df, n_subspaces=4, n_codes=8)
