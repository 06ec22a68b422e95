"""Operator tests for sequence packing: crafted-doc assignments, prefix-sum
correctness across forced multi-partition layouts, boundary spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_python_spark.operators.packing import global_running_sum, pack_sequences


def test_global_running_sum_matches_serial_prefix(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, w long").repartition(13)
    out = {
        r.k: r.cum_before
        for r in global_running_sum(df, ["k"], "w").collect()
    }
    acc = 0
    for k, w in rows:  # rows are already in k order
        assert out[k] == acc, k
        acc += w


def test_pack_sequences_crafted_docs(spark):
    # ctx=10; doc 1: 4 tokens, doc 2: 8 tokens (spans seqs 0-1), doc 3: 20
    # tokens (spans 1-3), doc 4: 1 token
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, " ".join("t" * 1 for _ in range(8))),
            (3, " ".join(["x"] * 20)),
            (4, "z"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.cum_before, r.seq_id, r.seq_offset, r.n_seqs_spanned)
        for r in pack_sequences(docs, 10).collect()
    }
    assert got[1] == (4, 0, 0, 0, 1)
    assert got[2] == (8, 4, 0, 4, 2)  # tokens 4..11 -> crosses into seq 1
    assert got[3] == (20, 12, 1, 2, 3)  # tokens 12..31 -> seqs 1,2,3
    assert got[4] == (1, 32, 3, 2, 1)


def test_pack_sequences_exact_boundary_no_span(spark):
    # doc ends exactly at the context boundary: spans exactly 1 sequence
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 10)), (2, "b b b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in pack_sequences(docs, 10).collect()}
    assert got[1].n_seqs_spanned == 1
    assert (got[2].seq_id, got[2].seq_offset) == (1, 0)


def test_pack_sequences_plan_has_no_global_window(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        pack_sequences(docs, 16)._jdf.queryExecution().executedPlan().toString()
    )
    # the carry window runs on hashpartitioning(_pid % 1) — never a
    # corpus-wide SinglePartition exchange
    assert "Exchange SinglePartition" not in plan, plan
