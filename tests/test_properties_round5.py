"""Round-5 operator properties: two-phase rank equivalence, Bloom filter
one-sidedness, histogram-sketch quantile bounds."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_group_ranked_equals_window_row_number(spark):
    """group_ranked == row_number() OVER (PARTITION BY keys ORDER BY ...)
    plus the group size — on data with ties, duplicates, and skewed
    group sizes."""
    from mdio_python_spark.operators.ranking import group_ranked

    rows = [(g, v % 7, i) for i, (g, v) in enumerate(
        (g, v) for g in ("a", "b", "c") for v in range(53 if g == "a" else 11)
    )]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {
        (r["g"], r["id"]): (r["_rn"], r["_n"])
        for r in group_ranked(df, ["g"], ["v", "id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    wc = Window.partitionBy("g")
    want = {
        (r["g"], r["id"]): (r["rn"], r["n"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .collect()
    }
    assert got == want


def test_distributed_ordinal_desc_order(spark):
    """Descending sort expressions produce the reversed ordinal."""
    from mdio_python_spark.operators.ranking import distributed_ordinal

    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    got = {
        r["x"]: r["_ordinal"]
        for r in distributed_ordinal(df, [F.col("x").desc()]).collect()
    }
    assert got == {x: 100 - x for x in range(100)}


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every built item must probe maybe_present=1 (one-sided error);
    unseen probes may false-positive but at a small rate for this fill."""
    from mdio_python_spark.operators.stats import (
        BLOOM_D,
        BLOOM_M,
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(500)], "item string"
    )
    others = spark.createDataFrame(
        [(f"x{i}",) for i in range(500)], "item string"
    )
    words = bloom_build(members, "item")
    hit_m = bloom_probe(members, words, "item").collect()
    assert all(r["maybe_present"] == 1 for r in hit_m)  # no false negatives
    fp = sum(
        r["maybe_present"] for r in bloom_probe(others, words, "item").collect()
    )
    # fill ~ d*n/m = 1500/64512 -> per-bit ~0.023, fp ~ 0.023^3 ~ 1e-5;
    # allow generous slack
    assert fp <= 5, (fp, BLOOM_D, BLOOM_M)


def test_histogram_quantiles_bound_exact(spark):
    """Sketch quantile is a lower bound within bin_width of the exact
    discrete quantile, and n_rows matches."""
    from mdio_python_spark.operators.stats import (
        exact_group_quantiles,
        histogram_quantiles,
    )

    rows = [("g", (i * 37) % 1000, i) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, v long, id long")
    exact = {
        r["k"]: r for r in exact_group_quantiles(df, ["k"], "v", "id").collect()
    }
    sketch = {
        r["k"]: r
        for r in histogram_quantiles(df, ["k"], "v", bin_width=64).collect()
    }
    for k in exact:
        assert sketch[k]["n_rows"] == exact[k]["n_rows"] == 400
        for p in ("p25", "p50", "p75"):
            lb = sketch[k][f"{p}_lb"]
            ex = exact[k][p]
            assert lb <= ex < lb + 64, (p, lb, ex)


# --- round-5 batch 2: BPE + sliding-window dedup properties ------------------


def test_bpe_merge_fold_property(spark):
    """Hypothesis: for random symbol sequences and a random merge pair,
    the separator-encoded replace equals the explicit left-to-right
    pairwise fold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mdio_python_spark.operators import bpe

    sym = st.sampled_from(["a", "b", "ab", "ba", "aa", "x"])
    seqs = st.lists(sym, min_size=1, max_size=8)

    def ref_fold(syms, left, right):
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return out

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(seqs, sym, sym)
    def collect(syms, left, right):
        cases.append((syms, left, right))

    collect()
    rows = [
        (i, bpe.SEP + bpe.SEP2.join(syms) + bpe.SEP, left, right)
        for i, (syms, left, right) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, sym string, l string, r string")
    got = {
        r["i"]: list(r["out"])
        for r in df.select(
            "i",
            bpe.symbols(
                bpe.merge_expr(F.col("sym"), F.col("l"), F.col("r"))
            ).alias("out"),
        ).collect()
    }
    for i, (syms, left, right) in enumerate(cases):
        assert got[i] == ref_fold(syms, left, right), (syms, left, right)


def test_window_dup_count_property(spark):
    """For any doc: n_windows == max(0, n_tokens - 7); a doc duplicated
    verbatim makes EVERY window of both copies duplicated."""
    from mdio_python_spark.operators import dedup

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "short text only"),
         (4, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.window_dup_stats(docs, 8).collect()}
    assert rows[1]["n_windows"] == 3 and rows[1]["n_dup_windows"] == 3
    assert rows[2]["n_windows"] == 3 and rows[2]["n_dup_windows"] == 3
    assert 3 not in rows  # 3 tokens < 8
    assert rows[4]["n_windows"] == 2 and rows[4]["n_dup_windows"] == 0
