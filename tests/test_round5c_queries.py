"""Round-5c query additions: winnowing fingerprints, source-centroid
cosine, grouped exact top-k, leakage-safe split, effective dataset size.

Exact-equality DuckDB parity for all five runs in test_oracle_parity.py;
these tests pin SEMANTICS the oracle compare can't express (the winnowing
coverage guarantee, split-straddle impossibility, numpy agreement) and
the physical-plan scale shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from mdio_python_spark.operators import text
from mdio_python_spark.operators.retrieval import grouped_topk
from mdio_python_spark.plans.registry import queries


def _plan(spark, name: str) -> str:
    df = queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


# --- winnowing_fingerprints -------------------------------------------------


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing guarantee (Schleimer et al. §3): two documents
    sharing any substring of length >= w + k - 1 (= 23 here) share at
    least one selected fingerprint, wherever the substring sits."""
    shared = "xqzjvwkpfyg xqzjvwkpfyg"  # 23 chars, unique alphabet vs filler
    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc " + shared + " dddd eeee"),
            (2, shared + " totally different trailing content here"),
            (3, "no overlap with anything else at all in this one"),
        ],
        "doc_id long, text string",
    )
    fps = text.winnow_fingerprint_set(docs, k=16, w=8).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.wmin)
    assert by_doc[1] & by_doc[2], "shared 23-char substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_density_and_short_doc_cutoff(spark):
    """Winnowing stores ~2/(w+1) of the k-gram hashes (far fewer than the
    full set) and documents shorter than w + k - 1 chars emit nothing."""
    long_text = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [(1, long_text), (2, "a short document")],  # 16 chars < 23
        "doc_id long, text string",
    )
    rows = text.winnow_fingerprints(docs, k=16, w=8).collect()
    assert [r.doc_id for r in rows] == [1]
    r = rows[0]
    assert 0 < r.n_fingerprints < r.n_kgrams / 2


def test_winnowing_plan_single_exchange(spark):
    """Round 9: the declared query runs on the Arrow md5 kernel
    (winnow_fingerprints_arrow) — the per-doc window min, distinct, and
    count/xor rollup all happen inside the map task, so the plan has NO
    hash exchange at all (only the optional round-robin source spread)."""
    plan = _plan(spark, "winnowing_fingerprints")
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "Exchange SinglePartition" not in plan, plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, plan


# --- source_centroid_cosine ---------------------------------------------------


def test_centroid_cosine_matches_numpy(spark):
    """The exact-decimal pipeline agrees with a float64 numpy centroid
    cosine to quantization precision, and stays in [-1, 1]."""
    import numpy as np
    import pandas as pd

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    j = docs.merge(emb, left_on="doc_id", right_on="vec_id")
    sums = {
        src: np.sum(np.stack(g["embedding"].to_numpy()), axis=0)
        for src, g in j.groupby("source")
    }
    out = queries()["source_centroid_cosine"](spark, SF_SMOKE).collect()
    assert out, "no pairs"
    for r in out:
        a, b = sums[r.group_a], sums[r.group_b]
        ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.centroid_cosine - ref) < 1e-3, (r, ref)
        assert -1.0 - 1e-9 <= r.centroid_cosine <= 1.0 + 1e-9
    n_src = docs["source"].nunique()
    assert len(out) == n_src * (n_src - 1) // 2


def test_centroid_cosine_plan_shape(spark):
    """One corpus-sized combinable aggregate whose |groups| x dim result
    is persisted and read from cache by every consumer (self-join sides
    + norms — without the persist the corpus posexplode runs 4x);
    everything downstream is dimension-table sized with broadcast norm
    joins — and never a cartesian (the pair join is dim-keyed)."""
    plan = _plan(spark, "source_centroid_cosine")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # (counting "Generate posexplode" occurrences would be misleading:
    # each InMemoryTableScan re-renders the cached relation's child plan,
    # so the explode TEXT appears per scan while executing only once)
    assert plan.count("InMemoryTableScan") >= 3, plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "WindowExec"):
        assert bad not in plan, plan


# --- top_ngrams_by_lang -------------------------------------------------------


def test_grouped_topk_equals_naive(spark):
    """Two-phase grouped top-k == the direct single-window form, on a
    skewed input with count ties (ties break on the tie column)."""
    from pyspark.sql import Window

    rows = [("a", f"t{i:03d}", (i * 7) % 5) for i in range(200)]
    rows += [("b", f"t{i:03d}", i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, item string, c long")
    got = {
        (r.g, r.item, r.rank)
        for r in grouped_topk(df, ["g"], "c", "item", k=7).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("item"))
    want = {
        (r.g, r.item, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 7)
        .collect()
    }
    assert got == want


def test_top_ngrams_two_phase_plan(spark):
    """Both ranking phases compile to WindowGroupLimit (top-k pushdown),
    and nothing funnels through a single partition."""
    plan = _plan(spark, "top_ngrams_by_lang")
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Exchange SinglePartition" not in plan, plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, plan


# --- leakage_safe_split / dedup_effective_tokens ------------------------------


def test_leakage_split_clusters_never_straddle(spark):
    """Every near-dup cluster lands in exactly one split — the property
    that makes the split leakage-safe — and every doc is assigned."""
    out = queries()["leakage_safe_split"](spark, SF_SMOKE)
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    import pandas as pd

    n_docs = len(pd.read_parquet(f"{SF_SMOKE}/documents.parquet"))
    rows = out.collect()
    assert len(rows) == n_docs
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_effective_tokens_bounds(spark):
    """Kept counts are bounded by totals and the ratio is the quotient of
    the two integer sums. Per-source kept counts CAN legitimately be zero
    (a source whose every doc clusters under a lower-id representative
    from another source keeps nothing), so only the corpus-wide total is
    asserted positive."""
    rows = queries()["dedup_effective_tokens"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_docs_kept <= r.n_docs
        assert 0 <= r.n_tokens_kept <= r.n_tokens
        assert r.token_keep_ratio == pytest.approx(r.n_tokens_kept / r.n_tokens)
    assert sum(r.n_docs_kept for r in rows) > 0


@pytest.mark.parametrize(
    "name", ["leakage_safe_split", "dedup_effective_tokens"]
)
def test_cluster_split_queries_plan(spark, name):
    """The CC DAG joins stay hash equi-joins; the corpus-side left join
    against the clustered subset is never a nested loop."""
    plan = _plan(spark, name)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "WindowExec"):
        assert bad not in plan, f"{name}: {bad}\n{plan}"


# --- winnowing_dup_pairs ------------------------------------------------------


def test_winnowing_pairs_catch_shared_block(spark):
    """A long block shared by two otherwise-unrelated docs must surface
    as a pair with n_shared >= 2 (each shared fingerprint certifies a
    shared region); the unrelated doc appears in no pair."""
    block = "this exact license block is repeated verbatim across files"
    docs = spark.createDataFrame(
        [
            (1, "first document header. " + block + " and a unique tail one"),
            (2, "completely different opening text. " + block + " closing"),
            (3, "nothing in common with the others whatsoever in this text"),
        ],
        "doc_id long, text string",
    )
    from mdio_python_spark.operators import dedup as dd
    from mdio_python_spark.operators import text as tx

    fps = tx.winnow_fingerprint_set(docs, k=16, w=8).select("doc_id", "wmin")
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in dd.bucket_pair_counts(fps, ["wmin"]).collect()
    }
    strong = {p for p, n in pairs.items() if n >= 2}
    assert (1, 2) in strong
    assert not any(3 in p for p in strong)


def test_winnowing_pairs_plan_no_join(spark):
    """Pair generation is in-bucket combination explode — the plan has
    no join operator at all, and nothing funnels single-partition.

    Round 9 (VERDICT r8 item 1) pins the exchange strategy: exactly TWO
    hash exchanges — the wmin bucket aggregation and the explicit
    pair-key repartition — and NO aggregation below the pair exchange
    (the map-side partial count over the ~all-distinct combo stream was
    the 30x sort-fallback wall; the count must run post-exchange only)."""
    plan = _plan(spark, "winnowing_dup_pairs")
    for bad in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "Exchange SinglePartition",
    ):
        assert bad not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    pair_ex = plan.index("Exchange hashpartitioning(doc_a")
    # the combo-side subtree below the pair exchange carries no COUNT
    # aggregate: generate -> exchange -> count once (the bucket
    # collect_list is an ObjectHashAggregate, excluded by the space)
    below = plan[pair_ex:]
    wmin_ex = below.index("Exchange hashpartitioning(wmin")
    assert " HashAggregate(" not in below[:wmin_ex], plan


# --- cluster_label_purity / quality_dup_deciles --------------------------------


def test_cluster_purity_accounting(spark):
    """Cell sizes sum to the corpus, purity is bounded by [max(1/|labels|,
    n_majority/n_members), 1], and the majority count never exceeds the
    cell size."""
    import pandas as pd

    rows = queries()["cluster_label_purity"](spark, SF_SMOKE).collect()
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert sum(r.n_members for r in rows) == len(emb)
    for r in rows:
        assert 0 < r.n_majority <= r.n_members
        assert r.purity == pytest.approx(r.n_majority / r.n_members)


def test_cluster_purity_plan_no_corpus_join(spark):
    """Assignment is a literal-centroid projection: the corpus is never
    joined or windowed for cell assignment (the only window runs on the
    |cells| x |labels| counts table, partitioned by cell)."""
    plan = _plan(spark, "cluster_label_purity")
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, plan


def test_quality_dup_deciles_accounting(spark):
    """Deciles partition the corpus (sizes differ by at most 1) and the
    dup rate is the quotient of the two integer counts."""
    import pandas as pd

    rows = queries()["quality_dup_deciles"](spark, SF_SMOKE).collect()
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    n_docs = len(pd.read_parquet(f"{SF_SMOKE}/documents.parquet"))
    sizes = [r.n_docs for r in rows]
    assert sum(sizes) == n_docs
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r.n_dup_members <= r.n_docs
        assert r.dup_rate == pytest.approx(r.n_dup_members / r.n_docs)
