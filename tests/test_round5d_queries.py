"""Round-5d batch 9 tests: dedup-tuning + ANN-graph QC family.

Properties the oracle hash-match alone doesn't pin: containment vs
Jaccard semantics on crafted subset docs, the kNN graph against an
independent pure-Python left-fold reference, threshold-sweep
monotonicity, degree conservation, and balance/density invariants.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from mdio_python_spark.operators import dedup, similarity
from mdio_python_spark.plans.registry import queries


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def test_containment_subset_doc_scores_one(spark):
    """A doc whose shingle set is a strict subset of another's has
    containment exactly 1.0 while Jaccard = |A|/|B| < 1."""
    short = "alpha beta gamma delta epsilon"  # 3 3-shingles
    long = short + " zeta eta theta iota kappa"  # 8 3-shingles, superset
    df = _docs(spark, [(1, short), (2, long)])
    sh = dedup.shingle_hashes(df, n=3)
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    row = dedup.containment_pairs(pairs, sh).collect()[0]
    assert row.n_a == 3 and row.n_b == 8 and row.n_common == 3
    assert row.containment == 1.0
    assert row.jaccard == 3.0 / 8.0


def test_containment_never_below_jaccard(spark):
    """min(|A|,|B|) <= |A u B| => containment >= jaccard on every pair."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sh = dedup.shingle_hashes(docs, n=3)
    sig = dedup.minhash_signatures(sh, num_hashes=8)
    pairs = dedup.lsh_candidate_pairs(sig, num_hashes=8, rows_per_band=2)
    rows = dedup.containment_pairs(pairs, sh.distinct()).collect()
    assert rows, "expected candidate pairs at sf0.001"
    for r in rows:
        assert r.containment >= r.jaccard - 1e-12


# ---------------------------------------------------------------------------
# knn_graph vs an independent pure-Python left-fold reference
# ---------------------------------------------------------------------------


def _fold_dot(a, b):
    # same accumulation order as similarity.dot's left fold — bit-identical
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_knn_graph_matches_python_reference(spark):
    tbl = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pydict()
    ids = tbl["vec_id"]
    vecs = {i: v for i, v in zip(ids, tbl["embedding"])}
    norms = {i: _fold_dot(v, v) ** 0.5 for i, v in vecs.items()}
    cents = sorted(i for i in ids if i < 16)

    def cell_of(i):
        best = max(
            cents,
            key=lambda c: (
                _fold_dot(vecs[i], vecs[c]) / (norms[i] * norms[c]),
                -c,
            ),
        )
        return best

    cells: dict[int, list[int]] = {}
    for i in ids:
        cells.setdefault(cell_of(i), []).append(i)
    expected = set()
    k = 5
    for c, members in cells.items():
        capped = sorted(members)[:1024]
        for qid in members:
            scored = sorted(
                (
                    (
                        -_fold_dot(vecs[qid], vecs[cid])
                        / (norms[qid] * norms[cid]),
                        cid,
                    )
                    for cid in capped
                    if cid != qid
                ),
            )[:k]
            for rank, (_, cid) in enumerate(scored, start=1):
                expected.add((qid, cid, rank))

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = {
        (r.query_id, r.candidate_id, r.rank)
        for r in similarity.knn_graph(emb, k=k, n_centroids=16).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# declared-query invariants at SF_SMOKE
# ---------------------------------------------------------------------------


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        queries()["dedup_threshold_sweep"](spark, SF_SMOKE).collect(),
        key=lambda r: r.threshold,
    )
    assert rows and rows[0].threshold == 0.3
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pairs <= lo.n_pairs
        assert hi.n_docs_affected <= lo.n_docs_affected
        assert hi.n_docs_dropped <= lo.n_docs_dropped
    for r in rows:
        # dropped docs are the larger-id endpoints: a subset of affected
        assert r.n_docs_dropped <= r.n_docs_affected
        assert r.n_docs_affected <= 2 * r.n_pairs


def test_hubness_degree_conservation(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_vectors = emb.count()
    n_edges = similarity.knn_graph(emb, k=10, n_centroids=16).count()
    rows = queries()["knn_graph_hubness"](spark, SF_SMOKE).collect()
    assert sum(r.n_vecs for r in rows) == n_vectors
    assert sum(r.in_degree * r.n_vecs for r in rows) == n_edges


def test_cell_balance_consistency(spark):
    rows = queries()["ivf_cell_balance"](spark, SF_SMOKE).collect()
    total = sum(r.n_vecs for r in rows)
    emb_count = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    )
    assert total == emb_count
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-9
    n_cells = len(rows)
    for r in rows:
        assert abs(r.load_factor - r.n_vecs * n_cells / total) < 1e-9


def test_edge_density_bounds(spark):
    rows = queries()["cluster_edge_density"](spark, SF_SMOKE).collect()
    assert rows, "expected near-dup clusters at sf0.001"
    for r in rows:
        assert r.n_members >= 2
        assert r.n_verified_edges <= r.n_candidate_edges
        max_edges = r.n_members * (r.n_members - 1) // 2
        assert r.n_candidate_edges <= max_edges
        assert 0.0 <= r.verified_density <= 1.0


def test_hard_negatives_exclude_same_label(spark):
    rows = queries()["hard_negative_mining"](spark, SF_SMOKE).collect()
    assert rows
    per_query: dict[int, list] = {}
    for r in rows:
        assert r.query_label != r.candidate_label
        per_query.setdefault(r.query_id, []).append(r)
    for qid, rs in per_query.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        by_rank = sorted(rs, key=lambda r: r.rank)
        for a, b in zip(by_rank, by_rank[1:]):
            assert a.cosine >= b.cosine


# ---------------------------------------------------------------------------
# batch 10: corpus-health QC + tuning curves
# ---------------------------------------------------------------------------


def test_dup_inflation_conserves_docs_and_tokens(spark):
    rows = queries()["dup_inflation_curve"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.n_docs == r.n_copies * r.n_groups
        # excess = total - one kept copy's worth
        assert r.excess_tokens == r.total_tokens * (r.n_copies - 1) // r.n_copies


def test_prefix_groups_crafted_template(spark):
    from mdio_python_spark.operators import text as text_ops
    from mdio_python_spark.functions.scalars import hash64

    tmpl = "this site uses cookies to improve your experience"
    df = spark.createDataFrame(
        [
            (1, tmpl + " alpha body", "en", "web"),
            (2, tmpl + " beta body entirely different", "en", "crawl"),
            (3, "unrelated document text with other words", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    prefix = F.array_join(
        F.slice(text_ops.tokens(F.lower(F.trim(F.col("text")))), 1, 8), " "
    )
    per = df.select(hash64(prefix).alias("ph"), "source")
    grouped = (
        per.groupBy("ph")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("source").alias("s"))
        .where(F.col("n") >= 2)
        .collect()
    )
    assert len(grouped) == 1
    assert grouped[0].n == 2 and grouped[0].s == 2


def test_langid_confusion_totals(spark):
    rows = queries()["langid_confusion_matrix"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.n_zero_signal <= r.n_docs
        assert r.sum_margin >= 0


def test_fertility_at_least_one(spark):
    rows = queries()["tokenizer_fertility_by_lang"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_bpe_tokens >= r.n_words
        assert r.fertility >= 1.0


def test_norm_health_clean_and_poisoned(spark):
    # clean corpus: zero non-finite, consistent totals
    rows = queries()["embedding_norm_health"](spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert sum(r.n_vecs for r in rows) == emb.count()
    for r in rows:
        assert r.n_nonfinite == 0
        assert 0 <= r.min_norm_u <= r.max_norm_u

    # crafted poison: one NaN vector, one zero vector, one unit vector
    crafted = spark.createDataFrame(
        [
            (1, [float("nan"), 1.0], 0),
            (2, [0.0, 0.0], 0),
            (3, [1.0, 0.0], 0),
            (4, [3.0, 4.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r.label: r
        for r in similarity.norm_health(crafted).collect()
    }
    assert out[0].n_nonfinite == 1
    assert out[0].n_zero_norm == 1
    assert out[0].min_norm_u == -1  # NaN sentinel, never floor(NaN)
    assert out[0].max_norm_u == 1000000  # unit vector
    assert out[1].min_norm_u == 5000000  # 3-4-5 triangle


def test_decontamination_curve_monotone_in_n(spark):
    """A shared 13-gram implies shared 8- and 4-grams (subspans), so
    contaminated-doc counts are non-increasing in n; so are docs-with-
    any-n-gram counts (longer grams need longer docs)."""
    rows = sorted(
        queries()["decontamination_ngram_curve"](spark, SF_SMOKE).collect(),
        key=lambda r: r.ngram_n,
    )
    assert [r.ngram_n for r in rows] == [4, 8, 13]
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_contaminated_docs <= lo.n_contaminated_docs
        assert hi.n_docs <= lo.n_docs


# ---------------------------------------------------------------------------
# batch 11: embedding geometry + vocabulary statistics
# ---------------------------------------------------------------------------


def test_anisotropy_crafted_limits(spark):
    """Two identical unit vectors -> avg pairwise cosine ~ 1; two
    orthogonal unit vectors -> ~ 0 (quantization error <= ~2e-6)."""
    rows = {
        r.label: r
        for r in queries()["embedding_anisotropy"](spark, SF_SMOKE).collect()
    }
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert sum(r.n_vecs for r in rows.values()) == emb.count()
    for r in rows.values():
        assert -1.000001 <= r.avg_pairwise_cosine <= 1.000001

    import duckdb

    crafted = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [1.0, 0.0], 1),
            (4, [0.0, 2.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    crafted.createOrReplaceTempView("_aniso_crafted")
    # replicate the declared computation on the crafted rows via DuckDB
    from mdio_python_spark.plans.llm_queries import _ANISOTROPY_ORACLE

    pdf = crafted.toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)
    got = {
        int(r[0]): float(r[2])
        for r in con.execute(_ANISOTROPY_ORACLE).fetchall()
    }
    assert abs(got[0] - 1.0) < 1e-5
    assert abs(got[1] - 0.0) < 1e-5


def test_zipf_head_share_invariants(spark):
    rows = queries()["zipf_head_share"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_top100 <= r.n_tokens_total
        assert 0.0 < r.head_share <= 1.0
        if r.n_distinct_tokens <= 100:
            assert r.head_share == 1.0


def test_label_margin_crafted_separable(spark):
    crafted = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 0),  # mislabeled: sits in label 1's cone
            (4, [0.1, 0.9], 1),
            (5, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.label: r for r in similarity.label_margin(crafted).collect()}
    assert out[0].n_vecs == 3 and out[0].n_positive_margin == 2
    assert out[1].n_vecs == 2 and out[1].n_positive_margin == 2
    assert abs(out[0].margin_share - 2 / 3) < 1e-12


# ---------------------------------------------------------------------------
# batch 12: pipeline QC compositions
# ---------------------------------------------------------------------------


def test_staleness_buckets_partition_purchases(spark):
    rows = queries()["asof_staleness_buckets"](spark, SF_SMOKE).collect()
    valid = {"unmatched", "<1m", "1-10m", "10-60m", "1-24h", ">24h"}
    assert {r.staleness_bucket for r in rows} <= valid
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    from mdio_python_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    n_purchases = ev.where(F.col("event_type") == "purchase").count()
    assert sum(r.n_events for r in rows) == n_purchases


def test_packing_boundary_stats_consistent_with_pack(spark):
    from mdio_python_spark.operators.packing import pack_sequences
    from mdio_python_spark.sources.tables import load_table

    row = queries()["packing_boundary_stats"](spark, SF_SMOKE).collect()[0]
    p = pack_sequences(load_table(spark, SF_SMOKE, "documents"), 2048).collect()
    assert row.n_docs == len(p)
    assert row.n_tokens == sum(r.n_tokens for r in p)
    assert row.n_crossing_docs == sum(1 for r in p if r.n_seqs_spanned > 1)
    assert row.n_sequences == (row.n_tokens + 2047) // 2048
    assert 1 <= row.last_seq_fill <= 2048
    assert row.n_tokens == 2048 * (row.n_sequences - 1) + row.last_seq_fill


def test_leg_agreement_bounds(spark):
    row = queries()["retrieval_leg_agreement"](spark, SF_SMOKE).collect()[0]
    assert 0 <= row.n_common <= 20
    assert 0.0 <= row.jaccard_at_k <= 1.0
    assert row.sum_rank_gap >= 0
    if row.n_common == 0:
        assert row.sum_rank_gap == 0


# ---------------------------------------------------------------------------
# batch 13: split / hash / shard health audits
# ---------------------------------------------------------------------------


def test_eval_split_balance_totals(spark):
    rows = queries()["eval_split_balance"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.n_eval <= r.n_docs
    # corpus-wide share should be in a loose binomial band around 1/20
    total = sum(r.n_docs for r in rows)
    n_eval = sum(r.n_eval for r in rows)
    assert 0.02 <= n_eval / total <= 0.10


def test_simhash_bit_balance_covers_all_bits(spark):
    rows = {r.bit: r for r in queries()["simhash_bit_balance"](spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(16))
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n = docs.count()
    for r in rows.values():
        assert 0 <= r.n_set <= n
        assert abs(r.set_share - r.n_set / n) < 1e-12


def test_shard_balance_matches_manifest_shards(spark):
    rows = queries()["shard_balance_qc"](spark, SF_SMOKE).collect()
    assert {r.shard for r in rows} <= set(range(16))
    # shard assignment must agree with training_order_manifest's
    manifest = queries()["training_order_manifest"](spark, SF_SMOKE)
    m_counts = {
        r.shard: r.n for r in manifest.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    q_counts = {r.shard: r.n_docs for r in rows}
    assert q_counts == m_counts
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert abs(r.token_load_factor - r.n_tokens * 16 / total) < 1e-9


# ---------------------------------------------------------------------------
# batch 14: ANN method shootout
# ---------------------------------------------------------------------------


def test_shootout_methods_and_dominance(spark):
    rows = {r.method: r for r in queries()["ann_method_shootout"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"sign_bucket", "multiband", "rp_bucket", "ivf_nprobe4"}
    n_exact = {r.n_exact for r in rows.values()}
    assert len(n_exact) == 1  # same truth set for every method
    for r in rows.values():
        assert 0 <= r.n_hits <= r.n_exact
        assert abs(r.recall - r.n_hits / r.n_exact) < 1e-12
    # multiband's band 0 IS sign_bucket's bucketing, so its candidate set
    # is a superset and exact-top-10 members can never be displaced:
    assert rows["multiband"].n_hits >= rows["sign_bucket"].n_hits
