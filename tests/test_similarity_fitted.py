"""Exact local gates for the fitted (production-training-path) ANN
queries: ``embedding_ivf_fitted`` and ``embedding_pq_fitted``.

The iterative k-means fit is not SQL-expressible, so these queries are
gated here instead of DuckDB: a pure-Python mirror reproduces the ENTIRE
pipeline — sampled Lloyd fit (cosine for IVF, squared-L2 for PQ, with the
same left-fold arithmetic and exact-decimal mean semantics as the Spark
plans), probe/assign, and ranking — and the full query output must match
bit-for-bit.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from mdio_python_spark.operators.similarity import hash_sample
from mdio_python_spark.plans.registry import registry
from mdio_python_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# --- pure-Python mirrors of the plan arithmetic -----------------------------


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _norm(a) -> float:
    return math.sqrt(_dot(a, a))


def _l2sq(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (float(x) - float(y)) * (float(x) - float(y))
    return acc


def _dmean(values, scale=8) -> float:
    """Mirror of lloyd_step's dsum(val, 8)/count exact-decimal mean."""
    q = Decimal(1).scaleb(-scale)
    total = sum(
        Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP) for v in values
    )
    return float(total) / float(len(values))


def _py_kmeans(sample: dict[int, list], k: int, iters: int, metric: str):
    """Mirror of kmeans_fit: k lowest-id init (renumbered 0..k-1), Lloyd
    iterations with cosine-argmax / l2-argmin assignment (ties -> lowest
    cid) and exact-decimal per-dim means; empty clusters keep centroids."""
    ids = sorted(sample)
    cents = [[float(x) for x in sample[i]] for i in ids[:k]]
    for _ in range(iters):
        members: dict[int, list] = {c: [] for c in range(k)}
        for i in ids:
            vec = sample[i]
            if metric == "cosine":
                vn = _norm(vec)
                best = max(
                    range(k),
                    key=lambda c: (_dot(vec, cents[c]) / (vn * _norm(cents[c])), -c),
                )
            else:
                best = min(range(k), key=lambda c: (_l2sq(vec, cents[c]), c))
            members[best].append(vec)
        for c in range(k):
            if members[c]:
                dim = len(members[c][0])
                cents[c] = [
                    _dmean([v[d] for v in members[c]]) for d in range(dim)
                ]
    return cents


def _load(spark):
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    return {int(r.vec_id): list(r.embedding) for r in rows}


def test_ivf_fitted_query_exact(spark):
    out = registry()["embedding_ivf_fitted"].fn(spark, SF).toPandas()
    vecs = _load(spark)
    emb = load_table(spark, SF, "embeddings")
    sampled = sorted(
        int(r.vec_id) for r in hash_sample(emb, 2).select("vec_id").collect()
    )
    cents = _py_kmeans({i: vecs[i] for i in sampled}, k=8, iters=2, metric="cosine")

    def cell_of(vec):
        vn = _norm(vec)
        scored = [
            (_dot(vec, c) / (vn * _norm_lit(c)), -cid) for cid, c in enumerate(cents)
        ]
        return -max(scored)[1]

    def _norm_lit(c):
        # ivf_topk folds centroid norms driver-side (_lfold_norm) — same fold
        acc = 0.0
        for x in c:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    cand_cell = {i: cell_of(v) for i, v in vecs.items()}
    expect = []
    for qid in (i for i in sorted(vecs) if i < 50):
        qv = vecs[qid]
        qn = _norm(qv)
        probes = sorted(
            ((_dot(qv, c) / (qn * _norm_lit(c)), -cid) for cid, c in enumerate(cents)),
            reverse=True,
        )[:3]
        cells = {-p[1] for p in probes}
        scored = [
            (
                cid,
                cell,
                _dot(qv, vecs[cid]) / (qn * _norm(vecs[cid])),
            )
            for cid, cell in cand_cell.items()
            if cell in cells and cid != qid
        ]
        scored.sort(key=lambda t: (-t[2], t[0]))
        for rank, (cid, cell, cos) in enumerate(scored[:3], start=1):
            expect.append((qid, cid, cell, cos, rank))

    got = sorted(
        map(tuple, out[["query_id", "candidate_id", "cell", "cosine", "rank"]].values)
    )
    want = sorted(expect)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (int(g[0]), int(g[1]), int(g[2]), int(g[4])) == (
            w[0], w[1], w[2], w[4],
        ), (g, w)
        assert float(g[3]) == w[3], (g, w)  # bitwise double equality


def test_pq_fitted_query_exact(spark):
    out = registry()["embedding_pq_fitted"].fn(spark, SF).toPandas()
    vecs = _load(spark)
    emb = load_table(spark, SF, "embeddings")
    sampled = sorted(
        int(r.vec_id) for r in hash_sample(emb, 2).select("vec_id").collect()
    )
    m_sub, n_codes, sub = 4, 8, 16
    books = []
    for m in range(m_sub):
        sliced = {i: vecs[i][m * sub : (m + 1) * sub] for i in sampled}
        books.append(_py_kmeans(sliced, k=n_codes, iters=2, metric="l2"))
    q_vec = [x for m in range(m_sub) for x in books[m][0]]

    by_id = out.set_index("vec_id")
    assert sorted(by_id.index) == sorted(vecs)
    for i, vec in vecs.items():
        codes = []
        for m in range(m_sub):
            sv = vec[m * sub : (m + 1) * sub]
            codes.append(min(range(n_codes), key=lambda k: (_l2sq(sv, books[m][k]), k)))
        adc = None
        for m in range(m_sub):
            q_sub = q_vec[m * sub : (m + 1) * sub]
            term = _l2sq(q_sub, books[m][codes[m]])
            adc = term if adc is None else adc + term
        row = by_id.loc[i]
        assert [int(row[f"code_{m}"]) for m in range(m_sub)] == codes, i
        assert float(row.adc_dist) == adc, i
