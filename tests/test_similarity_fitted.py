"""Exact local gates for the fitted-ANN SERVING queries
(``embedding_ivf_fitted`` / ``embedding_pq_fitted``) — now the
fit-once/serve-many path: serving reads the committed canonical model
artifact (``operators/model_store``), so these mirrors load the SAME
artifact and reproduce the entire serving pipeline in pure Python —
probe/assign, encode, ADC, ranking — with the identical left-fold
arithmetic; outputs must match bit-for-bit.

(The fit leg's exact gates live in tests/test_model_store.py; these
serving queries are additionally DuckDB-oracle-paired, the oracle
reading the artifact via read_parquet.)
"""

from __future__ import annotations

import math

from mdio_python_spark.operators.model_store import (
    load_ivf_centroids,
    load_pq_codebooks,
)
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


def _load(spark):
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    return {int(r.vec_id): list(r.embedding) for r in rows}


def test_ivf_fitted_query_exact(spark):
    out = registry()["embedding_ivf_fitted"].fn(spark, SF).toPandas()
    vecs = _load(spark)
    cents = load_ivf_centroids()  # the committed canonical model

    def _norm_lit(c):
        # ivf_topk folds centroid norms driver-side (_lfold_norm) — same fold
        acc = 0.0
        for x in c:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    def cell_of(vec):
        vn = _norm(vec)
        scored = [
            (_dot(vec, c) / (vn * _norm_lit(c)), -cid) for cid, c in cents
        ]
        return -max(scored)[1]

    cand_cell = {i: cell_of(v) for i, v in vecs.items()}
    expect = []
    for qid in (i for i in sorted(vecs) if i < 50):
        qv = vecs[qid]
        qn = _norm(qv)
        probes = sorted(
            ((_dot(qv, c) / (qn * _norm_lit(c)), -cid) for cid, c in cents),
            reverse=True,
        )[:4]
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
    books, sub = load_pq_codebooks()  # the committed canonical model
    m_sub = len(books)
    n_codes = len(books[0])
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
