"""Exact local gates for the fit-once/serve-many model layer.

The Lloyd fit is not SQL-expressible, so the registered fit queries
(`ivf_model_fit` / `pq_model_fit`) are gated here: a pure-Python mirror
reproduces the sampled fit bit-for-bit (same left-fold arithmetic and
exact-decimal means as the Spark plans), the query's long-format output
must match it exactly, and the artifact the query persisted must load
back to the identical model. A further gate pins the COMMITTED canonical
artifacts to the code + sf0.01 data that produced them, so a silent
drift of either fails loudly (model-versioning discipline: re-run
tools/fit_models.py deliberately, never implicitly).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

from mdio_python_spark.operators import model_store
from mdio_python_spark.operators.similarity import hash_sample
from mdio_python_spark.plans.registry import registry
from mdio_python_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
SF_CANON = "/root/testdata/sf0.01"


# --- pure-Python mirror of the plan arithmetic (kmeans_fit twin) ------------


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


def _sampled_vecs(spark, sf) -> dict[int, list]:
    emb = load_table(spark, sf, "embeddings")
    rows = (
        hash_sample(emb, model_store.SAMPLE_MOD)
        .select("vec_id", "embedding")
        .collect()
    )
    return {int(r.vec_id): list(r.embedding) for r in rows}


def test_artifact_roundtrip_exact(tmp_path: Path):
    cents = [(0, [1.5, -2.25, 0.0]), (1, [3.0625, 4.0, -0.5])]
    p = model_store.write_ivf_artifact(cents, tmp_path / "ivf.parquet")
    assert model_store.load_ivf_centroids(p) == cents

    books = [
        [[1.0, 2.0], [3.0, 4.0], [5.5, -6.5]],
        [[0.25, 0.75], [9.0, -9.0], [2.0, 2.0]],
    ]
    p2 = model_store.write_pq_artifact(books, tmp_path / "pq.parquet")
    rb, sub = model_store.load_pq_codebooks(p2)
    assert rb == books and sub == 2


def test_ivf_fit_matches_inline_fit(spark):
    """`ivf_model_fit` output == pure-Python sampled-Lloyd mirror, and
    the artifact it persisted loads back to the identical model."""
    out = registry()["ivf_model_fit"].fn(spark, SF).toPandas()
    sample = _sampled_vecs(spark, SF)
    cents = _py_kmeans(
        sample, k=model_store.IVF_N_CENTROIDS, iters=model_store.IVF_ITERS,
        metric="cosine",
    )
    want = model_store.centroids_to_rows(list(enumerate(cents)))
    got = sorted(
        (int(r.centroid_id), int(r.dim), float(r.value))
        for r in out.itertuples()
    )
    assert got == sorted(want)  # bitwise double equality

    art = Path("/tmp/mdio_models") / Path(SF).name / "ivf_centroids.parquet"
    assert model_store.load_ivf_centroids(art) == [
        (cid, vec) for cid, vec in enumerate(cents)
    ]


def test_pq_fit_matches_inline_fit(spark):
    """`pq_model_fit` output == per-subspace L2 Lloyd mirror + artifact
    roundtrip."""
    out = registry()["pq_model_fit"].fn(spark, SF).toPandas()
    sample = _sampled_vecs(spark, SF)
    dim = len(next(iter(sample.values())))
    sub = dim // model_store.PQ_N_SUBSPACES
    books = []
    for m in range(model_store.PQ_N_SUBSPACES):
        sliced = {i: v[m * sub : (m + 1) * sub] for i, v in sample.items()}
        books.append(
            _py_kmeans(
                sliced, k=model_store.PQ_N_CODES, iters=model_store.PQ_ITERS,
                metric="l2",
            )
        )
    want = model_store.codebooks_to_rows(books)
    got = sorted(
        (int(r.subspace), int(r.code), int(r.dim), float(r.value))
        for r in out.itertuples()
    )
    assert got == sorted(want)  # bitwise double equality

    art = Path("/tmp/mdio_models") / Path(SF).name / "pq_codebooks.parquet"
    rb, rsub = model_store.load_pq_codebooks(art)
    assert rb == books and rsub == sub


def test_canonical_artifacts_pinned_to_code_and_data(spark):
    """The COMMITTED artifacts are exactly what the current fit code
    produces from sf0.01 — catches silent drift of either side; re-run
    tools/fit_models.py (deliberate model revision) when this fails."""
    emb = load_table(spark, SF_CANON, "embeddings")
    from mdio_python_spark.operators.similarity import (
        fit_pq_codebooks,
        ivf_fit_centroids,
    )

    cents = ivf_fit_centroids(
        emb,
        n_centroids=model_store.IVF_N_CENTROIDS,
        iters=model_store.IVF_ITERS,
        sample_mod=model_store.SAMPLE_MOD,
    )
    assert model_store.load_ivf_centroids() == [
        (int(c), [float(x) for x in v]) for c, v in sorted(cents)
    ]
    books, sub = fit_pq_codebooks(
        emb,
        n_subspaces=model_store.PQ_N_SUBSPACES,
        n_codes=model_store.PQ_N_CODES,
        iters=model_store.PQ_ITERS,
        sample_mod=model_store.SAMPLE_MOD,
    )
    rb, rsub = model_store.load_pq_codebooks()
    assert rb == books and rsub == sub
