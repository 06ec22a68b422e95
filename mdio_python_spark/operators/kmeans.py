"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The iterative-algorithm pattern on Spark: centroids are tiny (k x dim
doubles) so they live on the driver and enter each iteration as plan
literals; the corpus-sized work per iteration is one projection
(assignment argmax against k literal centroids — no join, no shuffle) and
one map-side-combinable groupBy for the per-dimension means. Nothing
corpus-sized is ever collected; ``iters`` driver round-trips of k*dim
floats is the entire coordination cost, which is how k-means on a
1000-executor cluster actually runs.

Cosine-similarity assignment (argmax cos, ties to the lowest centroid id)
matches the IVF cell assignment in ``operators/similarity.py`` — and the
same DuckDB QUALIFY/row_number oracle form, so a single Lloyd step is
fully oracle-verifiable. Per-dim means go through the exact-decimal sum
(``functions/determinism``) to stay bit-identical across engines.

Trains the centroids ``similarity.ivf_topk`` consumes (its docstring's
"fit on a sample and broadcast" path, minus the sampling at test scale).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mdio_python_spark.functions.determinism import dsum
from mdio_python_spark.operators.similarity import (
    _q,
    _sql_dbl,
    _sql_dot,
    _sql_l2sq,
    _sql_norm,
    _sql_vec,
)


def _cent_norm(vec: Sequence[float]) -> float:
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def assign_clusters(
    vectors: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Add a ``cluster`` column: argmax cosine (or argmin squared-L2 with
    ``metric="l2"`` — the PQ-codebook convention) against the literal
    centroids, ties to the lowest centroid id. Pure projection — the
    corpus is not shuffled, joined, or collected. The literal-centroid
    struct array builds as ONE F.expr (similarity._sql_dot/_sql_l2sq:
    same operations, same fold order, bit-identical values — the Column
    API spelling cost ~1.4 s of py4j plan construction per call, which
    at fit-query scale was the entire measured cost)."""
    v = _q(vec_col)
    if metric == "cosine":
        parts = [
            "named_struct('cos', ({d}) / (({n}) * {cn}), "
            "'ncid', CAST({ncid} AS BIGINT))".format(
                d=_sql_dot(v, _sql_vec(cvec)),
                n=_sql_norm(v),
                cn=_sql_dbl(_cent_norm(cvec)),
                ncid=-cid,
            )
            for cid, cvec in centroids
        ]
        cluster = -F.array_max(F.expr("array(" + ",".join(parts) + ")"))["ncid"]
    elif metric == "l2":
        parts = [
            "named_struct('d', {d}, 'cid', CAST({cid} AS BIGINT))".format(
                d=_sql_l2sq(v, _sql_vec(cvec)), cid=cid
            )
            for cid, cvec in centroids
        ]
        cluster = F.array_min(F.expr("array(" + ",".join(parts) + ")"))["cid"]
    else:
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    return vectors.select(id_col, vec_col, cluster.alias("cluster"))


def lloyd_step(
    vectors: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """One Lloyd refinement: assign, then per-(cluster, dim) exact mean.

    Returns the long-format ``(cluster, dim, n_members, centroid)`` table
    (k x dim rows — tiny); empty clusters simply have no rows. Long
    format keeps the declared-query output free of array columns and the
    groupBy map-side combinable."""
    assigned = assign_clusters(vectors, centroids, id_col, vec_col, metric)
    exploded = assigned.select(
        "cluster", F.posexplode(vec_col).alias("dim", "val")
    )
    return exploded.groupBy("cluster", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        (
            dsum(F.col("val").cast("double"), 8)
            / F.count(F.lit(1)).cast("double")
        ).alias("centroid"),
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> list[tuple[int, list[float]]]:
    """Fit k centroids with ``iters`` Lloyd iterations.

    Deterministic init: the k LOWEST-id vectors present (on an unfiltered
    table with ids 0..n that is ids 0..k-1 — the same convention as
    ``ivf_topk``'s stand-in centroids, now actually refined; on a sampled
    table it is the sample's k lowest survivors). Centroid ids are
    renumbered 0..k-1 in init order. A cluster that loses every member
    keeps its previous centroid. Collects only k x dim floats per
    iteration."""
    init = (
        vectors.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k).collect()
    )
    if len(init) < k:
        raise ValueError(f"need >= {k} vectors to init k-means, got {len(init)}")
    cents = [
        (cid, [float(x) for x in r[1]]) for cid, r in enumerate(init)
    ]
    for _ in range(iters):
        rows = lloyd_step(vectors, cents, id_col, vec_col, metric).collect()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["dim"])] = float(
                r["centroid"]
            )
        cents = [
            (
                cid,
                [new[d] for d in sorted(new)] if (new := by_cluster.get(cid)) else old,
            )
            for cid, old in cents
        ]
    return cents
