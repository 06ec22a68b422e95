"""Persisted model artifacts for the fit-once / serve-many ANN path.

At 100 TB nobody refits an ANN index inside every query: the IVF
centroids and PQ codebooks are trained once (on a sample) and persisted
as a tiny model artifact that every serving query — and every serving
*engine* — reads. This module is that artifact layer:

- **Long-format parquet**, one value per row (``centroid_id, dim,
  value`` / ``subspace, code, dim, value``), written as a SINGLE file via
  pyarrow so DuckDB's ``read_parquet('<path>')`` and Spark both read it
  directly. Long format keeps the artifact free of array columns, so the
  DuckDB oracle reconstructs vectors with ``list(value ORDER BY dim)``
  and the cross-engine value hash covers the model itself.
- **Values are exact doubles** end-to-end: the Lloyd fit produces Python
  doubles (exact-decimal means, ``operators/kmeans.py``), parquet stores
  them bit-exact, and both engines fold them identically — so a serving
  query is bit-equal across Spark and DuckDB even though the *fit* is
  not SQL-expressible.
- The canonical artifacts under ``artifacts/models/`` are committed,
  fitted from the sf0.01 embeddings by ``tools/fit_models.py`` — the
  "model registry" a production deployment would keep in object storage.
  Serving queries read the canonical model regardless of the corpus SF
  they serve (that is the point of fit-once/serve-many); the registered
  ``*_model_fit`` queries in ``plans/model_queries.py`` time the
  training leg separately.

Mirrors the reference's persisted-artifact pattern for access-pattern
copies (reference ``src/mdio/optimize/access_pattern.py:26-118``: derive
once, persist alongside the store, serve many reads).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

MODELS_DIR = Path(__file__).resolve().parents[2] / "artifacts" / "models"
IVF_CENTROIDS_PATH = MODELS_DIR / "ivf_centroids.parquet"
PQ_CODEBOOKS_PATH = MODELS_DIR / "pq_codebooks.parquet"

# Canonical training hyperparameters (recorded here so the fit tool, the
# registered fit queries, and the serving oracles can never drift):
# 16 coarse cells to match the ANN family's n_centroids=16 convention,
# 8 codes x 4 subspaces over the 64-dim embeddings, 2 Lloyd iterations
# on a deterministic half-sample (hash_sample mod 2).
IVF_N_CENTROIDS = 16
IVF_ITERS = 2
PQ_N_CODES = 8
PQ_N_SUBSPACES = 4
PQ_ITERS = 2
SAMPLE_MOD = 2


def centroids_to_rows(
    cents: list[tuple[int, list[float]]],
) -> list[tuple[int, int, float]]:
    """Flatten fitted centroids to sorted long-format rows."""
    return [
        (int(cid), d, float(v))
        for cid, vec in sorted(cents)
        for d, v in enumerate(vec)
    ]


def write_ivf_artifact(
    cents: list[tuple[int, list[float]]], path: Path | str = IVF_CENTROIDS_PATH
) -> Path:
    """Persist centroids as one sorted single-file parquet (k x dim rows)."""
    rows = centroids_to_rows(cents)
    table = pa.table(
        {
            "centroid_id": pa.array([r[0] for r in rows], pa.int64()),
            "dim": pa.array([r[1] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, path)
    return path


def load_ivf_centroids(
    path: Path | str = IVF_CENTROIDS_PATH,
) -> list[tuple[int, list[float]]]:
    """Read a centroid artifact back into ``ivf_topk(centroids=)`` form.

    Driver-side pyarrow read of k x dim doubles — a plan constant of the
    same class as the geometry literals, NOT distributed work (serving
    queries therefore do not set ``QuerySpec.eager``)."""
    t = pq.read_table(path)
    by_cid: dict[int, dict[int, float]] = {}
    for cid, d, v in zip(
        t["centroid_id"].to_pylist(), t["dim"].to_pylist(), t["value"].to_pylist()
    ):
        by_cid.setdefault(int(cid), {})[int(d)] = float(v)
    return [
        (cid, [dims[d] for d in sorted(dims)]) for cid, dims in sorted(by_cid.items())
    ]


def codebooks_to_rows(
    books: list[list[list[float]]],
) -> list[tuple[int, int, int, float]]:
    return [
        (m, k, d, float(v))
        for m, cb in enumerate(books)
        for k, cw in enumerate(cb)
        for d, v in enumerate(cw)
    ]


def write_pq_artifact(
    books: list[list[list[float]]], path: Path | str = PQ_CODEBOOKS_PATH
) -> Path:
    """Persist PQ codebooks as one sorted single-file parquet
    (M x K x sub_dim rows)."""
    rows = codebooks_to_rows(books)
    table = pa.table(
        {
            "subspace": pa.array([r[0] for r in rows], pa.int64()),
            "code": pa.array([r[1] for r in rows], pa.int64()),
            "dim": pa.array([r[2] for r in rows], pa.int64()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, path)
    return path


def load_pq_codebooks(
    path: Path | str = PQ_CODEBOOKS_PATH,
) -> tuple[list[list[list[float]]], int]:
    """Read a codebook artifact into ``pq_encode``/``ivfpq_topk`` form:
    (codebooks[m][k] -> subvector, sub_dim)."""
    t = pq.read_table(path)
    tree: dict[int, dict[int, dict[int, float]]] = {}
    for m, k, d, v in zip(
        t["subspace"].to_pylist(),
        t["code"].to_pylist(),
        t["dim"].to_pylist(),
        t["value"].to_pylist(),
    ):
        tree.setdefault(int(m), {}).setdefault(int(k), {})[int(d)] = float(v)
    books = [
        [[tree[m][k][d] for d in sorted(tree[m][k])] for k in sorted(tree[m])]
        for m in sorted(tree)
    ]
    sub = len(books[0][0])
    return books, sub


def fit_and_save_ivf(
    embeddings, path: Path | str = IVF_CENTROIDS_PATH
) -> list[tuple[int, list[float]]]:
    """Train the canonical IVF model (sampled cosine Lloyd) and persist it."""
    from mdio_python_spark.operators.similarity import ivf_fit_centroids

    cents = ivf_fit_centroids(
        embeddings,
        n_centroids=IVF_N_CENTROIDS,
        iters=IVF_ITERS,
        sample_mod=SAMPLE_MOD,
    )
    write_ivf_artifact(cents, path)
    return cents


def fit_and_save_pq(
    embeddings, path: Path | str = PQ_CODEBOOKS_PATH
) -> tuple[list[list[list[float]]], int]:
    """Train the canonical PQ model (per-subspace L2 Lloyd) and persist it."""
    from mdio_python_spark.operators.similarity import fit_pq_codebooks

    books, sub = fit_pq_codebooks(
        embeddings,
        n_subspaces=PQ_N_SUBSPACES,
        n_codes=PQ_N_CODES,
        iters=PQ_ITERS,
        sample_mod=SAMPLE_MOD,
    )
    write_pq_artifact(books, path)
    return books, sub
