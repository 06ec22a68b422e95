"""Build the canonical committed ANN model artifacts (fit-once leg).

Trains the IVF centroids and PQ codebooks on the sf0.01 embeddings table
with the canonical hyperparameters in ``operators/model_store.py`` and
writes them to ``artifacts/models/*.parquet`` — the committed "model
registry" every serving query (Spark) and serving oracle (DuckDB
``read_parquet``) reads. Run once per model revision; serving queries
stay bit-stable until this is re-run.

    python tools/fit_models.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mdio_python_spark.operators import model_store  # noqa: E402
from mdio_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ns = ap.parse_args()

    spark = get_spark("mdio-fit-models")
    emb = spark.read.parquet(f"{ns.sf_dir}/embeddings.parquet")

    cents = model_store.fit_and_save_ivf(emb)
    books, sub = model_store.fit_and_save_pq(emb)
    print(
        f"ivf: {len(cents)} centroids x {len(cents[0][1])} dims -> "
        f"{model_store.IVF_CENTROIDS_PATH}"
    )
    print(
        f"pq: {len(books)} subspaces x {len(books[0])} codes x {sub} dims -> "
        f"{model_store.PQ_CODEBOOKS_PATH}"
    )
    # verify exact roundtrip before anything downstream trusts the files
    assert model_store.load_ivf_centroids() == [
        (cid, [float(x) for x in v]) for cid, v in sorted(cents)
    ]
    rb, rsub = model_store.load_pq_codebooks()
    assert rb == books and rsub == sub
    print("roundtrip exact: ok")
    spark.stop()


if __name__ == "__main__":
    main()
