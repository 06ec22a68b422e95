"""Scale-stress dataset builder: derive an N-times-larger copy of a
driver-generated SF directory to catch nonlinear blowups (LSH bucket
fan-out, band-join growth, exchange reuse) that the base SF can't show.

The replication is semantics-preserving at scale, not a byte copy:

- **Keys are offset** per replica (stride 10^10) consistently across
  joined tables (orderkey in lineitem+orders, custkey in orders+customer,
  part/supp keys, doc/vec/event/user ids), so joins match within a
  replica and key cardinality grows with the data — the same way a
  bigger crawl has more users/orders, not deeper history per key.
- **Document text is de-duplicated across replicas**: every 3rd word
  gets a replica suffix, which breaks 100% of the 3-gram shingles the
  dedup operators key on (any 3 consecutive words contain an index
  ≡ 0 mod 3) while leaving 2/3 of words — and hence stopword/quality
  stats — intact. Without this, each base document's replicas form a
  near-dup clique and LSH pair output grows quadratically in the scale
  factor: a property of the synthetic data, not of the plans under test.
- **Embeddings are nudged** (+k·1e-3 per component) so replicas aren't
  bit-identical vectors; ANN/near-dup outputs stay ~linear.
- Dimension tables (nation, region) are NOT replicated — at any scale
  they are fixed-size dims, and replicating them would break
  nationkey-based joins.

The small-dim invariance also keeps every broadcast join a broadcast
join at the scaled size, which is exactly the 100-TB shape.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mdio_python_spark.sources.tables import TABLE_NAMES, load_table

KEY_STRIDE = 10_000_000_000

# table -> int64 id columns offset by replica * KEY_STRIDE
_OFFSET_COLS: dict[str, tuple[str, ...]] = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
}
_DIM_TABLES = ("nation", "region")


def _replica(df: DataFrame, table: str, k: int) -> DataFrame:
    if k == 0:
        return df
    out = df
    for c in _OFFSET_COLS.get(table, ()):
        out = out.withColumn(c, F.col(c) + F.lit(k * KEY_STRIDE))
    if table == "documents":
        tag = F.lit(f"x{k}")
        words = F.split(F.col("text"), " ")
        out = out.withColumn(
            "text",
            F.array_join(
                F.zip_with(
                    words,
                    F.sequence(F.lit(0), F.size(words) - 1),
                    lambda w, i: F.when(i % 3 == 0, F.concat(w, tag)).otherwise(w),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text"))
    if table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x: (x + F.lit(k * 1e-3)).cast("float")
            ),
        )
    return out


def build_scaled_dir(
    spark: SparkSession, base_sf_dir: str, out_dir: str, scale: int
) -> str:
    """Materialize ``scale`` offset replicas of every fact table (dims
    copied once) under ``out_dir``; idempotent via a marker file keyed on
    (base dir, scale)."""
    if scale < 1:
        raise ValueError("scale must be >= 1")
    out = Path(out_dir)
    marker = out / "_STRESS_MARKER.json"
    want = {"base": str(base_sf_dir), "scale": scale, "tables": list(TABLE_NAMES)}
    if marker.exists() and json.loads(marker.read_text()) == want:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    for table in TABLE_NAMES:
        base = load_table(spark, base_sf_dir, table)
        if table in _DIM_TABLES:
            scaled = base
        else:
            scaled = _replica(base, table, 0)
            for k in range(1, scale):
                scaled = scaled.unionByName(_replica(base, table, k))
        # one file per ~input partition is fine: the scaled dir is read
        # through the same loader, and maxPartitionBytes re-splits anyway
        scaled.write.mode("overwrite").parquet(str(out / f"{table}.parquet"))
    marker.write_text(json.dumps(want))
    return str(out)
