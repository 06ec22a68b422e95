"""Degenerate-input gates for int8_quant_clip_sweep (advisor r7): an
empty embeddings table used to raise KeyError at build time (n=0 makes
every rank target 0, so distributed_ordinal yields no matching row),
and an all-zero corpus exercises the s > 0 short-circuit. Both must
return an EMPTY result with the declared output schema — matching the
oracle, whose thr CTE matches no rank / fails WHERE s > 0.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EXPECTED_COLS = [
    "method",
    "quant_scale",
    "n_elements",
    "n_clipped",
    "clip_rate",
    "mse",
]


def _write_embeddings(tmp_path, rows):
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize(
    "rows",
    [
        [],
        [{"vec_id": i, "embedding": [0.0] * 8, "label": 0} for i in range(4)],
    ],
    ids=["empty_table", "all_zero_corpus"],
)
def test_clip_sweep_degenerate_inputs(spark, tmp_path, rows):
    from mdio_python_spark.plans.registry import registry

    sf_dir = _write_embeddings(tmp_path, rows)
    out = registry()["int8_quant_clip_sweep"].fn(spark, sf_dir)
    assert out.columns == EXPECTED_COLS
    assert out.count() == 0
