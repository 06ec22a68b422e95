"""Mirror of the driver's correctness gate: run every declared query on
Spark AND its DuckDB oracle, compare row count + schema + exact values
(order-insensitive, columns sorted by name) — the same discipline as
CORRECTNESS_r{N}.json, but exact-equality so failures surface locally first.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE, register_duck_views

from mdio_python_spark.plans.registry import registry


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or (isinstance(a, float) and math.isnan(a))) and (
            b is None or (isinstance(b, float) and math.isnan(b))
        )
    # Int-vs-float is a REAL mismatch for the driver's value hash (DuckDB
    # HUGEINT arrives as float64 while Spark yields int64) — never coerce.
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


QUERY_NAMES = sorted(registry())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    spec = registry()[name]
    sdf = spec.fn(spark, SF_SMOKE).toPandas()
    if spec.oracle is None or spec.oracle.startswith("local:"):
        # Non-SQL surface: the exact-equality gate lives in the local test
        # named by the "local:" marker; here mirror the driver's rows-only.
        assert len(sdf) >= 0
        return
    register_duck_views(duck, SF_SMOKE)
    odf = duck.execute(spec.oracle).df()

    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != oracle {sorted(odf.columns)}"
    )

    s, o = _canon(sdf), _canon(odf)
    for col in s.columns:
        sk, ok = s[col].dtype.kind, o[col].dtype.kind
        # Integer-kind vs float-kind mismatches hash-fail in the driver.
        assert not ({sk, ok} & {"f"} and {sk, ok} & {"i", "u"}), (
            f"{name}.{col}: dtype kind {sk} vs oracle {ok} "
            "(int/float mismatch would hash-fail in the driver)"
        )
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"
