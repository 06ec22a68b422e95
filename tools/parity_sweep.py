"""Ad-hoc Spark-vs-DuckDB exact-parity sweep at any scale factor.

The driver's correctness gate only sees the first 50 registry entries at
sf0.01; the local pytest gate runs everything but at sf0.001. This tool is
the third leg: run any subset of declared queries at sf0.01 / sf0.1 (or a
stress dir) under the same exact-equality compare as
tests/test_oracle_parity.py, so larger-scale divergence (e.g. a 1-ulp
cross-engine cast difference that small data can't expose) surfaces
in-session. Round policy: every NEW query gets swept at sf0.01 AND sf0.1
before it ships (ROUND{N}_NOTES.md records the result).

Usage:
    python tools/parity_sweep.py --sf-dir /root/testdata/sf0.01 [names...]
    python tools/parity_sweep.py --sf-dir /root/testdata/sf0.1 --all
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or (isinstance(a, float) and math.isnan(a))) and (
            b is None or (isinstance(b, float) and math.isnan(b))
        )
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: --all)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true", dest="all_queries")
    ns = ap.parse_args()

    import duckdb

    from mdio_python_spark.plans.registry import registry
    from mdio_python_spark.session import get_spark
    from mdio_python_spark.sources.tables import TABLE_NAMES

    regs = registry()
    names = ns.names or (sorted(regs) if ns.all_queries else [])
    if not names:
        ap.error("give query names or --all")
    unknown = [n for n in names if n not in regs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark("mdio-parity-sweep")
    duck = duckdb.connect()
    for t in TABLE_NAMES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{ns.sf_dir}/{t}.parquet')"
        )

    n_pass = n_skip = 0
    failures: list[str] = []
    for name in names:
        spec = regs[name]
        t0 = time.perf_counter()
        if spec.oracle is None or spec.oracle.startswith("local:"):
            n_rows = spec.fn(spark, ns.sf_dir).count()
            print(f"  {name}: rows-only ({n_rows} rows, "
                  f"{time.perf_counter() - t0:.1f}s)")
            n_skip += 1
            spark.catalog.clearCache()
            continue
        try:
            sdf = spec.fn(spark, ns.sf_dir).toPandas()
            odf = duck.execute(spec.oracle).df()
            err = None
            if len(sdf) != len(odf):
                err = f"rows {len(sdf)} != {len(odf)}"
            elif sorted(sdf.columns) != sorted(odf.columns):
                err = f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}"
            else:
                s, o = _canon(sdf), _canon(odf)
                for col in s.columns:
                    bad = [
                        (i, x, y)
                        for i, (x, y) in enumerate(zip(s[col], o[col]))
                        if not _values_equal(x, y)
                    ]
                    if bad:
                        err = f"{col}: first mismatches {bad[:3]}"
                        break
        except Exception as exc:  # noqa: BLE001 — report and keep sweeping
            err = f"{type(exc).__name__}: {exc}"[:300]
        dt = time.perf_counter() - t0
        if err:
            failures.append(name)
            print(f"  {name}: FAIL ({dt:.1f}s) {err}")
        else:
            n_pass += 1
            print(f"  {name}: exact ({dt:.1f}s)")
        spark.catalog.clearCache()

    print(
        f"SWEEP {ns.sf_dir}: {n_pass} exact, {n_skip} rows-only, "
        f"{len(failures)} FAIL {failures if failures else ''}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
