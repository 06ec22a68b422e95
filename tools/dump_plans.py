"""Dump ``.explain("formatted")`` for declared queries to files.

Round deliverable: ``plans/r{N}/<query>_{before,after}.txt`` — the judge
checks plan claims (Exchange counts, join strategies, MapInArrow nodes)
against these dumps without running Spark. "before" dumps come from a
git worktree of the previous round's final tree, "after" from HEAD; this
tool makes both mechanical:

    python tools/dump_plans.py --out plans/r10 --suffix after q1 q2 ...
    (cd /tmp/r9tree && python /root/repo/tools/dump_plans.py \
        --out /root/repo/plans/r10 --suffix before q1 q2 ...)

The repo root the queries are imported from is the CWD, so running it
from a worktree dumps that tree's plans.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.getcwd())

from mdio_python_spark.plans.registry import registry  # noqa: E402
from mdio_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--suffix", default="after", choices=["before", "after"])
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()

    out_dir = Path(ns.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("mdio-plan-dump")
    regs = registry()
    for name in ns.names:
        if name not in regs:
            print(f"{name}: not in registry", file=sys.stderr)
            continue
        df = regs[name].fn(spark, ns.sf_dir)
        # DataFrame.explain prints to stdout; capture via the internal
        # string API instead
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{ns.suffix}.txt"
        path.write_text(text)
        print(f"wrote {path} ({text.count('Exchange')} Exchange refs)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
