"""Merge a targeted re-clock into an existing stress artifact.

A stress row's per-query entries are independent measurements (each is
its own warm + best-of-2 base + best-of-2 scaled), so re-running a
subset under quiet conditions and splicing the fresh entries in is
sound — PROVIDED the splice is recorded. This tool replaces/adds the
entries from ``--fix`` into ``--into``, recomputes the superlinear list
with the same rule bench.run_stress uses (ratio > scale * 1.6), and
appends a ``reclocked`` manifest naming every spliced query so the
artifact itself discloses which entries came from the second pass.

Usage:
    python tools/merge_stress_rows.py --into BENCH_sf3_r06.json \
        --fix BENCH_sf3_fix_r06.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--into", required=True)
    ap.add_argument("--fix", required=True)
    ns = ap.parse_args()

    root = Path(__file__).resolve().parents[1]
    into_path = root / ns.into
    base = json.loads(into_path.read_text())
    fix = json.loads((root / ns.fix).read_text())
    if base["scale"] != fix["scale"]:
        raise SystemExit(
            f"scale mismatch: {base['scale']} vs {fix['scale']} — refusing"
        )

    spliced = sorted(fix["queries"])
    base["queries"].update(fix["queries"])
    # a re-clocked query that previously FAILED must not keep its stale
    # error row — the artifact would report a timing and an error for the
    # same name (advisor r6); same for errors resolved in the fix run
    for name in spliced:
        base.get("errors", {}).pop(name, None)
    if not base.get("errors"):
        base.pop("errors", None)
    scale = base["scale"]
    base["superlinear"] = sorted(
        name
        for name, row in base["queries"].items()
        if row["ratio"] > scale * 1.6
    )
    base.setdefault("reclocked", [])
    base["reclocked"] = sorted(set(base["reclocked"]) | set(spliced))
    base["reclocked_from"] = ns.fix
    into_path.write_text(json.dumps(base, indent=1))
    print(
        json.dumps(
            {
                "merged_into": ns.into,
                "n_spliced": len(spliced),
                "n_total": len(base["queries"]),
                "superlinear": base["superlinear"],
            }
        )
    )


if __name__ == "__main__":
    main()
