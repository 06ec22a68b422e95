"""Graph operator tests: fixed-iteration PageRank vs a naive Python
reference on small crafted graphs."""

from __future__ import annotations

import pytest


def _naive_pagerank(edges, iters=3, damping=0.85):
    from collections import defaultdict

    out_deg = defaultdict(int)
    for u, _v in edges:
        out_deg[u] += 1
    ranks = {u: 1.0 for u in out_deg}
    for _ in range(iters):
        acc = defaultdict(float)
        for u, v in edges:
            acc[v] += ranks[u] / out_deg[u]
        ranks = {v: (1 - damping) + damping * s for v, s in acc.items()}
    return ranks


def test_pagerank_matches_naive_reference(spark):
    from mdio_python_spark.operators.caching import release_cached
    from mdio_python_spark.operators.graph import pagerank

    # a triangle plus a pendant: known asymmetric ranks
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, iters=3)
    got = {r["id"]: r["r"] for r in out.collect()}
    want = _naive_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    release_cached(out)
    # the hub (3) outranks the pendant (4) and the symmetric pair (1, 2)
    assert got[3] > got[1] == pytest.approx(got[2])
    assert got[4] < got[3]


def test_pagerank_mass_is_conserved_on_regular_graph(spark):
    """On a k-regular graph every node keeps rank exactly 1.0 at every
    iteration (sum of 1/k over k neighbors is 1)."""
    from mdio_python_spark.operators.caching import release_cached
    from mdio_python_spark.operators.graph import pagerank

    n = 6  # ring: every node has degree 2
    und = [(i, (i + 1) % n) for i in range(n)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, iters=4)
    got = {r["id"]: r["r"] for r in out.collect()}
    release_cached(out)
    assert set(got) == set(range(n))
    for v in got.values():
        assert v == pytest.approx(1.0, rel=1e-12)
