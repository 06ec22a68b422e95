"""k-means operator tests: assignment semantics, convergence vs an
independent numpy Lloyd implementation, empty-cluster retention."""

from __future__ import annotations

import numpy as np

from mdio_python_spark.operators.kmeans import assign_clusters, kmeans_fit


def _vecs_df(spark, arr):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(arr)],
        "vec_id long, embedding array<double>",
    )


def _numpy_lloyd(arr, k, iters):
    """Reference: cosine argmax (ties -> lowest cid), mean recompute."""
    cents = arr[:k].astype(np.float64).copy()
    for _ in range(iters):
        sims = (arr @ cents.T) / (
            np.linalg.norm(arr, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
        )
        assign = np.argmax(sims, axis=1)  # argmax takes first (lowest) on ties
        for c in range(k):
            members = arr[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents, assign


def test_assignment_matches_numpy(spark):
    rng = np.random.default_rng(7)
    arr = rng.standard_normal((120, 8))
    df = _vecs_df(spark, arr)
    cents = [(i, [float(x) for x in arr[i]]) for i in range(4)]
    got = {
        r.vec_id: r.cluster for r in assign_clusters(df, cents).collect()
    }
    _, expect = _numpy_lloyd(arr, 4, 1)
    sims = (arr @ arr[:4].T) / (
        np.linalg.norm(arr, axis=1)[:, None] * np.linalg.norm(arr[:4], axis=1)[None, :]
    )
    expect0 = np.argmax(sims, axis=1)
    assert got == {i: int(c) for i, c in enumerate(expect0)}


def test_kmeans_fit_matches_numpy_three_iters(spark):
    rng = np.random.default_rng(11)
    # three well-separated blobs so float fold-order differences cannot
    # flip any assignment
    blobs = np.concatenate(
        [rng.standard_normal((40, 6)) * 0.05 + mu for mu in (
            np.eye(6)[0] * 5, np.eye(6)[1] * 5, np.eye(6)[2] * 5)]
    )
    perm = rng.permutation(len(blobs))
    arr = blobs[perm]
    df = _vecs_df(spark, arr)
    got = kmeans_fit(df, k=3, iters=3)
    expect, _ = _numpy_lloyd(arr, 3, 3)
    for (cid, vec), exp in zip(got, expect):
        assert np.allclose(np.array(vec), exp, atol=1e-6), cid


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # centroid 1 is identical to centroid 0 -> ties always go to cluster 0,
    # cluster 1 goes empty and must keep its init vector
    arr = np.ones((10, 4))
    df = _vecs_df(spark, arr)
    got = kmeans_fit(df, k=2, iters=2)
    assert got[1][1] == [1.0, 1.0, 1.0, 1.0]
    assert got[0][1] == [1.0, 1.0, 1.0, 1.0]
