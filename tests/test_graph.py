"""PageRank (operators/graph.py) against a dense numpy power-iteration
reference, including dangling-node mass redistribution."""

from __future__ import annotations

import numpy as np
import pytest

from stock_prediction_data_engineering_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping=0.85, iters=50):
    m = np.zeros((n, n))
    outdeg = np.zeros(n)
    for s, d in edge_list:
        outdeg[s] += 1
    for s, d in edge_list:
        m[d, s] = 1.0 / outdeg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (m @ r + dangling / n)
    return r


def test_pagerank_matches_numpy_reference(spark):
    # 6 nodes incl. a dangling sink (5) and a hub (0)
    edge_list = [
        (0, 1), (0, 2), (0, 3),
        (1, 0), (2, 0), (3, 0),
        (3, 4), (4, 5), (2, 5),
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.id: r.rank
        for r in pagerank(edges, max_iterations=50, tol=0.0).collect()
    }
    want = _numpy_pagerank(6, edge_list)
    assert set(got) == set(range(6))
    for i in range(6):
        assert got[i] == pytest.approx(want[i], abs=1e-9)
    # ranks are a distribution and the hub dominates
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert max(got, key=got.get) == 0


def test_pagerank_converges_early(spark):
    """On a symmetric cycle the exact answer is uniform; the tolerance
    stop must fire on iteration 1 rather than running all rounds."""
    n = 8
    edge_list = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.id: r.rank
        for r in pagerank(edges, max_iterations=500, tol=1e-12).collect()
    }
    for i in range(n):
        assert got[i] == pytest.approx(1.0 / n, abs=1e-12)
