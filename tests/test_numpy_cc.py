"""Vectorized driver CC must match the per-edge union-find exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_examples_ray.cluster import (
    driver_cluster_table,
    numpy_connected_components,
    union_find,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_numpy_cc_matches_union_find(seed):
    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 500, 700
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    a, b = a[keep], b[keep]
    root = numpy_connected_components(a, b, n_nodes)
    ref = union_find(a.tolist(), b.tolist())
    # same partition: nodes share a root iff they share a union-find label
    seen: dict = {}
    for x, y in zip(a, b):
        seen.setdefault(root[x], set()).add(ref[x])
        seen.setdefault(root[y], set()).add(ref[y])
    assert all(len(v) == 1 for v in seen.values())
    labels_per_root: dict = {}
    for node in set(a.tolist()) | set(b.tolist()):
        labels_per_root.setdefault(ref[node], set()).add(root[node])
    assert all(len(v) == 1 for v in labels_per_root.values())


def test_driver_cluster_table_labels_and_scores():
    df = pd.DataFrame(
        {
            "id_a": ["b", "c", "x"],
            "id_b": ["a", "b", "y"],
            "score": [1.0, 0.6, 0.8],
        }
    )
    tbl = driver_cluster_table(df)
    got = {r["node"]: (r["label"], r["score"]) for r in tbl.to_pylist()}
    assert got["a"][0] == "a" and got["b"][0] == "a" and got["c"][0] == "a"
    assert got["x"][0] == "x" and got["y"][0] == "x"
    assert got["a"][1] == pytest.approx(1.0)
    assert got["b"][1] == pytest.approx(0.8)  # mean of 1.0 and 0.6
    assert got["c"][1] == pytest.approx(0.6)


def test_driver_cluster_table_empty():
    df = pd.DataFrame({"id_a": [], "id_b": [], "score": []})
    assert driver_cluster_table(df).num_rows == 0
