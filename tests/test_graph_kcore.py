"""ops/graph.py k-core + extract.py link extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_examples_ray.extract import extract_links, links_batch
from dedupe_examples_ray.ops.graph import (
    _core_numbers_numpy,
    core_numbers,
    k_core,
)


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def _ref_cores(edges: list[tuple]) -> dict:
    """Textbook peeling reference: repeatedly remove the min-degree node."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core: dict = {}
    k = 0
    while adj:
        v = min(adj, key=lambda x: (len(adj[x]), x))
        k = max(k, len(adj[v]))
        core[v] = k
        for u in adj.pop(v):
            adj[u].discard(v)
    return core


def _rand_edges(seed: int, n: int = 40, m: int = 120) -> list[tuple]:
    rng = np.random.default_rng(seed)
    es = set()
    while len(es) < m:
        a, b = rng.integers(0, n, 2)
        if a != b:
            es.add((min(a, b), max(a, b)))
    return sorted(es)


@pytest.mark.parametrize("seed", [3, 17])
def test_numpy_kernel_matches_peeling_reference(seed):
    edges = _rand_edges(seed)
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    nodes, core = _core_numbers_numpy(src, dst)
    ref = _ref_cores(edges)
    assert dict(zip(nodes.tolist(), core.tolist())) == ref


def test_known_graph_k4_plus_path():
    # K4 on {0,1,2,3} (coreness 3) with a pendant path 3-4-5 (coreness 1)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    nodes, core = _core_numbers_numpy(
        np.array([a for a, _ in edges]), np.array([b for _, b in edges]))
    got = dict(zip(nodes.tolist(), core.tolist()))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}


@pytest.mark.parametrize("tier", ["driver", "streaming"])
def test_core_numbers_tiers_match_reference(ray_session, tier):
    edges = _rand_edges(29, n=30, m=90)
    df = pd.DataFrame(edges, columns=["a", "b"])
    out = core_numbers(_ds(df), tier=tier).to_pandas()
    ref = _ref_cores(edges)
    assert dict(zip(out["node"], out["core"])) == ref


def test_core_numbers_dedups_parallel_and_self_edges(ray_session):
    df = pd.DataFrame({"a": [1, 1, 1, 2, 3], "b": [2, 2, 1, 3, 1]})
    out = core_numbers(_ds(df), tier="driver").to_pandas()
    # simple graph is the triangle 1-2-3
    assert dict(zip(out["node"], out["core"])) == {1: 2, 2: 2, 3: 2}


def test_k_core_subgraph_min_degree_invariant(ray_session):
    edges = _rand_edges(41, n=35, m=140)
    df = pd.DataFrame(edges, columns=["a", "b"])
    k = 3
    sub = k_core(_ds(df), k).to_pandas()
    ref = _ref_cores(edges)
    exp = {(a, b) for a, b in edges if ref[a] >= k and ref[b] >= k}
    assert {(r["a"], r["b"]) for _, r in sub.iterrows()} == exp
    if len(sub):
        deg = pd.concat([sub["a"], sub["b"]]).value_counts()
        assert (deg >= k).all()  # the defining min-degree property


# ------------------------------------------------------------- link extract
def test_extract_links_resolution_and_filtering():
    html = (b'<html><body>'
            b'<a href="/about">About</a>'
            b'<A HREF=\'https://other.example/x#frag\'>abs</A>'
            b'<a href=relative.html>bare</a>'
            b'<a href="javascript:void(0)">js</a>'
            b'<a href="mailto:x@y.z">mail</a>'
            b'<a href="#top">frag-only</a>'
            b'<a href="/about">dup</a>'
            b'<a href="?q=1&amp;r=2">entity</a>'
            b'</body></html>')
    got = extract_links(html, "https://site.example/dir/page.html")
    assert got == [
        "https://site.example/about",
        "https://other.example/x",
        "https://site.example/dir/relative.html",
        "https://site.example/dir/page.html?q=1&r=2",
    ]


def test_extract_links_ignores_comments_and_scripts():
    html = (b'<!-- <a href="/commented">no</a> -->'
            b'<script>var s = \'<a href="/scripted">no</a>\';</script>'
            b'<a href="/real">yes</a>')
    assert extract_links(html, "http://a/") == ["http://a/real"]


def test_extract_links_hostile_inputs():
    assert extract_links(b"", "http://a/") == []
    assert extract_links(None, "http://a/") == []
    assert extract_links(b"\x00\xff<a href=", "http://a/") == []
    # unterminated quote swallows to end -> still no crash
    assert isinstance(extract_links(b'<a href="x', "http://a/"), list)
    # malformed port in base: hrefs resolve or are skipped, never raise
    assert isinstance(
        extract_links(b'<a href="http://h:bad/x">t</a>', "http://a/"), list)


def test_links_batch_edges(ray_session):
    import pyarrow as pa

    t = pa.table({
        "url": ["http://h1/a", "http://h2/b"],
        "html": [b'<a href="http://h2/b">x</a><a href="/c">y</a>', b""],
    })
    out = links_batch(t)
    assert out["src"].to_pylist() == ["http://h1/a", "http://h1/a"]
    assert out["dst"].to_pylist() == ["http://h2/b", "http://h1/c"]


# ---------------------------------------------------------- label propagation
def _two_cliques(n1: int = 6, n2: int = 6) -> list[tuple]:
    """Two cliques joined by a single bridge edge."""
    import itertools as it

    a = list(range(n1))
    b = list(range(100, 100 + n2))
    edges = list(it.combinations(a, 2)) + list(it.combinations(b, 2))
    edges.append((a[-1], b[0]))
    return edges


@pytest.mark.parametrize("tier", ["driver", "streaming"])
def test_label_propagation_recovers_planted_communities(ray_session, tier):
    from dedupe_examples_ray.ops.graph import label_propagation

    df = pd.DataFrame(_two_cliques(), columns=["a", "b"])
    out = label_propagation(_ds(df), tier=tier, iters=6).to_pandas()
    comm = dict(zip(out["node"], out["community"]))
    c1 = {comm[v] for v in range(6)}
    c2 = {comm[v] for v in range(100, 106)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2
    assert c1 == {0} and c2 == {100}  # community id = smallest member


def test_label_propagation_tiers_agree_on_integer_graph(ray_session):
    from dedupe_examples_ray.ops.graph import label_propagation

    edges = _rand_edges(55, n=30, m=70)
    df = pd.DataFrame(edges, columns=["a", "b"])
    # fixed round count on both tiers: parity must hold per-round, and the
    # streaming tier pays several shuffles per round in test time
    a = label_propagation(_ds(df), tier="driver", iters=5).to_pandas()
    b = label_propagation(_ds(df), tier="streaming", iters=5).to_pandas()
    da = dict(zip(a["node"], a["community"]))
    db = dict(zip(b["node"], b["community"]))
    assert da == db


def test_label_propagation_empty_and_self_loops(ray_session):
    from dedupe_examples_ray.ops.graph import label_propagation

    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    assert label_propagation(empty).count() == 0
    df = pd.DataFrame({"a": [1, 1, 2], "b": [1, 2, 1]})  # self loop + dup
    out = label_propagation(_ds(df), tier="driver").to_pandas()
    assert dict(zip(out["node"], out["community"])) == {1: 1, 2: 1}
