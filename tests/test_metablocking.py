"""Meta-blocking (blocking/metablocking.py): purge -> CBS -> WEP/CNP."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from dedupe_examples_ray.blocking.metablocking import (
    cbs_edge_weights,
    column_blocks,
    meta_block_prune,
    token_blocks,
)


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def _brute(blocks: pd.DataFrame, max_block_size: int) -> dict:
    """Reference CBS weights: per surviving block, count shared memberships."""
    b = blocks.drop_duplicates()
    sizes = b.groupby("block_key")["rid"].nunique()
    keep = sizes[(sizes >= 2) & (sizes <= max_block_size)].index
    w: dict = {}
    for key, grp in b[b["block_key"].isin(keep)].groupby("block_key"):
        for a, c in itertools.combinations(sorted(grp["rid"]), 2):
            w[(a, c)] = w.get((a, c), 0) + 1
    return w


def _rand_blocks(seed: int, n_rec: int = 60, n_keys: int = 25) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for rid in range(n_rec):
        for key in rng.choice(n_keys, size=rng.integers(1, 6), replace=False):
            rows.append((f"k{key}", rid))
    return pd.DataFrame(rows, columns=["block_key", "rid"])


def test_cbs_weights_match_brute_force(ray_session):
    blocks = _rand_blocks(7)
    got = cbs_edge_weights(_ds(blocks), max_block_size=10).to_pandas()
    ref = _brute(blocks, 10)
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        assert ref[(r["id_a"], r["id_b"])] == r["weight"]


def test_wep_keeps_at_or_above_mean(ray_session):
    blocks = _rand_blocks(11)
    ref = _brute(blocks, 10)
    mean_w = sum(ref.values()) / len(ref)
    kept = meta_block_prune(_ds(blocks), max_block_size=10, mode="wep").to_pandas()
    exp = {p for p, w in ref.items() if w >= mean_w}
    assert {(r["id_a"], r["id_b"]) for _, r in kept.iterrows()} == exp


def test_cnp_topk_either_endpoint_and_bound(ray_session):
    blocks = _rand_blocks(13)
    k = 2
    ref = _brute(blocks, 10)
    # reference CNP: directed top-k by (weight desc, neighbour asc)
    nbrs: dict = {}
    for (a, b), w in ref.items():
        nbrs.setdefault(a, []).append((-w, b))
        nbrs.setdefault(b, []).append((-w, a))
    kept_dir = set()
    for node, lst in nbrs.items():
        for _, other in sorted(lst)[:k]:
            kept_dir.add((min(node, other), max(node, other)))
    got = meta_block_prune(_ds(blocks), max_block_size=10, mode="cnp", k=k)
    got_pairs = {(r["id_a"], r["id_b"]) for _, r in got.to_pandas().iterrows()}
    assert got_pairs == kept_dir
    assert len(got_pairs) <= k * len(nbrs)  # CNP output bound


def test_block_purging_drops_hot_key_entirely(ray_session):
    """A stop-word block above the cap contributes NO pairs and NO weight —
    purging is exact exclusion, not salting (exact weights are the contract)."""
    hot = pd.DataFrame({"block_key": "hot", "rid": range(50)})
    cold = pd.DataFrame({"block_key": "cold", "rid": [1, 2]})
    blocks = pd.concat([hot, cold], ignore_index=True)
    got = cbs_edge_weights(_ds(blocks), max_block_size=10).to_pandas()
    assert len(got) == 1
    assert (got.iloc[0]["id_a"], got.iloc[0]["id_b"], got.iloc[0]["weight"]) == (1, 2, 1)


def test_duplicate_membership_not_double_counted(ray_session):
    """The same (block, record) row appearing twice (e.g. repeated token in
    one document) must count once toward CBS."""
    blocks = pd.DataFrame(
        {"block_key": ["x", "x", "x", "y", "y"], "rid": [1, 1, 2, 1, 2]}
    )
    got = cbs_edge_weights(_ds(blocks), max_block_size=10).to_pandas()
    assert len(got) == 1 and got.iloc[0]["weight"] == 2


def test_token_and_column_block_emitters(ray_session):
    df = pd.DataFrame({"rid": [1, 2], "name": ["red blue red", "blue green"],
                       "brand": ["b1", "b2"]})
    toks = token_blocks(_ds(df), "name", "rid", prefix="t:").to_pandas()
    assert set(map(tuple, toks.to_numpy())) == {
        ("t:red", 1), ("t:blue", 1), ("t:blue", 2), ("t:green", 2)}
    cols = column_blocks(_ds(df), "brand", "rid", prefix="b:").to_pandas()
    assert set(map(tuple, cols.to_numpy())) == {("b:b1", 1), ("b:b2", 2)}
