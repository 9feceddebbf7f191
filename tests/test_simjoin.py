"""ops/simjoin.py: FastSS edit-distance join + sorted-neighborhood blocking."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pandas as pd
import pyarrow as pa

from dedupe_examples_ray.ops.simjoin import (
    _fastss_keys,
    batch_edit_distance,
    edit_similarity_join,
    sorted_neighborhood_pairs,
)


def _ref_lev(a: str, b: str) -> int:
    """Byte-level Wagner-Fischer reference (matches DuckDB levenshtein)."""
    x, y = a.encode(), b.encode()
    prev = list(range(len(y) + 1))
    for i, ca in enumerate(x, 1):
        cur = [i]
        for j, cb in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _rand_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    vocab = "abcde"
    out = ["".join(rng.choice(vocab) for _ in range(rng.randint(0, 6))) for _ in range(n)]
    return out + ["café", "cafe", "caf", "", "x", "naïve", "naive"]


def test_fastss_keys_complete_for_distance_1():
    strs = _rand_strings(250, seed=3)
    truth = {
        (i, j)
        for i, j in itertools.combinations(range(len(strs)), 2)
        if _ref_lev(strs[i], strs[j]) <= 1
    }
    ri, keys = _fastss_keys(strs)
    buckets: dict[int, set] = {}
    for r, k in zip(ri, keys):
        buckets.setdefault(int(k), set()).add(int(r))
    cand = set()
    for members in buckets.values():
        cand.update(itertools.combinations(sorted(members), 2))
    assert truth <= cand  # completeness: every true pair is a candidate
    assert truth  # non-vacuous


def test_batch_edit_distance_exact_and_bytelevel():
    strs = _rand_strings(60, seed=9)
    pairs = list(itertools.combinations(range(len(strs)), 2))[:1500]
    a = [strs[i] for i, _ in pairs]
    b = [strs[j] for _, j in pairs]
    got = batch_edit_distance(a, b)
    exp = np.array([_ref_lev(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()
    # byte-level on purpose: 'café' vs 'cafe' is 2 edits (é is 2 UTF-8 bytes)
    assert batch_edit_distance(["café"], ["cafe"])[0] == 2


def test_edit_similarity_join_equals_cross_join(ray_session):
    import ray.data as rd

    strs = _rand_strings(300, seed=5)
    tbl = pa.table({"id": pa.array(range(len(strs)), pa.int64()),
                    "s": pa.array(strs)})
    out = (edit_similarity_join(rd.from_arrow(tbl).repartition(4), col="s",
                                id_col="id")
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    exp_rows = [
        (i, j, _ref_lev(strs[i], strs[j]))
        for i, j in itertools.combinations(range(len(strs)), 2)
        if _ref_lev(strs[i], strs[j]) <= 1
    ]
    exp = pd.DataFrame(exp_rows, columns=["id1", "id2", "dist"])
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"), check_like=False)


def test_jaccard_join_equals_cross_join(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import jaccard_similarity_join

    rng = random.Random(21)
    words = ["red", "blue", "cold", "warm", "bolt", "rod", "widget", "gear"]
    strs = [" ".join(rng.sample(words, rng.randint(1, 4))) for _ in range(200)]
    strs += ["red  bolt", "red bolt", ""]  # doubled delimiter -> empty token
    tbl = pa.table({"id": pa.array(range(len(strs)), pa.int64()),
                    "s": pa.array(strs)})
    t = 0.5
    out = (jaccard_similarity_join(rd.from_arrow(tbl).repartition(4), "s",
                                   "id", threshold=t)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))

    def jac(a, b):
        A, B = set(a.split(" ")), set(b.split(" "))
        return len(A & B) / len(A | B)

    exp = pd.DataFrame(
        [(i, j, jac(strs[i], strs[j]))
         for i, j in itertools.combinations(range(len(strs)), 2)
         if jac(strs[i], strs[j]) >= t],
        columns=["id1", "id2", "jac"],
    )
    pd.testing.assert_frame_equal(
        out.astype({"id1": "int64", "id2": "int64"}),
        exp.astype({"id1": "int64", "id2": "int64"}))


def test_sorted_neighborhood_matches_window_self_join(ray_session):
    import ray.data as rd

    rng = random.Random(11)
    # duplicate keys + shared 6-byte prefixes exercise tie-breaking past the
    # numeric prefix projection
    keys = [rng.choice(["alphaaa", "alphaab", "beta", "beta", "gamma", "zz"])
            + rng.choice(["", "x"]) for _ in range(400)]
    ids = list(range(len(keys)))
    tbl = pa.table({"k": pa.array(keys), "id": pa.array(ids, pa.int64())})
    w = 4
    out = (sorted_neighborhood_pairs(rd.from_arrow(tbl).repartition(5), "k",
                                     "id", window=w, band_width=16)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    order = sorted(ids, key=lambda i: (keys[i], i))
    exp = pd.DataFrame(
        [(order[i], order[j])
         for i in range(len(order))
         for j in range(i + 1, min(i + w + 1, len(order)))],
        columns=["id1", "id2"],
    ).sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_cosine_threshold_join_equals_cross_join(ray_session):
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import cosine_threshold_join

    rng = np.random.default_rng(7)
    n, d = 120, 16
    M = rng.normal(size=(n, d))
    M[10] = M[3] + 0.01 * rng.normal(size=d)  # planted near-dup
    M[77] = -M[12]                            # planted anti-correlate
    vecs = [row.astype(np.float32).tolist() for row in M]
    vecs[50] = None                           # null vector excluded
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    t = 0.4
    out = (cosine_threshold_join(rd.from_arrow(tbl).repartition(4),
                                 "embedding", "vec_id", threshold=t, grid=3)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))

    X = np.array([np.zeros(d) if v is None else np.asarray(v, np.float64)
                  for v in vecs])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    S = Xn @ Xn.T
    exp = pd.DataFrame(
        [(i, j, S[i, j]) for i in range(n) for j in range(i + 1, n)
         if vecs[i] is not None and vecs[j] is not None and S[i, j] >= t],
        columns=["id1", "id2", "cos"],
    )
    assert (out["id1"] == exp["id1"].to_numpy()).all()
    assert (out["id2"] == exp["id2"].to_numpy()).all()
    np.testing.assert_allclose(out["cos"], exp["cos"], atol=1e-12)
    assert ((out["id1"] == 3) & (out["id2"] == 10)).any()


def test_cosine_threshold_join_grid1_and_empty(ray_session):
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import cosine_threshold_join

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert cosine_threshold_join(empty, "embedding", "vec_id").count() == 0

    tbl = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                    "embedding": pa.array([[1.0, 0.0], [1.0, 0.0]],
                                          pa.list_(pa.float32()))})
    out = (cosine_threshold_join(rd.from_arrow(tbl), "embedding", "vec_id",
                                 threshold=0.99, grid=1).to_pandas())
    assert len(out) == 1 and np.isclose(out["cos"].iloc[0], 1.0)


def test_knn_join_matches_brute_force(ray_session):
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import knn_join

    rng = np.random.default_rng(5)
    nl, nr, d, k = 60, 80, 8, 3
    L = rng.normal(size=(nl, d))
    R = rng.normal(size=(nr, d))
    lt = pa.table({"vec_id": pa.array(range(nl), pa.int64()),
                   "embedding": pa.array([r.tolist() for r in L],
                                         pa.list_(pa.float32()))})
    rt = pa.table({"vec_id": pa.array(range(100, 100 + nr), pa.int64()),
                   "embedding": pa.array([r.tolist() for r in R],
                                         pa.list_(pa.float32()))})
    out = (knn_join(rd.from_arrow(lt).repartition(3),
                    rd.from_arrow(rt).repartition(4), k=k, grid=3)
           .to_pandas().sort_values(["id1", "rank"]).reset_index(drop=True))

    Ln = L.astype(np.float32).astype(np.float64)
    Rn = R.astype(np.float32).astype(np.float64)
    Ln /= np.linalg.norm(Ln, axis=1, keepdims=True)
    Rn /= np.linalg.norm(Rn, axis=1, keepdims=True)
    S = Ln @ Rn.T
    exp_rows = []
    for i in range(nl):
        order = sorted(range(nr), key=lambda j: (-S[i, j], 100 + j))[:k]
        exp_rows += [(i, 100 + j, S[i, j], r + 1)
                     for r, j in enumerate(order)]
    exp = pd.DataFrame(exp_rows, columns=["id1", "id2", "cos", "rank"])
    assert len(out) == len(exp)
    assert (out["id1"].to_numpy() == exp["id1"].to_numpy()).all()
    assert (out["id2"].to_numpy() == exp["id2"].to_numpy()).all()
    assert (out["rank"].to_numpy() == exp["rank"].to_numpy()).all()
    import numpy.testing as npt
    npt.assert_allclose(out["cos"], exp["cos"], atol=1e-12)


def test_knn_join_self_excludes_identity(ray_session):
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import knn_join

    rng = np.random.default_rng(9)
    n, d = 40, 6
    M = rng.normal(size=(n, d))
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in M],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    out = knn_join(ds, ds, k=2, grid=2, exclude_self=True).to_pandas()
    assert (out["id1"] != out["id2"]).all()
    assert out.groupby("id1").size().eq(2).all()


def test_knn_join_exact_ties_pick_smallest_id(ray_session):
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import knn_join

    # 10 identical candidates (cos ties everywhere): SQL ROW_NUMBER keeps the
    # smallest candidate ids; the per-cell selection must not drop them
    d = 4
    probe = pa.table({"vec_id": pa.array([0], pa.int64()),
                      "embedding": pa.array([[1.0, 0, 0, 0]],
                                            pa.list_(pa.float32()))})
    cands = pa.table({"vec_id": pa.array(range(100, 110), pa.int64()),
                      "embedding": pa.array([[1.0, 0, 0, 0]] * 10,
                                            pa.list_(pa.float32()))})
    out = (knn_join(rd.from_arrow(probe), rd.from_arrow(cands).repartition(3),
                    k=3, grid=3)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert out["id2"].tolist() == [100, 101, 102]
    assert np.allclose(out["cos"], 1.0)


def test_cosine_and_knn_join_exclude_empty_vectors(ray_session):
    """Zero-length list vectors are excluded, not a ray task crash."""
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import cosine_threshold_join, knn_join

    vecs = [[1.0, 0.0], [], [0.9, 0.1], None, [0.0, 1.0]]
    tbl = pa.table({"vec_id": pa.array(range(5), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out = (cosine_threshold_join(rd.from_arrow(tbl), "embedding", "vec_id",
                                 threshold=0.5, grid=2)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    # only (0, 2) clears 0.5 among the valid vectors; ids 1/3 never appear
    assert out[["id1", "id2"]].values.tolist() == [[0, 2]]

    kn = knn_join(rd.from_arrow(tbl), rd.from_arrow(tbl), k=2,
                  vec_col="embedding", id_col="vec_id", grid=2,
                  exclude_self=True).to_pandas()
    assert not set(kn["id1"]) & {1, 3} and not set(kn["id2"]) & {1, 3}
    assert set(kn["id1"]) == {0, 2, 4}  # every valid probe got neighbors


def test_sorted_neighborhood_rejects_narrow_band():
    import pytest
    import ray.data as rd

    tbl = pa.table({"k": pa.array(["a", "b"]), "id": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="band_width"):
        sorted_neighborhood_pairs(rd.from_arrow(tbl), "k", "id",
                                  window=5, band_width=3)


def test_sorted_neighborhood_nulls_rank_last(ray_session):
    """NULL keys sort after every non-null key (DuckDB NULLS LAST)."""
    import ray.data as rd

    keys = ["b", None, "a", None, "zz"]
    ids = [1, 2, 3, 4, 5]
    tbl = pa.table({"k": pa.array(keys, pa.string()),
                    "id": pa.array(ids, pa.int64())})
    out = (sorted_neighborhood_pairs(rd.from_arrow(tbl), "k", "id", window=1)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    # NULLS LAST order: a(3), b(1), zz(5), null(2), null(4)
    exp = pd.DataFrame({"id1": [1, 2, 3, 5], "id2": [5, 4, 1, 2]})
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  exp.sort_values(["id1", "id2"])
                                  .reset_index(drop=True).astype("int64"))
