"""Round-3 additions: grouped_mode, grouped_sum_rollup, nth_value."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dedupe_examples_ray.relational import (
    grouped_mode,
    grouped_nunique,
    grouped_sum_rollup,
    unpivot,
)
from dedupe_examples_ray.windows import nth_value


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


# ---------------------------------------------------------------- grouped_mode
def test_grouped_mode_ties_and_null_key(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", None, None],
        "v": ["x", "y", "y", "q", "p", "z", "z"],
    })
    out = (grouped_mode(_ds(df), "k", "v").to_pandas()
           .sort_values("k", na_position="last").reset_index(drop=True))
    # a: y (count 2) beats x; b: tie p/q at 1 -> smallest value p; NULL key
    # forms its own group with mode z
    assert list(out["mode_val"]) == ["y", "p", "z"]
    assert list(out["mode_count"]) == [2, 1, 2]
    assert out["k"].isna().tolist() == [False, False, True]


def test_grouped_mode_cross_block_counts(ray_session):
    """Partial counts from different blocks must merge before the argmax."""
    import ray.data as rd

    df = pd.DataFrame({"k": [1] * 6, "v": ["a", "b", "b", "a", "a", "b"]})
    ds = rd.from_pandas(df).repartition(6)  # one row per block
    out = grouped_mode(ds, "k", "v").to_pandas()
    # global tie 3-3 -> smallest value wins
    assert list(out["mode_val"]) == ["a"]
    assert list(out["mode_count"]) == [3]


# ---------------------------------------------------------- grouped_sum_rollup
def test_rollup_levels_and_grouping_id(ray_session):
    df = pd.DataFrame({
        "a": ["x", "x", "y"],
        "b": ["1", "2", "1"],
        "v": [1.0, 2.0, 4.0],
    })
    out = grouped_sum_rollup(_ds(df), ["a", "b"], "v").to_pandas()
    detail = out[out["grouping_id"] == 0].sort_values(["a", "b"])
    assert list(detail["total"]) == [1.0, 2.0, 4.0]
    mid = out[out["grouping_id"] == 2].sort_values("a")
    assert list(mid["a"]) == ["x", "y"] and list(mid["total"]) == [3.0, 4.0]
    assert mid["b"].isna().all()
    grand = out[out["grouping_id"] == 3]
    assert len(grand) == 1 and grand["total"].iloc[0] == 7.0
    assert grand[["a", "b"]].isna().all().all()


def test_rollup_distinguishes_real_null_key(ray_session):
    """A real NULL in the last key stays at grouping_id 0, separate from the
    rolled-up NULL row at grouping_id 2."""
    df = pd.DataFrame({"a": ["x", "x"], "b": [None, "1"], "v": [5.0, 7.0]})
    out = grouped_sum_rollup(_ds(df), ["a", "b"], "v").to_pandas()
    detail_null = out[(out["grouping_id"] == 0) & out["b"].isna()]
    rolled = out[(out["grouping_id"] == 2)]
    assert list(detail_null["total"]) == [5.0]
    assert list(rolled["total"]) == [12.0]


# --------------------------------------------------------------------- nth_value
def test_nth_value_short_partitions_null(ray_session):
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, None],
        "o": [3, 1, 2, 1, 2, 1],
        "v": [30.0, 10.0, 20.0, 1.0, 2.0, 9.0],
    })
    out = (nth_value(_ds(df), "k", ["o"], "v", 2).to_pandas()
           .sort_values(["k", "o"], na_position="last").reset_index(drop=True))
    # k=1 ordered by o -> [10,20,30], 2nd = 20 on every row
    assert list(out.loc[out["k"] == 1, "nth_val"]) == [20.0, 20.0, 20.0]
    assert list(out.loc[out["k"] == 2, "nth_val"]) == [2.0, 2.0]
    # NULL-key partition has 1 row < 2 -> NULL
    assert out.loc[out["k"].isna(), "nth_val"].isna().all()


def test_nth_value_string_values(ray_session):
    df = pd.DataFrame({"k": ["g", "g"], "o": [2, 1], "v": ["second", "first"]})
    out = nth_value(_ds(df), "k", ["o"], "v", 2).to_pandas()
    assert set(out["nth_val"]) == {"second"}


# ------------------------------------------------------------- grouped_nunique
def test_grouped_nunique_cross_block_and_nulls(ray_session):
    """Distinct pairs split across blocks must not double-count; NULL values
    are excluded, NULL keys form their own group."""
    import ray.data as rd

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, None, None],
        "v": ["a", "a", "b", None, "a", "x", "x"],
    })
    ds = rd.from_pandas(df).repartition(7)
    out = (grouped_nunique(ds, "k", "v").to_pandas()
           .sort_values("k", na_position="last").reset_index(drop=True))
    assert list(out["ndistinct"]) == [2, 1, 1]
    assert out["k"].isna().tolist() == [False, False, True]


# ---------------------------------------------------------------------- unpivot
def test_unpivot_shapes_and_values(ray_session):
    df = pd.DataFrame({"id": [1, 2], "x": [1.5, 2.5], "y": [10.0, 20.0]})
    out = (unpivot(_ds(df), ["id"], ["x", "y"]).to_pandas()
           .sort_values(["id", "name"]).reset_index(drop=True))
    assert len(out) == 4
    assert list(out["name"]) == ["x", "y", "x", "y"]
    assert list(out["value"]) == [1.5, 10.0, 2.5, 20.0]
    assert out["value"].dtype == np.float64


# ------------------------------------------------------------ bloom_semi_join
def test_bloom_semi_anti_match_hash_join(ray_session):
    """Bloom-pruned existence joins must be EXACTLY hash_join's output —
    false positives removed by the re-check, null probe keys kept only by
    anti, and the zero-shuffle negative path unioned back in."""
    import ray.data as rd

    from dedupe_examples_ray.relational import bloom_semi_join, hash_join

    rng = np.random.default_rng(7)
    a = pd.DataFrame({"k": rng.integers(0, 400, 500).astype(float),
                      "payload": np.arange(500)})
    a.loc[::97, "k"] = None
    b = pd.DataFrame({"bk": rng.integers(200, 600, 300).astype(float)})
    ds_a = rd.from_pandas(a).repartition(6)
    ds_b = rd.from_pandas(b).repartition(4)
    for how in ("semi", "anti"):
        got = (bloom_semi_join(ds_a, ds_b, on="k", right_on="bk", how=how,
                               num_buckets=8)
               .to_pandas().sort_values("payload").reset_index(drop=True))
        exp = (hash_join(ds_a, ds_b, on="k", right_on="bk", how=how,
                         num_buckets=8)
               .to_pandas().sort_values("payload").reset_index(drop=True))
        assert list(got["payload"]) == list(exp["payload"]), how


def test_bloom_filter_no_false_negatives(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import (
        _bloom_member_mask,
        bloom_filter_build,
    )
    import pyarrow as pa

    keys = pd.DataFrame({"k": np.arange(1000, dtype=np.int64) * 3})
    words, m, k = bloom_filter_build(rd.from_pandas(keys).repartition(5), "k")
    # every inserted key must report member=True
    mask = _bloom_member_mask(pa.array(keys["k"]), words, m, k)
    assert mask.all()
    # realized fp rate on disjoint probes stays near the 1% target
    probes = pa.array(np.arange(1000, dtype=np.int64) * 3 + 1)
    fp = _bloom_member_mask(probes, words, m, k).mean()
    assert fp < 0.05
    # nulls are never members
    assert not _bloom_member_mask(pa.array([None, 3], type=pa.int64()),
                                  words, m, k)[0]


def test_bloom_empty_build_side(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import bloom_semi_join

    a = pd.DataFrame({"k": [1, 2, None], "p": [0, 1, 2]})
    b = pd.DataFrame({"bk": pd.array([], dtype="int64")})
    ds_a, ds_b = rd.from_pandas(a), rd.from_pandas(b)
    assert bloom_semi_join(ds_a, ds_b, "k", "bk", how="semi").count() == 0
    anti = bloom_semi_join(ds_a, ds_b, "k", "bk", how="anti").to_pandas()
    assert sorted(anti["p"]) == [0, 1, 2]


# ----------------------------------------------------------- unigram_xentropy
def test_unigram_xentropy_hand_check(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import unigram_xentropy

    # corpus: 4 'a', 2 'b', 2 'c' -> N=8; p(a)=.5, p(b)=p(c)=.25
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a a b", "a a b c", "c"]})
    out = (unigram_xentropy(rd.from_pandas(df).repartition(2), round_digits=None)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    import math
    # doc1: avg(-log2 .5, -log2 .5, -log2 .25) = (1+1+2)/3
    assert abs(out.loc[0, "xent"] - (1 + 1 + 2) / 3) < 1e-9
    assert abs(out.loc[1, "xent"] - (1 + 1 + 2 + 2) / 4) < 1e-9
    assert abs(out.loc[2, "xent"] - 2.0) < 1e-9
    assert list(out["n_tokens"]) == [3, 4, 1]


def test_unigram_xentropy_tiers_agree_and_skip_empty(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import unigram_xentropy

    rng = np.random.default_rng(3)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [" ".join(rng.choice(words, rng.integers(0, 12))) for _ in range(60)]
    texts[7] = ""          # zero-token doc: omitted from output
    texts[11] = "   "      # whitespace-only: also omitted
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df).repartition(5)
    b = (unigram_xentropy(ds, method="broadcast").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    j = (unigram_xentropy(ds, method="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert 7 not in set(b["doc_id"]) and 11 not in set(b["doc_id"])
    assert list(b["doc_id"]) == list(j["doc_id"])
    assert list(b["n_tokens"]) == list(j["n_tokens"])
    assert np.allclose(b["xent"], j["xent"], atol=1e-4)


# ------------------------------------------------- kmeans + semantic_dedup
def _planted_embeddings(n_per=40, dim=8, n_clusters=3, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_clusters, dim))
    rows, truth = [], []
    for c in range(n_clusters):
        rows.append(centers[c] + rng.normal(0, 0.3, (n_per, dim)))
        truth += [c] * n_per
    X = np.vstack(rows)
    return pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": list(X),
    }), np.array(truth), centers


def test_kmeans_distributed_recovers_planted_clusters(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import kmeans_assign, kmeans_distributed

    df, truth, centers = _planted_embeddings()
    ds = rd.from_pandas(df).repartition(5)
    C, info = kmeans_distributed(ds, k=3, iters=12)
    assert C.shape == (3, 8)
    assert sorted(info["cluster_sizes"]) == [40, 40, 40]
    # every learned centroid sits within 0.5 of a distinct true center
    d = np.linalg.norm(C[:, None, :] - centers[None, :, :], axis=2)
    assert (d.min(axis=1) < 0.5).all()
    assert len(set(d.argmin(axis=1))) == 3
    # assignment is consistent with ground truth (same partition)
    out = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    got = out["cluster_id"].to_numpy()
    for c in range(3):
        assert len(np.unique(got[truth == c])) == 1


def test_kmeans_iterations_improve_on_seed(ray_session):
    """Distributed Lloyd must converge: shifts decrease and the final pass
    reports shift < tol well before max iters on an easy dataset."""
    import ray.data as rd

    from dedupe_examples_ray.ops import kmeans_distributed

    df, _, _ = _planted_embeddings(seed=23)
    _, info = kmeans_distributed(rd.from_pandas(df).repartition(3),
                                 k=3, iters=20, tol=1e-5)
    assert info["iters_run"] < 20
    assert info["shifts"][-1] < 1e-5


def test_semantic_dedup_finds_planted_clones(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import semantic_dedup

    # angularly spread base vectors (independent gaussians: pairwise cosine
    # far from 1) so only the planted clones clear tau
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "vec_id": np.arange(90, dtype=np.int64),
        "embedding": list(rng.normal(0, 1, (90, 8))),
    })
    # plant 10 near-duplicate pairs: vec_id 1000+i clones vec_id i
    clones = pd.DataFrame({
        "vec_id": 1000 + np.arange(10, dtype=np.int64),
        "embedding": [np.asarray(v) * 1.0001 for v in df["embedding"][:10]],
    })
    full = pd.concat([df, clones], ignore_index=True)
    out = (semantic_dedup(rd.from_pandas(full).repartition(4),
                          k=3, tau=0.999, iters=8)
           .to_pandas().set_index("vec_id")["keep_id"])
    # each clone resolves to its original (min id in the component)
    for i in range(10):
        assert out.loc[1000 + i] == out.loc[i]
    # non-cloned points survive as their own keep_id
    lonely = [v for v in full["vec_id"] if v >= 10 and v < 1000]
    assert (out.loc[lonely] == lonely).all()


def test_semantic_dedup_salts_hot_cluster(ray_session):
    """A cluster over max_bucket must still run (sub-bucketed, bounded
    pairs) and exact clones that land in the same sub-bucket dedup."""
    import ray.data as rd

    from dedupe_examples_ray.ops import semantic_dedup

    rng = np.random.default_rng(9)
    n = 300
    X = rng.normal(0, 0.2, (n, 6)) + 5.0
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(X)})
    out = semantic_dedup(rd.from_pandas(df).repartition(3),
                         k=2, tau=0.99999, iters=3, max_bucket=50).to_pandas()
    assert len(out) == n  # every row got an assignment
    assert set(out.columns) >= {"vec_id", "keep_id"}


def test_kmeans_tiers_parity(ray_session, monkeypatch):
    """Driver tier and streaming tier run the same update rule — forcing the
    streaming path (budget=0) must give the same centroids and sizes."""
    import ray.data as rd

    from dedupe_examples_ray.ops import embed_cluster

    df, _, _ = _planted_embeddings(seed=31)
    ds = rd.from_pandas(df).repartition(4)
    C_driver, i_driver = embed_cluster.kmeans_distributed(ds, k=3, iters=6)
    monkeypatch.setattr(embed_cluster, "_DRIVER_KMEANS_BUDGET", 0)
    C_stream, i_stream = embed_cluster.kmeans_distributed(ds, k=3, iters=6)
    assert np.allclose(C_driver, C_stream, atol=1e-9)
    assert i_driver["cluster_sizes"] == i_stream["cluster_sizes"]
    assert i_driver["iters_run"] == i_stream["iters_run"]


# -------------------------------------------------------------- approx_quantile
def test_approx_quantile_rank_bound(ray_session):
    """Sketch estimates must sit within the published rank-error bound of
    the exact empirical quantile, across skewed data and many blocks."""
    import ray.data as rd

    from dedupe_examples_ray.relational import approx_quantile

    rng = np.random.default_rng(13)
    vals = np.concatenate([rng.lognormal(0, 2, 20000),
                           rng.normal(1000, 1, 500)])  # heavy tail + spike
    df = pd.DataFrame({"v": vals})
    sk = approx_quantile(rd.from_pandas(df).repartition(16), "v",
                         {"p50": 0.5, "p90": 0.9, "p99": 0.99},
                         sample_per_batch=256, round_digits=None)
    eps = sk["rank_error_bound"]
    assert eps == 1 / 512
    srt = np.sort(vals)
    n = len(srt)
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        lo = srt[max(0, int(np.floor((q - 2 * eps) * n)) - 1)]
        hi = srt[min(n - 1, int(np.ceil((q + 2 * eps) * n)) + 1)]
        assert lo <= sk[name] <= hi, (name, lo, sk[name], hi)
    assert round(sk["n"]) == n


def test_approx_quantile_nulls_and_empty(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import approx_quantile

    df = pd.DataFrame({"v": [None, 5.0, None, 1.0, 3.0]})
    sk = approx_quantile(rd.from_pandas(df), "v", {"med": 0.5})
    assert round(sk["n"]) == 3 and 1.0 <= sk["med"] <= 5.0
    empty = pd.DataFrame({"v": pd.array([], dtype="float64")})
    sk0 = approx_quantile(rd.from_pandas(empty), "v", {"med": 0.5})
    assert np.isnan(sk0["med"]) and sk0["n"] == 0.0


# --------------------------------------------------------------- interval_join
def test_interval_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import interval_join

    rng = np.random.default_rng(21)
    vals = pd.DataFrame({"v": rng.uniform(0, 100, 400),
                         "vid": np.arange(400, dtype=np.int64)})
    vals.loc[::53, "v"] = None
    iv = pd.DataFrame({"lo": rng.uniform(0, 95, 60)})
    iv["hi"] = iv["lo"] + rng.uniform(0, 10, 60)
    iv["iid"] = np.arange(60, dtype=np.int64)
    iv.loc[0, ["lo", "hi"]] = [-1.0, 101.0]   # spans everything
    iv.loc[1, ["lo", "hi"]] = [50.0, 40.0]    # inverted: matches nothing
    iv.loc[2, "hi"] = None                    # null bound: matches nothing
    for closed in ("both", "left"):
        got = interval_join(rd.from_pandas(vals).repartition(5),
                            rd.from_pandas(iv).repartition(3),
                            "v", "lo", "hi", num_ranges=16, closed=closed)
        got = (got.to_pandas().sort_values(["vid", "iid"]).reset_index(drop=True)
               if got.count() else pd.DataFrame(columns=["vid", "iid"]))
        exp = vals.dropna(subset=["v"]).merge(iv.dropna(subset=["lo", "hi"]),
                                              how="cross")
        m = (exp["v"] >= exp["lo"]) & ((exp["v"] <= exp["hi"]) if closed == "both"
                                       else (exp["v"] < exp["hi"]))
        exp = exp[m].sort_values(["vid", "iid"]).reset_index(drop=True)
        assert list(got["vid"]) == list(exp["vid"]), closed
        assert list(got["iid"]) == list(exp["iid"]), closed


def test_interval_join_empty_sides(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import interval_join

    vals = pd.DataFrame({"v": [1.0, 2.0], "vid": [0, 1]})
    iv0 = pd.DataFrame({"lo": pd.array([], dtype="float64"),
                        "hi": pd.array([], dtype="float64"),
                        "iid": pd.array([], dtype="int64")})
    out = interval_join(rd.from_pandas(vals), rd.from_pandas(iv0),
                        "v", "lo", "hi", num_ranges=4)
    assert out.count() == 0


# ------------------------------------------------------- cube / grouping sets
def test_cube_levels_match_pandas(ray_session):
    from dedupe_examples_ray.relational import grouped_sum_cube

    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["1", "2", "1"],
                       "v": [1.0, 2.0, 4.0]})
    out = grouped_sum_cube(_ds(df), ["a", "b"], "v").to_pandas()
    assert sorted(out["grouping_id"].unique()) == [0, 1, 2, 3]
    # gid=1: a rolled up, grouped by b alone
    g1 = out[out["grouping_id"] == 1].sort_values("b")
    assert list(g1["b"]) == ["1", "2"] and list(g1["total"]) == [5.0, 2.0]
    assert g1["a"].isna().all()
    # gid=3 grand total
    assert out.loc[out["grouping_id"] == 3, "total"].iloc[0] == 7.0


def test_grouping_sets_explicit_and_validation(ray_session):
    import pytest

    from dedupe_examples_ray.relational import grouped_sum_grouping_sets

    df = pd.DataFrame({"a": ["x", "y"], "b": ["1", "1"], "v": [3.0, 4.0]})
    out = grouped_sum_grouping_sets(_ds(df), ["a", "b"], "v", [1, 2]).to_pandas()
    assert sorted(out["grouping_id"].unique()) == [1, 2]
    with pytest.raises(ValueError):
        grouped_sum_grouping_sets(_ds(df), ["a", "b"], "v", [0, 4])
    with pytest.raises(ValueError):
        grouped_sum_grouping_sets(_ds(df), ["a", "b"], "v", [1, 1])


# ------------------------------------------------------- cross_dup_fraction
def test_cross_dup_fraction_hand_check(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import cross_dup_fraction

    # W=3, S=1: doc1 "a b c d" -> windows [a b c], [b c d]
    #           doc2 "b c d e" -> windows [b c d], [c d e]
    #           doc3 "x y"     -> too short, omitted
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b c d", "b c d e", "x y"]})
    out = (cross_dup_fraction(rd.from_pandas(df).repartition(3),
                              window=3, stride=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["n_windows"]) == [2, 2]
    assert list(out["n_dup"]) == [1, 1]
    assert list(out["dup_frac"]) == [0.5, 0.5]


def test_cross_dup_fraction_self_duplication_counts(ray_session):
    """A window repeated WITHIN one doc is duplicated too (count > 1
    corpus-wide includes the same doc)."""
    import ray.data as rd

    from dedupe_examples_ray.ops import cross_dup_fraction

    df = pd.DataFrame({"doc_id": [1], "text": ["p q r p q r"]})
    out = cross_dup_fraction(rd.from_pandas(df), window=3, stride=3).to_pandas()
    # windows: [p q r], [p q r] -> both duplicated
    assert list(out["n_windows"]) == [2]
    assert list(out["n_dup"]) == [2]
    assert list(out["dup_frac"]) == [1.0]


# -------------------------------------------- grouped_entropy / share_within
def test_grouped_entropy_hand_check(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_entropy

    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 2, 3],
        "e": ["a", "a", "b", "b", "a", None, "z"],
    })
    out = (grouped_entropy(rd.from_pandas(df).repartition(4), "u", "e")
           .to_pandas().sort_values("u").reset_index(drop=True))
    # u=1: 50/50 -> 1 bit; u=2: single value after NULL drop -> 0; u=3: 0
    assert list(out["u"]) == [1, 2, 3]
    assert list(out["entropy"]) == [1.0, 0.0, 0.0]


def test_share_within_group_sums_to_one(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import share_within_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 9, 200),
                       "v": rng.uniform(1, 10, 200)})
    out = share_within_group(rd.from_pandas(df).repartition(5), "k", "v",
                             round_digits=None).to_pandas()
    sums = out.groupby("k")["share"].sum()
    assert np.allclose(sums, 1.0)
    exp = df["v"] / df.groupby("k")["v"].transform("sum")
    got = out.sort_values(["k", "v"]).reset_index(drop=True)["share"]
    exps = pd.concat([df["k"], df["v"], exp.rename("s")], axis=1).sort_values(
        ["k", "v"]).reset_index(drop=True)["s"]
    assert np.allclose(got, exps)


# ------------------------------------------------------------- hostile inputs
def test_new_text_ops_survive_null_and_empty_text(ray_session):
    """NULL text, empty text, whitespace-only text through the round-3 text
    ops: no crash, sane outputs."""
    import ray.data as rd

    from dedupe_examples_ray.ops import (
        cross_dup_fraction,
        paragraph_dedup,
        unigram_xentropy,
    )

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [None, "", "   ", "one two three four", "one two three four",
                 "\tword\nword2  "],
    })
    ds = rd.from_pandas(df).repartition(3)
    x = unigram_xentropy(ds).to_pandas()
    assert set(x["doc_id"]) == {3, 4, 5}  # token-less docs omitted
    c = cross_dup_fraction(ds, window=2, stride=1).to_pandas().set_index("doc_id")
    assert set(c.index) == {3, 4, 5}
    # docs 3/4 are identical -> every window duplicated; doc5's lone window isn't
    assert c.loc[3, "dup_frac"] == 1.0 and c.loc[4, "dup_frac"] == 1.0
    assert c.loc[5, "dup_frac"] == 0.0
    d = paragraph_dedup(ds, words_per_para=2).to_pandas()
    # doc4 (verbatim dup of doc3) and doc1 (second occurrence of the empty
    # paragraph, first-seen at doc0) are dropped; no crash on NULL text
    assert 4 not in set(d["doc_id"]) and 1 not in set(d["doc_id"])
    assert 3 in set(d["doc_id"])


# ------------------------------------------------------------- profiling ops
def test_profile_table_types_nulls_and_bigint_precision(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import profile_table

    big = (1 << 60) + 7
    t = pa.table({
        "i": pa.array([big, 3, None, 5], pa.int64()),
        "f": pa.array([1.5, None, -2.25, 0.0], pa.float64()),
        "s": pa.array(["b", "a", None, "c"], pa.string()),
        "allnull": pa.array([None] * 4, pa.string()),
    })
    out = (profile_table(rd.from_arrow(t).repartition(3),
                         ["i", "f", "s", "allnull"])
           .to_pandas().set_index("col_name"))
    assert int(out.loc["i", "n_rows"]) == 4 and int(out.loc["i", "n_null"]) == 1
    assert out.loc["i", "min_value"] == "3"
    assert out.loc["i", "max_value"] == str(big)  # exact past 2^53
    assert out.loc["f", "min_value"] == "-2.25"
    assert out.loc["s", "min_value"] == "a" and out.loc["s", "max_value"] == "c"
    assert out.loc["allnull", "min_value"] is None or pd.isna(
        out.loc["allnull", "min_value"])
    assert int(out.loc["allnull", "n_distinct"]) == 0
    assert int(out.loc["s", "n_distinct"]) == 3
    assert int(out.loc["i", "n_distinct"]) == 3


def test_profile_table_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import profile_table

    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                    "v": pa.array([], pa.float64())}))
    out = profile_table(empty, ["k", "v"]).to_pandas().set_index("col_name")
    assert list(out["n_rows"]) == [0, 0]
    assert list(out["n_distinct"]) == [0, 0]
    assert out["min_value"].isna().all()


def test_grouped_string_agg_null_semantics_and_order(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_string_agg

    df = pd.DataFrame({
        "k": ["x", "x", None, None, "y", "z"],
        "v": ["b", "a", "q", "p", None, "only"],
    })
    out = (grouped_string_agg(rd.from_pandas(df).repartition(3), "k", "v")
           .to_pandas())
    m = {(None if pd.isna(k) else k): v for k, v in zip(out["k"], out["agg"])}
    assert m["x"] == "a,b"          # ORDER BY v
    assert m[None] == "p,q"         # NULL keys form one group
    assert "y" not in m             # all-NULL values -> group omitted
    assert m["z"] == "only"


def test_histogram_fixed_clamp_and_null(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import histogram_fixed

    df = pd.DataFrame({"x": [-5.0, 0.0, 9.99, 10.0, 25.0, 99.0, 150.0, None]})
    out = (histogram_fixed(rd.from_pandas(df).repartition(2), "x",
                           0.0, 100.0, 10)
           .to_pandas().set_index("bucket")["n"].to_dict())
    # -5 clamps to 0; 150 clamps to 9; NULL dropped
    assert out == {0: 3, 1: 1, 2: 1, 9: 2}


# --------------------------------------------------------------- sample_exact_k
def test_sample_exact_k_deterministic_and_partition_independent(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import sample_exact_k

    df = pd.DataFrame({"id": np.arange(500, dtype=np.int64),
                       "payload": np.arange(500) * 2})
    a = (sample_exact_k(rd.from_pandas(df).repartition(2), "id", 20)
         .to_pandas().sort_values("id").reset_index(drop=True))
    b = (sample_exact_k(rd.from_pandas(df).repartition(13), "id", 20)
         .to_pandas().sort_values("id").reset_index(drop=True))
    assert len(a) == 20
    assert list(a["id"]) == list(b["id"])  # partitioning-independent
    # min-k property vs a local reference
    from dedupe_examples_ray.pairs import stable_hash
    h = stable_hash(df["id"].astype(str).to_numpy(dtype=object))
    exp = set(df["id"].to_numpy()[np.argsort(h)[:20]])
    assert set(a["id"]) == exp


def test_explode_list_ordinality_null_and_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import explode_list

    t = pa.table({
        "id": [1, 2, 3, 4],
        "v": pa.array([[1.5, 2.5], None, [], [7.0]],
                      type=pa.list_(pa.float64())),
    })
    out = (explode_list(rd.from_arrow(t), ["id"], "v", out_col="x",
                        with_ordinality="pos")
           .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True))
    assert list(out["id"]) == [1, 1, 4]       # null/empty -> zero rows
    assert list(out["x"]) == [1.5, 2.5, 7.0]
    assert list(out["pos"]) == [1, 2, 1]      # 1-based, restarts per row


def test_sample_exact_k_small_input(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import sample_exact_k

    df = pd.DataFrame({"id": [1, 2, 3]})
    out = sample_exact_k(rd.from_pandas(df), "id", 10).to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]


def test_grouped_regression_matches_numpy(ray_session):
    import pytest
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_regression

    rng = np.random.default_rng(7)
    x = rng.uniform(1, 50, 4000)
    df = pd.DataFrame({
        "g": np.where(np.arange(4000) % 2 == 0, "a", "b"),
        "x": x,
        "y": 3.5 * x + 10.0 + rng.standard_normal(4000) * 5.0,
    })
    out = (grouped_regression(rd.from_pandas(df).repartition(9), ["g"],
                              "x", "y", round_digits=6)
           .to_pandas().set_index("g"))
    for g, d in df.groupby("g"):
        slope, intercept = np.polyfit(d["x"], d["y"], 1)
        r = np.corrcoef(d["x"], d["y"])[0, 1]
        cov = np.cov(d["x"], d["y"], ddof=1)[0, 1]
        assert out.loc[g, "slope"] == pytest.approx(slope, abs=1e-5)
        assert out.loc[g, "intercept"] == pytest.approx(intercept, abs=1e-4)
        assert out.loc[g, "r2"] == pytest.approx(r * r, abs=1e-6)
        assert out.loc[g, "covar"] == pytest.approx(cov, abs=1e-4)
        assert out.loc[g, "n"] == len(d)


def test_grouped_regression_edge_semantics(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_regression

    df = pd.DataFrame({
        # zero x-variance -> slope/intercept/r2 NULL (Postgres semantics)
        "g": ["zx"] * 3 + ["zy"] * 3 + ["nn"] * 4,
        "x": [5.0, 5.0, 5.0, 1.0, 2.0, 3.0, 1.0, 2.0, None, 4.0],
        # zero y-variance -> r2 == 1; pairwise-null rows excluded
        "y": [1.0, 2.0, 3.0, 7.0, 7.0, 7.0, 2.0, None, 6.0, 8.0],
    })
    out = (grouped_regression(rd.from_pandas(df), ["g"], "x", "y")
           .to_pandas().set_index("g"))
    assert np.isnan(out.loc["zx", "slope"]) and np.isnan(out.loc["zx", "r2"])
    assert out.loc["zy", "r2"] == 1.0 and out.loc["zy", "slope"] == 0.0
    assert out.loc["nn", "n"] == 2  # only the two pairwise-complete rows


def test_grouped_mad_and_disc_quantile(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_mad, grouped_quantile

    v = [1.0, 2.0, 3.5, 7.0, 100.0, 4.0]
    df = pd.DataFrame({"k": ["a"] * 6, "v": v})
    mad = grouped_mad(rd.from_pandas(df), ["k"], "v").to_pandas()
    # median=3.75, |v-med| sorted -> median 2.25 (verified vs DuckDB mad())
    assert mad["mad"].tolist() == [2.25]

    out = grouped_quantile(rd.from_pandas(df), ["k"], "v",
                           {"p25": 0.25, "p50": 0.5, "p90": 0.9},
                           method="disc").to_pandas()
    # discrete percentile returns actual data values: sorted[ceil(q*n)-1]
    assert out.p25.tolist() == [2.0]
    assert out.p50.tolist() == [3.5]
    assert out.p90.tolist() == [100.0]


def test_remove_dup_spans_planted(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import remove_dup_spans

    run = "alpha bravo charlie delta echo"          # the 5-token span
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            run + " foxtrot golf",                  # first occurrence: kept
            "intro words " + run + " outro",        # later occurrence: cut
            "too short here",                       # < window: untouched
            run + " " + run,                        # within-doc repeat: 2nd cut
        ],
    })
    out = (remove_dup_spans(rd.from_pandas(docs), window=5)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "text"] == run + " foxtrot golf"
    assert out.loc[1, "n_tokens_removed"] == 0
    # doc 2 loses exactly the 5 planted tokens, keeps its own framing
    assert out.loc[2, "text"] == "intro words outro"
    assert out.loc[2, "n_tokens_removed"] == 5
    assert out.loc[3, "text"] == "too short here"
    assert out.loc[3, "n_tokens_removed"] == 0
    # doc 4 holds two MORE copies of a span whose first corpus-wide
    # occurrence is doc 1 — both are cut, leaving nothing
    assert out.loc[4, "n_tokens_total"] == 10
    assert out.loc[4, "n_tokens_removed"] == 10
    assert out.loc[4, "text"] == ""


def test_remove_dup_spans_hostile(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import remove_dup_spans

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [None, "", "   leading   and   trailing   spaces   "],
    })
    out = (remove_dup_spans(rd.from_pandas(docs), window=3)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "text"] == "" and out.loc[1, "n_tokens_total"] == 0
    assert out.loc[2, "text"] == ""
    # whitespace-normalized passthrough, empties dropped
    assert out.loc[3, "text"] == "leading and trailing spaces"
    assert out.loc[3, "n_tokens_removed"] == 0


def test_source_ngram_overlap_planted(ray_session):
    import pytest
    import ray.data as rd

    from dedupe_examples_ray.ops import source_ngram_overlap

    span = "one two three four"                     # a shared 4-gram
    docs = pd.DataFrame({
        "source": ["A", "A", "B", "C"],
        "text": [
            span + " tailA more words",
            "unrelated content entirely here",
            "prefixB " + span + " tailB",
            "nothing in common with anyone",
        ],
    })
    out = (source_ngram_overlap(rd.from_pandas(docs), ngram=4)
           .to_pandas().set_index(["source_a", "source_b"]).sort_index())
    # A and B share exactly the one planted window, both directions
    assert out.loc[("A", "B"), "shared"] == 1
    assert out.loc[("B", "A"), "shared"] == 1
    # containment is shared / n_a (ordered, asymmetric denominators)
    assert out.loc[("A", "B"), "containment"] == pytest.approx(
        1.0 / out.loc[("A", "B"), "n_a"])
    assert out.loc[("B", "A"), "containment"] == pytest.approx(
        1.0 / out.loc[("B", "A"), "n_a"])
    # C overlaps nobody -> absent (inner semantics)
    assert "C" not in out.index.get_level_values(0)


def test_grouped_robust_zscore(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_robust_zscore

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["z"] * 3,
        "v": [1.0, 2.0, 3.0, 4.0, 1000.0,    # the outlier barely moves med/MAD
              5.0, 5.0, 5.0],                # zero MAD -> NULL scores
    })
    out = (grouped_robust_zscore(rd.from_pandas(df), ["k"], "v")
           .to_pandas())
    a = out[out["k"] == "a"].sort_values("v")["rz"].to_numpy()
    # group a: median 3, MAD = median(|v-3|) = median([2,1,0,1,997]) = 1
    assert np.allclose(a, [-2.0, -1.0, 0.0, 1.0, 997.0])
    assert out[out["k"] == "z"]["rz"].isna().all()


def test_grouped_skew_kurt_and_geomean(ray_session):
    import pytest
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_geomean, grouped_skew_kurt

    rng = np.random.default_rng(11)
    v = rng.lognormal(3.0, 0.7, 2000)
    df = pd.DataFrame({
        "k": ["big"] * 2000 + ["tiny2"] * 2 + ["const"] * 5,
        "v": np.concatenate([v, [1.0, 2.0], [7.0] * 5]),
    })
    out = (grouped_skew_kurt(rd.from_pandas(df).repartition(7), ["k"], "v",
                             round_digits=6)
           .to_pandas().set_index("k"))
    n = len(v); mu = v.mean()
    m2 = ((v-mu)**2).mean(); m3 = ((v-mu)**3).mean(); m4 = ((v-mu)**4).mean()
    G1 = (m3 / m2**1.5) * np.sqrt(n*(n-1)) / (n-2)
    G2 = ((n+1)*(m4/m2**2 - 3) + 6) * (n-1) / ((n-2)*(n-3))
    assert out.loc["big", "skewness"] == pytest.approx(G1, abs=1e-5)
    assert out.loc["big", "kurtosis"] == pytest.approx(G2, abs=1e-5)
    # SQL edges: n<3 -> skew NULL; zero variance -> both NULL
    assert np.isnan(out.loc["tiny2", "skewness"])
    assert np.isnan(out.loc["const", "skewness"])
    assert np.isnan(out.loc["const", "kurtosis"])

    gm = (grouped_geomean(rd.from_pandas(df), ["k"], "v", round_digits=6)
          .to_pandas().set_index("k"))
    assert gm.loc["big", "geomean"] == pytest.approx(
        np.exp(np.log(v).mean()), rel=1e-6)
    assert gm.loc["tiny2", "geomean"] == pytest.approx(np.sqrt(2.0), abs=1e-6)

    # non-positive values make the geometric mean undefined -> NULL group
    neg = pd.DataFrame({"k": ["n"] * 3, "v": [1.0, -2.0, 3.0]})
    gneg = grouped_geomean(rd.from_pandas(neg), ["k"], "v").to_pandas()
    assert gneg["geomean"].isna().all()


def test_normalized_dedup_keep_longest(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import normalized_dedup

    # ids 1-3 are case/whitespace variants of one key; 2 is longest.
    # ids 4-5 tie on length -> min id wins.  6 is unique; 7 is NULL text.
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "text": pa.array(["Hello  World", "  hello world \n", "HELLO\tWORLD",
                          "aaa bbb", "AAA BBB", "unique doc", None]),
    })
    out = (normalized_dedup(rd.from_arrow(tbl), "text", "doc_id",
                            keep="longest")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out.doc_id, out.n_dups))
    assert got == {2: 3, 4: 2, 6: 1, 7: 1}

    first = (normalized_dedup(rd.from_arrow(tbl), "text", "doc_id",
                              keep="first")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert dict(zip(first.doc_id, first.n_dups)) == {1: 3, 4: 2, 6: 1, 7: 1}


def test_grouped_approx_ndistinct_accuracy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_approx_ndistinct

    rng = np.random.default_rng(7)
    # key "a": 1000 distinct over 3000 rows; "b": 37 distinct; NULL values
    # excluded; key "c" all-NULL values -> omitted.
    ka = rng.integers(0, 1000, 3000)
    kb = rng.integers(0, 37, 500)
    keys = ["a"] * 3000 + ["b"] * 500 + ["c"] * 5
    vals = np.r_[ka, kb].astype("float64").tolist() + [None] * 5
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})
    # many small blocks so partials genuinely merge across batches
    out = (grouped_approx_ndistinct(rd.from_arrow(tbl).repartition(8), "k", "v")
           .to_pandas().set_index("k"))
    assert set(out.index) == {"a", "b"}
    for k, exact in (("a", len(np.unique(ka))), ("b", len(np.unique(kb)))):
        est = out.loc[k, "approx_ndv"]
        assert abs(est - exact) / exact <= 3 * out.loc[k, "error_bound"], (k, est, exact)


def test_script_profile_mixed_scripts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import script_profile

    texts = ["hello world", "Привет мир", "世界你好", "مرحبا", "123 abc",
             "", None]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (script_profile(rd.from_arrow(tbl)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_latin"].tolist() == [10, 0, 0, 0, 3, 0, 0]
    assert out["n_cyrillic"].tolist() == [0, 9, 0, 0, 0, 0, 0]
    assert out["n_han"].tolist() == [0, 0, 4, 0, 0, 0, 0]
    assert out["n_arabic"].tolist() == [0, 0, 0, 5, 0, 0, 0]
    assert out["n_digit"].tolist() == [0, 0, 0, 0, 3, 0, 0]
    assert out["frac_latin"].iloc[0] == round(10 / 11, 6)
    assert (out.loc[5:, ["frac_latin", "frac_han"]] == 0).all().all()


def test_lsh_plan_matches_brute_force_and_known_points():
    """The (bands, rows) plan equals an independent brute-force minimization
    of the S-curve error integral, and hits the public known optimum for the
    classic (0.5, 128) configuration."""
    import numpy as np

    from dedupe_examples_ray.ops.dedup import lsh_plan

    def brute(th, P, fpw=0.5, fnw=0.5):
        s = np.linspace(0.0, 1.0, 1001)
        below = s < th
        best, err = None, np.inf
        for r in range(1, P + 1):
            for b in range(1, P // r + 1):
                p = 1.0 - (1.0 - s**r) ** b
                e = fpw * np.trapz(p[below], s[below]) + fnw * np.trapz(
                    1.0 - p[~below], s[~below])
                if e < err:
                    best, err = (b, r), e
        return best

    for th in (0.3, 0.5, 0.8):
        assert lsh_plan(th, 128) == brute(th, 128)
    assert lsh_plan(0.5, 128) == (25, 5)  # datasketch's published optimum
    # recall-weighting shifts the curve left: more bands (earlier S-rise)
    b_bal, r_bal = lsh_plan(0.8, 128)
    b_rec, r_rec = lsh_plan(0.8, 128, fp_weight=0.1, fn_weight=0.9)
    assert brute(0.8, 128, 0.1, 0.9) == (b_rec, r_rec)
    import pytest

    with pytest.raises(ValueError):
        lsh_plan(0.0)
    with pytest.raises(ValueError):
        lsh_plan(0.5, num_perm=1)


def test_grouped_trimmed_mean_dropk(ray_session):
    """Drop-k semantics: floor(trim*n) extremes cut per side; NULLs excluded;
    all-NULL group yields NULL; trim=0 is the plain mean."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_trimmed_mean

    rows = {
        "k": ["a"] * 10 + ["b"] * 3 + ["c"] * 2 + ["d"],
        "v": [100.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, -50.0,
              1.0, None, 3.0,
              None, None,
              7.0],
    }
    t = pa.table({"k": pa.array(rows["k"]), "v": pa.array(rows["v"],
                                                          pa.float64())})
    out = (grouped_trimmed_mean(rd.from_arrow(t), ["k"], "v", trim=0.1)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # a: n=10, k=1 -> drop -50 and 100 -> mean(1..8) = 4.5
    # b: two non-null, k=0 -> mean(1,3)=2 ; c: all null -> NaN ; d: 7
    assert out["trimmed_mean"].iloc[0] == 4.5
    assert out["trimmed_mean"].iloc[1] == 2.0
    assert pd.isna(out["trimmed_mean"].iloc[2])
    assert out["trimmed_mean"].iloc[3] == 7.0
    # trim=0 equals the plain mean
    out0 = (grouped_trimmed_mean(rd.from_arrow(t), ["k"], "v", trim=0.0)
            .to_pandas().set_index("k"))
    assert np.isclose(out0.loc["a", "trimmed_mean"], np.mean(
        [100, 1, 2, 3, 4, 5, 6, 7, 8, -50]))
    import pytest

    with pytest.raises(ValueError):
        grouped_trimmed_mean(rd.from_arrow(t), ["k"], "v", trim=0.5)


def test_pmi_token_pairs_tiers_and_caps(ray_session):
    """Broadcast and join tiers emit identical PMI tables; the hot-doc cap
    excludes an over-cap document's pairs; min_df prunes rare tokens."""
    import math

    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.textstats import pmi_token_pairs

    docs = pd.DataFrame({
        "doc_id": range(7),
        "text": ["the quick brown fox jumps", "the quick brown dog runs",
                 "quick brown foxes and dogs", "alpha beta gamma",
                 "alpha beta delta", None,
                 # hot doc: many tokens — excluded when max_doc_tokens < 6
                 "alpha beta quick brown the gamma delta extra more toks"],
    })
    ds = rd.from_pandas(docs)
    kw = dict(min_df=2, min_pair=2)
    out_b = (pmi_token_pairs(ds, method="broadcast", **kw).to_pandas()
             .sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
    out_j = (pmi_token_pairs(ds, method="join", **kw).to_pandas()
             .sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
    assert out_b.equals(out_j)
    # hot doc (7 qualifying tokens) participates at the default cap...
    row = out_b[(out_b.tok_a == "brown") & (out_b.tok_b == "quick")]
    assert row["n_ab"].iloc[0] == 4
    # ...and is excluded below it: quick&brown co-occur 3x, df 4 each, N=7
    capped = (pmi_token_pairs(ds, max_doc_tokens=6, **kw).to_pandas()
              .sort_values(["tok_a", "tok_b"]).reset_index(drop=True))
    row = capped[(capped.tok_a == "brown") & (capped.tok_b == "quick")]
    assert row["n_ab"].iloc[0] == 3
    assert abs(row["pmi"].iloc[0] - round(math.log(3 * 7 / 16), 6)) < 1e-9
    # min_df prunes: 'fox'/'dog' appear once -> never in any pair
    assert not set(capped.tok_a) & {"fox", "dog"}
    # empty corpus
    empty = pmi_token_pairs(
        rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [None]})),
        **kw).to_pandas()
    assert len(empty) == 0


def test_cdc_chunk_invariants(ray_session):
    """Content-defined chunking: reconstruction, min/max bounds, boundary
    shift-resistance under prefix and mid-document insertions, determinism,
    null/empty docs, and the dedup-stats rollup."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.corpus import cdc_chunk, cdc_dedup_stats

    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("abcdefgh "), 4000))
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [base, "X" + base,
                 base[:2000] + "INSERTED" + base[2000:], None, ""],
    })
    ds = rd.from_pandas(docs)
    ch = cdc_chunk(ds, avg_size=128).to_pandas()
    assert set(ch.doc_id) == {0, 1, 2}  # null/empty docs emit nothing
    for d in (0, 1, 2):
        sub = ch[ch.doc_id == d].sort_values("chunk_idx")
        assert sub["length"].sum() == len(docs.text[d].encode())
        assert (sub["start"].to_numpy()[1:]
                == (sub["start"] + sub["length"]).to_numpy()[:-1]).all()
        assert sub["length"].min() >= 1 and sub["length"].max() <= 512
        assert (sub["chunk_idx"].to_numpy() == np.arange(len(sub))).all()
    h0 = set(ch[ch.doc_id == 0].chunk_hash)
    h1 = set(ch[ch.doc_id == 1].chunk_hash)
    h2 = set(ch[ch.doc_id == 2].chunk_hash)
    assert len(h0 & h1) / len(h0) > 0.6   # 1-byte prefix insert re-aligns
    assert len(h0 & h2) / len(h0) > 0.6   # mid-document insert re-aligns
    # determinism across separate pipeline runs (worker processes differ)
    ch2 = cdc_chunk(ds, avg_size=128).to_pandas()
    key = ["doc_id", "chunk_idx"]
    assert ch.sort_values(key).reset_index(drop=True).equals(
        ch2.sort_values(key).reset_index(drop=True))
    stats = cdc_dedup_stats(ds, avg_size=128)
    assert stats["dedup_ratio"].iloc[0] > 2.0
    assert stats["total_bytes"].iloc[0] == 4000 + 4001 + 4008
    # param validation
    import pytest
    with pytest.raises(ValueError):
        cdc_chunk(ds, avg_size=100)
    with pytest.raises(ValueError):
        cdc_chunk(ds, avg_size=128, min_size=256, max_size=200)


def test_hits_tiers_and_invariants(ray_session):
    """HITS driver and streaming tiers agree to float tolerance and match
    the textbook power iteration; hubs/authorities land where they should."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.graph import hits

    edges = pd.DataFrame({"src": [0, 0, 0, 1, 1, 2, 10],
                          "dst": [10, 11, 12, 10, 11, 10, 13]})
    ds = rd.from_pandas(edges)
    d = (hits(ds, iters=15, force_tier="driver").to_pandas()
         .sort_values("node").reset_index(drop=True))
    s = (hits(ds.repartition(3), iters=15, force_tier="stream").to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert np.allclose(d["hub"], s["hub"], atol=1e-9)
    assert np.allclose(d["authority"], s["authority"], atol=1e-9)
    # node 0 points at all three authorities -> best hub; node 10 is cited
    # by every hub -> best authority; L2 norms are 1
    assert d.loc[d["hub"].idxmax(), "node"] == 0
    assert d.loc[d["authority"].idxmax(), "node"] == 10
    assert abs(np.linalg.norm(d["hub"]) - 1) < 1e-9
    assert abs(np.linalg.norm(d["authority"]) - 1) < 1e-9
    # a pure authority has hub ~0; a pure hub has authority 0
    assert d.loc[d["node"] == 11, "hub"].iloc[0] < 1e-8
    assert d.loc[d["node"] == 0, "authority"].iloc[0] < 1e-8
    import pytest
    with pytest.raises(ValueError):
        hits(rd.from_pandas(pd.DataFrame({"src": [], "dst": []})))


def test_triangle_count_known_and_random(ray_session):
    """K4 has 4 triangles; C5 has 0; a seeded random graph matches an O(n^3)
    brute force.  Duplicate/reversed/self-loop edges must not change counts."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops import triangle_count

    def brute(edges):
        und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        nodes = sorted({x for e in und for x in e})
        cnt = sum(
            1 for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in und and (y, z) in und and (x, z) in und)
        return len(nodes), len(und), cnt

    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    got = triangle_count(rd.from_pandas(pd.DataFrame(k4, columns=["a", "b"])))
    assert got == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}

    c5 = [(i, (i + 1) % 5) for i in range(5)]
    got = triangle_count(rd.from_pandas(pd.DataFrame(c5, columns=["a", "b"])))
    assert got["n_triangles"] == 0

    rng = np.random.default_rng(7)
    raw = [(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
           for _ in range(200)]
    # add noise: reversed duplicates and self loops
    noisy = raw + [(b, a) for a, b in raw[:50]] + [(5, 5), (9, 9)]
    nn, ne, nt = brute(noisy)
    got = triangle_count(
        rd.from_pandas(pd.DataFrame(noisy, columns=["a", "b"])).repartition(4))
    assert got == {"n_nodes": nn, "n_edges": ne, "n_triangles": nt}


def test_triangle_count_string_nodes_and_empty(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import triangle_count

    tri = pd.DataFrame({"a": ["x", "y", "x", "x"],
                        "b": ["y", "z", "z", "w"]})
    got = triangle_count(rd.from_pandas(tri))
    assert got == {"n_nodes": 4, "n_edges": 4, "n_triangles": 1}

    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    assert triangle_count(empty)["n_triangles"] == 0


def test_keep_best_assignment_argmax_and_ties(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops import keep_best_assignment

    assign = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "keep_id": [1, 1, 1, 4, 4, 6],
    })).repartition(3)
    scores = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "score": [0.5, 0.9, 0.9, 0.1, 0.1, 0.7],
    })).repartition(2)
    out = (keep_best_assignment(assign, scores).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # cluster {1,2,3}: max score ties 2/3 -> min id 2; cluster {4,5}: tie -> 4
    assert out["best_id"].tolist() == [2, 2, 2, 4, 4, 6]
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 5, 6]


def test_minhash_keep_best_prefers_longest_clone(ray_session):
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops import minhash_keep_best_dedup

    base = " ".join(f"tok{i}" for i in range(60))
    rows = pd.DataFrame({
        "doc_id": [10, 11, 12, 20],
        "text": [base,                       # clone, shorter
                 base + " extra trailing words here",  # clone, LONGEST
                 base + " extra",            # clone, mid
                 " ".join(f"zz{i}" for i in range(40))],  # unrelated
    })
    out = (minhash_keep_best_dedup(rd.from_pandas(rows), threshold=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[out["doc_id"] == 10, "best_id"].iloc[0] == 11
    assert out.loc[out["doc_id"] == 11, "best_id"].iloc[0] == 11
    assert out.loc[out["doc_id"] == 12, "best_id"].iloc[0] == 11
    assert out.loc[out["doc_id"] == 20, "best_id"].iloc[0] == 20
import pandas as pd
import pyarrow as pa


def test_wet_roundtrip_and_hostile(ray_session, tmp_path):
    import ray.data as rd

    from dedupe_examples_ray.sources import (format_wet_records,
                                             parse_wet_bytes, read_wet,
                                             write_wet)

    df = pd.DataFrame({
        "url": [f"http://ex{i}.com/p" for i in range(7)],
        "warc_ts": pd.to_datetime(["2024-01-01 00:00:0%d" % i
                                   for i in range(7)]),
        "text": ["plain text", "", "line1\n\nline2 with blank",
                 "payload containing\r\nWARC/1.0\r\nmarker lines",
                 "unicode: café 中文", None,
                 "x" * 10_000],
    })
    out_dir = str(tmp_path / "wet")
    nfiles = write_wet(rd.from_pandas(df).repartition(3), out_dir)
    assert nfiles >= 1
    back = (read_wet(out_dir).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert back["parse_ok"].all()
    want = df.sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == want["url"].tolist()
    assert back["text"].tolist() == want["text"].fillna("").tolist()
    assert (pd.to_datetime(back["warc_ts"]).dt.tz_localize(None)
            == want["warc_ts"]).all()

    # hostile: truncated final record + missing Content-Length resync
    good = format_wet_records(["http://a/"], ["2024-01-01T00:00:00Z"], ["hello"])
    bad_hdr = (b"WARC/1.0\r\nWARC-Target-URI: http://b/\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n\r\n")  # no length
    truncated = format_wet_records(
        ["http://c/"], ["2024-01-01T00:00:00Z"], ["full payload here"])[:-12]
    t = parse_wet_bytes(good + bad_hdr + good + truncated)
    ok = t.to_pandas()
    assert ok["parse_ok"].tolist() == [True, False, True, False]
    assert ok["url"].tolist() == ["http://a/", "http://b/", "http://a/",
                                  "http://c/"]
    # empty file
    assert parse_wet_bytes(b"").num_rows == 0


# -------------------------------------------------------------------- skyline
def _brute_skyline(df, cols):
    import numpy as np

    signs = np.array([1.0 if d == "min" else -1.0 for d in cols.values()])
    sub = df.dropna(subset=list(cols))
    M = sub[list(cols)].to_numpy(dtype=float) * signs
    keep = []
    for i in range(len(M)):
        dominated = any(
            (M[j] <= M[i]).all() and (M[j] < M[i]).any()
            for j in range(len(M)) if j != i)
        if not dominated:
            keep.append(sub.index[i])
    return df.loc[keep]


def test_skyline_matches_brute_force(ray_session):
    import numpy as np

    from dedupe_examples_ray.relational import skyline

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "id": range(200),
        "x": rng.integers(0, 40, 200).astype(float),
        "y": rng.integers(0, 40, 200).astype(float),
        "z": rng.integers(0, 40, 200).astype(float),
    })
    for cols in ({"x": "min", "y": "min"}, {"x": "min", "y": "max"},
                 {"x": "min", "y": "max", "z": "min"}):
        got = skyline(_ds(df), cols).to_pandas()
        exp = _brute_skyline(df, cols)
        assert sorted(got["id"]) == sorted(exp["id"]), cols


def test_skyline_nulls_excluded_and_duplicates_kept(ray_session):
    from dedupe_examples_ray.relational import skyline

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "x": [1.0, 1.0, None, 0.5, 9.0],
        "y": [5.0, 5.0, 9.0, 1.0, 9.0],
    })
    got = skyline(_ds(df), {"x": "min", "y": "max"}).to_pandas()
    ids = sorted(got["id"])
    # rows 1,2 are identical -> NEITHER dominates the other, both kept;
    # row 3 has a NULL -> excluded; row 5 dominated by nothing on max-y
    assert 1 in ids and 2 in ids and 3 not in ids and 5 in ids


def test_skyline_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import skyline

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64()),
                                    "y": pa.array([], pa.float64())}))
    assert skyline(empty, {"x": "min", "y": "min"}).count() == 0
