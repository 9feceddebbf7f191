"""Property-based tests (hypothesis) for the round-2 relational operators:
randomized inputs against independent pandas/numpy references.  Example
counts are small — each example spins Ray Data plans — but the generators
cover nulls, duplicates, skew and empty groups that hand-written cases miss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

import ray.data as rd


def _frames(draw, max_keys=12):
    n_a = draw(st.integers(0, 60))
    n_b = draw(st.integers(0, 60))
    keys_a = draw(st.lists(
        st.one_of(st.integers(0, max_keys), st.none()),
        min_size=n_a, max_size=n_a))
    keys_b = draw(st.lists(st.integers(0, max_keys), min_size=n_b, max_size=n_b))
    a = pd.DataFrame({"k": pd.array(keys_a, dtype="Int64"),
                      "av": np.arange(n_a, dtype=np.int64)})
    b = pd.DataFrame({"k2": pd.array(keys_b, dtype="Int64"),
                      "bv": np.arange(n_b, dtype=np.int64) * 7})
    b = b.drop_duplicates("k2")  # unique right side keeps the oracle simple
    return a, b


@settings(max_examples=8, deadline=None)
@given(data=st.data(), how=st.sampled_from(["inner", "left", "semi", "anti"]))
def test_hash_join_matches_pandas(ray_session, data, how):
    from dedupe_examples_ray.relational import hash_join

    a, b = _frames(data.draw)
    ds_a = rd.from_pandas(a) if len(a) else rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "av": pa.array([], pa.int64())}))
    ds_b = rd.from_pandas(b) if len(b) else rd.from_arrow(
        pa.table({"k2": pa.array([], pa.int64()), "bv": pa.array([], pa.int64())}))
    got = hash_join(ds_a, ds_b, on="k", right_on="k2", how=how,
                    num_buckets=8).to_pandas()
    if len(got) == 0:
        # an all-empty groupby output drops its schema (known Ray Data
        # behavior) — just assert the reference agrees it's empty
        got = pd.DataFrame({"k": [], "av": [], "bv": []})

    merged = a.merge(b.rename(columns={"k2": "k"}), on="k",
                     how=how if how in ("inner", "left") else "left",
                     indicator=how in ("semi", "anti"))
    if how == "semi":
        exp = merged[merged["_merge"] == "both"].drop(columns=["_merge", "bv"])
        assert sorted(got["av"]) == sorted(exp["av"])
    elif how == "anti":
        exp = merged[merged["_merge"] == "left_only"].drop(columns=["_merge", "bv"])
        assert sorted(got["av"]) == sorted(exp["av"])
    else:
        assert len(got) == len(merged)
        cols = ["av", "bv"]
        g = got[cols].astype("float64").sort_values(cols).reset_index(drop=True)
        e = merged[cols].astype("float64").sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e)


@settings(max_examples=6, deadline=None)
@given(data=st.data(), how=st.sampled_from(["right", "full"]))
def test_hash_join_outer_matches_pandas(ray_session, data, how):
    """RIGHT/FULL OUTER vs a null-safe pandas oracle.  pandas merge matches
    NaN keys to each other (non-SQL), so the oracle splits null-key rows out,
    merges the non-null cores, and appends the null-key rows unmatched —
    exactly the SQL contract hash_join implements."""
    from dedupe_examples_ray.relational import hash_join

    a, b = _frames(data.draw)
    # re-introduce null keys on the b side (dropped by _frames' oracle trick)
    if len(b) >= 2:
        b = b.copy()
        b.iloc[0, b.columns.get_loc("k2")] = pd.NA
    ds_a = rd.from_pandas(a) if len(a) else rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "av": pa.array([], pa.int64())}))
    ds_b = rd.from_pandas(b) if len(b) else rd.from_arrow(
        pa.table({"k2": pa.array([], pa.int64()), "bv": pa.array([], pa.int64())}))
    got = hash_join(ds_a, ds_b, on="k", right_on="k2", how=how,
                    num_buckets=8).to_pandas()
    if len(got) == 0:
        got = pd.DataFrame({"k": [], "av": [], "bv": []})

    br = b.rename(columns={"k2": "k"})
    an, bn = a[a["k"].isna()], br[br["k"].isna()]
    core = a.dropna(subset=["k"]).merge(
        br.dropna(subset=["k"]), on="k",
        how="outer" if how == "full" else "right")
    parts = [core, bn.assign(av=np.nan)]
    if how == "full":
        parts.append(an.assign(bv=np.nan))
    exp = pd.concat(parts, ignore_index=True)
    cols = ["k", "av", "bv"]
    g = got[cols].astype("float64").sort_values(cols).reset_index(drop=True)
    e = exp[cols].astype("float64").sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.one_of(st.floats(-1e6, 1e6), st.none()),
                     min_size=1, max_size=300))
def test_global_rank_matches_pandas(ray_session, vals):
    from dedupe_examples_ray.windows import global_rank

    ids = np.arange(len(vals))
    t = pa.table({"id": ids, "v": pa.array(vals, pa.float64())})
    got = (global_rank(rd.from_arrow(t).repartition(3), by="v", mode="rank",
                       num_ranges=4, bins=64)
           .to_pandas().sort_values("id"))
    exp = pd.Series(vals, dtype="float64").rank(method="min", na_option="bottom")
    assert np.array_equal(got["rnk"].to_numpy(), exp.to_numpy(np.int64))


@settings(max_examples=6, deadline=None)
@given(n_distinct=st.integers(1, 5000), reps=st.integers(1, 3))
def test_hll_within_bound(ray_session, n_distinct, reps):
    from dedupe_examples_ray.relational import approx_ndistinct

    ids = np.repeat(np.arange(n_distinct), reps).astype(str)
    ds = rd.from_arrow(pa.table({"u": ids}))
    got = approx_ndistinct(ds, "u", precision=11)
    rel = abs(got["estimate"] - n_distinct) / n_distinct
    assert rel <= 4 * got["error_bound"]  # 4 sigma: no flaky CI


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_frequent_items_exact(ray_session, data):
    from dedupe_examples_ray.relational import frequent_items

    n_heavy = data.draw(st.integers(0, 3))
    heavy = [v for i in range(n_heavy) for v in [f"h{i}"] * data.draw(st.integers(30, 80))]
    tail = [f"t{i}" for i in range(data.draw(st.integers(0, 150)))]
    vals = heavy + tail
    if not vals:
        vals = ["x"]
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.string())})).repartition(3)
    cap = 6
    got = frequent_items(ds, "k", capacity=cap)
    s = pd.Series(vals).value_counts()
    exp = s[s * (cap + 1) > len(vals)].sort_index()
    assert list(got["k"]) == list(exp.index)
    assert list(got["n"]) == list(exp.to_numpy())


# ------------------------------------------------------- round-3 operators
@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_grouped_mode_matches_pandas(ray_session, data):
    from dedupe_examples_ray.relational import grouped_mode

    n = data.draw(st.integers(1, 120))
    df = pd.DataFrame({
        "k": data.draw(st.lists(st.one_of(st.integers(0, 6), st.none()),
                                min_size=n, max_size=n)),
        "v": data.draw(st.lists(st.sampled_from(["a", "b", "c", "d"]),
                                min_size=n, max_size=n)),
    })
    got = (grouped_mode(rd.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().sort_values("k", na_position="last").reset_index(drop=True))
    cnt = df.groupby(["k", "v"], dropna=False).size().reset_index(name="c")
    cnt = cnt.sort_values(["k", "c", "v"], ascending=[True, False, True],
                          na_position="last", kind="mergesort")
    exp = (cnt.drop_duplicates("k").rename(columns={"v": "mode_val", "c": "mode_count"})
           .sort_values("k", na_position="last").reset_index(drop=True))
    assert list(got["mode_val"]) == list(exp["mode_val"])
    assert list(got["mode_count"]) == list(exp["mode_count"])


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_grouped_nunique_matches_pandas(ray_session, data):
    from dedupe_examples_ray.relational import grouped_nunique

    n = data.draw(st.integers(1, 120))
    df = pd.DataFrame({
        "k": data.draw(st.lists(st.integers(0, 6), min_size=n, max_size=n)),
        "v": data.draw(st.lists(st.one_of(st.sampled_from(list("abcdefgh")), st.none()),
                                min_size=n, max_size=n)),
    })
    got = (grouped_nunique(rd.from_pandas(df).repartition(5), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (df.dropna(subset=["v"]).groupby("k")["v"].nunique()
           .reset_index(name="ndistinct"))
    assert list(got["k"]) == list(exp["k"])
    assert list(got["ndistinct"]) == list(exp["ndistinct"])


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_rollup_matches_pandas(ray_session, data):
    from dedupe_examples_ray.relational import grouped_sum_rollup

    n = data.draw(st.integers(1, 100))
    df = pd.DataFrame({
        "a": data.draw(st.lists(st.sampled_from(["x", "y", "z"]), min_size=n, max_size=n)),
        "b": data.draw(st.lists(st.sampled_from(["1", "2"]), min_size=n, max_size=n)),
        "v": np.arange(n, dtype=np.float64),  # integer-valued: exact sums
    })
    got = grouped_sum_rollup(rd.from_pandas(df).repartition(4), ["a", "b"], "v").to_pandas()
    # level 0: detail
    d0 = got[got["grouping_id"] == 0].sort_values(["a", "b"]).reset_index(drop=True)
    e0 = df.groupby(["a", "b"], as_index=False)["v"].sum().rename(columns={"v": "total"})
    assert list(d0["total"]) == list(e0["total"])
    # level 1: b rolled up
    d1 = got[got["grouping_id"] == 2].sort_values("a").reset_index(drop=True)
    e1 = df.groupby("a", as_index=False)["v"].sum()
    assert list(d1["total"]) == list(e1["v"])
    # grand total
    d2 = got[got["grouping_id"] == 3]
    assert len(d2) == 1 and d2["total"].iloc[0] == df["v"].sum()


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(1, 4))
def test_nth_value_matches_pandas(ray_session, data, n):
    from dedupe_examples_ray.windows import nth_value

    rows = data.draw(st.integers(1, 80))
    df = pd.DataFrame({
        "k": data.draw(st.lists(st.integers(0, 5), min_size=rows, max_size=rows)),
        "v": np.arange(rows, dtype=np.float64) * 3,
    })
    df["o"] = np.arange(rows)  # unique order col -> deterministic
    got = (nth_value(rd.from_pandas(df).repartition(4), "k", ["o"], "v", n)
           .to_pandas().sort_values("o").reset_index(drop=True))
    exp = df.sort_values(["k", "o"]).groupby("k")["v"].transform(
        lambda s: s.iloc[n - 1] if len(s) >= n else np.nan)
    exp = exp.reindex(df.sort_values("o").index)
    g = got.set_index("o")["nth_val"]
    for o, want in zip(df["o"], exp):
        have = g.loc[o]
        assert (pd.isna(have) and pd.isna(want)) or have == want


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_paragraph_dedup_matches_reference(ray_session, data):
    from dedupe_examples_ray.ops import paragraph_dedup

    k = 3
    n_docs = data.draw(st.integers(1, 25))
    texts = data.draw(st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3"]), min_size=0, max_size=12)
        .map(" ".join),
        min_size=n_docs, max_size=n_docs))
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    got = (paragraph_dedup(rd.from_pandas(df).repartition(3), words_per_para=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # pure-python reference
    seen, keep = set(), {}
    for did, text in zip(df["doc_id"], df["text"]):
        words = text.split(" ")
        paras = [" ".join(words[i:i + k]) for i in range(0, len(words), k)]
        kept = [p for p in paras if p not in seen and not seen.add(p)]
        if kept:
            keep[did] = (" ".join(kept), len(kept), len(paras))
    assert list(got["doc_id"]) == list(keep)
    for _, r in got.iterrows():
        text, nk, nt = keep[r["doc_id"]]
        assert (r["text"], r["n_paras_kept"], r["n_paras_total"]) == (text, nk, nt)
