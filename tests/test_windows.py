"""Unit tests for windowed/ordered operators (windows.py) and the new
relational extensions (stats, quantiles, range join, set ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from dedupe_examples_ray.relational import (
    except_distinct,
    grouped_quantile,
    grouped_stats,
    intersect_distinct,
    range_join_broadcast,
)
from dedupe_examples_ray.windows import (
    asof_join,
    grouped_top_n,
    running_sum,
    sessionize,
    tumbling_window,
)


def _ts(*secs):
    return pd.to_datetime(np.asarray(secs, dtype="int64") * 1_000_000, unit="us", utc=False)


def _events(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_s", "value"])
    tbl = pa.table(
        {
            "event_id": pa.array(df.event_id, pa.int64()),
            "user_id": pa.array(df.user_id, pa.int64()),
            "ts": pa.array(
                (df.ts_s.to_numpy(dtype=np.int64) * 1_000_000), pa.timestamp("us")
            ),
            "value": pa.array(df.value, pa.float64()),
        }
    )
    return rd.from_arrow(tbl)


def test_sessionize_gap_semantics():
    # user 1: gaps 100s, 2000s (new session), exactly 1800s (same session)
    ds = _events(
        [
            (1, 1, 1000, 0.0),
            (2, 1, 1100, 0.0),
            (3, 1, 3100, 0.0),
            (4, 1, 4900, 0.0),  # gap exactly 1800 -> same session (strict >)
            (5, 2, 50, 0.0),
        ]
    )
    out = (
        sessionize(ds, gap_s=1800.0)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out.session_id.tolist() == [1, 1, 2, 2, 1]
    assert out.session_id.dtype == np.int64


def test_tumbling_window_alignment():
    # 6h windows are epoch-aligned: 0..21599 -> win 0, 21600 -> next
    ds = _events(
        [(1, 1, 0, 1.0), (2, 1, 21599, 2.0), (3, 1, 21600, 4.0), (4, 1, 43200, 8.0)]
    )
    out = (
        tumbling_window(ds, "ts", ["user_id"], {"value": "sum_value"}, multiple=6,
                        unit="hour", count_col="n")
        .to_pandas()
        .sort_values("win")
        .reset_index(drop=True)
    )
    assert out.sum_value.tolist() == [3.0, 4.0, 8.0]
    assert out.n.tolist() == [2, 1, 1]
    assert out.win.tolist() == list(_ts(0, 21600, 43200))


def test_running_sum_order():
    df = pd.DataFrame(
        {"k": [1, 1, 1, 2], "o": [3, 1, 2, 1], "v": [10.0, 1.0, 100.0, 5.0]}
    )
    ds = rd.from_pandas(df)
    out = (
        running_sum(ds, "k", ["o"], "v", round_digits=4)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert out.running_total.tolist() == [1.0, 101.0, 111.0, 5.0]


def test_grouped_top_n_prunes_and_ranks():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 500),
            "id": np.arange(500, dtype=np.int64),
            "v": rng.random(500),
        }
    )
    ds = rd.from_pandas(df).repartition(7)  # force multi-batch combiner path
    out = grouped_top_n(ds, ["k"], by="v", n=3, tie_cols=["id"]).to_pandas()
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k", sort=False)
        .head(3)
    )
    got = out.sort_values(["k", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "v"], ascending=[True, False]).reset_index(drop=True)
    assert got.id.tolist() == exp.id.tolist()
    assert got[got.k == 0]["rank"].tolist() == [1, 2, 3]


def test_asof_join_inner_and_left():
    left = _events([(10, 1, 1000, 0.0), (11, 1, 2000, 0.0), (12, 2, 500, 0.0)])
    right = _events([(90, 1, 900, 0.0), (91, 1, 1500, 0.0), (92, 3, 1, 0.0)])
    inner = (
        asof_join(left, right, "user_id", "ts", "event_id", "event_id",
                  out_right_id="m", how="inner")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # 10 -> 90 (900 <= 1000), 11 -> 91 (1500 <= 2000), 12 -> no purchase for user 2
    assert inner.event_id.tolist() == [10, 11]
    assert inner.m.tolist() == [90, 91]
    left_out = (
        asof_join(left, right, "user_id", "ts", "event_id", "event_id",
                  out_right_id="m", how="left")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert left_out.event_id.tolist() == [10, 11, 12]
    assert left_out.m.tolist()[:2] == [90, 91]
    assert pd.isna(left_out.m.iloc[2])


def test_asof_join_tie_breaks_to_max_id():
    left = _events([(10, 1, 1000, 0.0)])
    right = _events([(90, 1, 1000, 0.0), (95, 1, 1000, 0.0)])
    out = asof_join(left, right, "user_id", "ts", "event_id", "event_id",
                    out_right_id="m").to_pandas()
    assert out.m.tolist() == [95]  # equal ts: largest right id, deterministic


def test_grouped_stats_matches_pandas():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"k": rng.integers(0, 3, 400), "v": rng.random(400) * 100})
    out = (
        grouped_stats(rd.from_pandas(df).repartition(5), ["k"], "v", prefix="v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k")["v"].agg(["mean", "min", "max", "count"]).reset_index()
    assert np.allclose(out.avg_v, exp["mean"].round(4), atol=1e-4)
    assert np.allclose(out.min_v, exp["min"].round(4), atol=1e-4)
    assert np.allclose(out.max_v, exp["max"].round(4), atol=1e-4)
    assert out.n.tolist() == exp["count"].tolist()


def test_grouped_quantile_linear_interpolation():
    df = pd.DataFrame({"k": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 10.0]})
    out = grouped_quantile(rd.from_pandas(df), ["k"], "v", {"p50": 0.5, "p90": 0.9}).to_pandas()
    assert out.p50.tolist() == [3.0]
    assert out.p90.tolist() == [pytest.approx(7.6)]  # linear between 4 and 10


def test_range_join_disjoint_and_overlapping():
    df = pd.DataFrame({"id": [1, 2, 3, 4], "v": [5.0, 15.0, 25.0, 99.0]})
    ds = rd.from_pandas(df)
    iv = pd.DataFrame({"band": ["lo", "mid"], "lo": [0.0, 10.0], "hi": [10.0, 30.0]})
    out = range_join_broadcast(ds, iv, "v").to_pandas().sort_values("id")
    assert out.id.tolist() == [1, 2, 3]  # 99 matches nothing (inner)
    assert out.band.tolist() == ["lo", "mid", "mid"]
    # overlapping intervals -> mask fallback, row can match twice
    iv2 = pd.DataFrame({"band": ["a", "b"], "lo": [0.0, 0.0], "hi": [20.0, 30.0]})
    out2 = range_join_broadcast(ds, iv2, "v").to_pandas()
    assert sorted(out2[out2.id == 1].band.tolist()) == ["a", "b"]


def test_set_ops_distinct_semantics():
    a = rd.from_pandas(pd.DataFrame({"x": ["p", "p", "q", "r"]}))
    b = rd.from_pandas(pd.DataFrame({"x": ["q", "s"]}))
    ex = except_distinct(a, b, ["x"]).to_pandas()
    assert sorted(ex.x.tolist()) == ["p", "r"]
    it = intersect_distinct(a, b, ["x"]).to_pandas()
    assert it.x.tolist() == ["q"]


def test_grouped_zscore_matches_pandas():
    from dedupe_examples_ray.relational import grouped_zscore

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 4, 500), "v": rng.random(500) * 50})
    out = (
        grouped_zscore(rd.from_pandas(df).repartition(6), ["k"], "v")
        .to_pandas()
        .sort_index()
    )
    mu = df.groupby("k")["v"].transform("mean")
    sd = df.groupby("k")["v"].transform(lambda s: s.std(ddof=0))
    exp = ((df["v"] - mu) / sd).round(6)
    assert np.allclose(out["z"].to_numpy(), exp.to_numpy(), atol=2e-6)
    # z-scores are standardized: per-group mean ~0, pop-std ~1
    g = out.groupby("k")["z"]
    assert np.allclose(g.mean(), 0.0, atol=1e-5)
    assert np.allclose(g.std(ddof=0), 1.0, atol=1e-4)


def test_grouped_zscore_zero_variance_and_nulls():
    from dedupe_examples_ray.relational import grouped_zscore

    df = pd.DataFrame(
        {"k": ["a", "a", "b", "b", "c"], "v": [5.0, 5.0, 1.0, 3.0, None]}
    )
    out = grouped_zscore(rd.from_pandas(df), ["k"], "v").to_pandas()
    by_k = {k: g["z"].tolist() for k, g in out.groupby("k", dropna=False)}
    assert all(pd.isna(z) for z in by_k["a"])  # zero variance -> NULL
    assert by_k["b"] == [-1.0, 1.0]
    assert all(pd.isna(z) for z in by_k["c"])  # all-null group -> NULL


def test_pivot_sum_wide_reshape():
    from dedupe_examples_ray.relational import pivot_sum

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 3, 3],
            "t": ["a", "a", "b", "b", "zzz", "zzz", "a"],
            "v": [1.0, 2.0, 5.0, 7.0, 100.0, 100.0, None],
        }
    )
    out = (
        pivot_sum(rd.from_pandas(df).repartition(4), ["u"], "t", "v", ["a", "b"])
        .to_pandas()
        .sort_values("u")
        .set_index("u")
    )
    assert out.loc[1, "a"] == 3.0 and out.loc[1, "b"] == 5.0
    assert out.loc[2, "a"] == 0.0 and out.loc[2, "b"] == 7.0  # absent kind -> 0
    # key 3: only out-of-domain or null values -> a=0 (null sum), present via 'a' null row
    assert out.loc[3, "a"] == 0.0 and out.loc[3, "b"] == 0.0
    assert list(out.columns) == ["a", "b"]


def test_global_quantile_exact(ray_session):
    """Distributed selection matches numpy/quantile_cont exactly, including
    with a tiny collect budget that forces several refinement rounds."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import global_quantile

    rng = np.random.default_rng(11)
    # mixed distribution + duplicates + NaN to exclude
    v = np.concatenate([
        rng.normal(100, 15, 4000),
        rng.exponential(5, 3000),
        np.repeat(42.5, 800),
        [np.nan] * 50,
    ])
    ds = rd.from_arrow(pa.table({"x": v})).repartition(8)
    qs = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    got = global_quantile(ds, "x", qs, round_digits=6,
                          bins=8, collect_budget=64)  # force many rounds
    clean = v[~np.isnan(v)]
    for name, q in qs.items():
        exp = float(np.percentile(clean, q * 100.0, method="linear"))
        assert got[name][0] == pytest.approx(round(exp, 6), abs=2e-6), name

    # degenerate cases: constant column, single row
    c = rd.from_arrow(pa.table({"x": np.repeat(7.0, 500)}))
    assert global_quantile(c, "x", {"p50": 0.5})["p50"][0] == 7.0
    one = rd.from_arrow(pa.table({"x": [3.25]}))
    assert global_quantile(one, "x", {"p90": 0.9})["p90"][0] == 3.25


def test_approx_ndistinct_hll(ray_session):
    """Mergeable HLL sketch: estimate within the published error bound."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import approx_ndistinct

    rng = np.random.default_rng(5)
    # 50k distinct ids, each repeated 1-4 times, shuffled across 16 blocks
    ids = np.repeat(np.arange(50_000), rng.integers(1, 5, 50_000))
    rng.shuffle(ids)
    ds = rd.from_arrow(pa.table({"uid": ids.astype(str)})).repartition(16)
    got = approx_ndistinct(ds, "uid", precision=12)
    rel_err = abs(got["estimate"] - 50_000) / 50_000
    assert rel_err <= 3 * got["error_bound"], (got, rel_err)

    # small-cardinality regime (linear counting) + determinism
    small = rd.from_arrow(pa.table({"uid": [str(i % 150) for i in range(3000)]}))
    a = approx_ndistinct(small, "uid")
    b = approx_ndistinct(small, "uid")
    assert a["estimate"] == b["estimate"]  # deterministic hash -> stable sketch
    assert abs(a["estimate"] - 150) / 150 <= 3 * a["error_bound"]

    # round-2 advice: NULLs are not distinct values (COUNT(DISTINCT)
    # semantics) — a null-bearing column sketches identically to its
    # null-free projection
    with_nulls = rd.from_arrow(
        pa.table({"uid": ([str(i % 150) for i in range(3000)] + [None] * 500)})
    )
    c = approx_ndistinct(with_nulls, "uid")
    assert c["estimate"] == a["estimate"]


def test_hash_join_inner_and_left(ray_session):
    """Big-big cogroup join matches a pandas merge, incl. null keys and
    differing key names."""
    from dedupe_examples_ray.relational import hash_join

    rng = np.random.default_rng(11)
    n_a, n_b = 5000, 1200
    ka = rng.integers(0, 800, n_a).astype("float64")
    ka[rng.choice(n_a, 50, replace=False)] = np.nan  # null join keys
    a = pd.DataFrame({"k": pd.array(ka, dtype="Int64"), "a_val": np.arange(n_a)})
    b = pd.DataFrame({"bk": rng.integers(0, 1000, n_b), "b_val": np.arange(n_b) * 10})
    b = b.drop_duplicates("bk")
    ds_a = rd.from_pandas(a).repartition(7)
    ds_b = rd.from_pandas(b).repartition(3)

    got = hash_join(ds_a, ds_b, on="k", right_on="bk", num_buckets=16).to_pandas()
    exp = a.merge(b.rename(columns={"bk": "k"}), on="k", how="inner")
    key = ["k", "a_val", "b_val"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key].astype("float64"),
        exp.sort_values(key).reset_index(drop=True)[key].astype("float64"),
    )

    got_l = hash_join(ds_a, ds_b, on="k", right_on="bk", how="left",
                      num_buckets=16).to_pandas()
    exp_l = a.merge(b.rename(columns={"bk": "k"}), on="k", how="left")
    assert len(got_l) == len(exp_l)
    # null keys preserved with b-side nulls under left join
    assert got_l[got_l["k"].isna()]["b_val"].isna().all()
    assert got_l["k"].isna().sum() == 50
    pd.testing.assert_frame_equal(
        got_l.sort_values(key).reset_index(drop=True)[key].astype("float64"),
        exp_l.sort_values(key).reset_index(drop=True)[key].astype("float64"),
    )


def test_hash_join_empty_and_clash(ray_session):
    from dedupe_examples_ray.relational import hash_join

    a = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                "a_val": pa.array([], pa.int64())}))
    b = rd.from_arrow(pa.table({"k": [1, 2], "b_val": [10, 20]}))
    assert hash_join(a, b, on="k").count() == 0
    with pytest.raises(ValueError):
        hash_join(b, b, on="k")  # non-key name clash (b_val on both sides)


def test_frequent_items_misra_gries(ray_session):
    """MG sketch + exact pass == exact HAVING count*(cap+1) > total, on a
    skewed stream with far more distinct values than sketch capacity."""
    from dedupe_examples_ray.relational import frequent_items

    rng = np.random.default_rng(3)
    # 3 heavy items (~20% / 15% / 10%) + 5000 rare distinct values + nulls
    heavy = np.array(["alpha"] * 4000 + ["beta"] * 3000 + ["gamma"] * 2000)
    rare = np.array([f"tail_{i}" for i in rng.integers(0, 5000, 11000)])
    vals = np.concatenate([heavy, rare]).astype(object)
    rng.shuffle(vals)
    vals[rng.choice(len(vals), 100, replace=False)] = None
    ds = rd.from_arrow(pa.table({"k": pa.array(list(vals), pa.string())})).repartition(13)

    got = frequent_items(ds, "k", capacity=8)
    exp = (
        pd.Series([v for v in vals if v is not None])
        .value_counts()
        .pipe(lambda s: s[s * 9 > s.sum()])
        .sort_index()
    )
    assert list(got["k"]) == list(exp.index)
    assert list(got["n"]) == list(exp.to_numpy())

    # empty input
    e = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    assert len(frequent_items(e, "k")) == 0


def test_hash_sample_deterministic(ray_session):
    """Value-keyed sampling: same rows on every run / partitioning; md5 path
    matches an independent hashlib computation; stable path is repartition-
    invariant; nulls are excluded (SQL predicate semantics)."""
    import hashlib

    from dedupe_examples_ray.relational import hash_sample

    ids = list(range(2000)) + [None]
    t = pa.table({"id": pa.array(ids, pa.int64()), "v": list(range(2001))})
    ds = rd.from_arrow(t)

    got = sorted(hash_sample(ds, "id", pct=10, method="md5").to_pandas()["id"])
    exp = sorted(
        i for i in range(2000)
        if int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little") % 100 < 10
    )
    assert got == exp
    assert 100 < len(got) < 350  # ~10%

    a = sorted(hash_sample(ds, "id", pct=25).to_pandas()["id"])
    b = sorted(hash_sample(ds.repartition(9), "id", pct=25).to_pandas()["id"])
    assert a == b and len(a) > 0
    assert None not in a


def test_hash_join_semi_anti(ray_session):
    """semi == EXISTS (nulls dropped), anti == NOT EXISTS (nulls kept)."""
    from dedupe_examples_ray.relational import hash_join

    a = pd.DataFrame({"k": pd.array([1, 2, 3, 4, None], dtype="Int64"),
                      "v": [10, 20, 30, 40, 50]})
    b = pd.DataFrame({"bk": [2, 2, 4, 9, 9]})
    ds_a, ds_b = rd.from_pandas(a).repartition(3), rd.from_pandas(b).repartition(2)

    semi = hash_join(ds_a, ds_b, on="k", right_on="bk", how="semi",
                     num_buckets=8).to_pandas()
    assert sorted(semi["v"]) == [20, 40]
    anti = hash_join(ds_a, ds_b, on="k", right_on="bk", how="anti",
                     num_buckets=8).to_pandas()
    assert sorted(anti["v"]) == [10, 30, 50]  # null-key row kept (NOT EXISTS)

    # b empty: semi -> none, anti -> everything
    eb = rd.from_arrow(pa.table({"bk": pa.array([], pa.int64())}))
    assert hash_join(ds_a, eb, on="k", right_on="bk", how="semi").count() == 0
    assert hash_join(ds_a, eb, on="k", right_on="bk", how="anti").count() == 5


def test_grouped_collect_string_agg(ray_session):
    from dedupe_examples_ray.relational import grouped_collect

    t = pa.table({"g": [1, 1, 2, 2, 2, 1], "x": ["b", "a", "z", None, "m", "c"]})
    got = grouped_collect(rd.from_arrow(t).repartition(4), ["g"], "x",
                          out_col="xs").to_pandas().sort_values("g")
    assert list(got["xs"]) == ["a,b,c", "m,z"]

    # native-order sort for non-string columns (2 < 10 numerically)
    t2 = pa.table({"g": [1, 1], "x": [10, 2]})
    got2 = grouped_collect(rd.from_arrow(t2), ["g"], "x").to_pandas()
    assert list(got2["items"]) == ["2,10"]


def test_moving_avg(ray_session):
    from dedupe_examples_ray.windows import moving_avg

    t = pa.table({
        "k": ["a"] * 5 + ["b"] * 3,
        "o": [1, 2, 3, 4, 5, 1, 2, 3],
        "v": [10.0, 20.0, 30.0, 40.0, 50.0, 1.0, 2.0, 3.0],
    })
    out = moving_avg(rd.from_arrow(t).repartition(4), "k", ["o"], "v", window=3,
                     round_digits=4).to_pandas().sort_values(["k", "o"])
    assert list(out["mavg"]) == [10.0, 15.0, 20.0, 30.0, 40.0, 1.0, 1.5, 2.0]


def test_global_rank(ray_session):
    """Distributed RANK/ROW_NUMBER == pandas reference, incl. ties and nulls."""
    from dedupe_examples_ray.windows import global_rank

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 300, 4000).astype("float64")  # heavy ties
    vals[rng.choice(4000, 40, replace=False)] = np.nan
    ids = np.arange(4000)
    ds = rd.from_arrow(pa.table({"id": ids, "v": vals})).repartition(11)

    got = global_rank(ds, by="v", ascending=True, mode="rank",
                      out_col="rnk").to_pandas().sort_values("id")
    s = pd.Series(vals)
    exp = s.rank(method="min", na_option="bottom").astype("int64")
    # SQL RANK: nulls rank last and are EQUAL (share one rank)
    assert np.array_equal(got.sort_values("id")["rnk"].to_numpy(), exp.to_numpy())

    got_rn = global_rank(ds, by="v", ascending=False, mode="row_number",
                         tie_cols=["id"], out_col="rn").to_pandas().sort_values("id")
    exp_rn = (
        pd.DataFrame({"id": ids, "v": vals})
        .sort_values(["v", "id"], ascending=[False, True], na_position="last")
        .assign(rn=np.arange(1, 4001))
        .sort_values("id")["rn"]
        .to_numpy()
    )
    assert np.array_equal(got_rn["rn"].to_numpy(), exp_rn)

    with pytest.raises(ValueError):
        global_rank(ds, by="v", mode="row_number")  # no tie_cols


def test_grouped_corr(ray_session):
    from dedupe_examples_ray.relational import grouped_corr

    rng = np.random.default_rng(23)
    x = rng.standard_normal(3000)
    noise = rng.standard_normal(3000)
    t = pa.table({
        "g": (["a"] * 1500) + (["b"] * 1500),
        "x": x,
        # group a: strong positive corr; group b: ~independent
        "y": np.concatenate([x[:1500] * 2 + noise[:1500] * 0.1, noise[1500:]]),
    })
    got = grouped_corr(rd.from_arrow(t).repartition(7), ["g"], "x", "y",
                       round_digits=None).to_pandas().set_index("g")["corr_xy"]
    df = t.to_pandas()
    exp = df.groupby("g").apply(lambda d: d["x"].corr(d["y"]))
    assert abs(got["a"] - exp["a"]) < 1e-9 and got["a"] > 0.99
    assert abs(got["b"] - exp["b"]) < 1e-9

    # nulls excluded pairwise; zero-variance group -> NaN
    t2 = pa.table({"g": ["c"] * 4 + ["z"] * 3,
                   "x": [1.0, 2.0, None, 4.0, 5.0, 5.0, 5.0],
                   "y": [2.0, 4.0, 6.0, None, 1.0, 2.0, 3.0]})
    got2 = grouped_corr(rd.from_arrow(t2), ["g"], "x", "y",
                        round_digits=4).to_pandas().set_index("g")["corr_xy"]
    assert got2["c"] == 1.0
    assert np.isnan(got2["z"])


def test_key_skew_report(ray_session):
    from dedupe_examples_ray.relational import key_skew_report

    t = pa.table({"k": ["hot"] * 90 + [f"u{i}" for i in range(10)]})
    got = key_skew_report(rd.from_arrow(t).repartition(6), "k")
    assert got["n_keys"][0] == 11 and got["max_n"][0] == 90
    assert got["p50"][0] == 1.0
    # mean group = 100/11; skew = 90 / (100/11) = 9.9
    assert abs(got["skew"][0] - 9.9) < 1e-9


def test_winsorize(ray_session):
    from dedupe_examples_ray.relational import winsorize

    vals = np.concatenate([np.arange(1, 100, dtype=np.float64), [1e9, -1e9]])
    ds = rd.from_arrow(pa.table({"id": np.arange(101), "x": vals})).repartition(5)
    out = winsorize(ds, "x", 0.05, 0.95, out_col="xw").to_pandas()
    assert out["xw"].max() < 1e9 and out["xw"].min() > -1e9
    # interior values untouched
    mid = out[(out["x"] > 10) & (out["x"] < 90)]
    assert (mid["xw"] == mid["x"]).all()


def test_explode_split(ray_session):
    from dedupe_examples_ray.relational import explode_split

    t = pa.table({"id": [1, 2, 3], "s": ["a b c", "x", None]})
    out = explode_split(rd.from_arrow(t).repartition(2), ["id"], "s").to_pandas()
    got = sorted(zip(out["id"], out["tok"]))
    assert got == [(1, "a"), (1, "b"), (1, "c"), (2, "x")]  # NULL -> 0 rows


def test_window_ops_null_partition_key(ray_session):
    """Round-2 advice: NULL keys form ONE partition (SQL PARTITION BY),
    instead of crashing (moving_avg) or yielding NULL accumulators
    (running_sum / sessionize / grouped_top_n)."""
    import pandas as pd

    from dedupe_examples_ray.windows import (
        grouped_top_n,
        moving_avg,
        running_sum,
        sessionize,
    )

    t = pa.table(
        {
            "id": np.arange(6),
            "k": ["a", None, "a", None, "b", None],
            "x": [1.0, 10.0, 2.0, 20.0, 5.0, 30.0],
        }
    )
    ds = rd.from_arrow(t).repartition(2)

    rs = running_sum(ds, "k", ["id"], "x").to_pandas().sort_values("id")
    null_rows = rs[rs["k"].isna()].sort_values("id")
    assert list(null_rows["running_total"]) == [10.0, 30.0, 60.0]

    ma = moving_avg(ds, "k", ["id"], "x", window=2).to_pandas().sort_values("id")
    null_ma = ma[ma["k"].isna()].sort_values("id")
    assert list(null_ma["mavg"]) == [10.0, 15.0, 25.0]

    tn = grouped_top_n(ds, ["k"], "x", 1).to_pandas()
    assert len(tn) == 3  # a, b, and the NULL partition each contribute one
    assert 30.0 in set(tn["x"])

    ev = pa.table(
        {
            "event_id": [f"e{i}" for i in range(4)],
            "user_id": [None, None, "u", None],
            "ts": pa.array(
                pd.to_datetime(
                    ["2026-01-01 00:00", "2026-01-01 00:10", "2026-01-01 00:20",
                     "2026-01-01 12:00"]
                )
            ),
        }
    )
    se = sessionize(rd.from_arrow(ev), gap_s=1800).to_pandas()
    by_id = se.set_index("event_id")["session_id"]
    assert by_id["e0"] == 1 and by_id["e1"] == 1  # same null partition, small gap
    assert by_id["e3"] == 2  # 11h+ gap starts session 2 within the null partition
    assert by_id["e2"] == 1


def test_global_dense_rank(ray_session):
    """DENSE_RANK parity incl. ties and NULLs (one shared dense value, last)."""
    from dedupe_examples_ray.windows import global_rank

    vals = [5.0, 5.0, 3.0, 3.0, 3.0, 9.0, None, None, 1.0]
    t = pa.table({"id": np.arange(len(vals)), "x": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(3)
    out = (
        global_rank(ds, by="x", ascending=True, mode="dense_rank", out_col="d")
        .to_pandas().set_index("id")["d"]
    )
    # expected dense ranks ASC NULLS LAST: 1->1, 3->2, 5->3, 9->4, NULL->5
    exp = {0: 3, 1: 3, 2: 2, 3: 2, 4: 2, 5: 4, 6: 5, 7: 5, 8: 1}
    assert out.to_dict() == exp

    big = rd.from_arrow(
        pa.table({"id": np.arange(5000), "x": (np.arange(5000) % 37).astype(np.float64)})
    ).repartition(8)
    got = global_rank(big, by="x", ascending=True, mode="dense_rank", out_col="d").to_pandas()
    assert int(got["d"].max()) == 37
    merged = got.groupby("x")["d"].nunique()
    assert (merged == 1).all()  # equal keys share one dense value
    # dense ranks are 1..37 with no gaps
    assert sorted(got["d"].unique()) == list(range(1, 38))


def test_lag_lead_and_null_keys(ray_session):
    from dedupe_examples_ray.windows import lag_lead

    t = pa.table(
        {
            "id": np.arange(6),
            "k": ["a", "a", "a", None, None, "b"],
            "o": [1, 2, 3, 1, 2, 1],
            "v": [10.0, 20.0, 30.0, 5.0, 6.0, 7.0],
        }
    )
    out = (
        lag_lead(rd.from_arrow(t).repartition(2), "k", ["o"], "v")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert out["lag_1"].tolist()[:3] == [None, 10.0, 20.0] or (
        pd.isna(out["lag_1"].iloc[0]) and out["lag_1"].tolist()[1:3] == [10.0, 20.0]
    )
    assert pd.isna(out["lead_1"].iloc[2])
    # null keys are one partition
    assert pd.isna(out["lag_1"].iloc[3]) and out["lag_1"].iloc[4] == 5.0
    assert out["lead_1"].iloc[3] == 6.0


def test_percent_rank_and_ntile(ray_session):
    from dedupe_examples_ray.windows import ntile, percent_rank

    vals = np.arange(100, dtype=np.float64)
    rng = np.random.default_rng(9)
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"id": np.arange(100), "x": vals})).repartition(4)

    pr = percent_rank(ds, by="x").to_pandas()
    m = pr.set_index("x")["prnk"]
    assert m[0.0] == 0.0 and m[99.0] == 1.0
    assert abs(m[50.0] - 50 / 99) < 1e-6

    nt = ntile(ds, by="x", n=7, tie_cols=["id"]).to_pandas()
    sizes = nt.groupby("tile").size()
    # 100 = 7*14 + 2 -> first 2 tiles get 15, rest 14
    assert sizes.loc[1] == 15 and sizes.loc[2] == 15 and sizes.loc[7] == 14
    assert nt.sort_values("x")["tile"].is_monotonic_increasing

def test_cume_dist(ray_session):
    """CUME_DIST matches pandas rank(method='max')/n, ties and nulls included."""
    from dedupe_examples_ray.windows import cume_dist

    rng = np.random.default_rng(11)
    x = rng.integers(0, 20, 300).astype(np.float64)  # heavy ties
    x[::37] = np.nan  # NULLs rank last, cume = 1.0
    ds = rd.from_arrow(
        pa.table({"id": np.arange(300), "x": x})
    ).repartition(5)
    got = cume_dist(ds, by="x", round_digits=None).to_pandas().set_index("id")["cd"]
    s = pd.Series(x)
    # SQL NULLS LAST: count of rows with key <= current, nulls all tied at n
    exp = s.rank(method="max", na_option="bottom") / len(s)
    for i in range(300):
        assert abs(got[i] - exp[i]) < 1e-9, (i, x[i], got[i], exp[i])

def test_first_last_value(ray_session):
    """FIRST_VALUE/LAST_VALUE over the full partition, incl. NULL partition
    keys (one partition) and NULL values (positional, not NaN-skipping)."""
    from dedupe_examples_ray.windows import first_last_value

    df = pd.DataFrame({
        "k": ["a", "a", "a", None, None, "b"],
        "o": [1, 2, 3, 1, 2, 1],
        "v": [None, 20.0, 30.0, 5.0, 6.0, 7.0],
    })
    out = (first_last_value(rd.from_pandas(df).repartition(3), "k", ["o"], "v")
           .to_pandas().sort_values(["k", "o"], na_position="last").reset_index(drop=True))
    a = out[out["k"] == "a"]
    # SQL FIRST_VALUE takes the first ROW's value even when it is NULL
    assert a["first_val"].isna().all()
    assert (a["last_val"] == 30.0).all()
    nk = out[out["k"].isna()]
    assert (nk["first_val"] == 5.0).all() and (nk["last_val"] == 6.0).all()
    b = out[out["k"] == "b"]
    assert (b["first_val"] == 7.0).all() and (b["last_val"] == 7.0).all()


def test_hopping_window_replication(ray_session):
    """Each event lands in exactly width/hop windows; the window set covers
    the event and only windows containing it."""
    import ray.data as rd
    import pyarrow as pa

    from dedupe_examples_ray.windows import hopping_window

    ts = pd.to_datetime(["2024-01-01 05:00", "2024-01-01 13:30"])
    df = pd.DataFrame({"k": ["a", "a"], "ts": ts, "v": [1.0, 10.0]})
    out = (hopping_window(rd.from_pandas(df), "ts", ["k"], {"v": "total"},
                          width_multiple=12, hop_multiple=6, count_col="n")
           .to_pandas().sort_values("win").reset_index(drop=True))
    # event at 05:00 -> windows starting 00:00 and 2023-12-31 18:00
    # event at 13:30 -> windows starting 12:00 and 06:00
    starts = pd.to_datetime(out["win"]).dt.strftime("%Y-%m-%d %H:%M").tolist()
    assert starts == ["2023-12-31 18:00", "2024-01-01 00:00",
                      "2024-01-01 06:00", "2024-01-01 12:00"]
    assert list(out["total"]) == [1.0, 1.0, 10.0, 10.0]
    assert list(out["n"]) == [1, 1, 1, 1]


def test_hopping_window_rejects_bad_hop(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.windows import hopping_window

    df = pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "v": [1.0]})
    import pytest

    with pytest.raises(ValueError):
        hopping_window(rd.from_pandas(df), "ts", ["k"], {"v": "t"},
                       width_multiple=10, hop_multiple=4)


def test_trailing_interval_agg_semantics(ray_session):
    from dedupe_examples_ray.windows import trailing_interval_agg

    # user 1: events at t=0, 50, 120 (window 100s); t=120 frame = [20,120]
    # -> excludes t=0.  Tie peers: user 2 has two events at t=10, both in
    # each other's frame.  NULL value excluded from sum, counted by n.
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "ts": pa.array(np.array([0, 50, 120, 10, 10, 200]) * 1_000_000,
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, None], pa.float64()),
    })
    out = (trailing_interval_agg(rd.from_arrow(tbl), "user_id", "ts",
                                 "value", 100.0)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out["trail_sum"].tolist()[:5] == [1.0, 3.0, 6.0, 24.0, 24.0]
    assert np.isnan(out["trail_sum"].iloc[5])  # all-NULL frame
    assert out["trail_n"].tolist() == [1, 2, 2, 2, 2, 1]


def test_funnel_steps_subsequence(ray_session):
    from dedupe_examples_ray.windows import funnel_steps

    # u1 completes A->B->C; u2 has B before A (B doesn't count until after
    # A) and no C; u3 ties: A and B at the same ts count (>=); u4 only A.
    rows = [
        (1, "A", 0), (1, "B", 10), (1, "C", 20),
        (2, "B", 0), (2, "A", 10),
        (3, "A", 5), (3, "B", 5),
        (4, "A", 1),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(np.array([r[2] for r in rows]) * 1_000_000,
                       pa.timestamp("us")),
    })
    out = funnel_steps(rd.from_arrow(tbl), "user_id", "ts", "event_type",
                       ["A", "B", "C"])
    assert out["n_keys"].tolist() == [4, 2, 1]
    assert out["event_type"].tolist() == ["A", "B", "C"]


def test_transition_counts_tie_order_and_partials(ray_session):
    from dedupe_examples_ray.windows import transition_counts

    # u1: A->B->B; u2: single event (no transitions); ties broken by id.
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 1], pa.int64()),
        "event_type": pa.array(["A", "B", "B", "A", "C"]),
        # event 5 shares ts with event 3: id order makes B->B then B->C
        "ts": pa.array(np.array([0, 10, 20, 0, 20]) * 1_000_000,
                       pa.timestamp("us")),
    })
    out = transition_counts(rd.from_arrow(tbl), "user_id", "ts",
                            "event_type", "event_id")
    got = {(r.prev_type, r.event_type): r.n for r in out.itertuples()}
    assert got == {("A", "B"): 1, ("B", "B"): 1, ("B", "C"): 1}


def test_cohort_retention_epoch_offsets(ray_session):
    from dedupe_examples_ray.windows import cohort_retention

    # 2024-01-03 is a Wednesday -> cohort week = Monday 2024-01-01.
    # u1: first event Wed 12:00; second event 6 days later (offset 0,
    # epoch math: <7*86400s), third 8 days later (offset 1).
    # u2: first event same Wednesday -> same cohort, only offset 0.
    base = pd.Timestamp("2024-01-03 12:00:00")
    rows = [
        (1, base), (1, base + pd.Timedelta(days=6)),
        (1, base + pd.Timedelta(days=8)),
        (2, base + pd.Timedelta(hours=1)),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.Series([r[1] for r in rows]).astype("datetime64[us]"),
                       pa.timestamp("us")),
    })
    out = cohort_retention(rd.from_arrow(tbl), "user_id", "ts")
    assert out["cohort_week"].nunique() == 1
    assert pd.Timestamp(out["cohort_week"].iloc[0]) == pd.Timestamp("2024-01-01")
    got = dict(zip(out.week_offset, out.n_keys))
    assert got == {0: 2, 1: 1}


def test_locf_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.windows import locf

    rng = np.random.default_rng(9)
    n = 500
    key = rng.integers(0, 20, n).astype("float64")
    key[rng.random(n) < 0.05] = np.nan  # null-key partition
    ts = rng.permutation(n)
    val = rng.normal(size=n)
    val[rng.random(n) < 0.4] = np.nan
    t = pa.table({"k": pa.array(key), "ts": pa.array(ts, pa.int64()),
                  "v": pa.array(val)})
    got = (locf(rd.from_arrow(t).repartition(5), key_col="k",
                order_cols=["ts"], val_col="v", out_col="f")
           .to_pandas().sort_values(["ts"]).reset_index(drop=True))
    df = pd.DataFrame({"k": key, "ts": ts, "v": val}).sort_values("ts")
    df["f"] = df.groupby("k", sort=False, dropna=False)["v"].ffill()
    exp = df.sort_values("ts").reset_index(drop=True)
    pd.testing.assert_series_equal(got["f"], exp["f"], check_names=False)


def test_grouped_approx_quantile_rank_bound(ray_session):
    """Every per-key sketch quantile must sit within the published rank
    bound of the key's exact quantile (checked by exact rank position)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_approx_quantile

    rng = np.random.default_rng(21)
    n, S = 20_000, 64
    key = rng.integers(0, 5, n)
    val = rng.lognormal(size=n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(key, pa.int64()), "v": pa.array(val)})).repartition(11)
    out = grouped_approx_quantile(ds, "k", "v", {"p50": 0.5, "p99": 0.99},
                                  sample_per_batch=S).to_pandas()
    assert len(out) == 5
    eps = 2 * (1.0 / (2 * S))
    for _, r in out.iterrows():
        vk = np.sort(val[key == int(r["k"])])
        assert abs(r["n"] - len(vk)) < 1e-6
        for name, q in (("p50", 0.5), ("p99", 0.99)):
            # exact rank of the sketch value inside the key's sorted data
            rank = np.searchsorted(vk, r[name], side="right") / len(vk)
            assert abs(rank - q) <= eps + 2.0 / len(vk), (r["k"], name, rank)


def test_resample_locf(ray_session):
    """LOCF grid resampling: carried values, NULL before first obs,
    duplicate-ts collapse by MAX, every key x instant present."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.windows import resample_locf

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 2],
        "ts": pd.to_datetime([
            "2024-01-02 00:00:00", "2024-01-05 06:00:00",
            "2024-01-05 06:00:00",           # duplicate ts -> MAX wins
            "2024-01-01 12:00:00",           # exactly on a grid instant
            "2024-01-03 18:00:00", "2024-01-20 00:00:00"]),
        "value": [10.0, 7.0, 9.0, 1.0, 2.0, 3.0],
    })
    out = resample_locf(
        rd.from_pandas(ev), start="2024-01-01 12:00:00",
        end="2024-01-06 12:00:00", step_hours=24,
    ).to_pandas().sort_values(["user_id", "gts"]).reset_index(drop=True)
    assert len(out) == 2 * 6
    u1 = out[out.user_id == 1]["value"].to_numpy()
    # day1: no obs yet -> NaN; days2-4: 10; days5-6: max(7,9)=9
    assert np.isnan(u1[0]) and (u1[1:4] == 10.0).all() and (u1[4:] == 9.0).all()
    u2 = out[out.user_id == 2]["value"].to_numpy()
    # grid-instant obs included (>= semantics): day1 = 1; the day-3 noon
    # instant precedes that day's 18:00 obs, so 2.0 starts at day 4
    assert (u2[:3] == 1.0).all() and (u2[3:] == 2.0).all()


def test_ewma_matches_pandas_and_closed_form(ray_session):
    """Recursive EWMA == pandas ewm(adjust=False) == the closed-form the SQL
    oracle uses; null keys form one partition; alpha validated."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from dedupe_examples_ray.windows import ewma

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 3 + [None] * 4,
        "o": list(range(5)) + list(range(3)) + list(range(4)),
        "v": rng.normal(10, 3, 12).round(3),
    })
    a = 0.3
    out = (ewma(rd.from_pandas(df).repartition(3), "k", ["o"], "v", alpha=a)
           .to_pandas().sort_values(["k", "o"], na_position="last")
           .reset_index(drop=True))

    def closed(xs):
        return [ (1-a)**i * xs[0] + sum(a*(1-a)**(i-j)*xs[j]
                                        for j in range(1, i+1))
                 for i in range(len(xs)) ]

    want = df.sort_values(["k", "o"], na_position="last").reset_index(drop=True)
    for key, g in want.groupby("k", dropna=False, sort=False):
        exp = closed(g["v"].tolist())
        got = out[out["k"].isna() if pd.isna(key) else (out["k"] == key)]
        assert np.allclose(got["ewma"].to_numpy(), exp, atol=1e-12), key

    with pytest.raises(ValueError, match="alpha"):
        ewma(rd.from_pandas(df), "k", ["o"], "v", alpha=0.0)


def test_moving_stat_median_std_null_keys(ray_session):
    import pandas as pd

    from dedupe_examples_ray.windows import moving_stat

    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", None, None],
        "o": [1, 2, 3, 4, 1, 2],
        "v": [10.0, 20.0, 40.0, 30.0, 5.0, 7.0],
    })
    import ray.data as rd

    out = moving_stat(rd.from_pandas(df), "k", ["o"], "v", window=3,
                      stat="median").to_pandas().sort_values(
        ["k", "o"], na_position="last").reset_index(drop=True)
    # a: [10], [10,20] -> 15 (even-frame midpoint), [10,20,40] -> 20,
    #    [20,40,30] -> 30; NULL key is its own partition: [5], [5,7] -> 6
    assert out["mmedian"].tolist() == [10.0, 15.0, 20.0, 30.0, 5.0, 6.0]
    std = moving_stat(rd.from_pandas(df), "k", ["o"], "v", window=2,
                      stat="std").to_pandas().sort_values(
        ["k", "o"], na_position="last").reset_index(drop=True)
    import numpy as np

    assert np.isnan(std["mstd"].iloc[0])  # 1-row frame -> NULL (ddof=1)
    assert round(std["mstd"].iloc[1], 6) == round(np.std([10, 20], ddof=1), 6)


def test_moving_stat_rejects_unknown(ray_session):
    import pytest as _pytest

    import ray.data as rd
    import pandas as pd

    from dedupe_examples_ray.windows import moving_stat

    with _pytest.raises(ValueError):
        moving_stat(rd.from_pandas(pd.DataFrame({"k": [1], "o": [1], "v": [1.0]})),
                    "k", ["o"], "v", 2, stat="mode")
