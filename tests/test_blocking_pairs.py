"""Unit tests: predicates, fingerprinter, pair generation, salting, metrics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedupe_examples_ray.blocking.corpus import (
    common_tokens_from_df,
    compute_token_df,
    idf_from_df,
)
from dedupe_examples_ray.blocking.fingerprint import Fingerprinter
from dedupe_examples_ray.blocking.predicates import emit_keys
from dedupe_examples_ray.config import Field, Settings
from dedupe_examples_ray.pairs import _emit_bucket


def _keys(kind, values, **kw):
    idx, keys = emit_keys(kind, pa.array(values), **kw)
    return list(zip(idx.tolist(), keys.to_pylist()))


def test_predicate_emitters():
    assert _keys("whole_field", ["ab", None, ""]) == [(0, "ab")]
    assert _keys("first_token", ["red fox", "solo"]) == [(0, "red"), (1, "solo")]
    assert set(_keys("token", ["a b a", None])) == {(0, "a"), (0, "b")}
    assert _keys("prefix", ["abcdef"], n=3) == [(0, "abc")]
    assert _keys("suffix", ["abcdef", "ab"], n=3) == [(0, "def"), (1, "ab")]
    assert set(_keys("ngram", ["abcd"], n=3)) == {(0, "abc"), (0, "bcd")}
    assert _keys("ngram", ["ab"], n=3) == [(0, "ab")]
    assert _keys("numeric_round", ["12.4", "x", None]) == [(0, "12")]
    idx, keys = emit_keys("set_element", pa.array([["x", "y"], None, []], pa.list_(pa.string())))
    assert list(zip(idx.tolist(), keys.to_pylist())) == [(0, "x"), (0, "y")]


def test_integer_family_predicates():
    # commonIntegerPredicate analog: every digit run, zero-canonicalized
    assert _keys("common_integer", ["123 Main Apt 4", "no digits", None, "007"]) == [
        (0, "123"), (0, "4"), (3, "7")]
    assert _keys("first_integer", ["123 Main Apt 4", "plain", "007 x 9"]) == [
        (0, "123"), (2, "7")]
    # nearIntegersPredicate analog: i-1/i/i+1 per run; >18-digit runs fall
    # back to the exact key (beyond int64 — neighbours meaningless)
    got = set(_keys("near_integers", ["5", "9" * 25]))
    assert got == {(0, "4"), (0, "5"), (0, "6"), (1, "9" * 25)}
    # alphaNumericPredicate analog: tokens containing a digit
    assert set(_keys("alpha_numeric", ["Apt 4B zip 60614-3121", "plain"])) == {
        (0, "4B"), (0, "60614"), (0, "3121")}
    # orderOfMagnitude: floor(log10(|x|)); zero/non-numeric emit nothing
    assert _keys("order_of_magnitude", ["1200", "zz", "0.5", "0"]) == [
        (0, "3"), (2, "-1")]
    idx, keys = emit_keys("order_of_magnitude", pa.array([950.0, 0.0, -120.0, 0.05]))
    # 'neg' prefix: negative-mag-2 must NOT collide with positive-mag=-2
    assert list(zip(idx.tolist(), keys.to_pylist())) == [
        (0, "2"), (2, "neg2"), (3, "-2")]


def test_integer_predicates_through_fingerprinter(ray_session):
    """Dispatch end-to-end: near_integers blocks off-by-one street numbers."""
    import ray.data as rd

    s = Settings(fields=[Field("addr")],
                 predicates=[{"kind": "near_integers", "column": "addr"}])
    ds = rd.from_items([
        {"rid": 1, "addr": "100 Elm St"},
        {"rid": 2, "addr": "101 Elm Street"},
        {"rid": 3, "addr": "900 Oak Ave"},
    ])
    from dedupe_examples_ray.blocking.fingerprint import fingerprint_dataset

    blocks = fingerprint_dataset(ds, s, "rid", []).to_pandas()
    by_key = blocks.groupby("block_key")["rid"].apply(set)
    assert {1, 2} in list(by_key)          # 100 and 101 collide via 101/100
    assert not any({1, 3} <= g for g in by_key)  # 100 and 900 never collide


def test_fingerprinter_prefixes_and_carries():
    s = Settings(
        fields=[Field("name")],
        predicates=[
            {"kind": "first_token", "column": "name"},
            {"kind": "whole_field", "column": "city"},
        ],
    )
    batch = pa.table(
        {"rid": [1, 2], "name": ["ann arbor", "ann paul"], "city": ["nyc", None]}
    )
    fp = Fingerprinter(s.to_json(), "rid", ["name"])
    out = fp(batch)
    rows = sorted(zip(out["block_key"].to_pylist(), out["rid"].to_pylist()))
    assert rows == [("0:ann", 1), ("0:ann", 2), ("1:nyc", 1)]
    assert out.column_names == ["block_key", "rid", "name"]


def test_fingerprinter_rare_token_uses_common_set():
    s = Settings(fields=[Field("name")], predicates=[{"kind": "rare_token", "column": "name"}])
    fp = Fingerprinter(s.to_json(), "rid", [], common_ref=frozenset({"the"}))
    out = fp(pa.table({"rid": [1], "name": ["the zanzibar"]}))
    assert out["block_key"].to_pylist() == ["0:zanzibar"]


def _pairs(tbl, **kw):
    import pyarrow as _pa

    defaults = dict(id_col="rid", carry_cols=["name"], max_block_size=200, policy="salt", source_col=None)
    defaults.update(kw)
    out = _emit_bucket(tbl.to_pandas(), **defaults)
    return _pa.Table.from_pandas(out, preserve_index=False)


def test_pair_emission_ordered_and_deduped_within_block():
    tbl = pa.table(
        {"block_key": ["k"] * 4, "rid": [3, 1, 2, 1], "name": ["c", "a", "b", "a"]}
    )
    out = _pairs(tbl)
    got = sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert got == [(1, 2), (1, 3), (2, 3)]
    # carry columns travel on both sides
    row = {c: out[c].to_pylist() for c in out.column_names}
    i = got.index((1, 3))
    assert row["name_a"][out["id_a"].to_pylist().index(1)] == "a"
    assert set(out.column_names) == {"id_a", "id_b", "name_a", "name_b"}


def test_pair_salting_caps_block():
    n = 30
    tbl = pa.table({"block_key": ["k"] * n, "rid": list(range(n)), "name": ["x"] * n})
    full = _pairs(tbl, max_block_size=200)
    assert full.num_rows == n * (n - 1) // 2
    salted = _pairs(tbl, max_block_size=10)
    assert 0 < salted.num_rows < full.num_rows
    # within sub-blocks ordering still holds
    assert all(a < b for a, b in zip(salted["id_a"].to_pylist(), salted["id_b"].to_pylist()))
    dropped = _pairs(tbl, max_block_size=10, policy="drop")
    assert dropped.num_rows == 0
    kept = _pairs(tbl, max_block_size=10, policy="keep")
    assert kept.num_rows == full.num_rows


def test_pair_cross_source_mode():
    tbl = pa.table(
        {
            "block_key": ["k"] * 4,
            "rid": ["a0", "a1", "b0", "b1"],
            "name": ["x"] * 4,
            "src": [0, 0, 1, 1],
        }
    )
    out = _pairs(tbl, source_col="src")
    got = sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert got == [("a0", "b0"), ("a0", "b1"), ("a1", "b0"), ("a1", "b1")]


def test_candidate_pairs_dedup_across_blocks(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.pairs import candidate_pairs, pair_metrics

    blocks = pa.table(
        {
            "block_key": ["x", "x", "y", "y"],
            "rid": [1, 2, 1, 2],
            "name": ["a", "b", "a", "b"],
        }
    )
    ds = rd.from_arrow(blocks)
    out = candidate_pairs(ds, "rid", ["name"]).to_pandas()
    assert len(out) == 1  # pair (1,2) co-blocked twice, deduped (A4)
    m = pair_metrics(ds, "rid", max_block_size=200)
    assert m["pairs_full"] == 2 and m["blocks"] == 2 and m["pairs_dropped_est"] == 0


def test_corpus_df_idf_common(ray_session):
    import ray.data as rd

    docs = rd.from_items(
        [{"text": "the cat sat"}, {"text": "the dog sat sat"}, {"text": "the bird"}]
    )
    df = compute_token_df(docs, "text").to_pandas().set_index("token")["df"]
    assert df["the"] == 3 and df["sat"] == 2 and df["cat"] == 1  # per-doc distinct
    tbl = pa.table({"token": df.index.to_list(), "df": df.to_list()})
    common = common_tokens_from_df(tbl, max_df=2)
    assert common == frozenset({"the"})
    idf = idf_from_df(tbl, n_docs=3)
    assert idf["cat"] > idf["the"]


def test_soundex_predicate():
    """American Soundex canonical examples (NIST/archives spec), the H/W
    transparency rule, first-letter-code adjacency, and emitter filtering of
    letterless values."""
    from dedupe_examples_ray.blocking.predicates import soundex_codes

    cases = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
             "Tymczak": "T522", "Pfister": "P236", "Honeyman": "H555",
             "Washington": "W252", "Lee": "L000", "O'Brien": "O165",
             "a": "A000", "123": ""}
    got = soundex_codes(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())
    # emitter drops null / empty / letterless rows; sound-alikes collide
    assert _keys("soundex", ["Smith", None, "", "42", "Smyth"]) == [
        (0, "S530"), (4, "S530")]
    # usable straight from a settings spec through the Fingerprinter
    s = Settings(fields=[Field("name")],
                 predicates=[{"kind": "soundex", "column": "name"}])
    batch = pa.table({"rid": pa.array([7, 8], pa.int64()),
                      "name": pa.array(["Robert", "Rupert"])})
    fp = Fingerprinter(s.to_json(), "rid", [])
    out = fp(batch)
    ks = out["block_key"].to_pylist()
    assert len(ks) == 2 and ks[0] == ks[1] and ks[0].endswith("R163")


def test_snm_prefix_proxy_monotone():
    """The zero-copy 6-byte prefix proxy is exact float64, monotone in
    string sort order (unicode, empties, shared prefixes), NULLS LAST."""
    import numpy as np

    from dedupe_examples_ray.ops.simjoin import _prefix6_f64

    ss = sorted(["", "a", "ab", "abcdef", "abcdefZZZ", "abcdefg",
                 "zz", "éclair", "zzé", "中文测试"])
    prox = _prefix6_f64(pa.array(ss))
    assert all(prox[i] <= prox[i + 1] for i in range(len(prox) - 1))
    # equal 6-byte prefixes share a proxy (full-key ties resolved downstream)
    same = _prefix6_f64(pa.array(["abcdef", "abcdefZZZ"]))
    assert same[0] == same[1]
    # NULL ranks after everything
    withnull = _prefix6_f64(pa.array(["zzzzzz", None]))
    assert withnull[1] == np.inf and withnull[0] < withnull[1]


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    """Distributed SNM == single-process sliding window over the global
    sort, across band boundaries, heavy key ties, and unicode keys."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import sorted_neighborhood_pairs

    rng = np.random.default_rng(11)
    n, w = 700, 4
    keys = ["k" + format(int(x), "02d") for x in rng.integers(0, 40, n)]
    keys[0], keys[1] = "", "éé"  # empty + unicode keys
    ids = [f"r{i:04d}" for i in rng.permutation(n)]
    df = pd.DataFrame({"key": keys, "rid": ids})
    ds = rd.from_pandas(df).repartition(5)
    # tiny band_width forces many ghost boundaries
    got = (sorted_neighborhood_pairs(ds, "key", "rid", window=w, band_width=37)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    ref = df.sort_values(["key", "rid"]).reset_index(drop=True)["rid"].to_numpy()
    exp = pd.DataFrame(
        [(ref[i], ref[j]) for i in range(n) for j in range(i + 1, min(i + w + 1, n))],
        columns=["id1", "id2"],
    ).sort_values(["id1", "id2"]).reset_index(drop=True)
    assert got.equals(exp)


def test_multi_pass_snm_distinct_union(ray_session):
    """Multi-pass SNM = DISTINCT of orientation-normalized per-pass windows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.ops.simjoin import (
        multi_pass_snm,
        sorted_neighborhood_pairs,
    )

    rng = np.random.default_rng(3)
    n, w = 300, 3
    df = pd.DataFrame({
        "k1": ["a" + format(int(x), "02d") for x in rng.integers(0, 25, n)],
        "k2": ["b" + format(int(x), "02d") for x in rng.integers(0, 25, n)],
        "rid": [int(i) for i in rng.permutation(n)],
    })
    ds = rd.from_pandas(df).repartition(3)
    got = (multi_pass_snm(ds, ["k1", "k2"], "rid", window=w)
           .to_pandas().sort_values(["id1", "id2"]).reset_index(drop=True))
    sets = set()
    for k in ("k1", "k2"):
        p = sorted_neighborhood_pairs(ds, k, "rid", window=w).to_pandas()
        for a, b in zip(p["id1"], p["id2"]):
            sets.add((min(a, b), max(a, b)))
    exp = (pd.DataFrame(sorted(sets), columns=["id1", "id2"])
           .reset_index(drop=True))
    assert got.equals(exp)
