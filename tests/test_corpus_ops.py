"""Corpus-management operators: hash splits, stratified sampling, URL
canonicalization, and the C4/Gopher-style cleaning funnel (ops/corpus.py)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from dedupe_examples_ray.ops import (
    add_url_host,
    clean_corpus,
    clean_corpus_funnel,
    host_stats,
    normalize_url,
    sample_per_group,
    split_by_hash,
)

SF = "/root/testdata/sf0.001"


def _docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


def _bucket(v, n=10_000):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % n


# ------------------------------------------------------------ split_by_hash
def test_split_by_hash_matches_direct_md5(ray_session):
    out = split_by_hash(_docs(ray_session), "doc_id").to_pandas()
    assert set(out["split"].unique()) <= {"train", "valid", "test"}
    for _, r in out.iterrows():
        b = _bucket(r["doc_id"])
        want = "train" if b < 9800 else ("valid" if b < 9900 else "test")
        assert r["split"] == want, (r["doc_id"], b, r["split"], want)


def test_split_by_hash_is_subset_stable(ray_session):
    """A record's split never changes when the corpus around it changes."""
    import ray.data as rd

    full = split_by_hash(_docs(ray_session), "doc_id").to_pandas()
    half_ds = rd.from_pandas(
        full[full["doc_id"] % 2 == 0][["doc_id", "text"]].reset_index(drop=True)
    )
    half = split_by_hash(half_ds, "doc_id").to_pandas()
    merged = half.merge(full[["doc_id", "split"]], on="doc_id", suffixes=("_h", "_f"))
    assert (merged["split_h"] == merged["split_f"]).all()


def test_split_by_hash_custom_fractions_and_validation(ray_session):
    out = split_by_hash(
        _docs(ray_session), "doc_id", splits={"a": 0.5, "b": 0.5}, out_col="part"
    ).to_pandas()
    assert set(out["part"].unique()) <= {"a", "b"}
    # 0.5/0.5 over md5 buckets: both sides populated even at 50 docs
    assert out["part"].nunique() == 2
    with pytest.raises(ValueError):
        split_by_hash(_docs(ray_session), "doc_id", splits={"a": 0.5, "b": 0.4})


# --------------------------------------------------------- sample_per_group
def test_sample_per_group_matches_pandas(ray_session):
    got = (
        sample_per_group(_docs(ray_session), ["source"], 3, "doc_id")
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    ref = pd.read_parquet(f"{SF}/documents.parquet")
    ref["_k"] = [hashlib.md5(str(v).encode()).hexdigest()[:16] for v in ref["doc_id"]]
    want = (
        ref.sort_values(["_k", "doc_id"], kind="mergesort")
        .groupby("source", sort=True)
        .head(3)
        .sort_values(["source", "_k"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got.groupby("source").size().max() <= 3
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got.groupby("source")["rank"].min() == 1).all()


# ------------------------------------------------------------------ url ops
def test_normalize_url_cases(ray_session):
    import ray.data as rd

    cases = {
        "HTTPS://WWW.Ex.COM/A/b/#frag": "https://www.ex.com/A/b",
        "https://ex.com/path/?": "https://ex.com/path",
        "http://H.io/": "http://h.io",
        "ftp://X.Y/z?q=1": "ftp://x.y/z?q=1",
        "notaurl": "notaurl",
        "": "",
    }
    ds = rd.from_pandas(pd.DataFrame({"url": list(cases)}))
    out = normalize_url(ds).to_pandas()
    for _, r in out.iterrows():
        assert r["url_norm"] == cases[r["url"]], r["url"]


def test_add_url_host_and_stats(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "url": ["https://a.com/x", "https://a.com/y", "http://B.org/", "junk"],
            "text": ["aaaa", "bb", "c", "dd"],
        }
    )
    out = add_url_host(rd.from_pandas(df)).to_pandas()
    assert list(out["host"]) == ["a.com", "a.com", "b.org", ""]
    hs = host_stats(rd.from_pandas(df)).to_pandas().set_index("host")
    assert hs.loc["a.com", "n"] == 2
    assert hs.loc["a.com", "avg_chars"] == 3.0
    assert hs.loc["b.org", "max_chars"] == 1.0


# ----------------------------------------------------------- clean_corpus
def _ref_clean(df: pd.DataFrame, min_tokens=20, max_tokens=50_000,
               min_quality=0.3, max_dup=0.30) -> pd.DataFrame:
    """Independent pandas reimplementation of the funnel semantics."""
    from dedupe_examples_ray.ops.textstats import TOKEN_RE, _STOPWORDS

    stop_re = re.compile(r"\b(" + "|".join(sorted(_STOPWORDS["en"])) + r")\b")
    tok_re = re.compile(TOKEN_RE)
    keep = []
    for _, r in df.iterrows():
        s = r["text"] or ""
        if r["lang"] != "en":
            continue
        nt = len(tok_re.findall(s))
        if not (min_tokens <= nt <= max_tokens):
            continue
        nc = len(s)
        npunct = len(re.findall(r"[^\w\s]", s))
        nwords = len(re.findall(r"[A-Za-z0-9]+", s))
        nstop = len(stop_re.findall(s.lower()))
        punct_r = npunct / max(nc, 1)
        stop_r = nstop / max(nwords, 1)
        q = (min(nc / 200.0, 1.0) * max(1.0 - punct_r * 4.0, 0.0)) * (
            min(stop_r * 4.0, 1.0) * 0.5 + 0.5
        )
        if q < min_quality:
            continue
        lines = [ln for ln in s.split("\n") if ln.strip()]
        if lines and (len(lines) - len(set(lines))) / len(lines) > max_dup:
            continue
        keep.append(r)
    kept = pd.DataFrame(keep)
    if kept.empty:
        return kept
    mins = kept.groupby("text", sort=False)["doc_id"].transform("min")
    return kept[mins == kept["doc_id"]]


def test_clean_corpus_matches_reference_semantics(ray_session):
    got = clean_corpus(_docs(ray_session)).to_pandas().sort_values("doc_id")
    ref = pd.read_parquet(f"{SF}/documents.parquet")
    want = _ref_clean(ref).sort_values("doc_id")
    assert list(got["doc_id"]) == list(want["doc_id"])


def test_clean_corpus_dedups_exact_text(ray_session):
    import ray.data as rd

    base = "the of and to in a is that it was for on are with as be at by this "
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base * 3, base * 3, base * 3 + "unique tail", base * 3],
            "lang": ["en"] * 4,
        }
    )
    got = clean_corpus(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == [1, 3]


def test_clean_corpus_funnel_counts(ray_session):
    fn = clean_corpus_funnel(_docs(ray_session))
    assert list(fn["stage"]) == ["input", "lang", "tokens", "quality", "repetition", "dedup"]
    n = fn["n_rows"].to_numpy()
    assert (np.diff(n) <= 0).all()  # monotone funnel
    assert n[0] == pd.read_parquet(f"{SF}/documents.parquet").shape[0]
    assert n[-1] == clean_corpus(_docs(ray_session)).count()


def test_corpus_ops_on_empty_dataset(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object"),
                      "lang": pd.Series([], dtype="object")})
    )
    assert split_by_hash(empty, "doc_id").count() == 0
    assert clean_corpus(empty).count() == 0
    assert sample_per_group(empty, ["lang"], 2, "doc_id").count() == 0


# ---------------------------------------------------------------- keep_latest
def test_keep_latest_picks_global_winner_across_blocks(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import keep_latest

    # 3 snapshots of url "a" spread across blocks; winner must be the
    # globally-latest row even though no single batch sees all three.
    df = pd.DataFrame(
        {
            "url": ["a", "b", "a", "c", "a", "b"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01", "2024-06-01", "2024-03-01",
                 "2024-02-01", "2024-02-01", "2024-05-01"]
            ),
            "text": ["a1", "b2", "a3", "c1", "a2", "b1"],
        }
    )
    ds = rd.from_pandas([df.iloc[i : i + 2] for i in range(0, 6, 2)])
    out = keep_latest(ds, "url", "warc_ts").to_pandas().sort_values("url")
    assert list(out["url"]) == ["a", "b", "c"]
    assert list(out["text"]) == ["a3", "b2", "c1"]


def test_keep_latest_tie_break_and_nulls(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import keep_latest

    ts = pd.to_datetime(["2024-01-01", "2024-01-01", None, "2024-01-01", None, None])
    df = pd.DataFrame(
        {
            "k": ["x", "x", "x", None, None, "y"],
            "ts": ts,
            "eid": [1, 2, 3, 4, 5, 6],
        }
    )
    out = keep_latest(rd.from_pandas(df), "k", "ts", tie_col="eid").to_pandas()
    got = {r["k"] if pd.notna(r["k"]) else None: r["eid"] for _, r in out.iterrows()}
    # tie on ts -> greatest eid wins; null ts loses to non-null; null keys
    # form one group and its only non-null-ts row wins
    assert got == {"x": 2, None: 4, "y": 6}


def test_keep_latest_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from dedupe_examples_ray.ops import keep_latest

    ev = rd.read_parquet(f"{SF}/events.parquet")
    out = (
        keep_latest(ev, "user_id", "ts", tie_col="event_id")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)[["user_id", "event_id"]]
    )
    want = duckdb.sql(
        f"SELECT user_id, event_id FROM read_parquet('{SF}/events.parquet') "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1 "
        "ORDER BY user_id"
    ).df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


# -------------------------------------------------------- ngram_decontaminate
def test_decontaminate_flags_verbatim_and_partial_overlap(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import ngram_decontaminate

    eval_txt = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    train = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "prefix words " + eval_txt + " suffix words",  # contains the 8-gram
                    "alpha beta gamma delta epsilon zeta eta IOTA",  # 7-word overlap only
                    "totally different content with no overlap at all here",
                    "",  # empty doc
                ],
            }
        )
    )
    ev = rd.from_pandas(pd.DataFrame({"doc_id": [100], "text": [eval_txt]}))
    out = ngram_decontaminate(train, ev).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] == 1
    assert not bool(out.loc[2, "contaminated"])  # needs a full 8-gram
    assert not bool(out.loc[3, "contaminated"])
    assert not bool(out.loc[4, "contaminated"]) and out.loc[4, "n_hits"] == 0


def test_decontaminate_short_docs_whole_text_gram(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import ngram_decontaminate

    # eval item shorter than n: its whole text is one gram; a verbatim train
    # copy (also < n words) must match, a superstring must not
    ev = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["short eval item"]}))
    train = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": ["short eval item", "short eval item extended"]}
        )
    )
    out = ngram_decontaminate(train, ev).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])


def test_decontaminate_empty_eval_set(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import ngram_decontaminate

    ev = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                      "text": pd.Series([], dtype="object")}))
    train = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["some words here"]}))
    out = ngram_decontaminate(train, ev).to_pandas()
    assert not out["contaminated"].any()


# ----------------------------------------------------------- paragraph_dedup
def test_paragraph_dedup_hand_case(ray_session):
    """First occurrence (by doc_id, para_idx) wins corpus-wide; survivors
    reassemble in para_idx order; fully-duplicated docs vanish."""
    import ray.data as rd

    from dedupe_examples_ray.ops import paragraph_dedup

    p1 = "a b c"                       # 3 words -> one short para
    p2 = " ".join(f"w{i}" for i in range(10))
    p3 = " ".join(f"x{i}" for i in range(10))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"{p2} {p1}",              # paras: p2, p1
            f"{p3} {p2} extra tail",   # paras: p3, p2 (dup), "extra tail"
            p1,                        # p1 (dup of doc 1's) -> doc vanishes
            f"{p2} {p3}",              # both dups -> vanishes
        ],
    })
    out = (paragraph_dedup(rd.from_pandas(df), words_per_para=10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2]
    assert out.loc[0, "text"] == f"{p2} {p1}"
    assert out.loc[1, "text"] == f"{p3} extra tail"
    assert list(out["n_paras_kept"]) == [2, 2]
    assert list(out["n_paras_total"]) == [2, 3]


def test_paragraph_dedup_within_doc_and_empty(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import paragraph_dedup

    p = " ".join(f"t{i}" for i in range(10))
    df = pd.DataFrame({
        "doc_id": [7, 8, 9],
        "text": [f"{p} {p} {p}", "", None],  # within-doc dups; "" and NULL
    })
    out = (paragraph_dedup(rd.from_pandas(df), words_per_para=10)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 7 keeps one copy; "" and NULL both reduce to the empty para:
    # doc 8 wins it, doc 9 vanishes
    assert list(out["doc_id"]) == [7, 8]
    assert out.loc[0, "text"] == p
    assert (out.loc[0, "n_paras_kept"], out.loc[0, "n_paras_total"]) == (1, 3)
    assert out.loc[1, "text"] == ""


def test_paragraph_dedup_matches_duckdb(ray_session):
    import duckdb

    from dedupe_examples_ray.ops import paragraph_dedup

    docs = _docs(ray_session)
    got = (paragraph_dedup(docs.select_columns(["doc_id", "text"]))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    exp = con.execute("""
        WITH s AS (SELECT doc_id, string_split(COALESCE(text,''), ' ') AS w FROM documents),
        paras0 AS (
          SELECT doc_id, CAST(ceil(len(w)/10.0) AS BIGINT) AS n_paras_total,
                 list_transform(range(0, CAST(ceil(len(w)/10.0) AS BIGINT)),
                   p -> struct_pack(para_idx := p,
                                    para := array_to_string(list_slice(w, p*10+1, p*10+10), ' '))) AS plist
          FROM s),
        paras AS (SELECT doc_id, n_paras_total, UNNEST(plist, recursive := true) FROM paras0),
        ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM paras)
        SELECT doc_id, string_agg(para, ' ' ORDER BY para_idx) AS text,
               COUNT(*) AS n_paras_kept, MAX(n_paras_total) AS n_paras_total
        FROM ranked WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=True)


# ------------------------------------------------------- strip_boilerplate
def _boiler_ds():
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "source": ["a", "a", "a", "b", None, "a", "b"],
        "text": ["nav\nhello world\nfooter", "nav\nbye\nfooter",
                 "nav\nonly me", "nav\nsame host b", None,
                 "nav\nfooter", ""],
    }))


def test_strip_boilerplate_semantics(ray_session):
    from dedupe_examples_ray.ops import strip_boilerplate

    out = (strip_boilerplate(_boiler_ds(), min_docs=2, delim="\n",
                             mode="broadcast")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # host a: "nav" (4 docs) and "footer" (3 docs) are boilerplate
    assert out.loc[0, "text"] == "hello world" and out.loc[0, "n_removed"] == 2
    assert out.loc[1, "text"] == "bye"
    assert out.loc[2, "text"] == "only me" and out.loc[2, "n_removed"] == 1
    # host b has only one doc with "nav": below threshold, untouched
    assert out.loc[3, "text"] == "nav\nsame host b" and out.loc[3, "n_removed"] == 0
    # null host: never stripped; null text: stays null
    assert out.loc[4, "text"] is None and out.loc[4, "n_removed"] == 0
    # all segments boilerplate -> NULL text (string_agg over empty set)
    assert out.loc[5, "text"] is None and out.loc[5, "n_removed"] == 2
    # empty string doc: single whitespace-only segment, kept verbatim
    assert out.loc[6, "text"] == "" and out.loc[6, "n_removed"] == 0


def test_strip_boilerplate_tier_parity(ray_session):
    """broadcast and join tiers must produce identical output (the
    hydration-tier parity contract from test_scale_safety)."""
    from dedupe_examples_ray.ops import strip_boilerplate

    outs = {}
    for mode in ("broadcast", "join"):
        outs[mode] = (strip_boilerplate(_boiler_ds(), min_docs=2, delim="\n",
                                        mode=mode)
                      .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["broadcast"], outs["join"])


def test_strip_boilerplate_empty_keyset_and_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import strip_boilerplate

    # threshold higher than any count: pure passthrough in BOTH modes
    for mode in ("broadcast", "join"):
        out = (strip_boilerplate(_boiler_ds(), min_docs=99, delim="\n",
                                 mode=mode)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert (out["n_removed"] == 0).all()
        assert out.loc[0, "text"] == "nav\nhello world\nfooter"
    # empty input dataset
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert strip_boilerplate(empty, min_docs=2).count() == 0


def test_strip_boilerplate_within_doc_repeats(ray_session):
    """A line repeated inside ONE doc counts once for discovery (DISTINCT
    docs) but every occurrence is stripped once flagged."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import strip_boilerplate

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "source": ["a", "a"],
        "text": ["x\nx\nkeep me", "x\nother"],
    }))
    out = (strip_boilerplate(ds, min_docs=2, delim="\n", mode="broadcast")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "text"] == "keep me" and out.loc[0, "n_removed"] == 2
    assert out.loc[1, "text"] == "other" and out.loc[1, "n_removed"] == 1
    # but min_docs=3 would NOT fire: within-doc repeats don't inflate counts
    out3 = (strip_boilerplate(ds, min_docs=3, delim="\n", mode="broadcast")
            .to_pandas())
    assert (out3["n_removed"] == 0).all()


# --------------------------------------------------------- sequence packing
def test_pack_sequences_matches_cumsum(ray_session):
    """Offset binning == pandas ordered cumsum on a shuffled, skewed input."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import pack_sequences

    rng = np.random.default_rng(7)
    n, budget = 500, 100
    toks = rng.integers(0, 250, n)  # includes zero-token and oversized docs
    ids = rng.permutation(n)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "nt": pa.array(toks, pa.int64())})).repartition(7)
    got = (pack_sequences(ds, id_col="doc_id", token_col="nt", budget=budget,
                          num_ranges=9)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    order = np.argsort(ids)
    exp_start = np.concatenate(([0], np.cumsum(toks[order][:-1])))
    assert np.array_equal(got["start_offset"].to_numpy(), exp_start)
    assert np.array_equal(got["shard"].to_numpy(), exp_start // budget)
    assert np.array_equal(got["n_tokens"].to_numpy(), toks[order])


def test_pack_greedy_invariants(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import pack_sequences_greedy

    rng = np.random.default_rng(11)
    n, budget = 400, 128
    toks = rng.integers(1, 200, n)  # some docs exceed the budget
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "nt": pa.array(toks, pa.int64())})).repartition(5)
    out = pack_sequences_greedy(ds, id_col="doc_id", token_col="nt",
                                budget=budget, num_partitions=4).to_pandas()
    assert len(out) == n and out["doc_id"].nunique() == n
    assert int(out["n_tokens"].sum()) == int(toks.sum())
    g = out.groupby("shard").agg(tok=("n_tokens", "sum"), n=("doc_id", "count"))
    assert (g[g["n"] > 1]["tok"] <= budget).all()
    assert (g[g["tok"] > budget]["n"] == 1).all()
    g = g.reset_index()
    g["part"] = g["shard"].to_numpy() >> 32
    assert (g[g["tok"] * 2 < budget].groupby("part").size() <= 1).all()
    # determinism: same input -> same assignment
    out2 = pack_sequences_greedy(ds, id_col="doc_id", token_col="nt",
                                 budget=budget, num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))


# ----------------------------------------------------------- source mixing
def test_mix_sources_ratios_and_determinism(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import mix_sources

    n = 3000
    rng = np.random.default_rng(2)
    src = rng.choice(["a", "b", "c", "drop_me"], size=n, p=[0.5, 0.3, 0.1, 0.1])
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(src, pa.string())})).repartition(6)
    out = mix_sources(ds, weights={"a": 1, "b": 1, "c": 1},
                      key_col="doc_id").to_pandas()
    # unweighted source fully dropped
    assert (out["source"] != "drop_me").all()
    # bottleneck source (c, smallest) kept ~whole; a and b downsampled to ~|c|
    counts = out.groupby("source").size()
    n_c = int((src == "c").sum())
    assert counts["c"] >= n_c * 0.99
    for s in ("a", "b"):
        assert abs(counts[s] - n_c) <= max(10, 0.15 * n_c), (s, counts[s], n_c)
    # value-determinism: same rows kept regardless of partitioning
    out2 = mix_sources(ds.repartition(13), weights={"a": 1, "b": 1, "c": 1},
                       key_col="doc_id").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_grouped_top_values_ties_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_top_values

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, None, None], pa.int64()),
        "v": pa.array(["b", "b", "a", "a", "x", None, "z", "z"], pa.string()),
    })
    out = (grouped_top_values(rd.from_arrow(t).repartition(3), "k", "v", k=2)
           .to_pandas().sort_values(["k", "rnk"]).reset_index(drop=True))
    # key 1: a and b tie at 2 -> value ASC breaks the tie
    k1 = out[out["k"] == 1]
    assert list(k1["v"]) == ["a", "b"] and list(k1["n"]) == [2, 2]
    assert list(k1["rnk"]) == [1, 2]
    # key 2: x(1) then NULL(1) — null sorts last on ties
    k2 = out[out["k"] == 2]
    assert k2["v"].iloc[0] == "x" and pd.isna(k2["v"].iloc[1])
    # NULL key forms its own group
    kn = out[out["k"].isna()]
    assert len(kn) == 1 and kn["v"].iloc[0] == "z" and kn["n"].iloc[0] == 2


# ------------------------------------------------------------ weighted_sample
def test_weighted_sample_matches_brute_force(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from dedupe_examples_ray.ops import weighted_sample

    rng = np.random.default_rng(3)
    n, k = 500, 40
    w = rng.uniform(0.1, 50.0, size=n)
    w[5] = 0.0          # excluded: non-positive
    w[17] = -2.0        # excluded
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": pa.array(ids), "w": pa.array(w)})
    out = (weighted_sample(rd.from_arrow(tbl).repartition(8), "id", "w", k)
           .to_pandas().sort_values("id").reset_index(drop=True))

    u = np.array([(int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5)
                  / 2**32 for i in ids])
    sk = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1.0), -np.inf)
    exp = np.sort(ids[np.argsort(-sk, kind="stable")][:k])
    assert (out["id"].to_numpy() == exp).all()
    assert 5 not in set(out["id"]) and 17 not in set(out["id"])


def test_weighted_sample_null_weights_and_small_input(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from dedupe_examples_ray.ops import weighted_sample

    tbl = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                    "w": pa.array([None, 1.0, None], pa.float64())})
    out = weighted_sample(rd.from_arrow(tbl), "id", "w", 10).to_pandas()
    assert out["id"].tolist() == [2]
    with pytest.raises(ValueError):
        weighted_sample(rd.from_arrow(tbl), "id", "w", 0)


def test_c4_line_rules_gates(ray_session):
    """Line retention (terminal punct, >=5 words, no javascript) and the
    page gate (sentences, lorem ipsum, brace) on hostile inputs."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops.corpus import c4_line_rules

    texts = [
        # two good lines; middle lines dropped (short / no punct)
        "Good long line with many words here.\nshort.\n"
        "no punct line with many words\nAnother solid line of six words!",
        None, "",
        # quoted terminal keeps; javascript drops case-insensitively
        'He said "stop right there now please"\n'
        "JavaScript is required to view this page.",
        # brace in a KEPT line fails the page
        "Config sample { x } with several words.\nOne two three four five six.",
        # lorem ipsum fails the page even with 3 sentences
        "Lorem Ipsum dolor sit amet consectetur adipiscing.\n"
        "One two three four five six.\nSeven eight nine ten eleven twelve?",
        # trailing tab before terminal punct still retained (rstrip rule)
        "é ü 中文 line with terminal punct here.\t\n"
        "ok line ends with question mark now?",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = (c4_line_rules(rd.from_arrow(t), min_sentences=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["kept_lines"].tolist() == [2, 0, 0, 1, 2, 3, 2]
    assert out["c4_pass"].tolist() == [True, False, False, False, False,
                                       False, True]
    assert out.loc[3, "c4_text"] == 'He said "stop right there now please"'
    # original line bytes (incl. the trailing tab) survive into c4_text
    assert "here.\t" in out.loc[6, "c4_text"]


def test_dedup_lines_first_occurrence(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops.corpus import dedup_lines

    texts = [
        "a\nb\na\nc\nb\na",          # repeats of a and b dropped
        "x\n\ny\n\nz",               # duplicate EMPTY line dropped too
        None, "", "only",
        "same\nsame\nsame",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = (dedup_lines(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["dedup_text"].tolist() == [
        "a\nb\nc", "x\n\ny\nz", "", "", "only", "same"]
    assert out["lines_removed"].tolist() == [3, 1, 0, 0, 0, 2]


# -------------------------------------------------------- fuzzy_decontaminate
def test_fuzzy_decontaminate_catches_paraphrase_edits(ray_session):
    """Eval items are train docs with a few words removed — below the exact
    8-gram rule's radar at low overlap, but caught by MinHash at Jaccard
    >= threshold.  An unrelated doc must NOT match."""
    import ray.data as rd

    from dedupe_examples_ray.ops import fuzzy_decontaminate

    base = " ".join(f"w{i}" for i in range(60))
    edited = " ".join(f"w{i}" for i in range(5, 60))  # drop first 5 words
    train = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base,
                 " ".join(f"z{i}" for i in range(60)),  # disjoint vocab
                 ""],
    }))
    ev = rd.from_pandas(pd.DataFrame({"doc_id": [100], "text": [edited]}))
    out = fuzzy_decontaminate(train, ev, threshold=0.6).to_pandas()
    assert set(zip(out["doc_id"], out["eval_id"])) == {(1, 100)}
    assert (out["jac"] >= 0.6).all()


def test_fuzzy_decontaminate_empty_eval_and_budget(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from dedupe_examples_ray.ops import fuzzy_decontaminate

    train = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a b c"]}))
    ev0 = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                       "text": pd.Series([], dtype="object")}))
    assert fuzzy_decontaminate(train, ev0).count() == 0
    ev2 = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2],
                                       "text": ["a b c", "d e f"]}))
    with _pytest.raises(ValueError, match="budget"):
        fuzzy_decontaminate(train, ev2, eval_budget_rows=1)
