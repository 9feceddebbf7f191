"""Tests for the training-data ops: dedup family, ANN, text stats, multimodal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dedupe_examples_ray.ops.ann import ann_brute_force, ann_lsh
from dedupe_examples_ray.ops.dedup import (
    char_ngrams,
    embedding_cosine_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard_dedup,
    simhash64,
    simhash_dedup,
    word_shingles,
    _hash_tokens,
    _perm_params,
)
from dedupe_examples_ray.ops.multimodal import (
    MediaDecoder,
    decode_media,
    sample_frames,
    synth_media_table,
)
from dedupe_examples_ray.ops.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    rolling_hashes,
    token_count,
)


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog again and again in the field"
    near = base.replace("lazy", "sleepy")  # one-token edit -> high jaccard
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                      # exact dup of 1
        {"doc_id": 3, "text": near},                      # near dup of 1
        {"doc_id": 4, "text": "completely different words about cooking pasta tonight with garlic sauce"},
        {"doc_id": 5, "text": "Der schnelle braune Fuchs springt über den faulen Hund und die Katze ist auch da"},
        {"doc_id": 6, "text": ""},
    ]
    return rd.from_pandas(pd.DataFrame(rows)).materialize()


def test_exact_dedup(doc_ds):
    out = exact_dedup(doc_ds).to_pandas().set_index("doc_id")["keep_id"]
    assert out[1] == 1 and out[2] == 1  # exact dups share the min id
    assert out[3] == 3 and out[4] == 4  # near dup is NOT an exact dup


def test_minhash_signature_properties():
    a, b = _perm_params(64)
    s1 = minhash_signature(_hash_tokens(word_shingles("a b c d e f g", 3)), a, b)
    s2 = minhash_signature(_hash_tokens(word_shingles("a b c d e f g", 3)), a, b)
    assert np.array_equal(s1, s2)  # deterministic
    s3 = minhash_signature(_hash_tokens(word_shingles("a b c d e f h", 3)), a, b)
    agree = (s1 == s3).mean()
    assert 0.2 < agree < 1.0  # similar docs agree on many minhashes
    s4 = minhash_signature(_hash_tokens(word_shingles("x y z w q r t", 3)), a, b)
    assert (s1 == s4).mean() < 0.2


def test_minhash_lsh_dedup(doc_ds):
    out = minhash_lsh_dedup(doc_ds, threshold=0.4).to_pandas().set_index("doc_id")["keep_id"]
    assert out[1] == 1 and out[2] == 1 and out[3] == 1  # near-dup folded in
    assert out[4] == 4 and out[5] == 5 and out[6] == 6


def test_ngram_jaccard_dedup(doc_ds):
    out = ngram_jaccard_dedup(doc_ds, threshold=0.4).to_pandas().set_index("doc_id")["keep_id"]
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[4] == 4


def test_simhash_properties_and_dedup(doc_ds):
    h1 = simhash64(_hash_tokens(np.array("a b c d e f".split(), dtype=object)))
    h2 = simhash64(_hash_tokens(np.array("a b c d e g".split(), dtype=object)))
    h3 = simhash64(_hash_tokens(np.array("x y z w v u".split(), dtype=object)))
    near = bin(h1 ^ h2).count("1")
    far = bin(h1 ^ h3).count("1")
    assert near < far
    out = simhash_dedup(doc_ds, max_hamming=3).to_pandas().set_index("doc_id")["keep_id"]
    assert out[1] == 1 and out[2] == 1
    assert out[4] == 4


def test_shingles():
    assert list(word_shingles("a b c d", 3)) == ["a b c", "b c d"]
    assert list(word_shingles("a", 3)) == ["a"]
    assert list(word_shingles("", 3)) == []
    assert list(char_ngrams("abcd", 3)) == ["abc", "bcd"]


def test_embedding_cosine_dedup(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        {"vec_id": 1, "embedding": base.tolist()},
        {"vec_id": 2, "embedding": (base * 2.0).tolist()},          # same direction
        {"vec_id": 3, "embedding": (base + rng.standard_normal(16) * 0.01).tolist()},
        {"vec_id": 4, "embedding": rng.standard_normal(16).tolist()},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).materialize()
    out = embedding_cosine_dedup(ds, tau=0.98).to_pandas().set_index("vec_id")["keep_id"]
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[4] == 4


def test_ann_brute_force_and_lsh(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    V = rng.standard_normal((200, 16))
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in V]})
    ).materialize()
    q = V[17] + rng.standard_normal(16) * 0.01
    exact = ann_brute_force(ds, [("q0", q)], k=5)
    assert list(exact["query_id"].unique()) == ["q0"]
    assert len(exact) == 5
    assert exact.iloc[0]["match_id"] == 17  # nearest is the planted vector
    # exact results ordered by score desc
    assert (np.diff(exact["score"].to_numpy()) <= 1e-12).all()
    approx = ann_lsh(ds, [("q0", q)], k=5, n_planes=6)
    assert approx.iloc[0]["match_id"] == 17  # multi-probe finds the planted nn
    assert len(approx) <= 5


def test_token_count_quality_langid_fingerprint(doc_ds):
    tc = token_count(doc_ds).to_pandas().set_index("doc_id")["n_tokens"]
    assert tc[1] == 15 and tc[6] == 0
    q = quality_score(doc_ds).to_pandas().set_index("doc_id")
    assert q.loc[1, "quality"] > q.loc[6, "quality"]
    assert 0.0 <= q["quality"].max() <= 1.0
    lang = language_id(doc_ds).to_pandas().set_index("doc_id")["lang_pred"]
    assert lang[1] == "en" and lang[5] == "de" and lang[6] == "und"
    fp = doc_fingerprint(doc_ds).to_pandas().set_index("doc_id")
    assert fp.loc[1, "content_hash"] == fp.loc[2, "content_hash"]
    assert fp.loc[1, "content_hash"] != fp.loc[3, "content_hash"]
    # min rolling hash is robust to a single late-token edit
    assert fp.loc[1, "fingerprint"] == fp.loc[2, "fingerprint"]


def test_rolling_hashes():
    h1 = rolling_hashes(["a", "b", "c", "d", "e"], window=3)
    h2 = rolling_hashes(["a", "b", "c", "d", "e"], window=3)
    assert h1 == h2 and len(h1) == 3
    assert rolling_hashes([], 3) == []
    assert len(rolling_hashes(["a"], 3)) == 1


def test_multimodal_codecs_roundtrip():
    """Pure-stdlib codecs: encode -> decode is exact."""
    from dedupe_examples_ray.ops import codecs

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)  # odd width: row padding
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(rgb)), rgb)

    samples = (np.sin(np.arange(500) / 10) * 10000).astype(np.int16)
    back, rate = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000 and np.array_equal(back, samples)

    frames = [rng.integers(0, 256, (5, 5, 3), dtype=np.uint8) for _ in range(4)]
    reel = codecs.encode_video(frames, fps=2)
    got = list(codecs.iter_video_frames(reel))
    assert [ts for _, ts, _ in got] == [0, 500, 1000, 1500]
    assert all(np.array_equal(g, f) for (_, _, g), f in zip(got, frames))

    # nearest-neighbor resize: constant image stays constant, dims right
    flat = np.full((9, 13, 3), 77, np.uint8)
    r = codecs.resize_nearest(flat, 4, 4)
    assert r.shape == (4, 4, 3) and (r == 77).all()


def test_multimodal_real_decode(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.multimodal import resize_images

    tbl = synth_media_table(30)
    ds = rd.from_arrow(tbl)
    out = decode_media(ds).to_pandas()  # decoder="real" is the default now
    assert len(out) == 30
    assert "payload" not in out.columns  # payload dropped after decode
    assert out["decoded_ok"].all()
    assert all(len(f) == 16 for f in out["features"])
    # decoded dimensions come from the BITMAP, and match the metadata columns
    img = out[out["kind"] == "image"]
    assert (img["dec_width"].to_numpy() == img["width"].to_numpy()).all()
    assert (img["dec_height"].to_numpy() == img["height"].to_numpy()).all()
    # deterministic features
    out2 = decode_media(rd.from_arrow(tbl)).to_pandas()
    assert np.allclose(np.stack(out["features"].map(np.asarray)),
                       np.stack(out2["features"].map(np.asarray)))
    # real frame sampling: one row per second of reel
    frames = sample_frames(ds.filter(lambda r: r["kind"] == "video")).to_pandas()
    assert (frames.groupby("media_id").size() >= 1).all()
    assert (frames["frame_ts_ms"] % 200 == 0).all()  # 5 fps reel

    # resize: output payloads decode to the target shape
    from dedupe_examples_ray.ops import codecs

    imgs = rd.from_arrow(tbl).filter(lambda r: r["kind"] == "image")
    rs = resize_images(imgs, out_h=8, out_w=8).to_pandas()
    assert rs["decoded_ok"].all()
    assert all(codecs.decode_bmp(p).shape == (8, 8, 3) for p in rs["payload"])


def test_multimodal_poison_payloads(ray_session):
    """Garbage bytes must not kill the decode actor: decoded_ok=False rows."""
    import ray.data as rd

    tbl = synth_media_table(30, codec="bytes")  # random bytes, undecodable
    out = decode_media(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 30
    assert not out["decoded_ok"].any()
    # stub mode still works for plumbing over arbitrary bytes
    out_stub = decode_media(rd.from_arrow(tbl), decoder="stub").to_pandas()
    assert out_stub["decoded_ok"].all()
    with pytest.raises(ValueError):
        MediaDecoder(decoder="nope")


def test_ann_ivf_recall(ray_session):
    """IVF with full probe = exact; partial probe finds planted neighbors."""
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.ops import ann_brute_force, ann_ivf

    rng = np.random.default_rng(11)
    # 4 well-separated gaussian clusters in 8d
    centers = rng.standard_normal((4, 8)) * 10
    rows = []
    for i in range(400):
        c = i % 4
        v = centers[c] + rng.standard_normal(8) * 0.3
        rows.append({"vec_id": f"v{i:03d}", "embedding": v.tolist()})
    ds = rd.from_items(rows)
    q = [("q0", (centers[0] + rng.standard_normal(8) * 0.1).tolist())]
    exact = ann_brute_force(ds, q, k=10)
    # full probe == exact
    full = ann_ivf(ds, q, k=10, n_cells=8, n_probe=8)
    assert set(full["match_id"]) == set(exact["match_id"])
    # partial probe keeps high recall on clustered data
    part = ann_ivf(ds, q, k=10, n_cells=4, n_probe=1)
    recall = len(set(part["match_id"]) & set(exact["match_id"])) / 10
    assert recall >= 0.9


def test_repetition_stats(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import repetition_stats

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "spam spam spam spam",          # 1 distinct / 4 words
                    "all words here differ fine",   # no repetition
                    "",                             # empty -> zeros
                    "a b\na b\nc d",                # duplicate line
                ],
            }
        )
    )
    out = repetition_stats(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "dup_word_frac"] == 0.75
    assert out.loc[1, "top_word_frac"] == 1.0
    assert out.loc[2, "dup_word_frac"] == 0.0
    assert out.loc[3, "dup_word_frac"] == 0.0 and out.loc[3, "dup_line_frac"] == 0.0
    assert out.loc[4, "dup_line_frac"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_text_knn(ray_session):
    """Hashed-TF cosine knn: planted near-duplicate text ranks first after
    the probe itself; disjoint-vocabulary docs score ~0."""
    import ray.data as rd

    from dedupe_examples_ray.ops.textstats import text_knn

    rows = [{"doc_id": "probe", "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": "near", "text": "alpha beta gamma delta epsilon eta"},
            {"doc_id": "far", "text": "one two three four five six"}]
    rows += [{"doc_id": f"r{i}", "text": f"unrelated words only here {i}"}
             for i in range(40)]
    ds = rd.from_items(rows).repartition(4)
    out = text_knn(ds, [("q", rows[0]["text"])], k=3)
    assert list(out["match_id"][:2]) == ["probe", "near"]
    assert out["score"].iloc[0] > 0.999 and out["score"].iloc[1] > 0.7
    far = out[out["match_id"] == "far"]
    assert far.empty or (far["score"] < 0.05).all()


def test_pca_matches_exact(ray_session):
    """Distributed moment-combiner PCA == numpy PCA on the gathered matrix
    (up to the deterministic sign convention), regardless of partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import pca_fit, pca_transform

    rng = np.random.default_rng(3)
    n, dim, k = 300, 16, 5
    # anisotropic data so the spectrum is well-separated
    basis = np.linalg.qr(rng.normal(size=(dim, dim)))[0]
    scales = np.linspace(6, 0.1, dim)
    X = rng.normal(size=(n, dim)) * scales @ basis.T + rng.normal(size=dim)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(X.astype(np.float64)))})).repartition(7)

    m = pca_fit(ds, n_components=k)
    assert m["n_rows"] == n
    # exact reference
    mean = X.mean(0)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    W = evecs[:, order].T
    flip = np.sign(W[np.arange(k), np.abs(W).argmax(1)])
    W = W * flip[:, None]
    assert np.allclose(m["mean"], mean, atol=1e-9)
    assert np.allclose(m["explained_variance"], evals[order], atol=1e-9)
    assert np.allclose(m["components"], W, atol=1e-7)
    # orthonormal rows, descending variance
    assert np.allclose(m["components"] @ m["components"].T, np.eye(k), atol=1e-9)
    assert (np.diff(m["explained_variance"]) <= 1e-12).all()

    out = (pca_transform(ds, m, out_col="pca").to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    P = np.stack(out["pca"].to_numpy())
    assert np.allclose(P, (X - mean) @ W.T, atol=1e-7)
    # projection preserves component-wise variance == eigenvalues
    assert np.allclose(P.var(0, ddof=1), evals[order], atol=1e-7)


def _spam_corpus(n=400, seed=13):
    """Deterministic spam/clean corpus: clean docs draw from one vocabulary,
    spam docs mix in a distinct token set — a separable but noisy signal."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    clean_vocab = [f"word{i}" for i in range(50)]
    spam_vocab = ["buy", "cheap", "winner", "click", "free", "pills"]
    texts, labels = [], []
    for i in range(n):
        spam = i % 2 == 1
        toks = list(rng.choice(clean_vocab, size=30))
        if spam:
            toks += list(rng.choice(spam_vocab, size=8))
        rng.shuffle(toks)
        texts.append(" ".join(toks))
        labels.append(int(spam))
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": pa.array(texts, pa.string()),
                     "label": pa.array(labels, pa.int64())})


def test_logreg_learns_spam_filter(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import logreg_fit, logreg_predict

    t = _spam_corpus()
    train = rd.from_arrow(t.slice(0, 300)).repartition(4)
    test = rd.from_arrow(t.slice(300))
    m = logreg_fit(train, text_col="text", label_col="label",
                   dim=1024, iters=120, lr=0.3)
    assert m["tier"] == "driver"
    assert m["losses"][-1] < m["losses"][0] * 0.2, "loss did not drop"
    out = logreg_predict(test, m, text_col="text").to_pandas()
    acc = ((out["p_positive"] > 0.5).astype(int) == out["label"]).mean()
    assert acc >= 0.95, f"holdout accuracy {acc}"


def test_logreg_tier_parity(ray_session):
    """driver and streaming tiers run the same exact-gradient update: same
    weights to float tolerance regardless of partitioning."""
    import ray.data as rd

    from dedupe_examples_ray.ops import logreg_fit

    t = _spam_corpus(n=120, seed=5)
    ds = rd.from_arrow(t).repartition(5)
    md = logreg_fit(ds, dim=256, iters=5, force_tier="driver")
    ms = logreg_fit(ds, dim=256, iters=5, force_tier="stream")
    assert np.allclose(md["w"], ms["w"], atol=1e-10)
    assert abs(md["b"] - ms["b"]) < 1e-10
    assert np.allclose(md["losses"], ms["losses"], atol=1e-6)


def test_pagerank_exact_and_tier_parity(ray_session):
    """Driver tier == standalone numpy reference exactly; streaming tier
    (hash_join + combiner groupby per iteration) == driver tier to float
    tolerance; ranks sum to 1; a planted hub ranks first."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import pagerank
    from dedupe_examples_ray.ops.graph import _pagerank_numpy

    rng = np.random.default_rng(4)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    src = np.concatenate([src, rng.integers(0, 40, 60), [7]])
    # node 0 = hub; node 99 = planted dangling sink (dst only)
    dst = np.concatenate([dst, np.zeros(60, np.int64), [99]])
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())})).repartition(4)

    d = (pagerank(edges, iters=6, force_tier="driver").to_pandas()
         .sort_values("node").reset_index(drop=True))
    s = (pagerank(edges, iters=6, force_tier="stream").to_pandas()
         .sort_values("node").reset_index(drop=True))
    nodes = np.unique(np.concatenate((src, dst)))
    ref = _pagerank_numpy(src, dst, nodes, 0.85, 6)
    assert np.allclose(d["rank"].to_numpy(), ref)
    assert np.allclose(d["rank"].to_numpy(), s["rank"].to_numpy(), atol=1e-12)
    assert abs(d["rank"].sum() - 1.0) < 1e-9
    assert int(d.loc[d["rank"].idxmax(), "node"]) == 0
    # the planted dangling sink (node 99, no out-edges) still holds rank
    # and total mass stays 1 (its mass redistributes each iteration)
    assert (d["rank"].to_numpy() > 0).all()
    assert 99 in set(d["node"]) and 99 not in set(src)


def test_bm25_topk_matches_scalar_reference(ray_session):
    """bm25_topk == brute-force Okapi BM25 (Lucene idf), rounded ordering."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops.textstats import bm25_topk

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the five boxing wizards jump quickly",
        "quick quick quick brown fox",
        "",                       # empty doc: counts toward N and avgdl
        "lazy dog dog dog and a fox",
        "wizard of the liquor box",
    ]
    ids = list(range(len(docs)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(docs, pa.string())})
    queries = [("q_fox", "quick fox"), ("q_liquor", "liquor box"),
               ("q_dup", "dog dog lazy")]  # dup tokens collapse to a set
    k1, b, k = 1.2, 0.75, 3
    out = (bm25_topk(rd.from_arrow(tbl).repartition(3), queries, k=k)
           .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))

    # scalar reference
    toks = [d.split() for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    exp_rows = []
    for qid, qtext in queries:
        terms = sorted(set(qtext.split()))
        scores = {}
        for i, t in enumerate(toks):
            s = 0.0
            for w in terms:
                tf = t.count(w)
                if tf == 0:
                    continue
                df = sum(1 for tt in toks if w in tt)
                idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if s > 0:
                scores[i] = round(s, 4)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (i, s) in enumerate(top, 1):
            exp_rows.append((qid, i, s, r))
    import pandas as pd
    exp = pd.DataFrame(exp_rows, columns=["query_id", "doc_id", "score", "rank"]) \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["query_id", "doc_id", "score", "rank"]].astype(
            {"doc_id": "int64", "rank": "int64"}),
        exp.astype({"doc_id": "int64", "rank": "int64"}))
    # empty doc never retrieved
    assert 4 not in set(out["doc_id"])


def test_gopher_rules_hostile_inputs(ray_session):
    """gopher_rules on docs exercising every rule branch, vs hand-computed."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops.textstats import gopher_rules

    docs = [
        # 0: passes everything at min_words=5 (has 'the' and 'of')
        "the cat sat on top of the warm mat today",
        # 1: bullet-heavy — every line is a bullet
        "- one item\n\t* two item\n  • three item",
        # 2: ellipsis-heavy + symbols
        "first line...\nsecond goes on… \nhash # tags #### here...",
        # 3: empty
        "",
        # 4: null
        None,
        # 5: no alphabetic words at all
        "123 456 789 000 111",
        # 6: '....' counts ONE non-overlapping '...'
        "dots.... the of and end",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = (gopher_rules(rd.from_arrow(tbl).repartition(3), min_words=5,
                        min_stop_hits=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    assert out["n_words"].tolist() == [10, 9, 10, 0, 0, 5, 5]
    # doc 0: mean len = 31/10, all alpha, 2 stop hits -> pass
    assert abs(out["mean_word_len"][0] - 3.1) < 1e-9
    assert out["alpha_word_frac"][0] == 1.0 and out["stopword_hits"][0] == 2
    assert bool(out["gopher_pass"][0])
    # doc 1: 3/3 bullet lines (dash, tab+star, space+unicode bullet)
    assert out["bullet_line_frac"][1] == 1.0 and not bool(out["gopher_pass"][1])
    # doc 2: lines 1 and 2 end with ellipsis after rtrim; line 3 ends '...'
    assert abs(out["ellipsis_line_frac"][2] - 1.0) < 1e-9
    # symbols: 5 '#' + 2 '...' + 1 '…' = 8 over 10 words
    assert abs(out["symbol_ratio"][2] - round(8 / 10, 6)) < 1e-9
    # docs 3/4: zero words -> NULL ratios, one empty line, fail
    for i in (3, 4):
        assert np.isnan(out["mean_word_len"][i])
        assert out["bullet_line_frac"][i] == 0.0
        assert not bool(out["gopher_pass"][i])
    # doc 5: alpha fraction 0 -> fails alpha rule
    assert out["alpha_word_frac"][5] == 0.0 and not bool(out["gopher_pass"][5])
    # doc 6: non-overlapping '...' count is 1 ('....' -> one match + '.')
    assert abs(out["symbol_ratio"][6] - round(1 / 5, 6)) < 1e-9
    assert out["stopword_hits"][6] == 3


# ----------------------------------------------------------------- PQ ANN
def test_pq_encode_reconstructs_centroids():
    """Vectors that ARE codebook entries encode losslessly: ADC distance to
    themselves is 0 and argmin picks their own centroid."""
    from dedupe_examples_ray.ops.ann import pq_encode, pq_train

    rng = np.random.default_rng(11)
    X = rng.standard_normal((64, 16))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    books = pq_train(X, m=4, ksub=8, seed=3)
    m, ksub, dsub = books.shape
    # build vectors from one centroid per subspace
    V = np.concatenate([books[j][2 % ksub][None, :].repeat(3, 0)
                        for j in range(m)], axis=1)
    codes = pq_encode(V, books)
    assert (codes == 2 % ksub).all()


def test_pq_train_validates_and_clamps():
    import pytest as _pytest

    from dedupe_examples_ray.ops.ann import pq_train

    rng = np.random.default_rng(1)
    X = rng.standard_normal((10, 15))
    with _pytest.raises(ValueError):
        pq_train(X, m=4)
    books = pq_train(rng.standard_normal((10, 16)), m=4, ksub=256)
    assert books.shape == (4, 10, 4)  # ksub clamped to sample size


def test_ann_pq_finds_planted_cluster(ray_session):
    """Planted near-identical vectors must dominate the PQ top-k."""
    import ray.data as rd

    from dedupe_examples_ray.ops import ann_pq

    rng = np.random.default_rng(7)
    base = rng.standard_normal(32)
    rows = []
    for i in range(8):  # 8 near-clones of the probe
        rows.append({"vec_id": i, "embedding": (base + 0.01 * rng.standard_normal(32)).tolist()})
    for i in range(8, 300):  # background noise
        rows.append({"vec_id": i, "embedding": rng.standard_normal(32).tolist()})
    ds = rd.from_items(rows)
    out = ann_pq(ds, [(999, base)], k=8, m=8, ksub=16, seed=2)
    assert len(out) == 8
    hits = sum(1 for mid in out["match_id"] if mid < 8)
    assert hits >= 6, out  # quantization noise tolerance
    assert out["match_id"].iloc[0] < 8  # a clone ranks first


def test_ann_pq_empty_and_determinism(ray_session):
    import pandas as pd_

    import ray.data as rd

    from dedupe_examples_ray.ops import ann_pq

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    out = ann_pq(empty, [(1, np.ones(16))], k=3, m=4)
    assert len(out) == 0
    rng = np.random.default_rng(5)
    rows = [{"vec_id": i, "embedding": rng.standard_normal(16).tolist()}
            for i in range(50)]
    q = [(0, np.asarray(rows[0]["embedding"]))]
    a = ann_pq(rd.from_items(rows), q, k=5, m=4, ksub=8, seed=9)
    b = ann_pq(rd.from_items(rows), q, k=5, m=4, ksub=8, seed=9)
    pd_.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_minhash_verify_wave_path_parity(ray_session, monkeypatch):
    """The disk-bounded wave verify (pairs hydrated in hash waves so only one
    wave's text-carrying intermediates exist at a time) must produce the
    same assignment as the single-pass cogroup verify."""
    import pyarrow as pa
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = [
        {"doc_id": i, "text": f"shared words group {i % 9} plus filler tail " * 5}
        for i in range(400)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    base = (dd.minhash_lsh_dedup(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(dd, "_SEMI_HYDRATE_MAX", 0)      # force cogroup branch
    monkeypatch.setattr(dd, "_VERIFY_WAVE_BYTES", 1 << 12)  # force >1 wave
    waved = (dd.minhash_lsh_dedup(ds).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert base.equals(waved)


def test_minhash_uid_path_parity(ray_session):
    """String-keyed corpora route band/pair/CC shuffles through int64
    surrogate uids (8 bytes vs ~50-byte URLs); the (id, keep_id) output must
    be identical to the raw-string path."""
    import pyarrow as pa
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = [
        {"doc_id": f"https://h{i % 20}.example.com/p/{i}",
         "text": f"shared words group {i % 7} plus filler tail " * 5}
        for i in range(300)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    raw = (dd.minhash_lsh_dedup(ds, _use_uids=False).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    uid = (dd.minhash_lsh_dedup(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert raw.equals(uid)


def test_simhash_embedding_uid_path_parity(ray_session):
    """simhash/embedding dedup route string-keyed corpora through surrogate
    uids (surrogate_assignment); outputs must match the raw-string path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = [
        {"doc_id": f"https://h{i % 15}.ex.com/{i}",
         "text": f"words group {i % 5} filler tail " * 6}
        for i in range(180)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    a = (dd.simhash_dedup(ds, _use_uids=False).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dd.simhash_dedup(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)

    rng = np.random.default_rng(2)
    base = rng.normal(size=(8, 12))
    vecs = [
        {"vec_id": f"v/{i}",
         "embedding": (base[i % 8] + rng.normal(scale=1e-3, size=12)).tolist()}
        for i in range(96)
    ]
    vds = rd.from_arrow(pa.Table.from_pylist(vecs))
    a = (dd.embedding_cosine_dedup(vds, _use_uids=False).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (dd.embedding_cosine_dedup(vds).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert a.equals(b)
