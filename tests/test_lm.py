"""Byte-bigram LM perplexity scoring (ops/lm.py) vs a scalar reference."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest


def _ref_fit(texts, add_k=0.5):
    C = np.full((256, 256), add_k, dtype=np.float64)
    for s in texts:
        b = s.encode("utf-8")
        for i in range(len(b) - 1):
            C[b[i], b[i + 1]] += 1.0
    return -np.log2(C / C.sum(axis=1, keepdims=True))


def _ref_bpb(s, nll):
    b = s.encode("utf-8")
    if len(b) < 2:
        return 0.0
    return sum(nll[b[i], b[i + 1]] for i in range(len(b) - 1)) / (len(b) - 1)


def test_lm_perplexity_matches_scalar_reference(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.lm import lm_perplexity

    texts = ["the cat sat on the mat", "the dog sat on the log",
             "zzqxj#@!~|", "", "a", "the the the the",
             "naïve café — ünïcödé", "the quick brown fox"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = (lm_perplexity(rd.from_arrow(tbl).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    nll = _ref_fit(texts)
    exp = [_ref_bpb(s, nll) for s in texts]
    np.testing.assert_allclose(out["bits_per_byte"].to_numpy(), exp,
                               rtol=1e-12)
    # the in-distribution sentences score lower than the gibberish row
    assert out["bits_per_byte"][0] < out["bits_per_byte"][2]


def test_lm_fit_score_split_and_nulls(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.lm import bigram_lm_fit, bigram_lm_score

    clean = pa.table({"text": pa.array(["the cat sat"] * 50)})
    nll = bigram_lm_fit(rd.from_arrow(clean))
    assert nll.shape == (65536,) and np.isfinite(nll).all()

    probe = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(["the cat sat", "qqqqxxzz", None])})
    out = (bigram_lm_score(rd.from_arrow(probe), nll)
           .to_pandas().sort_values("doc_id"))
    assert out["bits_per_byte"].iloc[0] < out["bits_per_byte"].iloc[1]
    assert out["bits_per_byte"].iloc[2] == 0.0  # null text -> empty -> 0


def test_lm_fit_empty_corpus(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.lm import bigram_lm_fit

    empty = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    nll = bigram_lm_fit(empty)
    # uniform smoothed model: every bigram costs log2(256) = 8 bits
    np.testing.assert_allclose(nll, 8.0)


def test_dsir_log_weights_matches_scalar(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.lm import bigram_lm_fit, dsir_log_weights

    target = ["the cat sat on the mat", "the dog ate the bone",
              "the bird flew over the barn"]
    raw = ["the cat sat on a rug", "zzz qqq xxx jjj", "prices up 40% today",
           "the dog and the cat", ""]
    tds = rd.from_arrow(pa.table({"text": pa.array(target)}))
    rds = rd.from_arrow(pa.table({"doc_id": pa.array(range(len(raw)), pa.int64()),
                                  "text": pa.array(raw)}))
    out = (dsir_log_weights(rds, tds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    nll_t = _ref_fit(target).reshape(-1)
    nll_r = _ref_fit(raw).reshape(-1)

    def total(s, nll):
        b = s.encode("utf-8")
        return sum(nll[b[i] * 256 + b[i + 1]] for i in range(len(b) - 1))

    exp = [total(s, nll_r) - total(s, nll_t) for s in raw]
    np.testing.assert_allclose(out["log2_weight"].to_numpy(), exp, rtol=1e-10)
    # english-like rows weigh more than gibberish
    assert out["log2_weight"][0] > out["log2_weight"][1]
    assert out["log2_weight"][4] == 0.0  # empty doc: no evidence either way


def test_gumbel_topk_matches_brute_force(ray_session):
    import hashlib

    import ray.data as rd

    from dedupe_examples_ray.ops.lm import gumbel_topk_sample

    rng = np.random.default_rng(11)
    n, k = 300, 25
    lw = rng.normal(0, 20, size=n)
    lw[7] = np.nan  # excluded
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": pa.array(ids), "lw": pa.array(lw)})
    out = (gumbel_topk_sample(rd.from_arrow(tbl).repartition(5), "lw", "id", k)
           .to_pandas().sort_values("id"))

    u = np.array([(int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5)
                  / 2**32 for i in ids])
    gk = lw * np.log(2.0) - np.log(-np.log(u))
    gk[7] = -np.inf
    exp = np.sort(ids[np.argsort(-gk, kind="stable")][:k])
    assert (out["id"].to_numpy() == exp).all()
    assert 7 not in set(out["id"])
