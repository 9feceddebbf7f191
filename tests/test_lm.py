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
