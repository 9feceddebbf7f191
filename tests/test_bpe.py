"""ops/bpe.py: BPE tokenizer training (driver + streaming tiers) and encode."""

from __future__ import annotations

import pandas as pd
import pytest

from dedupe_examples_ray.ops.bpe import (
    _merge_word,
    _word_symbols,
    bpe_encode,
    bpe_train,
    bpe_train_reference,
)


def _ds(texts):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({"text": texts}))


def test_reference_matches_sennrich_worked_example():
    # the canonical example from the BPE paper/blog posts:
    # {low:5, lower:2, newest:6, widest:3}
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_reference(freqs, 4, min_freq=1)
    # most frequent first pair: ('e','s') count 9, then ('es','t') 9,
    # then ('est','</w>') 9, then ('l','o') 7
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]


def test_merge_word_non_overlapping():
    assert _merge_word(("a", "a", "a", "</w>"), ("a", "a")) == ("aa", "a", "</w>")
    assert _merge_word(_word_symbols("abab"), ("a", "b")) == ("ab", "ab", "</w>")


def test_tie_break_is_lexicographic():
    # 'ab' and 'cd' both appear twice -> ('a','b') < ('c','d') chosen first
    merges = bpe_train_reference({"ab": 2, "cd": 2}, 1, min_freq=1)
    assert merges == [("a", "b")]


def test_min_freq_stops_training():
    merges = bpe_train_reference({"xy": 1}, 10, min_freq=2)
    assert merges == []


@pytest.mark.parametrize("tier", ["driver", "streaming"])
def test_tiers_match_reference(ray_session, tier):
    texts = ["low low low low low lower lower",
             "newest newest newest widest widest",
             "newest newest newest widest"]
    got = bpe_train(_ds(texts), n_merges=8, min_freq=2, tier=tier)
    # scalar reference over the same word frequencies
    freqs: dict = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    exp = bpe_train_reference(freqs, 8, min_freq=2)
    assert got == exp


def test_encode_roundtrip_and_counts(ray_session):
    texts = ["low lower lowest", "low low newest"]
    merges = bpe_train(_ds(texts * 5), n_merges=10, min_freq=2, tier="driver")
    out = bpe_encode(_ds(texts), merges).to_pandas()
    for text, toks, n in zip(out["text"], out["bpe_tokens"], out["n_bpe_tokens"]):
        assert len(toks) == n
        # lossless: concatenating symbols and stripping </w> restores words
        rebuilt = "".join(toks).replace("</w>", " ").strip()
        assert rebuilt == text.lower()
    # trained words encode to their fully-merged training form
    enc = bpe_encode(_ds(["low"]), merges).to_pandas()["bpe_tokens"][0]
    freqs: dict = {}
    for t in texts * 5:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    from dedupe_examples_ray.ops.bpe import _apply_merges

    assert tuple(enc) == _apply_merges(_word_symbols("low"), merges)


def test_empty_and_null_text(ray_session):
    import ray.data as rd
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"text": pa.array([None, "", "a a a"])}))
    merges = bpe_train(ds, n_merges=3, min_freq=2, tier="driver")
    out = bpe_encode(ds, merges).to_pandas()
    assert out["n_bpe_tokens"].tolist()[:2] == [0, 0]
