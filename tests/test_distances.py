"""Unit tests for distance kernels (reference-free known values)."""

from __future__ import annotations

import numpy as np
import pytest

from dedupe_examples_ray.distances import (
    affine_gap_sim,
    batch_jaro_winkler,
    batch_levenshtein_sim,
    cosine_tokens,
    exact_sim,
    haversine_km,
    haversine_sim,
    jaccard,
    jaro_winkler,
    price_sim,
    tokens,
)


def _lev_ref(a: str, b: str) -> int:
    """Plain O(nm) reference Levenshtein for cross-checking the batch kernel."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_batch_levenshtein_matches_reference():
    rng = np.random.default_rng(0)
    alpha = "abcdef"
    pairs = []
    for _ in range(300):
        la, lb = rng.integers(0, 12, 2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        pairs.append((a, b))
    pairs += [("", ""), ("abc", "abc"), ("abc", ""), ("", "xyz"), ("kitten", "sitting")]
    a_list = [p[0] for p in pairs]
    b_list = [p[1] for p in pairs]
    sims = batch_levenshtein_sim(a_list, b_list)
    for (a, b), s in zip(pairs, sims):
        if not a or not b:
            expected = 0.0
        else:
            expected = 1.0 - _lev_ref(a, b) / max(len(a), len(b))
        assert s == pytest.approx(expected), (a, b)


def test_batch_levenshtein_none_and_unicode():
    sims = batch_levenshtein_sim([None, "héllo", "same"], ["x", "hello", "same"])
    assert sims[0] == 0.0
    assert 0.5 < sims[1] < 1.0
    assert sims[2] == 1.0


def test_jaro_winkler_known_values():
    # classic published examples
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    out = batch_jaro_winkler(["MARTHA", None], ["MARHTA", "x"])
    assert out[0] == pytest.approx(0.9611, abs=1e-3) and out[1] == 0.0


def test_affine_gap():
    assert affine_gap_sim("same", "same") == 1.0
    assert affine_gap_sim("", "") == 1.0
    assert affine_gap_sim("abc", "") == 0.0
    # a single long gap is cheaper than scattered gaps under affine scoring
    contiguous = affine_gap_sim("abcdefgh", "abgh")
    scattered = affine_gap_sim("abcdefgh", "acegi")
    assert contiguous > scattered
    assert 0.0 < affine_gap_sim("kitten", "sitting") < 1.0


def test_token_cosine_and_jaccard():
    ta, tb = tokens("red fox jumps"), tokens("red fox sleeps")
    assert cosine_tokens(ta, tb) == pytest.approx(2 / 3)
    assert jaccard(ta, tb) == pytest.approx(2 / 4)
    assert cosine_tokens(ta, tokens(None)) == 0.0
    # idf downweights common tokens
    idf = {"red": 0.1, "fox": 0.1, "jumps": 3.0, "sleeps": 3.0}
    assert cosine_tokens(ta, tb, idf) < cosine_tokens(ta, tb)


def test_haversine():
    # London -> Paris ~343 km (published)
    d = haversine_km(51.5074, -0.1278, 48.8566, 2.3522)
    assert d == pytest.approx(343.5, abs=2.0)
    assert haversine_km(10, 20, 10, 20) == 0.0
    assert haversine_sim(10, 20, 10, 20) == 1.0


def test_price_and_exact():
    assert price_sim(100.0, 100.0) == 1.0
    assert price_sim(100.0, 50.0) == pytest.approx(0.5)
    assert price_sim(None, 5.0) == 0.0
    assert exact_sim("x", "x") == 1.0
    assert exact_sim(None, None) == 0.0
    assert exact_sim("x", "y") == 0.0


def test_batch_levenshtein_matches_scalar_reference():
    """int16 slab DP vs a straightforward scalar Wagner-Fischer."""
    import random

    from dedupe_examples_ray.distances import batch_levenshtein_sim

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev, d[j] = d[j], cur
        return d[len(b)]

    rng = random.Random(7)
    A, B = [], []
    for _ in range(500):
        A.append("".join(rng.choice("abcde ") for _ in range(rng.randint(0, 47))))
        B.append("".join(rng.choice("abcde ") for _ in range(rng.randint(0, 47))))
    got = batch_levenshtein_sim(A, B)
    for x, y, g in zip(A, B, got):
        exp = 0.0 if (not x or not y) else 1.0 - lev(x, y) / max(len(x), len(y))
        assert abs(g - exp) < 1e-12, (x, y)


def test_batch_affine_gap_matches_scalar():
    import random

    from dedupe_examples_ray.distances import affine_gap_sim, batch_affine_gap_sim

    rng = random.Random(3)
    A, B = [], []
    for _ in range(500):
        A.append("".join(rng.choice("abcd ") for _ in range(rng.randint(0, 40))))
        B.append("".join(rng.choice("abcd ") for _ in range(rng.randint(0, 40))))
    A += [None, "", "abc", "abc"]
    B += ["abc", "", None, "abc"]
    got = batch_affine_gap_sim(A, B)
    for x, y, g in zip(A, B, got):
        if not x and not y:
            exp = 1.0
        elif not x or not y:
            exp = 0.0
        else:
            exp = affine_gap_sim(x, y)
        assert abs(g - exp) < 1e-5, (x, y, g, exp)


def test_token_sig_cosine_matches_set_cosine():
    """Hash-signature cosine == tokens-set cosine (no idf)."""
    import math

    import pyarrow as pa

    from dedupe_examples_ray.distances import batch_token_sig_cosine, list_array_view
    from dedupe_examples_ray.normalize import token_signature_array

    a = ["red fox jumps", "alpha beta", "", "same same", "x y z"]
    b = ["fox red sleeps", "gamma delta", "anything", "same", "x y z"]
    sa = token_signature_array(pa.array(a))
    sb = token_signature_array(pa.array(b))
    oa, va, la = list_array_view(sa)
    ob, vb, lb = list_array_view(sb)
    got = batch_token_sig_cosine(oa, va, la, ob, vb, lb)
    for x, y, g in zip(a, b, got):
        ta, tb = set(x.split()), set(y.split())
        exp = len(ta & tb) / math.sqrt(len(ta) * len(tb)) if ta and tb else 0.0
        assert abs(g - exp) < 1e-12, (x, y, g, exp)
