"""Tests for vectorized preProcess normalizers (reference M1-M12 semantics)."""

from __future__ import annotations

import pyarrow as pa

from dedupe_examples_ray.config import Field, Settings, default_page_settings, fit_logistic
from dedupe_examples_ray.normalize import (
    concat_ws,
    derive_page_fields,
    empty_to_null,
    normalize_string_array,
    parse_price,
)


def test_normalize_string_array():
    arr = pa.array(["  Foo   BAR  ", "O'Neil-Smith", "", None, "Café!"])
    out = normalize_string_array(arr)
    assert out.to_pylist() == ["foo bar", "oneil smith", None, None, "cafe"]


def test_normalize_keep_punct():
    out = normalize_string_array(pa.array(["A-B's"]), strip_punct=False)
    assert out.to_pylist() == ["a-b's"]


def test_empty_to_null_and_concat_ws():
    assert empty_to_null(pa.array(["a", "", None])).to_pylist() == ["a", None, None]
    out = concat_ws(" ", pa.array(["John", None, ""]), pa.array(["Doe", "Solo", None]))
    assert out.to_pylist() == ["John Doe", "Solo", None]


def test_parse_price():
    out = parse_price(pa.array(["$12.50", "7", "", None]))
    assert out.to_pylist() == [12.5, 7.0, None, None]


def test_derive_page_fields():
    t = pa.table(
        {
            "url": ["https://m3.foo12.example/a/b", "https://bar.example/x"],
            "text": ["My Great Title\nbody words here\nmore", "OnlyTitle"],
        }
    )
    out = derive_page_fields(t)
    assert out["title"].to_pylist() == ["my great title", "onlytitle"]
    assert out["body"].to_pylist() == ["body words here more", None]
    assert out["host"].to_pylist() == ["foo12.example", "bar.example"]
    assert out["path"].to_pylist() == ["a b", "x"]


def test_settings_roundtrip_and_fingerprint():
    s = default_page_settings()
    s2 = Settings.from_json(s.to_json())
    assert s2.to_json() == s.to_json()
    assert s2.fingerprint() == s.fingerprint()
    s2.threshold = 0.7
    assert s2.fingerprint() != s.fingerprint()
    names = s.feature_names()
    assert "title" in names and "body__missing" in names
    assert len(s.weight_vector()) == len(names)


def test_settings_interaction_feature_names():
    s = Settings(fields=[Field("a"), Field("b")], interactions=[("a", "b")])
    assert s.feature_names() == ["a", "b", "a*b"]


def test_fit_logistic_separable():
    import numpy as np

    rng = np.random.default_rng(1)
    X = rng.normal(size=(400, 2))
    y = (X[:, 0] + 2 * X[:, 1] > 0).astype(float)
    w, b = fit_logistic(X, y, iters=500)
    p = 1 / (1 + np.exp(-(X @ w + b)))
    acc = ((p > 0.5) == (y > 0.5)).mean()
    assert acc > 0.95
    # deterministic
    w2, b2 = fit_logistic(X, y, iters=500)
    assert np.allclose(w, w2) and b == b2


def test_json_scalar_field():
    import pyarrow as pa

    from dedupe_examples_ray.normalize import json_scalar_field

    a = pa.array(['{"k": 69}', '{"k": -3, "z": "x"}', '{"z": 1}', None,
                  'garbage', '{"k": null}', '{"k": "he llo"}', '{"k": 2.5}',
                  '{"k": true}', '{"k":"esc\\"aped"}'])
    got = json_scalar_field(a, "k").to_pylist()
    assert got == ["69", "-3", None, None, None, None, "he llo", "2.5",
                   "true", 'esc\\"aped']
    ints = json_scalar_field(pa.array(['{"k": 1}', '{"k": 7}']), "k",
                             pa.int64()).to_pylist()
    assert ints == [1, 7]
    # round-2 advice: only the UNQUOTED null becomes SQL NULL; the quoted
    # string "null" stays the string (json_extract_string semantics)
    quoted = json_scalar_field(pa.array(['{"k": "null"}', '{"k": null}']), "k").to_pylist()
    assert quoted == ["null", None]


def test_unicode_normalize_forms_and_strip_marks():
    """Composition (NFC/NFKC), compatibility folding, accent strip, ASCII
    zero-copy passthrough, nulls, and form validation."""
    import pyarrow as pa
    import pytest

    from dedupe_examples_ray.normalize import unicode_normalize

    dec = "café niño"          # decomposed
    comp = "café niño"           # composed
    out = unicode_normalize(
        pa.array([dec, comp, "plain", None, ""]), "NFC").to_pylist()
    assert out[0] == out[1] == comp        # both byte forms converge
    assert out[2] == "plain" and out[3] is None and out[4] == ""
    # NFD decomposes the composed form back
    nfd = unicode_normalize(pa.array([comp]), "NFD").to_pylist()[0]
    assert nfd == dec
    # NFKC folds compatibility chars (ligature, fullwidth) AND composes
    nfkc = unicode_normalize(
        pa.array(["ﬁle Ａ " + dec]), "NFKC").to_pylist()[0]
    assert nfkc == "file A " + comp
    # strip_marks removes ALL category-Mn marks (incl. non-Latin: nukta)
    sm = unicode_normalize(
        pa.array([dec, "h़indi"]), "NFC", strip_marks=True).to_pylist()
    assert sm == ["cafe nino", "hindi"]
    with pytest.raises(ValueError):
        unicode_normalize(pa.array(["a"]), "NFX")


def test_fix_mojibake():
    """Single and double cp1252 mojibake repair; genuine text untouched."""
    import pyarrow as pa

    from dedupe_examples_ray.normalize import fix_mojibake

    orig = "café ñiño “quote€ — naïve…"

    def sloppy(bs):  # browser-style windows-1252 decode (C1 passthrough)
        return "".join(
            bytes([b]).decode("cp1252")
            if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D) else chr(b)
            for b in bs)

    moji = sloppy(orig.encode("utf-8"))
    double = sloppy(moji.encode("utf-8"))
    genuine = ["plain", None, "SÃO PAULO não", "Ã",
               "café… genuine", "АБВ"]
    got = fix_mojibake(pa.array([moji, double, orig] + genuine)).to_pylist()
    assert got[0] == got[1] == got[2] == orig
    assert got[3:] == genuine
    # chunked input, empty array, all-ASCII zero-copy path
    assert fix_mojibake(pa.chunked_array([[moji], [None]])).to_pylist() == [orig, None]
    assert fix_mojibake(pa.array([], pa.string())).to_pylist() == []
    assert fix_mojibake(pa.array(["abc"])).to_pylist() == ["abc"]
