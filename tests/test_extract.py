"""Golden tests for the deterministic HTML -> text extractor.

Contract (BASELINE.json input_hint): byte-identical extracted text per url.
Golden pairs live in tests/golden/{case}.html / {case}.txt.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pytest

from dedupe_examples_ray.extract import extract_batch, extract_text, transliterate

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(GOLDEN_DIR, "*.html"))
)


@pytest.mark.parametrize("case", CASES)
def test_golden_byte_identical(case):
    with open(os.path.join(GOLDEN_DIR, f"{case}.html"), "rb") as f:
        html = f.read()
    with open(os.path.join(GOLDEN_DIR, f"{case}.txt"), "rb") as f:
        golden = f.read()
    assert extract_text(html).encode("utf-8") == golden


def test_deterministic_repeat():
    html = b"<p>Caf\xc3\xa9 &amp; tea</p>"
    outs = {extract_text(html) for _ in range(5)}
    assert outs == {"Cafe & tea"}


def test_transliterate_fixed_table():
    assert transliterate("Æon Flüx — “naïve”") == 'AEon Flux - "naive"'
    assert transliterate("ascii only") == "ascii only"
    # unmapped non-ASCII is dropped, never passed through
    assert transliterate("日本語x").isascii()


def test_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<script>only();</script>") == ""


def test_extract_batch_arrow():
    htmls = [b"<p>a</p>", b"<h1>B &amp; C</h1>", None]
    t = pa.table({"url": ["u1", "u2", "u3"], "html": pa.array(htmls, pa.binary())})
    out = extract_batch(t)
    assert out.column_names == ["url", "html", "text"]
    assert out["text"].to_pylist() == ["a", "B & C", ""]


def test_hostile_inputs_no_crash_and_deterministic():
    """Adversarial payloads: random bytes, unterminated comment/script, deep
    nesting, angle-bracket bombs, invalid UTF-8 — extract_text must never
    raise, must return str, and must be run-to-run deterministic."""
    import random

    rng = random.Random(7)
    hostile = [
        bytes(rng.getrandbits(8) for _ in range(4096)),      # random binary
        b"<!-- never closed " + b"x" * 10000,                # unterminated comment
        b"<script>var a='" + b"y" * 10000,                   # unterminated script
        b"<div>" * 5000 + b"deep" + b"</div>" * 5000,        # deep nesting
        b"<" * 20000,                                        # angle-bracket bomb
        b">" * 20000,
        b"\xff\xfe\x00\x01 not utf8 \xc3\x28",               # invalid UTF-8
        b"<p>ok</p>" + b"\x00" * 100,                        # NULs
        "<p>café &amp; crème</p>".encode(),        # entities + accents
        b"",
    ]
    for payload in hostile:
        a = extract_text(payload)
        b = extract_text(payload)
        assert isinstance(a, str) and a == b
    # sanity on the well-formed one
    assert extract_text(hostile[8]) == "cafe & creme"


def test_extract_batch_hostile_through_ray(ray_session):
    """The same payloads survive the Ray map_batches path with a stable schema."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.extract import extract_batch

    payloads = [b"<p>hi</p>", b"<" * 5000, b"\xff\xfe", None, b""]
    t = pa.table({"url": [f"u{i}" for i in range(len(payloads))],
                  "html": pa.array(payloads, pa.binary())})
    out = rd.from_arrow(t).map_batches(extract_batch, batch_format="pyarrow").to_pandas()
    assert list(out.columns) == ["url", "html", "text"]
    assert out["text"].iloc[0] == "hi"
    assert (out["text"].notna()).all()
