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
