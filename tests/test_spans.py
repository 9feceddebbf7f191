"""Exact duplicate-span removal (ops/spans.py) — Lee et al. 2022 semantics
via winnowed Gear fingerprints (Schleimer 2003)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from dedupe_examples_ray.ops.spans import _winnow_positions, span_dedup


def _span(n_words: int, tag: str) -> str:
    # repetition-free long span: every word unique
    return " ".join(f"{tag}{j:04d}" for j in range(n_words))


def test_winnow_positions_guarantee():
    """Robust winnowing: every k-run of hashes contributes a selection, and
    identical hash windows select identical relative positions."""
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2**63, 500, dtype=np.uint64)
    k = 7
    sel = _winnow_positions(h, k)
    # coverage: no gap of k unselected positions beyond the first window
    gaps = np.diff(np.r_[sel, len(h)])
    assert gaps.max() <= k
    # determinism / shift invariance of the selected CONTENT
    sel2 = _winnow_positions(h.copy(), k)
    assert np.array_equal(sel, sel2)


def test_span_dedup_keep_first(ray_session):
    """A repetition-free shared span survives in full ONLY in the globally
    first document; later occurrences lose all interior fingerprint windows;
    unique documents pass through byte-identical."""
    shared = _span(80, "shr")  # ~640 bytes, no internal repeats
    rows = []
    for i in range(12):
        uniq = _span(60, f"u{i}x")
        text = (uniq[:100] + " " + shared + " " + uniq[100:]) if i % 3 == 0 else uniq
        rows.append({"doc_id": f"d{i:03d}", "text": text})
    ds = rd.from_items(rows).repartition(4)
    out = (span_dedup(ds, min_len=128, num_buckets=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 12
    by = dict(zip(out.doc_id, out.text))
    orig = {r["doc_id"]: r["text"] for r in rows}
    # first occurrence intact
    assert by["d000"] == orig["d000"]
    assert int(out[out.doc_id == "d000"].n_bytes_removed.iloc[0]) == 0
    # later occurrences lost most of the span (ends may survive: documented
    # ~min_len granularity) and never contain it whole
    for d in ("d003", "d006", "d009"):
        assert shared not in by[d]
        removed = int(out[out.doc_id == d].n_bytes_removed.iloc[0])
        assert removed >= len(shared) - 2 * 128
        # the doc's own unique words survive
        assert f"u{int(d[1:])}x0005" in by[d]
    # unique docs byte-identical
    for i in (1, 2, 4, 5):
        assert by[f"d{i:03d}"] == orig[f"d{i:03d}"]


def test_span_dedup_within_doc_repetition(ray_session):
    """Self-repetition inside ONE document: only the first copy survives."""
    unit = _span(50, "rep")
    text = ("intro " + unit + " middle " + unit + " outro " + unit)
    ds = rd.from_items([{"doc_id": "solo", "text": text}])
    out = span_dedup(ds, min_len=128).to_pandas()
    # interior words survive exactly once (span ENDS may survive in later
    # copies — the documented ~min_len granularity)
    assert out.text.iloc[0].count("rep0025") == 1
    assert int(out.n_spans_removed.iloc[0]) >= 2


def test_span_dedup_fixed_point_and_short_spans(ray_session):
    """Short duplicated strings (< min_len) are untouched; a second pass over
    the output removes nothing (fixed point); unicode survives valid."""
    short = "short dup phrase kept everywhere"
    docs = [
        {"doc_id": "a", "text": f"{_span(40, 'aa')} {short} é中{_span(5, 'u')}"},
        {"doc_id": "b", "text": f"{short} {_span(40, 'bb')} é中"},
    ]
    ds = rd.from_items(docs)
    out = span_dedup(ds, min_len=256).to_pandas().sort_values("doc_id")
    assert (out.n_bytes_removed == 0).all()
    assert list(out.text) == [docs[0]["text"], docs[1]["text"]]
    # fixed point on a corpus WITH removals
    shared = _span(100, "fp")
    ds2 = rd.from_items([
        {"doc_id": "x", "text": shared},
        {"doc_id": "y", "text": "prefix words " + shared},
    ])
    first = span_dedup(ds2, min_len=128).to_pandas()
    again = span_dedup(
        rd.from_pandas(first[["doc_id", "text"]]), min_len=128
    ).to_pandas()
    assert int(again.n_bytes_removed.sum()) == 0
    for t in again.text:
        t.encode("utf-8").decode("utf-8")  # valid round-trip


def test_span_dedup_min_len_guard(ray_session):
    with pytest.raises(ValueError, match="min_len"):
        span_dedup(rd.from_items([{"doc_id": "a", "text": "x"}]), min_len=64)


def test_span_dedup_unicode_boundary_cuts(ray_session):
    """Cut boundaries landing inside multi-byte UTF-8 sequences are snapped
    so every output text stays valid UTF-8 and untouched characters are
    preserved."""
    shared = _span(90, "uni")
    # bound the span with multi-byte chars so window edges land mid-char
    docs = [
        {"doc_id": "a", "text": "中文前缀" + shared + "日本語サフィックス"},
        {"doc_id": "b", "text": "éàüöñ λογος " + shared + " кирилица中"},
        {"doc_id": "c", "text": _span(50, "cc")},
    ]
    ds = rd.from_items(docs)
    out = (span_dedup(ds, min_len=128).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for t in out.text:
        assert t == t.encode("utf-8").decode("utf-8")  # valid round-trip
    by = dict(zip(out.doc_id, out.text))
    assert by["a"] == docs[0]["text"]          # keeper intact
    assert by["c"] == docs[2]["text"]          # unique doc untouched
    assert shared not in by["b"]               # later copy lost the interior
    assert by["b"].startswith("éàüöñ λογος")   # prefix chars survive whole


def test_span_dedup_tier_parity(ray_session, monkeypatch):
    """Broadcast and hash-join application tiers produce identical output."""
    import dedupe_examples_ray.ops.spans as sp

    shared = _span(100, "tp")
    rows = [{"doc_id": f"t{i:02d}",
             "text": (_span(30, f"v{i}") + " " + shared) if i % 2 == 0
             else _span(45, f"v{i}")} for i in range(10)]
    ds = rd.from_items(rows).repartition(3)
    bcast = (span_dedup(ds, min_len=128).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(sp, "_BCAST_DOCS_LIMIT", 0)
    joined = (span_dedup(ds, min_len=128).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        bcast[["doc_id", "text", "n_spans_removed", "n_bytes_removed"]],
        joined[["doc_id", "text", "n_spans_removed", "n_bytes_removed"]],
    )


def test_span_dedup_hostile_inputs(ray_session):
    """Nulls, empties, sub-window docs, and a doc that is ONE giant
    duplicated block all pass through without error."""
    big = _span(4000, "big")  # ~36 KB
    docs = [
        {"doc_id": "n1", "text": None},
        {"doc_id": "e1", "text": ""},
        {"doc_id": "s1", "text": "tiny"},
        {"doc_id": "g1", "text": big},
        {"doc_id": "g2", "text": big},
        {"doc_id": "g3", "text": big},
    ]
    out = (span_dedup(rd.from_items(docs), min_len=128).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 6
    by = dict(zip(out.doc_id, out.text))
    assert by["n1"] == "" and by["e1"] == "" and by["s1"] == "tiny"
    assert by["g1"] == big                      # keeper intact
    for d in ("g2", "g3"):                      # clones nearly emptied
        assert len(by[d]) < 300
    rem = dict(zip(out.doc_id, out.n_bytes_removed))
    assert rem["g2"] > len(big) - 300 and rem["g3"] > len(big) - 300


from hypothesis import given, settings as hyp_settings, strategies as st


@hyp_settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=300),
    k=st.integers(1, 40),
)
def test_winnow_properties(vals, k):
    """Hypothesis: (1) selection coverage — no k-run of window positions
    without a selection; (2) content-determinism — an identical hash
    subarray embedded at a different offset selects the same CONTENT
    positions in its interior (the winnowing/MOSS locality property)."""
    h = np.asarray(vals, dtype=np.uint64)
    sel = _winnow_positions(h, k)
    assert len(sel) >= 1
    assert (np.diff(np.r_[sel, len(h)]) <= k).all()
    assert (sel >= 0).all() and (sel < len(h)).all()
    # locality: embed h after a random-ish prefix; interior selections
    # (at least k away from both ends) must reappear shifted
    if len(h) >= 3 * k:
        pre = np.asarray([(v * 2654435761) % (2**63) for v in vals[:k]], np.uint64)
        h2 = np.concatenate([pre, h])
        sel2 = set(_winnow_positions(h2, k).tolist())
        interior = sel[(sel >= k) & (sel < len(h) - k)]
        for p in interior:
            assert int(p) + len(pre) in sel2


def test_span_dedup_empty_corpus(ray_session):
    """A zero-removal and an all-empty corpus both come back typed."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["", ""], pa.string()),
    }))
    out = span_dedup(ds, min_len=128).to_pandas()
    assert len(out) == 2 and (out.n_bytes_removed == 0).all()
