"""PII redaction/flagging (ops/pii.py) and fixed-width chunking
(ops/corpus.chunk_text) — the scrub + context-window-packing stages of a
training-data pipeline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_examples_ray.ops import chunk_text, flag_pii, redact_pii

PII_ROWS = [
    (0, "reach bob.smith+x@mail.example.co.uk or 10.0.0.255 thanks"),
    (1, "call +1 (555) 010-0042 now; backup 555-010-9999, ip 192.168.1.1"),
    (2, "no pii here at all"),
    (3, "a@b.io x@y.museum 1.2.3.4 5.6.7.8 +44 20 7946 0958"),
    (4, ""),
    (5, None),
    (6, "edge@case.com."),
]


def _pii_ds():
    import ray.data as rd

    ids, texts = zip(*PII_ROWS)
    return rd.from_pandas(pd.DataFrame({"doc_id": list(ids), "text": list(texts)}))


def test_redact_pii_all_kinds(ray_session):
    out = redact_pii(_pii_ds()).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == "reach <EMAIL> or <IPV4> thanks"
    assert out.loc[1, "text"] == "call <PHONE> now; backup <PHONE>, ip <IPV4>"
    assert out.loc[2, "text"] == "no pii here at all"
    assert out.loc[3, "text"] == "<EMAIL> <EMAIL> <IPV4> <IPV4> <PHONE>"
    assert out.loc[4, "text"] == ""
    assert out.loc[5, "text"] is None or pd.isna(out.loc[5, "text"])
    assert out.loc[6, "text"] == "<EMAIL>."
    # counts are sentinel occurrences
    assert out.loc[3, ["n_email", "n_ipv4", "n_phone"]].tolist() == [2, 2, 1]
    assert out.loc[2, ["n_email", "n_ipv4", "n_phone"]].tolist() == [0, 0, 0]


def test_redact_pii_subset_and_out_col(ray_session):
    out = (
        redact_pii(_pii_ds(), out_col="clean", kinds=("email",), counts=False)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # original column untouched, only emails redacted in the copy
    assert out.loc[1, "text"].startswith("call +1 (555)")
    assert out.loc[0, "clean"] == "reach <EMAIL> or 10.0.0.255 thanks"
    assert "n_email" not in out.columns


def test_redact_pii_rejects_unknown_kind(ray_session):
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(_pii_ds(), kinds=("ssn",))


def test_flag_pii(ray_session):
    out = flag_pii(_pii_ds()).to_pandas().set_index("doc_id").sort_index()
    assert out["has_email"].tolist()[:4] == [True, False, False, True]
    assert out["has_ipv4"].tolist()[:4] == [True, True, False, True]
    assert out["has_phone"].tolist()[:4] == [False, True, False, True]
    # text is never rewritten by the flag pass
    assert out.loc[1, "text"].startswith("call +1")


def test_redact_matches_duckdb_regex(ray_session):
    """Arrow RE2 and DuckDB RE2 must agree on every pattern (oracle parity)."""
    import duckdb

    from dedupe_examples_ray.ops.pii import PII_PATTERNS

    got = redact_pii(_pii_ds(), counts=False).to_pandas().set_index("doc_id")["text"]
    con = duckdb.connect()
    expr = "s"
    for _, pat, rep in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    for doc_id, text in PII_ROWS:
        exp = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [text]).fetchone()[0]
        g = got.loc[doc_id]
        assert (pd.isna(g) and exp is None) or g == exp, (doc_id, g, exp)


# ------------------------------------------------------------ chunk_text


def _chunk_ref(text, size, overlap):
    if not text:
        return []
    stride = size - overlap
    return [text[k * stride : k * stride + size] for k in range((len(text) + stride - 1) // stride)]


def test_chunk_text_windows_and_overlap(ray_session):
    import ray.data as rd

    rows = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["abcdefghij", "abc", "", None]}
    )
    out = (
        chunk_text(rd.from_pandas(rows), size=4, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    per_doc = {d: g["chunk"].tolist() for d, g in out.groupby("doc_id")}
    assert per_doc[0] == _chunk_ref("abcdefghij", 4, 2) == ["abcd", "cdef", "efgh", "ghij", "ij"]
    assert per_doc[1] == ["abc", "c"]
    assert 2 not in per_doc and 3 not in per_doc  # empty/null -> no chunks
    # every adjacent pair overlaps by exactly `overlap` chars until the tail
    assert all(a[-2:] == b[:2] for a, b in zip(per_doc[0], per_doc[0][1:]))


def test_chunk_text_reconstructs_document(ray_session):
    """Concatenating chunk[k][0:stride] reconstructs the original text."""
    import ray.data as rd

    text = "the quick brown fox jumps over the lazy dog " * 12
    out = (
        chunk_text(rd.from_pandas(pd.DataFrame({"doc_id": [7], "text": [text]})), size=100, overlap=30)
        .to_pandas()
        .sort_values("chunk_id")["chunk"]
        .tolist()
    )
    rebuilt = "".join(c[:70] for c in out[:-1]) + out[-1]
    assert rebuilt == text


def test_chunk_text_validation_and_empty(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="overlap"):
        chunk_text(_pii_ds(), size=10, overlap=10)
    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "text": pd.Series([], dtype="object")}))
    out = chunk_text(empty, size=10, overlap=2).to_pandas()
    # Ray drops the schema entirely on fully-empty datasets; the contract
    # worth asserting is: no crash, zero rows, and no stray columns.
    assert len(out) == 0
    assert set(out.columns) <= {"doc_id", "chunk_id", "chunk"}
