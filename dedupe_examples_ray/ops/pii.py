"""PII detection / redaction over a text column — single-pass ``map_batches``.

A web-scale training corpus must scrub emails, phone numbers and IP
addresses before the text reaches a model.  The reference has no analog
(its world is already-structured CSV fields, e.g. csv_example.py:41-55);
this is the unstructured-text counterpart, built the Ray-Data way: one
stateless Arrow batch transform, all matching via RE2 kernels
(``pyarrow.compute.replace_substring_regex``), zero Python-per-row work.

Pattern parity note: pyarrow and DuckDB both embed RE2, so the exact
pattern strings below are bit-reproducible by a DuckDB
``regexp_replace(..., 'g')`` oracle — which is how the driver verifies this
operator end-to-end (see ``__ray_entry__.oracle_sql()['pii_redact_documents']``).

At 100 TB this stage is embarrassingly parallel: no shuffle, no state, no
broadcast; throughput is bounded by RE2 scan speed (~GB/s/core), so it
pipelines behind the Parquet read.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (kind, RE2 pattern, replacement sentinel) — applied IN ORDER.  Email runs
#: before phone so the digits of a local-part are never phone-matched; IPv4
#: runs before phone because dots are excluded from the phone class (an IP
#: can therefore never be eaten as a phone fragment, and vice versa).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
    ("phone", r"\+?\d[\d()\- ]{6,}\d", "<PHONE>"),
]

_KINDS = {k for k, _, _ in PII_PATTERNS}


def _redact_array(arr, kinds: tuple[str, ...]):
    """Apply the selected redactions, in PII_PATTERNS order, to a string array."""
    for kind, pattern, sentinel in PII_PATTERNS:
        if kind in kinds:
            arr = pc.replace_substring_regex(arr, pattern=pattern, replacement=sentinel)
    return arr


def redact_pii(
    ds,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    counts: bool = True,
):
    """Redact PII spans in ``text_col``; optionally append per-kind match counts.

    ``out_col=None`` overwrites ``text_col`` in place.  ``counts=True`` adds
    one ``n_<kind>: int64`` column per selected kind, counted as sentinel
    occurrences in the redacted text (exact, and cheaply reproducible by any
    SQL engine via length arithmetic — no second regex pass).  Sentinels
    already present in the *input* text would inflate the counts; a corpus
    that legitimately contains ``<EMAIL>`` literals should pass
    ``counts=False``.
    """
    unknown = set(kinds) - _KINDS
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    dst = out_col or text_col
    sentinels = [(k, s) for k, _, s in PII_PATTERNS if k in kinds]

    def fn(t: pa.Table) -> pa.Table:
        red = _redact_array(t[text_col], kinds)
        if dst in t.column_names:
            t = t.set_column(t.column_names.index(dst), dst, red)
        else:
            t = t.append_column(dst, red)
        if counts:
            for kind, sentinel in sentinels:
                n = pc.cast(pc.count_substring(red, sentinel), pa.int64())
                t = t.append_column(f"n_{kind}", n)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def flag_pii(ds, text_col: str = "text", kinds: tuple[str, ...] = ("email", "ipv4", "phone")):
    """Append one boolean ``has_<kind>`` column per kind (no rewriting).

    Cheaper than :func:`redact_pii` when the pipeline only routes/filters
    PII-bearing documents (e.g. quarantine before human review).
    """
    unknown = set(kinds) - _KINDS
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    pats = [(k, p) for k, p, _ in PII_PATTERNS if k in kinds]

    def fn(t: pa.Table) -> pa.Table:
        for kind, pattern in pats:
            t = t.append_column(f"has_{kind}", pc.match_substring_regex(t[text_col], pattern))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
