"""Vectorized preProcess normalizers (reference csv_example.py:26-38 & variants).

The reference normalizes every value at read time: unidecode -> collapse
whitespace -> strip quotes/punctuation -> lower -> empty->None
(csv_example/csv_example.py:26-38; punctuation-stripping variant
record_linkage_example/record_linkage_example.py:20-37; SQL CASE WHEN '' THEN
NULL sweep mysql_example/mysql_init_db.py:219-235).

Here normalization is a config-driven, Arrow-vectorized ``map_batches`` stage:
``pyarrow.compute`` kernels do the hot work (lower, regex replace, trim); the
transliteration fallback only runs on rows containing non-ASCII (rare after
extraction, which already transliterates).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .extract import transliterate

# Punctuation handling of the M2 variant (record_linkage_example.py:20-37):
# some characters are deleted, some become spaces.
_DELETE_RE = r"['\"`,\.\!\?\(\)\[\]\{\};]"
_TO_SPACE_RE = r"[-/:_\|]"


def _string_array_view(arr: pa.Array):
    """(offsets int64[n+1], data uint8[total_bytes]) zero-copy views of a
    (non-large) StringArray, handling a nonzero array offset; None when the
    layout isn't the plain utf8 one (callers fall back to a kernel)."""
    import numpy as np

    if not pa.types.is_string(arr.type):
        return None
    n = len(arr)
    bufs = arr.buffers()
    if len(bufs) < 3 or bufs[1] is None:
        return None
    offs = np.frombuffer(bufs[1], np.int32)[arr.offset: arr.offset + n + 1]
    offs = offs.astype(np.int64)
    data = (
        np.frombuffer(bufs[2], np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return offs, data


# RE2's \s is exactly {\t \n \f \r ' '} (NO \v, no Unicode whitespace) —
# verified against pyarrow and DuckDB regexp_replace; all multi-byte UTF-8
# code units are >= 0x80, so a byte-level pass is safe on UTF-8 data.
_WS_TRANSLATE = None


def collapse_whitespace_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Exact equivalent of ``replace_substring_regex(arr, r"\\s+", " ")``,
    ~15x faster: one byte-level translate + run-collapse over the values
    buffer instead of an RE2 rewrite (the single hottest normalizer kernel —
    206 of 325 ms per 40k-page batch before this)."""
    import numpy as np

    global _WS_TRANSLATE
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    view = _string_array_view(arr)
    if view is None:  # large_string/dictionary/... — keep the kernel path
        return pc.replace_substring_regex(arr, r"\s+", " ")
    offs, data = view
    n = len(arr)
    lo, hi = int(offs[0]), int(offs[-1])
    if n == 0 or hi == lo:
        return arr
    b = data[lo:hi]
    offs = offs - lo
    if _WS_TRANSLATE is None:
        tbl = np.arange(256, dtype=np.uint8)
        tbl[[9, 10, 12, 13]] = 32
        _WS_TRANSLATE = tbl
    trans = _WS_TRANSLATE[b]
    ws = trans == 32
    if not ws.any():
        return arr
    prev_ws = np.empty_like(ws)
    prev_ws[0] = False
    prev_ws[1:] = ws[:-1]
    # a whitespace run never spans rows: first byte of each row keeps itself
    starts = offs[:-1]
    prev_ws[starts[starts < len(ws)]] = False
    drop = ws & prev_ws
    if not drop.any():  # translated but no runs: offsets unchanged
        out = pa.StringArray.from_buffers(
            n, pa.py_buffer(offs.astype(np.int32)), pa.py_buffer(trans)
        )
    else:
        cum = np.zeros(len(drop) + 1, np.int32)
        np.cumsum(drop, out=cum[1:])
        new_offs = (offs - cum[offs]).astype(np.int32)
        new_data = trans[~drop]
        out = pa.StringArray.from_buffers(
            n, pa.py_buffer(new_offs), pa.py_buffer(new_data)
        )
    if arr.null_count:
        out = pc.if_else(pc.is_null(arr), pa.nulls(n, pa.string()), out)
    return out


def _all_ascii(arr: pa.Array) -> bool:
    """Numpy probe over the values buffer (replaces a full RE2 scan)."""
    import numpy as np

    view = _string_array_view(arr)
    if view is None:
        mask = pc.match_substring_regex(arr, r"^[\x00-\x7F]*$")
        return pc.min(mask).as_py() is not False
    offs, data = view
    lo, hi = int(offs[0]), int(offs[-1])
    if hi == lo:
        return True
    return int(data[lo:hi].max()) < 128


def normalize_string_array(arr: pa.Array | pa.ChunkedArray, strip_punct: bool = True) -> pa.Array:
    """unidecode -> (punct) -> lower -> collapse ws -> trim -> ''->null.

    Mirrors reference M1/M2 semantics; RE2 regex (pyarrow) keeps parity with a
    DuckDB ``regexp_replace`` oracle.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    # transliteration fallback only where needed
    if len(arr) and not _all_ascii(arr):
        vals = arr.to_pylist()
        vals = [None if v is None else (v if v.isascii() else transliterate(v)) for v in vals]
        arr = pa.array(vals, pa.string())
    if strip_punct:
        arr = pc.replace_substring_regex(arr, _DELETE_RE, "")
        arr = pc.replace_substring_regex(arr, _TO_SPACE_RE, " ")
    arr = pc.utf8_lower(arr)
    arr = collapse_whitespace_array(arr)
    arr = pc.utf8_trim_whitespace(arr)
    return pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)


def empty_to_null(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SQL ``CASE WHEN col = '' THEN NULL`` sweep (mysql_init_db.py:219-235)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)


def concat_ws(sep: str, *arrays) -> pa.Array:
    """``CONCAT_WS`` (mysql_init_db.py:241-253): null-skipping join."""
    arrays = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays]
    filled = [pc.fill_null(a, "") for a in arrays]
    out = pc.binary_join_element_wise(*filled, sep)
    out = pc.replace_substring_regex(out, f"({sep})+", sep)
    out = pc.replace_substring_regex(out, f"^{sep}|{sep}$", "")
    return pc.if_else(pc.equal(out, ""), pa.nulls(len(out), pa.string()), out)


def parse_price(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip leading ``$``, cast float, ''->null (record_linkage_example.py:52-53)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    arr = pc.replace_substring_regex(arr, r"^\$", "")
    arr = pc.utf8_trim_whitespace(arr)
    arr = pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)
    return pc.cast(arr, pa.float64())


def latlong_struct(lat_arr, lng_arr) -> pa.Array:
    """(lat, lng) struct column; (0,0) -> null sentinel (patent_example.py:29-32, M4)."""
    if isinstance(lat_arr, pa.ChunkedArray):
        lat_arr = lat_arr.combine_chunks()
    if isinstance(lng_arr, pa.ChunkedArray):
        lng_arr = lng_arr.combine_chunks()
    lat = pc.cast(lat_arr, pa.float64(), safe=False)
    lng = pc.cast(lng_arr, pa.float64(), safe=False)
    zero = pc.and_(pc.equal(pc.fill_null(lat, 1.0), 0.0), pc.equal(pc.fill_null(lng, 1.0), 0.0))
    struct = pc.make_struct(lat, lng, field_names=["lat", "lng"])
    return pc.if_else(zero, pa.nulls(len(struct), struct.type), struct)


def split_set_field(arr, delim: str = "**", drop: tuple = ("none", "")) -> pa.Array:
    """Delimited string -> sorted list<string>, dropping sentinel tokens;
    empty -> null (patent_example.py:33-44, M5)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = pc.cast(arr, pa.string()).to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        items = sorted({p.strip().lower() for p in v.split(delim)} - set(drop))
        out.append(items if items else None)
    return pa.array(out, pa.list_(pa.string()))


def null_flag(arr, name_true: str = "true", name_false: str = "false") -> pa.Array:
    """Categorical missing-ness flag (``person = ISNULL(first_name)``,
    mysql_init_db.py:253, M12)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.if_else(arr.is_valid(), pa.scalar(name_false), pa.scalar(name_true))


def parse_date(arr, fmt: str = "%m/%d/%Y") -> pa.Array:
    """``STR_TO_DATE`` (mysql_init_db.py:190, M10): unparseable -> null.

    Vectorized Arrow kernel (``pc.strptime`` with ``error_is_null``) — no
    per-value Python parse.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    return pc.strptime(arr, format=fmt, unit="us", error_is_null=True)


# Signature hash width: 32-bit halves the dominant column of the hydrated
# pair rows (the scoring stage's DRAM-bound residual, round-3 verdict #4).
# Per-pair false token matches run at ~|sig|^2/2^32 (~4e-7 for 40-token
# bodies) — far inside the score-threshold margins; the gold-corpus e2e
# asserts the entity map is unchanged.  Pass bits=64 for the old width.
SIG_BITS_DEFAULT = 32


def sig_hash_width(arr_type: pa.DataType) -> int:
    """Hash width (bits) of a signature list column's values."""
    return 32 if pa.types.is_uint32(arr_type.value_type) else 64


def token_signature_array(
    str_arr: pa.Array | pa.ChunkedArray, bits: int = SIG_BITS_DEFAULT
) -> pa.Array:
    """Per-record token signature: sorted unique token hashes as
    ``list<uint32>`` (``bits=64``: ``list<uint64>``); null/empty strings ->
    empty list.

    Tokenization is a PER-RECORD cost paid once here, not per candidate pair
    in the scorer — the ``token_cosine`` comparator then intersects two sorted
    numpy slices with zero Python-object materialization.  Fully vectorized:
    one split kernel, ONE hash call over the whole batch's flattened tokens,
    one lexsort for within-record sort+unique.
    """
    import numpy as np
    import pandas as pd

    if bits not in (32, 64):
        raise ValueError(f"bits must be 32 or 64, got {bits}")
    np_t = np.uint32 if bits == 32 else np.uint64
    pa_t = pa.uint32() if bits == 32 else pa.uint64()
    if isinstance(str_arr, pa.ChunkedArray):
        str_arr = str_arr.combine_chunks()
    n = len(str_arr)
    filled = pc.fill_null(pc.cast(str_arr, pa.string()), "")
    toks = pc.split_pattern(filled, " ")
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    lens = offs[1:] - offs[:-1]
    # empty/null input rows produce one "" token from split — drop those rows
    empty_rows = pc.equal(filled, "").to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32)), pa.array([], pa_t)
        )
    h = pd.util.hash_array(flat.to_pandas().to_numpy(dtype=object)).astype(np.uint64)
    if bits == 32:
        h = h.astype(np.uint32)  # keep the low word (truncation, not rehash)
    rec = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep_tok = ~empty_rows[rec]
    h, rec = h[keep_tok], rec[keep_tok]
    M = int(lens.max()) if len(lens) else 0
    if M and M <= 512 and n * M <= 64_000_000:
        # padded row sort: scatter into an (n, max_tokens) sentinel matrix,
        # one contiguous axis-1 sort + neighbour-diff dedup — ~5x faster
        # than the ragged lexsort for the short-rows common case (parity
        # asserted in tests).  A real hash equal to the sentinel would be
        # dropped (p ~ n_tokens/2^64 — negligible).
        FULL = np_t(np.iinfo(np_t).max)
        row_starts = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(rec, minlength=n), out=row_starts[1:])
        pos = np.arange(len(h), dtype=np.int64) - row_starts[rec]
        mat = np.full((n, M), FULL, np_t)
        mat[rec, pos] = h
        mat.sort(axis=1)
        keep = mat != FULL
        keep[:, 1:] &= mat[:, 1:] != mat[:, :-1]
        hs = mat[keep]
        new_lens = keep.sum(1)
    else:  # long/ragged tail: ragged lexsort path
        order = np.lexsort((h, rec))
        hs, rs = h[order], rec[order]
        dedup = np.ones(len(hs), dtype=bool)
        dedup[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        hs, rs = hs[dedup], rs[dedup]
        new_lens = np.bincount(rs, minlength=n)
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    return pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()), pa.array(hs, pa_t)
    )


def derive_page_fields(batch: pa.Table, text_col: str = "text", url_col: str = "url") -> pa.Table:
    """Derive the compared entity-resolution fields from a pages batch.

    The reference compares declared columns (csv_example.py:102-107); for web
    pages we derive them: ``title`` = first line of extracted text, ``body`` =
    remainder (capped), ``host``/``path`` from the url.  All normalized.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.cast(text, pa.string())
    split = pc.split_pattern(text, "\n", max_splits=1)
    title = pc.list_element(split, 0)
    rest = pc.list_slice(split, 1, 2, return_fixed_size_list=True)
    body = pc.list_element(rest, 0)
    body = pc.utf8_slice_codeunits(pc.replace_substring(body, "\n", " "), 0, 400)

    url = batch[url_col]
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    url = pc.cast(url, pa.string())
    nohost = pc.replace_substring_regex(url, r"^[a-z]+://", "")
    host = pc.replace_substring_regex(nohost, r"/.*$", "")
    # strip mirror prefixes like m3. so host blocks across mirrors; keep apex
    apex = pc.replace_substring_regex(host, r"^m\d+\.", "")
    path = pc.replace_substring_regex(nohost, r"^[^/]*", "")

    out = batch
    body_norm = normalize_string_array(body)
    for name, col in [
        ("title", normalize_string_array(title)),
        ("body", body_norm),
        ("body_sig", token_signature_array(body_norm)),
        ("host", normalize_string_array(apex, strip_punct=False)),
        ("path", normalize_string_array(path)),
    ]:
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, col)
    return out


def json_scalar_field(arr, field: str, out_type: pa.DataType | None = None):
    """Vectorized JSON scalar-field extraction (the per-event ``props`` column
    pattern): pull ``"field": <scalar>`` out of a JSON-object string column
    with ONE Arrow regex kernel — no per-row ``json.loads`` in the hot path.

    Exact for machine-generated flat objects (no nesting, no escaped quotes
    inside the target value — the shape event/telemetry props columns have).
    Strings are returned unquoted; numbers/bools/null via ``out_type`` cast.
    Missing field or non-object input -> null (json_extract semantics).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    # two single-kernel passes (Arrow extract_regex backfills non-matching
    # named groups with "" inside one alternation, so they can't share one)
    key = r'"' + field + r'"\s*:\s*'
    s = pc.struct_field(
        pc.extract_regex(arr, key + r'"(?P<s>(?:[^"\\]|\\.)*)"'), "s"
    )
    v = pc.struct_field(
        pc.extract_regex(
            arr, key + r"(?P<v>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?|true|false|null)"
        ),
        "v",
    )
    # JSON null -> SQL NULL only on the UNQUOTED branch: a quoted string
    # value that is literally "null" stays the string 'null'
    # (json_extract_string semantics — advice item, round 2)
    v = pc.if_else(pc.equal(v, "null"), pa.nulls(len(arr), pa.string()), v)
    out = pc.if_else(pc.is_valid(s), s, v)
    if out_type is not None:
        out = pc.cast(out, out_type)
    return out


_MN_TABLE: dict | None = None


def _mn_translate_table() -> dict:
    """str.translate deletion table for every category-Mn codepoint
    (nonspacing combining marks), built once per process on first use."""
    global _MN_TABLE
    if _MN_TABLE is None:
        import sys
        import unicodedata

        _MN_TABLE = {c: None for c in range(sys.maxunicode + 1)
                     if unicodedata.category(chr(c)) == "Mn"}
    return _MN_TABLE


def unicode_normalize(arr, form: str = "NFC", strip_marks: bool = False):
    """Unicode normalization (UAX #15) — the canonicalization pass every
    multilingual web corpus needs before exact/near dedup (composed vs
    decomposed byte sequences of the SAME text otherwise hash apart).
    With ``strip_marks=True`` the text is compatibility/canonically
    decomposed first and combining marks (``\\p{Mn}``) removed — the
    standard accent-fold — before the requested form is applied.  NULLs pass
    through.  ``form`` in {NFC, NFKC, NFD, NFKD}.

    NFC output is bit-identical to DuckDB ``nfc_normalize`` (same UAX #15),
    which the oracle query checks.

    Vectorization note: pyarrow's ``utf8_normalize`` (utf8proc, checked on
    16.1) does NOT perform canonical COMPOSITION — ``e + U+0301`` survives
    its "NFC" — so composition runs through CPython's C-level
    ``unicodedata.normalize``, applied ONLY to rows one Arrow regex kernel
    flags as non-ASCII.  ASCII rows (the overwhelming share of web text)
    pass through zero-copy; the per-row C call touches just the multilingual
    minority.
    """
    import unicodedata

    import numpy as np

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC/NFKC/NFD/NFKD, got {form!r}")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    non_ascii = pc.fill_null(
        pc.match_substring_regex(arr, r"[^\x00-\x7F]"), False
    ).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(non_ascii)
    if len(idx) == 0:
        return arr
    sub = arr.take(pa.array(idx, pa.int64())).to_pylist()
    if strip_marks:
        decomp = "NFKD" if form in ("NFKC", "NFKD") else "NFD"
        _mn = _mn_translate_table()
        sub = [unicodedata.normalize(decomp, s).translate(_mn) for s in sub]
    fixed = pa.array([unicodedata.normalize(form, s) for s in sub],
                     pa.string())
    out = arr.to_numpy(zero_copy_only=False).astype(object)
    out[idx] = fixed.to_numpy(zero_copy_only=False)
    return pa.array(out, pa.string(), from_pandas=True)


# UTF-8 bytes misread as windows-1252 leave a lead char in C2-C5/E2 (the
# misdecoded UTF-8 lead byte) followed by a misdecoded continuation byte:
# either a Latin-1 char in U+00A0-U+00BF or one of the 27 cp1252 punctuation
# mappings of 0x80-0x9F (plus the five C1 passthrough holes).  Genuine text
# almost never pairs these; the repair is additionally gated on the cp1252
# round-trip decoding as VALID UTF-8, which random real text fails.
_MOJIBAKE_SIG_RE = (
    "[\u00C2-\u00C5\u00E2]"
    "[\u00A0-\u00BF\u20AC\u201A\u0192\u201E\u2026\u2020\u2021"
    "\u02C6\u2030\u0160\u2039\u0152\u017D\u2018\u2019\u201C"
    "\u201D\u2022\u2013\u2014\u02DC\u2122\u0161\u203A\u0153"
    "\u017E\u0178\u0081\u008D\u008F\u0090\u009D]"
)


def _sloppy_cp1252_bytes(s: str) -> bytes:
    """Encode back to the byte stream a cp1252 misdecode produced.

    cp1252 leaves five bytes unmapped (0x81 0x8D 0x8F 0x90 0x9D); browsers
    (WHATWG windows-1252) pass them through as the C1 controls U+0081 etc.,
    so the reverse map falls back to latin-1 for exactly those codepoints.
    """
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        out = bytearray()
        for ch in s:
            try:
                out += ch.encode("cp1252")
            except UnicodeEncodeError:
                o = ord(ch)
                if o > 0xFF:        # genuinely non-cp1252 text: not mojibake
                    raise
                out.append(o)
        return bytes(out)


def fix_mojibake(arr, max_passes: int = 3):
    """Repair UTF-8-decoded-as-cp1252 mojibake ('cafÃ©' -> 'café').

    The single most common encoding corruption in web crawls: a UTF-8 byte
    stream decoded under windows-1252 (the core case of the public ftfy
    tool — algorithmic idea only, no code reuse).  A row is touched ONLY if
    (a) it matches a two-char mojibake signature (see _MOJIBAKE_SIG_RE) and
    (b) re-encoding it to cp1252 (WHATWG-sloppy: latin-1 fallback for the
    five unmapped C1 holes) yields bytes that decode as VALID UTF-8.
    Random genuine text fails (b) with overwhelming probability
    (continuation-byte structure), so the repair is effectively one-way.
    Up to ``max_passes`` rounds unwind double/triple encoding.  ASCII rows
    pass through zero-copy; NULLs pass.

    Vectorization: one Arrow regex kernel flags candidate rows; only that
    (tiny, on real crawls) minority routes through the per-row C-level
    codec round-trip.
    """
    import re

    import numpy as np

    sig = re.compile(_MOJIBAKE_SIG_RE)

    def _fix_one(s: str) -> str:
        for _ in range(max_passes):
            if not sig.search(s):
                break
            try:
                dec = _sloppy_cp1252_bytes(s).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                break
            if dec == s:
                break
            s = dec
        return s

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    cand = pc.fill_null(
        pc.match_substring_regex(arr, _MOJIBAKE_SIG_RE), False
    ).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(cand)
    if len(idx) == 0:
        return arr
    sub = arr.take(pa.array(idx, pa.int64())).to_pylist()
    out = arr.to_numpy(zero_copy_only=False).astype(object)
    out[idx] = [_fix_one(s) for s in sub]
    return pa.array(out, pa.string(), from_pandas=True)
