"""Blocking predicate library.

Pure functions that turn one field column into (row_index, block_key) pairs —
the role of dedupe's predicate set invoked via ``deduper.fingerprinter(...)``
(mysql_example/mysql_example.py:217-224).  Predicate kinds mirror the public
dedupe predicate families: whole-field, token, first-token, prefix/suffix
char-grams, char-ngrams, numeric rounding, set-element, plus the index-backed
rare-token (TF-IDF-canopy-style) predicate handled in ``fingerprint.py``.

Emitters are vectorized over Arrow where the kernel exists; each returns
``(indices: np.int64 ndarray, keys: pa.StringArray)`` with nulls already
dropped.  Keys are raw (un-prefixed); the fingerprinter prepends the
predicate index so keyspaces never collide across predicates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_SPLIT = r"\s+"


def _as_string(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return arr


def _valid(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    mask = pc.and_(arr.is_valid(), pc.not_equal(pc.fill_null(arr, ""), ""))
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    return idx, arr.take(pa.array(idx, pa.int64()))


def emit_whole_field(arr) -> tuple[np.ndarray, pa.Array]:
    arr = _as_string(arr)
    return _valid(arr)


def emit_first_token(arr) -> tuple[np.ndarray, pa.Array]:
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    first = pc.list_element(pc.split_pattern_regex(vals, _TOKEN_SPLIT, max_splits=1), 0)
    return idx, first


def emit_token(arr) -> tuple[np.ndarray, pa.Array]:
    """Every whitespace token becomes a key (explodes rows)."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    lists = pc.split_pattern_regex(vals, _TOKEN_SPLIT)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return idx[parents[keep]], flat.filter(pa.array(keep))


def emit_prefix(arr, n: int = 4) -> tuple[np.ndarray, pa.Array]:
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    return idx, pc.utf8_slice_codeunits(vals, 0, n)


def emit_suffix(arr, n: int = 4) -> tuple[np.ndarray, pa.Array]:
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    # slice kernels take scalar offsets only -> suffix = reverse∘prefix∘reverse
    rev = pc.utf8_reverse(vals)
    return idx, pc.utf8_reverse(pc.utf8_slice_codeunits(rev, 0, n))


def emit_ngrams(arr, n: int = 3) -> tuple[np.ndarray, pa.Array]:
    """Character n-grams (Python loop — use on short normalized fields only)."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    out_idx: list[int] = []
    out_keys: list[str] = []
    for i, v in zip(idx, vals.to_pylist()):
        v = v.replace(" ", "")
        if len(v) < n:
            out_idx.append(int(i))
            out_keys.append(v)
            continue
        for j in range(len(v) - n + 1):
            out_idx.append(int(i))
            out_keys.append(v[j : j + n])
    return np.array(out_idx, dtype=np.int64), pa.array(out_keys, pa.string())


def emit_numeric_round(arr, digits: int = 0) -> tuple[np.ndarray, pa.Array]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        ok = pc.match_substring_regex(pc.fill_null(arr, ""), r"^-?\d+(\.\d+)?$")
        arr = pc.if_else(ok, arr, pa.nulls(len(arr), pa.string()))
    num = pc.cast(arr, pa.float64(), safe=False)
    mask = num.is_valid()
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    vals = num.take(pa.array(idx, pa.int64()))
    rounded = pc.round(vals, ndigits=digits)
    return idx, pc.cast(rounded, pa.string())


def emit_set_element(arr) -> tuple[np.ndarray, pa.Array]:
    """Each element of a list<string> column becomes a key."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    mask = pc.and_(arr.is_valid(), pc.greater(pc.list_value_length(arr), 0))
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    vals = arr.take(pa.array(idx, pa.int64()))
    parents = pc.list_parent_indices(vals).to_numpy(zero_copy_only=False)
    flat = _as_string(pc.list_flatten(vals))
    return idx[parents], flat


def emit_sorted_tokens(arr, n: int = 4) -> tuple[np.ndarray, pa.Array]:
    """Key = first n whitespace tokens, sorted and joined — robust to the
    adjacent-token swaps the corpus noise model produces (a swap inside the
    window leaves the sorted set unchanged)."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    keys = [" ".join(sorted(v.split()[:n])) for v in vals.to_pylist()]
    return idx, pa.array(keys, pa.string())


def emit_tfidf_canopy(arr, k: int = 2, df: dict | None = None) -> tuple[np.ndarray, pa.Array]:
    """TF-IDF canopy keys: each record's k rarest tokens by corpus DF
    (index-backed — ``df`` maps token -> document frequency; absent tokens
    count as df=1, i.e. rarest, which keeps the index Zipf-bounded).

    Records sharing any high-IDF token co-block — recall-robust on reordered
    or prefix-divergent values where positional predicates miss (the role of
    the reference's TfidfTextCanopyPredicate, mysql_example.py:200-211).
    """
    df = df or {}
    idx, vals = _valid(_as_string(arr))
    out_idx: list[int] = []
    out_keys: list[str] = []
    for i, v in zip(idx, vals.to_pylist()):
        toks = set(v.split())
        if not toks:
            continue
        rare = sorted(toks, key=lambda t: (df.get(t, 1), t))[:k]
        out_idx.extend([int(i)] * len(rare))
        out_keys.extend(rare)
    return np.array(out_idx, dtype=np.int64), pa.array(out_keys, pa.string())


#: Soundex letter→code table (American Soundex, the public algorithm):
#: 1 BFPV, 2 CGJKQSXZ, 3 DT, 4 L, 5 MN, 6 R; 0 = vowel/Y (separator that
#: RESETS adjacency), 7 = H/W (transparent: does NOT reset adjacency).
_SOUNDEX_CODE = np.zeros(256, dtype=np.uint8)
for _letters, _code in [("BFPV", 1), ("CGJKQSXZ", 2), ("DT", 3), ("L", 4),
                        ("MN", 5), ("R", 6), ("AEIOUY", 0), ("HW", 7)]:
    for _ch in _letters:
        _SOUNDEX_CODE[ord(_ch)] = _code
_SOUNDEX_WIDTH = 18  # significant letters examined; 3 digits need far fewer


def soundex_codes(vals: pa.Array) -> pa.Array:
    """Vectorized American Soundex (first letter + 3 digits, zero-padded),
    including the H/W transparency rule (Ashcraft -> A261) and
    first-letter-code adjacency (Pfister -> P236).  '' for strings with no
    ASCII letter.  Column-sweep vectorization: per-row state arrays updated
    over ``_SOUNDEX_WIDTH`` fixed-width byte columns — no per-row Python in
    the scan."""
    up = pc.utf8_upper(_as_string(vals))
    letters = pc.replace_substring_regex(up, "[^A-Z]", "")
    py = letters.to_pylist()
    n = len(py)
    if n == 0:
        return pa.array([], pa.string())
    buf = "".join((s or "")[:_SOUNDEX_WIDTH].ljust(_SOUNDEX_WIDTH) for s in py)
    mat = np.frombuffer(buf.encode("ascii"), np.uint8).reshape(n, _SOUNDEX_WIDTH)
    codes = _SOUNDEX_CODE[mat]
    codes[mat == ord(" ")] = 0
    first = mat[:, 0]
    has = first != ord(" ")
    prev = codes[:, 0].copy()          # first letter's code participates
    digits = np.zeros((n, 3), dtype=np.uint8)
    count = np.zeros(n, dtype=np.int64)
    for j in range(1, _SOUNDEX_WIDTH):
        c = codes[:, j]
        is_letter = mat[:, j] != ord(" ")
        emit = is_letter & (c >= 1) & (c <= 6) & (c != prev) & (count < 3)
        rows = np.flatnonzero(emit)
        digits[rows, count[rows]] = c[rows]
        count[rows] += 1
        # vowels reset adjacency; H/W leave it; consonants set it
        upd = is_letter & (c != 7)
        prev = np.where(upd, c, prev)
    out = np.array([
        chr(first[i]) + "".join(str(d) for d in digits[i])
        if has[i] else "" for i in range(n)
    ], dtype=object)
    return pa.array(out, pa.string())


def emit_soundex(arr) -> tuple[np.ndarray, pa.Array]:
    """Phonetic blocking key — the role of dedupe's doublemetaphone-family
    predicates, using the fully-specified public American Soundex algorithm
    so keys are deterministic and engine-reproducible.  Rows whose field has
    no ASCII letter emit no key."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    keys = soundex_codes(vals)
    keep = pc.not_equal(keys, "").to_numpy(zero_copy_only=False)
    return idx[keep], keys.filter(pa.array(keep))


_INT_RUN = r"[^0-9]+"


def _integer_runs(vals: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(parent_index, digit_run) pairs for every maximal digit run in each
    value — one vectorized split + flatten, no Python row loop."""
    lists = pc.split_pattern_regex(vals, _INT_RUN)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return parents[keep], flat.filter(pa.array(keep))


def emit_common_integer(arr) -> tuple[np.ndarray, pa.Array]:
    """Every integer substring becomes a key (dedupe's
    commonIntegerPredicate): '123 Main St Apt 4' -> keys '123', '4'.
    Leading zeros are canonicalized away so '007' and '7' collide."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    parents, runs = _integer_runs(vals)
    canon = pc.utf8_ltrim(runs, "0")
    canon = pc.if_else(pc.equal(canon, ""), pa.scalar("0"), canon)
    return idx[parents], canon


def emit_first_integer(arr) -> tuple[np.ndarray, pa.Array]:
    """First integer substring only (dedupe's firstIntegerPredicate) — the
    street-number-style key."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    parents, runs = _integer_runs(vals)
    canon = pc.utf8_ltrim(runs, "0")
    canon = pc.if_else(pc.equal(canon, ""), pa.scalar("0"), canon)
    first_mask = np.concatenate([[True], parents[1:] != parents[:-1]]) \
        if len(parents) else np.array([], bool)
    return idx[parents[first_mask]], canon.filter(pa.array(first_mask))


def emit_near_integers(arr) -> tuple[np.ndarray, pa.Array]:
    """i-1, i, i+1 for every integer substring (dedupe's
    nearIntegersPredicate): off-by-one street numbers / years collide.
    Digit runs longer than 18 chars fall back to the exact key only (they
    exceed int64 — ids/hashes, where +-1 neighbours are meaningless)."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    parents, runs = _integer_runs(vals)
    if not len(parents):
        return parents, pa.array([], pa.string())
    s = runs.to_numpy(zero_copy_only=False)
    small = np.char.str_len(s.astype(str)) <= 18
    out_idx: list[np.ndarray] = []
    out_keys: list[np.ndarray] = []
    if small.any():
        ints = s[small].astype(np.int64)
        pi = idx[parents[small]]
        for d in (-1, 0, 1):
            out_idx.append(pi)
            out_keys.append((ints + d).astype(str))
    if (~small).any():
        out_idx.append(idx[parents[~small]])
        out_keys.append(s[~small].astype(str))
    return (np.concatenate(out_idx),
            pa.array(np.concatenate(out_keys), pa.string()))


def emit_alpha_numeric(arr) -> tuple[np.ndarray, pa.Array]:
    """Alphanumeric tokens that CONTAIN a digit (dedupe's
    alphaNumericPredicate): unit numbers, model codes, zip+4 — the
    discriminating tokens on address/product fields."""
    arr = _as_string(arr)
    idx, vals = _valid(arr)
    lists = pc.split_pattern_regex(vals, r"[^A-Za-z0-9]+")
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    keep = pc.and_(
        pc.not_equal(flat, ""),
        pc.match_substring_regex(flat, r"[0-9]"),
    ).to_numpy(zero_copy_only=False)
    return idx[parents[keep]], flat.filter(pa.array(keep))


def emit_order_of_magnitude(arr) -> tuple[np.ndarray, pa.Array]:
    """floor(log10(|x|)) as the key (dedupe's orderOfMagnitude): prices/
    counts block with others of the same magnitude.  Zero and non-numeric
    values emit no key; negatives key on |x| with a 'neg' prefix (an
    unambiguous namespace — a bare '-' would collide "negative, magnitude
    2" with "positive, magnitude -2")."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        ok = pc.match_substring_regex(pc.fill_null(arr, ""), r"^-?\d+(\.\d+)?$")
        arr = pc.if_else(ok, arr, pa.nulls(len(arr), pa.string()))
    num = pc.cast(arr, pa.float64(), safe=False)
    v = num.to_numpy(zero_copy_only=False)
    mask = np.isfinite(v) & (v != 0)
    idx = np.flatnonzero(mask)
    mag = np.floor(np.log10(np.abs(v[idx]))).astype(np.int64)
    keys = np.where(v[idx] < 0, np.char.add("neg", mag.astype(str)),
                    mag.astype(str))
    return idx, pa.array(keys, pa.string())


PREDICATE_KINDS = {
    "soundex": emit_soundex,
    "common_integer": emit_common_integer,
    "first_integer": emit_first_integer,
    "near_integers": emit_near_integers,
    "alpha_numeric": emit_alpha_numeric,
    "order_of_magnitude": emit_order_of_magnitude,
    "sorted_tokens": emit_sorted_tokens,
    "whole_field": emit_whole_field,
    "first_token": emit_first_token,
    "token": emit_token,
    "prefix": emit_prefix,
    "suffix": emit_suffix,
    "ngram": emit_ngrams,
    "numeric_round": emit_numeric_round,
    "set_element": emit_set_element,
    # "rare_token" is index-backed; see fingerprint.Fingerprinter
}


def emit_keys(kind: str, arr, **params) -> tuple[np.ndarray, pa.Array]:
    return PREDICATE_KINDS[kind](arr, **params)
