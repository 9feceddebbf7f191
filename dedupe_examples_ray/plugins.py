"""Shipped plugin comparators — the reference's third-party field-variable
surface exercised for real (extended-variables/officers.py:12-15,108-118:
``WesternName(..., crf=True)`` / ``USAddress(..., crf=True)`` are pip-installed
plugin packages used exactly like built-ins).

``western_name`` is a structured name comparator registered through the same
``register_comparator`` hook any third-party package would use: parse
"first [middle...] last", compare the parts with Jaro-Winkler, weight the
surname highest, and give initial-vs-full-name agreement partial credit.
Import of this module is the plugin "installation"; the scorer lazily imports
it when it meets an unknown comparator name, so worker processes resolve
shipped plugins without driver-side setup.
"""

from __future__ import annotations

import re

import numpy as np

from .distances import jaro_winkler
from .scoring import register_comparator

# the token classes a trained USAddress/probablepeople CRF labels; handled
# here as deterministic rules so the comparator reaches CRF-class match
# quality on the messy patterns that matter for blocking+scoring (evaluated
# by the `er_dedupe_officers` in-query F1 contract and pytest)
_HONORIFICS = {"mr", "mrs", "ms", "miss", "dr", "prof", "rev", "hon", "sir",
               "fr", "capt", "col", "gen", "lt", "sgt"}
_NAME_SUFFIXES = {"jr", "sr", "ii", "iii", "iv", "v", "md", "phd", "esq",
                  "dds", "cpa"}
_NICK_RE = re.compile(r'["“”(][^")“”]*[")“”]')


def _parse_name(name: str) -> tuple[str, str, str]:
    """Messy personal name -> (first, middles-joined, last).

    Handles the patterns a probablepeople-style CRF labels: 'Last, First M'
    comma inversion, honorific prefixes (Dr/Mrs/...), generational or
    professional suffixes (Jr/III/PhD/...), quoted or parenthesized
    nicknames (dropped), periods in initials, case.  Single remaining token
    counts as a last name (surname is the load-bearing part)."""
    s = (name or "").lower()
    s = _NICK_RE.sub(" ", s)
    s = s.replace(".", " ")
    last_from_comma = ""
    if "," in s:
        head, _, rest = s.partition(",")
        head_toks = [t for t in head.split() if t not in _NAME_SUFFIXES]
        if head_toks and head_toks[0] not in _HONORIFICS:
            # 'Smith, John A [Jr]' — head is the surname, rest the given names
            last_from_comma = head_toks[-1]
            s = rest
        else:  # 'Dr, John Smith' damage: treat comma as noise
            s = head + " " + rest
    parts = [t for t in s.split() if t]
    while parts and parts[0] in _HONORIFICS:
        parts = parts[1:]
    while parts and parts[-1] in _NAME_SUFFIXES:
        parts = parts[:-1]
    if last_from_comma:
        if not parts:
            return "", "", last_from_comma
        return parts[0], " ".join(parts[1:]), last_from_comma
    if not parts:
        return "", "", ""
    if len(parts) == 1:
        return "", "", parts[0]
    return parts[0], " ".join(parts[1:-1]), parts[-1]


def _part_sim(a: str, b: str) -> float:
    """Jaro-Winkler with initial handling: 'j' vs 'john' gets fixed partial
    credit instead of a misleading string distance."""
    if not a or not b:
        return 0.0
    if len(a) == 1 or len(b) == 1:
        return 0.75 if a[0] == b[0] else 0.0
    return jaro_winkler(a, b)


def western_name_sim(a_list, b_list) -> np.ndarray:
    """Batch comparator: weighted name-part similarity in [0, 1].

    surname 0.6, first name 0.3, middle 0.1 (middle missing on either side
    counts as neutral agreement 0.5).  Memoized per distinct raw value.
    """
    cache: dict = {}

    def parse(v):
        got = cache.get(v)
        if got is None:
            got = _parse_name(v)
            cache[v] = got
        return got

    out = np.zeros(len(a_list), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        if not a or not b:
            continue
        if a == b:
            out[i] = 1.0
            continue
        fa, ma, la = parse(a)
        fb, mb, lb = parse(b)
        s_last = _part_sim(la, lb)
        s_first = _part_sim(fa, fb) if (fa and fb) else (0.5 if not fa and not fb else 0.25)
        s_mid = _part_sim(ma, mb) if (ma and mb) else 0.5
        out[i] = 0.6 * s_last + 0.3 * s_first + 0.1 * s_mid
    return out


register_comparator("western_name", western_name_sim)


def canonical_name(name: str) -> str:
    """Messy name -> canonical 'first middles last' (lowercase, honorifics/
    suffixes/nicknames stripped, comma inversion undone) — the derive-time
    normalization that makes raw blocking predicates (first_token, suffix)
    work on CRF-grade messy names; comparator-grade detail (typos, initials)
    is left for ``western_name`` to score."""
    f, m, l = _parse_name(name)
    return " ".join(x for x in (f, m, l) if x)


def canonical_name_array(arr) -> "np.ndarray":
    """Vectorized-enough canonical_name over an Arrow/np string column
    (memoized per distinct value; called once per RECORD at derive time)."""
    import pyarrow as pa

    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_pylist()
    cache: dict = {}
    out = []
    for v in arr:
        got = cache.get(v)
        if got is None:
            got = canonical_name(v or "")
            cache[v] = got
        out.append(got)
    return np.asarray(out, dtype=object)


def officer_settings(with_address: bool = False):
    """Settings artifact using the shipped plugin comparators end-to-end
    (officers.py:108-118 analog: plugin name + address variables +
    categorical flag)."""
    from .config import Field, Settings

    fields = [
        Field("name", "western_name"),
        Field("unit", "categorical", has_missing=True),
    ]
    weights = {"name": 10.0, "unit": 1.0, "unit__missing": -0.25}
    if with_address:
        fields.append(Field("address", "us_address", has_missing=True))
        weights.update({"address": 6.0, "address__missing": -0.5})
    return Settings(
        fields=fields,
        predicates=[
            {"kind": "first_token", "column": "name"},
            {"kind": "suffix", "column": "name", "n": 6},
        ],
        weights=weights,
        bias=-7.5 if not with_address else -14.0,
        threshold=0.5,
        max_block_size=200,
        oversize_policy="salt",
    )


_SUFFIXES = {
    "st": "street", "str": "street", "ave": "avenue", "av": "avenue",
    "blvd": "boulevard", "rd": "road", "dr": "drive", "ln": "lane",
    "ct": "court", "pl": "place", "hwy": "highway", "pkwy": "parkway",
    "sq": "square", "ter": "terrace", "cir": "circle",
}
_DIRS = {"n": "north", "s": "south", "e": "east", "w": "west",
         "ne": "northeast", "nw": "northwest", "se": "southeast",
         "sw": "southwest"}


def _parse_address(addr: str) -> tuple[str, str, str]:
    """'123 N Main St [Apt 4]' -> (house number, normalized street tokens,
    unit) — the structured decomposition USAddress's CRF produces, done with
    deterministic rules (good enough to score against; officers.py:108-118)."""
    toks = (addr or "").lower().replace(".", "").replace(",", " ").split()
    if not toks:
        return "", "", ""
    num = ""
    if toks and toks[0].isdigit():
        num, toks = toks[0], toks[1:]
    unit = ""
    for j, t in enumerate(toks):
        if t in ("apt", "unit", "ste", "suite", "#") and j + 1 < len(toks):
            unit = toks[j + 1]
            toks = toks[:j]
            break
    norm = [_DIRS.get(t, _SUFFIXES.get(t, t)) for t in toks]
    return num, " ".join(norm), unit


def us_address_sim(a_list, b_list) -> np.ndarray:
    """Batch comparator: weighted structured address similarity in [0, 1].

    house number exact 0.45 (the discriminating field), street name JW 0.45,
    unit 0.1 (missing on both sides = neutral).  Suffix/direction
    abbreviations normalize before comparison ('St'=='Street', 'N'=='North').
    Memoized per distinct raw value.
    """
    cache: dict = {}

    def parse(v):
        got = cache.get(v)
        if got is None:
            got = _parse_address(v)
            cache[v] = got
        return got

    out = np.zeros(len(a_list), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        if not a or not b:
            continue
        if a == b:
            out[i] = 1.0
            continue
        na, sa, ua = parse(a)
        nb, sb, ub = parse(b)
        s_num = 1.0 if (na and na == nb) else (0.5 if not na and not nb else 0.0)
        s_street = jaro_winkler(sa, sb) if (sa and sb) else 0.0
        s_unit = (1.0 if ua == ub else 0.0) if (ua or ub) else 0.5
        out[i] = 0.45 * s_num + 0.45 * s_street + 0.1 * s_unit
    return out


register_comparator("us_address", us_address_sim)
