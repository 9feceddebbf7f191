"""Deterministic HTML -> text extraction.

The reference repo normalizes raw strings with ``preProcess`` (unidecode ->
collapse whitespace -> strip, csv_example/csv_example.py:26-38).  Our input is
Common-Crawl-style pages with an ``html: binary`` column (BASELINE.json
``input_hint``), so the analogous first stage is a *pure, deterministic*
``extract_text(html) -> str`` whose output must be byte-identical per url
(golden-tested).  Everything here is stdlib-only and locale-independent:

1. decode UTF-8 (``errors="replace"``)
2. drop ``<script>``/``<style>``/``<noscript>`` blocks and HTML comments
3. turn block-level closing tags and ``<br>`` into newlines
4. strip remaining tags
5. unescape HTML entities (``html.unescape`` — stdlib, deterministic)
6. transliterate non-ASCII via a fixed table (unmapped codepoints dropped)
7. normalize whitespace: runs of spaces/tabs -> one space, trim around
   newlines, collapse blank lines, strip ends
"""

from __future__ import annotations

import html as _html
import re

_RE_DROP = re.compile(
    rb"<(script|style|noscript)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RE_NEWLINE_TAGS = re.compile(
    r"<br\s*/?>|</\s*(p|div|h[1-6]|li|tr|title|ul|ol|table|section|article|header|footer|blockquote|pre)\s*>",
    re.IGNORECASE,
)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_SPACE_AROUND_NL = re.compile(r" ?\n ?")
_RE_MULTI_NL = re.compile(r"\n{2,}")

# Fixed ASCII transliteration table for the Latin-1 / Latin-Extended-A range
# (the role played by `unidecode` in the reference, csv_example.py:7,31 —
# re-implemented as a frozen table so output can never drift with a library
# version).  Codepoints not in the table and >127 are dropped.
_TRANSLIT = {
    "À": "A", "Á": "A", "Â": "A", "Ã": "A", "Ä": "A", "Å": "A", "Æ": "AE",
    "Ç": "C", "È": "E", "É": "E", "Ê": "E", "Ë": "E", "Ì": "I", "Í": "I",
    "Î": "I", "Ï": "I", "Ð": "D", "Ñ": "N", "Ò": "O", "Ó": "O", "Ô": "O",
    "Õ": "O", "Ö": "O", "Ø": "O", "Ù": "U", "Ú": "U", "Û": "U", "Ü": "U",
    "Ý": "Y", "Þ": "Th", "ß": "ss",
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a", "æ": "ae",
    "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i", "í": "i",
    "î": "i", "ï": "i", "ð": "d", "ñ": "n", "ò": "o", "ó": "o", "ô": "o",
    "õ": "o", "ö": "o", "ø": "o", "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ý": "y", "þ": "th", "ÿ": "y",
    "Ā": "A", "ā": "a", "Ă": "A", "ă": "a", "Ą": "A", "ą": "a",
    "Ć": "C", "ć": "c", "Č": "C", "č": "c", "Ď": "D", "ď": "d",
    "Đ": "D", "đ": "d", "Ē": "E", "ē": "e", "Ė": "E", "ė": "e",
    "Ę": "E", "ę": "e", "Ě": "E", "ě": "e", "Ğ": "G", "ğ": "g",
    "Ġ": "G", "ġ": "g", "Ħ": "H", "ħ": "h", "Ī": "I", "ī": "i",
    "Į": "I", "į": "i", "İ": "I", "ı": "i", "Ł": "L", "ł": "l",
    "Ń": "N", "ń": "n", "Ň": "N", "ň": "n", "Ō": "O", "ō": "o",
    "Ő": "O", "ő": "o", "Œ": "OE", "œ": "oe", "Ř": "R", "ř": "r",
    "Ś": "S", "ś": "s", "Š": "S", "š": "s", "Ť": "T", "ť": "t",
    "Ū": "U", "ū": "u", "Ů": "U", "ů": "u", "Ű": "U", "ű": "u",
    "Ų": "U", "ų": "u", "Ý": "Y", "Ÿ": "Y", "Ź": "Z", "ź": "z",
    "Ż": "Z", "ż": "z", "Ž": "Z", "ž": "z",
    # common punctuation lookalikes
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "–": "-", "—": "-", " ": " ", "…": "...",
    "«": '"', "»": '"', "•": "*", "·": "*",
}
_TRANSLIT_TABLE = {ord(k): v for k, v in _TRANSLIT.items()}


def transliterate(s: str) -> str:
    """Map to ASCII via the fixed table; drop unmapped non-ASCII codepoints."""
    if s.isascii():
        return s
    out = s.translate(_TRANSLIT_TABLE)
    if out.isascii():
        return out
    return "".join(ch for ch in out if ord(ch) < 128)


def extract_text(html_bytes: bytes) -> str:
    """Deterministic visible-text extraction; see module docstring.

    The per-url byte-identical invariant (BASELINE.json ``input_hint``) is on
    this function's output.
    """
    if html_bytes is None:
        return ""
    raw = _RE_DROP.sub(b" ", html_bytes)
    s = raw.decode("utf-8", errors="replace").replace("�", "")
    s = _RE_NEWLINE_TAGS.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    s = _html.unescape(s)
    s = transliterate(s)
    s = _RE_SPACES.sub(" ", s)
    s = _RE_SPACE_AROUND_NL.sub("\n", s)
    s = _RE_MULTI_NL.sub("\n", s)
    return s.strip()


_RE_HREF = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)
_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:", "about:")


def extract_links(html_bytes: bytes, base_url: str) -> list[str]:
    """Deterministic outlink extraction: every ``<a href=...>`` target,
    entity-unescaped, resolved against ``base_url`` (stdlib ``urljoin``),
    fragment-stripped; non-navigational schemes (javascript/mailto/data/
    tel/about) and empty or fragment-only hrefs are dropped.  Anchors inside
    script/style/noscript blocks and TERMINATED comments are not links
    (same ``_RE_DROP`` pass as ``extract_text``; an unterminated comment is
    treated as content — deterministic, documented divergence from browser
    comment-to-EOF behavior).  Order is document order with duplicates
    removed (first occurrence kept) — the web-graph edge emitter for
    PageRank/HITS/k-core over crawled pages."""
    from urllib.parse import urldefrag, urljoin

    if not html_bytes:
        return []
    html_bytes = _RE_DROP.sub(b" ", html_bytes)
    seen: set = set()
    out: list[str] = []
    for m in _RE_HREF.finditer(html_bytes):
        raw = next(g for g in m.groups() if g is not None)
        href = _html.unescape(raw.decode("utf-8", "replace")).strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        try:
            absu = urldefrag(urljoin(base_url, href))[0]
        except ValueError:
            continue  # malformed IPv6 or port — hostile href, not an error
        if absu and absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


def links_batch(batch, url_col: str = "url", html_col: str = "html",
                src_col: str = "src", dst_col: str = "dst"):
    """map_batches-ready edge emitter: one (src, dst) row per extracted
    outlink.  Per-document regex walk (HTML is opaque binary), flat Arrow
    output — run under an actor-pool/task ``map_batches``."""
    import pyarrow as pa

    srcs: list = []
    dsts: list = []
    urls = batch[url_col].to_pylist()
    for u, h in zip(urls, batch[html_col].to_pylist()):
        for link in extract_links(h, u or ""):
            srcs.append(u)
            dsts.append(link)
    return pa.table({src_col: pa.array(srcs, pa.string()),
                     dst_col: pa.array(dsts, pa.string())})


def extract_batch(batch, html_col: str = "html", out_col: str = "text"):
    """map_batches-ready wrapper: pyarrow Table in/out, per-row extract.

    HTML payloads are opaque binary; extraction is inherently per-document
    (regex state machine), so this is a Python loop over the batch — run it
    inside an actor-pool/task ``map_batches`` so batches parallelize across
    cores.
    """
    import pyarrow as pa

    texts = [extract_text(v) for v in batch[html_col].to_pylist()]
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, pa.array(texts, type=pa.string()))
