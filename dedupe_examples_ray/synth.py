"""Seeded synthesis of the Common-Crawl-style ``pages`` corpus with gold clusters.

Mirrors the reference's gold corpus shape (csv_example_input_with_true_ids.csv:
3,337 rows / 1,162 labeled clusters, sizes 1-18 — SURVEY.md §5) on the target
input schema (url, warc_ts, html, text, lang) from BASELINE.json ``input_hint``.

Clusters are planted: each cluster is one logical page replicated across mirror
hosts with the noise classes the reference normalizers target
(csv_example/csv_example.py:26-38): case flips, punctuation inserts, token
swaps/drops in the body, truncated titles, missing fields.  The first title
token is never perturbed, which lets a first-token blocking predicate achieve
recall 1.0 on gold pairs (the "same blocking key" clause of the F1 contract).

Generation is per-cluster deterministic — ``rng = default_rng([seed,
cluster_id])`` — so output is identical regardless of partitioning, enabling a
distributed ``ray.data.range(n_clusters).map_batches(...)`` path that scales
synthesis with the cluster count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .extract import extract_text

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

GOLD_SCHEMA = pa.schema([("url", pa.string()), ("true_id", pa.int64())])

# Deterministic pseudo-word vocabulary (no RNG involved).
_SYLLABLES = [
    "ba", "den", "ri", "tam", "kel", "or", "vin", "sha", "lu", "mer",
    "to", "gra", "pel", "zan", "qui", "fos", "nel", "dar", "wic", "hum",
    "jor", "yen", "sol", "bri", "cam", "dru", "eva", "fin", "gul", "hart",
]
# 900 two-syllable + 5400 three-syllable words (deterministic, no RNG).
# A larger vocabulary keeps first-token blocking realistically selective —
# with a tiny vocab every block saturates the salting cap and pair counts
# stop reflecting real web-title diversity.
VOCAB = [a + b for a in _SYLLABLES for b in _SYLLABLES] + [
    a + b + c
    for i, a in enumerate(_SYLLABLES)
    for b in _SYLLABLES
    for c in (_SYLLABLES[i % len(_SYLLABLES)], _SYLLABLES[(i * 7 + 3) % len(_SYLLABLES)], _SYLLABLES[(i * 11 + 5) % len(_SYLLABLES)])
    if True
][: 900 * 6]
_ACCENT_WORDS = ["café", "naïve", "jalapeño", "zürich", "reñé", "søren"]

# Web-like first-title-token mix: a quarter of clusters start with a generic
# word (Zipf head -> hot blocking keys the salting cap must absorb), the rest
# with a brand-like pseudo-unique token (the selective tail).
_GENERIC_FIRST = [
    "the", "best", "home", "news", "top", "guide", "how", "new", "free", "online",
    "official", "welcome", "my", "your", "daily", "world", "local", "first", "real", "all",
]

# cluster-size distribution ≈ reference gold (SURVEY.md FIXTURES.md F1)
_SIZE_BUCKETS = [(1, 1), (2, 2), (3, 5), (6, 10), (11, 18)]
_SIZE_PROBS = [0.35, 0.27, 0.25, 0.10, 0.03]

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]


def _words(rng: np.random.Generator, n: int) -> list[str]:
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), size=n)]


def _perturb_tokens(rng: np.random.Generator, tokens: list[str], keep_first: bool) -> list[str]:
    """Apply the reference noise classes; never touches token 0 if keep_first."""
    toks = list(tokens)
    lo = 1 if keep_first else 0
    # case flips (normalized away by preProcess)
    for i in range(len(toks)):
        r = rng.random()
        if r < 0.15:
            toks[i] = toks[i].upper()
        elif r < 0.30:
            toks[i] = toks[i].capitalize()
    # punctuation insert (stripped by preProcess variant M2)
    if len(toks) > lo and rng.random() < 0.3:
        j = int(rng.integers(lo, len(toks)))
        toks[j] = toks[j] + rng.choice([",", ".", "'", "-"])
    # swap two adjacent non-first tokens
    if len(toks) > lo + 2 and rng.random() < 0.25:
        j = int(rng.integers(lo, len(toks) - 1))
        toks[j], toks[j + 1] = toks[j + 1], toks[j]
    # drop the last token (truncated title / body)
    if len(toks) > lo + 2 and rng.random() < 0.2:
        toks = toks[:-1]
    return toks


def _render_html(rng: np.random.Generator, title: str, body_words: list[str]) -> bytes:
    """Assemble HTML with tags/entities/noise that extract_text must undo."""
    paras = []
    i = 0
    while i < len(body_words):
        n = int(rng.integers(6, 14))
        paras.append(" ".join(body_words[i : i + n]))
        i += n
    t = title.replace("&", "&amp;")
    if rng.random() < 0.2:
        t = t.replace(" ", " &nbsp; ", 1) if " " in t else t
    parts = [
        "<html><head>",
        f"<title>{t}</title>",
        '<style>body { color: #000; }</style>',
        "</head><body>",
        f"<h1>{t}</h1>",
    ]
    if rng.random() < 0.3:
        parts.append("<script>var tracker = 'noise';</script>")
    if rng.random() < 0.2:
        parts.append("<!-- comment noise -->")
    for p in paras:
        parts.append(f"<p>{p.replace('&', '&amp;')}</p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def make_cluster(cluster_id: int, seed: int = 42) -> list[dict]:
    """All member rows of one gold cluster, deterministically from (seed, id)."""
    rng = np.random.default_rng([seed, cluster_id])
    bucket = rng.choice(len(_SIZE_BUCKETS), p=_SIZE_PROBS)
    lo, hi = _SIZE_BUCKETS[bucket]
    size = int(rng.integers(lo, hi + 1))

    title_tokens = _words(rng, int(rng.integers(4, 9)))
    if rng.random() < 0.25:
        title_tokens[0] = str(_GENERIC_FIRST[int(rng.integers(0, len(_GENERIC_FIRST)))])
    else:
        syls = rng.integers(0, len(_SYLLABLES), size=3)
        title_tokens[0] = "".join(_SYLLABLES[i] for i in syls) + str(int(rng.integers(0, 10)))
    if rng.random() < 0.1:
        title_tokens.append(str(rng.choice(_ACCENT_WORDS)))
    body_tokens = _words(rng, int(rng.integers(25, 61)))
    host = f"{VOCAB[int(rng.integers(0, len(VOCAB)))]}{cluster_id % 97}.example"
    # unique per-cluster path slug: record identity is the url (SURVEY §1.1),
    # so urls must be globally unique — without this, large corpora collide on
    # (host word, id%97, path words) and two gold clusters share one url
    path = "/".join(_words(rng, int(rng.integers(1, 4)))) + f"/p{cluster_id:x}"
    lang = str(rng.choice(_LANGS))

    rows = []
    for m in range(size):
        if m == 0:
            t_toks, b_toks = title_tokens, body_tokens
            url = f"https://{host}/{path}"
        else:
            t_toks = _perturb_tokens(rng, title_tokens, keep_first=True)
            b_toks = _perturb_tokens(rng, body_tokens, keep_first=False)
            url = f"https://m{m}.{host}/{path}"
        title = " ".join(t_toks)
        html = _render_html(rng, title, b_toks)
        ts = _EPOCH_US + cluster_id * 86_400_000_000 // 97 + m * 3_600_000_000
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": extract_text(html),
                "lang": lang if rng.random() > 0.05 else "",
                "true_id": cluster_id,
            }
        )
    return rows


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "true_id": pa.array([r["true_id"] for r in rows], pa.int64()),
    }
    return pa.table(cols)


def synth_pages_table(n_clusters: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Local (driver-side) synthesis: returns (pages, gold) Arrow tables."""
    rows: list[dict] = []
    for cid in range(n_clusters):
        rows.extend(make_cluster(cid, seed))
    full = _rows_to_table(rows)
    gold = full.select(["url", "true_id"])
    return full.drop_columns(["true_id"]), gold


def synth_batch(batch, seed: int = 42) -> pa.Table:
    """map_batches kernel over a Dataset of cluster ids (column ``id``)."""
    rows: list[dict] = []
    for cid in batch["id"].to_pylist():
        rows.extend(make_cluster(int(cid), seed))
    return _rows_to_table(rows)


def make_inventor_cluster(cluster_id: int, seed: int = 42) -> list[dict]:
    """Patent-style typed-fields corpus (FIXTURES.md F4): name + latlong +
    set fields, gold = cluster id (mirrors patent_example.py:16-50)."""
    rng = np.random.default_rng([seed + 7, cluster_id])
    size = int(rng.integers(1, 5))
    first, last = _words(rng, 2)
    lat = float(rng.uniform(-60, 70))
    lng = float(rng.uniform(-170, 170))
    classes = sorted(set(_words(rng, int(rng.integers(2, 5)))))
    coauthors = sorted(set(_words(rng, int(rng.integers(1, 4)))))
    rows = []
    for m in range(size):
        name = f"{first} {last}"
        if m > 0:
            if rng.random() < 0.4:
                name = name.title()
            if rng.random() < 0.3:
                name = f"{first} {last[: max(3, len(last) - 1)]}"
        jla = lat + float(rng.normal(0, 0.01)) if m else lat
        jln = lng + float(rng.normal(0, 0.01)) if m else lng
        cls = list(classes)
        if m > 0 and len(cls) > 2 and rng.random() < 0.3:
            cls = cls[:-1]
        rows.append(
            {
                "person_id": cluster_id * 100 + m,
                "name": name,
                "lat": jla,
                "lng": jln,
                "class": cls,
                "coauthor": list(coauthors),
                "true_id": cluster_id,
            }
        )
    return rows


def synth_inventors_table(n_clusters: int, seed: int = 42) -> pa.Table:
    rows: list[dict] = []
    for cid in range(n_clusters):
        rows.extend(make_inventor_cluster(cid, seed))
    return pa.table(
        {
            "person_id": pa.array([r["person_id"] for r in rows], pa.int64()),
            "name": pa.array([r["name"] for r in rows], pa.string()),
            "lat": pa.array([r["lat"] for r in rows], pa.float64()),
            "lng": pa.array([r["lng"] for r in rows], pa.float64()),
            "class": pa.array([r["class"] for r in rows], pa.list_(pa.string())),
            "coauthor": pa.array([r["coauthor"] for r in rows], pa.list_(pa.string())),
            "true_id": pa.array([r["true_id"] for r in rows], pa.int64()),
        }
    )


_NAME_MESS_HONORIFICS = ["mr", "mrs", "ms", "dr", "prof"]
_NAME_MESS_SUFFIXES = ["jr", "sr", "ii", "iii", "phd"]


def make_officer_cluster(cluster_id: int, seed: int = 42) -> list[dict]:
    """Messy-name corpus (CRF-parser evaluation): one synthetic identity ->
    2-5 records whose names carry the damage patterns a trained
    probablepeople/USAddress-style CRF untangles — 'Last, First M' comma
    inversion, honorifics, generational suffixes, initialed given names,
    quoted nicknames, single-edit typos.  Gold = cluster id."""
    rng = np.random.default_rng([seed + 31, cluster_id])
    first, middle, last = _words(rng, 3)
    # identity-unique surname suffix: the syllable pool is small enough that
    # distinct identities would otherwise share surnames, which is a property
    # of the GENERATOR, not of the parser/comparator under evaluation
    last = last + chr(97 + (cluster_id // 26) % 26) + chr(97 + cluster_id % 26)
    unit = ["north", "south", "east", "west"][int(rng.integers(0, 4))]
    size = int(rng.integers(2, 6))
    rows = []
    for m in range(size):
        f, mid, l = first, middle, last
        if m and rng.random() < 0.35:  # initialed given/middle name
            mid = mid[0]
        if m and rng.random() < 0.2:
            f = f[0]
        if m and rng.random() < 0.25:  # one-edit typo in the surname
            j = int(rng.integers(1, len(l)))
            l = l[:j] + chr(ord("a") + int(rng.integers(0, 26))) + l[j + 1 :]
        style = int(rng.integers(0, 5)) if m else 0
        if style == 0:
            name = f"{f} {mid} {l}"
        elif style == 1:  # comma inversion
            name = f"{l}, {f} {mid}"
        elif style == 2:  # honorific + title case + periods
            hon = _NAME_MESS_HONORIFICS[int(rng.integers(0, 5))]
            name = f"{hon}. {f.title()} {mid[0].upper()}. {l.title()}"
        elif style == 3:  # suffix
            name = f"{f} {mid} {l} {_NAME_MESS_SUFFIXES[int(rng.integers(0, 5))]}"
        else:  # quoted nickname
            nick = _words(rng, 1)[0]
            name = f'{f} "{nick}" {l}'
        rows.append(
            {
                "rid": cluster_id * 100 + m,
                "name": name,
                "unit": None if rng.random() < 0.15 else unit,
                "true_id": cluster_id,
            }
        )
    return rows


def synth_officers_table(n_clusters: int, seed: int = 42) -> pa.Table:
    rows: list[dict] = []
    for cid in range(n_clusters):
        rows.extend(make_officer_cluster(cid, seed))
    return pa.table(
        {
            "rid": pa.array([r["rid"] for r in rows], pa.int64()),
            "name": pa.array([r["name"] for r in rows], pa.string()),
            "unit": pa.array([r["unit"] for r in rows], pa.string()),
            "true_id": pa.array([r["true_id"] for r in rows], pa.int64()),
        }
    )


def synth_pages_dataset(n_clusters: int, seed: int = 42, parallelism: int = -1):
    """Distributed synthesis: Dataset with pages columns + ``true_id``.

    Callers drop ``true_id`` for pipeline input and project (url, true_id) as
    the gold table — the gold column is never visible to the pipeline itself.
    """
    import ray.data as rd

    ds = rd.range(n_clusters, override_num_blocks=None if parallelism == -1 else parallelism)
    return ds.map_batches(
        lambda b: synth_batch(b, seed), batch_format="pyarrow", batch_size=256
    )
