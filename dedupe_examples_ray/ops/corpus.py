"""Corpus-management operators for LLM training-data pipelines.

Deterministic, cross-engine-reproducible corpus plumbing the reference has no
analog for (its world ends at one labeled table in memory — e.g.
csv_example.py:41-55 loads everything into a dict): hash-based dataset
splits, stratified per-group sampling, URL canonicalization, and a composed
C4/Gopher-style cleaning funnel.  Every operator is a single-pass
``map_batches`` stage except the final exact-dedup in ``clean_corpus``,
which is one bucketed shuffle of the already-filtered survivors.

Split/sample hashing is md5 (NOT ``pd.util.hash_array``) on purpose: md5 is
the portable choice — DuckDB / Spark / Polars all ship it — so a split
computed here is bit-reproducible by any other engine (and by the DuckDB
oracles in ``__ray_entry__``).  The per-value C-speed md5 over short keys is
~0.5 µs; these stages are read-bound, not hash-bound.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..scale import clean_arrow as _clean_arrow

#: bucket space for fraction-based splits (0.01 % granularity)
SPLIT_BUCKETS = 10_000


def _col(t: pa.Table, name: str) -> pa.Array:
    arr = t[name]
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _md5_u32(values) -> np.ndarray:
    """md5(str(v))[:8] as int64 in [0, 2^32) — THE deterministic-uniform
    seed shared by every sampler/splitter (DuckDB:
    ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::UBIGINT``).  One
    definition on purpose: a tweak to the offset or width must hit the
    A-ES sampler, the Gumbel sampler and the hash splits together."""
    md5 = hashlib.md5
    return np.fromiter(
        (int(md5(str(v).encode()).hexdigest()[:8], 16) for v in values),
        dtype=np.int64,
        count=len(values),
    )


def _md5_bucket(values, n_buckets: int = SPLIT_BUCKETS) -> np.ndarray:
    """md5(str(key))[:8] as int, mod ``n_buckets`` — the portable record
    bucket (DuckDB: ``('0x' || substr(md5(k), 1, 8))::UBIGINT % n``)."""
    return _md5_u32(values) % n_buckets


def _deterministic_topk(ds, key_col: str, k: int, batch_scores):
    """Shared sampler skeleton: per-batch score + local top-``k``
    (argpartition), then one global sort+limit over <= k rows per block —
    the exchange is sample-sized, never the corpus.  ``batch_scores(t)``
    returns ``(filtered_table, float64_scores)``; rows it drops are
    excluded from the sample.  Ties break by ``key_col`` ascending, so
    ``key_col`` values must be unique for a deterministic winner."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def score_topk(t: pa.Table) -> pa.Table:
        t, s = batch_scores(t)
        if t.num_rows == 0:
            return t.append_column("_sk", pa.array([], pa.float64()))
        if len(s) > k:
            keep = np.sort(np.argpartition(s, len(s) - k)[len(s) - k:])
            t = t.take(pa.array(keep))
            s = s[keep]
        return t.append_column("_sk", pa.array(s, pa.float64()))

    cands = ds.map_batches(score_topk, batch_format="pyarrow")
    return (cands.sort(["_sk", key_col], descending=[True, False])
            .limit(k).drop_columns(["_sk"]))


def weighted_sample(ds, key_col: str, weight_col: str, k: int):
    """Deterministic weighted sampling WITHOUT replacement, top-``k``.

    Efraimidis & Spirakis (IPL 2006) A-ES keys: each row with weight w > 0
    gets score ``ln(u) / w`` for a uniform u in (0,1); the k largest scores
    are a weighted sample without replacement.  u derives from md5 of the
    row key — ``(md5_32(key) + 0.5) / 2^32`` — so the sample is reproducible
    across runs, engines, and partitionings (SQL:
    ``ln((('0x'||substr(md5(CAST(key AS VARCHAR)),1,8))::UBIGINT + 0.5)
    / 4294967296.0) / w``, ORDER BY DESC, ties by key).  Rows with NULL or
    non-positive weight are excluded (SQL comparison-with-NULL parity).

    Scale shape: per-batch top-k (argpartition) so at most k rows per block
    reach the final sort — the global sort+limit runs over ≤ k·#blocks
    candidate rows, never the corpus.

    ``key_col`` values must be unique — they seed the deterministic uniforms
    AND break score ties; duplicate keys make the winner among their copies
    arbitrary in any engine.
    """

    def batch_scores(t: pa.Table):
        w = pc.cast(_col(t, weight_col), pa.float64()).to_numpy(zero_copy_only=False)
        valid = np.isfinite(w) & (w > 0)
        if not valid.all():
            t = t.filter(pa.array(valid))
            w = w[valid]
        if t.num_rows == 0:
            return t, np.zeros(0, np.float64)
        u = _md5_u32(_col(t, key_col).to_pylist()).astype(np.float64)
        return t, np.log((u + 0.5) / 4294967296.0) / w

    return _deterministic_topk(ds, key_col, k, batch_scores)


def split_by_hash(ds, key_col: str, splits: dict[str, float] | None = None,
                  out_col: str = "split"):
    """Append a deterministic train/valid/test ``split`` label per record.

    ``splits`` is an ordered {name: fraction} (fractions sum to 1).  A record's
    split depends only on md5 of its key — stable across runs, engines,
    partitionings, and corpus growth (new records never move old ones between
    splits, the property hash-splits exist for).
    """
    splits = splits or {"train": 0.98, "valid": 0.01, "test": 0.01}
    fracs = np.array(list(splits.values()), dtype=np.float64)
    if fracs.min() < 0 or abs(fracs.sum() - 1.0) > 1e-9:
        raise ValueError(f"split fractions must be >=0 and sum to 1, got {splits}")
    bounds = np.round(np.cumsum(fracs) * SPLIT_BUCKETS).astype(np.int64)
    names = np.array(list(splits.keys()), dtype=object)

    def fn(t: pa.Table) -> pa.Table:
        b = _md5_bucket(_col(t, key_col).to_pylist())
        idx = np.searchsorted(bounds, b, side="right")
        return t.append_column(out_col, pa.array(names[idx], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_per_group(ds, group_cols: list[str], n: int, key_col: str,
                     rank_col: str | None = "rank"):
    """Deterministic stratified sample: the ``n`` records per group whose
    md5(key) sorts first (uniform within the group, reproducible anywhere:
    SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY substr(md5(k),1,16), k)
    <= n``).

    Rides :func:`~dedupe_examples_ray.windows.grouped_top_n`'s combiner, so
    at most ``n`` rows per group per batch move through the shuffle — a
    billion-page group costs the same as a thousand-page one.
    """
    from ..windows import grouped_top_n

    md5 = hashlib.md5

    def add_key(t: pa.Table) -> pa.Table:
        ks = [md5(str(v).encode()).hexdigest()[:16] for v in _col(t, key_col).to_pylist()]
        return t.append_column("_smpkey", pa.array(ks, pa.string()))

    out = grouped_top_n(
        ds.map_batches(add_key, batch_format="pyarrow"),
        key_cols=list(group_cols),
        by="_smpkey",
        n=n,
        ascending=True,
        tie_cols=[key_col],
        rank_col=rank_col,
    )
    return out.drop_columns(["_smpkey"])


# ----------------------------------------------------------------- url ops
_URL_HEAD_RE = r"^(?P<head>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(?P<rest>.*)$"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/?#]+)"


def normalize_url(ds, url_col: str = "url", out_col: str = "url_norm"):
    """Append a canonical url: strip ``#fragment``, lowercase the
    ``scheme://host`` head, drop a trailing empty query (``?``) and a single
    trailing ``/``.  Fully Arrow-vectorized; non-url values pass through
    unchanged (post-fragment-strip).  The standard first step before
    url-keyed exact dedup of a web crawl.
    """

    def fn(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(_col(t, url_col), pa.string()), "")
        s = pc.replace_substring_regex(s, r"#.*$", "")
        m = pc.extract_regex(s, _URL_HEAD_RE)
        norm = pc.if_else(
            pc.is_null(m),
            s,
            pc.binary_join_element_wise(
                pc.utf8_lower(pc.struct_field(m, "head")), pc.struct_field(m, "rest"), ""
            ),
        )
        norm = pc.replace_substring_regex(norm, r"\?$", "")
        norm = pc.replace_substring_regex(norm, r"(.)/$", "\\1")
        return t.append_column(out_col, norm)

    return ds.map_batches(fn, batch_format="pyarrow")


def add_url_host(ds, url_col: str = "url", out_col: str = "host"):
    """Append the url's host (``''`` for non-url values — DuckDB
    ``regexp_extract`` no-match parity), the key for domain-level stats,
    per-domain sampling, and robots/quality policies."""

    def fn(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(_col(t, url_col), pa.string()), "")
        m = pc.extract_regex(s, _HOST_RE)
        host = pc.if_else(pc.is_null(m), "", pc.utf8_lower(pc.struct_field(m, "host")))
        return t.append_column(out_col, host)

    return ds.map_batches(fn, batch_format="pyarrow")


def host_stats(ds, url_col: str = "url", text_col: str = "text"):
    """Per-host page count and text-size stats (combiner-pattern groupby via
    :func:`~dedupe_examples_ray.relational.grouped_stats` — one row per
    (host, batch) moves through the shuffle)."""
    from ..relational import grouped_stats

    def add_len(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
        return t.append_column("_n_chars", pc.cast(pc.utf8_length(s), pa.int64()))

    withhost = add_url_host(ds, url_col=url_col).map_batches(add_len, batch_format="pyarrow")
    return grouped_stats(withhost, ["host"], "_n_chars", prefix="chars")


# ------------------------------------------------------- re-crawl dedup
def _latest_indices(t: pa.Table, key_col: str, sort_cols: list[str]) -> np.ndarray:
    """Row indices of each key's winner (greatest ``sort_cols[1:]``) in ``t``.

    Only the key/timestamp columns are converted; payload columns (html,
    text) stay in Arrow for the subsequent zero-copy ``take``.
    """
    df = pa.table({c: _col(t, c) for c in sort_cols}).to_pandas()
    order = df.sort_values(sort_cols, kind="stable", na_position="first").index.to_numpy()
    codes, _ = pd.factorize(df[key_col])  # nulls -> -1: one group, any dtype
    keys = codes[order]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = keys[:-1] != keys[1:]
    return np.sort(order[is_last])


def keep_latest(ds, key_col: str, ts_col: str, tie_col: str | None = None,
                num_buckets: int | None = None):
    """Latest-row-per-key dedup — web re-crawl semantics: keep, for every
    key (e.g. ``url``), the row with the greatest ``ts_col`` (``warc_ts``);
    ties broken by the greatest ``tie_col`` (pass one whenever (key, ts) is
    not unique) so the winner is deterministic under any partitioning.
    Null timestamps lose to any non-null one; null keys form one group
    (SQL ``GROUP BY`` semantics).

    Scale shape (combiner pattern): each input batch first reduces to its
    own per-key winners — a batch holding k snapshots of one url forwards
    one row — then ONE bucketed shuffle on ``stable_hash(key) % num_buckets``
    moves only those per-batch winners, and the per-bucket task picks the
    global winner.  Shuffle volume is O(distinct keys × batches-per-key),
    not O(rows): a superseded snapshot's payload never leaves its input
    block.

    Reference analog: the DISTINCT-donors step keeps one representative per
    identity (mysql_init_db.py:134-143); ``keep_latest`` is the time-aware
    variant a snapshot-stacked crawl table needs.
    """
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)
    from ..pairs import stable_hash

    sort_cols = [key_col, ts_col] + ([tie_col] if tie_col else [])

    def local_winner(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.take(pa.array(_latest_indices(t, key_col, sort_cols)))
        b = stable_hash(_col(t, key_col).to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_bucket", pa.array(b.astype(np.int64), pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        if t.num_rows == 0:
            return t
        return t.take(pa.array(_latest_indices(t, key_col, sort_cols)))

    partial = ds.map_batches(local_winner, batch_format="pyarrow")
    return partial.groupby("_bucket").map_groups(final, batch_format="pyarrow")


# ------------------------------------------------------- decontamination
def ngram_decontaminate(train_ds, eval_ds, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 8):
    """Benchmark decontamination: flag every training document that shares a
    word ``n``-gram with the evaluation set (the GPT-3/Gopher train–test
    overlap rule).  Documents shorter than ``n`` words contribute their whole
    text as one gram (so short eval items still match verbatim copies).

    Returns ``(doc_id, n_hits, contaminated)`` per training doc, where
    ``n_hits`` counts the doc's DISTINCT n-grams found in the eval set.

    Scale shape: the eval side is benchmark-sized by definition — its gram
    hashes are collected once (bounded by eval size, never the corpus),
    deduped, sorted, and broadcast via ``ray.put``; the training pass is one
    streaming ``map_batches`` doing a vectorized ``np.isin`` per batch — no
    shuffle, no training-corpus materialization anywhere.
    """
    import ray

    from .dedup import _get_broadcast, _hash_tokens, word_shingles

    def gram_hashes(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        grams = [word_shingles(tx, n) for tx in texts]
        flat = [g for gs in grams for g in gs]
        hs = _hash_tokens(np.asarray(flat, dtype=object)) if flat else np.array([], np.uint64)
        return pa.table({"h": pa.array(np.unique(hs), pa.uint64())})

    eval_hashes = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in eval_ds.map_batches(gram_hashes, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    ev = np.unique(np.concatenate(eval_hashes)) if eval_hashes else np.array([], np.uint64)
    ev_ref = ray.put(ev)

    def check(t: pa.Table) -> pa.Table:
        evs = _get_broadcast(ev_ref)
        texts = t[text_col].to_pylist()
        per_doc = [np.unique(_hash_tokens(word_shingles(tx, n))) for tx in texts]
        counts = np.array([len(x) for x in per_doc], dtype=np.int64)
        n_hits = np.zeros(len(texts), dtype=np.int64)
        if counts.sum():
            hits = np.isin(np.concatenate(per_doc), evs, assume_unique=False)
            offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
            nz = counts > 0  # reduceat over non-empty docs only: empty docs
            # have no elements, so consecutive non-empty starts still bound
            # each doc's exact segment (and no start can run off the end)
            n_hits[nz] = np.add.reduceat(hits, offsets[nz])
        return pa.table(
            {
                id_col: t[id_col],
                "n_hits": pa.array(n_hits.astype(np.int64), pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return train_ds.map_batches(check, batch_format="pyarrow")


# ---------------------------------------------------------- cleaning funnel
def _funnel_masks(t: pa.Table, text_col: str, lang_col: str | None,
                  keep_langs, min_tokens: int, max_tokens: int,
                  min_quality: float, max_dup_line_frac: float) -> list[np.ndarray]:
    """Cumulative keep-masks for the four filter stages, vectorized.

    Reuses the exact expression trees of ops.textstats (token_count /
    quality_score / repetition_stats) so the DuckDB funnel oracle mirrors
    bit-for-bit.
    """
    from .textstats import TOKEN_RE, _STOPWORDS

    n = t.num_rows
    s = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")

    # 1. language allow-list
    if lang_col is not None:
        lang = _col(t, lang_col)
        m_lang = np.zeros(n, dtype=bool)
        for lg in keep_langs:
            m_lang |= pc.equal(pc.fill_null(pc.cast(lang, pa.string()), ""), lg).to_numpy(
                zero_copy_only=False
            )
    else:
        m_lang = np.ones(n, dtype=bool)

    # 2. token-count bounds (same TOKEN_RE as ops.token_count)
    n_tok = pc.count_substring_regex(s, TOKEN_RE).to_numpy(zero_copy_only=False)
    m_tok = m_lang & (n_tok >= min_tokens) & (n_tok <= max_tokens)

    # 3. composite quality (same expression tree as ops.quality_score)
    n_chars = pc.utf8_length(s)
    n_chars_f = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    n_punct = pc.count_substring_regex(s, r"[^\w\s]")
    n_words = pc.count_substring_regex(s, r"[A-Za-z0-9]+")
    n_stop = pc.count_substring_regex(
        pc.utf8_lower(s), r"\b(" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"
    )
    punct_ratio = pc.divide(pc.cast(n_punct, pa.float64()), n_chars_f)
    stop_ratio = pc.divide(
        pc.cast(n_stop, pa.float64()),
        pc.cast(pc.max_element_wise(n_words, 1), pa.float64()),
    )
    len_term = pc.min_element_wise(pc.divide(pc.cast(n_chars, pa.float64()), 200.0), 1.0)
    stop_term = pc.min_element_wise(pc.multiply(stop_ratio, 4.0), 1.0)
    punct_term = pc.max_element_wise(pc.subtract(1.0, pc.multiply(punct_ratio, 4.0)), 0.0)
    quality = pc.multiply(
        pc.multiply(len_term, punct_term), pc.add(pc.multiply(stop_term, 0.5), 0.5)
    ).to_numpy(zero_copy_only=False)
    m_q = m_tok & (quality >= min_quality)

    # 4. duplicate-line fraction (same non-blank-line rule as repetition_stats)
    texts = s.to_pylist()
    dup_l = np.zeros(n)
    for i in np.flatnonzero(m_q):  # only survivors — the cold minority
        lines = [ln for ln in texts[i].split("\n") if ln.strip()]
        if lines:
            dup_l[i] = (len(lines) - len(set(lines))) / len(lines)
    m_rep = m_q & (dup_l <= max_dup_line_frac)

    return [m_lang, m_tok, m_q, m_rep]


def clean_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                 lang_col: str | None = "lang", keep_langs=("en",),
                 min_tokens: int = 20, max_tokens: int = 50_000,
                 min_quality: float = 0.3, max_dup_line_frac: float = 0.30,
                 dedupe: bool = True, n_buckets: int = 256):
    """C4/Gopher-style cleaning funnel over a document table; returns the
    surviving rows with their original columns.

    Stages — 1-4 fuse into ONE streaming pass (stateless ``map_batches``);
    stage 5 is the only shuffle, and it moves just the filtered survivors:

    1. language allow-list (``lang_col`` in ``keep_langs``)
    2. token-count bounds (ops.token_count's TOKEN_RE)
    3. composite quality >= ``min_quality`` (ops.quality_score's formula)
    4. duplicate-line fraction <= ``max_dup_line_frac`` (repetition_stats rule)
    5. exact text dedup, keep the min id per distinct text (reference A1
       ``SELECT DISTINCT``, mysql_init_db.py:134-143, as a bucketed groupby)
    """

    def filt(t: pa.Table) -> pa.Table:
        masks = _funnel_masks(t, text_col, lang_col, keep_langs, min_tokens,
                              max_tokens, min_quality, max_dup_line_frac)
        return t.filter(pa.array(masks[-1]))

    survivors = ds.map_batches(filt, batch_format="pyarrow")
    if not dedupe:
        return survivors

    def add_bucket(t: pa.Table) -> pa.Table:
        texts = np.asarray(_col(t, text_col).to_pylist(), dtype=object)
        if len(texts):
            texts = np.where(pd.isna(texts), "", texts)
        hs = pd.util.hash_array(texts).astype(np.uint64)
        return t.append_column(
            "_bkt", pa.array((hs % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def keep_min(df: pd.DataFrame) -> pd.DataFrame:
        # group on the text itself (the hash only routes buckets — no
        # collision risk in the keep decision)
        keep = df.groupby(text_col, sort=False)[id_col].transform("min") == df[id_col]
        return _clean_arrow(df[keep].drop(columns=["_bkt"]))

    return (
        survivors.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(keep_min, batch_format="pandas")
    )


def clean_corpus_funnel(ds, text_col: str = "text", id_col: str = "doc_id",
                        lang_col: str | None = "lang", keep_langs=("en",),
                        min_tokens: int = 20, max_tokens: int = 50_000,
                        min_quality: float = 0.3, max_dup_line_frac: float = 0.30,
                        ) -> pd.DataFrame:
    """Per-stage survivor counts for the :func:`clean_corpus` funnel — the
    lineage metric a production cleaning job publishes (north_rule: per-stage
    metrics, no silent drops).  One streaming pass emits per-batch partial
    counts; a tiny groupby sums them; the final dedup count runs the real
    stage 5 on the survivors.  Returns (stage, n_rows) ordered by stage.
    """
    stages = ["input", "lang", "tokens", "quality", "repetition"]

    def partial(t: pa.Table) -> pa.Table:
        masks = _funnel_masks(t, text_col, lang_col, keep_langs, min_tokens,
                              max_tokens, min_quality, max_dup_line_frac)
        counts = [t.num_rows] + [int(m.sum()) for m in masks]
        return pa.table({
            "stage_idx": pa.array(range(len(stages)), pa.int64()),
            "stage": pa.array(stages, pa.string()),
            "n_rows": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["stage_idx", "stage"])
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
        .sort_values("stage_idx")
    )
    n_dedup = clean_corpus(
        ds, text_col=text_col, id_col=id_col, lang_col=lang_col,
        keep_langs=keep_langs, min_tokens=min_tokens, max_tokens=max_tokens,
        min_quality=min_quality, max_dup_line_frac=max_dup_line_frac,
    ).count()
    out = pd.concat(
        [agg[["stage", "n_rows"]],
         pd.DataFrame({"stage": ["dedup"], "n_rows": [n_dedup]})],
        ignore_index=True,
    )
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out


def chunk_text(ds, text_col: str = "text", id_col: str = "doc_id",
               size: int = 200, overlap: int = 50, out_col: str = "chunk"):
    """Split each document into fixed-width character windows with overlap —
    the context-window packing step of a training-data pipeline (1 -> N
    ``flat_map`` semantics, expressed as a batch transform).

    Chunk ``k`` covers codepoints ``[k*stride, k*stride + size)`` with
    ``stride = size - overlap``; chunks are emitted while ``k*stride <
    len(text)``, so the last chunk may be short and an empty/null document
    yields no chunks.  Deterministic and SQL-reproducible (DuckDB
    ``generate_series`` + ``substring`` oracle in ``__ray_entry__``).

    Scale shape: stateless, shuffle-free, vectorized per CHUNK INDEX, not per
    row — each iteration slices the whole surviving batch with one Arrow
    ``utf8_slice_codeunits`` kernel, so per-batch cost is
    O(max_chunks x kernel) with zero Python-per-row work.  Output rows are
    (id, chunk_id, chunk): the full text never fans out more than the
    overlap factor ``size/stride``.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap

    def fn(t: pa.Table) -> pa.Table:
        text = _col(t, text_col)
        ids = _col(t, id_col)
        lens = pc.fill_null(pc.utf8_length(text), 0)
        empty = pa.table({
            id_col: pa.array([], ids.type),
            "chunk_id": pa.array([], pa.int64()),
            out_col: pa.array([], pa.string()),
        })
        if t.num_rows == 0:
            return empty
        max_len = pc.max(lens).as_py() or 0
        parts, k = [], 0
        while k * stride < max_len:
            start = k * stride
            mask = pc.greater(lens, start)
            sub_text = text.filter(mask)
            parts.append(pa.table({
                id_col: ids.filter(mask),
                "chunk_id": pa.array(np.full(len(sub_text), k, np.int64)),
                out_col: pc.utf8_slice_codeunits(sub_text, start, start + size),
            }))
            k += 1
        return pa.concat_tables(parts) if parts else empty

    return ds.map_batches(fn, batch_format="pyarrow")


def _ragged_join(flat: pa.Array, counts: np.ndarray, sep: str) -> pa.Array:
    """Join consecutive runs of ``counts[i]`` strings from ``flat`` with
    ``sep`` — one Arrow ``binary_join`` kernel over a reconstructed
    ListArray, no per-group Python joins."""
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    return pc.binary_join(lst, sep)


def paragraph_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                    words_per_para: int = 10, num_buckets: int | None = None,
                    workdir: str | None = None, input_token: str | None = None):
    """Corpus-wide paragraph-level exact dedup (the CCNet/Gopher line-dedup
    shape): split each document into fixed ``words_per_para``-word paragraphs,
    keep only the FIRST occurrence of each distinct paragraph corpus-wide
    (ordered by ``(id, para_idx)``), and reassemble the surviving paragraphs
    per document in original order.

    Documents whose every paragraph was seen earlier vanish from the output
    (their text would be empty).  Output: ``(id_col, text_col, n_paras_kept,
    n_paras_total)``.

    Scale shape: three stages, all vectorized —

    1. explode (map_batches): Arrow ``split_pattern`` -> ragged re-chunk into
       a paragraph ListArray -> ``binary_join`` (no Python-per-row work);
       paragraphs carry a 64-bit content hash for bucketing.
    2. winner-per-paragraph: ONE bucketed groupby on ``hash(para) % B``;
       within a bucket, dedup is exact on the paragraph STRING (the hash only
       routes), via a stable sort + ``drop_duplicates(keep="first")``.
    3. reassembly: ONE bucketed groupby on ``hash(id) % B``; within a bucket,
       per-doc join is again a single ``binary_join`` over group offsets.

    Both shuffles carry (id, para_idx, para) — the paragraph text must move
    once for reassembly, which is the op's inherent cost; nothing is ever
    broadcast or driver-collected.
    """
    from ..scale import resolve_buckets

    k = int(words_per_para)
    if k < 1:
        raise ValueError(f"words_per_para must be >= 1, got {words_per_para}")
    num_buckets = resolve_buckets(num_buckets, ds)

    empty_exploded = pa.table({
        id_col: pa.array([], pa.int64()),
        "para_idx": pa.array([], pa.int64()),
        "para": pa.array([], pa.string()),
        "n_paras_total": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int64()),
    })

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_exploded
        text = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
        ids = _col(t, id_col)
        words = pc.split_pattern(text, " ")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words)
        n_paras = (counts + k - 1) // k  # counts >= 1 (split of "" is [""])
        total = int(n_paras.sum())
        doc_rep = np.repeat(np.arange(len(counts)), n_paras)
        para_firsts = np.zeros(len(n_paras), np.int64)
        np.cumsum(n_paras[:-1], out=para_firsts[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(para_firsts, n_paras)
        wstart = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=wstart[1:])
        starts = np.repeat(wstart, n_paras) + within * k
        offsets = np.append(starts, counts.sum())
        para = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat), " ")
        h = pd.util.hash_array(para.to_numpy(zero_copy_only=False).astype(object))
        return pa.table({
            id_col: pc.take(ids, pa.array(doc_rep, pa.int64())),
            "para_idx": pa.array(within, pa.int64()),
            "para": para,
            "n_paras_total": pa.array(np.repeat(n_paras, n_paras), pa.int64()),
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def winners(df: pd.DataFrame) -> pa.Table:
        # hash only ROUTES to the bucket; dedup is exact on the para string
        df = df.sort_values([id_col, "para_idx"], kind="mergesort")
        out = df.drop_duplicates("para", keep="first")
        return _clean_arrow(out[[id_col, "para_idx", "para", "n_paras_total"]])

    def _kept_stage():
        return exploded.groupby("bucket").map_groups(winners, batch_format="pandas")

    if workdir is not None:
        # checkpoint the explode->global-first-occurrence stage (north_rule
        # resume); reassembly recomputes from the committed survivors
        from ..checkpoint import run_stage

        fp = (
            f"para-{k}-b{num_buckets}-n{ds.count()}"
            + (f"-{input_token}" if input_token else "")
        )
        kept = run_stage("para_kept", _kept_stage, workdir, fp)
    else:
        kept = _kept_stage()

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            _col(t, id_col).to_numpy(zero_copy_only=False).astype(object))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                text_col: pd.Series([], dtype=object),
                "n_paras_kept": pd.Series([], dtype=np.int64),
                "n_paras_total": pd.Series([], dtype=np.int64),
            })
        df = df.sort_values([id_col, "para_idx"], kind="mergesort")
        codes, uniq = pd.factorize(df[id_col].to_numpy())
        counts = np.bincount(codes).astype(np.int64)
        firsts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=firsts[1:])
        joined = _ragged_join(
            pa.array(df["para"].to_numpy(), pa.string()), counts, " ")
        return _clean_arrow(pd.DataFrame({
            id_col: uniq,
            text_col: joined.to_pandas().to_numpy(),
            "n_paras_kept": counts,
            "n_paras_total": df["n_paras_total"].to_numpy()[firsts].astype(np.int64),
        }))

    return kept.map_batches(add_doc_bucket, batch_format="pyarrow").groupby(
        "bucket").map_groups(assemble, batch_format="pandas")


# --------------------------------------------- cross-document dup fraction
def cross_dup_fraction(ds, text_col: str = "text", id_col: str = "doc_id",
                       window: int = 8, stride: int = 4):
    """Per-document CROSS-corpus duplicated-content fraction — the
    MassiveText/Gopher "fraction of duplicated n-gram windows" quality
    signal (``repetition_stats`` measures WITHIN-doc repetition; this
    measures how much of a doc reappears anywhere in the corpus).

    Windows are ``window`` consecutive whitespace tokens at offsets
    0, stride, 2*stride, ... (full windows only; docs shorter than
    ``window`` tokens emit none and are absent from the output, SQL inner
    semantics).  A window is duplicated when its token sequence occurs
    more than once corpus-wide (any doc, itself included).

    Scale shape: windows travel as u64 polynomial hashes of the token
    hashes (never strings).  Three bounded shuffles on pre-aggregated or
    key-hashed rows: (1) window-hash counts via the ``grouped_sum``
    combiner, (2) a semi ``hash_join`` of window rows against the
    duplicated-hash keys (both sides bucket-cogrouped — the dup-hash table
    is corpus-sized in the worst case, so it is NEVER broadcast or
    collected), (3) per-doc counts via ``grouped_sum``.  Output:
    ``(doc_id, n_windows, n_dup, dup_frac)``.
    """
    from ..pairs import stable_hash
    from ..relational import grouped_sum, hash_join
    from .textstats import _tokenize_flat

    P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier (u64 wraparound)

    def emit_windows(t: pa.Table) -> pa.Table:
        parents, flat = _tokenize_flat(t, text_col)
        n = t.num_rows
        counts = np.bincount(parents, minlength=n) if len(parents) else np.zeros(n, np.int64)
        nw = np.where(counts >= window, (counts - window) // stride + 1, 0).astype(np.int64)
        total = int(nw.sum())
        if total == 0:
            return pa.table({id_col: t[id_col].take(pa.array([], pa.int64())),
                             "h": pa.array([], pa.uint64())})
        th = stable_hash(flat)
        starts = np.cumsum(counts) - counts
        doc_idx = np.repeat(np.arange(n), nw)
        within = np.arange(total) - np.repeat(np.cumsum(nw) - nw, nw)
        ws = np.repeat(starts, nw) + within * stride
        h = np.zeros(total, dtype=np.uint64)
        for j in range(window):
            h = h * P + th[ws + j]
        return pa.table({id_col: t[id_col].take(pa.array(doc_idx, pa.int64())),
                         "h": pa.array(h)})

    wins = ds.select_columns([id_col, text_col]).map_batches(
        emit_windows, batch_format="pyarrow")
    counts = grouped_sum(wins.select_columns(["h"]), ["h"], {}, count_col="c")
    dup_keys = counts.map_batches(
        lambda t: t.filter(pc.greater(t["c"], 1)).select(["h"]),
        batch_format="pyarrow")
    dup_wins = hash_join(wins, dup_keys, on="h", how="semi")
    n_dup = grouped_sum(dup_wins.select_columns([id_col]), [id_col], {},
                        count_col="n_dup")
    n_tot = grouped_sum(wins.select_columns([id_col]), [id_col], {},
                        count_col="n_windows")
    joined = hash_join(n_tot, n_dup.map_batches(
        lambda t: t.rename_columns([id_col + "__d", "n_dup"]),
        batch_format="pyarrow"), on=id_col, right_on=id_col + "__d", how="left")

    def finish(t: pa.Table) -> pa.Table:
        nd = pc.fill_null(t["n_dup"], 0)
        frac = pc.round(pc.divide(pc.cast(nd, pa.float64()),
                                  pc.cast(t["n_windows"], pa.float64())),
                        ndigits=4)
        return pa.table({id_col: t[id_col],
                         "n_windows": pc.cast(t["n_windows"], pa.int64()),
                         "n_dup": pc.cast(nd, pa.int64()),
                         "dup_frac": frac})

    return joined.map_batches(finish, batch_format="pyarrow")


def remove_dup_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                     window: int = 10):
    """Corpus-wide duplicated-span REMOVAL — the windowed form of ExactSubstr
    deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): every ``window``-token sequence that occurs
    more than once corpus-wide keeps its FIRST occurrence (min (doc_id,
    position)) and every other occurrence's tokens are cut from their
    documents.  The paper builds a corpus suffix array; this is the bounded
    map/shuffle approximation over fixed-width stride-1 windows — spans
    shorter than ``window`` tokens are not detected, longer ones are covered
    by their overlapping windows.

    Tokens are ``\\s+`` splits with empties dropped (the corpus-wide
    convention); output text is the kept tokens re-joined with single
    spaces — token-sequence semantics, original whitespace not preserved
    (same contract as the paper's token-level cuts).

    Scale shape: windows travel as u64 polynomial hashes with (doc, pos)
    coordinates — never strings.  One bucketed shuffle on the window hash
    ranks occurrences and emits removals (all-but-first per duplicated
    hash); removals aggregate per doc through a key-hash shuffle
    (``grouped_string_agg``) and rejoin the corpus with a big-big left
    ``hash_join`` — nothing is broadcast or collected.  The final cut is
    vectorized for the common untouched row; only rows that actually lose a
    span pay a Python reassembly.

    Output: ``(doc_id, text, n_tokens_total, n_tokens_removed)`` for every
    input row (untouched docs pass through with 0 removed).
    """
    from ..pairs import stable_hash
    from ..relational import grouped_string_agg, hash_join
    from ..scale import resolve_buckets
    from .textstats import _tokenize_flat

    P = np.uint64(0x100000001B3)

    def emit_windows(t: pa.Table) -> pa.Table:
        parents, flat = _tokenize_flat(t, text_col)
        n = t.num_rows
        counts = np.bincount(parents, minlength=n) if len(parents) else np.zeros(n, np.int64)
        nw = np.maximum(counts - window + 1, 0).astype(np.int64)
        total = int(nw.sum())
        if total == 0:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             "pos": pa.array([], pa.int64()),
                             "h": pa.array([], pa.uint64())})
        th = stable_hash(flat)
        starts = np.cumsum(counts) - counts
        doc_idx = np.repeat(np.arange(n), nw)
        pos = np.arange(total) - np.repeat(np.cumsum(nw) - nw, nw)
        ws = np.repeat(starts, nw) + pos
        h = np.zeros(total, dtype=np.uint64)
        for j in range(window):
            h = h * P + th[ws + j]
        return pa.table({id_col: t[id_col].take(pa.array(doc_idx, pa.int64())),
                         "pos": pa.array(pos, pa.int64()),
                         "h": pa.array(h)})

    wins = ds.select_columns([id_col, text_col]).map_batches(
        emit_windows, batch_format="pyarrow")
    B = resolve_buckets(None, ds)

    def bucket(t: pa.Table) -> pa.Table:
        bkt = (t["h"].combine_chunks().to_numpy(zero_copy_only=False) % B).astype(np.int64)
        return t.append_column("__bkt", pa.array(bkt))

    def removals(df: pd.DataFrame) -> pd.DataFrame:
        # all-but-first occurrence of every duplicated window hash; the
        # (doc_id, pos) sort pins "first" deterministically
        df = df.sort_values(["h", id_col, "pos"], kind="stable")
        dup = df.duplicated(subset="h", keep="first")
        out = df.loc[dup, [id_col, "pos"]]
        return out if len(out) else pd.DataFrame(
            {id_col: pd.Series([], dtype=df[id_col].dtype),
             "pos": pd.Series([], dtype="int64")})

    rem = wins.map_batches(bucket, batch_format="pyarrow").groupby(
        "__bkt").map_groups(removals, batch_format="pandas")
    rem_per_doc = grouped_string_agg(rem, id_col, "pos", sep=",",
                                     out_col="__starts")
    # a corpus with no duplicated window yields ZERO removal groups, leaving
    # rem_per_doc schema-less; union a typed empty table so the left join
    # below always sees the right side's columns
    import ray.data as rd

    from ..scoring import dataset_arrow_types

    id_type = dataset_arrow_types(ds.select_columns([id_col]))[id_col]
    typed_empty = rd.from_arrow(pa.table({
        id_col + "__r": pa.array([], id_type),
        "__starts": pa.array([], pa.string()),
    }))
    rhs = rem_per_doc.map_batches(
        lambda t: t.rename_columns([id_col + "__r", "__starts"]),
        batch_format="pyarrow").union(typed_empty)
    joined = hash_join(ds.select_columns([id_col, text_col]), rhs,
                       on=id_col, right_on=id_col + "__r", how="left")

    def cut(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        starts_col = t["__starts"].to_pylist()
        texts = txt.to_pylist()
        out_txt: list[str] = []
        n_tot = np.empty(len(texts), dtype=np.int64)
        n_rem = np.zeros(len(texts), dtype=np.int64)
        for i, (s, x) in enumerate(zip(starts_col, texts)):
            toks = [w for w in x.split() if w != ""]
            n_tot[i] = len(toks)
            if not s:  # untouched row: token-normalized passthrough
                out_txt.append(" ".join(toks))
                continue
            mask = np.zeros(len(toks), dtype=bool)
            for p in s.split(","):
                q = int(p)
                mask[q:q + window] = True
            n_rem[i] = int(mask.sum())
            out_txt.append(" ".join(w for w, m in zip(toks, mask) if not m))
        return pa.table({id_col: t[id_col],
                         text_col: pa.array(out_txt, pa.string()),
                         "n_tokens_total": pa.array(n_tot),
                         "n_tokens_removed": pa.array(n_rem)})

    return joined.map_batches(cut, batch_format="pyarrow")


def source_ngram_overlap(ds, group_col: str = "source", text_col: str = "text",
                         ngram: int = 8, round_digits: int = 6):
    """Cross-source n-gram CONTAINMENT matrix — for every ordered source pair
    (a, b), the fraction of a's distinct ``ngram``-token windows that also
    occur in b (the decontamination / corpus-leakage audit: 'how much of
    source a is inside source b?').  Zero-overlap pairs are omitted (inner
    semantics).

    Scale shape: windows travel as u64 hashes with a per-batch distinct
    combiner, then ONE global (source, hash) distinct; pair hits come from a
    bucketed self-merge on the hash (vectorized pandas merge per bucket), so
    the exchange is bounded by distinct grams x the number of sources sharing
    each gram — the output is inherently O(#sources^2) and assumes a moderate
    source count (feeds, crawls, datasets), not unbounded cardinality.

    Output: ``(source_a, source_b, shared, n_a, containment)``.
    """
    from ..relational import distinct, grouped_sum, hash_join
    from ..scale import resolve_buckets
    from .textstats import _tokenize_flat

    P = np.uint64(0x100000001B3)

    def emit(t: pa.Table) -> pa.Table:
        from ..pairs import stable_hash

        parents, flat = _tokenize_flat(t, text_col)
        n = t.num_rows
        counts = np.bincount(parents, minlength=n) if len(parents) else np.zeros(n, np.int64)
        nw = np.maximum(counts - ngram + 1, 0).astype(np.int64)
        total = int(nw.sum())
        if total == 0:
            return pa.table({group_col: pa.array([], t.schema.field(group_col).type),
                             "h": pa.array([], pa.uint64())})
        th = stable_hash(flat)
        starts = np.cumsum(counts) - counts
        src_idx = np.repeat(np.arange(n), nw)
        ws = np.repeat(starts, nw) + (np.arange(total) -
                                      np.repeat(np.cumsum(nw) - nw, nw))
        h = np.zeros(total, dtype=np.uint64)
        for j in range(ngram):
            h = h * P + th[ws + j]
        out = pa.table({group_col: t[group_col].take(pa.array(src_idx, pa.int64())),
                        "h": pa.array(h)})
        # per-batch distinct combiner: shrink before the shuffle
        df = out.to_pandas().drop_duplicates()
        return _clean_arrow(df)

    grams = distinct(ds.select_columns([group_col, text_col]).map_batches(
        emit, batch_format="pyarrow"), [group_col, "h"])
    n_per_src = grouped_sum(grams.select_columns([group_col]), [group_col], {},
                            count_col="n_a")
    B = resolve_buckets(None, grams)

    def bucket(t: pa.Table) -> pa.Table:
        bkt = (t["h"].combine_chunks().to_numpy(zero_copy_only=False) % B).astype(np.int64)
        return t.append_column("__bkt", pa.array(bkt))

    def pair_hits(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="h", suffixes=("_a", "_b"))
        m = m[m[group_col + "_a"] != m[group_col + "_b"]]
        g = m.groupby([group_col + "_a", group_col + "_b"], sort=False,
                      as_index=False).size().rename(
            columns={group_col + "_a": "source_a", group_col + "_b": "source_b",
                     "size": "shared"})
        if not len(g):
            return pd.DataFrame({"source_a": pd.Series([], dtype=object),
                                 "source_b": pd.Series([], dtype=object),
                                 "shared": pd.Series([], dtype="int64")})
        g["shared"] = g["shared"].astype("int64")
        return g

    hits = grams.map_batches(bucket, batch_format="pyarrow").groupby(
        "__bkt").map_groups(
        lambda df: pair_hits(df.drop(columns="__bkt")), batch_format="pandas")
    shared = grouped_sum(hits, ["source_a", "source_b"], {"shared": "shared"})
    joined = hash_join(shared, n_per_src.map_batches(
        lambda t: t.rename_columns(["__src", "n_a"]), batch_format="pyarrow"),
        on="source_a", right_on="__src")

    def finish(t: pa.Table) -> pa.Table:
        c = pc.round(pc.divide(pc.cast(t["shared"], pa.float64()),
                               pc.cast(t["n_a"], pa.float64())),
                     ndigits=round_digits)
        return pa.table({"source_a": t["source_a"], "source_b": t["source_b"],
                         "shared": pc.cast(t["shared"], pa.int64()),
                         "n_a": pc.cast(t["n_a"], pa.int64()),
                         "containment": c})

    return joined.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- boilerplate-line removal
_STRIP_BROADCAST_BUDGET = 4_000_000  # boilerplate keys broadcast under this


def _mix_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 hash arrays into one, splitmix64
    finalized — the (host, segment) composite key both boilerplate passes
    share.  Wrapping uint64 arithmetic is intentional."""
    x = (a * np.uint64(0xBF58476D1CE4E5B9)) ^ b
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _segment_batch(t: pa.Table, text_col: str, host_col: str, delim: str):
    """Shared explode for both boilerplate passes: split each doc's text on
    ``delim`` and return ``(flat_segments, parent_idx, composite_key,
    maskable, text_null, host_strs)`` — ``maskable`` marks segments eligible
    for boilerplate treatment (non-whitespace, non-null host; whitespace-only
    segments and null-host docs pass through untouched, matching the SQL
    oracle where NULL join keys never match)."""
    from ..pairs import stable_hash

    text = _col(t, text_col)
    text_null = pc.is_null(text).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(pc.cast(text, pa.string()), "")
    host = _col(t, host_col)
    hvalid = pc.is_valid(host).to_numpy(zero_copy_only=False)
    hosts = pc.fill_null(pc.cast(host, pa.string()), "")
    splits = pc.split_pattern(filled, delim)
    counts = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(splits)
    parent = np.repeat(np.arange(len(counts)), counts)
    nonws = pc.not_equal(pc.utf8_trim_whitespace(flat), "").to_numpy(
        zero_copy_only=False)
    seg_h = stable_hash(flat.to_numpy(zero_copy_only=False))
    host_h = stable_hash(hosts.to_numpy(zero_copy_only=False))
    key = _mix_u64(host_h[parent], seg_h) if len(parent) else np.zeros(0, np.uint64)
    maskable = nonws & hvalid[parent]
    return flat, parent, key, maskable, text_null, counts


def boilerplate_keys(ds, text_col: str = "text", host_col: str = "source",
                     id_col: str = "doc_id", min_docs: int = 2,
                     delim: str = "\n", num_buckets: int | None = None):
    """Pass 1 of :func:`strip_boilerplate`: the set of (host, segment)
    composite u64 keys whose segment occurs in >= ``min_docs`` DISTINCT
    documents of the same host (CCNet / RefinedWeb frequent-line discovery).

    Combiner-shaped: each batch collapses to per-(host, segment) distinct-doc
    partial counts (a document lives in exactly one batch, so partials sum
    exactly), then ONE bucketed shuffle over O(#distinct segments) count rows
    — never the corpus.  Output: ``(bkey uint64)`` — only frequent segments,
    small by construction."""
    from ..scale import resolve_buckets

    B = resolve_buckets(num_buckets, ds)
    empty = pa.table({"bkey": pa.array([], pa.uint64()),
                      "cnt": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        flat, parent, key, maskable, _nulls, _counts = _segment_batch(
            t, text_col, host_col, delim)
        if not maskable.any():
            return empty
        key, pidx = key[maskable], parent[maskable]
        order = np.lexsort((key, pidx))
        k2, p2 = key[order], pidx[order]
        first = np.ones(len(k2), bool)
        first[1:] = (k2[1:] != k2[:-1]) | (p2[1:] != p2[:-1])
        uk, cnt = np.unique(k2[first], return_counts=True)
        return pa.table({"bkey": pa.array(uk, pa.uint64()),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array((uk % np.uint64(B)).astype(np.int64))})

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bkey", sort=False)["cnt"].sum()
        g = g[g >= min_docs]
        return pd.DataFrame({"bkey": g.index.to_numpy(np.uint64)})

    partials = ds.select_columns([text_col, host_col]).map_batches(
        partial, batch_format="pyarrow")
    return partials.groupby("bucket").map_groups(reduce_bucket,
                                                 batch_format="pandas")


def strip_boilerplate(ds, text_col: str = "text", id_col: str = "doc_id",
                      host_col: str = "source", min_docs: int = 2,
                      delim: str = "\n", mode: str = "auto",
                      broadcast_row_budget: int | None = None,
                      num_buckets: int | None = None):
    """Per-host boilerplate-segment removal (the CCNet/RefinedWeb cleaner):
    drop every segment (line, with ``delim="\\n"``) that occurs in >=
    ``min_docs`` DISTINCT documents of the same host, preserving original
    segment order; whitespace-only segments and null-host documents are
    never stripped (SQL NULL-key semantics).  Output: ``(id_col, text_col,
    n_removed)`` — one row per input document; text is NULL when the input
    text was NULL or every segment was stripped (SQL ``string_agg`` over an
    empty set).

    Tiers (identical outputs, test-verified):

    - ``broadcast`` (boilerplate key set <= ``broadcast_row_budget``): the
      sorted u64 key array is ``ray.put`` once and membership is a
      vectorized ``searchsorted`` per batch — docs stream, nothing shuffles.
    - ``join`` (unbounded key set): explode -> ``hash_join`` LEFT on the
      composite key (big-big, bucketed) -> bucketed per-doc reassembly via
      one ``binary_join`` kernel per group.  Segment text moves through two
      shuffles — the op's inherent cost when the frequent-set itself is
      too large for worker heaps.

    ``mode="auto"`` picks by counting the (materialized, small) key set.
    """
    import ray

    from ..relational import hash_join
    from ..scale import resolve_buckets

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto/broadcast/join, got {mode!r}")
    budget = _STRIP_BROADCAST_BUDGET if broadcast_row_budget is None else broadcast_row_budget
    B = resolve_buckets(num_buckets, ds)
    keys_ds = boilerplate_keys(ds, text_col=text_col, host_col=host_col,
                               id_col=id_col, min_docs=min_docs, delim=delim,
                               num_buckets=B).materialize()
    n_keys = keys_ds.count()  # keys_ds is materialized: count is free
    if mode == "auto":
        mode = "broadcast" if n_keys <= budget else "join"
    if n_keys == 0:
        # nothing is boilerplate: broadcast of the empty set is a pure
        # passthrough (and the join tier can't infer a schema from an
        # empty mapped dataset)
        mode = "broadcast"

    if mode == "broadcast":
        parts = [b["bkey"].to_numpy(zero_copy_only=False)
                 for b in keys_ds.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        ref = ray.put(np.sort(np.concatenate(parts))
                      if parts else np.zeros(0, np.uint64))

        def strip_batch(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            flat, parent, key, maskable, text_null, counts = _segment_batch(
                t, text_col, host_col, delim)
            n = t.num_rows
            if len(key) and len(ks):
                pos = np.searchsorted(ks, key)
                pos_c = np.minimum(pos, len(ks) - 1)
                is_b = (pos < len(ks)) & (ks[pos_c] == key) & maskable
            else:
                is_b = np.zeros(len(key), bool)
            keep = ~is_b
            kept_counts = np.bincount(parent[keep], minlength=n).astype(np.int64)
            joined = _ragged_join(flat.filter(pa.array(keep)), kept_counts, delim)
            null_out = text_null | (kept_counts == 0)
            out_text = pc.if_else(pa.array(null_out),
                                  pa.nulls(n, pa.string()), joined)
            n_removed = np.bincount(parent[is_b], minlength=n).astype(np.int64)
            return pa.table({id_col: _col(t, id_col), text_col: out_text,
                             "n_removed": pa.array(n_removed)})

        return ds.map_batches(strip_batch, batch_format="pyarrow")

    # join tier: every segment row survives a LEFT join against the key set,
    # flagged, then reassembles per doc inside its hash bucket
    def explode_full(t: pa.Table) -> pa.Table:
        from ..pairs import stable_hash

        flat, parent, key, maskable, text_null, counts = _segment_batch(
            t, text_col, host_col, delim)
        ids = _col(t, id_col).take(pa.array(parent, pa.int64()))
        ln = (np.arange(len(parent), dtype=np.int64) -
              np.repeat(np.cumsum(counts) - counts, counts)) if len(parent) else np.zeros(0, np.int64)
        # non-maskable rows get a per-row filler key: never a systematic
        # match, and (unlike a constant) spreads them across join buckets
        # instead of piling every whitespace segment into one hot group
        id_h = stable_hash(ids.to_numpy(zero_copy_only=False)) if len(parent) \
            else np.zeros(0, np.uint64)
        filler = _mix_u64(id_h, ln.astype(np.uint64))
        return pa.table({
            id_col: ids,
            "__ln": pa.array(ln),
            "__seg": flat,
            "bkey": pa.array(np.where(maskable, key, filler), pa.uint64()),
            "__maskable": pa.array(maskable),
            "__src_null": pa.array(text_null[parent] if len(parent) else
                                   np.zeros(0, bool)),
        })

    exploded = ds.select_columns(
        list(dict.fromkeys([id_col, text_col, host_col]))).map_batches(
        explode_full, batch_format="pyarrow")
    marked = keys_ds.map_batches(
        lambda t: t.append_column("__isb", pa.array(np.ones(t.num_rows, bool))),
        batch_format="pyarrow")
    flagged = hash_join(exploded, marked, on="bkey", how="left", num_buckets=B)

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        from ..pairs import stable_hash

        h = stable_hash(_col(t, id_col).to_numpy(zero_copy_only=False))
        return t.append_column("__dbkt", pa.array(
            (h % np.uint64(B)).astype(np.int64)))

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 text_col: pd.Series([], dtype=object),
                                 "n_removed": pd.Series([], dtype=np.int64)})
        df = df.sort_values([id_col, "__ln"], kind="mergesort")
        codes, uniq = pd.factorize(df[id_col].to_numpy())
        isb = df["__isb"].to_numpy()
        rm = (np.where(pd.isna(isb), False, isb).astype(bool) &
              df["__maskable"].to_numpy(bool))
        n_docs = len(uniq)
        n_removed = np.bincount(codes, weights=rm, minlength=n_docs).astype(np.int64)
        keep = ~rm
        kept_counts = np.bincount(codes[keep], minlength=n_docs).astype(np.int64)
        joined = _ragged_join(
            pa.array(df["__seg"].to_numpy()[keep], pa.string()), kept_counts, delim)
        firsts = np.zeros(n_docs, np.int64)
        counts_all = np.bincount(codes, minlength=n_docs)
        np.cumsum(counts_all[:-1], out=firsts[1:])
        # df is (id, ln)-sorted, so codes are grouped runs: firsts indexes
        # each doc's first row directly
        src_null = df["__src_null"].to_numpy(bool)[firsts]
        null_out = src_null | (kept_counts == 0)
        text = joined.to_pandas()
        text[null_out] = None
        return pd.DataFrame({id_col: uniq, text_col: text.to_numpy(),
                             "n_removed": n_removed})

    return flagged.map_batches(add_doc_bucket, batch_format="pyarrow").groupby(
        "__dbkt").map_groups(assemble, batch_format="pandas")


# ------------------------------------------------------------ source mixing
def mix_sources(ds, source_col: str = "source",
                weights: dict[str, int] | None = None,
                key_col: str = "doc_id", mod: int = 10_000,
                method: str = "stable"):
    """Dataset mixing — downsample sources to target proportions (the
    Pile/DoReMi-style mixture step): given integer ``weights`` ``{source:
    w}``, keep ``~C*w_s`` rows of source ``s`` where ``C = min_s(n_s //
    w_s)`` — the bottleneck source is kept (almost) whole and every other
    source is hash-downsampled toward the target ratio.  Sources absent from
    ``weights`` are dropped.

    ALL rate math is integer (``C = min(n_s // w_s)``, ``thr_s = C * w_s *
    mod // n_s``), so the DuckDB oracle reproduces it bit-exactly; the row
    filter is value-hash-deterministic (``H(key) % mod < thr_s``), stable
    across engines, runs, partitionings and corpus growth.  ``method``:
    ``"stable"`` (fast vectorized u64 hash) or ``"md5"`` (engine-portable,
    equals DuckDB ``md5_number_lower``) — same contract as
    :func:`relational.hash_sample`.

    Scale shape: ONE combiner groupby for per-source counts (O(#sources)
    rows reach the driver), thresholds ship in the task closure (tiny dict),
    then one vectorized filter pass — no shuffle of the corpus itself.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {source: int_weight} dict")
    if any(int(w) < 1 for w in weights.values()):
        raise ValueError(f"weights must be >= 1 integers, got {weights}")
    from ..relational import grouped_sum

    counts = grouped_sum(ds.select_columns([source_col]), [source_col], {},
                         count_col="__n").to_pandas()
    n_by_src = {r[source_col]: int(r["__n"]) for _, r in counts.iterrows()
                if r[source_col] in weights}
    if not n_by_src:
        # no weighted source present: empty result, schema preserved
        return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    C = min(n // int(weights[s]) for s, n in n_by_src.items())
    thr = {s: (C * int(weights[s]) * mod) // n for s, n in n_by_src.items()}

    def flt(t: pa.Table) -> pa.Table:
        keys = pc.cast(_col(t, key_col), pa.string()).to_numpy(
            zero_copy_only=False)
        if method == "md5":
            md5 = hashlib.md5
            h = np.fromiter(
                (int.from_bytes(md5(str(v).encode()).digest()[8:], "little")
                 % mod for v in keys),
                dtype=np.int64, count=len(keys))
        else:
            from ..pairs import stable_hash

            h = (stable_hash(keys) % np.uint64(mod)).astype(np.int64)
        t_s = pd.Series(_col(t, source_col).to_numpy(zero_copy_only=False))
        t_thr = t_s.map(thr).fillna(0).to_numpy(np.int64)
        return t.filter(pa.array(h < t_thr))

    return ds.map_batches(flt, batch_format="pyarrow")


def c4_line_rules(ds, text_col: str = "text", min_line_words: int = 5,
                  min_sentences: int = 3):
    """C4 line-level cleaning heuristics (Raffel et al. 2020, §2.2 — the
    rules that built the Colossal Clean Crawled Corpus), as a deterministic,
    SQL-reproducible gate.  Per '\\n'-split line, a line is RETAINED iff:

    - its space/tab-rstripped form ends in terminal punctuation
      (``.``, ``!``, ``?`` or ``"``);
    - it has >= ``min_line_words`` whitespace tokens;
    - it does not contain ``javascript`` (case-insensitive).

    ``c4_text`` is the retained lines joined with '\\n' ('' when none
    survive; NULL input text counts as '').  The page-level gate
    ``c4_pass`` is:

    - ``kept_lines`` >= 1;
    - ``n_sentences`` >= ``min_sentences``, where the sentence proxy is the
      count of ``.``/``!``/``?`` characters in ``c4_text`` (C4 used a real
      sentence splitter; a character count is the deterministic stand-in
      both engines reproduce bit-exactly);
    - ``lower(c4_text)`` does not contain ``lorem ipsum``;
    - ``c4_text`` does not contain ``{`` (the code/markup tell).

    Appends ``c4_text`` (string), ``kept_lines`` (int64), ``n_sentences``
    (int64), ``c4_pass`` (bool).  One zero-copy Arrow pass per batch — line
    work is vectorized over the flattened list children; stateless,
    shuffle-free, so it composes into any funnel position.
    """

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
        lines = pc.split_pattern(s, "\n")
        lparents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        lflat = pc.list_flatten(lines)
        rt = pc.utf8_rtrim(lflat, characters=" \t")
        term = pc.match_substring_regex(rt, '[.!?"]$')
        words = pc.count_substring_regex(lflat, r"\S+")
        js = pc.match_substring_regex(lflat, "(?i)javascript")
        keep = (term.to_numpy(zero_copy_only=False)
                & (words.to_numpy(zero_copy_only=False) >= min_line_words)
                & ~js.to_numpy(zero_copy_only=False))
        kept = np.bincount(lparents[keep], minlength=n).astype(np.int64)
        c4_text = _ragged_join(lflat.filter(pa.array(keep)), kept, "\n")
        n_sent = (pc.count_substring(c4_text, ".").to_numpy(zero_copy_only=False)
                  + pc.count_substring(c4_text, "!").to_numpy(zero_copy_only=False)
                  + pc.count_substring(c4_text, "?").to_numpy(zero_copy_only=False)
                  ).astype(np.int64)
        lorem = pc.match_substring(pc.utf8_lower(c4_text), "lorem ipsum")
        brace = pc.match_substring(c4_text, "{")
        ok = ((kept >= 1) & (n_sent >= min_sentences)
              & ~lorem.to_numpy(zero_copy_only=False)
              & ~brace.to_numpy(zero_copy_only=False))
        out = t
        for name, col in [("c4_text", c4_text),
                          ("kept_lines", pa.array(kept, pa.int64())),
                          ("n_sentences", pa.array(n_sent, pa.int64())),
                          ("c4_pass", pa.array(ok))]:
            out = out.append_column(name, col)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_lines(ds, text_col: str = "text", out_col: str = "dedup_text"):
    """Within-document exact duplicate-line removal (the within-page form of
    RefinedWeb/CCNet line dedup): keep the FIRST occurrence of each exact
    line in each document, preserving line order; later repeats are dropped.
    NULL text counts as ''.  Appends ``out_col`` (the deduplicated text) and
    ``lines_removed`` (int64).

    Scale shape: per-document work only — a stateless ``map_batches`` pass
    with NO shuffle.  Duplicate detection is one hash-based vectorized
    ``duplicated`` over the batch's flattened (doc, line) children; the text
    is reassembled with a single Arrow ``binary_join`` kernel.
    """

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
        lines = pc.split_pattern(s, "\n")
        lparents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        lflat = pc.list_flatten(lines)
        n_lines = np.bincount(lparents, minlength=n).astype(np.int64)
        first = ~pd.DataFrame(
            {"p": lparents, "l": lflat.to_pandas()}
        ).duplicated().to_numpy()
        kept = np.bincount(lparents[first], minlength=n).astype(np.int64)
        deduped = _ragged_join(lflat.filter(pa.array(first)), kept, "\n")
        return (t.append_column(out_col, deduped)
                .append_column("lines_removed",
                               pa.array(n_lines - kept, pa.int64())))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Content-defined chunking (FastCDC-shaped Gear rolling hash)
# ---------------------------------------------------------------------------

_GEAR_TABLE: np.ndarray | None = None


def _gear_table() -> np.ndarray:
    """256 fixed random uint64 gear values (deterministic seed) — the Gear
    hash lookup table (Xia et al., FastCDC, USENIX ATC 2016; algorithmic
    idea only).  Built once per process."""
    global _GEAR_TABLE
    if _GEAR_TABLE is None:
        rng = np.random.default_rng(0x9E3779B97F4A7C15)
        # full-range values: low bits must be uniform or the boundary test
        # (h & mask == 0) degenerates (e.g. all-odd gears make h always odd)
        _GEAR_TABLE = rng.integers(0, 2**64, size=256, dtype=np.uint64,
                                   endpoint=False)
    return _GEAR_TABLE


def _gear_hashes(gvals: np.ndarray) -> np.ndarray:
    """Rolling Gear hash h[i] = (h[i-1] << 1) + gear[b[i]] over a gear-mapped
    byte array — vectorized as the closed form h[i] = sum_{k<64}
    gear[b[i-k]] << k (older terms overflow out of uint64), i.e. 64 shifted
    vector adds instead of a per-byte Python loop."""
    n = len(gvals)
    h = np.zeros(n, dtype=np.uint64)
    for k in range(64):
        if k >= n:
            break
        term = gvals[: n - k] << np.uint64(k)
        h[k:] += term
    return h


def cdc_chunk(ds, text_col: str = "text", id_col: str = "doc_id",
              avg_size: int = 256, min_size: int | None = None,
              max_size: int | None = None):
    """Content-defined chunking: split each document's UTF-8 bytes at Gear
    rolling-hash boundaries (``h & (avg_size-1) == 0``) with FastCDC-style
    min/max bounds — the storage-dedup primitive whose boundaries survive
    byte insertions (unlike fixed-size ``chunk_text``, where one inserted
    byte shifts every later chunk).

    Emits one row per chunk: ``(id, chunk_idx, start, length, chunk_hash)``
    with ``chunk_hash`` a uint64 content hash — ready for an exact-dedup
    groupby to measure cross-corpus redundancy at sub-document granularity.

    Scale shape: pure per-batch map (NO shuffle).  Within a batch all docs'
    gear-mapped bytes are flattened with 63-zero-gear gaps so ONE 64-pass
    vectorized sweep computes every rolling hash; only the sparse boundary
    candidates (one per ~avg_size bytes) are walked in Python to enforce
    min/max.  ``avg_size`` must be a power of two.
    """
    import pandas as pd

    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    min_size = max(1, avg_size // 4) if min_size is None else min_size
    max_size = avg_size * 4 if max_size is None else max_size
    if not (1 <= min_size <= avg_size <= max_size):
        raise ValueError("need 1 <= min_size <= avg_size <= max_size")
    mask = np.uint64(avg_size - 1)
    gear = _gear_table()
    gap = 63

    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "chunk_idx": pa.array([], pa.int64()),
        "start": pa.array([], pa.int64()),
        "length": pa.array([], pa.int64()),
        "chunk_hash": pa.array([], pa.uint64()),
    })

    def fn(t: pa.Table) -> pa.Table:
        ids = _col(t, id_col)
        txt = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
        raw = [s.encode("utf-8") for s in txt.to_pylist()]
        lens = np.fromiter((len(b) for b in raw), np.int64, len(raw))
        if lens.sum() == 0:
            return empty
        # flatten with zero-gear gaps: no cross-document hash contamination
        total = int(lens.sum()) + gap * len(raw)
        gvals = np.zeros(total, dtype=np.uint64)
        doc_off = np.zeros(len(raw), dtype=np.int64)
        pos = 0
        for i, b in enumerate(raw):
            doc_off[i] = pos
            if b:
                gvals[pos:pos + len(b)] = gear[np.frombuffer(b, np.uint8)]
            pos += len(b) + gap
        h = _gear_hashes(gvals)
        is_cand = (h & mask) == np.uint64(0)

        out_id, out_start, out_len, out_bytes = [], [], [], []
        for i, b in enumerate(raw):
            n = lens[i]
            if n == 0:
                continue
            # candidate CUT positions (chunk ends, exclusive) local to doc
            cand = np.flatnonzero(
                is_cand[doc_off[i]:doc_off[i] + n]) + 1
            pos_l = 0
            while pos_l < n:
                lo, hi = pos_l + min_size, pos_l + max_size
                j = np.searchsorted(cand, lo, side="left")
                nxt = int(cand[j]) if j < len(cand) and cand[j] <= hi else hi
                nxt = min(nxt, n)
                if n - nxt < min_size:   # don't strand a sub-min tail
                    nxt = n
                out_id.append(i)
                out_start.append(pos_l)
                out_len.append(nxt - pos_l)
                out_bytes.append(b[pos_l:nxt])
                pos_l = nxt
        if not out_id:
            return empty
        idx = np.asarray(out_id, np.int64)
        starts = np.asarray(out_start, np.int64)
        chunk_idx = np.arange(len(idx), dtype=np.int64)
        first = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        chunk_idx = chunk_idx - np.repeat(chunk_idx[first],
                                          np.diff(np.r_[first, len(idx)]))
        # latin-1 round-trips arbitrary bytes to str: the str path of
        # hash_array is keyed siphash (deterministic across workers), while
        # raw bytes objects can fall back to the salted builtin hash()
        hashes = pd.util.hash_array(
            np.array([b.decode("latin-1") for b in out_bytes],
                     dtype=object)).astype(np.uint64)
        return pa.table({
            id_col: pc.cast(ids, pa.int64()).take(pa.array(idx, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "start": pa.array(starts, pa.int64()),
            "length": pa.array(np.asarray(out_len, np.int64), pa.int64()),
            "chunk_hash": pa.array(hashes, pa.uint64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def cdc_dedup_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                    avg_size: int = 256, **kw):
    """Corpus-level CDC storage-dedup summary: total chunks/bytes vs
    distinct chunks/bytes (one combiner-shaped shuffle over chunk_hash) —
    the 'how much would content-addressed storage save' number."""
    from ..relational import grouped_sum

    chunks = cdc_chunk(ds, text_col, id_col, avg_size=avg_size, **kw)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"chunk_hash": t["chunk_hash"],
                         "length": t["length"],
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    per_hash = grouped_sum(
        chunks.map_batches(partial, batch_format="pyarrow"),
        ["chunk_hash"], {"length": "tot_bytes", "n": "n"})

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        tot = t["tot_bytes"].to_numpy(zero_copy_only=False)
        uniq_bytes = tot / np.maximum(n, 1)  # all copies of a hash same len
        return pa.table({
            "total_chunks": pa.array([int(n.sum())], pa.int64()),
            "distinct_chunks": pa.array([t.num_rows], pa.int64()),
            "total_bytes": pa.array([int(tot.sum())], pa.int64()),
            "distinct_bytes": pa.array([int(uniq_bytes.sum())], pa.int64()),
        })

    # per-block partials then one tiny driver-side reduce
    parts = per_hash.map_batches(finish, batch_format="pyarrow").to_pandas()
    import pandas as pd

    if len(parts) == 0:
        return pd.DataFrame({"total_chunks": [0], "distinct_chunks": [0],
                             "total_bytes": [0], "distinct_bytes": [0],
                             "dedup_ratio": [1.0]})
    agg = parts.sum().to_frame().T
    agg["dedup_ratio"] = round(
        float(agg["total_bytes"].iloc[0])
        / max(float(agg["distinct_bytes"].iloc[0]), 1.0), 6)
    return agg.reset_index(drop=True)


def fuzzy_decontaminate(train_ds, eval_ds, text_col: str = "text",
                        id_col: str = "doc_id", shingle: str = "word",
                        k: int = 3, num_perm: int = 128,
                        bands: int | None = None, threshold: float = 0.7,
                        eval_budget_rows: int = 1_000_000):
    """Fuzzy benchmark decontamination: MinHash+LSH NEAR-duplicate matches
    between training documents and the evaluation set — catches the
    paraphrased / lightly-edited leakage the exact n-gram rule
    (:func:`ngram_decontaminate`) misses (the Llama/RefinedWeb-style fuzzy
    train–test overlap pass).

    Returns ``(doc_id, eval_id, jac)`` — one row per (train doc, eval doc)
    pair whose exact shingle Jaccard >= ``threshold``, candidates generated
    by shared LSH band keys (``bands=None`` picks the S-curve-optimal band
    count for ``threshold`` via :func:`~.dedup.lsh_plan`).

    Scale shape: mirrors ``ngram_decontaminate`` — the eval side is
    benchmark-sized BY DEFINITION (enforced: > ``eval_budget_rows`` raises,
    pointing at per-shard runs), so its band keys AND hashed shingle sets
    are built once and broadcast via ``ray.put``; the training pass is one
    streaming ``map_batches`` per batch doing a sorted-array band-key probe
    (searchsorted, no Python dict) and exact verify only on the (rare)
    LSH-colliding candidates.  NO shuffle, nothing corpus-sized anywhere.
    """
    import ray

    from .dedup import (_get_broadcast, _hash_tokens, band_keys,
                        batch_minhash_signatures, char_ngram_hashes,
                        lsh_plan, word_shingles)

    if bands is None:
        bands, _ = lsh_plan(threshold, num_perm)
    golden = np.uint64(0x9E3779B97F4A7C15)

    def _shingle_set(text: str) -> np.ndarray:
        if shingle == "word":
            return np.unique(_hash_tokens(word_shingles(text or "", k)))
        return np.unique(char_ngram_hashes(text or "", k))

    def _band_codes(keys: np.ndarray) -> np.ndarray:
        # (n, bands) int64 band keys -> uint64 codes mixing in the band idx
        b = np.arange(keys.shape[1], dtype=np.uint64) * golden
        return keys.astype(np.uint64) + b[None, :]

    eval_tbl = eval_ds.select_columns([id_col, text_col]).to_pandas()
    if len(eval_tbl) > eval_budget_rows:
        raise ValueError(
            f"eval side has {len(eval_tbl)} rows > budget {eval_budget_rows}"
            " — fuzzy_decontaminate broadcasts the eval side (benchmark-"
            "sized by definition); run per eval shard for larger sets")
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "eval_id": pa.array([], pa.int64()),
                      "jac": pa.array([], pa.float64())})
    if len(eval_tbl) == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    etexts = eval_tbl[text_col].fillna("").tolist()
    esigs = batch_minhash_signatures(etexts, shingle, k, num_perm)
    ecodes = _band_codes(band_keys(esigs, bands)).ravel()
    erows = np.repeat(np.arange(len(eval_tbl), dtype=np.int64), bands)
    order = np.argsort(ecodes, kind="stable")
    ecodes, erows = ecodes[order], erows[order]
    esets = [_shingle_set(s) for s in etexts]
    eids = eval_tbl[id_col].to_numpy()
    ref = ray.put((ecodes, erows, eids, esets))

    def probe(t: pa.Table) -> pa.Table:
        codes_s, rows_s, ids_e, sets_e = _get_broadcast(ref)
        texts = [s or "" for s in
                 pc.cast(_col(t, text_col), pa.string()).to_pylist()]
        if not texts:
            return empty
        sigs = batch_minhash_signatures(texts, shingle, k, num_perm)
        pcode = _band_codes(band_keys(sigs, bands))      # (n, bands)
        flat = pcode.ravel()
        trow = np.repeat(np.arange(len(texts), dtype=np.int64), bands)
        lo = np.searchsorted(codes_s, flat, side="left")
        hi = np.searchsorted(codes_s, flat, side="right")
        hit = hi > lo
        if not hit.any():
            return empty
        # expand collision ranges -> (train_row, eval_row) candidates
        cand_t, cand_e = [], []
        for f, l, h in zip(trow[hit], lo[hit], hi[hit]):
            cand_t.append(np.full(h - l, f, np.int64))
            cand_e.append(rows_s[l:h])
        ct = np.concatenate(cand_t)
        ce = np.concatenate(cand_e)
        uniq = np.unique(ct * np.int64(len(ids_e)) + ce)
        ct, ce = uniq // len(ids_e), uniq % len(ids_e)
        ids_t = _col(t, id_col).to_numpy(zero_copy_only=False)
        out_t, out_e, out_j = [], [], []
        cache: dict = {}
        for ti, ei in zip(ct, ce):
            a = cache.get(ti)
            if a is None:
                a = _shingle_set(texts[ti])
                cache[ti] = a
            b = sets_e[ei]
            if len(a) == 0 or len(b) == 0:
                continue
            inter = len(np.intersect1d(a, b, assume_unique=True))
            jac = inter / (len(a) + len(b) - inter)
            if jac >= threshold:
                out_t.append(ids_t[ti])
                out_e.append(ids_e[ei])
                out_j.append(jac)
        if not out_t:
            return empty
        return pa.table({id_col: pa.array(np.asarray(out_t, np.int64)),
                         "eval_id": pa.array(np.asarray(out_e, np.int64)),
                         "jac": pa.array(np.asarray(out_j, np.float64))})

    return train_ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow")
