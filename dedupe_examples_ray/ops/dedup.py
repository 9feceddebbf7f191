"""Deduplication family for training-data pipelines (documents table).

Complements the learned-blocking ER pipeline with the standard corpus-dedup
operators, each expressed Ray-Data-first:

- ``exact_dedup``        hash-partition + per-group min (reference A1
                         ``SELECT DISTINCT``, mysql_init_db.py:134-143)
- ``minhash_lsh_dedup``  shingle -> minhash signature -> banded LSH buckets ->
                         candidate pairs -> exact-Jaccard verify -> connected
                         components (public MinHash/LSH construction,
                         Broder 1997 / MMDS ch.3)
- ``simhash_dedup``      64-bit simhash (Charikar 2002) -> band buckets ->
                         hamming verify -> components
- ``ngram_jaccard_dedup``character-ngram shingles through the same
                         minhash/LSH machinery (robust to token reordering)
- ``embedding_cosine_dedup`` random-hyperplane LSH over an embedding column ->
                         within-bucket cosine >= tau -> components

All emit an assignment table ``(doc_id, keep_id)`` where ``keep_id`` is the
cluster minimum (the surviving representative); singletons map to themselves.
The shuffles are: one groupby per band (pre-exploded into a single groupby on
(band, key)), one pair dedup, then the shared connected-components machinery.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..cluster import connected_components
from ..scale import clean_arrow as _clean_arrow, safe_coalesce

# Per-worker cache for broadcast objects: task functions resolve a ray.put
# ref once per worker process instead of paying actor-pool startup (the
# stateful-stage pattern without the actors; worker processes persist).
_BCAST_CACHE: dict = {}


def _get_broadcast(ref):
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            key = ref.hex()
            if key not in _BCAST_CACHE:
                _BCAST_CACHE[key] = ray.get(ref)
            return _BCAST_CACHE[key]
    except ImportError:
        pass
    return ref


# --------------------------------------------------------------- exact dedup
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int | None = None):
    """(doc_id, keep_id): keep the min id per exact content hash."""
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def add_hash(t: pa.Table) -> pa.Table:
        # one vectorized 64-bit content hash call over the whole batch
        texts = np.asarray(t[text_col].to_pylist(), dtype=object)
        if len(texts):
            texts = np.where(pd.isna(texts), "", texts)
        hs = (pd.util.hash_array(texts).astype(np.uint64) >> np.uint64(1)).astype(np.int64)
        return pa.table({id_col: t[id_col], "h": pa.array(hs, pa.int64())})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # bucketed: group by h%B (B groups), per-hash min via vectorized transform
    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        b = t["h"].to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    def assign(df: pd.DataFrame) -> pa.Table:
        return _clean_arrow(pd.DataFrame(
            {id_col: df[id_col], "keep_id": df.groupby("h", sort=False)[id_col].transform("min")}
        ))

    return hashed.map_batches(add_bucket, batch_format="pyarrow").groupby("bucket").map_groups(
        assign, batch_format="pandas"
    )


def normalized_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                     keep: str = "longest", num_buckets: int | None = None):
    """Canonical-version selection: dedup on a *normalized* content key
    (lowercased, leading/trailing whitespace trimmed, internal whitespace
    runs collapsed to one space) and keep ONE original row per key by
    policy — ``keep="longest"`` retains the longest original text (tie →
    min id; the common webtext policy: formatting variants collapse and the
    most complete version survives), ``keep="first"`` retains the min id.

    Distribution mirrors ``exact_dedup``: the Arrow batch kernel hashes the
    normalized key to 63 bits so only ``(id, key hash, original length)``
    travel through one bucketed shuffle — never the normalized strings.

    Returns survivors only: ``(id_col, n_dups)`` where ``n_dups`` is the
    key's group size (1 = the row was unique).
    """
    from ..scale import resolve_buckets

    if keep not in ("longest", "first"):
        raise ValueError(f"keep must be 'longest' or 'first', got {keep!r}")
    num_buckets = resolve_buckets(num_buckets, ds)

    def add_key(t: pa.Table) -> pa.Table:
        s = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        ln = pc.utf8_length(s)
        # trim only ' ' (every run of RE2 \s is already one space) so the
        # kernel matches SQL trim() exactly — utf8_trim_whitespace would
        # also strip non-ASCII whitespace that \s+ left alone
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(s), r"\s+", " "), " "
        )
        texts = np.asarray(norm.to_pylist(), dtype=object)
        hs = (pd.util.hash_array(texts).astype(np.uint64) >> np.uint64(1)).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "h": pa.array(hs, pa.int64()),
            "len": pc.cast(ln, pa.int64()),
        })

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["h"].to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if keep == "longest":
            df = df.sort_values(["h", "len", id_col], kind="stable",
                                ascending=[True, False, True])
        else:
            df = df.sort_values(["h", id_col], kind="stable")
        g = df.groupby("h", sort=False)
        out = g.head(1).copy()
        out["n_dups"] = g.size().to_numpy()
        return _clean_arrow(out[[id_col, "n_dups"]])

    return (ds.map_batches(add_key, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(pick, batch_format="pandas"))


# ------------------------------------------------------------------- minhash
# Per-wave budget for the text bytes hydrated onto candidate pairs during the
# exact-Jaccard verify (see minhash_lsh_dedup): the shuffle keeps roughly
# 2-3x this in flight (map outputs + reduce inputs), so 8 GB/wave bounds
# worst-case spill well under a node's free disk.
_VERIFY_WAVE_BYTES = 8 << 30
# corpus size above which the wave verify semi-filters the corpus per wave
# (see the gate comment at the wave loop); tests monkeypatch this to cover
# both branches
_VERIFY_FILTER_MIN_BYTES = 2 << 30
# Bounded-candidate fast path threshold (monkeypatchable in tests)
_SEMI_HYDRATE_MAX = 2_000_000


def _hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Stable 64-bit hashes for a string array (vectorized via pandas)."""
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def _exact_groups(ds, text_col: str, id_col: str, num_buckets: int | None = None):
    """(id, keep_id) per exact text content — the minhash pre-pass variant of
    :func:`exact_dedup` whose NULL handling matches the LSH verify semantics
    exactly: null texts never group with anything (each gets a per-id key),
    while ``""`` texts group together (byte-equal shortcut).  Only
    (id, 64-bit key) travel through one bucketed shuffle."""
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def add_key(t: pa.Table) -> pa.Table:
        s = t[text_col]
        null = pc.is_null(s).to_numpy(zero_copy_only=False)
        texts = np.asarray(pc.fill_null(pc.cast(s, pa.string()), "").to_pylist(),
                           dtype=object)
        hs = (pd.util.hash_array(texts).astype(np.uint64) >> np.uint64(2))
        if null.any():
            ids = np.asarray(t[id_col].to_pylist(), dtype=object)
            idh = pd.util.hash_array(ids).astype(np.uint64) >> np.uint64(2)
            # tag bit keeps per-id null keys disjoint from content keys
            hs = np.where(null, idh | np.uint64(1 << 62), hs)
        b = hs % np.uint64(num_buckets)
        return pa.table({
            id_col: t[id_col],
            "h": pa.array(hs.astype(np.int64), pa.int64()),
            "bucket": pa.array(b.astype(np.int64), pa.int64()),
        })

    def assign(df: pd.DataFrame) -> pa.Table:
        return _clean_arrow(pd.DataFrame({
            id_col: df[id_col],
            "keep_id": df.groupby("h", sort=False)[id_col].transform("min"),
        }))

    return (ds.map_batches(add_key, batch_format="pyarrow")
            .groupby("bucket").map_groups(assign, batch_format="pandas"))


def minhash_signature(token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhashes via the multiply-add permutation family
    ``h_i(x) = a_i*x + b_i (mod 2^64)`` with ODD ``a_i`` — a bijection on
    uint64, so each h_i is a genuine permutation of the hash space and the
    min is a valid minhash.  No modulo: u64 wraparound is the mod, which is
    ~6x faster than the prime-field reduction it replaces (``%`` on u64
    arrays is a hardware division per element)."""
    if len(token_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = token_hashes.astype(np.uint64)[None, :]
    hv = a[:, None] * x + b[:, None]
    return hv.min(axis=1)


def _perm_params(num_perm: int, seed: int = 11) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    a |= np.uint64(1)  # odd multiplier -> bijective permutation of u64
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    return a, b


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    toks = (text or "").lower().split()
    if len(toks) < k:
        return np.array([" ".join(toks)] if toks else [], dtype=object)
    return np.array([" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)], dtype=object)


def char_ngrams(text: str, n: int = 5) -> np.ndarray:
    s = " ".join((text or "").lower().split())
    if len(s) < n:
        return np.array([s] if s else [], dtype=object)
    return np.array([s[i : i + n] for i in range(len(s) - n + 1)], dtype=object)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (decorrelates rolling-hash windows)."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def char_ngram_hashes(text: str, n: int = 5) -> np.ndarray:
    """uint64 hashes of a doc's char n-grams WITHOUT materializing shingle
    strings: normalized bytes -> sliding windows -> polynomial hash (base 257,
    wrapping mod 2^64) -> splitmix64 mix.  The multiset equals
    ``hash(char_ngrams(text, n))`` up to hash choice — the minhash/Jaccard
    stages only consume hashes, so the 10M-tiny-strings detour is pure waste.
    """
    s = " ".join((text or "").lower().split()).encode("utf-8", "surrogatepass")
    a = np.frombuffer(s, dtype=np.uint8)
    if len(a) == 0:
        return np.empty(0, dtype=np.uint64)
    w = min(n, len(a))
    win = np.lib.stride_tricks.sliding_window_view(a, w).astype(np.uint64)
    pw = np.power(np.uint64(257), np.arange(w - 1, -1, -1, dtype=np.uint64))
    return _mix64((win * pw).sum(axis=1, dtype=np.uint64))


_PERM_CACHE: dict = {}


def batch_minhash_signatures(texts: list, shingle: str, k: int, num_perm: int) -> np.ndarray:
    """(n_docs, num_perm) minhash signature matrix, computed batched.

    Shingling stays per-doc Python (string work), but token hashing and the
    universal-hash min-reduction run over the whole batch's concatenated
    token-hash array — one vectorized pass, internally chunked so the
    (num_perm x tokens) temp stays cache/heap-bounded.  Empty docs get the
    max-sentinel signature (same as ``minhash_signature`` on empty input).
    """
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    n = len(texts)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return sigs
    if shingle == "char":
        # fully numeric path: no shingle strings ever built
        toks_h = [char_ngram_hashes(tx, k) for tx in texts]
        counts = np.array([len(x) for x in toks_h], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return sigs
        all_hashes = np.concatenate([x for x in toks_h if len(x)])
    else:
        toks = [word_shingles(tx, k) for tx in texts]
        counts = np.array([len(x) for x in toks], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return sigs
        all_hashes = _hash_tokens(np.concatenate([x for x in toks if len(x)]))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    # tokens per vectorized slab: the (num_perm x CHUNK) u64 temp must fit L3
    # (128 x 16384 x 8 B = 16 MB); a 64k slab = 67 MB measured 17x slower
    # from DRAM thrash
    CHUNK = 1 << 14
    doc = 0
    while doc < n:
        end = doc
        tok_count = 0
        while end < n and (tok_count == 0 or tok_count + counts[end] <= CHUNK):
            tok_count += int(counts[end])
            end += 1
        if tok_count > 0:
            x = all_hashes[offsets[doc] : offsets[end]]
            hv = a[:, None] * x[None, :] + b[:, None]  # (P, toks) mod 2^64 — same permutation family as minhash_signature
            nonempty = np.flatnonzero(counts[doc:end]) + doc
            starts = (offsets[nonempty] - offsets[doc]).astype(np.int64)
            mins = np.minimum.reduceat(hv, starts, axis=1)  # (P, n_nonempty)
            sigs[nonempty, :] = mins.T
        doc = end
    return sigs


def lsh_plan(threshold: float, num_perm: int = 128,
             fp_weight: float = 0.5, fn_weight: float = 0.5,
             grid: int = 1000) -> tuple[int, int]:
    """Choose the (bands, rows_per_band) MinHash-LSH parameters for a target
    Jaccard ``threshold``: minimize the weighted integral of false-positive
    area (candidate probability :math:`1-(1-s^r)^b` below the threshold) plus
    false-negative area (miss probability above it) over all factorizations
    ``b*r <= num_perm`` — the standard S-curve optimization (Leskovec,
    Rajaraman & Ullman, *Mining of Massive Datasets* §3.4; the same rule
    datasketch's public LSH uses).  Returns ``(bands, rows_per_band)``;
    feed ``bands`` (with the same ``num_perm``) to :func:`minhash_lsh_dedup`.

    Driver-side analytic helper — trapezoidal integration on a ``grid``-point
    similarity mesh, no data touched.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_perm < 2:
        raise ValueError(f"num_perm must be >= 2, got {num_perm}")
    s = np.linspace(0.0, 1.0, grid + 1)
    below = s < threshold
    best, best_err = (1, 1), np.inf
    for r in range(1, num_perm + 1):
        for b in range(1, num_perm // r + 1):
            p = 1.0 - (1.0 - s**r) ** b
            fp = np.trapz(p[below], s[below])
            fn = np.trapz(1.0 - p[~below], s[~below])
            err = fp_weight * fp + fn_weight * fn
            if err < best_err:
                best, best_err = (b, r), err
    return best


def band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 bucket keys — vectorized FNV-1a mix over each
    band's signature slots (replaces per-(doc, band) hashlib digests)."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    chunks = sigs[:, : bands * r].reshape(n, bands, r)
    key = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    for j in range(r):
        key = (key ^ chunks[:, :, j]) * np.uint64(0x100000001B3)
    return (key >> np.uint64(1)).astype(np.int64)


def _minhash_bands_batch(t: pa.Table, id_col, text_col, shingle, k, num_perm, bands) -> pa.Table:
    """Task stage: doc -> (key, doc_id) LSH bucket rows (batched).

    The band index is PACKED into the 64-bit key (golden-ratio mix) instead
    of riding as its own column: the (band, key) pair is only ever used as
    an opaque bucket identity, and dropping the int32 column cuts the
    ~200M-row band shuffle's bytes by 20% at soak scale.  Cross-band key
    collisions (~rows^2/2^63) merge two buckets — extra candidate pairs the
    verify rejects, the same collision class the key hash already carries.
    """
    ids = np.asarray(t[id_col].to_pylist(), dtype=object)
    texts = t[text_col].to_pylist()
    n = len(ids)
    sigs = batch_minhash_signatures(texts, shingle, k, num_perm)
    keys = band_keys(sigs, bands).astype(np.uint64)
    band_mix = (
        np.arange(bands, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    packed = (keys + band_mix[None, :]).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, bands), t[id_col].type),
            "key": pa.array(packed.ravel(), pa.int64()),
        }
    )


def _bucket_pairs(bucket_ds, id_col: str, max_bucket: int = 200,
                  num_buckets: int | None = None):
    """LSH buckets -> unique candidate (id_a, id_b) pairs.

    Bucketed shuffle (hash(band,key) % B -> B groups) with a vectorized
    pandas loop over the LSH buckets inside each group — never one Python
    dispatch per LSH bucket.  Hot LSH buckets (boilerplate-heavy corpora) are
    *salted* into deterministic sub-buckets exactly like the ER pair path
    (pairs._emit_bucket) — bounded recall loss, never a silent truncation;
    ``lsh_bucket_metrics`` reports the emitted/dropped estimate.
    """
    from ..pairs import dedup_pairs, stable_hash
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, bucket_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if "band" in t.column_names:  # legacy two-column bucket identity
            h = h + t["band"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h = h % num_buckets
        return t.append_column("bucket", pa.array(h.astype(np.int64), pa.int64()))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        group_cols = ["band", "key"] if "band" in df.columns else ["key"]
        frames = []
        for _, sub in df.groupby(group_cols, sort=False):
            ids = np.sort(sub[id_col].unique())
            n = len(ids)
            if n < 2:
                continue
            if n > max_bucket:  # salt the hot bucket into sub-buckets
                k = -(-n // max_bucket)
                salt = stable_hash(ids) % k
                for sv in range(k):
                    chunk = ids[salt == sv]  # ascending -> id_a < id_b holds
                    if len(chunk) < 2:
                        continue
                    ia, ib = np.triu_indices(len(chunk), k=1)
                    frames.append(pd.DataFrame({"id_a": chunk[ia], "id_b": chunk[ib]}))
                continue
            ia, ib = np.triu_indices(n, k=1)
            frames.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        if not frames:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=df[id_col].dtype), "id_b": pd.Series([], dtype=df[id_col].dtype)}
            )
        return pd.concat(frames, ignore_index=True)

    pairs = (
        bucket_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: _clean_arrow(emit(df)), batch_format="pandas")
    )
    return dedup_pairs(pairs)


def lsh_bucket_metrics(bucket_ds, id_col: str, max_bucket: int = 200,
                      num_buckets: int | None = None) -> dict:
    """Emitted/dropped candidate estimates for the LSH bucket pair emission —
    the dedup-family analog of ``pairs.pair_metrics`` (no silent caps)."""
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, bucket_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cols = {"key": t["key"], id_col: t[id_col]}
        if "band" in t.column_names:
            h = h + t["band"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            cols["band"] = t["band"]
        h = h % num_buckets
        cols["bucket"] = pa.array(h.astype(np.int64), pa.int64())
        return pa.table(cols)

    def sizes(df: pd.DataFrame) -> pa.Table:
        gcols = ["band", "key"] if "band" in df.columns else ["key"]
        u = df.drop_duplicates(subset=gcols + [id_col])
        return _clean_arrow(
            u.groupby(gcols, sort=False).size().rename("n").reset_index()[["n"]]
        )

    from ..pairs import _even_split

    tbl = (
        bucket_ds
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sizes, batch_format="pandas")
        .to_pandas()
    )
    n = tbl["n"].to_numpy(dtype=np.int64)
    full = n * (n - 1) // 2
    salted = 0
    for sz in n[n > max_bucket]:
        parts = _even_split(int(sz), -(-int(sz) // max_bucket))
        salted += int((parts * (parts - 1) // 2).sum())
    emitted = int(full[n <= max_bucket].sum()) + salted
    return {
        "lsh_buckets": int(len(n)),
        "buckets_over_cap": int((n > max_bucket).sum()),
        "pairs_full": int(full.sum()),
        "pairs_emitted_est": emitted,
        "pairs_dropped_est": int(full.sum()) - emitted,
    }


def _jaccard_verify_hydrated(t: pa.Table, shingle, k, threshold) -> pa.Table:
    """Bounded-path verify: text_a/text_b hydrated by semi_hydrate, exact
    shingle-set Jaccard with per-batch memoized shingling.  Kept for the
    <=_SEMI_HYDRATE_MAX candidate regime where ONE hydration pull beats the
    sig pipeline's extra jobs (bench: 2.7 vs 3.4 s at 5k docs); the
    cogroup/wave regimes use the signature kernel instead."""
    cache: dict = {}

    def sh(text) -> np.ndarray:
        s = cache.get(text)
        if s is None:
            if shingle == "char":
                h = char_ngram_hashes(text or "", k)
            else:
                h = _hash_tokens(word_shingles(text or "", k))
            s = np.unique(h)  # sorted unique
            cache[text] = s
        return s

    out = np.empty(t.num_rows, dtype=np.float64)
    for i, (ta, tb) in enumerate(zip(t["text_a"].to_pylist(), t["text_b"].to_pylist())):
        if ta is not None and ta == tb:
            out[i] = 1.0
            continue
        sa, sb = sh(ta), sh(tb)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        out[i] = inter / (len(sa) + len(sb) - inter) if inter else 0.0
    score = pa.array(out, pa.float64())
    keep = pc.greater_equal(score, threshold)
    return pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "score": score}).filter(keep)


def _shingle_sig_batch(t: pa.Table, id_col, text_col, shingle, k,
                       bits: int = 32) -> pa.Table:
    """Per-DOC verify signatures: sorted-unique shingle hashes (u32 by
    default — per-pair collision inflation ~|sig|^2/2^32, upward-only and
    far inside threshold margins; pass bits=64 for exact-u64 parity) plus a
    u64 full-text hash (null for null text) that preserves the byte-equal
    shortcut exactly.  Computed ONCE per doc — the old verify re-shingled
    each distinct text once per BATCH it appeared in."""
    texts = t[text_col].to_pylist()
    np_t = np.uint32 if bits == 32 else np.uint64
    vals: list[np.ndarray] = []
    offs = np.zeros(len(texts) + 1, np.int64)
    for i, tx in enumerate(texts):
        if shingle == "char":
            h = char_ngram_hashes(tx or "", k)
        else:
            h = _hash_tokens(word_shingles(tx or "", k))
        u = np.unique(h.astype(np.uint64).astype(np_t))
        vals.append(u)
        offs[i + 1] = offs[i] + len(u)
    flat = np.concatenate(vals) if vals else np.zeros(0, np_t)
    sig = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()),
        pa.array(flat, pa.uint32() if bits == 32 else pa.uint64()),
    )
    th = pd.util.hash_array(
        np.asarray(["" if x is None else x for x in texts], dtype=object)
    ).astype(np.int64)
    thash = pa.array(th, pa.int64(), mask=np.array([x is None for x in texts]))
    return pa.table({id_col: t[id_col], "vsig": sig, "thash": thash})


def _jaccard_verify_sig(t: pa.Table, threshold) -> pa.Table:
    """Verify hydrated candidate pairs from per-doc shingle signatures:
    byte-equal texts (non-null thash match) short-circuit to 1.0, otherwise
    exact Jaccard via one sorted searchsorted intersection per pair — no
    shingling, no per-pair sort."""
    from ..distances import list_array_view

    n = t.num_rows
    oa, va, la = list_array_view(t["vsig_a"])
    ob, vb, lb = list_array_view(t["vsig_b"])

    def hvals(col):
        c = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        v = c.to_numpy(zero_copy_only=False)
        ok = c.is_valid().to_numpy(zero_copy_only=False)
        return np.where(ok, v, 0), ok

    ha, oka = hvals("thash_a")
    hb, okb = hvals("thash_b")
    out = np.zeros(n, dtype=np.float64)
    eq = oka & okb & (ha == hb)
    out[eq] = 1.0
    for i in np.nonzero(~eq & (la > 0) & (lb > 0))[0]:
        sa, sb = oa[i], ob[i]
        x = va[sa : sa + la[i]]
        y = vb[sb : sb + lb[i]]
        if len(x) < len(y):
            x, y = y, x
        pos = np.searchsorted(x, y)
        pos[pos == len(x)] = len(x) - 1
        inter = int((x[pos] == y).sum())
        if inter:
            out[i] = inter / (la[i] + lb[i] - inter)
    score = pa.array(out, pa.float64())
    keep = pc.greater_equal(score, threshold)
    return pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "score": score}).filter(keep)


# Above this many clustered nodes the assignment label table stops being
# broadcast (it is O(#clustered docs) — on near-dup-dense web corpora that is
# a large corpus fraction) and routes through the big-big hash_join instead.
ASSIGN_BROADCAST_BUDGET = 2_000_000


def _assignment(ds, id_col: str, edges_ds, broadcast_row_budget: int | None = None):
    """edges -> components -> (doc_id, keep_id) with singleton completion.

    Under ``broadcast_row_budget`` clustered nodes, the label side is
    broadcast as a zero-copy Arrow table and joined per whole block with
    ``pc.index_in`` — no Python dict ships to workers and per-worker memory
    does not scale with actor count (cluster.entity_map_from_table pattern).
    Over the budget (dup-dense corpora where clustered membership is a large
    corpus fraction) it switches to ``relational.hash_join(..., how="left")``
    + coalesce — fully distributed, nothing driver- or worker-resident scales
    with the corpus.  Both paths produce identical assignments
    (tests/test_scale_safety.py parity test)."""
    import ray

    from ..scoring import dataset_arrow_types

    budget = ASSIGN_BROADCAST_BUDGET if broadcast_row_budget is None else broadcast_row_budget
    labels = connected_components(edges_ds).materialize()
    id_type = dataset_arrow_types(ds)[id_col]
    if labels.count() > budget:
        from ..relational import hash_join

        lab = labels.map_batches(
            lambda t: pa.table(
                {"node": pc_cast_arr(t["node"], id_type), "__lab": pc_cast_arr(t["label"], id_type)}
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(ds.select_columns([id_col]), lab, on=id_col, right_on="node", how="left")

        def fin(t: pa.Table) -> pa.Table:
            return pa.table({id_col: t[id_col], "keep_id": safe_coalesce(t["__lab"], t[id_col])})

        return joined.map_batches(fin, batch_format="pyarrow")

    lab_tbls = list(labels.iter_batches(batch_size=None, batch_format="pyarrow"))
    if lab_tbls:
        lab = pa.concat_tables(lab_tbls).combine_chunks()
    else:
        lab = pa.table({"node": pa.nulls(0, id_type), "label": pa.nulls(0, id_type)})
    nodes = pc_cast_arr(lab["node"], id_type)
    labs = pc_cast_arr(lab["label"], id_type)
    ref = ray.put(pa.table({"node": nodes, "label": labs}).combine_chunks())

    def annot(t: pa.Table) -> pa.Table:
        m = _get_broadcast(ref)
        idx = pc.index_in(t[id_col], value_set=m["node"].combine_chunks())
        keep = safe_coalesce(pc.take(m["label"].combine_chunks(), idx), t[id_col])
        return pa.table({id_col: t[id_col], "keep_id": keep})

    return ds.select_columns([id_col]).map_batches(
        annot, batch_format="pyarrow", batch_size=None
    )


def pc_cast_arr(arr, typ):
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return arr if arr.type == typ else pc.cast(arr, typ)


def surrogate_assignment(ds, id_col: str, make_pairs, view_cols: list[str]):
    """Run a pair-producing dedup kernel in int64 surrogate-uid space when the
    id column is a string (URL-keyed corpora), resolving the assignment with
    canon = MIN member ORIGINAL id — output identical to the raw-id path.

    ``make_pairs(work_ds, work_id) -> edges Dataset`` builds the op's
    candidate/verified pairs over ``work_ds`` keyed by ``work_id``.
    ``view_cols``: the columns the kernel reads (id + payload), pruned into
    the materialized uid view.  String ids otherwise ride EVERY band/pair/CC
    shuffle (~50-60 B vs 8 — the 6.26M-page soak ran a node out of spill
    disk on exactly this); surrogate collisions (63-bit) are detected by a
    distinct count and fall back to raw ids.
    """
    from ..scoring import dataset_arrow_types

    try:
        id_t = dataset_arrow_types(ds)[id_col]
        use = pa.types.is_string(id_t) or pa.types.is_large_string(id_t)
    except Exception:
        use = False
    if use:
        from ..cluster import add_uid_column, build_entity_map_uid

        uid_view = (
            ds.select_columns(view_cols)
            .map_batches(add_uid_column, fn_kwargs=dict(id_col=id_col),
                         batch_format="pyarrow")
            .materialize()
        )
        import ray as _ray

        blocks = _ray.get(uid_view.select_columns(["__uid"]).to_arrow_refs())
        uids = np.concatenate(
            [b["__uid"].to_numpy(zero_copy_only=False) for b in blocks if b.num_rows]
        ) if blocks else np.zeros(0, np.int64)
        if len(np.unique(uids)) == len(uids):
            pairs = make_pairs(uid_view, "__uid")
            em = build_entity_map_uid(
                uid_view, id_col, connected_components(pairs).materialize()
            )
            return em.map_batches(
                lambda t, _ty=id_t: pa.table({
                    id_col: pc.cast(t["record_id"], _ty),
                    "keep_id": pc.cast(t["canon_id"], _ty),
                }),
                batch_format="pyarrow",
            )
        import logging

        logging.getLogger("dedupe_examples_ray").warning(
            "surrogate uid collision (n=%d); raw-id dedup path", len(uids)
        )
    return _assignment(ds, id_col, make_pairs(ds, id_col))


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: str = "word",
    k: int = 3,
    num_perm: int = 128,
    bands: int | None = 32,
    threshold: float = 0.5,
    verify: bool = True,
    workdir: str | None = None,
    input_token: str | None = None,
    pre_exact: bool = True,
    _pairs_only: bool = False,
    _use_uids: bool | None = None,
):
    """Near-dup assignment via MinHash+LSH (see module docstring).

    ``bands=32, num_perm=128`` (r=4) targets the classic S-curve with ~0.5
    Jaccard threshold; ``bands=None`` picks the S-curve-optimal band count
    for ``threshold`` via :func:`lsh_plan`.  ``verify=False`` skips the
    exact-Jaccard pass (pure LSH recall, lower precision).

    Scale posture: the exact-Jaccard verify hydrates texts onto the candidate
    pairs via the partition-aligned bucketed cogroup (scoring.bucketed_hydrate)
    — each verify task touches one corpus shard; NOTHING collects the corpus
    to the driver or broadcasts it.
    """
    from ..scale import buckets_for, estimate_rows

    if bands is None:
        bands, _ = lsh_plan(threshold, num_perm)

    # ---- exact-dedup pre-pass: collapse byte-identical docs BEFORE LSH ----
    # Identical texts have identical shingle sets, minhash signatures and
    # band keys, so running LSH over one REPRESENTATIVE per exact group and
    # expanding the assignment back is component-identical to the direct run
    # (parity-tested) while shrinking the band shuffle by the corpus's
    # duplication factor — on the 6.26M-page soak corpus (2.4x exact
    # duplication) the ~200M-row band shuffle drops to ~85M rows.  The
    # pre-pass itself ships only (id, 64-bit key) through one shuffle.  On a
    # dup-free corpus (reps > 90% of docs) the pre-pass result is discarded
    # and the direct path runs — one cheap slim pass of overhead.
    if pre_exact and not _pairs_only:
        from ..relational import hash_join

        # size gate first: below ~200k docs the pre-pass's extra jobs cost
        # more than any duplication saves (measured: the probe alone added
        # ~1 s to a 5k-doc bench run), and metadata row counts are free
        est0 = estimate_rows(ds)
        if est0 is not None and est0 < 200_000:
            pre_exact = False
    if pre_exact and not _pairs_only:
        # cheap sampled gate next: a 50k-row probe estimates the exact-dup
        # fraction; corpora with <5% sampled duplication skip the full
        # pre-pass entirely (the 6.26M-page soak corpus is 100% perturbed
        # near-dups — the full-corpus probe there cost ~25 s for nothing).
        # Sampled duplication UNDER-estimates the true rate (cross-sample
        # dups are missed), so the threshold is deliberately low.
        try:
            probe = ds.select_columns([text_col]).limit(50_000).to_pandas()
            n_p = len(probe)
            dup_frac = (
                1.0 - probe[text_col].fillna("").nunique() / n_p if n_p else 0.0
            )
        except Exception:
            dup_frac = 1.0  # probe failure: fall through to the exact gate
        if dup_frac < 0.05:
            pre_exact = False
    if pre_exact and not _pairs_only:
        from ..relational import hash_join

        ex = _exact_groups(
            ds.select_columns([id_col, text_col]), text_col, id_col
        ).materialize()
        n_docs = ex.count()
        reps_ids = ex.map_batches(
            lambda t: t.filter(pc.equal(t[id_col], t["keep_id"])).select([id_col]),
            batch_format="pyarrow",
        ).materialize()
        n_reps = reps_ids.count()
        if n_reps <= 0.9 * n_docs:
            rep_corpus = hash_join(
                ds.select_columns([id_col, text_col]), reps_ids,
                on=id_col, how="semi",
            )
            sub = minhash_lsh_dedup(
                rep_corpus, text_col=text_col, id_col=id_col, shingle=shingle,
                k=k, num_perm=num_perm, bands=bands, threshold=threshold,
                verify=verify, workdir=workdir, input_token=input_token,
                pre_exact=False, _use_uids=_use_uids,
            )
            sub_r = sub.map_batches(
                lambda t: pa.table({"__rep": t[id_col], "__near": t["keep_id"]}),
                batch_format="pyarrow",
            )
            joined = hash_join(ex, sub_r, on="keep_id", right_on="__rep")
            return joined.map_batches(
                lambda t: pa.table({id_col: t[id_col], "keep_id": t["__near"]}),
                batch_format="pyarrow",
            )

    # ---- surrogate uids for string-keyed corpora (the 100-TB posture) ----
    # URL-keyed runs ship ~50-60 B of id per band row and 2x that per pair;
    # the band shuffle alone is ~200M rows at 6.26M pages, and the string
    # bytes ran a single node out of spill disk.  Mirror the ER pipeline's
    # int64 stable-hash uids: band/pair/CC shuffles move 8-byte ids, and the
    # entity-map uid machinery resolves canon = MIN member ORIGINAL id, so
    # the (id, keep_id) output is identical to the raw-id path (parity
    # tested).  Collisions (63-bit: ~n^2/2^64) are detected by a distinct
    # count and fall back to raw ids.
    if _use_uids is None:
        from ..scoring import dataset_arrow_types

        try:
            id_t = dataset_arrow_types(ds)[id_col]
            _use_uids = pa.types.is_string(id_t) or pa.types.is_large_string(id_t)
        except Exception:
            _use_uids = False
    if _use_uids:
        from ..cluster import add_uid_column, build_entity_map_uid
        from ..scoring import dataset_arrow_types

        id_t = dataset_arrow_types(ds)[id_col]
        uid_view = (
            ds.select_columns([id_col, text_col])
            .map_batches(
                add_uid_column, fn_kwargs=dict(id_col=id_col),
                batch_format="pyarrow",
            )
            .materialize()
        )
        import ray as _ray

        uid_blocks = _ray.get(uid_view.select_columns(["__uid"]).to_arrow_refs())
        uids_np = np.concatenate(
            [b["__uid"].to_numpy(zero_copy_only=False) for b in uid_blocks if b.num_rows]
        ) if uid_blocks else np.zeros(0, np.int64)
        if len(np.unique(uids_np)) != len(uids_np):
            import logging

            logging.getLogger("dedupe_examples_ray").warning(
                "minhash surrogate uid collision (n=%d); raw-id rerun", len(uids_np)
            )
            return minhash_lsh_dedup(
                ds, text_col=text_col, id_col=id_col, shingle=shingle, k=k,
                num_perm=num_perm, bands=bands, threshold=threshold,
                verify=verify, workdir=workdir, input_token=input_token,
                _pairs_only=_pairs_only, _use_uids=False,
            )
        pairs_uid = minhash_lsh_dedup(
            uid_view, text_col=text_col, id_col="__uid", shingle=shingle,
            k=k, num_perm=num_perm, bands=bands, threshold=threshold,
            verify=verify, workdir=workdir, input_token=input_token,
            _pairs_only=True, _use_uids=False,
        )
        if _pairs_only:
            return pairs_uid
        em = build_entity_map_uid(
            uid_view, id_col, connected_components(pairs_uid).materialize()
        )
        return em.map_batches(
            lambda t, _ty=id_t: pa.table({
                id_col: pc.cast(t["record_id"], _ty),
                "keep_id": pc.cast(t["canon_id"], _ty),
            }),
            batch_format="pyarrow",
        )

    if workdir is not None:
        # checkpoint the expensive signature->band->pair->verify chain
        # (north_rule resume); the final assignment pass recomputes cheaply
        from ..checkpoint import run_stage

        fp = (
            f"mh-{shingle}{k}-p{num_perm}-b{bands}-t{threshold}"
            f"-v{int(verify)}-n{ds.count()}"
            + (f"-{input_token}" if input_token else "")
        )
        pairs = run_stage(
            "mh_pairs",
            lambda: minhash_lsh_dedup(
                ds, text_col=text_col, id_col=id_col, shingle=shingle, k=k,
                num_perm=num_perm, bands=bands, threshold=threshold,
                verify=verify, _pairs_only=True, _use_uids=False,
            ),
            workdir,
            fp,
        )
        if _pairs_only:
            # the surrogate-uid branch recurses here with _pairs_only=True and
            # workdir set; returning the assignment table instead of raw pairs
            # crashed connected_components (no id_a column) downstream
            return pairs
        return _assignment(ds, id_col, pairs)

    buckets = ds.map_batches(
        _minhash_bands_batch,
        fn_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle=shingle, k=k, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
    )
    est = estimate_rows(ds)
    pairs = _bucket_pairs(buckets, id_col, num_buckets=buckets_for(est * bands) if est else None)
    if verify:
        from ..scoring import bucketed_hydrate, semi_hydrate

        # bounded-candidate fast path vs partition-aligned cogroup: candidate
        # pairs are LSH-banded + bucket-capped, so their count (not the corpus
        # size) picks the hydration strategy
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        verify_kw = dict(threshold=threshold)
        if n_pairs <= _SEMI_HYDRATE_MAX:
            # bounded path: ONE semi_hydrate pull of raw text + per-batch
            # memoized shingling — at small candidate counts the sig
            # pipeline's extra jobs cost more than the whole verify
            # (bench: 2.7 vs 3.4 s at 5k docs)
            renamed = ds.select_columns([id_col, text_col])
            if text_col != "text":
                renamed = renamed.map_batches(
                    lambda t: pa.table({id_col: t[id_col], "text": t[text_col]}),
                    batch_format="pyarrow",
                )
            hydrated = semi_hydrate(pairs, renamed, id_col, ["text"])
            pairs = hydrated.map_batches(
                _jaccard_verify_hydrated,
                fn_kwargs=dict(shingle=shingle, k=k, threshold=threshold),
                batch_format="pyarrow",
            )
        else:
            # Disk-bounded verify: hydrating signatures onto EVERY candidate
            # pair materializes n_pairs * 2 * avg_sig bytes through the
            # second cogroup shuffle (a 6.26M-page soak produced >75 GB of
            # spill with raw text and ran the node out of disk).  Split the
            # pairs into hash waves so each wave's hydrated working set stays
            # under _VERIFY_WAVE_BYTES; each wave's verified output is SLIM
            # (ids+jaccard), so only one wave's signature-carrying
            # intermediates exist at a time.  Cost: the corpus-side cogroup
            # re-shuffles once per wave — the standard time/space knob.
            #
            # Per-doc shingle SIGNATURES (sorted-unique u32 hashes + u64
            # text hash) replace raw text in this regime: ~40% fewer bytes
            # through both cogroup shuffles and a searchsorted intersection
            # instead of per-batch re-shingling + intersect1d sorts —
            # measured 86 s -> 13 s for the whole verify stage at 625k
            # pages / 32 CPUs.  Shingling is ONE parallel corpus pass.
            sigds = ds.select_columns([id_col, text_col]).map_batches(
                _shingle_sig_batch,
                fn_kwargs=dict(id_col=id_col, text_col=text_col,
                               shingle=shingle, k=k),
                batch_format="pyarrow",
            ).materialize()
            avg_sig = max(
                sigds.size_bytes() / max(sigds.count(), 1), 64.0
            )
            est_bytes = n_pairs * 2 * avg_sig
            waves = min(max(int(est_bytes // _VERIFY_WAVE_BYTES) + 1, 1), 64)
            if waves == 1:
                hydrated = bucketed_hydrate(pairs, sigds, id_col, ["vsig", "thash"])
                pairs = hydrated.map_batches(
                    _jaccard_verify_sig, fn_kwargs=verify_kw,
                    batch_format="pyarrow",
                )
            else:
                import ray as _ray

                from ..pairs import stable_hash as _sh
                from ..scoring import dataset_arrow_types

                def wave_tag(t: pa.Table) -> pa.Table:
                    w = _sh(t["id_a"].to_numpy(zero_copy_only=False)) % waves
                    return t.append_column(
                        "__wave", pa.array(w.astype(np.int64), pa.int64())
                    )

                tagged = pairs.map_batches(
                    wave_tag, batch_format="pyarrow"
                ).materialize()
                rec_types_all = dataset_arrow_types(sigds)
                id_is_int = pa.types.is_integer(rec_types_all[id_col])
                # Wave corpus SEMI-FILTER: only docs referenced by a wave's
                # pairs enter that wave's hydration shuffle, bounding total
                # shuffled text by ~2 x the hydrated bytes instead of the old
                # 2W x corpus bytes.  GATED on corpus size: below the
                # threshold the whole corpus re-shuffle is an in-memory
                # memcpy and the filter's fixed per-wave costs (driver id
                # pull + an extra corpus scan) measurably LOSE (625k pages /
                # 262 MB parquet: 389 s filtered vs 362 s unfiltered; 62k:
                # 144 vs 128 s).  The filter targets the regime that created
                # the waves in the first place — multi-GB corpora whose
                # repeated text re-shuffle spills to disk (the 6.26M-page
                # soak produced >75 GB of spill pre-waves).
                use_filter = (sigds.size_bytes() or 0) >= _VERIFY_FILTER_MIN_BYTES
                outs = []
                for w in range(waves):
                    sub = tagged.filter(
                        expr=f"__wave == {w}"
                    ).drop_columns(["__wave"]).materialize()
                    if not use_filter:
                        hyd = bucketed_hydrate(
                            sub, sigds, id_col, ["vsig", "thash"],
                            rec_types=rec_types_all,
                        )
                        outs.append(
                            hyd.map_batches(
                                _jaccard_verify_sig, fn_kwargs=verify_kw,
                                batch_format="pyarrow",
                            ).materialize()
                        )
                        continue
                    refs = [
                        t for t in _ray.get(
                            sub.select_columns(["id_a", "id_b"]).to_arrow_refs()
                        ) if t.num_rows
                    ]
                    if not refs:
                        continue
                    chunks = [t["id_a"].combine_chunks() for t in refs] + [
                        t["id_b"].combine_chunks() for t in refs
                    ]
                    wave_ids = pc.unique(pa.chunked_array(chunks).combine_chunks())
                    if id_is_int:
                        # sorted int probe: zero-copy broadcast, no per-batch
                        # hash-set rebuild (is_in rebuilds its value-set hash
                        # per task — O(|wave ids|) per corpus block)
                        ids_ref = _ray.put(
                            np.sort(wave_ids.to_numpy(zero_copy_only=False))
                        )

                        def wave_filter(t: pa.Table, _r=ids_ref) -> pa.Table:
                            nd = _ray.get(_r)
                            uid = t[id_col].to_numpy(zero_copy_only=False)
                            if len(nd) == 0:
                                return t.slice(0, 0)
                            pos = np.minimum(np.searchsorted(nd, uid), len(nd) - 1)
                            return t.filter(pa.array(nd[pos] == uid))
                    else:
                        ids_ref = _ray.put(wave_ids)

                        def wave_filter(t: pa.Table, _r=ids_ref) -> pa.Table:
                            vs = _ray.get(_r)
                            return t.filter(pc.is_in(t[id_col], value_set=vs))

                    flt = sigds.map_batches(wave_filter, batch_format="pyarrow")
                    hyd = bucketed_hydrate(
                        sub, flt, id_col, ["vsig", "thash"], rec_types=rec_types_all
                    )
                    outs.append(
                        hyd.map_batches(
                            _jaccard_verify_sig, fn_kwargs=verify_kw,
                            batch_format="pyarrow",
                        ).materialize()  # slim; frees this wave's hydrated spill
                    )
                if outs:
                    pairs = outs[0]
                    for o in outs[1:]:
                        pairs = pairs.union(o)
    if _pairs_only:
        return pairs
    return _assignment(ds, id_col, pairs)


def ngram_jaccard_dedup(ds, text_col="text", id_col="doc_id", n=5, threshold=0.5, **kw):
    """Character-ngram variant of minhash_lsh_dedup (token-order robust)."""
    return minhash_lsh_dedup(
        ds, text_col=text_col, id_col=id_col, shingle="char", k=n, threshold=threshold, **kw
    )


# ------------------------------------------------------------------- simhash
def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash (Charikar 2002): sign of weighted bit-vote sums."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1)
    if weights is not None:
        votes = votes * weights[:, None]
    v = votes.sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def batch_simhash64(texts: list) -> np.ndarray:
    """(n_docs,) uint64 simhashes computed batched: one vectorized token-hash
    call over the batch's concatenated tokens, bit votes summed per doc with
    ``np.add.reduceat`` — no per-doc Python beyond the tokenizer split."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    toks = [(tx or "").lower().split() for tx in texts]
    counts = np.array([len(x) for x in toks], dtype=np.int64)
    if counts.sum() == 0:
        return out
    th = _hash_tokens(np.concatenate([np.asarray(x, dtype=object) for x in toks if x]))
    offsets = np.concatenate([[0], np.cumsum(counts)])
    CHUNK = 1 << 15
    doc = 0
    while doc < n:
        end = doc
        tok_count = 0
        while end < n and (tok_count == 0 or tok_count + counts[end] <= CHUNK):
            tok_count += int(counts[end])
            end += 1
        if tok_count > 0:
            x = th[offsets[doc] : offsets[end]]
            votes = (
                2 * ((x[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
                - 1
            )  # (toks, 64)
            nonempty = np.flatnonzero(counts[doc:end]) + doc
            starts = (offsets[nonempty] - offsets[doc]).astype(np.int64)
            sums = np.add.reduceat(votes, starts, axis=0)  # (n_nonempty, 64)
            bits = (sums > 0).astype(np.uint64)
            out[nonempty] = (bits << np.arange(64, dtype=np.uint64)).sum(axis=1)
        doc = end
    return out


def _simhash_bands_batch(t: pa.Table, id_col, text_col, bands) -> pa.Table:
    ids = np.asarray(t[id_col].to_pylist(), dtype=object)
    texts = t[text_col].to_pylist()
    n = len(ids)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    sims = batch_simhash64(texts)
    shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(width))[None, :]
    keys = ((sims[:, None] >> shifts) & mask).astype(np.int64)  # (n, bands)
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, bands), t[id_col].type),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
            "key": pa.array(keys.ravel(), pa.int64()),
            "simhash": pa.array(np.repeat(sims, bands), pa.uint64()),
        }
    )


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 200,
    num_buckets: int | None = None,
    _pairs_only: bool = False,
    _use_uids: bool | None = None,
):
    """Near-dup assignment via SimHash banding + hamming-distance verify.

    With 4 bands of 16 bits, any pair within hamming distance 3 shares at
    least one exact band (pigeonhole) — the standard near-dup web setup
    (Manku et al., WWW 2007).

    Hot band keys (empty/boilerplate docs share simhash bands) are salted
    into deterministic sub-buckets over ``max_bucket`` exactly like the
    minhash path (``_bucket_pairs``) — the per-group verify is bounded at
    O(max_bucket^2) instead of going quadratic in one task; use
    ``simhash_bucket_metrics`` for the emitted/dropped estimate.
    """
    from ..pairs import stable_hash
    from ..scale import buckets_for, estimate_rows

    if not _pairs_only and _use_uids is not False:
        # string-keyed corpora: int64 surrogate uids through band/pair/CC
        # (see surrogate_assignment; raw-id path on int keys or collision)
        return surrogate_assignment(
            ds, id_col,
            lambda view, wid: simhash_dedup(
                view, text_col=text_col, id_col=wid, bands=bands,
                max_hamming=max_hamming, max_bucket=max_bucket,
                num_buckets=num_buckets, _pairs_only=True,
            ),
            [id_col, text_col],
        )
    if num_buckets is None:
        est = estimate_rows(ds)
        num_buckets = buckets_for(est * bands if est else None)
    buckets = ds.map_batches(
        _simhash_bands_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, bands=bands),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = (
            t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            + t["band"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) % num_buckets
        return t.append_column("bucket", pa.array(h.astype(np.int64), pa.int64()))

    def _hamming_pairs(ids: np.ndarray, sims: np.ndarray, frames: list) -> None:
        n = len(ids)
        if n < 2:
            return
        ia, ib = np.triu_indices(n, k=1)
        x = sims[ia] ^ sims[ib]
        # vectorized popcount via bit-twiddling on uint64
        ham = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        while v.any():
            ham += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        keep = ham <= max_hamming
        frames.append(
            pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]})
        )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in df.groupby(["band", "key"], sort=False):
            u = sub.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = u[id_col].to_numpy()
            sims = u["simhash"].to_numpy(dtype=np.uint64)
            n = len(ids)
            if n < 2:
                continue
            if n > max_bucket:  # salt the hot band key into sub-buckets
                k = -(-n // max_bucket)
                salt = stable_hash(ids) % k
                for sv in range(k):
                    m = salt == sv
                    _hamming_pairs(ids[m], sims[m], frames)
                continue
            _hamming_pairs(ids, sims, frames)
        if not frames:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=df[id_col].dtype),
                    "id_b": pd.Series([], dtype=df[id_col].dtype),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(frames, ignore_index=True)

    from ..pairs import dedup_pairs

    pairs = (
        buckets.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: _clean_arrow(emit(df)), batch_format="pandas")
    )
    pairs = dedup_pairs(pairs)
    if _pairs_only:
        return pairs
    return _assignment(ds, id_col, pairs)


def simhash_bucket_metrics(
    ds, text_col="text", id_col="doc_id", bands=4, max_bucket=200, num_buckets=None
) -> dict:
    """Emitted/dropped candidate estimate for simhash banding — the same
    report shape as ``lsh_bucket_metrics`` (no silent caps)."""
    buckets = ds.map_batches(
        _simhash_bands_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, bands=bands),
        batch_format="pyarrow",
    )
    return lsh_bucket_metrics(buckets, id_col, max_bucket=max_bucket, num_buckets=num_buckets)


# ------------------------------------------------------- embedding near-dup
def _hyperplane_buckets_batch(
    t: pa.Table, id_col, vec_col, dim, n_planes=12, seed=5, carry_vec=False
) -> pa.Table:
    """Random-hyperplane LSH for unit vectors (cosine LSH); deterministic
    planes rebuilt per worker (cheap: dim x n_planes floats).

    ``carry_vec``: keep the embedding in the bucket row (one row per doc, so
    no duplication) — the within-bucket verify then needs no vector lookup."""
    from .ann import _col_matrix

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    vecs = _col_matrix(t[vec_col]) if t.num_rows else np.empty((0, dim))
    if vecs.ndim == 1:
        vecs = vecs.reshape(0, dim)
    signs = (vecs @ planes) > 0
    keys = (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)
    cols = {id_col: t[id_col], "key": pa.array(keys.astype(np.int64), pa.int64())}
    if carry_vec:
        cols["vec"] = pc_cast_arr(
            t[vec_col], pa.list_(pa.float64())
        )
    return pa.table(cols)


def embedding_cosine_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    tau: float = 0.95,
    n_planes: int = 12,
    max_bucket: int = 2000,
    num_buckets: int | None = None,
    _pairs_only: bool = False,
    _use_uids: bool | None = None,
):
    """Embedding near-dup: hyperplane buckets -> within-bucket cosine >= tau
    -> components -> (id, keep_id).

    Scale posture: the embedding travels *inside its own bucket row* (exactly
    one bucket row per doc — no duplication), so the within-bucket verify is a
    local numpy matmul over the group's vectors.  No driver materialization,
    no vector broadcast; the only wide op is the one bucketed groupby.

    Hot hyperplane keys (near-dup-dense corpora concentrate into few of the
    2^n_planes buckets) are salted into deterministic sub-buckets over
    ``max_bucket``, bounding the per-group ``V @ V.T`` at
    O(max_bucket^2 * dim); members of a real near-dup cluster still collide
    within sub-buckets with high probability.  ``embedding_bucket_metrics``
    reports the emitted/dropped estimate — no silent caps.
    """
    from ..pairs import stable_hash
    from ..scale import resolve_buckets

    if not _pairs_only and _use_uids is not False:
        # string-keyed corpora: surrogate uids through bucket/pair/CC
        return surrogate_assignment(
            ds, id_col,
            lambda view, wid: embedding_cosine_dedup(
                view, vec_col=vec_col, id_col=wid, dim=dim, tau=tau,
                n_planes=n_planes, max_bucket=max_bucket,
                num_buckets=num_buckets, _pairs_only=True,
            ),
            [id_col, vec_col],
        )
    num_buckets = resolve_buckets(num_buckets, ds)
    if dim is None:
        first = ds.take(1)[0][vec_col]
        dim = len(first)
    buckets = ds.map_batches(
        _hyperplane_buckets_batch,
        fn_kwargs=dict(id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes, carry_vec=True),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["key"].to_numpy(zero_copy_only=False) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    def _cosine_pairs(ids: np.ndarray, vecs: pd.Series, frames: list) -> None:
        if len(ids) < 2:
            return
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= tau
        frames.append(
            pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "score": S[ia, ib][keep]})
        )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in df.groupby("key", sort=False):
            u = sub.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = u[id_col].to_numpy()
            n = len(ids)
            if n < 2:
                continue
            if n > max_bucket:  # salt the hot hyperplane key into sub-buckets
                k = -(-n // max_bucket)
                salt = stable_hash(ids) % k
                for sv in range(k):
                    m = salt == sv
                    _cosine_pairs(ids[m], u["vec"].iloc[np.flatnonzero(m)], frames)
                continue
            _cosine_pairs(ids, u["vec"], frames)
        if not frames:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=df[id_col].dtype),
                    "id_b": pd.Series([], dtype=df[id_col].dtype),
                    "score": pd.Series([], dtype=np.float64),
                }
            )
        return pd.concat(frames, ignore_index=True)

    from ..pairs import dedup_pairs

    pairs = (
        buckets.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: _clean_arrow(verify(df)), batch_format="pandas")
    )
    pairs = dedup_pairs(pairs)
    if _pairs_only:
        return pairs
    return _assignment(ds, id_col, pairs)


def embedding_bucket_metrics(
    ds, vec_col="embedding", id_col="vec_id", dim=None, n_planes=12,
    max_bucket=2000, num_buckets=None,
) -> dict:
    """Emitted/dropped candidate estimate for the hyperplane buckets — the
    same report shape as ``lsh_bucket_metrics`` (no silent caps)."""
    if dim is None:
        first = ds.take(1)[0][vec_col]
        dim = len(first)
    buckets = ds.map_batches(
        _hyperplane_buckets_batch,
        fn_kwargs=dict(id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.append_column("band", pa.array(np.zeros(t.num_rows, np.int32), pa.int32())),
        batch_format="pyarrow",
    )
    return lsh_bucket_metrics(buckets, id_col, max_bucket=max_bucket, num_buckets=num_buckets)


def keep_best_assignment(assign_ds, scores_ds, id_col: str = "doc_id",
                         keep_col: str = "keep_id", score_col: str = "score",
                         out_col: str = "best_id",
                         num_buckets: int | None = None):
    """Re-label a dedup assignment so each cluster's representative is its
    BEST-scoring member instead of the first/minimum id — the quality-aware
    keep strategy large-corpus near-dedup uses (keep the longest / highest
    quality / most recent copy of each near-dup cluster, not an arbitrary
    one).

    ``assign_ds``: ``(id_col, keep_col)`` from any dedup family member
    (exact_dedup, minhash_lsh_dedup, simhash_dedup, ...).  ``scores_ds``:
    ``(id_col, score_col)``.  Winner per cluster = max score, ties broken by
    MIN id (deterministic under any partitioning).  Returns ``(id_col,
    out_col)`` covering every input row.

    Scale shape: one big-big hash_join attaches scores (never broadcast),
    then the keep_latest combiner pattern — per-batch winners first, ONE
    bucketed shuffle of those winners, per-bucket final argmax — then a
    second big-big join relabels members.  Shuffle volume O(clusters), not
    O(rows), on the argmax leg.
    """
    from ..relational import hash_join
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, assign_ds)
    from ..pairs import stable_hash

    scored = hash_join(
        assign_ds.select_columns([id_col, keep_col]),
        scores_ds.select_columns([id_col, score_col]),
        on=id_col, num_buckets=num_buckets)

    def local_winner(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({keep_col: t[keep_col], out_col: t[id_col],
                             "_s": t[score_col], "_bucket": pa.array([], pa.int64())})
        df = t.select([keep_col, id_col, score_col]).to_pandas()
        df = df.sort_values([score_col, id_col], ascending=[False, True],
                            kind="mergesort")
        w = df.drop_duplicates(keep_col, keep="first")
        b = stable_hash(w[keep_col].to_numpy()) % num_buckets
        return pa.table({
            keep_col: pa.array(w[keep_col]),
            out_col: pa.array(w[id_col]),
            "_s": pa.array(w[score_col]),
            "_bucket": pa.array(b.astype(np.int64), pa.int64()),
        })

    def final_winner(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_bucket"]).to_pandas()
        if len(df) == 0:
            return pa.table({keep_col: t[keep_col], out_col: t[out_col]})
        df = df.sort_values(["_s", out_col], ascending=[False, True],
                            kind="mergesort")
        w = df.drop_duplicates(keep_col, keep="first")
        return _clean_arrow(w[[keep_col, out_col]])

    best = (scored.map_batches(local_winner, batch_format="pyarrow")
            .groupby("_bucket").map_groups(final_winner,
                                           batch_format="pyarrow"))
    out = hash_join(assign_ds.select_columns([id_col, keep_col]), best,
                    on=keep_col, num_buckets=num_buckets)
    return out.map_batches(lambda t: t.select([id_col, out_col]),
                           batch_format="pyarrow")


def minhash_keep_best_dedup(ds, text_col: str = "text",
                            id_col: str = "doc_id",
                            score_col: str | None = None, **minhash_kwargs):
    """MinHash-LSH near-dup clustering with quality-aware representative
    selection: cluster via :func:`minhash_lsh_dedup`, then keep each
    cluster's best-scoring member (``score_col``; default: text length in
    chars — the "keep the longest version" web-dedup heuristic).  Returns
    ``(id_col, best_id)``."""
    assign = minhash_lsh_dedup(ds, text_col=text_col, id_col=id_col,
                               **minhash_kwargs)

    def score(t: pa.Table) -> pa.Table:
        if score_col is not None:
            s = pc.cast(t[score_col], pa.float64())
        else:
            s = pc.cast(pc.utf8_length(pc.fill_null(
                pc.cast(t[text_col], pa.string()), "")), pa.float64())
        return pa.table({id_col: t[id_col], "score": s})

    scores = ds.map_batches(score, batch_format="pyarrow")
    return keep_best_assignment(assign, scores, id_col=id_col)
