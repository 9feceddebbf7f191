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
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, keep_id): keep the min id per exact content hash."""

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [
            int.from_bytes(hashlib.blake2b((s or "").encode(), digest_size=8).digest(), "big") >> 1
            for s in texts
        ]
        return pa.table({id_col: t[id_col], "h": pa.array(hs, pa.int64())})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    # bucketed: group by h%B (B groups), per-hash min via vectorized transform
    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        b = t["h"].to_numpy(zero_copy_only=False) % 64
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: df[id_col], "keep_id": df.groupby("h", sort=False)[id_col].transform("min")}
        )

    return hashed.map_batches(add_bucket, batch_format="pyarrow").groupby("bucket").map_groups(
        assign, batch_format="pandas"
    )


# ------------------------------------------------------------------- minhash
def _hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Stable 64-bit hashes for a string array (vectorized via pandas)."""
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def minhash_signature(token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhashes via universal hashing h_i(x) = a_i*x + b_i (mod 2^61-1)."""
    if len(token_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    M = np.uint64((1 << 61) - 1)
    x = token_hashes.astype(np.uint64)[None, :]
    hv = (a[:, None] * x + b[:, None]) % M
    return hv.min(axis=1)


def _perm_params(num_perm: int, seed: int = 11) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    M = (1 << 61) - 1
    a = rng.integers(1, M, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, M, size=num_perm, dtype=np.uint64)
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


_PERM_CACHE: dict = {}


def _minhash_bands_batch(t: pa.Table, id_col, text_col, shingle, k, num_perm, bands) -> pa.Table:
    """Task stage: doc -> (band, key, doc_id) LSH bucket rows.

    Deterministic permutation params cached per worker process.
    """
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    rows = num_perm // bands
    shingle_fn = word_shingles if shingle == "word" else char_ngrams
    ids = t[id_col].to_pylist()
    texts = t[text_col].to_pylist()
    out_id: list = []
    out_band: list[int] = []
    out_key: list[int] = []
    for did, text in zip(ids, texts):
        sh = shingle_fn(text, k)
        sig = minhash_signature(_hash_tokens(sh), a, b)
        for bi in range(bands):
            chunk = sig[bi * rows : (bi + 1) * rows]
            key = int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
            ) >> 1
            out_id.append(did)
            out_band.append(bi)
            out_key.append(key)
    return pa.table(
        {
            id_col: pa.array(out_id),
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.int64()),
        }
    )


def _bucket_pairs(bucket_ds, id_col: str, max_bucket: int = 200, num_buckets: int = 64):
    """LSH buckets -> unique candidate (id_a, id_b) pairs.

    Bucketed shuffle (hash(band,key) % B -> B groups) with a vectorized
    pandas loop over the LSH buckets inside each group — never one Python
    dispatch per LSH bucket.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        h = (
            t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            + t["band"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) % num_buckets
        return t.append_column("bucket", pa.array(h.astype(np.int64), pa.int64()))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in df.groupby(["band", "key"], sort=False):
            ids = np.sort(sub[id_col].unique())
            n = len(ids)
            if n < 2:
                continue
            if n > max_bucket:  # hot bucket guard (boilerplate-heavy corpora)
                ids = ids[:max_bucket]
                n = max_bucket
            ia, ib = np.triu_indices(n, k=1)
            frames.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
        if not frames:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=df[id_col].dtype), "id_b": pd.Series([], dtype=df[id_col].dtype)}
            )
        return pd.concat(frames, ignore_index=True)

    from ..pairs import dedup_pairs

    pairs = (
        bucket_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pandas")
    )
    return dedup_pairs(pairs)


def _jaccard_verify_batch(t: pa.Table, text_ref, shingle, k, threshold) -> pa.Table:
    """Verify candidate pairs with exact shingle Jaccard (broadcast text map,
    resolved once per worker via the broadcast cache)."""
    texts = _get_broadcast(text_ref)
    shingle_fn = word_shingles if shingle == "word" else char_ngrams
    out = []
    for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
        sa = set(shingle_fn(texts.get(a, ""), k))
        sb = set(shingle_fn(texts.get(b, ""), k))
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter) if inter else 0.0
        out.append(j)
    score = pa.array(out, pa.float64())
    keep = pc.greater_equal(score, threshold)
    return pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "score": score}).filter(keep)


def _assignment(ds, id_col: str, edges_ds):
    """edges -> components -> (doc_id, keep_id) with singleton completion."""
    labels = connected_components(edges_ds)
    lab_df = labels.to_pandas()
    label_map = dict(zip(lab_df["node"], lab_df["label"])) if not lab_df.empty else {}
    import ray

    ref = ray.put(label_map)

    def annot(t: pa.Table) -> pa.Table:
        m = _get_broadcast(ref)
        ids = t[id_col].to_pylist()
        return pa.table(
            {id_col: t[id_col], "keep_id": pa.array([m.get(i, i) for i in ids])}
        )

    return ds.select_columns([id_col]).map_batches(annot, batch_format="pyarrow")


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: str = "word",
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    verify: bool = True,
):
    """Near-dup assignment via MinHash+LSH (see module docstring).

    ``bands=32, num_perm=128`` (r=4) targets the classic S-curve with ~0.5
    Jaccard threshold.  ``verify=False`` skips the exact-Jaccard pass (pure
    LSH recall, lower precision).

    Note: the verifier broadcasts an {id: text} map — fine for corpus shards
    that fit the object store; at 100 TB run per-partition or carry shingle
    sketches through the pair rows instead.
    """
    buckets = ds.map_batches(
        _minhash_bands_batch,
        fn_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle=shingle, k=k, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
    )
    pairs = _bucket_pairs(buckets, id_col)
    if verify:
        import ray

        id_text = ds.select_columns([id_col, text_col]).to_pandas()
        texts = dict(zip(id_text[id_col], id_text[text_col]))
        pairs = pairs.map_batches(
            _jaccard_verify_batch,
            fn_kwargs=dict(text_ref=ray.put(texts), shingle=shingle, k=k, threshold=threshold),
            batch_format="pyarrow",
        )
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


def _simhash_bands_batch(t: pa.Table, id_col, text_col, bands) -> pa.Table:
    ids = t[id_col].to_pylist()
    texts = t[text_col].to_pylist()
    rows_id, rows_band, rows_key, rows_sim = [], [], [], []
    width = 64 // bands
    mask = (1 << width) - 1
    for did, text in zip(ids, texts):
        toks = (text or "").lower().split()
        sh = simhash64(_hash_tokens(np.array(toks, dtype=object)))
        for bi in range(bands):
            rows_id.append(did)
            rows_band.append(bi)
            rows_key.append((sh >> (bi * width)) & mask)
            rows_sim.append(sh)
    return pa.table(
        {
            id_col: pa.array(rows_id),
            "band": pa.array(rows_band, pa.int32()),
            "key": pa.array(rows_key, pa.int64()),
            "simhash": pa.array(rows_sim, pa.uint64()),
        }
    )


def simhash_dedup(
    ds, text_col: str = "text", id_col: str = "doc_id", bands: int = 4, max_hamming: int = 3
):
    """Near-dup assignment via SimHash banding + hamming-distance verify.

    With 4 bands of 16 bits, any pair within hamming distance 3 shares at
    least one exact band (pigeonhole) — the standard near-dup web setup
    (Manku et al., WWW 2007).
    """
    buckets = ds.map_batches(
        _simhash_bands_batch,
        fn_kwargs=dict(id_col=id_col, text_col=text_col, bands=bands),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = (
            t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            + t["band"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) % 64
        return t.append_column("bucket", pa.array(h.astype(np.int64), pa.int64()))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in df.groupby(["band", "key"], sort=False):
            u = sub.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = u[id_col].to_numpy()
            sims = u["simhash"].to_numpy(dtype=np.uint64)
            n = len(ids)
            if n < 2:
                continue
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
        .map_groups(emit, batch_format="pandas")
    )
    return _assignment(ds, id_col, dedup_pairs(pairs))


# ------------------------------------------------------- embedding near-dup
def _hyperplane_buckets_batch(t: pa.Table, id_col, vec_col, dim, n_planes=12, seed=5) -> pa.Table:
    """Random-hyperplane LSH for unit vectors (cosine LSH); deterministic
    planes rebuilt per worker (cheap: dim x n_planes floats)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    vecs = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
    if vecs.ndim == 1:
        vecs = vecs.reshape(0, dim)
    signs = (vecs @ planes) > 0
    keys = (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)
    return pa.table({id_col: t[id_col], "key": pa.array(keys.astype(np.int64), pa.int64())})


def embedding_cosine_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    tau: float = 0.95,
    n_planes: int = 12,
):
    """Embedding near-dup: hyperplane buckets -> within-bucket cosine >= tau
    -> components -> (id, keep_id).

    The within-bucket verify broadcasts bucket members only (numpy matmul per
    group) — no global materialization.
    """
    if dim is None:
        first = ds.take(1)[0][vec_col]
        dim = len(first)
    buckets = ds.map_batches(
        _hyperplane_buckets_batch,
        fn_kwargs=dict(id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
    )
    import ray

    vec_df = ds.select_columns([id_col, vec_col]).to_pandas()
    vec_map = {
        i: np.asarray(v, dtype=np.float64) for i, v in zip(vec_df[id_col], vec_df[vec_col])
    }
    vec_ref = ray.put(vec_map)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = t["key"].to_numpy(zero_copy_only=False) % 64
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        vecs = ray.get(vec_ref)
        frames = []
        for _, sub in df.groupby("key", sort=False):
            ids = np.sort(sub[id_col].unique())
            if len(ids) < 2:
                continue
            V = np.stack([vecs[i] for i in ids])
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            S = V @ V.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = S[ia, ib] >= tau
            frames.append(
                pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "score": S[ia, ib][keep]})
            )
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
        .map_groups(verify, batch_format="pandas")
    )
    return _assignment(ds, id_col, dedup_pairs(pairs))
