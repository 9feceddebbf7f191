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

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[id_col].min()
        return pd.DataFrame({id_col: df[id_col], "keep_id": keep})

    return hashed.groupby("h").map_groups(assign, batch_format="pandas")


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


class _MinhashBands:
    """Actor-pool stage: doc -> (band, key, doc_id) LSH bucket rows.

    Permutation parameters are built once per actor (deterministic seed).
    """

    def __init__(self, id_col, text_col, shingle: str, k: int, num_perm: int, bands: int):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.bands = bands
        self.rows = num_perm // bands
        self.a, self.b = _perm_params(num_perm)
        self.shingle_fn = word_shingles if shingle == "word" else char_ngrams

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        texts = t[self.text_col].to_pylist()
        out_id: list = []
        out_band: list[int] = []
        out_key: list[int] = []
        for did, text in zip(ids, texts):
            sh = self.shingle_fn(text, self.k)
            sig = minhash_signature(_hash_tokens(sh), self.a, self.b)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows : (bi + 1) * self.rows]
                key = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                ) >> 1
                out_id.append(did)
                out_band.append(bi)
                out_key.append(key)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
            }
        )


def _bucket_pairs(bucket_ds, id_col: str, max_bucket: int = 200):
    """LSH buckets -> unique candidate (id_a, id_b) pairs."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df[id_col].unique())
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(df[id_col].dtype)
        if n > max_bucket:  # hot bucket guard (boilerplate-heavy corpora)
            ids = ids[:max_bucket]
            n = max_bucket
        ia, ib = np.triu_indices(n, k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = bucket_ds.groupby(["band", "key"]).map_groups(emit, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


class _JaccardVerifier:
    """Verify candidate pairs with exact shingle Jaccard (broadcast text map)."""

    def __init__(self, text_ref, shingle: str, k: int, threshold: float):
        import ray

        self.texts = ray.get(text_ref) if isinstance(text_ref, ray.ObjectRef) else text_ref
        self.k = k
        self.threshold = threshold
        self.shingle_fn = word_shingles if shingle == "word" else char_ngrams

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
            sa = set(self.shingle_fn(self.texts.get(a, ""), self.k))
            sb = set(self.shingle_fn(self.texts.get(b, ""), self.k))
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter) if inter else 0.0
            out.append(j)
        score = pa.array(out, pa.float64())
        keep = pc.greater_equal(score, self.threshold)
        return pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "score": score}
        ).filter(keep)


def _assignment(ds, id_col: str, edges_ds):
    """edges -> components -> (doc_id, keep_id) with singleton completion."""
    labels = connected_components(edges_ds)
    lab_df = labels.to_pandas()
    label_map = dict(zip(lab_df["node"], lab_df["label"])) if not lab_df.empty else {}
    import ray

    ref = ray.put(label_map)

    class Annot:
        def __init__(self, ref=ref):
            self.m = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_pylist()
            return pa.table(
                {id_col: t[id_col], "keep_id": pa.array([self.m.get(i, i) for i in ids])}
            )

    return ds.select_columns([id_col]).map_batches(Annot, batch_format="pyarrow", concurrency=(1, 4))


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
        _MinhashBands,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle=shingle, k=k, num_perm=num_perm, bands=bands
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    pairs = _bucket_pairs(buckets, id_col)
    if verify:
        import ray

        texts = dict(
            zip(
                ds.select_columns([id_col]).to_pandas()[id_col],
                ds.select_columns([text_col]).to_pandas()[text_col],
            )
        )
        pairs = pairs.map_batches(
            _JaccardVerifier,
            fn_constructor_kwargs=dict(
                text_ref=ray.put(texts), shingle=shingle, k=k, threshold=threshold
            ),
            batch_format="pyarrow",
            concurrency=(1, 4),
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


class _SimhashBands:
    def __init__(self, id_col, text_col, bands: int = 4):
        self.id_col = id_col
        self.text_col = text_col
        self.bands = bands

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        texts = t[self.text_col].to_pylist()
        rows_id, rows_band, rows_key, rows_sim = [], [], [], []
        width = 64 // self.bands
        mask = (1 << width) - 1
        for did, text in zip(ids, texts):
            toks = (text or "").lower().split()
            sh = simhash64(_hash_tokens(np.array(toks, dtype=object)))
            for bi in range(self.bands):
                rows_id.append(did)
                rows_band.append(bi)
                rows_key.append((sh >> (bi * width)) & mask)
                rows_sim.append(sh)
        return pa.table(
            {
                self.id_col: pa.array(rows_id),
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
        _SimhashBands,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col, bands=bands),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = u[id_col].to_numpy()
        sims = u["simhash"].to_numpy(dtype=np.uint64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(n, k=1)
        ham = np.array(
            [bin(int(sims[x]) ^ int(sims[y])).count("1") for x, y in zip(ia, ib)]
        )
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]})

    pairs = buckets.groupby(["band", "key"]).map_groups(emit, batch_format="pandas")
    pairs = pairs.groupby(["id_a", "id_b"]).map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
    return _assignment(ds, id_col, pairs)


# ------------------------------------------------------- embedding near-dup
class _HyperplaneBuckets:
    """Random-hyperplane LSH for unit vectors (cosine LSH)."""

    def __init__(self, id_col, vec_col, dim: int, n_planes: int = 12, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        vecs = np.asarray(t[self.vec_col].to_pylist(), dtype=np.float64)
        if vecs.ndim == 1:
            vecs = vecs.reshape(0, self.planes.shape[0])
        signs = (vecs @ self.planes) > 0
        keys = (signs.astype(np.uint64) << np.arange(signs.shape[1], dtype=np.uint64)).sum(axis=1)
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "key": pa.array(keys.astype(np.int64), pa.int64()),
            }
        )


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
        _HyperplaneBuckets,
        fn_constructor_kwargs=dict(id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    import ray

    vec_df = ds.select_columns([id_col, vec_col]).to_pandas()
    vec_map = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for _, r in vec_df.iterrows()}
    vec_ref = ray.put(vec_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        vecs = ray.get(vec_ref)
        ids = np.sort(df[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        V = np.stack([vecs[i] for i in ids])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= tau
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "score": S[ia, ib][keep]}
        )

    pairs = buckets.groupby("key").map_groups(verify, batch_format="pandas")
    pairs = pairs.groupby(["id_a", "id_b"]).map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
    return _assignment(ds, id_col, pairs)
