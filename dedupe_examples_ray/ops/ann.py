"""Approximate-nearest-neighbor search over an embedding column.

- ``ann_brute_force``: exact cosine top-k — per-batch numpy matmul against a
  *broadcast* query matrix (``ray.put`` once, read in every task), local
  top-k per batch, tiny global merge on the driver.  The baseline and oracle.
- ``ann_lsh``: scale path — random-hyperplane bucket signatures on both
  corpus and queries; only matching (or nearby) buckets are scanned.
  Documented tradeoff: recall depends on n_planes/probes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(rows, dtype=np.float64) -> np.ndarray:
    return np.asarray([np.asarray(r, dtype=dtype) for r in rows], dtype=dtype)


def _col_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow list<float> column -> (n, dim) numpy without a Python round-trip.

    Fixed-size-list and uniform-length list columns reshape the flat child
    buffer directly; ragged columns fall back to the per-row path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t):
        flat = col.values.to_numpy(zero_copy_only=False).astype(dtype, copy=False)
        return flat.reshape(len(col), t.list_size)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
            # offsets may not start at 0 on a sliced array
            return flat.reshape(len(col), int(widths[0])) if offsets[0] == 0 else (
                col.values.to_numpy(zero_copy_only=False)
                .astype(dtype, copy=False)[offsets[0]: offsets[-1]]
                .reshape(len(col), int(widths[0]))
            )
    return _as_matrix(col.to_pylist(), dtype=dtype)


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Per-batch exact cosine top-k against the broadcast query matrix."""

    def __init__(self, query_ref, id_col, vec_col, k):
        import ray

        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids, Q = q
        self.Q = _normalize(Q)
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        if k > 0:  # empty blocks short-circuit to a typed empty result
            V = _normalize(_col_matrix(t[self.vec_col]))
            S = V @ self.Q.T  # (batch, n_queries)
            for qi in range(S.shape[1]):
                col = S[:, qi]
                top = np.argpartition(-col, k - 1)[:k]
                out_q.extend([self.qids[qi]] * k)
                out_id.extend(ids[top].tolist())
                out_s.extend(col[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.array(self.qids).type),
                "match_id": pa.array(out_id, t[self.id_col].type),
                "score": pa.array(out_s, pa.float64()),
            }
        )


_TOPK_CACHE: dict = {}
_TOPK_CACHE_CAP = 8


def _batch_topk_cached(t: pa.Table, *, query_ref, id_col, vec_col, k) -> pa.Table:
    """Task-form _BatchTopK: plain map_batches tasks reuse the warm worker
    pool (no actor cold-start per call); the normalized query matrix is built
    once per worker per query set and memoized."""
    key = (
        query_ref.hex() if hasattr(query_ref, "hex") else id(query_ref),
        id_col, vec_col, k,
    )
    fn = _TOPK_CACHE.get(key)
    if fn is None:
        fn = _BatchTopK(query_ref, id_col, vec_col, k)
        if len(_TOPK_CACHE) >= _TOPK_CACHE_CAP:
            _TOPK_CACHE.pop(next(iter(_TOPK_CACHE)))
        _TOPK_CACHE[key] = fn
    return fn(t)


def ann_brute_force(ds, queries: list[tuple], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for each (query_id, vector) in ``queries``.

    Returns a pandas DataFrame (query_id, match_id, score), k rows per query,
    sorted by (query_id, -score, match_id).  The merge is over per-batch
    candidates (num_batches x k rows) — tiny.
    """
    import ray

    qids = [q[0] for q in queries]
    Q = _as_matrix([q[1] for q in queries])
    ref = ray.put((qids, Q))
    cands = ds.map_batches(
        _batch_topk_cached,
        fn_kwargs=dict(query_ref=ref, id_col=id_col, vec_col=vec_col, k=k),
        batch_format="pyarrow",
    ).to_pandas()
    if cands.empty:  # no-neighbors case (e.g. ann_lsh with no bucket hits)
        return pd.DataFrame({"query_id": [], "match_id": [], "score": []})
    cands = cands.sort_values(
        ["query_id", "score", "match_id"], ascending=[True, False, True], kind="stable"
    )
    return cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def kmeans_fit(X: np.ndarray, k: int, iters: int = 12, seed: int = 5) -> np.ndarray:
    """Deterministic Lloyd k-means (numpy, kmeans++-lite seeding) -> (k, dim)
    centroids.  Trains the IVF coarse quantizer on a driver-side sample."""
    rng = np.random.default_rng(seed)
    n = len(X)
    k = min(k, n)
    # seeding: first centroid random, rest = farthest-point heuristic
    cent = [X[int(rng.integers(0, n))]]
    for _ in range(k - 1):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(cent)[None, :, :]) ** 2).sum(-1), axis=1
        )
        cent.append(X[int(np.argmax(d2))])
    C = np.asarray(cent, dtype=np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ann_ivf(
    ds,
    queries: list[tuple],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 3,
    train_sample: int = 4096,
    seed: int = 5,
):
    """IVF ANN: k-means coarse quantizer -> per-cell inverted scan.

    Train on a bounded sample (driver-side k-means — the coarse quantizer is
    tiny state, broadcast to every task), then scan ONLY corpus rows whose
    nearest centroid is among each query's ``n_probe`` closest cells.  The
    standard IVF-Flat recall/cost trade: raise n_probe toward n_cells for
    exactness.  At 100 TB the train sample stays fixed-size and the filter
    pass is one streaming map — nothing materializes the corpus.
    """
    import ray

    n = ds.count()
    frac = min(1.0, train_sample / max(n, 1))
    sample = ds.random_sample(frac, seed=seed).take(train_sample)
    if not sample:
        return ann_brute_force(ds, queries, k=k, id_col=id_col, vec_col=vec_col)
    X = _as_matrix([r[vec_col] for r in sample])
    C = kmeans_fit(_normalize(X), n_cells, seed=seed)
    Cn = _normalize(C)
    Q = _normalize(_as_matrix([q[1] for q in queries]))
    # cosine nearest cells per query (vectors normalized -> dot = cosine)
    probe_cells = np.unique(
        np.argsort(-(Q @ Cn.T), axis=1)[:, : min(n_probe, len(Cn))].ravel()
    )
    cref = ray.put(Cn)
    pref = ray.put(probe_cells)

    def cell_filter(t):
        if t.num_rows == 0:
            return t
        Cn_ = ray.get(cref)
        probe = ray.get(pref)
        V = _normalize(_col_matrix(t[vec_col]))
        cells = (V @ Cn_.T).argmax(axis=1)
        import pyarrow as pa_

        return t.filter(pa_.array(np.isin(cells, probe)))

    filtered = ds.map_batches(cell_filter, batch_format="pyarrow")
    return ann_brute_force(filtered, queries, k=k, id_col=id_col, vec_col=vec_col)


def ann_lsh(
    ds,
    queries: list[tuple],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 5,
    probe_bits: int = 2,
):
    """Bucketed ANN: scan only corpus rows whose hyperplane signature matches
    a query signature (multi-probe: exact bucket + all flips of up to
    ``probe_bits`` signature bits — ``probe_bits=2`` scans
    ``1 + n + n(n-1)/2`` of ``2**n`` buckets, ~14% at n=8).

    Approximate by construction — recall < 1 when true neighbors land in
    distant buckets; raise n_planes for precision, ``probe_bits`` for recall.
    """
    import ray

    qids = [q[0] for q in queries]
    Q = _as_matrix([q[1] for q in queries])
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    def sig(M: np.ndarray) -> np.ndarray:
        s = (M @ planes) > 0
        return (s.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)

    qsig = sig(Q)
    probe: set[int] = set()
    for s in qsig:
        probe.add(int(s))
        for b in range(n_planes):
            probe.add(int(s) ^ (1 << b))
            if probe_bits >= 2:
                for b2 in range(b + 1, n_planes):
                    probe.add(int(s) ^ (1 << b) ^ (1 << b2))
    probe_ref = ray.put(np.fromiter(probe, dtype=np.uint64))

    def bucket_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        P = ray.get(probe_ref)
        V = _col_matrix(t[vec_col])
        keep = np.isin(sig(V), P)
        return t.filter(pa.array(keep))

    filtered = ds.map_batches(bucket_filter, batch_format="pyarrow")
    return ann_brute_force(filtered, queries, k=k, id_col=id_col, vec_col=vec_col)


def pq_train(X: np.ndarray, m: int = 8, ksub: int = 256, iters: int = 12,
             seed: int = 5) -> np.ndarray:
    """Product-quantization codebooks (Jegou, Douze & Schmid, TPAMI 2011):
    split the dim into ``m`` subspaces and k-means each independently.
    Returns ``(m, ksub, dim//m)``.  ``ksub`` is clamped to the sample size
    (can't train 256 centroids from 100 vectors)."""
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ksub = max(2, min(ksub, n))
    dsub = dim // m
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        books[j] = kmeans_fit(X[:, j * dsub:(j + 1) * dsub], ksub,
                              iters=iters, seed=seed + j)
    return books


def pq_encode(V: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8/uint16 codes: per subspace, nearest codebook
    entry by L2 (one matmul per subspace, no per-row loop)."""
    m, ksub, dsub = books.shape
    n = V.shape[0]
    dt = np.uint8 if ksub <= 256 else np.uint16
    codes = np.empty((n, m), dtype=dt)
    for j in range(m):
        sub = V[:, j * dsub:(j + 1) * dsub]
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per argmin
        d = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)
        codes[:, j] = d.argmin(axis=1).astype(dt)
    return codes


def ann_pq(
    ds,
    queries: list[tuple],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    ksub: int = 32,
    train_sample: int = 4096,
    seed: int = 5,
):
    """Product-quantization ANN with asymmetric-distance scanning (ADC;
    Jegou et al. 2011) — the memory-bound scale path: vectors are encoded
    ONCE into ``m``-byte codes (e.g. 64 float64 dims -> 16 bytes, 32x), and
    the search scans only the code table with per-query lookup tables.

    Stages: (1) driver-side codebook training on a bounded sample (tiny
    state, broadcast); (2) one streaming encode pass -> materialized codes
    Dataset (the 32x-smaller artifact is the point — at 100 TB of vectors
    the code table is ~3 TB and rescans stay cheap); (3) code-only ADC scan:
    approx ||q - x||^2 = sum_j LUT_j[code_j(x)], one fancy-index + sum per
    batch, per-batch top-k, output-sized driver merge.  Approximate by
    construction (quantization error); raise ``m``/``ksub`` for precision.

    Returns pandas (query_id, match_id, score) like :func:`ann_brute_force`,
    with ``score`` = the ADC cosine approximation ``1 - adc_l2sq / 2`` on
    unit vectors.
    """
    import ray

    n = ds.count()
    if n == 0:
        return pd.DataFrame({"query_id": [], "match_id": [], "score": []})
    frac = min(1.0, train_sample / max(n, 1))
    sample = ds.random_sample(frac, seed=seed).take(train_sample)
    if not sample:
        sample = ds.take(min(n, train_sample))
    X = _normalize(_as_matrix([r[vec_col] for r in sample]))
    books = pq_train(X, m=m, ksub=ksub, seed=seed)
    bref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "code": pa.array([], pa.list_(pa.uint16()))})
        B = ray.get(bref)
        V = _normalize(_col_matrix(t[vec_col]))
        codes = pq_encode(V, B).astype(np.uint16)
        return pa.table({
            id_col: t[id_col],
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.ravel(), pa.uint16()), codes.shape[1]),
        })

    codes_ds = ds.map_batches(encode, batch_format="pyarrow").materialize()

    qids = [q[0] for q in queries]
    Q = _normalize(_as_matrix([q[1] for q in queries]))
    mm, ksub_t, dsub = books.shape
    # per-query ADC lookup tables: LUT[q, j, c] = ||q_sub - book[j, c]||^2
    lut = np.empty((len(qids), mm, ksub_t))
    for j in range(mm):
        sub = Q[:, j * dsub:(j + 1) * dsub]
        lut[:, j, :] = (
            (sub ** 2).sum(axis=1, keepdims=True)
            - 2.0 * (sub @ books[j].T)
            + (books[j] ** 2).sum(axis=1)
        )
    lref = ray.put((qids, lut))

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.array(qids).type),
                             "match_id": pa.array([], t[id_col].type),
                             "score": pa.array([], pa.float64())})
        qids_, lut_ = ray.get(lref)
        col = t["code"].combine_chunks()
        codes = col.values.to_numpy(zero_copy_only=False).reshape(
            t.num_rows, lut_.shape[1])
        out_q: list = []
        out_id: list = []
        out_s: list = []
        ids = t[id_col].to_numpy(zero_copy_only=False)
        jj = np.arange(lut_.shape[1])
        for qi in range(len(qids_)):
            adc = lut_[qi][jj, codes].sum(axis=1)  # (n_batch,)
            kk = min(k, len(adc))
            top = np.argpartition(adc, kk - 1)[:kk]
            out_q.extend([qids_[qi]] * kk)
            out_id.extend(ids[top].tolist())
            out_s.extend((1.0 - adc[top] / 2.0).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.array(qids_).type),
                         "match_id": pa.array(out_id, t[id_col].type),
                         "score": pa.array(out_s, pa.float64())})

    parts = codes_ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"query_id": [], "match_id": [], "score": []})
    parts = parts.sort_values(["query_id", "score", "match_id"],
                              ascending=[True, False, True], kind="stable")
    return (parts.groupby("query_id", sort=False).head(k)
            .reset_index(drop=True))
