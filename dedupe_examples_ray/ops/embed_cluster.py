"""Distributed embedding clustering + SemDeDup-style semantic dedup.

``kmeans_distributed`` is full-corpus Lloyd's over a Ray ``Dataset``: every
iteration is ONE streaming ``map_batches`` pass emitting k partial
(count, vector-sum) rows per batch, merged on the driver (k x dim doubles —
tiny), with the centroid matrix broadcast once per iteration via ``ray.put``.
No shuffle, no corpus materialization; per-iteration cost is one read of the
dataset regardless of scale.  Compare ``ann.kmeans_fit``, the driver-side
sample variant that seeds the IVF coarse quantizer.

``semantic_dedup`` is the SemDeDup recipe (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
k-means the embedding space, then inside every cluster mark cosine-similar
pairs and keep one representative per connected component.  Within-cluster
verify is the same salted, pair-capped group kernel as
``embedding_cosine_dedup`` — hot clusters are sub-bucketed at ``max_bucket``
members so no group task is ever quadratic in the cluster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..scale import clean_arrow
from .ann import _col_matrix, _normalize, kmeans_fit

_CENTROID_CACHE: dict = {}
_DRIVER_KMEANS_BUDGET = 128 << 20  # bytes; larger projections iterate streaming


def _get_centroids(ref):
    import ray

    key = ref.hex()
    C = _CENTROID_CACHE.get(key)
    if C is None:
        C = ray.get(ref)
        if len(_CENTROID_CACHE) >= 8:
            _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
        _CENTROID_CACHE[key] = C
    return C


def _assign_ids(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_j ||x - c_j||^2 via the matmul expansion (never materializes
    the (n, k, dim) difference tensor)."""
    d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    return d.argmin(axis=1)


def _partial_sums(t: pa.Table, *, cent_ref, vec_col: str) -> pa.Table:
    C = _get_centroids(cent_ref)
    k, dim = C.shape
    if t.num_rows == 0:
        return pa.table({"cid": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "vecsum": pa.array([], pa.list_(pa.float64()))})
    X = _col_matrix(t[vec_col])
    a = _assign_ids(X, C)
    n = np.bincount(a, minlength=k)
    sums = np.zeros((k, dim))
    np.add.at(sums, a, X)
    nz = np.flatnonzero(n)
    return pa.table({
        "cid": pa.array(nz.astype(np.int64)),
        "n": pa.array(n[nz].astype(np.int64)),
        "vecsum": pa.array(list(sums[nz])),
    })


def kmeans_distributed(ds, vec_col: str = "embedding", k: int = 16,
                       iters: int = 10, tol: float = 1e-4, seed: int = 5,
                       sample_size: int = 4096):
    """Full-corpus Lloyd's k-means.  Returns ``(centroids, info)`` where
    ``info`` carries per-iteration inertia-free diagnostics (max centroid
    shift, cluster sizes from the final pass).

    Seeding is ``ann.kmeans_fit`` (farthest-point) on the dataset's first
    ``sample_size`` rows — deterministic for a fixed input.  Empty clusters
    keep their previous centroid.

    The vector projection is materialized ONCE before iterating — an
    iterative consumer re-executes the whole upstream plan (the parquet
    read included) on every pass otherwise; the object store spills the
    blocks at scale, so this amortizes I/O without a driver copy.

    Tiered like the hydration paths: a projection under
    ``_DRIVER_KMEANS_BUDGET`` bytes is pulled to the driver once and
    iterated locally (a Ray pass costs ~0.5 s of scheduling per iteration —
    pure overhead on small inputs); anything larger streams, one
    ``map_batches`` pass per iteration, never holding the corpus anywhere.
    Both tiers run the same update rule (parity-tested).
    """
    import ray

    ds = ds.select_columns([vec_col]).materialize()
    if (ds.size_bytes() or _DRIVER_KMEANS_BUDGET + 1) <= _DRIVER_KMEANS_BUDGET:
        X = _col_matrix(
            pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])[vec_col]
        )
        C = kmeans_fit(X[:sample_size], k, seed=seed)
        k = len(C)
        shifts, sizes = [], np.zeros(k, dtype=np.int64)
        for _ in range(iters):
            a = _assign_ids(X, C)
            n = np.bincount(a, minlength=k)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            nz = n > 0
            new_C = C.copy()
            new_C[nz] = sums[nz] / n[nz, None]
            shift = float(np.max(np.linalg.norm(new_C - C, axis=1))) if k else 0.0
            shifts.append(round(shift, 6))
            C, sizes = new_C, n
            if shift < tol:
                break
        return C, {"iters_run": len(shifts), "shifts": shifts,
                   "cluster_sizes": sizes.tolist()}
    sample = _col_matrix(
        pa.concat_tables(
            [ray.get(r) for r in ds.limit(sample_size).to_arrow_refs()]
        )[vec_col]
    )
    C = kmeans_fit(sample, k, seed=seed)
    k = len(C)  # kmeans_fit clamps k to the sample size
    shifts, sizes = [], np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(C)
        part = ds.map_batches(_partial_sums, batch_format="pyarrow",
                              fn_kwargs=dict(cent_ref=ref, vec_col=vec_col))
        n = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(C)
        for b in part.iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows == 0:
                continue
            cid = b["cid"].to_numpy(zero_copy_only=False)
            n[cid] += b["n"].to_numpy(zero_copy_only=False)
            sums[cid] += _col_matrix(b["vecsum"])
        nz = n > 0
        new_C = C.copy()
        new_C[nz] = sums[nz] / n[nz, None]
        shift = float(np.max(np.linalg.norm(new_C - C, axis=1))) if k else 0.0
        shifts.append(round(shift, 6))
        C, sizes = new_C, n
        if shift < tol:
            break
    return C, {"iters_run": len(shifts), "shifts": shifts,
               "cluster_sizes": sizes.tolist()}


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  out_col: str = "cluster_id"):
    """Append the nearest-centroid id per row (broadcast matrix, one
    streaming pass)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        a = _assign_ids(_col_matrix(t[vec_col]), _get_centroids(ref))
        return t.append_column(out_col, pa.array(a.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")


def semantic_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                   k: int = 16, tau: float = 0.95, iters: int = 8,
                   max_bucket: int = 2000, seed: int = 5,
                   workdir: str | None = None, input_token: str | None = None):
    """SemDeDup: k-means partition -> within-cluster cosine >= tau ->
    connected components -> ``(id, keep_id)`` assignment (keep = min id per
    component, every row keeps a keep_id — singletons map to themselves).

    The k-means stage replaces ``embedding_cosine_dedup``'s random
    hyperplanes with data-adapted cells, so near-dup pairs co-locate with
    higher probability at equal candidate volume; the verify kernel and its
    hot-cluster salting are shared logic (see that docstring for the cap
    semantics).
    """
    from ..pairs import dedup_pairs, stable_hash
    from .dedup import _assignment

    slim = ds.select_columns([id_col, vec_col]).materialize()

    def _tagged():
        # inside the stage closure: a checkpoint replay must not re-run the
        # k-means iterations either
        C, _ = kmeans_distributed(
            slim, vec_col=vec_col, k=k, iters=iters, seed=seed
        )
        return kmeans_assign(slim, C, vec_col=vec_col)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        u = df.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = u[id_col].to_numpy()
        n = len(ids)
        if n >= 2:
            groups = [np.arange(n)]
            if n > max_bucket:  # salt the hot cluster into sub-buckets
                parts = -(-n // max_bucket)
                salt = stable_hash(ids) % parts
                groups = [np.flatnonzero(salt == sv) for sv in range(parts)]
            for g in groups:
                if len(g) < 2:
                    continue
                V = _normalize(_col_matrix(pa.array(list(u[vec_col].iloc[g]))))
                S = V @ V.T
                ia, ib = np.triu_indices(len(g), k=1)
                keepm = S[ia, ib] >= tau
                frames.append(pd.DataFrame({
                    "id_a": ids[g[ia[keepm]]],
                    "id_b": ids[g[ib[keepm]]],
                    "score": S[ia, ib][keepm],
                }))
        if not frames:
            return clean_arrow(
                pd.DataFrame({"id_a": pd.Series([], dtype=df[id_col].dtype),
                              "id_b": pd.Series([], dtype=df[id_col].dtype),
                              "score": pd.Series([], dtype=np.float64)}))
        return clean_arrow(pd.concat(frames, ignore_index=True))

    def _pairs_stage():
        pairs = _tagged().groupby("cluster_id").map_groups(
            verify, batch_format="pandas"
        )
        return dedup_pairs(pairs)

    if workdir is not None:
        # checkpoint the kmeans->cell-verify pair set (north_rule resume);
        # the assignment pass recomputes cheaply from the committed pairs
        from ..checkpoint import run_stage

        fp = (
            f"sem-k{k}-t{tau}-i{iters}-mb{max_bucket}-s{seed}-n{slim.count()}"
            + (f"-{input_token}" if input_token else "")
        )
        pairs = run_stage("sem_pairs", _pairs_stage, workdir, fp)
    else:
        pairs = _pairs_stage()
    return _assignment(ds.select_columns([id_col]), id_col, pairs)


# ------------------------------------------------------------------ PCA
def pca_fit(ds, vec_col: str = "embedding", n_components: int = 8,
            combine_buckets: int = 32):
    """Distributed exact PCA over an embedding column — the covariance-moment
    combiner: every batch collapses to ONE partial row ``(n, sum_x,
    flattened X^T X)`` (O(dim^2) doubles, independent of batch size), partials
    pre-combine in ``combine_buckets`` grouped tasks, and the driver
    eigendecomposes the (dim, dim) covariance — it never sees a row.

    Exact (not randomized/streaming-approximate): the moments determine the
    covariance exactly, so the result equals single-machine PCA on the
    concatenated data (pytest-verified against ``numpy.linalg.eigh``).

    Sign convention: each component's largest-|loading| coordinate is made
    positive (deterministic across runs/partitionings).

    Returns a dict: ``components`` (n_components, dim) row-orthonormal,
    ``mean`` (dim,), ``explained_variance`` (descending, sample covariance
    eigenvalues), ``explained_variance_ratio``, ``n_rows``.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.float64())),
                             "xtx": pa.array([], pa.list_(pa.float64())),
                             "bkt": pa.array([], pa.int64())})
        import zlib

        X = _col_matrix(t[vec_col])
        # content-derived bucket: equal-sized batches must still spread
        # across the combine tasks
        bkt = zlib.crc32(X[0].tobytes()) % combine_buckets
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(0)]),
            "xtx": pa.array([(X.T @ X).ravel()]),
            "bkt": pa.array([bkt], pa.int64()),
        })

    def combine(df: pd.DataFrame) -> pa.Table:
        n = int(df["n"].sum())
        sx = np.sum(np.stack(df["sx"].to_numpy()), axis=0)
        xtx = np.sum(np.stack(df["xtx"].to_numpy()), axis=0)
        return clean_arrow(pd.DataFrame({"n": [n], "sx": [sx], "xtx": [xtx]}))

    parts = (ds.select_columns([vec_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("bkt").map_groups(combine, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0 or int(parts["n"].sum()) < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    n = int(parts["n"].sum())
    sx = np.sum(np.stack(parts["sx"].to_numpy()), axis=0)
    xtx = np.sum(np.stack(parts["xtx"].to_numpy()), axis=0)
    dim = len(sx)
    mean = sx / n
    cov = (xtx.reshape(dim, dim) - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T               # (n_components, dim)
    ev = np.maximum(evals[order], 0.0)
    # deterministic sign: largest-|loading| coordinate positive
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    total_var = max(float(np.trace(cov.reshape(dim, dim))), 1e-300)
    return {"components": comps, "mean": mean, "explained_variance": ev,
            "explained_variance_ratio": ev / total_var, "n_rows": n}


def pca_transform(ds, model: dict, vec_col: str = "embedding",
                  out_col: str = "pca", keep_vec: bool = False):
    """Project the embedding column onto a fitted PCA basis: ``(x - mean) @
    components.T`` per batch, the (n_components, dim) basis broadcast once
    via ``ray.put`` and matmul'd per batch — no shuffle."""
    import ray

    ref = ray.put((np.asarray(model["mean"], np.float64),
                   np.asarray(model["components"], np.float64)))

    def project(t: pa.Table) -> pa.Table:
        mean, W = _get_centroids(ref)  # same tiny per-worker cache
        if t.num_rows == 0:
            out = pa.array([], pa.list_(pa.float64()))
        else:
            X = _col_matrix(t[vec_col])
            out = pa.array(list((X - mean) @ W.T))
        t = t.append_column(out_col, out)
        return t if keep_vec else t.drop_columns([vec_col])

    return ds.map_batches(project, batch_format="pyarrow")
