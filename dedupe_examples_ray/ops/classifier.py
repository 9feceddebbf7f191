"""Trainable quality classifier — hashed bag-of-words logistic regression.

The fastText-style filter a web-corpus pipeline trains to separate "clean"
from "spammy/boilerplate" documents (public recipe: CCNet's fastText quality
filter, GPT-3's WebText-vs-CommonCrawl LR filter).  Features are the hashing
trick (token -> ``stable_hash % dim``), so there is no vocabulary to build,
ship, or synchronize — any worker featurizes any batch independently.

Training is full-batch gradient descent with Adam, tiered exactly like
``embed_cluster.kmeans_distributed``:

- **driver tier** (featurized matrix under ``_DRIVER_LR_BUDGET`` bytes): one
  streaming featurize pass collapses each batch to its dense (n, dim) count
  matrix; the concatenated matrix iterates locally (a Ray pass costs ~0.5 s
  scheduling — pure overhead at small n).
- **streaming tier**: every iteration broadcasts ``w`` once (``ray.put``)
  and runs ONE ``map_batches`` pass in which each batch emits a single
  partial-gradient row ``(n, X^T(p - y), sum(p - y), loss)`` — O(dim)
  doubles per batch, summed by a grouped combine; the driver holds one
  (dim+1) vector and never sees a row.

Both tiers run the same update rule on the same total gradient, so they
agree to float-sum-order tolerance (parity-tested).  The gradient of
l2-regularized log-loss is exact — no mini-batch noise, deterministic for a
fixed input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..pairs import stable_hash
from .textstats import _tokenize_flat

_DRIVER_LR_BUDGET = 128 << 20  # bytes of featurized matrix


def _featurize(t: pa.Table, text_col: str, dim: int) -> np.ndarray:
    """Dense (n, dim) hashed token-count matrix, rows L2-normalized (zero
    rows stay zero).  Vectorized: one Arrow split + one hash + one
    ``np.add.at`` scatter."""
    n = t.num_rows
    M = np.zeros((n, dim), np.float64)
    if n:
        parents, flat = _tokenize_flat(t, text_col)
        if len(flat):
            feats = (stable_hash(flat) % np.uint64(dim)).astype(np.int64)
            np.add.at(M, (parents, feats), 1.0)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        np.divide(M, norms, out=M, where=norms > 0)
    return M


def _grad(M: np.ndarray, y: np.ndarray, w: np.ndarray, b: float):
    """(grad_w, grad_b, loss_sum) of unregularized log-loss on one chunk."""
    z = M @ w + b
    p = 1.0 / (1.0 + np.exp(-z))
    r = p - y
    eps = 1e-12
    loss = -np.sum(y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps))
    return M.T @ r, float(r.sum()), float(loss)


def _adam_iterate(total_grad, n: int, dim: int, iters: int, lr: float,
                  l2: float):
    """Shared optimizer loop: ``total_grad(w, b) -> (gw, gb, loss)`` over the
    WHOLE dataset; returns (w, b, losses)."""
    w = np.zeros(dim)
    b = 0.0
    m = np.zeros(dim + 1)
    v = np.zeros(dim + 1)
    b1, b2, eps = 0.9, 0.999, 1e-8
    losses = []
    for it in range(1, iters + 1):
        gw, gb, loss = total_grad(w, b)
        g = np.concatenate((gw / n + l2 * w, [gb / n]))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** it)
        vh = v / (1 - b2 ** it)
        step = lr * mh / (np.sqrt(vh) + eps)
        w = w - step[:-1]
        b = b - step[-1]
        losses.append(round(loss / n + 0.5 * l2 * float(w @ w), 6))
    return w, b, losses


def logreg_fit(ds, text_col: str = "text", label_col: str = "label",
               dim: int = 4096, iters: int = 150, lr: float = 0.3,
               l2: float = 1e-4, driver_budget: int | None = None,
               combine_buckets: int = 32, force_tier: str | None = None):
    """Fit the hashed-BoW logistic classifier (see module docstring).
    ``label_col`` must be 0/1.  Returns ``{w, b, dim, n_rows, losses,
    tier}``."""
    import ray

    budget = _DRIVER_LR_BUDGET if driver_budget is None else driver_budget
    proj = ds.select_columns([text_col, label_col]).materialize()
    n_rows = proj.count()
    if n_rows == 0:
        raise ValueError("logreg_fit needs at least 1 row")
    est_bytes = n_rows * dim * 8
    tier = force_tier or ("driver" if est_bytes <= budget else "stream")

    if tier == "driver":
        mats, ys = [], []
        for t in proj.iter_batches(batch_format="pyarrow"):
            mats.append(_featurize(t, text_col, dim))
            ys.append(pc.cast(t[label_col], pa.float64()).to_numpy(
                zero_copy_only=False))
        M = np.concatenate(mats) if mats else np.zeros((0, dim))
        y = np.concatenate(ys) if ys else np.zeros(0)

        def total_grad(w, b):
            return _grad(M, y, w, b)

        w, b, losses = _adam_iterate(total_grad, n_rows, dim, iters, lr, l2)
        return {"w": w, "b": b, "dim": dim, "n_rows": n_rows,
                "losses": losses, "tier": tier}

    def total_grad(w, b):
        import zlib

        ref = ray.put((w, b))

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"n": pa.array([], pa.int64()),
                                 "gw": pa.array([], pa.list_(pa.float64())),
                                 "gb": pa.array([], pa.float64()),
                                 "loss": pa.array([], pa.float64()),
                                 "bkt": pa.array([], pa.int64())})
            w_, b_ = ray.get(ref)
            M = _featurize(t, text_col, dim)
            yb = pc.cast(t[label_col], pa.float64()).to_numpy(
                zero_copy_only=False)
            gw, gb, loss = _grad(M, yb, w_, b_)
            bkt = zlib.crc32(np.ascontiguousarray(yb[:8]).tobytes()) % combine_buckets
            return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                             "gw": pa.array([gw]),
                             "gb": pa.array([gb], pa.float64()),
                             "loss": pa.array([loss], pa.float64()),
                             "bkt": pa.array([bkt], pa.int64())})

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "n": [int(df["n"].sum())],
                "gw": [np.sum(np.stack(df["gw"].to_numpy()), axis=0)],
                "gb": [float(df["gb"].sum())],
                "loss": [float(df["loss"].sum())]})

        parts = (proj.map_batches(partial, batch_format="pyarrow")
                 .groupby("bkt").map_groups(combine, batch_format="pandas")
                 .to_pandas())
        gw = np.sum(np.stack(parts["gw"].to_numpy()), axis=0)
        return gw, float(parts["gb"].sum()), float(parts["loss"].sum())

    w, b, losses = _adam_iterate(total_grad, n_rows, dim, iters, lr, l2)
    return {"w": w, "b": b, "dim": dim, "n_rows": n_rows,
            "losses": losses, "tier": tier}


def logreg_predict(ds, model: dict, text_col: str = "text",
                   out_col: str = "p_positive"):
    """Append the classifier probability — weights broadcast once via
    ``ray.put``, one matmul per batch, no shuffle."""
    import ray

    dim = int(model["dim"])
    ref = ray.put((np.asarray(model["w"], np.float64), float(model["b"])))

    def score(t: pa.Table) -> pa.Table:
        w, b = ray.get(ref)
        M = _featurize(t, text_col, dim)
        p = 1.0 / (1.0 + np.exp(-(M @ w + b)))
        return t.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")
