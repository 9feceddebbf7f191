"""Byte-bigram language-model perplexity scoring (CCNet-style quality signal).

CCNet (Wenzek et al., LREC 2020) ranks Common-Crawl documents by the
perplexity of a small LM trained on clean text; documents far from the
model's distribution (boilerplate, gibberish, wrong language) score high and
are dropped.  This module is the same signal with a byte-bigram model — no
external tokenizer or model artifacts, fully vectorized:

- :func:`bigram_lm_fit` — one combiner-shaped pass over the corpus: each
  batch counts its interior byte bigrams into a sparse (pair, n) table
  (``np.bincount`` over ``b0*256+b1``), a tiny ``groupby("pair").sum``
  merges them, and the driver folds the ≤65,536 rows into an add-k-smoothed
  conditional log-prob table P(b1|b0).  The table is 64K float64 = 512 KB —
  broadcast once with ``ray.put``, read zero-copy in every score task.
- :func:`bigram_lm_score` — per-batch scoring: all texts in a batch are
  concatenated once, bigram ids come from two shifted views of the byte
  buffer, per-document sums from a cumulative-sum difference at the document
  offsets (pairs straddling document boundaries masked out).  No Python loop
  over rows, no per-document allocation.

Output is ``bits_per_byte`` (mean -log2 P per interior bigram); perplexity
= 2**bits_per_byte.  Deterministic given the corpus, so usable as a filter
threshold inside :func:`~dedupe_examples_ray.ops.corpus.clean_corpus`-style
funnels.  Scale shape: fit shuffles at most 65,536 rows per batch (in
practice a few hundred); score is embarrassingly parallel.

Reference parity note: the reference pipeline (dedupe-examples) has no LM
scoring; this is part of the training-data operator family the engine adds
(SURVEY §2.13).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_V = 256  # byte alphabet


def _col(t: pa.Table, name: str):
    arr = t[name]
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _batch_bytes(t: pa.Table, text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated utf-8 byte array, per-doc byte lengths) for a batch."""
    s = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
    texts = s.to_pylist()
    blob = "".join(texts).encode("utf-8", "surrogatepass")
    lens = np.fromiter((len(x.encode("utf-8", "surrogatepass")) for x in texts),
                       dtype=np.int64, count=len(texts))
    return np.frombuffer(blob, dtype=np.uint8), lens


def _pair_ids(arr: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bigram ids b0*256+b1 for every adjacent byte pair, validity mask
    excluding pairs that straddle a document boundary)."""
    if len(arr) < 2:
        return np.empty(0, np.int32), np.empty(0, bool)
    pairs = arr[:-1].astype(np.int32) * _V + arr[1:]
    valid = np.ones(len(pairs), dtype=bool)
    ends = np.cumsum(lens)
    # a pair at position p spans bytes (p, p+1); p = end-1 crosses documents
    last = ends[ends > 0] - 1
    valid[last[last < len(pairs)]] = False
    return pairs, valid


def bigram_lm_fit(ds, text_col: str = "text", add_k: float = 0.5) -> np.ndarray:
    """Fit the byte-bigram LM; returns the (256*256,) float64 table of
    -log2 P(b1|b0) with add-``add_k`` smoothing."""

    def count_batch(t: pa.Table) -> pa.Table:
        arr, lens = _batch_bytes(t, text_col)
        pairs, valid = _pair_ids(arr, lens)
        counts = np.bincount(pairs[valid], minlength=_V * _V)
        nz = np.nonzero(counts)[0]
        return pa.table({"pair": pa.array(nz.astype(np.int32)),
                         "n": pa.array(counts[nz], pa.int64())})

    merged = (ds.select_columns([text_col])
              .map_batches(count_batch, batch_format="pyarrow")
              .groupby("pair").sum("n").to_pandas())
    counts = np.zeros(_V * _V, dtype=np.float64)
    if len(merged):
        agg_col = [c for c in merged.columns if c != "pair"][0]
        counts[merged["pair"].to_numpy()] = merged[agg_col].to_numpy()
    C = counts.reshape(_V, _V) + float(add_k)
    nll = -np.log2(C / C.sum(axis=1, keepdims=True))
    return nll.reshape(_V * _V)


class _BigramScorer:
    """Stateful scoring: fetches the broadcast table once per actor."""

    def __init__(self, table_ref, text_col: str, out_col: str):
        import ray

        self.nll = (ray.get(table_ref)
                    if isinstance(table_ref, ray.ObjectRef) else table_ref)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        arr, lens = _batch_bytes(t, self.text_col)
        pairs, valid = _pair_ids(arr, lens)
        nlp = np.zeros(len(pairs), dtype=np.float64)
        nlp[valid] = self.nll[pairs[valid]]
        cs = np.concatenate([[0.0], np.cumsum(nlp)])
        ends = np.cumsum(lens)
        starts = ends - lens
        cap = len(cs) - 1  # a trailing empty doc has starts == len(cs)
        lo = np.minimum(starts, cap)
        hi = np.minimum(np.maximum(starts, ends - 1), cap)  # L-1 pairs per doc
        sums = cs[hi] - cs[lo]
        n_pairs = np.maximum(lens - 1, 1)
        bpb = sums / n_pairs
        return t.append_column(self.out_col, pa.array(bpb, pa.float64()))


_SCORER_CACHE: dict = {}


def _score_cached(t: pa.Table, *, table_ref, text_col, out_col) -> pa.Table:
    key = (table_ref.hex() if hasattr(table_ref, "hex") else id(table_ref),
           text_col, out_col)
    fn = _SCORER_CACHE.get(key)
    if fn is None:
        fn = _BigramScorer(table_ref, text_col, out_col)
        if len(_SCORER_CACHE) >= 8:
            _SCORER_CACHE.pop(next(iter(_SCORER_CACHE)))
        _SCORER_CACHE[key] = fn
    return fn(t)


def bigram_lm_score(ds, nll_table: np.ndarray, text_col: str = "text",
                    out_col: str = "bits_per_byte"):
    """Append per-document ``bits_per_byte`` under the fitted model.

    The 512 KB table travels by ``ray.put`` once; warm-pool tasks memoize it
    per worker (same pattern as the broadcast-join kernels)."""
    import ray

    ref = ray.put(np.ascontiguousarray(nll_table, dtype=np.float64))
    return ds.map_batches(
        _score_cached,
        fn_kwargs=dict(table_ref=ref, text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
    )


def lm_perplexity(ds, text_col: str = "text", add_k: float = 0.5,
                  out_col: str = "bits_per_byte"):
    """Two-pass corpus-self-fit perplexity: fit on ``ds``, score ``ds``.
    CCNet fits on a CLEAN reference corpus instead — pass that dataset to
    :func:`bigram_lm_fit` and this one to :func:`bigram_lm_score` for the
    real filter; self-fit still ranks outliers within a corpus."""
    return bigram_lm_score(ds, bigram_lm_fit(ds, text_col, add_k),
                           text_col=text_col, out_col=out_col)
