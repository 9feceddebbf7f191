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


def _doc_nll_sums(t: pa.Table, nll: np.ndarray, text_col: str) -> np.ndarray:
    """Per-document TOTAL -log2 P over interior bigrams (not per-byte)."""
    arr, lens = _batch_bytes(t, text_col)
    pairs, valid = _pair_ids(arr, lens)
    nlp = np.zeros(len(pairs), dtype=np.float64)
    nlp[valid] = nll[pairs[valid]]
    cs = np.concatenate([[0.0], np.cumsum(nlp)])
    ends = np.cumsum(lens)
    starts = ends - lens
    cap = len(cs) - 1
    lo = np.minimum(starts, cap)
    hi = np.minimum(np.maximum(starts, ends - 1), cap)
    return cs[hi] - cs[lo]


class _DsirWeigher:
    def __init__(self, refs, text_col, out_col):
        import ray

        self.nll_target, self.nll_raw = (
            ray.get(r) if isinstance(r, ray.ObjectRef) else r for r in refs)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        lw = (_doc_nll_sums(t, self.nll_raw, self.text_col)
              - _doc_nll_sums(t, self.nll_target, self.text_col))
        return t.append_column(self.out_col, pa.array(lw, pa.float64()))


_DSIR_CACHE: dict = {}


def _dsir_cached(t: pa.Table, *, refs, text_col, out_col) -> pa.Table:
    key = (tuple(r.hex() if hasattr(r, "hex") else id(r) for r in refs),
           text_col, out_col)
    fn = _DSIR_CACHE.get(key)
    if fn is None:
        fn = _DsirWeigher(refs, text_col, out_col)
        if len(_DSIR_CACHE) >= 8:
            _DSIR_CACHE.pop(next(iter(_DSIR_CACHE)))
        _DSIR_CACHE[key] = fn
    return fn(t)


def dsir_log_weights(raw_ds, target_ds, text_col: str = "text",
                     add_k: float = 0.5, out_col: str = "log2_weight"):
    """DSIR importance log-weights (Xie et al., NeurIPS 2023), bigram form.

    Fits the byte-bigram model on the TARGET corpus and on the RAW corpus,
    then appends ``log2 w(x) = log2 P_target(x) - log2 P_raw(x)`` (total over
    the document's interior bigrams) to every raw row.  Documents that look
    more like the target than like the average raw document get positive
    log-weight.  Both 512 KB model tables broadcast once.
    """
    import ray

    nll_t = bigram_lm_fit(target_ds, text_col=text_col, add_k=add_k)
    nll_r = bigram_lm_fit(raw_ds, text_col=text_col, add_k=add_k)
    refs = (ray.put(nll_t), ray.put(nll_r))
    return raw_ds.map_batches(
        _dsir_cached,
        fn_kwargs=dict(refs=refs, text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
    )


def gumbel_topk_sample(ds, logw_col: str, key_col: str, k: int):
    """Sample ``k`` rows WITHOUT replacement proportional to ``2**logw``.

    Gumbel-top-k (Kool et al., ICML 2019): the k largest
    ``logw + Gumbel(u)`` are such a sample; working in log space never
    exponentiates the weight, so DSIR's total-likelihood-ratio weights
    (hundreds of bits for long documents) can't overflow.  Uniforms derive
    from md5 of the row key — deterministic across runs, engines and
    partitionings — and the per-batch top-k keeps at most k rows per block
    out of the final sort via the shared ``corpus._deterministic_topk``
    skeleton (one md5-uniform definition, one top-k pipeline — shared with
    :func:`~.corpus.weighted_sample` so a tweak to either hits both).
    ``key_col`` values must be unique (they seed the uniforms and break
    ties).
    """
    from .corpus import _deterministic_topk, _md5_u32

    ln2 = np.log(2.0)

    def batch_scores(t: pa.Table):
        lw = pc.cast(_col(t, logw_col), pa.float64()).to_numpy(zero_copy_only=False)
        valid = np.isfinite(lw)
        if not valid.all():
            t = t.filter(pa.array(valid))
            lw = lw[valid]
        if t.num_rows == 0:
            return t, np.zeros(0, np.float64)
        u = (_md5_u32(_col(t, key_col).to_pylist()).astype(np.float64)
             + 0.5) / 4294967296.0
        return t, lw * ln2 - np.log(-np.log(u))

    return _deterministic_topk(ds, key_col, k, batch_scores)
