"""Sequence packing — assign documents to fixed token-budget training shards.

The operator a training-data pipeline runs LAST: after dedup/cleaning, docs
are packed into shards of ~``budget`` tokens each for the tokenizer/loader.

Two variants with different contracts:

- :func:`pack_sequences` — deterministic OFFSET BINNING (the GPT-style
  concat-then-chunk layout): docs are laid out in ``id_col`` order into one
  global token stream and a doc's shard is ``start_offset // budget``.
  Exactly SQL-expressible (``SUM(...) OVER (ORDER BY id ROWS UNBOUNDED
  PRECEDING AND 1 PRECEDING)``), so it carries a DuckDB oracle.  Shard
  token-sums vary by up to one document around ``budget`` (a doc can straddle
  a boundary — the loader consuming the stream handles the split).
- :func:`pack_sequences_greedy` — per-partition FIRST-FIT-DECREASING bin
  packing: no multi-doc shard ever exceeds ``budget`` (a single doc larger
  than ``budget`` gets its own shard).  Not SQL-expressible (the fit decision
  is sequential); verified by invariants instead.

Scale shape (both): token counting is one vectorized pass; offset binning
does a two-pass exact global prefix sum (per-range token totals -> tiny
driver prefix -> per-range local cumsum), the same pattern as
``windows.global_rank`` — the driver holds O(num_ranges) numbers, never rows.
Greedy packs each hash partition independently (shard ids are
partition-scoped), so it needs no global exchange at all.

Reference for the shapes: T5 / GPT-2 pack-and-chunk data layout (public
descriptions); Johnson 1973 for FFD's 11/9*OPT+1 bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _with_tokens(ds, text_col: str, token_col: str | None):
    """Append ``n_tokens`` = whitespace-split segment count (mirrors SQL
    ``len(string_split(text, ' '))``; NULL text -> 0) unless the caller
    already has a token column."""
    if token_col is not None:
        return ds, token_col

    def fn(t: pa.Table) -> pa.Table:
        arr = t[text_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        null = pc.is_null(arr)
        splits = pc.split_pattern(pc.fill_null(pc.cast(arr, pa.string()), ""), " ")
        n = pc.cast(pc.list_value_length(splits), pa.int64())
        n = pc.if_else(null, pa.scalar(0, pa.int64()), n)
        return t.append_column("n_tokens", n)

    return ds.map_batches(fn, batch_format="pyarrow"), "n_tokens"


def pack_sequences(ds, id_col: str = "doc_id", text_col: str = "text",
                   token_col: str | None = None, budget: int = 2048,
                   num_ranges: int = 64):
    """Offset-binning sequence packing (see module docstring).  Requires a
    NUMERIC, unique ``id_col`` (the layout order).  Output: ``(id_col,
    n_tokens, start_offset, shard)`` — ``start_offset`` is the doc's first
    token's position in the global stream, ``shard = start_offset //
    budget``."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    ds, tok = _with_tokens(ds, text_col, token_col)
    proj = ds.select_columns([id_col, tok])

    # pass 1a: id range boundaries (equal ids never straddle; ids unique)
    def minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        v = pc.cast(t[id_col], pa.float64()).to_numpy(zero_copy_only=False)
        return pa.table({"lo": [float(np.min(v))], "hi": [float(np.max(v))]})

    mm = proj.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if len(mm) == 0:
        return proj  # empty input: nothing to pack
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    edges = np.linspace(lo, hi, num_ranges + 1)[1:-1] if hi > lo else np.array([])

    # pass 1b: per-range token totals (tiny: num_ranges rows reach the driver)
    def range_sums(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.float64()).to_numpy(zero_copy_only=False)
        toks = t[tok].to_numpy(zero_copy_only=False).astype(np.int64)
        rng = np.searchsorted(edges, ids, side="right")
        sums = np.bincount(rng, weights=toks, minlength=num_ranges).astype(np.int64)
        nz = np.flatnonzero(sums)
        return pa.table({"rng": pa.array(nz.astype(np.int64)),
                         "tok_sum": pa.array(sums[nz])})

    per_range = (proj.map_batches(range_sums, batch_format="pyarrow")
                 .to_pandas().groupby("rng")["tok_sum"].sum())
    totals = np.zeros(num_ranges, np.int64)
    totals[per_range.index.to_numpy()] = per_range.to_numpy()
    offsets = np.zeros(num_ranges, np.int64)
    np.cumsum(totals[:-1], out=offsets[1:])

    # pass 2: per-range local sort + cumsum + global offset
    def add_range(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.float64()).to_numpy(zero_copy_only=False)
        rng = np.searchsorted(edges, ids, side="right")
        return t.append_column("__rng", pa.array(rng.astype(np.int64)))

    def pack_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        toks = df[tok].to_numpy(np.int64)
        start = offsets[int(df["__rng"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(toks[:-1])))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": toks,
            "start_offset": start,
            "shard": start // np.int64(budget),
        })

    return proj.map_batches(add_range, batch_format="pyarrow").groupby(
        "__rng").map_groups(pack_range, batch_format="pandas")


def pack_sequences_greedy(ds, id_col: str = "doc_id", text_col: str = "text",
                          token_col: str | None = None, budget: int = 2048,
                          num_partitions: int = 64):
    """Per-partition FIRST-FIT-DECREASING packing (see module docstring).
    Docs are hash-partitioned by id; each partition packs independently with
    FFD, so shard ids are ``partition * 2^32 + local_shard`` and the packing
    is deterministic for a given input set.  Output: ``(id_col, n_tokens,
    shard)``.  Invariants (tested): no multi-doc shard exceeds ``budget``;
    per partition, at most one shard is under half-full (FFD property);
    oversized single docs get singleton shards."""
    from ..pairs import stable_hash

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    ds, tok = _with_tokens(ds, text_col, token_col)
    proj = ds.select_columns([id_col, tok])

    def add_part(t: pa.Table) -> pa.Table:
        h = stable_hash(t[id_col].combine_chunks().to_numpy(zero_copy_only=False))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.int64)))

    def ffd(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["__part"].iloc[0])
        # deterministic FFD: size descending, id ascending tiebreak
        df = df.sort_values([tok, id_col], ascending=[False, True],
                            kind="mergesort")
        toks = df[tok].to_numpy(np.int64)
        caps: list[int] = []   # remaining capacity per open shard
        assign = np.empty(len(toks), np.int64)
        for i, sz in enumerate(toks):
            # first fit over open shards (linear scan is fine: shards per
            # partition are bounded by partition tokens / budget)
            for s, cap in enumerate(caps):
                if sz <= cap:
                    caps[s] = cap - sz
                    assign[i] = s
                    break
            else:
                caps.append(max(int(budget) - int(sz), 0))
                assign[i] = len(caps) - 1
        base = np.int64(part) << np.int64(32)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": toks,
            "shard": base + assign,
        })

    return proj.map_batches(add_part, batch_format="pyarrow").groupby(
        "__part").map_groups(ffd, batch_format="pandas")
