"""Candidate-pair generation — THE wide shuffle (SURVEY.md §4, J1/A4).

Ray-Data expression of the reference's SQL blocking self-join:
``blocking_map a JOIN blocking_map b USING (block_key) WHERE a.id < b.id``
followed by ``DISTINCT`` pair dedup (mysql_example/mysql_example.py:240-264,
unique index mysql_example.py:234).

Physical plan (bucketed to amortize per-group overhead — a groupby with one
Python call per *block* or per *pair* is quadratically dominated by task
dispatch, measured 3x the whole pipeline):

1. bucket = stable_hash(block_key) % B  -> ``groupby(bucket)`` = B groups;
   inside each group a pandas loop over its blocks emits pairs vectorized
   (sorted unique ids + triu indices).  Same shuffle volume as grouping by
   block_key directly — the bucket is a function of the key, so every block
   is complete within one group.
2. ``id_a < id_b`` ordered-pair constraint via sorted ids.
3. **Skew**: blocks larger than ``max_block_size`` are *salted* — members
   split deterministically (stable hash of id) into ceil(n/cap) sub-blocks,
   pairs emitted within sub-blocks only; bounded recall loss, never silent
   (``pair_metrics`` reports emitted/capped/dropped counts — north_rule).
4. Cross-block duplicate pairs are removed by a second bucketed shuffle on
   stable_hash(id_a, id_b) % B with a vectorized ``drop_duplicates`` per
   bucket (reference A4 DISTINCT).

Record fields are denormalized into blocking rows (fingerprint.py), so pair
rows carry both sides' values and no hydration join (J2) is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .scale import clean_arrow as _clean_arrow

_HASH_KEY = "dedupe_examples_ray" [:16].ljust(16, "0")


def stable_hash(values) -> np.ndarray:
    """Deterministic uint64 hash of an array (stable across processes —
    unlike Python's seeded ``hash``).

    Integer/float inputs take a pure-numeric splitmix64 path (no object
    boxing — the surrogate-uid shuffles hash uint64 columns in every bucketed
    stage, so this is hot); everything else goes through pandas' siphash of
    the object array."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iuf" and arr.dtype != np.dtype("O"):
        x = arr.astype(np.uint64, copy=True) if arr.dtype.kind != "f" else arr.view(np.uint64).copy()
        # splitmix64 finalizer — bijective on u64, well-mixed low bits
        x += np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x
    return pd.util.hash_array(np.asarray(values, dtype=object), hash_key=_HASH_KEY)


_PAIR_IDX_CACHE: dict = {}


def _pair_idx(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached triu indices (k <= salting cap, so the cache stays tiny)."""
    got = _PAIR_IDX_CACHE.get(k)
    if got is None:
        got = np.triu_indices(k, k=1)
        _PAIR_IDX_CACHE[k] = got
    return got


def _emit_bucket(
    df: pd.DataFrame,
    id_col: str,
    carry_cols: list[str],
    max_block_size: int,
    policy: str,
    source_col: str | None,
) -> pd.DataFrame:
    """All pairs for one hash bucket of blocks.

    Vectorized across the bucket's blocks: one global (block_key, id) dedup +
    sort, then group offsets via factorize/bincount; the per-group work is two
    array appends against cached triu indices (no per-block pandas objects).
    Oversized groups take the salting path individually (rare by design).
    """
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=df[id_col].dtype),
            "id_b": pd.Series([], dtype=df[id_col].dtype),
            **{f"{c}_a": pd.Series([], dtype=df[c].dtype) for c in carry_cols},
            **{f"{c}_b": pd.Series([], dtype=df[c].dtype) for c in carry_cols},
        }
    )
    if df.empty:
        return empty
    df = df.drop_duplicates(subset=["block_key", id_col])
    df = df.sort_values(["block_key", id_col], kind="stable").reset_index(drop=True)
    codes, _ = pd.factorize(df["block_key"], sort=False)
    sizes = np.bincount(codes)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    ids = df[id_col].to_numpy()
    src = df[source_col].to_numpy() if source_col is not None else None

    out_a: list = []
    out_b: list = []
    for g in np.flatnonzero(sizes >= 2):
        s = int(sizes[g])
        o = int(starts[g])
        members = np.arange(o, o + s)
        if source_col is not None:
            left = members[src[o : o + s] == 0]
            right = members[src[o : o + s] != 0]
            if not len(left) or not len(right):
                continue
            if s <= max_block_size or policy == "keep":
                ia, ib = np.meshgrid(left, right, indexing="ij")
                out_a.append(ia.ravel())
                out_b.append(ib.ravel())
            elif policy == "drop":
                continue
            else:  # salt cross-source blocks too — same contract as dedupe mode
                k = -(-s // max_block_size)
                salt = stable_hash(ids[o : o + s]) % k
                for sv in range(k):
                    li = left[salt[left - o] == sv]
                    ri = right[salt[right - o] == sv]
                    if len(li) and len(ri):
                        ia, ib = np.meshgrid(li, ri, indexing="ij")
                        out_a.append(ia.ravel())
                        out_b.append(ib.ravel())
            continue
        if s <= max_block_size or policy == "keep":
            ia, ib = _pair_idx(s)
            out_a.append(o + ia)
            out_b.append(o + ib)
        elif policy == "drop":
            continue
        else:  # salt oversized group into deterministic sub-blocks
            k = -(-s // max_block_size)
            salt = stable_hash(ids[o : o + s]) % k
            for sv in range(k):
                chunk = members[salt == sv]  # ascending -> id_a < id_b holds
                if len(chunk) < 2:
                    continue
                ia, ib = _pair_idx(len(chunk))
                out_a.append(chunk[ia])
                out_b.append(chunk[ib])
    if not out_a:
        return empty
    ia = np.concatenate(out_a)
    ib = np.concatenate(out_b)
    data = {"id_a": ids[ia], "id_b": ids[ib]}
    for c in carry_cols:
        vals = df[c].to_numpy()
        data[f"{c}_a"] = vals[ia]
        data[f"{c}_b"] = vals[ib]
    return pd.DataFrame(data)


def candidate_pairs(
    blocks_ds,
    id_col: str,
    carry_cols: list[str],
    max_block_size: int = 200,
    policy: str = "salt",
    source_col: str | None = None,
    dedup: bool = True,
    num_buckets: int | None = None,
):
    """blocking-map Dataset -> deduped candidate-pair Dataset.

    ``source_col``: when set (RecordLink mode, J3), pairs are emitted only
    across source 0 × source 1 inside each block.
    ``num_buckets``: shuffle partition count for both the pair-gen and the
    pair-dedup exchanges; defaults via ``scale.resolve_buckets`` from the
    input's metadata row estimate (callers that know the pair volume should
    pass it explicitly — size to O(pair_bytes / target block size)).
    """
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, blocks_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(t["block_key"].to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    bucketed = blocks_ds.map_batches(add_bucket, batch_format="pyarrow")

    def emit(df: pd.DataFrame) -> pa.Table:
        return _clean_arrow(
            _emit_bucket(df, id_col, carry_cols, max_block_size, policy, source_col)
        )

    pairs = bucketed.groupby("bucket").map_groups(emit, batch_format="pandas")
    if dedup:
        pairs = dedup_pairs(pairs, num_buckets=num_buckets)
    return pairs


def dedup_pairs(pairs_ds, num_buckets: int | None = None):
    """Global DISTINCT on (id_a, id_b): bucketed shuffle + vectorized
    drop_duplicates per bucket (A4)."""
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, pairs_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        h = (stable_hash(a) * np.uint64(1000003) + stable_hash(b)) % num_buckets
        return t.append_column("pbucket", pa.array(h.astype(np.int64), pa.int64()))

    bucketed = pairs_ds.map_batches(add_bucket, batch_format="pyarrow")

    def drop(df: pd.DataFrame) -> pa.Table:
        return _clean_arrow(
            df.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["pbucket"])
        )

    return bucketed.groupby("pbucket").map_groups(drop, batch_format="pandas")


def _even_split(n: int, k: int) -> np.ndarray:
    """Sizes of an even k-way split of n (the salting estimate model)."""
    base, rem = divmod(n, k)
    return np.array([base + 1] * rem + [base] * (k - rem), dtype=np.int64)


def pair_metrics(blocks_ds, id_col: str, max_block_size: int = 200, policy: str = "salt",
                 num_buckets: int | None = None, source_col: str | None = None) -> dict:
    """Emitted / capped / dropped pair counts (no silent caps — SURVEY.md §4).

    Cheap bucketed pass over the (block_key, id) projection only.
    ``source_col``: cross-source (RecordLink/Gazetteer) mode — full pairs are
    left×right per block and salting splits both sides with the same salt.
    """
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, blocks_ds)
    cols = ["block_key", id_col] + ([source_col] if source_col else [])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(t["block_key"].to_numpy(zero_copy_only=False)) % num_buckets
        return pa.table(
            {**{c: t[c] for c in cols}, "bucket": pa.array(b.astype(np.int64), pa.int64())}
        )

    def sizes(df: pd.DataFrame) -> pa.Table:
        u = df.drop_duplicates(subset=["block_key", id_col])
        g = u.groupby("block_key", sort=False)
        out = g.size().rename("n").reset_index()[["n"]]
        if source_col:
            out["nl"] = g.apply(lambda s: int((s[source_col] == 0).sum())).to_numpy()
        return _clean_arrow(out)

    tbl = (
        blocks_ds.select_columns(cols)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sizes, batch_format="pandas")
        .to_pandas()
    )
    n = tbl["n"].to_numpy(dtype=np.int64)
    if source_col:
        nl = tbl["nl"].to_numpy(dtype=np.int64)
        nr = n - nl
        full = nl * nr
        emitted = np.where(n <= max_block_size, full, 0)
        salted_emit = 0
        for sz, l, r in zip(n[n > max_block_size], nl[n > max_block_size], nr[n > max_block_size]):
            k = -(-sz // max_block_size)
            salted_emit += int((_even_split(int(l), k) * _even_split(int(r), k)).sum())
    else:
        full = n * (n - 1) // 2
        emitted = np.where(n <= max_block_size, full, 0)
        salted_emit = 0
        for sz in n[n > max_block_size]:
            parts = _even_split(int(sz), -(-int(sz) // max_block_size))
            salted_emit += int((parts * (parts - 1) // 2).sum())
    if policy == "salt":
        emitted_total = int(emitted.sum()) + int(salted_emit)
    elif policy == "drop":
        emitted_total = int(emitted.sum())
    else:
        emitted_total = int(full.sum())
    return {
        "blocks": int(len(n)),
        "blocks_over_cap": int((n > max_block_size).sum()),
        "pairs_full": int(full.sum()),
        "pairs_emitted_est": emitted_total,
        "pairs_dropped_est": int(full.sum()) - emitted_total,
    }
