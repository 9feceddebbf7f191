"""String-similarity self-joins: FastSS edit-distance join and
sorted-neighborhood blocking.

Two classic entity-resolution candidate generators the reference's `dedupe`
library approximates with learned predicates (csv_example.py's fingerprinter
picks from the same family — prefix/ngram/sorted predicates):

- :func:`edit_similarity_join` — the COMPLETE edit-distance-<=1 self-join via
  the FastSS deletion-neighborhood (Bocek et al. 2007): two strings with
  Levenshtein distance <= 1 share a key in {s} ∪ {s minus one char}.  Unlike
  a learned blocking predicate this is lossless, so the output equals the
  naive O(n²) cross-join filter and can be oracled exactly against DuckDB's
  byte-based ``levenshtein``.
- :func:`sorted_neighborhood_pairs` — Hernández & Stolfo's (SIGMOD 1995)
  sorted-neighborhood method: order records by a key, emit every pair within
  a fixed window of the global sort order.  Equals the SQL
  ``ROW_NUMBER() OVER (ORDER BY key, id)`` self-join on ``0 < rn_b - rn_a <= w``.

Scale notes (100 TB posture):

- FastSS keys are computed WITHOUT materializing the deletion-variant
  strings: one polynomial rolling hash over the UTF-8 byte matrix yields all
  ``len+1`` variant hashes per row in O(len) vectorized work (prefix hashes
  combine with suffix hashes through modular-inverse powers of the base, all
  in natural uint64 wraparound — the base is odd, hence invertible mod 2^64).
  Hash collisions only ever ADD candidates; the exact verify removes them.
- Candidate emission reuses :func:`pairs.candidate_pairs`'s bucketed shuffle
  (``policy="keep"`` — the join is output-complete, so per-key quadratic
  emission is proportional to the OUTPUT, not the corpus; for lossy capped
  dedup semantics use ``ops.dedup`` instead).  The compared string rides the
  key rows (bytes amplification O(len) per row), which targets SHORT key
  columns — names, titles, normalized addresses; for document bodies use
  minhash/simhash.
- Sorted-neighborhood runs on the two-pass range-partitioned
  ``windows.global_rank`` (no driver sort); window pairs are emitted per rank
  band with a ``window``-row ghost overlap so no pair straddles a task
  boundary.  Row numbers are dense, so partner lookup inside a band is a
  ``searchsorted`` per window offset — O(w) vector ops per band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..pairs import candidate_pairs, stable_hash

_BASE = np.uint64(1099511628211)  # odd -> invertible mod 2^64 (FNV prime)
_BASE_INV = np.uint64(pow(int(_BASE), -1, 1 << 64))
_EMPTY_SENTINEL = np.uint64(0xCBF29CE484222325)  # hash of the empty variant


def _prefix6_f64(arr) -> np.ndarray:
    """First 6 UTF-8 bytes of each string as an exact float64 (48 bits < 53).

    Monotone in the string's binary order (UTF-8 byte order == code-point
    order) — the numeric range-partition proxy for sorted-neighborhood
    ranking.  Zero-copy over the Arrow buffers; no per-row Python objects.
    NULL keys map to +inf (SQL NULLS LAST): they land in the final rank
    range, where the in-range tie sort (na_position="last") orders them
    after every non-null key and by id among themselves.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
    a = pc.cast(pc.fill_null(arr, ""), pa.large_utf8())
    off = np.frombuffer(a.buffers()[1], np.int64)[a.offset : a.offset + len(a) + 1]
    dbuf = a.buffers()[2]
    data = np.frombuffer(dbuf, np.uint8) if dbuf is not None else np.zeros(0, np.uint8)
    if len(a) == 0:
        return np.zeros(0, np.float64)
    starts = off[:-1]
    lens = np.minimum(off[1:] - starts, 8)
    if len(data):
        idx = starts[:, None] + np.arange(8, dtype=np.int64)[None, :]
        mask = np.arange(8)[None, :] < lens[:, None]
        np.clip(idx, 0, len(data) - 1, out=idx)
        vals = data[idx] * mask
    else:
        vals = np.zeros((len(a), 8), np.uint8)
    u = np.ascontiguousarray(vals).view(">u8").ravel().astype(np.uint64)
    p = (u >> np.uint64(16)).astype(np.float64)  # first 6 bytes, exact
    if isnull.any():
        p = np.where(isnull, np.inf, p)
    return p


def _byte_matrix(strings: list) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint8 matrix of UTF-8 bytes (zero-padded) + byte lengths.

    Byte-level (not code-point) on purpose: DuckDB's ``levenshtein`` counts
    byte edits, and the oracle contract needs the same metric.
    """
    bts = [s.encode("utf-8") if isinstance(s, str) else b"" for s in strings]
    lens = np.fromiter((len(b) for b in bts), dtype=np.int64, count=len(bts))
    n, L = len(bts), int(lens.max()) if len(bts) else 0
    M = np.zeros((n, max(L, 1)), dtype=np.uint8)
    if lens.sum():
        flat = np.frombuffer(b"".join(bts), dtype=np.uint8)
        row = np.repeat(np.arange(n), lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        col = np.arange(len(flat)) - np.repeat(starts, lens)
        M[row, col] = flat
    return M, lens


def _fastss_keys(strings: list) -> tuple[np.ndarray, np.ndarray]:
    """All FastSS-1 variant keys for each string, via rolling hashes.

    Returns (row_index, key) arrays covering, per row, the full-string hash
    plus one hash per single-char deletion — ``len+1`` keys/row, no variant
    strings built.  Keys mix in the variant LENGTH so only same-length
    variants collide (full(len m) matches deletion(len n -> n-1) iff m==n-1,
    which is exactly the FastSS match condition).
    """
    M, lens = _byte_matrix(strings)
    n, L = M.shape
    # C[:, j] = sum_{k<j} byte[k] * BASE^{-k}  (uint64 wraparound)
    binv_pows = np.ones(L, dtype=np.uint64)
    if L > 1:
        np.multiply.accumulate(np.full(L - 1, _BASE_INV, np.uint64), out=binv_pows[1:])
    C = np.zeros((n, L + 1), dtype=np.uint64)
    np.cumsum(M.astype(np.uint64) * binv_pows[None, :], axis=1, out=C[:, 1:])
    # B^e for e in [-1, L): index e+1
    b_pows = np.empty(L + 1, dtype=np.uint64)
    b_pows[0] = _BASE_INV
    b_pows[1] = 1
    if L > 1:
        np.multiply.accumulate(np.full(L - 1, _BASE, np.uint64), out=b_pows[2:], axis=0)

    def mix(h: np.ndarray, vlen: np.ndarray) -> np.ndarray:
        return stable_hash(h * np.uint64(0x9E3779B97F4A7C15) + vlen.astype(np.uint64))

    rows_out = [np.arange(n)]
    # full-string keys: h = C[i, len] * BASE^{len-1}; empty -> sentinel
    c_n = C[np.arange(n), lens]
    h_full = np.where(lens > 0, c_n * b_pows[np.clip(lens, 1, None)], _EMPTY_SENTINEL)
    keys_out = [mix(h_full, lens)]
    # deletion keys at position d (vectorized over the (n, L) grid):
    # h_del(d) = C[:, d] * B^{n-2} + (C[:, n] - C[:, d+1]) * B^{n-1}
    valid = np.arange(L)[None, :] < lens[:, None]
    if valid.any():
        bn2 = b_pows[np.clip(lens - 1, 0, None)][:, None]  # B^{len-2} (index len-1)
        bn1 = b_pows[np.clip(lens, 1, None)][:, None]      # B^{len-1}
        h_del = C[:, :L] * bn2 + (c_n[:, None] - C[:, 1 : L + 1]) * bn1
        h_del = np.where(lens[:, None] == 1, _EMPTY_SENTINEL, h_del)
        ri, di = np.nonzero(valid)
        rows_out.append(ri)
        keys_out.append(mix(h_del[ri, di], (lens[ri] - 1)))
    return np.concatenate(rows_out), np.concatenate(keys_out)


def batch_edit_distance(a: list, b: list) -> np.ndarray:
    """Exact byte-level Levenshtein distance for N pairs, vectorized.

    Full Wagner-Fischer, one numpy op per DP row across all pairs (same
    memory pattern as ``distances.batch_levenshtein_sim`` but UNCAPPED and
    returning raw distances — the verify set is candidate pairs only, so
    exactness beats the capped kernel's L2 tuning here).
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    eq = np.fromiter((x == y for x, y in zip(a, b)), dtype=bool, count=n)
    out = np.zeros(n, dtype=np.int64)
    sub = np.flatnonzero(~eq)
    if not len(sub):
        return out
    A, la = _byte_matrix([a[i] for i in sub])
    B, lb = _byte_matrix([b[i] for i in sub])
    m = len(sub)
    w = B.shape[1] + 1
    jr = np.arange(w, dtype=np.int32)
    prev = np.broadcast_to(jr, (m, w)).astype(np.int32).copy()
    cur = np.empty((m, w), dtype=np.int32)
    dist = np.where(la == 0, lb, 0).astype(np.int64)
    for i in range(1, int(la.max()) + 1 if m else 0):
        neq = A[:, i - 1 : i] != B
        cand = np.minimum(prev[:, :-1] + neq, prev[:, 1:] + 1)
        cur[:, 0] = i
        cur[:, 1:] = cand
        cur -= jr
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += jr
        done = la == i
        if done.any():
            dist[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    out[sub] = dist
    return out


def edit_similarity_join(
    ds,
    col: str,
    id_col: str,
    max_dist: int = 1,
    num_buckets: int | None = None,
):
    """Complete Levenshtein-distance-<= ``max_dist`` self-join on ``col``.

    Returns a Dataset of (id1, id2, dist) with id1 < id2, EXACTLY equal to
    the naive cross-join filter (FastSS candidates are complete for
    distance <= 1; the verify is exact).  Only ``max_dist=1`` is supported —
    it is the FastSS-1 completeness bound; larger radii need deletion
    neighborhoods of size O(len^k) and belong to the lossy minhash family.
    NULL values compare as empty strings (SQL ``levenshtein`` would return
    NULL and drop the pair; pre-filter nulls if SQL semantics are needed).
    """
    if max_dist != 1:
        raise ValueError("edit_similarity_join is complete only for max_dist=1")

    def keys(t: pa.Table) -> pa.Table:
        s = t[col].to_pylist()
        ri, k = _fastss_keys(s)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "block_key": pa.array(k.view(np.int64)),
                id_col: pa.array(ids[ri]),
                col: pa.array([s[i] for i in ri], pa.string()),
            }
        )

    blocks = ds.select_columns([id_col, col]).map_batches(keys, batch_format="pyarrow")
    pairs = candidate_pairs(
        blocks, id_col=id_col, carry_cols=[col],
        policy="keep", num_buckets=num_buckets,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"id1": pd.Series([], dtype=np.int64),
                                 "id2": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.int64)})
        d = batch_edit_distance(df[f"{col}_a"].tolist(), df[f"{col}_b"].tolist())
        keep = d <= max_dist
        return pd.DataFrame(
            {"id1": df["id_a"].to_numpy()[keep],
             "id2": df["id_b"].to_numpy()[keep],
             "dist": d[keep]}
        )

    return pairs.map_batches(verify, batch_format="pandas")


def jaccard_similarity_join(
    ds,
    col: str,
    id_col: str,
    threshold: float = 0.5,
    delimiter: str = " ",
    num_buckets: int | None = None,
):
    """Complete token-set Jaccard-similarity >= ``threshold`` self-join.

    Prefix filtering (Chaudhuri et al. ICDE 2006 / Xiao et al. WWW 2008
    PPJoin's base filter): under one GLOBAL token order, a set keeps only its
    first ``|s| - ceil(t*|s|) + 1`` tokens as blocking keys; J(A,B) >= t
    implies |A∩B| >= t*|A|, so the prefixes of A and B must share a token —
    candidates are complete, and the exact set verify removes false ones.
    Tokens are ordered rarest-first by a document-frequency combiner pass so
    prefixes land on selective keys; the token->rank map is broadcast
    (vocabulary-sized — the standard PPJoin assumption; at web vocab scale,
    swap in rank = stable_hash(token), which stays global with zero driver
    state but prunes less).

    Returns (id1, id2, jac) with id1 < id2, equal to the naive cross-join
    Jaccard filter over DISTINCT delimiter-split tokens (mirrors DuckDB's
    ``list_distinct(string_split(...))`` semantics, including empty tokens
    from doubled delimiters).

    Hot-path shape: DF counting and prefix emission are whole-batch Arrow/
    numpy (``split_pattern`` -> flatten + parent indices -> searchsorted rank
    lookup -> per-row distinct+prefix via one ``np.unique`` over packed
    (row, rank) codes); the verify memoizes each distinct string's sorted
    64-bit hashed-token set and intersects with a sorted-array merge — the
    same hashed-set formulation as the minhash verify (collision odds
    ~1e-12 per pair).
    """
    import ray

    t0 = float(threshold)
    if not 0.0 < t0 <= 1.0:
        raise ValueError("threshold must be in (0, 1]")

    def _flat_tokens(t: pa.Table):
        s = pc.fill_null(pc.cast(
            t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col],
            pa.string()), "")
        sp = pc.split_pattern(s, delimiter)
        flat = pc.list_flatten(sp).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(sp).to_numpy(zero_copy_only=False)
        return s, flat, parents

    # pass 1: token document frequencies (per-batch combiner -> tiny groupby)
    def batch_df(t: pa.Table) -> pa.Table:
        _, flat, parents = _flat_tokens(t)
        uniq = pd.DataFrame({"p": parents, "tok": flat}).drop_duplicates()
        cnt = uniq.groupby("tok", sort=False).size()
        return pa.table({"tok": pa.array(cnt.index.to_numpy(), pa.string()),
                         "n": pa.array(cnt.to_numpy(), pa.int64())})

    df_tbl = (
        ds.select_columns([col])
        .map_batches(batch_df, batch_format="pyarrow")
        .groupby("tok").sum("n")
        .to_pandas()
    )
    if df_tbl.empty:
        return ray.data.from_arrow(pa.table({
            "id1": pa.array([], pa.int64()), "id2": pa.array([], pa.int64()),
            "jac": pa.array([], pa.float64())}))
    # the aggregate column is named "sum(n)" (or "n" on some fused paths)
    agg_col = [c for c in df_tbl.columns if c != "tok"][0]
    df_tbl = df_tbl.sort_values([agg_col, "tok"], kind="mergesort").reset_index(drop=True)
    # rank lookup as two aligned arrays (lexicographic vocab + its DF rank):
    # batch-side token->rank is one C-speed searchsorted, no Python dict
    vocab = df_tbl["tok"].to_numpy(dtype=str)
    perm = np.argsort(vocab, kind="stable")
    V = len(vocab)
    rank_ref = ray.put((vocab[perm], perm.astype(np.int64)))

    def prefix_keys(t: pa.Table) -> pa.Table:
        vocab_lex, rank_lex = ray.get(rank_ref)
        s, flat, parents = _flat_tokens(t)
        empty = pa.table({"block_key": pa.array([], pa.int64()),
                          id_col: pa.array([], t[id_col].type),
                          col: pa.array([], pa.string())})
        if len(flat) == 0:
            return empty
        ranks = rank_lex[np.searchsorted(vocab_lex, flat.astype(str))]
        # one sort dedups tokens per row AND orders them rarest-first
        codes = np.unique(parents.astype(np.int64) * V + ranks)
        up, ur = codes // V, codes % V
        n_per = np.bincount(up, minlength=t.num_rows)
        plen = n_per - np.ceil(t0 * n_per).astype(np.int64) + 1
        plen[n_per == 0] = 0
        starts = np.concatenate([[0], np.cumsum(n_per)])[:-1]
        pos = np.arange(len(codes)) - starts[up]
        keep = pos < plen[up]
        sel = pa.array(up[keep])
        return pa.table({"block_key": pa.array(ur[keep], pa.int64()),
                         id_col: (t[id_col].combine_chunks()
                                  if isinstance(t[id_col], pa.ChunkedArray)
                                  else t[id_col]).take(sel),
                         col: s.take(sel)})

    blocks = ds.select_columns([id_col, col]).map_batches(prefix_keys, batch_format="pyarrow")
    pairs = candidate_pairs(blocks, id_col=id_col, carry_cols=[col],
                            policy="keep", num_buckets=num_buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _hash_tokens

        if df.empty:
            return pd.DataFrame({"id1": pd.Series([], dtype=np.int64),
                                 "id2": pd.Series([], dtype=np.int64),
                                 "jac": pd.Series([], dtype=np.float64)})
        # tokenize once per UNIQUE string (memoized sorted u64 hash sets,
        # the minhash-verify formulation); the per-pair merge is a handful
        # of element compares on short key columns — measured NOT the
        # bottleneck (candidate DISTINCT is), and it avoids materializing
        # the pair-expanded token arrays a fully-packed pass would sort
        cache: dict = {}

        def toks(s) -> np.ndarray:
            a = cache.get(s)
            if a is None:
                a = np.unique(_hash_tokens(
                    np.array((s or "").split(delimiter), dtype=object)))
                cache[s] = a
            return a

        ja = np.empty(len(df), dtype=np.float64)
        for i, (sa, sb) in enumerate(zip(df[f"{col}_a"], df[f"{col}_b"])):
            if sa == sb:
                ja[i] = 1.0
                continue
            a, b = toks(sa), toks(sb)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            ja[i] = inter / (len(a) + len(b) - inter)
        keep = ja >= t0
        return pd.DataFrame({"id1": df["id_a"].to_numpy()[keep],
                             "id2": df["id_b"].to_numpy()[keep],
                             "jac": ja[keep]})

    return pairs.map_batches(verify, batch_format="pandas")


def sorted_neighborhood_pairs(
    ds,
    key_col: str,
    id_col: str,
    window: int = 5,
    band_width: int | None = None,
):
    """Sorted-neighborhood blocking: all pairs within ``window`` positions of
    the global (key, id) sort order.

    Equals ``SELECT a.id, b.id FROM ranked a JOIN ranked b ON b.rn > a.rn AND
    b.rn <= a.rn + window`` where rn is ``ROW_NUMBER() OVER (ORDER BY key,
    id)``.  Ranking reuses :func:`windows.global_rank`'s two-pass range
    partitioning, driven by an order-preserving numeric projection of the
    key's first 6 UTF-8 bytes (exact in float64; full-key ties resolved by
    ``tie_cols``).  ASCII/byte collation — matches DuckDB's default ORDER BY,
    including NULLS LAST (null keys rank after every non-null key).
    ``band_width`` must be >= ``window`` (the band ghost overlap is one
    window deep); violating it raises instead of silently dropping pairs.
    """
    from ..windows import global_rank

    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    W = int(band_width) if band_width else max(4 * w, 1024)
    if W < w:
        # the ghost overlap only replicates w rows into the PREVIOUS band;
        # a band narrower than the window would silently lose every pair
        # whose partner lies 2+ bands ahead (no-silent-caps rule)
        raise ValueError(
            f"band_width ({W}) must be >= window ({w}): pairs spanning "
            "more than one band boundary would be silently dropped"
        )

    def add_prefix(t: pa.Table) -> pa.Table:
        p = _prefix6_f64(t[key_col])
        return t.append_column("__pfx", pa.array(p))

    ranked = global_rank(
        ds.select_columns([id_col, key_col]).map_batches(add_prefix, batch_format="pyarrow"),
        by="__pfx", tie_cols=[key_col, id_col], mode="row_number", out_col="__rn",
    )

    def to_bands(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        band = (rn - 1) // W
        ghost = ((rn - 1) % W < w) & (band >= 1)
        out_band = np.concatenate([band, band[ghost] - 1])
        return pa.table(
            {
                "__band": pa.array(np.asarray(out_band, np.int64)),
                "__rn2": pa.array(np.concatenate([rn, rn[ghost]])),
                id_col: pa.array(np.concatenate([ids, ids[ghost]])),
                "__native": pa.array(
                    np.concatenate([np.ones(len(rn), bool), np.zeros(int(ghost.sum()), bool)])
                ),
            }
        )

    banded = ranked.map_batches(to_bands, batch_format="pyarrow")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("__rn2", kind="mergesort").reset_index(drop=True)
        rn = df["__rn2"].to_numpy(np.int64)
        ids = df[id_col].to_numpy()
        native = df["__native"].to_numpy(bool)
        anchors = np.flatnonzero(native)
        out1, out2 = [], []
        for off in range(1, w + 1):
            tgt = rn[anchors] + off
            idx = np.searchsorted(rn, tgt)
            ok = (idx < len(rn)) & (rn[np.clip(idx, 0, len(rn) - 1)] == tgt)
            out1.append(ids[anchors[ok]])
            out2.append(ids[idx[ok]])
        if not out1:
            return pd.DataFrame({"id1": pd.Series([], dtype=ids.dtype),
                                 "id2": pd.Series([], dtype=ids.dtype)})
        return pd.DataFrame(
            {"id1": np.concatenate(out1), "id2": np.concatenate(out2)}
        )

    from ..scale import clean_arrow

    return banded.groupby("__band").map_groups(
        lambda df: clean_arrow(emit(df)), batch_format="pandas"
    )


def multi_pass_snm(
    ds,
    key_cols: list[str],
    id_col: str,
    window: int = 5,
    band_width: int | None = None,
):
    """Multi-pass sorted-neighborhood: DISTINCT union of single-pass windows
    over each key ordering — the classic SNM recall booster (each pass
    covers the typo modes its key ordering survives; Hernandez & Stolfo
    SIGMOD 1995 §4).  Pair orientation is normalized to ``id1 < id2`` before
    the global DISTINCT, so the same pair found by two passes under opposite
    rank orders still deduplicates.
    """
    from ..pairs import dedup_pairs

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    parts = [
        sorted_neighborhood_pairs(ds, k, id_col, window=window, band_width=band_width)
        for k in key_cols
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.union(p)

    def orient(t: pa.Table) -> pa.Table:
        a, b = t["id1"], t["id2"]
        return pa.table(
            {"id_a": pc.min_element_wise(a, b), "id_b": pc.max_element_wise(a, b)}
        )

    deduped = dedup_pairs(un.map_batches(orient, batch_format="pyarrow"))
    return deduped.map_batches(
        lambda t: pa.table({"id1": t["id_a"], "id2": t["id_b"]}),
        batch_format="pyarrow",
    )


def cosine_threshold_join(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    grid: int = 8,
):
    """Exact all-pairs cosine-similarity >= ``threshold`` self-join.

    1-Bucket-Theta 2-D grid partitioning (Okcan & Riedewald, SIGMOD 2011):
    each row is hashed into one of ``grid`` chunks and replicated to the
    ``grid`` cells ``{(min(c, j), max(c, j)) : j}``, so every unordered row
    pair lands in EXACTLY ONE cell; each cell task computes its chunk-pair
    block product ``Xa @ Xb.T`` (float64, unnormalized-then-normed to match
    a DOUBLE-cast SQL ``list_cosine_similarity``) and filters locally.

    Output is complete and exact — no LSH recall loss — at the classic
    theta-join cost: shuffled bytes = ``grid`` x corpus vectors, per-task
    work ~ (n/grid)^2 dot products.  Pick ``grid`` ~ sqrt(desired tasks);
    for true near-dup detection at corpus scale prefer
    :func:`~dedupe_examples_ray.ops.dedup.embedding_cosine_dedup` (LSH) and
    use this as its exactness oracle on samples.  Null/empty vectors are
    excluded (SQL NULL-comparison parity).

    Returns (id1, id2, cos) with id1 < id2.
    """
    from ..pairs import stable_hash

    t0 = float(threshold)
    g = int(grid)
    if g < 1:
        raise ValueError("grid must be >= 1")

    def replicate(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ids_arr = t[id_col]
        valid = np.ones(len(t), dtype=bool)
        vcol = t[vec_col]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        # exclude BOTH null and zero-length vectors (the docstring's
        # "null/empty" contract): an empty list among fixed-width vectors
        # would break _col_matrix's uniform-width stack and kill the task
        vlens = pc.fill_null(pc.list_value_length(vcol), 0).to_numpy(
            zero_copy_only=False)
        valid &= vlens > 0
        if valid.sum() == 0:
            return pa.table({
                "cell": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.int64()),
                id_col: pa.array([], ids_arr.type),
                vec_col: pa.array([], vcol.type),
            })
        t = t.filter(pa.array(valid))
        n = len(t)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        c = (stable_hash(ids) % np.uint64(g)).astype(np.int64)
        # row i -> g copies, one per j; cell id = a * g + b with (a, b) sorted
        rep = np.repeat(np.arange(n), g)
        j = np.tile(np.arange(g, dtype=np.int64), n)
        ci = c[rep]
        a = np.minimum(ci, j)
        b = np.maximum(ci, j)
        out = t.take(pa.array(rep))
        out = out.append_column("cell", pa.array(a * g + b, pa.int64()))
        return out.append_column("chunk", pa.array(ci, pa.int64()))

    def cell_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"id1": pa.array([], pa.int64()),
                          "id2": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        cell = int(t["cell"][0].as_py())
        a, b = divmod(cell, g)
        chunk = t["chunk"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        from .ann import _col_matrix, _normalize

        M = _normalize(_col_matrix(t[vec_col], dtype=np.float64))
        if a == b:
            S = M @ M.T
            iu, ju = np.triu_indices(len(ids), k=1)
            keep = S[iu, ju] >= t0
            i1, i2, cs = ids[iu[keep]], ids[ju[keep]], S[iu, ju][keep]
        else:
            ma, mb = chunk == a, chunk == b
            if not ma.any() or not mb.any():
                return empty
            S = M[ma] @ M[mb].T
            iu, ju = np.nonzero(S >= t0)
            i1, i2, cs = ids[ma][iu], ids[mb][ju], S[iu, ju]
        lo = np.minimum(i1, i2)
        hi = np.maximum(i1, i2)
        return pa.table({"id1": pa.array(lo), "id2": pa.array(hi),
                         "cos": pa.array(cs, pa.float64())})

    reps = ds.select_columns([id_col, vec_col]).map_batches(
        replicate, batch_format="pyarrow")
    return reps.groupby("cell").map_groups(cell_pairs, batch_format="pyarrow")


def knn_join(
    left,
    right,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    grid: int = 4,
    exclude_self: bool = False,
):
    """Exact k-nearest-neighbor JOIN: for every LEFT row, its ``k`` most
    cosine-similar RIGHT rows — both sides large (contrast
    :func:`~dedupe_examples_ray.ops.ann.ann_brute_force`, which broadcasts a
    small probe set).

    Same 2-D grid as :func:`cosine_threshold_join`, directed: a left row in
    chunk ``a`` replicates to cells ``(a, *)``, a right row in chunk ``b`` to
    ``(*, b)``, so cell (a, b) holds exactly chunk-a probes x chunk-b
    candidates.  Each cell emits its LOCAL top-k per probe (``argpartition``
    on the block matmul), and a
    :func:`~dedupe_examples_ray.windows.grouped_top_n` merge keeps the global
    top-k — at most ``grid * k`` rows per probe ever reach the merge, so the
    exchange is output-sized, never |L|x|R|.  Exact, complete, deterministic
    (ties by candidate id).  ``exclude_self`` drops id-equal pairs for
    self-join use.  Null/empty vectors on either side are excluded.

    Returns (id1, id2, cos, rank) — rank 1-based per probe.
    """
    import ray

    from ..pairs import stable_hash
    from ..windows import grouped_top_n
    from .ann import _col_matrix, _normalize

    g = int(grid)
    if g < 1 or k < 1:
        raise ValueError("grid and k must be >= 1")

    def replicate(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.combine_chunks()
            vcol = t[vec_col]
            if isinstance(vcol, pa.ChunkedArray):
                vcol = vcol.combine_chunks()
            # drop null AND zero-length vectors (same contract as
            # cosine_threshold_join: an empty list would break the
            # uniform-width matrix stack in _col_matrix)
            vlens = pc.fill_null(pc.list_value_length(vcol), 0)
            if pc.any(pc.equal(vlens, 0)).as_py():
                t = t.filter(pc.greater(vlens, 0))
            n = t.num_rows
            if n == 0:
                return pa.table({
                    "cell": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    id_col: pa.array([], t[id_col].type),
                    vec_col: pa.array([], t[vec_col].type),
                })
            ids = t[id_col].to_numpy(zero_copy_only=False)
            c = (stable_hash(ids) % np.uint64(g)).astype(np.int64)
            rep = np.repeat(np.arange(n), g)
            j = np.tile(np.arange(g, dtype=np.int64), n)
            cell = c[rep] * g + j if side == 0 else j * g + c[rep]
            out = t.take(pa.array(rep))
            out = out.append_column("cell", pa.array(cell, pa.int64()))
            return out.append_column("side", pa.array(
                np.full(len(rep), side, np.int8)))

        return fn

    lrep = left.select_columns([id_col, vec_col]).map_batches(
        replicate(0), batch_format="pyarrow")
    rrep = right.select_columns([id_col, vec_col]).map_batches(
        replicate(1), batch_format="pyarrow")

    def cell_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({"id1": pa.array([], pa.int64()),
                          "id2": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        side = t["side"].to_numpy(zero_copy_only=False)
        ml, mr = side == 0, side == 1
        if not ml.any() or not mr.any():
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        M = _normalize(_col_matrix(t[vec_col], dtype=np.float64))
        S = M[ml] @ M[mr].T  # probes x candidates
        lid, rid = ids[ml], ids[mr]
        if exclude_self:
            eq = lid[:, None] == rid[None, :]
            S = np.where(eq, -np.inf, S)
        kk = min(k, S.shape[1])
        # per-probe local top-k with EXACT (cos desc, rid asc) tie order:
        # argpartition picks arbitrarily among cos ties at the k boundary,
        # which would drop a tied smaller-rid candidate before the global
        # merge (duplicate vectors make exact ties common on dedup corpora).
        # Keep everything strictly above the kth value, then the
        # smallest-rid rows among the exactly-tied (columns pre-sorted by
        # rid, so a cumsum cap selects them) — bounded at kk rows/probe.
        rorder = np.argsort(rid, kind="stable")
        S = S[:, rorder]
        rid = rid[rorder]
        thresh = np.partition(-S, kk - 1, axis=1)[:, kk - 1] * -1.0
        above = S > thresh[:, None]
        tied = S == thresh[:, None]
        need = kk - above.sum(axis=1)
        tsel = tied & (np.cumsum(tied, axis=1) <= need[:, None])
        pi, ci = np.nonzero(above | tsel)
        cs = S[pi, ci]
        keep = np.isfinite(cs)
        return pa.table({"id1": pa.array(lid[pi[keep]]),
                         "id2": pa.array(rid[ci[keep]]),
                         "cos": pa.array(cs[keep], pa.float64())})

    cells = lrep.union(rrep).groupby("cell").map_groups(
        cell_topk, batch_format="pyarrow")
    return grouped_top_n(cells, key_cols=["id1"], by="cos", n=k,
                         ascending=False, tie_cols=["id2"], rank_col="rank")
