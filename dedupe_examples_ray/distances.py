"""Distance / similarity kernels for pairwise scoring.

Implements, from published definitions, the comparator family the reference's
field variables invoke through the dedupe API (SURVEY.md §2.3 T3): edit
distance (String/ShortString), Jaro-Winkler, affine-gap alignment, TF-IDF
cosine (Text with corpus), set cosine/Jaccard (Set), haversine (LatLong),
relative price difference (Price), equality (Exact/Categorical).

All similarities are in [0, 1]; 1 = identical. Missing values are handled by
the scorer (missing-indicator features), not here.

The hot-path kernel is ``batch_levenshtein_sim``: a fully vectorized
Wagner-Fischer over the *pair axis* — one numpy op per DP row, with the
insertion dependency resolved as a running-min prefix scan
(cur[j] = min_{k<=j}(cand[k] - k) + j), so cost is O(maxlen) numpy calls per
batch instead of a Python loop per pair.
"""

from __future__ import annotations

import math

import numpy as np


def _encode_padded(strings: list, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad/truncate to ``cap`` codepoints -> (N, cap) codepoint matrix + lengths.

    All-ASCII batches (the common case — preProcess transliterates upstream)
    encode as uint8, quartering the matrix bytes the DP re-reads every row;
    any non-ASCII string falls back to uint32 codepoints for the whole batch.
    Cross-dtype equality against the other side still compares codepoints.
    """
    n = len(strings)
    ascii_ok = all((not s) or s.isascii() for s in strings)
    lens = np.zeros(n, dtype=np.int64)
    if ascii_ok:
        mat = np.zeros((n, cap), dtype=np.uint8)
        for i, s in enumerate(strings):
            if not s:
                continue
            bts = s.encode("ascii")[:cap]
            lens[i] = len(bts)
            mat[i, : len(bts)] = np.frombuffer(bts, dtype=np.uint8)
    else:
        mat = np.zeros((n, cap), dtype=np.uint32)
        for i, s in enumerate(strings):
            if not s:
                continue
            s = s[:cap]
            lens[i] = len(s)
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


_DP_CHUNK = 1536  # pairs per DP slab — keeps the whole DP working set
# (~6 live int16 arrays of (chunk, cap+1) ≈ 1 MB) resident in a core's
# PRIVATE L2, so 32 concurrent scorer workers don't contend for shared
# L3/DRAM.  Measured: at 8 MB slabs the per-pair CPU cost inflated 8.5x when
# going from 8 to 32 concurrent workers on one node; L2-sized slabs keep it
# flat — which is what makes the score stage CPU-scalable.


def batch_levenshtein_sim(a: list, b: list, cap: int = 48) -> np.ndarray:
    """Normalized Levenshtein similarity 1 - dist/max(len) for N pairs at once.

    ``None``/empty on either side yields 0.0 (the scorer masks those rows via
    missing indicators before they matter).  Exactly-equal pairs short-circuit
    to 1.0 before the DP — in duplicate-heavy blocks most compared values
    normalize to identical strings, so this skips the bulk of the work.

    The DP runs on int16 in L2-sized slabs with preallocated buffers — the
    row-vector Wagner-Fischer is memory-bound, so dtype width and slab size,
    not FLOPs, set both its speed and its multi-worker scalability.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    if n > _DP_CHUNK:
        out = np.empty(n, dtype=np.float64)
        for o in range(0, n, _DP_CHUNK):
            out[o : o + _DP_CHUNK] = batch_levenshtein_sim(a[o : o + _DP_CHUNK], b[o : o + _DP_CHUNK], cap)
        return out
    eq = np.fromiter(
        (x is not None and x != "" and x == y for x, y in zip(a, b)), dtype=bool, count=n
    )
    if eq.all():
        return np.ones(n, dtype=np.float64)
    if eq.any():
        out = np.empty(n, dtype=np.float64)
        out[eq] = 1.0
        sub_idx = np.flatnonzero(~eq)
        out[sub_idx] = batch_levenshtein_sim(
            [a[i] for i in sub_idx], [b[i] for i in sub_idx], cap
        )
        return out
    A, la = _encode_padded(a, cap)
    B, lb = _encode_padded(b, cap)
    max_la = int(la.max()) if n else 0
    lbmax = int(lb.max()) if n else 0

    dist = np.where(la == 0, lb, 0).astype(np.float64)  # la==0 rows resolved now
    if max_la > 0:
        # cell values live in [-cap, 2*cap]: int8 suffices up to cap 62 and
        # halves the slab bytes the accumulate scans stream every DP row
        dt = np.int8 if cap <= 62 else np.int16
        w = lbmax + 1
        jr = np.arange(w, dtype=dt)
        prev = np.broadcast_to(jr, (n, w)).astype(dt).copy()
        cur = np.empty((n, w), dtype=dt)
        cand = np.empty((n, lbmax), dtype=dt)
        tmp = np.empty((n, lbmax), dtype=dt)
        neq = np.empty((n, lbmax), dtype=bool)
        Bv = B[:, :lbmax]
        for i in range(1, max_la + 1):
            # cand = min(prev[:,1:] + 1, prev[:,:-1] + (A[:,i-1] != B))
            np.not_equal(A[:, i - 1 : i], Bv, out=neq)
            np.add(prev[:, :-1], neq, out=cand, casting="unsafe")
            np.add(prev[:, 1:], dt(1), out=tmp)
            np.minimum(cand, tmp, out=cand)
            # cur[j] = min_{k<=j}(t[k] - k) + j  (running-min prefix scan)
            cur[:, 0] = i
            cur[:, 1:] = cand
            cur -= jr
            np.minimum.accumulate(cur, axis=1, out=cur)
            cur += jr
            done = la == i
            if done.any():
                dist[done] = cur[done, lb[done]]
            prev, cur = cur, prev
    denom = np.maximum(np.maximum(la, lb), 1).astype(np.float64)
    sim = 1.0 - dist / denom
    sim[(la == 0) | (lb == 0)] = 0.0
    return sim


def jaro(a: str, b: str) -> float:
    """Jaro similarity (public definition)."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    sa = [c for c, m in zip(a, match_a) if m]
    sb = [c for c, m in zip(b, match_b) if m]
    transpositions = sum(x != y for x, y in zip(sa, sb)) // 2
    return (matches / la + matches / lb + (matches - transpositions) / matches) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler: Jaro boosted by common-prefix length (public definition)."""
    j = jaro(a, b)
    if j == 0.0:
        return 0.0
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def batch_jaro_winkler(a: list, b: list) -> np.ndarray:
    return np.array([jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype=np.float64)


def affine_gap_sim(a: str, b: str, mismatch: float = 1.0, gap_open: float = 1.0, gap_extend: float = 0.25) -> float:
    """Affine-gap alignment similarity (Gotoh algorithm, public definition).

    The reference's String variable uses an affine-gap string distance
    (SURVEY.md §2.3 T3, public dedupe semantics).  Normalized to [0,1]:
    1 - cost / worst_case where worst_case = opening one gap spanning the
    longer string plus mismatching the shorter.
    """
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    INF = float("inf")
    M = [0.0] + [INF] * lb
    X = [INF] * (lb + 1)  # gap in a (consuming b)
    Y = [INF] * (lb + 1)  # gap in b (consuming a)
    for j in range(1, lb + 1):
        X[j] = gap_open + (j - 1) * gap_extend
        M[j] = INF
    prevM, prevX, prevY = M[:], X[:], Y[:]
    for i in range(1, la + 1):
        M = [INF] * (lb + 1)
        X = [INF] * (lb + 1)
        Y = [INF] * (lb + 1)
        Y[0] = gap_open + (i - 1) * gap_extend
        for j in range(1, lb + 1):
            cost = 0.0 if a[i - 1] == b[j - 1] else mismatch
            M[j] = cost + min(prevM[j - 1], prevX[j - 1], prevY[j - 1])
            X[j] = min(M[j - 1] + gap_open, X[j - 1] + gap_extend)
            Y[j] = min(prevM[j] + gap_open, prevY[j] + gap_extend)
        prevM, prevX, prevY = M, X, Y
    best = min(prevM[lb], prevX[lb], prevY[lb])
    worst = gap_open + (max(la, lb) - 1) * gap_extend + min(la, lb) * mismatch
    return max(0.0, 1.0 - best / worst) if worst > 0 else 1.0


def batch_affine_gap_sim(
    a: list,
    b: list,
    cap: int = 48,
    mismatch: float = 1.0,
    gap_open: float = 1.0,
    gap_extend: float = 0.25,
) -> np.ndarray:
    """Vectorized Gotoh affine-gap similarity over the pair axis — the batch
    form of ``affine_gap_sim`` (same normalization), built like
    ``batch_levenshtein_sim``: one numpy op per DP row, float32 L2-sized
    slabs, with the in-row gap dependency X[j] = min(M[j-1]+open, X[j-1]+ext)
    resolved as a running-min prefix scan on X[j] - j*ext.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    if n > _DP_CHUNK:
        out = np.empty(n, dtype=np.float64)
        for o in range(0, n, _DP_CHUNK):
            out[o : o + _DP_CHUNK] = batch_affine_gap_sim(
                a[o : o + _DP_CHUNK], b[o : o + _DP_CHUNK], cap, mismatch, gap_open, gap_extend
            )
        return out
    eq = np.fromiter(
        (x is not None and x != "" and x == y for x, y in zip(a, b)), dtype=bool, count=n
    )
    if eq.any():
        out = np.empty(n, dtype=np.float64)
        out[eq] = 1.0
        sub = np.flatnonzero(~eq)
        if len(sub):
            out[sub] = batch_affine_gap_sim(
                [a[i] for i in sub], [b[i] for i in sub], cap, mismatch, gap_open, gap_extend
            )
        return out
    A, la = _encode_padded(a, cap)
    B, lb = _encode_padded(b, cap)
    max_la = int(la.max()) if n else 0
    lbmax = int(lb.max()) if n else 0
    w = lbmax + 1
    INF = np.float32(np.inf)
    jr = np.arange(w, dtype=np.float32)
    ext = np.float32(gap_extend)
    opn = np.float32(gap_open)
    # row 0 boundary (scalar affine_gap_sim lines M[0]=0, X[j]=open+(j-1)ext)
    M = np.full((n, w), INF, dtype=np.float32)
    M[:, 0] = 0.0
    X = np.full((n, w), INF, dtype=np.float32)
    if lbmax > 0:
        X[:, 1:] = opn + (jr[1:] - 1) * ext
    Y = np.full((n, w), INF, dtype=np.float32)
    best = np.full(n, INF, dtype=np.float32)
    done0 = la == 0
    if done0.any():  # empty a: best = X[lb] (or 0 if b also empty)
        fin = np.minimum(M, X)[done0, lb[done0]]
        best[done0] = fin
    Bv = B[:, :lbmax]
    for i in range(1, max_la + 1):
        prev_min = np.minimum(np.minimum(M, X), Y)  # (n, w) of row i-1
        cost = (A[:, i - 1 : i] != Bv).astype(np.float32) * np.float32(mismatch)
        newM = np.full((n, w), INF, dtype=np.float32)
        newM[:, 1:] = cost + prev_min[:, :-1]
        newY = np.minimum(M + opn, Y + ext)
        newY[:, 0] = opn + np.float32(i - 1) * ext
        # X[j] = min(M[j-1]+open, X[j-1]+ext) -> prefix cummin of (val - j*ext)
        T = np.full((n, w), INF, dtype=np.float32)
        T[:, 1:] = newM[:, :-1] + opn - jr[1:] * ext
        Z = np.minimum.accumulate(T, axis=1)
        newX = Z + jr * ext
        newX[:, 0] = INF
        M, X, Y = newM, newX, newY
        fin_rows = la == i
        if fin_rows.any():
            stack = np.minimum(np.minimum(M, X), Y)
            best[fin_rows] = stack[fin_rows, lb[fin_rows]]
    worst = (
        gap_open
        + (np.maximum(la, lb) - 1) * gap_extend
        + np.minimum(la, lb) * mismatch
    ).astype(np.float64)
    both_empty = (la == 0) & (lb == 0)
    one_empty = ((la == 0) | (lb == 0)) & ~both_empty
    with np.errstate(invalid="ignore"):
        sim = np.maximum(0.0, 1.0 - best.astype(np.float64) / np.maximum(worst, 1e-12))
    sim[both_empty] = 1.0
    sim[one_empty] = 0.0
    return sim


def batch_token_sig_cosine(
    offs_a: np.ndarray,
    vals_a: np.ndarray,
    lens_a: np.ndarray,
    offs_b: np.ndarray,
    vals_b: np.ndarray,
    lens_b: np.ndarray,
    idf_hash: dict | None = None,
) -> np.ndarray:
    """Cosine over precomputed sorted-unique token-hash signatures.

    Inputs are Arrow list-array views: ``offs`` (n+1 offsets into ``vals``)
    and ``lens`` (0 = missing).  Intersection of two sorted uint64 slices via
    ``np.searchsorted`` — no Python strings, sets, or per-pair allocation
    beyond two small views.  With ``idf_hash`` ({token_hash: idf weight}) the
    cosine is TF-IDF weighted, matching ``cosine_tokens`` semantics.
    """
    n = len(lens_a)
    out = np.zeros(n, dtype=np.float64)
    for i in range(n):
        la = lens_a[i]
        lb = lens_b[i]
        if la == 0 or lb == 0:
            continue
        sa = offs_a[i]
        sb = offs_b[i]
        va = vals_a[sa : sa + la]
        vb = vals_b[sb : sb + lb]
        if la < lb:
            va, vb = vb, va
            la, lb = lb, la
        pos = np.searchsorted(va, vb)
        pos[pos == la] = la - 1
        match = va[pos] == vb
        if idf_hash is None:
            inter = int(match.sum())
            if inter:
                out[i] = inter / math.sqrt(float(la) * float(lb))
        else:
            num = sum(idf_hash.get(int(h), 1.0) ** 2 for h in vb[match])
            if num:
                na = math.sqrt(sum(idf_hash.get(int(h), 1.0) ** 2 for h in va))
                nb = math.sqrt(sum(idf_hash.get(int(h), 1.0) ** 2 for h in vb))
                out[i] = num / (na * nb)
    return out


def list_array_view(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(offsets, flat values, lengths) numpy views of an Arrow list array;
    null rows get length 0.  Offsets index into the FULL child array, so this
    is correct for sliced arrays too."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.NullArray):  # all-null column (e.g. untyped literals)
        n = len(arr)
        return np.zeros(n, np.int64), np.zeros(0, np.uint64), np.zeros(n, np.int64)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False)
    lens = offs[1:] - offs[:-1]
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        lens = np.where(valid, lens, 0)
    return offs[:-1], vals, lens


_TOKEN_NONE = frozenset()


def tokens(s: str | None) -> frozenset:
    if not s:
        return _TOKEN_NONE
    return frozenset(s.split())


def cosine_tokens(ta, tb, idf: dict | None = None) -> float:
    """TF-IDF-weighted token-set cosine (Text-with-corpus comparator).

    With no idf map this degrades to plain set cosine (all weights 1).
    """
    if not ta or not tb:
        return 0.0
    if idf is None:
        inter = len(ta & tb)
        return inter / math.sqrt(len(ta) * len(tb)) if inter else 0.0
    num = sum(idf.get(t, 1.0) ** 2 for t in ta & tb)
    if num == 0.0:
        return 0.0
    na = math.sqrt(sum(idf.get(t, 1.0) ** 2 for t in ta))
    nb = math.sqrt(sum(idf.get(t, 1.0) ** 2 for t in tb))
    return num / (na * nb)


def jaccard(ta, tb) -> float:
    if not ta or not tb:
        return 0.0
    inter = len(ta & tb)
    return inter / (len(ta) + len(tb) - inter) if inter else 0.0


def haversine_km(lat1: float, lng1: float, lat2: float, lng2: float) -> float:
    """Great-circle distance in km (public formula; LatLong comparator)."""
    r = 6371.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lng2 - lng1)
    x = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(x))


def haversine_sim(lat1, lng1, lat2, lng2, scale_km: float = 10.0) -> float:
    """Distance mapped to (0,1]: 1/(1 + d/scale)."""
    return 1.0 / (1.0 + haversine_km(lat1, lng1, lat2, lng2) / scale_km)


def price_sim(pa_: float, pb: float) -> float:
    """1 - relative difference (Price comparator)."""
    if pa_ is None or pb is None:
        return 0.0
    m = max(abs(pa_), abs(pb))
    if m == 0:
        return 1.0
    return max(0.0, 1.0 - abs(pa_ - pb) / m)


def batch_price_sim(va: "np.ndarray", vb: "np.ndarray") -> "np.ndarray":
    """Vectorized :func:`price_sim` over float64 arrays (NaN = missing -> 0),
    scalar-parity tested.  Pure arithmetic — no per-row Python."""
    import numpy as np

    m = np.maximum(np.abs(va), np.abs(vb))
    with np.errstate(invalid="ignore", divide="ignore"):
        sim = np.maximum(0.0, 1.0 - np.abs(va - vb) / m)
    sim = np.where(m == 0, 1.0, sim)          # both exactly 0 -> identical
    return np.where(np.isnan(va) | np.isnan(vb), 0.0, sim)


def exact_sim(a, b) -> float:
    return 1.0 if a is not None and a == b else 0.0
