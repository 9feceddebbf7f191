"""Transitive clustering: connected components, confidence, entity map.

Reference semantics (``Dedupe.cluster``, C3): connected components of the
score-thresholded pair graph, per-member confidence = 1 - mean distance to
co-members, output ``entity_map(record_id, canon_id, cluster_score)`` with
canon_id = a distinguished member and unmatched records completed as
singletons via COALESCE (mysql_example/mysql_example.py:269-292,314-321).
We canonicalize canon_id = MIN member id so cluster ids are partition-order
independent (reference ids are enumeration order, csv_example.py:162).

Scale design: the reference holds the whole edge list + union-find in driver
memory (mysql_example.py:269-271).  Here small edge sets (< driver_limit) use
a driver union-find; larger ones use the alternating large-star / small-star
iteration (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014 — cf. PAPERS.md BTS ICDE 2024) expressed as groupby rounds over the
edge Dataset, converging to star graphs centered at each component's min id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .scale import clean_arrow as _clean_arrow, safe_coalesce


# ---------------------------------------------------------------- driver path
def union_find(edges_a: list, edges_b: list) -> dict:
    """Classic path-compressing union-find; returns {node: min-id root}."""
    parent: dict = {}
    nodes: set = set()

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges_a, edges_b):
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        # union by min so the root is always the smallest id seen
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return {x: find(x) for x in nodes}


# ----------------------------------------------------------- distributed path
# All rounds are bucketed: groupby(stable_hash(u) % B) gives B groups, and the
# per-node star logic runs as vectorized pandas transforms inside each bucket
# (per-node map_groups would pay one Python dispatch per graph node).
# B defaults via scale.buckets_for from the edge count (verdict #6: a fixed 64
# bounded per-task working set at N/64).
_CC_BUCKETS = 64


def _with_bucket(ds, col: str, num_buckets: int = _CC_BUCKETS):
    from .pairs import stable_hash

    def add(t: pa.Table) -> pa.Table:
        b = stable_hash(t[col].to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def _large_star_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Large-star (Kiveris et al.): per node u, m = min(N(u) ∪ {u}); emit
    (v, m) for neighbors v > u.  Vectorized via grouped transform."""
    vmin = df.groupby("u", sort=False)["v"].transform("min")
    m = np.minimum(vmin, df["u"])
    sel = df["v"] > df["u"]
    out = pd.DataFrame({"u": df["v"][sel], "v": m[sel]})
    return out[out["u"] != out["v"]]


def _small_star_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Small-star: input directed (u=max, v=min); per u, m = min neighbor;
    emit (v, m) for v != m plus (u, m)."""
    vmin = df.groupby("u", sort=False)["v"].transform("min")
    a = pd.DataFrame({"u": df["v"][df["v"] != vmin], "v": vmin[df["v"] != vmin]})
    b = pd.DataFrame({"u": df["u"], "v": vmin}).drop_duplicates()
    out = pd.concat([a, b], ignore_index=True)
    return out[out["u"] != out["v"]].drop_duplicates()


def _both_directions(edges_ds):
    def dup(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
                "v": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()]),
            }
        )

    return edges_ds.map_batches(dup, batch_format="pyarrow")


def _directed_large(edges_ds, num_buckets: int = _CC_BUCKETS):
    return (
        _with_bucket(_both_directions(edges_ds), "u", num_buckets)
        .groupby("bucket")
        .map_groups(lambda df: _clean_arrow(_large_star_bucket(df.drop(columns=["bucket"]))), batch_format="pandas")
    )


def _directed_small(edges_ds, num_buckets: int = _CC_BUCKETS):
    def to_small(t: pa.Table) -> pa.Table:
        u = pc.max_element_wise(t["u"], t["v"])
        v = pc.min_element_wise(t["u"], t["v"])
        return pa.table({"u": u, "v": v})

    directed = edges_ds.map_batches(to_small, batch_format="pyarrow")
    return (
        _with_bucket(directed, "u", num_buckets)
        .groupby("bucket")
        .map_groups(lambda df: _clean_arrow(_small_star_bucket(df.drop(columns=["bucket"]))), batch_format="pandas")
    )


def _dedup_edges(ds, num_buckets: int = _CC_BUCKETS):
    return (
        _with_bucket(ds, "u", num_buckets)
        .groupby("bucket")
        .map_groups(
            lambda df: _clean_arrow(
                df.drop_duplicates(subset=["u", "v"]).drop(columns=["bucket"])
            ),
            batch_format="pandas",
        )
    )


def connected_components_distributed(edges_ds, max_rounds: int = 20,
                                     num_buckets: int | None = None):
    """Alternating star rounds until the edge multiset is stable.

    Returns a Dataset (node, label) covering every node that appears in an
    edge; label = component min id.  Each round is two groupby shuffles; the
    iteration is driven from the driver (Ray Data has no native loops) with
    per-round materialization — rounds needed ≈ O(log diameter).
    """
    from .scale import resolve_buckets

    B = resolve_buckets(num_buckets, edges_ds)
    cur = _dedup_edges(edges_ds, B)
    prev_sig = None
    for _ in range(max_rounds):
        cur = _dedup_edges(_directed_large(cur, B), B)
        cur = _dedup_edges(_directed_small(cur, B), B)
        cur = cur.materialize()
        cnt = cur.count()
        # signature: count + sum of stable hashes of endpoints
        sig_ds = cur.map_batches(
            lambda t: pa.table(
                {
                    "h": pa.array(
                        [
                            np.uint64(
                                pd.util.hash_pandas_object(
                                    t.to_pandas(), index=False
                                ).sum()
                            )
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        sig = (cnt, int(sum(r["h"] for r in sig_ds.take_all())))
        if sig == prev_sig:
            break
        prev_sig = sig
    # after convergence every edge is (member, root)
    def label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["u"], "label": t["v"]})

    labels = cur.map_batches(label, batch_format="pyarrow")
    roots = cur.map_batches(
        lambda t: pa.table({"node": t["v"], "label": t["v"]}), batch_format="pyarrow"
    )
    return _dedup_labels(labels.union(roots), B)


def _dedup_labels(ds, num_buckets: int = _CC_BUCKETS):
    def min_label(df: pd.DataFrame) -> pa.Table:
        return _clean_arrow(
            df.sort_values("label", kind="stable")
            .drop_duplicates(subset=["node"])
            .drop(columns=["bucket"])
        )

    return _with_bucket(ds, "node", num_buckets).groupby("bucket").map_groups(min_label, batch_format="pandas")


def spanning_forest_batch(t: pa.Table) -> pa.Table:
    """Per-block edge contraction: replace a block's edges with its spanning
    forest (node -> block-local root), ≤ nodes-1 edges, connectivity
    preserved under ANY edge partition (Boruvka-style filtering).

    A plain ``map_batches`` stage — no shuffle — that typically shrinks the
    edge multiset by the average within-block redundancy before the global
    CC, extending the driver fast path's reach by the same factor.
    """
    ida = t["id_a"].combine_chunks() if isinstance(t["id_a"], pa.ChunkedArray) else t["id_a"]
    idb = t["id_b"].combine_chunks() if isinstance(t["id_b"], pa.ChunkedArray) else t["id_b"]
    id_type = ida.type if pa.types.is_integer(ida.type) else pa.string()
    if t.num_rows == 0:
        return pa.table({"id_a": pa.nulls(0, id_type), "id_b": pa.nulls(0, id_type)})
    if not pa.types.is_integer(id_type):
        ida = pc.cast(ida, pa.string())
        idb = pc.cast(idb, pa.string())
    both = pa.concat_arrays([ida, idb])
    enc = pc.dictionary_encode(both)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    m = t.num_rows
    root = numpy_connected_components(codes[:m], codes[m:], len(enc.dictionary))
    nodes = np.arange(len(enc.dictionary))
    keep = nodes != root
    return pa.table(
        {
            "id_a": enc.dictionary.take(pa.array(nodes[keep], pa.int64())),
            "id_b": enc.dictionary.take(pa.array(root[keep], pa.int64())),
        }
    )


def contract_edges(edges_ds):
    """Edge Dataset -> contracted edge Dataset (same connected components)."""
    return edges_ds.select_columns(["id_a", "id_b"]).map_batches(
        spanning_forest_batch, batch_format="pyarrow"
    )


def driver_label_table(edges_tbl: pa.Table) -> pa.Table:
    """Vectorized (node, label) from a pulled edge table — the numpy /
    dictionary-encode CC of :func:`driver_cluster_table` without the
    confidence columns.  label = MIN member id (numeric order for integer
    ids, lexicographic for strings — matching ``union_find``'s min-root)."""
    m = edges_tbl.num_rows
    raw_a = edges_tbl["id_a"].combine_chunks() if isinstance(edges_tbl["id_a"], pa.ChunkedArray) else edges_tbl["id_a"]
    raw_b = edges_tbl["id_b"].combine_chunks() if isinstance(edges_tbl["id_b"], pa.ChunkedArray) else edges_tbl["id_b"]
    if pa.types.is_integer(raw_a.type):
        if m == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        both = np.concatenate(
            [raw_a.to_numpy(zero_copy_only=False), raw_b.to_numpy(zero_copy_only=False)]
        )
        codes, uniq = pd.factorize(both)  # hash-based, ~2.3x np.unique
        codes = codes.astype(np.int64)
        uniq = np.asarray(uniq, dtype=np.int64)
        root = numpy_connected_components(codes[:m], codes[m:], len(uniq))
        lab_min = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(lab_min, root, uniq)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "label": pa.array(lab_min[root], pa.int64())})
    if m == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "label": pa.array([], pa.string())})
    ida = pc.cast(raw_a, pa.string())
    idb = pc.cast(raw_b, pa.string())
    both = pa.concat_arrays([ida, idb])
    enc = pc.dictionary_encode(both)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_arr = enc.dictionary
    n = len(uniq_arr)
    root = numpy_connected_components(codes[:m], codes[m:], n)
    order = pc.array_sort_indices(uniq_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    minrank = np.full(n, n, dtype=np.int64)
    np.minimum.at(minrank, root, rank)
    label = uniq_arr.take(pa.array(order[minrank[root]], pa.int64()))
    return pa.table({"node": uniq_arr, "label": label})


def connected_components(edges_ds, driver_limit: int = 30_000_000,
                         max_rounds: int = 20, driver_bytes: int = 4 << 30):
    """(id_a, id_b) edge Dataset -> (node, label) Dataset.

    Edge sets under ``driver_limit`` rows AND ``driver_bytes`` take the
    vectorized driver fast path (numpy hooking CC over one zero-copy pull —
    the flagship ER pipeline's posture; the old Python-dict union-find limit
    of 2M edges forced a 6.26M-page minhash run into tens of minutes of
    star-round micro-tasks); larger sets run distributed star rounds.
    """
    edges_ds = edges_ds.materialize()  # one execution serves count + pull
    n_edges = edges_ds.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}))
    if n_edges <= driver_limit and (edges_ds.size_bytes() or 0) <= driver_bytes:
        import ray
        import ray.data as rd

        tbls = [
            t for t in ray.get(
                edges_ds.select_columns(["id_a", "id_b"]).to_arrow_refs()
            ) if t.num_rows
        ]
        tbl = pa.concat_tables(tbls) if tbls else pa.table(
            {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
        )
        lab = driver_label_table(tbl)
        step = 1 << 20
        return rd.from_arrow(
            [lab.slice(o, step) for o in range(0, max(lab.num_rows, 1), step)]
        )
    renamed = edges_ds.map_batches(
        lambda t: pa.table({"u": t["id_a"], "v": t["id_b"]}), batch_format="pyarrow"
    )
    from .scale import buckets_for

    # both directions of every edge travel each round
    return connected_components_distributed(
        renamed, max_rounds=max_rounds, num_buckets=buckets_for(2 * n_edges)
    )


# ----------------------------------------------------------------- confidence
def member_confidence(scored_edges_ds):
    """Per-member cluster confidence = mean score over edges touching the
    member (reference C1: 1 - mean distance to co-members, distance=1-score).

    Only within-cluster (thresholded) edges should be passed in.
    """
    from ray.data.aggregate import Mean

    def explode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays([t["id_a"].combine_chunks(), t["id_b"].combine_chunks()]),
                "score": pa.concat_arrays([t["score"].combine_chunks(), t["score"].combine_chunks()]),
            }
        )

    return (
        scored_edges_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Mean("score", alias_name="cluster_score"))
    )


# ----------------------------------------------------------------- entity map
# Per-worker cache for broadcast lookup maps (task functions resolve a
# ray.put ref once per worker process — no actor-pool startup cost).
_BCAST_CACHE: dict = {}


def _get_broadcast(ref):
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            key = ref.hex()
            if key not in _BCAST_CACHE:
                _BCAST_CACHE[key] = ray.get(ref)
            return _BCAST_CACHE[key]
    except ImportError:
        pass
    return ref


def numpy_connected_components(a: np.ndarray, b: np.ndarray, n_nodes: int) -> np.ndarray:
    """Vectorized hooking + pointer-jumping CC over integer node codes.

    O(E) numpy work per round, O(log n) rounds (Shiloach-Vishkin shape) —
    replaces the per-edge Python union-find loop on the driver fast path.
    Returns the root code per node (root = smallest code in the component
    under min-hooking, but label canonicalization happens by id string in
    ``driver_cluster_table``).
    """
    parent = np.arange(n_nodes, dtype=np.int64)
    for _ in range(64):
        pa_ = parent[a]
        pb = parent[b]
        if not (pa_ != pb).any():
            break
        lo = np.minimum(pa_, pb)
        hi = np.maximum(pa_, pb)
        np.minimum.at(parent, hi, lo)
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    return parent


def driver_cluster_table(edges) -> pa.Table:
    """Driver fast path: one pulled edge table -> (node, label, score) table.

    Mirrors the reference's in-driver posture (mysql_example.py:269-271) for
    edge sets under the driver limit; all heavy steps stay out of Python —
    Arrow ``dictionary_encode`` for node codes (C++, vs a pandas factorize
    that walks 2E Python objects), numpy hooking/pointer-jumping CC,
    Arrow sort for rank-based min-id labels, bincount confidences.
    Accepts a pyarrow Table or a pandas DataFrame (id_a, id_b, score).
    """
    if isinstance(edges, pd.DataFrame):
        edges = pa.Table.from_pandas(edges, preserve_index=False)
    m = edges.num_rows
    raw_a = edges["id_a"].combine_chunks() if isinstance(edges["id_a"], pa.ChunkedArray) else edges["id_a"]
    raw_b = edges["id_b"].combine_chunks() if isinstance(edges["id_b"], pa.ChunkedArray) else edges["id_b"]
    if pa.types.is_integer(raw_a.type):
        # surrogate-uid edges: pure-numpy path (no string materialization);
        # label = MIN member uid (uniq is sorted, min-hooking root = min code)
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
        if m == 0:
            return empty
        both = np.concatenate(
            [raw_a.to_numpy(zero_copy_only=False), raw_b.to_numpy(zero_copy_only=False)]
        )
        # pd.factorize (hash-based) beats the sort-based np.unique ~2.3x at
        # 1.5M+ edges; uniq is UNSORTED, so the min-member label is
        # re-derived per root instead of relying on sorted-code hooking
        codes, uniq = pd.factorize(both)
        codes = codes.astype(np.int64)
        uniq = np.asarray(uniq, dtype=np.int64)
        n = len(uniq)
        root = numpy_connected_components(codes[:m], codes[m:], n)
        lab_min = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(lab_min, root, uniq)
        s = edges["score"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(codes, minlength=n)
        ssum = np.bincount(codes, weights=np.concatenate([s, s]), minlength=n)
        conf = ssum / np.maximum(cnt, 1)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "label": pa.array(lab_min[root], pa.int64()),
                "score": pa.array(conf, pa.float64()),
            }
        )
    empty = pa.table(
        {"node": pa.array([], pa.string()), "label": pa.array([], pa.string()),
         "score": pa.array([], pa.float64())}
    )
    if m == 0:
        return empty
    ida = pc.cast(raw_a, pa.string())
    idb = pc.cast(raw_b, pa.string())
    both = pa.concat_arrays([ida, idb])
    enc = pc.dictionary_encode(both)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_arr = enc.dictionary
    n = len(uniq_arr)
    root = numpy_connected_components(codes[:m], codes[m:], n)
    # canonical label = lexicographically smallest member id, via ranks
    order = pc.array_sort_indices(uniq_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    minrank = np.full(n, n, dtype=np.int64)
    np.minimum.at(minrank, root, rank)
    label = uniq_arr.take(pa.array(order[minrank[root]], pa.int64()))
    # per-member confidence = mean score over incident within-cluster edges
    s = edges["score"].to_numpy(zero_copy_only=False).astype(np.float64)
    cnt = np.bincount(codes, minlength=n)
    ssum = np.bincount(codes, weights=np.concatenate([s, s]), minlength=n)
    conf = ssum / np.maximum(cnt, 1)
    return pa.table(
        {
            "node": uniq_arr,
            "label": label,
            "score": pa.array(conf, pa.float64()),
        }
    )


class StreamingEdgeCC:
    """Incremental driver-side connected components + per-node confidence
    over STREAMED int64 edge batches.

    Doubling-merge contraction stack: ``push`` does O(batch) vectorized work
    (one hash factorize -> hooking CC -> per-root min label -> bincount
    confidence partials) and two adjacent stack levels merge whenever the
    upper reaches half the lower, so total work is O(E log B) — and every
    merge except the last overlaps the still-running score stage that
    produces the batches.  ``finish`` returns the same ``(node, label,
    score)`` table as :func:`driver_cluster_table` on the full edge set
    (labels exactly equal; scores equal up to float summation order), but
    the pipeline's SERIAL tail shrinks from edge-pull + full driver CC to
    one small final merge (round-4 profile: 0.11 s + 0.36-0.44 s of the
    8.9 s flagship wall were serial here).

    A level is ``(nodes, labels, cnt, ssum)``: unique int64 node ids, the
    component-min label among data seen by that level, and per-node partial
    confidence sums (count of incident edge endpoints / sum of their
    scores).  Levels are themselves valid edge sets (node -> label), so
    merging is the same contraction applied to two levels' pairs.
    """

    def __init__(self):
        self._levels: list[tuple] = []

    @staticmethod
    def _contract(ea, eb, wn, wc, ws):
        """Edges (ea,eb) + node-keyed partial weights (wn,wc,ws) -> level."""
        m = len(ea)
        codes, uniq = pd.factorize(np.concatenate([ea, eb, wn]))
        codes = codes.astype(np.int64)
        uniq = np.asarray(uniq, dtype=np.int64)
        n = len(uniq)
        root = numpy_connected_components(codes[:m], codes[m : 2 * m], n)
        lab_min = np.full(n, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(lab_min, root, uniq)
        wcodes = codes[2 * m :]
        cnt = np.bincount(wcodes, weights=wc, minlength=n)
        ssum = np.bincount(wcodes, weights=ws, minlength=n)
        return (uniq, lab_min[root], cnt, ssum)

    def push(self, id_a: np.ndarray, id_b: np.ndarray, score: np.ndarray):
        if len(id_a) == 0:
            return
        ones = np.ones(len(id_a), np.float64)
        self._levels.append(
            self._contract(
                id_a, id_b,
                np.concatenate([id_a, id_b]),
                np.concatenate([ones, ones]),
                np.concatenate([score, score]),
            )
        )
        while (
            len(self._levels) >= 2
            and 2 * len(self._levels[-1][0]) >= len(self._levels[-2][0])
        ):
            self._merge_top()

    def _merge_top(self):
        x = self._levels.pop()
        y = self._levels.pop()
        nodes = np.concatenate([x[0], y[0]])
        self._levels.append(
            self._contract(
                nodes,
                np.concatenate([x[1], y[1]]),
                nodes,
                np.concatenate([x[2], y[2]]),
                np.concatenate([x[3], y[3]]),
            )
        )

    def finish(self) -> pa.Table:
        while len(self._levels) >= 2:
            self._merge_top()
        if not self._levels:
            return pa.table(
                {"node": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        nodes, labels, cnt, ssum = self._levels[0]
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(labels, pa.int64()),
                "score": pa.array(ssum / np.maximum(cnt, 1.0), pa.float64()),
            }
        )


def stream_edges_to_driver(edges_ds, driver_limit: int, driver_bytes: int,
                           want_uf: bool = True):
    """Consume a (lazy) scored-edge Dataset on the driver AS IT EXECUTES.

    The streaming executor runs the whole block->pair->score chain in
    parallel while the driver folds each finished edge block into
    :class:`StreamingEdgeCC` during what used to be idle wait — taking the
    edge pull and the driver CC off the serial tail.

    Returns ``(mode, payload)``:

    - ``("uf", label_tbl)`` — int64 ids, ``want_uf``: the finished
      ``(node, label, score)`` table (driver_cluster_table parity).
    - ``("tables", edges_tbl)`` — non-integer ids or average linkage: the
      concatenated edge table for :func:`driver_cluster_table` /
      :func:`driver_refine_table` (the pull still overlapped scoring).
    - ``("empty", None)`` — the stream produced no edges.
    - ``("spill", Dataset)`` — the stream exceeded ``driver_limit`` rows or
      ``driver_bytes``: everything (already-consumed batches + remainder)
      is spilled to /tmp parquet and handed back as a Dataset for the
      distributed star-round path, driver memory bounded by the budget
      exactly like the old pull-then-decide flow.
    """
    import pyarrow.parquet as pq

    acc: list[pa.Table] = []
    rows = 0
    nbytes = 0
    uf: StreamingEdgeCC | None = None
    use_uf = False
    first = True
    # iter_batches returns a RE-ITERABLE; take one iterator so the spill
    # branch's remainder loop continues the same stream instead of
    # restarting (and re-executing) the pipeline from block zero.
    # prefetch=8: the edge blocks surface in a burst once the pair shuffle
    # barrier clears, and lock-step prefetch=1 leaves the executor waiting
    # on the driver between blocks (measured 8.12 -> 7.64 s flagship wall).
    it = iter(
        edges_ds.select_columns(["id_a", "id_b", "score"]).iter_batches(
            batch_format="pyarrow", batch_size=None, prefetch_batches=8
        )
    )
    for t in it:
        if t.num_rows == 0:
            continue
        if first:
            first = False
            use_uf = want_uf and pa.types.is_integer(t["id_a"].type)
            if use_uf:
                uf = StreamingEdgeCC()
        acc.append(t)
        rows += t.num_rows
        nbytes += t.nbytes
        if use_uf:
            uf.push(
                t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
                t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False),
                t["score"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False),
            )
        if rows > driver_limit or nbytes > driver_bytes:
            import tempfile

            import ray.data as rd

            d = tempfile.mkdtemp(prefix="edges_spill_", dir="/tmp")
            n = 0
            for tt in acc:
                pq.write_table(tt, f"{d}/part-{n:05d}.parquet")
                n += 1
            acc.clear()
            for tt in it:  # stream the remainder straight to disk
                if tt.num_rows:
                    pq.write_table(tt, f"{d}/part-{n:05d}.parquet")
                    n += 1
            return "spill", rd.read_parquet(d).materialize()
    if first:
        return "empty", None
    if use_uf:
        return "uf", uf.finish()
    return "tables", pa.concat_tables(acc)


def driver_refine_table(edges, threshold: float,
                        max_members: int = 2000) -> pa.Table:
    """Driver fast path for ``linkage="average"``: CC over the pulled edge
    table, then per-component average-linkage re-cut at ``threshold``
    (:func:`_avg_linkage_split`) — the reference library's hierarchical
    cluster semantics (dedupe ``cluster()`` cuts a linkage dendrogram at the
    partition threshold) without leaving the driver.

    Output matches :func:`driver_cluster_table`: (node, label, score) with
    label = MIN member id of the REFINED sub-cluster and score = mean
    incident edge score (same confidence definition as the CC path, so the
    two linkage modes differ only in the partition).  Components of <= 2
    members keep their CC grouping vectorized; only components with >= 3
    members enter the per-component linkage loop.
    """
    if isinstance(edges, pd.DataFrame):
        edges = pa.Table.from_pandas(edges, preserve_index=False)
    m = edges.num_rows
    raw_a = edges["id_a"].combine_chunks() if isinstance(edges["id_a"], pa.ChunkedArray) else edges["id_a"]
    raw_b = edges["id_b"].combine_chunks() if isinstance(edges["id_b"], pa.ChunkedArray) else edges["id_b"]
    int_ids = pa.types.is_integer(raw_a.type)
    id_t = pa.int64() if int_ids else pa.string()
    if m == 0:
        return pa.table(
            {"node": pa.array([], id_t), "label": pa.array([], id_t),
             "score": pa.array([], pa.float64())}
        )
    if int_ids:
        both = np.concatenate(
            [raw_a.to_numpy(zero_copy_only=False), raw_b.to_numpy(zero_copy_only=False)]
        )
        uniq, codes = np.unique(both, return_inverse=True)
        codes = codes.astype(np.int64)
        uniq_arr = None
    else:
        ida = pc.cast(raw_a, pa.string())
        idb = pc.cast(raw_b, pa.string())
        enc = pc.dictionary_encode(pa.concat_arrays([ida, idb]))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_arr = enc.dictionary
        uniq = None
    n = int(codes.max()) + 1
    codes_a, codes_b = codes[:m], codes[m:]
    root = numpy_connected_components(codes_a, codes_b, n)
    s = edges["score"].to_numpy(zero_copy_only=False).astype(np.float64)

    # refined group id per node, seeded with the CC root; components with
    # >= 3 members are re-cut one at a time (each is pair-evidence-bounded)
    group = root.copy()
    comp_sizes = np.bincount(root, minlength=n)
    comp_e = root[codes_a]  # per-edge component (id_b shares the root)
    big_e = np.flatnonzero(comp_sizes[comp_e] >= 3)
    if len(big_e):
        ca, cb, ss, cc = codes_a[big_e], codes_b[big_e], s[big_e], comp_e[big_e]
        o = np.argsort(cc, kind="stable")
        ca, cb, ss, cc = ca[o], cb[o], ss[o], cc[o]
        bounds = np.flatnonzero(np.diff(cc)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cc)]])
        for st, en in zip(starts, ends):
            ea_, eb_, s_ = ca[st:en], cb[st:en], ss[st:en]
            members = np.unique(np.concatenate([ea_, eb_]))
            gi = _avg_linkage_split(members, ea_, eb_, s_, threshold, max_members)
            for v in np.unique(gi):
                mem = members[gi == v]
                group[mem] = mem.min()  # group rep = min member CODE (any rep works)

    # canonical label per refined group (min member id, rank-based for strings)
    cnt = np.bincount(codes, minlength=n)
    ssum = np.bincount(codes, weights=np.concatenate([s, s]), minlength=n)
    conf = ssum / np.maximum(cnt, 1)
    if int_ids:
        # uniq is sorted, so min code within a group = min uid
        mincode = np.full(n, n, dtype=np.int64)
        np.minimum.at(mincode, group, np.arange(n, dtype=np.int64))
        return pa.table(
            {"node": pa.array(uniq, pa.int64()),
             "label": pa.array(uniq[mincode[group]], pa.int64()),
             "score": pa.array(conf, pa.float64())}
        )
    order = pc.array_sort_indices(uniq_arr).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    minrank = np.full(n, n, dtype=np.int64)
    np.minimum.at(minrank, group, rank)
    label = uniq_arr.take(pa.array(order[minrank[group]], pa.int64()))
    return pa.table(
        {"node": uniq_arr, "label": label, "score": pa.array(conf, pa.float64())}
    )


def driver_cluster_confidence(edges_df: pd.DataFrame) -> tuple[dict, dict]:
    """Dict-map variant of ``driver_cluster_table`` (compat API)."""
    tbl = driver_cluster_table(edges_df)
    nodes = tbl["node"].to_pylist()
    label_map = dict(zip(nodes, tbl["label"].to_pylist()))
    conf_map = dict(zip(nodes, tbl["score"].to_pylist()))
    return label_map, conf_map


def entity_map_from_table(records_ds, id_col: str, label_tbl: pa.Table):
    """ids + broadcast (node,label,score) Arrow table -> entity map.

    The record-id side is stringified, so a numeric label table (integer-id
    corpora take ``driver_cluster_table``'s numpy branch; canon = numeric MIN
    member) is stringified to match before the broadcast."""
    import ray

    ids = records_ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"record_id": pc.cast(t[id_col], pa.string())}),
        batch_format="pyarrow",
    )
    label_tbl = label_tbl.combine_chunks()
    if not pa.types.is_string(label_tbl["node"].type):
        cols = {
            "node": pc.cast(label_tbl["node"], pa.string()),
            "label": pc.cast(label_tbl["label"], pa.string()),
        }
        if "score" in label_tbl.column_names:
            cols["score"] = label_tbl["score"]
        label_tbl = pa.table(cols)
    ref = ray.put(label_tbl)
    return ids.map_batches(
        _annotate_from_table, fn_kwargs=dict(tbl_ref=ref), batch_format="pyarrow",
        batch_size=None,
    )


_LBL_INDEX_CACHE: dict = {}


def _annotate_from_table(t: pa.Table, tbl_ref) -> pa.Table:
    """Zero-copy broadcast annotation: (node, label, score) Arrow table in the
    object store; the node-id hash index is built ONCE per worker process and
    reused across blocks (a per-block ``pc.index_in`` rebuilds the value-set
    hash every call — measured to dominate the stage at >500k labels)."""
    import ray

    key = tbl_ref.hex() if hasattr(tbl_ref, "hex") else id(tbl_ref)
    got = _LBL_INDEX_CACHE.get(key)
    if got is None:
        import pandas as pd

        lbl = ray.get(tbl_ref) if isinstance(tbl_ref, ray.ObjectRef) else tbl_ref
        lbl = lbl.combine_chunks()
        got = (pd.Index(lbl["node"].to_pandas()), lbl)
        _LBL_INDEX_CACHE.clear()  # one live label table per pipeline run
        _LBL_INDEX_CACHE[key] = got
    node_idx, lbl = got
    pos = node_idx.get_indexer(t["record_id"].to_pandas())
    # misses (singletons) become nulls via the validity mask — no Python loop
    idx = pa.array(pos.astype("int64"), type=pa.int64(), mask=pos < 0)
    canon = safe_coalesce(
        pc.take(lbl["label"], idx), pc.cast(t["record_id"], pa.string())
    )
    cols = {"record_id": t["record_id"], "canon_id": canon}
    if "score" in lbl.column_names:
        cols["cluster_score"] = pc.take(lbl["score"], idx)
    return pa.table(cols)


def build_entity_map(
    records_ds,
    id_col: str,
    labels_ds,
    confidence_ds=None,
    num_partitions: int = 16,
    broadcast_limit: int = 5_000_000,
):
    """All records -> (record_id, canon_id, cluster_score); singleton
    completion via COALESCE (reference J6, mysql_example.py:314-321).

    The label side only contains *clustered* records.  When it fits the
    broadcast budget it ships once to an actor pool (no shuffle of the full
    record set); otherwise a hash join with ``num_partitions`` partitions
    (size to O(total_bytes / block size) on a real cluster).
    """
    ids = records_ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"record_id": pc.cast(t[id_col], pa.string())}),
        batch_format="pyarrow",
    )
    n_labels = labels_ds.count()
    if n_labels <= broadcast_limit:
        import ray

        # one Arrow broadcast table (zero-copy per worker, vectorized lookup
        # in _annotate_from_table) — never a Python-dict broadcast
        lab = labels_ds.to_pandas()
        if confidence_ds is not None:
            lab = lab.merge(confidence_ds.to_pandas(), on="node", how="left")
        tbl = {
            "node": pa.array(lab["node"].astype(str), pa.string()),
            "label": pa.array(lab["label"].astype(str), pa.string()),
        }
        if "cluster_score" in lab.columns:
            tbl["score"] = pa.array(lab["cluster_score"], pa.float64(), from_pandas=True)
        return ids.map_batches(
            _annotate_from_table,
            fn_kwargs=dict(tbl_ref=ray.put(pa.table(tbl))),
            batch_format="pyarrow",
            batch_size=None,
        )

    labels = labels_ds.map_batches(
        lambda t: pa.table(
            {"record_id": pc.cast(t["node"], pa.string()), "canon_id": pc.cast(t["label"], pa.string())}
        ),
        batch_format="pyarrow",
    )
    joined = ids.join(labels, join_type="left_outer", num_partitions=num_partitions, on=("record_id",))
    joined = joined.map_batches(
        lambda t: pa.table(
            {
                "record_id": t["record_id"],
                "canon_id": safe_coalesce(t["canon_id"], t["record_id"]),
            }
        ),
        batch_format="pyarrow",
    )
    if confidence_ds is not None:
        conf = confidence_ds.map_batches(
            lambda t: pa.table(
                {"record_id": pc.cast(t["node"], pa.string()), "cluster_score": t["cluster_score"]}
            ),
            batch_format="pyarrow",
        )
        joined = joined.join(
            conf, join_type="left_outer", num_partitions=num_partitions, on=("record_id",)
        )
    return joined


# -------------------------------------------------- surrogate-uid entity map
def _label_min_table(t: pa.Table) -> pa.Table:
    """``SELECT label, MIN(record_id) GROUP BY label`` as an Arrow hash
    aggregate — C++ kernel on string minima (the pandas object-dtype groupby
    this replaced was the single largest serial cost of the broadcast-tier
    entity map: 5.6 s of a 28 s headline run at 626k pages)."""
    out = pa.TableGroupBy(t, "label").aggregate([("record_id", "min")])
    return pa.table({"label": out["label"], "record_id": out["record_id_min"]})


def uid_array(values) -> np.ndarray:
    """int64 surrogate uid for an id array: ``stable_hash >> 1`` (63 bits —
    int64-safe for pandas/parquet/DuckDB; collision odds ~n^2/2^64 stay
    negligible and are CHECKED once per run by the pipeline)."""
    from .pairs import stable_hash

    return (stable_hash(values) >> np.uint64(1)).astype(np.int64)


def add_uid_column(t: pa.Table, id_col: str, uid_col: str = "__uid") -> pa.Table:
    ids = t[id_col].to_numpy(zero_copy_only=False)
    if uid_col in t.column_names:
        t = t.drop_columns([uid_col])
    return t.append_column(uid_col, pa.array(uid_array(ids), pa.int64()))


def _min_by_key_bucketed(ds, key_col: str, val_col: str, num_buckets: int | None = None):
    """Distributed ``SELECT key, MIN(val) GROUP BY key`` with a per-batch
    combiner (only per-batch minima travel the shuffle)."""
    from .pairs import stable_hash
    from .scale import resolve_buckets

    B = resolve_buckets(num_buckets, ds)

    def local(df: pd.DataFrame) -> pa.Table:
        u = df.groupby(key_col, sort=False, dropna=False)[val_col].min().reset_index()
        u["__bkt"] = (stable_hash(u[key_col].to_numpy()) % B).astype(np.int64)
        return _clean_arrow(u)

    def final(df: pd.DataFrame) -> pa.Table:
        return _clean_arrow(
            df.groupby(key_col, sort=False, dropna=False)[val_col].min().reset_index()
        )

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(local, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(final, batch_format="pandas")
    )


_UID_IDX_CACHE: dict = {}


def _uid_label_index(ref, node_col: str = "node"):
    """Per-worker cached sorted-key index over a broadcast int64-keyed table:
    (sorted_keys, argsort_order, table).  Building the lookup structure once
    per worker instead of a per-block ``pc.index_in`` value-set hash build is
    the uid twin of ``_LBL_INDEX_CACHE`` (measured to dominate the annotate
    stage at >500k labels)."""
    key = (ref.hex() if hasattr(ref, "hex") else id(ref), node_col)
    got = _UID_IDX_CACHE.get(key)
    if got is None:
        m = _get_broadcast(ref)
        nodes = m[node_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(nodes, kind="stable").astype(np.int64)
        got = (nodes[order], order, m)
        if len(_UID_IDX_CACHE) >= 8:
            _UID_IDX_CACHE.pop(next(iter(_UID_IDX_CACHE)))
        _UID_IDX_CACHE[key] = got
    return got


def _sorted_lookup(sorted_keys, order, queries):
    """Vectorized exact lookup against a sorted key array: returns
    (row_in_original_table, hit_mask); misses carry an arbitrary in-range
    row and hit=False."""
    pos = np.searchsorted(sorted_keys, queries)
    pos_c = np.minimum(pos, max(len(sorted_keys) - 1, 0))
    if len(sorted_keys) == 0:
        return np.zeros(len(queries), np.int64), np.zeros(len(queries), bool)
    hit = sorted_keys[pos_c] == queries
    return order[pos_c], hit


def start_member_ids_pull(records_ds, id_col: str, edges_tbl: pa.Table | None,
                          nodes: np.ndarray | None = None):
    """Begin pulling ``(__uid, record_id)`` for every EDGE NODE concurrently
    with driver clustering.

    Edge nodes are exactly the clustered nodes (every label comes from an
    edge), so the entity map's canon resolution — a full corpus scan — no
    longer waits behind the driver CC: the scan streams while CC runs and
    the driver joins the thread afterwards.  Returns a handle whose
    ``join()`` yields the member table, or ``None`` on any failure (the
    caller then falls back to ``build_entity_map_uid``'s own synchronous
    pull — identical output, just serial).
    """
    import threading

    import ray

    res: dict = {}
    if nodes is None:
        ua = edges_tbl["id_a"].to_numpy(zero_copy_only=False)
        vb = edges_tbl["id_b"].to_numpy(zero_copy_only=False)
        nodes = (
            np.unique(np.concatenate([ua, vb])).astype(np.int64)
            if len(ua)
            else np.zeros(0, np.int64)
        )
    else:
        # streamed-CC path: the label table's node column IS the edge node
        # set (unique already); sort for the searchsorted membership probe
        nodes = np.sort(np.asarray(nodes, dtype=np.int64))
    nodes_ref = ray.put(nodes)
    has_uid = "__uid" in records_ds.schema().names
    proj_cols = [id_col, "__uid"] if has_uid else [id_col]

    def member_ids(t: pa.Table) -> pa.Table:
        nd = _get_broadcast(nodes_ref)
        if has_uid:
            uid = t["__uid"].to_numpy(zero_copy_only=False)
        else:
            uid = uid_array(t[id_col].to_numpy(zero_copy_only=False))
        if len(nd) == 0:
            hit = np.zeros(len(uid), bool)
        else:
            pos = np.minimum(np.searchsorted(nd, uid), len(nd) - 1)
            hit = nd[pos] == uid
        rid = pc.cast(t[id_col], pa.string())
        if isinstance(rid, pa.ChunkedArray):
            rid = rid.combine_chunks()
        mask = pa.array(hit)
        return pa.table(
            {
                "__uid": pa.array(uid[hit], pa.int64()),
                "record_id": rid.filter(mask),
            }
        )

    ds = records_ds.select_columns(proj_cols).map_batches(
        member_ids, batch_format="pyarrow"
    )

    def run():
        try:
            tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
            res["tbl"] = (
                pa.concat_tables(tbls).combine_chunks()
                if tbls
                else pa.table(
                    {
                        "__uid": pa.array([], pa.int64()),
                        "record_id": pa.array([], pa.string()),
                    }
                )
            )
        except Exception as exc:  # degrade to the synchronous pull
            res["err"] = exc

    th = threading.Thread(target=run, daemon=True)
    th.start()

    class _Handle:
        def join(self):
            th.join()
            if "err" in res:
                import logging

                logging.getLogger("dedupe_examples_ray").warning(
                    "concurrent member-id pull failed (%s); using the "
                    "synchronous path", res["err"],
                )
                return None
            return res["tbl"]

    return _Handle()


def build_entity_map_uid(
    records_ds,
    id_col: str,
    labels,
    confidence_ds=None,
    broadcast_limit: int = 20_000_000,
    member_ids_tbl: pa.Table | None = None,
):
    """Surrogate-uid labels -> (record_id, canon_id, cluster_score), output-
    identical to ``build_entity_map`` on raw string ids (canon = MIN member
    *string* id; singleton completion via COALESCE).

    ``labels``: (node:int64 uid, label:int64[, score]) as a Dataset or a
    driver-side Arrow table (the CC fast path).  The uid->string resolution
    is two extra passes over the slim id projection — the payoff is that the
    PAIR and EDGE shuffles upstream moved int64 ids instead of two full URL
    strings per row (round-2 verdict #5).

    Under ``broadcast_limit`` clustered nodes: broadcast the uid label table,
    pull the (label, record_id) pairs of clustered rows (bounded by the same
    limit), resolve canon strings on the driver, broadcast the tiny
    (label, canon) map back.  Over the limit: three distributed hash_joins
    (labels x confidence, ids x labels, result x canon map) — nothing
    driver-resident scales with the corpus.
    """
    import ray

    # reuse a carried __uid column (the surrogate pipeline's id source is the
    # materialized uid view) instead of re-hashing every id string per pass
    has_uid = "__uid" in records_ds.schema().names

    def project_ids(t: pa.Table) -> pa.Table:
        cols = {"record_id": pc.cast(t[id_col], pa.string())}
        if has_uid:
            cols["__uid"] = t["__uid"]
        return pa.table(cols)

    ids = records_ds.select_columns(
        [id_col, "__uid"] if has_uid else [id_col]
    ).map_batches(project_ids, batch_format="pyarrow")

    def batch_uid(t: pa.Table) -> pa.Array:
        if has_uid:
            col = t["__uid"]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return pa.array(
            uid_array(t["record_id"].to_numpy(zero_copy_only=False)), pa.int64()
        )

    if isinstance(labels, pa.Table):
        n_labels = labels.num_rows
        labels_tbl, labels_ds = labels, None
    else:
        labels_ds = labels.materialize()
        n_labels = labels_ds.count()
        labels_tbl = None

    if n_labels == 0:  # no clusters: everyone is their own canon
        return ids.map_batches(
            lambda t: pa.table(
                {
                    "record_id": t["record_id"],
                    "canon_id": t["record_id"],
                    "cluster_score": pa.nulls(t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )

    if n_labels <= broadcast_limit:
        if labels_tbl is None:
            if confidence_ds is None:
                # zero-copy Arrow pull — no driver pandas conversion (the
                # scale-safety guard forbids Dataset.to_pandas in dedup paths)
                tbls = [
                    t for t in ray.get(labels_ds.to_arrow_refs()) if t.num_rows
                ]
                t_all = (
                    pa.concat_tables(tbls).combine_chunks()
                    if tbls
                    else pa.table({"node": pa.array([], pa.int64()),
                                   "label": pa.array([], pa.int64())})
                )
                cols = {
                    "node": pc.cast(t_all["node"], pa.int64()),
                    "label": pc.cast(t_all["label"], pa.int64()),
                }
                if "score" in t_all.column_names:
                    cols["score"] = pc.cast(t_all["score"], pa.float64())
                labels_tbl = pa.table(cols)
            else:
                lab = labels_ds.to_pandas()
                lab = lab.merge(confidence_ds.to_pandas(), on="node", how="left")
                lab = lab.rename(columns={"cluster_score": "score"})
                cols = {
                    "node": pa.array(lab["node"].astype(np.int64), pa.int64()),
                    "label": pa.array(lab["label"].astype(np.int64), pa.int64()),
                    "score": pa.array(lab["score"], pa.float64(), from_pandas=True),
                }
                labels_tbl = pa.table(cols)
        from .timing import stage_timer as _st

        with _st("em: labels put"):
            ref = ray.put(labels_tbl.combine_chunks())

        def clustered(t: pa.Table) -> pa.Table:
            nodes_sorted, order, m = _uid_label_index(ref)
            uid = batch_uid(t).to_numpy(zero_copy_only=False)
            row, hit_np = _sorted_lookup(nodes_sorted, order, uid)
            hit = pa.array(hit_np)
            idx = pa.array(row, pa.int64(), mask=~hit_np)
            part = pa.table(
                {
                    "label": pc.take(m["label"].combine_chunks(), idx.filter(hit)),
                    "record_id": t["record_id"].filter(hit)
                    if not isinstance(t["record_id"], pa.ChunkedArray)
                    else t["record_id"].combine_chunks().filter(hit),
                }
            )
            # combiner: only this batch's per-label MIN travels to the driver
            return _label_min_table(part)

        if member_ids_tbl is not None:
            # the (uid, record_id) member scan already ran concurrently with
            # clustering (start_member_ids_pull): resolve labels driver-side
            # and skip the synchronous corpus pull entirely
            with _st("em: canon resolve"):
                uid = member_ids_tbl["__uid"].to_numpy(zero_copy_only=False)
                nodes_sorted, order, m0 = _uid_label_index(ref)
                row, hit = _sorted_lookup(nodes_sorted, order, uid)
                safe = np.where(hit, row, 0)
                lab_np = m0["label"].combine_chunks().to_numpy()[safe]
                rid_col = member_ids_tbl["record_id"]
                if isinstance(rid_col, pa.ChunkedArray):
                    rid_col = rid_col.combine_chunks()
                mask = pa.array(hit)
                canon = _label_min_table(
                    pa.table(
                        {
                            "label": pa.array(lab_np[hit], pa.int64()),
                            "record_id": rid_col.filter(mask),
                        }
                    )
                )
        else:
            with _st("em: clustered pull"):
                cl_tbls = ray.get(
                    ids.map_batches(
                        clustered, batch_format="pyarrow", batch_size=None
                    ).to_arrow_refs()
                )
                cl_tbls = [t for t in cl_tbls if t.num_rows]
            with _st("em: canon resolve"):
                canon = _label_min_table(
                    pa.concat_tables(cl_tbls).combine_chunks()
                    if cl_tbls
                    else pa.table(
                        {
                            "label": pa.array([], pa.int64()),
                            "record_id": pa.array([], pa.string()),
                        }
                    )
                )
        canon_ref = ray.put(
            pa.table(
                {
                    "label": pc.cast(canon["label"], pa.int64()),
                    "canon": pc.cast(canon["record_id"], pa.string()),
                }
            )
        )

        def annotate(t: pa.Table) -> pa.Table:
            nodes_sorted, order, m = _uid_label_index(ref)
            c_sorted, c_order, cm = _uid_label_index(canon_ref, node_col="label")
            rid = t["record_id"].combine_chunks() if isinstance(t["record_id"], pa.ChunkedArray) else t["record_id"]
            uid = batch_uid(t).to_numpy(zero_copy_only=False)
            row, hit = _sorted_lookup(nodes_sorted, order, uid)
            safe_row = np.where(hit, row, 0)
            # stay in int64 numpy end-to-end: routing 63-bit labels through a
            # nullable Arrow->float64 conversion would lose precision
            lab_np = m["label"].combine_chunks().to_numpy()[safe_row]
            crow, chit = _sorted_lookup(c_sorted, c_order, lab_np)
            ok = hit & chit
            cidx = pa.array(np.where(ok, crow, 0), pa.int64(), mask=~ok)
            canon_id = safe_coalesce(pc.take(cm["canon"].combine_chunks(), cidx), rid)
            cols = {"record_id": rid, "canon_id": canon_id}
            if "score" in m.column_names:
                vals = m["score"].combine_chunks().to_numpy(zero_copy_only=False)[safe_row]
                cols["cluster_score"] = pa.array(
                    vals, pa.float64(), mask=(~hit) | np.isnan(vals)
                )
            return pa.table(cols)

        return ids.map_batches(annotate, batch_format="pyarrow", batch_size=None)

    # ---- over-budget: fully distributed (three hash_joins, zero broadcasts)
    from .relational import hash_join

    if labels_ds is None:
        # driver-CC label TABLE past the broadcast budget (first hit at a
        # 6.26M-page soak): feed the distributed joins from the table,
        # sliced so the downstream tag stages parallelize
        import ray.data as rd_

        step = 1 << 19
        labels_ds = rd_.from_arrow(
            [labels_tbl.slice(o, step) for o in range(0, labels_tbl.num_rows, step)]
            or [labels_tbl]
        )
    lab = labels_ds.map_batches(
        lambda t: pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
                **(
                    {"cluster_score": t["score"]}
                    if "score" in t.column_names
                    else {}
                ),
            }
        ),
        batch_format="pyarrow",
    )
    if confidence_ds is not None:
        conf = confidence_ds.map_batches(
            lambda t: pa.table(
                {"node": pc.cast(t["node"], pa.int64()), "cluster_score": t["cluster_score"]}
            ),
            batch_format="pyarrow",
        )
        lab = hash_join(lab, conf, on="node", how="left")

    ids_uid = ids if has_uid else ids.map_batches(
        lambda t: add_uid_column(t, "record_id"), batch_format="pyarrow"
    )
    j1 = hash_join(ids_uid, lab, on="__uid", right_on="node", how="left")
    canon_ds = _min_by_key_bucketed(
        j1.map_batches(
            lambda t: t.select(["label", "record_id"]).filter(
                pc.is_valid(t["label"].combine_chunks() if isinstance(t["label"], pa.ChunkedArray) else t["label"])
            ),
            batch_format="pyarrow",
        ),
        "label",
        "record_id",
    ).map_batches(
        lambda df: df.rename(columns={"record_id": "canon"}), batch_format="pandas"
    )
    j2 = hash_join(
        j1.drop_columns(["__uid"]), canon_ds, on="label", how="left"
    )

    def fin(t: pa.Table) -> pa.Table:
        cols = {
            "record_id": t["record_id"],
            "canon_id": safe_coalesce(t["canon"], t["record_id"]),
        }
        if "cluster_score" in t.column_names:
            cols["cluster_score"] = t["cluster_score"]
        return pa.table(cols)

    return j2.map_batches(fin, batch_format="pyarrow")


# --------------------------------------------------------- canonicalization
def canonicalize_clusters(ds, cluster_col: str, fields: list[str],
                          num_buckets: int | None = None,
                          max_distinct: int = 2048):
    """One canonical row per entity cluster: for each string field, the
    MEDOID value — the member value minimizing the summed Levenshtein
    distance to every member occurrence of that field (ties by ascending
    value; the ``dedupe.canonicalize`` centroid rule with an exact,
    SQL-checkable metric).  NULL field values are ignored; an all-NULL
    cluster yields NULL.  Output: (cluster_col, cluster_size,
    canon_<field>...), one row per cluster.

    Scale shape: ONE bucketed key shuffle (clusters never split across
    buckets); inside a bucket the pairwise work runs over DISTINCT
    (cluster, value) pairs weighted by occurrence counts — m² per cluster
    for m distinct values, never k² over k members — through one vectorized
    ``batch_edit_distance`` call for the whole bucket.  Clusters with one
    distinct value (the common case after exact dedup) skip pair work
    entirely.  Clusters beyond ``max_distinct`` distinct values fall back to
    most-frequent-then-smallest (documented approximation; the medoid of a
    10k-variant cluster is not a meaningful canonical form).

    Distances are byte-level (``ops.simjoin.batch_edit_distance``), equal to
    character-level Levenshtein (DuckDB ``levenshtein``) on ASCII text.
    """
    from .ops.simjoin import batch_edit_distance
    from .scale import resolve_buckets
    from .windows import bucketed_by_key

    num_buckets = resolve_buckets(num_buckets, ds)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(cluster_col, sort=False, dropna=False)
               .size().rename("cluster_size").reset_index())
        for f in fields:
            sub = df[[cluster_col, f]].dropna(subset=[f])
            sub[f] = sub[f].astype(str)
            dv = (sub.groupby([cluster_col, f], sort=False)
                  .size().rename("cnt").reset_index())
            nd = dv.groupby(cluster_col, sort=False)[f].transform("size")
            canon = {}
            # fast path: one distinct value
            ones = dv[nd == 1]
            canon.update(zip(ones[cluster_col], ones[f]))
            # oversize fallback: most frequent, ties by ascending value
            big = dv[nd > max_distinct]
            if len(big):
                pick = (big.sort_values([cluster_col, "cnt", f],
                                        ascending=[True, False, True])
                        .groupby(cluster_col, sort=False).head(1))
                canon.update(zip(pick[cluster_col], pick[f]))
            # medoid path: m² weighted pairs over distinct values per cluster
            med = dv[(nd > 1) & (nd <= max_distinct)]
            if len(med):
                med = med.sort_values([cluster_col, f]).reset_index(drop=True)
                m = (med.groupby(cluster_col, sort=False).size()
                     .to_numpy(np.int64))
                starts = np.concatenate([[0], np.cumsum(m)[:-1]])
                npairs = m * m
                tot = int(npairs.sum())
                pair_starts = np.concatenate([[0], np.cumsum(npairs)[:-1]])
                within = np.arange(tot) - np.repeat(pair_starts, npairs)
                base = np.repeat(starts, npairs)
                mm = np.repeat(m, npairs)
                a_idx = base + within // mm
                b_idx = base + within % mm
                vals = med[f].to_numpy(object)
                cnts = med["cnt"].to_numpy(np.float64)
                d = batch_edit_distance(vals[a_idx].tolist(),
                                        vals[b_idx].tolist())
                dsum = np.bincount(a_idx, weights=d * cnts[b_idx],
                                   minlength=len(med))
                med = med.assign(__dsum=dsum)
                pick = (med.sort_values([cluster_col, "__dsum", f])
                        .groupby(cluster_col, sort=False).head(1))
                canon.update(zip(pick[cluster_col], pick[f]))
            # object dtype + None (not float NaN) so an all-null bucket emits
            # the same Arrow string-typed column as every other bucket
            col = out[cluster_col].map(canon).astype(object)
            out[f"canon_{f}"] = col.where(col.notna(), None)
        return out

    return bucketed_by_key(ds.select_columns([cluster_col] + list(fields)),
                           cluster_col, per_bucket, num_buckets=num_buckets)


def _avg_linkage_split(nodes: np.ndarray, ea: np.ndarray, eb: np.ndarray,
                       scores: np.ndarray, threshold: float,
                       max_members: int) -> np.ndarray:
    """Average-linkage agglomerative clustering of ONE component, cut at
    ``threshold`` — the reference library's cluster semantics (dedupe's
    ``cluster()`` runs hierarchical clustering over pairwise scores and cuts
    at the partition threshold; csv_example.py:152's 0.5 is this cut).
    Missing pairs score 0, so a transitive chain A~B~C with no A-C evidence
    has cross-average (s_AB + 0)/2 and splits once that drops below the cut.
    Returns a group index per node.  Components larger than ``max_members``
    are returned whole (documented fallback — a genuine O(k^2) matrix is the
    cost of exact linkage; at web scale components that big mean the
    blocking/threshold upstream needs fixing, not this step)."""
    k = len(nodes)
    if k <= 2 or k > max_members:
        return np.zeros(k, dtype=np.int64)
    pos = {v: i for i, v in enumerate(nodes)}
    S = np.zeros((k, k))
    for a, b, s in zip(ea, eb, scores):
        i, j = pos[a], pos[b]
        S[i, j] = max(S[i, j], s)
        S[j, i] = S[i, j]
    group = np.arange(k)
    sizes = np.ones(k)
    # cross-cluster total similarity matrix; average = T / (n_i * n_j)
    T = S.copy()
    alive = np.ones(k, bool)
    while True:
        denom = sizes[:, None] * sizes[None, :]
        avg = np.where(alive[:, None] & alive[None, :], T / denom, -1.0)
        np.fill_diagonal(avg, -1.0)
        i, j = np.unravel_index(np.argmax(avg), avg.shape)
        if avg[i, j] < threshold:
            break
        lo, hi = (i, j) if i < j else (j, i)
        group[group == hi] = lo
        T[lo] += T[hi]
        T[:, lo] += T[:, hi]
        sizes[lo] += sizes[hi]
        alive[hi] = False
        if alive.sum() == 1:
            break
    return group


def refine_clusters_hierarchical(edges_ds, threshold: float,
                                 max_members: int = 2000,
                                 num_buckets: int | None = None):
    """Split CC clusters with average-linkage at ``threshold`` — the
    anti-chaining refinement: connected components attach A-B-C on two local
    edges even when A and C share no evidence; average linkage re-cuts each
    component exactly like the reference library's hierarchical cluster step.

    Input: scored edge Dataset (id_a, id_b, score), already thresholded.
    Output: (node, label) with label = MIN member id of the refined
    sub-cluster.  Shape: one CC pass (existing machinery) assigns a
    component id per node, edges co-locate with their component via one
    bucketed shuffle on the component label, and each component refines in
    ONE task (components are pair-evidence-bounded; oversize fallback
    documented in :func:`_avg_linkage_split`).
    """
    from .relational import hash_join
    from .scale import resolve_buckets
    from .windows import bucketed_by_key

    B = resolve_buckets(num_buckets, edges_ds)
    labels = connected_components(edges_ds.select_columns(["id_a", "id_b"]))
    # component label onto each edge via id_a (id_b has the same label)
    lab_a = labels.map_batches(
        lambda t: t.rename_columns(["node", "comp"]), batch_format="pyarrow")
    edges_lab = hash_join(edges_ds, lab_a, on="id_a", right_on="node",
                          num_buckets=B)

    def refine(df: pd.DataFrame) -> pd.DataFrame:
        out_nodes: list = []
        out_labels: list = []
        for _, grp in df.groupby("comp", sort=False):
            ea = grp["id_a"].to_numpy()
            eb = grp["id_b"].to_numpy()
            sc = grp["score"].to_numpy(dtype=float)
            nodes = np.unique(np.concatenate([ea, eb]))
            gi = _avg_linkage_split(nodes, ea, eb, sc, threshold, max_members)
            for g in np.unique(gi):
                members = nodes[gi == g]
                out_nodes.extend(members.tolist())
                out_labels.extend([members.min()] * len(members))
        return pd.DataFrame({"node": out_nodes, "label": out_labels})

    return bucketed_by_key(
        edges_lab.select_columns(["id_a", "id_b", "score", "comp"]),
        "comp", refine, num_buckets=B)
