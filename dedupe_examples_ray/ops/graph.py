"""Graph operators — PageRank over an edge-list Dataset.

Host-level authority is a standard web-corpus quality signal (Common Crawl
publishes harmonic-centrality/PageRank host rankings; quality filters weight
documents by their host's rank).  ``pagerank`` computes it over an ``(src,
dst)`` edge Dataset.

Update rule (Page et al. 1999, with the standard dangling-mass
redistribution):

    r'(v) = (1 - d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

where ``dangling = sum of r(u) over nodes with no out-edges``.  Ranks sum to
1 every iteration.

Tiered like ``embed_cluster.kmeans_distributed``:

- **driver tier** (edge list under ``_DRIVER_PR_BUDGET`` bytes): edges pull
  once, iterations are numpy scatter-adds — the fast path for graphs that
  fit (a host graph is ~10^7 nodes even at web scale; the DOCUMENT graph
  needs the streaming tier).
- **streaming tier**: per iteration, ONE big-big ``hash_join`` ships each
  node's ``r/outdeg`` onto its out-edges (bucketed cogroup — neither ranks
  nor edges are broadcast or collected) and ONE combiner ``grouped_sum``
  accumulates per-destination mass; the dangling total is a tiny aggregate.
  The rank vector lives as a materialized Dataset between iterations, never
  on the driver.

Both tiers run the same update and agree to float tolerance (parity-tested).
Self-loops count like any edge; parallel edges contribute multiply (matching
the adjacency-matrix formulation on multigraphs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..scale import safe_coalesce

_DRIVER_PR_BUDGET = 256 << 20  # bytes of edge projection


def _pagerank_numpy(src: np.ndarray, dst: np.ndarray, nodes: np.ndarray,
                    damping: float, iters: int) -> np.ndarray:
    """Reference/driver kernel: dense rank vector, scatter-add iterations."""
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.fromiter((idx[v] for v in src), np.int64, len(src))
    di = np.fromiter((idx[v] for v in dst), np.int64, len(dst))
    deg = np.bincount(si, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        w = np.where(deg > 0, r / np.maximum(deg, 1.0), 0.0)
        contrib = np.bincount(di, weights=w[si], minlength=n)
        dangling = float(r[deg == 0].sum())
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return r


def pagerank(edges, src_col: str = "src", dst_col: str = "dst",
             damping: float = 0.85, iters: int = 20,
             driver_budget: int | None = None, force_tier: str | None = None,
             num_buckets: int | None = None):
    """PageRank over an edge Dataset (see module docstring).  Returns a
    Dataset ``(node, rank)`` covering every node that appears as src or dst;
    ranks sum to 1."""
    import ray
    import ray.data as rd

    from ..relational import distinct, grouped_sum, hash_join
    from ..scale import resolve_buckets

    budget = _DRIVER_PR_BUDGET if driver_budget is None else driver_budget
    proj = edges.select_columns([src_col, dst_col]).materialize()
    if proj.count() == 0:
        raise ValueError("pagerank needs at least one edge")
    tier = force_tier or (
        "driver" if (proj.size_bytes() or budget + 1) <= budget else "stream")

    if tier == "driver":
        df = proj.to_pandas()
        src = df[src_col].to_numpy()
        dst = df[dst_col].to_numpy()
        nodes = np.unique(np.concatenate((src, dst)))
        r = _pagerank_numpy(src, dst, nodes, damping, iters)
        return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                       "rank": pa.array(r, pa.float64())}))

    B = resolve_buckets(num_buckets, proj)

    # node universe + out-degrees (both tiny relative to edges; stay as
    # datasets — nothing here reaches the driver but scalars)
    def srcs(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(t[src_col].combine_chunks())})

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(t[dst_col].combine_chunks())})

    nodes = distinct(
        proj.map_batches(srcs, batch_format="pyarrow").union(
            proj.map_batches(dsts, batch_format="pyarrow")), ["node"]
    ).materialize()
    n = nodes.count()
    deg = grouped_sum(proj.select_columns([src_col]), [src_col], {},
                      count_col="outdeg").materialize()

    r0 = 1.0 / n
    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(
            np.full(t.num_rows, r0), pa.float64())),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        # r/outdeg per node; outdeg NULL marks a dangling node
        rd_join = hash_join(ranks, deg, on="node", right_on=src_col,
                            how="left", num_buckets=B)

        def weight(t: pa.Table) -> pa.Table:
            d = t["outdeg"].to_numpy(zero_copy_only=False)
            r = t["rank"].to_numpy(zero_copy_only=False)
            dangling = np.isnan(d) if d.dtype.kind == "f" else pd.isna(d)
            w = np.where(dangling, 0.0, r / np.where(dangling, 1.0, d))
            return pa.table({"node": t["node"],
                             "w": pa.array(w, pa.float64()),
                             "dang": pa.array(np.where(dangling, r, 0.0),
                                              pa.float64())})

        weighted = rd_join.map_batches(weight, batch_format="pyarrow").materialize()
        dangling = weighted.sum("dang") or 0.0
        # ship each src's weight onto its out-edges (big-big), sum per dst
        contribs = grouped_sum(
            hash_join(proj, weighted.drop_columns(["dang"]),
                      on=src_col, right_on="node", how="inner",
                      num_buckets=B).select_columns([dst_col, "w"]),
            [dst_col], {"w": "contrib"})
        base = (1.0 - damping) / n + damping * dangling / n

        def update(t: pa.Table) -> pa.Table:
            c = t["contrib"].to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c), 0.0, c)
            return pa.table({
                "node": t["node"],
                "rank": pa.array(base + damping * c, pa.float64())})

        ranks = hash_join(nodes, contribs, on="node", right_on=dst_col,
                          how="left", num_buckets=B).map_batches(
            update, batch_format="pyarrow").materialize()
    return ranks


def _hits_numpy(src: np.ndarray, dst: np.ndarray, nodes: np.ndarray,
                iters: int) -> tuple[np.ndarray, np.ndarray]:
    """Reference/driver kernel: dense hub/authority vectors, scatter-add
    iterations with L2 normalization (Kleinberg, JACM 1999)."""
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    si = np.fromiter((idx[v] for v in src), np.int64, len(src))
    di = np.fromiter((idx[v] for v in dst), np.int64, len(dst))
    h = np.full(n, 1.0)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.bincount(di, weights=h[si], minlength=n)
        a /= np.linalg.norm(a) or 1.0
        h = np.bincount(si, weights=a[di], minlength=n)
        h /= np.linalg.norm(h) or 1.0
    return h, a


def hits(edges, src_col: str = "src", dst_col: str = "dst", iters: int = 20,
         driver_budget: int | None = None, force_tier: str | None = None,
         num_buckets: int | None = None):
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over an edge
    Dataset — the complement to ``pagerank`` for link-graph quality
    signals: authorities are pages many good hubs point AT, hubs are pages
    that point at many good authorities.

    Update: ``a = A^T h; h = A a`` with L2 normalization each half-step —
    power iteration toward the principal singular vectors of the adjacency
    matrix.  Returns ``(node, hub, authority)`` covering every node.

    Tiered exactly like ``pagerank``: a driver numpy kernel under the edge
    byte budget; above it, each half-step is ONE big-big ``hash_join``
    (ship scores onto edges, bucketed cogroup) + ONE combiner
    ``grouped_sum``, and the L2 norm is a tiny scalar aggregate — neither
    scores nor edges ever collect to the driver.  Parity-tested.
    """
    import ray.data as rd

    from ..relational import distinct, grouped_sum, hash_join
    from ..scale import resolve_buckets

    budget = _DRIVER_PR_BUDGET if driver_budget is None else driver_budget
    proj = edges.select_columns([src_col, dst_col]).materialize()
    if proj.count() == 0:
        raise ValueError("hits needs at least one edge")
    tier = force_tier or (
        "driver" if (proj.size_bytes() or budget + 1) <= budget else "stream")

    if tier == "driver":
        df = proj.to_pandas()
        src = df[src_col].to_numpy()
        dst = df[dst_col].to_numpy()
        nodes = np.unique(np.concatenate((src, dst)))
        h, a = _hits_numpy(src, dst, nodes, iters)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes),
            "hub": pa.array(h, pa.float64()),
            "authority": pa.array(a, pa.float64())}))

    B = resolve_buckets(num_buckets, proj)

    def srcs(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(t[src_col].combine_chunks())})

    def dsts(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(t[dst_col].combine_chunks())})

    nodes = distinct(
        proj.map_batches(srcs, batch_format="pyarrow").union(
            proj.map_batches(dsts, batch_format="pyarrow")), ["node"]
    ).materialize()

    def _norm(ds, col):
        tot = ds.map_batches(
            lambda t: pa.table({"sq": pc.multiply(t[col], t[col])}),
            batch_format="pyarrow").sum("sq") or 0.0
        return float(np.sqrt(tot)) or 1.0

    def _propagate(scores, score_col, join_key, group_key, out_col):
        """ship scores onto edges via join_key, sum per group_key."""
        shipped = hash_join(
            proj, scores, on=join_key, right_on="node", how="inner",
            num_buckets=B).select_columns([group_key, score_col])
        summed = grouped_sum(shipped, [group_key], {score_col: out_col})
        # complete to the full node universe with zeros
        full = hash_join(nodes, summed, on="node", right_on=group_key,
                         how="left", num_buckets=B)

        def fill(t: pa.Table) -> pa.Table:
            v = t[out_col].to_numpy(zero_copy_only=False)
            v = np.where(np.isnan(v), 0.0, v)
            return pa.table({"node": t["node"],
                             out_col: pa.array(v, pa.float64())})

        return full.map_batches(fill, batch_format="pyarrow").materialize()

    hubs = nodes.map_batches(
        lambda t: t.append_column("hub", pa.array(
            np.full(t.num_rows, 1.0), pa.float64())),
        batch_format="pyarrow").materialize()

    auth = None
    for _ in range(iters):
        auth = _propagate(hubs, "hub", src_col, dst_col, "authority")
        na = _norm(auth, "authority")
        auth = auth.map_batches(
            lambda t, s=na: pa.table({
                "node": t["node"],
                "authority": pc.divide(t["authority"], s)}),
            batch_format="pyarrow").materialize()
        hubs = _propagate(auth, "authority", dst_col, src_col, "hub")
        nh = _norm(hubs, "hub")
        hubs = hubs.map_batches(
            lambda t, s=nh: pa.table({
                "node": t["node"], "hub": pc.divide(t["hub"], s)}),
            batch_format="pyarrow").materialize()

    return hash_join(hubs, auth, on="node", num_buckets=B)


def triangle_count(edges, a_col: str = "a", b_col: str = "b",
                   num_buckets: int | None = None) -> dict:
    """EXACT triangle count over an undirected edge-list Dataset.

    The classic distributed formulation (Suri & Vassilvitskii WWW 2011,
    "Counting Triangles and the Curse of the Last Reducer"): canonicalize +
    DISTINCT the edges, orient every edge from its lower-(degree, id)
    endpoint to the higher one, emit each node's out-neighbor pairs as
    wedges, and count the wedges whose closing edge exists.  Degree
    orientation bounds every out-degree at O(sqrt(2m)), so per-node wedge
    emission is O(m^{3/2}) total — no hot-vertex quadratics even on
    power-law web graphs (the curse the paper names).

    Shuffle inventory: one DISTINCT (bucketed), one degree grouped_sum
    (combiner), two big-big hash_joins to attach endpoint degrees, one
    groupby for wedge emission, one big-big hash_join to close wedges.
    Nothing is broadcast or collected; the result is a scalar dict
    ``{"n_nodes", "n_edges", "n_triangles"}``.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from ..relational import distinct, grouped_sum, hash_join

    def canon(t: pa.Table) -> pa.Table:
        a, b = t[a_col], t[b_col]
        keep = pc.fill_null(pc.not_equal(a, b), False)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"a": pc.min_element_wise(a, b),
                         "b": pc.max_element_wise(a, b)})

    und = distinct(
        edges.select_columns([a_col, b_col]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"], num_buckets=num_buckets,
    ).materialize()
    m = und.count()
    if m == 0:
        return {"n_nodes": 0, "n_edges": 0, "n_triangles": 0}

    def explode(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])})

    deg = grouped_sum(
        und.map_batches(explode, batch_format="pyarrow"),
        ["node"], {}, count_col="deg",
    ).materialize()
    n_nodes = deg.count()

    # orient by (deg, node): src = smaller endpoint under that order
    da = hash_join(und, deg, on="a", right_on="node",
                   num_buckets=num_buckets).map_batches(
        lambda t: t.rename_columns(
            ["deg_a" if c == "deg" else c for c in t.column_names]),
        batch_format="pyarrow")
    dab = hash_join(da, deg, on="b", right_on="node",
                    num_buckets=num_buckets)

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        la = t["deg_a"].to_numpy(zero_copy_only=False)
        lb = t["deg"].to_numpy(zero_copy_only=False)
        # a < b always (canonical), so ties on degree keep a -> b
        fwd = la <= lb
        src = np.where(fwd, a, b)
        dst = np.where(fwd, b, a)
        sd = np.where(fwd, la, lb)
        dd = np.where(fwd, lb, la)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "src_deg": pa.array(sd.astype(np.int64)),
                         "dst_deg": pa.array(dd.astype(np.int64))})

    oriented = dab.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # out-neighbors of one src, ordered by (deg, node) so each wedge is
        # emitted exactly once with its endpoints in oriented order
        o = np.lexsort((df["dst"].to_numpy(), df["dst_deg"].to_numpy()))
        d = df["dst"].to_numpy()[o]
        k = len(d)
        if k < 2:
            return pd.DataFrame({"wa": d[:0], "wb": d[:0]})
        ia, ib = np.triu_indices(k, k=1)
        return pd.DataFrame({"wa": d[ia], "wb": d[ib]})

    w = oriented.groupby("src").map_groups(wedges, batch_format="pandas")

    def key2(t: pa.Table, x: str, y: str) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t[x], pa.string()), pc.cast(t[y], pa.string()), "\x1f")
        return pa.table({"k": k})

    wk = w.map_batches(lambda t: key2(t, "wa", "wb"), batch_format="pyarrow")
    ek = oriented.map_batches(lambda t: key2(t, "src", "dst"),
                              batch_format="pyarrow")
    closed = hash_join(wk, ek, on="k", how="semi", num_buckets=num_buckets)
    # semi keeps each wedge row iff its closing edge exists; wedges are
    # distinct by construction, so the count IS the triangle count
    n_tri = closed.count()
    return {"n_nodes": int(n_nodes), "n_edges": int(m),
            "n_triangles": int(n_tri)}


# ------------------------------------------------------------------- k-core
_DRIVER_CORE_BUDGET = 256 << 20  # bytes of edge projection


def _core_numbers_numpy(src: np.ndarray, dst: np.ndarray) -> tuple:
    """Exact coreness by iterative peeling (reference/driver kernel).

    Undirected simple graph (canonicalized outside): repeatedly remove every
    node whose current degree equals the running minimum k; removed nodes
    get core number k.  O(m * peel_depth) vectorized rounds — the driver
    tier's graphs fit in one heap, so simplicity beats the O(m) bucket-queue
    (Batagelj & Zaversnik 2003) here.
    Returns (nodes, core) arrays.
    """
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    si, di = inv[: len(src)], inv[len(src):]
    alive_e = np.ones(len(si), bool)
    deg = np.bincount(si, minlength=n) + np.bincount(di, minlength=n)
    alive_n = np.ones(n, bool)
    core = np.zeros(n, np.int64)
    k = 0
    while alive_n.any():
        cur = deg[alive_n]
        k = max(k, int(cur.min()))
        while True:
            peel = alive_n & (deg <= k)
            if not peel.any():
                break
            core[peel] = k
            alive_n &= ~peel
            # drop incident edges, decrement survivors' degrees
            e_drop = alive_e & (peel[si] | peel[di])
            if e_drop.any():
                deg -= np.bincount(si[e_drop], minlength=n)
                deg -= np.bincount(di[e_drop], minlength=n)
                alive_e &= ~e_drop
            deg[~alive_n] = 0
            if not alive_n.any():
                break
    return nodes, core


def _h_index_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Per-node h-index of neighbour estimates (vectorized across a bucket's
    nodes): with values sorted desc within each node, h = #positions where
    value >= position (the indicator is prefix-monotone)."""
    df = df.sort_values(["node", "c_nbr"], ascending=[True, False],
                        kind="stable")
    pos = df.groupby("node", sort=False).cumcount().to_numpy() + 1
    ok = df["c_nbr"].to_numpy() >= pos
    h = pd.DataFrame({"node": df["node"].to_numpy(), "ok": ok.astype(np.int64)})
    out = h.groupby("node", as_index=False, sort=False)["ok"].sum()
    return out.rename(columns={"ok": "h"})


def core_numbers(edges, a_col: str = "a", b_col: str = "b",
                 num_buckets: int | None = None, max_iters: int = 100,
                 tier: str = "auto"):
    """Exact k-core decomposition: per-node core number over an undirected
    edge-list Dataset — the classic web-graph density/spam signal (a page in
    a high-k core sits in a densely interlinked cluster; low-core periphery
    pages are link-poor).

    Tiered like :func:`pagerank`:

    - **driver tier** (edge projection under 256 MiB): one pull + vectorized
      numpy peeling — exact by construction.
    - **streaming tier**: the distributed h-index iteration (Montresor,
      De Pellegrini & Miorandi 2011, "Distributed k-core decomposition"):
      start every estimate at deg(v) and iterate
      ``c(v) <- min(c(v), H({c(u) : u ~ v}))`` — estimates decrease
      monotonically and the fixed point IS the coreness.  Each round is one
      big-big ``hash_join`` (ship estimates onto directed edges) + one
      bucketed h-index groupby + one node-sized min/changed-count join; no
      stage holds the graph on the driver.

    Returns a Dataset ``(node, core)``.  Parallel edges and self-loops are
    removed first (DISTINCT canonical edges — core numbers are defined on
    the simple graph).
    """
    import pyarrow.compute as pc

    from ..relational import distinct, grouped_sum, hash_join

    def canon(t: pa.Table) -> pa.Table:
        a, b = t[a_col], t[b_col]
        keep = pc.fill_null(pc.not_equal(a, b), False)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"a": pc.min_element_wise(a, b),
                         "b": pc.max_element_wise(a, b)})

    und = distinct(
        edges.select_columns([a_col, b_col]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"], num_buckets=num_buckets,
    ).materialize()
    m = und.count()
    if m == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "core": pa.array([], pa.int64())}))
    est_bytes = und.size_bytes() or 0
    if tier == "driver" or (tier == "auto" and est_bytes <= _DRIVER_CORE_BUDGET):
        import ray
        import ray.data as rd

        tbls = ray.get(und.to_arrow_refs())
        src = np.concatenate([t["a"].to_numpy(zero_copy_only=False)
                              for t in tbls if t.num_rows])
        dst = np.concatenate([t["b"].to_numpy(zero_copy_only=False)
                              for t in tbls if t.num_rows])
        nodes, core = _core_numbers_numpy(src, dst)
        return rd.from_arrow(pa.table({"node": pa.array(nodes),
                                       "core": pa.array(core, pa.int64())}))

    # ---- streaming tier: h-index fixed point ----
    def both_dir(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(),
                                      t["b"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["b"].combine_chunks(),
                                     t["a"].combine_chunks()]),
        })

    dir_edges = und.map_batches(both_dir, batch_format="pyarrow").materialize()
    est = grouped_sum(dir_edges.select_columns(["node"]), ["node"], {},
                      count_col="c").materialize()  # init: c(v) = deg(v)
    for _ in range(max_iters):
        nbr_est = est.map_batches(
            lambda t: t.rename_columns(["nbr", "c_nbr"]),
            batch_format="pyarrow")
        joined = hash_join(dir_edges, nbr_est, on="nbr",
                           num_buckets=num_buckets)
        from ..windows import bucketed_by_key

        h = bucketed_by_key(joined.select_columns(["node", "c_nbr"]),
                            "node", _h_index_bucket)
        nxt = hash_join(
            est,
            h.map_batches(lambda t: t.rename_columns(["node2", "h"]),
                          batch_format="pyarrow"),
            on="node", right_on="node2", num_buckets=num_buckets,
        )

        def take_min(t: pa.Table) -> pa.Table:
            newc = pc.min_element_wise(t["c"], pc.fill_null(t["h"], 0))
            return pa.table({
                "node": t["node"],
                "c": pc.cast(newc, pa.int64()),
                "chg": pc.cast(pc.not_equal(newc, t["c"]), pa.int64()),
            })

        upd = nxt.map_batches(take_min, batch_format="pyarrow").materialize()
        changed = upd.sum("chg") or 0
        est = upd.select_columns(["node", "c"])
        if not changed:
            break
    return est.map_batches(
        lambda t: t.rename_columns(["node", "core"]), batch_format="pyarrow")


def k_core(edges, k: int, a_col: str = "a", b_col: str = "b",
           num_buckets: int | None = None, tier: str = "auto"):
    """Edges of the k-core subgraph (maximal subgraph with min degree >= k):
    core numbers once, then one semi-join per endpoint — the standard
    "dense nucleus" extraction for web-graph cleaning."""
    import pyarrow.compute as pc

    from ..relational import hash_join

    cores = core_numbers(edges, a_col=a_col, b_col=b_col,
                         num_buckets=num_buckets, tier=tier)

    def in_core(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"].filter(pc.greater_equal(t["core"], k))})

    keep = cores.map_batches(in_core, batch_format="pyarrow").materialize()
    e1 = hash_join(edges.select_columns([a_col, b_col]), keep,
                   on=a_col, right_on="node", how="semi",
                   num_buckets=num_buckets)
    return hash_join(e1, keep, on=b_col, right_on="node", how="semi",
                     num_buckets=num_buckets)


def _label_prop_numpy(src: np.ndarray, dst: np.ndarray, iters: int = 20):
    """Reference/driver kernel: SYNCHRONOUS label propagation (Raghavan,
    Albert & Kumara 2007) with a deterministic tie-break — each round every
    node takes the label most frequent among its neighbours, ties broken by
    the SMALLEST label id; simultaneous updates make the result a pure
    function of the graph (the paper's random asynchronous order is
    non-reproducible by design; synchronous + min-tie-break is the standard
    deterministic variant).  Labels start as node indices in SORTED-unique
    order — for integer node ids that order equals value order, so the
    streaming tier's value-labels make the same tie decisions.  Returns
    (nodes, labels) after convergence or ``iters`` rounds."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    si, di = inv[: len(src)], inv[len(src):]
    # undirected: both directions
    e_src = np.concatenate([si, di])
    e_dst = np.concatenate([di, si])
    order = np.argsort(e_src, kind="stable")
    e_src, e_dst = e_src[order], e_dst[order]
    starts = np.searchsorted(e_src, np.arange(n))
    ends = np.searchsorted(e_src, np.arange(n) + 1)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        nbr_labels = labels[e_dst]
        new = labels.copy()
        for v in range(n):
            s, t = starts[v], ends[v]
            if s == t:
                continue
            # SELF-INCLUSIVE: count the node's own label once — without it
            # the synchronous variant oscillates on bipartite structures
            # (a single edge swaps labels forever)
            seg = np.append(nbr_labels[s:t], labels[v])
            vals, cnt = np.unique(seg, return_counts=True)
            new[v] = vals[cnt == cnt.max()].min()
        if (new == labels).all():
            break
        labels = new
    return nodes, labels


def label_propagation(edges, a_col: str = "a", b_col: str = "b",
                      iters: int = 20, num_buckets: int | None = None,
                      tier: str = "auto"):
    """Community detection by synchronous label propagation over an
    undirected edge-list Dataset — near-linear-time community structure for
    web/host graphs (link farms and mirror families surface as one label).

    Tiered like :func:`pagerank`: driver numpy kernel under the edge budget;
    the streaming tier runs each round as ONE big-big ``hash_join`` (ship
    labels onto directed edges) + one bucketed per-node mode with min-label
    tie-break + a changed-count aggregate, with the label vector held as a
    materialized Dataset — nothing graph-sized on the driver.  Both tiers
    implement the same synchronous min-tie-break update (parity-tested).

    Returns a Dataset ``(node, community)`` where ``community`` is the
    SMALLEST MEMBER NODE of each community — tier-independent for integer
    node ids (both tiers' tie-breaks follow node-value order there).  For
    string ids the streaming tier breaks exact frequency ties in
    stable-hash order rather than lexicographic order, so partitions can
    differ on ties between tiers (documented divergence).
    """
    import pyarrow.compute as pc

    from ..relational import distinct, hash_join

    def canon(t: pa.Table) -> pa.Table:
        a, b = t[a_col], t[b_col]
        keep = pc.fill_null(pc.not_equal(a, b), False)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"a": pc.min_element_wise(a, b),
                         "b": pc.max_element_wise(a, b)})

    und = distinct(
        edges.select_columns([a_col, b_col]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"], num_buckets=num_buckets,
    ).materialize()
    if und.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                       "community": pa.array([], pa.int64())}))
    est_bytes = und.size_bytes() or 0
    if tier == "driver" or (tier == "auto" and est_bytes <= _DRIVER_CORE_BUDGET):
        import ray
        import ray.data as rd

        tbls = ray.get(und.to_arrow_refs())
        src = np.concatenate([t["a"].to_numpy(zero_copy_only=False)
                              for t in tbls if t.num_rows])
        dst = np.concatenate([t["b"].to_numpy(zero_copy_only=False)
                              for t in tbls if t.num_rows])
        nodes, labels = _label_prop_numpy(src, dst, iters=iters)
        # canonicalize: community id = smallest member node
        canon_of = pd.DataFrame({"lab": labels, "node": nodes}).groupby(
            "lab", sort=False)["node"].min()
        comm = canon_of[labels].to_numpy()
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes),
            "community": pa.array(comm)}))

    # ---- streaming tier: synchronous rounds over a distributed label table
    from ..scale import resolve_buckets

    B = resolve_buckets(num_buckets, und)

    def both_dir(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["a"].combine_chunks(),
                                      t["b"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["b"].combine_chunks(),
                                     t["a"].combine_chunks()]),
        })

    dir_edges = und.map_batches(both_dir, batch_format="pyarrow").materialize()
    # initial label = dense rank of the node id (int64, stable) — use the
    # node's own hash-free ordinal via a distinct + window-free trick: label
    # by min over self only, i.e. rank is unnecessary — any total order works
    # as long as ties break consistently, so use the node value itself when
    # numeric and a stable uint64 hash otherwise (collision-safe enough for
    # a TIE-BREAK; community identity is re-canonicalized at the end).
    from ..pairs import stable_hash

    def init_labels(t: pa.Table) -> pa.Table:
        nodes_ = pc.unique(t["node"].combine_chunks())
        arr = nodes_.to_numpy(zero_copy_only=False)
        if np.issubdtype(arr.dtype, np.integer):
            lab = arr.astype(np.int64)
        else:
            lab = stable_hash(arr).astype(np.int64) & np.int64(2**62 - 1)
        return pa.table({"node": nodes_, "lab": pa.array(lab, pa.int64())})

    # lab is a pure function of node, so DISTINCT on both columns = one row
    # per node with its label intact
    est = distinct(
        dir_edges.select_columns(["node"]).map_batches(
            init_labels, batch_format="pyarrow"),
        ["node", "lab"], num_buckets=B,
    ).materialize()

    from ..windows import bucketed_by_key

    for _ in range(iters):
        nbr_lab = est.map_batches(
            lambda t: t.rename_columns(["nbr", "nbr_lab"]),
            batch_format="pyarrow")
        joined = hash_join(dir_edges, nbr_lab, on="nbr", num_buckets=B)
        # self-inclusive update (see driver kernel): one (node, own label)
        # row per node joins the neighbour-label stream
        self_rows = est.map_batches(
            lambda t: pa.table({"node": t["node"], "nbr_lab": t["lab"]}),
            batch_format="pyarrow")
        joined = joined.select_columns(["node", "nbr_lab"]).union(self_rows)

        def mode_min(df: pd.DataFrame) -> pd.DataFrame:
            g = (df.groupby(["node", "nbr_lab"], sort=False)
                 .size().reset_index(name="n"))
            g = g.sort_values(["node", "n", "nbr_lab"],
                              ascending=[True, False, True], kind="stable")
            top = g.groupby("node", sort=False).head(1)
            return pd.DataFrame({"node": top["node"].to_numpy(),
                                 "new_lab": top["nbr_lab"].to_numpy()})

        upd = bucketed_by_key(joined, "node", mode_min, num_buckets=B)
        nxt = hash_join(
            est,
            upd.map_batches(lambda t: t.rename_columns(["node2", "new_lab"]),
                            batch_format="pyarrow"),
            on="node", right_on="node2", how="left", num_buckets=B,
        )

        def take_new(t: pa.Table) -> pa.Table:
            new = safe_coalesce(t["new_lab"], t["lab"])
            return pa.table({
                "node": t["node"],
                "lab": pc.cast(new, pa.int64()),
                "chg": pc.cast(pc.not_equal(new, t["lab"]), pa.int64()),
            })

        nxt = nxt.map_batches(take_new, batch_format="pyarrow").materialize()
        changed = nxt.sum("chg") or 0
        est = nxt.select_columns(["node", "lab"])
        if not changed:
            break
    # canonicalize: community id = smallest member node (one bucketed min
    # per label + a big-big join back — tier-comparable output)
    def min_node(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lab", as_index=False, sort=False)["node"].min()
        return g.rename(columns={"lab": "clab", "node": "community"})

    canon_map = bucketed_by_key(est, "lab", min_node, num_buckets=B)
    out = hash_join(est, canon_map, on="lab", right_on="clab",
                    num_buckets=B)
    return out.select_columns(["node", "community"])
