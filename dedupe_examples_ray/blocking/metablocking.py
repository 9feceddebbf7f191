"""Meta-blocking: blocking-graph edge pruning (Papadakis et al., TKDE 2014,
"Meta-Blocking: Taking Entity Resolution to the Next Level").

Schema-agnostic blocking over web-scale entity collections produces a
blocking GRAPH: nodes are records, an edge links every pair that co-occurs
in at least one block.  Scoring every edge is the dominant ER cost (the
reference pays it with SQL self-joins, mysql_example.py:240-264);
meta-blocking prunes the graph FIRST using only co-occurrence evidence:

1. **block purging** — drop blocks larger than ``max_block_size`` entirely
   (stop-word-like keys carry no discriminating evidence and cost
   quadratically).  Unlike the salting path in :mod:`..pairs` (which keeps a
   capped subset for lossy dedup), purging is the published meta-blocking
   step: the weights of the surviving graph must be EXACT, so oversized
   blocks are excluded, not sampled.
2. **edge weighting** — CBS (Common Blocks Scheme): ``weight(a, b)`` =
   number of surviving blocks containing both ``a`` and ``b``.
3. **edge pruning** —
   * WEP (weighted edge pruning): keep edges whose weight is >= the global
     mean edge weight;
   * CNP (cardinality node pruning): keep an edge iff it ranks in the
     top-``k`` edges by weight of EITHER endpoint (ties broken by the
     neighbour id ascending, so output is deterministic) — output is bounded
     by ``2 * k * n_nodes`` edges regardless of block skew.

Scale shape (100 TB posture): block purging and pair emission share ONE
bucketed shuffle on ``hash(block_key)`` (every row of a block lands in the
same task; a per-task combiner pre-sums duplicate pairs before the next
exchange), exact CBS weights come from a second bucketed shuffle on
``hash(id_a, id_b)``.  The WEP threshold is a two-number driver aggregate
over the materialized weights; CNP adds one bucketed shuffle on
``hash(node)`` with both edge directions emitted (2 rows per edge) and a
final pair-distinct pass.  No stage materializes the graph on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..pairs import _pair_idx, stable_hash
from ..scale import clean_arrow, resolve_buckets


def token_blocks(ds, col: str, id_col: str, prefix: str = ""):
    """(block_key, rid) rows from whitespace token blocking over ``col``
    (one row per DISTINCT (token, record); Arrow split + list-parent-index
    flatten, no Python row loop).  ``prefix`` namespaces the key so several
    families can be unioned (``'type:'`` etc.)."""

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(t[col], pa.string()), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        parents = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        if prefix:
            flat = pc.binary_join_element_wise(
                pa.array([prefix] * len(flat), pa.string()), flat, ""
            )
        rid = pc.take(t[id_col], parents)
        out = pa.table({"block_key": flat, "rid": rid})
        # within-record duplicate tokens would double-count CBS evidence
        df = out.to_pandas().drop_duplicates()
        return clean_arrow(df)

    return ds.map_batches(fn, batch_format="pyarrow")


def column_blocks(ds, col: str, id_col: str, prefix: str = ""):
    """(block_key, rid) rows keyed on a whole column value (cast to string,
    optionally prefixed) — the brand/size-style exact-key family."""

    def fn(t: pa.Table) -> pa.Table:
        key = pc.cast(t[col], pa.string())
        if prefix:
            key = pc.binary_join_element_wise(
                pa.array([prefix] * len(t), pa.string()), key, ""
            )
        return pa.table({"block_key": key, "rid": t[id_col]})

    return ds.map_batches(fn, batch_format="pyarrow")


def cbs_edge_weights(
    blocks_ds,
    id_col: str = "rid",
    max_block_size: int = 500,
    num_buckets: int | None = None,
):
    """Blocking map -> exact CBS edge weights ``(id_a, id_b, weight)``.

    Stage 1 buckets on ``hash(block_key)`` so every block is wholly inside
    one task: blocks sized outside ``[2, max_block_size]`` are purged, pairs
    are emitted against cached triu indices, and duplicate pairs within the
    task are pre-summed (combiner).  Stage 2 buckets on the pair hash and
    sums the partials — exact global weights, each bucket one task.
    """
    num_buckets = resolve_buckets(num_buckets, blocks_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(t["block_key"].to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    bucketed = blocks_ds.map_batches(add_bucket, batch_format="pyarrow")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=df[id_col].dtype),
                "id_b": pd.Series([], dtype=df[id_col].dtype),
                "weight": pd.Series([], dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        df = df.drop_duplicates(subset=["block_key", id_col])
        df = df.sort_values(["block_key", id_col], kind="stable").reset_index(
            drop=True
        )
        codes, _ = pd.factorize(df["block_key"], sort=False)
        sizes = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        ids = df[id_col].to_numpy()
        out_a: list = []
        out_b: list = []
        for g in np.flatnonzero((sizes >= 2) & (sizes <= max_block_size)):
            ia, ib = _pair_idx(int(sizes[g]))
            o = int(starts[g])
            out_a.append(o + ia)
            out_b.append(o + ib)
        if not out_a:
            return empty
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        part = pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})
        part = (
            part.groupby(["id_a", "id_b"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "weight"})
        )
        part["weight"] = part["weight"].astype(np.int64)
        return part

    partials = bucketed.groupby("bucket").map_groups(emit, batch_format="pandas")

    def add_pbucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        h = (stable_hash(a) * np.uint64(1_000_003) + stable_hash(b)) % num_buckets
        return t.append_column("pbucket", pa.array(h.astype(np.int64), pa.int64()))

    def wsum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], as_index=False, sort=False)["weight"].sum()
        g["weight"] = g["weight"].astype(np.int64)
        return g

    return (
        partials.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(wsum, batch_format="pandas")
    )


def meta_block_prune(
    blocks_ds,
    id_col: str = "rid",
    max_block_size: int = 500,
    mode: str = "wep",
    k: int = 2,
    num_buckets: int | None = None,
):
    """Full meta-blocking pass: purge -> CBS weights -> WEP or CNP pruning.

    Returns a Dataset ``(id_a, id_b, weight)`` of surviving candidate edges
    (``id_a < id_b`` in the natural order of the id dtype).

    WEP needs the global mean edge weight before it can filter, so the
    weights dataset is materialized once (it is pair-scale — the same
    working set the downstream scorer holds) and the threshold is a
    two-number driver aggregate.  CNP is bounded by construction:
    ``<= 2 * k`` directed keeps per node, deduped to undirected pairs.
    """
    if mode not in ("wep", "cnp"):
        raise ValueError(f"mode must be 'wep' or 'cnp', got {mode!r}")
    weights = cbs_edge_weights(
        blocks_ds, id_col=id_col, max_block_size=max_block_size,
        num_buckets=num_buckets,
    )
    if mode == "wep":
        weights = weights.materialize()
        n_edges = weights.count()
        if not n_edges:
            return weights
        mean_w = weights.sum("weight") / n_edges

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["weight"], pa.scalar(mean_w)))

        return weights.map_batches(keep, batch_format="pyarrow")

    # CNP: emit both directions, bucket on node, per-node top-k by
    # (weight desc, neighbour asc), then undirected distinct.
    nb = resolve_buckets(num_buckets, blocks_ds)

    def directed(t: pa.Table) -> pa.Table:
        fwd = pa.table(
            {"node": t["id_a"], "other": t["id_b"], "weight": t["weight"]}
        )
        rev = pa.table(
            {"node": t["id_b"], "other": t["id_a"], "weight": t["weight"]}
        )
        both = pa.concat_tables([fwd, rev])
        h = stable_hash(both["node"].to_numpy(zero_copy_only=False)) % nb
        return both.append_column("nbucket", pa.array(h.astype(np.int64), pa.int64()))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["node", "weight", "other"], ascending=[True, False, True],
            kind="stable",
        )
        kept = df[df.groupby("node", sort=False).cumcount() < k]
        a = kept["node"].to_numpy()
        b = kept["other"].to_numpy()
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "weight": kept["weight"].to_numpy()}
        )

    kept_dir = (
        weights.map_batches(directed, batch_format="pyarrow")
        .groupby("nbucket")
        .map_groups(topk, batch_format="pandas")
    )

    def add_pbucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        h = (stable_hash(a) * np.uint64(1_000_003) + stable_hash(b)) % nb
        return t.append_column("pbucket", pa.array(h.astype(np.int64), pa.int64()))

    def drop_dup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["pbucket"])

    return (
        kept_dir.map_batches(add_pbucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(drop_dup, batch_format="pandas")
    )
