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
def _large_star(tbl: pa.Table) -> pa.Table:
    """One large-star groupby round: for each node, link larger neighbors to
    the min of (node ∪ neighborhood)."""
    df = tbl.to_pandas()
    u = df["u"].iloc[0]
    nbrs = df["v"].unique()
    m = min(u, nbrs.min())
    bigger = nbrs[nbrs > u]
    out = pd.DataFrame({"u": bigger, "v": np.full(len(bigger), m, dtype=object)})
    return pa.Table.from_pandas(out.astype({"u": df["u"].dtype, "v": df["v"].dtype}), preserve_index=False)


def _small_star(tbl: pa.Table) -> pa.Table:
    """One small-star round: link all smaller-or-equal neighbors to the min."""
    df = tbl.to_pandas()
    u = df["u"].iloc[0]
    nbrs = df["v"].unique()
    m = min(u, nbrs.min())
    targets = np.append(nbrs[nbrs != m], u)
    out = pd.DataFrame({"u": np.unique(targets), "v": m})
    out = out[out["u"] != out["v"]]
    return pa.Table.from_pandas(out.astype({"u": df["u"].dtype, "v": df["v"].dtype}), preserve_index=False)


def _both_directions(edges_ds):
    def dup(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
                "v": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()]),
            }
        )

    return edges_ds.map_batches(dup, batch_format="pyarrow")


def _directed_large(edges_ds):
    return _both_directions(edges_ds).groupby("u").map_groups(_large_star, batch_format="pyarrow")


def _directed_small(edges_ds):
    def to_small(t: pa.Table) -> pa.Table:
        u = pc.max_element_wise(t["u"], t["v"])
        v = pc.min_element_wise(t["u"], t["v"])
        return pa.table({"u": u, "v": v})

    directed = edges_ds.map_batches(to_small, batch_format="pyarrow")
    return directed.groupby("u").map_groups(_small_star, batch_format="pyarrow")


def _dedup_edges(ds):
    return ds.groupby(["u", "v"]).map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")


def connected_components_distributed(edges_ds, max_rounds: int = 20):
    """Alternating star rounds until the edge multiset is stable.

    Returns a Dataset (node, label) covering every node that appears in an
    edge; label = component min id.  Each round is two groupby shuffles; the
    iteration is driven from the driver (Ray Data has no native loops) with
    per-round materialization — rounds needed ≈ O(log diameter).
    """
    cur = _dedup_edges(edges_ds)
    prev_sig = None
    for _ in range(max_rounds):
        cur = _dedup_edges(_directed_large(cur))
        cur = _dedup_edges(_directed_small(cur))
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
    return _dedup_labels(labels.union(roots))


def _dedup_labels(ds):
    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("label", kind="stable").head(1)

    return ds.groupby("node").map_groups(min_label, batch_format="pandas")


def connected_components(edges_ds, driver_limit: int = 2_000_000, max_rounds: int = 20):
    """(id_a, id_b) edge Dataset -> (node, label) Dataset.

    Small edge sets take the driver union-find fast path (the reference's own
    posture, kept because collecting a few hundred thousand edges is cheaper
    than iterated shuffles); larger sets run distributed star rounds.
    """
    n_edges = edges_ds.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}))
    if n_edges <= driver_limit:
        df = edges_ds.select_columns(["id_a", "id_b"]).to_pandas()
        labels = union_find(df["id_a"].tolist(), df["id_b"].tolist())
        import ray.data as rd

        out = pd.DataFrame({"node": list(labels.keys()), "label": list(labels.values())})
        return rd.from_pandas(out)
    renamed = edges_ds.map_batches(
        lambda t: pa.table({"u": t["id_a"], "v": t["id_b"]}), batch_format="pyarrow"
    )
    return connected_components_distributed(renamed, max_rounds=max_rounds)


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
class _LabelAnnotator:
    """Broadcast-join stage: canon/conf lookup dicts shipped once per actor
    via ``ray.put`` (the small-side broadcast pattern, SURVEY.md §4)."""

    def __init__(self, labels_ref, conf_ref):
        import ray

        self.labels = ray.get(labels_ref) if isinstance(labels_ref, ray.ObjectRef) else labels_ref
        self.conf = ray.get(conf_ref) if isinstance(conf_ref, ray.ObjectRef) else conf_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        rids = t["record_id"].to_pylist()
        canon = [self.labels.get(r, r) for r in rids]
        cols = {
            "record_id": t["record_id"],
            "canon_id": pa.array(canon, pa.string()),
        }
        if self.conf is not None:
            cols["cluster_score"] = pa.array(
                [self.conf.get(r) for r in rids], pa.float64()
            )
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

        lab = labels_ds.to_pandas()
        label_map = (
            {} if lab.empty else dict(zip(lab["node"].astype(str), lab["label"].astype(str)))
        )
        conf_map = None
        if confidence_ds is not None:
            cf = confidence_ds.to_pandas()
            conf_map = (
                {} if cf.empty else dict(zip(cf["node"].astype(str), cf["cluster_score"]))
            )
        return ids.map_batches(
            _LabelAnnotator,
            fn_constructor_kwargs=dict(
                labels_ref=ray.put(label_map), conf_ref=ray.put(conf_map)
            ),
            batch_format="pyarrow",
            concurrency=(1, 4),
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
                "canon_id": pc.coalesce(t["canon_id"], t["record_id"]),
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
