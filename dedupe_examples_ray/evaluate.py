"""Pairwise precision/recall/F1 — exact reference evaluation arithmetic.

Reproduces csv_example/csv_evaluation.py:6-37: gold pairs are the per-cluster
``itertools.combinations`` (same-table) or per-source products (cross-table,
record_linkage_example_evaluation.py:22-41), canonicalized as frozensets;
precision = 1 - |FP|/|found|, recall = |TP|/|true|.  Unlabeled records
(true_id null / "x") are excluded (csv_evaluation.py:28-29).

Gold corpora are small (thousands of rows) — this is a driver-side harness by
design, like the reference's.
"""

from __future__ import annotations

from itertools import combinations, product


def pairs_from_clusters(ids, labels) -> set:
    """Per-cluster combinations -> set of frozenset pairs (csv_evaluation.py:20-37)."""
    clusters: dict = {}
    for i, lab in zip(ids, labels):
        if lab is None or lab == "x":
            continue
        clusters.setdefault(lab, []).append(i)
    out = set()
    for members in clusters.values():
        for a, b in combinations(members, 2):
            out.add(frozenset((a, b)))
    return out


def pairs_from_linked_sources(ids, labels, sources) -> set:
    """Cross-source products (record_linkage_example_evaluation.py:22-41)."""
    clusters: dict = {}
    for i, lab, s in zip(ids, labels, sources):
        if lab is None or lab == "x":
            continue
        clusters.setdefault(lab, {}).setdefault(s, []).append(i)
    out = set()
    for sides in clusters.values():
        groups = list(sides.values())
        for gi in range(len(groups)):
            for gj in range(gi + 1, len(groups)):
                for a, b in product(groups[gi], groups[gj]):
                    out.add(frozenset((a, b)))
    return out


def pairwise_scores(found: set, true: set) -> dict:
    """precision = 1 - |FP|/|found|; recall = |TP|/|true| (csv_evaluation.py:6-17)."""
    tp = found & true
    fp = found - true
    precision = 1.0 - len(fp) / len(found) if found else 0.0
    recall = len(tp) / len(true) if true else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "found_pairs": len(found),
        "true_pairs": len(true),
        "true_positives": len(tp),
        "false_positives": len(fp),
    }


def evaluate_entity_map(entity_df, gold_df, id_col="record_id", cluster_col="canon_id", true_col="true_id", gold_id_col="url") -> dict:
    """Compare an entity-map DataFrame against a gold labeling DataFrame."""
    found = pairs_from_clusters(entity_df[id_col].tolist(), entity_df[cluster_col].tolist())
    true = pairs_from_clusters(gold_df[gold_id_col].tolist(), gold_df[true_col].tolist())
    return pairwise_scores(found, true)


def cluster_eval_metrics(ds, pred_col: str, gold_col: str,
                         round_digits: int = 6):
    """Extrinsic clustering metrics beyond pairwise P/R (csv_evaluation.py's
    arithmetic, A8): B-cubed precision/recall/F1 (Bagga & Baldwin 1998) and
    the Adjusted Rand Index (Hubert & Arabie 1985) between a predicted and a
    gold clustering, from ONE contingency pass.

    Distributed shape: the corpus-sized work is a single combiner-shaped
    ``grouped_sum`` building the (pred, gold) contingency cells — everything
    after runs over the CELLS (bounded by #distinct cluster intersections,
    not records): two more grouped_sums for the margins, a streamed scalar
    reduction to the driver.  NULL cluster ids form their own cluster (SQL
    GROUP BY semantics, matched by the oracle).

    B3 precision = sum_cells n^2/np / N (np = pred-cluster size); recall the
    same over gold sizes; ARI from the pair counts C(n,2) of cells/margins.
    Returns a one-row pandas DataFrame.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import grouped_sum

    def encode(t: pa.Table) -> pa.Table:
        # NULL ids form ONE cluster (SQL GROUP BY semantics) — but the
        # margin hash_joins below use SQL JOIN semantics, which would DROP
        # null keys.  Sentinel-encode both label columns ('v'+value keeps
        # real values collision-free with the sentinel).
        def enc(col):
            s = pc.cast(t[col], pa.string())
            return pc.fill_null(pc.binary_join_element_wise("v", s, ""), "__NULL__")

        return pa.table({pred_col: enc(pred_col), gold_col: enc(gold_col)})

    cells = grouped_sum(
        ds.select_columns([pred_col, gold_col]).map_batches(
            encode, batch_format="pyarrow"),
        [pred_col, gold_col], {},
        count_col="n",
    ).materialize()
    psz = grouped_sum(cells, [pred_col], {"n": "np"})
    gsz = grouped_sum(cells, [gold_col], {"n": "ng"})

    # margins join back onto cells: broadcast-free big-big joins keep this
    # correct when cluster counts are corpus-scale (web dedup: most clusters
    # are singletons, so |cells| ~ N)
    from .relational import hash_join

    joined = hash_join(
        hash_join(cells, psz, on=pred_col), gsz, on=gold_col)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        np_ = t["np"].to_numpy(zero_copy_only=False).astype(np.float64)
        ng = t["ng"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "N": pa.array([float(n.sum())]),
            "bp": pa.array([float((n * n / np_).sum())]),
            "br": pa.array([float((n * n / ng).sum())]),
            "pairs_cells": pa.array([float((n * (n - 1) / 2.0).sum())]),
        })

    def margin_pairs(t: pa.Table, col: str) -> pa.Table:
        import numpy as np

        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"s": pa.array([float((v * (v - 1) / 2.0).sum())])})

    agg = joined.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    pa_pairs = psz.map_batches(
        lambda t: margin_pairs(t, "np"), batch_format="pyarrow"
    ).to_pandas()["s"].sum()
    pb_pairs = gsz.map_batches(
        lambda t: margin_pairs(t, "ng"), batch_format="pyarrow"
    ).to_pandas()["s"].sum()

    import pandas as pd

    N = agg["N"]
    b3p = agg["bp"] / N
    b3r = agg["br"] / N
    b3f = 2 * b3p * b3r / (b3p + b3r) if (b3p + b3r) > 0 else 0.0
    total_pairs = N * (N - 1) / 2.0
    exp = pa_pairs * pb_pairs / total_pairs if total_pairs > 0 else 0.0
    max_idx = (pa_pairs + pb_pairs) / 2.0
    denom = max_idx - exp
    ari = (agg["pairs_cells"] - exp) / denom if denom != 0 else 1.0
    # half-away-from-zero to match SQL ROUND (python round is banker's)
    import numpy as np

    scale = 10.0 ** round_digits
    r = lambda x: float(np.sign(x) * np.floor(abs(float(x)) * scale + 0.5) / scale)
    return pd.DataFrame([{
        "n_records": int(N),
        "b3_precision": r(b3p),
        "b3_recall": r(b3r),
        "b3_f1": r(b3f),
        "ari": r(ari),
    }])


# --------------------------------------------------------------- PR curve
def pr_curve(scores_ds, gold_pairs: set, bins: int = 200):
    """Precision/recall/F1 across the full score range in ONE combiner pass.

    The reference evaluates at a single threshold (csv_evaluation.py:6-17);
    sweeping candidates re-runs nothing here: each scored-pair batch labels
    its pairs against the broadcast gold set and histograms (is_true, score)
    into ``bins`` buckets — O(bins) partials per batch — and the driver
    builds the whole curve from two cumulative sums.  Gold is eval-scale by
    construction (labeled pairs), so the broadcast is bounded by the
    labeling effort, never the corpus.

    Returns a DataFrame (threshold, tp, fp, fn, precision, recall, f1),
    one row per occupied bin edge, descending threshold.  Pairs are matched
    orientation-insensitively.

    Precondition: ``scores_ds`` holds DISTINCT unordered pairs (the flagship
    pair stage guarantees this via its pair-key DISTINCT).  A pair present
    in both orientations (or duplicated) would be counted twice against the
    same gold entry; tp is clipped to ``n_gold`` as a guard so recall stays
    <= 1 and fn >= 0 even on malformed input.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    gold_ref = ray.put(frozenset(frozenset(p) for p in gold_pairs))
    n_gold = len(gold_pairs)
    edges = np.linspace(0.0, 1.0, bins + 1)

    def hist(t: pa.Table) -> pa.Table:
        g = ray.get(gold_ref)
        a = t["id_a"].to_pylist()
        b = t["id_b"].to_pylist()
        s = np.clip(t["score"].to_numpy(zero_copy_only=False), 0.0, 1.0)
        is_true = np.fromiter(
            (frozenset((x, y)) in g for x, y in zip(a, b)), bool, len(a)
        )
        idx = np.minimum(np.searchsorted(edges, s, side="right") - 1, bins - 1)
        ht = np.bincount(idx[is_true], minlength=bins).astype(np.int64)
        hf = np.bincount(idx[~is_true], minlength=bins).astype(np.int64)
        return pa.table({
            "ht": pa.array([ht.tolist()], pa.list_(pa.int64())),
            "hf": pa.array([hf.tolist()], pa.list_(pa.int64())),
        })

    parts = scores_ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    ht = np.zeros(bins, np.int64)
    hf = np.zeros(bins, np.int64)
    for r in parts.itertuples():
        ht += np.asarray(r.ht, np.int64)
        hf += np.asarray(r.hf, np.int64)
    # threshold = bin lower edge, descending: cumulative from the top
    tp = np.cumsum(ht[::-1])[::-1]
    fp = np.cumsum(hf[::-1])[::-1]
    # guard against duplicated/bi-oriented input pairs (see docstring)
    tp = np.minimum(tp, n_gold)
    fn = n_gold - tp
    occupied = (ht + hf) > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(tp + fp > 0, tp / (tp + fp), 1.0)
        rec = np.where(n_gold > 0, tp / max(n_gold, 1), 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    out = pd.DataFrame({
        "threshold": edges[:-1][occupied],
        "tp": tp[occupied], "fp": fp[occupied], "fn": fn[occupied],
        "precision": prec[occupied], "recall": rec[occupied],
        "f1": f1[occupied],
    })
    return out.sort_values("threshold", ascending=False).reset_index(drop=True)
