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
