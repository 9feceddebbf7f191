"""End-to-end conformance: flagship dedupe on the synthesized gold corpus.

The BASELINE.json contract: pairwise F1 >= 0.99 vs gold labeled pairs under
the same blocking keys, using the reference evaluation arithmetic
(csv_evaluation.py:6-17).
"""

from __future__ import annotations

import pytest

from dedupe_examples_ray.evaluate import evaluate_entity_map
from dedupe_examples_ray.pipelines import dedupe_pages
from dedupe_examples_ray.synth import synth_pages_dataset


@pytest.fixture(scope="module")
def gold_run(ray_session):
    full = synth_pages_dataset(300, seed=42)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    entity = dedupe_pages(pages, scorer_concurrency=2).to_pandas()
    return entity, gold


def test_f1_against_gold(gold_run):
    entity, gold = gold_run
    scores = evaluate_entity_map(entity, gold)
    assert scores["recall"] >= 0.99, scores
    assert scores["precision"] >= 0.99, scores
    assert scores["f1"] >= 0.99, scores


def test_entity_map_covers_every_record_once(gold_run):
    entity, gold = gold_run
    assert len(entity) == len(gold)
    assert entity["record_id"].is_unique
    assert set(entity["record_id"]) == set(gold["url"])
    # canon ids are member minima -> every canon id is itself a record
    assert set(entity["canon_id"]) <= set(gold["url"])


def test_confidence_present_for_clustered(gold_run):
    entity, gold = gold_run
    clustered = entity[entity["record_id"] != entity["canon_id"]]
    assert clustered["cluster_score"].notna().all()
    assert ((clustered["cluster_score"] > 0.5) & (clustered["cluster_score"] <= 1.0)).all()


def test_f1_with_canopy_predicates(ray_session):
    """Adding the TF-IDF canopy index predicate keeps the gold contract
    (recall can only grow; precision is guarded by the scorer)."""
    from dedupe_examples_ray.config import default_page_settings

    full = synth_pages_dataset(150, seed=7)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    s = default_page_settings()
    s.predicates = s.predicates + [{"kind": "tfidf_canopy", "column": "title", "k": 2}]
    entity = dedupe_pages(pages, settings=s).to_pandas()
    scores = evaluate_entity_map(entity, gold)
    assert scores["f1"] >= 0.99, scores


def test_f1_with_cnp_meta_blocking(ray_session):
    """Opt-in meta-blocking (pair_pruning='cnp', k=4) between pair-gen and
    scoring keeps the gold contract — each record's top-4 co-blocked
    neighbours retain every true pair on this corpus."""
    full = synth_pages_dataset(150, seed=7)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    entity = dedupe_pages(pages, scorer_concurrency=2,
                          pair_pruning="cnp", prune_k=4).to_pandas()
    scores = evaluate_entity_map(entity, gold)
    assert scores["f1"] >= 0.99, scores


def test_empty_corpus_through_dedupe_pages(ray_session):
    """A zero-row pages dataset flows through block->pair->score->CC->entity
    map and yields an empty entity map (no crash at any stage boundary)."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.pipelines import dedupe_pages

    t = pa.table({"url": pa.array([], pa.string()), "text": pa.array([], pa.string())})
    out = dedupe_pages(rd.from_arrow(t))
    assert out.count() == 0
    # NB: Ray's to_pandas() drops columns on an empty dataset; the Dataset
    # schema is the contract
    assert set(f.name for f in out.schema().base_schema) == {
        "record_id", "canon_id", "cluster_score"}


def test_grouped_sum_empty_and_null_keys(ray_session):
    """The bucketed grouped_sum merge handles a zero-row input and groups
    NULL keys as their own group (SQL GROUP BY semantics)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.relational import grouped_sum

    empty = pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())})
    out = grouped_sum(rd.from_arrow(empty), ["k"], {"v": "s"}, count_col="n").to_pandas()
    assert len(out) == 0

    t = pa.table({"k": ["a", None, "a", None, "b"],
                  "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    got = (grouped_sum(rd.from_arrow(t).repartition(3), ["k"], {"v": "s"}, count_col="n")
           .to_pandas().sort_values("k", na_position="last").reset_index(drop=True))
    assert got.loc[got["k"] == "a", "s"].iloc[0] == 4.0
    assert got.loc[got["k"] == "b", "n"].iloc[0] == 1
    null_row = got[got["k"].isna()]
    assert len(null_row) == 1 and null_row["s"].iloc[0] == 6.0 and null_row["n"].iloc[0] == 2


def test_f1_with_average_linkage(ray_session):
    """linkage="average" keeps the gold contract: re-cutting CC components
    with average linkage at the partition threshold must not split true
    clusters on the gold corpus (their pairwise evidence is dense), so
    F1 stays >= 0.99 — the anti-chaining refinement only removes edges the
    gold standard never asserted."""
    full = synth_pages_dataset(150, seed=11)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    entity = dedupe_pages(pages, linkage="average").to_pandas()
    scores = evaluate_entity_map(entity, gold)
    assert scores["f1"] >= 0.99, scores


def test_pr_curve_single_pass(ray_session):
    """pr_curve: full threshold sweep from one histogram pass — recall
    monotone nonincreasing in threshold, perfect separation yields an
    F1=1.0 operating point, counts exact vs a brute-force sweep."""
    import numpy as np
    import ray.data as rd

    from dedupe_examples_ray.evaluate import pr_curve

    rng = np.random.default_rng(9)
    gold = {(f"a{i}", f"b{i}") for i in range(40)}
    rows = []
    for i in range(40):  # true pairs score high
        rows.append({"id_a": f"a{i}", "id_b": f"b{i}",
                     "score": float(0.8 + 0.2 * rng.random())})
    for i in range(160):  # false pairs score low
        rows.append({"id_a": f"x{i}", "id_b": f"y{i}",
                     "score": float(0.5 * rng.random())})
    ds = rd.from_items(rows).repartition(4)
    curve = pr_curve(ds, gold, bins=100)
    assert (np.diff(curve["threshold"].to_numpy()) < 0).all()
    # recall nondecreasing as threshold drops (curve is threshold-desc)
    assert (np.diff(curve["recall"].to_numpy()) >= 0).all()
    assert curve["f1"].max() >= 0.999
    # exact counts at a specific threshold vs brute force
    thr = 0.6
    got = curve[curve["threshold"] <= thr].iloc[0]
    bf_tp = sum(1 for r in rows if r["score"] >= got["threshold"]
                and (r["id_a"], r["id_b"]) in gold)
    bf_fp = sum(1 for r in rows if r["score"] >= got["threshold"]
                and (r["id_a"], r["id_b"]) not in gold)
    assert int(got["tp"]) == bf_tp and int(got["fp"]) == bf_fp


def test_pr_curve_empty_scores(ray_session):
    """An empty scored-pair set yields an empty curve, not a crash."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.evaluate import pr_curve

    ds = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "score": pa.array([], pa.float64()),
    }))
    curve = pr_curve(ds, {("a", "b")}, bins=50)
    assert len(curve) == 0
