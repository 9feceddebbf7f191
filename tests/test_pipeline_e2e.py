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
