"""Non-interactive active learning (the reference's prepare_training +
console_label + train loop, csv_example.py:115-144, with a programmatic
labeler): starting from ZERO weights, <=50 uncertainty-sampled labels must
recover the gold-F1 contract on the synthesized pages corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _derived(pages):
    from dedupe_examples_ray.normalize import derive_page_fields

    return pages.select_columns(["url", "text"]).map_batches(
        derive_page_fields, batch_format="pyarrow"
    )


def test_active_learning_recovers_f1(ray_session):
    from dedupe_examples_ray.config import default_page_settings
    from dedupe_examples_ray.evaluate import evaluate_entity_map
    from dedupe_examples_ray.pipelines import dedupe_pages
    from dedupe_examples_ray.synth import synth_pages_dataset
    from dedupe_examples_ray.training import active_learning

    full = synth_pages_dataset(150, seed=3)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = dict(
        zip(*(full.select_columns(["url", "true_id"]).to_pandas()[c]
              for c in ("url", "true_id")))
    )

    base = default_page_settings()
    base.weights = {k: 0.0 for k in base.weights}  # perturbed start
    base.bias = 0.0

    labels_used = {"n": 0}

    def label_fn(a, b):
        labels_used["n"] += 1
        return gold[a["url"]] == gold[b["url"]]

    trained, hist = active_learning(
        _derived(pages), base, "url", label_fn, rounds=5, k=10, seed=7
    )
    assert labels_used["n"] <= 50
    assert hist and hist[-1]["labeled"] == labels_used["n"]
    assert hist[-1]["n_match"] > 0 and hist[-1]["n_distinct"] > 0
    # the refit weights must separate: match features score >> distinct
    assert any(abs(w) > 0.1 for w in trained.weights.values())

    gold_df = full.select_columns(["url", "true_id"]).to_pandas()
    entity = dedupe_pages(pages, settings=trained, scorer_concurrency=2).to_pandas()
    scores = evaluate_entity_map(entity, gold_df)
    assert scores["f1"] >= 0.95, (scores, trained.weights)


def test_uncertainty_sample_orders_by_margin(ray_session):
    from dedupe_examples_ray.config import Field, Settings
    from dedupe_examples_ray.training import uncertainty_sample

    s = Settings(fields=[Field("x", "exact")], weights={"x": 4.0}, bias=-2.0)
    # x equal -> p = sigmoid(2) ~ 0.88; x differing -> p = sigmoid(-2) ~ 0.12
    # both sit at the same margin; a null pair -> missing -> p = sigmoid(-2)
    tbl = pa.table(
        {
            "id_a": pa.array([1, 2, 3], pa.int64()),
            "id_b": pa.array([4, 5, 6], pa.int64()),
            "x_a": pa.array(["u", "v", "w"]),
            "x_b": pa.array(["u", "z", "w"]),
        }
    )
    got = uncertainty_sample(tbl, s, k=2, exclude={0})
    assert len(got) == 2 and 0 not in got
    # excluding nothing returns stable ordering over equal margins
    all3 = uncertainty_sample(tbl, s, k=3)
    assert sorted(all3) == [0, 1, 2]
