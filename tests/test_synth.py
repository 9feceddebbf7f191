"""Tests for the seeded page-corpus generator (gold-cluster planting)."""

from __future__ import annotations

import numpy as np

from dedupe_examples_ray.extract import extract_text
from dedupe_examples_ray.synth import (
    GOLD_SCHEMA,
    PAGES_SCHEMA,
    make_cluster,
    synth_pages_dataset,
    synth_pages_table,
)


def test_deterministic_and_schema():
    p1, g1 = synth_pages_table(50, seed=42)
    p2, g2 = synth_pages_table(50, seed=42)
    assert p1.equals(p2) and g1.equals(g2)
    assert p1.schema.equals(PAGES_SCHEMA)
    assert g1.schema.equals(GOLD_SCHEMA)
    p3, _ = synth_pages_table(50, seed=7)
    assert not p1.equals(p3)


def test_extraction_invariant_holds_on_corpus():
    pages, _ = synth_pages_table(60, seed=42)
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text(html) == text


def test_urls_unique_and_first_title_token_stable():
    pages, gold = synth_pages_table(120, seed=42)
    urls = pages["url"].to_pylist()
    assert len(urls) == len(set(urls))
    # within a cluster the first token of the extracted title never changes
    texts = pages["text"].to_pylist()
    tids = gold["true_id"].to_pylist()
    first = {}
    for t, tid in zip(texts, tids):
        tok = t.split("\n", 1)[0].lower().split(" ", 1)[0].strip(",.'-")
        first.setdefault(tid, set()).add(tok)
    assert all(len(s) == 1 for s in first.values())


def test_cluster_size_distribution():
    sizes = [len(make_cluster(cid, 42)) for cid in range(400)]
    sizes = np.array(sizes)
    assert sizes.min() >= 1 and sizes.max() <= 18
    assert 0.2 < (sizes == 1).mean() < 0.5
    assert 2.0 < sizes.mean() < 4.0


def test_distributed_matches_local(ray_session):
    ds = synth_pages_dataset(30, seed=42)
    tbl = ds.to_pandas().sort_values("url").reset_index(drop=True)
    pages, gold = synth_pages_table(30, seed=42)
    local = pages.append_column("true_id", gold["true_id"]).to_pandas()
    local = local.sort_values("url").reset_index(drop=True)
    assert tbl[["url", "text", "true_id"]].equals(local[["url", "text", "true_id"]])
