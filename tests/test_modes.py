"""RecordLink and Gazetteer mode tests on a two-source split of the gold corpus."""

from __future__ import annotations

import pyarrow as pa
import pytest

from dedupe_examples_ray.config import default_page_settings
from dedupe_examples_ray.normalize import derive_page_fields
from dedupe_examples_ray.pipelines.gazetteer import GazetteerIndex
from dedupe_examples_ray.pipelines.record_link import greedy_one_to_one, record_link
from dedupe_examples_ray.synth import synth_pages_table


def _two_sources(n_clusters=120, seed=42):
    """Split each gold cluster: member 0 -> A (canonical), member 1 -> B (messy).

    Each side is internally dupe-free (record_linkage_example.py:3-8).
    """
    pages, gold = synth_pages_table(n_clusters, seed)
    tid = gold["true_id"].to_pylist()
    urls = gold["url"].to_pylist()
    first_seen: dict = {}
    side = []
    for u, t in zip(urls, tid):
        k = first_seen.setdefault(t, 0)
        side.append(k)
        first_seen[t] = k + 1
    tbl = derive_page_fields(pages).append_column("side", pa.array(side, pa.int8()))
    a = tbl.filter(pa.compute.equal(tbl["side"], 0))
    b = tbl.filter(pa.compute.equal(tbl["side"], 1))
    true_links = {}
    for u, t, s in zip(urls, tid, side):
        if s in (0, 1):
            true_links.setdefault(t, {})[s] = u
    links = {(v[0], v[1]) for v in true_links.values() if len(v) == 2}
    return a, b, links


@pytest.fixture(scope="module")
def sources(ray_session):
    import ray.data as rd

    a, b, links = _two_sources()
    return rd.from_arrow(a).materialize(), rd.from_arrow(b).materialize(), links


def test_record_link_finds_true_links(sources):
    ds_a, ds_b, true_links = sources
    s = default_page_settings()
    out = record_link(ds_a, ds_b, s, id_col="url", scorer_concurrency=2)
    got = {
        (ia.split(":", 1)[1], ib.split(":", 1)[1])
        for ia, ib in zip(out["id_a"], out["id_b"])
    }
    assert got, "no links found"
    prec = len(got & true_links) / len(got)
    rec = len(got & true_links) / len(true_links)
    assert prec >= 0.99 and rec >= 0.99, (prec, rec)
    # one-to-one: no id reused
    assert out["id_a"].is_unique and out["id_b"].is_unique


def test_greedy_one_to_one_deterministic_ties():
    import pandas as pd

    df = pd.DataFrame(
        {
            "id_a": ["a1", "a1", "a2"],
            "id_b": ["b1", "b2", "b1"],
            "score": [0.9, 0.9, 0.9],
        }
    )
    out = greedy_one_to_one(df)
    # ties broken by (id_a, id_b): a1-b1 wins, a1-b2 blocked on a1, a2-b1 on b1
    assert set(zip(out["id_a"], out["id_b"])) == {("a1", "b1")}


def test_gazetteer_topk(sources):
    ds_a, ds_b, true_links = sources
    s = default_page_settings()
    index = GazetteerIndex(ds_a, s, id_col="url")  # canonical = A
    matches = index.search(ds_b, n_matches=2, scorer_concurrency=2).to_pandas()
    assert (matches.groupby("id_a").size() <= 2).all()
    best = matches.sort_values("score", ascending=False).drop_duplicates("id_a")
    got = {
        (ib.split(":", 1)[1], ia.split(":", 1)[1])
        for ia, ib in zip(best["id_a"], best["id_b"])
    }
    rec = len(got & true_links) / len(true_links)
    assert rec >= 0.99, rec


def test_snm_blocking_mode_gold_f1(ray_session):
    """dedupe_dataset(blocking='snm') — sorted-neighborhood candidate
    generation replacing the fingerprinter — holds the gold-F1 contract,
    with raw AND surrogate ids."""
    from dedupe_examples_ray.evaluate import evaluate_entity_map
    from dedupe_examples_ray.pipelines import dedupe_pages
    from dedupe_examples_ray.synth import synth_pages_dataset

    full = synth_pages_dataset(150, seed=42).materialize()
    pages = full.drop_columns(["true_id"])
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    em = dedupe_pages(pages, blocking="snm", snm_keys=["title", "path"]).to_pandas()
    assert evaluate_entity_map(em, gold)["f1"] >= 0.99
    em2 = dedupe_pages(pages, blocking="snm", snm_keys=["title", "path"],
                       surrogate_ids=True).to_pandas()
    assert evaluate_entity_map(em2, gold)["f1"] >= 0.99

    import pytest

    with pytest.raises(ValueError, match="blocking"):
        dedupe_pages(pages, blocking="nope")
