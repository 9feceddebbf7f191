"""Round-2 feature tests: canopy index predicates, predicate selection,
batched affine-gap, gazetteer absorb, shipped plugin comparator."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from dedupe_examples_ray.config import Field, Settings


def _reordered_corpus():
    """Pairs whose titles are token-reordered: no shared 12-char prefix, and
    the sorted-token window shifts — positional predicates miss them; the
    rare tokens (zanzibar/inkwell/...) survive reordering."""
    rows = [
        {"rid": "a1", "title": "zanzibar economic review quarterly report summary"},
        {"rid": "a2", "title": "quarterly report summary zanzibar economic review"},
        {"rid": "b1", "title": "inkwell annual market survey detailed findings"},
        {"rid": "b2", "title": "detailed findings inkwell annual market survey"},
    ]
    # filler making the non-distinctive tokens common (high DF)
    common = "economic review quarterly report summary annual market survey detailed findings"
    for i in range(40):
        toks = common.split()
        rows.append({"rid": f"f{i:02d}", "title": " ".join(np.roll(toks, i % len(toks)))})
    return rows


def _coblock_pairs(blocks_rows, id_col="rid"):
    from collections import defaultdict

    by_key = defaultdict(set)
    for r in blocks_rows:
        by_key[r["block_key"]].add(r[id_col])
    pairs = set()
    for ids in by_key.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def test_tfidf_canopy_recovers_reordered_titles(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.blocking import fingerprint_dataset

    ds = rd.from_items(_reordered_corpus())
    positional = Settings(
        fields=[Field("title", "string")],
        predicates=[
            {"kind": "prefix", "column": "title", "n": 12},
            {"kind": "sorted_tokens", "column": "title", "n": 4},
        ],
    )
    miss = _coblock_pairs(fingerprint_dataset(ds, positional, "rid", []).take_all())
    assert ("a1", "a2") not in miss and ("b1", "b2") not in miss

    canopy = Settings(
        fields=[Field("title", "string")],
        predicates=[
            {"kind": "prefix", "column": "title", "n": 12},
            {"kind": "tfidf_canopy", "column": "title", "k": 2},
        ],
    )
    hit = _coblock_pairs(fingerprint_dataset(ds, canopy, "rid", []).take_all())
    assert ("a1", "a2") in hit and ("b1", "b2") in hit
    # the canopy emits <= k keys per record — cheaper than blocking on every
    # token while recovering the reordered pairs
    token_blocks = Settings(
        fields=[Field("title", "string")],
        predicates=[{"kind": "token", "column": "title"}],
    )
    token_rows = fingerprint_dataset(ds, token_blocks, "rid", []).take_all()
    canopy_rows = fingerprint_dataset(ds, canopy, "rid", []).take_all()
    assert len(canopy_rows) < len(token_rows) / 2


def test_predicate_selection_set_cover(ray_session):
    from dedupe_examples_ray.training import select_predicates, train_settings

    rows = _reordered_corpus()
    df_map = {}
    for r in rows:
        for t in set(r["title"].split()):
            df_map[t] = df_map.get(t, 0) + 1
    matches = [
        ({"title": rows[0]["title"]}, {"title": rows[1]["title"]}),  # reordered
        ({"title": rows[2]["title"]}, {"title": rows[3]["title"]}),  # reordered
        ({"title": "alpha beta gamma delta"}, {"title": "alpha beta gamma delt"}),
    ]
    candidates = [
        {"kind": "prefix", "column": "title", "n": 12},
        {"kind": "sorted_tokens", "column": "title", "n": 4},
        {"kind": "tfidf_canopy", "column": "title", "k": 2},
        {"kind": "token", "column": "title"},  # covers everything, costly
    ]
    sample_values = {"title": [r["title"] for r in rows]}
    selected, coverage = select_predicates(
        candidates, matches, recall=0.9, sample_values=sample_values, df_map=df_map
    )
    assert coverage >= 0.9
    assert len(selected) < len(candidates)  # a strict subset suffices
    # the quadratic-cost bare token predicate must not be chosen: the canopy
    # covers the same pairs at a fraction of the block cost
    assert {"kind": "token", "column": "title"} not in selected

    base = Settings(fields=[Field("title", "string")], predicates=candidates)
    distincts = [({"title": "one two"}, {"title": "three four"})]
    trained = train_settings(
        base, matches, distincts, recall=0.9,
        sample_values=sample_values, df_map=df_map,
    )
    assert trained.predicates == selected  # selection persisted in artifact


def test_affine_gap_settings_end_to_end(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.pipelines import dedupe_dataset

    s = Settings(
        fields=[Field("title", "affine_gap")],
        predicates=[{"kind": "first_token", "column": "title"}],
        weights={"title": 12.0},
        bias=-9.0,
        threshold=0.5,
    )
    rows = [
        {"rid": "x1", "title": "grand hotel budapest main street"},
        {"rid": "x2", "title": "grand hotel budapest on main street"},  # gap insert
        {"rid": "y1", "title": "grand cafe vienna"},
    ]
    out = {r["record_id"]: r["canon_id"] for r in dedupe_dataset(
        rd.from_items(rows), s, id_col="rid").take_all()}
    assert out["x1"] == out["x2"]
    assert out["y1"] != out["x1"]


def test_gazetteer_absorb(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.pipelines.gazetteer import GazetteerIndex

    s = Settings(
        fields=[Field("name", "string")],
        predicates=[{"kind": "first_token", "column": "name"}],
        weights={"name": 12.0},
        bias=-9.0,
        threshold=0.5,
    )
    canon = rd.from_items([
        {"cid": "c1", "name": "starlight diner"},
        {"cid": "c2", "name": "mountain view bakery"},
    ])
    idx = GazetteerIndex(canon, s, id_col="cid")
    messy = rd.from_items([
        {"cid": "m1", "name": "starlight dinner"},        # matches c1
        {"cid": "m2", "name": "rivermouth tackle shop"},  # novel -> absorbed
    ])
    matches = idx.absorb(messy)
    got = {r["id_a"]: r["id_b"] for r in matches.iter_rows()}
    assert got.get("0:m1") == "1:c1"
    assert "0:m2" not in got
    # a later probe that duplicates the absorbed record now finds it
    probe = rd.from_items([{"cid": "p1", "name": "rivermouth tackle shp"}])
    found = {r["id_b"] for r in idx.search(probe, n_matches=1).iter_rows()}
    assert "1:m2" in found


def test_one_to_one_distributed_equals_greedy(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.pipelines.record_link import (
        greedy_one_to_one,
        one_to_one_links,
    )

    rng = np.random.default_rng(9)
    rows = []
    for i in range(120):
        for j in rng.choice(80, size=rng.integers(1, 4), replace=False):
            rows.append(
                {"id_a": f"a{i:03d}", "id_b": f"b{j:03d}",
                 "score": float(np.round(rng.random(), 6))}
            )
    import pandas as pd

    df = pd.DataFrame(rows).drop_duplicates(subset=["id_a", "id_b"])
    links = rd.from_pandas(df)
    want = greedy_one_to_one(df)
    got = one_to_one_links(links, driver_limit=0)  # force distributed rounds
    got_df = got.to_pandas() if hasattr(got, "to_pandas") else got
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b"]].to_numpy()))
    assert key(got_df) == key(want)


def test_shipped_plugin_comparator_end_to_end(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.pipelines import dedupe_dataset
    from dedupe_examples_ray.plugins import officer_settings, western_name_sim

    sims = western_name_sim(
        ["john alan smith", "j smith", "maria garcia", None],
        ["jon alan smith", "john smith", "maria lopez", "x"],
    )
    assert sims[0] > 0.85
    assert sims[1] > 0.7   # initial credit
    assert sims[2] < 0.85  # different surname dominates
    assert sims[3] == 0.0

    rows = [
        {"rid": "o1", "name": "john alan smith", "unit": "north"},
        {"rid": "o2", "name": "jon alan smith", "unit": "north"},
        {"rid": "o3", "name": "johnson pierre", "unit": "south"},
    ]
    out = {r["record_id"]: r["canon_id"] for r in dedupe_dataset(
        rd.from_items(rows), officer_settings(), id_col="rid").take_all()}
    assert out["o1"] == out["o2"]
    assert out["o3"] != out["o1"]

    # the categorical `unit` field is ACTIVE: same pair, agreeing vs
    # disagreeing category, must score differently (reference officers.py:
    # 115-117 Categorical(categories=["true","false"]))
    from dedupe_examples_ray.scoring import PairScorer

    scorer = PairScorer(officer_settings().to_json())

    def one(unit_b):
        t = pa.table(
            {
                "id_a": ["p"], "id_b": ["q"],
                "name_a": ["john alan smith"], "name_b": ["jon alan smith"],
                "unit_a": ["north"], "unit_b": [unit_b],
            }
        )
        return float(scorer(t)["score"][0].as_py())

    assert one("north") > one("south")

    # with the us_address plugin: same name, abbreviation-variant address
    # links; same name at a DIFFERENT house number does not
    rows_a = [
        {"rid": "a1", "name": "john smith", "unit": "n",
         "address": "123 N Main St"},
        {"rid": "a2", "name": "john smith", "unit": "n",
         "address": "123 north main street"},
        {"rid": "a3", "name": "john smith", "unit": "n",
         "address": "999 Elm Rd"},
    ]
    out_a = {r["record_id"]: r["canon_id"] for r in dedupe_dataset(
        rd.from_items(rows_a), officer_settings(with_address=True),
        id_col="rid").take_all()}
    assert out_a["a1"] == out_a["a2"]
    assert out_a["a3"] != out_a["a1"]


def test_score_progress_stream(ray_session):
    """M13: per-N-pairs scoring progress (reference prints every 10k pairs,
    mysql_example.py:41-42) — the counter actor ends at the exact pair count."""
    import time

    import ray
    import ray.data as rd

    from dedupe_examples_ray.scoring import make_score_progress, score_pairs

    s = Settings(fields=[Field("name", "exact")], weights={"name": 4.0}, bias=-2.0)
    n = 250
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": [str(i) for i in range(n)],
                "id_b": [str(i + n) for i in range(n)],
                "name_a": ["x"] * n,
                "name_b": ["x"] * n,
            }
        )
    )
    prog = make_score_progress(every=100)
    out = score_pairs(pairs, s, progress=prog).materialize()
    assert out.count() == n
    # adds are fire-and-forget: poll until the in-flight ones drain
    total = 0
    for _ in range(100):
        total = ray.get(prog.total.remote())
        if total == n:
            break
        time.sleep(0.1)
    assert total == n


def test_dedupe_dataset_progress_every(ray_session):
    """progress_every wires through the full pipeline without changing it."""
    import ray.data as rd

    from dedupe_examples_ray.config import inventor_settings
    from dedupe_examples_ray.normalize import latlong_struct, normalize_string_array
    from dedupe_examples_ray.pipelines import dedupe_dataset
    from dedupe_examples_ray.synth import synth_inventors_table

    tbl = synth_inventors_table(60, seed=7)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "person_id": t["person_id"],
                "name": normalize_string_array(t["name"]),
                "latlong": latlong_struct(t["lat"], t["lng"]),
                "class": t["class"],
                "coauthor": t["coauthor"],
            }
        )

    ds = (
        rd.from_arrow(tbl.drop_columns(["true_id"]))
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    base = dedupe_dataset(ds, inventor_settings(), id_col="person_id").to_pandas()
    with_prog = dedupe_dataset(
        ds, inventor_settings(), id_col="person_id", progress_every=10
    ).to_pandas()
    key = lambda df: df.sort_values("record_id").reset_index(drop=True)
    assert key(base).equals(key(with_prog))
