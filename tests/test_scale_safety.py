"""Scale-safety regression tests (round-2 verdict items).

- The dedup family (minhash/ngram/embedding) must never collect the input
  corpus to the driver — asserted by monkeypatching ``Dataset.to_pandas`` to
  raise for the duration of the run (the bounded *edge* pull goes through
  iter_batches and is allowed).
- Hot LSH buckets are salted, not silently truncated, and the metrics helper
  reports emitted/dropped estimates.
- Cross-source (RecordLink) blocks honor the same salting contract.
- ANN handles the legitimate empty-corpus / no-bucket-hit cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(n=40, n_dupes=6):
    import ray.data as rd

    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    for i in range(n):
        rows.append({"doc_id": f"d{i:03d}", "text": f"unique document {i} " + f"filler {i} " * 10})
    for j in range(n_dupes):  # near-dup cluster of the same base text
        rows.append({"doc_id": f"x{j:03d}", "text": base + f" tail{j}"})
    return rd.from_items(rows)


def test_dedup_family_never_collects_corpus(ray_session, monkeypatch):
    import ray.data

    from dedupe_examples_ray.ops import (
        embedding_cosine_dedup,
        minhash_lsh_dedup,
        ngram_jaccard_dedup,
    )

    docs = _docs().materialize()
    vec_rows = [
        {"vec_id": f"v{i}", "embedding": [float(i % 4), 1.0, 0.25, float(i % 3)]}
        for i in range(24)
    ]
    vecs = ray.data.from_items(vec_rows).materialize()

    def boom(self, *a, **kw):  # pragma: no cover - should never run
        raise AssertionError("Dataset.to_pandas called inside a dedup path")

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)

    out = minhash_lsh_dedup(docs).take_all()
    assert len(out) == docs.count()
    dupes = {r["doc_id"]: r["keep_id"] for r in out if r["doc_id"].startswith("x")}
    assert len(set(dupes.values())) == 1  # the near-dup cluster collapsed

    out = ngram_jaccard_dedup(docs).take_all()
    assert len(out) == docs.count()

    out = embedding_cosine_dedup(vecs).take_all()
    assert len(out) == vecs.count()
    # identical embeddings (i and i+12 share i%4, i%3 ... only exact matches)
    km = {r["vec_id"]: r["keep_id"] for r in out}
    assert km["v0"] == km["v12"]  # same (0,1,.25,0) vector


def test_lsh_hot_bucket_salted_not_truncated(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops.dedup import _bucket_pairs, lsh_bucket_metrics

    # one hot LSH bucket with 120 members, cap 30
    rows = [{"doc_id": f"m{i:03d}", "band": 0, "key": 7} for i in range(120)]
    bucket_ds = rd.from_items(rows)
    pairs = _bucket_pairs(bucket_ds, "doc_id", max_bucket=30).take_all()
    full = 120 * 119 // 2
    assert 0 < len(pairs) < full  # salted, not full, not empty
    # truncation-to-first-k would emit exactly C(30,2) pairs over the first 30
    # lexicographic ids; salting spreads membership across all ids
    touched = {p["id_a"] for p in pairs} | {p["id_b"] for p in pairs}
    assert len(touched) > 60
    m = lsh_bucket_metrics(bucket_ds, "doc_id", max_bucket=30)
    assert m["buckets_over_cap"] == 1
    assert m["pairs_full"] == full
    assert m["pairs_dropped_est"] > 0
    # even-split estimate should be within 2x of the actual salted emission
    assert 0.5 <= m["pairs_emitted_est"] / max(len(pairs), 1) <= 2.0


def test_cross_source_blocks_are_salted(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.pairs import candidate_pairs, pair_metrics

    rows = [
        {"block_key": "hot", "rid": f"r{i:04d}", "source": i % 2}
        for i in range(400)
    ]
    blocks = rd.from_items(rows)
    pairs = candidate_pairs(
        blocks, "rid", [], max_block_size=50, policy="salt", source_col="source"
    ).take_all()
    full = 200 * 200
    assert 0 < len(pairs) < full // 2  # quadratic blowup bounded
    m = pair_metrics(blocks, "rid", max_block_size=50, source_col="source")
    assert m["blocks_over_cap"] == 1
    assert m["pairs_full"] == full
    assert m["pairs_dropped_est"] > 0
    assert 0.5 <= m["pairs_emitted_est"] / len(pairs) <= 2.0
    # keep policy still emits the full product
    keep = candidate_pairs(
        blocks, "rid", [], max_block_size=50, policy="keep", source_col="source"
    )
    assert keep.count() == full


def test_ann_empty_corpus_and_no_bucket_hits(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.ops import ann_brute_force, ann_lsh

    vecs = rd.from_items(
        [{"vec_id": f"v{i}", "embedding": [1.0, 0.0, 0.0, 0.0]} for i in range(5)]
    )
    empty = vecs.filter(lambda r: False)
    out = ann_brute_force(empty, [("q0", [1.0, 0.0, 0.0, 0.0])], k=3)
    assert list(out.columns) == ["query_id", "match_id", "score"]
    assert len(out) == 0
    # query pointing away from every corpus signature bucket
    out = ann_lsh(vecs, [("q0", [-1.0, -1.0, -1.0, -1.0])], k=3, n_planes=8)
    assert list(out.columns) == ["query_id", "match_id", "score"]


def test_checkpoint_keyed_on_input_identity(ray_session, tmp_path):
    import ray.data as rd

    from dedupe_examples_ray.pipelines import dedupe_documents

    wd = str(tmp_path / "wd")
    a = rd.from_items(
        [{"doc_id": f"a{i}", "text": f"alpha doc {i} " + "pad " * 5} for i in range(20)]
    )
    out_a = dedupe_documents(a, workdir=wd).take_all()
    assert {r["record_id"] for r in out_a} == {f"a{i}" for i in range(20)}
    # same settings + same workdir, DIFFERENT corpus -> must not replay stale
    b = rd.from_items(
        [{"doc_id": f"b{i}", "text": f"beta doc {i} " + "pad " * 5} for i in range(30)]
    )
    out_b = dedupe_documents(b, workdir=wd).take_all()
    assert {r["record_id"] for r in out_b} == {f"b{i}" for i in range(30)}


def test_hydration_paths_agree(ray_session):
    """bucketed_hydrate (cogroup scale path) and semi_hydrate (bounded fast
    path) produce identical hydrated pairs, including missing-id nulls."""
    import ray.data as rd

    from dedupe_examples_ray.scoring import bucketed_hydrate, semi_hydrate

    recs = rd.from_items(
        [{"id": f"r{i:03d}", "text": f"text {i}", "n": i} for i in range(100)]
    )
    prs = [
        {"id_a": f"r{i:03d}", "id_b": f"r{(i * 7 + 3) % 100:03d}"} for i in range(25)
    ] + [{"id_a": "r001", "id_b": "zzz"}]
    pairs = rd.from_items(prs)

    def canon(ds):
        df = ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        return df.reindex(sorted(df.columns), axis=1).astype(str)

    a = canon(bucketed_hydrate(pairs, recs, "id", ["text", "n"]))
    b = canon(semi_hydrate(pairs, recs, "id", ["text", "n"]))
    assert a.equals(b), (a.compare(b) if a.shape == b.shape else (a.shape, b.shape))


def test_sharded_hydration_matches_broadcast(ray_session, tmp_path):
    """The storage-partition-aligned scorer path (bucket-partitioned record
    store, zero record shuffles) produces the same entity map as broadcast."""
    import ray.data as rd

    from dedupe_examples_ray.config import default_page_settings
    from dedupe_examples_ray.normalize import derive_page_fields
    from dedupe_examples_ray.pipelines.dedupe import dedupe_dataset
    from dedupe_examples_ray.synth import synth_pages_dataset

    pages = synth_pages_dataset(120, seed=7).drop_columns(["true_id"]).materialize()
    slim = pages.select_columns(["url", "text"])
    derived = slim.map_batches(derive_page_fields, batch_format="pyarrow")
    s = default_page_settings()

    def run(h):
        out = dedupe_dataset(derived, s, id_col="url", hydration=h)
        return out.to_pandas().sort_values("record_id").reset_index(drop=True)

    a = run("broadcast")
    b = run("sharded")
    assert a["canon_id"].equals(b["canon_id"])
    assert (abs(a["cluster_score"].fillna(-1) - b["cluster_score"].fillna(-1)) < 1e-9).all()


def test_driver_cc_byte_budget_falls_back_to_distributed(ray_session):
    """The driver-CC fast path is budgeted in bytes as well as edges; forcing
    a zero byte budget must route through contract_edges + distributed CC and
    produce the identical entity map."""
    from dedupe_examples_ray.config import default_page_settings
    from dedupe_examples_ray.pipelines.dedupe import dedupe_dataset, derive_page_fields
    from dedupe_examples_ray.synth import synth_pages_dataset

    pages = synth_pages_dataset(60, seed=3).select_columns(["url", "text"])
    derived = pages.map_batches(derive_page_fields, batch_format="pyarrow").materialize()
    s = default_page_settings()

    def em(**kw):
        return (
            dedupe_dataset(derived, s, id_col="url", **kw)
            .to_pandas()
            .sort_values("record_id")
            .reset_index(drop=True)
        )

    fast = em()
    slow = em(driver_cc_bytes=0)
    pd.testing.assert_frame_equal(
        fast[["record_id", "canon_id"]], slow[["record_id", "canon_id"]]
    )


def test_simhash_hot_bucket_salted_not_quadratic(ray_session):
    """Round-2 verdict #3: a 10x-over-cap hot simhash band key (identical
    boilerplate docs) must be salted into sub-buckets — bounded emitted
    pairs, nonzero pairs_dropped_est — instead of one O(n^2) task."""
    import ray.data as rd

    from dedupe_examples_ray.ops.dedup import simhash_bucket_metrics, simhash_dedup

    n, cap = 200, 20  # 10x over cap
    rows = [{"doc_id": f"h{i:03d}", "text": "boilerplate footer text repeated"} for i in range(n)]
    rows += [{"doc_id": f"u{i:03d}", "text": f"unique doc {i} " + f"w{i} " * 8} for i in range(30)]
    ds = rd.from_items(rows).materialize()

    m = simhash_bucket_metrics(ds, max_bucket=cap)
    assert m["buckets_over_cap"] >= 1
    assert m["pairs_dropped_est"] > 0
    assert m["pairs_emitted_est"] < m["pairs_full"]

    out = simhash_dedup(ds, max_bucket=cap).take_all()
    assert len(out) == ds.count()
    hot = {r["doc_id"]: r["keep_id"] for r in out if r["doc_id"].startswith("h")}
    # salting splits the hot cluster into at most ceil(n/cap) components,
    # never one component per doc (that would mean no pairs at all)
    k = -(-n // cap)
    assert 1 <= len(set(hot.values())) <= k


def test_embedding_hot_bucket_salted_not_quadratic(ray_session):
    """Same contract for the hyperplane-bucket cosine verify."""
    import ray.data as rd

    from dedupe_examples_ray.ops.dedup import (
        embedding_bucket_metrics,
        embedding_cosine_dedup,
    )

    n, cap = 150, 15
    rows = [{"vec_id": f"h{i:03d}", "embedding": [1.0, 0.5, 0.25, 0.125]} for i in range(n)]
    rows += [
        {"vec_id": f"u{i:03d}", "embedding": [float(i), 1.0, float(-i), 0.5]} for i in range(20)
    ]
    ds = rd.from_items(rows).materialize()

    m = embedding_bucket_metrics(ds, max_bucket=cap)
    assert m["buckets_over_cap"] >= 1
    assert m["pairs_dropped_est"] > 0

    out = embedding_cosine_dedup(ds, tau=0.98, max_bucket=cap).take_all()
    assert len(out) == ds.count()
    hot = {r["vec_id"]: r["keep_id"] for r in out if r["vec_id"].startswith("h")}
    k = -(-n // cap)
    assert 1 <= len(set(hot.values())) <= k


def test_assignment_broadcast_vs_join_parity(ray_session):
    """Round-2 verdict #4: over the row budget, _assignment must route
    through the distributed hash_join and produce assignments identical to
    the broadcast path."""
    import ray.data as rd

    from dedupe_examples_ray.ops.dedup import _assignment

    ids = rd.from_items([{"doc_id": f"d{i:03d}"} for i in range(60)]).materialize()
    edges = rd.from_items(
        [{"id_a": f"d{i:03d}", "id_b": f"d{i + 1:03d}"} for i in range(0, 40, 2)]
    ).materialize()

    bcast = (
        _assignment(ids, "doc_id", edges, broadcast_row_budget=10**9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    joined = (
        _assignment(ids, "doc_id", edges, broadcast_row_budget=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bcast, joined)
    # sanity: pairs collapsed, singletons self-map
    m = dict(zip(bcast["doc_id"], bcast["keep_id"]))
    assert m["d001"] == "d000" and m["d059"] == "d059"


def test_annotate_broadcast_vs_join_parity(ray_session):
    """Same contract for write_annotated_output: the entity map is one row
    per record, so over budget it must hash_join, identically."""
    import ray.data as rd

    from dedupe_examples_ray.sources.io import write_annotated_output

    recs = rd.from_items(
        [{"rid": f"r{i:02d}", "name": f"n{i}", "city": f"c{i % 3}"} for i in range(30)]
    ).materialize()
    ent = rd.from_items(
        [
            {"record_id": f"r{i:02d}", "canon_id": f"r{i - i % 2:02d}", "cluster_score": 0.9}
            for i in range(24)  # last 6 records unclustered -> null annotation
        ]
    ).materialize()

    bcast = (
        write_annotated_output(recs, ent, "rid", broadcast_row_budget=10**9)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    joined = (
        write_annotated_output(recs, ent, "rid", broadcast_row_budget=1)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bcast, joined)
    assert list(bcast.columns) == ["rid", "name", "city", "cluster_id", "confidence_score"]
    assert bcast["cluster_id"].isna().sum() == 6


def test_buckets_for_scales_with_input():
    """Round-2 verdict #6: shuffle bucket counts derive from input size
    instead of a fixed 64."""
    from dedupe_examples_ray.scale import DEFAULT_BUCKETS, MAX_BUCKETS, buckets_for

    assert buckets_for(None) == DEFAULT_BUCKETS
    assert buckets_for(1_000) == DEFAULT_BUCKETS  # floor
    assert buckets_for(64_000_000) == 64
    assert buckets_for(640_000_000) == 640
    assert buckets_for(n_bytes=512 << 30) == 2048  # 512 GiB / 256 MiB
    assert buckets_for(10**15) == MAX_BUCKETS  # capped
    assert buckets_for(200_000_000, n_bytes=1 << 40) == 4096  # max of both


def test_resolve_buckets_uses_dataset_metadata(ray_session):
    import ray.data as rd

    from dedupe_examples_ray.scale import estimate_rows, resolve_buckets

    ds = rd.range(10_000).materialize()
    assert estimate_rows(ds) == 10_000
    assert resolve_buckets(None, ds) == 64  # under floor
    assert resolve_buckets(512, ds) == 512  # explicit override wins
    assert resolve_buckets(None, n_rows=300_000_000) == 300
    # mid-pipeline datasets must NOT be executed for the estimate
    lazy = ds.map_batches(lambda t: t, batch_format="pyarrow")
    assert resolve_buckets(None, lazy) == 64


def _er_docs(n=40):
    import ray.data as rd

    rows = []
    for i in range(n):
        rows.append({"doc_id": f"doc{i:03d}", "text": f"unique text {i} " + f"tok{i} " * 20})
    base = "shared corpus body text repeated often " + " ".join(f"w{k}" for k in range(30))
    for j in range(6):  # near-dup cluster (long shared body -> links)
        rows.append({"doc_id": f"zz{j:02d}", "text": base + f" tail{j}"})
    return rd.from_items(rows)


def test_surrogate_ids_entity_map_parity(ray_session):
    """Round-2 verdict #5: int64 surrogate ids through pair/edge/CC shuffles
    must produce the IDENTICAL entity map as the raw-string-id path — on the
    driver CC fast path AND the distributed star-rounds path."""
    from dedupe_examples_ray.pipelines.dedupe import dedupe_documents, document_settings
    from dedupe_examples_ray.pipelines import dedupe_dataset
    from dedupe_examples_ray.pipelines.dedupe import derive_document_fields

    docs = _er_docs().materialize()

    def run(**kw):
        derived = docs.map_batches(derive_document_fields, batch_format="pyarrow")
        out = dedupe_dataset(derived, document_settings(), id_col="doc_id", **kw)
        return (
            out.to_pandas()
            .sort_values("record_id")
            .reset_index(drop=True)[["record_id", "canon_id", "cluster_score"]]
        )

    raw = run(surrogate_ids=False)
    sur = run(surrogate_ids=True)
    pd.testing.assert_frame_equal(raw, sur)
    assert (sur[sur["record_id"].str.startswith("zz")]["canon_id"] == "zz00").all()

    raw_d = run(surrogate_ids=False, driver_cc_limit=0, driver_cc_bytes=0)
    sur_d = run(surrogate_ids=True, driver_cc_limit=0, driver_cc_bytes=0)
    pd.testing.assert_frame_equal(raw_d[["record_id", "canon_id"]], sur_d[["record_id", "canon_id"]])
    pd.testing.assert_frame_equal(raw[["record_id", "canon_id"]], sur_d[["record_id", "canon_id"]])

    # the non-broadcast hydration tiers hydrate by the int64 uid too
    for hyd in ("cogroup", "sharded"):
        sur_h = run(surrogate_ids=True, hydration=hyd)
        pd.testing.assert_frame_equal(raw, sur_h)


def test_build_entity_map_uid_join_tier_parity(ray_session):
    """The over-broadcast-budget tier (three hash_joins) must emit the same
    entity map as the broadcast tier."""
    import ray.data as rd

    from dedupe_examples_ray.cluster import build_entity_map_uid, uid_array

    ids = [f"r{i:03d}" for i in range(30)]
    recs = rd.from_items([{"rid": r} for r in ids]).materialize()
    # clusters: (r000 r001 r002), (r010 r011); others singleton
    uid = {r: int(uid_array(np.array([r], dtype=object))[0]) for r in ids}
    lab_rows = []
    for grp in (["r000", "r001", "r002"], ["r010", "r011"]):
        root = min(uid[g] for g in grp)
        for g in grp:
            lab_rows.append({"node": uid[g], "label": root, "score": 0.9})
    labels = rd.from_items(lab_rows).materialize()

    a = (
        build_entity_map_uid(recs, "rid", labels, broadcast_limit=10**9)
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    b = (
        build_entity_map_uid(recs, "rid", labels, broadcast_limit=1)
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    m = dict(zip(a["record_id"], a["canon_id"]))
    assert m["r002"] == "r000" and m["r011"] == "r010" and m["r020"] == "r020"


def test_surrogate_collision_check_falls_back(ray_session, caplog, monkeypatch):
    """A uid distinct-count short of n_records (hash collision) must make the
    pipeline warn and fall back to raw string ids — simulated by patching the
    collision-check counter."""
    import logging

    import ray.data as rd

    import dedupe_examples_ray.pipelines.dedupe as dd
    from dedupe_examples_ray.pipelines import dedupe_dataset
    from dedupe_examples_ray.pipelines.dedupe import derive_document_fields, document_settings

    real_count = dd.count_distinct_uids
    monkeypatch.setattr(
        dd, "count_distinct_uids",
        lambda records_work, n_records: real_count(records_work, n_records) - 1,
    )

    docs = _er_docs(15).materialize()
    derived = docs.map_batches(derive_document_fields, batch_format="pyarrow")
    with caplog.at_level(logging.WARNING, logger="dedupe_examples_ray"):
        out = dedupe_dataset(
            derived, document_settings(), id_col="doc_id", surrogate_ids=True
        ).to_pandas()
    assert len(out) == docs.count()
    assert any("falling back to raw ids" in r.message for r in caplog.records)
    # fallback path produced the normal raw-id result
    zz = out[out["record_id"].str.startswith("zz")]
    assert (zz["canon_id"] == "zz00").all()


def test_surrogate_auto_threshold(ray_session):
    """auto mode stays on raw string ids under SURROGATE_AUTO_MIN records."""
    import ray.data as rd

    from dedupe_examples_ray.pipelines import dedupe_dataset
    from dedupe_examples_ray.pipelines.dedupe import (
        derive_document_fields,
        document_settings,
    )

    docs = _er_docs(10).materialize()
    derived = docs.map_batches(derive_document_fields, batch_format="pyarrow")
    # auto under threshold: identical to surrogate_ids=False (and no __uid
    # anywhere in the output schema)
    auto = dedupe_dataset(derived, document_settings(), id_col="doc_id").to_pandas()
    raw = dedupe_dataset(
        derived, document_settings(), id_col="doc_id", surrogate_ids=False
    ).to_pandas()
    key = lambda d: d.sort_values("record_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(auto), key(raw))


def test_duplicate_record_ids_raise_clearly(ray_session):
    """Malformed input (duplicate record ids) gets a clear ValueError at the
    surrogate uniqueness check, not an obscure non-unique-index crash deep in
    the scorer."""
    import ray.data as rd

    from dedupe_examples_ray.pipelines import dedupe_dataset
    from dedupe_examples_ray.pipelines.dedupe import derive_document_fields, document_settings

    rows = [{"doc_id": f"d{i:02d}", "text": f"text {i} " + f"w{i} " * 15} for i in range(10)]
    rows.append(dict(rows[0]))  # duplicate id
    docs = rd.from_items(rows).materialize()
    derived = docs.map_batches(derive_document_fields, batch_format="pyarrow")
    with pytest.raises(ValueError, match="must be unique"):
        dedupe_dataset(derived, document_settings(), id_col="doc_id", surrogate_ids=True)


def test_count_distinct_uids_tiers_agree(ray_session, monkeypatch):
    """The driver np.unique path and the distributed distinct path return the
    same uid count."""
    import pyarrow as pa
    import ray.data as rd

    import dedupe_examples_ray.pipelines.dedupe as dd
    from dedupe_examples_ray.cluster import add_uid_column

    t = pa.table({"doc_id": [f"d{i}" for i in range(500)] + ["d7", "d8"]})
    ds = rd.from_arrow(t).map_batches(
        add_uid_column, fn_kwargs=dict(id_col="doc_id"), batch_format="pyarrow"
    ).materialize()
    driver = dd.count_distinct_uids(ds, 502)
    monkeypatch.setattr(dd, "UID_CHECK_DRIVER_LIMIT", 0)
    distributed = dd.count_distinct_uids(ds, 502)
    assert driver == distributed == 500


def test_member_ids_pull_parity(ray_session):
    """The concurrent member-id pull (overlapped with driver CC) must yield
    the identical entity map as build_entity_map_uid's own synchronous
    clustered pull."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.cluster import (
        build_entity_map_uid,
        driver_cluster_table,
        start_member_ids_pull,
        uid_array,
    )

    ids = [f"u{i:03d}" for i in range(40)]
    recs = rd.from_items([{"rid": r} for r in ids]).materialize()
    uid = {r: int(uid_array(np.array([r], dtype=object))[0]) for r in ids}
    # edges: chain u000-u001-u002, pair u010-u011
    edges_tbl = pa.table({
        "id_a": pa.array([uid["u000"], uid["u001"], uid["u010"]], pa.int64()),
        "id_b": pa.array([uid["u001"], uid["u002"], uid["u011"]], pa.int64()),
        "score": pa.array([0.9, 0.8, 0.95], pa.float64()),
    })
    handle = start_member_ids_pull(recs, "rid", edges_tbl)
    label_tbl = driver_cluster_table(edges_tbl)
    member_tbl = handle.join()
    assert member_tbl is not None and member_tbl.num_rows == 5

    a = (build_entity_map_uid(recs, "rid", label_tbl, member_ids_tbl=member_tbl)
         .to_pandas().sort_values("record_id").reset_index(drop=True))
    b = (build_entity_map_uid(recs, "rid", label_tbl)
         .to_pandas().sort_values("record_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    m = dict(zip(a["record_id"], a["canon_id"]))
    assert m["u002"] == "u000" and m["u011"] == "u010" and m["u020"] == "u020"


def test_auto_hydration_byte_budget(ray_session, monkeypatch):
    """_auto_hydration: row floor broadcasts outright; the hard row cap
    shards; in between the measured projection bytes decide."""
    import ray.data as rd

    import dedupe_examples_ray.pipelines.dedupe as dd

    docs = rd.from_items(
        [{"rid": f"r{i:03d}", "text": "x" * 1000} for i in range(50)]
    ).materialize()

    assert dd._auto_hydration(docs, ["rid", "text"], 10, row_floor=100) == "broadcast"
    assert dd._auto_hydration(
        docs, ["rid", "text"], dd.BROADCAST_ROWS_HARD_CAP + 1, row_floor=100
    ) == "sharded"
    # between floor and cap: byte budget decides (per-row ~1 KB here)
    n_mid = 200
    assert dd._auto_hydration(docs, ["rid", "text"], n_mid, row_floor=100) == "broadcast"
    monkeypatch.setattr(dd, "BROADCAST_BYTES_LIMIT", 1024)  # < n_mid * 1KB
    assert dd._auto_hydration(docs, ["rid", "text"], n_mid, row_floor=100) == "sharded"
