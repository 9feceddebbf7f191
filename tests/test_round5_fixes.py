"""Regression tests for the round-5 ADVICE fixes.

1. minhash_lsh_dedup with STRING ids + workdir (surrogate-uid recursion hit
   the workdir checkpoint block which ignored _pairs_only and returned an
   assignment table into connected_components).
2. dedupe_pages(use_idf=True) after the derive-output column pruning (the idf
   tokenizer reads 'body', which the prune dropped).
3. token_cosine signature-width mismatch must raise, not silently score 0.
4. Partition-key equality pruning must render predicate values with the
   writer's Arrow string cast (bool True -> 'true', not str(True) = 'True').
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest


def test_minhash_string_ids_with_workdir(ray_session, tmp_path):
    import ray.data as rd

    from dedupe_examples_ray.ops import minhash_lsh_dedup

    docs = [
        {"url": f"https://example.com/page/{i}", "text": f"shared words {i % 6} " * 10}
        for i in range(48)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    wd = str(tmp_path / "mh_str")
    out = minhash_lsh_dedup(
        ds, text_col="text", id_col="url", workdir=wd, input_token="t1"
    ).to_pandas()
    assert set(out.columns) == {"url", "keep_id"}
    assert len(out) == 48
    # 6 near-dup groups -> 6 keepers
    assert out["keep_id"].nunique() == 6
    # keeper is the MIN member id (parity with the raw-id path)
    assert (out.groupby("keep_id")["url"].min() == out.groupby("keep_id")["keep_id"].first()).all()
    assert os.path.exists(os.path.join(wd, "mh_pairs", "manifest.json"))
    m1 = os.path.getmtime(os.path.join(wd, "mh_pairs", "manifest.json"))
    # resume replays the checkpoint and yields the identical assignment
    again = minhash_lsh_dedup(
        ds, text_col="text", id_col="url", workdir=wd, input_token="t1"
    ).to_pandas()
    assert os.path.getmtime(os.path.join(wd, "mh_pairs", "manifest.json")) == m1
    assert out.sort_values("url").reset_index(drop=True).equals(
        again.sort_values("url").reset_index(drop=True)
    )


def test_dedupe_pages_use_idf(ray_session):
    from dedupe_examples_ray.evaluate import evaluate_entity_map
    from dedupe_examples_ray.pipelines import dedupe_pages
    from dedupe_examples_ray.synth import synth_pages_dataset

    full = synth_pages_dataset(120, seed=11)
    pages = full.drop_columns(["true_id"]).materialize()
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    entity = dedupe_pages(pages, use_idf=True, scorer_concurrency=2).to_pandas()
    assert len(entity) == len(gold)
    scores = evaluate_entity_map(entity, gold)
    assert scores["f1"] >= 0.99, scores


def test_token_cosine_width_mismatch_raises(ray_session):
    from dedupe_examples_ray.config import Field, Settings
    from dedupe_examples_ray.scoring import PairScorer

    s = Settings(
        fields=[Field("sig", comparator="token_cosine")],
        weights={"sig": 1.0},
    )
    scorer = PairScorer(s.to_json())
    batch = pa.table(
        {
            "id_a": pa.array([1, 2], pa.int64()),
            "id_b": pa.array([3, 4], pa.int64()),
            "sig_a": pa.array([[1, 2, 3], [4, 5]], pa.list_(pa.uint32())),
            "sig_b": pa.array([[1, 2], [4, 5, 6]], pa.list_(pa.uint64())),
        }
    )
    with pytest.raises(ValueError, match="signature width mismatch"):
        scorer.features(batch)
    # matched widths still score fine
    ok = batch.drop_columns(["sig_b"]).append_column(
        "sig_b", pa.array([[1, 2], [4, 5, 6]], pa.list_(pa.uint32()))
    )
    feats = scorer.features(ok)
    assert feats.shape == (2, 1)
    assert np.all(feats >= 0)


def test_partition_pruning_nonstring_keys(ray_session, tmp_path):
    import ray.data as rd

    from dedupe_examples_ray.sources import read_partitioned, write_partitioned

    # bool key: str(True) = 'True' but Arrow casts to 'true' — the reader
    # must hash the writer's rendering
    rows = [{"k": i % 2 == 0, "v": i} for i in range(200)]
    path = str(tmp_path / "pb")
    write_partitioned(rd.from_arrow(pa.Table.from_pylist(rows)), path,
                      key_col="k", num_buckets=4)
    got = read_partitioned(path, predicate=[("k", "==", True)]).to_pandas()
    assert sorted(got["v"]) == [i for i in range(200) if i % 2 == 0]

    # float key round-trips through the same cast
    rows_f = [{"k": float(i % 3) + 0.5, "v": i} for i in range(90)]
    path_f = str(tmp_path / "pf")
    write_partitioned(rd.from_arrow(pa.Table.from_pylist(rows_f)), path_f,
                      key_col="k", num_buckets=4)
    got_f = read_partitioned(path_f, predicate=[("k", "==", 1.5)]).to_pandas()
    assert sorted(got_f["v"]) == [i for i in range(90) if i % 3 == 1]


def test_streaming_edge_cc_parity():
    """StreamingEdgeCC over chunked pushes == driver_cluster_table over the
    full edge table: identical (node, label), per-node confidence equal up
    to float summation order."""
    import pandas as pd

    from dedupe_examples_ray.cluster import StreamingEdgeCC, driver_cluster_table

    rng = np.random.default_rng(17)
    n_nodes = 4000
    m = 12000
    a = rng.integers(0, n_nodes, m) * 7 + 3  # sparse non-contiguous ids
    b = rng.integers(0, n_nodes, m) * 7 + 3
    keep = a != b
    a, b = a[keep], b[keep]
    s = rng.uniform(0.5, 1.0, len(a))
    tbl = pa.table({"id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(b, pa.int64()),
                    "score": pa.array(s, pa.float64())})
    want = driver_cluster_table(tbl).to_pandas().sort_values("node").reset_index(drop=True)

    uf = StreamingEdgeCC()
    for lo in range(0, len(a), 257):  # ragged chunks
        uf.push(a[lo:lo + 257], b[lo:lo + 257], s[lo:lo + 257])
    got = uf.finish().to_pandas().sort_values("node").reset_index(drop=True)

    pd.testing.assert_series_equal(got["node"], want["node"])
    pd.testing.assert_series_equal(got["label"], want["label"])
    assert np.allclose(got["score"], want["score"], atol=1e-9)

    # empty stream
    assert StreamingEdgeCC().finish().num_rows == 0


def test_stream_edges_spill_path(ray_session, tmp_path):
    """A stream that exceeds the driver budget spills to parquet and comes
    back as a Dataset with the identical edge multiset."""
    import ray.data as rd

    from dedupe_examples_ray.cluster import stream_edges_to_driver

    t = pa.table({"id_a": pa.array(range(1000), pa.int64()),
                  "id_b": pa.array(range(1, 1001), pa.int64()),
                  "score": pa.array([0.9] * 1000, pa.float64())})
    ds = rd.from_arrow(t).repartition(8)
    mode, payload = stream_edges_to_driver(ds, driver_limit=100, driver_bytes=1 << 30)
    assert mode == "spill"
    back = payload.to_pandas().sort_values("id_a").reset_index(drop=True)
    assert len(back) == 1000
    assert (back["id_a"] == np.arange(1000)).all()

    # within budget, int ids -> uf mode with full label coverage
    mode2, lab = stream_edges_to_driver(ds, driver_limit=10**6, driver_bytes=1 << 30)
    assert mode2 == "uf"
    assert lab.num_rows == 1001  # chain 0-1000: every node labeled
    assert (lab["label"].to_numpy() == 0).all()


def test_minhash_wave_verify_string_ids(ray_session, monkeypatch):
    """Raw STRING ids through the >1-wave verify (is_in corpus semi-filter
    branch) must match the single-pass result."""
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = [
        {"doc_id": f"doc-{i:04d}", "text": f"group {i % 8} words filler tail " * 6}
        for i in range(300)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    base = (dd.minhash_lsh_dedup(ds, _use_uids=False).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(dd, "_SEMI_HYDRATE_MAX", 0)
    monkeypatch.setattr(dd, "_VERIFY_WAVE_BYTES", 1 << 12)
    waved = (dd.minhash_lsh_dedup(ds, _use_uids=False).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert base.equals(waved)


def test_minhash_wave_semifilter_parity(ray_session, monkeypatch):
    """The large-corpus wave branch (per-wave corpus semi-filter) must match
    the unfiltered wave result; covered by forcing the gate to 0 bytes."""
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = [
        {"doc_id": i, "text": f"shared words group {i % 9} plus filler tail " * 5}
        for i in range(400)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    base = (dd.minhash_lsh_dedup(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(dd, "_SEMI_HYDRATE_MAX", 0)
    monkeypatch.setattr(dd, "_VERIFY_WAVE_BYTES", 1 << 12)
    monkeypatch.setattr(dd, "_VERIFY_FILTER_MIN_BYTES", 0)  # force the filter
    filtered = (dd.minhash_lsh_dedup(ds).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
    assert base.equals(filtered)


def test_sig_verify_width_and_text_hash_parity(ray_session):
    """u32 verify signatures give the same assignment as u64 on the test
    corpus (collision inflation is ~|sig|^2/2^32 per pair), and byte-equal
    texts keep the exact-match shortcut while null texts never match."""
    import pyarrow as pa
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = [{"doc_id": i, "text": f"group {i % 7} some words here " * 6}
            for i in range(200)]
    docs[10]["text"] = None
    docs[11]["text"] = None
    docs[12]["text"] = ""
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    a = dd.minhash_lsh_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)

    orig = dd._shingle_sig_batch
    try:
        dd._shingle_sig_batch = lambda t, **kw: orig(t, **{**kw, "bits": 64})
        b = dd.minhash_lsh_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    finally:
        dd._shingle_sig_batch = orig
    assert a.equals(b)

    # direct kernel checks: equal non-null text hash -> 1.0; null pair -> 0
    tbl = pa.table({
        "id_a": pa.array([1, 2], pa.int64()),
        "id_b": pa.array([3, 4], pa.int64()),
        "vsig_a": pa.array([[], []], pa.list_(pa.uint32())),
        "vsig_b": pa.array([[], []], pa.list_(pa.uint32())),
        "thash_a": pa.array([7, None], pa.int64()),
        "thash_b": pa.array([7, None], pa.int64()),
    })
    out = dd._jaccard_verify_sig(tbl, threshold=0.5).to_pandas()
    assert out["id_a"].tolist() == [1]  # null texts never short-circuit


def test_minhash_pre_exact_parity(ray_session):
    """The exact-dedup pre-pass (LSH over representatives + expansion) must
    produce the identical assignment to the direct run — including '' texts
    (group together) and null texts (never group)."""
    import ray.data as rd

    import dedupe_examples_ray.ops.dedup as dd

    docs = []
    for i in range(120):
        g = i % 8
        if i % 10 == 0:
            text = f"shared words group {g} filler tail " * 5       # exact dup
        elif i % 10 == 1:
            text = f"shared words group {g} filler tail extra " * 5  # near dup
        else:
            text = f"shared words group {g} filler tail " * 5
        docs.append({"doc_id": i, "text": text})
    docs[5]["text"] = ""
    docs[17]["text"] = ""
    docs[29]["text"] = None
    docs[41]["text"] = None
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    direct = (dd.minhash_lsh_dedup(ds, pre_exact=False).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    pre = (dd.minhash_lsh_dedup(ds, pre_exact=True).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert direct.equals(pre)
    # '' texts merged, nulls singletons
    m = dict(zip(pre["doc_id"], pre["keep_id"]))
    assert m[5] == m[17] == 5
    assert m[29] == 29 and m[41] == 41

    # string ids through the pre-pass (uid machinery downstream)
    sdocs = [{"doc_id": f"u{i:03d}", "text": d["text"]} for i, d in enumerate(docs)]
    sds = rd.from_arrow(pa.Table.from_pylist(sdocs))
    sd = (dd.minhash_lsh_dedup(sds, pre_exact=False).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    sp = (dd.minhash_lsh_dedup(sds, pre_exact=True).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert sd.equals(sp)


def test_safe_coalesce_chunk_misalignment(ray_session):
    """pyarrow pc.coalesce silently mis-aligns differently-chunked inputs
    (take-result vs multi-chunk table column -> wrong VALUES); safe_coalesce
    flattens both.  Repro: the minhash assignment over a hash_join 'semi'
    view assigned keep_id 0 to an unmatched doc."""
    import pyarrow.compute as pc
    import ray.data as rd

    from dedupe_examples_ray.scale import safe_coalesce

    taken = pc.take(pa.array([1, 1], pa.int64()),
                    pa.chunked_array([[0], [None], [1]], pa.int64()))
    doc = pa.chunked_array([[1], [6], [3]], pa.int64())
    assert safe_coalesce(taken, doc).to_pylist() == [1, 6, 1]

    # end-to-end: assignment over a multi-chunk semi-join view
    import dedupe_examples_ray.ops.dedup as dd
    from dedupe_examples_ray.relational import hash_join

    rows = [{"doc_id": i, "text": f"t{i}"} for i in (1, 3, 4, 6)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    reps = rd.from_arrow(pa.table({"doc_id": pa.array([1, 3, 4, 6], pa.int64())}))
    rc = hash_join(ds.select_columns(["doc_id", "text"]), reps, on="doc_id", how="semi")
    edges = rd.from_arrow(pa.table({"id_a": pa.array([1], pa.int64()),
                                    "id_b": pa.array([3], pa.int64()),
                                    "score": pa.array([0.6])}))
    out = dd._assignment(rc, "doc_id", edges).to_pandas()
    got = dict(zip(out["doc_id"], out["keep_id"]))
    assert got == {1: 1, 3: 1, 4: 4, 6: 6}, got
