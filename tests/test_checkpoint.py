"""Checkpoint / resume tests (north_rule: per-partition lineage + metrics,
resume mid-run -> identical output)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from dedupe_examples_ray.checkpoint import read_manifest, run_stage, stage_complete
from dedupe_examples_ray.pipelines import dedupe_pages
from dedupe_examples_ray.synth import synth_pages_dataset


def test_run_stage_commits_and_replays(ray_session, tmp_path):
    import ray.data as rd

    wd = str(tmp_path)
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return rd.range(10)

    ds1 = run_stage("s1", make, wd, "fp1")
    assert ds1.count() == 10 and calls["n"] == 1
    ds2 = run_stage("s1", make, wd, "fp1")
    assert ds2.count() == 10 and calls["n"] == 1  # replayed, not recomputed
    m = read_manifest(wd, "s1")
    assert m["completed"] and m["rows"] == 10 and m["fingerprint"] == "fp1"
    assert m["partitions"] and all("rows" in p and "bytes" in p for p in m["partitions"])
    # config change invalidates
    run_stage("s1", make, wd, "fp2")
    assert calls["n"] == 2
    assert not stage_complete(wd, "s1", "fp1")


def test_pipeline_resume_identical(ray_session, tmp_path):
    wd = str(tmp_path / "run")
    os.makedirs(wd, exist_ok=True)
    full = synth_pages_dataset(60, seed=42)
    pages = full.drop_columns(["true_id"]).materialize()

    first = dedupe_pages(pages, workdir=wd).to_pandas().sort_values("record_id").reset_index(drop=True)
    stages = set(os.listdir(wd))
    assert {"blocks", "pairs", "edges", "clusters", "entity_map"} <= stages

    # simulate a crash after the pairs stage: later stages lost
    for s in ("edges", "clusters", "entity_map"):
        shutil.rmtree(os.path.join(wd, s))
    blocks_mtime = os.path.getmtime(os.path.join(wd, "blocks", "manifest.json"))

    second = dedupe_pages(pages, workdir=wd).to_pandas().sort_values("record_id").reset_index(drop=True)
    # earlier stages were NOT recomputed (manifests untouched)
    assert os.path.getmtime(os.path.join(wd, "blocks", "manifest.json")) == blocks_mtime
    assert first.equals(second)


def test_no_partial_data_on_failure(ray_session, tmp_path):
    wd = str(tmp_path)

    def boom():
        raise RuntimeError("mid-stage failure")

    with pytest.raises(RuntimeError):
        run_stage("bad", boom, wd, "fp")
    assert not stage_complete(wd, "bad", "fp")
    assert not os.path.exists(os.path.join(wd, "bad", "data"))


def test_write_partitioned_resume(ray_session, tmp_path):
    """Per-bucket atomic commit: a rerun skips committed buckets (no write,
    no shuffle of their rows) and repairs only the missing one."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.sources import read_partitioned, write_partitioned

    out = str(tmp_path / "part_out")
    t = pa.table({"k": [str(i) for i in range(500)], "v": list(range(500))})
    ds = rd.from_arrow(t).repartition(5)

    m1 = write_partitioned(ds, out, "k", num_buckets=8)
    assert sorted(m1["written"]) == list(range(8)) and m1["skipped"] == []
    back = read_partitioned(out).to_pandas()
    assert sorted(back["v"]) == list(range(500))

    # break one bucket: remove its _SUCCESS -> it becomes invisible and rerun
    # rewrites ONLY it
    victim = os.path.join(out, "bucket=3", "_SUCCESS")
    os.remove(victim)
    partial = read_partitioned(out).to_pandas()
    assert len(partial) < 500

    m2 = write_partitioned(ds, out, "k", num_buckets=8)
    assert m2["written"] == [3]
    assert m2["skipped"] == [0, 1, 2, 4, 5, 6, 7]
    back2 = read_partitioned(out).to_pandas()
    assert sorted(back2["v"]) == list(range(500))

    # full rerun is a no-op
    m3 = write_partitioned(ds, out, "k", num_buckets=8)
    assert m3["written"] == [] and len(m3["skipped"]) == 8


def test_read_parquet_union_by_name(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_examples_ray.sources import read_parquet_union_by_name

    # generation 1: (id int32, text); generation 2 added lang, widened id
    p1 = str(tmp_path / "gen1.parquet")
    p2 = str(tmp_path / "gen2.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int32()),
                             "text": pa.array(["a", "b"])}), p1)
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "lang": pa.array(["en"]),
                             "text": pa.array(["c"])}), p2)

    out = (read_parquet_union_by_name([p1, p2]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert list(out.columns) == ["id", "lang", "text"]
    assert out["id"].tolist() == [1, 2, 3]          # int32 promoted to int64
    assert out["lang"].tolist()[:2] == [None, None]  # missing -> nulls
    assert out["lang"].tolist()[2] == "en"

    # column pruning still works, and unknown columns raise at plan time
    pruned = read_parquet_union_by_name([p1, p2], columns=["id", "lang"])
    assert sorted(pruned.schema().names) == ["id", "lang"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_parquet_union_by_name([p1, p2], columns=["nope"])
    with _pytest.raises(ValueError):
        read_parquet_union_by_name([])


def test_read_parquet_union_by_name_incompatible_types(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from dedupe_examples_ray.sources import read_parquet_union_by_name

    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}), p1)
    pq.write_table(pa.table({"k": pa.array([[1]], pa.list_(pa.int64()))}), p2)
    with _pytest.raises(ValueError):
        read_parquet_union_by_name([p1, p2])


def test_compact_parquet_resumable(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_examples_ray.sources import compact_parquet

    src = tmp_path / "small"
    dst = tmp_path / "big"
    src.mkdir()
    total = 0
    for i in range(12):
        n = 50 + i
        pq.write_table(pa.table({"k": pa.array(range(total, total + n), pa.int64())}),
                       str(src / f"shard-{i:03d}.parquet"))
        total += n
    # ~0 MB target forces one bin per file boundary; a big target -> one bin
    r1 = compact_parquet(str(src), str(dst), target_mb=1)
    assert r1["files_in"] == 12 and r1["files_out"] == 1 and r1["skipped"] == 0
    got = pq.read_table(str(dst / "part-00000.parquet"))
    assert got.num_rows == total
    assert got["k"].to_pylist() == list(range(total))  # name-order stable

    # resume: nothing rewritten
    r2 = compact_parquet(str(src), str(dst), target_mb=1)
    assert r2["skipped"] == 1
    # no in-progress temp files left behind
    assert not [f for f in os.listdir(dst) if f.endswith(".inprogress")]


def test_compact_parquet_rebins_on_changed_input(ray_session, tmp_path):
    """Resume is keyed on bin membership: adding an input file after a run
    recompacts affected bins instead of skipping stale parts (which would
    duplicate or drop rows)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_examples_ray.sources import compact_parquet

    src = tmp_path / "small2"
    dst = tmp_path / "big2"
    src.mkdir()
    for i in range(6):
        pq.write_table(pa.table({"k": pa.array([i] * 100, pa.int64())}),
                       str(src / f"shard-{i:03d}.parquet"))
    compact_parquet(str(src), str(dst), target_mb=1)

    # input changes: one new file lands between existing ones
    pq.write_table(pa.table({"k": pa.array([99] * 100, pa.int64())}),
                   str(src / "shard-002b.parquet"))
    r = compact_parquet(str(src), str(dst), target_mb=1)
    assert r["files_in"] == 7

    parts = sorted(f for f in os.listdir(dst)
                   if f.startswith("part-") and f.endswith(".parquet"))
    got = pa.concat_tables([pq.read_table(str(dst / f)) for f in parts])
    exp = sorted([i for i in range(6) for _ in range(100)] + [99] * 100)
    assert sorted(got["k"].to_pylist()) == exp  # no dupes, no drops


def test_compact_parquet_unifies_drifted_schemas(ray_session, tmp_path):
    """Files with missing/extra columns stream through one unified-schema
    writer (missing columns become nulls)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedupe_examples_ray.sources import compact_parquet

    src = tmp_path / "drift"
    dst = tmp_path / "drift_out"
    src.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}),
                   str(src / "f0.parquet"))
    pq.write_table(pa.table({"a": pa.array([3], pa.int64()),
                             "b": pa.array(["x"], pa.string())}),
                   str(src / "f1.parquet"))
    compact_parquet(str(src), str(dst), target_mb=64)
    got = pq.read_table(str(dst / "part-00000.parquet"))
    assert sorted(got.column_names) == ["a", "b"]
    assert got["a"].to_pylist() == [1, 2, 3]
    assert got["b"].to_pylist() == [None, None, "x"]


# ------------------------------------------------------------- zone maps
def test_zonemap_pruning_and_row_exactness(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.sources import (
        read_partitioned,
        write_partitioned,
        zonemap_plan,
    )

    df = pd.DataFrame({
        "k": [f"g{i % 4}" for i in range(400)],
        "val": range(400),
        "name": [f"n{i:03d}" for i in range(400)],
    })
    out = str(tmp_path / "zm")
    write_partitioned(rd.from_pandas(df), out, key_col="k", num_buckets=8)

    # equality on the partition key prunes every non-matching bucket
    plan = zonemap_plan(out, [("k", "==", "g2")])
    assert plan["skipped"] and plan["keep"]
    got = read_partitioned(out, predicate=[("k", "==", "g2")]).to_pandas()
    exp = df[df["k"] == "g2"]
    assert sorted(got["val"]) == sorted(exp["val"])

    # range predicate on a scattered column: zone maps can't prune (hash
    # layout spans the range) but the row filter is still exact
    got2 = read_partitioned(out, predicate=[("val", ">=", 390)]).to_pandas()
    assert sorted(got2["val"]) == list(range(390, 400))

    # impossible predicate prunes EVERYTHING -> explicit error, not a scan
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_partitioned(out, predicate=[("val", ">", 10_000)])

    # columns + predicate-on-unprojected-column composes
    got3 = read_partitioned(out, columns=["name"],
                            predicate=[("k", "==", "g1")]).to_pandas()
    assert list(got3.columns) == ["name"] and len(got3) == 100


def test_zonemap_all_null_and_missing_stats(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from dedupe_examples_ray.sources import read_partitioned, write_partitioned

    df = pd.DataFrame({"k": ["a"] * 10,
                       "x": pd.Series([None] * 10, dtype="float64"),
                       "y": [[1, 2]] * 10})  # y: list col -> no zone entry
    out = str(tmp_path / "zm2")
    write_partitioned(rd.from_pandas(df), out, key_col="k", num_buckets=2)
    # an all-null / un-zone-mapped column is conservatively READ (no stats
    # to prune on); the exact row filter still yields zero matches
    got = read_partitioned(out, predicate=[("x", ">=", 0)])
    assert got.count() == 0
    got2 = read_partitioned(out, predicate=[("k", "==", "a")]).to_pandas()
    assert len(got2) == 10
    # the prune logic itself: an entry recorded as all-null excludes every
    # comparison (SQL 3VL — no row can match)
    from dedupe_examples_ray.sources.io import _zone_excludes

    zones = {"cols": {"x": {"null_count": 10, "min": None, "max": None}}}
    for op in (">=", ">", "<=", "<", "=="):
        assert _zone_excludes(zones, "x", op, 0)
    assert not _zone_excludes(zones, "other", ">=", 0)  # no stats -> keep


def test_span_dedup_checkpoint_resume(ray_session, tmp_path):
    """Kill-after-stage for the corpus-dedup family: span_dedup commits its
    cut lists; a rerun replays them (manifest untouched) and produces an
    identical corpus; a changed fingerprint recomputes."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import span_dedup

    # NOT self-similar (an "xxxx..." run would be span-deduped within its
    # own first occurrence): a 300+-char varied sentence
    footer = " ".join(f"footer-token-{j}-{j * 7 % 13}" for j in range(20))
    assert len(footer) >= 256
    docs = [
        {"doc_id": f"d{i:02d}", "text": f"unique body {i} " * 30 + footer}
        for i in range(12)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    wd = str(tmp_path / "span")

    def run():
        out = span_dedup(ds, min_len=256, workdir=wd, input_token="t1")
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    first = run()
    assert os.path.exists(os.path.join(wd, "span_cuts", "manifest.json"))
    m1 = os.path.getmtime(os.path.join(wd, "span_cuts", "manifest.json"))
    # crash-after-cuts: nothing else persists; rerun must replay the stage
    second = run()
    assert os.path.getmtime(os.path.join(wd, "span_cuts", "manifest.json")) == m1
    assert first.equals(second)
    # the footer survives exactly once
    kept = sum(footer in t for t in first["text"])
    assert kept == 1
    # changed input token -> stale cuts must NOT replay
    span_dedup(ds, min_len=256, workdir=wd, input_token="t2").count()
    assert os.path.getmtime(os.path.join(wd, "span_cuts", "manifest.json")) != m1


def test_minhash_paragraph_semantic_checkpoint_resume(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops import (
        minhash_lsh_dedup,
        paragraph_dedup,
        semantic_dedup,
    )

    docs = [
        {"doc_id": i, "text": f"some shared words {i % 5} " * 8}
        for i in range(40)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))

    wd = str(tmp_path / "mh")
    a = minhash_lsh_dedup(ds, workdir=wd, input_token="x").to_pandas()
    assert os.path.exists(os.path.join(wd, "mh_pairs", "manifest.json"))
    m1 = os.path.getmtime(os.path.join(wd, "mh_pairs", "manifest.json"))
    b = minhash_lsh_dedup(ds, workdir=wd, input_token="x").to_pandas()
    assert os.path.getmtime(os.path.join(wd, "mh_pairs", "manifest.json")) == m1
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))

    wd = str(tmp_path / "para")
    a = paragraph_dedup(ds, workdir=wd).to_pandas()
    m1 = os.path.getmtime(os.path.join(wd, "para_kept", "manifest.json"))
    b = paragraph_dedup(ds, workdir=wd).to_pandas()
    assert os.path.getmtime(os.path.join(wd, "para_kept", "manifest.json")) == m1
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))

    rng = np.random.default_rng(3)
    base = rng.normal(size=(8, 16))
    vecs = [
        {"vec_id": i, "embedding": (base[i % 8] + rng.normal(scale=1e-3, size=16)).tolist()}
        for i in range(64)
    ]
    vds = rd.from_arrow(pa.Table.from_pylist(vecs))
    wd = str(tmp_path / "sem")
    a = semantic_dedup(vds, k=4, iters=3, workdir=wd).to_pandas()
    m1 = os.path.getmtime(os.path.join(wd, "sem_pairs", "manifest.json"))
    b = semantic_dedup(vds, k=4, iters=3, workdir=wd).to_pandas()
    assert os.path.getmtime(os.path.join(wd, "sem_pairs", "manifest.json")) == m1
    assert a.sort_values("vec_id").reset_index(drop=True).equals(
        b.sort_values("vec_id").reset_index(drop=True))


def test_partition_key_equality_pruning(ray_session, tmp_path):
    """An equality predicate on the partition key prunes to EXACTLY the one
    bucket that hash-owns the value — metadata only — and the pruned read
    equals full scan + filter."""
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.sources import (
        read_partitioned,
        write_partitioned,
        zonemap_plan,
    )

    rows = [{"k": f"key{i % 37}", "v": i} for i in range(500)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    path = str(tmp_path / "pk")
    write_partitioned(ds, path, key_col="k", num_buckets=8)
    assert os.path.exists(os.path.join(path, "_PARTKEY"))

    plan = zonemap_plan(path, [("k", "==", "key11")])
    assert len(plan["keep"]) == 1 and plan["skipped"]
    got = read_partitioned(path, predicate=[("k", "==", "key11")]).to_pandas()
    exp = [i for i in range(500) if i % 37 == 11]
    assert sorted(got["v"]) == exp
    # non-key predicates still go through the zone maps (no key pruning)
    plan2 = zonemap_plan(path, [("v", ">=", 0)])
    assert len(plan2["keep"]) >= 1
