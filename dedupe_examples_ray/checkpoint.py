"""Per-stage Parquet checkpoints with lineage + metrics manifests.

Generalizes the reference's durable intermediates — the settings/training
files that skip retraining (csv_example.py:94-97, mysql_example.py:115-118)
and the blocking_map / entity_map tables that persist mid-pipeline state in
the database (mysql_example.py:190-198,280-292) — into a uniform rule
(north_rule): every stage writes partitioned Parquet plus a manifest of
per-partition lineage (file, rows, bytes) and stage metrics; a rerun with the
same config fingerprint resumes from the last completed stage.

Writes are atomic: data lands in ``<stage>/.tmp-data`` and is renamed to
``<stage>/data`` before the manifest (the commit record) is written.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _manifest_path(workdir: str, name: str) -> str:
    return os.path.join(workdir, name, "manifest.json")


def _data_dir(workdir: str, name: str) -> str:
    return os.path.join(workdir, name, "data")


def stage_complete(workdir: str, name: str, fingerprint: str) -> bool:
    """True iff the stage committed with the same config fingerprint."""
    try:
        with open(_manifest_path(workdir, name)) as f:
            m = json.load(f)
        return bool(m.get("completed")) and m.get("fingerprint") == fingerprint
    except (FileNotFoundError, json.JSONDecodeError):
        return False


def load_stage(workdir: str, name: str):
    import ray.data as rd

    return rd.read_parquet(_data_dir(workdir, name))


def read_manifest(workdir: str, name: str) -> dict:
    with open(_manifest_path(workdir, name)) as f:
        return json.load(f)


def run_stage(name: str, fn, workdir: str | None, fingerprint: str, metrics: dict | None = None):
    """Run ``fn() -> Dataset`` under a checkpoint, or replay it if committed.

    With ``workdir=None`` the pipeline streams straight through (no
    materialization) — checkpointing is an opt-in durability/latency trade.
    """
    if workdir is None:
        return fn()
    if stage_complete(workdir, name, fingerprint):
        return load_stage(workdir, name)
    stage_dir = os.path.join(workdir, name)
    tmp = os.path.join(stage_dir, ".tmp-data")
    data = _data_dir(workdir, name)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    ds = fn()
    ds.write_parquet(tmp)
    wall = time.monotonic() - t0
    os.rename(tmp, data)

    import pyarrow.parquet as pq

    parts = []
    rows = 0
    for fname in sorted(os.listdir(data)):
        p = os.path.join(data, fname)
        md = pq.ParquetFile(p).metadata
        parts.append({"file": fname, "rows": md.num_rows, "bytes": os.path.getsize(p)})
        rows += md.num_rows
    manifest = {
        "stage": name,
        "fingerprint": fingerprint,
        "completed": True,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "partitions": parts,
        "metrics": metrics or {},
        "written_at_monotonic": time.monotonic(),
    }
    with open(_manifest_path(workdir, name), "w") as f:
        json.dump(manifest, f, indent=1)
    return load_stage(workdir, name)
