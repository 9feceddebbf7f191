"""Sources / sinks (SURVEY.md §2.1).

Ray-Data-native equivalents of the reference's readers and writers:

- S1  header-driven CSV/Parquet reader -> ``read_table``
- S3  multi-file concat reader with a source tag
  (record_linkage_example.py:187-211) -> ``read_tagged_sources``
- S7  ragged-line repair reader (pgsql_big_dedupe_example_init_db.py:51-65)
  -> ``repair_ragged_lines``
- S10 annotated output writer — original columns + Cluster ID + confidence
  (csv_example.py:161-180) -> ``write_annotated_output``
- S11 entity-map table writer (mysql_example.py:273-292) -> ``write_entity_map``

All writes are partitioned Parquet directories (resumable output layout).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def clean_read_schema(path, columns: list[str] | None = None):
    """Metadata-free Arrow schema for a parquet file/dir (footer-only read).

    Parquet files written by pandas embed a ``b'pandas'`` schema-metadata
    dict; blocks read from them make schemas unhashable, which disables
    Ray's schema-deduplication fast path in every downstream reduce and logs
    one "Failed to hash the schemas" warning per task.  Passing an explicit
    metadata-free schema to ``read_parquet`` keeps every block clean at the
    source.  Returns None when the footer can't be probed (non-local paths,
    drifting directories) — callers fall back to Ray's own inference.
    """
    import os

    import pyarrow.parquet as pq

    try:
        probe = path[0] if isinstance(path, (list, tuple)) else path
        if os.path.isdir(probe):
            names = sorted(
                n for n in os.listdir(probe) if n.endswith(".parquet")
            )
            if not names:
                return None
            probe = os.path.join(probe, names[0])
        schema = pq.read_schema(probe)
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return schema.remove_metadata()
    except Exception:
        return None


def read_parquet_clean(path, columns: list[str] | None = None, **kw):
    """``ray.data.read_parquet`` with a metadata-free explicit schema (see
    ``clean_read_schema``) — the standard read path for this engine."""
    import ray.data as rd

    schema = clean_read_schema(path, columns)
    if schema is not None:
        kw.setdefault("schema", schema)
    return rd.read_parquet(path, columns=columns, **kw)


def read_table(path: str, columns: list[str] | None = None, fmt: str | None = None):
    """Read parquet/csv/json by extension (prune columns at the read)."""
    import ray.data as rd

    fmt = fmt or ("csv" if path.endswith(".csv") else "json" if path.endswith(".json") else "parquet")
    if fmt == "parquet":
        return read_parquet_clean(path, columns=columns)
    ds = rd.read_csv(path) if fmt == "csv" else rd.read_json(path)
    return ds.select_columns(columns) if columns else ds


def read_tagged_sources(paths: list[str], source_col: str = "source_file", columns=None):
    """Concat several inputs with a 0-based source tag column (reference S3:
    left/right files read sequentially with ``source file`` = 0/1)."""
    out = None
    for i, p in enumerate(paths):
        ds = read_table(p, columns=columns)
        tagged = ds.map_batches(
            lambda t, _i=i: t.append_column(source_col, pa.array([_i] * t.num_rows, pa.int8())),
            batch_format="pyarrow",
        )
        out = tagged if out is None else out.union(tagged)
    return out


def repair_ragged_lines(lines_ds, n_fields: int, sep: str = "\t", column_names: list[str] | None = None):
    """Tab-split text lines, DROP rows with the wrong field count, emit a
    clean table (reference S7 validator: ragged rows discarded, not patched).

    Input: a Dataset of text rows (``ray.data.read_text`` -> column 'text').
    """

    def fix(t: pa.Table) -> pa.Table:
        split = pc.split_pattern(pc.cast(t["text"], pa.string()), sep)
        ok = pc.equal(pc.list_value_length(split), n_fields)
        good = split.filter(ok) if isinstance(split, pa.ChunkedArray) else split.filter(ok)
        cols = {}
        names = column_names or [f"f{i}" for i in range(n_fields)]
        for i, name in enumerate(names):
            cols[name] = pc.list_element(good, i) if len(good) else pa.array([], pa.string())
        return pa.table(cols)

    return lines_ds.map_batches(fix, batch_format="pyarrow")


def write_entity_map(entity_ds, path: str):
    """(record_id, canon_id, cluster_score) -> partitioned Parquet (S11)."""
    entity_ds.write_parquet(path)
    return path


# Above this many entity-map rows the annotation stops broadcasting (the
# entity map has ONE ROW PER RECORD — at web scale it IS the corpus) and
# routes through the big-big hash_join instead.
ANNOTATE_BROADCAST_BUDGET = 2_000_000


def write_annotated_output(records_ds, entity_ds, id_col: str, path: str | None = None,
                           cluster_col: str = "cluster_id", score_col: str = "confidence_score",
                           broadcast_row_budget: int | None = None):
    """Original columns + Cluster ID + confidence (reference S10/J7).

    Under ``broadcast_row_budget`` entity rows the entity map is broadcast and
    joined per batch — no re-read of the raw input, no shuffle of the record
    table.  Over it (the entity map is one row per record, so it scales with
    the corpus) the annotation switches to the distributed
    ``relational.hash_join(..., how="left")``; both paths produce identical
    annotated outputs (tests/test_scale_safety.py parity test).
    """
    import ray

    budget = ANNOTATE_BROADCAST_BUDGET if broadcast_row_budget is None else broadcast_row_budget
    entity_ds = entity_ds.materialize()
    if entity_ds.count() > budget:
        from ..relational import hash_join

        em_ds = entity_ds.map_batches(
            lambda t: pa.table(
                {
                    "__rid": pc.cast(t["record_id"], pa.string()),
                    cluster_col: pc.cast(t["canon_id"], pa.string()),
                    score_col: pc.cast(t["cluster_score"], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        keyed = records_ds.map_batches(
            lambda t: t.append_column("__rid", pc.cast(t[id_col], pa.string())),
            batch_format="pyarrow",
        )
        out = hash_join(keyed, em_ds, on="__rid", how="left").drop_columns(["__rid"])
        if path:
            out.write_parquet(path)
        return out

    em = entity_ds.to_pandas()
    tbl = pa.table(
        {
            "record_id": pa.array(em["record_id"].astype(str), pa.string()),
            cluster_col: pa.array(em["canon_id"].astype(str), pa.string()),
            score_col: pa.array(em["cluster_score"], pa.float64(), from_pandas=True),
        }
    )
    ref = ray.put(tbl)

    def annotate(t: pa.Table) -> pa.Table:
        lbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        idx = pc.index_in(pc.cast(t[id_col], pa.string()), value_set=lbl["record_id"].combine_chunks())
        out = t.append_column(cluster_col, pc.take(lbl[cluster_col].combine_chunks(), idx))
        return out.append_column(score_col, pc.take(lbl[score_col].combine_chunks(), idx))

    out = records_ds.map_batches(annotate, batch_format="pyarrow", batch_size=None)
    if path:
        out.write_parquet(path)
    return out


def write_partitioned(ds, path: str, key_col: str, num_buckets: int | None = None,
                      skip_done: bool = True) -> dict:
    """Resumable partitioned Parquet sink: one ``bucket=<i>`` directory per
    ``stable_hash(key_col) % num_buckets``, each committed ATOMICALLY (data
    written to a hidden tmp dir, renamed, then a ``_SUCCESS`` marker with the
    bucket's row count).  A rerun with ``skip_done=True`` filters committed
    buckets out BEFORE the shuffle, so already-finished partitions cost
    neither write nor data movement — a failed 100-TB job resumes at the
    granularity of one bucket, not one job (north_rule: resumable output).

    Never one giant file: each bucket is its own directory/file, bounded by
    rows/num_buckets.  Returns ``{"written": [...], "skipped": [...]}``.
    """
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from ..pairs import stable_hash

    os.makedirs(path, exist_ok=True)
    # Resume safety: the bucket count is pinned to the OUTPUT's layout — the
    # first attempt records it, reruns reuse it (a different count would remap
    # keys across the already-committed buckets).
    meta = os.path.join(path, "_NUM_BUCKETS")
    if os.path.exists(meta):
        stored = int(open(meta).read())
        if num_buckets is not None and int(num_buckets) != stored:
            raise ValueError(
                f"{path} is partitioned into {stored} buckets; "
                f"num_buckets={num_buckets} would misalign resume"
            )
        num_buckets = stored
    else:
        from ..scale import resolve_buckets

        num_buckets = resolve_buckets(num_buckets, ds)
        with open(meta, "w") as f:
            f.write(str(num_buckets))
    # record the partition key so equality reads can prune to ONE bucket by
    # hash (exact bucket pruning — stronger than min/max zones for hashed
    # layouts, where every bucket's value range straddles most predicates)
    pk = os.path.join(path, "_PARTKEY")
    if not os.path.exists(pk):
        with open(pk, "w") as f:
            f.write(key_col)
    done = {
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("bucket=")
        and os.path.exists(os.path.join(path, d, "_SUCCESS"))
    } if skip_done else set()

    def bucketize(t: pa.Table) -> pa.Table:
        b = stable_hash(
            pc.cast(t[key_col], pa.string()).to_numpy(zero_copy_only=False)
        ) % num_buckets
        t = t.append_column("__bkt", pa.array(b.astype(np.int64)))
        if done:
            t = t.filter(pa.array(~np.isin(b, np.fromiter(done, dtype=np.int64))))
        return t

    def commit_bucket(t: pa.Table) -> pa.Table:
        b = int(t["__bkt"][0].as_py())
        data = t.drop_columns(["__bkt"])
        final = os.path.join(path, f"bucket={b}")
        tmp = os.path.join(path, f".tmp-bucket={b}-{os.getpid()}")
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(data, os.path.join(tmp, "part-0.parquet"))
        # zone map: per-column min/max/null_count for int/float/string
        # columns — written INSIDE the atomic rename, so a committed bucket
        # always carries its own pruning metadata
        import json

        import pyarrow.compute as _pc

        zones: dict = {"rows": data.num_rows, "cols": {}}
        for name, col in zip(data.column_names, data.columns):
            ty = col.type
            if not (pa.types.is_integer(ty) or pa.types.is_floating(ty)
                    or pa.types.is_string(ty) or pa.types.is_large_string(ty)):
                continue
            nn = data.num_rows - col.null_count
            entry = {"null_count": col.null_count, "min": None, "max": None}
            if nn:
                mm = _pc.min_max(col)
                entry["min"] = mm["min"].as_py()
                entry["max"] = mm["max"].as_py()
            zones["cols"][name] = entry
        with open(os.path.join(tmp, "_ZONEMAP"), "w") as f:
            json.dump(zones, f)
        if os.path.exists(final):  # stale uncommitted attempt
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(os.path.join(final, "_SUCCESS"), "w") as f:
            f.write(str(data.num_rows))
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "rows": pa.array([data.num_rows], pa.int64())})

    manifest = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(commit_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "written": sorted(int(b) for b in manifest.get("bucket", [])),
        "skipped": sorted(done),
    }


def _zone_excludes(zones: dict, col: str, op: str, v) -> bool:
    """True iff the zone map PROVES no row of the bucket satisfies
    ``col <op> v`` (SQL comparison semantics: NULLs never match)."""
    entry = zones.get("cols", {}).get(col)
    if entry is None:
        return False  # no stats for this column — must read
    lo, hi = entry["min"], entry["max"]
    if lo is None:  # all-null column: no row can satisfy any comparison
        return True
    if op == ">=":
        return hi < v
    if op == ">":
        return hi <= v
    if op == "<=":
        return lo > v
    if op == "<":
        return lo >= v
    if op == "==":
        return v < lo or v > hi
    raise ValueError(f"unsupported zone-map op {op!r}")


def zonemap_plan(path: str, predicate: list[tuple]) -> dict:
    """Metadata-only pruning plan for a ``write_partitioned`` directory:
    ``{"keep": [files], "skipped": [files]}`` under an AND-of-comparisons
    predicate ``[(col, op, value), ...]`` with op in >=, >, <=, <, ==.
    Buckets without a ``_ZONEMAP`` (older layouts) are conservatively kept.
    """
    import json
    import os

    # exact bucket pruning: an equality clause on the PARTITION key pins the
    # row's bucket (stable_hash(value) % num_buckets) — every other bucket is
    # skipped from metadata alone, regardless of zone ranges
    want_bucket = None
    try:
        with open(os.path.join(path, "_PARTKEY")) as f:
            part_key = f.read().strip()
        with open(os.path.join(path, "_NUM_BUCKETS")) as f:
            nb = int(f.read())
        import numpy as _np

        from ..pairs import stable_hash as _sh

        for c, op, v in predicate:
            if c == part_key and op == "==":
                # render the value EXACTLY as the writer bucketed it —
                # stable_hash(pc.cast(key_col, pa.string())) — so non-int/str
                # key types (bool 'true' vs str(True)='True', floats,
                # timestamps) land in the same bucket as their rows
                import pyarrow as _pa
                import pyarrow.compute as _pc2

                rendered = _pc2.cast(_pa.scalar(v), _pa.string()).as_py()
                # NOTE: modulo on the ARRAY, not the scalar — a numpy uint64
                # SCALAR % python int promotes to float64 and loses low bits
                want_bucket = int(
                    (_sh(_np.asarray([rendered], dtype=object)) % nb)[0]
                )
                break
    except (FileNotFoundError, ValueError):
        pass

    keep: list[str] = []
    skipped: list[str] = []
    for d in sorted(os.listdir(path)):
        if not d.startswith("bucket="):
            continue
        bdir = os.path.join(path, d)
        if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
            continue
        f = os.path.join(bdir, "part-0.parquet")
        if want_bucket is not None and int(d.split("=", 1)[1]) != want_bucket:
            skipped.append(f)
            continue
        zpath = os.path.join(bdir, "_ZONEMAP")
        if os.path.exists(zpath):
            with open(zpath) as zf:
                zones = json.load(zf)
            if any(_zone_excludes(zones, c, op, v) for c, op, v in predicate):
                skipped.append(f)
                continue
        keep.append(f)
    return {"keep": keep, "skipped": skipped}


def read_partitioned(path: str, columns: list[str] | None = None,
                     predicate: list[tuple] | None = None):
    """Read back only COMMITTED buckets of a ``write_partitioned`` directory
    (uncommitted tmp dirs and marker-less buckets are invisible).

    ``predicate``: optional AND-list of ``(col, op, value)`` comparisons —
    buckets whose ``_ZONEMAP`` proves emptiness are skipped WITHOUT any data
    IO (min/max zone maps, the data-lake skipping pattern; the predicate is
    then still applied row-exactly to the surviving buckets, so the result
    equals a full scan + filter).
    """
    import os

    import pyarrow.compute as _pc
    import ray.data as rd

    if predicate:
        plan = zonemap_plan(path, predicate)
        files = plan["keep"]
    else:
        files = sorted(
            os.path.join(path, d, "part-0.parquet")
            for d in os.listdir(path)
            if d.startswith("bucket=")
            and os.path.exists(os.path.join(path, d, "_SUCCESS"))
        )
    if not files:
        raise FileNotFoundError(
            f"no committed buckets under {path}"
            + (" match the predicate" if predicate else ""))
    read_cols = columns
    if predicate and columns is not None:
        read_cols = list(dict.fromkeys(
            list(columns) + [c for c, _, _ in predicate]))
    ds = read_parquet_clean(files, columns=read_cols)
    if predicate:
        ops = {">=": _pc.greater_equal, ">": _pc.greater,
               "<=": _pc.less_equal, "<": _pc.less, "==": _pc.equal}

        def row_filter(t: pa.Table) -> pa.Table:
            mask = None
            for c, op, v in predicate:
                m = ops[op](t[c], pa.scalar(v))
                m = _pc.fill_null(m, False)
                mask = m if mask is None else _pc.and_(mask, m)
            return t.filter(mask)

        ds = ds.map_batches(row_filter, batch_format="pyarrow")
        if columns is not None and read_cols != list(columns):
            ds = ds.select_columns(list(columns))
    return ds


def read_parquet_union_by_name(paths: list[str], columns: list[str] | None = None):
    """Read Parquet shards whose schemas DRIFTED (crawl generations add or
    drop columns) and align them by column NAME — DuckDB/Spark
    ``union_by_name`` semantics: the output schema is the name-ordered union
    of all shard schemas; a shard missing a column yields typed nulls.

    Schema reconciliation happens on METADATA only (one footer read per
    path, no data IO); the data read is a normal pruned ``read_parquet`` per
    shard group, so column/row-group pruning still applies.  Type conflicts
    across shards resolve by Arrow ``unify_schemas`` promotion where legal
    (int32→int64, float→double); incompatible types raise at plan time, not
    mid-job.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    if not paths:
        raise ValueError("paths must be non-empty")
    schemas = [pq.read_schema(p) for p in paths]
    try:
        unified = pa.unify_schemas(schemas, promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
        raise ValueError(f"shard schemas cannot be unified by name: {e}") from e
    names = sorted(unified.names)
    if columns is not None:
        missing = set(columns) - set(names)
        if missing:
            raise ValueError(f"columns not in any shard: {sorted(missing)}")
        names = [n for n in sorted(columns)]
    target = pa.schema([unified.field(n) for n in names])

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in t.column_names:
                c = t[f.name]
                if c.type != f.type:
                    c = pc.cast(c, f.type)
            else:
                c = pa.nulls(t.num_rows, f.type)
            cols.append(c)
        return pa.table(dict(zip(target.names, cols)))

    # group shards by identical projected schema so each group is one clean
    # read_parquet (Ray requires uniform schemas within a read)
    groups: dict[tuple, tuple[list[str], pa.Schema]] = {}
    for p, s in zip(paths, schemas):
        key = tuple(sorted((f.name, str(f.type)) for f in s))
        groups.setdefault(key, ([], s))[0].append(p)
    out = None
    for grp, schema in groups.values():
        # reuse the schema already fetched for planning — on remote object
        # storage an extra read_schema is one more round-trip per group
        shard_cols = [n for n in names if n in schema.names]
        ds = rd.read_parquet(grp, columns=shard_cols or None).map_batches(
            align, batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out


def compact_parquet(in_dir: str, out_dir: str, target_mb: int = 256):
    """Compact a directory of small Parquet files into ~``target_mb`` output
    files — the standard post-shuffle maintenance pass (thousands of tiny
    shuffle outputs destroy read parallelism economics at crawl scale).

    Planning is metadata-only on the driver (one listing, file sizes from the
    filesystem — no footers read); files are greedily binned by cumulative
    size, then ONE Ray task per bin streams its input files ROW GROUP BY ROW
    GROUP through one ``pq.ParquetWriter`` — peak task memory is one
    decompressed row group (plus the writer's buffer), never the whole bin.

    Resume is keyed on bin MEMBERSHIP, not bare existence: a ``_MANIFEST.json``
    in ``out_dir`` records each part's input (name, size) signature, and a
    re-run skips a part only when its signature is unchanged.  If the input
    listing shifted (files added/removed), affected bins are recompacted in
    place (atomic rename) and stale parts beyond the new plan are deleted —
    re-running after an input change can never duplicate or drop rows.  Row
    order within a bin follows input-file name order (stable across runs).

    Returns {"files_in": n, "files_out": m, "skipped": k}.
    """
    import hashlib
    import json
    import os

    import ray

    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    target = int(target_mb) * (1 << 20)
    bins: list[list[str]] = [[]]
    acc = 0
    for f in files:
        sz = os.path.getsize(f)
        if bins[-1] and acc + sz > target:
            bins.append([])
            acc = 0
        bins[-1].append(f)
        acc += sz

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    try:
        with open(manifest_path) as fh:
            old_manifest = json.load(fh)
    except (OSError, ValueError):
        old_manifest = {}

    def bin_sig(paths: list[str]) -> str:
        ident = "\n".join(
            f"{os.path.basename(p)}:{os.path.getsize(p)}" for p in paths)
        return hashlib.sha1(ident.encode()).hexdigest()

    @ray.remote(num_cpus=1)
    def compact_bin(paths: list[str], out_path: str) -> int:
        import pyarrow.parquet as pq

        schema = pa.unify_schemas(
            [pq.read_schema(p) for p in paths], promote_options="permissive")
        tmp = out_path + ".inprogress"
        n_rows = 0
        with pq.ParquetWriter(tmp, schema) as writer:
            for p in paths:
                pf = pq.ParquetFile(p)
                for rg in range(pf.num_row_groups):
                    t = pf.read_row_group(rg)
                    cols = [
                        pc.cast(t[f.name], f.type) if f.name in t.column_names
                        else pa.nulls(t.num_rows, f.type)
                        for f in schema
                    ]
                    aligned = pa.table(cols, schema=schema)
                    writer.write_table(aligned)
                    n_rows += t.num_rows
        os.replace(tmp, out_path)  # atomic commit
        return n_rows

    parts = [f"part-{i:05d}.parquet" for i in range(len(bins))]
    sigs = [bin_sig(b) for b in bins]
    todo, refs = [], []
    for part, b, sig in zip(parts, bins, sigs):
        out_path = os.path.join(out_dir, part)
        if old_manifest.get(part) == sig and os.path.exists(out_path):
            continue  # resumed: same membership, already compacted
        todo.append(part)
        refs.append(compact_bin.remote(b, out_path))
    ray.get(refs)
    # stale parts from a previous, larger plan would duplicate rows on read
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".parquet") and f not in set(parts):
            os.remove(os.path.join(out_dir, f))
    tmp = manifest_path + ".inprogress"
    with open(tmp, "w") as fh:
        json.dump(dict(zip(parts, sigs)), fh)
    os.replace(tmp, manifest_path)
    return {"files_in": len(files), "files_out": len(bins),
            "skipped": len(bins) - len(todo)}
