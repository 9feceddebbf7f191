"""Incremental snapshot-over-snapshot dedup against a persisted signature store.

Production web corpora arrive as periodic snapshots (new crawl dumps); each
new snapshot must be deduped against everything previously accepted WITHOUT
re-reading or re-shuffling the old corpus.  The reference's world has no
analog (it dedups one closed table, csv_example.py:3-5); the closest
structural precedent is its durable blocking_map table that persists blocking
state between pipeline phases (mysql_example.py:190-198) — here generalized
into a bucket-partitioned Parquet **signature store** that persists across
*runs*:

    store_dir/exact/snap-<id>/__bkt=<k>/*.parquet       (h, keep_id)
    store_dir/minhash/bands/snap-<id>/__bkt=<k>/*.parquet (band, key, doc_id)
    store_dir/minhash/sigs/snap-<id>/__bkt=<k>/*.parquet  (doc_id, sig)

Scale posture (the whole point):

- The store is partitioned on the SAME bucket key each run's shuffle uses, so
  a per-bucket group task reads exactly its own store shard from storage —
  prior snapshots are never shuffled, broadcast, or collected.  Per-increment
  cost is O(new snapshot) + O(touched shards), not O(corpus).
- Each snapshot appends one immutable generation directory (`snap-<id>`),
  written to a tmp dir and renamed (atomic commit, north-rule resumability).
  Re-running a snapshot id excludes its own generation from the prior set and
  skips the write — idempotent by construction.
- Only SURVIVORS (cluster representatives) enter the store, so ``keep_id``
  always names a living canonical document.
- Near-dup verification uses signature-estimated Jaccard (mean over
  ``num_perm`` minhash slots, an unbiased estimator of true Jaccard with
  std <= 1/sqrt(num_perm)) — no document text is ever hydrated or stored.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..scale import safe_coalesce
import pyarrow.parquet as pq

from .dedup import _get_broadcast, band_keys, batch_minhash_signatures

_SNAP_PREFIX = "snap-"


def _store_buckets(root: str, num_buckets, new_ds) -> int:
    """Bucket count pinned to the STORE's layout: the first run writes
    ``<root>/_NUM_BUCKETS`` (resolved via ``scale.resolve_buckets`` from the
    first snapshot if not given) and every later snapshot reuses it — shard
    alignment across generations requires one immutable count.  An explicit
    ``num_buckets`` conflicting with an existing store raises."""
    meta = os.path.join(root, "_NUM_BUCKETS")
    if os.path.exists(meta):
        stored = int(open(meta).read())
        if num_buckets is not None and int(num_buckets) != stored:
            raise ValueError(
                f"store {root} is partitioned into {stored} buckets; "
                f"num_buckets={num_buckets} would misalign its shards"
            )
        return stored
    from ..scale import resolve_buckets

    b = resolve_buckets(num_buckets, new_ds)
    os.makedirs(root, exist_ok=True)
    with open(meta, "w") as f:
        f.write(str(b))
    return b


# ---------------------------------------------------------------- store IO
def _gen_dir(root: str, snapshot_id: str) -> str:
    return os.path.join(root, f"{_SNAP_PREFIX}{snapshot_id}")


def _shard_files(root: str, bucket: int, exclude_snapshot: str) -> list[str]:
    """Parquet files of one bucket shard across all committed generations
    except ``exclude_snapshot`` (the run's own, for idempotent re-runs)."""
    out = []
    skip = f"{_SNAP_PREFIX}{exclude_snapshot}"
    for gen in sorted(glob.glob(os.path.join(root, f"{_SNAP_PREFIX}*"))):
        if os.path.basename(gen) == skip or gen.endswith(".tmp"):
            continue
        out.extend(sorted(glob.glob(os.path.join(gen, f"__bkt={bucket}", "*.parquet"))))
    return out


def _read_shard(root: str, bucket: int, exclude_snapshot: str, columns: list[str]) -> pa.Table | None:
    files = _shard_files(root, bucket, exclude_snapshot)
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


def _write_generation(ds, root: str, snapshot_id: str) -> None:
    """Atomically commit one snapshot's delta as an immutable generation:
    write to ``<gen>.tmp`` then rename.  Rows must carry ``__bkt``."""
    gen = _gen_dir(root, snapshot_id)
    if os.path.isdir(gen):  # committed by a previous run — idempotent
        return
    tmp = gen + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp, partition_cols=["__bkt"])
    os.rename(tmp, gen)


# ------------------------------------------------------------ exact dedup
def incremental_exact_dedup(
    new_ds,
    store_dir: str,
    snapshot_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
):
    """Dedup a NEW snapshot against the exact-hash store, then commit the
    snapshot's novel hashes as a new store generation.

    Returns an assignment Dataset over the new snapshot only:
    ``(doc_id, keep_id, status)`` with status ``unique`` (novel content, this
    doc is the representative), ``dup_snapshot`` (duplicate within the new
    snapshot; keep_id is the snapshot's winner), or ``dup_prior`` (content
    already in the store; keep_id is the stored representative).
    """
    root = os.path.join(store_dir, "exact")
    num_buckets = _store_buckets(root, num_buckets, new_ds)

    def add_hash(t: pa.Table) -> pa.Table:
        texts = np.asarray(t[text_col].to_pylist(), dtype=object)
        if len(texts):
            texts = np.where(pd.isna(texts), "", texts)
        hs = (pd.util.hash_array(texts).astype(np.uint64) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "h": pa.array(hs, pa.int64()),
                "bucket": pa.array(hs % num_buckets, pa.int64()),
            }
        )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        bucket = int(df["bucket"].iloc[0])
        win = df.groupby("h", sort=False)[id_col].transform("min")
        keep = win.copy()
        has_prior = np.zeros(len(df), dtype=bool)
        prior = _read_shard(root, bucket, snapshot_id, ["h", "keep_id"])
        if prior is not None and prior.num_rows:
            pmap = prior.to_pandas().drop_duplicates("h").set_index("h")["keep_id"]
            has_prior = df["h"].isin(pmap.index).to_numpy()
            if has_prior.any():
                keep[has_prior] = df["h"].map(pmap)[has_prior]
        status = np.where(
            has_prior,
            "dup_prior",
            np.where(keep.to_numpy() != df[id_col].to_numpy(), "dup_snapshot", "unique"),
        )
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "keep_id": keep,
                "status": status,
                "h": df["h"],
                "bucket": df["bucket"],
            }
        )

    resolved = (
        new_ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .materialize()  # consumed twice (delta + assignment); slim columns only
    )

    def delta(t: pa.Table) -> pa.Table:
        # one store row per novel hash: its snapshot winner
        m = pc.and_(
            pc.equal(t["status"], "unique"), pc.equal(t[id_col], t["keep_id"])
        )
        t = t.filter(m)
        return pa.table({"h": t["h"], "keep_id": t["keep_id"], "__bkt": t["bucket"]})

    _write_generation(resolved.map_batches(delta, batch_format="pyarrow"), root, snapshot_id)
    return resolved.drop_columns(["h", "bucket"])


# ---------------------------------------------------------- minhash dedup
def _band_bucket(band: np.ndarray, key: np.ndarray, num_buckets: int) -> np.ndarray:
    """Same (band, key) -> bucket mix as ops.dedup._bucket_pairs, so store
    shards align with the run's shuffle."""
    h = key.astype(np.uint64) + band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h % num_buckets).astype(np.int64)


def incremental_minhash_dedup(
    new_ds,
    store_dir: str,
    snapshot_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: str = "word",
    k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    num_buckets: int | None = None,
    max_bucket: int = 200,
):
    """Near-dup dedup of a NEW snapshot against the minhash store (and within
    itself), then commit the survivors' signatures + band keys as a new
    generation.

    Returns ``(doc_id, keep_id, status)`` over the new snapshot (statuses as
    in :func:`incremental_exact_dedup`).  A new document near-duplicate of a
    stored one gets ``keep_id`` = that stored representative (the smallest if
    several); prior assignments are never rewritten — a new doc that bridges
    two previously-distinct representatives maps to the smaller of them, the
    store keeps both (history is immutable).

    Dataflow: signatures are computed ONCE per doc into a slim materialized
    ``(doc_id, sig)`` dataset; band rows derive from it with a cheap
    re-hash.  Candidate pairs come from one bucketed shuffle of the NEW band
    rows only — each group task reads its aligned prior band shard from the
    store (no prior-corpus shuffle).  Verification hydrates signatures (new:
    in-flight; prior: only the touched sig shards, filtered to candidate
    ids) and tests signature-estimated Jaccard >= ``threshold``.
    """
    num_buckets = _store_buckets(os.path.join(store_dir, "minhash"), num_buckets, new_ds)
    import ray
    import ray.data as rd

    from ..cluster import connected_components
    from ..pairs import dedup_pairs, stable_hash
    from ..scoring import semi_hydrate

    bands_root = os.path.join(store_dir, "minhash", "bands")
    sigs_root = os.path.join(store_dir, "minhash", "sigs")

    # ---- 1. signatures, once per doc (the expensive shingling pass)
    def sig_batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        sigs = batch_minhash_signatures(texts, shingle, k, num_perm)
        offsets = pa.array(np.arange(len(texts) + 1, dtype=np.int32) * num_perm)
        return pa.table(
            {
                id_col: t[id_col],
                # plain list<uint64> (not fixed_size_list): survives the
                # parquet round-trip with an identical type, so store shards
                # union cleanly with in-flight batches
                "sig": pa.ListArray.from_arrays(offsets, pa.array(sigs.ravel(), pa.uint64())),
            }
        )

    new_sigs = new_ds.map_batches(sig_batch, batch_format="pyarrow").materialize()
    if new_sigs.count() == 0:  # empty snapshot: nothing to dedup or commit
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.string()),
                    "keep_id": pa.array([], pa.string()),
                    "status": pa.array([], pa.string()),
                }
            )
        )

    # ---- 2. band rows (cheap re-hash of the signature matrix)
    def band_batch(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sigs = (
            t["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(n, num_perm)
        )
        keys = band_keys(sigs, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.int32), n)
        keys_flat = keys.ravel()
        return pa.table(
            {
                id_col: pa.array(np.repeat(np.asarray(t[id_col].to_pylist(), dtype=object), bands), t[id_col].type),
                "band": pa.array(band_idx, pa.int32()),
                "key": pa.array(keys_flat, pa.int64()),
                "bucket": pa.array(
                    _band_bucket(band_idx.astype(np.uint64), keys_flat, num_buckets), pa.int64()
                ),
            }
        )

    new_bands = new_sigs.map_batches(band_batch, batch_format="pyarrow")

    # ---- 3. candidate pairs: new x new + new x prior, per aligned bucket
    def _emit_one(new_ids: np.ndarray, old_ids: np.ndarray) -> list[pd.DataFrame]:
        out = []
        if len(new_ids) >= 2:  # new x new, ascending -> id_a < id_b
            ia, ib = np.triu_indices(len(new_ids), k=1)
            out.append(pd.DataFrame({"id_a": new_ids[ia], "id_b": new_ids[ib]}))
        if len(new_ids) and len(old_ids):  # new x prior
            ia, ib = np.meshgrid(np.arange(len(new_ids)), np.arange(len(old_ids)), indexing="ij")
            out.append(
                pd.DataFrame({"id_a": new_ids[ia.ravel()], "id_b": old_ids[ib.ravel()]})
            )
        return out

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        bucket = int(df["bucket"].iloc[0])
        prior = _read_shard(bands_root, bucket, snapshot_id, ["band", "key", id_col])
        if prior is not None and prior.num_rows:
            pf = prior.to_pandas()
        else:
            pf = None
        frames = []
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=df[id_col].dtype),
                "id_b": pd.Series([], dtype=df[id_col].dtype),
            }
        )
        if pf is not None:
            pf = pf.merge(
                df[["band", "key"]].drop_duplicates(), on=["band", "key"], how="inner"
            )
            grouped_prior = {bk: g[id_col].to_numpy() for bk, g in pf.groupby(["band", "key"], sort=False)}
        else:
            grouped_prior = {}
        for bk, sub in df.groupby(["band", "key"], sort=False):
            new_ids = np.sort(sub[id_col].unique())
            old_ids = np.sort(pd.unique(grouped_prior.get(bk, np.array([], dtype=object))))
            n_tot = len(new_ids) + len(old_ids)
            if len(new_ids) == 0 or n_tot < 2:
                continue
            if n_tot > max_bucket:  # salt the hot bucket, both sides, same hash
                ksub = -(-n_tot // max_bucket)
                ns = stable_hash(new_ids) % ksub
                os_ = stable_hash(old_ids) % ksub if len(old_ids) else np.array([], dtype=np.uint64)
                for sv in range(ksub):
                    frames.extend(_emit_one(new_ids[ns == sv], old_ids[os_ == sv] if len(old_ids) else old_ids))
            else:
                frames.extend(_emit_one(new_ids, old_ids))
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    from ..scale import clean_arrow

    pairs = dedup_pairs(
        new_bands.groupby("bucket").map_groups(
            lambda df: clean_arrow(emit(df)), batch_format="pandas"
        )
    ).materialize()

    # ---- 4. verify with signature-estimated Jaccard
    # prior sigs: only the shards candidate old ids hash into, filtered to
    # those ids — bounded by candidate count, never the store size
    old_id_chunks = [
        pc.unique(t["id_b"])
        for t in pairs.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if old_id_chunks:
        cand_ids = pc.unique(pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in old_id_chunks]))
    else:
        cand_ids = pa.array([], pa.string())
    prior_sig_tbls = []
    if len(cand_ids):
        cand_np = np.asarray(cand_ids.to_pylist(), dtype=object)
        for bucket in np.unique(stable_hash(cand_np) % num_buckets):
            shard = _read_shard(sigs_root, int(bucket), snapshot_id, [id_col, "sig"])
            if shard is not None and shard.num_rows:
                prior_sig_tbls.append(
                    shard.filter(pc.is_in(shard[id_col], value_set=cand_ids))
                )
    prior_ids: set = set()
    all_sigs = new_sigs
    if prior_sig_tbls:
        prior_tbl = pa.concat_tables(prior_sig_tbls)
        prior_ids = set(prior_tbl[id_col].to_pylist())
        all_sigs = new_sigs.union(rd.from_arrow(prior_tbl))

    hydrated = semi_hydrate(pairs, all_sigs, id_col, ["sig"])

    def verify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t["sig_a"]), pc.is_valid(t["sig_b"])))
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"id_a": t["id_a"], "id_b": t["id_b"], "score": pa.array([], pa.float64())}
            )
        A = t["sig_a"].combine_chunks().flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm)
        B = t["sig_b"].combine_chunks().flatten().to_numpy(zero_copy_only=False).reshape(n, num_perm)
        est = (A == B).mean(axis=1)
        out = pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "score": pa.array(est, pa.float64())}
        )
        return out.filter(pc.greater_equal(out["score"], threshold))

    edges = hydrated.map_batches(verify, batch_format="pyarrow")

    # ---- 5. components with prior representatives as anchors
    labels = connected_components(edges)
    prior_ref = ray.put(pa.array(sorted(prior_ids)))

    def comp_keep(df: pd.DataFrame) -> pd.DataFrame:
        anchors = _get_broadcast(prior_ref).to_pylist()
        is_old = df["node"].isin(anchors)
        min_old = df[is_old].groupby("label")["node"].min()
        min_all = df.groupby("label")["node"].transform("min")
        keep = df["label"].map(min_old)
        keep = keep.where(keep.notna(), min_all)
        return pd.DataFrame({"node": df["node"], "keep_id": keep})

    def add_label_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(np.asarray(t["label"].to_pylist(), dtype=object)) % num_buckets
        return t.append_column("lb", pa.array(b.astype(np.int64), pa.int64()))

    keep_map = (
        labels.map_batches(add_label_bucket, batch_format="pyarrow")
        .groupby("lb")
        .map_groups(comp_keep, batch_format="pandas")
    )

    # ---- 6. annotate every new doc (Arrow broadcast; clustered nodes only)
    km_tbls = list(keep_map.iter_batches(batch_size=None, batch_format="pyarrow"))
    from ..scoring import dataset_arrow_types

    id_type = dataset_arrow_types(new_sigs)[id_col]
    if km_tbls:
        km = pa.concat_tables(km_tbls).combine_chunks()
        km = pa.table(
            {"node": pc.cast(km["node"].combine_chunks(), id_type),
             "keep_id": pc.cast(km["keep_id"].combine_chunks(), id_type)}
        )
    else:
        km = pa.table({"node": pa.nulls(0, id_type), "keep_id": pa.nulls(0, id_type)})
    km_ref = ray.put(km)
    prior_set_ref = prior_ref

    def annotate(t: pa.Table) -> pa.Table:
        m = _get_broadcast(km_ref)
        anchors = _get_broadcast(prior_set_ref)
        idx = pc.index_in(t[id_col], value_set=m["node"].combine_chunks())
        keep = safe_coalesce(pc.take(m["keep_id"].combine_chunks(), idx), t[id_col])
        is_self = pc.equal(keep, t[id_col])
        is_prior = (
            pc.is_in(keep, value_set=anchors)
            if len(anchors)
            else pa.array(np.zeros(t.num_rows, dtype=bool))
        )
        status = pc.if_else(
            is_self,
            pa.scalar("unique"),
            pc.if_else(is_prior, pa.scalar("dup_prior"), pa.scalar("dup_snapshot")),
        )
        return pa.table({id_col: t[id_col], "keep_id": keep, "status": status})

    assignment = new_sigs.select_columns([id_col]).map_batches(
        annotate, batch_format="pyarrow"
    ).materialize()

    # ---- 7. commit survivors' sigs + band rows as this snapshot's generation
    def survivor_sigs(t: pa.Table) -> pa.Table:
        m = _get_broadcast(km_ref)
        idx = pc.index_in(t[id_col], value_set=m["node"].combine_chunks())
        keep = safe_coalesce(pc.take(m["keep_id"].combine_chunks(), idx), t[id_col])
        t = t.filter(pc.equal(keep, t[id_col]))
        b = stable_hash(np.asarray(t[id_col].to_pylist(), dtype=object)) % num_buckets
        return t.append_column("__bkt", pa.array(b.astype(np.int64), pa.int64()))

    surv = new_sigs.map_batches(survivor_sigs, batch_format="pyarrow")
    _write_generation(surv, sigs_root, snapshot_id)

    def survivor_bands(t: pa.Table) -> pa.Table:
        m = _get_broadcast(km_ref)
        idx = pc.index_in(t[id_col], value_set=m["node"].combine_chunks())
        keep = safe_coalesce(pc.take(m["keep_id"].combine_chunks(), idx), t[id_col])
        t = t.filter(pc.equal(keep, t[id_col]))
        return pa.table(
            {
                "band": t["band"],
                "key": t["key"],
                id_col: t[id_col],
                "__bkt": t["bucket"],
            }
        )

    _write_generation(
        new_bands.map_batches(survivor_bands, batch_format="pyarrow"), bands_root, snapshot_id
    )
    return assignment


# ---------------------------------------------------------- bloom membership
def incremental_bloom_dedup(
    new_ds,
    store_dir: str,
    snapshot_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits_per_bucket: int = 1 << 22,
    n_hashes: int = 4,
    num_buckets: int | None = None,
):
    """Approximate incremental dedup via a persisted Bloom membership filter
    (Bloom, CACM 1970) — the CONSTANT-BITS-PER-DOC tier below
    :func:`incremental_exact_dedup`: the exact store pays ~16 bytes/novel
    doc (hash + keep_id); the Bloom sidecar pays ``n_hashes`` BITS, so a
    10^12-page frontier membership test fits a few hundred GB of bitmap
    where the exact store needs tens of TB.  The trade is one-sided error:
    NO false negatives (a stored duplicate is always caught) but false
    positives — novel docs wrongly dropped at rate
    ``(1 - exp(-k*n/m))**k`` (k=n_hashes, n keys per shard, m
    bits_per_bucket) — the standard crawl-frontier contract.

    Store layout mirrors the exact store (same bucket key, immutable
    per-snapshot generations, atomic rename, idempotent re-runs):

        store_dir/bloom/snap-<id>/__bkt=<k>/*.parquet   (bit,)  [sorted u32]

    Generations hold SPARSE sorted bit indices; a bucket task ORs prior
    generations into one dense ``bits_per_bucket`` bitmap (numpy), tests its
    batch, and emits only its own novel bits as the new generation — prior
    snapshots are read as bit lists, never re-shuffled.

    Returns ``(doc_id, status)`` over the new snapshot: ``new`` (kept;
    its bits committed), ``dup_snapshot`` (same content seen earlier in THIS
    snapshot, exact within-snapshot check — no error), or ``probably_seen``
    (Bloom hit against prior snapshots; false-positive rate as above).
    """
    root = os.path.join(store_dir, "bloom")
    num_buckets = _store_buckets(root, num_buckets, new_ds)
    k = int(n_hashes)
    m = int(bits_per_bucket)

    def add_hash(t: pa.Table) -> pa.Table:
        texts = np.asarray(t[text_col].to_pylist(), dtype=object)
        if len(texts):
            texts = np.where(pd.isna(texts), "", texts)
        hs = pd.util.hash_array(texts).astype(np.uint64)
        return pa.table({
            id_col: t[id_col],
            "h": pa.array(hs.astype(np.int64), pa.int64()),
            "bucket": pa.array((hs % np.uint64(num_buckets)).astype(np.int64),
                               pa.int64()),
        })

    def _positions(h: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing (Kirsch-Mitzenmacher:
        g_i = h1 + i*h2 keeps Bloom error bounds with two base hashes)."""
        h = h.astype(np.uint64)
        h1 = h * np.uint64(0x9E3779B97F4A7C15)
        h1 ^= h1 >> np.uint64(29)
        h2 = (h * np.uint64(0xBF58476D1CE4E5B9)) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m)).astype(np.int64)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        bucket = int(df["bucket"].iloc[0])
        # within-snapshot exact dedup first (no approximation inside a run)
        first = ~df.duplicated("h")
        prior = _read_shard(root, bucket, snapshot_id, ["bit"])
        bitmap = np.zeros(m, dtype=bool)
        if prior is not None and prior.num_rows:
            bitmap[prior["bit"].to_numpy(zero_copy_only=False)] = True
        pos = _positions(df["h"].to_numpy())
        seen = bitmap[pos].all(axis=1)
        status = np.where(~first, "dup_snapshot",
                          np.where(seen, "probably_seen", "new"))
        new_mask = status == "new"
        new_bits = np.unique(pos[new_mask].ravel()) if new_mask.any() else \
            np.array([], dtype=np.int64)
        out = pd.DataFrame({id_col: df[id_col], "status": status,
                            "bucket": bucket})
        # novel bits ride along as extra rows (id NULL) for the delta pass
        if len(new_bits):
            bits_rows = pd.DataFrame({
                id_col: pd.array([None] * len(new_bits),
                                 dtype=out[id_col].dtype if
                                 out[id_col].dtype == object else "Int64"),
                "status": "__bit", "bucket": bucket})
            bits_rows["bit"] = new_bits
            out["bit"] = -1
            out = pd.concat([out, bits_rows], ignore_index=True)
        else:
            out["bit"] = -1
        return out

    resolved = (
        new_ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .materialize()
    )

    def delta(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "__bit"))
        return pa.table({"bit": pc.cast(t["bit"], pa.int64()),
                         "__bkt": t["bucket"]})

    _write_generation(resolved.map_batches(delta, batch_format="pyarrow"),
                      root, snapshot_id)

    def assignments(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["status"], "__bit")))
        return t.select([id_col, "status"])

    return resolved.map_batches(assignments, batch_format="pyarrow")
