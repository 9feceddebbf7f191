"""Pairwise scoring — stateful ``map_batches`` stage (reference
``Dedupe.score``, T3).

The reference scores pair streams with a trained logistic model over
per-field distances, fanned out over ``num_cores`` subprocesses
(mysql_example/mysql_example.py:269-271, num_cores mysql_example.py:118,134).
Here it is a ``map_batches`` stage over Arrow batches: the settings artifact
(weights + comparators) and the broadcast record/IDF tables load once per
worker (task mode with a per-process cache — reuses the session's warm
worker pool — or a classic actor pool with ``use_actors=True``); each call
computes a feature matrix per batch with batched kernels (L2-slab
Levenshtein/Gotoh DPs, token-signature cosine, whole-column Arrow equality)
and applies the logistic model vectorized.

Pair hydration strategies (record fields -> slim id pairs), smallest working
set first: ``records=`` broadcast Arrow table (zero-copy per worker, fits-
one-node regime), ``semi_hydrate`` (bounded candidate sets, no shuffle),
``bucketed_hydrate`` (partition-aligned cogroup — nothing global anywhere,
the 100-TB path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import Settings, sigmoid
from .distances import (
    affine_gap_sim,  # noqa: F401 — scalar reference, kept for plugins/tests
    batch_affine_gap_sim,
    batch_jaro_winkler,
    batch_levenshtein_sim,
    batch_token_sig_cosine,
    cosine_tokens,
    exact_sim,
    haversine_sim,
    jaccard,
    list_array_view,
    price_sim,
    tokens,
)


# Plugin comparators (reference 2.10 extension surface: third-party field
# variables like WesternName/USAddress, officers.py:12-15,108-118).
# register_comparator("my_name", fn) where fn(a_list, b_list) -> np.ndarray
# of similarities in [0,1]; then Field(column, comparator="my_name").
COMPARATOR_REGISTRY: dict = {}


def register_comparator(name: str, fn) -> None:
    COMPARATOR_REGISTRY[name] = fn


class PairScorer:
    """Callable class for ``map_batches(PairScorer, concurrency=N)``.

    Input batches: columns ``id_a, id_b, {field}_a, {field}_b`` (denormalized
    by pair generation).  Output: ``id_a, id_b, score``.
    """

    def __init__(self, settings_json: str, idf_ref=None, keep_features: bool = False,
                 records_ref=None, progress_ref=None):
        self.settings = Settings.from_json(settings_json)
        self.keep_features = keep_features
        self.progress_ref = progress_ref
        self.idf: dict | None = None
        if idf_ref is not None:
            try:
                import ray

                if isinstance(idf_ref, ray.ObjectRef):
                    idf_ref = ray.get(idf_ref)
            except ImportError:
                pass
            self.idf = dict(idf_ref)
        # Broadcast hydration: pairs arrive slim (ids only) and field values
        # are looked up here, so the pair shuffles never move record payloads.
        # The broadcast is an Arrow TABLE (ray.put once): ray.get is
        # zero-copy from the object store, so memory/deserialize cost does
        # NOT grow with the actor count (a Python-dict broadcast would).
        # Legacy (col_index, {id: tuple}) dict maps are still accepted.
        self.records: dict | None = None
        self._col_index: dict | None = None
        self.rec_tbl = None
        self._rec_ids = None
        if records_ref is not None:
            try:
                import ray

                if isinstance(records_ref, ray.ObjectRef):
                    records_ref = ray.get(records_ref)
                if isinstance(records_ref, list):
                    # broadcast-by-reference (record_map_refs): a list of
                    # projected block refs.  Each worker reads its zero-copy
                    # plasma view and concats locally ONCE — the driver never
                    # pulled the record bytes at all.
                    blocks = ray.get(records_ref) if records_ref else []
                    records_ref = pa.concat_tables(blocks) if blocks else None
            except ImportError:
                pass
            if isinstance(records_ref, pa.Table):
                self.rec_tbl = records_ref.combine_chunks()
                self._rec_id_col = self.rec_tbl.column_names[0]
                self._rec_ids = self.rec_tbl[self._rec_id_col].combine_chunks()
                # hash index built ONCE per worker (pd.Index over the id
                # column) — per-batch pc.index_in would rebuild the value-set
                # hash per call, which dominates the score stage once the
                # record table passes ~1M rows.  The cap matches the byte-
                # budgeted broadcast regime (BROADCAST_ROWS_HARD_CAP): an
                # int64-uid index at 20M rows is ~300 MB/worker, and the
                # 6.26M-page soak showed the per-batch index_in rebuild
                # dominating the score stage once the old 2M cap was passed.
                self._rec_index = None
                if self.rec_tbl.num_rows <= 20_000_000:
                    import pandas as pd

                    self._rec_index = pd.Index(self._rec_ids.to_pandas())
            else:
                self._col_index, self.records = records_ref
        self._w = self.settings.weight_vector()
        self._names = self.settings.feature_names()
        # hash-keyed IDF map for the token_cosine comparator (signatures carry
        # token hashes, not strings); built lazily per signature hash WIDTH —
        # 32-bit signatures truncate to the low word, so the keys must too
        self._idf_hash_by_bits: dict = {}

    def _idf_hash(self, bits: int):
        if not self.idf:
            return None
        got = self._idf_hash_by_bits.get(bits)
        if got is None:
            import pandas as pd

            keys = np.asarray(list(self.idf.keys()), dtype=object)
            hk = pd.util.hash_array(keys).astype(np.uint64)
            if bits == 32:
                hk = hk.astype(np.uint32)
            got = {int(h): float(self.idf[k]) for h, k in zip(hk, keys)}
            self._idf_hash_by_bits[bits] = got
        return got

    def _field_sim(self, comparator: str, a_list, b_list) -> np.ndarray:
        if comparator == "string":
            return batch_levenshtein_sim(a_list, b_list)
        if comparator == "jaro_winkler":
            return batch_jaro_winkler(a_list, b_list)
        if comparator == "affine_gap":
            return batch_affine_gap_sim(a_list, b_list)
        if comparator == "text":
            # memoize tokenization per distinct string — a cluster of k
            # records contributes O(k^2) pairs but only k distinct values
            cache: dict = {}

            def tok(s):
                v = cache.get(s)
                if v is None:
                    v = tokens(s)
                    cache[s] = v
                return v

            out = np.empty(len(a_list), dtype=np.float64)
            for i, (x, y) in enumerate(zip(a_list, b_list)):
                if x and x == y:
                    out[i] = 1.0
                else:
                    out[i] = cosine_tokens(tok(x), tok(y), self.idf)
            return out
        if comparator in ("exact", "categorical"):
            return np.array([exact_sim(a, b) for a, b in zip(a_list, b_list)])
        if comparator == "price":
            return np.array(
                [price_sim(a, b) if a is not None and b is not None else 0.0 for a, b in zip(a_list, b_list)]
            )
        if comparator == "set":
            return np.array(
                [
                    jaccard(frozenset(a), frozenset(b)) if a and b else 0.0
                    for a, b in zip(a_list, b_list)
                ]
            )
        if comparator == "latlong":
            out = np.zeros(len(a_list))
            for i, (a, b) in enumerate(zip(a_list, b_list)):
                if a is not None and b is not None:
                    out[i] = haversine_sim(a["lat"], a["lng"], b["lat"], b["lng"])
            return out
        if comparator in COMPARATOR_REGISTRY:
            return COMPARATOR_REGISTRY[comparator](a_list, b_list)
        # shipped plugins register on import; lazily import them so worker
        # processes resolve plugin comparators without driver-side setup
        from . import plugins  # noqa: F401

        if comparator in COMPARATOR_REGISTRY:
            return COMPARATOR_REGISTRY[comparator](a_list, b_list)
        raise ValueError(f"unknown comparator {comparator!r}")

    def _gather(self, batch: pa.Table) -> dict:
        """Per-field column pairs — Arrow arrays where possible (zero Python
        materialization until a comparator actually needs pylists) — from
        denormalized columns or from the broadcast record table/map."""
        import pyarrow.compute as pc

        out: dict = {}
        if self.rec_tbl is not None:
            if self._rec_index is not None:
                ia = self._rec_index.get_indexer(batch["id_a"].to_pandas())
                ib = self._rec_index.get_indexer(batch["id_b"].to_pandas())

                def _idx(v):  # typed so an all-miss batch doesn't infer null
                    return pa.array(
                        [None if i < 0 else int(i) for i in v] if (v < 0).any() else v,
                        type=pa.int64(),
                    )

                idx_a = _idx(ia)
                idx_b = _idx(ib)
            else:
                idx_a = pc.index_in(batch["id_a"], value_set=self._rec_ids)
                idx_b = pc.index_in(batch["id_b"], value_set=self._rec_ids)
            rows_a = self.rec_tbl.take(idx_a)
            rows_b = self.rec_tbl.take(idx_b)
            for col in self.rec_tbl.column_names[1:]:
                out[col] = (rows_a[col], rows_b[col])
            return out
        if self.records is None:
            for f in self.settings.fields:
                if f.column in out:
                    continue
                out[f.column] = (batch[f"{f.column}_a"], batch[f"{f.column}_b"])
            return out
        rec = self.records
        ta = [rec.get(i) for i in batch["id_a"].to_pylist()]
        tb = [rec.get(i) for i in batch["id_b"].to_pylist()]
        for col, j in self._col_index.items():
            out[col] = (
                [None if t is None else t[j] for t in ta],
                [None if t is None else t[j] for t in tb],
            )
        return out

    @staticmethod
    def _as_list_view(v, length_hint: int):
        """Arrow list array (or python list of lists) -> (offs, vals, lens)."""
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return list_array_view(v)
        return list_array_view(pa.array(v, pa.list_(pa.uint64())))

    def features(self, batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        n = batch.num_rows
        feats: dict[str, np.ndarray] = {}
        gathered = self._gather(batch)
        pyl_cache: dict = {}

        def pyl(col):
            if col not in pyl_cache:
                aa, bb = gathered[col]
                to_l = lambda v: v.to_pylist() if isinstance(v, (pa.Array, pa.ChunkedArray)) else v
                pyl_cache[col] = (to_l(aa), to_l(bb))
            return pyl_cache[col]

        for f in self.settings.fields:
            aa, bb = gathered[f.column]
            if f.comparator == "token_cosine":
                oa, va, la = self._as_list_view(aa, n)
                ob, vb, lb = self._as_list_view(bb, n)
                missing = (la == 0) | (lb == 0)
                if len(va) and len(vb) and va.dtype != vb.dtype:
                    # mixed signature widths (e.g. a persisted 64-bit index
                    # meeting 32-bit fresh signatures) would silently
                    # intersect to zero matches — fail loudly instead
                    raise ValueError(
                        f"token_cosine signature width mismatch on "
                        f"'{f.column}': {va.dtype} vs {vb.dtype}; rebuild the "
                        f"stale side (SIG_BITS_DEFAULT governs fresh builds)"
                    )
                bits = 32 if va.dtype == np.uint32 else 64
                sim = batch_token_sig_cosine(
                    oa, va, la, ob, vb, lb, self._idf_hash(bits)
                )
            elif f.comparator in ("exact", "categorical") and isinstance(
                aa, (pa.Array, pa.ChunkedArray)
            ):
                # whole-column Arrow equality; ''/null = missing (parity with
                # the scalar path below)
                def miss_mask(v):
                    m = v.is_null()
                    if pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
                        m = pc.or_(m, pc.fill_null(pc.equal(v, ""), False))
                    return m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m

                missing = pc.or_(miss_mask(aa), miss_mask(bb)).to_numpy(zero_copy_only=False)
                sim = (
                    pc.fill_null(pc.equal(aa, bb), False)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                )
            elif f.comparator == "price" and isinstance(
                aa, (pa.Array, pa.ChunkedArray)
            ):
                # whole-column arithmetic (nulls -> NaN -> missing); the last
                # per-row Python loop in a scoring path, vectorized
                from .distances import batch_price_sim

                va = pc.cast(aa, pa.float64()).to_numpy(zero_copy_only=False)
                vb = pc.cast(bb, pa.float64()).to_numpy(zero_copy_only=False)
                missing = np.isnan(va) | np.isnan(vb)
                sim = batch_price_sim(va, vb)
            else:
                a_list, b_list = pyl(f.column)
                sim = self._field_sim(f.comparator, a_list, b_list)
                missing = np.array(
                    [a is None or b is None or a == "" or b == "" for a, b in zip(a_list, b_list)]
                )
            sim = np.where(missing, 0.0, sim)
            feats[f.feature] = sim
            if f.has_missing:
                feats[f.feature + "__missing"] = np.asarray(missing, dtype=np.float64)
        for a, b in self.settings.interactions:
            feats[f"{a}*{b}"] = feats[a] * feats[b]
        X = np.zeros((n, len(self._names)))
        for j, name in enumerate(self._names):
            X[:, j] = feats[name]
        return X

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = self.features(batch)
        score = sigmoid(X @ self._w + self.settings.bias)
        cols = {
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "score": pa.array(score, pa.float64()),
        }
        if self.keep_features:
            for j, name in enumerate(self._names):
                cols["f_" + name.replace("*", "_x_")] = pa.array(X[:, j], pa.float64())
        if self.progress_ref is not None and batch.num_rows:
            self.progress_ref.add.remote(batch.num_rows)  # fire-and-forget
        return pa.table(cols)


def make_score_progress(every: int = 10_000):
    """Reference-parity scoring progress stream (M13): mysql_example.py:41-42
    prints a line every 10,000 scored pairs.  Returns a zero-CPU counter
    actor; scorer batches fire-and-forget their pair counts into it and the
    actor logs each time the cumulative total crosses a multiple of
    ``every``.  Read the running/final total with ``ray.get(h.total.remote())``.
    """
    import ray

    @ray.remote(num_cpus=0)
    class ScoreProgress:
        def __init__(self, every: int):
            self.every = max(1, int(every))
            self.n = 0
            self._next = self.every

        def add(self, k: int) -> None:
            self.n += int(k)
            if self.n >= self._next:
                import logging

                logging.getLogger("dedupe_examples_ray.progress").info(
                    "%d pairs scored", self.n
                )
                while self._next <= self.n:
                    self._next += self.every

        def total(self) -> int:
            return self.n

    return ScoreProgress.remote(every)


# Per-worker-process scorer cache: task-based scoring reuses the session's
# already-warm worker pool (no actor-pool cold start — measured ~10-15 s of
# fixed cost per run on a 32-CPU node) while keeping the build-once-per-worker
# property of the actor pattern.  Keyed on the broadcast refs' hex (stable
# across tasks) + the settings payload.
_SCORER_CACHE: dict = {}


def _score_batch_cached(
    t: pa.Table, settings_json, idf_ref, keep_features, records_ref, progress_ref=None
):
    def _k(ref):
        if isinstance(ref, list):  # block-ref broadcast: stable across tasks
            return tuple(r.hex() if hasattr(r, "hex") else id(r) for r in ref)
        return ref.hex() if hasattr(ref, "hex") else id(ref)

    key = (settings_json, _k(idf_ref), _k(records_ref), keep_features)
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        scorer = PairScorer(settings_json, idf_ref, keep_features, records_ref)
        _SCORER_CACHE[key] = scorer
    out = scorer(t)
    if progress_ref is not None and t.num_rows:
        progress_ref.add.remote(t.num_rows)  # fire-and-forget, off the hot path
    return out


def score_pairs(
    pairs_ds,
    settings: Settings,
    idf: dict | None = None,
    concurrency: int | tuple | None = None,
    batch_size: int | None = None,
    keep_features: bool = False,
    records=None,
    use_actors: bool = False,
    n_records_hint: int = 0,
    progress=None,
):
    """Score a candidate-pair Dataset -> (id_a, id_b, score) Dataset.

    ``records``: optional Arrow record table / ``(col_index, {id: tuple})``
    map (or a ray ref) enabling slim-pair scoring — see PairScorer.
    Default execution is task-based with a per-worker scorer cache (reuses the
    warm worker pool); ``use_actors=True`` restores the dedicated actor pool
    (useful when scorer state is too big to keep per generic worker).
    ``progress``: optional counter actor from :func:`make_score_progress`
    (M13 — the reference's every-10k-pairs progress stream,
    mysql_example.py:41-42); each scored batch reports its pair count.
    """
    import ray

    idf_ref = None
    if idf is not None:
        idf_ref = idf if isinstance(idf, ray.ObjectRef) else ray.put(idf)
    records_ref = None
    n_rec = n_records_hint
    if records is not None:
        if isinstance(records, pa.Table):
            n_rec = records.num_rows
        if isinstance(records, list):
            # block-ref broadcast — refs are tiny, ride in fn_kwargs as-is
            records_ref = records
        else:
            records_ref = records if isinstance(records, ray.ObjectRef) else ray.put(records)
    if batch_size is None:
        # big record tables amortize the per-batch index_in hash build with
        # larger batches; small tables keep cache-friendly batches
        batch_size = 65536 if n_rec > 300_000 else 8192
    kwargs = dict(
        settings_json=settings.to_json(),
        idf_ref=idf_ref,
        keep_features=keep_features,
        records_ref=records_ref,
        progress_ref=progress,
    )
    if use_actors:
        return pairs_ds.map_batches(
            PairScorer,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency or (1, 4),
        )
    return pairs_ds.map_batches(
        _score_batch_cached,
        fn_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def build_record_map(records_ds, id_col: str, cols: list[str]) -> pa.Table:
    """Arrow record table (id first) for zero-copy broadcast hydration.

    Collected once on the driver, ``ray.put`` once; actors map it back
    zero-copy and look ids up with ``pc.index_in`` — per-actor memory does
    not scale with the record count the way a Python dict would.
    """
    import pyarrow as _pa

    tbls = []
    for b in records_ds.select_columns([id_col] + cols).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        if b.num_rows:  # zero-row source blocks can carry an empty schema
            tbls.append(b)
    if not tbls:
        return _pa.table({c: _pa.array([], _pa.string()) for c in [id_col] + cols})
    return _pa.concat_tables(tbls).combine_chunks()


def _consolidate_record_blocks(*blocks):
    import pyarrow as _pa

    # sources like read_binary_files emit zero-row blocks with an EMPTY
    # schema; concat_tables treats those as a schema mismatch — drop them
    # (same guard as pipelines.dedupe.count_distinct_uids)
    live = [b for b in blocks if b.num_rows]
    if not live:
        # prefer a TYPED empty block — a zero-column pa.table({}) schema
        # breaks downstream concat/schema-dedup paths
        for b in blocks:
            if b.num_columns:
                return b
        return blocks[0] if blocks else _pa.table({})
    return _pa.concat_tables(live).combine_chunks()


def record_map_ref(records_ds, id_col: str, cols: list[str]):
    """Broadcast record map built OFF the driver: the projection materializes
    in parallel, one remote task concats+combines the blocks into a single
    contiguous plasma object (overlapping the blocking/pair stages — the
    scorer only blocks on it when the first score batch runs), and every
    scorer worker maps that object zero-copy (``combine_chunks`` on an
    already-contiguous table is a no-op).

    Replaces build_record_map's driver-serial pull+concat (~1.4 s at 625k
    records) in the flagship pipelines; build_record_map remains for callers
    that need the table on the driver (gazetteer index concat).
    """
    import ray

    refs = records_ds.select_columns([id_col] + cols).materialize().to_arrow_refs()
    if not refs:
        return ray.put(pa.table({c: pa.array([], pa.string()) for c in [id_col] + cols}))
    return ray.remote(num_cpus=1)(_consolidate_record_blocks).remote(*refs)


def bucketed_hydrate(
    pairs_ds,
    records_ds,
    id_col: str,
    cols: list[str],
    num_buckets: int | None = None,
    pair_schema: list[tuple] | None = None,
    rec_types: dict | None = None,
):
    """Partition-aligned pair hydration — the 100-TB scale path.

    Replaces both the driver-collected broadcast record map (DRAM-ceiling at
    large record counts) and the generic ``Dataset.join`` fallback: pairs and
    records are bucketed on the SAME ``stable_hash(id) % B`` key and co-grouped
    so each hydration task reads exactly one record shard — per-task working
    set is |records|/B regardless of cluster size, and no task ever touches a
    global table.  Two phases (side a, then side b); each is one bucketed
    shuffle with a vectorized pandas indexer inside the group.

    ``pair_schema``: [(name, pyarrow type)] of the pair columns; defaults to
    id_a/id_b typed like the record id.  Passed explicitly so no intermediate
    ``Dataset.schema()`` call forces execution mid-pipeline.

    Output: pair columns + ``{col}_a`` / ``{col}_b`` for each hydrated col.
    ``num_buckets`` defaults via ``scale.resolve_buckets`` over both inputs.
    """
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, pairs_ds, records_ds)
    from .pairs import stable_hash

    # rec_types: pass the record column types when records_ds is a LAZY view
    # (e.g. a per-wave semi-filter) — a schema probe there would execute a
    # pipeline fragment per call
    rec_type = rec_types if rec_types is not None else dataset_arrow_types(records_ds)
    id_type = rec_type[id_col]
    if pair_schema is None:
        pair_schema = [("id_a", id_type), ("id_b", id_type)]
    rec_proj = records_ds.select_columns([id_col] + cols)

    def one_side(pairs, side: str, pair_schema: list[tuple]):
        out_schema = pair_schema + [(f"{c}_{side}", rec_type[c]) for c in cols]
        pair_cols = [n for n, _ in pair_schema]
        all_types = dict(out_schema)

        def tag_records(t: pa.Table) -> pa.Table:
            b = stable_hash(t[id_col].to_numpy(zero_copy_only=False)) % num_buckets
            n = t.num_rows
            data = {"__k": pc_cast(t[id_col], id_type)}
            for name, typ in pair_schema:
                data[name] = pa.nulls(n, typ)
            for c in cols:
                data[f"{c}_{side}"] = pc_cast(t[c], rec_type[c])
            data["__bkt"] = pa.array(b.astype("int64"), pa.int64())
            data["__kind"] = pa.array(np.zeros(n, np.int8))
            return pa.table(data)

        def tag_pairs(t: pa.Table) -> pa.Table:
            b = stable_hash(t[f"id_{side}"].to_numpy(zero_copy_only=False)) % num_buckets
            n = t.num_rows
            data = {"__k": pa.nulls(n, id_type)}
            for name, typ in pair_schema:
                data[name] = pc_cast(t[name], typ)
            for c in cols:
                data[f"{c}_{side}"] = pa.nulls(n, rec_type[c])
            data["__bkt"] = pa.array(b.astype("int64"), pa.int64())
            data["__kind"] = pa.array(np.ones(n, np.int8))
            return pa.table(data)

        recs = rec_proj.map_batches(tag_records, batch_format="pyarrow")
        prs = pairs.map_batches(tag_pairs, batch_format="pyarrow")

        def hydrate(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            kind = t["__kind"]
            rec = t.filter(pc.equal(kind, 0))
            pr = t.filter(pc.equal(kind, 1))
            if pr.num_rows == 0:
                return pa.table({n: pa.nulls(0, ty) for n, ty in out_schema})
            # index_in returns the FIRST match, so duplicate record ids (bad
            # input) degrade to keep-first instead of failing
            idx = pc.index_in(pr[f"id_{side}"], value_set=rec["__k"].combine_chunks())
            arrays = {name: pr[name] for name, _ in pair_schema}
            for c in cols:
                arrays[f"{c}_{side}"] = pc.take(rec[f"{c}_{side}"].combine_chunks(), idx)
            return pa.table(arrays)

        out = prs.union(recs).groupby("__bkt").map_groups(hydrate, batch_format="pyarrow")
        return out, out_schema

    out, sch = one_side(pairs_ds, "a", pair_schema)
    out, _ = one_side(out, "b", sch)
    return out


def pc_cast(arr, typ):
    import pyarrow.compute as pc

    return arr if arr.type == typ else pc.cast(arr, typ)


def dataset_arrow_types(ds) -> dict:
    """{column: pyarrow DataType} for a Dataset — Ray's ``Schema.types`` may
    hold Python classes for object-typed blocks; prefer the Arrow base schema
    and fall back to inference."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out = {}
    for nm, t in zip(sch.names, sch.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, ValueError, pa.ArrowNotImplementedError):
                t = pa.string()
        out[nm] = t
    return out


def shard_records_to_store(
    records_ds, id_col: str, cols: list[str], store_dir: str,
    num_buckets: int | None = None
) -> str:
    """Write a bucket-partitioned Parquet record store: one hive partition
    per ``stable_hash(id) % num_buckets``.

    This is the partition-aligned hydration SUBSTRATE for the 100-TB regime:
    the record table is written once, partitioned on the same key the pair
    shuffle uses, and each scorer group then reads exactly its own shard
    from storage — no record shuffle per run, no per-node copy of a global
    table, resumable by construction (north rule: partitioned output).
    Size ``num_buckets`` to O(record_bytes / target shard size) at scale
    (defaults via ``scale.resolve_buckets``); the chosen count is persisted in
    ``<store_dir>/_NUM_BUCKETS`` so ``score_pairs_sharded`` aligns to the
    store's layout, not to its own input estimate.
    """
    import os

    from .pairs import stable_hash
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, records_ds)
    os.makedirs(store_dir, exist_ok=True)
    with open(os.path.join(store_dir, "_NUM_BUCKETS"), "w") as f:
        f.write(str(num_buckets))

    def add(t: pa.Table) -> pa.Table:
        b = stable_hash(t[id_col].to_numpy(zero_copy_only=False)) % num_buckets
        return t.select([id_col] + cols).append_column(
            "__bkt", pa.array(b.astype("int64"), pa.int64())
        )

    records_ds.map_batches(add, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["__bkt"]
    )
    return store_dir


# per-worker shard cache: (store_dir, bucket) -> (pd.Index, pa.Table); small
# LRU so a worker that serves several buckets doesn't hold the whole store
_SHARD_CACHE: dict = {}
_SHARD_CACHE_CAP = 8


def _read_shard(store_dir: str, bucket: int, id_col: str):
    import pandas as pd
    import pyarrow.parquet as pq

    key = (store_dir, bucket)
    got = _SHARD_CACHE.get(key)
    if got is None:
        import os

        path = os.path.join(store_dir, f"__bkt={bucket}")
        if os.path.isdir(path):
            tbl = pq.read_table(path)
        else:  # empty bucket
            tbl = None
        idx = pd.Index(tbl[id_col].to_pandas()) if tbl is not None else None
        if len(_SHARD_CACHE) >= _SHARD_CACHE_CAP:
            _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
        _SHARD_CACHE[key] = got = (idx, tbl)
    return got


def _attach_side(t: pa.Table, store_dir: str, id_col: str, cols: list[str], side: str) -> pa.Table:
    """Attach ``{col}_{side}`` from the store shard this group is aligned to."""
    import pyarrow.compute as pc

    bkt = int(t["__bkt"][0].as_py())
    idx, shard = _read_shard(store_dir, bkt, id_col)
    out = {n: t[n] for n in t.column_names if n != "__bkt"}
    if shard is None:
        for c in cols:
            out[f"{c}_{side}"] = pa.nulls(t.num_rows)
        return pa.table(out)
    pos = idx.get_indexer(t[f"id_{side}"].to_pandas())
    take = pa.array([None if p < 0 else p for p in pos] if (pos < 0).any() else pos)
    for c in cols:
        out[f"{c}_{side}"] = pc.take(shard[c].combine_chunks(), take)
    return pa.table(out)


def score_pairs_sharded(
    pairs_ds,
    store_dir: str,
    settings: Settings,
    id_col: str,
    cols: list[str],
    idf: dict | None = None,
    num_buckets: int | None = None,
    keep_features: bool = False,
    progress=None,
):
    """Score slim (id_a, id_b) pairs against a bucket-partitioned record
    store (``shard_records_to_store``) — the storage-partition-aligned path.

    Two bucketed pair shuffles, ZERO record shuffles: phase a groups pairs on
    hash(id_a) and attaches a-side fields from the aligned shard; phase b
    groups on hash(id_b), attaches b-side fields, and SCORES inside the same
    group so only slim (id_a, id_b, score) rows leave the stage.  Per-task
    working set = one shard (records/num_buckets), independent of corpus and
    cluster size.
    """
    if num_buckets is None:
        import os

        meta = os.path.join(store_dir, "_NUM_BUCKETS")
        num_buckets = int(open(meta).read()) if os.path.exists(meta) else 64
    import ray

    from .pairs import stable_hash

    idf_ref = None
    if idf is not None:
        idf_ref = idf if isinstance(idf, ray.ObjectRef) else ray.put(idf)
    settings_json = settings.to_json()

    def bucket_by(side):
        def fn(t: pa.Table) -> pa.Table:
            b = stable_hash(t[f"id_{side}"].to_numpy(zero_copy_only=False)) % num_buckets
            if "__bkt" in t.column_names:
                t = t.drop_columns(["__bkt"])
            return t.append_column("__bkt", pa.array(b.astype("int64"), pa.int64()))

        return fn

    def phase_a(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["__bkt"]) if "__bkt" in t.column_names else t
        return _attach_side(t, store_dir, id_col, cols, "a")

    def phase_b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id_a": pa.nulls(0, pa.string()), "id_b": pa.nulls(0, pa.string()),
                 "score": pa.array([], pa.float64())}
            )
        hydrated = _attach_side(t, store_dir, id_col, cols, "b")
        scorer = _score_batch_cached  # per-worker scorer cache
        out = []
        n = hydrated.num_rows
        for o in range(0, n, 65536):
            out.append(scorer(hydrated.slice(o, 65536), settings_json, idf_ref,
                              keep_features, None, progress))
        return pa.concat_tables(out)

    a_done = (
        pairs_ds.map_batches(bucket_by("a"), batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(phase_a, batch_format="pyarrow")
    )
    return (
        a_done.map_batches(bucket_by("b"), batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(phase_b, batch_format="pyarrow")
    )


def semi_hydrate(pairs_ds, records_ds, id_col: str, cols: list[str]):
    """Bounded-candidate hydration fast path (no shuffles).

    For SMALL pair sets (LSH candidates after banding are the small side, the
    way thresholded edges are), the cogroup's two sort-shuffles are pure
    overhead.  Instead: pull the pairs (bounded by candidate count, like the
    driver CC edge pull — NOT a corpus collect), semi-join-filter the record
    table down to only referenced ids (streaming pass, is_in mask), pull that
    bounded subset, and hydrate with two vectorized takes.  Corpus size never
    bounds driver memory — candidate count does; callers switch to
    ``bucketed_hydrate`` above a pair budget.
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    tbls = list(pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tbls:
        return pairs_ds
    pairs_tbl = pa.concat_tables(tbls).combine_chunks()
    ids = pc.unique(
        pa.concat_arrays(
            [pairs_tbl["id_a"].combine_chunks(), pairs_tbl["id_b"].combine_chunks()]
        )
    )
    ids_ref = ray.put(ids)

    def flt(t: pa.Table) -> pa.Table:
        vs = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
        mask = pc.is_in(t[id_col], value_set=vs)
        return t.select([id_col] + cols).filter(mask)

    sub_tbls = list(
        records_ds.map_batches(flt, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    rec_type = dataset_arrow_types(records_ds)
    if sub_tbls:
        sub = pa.concat_tables(sub_tbls).combine_chunks()
    else:
        sub = pa.table({c: pa.nulls(0, rec_type[c]) for c in [id_col] + cols})
    out_cols = {n: pairs_tbl[n] for n in pairs_tbl.column_names}
    for side in ("a", "b"):
        idx = pc.index_in(pairs_tbl[f"id_{side}"], value_set=sub[id_col].combine_chunks())
        for c in cols:
            out_cols[f"{c}_{side}"] = pc.take(sub[c].combine_chunks(), idx)
    return rd.from_arrow(pa.table(out_cols))


def hydrate_pairs(pairs_ds, records_ds, id_col: str, cols: list[str], num_partitions: int = 32):
    """Scale path: attach both sides' fields via two partitioned hash joins
    (reference J2 hydration, mysql_example.py:261-262) — used when the record
    map exceeds the broadcast budget."""
    import pyarrow as pa

    def rename(side: str):
        def fn(t: pa.Table) -> pa.Table:
            mapping = {id_col: f"id_{side}", **{c: f"{c}_{side}" for c in cols}}
            return t.rename_columns([mapping.get(c, c) for c in t.column_names])

        return fn

    base = records_ds.select_columns([id_col] + cols)
    ra = base.map_batches(rename("a"), batch_format="pyarrow")
    rb = base.map_batches(rename("b"), batch_format="pyarrow")
    out = pairs_ds.join(ra, join_type="inner", num_partitions=num_partitions, on=("id_a",))
    return out.join(rb, join_type="inner", num_partitions=num_partitions, on=("id_b",))


def threshold_edges(scored_ds, threshold: float):
    """Keep edges with score >= threshold (reference ``partition(..., 0.5)``)."""
    import pyarrow.compute as pc

    return scored_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], threshold)), batch_format="pyarrow"
    )
