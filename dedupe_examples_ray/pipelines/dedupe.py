"""Flagship composed pipeline: block -> pair -> score -> cluster -> entity map.

Ray-Data-native equivalent of ``Dedupe.partition(data, threshold)``
(csv_example/csv_example.py:152) in its out-of-core form
(mysql_example/mysql_example.py:190-292 — the B1-B4/P1-P2/W phases):

    records ──map_batches──▶ derived fields (normalize.derive_page_fields)
            ──map_batches──▶ blocking map            [B3, fingerprint.py]
            ──groupby(block_key).map_groups──▶ pairs [P1, pairs.py — THE shuffle]
            ──groupby(id_a,id_b).first──▶ deduped pairs [A4]
            ──map_batches(actor pool)──▶ scores      [P2, scoring.py]
            ──filter ≥ threshold──▶ edges
            ──union-find / star rounds──▶ labels     [C3, cluster.py]
            ──join + COALESCE──▶ entity_map          [W/J6]

Every stage optionally checkpoints to ``workdir`` with lineage manifests
(checkpoint.py) keyed on the settings fingerprint, so a rerun resumes after
the last completed stage.
"""

from __future__ import annotations

from ..blocking import compute_token_df, fingerprint_dataset, idf_from_df
from ..checkpoint import run_stage, stage_complete
from ..cluster import (
    build_entity_map,
    connected_components,
    driver_cluster_table,
    entity_map_from_table,
    member_confidence,
)
from ..config import Field as Field_, Settings, default_page_settings
from ..normalize import derive_page_fields
from ..pairs import candidate_pairs
from ..timing import stage_timer
from ..scoring import (
    bucketed_hydrate,
    hydrate_pairs,
    record_map_ref,
    score_pairs,
    threshold_edges,
)

# "auto" surrogate-id cutover.  Measured on the bench corpus (32 CPUs, quiet
# host): at 62k pages surrogates are a net +38% (fixed extra stages dominate a
# latency-bound run); at 626k pages they are 1.58x FASTER (73.6s -> 46.5s —
# pair/edge shuffle bytes dominate).  The crossover sits between those
# points; 200k keeps small interactive runs on the cheap string path while
# every bandwidth-bound corpus gets the int64 ids.
SURROGATE_AUTO_MIN = 200_000

# Above this row count the surrogate collision check runs as a distributed
# bucketed distinct; under it, one zero-copy pull of the int64 uid column
# (8 bytes/row -> ~160 MB at the cap) + np.unique on the driver is ~10x
# faster wall than the shuffle (measured 14 s -> <1 s at 626k rows).
UID_CHECK_DRIVER_LIMIT = 20_000_000


BROADCAST_BYTES_LIMIT = 4 << 30  # scoring-projection bytes per node
BROADCAST_ROWS_HARD_CAP = 20_000_000  # per-worker index build is O(rows)


def _auto_hydration(records_work, proj_cols, n_records: int,
                    row_floor: int) -> str:
    """Pick broadcast vs sharded hydration from the MEASURED per-row bytes
    of the scoring projection (one zero-copy block sample of the already
    materialized corpus).  Under ``row_floor`` rows: broadcast outright (the
    historical row-count guarantee).  Beyond it: broadcast while the
    projection fits ``BROADCAST_BYTES_LIMIT`` per node and rows stay under
    ``BROADCAST_ROWS_HARD_CAP``; else the sharded record store."""
    if n_records <= row_floor:
        return "broadcast"
    if n_records > BROADCAST_ROWS_HARD_CAP:
        return "sharded"
    try:
        import ray as ray_

        refs = records_work.to_arrow_refs()
        per_row = None
        for r in refs[:4]:  # first non-empty block prices the projection
            t = ray_.get(r)
            if t.num_rows:
                sel = t.select([c for c in proj_cols if c in t.column_names])
                per_row = sel.nbytes / t.num_rows
                break
        if per_row is not None and per_row * n_records <= BROADCAST_BYTES_LIMIT:
            return "broadcast"
    except Exception:
        pass
    return "sharded"


def count_distinct_uids(records_work, n_records: int) -> int:
    """Distinct count of the ``__uid`` column (surrogate collision check)."""
    if n_records <= UID_CHECK_DRIVER_LIMIT:
        import numpy as np_
        import ray as ray_

        uid_tbls = ray_.get(records_work.select_columns(["__uid"]).to_arrow_refs())
        arrs = [t["__uid"].to_numpy(zero_copy_only=False) for t in uid_tbls if t.num_rows]
        if not arrs:
            return 0
        return len(np_.unique(np_.concatenate(arrs)))
    from ..relational import distinct

    return distinct(records_work.select_columns(["__uid"]), ["__uid"]).count()


def dedupe_dataset(
    records_ds,
    settings: Settings,
    id_col: str,
    workdir: str | None = None,
    idf: dict | None = None,
    scorer_concurrency=None,
    driver_cc_limit: int = 30_000_000,
    driver_cc_bytes: int = 4 << 30,
    ids_ds=None,
    scorer_blocks: int | None = 32,
    broadcast_records_limit: int = 2_000_000,
    n_records: int | None = None,
    input_token: str | None = None,
    hydration: str = "auto",
    progress_every: int | None = None,
    surrogate_ids: bool | str = "auto",
    pair_pruning: str | None = None,
    prune_k: int = 4,
    linkage: str = "connected",
    refine_max_members: int = 2000,
    id_type=None,
    blocking: str = "predicates",
    snm_keys: list[str] | None = None,
    snm_window: int = 8,
    output_dir: str | None = None,
    output_key: str = "canon_id",
):
    """Generic single-table dedupe over an already-normalized Dataset.

    ``settings.fields`` name columns of ``records_ds``; ``id_col`` is the
    stable record identity (SURVEY.md §1.1).  Returns the entity-map Dataset
    (record_id, canon_id, cluster_score).

    ``ids_ds``: cheap source of record ids for the entity-map join-back — pass
    the *raw* input when ``records_ds`` is itself a derived pipeline, so the
    derivation isn't recomputed just to enumerate ids.
    ``scorer_blocks``: pairs are split into this many blocks (metadata-only
    repartition, no shuffle) so the scorer actor pool parallelizes even when
    the pair groupby emitted few blocks.
    ``surrogate_ids``: carry an int64 ``stable_hash(id)`` surrogate through
    the pair/score/edge/CC shuffles instead of two full id strings per row
    (halves the bytes through THE wide shuffle for URL-keyed corpora; round-2
    verdict #5).  "auto" = on for string id columns once the corpus passes
    ``SURROGATE_AUTO_MIN`` records — below that the surrogate's fixed extra
    stages (collision check, uid materialization, canon resolution) cost more
    latency than the string bytes they save (measured +38%% at 62k pages
    before the checks were overlapped with execution, +13%% after — still a
    net loss there; byte savings only dominate once shuffles are
    bandwidth-bound).
    Surrogate uniqueness is verified with one distinct-count pass and the
    pipeline falls back to raw ids on a collision (63-bit space: expect
    fallback around 10^9+ records — the documented extension there is a
    second independent hash column, 126 bits).  Real ids are resolved back at
    entity-map time with canon = MIN member string id — output-identical to
    the raw-id path.
    ``pair_pruning``: opt-in meta-blocking edge pruning (Papadakis TKDE 2014,
    blocking/metablocking.py) between pair generation and scoring — "wep"
    keeps candidate pairs whose common-block count is >= the global mean,
    "cnp" keeps each record's top-``prune_k`` co-blocked neighbours.  Cuts
    the scored-pair volume on token-blocked web corpora at a bounded recall
    cost (pairs sharing only one weak key are the ones dropped); blocks over
    ``settings.max_block_size`` are PURGED (exact weights), superseding
    ``oversize_policy`` for the pair stage.  Measured on the synthesized gold
    corpus (300 clusters, seed 42): "cnp" k=4 keeps F1 = 1.00, k=2 gives
    0.995; "wep" drops to 0.90 (its mean threshold rises with the true-dup
    density it is meant to protect) — prefer "cnp" when recall is the
    contract.
    ``blocking``: "predicates" (default) runs the settings' fingerprinter +
    key-equality pair generation; "snm" replaces it with multi-pass
    sorted-neighborhood candidate generation over ``snm_keys`` (default: the
    settings' string/exact field columns) with a ``snm_window``-ahead window
    per ordering — O(n*w) candidates per key, no key-equality blocks, the
    standard alternative when token predicates mega-block (gold-corpus F1
    parity asserted in tests and the er_dedupe_pages_snm query).
    ``output_dir``: write the entity map through the zone-mapped resumable
    partitioned sink (``sources.write_partitioned``, keyed by
    ``output_key`` — default ``canon_id`` so payoff reads prune: an
    equality read on the key hits exactly ONE bucket via hash pruning, and
    range predicates use the per-bucket _ZONEMAP min/max) and return the
    committed view (``read_partitioned``).  Without it the entity map
    streams to the caller as before.
    ``linkage``: "connected" (default) labels clusters as the connected
    components of the thresholded edge graph; "average" re-cuts each
    component with average-linkage agglomerative clustering at
    ``settings.threshold`` — the reference library's hierarchical cluster
    semantics (dedupe ``cluster()``), which splits transitive chains A-B-C
    that share no A-C evidence.  Components larger than
    ``refine_max_members`` stay whole (documented O(k^2) linkage fallback).
    """
    if linkage not in ("connected", "average"):
        raise ValueError(f"linkage must be 'connected' or 'average', got {linkage!r}")
    if blocking not in ("predicates", "snm"):
        raise ValueError(f"blocking must be 'predicates' or 'snm', got {blocking!r}")
    carry = sorted({f.column for f in settings.fields})

    from ..cluster import add_uid_column, build_entity_map_uid
    from ..scoring import dataset_arrow_types

    import pyarrow as pa_

    # "auto" surrogate decision is deferred until n_records is known: under
    # SURROGATE_AUTO_MIN no probe is needed at all, and above it the id type
    # is probed from ids_ds when available (a projection of the raw source,
    # so the schema usually resolves from file metadata without executing
    # the derive pipeline for one block).
    use_sur = None if surrogate_ids == "auto" else bool(surrogate_ids)

    # Pairs travel SLIM (ids only): blocking rows and both pair shuffles never
    # move record payloads.  Field values re-attach at scoring time — via a
    # broadcast record map when it fits the budget (ray.put once, read per
    # actor), else via partitioned hash-join hydration (J2).
    if n_records is None:
        with stage_timer("n_records count"):
            n_records = (ids_ds if ids_ds is not None else records_ds).count()
    if n_records == 0:
        # zero-row corpus: every stage would stream empty blocks, but Ray
        # drops empty blocks' schemas — return the canonical typed empty
        # entity map instead so downstream select_columns/joins keep working
        import ray.data as rd_

        return rd_.from_arrow(
            pa_.table({
                "record_id": pa_.array([], pa_.string()),
                "canon_id": pa_.array([], pa_.string()),
                "cluster_score": pa_.array([], pa_.float64()),
            })
        )
    # Checkpoint identity = settings fingerprint + input identity (row count
    # plus an optional caller token, e.g. the source path) — a rerun against a
    # different/updated corpus must NOT replay stale stage Parquet.
    fp = settings.fingerprint() + f"-n{n_records}" + (f"-{input_token}" if input_token else "")
    # Hydration strategy (smallest working set first):
    # - "broadcast": record projection shipped once via ray.put — fastest
    #   while it fits one node's DRAM budget;
    # - "sharded": bucket-partitioned Parquet record store written once;
    #   scorer groups read only their aligned shard — per-task working set is
    #   records/num_buckets, no record shuffle, resumable by construction;
    # - "cogroup": fully in-flight partition-aligned cogroup (no shared
    #   storage needed — pairs AND records shuffle on the same bucket key).
    # "auto" switches broadcast -> sharded at the measured projection-BYTE
    # budget (see _auto_hydration; row-count rule for lazy checkpointed
    # corpora); the old Dataset.join fallback (measured ~10x slower) is gone.
    if use_sur is None:  # "auto"
        if n_records < SURROGATE_AUTO_MIN:
            use_sur = False  # latency-bound regime: string ids are cheaper
        else:
            try:
                if id_type is not None:  # caller-supplied hint: no probe
                    id_t = id_type
                else:
                    with stage_timer("schema probe"):
                        probe_src = ids_ds if ids_ds is not None else records_ds
                        id_t = dataset_arrow_types(probe_src)[id_col]
                use_sur = pa_.types.is_string(id_t) or pa_.types.is_large_string(id_t)
            except Exception:
                use_sur = False
    # hydration "auto" resolves AFTER the corpus materializes (below): the
    # broadcast-vs-sharded cutover is really about the BYTES of the scoring
    # projection per node, which a one-block sample prices exactly

    raw_records_ds = records_ds  # preserved for the collision-fallback rerun
    uid_check: dict = {}
    uid_thread = None
    if use_sur:
        # materialize the UID VIEW only (one corpus copy, one derivation run;
        # the raw records_ds stays lazy — everything downstream, including the
        # entity-map id source, reads records_work)
        records_work = records_ds.map_batches(
            add_uid_column, fn_kwargs=dict(id_col=id_col), batch_format="pyarrow"
        )
        if workdir is None:
            with stage_timer("derive+uid materialize"):
                records_work = records_work.materialize()
        # one-time surrogate collision check: a 63-bit hash of n unique ids
        # collides with odds ~n^2/2^64; verify and fall back rather than
        # trust.  At n=625k the odds are ~2e-8, so the check runs
        # CONCURRENTLY with blocking/pair/scoring (it was a 0.6-0.8 s serial
        # barrier — a full streaming-executor round just to project one
        # column) and is joined before any labels are trusted; the
        # astronomically rare collision discards the optimistic work and
        # reruns with raw ids.  Checkpointed runs keep the check synchronous:
        # records_work is lazy there, and a concurrent execution would race
        # the stage replay.
        def _run_uid_check():
            try:
                uid_check["n_uid"] = count_distinct_uids(records_work, n_records)
            except Exception as exc:  # surfaced at the join point
                uid_check["err"] = exc

        if workdir is None:
            import threading

            uid_thread = threading.Thread(target=_run_uid_check, daemon=True)
            uid_thread.start()
        else:
            with stage_timer("uid collision check"):
                _run_uid_check()
            if "err" in uid_check:
                raise uid_check["err"]
    if use_sur:
        work_id = "__uid"
        fp += "-sur"
        records_ds = records_work  # one materialized copy serves every reader
    else:
        if workdir is None:
            with stage_timer("derive materialize"):
                records_ds = records_ds.materialize()  # reused for blocks + hydration
        records_work, work_id = records_ds, id_col

    if hydration == "auto":
        # broadcast while the SCORING PROJECTION (work_id + compared columns)
        # fits the per-node byte budget — priced from one materialized block,
        # not guessed from the row count (measured: ~300 B/page on the
        # flagship, so 3.1M records is still a <1 GB broadcast and 1.55x
        # faster than the sharded store at that size).  Rows keep a hard cap
        # (the per-worker lookup index build is O(rows)); under
        # ``broadcast_records_limit`` rows the old guarantee holds outright.
        if workdir is None:  # records_work is materialized: sampling is free
            hydration = _auto_hydration(
                records_work, [work_id] + carry, n_records,
                broadcast_records_limit,
            )
        else:  # lazy corpus (checkpointed run): keep the row-count rule
            hydration = (
                "broadcast" if n_records <= broadcast_records_limit else "sharded"
            )

    if blocking == "snm":
        # sorted-neighborhood candidate generation (Hernandez-Stolfo 1995):
        # O(n*w) pairs per key ordering, no key-equality blocks at all —
        # the documented alternative when token predicates mega-block (e.g.
        # template-dominated corpora).  Pairs come back oriented + DISTINCT.
        from ..ops.simjoin import multi_pass_snm

        keys = snm_keys or sorted(
            {f.column for f in settings.fields
             if f.comparator in ("string", "exact")}
        )
        if not keys:
            raise ValueError("blocking='snm' needs snm_keys or string fields")
        # key NAMES must be in the checkpoint fingerprint — a count alone
        # would replay a stale pairs stage after snm_keys changes
        import hashlib as _hashlib

        _keys_tag = _hashlib.md5(",".join(keys).encode()).hexdigest()[:10]
        fp += f"-snm{snm_window}x{_keys_tag}"

        def _snm_pairs():
            import pyarrow as pa__

            out = multi_pass_snm(records_work, keys, work_id, window=snm_window)
            return out.map_batches(
                lambda t: pa__.table({"id_a": t["id1"], "id_b": t["id2"]}),
                batch_format="pyarrow",
            )

        pairs = run_stage("pairs", _snm_pairs, workdir, fp)
        if scorer_blocks:
            pairs = pairs.repartition(scorer_blocks)
        blocks = None
        pairs_metrics = None
    else:
        blocks = run_stage(
            "blocks",
            lambda: fingerprint_dataset(records_work, settings, work_id, []),
            workdir,
            fp,
        )
        # checkpointed runs record the skew posture (blocks over cap, estimated
        # emitted/dropped pairs — the reference's per-10k progress print, M13,
        # generalized to durable per-stage metrics) in the pairs manifest
        pairs_metrics = None
        if workdir is not None and not stage_complete(workdir, "pairs", fp):
            from ..pairs import pair_metrics

            pairs_metrics = pair_metrics(
                blocks, work_id, max_block_size=settings.max_block_size,
                policy=settings.oversize_policy,
            )
    if blocking == "snm":
        pass  # pairs built above
    elif pair_pruning is not None:
        from ..blocking.metablocking import meta_block_prune

        fp += f"-mb{pair_pruning}{prune_k if pair_pruning == 'cnp' else ''}"
        pairs = run_stage(
            "pairs",
            lambda: meta_block_prune(
                blocks, id_col=work_id,
                max_block_size=settings.max_block_size,
                mode=pair_pruning, k=prune_k,
            ).select_columns(["id_a", "id_b"]),
            workdir,
            fp,
            metrics=pairs_metrics,
        )
    else:
        pairs = run_stage(
            "pairs",
            lambda: candidate_pairs(
                blocks,
                work_id,
                [],
                max_block_size=settings.max_block_size,
                policy=settings.oversize_policy,
            ),
            workdir,
            fp,
            metrics=pairs_metrics,
        )
    if scorer_blocks and blocking != "snm":
        pairs = pairs.repartition(scorer_blocks)

    # M13 progress stream: reference parity with mysql_example.py:41-42
    # (a line every `progress_every` scored pairs); the final total lands in
    # the edges-stage manifest metrics when checkpointing is on.
    progress = None
    if progress_every:
        from ..scoring import make_score_progress

        progress = make_score_progress(progress_every)

    def scored_edges():
        if hydration == "broadcast":
            # broadcast built off-driver: one remote consolidation task,
            # workers map the combined object zero-copy (record_map_ref)
            records = record_map_ref(records_work, work_id, carry)
            scores = score_pairs(
                pairs, settings, idf=idf, concurrency=scorer_concurrency,
                records=records, n_records_hint=n_records, progress=progress,
            )
        elif hydration == "sharded":
            import os
            import shutil
            import tempfile

            from ..scoring import score_pairs_sharded, shard_records_to_store

            # store keyed on the full run fingerprint (settings + input
            # identity) with a completion marker: a rerun reuses a finished
            # store, a changed run rebuilds — never appends into stale shards
            store = (
                os.path.join(workdir, f"record_store_{fp}")
                if workdir
                else tempfile.mkdtemp(prefix="recstore_", dir="/tmp")
            )
            marker = os.path.join(store, "_COMPLETE")
            if not os.path.exists(marker):
                shutil.rmtree(store, ignore_errors=True)
                shard_records_to_store(records_work, work_id, carry, store)
                with open(marker, "w") as f:
                    f.write("ok")
            scores = score_pairs_sharded(
                pairs.select_columns(["id_a", "id_b"]), store, settings, work_id, carry,
                idf=idf, progress=progress,
            )
        elif hydration == "cogroup":
            hydrated = bucketed_hydrate(
                pairs.select_columns(["id_a", "id_b"]), records_work, work_id, carry
            )
            scores = score_pairs(hydrated, settings, idf=idf,
                                 concurrency=scorer_concurrency, progress=progress)
        else:  # "join": generic hash-join hydration (kept for parity tests)
            hydrated = hydrate_pairs(pairs, records_work, work_id, carry)
            scores = score_pairs(hydrated, settings, idf=idf,
                                 concurrency=scorer_concurrency, progress=progress)
        return threshold_edges(scores, settings.threshold)

    # The thresholded edge set fans out three ways (count for the CC path
    # choice, the CC itself, member confidence) — pin it once instead of
    # re-executing the block->pair->score chain per consumer.  It is the
    # *small* output of blocking+scoring, bounded by the block-size cap.
    def _uids_ok() -> bool:
        """Join the collision check.  True = uids unique; False = genuine
        hash collision (fall back to raw ids); duplicate record ids raise
        the clear ValueError regardless of id path."""
        if uid_thread is not None:
            with stage_timer("uid check join"):
                uid_thread.join()
        if "err" in uid_check:
            raise uid_check["err"]
        if uid_check.get("n_uid") == n_records:
            return True
        # rare path — distinguish a genuine hash collision from the far
        # more likely malformed input (duplicate record ids), which would
        # otherwise surface as an obscure non-unique-index error deep in
        # the scorer on ANY id path
        from ..relational import distinct

        n_ids = distinct(
            raw_records_ds.select_columns([id_col]), [id_col]
        ).count()
        if n_ids != n_records:
            raise ValueError(
                f"records have {n_ids} distinct {id_col!r} values for "
                f"{n_records} rows — record ids must be unique"
            )
        import logging

        logging.getLogger("dedupe_examples_ray").warning(
            "surrogate uid collision detected (%d uids for %d records); "
            "falling back to raw ids", uid_check.get("n_uid"), n_records,
        )
        return False

    def _raw_id_rerun():
        """Discard the optimistic surrogate work; rerun on raw string ids."""
        return dedupe_dataset(
            raw_records_ds, settings, id_col, workdir=workdir, idf=idf,
            scorer_concurrency=scorer_concurrency,
            driver_cc_limit=driver_cc_limit,
            driver_cc_bytes=driver_cc_bytes, ids_ds=ids_ds,
            scorer_blocks=scorer_blocks,
            broadcast_records_limit=broadcast_records_limit,
            n_records=n_records, input_token=input_token,
            hydration=hydration, progress_every=progress_every,
            surrogate_ids=False, pair_pruning=pair_pruning,
            prune_k=prune_k, linkage=linkage,
            refine_max_members=refine_max_members,
            id_type=id_type, blocking=blocking,
            snm_keys=snm_keys, snm_window=snm_window,
            output_dir=output_dir, output_key=output_key,
        )

    # Non-checkpointed runs stream the scored edges INTO the driver as the
    # pipeline executes: each finished edge block folds into an incremental
    # union-find (cluster.StreamingEdgeCC) during what used to be idle wait,
    # so the serial tail after the last scorer batch is one small merge
    # instead of edge-pull + full driver CC (round-4 profile: ~0.5 s of the
    # 8.9 s flagship wall).  Checkpointed runs keep the materialized edges
    # stage (the parquet checkpoint is the point there).
    import os as _os

    # streamed drain only at scale: the iter_batches consumption is a wash
    # vs materialize+pull at 625k pages (A/B: 8.35 vs 8.31 s median) and a
    # fixed ~0.3 s SLOWER on small corpora (more Ray jobs); its value — the
    # removed serial edge pull and the disk-spill driver-memory guard —
    # only materializes when the edge set is large
    stream_ok = (
        _os.environ.get("DER_STREAM_EDGES", "1") != "0"
        and n_records >= 100_000
    )
    streamed = None
    try:
        if workdir is not None or not stream_ok:
            edges = run_stage("edges", scored_edges, workdir, fp)
            if workdir is None:
                with stage_timer("block->pair->score->edges"):
                    edges = edges.materialize()
        else:
            from ..cluster import stream_edges_to_driver

            # want_uf=False: this pipeline's edges surface in a BURST (the
            # pair shuffle is a barrier, scoring then drains in one wave), so
            # the incremental union-find has nothing to overlap and its
            # O(E log B) re-touching measured 1.3 s where the one-shot
            # vectorized CC takes 0.28 s (625k pages / 32 CPUs).  The drain
            # itself still replaces materialize+re-pull (8.7 -> 7.6 s wall).
            # StreamingEdgeCC stays available for edge producers that
            # genuinely trickle (no shuffle barrier before scoring).
            with stage_timer("block->pair->score->edges"):
                streamed = stream_edges_to_driver(
                    scored_edges(), driver_cc_limit, driver_cc_bytes,
                    want_uf=False,
                )
            edges = streamed[1] if streamed[0] == "spill" else None
    except Exception:
        # an optimistic-phase failure may BE the collision/duplicate-id
        # symptom — consult the check before surfacing the raw error.  The
        # uid check itself may have failed too (possibly the same transient
        # cause); log it and re-raise the ORIGINAL edges exception, which is
        # the one the user needs to see.
        try:
            uids_fine = _uids_ok() if use_sur else True
        except Exception as uid_err:
            import logging

            logging.getLogger("dedupe_examples_ray").warning(
                "background uid collision check also failed: %r", uid_err
            )
            raise
        if use_sur and not uids_fine:
            return _raw_id_rerun()
        raise
    if workdir is None:
        # records_ds is materialized above — cheaper id source than ids_ds,
        # which usually re-reads the raw input
        id_source = records_ds
    else:
        id_source = ids_ds if ids_ds is not None else records_ds

    # join the concurrent surrogate collision check before any label is
    # trusted; a failed check discards the optimistic edges and reruns on
    # raw ids (same parameters, surrogate path disabled)
    if use_sur and not _uids_ok():
        return _raw_id_rerun()
    if progress is not None:
        import logging

        import ray as _ray

        # edges are materialized (parquet or object store) at this point, but
        # scorer batches report via fire-and-forget add.remote, so adds can
        # still be in the actor's mailbox — poll until the total is stable
        # before logging it as final (advice item, round 2; a checkpoint
        # replay reads 0).
        import time as _time

        _total = _ray.get(progress.total.remote())
        for _ in range(40):
            _time.sleep(0.05)
            _again = _ray.get(progress.total.remote())
            if _again == _total:
                break
            _total = _again
        logging.getLogger("dedupe_examples_ray.progress").info(
            "scoring complete: %d pairs scored", _total
        )
    # the linkage mode only changes the cluster cut, not the edge set —
    # cluster/entity-map stages get their own checkpoint key so switching
    # modes reuses the (expensive) edge checkpoint but never stale labels
    cfp = fp if linkage == "connected" else fp + f"-avg{refine_max_members}"
    if streamed is not None and streamed[0] != "spill":
        # streamed driver fast path: labels either already folded (uf) or
        # computed from the driver-resident table the stream accumulated
        import pyarrow as pa_

        mode, payload = streamed
        member_pull = None
        if mode == "uf":
            label_tbl = payload
            if use_sur:
                from ..cluster import start_member_ids_pull

                member_pull = start_member_ids_pull(
                    id_source, id_col, None,
                    nodes=label_tbl["node"].to_numpy(zero_copy_only=False),
                )
        else:
            id_t = pa_.int64() if use_sur else pa_.string()
            edges_tbl = payload if mode == "tables" else pa_.table(
                {"id_a": pa_.array([], id_t), "id_b": pa_.array([], id_t),
                 "score": pa_.array([], pa_.float64())}
            )
            if use_sur:
                from ..cluster import start_member_ids_pull

                member_pull = start_member_ids_pull(id_source, id_col, edges_tbl)
            with stage_timer("driver CC"):
                if linkage == "average":
                    from ..cluster import driver_refine_table

                    label_tbl = driver_refine_table(
                        edges_tbl, settings.threshold, refine_max_members
                    )
                else:
                    label_tbl = driver_cluster_table(edges_tbl)

        def _entity_stage_streamed():
            with stage_timer("entity map build"):
                if use_sur:
                    member_tbl = member_pull.join() if member_pull else None
                    if member_tbl is not None and member_tbl.num_rows > 20_000_000:
                        member_tbl = None
                    return build_entity_map_uid(
                        id_source, id_col, label_tbl,
                        member_ids_tbl=member_tbl,
                    )
                return entity_map_from_table(id_source, id_col, label_tbl)

        return _sink_entity(_entity_stage_streamed(), output_dir, output_key)
    n_edges = edges.count()
    # The driver fast path is budgeted in BYTES as well as edge count: long
    # string ids make 30 M edges multi-GB of driver heap on a cluster, so an
    # edge-count-only guard under-protects (round-1 verdict).  size_bytes()
    # is free here — edges are materialized/checkpointed just above.
    edge_bytes = edges.size_bytes() or 0
    if n_edges <= driver_cc_limit and edge_bytes <= driver_cc_bytes:
        # driver fast path: ONE edge pull feeds vectorized CC + confidence +
        # the broadcast entity-map annotation (reference's in-driver posture)
        import pyarrow as pa_
        import ray as ray_

        # zero-copy pull: the projection materializes in parallel and the
        # driver maps the result blocks from plasma (no re-batching copy).
        # Empty blocks can carry a degenerate column-less schema — drop them
        # before concat (concat_tables requires identical schemas).
        with stage_timer("edge pull to driver"):
            tbls = ray_.get(
                edges.select_columns(["id_a", "id_b", "score"]).to_arrow_refs()
            )
        tbls = [t for t in tbls if t.num_rows > 0]
        id_t = pa_.int64() if use_sur else pa_.string()
        edges_tbl = (
            pa_.concat_tables(tbls)
            if tbls
            else pa_.table(
                {
                    "id_a": pa_.array([], id_t),
                    "id_b": pa_.array([], id_t),
                    "score": pa_.array([], pa_.float64()),
                }
            )
        )
        # overlap the entity-map member scan (a full corpus pass) with the
        # driver clustering below: edge nodes ARE the clustered nodes, so
        # the (uid, record_id) pull needs only the edge table, not the labels
        member_pull = None
        if use_sur and workdir is None:
            from ..cluster import start_member_ids_pull

            member_pull = start_member_ids_pull(id_source, id_col, edges_tbl)
        with stage_timer("driver CC"):
            if linkage == "average":
                from ..cluster import driver_refine_table

                label_tbl = driver_refine_table(
                    edges_tbl, settings.threshold, refine_max_members
                )
            else:
                label_tbl = driver_cluster_table(edges_tbl)
        if workdir is not None:
            import ray.data as rd

            run_stage(
                "clusters",
                lambda: rd.from_arrow(label_tbl.select(["node", "label"])),
                workdir,
                cfp,
            )
        def _entity_stage():
            with stage_timer("entity map build"):
                if use_sur:
                    member_tbl = member_pull.join() if member_pull else None
                    # driver-side canon resolution is O(members); past the
                    # broadcast-tier budget let the combiner pull distribute
                    # the per-label min instead
                    if member_tbl is not None and member_tbl.num_rows > 20_000_000:
                        member_tbl = None
                    return build_entity_map_uid(
                        id_source, id_col, label_tbl,
                        member_ids_tbl=member_tbl,
                    )
                return entity_map_from_table(id_source, id_col, label_tbl)

        entity = run_stage("entity_map", _entity_stage, workdir, cfp)
        return _sink_entity(entity, output_dir, output_key)
    # beyond the driver budget: contract edges first (per-block spanning
    # forests, no shuffle, same components) — usually brings the edge set
    # back under the driver limit; star rounds remain the true fallback
    from ..cluster import contract_edges

    if linkage == "average":
        # distributed refinement: CC + one bucketed shuffle that co-locates
        # each component's edges, then per-component average-linkage re-cut
        from ..cluster import refine_clusters_hierarchical

        labels = run_stage(
            "clusters",
            lambda: refine_clusters_hierarchical(
                edges, threshold=settings.threshold,
                max_members=refine_max_members,
            ),
            workdir,
            cfp,
        )
    else:
        labels = run_stage(
            "clusters",
            lambda: connected_components(contract_edges(edges), driver_limit=driver_cc_limit),
            workdir,
            cfp,
        )
    confidence = member_confidence(edges)
    entity = run_stage(
        "entity_map",
        lambda: build_entity_map_uid(id_source, id_col, labels, confidence)
        if use_sur
        else build_entity_map(id_source, id_col, labels, confidence),
        workdir,
        cfp,
    )
    return _sink_entity(entity, output_dir, output_key)


def _sink_entity(entity, output_dir: str | None, output_key: str):
    """Optionally commit the entity map through the zone-mapped partitioned
    sink and hand back the committed (resumable, prunable) view."""
    if output_dir is None:
        return entity
    from ..sources.io import read_partitioned, write_partitioned

    write_partitioned(entity, output_dir, key_col=output_key)
    return read_partitioned(output_dir)


def document_settings() -> Settings:
    """Settings for generic text-document dedupe (documents table shape)."""
    return Settings(
        fields=[
            Field_("title", "string"),
            # body via precomputed token-hash signatures (token_cosine): the
            # per-pair cost is a numpy sorted-intersection; tokenize happens
            # once per record in derive_document_fields
            Field_("body_sig", "token_cosine", has_missing=True, name="body"),
        ],
        predicates=[
            {"kind": "first_token", "column": "title"},
            {"kind": "prefix", "column": "title", "n": 12},
        ],
        weights={"title": 6.0, "body": 6.0, "body__missing": -0.5},
        bias=-7.5,
        threshold=0.5,
        max_block_size=200,
        oversize_policy="salt",
    )


def derive_document_fields(batch, text_col: str = "text", title_tokens: int = 8):
    """Derive title (first N tokens) / body (rest) from a flat text column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..normalize import normalize_string_array

    arr = batch[text_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(pc.cast(arr, pa.string()), "")
    toks = pc.split_pattern_regex(arr, r"\s+")
    title = pc.binary_join(pc.list_slice(toks, 0, title_tokens), " ")
    body = pc.binary_join(pc.list_slice(toks, title_tokens, 10_000), " ")
    from ..normalize import token_signature_array

    out = batch
    body_norm = normalize_string_array(body)
    for name, col in [
        ("title", normalize_string_array(title)),
        ("body", body_norm),
        ("body_sig", token_signature_array(body_norm)),
    ]:
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, col)
    return out


def dedupe_documents(
    docs_ds,
    settings: Settings | None = None,
    id_col: str = "doc_id",
    workdir: str | None = None,
    scorer_concurrency=None,
    n_records: int | None = None,
    **dedupe_kwargs,
):
    """ER flagship over a flat text table (doc_id, text, ...)."""
    settings = settings or document_settings()
    slim = docs_ds.select_columns([id_col, "text"])
    derived = slim.map_batches(derive_document_fields, batch_format="pyarrow")
    if n_records is None:
        n_records = docs_ds.count()  # metadata fast path on raw parquet reads
    if "id_type" not in dedupe_kwargs:
        try:
            from ..scoring import dataset_arrow_types

            dedupe_kwargs["id_type"] = dataset_arrow_types(docs_ds)[id_col]
        except Exception:
            pass
    return dedupe_dataset(
        derived,
        settings,
        id_col=id_col,
        workdir=workdir,
        scorer_concurrency=scorer_concurrency,
        ids_ds=slim.select_columns([id_col]),
        n_records=n_records,
        **dedupe_kwargs,
    )


def dedupe_pages(
    pages_ds,
    settings: Settings | None = None,
    workdir: str | None = None,
    use_idf: bool = False,
    scorer_concurrency=None,
    n_records: int | None = None,
    **dedupe_kwargs,
):
    """Web-pages flagship: derive fields from (url, text), then dedupe.

    ``dedupe_kwargs`` forward to :func:`dedupe_dataset` (e.g.
    ``progress_every``, ``hydration``, ``input_token``).

    Input columns needed: url, text (prune others at the read — the html
    payload must not travel through the shuffle).
    """
    settings = settings or default_page_settings()
    slim = pages_ds.select_columns(
        [c for c in ("url", "text") if c in pages_ds.schema().names] or ["url", "text"]
    )
    derived = slim.map_batches(derive_page_fields, batch_format="pyarrow")
    # Project the derive output down to the columns the ER stages read (id +
    # compared fields + blocking keys): the raw ``text`` column (and the
    # uncompared ``body`` intermediate) would otherwise dominate the bytes of
    # the one materialized corpus copy — measured 1.73 s -> ~1.1 s for the
    # derive+uid materialize stage at 625k pages / 32 CPUs.
    need = (
        {"url"}
        | {f.column for f in settings.fields}
        | {p["column"] for p in settings.predicates if "column" in p}
        | set(dedupe_kwargs.get("snm_keys") or [])
    )
    idf = None
    if use_idf:
        # compute idf from the PRE-pruned derive output: the tokenizer reads
        # ``body``, which the projection below deliberately drops so its bytes
        # never travel through the ER shuffles
        n_docs = derived.count()
        df_tbl = compute_token_df(derived, "body").to_pandas()
        import pyarrow as pa

        idf = idf_from_df(pa.Table.from_pandas(df_tbl), n_docs)
    drop = [c for c in ("text", "body", "title", "path", "host", "body_sig")
            if c not in need]
    if drop:
        derived = derived.map_batches(
            lambda t, _d=tuple(drop): t.drop_columns(
                [c for c in _d if c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    if n_records is None:
        n_records = pages_ds.count()  # metadata fast path on raw parquet reads
    if "id_type" not in dedupe_kwargs:
        # probe the RAW input's schema (cached after the count above) so the
        # auto-surrogate decision never plans a fresh projection just for a
        # type lookup
        try:
            from ..scoring import dataset_arrow_types

            dedupe_kwargs["id_type"] = dataset_arrow_types(pages_ds)["url"]
        except Exception:
            pass
    return dedupe_dataset(
        derived,
        settings,
        id_col="url",
        workdir=workdir,
        idf=idf,
        scorer_concurrency=scorer_concurrency,
        ids_ds=slim.select_columns(["url"]),
        n_records=n_records,
        **dedupe_kwargs,
    )
