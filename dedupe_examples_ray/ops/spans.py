"""Exact duplicate-SPAN removal — the substring-granular dedup of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), re-expressed Ray-Data-first.

The reference corpus-dedup family in this repo works at document
(exact/MinHash), paragraph (CCNet), line (RefinedWeb) and storage-chunk
(CDC) granularity; this operator removes byte-identical spans that repeat
ANYWHERE in the corpus — boilerplate licence blocks, templated footers,
quoted tweets — keeping exactly the globally-first occurrence.  Lee et al.
build a corpus-wide suffix array; a suffix array is inherently a serial
global index, so the distributed formulation here uses winnowed rolling
fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
theorem) instead:

1. **fingerprint** (map): Gear rolling hash over each document's UTF-8
   bytes (window ``w=64`` — the same vectorized 64-shifted-adds kernel as
   :func:`~dedupe_examples_ray.ops.corpus.cdc_chunk`); robust winnowing
   selects, in every run of ``k=64`` consecutive window hashes, the
   rightmost minimum.  The winnowing guarantee: ANY duplicated substring
   of length >= w + k - 1 = 127 bytes shares at least one SELECTED
   fingerprint between its occurrences, regardless of alignment — and
   because ``k <= w``, consecutive selections inside a duplicated span
   are at most ``w`` apart, so their windows tile the span's interior
   WITHOUT holes.
2. **winners** (one bucketed groupby on ``hash % B``): fingerprints are
   grouped by a PAIR of independent 64-bit window hashes (the first
   routes, the second verifies — a same-(h1,h2) false match needs a
   2^-128 double collision, the same evidence standard as the minhash
   path's hashed-shingle verify); every occurrence except the
   globally-first (min ``(doc, pos)``) becomes a removal interval
   ``[pos, pos+w)``.
3. **apply** (hash_join + map): removal intervals aggregate per doc (one
   bucketed groupby), left-join back onto the corpus, merge overlapping
   intervals into spans, DROP merged spans shorter than
   ``min_len - 2*(w+k)`` (so ``min_len`` bounds what is ever removed:
   spans >= ``min_len`` are always removed, spans below the slack band
   never are, in between best-effort), snap the cuts outward to UTF-8
   character boundaries, and splice the surviving byte ranges.

Granularity note (documented, not silent): up to ``w + k - 1`` = 127
bytes at each END of a duplicated span can survive (the winnow selection
nearest each boundary sits up to ``k`` hash positions inside it); the
interior is removed contiguously.  The globally-first occurrence of
every span survives byte-identical.

Scale shape: fingerprints move once (32 bytes of hash+position metadata
per ~``k/2 = 32`` input bytes — about 1x corpus bytes); removals are
output-sized; the only corpus-sized exchange is the final left join,
which is the op's inherent cost.  Nothing is driver-collected or
broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_W = 64  # gear window bytes (fixed by the 64-shifted-adds closed form)
_CUTS_CACHE: dict = {}  # per-worker memo for the broadcast cuts map
_BCAST_DOCS_LIMIT = 2_000_000  # small-side budget for the cuts broadcast
_BCAST_BYTES_LIMIT = 256 << 20  # cuts BLOBs, not just rows: a heavily
# duplicated corpus carries ~8 bytes per removed window per doc, so the
# broadcast table can reach GBs while still passing the row gate


def _col(t: pa.Table, name: str):
    c = t[name]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


_GEAR2: np.ndarray | None = None


def _gear_table2() -> np.ndarray:
    """Second, independent gear table (verify hash) — seeded differently
    from :func:`corpus._gear_table` so (h1, h2) window-pair equality is a
    2^-128 coincidence for distinct contents."""
    global _GEAR2
    if _GEAR2 is None:
        x = np.arange(256, dtype=np.uint64) + np.uint64(0xA076_1D64_78BD_642F)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51_AFD7_ED55_8CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CE_B9FE_1A85_EC53)
        _GEAR2 = x ^ (x >> np.uint64(33))
    return _GEAR2


def _winnow_positions(h: np.ndarray, k: int) -> np.ndarray:
    """Indices selected by robust winnowing over window-hash array ``h``:
    the RIGHTMOST minimum of every k-run (dedup'd).  O(n) via a sliding
    min (numpy stride view)."""
    n = len(h)
    if n == 0:
        return np.zeros(0, np.int64)
    if n <= k:
        return np.array([int(np.flatnonzero(h == h.min())[-1])], np.int64)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(h, k)  # (n-k+1, k)
    # rightmost argmin: reverse, argmin, map back
    rev = win[:, ::-1]
    sel = (k - 1) - rev.argmin(axis=1) + np.arange(len(win))
    return np.unique(sel).astype(np.int64)


def span_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 256,
    num_buckets: int | None = None,
    workdir: str | None = None,
    input_token: str | None = None,
):
    """Remove corpus-wide duplicated byte spans of length >= ``min_len``,
    keeping the globally-first occurrence (ordered by ``(id, position)``).

    Returns ``(id_col, text_col, n_spans_removed, n_bytes_removed)`` with
    one row per input document (docs may come back with empty text when
    everything they contained was seen earlier).
    ``min_len`` must be > 127 (the fixed w + k - 1 detection floor).

    ``workdir``: per-stage checkpointing (north_rule resume) — the expensive
    fingerprint-shuffle result (the per-doc cut lists, output-sized) commits
    as the ``span_cuts`` stage; a rerun after a crash replays it and only
    recomputes the cheap final apply pass.  ``input_token`` joins the stage
    fingerprint (pass the source path) so a changed corpus never replays
    stale cuts.
    """
    if min_len < 2 * _W:
        raise ValueError(f"min_len must be >= {2 * _W}, got {min_len}")
    from ..relational import hash_join
    from ..scale import resolve_buckets
    from .corpus import _gear_hashes, _gear_table

    k = _W  # winnow run == window: selected windows tile spans hole-free
    # merged-span filter: spans >= min_len always removed; spans shorter
    # than this slack bound never are; in between best-effort
    min_run = max(1, int(min_len) - 2 * (_W + k))
    num_buckets = resolve_buckets(num_buckets, ds)
    gear = _gear_table()
    gear2 = _gear_table2()

    empty_fp = pa.table({
        "fhash": pa.array([], pa.uint64()),
        "vhash": pa.array([], pa.uint64()),
        "__doc": pa.array([], pa.string()),
        "pos": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int64()),
    })

    def fingerprints(t: pa.Table) -> pa.Table:
        ids = pc.cast(_col(t, id_col), pa.string()).to_pylist()
        txt = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "")
        out_doc, out_pos, out_hash, out_v = [], [], [], []
        for i, s in enumerate(txt.to_pylist()):
            b = s.encode("utf-8")
            if len(b) < _W:
                continue
            raw = np.frombuffer(b, np.uint8)
            h = _gear_hashes(gear[raw])[_W - 1:]  # h[j] covers bytes [j, j+W)
            sel = _winnow_positions(h, k)
            if not len(sel):
                continue
            h2 = _gear_hashes(gear2[raw])[_W - 1:]
            out_doc.extend([ids[i]] * len(sel))
            out_pos.append(sel)
            out_hash.append(h[sel])
            out_v.append(h2[sel])
        if not out_doc:
            return empty_fp
        pos = np.concatenate(out_pos)
        fh = np.concatenate(out_hash)
        return pa.table({
            "fhash": pa.array(fh, pa.uint64()),
            "vhash": pa.array(np.concatenate(out_v), pa.uint64()),
            "__doc": pa.array(out_doc, pa.string()),
            "pos": pa.array(pos, pa.int64()),
            "bucket": pa.array((fh % np.uint64(num_buckets)).astype(np.int64)),
        })

    fps = ds.select_columns([id_col, text_col]).map_batches(
        fingerprints, batch_format="pyarrow"
    )

    empty_rem = pa.table({
        "__doc": pa.array([], pa.string()),
        "pos": pa.array([], pa.int64()),
    })

    def removals(df: pd.DataFrame) -> pa.Table:
        # same (h1, h2) pair = same window content (2^-128 double-collision
        # standard); global first occurrence by (string doc id, pos) kept
        df = df.sort_values(["__doc", "pos"], kind="mergesort")
        grp = df.groupby(["fhash", "vhash"], sort=False)["pos"].transform("size")
        first = ~df.duplicated(subset=["fhash", "vhash"], keep="first")
        out = df.loc[(grp > 1) & ~first, ["__doc", "pos"]]
        if not len(out):
            return empty_rem
        return pa.table({
            "__doc": pa.array(out["__doc"].to_numpy(object), pa.string()),
            "pos": pa.array(out["pos"].to_numpy(np.int64), pa.int64()),
        })

    rem = fps.groupby("bucket").map_groups(removals, batch_format="pandas")

    # cut positions travel as a packed little-endian int64 BLOB: Arrow's
    # acero hash join (relational.hash_join's per-bucket kernel) rejects
    # list<> payload columns, and a binary column joins fine
    empty_lists = pa.table({
        "__doc": pa.array([], pa.string()),
        "cuts": pa.array([], pa.binary()),
    })

    def per_doc(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return empty_lists
        s = df.sort_values(["__doc", "pos"], kind="mergesort")
        docs_np = s["__doc"].to_numpy(object)
        pos_np = s["pos"].to_numpy(np.int64)
        firsts = np.flatnonzero(np.r_[True, docs_np[1:] != docs_np[:-1]])
        bounds = np.append(firsts, len(pos_np))
        blobs = [
            pos_np[bounds[i]: bounds[i + 1]].astype("<i8").tobytes()
            for i in range(len(firsts))
        ]
        return pa.table({
            "__doc": pa.array(docs_np[firsts], pa.string()),
            "cuts": pa.array(blobs, pa.binary()),
        })

    def doc_bucket(t: pa.Table) -> pa.Table:
        from ..pairs import stable_hash

        b = stable_hash(t["__doc"].to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("dbkt", pa.array(b.astype(np.int64)))

    # output-sized (one row per doc WITH removals) — pin it so the join's
    # schema probe doesn't re-execute the fingerprint pipeline
    def _cuts_stage():
        return (
            rem.map_batches(doc_bucket, batch_format="pyarrow")
            .groupby("dbkt")
            .map_groups(lambda df: per_doc(df.drop(columns=["dbkt"])),
                        batch_format="pandas")
        )

    if workdir is not None:
        from ..checkpoint import run_stage

        fp = (
            f"span-{min_len}-b{num_buckets}-n{ds.count()}"
            + (f"-{input_token}" if input_token else "")
        )
        rem_lists = run_stage("span_cuts", _cuts_stage, workdir, fp).materialize()
    else:
        rem_lists = _cuts_stage().materialize()

    def key_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: _col(t, id_col),
            "__doc": pc.cast(_col(t, id_col), pa.string()),
            text_col: _col(t, text_col),
        })

    docs_keyed = ds.select_columns([id_col, text_col]).map_batches(
        key_docs, batch_format="pyarrow"
    )
    n_rem_docs = rem_lists.count()
    if n_rem_docs == 0:
        # duplicate-free corpus (e.g. a span_dedup fixed-point rerun): no
        # join — every doc passes through with zero-removal counters
        return docs_keyed.map_batches(
            lambda t: pa.table({
                id_col: _col(t, id_col),
                text_col: _col(t, text_col),
                "n_spans_removed": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_bytes_removed": pa.array(np.zeros(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow",
        )

    def apply_cuts(t: pa.Table, cuts_col=None) -> pa.Table:
        txt = pc.fill_null(pc.cast(_col(t, text_col), pa.string()), "").to_pylist()
        if cuts_col is None:
            cuts_col = (t["cuts"].to_pylist() if "cuts" in t.column_names
                        else [None] * t.num_rows)
        out_txt, n_spans, n_bytes = [], [], []
        for s, cuts in zip(txt, cuts_col):
            if cuts is None or len(cuts) == 0:
                out_txt.append(s)
                n_spans.append(0)
                n_bytes.append(0)
                continue
            b = s.encode("utf-8")
            starts = np.sort(np.frombuffer(cuts, "<i8").astype(np.int64))
            ends = starts + _W
            # merge overlapping/adjacent windows into spans
            keep_new = np.r_[True, starts[1:] > ends[:-1]]
            m_starts = starts[keep_new]
            m_ends = np.maximum.reduceat(ends, np.flatnonzero(keep_new))
            # honor min_len: drop merged runs under the slack bound
            big = (m_ends - m_starts) >= min_run
            m_starts, m_ends = m_starts[big], m_ends[big]
            # snap outward-start / outward-end to UTF-8 char boundaries
            # (cut boundaries must not split a multi-byte sequence)
            arr = np.frombuffer(b, np.uint8)

            def snap(p: int) -> int:
                while 0 < p < len(arr) and (arr[p] & 0xC0) == 0x80:
                    p += 1
                return min(p, len(arr))

            pieces, cursor, removed = [], 0, 0
            for st, en in zip(m_starts, m_ends):
                st, en = snap(int(st)), snap(min(int(en), len(arr)))
                if st >= en:
                    continue
                pieces.append(b[cursor:st])
                removed += en - st
                cursor = en
            pieces.append(b[cursor:])
            out_txt.append(b"".join(pieces).decode("utf-8"))
            n_spans.append(int(len(m_starts)))
            n_bytes.append(int(removed))
        return pa.table({
            id_col: _col(t, id_col),
            text_col: pa.array(out_txt, pa.string()),
            "n_spans_removed": pa.array(n_spans, pa.int64()),
            "n_bytes_removed": pa.array(n_bytes, pa.int64()),
        })

    if (
        n_rem_docs <= _BCAST_DOCS_LIMIT
        and rem_lists.size_bytes() <= _BCAST_BYTES_LIMIT
    ):
        # broadcast tier: the cuts map fits the standard small-side budget
        # (both ROWS and BYTES — rem_lists is materialized, so size_bytes()
        # is metadata-only) — ship it once via ray.put and skip the
        # corpus-sized join entirely
        import ray

        rem_tbl = pa.concat_tables(
            [tb for tb in ray.get(rem_lists.to_arrow_refs()) if tb.num_rows]
        ).combine_chunks()
        ref = ray.put(rem_tbl)

        def apply_bcast(t: pa.Table) -> pa.Table:
            got = _CUTS_CACHE.get(ref.hex())
            if got is None:
                m = ray.get(ref)
                got = dict(zip(m["__doc"].to_pylist(), m["cuts"].to_pylist()))
                _CUTS_CACHE.clear()
                _CUTS_CACHE[ref.hex()] = got
            docs_str = pc.cast(_col(t, id_col), pa.string()).to_pylist()
            return apply_cuts(t, cuts_col=[got.get(d) for d in docs_str])

        return docs_keyed.map_batches(apply_bcast, batch_format="pyarrow")

    joined = hash_join(
        docs_keyed, rem_lists, on="__doc", how="left", num_buckets=num_buckets,
    )
    return joined.map_batches(apply_cuts, batch_format="pyarrow")
