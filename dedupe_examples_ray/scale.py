"""Shuffle-width sizing (round-2 verdict item #6).

Every bucketed shuffle in this engine — pair generation, connected
components, ``hash_join``, the DISTINCT/set-op family, the dedup family, the
partitioned sink — processes one key bucket as ONE in-task frame, so the
bucket count bounds both the shuffle's parallelism and the per-task working
set.  A fixed default of 64 meant N/64 rows per task at any scale (tens of
GB per group at 100x data).  ``buckets_for`` derives the default from a
row and/or byte estimate instead; every call site accepts an explicit
``num_buckets`` override, and ``buckets_for_dataset`` resolves a default
from Dataset metadata WITHOUT executing the plan (mid-pipeline datasets
whose size is unknown keep the floor — callers that know their row count
should pass it).
"""

from __future__ import annotations

DEFAULT_BUCKETS = 64
# Target per-bucket working set: one bucket is one pandas/Arrow frame in one
# task, so keep it comfortably inside a worker heap share.
ROWS_PER_BUCKET = 1_000_000
BYTES_PER_BUCKET = 256 << 20  # 256 MiB
MAX_BUCKETS = 65_536  # beyond this, per-bucket scheduling overhead dominates


def buckets_for(
    n_rows: int | None = None,
    n_bytes: int | None = None,
    floor: int = DEFAULT_BUCKETS,
    cap: int = MAX_BUCKETS,
) -> int:
    """Bucket count for a shuffle over an input of ``n_rows`` rows and/or
    ``n_bytes`` in-memory bytes: ``max(floor, ceil(rows/1M), ceil(bytes/256MiB))``
    clamped to ``cap``.  With no estimate, returns ``floor``."""
    est = int(floor)
    if n_rows:
        est = max(est, -(-int(n_rows) // ROWS_PER_BUCKET))
    if n_bytes:
        est = max(est, -(-int(n_bytes) // BYTES_PER_BUCKET))
    return min(int(cap), est)


def estimate_rows(ds) -> int | None:
    """Metadata-only row estimate for a Dataset.

    Returns None rather than executing the plan (a count on a mid-pipeline
    dataset would run the whole upstream); parquet reads and materialized
    datasets answer from metadata.
    """
    try:
        n = ds._meta_count()
        return int(n) if n is not None else None
    except Exception:
        return None


def buckets_for_dataset(ds, floor: int = DEFAULT_BUCKETS, cap: int = MAX_BUCKETS) -> int:
    """``buckets_for`` resolved from Dataset metadata (floor if unknown)."""
    return buckets_for(estimate_rows(ds), floor=floor, cap=cap)


def resolve_buckets(num_buckets: int | None, *datasets, n_rows: int | None = None) -> int:
    """Shared call-site helper: an explicit ``num_buckets`` wins; otherwise
    size from ``n_rows`` and/or the metadata estimates of ``datasets``
    (summed — a shuffle's working set is all its inputs)."""
    if num_buckets is not None:
        return int(num_buckets)
    total = int(n_rows) if n_rows else 0
    for ds in datasets:
        est = estimate_rows(ds)
        if est:
            total += est
    return buckets_for(total or None)


def clean_arrow(df):
    """pandas -> Arrow block with NO pandas schema metadata.

    Blocks returned from ``map_groups``/``map_batches`` as pandas frames are
    converted by Ray via ``pa.Table.from_pandas``, whose embedded pandas
    metadata makes the schema unhashable — disabling Ray's
    schema-deduplication fast path in every downstream sort/concat reduce
    (and logging one "Failed to hash the schemas" warning per task).  Hot
    stages whose output feeds another exchange should return
    ``clean_arrow(frame)`` instead of the frame.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def safe_coalesce(a, b):
    """``pc.coalesce`` with both inputs flattened first.

    pyarrow (observed on 16.1) MIS-ALIGNS differently-chunked ChunkedArray
    inputs — e.g. a single-chunk take-result against a three-chunk table
    column returned ``[1, 0, 1]`` where elementwise coalesce of
    ``[1, None, 1]`` with ``[1, 6, 3]`` is ``[1, 6, 1]`` — silently wrong
    values, not an error.  Every repo coalesce over ChunkedArrays must go
    through this helper (regression: tests/test_round5_fixes.py).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    return pc.coalesce(a, b)
