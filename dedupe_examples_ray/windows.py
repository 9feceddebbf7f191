"""Windowed / ordered operators the reference (and plain Ray Data) lack.

The reference is strictly batch (SURVEY.md §2.9) — but a training-data engine
over event streams needs windowed aggregates, sessionization, running totals,
per-key top-n and as-of joins.  Each is expressed Ray-Data-first as a
composition of ``map_batches`` (combiners) + ``groupby``/``map_groups`` with
ONE documented partitioning assumption per operator:

- ``tumbling_window``: pure derived-key groupby — reuses the combiner-pattern
  ``grouped_sum`` (no new shuffle shape; the window start is just a key).
- ``sessionize`` / ``running_sum``: shuffle once on the entity key; ordered
  logic runs vectorized (sort + diff/cumsum) inside each group.
  **Partitioning assumption: one entity's history fits in one task** — the
  same assumption any per-user sessionizer makes; salting would break the
  session chain, so skewed entities must be bounded upstream.
- ``grouped_top_n``: per-batch partial top-n (combiner) so the shuffle moves
  at most ``n`` rows per key per batch, then a final per-key top-n.
- ``asof_join``: both sides tagged and co-partitioned on the join key in one
  shuffle; within each key group a sorted ``np.searchsorted`` resolves the
  most-recent-right-row-at-or-before-left-ts (DuckDB ``ASOF JOIN`` semantics;
  ties on right ts resolved deterministically to the largest right id).

No operator here materializes its input on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import grouped_sum

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """DuckDB ROUND (half away from zero) for non-negative doubles; numpy and
    pandas round half-to-even, which differs on exact .5 boundaries."""
    scale = 10.0 ** digits
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale


def tumbling_window(
    ds,
    ts_col: str,
    keys: list[str],
    sum_cols: dict[str, str],
    multiple: int = 6,
    unit: str = "hour",
    window_col: str = "win",
    count_col: str | None = None,
    round_digits: int | None = None,
):
    """Fixed (tumbling) time-window aggregate: floor each timestamp to the
    window start, then ``grouped_sum`` on (keys..., window).

    The window start is epoch-aligned (``floor(epoch/width)*width``), matching
    ``make_timestamp(floor(epoch_us(ts)/W)*W)`` in SQL.  Scale posture is
    identical to ``grouped_sum`` — the combiner collapses each batch to one
    row per (key, window) before the shuffle.
    """
    width_us = _UNIT_SECONDS[unit] * multiple * 1_000_000

    def derive(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        # normalize to us first: pandas-born columns arrive as timestamp[ns]
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        # integer floor-divide (epoch >= 0 here), exact at any timestamp
        win = pc.multiply(pc.divide(us, width_us), width_us)
        win_ts = pc.cast(win, pa.timestamp("us"))
        cols = {k: t[k] for k in keys}
        cols[window_col] = win_ts
        for c in sum_cols:
            cols[c] = t[c]
        return pa.table(cols)

    derived = ds.map_batches(derive, batch_format="pyarrow")
    out = grouped_sum(derived, keys + [window_col], sum_cols, count_col=count_col,
                      round_digits=round_digits)
    # Ray's sort-based aggregate can downcast timestamp keys; restore us unit
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index(window_col), window_col,
            pc.cast(t[window_col], pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )


def hopping_window(
    ds,
    ts_col: str,
    keys: list[str],
    sum_cols: dict[str, str],
    width_multiple: int = 12,
    hop_multiple: int = 6,
    unit: str = "hour",
    window_col: str = "win",
    count_col: str | None = None,
    round_digits: int | None = None,
):
    """Hopping (sliding) time-window aggregate: windows of ``width`` starting
    every ``hop``; each event belongs to exactly ``width/hop`` windows and is
    replicated to each before the same combiner shuffle ``tumbling_window``
    uses.  ``width`` must be a multiple of ``hop`` (the overlap factor is the
    replication factor — bounded and explicit, never data-dependent).
    """
    width_us = _UNIT_SECONDS[unit] * width_multiple * 1_000_000
    hop_us = _UNIT_SECONDS[unit] * hop_multiple * 1_000_000
    if width_us % hop_us:
        raise ValueError("width must be a multiple of hop")
    k = width_us // hop_us

    def derive(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        # normalize to us first: pandas-born columns arrive as timestamp[ns]
        us = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        base = pc.multiply(pc.divide(us, hop_us), hop_us)
        parts = []
        for i in range(k):
            win = pc.subtract(base, i * hop_us)
            cols = {key: t[key] for key in keys}
            cols[window_col] = pc.cast(win, pa.timestamp("us"))
            for c in sum_cols:
                cols[c] = t[c]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    derived = ds.map_batches(derive, batch_format="pyarrow")
    out = grouped_sum(derived, keys + [window_col], sum_cols, count_col=count_col,
                      round_digits=round_digits)
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index(window_col), window_col,
            pc.cast(t[window_col], pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )


def bucketed_by_key(ds, key_col: str, fn, num_buckets: int = 256):
    """Run a vectorized multi-key pandas kernel over hash buckets of
    ``key_col`` — the fast shape for per-key window ops.

    ``groupby(key).map_groups(per_key)`` pays one Python call + frame build
    PER KEY (15k customers -> 15k calls); bucketing into ``num_buckets`` hash
    groups pays ~256 calls, and ``fn`` handles all of a bucket's keys at once
    with pandas ``groupby(...)`` kernels (cumsum/rolling/shift are vectorized
    across keys).  Same single shuffle, same per-task working-set bound
    (rows/num_buckets, keys never split across buckets)."""
    import pyarrow.compute as _pc

    from .pairs import stable_hash

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(
            _pc.cast(t[key_col], pa.string()).to_numpy(zero_copy_only=False)
        ) % num_buckets
        return t.append_column("__kb", pa.array(b.astype(np.int64)))

    def run(df: pd.DataFrame) -> pa.Table:
        from .scale import clean_arrow

        return clean_arrow(fn(df.drop(columns=["__kb"])))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(run, batch_format="pandas")
    )


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 1800.0,
    out_col: str = "session_id",
):
    """Gap-based sessionization: events of one entity, ordered by
    ``(ts, id)``, start a new session when the gap to the previous event
    exceeds ``gap_s`` seconds.  Session ids are 1-based per entity.

    One shuffle on ``key_col``; inside each group the chain is vectorized
    (sort + diff + cumsum).  Assumes one entity's history fits in a task (the
    session chain cannot be salted without splitting sessions).
    """
    gap_us = int(gap_s * 1_000_000)
    proj = ds.select_columns([id_col, key_col, ts_col])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="mergesort",
                            na_position="last").reset_index(drop=True)
        # explicit unit: pandas may hold datetime64[us] or [ns] depending on source
        us = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        key = df[key_col].to_numpy()
        new = np.ones(len(us), dtype=np.int64)
        if len(us) > 1:
            # null keys are ONE partition (SQL PARTITION BY semantics); the
            # isna clause covers float NaN keys where NaN != NaN
            isna = pd.isna(key)
            same_key = (key[1:] == key[:-1]) | (isna[1:] & isna[:-1])
            new[1:] = (~same_key | (np.diff(us) > gap_us)).astype(np.int64)
        # per-key cumsum, vectorized across all keys of the bucket;
        # dropna=False keeps the null-key partition accumulating
        sess = (
            pd.Series(new).groupby(pd.Series(key), sort=False, dropna=False).cumsum().to_numpy()
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                key_col: key,
                out_col: sess,
            }
        )

    return bucketed_by_key(proj, key_col, per_bucket)


def running_sum(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "running_total",
    round_digits: int | None = None,
):
    """Per-key running total in ``order_cols`` order (SQL
    ``SUM(val) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``).  One shuffle on the key; sequential accumulation order is
    fixed by the sort, so results are bit-stable across partitionings.
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        # dropna=False: a NULL key is one partition, not excluded (SQL
        # PARTITION BY semantics — advice item, round 2)
        acc = df.groupby(key_col, sort=False, dropna=False)[val_col].cumsum().to_numpy(np.float64)
        if round_digits is not None:
            acc = _round_half_away(acc, round_digits)
        df[out_col] = acc
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def moving_avg(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    window: int,
    out_col: str = "mavg",
    round_digits: int | None = None,
):
    """Per-key trailing moving average (SQL ``AVG(val) OVER (PARTITION BY key
    ORDER BY ... ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``).  Same
    single-shuffle shape as ``running_sum``; the rolling mean inside the group
    is a vectorized pandas kernel with ``min_periods=1`` (SQL frame semantics
    at the head of each partition)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        # dropna=False: pandas groupby drops null-key rows by default, which
        # shortens the rolling result vs the frame and crashes the assignment
        # (and diverges from SQL PARTITION BY, where NULL is a partition)
        m = (
            df.groupby(key_col, sort=False, dropna=False)[val_col]
            .rolling(window, min_periods=1)
            .mean()
            .reset_index(drop=True)
            .to_numpy()
        )
        if round_digits is not None:
            m = _round_half_away(m, round_digits)
        df[out_col] = m
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def moving_stat(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    window: int,
    stat: str = "median",
    out_col: str | None = None,
    round_digits: int | None = None,
):
    """Per-key trailing rolling statistic (SQL ``<stat>(val) OVER (PARTITION
    BY key ORDER BY ... ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``)
    for ``stat`` in median / min / max / std.

    Same single-shuffle shape as :func:`moving_avg`; pandas rolling kernels
    are vectorized across a bucket's keys.  ``median`` on even frames is the
    midpoint average — identical to SQL ``median`` / ``percentile_cont(0.5)``
    linear interpolation.  ``std`` is the sample standard deviation (ddof=1,
    SQL ``stddev_samp``; the first row of each partition is NULL).
    ``min_periods=1`` elsewhere matches SQL frame semantics at partition
    heads.  NULL keys form one partition (dropna=False)."""
    if stat not in ("median", "min", "max", "std"):
        raise ValueError(f"unsupported stat {stat!r}")
    out_col = out_col or f"m{stat}"

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        roll = (df.groupby(key_col, sort=False, dropna=False)[val_col]
                .rolling(window, min_periods=1))
        m = getattr(roll, stat)().reset_index(drop=True).to_numpy()
        if round_digits is not None:
            m = _round_half_away(m, round_digits)
        df[out_col] = m
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def grouped_top_n(
    ds,
    key_cols: list[str],
    by: str,
    n: int,
    ascending: bool = False,
    tie_cols: list[str] | None = None,
    rank_col: str | None = "rank",
):
    """Top-``n`` rows per key by ``by`` (deterministic tie-break on
    ``tie_cols``), with an optional 1-based rank column (SQL ``ROW_NUMBER()
    ... QUALIFY rn <= n``).

    Combiner pattern: each batch is pruned to its local per-key top-n BEFORE
    the shuffle, so at most ``n`` rows per key per batch move — a hot key
    costs ``n × num_batches`` rows, never its full row count.
    """
    order = [by] + (tie_cols or [])
    asc = [ascending] + [True] * len(tie_cols or [])

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(order, ascending=asc, kind="mergesort")
        return s.groupby(key_cols, sort=False, dropna=False).head(n)

    def final_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(key_cols + order,
                           ascending=[True] * len(key_cols) + asc,
                           kind="mergesort")
        s = s.groupby(key_cols, sort=False, dropna=False).head(n)
        if rank_col:
            s = s.reset_index(drop=True)
            s[rank_col] = (
                s.groupby(key_cols, sort=False, dropna=False).cumcount() + 1
            ).astype(np.int64)
        return s

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    # bucket on the first key (all rows of a composite key share it) and rank
    # every key of the bucket vectorized — not one map_groups call per key
    return bucketed_by_key(pruned, key_cols[0], final_bucket)


def asof_join(
    left,
    right,
    key_col: str,
    ts_col: str,
    left_id: str,
    right_id: str,
    out_right_id: str | None = None,
    how: str = "inner",
):
    """As-of join: for each left row, the right row with the same key and the
    greatest ``ts`` <= left ``ts`` (DuckDB ``ASOF JOIN ... ON l.key = r.key
    AND l.ts >= r.ts``).  Ties on right ``ts`` resolve to the largest right
    id, deterministically.

    Both sides are tagged and co-partitioned on ``key_col`` in ONE shuffle
    (no broadcast — either side may be large); within each key group a sorted
    ``np.searchsorted`` resolves every probe in O((L+R) log R).  ``how``:
    "inner" drops unmatched left rows (keeps output columns non-nullable);
    "left" keeps them with a null match id.
    """
    out_right_id = out_right_id or f"{right_id}_matched"

    def tag(side: int, id_col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: t[key_col],
                    ts_col: t[ts_col],
                    "rid": pc.cast(t[id_col], pa.int64()),
                    "side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                }
            )

        return fn

    tagged = left.select_columns([key_col, ts_col, left_id]).map_batches(
        tag(0, left_id), batch_format="pyarrow"
    ).union(
        right.select_columns([key_col, ts_col, right_id]).map_batches(
            tag(1, right_id), batch_format="pyarrow"
        )
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["side"] == 0].sort_values([ts_col, "rid"], kind="mergesort")
        r = df[df["side"] == 1].sort_values([ts_col, "rid"], kind="mergesort")
        lts = l[ts_col].to_numpy(dtype="datetime64[ns]").astype(np.int64)
        rts = r[ts_col].to_numpy(dtype="datetime64[ns]").astype(np.int64)
        # rightmost right row with rts <= lts; sort put the max-id row last
        idx = np.searchsorted(rts, lts, side="right") - 1
        matched = idx >= 0
        out = pd.DataFrame(
            {
                left_id: l["rid"].to_numpy(),
                key_col: l[key_col].to_numpy(),
                out_right_id: np.where(matched, r["rid"].to_numpy()[np.maximum(idx, 0)]
                                       if len(r) else np.zeros(len(l), np.int64), -1),
            }
        )
        if how == "inner":
            return out[matched.astype(bool)] if len(out) else out
        out[out_right_id] = out[out_right_id].where(matched, other=pd.NA).astype("Int64")
        return out

    return tagged.groupby(key_col).map_groups(per_key, batch_format="pandas")


def global_rank(
    ds,
    by: str,
    ascending: bool = True,
    tie_cols: list[str] | None = None,
    out_col: str = "rnk",
    mode: str = "rank",
    num_ranges: int = 64,
    bins: int = 4096,
):
    """Exact GLOBAL ``RANK()`` / ``ROW_NUMBER() OVER (ORDER BY by [,ties])``
    without a driver-side sort — the classic two-pass distributed ranking:

    1. one streaming pass builds a global histogram of ``by`` (numeric), whose
       cumulative counts yield ``num_ranges`` range boundaries;
    2. every row is assigned its range by ``searchsorted`` (equal keys always
       land in the same range, so ties never straddle a boundary);
    3. per-range row counts (tiny: ``num_ranges`` numbers) prefix-sum into
       global offsets on the driver;
    4. one bucketed groupby sorts each range locally and emits
       ``offset + local rank``.

    Per-task working set = one key range; the driver holds two
    ``O(bins + num_ranges)`` arrays.  ``mode="rank"``: SQL RANK (ties share;
    equal keys co-locate by construction).  ``mode="row_number"``: requires
    ``tie_cols`` that make the order total, else ranks would be
    partition-order-dependent.  ``mode="dense_rank"``: SQL DENSE_RANK — the
    per-range offsets come from per-range DISTINCT-value counts (a per-batch
    distinct combiner feeds one extra tiny aggregate; since equal keys never
    straddle a range boundary, per-range distinct counts are additive).
    ``mode="cume_count"``: internal for :func:`cume_dist` — emits the last
    tie-group position (rows with key <= current).
    NULL keys rank last (DuckDB ASC default), tie-broken like any other
    equal-key group; under dense_rank all NULLs share one dense value.
    """
    if mode not in ("rank", "row_number", "dense_rank", "cume_count"):
        raise ValueError(mode)
    if mode == "row_number" and not tie_cols:
        raise ValueError("row_number needs tie_cols for a total order")
    ties = list(tie_cols or [])

    # pass 1: global histogram -> range boundaries on the key
    def minmax(t: pa.Table):
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        v = t[by].drop_null()
        if len(v) == 0:  # non-empty batch, all-null key: rankable (NULLS LAST)
            return pa.table({"lo": [np.nan], "hi": [np.nan]})
        arr = v.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"lo": [float(arr.min())], "hi": [float(arr.max())]})

    mm = ds.select_columns([by]).map_batches(minmax, batch_format="pyarrow").to_pandas()
    if len(mm) == 0:
        return ds  # empty input
    lo = float(np.nan_to_num(mm["lo"].min(), nan=0.0))
    hi = float(np.nan_to_num(mm["hi"].max(), nan=0.0))
    edges = np.linspace(lo, hi, bins + 1)[1:-1] if hi > lo else np.array([])

    def hist(t: pa.Table):
        v = t[by].drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        counts = np.bincount(np.searchsorted(edges, v, side="right"),
                             minlength=bins).astype(np.int64)
        return pa.table({"h": pa.array([counts.tolist()], pa.list_(pa.int64()))})

    hp = ds.select_columns([by]).map_batches(hist, batch_format="pyarrow").to_pandas()
    counts = np.zeros(bins, dtype=np.int64)
    for h in hp["h"].to_numpy():
        counts += np.asarray(h, dtype=np.int64)
    # choose range boundaries at ~equal cumulative mass over bin EDGES (ties
    # inside one bin can't be split — they share a bin, hence a range)
    cum = counts.cumsum()
    total = int(cum[-1]) if len(cum) else 0
    targets = np.linspace(0, total, num_ranges + 1)[1:-1]
    cut_idx = np.unique(np.searchsorted(cum, targets))
    cuts = edges[np.clip(cut_idx, 0, max(len(edges) - 1, 0))] if len(edges) else np.array([])

    def assign(t: pa.Table) -> pa.Table:
        v = t[by].to_numpy(zero_copy_only=False).astype(np.float64)
        valid = pc.is_valid(t[by]).to_numpy(zero_copy_only=False)
        r = (np.searchsorted(cuts, np.nan_to_num(v, nan=0.0), side="right")
             if len(cuts) else np.zeros(len(v), dtype=np.int64))
        r = np.asarray(r, dtype=np.int64)
        if not ascending:
            r = len(cuts) - r  # reverse range order for DESC
        r = np.where(valid, r, len(cuts) + 1)  # NULLS LAST
        return t.append_column("__rng", pa.array(r))

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    # pass 2a: per-range counts -> offsets (tiny driver table)
    def rng_counts(t: pa.Table):
        vc = pc.value_counts(t["__rng"])
        return pa.table({"r": vc.field("values"), "n": vc.field("counts").cast(pa.int64())})

    if mode == "dense_rank":
        # per-range DISTINCT counts: per-batch distinct (range, value) pairs
        # (combiner) -> one grouped nunique per range; equal values share a
        # range, so the counts prefix-sum into exact dense offsets
        def batch_distinct(t: pa.Table) -> pa.Table:
            return t.group_by(["__rng", by]).aggregate([])

        def per_range_nd(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"r": [int(df["__rng"].iloc[0])],
                 "n": [int(df[by].nunique(dropna=False))]}
            )

        rc = (
            assigned.select_columns(["__rng", by])
            .map_batches(batch_distinct, batch_format="pyarrow")
            .groupby("__rng")
            .map_groups(per_range_nd, batch_format="pandas")
            .to_pandas()
            .groupby("r")["n"].sum().sort_index()
        )
    else:
        rc = (
            assigned.select_columns(["__rng"])
            .map_batches(rng_counts, batch_format="pyarrow")
            .to_pandas()
            .groupby("r")["n"].sum().sort_index()
        )
    offsets = {int(r): int(o) for r, o in zip(rc.index, rc.cumsum().shift(fill_value=0))}

    # pass 2b: local sort + offset within each range
    def rank_range(df: pd.DataFrame) -> pd.DataFrame:
        r = int(df["__rng"].iloc[0])
        df = df.sort_values([by] + ties, ascending=[ascending] + [True] * len(ties),
                            kind="mergesort", na_position="last").reset_index(drop=True)
        if mode == "row_number":
            local = np.arange(1, len(df) + 1, dtype=np.int64)
        else:
            key = df[by]
            starts = key.ne(key.shift()) & ~(key.isna() & key.isna().shift(fill_value=False))
            starts.iloc[0] = True
            if mode == "dense_rank":
                local = starts.cumsum().to_numpy(np.int64)
            elif mode == "cume_count":
                # last 1-based position of each tie group (CUME_DIST numerator:
                # rows with key <= this key within the range, + range offset)
                gid = starts.cumsum().to_numpy()
                local = (
                    pd.Series(np.arange(1, len(df) + 1))
                    .groupby(gid).transform("max").to_numpy(np.int64)
                )
            else:
                local = np.where(starts, np.arange(len(df)) + 1, 0)
                local = pd.Series(local).replace(0, np.nan).ffill().to_numpy(np.int64)
        df[out_col] = local + offsets.get(r, 0)
        return df.drop(columns=["__rng"])

    from .scale import clean_arrow

    return assigned.groupby("__rng").map_groups(
        lambda df: clean_arrow(rank_range(df)), batch_format="pandas"
    )


def lag_lead(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    offsets: dict[str, int] | None = None,
):
    """Per-key ``LAG``/``LEAD`` (SQL ``LAG(val, n) OVER (PARTITION BY key
    ORDER BY ...)``) — ``offsets`` maps output column -> shift (positive =
    LAG/look-back, negative = LEAD/look-ahead); default ``{"lag_1": 1,
    "lead_1": -1}``.  One bucketed shuffle; pandas grouped ``shift`` is
    vectorized across all keys of a bucket.  NULL keys form one partition
    (SQL semantics)."""
    offsets = offsets or {"lag_1": 1, "lead_1": -1}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        g = df.groupby(key_col, sort=False, dropna=False)[val_col]
        for out_col, k in offsets.items():
            df[out_col] = g.shift(k)
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def locf(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "filled",
):
    """Per-key forward fill — LOCF, last observation carried forward (SQL
    ``LAST_VALUE(val IGNORE NULLS) OVER (PARTITION BY key ORDER BY ... ROWS
    UNBOUNDED PRECEDING)``): gap-fill a sparse metric along each key's
    timeline; leading NULLs (no prior observation) stay NULL.  One bucketed
    shuffle; pandas grouped ``ffill`` is vectorized across all keys of a
    bucket.  NULL keys form one partition (SQL semantics)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        df[out_col] = df.groupby(key_col, sort=False, dropna=False)[val_col].ffill()
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def first_last_value(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    first_col: str = "first_val",
    last_col: str = "last_val",
):
    """Per-key ``FIRST_VALUE``/``LAST_VALUE`` over the full partition (SQL
    ``FIRST_VALUE(val) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``).  One bucketed shuffle;
    pandas grouped ``transform("first"/"last")`` is vectorized across all
    keys of a bucket.  NULL keys form one partition (SQL semantics).

    NB: pandas ``transform`` skips NaN values; SQL FIRST_VALUE does not — so
    the first/last row's value is taken positionally via head/tail maps."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        g = df.groupby(key_col, sort=False, dropna=False)
        # positional first/last (NaN-preserving, unlike transform("first"))
        idx_first = g[val_col].head(1)
        idx_last = g[val_col].tail(1)
        gid = g.ngroup()
        df[first_col] = idx_first.to_numpy()[gid.to_numpy()]
        # tail(1) rows are in group order too: map gid -> that row's value
        df[last_col] = idx_last.to_numpy()[gid.to_numpy()]
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def percent_rank(
    ds,
    by: str,
    ascending: bool = True,
    out_col: str = "prnk",
    round_digits: int | None = 6,
):
    """Exact global ``PERCENT_RANK() OVER (ORDER BY by)`` =
    ``(rank - 1) / (n - 1)`` — reuses the two-pass range-partitioned
    ``global_rank`` (no driver sort, no extra shuffle beyond it; the total
    row count is one streaming aggregate)."""
    n = ds.count()
    ranked = global_rank(ds, by=by, ascending=ascending, mode="rank", out_col="__r")

    def fin(t: pa.Table) -> pa.Table:
        r = t["__r"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = (r - 1.0) / max(n - 1, 1)
        if round_digits is not None:
            p = _round_half_away(p, round_digits)
        return t.drop_columns(["__r"]).append_column(out_col, pa.array(p, pa.float64()))

    return ranked.map_batches(fin, batch_format="pyarrow")


def cume_dist(
    ds,
    by: str,
    ascending: bool = True,
    out_col: str = "cd",
    round_digits: int | None = 6,
):
    """Exact global ``CUME_DIST() OVER (ORDER BY by)`` = (rows with key <=
    current) / n — the numerator is the last tie-group position from the
    two-pass range-partitioned ``global_rank`` (``mode="cume_count"``; ties
    never straddle a range boundary, so offset + local last-position is
    exact).  NULL keys rank last, sharing cume_dist = 1.0 (SQL NULLS LAST)."""
    n = ds.count()
    ranked = global_rank(ds, by=by, ascending=ascending, mode="cume_count",
                         out_col="__c")

    def fin(t: pa.Table) -> pa.Table:
        c = t["__c"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = c / max(n, 1)
        if round_digits is not None:
            p = _round_half_away(p, round_digits)
        return t.drop_columns(["__c"]).append_column(out_col, pa.array(p, pa.float64()))

    return ranked.map_batches(fin, batch_format="pyarrow")


def ntile(
    ds,
    by: str,
    n: int,
    tie_cols: list[str] | None = None,
    ascending: bool = True,
    out_col: str = "tile",
):
    """Exact global ``NTILE(n) OVER (ORDER BY by [, ties])`` via the
    range-partitioned ``ROW_NUMBER`` (requires ``tie_cols`` for a total
    order, same as ``mode="row_number"``): SQL semantics — the first
    ``total % n`` tiles get ``ceil(total/n)`` rows, the rest get
    ``floor(total/n)``."""
    total = ds.count()
    ranked = global_rank(ds, by=by, ascending=ascending, mode="row_number",
                         tie_cols=tie_cols, out_col="__rn")
    big, rem = divmod(total, n) if n else (0, 0)

    def fin(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy(zero_copy_only=False).astype(np.int64) - 1
        cutoff = (big + 1) * rem
        tile = np.where(
            rn < cutoff,
            rn // max(big + 1, 1),
            rem + (rn - cutoff) // max(big, 1),
        ) + 1
        return t.drop_columns(["__rn"]).append_column(out_col, pa.array(tile.astype(np.int64)))

    return ranked.map_batches(fin, batch_format="pyarrow")


def nth_value(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    n: int,
    out_col: str = "nth_val",
):
    """Per-key ``NTH_VALUE(val, n)`` over the full partition (SQL
    ``NTH_VALUE(val, n) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)``): the value at 1-based
    position ``n`` of the ordered partition, NULL when the partition has
    fewer than ``n`` rows.  One bucketed shuffle; the nth row per group is
    taken positionally from group offsets (vectorized across all keys of a
    bucket, NaN-preserving like first_last_value).  NULL keys form one
    partition (SQL semantics)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        g = df.groupby(key_col, sort=False, dropna=False)
        gid = g.ngroup().to_numpy()
        sizes = g.size().to_numpy()
        starts = np.zeros(len(sizes), np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        vals = df[val_col].to_numpy()
        nth = np.empty(len(sizes), dtype=object)
        nth[:] = None
        ok = sizes >= n
        nth[ok] = vals[(starts + n - 1)[ok]]
        out = nth[gid]
        if np.issubdtype(vals.dtype, np.number):
            # numeric val -> float64 (short partitions yield NULL, so the
            # SQL output type is nullable numeric; DuckDB's df() gives float64)
            out = pd.array(out, dtype="float64").to_numpy(dtype=np.float64,
                                                          na_value=np.nan)
        df[out_col] = out
        return df

    return bucketed_by_key(ds, key_col, per_bucket)


def trailing_interval_agg(ds, key_col: str, ts_col: str, val_col: str,
                          interval_s: float, round_digits: int = 6):
    """Trailing time-interval window aggregate — SQL ``SUM(val) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL x PRECEDING AND
    CURRENT ROW)`` plus the matching ``COUNT(*)``: per row, the sum/count of
    the same key's rows whose timestamp lies in ``[ts - interval, ts]``.
    RANGE peer semantics: rows sharing the current row's exact timestamp are
    ALL in frame, whichever side of it they sort on.

    One bucketed key-hash shuffle (``bucketed_by_key``); inside a bucket the
    kernel sorts once, builds two cumulative sums, and resolves each key
    segment's frame bounds with two ``searchsorted`` calls — O(n log n) per
    bucket, no per-row Python.  NULL keys form one partition; NULL
    timestamps sort first and are mutual peers; NULL values are excluded
    from the sum (an all-NULL frame sums to NULL) but counted by
    ``trail_n`` (SQL ``COUNT(*)``).

    Appends ``trail_sum`` and ``trail_n``.
    """
    interval_us = int(round(interval_s * 1_000_000))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable",
                            na_position="first").reset_index(drop=True)
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        tsv = pd.to_datetime(df[ts_col]).to_numpy(dtype="datetime64[us]")
        ts = tsv.astype(np.int64)
        # NaT -> a huge negative sentinel; keep subtraction overflow-free
        ts = np.where(np.isnat(tsv), np.int64(-(2 ** 62)), ts)
        v = pd.to_numeric(df[val_col], errors="coerce").to_numpy(np.float64)
        valid = ~np.isnan(v)
        cv = np.cumsum(np.where(valid, v, 0.0))
        cn = np.cumsum(valid.astype(np.int64))
        n = len(df)
        lb = np.empty(n, np.int64)
        ub = np.empty(n, np.int64)
        change = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if n else np.array([], np.int64)
        bounds = np.r_[change, n]
        for gi in range(len(change)):
            s, e = bounds[gi], bounds[gi + 1]
            seg = ts[s:e]
            lb[s:e] = s + np.searchsorted(seg, seg - interval_us, side="left")
            ub[s:e] = s + np.searchsorted(seg, seg, side="right")
        tsum = cv[ub - 1] - np.where(lb > 0, cv[lb - 1], 0.0)
        nn = cn[ub - 1] - np.where(lb > 0, cn[lb - 1], 0)
        scale = 10.0 ** round_digits
        tsum = np.where(nn > 0,
                        np.sign(tsum) * np.floor(np.abs(tsum) * scale + 0.5) / scale,
                        np.nan)
        out = df.copy()
        out["trail_sum"] = tsum
        out["trail_n"] = (ub - lb).astype(np.int64)
        return out

    return bucketed_by_key(ds, key_col, fn)


def funnel_steps(ds, key_col: str, ts_col: str, type_col: str,
                 steps: list[str]):
    """Ordered-funnel analysis over an event stream: for each prefix of
    ``steps``, how many distinct keys (users) performed those event types
    as a subsequence in timestamp order.  Greedy earliest-match semantics
    (exact for subsequence existence): step k matches the key's earliest
    event of type ``steps[k]`` at-or-after its step-(k-1) match time, so a
    later step may share the earlier step's timestamp.  NULL keys are not
    counted (SQL join-on-key semantics).  The reference has no analog; this
    is event-stream analytics for the training-data engine.

    Distribution: one bucketed key-hash shuffle (``bucketed_by_key``); each
    bucket resolves all its keys' funnels with ``len(steps)`` vectorized
    groupby-min passes and emits ``len(steps)`` partial-count rows, so only
    O(k x num_buckets) rows exist after the shuffle — merged on the driver
    (bounded, tiny).

    Returns one row per step: ``(step:int64, event_type:string,
    n_keys:int64)``, cumulative-funnel counts (non-increasing in step).
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[type_col].isin(steps) & df[key_col].notna()]
        counts = []
        cur = None  # per-key earliest completion ts of the previous step
        for s in steps:
            m = df[df[type_col] == s]
            if cur is not None:
                prev = m[key_col].map(cur)
                m = m[m[ts_col] >= prev]  # NaN prev -> False -> key dropped
            cur = m.groupby(key_col)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame({"step": np.arange(1, k + 1, dtype=np.int64),
                             "event_type": steps,
                             "n_keys": np.asarray(counts, np.int64)})

    proj = ds.select_columns([key_col, ts_col, type_col])
    partials = bucketed_by_key(proj, key_col, per_bucket)
    out = partials.to_pandas()  # O(k x buckets) rows by construction
    out = (out.groupby(["step", "event_type"], as_index=False)["n_keys"]
           .sum().sort_values("step").reset_index(drop=True))
    return out


def transition_counts(ds, key_col: str, ts_col: str, type_col: str,
                      id_col: str):
    """Per-key consecutive event-type transition counts — the Markov-chain
    transition matrix of an event stream in long form: ``(prev_type,
    event_type, n)`` where ``n`` counts adjacent pairs in each key's history
    ordered by ``(ts, id)`` (the id breaks timestamp ties deterministically).
    Each key's first event has no predecessor and emits nothing — SQL
    ``LAG(type) OVER (PARTITION BY key ORDER BY ts, id)`` with the NULL-lag
    rows filtered.

    Distribution: one bucketed key-hash shuffle; inside a bucket the kernel
    sorts once and shifts within key segments (vectorized), then collapses
    to per-bucket partial counts — O(#distinct transitions) rows per bucket
    travel to the final merge, never the events themselves.
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable",
                            na_position="first").reset_index(drop=True)
        codes, _ = pd.factorize(df[key_col], use_na_sentinel=False)
        prev = df[type_col].shift(1)
        same = np.r_[False, codes[1:] == codes[:-1]]
        m = pd.DataFrame({"prev_type": prev[same],
                          "event_type": df[type_col][same]})
        out = (m.groupby(["prev_type", "event_type"], as_index=False,
                         dropna=False).size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    proj = ds.select_columns([key_col, ts_col, type_col, id_col])
    partials = bucketed_by_key(proj, key_col, per_bucket)
    out = partials.to_pandas()  # O(|type-alphabet|^2 x buckets) rows
    out = (out.groupby(["prev_type", "event_type"], as_index=False,
                       dropna=False)["n"].sum()
           .sort_values(["prev_type", "event_type"]).reset_index(drop=True))
    return out


def cohort_retention(ds, key_col: str, ts_col: str,
                     period_s: float = 604800.0):
    """Cohort retention over an event stream: keys are grouped into weekly
    cohorts by their FIRST event (cohort = Monday-start week of the first
    event, SQL ``date_trunc('week', min(ts))``), and each cohort reports how
    many distinct keys were active at each whole-period offset from that
    first event (``floor((epoch(ts) - epoch(first_ts)) / period)``).

    Distribution: one bucketed key-hash shuffle; a key's whole history lands
    in one bucket, so per-key first-event and the distinct
    (cohort, offset, key) triples are exact within the bucket, and each
    bucket emits only per-(cohort, offset) partial counts — distinct keys
    cannot repeat across buckets, so summing partials is exact.  NULL keys
    and NULL timestamps are excluded (SQL join/aggregate semantics).

    Returns ``(cohort_week:timestamp, week_offset:int64, n_keys:int64)``.
    """
    period_us = int(round(period_s * 1_000_000))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key_col].notna() & df[ts_col].notna()]
        ts = pd.to_datetime(df[ts_col]).to_numpy(dtype="datetime64[us]")
        tsi = ts.astype(np.int64)
        d = pd.DataFrame({key_col: df[key_col].to_numpy(), "__ts": tsi})
        t0 = d.groupby(key_col, sort=False)["__ts"].transform("min")
        t0d = pd.Series(t0.to_numpy().astype("datetime64[us]"))
        cohort = (t0d - pd.to_timedelta(t0d.dt.weekday, unit="D")).dt.normalize()
        off = (d["__ts"].to_numpy() - t0.to_numpy()) // period_us
        trip = pd.DataFrame({
            "cohort_week": cohort.to_numpy(),
            "week_offset": off.astype(np.int64),
            "__k": d[key_col].to_numpy(),
        }).drop_duplicates()
        out = (trip.groupby(["cohort_week", "week_offset"], as_index=False)
               .size().rename(columns={"size": "n_keys"}))
        out["n_keys"] = out["n_keys"].astype(np.int64)
        return out

    proj = ds.select_columns([key_col, ts_col])
    partials = bucketed_by_key(proj, key_col, per_bucket)
    out = partials.to_pandas()  # O(cohorts x offsets x buckets) rows
    out = (out.groupby(["cohort_week", "week_offset"], as_index=False)
           ["n_keys"].sum()
           .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True))
    # pandas timedelta arithmetic upcasts to ns; pin the SQL-facing dtype
    out["cohort_week"] = out["cohort_week"].astype("datetime64[us]")
    return out


def resample_locf(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    start: str = "2024-01-01 12:00:00",
    end: str = "2024-01-30 12:00:00",
    step_hours: int = 24,
    out_ts: str = "gts",
    out_val: str = "value",
    num_buckets: int = 256,
):
    """Regular-time-grid resampling with last-observation-carried-forward:
    for every key in the input and every grid instant in
    ``[start, end]`` stepped by ``step_hours``, the value of the latest
    observation at or before the instant (NULL before a key's first
    observation) — DuckDB's ``keys CROSS JOIN generate_series ASOF LEFT
    JOIN obs`` in one bucketed shuffle.

    Duplicate ``(key, ts)`` observations collapse by MAX first (ASOF over
    exact-tie timestamps is otherwise ambiguous in both engines — the
    oracle mirrors the GROUP BY).  Inside each hash bucket the whole grid
    resolves with ONE ``pd.merge_asof`` (C-level, vectorized across keys
    via ``by=``); the grid replication factor (#instants per key) is
    explicit and bounded by the parameters, never data-dependent.
    """
    grid = pd.date_range(start=start, end=end,
                         freq=pd.Timedelta(hours=step_hours)).astype(
        "datetime64[us]")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        obs = (df.groupby([key_col, ts_col], as_index=False)[val_col]
               .max())
        obs[ts_col] = obs[ts_col].astype("datetime64[us]")
        keys = obs[key_col].drop_duplicates().to_numpy()
        left = pd.DataFrame({
            key_col: np.repeat(keys, len(grid)),
            out_ts: np.tile(grid.to_numpy(), len(keys)),
        }).sort_values(out_ts, kind="mergesort")
        right = obs.sort_values(ts_col, kind="mergesort")
        out = pd.merge_asof(left, right, left_on=out_ts, right_on=ts_col,
                            by=key_col, direction="backward")
        out = out[[key_col, out_ts, val_col]].rename(
            columns={val_col: out_val})
        return out.sort_values([key_col, out_ts], kind="mergesort")

    prepared = ds.select_columns([key_col, ts_col, val_col])
    return bucketed_by_key(prepared, key_col, per_bucket,
                           num_buckets=num_buckets)


def ewma(
    ds,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    alpha: float,
    out_col: str = "ewma",
    round_digits: int | None = None,
):
    """Per-key exponentially weighted moving average in ``order_cols`` order
    — the recursive smoother ``s_i = alpha*x_i + (1-alpha)*s_{i-1}``,
    ``s_1 = x_1`` (pandas ``ewm(alpha, adjust=False)`` semantics, the
    time-series monitoring default).

    SQL-reproducible via the closed form (the oracle contract):

        s_i = (1-a)^(i-1) * x_1 + sum_{j=2..i} a*(1-a)^(i-j) * x_j

    which needs only ROW_NUMBER + POW + a windowed SUM — no recursion.
    ``(1-a) < 1`` so the powers underflow toward 0 harmlessly on long keys.

    One bucketed key shuffle (``bucketed_by_key``); per-bucket work is the
    C-level pandas groupby-ewm kernel across all of the bucket's keys at
    once.  NULL keys form one partition (SQL PARTITION BY).  NULL values are
    propagated as-is by pandas ewm (ignore_na=False: they don't advance the
    recursion but decay weights) — restrict to non-null value columns for
    oracle parity.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            na_position="last").reset_index(drop=True)
        s = (df.groupby(key_col, sort=False, dropna=False)[val_col]
             .transform(lambda v: v.ewm(alpha=alpha, adjust=False).mean())
             .to_numpy(np.float64))
        if round_digits is not None:
            s = _round_half_away(s, round_digits)
        df[out_col] = s
        return df

    return bucketed_by_key(ds, key_col, per_bucket)
