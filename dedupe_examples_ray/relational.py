"""Relational operators backing the reference's SQL-side computation.

The reference delegates DISTINCT / grouped sums / top-k / joins to the
database (SURVEY.md §2.4-§2.6: A1-A6, O1, J5, J6).  Here they are Ray-Data
stages with explicit scale posture:

- ``grouped_sum``: **combiner pattern** — partial aggregation inside
  ``map_batches`` (one row per key per batch), then the small shuffle
  aggregates partials.  The all-to-all moves per-batch-distinct keys, not raw
  rows.
- ``distinct``: per-batch combiner + bucketed hash shuffle + vectorized
  drop_duplicates (A1).
- ``top_k``: grouped-sum -> sort -> limit (O1, mysql_example.py:324-336).
- ``broadcast_left_join``: the small side (an aggregate / dimension table)
  ships once via ``ray.put``; lookup happens per batch — no shuffle of the
  big side (J6 COALESCE completion included).
- ``dim_join``: chained broadcast joins for star-schema dimensions (J5).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .scale import clean_arrow as _clean_arrow


def grouped_sum(ds, keys: list[str], sum_cols: dict[str, str], count_col: str | None = None,
                round_digits: int | None = None):
    """``SELECT keys, SUM(col) AS alias..., COUNT(*) FROM ds GROUP BY keys``.

    ``sum_cols``: {source_col: output_alias}.  Partial-aggregates per batch
    before the shuffle (combiner), then a bucketed hash shuffle with a
    vectorized pandas sum per bucket (4x faster than the built-in sort-based
    Aggregate operator on this workload; same genuinely-distributed shape —
    each bucket is one task over ~|groups|/num_buckets rows).  NULL group
    keys form their own group (SQL GROUP BY semantics, dropna=False).
    """
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(None, ds)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + list(sum_cols)).to_pandas()
        if sum_cols:
            agg = {c: "sum" for c in sum_cols}
            g = df.groupby(keys, as_index=False, sort=False, dropna=False).agg(agg)
            if count_col:
                cnt = df.groupby(keys, as_index=False, sort=False, dropna=False).size()
                g[count_col] = cnt["size"].to_numpy()
        else:  # count-only grouping (SELECT keys, COUNT(*) ...)
            g = df.groupby(keys, as_index=False, sort=False, dropna=False).size().rename(
                columns={"size": count_col})
        g["__bkt"] = (
            pd.util.hash_pandas_object(g[keys], index=False).to_numpy() % num_buckets
        ).astype(np.int64)
        return _clean_arrow(g)

    def final(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns="__bkt")
        agg = {c: "sum" for c in sum_cols}
        if count_col:
            agg[count_col] = "sum"
        g = df.groupby(keys, as_index=False, sort=False, dropna=False).agg(agg)
        return _clean_arrow(g.rename(columns=dict(sum_cols)))

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby("__bkt").map_groups(final, batch_format="pandas")
    if round_digits is not None:
        def rnd(t: pa.Table) -> pa.Table:
            for alias in sum_cols.values():
                i = t.column_names.index(alias)
                t = t.set_column(i, alias, pc.round(t[alias], ndigits=round_digits))
            return t

        out = out.map_batches(rnd, batch_format="pyarrow")
    return out


def distinct(ds, cols: list[str], num_buckets: int | None = None):
    """``SELECT DISTINCT cols`` (reference A1, mysql_init_db.py:134-143).

    Per-batch drop_duplicates (combiner) -> bucketed shuffle on a row hash ->
    vectorized drop_duplicates per bucket; no per-row groups.
    """
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def local(df: pd.DataFrame) -> pa.Table:
        u = df[cols].drop_duplicates()
        u["bucket"] = (
            pd.util.hash_pandas_object(u, index=False).to_numpy() % num_buckets
        ).astype(np.int64)
        return _clean_arrow(u)

    proj = ds.select_columns(cols).map_batches(local, batch_format="pandas")
    return proj.groupby("bucket").map_groups(
        lambda df: _clean_arrow(
            df.drop_duplicates(subset=cols).drop(columns=["bucket"])
        ),
        batch_format="pandas",
    )


def top_k(ds, by: str, k: int, tie_cols: list[str] | None = None):
    """``ORDER BY by DESC[, ties] LIMIT k`` with deterministic tie-break."""
    cols = [by] + (tie_cols or [])
    desc = [True] + [False] * len(tie_cols or [])
    return ds.sort(cols, descending=desc).limit(k)


class _BroadcastJoiner:
    """Left join against a broadcast right side (pandas merge per batch)."""

    def __init__(self, right_ref, on: str, fill: dict | None):
        import ray

        self.right = ray.get(right_ref) if isinstance(right_ref, ray.ObjectRef) else right_ref
        self.on = on
        self.fill = fill or {}

    def __call__(self, t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.merge(self.right, how="left", on=self.on)
        for col, val in self.fill.items():
            out[col] = out[col].fillna(val)
            if isinstance(val, int):
                out[col] = out[col].astype(np.int64)
        return _clean_arrow(out)


_JOINER_CACHE: dict = {}
_JOINER_CACHE_CAP = 8


def _broadcast_join_cached(t: pa.Table, *, right_ref, on, fill, fill_key) -> pa.Table:
    """Task-form _BroadcastJoiner: plain tasks reuse the warm worker pool (no
    actor cold-start); the right side is fetched once per worker per ref."""
    key = (right_ref.hex() if hasattr(right_ref, "hex") else id(right_ref), on, fill_key)
    fn = _JOINER_CACHE.get(key)
    if fn is None:
        fn = _BroadcastJoiner(right_ref, on, fill)
        if len(_JOINER_CACHE) >= _JOINER_CACHE_CAP:
            _JOINER_CACHE.pop(next(iter(_JOINER_CACHE)))
        _JOINER_CACHE[key] = fn
    return fn(t)


def broadcast_left_join(ds, right_df: pd.DataFrame, on: str, fill: dict | None = None,
                        concurrency=None):
    """LEFT JOIN with a small broadcast right side + COALESCE fills (J6)."""
    import ray

    ref = ray.put(right_df)
    return ds.map_batches(
        _broadcast_join_cached,
        fn_kwargs=dict(right_ref=ref, on=on, fill=fill,
                       fill_key=tuple(sorted(fill.items())) if fill else ()),
        batch_format="pyarrow",
        **(dict(concurrency=concurrency) if concurrency else {}),
    )


def dim_join(fact_ds, dims: list[tuple[pd.DataFrame, str]], select: list[str] | None = None,
             concurrency=None):
    """Chained broadcast joins against dimension tables (star-schema J5)."""
    out = fact_ds
    for right_df, key in dims:
        out = broadcast_left_join(out, right_df, key, concurrency=concurrency)
    if select:
        out = out.select_columns(select)
    return out


def filter_batches(ds, predicate):
    """Vectorized filter: predicate(pa.Table) -> boolean mask array."""
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow"
    )


def grouped_stats(ds, keys: list[str], col: str, round_digits: int = 4,
                  prefix: str | None = None):
    """``SELECT keys, AVG(col), MIN(col), MAX(col), COUNT(*) GROUP BY keys``.

    Combiner pattern: each batch collapses to one (sum, count, min, max) row
    per key before the shuffle; avg is derived after the global merge (a mean
    of means would be wrong under uneven batch sizes).
    """
    from ray.data.aggregate import Max, Min, Sum

    p = prefix or col

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [col]).to_pandas()
        g = df.groupby(keys, as_index=False, sort=False)[col].agg(
            ["sum", "count", "min", "max"]
        ).reset_index(drop=True)
        g.columns = keys + ["_s", "_c", "_mn", "_mx"]
        return _clean_arrow(g)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    merged = partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(
        Sum("_s", alias_name="_s"),
        Sum("_c", alias_name="_c"),
        Min("_mn", alias_name="_mn"),
        Max("_mx", alias_name="_mx"),
    )

    def finish(t: pa.Table) -> pa.Table:
        s = np.asarray(t["_s"].to_pylist(), dtype=np.float64)
        c = np.asarray(t["_c"].to_pylist(), dtype=np.float64)
        scale = 10.0 ** round_digits
        rnd = lambda x: np.floor(np.asarray(x, np.float64) * scale + 0.5) / scale
        cols = {k: t[k] for k in keys}
        cols[f"avg_{p}"] = pa.array(rnd(s / np.maximum(c, 1.0)), pa.float64())
        cols[f"min_{p}"] = pa.array(rnd(t["_mn"].to_pylist()), pa.float64())
        cols[f"max_{p}"] = pa.array(rnd(t["_mx"].to_pylist()), pa.float64())
        cols["n"] = pa.array(c.astype(np.int64), pa.int64())
        return pa.table(cols)

    return merged.map_batches(finish, batch_format="pyarrow")


def grouped_corr(ds, keys: list[str], x: str, y: str, out_col: str = "corr_xy",
                 round_digits: int | None = 4):
    """Grouped Pearson correlation (SQL ``corr(x, y) GROUP BY keys``) via the
    distributed-moments combiner: each batch collapses to one row of raw
    moments ``(n, sx, sy, sxx, syy, sxy)`` per key, the small shuffle sums
    them, and the final map computes the closed form.  Rows where either
    value is NULL are excluded pairwise (SQL corr semantics)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [x, y]).to_pandas()
        df = df.dropna(subset=[x, y])
        xv, yv = df[x].astype(np.float64), df[y].astype(np.float64)
        g = df.assign(
            __n=1.0, __sx=xv, __sy=yv, __sxx=xv * xv, __syy=yv * yv, __sxy=xv * yv
        ).groupby(keys, as_index=False, sort=False)[
            ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"]
        ].sum()
        return _clean_arrow(g)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    aggs = [Sum(c, alias_name=c) for c in ("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")]
    merged = partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(*aggs)

    def final(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False)
        sx = t["__sx"].to_numpy(zero_copy_only=False)
        sy = t["__sy"].to_numpy(zero_copy_only=False)
        sxx = t["__sxx"].to_numpy(zero_copy_only=False)
        syy = t["__syy"].to_numpy(zero_copy_only=False)
        sxy = t["__sxy"].to_numpy(zero_copy_only=False)
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        denom = np.sqrt(np.maximum(var_x, 0.0) * np.maximum(var_y, 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(denom > 0, (n * sxy - sx * sy) / denom, np.nan)
        if round_digits is not None:
            sign = np.sign(r)
            r = sign * np.floor(np.abs(r) * 10.0 ** round_digits + 0.5) / 10.0 ** round_digits
        out = t.select(keys).append_column(out_col, pa.array(r, pa.float64()))
        return out

    return merged.map_batches(final, batch_format="pyarrow")


def grouped_quantile(ds, keys: list[str], col: str, qs: dict[str, float],
                     round_digits: int = 4, method: str = "linear"):
    """Exact per-group quantiles.  ``method="linear"`` is interpolated
    (``quantile_cont`` semantics); ``method="disc"`` is the discrete
    percentile (``quantile_disc`` / ``percentile_disc``: the first actual
    value whose cumulative rank reaches q, i.e. ``sorted[ceil(q*n)-1]``).
    One shuffle on the keys; the whole group's values sort inside one task,
    so this is the exact path for bounded groups — for groups that exceed
    task memory at 100 TB, switch to a mergeable sketch (KLL/t-digest) with
    the same output schema (``approx_quantile`` below is that path for the
    ungrouped case).
    """
    if method not in ("linear", "disc"):
        raise ValueError(f"method must be 'linear' or 'disc', got {method!r}")

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[col].to_numpy(dtype=np.float64))
        scale = 10.0 ** round_digits
        out = {k: [df[k].iloc[0]] for k in keys}
        for name, q in qs.items():
            if method == "disc":
                idx = max(0, int(np.ceil(q * len(v))) - 1)
                val = float(v[idx])
            else:
                val = float(np.percentile(v, q * 100.0, method="linear"))
            out[name] = [np.floor(val * scale + 0.5) / scale]
        return pd.DataFrame(out)

    proj = ds.select_columns(keys + [col])
    return proj.groupby(keys if len(keys) > 1 else keys[0]).map_groups(
        per_group, batch_format="pandas"
    )


def grouped_mad(ds, keys: list[str], col: str, out_col: str = "mad",
                round_digits: int = 4):
    """Per-group median absolute deviation — ``mad(col) GROUP BY keys``
    (median of ``|x - median(x)|``, both medians interpolated, no scaling
    constant — DuckDB/R semantics).  Needs the full group in one task (two
    dependent order statistics can't combine); same bounded-group contract as
    ``grouped_quantile``.  NULLs are excluded (SQL aggregate semantics)."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        scale = 10.0 ** round_digits
        out = {k: [df[k].iloc[0]] for k in keys}
        if len(v) == 0:
            out[out_col] = [np.nan]
        else:
            med = float(np.percentile(v, 50.0, method="linear"))
            mad = float(np.percentile(np.abs(v - med), 50.0, method="linear"))
            out[out_col] = [np.floor(mad * scale + 0.5) / scale]
        return pd.DataFrame(out)

    proj = ds.select_columns(keys + [col])
    return proj.groupby(keys if len(keys) > 1 else keys[0]).map_groups(
        per_group, batch_format="pandas"
    )


def grouped_trimmed_mean(ds, keys: list[str], col: str,
                         trim: float = 0.1, out_col: str = "trimmed_mean",
                         round_digits: int = 4):
    """Per-group trimmed mean with the exact drop-k definition: drop the
    ``floor(trim * n)`` smallest and largest non-NULL values, average the
    rest (the robust-statistics estimator; SQL-reproducible as a
    ROW_NUMBER-window filter, unlike interpolated-quantile clipping).
    ``trim < 0.5`` guarantees at least one survivor, so the result is NULL
    only for all-NULL groups.  NULLs excluded per SQL aggregate semantics;
    rounding is half-away so a ``ROUND(AVG(..), d)`` oracle matches.

    Same bounded-group contract as ``grouped_quantile`` (order statistics
    need the full group in one task); values sort per group inside the
    ``map_groups`` task, only key rows return.
    """
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = np.sort(v[~np.isnan(v)])
        scale = 10.0 ** round_digits
        out = {k: [df[k].iloc[0]] for k in keys}
        if len(v) == 0:
            out[out_col] = [np.nan]
        else:
            k = int(np.floor(trim * len(v)))
            m = float(v[k:len(v) - k].mean())
            out[out_col] = [np.floor(m * scale + 0.5) / scale]
        return pd.DataFrame(out)

    proj = ds.select_columns(keys + [col])
    return proj.groupby(keys if len(keys) > 1 else keys[0]).map_groups(
        per_group, batch_format="pandas"
    )


def grouped_regression(ds, keys: list[str], x: str, y: str,
                       round_digits: int = 4):
    """Grouped simple linear regression of ``y`` on ``x`` — SQL
    ``regr_slope(y,x) / regr_intercept(y,x) / regr_r2(y,x) / covar_samp(x,y)
    GROUP BY keys`` in one pass.  Same distributed-moments combiner as
    ``grouped_corr``: each batch collapses to one raw-moment row per key
    before the shuffle, so only O(#keys) rows travel.  Pairwise non-null
    (rows where either value is NULL are excluded).  Postgres/DuckDB edge
    semantics: slope/intercept NULL when the group's x-variance is 0; r2
    NULL when x-variance is 0, exactly 1 when y-variance is 0; covar_samp
    NULL when n < 2."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [x, y]).to_pandas()
        df = df.dropna(subset=[x, y])
        xv, yv = df[x].astype(np.float64), df[y].astype(np.float64)
        g = df.assign(
            __n=1.0, __sx=xv, __sy=yv, __sxx=xv * xv, __syy=yv * yv, __sxy=xv * yv
        ).groupby(keys, as_index=False, sort=False)[
            ["__n", "__sx", "__sy", "__sxx", "__syy", "__sxy"]
        ].sum()
        return _clean_arrow(g)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    aggs = [Sum(c, alias_name=c) for c in ("__n", "__sx", "__sy", "__sxx", "__syy", "__sxy")]
    merged = partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(*aggs)

    def final(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False)
        sx = t["__sx"].to_numpy(zero_copy_only=False)
        sy = t["__sy"].to_numpy(zero_copy_only=False)
        sxx = t["__sxx"].to_numpy(zero_copy_only=False)
        syy = t["__syy"].to_numpy(zero_copy_only=False)
        sxy = t["__sxy"].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            # centered second moments (Postgres regr_* closed forms)
            Sxx = sxx - sx * sx / np.maximum(n, 1.0)
            Syy = syy - sy * sy / np.maximum(n, 1.0)
            Sxy = sxy - sx * sy / np.maximum(n, 1.0)
            slope = np.where(Sxx > 0, Sxy / Sxx, np.nan)
            intercept = np.where(Sxx > 0, (sy - slope * sx) / np.maximum(n, 1.0), np.nan)
            r2 = np.where(Sxx > 0, np.where(Syy > 0, (Sxy * Sxy) / (Sxx * Syy), 1.0), np.nan)
            covar = np.where(n >= 2, Sxy / np.maximum(n - 1.0, 1.0), np.nan)

        def rnd(v):
            scale = 10.0 ** round_digits
            sign = np.sign(v)
            return sign * np.floor(np.abs(v) * scale + 0.5) / scale

        cols = {k: t[k] for k in keys}
        cols["slope"] = pa.array(rnd(slope), pa.float64())
        cols["intercept"] = pa.array(rnd(intercept), pa.float64())
        cols["r2"] = pa.array(rnd(r2), pa.float64())
        cols["covar"] = pa.array(rnd(covar), pa.float64())
        cols["n"] = pa.array(n.astype(np.int64), pa.int64())
        return pa.table(cols)

    return merged.map_batches(final, batch_format="pyarrow")


def _key_hash_u64(keys) -> np.ndarray:
    """Deterministic uint64 hash of an Arrow key column, canonicalized by type
    family so equal values hash equally on both join sides — a null-bearing
    int64 column must NOT hash through numpy's float64 upcast (5 vs 5.0 would
    split the key across buckets).  Null slots get an arbitrary hash; callers
    mask them with the column's validity bitmap."""
    from .pairs import stable_hash

    t = keys.type
    if pa.types.is_null(t):
        # an all-null block arrives typed pa.null(); every slot is masked by
        # the caller's validity check, so any constant hash works
        return np.zeros(len(keys), dtype=np.uint64)
    if pa.types.is_integer(t) or pa.types.is_temporal(t):
        vals = pc.cast(pc.fill_null(keys, 0), pa.int64(), safe=False).to_numpy(
            zero_copy_only=False)
        return pd.util.hash_array(vals.astype(np.int64))
    if pa.types.is_floating(t):
        vals = pc.cast(pc.fill_null(keys, 0.0), pa.float64()).to_numpy(
            zero_copy_only=False)
        return pd.util.hash_array(vals)
    return stable_hash(pc.fill_null(keys, "").to_numpy(zero_copy_only=False))


def hash_join(ds_a, ds_b, on: str, right_on: str | None = None,
              how: str = "inner", num_buckets: int | None = None):
    """Big-big shuffle join — neither side is broadcast, collected, or assumed
    to fit anywhere.  The 100-TB fact-x-fact path the broadcast joins above
    can't take (``dim_join`` requires the small side on the driver).

    Both sides are tagged, padded to a common schema, unioned, bucketed by
    ``stable_hash(key) % num_buckets``, and cogrouped with ONE sort-shuffle;
    each group joins its two sides with the vectorized ``pyarrow.Table.join``
    kernel.  Per-task working set = one key bucket of each side (bounded by
    bucket count, independent of total table size); hot keys are bounded by
    the bucket they hash into, and raising ``num_buckets`` shrinks every
    bucket uniformly.

    ``how``: ``"inner"``, ``"left"`` (LEFT OUTER, a-side preserved),
    ``"right"`` (RIGHT OUTER, b-side preserved), ``"full"`` (FULL OUTER,
    both sides preserved), ``"semi"`` (a-rows whose key EXISTS in b — only
    DISTINCT b keys travel), or ``"anti"`` (a-rows whose key does NOT exist
    in b; NOT-EXISTS semantics, so a-side null keys are kept).  Non-key
    column names must be disjoint between the two sides (rename before
    joining).  Null join keys never match (SQL semantics); outer modes
    preserve them with nulls on the other side.  The output key column is
    ``COALESCE(a.key, b.key)`` under ``right``/``full`` (pyarrow
    ``coalesce_keys``), matching ``USING``-style SQL.
    """
    from .scale import resolve_buckets
    from .scoring import dataset_arrow_types

    num_buckets = resolve_buckets(num_buckets, ds_a, ds_b)
    right_on = right_on or on
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"how must be inner/left/right/full/semi/anti, got {how!r}")
    existence = how in ("semi", "anti")
    a_types = dataset_arrow_types(ds_a)
    b_types = dataset_arrow_types(ds_b)
    a_cols = list(a_types)
    b_cols = [] if existence else [c for c in b_types if c != right_on]
    clash = set(a_cols) & set(b_cols)
    if clash:
        raise ValueError(f"non-key column names must be disjoint: {sorted(clash)}")
    # unified wire schema: a-cols + b-cols (b's key renamed onto `on`) + side tag
    wire = {c: a_types[c] for c in a_cols}
    wire.update({c: b_types[c] for c in b_cols})
    out_fields = [(c, wire[c]) for c in a_cols + b_cols]

    def pad(side: str):
        def fn(t: pa.Table) -> pa.Table:
            if side == "b" and right_on != on:
                t = t.rename_columns([on if c == right_on else c for c in t.column_names])
            if side == "b" and existence:
                # existence checks need only the distinct keys (combiner)
                t = pa.table({on: pc.unique(t[on].combine_chunks().drop_null())})
            cols = {}
            for c, typ in wire.items():
                cols[c] = t[c] if c in t.column_names else pa.nulls(t.num_rows, typ)
            cols["__side"] = pa.array(np.full(t.num_rows, 0 if side == "a" else 1,
                                              dtype=np.int8))
            keys = t[on]
            b = _key_hash_u64(keys) % num_buckets
            # null keys can't match; park them in bucket 0 (kept only by "left")
            b = np.where(pc.is_valid(keys).to_numpy(zero_copy_only=False), b, 0)
            cols["__bkt"] = pa.array(b.astype(np.int64))
            out = pa.table(cols)
            # null keys never match; keep them only on a side the mode
            # preserves (a: left/full/anti, b: right/full)
            keep_nulls = (side == "a" and how in ("left", "full", "anti")) or (
                side == "b" and how in ("right", "full"))
            if not keep_nulls:
                out = out.filter(keys.is_valid())
            return out

        return fn

    empty = pa.table({c: pa.nulls(0, typ) for c, typ in out_fields})

    def pad_to_out(t: pa.Table) -> pa.Table:
        for c, typ in out_fields:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, typ))
        return t.select([c for c, _ in out_fields])

    def join_group(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        ta = t.filter(pa.array(side == 0)).select([on] + [c for c in a_cols if c != on])
        tb = t.filter(pa.array(side == 1)).select([on] + b_cols)
        if ta.num_rows == 0 and how not in ("right", "full"):
            return empty
        if existence:
            mask = pc.fill_null(
                pc.is_in(ta[on], value_set=pc.unique(tb[on].combine_chunks())),
                False,
            )
            joined = ta.filter(mask if how == "semi" else pc.invert(mask))
        elif ta.num_rows == 0:
            # right/full with no a-rows in this bucket: every b-row survives
            # with a-side nulls (pyarrow join kernel skipped — nothing to match)
            return pad_to_out(tb)
        elif tb.num_rows == 0:
            if how in ("inner", "right"):
                return empty
            joined = pad_to_out(ta)
        else:
            jt = {"inner": "inner", "left": "left outer",
                  "right": "right outer", "full": "full outer"}[how]
            joined = ta.join(tb, keys=[on], join_type=jt)
        return joined.select([c for c, _ in out_fields])

    tagged = ds_a.map_batches(pad("a"), batch_format="pyarrow").union(
        ds_b.map_batches(pad("b"), batch_format="pyarrow")
    )
    return tagged.groupby("__bkt").map_groups(join_group, batch_format="pyarrow")


_BLOOM_MAX_BITS = 1 << 27  # 16 MiB bitmap cap — stays broadcastable per node


def _bloom_params(n_keys: int, fp_rate: float) -> tuple[int, int]:
    """Classic sizing: m = -n ln p / ln^2 2 bits, k = (m/n) ln 2 hashes.
    m is rounded up to a multiple of 64 (whole uint64 words) and capped at
    ``_BLOOM_MAX_BITS`` — past the cap the realized fp rate degrades instead
    of the bitmap growing unboundedly (the bitmap must broadcast)."""
    n = max(1, n_keys)
    m = int(math.ceil(-n * math.log(max(fp_rate, 1e-9)) / (math.log(2) ** 2)))
    m = min(max(64, (m + 63) & ~63), _BLOOM_MAX_BITS)
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _bloom_positions(keys, m: int, k: int) -> np.ndarray:
    """(k, len) matrix of bit positions via double hashing h1 + i*h2 mod m.
    h1 is the join-canonical key hash (`_key_hash_u64`), h2 a splitmix64
    re-mix forced odd so the stride never collapses to 0."""
    from .pairs import stable_hash

    h1 = _key_hash_u64(keys)
    h2 = stable_hash(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.uint64)


def bloom_filter_build(ds, col: str, fp_rate: float = 0.01,
                       n_keys: int | None = None) -> tuple[np.ndarray, int, int]:
    """Build a Bloom filter over ``ds[col]`` without shuffling ``ds``.

    Each batch emits its set bits SPARSELY — (word index, word value) pairs,
    ≤ ``k×rows`` entries — and the driver OR-merges them into one dense
    ``m/64``-word bitmap while streaming (constant driver memory: one bitmap
    plus one batch of sparse words).  On a multi-node cluster the same
    sparse rows could be tree-merged with one tiny groupby(word_idx) first;
    at ≤16 MiB dense the driver stream is already cheap.  NULL keys are
    never inserted (SQL: NULL matches nothing).

    Returns ``(words: uint64[m/64], m, k)``.
    """
    if n_keys is None:
        n_keys = ds.count()
    m, k = _bloom_params(n_keys, fp_rate)

    def sparse_bits(t: pa.Table) -> pa.Table:
        keys = t[col].combine_chunks().drop_null()
        if len(keys) == 0:
            return pa.table({"widx": pa.array([], pa.int64()),
                             "wval": pa.array([], pa.uint64())})
        pos = _bloom_positions(keys, m, k).ravel()
        widx = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        order = np.argsort(widx, kind="stable")
        widx, bit = widx[order], bit[order]
        uw, start = np.unique(widx, return_index=True)
        wval = np.bitwise_or.reduceat(bit, start)
        return pa.table({"widx": pa.array(uw), "wval": pa.array(wval)})

    words = np.zeros(m // 64, dtype=np.uint64)
    sp = ds.map_batches(sparse_bits, batch_format="pyarrow")
    for b in sp.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            np.bitwise_or.at(words, b["widx"].to_numpy(zero_copy_only=False),
                             b["wval"].to_numpy(zero_copy_only=False))
    return words, m, k


def _bloom_member_mask(keys, words: np.ndarray, m: int, k: int) -> np.ndarray:
    """Boolean membership per slot; NULL slots report False."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(keys, m, k)
    hit = (words[(pos >> np.uint64(6)).astype(np.int64)]
           >> (pos & np.uint64(63))) & np.uint64(1)
    member = hit.all(axis=0).astype(bool)
    valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
    return member & valid


def bloom_semi_join(ds_a, ds_b, on: str, right_on: str | None = None,
                    how: str = "semi", fp_rate: float = 0.01,
                    num_buckets: int | None = None):
    """Runtime-filter existence join — the Bloom-pruned form of
    ``hash_join(how="semi"/"anti")`` for the 100-TB case where the probe side
    dwarfs the build side.

    A Bloom filter over ``ds_b``'s keys is built once (no shuffle of either
    side) and broadcast via ``ray.put``; every ``ds_a`` batch tests
    membership locally.  Bloom-NEGATIVE rows are resolved with ZERO shuffle
    (definitely-absent: dropped for semi, emitted for anti); only the
    bloom-positive sliver — true matches plus ≤``fp_rate`` false positives —
    enters the exact bucketed ``hash_join`` re-check, so the all-to-all
    exchange moves ~``match_rate + fp_rate`` of the probe side instead of
    all of it.  Output is exactly ``hash_join``'s (false positives are
    removed by the re-check; NULL probe keys never match, so anti keeps
    them via the zero-shuffle path).
    """
    import ray

    if how not in ("semi", "anti"):
        raise ValueError(f"how must be semi/anti, got {how!r}")
    right_on = right_on or on
    words, m, k = bloom_filter_build(ds_b, right_on, fp_rate)
    words_ref = ray.put(words)

    def split(keep_positive: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = _bloom_member_mask(t[on].combine_chunks(),
                                      ray.get(words_ref), m, k)
            return t.filter(pa.array(mask if keep_positive else ~mask))

        return fn

    positive = ds_a.map_batches(split(True), batch_format="pyarrow")
    checked = hash_join(positive, ds_b, on, right_on=right_on, how=how,
                        num_buckets=num_buckets)
    if how == "semi":
        return checked
    negative = ds_a.map_batches(split(False), batch_format="pyarrow")
    return negative.union(checked)


def _hll_parts(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) for uint64 hashes — the shared HLL kernel:
    index = top ``p`` bits, rank = leading zeros of the remaining bits + 1
    (sentinel low bits keep the shifted word nonzero)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    lz = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    alive = np.ones(len(h), dtype=bool)
    for _ in range(64 - p):
        top = (cur & mask) != 0
        alive &= ~top
        if not alive.any():
            break
        lz[alive] += 1
        cur = cur << np.uint64(1)
    return idx, (lz + 1).astype(np.uint8)


def _hll_estimate(regs: np.ndarray, m: int) -> float:
    """Standard HLL estimator with linear-counting small-range correction."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_ndistinct(ds, col: str, precision: int = 12) -> dict:
    """Approximate COUNT(DISTINCT col) with a mergeable HyperLogLog sketch —
    the 100-TB cardinality path (exact distinct needs an all-to-all shuffle;
    this streams: each batch collapses to a ``2**precision``-byte register row
    and the driver merges registers with an elementwise max).

    Standard HLL estimator (Flajolet et al. 2007) with linear-counting
    small-range correction.  Typical relative error ~= 1.04/sqrt(2**precision)
    (~1.6% at the default p=12; each partial is 4 KiB).  Returns
    ``{"estimate": float, "registers": 2**p, "error_bound": float}``.
    """
    from .pairs import stable_hash

    p = int(precision)
    m = 1 << p

    def sketch(t: pa.Table) -> pa.Table:
        # NULLs are not distinct values (SQL COUNT(DISTINCT col) semantics —
        # advice item, round 2): drop before hashing
        arr = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        v = arr.drop_null().to_numpy(zero_copy_only=False)
        h = stable_hash(v).astype(np.uint64)
        idx, rank = _hll_parts(h, p)
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, idx, rank)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    part = ds.select_columns([col]).map_batches(sketch, batch_format="pyarrow").to_pandas()
    regs = np.zeros(m, dtype=np.uint8)
    if "regs" in part.columns:  # an empty dataset yields zero partial rows
        for r in part["regs"].to_numpy():
            regs = np.maximum(regs, np.asarray(r, dtype=np.uint8))
    return {
        "estimate": _hll_estimate(regs, m),
        "registers": m,
        "error_bound": 1.04 / np.sqrt(m),
    }


def grouped_approx_ndistinct(ds, key: str, col: str, precision: int = 12,
                             out_col: str = "approx_ndv"):
    """Per-key approximate ``COUNT(DISTINCT col)`` — one mergeable
    HyperLogLog per key: the 100-TB path when the per-key distinct sets are
    too wide for :func:`grouped_nunique`'s exact pair shuffle (the sketch
    shuffle is bounded by ``2**precision`` rows per key per batch however
    many distinct values exist).

    Each batch emits SPARSE register partials — one ``(key, idx, rank)``
    row per register the batch actually touches, pre-combined to the
    per-(key, idx) max — so partials stay O(min(batch distinct, 2^p)) per
    key instead of dense 2^p-byte register blobs.  One groupby shuffle on
    the key; the per-key merge densifies once (``np.maximum.at``) and
    applies the standard estimator (Flajolet et al. 2007) with
    linear-counting correction, identical to :func:`approx_ndistinct`.
    NULL values are excluded (SQL semantics); NULL keys form one group;
    all-NULL keys are omitted (their rows never survive the combiner).

    Returns ``(key, out_col: double, error_bound: double)``; typical
    relative error ~1.04/sqrt(2^p) (~1.6% at the default p=12).
    """
    from .pairs import stable_hash

    p = int(precision)
    m = 1 << p

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[col])
        h = stable_hash(df[col].to_numpy()).astype(np.uint64)
        idx, rank = _hll_parts(h, p)
        part = pd.DataFrame({key: df[key].to_numpy(),
                             "__idx": idx,
                             "__rank": rank.astype(np.int64)})
        return part.groupby([key, "__idx"], sort=False, dropna=False,
                            as_index=False)["__rank"].max()

    def est(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, df["__idx"].to_numpy(),
                      df["__rank"].to_numpy().astype(np.uint8))
        return pd.DataFrame({key: [df[key].iloc[0]],
                             out_col: [_hll_estimate(regs, m)],
                             "error_bound": [1.04 / np.sqrt(m)]})

    partials = ds.select_columns([key, col]).map_batches(
        sketch, batch_format="pandas")
    return partials.groupby(key).map_groups(est, batch_format="pandas")


def grouped_collect(ds, keys: list[str], col: str, out_col: str = "items",
                    sep: str = ","):
    """``SELECT keys, string_agg(col, sep ORDER BY col) AS out_col GROUP BY
    keys`` — the build-one-training-example-per-entity shape.  Within-group
    sort makes the output independent of partitioning / arrival order.

    Concatenation can't pre-combine per batch (the within-group ORDER BY is
    global), so this is one groupby shuffle of the (keys, col) projection —
    inherent to the op; the projection keeps the shuffle slim.  Output rows ==
    group count; a pathological single-key input concentrates on one task, so
    keep ``col`` values bounded (ids/names, not documents).
    """
    def agg(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks().drop_null()
        # ORDER BY uses the column's native comparison, THEN stringify
        ordered = pc.take(arr, pc.array_sort_indices(arr))
        s = sep.join(pc.cast(ordered, pa.string()).to_pylist())
        out = {k: t[k][:1] for k in keys}
        out[out_col] = pa.array([s], pa.string())
        return pa.table(out)

    proj = ds.select_columns(keys + [col])
    return proj.groupby(keys if len(keys) > 1 else keys[0]).map_groups(
        agg, batch_format="pyarrow")


def hash_sample(ds, col: str, pct: float, mod: int = 100, method: str = "stable"):
    """Deterministic content-hash sampling — the reproducible train/held-out
    split a training-data pipeline needs (``ds.random_sample`` is seed- and
    partitioning-dependent; this depends only on the VALUE of ``col``, so the
    same row lands on the same side of the split on every engine and every
    re-run, and late-arriving data splits consistently).

    Keeps rows where ``H(cast(col as string)) % mod < pct``.  ``method``:

    - ``"stable"`` (default): vectorized uint64 hash — the fast production
      path.
    - ``"md5"``: engine-portable ``md5`` semantics, bit-identical to DuckDB's
      ``md5_number_lower(CAST(col AS VARCHAR))`` (lower 8 digest bytes,
      little-endian) — per-row C hashing, used for cross-engine verification.
    """
    from .pairs import stable_hash

    thr = int(pct)

    def flt(t: pa.Table) -> pa.Table:
        s = pc.cast(t[col], pa.string())
        if method == "md5":
            import hashlib

            md5 = hashlib.md5
            h = np.fromiter(
                (int.from_bytes(md5(v.encode()).digest()[8:], "little")
                 if v is not None else 0
                 for v in s.to_pylist()),
                dtype=np.uint64, count=len(s),
            )
        else:
            h = stable_hash(s.to_numpy(zero_copy_only=False)).astype(np.uint64)
        keep = (h % mod) < thr
        # SQL semantics: NULL fails the predicate
        keep &= pc.is_valid(s).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


def _portable_hash_u64(s: pa.Array, method: str) -> np.ndarray:
    """uint64 of a string array: ``"stable"`` = vectorized production hash;
    ``"md5"`` = DuckDB ``md5_number_lower`` semantics (lower 8 digest bytes,
    little-endian) for cross-engine verification."""
    from .pairs import stable_hash

    if method == "md5":
        import hashlib

        md5 = hashlib.md5
        return np.fromiter(
            (int.from_bytes(md5(v.encode()).digest()[8:], "little")
             if v is not None else 0
             for v in s.to_pylist()),
            dtype=np.uint64, count=len(s))
    return stable_hash(pc.fill_null(s, "").to_numpy(zero_copy_only=False))


def sample_exact_k(ds, col: str, k: int, method: str = "stable"):
    """Uniform sample of EXACTLY ``k`` rows, deterministic in the VALUES of
    ``col`` (min-k content hashing): keep the k rows with the smallest
    ``H(cast(col as string))``.  The fixed-size companion to
    ``hash_sample``'s fixed-rate split — same row set on every engine,
    every partitioning, every re-run; late-arriving data perturbs the
    sample only where its hashes displace the boundary.

    Combiner shape: each batch prunes to its own k smallest (shuffle moves
    ≤ k rows per batch), then one small sort+limit finishes.  ``method``
    as in ``hash_sample`` (``"md5"`` = DuckDB-portable ordering).
    """
    def prune(t: pa.Table) -> pa.Table:
        h = _portable_hash_u64(pc.cast(t[col], pa.string()).combine_chunks(), method)
        t = t.append_column("__h", pa.array(h))
        if t.num_rows <= k:
            return t
        keep = np.argpartition(h, k)[:k]
        return t.take(pa.array(np.sort(keep), pa.int64()))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    out = pruned.sort(["__h", col]).limit(k)
    return out.map_batches(lambda t: t.drop_columns(["__h"]),
                           batch_format="pyarrow")


def key_skew_report(ds, key: str, round_digits: int = 4) -> pd.DataFrame:
    """Shuffle-planning diagnostic: the group-size distribution of a key —
    what you run BEFORE choosing bucket counts / salting thresholds for a
    100-TB groupby on that key.  Composes two scale-safe primitives: the
    combiner ``grouped_sum`` (per-key counts) and exact ``global_quantile``
    over those counts (histogram refinement, nothing collected).

    One row: ``n_keys, max_n, p50, p99, skew`` (= max / mean group size).
    """
    counts = grouped_sum(ds.select_columns([key]), [key], {}, count_col="__c")

    def mm(t: pa.Table) -> pa.Table:
        c = t["__c"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array([len(c)], pa.int64()),
                         "mx": pa.array([int(c.max()) if len(c) else 0], pa.int64()),
                         "sm": pa.array([int(c.sum()) if len(c) else 0], pa.int64())})

    agg = counts.map_batches(mm, batch_format="pyarrow").to_pandas()
    n_keys, max_n, total = int(agg["k"].sum()), int(agg["mx"].max()), int(agg["sm"].sum())
    q = global_quantile(counts, "__c", {"p50": 0.5, "p99": 0.99},
                        round_digits=round_digits)
    skew = max_n / (total / n_keys) if n_keys else float("nan")
    scale = 10.0 ** round_digits
    return pd.DataFrame({
        "n_keys": [np.int64(n_keys)],
        "max_n": [np.int64(max_n)],
        "p50": [float(q["p50"][0])],
        "p99": [float(q["p99"][0])],
        "skew": [np.floor(skew * scale + 0.5) / scale],
    })


def explode_split(ds, id_cols: list[str], col: str, pattern: str = " ",
                  out_col: str = "tok"):
    """``SELECT id_cols, unnest(string_split(col, pattern)) AS out_col`` —
    the row-expanding flat map (token tables, tag lists).  Fully Arrow-
    vectorized: one ``split_pattern`` + ``list_parent_indices`` + ``take``
    per batch, zero Python per row; NULL inputs expand to zero rows (UNNEST
    semantics).  Output row count is data-dependent — keep downstream
    ``batch_size`` in mind when elements-per-row is large."""
    def f(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t[col].combine_chunks(), pattern)
        idx = pc.list_parent_indices(parts)
        cols = {c: pc.take(t[c], idx) for c in id_cols}
        cols[out_col] = pc.list_flatten(parts)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def explode_list(ds, id_cols: list[str], list_col: str, out_col: str = "elem",
                 with_ordinality: str | None = None):
    """``SELECT id_cols, unnest(list_col) AS out_col`` over a REAL Arrow
    ``list<T>`` column (``explode_split`` is the string-split special case).
    ``with_ordinality`` names an optional 1-based position column (SQL
    ``WITH ORDINALITY``).  NULL / empty lists expand to zero rows.  Fully
    Arrow-vectorized: ``list_parent_indices`` + ``list_flatten`` + ``take``
    per batch."""
    def f(t: pa.Table) -> pa.Table:
        lst = t[list_col].combine_chunks()
        idx = pc.list_parent_indices(lst)
        cols = {c: pc.take(t[c], idx) for c in id_cols}
        cols[out_col] = pc.list_flatten(lst)
        if with_ordinality:
            par = idx.to_numpy(zero_copy_only=False)
            if len(par):
                starts = np.flatnonzero(np.diff(par, prepend=par[0] - 1))
                ords = np.arange(len(par)) - np.repeat(starts, np.diff(
                    np.append(starts, len(par)))) + 1
            else:
                ords = np.array([], dtype=np.int64)
            cols[with_ordinality] = pa.array(ords.astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def winsorize(ds, col: str, p_lo: float = 0.01, p_hi: float = 0.99,
              out_col: str | None = None, round_digits: int = 4):
    """Quantile clipping (outlier capping for score/length columns before
    training statistics): values below the ``p_lo`` or above the ``p_hi``
    global quantile are clamped to it.  Two streaming passes: exact global
    quantiles by histogram refinement (nothing collected), then a vectorized
    clip — the quantiles travel as two scalars, not a broadcast table."""
    q = global_quantile(ds, col, {"lo": p_lo, "hi": p_hi}, round_digits=round_digits)
    lo, hi = float(q["lo"][0]), float(q["hi"][0])
    out = out_col or f"{col}_w"
    scale = 10.0 ** round_digits

    def clip(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.clip(v, lo, hi)
        w = np.floor(np.abs(w) * scale + 0.5) / scale * np.sign(w)  # ROUND parity
        return t.append_column(out, pa.array(w, pa.float64(), from_pandas=True))

    return ds.map_batches(clip, batch_format="pyarrow")


def frequent_items(ds, col: str, capacity: int = 20) -> pd.DataFrame:
    """Exact heavy hitters at stream scale: a mergeable Misra-Gries sketch
    finds the candidate set in one streaming pass (each batch collapses to
    <= ``capacity``+1 partial rows; the driver merges and re-compresses), then
    one more streaming pass counts ONLY those candidates exactly (combiner
    groupby over a <= ``capacity``-item broadcast filter).

    Output: every item whose exact count satisfies
    ``count * (capacity + 1) > total_rows`` — the classical MG guarantee says
    the sketch's candidate set is a superset of these, so the result equals
    ``GROUP BY col HAVING COUNT(*)*(capacity+1) > (SELECT COUNT(*) ...)``
    computed exactly, at two streaming passes and O(capacity) driver state.
    Null values are ignored (SQL GROUP BY semantics would keep them; heavy-
    hitter analysis of a key column treats null as missing).
    """
    cap = int(capacity)

    def _compress(items: np.ndarray, counts: np.ndarray):
        """Misra-Gries decrement step: keep <= cap counters."""
        if len(items) <= cap:
            return items, counts
        order = np.argsort(counts)[::-1]
        items, counts = items[order], counts[order]
        dec = counts[cap]  # (cap+1)-th largest
        counts = counts - dec
        keep = counts > 0
        return items[:cap][keep[:cap]], counts[:cap][keep[:cap]]

    def sketch(t: pa.Table) -> pa.Table:
        vals = t[col].drop_null()
        vc = pc.value_counts(vals)
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts = _compress(items, counts)
        # one null-item marker row carries this batch's non-null total, so the
        # threshold denominator needs no second pass over the data
        return pa.table({
            "item": pa.array(np.concatenate([items, [None]]), type=t[col].type),
            "cnt": pa.array(np.concatenate([counts, [len(vals)]]).astype(np.int64)),
        })

    empty_out = pd.DataFrame({col: pd.Series([], dtype=object),
                              "n": pd.Series([], dtype="int64")})
    parts = list(
        ds.select_columns([col])
        .map_batches(sketch, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not parts:
        return empty_out
    pdf = pa.concat_tables(parts).to_pandas()
    total = int(pdf.loc[pdf["item"].isna(), "cnt"].sum())
    merged = pdf.dropna(subset=["item"]).groupby("item", sort=False)["cnt"].sum()
    items, _counts = _compress(merged.index.to_numpy(), merged.to_numpy())
    if total == 0 or len(items) == 0:
        return empty_out

    # exact pass, restricted to the <= cap sketch candidates (a guaranteed
    # superset of every item above the threshold)
    item_type = parts[0].schema.field("item").type
    cand = pa.array(list(items), type=item_type)

    def exact_counts(t: pa.Table) -> pa.Table:
        v = t[col].drop_null()
        vc = pc.value_counts(v.filter(pc.is_in(v, value_set=cand)))
        return pa.table({col: vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    exact_parts = list(
        ds.select_columns([col])
        .map_batches(exact_counts, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    exact = pa.concat_tables(exact_parts).to_pandas().groupby(
        col, as_index=False, sort=False)["n"].sum()
    out = exact[exact["n"] * (cap + 1) > total].sort_values(col)
    return out.reset_index(drop=True)


def global_quantile(ds, col: str, qs: dict[str, float], round_digits: int = 4,
                    bins: int = 256, collect_budget: int = 262_144):
    """Exact GLOBAL ``quantile_cont`` without any task or the driver ever
    holding the column — the scale path :func:`grouped_quantile`'s docstring
    calls for when a group exceeds task memory.

    Distributed selection by iterative histogram refinement: each round is one
    streaming pass over the dataset emitting ``bins`` partial counts per batch
    (tiny), the candidate value window narrows geometrically (window mass
    shrinks ~``1/bins`` per round), and once the window holding the target
    order statistics carries fewer than ``collect_budget`` values a final pass
    collects just that window for the exact linear interpolation.  Nulls/NaN
    are excluded (``quantile_cont`` parity).  Returns a one-row pandas frame
    with one column per ``qs`` key, rounded half-up to ``round_digits``.
    """
    proj = ds.select_columns([col])

    def _clean(t: pa.Table) -> np.ndarray:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return v[~np.isnan(v)]

    def stats_pass(t: pa.Table) -> pa.Table:
        v = _clean(t)
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "mn": pa.array([float(v.min()) if len(v) else np.inf], pa.float64()),
            "mx": pa.array([float(v.max()) if len(v) else -np.inf], pa.float64()),
        })

    st = proj.map_batches(stats_pass, batch_format="pyarrow").to_pandas()
    n = int(st["n"].sum())
    scale = 10.0 ** round_digits
    rnd = lambda x: float(np.floor(float(x) * scale + 0.5) / scale)
    if n == 0:
        return pd.DataFrame({name: [np.nan] for name in qs})
    gmin, gmax = float(st["mn"].min()), float(st["mx"].max())

    def hist_pass(lo_v: float, hi_v: float) -> tuple[np.ndarray, int, float, float]:
        """One streaming pass: (bin counts in [lo_v, hi_v], count below lo_v,
        window min, window max)."""
        w = hi_v - lo_v

        def h(t: pa.Table) -> pa.Table:
            v = _clean(t)
            below = int((v < lo_v).sum())
            vv = v[(v >= lo_v) & (v <= hi_v)]
            if w > 0:
                idx = np.minimum(((vv - lo_v) / w * bins).astype(np.int64), bins - 1)
            else:
                idx = np.zeros(len(vv), np.int64)
            cnt = np.bincount(idx, minlength=bins).astype(np.int64)
            return pa.table({
                "below": pa.array([below], pa.int64()),
                "wmin": pa.array([float(vv.min()) if len(vv) else np.inf], pa.float64()),
                "wmax": pa.array([float(vv.max()) if len(vv) else -np.inf], pa.float64()),
                "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
            })

        part = proj.map_batches(h, batch_format="pyarrow").to_pandas()
        cnt = np.sum(np.stack(part["cnt"].to_numpy()), axis=0)
        return cnt, int(part["below"].sum()), float(part["wmin"].min()), float(part["wmax"].max())

    def order_stats(k_lo: int, k_hi: int) -> np.ndarray:
        """Exact order statistics v[k_lo..k_hi] (0-indexed, global ascending)."""
        lo_v, hi_v, below = gmin, gmax, 0
        for _ in range(128):  # geometric narrowing; 128 is an unreachable backstop
            cnt, below, wmin, wmax = hist_pass(lo_v, hi_v)
            if wmin == wmax:  # window is one repeated value
                return np.full(k_hi - k_lo + 1, wmin)
            cum = below + np.cumsum(cnt)  # rank of last value in each bin + 1
            first = int(np.searchsorted(cum, k_lo + 1))
            last = int(np.searchsorted(cum, k_hi + 1))
            in_win = int(cnt[first:last + 1].sum())
            w = (hi_v - lo_v) / bins
            new_lo = max(wmin, lo_v + first * w)
            new_hi = min(wmax, lo_v + (last + 1) * w)
            stuck = new_lo == lo_v and new_hi == hi_v  # float-degenerate window
            if in_win <= collect_budget or stuck:
                lo_v, hi_v = new_lo, new_hi

                def take(t: pa.Table) -> pa.Table:
                    v = _clean(t)
                    keep = v[(v >= lo_v) & (v <= hi_v)]
                    blw = int((v < lo_v).sum())
                    return pa.table({
                        "below": pa.array([blw], pa.int64()),
                        "vals": pa.array([keep.tolist()], pa.list_(pa.float64())),
                    })

                got = proj.map_batches(take, batch_format="pyarrow").to_pandas()
                vals = np.sort(np.concatenate(
                    [np.asarray(x, np.float64) for x in got["vals"].to_numpy()]
                ))
                base = int(got["below"].sum())
                return vals[k_lo - base:k_hi - base + 1]
            lo_v, hi_v = new_lo, new_hi
        raise RuntimeError("global_quantile did not converge")

    out = {}
    for name, q in qs.items():
        p = q * (n - 1)
        k = int(np.floor(p))
        frac = p - k
        if frac == 0.0 or k + 1 > n - 1:
            v = order_stats(k, k)
            out[name] = [rnd(v[0])]
        else:
            v = order_stats(k, k + 1)
            out[name] = [rnd(v[0] + frac * (v[1] - v[0]))]
    return pd.DataFrame(out)


def approx_quantile(ds, col: str, qs: dict[str, float],
                    sample_per_batch: int = 1024,
                    round_digits: int | None = 4) -> dict:
    """Approximate quantiles from a mergeable weighted-order-statistic
    sketch — the one-pass companion to ``global_quantile`` (exact, but
    needs 2 + refinement passes over the data).

    Per batch: sort the non-null values and keep ``S = sample_per_batch``
    evenly spaced order statistics at midpoint ranks ``(i+0.5)/S``, each
    weighted ``n_batch/S``.  Partials are (value, weight) rows — mergeable
    by concatenation, so any tree shape works; the driver streams them and
    takes weighted quantiles over the union.  Rank error is bounded by the
    per-batch quantization: each batch contributes at most ``n_b/(2S)``
    rank slack, so the merged estimate's rank error is ≤ ``N/(2S)`` —
    ``rank_error_bound`` = ``1/(2S)`` as a fraction of N, 0.05 % at the
    default.  Driver-side state is ``num_batches × S`` rows; at extreme
    block counts, feed the partials through one ``grouped_sum``-style
    pre-merge first (same math, documented tree shape).

    Returns ``{name: value, ..., "n": N, "rank_error_bound": eps}``.
    """

    def sketch(t: pa.Table) -> pa.Table:
        v = t[col].combine_chunks().drop_null()
        arr = v.to_numpy(zero_copy_only=False).astype(np.float64)
        arr = arr[~np.isnan(arr)]
        n = len(arr)
        if n == 0:
            return pa.table({"val": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        arr.sort()
        s = min(sample_per_batch, n)
        idx = np.minimum((((np.arange(s) + 0.5) / s) * n).astype(np.int64), n - 1)
        return pa.table({"val": pa.array(arr[idx]),
                         "w": pa.array(np.full(s, n / s))})

    vals, ws = [], []
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            vals.append(b["val"].to_numpy(zero_copy_only=False))
            ws.append(b["w"].to_numpy(zero_copy_only=False))
    out: dict = {"n": 0.0, "rank_error_bound": 1.0 / (2 * sample_per_batch)}
    if not vals:
        out.update({name: float("nan") for name in qs})
        return out
    v = np.concatenate(vals)
    w = np.concatenate(ws)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out["n"] = float(total)
    for name, q in qs.items():
        i = int(np.searchsorted(cum, q * total, side="left"))
        val = float(v[min(i, len(v) - 1)])
        out[name] = round(val, round_digits) if round_digits is not None else val
    return out


def grouped_approx_quantile(ds, key: str, col: str, qs: dict[str, float],
                            sample_per_batch: int = 256,
                            num_buckets: int | None = None):
    """Per-key approximate quantiles from the same mergeable weighted-order-
    statistic sketch as :func:`approx_quantile` — the scale path past
    :func:`grouped_quantile`'s whole-group-in-one-task contract (its
    docstring's promised sketch variant).

    Per batch, each key's non-null values collapse to at most
    ``sample_per_batch`` (value, weight) order statistics; ONE bucketed
    shuffle on ``hash(key)`` merges each key's partials and reads weighted
    quantiles off the union.  Per-key rank error ≤ ``1/(2*sample_per_batch)``
    of that key's count, same bound as the global sketch.  Output: Dataset
    ``(key, <qs names>, n)`` — distributed, never driver-collected (key
    cardinality is unbounded).  NULL keys form their own group."""
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)
    S = int(sample_per_batch)

    def sketch(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        v = df[col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        df = df[ok]
        v = v[ok]
        if len(df) == 0:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "val": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64()),
                             "__bkt": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(df[key].to_numpy(), use_na_sentinel=False)
        order = np.lexsort((v, codes))
        c2, v2 = codes[order], v[order]
        n_k = np.bincount(c2, minlength=len(uniq)).astype(np.int64)
        s_k = np.minimum(S, n_k)
        starts = np.concatenate(([0], np.cumsum(n_k[:-1])))
        out_starts = np.concatenate(([0], np.cumsum(s_k[:-1])))
        total = int(s_k.sum())
        key_rep = np.repeat(np.arange(len(uniq)), s_k)
        within = np.arange(total) - np.repeat(out_starts, s_k)
        # midpoint ranks (i+0.5)/s_k scaled to the key's n_k values
        pos = ((within + 0.5) / s_k[key_rep] * n_k[key_rep]).astype(np.int64)
        idx = np.repeat(starts, s_k) + np.minimum(pos, n_k[key_rep] - 1)
        kv = pd.Series(uniq).take(key_rep).to_numpy()
        h = pd.util.hash_pandas_object(pd.Series(kv), index=False).to_numpy()
        return pa.table({key: pa.array(kv, t.schema.field(key).type,
                                       from_pandas=True),
                         "val": pa.array(v2[idx], pa.float64()),
                         "w": pa.array((n_k / s_k)[key_rep], pa.float64()),
                         "__bkt": pa.array((h % num_buckets).astype(np.int64))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kval, g in df.groupby(key, sort=False, dropna=False):
            v = g["val"].to_numpy()
            w = g["w"].to_numpy()
            order = np.argsort(v, kind="stable")
            v, w = v[order], w[order]
            cum = np.cumsum(w)
            total = cum[-1]
            row = {key: kval, "n": float(total)}
            for name, q in qs.items():
                i = int(np.searchsorted(cum, q * total, side="left"))
                row[name] = float(v[min(i, len(v) - 1)])
            rows.append(row)
        return pd.DataFrame(rows, columns=[key, "n"] + list(qs))

    partials = ds.select_columns([key, col]).map_batches(
        sketch, batch_format="pyarrow")
    return partials.groupby("__bkt").map_groups(merge, batch_format="pandas")


def range_join_broadcast(ds, intervals: pd.DataFrame, val_col: str,
                         band_col: str = "band", lo_col: str = "lo",
                         hi_col: str = "hi", concurrency=None):
    """Inner join of a big table against a small interval table on
    ``lo <= val < hi`` — the classic range join, with the small side broadcast
    (``ray.put`` once) and resolved per batch via ``np.searchsorted`` when the
    intervals are non-overlapping, falling back to a vectorized mask per
    interval otherwise.  No shuffle of the big side.
    """
    import ray

    iv = intervals.sort_values(lo_col).reset_index(drop=True)
    lo = iv[lo_col].to_numpy(dtype=np.float64)
    hi = iv[hi_col].to_numpy(dtype=np.float64)
    disjoint = bool(np.all(hi[:-1] <= lo[1:])) if len(iv) > 1 else True
    ref = ray.put((lo, hi, iv[band_col].to_numpy()))

    # plain task (warm worker pool, no actor cold-start): the broadcast state
    # is a few KB, so the per-task ray.get from the local object store is free
    def range_join_batch(t: pa.Table) -> pa.Table:
        lo_, hi_, bands = ray.get(ref)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        if disjoint:
            idx = np.searchsorted(lo_, v, side="right") - 1
            ok = (idx >= 0) & (v < hi_[np.maximum(idx, 0)])
            kept = t.filter(pa.array(ok))
            return kept.append_column(
                band_col, pa.array(bands[idx[ok]].tolist(), pa.string())
            )
        parts = []
        for j in range(len(lo_)):
            m = (v >= lo_[j]) & (v < hi_[j])
            if m.any():
                sub = t.filter(pa.array(m))
                parts.append(sub.append_column(
                    band_col,
                    pa.array([bands[j]] * sub.num_rows, pa.string()),
                ))
        if not parts:
            return t.slice(0, 0).append_column(band_col, pa.array([], pa.string()))
        return pa.concat_tables(parts)

    return ds.map_batches(range_join_batch, batch_format="pyarrow",
                          **(dict(concurrency=concurrency) if concurrency else {}))


def interval_join(ds_vals, ds_intervals, val_col: str, lo_col: str,
                  hi_col: str, num_ranges: int = 256,
                  closed: str = "both"):
    """Big-big inner interval join: ``lo <= val <= hi`` (``closed="both"``,
    SQL BETWEEN) or ``lo <= val < hi`` (``closed="left"``) with NEITHER side
    broadcast — the shuffle form of ``range_join_broadcast`` for interval
    tables that don't fit on the driver.

    Shape: the value side is range-partitioned by its own quantiles
    (``approx_quantile`` one-pass sketch → ``num_ranges`` equal-frequency
    boundaries, broadcast as a few KB), so every range bucket holds ~N/R
    value rows regardless of distribution.  Each interval row is replicated
    ONLY to the buckets its [lo, hi] spans (equal-frequency boundaries make
    the expected replication factor ~1 + selectivity·R); both sides cogroup
    with ONE bucketed sort-shuffle and each group joins locally — values
    sorted once, per-interval matches found with two ``np.searchsorted``
    probes and emitted by vectorized repeat/arange (no Python pair loop).
    A pathological interval spanning the whole domain replicates R times —
    bounded by ``num_ranges``, never by the data.  NULL values and NULL
    bounds never match.  Non-key column names must be disjoint.
    """
    import ray

    from .scoring import dataset_arrow_types

    if closed not in ("both", "left"):
        raise ValueError(f"closed must be both/left, got {closed!r}")
    v_types = dataset_arrow_types(ds_vals)
    i_types = dataset_arrow_types(ds_intervals)
    clash = set(v_types) & set(i_types)
    if clash:
        raise ValueError(f"column names must be disjoint: {sorted(clash)}")
    qs = {f"b{i}": (i + 1) / num_ranges for i in range(num_ranges - 1)}
    sk = approx_quantile(ds_vals, val_col, qs, round_digits=None)
    bounds = np.unique(np.array([sk[f"b{i}"] for i in range(num_ranges - 1)],
                                dtype=np.float64))
    bounds = bounds[~np.isnan(bounds)]
    bref = ray.put(bounds)

    wire = {c: v_types[c] for c in v_types}
    wire.update(i_types)
    out_fields = list(wire.items())

    def pad(t: pa.Table, side: int) -> pa.Table:
        cols = {c: (t[c] if c in t.column_names else pa.nulls(t.num_rows, typ))
                for c, typ in wire.items()}
        cols["__side"] = pa.array(np.full(t.num_rows, side, dtype=np.int8))
        return pa.table(cols)

    def tag_vals(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        va = t[val_col].combine_chunks()
        t = t.filter(va.is_valid())
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = pad(t, 0)
        return out.append_column(
            "__rng", pa.array(np.searchsorted(b, v, side="right").astype(np.int64)))

    def tag_intervals(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        mask = pc.and_(t[lo_col].combine_chunks().is_valid(),
                       t[hi_col].combine_chunks().is_valid())
        t = t.filter(mask)
        lo = t[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        first = np.searchsorted(b, lo, side="right")
        last = np.searchsorted(b, hi, side="right")
        span = np.maximum(last - first + 1, 0)
        span = np.where(hi < lo, 0, span)
        total = int(span.sum())
        if total == 0:
            out = pad(t.slice(0, 0), 1)
            return out.append_column("__rng", pa.array([], pa.int64()))
        row_idx = np.repeat(np.arange(len(lo)), span)
        rng = (np.arange(total)
               - np.repeat(np.cumsum(span) - span, span)
               + np.repeat(first, span))
        out = pad(t.take(pa.array(row_idx, pa.int64())), 1)
        return out.append_column("__rng", pa.array(rng.astype(np.int64)))

    empty = pa.table({c: pa.nulls(0, typ) for c, typ in out_fields})

    def join_group(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        tv = t.filter(pa.array(side == 0))
        ti = t.filter(pa.array(side == 1))
        if tv.num_rows == 0 or ti.num_rows == 0:
            return empty
        v = tv[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(v, kind="stable")
        v = v[order]
        lo = ti[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = ti[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        a = np.searchsorted(v, lo, side="left")
        z = np.searchsorted(v, hi, side="right" if closed == "both" else "left")
        cnt = np.maximum(z - a, 0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        i_rep = np.repeat(np.arange(len(lo)), cnt)
        v_pos = (np.arange(total)
                 - np.repeat(np.cumsum(cnt) - cnt, cnt)
                 + np.repeat(a, cnt))
        tv_m = tv.take(pa.array(order[v_pos], pa.int64()))
        ti_m = ti.take(pa.array(i_rep, pa.int64()))
        cols = {c: tv_m[c] for c in v_types}
        cols.update({c: ti_m[c] for c in i_types})
        return pa.table(cols).select([c for c, _ in out_fields])

    tagged = ds_vals.map_batches(tag_vals, batch_format="pyarrow").union(
        ds_intervals.map_batches(tag_intervals, batch_format="pyarrow"))
    return tagged.groupby("__rng").map_groups(join_group, batch_format="pyarrow")


def _tagged_distinct_setop(ds_a, ds_b, cols: list[str], keep: str,
                           num_buckets: int | None = None):
    """Shared engine for EXCEPT/INTERSECT (DISTINCT semantics): tag each side,
    per-batch dedupe (combiner), one bucketed shuffle on a row hash, then a
    vectorized set decision per bucket.  Neither side is broadcast — both may
    be arbitrarily large.
    """
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds_a, ds_b)

    def local(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            u = df[cols].drop_duplicates().reset_index(drop=True)
            u["bucket"] = (
                pd.util.hash_pandas_object(u, index=False).to_numpy() % num_buckets
            ).astype(np.int64)
            u["side"] = np.int8(side)
            return u

        return fn

    tagged = ds_a.select_columns(cols).map_batches(local(0), batch_format="pandas").union(
        ds_b.select_columns(cols).map_batches(local(1), batch_format="pandas")
    )

    def decide(t: pa.Table) -> pa.Table:
        # Arrow-native set decision: distinct per side via group_by, then a
        # hash semi/anti join (C++ kernels; schema-stable even for empty
        # groups, so Ray's block-size estimator never sees untyped frames).
        side = t["side"]
        in_a = t.filter(pc.equal(side, 0)).select(cols).group_by(cols).aggregate([])
        in_b = t.filter(pc.equal(side, 1)).select(cols).group_by(cols).aggregate([])
        how = "left semi" if keep == "both" else "left anti"
        return in_a.join(in_b, keys=cols, join_type=how)

    return tagged.groupby("bucket").map_groups(decide, batch_format="pyarrow")


def except_distinct(ds_a, ds_b, cols: list[str], num_buckets: int | None = None):
    """``SELECT DISTINCT cols FROM a EXCEPT SELECT DISTINCT cols FROM b``."""
    return _tagged_distinct_setop(ds_a, ds_b, cols, keep="a_only", num_buckets=num_buckets)


def intersect_distinct(ds_a, ds_b, cols: list[str], num_buckets: int | None = None):
    """``SELECT DISTINCT cols FROM a INTERSECT SELECT DISTINCT ... FROM b``."""
    return _tagged_distinct_setop(ds_a, ds_b, cols, keep="both", num_buckets=num_buckets)


def union_distinct(ds_a, ds_b, cols: list[str], num_buckets: int | None = None):
    """``SELECT cols FROM a UNION SELECT cols FROM b`` (distinct union) —
    completes the set-op family; one bucketed distinct over the concatenation."""
    return distinct(
        ds_a.select_columns(cols).union(ds_b.select_columns(cols)),
        cols, num_buckets=num_buckets,
    )


# Per-worker stats-table cache for broadcast normalization (same pattern as
# scoring._SCORER_CACHE: the ref's hex is stable across tasks, so each worker
# process resolves the broadcast exactly once).
_STATS_CACHE: dict = {}


def _zscore_batch(t: pa.Table, keys, col, out_col, round_digits, stats_ref):
    import ray

    k = stats_ref.hex() if hasattr(stats_ref, "hex") else id(stats_ref)
    stats = _STATS_CACHE.get(k)
    if stats is None:
        stats = ray.get(stats_ref) if hasattr(stats_ref, "hex") else stats_ref
        _STATS_CACHE[k] = stats
    df = t.select(keys + [col]).to_pandas()
    m = df.merge(stats, on=keys, how="left", sort=False)
    mu = m["_mu"].to_numpy(np.float64)
    sd = m["_sd"].to_numpy(np.float64)
    x = m[col].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (x - mu) / sd
    z[~np.isfinite(z)] = np.nan  # zero-variance group -> NULL (SQL NULLIF)
    scale = 10.0 ** round_digits
    z = np.where(np.isnan(z), np.nan, np.floor(np.abs(z) * scale + 0.5) / scale * np.sign(z))
    return t.append_column(out_col, pa.array(z, pa.float64()))


def grouped_zscore(ds, keys: list[str], col: str, out_col: str = "z",
                   round_digits: int = 6):
    """Per-group z-score normalization: ``(x - AVG(x) OVER key) /
    STDDEV_POP(x) OVER key`` — the feature-scaling step of a training
    pipeline, as two streaming passes instead of a windowed shuffle.

    Pass 1 combiner-aggregates per-key moments (sum, sum-of-squares, count)
    — the shuffle moves one row per key per batch, never raw rows.  The
    merged stats table is collected and broadcast once via ``ray.put``
    (partitioning assumption: ``keys`` is dimension-like — the stats table,
    NOT the data, must fit in one object).  Pass 2 is a stateless
    ``map_batches`` annotate with a per-worker cached lookup.

    Rows with a NULL ``col`` keep a NULL z; a zero-variance group yields
    NULL (matches SQL ``NULLIF(stddev_pop, 0)`` division).  ``round_digits``
    matches DuckDB ``ROUND`` half-away-from-zero so the oracle hash is exact.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [col]).to_pandas()
        df["_x"] = df[col].astype(np.float64)
        df["_xx"] = df["_x"] * df["_x"]
        df["_n"] = (~df[col].isna()).astype(np.int64)
        g = df.groupby(keys, as_index=False, sort=False)[["_x", "_xx", "_n"]].sum()
        return _clean_arrow(g)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(Sum("_x", alias_name="_x"), Sum("_xx", alias_name="_xx"),
                   Sum("_n", alias_name="_n"))
        .to_pandas()
    )
    n = merged["_n"].to_numpy(np.float64)
    mu = merged["_x"].to_numpy(np.float64) / np.maximum(n, 1.0)
    var = np.maximum(merged["_xx"].to_numpy(np.float64) / np.maximum(n, 1.0) - mu * mu, 0.0)
    stats = merged[keys].copy()
    stats["_mu"] = mu
    stats["_sd"] = np.sqrt(var)
    stats_ref = ray.put(stats)
    return ds.map_batches(
        _zscore_batch, batch_format="pyarrow",
        fn_kwargs=dict(keys=keys, col=col, out_col=out_col,
                       round_digits=round_digits, stats_ref=stats_ref),
    )


def pivot_sum(ds, keys: list[str], pivot_col: str, value_col: str,
              pivot_values: list[str], round_digits: int = 4):
    """``SELECT keys, SUM(value) FILTER (pivot_col = v) AS v ... GROUP BY
    keys`` — long-to-wide reshape with one output column per pivot value.

    The pivot domain must be ENUMERATED by the caller (``pivot_values``):
    at 100 TB a discover-the-domain pass would be its own aggregate, and an
    unbounded domain makes unbounded-width rows — the explicit list is the
    scale-safe contract (same posture as DuckDB's PIVOT ... IN).

    Combiner pattern: each batch collapses to one row per key with all pivot
    columns already summed (a batch-local pandas pivot_table), so the
    shuffle moves |keys-per-batch| x |pivot_values| cells, never raw rows.
    Keys absent a pivot value get 0.0 (SUM FILTER over an empty set is NULL
    in SQL; COALESCE to 0 in the oracle — the 0.0 contract is friendlier to
    downstream feature code).  Rows whose pivot value is outside
    ``pivot_values`` are dropped BEFORE grouping, so a key appearing only
    with out-of-domain values is absent from the output (mirror with a
    ``WHERE pivot_col IN (...)`` in SQL).
    """
    from ray.data.aggregate import Sum

    cols = [f"{v}" for v in pivot_values]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [pivot_col, value_col]).to_pandas()
        df = df[df[pivot_col].isin(pivot_values)]
        if df.empty:
            empty = {k: pd.Series([], dtype=object) for k in keys}
            empty.update({c: pd.Series([], dtype=np.float64) for c in cols})
            return _clean_arrow(pd.DataFrame(empty))
        w = df.pivot_table(index=keys, columns=pivot_col, values=value_col,
                           aggfunc="sum", fill_value=0.0)
        w = w.reindex(columns=pivot_values, fill_value=0.0)
        w.columns = cols
        return _clean_arrow(w.reset_index())

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def finish(t: pa.Table) -> pa.Table:
        scale = 10.0 ** round_digits
        out = {k: t[k] for k in keys}
        for c in cols:
            x = np.asarray(t[c].to_pylist(), dtype=np.float64)
            out[c] = pa.array(np.floor(np.abs(x) * scale + 0.5) / scale * np.sign(x),
                              pa.float64())
        return pa.table(out)

    return merged.map_batches(finish, batch_format="pyarrow")


def grouped_geomean(ds, keys: list[str], col: str, out_col: str = "geomean",
                    round_digits: int = 4):
    """Grouped geometric mean — ``exp(AVG(ln(col)))`` semantics, one log-sum
    combiner pass (log domain makes the product order-independent and
    overflow-free).  Defined for strictly positive values; NULLs are excluded
    (SQL aggregate semantics) and non-positive values yield a NULL group
    result (``ln`` is undefined there — mirror any rows you need around
    that).  Output: keys + ``out_col`` + ``n``."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [col]).to_pandas()
        df = df.dropna(subset=[col])
        x = df[col].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            df["_lg"] = np.where(x > 0, np.log(np.maximum(x, 1e-300)), np.nan)
        df["_bad"] = (x <= 0).astype(np.int64)
        df["_n"] = 1
        g = df.groupby(keys, as_index=False, sort=False)[["_lg", "_bad", "_n"]].sum()
        return _clean_arrow(g)

    merged = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
              .groupby(keys if len(keys) > 1 else keys[0])
              .aggregate(Sum("_lg", alias_name="_lg"),
                         Max("_bad", alias_name="_bad"),
                         Sum("_n", alias_name="_n")))

    def final(t: pa.Table) -> pa.Table:
        lg = t["_lg"].to_numpy(zero_copy_only=False)
        bad = t["_bad"].to_numpy(zero_copy_only=False)
        n = t["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            gm = np.where((bad > 0) | (n == 0), np.nan, np.exp(lg / np.maximum(n, 1.0)))
        scale = 10.0 ** round_digits
        gm = np.where(np.isnan(gm), np.nan, np.floor(gm * scale + 0.5) / scale)
        cols = {k: t[k] for k in keys}
        cols[out_col] = pa.array(gm, pa.float64())
        cols["n"] = pa.array(n.astype(np.int64), pa.int64())
        return pa.table(cols)

    return merged.map_batches(final, batch_format="pyarrow")


def grouped_skew_kurt(ds, keys: list[str], col: str, round_digits: int = 4):
    """Grouped sample skewness and excess kurtosis — SQL
    ``skewness(col) / kurtosis(col) GROUP BY keys`` (the bias-corrected G1 /
    G2 estimators DuckDB and Postgres use).

    TWO passes for numerical stability: raw third/fourth moments cancel
    catastrophically when ``|mean| >> stddev``, so pass 1 combiner-aggregates
    per-key means (one small shuffle, stats broadcast once — dimension-like
    keys assumption, as :func:`grouped_zscore`), and pass 2 accumulates
    CENTRAL moment partials ``Σ(x-μ)^k`` per batch before a second small
    shuffle.  Postgres/DuckDB edge semantics: skewness NULL when n < 3 or
    variance is 0; kurtosis NULL when n < 4 or variance is 0."""
    import ray
    from ray.data.aggregate import Sum

    def mean_partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [col]).to_pandas()
        df = df.dropna(subset=[col])
        df["_x"] = df[col].astype(np.float64)
        df["_n"] = 1
        g = df.groupby(keys, as_index=False, sort=False)[["_x", "_n"]].sum()
        return _clean_arrow(g)

    means = (ds.map_batches(mean_partial, batch_format="pyarrow", batch_size=65536)
             .groupby(keys if len(keys) > 1 else keys[0])
             .aggregate(Sum("_x", alias_name="_x"), Sum("_n", alias_name="_n"))
             .to_pandas())
    means["_mu"] = means["_x"].to_numpy(np.float64) / np.maximum(
        means["_n"].to_numpy(np.float64), 1.0)
    mu_ref = ray.put(means[keys + ["_mu"]])

    def central_partial(t: pa.Table, *, mu_ref) -> pa.Table:
        k = mu_ref.hex() if hasattr(mu_ref, "hex") else id(mu_ref)
        mu_df = _STATS_CACHE.get(k)
        if mu_df is None:
            mu_df = ray.get(mu_ref) if hasattr(mu_ref, "hex") else mu_ref
            _STATS_CACHE[k] = mu_df
        df = t.select(keys + [col]).to_pandas()
        df = df.dropna(subset=[col])
        m = df.merge(mu_df, on=keys, how="left", sort=False)
        d = m[col].to_numpy(np.float64) - m["_mu"].to_numpy(np.float64)
        m["_d2"] = d * d
        m["_d3"] = m["_d2"] * d
        m["_d4"] = m["_d2"] * m["_d2"]
        m["_n"] = 1
        g = m.groupby(keys, as_index=False, sort=False)[
            ["_d2", "_d3", "_d4", "_n"]].sum()
        return _clean_arrow(g)

    merged = (ds.map_batches(central_partial, batch_format="pyarrow",
                             batch_size=65536, fn_kwargs=dict(mu_ref=mu_ref))
              .groupby(keys if len(keys) > 1 else keys[0])
              .aggregate(Sum("_d2", alias_name="_d2"),
                         Sum("_d3", alias_name="_d3"),
                         Sum("_d4", alias_name="_d4"),
                         Sum("_n", alias_name="_n")))

    def final(t: pa.Table) -> pa.Table:
        n = t["_n"].to_numpy(zero_copy_only=False).astype(np.float64)
        m2 = t["_d2"].to_numpy(zero_copy_only=False) / np.maximum(n, 1.0)
        m3 = t["_d3"].to_numpy(zero_copy_only=False) / np.maximum(n, 1.0)
        m4 = t["_d4"].to_numpy(zero_copy_only=False) / np.maximum(n, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            g1 = m3 / m2 ** 1.5
            G1 = np.where((n >= 3) & (m2 > 0),
                          g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0), np.nan)
            g2 = m4 / (m2 * m2) - 3.0
            G2 = np.where((n >= 4) & (m2 > 0),
                          ((n + 1.0) * g2 + 6.0) * (n - 1.0)
                          / ((n - 2.0) * (n - 3.0)), np.nan)

        def rnd(v):
            scale = 10.0 ** round_digits
            sign = np.sign(v)
            return np.where(np.isnan(v), np.nan,
                            sign * np.floor(np.abs(v) * scale + 0.5) / scale)

        cols = {k: t[k] for k in keys}
        cols["skewness"] = pa.array(rnd(G1), pa.float64())
        cols["kurtosis"] = pa.array(rnd(G2), pa.float64())
        cols["n"] = pa.array(n.astype(np.int64), pa.int64())
        return pa.table(cols)

    return merged.map_batches(final, batch_format="pyarrow")


def grouped_robust_zscore(ds, keys: list[str], col: str, out_col: str = "rz",
                          round_digits: int = 6):
    """Per-group ROBUST z-score: ``(x - median(x)) / mad(x)`` — the
    outlier-resistant variant of :func:`grouped_zscore` (one extreme value
    shifts a mean/stddev z-score for the whole group; the median/MAD pair is
    insensitive to up to half the group being junk, which is what web-scale
    quality filtering needs).

    Pass 1 computes (median, MAD) per key with one bounded-group shuffle
    (order statistics don't combine — same contract as ``grouped_quantile``);
    the stats table (one row per key) is collected and broadcast once via
    ``ray.put``.  Pass 2 is the same stateless annotate as ``grouped_zscore``
    (shared ``_zscore_batch``, per-worker cached lookup).  A zero-MAD group
    yields NULL (SQL ``NULLIF(mad, 0)``); NULL values keep a NULL score."""
    import ray

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        out = {k: [df[k].iloc[0]] for k in keys}
        if len(v) == 0:
            out["_mu"], out["_sd"] = [np.nan], [np.nan]
        else:
            med = float(np.percentile(v, 50.0, method="linear"))
            out["_mu"] = [med]
            out["_sd"] = [float(np.percentile(np.abs(v - med), 50.0,
                                              method="linear"))]
        return pd.DataFrame(out)

    stats = (ds.select_columns(keys + [col])
             .groupby(keys if len(keys) > 1 else keys[0])
             .map_groups(per_group, batch_format="pandas")
             .to_pandas())
    # MAD == 0 -> NULL via the shared batch kernel's non-finite guard
    # (copy first: Dataset.to_pandas() frames are Arrow-backed read-only)
    sd = stats["_sd"].to_numpy(np.float64).copy()
    sd[sd == 0.0] = np.nan
    stats = stats.assign(_sd=sd)
    stats_ref = ray.put(stats)
    return ds.map_batches(
        _zscore_batch, batch_format="pyarrow",
        fn_kwargs=dict(keys=keys, col=col, out_col=out_col,
                       round_digits=round_digits, stats_ref=stats_ref),
    )


def grouped_mode(ds, key: str, col: str, out_val: str = "mode_val",
                 out_count: str = "mode_count", num_buckets: int | None = None):
    """Per-key statistical mode: the most frequent ``col`` value per ``key``,
    ties broken by smallest value (SQL: ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY COUNT(*) DESC, val ASC) = 1``).  Output ``(key, out_val,
    out_count)``.

    Combiner-shaped: per-batch ``(key, val) -> count`` partials (bounded by
    the distinct-pair count, not the row count) -> ONE bucketed shuffle on
    ``hash(key)`` -> vectorized merge + argmax per bucket.  NULL keys form
    their own group; NULL values are counted like any other value and sort
    last on ties (pandas and DuckDB both put NULLS LAST ascending)."""
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        g = df.groupby([key, col], sort=False, dropna=False).size().reset_index(name="__cnt")
        g["__bkt"] = (
            pd.util.hash_pandas_object(g[key], index=False).to_numpy() % num_buckets
        ).astype(np.int64)
        return _clean_arrow(g)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, col], sort=False, dropna=False, as_index=False)["__cnt"].sum()
        g = g.sort_values([key, "__cnt", col], ascending=[True, False, True],
                          kind="mergesort", na_position="last")
        out = g.drop_duplicates(key, keep="first").rename(
            columns={col: out_val, "__cnt": out_count})
        out[out_count] = out[out_count].astype(np.int64)
        return out[[key, out_val, out_count]]

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("__bkt").map_groups(final, batch_format="pandas")


def grouped_top_values(ds, key: str, col: str, k: int = 3,
                       out_count: str = "n", rank_col: str = "rnk",
                       num_buckets: int | None = None):
    """Per-key top-``k`` most frequent ``col`` values — the k-mode
    generalization of :func:`grouped_mode` (SQL: ``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY COUNT(*) DESC, val ASC) <= k``).  Output
    ``(key, col, out_count, rank_col)``.

    Same combiner shape as ``grouped_mode``: per-batch (key, val) count
    partials bound the shuffle by distinct pairs, one bucketed merge, then a
    vectorized per-bucket sort + head(k).  NULL keys form their own group;
    NULL values count and sort last on ties."""
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        g = df.groupby([key, col], sort=False, dropna=False).size().reset_index(name="__cnt")
        g["__bkt"] = (
            pd.util.hash_pandas_object(g[key], index=False).to_numpy() % num_buckets
        ).astype(np.int64)
        return _clean_arrow(g)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, col], sort=False, dropna=False, as_index=False)["__cnt"].sum()
        g = g.sort_values([key, "__cnt", col], ascending=[True, False, True],
                          kind="mergesort", na_position="last")
        out = g.groupby(key, sort=False, dropna=False).head(k).rename(
            columns={"__cnt": out_count})
        out[out_count] = out[out_count].astype(np.int64)
        out[rank_col] = out.groupby(key, sort=False, dropna=False).cumcount() + 1
        return out[[key, col, out_count, rank_col]]

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("__bkt").map_groups(final, batch_format="pandas")


def grouped_sum_grouping_sets(ds, keys: list[str], sum_col: str,
                              grouping_ids: list[int],
                              out_col: str = "total",
                              num_buckets: int | None = None):
    """``SELECT keys, SUM(sum_col), grouping_id GROUP BY GROUPING SETS(...)``
    — every requested level in one pass: the per-batch combiner emits
    partials for ALL levels, so the input is still read once and the single
    bucketed merge shuffle carries only pre-aggregated rows (level count is
    the replication factor of the PARTIALS, never of the input).

    ``grouping_ids``: one bitmask per grouping set — bit ``i`` set means
    ``keys[i]`` is rolled up (the SQL ``GROUPING()`` convention).  Rolled-up
    key columns are NULL; ``grouping_id`` disambiguates them from real NULL
    key values.  Sums are emitted as float64.  ``grouped_sum_rollup`` and
    ``grouped_sum_cube`` are the standard enumerations of this engine."""
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)
    nk = len(keys)
    if nk == 0:
        raise ValueError("grouping sets need at least one key")
    if not grouping_ids or len(set(grouping_ids)) != len(grouping_ids):
        raise ValueError("grouping_ids must be non-empty and distinct")
    if any(g < 0 or g >= (1 << nk) for g in grouping_ids):
        raise ValueError("grouping_id out of range for the key list")
    # explicit per-block Arrow schema: an all-rolled-up block would otherwise
    # infer a null-typed key column and degrade NULL -> NaN downstream
    in_schema = ds.schema()
    arrow_schema = in_schema.base_schema if hasattr(in_schema, "base_schema") else in_schema
    if isinstance(arrow_schema, pa.Schema):
        key_types = {k: arrow_schema.field(k).type for k in keys}
    else:  # PandasBlockSchema (from_pandas datasets): numpy dtypes
        dtypes = dict(zip(arrow_schema.names, arrow_schema.types))
        key_types = {
            k: (pa.string() if dtypes[k] == np.dtype(object)
                else pa.from_numpy_dtype(dtypes[k]))
            for k in keys
        }

    def _to_arrow(df: pd.DataFrame, val_name: str, with_bkt: bool) -> pa.Table:
        cols = {k: pa.array(df[k], type=key_types[k], from_pandas=True) for k in keys}
        cols[val_name] = pa.array(df[val_name].to_numpy(np.float64), pa.float64())
        cols["grouping_id"] = pa.array(df["grouping_id"].to_numpy(np.int64), pa.int64())
        if with_bkt:
            cols["__bkt"] = pa.array(df["__bkt"].to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [sum_col]).to_pandas()
        df[sum_col] = df[sum_col].astype(np.float64)
        parts = []
        for gid in grouping_ids:
            ks = [k for i, k in enumerate(keys) if not (gid >> i) & 1]
            if ks:
                g = df.groupby(ks, sort=False, dropna=False, as_index=False)[sum_col].sum()
            else:
                g = pd.DataFrame({sum_col: [df[sum_col].sum()]})
            for i, k in enumerate(keys):
                if (gid >> i) & 1:
                    g[k] = None
            g["grouping_id"] = np.int64(gid)
            parts.append(g[keys + [sum_col, "grouping_id"]])
        out = pd.concat(parts, ignore_index=True)
        out["__bkt"] = (
            pd.util.hash_pandas_object(out[keys + ["grouping_id"]], index=False).to_numpy()
            % num_buckets
        ).astype(np.int64)
        return _to_arrow(out, sum_col, with_bkt=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + ["grouping_id"], sort=False, dropna=False,
                       as_index=False)[sum_col].sum()
        g = g.rename(columns={sum_col: out_col})[keys + [out_col, "grouping_id"]]
        return _to_arrow(g, out_col, with_bkt=False).to_pandas()

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("__bkt").map_groups(final, batch_format="pandas")


def grouped_sum_rollup(ds, keys: list[str], sum_col: str, out_col: str = "total",
                       num_buckets: int | None = None):
    """``GROUP BY ROLLUP(keys)``: full detail, then each suffix of ``keys``
    rolled up, down to the grand total.  NB: bit ``i`` of ``grouping_id``
    refers to ``keys[i]``, so the rollup masks set TRAILING key bits."""
    nk = len(keys)
    gids = [((1 << lvl) - 1) << (nk - lvl) for lvl in range(nk + 1)]
    return grouped_sum_grouping_sets(ds, keys, sum_col, gids,
                                     out_col=out_col, num_buckets=num_buckets)


def grouped_sum_cube(ds, keys: list[str], sum_col: str, out_col: str = "total",
                     num_buckets: int | None = None):
    """``GROUP BY CUBE(keys)``: all ``2**len(keys)`` grouping sets."""
    return grouped_sum_grouping_sets(ds, keys, sum_col,
                                     list(range(1 << len(keys))),
                                     out_col=out_col, num_buckets=num_buckets)


def grouped_entropy(ds, key: str, col: str, out_col: str = "entropy",
                    round_digits: int | None = 4,
                    num_buckets: int | None = None):
    """Shannon entropy (bits) of the ``col`` value distribution within each
    ``key`` group: ``-Σ p·log2(p)`` over value frequencies — the
    concentration/diversity signal (e.g. event-type diversity per user,
    token diversity per host).

    Shape: per-batch (key, col) pair counts (combiner) → ``grouped_sum``
    merge on the pair → one bucketed pass per KEY computing the entropy
    from its (already tiny) per-value counts.  NULL ``col`` values are
    excluded; NULL keys form their own group."""
    from .pairs import stable_hash
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def pair_counts(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        df = df.dropna(subset=[col])
        g = df.groupby([key, col], sort=False, dropna=False).size().reset_index(name="c")
        return _clean_arrow(g)

    pairs = grouped_sum(ds.map_batches(pair_counts, batch_format="pyarrow"),
                        [key, col], {"c": "c"})

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(pc.cast(t[key], pa.string()).to_numpy(zero_copy_only=False))
        return t.append_column("__kb", pa.array((b % num_buckets).astype(np.int64)))

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        def ent(c: pd.Series) -> float:
            p = c.to_numpy(np.float64)
            p = p / p.sum()
            return float(-(p * np.log2(p)).sum())

        g = df.groupby(key, sort=False, dropna=False)["c"].agg(ent).reset_index(name=out_col)
        if round_digits is not None:
            g[out_col] = np.round(g[out_col], round_digits)
        return g

    return (pairs.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__kb").map_groups(
                lambda df: entropy(df.drop(columns="__kb")),
                batch_format="pandas"))


def share_within_group(ds, key: str, val_col: str, out_col: str = "share",
                       round_digits: int | None = 6):
    """``val / SUM(val) OVER (PARTITION BY key)`` — each row's share of its
    group total.  Two streaming passes: ``grouped_sum`` collapses to one
    row per key (combiner shuffle), the totals broadcast via ``ray.put``
    (bounded by |keys|, never rows), and a zero-shuffle ``map_batches``
    divides.  Rows with a NULL key get a NULL share."""
    import ray

    totals = grouped_sum(ds.select_columns([key, val_col]), [key],
                         {val_col: "__tot"}).to_pandas()
    t_keys = totals[key].to_numpy(dtype=object)
    ref = ray.put((t_keys, totals["__tot"].to_numpy(np.float64)))

    def div(t: pa.Table) -> pa.Table:
        keys_arr, tots = ray.get(ref)
        idx = pd.Index(keys_arr)
        k = t[key].to_numpy(zero_copy_only=False)
        pos = idx.get_indexer(pd.Index(k, dtype=object))
        tot = np.where(pos >= 0, tots[np.maximum(pos, 0)], np.nan)
        v = pc.cast(t[val_col], pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            share = np.where(tot != 0, v / tot, np.nan)
        if round_digits is not None:
            share = np.round(share, round_digits)
        return t.append_column(out_col, pa.array(share, pa.float64()))

    return ds.map_batches(div, batch_format="pyarrow")


def grouped_nunique(ds, key: str, col: str, out_col: str = "ndistinct",
                    num_buckets: int | None = None):
    """Exact per-key ``COUNT(DISTINCT col)`` without ever co-locating a whole
    key: the shuffle partitions on ``hash(key, col)`` PAIRS, so a hot key's
    distinct values spread across buckets; each (key, col) pair lands in
    exactly one bucket, making per-bucket partial counts sum exactly.

    Three stages: per-batch pair dedup (combiner) -> bucketed pair dedup +
    per-key partial count -> ``grouped_sum`` merge (its own bucketed
    shuffle on the now-tiny per-key partials).  NULL ``col`` values are
    excluded (SQL COUNT(DISTINCT) semantics); NULL keys form their own
    group.  NB: a key whose values are ALL NULL is omitted from the output
    (SQL would emit it with count 0) — its rows never survive the combiner."""
    from .scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, ds)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        u = df[[key, col]].dropna(subset=[col]).drop_duplicates()
        u["__bkt"] = (
            pd.util.hash_pandas_object(u[[key, col]], index=False).to_numpy() % num_buckets
        ).astype(np.int64)
        return u

    def partial_count(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(subset=[key, col])
        g = u.groupby(key, sort=False, dropna=False).size().reset_index(name="__cnt")
        g["__cnt"] = g["__cnt"].astype(np.int64)
        return g

    pairs = ds.select_columns([key, col]).map_batches(local, batch_format="pandas")
    partials = pairs.groupby("__bkt").map_groups(partial_count, batch_format="pandas")
    return grouped_sum(partials, [key], {"__cnt": out_col})


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_col: str = "name", val_col: str = "value"):
    """Wide -> long melt (SQL ``UNPIVOT`` / ``UNION ALL`` of per-column
    selects): one output row per (input row, value column), with the column
    name in ``var_col`` and its value cast to float64 in ``val_col``.

    Stateless single-pass ``map_batches``; each value column contributes one
    zero-copy column slice + a constant-string column, concatenated per
    batch — no shuffle, no per-row Python."""
    def fn(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_col] = pa.array(np.repeat(c, t.num_rows), pa.string())
            cols[val_col] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.select_columns(id_cols + value_cols).map_batches(
        fn, batch_format="pyarrow")


def grouped_string_agg(ds, key: str, val: str, sep: str = ",",
                       out_col: str = "agg", num_buckets: int | None = None):
    """``STRING_AGG(val, sep ORDER BY val) GROUP BY key``.  Values cast to
    string; NULL values are skipped (SQL STRING_AGG semantics — a key whose
    values are ALL NULL is omitted, matching ``WHERE val IS NOT NULL``);
    NULL keys form one group.  The ORDER BY makes the result deterministic
    under any partitioning.

    Shape: a concatenating aggregate cannot shrink in a combiner (every
    byte appears in the output), so rows ship straight to a bucketed
    key-hash shuffle and each key is assembled exactly once."""
    from .pairs import stable_hash
    from .scale import resolve_buckets

    B = resolve_buckets(num_buckets, ds)

    def local(t: pa.Table) -> pa.Table:
        v = pc.cast(t[val], pa.string())
        keep = pc.is_valid(v)
        k = t[key].filter(keep)
        h = stable_hash(
            pc.cast(k, pa.string()).combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table({key: k, val: v.filter(keep),
                         "__bkt": pa.array((h % B).astype(np.int64))})

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(val, kind="stable")
        g = (df.groupby(key, sort=False, dropna=False)[val]
               .agg(sep.join).reset_index(name=out_col))
        return g

    return (ds.select_columns([key, val])
            .map_batches(local, batch_format="pyarrow")
            .groupby("__bkt").map_groups(assemble, batch_format="pandas"))


def histogram_fixed(ds, col: str, lo: float, hi: float, nbins: int,
                    bucket_col: str = "bucket", count_col: str = "n"):
    """Equi-width histogram of a numeric column: ``bucket = clamp(floor(
    (x - lo) / ((hi - lo) / nbins)), 0, nbins - 1)`` with per-bucket counts.
    Out-of-range values clamp into the edge buckets; NULL (and NaN) values
    are excluded.  Only non-empty buckets appear (GROUP BY semantics).

    Pure combiner: each batch collapses to ≤ nbins rows via ``bincount``, so
    the shuffle moves O(nbins × batches) rows regardless of input size —
    the profiling primitive that stays cheap at any scale."""
    w = (float(hi) - float(lo)) / int(nbins)

    def local(t: pa.Table) -> pa.Table:
        x = pc.cast(t[col], pa.float64()).combine_chunks().drop_null().to_numpy()
        x = x[~np.isnan(x)]
        if not len(x):
            return pa.table({bucket_col: pa.array([], pa.int64()),
                             count_col: pa.array([], pa.int64())})
        b = np.clip(np.floor((x - float(lo)) / w), 0, nbins - 1).astype(np.int64)
        counts = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(counts)
        return pa.table({bucket_col: pa.array(nz, pa.int64()),
                         count_col: pa.array(counts[nz], pa.int64())})

    partials = ds.select_columns([col]).map_batches(local, batch_format="pyarrow")
    return grouped_sum(partials, [bucket_col], {count_col: count_col})


def profile_table(ds, columns: list[str], ndistinct: bool = True):
    """Per-column data profile — the first query a pipeline owner runs on an
    unfamiliar table: ``(col_name, n_rows, n_null, [n_distinct,] min_value,
    max_value)`` with min/max rendered as strings (computed on the NATIVE
    type first, so ``9 < 10`` even though ``"9" > "10"``).

    One streaming pass computes counts and typed min/max per (batch, column)
    — a combiner whose shuffle is k rows per batch.  ``ndistinct=True`` adds
    an exact per-column COUNT(DISTINCT) via the pair-sharded
    ``grouped_nunique`` machinery (the one genuinely wide part; switch it
    off for a cheap profile).  All-NULL columns report NULL min/max."""
    import ray.data as rd

    cols = list(columns)

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        mins_i, maxs_i = [], []
        mins_f, maxs_f = [], []
        mins_s, maxs_s = [], []
        for c in cols:
            arr = t[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            names.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            vi = va = vf = wf = vs = ws = None
            if len(arr) - arr.null_count > 0:
                typ = arr.type
                if pa.types.is_integer(typ) or pa.types.is_boolean(typ):
                    mm = pc.min_max(pc.cast(arr, pa.int64()))
                    vi, va = mm["min"].as_py(), mm["max"].as_py()
                elif pa.types.is_floating(typ):
                    mm = pc.min_max(pc.cast(arr, pa.float64()))
                    vf, wf = mm["min"].as_py(), mm["max"].as_py()
                else:
                    mm = pc.min_max(pc.cast(arr, pa.string()))
                    vs, ws = mm["min"].as_py(), mm["max"].as_py()
            mins_i.append(vi); maxs_i.append(va)
            mins_f.append(vf); maxs_f.append(wf)
            mins_s.append(vs); maxs_s.append(ws)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n_rows": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "min_i": pa.array(mins_i, pa.int64()),
            "max_i": pa.array(maxs_i, pa.int64()),
            "min_f": pa.array(mins_f, pa.float64()),
            "max_f": pa.array(maxs_f, pa.float64()),
            "min_s": pa.array(mins_s, pa.string()),
            "max_s": pa.array(maxs_s, pa.string()),
        })

    import ray

    # Arrow merge keeps nullable int64 minima exact (a pandas float64 round
    # trip would corrupt values past 2^53 — e.g. surrogate uid columns)
    tbls = [t for t in ray.get(
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    ) if t.num_rows]
    if not tbls:  # zero-row input (or all-empty blocks): profile of zeros
        tbls = [partial(pa.table({c: pa.array([], pa.null()) for c in cols}))]
    part = pa.concat_tables(tbls).combine_chunks()
    m = pa.TableGroupBy(part, "col_name").aggregate([
        ("n_rows", "sum"), ("n_null", "sum"),
        ("min_i", "min"), ("max_i", "max"),
        ("min_f", "min"), ("max_f", "max"),
        ("min_s", "min"), ("max_s", "max"),
    ])

    def fmt(i: int, lo: bool) -> str | None:
        sfx = "min" if lo else "max"
        vi = m[f"{sfx}_i_{sfx}"][i].as_py()
        if vi is not None:
            return str(vi)
        vf = m[f"{sfx}_f_{sfx}"][i].as_py()
        if vf is not None:
            return str(vf)
        return m[f"{sfx}_s_{sfx}"][i].as_py()

    out = pd.DataFrame({
        "col_name": m["col_name"].to_pylist(),
        "n_rows": np.asarray(m["n_rows_sum"].to_pylist(), np.int64),
        "n_null": np.asarray(m["n_null_sum"].to_pylist(), np.int64),
        "min_value": [fmt(i, True) for i in range(m.num_rows)],
        "max_value": [fmt(i, False) for i in range(m.num_rows)],
    })
    if ndistinct:
        def to_pairs(t: pa.Table) -> pa.Table:
            parts = []
            for c in cols:
                v = pc.cast(t[c], pa.string()).combine_chunks()
                u = v.drop_null().unique()
                parts.append(pa.table({
                    "col_name": pa.array(np.repeat(c, len(u)), pa.string()),
                    "val": u,
                }))
            return pa.concat_tables(parts)

        pairs = ds.select_columns(cols).map_batches(to_pairs, batch_format="pyarrow")
        nd = grouped_nunique(pairs, "col_name", "val", out_col="n_distinct").to_pandas()
        if "col_name" not in nd.columns:  # empty Dataset.to_pandas drops columns
            nd = pd.DataFrame({"col_name": pd.Series([], dtype=object),
                               "n_distinct": pd.Series([], dtype=np.int64)})
        out = out.merge(nd, on="col_name", how="left")
        out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
        out = out[["col_name", "n_rows", "n_null", "n_distinct",
                   "min_value", "max_value"]]
    return rd.from_pandas(out.reset_index(drop=True))


def skyline(ds, cols: dict[str, str], num_buckets: int | None = None):
    """Skyline / Pareto-frontier (Börzsönyi, Kossmann & Stocker, ICDE 2001):
    rows not DOMINATED by any other row.  ``cols`` maps column -> "min" |
    "max"; row r dominates row s iff r is at least as good on every skyline
    column and strictly better on at least one.

    The distributed shape is the textbook two-phase algorithm: (1) LOCAL
    skyline per batch (a combiner — dominated rows can never re-enter the
    global skyline, so each batch forwards only its own frontier), (2) global
    skyline over the union of local frontiers in one final task.  The final
    working set is the union of local skylines — small for anti-correlated
    and realistic dimensions (it equals the true skyline plus per-batch
    survivors); a pathological all-incomparable input degenerates to the
    full table, which matches the problem's output size, not a shuffle flaw.

    NULL semantics match the SQL ``NOT EXISTS`` dominance oracle: rows with
    NULL in any skyline column are excluded (three-valued comparisons make
    them incomparable in both directions).
    """
    names = list(cols)
    signs = np.array([1.0 if cols[c] == "min" else -1.0 for c in names])

    def _local_skyline(M: np.ndarray) -> np.ndarray:
        """Boolean keep-mask of the Pareto frontier of M (rows minimize)."""
        n = len(M)
        order = np.lexsort(M.T[::-1])  # sort by first col, then ties
        keep = np.ones(n, bool)
        kept: list[int] = []
        for i in order:
            dominated = False
            for j in kept:
                if (M[j] <= M[i]).all() and (M[j] < M[i]).any():
                    dominated = True
                    break
            if dominated:
                keep[i] = False
            else:
                kept.append(i)
        return keep

    def local(t: pa.Table) -> pa.Table:
        mask = np.ones(t.num_rows, bool)
        for c in names:
            mask &= t[c].is_valid().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(mask))
        if t.num_rows == 0:
            return t
        M = np.column_stack([
            t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in names]) * signs
        return t.filter(pa.array(_local_skyline(M)))

    candidates = ds.map_batches(local, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.drop(columns="__sky", errors="ignore")
        df = df.drop(columns="__sky")
        M = np.column_stack([
            df[c].to_numpy().astype(np.float64) for c in names]) * signs
        return df[_local_skyline(M)]

    # single final group: local frontiers are tiny relative to input
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("__sky", pa.array(
            np.zeros(t.num_rows, np.int64)))

    return (candidates.map_batches(tag, batch_format="pyarrow")
            .groupby("__sky").map_groups(final, batch_format="pandas"))
