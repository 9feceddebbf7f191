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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def grouped_sum(ds, keys: list[str], sum_cols: dict[str, str], count_col: str | None = None,
                round_digits: int | None = None):
    """``SELECT keys, SUM(col) AS alias..., COUNT(*) FROM ds GROUP BY keys``.

    ``sum_cols``: {source_col: output_alias}.  Partial-aggregates per batch
    before the shuffle (combiner).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + list(sum_cols)).to_pandas()
        agg = {c: "sum" for c in sum_cols}
        g = df.groupby(keys, as_index=False, sort=False).agg(agg)
        if count_col:
            cnt = df.groupby(keys, as_index=False, sort=False).size()
            g[count_col] = cnt["size"].to_numpy()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    aggs = [Sum(c, alias_name=alias) for c, alias in sum_cols.items()]
    if count_col:
        aggs.append(Sum(count_col, alias_name=count_col))
    out = partials.groupby(keys if len(keys) > 1 else keys[0]).aggregate(*aggs)
    if round_digits is not None:
        def rnd(t: pa.Table) -> pa.Table:
            for alias in sum_cols.values():
                i = t.column_names.index(alias)
                t = t.set_column(i, alias, pc.round(t[alias], ndigits=round_digits))
            return t

        out = out.map_batches(rnd, batch_format="pyarrow")
    return out


def distinct(ds, cols: list[str], num_buckets: int = 64):
    """``SELECT DISTINCT cols`` (reference A1, mysql_init_db.py:134-143).

    Per-batch drop_duplicates (combiner) -> bucketed shuffle on a row hash ->
    vectorized drop_duplicates per bucket; no per-row groups.
    """

    def local(df: pd.DataFrame) -> pd.DataFrame:
        u = df[cols].drop_duplicates()
        u["bucket"] = (
            pd.util.hash_pandas_object(u, index=False).to_numpy() % num_buckets
        ).astype(np.int64)
        return u

    proj = ds.select_columns(cols).map_batches(local, batch_format="pandas")
    return proj.groupby("bucket").map_groups(
        lambda df: df.drop_duplicates(subset=cols).drop(columns=["bucket"]),
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
        return pa.Table.from_pandas(out, preserve_index=False)


def broadcast_left_join(ds, right_df: pd.DataFrame, on: str, fill: dict | None = None,
                        concurrency=(1, 4)):
    """LEFT JOIN with a small broadcast right side + COALESCE fills (J6)."""
    import ray

    ref = ray.put(right_df)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs=dict(right_ref=ref, on=on, fill=fill),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def dim_join(fact_ds, dims: list[tuple[pd.DataFrame, str]], select: list[str] | None = None,
             concurrency=(1, 4)):
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
