"""Corpus statistics: token document frequencies -> IDF / common-token set.

Plays the role of the reference's ``corpus=`` generators feeding Text/Set
variables (record_linkage_example.py:95-98,112-114; patent_example.py:53-67)
and of the inverted-index build for index predicates
(mysql_example.py:200-211).

Scale design: the DF aggregate is **pre-aggregated inside map_batches** (one
(token, partial_count) row per token per batch) before the small
``groupby(token).sum`` — the classic combiner pattern, so the shuffle moves
per-batch-distinct tokens, not per-row tokens.  Only the *small* side is ever
collected: for canopy-style blocking we broadcast the COMMON-token set
(df > max_df), which is bounded by Zipf (the rare tail — unbounded at 100 TB —
never leaves the cluster; a token absent from the set is rare by definition).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _df_partial(batch: pa.Table, column: str) -> pa.Table:
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.cast(arr, pa.string())
    lists = pc.split_pattern_regex(pc.fill_null(arr, ""), r"\s+")
    # per-document distinct tokens -> document frequency, not term frequency
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
    keep = flat != ""
    if not keep.any():
        return pa.table({"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    import pandas as pd

    dedup = pd.DataFrame({"p": parents[keep], "t": flat[keep]}).drop_duplicates()
    counts = dedup["t"].value_counts()
    return pa.table(
        {
            "token": pa.array(counts.index.to_numpy(), pa.string()),
            "df": pa.array(counts.to_numpy(), pa.int64()),
        }
    )


def compute_token_df(ds, column: str, min_df: int = 1):
    """Dataset of (token, df) over ``column`` (whitespace tokens, per-doc
    distinct).  ``min_df`` prunes the Zipf tail post-aggregate (callers that
    broadcast the table treat absent tokens as df < min_df)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: _df_partial(b, column), batch_format="pyarrow", batch_size=4096
    )
    agg = partial.groupby("token").aggregate(Sum("df", alias_name="df"))
    if min_df > 1:
        agg = agg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], min_df)), batch_format="pyarrow"
        )
    return agg


def idf_from_df(df_table: pa.Table, n_docs: int, min_df: int = 1) -> dict:
    """IDF map {token: ln(n/(1+df))}; tokens under min_df omitted (caller
    treats unseen tokens as maximally rare with a default weight)."""
    toks = df_table["token"].to_pylist()
    dfs = df_table["df"].to_pylist()
    out = {}
    for t, d in zip(toks, dfs):
        if d >= min_df:
            out[t] = float(np.log(max(n_docs, 2) / (1.0 + d)))
    return out


def common_tokens_from_df(df_table: pa.Table, max_df: int) -> frozenset:
    """The broadcastable small side: tokens too common to block on."""
    mask = pc.greater(df_table["df"], max_df)
    return frozenset(df_table.filter(mask)["token"].to_pylist())
