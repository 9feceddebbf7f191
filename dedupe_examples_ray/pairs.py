"""Candidate-pair generation — THE wide shuffle (SURVEY.md §4, J1/A4).

Ray-Data expression of the reference's SQL blocking self-join:
``blocking_map a JOIN blocking_map b USING (block_key) WHERE a.id < b.id``
followed by ``DISTINCT`` pair dedup (mysql_example/mysql_example.py:240-264,
unique index mysql_example.py:234).

- ``groupby(block_key).map_groups`` emits within-block pairs with the
  ``id_a < id_b`` ordered-pair constraint (sorted unique ids + triu indices).
- **Skew**: a hot block key makes O(n²) pairs in one group.  Groups larger
  than ``max_block_size`` are *salted*: members are deterministically split
  (stable crc32 of id) into ceil(n/cap) sub-blocks and pairs are emitted only
  within sub-blocks — bounded recall loss, never silent: ``pair_metrics``
  reports emitted/capped/dropped counts per run (north_rule: no silent caps).
- Record fields are already denormalized into blocking rows (fingerprint.py),
  so pair rows carry both sides' values and no hydration join (J2) is needed.
- Cross-block duplicate pairs are removed by a second shuffle keyed on the
  canonical (id_a, id_b) — reference A4 ``DISTINCT``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _stable_hash(ids: np.ndarray) -> np.ndarray:
    return np.array([zlib.crc32(str(x).encode()) for x in ids], dtype=np.uint64)


def _emit_pairs_table(
    tbl: pa.Table,
    id_col: str,
    carry_cols: list[str],
    max_block_size: int,
    policy: str,
    source_col: str | None,
) -> pa.Table:
    """Pairs for ONE block group (already grouped by block_key)."""
    df = tbl.select([id_col] + carry_cols + ([source_col] if source_col else [])).to_pandas()
    df = df.drop_duplicates(subset=[id_col]).reset_index(drop=True)
    n = len(df)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []

    def within(indices: np.ndarray):
        if source_col is None:
            k = len(indices)
            if k < 2:
                return
            ia, ib = np.triu_indices(k, k=1)
            out_a.append(indices[ia])
            out_b.append(indices[ib])
        else:
            src = df[source_col].to_numpy()[indices]
            left = indices[src == 0]
            right = indices[src != 0]
            if len(left) == 0 or len(right) == 0:
                return
            ia, ib = np.meshgrid(left, right, indexing="ij")
            out_a.append(ia.ravel())
            out_b.append(ib.ravel())

    order = np.argsort(df[id_col].to_numpy(), kind="stable")
    if n <= max_block_size or policy == "keep":
        within(order)
    elif policy == "drop":
        pass
    else:  # salt
        k = -(-n // max_block_size)  # ceil
        salt = _stable_hash(df[id_col].to_numpy()[order]) % k
        for s in range(k):
            within(order[salt == s])

    if not out_a:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=df[id_col].dtype),
                "id_b": pd.Series([], dtype=df[id_col].dtype),
                **{f"{c}_a": pd.Series([], dtype=df[c].dtype) for c in carry_cols},
                **{f"{c}_b": pd.Series([], dtype=df[c].dtype) for c in carry_cols},
            }
        )
        return pa.Table.from_pandas(empty, preserve_index=False)

    ia = np.concatenate(out_a)
    ib = np.concatenate(out_b)
    data = {"id_a": df[id_col].to_numpy()[ia], "id_b": df[id_col].to_numpy()[ib]}
    for c in carry_cols:
        vals = df[c].to_numpy()
        data[f"{c}_a"] = vals[ia]
        data[f"{c}_b"] = vals[ib]
    return pa.Table.from_pandas(pd.DataFrame(data), preserve_index=False)


def candidate_pairs(
    blocks_ds,
    id_col: str,
    carry_cols: list[str],
    max_block_size: int = 200,
    policy: str = "salt",
    source_col: str | None = None,
    dedup: bool = True,
):
    """blocking-map Dataset -> deduped candidate-pair Dataset.

    ``source_col``: when set (RecordLink mode, J3), pairs are emitted only
    across source 0 × source 1 inside each block.
    """

    def emit(tbl: pa.Table) -> pa.Table:
        return _emit_pairs_table(tbl, id_col, carry_cols, max_block_size, policy, source_col)

    pairs = blocks_ds.groupby("block_key").map_groups(emit, batch_format="pyarrow")
    if dedup:
        pairs = pairs.groupby(["id_a", "id_b"]).map_groups(
            lambda t: t.slice(0, 1), batch_format="pyarrow"
        )
    return pairs


def pair_metrics(blocks_ds, id_col: str, max_block_size: int = 200, policy: str = "salt") -> dict:
    """Emitted / capped / dropped pair counts (no silent caps — SURVEY.md §4).

    Cheap second pass over the (block_key, id) projection only.
    """
    from ray.data.aggregate import Count

    sizes = (
        blocks_ds.select_columns(["block_key", id_col])
        .groupby(["block_key", id_col])
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
        .groupby("block_key")
        .aggregate(Count(alias_name="n"))
    )
    tbl = sizes.to_pandas()
    n = tbl["n"].to_numpy(dtype=np.int64)
    full = n * (n - 1) // 2
    emitted = np.where(n <= max_block_size, full, 0)
    over = n[n > max_block_size]
    salted_emit = 0
    for sz in over:
        k = -(-sz // max_block_size)
        base, rem = divmod(sz, k)
        # worst-case-even split estimate of salted emission
        salted_emit += rem * (base + 1) * base // 2 + (k - rem) * base * (base - 1) // 2
    if policy == "salt":
        emitted_total = int(emitted.sum()) + int(salted_emit)
    elif policy == "drop":
        emitted_total = int(emitted.sum())
    else:
        emitted_total = int(full.sum())
    return {
        "blocks": int(len(n)),
        "blocks_over_cap": int((n > max_block_size).sum()),
        "pairs_full": int(full.sum()),
        "pairs_emitted_est": emitted_total,
        "pairs_dropped_est": int(full.sum()) - emitted_total,
    }
