"""Fingerprinter stage: records -> blocking map ``(block_key, id, carry...)``.

The Ray-Data expression of ``deduper.fingerprinter(full_data)`` streaming
``(block_key, record_id)`` into the blocking_map table
(mysql_example/mysql_example.py:217-226, pgsql_big_dedupe_example.py:243-255).

Design for scale (SURVEY.md §7):

- emission is a ``map_batches`` stage over Arrow batches — stateless when all
  predicates are simple, an **actor pool** when an index-backed predicate
  (rare_token) needs the broadcast common-token set (shipped once per actor
  via ``ray.put`` ref in the constructor, the T2 pattern).
- the compared field values are **denormalized into the blocking rows** so
  pair generation never needs the J2 hydration join back to the record table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import Settings
from .predicates import emit_keys


INDEX_PREDICATE_KINDS = ("rare_token", "tfidf_canopy")


class Fingerprinter:
    """Callable for ``map_batches``: emits the blocking map for one batch.

    ``common_ref`` may be a ``ray.ObjectRef`` to a frozenset of too-common
    tokens (resolved once per actor here in ``__init__``) or the frozenset
    itself (tests / driver-side use).

    ``df_ref``: Arrow table ``(token, df)`` (or a ray ref to it) backing the
    ``tfidf_canopy`` predicate — the T2 inverted-index pattern
    (mysql_example.py:200-211): shipped once via ``ray.put`` (zero-copy get),
    converted to one per-actor lookup dict in ``__init__``.  Only tokens with
    df >= 2 need to be present; unseen tokens are treated as df=1 (rarest) —
    that is what keeps the broadcast Zipf-bounded at corpus scale.
    """

    def __init__(
        self,
        settings_json: str,
        id_col: str,
        carry_cols: list[str],
        common_ref=None,
        df_ref=None,
    ):
        self.settings = Settings.from_json(settings_json)
        self.id_col = id_col
        self.carry_cols = list(carry_cols)
        self.common: frozenset = frozenset()
        if common_ref is not None:
            try:
                import ray

                if isinstance(common_ref, ray.ObjectRef):
                    common_ref = ray.get(common_ref)
            except ImportError:
                pass
            self.common = frozenset(common_ref)
        self.df: dict = {}
        if df_ref is not None:
            try:
                import ray

                if isinstance(df_ref, ray.ObjectRef):
                    df_ref = ray.get(df_ref)
            except ImportError:
                pass
            if isinstance(df_ref, pa.Table):
                self.df = dict(
                    zip(df_ref["token"].to_pylist(), df_ref["df"].to_pylist())
                )
            else:
                self.df = dict(df_ref)

    def _emit_rare_token(self, arr) -> tuple[np.ndarray, pa.Array]:
        idx, keys = emit_keys("token", arr)
        if not self.common:
            return idx, keys
        keep = np.array([k not in self.common for k in keys.to_pylist()], dtype=bool)
        return idx[keep], keys.filter(pa.array(keep))

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_idx: list[np.ndarray] = []
        all_keys: list[pa.Array] = []
        for pi, spec in enumerate(self.settings.predicates):
            spec = dict(spec)
            kind = spec.pop("kind")
            col = spec.pop("column")
            arr = batch[col]
            if kind == "rare_token":
                idx, keys = self._emit_rare_token(arr)
            elif kind == "tfidf_canopy":
                from .predicates import emit_tfidf_canopy

                idx, keys = emit_tfidf_canopy(arr, df=self.df, **spec)
            else:
                idx, keys = emit_keys(kind, arr, **spec)
            if len(idx) == 0:
                continue
            prefixed = pc.binary_join_element_wise(
                pa.array([f"{pi}"] * len(idx), pa.string()), pc.cast(keys, pa.string()), ":"
            )
            all_idx.append(idx)
            all_keys.append(prefixed)
        if not all_idx:
            cols = {"block_key": pa.array([], pa.string())}
            cols[self.id_col] = pa.array([], batch[self.id_col].type)
            for c in self.carry_cols:
                cols[c] = pa.array([], batch[c].type)
            return pa.table(cols)
        idx = np.concatenate(all_idx)
        keys = pa.concat_arrays(
            [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in all_keys]
        )
        take = pa.array(idx, pa.int64())
        cols = {"block_key": keys, self.id_col: batch[self.id_col].take(take)}
        for c in self.carry_cols:
            cols[c] = batch[c].take(take)
        return pa.table(cols)


def build_predicate_indexes(ds, settings: Settings, min_df: int = 2):
    """Pass-1 index build for index-backed predicates (reference B2 phase:
    ``SELECT DISTINCT field -> fingerprinter.index()``, mysql_example.py:200-211).

    Returns ``{column: ray.ObjectRef[pa.Table(token, df)]}`` for every column
    a ``tfidf_canopy`` predicate names — one DF aggregate per indexed column,
    broadcast once.  Tokens with df < min_df are dropped (treated as rarest
    by the emitter), which Zipf-bounds the broadcast.
    """
    import ray

    from .corpus import compute_token_df

    out: dict = {}
    for p in settings.predicates:
        if p.get("kind") != "tfidf_canopy":
            continue
        col = p["column"]
        if col in out:
            continue
        df_tbl = compute_token_df(ds, col, min_df=min_df)
        tbls = list(df_tbl.iter_batches(batch_size=None, batch_format="pyarrow"))
        tbl = (
            pa.concat_tables(tbls).combine_chunks()
            if tbls
            else pa.table({"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        )
        out[col] = ray.put(tbl)
    return out


def fingerprint_dataset(
    ds,
    settings: Settings,
    id_col: str,
    carry_cols: list[str],
    common_tokens=None,
    df_indexes: dict | None = None,
    concurrency=None,
    batch_size: int = 8192,
):
    """Apply the fingerprinter over a Dataset -> blocking-map Dataset.

    Index-backed predicates (rare_token, tfidf_canopy) get their broadcast
    index resolved once per worker; ``df_indexes`` comes from
    ``build_predicate_indexes`` (auto-built here when absent).
    """
    kinds = {p.get("kind") for p in settings.predicates}
    needs_common = "rare_token" in kinds
    needs_df = "tfidf_canopy" in kinds
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    df_ref = None
    if needs_df:
        if df_indexes is None:
            df_indexes = build_predicate_indexes(ds, settings)
        # one df table serves all canopy predicates on the same column; with
        # multiple indexed columns, merge (prefix tokens by column) — current
        # settings artifacts index a single column
        canopy_cols = {p["column"] for p in settings.predicates if p.get("kind") == "tfidf_canopy"}
        if len(canopy_cols) > 1:
            raise NotImplementedError("one tfidf_canopy column per settings artifact")
        df_ref = df_indexes[next(iter(canopy_cols))]
    if needs_common or needs_df or concurrency is not None:
        common_ref = common_tokens
        if needs_common and common_tokens is not None:
            import ray

            if not isinstance(common_tokens, ray.ObjectRef):
                common_ref = ray.put(frozenset(common_tokens))
        return ds.map_batches(
            Fingerprinter,
            fn_constructor_kwargs=dict(
                settings_json=settings.to_json(),
                id_col=id_col,
                carry_cols=carry_cols,
                common_ref=common_ref,
                df_ref=df_ref,
            ),
            concurrency=concurrency or 4,
            **kwargs,
        )
    fp = Fingerprinter(settings.to_json(), id_col, carry_cols)
    return ds.map_batches(fp, **kwargs)
