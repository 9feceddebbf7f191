"""Gazetteer mode: match a messy stream against a canonical index (C5/T4/O2).

``Gazetteer.index(canonical)`` then ``search(messy, n_matches=k)``
(gazetteer_example/gazetteer_example.py:157-159); the Postgres variant
persists the canonical blocks out-of-core (gazetteer_postgres_example.py:
46-145) — our equivalent is a *materialized blocked canonical Dataset* that
many probe runs reuse.

Ray-Data expression:
- index: fingerprint the canonical table once -> canonical blocking map
  (materialized / checkpointed; the reusable state of T4)
- probe: fingerprint the messy table with the SAME settings, union the two
  blocking maps with a side tag, restrict pair emission to messy × canon
  (the J4 semi-join shape), score, then top-k per messy id via
  ``groupby(messy_id).map_groups`` (O2)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..blocking import fingerprint_dataset
from ..checkpoint import run_stage
from ..config import Settings
from ..pairs import candidate_pairs
from ..scoring import build_record_map, score_pairs, threshold_edges
from .record_link import tag_sources


class GazetteerIndex:
    """Blocked canonical store built once, probed many times (T4)."""

    def __init__(self, canonical_ds, settings: Settings, id_col: str, workdir: str | None = None):
        self.settings = settings
        self.id_col = id_col
        self.carry = sorted({f.column for f in settings.fields})
        self.workdir = workdir
        # canonical side is tagged source 1 so probe pairs come out as
        # (id_a=messy, id_b=canon)
        def build():
            import pyarrow.compute as pc

            def tag(t: pa.Table) -> pa.Table:
                ids = pc.binary_join_element_wise(
                    pa.array(["1"] * t.num_rows, pa.string()), pc.cast(t[id_col], pa.string()), ":"
                )
                t = t.drop_columns([id_col]).append_column(id_col, ids)
                return t.append_column("__source", pa.array([1] * t.num_rows, pa.int8()))

            tagged = canonical_ds.map_batches(tag, batch_format="pyarrow")
            return fingerprint_dataset(tagged, settings, id_col, ["__source"])

        self.blocks = run_stage(
            "gaz_index", build, workdir, settings.fingerprint() + ":gaz"
        ).materialize()
        # canonical record map: the reusable probe-time state (field values
        # never travel through blocking/pair shuffles)

        def tag_canon(t):
            import pyarrow as pa_
            import pyarrow.compute as pc_

            ids = pc_.binary_join_element_wise(
                pa_.array(["1"] * t.num_rows, pa_.string()), pc_.cast(t[id_col], pa_.string()), ":"
            )
            return t.drop_columns([id_col]).append_column(id_col, ids)

        self._canon_map = build_record_map(
            canonical_ds.map_batches(tag_canon, batch_format="pyarrow"), id_col, self.carry
        )

    def search(self, messy_ds, n_matches: int = 2, threshold: float | None = None, scorer_concurrency=(1, 4), idf: dict | None = None):
        """Top-k canonical matches per messy record -> (id_a, id_b, score)."""
        import pyarrow.compute as pc

        def tag(t: pa.Table) -> pa.Table:
            ids = pc.binary_join_element_wise(
                pa.array(["0"] * t.num_rows, pa.string()), pc.cast(t[self.id_col], pa.string()), ":"
            )
            t = t.drop_columns([self.id_col]).append_column(self.id_col, ids)
            return t.append_column("__source", pa.array([0] * t.num_rows, pa.int8()))

        tagged_messy = messy_ds.map_batches(tag, batch_format="pyarrow").materialize()
        messy_blocks = fingerprint_dataset(
            tagged_messy, self.settings, self.id_col, ["__source"]
        )
        pairs = candidate_pairs(
            messy_blocks.union(self.blocks),
            self.id_col,
            [],
            max_block_size=self.settings.max_block_size,
            policy=self.settings.oversize_policy,
            source_col="__source",
        )
        import pyarrow as pa_c

        records = pa_c.concat_tables(
            [self._canon_map, build_record_map(tagged_messy, self.id_col, self.carry)]
        ).combine_chunks()
        scored = score_pairs(pairs, self.settings, idf=idf, concurrency=scorer_concurrency, records=records)
        thr = self.settings.threshold if threshold is None else threshold
        scored = threshold_edges(scored, thr)

        def topk(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(
                ["score", "id_b"], ascending=[False, True], kind="stable"
            ).head(n_matches)

        return scored.groupby("id_a").map_groups(topk, batch_format="pandas")

    def absorb(self, messy_ds, threshold: float | None = None, idf: dict | None = None):
        """Match, then append UNMATCHED messy records to the canonical index —
        the 1.x gazetteer flow that grows the gazetteer with novel entities
        (gazetteer_postgres_example.py:330-345: unmatched messy rows inserted
        into the canonical table and re-indexed).

        Returns the match Dataset (id_a=messy, id_b=canon, score).  After the
        call, a subsequent ``search`` sees the absorbed records as canonical.
        """
        import pyarrow.compute as pc

        matches = self.search(messy_ds, n_matches=1, threshold=threshold, idf=idf).materialize()
        matched_raw = {
            r["id_a"].split(":", 1)[1] for r in matches.iter_rows()
        }
        id_col = self.id_col

        def keep_unmatched(t: pa.Table) -> pa.Table:
            raw = pc.cast(t[id_col], pa.string()).to_pylist()
            mask = pa.array([v not in matched_raw for v in raw])
            return t.filter(mask)

        unmatched = messy_ds.map_batches(keep_unmatched, batch_format="pyarrow")

        def tag_canon(t: pa.Table) -> pa.Table:
            ids = pc.binary_join_element_wise(
                pa.array(["1"] * t.num_rows, pa.string()), pc.cast(t[id_col], pa.string()), ":"
            )
            t = t.drop_columns([id_col]).append_column(id_col, ids)
            return t.append_column("__source", pa.array([1] * t.num_rows, pa.int8()))

        tagged = unmatched.map_batches(tag_canon, batch_format="pyarrow").materialize()
        if tagged.count() > 0:
            new_blocks = fingerprint_dataset(tagged, self.settings, id_col, ["__source"])
            self.blocks = self.blocks.union(new_blocks).materialize()
            self._canon_map = pa.concat_tables(
                [self._canon_map, build_record_map(tagged, id_col, self.carry)]
            ).combine_chunks()
        return matches
