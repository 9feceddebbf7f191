"""RecordLink mode: link two internally-dupe-free tables (reference C4/J3).

``RecordLink.join(data_1, data_2, threshold)`` links records ACROSS two
sources only (record_linkage_example/record_linkage_example.py:167; each side
internally dupe-free, record_linkage_example.py:3-8).  Ray-Data expression:

- union both tables with a ``source`` tag column (reference S3 reader,
  record_linkage_example.py:187-211) and namespaced ids (the reference uses
  ``filename + str(i)``, record_linkage_example.py:54)
- blocking as usual, but pair emission restricted to source 0 × source 1
  inside each block (pairs.py ``source_col``)
- score, threshold, then greedy one-to-one selection in descending score
  order (the public RecordLink semantics: each record participates in at
  most one link)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..blocking import fingerprint_dataset
from ..checkpoint import run_stage
from ..config import Settings
from ..pairs import candidate_pairs
from ..scoring import build_record_map, score_pairs, threshold_edges


def tag_sources(ds_a, ds_b, id_col: str):
    """Union with a source tag; ids prefixed to keep the namespaces disjoint."""

    def tag(src: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = pc.binary_join_element_wise(
                pa.array([str(src)] * t.num_rows, pa.string()),
                pc.cast(t[id_col], pa.string()),
                ":",
            )
            t = t.drop_columns([id_col]).append_column(id_col, ids)
            return t.append_column("__source", pa.array([src] * t.num_rows, pa.int8()))

        return fn

    return ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")
    )


def greedy_one_to_one(scored_df):
    """Driver-side greedy matching by descending score (links are small:
    bounded by min(|A|,|B|)).  Deterministic: ties broken by (id_a, id_b)."""
    taken_a: set = set()
    taken_b: set = set()
    out = []
    ordered = scored_df.sort_values(
        ["score", "id_a", "id_b"], ascending=[False, True, True], kind="stable"
    )
    for row in ordered.itertuples(index=False):
        if row.id_a in taken_a or row.id_b in taken_b:
            continue
        taken_a.add(row.id_a)
        taken_b.add(row.id_b)
        out.append(row)
    import pandas as pd

    return pd.DataFrame(out, columns=list(scored_df.columns))


def record_link(
    ds_a,
    ds_b,
    settings: Settings,
    id_col: str,
    workdir: str | None = None,
    idf: dict | None = None,
    one_to_one: bool = True,
    scorer_concurrency=(1, 4),
):
    """Two Datasets -> links Dataset/DataFrame (id_a, id_b, score).

    ``id_a`` is always from ``ds_a`` (source 0), ``id_b`` from ``ds_b``.
    """
    fp = settings.fingerprint() + ":rl"
    carry = sorted({f.column for f in settings.fields})
    tagged = tag_sources(ds_a, ds_b, id_col).materialize()
    blocks = run_stage(
        "rl_blocks",
        lambda: fingerprint_dataset(tagged, settings, id_col, ["__source"]),
        workdir,
        fp,
    )
    pairs = run_stage(
        "rl_pairs",
        lambda: candidate_pairs(
            blocks,
            id_col,
            [],
            max_block_size=settings.max_block_size,
            policy=settings.oversize_policy,
            source_col="__source",
        ),
        workdir,
        fp,
    )
    records = build_record_map(tagged, id_col, carry)
    scored = run_stage(
        "rl_scores",
        lambda: score_pairs(pairs, settings, idf=idf, concurrency=scorer_concurrency, records=records),
        workdir,
        fp,
    )
    links = threshold_edges(scored, settings.threshold)
    if not one_to_one:
        return links
    return greedy_one_to_one(links.to_pandas())
