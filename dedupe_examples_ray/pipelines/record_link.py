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
from ..scoring import record_map_ref, score_pairs, threshold_edges


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


def _best_per(links_ds, key: str, other: str, num_buckets: int | None = None):
    """Per-``key`` best link under the total order (score desc, other asc) —
    bucketed groupby + vectorized per-bucket idxmax."""
    import numpy as np

    from ..pairs import stable_hash
    from ..scale import resolve_buckets

    num_buckets = resolve_buckets(num_buckets, links_ds)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = stable_hash(t[key].to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("__bkt", pa.array(b.astype(np.int64), pa.int64()))

    def best(df):
        df = df.sort_values(["score", other], ascending=[False, True], kind="stable")
        return df.drop_duplicates(subset=[key]).drop(columns=["__bkt"])

    return (
        links_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bkt")
        .map_groups(best, batch_format="pandas")
    )


def one_to_one_links(links_ds, driver_limit: int = 2_000_000, max_rounds: int = 50):
    """Greedy one-to-one matching at any scale.

    Small link sets (bounded pull, like the driver CC edge path) run the
    sequential greedy.  Larger ones run locally-dominant-edge rounds (Preis
    1999 matching): each round accepts every link that is simultaneously its
    id_a's best and its id_b's best under the total order (score desc, id_a,
    id_b), removes matched endpoints, repeats.  Under a total order this
    yields exactly the sequential greedy matching, with two bucketed
    shuffles per round instead of one global driver loop.
    """
    import ray
    import pyarrow.compute as pc_

    from ..scale import buckets_for

    n = links_ds.count()
    _B = buckets_for(n)
    if n <= driver_limit:
        tbls = list(links_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        if not tbls:
            import pandas as pd

            return pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        return greedy_one_to_one(pa.concat_tables(tbls).to_pandas())
    remaining = links_ds.materialize()
    accepted = []
    for _ in range(max_rounds):
        ba = _best_per(remaining, "id_a", "id_b")
        bb = _best_per(remaining, "id_b", "id_a")
        # mutual-best = rows present in BOTH per-side bests: bucket the union
        # by hash(id_a) (both copies of a pair land together) and keep rows
        # appearing twice
        import numpy as np

        from ..pairs import stable_hash

        def add_bucket(t: pa.Table) -> pa.Table:
            h = stable_hash(t["id_a"].to_numpy(zero_copy_only=False)) % _B
            return t.append_column("__bkt", pa.array(h.astype(np.int64), pa.int64()))

        def pick_mutual(df):
            dup = df.duplicated(subset=["id_a", "id_b"], keep="first")
            return df[dup].drop(columns=["__bkt"])

        mutual = (
            ba.union(bb)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bkt")
            .map_groups(pick_mutual, batch_format="pandas")
        ).materialize()
        if mutual.count() == 0:
            break
        accepted.append(mutual)
        m_tbl = pa.concat_tables(
            list(mutual.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
        ra = ray.put(pc_.unique(m_tbl["id_a"].combine_chunks()))
        rb = ray.put(pc_.unique(m_tbl["id_b"].combine_chunks()))

        def drop_matched(t: pa.Table) -> pa.Table:
            va = ray.get(ra) if isinstance(ra, ray.ObjectRef) else ra
            vb = ray.get(rb) if isinstance(rb, ray.ObjectRef) else rb
            keep = pc_.and_(
                pc_.invert(pc_.is_in(t["id_a"], value_set=va)),
                pc_.invert(pc_.is_in(t["id_b"], value_set=vb)),
            )
            return t.filter(keep)

        remaining = remaining.map_batches(drop_matched, batch_format="pyarrow").materialize()
        if remaining.count() == 0:
            break
    if not accepted:
        import pandas as pd

        return pd.DataFrame({"id_a": [], "id_b": [], "score": []})
    out = accepted[0]
    for part in accepted[1:]:
        out = out.union(part)
    return out


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
    records = record_map_ref(tagged, id_col, carry)
    scored = run_stage(
        "rl_scores",
        lambda: score_pairs(pairs, settings, idf=idf, concurrency=scorer_concurrency, records=records),
        workdir,
        fp,
    )
    links = threshold_edges(scored, settings.threshold)
    if not one_to_one:
        return links
    return one_to_one_links(links)
