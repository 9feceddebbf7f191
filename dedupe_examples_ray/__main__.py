"""Command-line entry points mirroring the reference's example scripts.

The reference ships per-mode driver scripts (csv_example.py:66-81 optparse CLI;
record_linkage_example.py / gazetteer_example.py with the same shape); here
one CLI covers the same workflows over Parquet/CSV tables:

    python -m dedupe_examples_ray dedupe  --input T.parquet --id-col id \\
        [--settings s.json | --preset documents|pages] --output out/ \\
        [--annotated ann/] [--workdir ck/]
    python -m dedupe_examples_ray link   --left A.parquet --right B.parquet ...
    python -m dedupe_examples_ray gazetteer --canonical C.parquet --messy M.parquet ...
    python -m dedupe_examples_ray train  --base s.json --training labeled.json \\
        [--recall 0.9] --out trained.json

This module OWNS the Ray session (guarded ``ray.init``) — library code never
initialises Ray (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """Guarded init; returns True only if THIS call started the session (so
    an embedding caller's — or test fixture's — session is never torn down)."""
    import ray

    started = not ray.is_initialized()
    if started:
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    return started


def _load_settings(args):
    from .config import Settings, default_page_settings
    from .pipelines.dedupe import document_settings

    if args.settings:
        return Settings.load(args.settings)
    presets = {"documents": document_settings, "pages": default_page_settings}
    if args.preset not in presets:
        sys.exit(f"--preset must be one of {sorted(presets)} (or pass --settings FILE)")
    return presets[args.preset]()


def _read(path: str, columns=None):
    from .sources.io import read_table

    return read_table(path, columns=columns)


def _derive(ds, args):
    """Apply the preset's field derivation (documents/pages) unless custom
    settings are given — custom settings name columns the input already has."""
    if args.settings:
        return ds
    if args.preset == "pages":
        from .normalize import derive_page_fields

        return ds.map_batches(derive_page_fields, batch_format="pyarrow")
    from .pipelines.dedupe import derive_document_fields

    return ds.map_batches(derive_document_fields, batch_format="pyarrow")


def cmd_dedupe(args):
    from .pipelines import dedupe_dataset
    from .sources.io import write_annotated_output, write_entity_map

    ds = _read(args.input)
    bkw = {}
    if getattr(args, "blocking", "predicates") != "predicates":
        bkw["blocking"] = args.blocking
        if args.snm_keys:
            bkw["snm_keys"] = args.snm_keys.split(",")
        bkw["snm_window"] = args.snm_window
    if args.settings:
        # custom settings: the input must already carry the compared columns
        ent = dedupe_dataset(ds, _load_settings(args), id_col=args.id_col,
                             workdir=args.workdir, **bkw)
    elif args.preset == "pages":
        from .pipelines import dedupe_pages

        ent = dedupe_pages(ds, workdir=args.workdir, **bkw)
    else:
        from .pipelines import dedupe_documents

        ent = dedupe_documents(ds, id_col=args.id_col, workdir=args.workdir,
                               **bkw)
    write_entity_map(ent, args.output)
    n = ent.count()
    print(f"entity map: {n} records -> {args.output}")
    if args.annotated:
        write_annotated_output(_read(args.input), ent, args.id_col, args.annotated)
        print(f"annotated output -> {args.annotated}")


def cmd_link(args):
    settings = _load_settings(args)
    from .pipelines import record_link

    links = record_link(
        _derive(_read(args.left), args), _derive(_read(args.right), args),
        settings, id_col=args.id_col,
        workdir=args.workdir, one_to_one=not args.many_to_many,
    )
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = links if isinstance(links, pd.DataFrame) else links.to_pandas()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), args.output)
    print(f"links: {len(df)} -> {args.output}")


def cmd_gazetteer(args):
    settings = _load_settings(args)
    from .pipelines import GazetteerIndex

    idx = GazetteerIndex(_derive(_read(args.canonical), args), settings,
                         id_col=args.id_col, workdir=args.workdir)
    out = idx.search(_derive(_read(args.messy), args), n_matches=args.n_matches,
                     threshold=args.threshold)
    out.write_parquet(args.output)
    print(f"matches -> {args.output}")


def cmd_train(args):
    from .config import Settings
    from .training import read_training, train_settings

    base = Settings.load(args.base)
    matches, distincts = read_training(args.training)
    trained = train_settings(base, matches, distincts, recall=args.recall)
    trained.save(args.out)
    print(f"trained settings ({len(matches)} match / {len(distincts)} distinct pairs"
          + (f", recall>={args.recall}" if args.recall else "") + f") -> {args.out}")


def cmd_span_dedup(args):
    """Corpus-wide duplicated-span removal (ops.spans.span_dedup)."""
    from .ops.spans import span_dedup

    out = span_dedup(
        _read(args.input), text_col=args.text_col, id_col=args.id_col,
        min_len=args.min_len,
    )
    out.write_parquet(args.output)
    import pyarrow.compute as pc

    stats = out.map_batches(
        lambda t: t.select(["n_spans_removed", "n_bytes_removed"]),
        batch_format="pyarrow",
    ).to_pandas().sum()
    print(f"span dedup -> {args.output}: {int(stats['n_spans_removed'])} spans "
          f"/ {int(stats['n_bytes_removed'])} bytes removed")


def cmd_query(args):
    """Run any registered pipeline from the driver surface by name."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(args.repo_root, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    if args.list or args.name is None:
        for n in sorted(qs):
            print(n)
        return
    if args.name not in qs:
        sys.exit(f"unknown query {args.name!r}; use --list")
    res = qs[args.name](args.sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if args.output:
        df.to_parquet(args.output)
        print(f"{args.name}: {len(df)} rows -> {args.output}")
    else:
        print(df.head(args.head).to_string())
        print(f"({len(df)} rows)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="dedupe_examples_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, settings=True):
        if settings:
            sp.add_argument("--settings", help="settings JSON artifact")
            sp.add_argument("--preset", default="documents",
                            help="built-in settings: documents|pages")
        sp.add_argument("--workdir", default=None, help="checkpoint/resume dir")

    d = sub.add_parser("dedupe", help="dedupe one table (reference csv_example)")
    d.add_argument("--input", required=True)
    d.add_argument("--id-col", required=True)
    d.add_argument("--output", required=True, help="entity-map parquet dir")
    d.add_argument("--annotated", default=None, help="annotated-records parquet dir")
    d.add_argument("--blocking", default="predicates",
                   choices=["predicates", "snm"],
                   help="candidate generation: settings predicates (default) "
                        "or sorted-neighborhood")
    d.add_argument("--snm-keys", default=None,
                   help="comma-separated sort-key columns for --blocking snm")
    d.add_argument("--snm-window", type=int, default=8)
    common(d)
    d.set_defaults(fn=cmd_dedupe)

    l = sub.add_parser("link", help="link two tables (record_linkage_example)")
    l.add_argument("--left", required=True)
    l.add_argument("--right", required=True)
    l.add_argument("--id-col", required=True)
    l.add_argument("--output", required=True, help="links parquet file")
    l.add_argument("--many-to-many", action="store_true")
    common(l)
    l.set_defaults(fn=cmd_link)

    g = sub.add_parser("gazetteer", help="index canonical, match messy (gazetteer_example)")
    g.add_argument("--canonical", required=True)
    g.add_argument("--messy", required=True)
    g.add_argument("--id-col", required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--n-matches", type=int, default=2)
    g.add_argument("--threshold", type=float, default=None)
    common(g)
    g.set_defaults(fn=cmd_gazetteer)

    q = sub.add_parser("query", help="run any registered pipeline by name")
    q.add_argument("name", nargs="?", default=None)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--repo-root", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    q.add_argument("--output", default=None, help="write result parquet here")
    q.add_argument("--head", type=int, default=20)
    q.add_argument("--list", action="store_true", help="list query names")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("span-dedup",
                       help="remove corpus-wide duplicated byte spans")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--id-col", default="doc_id")
    s.add_argument("--text-col", default="text")
    s.add_argument("--min-len", type=int, default=256)
    s.set_defaults(fn=cmd_span_dedup, settings=None, preset=None, workdir=None)

    t = sub.add_parser("train", help="fit settings from labeled pairs (train())")
    t.add_argument("--base", required=True, help="base settings JSON")
    t.add_argument("--training", required=True, help="labeled-pairs JSON")
    t.add_argument("--recall", type=float, default=None,
                   help="predicate-selection recall constraint (train(recall=...))")
    t.add_argument("--out", required=True)
    t.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    started = _init_ray(args.num_cpus) if args.cmd != "train" else False
    try:
        args.fn(args)
    finally:
        if started:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    main()
