"""In-process tests for the ``python -m dedupe_examples_ray`` CLI."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from dedupe_examples_ray.__main__ import main


def test_cli_dedupe_roundtrip(ray_session, tmp_path):
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    inp = tmp_path / "docs.parquet"
    pq.write_table(src, inp)
    out = tmp_path / "entity_map"
    ann = tmp_path / "annotated"
    main(["dedupe", "--input", str(inp), "--id-col", "doc_id",
          "--preset", "documents", "--output", str(out), "--annotated", str(ann)])
    ent = pq.read_table(out)
    assert ent.num_rows == src.num_rows  # every record assigned (singletons too)
    assert {"record_id", "canon_id"} <= set(ent.column_names)
    annotated = pq.read_table(ann)
    assert annotated.num_rows == src.num_rows
    assert "cluster_id" in annotated.column_names
    # the CLI must not tear down the caller's Ray session
    import ray

    assert ray.is_initialized()


def test_cli_train(tmp_path):
    from dedupe_examples_ray.pipelines.dedupe import document_settings
    from dedupe_examples_ray.training import write_training

    base = tmp_path / "base.json"
    document_settings().save(str(base))
    m = [({"title": "alpha beta", "body_sig": None},
          {"title": "alpha beta", "body_sig": None})] * 8
    d = [({"title": "alpha beta", "body_sig": None},
          {"title": "zq xw", "body_sig": None})] * 8
    training = tmp_path / "training.json"
    write_training(str(training), m, d)
    out = tmp_path / "trained.json"
    main(["train", "--base", str(base), "--training", str(training),
          "--out", str(out)])
    art = json.loads(out.read_text())
    assert "fields" in art and "bias" in art


def test_cli_query_subcommand(ray_session, capsys):
    from dedupe_examples_ray.__main__ import main

    main(["query", "--list"])
    names = capsys.readouterr().out.split()
    assert "heavy_hitters_events" in names and len(names) > 80

    main(["query", "heavy_hitters_events", "--sf-dir", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert "rows)" in out


def test_cli_span_dedup_and_snm_blocking(ray_session, tmp_path, capsys):
    from dedupe_examples_ray.__main__ import main

    out = tmp_path / "span_out"
    main(["span-dedup", "--input", "/root/testdata/sf0.001/documents.parquet",
          "--output", str(out), "--min-len", "256"])
    txt = capsys.readouterr().out
    assert "span dedup ->" in txt and "bytes removed" in txt
    import ray.data as rd

    assert rd.read_parquet(str(out)).count() == 500

    em = tmp_path / "em_snm"
    main(["dedupe", "--input", "/root/testdata/sf0.001/documents.parquet",
          "--id-col", "doc_id", "--preset", "documents",
          "--output", str(em), "--blocking", "snm", "--snm-keys", "title"])
    assert "entity map: 500 records" in capsys.readouterr().out
