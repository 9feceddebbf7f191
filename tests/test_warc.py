"""sources/warc.py: WARC response-record reader/writer."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa

from dedupe_examples_ray.sources.warc import (
    format_warc_records,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

TS = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)


def test_roundtrip_binary_bodies():
    bodies = [b"<html>hi</html>", b"", b"\x00\xffraw bytes \x80"]
    data = format_warc_records(
        ["http://a/1", "http://a/2", "http://b/3"], [TS] * 3, bodies)
    t = parse_warc_bytes(data)
    assert t.num_rows == 3
    assert t["parse_ok"].to_pylist() == [True] * 3
    assert t["html"].to_pylist() == bodies
    assert t["http_status"].to_pylist() == [200] * 3
    assert t["content_type"].to_pylist() == ["text/html"] * 3
    assert t["url"].to_pylist() == ["http://a/1", "http://a/2", "http://b/3"]
    assert t["warc_ts"][0].as_py() == TS.replace(tzinfo=None)


def test_hostile_payload_cannot_desync_framing():
    """A body containing WARC markers, blank lines and CRLFs must not split
    the record — framing is Content-Length-driven only."""
    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nHTTP/1.1 200 OK\r\n\r\n"
    data = format_warc_records(["http://e/1", "http://e/2"], [TS] * 2,
                               [evil, b"after"])
    t = parse_warc_bytes(data)
    assert t.num_rows == 2
    assert t["html"].to_pylist() == [evil, b"after"]
    assert t["parse_ok"].to_pylist() == [True, True]


def test_non_response_records_skipped():
    # a well-formed request record followed by a response record
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://r/1\r\n"
           b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
           b"Content-Length: 5\r\n\r\nGET /\r\n\r\n")
    resp = format_warc_records(["http://r/2"], [TS], [b"body"])
    t = parse_warc_bytes(req + resp)
    assert t["url"].to_pylist() == ["http://r/2"]
    t2 = parse_warc_bytes(req + resp, keep_types=("request", "response"))
    assert t2.num_rows == 2


def test_truncated_and_missing_length_are_parse_ok_false():
    good = format_warc_records(["http://g/1"], [TS], [b"0123456789"])
    truncated = good[:-8]  # cut into the body
    t = parse_warc_bytes(truncated)
    assert t.num_rows == 1 and t["parse_ok"].to_pylist() == [False]
    noclen = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: http://m/1\r\n"
              b"WARC-Date: 2024-06-01T00:00:00Z\r\n\r\n")
    t2 = parse_warc_bytes(noclen + good)
    assert t2["parse_ok"].to_pylist() == [False, True]
    assert t2["url"].to_pylist() == ["http://m/1", "http://g/1"]


def test_envelope_parsing_status_and_ctype():
    http = (b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain; "
            b"charset=utf-8\r\nX-Y: z\r\n\r\nmissing")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://s/1\r\n"
           b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http)
    t = parse_warc_bytes(rec)
    assert t["http_status"].to_pylist() == [404]
    assert t["content_type"].to_pylist() == ["text/plain; charset=utf-8"]
    assert t["html"].to_pylist() == [b"missing"]


def test_payload_without_http_envelope_kept_whole():
    raw = b"not an http response at all"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://n/1\r\n"
           b"WARC-Date: 2024-06-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(raw)).encode() + b"\r\n\r\n" + raw)
    t = parse_warc_bytes(rec)
    assert t["html"].to_pylist() == [raw]
    assert t["http_status"].to_pylist() == [None]


def test_ray_roundtrip_and_atomic_files(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({
        "url": [f"http://x/{i}" for i in range(10)],
        "warc_ts": [TS] * 10,
        "html": [f"<html>{i}</html>".encode() for i in range(10)],
    })
    out = str(tmp_path / "warc_out")
    n_files = write_warc(rd.from_pandas(df), out)
    assert n_files >= 1
    back = read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == 10
    assert bool(back["parse_ok"].all())
    got = dict(zip(back["url"], back["html"]))
    assert got == dict(zip(df["url"], df["html"]))
    import os
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_consolidate_record_blocks_skips_empty_schema_blocks():
    """read_binary_files-style sources emit zero-row blocks with an EMPTY
    schema; the broadcast record-map consolidation must not die on them."""
    import pyarrow as pa

    from dedupe_examples_ray.scoring import _consolidate_record_blocks

    good = pa.table({"url": ["a", "b"], "text": ["x", "y"]})
    empty_schema = pa.table({})
    out = _consolidate_record_blocks(empty_schema, good, empty_schema)
    assert out.num_rows == 2 and out.column_names == ["url", "text"]
    all_empty = _consolidate_record_blocks(empty_schema)
    assert all_empty.num_rows == 0


def test_warc_to_dedupe_pipeline_end_to_end(ray_session, tmp_path):
    """Source-to-clusters through the raw container: pages -> WARC files ->
    read_warc -> extract -> dedupe keeps the gold F1 contract and the
    byte-identical extraction invariant across the container boundary."""
    from dedupe_examples_ray.evaluate import evaluate_entity_map
    from dedupe_examples_ray.extract import extract_batch
    from dedupe_examples_ray.pipelines import dedupe_pages
    from dedupe_examples_ray.sources import read_warc, write_warc
    from dedupe_examples_ray.synth import synth_pages_dataset

    full = synth_pages_dataset(60, seed=21)
    gold = full.select_columns(["url", "true_id"]).to_pandas()
    direct = full.select_columns(["url", "text"]).to_pandas()
    out = str(tmp_path / "warc")
    write_warc(full.select_columns(["url", "warc_ts", "html"]), out)
    back = read_warc(out).map_batches(extract_batch, batch_format="pyarrow")
    ext = back.select_columns(["url", "text"]).to_pandas()
    cmp = direct.merge(ext, on="url", suffixes=("_d", "_w"))
    assert (cmp["text_d"] == cmp["text_w"]).all()
    entity = dedupe_pages(
        read_warc(out).map_batches(extract_batch, batch_format="pyarrow")
        .select_columns(["url", "text"])).to_pandas()
    assert evaluate_entity_map(entity, gold)["f1"] >= 0.99
