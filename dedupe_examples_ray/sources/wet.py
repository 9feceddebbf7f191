"""WET-style (WARC conversion record) text source — reader + writer.

Common-Crawl-shaped corpora arrive as WET files: concatenated records, each
a small header block (``WARC/1.0`` + ``Name: value`` lines, including
``WARC-Target-URI``, ``WARC-Date`` and ``Content-Length``) followed by a
blank line and ``Content-Length`` bytes of extracted-text payload, then a
blank separator.  The reference repo reads CSVs (csv_example.py:41-55);
this module is the equivalent *source stage* for the north-rule input
(Parquet-of-web-pages is the engine's native format — WET is the upstream
interchange the crawl actually ships).

Parser contract (the robust one): payload extents come from
``Content-Length`` ONLY — a payload containing blank lines or even a
literal ``WARC/1.0`` line cannot desynchronize record framing.  Malformed
trailing bytes (truncated final record, missing Content-Length) are
surfaced as ``parse_ok=False`` rows rather than exceptions, so one corrupt
shard can't kill a 100-TB read.

Scale shape: ``read_wet`` = ``ray.data.read_binary_files`` (one task per
file — files are the parallelism unit, exactly how Common Crawl shards) →
``flat-map`` parse per file.  The per-record Python loop walks RECORD
boundaries (offset arithmetic + one bytes-slice per record, no per-byte or
per-line work on the payload); header blocks are a handful of short lines.
``write_wet`` emits one file per block via ``Dataset.map_batches`` writing
to the sink directory with atomic renames (partitioned, resumable by
re-run: complete files are content-addressed by block index).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["format_wet_records", "parse_wet_bytes", "read_wet", "write_wet"]

_CRLF = b"\r\n"


def format_wet_records(urls, timestamps, texts) -> bytes:
    """Serialize parallel (url, timestamp[us or ISO str], text) sequences
    into one WET file's bytes.  ``None`` text writes an empty payload."""
    import datetime as dt

    out = []
    for u, ts, tx in zip(urls, timestamps, texts):
        payload = (tx or "").encode("utf-8")
        if isinstance(ts, (int, np.integer)):
            ts = dt.datetime.fromtimestamp(int(ts) / 1e6, dt.timezone.utc)
        if isinstance(ts, dt.datetime):
            iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        else:
            iso = str(ts)
        out.append(_CRLF.join([
            b"WARC/1.0",
            b"WARC-Type: conversion",
            b"WARC-Target-URI: " + str(u).encode("utf-8"),
            b"WARC-Date: " + iso.encode("ascii"),
            b"Content-Length: " + str(len(payload)).encode("ascii"),
            b"", b"",
        ]))
        out.append(payload)
        out.append(_CRLF + _CRLF)
    return b"".join(out)


def parse_wet_bytes(data: bytes, path: str = "") -> pa.Table:
    """One WET file's bytes -> Arrow table (url, warc_ts, text, n_bytes,
    parse_ok, path).  Content-Length-driven framing; malformed records
    yield ``parse_ok=False`` with whatever fields were recovered."""
    urls: list = []
    tss: list = []
    texts: list = []
    nb: list = []
    ok: list = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (any run of CR/LF)
        while pos < n and data[pos] in (13, 10):
            pos += 1
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        sep = 4
        if hdr_end == -1:
            hdr_end = data.find(b"\n\n", pos)
            sep = 2
        if hdr_end == -1:
            # trailing garbage with no header terminator
            urls.append(None); tss.append(None)
            texts.append(None); nb.append(n - pos); ok.append(False)
            break
        headers: dict = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").splitlines():
            if ":" in line:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            urls.append(url); tss.append(ts)
            texts.append(None); nb.append(0); ok.append(False)
            # resync: jump to the next record marker
            nxt = data.find(b"WARC/1.0", hdr_end + sep)
            pos = n if nxt == -1 else nxt
            continue
        body_start = hdr_end + sep
        body_end = body_start + length
        truncated = body_end > n
        payload = data[body_start:min(body_end, n)]
        urls.append(url)
        tss.append(ts)
        texts.append(payload.decode("utf-8", "replace"))
        nb.append(len(payload))
        ok.append(not truncated and url is not None)
        pos = body_end
    ts_arr = pa.array(tss, pa.string())
    import pyarrow.compute as pc

    ts_parsed = pc.strptime(ts_arr, format="%Y-%m-%dT%H:%M:%SZ", unit="us",
                            error_is_null=True)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts_parsed,
        "text": pa.array(texts, pa.string()),
        "n_bytes": pa.array(nb, pa.int64()),
        "parse_ok": pa.array(ok, pa.bool_()),
        "path": pa.array([path] * len(urls), pa.string()),
    })


def read_wet(paths, keep_path: bool = False, strict: bool = False):
    """WET file(s) / directory -> Dataset (url, warc_ts, text, n_bytes
    [, parse_ok, path]).  ``strict=True`` raises on any malformed record
    instead of carrying parse_ok=False rows."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        parts = [parse_wet_bytes(b.as_py() if hasattr(b, "as_py") else b, p)
                 for p, b in zip(t["path"].to_pylist(), t["bytes"])]
        out = pa.concat_tables(parts) if parts else parse_wet_bytes(b"")
        if strict and out.num_rows:
            import pyarrow.compute as pc

            bad = pc.sum(pc.cast(pc.invert(out["parse_ok"]), pa.int64())).as_py()
            if bad:
                raise ValueError(f"{bad} malformed WET records in batch")
        drop = [] if keep_path else ["path"]
        return out.drop_columns(drop)

    return files.map_batches(parse, batch_format="pyarrow")


def write_wet(ds, out_dir: str, url_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text") -> int:
    """Dataset -> directory of ``part-NNNNN.wet`` files (one per block,
    atomic tmp+rename — a killed writer leaves no partial visible file).
    Returns the number of files written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table, ctx=None) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        data = format_wet_records(
            t[url_col].to_pylist(),
            t[ts_col].to_pylist(),
            t[text_col].to_pylist(),
        )
        import hashlib

        tag = hashlib.md5(data[:4096] + str(t.num_rows).encode()).hexdigest()[:12]
        final = os.path.join(out_dir, f"part-{tag}.wet")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        return pa.table({"file": pa.array([final]),
                         "n": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(len(manifest))
