"""WARC response-record source — reader + writer (the raw-crawl sibling of
:mod:`.wet`).

Common Crawl ships raw captures as WARC files (ISO 28500): concatenated
records, each a ``WARC/1.0`` header block (``Name: value`` lines incl.
``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``, ``Content-Length``)
followed by a blank line and ``Content-Length`` bytes of payload, then a
blank separator.  For ``WARC-Type: response`` records the payload is a full
HTTP response — status line + headers + CRLF CRLF + the raw body bytes —
which is exactly where the north-rule ``html:binary`` column comes from.

Parser contract (same as the WET parser): record extents come from the WARC
``Content-Length`` ONLY, so a body containing blank lines, ``WARC/1.0``
markers, or arbitrary binary cannot desynchronize framing.  Inside a
response record the HTTP envelope is split at the first blank line; the
status code and ``Content-Type`` are surfaced as columns and the body stays
**binary** (no decode — charset sniffing is a downstream transform).
Malformed records (missing Content-Length, truncated tail) yield
``parse_ok=False`` rows rather than exceptions; non-response records
(request / metadata / warcinfo) are skipped by default.

Scale shape: ``read_warc`` = ``ray.data.read_binary_files`` (one task per
file — files are the crawl's parallelism unit) → per-file parse that walks
record boundaries with offset arithmetic and one bytes-slice per record.
``write_warc`` emits one file per block with atomic tmp+rename commits.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

__all__ = ["format_warc_records", "parse_warc_bytes", "read_warc", "write_warc"]

_CRLF = b"\r\n"


def format_warc_records(urls, timestamps, bodies, statuses=None,
                        content_types=None) -> bytes:
    """Serialize parallel (url, timestamp[us or ISO str], body bytes)
    sequences into one WARC file's bytes as ``WARC-Type: response`` records
    with a minimal HTTP/1.1 envelope.  Record IDs are deterministic (md5 of
    url + date) so output files are reproducible byte-for-byte."""
    import datetime as dt

    out = []
    n = len(urls)
    statuses = statuses if statuses is not None else [200] * n
    content_types = (content_types if content_types is not None
                     else ["text/html"] * n)
    for u, ts, body, st, ct in zip(urls, timestamps, bodies, statuses,
                                   content_types):
        body = bytes(body) if body is not None else b""
        if isinstance(ts, (int, np.integer)):
            ts = dt.datetime.fromtimestamp(int(ts) / 1e6, dt.timezone.utc)
        iso = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
               if isinstance(ts, dt.datetime) else str(ts))
        http = _CRLF.join([
            b"HTTP/1.1 " + str(int(st)).encode() + b" OK",
            b"Content-Type: " + str(ct).encode("utf-8"),
            b"Content-Length: " + str(len(body)).encode(),
            b"", b"",
        ]) + body
        rid = hashlib.md5(str(u).encode("utf-8") + iso.encode()).hexdigest()
        out.append(_CRLF.join([
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
            b"WARC-Target-URI: " + str(u).encode("utf-8"),
            b"WARC-Date: " + iso.encode("ascii"),
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(http)).encode("ascii"),
            b"", b"",
        ]))
        out.append(http)
        out.append(_CRLF + _CRLF)
    return b"".join(out)


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response bytes -> (status, content_type, body).  A payload with
    no recognizable envelope is returned whole as the body (status None)."""
    if not payload.startswith((b"HTTP/1.", b"HTTP/2")):
        return None, None, payload
    hdr_end = payload.find(_CRLF + _CRLF)
    sep = 4
    if hdr_end == -1:
        hdr_end = payload.find(b"\n\n")
        sep = 2
    if hdr_end == -1:
        return None, None, payload
    head = payload[:hdr_end].decode("latin-1", "replace")
    lines = head.splitlines()
    status: int | None = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[hdr_end + sep:]


def parse_warc_bytes(data: bytes, path: str = "",
                     keep_types: tuple = ("response",)) -> pa.Table:
    """One WARC file's bytes -> Arrow table (url, warc_ts, html, http_status,
    content_type, n_bytes, parse_ok, path).  Content-Length-driven framing;
    record types outside ``keep_types`` are skipped; malformed records yield
    ``parse_ok=False`` with whatever fields were recovered."""
    urls: list = []
    tss: list = []
    htmls: list = []
    stats: list = []
    ctypes: list = []
    nb: list = []
    ok: list = []

    def emit(url, ts, html, st, ct, n, good):
        urls.append(url); tss.append(ts); htmls.append(html)
        stats.append(st); ctypes.append(ct); nb.append(n); ok.append(good)

    pos = 0
    n = len(data)
    while pos < n:
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
            emit(None, None, None, None, None, n - pos, False)
            break
        headers: dict = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").splitlines():
            if ":" in line:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
        rtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            emit(url, ts, None, None, None, 0, False)
            nxt = data.find(b"WARC/1.0", hdr_end + sep)
            pos = n if nxt == -1 else nxt
            continue
        body_start = hdr_end + sep
        body_end = body_start + length
        truncated = body_end > n
        payload = data[body_start:min(body_end, n)]
        pos = body_end
        if rtype not in keep_types:
            continue
        status, ctype, body = _split_http(payload)
        emit(url, ts, body, status, ctype, len(body),
             not truncated and url is not None)
    import pyarrow.compute as pc

    ts_parsed = pc.strptime(pa.array(tss, pa.string()),
                            format="%Y-%m-%dT%H:%M:%SZ", unit="us",
                            error_is_null=True)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts_parsed,
        "html": pa.array(htmls, pa.binary()),
        "http_status": pa.array(stats, pa.int32()),
        "content_type": pa.array(ctypes, pa.string()),
        "n_bytes": pa.array(nb, pa.int64()),
        "parse_ok": pa.array(ok, pa.bool_()),
        "path": pa.array([path] * len(urls), pa.string()),
    })


def read_warc(paths, keep_path: bool = False, strict: bool = False,
              keep_types: tuple = ("response",)):
    """WARC file(s) / directory -> Dataset (url, warc_ts, html, http_status,
    content_type, n_bytes [, parse_ok, path]).  ``strict=True`` raises on
    any malformed record instead of carrying parse_ok=False rows."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        parts = [parse_warc_bytes(b.as_py() if hasattr(b, "as_py") else b, p,
                                  keep_types)
                 for p, b in zip(t["path"].to_pylist(), t["bytes"])]
        out = pa.concat_tables(parts) if parts else parse_warc_bytes(b"")
        if strict and out.num_rows:
            import pyarrow.compute as pc

            bad = pc.sum(pc.cast(pc.invert(out["parse_ok"]), pa.int64())).as_py()
            if bad:
                raise ValueError(f"{bad} malformed WARC records in batch")
        drop = [] if keep_path else ["path"]
        return out.drop_columns(drop)

    return files.map_batches(parse, batch_format="pyarrow")


def write_warc(ds, out_dir: str, url_col: str = "url",
               ts_col: str = "warc_ts", html_col: str = "html") -> int:
    """Dataset -> directory of ``part-*.warc`` files (one per block, atomic
    tmp+rename — a killed writer leaves no partial visible file).  Returns
    the number of files written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table, ctx=None) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        data = format_warc_records(
            t[url_col].to_pylist(),
            t[ts_col].to_pylist(),
            t[html_col].to_pylist(),
        )
        tag = hashlib.md5(data[:4096] + str(t.num_rows).encode()).hexdigest()[:12]
        final = os.path.join(out_dir, f"part-{tag}.warc")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        return pa.table({"file": pa.array([final]),
                         "n": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(len(manifest))
