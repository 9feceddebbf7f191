"""Baseline-JPEG + PNG codec kernels (pure numpy/stdlib): round-trip,
format dispatch, poison handling, and the actor-stage integration."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dedupe_examples_ray.ops.codecs import (
    decode_image,
    decode_jpeg,
    decode_png,
    encode_bmp,
    encode_jpeg,
    encode_png,
)


def _smooth(h, w, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [yy * 255 / h, xx * 255 / w, (yy + xx) * 255 / (h + w)], axis=-1
    )
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_quality():
    img = _smooth(48, 64)
    for q, bound in ((90, 5.0), (70, 9.0)):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape and out.dtype == np.uint8
        err = np.abs(out.astype(float) - img.astype(float)).mean()
        assert err < bound, (q, err)


def test_jpeg_flat_and_odd_dims():
    flat = np.full((16, 16, 3), 77, np.uint8)
    assert np.abs(
        decode_jpeg(encode_jpeg(flat)).astype(float) - 77
    ).mean() < 1.5
    odd = _smooth(45, 61)
    out = decode_jpeg(encode_jpeg(odd, quality=85))
    assert out.shape == (45, 61, 3)


def test_jpeg_poison():
    good = encode_jpeg(_smooth(24, 24))
    for p in (b"", b"\xff\xd8", b"garbage", good[:20], b"\xff\xd8\xff\xc2" + good[4:]):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(p)


def test_png_roundtrip_lossless():
    img = _smooth(37, 53, seed=5)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_filters_and_color_types():
    # exercise Sub/Up/Average/Paeth by hand-building a 2-row RGB PNG
    w, h = 6, 2
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int64)
    lines = []
    # row 0: Sub filter
    r0 = flat[0].copy()
    enc0 = np.zeros(stride, np.int64)
    for x in range(stride):
        a = r0[x - 3] if x >= 3 else 0
        enc0[x] = (r0[x] - a) & 0xFF
    lines.append(bytes([1]) + bytes(enc0.astype(np.uint8)))
    # row 1: Paeth filter
    r1 = flat[1]
    enc1 = np.zeros(stride, np.int64)
    for x in range(stride):
        a = r1[x - 3] if x >= 3 else 0
        b = flat[0][x]
        c = flat[0][x - 3] if x >= 3 else 0
        p = a + b - c
        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
        enc1[x] = (r1[x] - pred) & 0xFF
    lines.append(bytes([4]) + bytes(enc1.astype(np.uint8)))

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(lines)))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), img)

    # grayscale (type 0) expands to 3 identical channels
    gray = np.arange(16, dtype=np.uint8).reshape(4, 4)
    raw = b"".join(bytes([0]) + gray[y].tobytes() for y in range(4))
    p0 = (b"\x89PNG\r\n\x1a\n"
          + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
          + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(p0)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[..., 0], gray) and np.array_equal(out[..., 2], gray)


def test_png_poison():
    for p in (b"", b"\x89PNG\r\n\x1a\n", b"\x89PNG\r\n\x1a\nXXXX",
              encode_png(_smooth(8, 8))[:30]):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_png(p)


def test_decode_image_dispatch():
    img = _smooth(16, 24, seed=2)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_png(img)), img)
    j = decode_image(encode_jpeg(img, quality=92))
    assert j.shape == img.shape
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03")


def test_media_decoder_actor_handles_jpeg_and_png(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedupe_examples_ray.ops.multimodal import decode_media

    img = _smooth(32, 32, seed=8)
    rows = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "kind": pa.array(["image"] * 4),
            "mime": pa.array(["image/jpeg", "image/png", "image/bmp", "image/jpeg"]),
            "payload": pa.array(
                [encode_jpeg(img), encode_png(img), encode_bmp(img), b"poison"],
                pa.binary(),
            ),
        }
    )
    out = decode_media(rd.from_arrow(rows)).to_pandas().sort_values("media_id")
    assert out["decoded_ok"].tolist() == [True, True, True, False]
    assert out["dec_width"].tolist()[:3] == [32, 32, 32]


def test_jpeg_fuzz_roundtrip_and_poison():
    """Randomized round-trip (structured images at several sizes/qualities
    stay within JPEG error bounds) and random-bytes poison (decoder raises,
    never hangs or returns garbage silently)."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        q = int(rng.integers(55, 96))
        base = rng.integers(0, 8, (3,)) * 30
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(
            base[None, None, :] + yy[..., None] * 2 + xx[..., None]
            + rng.normal(0, 3, (h, w, 3)),
            0, 255,
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        err = np.abs(out.astype(float) - img.astype(float)).mean()
        assert err < 12.0, (trial, h, w, q, err)
    for trial in range(8):
        n = int(rng.integers(4, 400))
        junk = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            decode_jpeg(b"\xff\xd8" + junk)
        except (ValueError, NotImplementedError):
            pass  # the guarded decoder normalizes every structural crash
