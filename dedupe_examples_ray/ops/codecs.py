"""Pure-stdlib/numpy media codecs — the REAL (non-stub) decode kernels for
the multimodal stages.

This container ships no PIL/libav, so the decodable surface is the set of
formats a struct parser + numpy can handle exactly:

- ``image/bmp``: 24-bit uncompressed BI_RGB Windows BMP (BITMAPINFOHEADER).
- ``audio/wav``: PCM 16-bit RIFF WAVE (any channel count; stdlib ``wave``).
- ``video/x-bmp-frames``: a documented toy container — concatenated BMP
  frames, each prefixed by a u32-LE byte length — so frame sampling is a
  *real* per-frame decode, not a fake.

Compressed formats (JPEG/PNG/MP3/MP4) still raise ``NotImplementedError``
with a pointer to where the library call plugs in; the schemas, batch sizing
and actor plumbing are identical either way.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ------------------------------------------------------------------ BMP image

_BMP_HEADER = struct.Struct("<2sIHHI")          # signature, file size, 2 reserved, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (rows bottom-up,
    4-byte padded, BGR order — the on-disk format)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = rgb.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = padded.tobytes()
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + len(data), 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB."""
    if len(payload) < _BMP_HEADER.size + _BMP_INFO.size or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodable without image libs (got bpp={bpp}, "
            f"compression={compression}); plug PIL here for the rest"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    end = offset + row_bytes * h
    if end > len(payload):
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rgb = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index math (no interpolation libs)."""
    h, w = rgb.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return rgb[ri][:, ci]


def image_features(rgb: np.ndarray, grid: int = 4) -> np.ndarray:
    """Real image descriptor: ``grid x grid`` mean-pooled grayscale thumbnail
    in [0, 1] (luma = ITU-R 601), length ``grid**2``."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ri = (np.arange(h) * grid // max(h, 1)).clip(0, grid - 1)
    ci = (np.arange(w) * grid // max(w, 1)).clip(0, grid - 1)
    out = np.zeros((grid, grid))
    cnt = np.zeros((grid, grid))
    np.add.at(out, (ri[:, None].repeat(w, 1), ci[None, :].repeat(h, 0)), gray)
    np.add.at(cnt, (ri[:, None].repeat(w, 1), ci[None, :].repeat(h, 0)), 1.0)
    return (out / np.maximum(cnt, 1.0)).ravel() / 255.0

# ------------------------------------------------------------------ WAV audio


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM16 RIFF WAVE bytes (stdlib ``wave``)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects 1-D int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAVE bytes -> (mono-mixed int16 samples, sample rate)."""
    try:
        f = wave.open(io.BytesIO(payload), "rb")
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a WAV payload: {e}") from e
    with f:
        if f.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 decodable without audio libs (width={f.getsampwidth()})"
            )
        nch, rate, n = f.getnchannels(), f.getframerate(), f.getnframes()
        raw = np.frombuffer(f.readframes(n), dtype=np.int16)
    if nch > 1:
        raw = raw.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return raw, rate


def audio_features(samples: np.ndarray, segments: int = 16) -> np.ndarray:
    """Real audio descriptor: per-segment RMS over ``segments`` equal time
    slices, normalized to [0, 1] of int16 full scale."""
    x = samples.astype(np.float64)
    if len(x) == 0:
        return np.zeros(segments)
    edges = np.linspace(0, len(x), segments + 1).astype(np.int64)
    out = np.empty(segments)
    for i in range(segments):
        seg = x[edges[i]: edges[i + 1]]
        out[i] = np.sqrt(np.mean(seg * seg)) if len(seg) else 0.0
    return out / 32768.0

# ------------------------------------------------- toy video (BMP frame reel)


def encode_video(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """List of (H, W, 3) uint8 frames -> ``video/x-bmp-frames`` reel:
    u32-LE fps, then per frame u32-LE length + BMP bytes."""
    parts = [struct.pack("<I", fps)]
    for fr in frames:
        b = encode_bmp(fr)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def iter_video_frames(payload: bytes):
    """Yield (frame_index, ts_ms, rgb_array) from a BMP-frame reel."""
    if len(payload) < 4:
        return
    (fps,) = struct.unpack_from("<I", payload, 0)
    fps = max(fps, 1)
    pos, idx = 4, 0
    while pos + 4 <= len(payload):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + ln > len(payload):
            raise ValueError("truncated video reel")
        yield idx, idx * 1000 // fps, decode_bmp(payload[pos: pos + ln])
        pos += ln
        idx += 1
