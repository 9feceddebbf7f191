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

# ------------------------------------------------------------- baseline JPEG
#
# Pure numpy/stdlib baseline-sequential JPEG (ITU-T T.81): encoder emits
# JFIF / 4:4:4 / standard Annex-K quantization+Huffman tables; decoder
# handles baseline DCT frames with sampling factors up to 2x2 (covers
# 4:4:4, 4:2:2 and 4:2:0 — the dominant real-world layouts) and restart
# markers.  Progressive/arithmetic/12-bit frames raise NotImplementedError.
# Throughput note: Huffman entropy coding is inherently serial per scan —
# this kernel is the correctness baseline behind the actor-pool decode
# stages; swap in an optimized library via the same plug-in point when one
# is available.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    C[0, :] *= 1.0 / np.sqrt(2.0)
    return C


_DCT = _dct_matrix()


def _huff_encode_map(bits, values) -> dict:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    out = {}
    code = 0
    idx = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[idx]] = (code, ln)
            code += 1
            idx += 1
        code <<= 1
    return out


def _huff_decode_map(bits, values) -> dict:
    """(length, code) -> symbol."""
    out = {}
    code = 0
    idx = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value -> (category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = int(a).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.168736, -0.331264, 0.5],
                  [0.5, -0.418688, -0.081312]])
    ycc = rgb.astype(np.float64) @ m.T
    ycc[..., 1:] += 128.0
    return ycc


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * s + 50) / 100), 1, 255)


def encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, Annex-K tables)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (H, W, 3) uint8")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(rgb)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1 :, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    enc_dc = [_huff_encode_map(*_DC_LUMA), _huff_encode_map(*_DC_CHROMA)]
    enc_ac = [_huff_encode_map(*_AC_LUMA), _huff_encode_map(*_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    by, bx = ph // 8, pw // 8
    # all components' quantized zigzag coefficients, block-batched numpy
    comp_zz = []
    for ci in range(3):
        chan = padded[..., ci] - 128.0
        blocks = chan.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = np.round(coef / qts[0 if ci == 0 else 1]).astype(np.int64)
        comp_zz.append(q.reshape(-1, 64)[:, _ZIGZAG])
    for b in range(by * bx):  # interleaved 1x1 MCUs (4:4:4)
        for ci in range(3):
            tid = 0 if ci == 0 else 1
            zz = comp_zz[ci][b]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            cat, bits = _magnitude(diff)
            code, ln = enc_dc[tid][cat]
            bw.put(code, ln)
            if cat:
                bw.put(bits, cat)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[tid][0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                cat, bits = _magnitude(v)
                code, ln = enc_ac[tid][(run << 4) | cat]
                bw.put(code, ln)
                bw.put(bits, cat)
                run = 0
            if last < 63:
                code, ln = enc_ac[tid][0x00]  # EOB
                bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in enumerate(qts):
        zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([tid]) + zz)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (0, 1, _DC_CHROMA), (1, 0, _AC_LUMA), (1, 1, _AC_CHROMA)
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + b"".join(
        bytes([cid, (t << 4) | t]) for cid, t in ((1, 0), (2, 1), (3, 1))
    ) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs FF 00, STOPS at any other
    marker (reads then return zero bits), never buffers past the byte being
    consumed — so restart alignment is a plain byte-position operation."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def _next_byte(self) -> int | None:
        if self.pos >= len(self.data):
            return None
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt != 0x00:
                return None  # a real marker: do not consume
            self.pos += 2  # stuffed FF
            return 0xFF
        self.pos += 1
        return b

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.nbits == 0:
                b = self._next_byte()
                self.cur = 0 if b is None else b
                self.nbits = 8
            self.nbits -= 1
            v = (v << 1) | ((self.cur >> self.nbits) & 1)
        return v

    def align_restart(self):
        """Drop pad bits and consume one RSTn marker if present."""
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


def _huff_read(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.get(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> (H, W, 3) uint8 RGB (grayscale -> 3-chan).

    Supports baseline sequential DCT, 8-bit, 1 or 3 components, sampling
    factors up to 2, restart intervals.  Progressive (SOF2) and arithmetic
    frames raise NotImplementedError.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.float64)
                qt = np.empty(64)
                qt[_ZIGZAG] = zz
                qts[tq] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _huff_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG decodable here")
        elif marker == 0xDD:
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, dc_tabs.get(tt >> 4), ac_tabs.get(tt & 0xF)))
            hmax = max(c["h"] for c in frame["comps"])
            vmax = max(c["v"] for c in frame["comps"])
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors > 2")
            mcux = -(-frame["w"] // (8 * hmax))
            mcuy = -(-frame["h"] // (8 * vmax))
            planes = {}
            for c in frame["comps"]:
                planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
            br = _BitReader(payload[pos:])
            pred = {c["id"]: 0 for c in frame["comps"]}
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and n_mcu and n_mcu % restart == 0:
                        br.align_restart()
                        pred = {c["id"]: 0 for c in frame["comps"]}
                    n_mcu += 1
                    for comp, dct, act in scan:
                        if dct is None or act is None:
                            raise ValueError("missing Huffman table")
                        qt = qts.get(comp["tq"])
                        if qt is None:
                            raise ValueError("missing quant table")
                        for byi in range(comp["v"]):
                            for bxi in range(comp["h"]):
                                zz = np.zeros(64)
                                cat = _huff_read(br, dct)
                                diff = _extend(br.get(cat), cat)
                                pred[comp["id"]] += diff
                                zz[0] = pred[comp["id"]]
                                k = 1
                                while k < 64:
                                    rs = _huff_read(br, act)
                                    r, s = rs >> 4, rs & 0xF
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError("AC run overflow")
                                    zz[k] = _extend(br.get(s), s)
                                    k += 1
                                blk = np.empty(64)
                                blk[_ZIGZAG] = zz
                                coef = blk.reshape(8, 8) * qt
                                pix = _DCT.T @ coef @ _DCT + 128.0
                                py = (my * comp["v"] + byi) * 8
                                px = (mx * comp["h"] + bxi) * 8
                                planes[comp["id"]][py : py + 8, px : px + 8] = pix
            h, w = frame["h"], frame["w"]
            chans = []
            for c in frame["comps"]:
                pl = planes[c["id"]]
                ry, rx = vmax // c["v"], hmax // c["h"]
                if ry > 1 or rx > 1:
                    pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
                chans.append(pl[:h, :w])
            if len(chans) == 1:
                y = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
                return np.stack([y, y, y], axis=-1)
            return _ycbcr_to_rgb(np.stack(chans, axis=-1))
    raise ValueError("no scan data in JPEG payload")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Guarded baseline-JPEG decode: structural crashes on hostile payloads
    (truncated segments, bad Huffman specs, out-of-range indices) surface as
    ValueError so the actor stages' poison guard catches every failure
    mode."""
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"malformed JPEG payload: {e}") from e


# -------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes (color type 2, filter 0, zlib)."""
    import zlib

    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w = rgb.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), np.uint8)
    raw[:, 1:] = rgb.reshape(h, w * 3)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _decode_png_inner(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB.  Supports bit depth 8, color types
    0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA; alpha dropped over
    black -> composited as-is), all five scanline filters.  Interlaced
    (Adam7) and 16-bit images raise NotImplementedError."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG decodable here")
    if interlace:
        raise NotImplementedError("Adam7 interlace not supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"bad PNG color type {ctype}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    arr = np.frombuffer(raw, np.uint8, h * (stride + 1)).reshape(h, stride + 1)
    filters = arr[:, 0]
    out = np.zeros((h, stride), np.int64)
    for y in range(h):
        line = arr[y, 1:].astype(np.int64)
        f = filters[y]
        up = out[y - 1] if y else np.zeros(stride, np.int64)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + up) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = up[x]
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + (a + b) // 2
                else:
                    c = up[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter {f}")
    px = out.astype(np.uint8).reshape(h, w, nch)
    if ctype == 2:
        return px
    if ctype == 6:
        return px[..., :3]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    if plte is None:
        raise ValueError("palette PNG without PLTE")
    return plte[px[..., 0]]


def decode_png(payload: bytes) -> np.ndarray:
    """Guarded PNG decode (see decode_jpeg): every structural failure mode
    surfaces as ValueError."""
    try:
        return _decode_png_inner(payload)
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"malformed PNG payload: {e}") from e


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-sniffing image decode: BMP ('BM'), baseline JPEG (FF D8) or
    PNG -> (H, W, 3) uint8 RGB.  Other formats raise at this plug-in point."""
    if len(payload) >= 2 and payload[:2] == b"BM":
        return decode_bmp(payload)
    if len(payload) >= 2 and payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if len(payload) >= 8 and payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError("unknown image format")


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
