"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with metadata columns
alongside; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages (decoder state built once per actor in ``__init__``).

Two decoder modes:

- ``decoder="real"`` (default): REAL pure-stdlib/numpy decode for the formats
  this container can handle exactly — 24-bit BMP images, PCM16 WAV audio, and
  the documented BMP-frame-reel video container (see ``ops/codecs.py``).
  Output features are genuine content descriptors (mean-pooled grayscale
  thumbnail / per-segment RMS), so near-identical media produce near-identical
  vectors and the embedding-dedup / ANN stages downstream compose with these.
  Compressed formats (JPEG/PNG/MP3/MP4) raise ``NotImplementedError`` at the
  kernel with the plug-in point noted — the Ray plumbing is format-agnostic.
- ``decoder="stub"``: hash-seeded deterministic fake, kept for plumbing tests
  on arbitrary bytes.

Scale notes baked into the defaults: binary payloads are large, so
``batch_size`` is small (256) and these stages run as actor pools; outputs
carry fixed-size ``list<float>`` features, never the raw payload, so
downstream shuffles stay narrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from . import codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _stub_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: hash-seeded uniform vector."""
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float64)


class MediaDecoder:
    """Actor stage: payload -> decoded metadata + feature vector.

    ``decoder="real"`` dispatches on ``kind``: BMP decode + 4x4 grayscale
    thumbnail (images), WAV decode + 16-segment RMS (audio), reel decode +
    first-frame thumbnail (video).  Undecodable payloads get
    ``decoded_ok=False`` and a zero vector (a 100-TB crawl always contains
    garbage; a poison payload must not kill the actor)."""

    def __init__(self, decoder: str = "real", feature_dim: int = 16):
        if decoder not in ("stub", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feature_dim = feature_dim
        self.grid = max(int(np.sqrt(feature_dim)), 1)

    def _decode_one(self, kind: str, payload: bytes) -> tuple[bool, np.ndarray, int, int]:
        """-> (ok, features, width, height); width/height are -1 for audio."""
        dim = self.feature_dim
        try:
            if kind == "image":
                rgb = codecs.decode_image(payload)  # BMP / baseline JPEG / PNG
                f = codecs.image_features(rgb, grid=self.grid)
                return True, _fit(f, dim), rgb.shape[1], rgb.shape[0]
            if kind == "audio":
                samples, _rate = codecs.decode_wav(payload)
                return True, _fit(codecs.audio_features(samples, segments=dim), dim), -1, -1
            if kind == "video":
                for _idx, _ts, rgb in codecs.iter_video_frames(payload):
                    f = codecs.image_features(rgb, grid=self.grid)
                    return True, _fit(f, dim), rgb.shape[1], rgb.shape[0]
            return False, np.zeros(dim), -1, -1
        except (ValueError, NotImplementedError, EOFError, OSError):
            return False, np.zeros(dim), -1, -1

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        if self.decoder == "stub":
            feats = [_stub_features(p, self.feature_dim) for p in payloads]
            ok = [p is not None and len(p) > 0 for p in payloads]
            widths = [-1] * len(payloads)
            heights = [-1] * len(payloads)
        else:
            ok, feats, widths, heights = [], [], [], []
            for k, p in zip(kinds, payloads):
                o, f, w, h = self._decode_one(k, p or b"")
                ok.append(o)
                feats.append(f)
                widths.append(w)
                heights.append(h)
        return (
            t.drop_columns(["payload"])  # payload never travels further
            .append_column("decoded_ok", pa.array(ok, pa.bool_()))
            .append_column("n_bytes", pa.array([len(p or b"") for p in payloads], pa.int64()))
            .append_column("dec_width", pa.array(widths, pa.int32()))
            .append_column("dec_height", pa.array(heights, pa.int32()))
            .append_column(
                "features", pa.array([np.asarray(f).tolist() for f in feats],
                                     pa.list_(pa.float64()))
            )
        )


def _fit(f: np.ndarray, dim: int) -> np.ndarray:
    out = np.zeros(dim)
    out[: min(len(f), dim)] = f[:dim]
    return out


def decode_media(ds, decoder: str = "real", feature_dim: int = 16, concurrency=(1, 4)):
    """Media Dataset -> metadata + features (payload dropped after decode)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(decoder=decoder, feature_dim=feature_dim),
        batch_format="pyarrow",
        batch_size=256,          # binary payloads: keep batches small
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor stage: BMP payload -> resized BMP payload (nearest-neighbor).

    The one multimodal stage whose OUTPUT is still a payload (a thumbnail
    pipeline writes media, not features) — so batches stay small and the
    output payload is bounded by ``out_h*out_w*3`` regardless of input size."""

    def __init__(self, out_h: int = 32, out_w: int = 32):
        self.out_h, self.out_w = int(out_h), int(out_w)

    def __call__(self, t: pa.Table) -> pa.Table:
        out, ok = [], []
        for p in t["payload"].to_pylist():
            try:
                rgb = codecs.resize_nearest(codecs.decode_image(p or b""),
                                            self.out_h, self.out_w)
                out.append(codecs.encode_bmp(rgb))
                ok.append(True)
            except (ValueError, NotImplementedError):
                out.append(b"")
                ok.append(False)
        return (
            t.drop_columns(["payload"])
            .append_column("decoded_ok", pa.array(ok, pa.bool_()))
            .append_column("payload", pa.array(out, pa.binary()))
        )


def resize_images(ds, out_h: int = 32, out_w: int = 32, concurrency=(1, 4)):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(out_h=out_h, out_w=out_w),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video reel -> per-frame rows. ``decoder="real"`` decodes each sampled
    frame (BMP reel) and emits its thumbnail features; ``"stub"`` emits
    hash-seeded rows per sampled timestamp."""

    def __init__(self, every_ms: int = 1000, decoder: str = "real"):
        if decoder not in ("stub", "real"):
            raise ValueError(decoder)
        self.every_ms = every_ms
        self.decoder = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_ts, out_feat = [], [], []
        for mid, dur, payload in zip(
            t["media_id"].to_pylist(), t["duration_ms"].to_pylist(), t["payload"].to_pylist()
        ):
            if self.decoder == "real":
                try:
                    next_ts = 0
                    for _idx, ts, rgb in codecs.iter_video_frames(payload or b""):
                        if ts >= next_ts:
                            out_id.append(mid)
                            out_ts.append(ts)
                            out_feat.append(
                                _fit(codecs.image_features(rgb, grid=2), 8).tolist()
                            )
                            next_ts += self.every_ms
                except ValueError:
                    continue
            else:
                for ts in range(0, max(int(dur or 0), 1), self.every_ms):
                    out_id.append(mid)
                    out_ts.append(ts)
                    out_feat.append(
                        _stub_features((payload or b"") + ts.to_bytes(4, "big"), 8).tolist()
                    )
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
                "features": pa.array(out_feat, pa.list_(pa.float64())),
            }
        )


def sample_frames(ds, every_ms: int = 1000, decoder: str = "real", concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(every_ms=every_ms, decoder=decoder),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 13, codec: str = "real") -> pa.Table:
    """Deterministic media corpus on MEDIA_SCHEMA.

    ``codec="real"``: genuinely decodable payloads — BMP gradient images,
    WAV sine tones, BMP-reel videos (what the real decoder consumes).
    ``codec="bytes"``: random bytes (plumbing / poison-payload tests).
    """
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, knd, payloads, mimes, ws, hs, durs = [], [], [], [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        ids.append(f"m{i}")
        knd.append(kind)
        if codec == "bytes":
            payloads.append(rng.bytes(int(rng.integers(100, 2000))))
            mimes.append("application/octet-stream")
            ws.append(int(rng.integers(100, 2000)))
            hs.append(int(rng.integers(100, 2000)))
            durs.append(int(rng.integers(1000, 10000)))
            continue
        if kind == "image":
            w, h = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            x = np.linspace(0, 255, w, dtype=np.uint8)
            rgb = np.stack(
                [np.tile(x, (h, 1)),
                 np.full((h, w), i % 256, np.uint8),
                 np.tile(np.linspace(0, 255, h, dtype=np.uint8)[:, None], (1, w))],
                axis=2,
            )
            payloads.append(codecs.encode_bmp(rgb))
            mimes.append("image/bmp")
            ws.append(w)
            hs.append(h)
            durs.append(0)
        elif kind == "audio":
            rate, secs = 8000, float(rng.uniform(0.05, 0.3))
            tt = np.arange(int(rate * secs)) / rate
            freq = 200 + (i % 20) * 50
            samples = (np.sin(2 * np.pi * freq * tt) * 12000).astype(np.int16)
            payloads.append(codecs.encode_wav(samples, rate))
            mimes.append("audio/wav")
            ws.append(-1)
            hs.append(-1)
            durs.append(int(secs * 1000))
        else:
            fps, nframes = 5, int(rng.integers(3, 9))
            frames = [
                np.full((6, 6, 3), (j * 40 + i) % 256, np.uint8) for j in range(nframes)
            ]
            payloads.append(codecs.encode_video(frames, fps=fps))
            mimes.append("video/x-bmp-frames")
            ws.append(6)
            hs.append(6)
            durs.append(nframes * 1000 // fps)
    return pa.table(
        {
            "media_id": ids,
            "kind": knd,
            "payload": payloads,
            "mime": mimes,
            "width": ws,
            "height": hs,
            "duration_ms": durs,
        },
        schema=MEDIA_SCHEMA,
    )
