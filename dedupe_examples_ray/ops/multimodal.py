"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with metadata columns
alongside; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The decode kernels themselves are STUBBED in this
container (no image/audio libs) behind ``decoder="stub"`` — a deterministic
fake that exercises the real Ray-side plumbing (schema, batch sizing, actor
signature, output layout).  ``decoder="real"`` raises ``NotImplementedError``
with the intended implementation notes.

Scale notes baked into the defaults: binary payloads are large, so
``batch_size`` is small (256) and these stages should run with
``num_cpus>=1`` actor pools; outputs carry fixed-size ``list<float>``
features, never the raw payload, so downstream shuffles stay narrow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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

    Real implementation would hold the decoder handle (PIL / libav model)
    built once per actor here in ``__init__``.
    """

    def __init__(self, decoder: str = "stub", feature_dim: int = 16):
        if decoder not in ("stub", "real"):
            raise ValueError(decoder)
        if decoder == "real":
            raise NotImplementedError(
                "real decode needs PIL/torchvision (images) or libav (audio/video); "
                "not available in this container — plug the library call into "
                "MediaDecoder.__call__ keeping the same output schema"
            )
        self.decoder = decoder
        self.feature_dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = [_stub_features(p, self.feature_dim) for p in payloads]
        ok = [p is not None and len(p) > 0 for p in payloads]
        return (
            t.drop_columns(["payload"])  # payload never travels further
            .append_column("decoded_ok", pa.array(ok, pa.bool_()))
            .append_column("n_bytes", pa.array([len(p or b"") for p in payloads], pa.int64()))
            .append_column(
                "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float64()))
            )
        )


def decode_media(ds, decoder: str = "stub", feature_dim: int = 16, concurrency=(1, 4)):
    """Media Dataset -> metadata + features (payload dropped after decode)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(decoder=decoder, feature_dim=feature_dim),
        batch_format="pyarrow",
        batch_size=256,          # binary payloads: keep batches small
        concurrency=concurrency,
    )


class FrameSampler:
    """Video payload -> per-frame rows (stub: one row per sampled timestamp)."""

    def __init__(self, every_ms: int = 1000, decoder: str = "stub"):
        if decoder == "real":
            raise NotImplementedError("real frame decode needs libav; see MediaDecoder")
        self.every_ms = every_ms

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_ts, out_feat = [], [], []
        for mid, dur, payload in zip(
            t["media_id"].to_pylist(), t["duration_ms"].to_pylist(), t["payload"].to_pylist()
        ):
            for ts in range(0, max(int(dur or 0), 1), self.every_ms):
                out_id.append(mid)
                out_ts.append(ts)
                out_feat.append(_stub_features((payload or b"") + ts.to_bytes(4, "big"), 8).tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
                "features": pa.array(out_feat, pa.list_(pa.float64())),
            }
        )


def sample_frames(ds, every_ms: int = 1000, concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(every_ms=every_ms),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 13) -> pa.Table:
    """Deterministic fake media corpus on MEDIA_SCHEMA (for tests/bench)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [f"m{i}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(int(rng.integers(100, 2000))) for _ in range(n)],
        "mime": ["application/octet-stream"] * n,
        "width": [int(rng.integers(100, 2000)) for _ in range(n)],
        "height": [int(rng.integers(100, 2000)) for _ in range(n)],
        "duration_ms": [int(rng.integers(1000, 10000)) for _ in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
