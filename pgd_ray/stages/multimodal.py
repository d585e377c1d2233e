"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool stages.

The decode codecs themselves are STUBBED in this environment (no
image/audio libraries in the container) behind ``DeterministicFake``
implementations — a seeded, content-derived fake that keeps the whole
Ray-side contract real and testable: schema, batch sizing for large
binary rows, actor signature (model/codec "loaded" once per actor in
``__init__``), and output layout.  Swapping in a real codec is a
one-class change (implement ``_decode_real`` and set
``use_real=True`` — today that raises NotImplementedError).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width,height,...} or {sr,channels,...}
    ]
)


def media_from_documents(docs: ray.data.Dataset, kind: str = "image") -> ray.data.Dataset:
    """Deterministic synthetic media table: each document's utf-8 bytes
    become an opaque payload (stand-in for real image/audio bytes)."""

    def fn(b: pa.Table) -> pa.Table:
        text = b["text"].to_pylist()
        payloads = [(t or "").encode() for t in text]
        return pa.table(
            {
                "media_id": b["doc_id"],
                "kind": pa.array([kind] * len(text), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(['{"codec":"fake"}'] * len(text), pa.string()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


class ImageDecodeFeatures:
    """Actor-pool stage: decode + feature-extract for image payloads.

    Real path: load the codec/model once per actor here.  Fake path
    (default in this container): a content-derived deterministic
    16-dim feature + fake (width, height).  Keep ``batch_size`` small
    for large binary rows (see module docstring).
    """

    FEAT_DIM = 16

    def __init__(self, use_real: bool = False):
        self.use_real = use_real
        if use_real:
            raise NotImplementedError(
                "no image codec in this environment; deterministic fake only"
            )

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.blake2b(payload or b"", digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        w, ht = int(rng.integers(16, 1024)), int(rng.integers(16, 1024))
        feat = rng.standard_normal(self.FEAT_DIM).astype(np.float32)
        return w, ht, feat

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b["payload"].to_pylist()
        ws, hs, feats = [], [], []
        for p in payloads:
            w, h, f = self._decode_fake(p)
            ws.append(w)
            hs.append(h)
            feats.append(f)
        return pa.table(
            {
                "media_id": b["media_id"],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), self.FEAT_DIM)
                ),
            }
        )


class AudioFrameSample:
    """Actor-pool stage: frame-sampling for audio/video payloads —
    emits ``n_frames`` evenly spaced 'frames' (byte slices) per row,
    one output row per frame (flat_map-shaped via map_batches)."""

    def __init__(self, n_frames: int = 4, use_real: bool = False):
        self.n_frames = n_frames
        if use_real:
            raise NotImplementedError(
                "no audio codec in this environment; deterministic fake only"
            )

    def __call__(self, b: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, payload in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            p = payload or b""
            step = max(1, len(p) // self.n_frames)
            for i in range(self.n_frames):
                mids.append(mid)
                fidx.append(i)
                frames.append(p[i * step : i * step + step])
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def decode_images(media: ray.data.Dataset, concurrency=(1, 8), batch_size: int = 256) -> ray.data.Dataset:
    """Small batches on purpose: batch_size × payload size × concurrency
    must fit the worker heap for real media."""
    return media.map_batches(
        ImageDecodeFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(media: ray.data.Dataset, n_frames: int = 4, concurrency=(1, 8)) -> ray.data.Dataset:
    return media.map_batches(
        AudioFrameSample,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )
