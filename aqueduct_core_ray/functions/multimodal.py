"""Multimodal (opaque-binary) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract runs as an actor-pool ``map_batches`` stage (model loaded
once per actor in ``__init__``). The actual image/audio decode is STUBBED
(no codec libraries in this environment): ``decode_real`` raises
``NotImplementedError`` and the default path produces a deterministic fake
feature vector — the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested.

Here the ``documents.text`` utf-8 bytes stand in for the media payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

FEAT_DIM = 8


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload -> (n_bytes, payload_hash, feat).

    ``__init__`` = model load (once per actor): a deterministic random
    projection matrix seeded by ``model_seed``. ``__call__`` = per batch:
    vectorized byte-length + keyed hash; the "decoded pixel" stand-in is
    the payload hash expanded to FEAT_DIM floats through the projection.
    """

    def __init__(self, model_seed: int = 11, real_decode: bool = False):
        rng = np.random.default_rng(np.random.PCG64(model_seed))
        self.proj = rng.standard_normal((FEAT_DIM, FEAT_DIM))
        self.real_decode = real_decode

    @staticmethod
    def decode_real(payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; plug a real decoder here (PIL/av/soundfile)")

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t.column("payload")
        n_bytes = pc.binary_length(payload).cast(pa.int64())
        h = pd.util.hash_array(
            np.asarray(payload.to_numpy(zero_copy_only=False), dtype=object),
            categorize=False)
        if self.real_decode:           # pragma: no cover - stub gate
            self.decode_real(b"")
        # fake "embedding": 8 hash-derived lanes through the model matrix
        lanes = np.stack([(h >> np.uint64(8 * i)) & np.uint64(0xFF)
                          for i in range(FEAT_DIM)], axis=1).astype(np.float64)
        feat = (lanes / 255.0) @ self.proj.T
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bytes": n_bytes,
            "payload_hash": pa.array(h.view(np.int64)),
            "feat": pa.FixedSizeListArray.from_arrays(
                pa.array(feat.reshape(-1), pa.float32()), FEAT_DIM),
        })


class FrameSampler:
    """Actor-pool 1→N stage: opaque "video" payload -> ``n_frames``
    sampled frame records — the row-explosion plumbing (schema, output
    layout, batch sizing for the N× memory amplification) a real
    frame-sampling stage needs. The decode itself is STUBBED like
    MediaFeatureExtractor (no codec libs here): frames are deterministic
    keyed hashes of (payload, frame_idx), so identical payloads always
    produce identical frame sets."""

    def __init__(self, n_frames: int = 4, model_seed: int = 13):
        rng = np.random.default_rng(np.random.PCG64(model_seed))
        self.proj = rng.standard_normal((FEAT_DIM, FEAT_DIM))
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = self.n_frames
        h = pd.util.hash_array(
            np.asarray(t.column("payload").to_numpy(zero_copy_only=False),
                       dtype=object), categorize=False)
        fidx = np.tile(np.arange(k, dtype=np.int64), n)
        # per-frame hash: payload hash mixed with the frame index
        fh = (np.repeat(h, k) * np.uint64(0x9E3779B97F4A7C15)
              + fidx.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
        lanes = np.stack([(fh >> np.uint64(8 * i)) & np.uint64(0xFF)
                          for i in range(FEAT_DIM)], axis=1
                         ).astype(np.float64)
        feat = (lanes / 255.0) @ self.proj.T
        return pa.table({
            "doc_id": t.column("doc_id").take(
                pa.array(np.repeat(np.arange(n), k))),
            "frame_idx": pa.array(fidx),
            "frame_hash": pa.array(fh.view(np.int64)),
            "feat": pa.FixedSizeListArray.from_arrays(
                pa.array(feat.reshape(-1), pa.float32()), FEAT_DIM),
        })


def frame_sample(sf_dir: str, n_frames: int = 4,
                 concurrency: "int | tuple[int, int] | None" = None,
                 batch_size: int = 256) -> ray.data.Dataset:
    """documents.text bytes as the opaque video payload -> ``n_frames``
    frame records per doc. ``batch_size`` is sized for the N× output
    amplification: output bytes ≈ batch_size × n_frames × frame size
    must fit the actor heap (with real frames, far smaller batches)."""
    from .text import actor_pool_size

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": t.column("text").cast(pa.binary())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return (ds.map_batches(to_payload, batch_format="pyarrow")
            .map_batches(FrameSampler, batch_format="pyarrow",
                         batch_size=batch_size,
                         fn_constructor_kwargs={"n_frames": n_frames},
                         concurrency=concurrency or actor_pool_size()))


def media_features(sf_dir: str,
                   concurrency: "int | tuple[int, int] | None" = None,
                   batch_size: int = 1024) -> ray.data.Dataset:
    """documents.text bytes as the opaque payload -> feature extraction.
    Small ``batch_size`` on purpose: with real images, batch bytes =
    batch_size × payload size must fit the actor heap. Pool size scales
    with the cluster (see functions.text.actor_pool_size)."""
    from .text import actor_pool_size

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": t.column("text").cast(pa.binary())})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return (ds.map_batches(to_payload, batch_format="pyarrow")
            .map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                         batch_size=batch_size,
                         concurrency=concurrency or actor_pool_size()))
