"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns
beside a metadata struct (mime, width/height or sample rate, ...).
The decode kernels themselves are STUBBED — the codec libraries are
not in this container — behind ``DecodeStub``: the Ray-side plumbing
(schema, actor-pool signature, small-batch sizing for wide rows,
output layout) is real and tested with a deterministic fake decoder.

At 100 TB these stages are exactly where ``batch_size`` must shrink
(large binary payloads: a batch × concurrency must fit the worker
heap) — callers should pass ``batch_size≈32-256`` and
``batch_format='pyarrow'`` (binary columns do not round-trip pandas).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("meta_json", pa.string()),
    ]
)


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    ``fake=True`` (default here) produces a deterministic feature
    vector from the payload bytes (blake2b-seeded), so tests exercise
    the full pipeline; ``fake=False`` raises NotImplementedError where
    a real codec (PIL / torchaudio / pyav) would be invoked.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = True,
                 payload_col: str = "payload"):
        self.feature_dim = feature_dim
        self.fake = fake
        self.payload_col = payload_col

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires codec libraries not present in "
                "this environment; run with fake=True for the plumbing path"
            )
        seed = int.from_bytes(
            hashlib.blake2b(payload or b"", digest_size=8).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch[self.payload_col].to_pylist()]
        m = np.stack(feats)
        return batch.drop_columns([self.payload_col]).append_column(
            "features", pa.array(list(m), pa.list_(pa.float32(), self.feature_dim))
        )


class FrameSampleStub:
    """Video frame-sampling stub: emits ``frames_per_clip`` byte slices
    per payload (deterministic offsets), flat_map-shaped (1 → N rows)."""

    def __init__(self, frames_per_clip: int = 4, payload_col: str = "payload"):
        self.n = frames_per_clip
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch[self.payload_col].to_pylist()):
            p = p or b""
            step = max(1, len(p) // self.n)
            for f in range(self.n):
                ids.append(mid)
                idxs.append(f)
                frames.append(p[f * step:(f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )
