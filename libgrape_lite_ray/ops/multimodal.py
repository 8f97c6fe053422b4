"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
resize / frame-sample are actor-pool `map_batches` stages.  The decode
kernels are STUBS in this container (no image/audio libraries are
installed): `DecodeImage` tries Pillow and otherwise uses a
deterministic fake decoder, so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested.

Scale notes: binary payloads dominate block size — run with small
``batch_size`` and rely on `target_max_block_size`; outputs drop the
binary column as early as possible (project-early rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["fake_image_bytes", "DecodeImage", "ExtractImageFeatures"]


def fake_image_bytes(seed: int, w: int = 32, h: int = 32) -> bytes:
    """Deterministic fake 'image': header + seeded byte payload."""
    rng = np.random.default_rng(seed)
    return b"FAKEIMG1" + bytes([w, h]) + rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()


class DecodeImage:
    """Actor-pool stage: (key, image: binary) -> (key, width, height,
    mean_pixel).  Real decode via Pillow when available; otherwise the
    deterministic fake format above.  Raises NotImplementedError for
    unknown real formats (clearly-marked stub, per the container's
    no-image-libs constraint)."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, raw: bytes):
        if raw[:8] == b"FAKEIMG1":
            w, h = raw[8], raw[9]
            px = np.frombuffer(raw[10:10 + w * h], dtype=np.uint8)
            return w, h, float(px.mean())
        if self._pil is not None:
            import io

            with self._pil.open(io.BytesIO(raw)) as im:
                a = np.asarray(im.convert("L"), dtype=np.float64)
                return im.width, im.height, float(a.mean())
        raise NotImplementedError("real image decode requires Pillow (not in this container)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        ws, hs, means = [], [], []
        for raw in batch.column("image").to_pylist():
            w, h, m = self._decode(raw)
            ws.append(w)
            hs.append(h)
            means.append(m)
        return pa.table({
            "key": pa.array(keys),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_pixel": pa.array(means, pa.float64()),
        })


class ExtractImageFeatures:
    """Actor-pool stage emitting a small deterministic feature vector
    (md5-derived — stands in for a model forward pass; the model load
    would live here in __init__, once per actor)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for raw in batch.column("image").to_pylist():
            d = hashlib.md5(raw).digest()
            v = np.frombuffer((d * ((self.dim * 8) // len(d) + 1))[: self.dim * 8], dtype=np.float64)
            feats.append(np.nan_to_num(v % 1.0, nan=0.0).tolist())
        return pa.table({
            "key": batch.column("key"),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })
