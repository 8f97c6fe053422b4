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

__all__ = ["fake_image_bytes", "fake_video_bytes", "fake_audio_bytes",
           "DecodeImage", "ExtractImageFeatures", "ResizeImage",
           "SampleVideoFrames", "DecodeAudio", "ExtractAudioFeatures",
           "ResampleAudio"]


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


def fake_video_bytes(seed: int, frames: int = 16, w: int = 8, h: int = 8) -> bytes:
    """Deterministic fake 'video': header + per-frame seeded payloads."""
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=frames * w * h, dtype=np.uint8).tobytes()
    return b"FAKEVID1" + bytes([frames, w, h]) + body


class ResizeImage:
    """Actor-pool stage: (key, image) -> (key, image) resized to
    ``(w, h)``.  Fake format: nearest-neighbor subsample, vectorized.
    Real formats need Pillow (import-gated; stub raises otherwise)."""

    def __init__(self, w: int = 16, h: int = 16):
        self.w, self.h = int(w), int(h)
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:
            self._pil = None

    def _resize(self, raw: bytes) -> bytes:
        if raw[:8] == b"FAKEIMG1":
            w0, h0 = raw[8], raw[9]
            px = np.frombuffer(raw[10:10 + w0 * h0], dtype=np.uint8).reshape(h0, w0)
            yi = (np.arange(self.h) * h0) // self.h
            xi = (np.arange(self.w) * w0) // self.w
            out = px[np.ix_(yi, xi)]
            return b"FAKEIMG1" + bytes([self.w, self.h]) + out.tobytes()
        if self._pil is not None:
            import io

            with self._pil.open(io.BytesIO(raw)) as im:
                buf = io.BytesIO()
                im.resize((self.w, self.h)).save(buf, format=im.format or "PNG")
                return buf.getvalue()
        raise NotImplementedError("real image resize requires Pillow (not in this container)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch.column("key"),
            "image": pa.array([self._resize(r) for r in batch.column("image").to_pylist()],
                              pa.binary()),
        })


class SampleVideoFrames:
    """Actor-pool stage: (key, video) -> one row per sampled frame
    (key, frame_idx, frame: binary) — evenly-spaced ``n`` frames, the
    flat-map expansion a frame-sampling pipeline needs.  Fake format
    decoded for real; real codecs would go behind an import-gated
    pyav/ffmpeg branch here."""

    def __init__(self, n: int = 4):
        self.n = int(n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys_out, idx_out, frames = [], [], []
        for key, raw in zip(batch.column("key").to_pylist(),
                            batch.column("video").to_pylist()):
            if raw[:8] != b"FAKEVID1":
                raise NotImplementedError(
                    "real video decode requires an ffmpeg binding (not in this container)")
            nf, w, h = raw[8], raw[9], raw[10]
            body = raw[11:]
            take = np.unique((np.arange(self.n) * nf) // self.n) if nf else []
            for fi in take:
                keys_out.append(key)
                idx_out.append(int(fi))
                frames.append(b"FAKEIMG1" + bytes([w, h])
                              + body[fi * w * h: (fi + 1) * w * h])
        return pa.table({
            "key": pa.array(keys_out),
            "frame_idx": pa.array(idx_out, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def fake_audio_bytes(seed: int, n_samples: int = 1600,
                     sample_rate: int = 16_000) -> bytes:
    """Deterministic fake 'audio': header + sample-rate + int16 PCM."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(2**14), 2**14, size=n_samples, dtype=np.int16)
    return (b"FAKEAUD1" + int(sample_rate).to_bytes(4, "little")
            + pcm.tobytes())


def _decode_audio(raw: bytes, sf_mod):
    """-> (pcm float64 in [-1,1], sample_rate).  Fake format decoded
    for real; real containers (wav/flac/ogg) go through soundfile when
    installed (import-gated — absent in this container)."""
    if raw[:8] == b"FAKEAUD1":
        sr = int.from_bytes(raw[8:12], "little")
        pcm = np.frombuffer(raw[12:], dtype=np.int16).astype(np.float64) / 2**15
        return pcm, sr
    if sf_mod is not None:
        import io

        pcm, sr = sf_mod.read(io.BytesIO(raw), dtype="float64")
        if pcm.ndim > 1:
            pcm = pcm.mean(axis=1)  # downmix to mono
        return pcm, int(sr)
    raise NotImplementedError(
        "real audio decode requires soundfile (not in this container)")


class DecodeAudio:
    """Actor-pool stage: (key, audio: binary) -> (key, sample_rate,
    duration_s, rms).  Same import-gate pattern as DecodeImage: the
    fake PCM format is decoded for real, real codecs need soundfile."""

    def __init__(self):
        try:
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        srs, durs, rms = [], [], []
        for raw in batch.column("audio").to_pylist():
            pcm, sr = _decode_audio(raw, self._sf)
            srs.append(sr)
            durs.append(len(pcm) / sr if sr else 0.0)
            rms.append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
        return pa.table({
            "key": pa.array(keys),
            "sample_rate": pa.array(srs, pa.int32()),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
        })


class ExtractAudioFeatures:
    """Actor-pool stage: (key, audio) -> (key, feature list<double>) —
    ``n_windows`` frames of [RMS energy, zero-crossing rate]: a real
    vectorized DSP kernel over the decoded PCM (the model-forward slot;
    a learned encoder would load in __init__, once per actor)."""

    def __init__(self, n_windows: int = 8):
        self.n = int(n_windows)
        try:
            import soundfile

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _features(self, pcm: np.ndarray) -> list:
        n = self.n
        if len(pcm) < n:
            pcm = np.pad(pcm, (0, n - len(pcm)))
        win = len(pcm) // n
        f = pcm[: win * n].reshape(n, win)
        energy = np.sqrt((f**2).mean(axis=1))
        zcr = (np.abs(np.diff(np.signbit(f), axis=1)).sum(axis=1)
               / max(win - 1, 1))
        return np.concatenate([energy, zcr]).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(_decode_audio(raw, self._sf)[0])
                 for raw in batch.column("audio").to_pylist()]
        return pa.table({
            "key": batch.column("key"),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


class ResampleAudio:
    """Actor-pool stage: (key, audio) -> (key, audio) at ``target_sr``
    via vectorized linear interpolation over the decoded PCM; output
    re-encoded in the fake PCM format (real encoders are soundfile's
    job when installed)."""

    def __init__(self, target_sr: int = 8_000):
        self.sr = int(target_sr)
        try:
            import soundfile

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _resample(self, raw: bytes) -> bytes:
        pcm, sr = _decode_audio(raw, self._sf)
        if sr != self.sr and len(pcm):
            n_out = max(1, int(round(len(pcm) * self.sr / sr)))
            x_out = np.linspace(0.0, len(pcm) - 1, n_out)
            pcm = np.interp(x_out, np.arange(len(pcm)), pcm)
        out = np.clip(pcm * 2**15, -(2**15), 2**15 - 1).astype(np.int16)
        return (b"FAKEAUD1" + self.sr.to_bytes(4, "little") + out.tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch.column("key"),
            "audio": pa.array([self._resample(r)
                               for r in batch.column("audio").to_pylist()],
                              pa.binary()),
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
