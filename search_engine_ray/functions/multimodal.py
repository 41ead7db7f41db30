"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The image/audio codec libraries are not available in this container, so the
DECODE step is stubbed (deterministic fake decoder, or NotImplementedError
when strict=True) — but the Ray-side plumbing is real and tested: schemas,
actor signature (decode state in __init__), small batch sizes for large
binary payloads, and the output layout a downstream training pipeline
would consume.

Scale notes: binary payload rows are wide — these stages run with small
``batch_size`` so batch × concurrency fits worker heaps, and the object
store handles spill (ray_guide 'Memory-aware').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # images/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),    # audio
    ("duration_ms", pa.int32()),    # audio/video
])


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 5) * 128,
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(64 + (i % 8) * 32 if kind != "audio" else 0)
        rows["height"].append(48 + (i % 6) * 32 if kind != "audio" else 0)
        rows["sample_rate"].append(16000 if kind == "audio" else 0)
        rows["duration_ms"].append(1000 + i * 37 if kind != "image" else 0)
    return pa.table({f.name: pa.array(rows[f.name], f.type)
                     for f in MEDIA_SCHEMA})


class ImageDecodeResize:
    """Actor-pool stage: decode → resize → CHW float features.

    Real pipelines put PIL/turbojpeg in __init__; here the decoder is a
    deterministic fake (payload bytes → pseudo-pixels) unless strict=True,
    which raises NotImplementedError at the decode call site.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32,
                 strict: bool = False):
        self.out_w = out_w
        self.out_h = out_h
        self.strict = strict
        # real impl: self.decoder = PIL.Image / turbojpeg handle

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "image codecs unavailable in this container; "
                "install pillow/turbojpeg and decode here")
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = -(-(w * h * 3) // len(raw))
        return np.tile(raw, reps)[:w * h * 3].reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats = [], []
        for row in range(batch.num_rows):
            if batch.column("kind")[row].as_py() != "image":
                continue
            w = batch.column("width")[row].as_py()
            h = batch.column("height")[row].as_py()
            img = self._decode(batch.column("payload")[row].as_py(), w, h)
            # nearest-neighbor resize (deterministic)
            ys = (np.arange(self.out_h) * h // self.out_h)
            xs = (np.arange(self.out_w) * w // self.out_w)
            small = img[ys][:, xs].astype(np.float32) / 255.0
            ids.append(batch.column("media_id")[row].as_py())
            feats.append(small.transpose(2, 0, 1).ravel())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
            "feat_dim": pa.array([len(f) for f in feats], pa.int32()),
        })


class AudioFrameSample:
    """Actor-pool stage: frame-sample audio payloads into fixed windows
    with an energy feature per frame (fake decode, real plumbing)."""

    def __init__(self, frame_ms: int = 100, strict: bool = False):
        self.frame_ms = frame_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_frame, o_energy = [], [], []
        for row in range(batch.num_rows):
            if batch.column("kind")[row].as_py() != "audio":
                continue
            if self.strict:
                raise NotImplementedError("audio codecs unavailable")
            payload = np.frombuffer(
                batch.column("payload")[row].as_py(), dtype=np.uint8)
            dur = batch.column("duration_ms")[row].as_py()
            n_frames = max(1, dur // self.frame_ms)
            media_id = batch.column("media_id")[row].as_py()
            splits = np.array_split(payload.astype(np.int64), n_frames)
            for f_i, chunk in enumerate(splits):
                o_id.append(media_id)
                o_frame.append(f_i)
                o_energy.append(int((chunk ** 2).sum()))
        return pa.table({
            "media_id": pa.array(o_id, pa.int64()),
            "frame": pa.array(o_frame, pa.int32()),
            "energy": pa.array(o_energy, pa.int64()),
        })


def media_pipeline(n: int = 64):
    """Demo pipeline over the synthetic media table: decode+resize images
    (actor pool, small batches for wide binary rows) and frame-sample
    audio; returns (image_features, audio_frames) datasets."""
    import ray.data as rd

    media = rd.from_arrow(synth_media_table(n))
    images = media.map_batches(ImageDecodeResize, batch_format="pyarrow",
                               batch_size=8, concurrency=2)
    audio = media.map_batches(AudioFrameSample, batch_format="pyarrow",
                              batch_size=8, concurrency=2)
    return images, audio
