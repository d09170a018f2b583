"""Multimodal (binary-column) plumbing: opaque payloads + typed metadata.

Design per the engine contract: image/audio payloads are opaque ``binary``
columns with typed metadata columns beside them; decode / feature-extract
run as ACTOR-POOL ``map_batches`` stages (decoder state loaded once per
actor in ``__init__``), with SMALL batch sizes because payload bytes — not
row counts — dominate batch heap size.

The container has no image/audio codecs, so the real decode is STUBBED:
``decode_image`` raises ``NotImplementedError`` unless the payload is in the
engine's own deterministic synthetic format (magic ``KGIM``), which the
fixture generator emits.  The Ray-side plumbing — schema, broadcast of
actor config, batch sizing, actor signature, output layout — is real and
tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

MAGIC = b"KGIM"
HIST_BINS = 16

# synthetic media corpus sizes per testdata scale tag (image table and the
# smaller video/audio tables); shared with kgray.expected's oracle writers
MEDIA_N = {"sf0.001": 128, "sf0.01": 512, "sf0.1": 2048}
SMALL_MEDIA_N = {"sf0.001": 64, "sf0.01": 256, "sf0.1": 1024}

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # 'image' (audio/video follow the same shape)
        ("payload", pa.binary()),    # opaque bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("fmt", pa.string()),
    ]
)


def synth_payload(media_id: int, width: int, height: int) -> bytes:
    """Deterministic fake image: KGIM header + seeded byte plane."""
    rng = np.random.RandomState(media_id & 0x7FFFFFFF)
    plane = rng.randint(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<II", width, height) + plane


def write_media_corpus(out_dir: str, n: int, shard_rows: int = 256) -> list[str]:
    """Sharded deterministic media table (resume-skips finished shards)."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for start in range(0, n, shard_rows):
        path = os.path.join(out_dir, f"media-{start:08d}.parquet")
        if not os.path.exists(path):
            rows = []
            for i in range(start, min(start + shard_rows, n)):
                w, h = 16 + (i % 8) * 4, 16 + (i % 5) * 4
                rows.append(
                    dict(media_id=i, kind="image", payload=synth_payload(i, w, h),
                         width=w, height=h, fmt="kgim")
                )
            pq.write_table(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA), path)
        paths.append(path)
    return paths


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a payload to a (h, w) uint8 array.

    STUB: only the synthetic ``KGIM`` format decodes here.  A production
    deployment swaps this for PIL/libvips inside the same actor — the
    surrounding plumbing does not change.
    """
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "only the synthetic KGIM format is decodable"
        )
    w, h = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload[12:12 + w * h], dtype=np.uint8).reshape(h, w)


class MediaFeatureActor:
    """Actor-pool feature extractor: decode + histogram + checksum.

    ``__init__`` is where a real model/codec would load once per actor;
    here it just precomputes the histogram bin edges (the point is the
    lifecycle, not the math)."""

    def __init__(self, hist_bins: int = HIST_BINS):
        self.bins = np.linspace(0, 256, hist_bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out = {
            "media_id": ids,
            "byte_len": [len(p) for p in payloads],
            "sha1": [hashlib.sha1(p).hexdigest() for p in payloads],
            "mean_px": [],
            "hist": [],
        }
        for p in payloads:
            img = decode_image(p)
            out["mean_px"].append(round(float(img.mean()), 4))
            h, _ = np.histogram(img, bins=self.bins)
            out["hist"].append(h.astype(np.int64).tolist())
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "byte_len": pa.array(out["byte_len"], pa.int64()),
                "sha1": pa.array(out["sha1"], pa.string()),
                "mean_px": pa.array(out["mean_px"], pa.float64()),
                "hist": pa.array(out["hist"], pa.list_(pa.int64())),
            }
        )


def media_features(sf_dir: str, *, concurrency=(1, 4), batch_size: int = 64):
    """media table -> per-item features.  Small ``batch_size``: payload bytes
    dominate heap, so batch × concurrency stays bounded regardless of image
    size (the 100-TB sizing rule from SURVEY.md §4)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    n = MEDIA_N.get(tag, 128)
    paths = write_media_corpus(f"/tmp/kgray_media/{tag}-{n}", n)
    ds = rd.read_parquet(paths, columns=["media_id", "payload"])
    return ds.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# resize (image), frame sampling (video), audio features — the remaining
# modality stages from the engine contract, same actor-pool plumbing.
# Payload formats are the engine's own deterministic synthetic codecs
# (KGIM plane / KGVD frame stack / KGAU int16 waveform); a production
# deployment swaps the decode internals per actor, nothing else moves.
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"KGVD"
AUDIO_MAGIC = b"KGAU"


def synth_video(media_id: int, width: int, height: int, n_frames: int) -> bytes:
    rng = np.random.RandomState((media_id ^ 0x5EED) & 0x7FFFFFFF)
    frames = rng.randint(0, 256, size=n_frames * width * height, dtype=np.uint8)
    return VIDEO_MAGIC + struct.pack("<III", width, height, n_frames) + frames.tobytes()


def synth_audio(media_id: int, n_samples: int) -> bytes:
    rng = np.random.RandomState((media_id ^ 0xA0D10) & 0x7FFFFFFF)
    wave = (rng.randn(n_samples) * 8192).astype(np.int16)
    return AUDIO_MAGIC + struct.pack("<I", n_samples) + wave.tobytes()


class MediaResizeActor:
    """Actor-pool image resize: decode -> strided nearest-neighbor
    downsample -> re-encode.  Output stays an opaque payload column, so
    resize stages compose (resize -> features) without schema changes."""

    def __init__(self, target: int = 8):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        out_payload, out_w, out_h = [], [], []
        for p in batch["payload"].to_pylist():
            img = decode_image(p)
            sy = max(1, img.shape[0] // self.target)
            sx = max(1, img.shape[1] // self.target)
            small = np.ascontiguousarray(img[::sy, ::sx])
            h, w = small.shape
            out_payload.append(MAGIC + struct.pack("<II", w, h) + small.tobytes())
            out_w.append(w)
            out_h.append(h)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
            }
        )


class FrameSampleActor:
    """Video -> sampled frame rows (1 -> n_frames/stride fan-out), each
    frame re-encoded as a standalone KGIM payload so downstream image
    stages (resize/features) consume it unchanged."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, payloads = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            if p[:4] != VIDEO_MAGIC:
                raise NotImplementedError(
                    "real video codecs unavailable; only synthetic KGVD decodes")
            w, h, n = struct.unpack("<III", p[4:16])
            plane = np.frombuffer(p[16:16 + n * w * h], dtype=np.uint8)
            for f in range(0, n, self.stride):
                frame = plane[f * w * h:(f + 1) * w * h]
                ids.append(mid)
                frame_idx.append(f)
                payloads.append(MAGIC + struct.pack("<II", w, h) + frame.tobytes())
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


class AudioFeatureActor:
    """Audio -> (rms, zero-crossing count, n_samples); decode per actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zcr, ns = [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            if p[:4] != AUDIO_MAGIC:
                raise NotImplementedError(
                    "real audio codecs unavailable; only synthetic KGAU decodes")
            (n,) = struct.unpack("<I", p[4:8])
            wave = np.frombuffer(p[8:8 + 2 * n], dtype=np.int16).astype(np.float64)
            ids.append(mid)
            ns.append(n)
            rms.append(round(float(np.sqrt(np.mean(wave ** 2))), 4))
            zcr.append(int(np.count_nonzero(np.diff(np.signbit(wave)))))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossings": pa.array(zcr, pa.int64()),
            }
        )


def _media_ds(sf_dir: str, kind: str, synth, meta) -> "rd.Dataset":
    tag = os.path.basename(os.path.normpath(sf_dir))
    n = SMALL_MEDIA_N.get(tag, 64)
    out_dir = f"/tmp/kgray_media/{kind}-{tag}-{n}"
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part-00000000.parquet")
    if not os.path.exists(path):
        rows = [dict(media_id=i, payload=synth(i), **meta(i)) for i in range(n)]
        pq.write_table(pa.Table.from_pylist(rows), path + ".tmp")
        os.replace(path + ".tmp", path)
    return rd.read_parquet(path, columns=["media_id", "payload"])


def media_resize(sf_dir: str, *, concurrency=(1, 4), batch_size: int = 64):
    tag = os.path.basename(os.path.normpath(sf_dir))
    n = MEDIA_N.get(tag, 128)
    paths = write_media_corpus(f"/tmp/kgray_media/{tag}-{n}", n)
    ds = rd.read_parquet(paths, columns=["media_id", "payload"])
    return ds.map_batches(MediaResizeActor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def frame_sample(sf_dir: str, *, concurrency=(1, 4), batch_size: int = 16):
    """Small batches: a video row is ~n_frames x an image row."""
    ds = _media_ds(
        sf_dir, "video",
        lambda i: synth_video(i, 16 + (i % 4) * 4, 16, 8 + (i % 3) * 4),
        lambda i: dict(kind="video"),
    )
    return ds.map_batches(FrameSampleActor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


def audio_features(sf_dir: str, *, concurrency=(1, 4), batch_size: int = 64):
    ds = _media_ds(
        sf_dir, "audio",
        lambda i: synth_audio(i, 4000 + (i % 7) * 500),
        lambda i: dict(kind="audio"),
    )
    return ds.map_batches(AudioFeatureActor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)
