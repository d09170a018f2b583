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
    n = {"sf0.001": 128, "sf0.01": 512, "sf0.1": 2048}.get(tag, 128)
    paths = write_media_corpus(f"/tmp/kgray_media/{tag}-{n}", n)
    ds = rd.read_parquet(paths, columns=["media_id", "payload"])
    return ds.map_batches(
        MediaFeatureActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
