"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns plus typed metadata
columns (mime, width/height/duration, sample_rate...).  Decode / resize /
feature-extract / frame-sample run as actor-pool ``map_batches`` stages —
the decoder library loads once per actor (``__init__``), batches stay small
because rows are MBs.

This container ships no image/audio codecs, so the decode kernel is STUBBED:
``RealDecoder`` raises ``NotImplementedError`` where PIL/ffmpeg would be
called, and ``FakeDecoder`` produces a deterministic decode (byte-statistics
"thumbnail") so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end.

Scale notes: with ~MB binary rows, keep ``batch_size`` small (64-256), keep
``batch_format="pyarrow"`` (binary columns round-trip pandas badly), and
bound ``concurrency × batch_size × row_bytes`` by worker heap.  Writes go
to partitioned parquet; at 100 TB the media column dominates — prune it at
the read (``columns=[...]``) for any metadata-only pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: schema fragment for a media table
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 97, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (binary payloads) for tests/benches."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "mime": pa.array(["image/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
            "height": pa.array(rng.integers(64, 1024, n).astype(np.int32)),
        }
    )


class RealDecoder:
    """The production decode stage shape.  The codec import lives in
    ``__init__`` (once per actor); ``__call__`` decodes a batch.  STUB: this
    container has no PIL/ffmpeg, so construction fails loudly."""

    def __init__(self, thumbnail: int = 32):
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "use FakeDecoder for plumbing tests"
        )


class FakeDecoder:
    """Deterministic stand-in with the exact actor signature of RealDecoder:
    'decodes' a payload into an 8x8 byte-histogram 'thumbnail' (fixed-size
    list<float32>) + a content hash.  Pure function of the payload bytes."""

    THUMB = 64  # 8x8

    def __init__(self, thumbnail: int = 8):
        self.bins = thumbnail * thumbnail

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.bins), dtype=np.float32)
        hashes = []
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p or b"", dtype=np.uint8)
            if len(arr):
                hist, _ = np.histogram(arr, bins=self.bins, range=(0, 256))
                feats[i] = hist / len(arr)
            # md5 (not blake2b): DuckDB has md5(blob), so the decode stage's
            # payload round-trip is verifiable bit-exactly by a SQL oracle
            hashes.append(hashlib.md5(p or b"").hexdigest())
        out = batch.drop_columns(["payload"])  # decoded stages drop raw bytes
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.bins
            ),
        )
        return out.append_column("content_hash", pa.array(hashes, pa.string()))


class FrameSampler:
    """Video-style frame sampling plumbing: emits ``every_k``-th 'frame'
    (here: fixed-size byte windows of the payload) as one row per frame —
    a flat_map-shaped actor stage."""

    def __init__(self, frame_bytes: int = 256, every_k: int = 4):
        self.frame_bytes = frame_bytes
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_nos, frames = [], [], []
        for mid, p in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = p or b""
            n_frames = max(1, len(p) // self.frame_bytes)
            for f in range(0, n_frames, self.every_k):
                ids.append(mid)
                frame_nos.append(f)
                frames.append(p[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def decode_pipeline(ds, *, concurrency: int = 2, batch_size: int = 64):
    """documents-of-media → decoded features, as an actor-pool stage."""
    return ds.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
