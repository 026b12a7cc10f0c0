"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with small typed
metadata columns beside them — exactly how the extraction pipeline
treats ``html``.  The real decode libraries (PIL/ffmpeg) are not in
this container, so the codec is a deterministic synthetic format
(``FAKEIMG`` header + big-endian dims + payload); the Ray-side
machinery — schema, actor-pool decode stage, batch sizing for wide
binary rows, feature output layout — is real and tested.  A production
deployment registers a real decoder behind the same stage interface
(the pmOCR pluggable-engine pattern, /root/reference/default.conf:24-87).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MAGIC = b"FAKEIMG1"
_HEADER = struct.Struct(">8sIIH")  # magic, width, height, channels


def encode_fake_image(width: int, height: int, channels: int = 3,
                      seed: int = 0) -> bytes:
    """Deterministic synthetic image payload (seeded byte pattern)."""
    n = min(width * height * channels, 4096)  # cap payload; header is the contract
    body = bytes(((seed + i * 31) & 0xFF) for i in range(n))
    return _HEADER.pack(_MAGIC, width, height, channels) + body


def decode_header(payload: bytes) -> tuple[int, int, int]:
    """Parse (width, height, channels); raises ValueError on junk —
    routed to quarantine by callers, like every other data failure."""
    if len(payload) < _HEADER.size:
        raise ValueError("media: payload shorter than header")
    magic, w, h, c = _HEADER.unpack_from(payload)
    if magic != _MAGIC:
        raise ValueError("media: bad magic; real codecs are not available "
                         "in this environment (stub decoder)")
    return w, h, c


class MediaDecodeStage:
    """Actor-pool decode/feature stage over a binary media column.

    ``__init__`` is where a real deployment loads the codec/model once
    per actor.  Emits typed metadata (width/height/channels/bytes) and a
    small feature vector (byte histogram head) per row; decode errors
    become per-row nulls + an ``error`` column, never task failures.

    Batch-size note: wide binary rows ⇒ small ``batch_size`` so
    batch × concurrency stays within worker heap (SURVEY §4 memory
    budgeting).
    """

    def __init__(self, column: str = "media", feature_dims: int = 8) -> None:
        self.column = column
        self.feature_dims = feature_dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.column].to_pylist()
        widths, heights, channels, sizes, feats, errors = [], [], [], [], [], []
        for p in payloads:
            sizes.append(len(p) if p is not None else 0)
            try:
                w, h, c = decode_header(p or b"")
                widths.append(w); heights.append(h); channels.append(c)
                body = np.frombuffer((p or b"")[_HEADER.size:], dtype=np.uint8)
                hist = np.bincount(body % self.feature_dims,
                                   minlength=self.feature_dims).astype(np.float32)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
                errors.append(None)
            except ValueError as exc:
                widths.append(None); heights.append(None); channels.append(None)
                feats.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
        drop = batch.drop_columns([self.column])  # payload consumed, not carried
        return (
            drop.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("channels", pa.array(channels, pa.int32()))
            .append_column("media_bytes", pa.array(sizes, pa.int64()))
            .append_column("features", pa.array(feats, pa.list_(pa.float32())))
            .append_column("media_error", pa.array(errors, pa.string()))
        )
