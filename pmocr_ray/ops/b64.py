"""Vectorized base64 codec over Arrow arrays.

JSON has no bytes type, so the JSONL ingest/export path
(:mod:`pmocr_ray.sources`) carries binary ``html`` as base64.  The
stdlib codec is per-element; these kernels encode/decode the WHOLE
batch with numpy table lookups and build the output Arrow array
directly from (offsets, data) buffers — no per-row Python, no
intermediate ``to_pylist`` copies.  Round-trip equality with the
stdlib codec is property-tested (``tests/test_sources.py``).

Shapes: 3 input bytes -> 4 output chars (encode), standard alphabet,
``=``-padded; decode is the exact inverse and validates lengths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ALPHABET = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_ENC_LUT = np.frombuffer(_ALPHABET, dtype=np.uint8)
_DEC_LUT = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(_ALPHABET):
    _DEC_LUT[_c] = _i
_EQ = ord("=")


def _flatten(arr) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(rebased offsets int64, exact data bytes uint8, original array)
    for a binary/string (chunked) array; null slots read zero-length
    (the caller re-applies the null mask to the output)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        filler = b"" if (pa.types.is_binary(arr.type)
                         or pa.types.is_large_binary(arr.type)) else ""
        filled = pc.fill_null(arr, filler)
    else:
        filled = arr
    large = (pa.types.is_large_binary(filled.type)
             or pa.types.is_large_string(filled.type))
    off_dtype = np.int64 if large else np.int32
    buffers = filled.buffers()
    offsets = np.frombuffer(
        buffers[1], dtype=off_dtype, count=len(filled) + 1,
        offset=filled.offset * np.dtype(off_dtype).itemsize,
    ).astype(np.int64)
    data = (np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None else np.zeros(0, np.uint8))
    # rebase to the element window: sliced arrays start past 0 and the
    # values buffer may have slack past the last element
    data = data[offsets[0]:offsets[-1]]
    offsets = offsets - offsets[0]
    return offsets, data, arr


def _build(n: int, out_offsets: np.ndarray, out_bytes,
           orig: pa.Array, typ: pa.DataType) -> pa.Array:
    if len(out_offsets) and out_offsets[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"b64 codec: batch payload {int(out_offsets[-1])} bytes "
            "overflows 32-bit Arrow offsets — lower the batch size")
    # pa.py_buffer wraps the numpy/bytes memory zero-copy (it holds a
    # reference to the base object) — no tobytes round-trip
    out = pa.Array.from_buffers(
        typ, n,
        [None, pa.py_buffer(out_offsets.astype(np.int32)),
         pa.py_buffer(out_bytes)])
    if orig.null_count:
        out = pc.if_else(pc.is_valid(orig), out, pa.scalar(None, typ))
    return out


# mean element size above which one C-codec call per element (over a
# zero-copy memoryview slice) beats the numpy path: stdlib base64 is a
# single tight C pass, numpy pays ~4 temp-buffer passes; measured
# crossover on this host ~200-500 B (20 B elements: numpy 2.5x faster;
# 2 KB elements: C 3x faster)
_C_PATH_MEAN_BYTES = 256


def b64encode_array(arr) -> pa.Array:
    """binary -> base64 string column, whole-batch vectorized."""
    import base64

    offsets, data, orig = _flatten(arr)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if n and lens.sum() >= n * _C_PATH_MEAN_BYTES:
        # large elements: per-element C codec over zero-copy slices
        # (no to_pylist byte copies), output assembled in one join
        mv = memoryview(data)
        off = offsets.tolist()  # plain ints: np.int64 slicing is ~50% slower
        out = b"".join([base64.b64encode(mv[off[i]:off[i + 1]])
                        for i in range(n)])
        out_offsets = np.concatenate(
            [[0], np.cumsum(4 * ((lens + 2) // 3), dtype=np.int64)])
        return _build(n, out_offsets, out, orig, pa.string())
    pad_lens = 3 * ((lens + 2) // 3)          # zero-padded input lens
    out_lens = 4 * ((lens + 2) // 3)
    out_offsets = np.concatenate(
        [[0], np.cumsum(out_lens, dtype=np.int64)])

    # zero-pad each element to a multiple of 3 IN PLACE of the stream:
    # pads only ever sit at element tails, so one np.insert (single
    # output pass) replaces a full per-byte gather
    mod3 = lens % 3
    n_ins = (3 - mod3[mod3 != 0])            # 1 or 2 zeros per element
    if n_ins.sum():
        at = np.repeat(offsets[1:][mod3 != 0], n_ins)
        padded = np.insert(data, at, 0)
    else:
        padded = data

    t = padded.reshape(-1, 3).astype(np.uint32)
    word = (t[:, 0] << 16) | (t[:, 1] << 8) | t[:, 2]
    quad = np.empty((len(word), 4), dtype=np.uint8)
    quad[:, 0] = _ENC_LUT[(word >> 18) & 0x3F]
    quad[:, 1] = _ENC_LUT[(word >> 12) & 0x3F]
    quad[:, 2] = _ENC_LUT[(word >> 6) & 0x3F]
    quad[:, 3] = _ENC_LUT[word & 0x3F]
    out = quad.reshape(-1)

    # '=' padding: len%3==2 -> one '=', len%3==1 -> two '='
    mod = lens % 3
    ends = out_offsets[1:]
    some = np.flatnonzero(mod != 0)
    if len(some):
        out[ends[some] - 1] = _EQ
        out[ends[np.flatnonzero(mod == 1)] - 2] = _EQ
    return _build(n, out_offsets, out, orig, pa.string())


def b64decode_array(arr) -> pa.Array:
    """base64 string -> binary column, whole-batch vectorized."""
    offsets, data, orig = _flatten(arr)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if np.any(lens % 4 != 0):
        bad = int(np.flatnonzero(lens % 4 != 0)[0])
        raise ValueError(
            f"b64 codec: element {bad} has length {int(lens[bad])}, "
            "not a multiple of 4 — not valid padded base64")
    if n and lens.sum() >= n * _C_PATH_MEAN_BYTES:
        import base64

        mv = memoryview(data)
        off = offsets.tolist()
        parts = [base64.b64decode(mv[off[i]:off[i + 1]])
                 for i in range(n)]
        out_offsets = np.concatenate(
            [[0], np.cumsum([len(p) for p in parts], dtype=np.int64)])
        return _build(n, out_offsets, b"".join(parts), orig, pa.binary())
    # padding chars at the tail of each element (0, 1 or 2)
    ends = offsets[1:]
    npad = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    if nz.any():
        last_eq = data[ends[nz] - 1] == _EQ
        penult_eq = data[ends[nz] - 2] == _EQ
        npad[nz] = last_eq.astype(np.int64) + \
            (last_eq & penult_eq).astype(np.int64)
    out_lens = (lens // 4) * 3 - npad
    out_offsets = np.concatenate(
        [[0], np.cumsum(out_lens, dtype=np.int64)])

    vals = _DEC_LUT[data]
    q = vals.reshape(-1, 4).astype(np.uint32)
    word = (q[:, 0] << 18) | (q[:, 1] << 12) | (q[:, 2] << 6) | q[:, 3]
    tri = np.empty((len(word), 3), dtype=np.uint8)
    tri[:, 0] = (word >> 16) & 0xFF
    tri[:, 1] = (word >> 8) & 0xFF
    tri[:, 2] = word & 0xFF
    full = tri.reshape(-1)  # 3 bytes per quad, pad bytes included

    # drop the pad bytes sitting at element tails: one np.delete
    # (single output pass) instead of a per-byte gather
    total_pad = int(npad.sum())
    if total_pad:
        dec_ends = (ends // 4) * 3            # decoded tail per element
        has = np.flatnonzero(npad > 0)
        drop = np.concatenate([dec_ends[has] - 1,
                               dec_ends[has[npad[has] == 2]] - 2])
        out = np.delete(full, drop)
    else:
        out = full
    return _build(n, out_offsets, out, orig, pa.binary())
