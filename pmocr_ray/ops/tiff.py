"""Baseline TIFF codec — pure Python/numpy, no image libraries.

TIFF is the reference's FIRST-class input (pmOCR's own E2E corpus is
tif/png/pdf — /root/reference/dev/tests/run_tests.sh:31-34), so the
media stages decode it for real.  Scope (refusals are loud
``ValueError``s → per-row quarantine):

* decode: both byte orders (II/MM), first IFD, 8-bit samples, chunky
  planar config, strip layout, compressions **none (1)**, **LZW (5,
  MSB-first with EarlyChange, horizontal-predictor tag honored)** and
  **PackBits (32773)**; photometric 0 (white-is-zero, inverted), 1
  (gray) and 2 (RGB), 1/3/4 samples per pixel.  Tiles, 16-bit,
  palette TIFF and planar=2 raise loudly.
* encode: little-endian, single strip, uncompressed or PackBits —
  enough to exercise every decoder path plus a literal-code LZW
  writer for the LZW path's tests.

Lossless in every supported mode, so the ``media_tiff_real`` oracle
gates exact pixel sums over real TIFF bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from pmocr_ray.ops.media import quarantine_malformed

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


def _read_ifd(payload: bytes, e: str) -> dict[int, list[int]]:
    off, = struct.unpack_from(e + "I", payload, 4)
    if off + 2 > len(payload):
        raise ValueError("media: TIFF IFD offset out of range")
    n, = struct.unpack_from(e + "H", payload, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * count
        if total <= 4:
            data_off = base + 8
        else:
            data_off, = struct.unpack_from(e + "I", payload, base + 8)
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rationals etc. — not needed for the core tags
        tags[tag] = list(struct.unpack_from(e + fmt * count, payload,
                                            data_off))
    return tags


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:                      # literal run of n+1 bytes
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                    # repeat next byte 257-n times
            out += data[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("media: TIFF PackBits strip ended short")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Simple PackBits: runs of >=3 identical bytes as repeats, the
    rest as literal chunks (<=128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        start = i
        while (i < n and i - start < 128
               and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])):
            i += 1
        out += bytes([i - start - 1]) + data[start:i]
    return bytes(out)


class _MsbReader:
    """MSB-first bit reader (TIFF LZW packs opposite to GIF)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise ValueError("media: TIFF LZW data truncated")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: 8-bit symbols, clear=256, EOI=257, MSB-first,
    EarlyChange width bumps at table sizes 511/1023/2047."""
    r = _MsbReader(data)
    out = bytearray()

    def reset():
        return [bytes([i]) for i in range(256)] + [b"", b""], 9

    table, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = r.read(width)
        if code == 256:
            table, width = reset()
            prev = None
            continue
        if code == 257:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("media: TIFF LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1                   # EarlyChange
        prev = entry
    if len(out) < expected:
        raise ValueError("media: TIFF LZW strip ended short")
    return bytes(out[:expected])


class _MsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def emit(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.out)


def _tiff_lzw_encode_literal(data: bytes) -> bytes:
    """Literal-code TIFF LZW (CLEAR before any width bump — valid
    output any conforming reader accepts; exists for decoder tests)."""
    w = _MsbWriter()
    w.emit(256, 9)
    count = 0
    for b in data:
        # decoder table: 258 + count entries after `count` codes;
        # EarlyChange bumps at 511 — stay below it
        if count >= 252:
            w.emit(256, 9)
            count = 0
        w.emit(b, 9)
        count += 1
    w.emit(257, 9)
    return w.finish()


@quarantine_malformed
def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w, c) uint8 (c = 1, 3 or 4)."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("media: not a TIFF payload")
    tags = _read_ifd(payload, e)
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_LENGTH][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as exc:
        raise ValueError(f"media: TIFF missing required tag {exc}") from exc
    spp = tags.get(_TAG_SAMPLES, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photo = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    planar = tags.get(_TAG_PLANAR, [1])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"media: only 8-bit TIFF supported (bits {bits})")
    if planar != 1:
        raise ValueError("media: planar TIFF (PlanarConfig=2) unsupported")
    if spp not in (1, 3, 4):
        raise ValueError(f"media: TIFF samples-per-pixel {spp} unsupported")
    if photo not in (0, 1, 2):
        raise ValueError(
            f"media: TIFF photometric {photo} unsupported (palette?)")
    if predictor not in (1, 2):
        raise ValueError(f"media: TIFF predictor {predictor} unsupported")
    if len(offsets) != len(counts):
        raise ValueError("media: TIFF strip offset/count mismatch")

    stride = w * spp
    rows = []
    row_total = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if n_rows <= 0:
            break
        expected = n_rows * stride
        raw = payload[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("media: TIFF strip out of range")
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("media: TIFF strip shorter than expected")
            data = raw[:expected]
        elif comp == 5:
            data = _tiff_lzw_decode(raw, expected)
        elif comp == 32773:
            data = _packbits_decode(raw, expected)
        else:
            raise ValueError(f"media: TIFF compression {comp} unsupported")
        strip = np.frombuffer(data, np.uint8).reshape(n_rows, w, spp)
        if predictor == 2:
            strip = np.cumsum(strip.astype(np.uint16), axis=1) \
                .astype(np.uint8)
        rows.append(strip)
        row_total += n_rows
    if row_total < h:
        raise ValueError("media: TIFF strips cover fewer rows than height")
    out = np.concatenate(rows, axis=0)[:h]
    if photo == 0:                       # white-is-zero
        if spp != 1:
            raise ValueError("media: TIFF photometric 0 needs 1 sample")
        out = 255 - out
    return np.ascontiguousarray(out)


def encode_tiff(arr: np.ndarray, *, compression: str = "none",
                rows_per_strip: int | None = None) -> bytes:
    """(h, w) / (h, w, c∈{1,3,4}) uint8 -> little-endian TIFF.
    ``compression``: "none", "packbits" or "lzw" (literal-code)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3, 4):
        raise ValueError(f"media: TIFF encode needs 1/3/4 channels, got {c}")
    arr = np.ascontiguousarray(arr)
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        raw = arr[y0:y0 + rps].tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            strips.append(_packbits_encode(raw))
        elif compression == "lzw":
            strips.append(_tiff_lzw_encode_literal(raw))
        else:
            raise ValueError(f"media: unknown TIFF compression "
                             f"{compression!r}")
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    photo = 1 if c == 1 else 2

    entries = []  # (tag, type, count, value-or-values)

    def short(tag, v):
        entries.append((tag, 3, 1, [v]))

    def longs(tag, vs):
        entries.append((tag, 4, len(vs), list(vs)))

    short(_TAG_WIDTH, w)
    short(_TAG_LENGTH, h)
    entries.append((_TAG_BITS, 3, c, [8] * c))
    short(_TAG_COMPRESSION, comp_tag)
    short(_TAG_PHOTOMETRIC, photo)
    longs(_TAG_STRIP_OFFSETS, [0] * len(strips))   # patched below
    short(_TAG_SAMPLES, c)
    short(_TAG_ROWS_PER_STRIP, rps)
    longs(_TAG_STRIP_COUNTS, [len(s) for s in strips])
    short(_TAG_PLANAR, 1)
    entries.sort()

    header = b"II*\x00" + struct.pack("<I", 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    extra_off = 8 + ifd_size
    extra = bytearray()
    fields = bytearray()
    patches = {}                          # tag -> offset of value array
    for tag, typ, count, vals in entries:
        size = _TYPE_SIZES[typ] * count
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = struct.pack("<" + fmt * count, *vals)
            packed += b"\x00" * (4 - len(packed))
            fields += struct.pack("<HHI", tag, typ, count) + packed
        else:
            off = extra_off + len(extra)
            patches[tag] = off
            fields += struct.pack("<HHII", tag, typ, count, off)
            extra += struct.pack("<" + fmt * count, *vals)
    data_off = extra_off + len(extra)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    out = bytearray(header)
    out += struct.pack("<H", n) + fields + struct.pack("<I", 0) + extra
    # patch strip offsets (either inline — single strip — or in extra)
    if len(strips) == 1:
        # find the inline STRIP_OFFSETS field and rewrite its value
        for i, (tag, typ, count, vals) in enumerate(entries):
            if tag == _TAG_STRIP_OFFSETS:
                field_pos = 10 + 12 * i + 8
                struct.pack_into("<I", out, field_pos, offsets[0])
    else:
        struct.pack_into("<" + "I" * len(offsets), out,
                         patches[_TAG_STRIP_OFFSETS], *offsets)
    for s in strips:
        out += s
    return bytes(out)
