"""Baseline JPEG codec — pure numpy, no image libraries.

Sequential baseline DCT JPEG (SOF0) is fully decodable with nothing
but bit twiddling and an 8×8 DCT, so the LAST stand-in codec in the
media stages (the ``FAKEIMG`` stub) can go: the engine decodes and
encodes real JFIF bytes.  Scope (refusals are loud ``ValueError``s →
per-row quarantine, like every other codec in :mod:`.media`):

* decode: baseline sequential (SOF0), 8-bit, grayscale or YCbCr,
  1×1/2×1/1×2/2×2 sampling factors, restart markers, multiple
  DQT/DHT segments.  Progressive (SOF2), arithmetic coding,
  12-bit precision and CMYK are refused.
* encode: grayscale or RGB (4:4:4), Annex-K standard Huffman tables,
  quality-scaled standard quant tables (the libjpeg 50-point scale),
  plus ``quant_scale=0`` for ALL-ONES quant tables — with which
  tile-uniform images round-trip **bit-exactly** (a uniform 8×8 block
  is DC-only; with q=1 the DC is an integer multiple of 8 and the
  float IDCT of a DC-only block is exact), the property the
  ``media_jpeg_real`` SQL oracle gates on.

Like the reference's per-file OCR engines (pmocr.sh:1860-1960), the
entropy loop is per-payload work inside an actor/task stage — the
Ray-side contract (binary column in, typed columns out, errors →
quarantine) is identical to the PPM/BMP/PNG/WAV/Y4M codecs.
"""

from __future__ import annotations

import struct

import numpy as np

from pmocr_ray.ops.media import quarantine_malformed

# ---------------------------------------------------------------- DCT

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)
# orthonormal 8x8 DCT-II basis: forward X = C @ x @ C.T, inverse x = C.T @ X @ C

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K quant tables (luminance / chrominance), zigzag order
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K huffman specs: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits: list, values: list) -> dict:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list, values: list) -> dict:
    """Canonical Huffman: {symbol -> (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment.  The input
    bytes are already de-stuffed (FF00→FF) with restart markers
    stripped by the caller; ``align()`` is called at restart points."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0          # byte position
        self.bit = 0          # bit position within byte (0 = MSB)

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("media: JPEG entropy data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("media: invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG signed magnitude: received size-bit value -> coefficient."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


@quarantine_malformed
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, c) uint8 (c = 1 or 3, RGB)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("media: not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> decode table
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("media: JPEG marker sync lost")
        # B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — skip them so the byte after the LAST 0xFF is the
        # marker code, not misread as a segment with a length
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue             # standalone markers
        if pos + 2 > len(payload):
            raise ValueError("media: truncated JPEG segment")
        seg_len, = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2: pos + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("media: truncated JPEG segment body")
        pos += seg_len
        if marker == 0xDB:       # DQT
            bp = 0
            while bp < len(body):
                pq_, tq = body[bp] >> 4, body[bp] & 0xF
                bp += 1
                if pq_ != 0:
                    raise ValueError(
                        "media: 16-bit JPEG quant tables unsupported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, bp
                                       ).astype(np.int32)
                bp += 64
        elif marker == 0xC4:     # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1: bp + 17])
                n = sum(bits)
                values = list(body[bp + 17: bp + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, values)
                bp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 (baseline)
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), \
                body[5]
            if prec != 8:
                raise ValueError(f"media: {prec}-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "media: only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:     # DRI
            restart_interval, = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:     # SOS
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tables >> 4, tables & 0xF)   # (dc id, ac id)
            scan = {"sel": sel, "data_start": pos}
            break                # entropy-coded data follows
    if frame is None or scan is None:
        raise ValueError("media: JPEG missing SOF/SOS")

    # ---- de-stuff the entropy segment, note restart-marker cuts ----
    raw = payload[scan["data_start"]:]
    out_bytes = bytearray()
    cuts = []                     # de-stuffed offsets where RSTn occurred
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                out_bytes.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                cuts.append(len(out_bytes))
                i += 2
                continue
            break                 # EOI or next segment
        out_bytes.append(b)
        i += 1
    reader = _BitReader(bytes(out_bytes))
    cuts_iter = iter(cuts)
    next_cut = next(cuts_iter, None)

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), np.float64))
    pred = [0] * len(comps)

    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # byte-align and consume the recorded restart cut
                if reader.bit:
                    reader.bit = 0
                    reader.pos += 1
                if next_cut is not None and reader.pos == next_cut:
                    next_cut = next(cuts_iter, None)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff.get((0, scan["sel"][c["id"]][0]))
                ac_t = huff.get((1, scan["sel"][c["id"]][1]))
                q = qt.get(c["tq"])
                if dc_t is None or ac_t is None or q is None:
                    raise ValueError("media: JPEG missing table for scan")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        s = reader.decode_symbol(dc_t)
                        diff = _extend(reader.read_bits(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break          # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "media: JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = (zz * q)[_UNZIGZAG].reshape(8, 8)
                        pix = _C.T @ block.astype(np.float64) @ _C
                        py0 = (my * c["v"] + by) * 8
                        px0 = (mx * c["h"] + bx) * 8
                        planes[ci][py0:py0 + 8, px0:px0 + 8] = pix
            mcu_count += 1

    # level shift, upsample, color-convert, crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(comps) != 3:
        raise ValueError(
            f"media: {len(comps)}-component JPEG unsupported (CMYK?)")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-fill per spec

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (unstuffed — it IS a marker)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _quant_tables(quant_scale: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg 50-point quality scaling; ``quant_scale=0`` -> all-ones
    tables (the exact-round-trip mode for tile-uniform payloads)."""
    if quant_scale == 0:
        ones = np.ones(64, np.int32)
        return ones, ones
    q = quant_scale
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((_STD_LUMA_Q * scale + 50) // 100, 1, 255)
    chroma = np.clip((_STD_CHROMA_Q * scale + 50) // 100, 1, 255)
    return luma.astype(np.int32), chroma.astype(np.int32)


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int, dc_tab: dict, ac_tab: dict) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    zz = np.round(coef.reshape(-1)[_ZIGZAG] / q).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    s = _size_of(diff)
    code, length = dc_tab[s]
    w.write(code, length)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_tab[0x00]     # EOB
                w.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_tab[0xF0]     # ZRL
                w.write(code, length)
                run = 0
            continue
        s = _size_of(v)
        code, length = ac_tab[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def encode_jpeg(arr: np.ndarray, quant_scale: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> baseline
    JFIF bytes (Annex-K Huffman tables).  ``quant_scale`` is the
    libjpeg-style quality (1-100); ``0`` selects all-ones quant tables
    (see :func:`_quant_tables`).  ``subsample=True`` emits 4:2:0
    (2×2 luma sampling, box-filtered chroma — the dominant real-world
    JPEG shape); ``restart_interval`` emits DRI + RSTn markers every N
    MCUs (both exist mainly so the decoder's interleave/restart paths
    are testable without external sample files)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"media: JPEG encode needs 1 or 3 channels, got {c}")
    if subsample and c == 1:
        subsample = False          # grayscale has no chroma to subsample
    luma_q, chroma_q = _quant_tables(quant_scale)

    if c == 3:
        rgb = arr.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        qsel, tsel = [0, 1, 1], [0, 1, 1]
    else:
        planes = [arr[..., 0].astype(np.float64)]
        samp, qsel, tsel = [(1, 1)], [0], [0]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    def _pad(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        pp = np.empty((ph, pw), np.float64)
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[sh - 1: sh, :]
        pp[:, sw:] = pp[:, sw - 1: sw]
        return pp

    padded = []
    for ci, p in enumerate(planes):
        hi, vi = samp[ci]
        if (hi, vi) != (hmax, vmax):
            # box-filter downsample from the padded full-res plane
            fp = _pad(p, mcus_y * mcu_h, mcus_x * mcu_w)
            fy, fx = vmax // vi, hmax // hi
            p = fp.reshape(fp.shape[0] // fy, fy,
                           fp.shape[1] // fx, fx).mean(axis=(1, 3))
            p = np.round(p)
        padded.append(_pad(p, mcus_y * 8 * vi, mcus_x * 8 * hi))

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tab in ((0, luma_q), (1, chroma_q))[: 1 if c == 1 else 2]:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in tab)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xC0" + struct.pack(">H", 8 + 3 * c) + b"\x08" \
        + struct.pack(">HH", h, w) + bytes([c])
    for i in range(c):
        out += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    specs = ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA))
    if c == 3:
        specs += ((0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA))
    enc_tabs = {}
    for tc, th, (bits, values) in specs:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(values)) \
            + bytes([(tc << 4) | th]) + bytes(bits) \
            + bytes(values)
        enc_tabs[(tc, th)] = _build_encode_table(bits, values)
    out += b"\xFF\xDA" + struct.pack(">H", 6 + 2 * c) + bytes([c])
    for i in range(c):
        out += bytes([i + 1, (tsel[i] << 4) | tsel[i]])
    out += b"\x00\x3F\x00"

    bw = _BitWriter()
    pred = [0] * c
    qs = [luma_q] + [chroma_q] * (c - 1)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                pred = [0] * c
            for ci in range(c):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, block, qs[ci], pred[ci],
                            enc_tabs[(0, tsel[ci])],
                            enc_tabs[(1, tsel[ci])])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)
