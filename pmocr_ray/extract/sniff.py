"""Content sniffing — the type router.

Reference: extension-regex router ``FILES_TO_PROCESS`` admitting
pdf/tif/png/... (/root/reference/default.conf:14, applied at
pmocr.sh:2183).  Parquet rows have no filenames, so the router becomes
a magic-byte sniff over the first bytes of the ``html`` binary column:

    %PDF-                       -> "pdf"
    '<' after ascii whitespace  -> "html"   (tag soup / doctype / <html>)
    PK\\x03\\x04 + "word/" part  -> "docx"  (OPC zip container)
    PK\\x03\\x04 + "xl/" part    -> "xlsx"
    anything else               -> "unknown"

Vectorized variant operates on a ``pyarrow`` binary array and is used
inside ``map_batches`` (zero-copy); the scalar variant is shared with
the single-process oracle so both agree byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa

from pmocr_ray.schema import CT_DOCX, CT_HTML, CT_PDF, CT_UNKNOWN, CT_XLSX

_WS = b" \t\r\n\f"
_PDF_MAGIC = b"%PDF-"
_ZIP_MAGIC = b"PK\x03\x04"
# OPC part-name prefixes appear uncompressed in local file headers (and
# the [Content_Types].xml overrides), so a bounded scan of the container
# head distinguishes WordprocessingML from SpreadsheetML without
# parsing the zip directory
_ZIP_SCAN = 4096


def sniff_content_type(payload) -> str:
    """Scalar sniff: pure function of the payload prefix.  Accepts any
    bytes-like view (bytes / memoryview) — only the first 256 bytes are
    ever materialized (4 KiB for OPC/zip containers)."""
    head = bytes(payload[:256])
    if head.startswith(_PDF_MAGIC):
        return CT_PDF
    if head.lstrip(_WS).startswith(b"<"):
        return CT_HTML
    if head.startswith(_ZIP_MAGIC):
        win = bytes(payload[:_ZIP_SCAN])
        if b"word/" in win:
            return CT_DOCX
        if b"xl/" in win:
            return CT_XLSX
    return CT_UNKNOWN


def sniff_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized sniff over a binary column -> string array of content types.

    Only the first 256 bytes of each payload are touched (cheap check
    before the heavy stage, mirroring the reference hoisting the
    pdffonts check before dispatch, /root/reference/CHANGELOG.md:15),
    and classification stays inside Arrow kernels end-to-end:
    ``binary_slice`` → ``starts_with`` / trimmed-``<`` check → two
    nested ``if_else``.  No per-row Python.
    """
    import pyarrow.compute as pc

    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    # Slice prefixes inside Arrow (zero-copy of the tails: only the first
    # 256 bytes per row leave the buffer), then classify the prefixes.
    prefixes = pc.binary_slice(html_col, 0, 256)
    is_pdf = pc.starts_with(prefixes, pattern="%PDF-")
    # RE2 over raw bytes: ascii-whitespace-trimmed '<' (same rule as the
    # scalar sniff; safe on non-UTF-8 binary payloads)
    is_html = pc.match_substring_regex(prefixes, r"^[ \t\r\n\f]*<")
    out = pc.if_else(
        is_pdf, CT_PDF,
        pc.if_else(pc.fill_null(is_html, False), CT_HTML, CT_UNKNOWN),
    )
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    # OPC/zip disambiguation only touches the (usually empty) zip rows:
    # the 4 KiB wide slice is computed per zip row, never per corpus row
    is_zip = pc.starts_with(prefixes, pattern="PK\x03\x04")
    if pc.any(pc.fill_null(is_zip, False)).as_py():
        import numpy as np

        mask = pc.fill_null(is_zip, False).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(mask)
        wide = pc.binary_slice(html_col.take(pa.array(idx)), 0, _ZIP_SCAN)
        sub = pc.if_else(
            pc.match_substring(wide, "word/"), CT_DOCX,
            pc.if_else(pc.match_substring(wide, "xl/"), CT_XLSX,
                       CT_UNKNOWN),
        )
        vals = out.to_numpy(zero_copy_only=False)
        vals[idx] = sub.to_numpy(zero_copy_only=False)
        out = pa.array(vals, pa.string())
    return out
