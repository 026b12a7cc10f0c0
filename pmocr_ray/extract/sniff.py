"""Content sniffing — the type router.

Reference: extension-regex router ``FILES_TO_PROCESS`` admitting
pdf/tif/png/... (/root/reference/default.conf:14, applied at
pmocr.sh:2183).  Parquet rows have no filenames, so the router becomes
a magic-byte sniff over the first bytes of the ``html`` binary column:

    %PDF-                       -> "pdf"
    '<' after ascii whitespace  -> "html"   (tag soup / doctype / <html>)
    anything else               -> "unknown"

Vectorized variant operates on a ``pyarrow`` binary array and is used
inside ``map_batches`` (zero-copy); the scalar variant is shared with
the single-process oracle so both agree byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa

from pmocr_ray.schema import CT_HTML, CT_PDF, CT_UNKNOWN

_WS = b" \t\r\n\f"
_PDF_MAGIC = b"%PDF-"


def sniff_content_type(payload) -> str:
    """Scalar sniff: pure function of the payload prefix.  Accepts any
    bytes-like view (bytes / memoryview) — only the first 256 bytes are
    ever materialized."""
    head = bytes(payload[:256])
    if head.startswith(_PDF_MAGIC):
        return CT_PDF
    if head.lstrip(_WS).startswith(b"<"):
        return CT_HTML
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
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
