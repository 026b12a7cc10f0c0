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

import numpy as np
import pyarrow as pa

from pmocr_ray.schema import CT_HTML, CT_PDF, CT_UNKNOWN

_WS = b" \t\r\n\f"
_PDF_MAGIC = b"%PDF-"


def sniff_content_type(payload: bytes) -> str:
    """Scalar sniff: pure function of the payload prefix."""
    if payload.startswith(_PDF_MAGIC):
        return CT_PDF
    head = payload[:256].lstrip(_WS)
    if head.startswith(b"<"):
        return CT_HTML
    return CT_UNKNOWN


def sniff_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized sniff over a binary column -> string array of content types.

    Only the first 256 bytes of each payload are touched (cheap check
    before the heavy stage, mirroring the reference hoisting the
    pdffonts check before dispatch, /root/reference/CHANGELOG.md:15).
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    # Slice prefixes inside Arrow (zero-copy of the tails: only the first
    # 256 bytes per row leave the buffer), then classify the small prefixes.
    try:
        import pyarrow.compute as pc

        prefixes = pc.binary_slice(html_col, 0, 256)
    except (AttributeError, pa.lib.ArrowNotImplementedError):  # pragma: no cover
        prefixes = html_col
    out = np.empty(len(prefixes), dtype=object)
    for i, v in enumerate(prefixes.to_pylist()):
        out[i] = sniff_content_type(v if v is not None else b"")
    return pa.array(out, type=pa.string())
