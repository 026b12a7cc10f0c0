"""Pluggable extractor registry — the user-extension surface.

Reference parity: pmOCR supports any OCR engine via configuration
(``OCR_ENGINE`` + per-engine exec/args bundles,
/root/reference/pmocr.sh:1825-1852, default.conf:24-87); the engine is
resolved once at startup (``SetOCREngineOptions``).  Here an extractor
is a pure function ``bytes -> str`` registered under a content type;
the actor-pool stage resolves the registry once per actor in
``__init__`` (amortized, mirroring the long-lived engine processes).
"""

from __future__ import annotations

from collections.abc import Callable

from pmocr_ray.extract.html_extractor import extract_html
from pmocr_ray.extract.pdf_extractor import extract_pdf
from pmocr_ray.schema import CT_HTML, CT_PDF

EXTRACTORS: dict[str, Callable[[bytes], str]] = {
    CT_HTML: extract_html,
    CT_PDF: extract_pdf,
}


def register_extractor(content_type: str, fn: Callable[[bytes], str]) -> None:
    EXTRACTORS[content_type] = fn


def get_extractor(content_type: str) -> Callable[[bytes], str]:
    """Raises ``KeyError`` for unroutable content types; the pipeline
    converts that into a quarantined row (unknown type = data failure)."""
    return EXTRACTORS[content_type]
