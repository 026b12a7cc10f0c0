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

from pmocr_ray.extract.docx_extractor import extract_docx
from pmocr_ray.extract.xlsx_extractor import extract_xlsx
from pmocr_ray.extract.html_extractor import extract_html
from pmocr_ray.extract.pdf_extractor import extract_pdf
from pmocr_ray.schema import CT_HTML, CT_PDF

EXTRACTORS: dict[str, Callable[[bytes], str]] = {
    CT_HTML: extract_html,
    CT_PDF: extract_pdf,
    # structured-document route (the WORD-target inverse); the default
    # sniff never emits this type — route it via a registered sniff
    # extension or an explicit content_type column
    "docx": extract_docx,
    "xlsx": extract_xlsx,
}


def register_extractor(content_type: str, fn: Callable[[bytes], str]) -> None:
    EXTRACTORS[content_type] = fn


def get_extractor(content_type: str) -> Callable[[bytes], str]:
    """Raises ``KeyError`` for unroutable content types; the pipeline
    converts that into a quarantined row (unknown type = data failure)."""
    return EXTRACTORS[content_type]


# ----------------------------------------------------------- preprocessors
#
# The reference's optional payload preprocessor (OCR_PREPROCESSOR_EXEC /
# _ARGS, /root/reference/default.conf:92-99, applied per conversion at
# pmocr.sh:1906-1921) as a registry of named bytes-like -> bytes-like
# transforms.  Config selects them by name (``preprocessors=a,b``); the
# actor-pool stage resolves names once per actor in ``__init__``.


def strip_bom(payload):
    """Drop a UTF-8 byte-order mark so the strict decoder accepts the
    payload (the most common preprocessing need for crawled text)."""
    if bytes(payload[:3]) == b"\xef\xbb\xbf":
        return payload[3:]
    return payload


def normalize_crlf(payload):
    """CRLF/CR -> LF (affects extracted whitespace normalization only
    through tokenization, which already collapses runs)."""
    return bytes(payload).replace(b"\r\n", b"\n").replace(b"\r", b"\n")


PREPROCESSORS: dict[str, Callable] = {
    "strip_bom": strip_bom,
    "normalize_crlf": normalize_crlf,
}


def register_preprocessor(name: str, fn: Callable) -> None:
    PREPROCESSORS[name] = fn


def resolve_preprocessors(specs) -> list[Callable]:
    """Names (registry lookup) or callables -> ordered callable list.
    Raises ``KeyError`` for an unknown name (config error, fail fast —
    the reference refuses to start on a broken preprocessor the same
    way, pmocr.sh:1913-1921)."""
    out: list[Callable] = []
    for s in specs or []:
        out.append(PREPROCESSORS[s] if isinstance(s, str) else s)
    return out
