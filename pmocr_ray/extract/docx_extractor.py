"""Minimal docx (WordprocessingML) writer + parser — exact inverses.

Completes the reference's 5-target dispatch matrix: pmOCR's WORD/EXCEL
targets emit rich structured documents via ABBYY
(/root/reference/default.conf:53-57, per-target dispatch
pmocr.sh:2546-2593).  The analogue here is a REAL minimal ``.docx`` —
a ZIP container holding ``[Content_Types].xml``, ``_rels/.rels`` and
``word/document.xml`` with one ``<w:p>`` paragraph per text line —
built entirely from the stdlib (``zipfile`` + manual XML with entity
escaping), deterministic byte-for-byte (STORED entries, zeroed
timestamps).

The parser is the writer's exact inverse:
``extract_docx(build_docx(text)) == text`` for every extracted
document, proved by the roundtrip pytest and the
``docx_target_roundtrip`` gate query (same contract as the pdf
target, pmocr_ray/targets.pdf_transform).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_XML_NS = "http://www.w3.org/XML/1998/namespace"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)


# ECMA-376 _xHHHH_ escaping: XML 1.0 cannot represent control chars at
# all (not even as character references), and parsers normalize \r to
# \n — both break the writer/parser inverse for arbitrary extracted
# text.  OOXML's standard answer encodes each such char as _xHHHH_ and
# protects literal look-alikes by escaping their leading underscore as
# _x005F_.  Decode is one left-to-right non-overlapping substitution,
# so encode must guarantee that the decoder's FIRST match at any
# position is a generated sequence.  Two traps force the single-pass
# lookahead form below: (1) look-alikes can OVERLAP ("_x0041_x0042_"
# shares the middle underscore \u2014 a consuming match on the first hides
# the second), so the escape must not consume the trailing underscore;
# (2) a literal "_xHHHH" directly before a control char becomes a
# decodable unit once the control char is encoded (its replacement
# starts with "_"), so the lookahead's trailing position accepts a
# control char as a future underscore.
_X_CTRL = "\x00-\x08\x0a-\x1f\ufffe\uffff"
_X_RX = re.compile(r"_x([0-9A-Fa-f]{4})_")
_X_ENC_RX = re.compile(
    "_(?=x[0-9A-Fa-f]{4}[_" + _X_CTRL + "])|[" + _X_CTRL + "]")


def x_encode(s: str) -> str:
    return _X_ENC_RX.sub(
        lambda m: "_x005F_" if m.group(0) == "_"
        else "_x%04X_" % ord(m.group(0)), s)


def x_decode(s: str) -> str:
    return _X_RX.sub(lambda m: chr(int(m.group(1), 16)), s)


def _escape(s: str) -> str:
    s = x_encode(s)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def build_docx(text: str) -> bytes:
    """Serialize extracted text as a minimal deterministic .docx.

    One paragraph per ``\\n``-separated line; runs carry
    ``xml:space="preserve"`` so leading/trailing/duplicate spaces
    survive the XML layer.  ZIP entries are STORED with zeroed
    timestamps — identical text always yields identical bytes (the
    idempotent-output property the skip logic relies on)."""
    paragraphs = []
    for line in text.split("\n"):
        paragraphs.append(
            f'<w:p><w:r><w:t xml:space="preserve">{_escape(line)}'
            "</w:t></w:r></w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(paragraphs)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in (("[Content_Types].xml", _CONTENT_TYPES),
                           ("_rels/.rels", _RELS),
                           ("word/document.xml", document)):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(info, data)
    return buf.getvalue()


def extract_docx(payload) -> str:
    """Extract text from a docx payload: one line per ``<w:p>``
    paragraph, runs concatenated in document order.  Exact inverse of
    :func:`build_docx`; also handles any standard WordprocessingML
    body produced elsewhere (text outside ``<w:t>`` is ignored, as
    per the format)."""
    with zipfile.ZipFile(io.BytesIO(bytes(payload))) as z:
        doc = z.read("word/document.xml")
    root = ElementTree.fromstring(doc)
    lines = []
    for p in root.iter(f"{{{_W_NS}}}p"):
        runs = [x_decode(t.text or "") for t in p.iter(f"{{{_W_NS}}}t")]
        lines.append("".join(runs))
    return "\n".join(lines)
