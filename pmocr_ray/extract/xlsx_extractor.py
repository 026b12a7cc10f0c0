"""Minimal xlsx (SpreadsheetML) writer + parser — exact inverses.

Closes the last cell of the reference's 5-target dispatch matrix:
pmOCR's EXCEL target emits a spreadsheet per document via ABBYY
(/root/reference/default.conf:56-57, per-target dispatch
pmocr.sh:2546-2593), and its CSV hack turns fixed-width OCR text into
``;``-delimited cells (pmocr.sh:2013-2043).  The analogue here is a
REAL minimal ``.xlsx`` — a ZIP container holding
``[Content_Types].xml``, ``_rels/.rels``, ``xl/workbook.xml``,
``xl/_rels/workbook.xml.rels`` and ``xl/worksheets/sheet1.xml`` —
one sheet row per text line, one inline-string cell per
``;``-separated field (the CSV-hack convention carried into the
spreadsheet shape), built entirely from the stdlib and deterministic
byte-for-byte (STORED entries, zeroed timestamps).

The parser is the writer's exact inverse for EVERY string:
cells rejoin with ``;`` and rows with ``\n``, and
``str.split``/``str.join`` are inverses, so
``extract_xlsx(build_xlsx(text)) == text`` byte-for-byte — proved by
the roundtrip pytest and the ``xlsx_target_roundtrip`` gate query
(same contract as the pdf and docx targets).
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

_S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R_NS = ("http://schemas.openxmlformats.org/officeDocument/2006/"
         "relationships")

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{_S_NS}" xmlns:r="{_R_NS}">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _escape(s: str) -> str:
    # shares the ECMA-376 _xHHHH_ convention (its home format is
    # precisely SpreadsheetML cell strings) — see docx_extractor
    from pmocr_ray.extract.docx_extractor import x_encode

    s = x_encode(s)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def build_xlsx(text: str) -> bytes:
    """Serialize extracted text as a minimal deterministic .xlsx.

    One ``<row>`` per ``\\n``-separated line; one inline-string cell
    per ``;``-separated field of the line (the reference's CSV-hack
    delimiter, pmocr.sh:2013-2043).  Cells carry
    ``xml:space="preserve"`` so spacing survives the XML layer; ZIP
    entries are STORED with zeroed timestamps, so identical text
    always yields identical bytes."""
    rows = []
    for line in text.split("\n"):
        cells = "".join(
            f'<c t="inlineStr"><is><t xml:space="preserve">{_escape(f)}'
            "</t></is></c>"
            for f in line.split(";"))
        rows.append(f"<row>{cells}</row>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_S_NS}"><sheetData>'
        + "".join(rows)
        + "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, data in (("[Content_Types].xml", _CONTENT_TYPES),
                           ("_rels/.rels", _RELS),
                           ("xl/workbook.xml", _WORKBOOK),
                           ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
                           ("xl/worksheets/sheet1.xml", sheet)):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(info, data)
    return buf.getvalue()


def extract_xlsx(payload) -> str:
    """Extract text from an xlsx payload: one line per sheet ``<row>``,
    inline-string cells joined with ``;`` in document order.  Exact
    inverse of :func:`build_xlsx`; also reads any standard inline-string
    worksheet produced elsewhere (shared-string tables are out of scope
    for this minimal engine and would surface as empty cells, loudly
    wrong rather than silently partial)."""
    with zipfile.ZipFile(io.BytesIO(bytes(payload))) as z:
        sheet = z.read("xl/worksheets/sheet1.xml")
    from pmocr_ray.extract.docx_extractor import x_decode

    root = ElementTree.fromstring(sheet)
    lines = []
    for row in root.iter(f"{{{_S_NS}}}row"):
        cells = []
        for c in row.iter(f"{{{_S_NS}}}c"):
            texts = [x_decode(t.text or "") for t in c.iter(f"{{{_S_NS}}}t")]
            cells.append("".join(texts))
        lines.append(";".join(cells))
    return "\n".join(lines)
