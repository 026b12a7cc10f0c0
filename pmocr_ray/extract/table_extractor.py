"""HTML table extraction: ``<table>`` markup → structured cell rows.

The reference engine converts documents 1:1 to flat text/CSV
(/root/reference/pmocr.sh:2546-2593 — its CSV target is a textual
hack); a data-engine counterpart needs the structured version: every
``<td>``/``<th>`` cell as a (table_idx, row_idx, col_idx, cell) row so
downstream pipelines can treat scraped tables as tables.

Original single-pass tokenizer in the style of
``extract/html_extractor.py`` (shared entity handling), not a DOM
library: scan for tr/td/th open-close, strip nested inline tags from
cell bodies, decode the standard entities.  Malformed markup degrades
gracefully — an unclosed cell flushes at the next boundary, tables
never nest (a nested ``<table>`` closes the outer cell's scan, by
design: row-major flattening is the documented contract).

Engine-invocation pattern: the per-row Python loop IS the parser
kernel (same exemption as ``ExtractStage``); everything around it is
columnar, and the explode emits one Arrow table per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa

_TAG_RE = re.compile(r"(?is)<(/?)(table|tr|td|th)\b[^>]*>")
_STRIP_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&nbsp;": " "}


def _clean_cell(raw: str) -> str:
    txt = _STRIP_RE.sub("", raw)
    for k, v in _ENTITIES.items():
        txt = txt.replace(k, v)
    return _WS_RE.sub(" ", txt).strip()


def extract_tables(html: str) -> list[tuple[int, int, int, str]]:
    """Parse one document's HTML into (table_idx, row_idx, col_idx,
    cell_text) tuples, row-major, 0-indexed per table."""
    out: list[tuple[int, int, int, str]] = []
    t_idx = -1
    row = col = 0
    in_table = in_row = False
    cell_start: int | None = None
    for m in _TAG_RE.finditer(html):
        closing, tag = bool(m.group(1)), m.group(2).lower()
        if cell_start is not None:
            # any table-structure tag ends the open cell
            out.append((t_idx, row, col, _clean_cell(html[cell_start:m.start()])))
            col += 1
            cell_start = None
        if tag == "table":
            if not closing:
                t_idx += 1
                in_table, in_row = True, False
                row = col = 0
            else:
                in_table = in_row = False
        elif tag == "tr" and in_table:
            if not closing:
                if in_row:      # implicit close of the previous row
                    row += 1
                in_row, col = True, 0
            else:
                in_row = False
                row += 1
        elif tag in ("td", "th") and in_table:
            if not closing:
                if not in_row:  # cell outside tr: implicit row
                    in_row, col = True, 0
                cell_start = m.end()
    return out


def table_cells(batch: pa.Table, *, key: str = "doc_id",
                column: str = "html") -> pa.Table:
    """Explode a batch of HTML documents into cell rows (variable
    fan-out flat-map; the shuffle-free structured-extraction stage)."""
    keys, t_i, r_i, c_i, cells = [], [], [], [], []
    key_vals = batch[key].to_pylist()
    for k, html in zip(key_vals, batch[column].to_pylist()):
        if not html:
            continue
        for t, r, c, txt in extract_tables(html):
            keys.append(k)
            t_i.append(t)
            r_i.append(r)
            c_i.append(c)
            cells.append(txt)
    return pa.table({
        key: pa.array(keys, batch[key].type),
        "table_idx": pa.array(t_i, pa.int64()),
        "row_idx": pa.array(r_i, pa.int64()),
        "col_idx": pa.array(c_i, pa.int64()),
        "cell": pa.array(cells, pa.string()),
    })
