"""Fixed Arrow schemas and the deterministic row-class rules.

The input schema mirrors BASELINE.json's ``input_hint`` exactly; the
output schema reifies the reference's filename-suffix state machine
(done suffix ``_OCR`` /root/reference/pmocr.sh:2454-2456, quarantine
suffix ``_OCR_ERR`` pmocr.sh:2457-2459, pdffonts already-has-text skip
pmocr.sh:2162-2165) as per-row state columns.

Row-class rules
---------------
The synthetic ``pages`` fixture is a pure function of the driver's
``documents`` table (doc_id, text, lang) and a replication index
``rep`` in ``[0, REPS)``.  Everything — url, timestamp, payload class,
expected extraction result — is derived arithmetically from
``seq = doc_id * REPS + rep`` so that a DuckDB SQL oracle can
reconstruct the expected output *independently of the extractor*
(true golden spans, not extractor echo).

    cls = seq % 20
    0..10  html_plain       55%  boilerplate chrome + main article
    11..13 pdf_image        15%  synthetic PDF layout stream, no text layer
    14..15 pdf_searchable   10%  PDF with text layer; `text` column populated
    16..17 already_done     10%  url pre-seeded in the done manifest
    18     poison            5%  malformed payload (pdf if (doc_id+rep)%2==0 else html)
    19     giant             5%  html with main content repeated GIANT_REPEAT times

Statuses (reference parity):
    done                    converted this run            (output file written, pmocr.sh:2067-2096)
    skipped_existing_text   payload already has a text layer (pdffonts skip, pmocr.sh:2162-2165)
    skipped_suffix          already processed in a previous run (_OCR suffix skip, pmocr.sh:2126-2131)
    failed                  engine failed after retry     (_OCR_ERR quarantine, pmocr.sh:1999-2011)
"""

from __future__ import annotations

import datetime

import pyarrow as pa

# ---------------------------------------------------------------- constants

REPS_DEFAULT = 8          # pages per document row in the synthetic fixture
URL_SITES = 997           # url host bucket count (prime)
GIANT_REPEAT = 200        # main-content repetition factor for the giant class
ERROR_TRUNCATE_BYTES = 16384   # reference truncates engine error output to 16 KiB
                               # (head -c16384, /root/reference/pmocr.sh:1054,1983)
MAX_ATTEMPTS = 2          # retry-once-then-quarantine (reference: postpone retries
                          # pmocr.sh:814-818 + permanent _OCR_ERR quarantine)
MAX_TOTAL_ATTEMPTS = 3    # lifetime attempt budget across --retry-failed re-drives
                          # (reference: maxPostponeRetries=3, pmocr.sh:816-817)
EPOCH = datetime.datetime(2024, 1, 1)  # warc_ts base (naive UTC, like Arrow/DuckDB)

N_CLASSES = 20
CLS_HTML_PLAIN = tuple(range(0, 11))
CLS_PDF_IMAGE = (11, 12, 13)
CLS_PDF_SEARCHABLE = (14, 15)
CLS_ALREADY_DONE = (16, 17)
CLS_POISON = (18,)
CLS_GIANT = (19,)

STATUS_DONE = "done"
STATUS_SKIPPED_TEXT = "skipped_existing_text"
STATUS_SKIPPED_SUFFIX = "skipped_suffix"
STATUS_FAILED = "failed"

CT_HTML = "html"
CT_PDF = "pdf"
CT_DOCX = "docx"
CT_XLSX = "xlsx"
CT_UNKNOWN = "unknown"

# ---------------------------------------------------------------- schemas

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary(), nullable=False),
        pa.field("text", pa.string(), nullable=True),
        pa.field("lang", pa.string(), nullable=False),
    ]
)

DONE_MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("status", pa.string(), nullable=False),
        pa.field("attempts", pa.int32(), nullable=False),
        pa.field("processed_at", pa.timestamp("us"), nullable=False),
        pa.field("run_id", pa.string(), nullable=False),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("lang", pa.string(), nullable=False),
        pa.field("content_type", pa.string(), nullable=False),
        pa.field("status", pa.string(), nullable=False),
        pa.field("attempts", pa.int32(), nullable=False),
        pa.field("error", pa.string(), nullable=True),
        pa.field("extracted_text", pa.string(), nullable=True),
        pa.field("processed_at", pa.timestamp("us"), nullable=False),
    ]
)

# ------------------------------------------------------- row-class helpers


def seq_of(doc_id: int, rep: int, reps: int = REPS_DEFAULT) -> int:
    return doc_id * reps + rep


def cls_of(doc_id: int, rep: int, reps: int = REPS_DEFAULT) -> int:
    return seq_of(doc_id, rep, reps) % N_CLASSES


def url_of(doc_id: int, rep: int, reps: int = REPS_DEFAULT) -> str:
    """Deterministic record key (plays the reference's absolute-file-path role)."""
    return f"https://site{seq_of(doc_id, rep, reps) % URL_SITES}.example/page/{doc_id}-{rep}"


def warc_ts_of(doc_id: int, rep: int, reps: int = REPS_DEFAULT) -> datetime.datetime:
    """Deterministic crawl time (plays the reference's file-mtime role)."""
    return EPOCH + datetime.timedelta(seconds=seq_of(doc_id, rep, reps))


def poison_is_pdf(doc_id: int, rep: int) -> bool:
    return (doc_id + rep) % 2 == 0
