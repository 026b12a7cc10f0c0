"""Deterministic synthetic ``pages`` / ``done_manifest`` fixture generator.

Mirrors the reference's 4-file conformance corpus
(/root/reference/dev/tests/run_tests.sh:31-34: ordinary convertible
documents, an image-only PDF, a searchable PDF exercising the skip
predicate) extended with failure and skew classes, at table scale.

Every page is a pure function of a ``documents`` row (doc_id, text,
lang) and a replication index ``rep`` — no wall clock, no RNG — so a
DuckDB SQL oracle can reconstruct the expected extraction output
arithmetically (see schema.py for the class rules).  The boilerplate
chrome in the HTML templates is link-dominated by construction, so the
density heuristics in the HTML extractor must recover *exactly* the
article text (= the document's ``text`` column): true golden spans,
not extractor echo.
"""

from __future__ import annotations

import html as _html
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from pmocr_ray import schema as S

FIXTURE_ROOT = "/tmp/pmocr_ray_fixtures"

# ------------------------------------------------------------------ HTML

_NAV_LINKS = (
    ("home", "home latest stories"),
    ("world", "world coverage desk"),
    ("politics", "politics and policy watch"),
    ("business", "business markets money"),
    ("tech", "technology science lab"),
    ("sport", "sport scores results"),
    ("culture", "culture books film music"),
    ("weather", "weather local forecast"),
)

_SIDEBAR_LINKS = (
    ("trending", "trending now top reads"),
    ("newsletter", "subscribe to the daily newsletter"),
    ("podcast", "listen to our podcast episodes"),
    ("archive", "browse the full archive"),
    ("jobs", "jobs and careers board"),
    ("deals", "best deals this week"),
)

_FOOTER_LINKS = (
    ("about", "about us"),
    ("contact", "contact the team"),
    ("terms", "terms of use"),
    ("privacy", "privacy policy"),
    ("cookies", "cookie settings"),
)


def _chunk(words: list[str], n: int) -> list[list[str]]:
    return [words[i : i + n] for i in range(0, len(words), n)]


def build_html_page(text: str, site: int, lang: str, variant: int, giant: bool) -> bytes:
    """Boilerplate chrome (link-dominated) wrapping the article text.

    The article's visible words are exactly ``text.split()`` (repeated
    ``GIANT_REPEAT`` times for the giant class), so main-content
    extraction must return ``text`` verbatim.
    """
    esc = _html.escape(text, quote=False)
    if giant:
        paras = [f"<p>{esc}</p>" for _ in range(S.GIANT_REPEAT)]
    else:
        paras = [f"<p>{_html.escape(' '.join(c), quote=False)}</p>"
                 for c in _chunk(text.split(), 12)]
    nav = "".join(
        f'<li><a href="/{slug}">{label}</a></li>' for slug, label in _NAV_LINKS
    )
    side = "".join(
        f'<li><a href="/{slug}">{label}</a></li>' for slug, label in _SIDEBAR_LINKS
    )
    foot = " ".join(
        f'<a href="/{slug}">{label}</a>' for slug, label in _FOOTER_LINKS
    )
    promo = (
        '<div class="promo"><a href="/offers">special subscriber offers '
        'save today</a> <a href="/app">download the mobile app now</a></div>'
        if variant == 2
        else ""
    )
    head_cls = ("masthead", "banner", "topbar")[variant]
    return (
        f'<!DOCTYPE html>\n<html lang="{lang}"><head><meta charset="utf-8">'
        f"<title>site {site}</title>"
        f"<style>body{{margin:0}}</style>"
        f'<script>var siteId={site};</script></head>\n'
        f'<body>\n<header class="{head_cls}">'
        f'<div class="logo"><a href="/">site {site} daily news</a></div>'
        f"<nav><ul>{nav}</ul></nav></header>\n"
        f'<div class="layout">\n<aside class="sidebar"><ul>{side}</ul>{promo}</aside>\n'
        f"<main><article>\n" + "\n".join(paras) + "\n</article></main>\n</div>\n"
        f'<footer><p class="links">{foot}</p>'
        f'<p class="fineprint">© 2024 site{site}</p></footer>\n'
        f"</body></html>\n"
    ).encode("utf-8")


# ------------------------------------------------------------------- PDF

_PDF_ESC = {"\\": "\\\\", "(": "\\(", ")": "\\)"}


def _pdf_escape(s: str) -> str:
    return "".join(_PDF_ESC.get(c, c) for c in s)


def build_pdf_page(text: str, searchable: bool) -> bytes:
    """Minimal synthetic PDF with the text in ``(...) Tj`` show operators.

    ``searchable=True`` adds an embedded-font object (``/FontFile``) —
    the marker :func:`pmocr_ray.extract.pdf_extractor.pdf_has_text_layer`
    keys on, playing the reference's pdffonts predicate
    (/root/reference/pmocr.sh:2162-2165).
    """
    lines = [
        f"BT /F1 12 Tf 72 {720 - 14 * i} Td ({_pdf_escape(' '.join(c))}) Tj ET"
        for i, c in enumerate(_chunk(text.split(), 10))
    ]
    stream = "\n".join(lines)
    font_obj = (
        "4 0 obj << /Type /FontDescriptor /FontName /Synthetic "
        "/FontFile 5 0 R >> endobj\n"
        if searchable
        else ""
    )
    body = (
        "%PDF-1.4\n%pmocr-ray synthetic layout\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        f"{font_obj}"
        f"3 0 obj << /Length {len(stream)} >> stream\n"
        f"{stream}\nendstream endobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return body.encode("utf-8")


POISON_PDF = b"%PDF-1.4\n%truncated corrupt payload\n<< /Type /Catalog\x00\x01"
POISON_HTML = b"<html><body><div>\xff\xfe\x00broken not utf8 \x80\x81</div>"


# ------------------------------------------------------------- row builder


def build_page_row(doc_id: int, rep: int, text: str, lang: str,
                   reps: int = S.REPS_DEFAULT) -> dict:
    """One fixture row — pure function of (doc_id, rep, text, lang)."""
    seq = S.seq_of(doc_id, rep, reps)
    cls = seq % S.N_CLASSES
    site = seq % S.URL_SITES
    variant = doc_id % 3
    pre_text = None
    if cls in S.CLS_HTML_PLAIN:
        payload = build_html_page(text, site, lang, variant, giant=False)
    elif cls in S.CLS_PDF_IMAGE:
        payload = build_pdf_page(text, searchable=False)
    elif cls in S.CLS_PDF_SEARCHABLE:
        payload = build_pdf_page(text, searchable=True)
        pre_text = text
    elif cls in S.CLS_ALREADY_DONE:
        payload = build_html_page(text, site, lang, variant, giant=False)
    elif cls in S.CLS_POISON:
        payload = POISON_PDF if S.poison_is_pdf(doc_id, rep) else POISON_HTML
    else:  # giant
        payload = build_html_page(text, site, lang, variant, giant=True)
    return {
        "url": S.url_of(doc_id, rep, reps),
        "warc_ts": S.warc_ts_of(doc_id, rep, reps),
        "html": payload,
        "text": pre_text,
        "lang": lang,
    }


def pages_table_from_documents(doc_batch: pa.Table, reps: int) -> pa.Table:
    """Expand a batch of ``documents`` rows into fixture pages (Arrow in/out)."""
    rows = {name: [] for name in ("url", "warc_ts", "html", "text", "lang")}
    doc_ids = doc_batch["doc_id"].to_pylist()
    texts = doc_batch["text"].to_pylist()
    langs = doc_batch["lang"].to_pylist()
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        for rep in range(reps):
            r = build_page_row(doc_id, rep, text, lang, reps)
            for k, v in r.items():
                rows[k].append(v)
    return pa.Table.from_pydict(rows, schema=S.PAGES_SCHEMA)


# -------------------------------------------------------------- generation


def fixture_dir(sf_dir: str, reps: int = S.REPS_DEFAULT) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(FIXTURE_ROOT, f"{tag}_r{reps}")


def ensure_pages_fixture(sf_dir: str, reps: int = S.REPS_DEFAULT,
                         num_blocks: int = 16) -> tuple[str, str]:
    """Generate (once, cached) the pages fixture + done manifest for an sf dir.

    Returns ``(pages_dir, done_manifest_path)``.  Generation runs as a
    Ray Data pipeline (read documents -> expand -> write parquet) so the
    bench-scale fixture is built in parallel; content is deterministic
    regardless of partitioning.  The cache commit is atomic (write to a
    temp dir, rename), the same protocol the lineage manifest uses.
    """
    root = fixture_dir(sf_dir, reps)
    pages_dir = os.path.join(root, "pages")
    manifest_path = os.path.join(root, "done_manifest.parquet")
    if os.path.exists(os.path.join(root, "_SUCCESS")):
        return pages_dir, manifest_path

    import ray.data as rd

    tmp_root = root + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)
    os.makedirs(os.path.join(tmp_root, "pages"), exist_ok=True)

    docs_path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(docs_path, columns=["doc_id", "text", "lang"],
                         override_num_blocks=num_blocks)
    ds = ds.map_batches(
        lambda b: pages_table_from_documents(b, reps),
        batch_format="pyarrow",
        batch_size=64,
    )
    ds.write_parquet(os.path.join(tmp_root, "pages"))

    # done_manifest: urls of the already_done classes (metadata-only scan).
    doc_ids = pq.read_table(docs_path, columns=["doc_id"])["doc_id"].to_pylist()
    done_urls = [
        S.url_of(d, rep, reps)
        for d in doc_ids
        for rep in range(reps)
        if S.cls_of(d, rep, reps) in S.CLS_ALREADY_DONE
    ]
    n = len(done_urls)
    manifest = pa.Table.from_pydict(
        {
            "url": done_urls,
            "status": [S.STATUS_DONE] * n,
            "attempts": [1] * n,
            "processed_at": [S.EPOCH] * n,
            "run_id": ["seed-run-0"] * n,
        },
        schema=S.DONE_MANIFEST_SCHEMA,
    )
    pq.write_table(manifest, os.path.join(tmp_root, "done_manifest.parquet"))

    with open(os.path.join(tmp_root, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    shutil.rmtree(root, ignore_errors=True)
    os.replace(tmp_root, root)
    return pages_dir, manifest_path
