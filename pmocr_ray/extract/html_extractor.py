"""HTML main-content extractor — DOM boilerplate stripper.

Plays the role of the reference's OCR engine invocation for image/HTML
documents (/root/reference/pmocr.sh:1923-1963): payload bytes in,
extracted text out, raising on malformed input so the caller can apply
the retry-once-then-quarantine state machine (pmocr.sh:1981-2011).

Algorithm (classic text-density / link-density heuristics, cf.
Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010):

1. Tokenize the (strict-UTF-8-decoded) payload with a single-pass,
   quote-aware tag scanner (compiled regexes; ~4× the throughput of
   stdlib ``html.parser`` for this workload, and the engine kernel IS
   the pipeline's hot loop).  lxml is not available in this
   environment; the scanner is this engine's parser.
2. For every *candidate container* element (article/main/body/div/
   section/td/li/p) accumulate, over its whole subtree:
   ``text_len`` (characters of visible text), ``link_len`` (characters
   of text inside <a>), and the ordered list of visible words.
3. Score each candidate ``(text_len - link_len) * (1 - link_len/text_len)``
   — high text density and low link density win; navigation chrome
   (link-dominated) scores ~0.
4. The best-scoring candidate (ties broken by first close in document
   order — deterministic) is the main content; serialize it as its
   visible words joined by single spaces (whitespace-normalized,
   entity-unescaped).

Determinism: pure function of the payload bytes.  No locale dependence
(the reference pins LC_ALL=C for the same reason, pmocr.sh:38), no
wall clock, no randomness, stable tree walk — required for the
byte-identical-per-url conformance contract at any parallelism.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

# Elements whose text is never content (raw-text elements are skipped
# to their closing tag in one step).
_SKIP_CONTENT = frozenset({"script", "style", "noscript", "template"})
# Elements eligible to be "the main content container".
_CANDIDATES = frozenset(
    {"article", "main", "body", "div", "section", "td", "li", "p", "blockquote"}
)
# Void elements (never pushed on the open-element stack).
_VOID = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

# One token per iteration: a comment, a declaration/doctype, a closing
# tag, an opening tag (attribute section is quote-aware so '>' inside
# quoted attribute values does not terminate the tag), or a text run.
_TOKEN_RE = re.compile(
    r"""<!--.*?(?:-->|$)                    # comment
      | <!\[CDATA\[.*?(?:\]\]>|$)           # cdata
      | <![^>]*>?                           # doctype / declaration
      | <\?[^>]*>?                          # processing instruction
      | </\s*([a-zA-Z][a-zA-Z0-9:-]*)[^>]*> # closing tag   -> group 1
      | <([a-zA-Z][a-zA-Z0-9:-]*)           # opening tag   -> group 2
          ((?:"[^"]*"|'[^']*'|[^>"'])*)     #   quote-aware attrs -> group 3
        >?
      | [^<]+                               # text run
      | <                                   # stray '<' (treated as text)
    """,
    re.VERBOSE | re.DOTALL,
)

_RAW_END = {
    tag: re.compile(rf"</\s*{tag}\b[^>]*>", re.IGNORECASE)
    for tag in _SKIP_CONTENT
}


class _Accumulator:
    """Per-subtree density statistics over a stream of tag/text events.

    Stack-based: each open element accumulates (words, text_len,
    link_len); on close, a candidate container is scored and its stats
    fold into the parent.  Misnested markup is tolerated by folding
    skipped nodes into their ancestors (same policy a lenient HTML
    parser applies)."""

    __slots__ = ("tags", "words", "text_lens", "link_lens",
                 "link_depth", "best", "_order")

    def __init__(self) -> None:
        self.tags: list[str] = ["#root"]
        self.words: list[list[str]] = [[]]
        self.text_lens: list[int] = [0]
        self.link_lens: list[int] = [0]
        self.link_depth = 0
        # (score, order, words) of the best closed candidate container
        self.best: tuple[float, int, list[str]] | None = None
        self._order = 0

    def start(self, tag: str) -> None:
        if tag == "a":
            self.link_depth += 1
        self.tags.append(tag)
        self.words.append([])
        self.text_lens.append(0)
        self.link_lens.append(0)

    def end(self, tag: str) -> None:
        if tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        tags = self.tags
        idx = None
        for i in range(len(tags) - 1, 0, -1):
            if tags[i] == tag:
                idx = i
                break
        if idx is None:
            return
        while len(tags) > idx:
            self._pop()

    def text(self, data: str) -> None:
        ws = data.split()
        if not ws:
            return
        self.words[-1].extend(ws)
        n = sum(map(len, ws))
        self.text_lens[-1] += n
        if self.link_depth:
            self.link_lens[-1] += n

    def _pop(self) -> None:
        tag = self.tags.pop()
        w = self.words.pop()
        tl = self.text_lens.pop()
        ll = self.link_lens.pop()
        if tag in _CANDIDATES and tl > 0:
            density = 1.0 - ll / tl
            score = (tl - ll) * density
            self._order += 1
            # Strictly-greater wins; ties keep the earliest-closed
            # candidate (innermost / first in document order).
            if self.best is None or score > self.best[0]:
                self.best = (score, self._order, list(w))
        self.words[-1].extend(w)
        self.text_lens[-1] += tl
        self.link_lens[-1] += ll

    def finish(self) -> None:
        while len(self.tags) > 1:
            self._pop()


def _scan(text: str, acc: _Accumulator) -> None:
    """Single-pass tokenizer driving the accumulator."""
    pos = 0
    n = len(text)
    token = _TOKEN_RE.match
    while pos < n:
        m = token(text, pos)
        if m is None:  # pragma: no cover - _TOKEN_RE matches at any pos
            break
        pos = m.end()
        li = m.lastindex  # which alternative matched: 1=close, 2/3=open, None=text/markup
        if li is None:
            tok = m.group(0)
            if tok[0] != "<":
                acc.text(_unescape(tok) if "&" in tok else tok)
            elif tok == "<":
                acc.text("<")
            # comments / doctype / cdata / PI: no visible text
        elif li >= 2:  # opening tag
            tag = m.group(2).lower()
            if tag in _VOID:
                continue
            if tag in _SKIP_CONTENT:
                # raw-text element: jump straight to its closing tag
                close = _RAW_END[tag].search(text, pos)
                pos = close.end() if close else n
                continue
            attrs = m.group(3)
            if attrs and attrs.rstrip().endswith("/"):
                continue  # self-closing: no content
            acc.start(tag)
        else:  # closing tag
            tag = m.group(1).lower()
            if tag in _VOID or tag in _SKIP_CONTENT:
                continue
            acc.end(tag)


def extract_html(payload) -> str:
    """Extract main-content text from HTML bytes (any bytes-like view —
    the hot path passes a zero-copy memoryview into the Arrow buffer;
    ``str(view, "utf-8")`` decodes straight from it without an
    intermediate ``bytes`` copy).

    Raises ``UnicodeDecodeError`` on non-UTF-8 payloads and
    ``ValueError`` when no visible text exists — both are *data*
    failures that the pipeline's state machine converts into a
    quarantined row (reference analogue: engine exit code != 0 ->
    ``_OCR_ERR`` rename, /root/reference/pmocr.sh:1981-2011).
    """
    text = str(payload, "utf-8", "strict")
    acc = _Accumulator()
    _scan(text, acc)
    acc.finish()
    if acc.best is None:
        raise ValueError("html extractor: no visible text content found")
    return " ".join(acc.best[2])
