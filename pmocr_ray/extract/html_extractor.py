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

    Stack-based with GLOBAL counters: words accumulate into one
    document-order list and each open element records only its start
    offsets (word index, chars, link chars) — a subtree's totals on
    close are the global counters minus the recorded starts, and its
    word list is one slice (taken only when it becomes the new best).
    The naive per-element formulation re-extends every word list into
    its parent at every close, O(depth × words) per document; this is
    O(words + elements) with identical outputs (same integer sums in
    the same order, so identical float scores; same slices, so
    identical word lists).  Misnested markup is tolerated by folding
    skipped nodes into their ancestors (same policy a lenient HTML
    parser applies)."""

    __slots__ = ("stack", "words", "chars", "link_chars",
                 "link_depth", "best", "_order")

    def __init__(self) -> None:
        # (tag, word start index, chars start, link-chars start)
        self.stack: list[tuple[str, int, int, int]] = [("#root", 0, 0, 0)]
        self.words: list[str] = []
        self.chars = 0
        self.link_chars = 0
        self.link_depth = 0
        # (score, order, words) of the best closed candidate container
        self.best: tuple[float, int, list[str]] | None = None
        self._order = 0

    def start(self, tag: str) -> None:
        if tag == "a":
            self.link_depth += 1
        self.stack.append((tag, len(self.words), self.chars,
                           self.link_chars))

    def end(self, tag: str) -> None:
        if tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        stack = self.stack
        if stack[-1][0] == tag:  # fast path: well-nested markup
            self._pop()
            return
        for i in range(len(stack) - 1, 0, -1):
            if stack[i][0] == tag:
                while len(stack) > i:
                    self._pop()
                return
        # no matching open tag: stray close, ignored

    def text(self, data: str) -> None:
        ws = data.split()
        if not ws:
            return
        self.words.extend(ws)
        n = sum(map(len, ws))
        self.chars += n
        if self.link_depth:
            self.link_chars += n

    def _pop(self) -> None:
        tag, w0, c0, l0 = self.stack.pop()
        if tag in _CANDIDATES:
            tl = self.chars - c0
            if tl > 0:
                ll = self.link_chars - l0
                density = 1.0 - ll / tl
                score = (tl - ll) * density
                self._order += 1
                # Strictly-greater wins; ties keep the earliest-closed
                # candidate (innermost / first in document order).
                if self.best is None or score > self.best[0]:
                    self.best = (score, self._order, self.words[w0:])

    def finish(self) -> None:
        while len(self.stack) > 1:
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
