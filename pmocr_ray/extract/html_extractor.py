"""HTML main-content extractor — DOM boilerplate stripper.

Plays the role of the reference's OCR engine invocation for image/HTML
documents (/root/reference/pmocr.sh:1923-1963): payload bytes in,
extracted text out, raising on malformed input so the caller can apply
the retry-once-then-quarantine state machine (pmocr.sh:1981-2011).

Algorithm (classic text-density / link-density heuristics, cf.
Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010):

1. Parse the byte payload (strict UTF-8 — a decode failure is an
   engine failure, like a corrupt input file) into a lightweight
   element tree using the stdlib ``html.parser`` (lxml is not available
   in this environment; the interface is parser-agnostic).
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

from html.parser import HTMLParser

# Elements whose text is never content.
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


class _Node:
    __slots__ = ("tag", "words", "text_len", "link_len")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.words: list[str] = []
        self.text_len = 0
        self.link_len = 0


class _DensityParser(HTMLParser):
    """Single-pass parser accumulating per-subtree density statistics."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[_Node] = [_Node("#root")]
        self.skip_depth = 0      # inside script/style/...
        self.link_depth = 0      # inside <a>
        # (score, order, words) of closed candidate containers
        self.best: tuple[float, int, list[str]] | None = None
        self._order = 0

    # -- tag events --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID:
            return
        if tag in _SKIP_CONTENT:
            self.skip_depth += 1
            return
        if tag == "a":
            self.link_depth += 1
        self.stack.append(_Node(tag))

    def handle_startendtag(self, tag: str, attrs) -> None:
        pass  # self-closing: no content

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        if tag in _SKIP_CONTENT:
            if self.skip_depth > 0:
                self.skip_depth -= 1
            return
        if tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        # Pop up to (and including) the matching open tag; tolerate
        # misnested markup by folding skipped nodes into their parents.
        idx = None
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                idx = i
                break
        if idx is None:
            return
        while len(self.stack) > idx:
            node = self.stack.pop()
            self._consider(node)
            parent = self.stack[-1]
            parent.words.extend(node.words)
            parent.text_len += node.text_len
            parent.link_len += node.link_len

    def handle_data(self, data: str) -> None:
        if self.skip_depth:
            return
        words = data.split()
        if not words:
            return
        node = self.stack[-1]
        node.words.extend(words)
        n = sum(len(w) for w in words)
        node.text_len += n
        if self.link_depth:
            node.link_len += n

    # -- scoring -----------------------------------------------------
    def _consider(self, node: _Node) -> None:
        if node.tag not in _CANDIDATES or node.text_len == 0:
            return
        density = 1.0 - node.link_len / node.text_len
        score = (node.text_len - node.link_len) * density
        self._order += 1
        # Strictly-greater wins; ties keep the earliest-closed candidate
        # (innermost / first in document order) — deterministic.
        if self.best is None or score > self.best[0]:
            self.best = (score, self._order, list(node.words))

    def close(self) -> None:  # flush any unclosed elements
        super().close()
        while len(self.stack) > 1:
            node = self.stack.pop()
            self._consider(node)
            parent = self.stack[-1]
            parent.words.extend(node.words)
            parent.text_len += node.text_len
            parent.link_len += node.link_len


def extract_html(payload: bytes) -> str:
    """Extract main-content text from HTML bytes.

    Raises ``UnicodeDecodeError`` on non-UTF-8 payloads and
    ``ValueError`` when no visible text exists — both are *data*
    failures that the pipeline's state machine converts into a
    quarantined row (reference analogue: engine exit code != 0 ->
    ``_OCR_ERR`` rename, /root/reference/pmocr.sh:1981-2011).
    """
    text = payload.decode("utf-8", errors="strict")
    parser = _DensityParser()
    parser.feed(text)
    parser.close()
    if parser.best is None:
        raise ValueError("html extractor: no visible text content found")
    return " ".join(parser.best[2])
