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
          ((?:"[^"]*"|'[^']*'|[^>"']+)*)    #   quote-aware attrs -> group 3
                                            #   (unquoted runs consumed +-greedily:
                                            #   first-char-disjoint alternatives, so
                                            #   identical matches, fewer engine steps)
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

# raw tag spelling → (lowered, kind) with kind 0=normal/candidate,
# 1=void, 2=raw-text skip.  Tag vocabularies are tiny and repeat
# constantly, so one dict hit replaces lower() + set probes in the
# hot loop; the cache is process-global and bounded below so hostile
# inputs (millions of distinct tag spellings) cannot grow it without
# limit.
_TAG_KIND: dict = {}
_TAG_KIND_CAP = 4096


def _tag_kind(raw: str) -> tuple:
    e = _TAG_KIND.get(raw)
    if e is None:
        low = raw.lower()
        e = (low, 1 if low in _VOID else (2 if low in _SKIP_CONTENT
                                          else 0))
        if len(_TAG_KIND) < _TAG_KIND_CAP:
            _TAG_KIND[raw] = e
    return e


def extract_html(payload) -> str:
    """Extract main-content text from HTML bytes (any bytes-like view —
    the hot path passes a zero-copy memoryview into the Arrow buffer;
    ``str(view, "utf-8")`` decodes straight from it without an
    intermediate ``bytes`` copy).

    Single fused scan: tokenizer, element stack and density scoring
    live in ONE function frame with local-variable state.  This is the
    pipeline's hottest loop, and in CPython the split
    tokenizer→accumulator formulation spent a third of its time on
    method calls and ``self`` attribute traffic; the fused loop is the
    same algorithm with the same evaluation order (integer sums happen
    identically, so scores, tie-breaks and output text are
    byte-identical — hash-verified against the split implementation
    over the full fixture).

    Stack discipline: each open element records (tag, word-list start
    index, chars start, link-chars start) against GLOBAL counters — a
    subtree's totals on close are two subtractions and its word list
    one slice, O(words + elements) per document.  Misnested markup
    folds skipped nodes into their ancestors; stray close tags are
    ignored (lenient-parser policy).

    Raises ``UnicodeDecodeError`` on non-UTF-8 payloads and
    ``ValueError`` when no visible text exists — both are *data*
    failures that the pipeline's state machine converts into a
    quarantined row (reference analogue: engine exit code != 0 ->
    ``_OCR_ERR`` rename, /root/reference/pmocr.sh:1981-2011).
    """
    text = str(payload, "utf-8", "strict")
    # local bindings: the loop below runs a few hundred times per
    # document and every global/attribute lookup in it is measurable
    finditer = _TOKEN_RE.finditer
    raw_end = _RAW_END
    candidates = _CANDIDATES
    unescape = _unescape
    tag_kind = _tag_kind
    # direct cache probe first: tag spellings repeat constantly, so the
    # common case is one dict hit with no Python call frame
    tag_kind_get = _TAG_KIND.get

    stack: list[tuple[str, int, int, int]] = [("#root", 0, 0, 0)]
    words: list[str] = []
    chars = 0
    link_chars = 0
    link_depth = 0
    best_score = 0.0
    # winner tracked as a (start, end) window into ``words`` — a new
    # best costs two int stores instead of copying the word slice
    # (nested candidates re-win constantly on real pages); the single
    # slice happens once, at return
    best_w0 = -1
    best_w1 = 0

    # ``finditer`` replaces per-token ``match(text, pos)`` stepping:
    # the token pattern matches at EVERY position (text runs, the
    # '<'-alternatives, and the stray-'<' catch-all tile the string),
    # so leftmost-match iteration yields the identical token stream
    # while the position bookkeeping runs in C (measured 1.2× kernel
    # throughput, byte-identical on the full fixture corpus including
    # exception parity).  Raw-text skips (<script>…) are the one
    # non-sequential jump: they break out and restart the iterator at
    # the closing tag, preserving the original jump semantics (a
    # comment opener inside script text must NOT swallow the close).
    pos = 0
    n = len(text)
    while pos < n:
        restart = False
        for m in finditer(text, pos):
            li = m.lastindex  # 1=close, 2/3=open, None=text/markup
            if li is None:
                tok = m.group(0)
                if tok[0] != "<" or tok == "<":
                    # text run (or stray '<' treated as text)
                    ws = (unescape(tok) if "&" in tok else tok).split()
                    if ws:
                        words.extend(ws)
                        cn = sum(map(len, ws))
                        chars += cn
                        if link_depth:
                            link_chars += cn
                # comments / doctype / cdata / PI: no visible text
            elif li >= 2:  # opening tag
                raw = m.group(2)
                e = tag_kind_get(raw)
                tag, kind = e if e is not None else tag_kind(raw)
                if kind == 1:  # void
                    continue
                if kind == 2:  # raw-text element: jump to its closing tag
                    close = raw_end[tag].search(text, m.end())
                    pos = close.end() if close else n
                    restart = True
                    break
                attrs = m.group(3)
                if attrs and attrs.rstrip().endswith("/"):
                    continue  # self-closing: no content
                if tag == "a":
                    link_depth += 1
                stack.append((tag, len(words), chars, link_chars))
            else:  # closing tag
                raw = m.group(1)
                e = tag_kind_get(raw)
                tag, kind = e if e is not None else tag_kind(raw)
                if kind:  # void or raw-text: no stack effect
                    continue
                if tag == "a" and link_depth > 0:
                    link_depth -= 1
                if stack[-1][0] == tag:  # fast path: well-nested markup
                    idx = len(stack) - 1
                else:
                    idx = 0
                    for i in range(len(stack) - 1, 0, -1):
                        if stack[i][0] == tag:
                            idx = i
                            break
                    if idx == 0:  # stray close tag: ignored
                        continue
                while len(stack) > idx:
                    ctag, w0, c0, l0 = stack.pop()
                    if ctag in candidates:
                        tl = chars - c0
                        if tl > 0:
                            ll = link_chars - l0
                            score = (tl - ll) * (1.0 - ll / tl)
                            # strictly-greater wins; ties keep the
                            # earliest-closed candidate (document order)
                            if best_w0 < 0 or score > best_score:
                                best_score = score
                                best_w0 = w0
                                best_w1 = len(words)
        if not restart:
            break

    while len(stack) > 1:  # close whatever the document left open
        ctag, w0, c0, l0 = stack.pop()
        if ctag in candidates:
            tl = chars - c0
            if tl > 0:
                ll = link_chars - l0
                score = (tl - ll) * (1.0 - ll / tl)
                if best_w0 < 0 or score > best_score:
                    best_score = score
                    best_w0 = w0
                    best_w1 = len(words)

    if best_w0 < 0:
        raise ValueError("html extractor: no visible text content found")
    return " ".join(words[best_w0:best_w1])
