"""Differential oracle for the fused HTML kernel.

The production extractor (`pmocr_ray.extract.html_extractor.extract_html`)
is a single fused loop whose element accounting runs on GLOBAL counters
and a stack of (start-index) snapshots — the part that every round's
kernel optimization touches.  This module re-implements the SAME
semantics with the opposite state discipline: every open element owns
its OWN word/link lists (O(depth x words), obviously correct, no index
arithmetic), and the two implementations are asserted byte-identical —
on corpus-shaped pages from the fixture generator AND on
hypothesis-generated adversarial markup (misnesting, stray closes,
entities, raw-text islands, self-closing candidates, comments/PI/CDATA,
stray '<').

The tokenizer regex is shared by design (its behaviors are pinned by
the case tests in test_extractors.py); what this differential protects
is the accounting: subtree word spans, link-depth bookkeeping,
misnesting folds, tie-breaks, and the end-of-document drain.

Reference parity: the reference proves its engine wrapper against known
documents (/root/reference/dev/tests/run_tests.sh:165-314); this is the
same idea with a generative corpus and an independent model.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pmocr_ray.extract.html_extractor import (
    _CANDIDATES,
    _RAW_END,
    _SKIP_CONTENT,
    _TOKEN_RE,
    _VOID,
    extract_html,
)
from pmocr_ray.fixtures import build_html_page


def extract_html_model(payload) -> str:
    """Tree-discipline re-implementation of the extractor's semantics."""
    from html import unescape

    text = str(payload, "utf-8", "strict")

    class Node:
        __slots__ = ("tag", "words", "link_words")

        def __init__(self, tag: str) -> None:
            self.tag = tag
            self.words: list[str] = []
            self.link_words: list[str] = []

    stack = [Node("#root")]
    link_depth = 0
    best_score = None
    best_words: list[str] | None = None

    def close_node(node: Node) -> None:
        nonlocal best_score, best_words
        if node.tag in _CANDIDATES:
            tl = sum(len(w) for w in node.words)
            if tl > 0:
                ll = sum(len(w) for w in node.link_words)
                score = (tl - ll) * (1.0 - ll / tl)
                if best_score is None or score > best_score:
                    best_score = score
                    best_words = list(node.words)

    pos = 0
    n = len(text)
    while pos < n:
        restart = False
        for m in _TOKEN_RE.finditer(text, pos):
            li = m.lastindex
            if li is None:
                tok = m.group(0)
                if tok[0] != "<" or tok == "<":
                    ws = (unescape(tok) if "&" in tok else tok).split()
                    if ws:
                        for node in stack:  # every open element owns them
                            node.words.extend(ws)
                            if link_depth:
                                node.link_words.extend(ws)
            elif li >= 2:  # opening tag
                tag = m.group(2).lower()
                if tag in _VOID:
                    continue
                if tag in _SKIP_CONTENT:
                    close = _RAW_END[tag].search(text, m.end())
                    pos = close.end() if close else n
                    restart = True
                    break
                attrs = m.group(3)
                if attrs and attrs.rstrip().endswith("/"):
                    continue
                if tag == "a":
                    link_depth += 1
                stack.append(Node(tag))
            else:  # closing tag
                tag = m.group(1).lower()
                if tag in _VOID or tag in _SKIP_CONTENT:
                    continue
                if tag == "a" and link_depth > 0:
                    link_depth -= 1
                idx = 0
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == tag:
                        idx = i
                        break
                if idx == 0:  # stray close: ignored
                    continue
                while len(stack) > idx:
                    close_node(stack.pop())
        if not restart:
            break

    while len(stack) > 1:
        close_node(stack.pop())

    if best_words is None:
        raise ValueError("html extractor: no visible text content found")
    return " ".join(best_words)


def _outcome(fn, payload):
    try:
        return ("ok", fn(payload))
    except Exception as e:  # noqa: BLE001 - exception parity is the point
        return ("err", type(e).__name__)


def assert_parity(payload: bytes) -> None:
    assert _outcome(extract_html, payload) == _outcome(
        extract_html_model, payload)


# ---------------------------------------------------------------- corpus


@pytest.mark.parametrize("variant", range(3))
@pytest.mark.parametrize("giant", [False, True])
def test_fixture_pages_match_model(variant, giant):
    for site in range(6):
        payload = build_html_page(
            "The quick brown fox jumps over the lazy dog. " * (site + 1)
            + "Reach & teach <markup> survivors at large.",
            site=site, lang="en", variant=variant, giant=giant)
        assert_parity(payload)


# ------------------------------------------------------------ adversarial

_TAGS = sorted(_CANDIDATES) + ["a", "span", "nav", "br", "img", "script",
                               "style", "b"]
_text_frag = st.text(
    alphabet=st.sampled_from(list("ab <>&;#x1!\"'= \t\né世")),
    max_size=24)


@st.composite
def markup(draw, depth=0):
    parts = []
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.integers(0, 6))
        if kind == 0:
            parts.append(draw(_text_frag))
        elif kind == 1 and depth < 4:  # (possibly misnested) element
            tag = draw(st.sampled_from(_TAGS))
            attrs = draw(st.sampled_from(
                ["", " id='x>y'", ' class="a b"', " data-x=1", " /"]))
            inner = draw(markup(depth=depth + 1))
            close = draw(st.sampled_from(
                [f"</{tag}>", f"</ {tag} >", "", "</div>", "</a>"]))
            parts.append(f"<{tag}{attrs}>{inner}{close}")
        elif kind == 2:
            parts.append(draw(st.sampled_from(
                ["<!-- c <div> -->", "<!-- unterminated", "<!doctype html>",
                 "<?php x ?>", "<![CDATA[ <b> ]]>"])))
        elif kind == 3:
            parts.append(draw(st.sampled_from(
                ["<script>var a = '</div>';</script>",
                 "<style>p { color: red }</style>",
                 "<script>unterminated raw text"])))
        elif kind == 4:
            parts.append(draw(st.sampled_from(
                ["&amp;", "&#32;", "&lt;b&gt;", "&bogus;", "&"])))
        elif kind == 5:
            parts.append(draw(st.sampled_from(
                ["<", "< notatag", "</>", "<3", "</nope>"])))
        else:
            parts.append(draw(st.sampled_from(
                ["<br>", "<img src=x>", "<hr/>"])))
    return "".join(parts)


@given(doc=markup())
@settings(max_examples=300, deadline=None)
def test_adversarial_markup_matches_model(doc):
    assert_parity(f"<html><body>{doc}</body></html>".encode())


@given(doc=markup())
@settings(max_examples=100, deadline=None)
def test_bare_fragment_matches_model(doc):
    # no <body> wrapper: the end-of-document drain does the scoring
    assert_parity(doc.encode())
