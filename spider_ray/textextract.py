"""Deterministic text extractor — the pinned spec from FIXTURES.md §3.

Defines the golden ``text`` column: the fixture generator *constructs* HTML
from text blocks and the engine must recover the exact bytes ("byte-identical
extracted text per url", BASELINE.json).  Mirrors the role of the reference's
transform-to-text output (``spider/src/utils/mod.rs:8835-9012``,
``spider_cli/src/main.rs:527-560``) with fully pinned whitespace/entity
semantics:

1. Decode ``html`` as UTF-8.
2. Drop ``<script> <style> <noscript> <iframe> <template>`` subtrees,
   comments, and the entire ``<head>``.
3. In document order, emit the text of block-level runs: entities decoded,
   whitespace runs collapsed to a single space, stripped, skipped if empty.
   Inline elements (a, span, em, …) do not split a block.
4. Join blocks with "\\n"; no trailing newline; empty page → "".
"""

from __future__ import annotations

import html as _htmllib
import re

from .htmlparse import COMMENT, END, RAWTEXT, START, TEXT, tokenize

_SKIP_SUBTREE = {"script", "style", "noscript", "iframe", "template", "head"}

# Tags whose start OR end tag terminates the current text block.  Inline
# elements are intentionally absent.
BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "blockquote",
    "pre", "figcaption", "div", "section", "article", "aside", "header",
    "footer", "main", "nav", "ul", "ol", "table", "thead", "tbody", "tfoot",
    "tr", "br", "hr", "body", "html", "form", "fieldset", "dl", "dt", "dd",
    "figure", "address", "caption", "title", "head",
}

_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes | str) -> str:
    if isinstance(html, bytes):
        from .encoding import decode_html

        html = decode_html(html)
    blocks: list[str] = []
    buf: list[str] = []
    skip_depth = 0

    def flush():
        if buf:
            joined = "".join(buf)
            buf.clear()
            if "&" in joined:
                joined = _htmllib.unescape(joined)
            # == _WS_RE.sub(" ", joined).strip(): str.split() and re \s share
            # Py_UNICODE_ISSPACE, and join/split run in C.
            joined = " ".join(joined.split())
            if joined:
                blocks.append(joined)

    for kind, tag, attrs_str, raw in tokenize(html):
        if kind == START:
            if tag in _SKIP_SUBTREE:
                self_closing = (attrs_str or "").rstrip().endswith("/")
                flush()
                if tag not in ("script", "style") and not self_closing:
                    # script/style raw content arrives as RAWTEXT (dropped);
                    # other skip-subtrees nest markup.
                    skip_depth += 1
                continue
            if skip_depth:
                continue
            if tag in BLOCK_TAGS:
                flush()
        elif kind == END:
            if tag in _SKIP_SUBTREE:
                if skip_depth and tag not in ("script", "style"):
                    skip_depth -= 1
                flush()
                continue
            if skip_depth:
                continue
            if tag in BLOCK_TAGS:
                flush()
        elif kind == TEXT:
            if not skip_depth:
                buf.append(tag)
        elif kind == RAWTEXT:
            # raw-text elements outside skip set (title handled via head skip;
            # textarea content treated as text)
            if not skip_depth and tag == "textarea" and raw:
                buf.append(raw)
    flush()
    return "\n".join(blocks)
