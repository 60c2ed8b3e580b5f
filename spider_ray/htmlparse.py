"""Streaming-style HTML tokenizer + link/metadata extraction + normalization.

Re-expresses the reference's lol_html rewriter passes as a single regex-based
tokenizer (C-speed regex engine; no per-row Python HTML DOM):

* link extraction handler semantics — ``spider/src/page.rs:4201-4389``
  (anchor selector with ``:not([aria-hidden="true"])`` and ~80
  ``:not([href$=...])`` extension filters from
  ``spider/src/utils/css_selectors.rs:2-84``, ``<base href>`` capture,
  join-base choice, scope validation, scheme coercion)
* metadata capture — ``spider/src/page.rs:3916-4028`` (``<head><title>``,
  ``meta[name=description]``, ``meta[property=og:image]``; last
  non-empty occurrence wins, matching the rewriter's overwrite behavior)
* ``normalize_html`` — ``spider/src/utils/mod.rs:9221-9285`` (remove ``href``
  from ``<a>``; delete ``script/style/iframe/base/noscript`` subtrees; strip
  all attributes except ``data-*``/``id``/``class``)
* ``hash_html``     — ``spider/src/utils/mod.rs:9287-9300`` (u64 over the
  normalized bytes; empty → 0).  We use a stable hash instead of the
  seed-randomized ahash — the grouping semantic is identical
  (SURVEY.md §2.2 "Parity note").
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass

from .hashing import stable_hash_u64
from .scope import Selectors, choose_join_base, push_link
from .urlnorm import anchor_href_filtered, normalize_url

_TOKEN_RE = re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.S,
)

_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s/>]*))?"
)

# Fast path for the dominant attribute shape: exactly one double-quoted
# attribute (e.g. an anchor's ` href="..."`).
_SINGLE_ATTR_RE = re.compile(r"\s*([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*\"([^\"]*)\"\s*")

# Elements whose content is raw text per the HTML5 tokenizer.
_RAW_TEXT = {"script", "style", "textarea", "title", "xmp"}

# Close-tag matchers for _RAW_TEXT elements, compiled once per tag.
_RAW_CLOSE_RE: dict[str, re.Pattern] = {}

# token kinds
TEXT, START, END, RAWTEXT, COMMENT = 0, 1, 2, 3, 4


def tokenize(html: str):
    """Yield (kind, tag_or_text, attrs_str, raw_content) tuples."""
    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            if pos < n:
                yield (TEXT, html[pos:], None, None)
            return
        if m.start() > pos:
            yield (TEXT, html[pos : m.start()], None, None)
        pos = m.end()
        tag = m.group(2)
        if tag is None:
            yield (COMMENT, m.group(0), None, None)
            continue
        tag_l = tag.lower()
        if m.group(1):  # closing tag
            yield (END, tag_l, None, None)
            continue
        attrs_str = m.group(3) or ""
        self_closing = attrs_str.rstrip().endswith("/")
        yield (START, tag_l, attrs_str, None)
        if tag_l in _RAW_TEXT and not self_closing:
            close = _RAW_CLOSE_RE.get(tag_l)
            if close is None:
                close = _RAW_CLOSE_RE[tag_l] = re.compile(rf"</{tag_l}\s*>", re.I)
            cm = close.search(html, pos)
            if cm is None:
                yield (RAWTEXT, tag_l, None, html[pos:])
                return
            yield (RAWTEXT, tag_l, None, html[pos : cm.start()])
            yield (END, tag_l, None, None)
            pos = cm.end()


def parse_attrs(attrs_str: str) -> list[tuple[str, str | None]]:
    """Parse a tag's attribute string → ordered (name, decoded value) pairs."""
    m = _SINGLE_ATTR_RE.fullmatch(attrs_str)
    if m is not None:
        val = m.group(2)
        if "&" in val:
            val = _htmllib.unescape(val)
        return [(m.group(1).lower(), val)]
    out = []
    for m in _ATTR_RE.finditer(attrs_str):
        name = m.group(1)
        if name == "/":
            continue
        val = m.group(2)
        if val is not None:
            if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                val = val[1:-1]
            val = _htmllib.unescape(val)
        out.append((name.lower(), val))
    return out


def _attr(attrs: list[tuple[str, str | None]], name: str) -> str | None:
    for k, v in attrs:
        if k == name:
            return v
    return None


@dataclass
class PageExtract:
    links: list[str]
    title: str | None
    description: str | None
    og_image: str | None
    base_href: str | None


def extract_links_and_meta(
    html: str,
    page_url: str,
    crawl_root: str | None,
    selectors: Selectors,
    external_domains: frozenset[str] = frozenset(),
    full_resources: bool = False,
) -> PageExtract:
    """One pass: anchors (validated + canonicalized, first-seen casing, doc
    order) + title/description/og:image + ``<base href>`` handling.

    Mirrors ``build_link_extract_handlers`` (``page.rs:4201-4389``) and
    ``links_stream_base`` (``page.rs:7101-7223``).
    """
    links: dict[str, str] = {}  # url_norm -> first-seen url (insertion order)
    title = description = og_image = None
    base_element: str | None = None  # first successful <base href> wins
    in_head = 0
    title_depth_head = False

    for kind, tag, attrs_str, raw in tokenize(html):
        if kind == START:
            if tag == "head":
                in_head += 1
            elif tag == "base" and base_element is None:
                attrs = parse_attrs(attrs_str)
                href = _attr(attrs, "href")
                if href:
                    parsed = normalize_url(href)
                    if parsed is not None:
                        base_element = parsed
            elif tag == "meta":
                attrs = parse_attrs(attrs_str)
                content = _attr(attrs, "content")
                if content:
                    name = _attr(attrs, "name")
                    prop = _attr(attrs, "property")
                    if name == "description":
                        description = content
                    elif prop == "og:image":
                        og_image = content
            elif tag == "title":
                title_depth_head = in_head > 0
            elif tag == "a" and not full_resources:
                attrs = parse_attrs(attrs_str)
                href = _attr(attrs, "href")
                if href is None:
                    continue
                if _attr(attrs, "aria-hidden") == "true":
                    continue
                if anchor_href_filtered(href):
                    continue
                _push(links, href, page_url, crawl_root, base_element, selectors, external_domains)
            elif full_resources and tag in ("a", "script", "link"):
                attrs = parse_attrs(attrs_str)
                if tag == "a" and _attr(attrs, "aria-hidden") == "true":
                    continue
                href = _attr(attrs, "src" if tag == "script" else "href")
                if href is None:
                    continue
                if tag == "a" and anchor_href_filtered(href):
                    continue
                _push(links, href, page_url, crawl_root, base_element, selectors, external_domains)
        elif kind == END:
            if tag == "head" and in_head:
                in_head -= 1
        elif kind == RAWTEXT and tag == "title" and title_depth_head:
            if raw:
                title = raw

    return PageExtract(list(links.values()), title, description, og_image, base_element)


def _push(links, href, page_url, crawl_root, base_element, selectors, external_domains):
    base = choose_join_base(href, page_url, crawl_root, base_element)
    abs_url = push_link(base, href, selectors, external_domains)
    if abs_url is not None:
        key = abs_url.lower()
        if key not in links:
            links[key] = abs_url


# ---------------------------------------------------------------------------
# normalize_html / hash_html
# ---------------------------------------------------------------------------

_NORMALIZE_DELETE = {"script", "style", "iframe", "base", "noscript"}


def normalize_html(html: bytes | str) -> bytes:
    """Deterministic re-serialization per ``normalize_html``
    (``utils/mod.rs:9221-9285``) — the dedup-signature preimage."""
    if isinstance(html, bytes):
        from .encoding import decode_html

        html = decode_html(html)
    out: list[str] = []
    skip_depth = 0
    for kind, tag, attrs_str, raw in tokenize(html):
        if kind == START:
            self_closing = (attrs_str or "").rstrip().endswith("/")
            if tag in _NORMALIZE_DELETE:
                if tag not in _RAW_TEXT and not self_closing and tag != "base":
                    skip_depth += 1
                continue
            if skip_depth:
                continue
            kept = []
            for name, val in parse_attrs(attrs_str or ""):
                if tag == "a" and name == "href":
                    continue
                if name.startswith("data-") or name in ("id", "class"):
                    kept.append((name, val))
            attrs_out = "".join(
                f' {n}="{_htmllib.escape(v, quote=True)}"' if v is not None else f" {n}"
                for n, v in kept
            )
            out.append(f"<{tag}{attrs_out}>")
        elif kind == END:
            if tag in _NORMALIZE_DELETE:
                if skip_depth and tag not in _RAW_TEXT:
                    skip_depth -= 1
                continue
            if skip_depth:
                continue
            out.append(f"</{tag}>")
        elif kind == TEXT:
            if not skip_depth:
                out.append(tag)
        elif kind == COMMENT:
            if not skip_depth:
                out.append(tag)
        # RAWTEXT of deleted elements dropped; of kept raw-text elements
        elif kind == RAWTEXT and tag not in _NORMALIZE_DELETE and not skip_depth:
            out.append(raw or "")
    return "".join(out).encode("utf-8")


def hash_html(html: bytes | str) -> int:
    """``hash_html`` (``utils/mod.rs:9287-9300``): u64 over normalized bytes,
    0 for empty."""
    normalized = normalize_html(html)
    if not normalized:
        return 0
    return stable_hash_u64(normalized)
