"""Single-pass page parse: links + metadata + normalize-signature + text in
ONE tokenization of the html.

This mirrors the reference's design where fetch, link extraction, metadata
and signature happen inline in one streaming rewriter scan
(``Page::new_page_streaming``, ``page.rs:4641+``) rather than separate DOM
walks.  Semantics are EXACTLY those of the three single-purpose functions
(:func:`spider_ray.htmlparse.extract_links_and_meta`,
:func:`spider_ray.htmlparse.hash_html`,
:func:`spider_ray.textextract.extract_text`) — pinned by
tests/test_parsepage.py which cross-checks against them on every fixture
page.
"""

from __future__ import annotations

import html as _htmllib
from dataclasses import dataclass

import re

from .hashing import stable_hash_u64
from .htmlparse import (
    COMMENT,
    END,
    RAWTEXT,
    START,
    TEXT,
    _NORMALIZE_DELETE,
    _RAW_CLOSE_RE,
    _RAW_TEXT,
    _TOKEN_RE,
    _attr,
    parse_attrs,
    tokenize,
)
from .scope import Selectors, choose_join_base, parent_host_match, push_link
from .textextract import _SKIP_SUBTREE, _WS_RE, BLOCK_TAGS
from .urlnorm import anchor_href_filtered, normalize_url, url_host_port

# Tags whose START handling reads the self-closing flag (union of the three
# consumers' tag sets) — everything else skips the rstrip/endswith check.
_NEEDS_SC = frozenset(_RAW_TEXT | _NORMALIZE_DELETE | _SKIP_SUBTREE)

# Tags the link/metadata pass reacts to (the chain at the top of the START
# handler); all other tags skip straight to normalize/text handling.
_LINKMETA_TAGS = frozenset({"head", "base", "meta", "title", "a", "script", "link"})

# Normalized-output tag-string memos ("<p>" / "</p>"); capped so adversarial
# html with unbounded distinct tag names can't grow them without limit.
_OPEN_TAG_CACHE: dict[str, str] = {}
_CLOSE_TAG_CACHE: dict[str, str] = {}
_TAG_CACHE_MAX = 2048


@dataclass
class ParsedPage:
    links: list[str]
    title: str | None
    description: str | None
    og_image: str | None
    base_href: str | None
    signature: int | None
    text: str


def parse_page(
    html: str,
    page_url: str,
    crawl_root: str | None,
    selectors: Selectors,
    external_domains: frozenset[str] = frozenset(),
    full_resources: bool = False,
    want_signature: bool = False,
    want_text: bool = True,
    host_state: tuple | None = None,
    generic_memo: dict | None = None,
) -> ParsedPage:
    # --- link/meta state (htmlparse.extract_links_and_meta) ---
    links: dict[str, str] = {}
    resolver = LinkResolver(page_url, crawl_root, selectors, external_domains,
                            host_state=host_state, generic_memo=generic_memo)
    title = description = og_image = None
    base_element: str | None = None
    in_head = 0
    title_in_head = False

    # --- normalize state (htmlparse.normalize_html) ---
    norm_out: list[str] | None = [] if want_signature else None
    norm_skip = 0

    # --- text state (textextract.extract_text) ---
    blocks: list[str] = []
    buf: list[str] = []
    text_skip = 0

    def flush():
        if buf:
            joined = "".join(buf)
            buf.clear()
            if "&" in joined:
                joined = _htmllib.unescape(joined)
            # == _WS_RE.sub(" ", joined).strip(): str.split() and re \s share
            # Py_UNICODE_ISSPACE, and join/split run in C (~16us/page saved).
            joined = " ".join(joined.split())
            if joined:
                blocks.append(joined)

    # ---- inlined tokenizer (htmlparse.tokenize merged into the handlers) ----
    # Byte-identical to `for kind, ... in tokenize(html)` feeding the three
    # handler groups (pinned by tests/test_parsepage.py's cross-check against
    # the single-purpose functions); inlining removes the ~165 generator
    # yields + tuple unpacks per page in the crawl's hottest loop
    # (BASELINE.md phase profile: 89% of crawl wall is this stage).
    want_sig = norm_out is not None
    search = _TOKEN_RE.search
    buf_append = buf.append
    norm_append = norm_out.append if want_sig else None
    open_cache = _OPEN_TAG_CACHE
    close_cache = _CLOSE_TAG_CACHE
    pos = 0
    n = len(html)
    while pos < n:
        m = search(html, pos)
        if m is None:
            text = html[pos:]
            if want_sig and not norm_skip:
                norm_append(text)
            if want_text and not text_skip:
                buf_append(text)
            break
        start, end = m.span()
        if start > pos:
            text = html[pos:start]
            if want_sig and not norm_skip:
                norm_append(text)
            if want_text and not text_skip:
                buf_append(text)
        pos = end
        closing, tag, attrs_str = m.group(1, 2, 3)
        if tag is None:  # comment / doctype / CDATA / processing instruction
            if want_sig and not norm_skip:
                norm_append(m.group(0))
            continue
        tag = tag.lower()
        if closing:
            # ---- END handlers ----
            if tag == "head" and in_head:
                in_head -= 1
            if want_sig:
                if tag in _NORMALIZE_DELETE:
                    if norm_skip and tag not in _RAW_TEXT:
                        norm_skip -= 1
                elif not norm_skip:
                    cached = close_cache.get(tag)
                    if cached is None:
                        cached = "</" + tag + ">"
                        if len(close_cache) < _TAG_CACHE_MAX:
                            close_cache[tag] = cached
                    norm_append(cached)
            if want_text:
                if tag in _SKIP_SUBTREE:
                    if text_skip and tag not in ("script", "style"):
                        text_skip -= 1
                    flush()
                elif not text_skip and tag in BLOCK_TAGS:
                    flush()
            continue
        attrs_str = attrs_str or ""
        # self-closing flag is only read for tags in _NEEDS_SC — skip the
        # rstrip/endswith allocation for everything else
        self_closing = tag in _NEEDS_SC and attrs_str.rstrip().endswith("/")
        attrs = None
        # ---- START: links + metadata ----
        if tag in _LINKMETA_TAGS:
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
                    if _attr(attrs, "name") == "description":
                        description = content
                    elif _attr(attrs, "property") == "og:image":
                        og_image = content
            elif tag == "title":
                title_in_head = in_head > 0
            elif tag == "a" and not full_resources:
                attrs = parse_attrs(attrs_str)
                href = _attr(attrs, "href")
                if (
                    href is not None
                    and _attr(attrs, "aria-hidden") != "true"
                    and not anchor_href_filtered(href)
                ):
                    abs_url = resolver.resolve(href, base_element)
                    if abs_url is not None:
                        key = abs_url.lower()
                        if key not in links:
                            links[key] = abs_url
            elif full_resources and tag in ("a", "script", "link"):
                attrs = parse_attrs(attrs_str)
                if not (tag == "a" and _attr(attrs, "aria-hidden") == "true"):
                    href = _attr(attrs, "src" if tag == "script" else "href")
                    if href is not None and not (tag == "a" and anchor_href_filtered(href)):
                        abs_url = resolver.resolve(href, base_element)
                        if abs_url is not None:
                            key = abs_url.lower()
                            if key not in links:
                                links[key] = abs_url
        # ---- START: normalize ----
        if want_sig:
            if tag in _NORMALIZE_DELETE:
                if tag not in _RAW_TEXT and not self_closing and tag != "base":
                    norm_skip += 1
            elif not norm_skip:
                if not attrs_str or attrs_str.isspace():
                    cached = open_cache.get(tag)
                    if cached is None:
                        cached = "<" + tag + ">"
                        if len(open_cache) < _TAG_CACHE_MAX:
                            open_cache[tag] = cached
                    norm_append(cached)
                else:
                    if attrs is None:
                        attrs = parse_attrs(attrs_str)
                    kept = [
                        (nm, v)
                        for nm, v in attrs
                        if not (tag == "a" and nm == "href")
                        and (nm.startswith("data-") or nm in ("id", "class"))
                    ]
                    attrs_out = "".join(
                        f' {nm}="{_htmllib.escape(v, quote=True)}"' if v is not None else f" {nm}"
                        for nm, v in kept
                    )
                    norm_append(f"<{tag}{attrs_out}>")
        # ---- START: text ----
        if want_text:
            if tag in _SKIP_SUBTREE:
                flush()
                if tag not in ("script", "style") and not self_closing:
                    text_skip += 1
            elif not text_skip and tag in BLOCK_TAGS:
                flush()
        # ---- raw-text elements (script/style/textarea/title/xmp) ----
        if self_closing or tag not in _RAW_TEXT:
            continue
        close = _RAW_CLOSE_RE.get(tag)
        if close is None:
            close = _RAW_CLOSE_RE[tag] = re.compile(rf"</{tag}\s*>", re.I)
        cm = close.search(html, pos)
        raw = html[pos:] if cm is None else html[pos : cm.start()]
        if tag == "title" and title_in_head and raw:
            title = raw
        if want_sig and tag not in _NORMALIZE_DELETE and not norm_skip:
            norm_append(raw or "")
        if want_text and not text_skip and tag == "textarea" and raw:
            buf_append(raw)
        if cm is None:
            break  # unterminated raw text: tokenize ends without an END token
        pos = cm.end()
        # implicit END of the raw-text element (tokenize yields END here)
        if want_sig:
            if tag in _NORMALIZE_DELETE:
                if norm_skip and tag not in _RAW_TEXT:
                    norm_skip -= 1
            elif not norm_skip:
                cached = close_cache.get(tag)
                if cached is None:
                    cached = "</" + tag + ">"
                    if len(close_cache) < _TAG_CACHE_MAX:
                        close_cache[tag] = cached
                norm_append(cached)
        if want_text:
            if tag in _SKIP_SUBTREE:
                if text_skip and tag not in ("script", "style"):
                    text_skip -= 1
                flush()
            elif not text_skip and tag in BLOCK_TAGS:
                flush()
    if want_text:
        flush()

    signature = None
    if norm_out is not None:
        normalized = "".join(norm_out).encode("utf-8")
        signature = stable_hash_u64(normalized) if normalized else 0

    return ParsedPage(
        links=list(links.values()),
        title=title,
        description=description,
        og_image=og_image,
        base_href=base_element,
        signature=signature,
        text="\n".join(blocks) if want_text else "",
    )


def _push(links, href, page_url, crawl_root, base_element, selectors, external_domains):
    base = choose_join_base(href, page_url, crawl_root, base_element)
    abs_url = push_link(base, href, selectors, external_domains)
    if abs_url is not None:
        key = abs_url.lower()
        if key not in links:
            links[key] = abs_url


class LinkResolver:
    """Hot-path link canonicalization with exact slow-path semantics.

    The generic path (``choose_join_base`` → ``convert_abs_path`` →
    ``validate_link`` → scheme coercion) costs several ``urlsplit``/
    ``urljoin`` calls per link.  The two overwhelmingly common href shapes on
    real pages — root-absolute ``/a/b`` and bare-relative ``page2`` — resolve
    to simple string concatenations when they contain no dot-segments, no
    backslashes and no scheme colon.  Everything else falls back to the
    generic functions, so outputs are IDENTICAL (pinned by
    tests/test_parsepage.py which cross-checks every fixture page against
    the single-purpose reference implementation).
    """

    __slots__ = (
        "page_url", "crawl_root", "selectors", "external_domains",
        "page_dir", "page_prefix_ok", "root_prefix", "root_ok",
        "_page_host_ok", "generic_memo",
    )

    def __init__(self, page_url, crawl_root, selectors, external_domains,
                 host_state: tuple | None = None,
                 generic_memo: dict | None = None):
        self.generic_memo = generic_memo
        self.page_url = page_url
        self.crawl_root = crawl_root
        self.selectors = selectors
        self.external_domains = external_domains
        # base dir of the page for bare-relative joins ("…/a/b" → "…/a/")
        cut = page_url.rfind("/")
        authority_end = page_url.find("/", page_url.find("://") + 3) if "://" in page_url else -1
        if "://" in page_url and cut >= authority_end >= 0 and "?" not in page_url and "#" not in page_url:
            self.page_dir = page_url[: cut + 1]
        else:
            self.page_dir = None
        if host_state is not None:
            # per-host reuse: the scope checks below depend only on the
            # page's scheme://authority (+ selectors/crawl_root), so batch
            # stages compute them once per host via ``host_state()`` —
            # measured ~18% of the links-only scan when done per page
            page_host_ok, self.root_prefix, self.root_ok = host_state
            self.page_prefix_ok = page_host_ok and self.page_dir is not None
            return
        # fast paths are valid only when the inherited scheme already equals
        # the parent scheme (no coercion step), that scheme is crawlable, and
        # the base's host passes the scope check (computed ONCE here)
        scheme = selectors.parent_host_scheme
        scheme_ok = scheme in ("http", "https") and page_url.startswith(scheme + "://")
        self._page_host_ok = scheme_ok and self._host_in_scope(page_url)
        self.page_prefix_ok = self._page_host_ok and self.page_dir is not None
        self.root_prefix = None
        self.root_ok = False
        if crawl_root is not None and crawl_root.endswith("/"):
            self.root_prefix = crawl_root[:-1]  # scheme://host[:port]
            self.root_ok = (
                scheme in ("http", "https")
                and crawl_root.startswith(scheme + "://")
                and self._host_in_scope(crawl_root)
            )

    def host_state(self) -> tuple:
        """``(page_host_ok, root_prefix, root_ok)`` — constant across all
        pages sharing this page's scheme://authority, selectors and crawl
        root; pass back as ``host_state=`` to skip the scope recheck."""
        return (self._page_host_ok, self.root_prefix, self.root_ok)

    def _host_in_scope(self, url: str) -> bool:
        """The host-acceptance part of ``validate_link`` (page.rs:2756-2795)."""
        host, port = url_host_port(url)
        sel = self.selectors
        ok = parent_host_match(
            host or None, sel.sub_matcher, sel.parent_host, sel.base_input_domain, sel.sub_matcher
        )
        if not ok and host and port is not None:
            ok = parent_host_match(
                f"{host}:{port}", sel.sub_matcher, sel.parent_host, sel.base_input_domain, sel.sub_matcher
            )
        if not ok and host and self.external_domains:
            ok = host in self.external_domains or "*" in self.external_domains
        return ok

    def resolve(self, href: str, base_element) -> str | None:
        """Return the canonical in-scope URL or None.  ``base_element`` non-
        None forces the generic path (rare)."""
        h = href.strip()
        if base_element is None and h and "\\" not in h and "#" not in h:
            c0 = h[0]
            if c0 == "/":
                if (
                    self.root_ok
                    and len(h) > 1
                    and h[1] != "/"
                    and "/." not in h
                    and ":" not in h
                ):
                    return self.root_prefix + h
            elif (
                self.page_prefix_ok
                and c0 != "."
                and c0 != "?"
                and ":" not in h
                and "/." not in h
            ):
                return self.page_dir + h
        # generic path
        base = choose_join_base(h, self.page_url, self.crawl_root, base_element)
        memo = self.generic_memo
        if memo is not None and base is self.crawl_root:
            # crawl_root-based joins (absolute/external/root-ish hrefs) are
            # page-independent — the SAME (root, href) resolves identically
            # for every page of the host, and external links repeat across
            # a host's pages (nav/footer); keyed by (root, raw href)
            key = (base, h)
            if key in memo:
                return memo[key]
            out = push_link(base, h, self.selectors, self.external_domains)
            # bound actor memory: entry count AND key bytes (hostile pages
            # with many unique multi-KB hrefs would otherwise grow the memo
            # to GBs before the count cap engages)
            if len(memo) < 1 << 20 and len(h) <= 4096:
                memo[key] = out
            return out
        return push_link(base, h, self.selectors, self.external_domains)


# Restricted tokenizer for the links-only scan: matches ONLY the tags the
# link pass reacts to (a, base) and the raw-text consumers whose content
# must be skipped (script/style/textarea/title/xmp); every other tag, and
# all text, is passed over by the regex engine at C speed.  The negative
# lookahead keeps "<abbr>"/"<address>" from matching as "a".
_LINKS_TOKEN_RE = re.compile(
    r"<!--.*?-->"
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|<(/?)([aA]|[bB][aA][sS][eE]|[sS][cC][rR][iI][pP][tT]"
    r"|[sS][tT][yY][lL][eE]|[tT][eE][xX][tT][aA][rR][eE][aA]"
    r"|[tT][iI][tT][lL][eE]|[xX][mM][pP])(?![a-zA-Z0-9-])"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.S,
)


def extract_links_only(
    html: str,
    page_url: str,
    crawl_root: str | None,
    selectors: Selectors,
    external_domains: frozenset[str] = frozenset(),
    host_state: tuple | None = None,
    attr_memo: dict | None = None,
    generic_memo: dict | None = None,
) -> dict[str, str]:
    """Links-only fast path: the anchor/base/raw-text subset of
    ``parse_page``'s handler loop over a RESTRICTED token stream — for
    consumers that need nothing but the link dict (edge extraction,
    backlink counting).  ~4× fewer Python handler iterations per fixture
    page than the full tokenizer; semantics are ``parse_page``'s link
    pass verbatim (same ``LinkResolver``, ``<base>`` first-wins,
    aria-hidden and extension filters, per-page first-seen dedup — the
    link pass never tracks subtree skips other than raw text, so skipping
    unrelated tags cannot change it).

    Known scan-level caveat (pinned by the corpus-wide parity test in
    tests/test_parsepage.py): markup quoted INSIDE an attribute value of
    a tag this regex does not match (e.g. ``<div data-x="<a href=…>">``)
    is consumed by the full tokenizer but visible to the restricted scan.
    The fixture html space contains no such construct; consumers needing
    that edge exactly use ``parse_page``.
    """
    links: dict[str, str] = {}
    resolver = LinkResolver(page_url, crawl_root, selectors, external_domains,
                            host_state=host_state, generic_memo=generic_memo)
    base_element: str | None = None
    pos = 0
    search = _LINKS_TOKEN_RE.search
    while True:
        m = search(html, pos)
        if m is None:
            return links
        pos = m.end()
        closing, tag, attrs_str = m.group(1, 2, 3)
        if tag is None or closing:
            continue
        tag = tag.lower()
        attrs_str = attrs_str or ""
        if tag == "a":
            # anchor attr strings repeat heavily across a host's pages
            # (nav/footer markup) — memoize the page-independent part:
            # (href, passes the hidden/extension filters)
            if attr_memo is not None:
                hit = attr_memo.get(attrs_str)
                if hit is None:
                    attrs = parse_attrs(attrs_str)
                    href = _attr(attrs, "href")
                    ok = (
                        href is not None
                        and _attr(attrs, "aria-hidden") != "true"
                        and not anchor_href_filtered(href)
                    )
                    # bound actor memory: entry count AND key bytes (skip
                    # memoizing pathological multi-KB attr strings)
                    if len(attr_memo) < 1 << 20 and len(attrs_str) <= 4096:
                        attr_memo[attrs_str] = (href, ok)
                else:
                    href, ok = hit
            else:
                attrs = parse_attrs(attrs_str)
                href = _attr(attrs, "href")
                ok = (
                    href is not None
                    and _attr(attrs, "aria-hidden") != "true"
                    and not anchor_href_filtered(href)
                )
            if ok:
                abs_url = resolver.resolve(href, base_element)
                if abs_url is not None:
                    key = abs_url.lower()
                    if key not in links:
                        links[key] = abs_url
            continue
        if tag == "base":
            if base_element is None:
                attrs = parse_attrs(attrs_str)
                href = _attr(attrs, "href")
                if href:
                    parsed = normalize_url(href)
                    if parsed is not None:
                        base_element = parsed
            continue
        # raw-text consumer (script/style/textarea/title/xmp): skip its
        # content so markup inside it is never scanned — parse_page parity
        if attrs_str.rstrip().endswith("/"):
            continue
        close = _RAW_CLOSE_RE.get(tag)
        if close is None:
            close = _RAW_CLOSE_RE[tag] = re.compile(rf"</{tag}\s*>", re.I)
        cm = close.search(html, pos)
        if cm is None:
            return links
        pos = cm.end()
