"""Sitemap reader — ``sitemap_crawl``/``sitemap_parse``
(``spider/src/website.rs:12408-12574``).

Parses ``urlset`` and nested ``sitemapindex`` XML pulled from the corpus (the
"network"), returning location URLs as extra crawl seeds.  The crawl chains
it after the main BFS (``website.rs:6975``): sitemap-discovered pages pass
the normal admission chain and are fetched+parsed, but their links are NOT
expanded into the frontier (the reference's sitemap path feeds pages to the
subscription channel without BFS expansion).
"""

from __future__ import annotations

import re

_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.S | re.I)
_SITEMAP_BLOCK_RE = re.compile(r"<sitemap>(.*?)</sitemap>", re.S | re.I)


def parse_sitemap(xml: str | bytes) -> tuple[list[str], list[str]]:
    """→ (page urls, child sitemap urls).  Tolerant regex parse (the
    reference streams via an XML reader; our fixtures are well-formed)."""
    if isinstance(xml, bytes):
        xml = xml.decode("utf-8", "replace")
    child_sitemaps: list[str] = []
    consumed_spans: list[tuple[int, int]] = []
    for m in _SITEMAP_BLOCK_RE.finditer(xml):
        consumed_spans.append(m.span())
        loc = _LOC_RE.search(m.group(1))
        if loc:
            child_sitemaps.append(loc.group(1))
    urls = []
    for m in _LOC_RE.finditer(xml):
        if any(s <= m.start() < e for s, e in consumed_spans):
            continue
        urls.append(m.group(1))
    return urls, child_sitemaps


def discover_sitemap_href(html: str | bytes) -> str | None:
    """FIRST ``<link rel="sitemap" href>`` of the homepage — the reference
    streams the root document through an lol_html handler on
    ``link[rel="sitemap"]`` and stops at the first match
    (``website.rs:12510-12546``)."""
    from ..htmlparse import START, parse_attrs, tokenize

    if isinstance(html, bytes):
        from ..encoding import decode_html

        html = decode_html(html)
    for kind, tag, attrs_str, _raw in tokenize(html):
        if kind == START and tag == "link":
            rel = href = None
            for k, v in parse_attrs(attrs_str or ""):
                if k == "rel":
                    rel = v
                elif k == "href":
                    href = v
            if rel is not None and rel.lower() == "sitemap" and href:
                return href
    return None


def collect_sitemap_urls(
    corpus_get, root: str, max_depth: int = 4, sitemap_path: str | None = None
) -> list[str]:
    """Fetch ``{root}{sitemap_path or 'sitemap.xml'}`` and recurse into child
    sitemaps, returning location URLs in document order (dedup, first-seen).
    ``sitemap_path`` mirrors ``Configuration.sitemap_url``
    (configuration.rs:389-394).

    Autodiscovery fallback (``website.rs:11753-11830`` retry loop +
    ``sitemap_parse`` at ``:12481-12560``): when the conventional/configured
    sitemap URL is missing, the homepage is fetched once and the first
    ``<link rel="sitemap" href>`` (resolved against the root) replaces the
    sitemap URL — one correction attempt, like the reference's
    ``attempted_correct`` flag."""
    from urllib.parse import urljoin

    seen: dict[str, None] = {}
    first = root + (sitemap_path or "sitemap.xml").lstrip("/")
    status, body = corpus_get(first)[:2]
    if body is None or status != 200:
        rstatus, rbody = corpus_get(root)[:2]
        if rstatus == 200 and rbody:
            href = discover_sitemap_href(rbody)
            if href:
                first = urljoin(root, href)
    queue = [first]
    visited_maps: set[str] = set()
    depth = 0
    while queue and depth < max_depth:
        next_queue = []
        for sm_url in queue:
            if sm_url in visited_maps:
                continue
            visited_maps.add(sm_url)
            status, body = corpus_get(sm_url)[:2]
            if body is None or status != 200:
                continue
            urls, children = parse_sitemap(body)
            for u in urls:
                seen.setdefault(u)
            next_queue.extend(children)
        queue = next_queue
        depth += 1
    return list(seen)
