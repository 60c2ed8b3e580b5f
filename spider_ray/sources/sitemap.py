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


def collect_sitemap_urls(
    corpus_get, root: str, max_depth: int = 4, sitemap_path: str | None = None
) -> list[str]:
    """Fetch ``{root}{sitemap_path or 'sitemap.xml'}`` and recurse into child
    sitemaps, returning location URLs in document order (dedup, first-seen).
    ``sitemap_path`` mirrors ``Configuration.sitemap_url``
    (configuration.rs:389-394)."""
    seen: dict[str, None] = {}
    queue = [root + (sitemap_path or "sitemap.xml").lstrip("/")]
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
