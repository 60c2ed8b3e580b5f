"""Example crawl hooks (SURVEY.md §2.11) — module-level so they pickle into
parse workers and hash stably into checkpoint manifests.

``on_link_find`` (website.rs:1157-1162): URL rewrite at dispatch.
``on_should_crawl`` (website.rs:1168-1187): page predicate post-fetch.
"""

from __future__ import annotations


def rewrite_dup_a_to_leaf(url: str) -> str:
    """Dispatch-time rewrite: /dup/a fetches its unique leaf instead (the
    visited set still records /dup/a)."""
    if url.endswith("/dup/a"):
        return url[: -len("dup/a")] + "dup/only-a"
    return url


def skip_section3(page: dict) -> bool:
    """Drop every page under /sec3/ post-fetch: the page row is kept with
    ``blocked_crawl`` set, its links are not expanded."""
    return "/sec3/" not in page["url"]
