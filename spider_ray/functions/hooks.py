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


def queue_site0_orphan(wave: int):
    """Example mid-crawl queue provider (channel_queue, website.rs:7528-7562):
    injects the sitemap-orphan page after wave 0 — queued links bypass the
    budget check but pass the rest of the admission chain."""
    if wave == 0:
        return ("https://www.site0.example/orphan/sm0",)
    return ()
