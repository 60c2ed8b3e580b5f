"""Shared admission-pipeline semantics — used by BOTH the sequential oracle
and the distributed engine so the two cannot drift.

Admission order (``is_allowed``, ``spider/src/website.rs:1864-1891`` — exact
chain SURVEY.md §2.7):

1. visited? (case-insensitive) → Blocked
2. whitelist (if set, must match) / blacklist → Blocked
3. robots ``can_fetch`` when ``respect_robots_txt`` → Blocked
4. depth: ``#path_segments > depth_distance`` → Blocked
5. budget: stateful path-prefix counters + wildcard → BudgetExceeded

On admission the URL enters the visited set BEFORE the fetch
(``website.rs:7915``).
"""

from __future__ import annotations

from .config import CrawlConfig, url_in_list
from .robots import RobotFileParser
from .urlnorm import get_path_from_url

ALLOWED = 0
BLOCKED = 1
BUDGET_EXCEEDED = 2


def path_segment_count(url: str) -> int:
    """Segment count per ``is_over_inner_depth_budget``
    (``website.rs:2010-2028``): path **including query** split on "/" after
    stripping the leading slash; "" splits to one empty segment, so the root
    "/" counts as 1 and a trailing slash adds a segment."""
    path = get_path_from_url(url)
    if not path.startswith("/"):
        return 0
    return len(path[1:].split("/"))


def depth_distance_for(config: CrawlConfig) -> int:
    """``determine_limits`` (``website.rs:14076-14089``) — root seeds always
    yield ``depth_distance == depth``."""
    return config.depth


class Budget:
    """Stateful budget counters — ``is_over_inner_budget``
    (``website.rs:2051-2121``).

    * wildcard "*" budget: exceeded when the counter reaches **1** (the seed
      is admitted budgetless, so ``with_limit(n)`` yields n pages total)
    * path budgets: keyed by cumulative joint segments WITHOUT separator
      ("a", "ab" for /a/b — ``joint_segment.push_str(seg)``, 2096), exceeded
      at **0**; decrements are not rolled back on later rejection
    * keys are case-insensitive
    """

    def __init__(self, budget: tuple[tuple[str, int], ...] | None, depth_distance: int) -> None:
        self.counters: dict[str, int] | None = (
            {k.lower(): v for k, v in budget} if budget is not None else None
        )
        self.wild_card = self.counters is not None and "*" in self.counters
        self.depth_distance = depth_distance

    def is_over(self, url: str) -> bool:
        budget = self.counters
        if budget is None:
            return False
        exceeded_wild = False
        if self.wild_card:
            remaining = budget.get("*")
            if remaining is not None:
                if remaining == 1:
                    exceeded_wild = True
                else:
                    budget["*"] = remaining - 1
        skip_paths = self.wild_card and len(budget) == 1
        has_depth = self.depth_distance > 0
        if not skip_paths and not exceeded_wild:
            path = get_path_from_url(url)
            if not path.startswith("/"):
                return False
            joint = ""
            depth = 0
            for seg in path[1:].split("/"):
                if has_depth:
                    depth += 1
                    if depth > self.depth_distance:
                        return True
                joint += seg.lower()
                remaining = budget.get(joint)
                if remaining is not None:
                    if remaining == 0:
                        return True
                    budget[joint] = remaining - 1
            return False
        return exceeded_wild

    def snapshot(self) -> dict:
        return {"counters": dict(self.counters) if self.counters is not None else None}

    def restore(self, snap: dict) -> None:
        self.counters = dict(snap["counters"]) if snap["counters"] is not None else None
        self.wild_card = self.counters is not None and "*" in self.counters


def is_allowed_default(
    url: str,
    config: CrawlConfig,
    robots: RobotFileParser | None,
) -> bool:
    """Steps 2-3 (``is_allowed_default``, ``website.rs:1966-1990``)."""
    if config.whitelist and not url_in_list(url, config.whitelist, config.filter_mode):
        return False
    if config.blacklist and url_in_list(url, config.blacklist, config.filter_mode):
        return False
    if config.respect_robots_txt and robots is not None:
        if not robots.can_fetch(config.user_agent or "*", url):
            return False
    return True


def is_over_depth(url: str, config: CrawlConfig) -> bool:
    """Step 4 (``is_over_depth``, ``website.rs:2151-2154``)."""
    dd = depth_distance_for(config)
    return dd > 0 and path_segment_count(url) > dd


# ---------------------------------------------------------------------------
# Content gates — only_html Content-Type blocking + max_page_bytes
# ---------------------------------------------------------------------------

# ``IGNORE_CONTENT_TYPES`` (``utils/mod.rs:176-200``): exact header-value
# match; when ``only_html`` is set these responses are never streamed.
IGNORE_CONTENT_TYPES = frozenset(
    {
        "application/pdf",
        "application/zip",
        "application/x-rar-compressed",
        "application/x-tar",
        "image/png",
        "image/jpeg",
        "image/gif",
        "image/bmp",
        "image/svg+xml",
        "video/mp4",
        "video/x-msvideo",
        "video/x-matroska",
        "video/webm",
        "audio/mpeg",
        "audio/ogg",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
        "application/vnd.ms-excel",
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
        "application/vnd.ms-powerpoint",
        "application/vnd.openxmlformats-officedocument.presentationml.presentation",
        "application/x-7z-compressed",
        "application/x-rpm",
        "application/x-shockwave-flash",
    }
)


def gate_content(
    body: bytes | None, content_type: str | None, config: CrawlConfig
) -> tuple[bytes | None, bool]:
    """Apply the fetch-time content gates to a response body.

    → (gated body, truncated).  ``only_html`` + ignored Content-Type drops
    the body entirely (``block_streaming``, utils/mod.rs:6159-6174: headers
    and status kept, content None).  ``max_page_bytes`` keeps only the first
    ``max_page_bytes`` bytes with ``truncated=True`` (the streaming-chunk
    limit branch, utils/mod.rs:6303-6306 — partial data retained)."""
    if body is None:
        return None, False
    if config.only_html and content_type in IGNORE_CONTENT_TYPES:
        return None, False
    limit = config.max_page_bytes
    if limit > 0 and len(body) > limit:
        return body[:limit], True
    return body, False
