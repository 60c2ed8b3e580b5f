"""Crawl configuration — the matched subset of spider's ``Configuration``.

Defaults mirror ``Configuration::new`` (``spider/src/configuration.rs:862-872``):
``delay: 0``, ``depth: 25``, ``redirect_limit: 7``, ``only_html: true``.
Semantics table: SURVEY.md §1.4.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from .scope import Selectors, get_page_selectors
from .urlnorm import glob_expand_url, parse_absolute_url


@dataclass(frozen=True)
class CrawlConfig:
    # scope — configuration.rs:351,353
    subdomains: bool = False
    tld: bool = False
    external_domains: frozenset[str] = frozenset()
    # filters — configuration.rs:359,361 (exact full-URL membership,
    # lib.rs:441-449 non-regex build; whitelist checked first, both blocking)
    blacklist: tuple[str, ...] = ()
    whitelist: tuple[str, ...] = ()
    # robots — configuration.rs:349; crawl-delay override website.rs:2503-2531
    respect_robots_txt: bool = False
    user_agent: str | None = None
    # politeness — configuration.rs:364-365 (ms between same-host dispatches)
    delay_ms: int = 0
    # budget — configuration.rs:438-440; semantics website.rs:2051-2121.
    # Keys are case-insensitive path-prefix joints ("a", "ab" for /a/b) plus
    # the "*" wildcard page budget; with_limit(n) == {"*": n}.
    budget: tuple[tuple[str, int], ...] | None = None
    # depth — configuration.rs:429-432: path-segment count limit, not BFS hops
    depth: int = 25
    # dedup — configuration.rs:480: content-signature dedup on normalize_html
    normalize: bool = False
    # assets — configuration.rs:445: also extract script[src]/link[href]
    full_resources: bool = False
    # sitemap — configuration.rs:389-394
    sitemap_url: str | None = None
    ignore_sitemap: bool = True
    # extra links merged into the first frontier generation —
    # website.rs:7810-7812 (Website::extra_links); normal admission chain
    extra_links: tuple[str, ...] = ()
    # hard wall-clock cap on the whole crawl — configuration.rs:355,
    # run_with_crawl_timeout website.rs:6973-6977 (engine-side only; the
    # deterministic oracle has no wall clock)
    crawl_timeout_s: float | None = None
    # engine knobs (ours, documented divergences / wave model)
    round_robin: bool = False  # frontier domain round-robin (frontier.rs:83-121)
    wave_span_ms: int = 1000  # politeness window per wave (SURVEY.md §2.3)
    max_waves: int = 1000

    def with_limit(self, n: int) -> "CrawlConfig":
        """``with_limit`` == wildcard budget — configuration.rs:1495-1499."""
        extra = dict(self.budget or ())
        extra["*"] = n
        return replace(self, budget=tuple(extra.items()))


@dataclass(frozen=True)
class CrawlJob:
    """One crawl = seeds + config + derived scope selectors."""

    seeds: tuple[str, ...]
    config: CrawlConfig = field(default_factory=CrawlConfig)

    @staticmethod
    def from_seed(seed: str, config: CrawlConfig | None = None) -> "CrawlJob":
        return CrawlJob(tuple(glob_expand_url(seed)), config or CrawlConfig())

    def selectors_for(self, seed: str) -> Selectors:
        return get_page_selectors(seed, self.config.subdomains, self.config.tld)

    def crawl_root_for(self, seed: str) -> str | None:
        """``domain_parsed`` — the root URL used as join base for
        non-relative hrefs (website.rs:1487, page.rs:4751-4755)."""
        return parse_absolute_url(seed)


def url_in_list(url: str, patterns: tuple[str, ...]) -> bool:
    """Blacklist/whitelist check: exact membership of the full URL string
    (non-regex build — ``spider/src/lib.rs:441-449``: slice ``contains``)."""
    return url in patterns
