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
    # filters — configuration.rs:359,361.  filter_mode "exact" = the
    # non-regex build's full-URL membership (lib.rs:441-449); "regex" = the
    # regex build's RegexSet.is_match unanchored search (lib.rs:431-439).
    # Whitelist checked first, both blocking.
    blacklist: tuple[str, ...] = ()
    whitelist: tuple[str, ...] = ()
    filter_mode: str = "exact"  # "exact" | "regex"
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
    # redirects — configuration.rs:37-60,396-398 (policy default Loose,
    # limit default 7); semantics in spider_ray/redirect.py
    redirect_policy: str = "loose"  # "loose" | "strict" | "none"
    redirect_limit: int = 7
    # content gates — only_html (configuration.rs:476, default TRUE:
    # responses with an ignored Content-Type are never streamed,
    # block_streaming utils/mod.rs:6159-6174) and max_page_bytes
    # (utils/mod.rs:455-471 MAX_SIZE_BYTES, 0 = disabled): bodies over the
    # limit keep only the first max_page_bytes bytes with truncated=True
    # (the streaming-chunk branch, utils/mod.rs:6303-6306)
    only_html: bool = True
    max_page_bytes: int = 0
    # retry — configuration.rs:462 (default 0 = no retries); loop semantics
    # website.rs:4205-4253: up to retry+1 attempts on retryable statuses
    # (page.rs:1641-1653 classifier).  The corpus models transient failures
    # via the flaky_until column: attempts 1..flaky_until return 503, so a
    # row succeeds iff flaky_until <= retry.
    retry: int = 0
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
    # user-extension hooks — SURVEY.md §2.11.  Both must be picklable
    # (module-level functions) — on_should_crawl ships to parse workers.
    # on_link_find: rewrite a URL at dispatch (website.rs:1157-1162, applied
    # website.rs:7652-7658): the VISITED set keeps the original link, the
    # fetch and the page row use the rewritten URL.
    on_link_find: object | None = None  # Callable[[str], str]
    # on_should_crawl: drop a fetched page (website.rs:1168-1187, applied
    # 8033-8040): the page row is kept with blocked_crawl=True, its links
    # are not expanded, and its signature does not enter the dedup set.
    on_should_crawl: object | None = None  # Callable[[dict], bool]
    # worker-permit cap — configuration.rs:478 (concurrency_limit), semaphore
    # website.rs:6586, calc_limits website.rs:841-858: bounds how many fetches
    # run at once.  Ray Data form: caps the fetch+parse stage's concurrent
    # tasks (map_batches concurrency=N); None = let the scheduler saturate.
    concurrency_limit: int | None = None
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
    """One crawl = seeds + config + derived scope selectors.

    ``seed_redirects`` records cross-host redirects of seeds discovered at
    establish time (``modify_selectors``, utils/mod.rs:9121-9139): the scope
    selectors for such a seed are rebuilt for the redirect target with the
    ORIGINAL host kept in scope via ``base_input_domain``.
    """

    seeds: tuple[str, ...]
    config: CrawlConfig = field(default_factory=CrawlConfig)
    seed_redirects: tuple[tuple[str, str], ...] = ()  # (seed, final_url)

    @staticmethod
    def from_seed(seed: str, config: CrawlConfig | None = None) -> "CrawlJob":
        return CrawlJob(tuple(glob_expand_url(seed)), config or CrawlConfig())

    def with_seed_redirects(self, redirects: tuple[tuple[str, str], ...]) -> "CrawlJob":
        return replace(self, seed_redirects=redirects)

    def _redirect_target(self, seed: str) -> str | None:
        for s, target in self.seed_redirects:
            if s == seed:
                return target
        return None

    def selectors_for(self, seed: str) -> Selectors:
        target = self._redirect_target(seed)
        if target is not None:
            from dataclasses import replace as _rep

            from .urlnorm import url_host

            sel = get_page_selectors(target, self.config.subdomains, self.config.tld)
            return _rep(sel, base_input_domain=url_host(seed))
        return get_page_selectors(seed, self.config.subdomains, self.config.tld)

    def crawl_root_for(self, seed: str) -> str | None:
        """``domain_parsed`` — the root URL used as join base for
        non-relative hrefs (website.rs:1487, page.rs:4751-4755)."""
        target = self._redirect_target(seed)
        return parse_absolute_url(target if target is not None else seed)


def url_in_list(url: str, patterns: tuple[str, ...], mode: str = "exact") -> bool:
    """Blacklist/whitelist check.

    ``exact``: membership of the full URL string (non-regex build —
    ``spider/src/lib.rs:441-449``: slice ``contains``).
    ``regex``: any-pattern unanchored match (regex build —
    ``lib.rs:431-439``: ``RegexSet::is_match``)."""
    if mode == "regex":
        return any(r.search(url) for r in _compiled_patterns(patterns))
    return url in patterns


@__import__("functools").lru_cache(maxsize=64)
def _compiled_patterns(patterns: tuple[str, ...]):
    import re

    return tuple(re.compile(p) for p in patterns)
