"""Sequential pure-Python crawl oracle.

Runs the reference-semantics crawl (SURVEY.md §2.7, §3.1, §7.3) over an
in-memory corpus, producing the golden outputs the distributed engine must
reproduce exactly: the URL-seen set, the per-wave admitted order, and the
per-url extracted text bytes.

Wave model (the deterministic re-expression of the reference's interleaved
dispatch/merge loop — SURVEY.md §3.1 step 6 note): one wave = drain the
current frontier in canonical order (priority desc, case-insensitive url
desc — the reference's ``BinaryHeap<ScoredUrl>`` order, with optional domain
round-robin), admitting through the exact ``is_allowed`` chain; fetch+parse
admitted pages; merge extracted links (minus visited, minus duplicate-content
pages' links) into the next frontier.

The admission fold itself lives in :mod:`spider_ray.waves` and is SHARED with
the distributed engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig, CrawlJob
from .frontier import score_url
from .functions.retry import is_retryable_status
from .parsepage import parse_page
from .robots import RobotFileParser
from .scope import Selectors, parent_host_match
from .semantics import Budget, depth_distance_for, gate_content, is_allowed_default
from .textextract import extract_text
from .urlnorm import normalize_url, url_host
from .waves import admit_wave, gate_links_by_signature, order_candidates


@dataclass
class OracleResult:
    visited: list[str] = field(default_factory=list)  # first-seen casing, admit order
    admitted_order: list[tuple[int, int, str]] = field(default_factory=list)  # (wave, seq, url)
    pages: list[dict] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)

    @property
    def visited_set(self) -> set[str]:
        return {u.lower() for u in self.visited}


class ScopeRouter:
    """Multi-seed scope routing: each seed carries its own selectors +
    crawl root; a page uses the first seed scope whose host matcher accepts
    the page's host (single-seed jobs trivially use that seed's scope)."""

    def __init__(self, job: CrawlJob) -> None:
        self.entries = [
            (job.selectors_for(seed), job.crawl_root_for(seed)) for seed in job.seeds
        ]

    def for_host(self, host: str) -> tuple[Selectors, str | None]:
        for sel, root in self.entries:
            if parent_host_match(
                host or None, sel.sub_matcher, sel.parent_host, sel.base_input_domain, sel.sub_matcher
            ):
                return sel, root
        return self.entries[0]


def load_robots(
    corpus_get, config: CrawlConfig, crawl_roots: list[str]
) -> tuple[dict[str, RobotFileParser], dict[str, int]]:
    """Per-host robots parsers + effective per-host delay (ms).

    robots ``Crawl-delay`` overrides the configured delay, capped at 60 s —
    ``website.rs:2503-2531``."""
    robots: dict[str, RobotFileParser] = {}
    delays: dict[str, int] = {}
    if not config.respect_robots_txt:
        return robots, delays
    for root in crawl_roots:
        if root is None:
            continue
        host = url_host(root)
        if host in robots:
            continue
        parser = RobotFileParser()
        status, body = corpus_get(root + "robots.txt")[:2]
        parser.read_status(status, body if body is None else _as_text(body))
        robots[host] = parser
        delay = parser.get_crawl_delay(config.user_agent)
        if delay is not None:
            delays[host] = min(int(delay * 1000), 60000)
    return robots, delays


def _as_text(body) -> str:
    if isinstance(body, (bytes, bytearray)):
        from .encoding import decode_html

        return decode_html(bytes(body))
    return body


def admit_seeds(job: CrawlJob, config, robots_for, visited: set[str]) -> list[str]:
    """Wave-0 seed establish (``_crawl_establish``, website.rs:4104-4360):
    seeds pass ``is_allowed_default`` only (no depth/budget)."""
    admitted = []
    for seed in job.seeds:
        url = normalize_url(seed) or seed
        key = url.lower()
        if key in visited:
            continue
        if not is_allowed_default(url, config, robots_for(url)):
            continue
        visited.add(key)
        admitted.append(url)
    return admitted


def crawl_oracle(job: CrawlJob, corpus: dict[str, tuple], queue_provider=None) -> OracleResult:
    """Run the sequential crawl.  ``corpus`` maps url → (status, html bytes,
    location); missing URLs synthesize status 404 with empty body."""
    from .redirect import REDIRECT_ERROR_STATUS, RedirectResolver

    config = job.config
    result = OracleResult()

    def corpus_get(url: str):
        row = corpus.get(url)
        if row is None:
            return (404, None, None, None, 0)
        return row + (None,) * (5 - len(row))

    def meta_get(url: str):
        row = corpus_get(url)
        return row[0], row[2]

    resolver = RedirectResolver(config)
    router = ScopeRouter(job)
    crawl_roots = [root for _, root in router.entries]
    robots_by_host, robots_delays = load_robots(corpus_get, config, crawl_roots)

    budget = Budget(config.budget, depth_distance_for(config))
    visited: set[str] = set()
    signatures: set[int] = set()

    def robots_for(url: str):
        return robots_by_host.get(url_host(url))

    def host_delay_ms(host: str) -> int:
        return robots_delays.get(host, config.delay_ms)

    job_live = job

    def fetch_resolved(url: str, wave: int):
        """Resolve the redirect chain, re-fetch the terminal row, and (seed
        establish only) rebuild the scope selectors on a cross-host redirect
        of a seed (modify_selectors, utils/mod.rs:9121-9139)."""
        nonlocal router, job_live
        sel, root = router.for_host(url_host(url))
        crawl_host = url_host(root) if root else url_host(url)
        res = resolver.resolve(url, meta_get, crawl_host)
        if res.error:
            return res, REDIRECT_ERROR_STATUS, "", False
        status, body, _, ctype, flaky = corpus_get(res.final_url)
        # transient-failure model (flaky_until attempts fail with 503, the
        # retry loop makes retry+1 attempts — website.rs:4205-4253)
        if flaky and flaky > config.retry and is_retryable_status(503):
            return res, 503, "", False
        body, truncated = gate_content(body, ctype, config)
        if (
            wave == 0
            and url in job_live.seeds
            and res.destination is not None
            and url_host(res.final_url) != url_host(url)
        ):
            job_live = job_live.with_seed_redirects(
                job_live.seed_redirects + ((url, res.final_url),)
            )
            router = ScopeRouter(job_live)
        html = _as_text(body) if body is not None else ""
        return res, status, html, truncated

    admitted = admit_seeds(job, config, robots_for, visited)
    for seq, url in enumerate(admitted):
        result.visited.append(url)
        result.admitted_order.append((0, seq, url))

    deferred: list[tuple[str, int]] = [(u, score_url(u, 1)) for u in config.extra_links]
    wave = 0
    while True:
        # fetch + parse admitted pages in admitted order
        candidates: list[tuple[str, int]] = list(deferred)
        deferred = []
        parsed = []
        for url in admitted:
            # on_link_find rewrite at dispatch: visited keeps the original,
            # the fetch and the page row use the rewritten URL
            fetch_url = config.on_link_find(url) if config.on_link_find else url
            res, status, html, truncated = fetch_resolved(fetch_url, wave)
            host = url_host(fetch_url)
            sel, root = router.for_host(host)
            page_url = res.final_url if not res.error else fetch_url
            ex = parse_page(
                html, page_url, root, sel, config.external_domains, config.full_resources,
                want_signature=config.normalize, want_text=True,
            )
            sig = ex.signature if config.normalize else None
            page_row = {
                "url": fetch_url,
                "wave": wave,
                "status_code": status,
                "signature": sig,
                "title": ex.title,
                "description": ex.description,
                "og_image": ex.og_image,
                "text": ex.text,
                "links": ex.links,
                "final_redirect_destination": res.destination,
                "blocked_crawl": False,
                "truncated": truncated,
            }
            if config.on_should_crawl is not None and not config.on_should_crawl(
                {k: page_row[k] for k in (
                    "url", "status_code", "title", "description", "og_image",
                    "text", "signature", "final_redirect_destination")}
            ):
                page_row["blocked_crawl"] = True
                page_row["links"] = []
                result.pages.append(page_row)
                parsed.append((fetch_url, None, []))
                continue
            result.pages.append(page_row)
            parsed.append((fetch_url, sig, ex.links))

        dup_sig = 0
        depth = wave + 1
        for url, allowed, links in gate_links_by_signature(parsed, signatures, config.normalize):
            if allowed:
                candidates.extend((link, score_url(link, depth)) for link in links)
            else:
                dup_sig += 1

        result.metrics.append(
            {"wave": wave, "admitted": len(admitted), "fetched": len(parsed),
             "dup_signature": dup_sig, "candidates": len(candidates)}
        )

        # mid-crawl queue injection (channel_queue, website.rs:7528-7562):
        # queued links bypass the budget check but not the rest
        budgetless: frozenset[str] = frozenset()
        if queue_provider is not None:
            injected = list(queue_provider(wave) or ())
            budgetless = frozenset(u.lower() for u in injected)
            candidates.extend((u, score_url(u, wave + 1)) for u in injected)

        if not candidates or wave + 1 >= config.max_waves:
            break

        order, prio_of = order_candidates(candidates, config.round_robin)
        adm = admit_wave(order, prio_of, visited, config, robots_for, host_delay_ms, budget,
                         budgetless_keys=budgetless)
        wave += 1
        admitted = adm.admitted
        deferred = adm.deferred
        for seq, url in enumerate(admitted):
            visited.add(url.lower())
            result.visited.append(url)
            result.admitted_order.append((wave, seq, url))

        if not admitted and not deferred:
            break

    # --- sitemap chain (website.rs:6975, 12408+): fetch sitemap-discovered
    # pages through the normal admission chain; links NOT expanded ---
    if not config.ignore_sitemap:
        from .semantics import is_over_depth
        from .sources.sitemap import collect_sitemap_urls

        sm_wave = wave + 1
        seq = 0
        for _, root in router.entries:
            if root is None:
                continue
            for url in collect_sitemap_urls(corpus_get, root, sitemap_path=config.sitemap_url):
                key = url.lower()
                if key in visited:
                    continue
                if not is_allowed_default(url, config, robots_for(url)):
                    continue
                if is_over_depth(url, config):
                    continue
                if budget.is_over(url):
                    continue
                visited.add(key)
                result.visited.append(url)
                result.admitted_order.append((sm_wave, seq, url))
                seq += 1
                fetch_url = config.on_link_find(url) if config.on_link_find else url
                res, status, html, truncated = fetch_resolved(fetch_url, sm_wave)
                host = url_host(fetch_url)
                sel, sroot = router.for_host(host)
                page_url = res.final_url if not res.error else fetch_url
                ex = parse_page(
                    html, page_url, sroot, sel, config.external_domains, config.full_resources,
                    want_signature=config.normalize, want_text=True,
                )
                sig = ex.signature if config.normalize else None
                page_row = {
                    "url": fetch_url, "wave": sm_wave, "status_code": status,
                    "signature": sig,
                    "title": ex.title, "description": ex.description,
                    "og_image": ex.og_image, "text": ex.text, "links": ex.links,
                    "final_redirect_destination": res.destination,
                    "blocked_crawl": False,
                    "truncated": truncated,
                }
                if config.on_should_crawl is not None and not config.on_should_crawl(
                    {k: page_row[k] for k in (
                        "url", "status_code", "title", "description", "og_image",
                        "text", "signature", "final_redirect_destination")}
                ):
                    page_row["blocked_crawl"] = True
                    page_row["links"] = []
                result.pages.append(page_row)

    return result
