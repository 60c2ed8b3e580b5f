"""Shared wave-admission fold — the ONE implementation of the ordered
``is_allowed`` chain (SURVEY.md §2.7) used by both the sequential oracle and
the distributed engine, so their semantics cannot drift.

The fold is deliberately tiny (metadata-only: url, host, priority) — it is
the analogue of spider keeping all mutable crawl state on the single
``Website`` driver task while fetch workers stay stateless
(SURVEY.md §3.1 "pivotal architectural fact").
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig
from .frontier import UrlFrontier
from .semantics import Budget, is_allowed_default, is_over_depth
from .urlnorm import url_host


@dataclass
class WaveAdmission:
    admitted: list[str] = field(default_factory=list)  # in canonical order
    deferred: list[tuple[str, int]] = field(default_factory=list)  # politeness carry-over
    dropped_budget: int = 0
    dropped_robots_or_filters: int = 0
    dropped_depth: int = 0
    dropped_visited: int = 0


def order_candidates(
    candidates: list[tuple[str, int]], round_robin: bool
) -> tuple[list[str], dict[str, int]]:
    """Canonical wave order (reference frontier heap semantics) + first-push
    priority per url_norm."""
    frontier = UrlFrontier(round_robin=round_robin)
    prio_of: dict[str, int] = {}
    for url, prio in candidates:
        if frontier.push(url, prio):
            prio_of[url.lower()] = prio
    return frontier.drain(), prio_of


def admit_wave(
    order: list[str],
    prio_of: dict[str, int],
    visited_keys,  # supports ``key in visited_keys`` (lowercased url)
    config: CrawlConfig,
    robots_for,  # url -> RobotFileParser | None
    host_delay_ms,  # host -> int (robots crawl-delay override already folded)
    budget: Budget,
    budgetless_keys: frozenset[str] = frozenset(),
) -> WaveAdmission:
    """Exact admission chain: visited → whitelist/blacklist → robots → depth
    → politeness quota (defer) → budget (drop).  Mutates ``budget``.

    ``budgetless_keys``: mid-crawl queued links bypass the budget check but
    not the rest (``is_allowed_budgetless``, website.rs:7545-7560)."""
    res = WaveAdmission()
    quota: dict[str, int] = {}
    for url in order:
        key = url.lower()
        if key in visited_keys:
            res.dropped_visited += 1
            continue
        if not is_allowed_default(url, config, robots_for(url)):
            res.dropped_robots_or_filters += 1
            continue
        if is_over_depth(url, config):
            res.dropped_depth += 1
            continue
        host = url_host(url)
        delay = host_delay_ms(host)
        if delay > 0:
            cap = max(1, -(-config.wave_span_ms // delay))  # ceil(span/delay)
            used = quota.get(host, 0)
            if used >= cap:
                res.deferred.append((url, prio_of[key]))
                continue
            quota[host] = used + 1
        if key not in budgetless_keys and budget.is_over(url):
            res.dropped_budget += 1
            continue
        res.admitted.append(url)
    return res


def gate_links_by_signature(
    pages_in_order,  # iterable of (url, signature | None, links)
    signatures: set[int],
    normalize: bool,
):
    """Duplicate-content link suppression in admitted order
    (``website.rs:8673-8683``): a page whose signature was already seen does
    NOT expand its links.  Yields (url, links_allowed, links)."""
    for url, sig, links in pages_in_order:
        allowed = True
        if normalize and sig is not None:
            if sig in signatures:
                allowed = False
            else:
                signatures.add(sig)
        yield url, allowed, links
