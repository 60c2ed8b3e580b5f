"""Retry-status classification + backoff — pure ports of
``spider/src/page.rs:1641-1679`` and ``spider/src/utils/backoff.rs:37-57``.

A static corpus has no live retries (the lookup is deterministic —
SURVEY.md §4 "Retries"), but re-crawl pipelines use these columns to decide
which URLs a future incremental pass should refetch."""

from __future__ import annotations

import random

# spider's custom codes (page.rs error-status constants)
DNS_RESOLVE_ERROR = 525
ADDRESS_UNREACHABLE_ERROR = 526
TOO_MANY_REDIRECTS_ERROR = 310


def is_retryable_status(status: int) -> bool:
    """``is_retryable_status`` (``page.rs:1641-1653``): 5xx plus 429/408,
    minus the permanent classes (DNS 525, unreachable 526, redirect-cap 310,
    501, 505, 511)."""
    if status in (
        DNS_RESOLVE_ERROR,
        ADDRESS_UNREACHABLE_ERROR,
        TOO_MANY_REDIRECTS_ERROR,
        501,
        505,
        511,
    ):
        return False
    return (500 <= status < 600) or status in (429, 408)


def is_permanent_target_failure(status: int) -> bool:
    """``is_permanent_target_failure`` (``page.rs:1672-1677``)."""
    return status in (DNS_RESOLVE_ERROR, ADDRESS_UNREACHABLE_ERROR, TOO_MANY_REDIRECTS_ERROR)


def backoff_delay_ms(attempt: int, base_ms: int = 1_000, cap_ms: int = 60_000,
                     rng: random.Random | None = None) -> int:
    """Full-jitter exponential backoff (``utils/backoff.rs:37-57``,
    used by the retry ladder at ``website.rs:4250-4252``):
    ``uniform(0, min(cap, base · 2^attempt))``."""
    ceiling = min(cap_ms, base_ms * (2 ** max(0, attempt)))
    r = rng or random
    return int(r.uniform(0, ceiling))
