"""Adaptive politeness — per-domain token-bucket rate limiting and
latency-EMA auto-throttle.

Pure ports of the reference's formulas (clock-injectable so unit tests are
deterministic):

* ``DomainRateLimiter`` — ``spider/src/utils/rate_limiter.rs:17-185``:
  per-domain token bucket (fractional tokens, refill ``elapsed × rate``
  capped at ``burst``); ``acquire`` returns the wait seconds
  (``deficit / rate``; 120 s when rate is 0); HTTP-429 ``throttle`` drains
  the bucket and sets ``rate = max(1/retry_after, 0.01)``; rate clamped to
  ``[0.01, 1e6]``, burst to ``[1, 10_000]``; LRU eviction above 10k domains.
* ``AutoThrottle`` — ``spider/src/utils/auto_throttle.rs:40-228``:
  per-domain latency EMA (``ema += alpha × (sample − ema)``, first sample
  seeds); ``delay = ema / target_concurrency`` clamped to
  ``[min_delay_ms, max_delay_ms]``; zero delay until the first sample.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

MAX_ENTRIES = 10_000


class _TokenBucket:
    __slots__ = ("tokens", "last_refill", "rate", "burst", "last_access")

    def __init__(self, rate: float, burst: int, access: int, now: float):
        self.tokens = float(burst)
        self.last_refill = now
        self.rate = rate
        self.burst = burst
        self.last_access = access

    def refill(self, now: float) -> None:
        elapsed = now - self.last_refill
        if elapsed > 0.0:
            self.tokens = min(self.tokens + elapsed * self.rate, float(self.burst))
            self.last_refill = now

    def try_acquire(self, now: float) -> float:
        """0.0 on success, else the wait (seconds) until a token exists."""
        self.refill(now)
        if self.tokens >= 1.0:
            self.tokens -= 1.0
            return 0.0
        deficit = 1.0 - self.tokens
        if self.rate > 0.0:
            return deficit / self.rate
        return 120.0  # zero rate: fully throttled, large but bounded


class DomainRateLimiter:
    """``rate_limiter.rs`` port; ``clock`` defaults to ``time.monotonic``."""

    def __init__(self, default_rate: float, default_burst: int, clock=time.monotonic):
        self.buckets: dict[str, _TokenBucket] = {}
        self.default_rate = min(max(default_rate, 0.01), 1_000_000.0)
        self.default_burst = min(max(default_burst, 1), 10_000)
        self._access = 0
        self._clock = clock

    def acquire(self, domain: str) -> float:
        self._access += 1
        now = self._clock()
        bucket = self.buckets.get(domain)
        if bucket is not None:
            bucket.last_access = self._access
            return bucket.try_acquire(now)
        self._maybe_evict()
        bucket = _TokenBucket(self.default_rate, self.default_burst, self._access, now)
        wait = bucket.try_acquire(now)
        self.buckets[domain] = bucket
        return wait

    def throttle(self, domain: str, retry_after_s: float) -> None:
        """HTTP 429: drain the bucket; ``rate = max(1/retry_after, 0.01)``."""
        secs = max(retry_after_s, 1.0)
        new_rate = max(1.0 / secs, 0.01)
        now = self._clock()
        bucket = self.buckets.get(domain)
        if bucket is not None:
            bucket.rate = new_rate
            bucket.tokens = 0.0
            bucket.last_refill = now
        else:
            self._maybe_evict()
            bucket = _TokenBucket(new_rate, self.default_burst, 0, now)
            bucket.tokens = 0.0
            self.buckets[domain] = bucket

    def set_rate(self, domain: str, rate: float) -> None:
        """Per-domain override (e.g. robots Crawl-delay → 1/delay)."""
        rate = min(max(rate, 0.01), 1_000_000.0)
        bucket = self.buckets.get(domain)
        if bucket is not None:
            bucket.rate = rate
        else:
            self._maybe_evict()
            self.buckets[domain] = _TokenBucket(rate, self.default_burst, 0, self._clock())

    def __len__(self) -> int:
        return len(self.buckets)

    def _maybe_evict(self) -> None:
        if len(self.buckets) < MAX_ENTRIES:
            return
        oldest = min(self.buckets, key=lambda k: self.buckets[k].last_access)
        del self.buckets[oldest]


@dataclass
class AutoThrottleConfig:
    """``auto_throttle.rs:77-104`` defaults."""

    target_concurrency: float = 2.0
    min_delay_ms: int = 0
    max_delay_ms: int = 60_000
    alpha: float = 0.15
    enabled: bool = True


class _DomainLatency:
    __slots__ = ("ema_us", "samples", "last_access")

    def __init__(self, access: int):
        self.ema_us = 0.0
        self.samples = 0
        self.last_access = access

    def record(self, latency_us: float, alpha: float) -> None:
        if self.samples == 0:
            self.ema_us = latency_us
        else:
            new = self.ema_us + alpha * (latency_us - self.ema_us)
            if new == new and new >= 0.0 and new != float("inf"):  # finite guard
                self.ema_us = new
        self.samples += 1


class AutoThrottle:
    """``auto_throttle.rs`` port."""

    def __init__(self, config: AutoThrottleConfig | None = None):
        self.domains: dict[str, _DomainLatency] = {}
        self.config = config or AutoThrottleConfig()
        self._access = 0

    def record_latency(self, domain: str, latency_s: float) -> None:
        us = latency_s * 1e6
        self._access += 1
        alpha = min(max(self.config.alpha, 0.01), 1.0)
        entry = self.domains.get(domain)
        if entry is None:
            self._maybe_evict()
            entry = _DomainLatency(self._access)
            self.domains[domain] = entry
        entry.last_access = self._access
        entry.record(us, alpha)

    def delay_for_ms(self, domain: str) -> int:
        """``delay = ema / target_concurrency`` clamped; 0 before any sample."""
        if not self.config.enabled:
            return 0
        entry = self.domains.get(domain)
        if entry is None or entry.samples == 0:
            return 0
        target = max(self.config.target_concurrency, 0.1)
        delay_ms = int((entry.ema_us / target) / 1000.0)
        return min(max(delay_ms, self.config.min_delay_ms), self.config.max_delay_ms)

    def latency_ms(self, domain: str) -> float | None:
        entry = self.domains.get(domain)
        if entry is None or entry.samples == 0:
            return None
        return entry.ema_us / 1000.0

    def __len__(self) -> int:
        return len(self.domains)

    def _maybe_evict(self) -> None:
        if len(self.domains) < MAX_ENTRIES:
            return
        oldest = min(self.domains, key=lambda k: self.domains[k].last_access)
        del self.domains[oldest]
