"""1:1 ports of the reference's adaptive-politeness unit tables
(rate_limiter.rs mod tests:189-260, auto_throttle.rs mod tests:231-330),
made deterministic with an injected clock, plus a HostGate integration test
showing a skewed (penalized) host gets bounded per-wave admission."""

from __future__ import annotations

from spider_ray.state.throttle import (
    AutoThrottle,
    AutoThrottleConfig,
    DomainRateLimiter,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, s: float):
        self.t += s


# --- rate_limiter.rs tests (1:1) ---


def test_acquire_immediate_when_tokens_available():
    limiter = DomainRateLimiter(10.0, 10, clock=FakeClock())
    assert limiter.acquire("example.com") == 0.0


def test_acquire_returns_wait_when_exhausted():
    limiter = DomainRateLimiter(1.0, 1, clock=FakeClock())
    assert limiter.acquire("slow.com") == 0.0
    second = limiter.acquire("slow.com")
    assert second > 0.0
    assert second <= 2.0  # ~1 s at rate 1


def test_different_domains_are_independent():
    limiter = DomainRateLimiter(1.0, 1, clock=FakeClock())
    assert limiter.acquire("a.com") == 0.0
    assert limiter.acquire("b.com") == 0.0


def test_refill_restores_tokens():
    clock = FakeClock()
    limiter = DomainRateLimiter(2.0, 1, clock=clock)
    assert limiter.acquire("x.com") == 0.0
    assert limiter.acquire("x.com") > 0.0
    clock.advance(0.5)  # 0.5 s × 2 t/s = 1 token
    assert limiter.acquire("x.com") == 0.0


def test_throttle_drains_and_slows():
    clock = FakeClock()
    limiter = DomainRateLimiter(100.0, 10, clock=clock)
    limiter.acquire("hot.com")
    limiter.throttle("hot.com", 5.0)  # 429 with Retry-After 5s → rate 0.2
    wait = limiter.acquire("hot.com")
    assert abs(wait - 5.0) < 0.01  # deficit 1.0 / rate 0.2
    clock.advance(5.0)
    assert limiter.acquire("hot.com") == 0.0


def test_rate_clamps():
    limiter = DomainRateLimiter(0.0, 0, clock=FakeClock())
    assert limiter.default_rate == 0.01
    assert limiter.default_burst == 1
    big = DomainRateLimiter(1e9, 1_000_000, clock=FakeClock())
    assert big.default_rate == 1_000_000.0
    assert big.default_burst == 10_000


# --- auto_throttle.rs tests (1:1) ---


def test_cold_start_returns_zero_delay():
    at = AutoThrottle()
    assert at.delay_for_ms("example.com") == 0


def test_first_sample_seeds_ema():
    at = AutoThrottle()
    at.record_latency("example.com", 0.200)
    assert abs(at.latency_ms("example.com") - 200.0) < 1.0


def test_ema_converges_toward_new_value():
    at = AutoThrottle(AutoThrottleConfig(alpha=0.5))
    at.record_latency("a.com", 0.100)
    at.record_latency("a.com", 0.300)
    # EMA = 100 + 0.5*(300-100) = 200
    assert abs(at.latency_ms("a.com") - 200.0) < 5.0


def test_delay_respects_target_concurrency():
    at = AutoThrottle(AutoThrottleConfig(target_concurrency=4.0))
    at.record_latency("fast.com", 0.400)
    # 400 ms / 4 = 100 ms
    assert 90 <= at.delay_for_ms("fast.com") <= 110


def test_delay_clamped_to_min_max():
    at = AutoThrottle(
        AutoThrottleConfig(target_concurrency=1.0, min_delay_ms=50, max_delay_ms=500)
    )
    at.record_latency("fast.com", 0.005)
    assert at.delay_for_ms("fast.com") == 50
    at.record_latency("slow.com", 10.0)  # 10 s → clamped to 500 ms
    assert at.delay_for_ms("slow.com") == 500


def test_disabled_returns_zero():
    at = AutoThrottle(AutoThrottleConfig(enabled=False))
    at.record_latency("x.com", 1.0)
    assert at.delay_for_ms("x.com") == 0


# --- HostGate integration: bounded admission for a skewed/penalized host ---


def test_hostgate_penalized_host_bounded(ray_session):
    from spider_ray.state.hostgate import HostGate

    gate = HostGate(num_shards=2, adaptive=True)
    urls = [f"https://hot.example/p{i}" for i in range(50)]
    urls += [f"https://cold.example/p{i}" for i in range(10)]
    hosts = ["hot.example"] * 50 + ["cold.example"] * 10
    import ray

    ray.get(gate.push(urls, [0] * 60, hosts))
    gate.penalize("hot.example", retry_after_s=30.0)
    popped = gate.pop_wave(wave_span_ms=1000, default_delay_ms=0)
    by_host: dict[str, int] = {}
    for _, h in popped:
        by_host[h] = by_host.get(h, 0) + 1
    # cold host drains fully; the penalized host admits at most a token's
    # worth (bucket drained, rate 1/30 t/s)
    assert by_host.get("cold.example") == 10
    assert by_host.get("hot.example", 0) <= 1
    assert gate.size() >= 49
    gate.shutdown()
