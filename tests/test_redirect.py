"""Redirect semantics unit tests — SSRF guard table (website.rs:2543-2597),
policy Loose/Strict/None resolution (website.rs:2601-2735), hop limits."""

from __future__ import annotations

import pytest

from spider_ray.config import CrawlConfig
from spider_ray.redirect import REDIRECT_ERROR_STATUS, RedirectResolver, is_ssrf_redirect


@pytest.mark.parametrize(
    "url,blocked",
    [
        ("https://example.com/x", False),
        ("http://example.com/x", False),
        ("ftp://example.com/x", True),  # non-http scheme
        ("javascript:void(0)", True),
        ("http://localhost/x", True),
        ("http://api.localhost/x", True),
        ("http://0.0.0.0/x", True),
        ("http://[::1]/x", True),
        ("http://[::]/x", True),
        ("http://169.254.169.254/latest/meta-data/", True),
        ("http://metadata.google.internal/x", True),
        ("http://metadata.goog/x", True),
        ("http://127.0.0.1/x", True),
        ("http://127.1.2.3/x", True),  # whole /8 loopback
        ("http://10.0.0.1/x", True),
        ("http://172.16.0.1/x", True),
        ("http://172.31.255.255/x", True),
        ("http://172.15.0.1/x", False),  # outside /12
        ("http://172.32.0.1/x", False),
        ("http://192.168.1.1/x", True),
        ("http://169.254.1.1/x", True),  # link-local
        ("http://255.255.255.255/x", True),  # broadcast
        ("http://8.8.8.8/x", False),
        ("http://[::ffff:10.0.0.1]/x", True),  # v4-mapped private
        ("http://[2001:db8::1]/x", False),
    ],
)
def test_ssrf_table(url, blocked):
    assert is_ssrf_redirect(url) is blocked


def _chain_meta(chain: dict[str, tuple[int, str | None]]):
    def meta_get(url):
        return chain.get(url, (404, None))

    return meta_get


HOST = "www.a.example"
ROOT = f"https://{HOST}/"


def test_loose_follows_within_limit():
    chain = {ROOT + f"r{i}": (301, ROOT + f"r{i+1}") for i in range(7)}
    chain[ROOT + "r7"] = (200, None)
    r = RedirectResolver(CrawlConfig())
    res = r.resolve(ROOT + "r0", _chain_meta(chain), HOST)
    assert not res.error and res.final_url == ROOT + "r7" and res.status == 200
    assert res.destination == ROOT + "r7"


def test_loose_aborts_past_limit():
    chain = {ROOT + f"r{i}": (301, ROOT + f"r{i+1}") for i in range(9)}
    chain[ROOT + "r9"] = (200, None)
    r = RedirectResolver(CrawlConfig())
    res = r.resolve(ROOT + "r0", _chain_meta(chain), HOST)
    assert res.error and res.destination is None


def test_policy_none_returns_3xx():
    chain = {ROOT + "r": (302, ROOT + "t"), ROOT + "t": (200, None)}
    r = RedirectResolver(CrawlConfig(redirect_policy="none"))
    res = r.resolve(ROOT + "r", _chain_meta(chain), HOST)
    assert res.final_url == ROOT + "r" and res.status == 302 and res.destination is None


def test_ssrf_hop_aborts_all_policies():
    chain = {ROOT + "r": (302, "http://169.254.169.254/x")}
    for policy in ("loose", "strict"):
        r = RedirectResolver(CrawlConfig(redirect_policy=policy))
        assert r.resolve(ROOT + "r", _chain_meta(chain), HOST).error


def test_strict_same_host_uses_default_cap():
    # 9 same-host hops: over redirect_limit 7 but under the default-policy
    # cap of 10 — Strict follows (matching hosts take the default branch)
    chain = {ROOT + f"r{i}": (301, ROOT + f"r{i+1}") for i in range(9)}
    chain[ROOT + "r9"] = (200, None)
    r = RedirectResolver(CrawlConfig(redirect_policy="strict"))
    res = r.resolve(ROOT + "r0", _chain_meta(chain), HOST)
    assert not res.error and res.final_url == ROOT + "r9"


def test_strict_offhost_allowance_then_stop():
    # the crawl-global initial allowance (1 without robots) lets the FIRST
    # off-host redirect through; the second stops, returning the 3xx
    off = "https://other.example/x"
    chain = {ROOT + "a": (302, off), ROOT + "b": (302, off)}
    r = RedirectResolver(CrawlConfig(redirect_policy="strict"))
    first = r.resolve(ROOT + "a", _chain_meta(chain), HOST)
    assert not first.error and first.final_url == off
    second = r.resolve(ROOT + "b", _chain_meta(chain), HOST)
    assert not second.error
    assert second.final_url == ROOT + "b" and second.status == 302
    assert second.destination is None


def test_strict_allowance_two_with_robots():
    off = "https://other.example/x"
    chain = {ROOT + c: (302, off) for c in "abc"}
    r = RedirectResolver(CrawlConfig(redirect_policy="strict", respect_robots_txt=True))
    assert r.resolve(ROOT + "a", _chain_meta(chain), HOST).final_url == off
    assert r.resolve(ROOT + "b", _chain_meta(chain), HOST).final_url == off
    assert r.resolve(ROOT + "c", _chain_meta(chain), HOST).final_url == ROOT + "c"


def test_strict_subdomains_end_with_match():
    sub = f"https://sub.{HOST}/x"
    chain = {ROOT + "r": (301, sub), sub: (200, None)}
    strict = RedirectResolver(CrawlConfig(redirect_policy="strict", subdomains=True))
    assert strict.resolve(ROOT + "r", _chain_meta(chain), HOST).final_url == sub


def test_relative_location_resolves_against_current():
    chain = {ROOT + "dir/r": (302, "../target")}
    chain[ROOT + "target"] = (200, None)
    r = RedirectResolver(CrawlConfig())
    res = r.resolve(ROOT + "dir/r", _chain_meta(chain), HOST)
    assert res.final_url == ROOT + "target"


def test_error_status_constant():
    assert REDIRECT_ERROR_STATUS == 0
