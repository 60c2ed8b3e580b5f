"""Property tests for the redirect resolver: random redirect graphs vs a
naive step-by-step model of the reference policy semantics."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.config import CrawlConfig
from spider_ray.redirect import RedirectResolver, is_ssrf_redirect

HOST = "www.f.example"
ROOT = f"https://{HOST}/"
OFF = "https://other.example/"


@st.composite
def redirect_graphs(draw):
    """A random corpus of up to 12 urls, some redirecting (possibly cyclic,
    possibly off-host, one possibly SSRF)."""
    n = draw(st.integers(2, 12))
    urls = [ROOT + f"p{i}" for i in range(n)]
    chain: dict[str, tuple[int, str | None]] = {}
    for i, u in enumerate(urls):
        kind = draw(st.integers(0, 5))
        if kind <= 2:
            chain[u] = (200, None)
        elif kind == 3:
            chain[u] = (301, urls[draw(st.integers(0, n - 1))])
        elif kind == 4:
            chain[u] = (302, OFF + f"x{draw(st.integers(0, 3))}")
        else:
            chain[u] = (302, "http://169.254.169.254/meta")
    return urls, chain


def naive_resolve(url, chain, policy, limit, strict_allowance):
    """Step-by-step model: follows the reference's attempt semantics
    (website.rs:2601-2727) literally."""
    status, loc = chain.get(url, (404, None))
    if policy == "none":
        return ("final", url, status)
    current, hops = url, 0
    while 300 <= status < 400 and loc:
        target = loc
        prev_len = hops + 1
        if is_ssrf_redirect(target):
            return ("error", current, status)
        if policy == "loose":
            if prev_len > limit:
                return ("error", current, status)
        else:
            target_host = target.split("://")[1].split("/")[0]
            if target_host == HOST:
                if prev_len > 10:
                    return ("error", current, status)
            elif prev_len > limit:
                return ("error", current, status)
            elif strict_allowance[0] > 0:
                strict_allowance[0] -= 1
            else:
                return ("final", current, status)
        current, hops = target, hops + 1
        status, loc = chain.get(current, (404, None))
    return ("final", current, status)


@given(redirect_graphs(), st.sampled_from(["loose", "strict", "none"]))
@settings(max_examples=200, deadline=None)
def test_resolver_matches_naive_model(graph, policy):
    urls, chain = graph

    def meta_get(u):
        return chain.get(u, (404, None))

    resolver = RedirectResolver(CrawlConfig(redirect_policy=policy))
    allowance = [1]  # crawl-global, shared across the whole sequence
    for u in urls:
        expected = naive_resolve(u, chain, policy, 7, allowance)
        res = resolver.resolve(u, meta_get, HOST)
        kind = "error" if res.error else "final"
        assert kind == expected[0], (u, policy, res, expected)
        if kind == "final":
            assert res.final_url == expected[1]
            assert res.status == expected[2]
