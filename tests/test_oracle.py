"""Crawl-scenario tests for the sequential oracle (FIXTURES.md §5).

These pin the oracle's semantics; the engine-parity tests
(test_crawl_parity.py) then assert the distributed engine reproduces the
oracle exactly."""

import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, corpus_as_dict, seed_of
from spider_ray.oracle import crawl_oracle


@pytest.fixture(scope="module")
def corpus():
    return corpus_as_dict(build_corpus())


def crawl(corpus, config=None, seeds=None):
    job = CrawlJob(tuple(seeds or [seed_of(0)]), config or CrawlConfig())
    return crawl_oracle(job, corpus)


def test_plain_crawl(corpus):
    res = crawl(corpus)
    vs = res.visited_set
    assert "https://www.site0.example/" in vs
    assert "https://www.site0.example/sec0/" in vs
    assert "https://www.site0.example/sec0/page0" in vs
    # scope: no foreign hosts without subdomains/tld/external
    assert not any("sub.site0" in u or "site0.alt" in u or "off-domain" in u for u in vs)
    # stressors: fragment stripped, query preserved, both slash-twins visited
    assert "https://www.site0.example/p?key=value&other=123" in vs
    assert "https://www.site0.example/sec0" in vs and "https://www.site0.example/sec0/" in vs
    # case-insensitive dedup: /MiXeD and /mixed → one entry, first-seen casing
    mixed = [u for u in res.visited if u.lower() == "https://www.site0.example/mixed"]
    assert len(mixed) == 1
    # ported host:port passes parent_host_match with port retry
    assert "https://www.site0.example:8080/ported" in vs
    # assets and hidden links never admitted
    assert not any("/assets/" in u or "/hidden" in u for u in vs)
    # every page row has golden text
    assert all(p["text"] is not None for p in res.pages)


def test_admitted_order_deterministic(corpus):
    a = crawl(corpus).admitted_order
    b = crawl(corpus).admitted_order
    assert a == b
    assert a[0] == (0, 0, "https://www.site0.example/")


def test_blacklist(corpus):
    cfg = CrawlConfig(blacklist=("https://www.site0.example/sec1/",))
    res = crawl(corpus, cfg)
    assert "https://www.site0.example/sec1/" not in res.visited_set
    assert "https://www.site0.example/sec0/" in res.visited_set


def test_whitelist(corpus):
    plain = crawl(corpus)
    wl = tuple(u for u in plain.visited if "/sec" not in u)
    res = crawl(corpus, CrawlConfig(whitelist=wl))
    assert res.visited_set <= {u.lower() for u in wl}


def test_budget_wildcard(corpus):
    res = crawl(corpus, CrawlConfig().with_limit(15))
    assert len(res.visited) == 15


def test_budget_path_prefix(corpus):
    res = crawl(corpus, CrawlConfig(budget=(("sec1", 3),)))
    sec1 = [u for u in res.visited if "/sec1" in u]
    # Reference quirk (website.rs:2093-2111): "/sec1/" yields segments
    # ["sec1", ""] whose cumulative joints are both "sec1" → the directory
    # page consumes TWO budget units; "/sec1/pageN" consumes one. Budget 3
    # therefore admits exactly 2 sec1-URLs.
    assert len(sec1) == 2
    assert "https://www.site0.example/sec1/" in sec1


def test_depth(corpus):
    res = crawl(corpus, CrawlConfig(depth=2))
    from spider_ray.semantics import path_segment_count

    assert all(path_segment_count(u) <= 2 for u in res.visited)
    # "/sec0/page0" = 2 segments → allowed; "/sec0/" = 2 (trailing empty) → allowed
    assert "https://www.site0.example/sec0/page0" in res.visited_set
    # a 3-segment path like /dup/only-b reached via /dup/b... /dup/only-b is 2 segs;
    # /missing/<idx> is 2 segs too — depth=1 variant pins the stricter case
    res1 = crawl(corpus, CrawlConfig(depth=1))
    assert all(path_segment_count(u) <= 1 for u in res1.visited)
    assert "https://www.site0.example/sec0" in res1.visited_set
    assert "https://www.site0.example/sec0/" not in res1.visited_set


def test_scope_combinations(corpus):
    plain = crawl(corpus).visited_set
    sub = crawl(corpus, CrawlConfig(subdomains=True)).visited_set
    tld = crawl(corpus, CrawlConfig(tld=True)).visited_set
    assert any("sub.site0.example" in u for u in sub)
    assert not any("site0.alt" in u for u in sub)
    assert any("site0.alt" in u for u in tld)
    assert any("sub.site0.example" in u for u in tld)
    assert plain <= sub and plain <= tld


def test_external_domains(corpus):
    res = crawl(corpus, CrawlConfig(external_domains=frozenset({"off-domain.example"})))
    assert "https://off-domain.example/x" in res.visited_set


def test_robots(corpus):
    res = crawl(corpus, CrawlConfig(respect_robots_txt=True))
    assert not any("/private/" in u for u in res.visited)
    assert "https://www.site0.example/public/open" in res.visited_set
    plain = crawl(corpus)
    assert any("/private/" in u for u in plain.visited)


def test_signature_dedup(corpus):
    res = crawl(corpus, CrawlConfig(normalize=True))
    vs = res.visited_set
    assert "https://www.site0.example/dup/a" in vs and "https://www.site0.example/dup/b" in vs
    only = sorted(u for u in vs if "/dup/only-" in u)
    # heap order pops /dup/b first (url desc tie-break) → only-b expanded, only-a not
    assert only == ["https://www.site0.example/dup/only-b"]
    dup_pages = [p for p in res.pages if p["url"].startswith("https://www.site0.example/dup/")]
    sigs = {p["url"]: p["signature"] for p in dup_pages if "/only-" not in p["url"]}
    assert len(set(sigs.values())) == 1  # identical signature


def test_politeness_multihost(corpus):
    seeds = [seed_of(k) for k in range(8)]
    res = crawl(corpus, CrawlConfig(delay_ms=100, round_robin=True), seeds=seeds)
    # per-host per-wave quota = ceil(1000/100) = 10
    from collections import Counter

    for wave in {w for w, _, _ in res.admitted_order}:
        if wave == 0:
            continue
        hosts = Counter(u.split("/")[2] for w, _, u in res.admitted_order if w == wave)
        assert all(v <= 10 for v in hosts.values()), (wave, hosts)
    # all hosts eventually crawled
    assert len({u.split("/")[2] for u in res.visited}) >= 8


def test_missing_pages_get_404(corpus):
    res = crawl(corpus)
    missing = [p for p in res.pages if "/missing/" in p["url"]]
    assert missing and all(p["status_code"] == 404 for p in missing)


def test_text_matches_golden(corpus):
    res = crawl(corpus)
    for p in res.pages:
        status, body = corpus.get(p["url"], (404, None, None))[:2]
        if body is None:
            assert p["text"] == ""


def test_sitemap_chain(corpus):
    res = crawl(corpus, CrawlConfig(ignore_sitemap=False))
    assert "https://www.site0.example/orphan/sm0" in res.visited_set
    plain = crawl(corpus)
    assert "https://www.site0.example/orphan/sm0" not in plain.visited_set
    # sitemap pages carry the sitemap wave and did not expand links
    sm_wave = max(w for w, _, _ in res.admitted_order)
    sm_pages = [u for w, _, u in res.admitted_order if w == sm_wave]
    assert "https://www.site0.example/orphan/sm0" in sm_pages


def test_parse_sitemap():
    from spider_ray.sources.sitemap import parse_sitemap

    urls, children = parse_sitemap(
        '<?xml version="1.0"?><urlset><url><loc>https://a/x</loc></url>'
        "<url><loc> https://a/y </loc></url></urlset>"
    )
    assert urls == ["https://a/x", "https://a/y"] and children == []
    urls, children = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://a/sm2.xml</loc></sitemap></sitemapindex>"
    )
    assert urls == [] and children == ["https://a/sm1.xml", "https://a/sm2.xml"]


def test_extra_links(corpus):
    res = crawl(corpus, CrawlConfig(extra_links=("https://www.site0.example/orphan/sm0",)))
    assert "https://www.site0.example/orphan/sm0" in res.visited_set


def test_queue_injection_budgetless(corpus):
    # queued links bypass the budget but not the rest (website.rs:7545-7560)
    orphan = "https://www.site0.example/orphan/sm0"

    def provider(wave):
        return [orphan] if wave == 1 else []

    limited = crawl(corpus, CrawlConfig().with_limit(3))
    assert orphan not in limited.visited_set
    res = crawl_oracle(
        CrawlJob((seed_of(0),), CrawlConfig().with_limit(3)), corpus, queue_provider=provider
    )
    assert orphan in res.visited_set  # admitted despite exhausted budget
    assert len([u for u in res.visited if "/orphan/" not in u]) == 3
