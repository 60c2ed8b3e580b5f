"""Randomized engine-vs-oracle parity: seeded random configs over a seeded
random corpus — catches semantic drift the curated scenarios might miss."""

import random
import tempfile

import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, corpus_as_dict, seed_of, write_corpus_parquet
from spider_ray.oracle import crawl_oracle


def random_config(rng: random.Random) -> CrawlConfig:
    cfg = CrawlConfig(
        subdomains=rng.random() < 0.3,
        tld=rng.random() < 0.3,
        respect_robots_txt=rng.random() < 0.4,
        delay_ms=rng.choice([0, 0, 0, 100, 250]),
        depth=rng.choice([25, 25, 2, 3]),
        normalize=rng.random() < 0.5,
        full_resources=rng.random() < 0.2,
        round_robin=rng.random() < 0.3,
        ignore_sitemap=rng.random() < 0.7,
        external_domains=frozenset({"off-domain.example"}) if rng.random() < 0.3 else frozenset(),
        # round-2 knobs: redirects, content gates, filters, retry
        redirect_policy=rng.choice(["loose", "loose", "strict", "none"]),
        redirect_limit=rng.choice([7, 7, 1, 2]),
        only_html=rng.random() < 0.8,
        max_page_bytes=rng.choice([0, 0, 0, 512, 2048]),
        retry=rng.choice([0, 0, 1, 2]),
        filter_mode=rng.choice(["exact", "regex"]),
    )
    if rng.random() < 0.25:
        pat = (
            (r"sec1/page[0-3]\.html",)
            if cfg.filter_mode == "regex"
            else (f"{seed_of(0)}sec1/page1.html",)
        )
        cfg = CrawlConfig(**{**cfg.__dict__, "blacklist": pat})
    if rng.random() < 0.15:
        pat = (r"site[0-9]\.example/(sec[01]|dup|missing|orphan|$)",) \
            if cfg.filter_mode == "regex" else ()
        if pat:
            cfg = CrawlConfig(**{**cfg.__dict__, "whitelist": pat})
    if rng.random() < 0.2:
        from spider_ray.functions.hooks import rewrite_dup_a_to_leaf

        cfg = CrawlConfig(**{**cfg.__dict__, "on_link_find": rewrite_dup_a_to_leaf})
    if rng.random() < 0.2:
        from spider_ray.functions.hooks import skip_section3

        cfg = CrawlConfig(**{**cfg.__dict__, "on_should_crawl": skip_section3})
    if rng.random() < 0.2:
        cfg = CrawlConfig(
            **{**cfg.__dict__, "extra_links": (f"{seed_of(1)}sec0/page1.html",)}
        )
    if rng.random() < 0.4:
        cfg = cfg.with_limit(rng.randint(5, 60))
    if rng.random() < 0.3:
        budget = dict(cfg.budget or ())
        budget[f"sec{rng.randint(0, 2)}"] = rng.randint(1, 8)
        cfg = CrawlConfig(**{**cfg.__dict__, "budget": tuple(budget.items())})
    return cfg


@pytest.fixture(scope="module")
def fuzz_env(ray_session):
    rows = build_corpus(n_hosts=6, pages_per_host=40, seed=777)
    cdir = tempfile.mkdtemp(prefix="spider_fuzz_")
    write_corpus_parquet(rows, cdir, n_buckets=8)
    return corpus_as_dict(rows), cdir


@pytest.mark.parametrize("trial", range(16))
def test_fuzz_parity(fuzz_env, trial):
    from spider_ray.pipelines.crawl import crawl

    corpus, cdir = fuzz_env
    rng = random.Random(1000 + trial)
    cfg = random_config(rng)
    n_seeds = rng.choice([1, 1, 2, 4])
    job = CrawlJob(tuple(seed_of(k) for k in range(n_seeds)), cfg)

    o = crawl_oracle(job, corpus)
    e = crawl(job, cdir)
    assert e.visited_set == o.visited_set, cfg
    assert e.admitted_order == o.admitted_order, cfg

    tbl = e.pages_table()
    if tbl is not None:
        texts = dict(zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist()))
        for p in o.pages:
            assert texts.get(p["url"]) == p["text"], (cfg, p["url"])
