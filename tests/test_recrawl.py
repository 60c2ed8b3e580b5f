"""Incremental re-crawl diff + retry-status classifier."""

import tempfile

import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, seed_of, write_corpus_parquet


def test_retry_classifiers():
    from spider_ray.functions.retry import (
        backoff_delay_ms,
        is_permanent_target_failure,
        is_retryable_status,
    )

    # page.rs:1641-1653 semantics
    assert is_retryable_status(500)
    assert is_retryable_status(503)
    assert is_retryable_status(429)
    assert is_retryable_status(408)
    assert not is_retryable_status(200)
    assert not is_retryable_status(404)
    assert not is_retryable_status(501)
    assert not is_retryable_status(505)
    assert not is_retryable_status(511)
    assert not is_retryable_status(525)  # DNS
    assert not is_retryable_status(526)  # unreachable
    assert not is_retryable_status(310)  # redirect cap
    assert is_permanent_target_failure(525)
    assert is_permanent_target_failure(310)
    assert not is_permanent_target_failure(500)
    import random

    rng = random.Random(7)
    for attempt in range(8):
        d = backoff_delay_ms(attempt, rng=rng)
        assert 0 <= d <= min(60_000, 1_000 * 2**attempt)


def test_recrawl_diff(ray_session):
    from spider_ray.pipelines.crawl import RayCrawler
    from spider_ray.pipelines.recrawl import recrawl

    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=True))

    rows_v1 = build_corpus(n_hosts=2, pages_per_host=30, seed=42)
    cdir1 = tempfile.mkdtemp(prefix="spider_rc1_")
    write_corpus_parquet(rows_v1, cdir1, n_buckets=4)
    prior = RayCrawler(job, cdir1).run().pages_table()

    # v2 corpus: mutate one page's body, drop one page, add nothing
    mutated = "https://www.site0.example/sec0/page0"
    dropped = "https://www.site0.example/sec0/page1"
    rows_v2 = []
    for r in rows_v1:
        if r["url"] == dropped:
            continue
        if r["url"] == mutated:
            r = dict(r)
            r["html"] = r["html"].replace(b"Paragraph 0", b"Paragraph ZERO-CHANGED")
        rows_v2.append(r)
    cdir2 = tempfile.mkdtemp(prefix="spider_rc2_")
    write_corpus_parquet(rows_v2, cdir2, n_buckets=4)

    res2, diff_ds, gone = recrawl(job, cdir2, prior)
    diff = dict(
        zip(
            diff_ds.to_pandas()["url"],
            diff_ds.to_pandas()["change"],
        )
    )
    assert diff[mutated] == "changed"
    # dropped page is now a 404 (fetched but signature of empty html) or gone
    unchanged = [u for u, c in diff.items() if c == "unchanged"]
    assert len(unchanged) > 10
    # the dropped page either shows as changed-404 or as gone
    assert diff.get(dropped) == "changed" or dropped in gone
