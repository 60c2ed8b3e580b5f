"""Pause / resume / shutdown control (§2.10, handle_process website.rs:7891):
shutdown at a wave barrier keeps everything collected so far and leaves a
resumable checkpoint; pause blocks the crawl until resumed."""

import tempfile
import threading
import time

import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, corpus_as_dict, seed_of, write_corpus_parquet
from spider_ray.oracle import crawl_oracle
from spider_ray.state.control import CrawlControl


@pytest.fixture(scope="module")
def env(ray_session):
    rows = build_corpus()
    corpus = corpus_as_dict(rows)
    cdir = tempfile.mkdtemp(prefix="spider_corpus_")
    write_corpus_parquet(rows, cdir)
    return corpus, cdir


@pytest.mark.parametrize("config", [CrawlConfig(normalize=True), CrawlConfig().with_limit(60)])
def test_shutdown_then_resume_completes(env, config):
    """Programmed shutdown after wave 1 → stopped result with only waves
    ≤1; resuming from the checkpoint yields the full crawl's remainder."""
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), config)
    full = RayCrawler(job, cdir, keep_pages=False, collect_seen=True).run()

    ckpt = tempfile.mkdtemp(prefix="spider_ctl_ckpt_")
    ctl = CrawlControl()
    ctl.shutdown_at_wave(1)
    partial = RayCrawler(job, cdir, ckpt_dir=ckpt, keep_pages=False, control=ctl).run()
    assert partial.stopped
    assert max(w for w, _, _ in partial.admitted_order) == 1
    head = [(w, s, u) for (w, s, u) in full.admitted_order if w <= 1]
    assert partial.admitted_order == head

    resumed = RayCrawler(job, cdir, ckpt_dir=ckpt, keep_pages=False, collect_seen=True).run(resume=True)
    assert not resumed.stopped
    tail = [(w, s, u) for (w, s, u) in full.admitted_order if w >= 2]
    assert resumed.admitted_order == tail
    assert resumed.seen_keys == full.seen_keys


def test_pause_blocks_until_resume(env):
    """pause() suspends the crawl at the next wave barrier; resume() lets it
    finish with a result identical to the uncontrolled run."""
    from spider_ray.pipelines.crawl import crawl, RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=True))
    o = crawl_oracle(job, corpus)

    ctl = CrawlControl()
    ctl.pause()
    box = {}

    def work():
        box["res"] = RayCrawler(job, cdir, keep_pages=False, control=ctl).run()

    t = threading.Thread(target=work)
    t.start()
    t.join(timeout=8)
    assert t.is_alive(), "crawl must be blocked at the first wave barrier"
    ctl.resume()
    t.join(timeout=120)
    assert not t.is_alive()
    res = box["res"]
    assert not res.stopped
    assert res.visited_set == o.visited_set
    assert res.admitted_order == o.admitted_order


def test_shutdown_mid_pause(env):
    """shutdown() while paused releases the barrier into a stopped result."""
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=True))
    ctl = CrawlControl()
    ctl.pause()
    box = {}

    def work():
        box["res"] = RayCrawler(job, cdir, keep_pages=False, control=ctl).run()

    t = threading.Thread(target=work)
    t.start()
    time.sleep(1.0)
    ctl.shutdown()
    t.join(timeout=120)
    assert not t.is_alive()
    assert box["res"].stopped
