"""Checkpoint/resume: kill the crawl after wave k, resume from checkpoint,
and verify the combined outputs equal an uninterrupted run (BASELINE.md
resumability gate).  Covers BOTH wave executors: the vectorized fast path
(simple configs) and the ordered fold (budget/politeness configs)."""

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, corpus_as_dict, seed_of, write_corpus_parquet


@pytest.fixture(scope="module")
def env(ray_session):
    rows = build_corpus()
    cdir = tempfile.mkdtemp(prefix="spider_corpus_")
    write_corpus_parquet(rows, cdir, n_buckets=8)
    return corpus_as_dict(rows), cdir


class _KillAfterWave(Exception):
    pass


def _pages_urls(out_dir):
    urls = {}
    for f in glob.glob(os.path.join(out_dir, "wave_*", "*.parquet")):
        t = pq.read_table(f, columns=["url", "text", "wave"])
        for u, x, w in zip(
            t.column("url").to_pylist(), t.column("text").to_pylist(), t.column("wave").to_pylist()
        ):
            urls[u] = (x, w)
    return urls


def _run_kill_resume(env, config, kill_wave=1):
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), config)

    full_out = tempfile.mkdtemp(prefix="spider_full_out_")
    full = RayCrawler(job, cdir, out_dir=full_out, collect_seen=True).run()

    out = tempfile.mkdtemp(prefix="spider_kill_out_")
    ckpt = tempfile.mkdtemp(prefix="spider_ckpt_")
    crawler = RayCrawler(job, cdir, out_dir=out, ckpt_dir=ckpt)
    orig_slow, orig_fast = crawler._ckpt_wave, crawler._ckpt_wave_fast

    def bomb_slow(wave, *a, **kw):
        orig_slow(wave, *a, **kw)
        if wave >= kill_wave:
            raise _KillAfterWave()

    def bomb_fast(wave, *a, **kw):
        orig_fast(wave, *a, **kw)
        if wave >= kill_wave:
            raise _KillAfterWave()

    crawler._ckpt_wave = bomb_slow
    crawler._ckpt_wave_fast = bomb_fast
    with pytest.raises(_KillAfterWave):
        crawler.run()

    resumed = RayCrawler(job, cdir, out_dir=out, ckpt_dir=ckpt, collect_seen=True).run(resume=True)
    return full, full_out, resumed, out, ckpt, job


def test_kill_and_resume_fast_path(env):
    """normalize-only config → vectorized fast wave executor with ckpt."""
    full, full_out, resumed, out, ckpt, job = _run_kill_resume(env, CrawlConfig(normalize=True))
    assert resumed.seen_keys == full.seen_keys
    assert _pages_urls(full_out) == _pages_urls(out)
    full_tail = [(w, s, u) for (w, s, u) in full.admitted_order if w >= 2]
    assert resumed.admitted_order == full_tail


def test_kill_and_resume_slow_path(env):
    """budget config → ordered-fold executor with ckpt."""
    full, full_out, resumed, out, ckpt, job = _run_kill_resume(
        env, CrawlConfig(budget=(("sec0", 5),)).with_limit(60)
    )
    assert resumed.seen_keys == full.seen_keys
    assert _pages_urls(full_out) == _pages_urls(out)


def test_double_resume_preserves_lineage(env):
    """Resuming must not rewrite the restored wave's seen increments — a
    second resume still reconstructs the full seen set."""
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    full, full_out, resumed, out, ckpt, job = _run_kill_resume(env, CrawlConfig(normalize=True))
    again = RayCrawler(job, cdir, ckpt_dir=ckpt, keep_pages=False).run(resume=True)
    # checkpointed seen lineage (all waves) still unions to the full set
    seen_urls = set()
    for f in glob.glob(os.path.join(ckpt, "wave_*", "seen", "*.parquet")):
        seen_urls.update(pq.read_table(f).column("url_norm").to_pylist())
    assert seen_urls == full.seen_keys


def test_checkpoint_lineage_files(env):
    from spider_ray.oracle import crawl_oracle
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), CrawlConfig(delay_ms=50))  # slow path
    ckpt = tempfile.mkdtemp(prefix="spider_ckpt2_")
    RayCrawler(job, cdir, ckpt_dir=ckpt, keep_pages=False).run()
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))
    waves = sorted(glob.glob(os.path.join(ckpt, "wave_*")))
    assert waves
    for w in waves:
        assert os.path.exists(os.path.join(w, "frontier.parquet"))
        assert os.path.exists(os.path.join(w, "budget.json"))
        assert glob.glob(os.path.join(w, "seen", "shard_*.parquet"))
    seen_urls = set()
    for f in glob.glob(os.path.join(ckpt, "wave_*", "seen", "*.parquet")):
        seen_urls.update(pq.read_table(f).column("url_norm").to_pylist())
    assert seen_urls == crawl_oracle(job, corpus).visited_set

@pytest.mark.parametrize("trial", range(4))
def test_fuzz_kill_resume(env, trial):
    """Randomized configs through the kill-at-wave-k + resume gate (reuses
    the fuzz config generator; both executors get exercised depending on
    whether the drawn config is simple)."""
    import random
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_fuzz_parity import random_config

    rng = random.Random(4200 + trial)
    cfg = random_config(rng)
    # hooks/queue don't affect resume mechanics but sitemap chain does; keep
    # the drawn config as-is except force some output to exist
    full, full_out, resumed, out, ckpt, job = _run_kill_resume(
        env, cfg, kill_wave=rng.choice([0, 1, 2])
    )
    assert resumed.seen_keys == full.seen_keys, cfg
    assert _pages_urls(out) == _pages_urls(full_out), cfg
