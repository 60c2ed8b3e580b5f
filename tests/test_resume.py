"""Checkpoint/resume: kill the crawl after wave k, resume from checkpoint,
and verify the combined outputs equal an uninterrupted run (BASELINE.md
resumability gate)."""

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
    write_corpus_parquet(rows, cdir)
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


def test_kill_and_resume_matches_uninterrupted(env):
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=True))

    # uninterrupted reference run
    full_out = tempfile.mkdtemp(prefix="spider_full_out_")
    full = RayCrawler(job, cdir, out_dir=full_out).run()

    # killed-at-wave-1 run: monkeypatch the checkpoint hook to raise after wave 1
    out = tempfile.mkdtemp(prefix="spider_kill_out_")
    ckpt = tempfile.mkdtemp(prefix="spider_ckpt_")
    crawler = RayCrawler(job, cdir, out_dir=out, ckpt_dir=ckpt)
    orig = crawler._ckpt_wave

    def bomb(wave, *a, **kw):
        orig(wave, *a, **kw)
        if wave >= 1:
            raise _KillAfterWave()

    crawler._ckpt_wave = bomb
    with pytest.raises(_KillAfterWave):
        crawler.run()

    # resume from checkpoint
    resumed = RayCrawler(job, cdir, out_dir=out, ckpt_dir=ckpt).run(resume=True)

    # final URL-seen set identical to uninterrupted run
    assert resumed.seen_keys == full.seen_keys

    # pages on disk (pre-kill waves + resumed waves) identical: same url set,
    # byte-identical text, same wave lineage
    full_pages = _pages_urls(full_out)
    resumed_pages = _pages_urls(out)
    assert full_pages == resumed_pages

    # admitted order of resumed waves continues the uninterrupted order
    full_tail = [(w, s, u) for (w, s, u) in full.admitted_order if w >= 2]
    assert resumed.admitted_order == full_tail


def test_checkpoint_lineage_files(env):
    from spider_ray.pipelines.crawl import RayCrawler

    corpus, cdir = env
    job = CrawlJob((seed_of(0),), CrawlConfig())
    ckpt = tempfile.mkdtemp(prefix="spider_ckpt2_")
    RayCrawler(job, cdir, ckpt_dir=ckpt, keep_pages=False).run()
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))
    waves = sorted(glob.glob(os.path.join(ckpt, "wave_*")))
    assert waves
    for w in waves:
        assert os.path.exists(os.path.join(w, "frontier.parquet"))
        assert os.path.exists(os.path.join(w, "budget.json"))
        shards = glob.glob(os.path.join(w, "seen", "shard_*.parquet"))
        assert shards  # per-partition seen lineage
    # seen increments carry wave lineage and union to the visited set
    seen_urls = set()
    for f in glob.glob(os.path.join(ckpt, "wave_*", "seen", "*.parquet")):
        seen_urls.update(pq.read_table(f).column("url_norm").to_pylist())
    from spider_ray.oracle import crawl_oracle

    assert seen_urls == crawl_oracle(job, corpus).visited_set
