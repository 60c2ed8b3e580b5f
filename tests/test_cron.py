"""Cron re-crawl driver (website.rs:1131-1140 / 14689-14719 semantics):
schedule parsing, two scheduled cycles over a corpus that changes between
firings, and resumable cycle lineage."""

import tempfile

import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, seed_of, write_corpus_parquet
from spider_ray.pipelines.cron import CronRecrawler, CronSchedule


def test_cron_schedule_parse_and_next_fire():
    # every 5 seconds starting at second 1 (the reference doc example)
    s = CronSchedule.parse("1/5 * * * * *")
    # epoch 0 = Thu Jan 1 1970 00:00:00 UTC
    assert s.next_fire(0) == 1
    assert s.next_fire(1) == 6
    assert s.next_fire(6.2) == 11
    # explicit minute/hour pin
    daily = CronSchedule.parse("0 30 3 * * *")
    t = daily.next_fire(0)
    import time as _t

    st = _t.gmtime(t)
    assert (st.tm_hour, st.tm_min, st.tm_sec) == (3, 30, 0)
    # dow field: 0=Sunday; Jan 4 1970 was a Sunday
    sun = CronSchedule.parse("0 0 0 * * 0")
    st = _t.gmtime(sun.next_fire(0))
    assert st.tm_wday == 6  # python wday 6 == Sunday
    with pytest.raises(ValueError):
        CronSchedule.parse("* * * * *")  # 5 fields
    with pytest.raises(ValueError):
        CronSchedule.parse("99 * * * * *")


class FakeClock:
    def __init__(self, start=0.0):
        self.t = start

    def __call__(self):
        return self.t

    def sleep(self, dt):
        assert dt >= 0
        self.t += dt


def _mutated_corpus_rows():
    """Cycle-2 corpus: one leaf page's body changed, one page removed, one
    page added — exercising changed/unchanged/new/gone in a single diff."""
    rows = build_corpus(n_hosts=1, pages_per_host=20, stressors=False)
    removed_url = None
    out = []
    for r in rows:
        u = r["url"]
        if u.endswith("/sec0/page0"):
            r = dict(r)
            r["html"] = r["html"].replace(b"Content", b"Updated content")
            r["text"] = r["text"].replace("Content", "Updated content")
        if u.endswith("/sec1/page0"):
            removed_url = u
            continue
        out.append(r)
    assert removed_url is not None
    import datetime

    extra_html = b"<html><head><title>brand new</title></head><body><p>fresh page</p></body></html>"
    out.append(
        {
            "url": "https://www.site0.example/sec0/brand-new",
            "warc_ts": datetime.datetime(2020, 1, 2),
            "html": extra_html,
            "text": "fresh page",
            "lang": "en",
            "status": 200,
        }
    )
    return out


def test_cron_two_cycles_diff_and_lineage(ray_session, tmp_path):
    rows_v1 = build_corpus(n_hosts=1, pages_per_host=20, stressors=False)
    c1 = tempfile.mkdtemp(prefix="cron_c1_")
    write_corpus_parquet(rows_v1, c1, n_buckets=4)
    c2 = tempfile.mkdtemp(prefix="cron_c2_")
    write_corpus_parquet(_mutated_corpus_rows(), c2, n_buckets=4)
    # seed the corpus with a link to the new page so cycle 2 can reach it?
    # not needed: brand-new isn't linked, so it is NOT crawled — the "new"
    # class in cycle 2 comes from pages first seen then (none here), while
    # changed/unchanged/gone come from body edits and the removed leaf.

    clock = FakeClock(start=100.0)
    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=True))
    runner = CronRecrawler(
        job,
        c1,
        "0/10 * * * * *",
        state_dir=str(tmp_path / "cron_state"),
        clock=clock,
        sleeper=clock.sleep,
        corpus_provider=lambda cycle: c1 if cycle == 1 else c2,
    )
    cycles = runner.run(max_cycles=2)
    assert [c.cycle for c in cycles] == [1, 2]
    assert cycles[0].fired_at == 110  # next 0/10 boundary after t=100
    assert cycles[1].fired_at == 120
    # cycle 1: no prior checkpoint → every CONTENT page is new (visited
    # also counts synthesized 404s for ghost links, so new <= visited)
    assert 0 < cycles[0].new <= cycles[0].visited
    assert cycles[0].changed == cycles[0].gone == 0
    # cycle 2: one changed body, one page gone, rest unchanged
    d = dict(
        zip(
            cycles[1].diff.column("url").to_pylist(),
            cycles[1].diff.column("change").to_pylist(),
        )
    )
    assert d["https://www.site0.example/sec0/page0"] == "changed"
    assert d["https://www.site0.example/sec1/page0"] == "gone"
    assert cycles[1].unchanged > 0
    assert cycles[1].changed == 1 and cycles[1].gone == 1

    # lineage resumes: a NEW runner over the same state_dir continues at 3
    runner2 = CronRecrawler(
        job,
        c2,
        "0/10 * * * * *",
        state_dir=str(tmp_path / "cron_state"),
        clock=clock,
        sleeper=clock.sleep,
    )
    more = runner2.run(max_cycles=1)
    assert more[0].cycle == 3
    # same corpus as cycle 2 → everything unchanged
    assert more[0].changed == 0 and more[0].gone == 0 and more[0].new == 0


def test_cron_requires_signatures(tmp_path):
    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=False))
    with pytest.raises(ValueError):
        CronRecrawler(job, "/nope", "* * * * * *", state_dir=str(tmp_path / "s"))
