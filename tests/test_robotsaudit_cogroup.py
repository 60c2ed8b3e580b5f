"""Sharded robots-audit tier (VERDICT r3 #2): the forced-cogroup path —
one hash(host) shuffle co-locating each host's rules with its pages —
must produce exactly the broadcast path's per-host counts."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")


def _canon(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_cogroup_matches_broadcast(ray_session):
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.robotsaudit import robots_audit

    corpus = ensure_scale("sf0.001")
    a = _canon(robots_audit(corpus, mode="broadcast"))
    b = _canon(robots_audit(corpus, mode="cogroup"))
    assert len(a) and len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_auto_switches_on_host_count(ray_session, monkeypatch):
    """auto with a 0 threshold must route through the cogroup tier —
    proven by forbidding the broadcast dict's ray.put of a dict."""
    import ray

    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.robotsaudit import robots_audit

    corpus = ensure_scale("sf0.001")
    want = _canon(robots_audit(corpus, mode="broadcast"))

    orig_put = ray.put

    def guard_put(obj, *a, **k):
        assert not isinstance(obj, dict), "broadcast dict put in cogroup mode"
        return orig_put(obj, *a, **k)

    monkeypatch.setattr(ray, "put", guard_put)
    got = _canon(robots_audit(corpus, mode="auto", broadcast_max_hosts=0))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_multi_scheme_robots_deterministic_winner(ray_session, tmp_path):
    """A host with robots.txt under BOTH http and https must audit with a
    pinned winner (min by (url, status, body) — http sorts first), the
    same in both tiers and run-to-run (ADVICE r4: last-write-wins over
    shuffle order was nondeterministic)."""
    import datetime as dt

    from spider_ray.fixtures import write_corpus_parquet
    from spider_ray.ops.robotsaudit import robots_audit

    ts = dt.datetime(2026, 1, 1)
    host = "www.site0.example"
    # http robots disallows /blocked/, https robots allows everything:
    # the pinned winner is the http row ("http://..." < "https://...")
    rows = [
        {"url": f"http://{host}/robots.txt", "warc_ts": ts,
         "html": b"User-agent: *\nDisallow: /blocked/\n",
         "text": "", "lang": "en", "status": 200},
        {"url": f"https://{host}/robots.txt", "warc_ts": ts,
         "html": b"User-agent: *\nAllow: /\n",
         "text": "", "lang": "en", "status": 200},
        {"url": f"https://{host}/blocked/a", "warc_ts": ts,
         "html": b"<p>a</p>", "text": "a", "lang": "en", "status": 200},
        {"url": f"https://{host}/open/b", "warc_ts": ts,
         "html": b"<p>b</p>", "text": "b", "lang": "en", "status": 200},
    ]
    cdir = str(tmp_path / "corpus")
    write_corpus_parquet(rows, cdir, n_buckets=2)

    runs = [
        _canon(robots_audit(cdir, mode=m))
        for m in ("broadcast", "cogroup", "broadcast", "cogroup")
    ]
    for r in runs[1:]:
        pd.testing.assert_frame_equal(runs[0], r, check_dtype=False,
                                      check_exact=True)
    row = runs[0].set_index("host").loc[host]
    assert int(row["n_pages"]) == 2
    assert int(row["n_disallowed"]) == 1  # the http rules won
