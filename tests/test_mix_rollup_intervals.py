"""Edge-semantics tests for the round-3 batch of relational/curation ops:
interval_join_counts (bucket-boundary spanning, LEFT semantics),
events_rollup (grouping-set levels), source_mix (exact epoch weights),
global_line_dedup (all-dropped page -> NULL, empty lines kept).
"""

from __future__ import annotations

import pyarrow as pa


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


_US = 1_000_000


def _ev(eid, ts_s, etype, value=0.0, user=1):
    return {
        "event_id": eid,
        "ts": ts_s * _US,  # int64 castable like timestamp[us]
        "event_type": etype,
        "value": value,
        "user_id": user,
    }


def test_interval_join_spans_bucket_boundary(ray_session):
    """A window starting 10 s before a bucket edge must count points on
    BOTH sides of the edge exactly once."""
    from spider_ray.ops.intervals import interval_join_counts

    w = 3600
    rows = [
        _ev(1, 2 * w - 10, "signup"),
        _ev(2, 2 * w - 5, "purchase", 1.0),   # same bucket as window start
        _ev(3, 2 * w + 5, "purchase", 2.0),   # next bucket, inside window
        _ev(4, 3 * w - 11, "purchase", 4.0),  # inside window (ends 3w-10)
        _ev(5, 3 * w - 10, "purchase", 8.0),  # exactly at end: excluded
        _ev(6, 2 * w - 11, "purchase", 16.0),  # before start: excluded
    ]
    out = interval_join_counts(_ds(rows), window_s=w).take_all()
    assert out == [
        {
            "event_id": 1,
            "window_start_us": (2 * w - 10) * _US,
            "n_points": 3,
            "point_cents": 700,
        }
    ]


def test_interval_join_left_semantics_zero_match(ray_session):
    from spider_ray.ops.intervals import interval_join_counts

    rows = [_ev(1, 100, "signup"), _ev(2, 999_999, "purchase", 5.0)]
    out = interval_join_counts(_ds(rows), window_s=3600).take_all()
    assert out == [
        {"event_id": 1, "window_start_us": 100 * _US, "n_points": 0, "point_cents": 0}
    ]


def test_events_rollup_levels(ray_session):
    from spider_ray.ops.relational import events_rollup

    day = 86400
    rows = [
        _ev(1, 10, "a", 1.0),
        _ev(2, 20, "b", 2.0),
        _ev(3, day + 30, "a", 4.0),
    ]
    out = sorted(
        events_rollup(_ds(rows)).take_all(),
        key=lambda r: (r["day_s"] is None, r["day_s"] or 0, r["event_type"] is None,
                       r["event_type"] or ""),
    )
    assert out == [
        {"day_s": 0, "event_type": "a", "n_events": 1, "value_cents": 100},
        {"day_s": 0, "event_type": "b", "n_events": 1, "value_cents": 200},
        {"day_s": 0, "event_type": None, "n_events": 2, "value_cents": 300},
        {"day_s": day, "event_type": "a", "n_events": 1, "value_cents": 400},
        {"day_s": day, "event_type": None, "n_events": 1, "value_cents": 400},
        {"day_s": None, "event_type": None, "n_events": 3, "value_cents": 700},
    ]


def test_source_mix_integer_epochs(ray_session):
    """Weight 300 = exactly 3 copies of every doc; weight 0 = dropped."""
    from spider_ray.ops.sampling import source_mix

    rows = [{"doc_id": i, "source": "a" if i % 2 else "z"} for i in range(10)]
    out = source_mix(_ds(rows), {"a": 300, "z": 0}).take_all()
    assert all(r["source"] == "a" for r in out)
    assert len(out) == 15  # 5 docs x 3 copies
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_id"])
    assert all(sorted(v) == [0, 1, 2] for v in by_doc.values())


def test_source_mix_fractional_rate(ray_session):
    """Weight 150: every doc once, a deterministic ~half twice."""
    from spider_ray.ops.sampling import source_mix

    rows = [{"doc_id": i, "source": "a"} for i in range(1000)]
    out = source_mix(_ds(rows), {"a": 150}).take_all()
    n = len(out)
    assert 1000 < n < 2000 and abs(n - 1500) < 100, n
    again = source_mix(_ds(rows), {"a": 150}).take_all()
    assert sorted(map(tuple, (r.values() for r in out))) == sorted(
        map(tuple, (r.values() for r in again))
    )


def test_line_dedup_all_dropped_and_empty_lines(ray_session, tmp_path):
    """A page whose every line is a later duplicate gets NULL clean_text;
    empty lines are always kept."""
    import pyarrow.parquet as pq

    from spider_ray.ops.linededup import global_line_dedup

    t = pa.table(
        {
            "url": ["http://a/1", "http://a/2", "http://a/3"],
            "text": ["nav\nbody", "nav\nbody", "nav\n\nunique"],
        }
    )
    pq.write_table(t, tmp_path / "p.parquet")
    out = {r["url"]: r for r in global_line_dedup(str(tmp_path)).take_all()}
    assert out["http://a/1"]["clean_text"] == "nav\nbody"
    assert out["http://a/1"]["n_removed"] == 0
    assert out["http://a/2"]["clean_text"] is None
    assert out["http://a/2"]["n_removed"] == 2
    # empty middle line survives even though it repeats nowhere
    assert out["http://a/3"]["clean_text"] == "\nunique"
    assert out["http://a/3"]["n_removed"] == 1
