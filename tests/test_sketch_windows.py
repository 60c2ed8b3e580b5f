"""Unit tests for the KMV distinct sketch and the rolling row-window op."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_kmv_exact_below_k(ray_session):
    from spider_ray.ops.sketch import kmv_distinct

    rows = [{"event_type": "a", "user_id": i % 10} for i in range(100)]
    out = kmv_distinct(_ds(rows), group_col="event_type", key_col="user_id", k=64).take_all()
    assert out == [{"event_type": "a", "n_distinct_est": 10}]


def test_kmv_estimate_accuracy_above_k(ray_session):
    """At 5000 distinct keys with k=64 the KMV relative error is ~1/sqrt(k)
    ~= 12.5%; accept 3 sigma."""
    from spider_ray.ops.sketch import kmv_distinct

    rows = [{"event_type": "a", "user_id": i * 7 + 1} for i in range(5000)]
    out = kmv_distinct(_ds(rows), group_col="event_type", key_col="user_id", k=64).take_all()
    est = out[0]["n_distinct_est"]
    assert abs(est - 5000) / 5000 < 0.375, est


def test_kmv_merge_order_invariant(ray_session):
    """The estimate must not depend on batch/block boundaries."""
    from spider_ray.ops.sketch import kmv_distinct

    rows = [{"event_type": "a", "user_id": i} for i in range(1000)]
    a = kmv_distinct(_ds(rows), "event_type", "user_id", k=32).take_all()
    b = kmv_distinct(
        _ds(rows).repartition(7), "event_type", "user_id", k=32
    ).take_all()
    assert a == b


def test_rolling_user_sums_frame_and_ties(ray_session):
    """Frame = last 3 rows inclusive, ordering (ts, event_id) breaks ties."""
    from spider_ray.ops.windows import rolling_user_sums

    ts = pa.array([1000, 1000, 2000, 3000], pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array([2, 1, 3, 4], pa.int64()),
            "user_id": pa.array([5, 5, 5, 5], pa.int64()),
            "ts": ts,
            "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
        }
    )
    import ray.data

    out = rolling_user_sums(ray.data.from_arrow(tbl), window_rows=3).take_all()
    got = {r["event_id"]: r["roll_cents"] for r in out}
    # order: eid 1 (200), eid 2 (100), eid 3 (400), eid 4 (800)
    assert got == {1: 200, 2: 300, 3: 700, 4: 1300}


def test_concurrent_sessions_overlap_counting(ray_session):
    """A session spanning two windows counts in both; single-window
    sessions count once."""
    from spider_ray.ops.windows import concurrent_sessions

    us = 1_000_000
    rows = [
        # user 1: one session 10:30 -> 11:10 (spans hours 10 and 11)
        {"event_id": 1, "user_id": 1, "ts": 37800 * us, "value": 0.0},
        {"event_id": 2, "user_id": 1, "ts": 40200 * us, "value": 0.0},
        # user 2: one session entirely inside hour 10
        {"event_id": 3, "user_id": 2, "ts": 36100 * us, "value": 0.0},
    ]
    import pyarrow as pa
    import ray.data

    tbl = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
        }
    )
    out = {r["window_start"]: r["n_sessions"]
           for r in concurrent_sessions(ray.data.from_arrow(tbl)).take_all()}
    assert out == {36000: 2, 39600: 1}


def test_sliding_window_counts_overlap(ray_session):
    """width=4, step=1: each event lands in exactly 4 windows; counts at
    a window = events within [start, start+4)."""
    import pyarrow as pa
    import ray.data

    from spider_ray.ops.windows import sliding_window_counts

    us = 1_000_000
    tbl = pa.table(
        {
            "ts": pa.array([10 * us, 11 * us], pa.timestamp("us")),
            "event_type": pa.array(["a", "a"], pa.string()),
        }
    )
    out = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in sliding_window_counts(ray.data.from_arrow(tbl), width_s=4, step_s=1).take_all()}
    assert out == {(7, "a"): 1, (8, "a"): 2, (9, "a"): 2, (10, "a"): 2, (11, "a"): 1}
