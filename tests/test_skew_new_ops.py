"""Skew tests for the round-3 op batch: degenerate key distributions must
stay LINEAR per group (the 100-TB failure mode is a hot group going
quadratic or a driver-side blowup, not a wrong answer at small scale)."""

from __future__ import annotations

import time

import pyarrow as pa


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_line_dedup_hot_line_stays_linear(ray_session, tmp_path):
    """One nav line shared by 5k pages: the losers group emits 5k-1 drop
    rows (linear), never a pairwise expansion; rebuild stays per-page."""
    import pyarrow.parquet as pq

    from spider_ray.ops.linededup import global_line_dedup

    n = 5000
    t = pa.table(
        {
            "url": [f"http://h/{i:05d}" for i in range(n)],
            "text": [f"shared nav line\nunique body {i}" for i in range(n)],
        }
    )
    pq.write_table(t, tmp_path / "p.parquet")
    t0 = time.perf_counter()
    out = global_line_dedup(str(tmp_path)).take_all()
    wall = time.perf_counter() - t0
    assert len(out) == n
    removed = sum(r["n_removed"] for r in out)
    assert removed == n - 1  # every copy but the (url,idx)-minimum drops
    first = min(out, key=lambda r: r["url"])
    assert first["clean_text"].startswith("shared nav line")
    # linear budget: a quadratic group (25M pairs) would not finish in this
    # envelope on 4 CPUs
    assert wall < 60, wall


def test_interval_join_hot_bucket_stays_linear(ray_session):
    """All windows and points collapse into ONE epoch bucket: the group
    resolves via sort + two searchsorted passes, not |w|x|p| pairing."""
    from spider_ray.ops.intervals import interval_join_counts

    us = 1_000_000
    rows = []
    for i in range(2000):
        rows.append(
            {"event_id": i, "ts": i * us, "event_type": "signup",
             "value": 0.0, "user_id": 1}
        )
    for i in range(2000):
        rows.append(
            {"event_id": 10_000 + i, "ts": i * us, "event_type": "purchase",
             "value": 1.0, "user_id": 1}
        )
    t0 = time.perf_counter()
    out = interval_join_counts(_ds(rows), window_s=3600).take_all()
    wall = time.perf_counter() - t0
    assert len(out) == 2000
    # window starting at t counts purchases in [t, t+3600): all 2000 - t
    by_id = {r["event_id"]: r["n_points"] for r in out}
    assert by_id[0] == 2000 and by_id[1999] == 1
    assert wall < 30, wall


def test_source_mix_hot_source_no_driver_state(ray_session):
    """A single source holding every row: expansion is per-batch np.repeat
    (no per-source grouping anywhere), so a 100%-skewed source costs the
    same as a uniform one."""
    from spider_ray.ops.sampling import source_mix

    rows = [{"doc_id": i, "source": "only"} for i in range(50_000)]
    t0 = time.perf_counter()
    n = source_mix(_ds(rows), {"only": 200}).count()
    wall = time.perf_counter() - t0
    assert n == 100_000
    assert wall < 30, wall
