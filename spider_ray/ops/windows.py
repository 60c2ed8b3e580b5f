"""Windowed aggregates over event streams: tumbling-window rollups and
gap-based sessionization.

The reference engine has no windowed operators (it is a crawler), but a
training-data pipeline over crawl/event logs needs them; both are expressed
Ray-Data-first:

* **Tumbling windows** — pure ``map_batches`` bucketing (epoch-floor to the
  window width, Arrow kernels) + per-batch combiner, then ONE
  ``groupby(window, key)`` shuffle of already-partial aggregates.  Value
  sums are integer cents (``round(value*100) -> int64``) so distributed
  summation order cannot perturb the result — float determinism is part of
  the op spec, as with ``ops/linkgraph`` PageRank.
* **Sessionization** — ``groupby(user_id).map_groups``: each user's events
  sort by ``(ts, event_id)`` inside the group and break into sessions at
  gaps > ``gap``.  Partitioning assumption (documented): one user's events
  fit in one group (event-log skew is bounded per user; a hot user at
  10⁹ events would need day-salting + session stitching at the salt
  boundaries).  Timestamps flow as int64 epoch-microseconds end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_counts(events, width_s: int = 3600):
    """``(window_start, event_type, n_events, sum_value_cents)`` — one row
    per (tumbling window, type); ``window_start`` = epoch seconds floored to
    ``width_s``."""

    def bucket(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.floor(pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), 1_000_000 * width_s
        )), pa.int64())
        win = pc.multiply(epoch, width_s)
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64())
        t = pa.table(
            {
                "window_start": win,
                "event_type": batch.column("event_type"),
                "n_events": pa.nulls(len(batch), pa.int64()).fill_null(1),
                "sum_value_cents": cents,
            }
        )
        # per-batch combiner: the shuffle moves (window, type) partials only
        return t.group_by(["window_start", "event_type"]).aggregate(
            [("n_events", "sum"), ("sum_value_cents", "sum")]
        ).rename_columns(["window_start", "event_type", "n_events", "sum_value_cents"])

    partial = events.map_batches(bucket, batch_format="pyarrow")
    agg = partial.groupby(["window_start", "event_type"]).sum(
        ["n_events", "sum_value_cents"]
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start": b.column("window_start"),
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("sum(n_events)"), pa.int64()),
                "sum_value_cents": pc.cast(b.column("sum(sum_value_cents)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sessionize(events, gap_s: int = 1800):
    """``(user_id, session_id, n_events, start_us, end_us)`` — sessions are
    maximal runs of a user's events with inter-event gaps <= ``gap_s``;
    ``session_id`` is 0-based per user in time order."""
    gap_us = gap_s * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        brk = np.empty(len(ts), dtype=np.int64)
        brk[0] = 0
        brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        starts = np.flatnonzero(np.concatenate(([1], brk[1:])))
        ends = np.concatenate((starts[1:], [len(ts)]))
        user = group.column("user_id")[0].as_py()
        return pa.table(
            {
                "user_id": pa.array([user] * len(starts), pa.int64()),
                "session_id": pa.array(sid[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
