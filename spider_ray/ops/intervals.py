"""Range (interval) joins — the non-equi temporal join Ray Data has no
primitive for.

``interval_join_counts`` answers "for every window [start, start+W), how
many right-side points (and how much value) fall inside it" — the
attribution-window shape (signup -> purchases within the hour), and the
general template for any point-in-interval range join.

The reference engine has no relational operators at all (it is a
crawler); this is one of the custom-operator families the Ray Data graft
adds for event-log curation, alongside the as-of join in
``ops/windows.py``.

Ray Data shape — bucketed replication, two bounded shuffles, no driver
state:

1. ONE ``map_batches`` pass over the pruned event columns emits a tagged
   union: each window row is replicated to the two ``W``-wide epoch
   buckets its interval can touch (an interval of length ``W`` spans at
   most 2 buckets of width ``W``), each point row lands in exactly its
   own bucket.  Shuffle payload: ``2*|windows| + |points|`` fixed-width
   rows — never the event payloads.
2. ``groupby(bucket).map_groups``: inside a bucket, points sort by
   timestamp with a prefix-sum over their values; every window replica
   resolves its ``[start, start+W)`` slice with two ``searchsorted``
   calls — O((w+p) log p) per bucket, fully vectorized.  Each matching
   (window, point) pair co-occurs in EXACTLY one bucket group (the
   point's own bucket holds precisely one replica of every window whose
   interval can contain it), so partials never double-count.
3. ``groupby(window)`` sums the per-bucket partials.  Zero-match windows
   survive (every replica emits a partial, even 0/0) — LEFT-join
   semantics without a join.

Skew note: bucket width = W means a bucket holds only the windows that
START within one W-wide slot plus the points inside it; a hot slot
(traffic spike) grows one group linearly, never quadratically.  At
100 TB, pick ``window_s`` >= the true attribution window and the
replication factor stays 2 regardless of data volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .numeric import to_cents

_US = 1_000_000


def interval_join_counts(
    events,
    window_s: int = 3600,
    window_type: str = "signup",
    point_type: str = "purchase",
):
    """Per-window point rollup: ``(event_id, window_start_us, n_points,
    point_cents)`` — one row per ``window_type`` event, counting every
    ``point_type`` event with ``ts`` in ``[start, start + window_s)``
    (any user: a pure non-equi range join).

    ``events`` needs columns ``event_id, ts, event_type, value``.
    """
    w_us = window_s * _US

    def tagged_rows(batch: pa.Table) -> pa.Table:
        etype = batch.column("event_type")
        ts_us = pc.cast(batch.column("ts"), pa.int64())

        wins = batch.filter(pc.equal(etype, window_type))
        w_ts = np.asarray(pc.cast(wins.column("ts"), pa.int64()), dtype=np.int64)
        w_ids = np.asarray(wins.column("event_id"), dtype=np.int64)
        w_bucket = w_ts // w_us

        pts = batch.filter(pc.equal(etype, point_type))
        p_ts = np.asarray(pc.cast(pts.column("ts"), pa.int64()), dtype=np.int64)
        p_cents = np.asarray(to_cents(pts.column("value")), dtype=np.int64)

        n_w, n_p = len(w_ts), len(p_ts)
        # windows twice (bucket, bucket+1), points once
        bucket = np.concatenate(
            [w_bucket, w_bucket + 1, p_ts // w_us]
        )
        is_window = np.concatenate(
            [np.ones(2 * n_w, dtype=np.int8), np.zeros(n_p, dtype=np.int8)]
        )
        event_id = np.concatenate(
            [w_ids, w_ids, np.zeros(n_p, dtype=np.int64)]
        )
        ts_col = np.concatenate([w_ts, w_ts, p_ts])
        cents = np.concatenate(
            [np.zeros(2 * n_w, dtype=np.int64), p_cents]
        )
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "is_window": pa.array(is_window, pa.int8()),
                "event_id": pa.array(event_id, pa.int64()),
                "ts_us": pa.array(ts_col, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def bucket_partials(group: pa.Table) -> pa.Table:
        is_win = np.asarray(group.column("is_window"), dtype=np.int8) == 1
        ts = np.asarray(group.column("ts_us"), dtype=np.int64)
        w_start = ts[is_win]
        w_id = np.asarray(group.column("event_id"), dtype=np.int64)[is_win]
        if len(w_start) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "window_start_us": pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                    "point_cents": pa.array([], pa.int64()),
                }
            )
        p_ts = ts[~is_win]
        p_cents = np.asarray(group.column("cents"), dtype=np.int64)[~is_win]
        order = np.argsort(p_ts, kind="stable")
        p_ts = p_ts[order]
        prefix = np.concatenate([[0], np.cumsum(p_cents[order])])
        lo = np.searchsorted(p_ts, w_start, side="left")
        hi = np.searchsorted(p_ts, w_start + w_us, side="left")
        return pa.table(
            {
                "event_id": pa.array(w_id, pa.int64()),
                "window_start_us": pa.array(w_start, pa.int64()),
                "n_points": pa.array(hi - lo, pa.int64()),
                "point_cents": pa.array(prefix[hi] - prefix[lo], pa.int64()),
            }
        )

    tagged = events.map_batches(tagged_rows, batch_format="pyarrow")
    partials = tagged.groupby("bucket").map_groups(
        bucket_partials, batch_format="pyarrow"
    )
    agg = partials.groupby(["event_id", "window_start_us"]).sum(
        ["n_points", "point_cents"]
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_id": b.column("event_id"),
                "window_start_us": b.column("window_start_us"),
                "n_points": pc.cast(b.column("sum(n_points)"), pa.int64()),
                "point_cents": pc.cast(b.column("sum(point_cents)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
