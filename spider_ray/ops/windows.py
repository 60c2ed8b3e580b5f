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
* **As-of join** — the classic "latest right-side row at or before each
  left-side row per key" temporal join Ray Data has no primitive for.
  Expressed as ONE ``groupby(key).map_groups`` shuffle over the pre-filtered
  union of both sides: inside a group, the right side sorts by ``(ts, id)``
  and a single vectorized ``searchsorted(side="right") - 1`` resolves every
  left row's match.  Same per-key partitioning assumption as sessionize.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .numeric import to_cents


def tumbling_window_counts(events, width_s: int = 3600):
    """``(window_start, event_type, n_events, sum_value_cents)`` — one row
    per (tumbling window, type); ``window_start`` = epoch seconds floored to
    ``width_s``."""

    def bucket(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.floor(pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), 1_000_000 * width_s
        )), pa.int64())
        win = pc.multiply(epoch, width_s)
        cents = to_cents(batch.column("value"))
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


def sliding_window_counts(events, width_s: int = 3600, step_s: int = 900):
    """Sliding-window event counts: every event lands in the
    ``width_s / step_s`` windows covering it (window starts aligned to
    ``step_s``).  Bounded flat expansion (the overlap factor) + one
    ``groupby(window, type)`` shuffle of already-partial counts — the
    sliding twin of :func:`tumbling_window_counts`.  Output:
    ``(window_start, event_type, n_events)`` epoch-second windows."""
    assert width_s % step_s == 0, "width must be a multiple of step"
    k = width_s // step_s
    step_us = step_s * 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        types = batch.column("event_type")
        base = (ts // step_us) * step_s  # newest window start, epoch seconds
        n = len(ts)
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * step_s, n
        )
        t = pa.table(
            {
                "window_start": pa.array(starts, pa.int64()),
                "event_type": pc.take(
                    types, pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
                ),
                "n_events": pa.array(np.ones(n * k, dtype=np.int64)),
            }
        )
        # per-batch combiner: collapse to partial counts before the shuffle
        return (
            t.group_by(["window_start", "event_type"])
            .aggregate([("n_events", "sum")])
            .rename_columns(["window_start", "event_type", "n_events"])
        )

    partials = events.select_columns(["ts", "event_type"]).map_batches(
        expand, batch_format="pyarrow"
    )
    agg = partials.groupby(["window_start", "event_type"]).sum("n_events")
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start": b.column("window_start"),
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("sum(n_events)"), pa.int64()),
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


def concurrent_sessions(events, gap_s: int = 1800, width_s: int = 3600):
    """Interval-overlap counting: sessions active per tumbling window.

    The interval-join shape Ray Data has no primitive for, expressed as a
    bounded flat expansion: each session (from :func:`sessionize`) expands
    to the window buckets it overlaps — expansion factor is bounded by
    session length / width, small by construction since sessions die after
    ``gap_s`` of silence — then ONE ``groupby(window)`` shuffle of the
    already-tiny (session, bucket) rows counts overlaps.  No all-pairs, no
    cross join.  Output: ``(window_start, n_sessions)`` epoch-second
    windows."""
    width_us = width_s * 1_000_000
    # prune to the three columns sessionize touches BEFORE its groupby(user)
    # exchange — event_type/value/props must not ride the shuffle
    sess = sessionize(events.select_columns(["event_id", "user_id", "ts"]), gap_s=gap_s)

    def expand(batch: pa.Table) -> pa.Table:
        s = batch.column("start_us").to_numpy(zero_copy_only=False) // width_us
        e = batch.column("end_us").to_numpy(zero_copy_only=False) // width_us
        counts = (e - s + 1).astype(np.int64)
        total = int(counts.sum())
        rep_start = np.repeat(s, counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return pa.table(
            {"window_start": pa.array((rep_start + offs) * width_s, pa.int64())}
        )

    exp = sess.map_batches(expand, batch_format="pyarrow")
    agg = exp.groupby("window_start").count()
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start": b.column("window_start"),
                "n_sessions": pc.cast(b.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def asof_join_events(events, left_type: str = "purchase", right_type: str = "view"):
    """As-of join within an event log: for every ``left_type`` event, the
    same user's most recent ``right_type`` event with ``ts <= left.ts``.

    Returns ``(event_id, user_id, ts_us, match_event_id, match_ts_us,
    gap_us)`` — the match columns are null when the user has no qualifying
    right-side event (left join semantics, DuckDB ``ASOF LEFT JOIN``).

    Shape: a vectorized pre-filter drops every other event type BEFORE the
    one ``groupby(user_id)`` shuffle, so only the two joined streams move;
    the per-group resolve is a single numpy ``searchsorted`` (no per-row
    Python loop).  Ties at identical ``ts`` break toward the larger
    ``event_id`` (sorted last), matching the SQL oracle's max-ts pick on a
    corpus where ``(user_id, ts)`` is unique per side.
    """
    value_set = pa.array([left_type, right_type], pa.string())

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"), value_set=value_set))

    def per_user(group: pa.Table) -> pa.Table:
        types = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        lm = types == left_type
        n_left = int(lm.sum())
        if n_left == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "match_event_id": pa.array([], pa.int64()),
                    "match_ts_us": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        lorder = np.lexsort((eid[lm], ts[lm]))
        lts, leid = ts[lm][lorder], eid[lm][lorder]
        rm = types == right_type
        rorder = np.lexsort((eid[rm], ts[rm]))
        rts, reid = ts[rm][rorder], eid[rm][rorder]
        idx = np.searchsorted(rts, lts, side="right") - 1
        hit = idx >= 0
        if len(rts):
            match_eid = np.where(hit, reid[np.maximum(idx, 0)], 0)
            match_ts = np.where(hit, rts[np.maximum(idx, 0)], 0)
        else:
            match_eid = np.zeros(n_left, dtype=np.int64)
            match_ts = np.zeros(n_left, dtype=np.int64)
        user = group.column("user_id")[0].as_py()
        return pa.table(
            {
                "event_id": pa.array(leid, pa.int64()),
                "user_id": pa.array([user] * n_left, pa.int64()),
                "ts_us": pa.array(lts, pa.int64()),
                "match_event_id": _masked_int64(match_eid, hit),
                "match_ts_us": _masked_int64(match_ts, hit),
                "gap_us": _masked_int64(lts - match_ts, hit),
            }
        )

    pruned = events.map_batches(prefilter, batch_format="pyarrow")
    return pruned.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def _masked_int64(values: np.ndarray, valid: np.ndarray) -> pa.Array:
    """int64 Arrow array with ``valid==False`` entries null."""
    return pa.array(values.astype(np.int64), pa.int64(), mask=~valid)


def rolling_user_sums(events, window_rows: int = 3):
    """Per-user rolling row-window sum: for each event, the sum of
    ``round(value*100)`` cents over the last ``window_rows`` events of that
    user (ordered by ``(ts, event_id)``), current row inclusive — the SQL
    ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`` frame.

    Same partitioning assumption as :func:`sessionize` (one user's events
    fit in one group); integer-cents output keeps the distributed result
    bit-identical to the window-function oracle.  Output:
    ``(event_id, user_id, roll_cents)``.
    """

    def prune(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64())
        cents = to_cents(batch.column("value"))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts_us": ts,
                "cents": cents,
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        c = cents[order]
        cum = np.cumsum(c)
        roll = cum.copy()
        if len(c) > window_rows:
            roll[window_rows:] = cum[window_rows:] - cum[:-window_rows]
        user = group.column("user_id")[0].as_py()
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array([user] * len(c), pa.int64()),
                "roll_cents": pa.array(roll, pa.int64()),
            }
        )

    pruned = events.select_columns(["event_id", "user_id", "ts", "value"]).map_batches(
        prune, batch_format="pyarrow"
    )
    return pruned.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def session_stats(events, gap_s: int = 1800):
    """One-row global session statistics — the composition shape
    (sessionize -> exact histogram-fold quantiles) every analytics
    pipeline ends with: ``(n_sessions, p50_events, p99_events,
    p50_duration_s, p99_duration_s)``.

    Quantiles are exact ``quantile_disc`` semantics via
    :func:`~spider_ray.ops.corpusstats.group_quantiles` — the shuffle
    moves only (value, count) histogram rows, never sessions.
    """
    from .corpusstats import group_quantiles

    sessions = sessionize(events, gap_s=gap_s)

    def slim(b: pa.Table) -> pa.Table:
        dur = pc.divide(
            pc.subtract(b.column("end_us"), b.column("start_us")),
            pa.scalar(1_000_000, pa.int64()),
        )
        return pa.table(
            {
                "g": pa.nulls(b.num_rows, pa.string()).fill_null("all"),
                "n_events": pc.cast(b.column("n_events"), pa.int64()),
                "dur_s": pc.cast(dur, pa.int64()),
            }
        )

    # materialize the SLIM session rows once — the two quantile folds and
    # the count below would otherwise each re-run the sessionize shuffle
    slimmed = sessions.map_batches(slim, batch_format="pyarrow").materialize()
    n_sessions = slimmed.count()
    if n_sessions == 0:
        # match the SQL oracle on empty input: one row, NULL quantiles
        null = pa.array([None], pa.int64())
        return pa.table(
            {
                "n_sessions": pa.array([0], pa.int64()),
                "p50_events": null,
                "p99_events": null,
                "p50_duration_s": null,
                "p99_duration_s": null,
            }
        )
    ev_q = group_quantiles(
        slimmed, group_col="g", value_col="n_events",
        qs=(0.5, 0.99), q_names=("p50_events", "p99_events"),
    )
    dur_q = group_quantiles(
        slimmed, group_col="g", value_col="dur_s",
        qs=(0.5, 0.99), q_names=("p50_duration_s", "p99_duration_s"),
    )
    return pa.table(
        {
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "p50_events": ev_q.column("p50_events"),
            "p99_events": ev_q.column("p99_events"),
            "p50_duration_s": dur_q.column("p50_duration_s"),
            "p99_duration_s": dur_q.column("p99_duration_s"),
        }
    )


def interarrival_quantiles(events, qs=(0.5, 0.9), q_names=("p50", "p90")):
    """``(event_type, n_gaps, p50, p90)`` — exact quantiles of the
    inter-arrival gap (microseconds) between consecutive events of the
    SAME (user, event_type) stream.

    One coarse ``hash(user) & 63`` shuffle co-locates each user's events
    (the sessionize partitioning assumption); inside each of the 64
    partitions a single Arrow sort by ``(user_id, event_type, ts,
    event_id)`` + a numpy boundary mask yields every gap vectorized — no
    per-user Python.  Gaps then reduce to ``(event_type, dt_us, count)``
    histogram rows before the final exact ``quantile_disc`` fold
    (`corpusstats.group_quantiles` contract: value at 1-based rank
    ``ceil(q*n)``), so the wide shuffle carries only gap histograms.
    """
    from ..poolsize import coarse_fanout
    from .behavior import coarse_part
    from .corpusstats import group_quantiles

    nparts = coarse_fanout()

    def slim(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        t = pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "event_type": batch.column("event_type"),
                "ts_us": ts,
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            }
        )
        return t.append_column("part", coarse_part(t.column("user_id"), nparts))

    def gaps(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("user_id", "ascending"), ("event_type", "ascending"),
                       ("ts_us", "ascending"), ("event_id", "ascending")],
        )
        g = group.take(idx)
        users = np.asarray(g.column("user_id"))
        types = np.asarray(g.column("event_type").to_numpy(zero_copy_only=False))
        ts = np.asarray(g.column("ts_us"))
        if len(ts) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "dt_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        same = (users[1:] == users[:-1]) & (types[1:] == types[:-1])
        t = pa.table(
            {
                "event_type": pa.array(types[1:][same]),
                "dt_us": pa.array(ts[1:][same] - ts[:-1][same], pa.int64()),
                "n": pa.array(np.ones(int(same.sum()), dtype=np.int64)),
            }
        )
        # in-partition histogram combiner: gap values repeat heavily
        return (
            t.group_by(["event_type", "dt_us"]).aggregate([("n", "sum")])
            .rename_columns(["event_type", "dt_us", "n"])
        )

    import ray.data

    hist = (
        events.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow")
    )
    # expand histogram rows back to a ds the quantile fold understands:
    # group_quantiles counts rows per (group, value) — feed it weighted rows
    # by re-summing our partials under its own groupby via a slim expand of
    # (event_type, dt_us) repeated n times WOULD be wasteful; instead fold
    # the (already tiny) gap histogram driver-side with the same rank rule.
    import math

    parts = [
        b for b in hist.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {"event_type": pa.array([], pa.string()),
                 "n_gaps": pa.array([], pa.int64())}
                | {n: pa.array([], pa.int64()) for n in q_names}
            )
        )
    tbl = pa.concat_tables(parts)
    tbl = (
        tbl.group_by(["event_type", "dt_us"]).aggregate([("n", "sum")])
        .rename_columns(["event_type", "dt_us", "n"])
    )
    out: dict[str, list] = {"event_type": [], "n_gaps": []}
    for name in q_names:
        out[name] = []
    etypes = tbl.column("event_type").to_pylist()
    vals = np.asarray(tbl.column("dt_us"))
    cnts = np.asarray(tbl.column("n"))
    per: dict[str, list[tuple[int, int]]] = {}
    for e, v, c in zip(etypes, vals, cnts):
        per.setdefault(e, []).append((int(v), int(c)))
    for e in sorted(per):
        pairs = sorted(per[e])
        vs = np.array([p[0] for p in pairs], dtype=np.int64)
        cum = np.cumsum([p[1] for p in pairs])
        n = int(cum[-1])
        out["event_type"].append(e)
        out["n_gaps"].append(n)
        for q, name in zip(qs, q_names):
            rank = max(1, math.ceil(q * n))
            out[name].append(int(vs[int(np.searchsorted(cum, rank, side="left"))]))
    return ray.data.from_arrow(
        pa.table(
            {"event_type": pa.array(out["event_type"], pa.string()),
             "n_gaps": pa.array(out["n_gaps"], pa.int64())}
            | {n: pa.array(out[n], pa.int64()) for n in q_names}
        )
    )
