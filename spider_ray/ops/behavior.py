"""Behavioral event analytics: ordered funnels and retention cohorts.

Both ops follow the coarse-hash-aggregate pattern proven in
``ops/linededup.py`` (per-batch pyarrow C++ combiner -> ONE shuffle of slim
rows keyed by ``part = hash(user) & 63`` -> one vectorized C++ pass per
partition): Ray's native ``groupby(user).map_groups`` would issue one
Python call per user (millions at web scale), while 64 coarse partitions
keep every fold a handful of Arrow kernel calls regardless of user count.

Scale notes (100 TB framing):
* Only slim columns ever shuffle — ``(user_id, type_code, ts_us)`` for the
  funnel (17 B/row, and only the funnel's 3 event types survive the
  pruned-read filter), distinct ``(user_id, day)`` pairs for retention
  (16 B/row, pre-deduped per batch so at most one row per user-day-batch).
* Per-partition state is O(users-in-partition), spread uniformly by the
  Knuth multiplicative hash — no hot-key amplification from a hot user,
  since per-user payload is already reduced to mins/distinct days.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = 2654435761
_NPARTS = 64  # fallback coarse-partition count (see poolsize.coarse_fanout)


def coarse_part(key_col: pa.ChunkedArray | pa.Array, nparts: int = _NPARTS) -> pa.Array:
    """Deterministic coarse partition id from an int64 key (wrapping
    multiply is intentional — this is a scatter key, not a value).
    Shared by every coarse-hash-aggregate op in the package.  Callers pass
    ``nparts = poolsize.coarse_fanout()`` resolved ON THE DRIVER so every
    task of a shuffle agrees on the partition count."""
    mixed = pc.multiply(pc.cast(key_col, pa.int64()), pa.scalar(_KNUTH, pa.int64()))
    return pc.bit_wise_and(pc.shift_right(mixed, pa.scalar(17, pa.int64())),
                           pa.scalar(nparts - 1, pa.int64()))


_part_of = coarse_part


# ---------------------------------------------------------------------------
# ordered funnel
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "signup", "purchase")


def funnel_counts(events, stages=_FUNNEL_STAGES, window_s: int = 86400):
    """``(stage, n_users)`` — users reaching each step of an ORDERED funnel
    within a per-step conversion window.

    Semantics (matched exactly by the DuckDB oracle): ``t0(user)`` is the
    first ``stages[0]`` event; ``t1(user)`` the first ``stages[1]`` event in
    ``[t0, t0 + window)``; ``t2`` the first ``stages[2]`` in
    ``[t1, t1 + window)``.  ``n_users`` counts users with a non-null
    timestamp at that stage.

    Plan: filter to funnel types in-batch (everything else never leaves the
    read), slim to ``(user_id, code, ts_us)``, one coarse shuffle, then a
    per-partition vectorized chain of ``group_by(min)`` + hash join +
    filter — three Arrow kernels per partition, no per-user Python.
    """
    from ..poolsize import coarse_fanout

    stages = tuple(stages)
    window_us = int(window_s) * 1_000_000
    nparts = coarse_fanout()

    stage_set = pa.array(stages)

    def slim(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"), value_set=stage_set)
        t = batch.filter(mask)
        # index_in against the stage list IS the code mapping — vectorized
        codes = pc.cast(
            pc.index_in(t.column("event_type"), value_set=stage_set), pa.int8()
        )
        out = pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "code": codes,
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )
        return out.append_column("part", _part_of(out.column("user_id"), nparts))

    def fold_partition(group: pa.Table) -> pa.Table:
        # stage 0: first t0 per user
        cur = (
            group.filter(pc.equal(group.column("code"), 0))
            .group_by(["user_id"])
            .aggregate([("ts_us", "min")])
            .rename_columns(["user_id", "t_prev"])
        )
        counts = [cur.num_rows]
        for k in range(1, len(stages)):
            cand = group.filter(pc.equal(group.column("code"), k)).select(
                ["user_id", "ts_us"]
            )
            j = cand.join(cur, keys=["user_id"], join_type="inner")
            j = j.filter(
                pc.and_(
                    pc.greater_equal(j.column("ts_us"), j.column("t_prev")),
                    pc.less(
                        j.column("ts_us"),
                        pc.add(j.column("t_prev"), pa.scalar(window_us, pa.int64())),
                    ),
                )
            )
            cur = (
                j.group_by(["user_id"])
                .aggregate([("ts_us", "min")])
                .rename_columns(["user_id", "t_prev"])
            )
            counts.append(cur.num_rows)
        return pa.table(
            {
                "stage": pa.array(list(stages), pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    import ray.data as rd

    # zero-seed every stage so degenerate inputs (no funnel events at all)
    # still yield the oracle's 3-row scaffold
    zeros = rd.from_arrow(
        pa.table(
            {
                "stage": pa.array(list(stages), pa.string()),
                "n_users": pa.array([0] * len(stages), pa.int64()),
            }
        )
    )
    partials = (
        events.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_partition, batch_format="pyarrow")
    )
    rolled = partials.union(zeros).groupby("stage").sum("n_users")
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "stage": b.column("stage"),
                "n_users": pc.cast(b.column("sum(n_users)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def retention_cohorts(events):
    """``(cohort_day_s, day_offset, n_users)`` — classic retention triangle:
    a user's cohort is the UTC day of their first event; the user counts
    toward ``(cohort, d)`` for every distinct day ``cohort + d`` they were
    active (offset 0 = the cohort day itself).

    Plan: per-batch dedup to distinct ``(user_id, day)`` (C++ group_by),
    coarse shuffle by user hash, then per partition: global re-dedup, min
    day per user, one hash join, one group count — all Arrow kernels.
    """
    from ..poolsize import coarse_fanout

    nparts = coarse_fanout()

    def slim(batch: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                         pa.scalar(_DAY_US, pa.int64()))
        t = pa.table(
            {"user_id": pc.cast(batch.column("user_id"), pa.int64()), "day": days}
        )
        t = (
            t.group_by(["user_id", "day"])
            .aggregate([])  # distinct (user, day) within the batch
        )
        return t.append_column("part", _part_of(t.column("user_id"), nparts))

    def fold_partition(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "day"]).group_by(["user_id", "day"]).aggregate([])
        cohorts = (
            t.group_by(["user_id"])
            .aggregate([("day", "min")])
            .rename_columns(["user_id", "cohort"])
        )
        j = t.join(cohorts, keys=["user_id"], join_type="inner")
        off = pc.subtract(j.column("day"), j.column("cohort"))
        pairs = pa.table({"cohort": j.column("cohort"), "day_offset": off})
        counted = (
            pairs.group_by(["cohort", "day_offset"])
            .aggregate([([], "count_all")])
            .rename_columns(["cohort", "day_offset", "n_users"])
        )
        return counted

    partials = (
        events.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_partition, batch_format="pyarrow")
    )
    rolled = partials.groupby(["cohort", "day_offset"]).sum("n_users")
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "cohort_day_s": pc.multiply(
                    pc.cast(b.column("cohort"), pa.int64()),
                    pa.scalar(86400, pa.int64()),
                ),
                "day_offset": pc.cast(b.column("day_offset"), pa.int64()),
                "n_users": pc.cast(b.column("sum(n_users)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# event-type transition counts (sequence analytics)
# ---------------------------------------------------------------------------


def event_transitions(events):
    """``(prev_type, next_type, n)`` — counts of consecutive event-type
    pairs per user, events ordered by ``(ts, event_id)`` (the same
    total order the sessionizer pins).

    Plan: slim ``(user, ts, event_id, type)`` rows take one coarse
    user-hash shuffle; each partition sorts ONCE (Arrow sort_by over all
    its users), masks user boundaries with numpy, and folds the pair
    counts with one C++ group_by — no per-user Python, no windows
    library.  The shuffle payload is 4 slim columns; type strings
    dictionary-encode in flight.
    """
    from ..poolsize import coarse_fanout

    nparts = coarse_fanout()

    def slim(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )
        return t.append_column("part", coarse_part(t.column("user_id"), nparts))

    def fold_partition(group: pa.Table) -> pa.Table:
        t = group.sort_by(
            [("user_id", "ascending"), ("ts_us", "ascending"),
             ("event_id", "ascending")]
        )
        if t.num_rows < 2:
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "next_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        same = user[:-1] == user[1:]
        types = t.column("event_type")
        pairs = pa.table(
            {
                "prev_type": types.slice(0, t.num_rows - 1).combine_chunks(),
                "next_type": types.slice(1).combine_chunks(),
            }
        ).filter(pa.array(same))
        return (
            pairs.group_by(["prev_type", "next_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["prev_type", "next_type", "n"])
        )

    partials = (
        events.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_partition, batch_format="pyarrow")
    )
    rolled = partials.groupby(["prev_type", "next_type"]).sum("n")
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "prev_type": b.column("prev_type"),
                "next_type": b.column("next_type"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# rolling distinct active users (DAU / trailing-7-day WAU)
# ---------------------------------------------------------------------------


def rolling_active_users(events, window_days: int = 7):
    """``(day_s, dau, wau)`` for every UTC day with at least one event:
    ``dau`` = distinct users that day, ``wau`` = distinct users in the
    trailing ``window_days`` window ``[day - window_days + 1, day]``.

    Rolling DISTINCT doesn't decompose like a sum, so the shape is the
    bounded-expansion interval trick (cf. ``windows.concurrent_sessions``):
    each distinct ``(user, day)`` expands to the ≤``window_days`` window
    ends it is visible to; partitions are keyed by user hash, so after the
    within-partition dedup each user contributes AT MOST ONE to any
    ``(window_end)`` count — per-partition partial counts then sum
    globally without double-counting.  Window ends with no events of their
    own are dropped in the final fold (matching the SQL oracle's "days
    present in the data" frame).
    """
    from ..poolsize import coarse_fanout

    span = int(window_days)
    nparts = coarse_fanout()

    def slim(batch: pa.Table) -> pa.Table:
        days = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                         pa.scalar(_DAY_US, pa.int64()))
        t = pa.table(
            {"user_id": pc.cast(batch.column("user_id"), pa.int64()), "day": days}
        )
        t = t.group_by(["user_id", "day"]).aggregate([])
        return t.append_column("part", coarse_part(t.column("user_id"), nparts))

    def fold_partition(group: pa.Table) -> pa.Table:
        t = group.select(["user_id", "day"]).group_by(["user_id", "day"]).aggregate([])
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        # dau partials: one row per (day), count of distinct users
        dau = (
            pa.table({"day": t.column("day")})
            .group_by(["day"])
            .aggregate([([], "count_all")])
            .rename_columns(["day", "n"])
        )
        dau = dau.append_column(
            "kind", pa.nulls(dau.num_rows, pa.int8()).fill_null(0)
        )
        # wau partials: expand to window ends, dedupe (user, wend), count
        reps = np.full(len(user), span, dtype=np.int64)
        u_rep = np.repeat(user, reps)
        base = np.repeat(day, reps)
        offs = np.tile(np.arange(span, dtype=np.int64), len(user))
        wend = base + offs
        dedup = (
            pa.table(
                {
                    "user_id": pa.array(u_rep, pa.int64()),
                    "day": pa.array(wend, pa.int64()),
                }
            )
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        wau = (
            dedup.select(["day"])
            .group_by(["day"])
            .aggregate([([], "count_all")])
            .rename_columns(["day", "n"])
        )
        wau = wau.append_column(
            "kind", pa.nulls(wau.num_rows, pa.int8()).fill_null(1)
        )
        return pa.concat_tables([dau, wau])

    partials = (
        events.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_partition, batch_format="pyarrow")
    )
    rolled = partials.groupby(["day", "kind"]).sum("n")

    def assemble(group: pa.Table) -> pa.Table:
        kinds = group.column("kind").to_pylist()
        ns = group.column("sum(n)" if "sum(n)" in group.column_names else "n").to_pylist()
        by = dict(zip(kinds, ns))
        if 0 not in by:  # window end with no events of its own
            return pa.table(
                {"day_s": pa.array([], pa.int64()), "dau": pa.array([], pa.int64()),
                 "wau": pa.array([], pa.int64())}
            )
        day = int(group.column("day")[0].as_py())
        return pa.table(
            {
                "day_s": pa.array([day * 86400], pa.int64()),
                "dau": pa.array([int(by[0])], pa.int64()),
                "wau": pa.array([int(by.get(1, 0))], pa.int64()),
            }
        )

    return rolled.groupby("day").map_groups(assemble, batch_format="pyarrow")


def top_users_per_day(events, k: int = 3):
    """``(day, user_id, n, rank)`` — each day's top-``k`` most active users
    (ties → lowest user_id), the windowed top-contributor readout (abuse
    triage, power-user dashboards).

    Shape: per-batch C++ ``group_by(day, user)`` combiner → ONE
    ``groupby(day, user)`` fold of slim count rows → per-day rank inside
    ``groupby(day).map_groups`` (groups hold one row per active user-day —
    already reduced, so a hot user adds nothing).  Day = UTC bucket
    ``(epoch_us // 86400e6) · 86400`` (the repo-wide window convention).
    """
    def partial(batch: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(
                pc.cast(batch.column("ts"), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.scalar(86_400, pa.int64()),
        )
        t = pa.table(
            {
                "day": day,
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            }
        )
        return (
            t.group_by(["day", "user_id"])
            .aggregate([([], "count_all")])
            .rename_columns(["day", "user_id", "n"])
        )

    agg = (
        events.select_columns(["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .sum("n")
    )

    def day_topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("sum(n)", "descending"), ("user_id", "ascending")],
        )[:k]
        g = group.take(idx)
        return pa.table(
            {
                "day": g.column("day"),
                "user_id": g.column("user_id"),
                "n": pc.cast(g.column("sum(n)"), pa.int64()),
                "rank": pa.array(np.arange(1, len(g) + 1), pa.int64()),
            }
        )

    return agg.groupby("day").map_groups(day_topk, batch_format="pyarrow")


def value_outliers(events):
    """``(event_type, n, q1_cents, q3_cents, n_outliers)`` — the Tukey
    1.5·IQR outlier report per event type, the standard numeric-column
    hygiene readout before aggregating a metric.

    All-integer spec so both passes and the SQL oracle agree exactly:
    values become cents (``round(value·100)``, half away from zero),
    Q1/Q3 are exact ``quantile_disc`` folds over (type, cents) histogram
    rows (``corpusstats.group_quantiles`` — the shuffle carries counts,
    never events), and the fence test is scaled ×2 to stay integral:
    outlier ⇔ ``2·cents < 2·q1 − 3·IQR  or  2·cents > 2·q3 + 3·IQR``.
    The second pass broadcasts the tiny per-type fence table and counts
    per batch — no second shuffle beyond a (type) fold.
    """
    from .corpusstats import group_quantiles
    from .numeric import to_cents

    def cents_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "cents": to_cents(t.column("value")),
            }
        )

    slim = events.select_columns(["event_type", "value"]).map_batches(
        cents_rows, batch_format="pyarrow"
    )
    q = group_quantiles(
        slim,
        group_col="event_type",
        value_col="cents",
        qs=(0.25, 0.75),
        q_names=("q1", "q3"),
    )
    fences = {
        t: (q1, q3, 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1))
        for t, q1, q3 in zip(
            q.column("event_type").to_pylist(),
            q.column("q1").to_pylist(),
            q.column("q3").to_pylist(),
        )
    }

    def count_partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        n: dict[str, int] = {}
        out: dict[str, int] = {}
        for t, c in zip(types, cents):
            n[t] = n.get(t, 0) + 1
            lo, hi = fences[t][2], fences[t][3]
            if 2 * c < lo or 2 * c > hi:
                out[t] = out.get(t, 0) + 1
        keys = list(n)
        return pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "n": pa.array([n[k] for k in keys], pa.int64()),
                "n_outliers": pa.array([out.get(k, 0) for k in keys], pa.int64()),
            }
        )

    agg = (
        slim.map_batches(count_partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "n_outliers"])
    )

    def finalize(b: pa.Table) -> pa.Table:
        types = b.column("event_type").to_pylist()
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
                "q1_cents": pa.array([fences[t][0] for t in types], pa.int64()),
                "q3_cents": pa.array([fences[t][1] for t in types], pa.int64()),
                "n_outliers": pc.cast(b.column("sum(n_outliers)"), pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def event_trigrams(events, k: int = 20):
    """Top-``k`` most common 3-event journeys: consecutive event-type
    triples within each user's ``(ts, event_id)``-ordered stream, counted
    corpus-wide; ``(trigram, n)`` with ``n desc, trigram asc`` tie order.

    Same coarse ``hash(user) & 63`` shuffle + vectorized in-partition
    sort/boundary-mask shape as :func:`event_transitions` (which counts
    bigrams); only ``(trigram, n)`` partials leave each partition, and the
    final sort+limit runs over the ≤|event_types|³ aggregate."""
    from ..poolsize import coarse_fanout

    nparts = coarse_fanout()

    def slim(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch.column("user_id"), pa.int64())
        return pa.table(
            {
                "user_id": uid,
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
                "event_type": batch.column("event_type"),
                "part": coarse_part(uid, nparts),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("user_id", "ascending"), ("ts_us", "ascending"),
                       ("event_id", "ascending")],
        )
        g = group.take(idx)
        users = np.asarray(g.column("user_id"))
        types = g.column("event_type").to_numpy(zero_copy_only=False)
        n = len(users)
        if n < 3:
            return pa.table({"trigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = (users[2:] == users[:-2]) & (users[2:] == users[1:-1])
        t0, t1, t2 = types[:-2][same], types[1:-1][same], types[2:][same]
        tri = pa.table(
            {
                "trigram": pc.binary_join_element_wise(
                    pa.array(t0), pa.array(t1), pa.array(t2), ">"
                ),
                "n": pa.nulls(int(same.sum()), pa.int64()).fill_null(1),
            }
        )
        return (
            tri.group_by(["trigram"]).aggregate([("n", "sum")])
            .rename_columns(["trigram", "n"])
        )

    agg = (
        events.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("trigram")
        .sum("n")
    )
    out = agg.map_batches(
        lambda b: pa.table(
            {"trigram": b.column("trigram"),
             "n": pc.cast(b.column("sum(n)"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return out.sort(["n", "trigram"], descending=[True, False]).limit(k)
