"""Semi-structured (JSON) property extraction over the event log.

Event streams carry a free-form JSON ``props`` column at every real web
pipeline; the decode step is inherently row-wise (a JSON parse), so the
shape that matters is: decode ONCE per row inside the batch, immediately
collapse to per-``(event_type, k)`` partials (a C++ group_by — at most
|types|×|distinct k| rows leave the batch, never the raw rows), then one
small shuffle and a per-type fold.  The JSON strings themselves never
shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def props_stats(events, key: str = "k"):
    """``(event_type, n_events, k_sum, k_min, k_max, n_distinct_k)`` —
    aggregate of the integer JSON property ``key`` extracted from
    ``props`` per event type.  Rows whose ``props`` lacks ``key``, is
    null/invalid JSON, or holds a non-integer-TYPED value (``"7"``,
    ``3.5``, ``true``) are excluded — the oracle's ``json_type`` gate
    pins the identical semantics.
    """

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        out_t, out_k = [], []
        for t, p in zip(types, batch.column("props").to_pylist()):
            if not p:
                continue
            try:
                v = json.loads(p).get(key)
            except (ValueError, AttributeError):
                continue
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            out_t.append(t)
            out_k.append(v)
        t = pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "k": pa.array(out_k, pa.int64()),
            }
        )
        return (
            t.group_by(["event_type", "k"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "k", "n"])
        )

    rolled = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "k"])
        .sum("n")
    )

    def per_type(group: pa.Table) -> pa.Table:
        n = pc.cast(group.column("sum(n)"), pa.int64())
        k = group.column("k")
        return pa.table(
            {
                "event_type": group.column("event_type").slice(0, 1),
                "n_events": pa.array([pc.sum(n).as_py() or 0], pa.int64()),
                "k_sum": pa.array(
                    [pc.sum(pc.multiply(k, n)).as_py() or 0], pa.int64()
                ),
                "k_min": pa.array([pc.min(k).as_py()], pa.int64()),
                "k_max": pa.array([pc.max(k).as_py()], pa.int64()),
                "n_distinct_k": pa.array([group.num_rows], pa.int64()),
            }
        )

    return rolled.groupby("event_type").map_groups(per_type, batch_format="pyarrow")
