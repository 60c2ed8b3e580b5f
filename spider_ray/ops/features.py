"""Per-entity feature rollups — the "build a feature matrix from an event
log" staple of ML data prep.

``user_features`` pivots an event stream into one row per user with event
counts per type, value totals and first/last-seen timestamps.  The type
vocabulary is PINNED by parameter (not discovered from data) so the
output schema is stable and partial counts merge with plain sums; the
distinct-type count derives from the pinned one-hot counts at the end
rather than a non-mergeable COUNT DISTINCT.

Shape: a per-batch pyarrow ``group_by`` combiner collapses each batch to
(users-in-batch) rows, then ONE ``groupby(user)`` merges partials with
sum/min/max — the same combiner -> bounded-shuffle pattern as the
corpus-stats ops.  At 100 TB the shuffle payload is users x ~10 int64
columns, independent of event count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .numeric import to_cents

DEFAULT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_features(
    ds,
    event_types: tuple[str, ...] = DEFAULT_EVENT_TYPES,
    user_column: str = "user_id",
):
    """(user_id, n_events, n_types, value_cents, first_us, last_us,
    n_<type>...) per user.  Events whose type is not in ``event_types``
    still count toward the totals, just not toward a pivot column."""

    count_cols = [f"n_{t}" for t in event_types]

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                user_column: batch.column(user_column),
                "n_events": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
                "value_cents": to_cents(batch.column("value")),
                "first_us": pc.cast(batch.column("ts"), pa.int64()),
                "last_us": pc.cast(batch.column("ts"), pa.int64()),
                **{
                    col: pc.cast(
                        pc.equal(batch.column("event_type"), t), pa.int64()
                    )
                    for col, t in zip(count_cols, event_types)
                },
            }
        )
        aggs = (
            [("n_events", "sum"), ("value_cents", "sum"),
             ("first_us", "min"), ("last_us", "max")]
            + [(c, "sum") for c in count_cols]
        )
        out = t.group_by([user_column]).aggregate(aggs)
        return out.rename_columns(
            [user_column, "n_events", "value_cents", "first_us", "last_us"]
            + count_cols
        )

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(user_column)
        .aggregate(
            Sum("n_events"),
            Sum("value_cents"),
            Min("first_us"),
            Max("last_us"),
            *[Sum(c) for c in count_cols],
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        counts = [
            pc.cast(batch.column(f"sum({c})"), pa.int64()) for c in count_cols
        ]
        n_types = None
        for c in counts:
            hot = pc.cast(pc.greater(c, 0), pa.int64())
            n_types = hot if n_types is None else pc.add(n_types, hot)
        return pa.table(
            {
                user_column: batch.column(user_column),
                "n_events": pc.cast(batch.column("sum(n_events)"), pa.int64()),
                "n_types": n_types,
                "value_cents": pc.cast(
                    batch.column("sum(value_cents)"), pa.int64()
                ),
                "first_us": pc.cast(batch.column("min(first_us)"), pa.int64()),
                "last_us": pc.cast(batch.column("max(last_us)"), pa.int64()),
                **{
                    col: c for col, c in zip(count_cols, counts)
                },
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
