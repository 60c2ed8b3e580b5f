"""Relational building blocks: broadcast hash join + pruned-read aggregate.

SURVEY.md §2.4 maps the reference's lookups onto two join strategies —
shuffle joins for big×big (the corpus fetch) and *broadcast* joins for
big×small.  This module makes the broadcast side a first-class reusable
operator: the small table is put in the object store ONCE (``ray.put``) and
every map_batches actor reads it zero-copy in ``__init__``; each batch then
joins via pyarrow's C++ hash join.  No shuffle, no driver loop — the big
side streams.

``pricing_summary`` is the companion demo of the pruned-read aggregate
pattern (TPC-H Q1 shape): column-pruned ``read_parquet``, per-batch partial
aggregation in integer price-cents space (``round(price*100)`` per row,
then pure-integer products — distributed summation order cannot perturb
integers), one tiny groupby of partials.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .numeric import round_sql as _round_sql
from .numeric import to_cents


def broadcast_join(ds, right: pa.Table, keys, right_keys=None,
                   join_type: str = "inner", concurrency: int | None = None):
    """Join a streaming Dataset against a small in-memory table.

    ``right`` is broadcast once via the object store; each worker joins its
    Arrow batch with pyarrow's hash join (``Table.join``).  Use when
    ``right`` fits comfortably in worker memory (dimension tables, lookup
    maps) — the alternative for big×big is a hash-shuffle join.
    """
    import ray

    right_ref = ray.put(right)
    keys = [keys] if isinstance(keys, str) else list(keys)
    if right_keys is not None:
        right_keys = [right_keys] if isinstance(right_keys, str) else list(right_keys)

    class _Join:
        def __init__(self):
            self.right = ray.get(right_ref)  # zero-copy read per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(
                self.right, keys=keys, right_keys=right_keys or keys,
                join_type=join_type,
            )

    # callable-class stages need an explicit actor-pool size; keep the
    # default modest and fractional-CPU so small sessions don't starve reads
    return ds.map_batches(
        _Join, batch_format="pyarrow", concurrency=concurrency or 4, num_cpus=0.5
    )


def _cents(col) -> pa.Array:
    from .numeric import to_cents

    return to_cents(col)


def order_priority_revenue(lineitem, orders, num_partitions: int | None = None):
    """Big×big hash-shuffle join demo: lineitem ⋈ orders on orderkey via
    Ray Data's native ``Dataset.join`` (both sides hash-partitioned on the
    key — the strategy for two streaming fact tables, vs ``broadcast_join``
    for dimension lookups), then a tiny rollup per order priority.

    Returns ``(o_orderpriority, n_items, revenue_x10000)`` with
    ``revenue_x10000 = Σ cents(l_extendedprice)·(100 − cents(l_discount))``
    — pure-integer, summation-order-proof.
    """

    def li_slim(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue_x10000": pc.multiply(
                    cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )

    if num_partitions is None:
        import ray

        # one join partition per CPU (min 16) — a fixed small count would
        # funnel a big cluster's shuffle through a handful of reduce tasks
        num_partitions = max(16, int(ray.cluster_resources().get("CPU", 16)))

    slim = lineitem.map_batches(li_slim, batch_format="pyarrow")
    joined = slim.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "n_items": pa.nulls(len(batch), pa.int64()).fill_null(1),
                "revenue_x10000": batch.column("revenue_x10000"),
            }
        )
        return (
            t.group_by(["o_orderpriority"])
            .aggregate([("n_items", "sum"), ("revenue_x10000", "sum")])
            .rename_columns(["o_orderpriority", "n_items", "revenue_x10000"])
        )

    agg = joined.map_batches(partial, batch_format="pyarrow")
    rolled = agg.groupby("o_orderpriority").sum(["n_items", "revenue_x10000"])
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "n_items": pc.cast(b.column("sum(n_items)"), pa.int64()),
                "revenue_x10000": pc.cast(b.column("sum(revenue_x10000)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def pricing_summary(lineitem, ship_cutoff: str = "1998-09-01"):
    """TPC-H Q1-shaped rollup per (returnflag, linestatus), all-integer:

    ``n_rows, sum_qty, sum_base_cents = Σ round(price*100),
    sum_disc_x10000 = Σ cents*(100-disc_cents),
    sum_charge_x1e6 = Σ cents*(100-disc_cents)*(100+tax_cents)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import datetime

        cutoff = datetime.datetime.fromisoformat(ship_cutoff)
        m = pc.less(batch.column("l_shipdate"), pa.scalar(cutoff))
        b = batch.filter(m)
        cents = _cents(b.column("l_extendedprice"))
        disc = _cents(b.column("l_discount"))  # 0..100
        tax = _cents(b.column("l_tax"))
        disc_x = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
        charge_x = pc.multiply(disc_x, pc.add(pa.scalar(100, pa.int64()), tax))
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "n_rows": pa.nulls(len(b), pa.int64()).fill_null(1),
                "sum_qty": pc.cast(_round_sql(b.column("l_quantity")), pa.int64()),
                "sum_base_cents": cents,
                "sum_disc_x10000": disc_x,
                "sum_charge_x1e6": charge_x,
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("n_rows", "sum"),
                    ("sum_qty", "sum"),
                    ("sum_base_cents", "sum"),
                    ("sum_disc_x10000", "sum"),
                    ("sum_charge_x1e6", "sum"),
                ]
            )
            .rename_columns(
                [
                    "l_returnflag",
                    "l_linestatus",
                    "n_rows",
                    "sum_qty",
                    "sum_base_cents",
                    "sum_disc_x10000",
                    "sum_charge_x1e6",
                ]
            )
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["n_rows", "sum_qty", "sum_base_cents", "sum_disc_x10000", "sum_charge_x1e6"]
    )
    names = ["n_rows", "sum_qty", "sum_base_cents", "sum_disc_x10000", "sum_charge_x1e6"]
    return agg.map_batches(
        lambda b: pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                **{n: pc.cast(b.column(f"sum({n})"), pa.int64()) for n in names},
            }
        ),
        batch_format="pyarrow",
    )


def revenue_forecast(
    lineitem,
    ship_from: str = "1996-01-01",
    ship_to: str = "1997-01-01",
    disc_cents_lo: int = 3,
    disc_cents_hi: int = 6,
    max_qty: int = 24,
):
    """TPC-H Q6-shaped pruned-read filter + scalar aggregate, all-integer.

    ``revenue_x10000 = Σ cents(l_extendedprice) · cents(l_discount)`` over
    the shipdate/discount/quantity window.  Per-batch partials are single
    rows; the driver folds a handful of integers — the minimal
    filter-aggregate shape (callers prune columns at the read:
    shipdate/discount/quantity/extendedprice only).
    """
    import pyarrow.compute as pc

    lo = pa.scalar(ship_from).cast(pa.timestamp("us"))
    hi = pa.scalar(ship_to).cast(pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        disc = _cents(batch.column("l_discount"))
        qty = batch.column("l_quantity")
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("l_shipdate"), lo),
                pc.less(batch.column("l_shipdate"), hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, disc_cents_lo),
                    pc.less_equal(disc, disc_cents_hi),
                ),
                pc.less(qty, float(max_qty)),
            ),
        )
        kept = batch.filter(mask)
        rev = pc.sum(
            pc.multiply(
                _cents(kept.column("l_extendedprice")),
                _cents(kept.column("l_discount")),
            )
        )
        return pa.table(
            {
                "revenue_x10000": pa.array([rev.as_py() or 0], pa.int64()),
                "n_rows": pa.array([kept.num_rows], pa.int64()),
            }
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    folded = partials.sum(["revenue_x10000", "n_rows"]) or {}
    return pa.table(
        {
            "revenue_x10000": pa.array(
                [folded.get("sum(revenue_x10000)") or 0], pa.int64()
            ),
            "n_rows": pa.array([folded.get("sum(n_rows)") or 0], pa.int64()),
        }
    )


def shipping_priority(
    lineitem,
    orders,
    customer,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    top_n: int = 10,
    num_partitions: int | None = None,
):
    """TPC-H Q3-shaped three-table pipeline: dimension semi-join (customer
    segment -> order filter via ``joins.semi_join_ids`` — broadcast or
    cogroup, auto-chosen by id count), then the big×big
    lineitem ⋈ orders hash join (native ``Dataset.join``), per-batch
    partial rollups, one (orderkey, orderdate) groupby, and a global
    top-N by revenue with deterministic ties (revenue desc, orderkey asc).

    Returns ``(l_orderkey, o_orderdate_us, revenue_x10000)`` — int64
    epoch-µs date and cents-product revenue, summation-order-proof.
    """
    import ray
    import pyarrow.compute as pc

    from .joins import semi_join_ids

    cut = pa.scalar(cutoff).cast(pa.timestamp("us"))

    cust_ids = customer.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": pc.cast(
                    b.filter(pc.equal(b.column("c_mktsegment"), segment)).column(
                        "c_custkey"
                    ),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )

    orders_slim = orders.map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cut)).select(
            ["o_orderkey", "o_custkey", "o_orderdate"]
        ),
        batch_format="pyarrow",
    )
    orders_seg = semi_join_ids(orders_slim, cust_ids, id_column="o_custkey").map_batches(
        lambda b: b.select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow",
    )

    def li_slim(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.greater(batch.column("l_shipdate"), cut))
        cents = _cents(kept.column("l_extendedprice"))
        disc = _cents(kept.column("l_discount"))
        return pa.table(
            {
                "l_orderkey": kept.column("l_orderkey"),
                "revenue_x10000": pc.multiply(
                    cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )

    if num_partitions is None:
        num_partitions = max(16, int(ray.cluster_resources().get("CPU", 16)))
    joined = lineitem.map_batches(li_slim, batch_format="pyarrow").join(
        orders_seg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "o_orderdate_us": pc.cast(batch.column("o_orderdate"), pa.int64()),
                "revenue_x10000": batch.column("revenue_x10000"),
            }
        )
        return (
            t.group_by(["l_orderkey", "o_orderdate_us"])
            .aggregate([("revenue_x10000", "sum")])
            .rename_columns(["l_orderkey", "o_orderdate_us", "revenue_x10000"])
        )

    rolled = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate_us"])
        .sum("revenue_x10000")
    )
    top = (
        rolled.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b.column("l_orderkey"),
                    "o_orderdate_us": b.column("o_orderdate_us"),
                    "revenue_x10000": pc.cast(
                        b.column("sum(revenue_x10000)"), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(key=["revenue_x10000", "l_orderkey"], descending=[True, False])
        .limit(top_n)
    )
    return top


def events_rollup(events, width_s: int = 86400):
    """GROUP BY ROLLUP(day, event_type) over the event log — leaf rows,
    per-day subtotals and the grand total from ONE shuffle.

    Grouping sets are a Ray Data gap; the classic distributed shape is a
    tagged union: the per-batch combiner emits every partial row once per
    rollup level — ``(day, type)``, ``(day, *)``, ``(*, *)`` — with
    sentinel keys (day ``-1`` / type ``''``, impossible in real data), and
    a single ``groupby`` folds all three levels together.  Shuffle volume
    is 3× the combined partials (days × types per batch — tiny), never 3×
    the data; the final map converts sentinels to SQL NULLs so the result
    is exactly DuckDB's ``GROUP BY ROLLUP``.

    Returns ``(day_s, event_type, n_events, value_cents)`` with the
    standard nullable rollup columns.
    """
    w_us = width_s * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), w_us),
            pa.scalar(width_s, pa.int64()),
        )
        t = pa.table(
            {
                "day_s": day,
                "event_type": batch.column("event_type"),
                "n_events": pa.nulls(len(batch), pa.int64()).fill_null(1),
                "value_cents": to_cents(batch.column("value")),
            }
        )
        leaf = (
            t.group_by(["day_s", "event_type"])
            .aggregate([("n_events", "sum"), ("value_cents", "sum")])
            .rename_columns(["day_s", "event_type", "n_events", "value_cents"])
        )
        day_lvl = pa.table(
            {
                "day_s": leaf.column("day_s"),
                "event_type": pa.nulls(len(leaf), pa.string()).fill_null(""),
                "n_events": leaf.column("n_events"),
                "value_cents": leaf.column("value_cents"),
            }
        )
        total = pa.table(
            {
                "day_s": pa.nulls(len(leaf), pa.int64()).fill_null(-1),
                "event_type": pa.nulls(len(leaf), pa.string()).fill_null(""),
                "n_events": leaf.column("n_events"),
                "value_cents": leaf.column("value_cents"),
            }
        )
        return pa.concat_tables([leaf, day_lvl, total])

    agg = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["day_s", "event_type"])
        .sum(["n_events", "value_cents"])
    )

    def finish(b: pa.Table) -> pa.Table:
        day = b.column("day_s")
        etype = b.column("event_type")
        return pa.table(
            {
                "day_s": pc.if_else(pc.equal(day, -1), pa.scalar(None, pa.int64()), day),
                "event_type": pc.if_else(
                    pc.equal(etype, ""), pa.scalar(None, pa.string()), etype
                ),
                "n_events": pc.cast(b.column("sum(n_events)"), pa.int64()),
                "value_cents": pc.cast(b.column("sum(value_cents)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
