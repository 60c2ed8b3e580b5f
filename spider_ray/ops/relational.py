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


def order_priority_check(
    orders,
    lineitem,
    date_from: str = "1996-07-01",
    date_to: str = "1996-10-01",
    qty_gt: float = 45.0,
):
    """TPC-H Q4 shape — EXISTS semi-join of two fact tables.

    ``(o_orderpriority, n_orders)`` over orders in ``[date_from, date_to)``
    that have AT LEAST ONE lineitem with ``l_quantity > qty_gt`` (the
    schema's analogue of Q4's ``commitdate < receiptdate`` — a
    lineitem-local predicate).

    Plan: the lineitem side reduces per batch to DISTINCT qualifying
    orderkeys (C++ group_by — duplicates never shuffle), then
    :func:`~spider_ray.ops.joins.semi_join_ids` picks broadcast vs cogroup
    by the qualifying-id count; the surviving orders fold to a per-batch
    priority partial and one tiny groupby.  No wide row ever moves: the
    only shuffled payloads are int64 orderkeys and (priority, count)
    partials.
    """
    from datetime import datetime, timezone

    from .joins import semi_join_ids

    def _us(s: str) -> int:
        return int(
            datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc).timestamp()
            * 1_000_000
        )

    lo, hi = _us(date_from), _us(date_to)

    def qualifying_ids(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.greater(batch.column("l_quantity"), qty_gt))
        return (
            pa.table({"o_orderkey": hit.column("l_orderkey")})
            .group_by(["o_orderkey"])
            .aggregate([])
        )

    def in_window(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("o_orderdate"), pa.int64())
        return batch.filter(
            pc.and_(pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
                    pc.less(ts, pa.scalar(hi, pa.int64())))
        )

    ids = lineitem.map_batches(qualifying_ids, batch_format="pyarrow")
    window = orders.map_batches(in_window, batch_format="pyarrow")
    hits = semi_join_ids(window, ids, id_column="o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "n_orders": pa.nulls(len(batch), pa.int64()).fill_null(1),
            }
        )
        return (
            t.group_by(["o_orderpriority"])
            .aggregate([("n_orders", "sum")])
            .rename_columns(["o_orderpriority", "n_orders"])
        )

    rolled = (
        hits.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .sum("n_orders")
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "n_orders": pc.cast(b.column("sum(n_orders)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def customer_order_distribution(customer, orders):
    """TPC-H Q13 shape — LEFT OUTER big×big aggregation WITHOUT a join
    operator: ``(c_count, n_custs)`` = how many customers placed exactly
    ``c_count`` orders, INCLUDING the zero-order customers.

    Plan (referentially exact — only custkeys present in ``customer``
    count, orphan orders are dropped like the SQL LEFT JOIN does): both
    sides reduce per batch to slim tagged partials — ``(custkey, n, tag)``
    where the orders side pre-counts per batch — then ONE coarse shuffle by
    ``hash(custkey) & 63`` co-locates each customer with its counts; each
    of the 64 partitions folds with two C++ group_bys and a left-outer
    pyarrow join, emitting an already-tiny ``(c_count, n_custs)``
    histogram partial.  Native ``Dataset.join`` is avoided deliberately:
    it crashes on empty hash partitions (Ray 2.49) and would shuffle wide
    rows; here nothing wider than 17 bytes moves.
    """
    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()

    def cust_slim(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "n": pa.nulls(batch.num_rows, pa.int64()).fill_null(0),
                "tag": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
            }
        )
        return t.append_column("part", coarse_part(t.column("custkey"), nparts))

    def order_partials(batch: pa.Table) -> pa.Table:
        c = (
            pa.table({"custkey": pc.cast(batch.column("o_custkey"), pa.int64())})
            .group_by(["custkey"])
            .aggregate([([], "count_all")])
            .rename_columns(["custkey", "n"])
        )
        t = c.append_column("tag", pa.nulls(c.num_rows, pa.int8()).fill_null(0))
        return t.append_column("part", coarse_part(t.column("custkey"), nparts))

    def fold_partition(group: pa.Table) -> pa.Table:
        custs = (
            group.filter(pc.equal(group.column("tag"), 1))
            .select(["custkey"])
            .group_by(["custkey"])
            .aggregate([])
        )
        counts = (
            group.filter(pc.equal(group.column("tag"), 0))
            .select(["custkey", "n"])
            .group_by(["custkey"])
            .aggregate([("n", "sum")])
            .rename_columns(["custkey", "c_count"])
        )
        j = custs.join(counts, keys=["custkey"], join_type="left outer")
        c_count = j.column("c_count").combine_chunks().fill_null(0)
        return (
            pa.table({"c_count": c_count})
            .group_by(["c_count"])
            .aggregate([([], "count_all")])
            .rename_columns(["c_count", "n_custs"])
        )

    partials = (
        orders.map_batches(order_partials, batch_format="pyarrow")
        .union(customer.map_batches(cust_slim, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold_partition, batch_format="pyarrow")
    )
    rolled = partials.groupby("c_count").sum("n_custs")
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "c_count": pc.cast(b.column("c_count"), pa.int64()),
                "n_custs": pc.cast(b.column("sum(n_custs)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def regional_revenue(lineitem, dims: pa.Table):
    """TPC-H Q5 shape — fact table vs a broadcast dimension chain.

    ``dims`` is the pre-joined supplier→nation(→region-filtered) lookup
    ``(l_suppkey, n_name)`` — dimension tables are small by definition, so
    the chain join happens once driver-side (pyarrow) and broadcasts ONCE
    via ``ray.put``; every fact batch inner-joins against it in C++ and
    folds to per-nation integer partials.  The fact table never shuffles
    at all — the only exchange is the final nations-sized groupby.

    Returns ``(n_name, n_items, revenue_x10000)`` with the same
    pure-integer revenue as :func:`order_priority_revenue`.
    """
    import ray

    dims_ref = ray.put(dims)

    class _Score:
        def __init__(self):
            self.dims = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = _cents(batch.column("l_extendedprice"))
            disc = _cents(batch.column("l_discount"))
            t = pa.table(
                {
                    "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                    "n_items": pa.nulls(len(batch), pa.int64()).fill_null(1),
                    "revenue_x10000": pc.multiply(
                        cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                    ),
                }
            )
            j = t.join(self.dims, keys=["l_suppkey"], join_type="inner")
            return (
                j.group_by(["n_name"])
                .aggregate([("n_items", "sum"), ("revenue_x10000", "sum")])
                .rename_columns(["n_name", "n_items", "revenue_x10000"])
            )

    from ..poolsize import autoscale_pool

    partials = lineitem.map_batches(
        _Score,
        batch_format="pyarrow",
        concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )
    rolled = partials.groupby("n_name").sum(["n_items", "revenue_x10000"])
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "n_name": b.column("n_name"),
                "n_items": pc.cast(b.column("sum(n_items)"), pa.int64()),
                "revenue_x10000": pc.cast(b.column("sum(revenue_x10000)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def supplier_nation_dims(sf_dir: str, region: str | None = "ASIA") -> pa.Table:
    """Driver-side dimension chain for :func:`regional_revenue`:
    supplier ⋈ nation (⋈ region filter) → ``(l_suppkey, n_name)``.
    Dimension reads are column-pruned single-file pyarrow reads."""
    import os

    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    if region is not None:
        reg = pq.read_table(
            os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
        )
        reg = reg.filter(pc.equal(reg.column("r_name"), region))
        nat = nat.join(
            reg.select(["r_regionkey"]),
            keys=["n_regionkey"],
            right_keys=["r_regionkey"],
            join_type="inner",
        )
    dims = sup.join(
        nat.select(["n_nationkey", "n_name"]),
        keys=["s_nationkey"],
        right_keys=["n_nationkey"],
        join_type="inner",
    )
    return pa.table(
        {
            "l_suppkey": pc.cast(dims.column("s_suppkey"), pa.int64()),
            "n_name": dims.column("n_name"),
        }
    )


def promo_revenue(lineitem, part_dims: pa.Table):
    """TPC-H Q14 shape — promotion revenue share per ship month.

    ``part_dims`` is the driver-built ``(l_partkey, is_promo)`` lookup from
    the ``part`` dimension (see :func:`part_promo_dims`), broadcast once;
    each fact batch joins in C++ and folds ``(ym, promo_revenue_x10000,
    total_revenue_x10000)`` integer partials — the share stays a ratio of
    two exact integers (no distributed float division), computable by the
    consumer at display time.  ``ym`` is ``year*100 + month`` of
    ``l_shipdate``.
    """
    import ray

    dims_ref = ray.put(part_dims)

    class _Score:
        def __init__(self):
            self.dims = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = _cents(batch.column("l_extendedprice"))
            disc = _cents(batch.column("l_discount"))
            rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
            ship = batch.column("l_shipdate")
            ym = pc.add(
                pc.multiply(pc.cast(pc.year(ship), pa.int64()),
                            pa.scalar(100, pa.int64())),
                pc.cast(pc.month(ship), pa.int64()),
            )
            t = pa.table(
                {
                    "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                    "ym": ym,
                    "total_revenue_x10000": rev,
                }
            )
            j = t.join(self.dims, keys=["l_partkey"], join_type="inner")
            promo = pc.multiply(
                j.column("total_revenue_x10000"),
                pc.cast(j.column("is_promo"), pa.int64()),
            )
            j = j.drop_columns(["l_partkey", "is_promo"]).append_column(
                "promo_revenue_x10000", promo
            )
            return (
                j.group_by(["ym"])
                .aggregate(
                    [("promo_revenue_x10000", "sum"), ("total_revenue_x10000", "sum")]
                )
                .rename_columns(
                    ["ym", "promo_revenue_x10000", "total_revenue_x10000"]
                )
            )

    from ..poolsize import autoscale_pool

    partials = lineitem.map_batches(
        _Score, batch_format="pyarrow", concurrency=autoscale_pool(1), num_cpus=0.5
    )
    rolled = partials.groupby("ym").sum(
        ["promo_revenue_x10000", "total_revenue_x10000"]
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "ym": pc.cast(b.column("ym"), pa.int64()),
                "promo_revenue_x10000": pc.cast(
                    b.column("sum(promo_revenue_x10000)"), pa.int64()
                ),
                "total_revenue_x10000": pc.cast(
                    b.column("sum(total_revenue_x10000)"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def part_promo_dims(sf_dir: str, promo_type: str = "PROMO") -> pa.Table:
    """Driver-side ``(l_partkey, is_promo)`` lookup from the part
    dimension (column-pruned single-file read)."""
    import os

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    return pa.table(
        {
            "l_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
            "is_promo": pc.cast(
                pc.equal(part.column("p_type"), promo_type), pa.int8()
            ),
        }
    )


def best_line_per_order(lineitem):
    """Per-group argmax row (dedup-keep-best): for every order, its
    highest-revenue lineitem — ``(l_orderkey, l_linenumber,
    revenue_x10000)``, ties broken by lowest linenumber.

    The distributed argmax trick: pack ``(revenue, tiebreak)`` into ONE
    int64 — ``pack = revenue_x10000 * 16 + (15 - linenumber)`` (revenue
    cents×100 < 2^40, linenumber < 16 in TPC-H) — so per-group argmax
    with a deterministic tiebreak becomes a plain associative ``max``:
    per-batch C++ group_by(max) combiner, ONE slim (orderkey, pack)
    shuffle, global max, unpack.  No row payload ever moves and no
    join-back pass is needed; for payloads too wide to pack, the second
    pass is a :func:`~spider_ray.ops.joins.semi_join_ids` against the
    winner keys.
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("l_extendedprice"))
        disc = _cents(batch.column("l_discount"))
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
        line = pc.cast(batch.column("l_linenumber"), pa.int64())
        line_max = pc.max(line).as_py()
        line_min = pc.min(line).as_py()
        if line_max is not None and (line_max > 15 or line_min < 0):
            # 4 tiebreak bits by contract — fail loudly, never mis-order
            raise ValueError(
                f"best_line_per_order: l_linenumber range [{line_min}, "
                f"{line_max}] exceeds the packed tiebreak range (0..15)"
            )
        rev_min = pc.min(rev).as_py()
        if rev_min is not None and rev_min < 0:
            # negative pack would unpack garbage via trunc-div/bit-and
            raise ValueError(
                f"best_line_per_order: negative revenue {rev_min} is outside "
                "the packed-argmax domain (discount > 100%?)"
            )
        pack = pc.add(
            pc.multiply(rev, pa.scalar(16, pa.int64())),
            pc.subtract(pa.scalar(15, pa.int64()), line),
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "pack": pack,
            }
        )
        return (
            t.group_by(["l_orderkey"])
            .aggregate([("pack", "max")])
            .rename_columns(["l_orderkey", "pack"])
        )

    rolled = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .max("pack")
    )

    def unpack(b: pa.Table) -> pa.Table:
        pack = pc.cast(b.column("max(pack)"), pa.int64())
        rev = pc.divide(pack, pa.scalar(16, pa.int64()))
        line = pc.subtract(
            pa.scalar(15, pa.int64()),
            pc.bit_wise_and(pack, pa.scalar(15, pa.int64())),
        )
        return pa.table(
            {
                "l_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "l_linenumber": line,
                "revenue_x10000": rev,
            }
        )

    return rolled.map_batches(unpack, batch_format="pyarrow")


def daily_revenue_anomaly(orders, window_days: int = 7):
    """``(day_s, revenue_cents, trailing_cents, ratio_bp)`` per order day
    with a strictly-prior ``window_days``-day revenue baseline — the
    day-over-baseline anomaly readout (spike/drop detection).  Rows where
    the trailing window is empty (the first days) are dropped;
    ``ratio_bp`` = today × 10⁴ // trailing, integer basis points.

    Scale shape: the fact table folds to per-day integer partials in one
    combiner pass + one ``groupby(day)`` of slim rows; the trailing-window
    comparison then runs over the DAY-level aggregate, which is bounded by
    the calendar (≤ a few thousand rows for any corpus) — aggregate-then-
    window is the correct distribution of every "vs trailing baseline"
    op: the window never touches fact rows.
    """
    import ray.data

    from .numeric import to_cents

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(batch.column("o_orderdate"), pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()),
        )
        t = pa.table(
            {"day": day, "cents": to_cents(batch.column("o_totalprice"))}
        )
        return (
            t.group_by(["day"]).aggregate([("cents", "sum")])
            .rename_columns(["day", "cents"])
        )

    rolled = orders.map_batches(partial, batch_format="pyarrow").groupby("day").sum(
        "cents"
    )
    parts = [
        b for b in rolled.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.table({"day_s": pa.array([], pa.int64()),
                      "revenue_cents": pa.array([], pa.int64()),
                      "trailing_cents": pa.array([], pa.int64()),
                      "ratio_bp": pa.array([], pa.int64())})
        )
    import numpy as np

    tbl = pa.concat_tables(parts)
    order = pc.sort_indices(tbl.column("day"))
    days = np.asarray(pc.take(tbl.column("day"), order))
    cents = np.asarray(pc.cast(pc.take(tbl.column("sum(cents)"), order), pa.int64()))
    # dense day axis so gaps contribute zero to the trailing sum
    lo, hi = int(days[0]), int(days[-1])
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[days - lo] = cents
    csum = np.concatenate(([0], np.cumsum(dense)))
    pos = days - lo
    trail = csum[pos] - csum[np.maximum(pos - window_days, 0)]
    keep = trail > 0
    ratio = np.zeros(len(days), dtype=np.int64)
    ratio[keep] = (cents[keep] * 10_000) // trail[keep]
    return ray.data.from_arrow(
        pa.table(
            {
                "day_s": pa.array(days[keep] * 86_400, pa.int64()),
                "revenue_cents": pa.array(cents[keep], pa.int64()),
                "trailing_cents": pa.array(trail[keep], pa.int64()),
                "ratio_bp": pa.array(ratio[keep], pa.int64()),
            }
        )
    )
