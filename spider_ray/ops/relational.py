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
