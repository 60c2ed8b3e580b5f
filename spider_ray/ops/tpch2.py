"""Second batch of TPC-H-shaped relational operators — each exercises a
DISTINCT distributed pattern over the star schema, all integer-exact
(money in cents, shares as integer ppm) so the DuckDB oracles match bit
for bit:

* :func:`small_qty_revenue` (Q17) — correlated per-group average:
  two passes over the fact table with the per-part aggregate broadcast
  between them; the avg predicate is evaluated as a cross-multiplied
  integer comparison (``qty·5·cnt < sum``), never a float division.
* :func:`large_orders` (Q18) — HAVING on a fact aggregate, winners
  broadcast back as a semi-join (winners are rare by construction, so
  the broadcast side is tiny even at scale).
* :func:`top_returned_customers` (Q10) — big×big fact co-group on a
  coarse hash partition, then top-k with pinned tie order and a
  dimension join applied only to the k winners.
* :func:`dormant_customers` (Q22) — broadcast global scalar (exact
  integer avg predicate) + bloom/set ANTI semi-join.
* :func:`top_supplier` (Q15) — aggregate → global max (driver folds
  per-block partial maxima, O(blocks) rows) → tie-keeping filter.
* :func:`nation_trade_volume` (Q7) — three-table big×big chain as TWO
  coarse slim co-groups (orders⋈customer by custkey, then
  lineitem⋈that by orderkey); nothing wider than ~24 bytes shuffles.
* :func:`brand_revenue_share` (Q11 shape) — group total vs broadcast
  global total, integer ppm share.
* :func:`supplier_part_counts` (Q16) — COUNT(DISTINCT) via in-batch
  dedup → slim-triple shuffle → per-partition distinct fold, with a
  broadcast NOT-IN supplier exclusion.

Reference: spider has no SQL layer — these cover the training-data
engine's relational surface the way `ops/relational.py` does, with the
reference's corpus-join discipline (slim partials, broadcast small
sides, one reusable partition key) from SURVEY.md §2.4.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .numeric import to_cents


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated per-part average)
# ---------------------------------------------------------------------------


def small_qty_revenue(lineitem, brand_partkeys: pa.Table):
    """``(n_items, revenue_cents)`` over lineitems of the given brand's
    parts whose quantity is BELOW 20% of that part's average quantity.

    Pass 1 folds ``(partkey, sum(qty_x100), cnt)`` for the brand's parts
    only (the brand filter is an ``is_in`` against the broadcast partkey
    vector, so ~1/25 of the fact stream survives the first batch kernel);
    the per-part aggregate is O(brand parts) and broadcasts back for pass
    2, where the Q17 predicate runs as the exact integer comparison
    ``qty_x100 · 5 · cnt < sum_x100`` — no float division anywhere, so the
    DuckDB oracle (same cross-multiplication) matches exactly.
    """
    import ray

    keys_ref = ray.put(brand_partkeys)

    class _QtyPartial:
        def __init__(self):
            self.keys = ray.get(keys_ref).column("l_partkey")

        def __call__(self, batch: pa.Table) -> pa.Table:
            hit = batch.filter(
                pc.is_in(pc.cast(batch.column("l_partkey"), pa.int64()),
                         value_set=self.keys)
            )
            t = pa.table(
                {
                    "l_partkey": pc.cast(hit.column("l_partkey"), pa.int64()),
                    "qty_x100": to_cents(hit.column("l_quantity")),
                    "cnt": pa.nulls(len(hit), pa.int64()).fill_null(1),
                }
            )
            return (
                t.group_by(["l_partkey"])
                .aggregate([("qty_x100", "sum"), ("cnt", "sum")])
                .rename_columns(["l_partkey", "sum_x100", "cnt"])
            )

    from ..poolsize import autoscale_pool

    partials = lineitem.map_batches(
        _QtyPartial, batch_format="pyarrow", concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )
    rolled = partials.groupby("l_partkey").sum(["sum_x100", "cnt"])
    # O(brand parts) rows — dimension-class by construction
    stats = pa.concat_tables(
        [b for b in rolled.iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows]
        or [pa.table({"l_partkey": pa.array([], pa.int64()),
                      "sum(sum_x100)": pa.array([], pa.int64()),
                      "sum(cnt)": pa.array([], pa.int64())})]
    ).rename_columns(["l_partkey", "sum_x100", "cnt"])
    stats_ref = ray.put(stats)

    class _Filter:
        def __init__(self):
            self.stats = ray.get(stats_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                    "qty_x100": to_cents(batch.column("l_quantity")),
                    "price_cents": to_cents(batch.column("l_extendedprice")),
                }
            )
            j = t.join(self.stats, keys=["l_partkey"], join_type="inner")
            keep = pc.less(
                pc.multiply(
                    pc.multiply(j.column("qty_x100"), pa.scalar(5, pa.int64())),
                    j.column("cnt"),
                ),
                j.column("sum_x100"),
            )
            j = j.filter(keep)
            return pa.table(
                {
                    "n_items": pa.array([len(j)], pa.int64()),
                    "revenue_cents": pa.array(
                        [pc.sum(j.column("price_cents")).as_py() or 0], pa.int64()
                    ),
                }
            )

    partials2 = lineitem.map_batches(
        _Filter, batch_format="pyarrow", concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pa.array(
                    [pc.sum(batch.column("n_items")).as_py() or 0], pa.int64()
                ),
                "revenue_cents": pa.array(
                    [pc.sum(batch.column("revenue_cents")).as_py() or 0], pa.int64()
                ),
            }
        )

    # single-row global fold: repartition(1) then one in-task sum
    return partials2.repartition(1).map_batches(fold, batch_format="pyarrow")


def brand_partkeys(sf_dir: str, brand: str = "Brand#23") -> pa.Table:
    """Driver-side dimension read: partkeys of one brand (pruned columns)."""
    import os

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    part = part.filter(pc.equal(part.column("p_brand"), brand))
    return pa.table({"l_partkey": pc.cast(part.column("p_partkey"), pa.int64())})


# ---------------------------------------------------------------------------
# Q18 — large orders (HAVING + winner broadcast)
# ---------------------------------------------------------------------------


def large_orders(lineitem, orders, customer_names: pa.Table,
                 qty_threshold: float = 300.0):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds the
    threshold, joined back to order + customer attributes.

    ``(c_name, o_custkey, o_orderkey, o_orderdate_s, o_totalprice_cents,
    total_qty_x100)``.  The per-order quantity rollup shuffles only
    ``(orderkey, qty_x100)`` partials (in-batch C++ combiner first); the
    HAVING filter makes winners rare by construction, so they broadcast as
    a semi-join table to the orders stream, and the customer dimension
    joins only against surviving orders.
    """
    import ray

    thr = int(round(qty_threshold * 100))

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "qty_x100": to_cents(batch.column("l_quantity")),
            }
        )
        return (
            t.group_by(["o_orderkey"])
            .aggregate([("qty_x100", "sum")])
            .rename_columns(["o_orderkey", "qty_x100"])
        )

    rolled = (
        lineitem.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .sum("qty_x100")
    )
    winners = pa.concat_tables(
        [b for b in rolled.map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b.column("o_orderkey"),
                    "total_qty_x100": pc.cast(b.column("sum(qty_x100)"), pa.int64()),
                }
            ).filter(pc.greater(pc.cast(b.column("sum(qty_x100)"), pa.int64()),
                                pa.scalar(thr, pa.int64()))),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
        or [pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "total_qty_x100": pa.array([], pa.int64())})]
    )
    win_ref = ray.put(winners)
    cust_ref = ray.put(customer_names)

    class _Attach:
        def __init__(self):
            self.winners = ray.get(win_ref)
            self.cust = ray.get(cust_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
                    "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                    "o_orderdate_s": pc.divide(
                        pc.cast(batch.column("o_orderdate"), pa.int64()),
                        pa.scalar(1_000_000, pa.int64()),
                    ),
                    "o_totalprice_cents": to_cents(batch.column("o_totalprice")),
                }
            )
            j = t.join(self.winners, keys=["o_orderkey"], join_type="inner")
            return j.join(self.cust, keys=["o_custkey"], join_type="inner")

    from ..poolsize import autoscale_pool

    return orders.map_batches(
        _Attach, batch_format="pyarrow", concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )


def customer_names(sf_dir: str) -> pa.Table:
    import os

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    return pa.table(
        {
            "o_custkey": pc.cast(cust.column("c_custkey"), pa.int64()),
            "c_name": cust.column("c_name"),
        }
    )


# ---------------------------------------------------------------------------
# Q10 — top returned-revenue customers (big×big co-group + top-k)
# ---------------------------------------------------------------------------


def top_returned_customers(lineitem, orders, cust_dims: pa.Table, k: int = 20,
                           date_from: str = "1996-01-01",
                           date_to: str = "1997-01-01"):
    """``(c_custkey, c_name, n_name, revenue_x10000, c_acctbal_cents)`` for
    the ``k`` customers with the highest revenue from RETURNED items
    (``l_returnflag = 'R'``) on orders inside the date window; ties pinned
    by ``(revenue desc, custkey asc)``.

    The lineitem→orders attach is the slim tagged co-group from
    `customer_distribution`: both sides reduce to ≤16-byte rows keyed by
    orderkey, ONE coarse ``hash(orderkey) & 63`` shuffle co-locates them,
    each partition joins + folds ``(custkey, revenue)`` in C++, and the
    final per-customer rollup is a second slim groupby.  Customer and
    nation attributes join only against the k winners, driver-side.
    """
    from datetime import datetime, timezone

    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()

    def _us(s: str) -> int:
        return int(
            datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc).timestamp()
            * 1_000_000
        )

    lo, hi = _us(date_from), _us(date_to)

    def li_slim(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        cents = to_cents(hit.column("l_extendedprice"))
        disc = to_cents(hit.column("l_discount"))
        t = pa.table(
            {
                "okey": pc.cast(hit.column("l_orderkey"), pa.int64()),
                "rev": pc.multiply(
                    cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )
        t = (
            t.group_by(["okey"]).aggregate([("rev", "sum")])
            .rename_columns(["okey", "rev"])
        )
        return pa.table(
            {
                "okey": t.column("okey"),
                "ckey": pa.nulls(len(t), pa.int64()),
                "rev": t.column("rev"),
                "part": coarse_part(t.column("okey"), nparts),
            }
        )

    def ord_slim(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("o_orderdate"), pa.int64())
        hit = batch.filter(
            pc.and_(pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
                    pc.less(ts, pa.scalar(hi, pa.int64())))
        )
        okey = pc.cast(hit.column("o_orderkey"), pa.int64())
        return pa.table(
            {
                "okey": okey,
                "ckey": pc.cast(hit.column("o_custkey"), pa.int64()),
                "rev": pa.nulls(len(hit), pa.int64()),
                "part": coarse_part(okey, nparts),
            }
        )

    def part_fold(group: pa.Table) -> pa.Table:
        li = group.filter(pc.is_valid(group.column("rev")))
        od = group.filter(pc.is_valid(group.column("ckey")))
        j = pa.table({"okey": li.column("okey"), "rev": li.column("rev")}).join(
            pa.table({"okey": od.column("okey"), "ckey": od.column("ckey")}),
            keys=["okey"], join_type="inner",
        )
        return (
            j.group_by(["ckey"]).aggregate([("rev", "sum")])
            .rename_columns(["c_custkey", "revenue_x10000"])
        )

    li_parts = lineitem.map_batches(li_slim, batch_format="pyarrow")
    ord_parts = orders.map_batches(ord_slim, batch_format="pyarrow")
    per_cust = (
        li_parts.union(ord_parts)
        .groupby("part")
        .map_groups(part_fold, batch_format="pyarrow")
        .groupby("c_custkey")
        .sum("revenue_x10000")
    )
    # top-k fold: per-block partial top-k, tiny driver merge
    def block_topk(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "revenue_x10000": pc.cast(
                    batch.column("sum(revenue_x10000)"), pa.int64()
                ),
            }
        )
        order = pc.sort_indices(
            t, sort_keys=[("revenue_x10000", "descending"), ("c_custkey", "ascending")]
        )
        return t.take(order.slice(0, min(k, len(order))))

    parts = [
        b for b in per_cust.map_batches(block_topk, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows
    ]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"c_custkey": pa.array([], pa.int64()),
         "revenue_x10000": pa.array([], pa.int64())}
    )
    order = pc.sort_indices(
        merged,
        sort_keys=[("revenue_x10000", "descending"), ("c_custkey", "ascending")],
    )
    top = merged.take(order.slice(0, min(k, len(order))))
    out = top.join(cust_dims, keys=["c_custkey"], join_type="inner")
    out = out.sort_by([("revenue_x10000", "descending"), ("c_custkey", "ascending")])
    import ray.data

    return ray.data.from_arrow(
        out.select(
            ["c_custkey", "c_name", "n_name", "revenue_x10000", "c_acctbal_cents"]
        )
    )


def customer_nation_dims(sf_dir: str) -> pa.Table:
    """(c_custkey, c_name, n_name, c_acctbal_cents) driver-side dim chain."""
    import os

    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"],
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    j = cust.join(nat, keys=["c_nationkey"], right_keys=["n_nationkey"],
                  join_type="inner")
    return pa.table(
        {
            "c_custkey": pc.cast(j.column("c_custkey"), pa.int64()),
            "c_name": j.column("c_name"),
            "n_name": j.column("n_name"),
            "c_acctbal_cents": to_cents(j.column("c_acctbal")),
        }
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar broadcast + ANTI join)
# ---------------------------------------------------------------------------


def dormant_customers(customer, orders, cutoff: str = "2000-01-01"):
    """``(c_mktsegment, n_custs, total_acctbal_cents)`` over customers whose
    account balance is strictly above the global average of POSITIVE
    balances and who placed NO order on/after ``cutoff`` ("dormant").

    The global average broadcasts as its exact integer pieces
    ``(sum_cents, n)`` and the predicate evaluates as
    ``bal_cents · n > sum_cents`` — cross-multiplied, division-free, so
    the SQL oracle (same form) agrees exactly.  The "no recent order"
    side reduces to DISTINCT custkeys per batch before the ANTI
    semi-join (`joins.semi_join_ids` picks broadcast vs bloom/cogroup by
    id count).
    """
    from datetime import datetime, timezone

    from .joins import semi_join_ids

    cut = int(
        datetime.strptime(cutoff, "%Y-%m-%d").replace(tzinfo=timezone.utc).timestamp()
        * 1_000_000
    )

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch.column("c_acctbal"))
        pos = pc.greater(cents, pa.scalar(0, pa.int64()))
        kept = pc.if_else(pos, cents, pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "s": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
                "n": pa.array(
                    [pc.sum(pc.cast(pos, pa.int64())).as_py() or 0], pa.int64()
                ),
            }
        )

    stats = (
        customer.map_batches(bal_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda b: pa.table(
                {
                    "s": pa.array([pc.sum(b.column("s")).as_py() or 0], pa.int64()),
                    "n": pa.array([pc.sum(b.column("n")).as_py() or 0], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()  # exactly one tiny row (zero when customer is empty)
    )
    if not stats:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_custs": pa.array([], pa.int64()),
                    "total_acctbal_cents": pa.array([], pa.int64()),
                }
            )
        )
    sum_cents, n_pos = int(stats[0]["s"]), int(stats[0]["n"])

    def recent_ids(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("o_orderdate"), pa.int64())
        hit = batch.filter(pc.greater_equal(ts, pa.scalar(cut, pa.int64())))
        return (
            pa.table({"c_custkey": pc.cast(hit.column("o_custkey"), pa.int64())})
            .group_by(["c_custkey"]).aggregate([])
        )

    def rich(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch.column("c_acctbal"))
        keep = pc.greater(
            pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_cents, pa.int64()),
        )
        t = batch.append_column("c_acctbal_cents", cents).filter(keep)
        return pa.table(
            {
                "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_mktsegment": t.column("c_mktsegment"),
                "c_acctbal_cents": t.column("c_acctbal_cents"),
            }
        )

    ids = orders.map_batches(recent_ids, batch_format="pyarrow")
    rich_ds = customer.map_batches(rich, batch_format="pyarrow")
    dormant = semi_join_ids(rich_ds, ids, id_column="c_custkey", anti=True)

    def seg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "n_custs": pa.nulls(len(batch), pa.int64()).fill_null(1),
                "total_acctbal_cents": batch.column("c_acctbal_cents"),
            }
        )
        return (
            t.group_by(["c_mktsegment"])
            .aggregate([("n_custs", "sum"), ("total_acctbal_cents", "sum")])
            .rename_columns(["c_mktsegment", "n_custs", "total_acctbal_cents"])
        )

    rolled = (
        dormant.map_batches(seg_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .sum(["n_custs", "total_acctbal_cents"])
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "c_mktsegment": b.column("c_mktsegment"),
                "n_custs": pc.cast(b.column("sum(n_custs)"), pa.int64()),
                "total_acctbal_cents": pc.cast(
                    b.column("sum(total_acctbal_cents)"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by revenue (global max with ties)
# ---------------------------------------------------------------------------


def top_supplier(lineitem, supplier_names: pa.Table,
                 date_from: str = "1996-01-01", date_to: str = "1996-04-01"):
    """``(s_suppkey, s_name, total_revenue_x10000)`` for the supplier(s)
    achieving the MAXIMUM revenue in the window (ties all kept — Q15's
    view-max semantics).

    Per-supplier revenue folds through the usual slim combiner→groupby;
    the global max folds per-block partial maxima on the driver
    (O(blocks) rows), then a tie-keeping filter + broadcast name join.
    """
    from datetime import datetime, timezone

    import ray

    def _us(s: str) -> int:
        return int(
            datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc).timestamp()
            * 1_000_000
        )

    lo, hi = _us(date_from), _us(date_to)

    def rev_partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("l_shipdate"), pa.int64())
        hit = batch.filter(
            pc.and_(pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
                    pc.less(ts, pa.scalar(hi, pa.int64())))
        )
        cents = to_cents(hit.column("l_extendedprice"))
        disc = to_cents(hit.column("l_discount"))
        t = pa.table(
            {
                "s_suppkey": pc.cast(hit.column("l_suppkey"), pa.int64()),
                "rev": pc.multiply(
                    cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                ),
            }
        )
        return (
            t.group_by(["s_suppkey"]).aggregate([("rev", "sum")])
            .rename_columns(["s_suppkey", "rev"])
        )

    rolled = (
        lineitem.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("rev")
    ).materialize()
    blocks = [
        b for b in rolled.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not blocks:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "total_revenue_x10000": pa.array([], pa.int64())})
        )
    best = max(pc.max(b.column("sum(rev)")).as_py() for b in blocks)
    names_ref = ray.put(supplier_names)

    def winners(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "s_suppkey": batch.column("s_suppkey"),
                "total_revenue_x10000": pc.cast(batch.column("sum(rev)"), pa.int64()),
            }
        )
        t = t.filter(
            pc.equal(t.column("total_revenue_x10000"), pa.scalar(best, pa.int64()))
        )
        j = t.join(ray.get(names_ref), keys=["s_suppkey"], join_type="inner")
        return j.select(["s_suppkey", "s_name", "total_revenue_x10000"])

    return rolled.map_batches(winners, batch_format="pyarrow")


def supplier_names(sf_dir: str) -> pa.Table:
    import os

    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    return pa.table(
        {
            "s_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64()),
            "s_name": sup.column("s_name"),
        }
    )


# ---------------------------------------------------------------------------
# Q7 — nation-to-nation trade volume (3-table chain, two slim co-groups)
# ---------------------------------------------------------------------------


def nation_trade_volume(lineitem, orders, customer, supp_nations: pa.Table):
    """``(supp_nation, cust_nation, ship_year, revenue_x10000)`` — the full
    supplier-nation × customer-nation × year revenue matrix (Q7 without
    its 2-nation restriction; output is nations² × years, dimension-class).

    The 3-table big×big chain runs as TWO coarse slim co-groups, never a
    wide shuffle:

    1. orders ``(okey, ckey)`` ⋈ customer ``(ckey, nation)`` co-grouped on
       ``hash(ckey) & 63`` → ``(okey, cust_nation)``.  Customer is a FACT
       table at scale, so its nation attach must shuffle — but only
       16-byte rows do.
    2. lineitem folds ``(okey, supp_nation, year, rev)`` partials with the
       supplier→nation dim broadcast (suppliers are dimension-class),
       then co-groups with step 1's output on ``hash(okey) & 63``.
    """
    import ray

    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()

    supp_ref = ray.put(supp_nations)

    def ord_slim(batch: pa.Table) -> pa.Table:
        okey = pc.cast(batch.column("o_orderkey"), pa.int64())
        ckey = pc.cast(batch.column("o_custkey"), pa.int64())
        return pa.table(
            {"okey": okey, "ckey": ckey,
             "nat": pa.nulls(len(batch), pa.string()),
             "part": coarse_part(ckey, nparts)}
        )

    def cust_slim(batch: pa.Table) -> pa.Table:
        ckey = pc.cast(batch.column("c_custkey"), pa.int64())
        return pa.table(
            {"okey": pa.nulls(len(batch), pa.int64()), "ckey": ckey,
             "nat": batch.column("n_name"), "part": coarse_part(ckey, nparts)}
        )

    def cust_fold(group: pa.Table) -> pa.Table:
        ords = group.filter(pc.is_valid(group.column("okey")))
        cust = group.filter(pc.is_valid(group.column("nat")))
        j = pa.table({"ckey": ords.column("ckey"), "okey": ords.column("okey")}).join(
            pa.table({"ckey": cust.column("ckey"), "cust_nation": cust.column("nat")}),
            keys=["ckey"], join_type="inner",
        )
        okey = j.column("okey")
        return pa.table(
            {"okey": okey, "cust_nation": j.column("cust_nation"),
             "part": coarse_part(okey, nparts)}
        )

    order_nation = (
        orders.map_batches(ord_slim, batch_format="pyarrow")
        .union(customer.map_batches(cust_slim, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(cust_fold, batch_format="pyarrow")
    )

    class _LiSlim:
        def __init__(self):
            self.supp = ray.get(supp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = to_cents(batch.column("l_extendedprice"))
            disc = to_cents(batch.column("l_discount"))
            t = pa.table(
                {
                    "okey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                    "l_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                    "ship_year": pc.cast(pc.year(batch.column("l_shipdate")),
                                         pa.int64()),
                    "rev": pc.multiply(
                        cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                    ),
                }
            )
            j = t.join(self.supp, keys=["l_suppkey"], join_type="inner")
            j = (
                j.group_by(["okey", "supp_nation", "ship_year"])
                .aggregate([("rev", "sum")])
                .rename_columns(["okey", "supp_nation", "ship_year", "rev"])
            )
            return pa.table(
                {
                    "okey": j.column("okey"),
                    "supp_nation": j.column("supp_nation"),
                    "cust_nation": pa.nulls(len(j), pa.string()),
                    "ship_year": j.column("ship_year"),
                    "rev": j.column("rev"),
                    "part": coarse_part(j.column("okey"), nparts),
                }
            )

    def onat_slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": batch.column("okey"),
                "supp_nation": pa.nulls(len(batch), pa.string()),
                "cust_nation": batch.column("cust_nation"),
                "ship_year": pa.nulls(len(batch), pa.int64()),
                "rev": pa.nulls(len(batch), pa.int64()),
                "part": batch.column("part"),
            }
        )

    def final_fold(group: pa.Table) -> pa.Table:
        li = group.filter(pc.is_valid(group.column("rev")))
        onat = group.filter(pc.is_valid(group.column("cust_nation")))
        j = pa.table(
            {"okey": li.column("okey"), "supp_nation": li.column("supp_nation"),
             "ship_year": li.column("ship_year"), "rev": li.column("rev")}
        ).join(
            pa.table({"okey": onat.column("okey"),
                      "cust_nation": onat.column("cust_nation")}),
            keys=["okey"], join_type="inner",
        )
        return (
            j.group_by(["supp_nation", "cust_nation", "ship_year"])
            .aggregate([("rev", "sum")])
            .rename_columns(["supp_nation", "cust_nation", "ship_year",
                             "revenue_x10000"])
        )

    from ..poolsize import autoscale_pool

    li_parts = lineitem.map_batches(
        _LiSlim, batch_format="pyarrow", concurrency=autoscale_pool(1), num_cpus=0.5
    )
    matrix_parts = (
        li_parts.union(order_nation.map_batches(onat_slim, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(final_fold, batch_format="pyarrow")
    )
    rolled = matrix_parts.groupby(["supp_nation", "cust_nation", "ship_year"]).sum(
        "revenue_x10000"
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "supp_nation": b.column("supp_nation"),
                "cust_nation": b.column("cust_nation"),
                "ship_year": b.column("ship_year"),
                "revenue_x10000": pc.cast(b.column("sum(revenue_x10000)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def supplier_nation_map(sf_dir: str) -> pa.Table:
    """(l_suppkey, supp_nation) broadcast dim for :func:`nation_trade_volume`."""
    import os

    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    j = sup.join(nat, keys=["s_nationkey"], right_keys=["n_nationkey"],
                 join_type="inner")
    return pa.table(
        {
            "l_suppkey": pc.cast(j.column("s_suppkey"), pa.int64()),
            "supp_nation": j.column("n_name"),
        }
    )


def customer_nation_map(sf_dir: str):
    """customer Dataset slimmed to (c_custkey, n_name) with the 25-nation
    dim broadcast — the CUSTOMER side stays a streaming Dataset (fact-sized
    at scale); only nation broadcasts."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nat_ref = ray.put(
        pa.table(
            {
                "c_nationkey": pc.cast(nat.column("n_nationkey"), pa.int32()),
                "n_name": nat.column("n_name"),
            }
        )
    )

    class _Attach:
        def __init__(self):
            self.nat = ray.get(nat_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            j = batch.join(self.nat, keys=["c_nationkey"], join_type="inner")
            return j.select(["c_custkey", "n_name"])

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    return cust.map_batches(_Attach, batch_format="pyarrow", concurrency=4,
                            num_cpus=0.5)


# ---------------------------------------------------------------------------
# Q11 shape — brand revenue share (group total vs broadcast global total)
# ---------------------------------------------------------------------------


def brand_revenue_share(lineitem, brand_dims: pa.Table, min_share_bp: int = 300):
    """``(p_brand, revenue_x10000, share_bp)`` for brands whose share of
    total revenue exceeds ``min_share_bp`` basis points (1 bp = 0.01%).

    One combiner pass folds per-brand integer revenue with the
    partkey→brand dim broadcast; the global total is the sum of the
    (≤ brands) group rows, computed driver-side, and the share is integer
    floor-division basis points — all exactly reproducible in SQL.  Basis
    points (×10⁴), not ppm (×10⁶): group revenue_x10000 approaches 10¹⁴
    at sf0.1 scale factors, and ×10⁶ would overflow int64.
    """
    import ray
    import ray.data

    dims_ref = ray.put(brand_dims)

    class _Score:
        def __init__(self):
            self.dims = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = to_cents(batch.column("l_extendedprice"))
            disc = to_cents(batch.column("l_discount"))
            t = pa.table(
                {
                    "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                    "rev": pc.multiply(
                        cents, pc.subtract(pa.scalar(100, pa.int64()), disc)
                    ),
                }
            )
            j = t.join(self.dims, keys=["l_partkey"], join_type="inner")
            return (
                j.group_by(["p_brand"]).aggregate([("rev", "sum")])
                .rename_columns(["p_brand", "rev"])
            )

    from ..poolsize import autoscale_pool

    rolled = (
        lineitem.map_batches(
            _Score, batch_format="pyarrow", concurrency=autoscale_pool(1),
            num_cpus=0.5,
        )
        .groupby("p_brand")
        .sum("rev")
    ).materialize()
    blocks = [
        b for b in rolled.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    total = sum(pc.sum(b.column("sum(rev)")).as_py() or 0 for b in blocks)
    if total == 0:
        return ray.data.from_arrow(
            pa.table({"p_brand": pa.array([], pa.string()),
                      "revenue_x10000": pa.array([], pa.int64()),
                      "share_bp": pa.array([], pa.int64())})
        )

    def share(batch: pa.Table) -> pa.Table:
        rev = pc.cast(batch.column("sum(rev)"), pa.int64())
        bp = pc.divide(
            pc.multiply(rev, pa.scalar(10_000, pa.int64())),
            pa.scalar(total, pa.int64()),
        )
        t = pa.table(
            {"p_brand": batch.column("p_brand"), "revenue_x10000": rev,
             "share_bp": bp}
        )
        return t.filter(
            pc.greater(t.column("share_bp"), pa.scalar(min_share_bp, pa.int64()))
        )

    return rolled.map_batches(share, batch_format="pyarrow")


def part_brand_map(sf_dir: str) -> pa.Table:
    import os

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    return pa.table(
        {
            "l_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
            "p_brand": part.column("p_brand"),
        }
    )


# ---------------------------------------------------------------------------
# Q16 shape — distinct supplier counts per part class (NOT-IN exclusion)
# ---------------------------------------------------------------------------


def supplier_part_counts(lineitem, part_class: pa.Table,
                         excluded_suppliers: pa.Table):
    """``(p_brand, size_band, supplier_cnt)`` — how many DISTINCT suppliers
    ship parts of each (brand, size-band) class, excluding a NOT-IN
    supplier list (here: suppliers with negative account balance).

    COUNT(DISTINCT) at scale: each batch joins the broadcast part-class
    dim, drops excluded suppliers (broadcast ``is_in`` — the exclusion
    list is small by construction), dedups its own ``(brand, band,
    suppkey)`` triples in C++, and only those slim distinct triples
    shuffle (coarse ``hash(suppkey) & 63``); each partition re-dedups
    across batches and folds a ``(brand, band, partial_cnt)`` histogram —
    exact because a given suppkey lands in exactly one partition.
    """
    import ray

    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()

    class_ref = ray.put(part_class)
    excl_ref = ray.put(excluded_suppliers)

    class _Slim:
        def __init__(self):
            self.cls = ray.get(class_ref)
            self.excl = ray.get(excl_ref).column("s_suppkey")

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                    "s_suppkey": pc.cast(batch.column("l_suppkey"), pa.int64()),
                }
            )
            t = t.filter(
                pc.invert(pc.is_in(t.column("s_suppkey"), value_set=self.excl))
            )
            j = t.join(self.cls, keys=["l_partkey"], join_type="inner")
            j = (
                j.group_by(["p_brand", "size_band", "s_suppkey"]).aggregate([])
            )
            return j.append_column("part", coarse_part(j.column("s_suppkey"), nparts))

    def part_fold(group: pa.Table) -> pa.Table:
        d = group.group_by(["p_brand", "size_band", "s_suppkey"]).aggregate([])
        t = pa.table(
            {
                "p_brand": d.column("p_brand"),
                "size_band": d.column("size_band"),
                "supplier_cnt": pa.nulls(len(d), pa.int64()).fill_null(1),
            }
        )
        return (
            t.group_by(["p_brand", "size_band"])
            .aggregate([("supplier_cnt", "sum")])
            .rename_columns(["p_brand", "size_band", "supplier_cnt"])
        )

    from ..poolsize import autoscale_pool

    parts = lineitem.map_batches(
        _Slim, batch_format="pyarrow", concurrency=autoscale_pool(1), num_cpus=0.5
    )
    rolled = (
        parts.groupby("part")
        .map_groups(part_fold, batch_format="pyarrow")
        .groupby(["p_brand", "size_band"])
        .sum("supplier_cnt")
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "p_brand": b.column("p_brand"),
                "size_band": b.column("size_band"),
                "supplier_cnt": pc.cast(b.column("sum(supplier_cnt)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def part_class_map(sf_dir: str, band: int = 10) -> pa.Table:
    """(l_partkey, p_brand, size_band) dim — size_band = p_size // band."""
    import os

    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    return pa.table(
        {
            "l_partkey": pc.cast(part.column("p_partkey"), pa.int64()),
            "p_brand": part.column("p_brand"),
            "size_band": pc.divide(
                pc.cast(part.column("p_size"), pa.int64()),
                pa.scalar(band, pa.int64()),
            ),
        }
    )


def negative_balance_suppliers(sf_dir: str) -> pa.Table:
    import os

    import pyarrow.parquet as pq

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_acctbal"]
    )
    sup = sup.filter(pc.less(sup.column("s_acctbal"), 0.0))
    return pa.table({"s_suppkey": pc.cast(sup.column("s_suppkey"), pa.int64())})


# ---------------------------------------------------------------------------
# Q21 shape — latest shipper per multi-supplier order
# ---------------------------------------------------------------------------


def latest_shipper_orders(lineitem, supplier_names_tbl: pa.Table):
    """TPC-H Q21 shape — per-order EXISTS analysis on a single fact table:
    for each supplier, how many MULTI-supplier orders it closed (its
    lineitem has the lexicographically greatest ``(shipdate, suppkey)`` of
    the order — the "kept everyone waiting" supplier).

    ``(s_suppkey, s_name, n_orders)``.  Per-batch C++ combiner folds
    ``(okey, suppkey) → max ship`` so duplicate lines never shuffle; ONE
    coarse ``hash(okey) & 63`` co-group merges cross-batch partials and
    resolves each order vectorized (one sort + boundary mask per
    partition — no per-order Python); only ``(suppkey, n)`` partials leave
    the partition.  Supplier names broadcast to the final |suppliers|-row
    rollup.
    """
    import numpy as np
    import ray

    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()

    def slim(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "supp": pc.cast(batch.column("l_suppkey"), pa.int64()),
                "ship": pc.cast(batch.column("l_shipdate"), pa.int64()),
            }
        )
        t = (
            t.group_by(["okey", "supp"]).aggregate([("ship", "max")])
            .rename_columns(["okey", "supp", "ship"])
        )
        return t.append_column("part", coarse_part(t.column("okey"), nparts))

    def fold(group: pa.Table) -> pa.Table:
        g = (
            group.group_by(["okey", "supp"]).aggregate([("ship", "max")])
            .rename_columns(["okey", "supp", "ship"])
        )
        idx = pc.sort_indices(
            g, sort_keys=[("okey", "ascending"), ("ship", "descending"),
                          ("supp", "descending")],
        )
        g = g.take(idx)
        okeys = np.asarray(g.column("okey"))
        supps = np.asarray(g.column("supp"))
        first = np.ones(len(okeys), dtype=bool)
        first[1:] = okeys[1:] != okeys[:-1]
        # per-order supplier count: run-length of each okey block
        starts = np.nonzero(first)[0]
        lens = np.diff(np.append(starts, len(okeys)))
        winners = supps[starts[lens >= 2]]
        t = pa.table(
            {
                "s_suppkey": pa.array(winners, pa.int64()),
                "n_orders": pa.array(np.ones(len(winners), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["s_suppkey"]).aggregate([("n_orders", "sum")])
            .rename_columns(["s_suppkey", "n_orders"])
        )

    names_ref = ray.put(supplier_names_tbl)

    rolled = (
        lineitem.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("n_orders")
    )

    class _Name:
        def __init__(self):
            self.names = ray.get(names_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "s_suppkey": b.column("s_suppkey"),
                    "n_orders": pc.cast(b.column("sum(n_orders)"), pa.int64()),
                }
            )
            j = t.join(self.names, keys=["s_suppkey"], join_type="inner")
            return j.select(["s_suppkey", "s_name", "n_orders"])

    return rolled.map_batches(_Name, batch_format="pyarrow", concurrency=2,
                              num_cpus=0.5)


# ---------------------------------------------------------------------------
# Q12 shape — shipping lateness vs order priority (join + banded CASE agg)
# ---------------------------------------------------------------------------


def late_shipment_priority(lineitem, orders, band_days=(30, 60)):
    """``(lateness_band, high_line_count, low_line_count)`` — the TPC-H Q12
    shape over the available columns: every lineitem joins its order, the
    days from ``o_orderdate`` to ``l_shipdate`` band into
    ``on_time`` (<= band_days[0]) / ``late`` / ``very_late``
    (> band_days[1]), and each band counts lines of high-priority orders
    (``1-URGENT``/``2-HIGH``) vs the rest — exactly Q12's CASE aggregation
    with lateness bands standing in for ship modes.

    Distributed shape: both sides slim to ~16-byte rows, ONE coarse
    ``hash(orderkey)`` co-group joins them in-partition (the repo's
    big×big fact-join pattern — `Dataset.join` avoided per the Ray 2.49
    empty-partition note), and only ``(band, high, low)`` integer partials
    leave each partition for the final 3-row fold.
    """
    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()
    lo_us = band_days[0] * 86_400_000_000
    hi_us = band_days[1] * 86_400_000_000
    BANDS = ("on_time", "late", "very_late")

    def li_slim(batch: pa.Table) -> pa.Table:
        okey = pc.cast(batch.column("l_orderkey"), pa.int64())
        return pa.table(
            {
                "okey": okey,
                "ship": pc.cast(batch.column("l_shipdate"), pa.int64()),
                "odate": pa.nulls(len(batch), pa.int64()),
                "hi": pa.nulls(len(batch), pa.int8()),
                "part": coarse_part(okey, nparts),
            }
        )

    def ord_slim(batch: pa.Table) -> pa.Table:
        okey = pc.cast(batch.column("o_orderkey"), pa.int64())
        hi = pc.cast(
            pc.is_in(
                batch.column("o_orderpriority"),
                value_set=pa.array(["1-URGENT", "2-HIGH"]),
            ),
            pa.int8(),
        )
        return pa.table(
            {
                "okey": okey,
                "ship": pa.nulls(len(batch), pa.int64()),
                "odate": pc.cast(batch.column("o_orderdate"), pa.int64()),
                "hi": hi,
                "part": coarse_part(okey, nparts),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        li = group.filter(pc.is_valid(group.column("ship")))
        od = group.filter(pc.is_valid(group.column("odate")))
        j = pa.table(
            {"okey": li.column("okey"), "ship": li.column("ship")}
        ).join(
            pa.table(
                {"okey": od.column("okey"), "odate": od.column("odate"),
                 "hi": od.column("hi")}
            ),
            keys=["okey"], join_type="inner",
        )
        delay = pc.subtract(j.column("ship"), j.column("odate"))
        band = pc.if_else(
            pc.less_equal(delay, pa.scalar(lo_us, pa.int64())),
            pa.scalar("on_time"),
            pc.if_else(
                pc.less_equal(delay, pa.scalar(hi_us, pa.int64())),
                pa.scalar("late"),
                pa.scalar("very_late"),
            ),
        )
        hi = pc.cast(j.column("hi"), pa.int64())
        t = pa.table(
            {
                "lateness_band": band,
                "high_line_count": hi,
                "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )
        return (
            t.group_by(["lateness_band"])
            .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
            .rename_columns(["lateness_band", "high_line_count", "low_line_count"])
        )

    partials = (
        lineitem.map_batches(li_slim, batch_format="pyarrow")
        .union(orders.map_batches(ord_slim, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )
    rolled = partials.groupby("lateness_band").sum(
        ["high_line_count", "low_line_count"]
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "lateness_band": b.column("lateness_band"),
                "high_line_count": pc.cast(
                    b.column("sum(high_line_count)"), pa.int64()
                ),
                "low_line_count": pc.cast(
                    b.column("sum(low_line_count)"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive bracket predicate revenue (broadcast dim + OR-of-ANDs)
# ---------------------------------------------------------------------------

BRACKETS = (
    # (brand, max_size, qty_lo, qty_hi) — OR-of-ANDs, the Q19 signature
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)


def part_size_brand(sf_dir: str) -> pa.Table:
    """Driver-side dimension read: (partkey, brand, size), pruned columns."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    return pa.table(
        {
            "l_partkey": pc.cast(t.column("p_partkey"), pa.int64()),
            "p_brand": t.column("p_brand"),
            "p_size": pc.cast(t.column("p_size"), pa.int64()),
        }
    )


def bracket_revenue(lineitem, part_dims: pa.Table, brackets=BRACKETS):
    """``(n_items, revenue_cents)`` — TPC-H Q19's disjunctive bracket
    predicate: a lineitem counts iff ANY bracket's conjunction holds
    (brand match AND part size <= cap AND quantity in range).  Revenue is
    the exact integer ``price_cents · (100 - disc_cents)`` sum (÷100
    deferred to the oracle's identical expression).

    Distributed shape: the part dimension broadcasts once via ``ray.put``;
    each batch hash-joins against it and evaluates the OR-of-ANDs with
    vectorized Arrow kernels — one scan, single-row partials, no shuffle.
    """
    import ray

    dims_ref = ray.put(part_dims)

    class _Bracket:
        def __init__(self):
            self.dims = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            qty = to_cents(batch.column("l_quantity"))  # qty ×100
            t = pa.table(
                {
                    "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
                    "qty_x100": qty,
                    "rev": pc.multiply(
                        to_cents(batch.column("l_extendedprice")),
                        pc.subtract(
                            pa.scalar(100, pa.int64()),
                            to_cents(batch.column("l_discount")),
                        ),
                    ),
                }
            )
            j = t.join(self.dims, keys=["l_partkey"], join_type="inner")
            keep = None
            for brand, max_size, q_lo, q_hi in brackets:
                cond = pc.and_(
                    pc.and_(
                        pc.equal(j.column("p_brand"), brand),
                        pc.less_equal(j.column("p_size"),
                                      pa.scalar(max_size, pa.int64())),
                    ),
                    pc.and_(
                        pc.greater_equal(j.column("qty_x100"),
                                         pa.scalar(q_lo * 100, pa.int64())),
                        pc.less_equal(j.column("qty_x100"),
                                      pa.scalar(q_hi * 100, pa.int64())),
                    ),
                )
                keep = cond if keep is None else pc.or_(keep, cond)
            hit = j.filter(keep)
            return pa.table(
                {
                    "n_items": pa.array([len(hit)], pa.int64()),
                    "revenue_cents_x100": pa.array(
                        [pc.sum(hit.column("rev")).as_py() or 0], pa.int64()
                    ),
                }
            )

    from ..poolsize import autoscale_pool

    partials = lineitem.map_batches(
        _Bracket, batch_format="pyarrow", concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )

    def final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pa.array(
                    [pc.sum(batch.column("n_items")).as_py() or 0], pa.int64()
                ),
                "revenue_cents_x100": pa.array(
                    [pc.sum(batch.column("revenue_cents_x100")).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    return partials.repartition(1).map_batches(final, batch_format="pyarrow")
