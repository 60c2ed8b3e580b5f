"""Randomized-parameter oracle fuzz for the second TPC-H batch: each trial
draws thresholds/dates/brands from a seeded RNG and cross-checks the Ray
pipeline against the SAME parameterized SQL in DuckDB at sf0.001 — the
repo's config-fuzz strategy applied to the relational surface."""

import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem".split()
N_TRIALS = 6


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_large_orders(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.tpch2 import customer_names, large_orders

    rng = random.Random(1000 + trial)
    thr = rng.choice([120.0, 180.0, 240.0, 280.0, 320.0])
    li = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])
    orders = ray.data.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    got = _canon(large_orders(li, orders, customer_names(SF_DIR),
                              qty_threshold=thr).to_pandas())
    want = _canon(con.sql(f"""
        WITH w AS (SELECT l_orderkey,
            sum(CAST(round(l_quantity*100) AS BIGINT)) AS q
            FROM lineitem GROUP BY 1 HAVING q > {int(thr * 100)})
        SELECT c.c_name, o.o_custkey::BIGINT AS o_custkey,
            o.o_orderkey::BIGINT AS o_orderkey,
            CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_s,
            CAST(round(o.o_totalprice*100) AS BIGINT) AS o_totalprice_cents,
            w.q::BIGINT AS total_qty_x100
        FROM orders o JOIN w ON o.o_orderkey = w.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey""").df())
    assert len(got) == len(want), thr
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_small_qty_revenue(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.tpch2 import brand_partkeys, small_qty_revenue

    rng = random.Random(2000 + trial)
    brand = f"Brand#{rng.randint(1, 25)}"
    li = ray.data.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    got = _canon(small_qty_revenue(li, brand_partkeys(SF_DIR, brand)).to_pandas())
    want = _canon(con.sql(f"""
        WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{brand}'),
        st AS (SELECT l_partkey,
            sum(CAST(round(l_quantity*100) AS BIGINT)) AS s,
            count(*)::BIGINT AS n
            FROM lineitem JOIN bp ON l_partkey = p_partkey GROUP BY 1)
        SELECT count(*)::BIGINT AS n_items,
            coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT)), 0)::BIGINT
            AS revenue_cents
        FROM lineitem l JOIN st ON l.l_partkey = st.l_partkey
        WHERE CAST(round(l.l_quantity*100) AS BIGINT) * 5 * st.n < st.s""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_top_supplier(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.tpch2 import supplier_names, top_supplier

    rng = random.Random(3000 + trial)
    y = rng.randint(1995, 2000)
    m = rng.choice([1, 4, 7, 10])
    frm = f"{y}-{m:02d}-01"
    to_m = m + 3
    to = f"{y + 1}-01-01" if to_m > 12 else f"{y}-{to_m:02d}-01"
    li = ray.data.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    got = _canon(top_supplier(li, supplier_names(SF_DIR), date_from=frm,
                              date_to=to).to_pandas())
    want = _canon(con.sql(f"""
        WITH r AS (SELECT l_suppkey AS s_suppkey,
            sum(CAST(round(l_extendedprice*100) AS BIGINT) *
            (100 - CAST(round(l_discount*100) AS BIGINT))) AS total_revenue_x10000
            FROM lineitem WHERE l_shipdate >= '{frm}' AND l_shipdate < '{to}'
            GROUP BY 1)
        SELECT r.s_suppkey::BIGINT AS s_suppkey, s.s_name,
            r.total_revenue_x10000::BIGINT AS total_revenue_x10000
        FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
        WHERE r.total_revenue_x10000 =
            (SELECT max(total_revenue_x10000) FROM r)""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_dormant_customers(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.tpch2 import dormant_customers

    rng = random.Random(4000 + trial)
    cutoff = f"{rng.randint(1996, 2001)}-{rng.choice([1, 6]):02d}-01"
    customer = ray.data.read_parquet(
        f"{SF_DIR}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    got = _canon(dormant_customers(customer, orders, cutoff=cutoff).to_pandas())
    want = _canon(con.sql(f"""
        WITH g AS (SELECT sum(CAST(round(c_acctbal*100) AS BIGINT)) AS s,
            count(*)::BIGINT AS n FROM customer
            WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0)
        SELECT c_mktsegment, count(*)::BIGINT AS n_custs,
            sum(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT
            AS total_acctbal_cents
        FROM customer c, g
        WHERE CAST(round(c_acctbal*100) AS BIGINT) * g.n > g.s
        AND NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '{cutoff}')
        GROUP BY 1""").df())
    assert len(got) == len(want), cutoff
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_late_shipment_priority(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.tpch2 import late_shipment_priority

    rng = random.Random(9000 + trial)
    lo = rng.choice([10, 20, 30, 45])
    hi = lo + rng.choice([15, 30, 60])
    li = ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])
    orders = ray.data.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    got = _canon(
        late_shipment_priority(li, orders, band_days=(lo, hi)).to_pandas()
    )
    want = _canon(con.sql(f"""
        SELECT CASE
          WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate)
               <= {lo} * 86400000000 THEN 'on_time'
          WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate)
               <= {hi} * 86400000000 THEN 'late'
          ELSE 'very_late' END AS lateness_band,
          sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
          sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1""").df())
    assert len(got) == len(want), (lo, hi)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_bracket_revenue(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.tpch2 import bracket_revenue, part_size_brand

    rng = random.Random(9500 + trial)
    brackets = []
    for _ in range(rng.randint(1, 4)):
        b = rng.randint(1, 45)
        size = rng.randint(3, 40)
        q_lo = rng.randint(1, 30)
        q_hi = q_lo + rng.randint(2, 15)
        brackets.append((f"Brand#{b}", size, q_lo, q_hi))
    li = ray.data.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    got = _canon(
        bracket_revenue(li, part_size_brand(SF_DIR),
                        brackets=tuple(brackets)).to_pandas()
    )
    preds = " OR ".join(
        f"(p.p_brand = '{br}' AND p.p_size <= {sz} "
        f"AND l.l_quantity BETWEEN {ql} AND {qh})"
        for br, sz, ql, qh in brackets
    )
    want = _canon(con.sql(f"""
        SELECT count(*)::BIGINT AS n_items,
          coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
          (100 - CAST(round(l_discount * 100) AS BIGINT))), 0)::BIGINT
          AS revenue_cents_x100
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE {preds}""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
