"""Oracle-parity tests for the second TPC-H-shaped batch (ops/tpch2.py) at
sf0.001 — same compare as the driver (columns sorted by name, rows sorted,
exact values)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem".split()

NAMES = [
    "small_qty_revenue",
    "large_orders",
    "top_returned_customers",
    "dormant_customers",
    "top_supplier",
    "nation_trade_volume",
    "brand_revenue_share",
    "supplier_part_counts",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


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
def contract(ray_session):
    import __ray_entry__ as m

    return m.queries(), m.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", NAMES)
def test_tpch2_oracle_match(contract, con, name):
    queries, oracles = contract
    ray_df = _canon(_to_pandas(queries[name](SF_DIR)))
    sql_df = _canon(con.sql(oracles[name]).df())
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)


def test_daily_revenue_anomaly_oracle(contract, con):
    queries, oracles = contract
    ray_df = _canon(_to_pandas(queries["daily_revenue_anomaly"](SF_DIR)))
    sql_df = _canon(con.sql(oracles["daily_revenue_anomaly"]).df())
    assert len(ray_df) == len(sql_df)
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)
