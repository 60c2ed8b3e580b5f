"""Mimic the driver's correctness check: run each queries() entry at sf0.01
and compare row-count + sorted-column values against oracle_sql() via DuckDB
(order-insensitive, columns sorted by name — the driver's comparison)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64", errors="ignore")
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
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    out = m.entry()
    assert len(out) > 0
    assert "url" in out.columns and "text" in out.columns


def test_all_queries_run(contract):
    queries, oracles = contract
    assert set(oracles) <= set(queries)
    for name, fn in queries.items():
        df = _to_pandas(fn(SF_DIR))
        assert len(df) >= 0, name


@pytest.mark.parametrize(
    "name",
    [
        "extract_text_parity",
        "host_page_counts",
        "exact_dedup",
        "token_stats",
        "docs_by_lang",
        "events_by_type",
        "top_k_similarity",
        "docs_by_source",
        "events_per_day",
        "tumbling_events",
        "sessionize",
        "small_qty_revenue",
        "dormant_customers",
        "top_supplier",
        "nation_trade_volume",
        "supplier_part_counts",
        "latest_shipper_orders",
        "interarrival_quantiles",
        "event_trigrams",
        "token_budget_trim",
        "zipf_slope",
        # round-4 additions
        "incremental_curation",
        "warc_roundtrip",
        "download_manifest",
        "bpe_token_counts",
        "knn_graph",
        "temperature_mix",
        "weighted_sample",
        "source_overlap",
        "near_dup_incremental",
        "token_percentiles",
        "late_shipment_priority",
        "bracket_revenue",
        # round-5 additions
        "line_dedup_partitioned",
        "perplexity_buckets",
        "js_challenge_report",
    ],
)
def test_sql_oracle_match(contract, con, name):
    queries, oracles = contract
    ray_df = _canon(_to_pandas(queries[name](SF_DIR)))
    sql_df = _canon(con.sql(oracles[name]).df())
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)
