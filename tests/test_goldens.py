"""Driver-contract pre-flight for the golden-parquet oracles.

Replicates what the grading driver does for every goldened query: run the
Ray pipeline from ``__ray_entry__.queries()`` at sf0.01 AND the DuckDB SQL
from ``oracle_sql()`` (a ``read_parquet`` of the sequential-oracle golden),
sort columns by name and rows by value, and require exact equality of
row-count, schema and values.
"""

from __future__ import annotations

import importlib.util
import os

import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def duck(entry_mod):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings", "lineitem", "orders", "customer",
              "supplier", "nation", "region", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray.data.Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols).reset_index(drop=True)


from spider_ray.goldens import GOLDEN_QUERIES  # noqa: E402

# SQL-expressible queries (non-golden) verified through the same pipeline —
# together with GOLDEN_QUERIES this covers EVERY oracle-backed driver query
SQL_QUERIES = (
    "extract_text_parity",
    "host_page_counts",
    "exact_dedup",
    "token_stats",
    "docs_by_lang",
    "events_by_type",
    "docs_by_source",
    "events_per_day",
    "top_k_similarity",
    "embedding_near_dup",
    "tumbling_events",
    "sessionize",
    "event_asof",
    "boilerplate_removal",
    "pii_scrub",
    "gopher_quality",
    "stratified_sample",
    "shard_shuffle",
    "bigram_topk",
    "lang_quantiles",
    "top_terms_per_lang",
    "posting_lists",
    "decontaminate",
    "distinct_users_kmv",
    "rolling_user_sums",
    "concurrent_sessions",
    "sliding_events",
    "repetition_stats",
    "length_rank",
    "dataset_split",
    "class_balance",
    "pricing_summary",
    "top_customers",
    "order_revenue",
    "unigram_logprob",
    "bigram_logprob",
    "heuristic_filter",
    "label_centroids",
    "user_features",
    "revenue_forecast",
    "shipping_priority",
    "interval_join",
    "events_rollup",
    "source_mix",
    "line_dedup",
    "normalize_text",
    "chunk_documents",
    "global_sample",
    "length_trim",
    "bm25_scores",
    "token_entropy",
    "funnel_counts",
    "retention_cohorts",
    "order_priority_check",
    "customer_distribution",
    "regional_revenue",
    "heavy_hitters",
    "event_transitions",
    "rolling_active_users",
    "promo_revenue",
    "props_stats",
    "session_stats",
    "best_line_per_order",
    "quality_by_source",
    # shares the near_dup_clusters golden (oracle registered directly in
    # oracle_sql(), not via GOLDEN_QUERIES)
    "near_dup_clusters_lp",
    "dedup_against_ref",
)


@pytest.mark.parametrize("name", GOLDEN_QUERIES + SQL_QUERIES)
def test_golden_query_matches_oracle(entry_mod, duck, name):
    ray_result = _canon(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    oracle = _canon(duck.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert len(ray_result) == len(oracle), (len(ray_result), len(oracle))
    assert list(ray_result.columns) == list(oracle.columns)
    pd.testing.assert_frame_equal(ray_result, oracle, check_dtype=False)
