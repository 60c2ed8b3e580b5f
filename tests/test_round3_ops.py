"""Oracle-parity tests for the round-3 analytic ops: inter-arrival
quantiles, Zipf slope, host-graph triangle count, k-center coreset."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "events documents embeddings".split()

NAMES = ["interarrival_quantiles", "zipf_slope", "host_triangles", "kcenter_coreset"]


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
def test_round3_oracle_match(contract, con, name):
    queries, oracles = contract
    ray_df = _canon(_to_pandas(queries[name](SF_DIR)))
    sql_df = _canon(con.sql(oracles[name]).df())
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=False, atol=1e-9, rtol=0
    )


def test_kcenter_covers_better_than_prefix(contract, ray_session):
    """The greedy selection should cover the corpus at least as well as a
    naive first-k prefix: max over points of distance-to-nearest-center is
    minimized greedily (2-approx guarantee sanity check)."""
    import numpy as np
    import pyarrow.parquet as pq

    queries, _ = contract
    sel = _to_pandas(queries["kcenter_coreset"](SF_DIR))
    assert list(sel.columns) == ["sel_order", "vec_id"]
    assert len(sel) == 8
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(emb.column("vec_id"), dtype=np.int64)
    m = np.asarray(
        emb.column("embedding").combine_chunks().flatten(), dtype=np.float64
    ).reshape(len(ids), -1)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    def radius(center_ids):
        rows = np.nonzero(np.isin(ids, center_ids))[0]
        sims = (m @ m[rows].T).max(axis=1)
        return 1.0 - sims.min()

    greedy = radius(sel["vec_id"].to_numpy())
    prefix = radius(np.sort(ids)[:8])
    assert greedy <= prefix + 1e-12


def test_triangles_cogroup_twin_parity(ray_session):
    """The shuffle-only co-group twin must agree with the kernel exactly."""
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linkgraph import host_triangles, host_triangles_cogroup

    corpus = ensure_scale("sf0.001")
    a = host_triangles(corpus).take_all()
    b = host_triangles_cogroup(corpus).take_all()
    assert a == b
    assert a[0]["n_triangles"] >= 0


def test_latest_shipper_and_reciprocity_shapes(ray_session):
    import __ray_entry__ as m

    q = m.queries()
    ls = q["latest_shipper_orders"]("/root/testdata/sf0.001").to_pandas()
    assert set(ls.columns) == {"s_suppkey", "s_name", "n_orders"}
    assert (ls["n_orders"] > 0).all()
    rc = q["host_reciprocity"]("/root/testdata/sf0.001").to_pandas()
    assert rc["n_directed"].iloc[0] >= rc["n_bidirectional"].iloc[0]


def test_token_budget_trim_and_trigrams_oracle(ray_session):
    import duckdb

    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    q, o = m.queries(), m.oracle_sql()
    for name in ("token_budget_trim", "event_trigrams"):
        ray_df = _canon(_to_pandas(q[name](sf)))
        sql_df = _canon(con.sql(o[name]).df())
        assert len(ray_df) == len(sql_df), name
        pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                      check_exact=True)


def test_kcore_and_ppr_golden(ray_session):
    """Kernel k-core vs the independent Matula–Beck golden; PPR vs the
    pinned-order sequential replay — at sf0.001 (sf0.01 runs in the
    driver-contract sweep)."""
    import pyarrow.parquet as pq

    from spider_ray.fixtures import ensure_scale
    from spider_ray.goldens import (
        ensure_goldens,
        golden_path,
        seq_host_kcore,
        seq_host_ppr,
    )
    from spider_ray.ops.linkgraph import host_kcore, host_link_edges, host_ppr

    corpus = ensure_scale("sf0.001")
    edges = host_link_edges(corpus)
    import pyarrow as pa

    etbl = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow", batch_size=None)
         if b.num_rows]
    )
    got_kc = host_kcore(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    want_kc = seq_host_kcore(etbl).to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_kc, want_kc)
    got_ppr = host_ppr(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    want_ppr = seq_host_ppr(etbl).to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_ppr, want_ppr)
    # PPR mass sanity: total mass ≈ 1 under full teleport-to-seed
    assert abs(got_ppr["ppr"].sum() - 1.0) < 1e-6


def test_host_cocitation_oracle(ray_session):
    """Co-citation vs a brute-force pandas recompute at sf0.001."""
    import pyarrow as pa

    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linkgraph import host_cocitation, host_link_edges

    corpus = ensure_scale("sf0.001")
    got = host_cocitation(corpus).to_pandas()
    etbl = pa.concat_tables(
        [b for b in host_link_edges(corpus).iter_batches(
            batch_format="pyarrow", batch_size=None) if b.num_rows]
    ).to_pandas()
    e = etbl[etbl.src_host != etbl.dst_host][["src_host", "dst_host"]].drop_duplicates()
    from collections import Counter

    citers = e.groupby("dst_host")["src_host"].apply(sorted)
    c: Counter = Counter()
    for srcs in citers:
        if 2 <= len(srcs) <= 256:
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    c[(srcs[i], srcs[j])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got_rows = list(zip(zip(got.host_a, got.host_b), got.shared))
    assert [(k, v) for k, v in got_rows] == [(k, v) for k, v in want]
