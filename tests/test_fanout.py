"""Cluster-derived coarse-partition fan-out (`poolsize.coarse_fanout`).

Two contracts:

1. The helper itself: power-of-two, floored at the measured 32-CPU values
   (so small sessions keep today's behavior), `SPIDER_RAY_FANOUT` forces
   an exact value.
2. Partition-count INVARIANCE: every coarse-hash-aggregate op must return
   identical results at the default fan-out and at a forced 4096-partition
   setting — partitions only scatter work; per-key logic sees all of its
   key's rows either way.  4096 partitions over sf0.001 inputs also makes
   nearly every partition empty (the Ray 2.49 empty-partition edge the
   repo works around elsewhere).
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

# one query per coarse-hash op family that consumes coarse_fanout()
FANOUT_QUERIES = [
    "funnel_counts",          # behavior: funnel
    "retention_cohorts",      # behavior: retention
    "event_transitions",      # behavior: bigrams
    "rolling_active_users",   # behavior: windowed distinct
    "event_trigrams",         # behavior: trigrams
    "interarrival_quantiles", # windows: gap quantiles
    "nation_trade_volume",    # tpch2: two-stage co-group
    "supplier_part_counts",   # tpch2: distinct fold
    "host_cocitation",        # linkgraph: pair generation
    "top_backlinks",          # linkgraph: parted top-k
    "anchor_terms",           # anchors: crc32-parted rank
    "line_dedup",             # linededup: h1-parted winner fold
]


def test_coarse_fanout_helper(ray_session, monkeypatch):
    from spider_ray.poolsize import coarse_fanout

    monkeypatch.delenv("SPIDER_RAY_FANOUT", raising=False)
    n = coarse_fanout()
    assert n >= 64 and (n & (n - 1)) == 0  # power of two, floored
    assert coarse_fanout(floor=256, per_cpu=8) >= 256
    # the 4-CPU test session sits below both floors -> measured constants
    assert n == 64 and coarse_fanout(floor=256, per_cpu=8) == 256
    monkeypatch.setenv("SPIDER_RAY_FANOUT", "4096")
    assert coarse_fanout() == 4096
    assert coarse_fanout(floor=256, per_cpu=8) == 4096
    monkeypatch.setenv("SPIDER_RAY_FANOUT", "100")  # non-power-of-two forced
    assert coarse_fanout() == 128  # rounded up to a power of two


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


@pytest.fixture(scope="module")
def queries(ray_session):
    import __ray_entry__ as m

    return m.queries()


@pytest.mark.parametrize("name", FANOUT_QUERIES)
def test_forced_4096_matches_default(queries, name, monkeypatch):
    monkeypatch.delenv("SPIDER_RAY_FANOUT", raising=False)
    want = _canon(_to_pandas(queries[name](SF_DIR)))
    monkeypatch.setenv("SPIDER_RAY_FANOUT", "4096")
    got = _canon(_to_pandas(queries[name](SF_DIR)))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
