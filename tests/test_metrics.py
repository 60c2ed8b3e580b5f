"""Opt-in operator metrics (VERDICT r3 #10): a heavy catalog op run with
SPIDER_RAY_METRICS=1 must report coherent per-stage rows; the disabled
default must add nothing to the pipeline (fns pass through unwrapped)."""

import os
import sys

sys.path.insert(0, "/root/repo")


def test_wrap_disabled_is_identity(monkeypatch):
    from spider_ray import metrics

    monkeypatch.delenv("SPIDER_RAY_METRICS", raising=False)

    def fn(b):
        return b

    assert metrics.wrap(fn, "op", "stage") is fn


def test_line_dedup_reports_stage_metrics(ray_session, monkeypatch):
    import pandas as pd

    from spider_ray import metrics
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linededup import global_line_dedup

    corpus = ensure_scale("sf0.001")
    monkeypatch.setenv("SPIDER_RAY_METRICS", "1")
    baseline = global_line_dedup(corpus).to_pandas()
    metrics.collect(clear=True)  # discard rows from the warm-up run

    got = global_line_dedup(corpus).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("url").reset_index(drop=True),
        baseline.sort_values("url").reset_index(drop=True),
    )

    m = metrics.collect(clear=True).to_pandas()
    assert set(m.op) == {"line_dedup"}
    assert {"explode", "winners", "rebuild"} <= set(m.stage)
    # coherence: every stage ran with positive wall time; the rebuild
    # emitted exactly the op's output rows
    assert (m.wall_us >= 0).all() and len(m) > 3
    rebuilt = int(m[m.stage == "rebuild"].rows_out.sum())
    assert rebuilt == len(got)
    # explode fans lines out of shards: rows_out >> rows_in (shard ids)
    ex = m[m.stage == "explode"]
    assert int(ex.rows_out.sum()) > int(ex.rows_in.sum())
