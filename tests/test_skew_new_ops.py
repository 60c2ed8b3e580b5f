"""Skew tests for the round-3 op batch: degenerate key distributions must
stay LINEAR per group (the 100-TB failure mode is a hot group going
quadratic or a driver-side blowup, not a wrong answer at small scale)."""

from __future__ import annotations

import time

import pyarrow as pa


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_line_dedup_hot_line_stays_linear(ray_session, tmp_path):
    """One nav line shared by 5k pages: the losers group emits 5k-1 drop
    rows (linear), never a pairwise expansion; rebuild stays per-page."""
    import pyarrow.parquet as pq

    from spider_ray.ops.linededup import global_line_dedup

    n = 5000
    t = pa.table(
        {
            "url": [f"http://h/{i:05d}" for i in range(n)],
            "text": [f"shared nav line\nunique body {i}" for i in range(n)],
        }
    )
    pq.write_table(t, tmp_path / "p.parquet")
    t0 = time.perf_counter()
    out = global_line_dedup(str(tmp_path)).take_all()
    wall = time.perf_counter() - t0
    assert len(out) == n
    removed = sum(r["n_removed"] for r in out)
    assert removed == n - 1  # every copy but the (url,idx)-minimum drops
    first = min(out, key=lambda r: r["url"])
    assert first["clean_text"].startswith("shared nav line")
    # linear budget: a quadratic group (25M pairs) would not finish in this
    # envelope on 4 CPUs
    assert wall < 60, wall


def test_interval_join_hot_bucket_stays_linear(ray_session):
    """All windows and points collapse into ONE epoch bucket: the group
    resolves via sort + two searchsorted passes, not |w|x|p| pairing."""
    from spider_ray.ops.intervals import interval_join_counts

    us = 1_000_000
    rows = []
    for i in range(2000):
        rows.append(
            {"event_id": i, "ts": i * us, "event_type": "signup",
             "value": 0.0, "user_id": 1}
        )
    for i in range(2000):
        rows.append(
            {"event_id": 10_000 + i, "ts": i * us, "event_type": "purchase",
             "value": 1.0, "user_id": 1}
        )
    t0 = time.perf_counter()
    out = interval_join_counts(_ds(rows), window_s=3600).take_all()
    wall = time.perf_counter() - t0
    assert len(out) == 2000
    # window starting at t counts purchases in [t, t+3600): all 2000 - t
    by_id = {r["event_id"]: r["n_points"] for r in out}
    assert by_id[0] == 2000 and by_id[1999] == 1
    assert wall < 30, wall


def test_source_mix_hot_source_no_driver_state(ray_session):
    """A single source holding every row: expansion is per-batch np.repeat
    (no per-source grouping anywhere), so a 100%-skewed source costs the
    same as a uniform one."""
    from spider_ray.ops.sampling import source_mix

    rows = [{"doc_id": i, "source": "only"} for i in range(50_000)]
    t0 = time.perf_counter()
    n = source_mix(_ds(rows), {"only": 200}).count()
    wall = time.perf_counter() - t0
    assert n == 100_000
    assert wall < 30, wall


def test_host_cap_hot_host_bounded(ray_session, tmp_path):
    """A 20k-page mega-host contributes at most ``cap`` rows per batch to
    the shuffle (combiner), and exactly ``cap`` rows to the result — the
    domain-balancing contract."""
    import pyarrow.parquet as pq

    from spider_ray.ops.sampling import host_cap

    rows = [{"url": f"https://hot.example/p{i:05d}"} for i in range(20000)]
    rows += [{"url": f"https://cold{i}.example/only"} for i in range(10)]
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, tmp_path / "p.parquet")
    out = host_cap(str(tmp_path), cap=7).take_all()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["hot.example"]) == 7
    assert [r["url"] for r in sorted(by_host["hot.example"], key=lambda r: r["rank"])] == [
        f"https://hot.example/p{i:05d}" for i in range(7)
    ]
    assert all(len(v) == 1 for h, v in by_host.items() if h != "hot.example")
    assert len(by_host) == 11


def test_dsir_weights_favor_target_like_docs(ray_session):
    """Docs sharing the target slice's n-grams score higher than docs made
    of off-distribution grams; weights are exact int64 (order-free)."""
    from spider_ray.ops.dsir import dsir_weights

    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "lang": "en", "text": "the quick brown fox jumps"})
    for i in range(40, 80):
        rows.append({"doc_id": i, "lang": "de", "text": "der schnelle braune fuchs"})
    # held-out docs, one per style, not in the target slice
    rows.append({"doc_id": 100, "lang": "xx", "text": "the quick brown fox jumps"})
    rows.append({"doc_id": 101, "lang": "xx", "text": "der schnelle braune fuchs"})
    out = {r["doc_id"]: r for r in dsir_weights(_ds(rows)).take_all()}
    assert out[100]["dsir_logw_x1e6"] > out[101]["dsir_logw_x1e6"]
    assert out[100]["n_feats"] == 9  # 5 unigrams + 4 bigrams


def test_embedding_pca_partition_invariant(ray_session):
    """The integer-moment fold makes the PCA output bit-identical across
    block layouts — the determinism contract at any cluster size."""
    import numpy as np
    import ray.data

    from spider_ray.ops.cluster import embedding_pca

    rng = np.random.default_rng(11)
    m = rng.normal(size=(300, 8))
    rows = [
        {"vec_id": i, "embedding": m[i].tolist()} for i in range(len(m))
    ]
    a = embedding_pca(ray.data.from_items(rows).repartition(1), top_k=3)
    b = embedding_pca(ray.data.from_items(rows).repartition(13), top_k=3)
    assert a.equals(b)
    lead = a.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(
            a.column("component"), 0
        )
    )
    v = np.asarray(lead.column("loading"), dtype=np.float64)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6  # unit eigenvector
    ev = sorted(set(a.column("eigenvalue").to_pylist()), reverse=True)
    assert ev == sorted(ev, reverse=True) and len(ev) == 3


def test_host_hits_star_graph(ray_session, tmp_path):
    """Directory page linking N leaf hosts: the directory is the top hub,
    leaves are the authorities; scores are L2-normalized."""
    import math

    import pyarrow.parquet as pq

    from spider_ray.ops.linkgraph import host_hits

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return {"url": url, "html": f"<html><body>{body}</body></html>".encode(),
                "text": "x", "status": 200}

    rows = [page("https://hub.example/", [f"https://leaf{i}.example/p" for i in range(4)])]
    rows += [page(f"https://leaf{i}.example/p", []) for i in range(4)]
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, tmp_path / "p.parquet")
    out = {r["host"]: r for r in host_hits(str(tmp_path)).take_all()}
    assert out["hub.example"]["hub"] == 1.0
    assert out["hub.example"]["authority"] == 0.0
    leaf_auth = [out[f"leaf{i}.example"]["authority"] for i in range(4)]
    assert all(a == leaf_auth[0] > 0 for a in leaf_auth)
    assert abs(math.fsum(a * a for a in leaf_auth) - 1.0) < 1e-9


def test_near_dup_canonical_keeps_longest(ray_session):
    """Three near-identical docs of different lengths: the longest becomes
    canonical regardless of doc_id order; singletons never appear."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 20
    rows = [
        {"doc_id": 5, "text": base + "tail one"},
        {"doc_id": 2, "text": base + "tail one two three four five"},
        {"doc_id": 9, "text": base},
        {"doc_id": 7, "text": "completely different text about nothing at all"},
    ]
    from spider_ray.ops.dedup import near_dup_canonical

    out = near_dup_canonical(_ds(rows), threshold=0.5).to_pylist()
    assert len(out) == 1
    row = out[0]
    assert row["cluster_id"] == 2  # min doc_id labels the cluster
    assert row["canonical_doc_id"] == 2  # the longest member
    assert row["n_members"] == 3 and row["n_dropped"] == 2


def test_dsir_weights_partition_invariant(ray_session):
    """Integer-quantized log-ratios + int64 sums: identical weights across
    block layouts; empty/degenerate inputs don't crash."""
    import ray.data

    from spider_ray.ops.cluster import embedding_pca
    from spider_ray.ops.dsir import dsir_weights

    rows = [
        {"doc_id": i, "lang": ("en" if i % 3 else "de"),
         "text": f"token{i % 7} alpha beta token{i % 5}"}
        for i in range(120)
    ]
    a = sorted(dsir_weights(_ds(rows).repartition(1)).take_all(), key=lambda r: r["doc_id"])
    b = sorted(dsir_weights(_ds(rows).repartition(17)).take_all(), key=lambda r: r["doc_id"])
    assert a == b
    # PCA empty / single-row guards
    one = ray.data.from_items([{"vec_id": 0, "embedding": [1.0, 0.0]}])
    assert embedding_pca(one).num_rows == 0
