"""Link-graph operators: edges/degrees/PageRank vs the sequential goldens,
plus kernel-level invariants."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pytest

from spider_ray.goldens import seq_host_degrees, seq_host_pagerank, seq_link_graph
from spider_ray.ops.linkgraph import _pagerank_kernel


def test_pagerank_kernel_sums_to_one_with_dangling():
    # 0 -> 1, 0 -> 2, 1 -> 2; 2 dangling
    hosts = ["a", "b", "c"]
    src = np.array([0, 0, 1], dtype=np.int64)
    dst = np.array([1, 2, 2], dtype=np.int64)
    order = np.lexsort((src, dst))
    r = _pagerank_kernel(src[order], dst[order], hosts, 0.85, 10)
    assert r.sum() == pytest.approx(1.0, abs=1e-9)
    # c receives from both a and b plus dangling share -> strictly largest
    assert r[2] > r[1] > 0
    # a has no in-links beyond base + dangling share
    assert r[0] < r[1]


def test_pagerank_kernel_uniform_cycle():
    hosts = ["a", "b", "c"]
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 0], dtype=np.int64)
    r = _pagerank_kernel(src, dst, hosts, 0.85, 25)
    assert np.allclose(r, 1 / 3, atol=1e-9)


def test_seq_degrees_consistent_with_edges():
    edges = seq_link_graph("sf0.001")
    deg = seq_host_degrees(edges)
    assert deg.column("out_degree").to_pylist()
    assert sum(deg.column("out_links").to_pylist()) == sum(
        edges.column("n_links").to_pylist()
    )
    assert sum(deg.column("in_links").to_pylist()) == sum(
        edges.column("n_links").to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_golden_sf0001():
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linkgraph import host_degrees, host_link_edges, host_pagerank

    corpus = ensure_scale("sf0.001")
    gold_edges = seq_link_graph("sf0.001")

    edges = host_link_edges(corpus).to_pandas()
    edges = edges.sort_values(["src_host", "dst_host"]).reset_index(drop=True)
    assert edges.equals(gold_edges.to_pandas())

    deg = host_degrees(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    assert deg.equals(seq_host_degrees(gold_edges).to_pandas())

    pr = host_pagerank(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    gpr = seq_host_pagerank(gold_edges).to_pandas()
    # bit-exact: the accumulation order is pinned by the op spec
    assert pr.equals(gpr)

    # determinism across runs (distributed re-execution, same bits)
    pr2 = host_pagerank(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    assert pr2.equals(pr)


def test_seq_host_components_two_islands():
    import pyarrow as pa

    from spider_ray.goldens import seq_host_components

    edges = pa.table(
        {
            "src_host": pa.array(["b", "a", "x", "z"], pa.string()),
            "dst_host": pa.array(["c", "b", "y", "y"], pa.string()),
            "n_links": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    out = {r["host"]: r["component"] for r in seq_host_components(edges).to_pylist()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


@pytest.mark.usefixtures("ray_session")
def test_host_components_matches_union_find_sf0001():
    from spider_ray.fixtures import ensure_scale
    from spider_ray.goldens import seq_host_components
    from spider_ray.ops.linkgraph import host_components

    corpus = ensure_scale("sf0.001")
    got = host_components(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    want = seq_host_components(seq_link_graph("sf0.001")).to_pandas()
    assert got.equals(want)


@pytest.mark.usefixtures("ray_session")
def test_host_components_labelprop_tiny_graph(tmp_path):
    """A 2-host graph: distinct-key count far below the shuffle partition
    count (the empty-partition regime that breaks hash joins) must still
    converge to one component."""
    from spider_ray.fixtures import write_corpus_parquet
    from spider_ray.ops.linkgraph import host_components_labelprop

    rows = [
        {
            "url": "https://www.site0.example/",
            "warc_ts": datetime.datetime(2026, 1, 1),
            "html": b'<html><body><a href="https://www.site1.example/">x</a></body></html>',
            "text": "x",
            "lang": "en",
            "status": 200,
        },
        {
            "url": "https://www.site1.example/",
            "warc_ts": datetime.datetime(2026, 1, 1),
            "html": b'<html><body><a href="https://www.site0.example/">y</a></body></html>',
            "text": "y",
            "lang": "en",
            "status": 200,
        },
    ]
    corpus = str(tmp_path / "corpus")
    write_corpus_parquet(rows, corpus, n_buckets=2)
    out = (
        host_components_labelprop(corpus)
        .to_pandas().sort_values("host").reset_index(drop=True)
    )
    assert out["host"].tolist() == ["www.site0.example", "www.site1.example"]
    assert out["component"].tolist() == ["www.site0.example", "www.site0.example"]


@pytest.mark.usefixtures("ray_session")
def test_host_components_labelprop_matches_kernel_sf0001():
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linkgraph import host_components, host_components_labelprop

    corpus = ensure_scale("sf0.001")
    fast = host_components(corpus).to_pandas().sort_values("host").reset_index(drop=True)
    dist = (
        host_components_labelprop(corpus)
        .to_pandas().sort_values("host").reset_index(drop=True)
    )
    assert fast.equals(dist)
