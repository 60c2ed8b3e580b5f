"""Algorithm-level independent oracles for the link-analysis replay
goldens (VERDICT r4 #5): the pinned-order sequential goldens replay the
same accumulation order as the distributed kernels, so they can't catch a
shared algorithmic mistake.  These tests recompute pagerank / personalized
pagerank / HITS with a DENSE-MATRIX formulation — different data
structure, different accumulation order (BLAS GEMV vs np.add.at scatter,
np.linalg.norm vs math.fsum) — and compare under a 1e-9 tolerance
(outputs are round-12, so agreement at 1e-9 rules out everything except
benign summation-order noise).

host_kcore already has this stronger form (independent Matula-Beck
implementation); these cover the power-iteration family.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def edge_frame(ray_session):
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linkgraph import host_link_edges

    corpus = ensure_scale("sf0.001")
    df = host_link_edges(corpus).to_pandas()
    assert len(df) > 10
    return corpus, df


def _graph(df):
    hosts = sorted(set(df.src_host) | set(df.dst_host))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    a = np.zeros((n, n), dtype=np.float64)  # a[s, d] = 1 per distinct pair
    for s, d in zip(df.src_host, df.dst_host):
        a[idx[s], idx[d]] = 1.0
    return hosts, a


def test_pagerank_dense_independent(edge_frame):
    from spider_ray.ops.linkgraph import host_pagerank

    corpus, df = edge_frame
    hosts, a = _graph(df)
    n = len(hosts)
    out_deg = a.sum(axis=1)
    dangling = out_deg == 0
    m = (a / np.where(out_deg == 0, 1.0, out_deg)[:, None]).T  # column-stochastic
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = (1.0 - d) / n + d * (m @ r + r[dangling].sum() / n)

    got = host_pagerank(corpus).to_pandas().set_index("host")
    want = pd.Series(r, index=hosts)
    assert set(got.index) == set(hosts)
    diff = np.abs(got["pagerank"].reindex(hosts).to_numpy() - want.to_numpy())
    assert diff.max() < 1e-9, f"max pagerank divergence {diff.max()}"
    # probability mass must be conserved (independent invariant)
    assert abs(got["pagerank"].sum() - 1.0) < 1e-9


def test_ppr_dense_independent(edge_frame):
    from spider_ray.ops.linkgraph import host_ppr

    corpus, df = edge_frame
    hosts, a = _graph(df)
    n = len(hosts)
    out_deg = a.sum(axis=1)
    dangling = out_deg == 0
    m = (a / np.where(out_deg == 0, 1.0, out_deg)[:, None]).T
    # seed = smallest host index WITH an outgoing edge (the op's spec)
    seed = int(np.flatnonzero(out_deg > 0).min())
    e = np.zeros(n)
    e[seed] = 1.0
    d = 0.85
    r = e.copy()
    for _ in range(10):
        r = (1.0 - d) * e + d * (m @ r + r[dangling].sum() * e)

    got = host_ppr(corpus).to_pandas().set_index("host")
    diff = np.abs(got["ppr"].reindex(hosts).to_numpy() - r)
    assert diff.max() < 1e-9, f"max ppr divergence {diff.max()}"
    assert abs(got["ppr"].sum() - 1.0) < 1e-9


def test_hits_dense_independent(edge_frame):
    from spider_ray.ops.linkgraph import host_hits

    corpus, df = edge_frame
    hosts, a = _graph(df)
    hub = np.ones(len(hosts))
    auth = np.ones(len(hosts))
    for _ in range(20):
        auth = a.T @ hub
        nrm = np.linalg.norm(auth)
        if nrm > 0:
            auth = auth / nrm
        hub = a @ auth
        nrm = np.linalg.norm(hub)
        if nrm > 0:
            hub = hub / nrm

    got = host_hits(corpus, iters=20).to_pandas().set_index("host")
    dh = np.abs(got["hub"].reindex(hosts).to_numpy() - hub)
    da = np.abs(got["authority"].reindex(hosts).to_numpy() - auth)
    assert dh.max() < 1e-9, f"max hub divergence {dh.max()}"
    assert da.max() < 1e-9, f"max authority divergence {da.max()}"
