"""Hot-host skew containment (BASELINE.json north rule: "groupby-host
repartitioning ... to contain hot-host skew").

The corpus is host-hash bucketed, so one mega-host lands in ONE bucket file —
the skew hazard.  The fetch layer must still parallelize it: the CorpusIndex
splits a bucket's wanted row groups into bounded-size descriptors, so a
hot host's wave fans out across many tasks instead of one straggler."""

import tempfile

import pytest

from spider_ray.config import CrawlConfig, CrawlJob
from spider_ray.fixtures import build_corpus, corpus_as_dict, seed_of, write_corpus_parquet
from spider_ray.oracle import crawl_oracle


@pytest.fixture(scope="module")
def skew_env(ray_session):
    # host 0 is the mega-host: ~10x the pages of every other host
    rows = build_corpus(n_hosts=1, pages_per_host=4000, seed=99, stressors=False)
    small = build_corpus(n_hosts=4, pages_per_host=30, seed=99, stressors=False)
    # merge: big host is site0; small hosts re-keyed are sites 1-3 already distinct
    combined = rows + [r for r in small if "site0.example" not in r["url"]]
    cdir = tempfile.mkdtemp(prefix="spider_skew_")
    write_corpus_parquet(combined, cdir, n_buckets=16)
    return corpus_as_dict(combined), cdir


def test_hot_host_descriptor_fanout(skew_env):
    from spider_ray.stages.fetch import CorpusIndex

    corpus, cdir = skew_env
    idx = CorpusIndex(cdir)
    hot_urls = [u for u in idx.lookup if "site0.example" in u]
    assert len(hot_urls) > 3000
    descriptors, missing = idx.split(hot_urls)
    # the mega-host fans out across multiple bounded descriptors (parallel
    # read+parse tasks), not one straggler covering the whole bucket
    assert len(descriptors) >= 2
    assert max(len(d["urls"]) for d in descriptors) <= 4096
    assert not missing


def test_skewed_crawl_parity(skew_env):
    from spider_ray.pipelines.crawl import crawl

    corpus, cdir = skew_env
    job = CrawlJob(tuple(seed_of(k) for k in range(4)), CrawlConfig())
    o = crawl_oracle(job, corpus)
    e = crawl(job, cdir, keep_pages=False)
    assert e.visited_set == o.visited_set
    assert e.admitted_order == o.admitted_order
    hosts = {u.split("/")[2] for u in e.visited}
    assert "www.site0.example" in hosts and len(hosts) >= 4


def test_politeness_caps_hot_host(skew_env):
    """With a politeness delay, the mega-host is capped per wave (quota =
    ceil(wave_span/delay)) while small hosts proceed — per-host fairness."""
    from collections import Counter

    corpus, cdir = skew_env
    job = CrawlJob(tuple(seed_of(k) for k in range(4)), CrawlConfig(delay_ms=200))
    o = crawl_oracle(job, corpus)
    for wave in {w for w, _, _ in o.admitted_order if w > 0}:
        per_host = Counter(u.split("/")[2] for w, _, u in o.admitted_order if w == wave)
        assert per_host.get("www.site0.example", 0) <= 5  # ceil(1000/200)


# ---------------------------------------------------------------------------
# degenerate LSH band buckets (round-3 scale hardening): thousands of
# identical docs share EVERY band signature on a real web corpus — the
# capped/chunked pairing must keep the pair budget O(k*max_bucket) while the
# chain pairs keep the component connected end-to-end
# ---------------------------------------------------------------------------


def test_degenerate_bucket_pair_budget_and_connectivity(ray_session):
    import ray

    from spider_ray.ops.dedup import minhash_lsh_candidates, near_dup_clusters

    n, cap = 1000, 32
    rows = [{"doc_id": i, "text": "identical body for every doc"} for i in range(n)]
    ds = ray.data.from_items(rows)
    kwargs = dict(num_perm=16, n_bands=4, max_bucket=cap)

    cands = minhash_lsh_candidates(ds, **kwargs)
    n_pairs = cands.count()
    # every band produces the SAME bucket of all n ids → after cross-band
    # dedup the candidate set is exactly one chunked bucket's pairs:
    # ceil(n/cap) chunks of C(cap,2) + (chunks-1) chain pairs
    import math
    chunks = math.ceil(n / cap)
    sizes = [min(cap, n - i * cap) for i in range(chunks)]
    expected = sum(s * (s - 1) // 2 for s in sizes) + (chunks - 1)
    assert n_pairs == expected  # bounded: ~15k, not C(1000,2)=499,500

    clusters = near_dup_clusters(
        ray.data.from_items(rows), threshold=0.5, **kwargs
    )
    # chain pairs keep all identical docs in ONE cluster rooted at min id
    assert clusters.num_rows == n
    assert set(clusters.column("cluster_id").to_pylist()) == {0}


def test_degenerate_bucket_matches_sequential_golden(ray_session):
    """Engine pair set == sequential golden under the same chunk spec."""
    import ray

    from spider_ray.goldens import seq_minhash_pairs
    from spider_ray.ops.dedup import minhash_dedup

    n, cap = 300, 16
    ids = list(range(n))
    texts = ["shared degenerate text" for _ in ids]
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in zip(ids, texts)])
    got = (
        minhash_dedup(ds, threshold=0.5, num_perm=16, n_bands=4, max_bucket=cap)
        .to_pandas()[["doc_a", "doc_b"]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = (
        seq_minhash_pairs(ids, texts, threshold=0.5, num_perm=16, n_bands=4, max_bucket=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


# ---------------------------------------------------------------------------
# round-3 ops under degenerate skew: hot n-gram groups and collapsed clusters
# ---------------------------------------------------------------------------


def test_dup_span_hot_gram_stays_linear(ray_session):
    """Identical docs put every occurrence in ONE gram group — the group
    emit is linear in members (positions only), never pairwise."""
    import ray

    from spider_ray.ops.spans import dup_ngram_spans

    n = 2000
    rows = [{"doc_id": i, "text": "a b c d e f g h"} for i in range(n)]
    out = dup_ngram_spans(ray.data.from_items(rows), k=8).to_pandas()
    assert len(out) == n  # one merged span per doc, not O(n^2) rows
    assert set(out["span_start"]) == {0} and set(out["span_end"]) == {8}


def test_semdedup_collapsed_cluster_keeps_min_id(ray_session):
    """All-identical vectors collapse into one cluster; the greedy sweep
    keeps exactly the smallest id (kept set stays size 1 — O(n) work)."""
    import pyarrow as pa
    import ray.data

    from spider_ray.ops.cluster import semdedup

    n = 500
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([[1.0, 0.0, 0.0]] * n, pa.list_(pa.float32())),
        }
    )
    out = semdedup(ray.data.from_arrow(t), k=4, iters=2, tau=0.9).to_pandas()
    assert len(out) == n
    kept = sorted(out[out["keep"]]["vec_id"])
    assert kept == [0]
    assert out["cluster"].nunique() == 1


def test_kmeans_identical_vectors_no_nan(ray_session):
    """Empty clusters keep their previous centroid — no NaN divisions;
    ties assign to the first centroid index deterministically."""
    import pyarrow as pa
    import ray.data

    from spider_ray.ops.cluster import kmeans_assign

    n = 64
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([[0.5, 0.5]] * n, pa.list_(pa.float32())),
        }
    )
    out = kmeans_assign(ray.data.from_arrow(t), k=4, iters=3).to_pandas()
    assert len(out) == n
    assert out["cluster"].nunique() == 1
