"""Edge-semantics tests for the chunking / BM25 / exact-k sample /
percentile-trim op batch."""

from __future__ import annotations

import pyarrow as pa


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_chunk_documents_overlap_and_tail(ray_session):
    from spider_ray.ops.chunking import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(
        _ds([{"doc_id": 1, "text": text}]), chunk_tokens=4, stride=3
    ).take_all()
    # starts at 0,3,6,9 (9 < 10); windows of <=4 tokens
    assert [(r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in out] == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
        (3, 1, "w9"),
    ]


def test_chunk_documents_short_and_empty(ray_session):
    from spider_ray.ops.chunking import chunk_documents

    out = chunk_documents(
        _ds([{"doc_id": 1, "text": "a b"}, {"doc_id": 2, "text": "   "}]),
        chunk_tokens=64,
        stride=48,
    ).take_all()
    assert out == [{"doc_id": 1, "chunk_id": 0, "n_tokens": 2, "chunk_text": "a b"}]


def test_global_sample_k_exact_and_stable(ray_session):
    from spider_ray.ops.sampling import global_sample_k

    rows = [{"doc_id": i} for i in range(500)]
    a = sorted(r["doc_id"] for r in global_sample_k(_ds(rows), 50).take_all())
    b = sorted(r["doc_id"] for r in global_sample_k(_ds(rows), 50).take_all())
    assert len(a) == 50 and a == b
    # k > n: everything survives
    small = global_sample_k(_ds(rows[:7]), 50).take_all()
    assert sorted(r["doc_id"] for r in small) == list(range(7))


def test_length_trim_drops_outliers(ray_session):
    from spider_ray.ops.corpusstats import length_trim

    rows = [{"doc_id": i, "lang": "en", "n_chars": 100 + i} for i in range(99)]
    rows.append({"doc_id": 999, "lang": "en", "n_chars": 10_000_000})
    kept = length_trim(_ds(rows), q_lo=0.05, q_hi=0.95).take_all()
    ids = {r["doc_id"] for r in kept}
    assert 999 not in ids
    # quantile_disc rank semantics: lo = value at rank ceil(.05*100)=5,
    # hi = value at rank 95 -> n_chars in [104, 194]
    assert ids == {i for i in range(99) if 104 <= 100 + i <= 194}


def test_bm25_zero_match_and_monotone_tf(ray_session):
    from spider_ray.ops.bm25 import bm25_scores

    rows = [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "query query beta"},
        {"doc_id": 3, "text": "query beta gamma"},
    ]
    out = {r["doc_id"]: r["bm25_x1e6"] for r in
           bm25_scores(_ds(rows), ("query",)).take_all()}
    assert out[1] == 0
    # same doc length, higher tf -> strictly higher score
    assert out[2] > out[3] > 0


def test_page_anchor_terms_pinned_spec():
    """The anchor extractor's pinned spec: absolute + root-relative hrefs
    only, aria-hidden and asset suffixes skipped, nested markup stripped,
    lowercase \\S+ tokens."""
    from spider_ray.ops.anchors import page_anchor_terms

    html = (
        '<a href="/x">Go <b>Home</b> NOW</a>'
        '<a href="https://Other.Example/y?q=1#frag">other SITE</a>'
        '<a href="/pic.jpg">asset</a>'
        '<a href="relative/path">rel</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a aria-hidden="true" href="/hid">hidden</a>'
        '<a href="/x">go</a>'
    )
    c = page_anchor_terms("https://www.site0.example/page", html)
    assert c == {
        ("https://www.site0.example/x", "go"): 2,
        ("https://www.site0.example/x", "home"): 1,
        ("https://www.site0.example/x", "now"): 1,
        ("https://other.example/y?q=1", "other"): 1,
        ("https://other.example/y?q=1", "site"): 1,
    }
