"""Frontier tests — ported 1:1 from /root/reference/spider/src/utils/frontier.rs:244-354."""

from spider_ray.frontier import UrlFrontier, canonical_wave_order, extract_domain, score_url


def test_push_dedup():
    f = UrlFrontier(False)
    assert f.push("https://example.com/a", 100)
    assert not f.push("https://example.com/a", 200)
    assert len(f) == 1


def test_pop_highest_priority_first():
    f = UrlFrontier(False)
    f.push("https://example.com/low", 10)
    f.push("https://example.com/high", 500)
    f.push("https://example.com/mid", 100)
    assert f.pop() == "https://example.com/high"
    assert f.pop() == "https://example.com/mid"


def test_extend_with_priority_bulk():
    f = UrlFrontier(False)
    f.extend_with_priority(["https://a.com/1", "https://b.com/2", "https://a.com/1"], 50)
    assert len(f) == 2


# frontier.rs:286-300 — exact expected scores
def test_score_url_depth_and_segments():
    assert score_url("https://shop.com/product/widget", 0) == 1050
    assert score_url("https://shop.com/legal/privacy", 0) == 600
    assert score_url("https://shop.com/deep", 15) == 0


# frontier.rs:303-321
def test_round_robin_alternates_domains():
    f = UrlFrontier(True)
    f.push("https://a.com/1", 100)
    f.push("https://a.com/2", 90)
    f.push("https://b.com/1", 95)
    assert f.pop() == "https://a.com/1"
    assert f.pop() == "https://b.com/1"
    assert f.pop() == "https://a.com/2"


def test_pop_empty_returns_none():
    f = UrlFrontier(False)
    assert f.pop() is None
    assert len(f) == 0


# frontier.rs:331-341
def test_extract_domain_various():
    assert extract_domain("https://www.example.com/path") == "www.example.com"
    assert extract_domain("http://localhost:8080/test") == "localhost"
    assert extract_domain("no-scheme") == ""


# frontier.rs:343-353
def test_score_url_clamped():
    assert score_url("https://x.com/product/article/item/page", 0) == 1200
    assert score_url("https://x.com/legal", 20) == 0


def test_heap_tiebreak_is_url_descending():
    # BinaryHeap max-pop: equal priority → larger (case-insensitive) url first
    f = UrlFrontier(False)
    f.push("https://e.com/a", 10)
    f.push("https://e.com/b", 10)
    assert f.pop() == "https://e.com/b"
    assert f.pop() == "https://e.com/a"


def test_canonical_wave_order_deterministic():
    urls = [("https://a.com/x", 100), ("https://b.com/y", 100), ("https://a.com/z", 50)]
    assert canonical_wave_order(urls) == canonical_wave_order(list(reversed(urls)))


def test_score_urls_arrow_matches_scalar():
    import pyarrow as pa

    from spider_ray.frontier import score_urls_arrow

    urls = [
        "https://shop.com/product/widget",
        "https://shop.com/legal/privacy",
        "https://shop.com/deep",
        "https://x.com/product/article/item/page",
        "https://x.com/legal",
        "https://e.com/PAGE/Item?product=1#frag",
        "https://e.com",
        "no-scheme/product",
        "https://product.example/plain",  # term in HOST must not score
        "",
    ]
    for depth in (0, 3, 15, 20):
        vec = score_urls_arrow(pa.array(urls, pa.string()), depth)
        for u, v in zip(urls, vec):
            assert int(v) == score_url(u, depth), (u, depth)
