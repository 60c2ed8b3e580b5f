"""parse_page (single-pass) must agree exactly with the three single-purpose
functions on every fixture page and every stressor construct."""

import pytest

from spider_ray.fixtures import build_corpus, seed_of
from spider_ray.htmlparse import extract_links_and_meta, hash_html
from spider_ray.parsepage import parse_page
from spider_ray.scope import get_page_selectors
from spider_ray.textextract import extract_text
from spider_ray.urlnorm import url_host


@pytest.mark.parametrize("subdomains,tld,full_resources", [(False, False, False), (True, True, True)])
def test_parse_page_matches_components_on_corpus(subdomains, tld, full_resources):
    rows = build_corpus()
    sel = get_page_selectors(seed_of(0), subdomains, tld)
    root = seed_of(0)
    ext = frozenset({"off-domain.example"})
    for r in rows:
        html = r["html"].decode("utf-8", "replace")
        page_url = r["url"]
        combined = parse_page(
            html, page_url, root, sel, ext, full_resources, want_signature=True, want_text=True
        )
        ref = extract_links_and_meta(html, page_url, root, sel, ext, full_resources)
        assert combined.links == ref.links, page_url
        assert combined.title == ref.title
        assert combined.description == ref.description
        assert combined.og_image == ref.og_image
        assert combined.base_href == ref.base_href
        assert combined.signature == hash_html(html), page_url
        assert combined.text == extract_text(html), page_url


def test_parse_page_edge_cases():
    sel = get_page_selectors("https://e.com/", False, False)
    for html in [
        "",
        "<p>plain</p>",
        '<head><base href="https://e.com/b/"><title>T</title></head><a href="x">y</a>',
        "<script>var x='<a href=\"/no\">n</a>'</script><a href='/yes'>y</a>",
        "<noscript><a href='/hidden'>h</a></noscript>",
        "<textarea>some <b>raw</b> text</textarea>",
        "<!-- comment --><div id='k' junk='drop'>text</div>",
    ]:
        c = parse_page(html, "https://e.com/p", "https://e.com/", sel, want_signature=True)
        ref = extract_links_and_meta(html, "https://e.com/p", "https://e.com/", sel)
        assert c.links == ref.links, html
        assert c.signature == hash_html(html), html
        assert c.text == extract_text(html), html


def test_link_resolver_fast_vs_slow_hrefs():
    """Adversarial hrefs: LinkResolver must equal the generic path exactly."""
    from spider_ray.parsepage import LinkResolver
    from spider_ray.scope import choose_join_base, get_page_selectors, push_link

    sel = get_page_selectors("https://www.site0.example/", False, False)
    ext = frozenset({"off-domain.example"})
    cases = [
        "/plain", "/a/b", "/a/b/", "/a?q=1&x=2", "/a#frag", "/a/../b", "/./a",
        "//cdn.example/x", "/a//b", "page2", "page2/", "sub/page?x=1", "a..b",
        "a../b", "x#y", "?q=1", ".", "..", "../up", "./here", "", "#",
        "javascript:void(0);", "mailto:a@b.c", "https://www.site0.example/abs",
        "HTTPS://WWW.SITE0.EXAMPLE/UP", "http://www.site0.example/coerce",
        "example.org/path", "tel:123", "data:x", "wss://w/x", "ftp://f/x",
        "/a;p=1", "b;p=2", "a:b", "/x:y",
    ]
    for page_url in [
        "https://www.site0.example/",
        "https://www.site0.example/sec1/page3",
        "https://www.site0.example/sec1/",
        "https://www.site0.example/p?q=1",
    ]:
        r = LinkResolver(page_url, "https://www.site0.example/", sel, ext)
        for href in cases:
            base = choose_join_base(href.strip(), page_url, "https://www.site0.example/", None)
            slow = push_link(base, href, sel, ext)
            fast = r.resolve(href, None)
            assert fast == slow, (page_url, href, fast, slow)


def test_links_only_scanner_matches_parse_page_on_corpus():
    """extract_links_only (restricted token scan) must produce the exact
    link dict of the full parse over EVERY fixture page — the parity
    contract the graph extractors rely on."""
    import glob

    import pyarrow.parquet as pq

    from spider_ray.encoding import decode_html
    from spider_ray.fixtures import ensure_scale
    from spider_ray.ops.linkgraph import _page_root
    from spider_ray.parsepage import extract_links_only, parse_page
    from spider_ray.scope import get_page_selectors

    corpus = ensure_scale("sf0.01")
    all_domains = frozenset({"*"})
    checked = 0
    for f in sorted(glob.glob(f"{corpus}/*/*.parquet")):
        t = pq.read_table(f, columns=["url", "html", "status"])
        for url, html, st in zip(
            t.column("url").to_pylist(),
            t.column("html").to_pylist(),
            t.column("status").to_pylist(),
        ):
            if st != 200 or not html:
                continue
            h = decode_html(html)
            sel = get_page_selectors(url, False, False)
            root = _page_root(url)
            full = parse_page(
                h, url, root, sel, all_domains,
                want_signature=False, want_text=False,
            ).links
            fast = list(extract_links_only(h, url, root, sel, all_domains).values())
            assert full == fast, url
            checked += 1
    assert checked > 900
