"""HTML link/metadata extraction + normalization + text extraction tests.

Covers the handler semantics of page.rs:4201-4389 and the canonicalization
stressor table from FIXTURES.md §2."""

from spider_ray.htmlparse import extract_links_and_meta, hash_html, normalize_html
from spider_ray.scope import get_page_selectors
from spider_ray.textextract import extract_text

SEL = get_page_selectors("https://site0.example/", False, False)
ROOT = "https://site0.example/"


def links_of(html, page_url="https://site0.example/a/", sel=SEL, root=ROOT, **kw):
    return extract_links_and_meta(html, page_url, root, sel, **kw).links


def test_basic_anchor_extraction_order_and_dedup():
    html = (
        '<a href="/one">1</a><a href="/two">2</a><a href="/one">again</a>'
        '<a href="/ONE">case-dup</a>'
    )
    assert links_of(html) == ["https://site0.example/one", "https://site0.example/two"]


def test_aria_hidden_excluded():
    html = '<a aria-hidden="true" href="/hidden">x</a><a href="/vis">y</a>'
    assert links_of(html) == ["https://site0.example/vis"]


def test_asset_suffix_filters():
    html = '<a href="/assets/pic.jpg">p</a><a href="/app.js">j</a><a href="style.css">c</a><a href="/ok">k</a>'
    assert links_of(html) == ["https://site0.example/ok"]


def test_relative_joins_page_url_rooted_joins_root():
    html = '<a href="page2">rel</a><a href="/rooted">root</a><a href="../up">up</a>'
    assert links_of(html, page_url="https://site0.example/sec1/page1") == [
        "https://site0.example/sec1/page2",
        "https://site0.example/rooted",
        "https://site0.example/up",
    ]


def test_base_element_overrides():
    html = '<head><base href="https://site0.example/basec/"></head><a href="rel">r</a>'
    assert links_of(html) == ["https://site0.example/basec/rel"]


def test_fragment_and_ignored_protocols():
    html = '<a href="/p#frag">f</a><a href="mailto:x@y.z">m</a><a href="javascript:void(0);">j</a>'
    # mailto/javascript are "relative" hrefs → join base is the PAGE url →
    # convert_abs_path early-returns it (already-visited ⇒ no new link in crawl)
    out = links_of(html)
    assert "https://site0.example/p" in out
    assert "https://site0.example/a/" in out
    assert len(out) == 2


def test_scheme_coercion_from_https_page():
    html = '<a href="http://site0.example/x">x</a>'
    assert links_of(html) == ["https://site0.example/x"]


def test_off_domain_dropped():
    html = '<a href="https://off-domain.example/x">x</a>'
    assert links_of(html) == []
    assert links_of(html, **{"external_domains": frozenset({"off-domain.example"})}) == [
        "https://off-domain.example/x"
    ]


def test_domain_like_href_treated_as_path():
    html = '<a href="example.org/another-path">x</a>'
    assert links_of(html, page_url="https://site0.example/") == [
        "https://site0.example/example.org/another-path"
    ]


def test_query_preserved_trailing_slash_distinct():
    html = '<a href="/p?key=value&amp;other=123">q</a><a href="/sec1">a</a><a href="/sec1/">b</a>'
    assert links_of(html) == [
        "https://site0.example/p?key=value&other=123",
        "https://site0.example/sec1",
        "https://site0.example/sec1/",
    ]


def test_metadata_extraction():
    html = (
        "<head><title>My Title</title>"
        '<meta name="description" content="Desc here">'
        '<meta property="og:image" content="https://site0.example/og.png"></head>'
        "<body><p>hi</p></body>"
    )
    ex = extract_links_and_meta(html, "https://site0.example/", ROOT, SEL)
    assert ex.title == "My Title"
    assert ex.description == "Desc here"
    assert ex.og_image == "https://site0.example/og.png"


def test_title_outside_head_ignored():
    ex = extract_links_and_meta("<body><title>nope</title></body>", "https://site0.example/", ROOT, SEL)
    assert ex.title is None


def test_full_resources_extracts_scripts_and_links():
    html = '<script src="/app.js"></script><link href="/style.css"><a href="/page">p</a>'
    out = extract_links_and_meta(
        html, "https://site0.example/", ROOT, SEL, full_resources=True
    ).links
    assert "https://site0.example/app.js" in out
    assert "https://site0.example/style.css" in out
    assert "https://site0.example/page" in out


def test_links_in_script_not_extracted():
    html = '<script>var a = \'<a href="/fake">x</a>\';</script><a href="/real">r</a>'
    assert links_of(html) == ["https://site0.example/real"]


# --- normalize_html (utils/mod.rs:9221-9285) ---


def test_normalize_removes_href_scripts_attrs():
    html = (
        '<div id="d" style="color:red" data-x="1"><a href="/x" class="c">t</a>'
        "<script>evil()</script><style>.a{}</style><noscript><b>n</b></noscript>"
        '<iframe src="/f"><p>inner</p></iframe><base href="/b"></div>'
    )
    out = normalize_html(html).decode()
    assert "href" not in out
    assert "script" not in out and "style" not in out
    assert "noscript" not in out and "iframe" not in out and "base" not in out
    assert 'id="d"' in out and 'data-x="1"' in out and 'class="c"' in out
    assert "color:red" not in out


def test_hash_html_grouping():
    a = '<p>same</p><a href="/x">l</a><script>v1()</script>'
    b = '<p>same</p><a href="/y">l</a><script>v2()</script>'
    c = "<p>different</p>"
    assert hash_html(a) == hash_html(b)
    assert hash_html(a) != hash_html(c)
    assert hash_html("") == 0


# --- text extractor (FIXTURES.md §3) ---


def test_extract_text_blocks():
    html = (
        "<html><head><title>T</title><style>.x{}</style></head><body>"
        "<p>First  block</p><h1>Head</h1><ul><li>item one</li><li>item&amp;two</li></ul>"
        "<script>nope()</script><div>tail</div></body></html>"
    )
    assert extract_text(html) == "First block\nHead\nitem one\nitem&two\ntail"


def test_extract_text_inline_does_not_split():
    html = "<p>Go <a href='/x'>here</a> now</p>"
    assert extract_text(html) == "Go here now"


def test_extract_text_empty():
    assert extract_text("") == ""
    assert extract_text("<head><title>only head</title></head>") == ""


# --- metadata edge cases ported from page.rs:9732-10070 ---


def test_metadata_special_characters():
    html = (
        "<!DOCTYPE html><html><head>"
        "<title>Title with &amp; special &lt;characters&gt;</title>"
        "<meta name=\"description\" content=\"Description with &quot;quotes&quot; and 'apostrophes'\">"
        '<meta property="og:image" content="https://example.com/image?param=value&amp;other=1">'
        "</head><body></body></html>"
    )
    ex = extract_links_and_meta(html, "https://site0.example/", ROOT, SEL)
    assert ex.title is not None
    # attribute values are entity-decoded (lol_html semantics)
    assert ex.description == "Description with \"quotes\" and 'apostrophes'"
    assert ex.og_image == "https://example.com/image?param=value&other=1"


def test_metadata_unicode():
    html = (
        "<head><title>日本語タイトル</title>"
        '<meta name="description" content="Описание на русском"></head>'
    )
    ex = extract_links_and_meta(html, "https://site0.example/", ROOT, SEL)
    assert ex.title == "日本語タイトル"
    assert ex.description == "Описание на русском"


def test_metadata_partial_only_description():
    ex = extract_links_and_meta(
        '<head><meta name="description" content="only desc"></head>',
        "https://site0.example/", ROOT, SEL,
    )
    assert ex.title is None and ex.description == "only desc" and ex.og_image is None


def test_metadata_empty_html():
    ex = extract_links_and_meta("", "https://site0.example/", ROOT, SEL)
    assert ex.title is None and ex.description is None and ex.og_image is None


def test_metadata_empty_content_ignored():
    # empty content does not overwrite (handlers skip empty values)
    html = (
        '<head><meta name="description" content="real">'
        '<meta name="description" content=""></head>'
    )
    ex = extract_links_and_meta(html, "https://site0.example/", ROOT, SEL)
    assert ex.description == "real"


def test_charset_detection_shift_jis():
    from spider_ray.encoding import decode_html, detect_charset

    body = (
        '<head><meta charset="shift_jis"><title>x</title></head>'
        "<body><p>日本語のページ</p></body>"
    ).encode("shift_jis")
    assert detect_charset(body) == "shift_jis"
    assert "日本語のページ" in decode_html(body)
    assert extract_text(body) == "日本語のページ"
    # BOM beats meta
    import codecs

    assert detect_charset(codecs.BOM_UTF8 + b"<p>x</p>") == "utf-8-sig"
    assert detect_charset(b"<p>plain</p>") == "utf-8"
    # bogus label falls back
    assert detect_charset(b'<meta charset="no-such-enc"><p>x</p>') == "utf-8"


def test_content_sniff_unlabeled_bodies():
    """auto_encoder analogue (page.rs:9384-9394): NO BOM, NO meta tag —
    content-based detection must still recover the text."""
    from spider_ray.encoding import content_sniff, decode_html, detect_charset

    sj = "<body><p>ヘッダーなしのシフトJISページです。</p></body>".encode("shift_jis")
    ru = "<body><p>Это русская страница без метатега.</p></body>".encode(
        "windows-1251"
    )
    fr = "<body><p>caf\xe9 cr\xe8me br\xfbl\xe9e r\xe9sum\xe9</p></body>".encode(
        "latin-1"
    )
    assert detect_charset(sj) == "shift_jis"
    assert "ヘッダーなしのシフトJISページです。" in decode_html(sj)
    assert detect_charset(ru) == "windows-1251"
    assert "Это русская страница без метатега." in decode_html(ru)
    # isolated accents among ASCII -> western fallback, text preserved
    assert content_sniff(fr) == "windows-1252"
    assert "café crème brûlée résumé" in decode_html(fr)
    # valid UTF-8 short-circuits before any legacy heuristic
    assert content_sniff("日本語 и русский".encode("utf-8")) == "utf-8"


def test_fixture_metaless_pages_roundtrip():
    """The meta-less Shift_JIS / Windows-1251 fixture orphans decode
    byte-identically through the full extract_text path (the rows the
    extract_text_parity oracle compares)."""
    from spider_ray.fixtures import build_corpus

    rows = {r["url"]: r for r in build_corpus(n_hosts=1, pages_per_host=24)}
    for suffix in ("ja/noheader-sjis", "ru/noheader-1251"):
        row = rows[f"https://www.site0.example/{suffix}"]
        assert extract_text(row["html"]) == row["text"]
