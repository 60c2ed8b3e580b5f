"""URL canonicalization tests — ported 1:1 from
/root/reference/spider/src/utils/abs.rs:148-328 plus FIXTURES.md §2."""

import pytest

from spider_ray.urlnorm import (
    convert_abs_path,
    extract_root_domain,
    get_domain_from_url,
    get_path_from_url,
    glob_expand_url,
    is_asset_url,
    is_subdomain,
    networking_capable,
    normalize_url,
    parse_absolute_url,
    prepare_url,
    relative_directory_url,
)


def base(u):
    b = parse_absolute_url(u)
    assert b is not None
    return b


# abs.rs:194-200
def test_basic_join():
    assert convert_abs_path(base("https://example.com/path/"), "/subpage") == "https://example.com/subpage"


# abs.rs:202-208
def test_absolute_href():
    href = "https://example.org/anotherpath"
    assert convert_abs_path(base("https://example.com/path/"), href) == href


# abs.rs:210-216
def test_slash_join():
    assert convert_abs_path(base("https://example.com/path/"), "/absolute") == "https://example.com/absolute"


# abs.rs:218-224
def test_empty_href():
    assert convert_abs_path(base("https://example.com/path/"), "") == "https://example.com/"


# abs.rs:226-232
def test_double_dot_href():
    assert convert_abs_path(base("https://example.com/path/"), "..") == "https://example.com/"


# abs.rs:234-244
def test_domain_like_link():
    assert (
        convert_abs_path(base("https://www.example.com/path/"), "example.org/another-path")
        == "https://www.example.com/example.org/another-path"
    )


# abs.rs:246-256
def test_relative_path_with_slash():
    assert (
        convert_abs_path(base("https://www.example.com/path/"), "/another-path")
        == "https://www.example.com/another-path"
    )


# abs.rs:258-268
def test_no_protocol_with_slash():
    assert (
        convert_abs_path(base("https://www.example.com/path/"), "example.com/other-path")
        == "https://www.example.com/example.com/other-path"
    )


# abs.rs:270-281
def test_no_invalid_protocols():
    assert (
        convert_abs_path(base("https://www.example.com"), "mailto:info@laminarpharma.com")
        == "https://www.example.com/"
    )


# abs.rs:283-292
def test_query_string():
    assert (
        convert_abs_path(base("https://example.com"), "/page?key=value&other=123")
        == "https://example.com/page?key=value&other=123"
    )


# abs.rs:294-301
def test_fragment_stripped():
    assert convert_abs_path(base("https://example.com"), "/page#section") == "https://example.com/page"


def test_absolute_fragment_stripped():
    assert (
        convert_abs_path(base("https://example.com"), "https://example.com/page#frag")
        == "https://example.com/page"
    )


# abs.rs:303-309
def test_encoded_url_preserved():
    assert "path%20with%20spaces" in convert_abs_path(base("https://example.com"), "/path%20with%20spaces")


# abs.rs:311-318
def test_port_number():
    result = convert_abs_path(base("https://example.com:8080"), "/api/data")
    assert ":8080" in result and "/api/data" in result


# abs.rs:320-327
def test_deep_relative():
    assert convert_abs_path(base("https://example.com/a/b/c/"), "../../d").startswith("https://example.com")


# abs.rs:161-175 — non-ASCII after colon must not blow up
@pytest.mark.parametrize("href", ["ab:éé", "x:éy", "abc:中文", "ab:🦀de", "ab:éé/path"])
def test_non_ascii_after_colon(href):
    convert_abs_path(base("https://example.com"), href)


# abs.rs:181-192
@pytest.mark.parametrize(
    "url", ["https://example.com/path", "http://example.org/", "https://example.com/path?q=v#frag"]
)
def test_recognizes_http_https(url):
    out = convert_abs_path(base("https://other.example"), url)
    assert out.startswith(url.split("#")[0].split("://")[0] + "://" + url.split("://")[1].split("/")[0])


@pytest.mark.parametrize(
    "href,expected_base",
    [("", True), ("#", True), ("javascript:void(0);", True), ("tel:123", True), ("data:text/plain;x", True)],
)
def test_early_returns_resolve_to_base(href, expected_base):
    assert convert_abs_path(base("https://example.com"), href) == "https://example.com/"


def test_parse_absolute_url_roots():
    assert parse_absolute_url("https://example.com/a/b?q=1") == "https://example.com/"
    assert parse_absolute_url("not a url") is None
    assert parse_absolute_url("HTTPS://EXAMPLE.com/x") == "https://example.com/"


def test_normalize_url():
    assert normalize_url("HTTPS://Example.COM") == "https://example.com/"
    assert normalize_url("https://example.com:443/x") == "https://example.com/x"
    assert normalize_url("http://example.com:80/x") == "http://example.com/x"
    assert normalize_url("http://example.com:8080/x") == "http://example.com:8080/x"
    assert normalize_url("https://example.com/a?b=1#c") == "https://example.com/a?b=1"


def test_scheme_relative_join():
    assert convert_abs_path(base("https://example.com"), "//cdn.example/x") == "https://cdn.example/x"


# page.rs:2804-2816
def test_relative_directory_url():
    assert relative_directory_url("./a")
    assert relative_directory_url("//cdn.example/x")
    assert relative_directory_url("../a")
    assert relative_directory_url("page2")
    assert relative_directory_url("example.org/path")
    assert not relative_directory_url("/rooted")
    assert not relative_directory_url("https://example.com/")
    assert not relative_directory_url("ftp://example.com/")


def test_networking_capable():
    assert networking_capable("https://x")
    assert networking_capable("http://x")
    assert networking_capable("ftp://x")
    assert networking_capable("file://x")
    assert not networking_capable("ws://x")
    assert not networking_capable("mailto:x")


# utils/mod.rs:9200-9219
def test_prepare_url():
    assert prepare_url("http://example.com/a") == "https://example.com/a"
    assert prepare_url("example.com/a") == "https://example.com/a"


# utils/mod.rs:9156-9186
def test_get_path_and_domain():
    assert get_path_from_url("https://example.com/foo/bar?q=1") == "/foo/bar?q=1"
    assert get_path_from_url("https://example.com") == "/"
    assert get_domain_from_url("https://example.com:8080/x") == "example.com:8080"
    assert get_domain_from_url("https://example.com") == "example.com"


# page.rs:10846-10871
def test_extract_root_domain():
    assert extract_root_domain("example.com") == "example"
    assert extract_root_domain("example.org") == "example"
    assert extract_root_domain("sub.example.com") == "example.com"
    assert extract_root_domain("deep.sub.example.co.uk") == "co.uk"
    assert extract_root_domain("localhost") == "localhost"


def test_is_subdomain_tld_matching():
    assert is_subdomain("example.com", "example.org")
    assert is_subdomain("example.net", "example.com")
    assert is_subdomain("a.example.com", "b.example.com")
    assert not is_subdomain("sub.example.com", "example.com")
    assert not is_subdomain("example.com", "other.com")
    assert not is_subdomain("myexample.com", "example.com")


# page.rs:2892-2899, 2048-2063
def test_is_asset_url():
    assert is_asset_url("https://example.com/a/pic.jpg")
    assert is_asset_url("https://example.com/a/PIC.JPG")
    assert is_asset_url("https://example.com/app.tar")
    assert not is_asset_url("https://example.com/page")
    assert not is_asset_url("https://example.com/page.html")
    assert not is_asset_url("https://example.com/x.io")  # len-position < 3


# features/glob.rs:20-120
def test_glob_expand():
    assert glob_expand_url("https://example.com/") == ["https://example.com/"]
    assert glob_expand_url("https://site{a,b}.example/") == [
        "https://sitea.example/",
        "https://siteb.example/",
    ]
    assert glob_expand_url("https://example.com/p[1-5:2]") == [
        "https://example.com/p1",
        "https://example.com/p3",
        "https://example.com/p5",
    ]
    assert glob_expand_url("https://example.com/p[01-03]") == [
        "https://example.com/p01",
        "https://example.com/p02",
        "https://example.com/p03",
    ]


def test_whatwg_percent_encoding():
    """Rust Url::parse parity: path/query percent-encode sets, UTF-8
    non-ASCII encoding, and NO double-encoding of existing %xx."""
    from spider_ray.urlnorm import convert_abs_path

    b = "https://example.com/"
    assert convert_abs_path(b, "/a b") == "https://example.com/a%20b"
    assert convert_abs_path(b, "/a b/c d.html") == "https://example.com/a%20b/c%20d.html"
    # already-encoded stays untouched (no %2520)
    assert convert_abs_path(b, "/a%20b") == "https://example.com/a%20b"
    # UTF-8 percent-encoding of non-ASCII path chars
    assert convert_abs_path(b, "/café") == "https://example.com/caf%C3%A9"
    # query set: space and quote encoded, '=' and '&' preserved
    assert (
        convert_abs_path(b, "/p?q=a b&r='x'")
        == "https://example.com/p?q=a%20b&r=%27x%27"
    )
    # idempotent: rejoining the output is a fixpoint
    out = convert_abs_path(b, "/a b?x=ü")
    assert convert_abs_path(b, out) == out
