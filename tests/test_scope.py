"""Host-scoping tests — ported from /root/reference/spider/src/page.rs:10846-10960+."""

from spider_ray.scope import (
    Selectors,
    choose_join_base,
    get_page_selectors,
    parent_host_match,
    push_link,
    validate_link,
)


# page.rs:10875-10884
def test_selectors_tld():
    s = get_page_selectors("https://example.com/page", False, True)
    assert s.sub_matcher == "example"
    s2 = get_page_selectors("https://example.com/page", False, False)
    assert s2.sub_matcher == ""
    assert s2.parent_host == "example.com"
    assert s2.parent_host_scheme == "https"


def test_selectors_subdomains():
    s = get_page_selectors("https://www.example.com/", True, False)
    assert s.sub_matcher == "www.example.com"


# page.rs:10887-10920
def test_parent_host_match_tld():
    assert parent_host_match("example.com", "example", "example.com", "example.com", "example")
    assert parent_host_match("example.org", "example", "example.com", "example.com", "example")
    assert not parent_host_match("other.com", "example", "example.com", "example.com", "example")


def test_parent_host_match_exact_only_when_no_matcher():
    assert parent_host_match("example.com", "", "example.com", "", "")
    assert not parent_host_match("sub.example.com", "", "example.com", "", "")
    assert not parent_host_match(None, "x", "example.com", "", "x")


def test_parent_host_match_subdomains_three_label_seed():
    # seed www.site0.example, subdomains=True → sub_matcher = www.site0.example
    s = get_page_selectors("https://www.site0.example/", True, False)
    ok = lambda host: parent_host_match(host, s.sub_matcher, s.parent_host, s.base_input_domain, s.sub_matcher)
    assert ok("www.site0.example")
    assert ok("sub.site0.example")  # root site0.example == root of matcher
    assert not ok("site0.alt")  # root "site0" != "site0.example"
    assert not ok("off-domain.example")


def test_parent_host_match_tld_three_label_seed():
    s = get_page_selectors("https://www.site0.example/", False, True)
    assert s.sub_matcher == "site0.example"
    ok = lambda host: parent_host_match(host, s.sub_matcher, s.parent_host, s.base_input_domain, s.sub_matcher)
    assert ok("www.site0.example")
    assert ok("site0.alt")  # root "site0" == root("site0.example")
    assert ok("sub.site0.example")  # via parent root
    assert not ok("off-domain.example")


# page.rs:10925-10960 — relative link resolves against the page's own URL
def test_validate_link_subdomain_relative_resolution():
    s = get_page_selectors("https://www.example.com/", True, False)
    result = validate_link("https://sub.example.com/page", "/about", s)
    assert result == "https://sub.example.com/about"


def test_validate_link_rejects_non_http():
    s = get_page_selectors("https://example.com/", False, False)
    assert validate_link("https://example.com/", "ftp://example.com/x", s) is None


def test_validate_link_external_domains():
    s = get_page_selectors("https://example.com/", False, False)
    assert validate_link("https://example.com/", "https://other.example/x", s) is None
    assert (
        validate_link("https://example.com/", "https://other.example/x", s, frozenset({"other.example"}))
        == "https://other.example/x"
    )
    assert (
        validate_link("https://example.com/", "https://any.example/x", s, frozenset({"*"}))
        == "https://any.example/x"
    )


def test_validate_link_host_port():
    s = Selectors("", "example.com:8080", "https", "")
    assert validate_link("https://example.com:8080/", "/x", s) == "https://example.com:8080/x"


def test_push_link_scheme_coercion():
    # page.rs:2844-2848: extracted link scheme rewritten to parent scheme
    s = get_page_selectors("https://example.com/", False, False)
    assert push_link("https://example.com/", "http://example.com/x", s) == "https://example.com/x"


def test_choose_join_base():
    assert choose_join_base("page2", "https://e.com/a/b", "https://e.com/", None) == "https://e.com/a/b"
    assert choose_join_base("./x", "https://e.com/a/", "https://e.com/", None) == "https://e.com/a/"
    assert choose_join_base("/rooted", "https://sub.e.com/a", "https://e.com/", None) == "https://e.com/"
    assert (
        choose_join_base("/rooted", "https://e.com/a", "https://e.com/", "https://base.e.com/dir/")
        == "https://base.e.com/dir/"
    )
    assert choose_join_base("https://x.com/y", "https://e.com/a", "https://e.com/", None) == "https://e.com/"
