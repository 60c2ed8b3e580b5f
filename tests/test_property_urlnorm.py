"""Property-based tests (hypothesis) for the pure URL core: the reference's
inline tables pin exact cases; these pin INVARIANTS over arbitrary inputs —
no crashes, fragment-free outputs, idempotent joins, scheme discipline."""

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.urlnorm import (
    convert_abs_path,
    is_asset_url,
    normalize_url,
    parse_absolute_url,
)

BASES = st.sampled_from(
    [
        "https://www.site0.example/",
        "https://www.site0.example/sec1/page2.html",
        "http://sub.example.com/a/b/",
        "https://example.com:8443/x?q=1",
    ]
)

# printable-ish hrefs including URL metacharacters and unicode
HREFS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=80,
)


@settings(max_examples=300, deadline=None)
@given(base=BASES, href=HREFS)
def test_convert_abs_path_total_and_fragment_free(base, href):
    out = convert_abs_path(base, href)
    # total: never raises, always returns a string
    assert isinstance(out, str) and out
    # fragments are always stripped (abs.rs:125-146)
    assert "#" not in out
    # scheme discipline: result parses with an http(s) scheme
    assert out.startswith("http://") or out.startswith("https://")


@settings(max_examples=300, deadline=None)
@given(base=BASES, href=HREFS)
def test_convert_abs_path_idempotent_on_absolute(base, href):
    """Joining the produced absolute URL again (as an absolute href) is a
    fixpoint — canonicalization is idempotent."""
    out = convert_abs_path(base, href)
    again = convert_abs_path(base, out)
    assert again == out


@settings(max_examples=200, deadline=None)
@given(url=HREFS)
def test_normalize_parse_never_raise(url):
    normalize_url(url)  # None or str, never raises
    parse_absolute_url(url)
    is_asset_url(url if "://" in url else f"https://h.example/{url}")


@settings(max_examples=200, deadline=None)
@given(base=BASES, href=HREFS)
def test_dot_segments_collapsed(base, href):
    """WHATWG remove_dot_segments: no '/./' or '/../' survives in the path
    (ADVICE round-1 item — absolute and relative joins canonicalize alike)."""
    out = convert_abs_path(base, href)
    path = out.split("://", 1)[1]
    path = path.split("?", 1)[0]
    host_and_path = path.split("/", 1)
    if len(host_and_path) == 2:
        p = "/" + host_and_path[1]
        assert "/./" not in p and not p.endswith("/.")
        assert "/../" not in p and not p.endswith("/..")
