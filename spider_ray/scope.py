"""Host scoping ("selectors") and link validation.

Re-expresses the reference semantics:

* ``get_page_selectors_base`` — ``spider/src/page.rs:2994-3032``
* ``parent_host_match``       — ``spider/src/page.rs:2966-2991``
* ``validate_link``/``push_link`` — ``spider/src/page.rs:2736-2860``

A :class:`Selectors` instance is immutable crawl-scope config, broadcast to
workers inside the job config (no per-batch re-derivation).
"""

from __future__ import annotations

from dataclasses import dataclass

from .urlnorm import (
    convert_abs_path,
    extract_root_domain,
    get_domain_from_url,
    relative_directory_url,
    set_scheme,
    url_host_port,
    url_scheme,
)


@dataclass(frozen=True)
class Selectors:
    """``RelativeSelectors`` analogue (``spider/src/lib.rs:452-458``).

    * ``sub_matcher``       — selectors.0: root-domain matcher for tld/subdomains
    * ``parent_host``       — selectors.1[0]
    * ``parent_host_scheme``— selectors.1[1]
    * ``base_input_domain`` — selectors.2: original host after a seed redirect
    """

    sub_matcher: str
    parent_host: str
    parent_host_scheme: str
    base_input_domain: str = ""


def get_page_selectors(url: str, subdomains: bool, tld: bool) -> Selectors:
    """``get_page_selectors_base`` (``page.rs:2994-3032``)."""
    dname = get_domain_from_url(url)
    if url.startswith("https://"):
        scheme = "https"
    elif url.startswith("http://"):
        scheme = "http"
    elif url.startswith("file://"):
        scheme = "file"
    elif url.startswith("wss://"):
        scheme = "wss"
    elif url.startswith("ws://"):
        scheme = "ws"
    else:
        scheme = "https"
    if tld or subdomains:
        sub = extract_root_domain(dname) if tld else dname
        return Selectors(sub, dname, scheme, "")
    return Selectors("", dname, scheme, "")


def parent_host_match(
    host_name: str | None,
    base_domain: str,
    parent_host: str,
    base_host: str,
    sub_matcher: str,
) -> bool:
    """``parent_host_match`` (``page.rs:2966-2991``)."""
    if not host_name:
        return False
    if parent_host == host_name or base_host == host_name:
        return True
    if not base_domain:
        return False
    host_root = extract_root_domain(host_name)
    return (
        extract_root_domain(parent_host) == host_root
        or extract_root_domain(sub_matcher) == host_root
    )


def validate_link(
    base: str | None,
    href: str,
    selectors: Selectors,
    external_domains: frozenset[str] = frozenset(),
) -> str | None:
    """``validate_link`` (``page.rs:2736-2801``): canonicalize + scope-check.

    ``base`` is the join base already chosen by the caller (page URL for
    relative hrefs, crawl root otherwise — see :func:`choose_join_base`).
    Returns the absolute URL (scheme NOT yet coerced) or None when out of
    scope.
    """
    if base is None:
        return None
    abs_url = convert_abs_path(base, href)
    scheme = url_scheme(abs_url)
    if scheme not in ("https", "http"):
        return None
    host, port = url_host_port(abs_url)
    can = parent_host_match(
        host or None,
        selectors.sub_matcher,
        selectors.parent_host,
        selectors.base_input_domain,
        selectors.sub_matcher,
    )
    if not can and host and port is not None:
        can = parent_host_match(
            f"{host}:{port}",
            selectors.sub_matcher,
            selectors.parent_host,
            selectors.base_input_domain,
            selectors.sub_matcher,
        )
    if not can and host and external_domains:
        can = host in external_domains or "*" in external_domains
    return abs_url if can else None


def push_link(
    base: str | None,
    href: str,
    selectors: Selectors,
    external_domains: frozenset[str] = frozenset(),
) -> str | None:
    """``push_link`` (``page.rs:2806-2860``): validate + coerce scheme."""
    abs_url = validate_link(base, href, selectors, external_domains)
    if abs_url is None:
        return None
    if url_scheme(abs_url) != selectors.parent_host_scheme:
        abs_url = set_scheme(abs_url, selectors.parent_host_scheme)
    return abs_url


def choose_join_base(
    href: str,
    page_url: str,
    crawl_root: str | None,
    base_element: str | None,
) -> str:
    """Join-base choice of the link handler (``page.rs:4284-4293``).

    * relative hrefs (./, //, ../, bare) → the page URL
    * root-absolute and other hrefs      → the crawl root (``domain_parsed``)
    * a captured ``<base href>`` overrides both once seen
    """
    if base_element is not None:
        return base_element
    if relative_directory_url(href) or crawl_root is None:
        return page_url
    return crawl_root
