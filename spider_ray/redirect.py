"""Redirect semantics — policy Loose/Strict/None, hop limit, SSRF guard,
seed-redirect selector rebuild.

Re-expresses the reference's redirect handling for the corpus-join fetch
(the corpus models a redirect as a 3xx row with a ``location`` column):

* ``RedirectPolicy``            — ``spider/src/configuration.rs:37-60``
  (default Loose, ``redirect_limit`` default 7 — ``configuration.rs:396-398``)
* ``setup_redirect_policy``     — ``spider/src/website.rs:2728-2735``
* ``ssrf_limited_policy``       — ``website.rs:2601-2617`` (Loose)
* ``setup_strict_policy``       — ``website.rs:2619-2727`` (Strict; matching
  hosts follow under the default policy cap of 10; an ``initial_redirect``
  crawl-global allowance of 1 — 2 when robots is on — lets the seed's
  cross-host redirect through; everything else stops, returning the 3xx)
* ``is_ssrf_redirect``          — ``website.rs:2543-2597`` (every hop of every
  policy is screened; loopback/private/link-local/metadata targets abort)
* seed-redirect ``modify_selectors`` — ``utils/mod.rs:9121-9139``, invoked
  ``page.rs:4735-4747``: on a cross-host redirect of the SEED, the scope
  selectors are rebuilt for the target and the original host is kept in
  scope via ``base_input_domain``.

An aborted redirect (SSRF hit or hop-limit exceeded) fails the whole fetch:
the page row carries ``status_code = 0`` (network-error analogue), no
content, no links.  A Strict "stop" returns the 3xx response itself.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass
from urllib.parse import urljoin

from .urlnorm import normalize_url, url_host, url_scheme

#: status_code synthesized for an aborted (errored) redirect chain.
REDIRECT_ERROR_STATUS = 0

#: the reqwest default policy's hop cap, used by Strict for matching hosts
#: (``default_policy.redirect(attempt)`` — reqwest ``Policy::default()`` = 10).
_DEFAULT_POLICY_LIMIT = 10

_METADATA_HOSTS = frozenset({"169.254.169.254", "metadata.google.internal", "metadata.goog"})


def is_ssrf_redirect(url: str) -> bool:
    """``is_ssrf_redirect`` (``website.rs:2543-2597``) — True when the hop
    target must be blocked (non-http scheme, localhost aliases, cloud
    metadata, or loopback/private/link-local/unspecified/broadcast IPs)."""
    scheme = url_scheme(url)
    if scheme not in ("http", "https"):
        return True
    host = url_host(url)
    if not host:
        return True
    if host in ("localhost", "0.0.0.0") or host.endswith(".localhost"):
        return True
    # urlsplit strips IPv6 brackets already; cover both spellings
    if host in ("[::1]", "[::0]", "::1", "::0"):
        return True
    if host in _METADATA_HOSTS:
        return True
    ip_host = host[1:-1] if host.startswith("[") and host.endswith("]") else host
    try:
        ip = ipaddress.ip_address(ip_host)
    except ValueError:
        return False
    if ip.version == 4:
        return _v4_blocked(ip) or ip == ipaddress.IPv4Address("255.255.255.255")
    if ip.is_loopback or ip.is_unspecified:
        return True
    v4 = ip.ipv4_mapped
    return v4 is not None and _v4_blocked(v4)


_V4_PRIVATE = (
    ipaddress.ip_network("10.0.0.0/8"),
    ipaddress.ip_network("172.16.0.0/12"),
    ipaddress.ip_network("192.168.0.0/16"),
)


def _v4_blocked(ip) -> bool:
    """Rust ``Ipv4Addr`` table: loopback ∪ RFC1918 private ∪ link-local ∪
    unspecified (broadcast is checked separately — not part of the mapped-v4
    branch, mirroring the reference)."""
    return (
        ip.is_loopback
        or any(ip in net for net in _V4_PRIVATE)
        or ip in ipaddress.ip_network("169.254.0.0/16")
        or ip.is_unspecified
    )


@dataclass
class Resolution:
    """Terminal result of following (or not following) a redirect chain."""

    requested: str
    final_url: str  # URL whose response the page carries
    status: int
    error: bool = False  # aborted: SSRF hit or hop limit exceeded
    hops: int = 0

    @property
    def destination(self) -> str | None:
        """``final_redirect_destination`` column value (``page.rs``: set only
        when the response URL differs from the requested URL)."""
        if self.error or self.final_url == self.requested:
            return None
        return self.final_url


class RedirectResolver:
    """Crawl-global redirect resolution.  One instance per crawl — it owns
    the Strict policy's ``initial_redirect`` allowance counter
    (``website.rs:2633-2637``: 1, or 2 when ``respect_robots_txt``)."""

    def __init__(self, config) -> None:
        self.policy: str = getattr(config, "redirect_policy", "loose")
        self.limit: int = getattr(config, "redirect_limit", 7)
        self.initial_allowance = 2 if config.respect_robots_txt else 1
        self.initial_used = 0
        self.subdomains = config.subdomains
        self.tld = config.tld

    def _strict_match(self, target_host: str, crawl_host: str) -> bool:
        """Strict host gate (``website.rs:2645-2655``); ``domain_name`` is
        the raw host string (``page.rs:2931-2933``), so the tld branch is an
        exact host comparison like the default branch.

        INTENTIONAL DIVERGENCE from the reference: the subdomain branch
        requires a dot boundary (``endswith('.' + crawl_host)``) where
        ``website.rs:2653`` uses a bare ``ends_with`` suffix match.  The
        bare suffix would let ``evilsite0.example`` match ``site0.example``
        — a suffix-confusion hole; the hardened gate blocks that while
        accepting every true subdomain.  Regression-tested in
        tests/test_redirect.py (suffix-but-not-subdomain targets stay
        blocked under Strict)."""
        if self.subdomains and target_host.endswith("." + crawl_host):
            return True
        return target_host == crawl_host

    def resolve(self, url: str, meta_get, crawl_host: str) -> Resolution:
        """Follow the chain starting at ``url``.

        ``meta_get(url) -> (status, location | None)`` — metadata-only corpus
        lookup (no body reads during resolution).  ``crawl_host`` is the host
        of the crawl root governing this URL (``domain_parsed``)."""
        status, location = meta_get(url)
        if self.policy == "none":
            return Resolution(url, url, status)
        current, hops = url, 0
        while 300 <= status < 400 and location:
            target = normalize_url(urljoin(current, location))
            if target is None:
                break  # unparseable Location → return the 3xx as-is
            prev_len = hops + 1  # attempt.previous().len()
            if is_ssrf_redirect(target):
                return Resolution(url, current, status, error=True, hops=hops)
            if self.policy == "loose":
                if prev_len > self.limit:
                    return Resolution(url, current, status, error=True, hops=hops)
            else:  # strict — website.rs:2643-2668 order
                if self._strict_match(url_host(target), crawl_host):
                    if prev_len > _DEFAULT_POLICY_LIMIT:
                        return Resolution(url, current, status, error=True, hops=hops)
                elif prev_len > self.limit:
                    return Resolution(url, current, status, error=True, hops=hops)
                elif self.initial_used < self.initial_allowance:
                    self.initial_used += 1
                else:
                    # attempt.stop(): the 3xx response itself is returned
                    return Resolution(url, current, status, hops=hops)
            current = target
            hops += 1
            status, location = meta_get(current)
        return Resolution(url, current, status, hops=hops)
