"""Prioritized URL frontier: scoring + deterministic pop order.

Re-expresses ``spider/src/utils/frontier.rs``:

* ``score_url``   — ``frontier.rs:163-185`` (base 1000 − 100·depth, +50 per
  high-value segment, −200 per low-value segment, clamp [0, 2000])
* ``UrlFrontier`` — ``frontier.rs:38-145``: max-heap ordered by
  ``(priority, url)`` (ties impossible — URLs unique), optional domain
  round-robin pop that prefers switching domains between consecutive pops.

The reference's heap order is fully deterministic given the key
``(priority, case-insensitive url)`` — our engine uses the same total order
for per-wave admission so crawl ordering is reproducible (SURVEY.md §4
"Ordering").
"""

from __future__ import annotations

import heapq

HIGH_VALUE = ("product", "article", "item", "page")
LOW_VALUE = ("legal", "privacy", "terms", "cookie", "disclaimer")


def url_path_portion(url: str) -> str:
    """``url_path`` (``frontier.rs:205-222``)."""
    start = url.find("://")
    if start == -1:
        return url
    rest = url[start + 3 :]
    slash = rest.find("/")
    if slash == -1:
        return "/"
    remaining = rest[slash:]
    q = remaining.find("?")
    if q == -1:
        h = remaining.find("#")
        end = h if h != -1 else len(remaining)
    else:
        end = q
    return remaining[:end]


def extract_domain(url: str) -> str:
    """``extract_domain`` (``frontier.rs:189-202``) — host without port."""
    start = url.find("://")
    if start == -1:
        return ""
    rest = url[start + 3 :]
    slash = rest.find("/")
    host = rest[:slash] if slash != -1 else rest
    return host.split(":", 1)[0]


def score_url(url: str, depth: int) -> int:
    """``score_url`` (``frontier.rs:163-185``)."""
    base = 1000 - depth * 100
    path = url_path_portion(url).lower()
    score = base
    for seg in HIGH_VALUE:
        if seg in path:
            score += 50
    for seg in LOW_VALUE:
        if seg in path:
            score -= 200
    return max(0, min(2000, score))


def score_urls_arrow(urls, depth: int):
    """Vectorized :func:`score_url` over a pyarrow StringArray (exact same
    semantics — verified 1:1 in tests).  Returns an int32 numpy array."""
    import numpy as np
    import pyarrow.compute as pc

    low = pc.utf8_lower(urls)
    # url_path portion: strip scheme+authority, strip query/fragment; inputs
    # without "://" keep the whole string (frontier.rs:205-222 semantics)
    path = pc.replace_substring_regex(low, pattern=r"^[^:/?#]+://[^/]*", replacement="")
    path = pc.replace_substring_regex(path, pattern=r"[?#].*$", replacement="")
    # a scheme-bearing url with no path yields "" here; rust yields "/" —
    # both contain no scoring terms, so scores agree.
    score = np.full(len(urls), 1000 - depth * 100, dtype=np.int64)
    for seg in HIGH_VALUE:
        score += np.asarray(pc.match_substring(path, seg), dtype=np.int64) * 50
    for seg in LOW_VALUE:
        score -= np.asarray(pc.match_substring(path, seg), dtype=np.int64) * 200
    return np.clip(score, 0, 2000).astype(np.int32)


class _NegStr(str):
    """Inverts string comparison so heapq (min-heap) pops the max url first,
    matching the reference's BinaryHeap tie-break ``then_with(url.cmp)``."""

    __slots__ = ()

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)


class UrlFrontier:
    """``UrlFrontier`` (``frontier.rs:38-145``) with identical pop order."""

    def __init__(self, round_robin: bool = False) -> None:
        self._heap: list[tuple[int, _NegStr, str]] = []
        self._visited: set[str] = set()
        self.round_robin = round_robin
        self._last_domain: str | None = None

    def push(self, url: str, priority: int) -> bool:
        key = url.lower()
        if key in self._visited:
            return False
        self._visited.add(key)
        heapq.heappush(self._heap, (-priority, _NegStr(key), url))
        return True

    def extend_with_priority(self, urls, priority: int) -> None:
        for url in urls:
            self.push(url, priority)

    def _pop_raw(self) -> str | None:
        if not self._heap:
            return None
        return heapq.heappop(self._heap)[2]

    def pop(self) -> str | None:
        if not self.round_robin:
            return self._pop_raw()
        last = self._last_domain
        stash: list[tuple[int, _NegStr, str]] = []
        found: tuple[int, _NegStr, str] | None = None
        while self._heap:
            entry = heapq.heappop(self._heap)
            domain = extract_domain(entry[2])
            if last is not None and domain == last and found is None:
                stash.append(entry)
            else:
                found = entry
                break
        if found is None and stash:
            found = stash.pop(0)
        for item in stash:
            heapq.heappush(self._heap, item)
        if found is not None:
            self._last_domain = extract_domain(found[2])
            return found[2]
        return None

    def drain(self) -> list[str]:
        """Pop everything in canonical order (one wave's admission order)."""
        out = []
        while True:
            url = self.pop()
            if url is None:
                return out
            out.append(url)

    def __len__(self) -> int:
        return len(self._heap)


def canonical_wave_order(
    urls_with_priority, round_robin: bool = False, last_domain: str | None = None
) -> list[str]:
    """Deterministic admission order for one wave of candidate URLs.

    Equals draining a fresh :class:`UrlFrontier` seeded with the candidates —
    the single total order both the engine and the oracle use (SURVEY.md §7.3
    "Budget determinism").
    """
    f = UrlFrontier(round_robin=round_robin)
    f._last_domain = last_domain
    for url, prio in urls_with_priority:
        f.push(url, prio)
    return f.drain()
