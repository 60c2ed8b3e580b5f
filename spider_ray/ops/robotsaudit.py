"""Corpus-wide robots.txt compliance audit.

"How much of what we hold would the host's robots.txt disallow?" — the
standard hygiene question over a crawled corpus (licensing reviews,
re-crawl planning, takedown triage).  Decision semantics are the engine's
reference-ported ``robots.RobotFileParser`` (parser.rs tables, pinned by
``tests/test_robots.py``) — the same parser the crawl obeys, evaluated
here retrospectively over every held page.

Pinned spec:

* a host's robots state is the corpus row ``{scheme}://{host}/robots.txt``
  folded with ``RobotFileParser.read_status(status, body)`` (403 →
  disallow-all, other 4xx → allow-all, 200 → parse; parser.rs:341-368);
  hosts with NO robots row are fully allowed;
* audited pages: status-200 rows minus robots.txt/sitemap.xml rows;
* agent: the wildcard ``"*"`` entry (an audit has no single crawler
  identity).

Ray Data shape: the robots rows are one tiny row per host — they are
collected once, shipped via ``ray.put`` as a host→(status, body) dict, and
each audit actor PARSES a host's rules lazily on first use (memoized per
actor).  The page pass is a stateless per-batch count combiner
``(host, n_pages, n_disallowed)`` followed by one ``groupby(host)`` fold
of integer partials.  At 10⁸+ hosts, shard the robots dict by
``hash(host)`` and route page batches to the owning shard instead of the
single broadcast (the ``textclean.host_boilerplate_removal`` auto
broadcast/cogroup pattern).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..robots import RobotFileParser
from .textclean import _hosts_of

AUDIT_AGENT = "*"


def _decode(body) -> str | None:
    if body is None:
        return None
    if isinstance(body, (bytes, bytearray)):
        from ..encoding import decode_html

        return decode_html(bytes(body))
    return body


def robots_audit(corpus_dir: str, concurrency=None):
    """``(host, n_pages, n_disallowed)`` per corpus host (see module
    docstring for the pinned spec)."""
    import ray
    import ray.data

    import pyarrow.dataset as pads

    # robots rows are ~1/host: push the url predicate into the Parquet scan
    # so the html column decompresses ONLY for matching rows — the audit
    # pass below never reads html at all (the op was reading the full html
    # column twice; this is a pure url/status analysis plus |hosts| bodies)
    robots_scan = ray.data.read_parquet(
        corpus_dir,
        columns=["url", "html", "status"],
        filter=pc.ends_with(pads.field("url"), pattern="robots.txt"),
    )
    pages = ray.data.read_parquet(corpus_dir, columns=["url", "status"])

    robots_by_host: dict[str, tuple[int, str | None]] = {}
    for r in robots_scan.take_all():
        host = r["url"].split("://", 1)[1].split("/", 1)[0]
        robots_by_host[host] = (r["status"], _decode(r["html"]))
    robots_ref = ray.put(robots_by_host)

    class Auditor:
        def __init__(self):
            self.raw = ray.get(robots_ref)
            self.parsers: dict[str, RobotFileParser | None] = {}

        def _parser(self, host: str) -> RobotFileParser | None:
            if host not in self.parsers:
                raw = self.raw.get(host)
                if raw is None:
                    self.parsers[host] = None  # no robots row: fully allowed
                else:
                    p = RobotFileParser()
                    p.read_status(raw[0], raw[1])
                    self.parsers[host] = p
            return self.parsers[host]

        def __call__(self, batch: pa.Table) -> pa.Table:
            urls = batch.column("url")
            keep = pc.and_(
                pc.equal(batch.column("status"), 200),
                pc.invert(
                    pc.or_(
                        pc.ends_with(urls, "robots.txt"),
                        pc.ends_with(urls, "sitemap.xml"),
                    )
                ),
            )
            t = batch.filter(keep)
            hosts = _hosts_of(t.column("url")).to_pylist()
            n_pages: dict[str, int] = {}
            n_dis: dict[str, int] = {}
            for host, url in zip(hosts, t.column("url").to_pylist()):
                n_pages[host] = n_pages.get(host, 0) + 1
                p = self._parser(host)
                if p is not None and not p.can_fetch(AUDIT_AGENT, url):
                    n_dis[host] = n_dis.get(host, 0) + 1
            keys = list(n_pages.keys())
            return pa.table(
                {
                    "host": pa.array(keys, pa.string()),
                    "n_pages": pa.array([n_pages[h] for h in keys], pa.int64()),
                    "n_disallowed": pa.array(
                        [n_dis.get(h, 0) for h in keys], pa.int64()
                    ),
                }
            )

    from ..poolsize import autoscale_pool

    partials = pages.map_batches(
        Auditor,
        batch_format="pyarrow",
        concurrency=concurrency or autoscale_pool(1),
    )
    agg = partials.groupby("host").sum(["n_pages", "n_disallowed"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "host": b.column("host"),
                "n_pages": pc.cast(b.column("sum(n_pages)"), pa.int64()),
                "n_disallowed": pc.cast(b.column("sum(n_disallowed)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
