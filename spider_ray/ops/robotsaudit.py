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

Ray Data shape (auto broadcast/cogroup, the
``textclean.host_boilerplate_removal`` pattern):

* **broadcast** (host count fits a worker heap): robots rows — one tiny
  row per host — collect once and ship via ``ray.put`` as a
  host→(status, body) dict; each audit actor PARSES a host's rules
  lazily on first use (memoized per actor).  The page pass is a
  stateless per-batch count combiner ``(host, n_pages, n_disallowed)``
  followed by one ``groupby(host)`` fold of integer partials.
* **cogroup** (10⁸+ hosts — the dict itself is a driver/worker
  materialization): robots rows and slim ``(host, url)`` page rows
  tag-union into ONE shuffle keyed by ``hash(host)``; every host's rules
  AND pages co-locate, so the partition parses each host's rules once,
  evaluates its pages, and emits FINAL ``(host, n_pages, n_disallowed)``
  rows — no second fold, no driver state.
* ``mode="auto"`` counts robots hosts distributedly (O(1) driver) and
  picks broadcast iff at most ``broadcast_max_hosts``.
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


def _page_keep_mask(batch: pa.Table):
    """Audited-page predicate: status-200 minus robots.txt/sitemap.xml."""
    urls = batch.column("url")
    return pc.and_(
        pc.equal(batch.column("status"), 200),
        pc.invert(
            pc.or_(
                pc.ends_with(urls, "robots.txt"),
                pc.ends_with(urls, "sitemap.xml"),
            )
        ),
    )


def _robots_winners(rows):
    """Deterministic per-host robots row: min by ``(url, status, body)``
    over ``(host, url, status, body)`` rows.  A host can carry robots.txt
    under several schemes (http AND https); without a pinned winner the
    broadcast tier (``take_all`` order) and the cogroup tier (shuffle row
    order) could disagree, and either could flip run-to-run.  Shared by
    BOTH tiers so mode parity holds for such hosts."""
    best: dict[str, tuple] = {}
    for h, u, st, body in rows:
        cand = (u or "", int(st), body if body is not None else "")
        cur = best.get(h)
        if cur is None or cand < (cur[0] or "", int(cur[1]),
                                  cur[2] if cur[2] is not None else ""):
            best[h] = (u, int(st), body)
    return best


def _robots_audit_cogroup(robots_scan, pages):
    """Sharded tier (module docstring): one hash(host) shuffle co-locates
    each host's robots rules with its slim page rows; partitions emit
    final per-host counts."""
    from ..poolsize import coarse_fanout
    from .tfidf import term_hash_parts

    nparts = coarse_fanout()

    def robots_tagged(batch: pa.Table) -> pa.Table:
        hosts = pa.array(
            [u.split("://", 1)[1].split("/", 1)[0]
             for u in batch.column("url").to_pylist()],
            pa.string(),
        )
        t = pa.table(
            {
                "host": hosts,
                # carry the robots url: the deterministic per-host winner
                # (min by (url, status, body)) needs it — shuffle row
                # order is nondeterministic, so last-write-wins could pick
                # a different scheme's rules run-to-run
                "url": batch.column("url"),
                "status": pc.cast(batch.column("status"), pa.int64()),
                "body": pa.array(
                    [_decode(b) for b in batch.column("html").to_pylist()],
                    pa.string(),
                ),
                "is_robots": pa.nulls(len(batch), pa.int8()).fill_null(1),
            }
        )
        return t.append_column("part", term_hash_parts(hosts, nparts))

    def page_tagged(batch: pa.Table) -> pa.Table:
        t = batch.filter(_page_keep_mask(batch))
        hosts = _hosts_of(t.column("url")) if len(t) else pa.array([], pa.string())
        out = pa.table(
            {
                "host": hosts,
                "url": t.column("url"),
                "status": pa.nulls(len(t), pa.int64()),
                "body": pa.nulls(len(t), pa.string()),
                "is_robots": pa.nulls(len(t), pa.int8()).fill_null(0),
            }
        )
        return out.append_column("part", term_hash_parts(out.column("host"), nparts))

    def audit_partition(group: pa.Table) -> pa.Table:
        is_r = group.column("is_robots")
        rb = group.filter(pc.equal(is_r, 1))
        best = _robots_winners(
            zip(
                rb.column("host").to_pylist(),
                rb.column("url").to_pylist(),
                rb.column("status").to_pylist(),
                rb.column("body").to_pylist(),
            )
        )
        parsers: dict[str, RobotFileParser | None] = {}
        for h, (_u, st, body) in best.items():
            p = RobotFileParser()
            p.read_status(int(st), body)
            parsers[h] = p
        pg = group.filter(pc.equal(is_r, 0))
        n_pages: dict[str, int] = {}
        n_dis: dict[str, int] = {}
        for host, url in zip(
            pg.column("host").to_pylist(), pg.column("url").to_pylist()
        ):
            n_pages[host] = n_pages.get(host, 0) + 1
            p = parsers.get(host)
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

    return (
        robots_scan.map_batches(robots_tagged, batch_format="pyarrow")
        .union(pages.map_batches(page_tagged, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(audit_partition, batch_format="pyarrow")
    )


def robots_audit(corpus_dir: str, concurrency=None, mode: str = "auto",
                 broadcast_max_hosts: int = 1_000_000):
    """``(host, n_pages, n_disallowed)`` per corpus host (see module
    docstring for the pinned spec and the broadcast/cogroup tiers)."""
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

    if mode == "cogroup":
        return _robots_audit_cogroup(robots_scan, pages)
    if mode == "auto":
        robots_scan = robots_scan.materialize()
        if robots_scan.count() > broadcast_max_hosts:
            return _robots_audit_cogroup(robots_scan, pages)

    winners = _robots_winners(
        (
            r["url"].split("://", 1)[1].split("/", 1)[0],
            r["url"],
            r["status"],
            _decode(r["html"]),
        )
        for r in robots_scan.take_all()
    )
    robots_by_host: dict[str, tuple[int, str | None]] = {
        h: (st, body) for h, (_u, st, body) in winners.items()
    }
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
            t = batch.filter(_page_keep_mask(batch))
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
