"""Incremental re-crawl: diff a previous crawl's pages against a fresh
corpus snapshot.

The reference's incremental machinery is the ETag/If-Modified-Since
conditional fetch (``utils/etag_cache.rs``, ``utils/mod.rs:6741-6797``) — for
a corpus-join engine that becomes a JOIN of the prior pages' content
signatures against freshly parsed signatures (SURVEY.md §2.1 note on
re-crawl).  Output classes:

* ``changed``   — url present in both, signature differs
* ``unchanged`` — url present in both, signature equal (the "304" class)
* ``new``       — url in the fresh corpus pages but not in the prior run
* ``gone``      — url in the prior run but absent now (status 404 / removed)

Everything is Arrow: the prior signatures are read column-pruned
(url + signature only), broadcast via ``ray.put``, and matched inside
``map_batches`` — no shuffle."""

from __future__ import annotations

import pyarrow as pa


def recrawl_diff(prior_pages, fresh_pages_ds):
    """``prior_pages``: pyarrow Table with (url, signature) of the previous
    run; ``fresh_pages_ds``: Ray Dataset of freshly parsed pages carrying
    (url, signature, status_code).  Returns a Dataset of
    (url, change: changed|unchanged|new) plus the driver-side ``gone`` list.
    """
    import ray

    prior = dict(
        zip(
            prior_pages.column("url").to_pylist(),
            prior_pages.column("signature").to_pylist(),
        )
    )
    prior_ref = ray.put(prior)

    class Diff:
        def __init__(self):
            self.prior = ray.get(prior_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            sigs = batch.column("signature").to_pylist()
            changes = []
            for u, s in zip(urls, sigs):
                if u not in self.prior:
                    changes.append("new")
                elif self.prior[u] == s:
                    changes.append("unchanged")
                else:
                    changes.append("changed")
            return pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "change": pa.array(changes, pa.string()),
                }
            )

    from ..poolsize import autoscale_pool

    diff_ds = fresh_pages_ds.map_batches(
        Diff, batch_format="pyarrow", concurrency=autoscale_pool(2)
    )
    fresh_urls = set()
    for b in fresh_pages_ds.select_columns(["url"]).iter_batches(batch_format="pyarrow"):
        fresh_urls.update(b.column("url").to_pylist())
    gone = sorted(u for u in prior if u not in fresh_urls)
    return diff_ds, gone


def recrawl(job, corpus_dir: str, prior_pages: pa.Table, **kwargs):
    """Run a fresh crawl and classify every page against ``prior_pages``.
    Returns (CrawlResult, diff Dataset, gone urls)."""
    import ray.data

    from .crawl import RayCrawler

    cfg = job.config
    if not cfg.normalize:
        raise ValueError("recrawl requires normalize=True (content signatures)")
    res = RayCrawler(job, corpus_dir, **kwargs).run()
    tbl = res.pages_table()
    fresh_ds = ray.data.from_arrow(tbl.select(["url", "signature", "status_code"]))
    diff_ds, gone = recrawl_diff(prior_pages.select(["url", "signature"]), fresh_ds)
    return res, diff_ds, gone
