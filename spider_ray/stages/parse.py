"""Parse stage: zero-copy Arrow ``map_batches`` over fetched pages.

One pass per page over the html bytes produces links + metadata + signature +
extracted text — mirroring spider's single streaming rewriter pass
(``Page::new_page_streaming``, ``page.rs:4641+``: fetch + inline link
extraction + metadata + signature in one scan).

This is a callable CLASS: the scope selectors / robots config / compiled
machinery are built once per actor in ``__init__`` and reused per batch
(actor-pool pattern).  Input batch: (url, html[, status]); output batch drops
``html`` immediately — wide binary never crosses another stage boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import CrawlConfig, CrawlJob
from ..encoding import decode_html
from ..oracle import ScopeRouter
from ..parsepage import parse_page
from ..urlnorm import url_host

PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status_code", pa.int32()),
        ("signature", pa.uint64()),
        ("title", pa.string()),
        ("description", pa.string()),
        ("og_image", pa.string()),
        ("text", pa.string()),
        ("links", pa.list_(pa.string())),
    ]
)


class ParsePages:
    """``map_batches`` UDF (pyarrow in / pyarrow out).  ``wave`` is stamped
    on every output row (per-partition lineage for checkpoint/resume)."""

    def __init__(self, job: CrawlJob, wave: int = 0):
        self.job = job
        self.wave = wave
        self.config: CrawlConfig = job.config
        self.router = ScopeRouter(job)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        statuses = (
            batch.column("status").to_pylist()
            if "status" in batch.column_names
            else [200] * len(urls)
        )
        cfg = self.config
        hosts, sigs, titles, descs, ogs, texts, links_col = [], [], [], [], [], [], []
        for url, html, status in zip(urls, htmls, statuses):
            host = url_host(url)
            sel, root = self.router.for_host(host)
            text_html = decode_html(html)
            ex = parse_page(
                text_html,
                url,
                root,
                sel,
                cfg.external_domains,
                cfg.full_resources,
                want_signature=cfg.normalize,
                want_text=True,
            )
            hosts.append(host)
            sigs.append(ex.signature if cfg.normalize else None)
            titles.append(ex.title)
            descs.append(ex.description)
            ogs.append(ex.og_image)
            texts.append(ex.text)
            links_col.append(ex.links)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "status_code": pa.array(statuses, pa.int32()),
                "signature": pa.array(sigs, pa.uint64()),
                "title": pa.array(titles, pa.string()),
                "description": pa.array(descs, pa.string()),
                "og_image": pa.array(ogs, pa.string()),
                "text": pa.array(texts, pa.string()),
                "links": pa.array(links_col, pa.list_(pa.string())),
                "wave": pa.array([self.wave] * len(urls), pa.int32()),
            }
        )


def missing_rows(urls: list[str], wave: int) -> pa.Table:
    """Synthesized 404 rows for URLs absent from the corpus (vectorized —
    waves can be missing-heavy when the link graph points at absent URLs)."""
    import pyarrow.compute as pc

    n = len(urls)
    url_arr = pa.array(urls, pa.string())
    # host: strip scheme then authority tail (C-level regex, no per-row python)
    h1 = pc.replace_substring_regex(url_arr, pattern=r"^[a-zA-Z0-9+.\-]+://", replacement="")
    hosts = pc.utf8_lower(pc.replace_substring_regex(h1, pattern=r"[/:?#].*$", replacement=""))
    return pa.table(
        {
            "url": url_arr,
            "host": hosts,
            "status_code": pa.array(np.full(n, 404, dtype=np.int32)),
            "signature": pa.nulls(n, pa.uint64()),
            "title": pa.nulls(n, pa.string()),
            "description": pa.nulls(n, pa.string()),
            "og_image": pa.nulls(n, pa.string()),
            "text": pa.array([""] * n, pa.string()),
            "links": pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.string())
            ),
            "wave": pa.array(np.full(n, wave, dtype=np.int32)),
        }
    )
