"""Fetch stage: the corpus join — "the network" is a Parquet web-page table.

This is the engine's analogue of spider's pluggable ``remote_fetcher``
transport (``spider/src/fetcher.rs``, wired ``website.rs:7585-7732``): the
admitted frontier batch is looked up in the corpus by ``url`` and everything
else (tracking, robots, scheduling, extraction) stays in the engine.

Scale design (10¹⁰-URL layout):
* the corpus is bucketed by ``stable_hash(host) % n_buckets`` and sorted by
  ``url`` inside each bucket — a wave's fetch reads ONLY the touched buckets,
  with an ``url ∈ wave_urls`` predicate pushed into the Parquet scan
  (row-group pruning via min/max url stats + row-level filtering);
* columns are pruned at the read (``url, warc_ts, html, status``; the golden
  ``text`` column is never read — the engine re-extracts from html);
* per-host wave quotas (politeness) bound the per-bucket url-list size, so
  the pushed-down filter stays small even at frontier scale.
"""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..hashing import stable_hash_str
from ..urlnorm import url_host

FETCH_COLUMNS = ["url", "warc_ts", "html", "status"]


def corpus_n_buckets(corpus_dir: str) -> int:
    with open(os.path.join(corpus_dir, "_corpus_manifest.json")) as f:
        return json.load(f)["n_buckets"]


def bucket_of(url: str, n_buckets: int) -> int:
    return stable_hash_str(url_host(url)) % n_buckets


def fetch_wave(urls: list[str], corpus_dir: str, ray_data: bool = True):
    """Fetch one wave of admitted URLs from the bucketed corpus.

    Returns (ray.data.Dataset | pyarrow.Table of found rows, missing_urls).
    The Dataset path streams blocks (one read task per touched bucket); the
    driver only ever sees which urls were found, never the html.
    """
    n_buckets = corpus_n_buckets(corpus_dir)
    touched: dict[int, list[str]] = {}
    for u in urls:
        touched.setdefault(bucket_of(u, n_buckets), []).append(u)

    paths = [
        os.path.join(corpus_dir, f"bucket={b:04d}", "part-0.parquet")
        for b in sorted(touched)
        if os.path.exists(os.path.join(corpus_dir, f"bucket={b:04d}", "part-0.parquet"))
    ]
    want = set(urls)
    if not paths:
        return None, list(urls)

    filter_expr = pc.field("url").isin(list(want))

    if ray_data:
        import ray.data

        ds = ray.data.read_parquet(
            paths,
            columns=FETCH_COLUMNS,
            filter=filter_expr,
            override_num_blocks=max(1, min(len(paths), 64)),
        )
        return ds, None  # missing urls resolved by the caller after parse
    dataset = pads.dataset(paths)
    table = dataset.to_table(columns=FETCH_COLUMNS, filter=filter_expr)
    found = set(table.column("url").to_pylist())
    return table, [u for u in urls if u not in found]
