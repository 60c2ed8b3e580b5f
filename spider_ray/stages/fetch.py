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

FETCH_COLUMNS = ["url", "warc_ts", "html", "status", "content_type"]


def corpus_n_buckets(corpus_dir: str) -> int:
    with open(os.path.join(corpus_dir, "_corpus_manifest.json")) as f:
        return json.load(f)["n_buckets"]


def bucket_of(url: str, n_buckets: int) -> int:
    return stable_hash_str(url_host(url)) % n_buckets


class CorpusIndex:
    """url → (bucket file, row group) index over the corpus, built ONCE per
    crawl by reading only the url column (columnar pruning: ~0.005% of the
    bytes).  Per wave it yields precise row-group read descriptors — later
    waves never re-decode row groups they don't need, and URLs absent from
    the corpus resolve to 404 with ZERO I/O.

    Scale path (10¹⁰ urls): this driver-held dict becomes the same
    host-hash-sharded actor pool as ``UrlSeen`` (the routing key is already
    ``hash(host)``), with identical lookup semantics; the descriptor fan-out
    below is unchanged.
    """

    def __init__(self, corpus_dir: str):
        import pyarrow.parquet as pq
        import ray

        self.corpus_dir = corpus_dir
        self.paths: list[str] = []
        b = 0
        while True:
            p = os.path.join(corpus_dir, f"bucket={b:04d}", "part-0.parquet")
            if not os.path.exists(p):
                if b > corpus_n_buckets(corpus_dir):
                    break
                b += 1
                continue
            self.paths.append(p)
            b += 1

        @ray.remote
        def _load(path):
            f = pq.ParquetFile(path)
            has_meta = "location" in f.schema_arrow.names
            out = []
            nonok = []  # (url, status, location) for rows with status != 200
            for rg in range(f.metadata.num_row_groups):
                cols = ["url", "status", "location"] if has_meta else ["url"]
                tbl = f.read_row_group(rg, columns=cols)
                urls = tbl.column("url").to_pylist()
                out.append(urls)
                if has_meta:
                    for u, s, loc in zip(
                        urls, tbl.column("status").to_pylist(), tbl.column("location").to_pylist()
                    ):
                        if s != 200:
                            nonok.append((u, s, loc))
            return out, nonok

        per_file = ray.get([_load.remote(p) for p in self.paths])
        self.lookup: dict[str, tuple[int, int]] = {}
        # redirect/error metadata: tiny (only non-200 rows) — consulted by the
        # driver's chain resolution with zero row-group I/O per hop.  At 10¹⁰
        # scale this shards with the index (same host-hash routing).
        self.status_of: dict[str, int] = {}
        self.location_of: dict[str, str] = {}
        for fi, (groups, nonok) in enumerate(per_file):
            for rg, urls in enumerate(groups):
                for u in urls:
                    self.lookup[u] = (fi, rg)
            for u, s, loc in nonok:
                self.status_of[u] = s
                if loc is not None:
                    self.location_of[u] = loc

    def meta_get(self, url: str) -> tuple[int, str | None]:
        """(status, location) with zero I/O — redirect-resolution lookup."""
        status = self.status_of.get(url)
        if status is None:
            status = 200 if url in self.lookup else 404
        return status, self.location_of.get(url)

    def split(self, urls: list[str]):
        """→ (descriptors, missing).  Each descriptor: one file + the row
        groups holding its wanted urls (chunked ~2048 urls: tasks big enough
        that per-task scheduling overhead stays <2% of task runtime)."""
        missing = []
        by_file: dict[int, dict[int, list[str]]] = {}
        for u in urls:
            hit = self.lookup.get(u)
            if hit is None:
                missing.append(u)
            else:
                by_file.setdefault(hit[0], {}).setdefault(hit[1], []).append(u)
        descriptors = []
        for fi, groups in sorted(by_file.items()):
            chunk_rgs, chunk_urls = [], []
            for rg in sorted(groups):
                chunk_rgs.append(rg)
                chunk_urls.extend(groups[rg])
                if len(chunk_urls) >= 2048:
                    descriptors.append({"path": self.paths[fi], "row_groups": chunk_rgs, "urls": chunk_urls})
                    chunk_rgs, chunk_urls = [], []
            if chunk_urls:
                descriptors.append({"path": self.paths[fi], "row_groups": chunk_rgs, "urls": chunk_urls})
        return descriptors, missing


class ReadRowGroups:
    """map_batches UDF over descriptor rows → fetched page rows.  One
    descriptor per batch (batch_size=1): opens the file, reads exactly the
    named row groups, filters to the wanted urls."""

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.parquet as pq

        paths = batch.column("path").to_pylist()
        rgs_col = batch.column("row_groups").to_pylist()
        urls_col = batch.column("urls").to_pylist()
        out = []
        for path, rgs, urls in zip(paths, rgs_col, urls_col):
            f = pq.ParquetFile(path)
            cols = [c for c in FETCH_COLUMNS if c in f.schema_arrow.names]
            tbl = f.read_row_groups(list(rgs), columns=cols)
            mask = pc.is_in(tbl.column("url"), value_set=pa.array(urls, pa.string()))
            out.append(tbl.filter(mask))
        return pa.concat_tables(out)


def fetch_wave_indexed(urls: list[str], index: CorpusIndex):
    """Index-backed fetch: returns (Dataset | None, missing_urls)."""
    import ray.data

    descriptors, missing = index.split(urls)
    if not descriptors:
        return None, missing
    ds = ray.data.from_items(descriptors, override_num_blocks=len(descriptors))
    # batch_size=None → one task per descriptor block; downstream maps must
    # also use batch_size=None or Ray's fused operator re-bundles ALL the
    # one-row descriptor blocks into a single task (serializing the wave)
    pages = ds.map_batches(ReadRowGroups(), batch_format="pyarrow", batch_size=None)
    return pages, missing


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

        # enough blocks that the parse stage packs evenly across the pool:
        # ~256 urls per block, bounded by file count below and 512 above
        target_blocks = max(len(paths), min(512, len(urls) // 256 + 1))
        ds = ray.data.read_parquet(
            paths,
            columns=FETCH_COLUMNS,
            filter=filter_expr,
            override_num_blocks=target_blocks,
        )
        return ds, None  # missing urls resolved by the caller after parse
    dataset = pads.dataset(paths)
    table = dataset.to_table(columns=FETCH_COLUMNS, filter=filter_expr)
    found = set(table.column("url").to_pylist())
    return table, [u for u in urls if u not in found]
