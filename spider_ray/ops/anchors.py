"""Anchor-text aggregation per link target — the classic web-graph text
signal (how OTHER pages describe a URL): search engines index it, and
training-data pipelines use it for title/description enrichment and
query-document pair mining.

The reference engine extracts links but discards anchor text
(``page.rs:4201-4389`` streams hrefs only); this op is one of the
web-corpus operator families the Ray Data graft adds.

Pinned extraction spec (independent of the crawl machinery so the
sequential golden replays it exactly):

* anchors are ``<a ...>...</a>`` spans (DOTALL non-greedy, case-insensitive;
  nested markup inside the anchor is stripped to whitespace);
* ``aria-hidden="true"`` anchors and asset-suffix hrefs
  (``urlnorm.anchor_href_filtered``) are skipped — the same exclusions as
  the crawl link extractor;
* the target is the WHATWG-normalized absolute URL: absolute ``http(s)``
  hrefs via ``urlnorm.normalize_url``; root-relative ``/...`` hrefs
  resolved against the page's scheme+host; everything else (relative
  paths, mailto:, javascript:, fragments) is out of spec and skipped;
* anchor text is lowercased, tag-stripped, and tokenized by the repo-wide
  ``\\S+`` convention.

Ray Data shape: ONE combiner ``map_batches`` over the pruned corpus
columns emits per-batch ``(target, term, n)`` partial counts (html never
leaves the task), a ``groupby(target, term)`` folds them, and a
``groupby(target).map_groups`` ranks the top-k terms per target — the
same bounded heavy-hitter shuffle as ``corpusstats.top_terms_per_group``.
A hot target (every page linking "home") grows its group linearly in
distinct terms, never in link count.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

from ..htmlparse import parse_attrs
from ..urlnorm import anchor_href_filtered, normalize_url

ANCHOR_RE = re.compile(r"<a\b([^>]*)>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
TAG_RE = re.compile(r"<[^>]*>")
TOKEN_RE = re.compile(r"\S+")
_HOST_RE = re.compile(r"^(https?://[^/?#]+)", re.IGNORECASE)


def page_anchor_terms(page_url: str, html: str) -> Counter:
    """(target_url, term) -> count for one page, under the pinned spec."""
    counts: Counter = Counter()
    m = _HOST_RE.match(page_url or "")
    origin = m.group(1) if m else None
    for attrs_str, inner in ANCHOR_RE.findall(html or ""):
        attrs = parse_attrs(attrs_str)
        href = aria = None
        for k, v in attrs:
            if k == "href" and href is None:
                href = v
            elif k == "aria-hidden":
                aria = v
        if not href or aria == "true" or anchor_href_filtered(href):
            continue
        if href.startswith(("http://", "https://")):
            target = normalize_url(href)
        elif href.startswith("/") and origin:
            target = normalize_url(origin + href)
        else:
            continue
        if target is None:
            continue
        text = TAG_RE.sub(" ", inner).lower()
        for tok in TOKEN_RE.findall(text):
            counts[(target, tok)] += 1
    return counts


def anchor_text_terms(corpus_dir: str, k: int = 10):
    """``(target, term, n, rank)`` — the top-``k`` anchor terms pointing at
    every link target across the corpus (rank by ``n`` DESC, ties on the
    term string).

    Shape: combiner -> ONE coarse shuffle keyed by ``crc32(target) & 255``
    -> per-partition C++ group_by + Arrow sort + numpy segmented rank.
    The first version shuffled string-keyed ``(target, term)`` through the
    native groupby and then ran ``groupby(target).map_groups`` — one
    Python call PER TARGET (1.24M at sf0.1, 71.8 s measured).  256 int
    partitions with a vectorized in-partition rank do the identical fold
    with three kernel calls per partition (16.3 s same input/CPUs — the
    residual is the unavoidable full-corpus anchor parse).
    """
    import zlib

    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    from ..poolsize import coarse_fanout

    part_mask = coarse_fanout(floor=256, per_cpu=8) - 1  # driver-resolved

    def partials(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for u, h in zip(batch.column("url").to_pylist(), batch.column("html").to_pylist()):
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", "replace")
            counts.update(page_anchor_terms(u, h))
        if not counts:
            return pa.table(
                {
                    "target": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        targets, terms = zip(*counts.keys())
        parts = [zlib.crc32(t.encode("utf-8", "replace")) & part_mask
                 for t in targets]
        return pa.table(
            {
                "target": pa.array(targets, pa.string()),
                "term": pa.array(terms, pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
                "part": pa.array(parts, pa.int64()),
            }
        )

    def fold_partition(group: pa.Table) -> pa.Table:
        # cross-batch fold: one C++ group_by over the whole partition
        agg = (
            group.select(["target", "term", "n"])
            .group_by(["target", "term"])
            .aggregate([("n", "sum")])
            .rename_columns(["target", "term", "n"])
        )
        t = agg.sort_by(
            [("target", "ascending"), ("n", "descending"), ("term", "ascending")]
        ).combine_chunks()
        if not t.num_rows:
            return pa.table(
                {
                    "target": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        # segmented rank within each target run (dictionary codes -> numpy)
        codes = (
            pc.dictionary_encode(t.column("target"))
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
        )
        idx = np.arange(len(codes), dtype=np.int64)
        new = np.empty(len(codes), dtype=bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - seg_start + 1
        keep = rank <= k
        return pa.table(
            {
                "target": t.column("target").filter(pa.array(keep)),
                "term": t.column("term").filter(pa.array(keep)),
                "n": t.column("n").filter(pa.array(keep)),
                "rank": pa.array(rank[keep], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(corpus_dir, columns=["url", "html"])
    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_partition, batch_format="pyarrow")
    )
