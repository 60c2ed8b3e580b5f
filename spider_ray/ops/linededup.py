"""Corpus-wide exact paragraph (line) dedup and text normalization.

RefinedWeb / CCNet-style hygiene passes the reference engine (a crawler,
it stops at extract) does not have, applied to the extracted-``text``
web corpus:

* ``global_line_dedup`` — keep the FIRST occurrence (corpus-global,
  ordered by ``(url, line_index)``) of every distinct non-empty line and
  drop all later occurrences, then rebuild each page's text.  This is
  the exact-paragraph dedup of RefinedWeb (Penedo et al. 2023) at line
  granularity — the corpus-global sibling of the per-host frequency
  filter in ``ops/textclean.host_boilerplate_removal``.
* ``normalize_pages`` — the CCNet normalization applied before hashing/
  dedup: lowercase, digits -> ``0``, ASCII-whitespace runs -> one space,
  trim.  Pure ``pyarrow.compute`` kernels (RE2), zero Python in the row
  path; the DuckDB oracle runs the identical RE2 patterns.

Ray Data shape of ``global_line_dedup`` (two bounded shuffles, no joins,
no driver state — same tagged-union co-group as ``ops/spans``):

1. ``map_batches`` explodes pages into ``(line, url, idx)`` rows with
   Arrow list kernels — the page text never ships, only its lines (the
   same total volume), and empty lines never enter the shuffle.
2. ``groupby(line).map_groups`` picks the ``(url, idx)``-minimum
   occurrence per distinct line and emits every OTHER occurrence as a
   drop instruction — linear per group, so a nav line shared by 10⁶
   pages costs 10⁶ - 1 output rows, never a pairwise blowup.
3. drop rows co-group with the original pages through one tagged
   ``groupby(url)`` union (no hash join); each page rebuilds its text
   minus the dropped line indexes.

At 100 TB the shuffle volume of step 1 equals the corpus text — the
same bound as any exact-dedup hash pass; the drop-instruction volume of
step 2 is the duplicated mass only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textclean import _corpus_page_filter

# ASCII whitespace, spelled explicitly so the Python/Arrow RE2 pattern and
# the DuckDB RE2 pattern are the same bytes (RE2 '\s' is ASCII-only, but
# explicit beats implicit when two engines must agree).
WS_RUN_PAT = "[ \\t\\n\\r\\f\\v]+"
DIGIT_PAT = "[0-9]"


def _line_rows(batch: pa.Table) -> pa.Table:
    """Explode corpus pages into (line, url, idx) rows, skipping empty
    lines (they carry no content and would otherwise all collapse onto
    one global winner)."""
    batch = _corpus_page_filter(batch)
    if len(batch) == 0:
        return pa.table(
            {
                "line": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "idx": pa.array([], pa.int64()),
            }
        )
    lines_list = pc.split_pattern(batch.column("text"), pattern="\n")
    flat = pc.list_flatten(lines_list)
    parent = pc.list_parent_indices(lines_list)
    # per-page line index: position within the parent list
    offsets = np.asarray(lines_list.combine_chunks().offsets, dtype=np.int64)
    idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offsets[:-1], np.diff(offsets)
    )
    t = pa.table(
        {
            "line": flat,
            "url": pc.take(batch.column("url"), parent),
            "idx": pa.array(idx, pa.int64()),
        }
    )
    return t.filter(pc.not_equal(t.column("line"), ""))


def _losers_of_line(group: pa.Table) -> pa.Table:
    """All occurrences of one distinct line EXCEPT the (url, idx)-minimum
    one -> (url, idx) drop instructions."""
    urls = np.asarray(group.column("url"))
    idxs = np.asarray(group.column("idx"), dtype=np.int64)
    if len(urls) <= 1:
        return pa.table(
            {"url": pa.array([], pa.string()), "idx": pa.array([], pa.int64())}
        )
    order = np.lexsort((idxs, urls))
    keep = np.ones(len(urls), dtype=bool)
    keep[order[0]] = False  # the winner survives; everything else drops
    return pa.table(
        {
            "url": pa.array(urls[keep], pa.string()),
            "idx": pa.array(idxs[keep], pa.int64()),
        }
    )


def global_line_dedup(corpus_dir: str):
    """``(url, n_lines, n_removed, clean_text)`` per corpus page after
    corpus-global first-occurrence line dedup (see module docstring).
    ``clean_text`` is null when every line was dropped (string_agg-over-
    nothing parity with the SQL oracle); empty lines are always kept.
    """
    import ray.data

    pages = ray.data.read_parquet(corpus_dir, columns=["url", "text"])

    drops = (
        pages.map_batches(_line_rows, batch_format="pyarrow")
        .groupby("line")
        .map_groups(_losers_of_line, batch_format="pyarrow")
    )

    def page_rows(batch: pa.Table) -> pa.Table:
        batch = _corpus_page_filter(batch)
        return pa.table(
            {
                "url": batch.column("url"),
                "text": batch.column("text"),
                "idx": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def drop_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "text": pa.nulls(batch.num_rows, pa.string()),
                "idx": batch.column("idx"),
            }
        )

    tagged = pages.map_batches(page_rows, batch_format="pyarrow").union(
        drops.map_batches(drop_rows, batch_format="pyarrow")
    )

    def rebuild(group: pa.Table) -> pa.Table:
        url = group.column("url")[0].as_py()
        texts = [t for t in group.column("text").to_pylist() if t is not None]
        lines = (texts[0] if texts else "").split("\n")
        drop = np.zeros(len(lines), dtype=bool)
        for i in group.column("idx").to_pylist():
            if i is not None:
                drop[i] = True
        kept = [ln for ln, d in zip(lines, drop) if not d]
        return pa.table(
            {
                "url": pa.array([url], pa.string()),
                "n_lines": pa.array([len(lines)], pa.int64()),
                "n_removed": pa.array([int(drop.sum())], pa.int64()),
                "clean_text": pa.array(
                    ["\n".join(kept) if kept else None], pa.string()
                ),
            }
        )

    return tagged.groupby("url").map_groups(rebuild, batch_format="pyarrow")


def normalize_pages(corpus_dir: str):
    """``(url, norm_text, n_chars)`` — CCNet-style normalization of every
    corpus page: lowercase, digits -> 0, ASCII-whitespace runs -> single
    space, trim.  Stateless vectorized ``map_batches`` (Arrow RE2
    kernels); the shape every hash-based dedup pass normalizes through.
    """
    import ray.data

    pages = ray.data.read_parquet(corpus_dir, columns=["url", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        batch = _corpus_page_filter(batch)
        t = pc.utf8_lower(batch.column("text"))
        t = pc.replace_substring_regex(t, pattern=DIGIT_PAT, replacement="0")
        t = pc.replace_substring_regex(t, pattern=WS_RUN_PAT, replacement=" ")
        t = pc.utf8_trim(t, characters=" ")
        return pa.table(
            {
                "url": batch.column("url"),
                "norm_text": t,
                "n_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return pages.map_batches(norm, batch_format="pyarrow")
