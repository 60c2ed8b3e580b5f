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

Ray Data shape of ``global_line_dedup`` (two slim shuffles, no joins, no
driver state; page TEXT is never shuffled):

1. one task per input shard explodes its pages into slim
   ``(h1, h2, occ)`` line-HASH rows (128-bit BLAKE2b, the CCNet
   line-dedup recipe; ``occ`` order-encodes url/idx/shard) — integer
   sort keys; empty lines never enter the shuffle (always kept).
2. ``groupby(h1, h2).min(occ)`` — a NATIVE vectorized aggregate, zero
   per-group Python — picks the (url, idx)-minimum occurrence of every
   distinct line; a nav line shared by 10⁶ pages folds combiner-style,
   never a pairwise blowup.
3. ``groupby(file_id)`` routes each shard's winners back to its source;
   the rebuild task re-reads its OWN parquet shard worker-locally
   (pruned columns) and reassembles every page, keeping winner and
   empty lines.

At 100 TB the shuffle volume is one hash row per line plus the
duplicated mass — the corpus text itself moves zero times, and the
output is partitioned by input shard (resumable).
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


def _hash128(line: str) -> tuple[int, int]:
    """128-bit BLAKE2b line fingerprint as two int64 halves — the shuffle
    key.  Grouping by a hash instead of the line text is the CCNet recipe
    (their line dedup shuffles SHA1 prefixes, not lines): it turns the
    all-to-all into fixed 32-byte rows with integer sort keys (measured at
    the sf0.1 fixture: 37.6M-row string-keyed sort ~6.5 min, hash-keyed
    seconds).  At 128 bits a collision across even 10¹² distinct lines is
    ~1e-14 — beyond any realistic corpus."""
    import hashlib

    d = hashlib.blake2b(line.encode("utf-8"), digest_size=16).digest()
    return (
        int.from_bytes(d[:8], "little", signed=True),
        int.from_bytes(d[8:], "little", signed=True),
    )


def _line_rows(batch: pa.Table, file_id: int) -> pa.Table:
    """Explode corpus pages into ``(h1, h2, occ)`` line-hash rows, skipping
    empty lines (they carry no content, are always kept, and would
    otherwise all collapse onto one global winner).

    ``occ`` is the occurrence's order-encoded provenance
    ``url \x00 idx(10 digits) \x00 file_id`` — lexicographic order on
    ``occ`` IS the (url, idx) order, so the corpus-global winner per
    distinct line is a plain vectorized ``min`` aggregate, no per-group
    Python."""
    batch = _corpus_page_filter(batch)
    empty = pa.table(
        {
            "h1": pa.array([], pa.int64()),
            "h2": pa.array([], pa.int64()),
            "occ": pa.array([], pa.string()),
        }
    )
    if len(batch) == 0:
        return empty
    lines_list = pc.split_pattern(batch.column("text"), pattern="\n")
    flat = pc.list_flatten(lines_list)
    parent = pc.list_parent_indices(lines_list)
    # per-page line index: position within the parent list
    offsets = np.asarray(lines_list.combine_chunks().offsets, dtype=np.int64)
    idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        offsets[:-1], np.diff(offsets)
    )
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    keep_np = np.asarray(nonempty)
    urls = pc.take(batch.column("url"), parent).filter(pa.array(keep_np)).to_pylist()
    idx = idx[keep_np]
    h1 = np.empty(len(flat), dtype=np.int64)
    h2 = np.empty(len(flat), dtype=np.int64)
    occ = [None] * len(flat)
    for i, line in enumerate(flat.to_pylist()):
        h1[i], h2[i] = _hash128(line)
        occ[i] = f"{urls[i]}\x00{idx[i]:010d}\x00{file_id}"
    return pa.table(
        {
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "occ": pa.array(occ, pa.string()),
        }
    )


def _decode_winners(batch: pa.Table) -> pa.Table:
    """``min(occ)`` winner strings -> ``(file_id, url, idx)`` keep rows."""
    fids, urls, idxs = [], [], []
    for occ in batch.column("min(occ)").to_pylist():
        u, i, f = occ.rsplit("\x00", 2)
        fids.append(int(f))
        urls.append(u)
        idxs.append(int(i))
    return pa.table(
        {
            "file_id": pa.array(fids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "idx": pa.array(idxs, pa.int64()),
        }
    )


def global_line_dedup(corpus_dir: str):
    """``(url, n_lines, n_removed, clean_text)`` per corpus page after
    corpus-global first-occurrence line dedup (see module docstring).
    ``clean_text`` is null when every line was dropped (string_agg-over-
    nothing parity with the SQL oracle); empty lines are always kept.

    Page TEXT never enters a shuffle, and no per-group Python runs on the
    wide path: the corpus-global winner per distinct line is a native
    ``groupby(h1, h2).min(occ)`` aggregate over order-encoded occurrence
    strings, and winners route back to their page's source shard by
    ``file_id`` where the rebuild task re-reads its own parquet shard
    worker-locally (pruned columns).  Two earlier designs measured at the
    sf0.1 fixture and rejected: co-grouping drops with a page-text stream
    livelocks Ray 2.49's executor (UnionOperator stops forwarding when a
    downstream Sort holds the memory budget — wedged 15+ min at 100%
    driver CPU), and a per-line-group ``map_groups`` UDF costs millions of
    tiny Python calls (~2 M groups, minutes of pure overhead).  Keying the
    shuffle by int64 line hashes instead of line text (the CCNet recipe)
    also cut the explode sort from ~6.5 min to seconds.

    Output is naturally partitioned by input shard — the resumable layout
    ``ops/io.write_partitioned`` expects.
    """
    import glob as _glob
    import os

    import ray
    import ray.data

    files = sorted(
        _glob.glob(os.path.join(corpus_dir, "*", "*.parquet"))
        or _glob.glob(os.path.join(corpus_dir, "*.parquet"))
    )
    if not files:
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_removed": pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                }
            )
        )
    files_ref = ray.put(files)  # O(shards) path list, shipped once

    def explode_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        paths = ray.get(files_ref)
        out = []
        for i in batch.column("item").to_pylist():
            rows = _line_rows(pq.read_table(paths[i], columns=["url", "text"]), i)
            # in-shard combiner: C++ group_by min collapses within-shard
            # repeats before anything shuffles
            rows = (
                rows.group_by(["h1", "h2"])
                .aggregate([("occ", "min")])
                .rename_columns(["h1", "h2", "occ"])
            )
            out.append(
                rows.append_column(
                    "part",
                    pc.bit_wise_and(rows.column("h1"), pa.scalar(255, pa.int64())),
                )
            )
        return pa.concat_tables(out)

    def part_winners(group: pa.Table) -> pa.Table:
        # one call per hash partition (256 total): the cross-shard min is a
        # C++ group_by over the partition, never per-line Python.  Ray's
        # native groupby(h1, h2).min on the same input measured 349 s at
        # sf0.1 (37.6M rows); this coarse manual hash-aggregate does the
        # identical fold in seconds.
        won = (
            group.group_by(["h1", "h2"])
            .aggregate([("occ", "min")])
            .rename_columns(["h1", "h2", "min(occ)"])
        )
        return _decode_winners(won)

    shards = ray.data.from_items(list(range(len(files))))
    winners = (
        shards.map_batches(explode_shard, batch_format="pyarrow", batch_size=1)
        .groupby("part")
        .map_groups(part_winners, batch_format="pyarrow")
    )

    # one sentinel row per shard so shards with zero winners still rebuild
    sentinels = pa.table(
        {
            "file_id": pa.array(list(range(len(files))), pa.int64()),
            "url": pa.array([""] * len(files), pa.string()),
            "idx": pa.array([-1] * len(files), pa.int64()),
        }
    )
    tagged = winners.union(ray.data.from_arrow(sentinels))

    def rebuild_shard(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        paths = ray.get(files_ref)
        fid = int(group.column("file_id")[0].as_py())
        won: dict[str, set] = {}
        for u, i in zip(group.column("url").to_pylist(), group.column("idx").to_pylist()):
            if i is not None and i >= 0:
                won.setdefault(u, set()).add(i)
        t = _corpus_page_filter(pq.read_table(paths[fid], columns=["url", "text"]))
        out_url, out_n, out_rm, out_clean = [], [], [], []
        for u, text in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
            lines = text.split("\n")
            mine = won.get(u, ())
            kept = [ln for i, ln in enumerate(lines) if ln == "" or i in mine]
            out_url.append(u)
            out_n.append(len(lines))
            out_rm.append(len(lines) - len(kept))
            out_clean.append("\n".join(kept) if kept else None)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "n_lines": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "clean_text": pa.array(out_clean, pa.string()),
            }
        )

    return tagged.groupby("file_id").map_groups(
        rebuild_shard, batch_format="pyarrow"
    )


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
