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


def _hash128(lines: pa.Array) -> tuple[pa.Array, pa.Array]:
    """128-bit line fingerprint as two int64 columns — the shuffle key.
    Grouping by a hash instead of the line text is the CCNet recipe
    (their line dedup shuffles SHA1 prefixes, not lines): it turns the
    all-to-all into fixed 32-byte rows with integer sort keys (measured at
    the sf0.1 fixture: 37.6M-row string-keyed sort ~6.5 min, hash-keyed
    seconds).  Two independently-seeded vectorized 64-bit hashes (polars'
    Rust hash kernel) give ~128 bits: a double collision across even 10¹²
    distinct lines is negligible.  Vectorized replacement for the original
    per-line ``hashlib.blake2b`` Python loop (the hash never leaves the
    pipeline, so the function choice is internal — only collision rate and
    within-run determinism matter)."""
    import polars as pl

    s = pl.from_arrow(
        lines.combine_chunks() if isinstance(lines, pa.ChunkedArray) else lines
    )
    h1 = s.hash(seed=0x5EED_0001).reinterpret(signed=True).to_arrow()
    h2 = s.hash(seed=0x5EED_0002).reinterpret(signed=True).to_arrow()
    return h1.cast(pa.int64()), h2.cast(pa.int64())


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
    urls = pc.take(batch.column("url"), parent).filter(pa.array(keep_np))
    idx = idx[keep_np]
    h1, h2 = _hash128(flat)
    # occ = "url \x00 idx(10 digits) \x00 file_id", built with Arrow string
    # kernels — no per-line Python (was a 37.6M-iteration f-string loop)
    idx_str = pc.utf8_lpad(
        pc.cast(pa.array(idx, pa.int64()), pa.string()), width=10, padding="0"
    )
    # NUL is the occ field separator, so strip it from urls before the
    # join (a hostile/corrupt URL with an embedded NUL would otherwise
    # shift the fields and crash the vectorized decode's int64 cast);
    # rebuild_shard strips its value_set side identically so the
    # winner-key lookup still matches
    occ = pc.binary_join_element_wise(
        _strip_nul(pc.cast(urls, pa.string())), idx_str, str(file_id), "\x00"
    )
    return pa.table({"h1": h1, "h2": h2, "occ": occ})


def _strip_nul(arr):
    return pc.replace_substring(arr, pattern="\x00", replacement="")


def _decode_winners(batch: pa.Table) -> pa.Table:
    """``min(occ)`` winner strings -> ``(file_id, url, idx)`` keep rows.

    Vectorized: Arrow ``split_pattern`` + ``list_element`` kernels — the
    per-row ``rsplit`` Python loop this replaces was ~25M iterations per
    sf0.1 run and a measured chunk of the winners-fold CPU.  The url
    field is NUL-stripped at occ-build time (``_line_rows``), so the
    plain left split is provably exact even for hostile input."""
    occ = batch.column("min(occ)")
    if isinstance(occ, pa.ChunkedArray):
        occ = occ.combine_chunks()
    parts = pc.split_pattern(occ, pattern="\x00")
    return pa.table(
        {
            "file_id": pc.cast(pc.list_element(parts, 2), pa.int64()),
            "url": pc.list_element(parts, 0),
            "idx": pc.cast(pc.list_element(parts, 1), pa.int64()),
        }
    )


def global_line_dedup(corpus_dir: str, out_dir: str | None = None):
    """``(url, n_lines, n_removed, clean_text)`` per corpus page after
    corpus-global first-occurrence line dedup (see module docstring).
    ``clean_text`` is null when every line was dropped (string_agg-over-
    nothing parity with the SQL oracle); empty lines are always kept.

    ``out_dir`` fuses the resumable partitioned write INTO the rebuild
    (VERDICT r4 #7): each rebuild task atomically lands its shard as
    ``out_dir/file_id=<N>/part.parquet`` (tmp + rename, orphan sweep —
    the ``ops/io.write_partitioned`` contract) before returning the same
    rows, so curation chains skip a second full materialization of the
    corpus text; on re-run a landed shard is READ BACK instead of
    recomputed (kill/resume).  ``out_dir`` must be shared storage on a
    multi-node cluster.

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

    from ..poolsize import coarse_fanout

    part_mask = coarse_fanout(floor=256, per_cpu=8) - 1  # driver-resolved

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
                    pc.bit_wise_and(rows.column("h1"),
                                    pa.scalar(part_mask, pa.int64())),
                )
            )
        return pa.concat_tables(out)

    def part_winners(group: pa.Table) -> pa.Table:
        # one call per hash partition (coarse_fanout total): the
        # cross-shard min is a
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

    from ..metrics import wrap

    shards = ray.data.from_items(list(range(len(files))))
    winners = (
        shards.map_batches(wrap(explode_shard, "line_dedup", "explode"),
                           batch_format="pyarrow", batch_size=1)
        .groupby("part")
        .map_groups(wrap(part_winners, "line_dedup", "winners"),
                    batch_format="pyarrow")
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
        import glob as _g
        import os as _os

        import polars as pl
        import pyarrow.parquet as pq

        paths = ray.get(files_ref)
        fid = int(group.column("file_id")[0].as_py())
        final = None
        if out_dir is not None:
            pdir = _os.path.join(out_dir, f"file_id={fid}")
            final = _os.path.join(pdir, "part.parquet")
            for stale in _g.glob(final + ".tmp.*"):  # killed-writer sweep
                try:
                    _os.remove(stale)
                except OSError:
                    pass
            if _os.path.exists(final):  # landed by a previous run: resume
                return pq.read_table(final)
        t = _corpus_page_filter(pq.read_table(paths[fid], columns=["url", "text"]))
        n = len(t)
        # re-explode the shard's pages into lines (same kernels as the
        # explode pass) and keep a line iff it is empty or its
        # "url \x00 idx" key is among this shard's winners — all Arrow
        # kernels, no per-line or per-page Python loop.
        lines_list = pc.split_pattern(t.column("text"), pattern="\n")
        flat = pc.list_flatten(lines_list)
        parent = np.asarray(pc.list_parent_indices(lines_list), dtype=np.int64)
        offsets = np.asarray(lines_list.combine_chunks().offsets, dtype=np.int64)
        n_lines = np.diff(offsets)
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], n_lines)

        wmask = pc.and_(
            pc.is_valid(group.column("idx")),
            pc.greater_equal(group.column("idx"), 0),
        )
        # integer keys (shard row index × 2³² + line idx) instead of the old
        # "url\x00lpad(idx)" strings: one index_in over the winner urls
        # replaces tens of MBs of per-line string building (urls are unique
        # within a shard, so index_in is an exact row lookup)
        wurl = pc.cast(group.column("url").filter(wmask), pa.string())
        widx = np.asarray(group.column("idx").filter(wmask), dtype=np.int64)
        # winner urls were NUL-stripped when the occ strings were built;
        # strip the value_set side the same way so the lookup is exact
        # (two urls colliding after the strip is pathological input —
        # index_in then picks the first, deterministically)
        wrow_arr = pc.index_in(
            wurl, value_set=_strip_nul(pc.cast(t.column("url"), pa.string()))
        )
        wrow_valid = np.asarray(pc.is_valid(wrow_arr))
        wrow = np.asarray(wrow_arr.fill_null(0), dtype=np.int64)
        wkey = (wrow[wrow_valid] << np.int64(32)) + widx[wrow_valid]

        key = (parent << np.int64(32)) + idx
        keep = np.asarray(pc.equal(flat, "")) | np.isin(key, wkey)
        kept_parent = parent[keep]
        kept_count = np.bincount(kept_parent, minlength=n)
        # rejoin kept lines per page entirely in Arrow: rebuild a list
        # array from the kept-count offsets (kept lines are already in
        # page order) and binary_join with "\n" — replaces the polars
        # maintain_order group_by + str.join that was the measured
        # rebuild hotspot; all-dropped pages stay NULL
        # (string_agg-over-nothing parity)
        kept_flat = flat.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        joffs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_count, out=joffs[1:])
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(joffs, pa.int64()),
                pc.cast(kept_flat, pa.large_string()),
            ),
            pa.scalar("\n", pa.large_string()),
        )
        clean = pc.if_else(
            pa.array(kept_count > 0),
            pc.cast(joined, pa.string()),
            pa.nulls(n, pa.string()),
        )
        out = pa.table(
            {
                "url": t.column("url"),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_removed": pa.array(n_lines - kept_count, pa.int64()),
                "clean_text": clean,
            }
        )
        if final is not None:  # fused atomic per-shard landing
            _os.makedirs(_os.path.dirname(final), exist_ok=True)
            tmp = final + f".tmp.{_os.getpid()}"
            pq.write_table(out, tmp)
            _os.replace(tmp, final)
        return out

    if out_dir is not None:
        import os as _os2

        _os2.makedirs(out_dir, exist_ok=True)
    return tagged.groupby("file_id").map_groups(
        wrap(rebuild_shard, "line_dedup", "rebuild"), batch_format="pyarrow"
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
