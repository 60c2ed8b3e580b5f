"""Duplicate n-gram span detection — exact-substring dedup, n-gram form.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2021) removes any substring of >= N tokens that occurs more than once in
the corpus; the published implementation builds a corpus-wide suffix
array.  This module implements the standard distributed approximation:
slide a k-token window over every document, find the window hashes that
occur >= ``min_count`` times corpus-wide, and merge each document's hit
positions into maximal duplicated spans.

Pinned spec (the sequential golden in ``spider_ray/goldens.py`` recomputes
it verbatim):

* tokens: lowercase ``\\S+`` runs, in document order;
* gram identity: ``stable_hash_str(" ".join(tokens[i:i+k]))``;
* duplicated gram: total occurrence count across the corpus (including
  repeats inside one document) >= ``min_count`` (default 2);
* spans: each duplicated gram occurrence covers tokens ``[i, i+k)``;
  overlapping or exactly adjacent intervals merge into one span.

Ray Data shape (two bounded shuffles, no driver-side state):

1. ``map_batches`` emits ``(gram uint64, doc_id, pos)`` — O(total tokens)
   rows but only 20 bytes each; the text never leaves its block.
2. ``groupby(gram).map_groups`` keeps groups with >= min_count members —
   the corpus-wide duplication test, linear per group even for degenerate
   boilerplate grams that collect millions of occurrences.
3. ``groupby(doc_id).map_groups`` sorts each doc's hit positions and
   merges them into spans (a doc's hit list fits one worker: it is bounded
   by the doc's own token count).

At 100 TB the volume through shuffle 1 equals the tokenized corpus — the
same bound as the suffix-array build it replaces; push ``k`` up (Lee et
al. use 50) to cut the hit volume of shuffle 2.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..hashing import stable_hash_str

_TOKEN_RE = re.compile(r"\S+")


def _doc_gram_hashes(text: str, k: int) -> np.ndarray:
    toks = _TOKEN_RE.findall((text or "").lower())
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        out[i] = stable_hash_str(" ".join(toks[i : i + k]))
    return out


def merge_positions(pos: np.ndarray, k: int) -> list[tuple[int, int]]:
    """Merge sorted gram start positions into maximal [start, end) token
    spans (each hit covers k tokens; overlapping/adjacent spans fuse)."""
    spans: list[tuple[int, int]] = []
    for p in pos:
        s, e = int(p), int(p) + k
        if spans and s <= spans[-1][1]:
            if e > spans[-1][1]:
                spans[-1] = (spans[-1][0], e)
        else:
            spans.append((s, e))
    return spans


def dup_ngram_spans(
    ds,
    k: int = 8,
    min_count: int = 2,
    column: str = "text",
    id_column: str = "doc_id",
):
    """(doc_id, span_start, span_end) token spans duplicated corpus-wide."""

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        grams: list[np.ndarray] = []
        out_ids: list[np.ndarray] = []
        poss: list[np.ndarray] = []
        for doc_id, text in zip(ids, texts):
            g = _doc_gram_hashes(text, k)
            if len(g):
                grams.append(g)
                out_ids.append(np.full(len(g), doc_id, dtype=np.int64))
                poss.append(np.arange(len(g), dtype=np.int64))
        if not grams:
            return pa.table(
                {
                    "gram": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "gram": pa.array(np.concatenate(grams), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "pos": pa.array(np.concatenate(poss), pa.int64()),
            }
        )

    def dup_only(group: pa.Table) -> pa.Table:
        t = group.select(["doc_id", "pos"])
        return t if group.num_rows >= min_count else t.slice(0, 0)

    def spans_of_doc(group: pa.Table) -> pa.Table:
        doc_id = group.column("doc_id")[0].as_py()
        pos = np.unique(np.asarray(group.column("pos"), dtype=np.int64))
        spans = merge_positions(pos, k)
        return pa.table(
            {
                "doc_id": pa.array([doc_id] * len(spans), pa.int64()),
                "span_start": pa.array([s for s, _ in spans], pa.int64()),
                "span_end": pa.array([e for _, e in spans], pa.int64()),
            }
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    hits = grams.groupby("gram").map_groups(dup_only, batch_format="pyarrow")
    return hits.groupby("doc_id").map_groups(spans_of_doc, batch_format="pyarrow")


def remove_dup_spans(
    ds,
    k: int = 8,
    min_count: int = 2,
    column: str = "text",
    id_column: str = "doc_id",
):
    """Cleaned text with every corpus-duplicated span's tokens dropped.

    Pinned spec: tokens are lowercase ``\\S+`` runs; the surviving tokens
    re-join with single spaces (whitespace normalizes — the tokenizer is
    whitespace-splitting, so original spacing is not recoverable); spans
    are the ``dup_ngram_spans`` output, removed symmetrically from every
    doc.  To keep one canonical copy of fully-duplicated documents,
    compose with ``dedup.exact_dedup`` winners first — symmetric span
    removal plus exact-dup winner selection is deterministic where a
    global "first occurrence" pick would need a second coordination pass.

    Shape: the span rows and the doc rows co-locate through ONE tagged
    ``groupby(doc_id)`` (union + map_groups — no hash join, no driver
    state); a doc's spans are bounded by its own token count.

    Output: (doc_id, clean_text, n_tokens, n_removed).
    """
    spans = dup_ngram_spans(
        ds, k=k, min_count=min_count, column=column, id_column=id_column
    )

    def doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column(id_column),
                "text": batch.column(column),
                "span_start": pa.nulls(batch.num_rows, pa.int64()),
                "span_end": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def span_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.nulls(batch.num_rows, pa.string()),
                "span_start": batch.column("span_start"),
                "span_end": batch.column("span_end"),
            }
        )

    tagged = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        spans.map_batches(span_rows, batch_format="pyarrow")
    )

    def rebuild(group: pa.Table) -> pa.Table:
        doc_id = group.column("doc_id")[0].as_py()
        texts = [t for t in group.column("text").to_pylist() if t is not None]
        toks = _TOKEN_RE.findall((texts[0] if texts else "").lower())
        drop = np.zeros(len(toks), dtype=bool)
        for s, e in zip(
            group.column("span_start").to_pylist(),
            group.column("span_end").to_pylist(),
        ):
            if s is not None:
                drop[s:e] = True
        kept = [t for t, d in zip(toks, drop) if not d]
        return pa.table(
            {
                "doc_id": pa.array([doc_id], pa.int64()),
                "clean_text": pa.array([" ".join(kept)], pa.string()),
                "n_tokens": pa.array([len(toks)], pa.int64()),
                "n_removed": pa.array([int(drop.sum())], pa.int64()),
            }
        )

    return tagged.groupby("doc_id").map_groups(rebuild, batch_format="pyarrow")
