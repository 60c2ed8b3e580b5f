"""Sequence packing: assign documents to fixed token-budget bins for
LLM pretraining batches.

Greedy sequential packing is inherently order-dependent, so the op pins a
deterministic, partition-parallel spec: docs are routed to
``n_parts`` independent streams by ``doc_id % n_parts`` (SQL-expressible on
purpose), each stream packs in ``doc_id`` order — append to the open bin
while the running token total stays within ``budget``, else open a new
bin.  Oversized docs (> budget) get a bin of their own.  Bins are local to
a partition, so the op needs exactly one ``groupby(part)`` shuffle and
scales with partition count; the global bin id is ``(part, bin_id)``.

The oracle is a sequential recompute (``goldens.seq_sequence_packing``) —
an ordered running fold is not expressible in plain SQL.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")


def _pack_order(ids: np.ndarray, toks: np.ndarray, budget: int):
    """Greedy pack in given (already sorted) order; returns bin ids."""
    bins = np.empty(len(ids), dtype=np.int64)
    cur_bin, cur_tot = 0, 0
    for i, t in enumerate(toks):
        t = int(t)
        if cur_tot > 0 and cur_tot + t > budget:
            cur_bin += 1
            cur_tot = 0
        bins[i] = cur_bin
        cur_tot += t
    return bins


def pack_sequences(docs, budget: int = 2048, n_parts: int = 8,
                   text_col: str = "text"):
    """``(doc_id, part, bin_id, n_tokens)`` per doc under the pinned spec."""

    def tokenize(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ntok = np.fromiter(
            (len(TOKEN_RE.findall(t)) for t in batch.column(text_col).to_pylist()),
            dtype=np.int64, count=len(batch),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "part": pa.array(ids % n_parts, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
            }
        )

    def pack_group(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        ntok = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        bins = _pack_order(ids[order], ntok[order], budget)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "part": group.column("part"),
                "bin_id": pa.array(bins[inv], pa.int64()),
                "n_tokens": group.column("n_tokens"),
            }
        )

    light = docs.map_batches(tokenize, batch_format="pyarrow")
    return light.groupby("part").map_groups(pack_group, batch_format="pyarrow")
