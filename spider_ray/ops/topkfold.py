"""Shared fold for per-block partial top-k outputs.

Three ops (:func:`~spider_ray.ops.similarity.brute_force_top_k`,
:func:`~spider_ray.ops.similarity.pq_top_k`,
:func:`~spider_ray.ops.sampling.weighted_sample_k`) previously each
hand-rolled a driver-side heap over their O(blocks·k) partial rows.  This
helper is the one implementation all of them (and any future top-k op)
share, with two bit-identical paths:

- ``mode="driver"``: concatenate the partial batches on the driver
  (O(blocks·k·groups) slim rows) and segmented-rank in one Arrow sort —
  right while that volume is bounded (every 32-CPU bench shape).
- ``mode="cogroup"``: tag ``part = hash(group) & mask``
  (:func:`~spider_ray.poolsize.coarse_fanout` partitions), run the SAME
  segmented-rank fold per partition in workers, and bring back only the
  O(groups·k) winners — the scale path when the partial volume itself
  would swamp one process (e.g. 15k blocks x 1k queries x k rows).

Both paths sort by the same total-order key list (every caller ends the
key list with an id tiebreak), so they are bit-identical; guarded by the
mode-parity tests in ``tests/test_topkfold.py``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Above this many estimated partial rows the auto mode folds through the
# coarse co-group instead of the driver heap.
DRIVER_ROW_BOUND = 4_000_000


def rank_topk(t: pa.Table, k: int, sort_keys: Sequence[tuple[str, str]],
              group_col: str | None = None) -> pa.Table:
    """Sort ``t`` by ``(group_col asc, *sort_keys)``, append a 1-based
    ``rank`` int64 column per group (global when ``group_col`` is None)
    via the repo's vectorized segmented-rank, and keep ``rank <= k``."""
    keys = ([(group_col, "ascending")] if group_col else []) + list(sort_keys)
    t = t.take(pc.sort_indices(t, sort_keys=keys))
    n = t.num_rows
    if group_col is not None and n:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        pos = np.arange(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = g[1:] != g[:-1]
        seg = np.maximum.accumulate(np.where(new, pos, 0))
        rank = pos - seg + 1
    else:
        rank = np.arange(1, n + 1, dtype=np.int64)
    t = t.append_column("rank", pa.array(rank, pa.int64()))
    return t.filter(pa.array(rank <= k))


def fold_partial_topk(
    partial_ds,
    k: int,
    sort_keys: Sequence[tuple[str, str]],
    group_col: str | None = None,
    prep: Callable[[pa.Table], pa.Table] | None = None,
    mode: str = "driver",
    est_rows: int | None = None,
) -> pa.Table:
    """Fold a dataset of per-block partial top-k rows to the exact global
    top-k per group.

    ``partial_ds`` carries the payload columns (including every sort-key
    column and ``group_col``); ``prep`` (optional) is applied per batch in
    BOTH paths before sorting — use it to append a derived order column
    (e.g. a python-``round``-ed similarity) so the order spec is identical
    everywhere.  Returns a driver-side ``pa.Table`` (O(groups·k) rows)
    sorted by ``(group asc, rank asc)`` with all input columns plus
    ``rank``; callers ``select`` their output schema.

    ``mode="cogroup"`` requires an int64 ``group_col`` (the coarse scatter
    key); global top-k (``group_col=None``) is inherently a driver fold of
    O(blocks·k) rows and stays on the driver path.  ``mode="auto"`` picks
    by the caller's ``est_rows`` estimate of the partial volume (cogroup
    above :data:`DRIVER_ROW_BOUND`, driver below or when unknown).
    """
    if mode == "auto":
        mode = (
            "cogroup"
            if est_rows is not None and est_rows > DRIVER_ROW_BOUND
            and group_col is not None
            else "driver"
        )
    if mode not in ("driver", "cogroup"):
        raise ValueError(f"unknown fold mode {mode!r}")
    if mode == "cogroup":
        if group_col is None:
            raise ValueError(
                "fold_partial_topk(mode='cogroup') requires group_col — a "
                "global top-k has no scatter key; the driver fold is the "
                "only exact path"
            )
        return _cogroup_fold(partial_ds, k, sort_keys, group_col, prep)
    tables = []
    for b in partial_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        tables.append(prep(b) if prep else b)
    if not tables:
        schema = partial_ds.schema()
        base = getattr(schema, "base_schema", schema)
        empty = pa.table({f.name: pa.array([], f.type) for f in base})
        tables = [prep(empty) if prep else empty]
    return rank_topk(pa.concat_tables(tables), k, sort_keys, group_col)


def _cogroup_fold(partial_ds, k, sort_keys, group_col, prep) -> pa.Table:
    import ray

    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    nparts = coarse_fanout()

    def tag(batch: pa.Table) -> pa.Table:
        if prep:
            batch = prep(batch)
        return batch.append_column(
            "part", coarse_part(batch.column(group_col), nparts)
        )

    def fold(group: pa.Table) -> pa.Table:
        return rank_topk(
            group.drop_columns(["part"]), k, sort_keys, group_col
        )

    winners = (
        partial_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )
    # O(groups·k) winner rows — the only thing that touches the driver.
    tables = [t for t in ray.get(winners.to_arrow_refs()) if t.num_rows]
    if not tables:
        schema = partial_ds.schema()
        base = getattr(schema, "base_schema", schema)
        empty = pa.table({f.name: pa.array([], f.type) for f in base})
        return rank_topk(prep(empty) if prep else empty, k, sort_keys,
                         group_col)
    t = pa.concat_tables(tables)
    keys = [(group_col, "ascending"), ("rank", "ascending")]
    return t.take(pc.sort_indices(t, sort_keys=keys))
