"""Distinct-count sketch: KMV (k-minimum-values) cardinality estimation.

The classic streaming sketch (Bar-Yossef et al. 2002): hash every key to a
uniform 32-bit value, keep the ``k`` smallest DISTINCT hashes per group,
estimate ``|distinct| ~= (k-1) * 2^32 / h_k`` from the k-th smallest.  The
sketch is tiny (k words) and mergeable, so the Ray shape is the combiner
pattern: each batch collapses to its local k-minimum set per group, the one
``groupby().map_groups`` shuffle moves only ``<= k`` hashes per (batch,
group), and the merge keeps the global k smallest.

Determinism is part of the op spec so an exact SQL oracle can replay it:
the hash is Knuth multiplicative ``((key * 2654435761) mod 2^32) + 1``
(same constant as ops/sampling.py; the +1 keeps the divisor nonzero) and
the estimate is floor integer division.  Groups with fewer than ``k``
distinct hashes report their exact count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ONE hash contract shared with the sampling ops (and replayed verbatim by
# the SQL oracles) — do not fork the constant
from .sampling import MOD as M32
from .sampling import _bucket


def _kmv_hash(keys: np.ndarray) -> np.ndarray:
    """Deterministic uniform-ish 32-bit hash, value range [1, 2^32]."""
    return _bucket(keys.astype(np.int64)) + 1


class _KmvPartials:
    """Per-batch combiner: the k smallest distinct hashes per group."""

    def __init__(self, group_col: str, key_col: str, k: int):
        self.group_col = group_col
        self.key_col = key_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        groups = batch.column(self.group_col).to_pylist()
        keys = batch.column(self.key_col).combine_chunks().to_numpy(zero_copy_only=False)
        hashes = _kmv_hash(np.asarray(keys, dtype=np.int64))
        per_group: dict[str, set] = {}
        for g, h in zip(groups, hashes):
            per_group.setdefault(g, set()).add(int(h))
        out_g: list[str] = []
        out_h: list[int] = []
        for g, hs in per_group.items():
            smallest = sorted(hs)[: self.k]
            out_g.extend([g] * len(smallest))
            out_h.extend(smallest)
        return pa.table(
            {
                # group values keep their input type (string event types,
                # int64 day buckets, ...)
                "grp": pa.array(out_g, batch.column(self.group_col).type),
                "hv": pa.array(out_h, pa.int64()),
            }
        )


def kmv_distinct(ds, group_col: str, key_col: str, k: int = 64):
    """Per-group distinct-count estimate: ``(group, n_distinct_est)``.

    Exact when the group has < ``k`` distinct hashes, else the KMV
    estimator ``(k-1) * 2^32 // h_k`` on the k-th smallest hash.
    """
    partials = ds.select_columns([group_col, key_col]).map_batches(
        _KmvPartials(group_col, key_col, k), batch_format="pyarrow"
    )

    def _merge(tbl: pa.Table) -> pa.Table:
        hs = np.unique(tbl.column("hv").to_numpy(zero_copy_only=False))
        if len(hs) < k:
            est = len(hs)
        else:
            est = (k - 1) * M32 // int(hs[k - 1])
        return pa.table(
            {
                group_col: pa.array(
                    [tbl.column("grp")[0].as_py()], tbl.column("grp").type
                ),
                "n_distinct_est": pa.array([int(est)], pa.int64()),
            }
        )

    return partials.groupby("grp").map_groups(_merge, batch_format="pyarrow")


def kmv_users_per_day(events, k: int = 64):
    """``(day, n_distinct_est)`` — the windowed composition of the KMV
    sketch: approximate distinct users per UTC day with the identical
    estimator/hash contract as :func:`kmv_distinct` (SQL-replayable), the
    group key being the repo-wide day bucket.  Shuffle stays ≤ k hashes
    per (batch, day) — the shape that lets a 10¹⁰-event day report
    distincts without a count-distinct exchange."""
    import pyarrow.compute as pc

    def add_day(batch: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(
                pc.cast(batch.column("ts"), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.scalar(86_400, pa.int64()),
        )
        return pa.table({"day": day, "user_id": batch.column("user_id")})

    slim = events.select_columns(["ts", "user_id"]).map_batches(
        add_day, batch_format="pyarrow"
    )
    return kmv_distinct(slim, group_col="day", key_col="user_id", k=k)
