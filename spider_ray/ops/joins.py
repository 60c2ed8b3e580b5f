"""Semi/anti join of a wide Dataset against an id list — the "filter a
corpus by a computed survivor/drop set" primitive every curation pipeline
needs (exact-dedup winners, near-dup drop sets, decontamination hit lists).

Two shapes, auto-selected by a distributed count of the id side:

* **broadcast** (id set small): fold the ids into a frozenset, ``ray.put``
  once, filter in an actor pool — zero shuffle of the wide side.  This is
  the shape the reference's visited-set check takes per wave
  (``website.rs`` seen-set membership), lifted to a corpus filter.
* **cogroup** (id set is a corpus-scale fraction): the wide rows and the
  id rows shuffle ONCE by id through a tagged union + ``groupby(id)``;
  each group keeps/drops its wide rows by whether an id row is present.
  No hash join (the join operator fails on empty partitions when
  partition count exceeds distinct keys), no driver-side set — the driver
  never holds an id.

The wide side's bytes move at most once; the id side is a slim int
column either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BROADCAST_MAX_IDS = 20_000_000


class _IdSetFilter:
    """Actor-pool broadcast filter: keep (semi) or drop (anti) rows whose
    id is in the shared frozenset."""

    def __init__(self, ids_ref, id_column: str, anti: bool):
        import ray

        # actor ctor args arrive de-referenced; plain refs when called inline
        self.ids: frozenset = (
            ids_ref if isinstance(ids_ref, frozenset) else ray.get(ids_ref)
        )
        self.id_column = id_column
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        member = self.ids
        if self.anti:
            mask = [i not in member for i in ids]
        else:
            mask = [i in member for i in ids]
        return batch.filter(pa.array(mask, pa.bool_()))


def semi_join_ids(
    ds,
    ids_ds,
    id_column: str = "doc_id",
    anti: bool = False,
    mode: str = "auto",
    broadcast_max_ids: int = DEFAULT_BROADCAST_MAX_IDS,
    bloom_max_ids: int = 500_000_000,
    concurrency=None,
):
    """Rows of ``ds`` whose ``id_column`` appears (semi) / does not appear
    (anti) in ``ids_ds``'s ``id_column``.  ``ids_ds`` may be a Dataset or a
    ``pyarrow.Table``; duplicate ids on the id side are fine.

    ``mode``: ``"broadcast"`` | ``"bloom"`` | ``"cogroup"`` | ``"auto"``
    (count the id side — a distributed scalar — and pick the cheapest
    tier: frozenset broadcast up to ``broadcast_max_ids``, bloom bit array
    + exact verify up to ``bloom_max_ids`` (2 bytes/id broadcast, only
    maybe-members shuffle — :func:`semi_join_ids_bloom`), full cogroup
    beyond).  The cogroup path shuffles ``ds`` once by id and assumes one
    id's rows fit one task (ids are unique per row in every caller here).
    """
    import ray
    import ray.data as rd

    if isinstance(ids_ds, pa.Table):
        ids_ds = rd.from_arrow(ids_ds.select([id_column]))

    if mode in ("auto", "bloom"):
        n_ids = ids_ds.count()
        if mode == "bloom" or broadcast_max_ids < n_ids <= bloom_max_ids:
            return semi_join_ids_bloom(
                ds, ids_ds, id_column=id_column, anti=anti, concurrency=concurrency
            )

    if mode == "broadcast" or (
        mode == "auto" and ids_ds.count() <= broadcast_max_ids
    ):
        members = set()
        for batch in ids_ds.iter_batches(batch_format="pyarrow"):
            members.update(batch.column(id_column).to_pylist())
        from ..poolsize import autoscale_pool

        ids_ref = ray.put(frozenset(members))
        return ds.map_batches(
            _IdSetFilter,
            fn_constructor_args=(ids_ref, id_column, anti),
            batch_format="pyarrow",
            concurrency=concurrency or autoscale_pool(1),
            num_cpus=0.25,
        )

    # cogroup: tagged union by id, groupby(id), keep/drop in-group
    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def tag_wide(b: pa.Table) -> pa.Table:
        return b.select(names).append_column(
            "__is_id", pa.nulls(b.num_rows, pa.int8()).fill_null(0)
        )

    def tag_ids(b: pa.Table) -> pa.Table:
        cols = {}
        for n in names:
            if n == id_column:
                cols[n] = pc.cast(b.column(id_column), types[n])
            else:
                cols[n] = pa.nulls(b.num_rows, types[n])
        cols["__is_id"] = pa.nulls(b.num_rows, pa.int8()).fill_null(1)
        return pa.table(cols)

    def pick(group: pa.Table) -> pa.Table:
        is_id = group.column("__is_id")
        present = (pc.sum(pc.cast(is_id, pa.int64())).as_py() or 0) > 0
        wide = group.filter(pc.equal(is_id, 0))
        if present != anti:
            return wide.drop_columns(["__is_id"])
        return wide.slice(0, 0).drop_columns(["__is_id"])

    return (
        ds.map_batches(tag_wide, batch_format="pyarrow")
        .union(ids_ds.map_batches(tag_ids, batch_format="pyarrow"))
        .groupby(id_column)
        .map_groups(pick, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# bloom tier: broadcast a bit array where a frozenset would not fit
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_ID = 16  # m = 16n, k = 4 -> ~0.24% false-positive rate
_BLOOM_K = 4


def _bloom_hash(ids: "np.ndarray", i: int, m: int) -> "np.ndarray":
    """i-th splitmix64-style hash of int64 ids into [0, m) — pure numpy,
    wrapping uint64 arithmetic, deterministic across processes."""
    x = ids.astype(np.uint64) + np.uint64((i + 1) * 0x9E3779B97F4A7C15 % (1 << 64))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(m)).astype(np.int64)


def build_id_bloom(ids_ds, id_column: str, n_ids: int):
    """Fold the id Dataset into a bloom bit array (numpy uint8).

    The fold streams batches through the driver — O(n) driver TIME but
    only ``2n bytes`` of driver MEMORY (m = 16n bits), which is what makes
    the tier exist: a 10^8-id set is a 200 MB bit array vs a multi-GB
    frozenset.  Returns ``(bits, m)``.
    """
    m = max(64, int(n_ids) * _BLOOM_BITS_PER_ID)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    for batch in ids_ds.iter_batches(batch_format="pyarrow"):
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        for i in range(_BLOOM_K):
            h = _bloom_hash(ids, i, m)
            np.bitwise_or.at(bits, h >> 3, np.uint8(1) << (h & 7).astype(np.uint8))
    return bits, m


class _BloomFilterStage:
    """Actor-pool membership test against the broadcast bloom bits.
    ``keep_positive=True`` keeps maybe-members (semi prefilter / anti
    verify side); ``False`` keeps definite non-members (anti fast path)."""

    def __init__(self, bits_ref, m: int, id_column: str, keep_positive: bool):
        import ray

        self.bits = bits_ref if isinstance(bits_ref, np.ndarray) else ray.get(bits_ref)
        self.m = m
        self.id_column = id_column
        self.keep_positive = keep_positive

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        member = np.ones(len(ids), dtype=bool)
        for i in range(_BLOOM_K):
            h = _bloom_hash(ids, i, self.m)
            member &= ((self.bits[h >> 3] >> (h & 7).astype(np.uint8)) & 1).astype(bool)
        mask = member if self.keep_positive else ~member
        return batch.filter(pa.array(mask))


def semi_join_ids_bloom(
    ds,
    ids_ds,
    id_column: str = "doc_id",
    anti: bool = False,
    concurrency=None,
):
    """Bloom-tier semi/anti id join — EXACT result, bounded broadcast.

    The middle ground between :func:`semi_join_ids`'s two shapes: the id
    set is too big for a frozenset broadcast but the wide side should not
    all shuffle.  A bloom bit array (16 bits/id, k=4, ~0.24% fp)
    broadcasts once; bloom-NEGATIVE rows resolve immediately with zero
    shuffle (definitely absent: dropped for semi, kept for anti), and only
    the bloom-POSITIVE rows (true matches + ~0.24% false positives) take
    the exact cogroup verify.  For an anti join against a small hit list —
    the decontamination shape — ~100% of the corpus short-circuits.
    """
    import ray
    import ray.data as rd

    from ..poolsize import autoscale_pool

    if isinstance(ids_ds, pa.Table):
        ids_ds = rd.from_arrow(ids_ds.select([id_column]))

    n_ids = ids_ds.count()
    bits, m = build_id_bloom(ids_ds, id_column, n_ids)
    bits_ref = ray.put(bits)
    pool = concurrency or autoscale_pool(1)

    positives = ds.map_batches(
        _BloomFilterStage,
        fn_constructor_args=(bits_ref, m, id_column, True),
        batch_format="pyarrow",
        concurrency=pool,
        num_cpus=0.25,
    )
    # exact verify of the surviving sliver (false positives die here)
    verified = semi_join_ids(
        positives, ids_ds, id_column=id_column, anti=anti, mode="cogroup"
    )
    if not anti:
        return verified
    negatives = ds.map_batches(
        _BloomFilterStage,
        fn_constructor_args=(bits_ref, m, id_column, False),
        batch_format="pyarrow",
        concurrency=pool,
        num_cpus=0.25,
    )
    return negatives.union(verified)
