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
    concurrency=None,
):
    """Rows of ``ds`` whose ``id_column`` appears (semi) / does not appear
    (anti) in ``ids_ds``'s ``id_column``.  ``ids_ds`` may be a Dataset or a
    ``pyarrow.Table``; duplicate ids on the id side are fine.

    ``mode``: ``"broadcast"`` | ``"cogroup"`` | ``"auto"`` (count the id
    side — a distributed scalar — and switch at ``broadcast_max_ids``).
    The cogroup path shuffles ``ds`` once by id and assumes one id's rows
    fit one task (ids are unique per row in every caller here).
    """
    import ray
    import ray.data as rd

    if isinstance(ids_ds, pa.Table):
        ids_ds = rd.from_arrow(ids_ds.select([id_column]))

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
