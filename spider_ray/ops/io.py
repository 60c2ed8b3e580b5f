"""Resumable partitioned-Parquet output for operator results.

The 100-TB output contract (SURVEY §7 / round brief): never one giant
file — one directory per partition key, each written ATOMICALLY
(tmp + rename), so a failed run re-executed with the same arguments skips
every partition that already landed and rewrites only the missing ones.

Shape: ONE ``groupby(key).map_groups`` shuffle routes each partition's rows
to a single writer task; the writer emits a tiny ``(partition, n_rows,
skipped)`` manifest row, so the driver never sees data — only the manifest.
Partitioning assumption (documented): one partition's rows fit in one
writer's heap; pick a key with bounded fan-in (host bucket, shard id, date)
— the same rule as every ``map_groups`` op in this repo.

STORAGE CONTRACT (multi-node): ``out_dir`` MUST be on shared storage
visible to every Ray worker (NFS / object-store mount / fuse).  The
``skip_existing`` resume check runs ``os.path.exists`` on whichever worker
executes the partition's task — on node-local disks outputs would scatter
across nodes and completed partitions would silently re-write.  When shared
storage can't be assumed, read the previous run's manifest on the DRIVER
and pass its finished partition keys as ``completed=`` — that check is
location-independent.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _sanitize(value: object) -> str:
    s = str(value)
    return "".join(c if c.isalnum() or c in "._-" else "_" for c in s) or "_"


def write_partitioned(
    ds,
    out_dir: str,
    by: str,
    skip_existing: bool = True,
    completed: frozenset | set | None = None,
):
    """Write ``ds`` under ``out_dir/<by>=<value>/part.parquet``, one
    directory per distinct ``by`` value, atomically per partition.

    ``out_dir`` must be on storage shared by all workers (module contract);
    alternatively pass ``completed`` — partition key strings already
    finished per a driver-held manifest — which is honored regardless of
    where the previous run's files landed.

    Returns the manifest as a ``ray.data.Dataset`` of
    ``(partition, n_rows, skipped)`` — ``skipped`` True when a completed
    partition from a previous run was left untouched."""
    os.makedirs(out_dir, exist_ok=True)
    completed = frozenset(str(v) for v in completed) if completed else frozenset()

    def write_group(tbl: pa.Table) -> pa.Table:
        import glob as _glob

        val = tbl.column(by)[0].as_py()
        pdir = os.path.join(out_dir, f"{by}={_sanitize(val)}")
        final = os.path.join(pdir, "part.parquet")
        # sweep orphaned tmps from a killed writer FIRST — they must never
        # be mistaken for data by a glob-reading consumer
        for stale in _glob.glob(final + ".tmp.*"):
            try:
                os.remove(stale)
            except OSError:
                pass
        if str(val) in completed or (skip_existing and os.path.exists(final)):
            return pa.table(
                {
                    "partition": pa.array([str(val)], pa.string()),
                    "n_rows": pa.array([tbl.num_rows], pa.int64()),
                    "skipped": pa.array([True], pa.bool_()),
                }
            )
        os.makedirs(pdir, exist_ok=True)
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)  # atomic on POSIX: readers see all-or-nothing
        return pa.table(
            {
                "partition": pa.array([str(val)], pa.string()),
                "n_rows": pa.array([tbl.num_rows], pa.int64()),
                "skipped": pa.array([False], pa.bool_()),
            }
        )

    return ds.groupby(by).map_groups(write_group, batch_format="pyarrow")
