"""Sharded URL-seen state — the distributed analogue of spider's
``ListBucket`` (authoritative ``HashSet`` + bloom negative-cache,
``spider/src/utils/interner.rs:52-230`` + ``utils/bloom.rs``).

Shard routing key: ``stable_hash(url_norm) % num_shards`` — the same hash
used for corpus host-bucketing, so one partitioning scheme serves the whole
pipeline.  Each shard holds a Python set (authoritative) fronted by a bloom
filter; the shard API is batch-only so a wave's membership check is
``num_shards`` actor round-trips, not per-URL calls.

Checkpointing is incremental: ``take_increment()`` returns only URLs inserted
since the last checkpoint (wave lineage — resume unions increments of waves
≤ k).  The per-shard backing store can later become an on-disk sorted-run +
bloom without changing this API (SURVEY.md §7.3 "10¹⁰-scale seen-set").
"""

from __future__ import annotations

import ray

from ..hashing import stable_hash_str
from .spillseen import SpillableSeenSet


@ray.remote
class UrlSeenShard:
    """One seen shard.  The backing store is a :class:`SpillableSeenSet`:
    a plain in-memory set until ``spill_threshold`` keys, then an on-disk
    sorted-digest-run tier fronted by a bloom negative cache — spider's
    memory→SQLite spill (``website.rs:1718-1749``) re-expressed
    (state/spillseen.py).  ``spill_threshold=None`` never spills."""

    def __init__(
        self,
        shard_id: int,
        bloom_capacity: int = 1_000_000,
        spill_threshold: int | None = None,
    ) -> None:
        self.shard_id = shard_id
        self.seen = SpillableSeenSet(spill_threshold)
        self._increment: list[str] = []

    def contains_batch(self, keys) -> "object":
        """keys: list[str] or pyarrow.Array (worker-side to_pylist keeps the
        string materialization off the driver).  Returns a numpy bool array.
        """
        import numpy as np

        if not isinstance(keys, list):
            keys = keys.to_pylist()
        seen = self.seen
        return np.fromiter((k in seen for k in keys), dtype=bool, count=len(keys))

    def insert_batch(self, keys) -> int:
        if not isinstance(keys, list):
            keys = keys.to_pylist()
        add = self.seen.add
        inc = self._increment
        added = 0
        for k in keys:
            if add(k):
                inc.append(k)
                added += 1
        return added

    def take_increment(self) -> list[str]:
        inc, self._increment = self._increment, []
        return inc

    def size(self) -> int:
        return len(self.seen)

    def hot_size(self) -> int:
        """In-heap entry count (spill-tier diagnostics)."""
        return self.seen.hot_size()

    def dump(self) -> list[str]:
        return self.seen.dump()

    def restore(self, keys: list[str]) -> None:
        self.seen.update(keys)


class UrlSeen:
    """Driver-side facade over the shard pool (batch fan-out/fan-in)."""

    def __init__(
        self,
        num_shards: int = 8,
        bloom_capacity: int = 1_000_000,
        spill_threshold: int | None = None,
    ) -> None:
        self.num_shards = num_shards
        self.shards = [
            UrlSeenShard.options(name=None).remote(i, bloom_capacity, spill_threshold)
            for i in range(num_shards)
        ]

    def _route(self, keys: list[str], hosts: list[str] | None = None):
        """Shard routing.  When ``hosts`` is given, the routing key is the
        HOST hash — the same partitioning key as the corpus buckets and the
        politeness scheduler (one key reused across every stage); hashing is
        then amortized over unique hosts instead of per-URL."""
        buckets: list[list[tuple[int, str]]] = [[] for _ in range(self.num_shards)]
        if hosts is not None:
            shard_of_host: dict[str, int] = {}
            for idx, (k, h) in enumerate(zip(keys, hosts)):
                s = shard_of_host.get(h)
                if s is None:
                    s = shard_of_host[h] = stable_hash_str(h) % self.num_shards
                buckets[s].append((idx, k))
        else:
            for idx, k in enumerate(keys):
                buckets[stable_hash_str(k) % self.num_shards].append((idx, k))
        return buckets

    def contains_batch(self, keys: list[str], hosts: list[str] | None = None) -> list[bool]:
        buckets = self._route(keys, hosts)
        futures = []
        for shard, bucket in zip(self.shards, buckets):
            if bucket:
                futures.append((bucket, shard.contains_batch.remote([k for _, k in bucket])))
        out = [False] * len(keys)
        for bucket, fut in futures:
            for (idx, _), hit in zip(bucket, ray.get(fut)):
                out[idx] = hit
        return out

    def insert_batch(self, keys: list[str], hosts: list[str] | None = None) -> int:
        futures = self.insert_batch_async(keys, hosts)
        return sum(ray.get(futures)) if futures else 0

    def insert_batch_async(self, keys: list[str], hosts: list[str] | None = None):
        """Fire the inserts and return futures — callers may overlap the wave
        fetch with the insert round-trip and ray.get before the next
        contains_batch."""
        buckets = self._route(keys, hosts)
        return [
            shard.insert_batch.remote([k for _, k in bucket])
            for shard, bucket in zip(self.shards, buckets)
            if bucket
        ]

    def contains_arrow(self, keys_arr, shard_idx):
        """Arrow fan-out: keys as a pyarrow StringArray + precomputed shard
        index (numpy).  String materialization happens worker-side."""
        import numpy as np
        import pyarrow as pa

        out = np.zeros(len(keys_arr), dtype=bool)
        futs = []
        for s in range(self.num_shards):
            pos = np.nonzero(shard_idx == s)[0]
            if len(pos):
                futs.append(
                    (pos, self.shards[s].contains_batch.remote(keys_arr.take(pa.array(pos))))
                )
        for pos, f in futs:
            out[pos] = ray.get(f)
        return out

    def insert_arrow_async(self, keys_arr, shard_idx):
        import numpy as np
        import pyarrow as pa

        futs = []
        for s in range(self.num_shards):
            pos = np.nonzero(shard_idx == s)[0]
            if len(pos):
                futs.append(self.shards[s].insert_batch.remote(keys_arr.take(pa.array(pos))))
        return futs

    def checkpoint_increments(self) -> list[list[str]]:
        return ray.get([s.take_increment.remote() for s in self.shards])

    def restore(self, per_shard_keys: list[list[str]]) -> None:
        ray.get(
            [s.restore.remote(keys) for s, keys in zip(self.shards, per_shard_keys) if keys]
        )

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def dump(self) -> set[str]:
        out: set[str] = set()
        for keys in ray.get([s.dump.remote() for s in self.shards]):
            out.update(keys)
        return out

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
