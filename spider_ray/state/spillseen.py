"""Spillable seen-set: the on-disk sorted-run tier for URL-seen shards.

Spider spills its visited set to SQLite under memory pressure
(``website.rs:1718-1749``; disk store ``features/disk.rs:110-160`` — a
``resources(url COLLATE NOCASE)`` table fronted by the in-memory bloom,
``interner.rs:186-213``).  This module re-expresses that memory→disk tier
for a Ray actor shard, LSM-style and SQLite-free:

* below ``spill_threshold`` the shard is a plain Python ``set`` of key
  strings — zero overhead, exact (the round-1 design, unchanged);
* on crossing the threshold the shard converts every key to a 16-byte
  blake2b digest, writes ONE sorted run to disk (numpy ``|S16``,
  memory-mapped on read) and keeps only a small "hot" digest set in memory;
  a bloom filter over all spilled+hot keys becomes the negative cache
  (``bloom.rs`` semantics: a miss proves "never seen"; a hit falls through
  to binary search over the sorted runs);
* each time the hot set refills, it is flushed as another sorted run; runs
  are merged once there are ``MAX_RUNS`` of them (one ``np.sort`` over the
  concatenation — sequential IO, no random writes).

Exactness: membership is digest equality on 128-bit blake2b — at 10¹⁰ keys
the collision probability is ~(10¹⁰)²/2¹²⁸ ≈ 3·10⁻¹⁹, i.e. the tier is
exact for any reachable corpus (spider's own case-insensitive SQLite tier
is string-exact; 128 bits is the scale-safe equivalent without shipping
strings to disk).  A 64-bit digest would NOT be (birthday bound ~5 expected
collisions at 10¹⁰), which is why digests are 16 bytes.

Memory at 10¹⁰ urls, 256 shards: ≈39M keys/shard on disk (625 MB of runs,
mmap — page cache, not heap) + ``spill_threshold`` hot digests + a ~47 MB
bloom (10 bits/key).  Heap per shard stays O(spill_threshold).
"""

from __future__ import annotations

import os
import tempfile
from hashlib import blake2b

import numpy as np

from ..hashing import BloomFilter


def _digest(key: str) -> bytes:
    return blake2b(key.encode("utf-8", "surrogatepass"), digest_size=16).digest()


class SpillableSeenSet:
    """Exact seen-set with an optional disk tier.

    ``spill_threshold=None`` (default) = plain in-memory set, the bloom is
    never built and ``dump()`` returns the original key strings.  With a
    threshold, the set spills to sorted digest runs and ``dump()`` is
    unavailable (checkpointing uses increments, which stay strings).
    """

    MAX_RUNS = 8

    def __init__(
        self,
        spill_threshold: int | None = None,
        spill_dir: str | None = None,
        bloom_bits_per_key: int = 10,
    ) -> None:
        self.spill_threshold = spill_threshold
        self._spill_dir = spill_dir
        self._bloom_bits = bloom_bits_per_key
        self.hot: set = set()  # str keys pre-spill; bytes16 digests after
        self.spilled = False
        self.runs: list[np.ndarray] = []  # sorted |S16 arrays (mmap-backed)
        self._run_files: list[str] = []
        self._run_counter = 0
        self.bloom: BloomFilter | None = None
        self._n_spilled = 0

    # -- membership ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self.hot) + self._n_spilled

    def hot_size(self) -> int:
        return len(self.hot)

    def __contains__(self, key: str) -> bool:
        if not self.spilled:
            return key in self.hot
        d = _digest(key)
        if d in self.hot:
            return True
        if self.bloom is not None and not self.bloom.might_contain_hash(
            int.from_bytes(d[:8], "little")
        ):
            return False
        return self._in_runs(d)

    def add(self, key: str) -> bool:
        """Insert; returns True when the key was new."""
        if not self.spilled:
            if key in self.hot:
                return False
            self.hot.add(key)
            if self.spill_threshold is not None and len(self.hot) >= self.spill_threshold:
                self._spill_initial()
            return True
        d = _digest(key)
        if d in self.hot:
            return False
        h64 = int.from_bytes(d[:8], "little")
        if self.bloom.might_contain_hash(h64) and self._in_runs(d):
            return False
        self.hot.add(d)
        self.bloom.add_hash(h64)
        if len(self.hot) >= self.spill_threshold:
            self._flush_hot()
        return True

    def update(self, keys) -> None:
        for k in keys:
            self.add(k)

    def dump(self) -> list[str]:
        if self.spilled:
            raise RuntimeError(
                "seen set spilled to digest runs — original key strings are "
                "gone; use checkpoint increments instead of dump()"
            )
        return list(self.hot)

    # -- disk tier ------------------------------------------------------------

    def _in_runs(self, d: bytes) -> bool:
        key = np.frombuffer(d, dtype="|S16")[0]
        for run in self.runs:
            i = int(np.searchsorted(run, key))
            if i < len(run) and run[i] == key:
                return True
        return False

    def _dir(self) -> str:
        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix="seen_spill_")
        else:
            os.makedirs(self._spill_dir, exist_ok=True)
        return self._spill_dir

    def _write_run(self, digests: np.ndarray) -> None:
        """digests: unsorted |S16 array → one sorted run on disk, mmapped."""
        digests = np.sort(digests)
        path = os.path.join(self._dir(), f"run_{self._run_counter:05d}.npy")
        self._run_counter += 1
        np.save(path, digests)
        self.runs.append(np.load(path, mmap_mode="r"))
        self._run_files.append(path)
        self._n_spilled += len(digests)
        if len(self.runs) > self.MAX_RUNS:
            self._merge_runs()

    def _spill_initial(self) -> None:
        """First crossing: digest every key, build the bloom, drop strings."""
        keys = self.hot
        digests = np.empty(len(keys), dtype="|S16")
        bloom = BloomFilter(
            capacity=max(len(keys) * 4, 1 << 16), bits_per_item=self._bloom_bits
        )
        for i, k in enumerate(keys):
            d = _digest(k)
            digests[i] = d
            bloom.add_hash(int.from_bytes(d[:8], "little"))
        self.bloom = bloom
        self.hot = set()
        self.spilled = True
        self._write_run(digests)

    def _flush_hot(self) -> None:
        digests = np.array(list(self.hot), dtype="|S16")
        self.hot = set()
        self._write_run(digests)

    def _merge_runs(self) -> None:
        merged = np.sort(np.concatenate([np.asarray(r) for r in self.runs]))
        old_files = self._run_files
        self.runs, self._run_files, self._n_spilled = [], [], 0
        self._write_run(merged)
        for f in old_files:
            try:
                os.unlink(f)
            except OSError:
                pass
