"""Stable 64-bit hashing + bloom filter.

The reference uses ``ahash`` for content signatures
(``spider/src/utils/mod.rs:9287-9300``) — ahash is per-process
seed-randomized, so the *bit pattern* is not reproducible even in the
reference.  The matchable semantic is the grouping behavior; we fix a stable
64-bit hash (blake2b-8) so oracles and checkpoints are deterministic
(SURVEY.md §2.2 "Parity note").

The bloom filter mirrors ``spider/src/utils/bloom.rs`` (k=7, p≈0.01,
negative-cache only — zero false negatives; the authoritative set stays the
source of truth, ``interner.rs:186-213``).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np


def stable_hash_u64(data: bytes) -> int:
    """Stable 64-bit hash of bytes (unsigned)."""
    return int.from_bytes(blake2b(data, digest_size=8).digest(), "little")


def stable_hash_str(s: str) -> int:
    return stable_hash_u64(s.encode("utf-8", "surrogatepass"))


def hash_u64_column(values) -> np.ndarray:
    """Vectorized-ish stable hash of a string iterable → uint64 array."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = stable_hash_u64(v.encode("utf-8", "surrogatepass") if isinstance(v, str) else v)
    return out


class SigSet:
    """Content-signature set with vectorized membership.

    Semantically a ``set[int]`` (the uint64 page-signature space of
    ``stable_hash_u64``), but stored as a sorted-unique ``np.uint64`` array
    so the per-wave freshness gate is one ``np.searchsorted`` instead of
    ``np.fromiter`` over a Python set (which cost ~1-2 s/crawl at sf0.1 once
    the set reached ~1M signatures).  Supports the small subset of the set
    API the crawl paths use: ``in``/``add`` (sequential fold,
    waves.py:gate_links_by_signature), ``update``/``__iter__``/``sorted()``
    (checkpoint/restore), and the vectorized ``fresh_mask``/``update_array``
    (fast-path gate, pipelines/crawl.py:_gate_blocks)."""

    def __init__(self, init=()) -> None:
        self._arr = np.empty(0, dtype=np.uint64)
        self._extra: set[int] = set()
        if init:
            self.update(init)

    def _compact(self) -> None:
        if self._extra:
            extra = np.fromiter(self._extra, dtype=np.uint64, count=len(self._extra))
            self._arr = np.union1d(self._arr, extra)
            self._extra.clear()

    def __len__(self) -> int:
        self._compact()
        return len(self._arr)

    def __bool__(self) -> bool:
        return bool(self._extra) or len(self._arr) > 0

    def __contains__(self, sig: int) -> bool:
        if sig in self._extra:
            return True
        arr = self._arr
        i = np.searchsorted(arr, np.uint64(sig))
        return bool(i < len(arr) and arr[i] == np.uint64(sig))

    def add(self, sig: int) -> None:
        if sig not in self:
            self._extra.add(int(sig))

    def update(self, sigs) -> None:
        if isinstance(sigs, np.ndarray):
            self.update_array(sigs)
        else:
            self._extra.update(int(s) for s in sigs)

    def update_array(self, sigs: np.ndarray) -> None:
        if len(sigs):
            self._compact()
            self._arr = np.union1d(self._arr, sigs.astype(np.uint64, copy=False))

    def fresh_mask(self, sigs: np.ndarray) -> np.ndarray:
        """True where sig is NOT already in the set (vectorized)."""
        self._compact()
        arr = self._arr
        sigs = sigs.astype(np.uint64, copy=False)
        if len(arr) == 0:
            return np.ones(len(sigs), dtype=bool)
        idx = np.searchsorted(arr, sigs)
        np.minimum(idx, len(arr) - 1, out=idx)
        return arr[idx] != sigs

    def __iter__(self):
        self._compact()
        return iter(self._arr.tolist())


class BloomFilter:
    """Bit-array bloom filter, k=7 (``bloom.rs:15-37``); used as a fast
    negative cache in front of the authoritative seen set."""

    K = 7

    def __init__(self, capacity: int = 1_000_000, bits_per_item: int = 10) -> None:
        self.m = max(64, capacity * bits_per_item)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, h: int):
        # double hashing: h1 + i*h2 (Kirsch–Mitzenmacher)
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) | 1
        for i in range(self.K):
            yield (h1 + i * h2) % self.m

    def add_hash(self, h: int) -> None:
        for pos in self._positions(h):
            self.bits[pos >> 6] |= np.uint64(1 << (pos & 63))

    def might_contain_hash(self, h: int) -> bool:
        for pos in self._positions(h):
            if not (int(self.bits[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def add(self, key: str) -> None:
        self.add_hash(stable_hash_str(key))

    def might_contain(self, key: str) -> bool:
        return self.might_contain_hash(stable_hash_str(key))
