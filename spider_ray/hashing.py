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
