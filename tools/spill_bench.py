"""Seen-set spill-tier depth bench (VERDICT r4 #8; SURVEY §7.3's
10^10-URL concern): drive SpillableSeenSet shards well past the spill
threshold — synthetic URL-shaped keys only, no corpus — and measure the
sorted-run + bloom tier's insert / duplicate-reject / miss-lookup
throughput plus the on-disk checkpoint size.

Shape mirrors production: N_SHARDS independent actor-held shards (the
crawl's URL-seen is hash-sharded across actors), each fed KEYS_PER_SHARD
distinct keys so every shard spills, flushes its hot set repeatedly, and
merges runs.  Aggregate cluster throughput = per-phase keys / wall.

Usage: python tools/spill_bench.py [n_shards] [keys_per_shard]
Defaults 16 x 6_250_000 = 1e8 keys total.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> int:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_shard = int(sys.argv[2]) if len(sys.argv) > 2 else 6_250_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False)

    @ray.remote
    class Shard:
        def __init__(self, shard_id: int, spill_threshold: int):
            from spider_ray.state.spillseen import SpillableSeenSet

            self.sid = shard_id
            self.dir = tempfile.mkdtemp(prefix=f"spillbench_{shard_id}_")
            self.seen = SpillableSeenSet(
                spill_threshold=spill_threshold, spill_dir=self.dir
            )

        def _key(self, i: int) -> str:
            return f"https://host{i & 1023}.example/s{self.sid}/p{i}"

        def insert(self, n: int) -> float:
            t0 = time.perf_counter()
            add = self.seen.add
            for i in range(n):
                add(self._key(i))
            return time.perf_counter() - t0

        def reinsert(self, n: int, stride: int = 10) -> tuple[float, int]:
            """Duplicate rejection: every key already present (bloom hit ->
            run binary search).  Returns (wall, n_new) — n_new must be 0."""
            t0 = time.perf_counter()
            add = self.seen.add
            new = sum(add(self._key(i)) for i in range(0, n * stride, stride))
            return time.perf_counter() - t0, new

        def misses(self, base: int, n: int) -> tuple[float, int]:
            """Absent keys: the bloom negative cache fast path."""
            t0 = time.perf_counter()
            seen = self.seen
            hits = sum((self._key(i) in seen) for i in range(base, base + n))
            return time.perf_counter() - t0, hits

        def stats(self) -> dict:
            disk = sum(
                os.path.getsize(os.path.join(self.dir, f))
                for f in os.listdir(self.dir)
            )
            bloom = self.seen.bloom
            return {
                "n_keys": len(self.seen),
                "hot": self.seen.hot_size(),
                "n_runs": len(self.seen.runs),
                "disk_bytes": disk,
                "bloom_bytes": len(bloom.bits) if bloom is not None else 0,
            }

    spill_threshold = 500_000
    shards = [Shard.remote(s, spill_threshold) for s in range(n_shards)]

    t0 = time.perf_counter()
    walls = ray.get([s.insert.remote(per_shard) for s in shards])
    insert_wall = time.perf_counter() - t0

    n_lookup = max(per_shard // 10, 1)
    t0 = time.perf_counter()
    re = ray.get([s.reinsert.remote(n_lookup) for s in shards])
    reinsert_wall = time.perf_counter() - t0
    assert sum(n for _, n in re) == 0, "re-insert produced new keys"

    t0 = time.perf_counter()
    mi = ray.get([s.misses.remote(per_shard * 16, n_lookup) for s in shards])
    miss_wall = time.perf_counter() - t0
    false_hits = sum(h for _, h in mi)

    stats = ray.get([s.stats.remote() for s in shards])
    total = n_shards * per_shard
    out = {
        "metric": "spillseen_depth",
        "n_shards": n_shards,
        "keys_total": total,
        "spill_threshold": spill_threshold,
        "insert_keys_per_s": round(total / insert_wall),
        "insert_keys_per_s_per_shard": round(
            per_shard / (sum(walls) / n_shards)
        ),
        "dup_reject_per_s": round(n_shards * n_lookup / reinsert_wall),
        "miss_lookup_per_s": round(n_shards * n_lookup / miss_wall),
        "bloom_false_hits": false_hits,
        "disk_bytes_total": sum(s["disk_bytes"] for s in stats),
        "bloom_bytes_total": sum(s["bloom_bytes"] for s in stats),
        "runs_per_shard": stats[0]["n_runs"],
        "bytes_per_key": round(
            sum(s["disk_bytes"] + s["bloom_bytes"] for s in stats) / total, 2
        ),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.exit(main())
