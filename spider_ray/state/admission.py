"""Sharded wave admission — the scale form of the fast-path admission fold.

Round-1 profiling showed ~15 s/crawl of driver-serial residue at sf0.1: the
driver concatenated EVERY wave's candidate table, sorted it and deduped it
centrally.  This pool moves that work into ``num_shards`` stateful actors:

* flatten tasks split their (url, key, rank) candidate output by
  ``hash(host) % num_shards`` and ship each part DIRECTLY to its shard
  (object refs — candidate payloads never land on the driver);
* each shard owns the seen-set partition for its hosts (set + bloom, the
  ``UrlSeen`` semantics) so the visited check and insert are local calls —
  zero seen round-trips per wave;
* ``finalize_wave`` does rank-sort → first-push dedup → priority scoring →
  depth filter → seen filter → canonical (priority desc, key desc) sort,
  all shard-local and vectorized;
* the driver k-way-merges the per-shard sorted admitted lists
  (``heapq.merge`` on (−prio, −key) — O(admitted · log shards)), which
  reproduces EXACTLY the global canonical order of the sequential fold.

Dedup correctness: a url's key always hashes to one shard (key → host →
shard), so shard-local first-push dedup by global rank equals global
first-push dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..hashing import stable_hash_str
from ..urlnorm import host_of_key, hosts_of_keys_arrow
from .spillseen import SpillableSeenSet


@ray.remote
class AdmissionShard:
    """One admission + seen shard (hosts with ``hash(host) % N == shard_id``).

    The seen partition is a :class:`SpillableSeenSet` — in-memory set until
    ``spill_threshold`` keys, then on-disk sorted digest runs + bloom
    negative cache (state/spillseen.py); None = never spill."""

    def __init__(
        self,
        shard_id: int,
        spill_threshold: int | None = None,
    ) -> None:
        self.shard_id = shard_id
        self.seen = SpillableSeenSet(spill_threshold)
        self._increment: list[str] = []
        self._parts: list[pa.Table] = []  # current wave's candidate parts

    # -- seen API (UrlSeenShard-compatible subset) --------------------------

    def contains_batch(self, keys) -> np.ndarray:
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
        return self.seen.hot_size()

    def dump(self) -> list[str]:
        return self.seen.dump()

    def restore(self, keys: list[str]) -> None:
        self.seen.update(keys)

    # -- wave admission -----------------------------------------------------

    def accept(self, *parts) -> None:
        """Queue candidate parts (columns url, key, rank) for the current
        wave.  Called with object refs — Ray resolves them here."""
        for part in parts:
            if part is not None and part.num_rows:
                self._parts.append(part)

    def finalize_wave(
        self,
        depth_distance: int,
        wave: int,
        return_candidates: bool = False,
        drain_increment: bool = False,
    ):
        """Admit the queued candidates.

        → (admitted_table, candidate_urls | None, prior_increment | None).
        ``wave`` feeds the depth term of the priority score (clamping makes
        it order-relevant).  ``drain_increment`` returns (and clears) the
        increment accumulated BEFORE this wave's inserts — those keys belong
        to waves ≤ wave−1 and must land in wave−1's checkpoint, while this
        wave's admissions must NOT (resume re-admits them from the stored
        frontier; leaking them into the earlier checkpoint would make resume
        filter the whole frontier as already-seen)."""
        import pyarrow.compute as pc

        from ..frontier import score_urls_arrow

        prior = None
        if drain_increment:
            prior, self._increment = self._increment, []
        parts, self._parts = self._parts, []
        if not parts:
            return None, ([] if return_candidates else None), prior
        merged = pa.concat_tables(parts)
        # global first-push order: stable rank sort, keep first key
        order = pc.sort_indices(merged, sort_keys=[("rank", "ascending")])
        merged = merged.take(order)
        keys = merged.column("key").combine_chunks()
        encoded = pc.dictionary_encode(keys)
        if isinstance(encoded, pa.ChunkedArray):
            encoded = encoded.combine_chunks()
        codes = encoded.indices.to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(codes, return_index=True)
        keep = np.zeros(len(codes), dtype=bool)
        keep[first_idx] = True
        merged = merged.filter(pa.array(keep))
        cand_urls = merged.column("url").to_pylist() if return_candidates else None

        urls = merged.column("url").combine_chunks()
        keys = merged.column("key").combine_chunks()
        prios = score_urls_arrow(urls, wave)
        # no shard-side canonical sort: the driver sorts the (much smaller)
        # admitted union once; the seen filter below is order-independent
        tbl = pa.table({"url": urls, "key": keys, "prio": pa.array(prios, pa.int32())})
        if depth_distance > 0:
            pathq = pc.replace_substring_regex(
                tbl.column("url"), pattern=r"^[^:/?#]+://[^/]*", replacement=""
            )
            ok = pc.or_(
                pc.invert(pc.starts_with(pathq, "/")),
                pc.less_equal(pc.count_substring(pathq, "/"), depth_distance),
            )
            tbl = tbl.filter(ok)
        # hosts vectorized — the one shared routing-host derivation
        hosts_arr = hosts_of_keys_arrow(tbl.column("key"))
        key_list = tbl.column("key").to_pylist()
        add = self.seen.add
        inc = self._increment
        keep_rows: list[int] = []
        for i, key in enumerate(key_list):
            if add(key):
                inc.append(key)
                keep_rows.append(i)
        take = pa.array(keep_rows, pa.int64())
        admitted = pa.table(
            {
                "url": tbl.column("url").take(take),
                "key": tbl.column("key").take(take),
                "prio": tbl.column("prio").take(take),
                "host": hosts_arr.take(take),
            }
        )
        return admitted, cand_urls, prior


class AdmissionPool:
    """Driver facade: UrlSeen-compatible seen API + the sharded wave fold."""

    def __init__(
        self,
        num_shards: int = 8,
        spill_threshold: int | None = None,
        stage_increments: bool = False,
    ) -> None:
        self.num_shards = num_shards
        self.shards = [
            AdmissionShard.remote(i, spill_threshold) for i in range(num_shards)
        ]
        self._accept_futs: list = []
        self._pending_parts: list[list] = [[] for _ in range(num_shards)]
        # checkpointing crawls drain each shard's increment at finalize entry
        # (keys of waves ≤ k) and stage it here for wave k's checkpoint —
        # see AdmissionShard.finalize_wave(drain_increment=...)
        self.stage_increments = stage_increments
        self._staged_incs: list[list[str]] = [[] for _ in range(num_shards)]

    # -- seen facade (host-routed, mirrors UrlSeen fast mode) ---------------

    def _route(self, keys: list[str], hosts: list[str]):
        buckets: list[list[tuple[int, str]]] = [[] for _ in range(self.num_shards)]
        shard_of_host: dict[str, int] = {}
        for idx, (k, h) in enumerate(zip(keys, hosts)):
            s = shard_of_host.get(h)
            if s is None:
                s = shard_of_host[h] = stable_hash_str(h) % self.num_shards
            buckets[s].append((idx, k))
        return buckets

    def contains_batch(self, keys: list[str], hosts: list[str]) -> list[bool]:
        buckets = self._route(keys, hosts)
        futures = [
            (bucket, shard.contains_batch.remote([k for _, k in bucket]))
            for shard, bucket in zip(self.shards, buckets)
            if bucket
        ]
        out = [False] * len(keys)
        for bucket, fut in futures:
            for (idx, _), hit in zip(bucket, ray.get(fut)):
                out[idx] = hit
        return out

    def insert_batch(self, keys: list[str], hosts: list[str]) -> int:
        buckets = self._route(keys, hosts)
        futs = [
            shard.insert_batch.remote([k for _, k in bucket])
            for shard, bucket in zip(self.shards, buckets)
            if bucket
        ]
        return sum(ray.get(futs)) if futs else 0

    def stage_pending_increments(self) -> None:
        """Drain shard-side increments into the staged buffer so the NEXT
        checkpoint includes them.  Needed before checkpointing driver-side
        ``insert_batch`` keys that no ``finalize_wave`` will drain (the
        sitemap chain after the wave loop) — in staged mode
        ``checkpoint_increments`` otherwise returns only prior drains and
        those keys would never be checkpointed (resume would re-admit and
        re-fetch every sitemap page).  Call ONLY at a point where the shards
        hold no in-flight next-wave admissions."""
        if not self.stage_increments:
            return
        for s, inc in enumerate(ray.get([s.take_increment.remote() for s in self.shards])):
            if inc:
                self._staged_incs[s].extend(inc)

    def checkpoint_increments(self) -> list[list[str]]:
        """Increments for the wave being checkpointed: the staged drains
        (waves ≤ k) plus anything inserted driver-side since (seed wave /
        sitemap chain) — NOT the in-flight wave-k+1 admissions, which stay
        in the shards until the next finalize drains them."""
        if self.stage_increments:
            staged, self._staged_incs = self._staged_incs, [
                [] for _ in range(self.num_shards)
            ]
            return staged
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

    # -- wave fold ----------------------------------------------------------

    def push_candidates(self, urls: list[str]) -> None:
        """Driver-side candidate injection (resume path): route (url, key,
        rank=position) rows to their shards."""
        if not urls:
            return
        per_shard: dict[int, tuple[list, list, list]] = {}
        for rank, url in enumerate(urls):
            key = url.lower()
            s = stable_hash_str(host_of_key(key)) % self.num_shards
            b = per_shard.setdefault(s, ([], [], []))
            b[0].append(url)
            b[1].append(key)
            b[2].append(rank)
        for s, (us, ks, rs) in per_shard.items():
            part = pa.table(
                {
                    "url": pa.array(us, pa.string()),
                    "key": pa.array(ks, pa.string()),
                    "rank": pa.array(rs, pa.int64()),
                }
            )
            self._pending_parts[s].append(part)

    def accept_parts(self, per_shard_refs: list) -> None:
        """Queue one flatten task's per-shard output refs (no driver data —
        the refs are batched into ONE accept call per shard per wave)."""
        for s, ref in enumerate(per_shard_refs):
            self._pending_parts[s].append(ref)

    def _flush_accepts(self) -> None:
        for s, parts in enumerate(self._pending_parts):
            if parts:
                # varargs so Ray resolves the refs shard-side
                self._accept_futs.append(self.shards[s].accept.remote(*parts))
        self._pending_parts = [[] for _ in range(self.num_shards)]

    def finalize_wave(self, depth_distance: int, wave: int, return_candidates: bool = False):
        """→ (admitted_urls, admitted_hosts, candidate_urls).

        Admitted lists are in the global canonical order: the per-shard
        admitted tables are concatenated and sorted once by (priority desc,
        key desc) — an Arrow C++ sort over admitted rows only."""
        import pyarrow.compute as pc

        self._flush_accepts()
        if self._accept_futs:
            ray.get(self._accept_futs)
            self._accept_futs = []
        results = ray.get(
            [
                s.finalize_wave.remote(
                    depth_distance, wave, return_candidates, self.stage_increments
                )
                for s in self.shards
            ]
        )
        if self.stage_increments:
            for s, r in enumerate(results):
                if r[2]:
                    self._staged_incs[s].extend(r[2])
        tables = [r[0] for r in results if isinstance(r[0], pa.Table) and r[0].num_rows]
        if tables:
            merged = pa.concat_tables(tables)
            idx = pc.sort_indices(
                merged, sort_keys=[("prio", "descending"), ("key", "descending")]
            )
            merged = merged.take(idx)
            admitted_urls = merged.column("url").to_pylist()
            admitted_hosts = merged.column("host").to_pylist()
        else:
            admitted_urls, admitted_hosts = [], []
        cand = None
        if return_candidates:
            cand = []
            for r in results:
                if r[1]:
                    cand.extend(r[1])
        return admitted_urls, admitted_hosts, cand
