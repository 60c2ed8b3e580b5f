"""Distributed wave-crawl pipeline (Ray Data).

Architecture (SURVEY.md §7.0): one crawl = repeated application of a wave
pipeline over Datasets, with small stateful services:

* ``UrlSeen`` actor shards (set + bloom)          — visited membership
* driver-held ``Budget`` + per-host politeness    — inherently ordered fold
  (metadata-only, mirroring spider's driver-held ``Website`` state)
* everything heavy — the corpus-join fetch, HTML parse / link extraction /
  text extraction / signature — is stateless ``map_batches`` over zero-copy
  Arrow batches; ``html`` never leaves the fetch→parse fusion.

Per wave::

    admitted urls ──read_parquet(bucket-pruned, url-filtered)──▶ pages(html)
        ▲                                                          │ map_batches(ParsePages)
        │                                                          ▼
    admission fold (waves.admit_wave) ◀── UrlSeen.contains ◀── links+sig+meta
        │                                                          │
        └────────── checkpoint (frontier/seen/budget/metrics) ◀────┴─ write pages parquet

Checkpoint layout (resume = load latest complete wave; per-partition lineage)::

    ckpt_dir/
      manifest.json                  {wave, shards, config_hash}
      wave_{k}/frontier.parquet      next-wave candidates (url, priority)
      wave_{k}/deferred.parquet      politeness carry-over
      wave_{k}/seen/shard_{s}.parquet  urls first seen in wave k (incremental)
      wave_{k}/budget.json           budget counters + signature set
      wave_{k}/metrics.json
    out_dir/wave_{k}/*.parquet       parsed pages (wave lineage column)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlJob
from ..frontier import score_url
from ..oracle import load_robots
from ..semantics import Budget, depth_distance_for
from ..stages.fetch import corpus_n_buckets
from ..stages.parse import ParsePages, missing_rows
from ..hashing import SigSet
from ..urlnorm import hosts_of_keys_arrow, url_host
from ..waves import admit_wave, gate_links_by_signature, order_candidates
from .. import oracle as _oracle


@dataclass
class CrawlResult:
    visited: list[str] = field(default_factory=list)
    admitted_order: list[tuple[int, int, str]] = field(default_factory=list)
    pages_tables: list[pa.Table] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    out_dir: str | None = None
    seen_keys: set[str] = field(default_factory=set)  # authoritative final seen set
    stopped: bool = False  # True when a CrawlControl shutdown ended the crawl

    @property
    def visited_set(self) -> set[str]:
        return {u.lower() for u in self.visited}

    def pages_table(self) -> pa.Table:
        return pa.concat_tables(self.pages_tables) if self.pages_tables else None


def _flatten_block_impl(tbl, local_rows, ranks):
    """Worker-side candidate flatten: allowed rows' links → (url, key, rank)
    with local first-push dedup.  rank = (page admitted-rank << 21) | doc
    position — a total order identical to the sequential first-push walk."""
    import numpy as np
    import pyarrow.compute as pc

    links = tbl.column("links").combine_chunks().take(pa.array(local_rows, pa.int64()))
    flat = pc.list_flatten(links)
    total = len(flat)
    if total == 0:
        return None
    lens = pc.list_value_length(links).to_numpy(zero_copy_only=False).astype(np.int64)
    page_rank_rep = np.repeat(np.asarray(ranks, dtype=np.int64), lens)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    doc_pos = np.arange(total, dtype=np.int64) - starts
    rank64 = (page_rank_rep << 21) | np.minimum(doc_pos, (1 << 21) - 1)
    order = np.argsort(rank64, kind="stable")
    flat = flat.take(pa.array(order, pa.int64()))
    rank64 = rank64[order]
    keys = pc.utf8_lower(flat)
    keep = _first_seen_mask(keys)
    mask = pa.array(keep)
    out = pa.table(
        {
            "url": flat.filter(mask),
            "key": keys.filter(mask),
            "rank": pa.array(rank64[keep], pa.int64()),
        }
    )
    return out.append_column("n_raw", pa.array([total] * out.num_rows, pa.int64()))


def _first_seen_mask_np(arr):
    """First-occurrence mask over a numpy array (integer keys)."""
    import numpy as np

    _, first_idx = np.unique(arr, return_index=True)
    keep = np.zeros(len(arr), dtype=bool)
    keep[first_idx] = True
    return keep


def _sig_fresh_and_update(signatures, sig_in_order):
    """Cross-wave freshness mask (True = signature unseen in prior waves),
    then fold this wave's signatures into the set.  Vectorized searchsorted
    when ``signatures`` is a :class:`~spider_ray.hashing.SigSet`; falls back
    to np.isin for a plain ``set`` (direct callers in tests)."""
    import numpy as np

    if hasattr(signatures, "fresh_mask"):
        fresh = signatures.fresh_mask(sig_in_order)
        signatures.update_array(sig_in_order)
        return fresh
    if signatures:
        fresh = ~np.isin(
            sig_in_order, np.fromiter(signatures, dtype=np.uint64, count=len(signatures))
        )
    else:
        fresh = np.ones(len(sig_in_order), dtype=bool)
    signatures.update(np.unique(sig_in_order).tolist())
    return fresh


def _first_seen_mask(keys) -> "object":
    """First-occurrence boolean mask over a string array (keep=True), pure
    Arrow+numpy: dictionary-encode (C++ hash table) then first index per
    code — no pandas hop on the frontier hot path."""
    import numpy as np
    import pyarrow.compute as pc

    encoded = pc.dictionary_encode(keys)
    if isinstance(encoded, pa.ChunkedArray):
        encoded = encoded.combine_chunks()
    codes = encoded.indices.to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(codes, return_index=True)
    keep = np.zeros(len(codes), dtype=bool)
    keep[first_idx] = True
    return keep


def _fetch_parse_task_impl(desc, parser):
    """One corpus descriptor → fused row-group read + parse → (url,
    signature, links) block.  The raw-task twin of
    ``stages.fetch.ReadRowGroups`` + ``ParsePages`` for the sharded wave
    executor (see ``_fetch_parse_wave_stream`` for why raw tasks)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.fetch import FETCH_COLUMNS

    f = pq.ParquetFile(desc["path"])
    cols = [c for c in FETCH_COLUMNS if c in f.schema_arrow.names]
    tbl = f.read_row_groups(list(desc["row_groups"]), columns=cols)
    mask = pc.is_in(tbl.column("url"), value_set=pa.array(desc["urls"], pa.string()))
    parsed = parser(tbl.filter(mask))
    if parsed.num_rows == 0 or "url" not in parsed.schema.names:
        return parsed
    return parsed.select(["url", "signature", "links"])


def _iter_allowed_blocks(blocks, allowed_ranks):
    """Yield (block_ref, rows, ranks, keep_mask) for fetched blocks with at
    least one link-expanding page (searchsorted membership vs the sorted
    allowed-rank array)."""
    import numpy as np

    for block_ref, rows, ranks, _sigs in blocks:
        if block_ref is None or len(ranks) == 0:
            continue
        if len(allowed_ranks):
            idx = np.searchsorted(allowed_ranks, ranks)
            np.minimum(idx, len(allowed_ranks) - 1, out=idx)
            mask = allowed_ranks[idx] == ranks
        else:
            mask = np.zeros(len(ranks), dtype=bool)
        if mask.any():
            yield block_ref, rows, ranks, mask


_FETCH_PARSE_TASK = None


def _fetch_parse_task_remote():
    global _FETCH_PARSE_TASK
    if _FETCH_PARSE_TASK is None:
        import ray

        _FETCH_PARSE_TASK = ray.remote(_fetch_parse_task_impl)
    return _FETCH_PARSE_TASK


_FLATTEN_REMOTE = None


def _flatten_remote():
    global _FLATTEN_REMOTE
    if _FLATTEN_REMOTE is None:
        import ray

        _FLATTEN_REMOTE = ray.remote(_flatten_block_impl)
    return _FLATTEN_REMOTE


def _flatten_block_sharded_impl(tbl, local_rows, ranks, num_shards):
    """Sharded candidate flatten: like :func:`_flatten_block_impl`, but the
    locally-deduped (url, key, rank) rows are split by
    ``hash(host) % num_shards`` so each part ships STRAIGHT to its
    AdmissionShard (the driver only ever touches object refs).  Returns
    ``num_shards`` tables (None when empty) + the raw candidate count."""
    import numpy as np
    import pyarrow.compute as pc

    from ..hashing import stable_hash_str

    links = tbl.column("links").combine_chunks().take(pa.array(local_rows, pa.int64()))
    flat = pc.list_flatten(links)
    total = len(flat)
    if total == 0:
        return tuple([None] * num_shards) + (0,)
    lens = pc.list_value_length(links).to_numpy(zero_copy_only=False).astype(np.int64)
    page_rank_rep = np.repeat(np.asarray(ranks, dtype=np.int64), lens)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    doc_pos = np.arange(total, dtype=np.int64) - starts
    rank64 = (page_rank_rep << 21) | np.minimum(doc_pos, (1 << 21) - 1)
    order = np.argsort(rank64, kind="stable")
    flat = flat.take(pa.array(order, pa.int64()))
    rank64 = rank64[order]
    keys = pc.utf8_lower(flat)
    keep = _first_seen_mask(keys)
    mask = pa.array(keep)
    out = pa.table(
        {
            "url": flat.filter(mask),
            "key": keys.filter(mask),
            "rank": pa.array(rank64[keep], pa.int64()),
        }
    )
    hosts = hosts_of_keys_arrow(out.column("key"))
    enc = pc.dictionary_encode(hosts)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    shard_of_u = np.fromiter(
        (stable_hash_str(h) % num_shards for h in uniq), dtype=np.int64, count=len(uniq)
    )
    shard_idx = shard_of_u[enc.indices.to_numpy(zero_copy_only=False)]
    parts = []
    for s in range(num_shards):
        pos = np.nonzero(shard_idx == s)[0]
        parts.append(out.take(pa.array(pos, pa.int64())) if len(pos) else None)
    return (*parts, total)


_FLATTEN_SHARDED_REMOTE: dict[int, object] = {}


def _flatten_sharded_remote(num_shards: int):
    if num_shards not in _FLATTEN_SHARDED_REMOTE:
        import ray

        _FLATTEN_SHARDED_REMOTE[num_shards] = ray.remote(num_returns=num_shards + 1)(
            _flatten_block_sharded_impl
        )
    return _FLATTEN_SHARDED_REMOTE[num_shards]


from ..htmlparse import hash_html as _hash_html  # noqa: E402

_EMPTY_SIG = _hash_html("")


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class RayCrawler:
    """Driver for one crawl job over a bucketed Parquet corpus."""

    def __init__(
        self,
        job: CrawlJob,
        corpus_dir: str,
        out_dir: str | None = None,
        ckpt_dir: str | None = None,
        num_seen_shards: int = 8,
        parse_batch_size: int = 128,
        parse_concurrency: int | None = None,
        keep_pages: bool = True,
        collect_seen: bool = False,
        queue_provider=None,
        adaptive_politeness: bool = False,
        index_mode: str = "auto",  # "auto" | "driver" | "pooled"
        seen_spill_threshold: int | None = None,
        control=None,  # CrawlControl: pause/resume/shutdown at wave barriers
    ) -> None:
        self.job = job
        self.config = job.config
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.ckpt_dir = ckpt_dir
        self.num_seen_shards = num_seen_shards
        self.parse_batch_size = parse_batch_size
        self.parse_concurrency = parse_concurrency
        self.keep_pages = keep_pages
        self.collect_seen = collect_seen
        self.queue_provider = queue_provider
        # streaming mode only: latency-EMA auto-throttle + 429 token-bucket
        # penalties inside the HostGate shards (state/throttle.py).  Off by
        # default — wall-clock dependent, outside the deterministic parity
        # contract.
        self.adaptive_politeness = adaptive_politeness
        self.index_mode = index_mode
        # per-shard in-heap key cap before the seen set spills to sorted
        # digest runs on disk (state/spillseen.py — the 10¹⁰-URL tier).
        # Spilled shards cannot dump() original strings, so seen collection
        # is disabled when a threshold is set.
        self.seen_spill_threshold = seen_spill_threshold
        if seen_spill_threshold is not None:
            self.collect_seen = False
        self.control = control
        self.frontier_ops = 0  # candidate URLs processed (bench metric)
        self._index = None  # CorpusIndex, built lazily at first wave
        self._pending_inserts: list = []
        # redirect state: crawl-global resolver (Strict initial allowance) +
        # the live job (gains seed_redirects after a cross-host seed redirect)
        from ..redirect import RedirectResolver

        self._resolver = RedirectResolver(self.config)
        self._live_job = job
        self._router_cache = None
        self._index_pool = None  # CorpusIndexPool (sharded/streaming paths)

    def _control_stop(self, wave: int) -> bool:
        """Wave-barrier control point (handle_process, website.rs:7891):
        blocks while paused; True = shutdown requested."""
        return self.control is not None and self.control.checkpoint(wave) == "shutdown"

    #: corpora above this row count index through the sharded actor pool
    #: (driver memory stays flat); below it the driver dict is faster —
    #: per-wave shard round-trips cost more than the dict saves.
    POOLED_INDEX_ROWS = 20_000_000

    def _index_pool_get(self):
        """Scale-adaptive corpus index for the refs paths: a sharded
        CorpusIndexPool once the corpus outgrows a single driver dict
        (``index_mode='pooled'`` forces it; ``'driver'`` forces the dict)."""
        if self._index_pool is not None:
            return self._index_pool
        mode = self.index_mode
        if mode == "auto":
            rows = 0
            try:
                with open(os.path.join(self.corpus_dir, "_corpus_manifest.json")) as f:
                    rows = json.load(f).get("rows") or 0
            except OSError:
                pass
            mode = "pooled" if rows > self.POOLED_INDEX_ROWS else "driver"
        if mode == "pooled":
            from ..stages.fetch import CorpusIndexPool

            self._index_pool = CorpusIndexPool(self.corpus_dir, self.num_seen_shards)
        else:
            from ..stages.fetch import CorpusIndex

            if self._index is None:
                self._index = CorpusIndex(self.corpus_dir)
            self._index_pool = self._index
        return self._index_pool

    def _router(self):
        if self._router_cache is None:
            self._router_cache = _oracle.ScopeRouter(self._live_job)
        return self._router_cache

    def _resolve_wave(self, admitted: list[str], wave: int, index=None):
        """Driver-side redirect resolution for one wave (metadata-only, zero
        row-group I/O: chains walk the driver-held non-200 metadata, then
        ONE batched existence lookup covers every chain terminal).  Returns
        (fetch_urls, backmap, targets_only, synth) where synth entries are
        (requested_url, status, final_redirect_destination) rows with no
        fetchable content (aborted chains / chains onto missing targets)."""
        from ..redirect import REDIRECT_ERROR_STATUS

        index = index if index is not None else self._index
        loc_of = index.location_of
        flaky_of = getattr(index, "flaky_of", {})
        follow = bool(loc_of) and self._resolver.policy != "none"
        if not follow and not flaky_of:
            return admitted, {}, frozenset(), []
        router = self._router()
        fetch: list[str] = []
        pending: list[tuple[str, str]] = []  # (requested, final) awaiting existence
        backmap: dict[str, list[str]] = {}
        synth: list[tuple[str, int, str | None]] = []
        seed_redirs: list[tuple[str, str]] = []
        for u in admitted:
            if not follow or u not in loc_of:
                fetch.append(u)
                continue
            _, root = router.for_host(url_host(u))
            crawl_host = url_host(root) if root else url_host(u)
            res = self._resolver.resolve(u, index.meta_get_optimistic, crawl_host)
            if res.error:
                synth.append((u, REDIRECT_ERROR_STATUS, None))
                continue
            final = res.final_url
            if (
                wave == 0
                and u in self._live_job.seeds
                and res.destination is not None
                and url_host(final) != url_host(u)
            ):
                seed_redirs.append((u, final))
            if final == u:
                fetch.append(u)
            else:
                pending.append((u, final))
        if pending:
            exists = index.contains_batch(sorted({f for _, f in pending}))
            for u, final in pending:
                if exists.get(final):
                    backmap.setdefault(final, []).append(u)
                else:
                    synth.append((u, 404, final))
        if seed_redirs:
            self._live_job = self._live_job.with_seed_redirects(
                self._live_job.seed_redirects + tuple(seed_redirs)
            )
            self._router_cache = None
        if flaky_of:
            # transient-failure gate on the terminal fetch urls: flaky_until
            # failing attempts vs the retry budget of retry+1 attempts
            # (website.rs:4205-4253; 503 is retryable per page.rs:1641-1653)
            from ..functions.retry import is_retryable_status

            retry_budget = self.config.retry

            def fails(url: str) -> bool:
                f = flaky_of.get(url, 0)
                return f > retry_budget and is_retryable_status(503)

            kept = []
            for u in fetch:
                if fails(u):
                    synth.append((u, 503, None))
                else:
                    kept.append(u)
            fetch = kept
            for final in [f for f in backmap if fails(f)]:
                for requested in backmap.pop(final):
                    synth.append((requested, 503, final))
        targets_only = frozenset(set(backmap) - set(fetch))
        return fetch, backmap, targets_only, synth

    # -- corpus-side helpers -------------------------------------------------

    def _robots(self):
        """robots.txt lookup straight from the corpus (tiny, driver-side —
        a ``RobotsCache`` actor pool shard at 10¹⁰ scale, SURVEY.md §2.3)."""
        import pyarrow.dataset as pads

        config = self.config
        roots = [r for _, r in _oracle.ScopeRouter(self.job).entries if r]
        if not config.respect_robots_txt or not roots:
            return {}, {}
        urls = [r + "robots.txt" for r in roots]
        n_buckets = corpus_n_buckets(self.corpus_dir)
        from ..stages.fetch import bucket_of

        paths = []
        for u in urls:
            p = os.path.join(self.corpus_dir, f"bucket={bucket_of(u, n_buckets):04d}", "part-0.parquet")
            if os.path.exists(p) and p not in paths:
                paths.append(p)
        found: dict[str, tuple[int, bytes]] = {}
        if paths:
            import pyarrow.compute as pc

            tbl = pads.dataset(paths).to_table(
                columns=["url", "html", "status"], filter=pc.field("url").isin(urls)
            )
            for u, h, s in zip(
                tbl.column("url").to_pylist(),
                tbl.column("html").to_pylist(),
                tbl.column("status").to_pylist(),
            ):
                found[u] = (s, h)

        def corpus_get(url):
            return found.get(url, (404, None))

        return load_robots(corpus_get, config, roots)

    # -- checkpointing -------------------------------------------------------

    def _ckpt_wave(self, wave, candidates, deferred, budget, signatures, seen, metrics):
        if not self.ckpt_dir:
            return
        wdir = os.path.join(self.ckpt_dir, f"wave_{wave:05d}")
        os.makedirs(os.path.join(wdir, "seen"), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "url": [u for u, _ in candidates],
                    "priority": pa.array([p for _, p in candidates], pa.int32()),
                }
            ),
            os.path.join(wdir, "frontier.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "url": [u for u, _ in deferred],
                    "priority": pa.array([p for _, p in deferred], pa.int32()),
                }
            ),
            os.path.join(wdir, "deferred.parquet"),
        )
        for s, inc in enumerate(seen.checkpoint_increments()):
            pq.write_table(
                pa.table({"url_norm": inc, "wave": pa.array([wave] * len(inc), pa.int32())}),
                os.path.join(wdir, "seen", f"shard_{s:03d}.parquet"),
            )
        _atomic_write_json(
            os.path.join(wdir, "budget.json"),
            {"budget": budget.snapshot(), "signatures": sorted(signatures)},
        )
        _atomic_write_json(os.path.join(wdir, "metrics.json"), metrics)
        _atomic_write_json(
            os.path.join(self.ckpt_dir, "manifest.json"),
            {"wave": wave, "num_seen_shards": self.num_seen_shards,
             "config_hash": self._config_hash(), **self._redirect_state()},
        )

    def _ckpt_wave_fast(self, wave, flat_candidates, signatures, seen, metrics):
        """Fast-path checkpoint: frontier as a flat url column (priorities are
        a deterministic function of the url, recomputed on resume)."""
        if not self.ckpt_dir:
            return
        if self._pending_inserts:
            import ray

            ray.get(self._pending_inserts)
            self._pending_inserts = []
        wdir = os.path.join(self.ckpt_dir, f"wave_{wave:05d}")
        os.makedirs(os.path.join(wdir, "seen"), exist_ok=True)
        if flat_candidates is None:
            urls = pa.array([], pa.string())
        elif isinstance(flat_candidates, pa.Table):
            urls = flat_candidates.column("url")
        else:
            urls = flat_candidates
        pq.write_table(pa.table({"url": urls}), os.path.join(wdir, "frontier.parquet"))
        for s, inc in enumerate(seen.checkpoint_increments()):
            pq.write_table(
                pa.table({"url_norm": inc, "wave": pa.array([wave] * len(inc), pa.int32())}),
                os.path.join(wdir, "seen", f"shard_{s:03d}.parquet"),
            )
        _atomic_write_json(
            os.path.join(wdir, "budget.json"),
            {"budget": {"counters": None}, "signatures": sorted(signatures)},
        )
        _atomic_write_json(os.path.join(wdir, "metrics.json"), metrics)
        _atomic_write_json(
            os.path.join(self.ckpt_dir, "manifest.json"),
            {"wave": wave, "num_seen_shards": self.num_seen_shards, "mode": "fast",
             "config_hash": self._config_hash(), **self._redirect_state()},
        )

    def _redirect_state(self) -> dict:
        """Redirect state that only materializes live at wave 0 and must
        survive a resume: cross-host seed redirects (the rebuilt scope
        selectors, ``modify_selectors``) and the Strict resolver's crawl-global
        initial allowance counter."""
        return {
            "seed_redirects": [list(t) for t in self._live_job.seed_redirects],
            "redirect_initial_used": self._resolver.initial_used,
        }

    def _restore_redirect_state(self, manifest: dict) -> None:
        redirs = tuple((a, b) for a, b in manifest.get("seed_redirects") or ())
        if redirs:
            self._live_job = self._live_job.with_seed_redirects(
                redirs + tuple(t for t in self._live_job.seed_redirects if t not in redirs)
            )
            self._router_cache = None
        self._resolver.initial_used = int(manifest.get("redirect_initial_used") or 0)

    def _config_hash(self) -> str:
        """Deterministic hash of everything that shapes checkpoint layout:
        the job (seeds + frozen config repr), shard count, and fast/non-fast
        mode (shard-routing scheme + whether frontier priorities are stored).
        Hook callables are hashed by qualname (function reprs carry memory
        addresses that change between runs)."""
        import hashlib
        from dataclasses import replace as _rep

        cfg = self.config
        hook_names = tuple(
            getattr(h, "__qualname__", repr(type(h))) if h is not None else None
            for h in (cfg.on_link_find, cfg.on_should_crawl)
        )
        # frozenset iteration order is hash-randomized per process; canonicalize
        # to a sorted tuple so the hash is stable across CLI invocations.
        sanitized = _rep(
            cfg,
            on_link_find=None,
            on_should_crawl=None,
            external_domains=tuple(sorted(cfg.external_domains)),
        )
        payload = repr(
            (self.job.seeds, sanitized, hook_names, self.num_seen_shards, self._simple_config())
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def _find_resume_manifest(self) -> dict | None:
        if not self.ckpt_dir:
            return None
        mpath = os.path.join(self.ckpt_dir, "manifest.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            manifest = json.load(f)
        stored = manifest.get("config_hash")
        if stored is not None and stored != self._config_hash():
            raise ValueError(
                "checkpoint config mismatch: the checkpoint at "
                f"{self.ckpt_dir} was written under a different config/mode "
                "(resuming would mix shard-routing schemes); start a fresh "
                "ckpt_dir or restore the original config"
            )
        return manifest

    def _restore(self, upto_wave: int, seen, budget, signatures, result: CrawlResult):
        """Rebuild state from checkpoints of waves 0..upto_wave."""
        mpath = os.path.join(self.ckpt_dir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                self._restore_redirect_state(json.load(f))
        per_shard: list[list[str]] = [[] for _ in range(self.num_seen_shards)]
        for w in range(upto_wave + 1):
            wdir = os.path.join(self.ckpt_dir, f"wave_{w:05d}")
            for s in range(self.num_seen_shards):
                p = os.path.join(wdir, "seen", f"shard_{s:03d}.parquet")
                if os.path.exists(p):
                    per_shard[s].extend(pq.read_table(p).column("url_norm").to_pylist())
        seen.restore(per_shard)
        wdir = os.path.join(self.ckpt_dir, f"wave_{upto_wave:05d}")
        with open(os.path.join(wdir, "budget.json")) as f:
            b = json.load(f)
        budget.restore(b["budget"])
        signatures.update(b["signatures"])
        with open(os.path.join(wdir, "metrics.json")) as f:
            result.metrics.extend(json.load(f))
        cand = pq.read_table(os.path.join(wdir, "frontier.parquet"))
        urls = cand.column("url").to_pylist()
        prios = (
            cand.column("priority").to_pylist()
            if "priority" in cand.column_names
            else [0] * len(urls)
        )
        candidates = list(zip(urls, prios))
        deferred_l: list[tuple[str, int]] = []
        dpath = os.path.join(wdir, "deferred.parquet")
        if os.path.exists(dpath):
            deferred = pq.read_table(dpath)
            deferred_l = list(
                zip(deferred.column("url").to_pylist(), deferred.column("priority").to_pylist())
            )
        return candidates, deferred_l

    # -- fetch + parse -------------------------------------------------------

    def _fetch_parse_wave(self, admitted: list[str], wave: int) -> pa.Table:
        """Distributed fetch-join + parse for one wave; returns the parsed
        table (url, host, status_code, signature, title, …, links).

        ParsePages runs as a driver-constructed instance by default (tasks,
        not an actor pool): its state is a few hundred bytes of scope config,
        and per-wave datasets would pay actor-pool startup EVERY wave.  Set
        ``parse_concurrency`` to pin an actor pool for long waves instead."""
        import ray

        from ..stages.fetch import CorpusIndex, fetch_wave_indexed

        if self._index is None:
            self._index = CorpusIndex(self.corpus_dir)
        fetch_urls, backmap, targets_only, synth = self._resolve_wave(admitted, wave)
        ds, missing_known = fetch_wave_indexed(
            fetch_urls + list(backmap.keys() - set(fetch_urls)),
            self._index,
            concurrency=self.config.concurrency_limit,
        )
        tables: list[pa.Table] = []
        if ds is not None:
            # batch_size=None: task per fetched block (one corpus descriptor)
            parse_kwargs = dict(batch_format="pyarrow", batch_size=None)
            if self.config.concurrency_limit and not self.parse_concurrency:
                parse_kwargs["concurrency"] = self.config.concurrency_limit
            parse_args = (self._live_job, wave, backmap, targets_only)
            if self.parse_concurrency:
                parsed_ds = ds.map_batches(
                    ParsePages,
                    fn_constructor_args=parse_args,
                    concurrency=self.parse_concurrency,
                    **parse_kwargs,
                )
            else:
                parser = ParsePages(*parse_args)
                parsed_ds = ds.map_batches(parser, **parse_kwargs)
            if self.out_dir:
                parsed_ds = parsed_ds.materialize()
                parsed_ds.write_parquet(os.path.join(self.out_dir, f"wave_{wave:05d}"))
            if not self.keep_pages:
                # only the frontier-relevant columns travel to the driver —
                # text/title/html-derived payload stays in the workers
                parsed_ds = parsed_ds.select_columns(
                    ["url", "signature", "links", "blocked_crawl", "wave"]
                )
            # materialize before taking refs: to_arrow_refs on a live
            # pipeline executes on a measurably slower non-streaming path
            tables = [
                t
                for t in ray.get(parsed_ds.materialize().to_arrow_refs())
                if t.num_rows > 0 and "url" in t.schema.names
            ]
        synth_all = [(u, 404, None) for u in missing_known] + synth
        if synth_all:
            miss_tbl = missing_rows(
                [u for u, _, _ in synth_all],
                wave,
                statuses=[s for _, s, _ in synth_all],
                destinations=[d for _, _, d in synth_all],
            )
            if self.config.normalize:
                miss_tbl = miss_tbl.set_column(
                    miss_tbl.schema.get_field_index("signature"),
                    "signature",
                    pa.array([_EMPTY_SIG] * len(synth_all), pa.uint64()),
                )
            if not self.keep_pages:
                miss_tbl = miss_tbl.select(["url", "signature", "links", "blocked_crawl", "wave"])
            tables.append(miss_tbl)
            if self.out_dir:
                wdir = os.path.join(self.out_dir, f"wave_{wave:05d}")
                os.makedirs(wdir, exist_ok=True)
                pq.write_table(miss_tbl, os.path.join(wdir, "missing.parquet"))
        if not tables:
            return None
        names = [f.name for f in tables[0].schema]
        return pa.concat_tables([t.select(names) for t in tables])

    # -- vectorized fast path ------------------------------------------------

    def _simple_config(self) -> bool:
        """True when admission is order-independent (no budget, politeness,
        robots, filters, or round-robin) — the common web-scale case.  The
        vectorized path below then produces EXACTLY the same admitted set and
        canonical order as the sequential fold (parity-tested)."""
        c = self.config
        return (
            c.budget is None
            and c.delay_ms == 0
            and not c.respect_robots_txt
            and not c.whitelist
            and not c.blacklist
            and not c.round_robin
            and not c.extra_links
            and c.on_link_find is None
            and c.on_should_crawl is None
            and self.queue_provider is None
        )

    def _candidates_fast(self, parsed_tbl, admitted, signatures, wave):
        """Arrow-native candidate extraction: vectorized signature gating in
        admitted order, then list_flatten of allowed pages' links — candidate
        URLs never become Python objects until after dedup."""
        import numpy as np
        import pyarrow.compute as pc

        if parsed_tbl is None:
            return None
        # rows of parsed_tbl in ADMITTED (canonical) order — Arrow C++ hash
        # join (index_in), no pandas Index build
        indexer = pc.index_in(
            pa.array(admitted, pa.string()), value_set=parsed_tbl.column("url")
        ).to_numpy(zero_copy_only=False)
        indexer = (
            indexer[~np.isnan(indexer)].astype(np.int64)
            if indexer.dtype.kind == "f"
            else indexer[indexer >= 0]
        )
        if self.config.normalize:
            sigs_np = parsed_tbl.column("signature").to_numpy(zero_copy_only=False)
            sig_in_order = sigs_np[indexer]
            # first occurrence within the wave AND not in the cross-wave set
            # (duplicate-content pages do not expand links, website.rs:8673-8683)
            first = _first_seen_mask_np(sig_in_order)
            fresh = _sig_fresh_and_update(signatures, sig_in_order)
            allowed = first & fresh
            allowed_rows = indexer[allowed]
        else:
            allowed_rows = indexer
        links_col = parsed_tbl.column("links").combine_chunks()
        flat = pc.list_flatten(links_col.take(pa.array(allowed_rows, pa.int64())))
        return flat  # StringArray, in page-admitted × doc order

    def _admit_fast(self, flat_candidates, seen, wave):
        """Vectorized dedup + canonical ordering + depth filter + seen check.

        Equivalent to order_candidates + admit_wave for simple configs:
        first-push dedup by candidate order, heap order = sort by
        (priority desc, url_norm desc), depth = path-segment count.
        """
        import numpy as np
        import pyarrow.compute as pc

        from ..frontier import score_urls_arrow
        from ..semantics import depth_distance_for

        if flat_candidates is None or len(flat_candidates) == 0:
            return [], []
        if isinstance(flat_candidates, pa.Table):
            # pre-deduped (url, key) from the distributed flatten path
            cand = flat_candidates.column("url").combine_chunks()
            cand_keys = flat_candidates.column("key").combine_chunks()
        else:
            self.frontier_ops += len(flat_candidates)
            keys = pc.utf8_lower(flat_candidates)
            # first-push dedup in candidate order (UrlFrontier.push semantics)
            mask_arr = pa.array(_first_seen_mask(keys))
            cand = flat_candidates.filter(mask_arr)
            cand_keys = keys.filter(mask_arr)
        prio = score_urls_arrow(cand, wave)
        # canonical heap order: priority desc, url_norm desc
        tbl = pa.table({"url": cand, "key": cand_keys, "prio": pa.array(prio, pa.int32())})
        idx = pc.sort_indices(
            tbl, sort_keys=[("prio", "descending"), ("key", "descending")]
        )
        tbl = tbl.take(idx)
        # depth filter (path-segment count incl. query, website.rs:2010-2028)
        dd = depth_distance_for(self.config)
        if dd > 0:
            pathq = pc.replace_substring_regex(
                tbl.column("url"), pattern=r"^[^:/?#]+://[^/]*", replacement=""
            )
            starts_slash = pc.starts_with(pathq, "/")
            segs = pc.count_substring(pathq, "/")
            ok = pc.or_(pc.invert(starts_slash), pc.less_equal(segs, dd))
            tbl = tbl.filter(ok)
        # host of each candidate (vectorized) — the single partitioning key
        # shared with corpus buckets and the politeness scheduler.  Shard
        # routing hashes only the UNIQUE hosts (dictionary-encoded); key
        # strings materialize worker-side, never on the driver.
        from ..hashing import stable_hash_str

        hosts_arr = hosts_of_keys_arrow(tbl.column("key"))
        dict_arr = pc.dictionary_encode(hosts_arr).combine_chunks()
        uniques = dict_arr.dictionary.to_pylist()
        shard_of_unique = np.fromiter(
            (stable_hash_str(h) % seen.num_shards for h in uniques),
            dtype=np.int64,
            count=len(uniques),
        )
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        shard_idx = shard_of_unique[codes]
        if self._pending_inserts:
            import ray

            ray.get(self._pending_inserts)
            self._pending_inserts = []
        keys_arr = tbl.column("key").combine_chunks()
        mask = seen.contains_arrow(keys_arr, shard_idx)  # True = already seen
        keep = pa.array(~mask)
        admitted_tbl = tbl.filter(keep)
        admitted_keys = admitted_tbl.column("key").combine_chunks()
        self._pending_inserts = seen.insert_arrow_async(admitted_keys, shard_idx[~mask])
        admitted = admitted_tbl.column("url").to_pylist()
        admitted_hosts = hosts_arr.filter(keep).to_pylist()
        return admitted, admitted_hosts

    # -- sharded admission (the scale fast path) -----------------------------

    def _fetch_parse_wave_stream(self, admitted: list[str], wave: int):
        """Streaming fetch+parse for the sharded path: one RAW Ray task per
        corpus descriptor (fused row-group read + parse), consumed with
        ``ray.wait`` AS TASKS COMPLETE — the per-block admitted-rank mapping
        + signature extraction runs concurrently with the remaining parse
        tasks, so the post-barrier gate left on the driver is pure numpy
        over (rank, sig) pairs.

        Raw tasks rather than a per-wave Dataset by design: a wave is a
        micro-batch with a barrier, and Ray Data's streaming executor costs
        ~0.5 s of startup per execution (measured on an empty 150-block
        wave) — ~2 s/crawl of pure overhead at any CPU count.  The parser
        ships ONCE per wave via ray.put; result blocks stay in the object
        store (the driver touches only the url/signature columns,
        zero-copy).  Ray Data remains the engine for the page-materializing
        paths and every non-crawl pipeline.

        Returns ``blocks``: list of (block_ref | None, fetched_rows np.int64,
        ranks np.int64, sigs np.uint64 | None) — block_ref None for synthetic
        rows (404 / redirect-error / flaky), which carry signatures but no
        links."""
        import numpy as np
        import ray

        index = self._index_pool_get()
        fetch_urls, backmap, targets_only, synth = self._resolve_wave(admitted, wave, index)
        descriptors, missing = index.split(
            fetch_urls + list(backmap.keys() - set(fetch_urls))
        )
        rank_of = dict(zip(admitted, range(len(admitted))))
        normalize = self.config.normalize
        blocks: list[tuple] = []
        if descriptors:
            parser_ref = ray.put(
                ParsePages(self._live_job, wave, backmap, targets_only, want_text=False)
            )
            task = _fetch_parse_task_remote()
            # concurrency_limit = worker-permit cap (configuration.rs:478):
            # submit in a sliding window of that many in-flight tasks.
            # SPIDER_RAY_PARSE_INFLIGHT caps the window when no semantic
            # limit is set: the fused decompress+parse task is memory-
            # bandwidth-heavy, and past the node's bandwidth saturation
            # point extra readers slow each other down (measured on the
            # bench box: 16 in-flight beats 32 by ~25%).  Per-NODE knob —
            # on a multi-node cluster each node schedules its own tasks,
            # so the right value tracks node memory channels, not cluster
            # CPU count.
            window = (
                self.config.concurrency_limit
                or int(os.environ.get("SPIDER_RAY_PARSE_INFLIGHT", "0"))
                or len(descriptors)
            )
            queue = list(descriptors)
            pending = [
                task.remote(queue.pop(), parser_ref)
                for _ in range(min(window, len(queue)))
            ]
            while pending:
                done, pending = ray.wait(pending, num_returns=1)
                while queue and len(pending) < window:
                    pending.append(task.remote(queue.pop(), parser_ref))
                for block_ref in done:
                    # same-node ray.get of an Arrow block is zero-copy (plasma
                    # mmap); only the url/signature columns are touched here.
                    # NOTE (round-3, measured): moving this rank loop into the
                    # fetch tasks LOSES — a wave-sized rank dict in the shared
                    # ray.put costs +54% wall at 4 CPUs (per-task unpickle),
                    # and per-descriptor rank slices cost +10-34% at 4-16
                    # CPUs (driver-serial per-task pickling).  The loop below
                    # is ~2.5 s/crawl at 8 CPUs — cheaper than every
                    # ship-it-to-workers variant tried.
                    tbl = ray.get(block_ref)
                    if tbl.num_rows == 0 or "url" not in tbl.schema.names:
                        continue
                    urls = tbl.column("url").to_pylist()
                    ranks_all = np.fromiter(
                        (rank_of.get(u, -1) for u in urls),
                        dtype=np.int64,
                        count=len(urls),
                    )
                    rows = np.nonzero(ranks_all >= 0)[0].astype(np.int64)
                    ranks = ranks_all[rows]
                    sigs = None
                    if normalize:
                        sigs = (
                            tbl.column("signature")
                            .to_numpy(zero_copy_only=False)[rows]
                            .astype(np.uint64, copy=False)
                        )
                    blocks.append((block_ref, rows, ranks, sigs))
        synth_urls = missing + [u for u, _, _ in synth]
        if synth_urls:
            ranks = np.fromiter(
                (rank_of.get(u, -1) for u in synth_urls),
                dtype=np.int64,
                count=len(synth_urls),
            )
            ranks = ranks[ranks >= 0]
            sigs = (
                np.full(len(ranks), _EMPTY_SIG, dtype=np.uint64) if normalize else None
            )
            blocks.append((None, None, ranks, sigs))
        return blocks

    def _allowed_ranks_from_blocks(self, blocks, signatures):
        """Numpy signature gate over the wave's collected (rank, sig) pairs
        → sorted array of admitted ranks whose pages may expand links:
        duplicate-content pages do not expand links (website.rs:8673-8683) —
        first occurrence in admitted order AND unseen in prior waves."""
        import numpy as np

        all_ranks = np.concatenate([b[2] for b in blocks])
        if self.config.normalize and len(all_ranks):
            all_sigs = np.concatenate([b[3] for b in blocks])
            order = np.argsort(all_ranks, kind="stable")
            sig_in_order = all_sigs[order]
            first = _first_seen_mask_np(sig_in_order)
            fresh = _sig_fresh_and_update(signatures, sig_in_order)
            return np.sort(all_ranks[order][first & fresh])
        return np.sort(all_ranks)

    def _candidates_fast_stream(self, admitted, wave, signatures):
        """Raw-task candidate extraction for the streaming (HostGate) mode:
        streaming fetch+parse, numpy gate, per-block flatten tasks, then one
        driver-side rank sort + global first-push dedup.  The heavy link
        columns never reach the driver (flatten ships (url, key, rank))."""
        import numpy as np
        import pyarrow.compute as pc
        import ray

        blocks = self._fetch_parse_wave_stream(admitted, wave)
        if not blocks:
            return None
        allowed_ranks = self._allowed_ranks_from_blocks(blocks, signatures)
        flat_futs = [
            _flatten_remote().remote(block_ref, rows[mask], ranks[mask])
            for block_ref, rows, ranks, mask in _iter_allowed_blocks(blocks, allowed_ranks)
        ]
        if not flat_futs:
            return None
        parts = [p for p in ray.get(flat_futs) if p is not None and p.num_rows]
        if not parts:
            return None
        merged = pa.concat_tables(parts)
        self.frontier_ops += int(sum(t.column("n_raw")[0].as_py() for t in parts))
        # exact global first-push dedup: stable order by rank, keep first key
        order = pc.sort_indices(merged, sort_keys=[("rank", "ascending")])
        merged = merged.take(order)
        merged = merged.filter(pa.array(_first_seen_mask(merged.column("key"))))
        return merged  # columns: url, key, rank, n_raw

    def _wave_sharded(self, admitted, wave, pool, signatures, want_candidates):
        """One wave through the sharded AdmissionPool: streaming fetch+parse
        (per-block rank/sig extraction overlapped with the parse stage) →
        numpy signature gate → sharded flatten tasks shipping candidate
        parts straight to their shards → shard-local admit → merged
        canonical order.

        → (next_admitted, next_hosts, n_raw_candidates, cand_for_ckpt)."""
        import numpy as np
        import ray

        from ..semantics import depth_distance_for

        blocks = self._fetch_parse_wave_stream(admitted, wave)
        count_refs = []
        if blocks:
            allowed_ranks = self._allowed_ranks_from_blocks(blocks, signatures)
            n_shards = pool.num_shards
            for block_ref, rows, ranks, mask in _iter_allowed_blocks(blocks, allowed_ranks):
                refs = _flatten_sharded_remote(n_shards).remote(
                    block_ref, rows[mask], ranks[mask], n_shards
                )
                pool.accept_parts(refs[:-1])
                count_refs.append(refs[-1])
        next_admitted, next_hosts, cand = pool.finalize_wave(
            depth_distance_for(self.config), wave + 1, want_candidates
        )
        n_raw = sum(ray.get(count_refs)) if count_refs else 0
        self.frontier_ops += n_raw
        return next_admitted, next_hosts, n_raw, cand

    def _run_fast_sharded(self, resume: bool = False) -> CrawlResult:
        """Fast-path crawl with SHARDED admission: the per-wave candidate
        sort/dedup/score/seen fold runs inside ``num_seen_shards`` actors
        that also own the seen-set partitions (zero seen round-trips); the
        driver's per-wave serial work is only the O(admitted) k-way merge
        and the fetch descriptor split.  Produces EXACTLY the same admitted
        order as the driver fold (parity-tested)."""
        import time as _time

        from ..state.admission import AdmissionPool

        t_start = _time.monotonic()
        config = self.config
        result = CrawlResult(out_dir=self.out_dir)
        pool = AdmissionPool(
            self.num_seen_shards,
            spill_threshold=self.seen_spill_threshold,
            stage_increments=bool(self.ckpt_dir),
        )
        signatures = SigSet()
        budget = Budget(config.budget, depth_distance_for(config))
        want_cand = bool(self.ckpt_dir)

        manifest = self._find_resume_manifest() if resume else None
        resume_wave = manifest["wave"] if manifest else None

        if resume_wave is not None:
            candidates, _ = self._restore(resume_wave, pool, budget, signatures, result)
            wave = resume_wave
            pool.push_candidates([u for u, _ in candidates])
            admitted, admitted_hosts, _ = pool.finalize_wave(
                depth_distance_for(config), wave + 1, False
            )
            if admitted and wave + 1 < config.max_waves:
                wave += 1
                result.visited.extend(admitted)
                result.admitted_order.extend(
                    (wave, seq, url) for seq, url in enumerate(admitted)
                )
            else:
                admitted = []
        else:
            visited_seed: set[str] = set()
            admitted = _oracle.admit_seeds(self.job, config, lambda u: None, visited_seed)
            pool.insert_batch([u.lower() for u in admitted], [url_host(u) for u in admitted])
            for seq, url in enumerate(admitted):
                result.visited.append(url)
                result.admitted_order.append((0, seq, url))
            wave = 0

        timed_out = False
        while admitted:
            next_admitted, next_hosts, n_raw, cand_ckpt = self._wave_sharded(
                admitted, wave, pool, signatures, want_cand
            )
            result.metrics.append(
                {"wave": wave, "admitted": len(admitted), "fetched": len(admitted),
                 "candidates": n_raw}
            )
            if wave != resume_wave:
                self._ckpt_wave_fast(
                    wave,
                    pa.array(cand_ckpt or [], pa.string()) if want_cand else None,
                    signatures,
                    pool,
                    result.metrics,
                )
            timed_out = (
                config.crawl_timeout_s is not None
                and _time.monotonic() - t_start >= config.crawl_timeout_s
            )
            if self._control_stop(wave):
                result.stopped = True
                break
            if timed_out or not next_admitted or wave + 1 >= config.max_waves:
                break
            wave += 1
            admitted = next_admitted
            result.visited.extend(admitted)
            result.admitted_order.extend(
                (wave, seq, url) for seq, url in enumerate(admitted)
            )

        # an aborted crawl (shutdown / crawl_timeout) must NOT run the sitemap
        # chain: it would fetch more pages after the stop AND its checkpoint
        # would overwrite the manifest with an EMPTY frontier, losing the
        # remaining frontier on resume
        if not config.ignore_sitemap and not result.stopped and not timed_out:
            self._sitemap_chain(result, pool, budget, lambda u: None, wave + 1, signatures)

        if self.collect_seen:
            result.seen_keys = pool.dump()
        pool.shutdown()
        if self._index_pool is not None:
            if hasattr(self._index_pool, "shutdown"):
                self._index_pool.shutdown()
            self._index_pool = None
        return result

    # -- streaming admission (HostGate actor-pool frontier) ------------------

    def run_streaming(self) -> CrawlResult:
        """Streaming-admission crawl: the per-host priority frontier lives in
        the :class:`~spider_ray.state.hostgate.HostGate` actor pool instead of
        a driver-side fold — the layout that scales past one driver.

        Supported configs: scope/depth/normalize/politeness (no budget,
        robots, white/blacklist, round-robin — those need the globally
        ordered fold).  Produces the same ADMITTED SET and the same per-host
        admission sequences as the oracle; the cross-host interleave is
        per-shard deterministic rather than globally canonical
        (tests/test_hostgate.py)."""
        import numpy as np
        import pyarrow.compute as pc

        from ..frontier import score_urls_arrow
        from ..semantics import depth_distance_for
        from ..state.hostgate import HostGate
        from ..state.seen import UrlSeen

        config = self.config
        # budget is a globally-ordered fold (driver path only); robots IS
        # supported here — per-host rules are host-local, so they filter at
        # push time and fold their crawl-delay into the shard's politeness
        assert config.budget is None
        assert not config.whitelist and not config.blacklist and not config.round_robin
        # hooks and extra_links have no streaming wiring yet: on_link_find is
        # never applied at dispatch, extra_links never enter the frontier, and
        # an on_should_crawl-blocked page's signature would wrongly enter the
        # dedup set (the oracle records signature=None for blocked pages) —
        # fail loudly instead of silently diverging; use run() for these
        assert config.on_link_find is None and config.on_should_crawl is None
        assert not config.extra_links

        import time as _time

        result = CrawlResult(out_dir=self.out_dir)
        seen = UrlSeen(self.num_seen_shards, spill_threshold=self.seen_spill_threshold)
        gate = HostGate(self.num_seen_shards, adaptive=self.adaptive_politeness)
        signatures = SigSet()

        robots_by_host, robots_delays = self._robots()
        gate.set_delays(robots_delays)

        def robots_for(url):
            return robots_by_host.get(url_host(url))

        visited_seed: set[str] = set()
        admitted = _oracle.admit_seeds(self.job, config, robots_for, visited_seed)
        admitted_hosts = [url_host(u) for u in admitted]
        seen.insert_batch([u.lower() for u in admitted], admitted_hosts)
        for seq, url in enumerate(admitted):
            result.visited.append(url)
            result.admitted_order.append((0, seq, url))

        wave = 0
        push_futs: list = []
        while admitted:
            t_wave = _time.monotonic()
            merged = self._candidates_fast_stream(admitted, wave, signatures)
            if self.adaptive_politeness:
                per_url = (_time.monotonic() - t_wave) / max(1, len(admitted))
                gate.record_latency(admitted_hosts, [per_url] * len(admitted_hosts))
            result.metrics.append(
                {"wave": wave, "admitted": len(admitted), "fetched": len(admitted),
                 "candidates": merged.num_rows if merged is not None else 0}
            )
            if merged is not None and merged.num_rows:
                tbl = merged
                dd = depth_distance_for(config)
                if dd > 0:
                    pathq = pc.replace_substring_regex(
                        tbl.column("url"), pattern=r"^[^:/?#]+://[^/]*", replacement=""
                    )
                    ok = pc.or_(
                        pc.invert(pc.starts_with(pathq, "/")),
                        pc.less_equal(pc.count_substring(pathq, "/"), dd),
                    )
                    tbl = tbl.filter(ok)
                if tbl.num_rows:
                    hosts_arr = hosts_of_keys_arrow(tbl.column("key"))
                    prios = score_urls_arrow(tbl.column("url").combine_chunks(), wave + 1)
                    urls_py = tbl.column("url").to_pylist()
                    hosts_py = hosts_arr.to_pylist()
                    mask = seen.contains_batch([u.lower() for u in urls_py], hosts_py)
                    ua = config.user_agent or "*"
                    push_urls, push_prios, push_hosts = [], [], []
                    for u, p, h, m in zip(urls_py, prios.tolist(), hosts_py, mask):
                        if m:
                            continue
                        if robots_by_host:
                            rb = robots_by_host.get(h)
                            if rb is not None and not rb.can_fetch(ua, u):
                                continue
                        push_urls.append(u)
                        push_prios.append(p)
                        push_hosts.append(h)
                    push_futs = gate.push(push_urls, push_prios, push_hosts)
            if push_futs:
                import ray

                ray.get(push_futs)
                push_futs = []

            popped = gate.pop_wave(config.wave_span_ms, config.delay_ms)
            if not popped:
                break
            wave += 1
            admitted = [u for u, _ in popped]
            admitted_hosts = [h for _, h in popped]
            seen.insert_batch([u.lower() for u in admitted], admitted_hosts)
            for seq, url in enumerate(admitted):
                result.visited.append(url)
                result.admitted_order.append((wave, seq, url))

        result.seen_keys = seen.dump() if self.collect_seen else set()
        gate.shutdown()
        seen.shutdown()
        if self._index_pool is not None:
            if hasattr(self._index_pool, "shutdown"):
                self._index_pool.shutdown()
            self._index_pool = None
        return result

    # -- main loop -----------------------------------------------------------

    def run(self, resume: bool = False) -> CrawlResult:
        # simple configs with no page materialization take the sharded
        # admission path — the layout that scales past one driver
        if self._simple_config() and not self.keep_pages and not self.out_dir:
            return self._run_fast_sharded(resume)

        import time as _time

        from ..state.seen import UrlSeen

        t_start = _time.monotonic()
        config = self.config
        result = CrawlResult(out_dir=self.out_dir)
        seen = UrlSeen(self.num_seen_shards, spill_threshold=self.seen_spill_threshold)
        budget = Budget(config.budget, depth_distance_for(config))
        signatures = SigSet()
        robots_by_host, robots_delays = self._robots()

        def robots_for(url):
            return robots_by_host.get(url_host(url))

        def host_delay_ms(host):
            return robots_delays.get(host, config.delay_ms)

        manifest = self._find_resume_manifest() if resume else None
        resume_wave = manifest["wave"] if manifest else None
        fast = self._simple_config()
        resume_flat = None

        if resume_wave is not None and fast:
            candidates, deferred = self._restore(resume_wave, seen, budget, signatures, result)
            resume_flat = pa.array([u for u, _ in candidates], pa.string())
            candidates = None
            wave = resume_wave
            admitted: list[str] = []
        elif resume_wave is not None:
            candidates, deferred = self._restore(resume_wave, seen, budget, signatures, result)
            wave = resume_wave
            admitted = []
        else:
            # wave 0: seed establish (shared with the oracle)
            visited_seed: set[str] = set()
            admitted = _oracle.admit_seeds(self.job, config, robots_for, visited_seed)
            seen.insert_batch(
                [u.lower() for u in admitted],
                [url_host(u) for u in admitted] if fast else None,
            )
            for seq, url in enumerate(admitted):
                result.visited.append(url)
                result.admitted_order.append((0, seq, url))
            candidates, deferred = None, [
                (u, score_url(u, 1)) for u in config.extra_links
            ]
            wave = 0

        timed_out = False
        while True:
            flat_candidates = resume_flat
            resume_flat = None
            if admitted:
                if fast:
                    parsed_tbl = self._fetch_parse_wave(admitted, wave)
                    if self.keep_pages and parsed_tbl is not None:
                        result.pages_tables.append(parsed_tbl)
                    flat_candidates = self._candidates_fast(
                        parsed_tbl, admitted, signatures, wave
                    )
                    n_cand = len(flat_candidates) if flat_candidates is not None else 0
                    result.metrics.append(
                        {"wave": wave, "admitted": len(admitted), "fetched": len(admitted),
                         "candidates": n_cand}
                    )
                    candidates = None
                else:
                    # on_link_find rewrite at dispatch (website.rs:7652-7658):
                    # visited keeps the original, fetch/page use the rewrite
                    hook = config.on_link_find
                    dispatch = [hook(u) for u in admitted] if hook else admitted
                    parsed_tbl = self._fetch_parse_wave(dispatch, wave)
                    if self.keep_pages and parsed_tbl is not None:
                        result.pages_tables.append(parsed_tbl)
                    by_url = {}
                    if parsed_tbl is not None:
                        blocked_col = (
                            parsed_tbl.column("blocked_crawl").to_pylist()
                            if "blocked_crawl" in parsed_tbl.column_names
                            else [False] * parsed_tbl.num_rows
                        )
                        for u, s, l, b in zip(
                            parsed_tbl.column("url").to_pylist(),
                            parsed_tbl.column("signature").to_pylist(),
                            parsed_tbl.column("links").to_pylist(),
                            blocked_col,
                        ):
                            # blocked pages keep their row but contribute no
                            # links and no signature to the dedup set
                            by_url[u] = (None, []) if b else (s, l)
                    pages_in_order = [(du, *by_url.get(du, (None, []))) for du in dispatch]
                    candidates = list(deferred)
                    deferred = []
                    dup_sig = 0
                    depth = wave + 1
                    for url, allowed, links in gate_links_by_signature(
                        pages_in_order, signatures, config.normalize
                    ):
                        if allowed:
                            candidates.extend((link, score_url(link, depth)) for link in links)
                        else:
                            dup_sig += 1
                    result.metrics.append(
                        {"wave": wave, "admitted": len(admitted), "fetched": len(admitted),
                         "dup_signature": dup_sig, "candidates": len(candidates)}
                    )
            elif candidates is None:
                # a wave can admit NOTHING while still deferring (politeness
                # quota filled by candidates that then dropped at the budget
                # step): the deferrals must re-enter the next admission like
                # the oracle's loop (break only when admitted AND deferred
                # are empty), or the crawl ends early with unburned budget —
                # observable as a diverging sitemap-chain admission
                candidates = list(deferred)
                deferred = []

            timed_out = (
                config.crawl_timeout_s is not None
                and _time.monotonic() - t_start >= config.crawl_timeout_s
            )
            if fast:
                if wave != resume_wave:  # never rewrite the restored wave's ckpt
                    self._ckpt_wave_fast(wave, flat_candidates, signatures, seen, result.metrics)
                if self._control_stop(wave):
                    result.stopped = True
                    break
                if timed_out or flat_candidates is None or len(flat_candidates) == 0 or wave + 1 >= config.max_waves:
                    break
                # _admit_fast fires the seen inserts itself (fire-and-overlap:
                # the round-trip completes while the next wave's fetch+parse
                # pipeline runs; awaited before the next contains)
                admitted, admitted_hosts = self._admit_fast(flat_candidates, seen, wave + 1)
                wave += 1
                result.visited.extend(admitted)
                result.admitted_order.extend(
                    (wave, seq, url) for seq, url in enumerate(admitted)
                )
                if not admitted:
                    break
                continue

            if wave != resume_wave:  # never rewrite the restored wave's ckpt
                self._ckpt_wave(wave, candidates, deferred, budget, signatures, seen, result.metrics)

            # mid-crawl queue injection (channel_queue, website.rs:7528-7562)
            budgetless: frozenset[str] = frozenset()
            if self.queue_provider is not None:
                injected = list(self.queue_provider(wave) or ())
                budgetless = frozenset(u.lower() for u in injected)
                candidates.extend((u, score_url(u, wave + 1)) for u in injected)

            if self._control_stop(wave):
                result.stopped = True
                break
            if timed_out or not candidates or wave + 1 >= config.max_waves:
                break

            order, prio_of = order_candidates(candidates, config.round_robin)
            self.frontier_ops += len(order)
            # batched, sharded visited check (the ONLY distributed-state read)
            mask = seen.contains_batch([u.lower() for u in order])
            visited_now = {u.lower() for u, m in zip(order, mask) if m}
            adm = admit_wave(
                order, prio_of, visited_now, config, robots_for, host_delay_ms, budget,
                budgetless_keys=budgetless,
            )
            wave += 1
            admitted = adm.admitted
            deferred = adm.deferred
            seen.insert_batch([u.lower() for u in admitted])
            for seq, url in enumerate(admitted):
                result.visited.append(url)
                result.admitted_order.append((wave, seq, url))
            candidates = None

            if not admitted and not deferred:
                result.metrics.append(
                    {"wave": wave, "admitted": 0, "fetched": 0, "dup_signature": 0, "candidates": 0}
                )
                self._ckpt_wave(wave, [], [], budget, signatures, seen, result.metrics)
                break

        if self._pending_inserts:
            import ray

            ray.get(self._pending_inserts)
            self._pending_inserts = []

        # --- sitemap chain (website.rs:6975): admitted through the normal
        # chain, fetched+parsed distributed, links NOT expanded.  Skipped on
        # an aborted crawl (shutdown / crawl_timeout): fetching after the stop
        # would be wrong, and the chain's checkpoint would overwrite the
        # manifest with an empty frontier, losing the remainder on resume ---
        if not config.ignore_sitemap and not result.stopped and not timed_out:
            self._sitemap_chain(result, seen, budget, robots_for, wave + 1, signatures)

        if self.collect_seen:
            result.seen_keys = seen.dump()
        seen.shutdown()
        return result

    def _sitemap_chain(self, result, seen, budget, robots_for, sm_wave, signatures=()):
        from ..semantics import is_over_depth
        from ..sources.sitemap import collect_sitemap_urls
        from ..stages.fetch import CorpusIndex

        config = self.config
        if self._index is None:
            self._index = CorpusIndex(self.corpus_dir)
        index = self._index

        def corpus_get(url):
            hit = index.lookup.get(url)
            if hit is None:
                return (404, None)
            import pyarrow as pa
            import pyarrow.parquet as pq

            fi, rg = hit
            tbl = pq.ParquetFile(index.paths[fi]).read_row_group(rg, columns=["url", "html", "status"])
            mask = pa.compute.equal(tbl.column("url"), url)
            row = tbl.filter(mask)
            if row.num_rows == 0:
                return (404, None)
            return (row.column("status")[0].as_py(), row.column("html")[0].as_py())

        # MUST match run()'s fast flag exactly: run() inserts seen keys
        # host-routed whenever _simple_config() holds (ckpt or not), so the
        # sitemap chain's contains/insert must route the same way or it reads
        # the wrong shards and re-admits already-crawled URLs.
        fast = self._simple_config()
        candidates = []
        for _, root in _oracle.ScopeRouter(self.job).entries:
            if root is None:
                continue
            candidates.extend(collect_sitemap_urls(corpus_get, root, sitemap_path=config.sitemap_url))
        cand_hosts = [url_host(u) for u in candidates] if fast else None
        existing = seen.contains_batch([u.lower() for u in candidates], cand_hosts)
        admitted, seq = [], 0
        local_seen = set()
        for url, present in zip(candidates, existing):
            key = url.lower()
            if present or key in local_seen:
                continue
            if not _oracle.is_allowed_default(url, config, robots_for(url)):
                continue
            if is_over_depth(url, config):
                continue
            if budget.is_over(url):
                continue
            local_seen.add(key)
            admitted.append(url)
            result.visited.append(url)
            result.admitted_order.append((sm_wave, seq, url))
            seq += 1
        if admitted:
            seen.insert_batch(
                [u.lower() for u in admitted],
                [url_host(u) for u in admitted] if fast else None,
            )
            hook = config.on_link_find
            dispatch = [hook(u) for u in admitted] if hook else admitted
            parsed_tbl = self._fetch_parse_wave(dispatch, sm_wave)
            if self.keep_pages and parsed_tbl is not None:
                result.pages_tables.append(parsed_tbl)
            result.metrics.append(
                {"wave": sm_wave, "admitted": len(admitted), "fetched": len(admitted),
                 "sitemap": True, "candidates": 0}
            )
            # checkpoint the sitemap admissions' seen increments — without
            # this, a resume after a COMPLETED crawl re-admits and re-fetches
            # every sitemap-discovered page (duplicate output rows)
            if self.ckpt_dir:
                # sharded path: the insert above landed shard-side and no
                # finalize_wave follows to drain it — stage it explicitly or
                # the staged checkpoint below writes EMPTY seen shards
                if hasattr(seen, "stage_pending_increments"):
                    seen.stage_pending_increments()
                if fast:
                    self._ckpt_wave_fast(sm_wave, None, signatures, seen, result.metrics)
                else:
                    self._ckpt_wave(sm_wave, [], [], budget, signatures, seen, result.metrics)


def crawl(job: CrawlJob, corpus_dir: str, **kwargs) -> CrawlResult:
    """Convenience/parity entry: collects the final seen set by default
    (the reference's ``Website`` keeps its visited set in memory).  The
    ``RayCrawler`` default is ``collect_seen=False`` — gathering every seen
    key to the driver is a whole-frontier materialization at 10^10 scale."""
    kwargs.setdefault("collect_seen", True)
    return RayCrawler(job, corpus_dir, **kwargs).run()
