"""Deterministic sampling for training-data curation.

A 100-TB corpus is down-sampled per stratum (language, source, quality
band) with *reproducible* membership: the keep decision is a pure function
of the row key, so re-runs, resumed runs and the SQL oracle all agree with
no RNG state to ship.  The hash is Knuth's multiplicative scheme
``(key * 2654435761) mod 2^32`` — trivially expressible in ANSI SQL, well
mixed for sequential ids, and independent of Python's seeded RNGs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = 2654435761
MOD = 1 << 32


def _bucket(keys: np.ndarray) -> np.ndarray:
    return (keys.astype(np.uint64) * KNUTH) % MOD


def shard_shuffle(ds, n_shards: int = 8, key_col: str = "doc_id"):
    """Deterministic corpus shuffle into training shards.

    Every row gets ``shuffle_key = knuth(key)``; a global ``sort`` on
    ``(shuffle_key, key)`` produces the reproducible permutation, then each
    sorted block is enumerated REMOTELY with its global offset (driver holds
    only the per-block row counts) — ``pos`` is the row's position in the
    shuffled order and ``shard = pos % n_shards`` round-robins rows into
    equal shards.  One wide op (the sort); no RNG state; identical output
    every run, resumable by construction.  Returns
    ``(key, shard, pos)`` as a Dataset.
    """
    import ray
    import ray.data

    def keyed(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "shuffle_key": pa.array(_bucket(k).astype(np.int64), pa.int64()),
            }
        )

    slim = ds.map_batches(keyed, batch_format="pyarrow")
    ordered = slim.sort(["shuffle_key", key_col]).materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def _rows(t: pa.Table) -> int:
        return t.num_rows

    lens = ray.get([_rows.remote(r) for r in refs])

    @ray.remote
    def _enumerate(t: pa.Table, offset: int) -> pa.Table:
        pos = np.arange(t.num_rows, dtype=np.int64) + offset
        return pa.table(
            {
                key_col: t.column(key_col),
                "shard": pa.array(pos % n_shards, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    out_refs, offset = [], 0
    for r, n in zip(refs, lens):
        if n == 0:  # empty sort partitions may carry an empty schema
            continue
        out_refs.append(_enumerate.remote(r, offset))
        offset += n
    if not out_refs:
        return ray.data.from_arrow(
            pa.table({key_col: pa.array([], pa.int64()),
                      "shard": pa.array([], pa.int64()),
                      "pos": pa.array([], pa.int64())})
        )
    return ray.data.from_arrow_refs(out_refs)


def stratified_sample(ds, rates: dict[str, float], key_col: str = "doc_id",
                      stratum_col: str = "lang"):
    """Keep each row iff ``hash(key) < rate[stratum] * 2^32``; strata absent
    from ``rates`` are dropped.  Pure ``map_batches`` filter — no shuffle,
    no driver state; scales by construction."""
    thresholds = {s: int(r * MOD) for s, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        h = _bucket(batch.column(key_col).to_numpy(zero_copy_only=False))
        strata = batch.column(stratum_col).to_pylist()
        lim = np.fromiter(
            (thresholds.get(s, 0) for s in strata), dtype=np.uint64, count=len(strata)
        )
        return batch.filter(pa.array(h < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


def dataset_split(ds, key_col: str = "doc_id",
                  pct: tuple[int, int] = (80, 10)):
    """Deterministic train/val/test assignment: ``bucket = knuth(key) %
    100``; train < pct[0], val < pct[0]+pct[1], test otherwise.  Pure
    per-row map (no shuffle, no RNG state) — membership is reproducible
    across re-runs, resumes and the SQL oracle.  Returns
    ``(key, split)`` with split in {train, val, test}."""
    train_lim, val_lim = pct[0], pct[0] + pct[1]

    def label(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        b = _bucket(k) % 100
        lab = np.where(b < train_lim, "train", np.where(b < val_lim, "val", "test"))
        return pa.table(
            {key_col: batch.column(key_col), "split": pa.array(lab.tolist(), pa.string())}
        )

    return ds.map_batches(label, batch_format="pyarrow")


def class_balance(ds, class_col: str = "lang", key_col: str = "doc_id",
                  per_class: int | None = None):
    """Deterministic class balancing: keep the ``n`` lowest-``(hash, key)``
    rows of every class, where ``n`` = ``per_class`` or the minority-class
    size.  The rank runs inside ``groupby(class).map_groups`` — one shuffle
    of (class, key) pairs only; a class's rows never leave their group, and
    the keep set is a pure function of the keys (SQL window replay).
    Partitioning assumption (documented, like ``sessionize``): one class's
    ``(key, hash)`` pairs fit in one group worker — 16 bytes/row, so ~10⁹
    rows/class per 16 GB heap; beyond that, pick the keep set with
    ``stratified_sample`` (rate = n/count) instead of an exact rank.

    Returns ``(key, class)`` for kept rows."""
    if per_class is not None:
        n_keep = per_class
    else:
        counts_ds = ds.select_columns([class_col]).groupby(class_col).count()
        n_keep = min(r["count()"] for r in counts_ds.take_all())

    pairs = ds.select_columns([key_col, class_col])

    def per_class_rank(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key_col).to_numpy(zero_copy_only=False)
        h = _bucket(k)
        order = np.lexsort((k, h))[:n_keep]
        return pa.table(
            {
                key_col: pa.array(k[order], pa.int64()),
                class_col: pa.array([tbl.column(class_col)[0].as_py()] * len(order),
                                    pa.string()),
            }
        )

    return pairs.groupby(class_col).map_groups(per_class_rank, batch_format="pyarrow")


def source_mix(ds, weights_x100: dict[str, int], default_x100: int = 100,
               key_col: str = "doc_id", source_col: str = "source"):
    """Weighted per-source repetition — the data-mixing pass that turns a
    raw corpus into a training mixture (upweight books/wiki, downweight
    low-quality web; the Pile / LLaMA "epochs per source" recipe).

    Weights are integer hundredths (250 = 2.5 epochs) so the fractional
    keep decision is exact in both engines: a doc gets ``w // 100`` full
    copies plus one more iff ``knuth(key) < (w % 100) * 2^32 / 100`` —
    the same reproducible membership hash as ``stratified_sample``, so a
    2.5-weight source repeats every doc twice and a deterministic half of
    them a third time.  Shuffle-free stateless ``map_batches`` (np.repeat
    on the batch); emits ``(key, source, copy_id)`` — downstream training
    shards consume copies like ordinary rows.  At 100 TB the op is pure
    row-local expansion with output volume = Σ weights, no driver state.
    """

    def expand(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(batch.column(source_col))
        w = np.full(len(k), default_x100, dtype=np.int64)
        for s, wx in weights_x100.items():
            w[src == s] = wx
        n = w // 100 + (_bucket(k) < (w % 100).astype(np.uint64) * MOD // 100)
        reps = n.astype(np.int64)
        ends = np.cumsum(reps)
        copy_id = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - reps, reps
        )
        return pa.table(
            {
                key_col: pa.array(np.repeat(k, reps), pa.int64()),
                source_col: pa.array(np.repeat(src, reps), pa.string()),
                "copy_id": pa.array(copy_id, pa.int64()),
            }
        )

    return ds.select_columns([key_col, source_col]).map_batches(
        expand, batch_format="pyarrow"
    )


def global_sample_k(ds, k: int, key_col: str = "doc_id"):
    """Exactly-``k`` deterministic global sample — the corpus-wide sibling
    of ``stratified_sample`` when the requirement is a fixed COUNT, not a
    rate (eval-set carve-outs, pilot batches, human-review draws).

    The sample is the ``k`` smallest rows by ``(knuth(key), key)`` — a
    pure order statistic of the reproducible hash, so membership is
    stable across runs, partitionings and engines.  Distributed shape:
    each batch keeps only its own ``k`` smallest candidates (a combiner —
    no batch can contribute more than ``k`` global winners), then one
    ``sort + limit`` over the pruned partials.  The wide op sees at most
    ``k × n_batches`` 16-byte rows, never the corpus; at 100 TB with
    k=10⁴ that is megabytes.  Returns ``(key,)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = _bucket(keys)
        order = np.lexsort((keys, h))[:k]
        return pa.table(
            {
                key_col: pa.array(keys[order], pa.int64()),
                "h": pa.array(h[order].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.select_columns([key_col]).map_batches(partial, batch_format="pyarrow")
    out = parts.sort(["h", key_col]).limit(k)
    return out.map_batches(lambda b: b.select([key_col]), batch_format="pyarrow")


def host_cap(corpus_dir: str, cap: int = 20):
    """Domain balancing: keep at most ``cap`` pages per host, chosen as the
    lexicographically-first ``cap`` URLs — the Gopher/FineWeb "domain cap"
    hygiene step that stops one mega-host from dominating a web corpus.
    Returns ``(host, url, rank)`` with ``rank`` = 1..cap in URL order; the
    SQL replay is a plain ROW_NUMBER window.

    Scale shape (contrast with ``class_balance``, which shuffles every
    (class, key) row): a vectorized per-batch combiner keeps only each
    batch's first ``cap`` URLs per host BEFORE the shuffle, so a host with
    10⁶ pages contributes ``cap`` rows per batch, not 10⁶, to the
    ``groupby(host)`` — the same bounded-contribution argument as
    ``global_sample_k``.  The group stage re-sorts the ≤ cap×n_batches
    survivors and emits the global first ``cap``.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    from .textclean import _hosts_of

    pages = ray.data.read_parquet(corpus_dir, columns=["url"])

    def local_cap(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        t = pa.table({"host": _hosts_of(urls), "url": urls})
        idx = pc.sort_indices(
            t, sort_keys=[("host", "ascending"), ("url", "ascending")]
        )
        t = t.take(idx)
        hs = t.column("host").to_numpy(zero_copy_only=False)
        if len(hs) == 0:
            return t
        starts = np.flatnonzero(np.concatenate(([True], hs[1:] != hs[:-1])))
        lens = np.diff(np.concatenate((starts, [len(hs)])))
        pos = np.arange(len(hs), dtype=np.int64) - np.repeat(starts, lens)
        return t.filter(pa.array(pos < cap))

    def group_cap(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group.column("url"))[:cap]
        g = group.take(idx)
        return pa.table(
            {
                "host": g.column("host"),
                "url": g.column("url"),
                "rank": pa.array(np.arange(1, len(g) + 1), pa.int64()),
            }
        )

    return (
        pages.map_batches(local_cap, batch_format="pyarrow")
        .groupby("host")
        .map_groups(group_cap, batch_format="pyarrow")
    )


def token_budget_trim(docs, budget_tokens: int = 5_000,
                      key_col: str = "doc_id", source_col: str = "source",
                      text_col: str = "text", n_buckets: int = 4096):
    """Per-source token-budget gate — keep each source's docs in ascending
    ``doc_id`` order while the source's RUNNING token total stays within
    ``budget_tokens`` (a doc is kept iff its whole count fits).  Returns
    ``(source, n_docs_kept, n_tokens_kept, last_doc_id)``.

    This is the distributed ORDERED PREFIX SUM (scan) pattern — the keep
    decision for a doc depends on every smaller-id doc of its source:

    1. slim pass: per-batch ``(bucket = doc_id·K >> S, source, tokens)``
       partials (text never leaves the batch fn);
    2. the (sources × ``n_buckets``) bucket-total table folds on the
       driver — BOUNDED state at any corpus size — and turns into
       exclusive per-source bucket prefixes, broadcast once;
    3. second slim pass shuffles ``(doc_id, source, tokens)`` by id
       bucket (uniform by construction — the bucket is a hash of the id,
       ordered-prefix correctness needs only that every smaller-id doc
       land in a lower-or-equal bucket, so the bucket is ``doc_id``
       RANGE, not hash); each bucket task sorts its ids, adds its
       broadcast prefix offset, applies the gate vectorized, and emits a
       per-source partial.

    One slim shuffle, driver state O(sources × buckets).  The SQL twin is
    ``sum(tok) OVER (PARTITION BY source ORDER BY doc_id) <= budget``.
    """
    import ray

    from .textstats import _TOKEN_RE

    # bucket by doc_id RANGE: need max id to scale buckets; ids are assumed
    # dense-ish int64 — use a cheap first pass max (slim column read)
    id_max = 0
    for b in docs.select_columns([key_col]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if b.num_rows:
            id_max = max(id_max, pc.max(b.column(key_col)).as_py())
    width = max(1, (id_max + n_buckets) // n_buckets)

    class _Slim:
        def __init__(self):
            self.re = _TOKEN_RE

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            toks = np.fromiter(
                (len(self.re.findall(t or "")) for t in
                 batch.column(text_col).to_pylist()),
                dtype=np.int64, count=len(ids),
            )
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "source": batch.column(source_col),
                    "tok": pa.array(toks, pa.int64()),
                    "bucket": pa.array(ids // width, pa.int64()),
                }
            )

    from ..poolsize import autoscale_pool

    slim = docs.select_columns([key_col, source_col, text_col]).map_batches(
        _Slim, batch_format="pyarrow", concurrency=autoscale_pool(1), num_cpus=0.5
    ).materialize()

    # pass 1: bucket totals -> driver exclusive prefixes per source
    def bucket_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["source", "bucket", "tok"])
            .group_by(["source", "bucket"]).aggregate([("tok", "sum")])
            .rename_columns(["source", "bucket", "tok"])
        )

    totals: dict[tuple[str, int], int] = {}
    for b in slim.map_batches(bucket_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for s, bk, tk in zip(b.column("source").to_pylist(),
                             b.column("bucket").to_pylist(),
                             b.column("tok").to_pylist()):
            totals[(s, bk)] = totals.get((s, bk), 0) + tk
    prefixes: dict[tuple[str, int], int] = {}
    run: dict[str, int] = {}
    for s, bk in sorted(totals):
        prefixes[(s, bk)] = run.get(s, 0)
        run[s] = run.get(s, 0) + totals[(s, bk)]
    pref_ref = ray.put(prefixes)

    def gate(group: pa.Table) -> pa.Table:
        pref = ray.get(pref_ref)
        idx = pc.sort_indices(
            group, sort_keys=[("source", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(idx)
        srcs = g.column("source").to_numpy(zero_copy_only=False)
        ids = np.asarray(g.column("doc_id"))
        toks = np.asarray(g.column("tok"))
        bks = np.asarray(g.column("bucket"))
        out_src, out_docs, out_toks, out_last = [], [], [], []
        starts = np.flatnonzero(
            np.concatenate(([True], srcs[1:] != srcs[:-1]))
        ) if len(srcs) else np.array([], dtype=np.int64)
        lens = np.diff(np.concatenate((starts, [len(srcs)])))
        for st, ln in zip(starts, lens):
            s = srcs[st]
            sl = slice(st, st + ln)
            cum = np.cumsum(toks[sl]) + pref.get((s, int(bks[st])), 0)
            keep = cum <= budget_tokens
            if keep.any():
                out_src.append(s)
                out_docs.append(int(keep.sum()))
                out_toks.append(int(toks[sl][keep].sum()))
                out_last.append(int(ids[sl][keep].max()))
        return pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "n_docs_kept": pa.array(out_docs, pa.int64()),
                "n_tokens_kept": pa.array(out_toks, pa.int64()),
                "last_doc_id": pa.array(out_last, pa.int64()),
            }
        )

    import ray.data

    # per-bucket partials are ≤ sources × buckets rows — driver fold is tiny
    agg: dict[str, list[int]] = {}
    for b in slim.groupby("bucket").map_groups(
        gate, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for s, nd, nt, ld in zip(
            b.column("source").to_pylist(), b.column("n_docs_kept").to_pylist(),
            b.column("n_tokens_kept").to_pylist(), b.column("last_doc_id").to_pylist(),
        ):
            cur = agg.setdefault(s, [0, 0, -1])
            cur[0] += nd
            cur[1] += nt
            cur[2] = max(cur[2], ld)
    srcs = sorted(agg)
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "n_docs_kept": pa.array([agg[s][0] for s in srcs], pa.int64()),
                "n_tokens_kept": pa.array([agg[s][1] for s in srcs], pa.int64()),
                "last_doc_id": pa.array([agg[s][2] for s in srcs], pa.int64()),
            }
        )
    )


def temperature_mix(ds, alpha: float = 0.5, budget: int = 5000,
                    key_col: str = "doc_id", source_col: str = "source"):
    """Temperature-weighted source mixing — the multilingual α-sampling
    recipe (sample source i with probability ∝ n_i^α; α < 1 upweights
    small sources): per-source targets derive from the corpus counts and
    the expansion reuses :func:`source_mix`'s exact fractional-epoch
    machinery, emitting ``(doc_id, source, copy_id)``.

    Integer-exact weight spec (shared bit-for-bit with the SQL oracle):
    ``a_i = round_half_away(n_i^α · 1e6)`` (the ONLY float op — C libm
    ``pow`` on both engines), ``S = Σ a_i`` (exact int),
    ``w_i(×100 epochs) = (budget · a_i · 100) // (S · n_i)``.
    Per-source counts fold through one slim distributed
    ``groupby(source).count`` — sources are bounded (tens), so the
    driver holds O(sources) rows; everything after is stateless row-local
    expansion.
    """
    import math

    counts = {
        r[source_col]: int(r["count()"])
        for r in ds.groupby(source_col).count().take_all()
    }
    a = {
        s: int(math.floor(math.pow(n, alpha) * 1e6 + 0.5))
        for s, n in counts.items()
    }
    S = sum(a.values())
    weights_x100 = {
        s: (budget * a[s] * 100) // (S * n) for s, n in counts.items()
    }
    return source_mix(ds, weights_x100, default_x100=0,
                      key_col=key_col, source_col=source_col)


def weighted_sample_k(ds, k: int = 100, key_col: str = "doc_id",
                      text_col: str = "text"):
    """Deterministic weight-proportional sample WITHOUT replacement —
    Efraimidis–Spirakis A-ES over a reproducible uniform: each doc draws
    ``u = ((knuth(id) mod 2³²) + 1) / (2³² + 1)`` and ranks by
    ``u^(1/w)`` with ``w`` = its whitespace token count (longer docs
    proportionally likelier); the global top-``k`` keys ARE the sample.
    RNG-free (the repo's Knuth-hash membership convention), so the SQL
    oracle evaluates the identical ``power()`` expression.

    Scale shape: keys are row-local; each block emits its top-``k``
    partial and the shared
    :func:`~spider_ray.ops.topkfold.fold_partial_topk` merges the
    O(blocks·k) slim rows on the driver — a GLOBAL top-k has no group
    key to co-group by, and the per-block cap already bounds the fold.
    Returns ``(doc_id, n_tokens, rank)`` ordered by the sampling key.
    """
    from .textstats import _TOKEN_RE
    from .topkfold import fold_partial_topk

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = np.fromiter(
            (len(_TOKEN_RE.findall(t or "")) for t in
             batch.column(text_col).to_pylist()),
            dtype=np.int64, count=len(ids),
        )
        w = np.maximum(toks, 1)  # zero-token docs sample as weight 1
        u = ((_bucket(ids).astype(np.float64)) + 1.0) / float((1 << 32) + 1)
        key = u ** (1.0 / w)
        sel = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "n_tokens": pa.array(toks[sel], pa.int64()),
                "key": pa.array(key[sel], pa.float64()),
            }
        )

    partials = ds.select_columns([key_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = fold_partial_topk(
        partials, k, [("key", "descending"), ("doc_id", "ascending")]
    )
    return folded.select(["doc_id", "n_tokens", "rank"])
