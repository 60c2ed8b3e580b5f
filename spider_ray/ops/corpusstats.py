"""Corpus-statistics operators: exact per-group quantiles, per-language
heavy-hitter terms, inverted-index posting lists, and benchmark
decontamination.

Scale shapes (100 TB):

* ``group_quantiles`` never sorts the data — it folds each batch to a
  ``(group, value) -> count`` histogram, shuffles ONLY the histogram
  partials (bounded by ``n_groups x distinct values``, not by row count)
  and selects exact ranks from the cumulative counts on the driver.
* ``top_terms_per_group`` is the combiner-then-shuffle heavy-hitter
  pattern: per-batch partial counts collapse each batch to its local
  vocabulary before the one ``groupby().sum`` exchange; the per-group
  top-k runs over vocabulary-bounded aggregates.
* ``posting_lists`` emits per-document DISTINCT ``(term, doc_id)`` pairs
  (a doc lives in one batch, so per-doc dedup is global dedup) and builds
  each posting inside ``groupby(term).map_groups``; the emitted posting is
  capped at ``max_ids`` ids so a stopword-frequency term cannot
  materialize an unbounded string (``df`` still counts all of them).
* ``decontaminate`` is the broadcast-small-side pattern: the benchmark
  n-gram set (an eval set is tiny by construction) is built once, shipped
  via ``ray.put`` and read per actor in ``__init__`` — never per batch;
  the corpus streams through an actor-pool membership check.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

TOKEN_RE = re.compile(r"\S+")


# ---------------------------------------------------------------------------
# exact per-group quantiles (histogram fold)
# ---------------------------------------------------------------------------


def group_quantiles(
    ds,
    group_col: str = "lang",
    value_col: str = "n_chars",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    q_names: tuple[str, ...] = ("p50", "p90", "p99"),
) -> pa.Table:
    """Exact per-group quantiles of an integer column.

    Quantile definition matches DuckDB ``quantile_disc``: the value at
    1-based rank ``ceil(q * n)`` of the sorted group (verified against
    DuckDB empirically).  The shuffle moves only ``(group, value, count)``
    histogram rows; the final fold runs over the (small) histogram.
    """
    hist = ds.select_columns([group_col, value_col]).groupby([group_col, value_col]).count()
    parts = ray.get(hist.materialize().to_arrow_refs())
    if not parts:
        return pa.table(
            {group_col: pa.array([], pa.string())}
            | {name: pa.array([], pa.int64()) for name in q_names}
        )
    tbl = pa.concat_tables(parts, promote_options="default")
    # null group keys / null values carry no rank information — drop them
    # (mirrors SQL: NULLs are excluded from quantile_disc aggregation)
    tbl = tbl.filter(
        pc.and_(pc.is_valid(tbl.column(group_col)), pc.is_valid(tbl.column(value_col)))
    )
    groups = tbl.column(group_col).to_pylist()
    values = tbl.column(value_col).to_numpy(zero_copy_only=False)
    counts = tbl.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)

    per_group: dict[str, list[tuple[int, int]]] = {}
    for g, v, c in zip(groups, values, counts):
        per_group.setdefault(g, []).append((int(v), int(c)))

    out_rows: dict[str, list] = {group_col: []}
    for name in q_names:
        out_rows[name] = []
    for g in sorted(per_group):
        pairs = sorted(per_group[g])
        vals = np.array([p[0] for p in pairs], dtype=np.int64)
        cum = np.cumsum([p[1] for p in pairs])
        n = int(cum[-1])
        out_rows[group_col].append(g)
        for q, name in zip(qs, q_names):
            rank = max(1, math.ceil(q * n))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out_rows[name].append(int(vals[idx]))
    return pa.table(
        {group_col: pa.array(out_rows[group_col], pa.string())}
        | {name: pa.array(out_rows[name], pa.int64()) for name in q_names}
    )


# ---------------------------------------------------------------------------
# per-group heavy-hitter terms
# ---------------------------------------------------------------------------


class _TermPartials:
    """Per-batch ``(group, term, n)`` partial counts over lowercased
    whitespace tokens — the combiner that keeps the shuffle
    vocabulary-bounded."""

    def __init__(self, group_col: str, text_col: str):
        self.group_col = group_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for g, t in zip(
            batch.column(self.group_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            for tok in TOKEN_RE.findall((t or "").lower()):
                counts[(g, tok)] += 1
        if not counts:
            return pa.table(
                {
                    "grp": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        gs, terms = zip(*counts.keys())
        return pa.table(
            {
                "grp": pa.array(gs, pa.string()),
                "term": pa.array(terms, pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )


def top_terms_per_group(ds, group_col: str = "lang", text_col: str = "text", k: int = 10):
    """Top-``k`` terms per group by count; ties break on the term string.
    Output: ``(lang, term, n, rank)`` with rank 1..k."""
    partials = ds.map_batches(_TermPartials(group_col, text_col), batch_format="pyarrow")
    agg = partials.groupby(["grp", "term"]).sum("n")

    def _topk(tbl: pa.Table) -> pa.Table:
        n = pc.cast(tbl.column("sum(n)"), pa.int64())
        tbl = tbl.set_column(tbl.schema.get_field_index("sum(n)"), "n", n)
        order = pc.sort_indices(
            tbl, sort_keys=[("n", "descending"), ("term", "ascending")]
        )
        top = tbl.take(order[:k])
        return pa.table(
            {
                group_col: top.column("grp"),
                "term": top.column("term"),
                "n": top.column("n"),
                "rank": pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64)),
            }
        )

    return agg.groupby("grp").map_groups(_topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# inverted-index posting lists
# ---------------------------------------------------------------------------


class _PostingPartials:
    """Per-batch posting combiner: per term, the batch-local document
    frequency and the ``max_ids`` SMALLEST doc ids (the global smallest-k
    of a union is the smallest-k of per-part smallest-ks, so capping per
    batch is lossless).  The shuffle then moves ``term x n_batches`` rows
    instead of ``term x n_docs`` — the difference between an inverted
    index that shuffles postings and one that shuffles the corpus."""

    def __init__(self, text_col: str, id_col: str, max_ids: int):
        self.text_col = text_col
        self.id_col = id_col
        self.max_ids = max_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for did, t in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.text_col).to_pylist(),
        ):
            for tok in set(TOKEN_RE.findall((t or "").lower())):
                acc.setdefault(tok, []).append(did)
        terms = sorted(acc)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df_part": pa.array([len(acc[t]) for t in terms], pa.int64()),
                "ids_part": pa.array(
                    [sorted(acc[t])[: self.max_ids] for t in terms],
                    pa.list_(pa.int64()),
                ),
            }
        )


def posting_lists(
    ds, text_col: str = "text", id_col: str = "doc_id", max_ids: int = 100
):
    """Inverted index: per term, document frequency + the first ``max_ids``
    doc ids (ascending) serialized as a comma-joined string.  ``df`` counts
    ALL documents; only the emitted posting is capped, so a
    stopword-frequency term cannot materialize an unbounded row.  Per-batch
    combiner partials (df + capped smallest-ids) keep the shuffle at
    ``term x n_batches`` rows; a doc lives in one batch, so partial dfs sum
    exactly."""
    partials = ds.map_batches(
        _PostingPartials(text_col, id_col, max_ids), batch_format="pyarrow"
    )

    def _merge(tbl: pa.Table) -> pa.Table:
        df = int(pc.sum(tbl.column("df_part")).as_py())
        ids = np.sort(
            np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in tbl.column("ids_part").to_pylist()]
            )
        )[:max_ids]
        return pa.table(
            {
                "term": pa.array([tbl.column("term")[0].as_py()], pa.string()),
                "df": pa.array([df], pa.int64()),
                "posting": pa.array([",".join(map(str, ids))], pa.string()),
            }
        )

    return partials.groupby("term").map_groups(_merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-group ranking (the ROW_NUMBER window primitive)
# ---------------------------------------------------------------------------


def group_rank(
    ds,
    group_col: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Per-group dense row numbering: rank 1..n within each group ordered by
    ``(value DESC, id ASC)`` — the SQL ``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v DESC, id)`` window as one ``groupby(group).map_groups``
    shuffle of only the three needed columns.  Same partitioning assumption
    as every map_groups op here (one group's (id, value) pairs fit one
    worker: 16 bytes/row).  Output ``(id, group, value, rank)``."""

    def per_group(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        vals = tbl.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -vals))
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                group_col: tbl.column(group_col).take(order),
                value_col: pa.array(vals[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(ids) + 1, dtype=np.int64)),
            }
        )

    return (
        ds.select_columns([id_col, group_col, value_col])
        .groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# within-doc repetition stats (Gopher repetition signals)
# ---------------------------------------------------------------------------


class RepetitionStats:
    """Per-document duplicate word-bigram mass — the Gopher-style
    "fraction of characters in duplicate n-grams" repetition signal, kept
    in integer space: ``n_bigrams`` (total bigram occurrences) and
    ``n_dup_bigrams`` (occurrences of bigrams appearing >= 2x in the doc).
    Pure per-row map — embarrassingly parallel, no shuffle."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_total: list[int] = []
        n_dup: list[int] = []
        for t in batch.column(self.text_col).to_pylist():
            toks = TOKEN_RE.findall((t or "").lower())
            counts = Counter(zip(toks, toks[1:]))
            tot = sum(counts.values())
            dup = sum(k for k in counts.values() if k > 1)
            n_total.append(tot)
            n_dup.append(dup)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "n_bigrams": pa.array(n_total, pa.int64()),
                "n_dup_bigrams": pa.array(n_dup, pa.int64()),
            }
        )


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """``(doc_id, n_bigrams, n_dup_bigrams)`` for every document (docs with
    fewer than two tokens report zeros)."""
    return ds.select_columns([id_col, text_col]).map_batches(
        RepetitionStats(text_col, id_col), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

# hard ceiling on the driver-assembled benchmark gram set (modulo path only;
# ~50M grams × ~40 B ≈ 2 GB — past this the input wasn't an eval set)
_MAX_DRIVER_GRAMS = 50_000_000


def _word_ngrams(text: str, n: int) -> set[str]:
    toks = TOKEN_RE.findall((text or "").lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class _Decontaminator:
    """Actor-pool membership check against the broadcast benchmark n-gram
    set (``ray.put`` once, deserialized per actor in ``__init__``)."""

    def __init__(self, bench_ref, text_col: str, id_col: str, n: int, bench_mod: int):
        self.bench: set[str] = ray.get(bench_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.bench_mod = bench_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.bench_mod:  # 0 = external eval set, no corpus rows excluded
            ids = np.asarray(batch.column(self.id_col).combine_chunks(), dtype=np.int64)
            batch = batch.filter(pa.array(ids % self.bench_mod != 0))
        bench = self.bench
        flags = [
            not _word_ngrams(t, self.n).isdisjoint(bench)
            for t in batch.column(self.text_col).to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "contaminated": pa.array(flags, pa.bool_()),
            }
        )


def decontaminate(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bench_mod: int = 97,
    concurrency: int | tuple[int, int] = (2, 8),
    bench_texts: list[str] | None = None,
):
    """Flag corpus documents sharing any word ``n``-gram with the benchmark
    split (``doc_id % bench_mod == 0`` — the deterministic stand-in for an
    eval set).  The classic train/test contamination check (e.g. GPT-3
    appendix C / PaLM-style 13-gram overlap, here n is configurable).

    Broadcast-side sizing: the pattern assumes the benchmark side is a
    genuinely SMALL external eval set (real decontamination runs against
    fixed benchmarks — at most millions of grams).  The modulo split here
    exists so the SQL oracle can replay the whole op on synthetic data; a
    corpus-fraction bench side does NOT scale (its gram set grows with the
    corpus) — at 100 TB, pass the eval set in as the small side rather than
    deriving it from the corpus.

    ``bench_texts`` is that production path: pass the external eval set's
    documents directly and EVERY corpus doc is checked against them (no
    modulo split; ``bench_mod`` is ignored for splitting).

    Returns ``(doc_id, contaminated)`` for every NON-benchmark document.
    """
    if bench_texts is not None:
        grams: set[str] = set()
        for t in bench_texts:
            grams |= _word_ngrams(t, n)
        bench_ref = ray.put(grams)
        return ds.map_batches(
            _Decontaminator,
            # bench_mod=0 sentinel: no corpus rows are benchmark rows
            fn_constructor_args=(bench_ref, text_col, id_col, n, 0),
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    def _grams_of(batch: pa.Table) -> pa.Table:
        # vectorized benchmark-split mask (no per-row python filter stage)
        ids = np.asarray(batch.column(id_col).combine_chunks(), dtype=np.int64)
        bench = batch.filter(pa.array(ids % bench_mod == 0))
        grams: set[str] = set()
        for t in bench.column(text_col).to_pylist():
            grams |= _word_ngrams(t, n)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    gram_parts = ray.get(
        ds.select_columns([id_col, text_col])
        .map_batches(_grams_of, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    bench_grams: set[str] = set()
    for part in gram_parts:
        bench_grams.update(part.column("g").to_pylist())
        if len(bench_grams) > _MAX_DRIVER_GRAMS:
            # the modulo path is the SQL-oracle-replayable form; a bench
            # side this large means it was derived from a corpus-scale
            # input — fail loudly instead of driver-OOMing (use
            # bench_texts= with a real, small eval set at scale)
            raise ValueError(
                f"decontaminate: benchmark gram set exceeded {_MAX_DRIVER_GRAMS:,} "
                "entries — the modulo split is for oracle replay on small "
                "fixtures; at scale pass the eval set via bench_texts="
            )
    bench_ref = ray.put(bench_grams)

    return ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(bench_ref, text_col, id_col, n, bench_mod),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def length_trim(ds, group_col: str = "lang", value_col: str = "n_chars",
                id_col: str = "doc_id", q_lo: float = 0.05, q_hi: float = 0.95,
                concurrency: int = 4):
    """Per-group percentile outlier trim: keep rows whose ``value_col``
    lies within the group's ``[q_lo, q_hi]`` ``quantile_disc`` band — the
    standard length-outlier removal of corpus curation (truncated pages
    and boilerplate megadocs sit in the tails of the per-language length
    distribution).

    Composes the ``group_quantiles`` histogram fold (shuffle carries only
    ``(group, value, count)`` rows) with a broadcast band filter: the
    per-group ``(lo, hi)`` edges — one row per group — ship once via
    ``ray.put`` and every batch filters locally.  Returns
    ``(id, group, value)`` for survivors.
    """
    edges = group_quantiles(
        ds, group_col=group_col, value_col=value_col, qs=(q_lo, q_hi),
        q_names=("lo", "hi"),
    )
    emap = {
        g: (lo, hi)
        for g, lo, hi in zip(
            edges.column(group_col).to_pylist(),
            edges.column("lo").to_pylist(),
            edges.column("hi").to_pylist(),
        )
    }
    edges_ref = ray.put(emap)

    class Trim:
        def __init__(self):
            self.edges = ray.get(edges_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            gs = batch.column(group_col).to_pylist()
            vs = batch.column(value_col).to_numpy(zero_copy_only=False)
            keep = pa.array(
                [
                    g in self.edges and self.edges[g][0] <= v <= self.edges[g][1]
                    for g, v in zip(gs, vs)
                ],
                pa.bool_(),
            )
            t = batch.filter(keep)
            return pa.table(
                {
                    id_col: t.column(id_col),
                    group_col: t.column(group_col),
                    value_col: t.column(value_col),
                }
            )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        Trim, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )


def source_overlap(ds, n: int = 3, text_col: str = "text",
                   source_col: str = "source"):
    """Cross-source contamination matrix: ``(source_a, source_b,
    n_shared)`` — how many DISTINCT word ``n``-grams each unordered source
    pair has in common (``source_a < source_b``).  The report a curation
    pipeline reads before trusting per-source dedup boundaries.

    Scale shape: per-batch DISTINCT ``(gram, source)`` partials (set
    semantics collapse in-batch repeats), ONE shuffle keyed by
    ``hash(gram)`` co-locates every holder of a gram, and the partition
    re-dedups then generates per-gram source pairs with run-length
    segments vectorized BY SEGMENT LENGTH (sources are bounded — tens —
    so lengths are tiny and each length class is one numpy gather; no
    per-gram Python).  Only ``(pair, count)`` partials leave a partition;
    the final fold is <= C(sources, 2) rows.
    """
    from itertools import combinations

    from ..poolsize import coarse_fanout
    from .tfidf import term_hash_parts
    from .textstats import _TOKEN_RE

    nparts = coarse_fanout(floor=256, per_cpu=8)

    def partials(batch: pa.Table) -> pa.Table:
        seen: set[tuple[str, str]] = set()
        for src, t in zip(
            batch.column(source_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            toks = [w.lower() for w in _TOKEN_RE.findall(t or "")]
            for i in range(len(toks) - n + 1):
                seen.add((" ".join(toks[i : i + n]), src))
        if not seen:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "src": pa.array([], pa.string()),
                    "part": pa.array([], pa.int64()),
                }
            )
        grams, srcs = zip(*seen)
        g_arr = pa.array(grams, pa.string())
        return pa.table(
            {
                "g": g_arr,
                "src": pa.array(srcs, pa.string()),
                "part": term_hash_parts(g_arr, nparts),
            }
        )

    def pair_partition(group: pa.Table) -> pa.Table:
        t = (
            group.select(["g", "src"])
            .group_by(["g", "src"])
            .aggregate([])  # global distinct: the gram-hash routing makes it so
        )
        enc = pc.dictionary_encode(t.column("g").combine_chunks())
        codes = np.asarray(enc.indices, dtype=np.int64)
        src = np.asarray(t.column("src"))
        order = np.lexsort((src, codes))
        codes, src = codes[order], src[order]
        m = len(codes)
        if m == 0:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        new = np.ones(m, dtype=bool)
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        lengths = np.diff(np.append(starts, m))
        out_a, out_b = [], []
        # vectorize by segment LENGTH: sources per gram are bounded (tens),
        # so each length class is one gather over all its segments
        for L in np.unique(lengths):
            if L < 2:
                continue
            S = starts[lengths == L]
            ai, bi = zip(*combinations(range(int(L)), 2))
            ai = np.asarray(ai, dtype=np.int64)
            bi = np.asarray(bi, dtype=np.int64)
            out_a.append(src[(S[:, None] + ai[None, :]).ravel()])
            out_b.append(src[(S[:, None] + bi[None, :]).ravel()])
        if not out_a:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        t2 = pa.table(
            {
                "source_a": pa.array(a, pa.string()),
                "source_b": pa.array(b, pa.string()),
                "n_shared": pa.nulls(len(a), pa.int64()).fill_null(1),
            }
        )
        return (
            t2.group_by(["source_a", "source_b"])
            .aggregate([("n_shared", "sum")])
            .rename_columns(["source_a", "source_b", "n_shared"])
        )

    rolled = (
        ds.select_columns([source_col, text_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_partition, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .sum("n_shared")
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "source_a": b.column("source_a"),
                "source_b": b.column("source_b"),
                "n_shared": pc.cast(b.column("sum(n_shared)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def token_percentiles(ds, text_col: str = "text", id_col: str = "doc_id",
                      source_col: str = "source"):
    """Within-source percentile rank of every doc's token count —
    the normalization step that makes quality thresholds comparable
    ACROSS sources (a p10 web doc and a p10 books doc filter alike even
    though their raw length distributions differ by orders of magnitude).

    Integer-exact spec (ties share the min rank, SQL ``rank()``):
    ``pct_x1e6 = (rank - 1) · 1e6 // n_source``.

    Scale shape: one slim tokenize pass folds a ``(source, n_tokens,
    count)`` HISTOGRAM (distinct token counts are bounded — thousands —
    regardless of corpus size), the per-source cumulative-below table
    broadcasts once via ``ray.put``, and a second pass assigns ranks by
    vectorized ``searchsorted`` — no per-doc shuffle, no window sort.
    """
    import ray

    from .textstats import _TOKEN_RE

    def slim(batch: pa.Table) -> pa.Table:
        toks = np.fromiter(
            (len(_TOKEN_RE.findall(t or "")) for t in
             batch.column(text_col).to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        t = pa.table(
            {
                "source": batch.column(source_col),
                "n_tokens": pa.array(toks, pa.int64()),
                "n": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
            }
        )
        return (
            t.group_by(["source", "n_tokens"]).aggregate([("n", "sum")])
            .rename_columns(["source", "n_tokens", "n"])
        )

    hist = (
        ds.select_columns([source_col, text_col])
        .map_batches(slim, batch_format="pyarrow")
        .groupby(["source", "n_tokens"])
        .sum("n")
    )
    # the histogram is O(sources × distinct counts) — dimension-class
    cum: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    acc: dict[str, list] = {}
    for b in hist.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "source" not in b.column_names:
            continue
        for s, v, c in zip(
            b.column("source").to_pylist(),
            b.column("n_tokens").to_pylist(),
            b.column("sum(n)").to_pylist(),
        ):
            acc.setdefault(s, []).append((int(v), int(c)))
    for s, rows in acc.items():
        rows.sort()
        vals = np.array([v for v, _ in rows], dtype=np.int64)
        cnts = np.array([c for _, c in rows], dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        cum[s] = (vals, below, int(cnts.sum()))
    cum_ref = ray.put(cum)

    class _Assign:
        def __init__(self):
            self.cum = ray.get(cum_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = np.fromiter(
                (len(_TOKEN_RE.findall(t or "")) for t in
                 batch.column(text_col).to_pylist()),
                dtype=np.int64, count=batch.num_rows,
            )
            srcs = batch.column(source_col).to_pylist()
            pct = np.empty(batch.num_rows, dtype=np.int64)
            for i, (s, v) in enumerate(zip(srcs, toks)):
                vals, below, n = self.cum[s]
                j = int(np.searchsorted(vals, v))
                pct[i] = (int(below[j]) * 1_000_000) // n
            return pa.table(
                {
                    "doc_id": pc.cast(batch.column(id_col), pa.int64()),
                    "source": batch.column(source_col),
                    "n_tokens": pa.array(toks, pa.int64()),
                    "pct_x1e6": pa.array(pct, pa.int64()),
                }
            )

    from ..poolsize import autoscale_pool

    return ds.select_columns([id_col, source_col, text_col]).map_batches(
        _Assign, batch_format="pyarrow", concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )
