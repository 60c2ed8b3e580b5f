"""Exact distributed heavy hitters (frequent n-grams) via mergeable
Misra-Gries summaries + a candidate recount — the textbook two-pass
pattern that stays EXACT at any scale with O(1/φ) memory everywhere.

``heavy_hitter_ngrams`` reports every n-gram whose corpus count ``c``
satisfies ``c * inv_phi >= T`` (``T`` = total n-gram occurrences; the
comparison is pure-integer so the engine and the SQL oracle agree bit for
bit).  Why not just ``groupby(gram).sum``?  At web scale the n-gram
vocabulary is ~|corpus| (most grams are hapax) — the aggregate would
shuffle and hold billions of keys to answer a question about the top few
thousand.  The sketch path never materialises the tail:

1. **Pass 1 (summaries)**: each batch counts its grams exactly, then
   compresses to a Misra-Gries summary of ``capacity`` entries (subtract
   the (capacity+1)-th largest count, drop ≤0).  Summaries — never raw
   grams — shuffle by ``summary_id & 63`` so each of the 64 merge groups
   folds whole summaries (count-sum then re-compress, the Agarwal et al.
   mergeable-summaries merge, preserving the global error bound
   ``undercount <= T / capacity``).  The driver folds the 64 survivors —
   bounded at ``64 * capacity`` rows regardless of corpus size.
2. **Guarantee**: any gram with true count ``>= T / inv_phi`` survives
   every merge as long as ``capacity > inv_phi`` (checked at call time),
   so the candidate set has NO false negatives; false positives are
   harmless because of
3. **Pass 2 (recount)**: the ≤``capacity`` candidates broadcast once via
   ``ray.put``; each batch recounts ONLY candidate grams (exact partials,
   vocabulary bounded by ``capacity``), one tiny groupby sums them, and
   the integer threshold filter runs against the exact ``T`` folded from
   pass-1 sentinel rows.

Batch totals ride along as null-gram sentinel rows so ``T`` is exact
without a separate pass.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"\S+")

_EMPTY = pa.table(
    {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
)


def _gram_counts(texts, n: int) -> Counter:
    counts: Counter = Counter()
    for t in texts:
        toks = TOKEN_RE.findall((t or "").lower())
        counts.update(
            map(" ".join, zip(*(toks[i:] for i in range(n))))
        )
    return counts


def _compress_mg(grams: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra-Gries compression: keep at most ``capacity`` entries by
    subtracting the (capacity+1)-th largest count from all."""
    if len(grams) <= capacity:
        return grams, counts
    # value of the (capacity+1)-th largest count
    kth = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    kept = counts - kth
    mask = kept > 0
    return grams[mask], kept[mask]


class _SummaryPartials:
    """Per-batch exact count -> MG(capacity) summary + a null-gram
    sentinel row carrying the batch's exact gram total."""

    def __init__(self, text_col: str, n: int, capacity: int):
        import os

        self.text_col = text_col
        self.n = n
        self.capacity = capacity
        # seed per-actor so concurrent actors' first summaries spread over
        # all 64 merge groups (a 0 start would cluster them on part 0);
        # routing only — merged output is identical for any seed
        self.next_id = (os.getpid() * 40503) & 63

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = _gram_counts(batch.column(self.text_col).to_pylist(), self.n)
        total = sum(counts.values())
        if counts:
            grams = np.array(list(counts.keys()), dtype=object)
            ns = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
            grams, ns = _compress_mg(grams, ns, self.capacity)
        else:
            grams, ns = np.array([], dtype=object), np.array([], dtype=np.int64)
        sid = self.next_id
        self.next_id += 1
        return pa.table(
            {
                "gram": pa.array(list(grams) + [None], pa.string()),
                "n": pa.array(list(ns) + [total], pa.int64()),
                # whole summaries must merge as units -> group by summary id,
                # never by gram
                "part": pa.array([sid & 63] * (len(grams) + 1), pa.int64()),
            }
        )


def _merge_group(group: pa.Table, capacity: int) -> pa.Table:
    """Merge all summaries in one group: per-gram count sum, then one MG
    re-compression; sentinel totals fold to a single null row."""
    is_sent = pc.is_null(group.column("gram"))
    total = pc.sum(group.filter(is_sent).column("n")).as_py() or 0
    real = group.filter(pc.invert(is_sent))
    agg = (
        real.select(["gram", "n"]).group_by(["gram"]).aggregate([("n", "sum")])
    )
    grams = np.array(agg.column("gram").to_pylist(), dtype=object)
    ns = agg.column("n_sum" if "n_sum" in agg.column_names else "sum(n)").to_numpy(
        zero_copy_only=False
    )
    grams, ns = _compress_mg(grams, ns.astype(np.int64), capacity)
    return pa.table(
        {
            "gram": pa.array(list(grams) + [None], pa.string()),
            "n": pa.array(list(ns) + [total], pa.int64()),
        }
    )


class _CandidateRecount:
    """Pass-2 exact recount restricted to the broadcast candidate set."""

    def __init__(self, cand_ref, text_col: str, n: int):
        import ray

        cands = cand_ref if isinstance(cand_ref, frozenset) else ray.get(cand_ref)
        self.cands: frozenset = cands
        self.text_col = text_col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = _gram_counts(batch.column(self.text_col).to_pylist(), self.n)
        hits = {g: c for g, c in counts.items() if g in self.cands}
        if not hits:
            return _EMPTY
        grams, ns = zip(*hits.items())
        return pa.table(
            {"gram": pa.array(grams, pa.string()), "n": pa.array(ns, pa.int64())}
        )


def heavy_hitter_ngrams(
    docs,
    n: int = 3,
    inv_phi: int = 5000,
    capacity: int = 8192,
    text_col: str = "text",
):
    """``(gram, n)`` — every word ``n``-gram with count ``c`` such that
    ``c * inv_phi >= T`` (T = total n-gram occurrences), EXACT counts.

    ``capacity`` must exceed ``inv_phi`` for the no-false-negative
    guarantee (MG undercount < T/capacity < T/inv_phi <= any hitter's
    count).  ``docs`` is consumed twice (summary pass + recount pass) —
    both streaming, nothing corpus-sized is ever held anywhere.
    """
    import ray

    if capacity <= inv_phi:
        raise ValueError(
            f"capacity ({capacity}) must exceed inv_phi ({inv_phi}) for the "
            "exactness guarantee"
        )

    summaries = docs.map_batches(
        _SummaryPartials,
        fn_constructor_args=(text_col, n, capacity),
        batch_format="pyarrow",
        concurrency=(1, 64),
        num_cpus=0.5,
    )
    merged = (
        summaries.groupby("part")
        .map_groups(lambda g: _merge_group(g, capacity), batch_format="pyarrow")
    )

    # driver fold: <= 64 * (capacity + 1) rows by construction
    total = 0
    fold: Counter = Counter()
    for b in merged.iter_batches(batch_format="pyarrow"):
        for g, c in zip(b.column("gram").to_pylist(), b.column("n").to_pylist()):
            if g is None:
                total += c
            else:
                fold[g] += c
    grams = np.array(list(fold.keys()), dtype=object)
    ns = np.fromiter(fold.values(), dtype=np.int64, count=len(fold))
    grams, _ = _compress_mg(grams, ns, capacity)
    cand_ref = ray.put(frozenset(grams))

    from ..poolsize import autoscale_pool

    exact = docs.map_batches(
        _CandidateRecount,
        fn_constructor_args=(cand_ref, text_col, n),
        batch_format="pyarrow",
        concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )
    agg = exact.groupby("gram").sum("n")
    thresh = pa.scalar(int(total), pa.int64())
    return agg.map_batches(
        lambda b: (
            lambda t: t.filter(
                pc.greater_equal(
                    pc.multiply(t.column("n"), pa.scalar(inv_phi, pa.int64())), thresh
                )
            )
        )(
            pa.table(
                {"gram": b.column("gram"), "n": pc.cast(b.column("sum(n)"), pa.int64())}
            )
        ),
        batch_format="pyarrow",
    )
