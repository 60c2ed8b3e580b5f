"""Corpus-level n-gram statistics (top-k frequent bigrams).

Classic webtext analysis (contamination checks, boilerplate discovery,
vocabulary induction).  Shape for 100 TB: the per-batch combiner collapses
each batch to its local ``(bigram, n)`` partial counts — the groupby
shuffle moves vocabulary-bounded partials, never tokens — then one small
global sort/limit on the aggregated counts.  Ties at the k boundary break
on the bigram string so the result is deterministic.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"\S+")


class BigramPartials:
    """Per-batch ``(bigram, n)`` partial counts over lowercased
    whitespace tokens."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column(self.text_col).to_pylist():
            toks = TOKEN_RE.findall(t.lower())
            counts.update(map(" ".join, zip(toks, toks[1:])))
        if not counts:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        grams, ns = zip(*counts.items())
        return pa.table({"bigram": pa.array(grams, pa.string()),
                         "n": pa.array(ns, pa.int64())})


def bigram_topk(docs, k: int = 100, text_col: str = "text"):
    """Top-``k`` corpus bigrams as ``(bigram, n)``, count desc / bigram asc."""
    partials = docs.map_batches(BigramPartials(text_col), batch_format="pyarrow")
    agg = partials.groupby("bigram").sum("n")
    out = agg.map_batches(
        lambda b: pa.table(
            {"bigram": b.column("bigram"), "n": pc.cast(b.column("sum(n)"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    # k is small: the sort+limit runs over (vocab-size) aggregated rows only.
    return out.sort(["n", "bigram"], descending=[True, False]).limit(k)


def zipf_slope(docs, k: int = 1000, text_col: str = "text"):
    """Zipf rank-frequency fit over the corpus's top-``k`` terms:
    one row ``(n_terms, slope_r6)`` where slope is the least-squares
    slope of ``ln(count)`` on ``ln(rank)`` (ranks 1-based by
    ``count desc, term asc`` — the deterministic heavy-hitter order).

    Term counts fold through the usual combiner→groupby (shuffle carries
    vocabulary-bounded partials); the top-``k`` cut keeps the regression
    input bounded at ANY corpus size (the tail vocabulary — ≈|corpus|
    grams at web scale — never reaches the driver).  The regression runs
    on ``k`` points driver-side; both sides round to 6 decimals.
    """

    class TermPartials:
        def __init__(self):
            self.re = TOKEN_RE

        def __call__(self, batch: pa.Table) -> pa.Table:
            counts: Counter = Counter()
            for t in batch.column(text_col).to_pylist():
                counts.update(self.re.findall(t.lower()))
            if not counts:
                return pa.table({"term": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            terms, ns = zip(*counts.items())
            return pa.table({"term": pa.array(terms, pa.string()),
                             "n": pa.array(ns, pa.int64())})

    import numpy as np
    import ray.data

    agg = (
        docs.map_batches(TermPartials, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("term")
        .sum("n")
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        t = pa.table({"term": batch.column("term"),
                      "n": pc.cast(batch.column("sum(n)"), pa.int64())})
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("term", "ascending")]
        )
        return t.take(idx.slice(0, min(k, len(idx))))

    parts = [
        b for b in agg.map_batches(block_topk, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.table({"n_terms": pa.array([], pa.int64()),
                      "slope_r6": pa.array([], pa.float64())})
        )
    merged = pa.concat_tables(parts)
    idx = pc.sort_indices(
        merged, sort_keys=[("n", "descending"), ("term", "ascending")]
    )
    top = merged.take(idx.slice(0, min(k, len(idx))))
    n = np.asarray(top.column("n"), dtype=np.float64)
    rk = np.arange(1, len(n) + 1, dtype=np.float64)
    lx, ly = np.log(rk), np.log(n)
    m = len(n)
    denom = m * np.sum(lx * lx) - np.sum(lx) ** 2
    slope = float((m * np.sum(lx * ly) - np.sum(lx) * np.sum(ly)) / denom) if denom else 0.0
    return ray.data.from_arrow(
        pa.table({"n_terms": pa.array([m], pa.int64()),
                  "slope_r6": pa.array([round(slope, 6)], pa.float64())})
    )
