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
