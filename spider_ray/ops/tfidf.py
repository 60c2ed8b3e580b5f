"""TF-IDF top terms per document.

Two-phase, shuffle-light shape:

1. **Document frequency**: per-batch combiner emits each batch's partial
   ``(term, df)`` counts over *distinct* terms per doc; one vocab-bounded
   ``groupby(term)`` shuffle sums them.  Partitioning assumption
   (documented): the aggregated vocabulary fits on the driver/workers —
   true for natural-language vocabularies (10⁵-10⁷ terms); beyond that,
   bucket terms by hash and score per bucket.
2. **Scoring**: the df table broadcasts once via ``ray.put``; each actor
   computes per-doc ``tf · idf`` with the smoothed formula
   ``idf = ln((1+N)/(1+df)) + 1`` (the sklearn convention) and keeps the
   top-``k`` terms, ties broken by term string ascending.

Scores use C-double ``math.log`` identically in the engine and the
sequential golden, so values compare exactly (no distributed float
accumulation anywhere — scores are per-row products).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"\S+")


class DocFreqPartials:
    """Per-batch ``(term, df)`` partials — each doc contributes each of its
    distinct (lowercased) terms once."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch.column(self.text_col).to_pylist():
            counts.update(set(TOKEN_RE.findall((t or "").lower())))
        if not counts:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        terms, dfs = zip(*counts.items())
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array(dfs, pa.int64())})


def doc_frequencies(docs, text_col: str = "text"):
    """Aggregated ``(term, df)`` Dataset (one vocab-bounded shuffle)."""
    partials = docs.map_batches(DocFreqPartials(text_col), batch_format="pyarrow")
    agg = partials.groupby("term").sum("df")
    return agg.map_batches(
        lambda b: pa.table(
            {"term": b.column("term"), "df": pc.cast(b.column("sum(df)"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _top_terms_for(text: str, df: dict[str, int], n_docs: int, k: int,
                   fallback_df: int = 1):
    """``fallback_df`` is the df assumed for terms absent from the (pruned)
    map — 1 under the exact hapax-elision scheme."""
    tf = Counter(TOKEN_RE.findall((text or "").lower()))
    scored = [
        (t, c * (math.log((1 + n_docs) / (1 + df.get(t, fallback_df))) + 1.0))
        for t, c in tf.items()
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def repeated_term_df_map(docs, text_col: str = "text") -> dict[str, int]:
    """Broadcastable DF map holding ONLY terms with ``df >= 2``.

    Exact-by-elision: every term in a document has df >= 1 by definition,
    so a term absent from this map has df == 1 exactly — the scorer
    substitutes 1 and the tf·idf value is unchanged.  On web corpora
    hapax legomena are the bulk of the vocabulary (Heaps'-law tail), so
    this cuts the broadcast from O(vocab) to O(repeated vocab) with zero
    approximation.  (For a truly bounded broadcast at extreme vocabularies,
    raise ``min_df`` in :func:`tfidf_top_terms` — approximate above the
    elision threshold, documented there.)"""
    import ray

    df_tbl = doc_frequencies(docs, text_col).materialize()
    df_map: dict[str, int] = {}
    for part in ray.get(df_tbl.to_arrow_refs()):
        # high-parallelism groupby emits empty partitions with an EMPTY
        # schema — skip them before touching columns
        if part.num_rows == 0 or "term" not in part.column_names:
            continue
        terms = part.column("term").to_pylist()
        dfs = part.column("df").to_pylist()
        df_map.update((t, c) for t, c in zip(terms, dfs) if c >= 2)
    return df_map


def tfidf_top_terms(docs, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id", concurrency: int = 4,
                    min_df: int = 2):
    """``(doc_id, term, rank, score)`` — top-``k`` tf·idf terms per doc;
    ``rank`` is 1-based, ``score`` rounded to 9 decimals.

    The broadcast DF table is pruned to terms with ``df >= min_df``; a
    missing term scores with ``df = min_df - 1``.  At the default
    ``min_df=2`` this is EXACT (a term absent from the map has df exactly
    1 — see :func:`repeated_term_df_map`); ``min_df > 2`` additionally
    bounds the broadcast at extreme vocabularies but over-weights terms
    with ``1 < df < min_df`` (approximate, caller's trade)."""
    import ray

    n_docs = docs.count()
    df_map = repeated_term_df_map(docs, text_col)
    if min_df > 2:
        df_map = {t: c for t, c in df_map.items() if c >= min_df}
    fallback_df = min_df - 1
    df_ref = ray.put(df_map)

    class _Score:
        def __init__(self):
            self.df = ray.get(df_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids_out, terms_out, ranks_out, scores_out = [], [], [], []
            for i, t in zip(
                batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
            ):
                for r, (term, score) in enumerate(
                    _top_terms_for(t, self.df, n_docs, k, fallback_df), start=1
                ):
                    ids_out.append(i)
                    terms_out.append(term)
                    ranks_out.append(r)
                    scores_out.append(round(score, 9))
            return pa.table(
                {
                    "doc_id": pa.array(ids_out, pa.int64()),
                    "term": pa.array(terms_out, pa.string()),
                    "rank": pa.array(ranks_out, pa.int64()),
                    "score": pa.array(scores_out, pa.float64()),
                }
            )

    return docs.map_batches(
        _Score, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )
