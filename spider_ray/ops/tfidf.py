"""TF-IDF top terms per document.

Two execution modes behind one result contract (bit-identical outputs):

**broadcast** (repeated vocabularies that fit a worker heap): per-batch
combiner emits partial ``(term, df)`` counts, one vocab-bounded
``groupby(term)`` folds them, and the df >= 2 map broadcasts via
``ray.put`` — exact by hapax elision (a missing term has df == 1).

**cogroup** (the 100-TB path — repeated vocabulary of ~10⁸-10⁹ terms
would be a multi-GB driver dict): NO vocabulary ever folds to the
driver.  Docs explode to one slim ``(doc_id, term, tf)`` row per
distinct term per doc; ONE shuffle keyed by ``hash(term)`` co-locates
every occurrence of a term, so the partition computes exact df locally
and scores its rows; a second slim shuffle keyed by ``hash(doc_id)``
ranks each doc's terms and keeps the top ``k``.  Driver state: O(1).

``mode="auto"`` (default) counts the repeated vocabulary distributedly
(an O(1)-driver ``count()``) and picks broadcast below
``broadcast_max_terms``, cogroup above.

Scoring: per-doc ``tf · idf`` with the smoothed formula
``idf = ln((1+N)/(1+df)) + 1`` (the sklearn convention), top-``k`` ties
broken by term string ascending.  Both modes evaluate ``ln`` through
C-double ``math.log`` on each DISTINCT df value (the cogroup partition
maps distinct dfs through the same scalar call), so values compare
exactly across modes and against the sequential golden — no distributed
float accumulation anywhere; scores are per-row products.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
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


def repeated_term_df_map(docs, text_col: str = "text",
                         df_tbl=None) -> dict[str, int]:
    """Broadcastable DF map holding ONLY terms with ``df >= 2``.

    Exact-by-elision: every term in a document has df >= 1 by definition,
    so a term absent from this map has df == 1 exactly — the scorer
    substitutes 1 and the tf·idf value is unchanged.  On web corpora
    hapax legomena are the bulk of the vocabulary (Heaps'-law tail), so
    this cuts the broadcast from O(vocab) to O(repeated vocab) with zero
    approximation.  (For a BOUNDED driver at extreme vocabularies use
    ``mode="cogroup"`` in :func:`tfidf_top_terms` — exact with O(1)
    driver state.)  ``df_tbl`` reuses an already-materialized
    :func:`doc_frequencies` Dataset."""
    import ray

    if df_tbl is None:
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


def term_hash_parts(terms: pa.ChunkedArray | pa.Array, nparts: int) -> pa.Array:
    """Coarse partition id for a STRING term column: polars' vectorized
    64-bit hash (within-run deterministic — the repo's string shuffle-key
    convention) fed through the shared int mixer."""
    import polars as pl

    from .behavior import coarse_part

    col = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    h = pl.from_arrow(col).hash(seed=0x7F1D_0001).reinterpret(signed=True).to_arrow()
    return coarse_part(h.cast(pa.int64()), nparts)


def _segment_ranks(keys: np.ndarray) -> np.ndarray:
    """1-based rank within each run of equal values in a SORTED int array."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, np.int64)
    pos = np.arange(n, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    seg_start = np.maximum.accumulate(np.where(new, pos, 0))
    return pos - seg_start + 1


def _tfidf_cogroup(docs, k: int, text_col: str, id_col: str, min_df: int,
                   n_docs: int):
    """Term-hash-partitioned tf·idf (module docstring, cogroup mode)."""
    from ..poolsize import coarse_fanout
    from .behavior import coarse_part

    tparts = coarse_fanout(floor=256, per_cpu=8)
    dparts = coarse_fanout()
    fallback_df = min_df - 1

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, terms_out, tf_out = [], [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            tf = Counter(TOKEN_RE.findall((t or "").lower()))
            ids_out.extend([i] * len(tf))
            terms_out.extend(tf.keys())
            tf_out.extend(tf.values())
        t = pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "term": pa.array(terms_out, pa.string()),
                "tf": pa.array(tf_out, pa.int64()),
            }
        )
        return t.append_column("tpart", term_hash_parts(t.column("term"), tparts))

    def score_partition(group: pa.Table) -> pa.Table:
        # exact df locally: the explode emits ONE row per (doc, distinct
        # term) and the term-hash routes every row of a term here, so
        # df(term) == row count per term in this partition
        t = group.select(["doc_id", "term", "tf"])
        terms = t.column("term")
        enc = pc.dictionary_encode(terms.combine_chunks())
        codes = np.asarray(enc.indices, dtype=np.int64)
        df_per_code = np.bincount(codes, minlength=len(enc.dictionary))
        df_v = df_per_code[codes]
        df_eff = np.where(df_v >= min_df, df_v, fallback_df)
        # ln over DISTINCT df values through the SAME scalar math.log the
        # broadcast scorer uses — bit-identical idf across modes
        uniq, inv = np.unique(df_eff, return_inverse=True)
        idf_u = np.array(
            [math.log((1 + n_docs) / (1 + int(d))) + 1.0 for d in uniq],
            dtype=np.float64,
        )
        score = t.column("tf").to_numpy(zero_copy_only=False) * idf_u[inv]
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": terms,
                "score": pa.array(score, pa.float64()),
            }
        )
        return out.append_column(
            "dpart", coarse_part(out.column("doc_id"), dparts)
        )

    def topk_partition(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("doc_id", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ],
        )
        t = group.take(idx)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        rank = _segment_ranks(ids)
        keep = rank <= k
        t = t.append_column("rank", pa.array(rank, pa.int64())).filter(
            pa.array(keep)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "term": t.column("term"),
                "rank": t.column("rank"),
                "score": pc.round(t.column("score"), ndigits=9),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("tpart")
        .map_groups(score_partition, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(topk_partition, batch_format="pyarrow")
    )


def tfidf_top_terms(docs, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id", concurrency: int = 4,
                    min_df: int = 2, mode: str = "auto",
                    broadcast_max_terms: int = 2_000_000):
    """``(doc_id, term, rank, score)`` — top-``k`` tf·idf terms per doc;
    ``rank`` is 1-based, ``score`` rounded to 9 decimals.

    ``mode``: ``"broadcast"`` ships the df >= 2 map via ``ray.put`` (exact
    by hapax elision); ``"cogroup"`` is the term-hash-partitioned path
    with O(1) driver state (module docstring); ``"auto"`` counts the
    repeated vocabulary distributedly and picks broadcast iff it is at
    most ``broadcast_max_terms``.  All modes produce bit-identical rows.

    In broadcast mode the df table is pruned to terms with
    ``df >= min_df``; a missing term scores with ``df = min_df - 1``.  At
    the default ``min_df=2`` this is EXACT (a term absent from the map
    has df exactly 1 — see :func:`repeated_term_df_map`); ``min_df > 2``
    additionally bounds the broadcast but over-weights terms with
    ``1 < df < min_df`` (approximate, caller's trade — the cogroup path
    applies the same substitution so modes agree for every ``min_df``)."""
    import ray

    n_docs = docs.count()
    if mode == "cogroup":
        return _tfidf_cogroup(docs, k, text_col, id_col, min_df, n_docs)
    if mode == "auto":
        df_tbl = doc_frequencies(docs, text_col).materialize()
        n_repeated = df_tbl.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("df"), 2))
            if "df" in b.column_names else b.slice(0, 0),
            batch_format="pyarrow",
        ).count()
        if n_repeated > broadcast_max_terms:
            return _tfidf_cogroup(docs, k, text_col, id_col, min_df, n_docs)
        df_map = repeated_term_df_map(docs, text_col, df_tbl=df_tbl)
    else:
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
