"""BM25 relevance scoring of every document against a fixed query-term
set — the classic IR ranking function (Robertson/Spärck Jones), used in
training-data pipelines for targeted corpus selection (e.g. "score the
whole crawl against a topic query, keep the top slice").

Determinism contract (oracle-exact): every per-(doc, term) contribution
is computed from integers (``tf``, ``df``, ``dl``, ``N``) plus two shared
doubles (``avgdl = Σdl / N`` and the literal ``k1``/``b`` constants),
rounded HALF-AWAY to int64 micro-units, and the doc score is the int64
sum of its term contributions — so distributed order cannot perturb the
result and DuckDB replays the identical expression tree:

    idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)
    w(d, t)   = idf(t) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b*dl/avgdl))
    score(d)  = Σ_t  round(w(d, t) * 1e6)

Ray Data shape (two passes, no shuffle of document payloads):

1. ONE ``map_batches`` combiner emits per-batch partial ``df`` counts for
   the query terms plus tagged ``N`` / ``Σdl`` rows; a ``groupby(term)``
   folds them — the shuffle carries ``|terms| + 2`` rows per batch.
2. The (tiny) stats fold is broadcast via ``ray.put`` and an actor-pool
   scoring pass computes ``tf``/``dl`` doc-locally.  At 100 TB the
   broadcast is ``O(|query terms|)`` — independent of corpus size.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")

# tagged rows that ride the same (term, n) fold as the df counts; NUL
# prefix cannot collide with a real whitespace-delimited token
_DOCS_KEY = "\x00docs"
_TOKENS_KEY = "\x00tokens"


def _round_i64(x: float) -> int:
    """SQL round() parity: half away from zero."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def bm25_scores(ds, query_terms, k1: float = 1.2, b: float = 0.75,
                text_column: str = "text", id_column: str = "doc_id",
                concurrency: int = 4):
    """``(doc_id, bm25_x1e6)`` for every doc (0 when no query term occurs).

    ``query_terms`` are matched as lowercase whole ``\\S+`` tokens (the
    repo-wide tokenizer convention).
    """
    import ray

    qset = list(query_terms)

    def stats(batch: pa.Table) -> pa.Table:
        from collections import Counter

        dfc: Counter = Counter()
        n_docs = 0
        dl_sum = 0
        for t in batch.column(text_column).to_pylist():
            toks = [x.lower() for x in TOKEN_RE.findall(t or "")]
            n_docs += 1
            dl_sum += len(toks)
            present = set(toks)
            for q in qset:
                if q in present:
                    dfc[q] += 1
        terms = qset + [_DOCS_KEY, _TOKENS_KEY]
        vals = [dfc.get(q, 0) for q in qset] + [n_docs, dl_sum]
        return pa.table(
            {"term": pa.array(terms, pa.string()), "n": pa.array(vals, pa.int64())}
        )

    folded = (
        ds.map_batches(stats, batch_format="pyarrow").groupby("term").sum("n").take_all()
    )
    fmap = {r["term"]: r["sum(n)"] for r in folded}
    n_docs = int(fmap.pop(_DOCS_KEY, 0) or 0)
    total_tokens = int(fmap.pop(_TOKENS_KEY, 0) or 0)
    if n_docs == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], pa.int64()), "bm25_x1e6": pa.array([], pa.int64())}
            )
        )
    avgdl = total_tokens / n_docs
    stats_ref = ray.put((fmap, n_docs, avgdl))

    class Scorer:
        def __init__(self):
            self.df, self.n, self.avgdl = ray.get(stats_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, scores = [], []
            for doc_id, t in zip(
                batch.column(id_column).to_pylist(),
                batch.column(text_column).to_pylist(),
            ):
                toks = [x.lower() for x in TOKEN_RE.findall(t or "")]
                dl = len(toks)
                s = 0
                for q in qset:
                    tf = toks.count(q)
                    if tf == 0:
                        continue
                    df = self.df.get(q, 0)
                    idf = math.log((self.n - df + 0.5) / (df + 0.5) + 1.0)
                    w = idf * (tf * (k1 + 1.0)) / (
                        tf + k1 * (1.0 - b + b * dl / self.avgdl)
                    )
                    s += _round_i64(w * 1e6)
                ids.append(doc_id)
                scores.append(s)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "bm25_x1e6": pa.array(scores, pa.int64()),
                }
            )

    return ds.select_columns([id_column, text_column]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )
