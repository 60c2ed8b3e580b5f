"""Per-document token-distribution Shannon entropy — a curation signal
orthogonal to the repetition/LM scores in ``ops/textstats``: machine-
generated and template text has low entropy for its length, keyword-stuffed
spam has anomalously high entropy.  (Used alongside Gopher-style filters;
see e.g. the C4/Gopher filtering literature.)

Determinism contract (oracle-exact): each distinct term's contribution
``round(-(p * ln p) * 1e9)`` (half away from zero, ``p = c/n`` from two
int64s) is an int64, and the doc entropy is their integer sum — immune to
accumulation order, replayed exactly by DuckDB over the same ``\\S+``
lowercase tokenization.

Ray Data shape: stateless shuffle-free ``map_batches``; everything is
doc-local (the entropy of a doc needs no corpus statistics), so the op is
embarrassingly parallel at any scale.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")


def _round_i64(x: float) -> int:
    """SQL round() parity: half away from zero."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def token_entropy(ds, text_column: str = "text", id_column: str = "doc_id"):
    """``(doc_id, n_tokens, n_distinct, entropy_x1e9)`` per doc; empty docs
    score ``(0, 0, 0)``."""

    def ent(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, ntoks, ndist, ents = [], [], [], []
        for doc_id, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            toks = [x.lower() for x in TOKEN_RE.findall(t or "")]
            n = len(toks)
            c = Counter(toks)
            h = 0
            for term in c:
                p = c[term] / n
                h += _round_i64(-(p * math.log(p)) * 1e9)
            ids.append(doc_id)
            ntoks.append(n)
            ndist.append(len(c))
            ents.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "n_distinct": pa.array(ndist, pa.int64()),
                "entropy_x1e9": pa.array(ents, pa.int64()),
            }
        )

    return ds.select_columns([id_column, text_column]).map_batches(
        ent, batch_format="pyarrow"
    )
