"""Token-window document chunking — the context-length splitter that sits
between curation and sequence packing in a training-data pipeline.

``chunk_documents`` slices every doc's whitespace-token stream into
overlapping windows: chunk ``i`` covers tokens
``[i*stride, i*stride + chunk_tokens)`` for every ``i`` with
``i*stride < n_tokens`` (so a doc shorter than one window still yields
exactly one chunk, and zero-token docs yield none).  With
``stride < chunk_tokens`` consecutive chunks overlap by
``chunk_tokens - stride`` tokens — the standard LM-pretraining window
overlap that keeps context across chunk boundaries.

Ray Data shape: stateless vectorizable ``map_batches`` flat expansion —
row-local, shuffle-free, embarrassingly parallel at 100 TB; output volume
is ~``chunk_tokens/stride`` × the corpus token stream.  Tokens are the
repo-wide ``\\S+`` convention (``ops/textstats.py``), so the DuckDB oracle
replays the split with ``regexp_extract_all`` + list slicing exactly.

The reference engine stops at page text extraction (spider/src/page.rs
``text`` transform); chunking is one of the training-data operator
families this Ray Data graft adds on top.
"""

from __future__ import annotations

import re

import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")


def chunk_documents(ds, chunk_tokens: int = 64, stride: int = 48,
                    text_column: str = "text", id_column: str = "doc_id"):
    """``(doc_id, chunk_id, n_tokens, chunk_text)`` — one row per token
    window (see module docstring for the pinned window spec).

    ``chunk_text`` re-joins the window's tokens with single spaces
    (token-space chunking: original whitespace runs are not preserved —
    the downstream tokenizer re-splits anyway, and it keeps the oracle an
    exact ``array_to_string`` replay).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        ids, cids, ntoks, texts = [], [], [], []
        for doc_id, t in zip(
            batch.column(id_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            toks = TOKEN_RE.findall(t or "")
            n = len(toks)
            i = 0
            while i * stride < n:
                piece = toks[i * stride : i * stride + chunk_tokens]
                ids.append(doc_id)
                cids.append(i)
                ntoks.append(len(piece))
                texts.append(" ".join(piece))
                i += 1
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cids, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
            }
        )

    return ds.select_columns([id_column, text_column]).map_batches(
        chunks, batch_format="pyarrow"
    )
