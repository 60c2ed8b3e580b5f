"""Incremental curation — the end-to-end production composition a
continuously-crawled training corpus runs per ingest cycle (VERDICT r3 #6;
the 100-TB shape SURVEY §8's op catalog exists for):

    fresh batch (generation 2)
      → :func:`~spider_ray.ops.dedup.dedup_against_corpus` (drop docs whose
        text already exists in the ingested generation-1 reference)
      → :func:`~spider_ray.ops.dedup.cross_generation_drop_ids` fuzzy
        NEAR-dup anti-join (drop fresh docs with a confirmed MinHash-LSH
        pair into the reference — the pair spec is minhash_dedup over the
        union, shared with the ``near_dup_incremental`` golden)
      → C4 heuristic quality gate (``textstats.HeuristicFilter`` keep rule)
      → exact-dedup canonicalization WITHIN the surviving batch
        (hash-partition + min-id winner)
      → :func:`~spider_ray.ops.io.write_partitioned` resumable layout
        (one atomic directory per source)
      → read the landed partitions back.

The returned rows COME FROM DISK, so an oracle match proves the whole
chain INCLUDING the partitioned write.  Every stage is the production
operator, not a re-implementation: the reference side ships only text
hashes, the batch gate is per-doc map_batches, the canonical pass
shuffles (hash, id) pairs, and the write routes one source per writer
task.

Generations are derived deterministically from the documents table so the
DuckDB oracle can express the same split: generation 1 (already ingested)
= even ``doc_id``, generation 2 (fresh) = odd ``doc_id``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _split_generation(docs, parity: int):
    def pick(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pc.equal(
            pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
            pa.scalar(parity, pa.int64()),
        )
        return batch.filter(keep)

    return docs.map_batches(pick, batch_format="pyarrow")


def _quality_gate(ds, text_col: str = "text"):
    """C4 heuristic keep (textstats.HeuristicFilter gates), applied as a
    row filter so the surviving docs keep their payload columns."""
    from collections import Counter

    from ..ops.textstats import _TOKEN_RE

    def gate(batch: pa.Table) -> pa.Table:
        keep = []
        for t in batch.column(text_col).to_pylist():
            c = Counter(tok.lower() for tok in _TOKEN_RE.findall(t or ""))
            nw = sum(c.values())
            nd = len(c)
            mx = max(c.values()) if c else 0
            keep.append(10 <= nw <= 100000 and 2 * nd >= nw and 8 * mx <= nw)
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(gate, batch_format="pyarrow")


def incremental_curation(docs, out_dir: str, completed=None,
                         fuzzy: bool = True):
    """Run one ingest cycle over the deterministic generation split and
    return the curated rows ``(doc_id, source, n_tokens)`` READ BACK from
    the partitioned output at ``out_dir`` (module docstring).

    ``completed`` forwards to :func:`~spider_ray.ops.io.write_partitioned`
    — partition keys a previous (killed) run already landed.  ``fuzzy``
    (default on — the production chain) adds the cross-generation
    MinHash near-dup drop stage between exact reference dedup and the
    quality gate; the drop-id set stays a Dataset end to end (anti
    semi-join), no driver id sets."""
    import ray.data

    from ..ops.dedup import (
        cross_generation_drop_ids,
        dedup_against_corpus,
        exact_dedup,
    )
    from ..ops.io import write_partitioned
    from ..ops.joins import semi_join_ids
    from ..ops.textstats import _TOKEN_RE

    ref = _split_generation(docs, 0)
    fresh = _split_generation(docs, 1)

    survivors = dedup_against_corpus(fresh, ref)
    if fuzzy:
        survivors = semi_join_ids(
            survivors, cross_generation_drop_ids(docs),
            id_column="doc_id", anti=True,
        )
    quality = _quality_gate(survivors)

    # canonical winners within the surviving batch; quality was NOT
    # materialized, so re-derive it lazily on both branches (each side is
    # one pass over the pruned read — no driver state either way)
    kept_ids = exact_dedup(quality)
    canonical = semi_join_ids(quality, kept_ids, id_column="doc_id")

    def slim(batch: pa.Table) -> pa.Table:
        toks = [
            len(_TOKEN_RE.findall(t or ""))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "source": batch.column("source"),
                "n_tokens": pa.array(toks, pa.int64()),
            }
        )

    out_rows = canonical.map_batches(slim, batch_format="pyarrow")
    manifest = write_partitioned(out_rows, out_dir, by="source",
                                 completed=completed)
    manifest.materialize()  # drive every partition write before read-back
    # exact-file glob: only the atomically-renamed part.parquet files are
    # data — never directory-level inference that could pick up debris
    import glob as _glob
    import os as _os

    files = sorted(_glob.glob(_os.path.join(out_dir, "*", "part.parquet")))
    return ray.data.read_parquet(files).map_batches(
        lambda b: b.select(["doc_id", "source", "n_tokens"]),
        batch_format="pyarrow",
    )
