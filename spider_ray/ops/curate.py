"""End-to-end corpus curation: the composed training-data pipeline.

The flagship "what a 100-TB webtext user actually runs" chain, wired from
the individual operators in this package:

1. **Quality filter** — Gopher-style integer stats (`ops/textclean`),
   drop docs failing the keep rules.
2. **Exact dedup** — hash-partition by text hash, keep the min doc_id of
   each identical-text group (`groupby(text_hash).min`).
3. **Near-dup removal** — MinHash+LSH verified pairs → connected
   components (`ops/dedup.near_dup_clusters`); only each cluster's
   representative (min doc_id) survives.
4. **Stratified sampling** — deterministic per-lang down-sampling
   (`ops/sampling`, Knuth hash — RNG-free).
5. **Token accounting** — final (doc_id, lang, n_tokens) manifest.

Stage order matters and is part of the spec: quality first (cheapest,
biggest cut), exact dedup before near-dup (shrinks the pair-generation
input), sampling last (rates apply to the deduped population).  Every
stage is a Dataset transform; the only driver-side state is the near-dup
drop set (O(cluster members), not O(corpus)) broadcast via ``ray.put``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .textclean import GopherQuality

TOKEN_RE = re.compile(r"\S+")


def curate_corpus(docs, rates: dict[str, float], near_dup_threshold: float = 0.5):
    """``(doc_id, lang, n_tokens)`` for the curated survivor set."""
    import ray

    from ..hashing import stable_hash_str
    from .dedup import near_dup_clusters
    from .sampling import stratified_sample

    gq = GopherQuality()

    def quality_pass(batch: pa.Table) -> pa.Table:
        keep = gq(batch).column("keep")
        return batch.filter(keep)

    kept = docs.map_batches(quality_pass, batch_format="pyarrow")

    # exact dedup: min doc_id per text hash (one groupby of (hash, id))
    def hashed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_hash": pa.array(
                    [stable_hash_str(t) for t in batch.column("text").to_pylist()],
                    pa.uint64(),
                ),
                "doc_id": batch.column("doc_id"),
            }
        )

    winners_ds = (
        kept.map_batches(hashed, batch_format="pyarrow")
        .groupby("text_hash")
        .min("doc_id")
    )
    winner_ids: set[int] = set()
    for part in ray.get(winners_ds.materialize().to_arrow_refs()):
        if part.num_rows == 0 or "min(doc_id)" not in part.column_names:
            continue
        winner_ids.update(part.column("min(doc_id)").to_pylist())

    class _IdFilter:
        def __init__(self, ref):
            self.keep = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            return batch.filter(pa.array([i in self.keep for i in ids]))

    winners_ref = ray.put(frozenset(winner_ids))
    # modest fractional-CPU pools: two of these run in one pipeline and must
    # not starve upstream tasks on small sessions
    exact_survivors = kept.map_batches(
        _IdFilter, fn_constructor_args=(winners_ref,),
        batch_format="pyarrow", concurrency=2, num_cpus=0.25,
    )

    # near-dup clusters over the exact-dedup survivors: only each cluster's
    # representative (min doc_id) survives
    clusters = near_dup_clusters(exact_survivors, threshold=near_dup_threshold)
    drop = {
        d
        for d, c in zip(
            clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_id").to_pylist(),
        )
        if d != c
    }
    keep_ref = ray.put(frozenset(winner_ids - drop))
    survivors = kept.map_batches(
        _IdFilter, fn_constructor_args=(keep_ref,),
        batch_format="pyarrow", concurrency=2, num_cpus=0.25,
    )
    sampled = stratified_sample(survivors, rates)

    def manifest(batch: pa.Table) -> pa.Table:
        ntok = np.fromiter(
            (len(TOKEN_RE.findall(t)) for t in batch.column("text").to_pylist()),
            dtype=np.int64, count=len(batch),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tokens": pa.array(ntok, pa.int64()),
            }
        )

    return sampled.map_batches(manifest, batch_format="pyarrow")
