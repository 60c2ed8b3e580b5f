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
stage is a Dataset transform; survivor/drop filtering goes through
``ops/joins.semi_join_ids`` (broadcast frozenset while the id side is
small, shuffle-by-id cogroup when it is a corpus-scale fraction), so the
only driver-side state is the near-dup cluster membership
(O(cluster members), not O(corpus)).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .textclean import GopherQuality

TOKEN_RE = re.compile(r"\S+")


def curate_corpus(docs, rates: dict[str, float], near_dup_threshold: float = 0.5):
    """``(doc_id, lang, n_tokens)`` for the curated survivor set."""
    import pyarrow.compute as pc

    from ..hashing import stable_hash_str
    from .dedup import near_dup_clusters
    from .joins import semi_join_ids
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
        .map_batches(
            lambda b: pa.table({"doc_id": b.column("min(doc_id)")}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # survivor filter via the semi-join primitive: broadcast frozenset
    # while the winner set is small, one shuffle-by-id cogroup when it is
    # a corpus-scale fraction — the driver never folds O(corpus) ids
    exact_survivors = semi_join_ids(
        kept, winners_ds, id_column="doc_id"
    )

    # near-dup clusters over the exact-dedup survivors: only each cluster's
    # representative (min doc_id) survives.  The driver union-find is exact
    # and O(cluster members); swap in near_dup_clusters_labelprop for a
    # pair list that outgrows one process.
    clusters = near_dup_clusters(exact_survivors, threshold=near_dup_threshold)
    mask = pc.invert(
        pc.equal(clusters.column("doc_id"), clusters.column("cluster_id"))
    )
    drop_tbl = clusters.filter(mask).select(["doc_id"])
    # fuse the two survivor filters into ONE pass over the wide side:
    # survivors = kept ∩ (winners − drop).  drop is O(cluster members) and
    # already driver-side, so subtracting it from the slim winner-id
    # Dataset is a plain broadcast filter; the corpus text is then
    # filtered exactly once by the semi join.
    import ray

    drop_ref = ray.put(frozenset(drop_tbl.column("doc_id").to_pylist()))

    def minus_drop(b: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        ids = b.column("doc_id").to_pylist()
        return b.filter(pa.array([i not in drop for i in ids], pa.bool_()))

    keep_ids = winners_ds.map_batches(minus_drop, batch_format="pyarrow")
    survivors = semi_join_ids(kept, keep_ids, id_column="doc_id")
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
