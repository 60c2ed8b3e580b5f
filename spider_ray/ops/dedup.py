"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-native: hash/signature computation is a
``map_batches`` stage (stateless, Arrow in/out); the grouping step is a
``groupby`` keyed on the hash — i.e. hash-partition + per-group first, the
same shuffle-minimizing shape as the crawl engine's signature dedup
(SURVEY.md §2.9).  Scale notes per operator docstring.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import stable_hash_str

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _text_hash_batch(batch: pa.Table, column: str) -> pa.Table:
    hashes = np.fromiter(
        (stable_hash_str(t or "") for t in batch.column(column).to_pylist()),
        dtype=np.uint64,
        count=batch.num_rows,
    )
    return batch.append_column("text_hash", pa.array(hashes, pa.uint64()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Exact dedup: stable-hash the column in ``map_batches``, then
    hash-partitioned ``groupby(hash)`` keeping ``min(id)`` per group
    (deterministic winner) + the duplicate count.

    Scale: the shuffle moves only (hash, id) pairs — the text column is
    dropped before the groupby; at 100 TB this is the canonical
    "hash-partition + per-group first" exact dedup.
    """
    hashed = ds.map_batches(
        lambda b: _text_hash_batch(b, column).select(["text_hash", id_column]),
        batch_format="pyarrow",
    )
    return (
        hashed.groupby("text_hash")
        .min(id_column)
        .map_batches(
            lambda b: pa.table({"doc_id": b.column(f"min({id_column})")}),
            batch_format="pyarrow",
        )
    )


def exact_dedup_counts(ds, column: str = "text", id_column: str = "doc_id"):
    """(kept doc_id, dup_count) per distinct text — SQL-oracle-friendly."""
    hashed = ds.map_batches(
        lambda b: _text_hash_batch(b, column).select(["text_hash", id_column]),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count, Min

    agg = hashed.groupby("text_hash").aggregate(Min(id_column), Count())
    count_col = "count()"
    return agg.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column(f"min({id_column})"),
                "dup_count": pc.cast(b.column(count_col), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+", re.UNICODE)

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Per-doc MinHash signatures over word shingles — actor-pool stage
    (permutation parameters built once per actor).

    Vectorized: all shingle hashes of a doc × 128 permutations via numpy
    broadcasting.  Banding for LSH: ``n_bands`` bands of ``rows_per_band``
    rows; band hashes become groupby keys (bucket shuffle moves only
    (band_hash, doc_id)).
    """

    def __init__(
        self,
        num_perm: int = 128,
        shingle_size: int = 3,
        n_bands: int = 16,
        text_column: str = "text",
        id_column: str = "doc_id",
        seed: int = 1337,
    ):
        assert num_perm % n_bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_size = shingle_size
        self.n_bands = n_bands
        self.rows_per_band = num_perm // n_bands
        self.text_column = text_column
        self.id_column = id_column

    def shingles(self, text: str) -> np.ndarray:
        words = _WORD_RE.findall((text or "").lower())
        k = self.shingle_size
        if len(words) < k:
            shings = [" ".join(words)] if words else [""]
        else:
            shings = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        return np.fromiter(
            (stable_hash_str(s) & _MERSENNE for s in set(shings)), dtype=np.uint64
        )

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if sh.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles): (a*x + b) mod p, take min per row
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        out_ids, out_bands, out_hashes = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text)
            bands = sig.reshape(self.n_bands, self.rows_per_band)
            for band_idx in range(self.n_bands):
                out_ids.append(doc_id)
                out_bands.append(band_idx)
                out_hashes.append(stable_hash_str(bands[band_idx].tobytes().hex()))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "band": pa.array(out_bands, pa.int32()),
                "band_hash": pa.array(out_hashes, pa.uint64()),
            }
        )


def minhash_lsh_candidates(ds, **kwargs):
    """Candidate near-dup pairs: minhash → band rows → groupby(band, hash) →
    pairs within a bucket.  Returns distinct (doc_a < doc_b) pairs.

    Scale: bucket groups are tiny (docs sharing a band hash); the pair
    explosion happens inside ``map_groups`` per bucket, never globally.
    """
    band_rows = ds.map_batches(MinHasher(**kwargs), batch_format="pyarrow", batch_size=256)

    def pairs_of_group(tbl: pa.Table) -> pa.Table:
        ids = sorted(set(tbl.column("doc_id").to_pylist()))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64())}
        )

    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        pairs_of_group, batch_format="pyarrow"
    )
    # distinct pairs (a pair can match in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).count().map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )


def jaccard(text_a: str, text_b: str, shingle_size: int = 3) -> float:
    """Exact word-shingle Jaccard (verification step after LSH)."""
    h = MinHasher(shingle_size=shingle_size)
    a = set(h.shingles(text_a).tolist())
    b = set(h.shingles(text_b).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def minhash_dedup(ds, threshold: float = 0.8, **kwargs):
    """Near-dup groups: LSH candidates verified by exact Jaccard ≥ threshold.

    The verify step gathers ONLY the candidate docs' texts (candidate set ≪
    corpus): the candidate doc-id set is broadcast via ``ray.put``, workers
    filter their blocks against it (vectorized ``np.isin``), and just those
    (doc_id, text) rows reach the driver/verify actors.  The corpus itself is
    never materialized — the only driver-side state is O(candidate pairs).
    Returns (doc_a, doc_b, jaccard) confirmed pairs.
    """
    import ray

    shingle_size = kwargs.get("shingle_size", 3)
    candidates = minhash_lsh_candidates(ds, **kwargs).materialize()
    cand_parts = [t for t in ray.get(candidates.to_arrow_refs()) if t.num_rows]
    cand_ids: set[int] = set()
    for t in cand_parts:
        cand_ids.update(t.column("doc_a").to_pylist())
        cand_ids.update(t.column("doc_b").to_pylist())

    texts: dict[int, str] = {}
    if cand_ids:
        ids_ref = ray.put(np.fromiter(cand_ids, dtype=np.int64, count=len(cand_ids)))

        class GatherTexts:
            def __init__(self):
                self.ids = ray.get(ids_ref)  # once per actor

            def __call__(self, batch: pa.Table) -> pa.Table:
                mask = np.isin(
                    batch.column("doc_id").to_numpy(zero_copy_only=False), self.ids
                )
                return batch.filter(pa.array(mask))

        small = ds.select_columns(["doc_id", "text"]).map_batches(
            GatherTexts, batch_format="pyarrow", concurrency=2
        )
        for batch in small.iter_batches(batch_format="pyarrow"):
            texts.update(
                zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
            )
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids = batch.column("doc_a").to_pylist()
            b_ids = batch.column("doc_b").to_pylist()
            jac = [
                jaccard(self.texts.get(a, ""), self.texts.get(b, ""), shingle_size)
                for a, b in zip(a_ids, b_ids)
            ]
            t = batch.append_column("jaccard", pa.array(jac, pa.float64()))
            return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    return candidates.map_batches(Verify, batch_format="pyarrow", concurrency=2)


def near_dup_clusters(ds, threshold: float = 0.5, **kwargs) -> pa.Table:
    """Near-duplicate clusters: connected components over the verified
    MinHash pair graph.  Returns (doc_id, cluster_id) for every doc in a
    cluster, cluster_id = min doc_id of the component.

    The union-find runs on the driver over the VERIFIED PAIR LIST only —
    O(pairs), not O(corpus); the pair list is the (tiny) output of
    :func:`minhash_dedup`, never the corpus.  At extreme pair counts the
    same fold distributes as alternating min-label propagation
    (groupby(doc).min(label) until fixpoint); the driver fold is the
    single-pass exact version of that.
    """
    pairs = minhash_dedup(ds, threshold=threshold, **kwargs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        # min-id root invariant: union always hangs the larger root under the
        # smaller, so find(x) is the component's min doc_id
    members = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word features — ``map_batches`` stage."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    @staticmethod
    def simhash64(text: str) -> int:
        words = _WORD_RE.findall((text or "").lower())
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in set(words):
            h = stable_hash_str(w)
            bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [self.simhash64(t) for t in batch.column(self.text_column).to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column(self.id_column),
                "simhash": pa.array(sims, pa.uint64()),
            }
        )


def simhash_signatures(ds, **kwargs):
    return ds.map_batches(SimHasher(**kwargs), batch_format="pyarrow")


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
