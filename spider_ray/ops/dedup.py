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


def dedup_against_corpus(
    new_ds,
    ref_ds,
    column: str = "text",
    id_column: str = "doc_id",
    **join_kwargs,
):
    """Incremental exact dedup: rows of ``new_ds`` whose ``column`` value
    does NOT already appear in ``ref_ds`` — the "drop what's already in the
    training set" pass a continuously-crawled corpus runs before ingest.

    Both sides hash the column in ``map_batches`` (stable 64-bit hash —
    the same text≡hash convention as :func:`exact_dedup`; collision odds
    ~n²/2⁶⁵), the reference side shrinks to a slim hash column, and the
    filter is :func:`~spider_ray.ops.joins.semi_join_ids` in anti mode:
    broadcast frozenset while the reference is small, one shuffle-by-hash
    cogroup when it is corpus-scale.  ``new_ds``'s bytes move at most
    once; the reference never moves more than its hashes.
    """
    from .joins import semi_join_ids

    ref_hashes = ref_ds.map_batches(
        lambda b: _text_hash_batch(b, column).select(["text_hash"]),
        batch_format="pyarrow",
    )

    def with_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "text_hash", _text_hash_batch(b, column).column("text_hash")
        )

    filtered = semi_join_ids(
        new_ds.map_batches(with_hash, batch_format="pyarrow"),
        ref_hashes,
        id_column="text_hash",
        anti=True,
        **join_kwargs,
    )
    return filtered.map_batches(
        lambda b: b.drop_columns(["text_hash"]), batch_format="pyarrow"
    )


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


DEFAULT_MAX_BUCKET = 256


def bucket_pairs(ids_sorted, max_bucket: int = DEFAULT_MAX_BUCKET):
    """The pinned oversized-bucket pairing SPEC (shared with the sequential
    golden, ``goldens.seq_minhash_pairs``):

    * bucket size ``k <= max_bucket`` → all C(k,2) pairs (classic LSH);
    * ``k > max_bucket`` → the ascending id list is CHUNKED into consecutive
      runs of ``max_bucket``; all pairs within each chunk, PLUS one chain
      pair (bucket min id, chunk's first id) per later chunk.

    The chain pairs keep a degenerate bucket (e.g. 10⁶ byte-identical or
    empty docs sharing every band signature on a real web corpus)
    CONNECTED through the verify step — true duplicates still collapse to
    one cluster — while the pair budget drops from O(k²) to
    O(k·max_bucket).  Cross-chunk pairs between genuinely-different docs
    that only collide in an oversized bucket are dropped by design
    (documented recall loss on degenerate buckets only; every bucket
    ≤ max_bucket is exhaustive).
    """
    k = len(ids_sorted)
    out_a: list[int] = []
    out_b: list[int] = []
    for start in range(0, k, max_bucket):
        chunk = ids_sorted[start : start + max_bucket]
        if start > 0:
            out_a.append(ids_sorted[0])
            out_b.append(chunk[0])
        n = len(chunk)
        if n >= 2:
            arr = np.asarray(chunk, dtype=np.int64)
            ii, jj = np.triu_indices(n, 1)
            out_a.extend(arr[ii].tolist())
            out_b.extend(arr[jj].tolist())
    return out_a, out_b


def minhash_lsh_candidates(ds, max_bucket: int = DEFAULT_MAX_BUCKET, **kwargs):
    """Candidate near-dup pairs: minhash → band rows → groupby(band, hash) →
    pairs within a bucket.  Returns distinct (doc_a < doc_b) pairs.

    Scale: buckets are tiny for non-degenerate content, and oversized
    buckets are chunk-capped by :func:`bucket_pairs` (pair budget
    O(k·max_bucket) per bucket, never O(k²)); the pair generation happens
    inside ``map_groups`` per bucket, never globally.
    """
    band_rows = ds.map_batches(MinHasher(**kwargs), batch_format="pyarrow", batch_size=256)

    def pairs_of_group(tbl: pa.Table) -> pa.Table:
        ids = sorted(set(tbl.column("doc_id").to_pylist()))
        out_a, out_b = bucket_pairs(ids, max_bucket)
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


def _nonempty_blocks_ds(mds):
    """Rebuild a MATERIALIZED Dataset from only its non-empty blocks.

    Filtered ``map_batches`` stages can emit 0-row blocks with an EMPTY
    schema; Ray's hash-shuffle join aggregator rejects those ("No match …
    for key field reference").  ``ray.get`` on Arrow block refs is
    zero-copy (plasma mmap), so this inspects metadata without copying
    data; the kept refs are reused in place."""
    import ray
    import ray.data as rd

    refs = mds.to_arrow_refs()
    keep = [r for r in refs if ray.get(r).num_rows]
    return rd.from_arrow_refs(keep) if keep else None


def _jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two sorted-unique shingle-hash arrays (same value
    as the set form ``len(a&b)/max(1,len(a|b))``)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / max(1, a.size + b.size - inter)


def minhash_dedup(
    ds,
    threshold: float = 0.8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    num_partitions: int | None = None,
    pair_filter=None,
    **kwargs,
):
    """Near-dup groups: LSH candidates verified by exact Jaccard ≥ threshold.

    The verify step is DISTRIBUTED end-to-end: candidate docs' shingle-hash
    sets are computed in an actor pool (corpus filtered by the broadcast
    candidate-ID vector — the only driver-side state, O(candidate pairs)),
    then the pair list is hash-joined against that (doc_id → shingles) table
    twice (``Dataset.join`` on doc_a, then doc_b) so each pair row carries
    both shingle sets, and Jaccard is evaluated per batch.  No document text
    or shingle set ever lands on the driver — at web-scale candidate rates
    (20-50% of the corpus) the old gather-to-driver dict WAS a whole-dataset
    materialization; the joins keep everything in the object store.
    Returns (doc_a, doc_b, jaccard) confirmed pairs.

    ``pair_filter`` (optional ``pa.Table -> pa.Table`` over the candidate
    (doc_a, doc_b) rows) prunes candidate pairs BEFORE the expensive
    shingle/verify stage — callers that only consume a subset of the
    confirmed pairs (e.g. cross-generation drops) skip verifying pairs
    they would discard anyway; the surviving pairs' jaccard values are
    unchanged.
    """
    import ray
    import ray.data as rd

    id_column = kwargs.get("id_column", "doc_id")
    text_column = kwargs.get("text_column", "text")
    candidates = minhash_lsh_candidates(ds, max_bucket=max_bucket, **kwargs)
    if pair_filter is not None:
        candidates = candidates.map_batches(pair_filter, batch_format="pyarrow")
    candidates = candidates.materialize()
    cand_parts = [t for t in ray.get(candidates.to_arrow_refs()) if t.num_rows]
    if not cand_parts:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    cand_ids = np.unique(
        np.concatenate(
            [np.asarray(t.column("doc_a")) for t in cand_parts]
            + [np.asarray(t.column("doc_b")) for t in cand_parts]
        )
    )
    ids_ref = ray.put(cand_ids)
    hasher_kwargs = dict(kwargs)

    class ShingleLists:
        """Actor-pool stage: (doc_id, sorted shingle-hash list) for candidate
        docs only (vectorized ``np.isin`` filter per block)."""

        def __init__(self):
            self.ids = ray.get(ids_ref)  # once per actor
            self.hasher = MinHasher(**hasher_kwargs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = np.isin(
                batch.column(id_column).to_numpy(zero_copy_only=False), self.ids
            )
            sub = batch.filter(pa.array(mask))
            # sorted-unique uint64 hashes packed as LE bytes: hash joins
            # (acero) don't carry list payload columns, binary they do
            lists = [
                np.unique(self.hasher.shingles(t)).tobytes()
                for t in sub.column(text_column).to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": sub.column(id_column),
                    "sh": pa.array(lists, pa.large_binary()),
                }
            )

    from ..poolsize import autoscale_pool

    sh = _nonempty_blocks_ds(
        ds.select_columns([id_column, text_column])
        .map_batches(
            ShingleLists, batch_format="pyarrow", concurrency=autoscale_pool(2)
        )
        .materialize()
    )
    candidates = _nonempty_blocks_ds(candidates)
    assert sh is not None and candidates is not None  # cand_parts was non-empty
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    sh_a = sh.map_batches(
        lambda b: pa.table({"doc_a": b.column("doc_id"), "sh_a": b.column("sh")}),
        batch_format="pyarrow",
    )
    sh_b = sh.map_batches(
        lambda b: pa.table({"doc_b": b.column("doc_id"), "sh_b": b.column("sh")}),
        batch_format="pyarrow",
    )
    # materialize + strip between the joins: a hash-join partition that
    # received no rows finalizes to an empty-SCHEMA block, which the next
    # join's aggregator rejects (the working set here is pairs + shingle
    # payloads — O(candidates), never the corpus)
    j1 = _nonempty_blocks_ds(
        candidates.join(
            sh_a, join_type="inner", num_partitions=num_partitions, on=("doc_a",)
        ).materialize()
    )
    if j1 is None:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    joined = j1.join(sh_b, join_type="inner", num_partitions=num_partitions, on=("doc_b",))

    def verify(batch: pa.Table) -> pa.Table:
        jac = [
            _jaccard_sorted(
                np.frombuffer(a, dtype=np.uint64), np.frombuffer(b, dtype=np.uint64)
            )
            for a, b in zip(
                batch.column("sh_a").to_pylist(), batch.column("sh_b").to_pylist()
            )
        ]
        t = pa.table(
            {
                "doc_a": batch.column("doc_a"),
                "doc_b": batch.column("doc_b"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return t.filter(pc.greater_equal(t.column("jaccard"), threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


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


def near_dup_clusters_labelprop(
    ds, threshold: float = 0.5, max_iters: int = 50, **kwargs
):
    """Distributed twin of :func:`near_dup_clusters`: connected components
    over the verified MinHash pair graph via hash-to-min label propagation,
    with NO driver-side graph state — for pair lists that outgrow one
    process (a near-dup-heavy web corpus can emit pairs at a large fraction
    of corpus size).

    Every doc starts labeled with its own id; each round every doc pushes
    its current MIN label to its pair-neighbors and keeps the min of what
    it holds and what it receives.  The round is expressed JOIN-FREE as
    two ``groupby(doc)`` shuffles over a tagged union (label rows +
    edge rows co-grouped by doc → message rows → min-fold per doc), which
    sidesteps the hash-join operator's empty-partition fragility and keeps
    both exchanges on the SAME key.  Convergence is a distributed scalar:
    labels are int64 doc ids that only ever decrease, so the global label
    sum strictly decreases until fixpoint — no per-row old-vs-new compare
    needed.  Near-dup components are shallow (dup clusters, not chains),
    so rounds ≈ a small constant.  Output ``(doc_id, cluster_id)``,
    cluster_id = min doc_id in the component — identical to the driver
    union-find (parity-tested).
    """
    import ray.data as rd

    pairs = minhash_dedup(ds, threshold=threshold, **kwargs).select_columns(
        ["doc_a", "doc_b"]
    )

    def undirect(b: pa.Table) -> pa.Table:
        # edge rows, tagged is_label=0: val = a neighbor of doc
        return pa.table(
            {
                "doc": pa.chunked_array(
                    list(b.column("doc_a").chunks) + list(b.column("doc_b").chunks)
                ),
                "val": pa.chunked_array(
                    list(b.column("doc_b").chunks) + list(b.column("doc_a").chunks)
                ),
                "is_label": pa.nulls(2 * b.num_rows, pa.int8()).fill_null(0),
            }
        )

    empty_out = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )

    und = pairs.map_batches(undirect, batch_format="pyarrow").materialize()
    if und.count() == 0:
        return rd.from_arrow(empty_out)

    # initial labels: every doc appearing in a pair, labeled with itself
    labels = (
        und.map_batches(
            lambda b: pa.table({"doc": b.column("doc")}), batch_format="pyarrow"
        )
        .groupby("doc")
        .map_groups(
            lambda t: pa.table(
                {
                    "doc": t.column("doc")[:1],
                    "val": t.column("doc")[:1],
                    "is_label": pa.array([1], pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def emit_messages(group: pa.Table) -> pa.Table:
        # one doc's label row + its edge rows: push the label to every
        # neighbor, and to the doc itself (so an un-bettered label survives)
        is_lab = group.column("is_label")
        lab = pc.min(group.filter(pc.equal(is_lab, 1)).column("val")).as_py()
        nbrs = group.filter(pc.equal(is_lab, 0)).column("val")
        targets = pa.chunked_array(
            list(nbrs.chunks) + [pa.array([group.column("doc")[0].as_py()], pa.int64())]
        )
        n = len(targets)
        return pa.table(
            {
                "doc": targets,
                "val": pa.nulls(n, pa.int64()).fill_null(lab),
                "is_label": pa.nulls(n, pa.int8()).fill_null(1),
            }
        )

    def _min_fold(b: pa.Table) -> pa.Table:
        # per-batch combiner AND per-group finalizer: min val per doc
        return (
            b.select(["doc", "val"])
            .group_by(["doc"])
            .aggregate([("val", "min")])
            .rename_columns(["doc", "val"])
        )

    def _relabel(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc": b.column("doc"),
                "val": b.column("val"),
                "is_label": pa.nulls(b.num_rows, pa.int8()).fill_null(1),
            }
        )

    prev_sum: int | None = None
    for _ in range(max_iters):
        labels = (
            labels.union(und)
            .groupby("doc")
            .map_groups(emit_messages, batch_format="pyarrow")
            .map_batches(_min_fold, batch_format="pyarrow")
            .groupby("doc")
            .map_groups(_min_fold, batch_format="pyarrow")
            .map_batches(_relabel, batch_format="pyarrow")
            .materialize()
        )
        label_sum = labels.sum("val")
        if label_sum == prev_sum:
            break
        prev_sum = label_sum

    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc"), "cluster_id": b.column("val")}
        ),
        batch_format="pyarrow",
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


def _bucket_pair_indices(k: int, max_bucket: int):
    """Index-pair form of the pinned oversized-bucket spec (see
    :func:`bucket_pairs`): all pairs within consecutive ``max_bucket``
    chunks of the (sorted) member list + one chain pair (first member,
    chunk head) per later chunk."""
    out_i: list[int] = []
    out_j: list[int] = []
    for start in range(0, k, max_bucket):
        n = min(max_bucket, k - start)
        if start > 0:
            out_i.append(0)
            out_j.append(start)
        if n >= 2:
            ii, jj = np.triu_indices(n, 1)
            out_i.extend((ii + start).tolist())
            out_j.extend((jj + start).tolist())
    return np.asarray(out_i, np.int64), np.asarray(out_j, np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no bit_count)."""
    if x.size == 0:
        return np.zeros(0, np.int64)
    return (
        np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


def simhash_near_dup(
    ds,
    max_hamming: int = 3,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    **kwargs,
):
    """SimHash near-dup pairs ``(doc_a, doc_b, hamming)`` with
    ``hamming ≤ max_hamming``.

    Banded blocking over the 64-bit signature (4 × 16-bit bands): a pair
    differing in ≤ 3 bits leaves at least one band untouched (pigeonhole),
    so for ``max_hamming ≤ 3`` the candidate set is EXACT — no recall loss
    except inside oversized buckets, which chunk under the same pinned cap
    spec as the MinHash path (:func:`bucket_pairs`).

    Scale shape: signatures are a stateless ``map_batches`` stage; the
    signature TRAVELS WITH the band rows, so in-bucket verification is a
    vectorized XOR-popcount inside the band ``groupby`` — no join against
    a signature table, no driver-side state.  Cross-band duplicates
    collapse with one (doc_a, doc_b) groupby of the verified (tiny) pair
    list.
    """
    sigs = simhash_signatures(ds, **kwargs)

    def band_rows(b: pa.Table) -> pa.Table:
        sig = b.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        bands = np.repeat(np.arange(4, dtype=np.int8), n)
        bits = np.concatenate(
            [(sig >> np.uint64(16 * band)) & np.uint64(0xFFFF) for band in range(4)]
        )
        return pa.table(
            {
                "band": pa.array(bands, pa.int8()),
                "bits": pa.array(bits, pa.uint64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "sig": pa.array(np.tile(sig, 4), pa.uint64()),
            }
        )

    def pairs_of_bucket(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sig = tbl.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        # distinct members (a doc appears once per band bucket by
        # construction, but be safe under batch re-chunking)
        ids, sig = ids[order], sig[order]
        keep = np.ones(len(ids), bool)
        keep[1:] = ids[1:] != ids[:-1]
        ids, sig = ids[keep], sig[keep]
        ii, jj = _bucket_pair_indices(len(ids), max_bucket)
        ham = _popcount64(sig[ii] ^ sig[jj])
        m = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ii][m], pa.int64()),
                "doc_b": pa.array(ids[jj][m], pa.int64()),
                "hamming": pa.array(ham[m], pa.int64()),
            }
        )

    return (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bits"])
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
    )


def near_dup_canonical(ds, threshold: float = 0.5, **kwargs) -> pa.Table:
    """Canonical-document selection per near-dup cluster: keep the LONGEST
    member (``len(text)``, ties → lowest doc_id) — the curation step after
    clustering when "first occurrence" is the wrong survivor (truncated
    copies, mirrors with boilerplate stripped).  Returns
    ``(cluster_id, canonical_doc_id, n_members, n_dropped)``.

    Shape: the cluster table from :func:`near_dup_clusters` is O(clustered
    docs) — bounded by the verified pair graph, never the corpus — so the
    member lengths arrive via ONE filtered slim pass over the corpus
    (``doc_id`` membership mask, (doc_id, n_chars) rows only) and the
    per-cluster argmax folds on the driver over that same tiny set, like
    the union-find it composes with."""
    import numpy as np
    import pyarrow.compute as pc

    clusters = near_dup_clusters(ds, threshold=threshold, **kwargs)
    if clusters.num_rows == 0:
        return pa.table(
            {
                "cluster_id": pa.array([], pa.int64()),
                "canonical_doc_id": pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64()),
                "n_dropped": pa.array([], pa.int64()),
            }
        )
    member_ids = np.asarray(clusters.column("doc_id"), dtype=np.int64)
    ids_sorted = np.sort(member_ids)

    def lengths(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ids_sorted, ids)
        np.minimum(pos, len(ids_sorted) - 1, out=pos)
        mask = ids_sorted[pos] == ids
        t = batch.filter(pa.array(mask))
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
            }
        )

    got = ds.select_columns(["doc_id", "text"]).map_batches(
        lengths, batch_format="pyarrow"
    ).take_all()
    len_of = {r["doc_id"]: r["n_chars"] for r in got}
    best: dict[int, tuple[int, int]] = {}  # cluster -> (-n_chars, doc_id)
    n_members: dict[int, int] = {}
    for doc, cl in zip(
        member_ids.tolist(), clusters.column("cluster_id").to_pylist()
    ):
        n_members[cl] = n_members.get(cl, 0) + 1
        key = (-len_of.get(doc, 0), doc)
        if cl not in best or key < best[cl]:
            best[cl] = key
    cls = sorted(best)
    return pa.table(
        {
            "cluster_id": pa.array(cls, pa.int64()),
            "canonical_doc_id": pa.array([best[c][1] for c in cls], pa.int64()),
            "n_members": pa.array([n_members[c] for c in cls], pa.int64()),
            "n_dropped": pa.array([n_members[c] - 1 for c in cls], pa.int64()),
        }
    )


def cross_generation_drop_ids(
    docs,
    threshold: float = 0.5,
    id_column: str = "doc_id",
    is_ref=None,
    **kwargs,
):
    """Fresh-generation ids with a confirmed near-dup pair into the
    ingested reference generation — the drop set both
    :func:`near_dup_against_corpus` and the incremental-curation pipeline
    anti-join against.  Pair spec is :func:`minhash_dedup` over the union
    (shared confirmed-pair golden) restricted to CROSS-generation
    candidate pairs — same-generation pairs can never contribute a drop,
    so they are pruned before the expensive shingle-join verify (the
    confirmed cross pairs and therefore the drop set are identical).
    Returns a slim id Dataset, never a driver set."""
    if is_ref is None:
        def is_ref(ids):
            return (ids & 1) == 0

    def cross_only(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(is_ref(a) != is_ref(b)))

    pairs = minhash_dedup(docs, threshold=threshold, id_column=id_column,
                          pair_filter=cross_only, **kwargs)

    def cross_drops(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ra, rb = is_ref(a), is_ref(b)
        drops = np.concatenate([b[ra & ~rb], a[rb & ~ra]])
        return pa.table({id_column: pa.array(np.unique(drops), pa.int64())})

    # materialize the slim id dataset: semi_join_ids(mode="auto") consumes
    # its id side up to three times (two counts + the broadcast fetch),
    # and each lazy consumption would re-run the shingle-join verify tail
    return pairs.map_batches(cross_drops, batch_format="pyarrow").materialize()


def near_dup_against_corpus(
    docs,
    threshold: float = 0.5,
    id_column: str = "doc_id",
    source_col: str = "source",
    is_ref=None,
    **kwargs,
):
    """Incremental NEAR-dup against an ingested reference generation — the
    fuzzy sibling of :func:`dedup_against_corpus`: fresh docs whose
    verified Jaccard similarity to ANY reference doc meets ``threshold``
    are dropped; survivors return as slim ``(doc_id, source)`` rows.

    ``is_ref(ids) -> bool mask`` splits generations (default: even ids =
    ingested reference, odd = fresh — the ``pipelines/incremental``
    convention).  The pair spec is EXACTLY :func:`minhash_dedup` over the
    union (same LSH bands, same chunk-capped buckets, same distributed
    shingle-join verify), so the confirmed-pair golden is shared; this op
    adds only the cross-generation interpretation: a fresh doc with a
    confirmed pair whose other end is a reference doc is a drop.  The
    drop-id set stays a Dataset end to end
    (:func:`~spider_ray.ops.joins.semi_join_ids` anti-join — broadcast /
    bloom / cogroup by size); no driver id sets."""
    from .joins import semi_join_ids

    if is_ref is None:
        def is_ref(ids):
            return (ids & 1) == 0

    drop_ids = cross_generation_drop_ids(
        docs, threshold=threshold, id_column=id_column, is_ref=is_ref,
        **kwargs,
    )

    def fresh_only(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~is_ref(ids)
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                id_column: pc.cast(t.column(id_column), pa.int64()),
                source_col: t.column(source_col),
            }
        )

    fresh = docs.select_columns([id_column, source_col]).map_batches(
        fresh_only, batch_format="pyarrow"
    )
    return semi_join_ids(fresh, drop_ids, id_column=id_column, anti=True)
