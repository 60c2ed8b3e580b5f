"""Similarity search over an embedding column (``list<float>``).

* brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (``ray.put`` once, read per actor in ``__init__`` — never re-shipped
  per batch), partial top-k per batch folded on the driver;
* LSH-bucketed variant (random hyperplane signs) as the scale path: candidate
  buckets shuffle only (bucket, vec_id), full vectors stay in their blocks.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch.column(column)
    flat = np.asarray(col.combine_chunks().flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


class CosineScorer:
    """Actor-pool stage: score every row against the broadcast query matrix
    and emit the per-batch top-k (partial top-k pushdown → tiny driver fold)."""

    def __init__(self, queries_ref, k: int, column: str, id_column: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        self.k = k
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ self.q.T  # (rows, n_queries)
        ids = np.asarray(batch.column(self.id_column))
        out_q, out_id, out_sim = [], [], []
        k = min(self.k, len(ids))
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            # deterministic per-batch top-k under the SAME ordering as the
            # driver fold and SQL oracle: (-round(sim, 9), vec_id asc).  Keep
            # all boundary ties before the lexsort so none of the ids the
            # fold would pick is dropped here.
            r = -np.round(col, 9)
            if k < len(ids):
                kth = np.partition(r, k - 1)[k - 1]
                cand = np.nonzero(r <= kth)[0]
            else:
                cand = np.arange(len(ids))
            order = np.lexsort((ids[cand], r[cand]))
            for row in cand[order[:k]]:
                out_q.append(qi)
                out_id.append(int(ids[row]))
                out_sim.append(float(col[row]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cos_sim": pa.array(out_sim, pa.float64()),
            }
        )


def brute_force_top_k(
    ds,
    queries: np.ndarray,
    k: int = 10,
    column: str = "embedding",
    id_column: str = "vec_id",
    concurrency: int = 2,
):
    """Global top-k neighbors per query.  Per-batch partial top-k in actors,
    exact fold on the driver (k × n_queries rows only).  Deterministic
    tie-break: (−sim rounded to 9 dp, vec_id)."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.map_batches(
        CosineScorer,
        fn_constructor_args=(qref, k, column, id_column),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
    heaps: dict[int, list] = {}
    for batch in partial.iter_batches(batch_format="pyarrow"):
        for q, vid, sim in zip(
            batch.column("query_id").to_pylist(),
            batch.column("vec_id").to_pylist(),
            batch.column("cos_sim").to_pylist(),
        ):
            heaps.setdefault(q, []).append((-round(sim, 9), vid, sim))
    rows_q, rows_id, rows_rank, rows_sim = [], [], [], []
    for q in sorted(heaps):
        best = heapq.nsmallest(k, heaps[q])
        for rank, (_, vid, sim) in enumerate(best, 1):
            rows_q.append(q)
            rows_id.append(vid)
            rows_rank.append(rank)
            rows_sim.append(sim)
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "vec_id": pa.array(rows_id, pa.int64()),
            "rank": pa.array(rows_rank, pa.int64()),
            "cos_sim": pa.array(rows_sim, pa.float64()),
        }
    )


class HyperplaneLSH:
    """Random-hyperplane sign buckets: ``map_batches`` stage emitting
    (vec_id, bucket).  At scale, only same-bucket candidates are scored —
    an IVF-style pruning layer in front of :class:`CosineScorer`."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 7, column: str = "embedding",
                 id_column: str = "vec_id"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.column = column
        self.id_column = id_column

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs * (1 << np.arange(self.planes.shape[0]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        return pa.table(
            {
                "vec_id": batch.column(self.id_column),
                "bucket": pa.array(self.bucket_of(m), pa.int64()),
            }
        )


def lsh_top_k(
    ds,
    queries: np.ndarray,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    column: str = "embedding",
    id_column: str = "vec_id",
):
    """Approximate top-k: score only rows whose LSH bucket matches a query's
    bucket.  Returns the same schema as :func:`brute_force_top_k` (recall <
    1.0 by construction; tested against the brute-force baseline)."""
    import pyarrow.compute as pc
    import ray

    queries = np.asarray(queries, dtype=np.float64)
    if dim is None:
        dim = queries.shape[1]
    lsh = HyperplaneLSH(dim, n_planes, column=column, id_column=id_column)
    qbuckets = set(lsh.bucket_of(queries).tolist())

    def filter_bucket(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        buckets = lsh.bucket_of(m)
        mask = np.isin(buckets, list(qbuckets))
        return batch.filter(pa.array(mask))

    pruned = ds.map_batches(filter_bucket, batch_format="pyarrow")
    return brute_force_top_k(pruned, queries, k, column, id_column)


def ivf_cells(
    ds, n_cells: int = 16, column: str = "embedding", id_column: str = "vec_id"
):
    """Deterministic, training-free IVF coarse quantizer: the centroids are
    the embeddings of ``n_cells`` evenly-spaced vec_ids (sorted order).  No
    k-means — the spec must be bit-replicable by the sequential oracle, and
    at IVF scale the bucketing structure (inverted lists + nprobe) matters
    far more than centroid optimality.  Returns (centroid_ids, centroids
    normalized)."""
    import ray

    id_parts = ray.get(ds.select_columns([id_column]).materialize().to_arrow_refs())
    ids = np.sort(np.concatenate([np.asarray(t.column(id_column)) for t in id_parts]))
    n = len(ids)
    # fewer vectors than cells → evenly-spaced picks repeat; collapse them so
    # callers see the ACTUAL centroid count (len of the returned arrays)
    sel = np.unique(ids[(np.arange(n_cells, dtype=np.int64) * n) // n_cells])
    cent_tbl = pa.concat_tables(
        [
            t.filter(pa.compute.is_in(t.column(id_column), value_set=pa.array(sel)))
            for t in ray.get(ds.select_columns([id_column, column]).materialize().to_arrow_refs())
        ]
    )
    order = np.argsort(np.asarray(cent_tbl.column(id_column)))
    cents = _batch_matrix(cent_tbl, column)[order]
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return np.asarray(cent_tbl.column(id_column))[order], cents


def _assign_cells(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid cell per vector; sims rounded to 9 so the argmax
    (first-max → lowest cell id on ties) is bit-replicable."""
    v = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    return np.argmax(np.round(v @ cents.T, 9), axis=1).astype(np.int64)


def ivf_top_k(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    column: str = "embedding",
    id_column: str = "vec_id",
):
    """IVF-style approximate top-k: each query probes its ``nprobe`` nearest
    cells; only vectors assigned to a probed cell are scored (exact cosine +
    the shared deterministic fold).  Complements :func:`lsh_top_k` —
    bucket-by-centroid instead of bucket-by-hyperplane-signs.  Recall < 1 by
    construction; tested against the brute-force baseline."""
    queries = np.asarray(queries, dtype=np.float64)
    _, cents = ivf_cells(ds, n_cells, column, id_column)

    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    qsims = np.round(qn @ cents.T, 9)
    actual_cells = cents.shape[0]  # < n_cells when the dataset is tiny
    probed: set[int] = set()
    for qi in range(qsims.shape[0]):
        order = np.lexsort((np.arange(actual_cells), -qsims[qi]))
        probed.update(order[:nprobe].tolist())
    probe_list = sorted(probed)

    def filter_cells(batch: pa.Table) -> pa.Table:
        cells = _assign_cells(_batch_matrix(batch, column), cents)
        return batch.filter(pa.array(np.isin(cells, probe_list)))

    pruned = ds.map_batches(filter_cells, batch_format="pyarrow")
    return brute_force_top_k(pruned, queries, k, column, id_column)


class NearDupScorer:
    """Actor-pool stage for embedding-cosine near-dup: each batch scores
    against the broadcast normalized matrix (``ray.put`` once, read per actor
    in ``__init__``) and emits (vec_a < vec_b, cos_sim) pairs at or above the
    threshold.  Each unordered pair is emitted exactly once (the a<b filter —
    a row meets every other row once as "a" and once as a column)."""

    def __init__(self, mat_ids_ref, threshold: float, column: str, id_column: str):
        import ray

        self.mat, self.ids = ray.get(mat_ids_ref)  # mat already normalized
        self.threshold = threshold
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = np.round(m @ self.mat.T, 9)
        bids = np.asarray(batch.column(self.id_column))
        ii, jj = np.nonzero(sims >= self.threshold)
        a, b = bids[ii], self.ids[jj]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cos_sim": pa.array(sims[ii[keep], jj[keep]], pa.float64()),
            }
        )


def cosine_near_dup(
    ds,
    threshold: float = 0.4,
    column: str = "embedding",
    id_column: str = "vec_id",
    concurrency: int = 2,
):
    """Embedding-cosine near-duplicate pairs: (vec_a < vec_b, cos_sim ≥ t).

    Exact (recall 1.0): every batch multiplies against the broadcast
    normalized matrix — O(n²) dot products as blocked matmuls.  The matrix
    is assembled in a REMOTE task from the dataset's own block refs and
    broadcast through the object store — it never lands on the driver.
    Scale path: beyond ~10⁶ rows swap the broadcast side for block-pair
    task fan-out, or pre-filter with :class:`HyperplaneLSH` buckets
    (approximate — recall < 1)."""
    import ray

    slim = ds.select_columns([id_column, column]).materialize()
    part_refs = slim.to_arrow_refs()

    @ray.remote
    def _assemble(*tables):
        tables = [t for t in tables if t.num_rows]
        ids = np.concatenate([np.asarray(t.column(id_column)) for t in tables])
        mat = np.vstack([_batch_matrix(t, column) for t in tables])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return mat, ids

    mat_ids_ref = _assemble.remote(*part_refs)
    return slim.map_batches(
        NearDupScorer,
        fn_constructor_args=(mat_ids_ref, threshold, column, id_column),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
