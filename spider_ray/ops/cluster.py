"""Embedding clustering: deterministic k-means + SemDeDup-style dedup.

``kmeans_fit`` is Lloyd's algorithm expressed as repeated streaming
passes: each iteration is ONE ``map_batches`` over the dataset computing
per-batch partial centroid sums, folded on the driver into the next k x d
centroid matrix (k x d is tiny; the dataset itself never materializes).

Determinism contract (the sequential golden recomputes it verbatim):

* vectors are L2-normalized in float64;
* the quantity folded across batches is the INTEGER quantization
  ``round(x * 1e6)`` of each normalized component — integer partial sums
  are immune to summation order, so block/batch boundaries cannot perturb
  the centroids (same trick as the price-cents ops in ``relational.py``);
* init: centroids are the vectors of the k ids with the smallest
  ``(knuth_hash(id), id)`` — the repo's standard RNG-free sampler;
* assignment: argmax cosine against unit centroids, first-index tie-break;
  empty clusters keep their previous centroid.

``semdedup`` (Abbas et al., 2023 — "SemDeDup") prunes semantic duplicates
WITHIN each k-means cluster: the final centroid matrix rides along to a
``groupby(cluster)`` that co-locates each cluster's vectors (no join —
cluster ids are recomputed per batch from the broadcast k x d matrix),
then a greedy sweep in id order drops any vector whose cosine to an
already-kept vector rounds to >= tau.  The all-pairs work is confined to
one cluster per task — the partitioning assumption is that a cluster fits
one worker (pick k proportional to corpus size; SemDeDup itself uses
k = 11k clusters for 100M+ docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = 2654435761
_MOD = 1 << 32
_Q = 1_000_000.0


def _unit_rows(batch: pa.Table, column: str) -> np.ndarray:
    col = batch.column(column)
    flat = np.asarray(col.combine_chunks().flatten(), dtype=np.float64)
    m = flat.reshape(batch.num_rows, -1)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _quantize(m: np.ndarray) -> np.ndarray:
    # half-away-from-zero, matching the SQL round() contract (numeric.py)
    return (np.sign(m) * np.floor(np.abs(m) * _Q + 0.5)).astype(np.int64)


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # round-9 before argmax: BLAS GEMM blocking varies with batch shape, so
    # raw last-ulp sims are not batch-size-invariant (repo round-9 contract)
    return np.argmax(np.round(m @ centroids.T, 9), axis=1)


def kmeans_fit(
    ds,
    k: int = 8,
    iters: int = 4,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> np.ndarray:
    """Fit and return the final unit k x d centroid matrix (float64)."""

    # --- init: fold the per-block minimal (hash, id) sample of size k ---
    def init_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_column), dtype=np.int64)
        m = _unit_rows(batch, column)
        hv = (ids.astype(np.uint64) * _KNUTH) % _MOD
        order = np.lexsort((ids, hv))[:k]
        return pa.table(
            {
                "hv": pa.array(hv[order], pa.uint64()),
                "id": pa.array(ids[order], pa.int64()),
                "vec": pa.array(list(m[order]), pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(init_partial, batch_format="pyarrow").take_all()
    hv = np.array([r["hv"] for r in parts], dtype=np.uint64)
    ids = np.array([r["id"] for r in parts], dtype=np.int64)
    vecs = np.array([r["vec"] for r in parts], dtype=np.float64)
    order = np.lexsort((ids, hv))[:k]
    # id order (not hash order) pins the centroid indexing
    centroids = vecs[order][np.argsort(ids[order], kind="stable")]

    for _ in range(iters):

        def iter_partial(batch: pa.Table, cents=centroids) -> pa.Table:
            m = _unit_rows(batch, column)
            a = _assign(m, cents)
            q = _quantize(m)
            sums = np.zeros((len(cents), m.shape[1]), dtype=np.int64)
            counts = np.zeros(len(cents), dtype=np.int64)
            np.add.at(sums, a, q)
            np.add.at(counts, a, 1)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(cents)), pa.int64()),
                    "qsum": pa.array(list(sums), pa.list_(pa.int64())),
                    "count": pa.array(counts, pa.int64()),
                }
            )

        parts = ds.map_batches(iter_partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(centroids, dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["qsum"], dtype=np.int64)
            counts[r["cluster"]] += r["count"]
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = (sums[nonempty] / _Q) / counts[nonempty, None]
        centroids = new / np.maximum(
            np.linalg.norm(new, axis=1, keepdims=True), 1e-12
        )

    return centroids


def kmeans_assign(
    ds,
    k: int = 8,
    iters: int = 4,
    column: str = "embedding",
    id_column: str = "vec_id",
):
    """(id, cluster) assignment Dataset after ``iters`` Lloyd iterations."""
    centroids = kmeans_fit(ds, k=k, iters=iters, column=column, id_column=id_column)

    def assign_batch(batch: pa.Table, cents=centroids) -> pa.Table:
        m = _unit_rows(batch, column)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "cluster": pa.array(_assign(m, cents), pa.int64()),
            }
        )

    return ds.map_batches(assign_batch, batch_format="pyarrow")


def semdedup(
    ds,
    k: int = 8,
    iters: int = 4,
    tau: float = 0.45,
    column: str = "embedding",
    id_column: str = "vec_id",
):
    """SemDeDup: greedy within-cluster semantic dedup.

    Returns (id, cluster, keep) — ``keep`` is False iff an earlier id in
    the same k-means cluster has ``round(cosine, 9) >= tau``.  The shuffle
    moves (id, cluster, vector); pairwise work never leaves a cluster."""
    centroids = kmeans_fit(ds, k=k, iters=iters, column=column, id_column=id_column)

    def tag_cluster(batch: pa.Table, cents=centroids) -> pa.Table:
        m = _unit_rows(batch, column)
        return pa.table(
            {
                id_column: batch.column(id_column),
                column: batch.column(column),
                "cluster": pa.array(_assign(m, cents), pa.int64()),
            }
        )

    def sweep(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_column), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        m = _unit_rows(group, column)[order]
        ids = ids[order]
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        kept_rows: list[int] = []
        for i in range(n):
            if kept_rows:
                sims = np.round(m[kept_rows] @ m[i], 9)
                if np.any(sims >= tau):
                    keep[i] = False
                    continue
            kept_rows.append(i)
        cluster = group.column("cluster")[0].as_py()
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array([cluster] * n, pa.int64()),
                "keep": pa.array(keep.tolist(), pa.bool_()),
            }
        )

    tagged = ds.map_batches(tag_cluster, batch_format="pyarrow")
    return tagged.groupby("cluster").map_groups(sweep, batch_format="pyarrow")


def label_centroids(
    ds,
    column: str = "embedding",
    label_column: str = "label",
):
    """Per-label embedding centroid sums — the prototype-classifier /
    class-mean building block, exact-integer end to end.

    Emits (label, dim, qsum_x1e6, n_vecs) where ``qsum_x1e6`` is the int64
    sum of ``round(component * 1e6)`` (half away from zero) over the
    label's vectors; the caller divides ``qsum / 1e6 / n_vecs`` for the
    float centroid.  Integer partial sums make the result independent of
    batch/block boundaries; the shuffle moves only (labels x dims) rows
    per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch.column(label_column)).astype(np.int64)
        flat = np.asarray(
            batch.column(column).combine_chunks().flatten(), dtype=np.float64
        )
        m = flat.reshape(batch.num_rows, -1)
        q = _quantize(m)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), dtype=np.int64)
        counts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, codes, q)
        np.add.at(counts, codes, 1)
        n_dims = m.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, n_dims), pa.int64()),
                "dim": pa.array(
                    np.tile(np.arange(1, n_dims + 1, dtype=np.int64), len(uniq)),
                    pa.int64(),
                ),
                "qsum_x1e6": pa.array(sums.reshape(-1), pa.int64()),
                "n_vecs": pa.array(np.repeat(counts, n_dims), pa.int64()),
            }
        )

    import pyarrow.compute as pc

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .sum(["qsum_x1e6", "n_vecs"])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "label": b.column("label"),
                "dim": b.column("dim"),
                "qsum_x1e6": pc.cast(b.column("sum(qsum_x1e6)"), pa.int64()),
                "n_vecs": pc.cast(b.column("sum(n_vecs)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def embedding_pca(
    ds,
    top_k: int = 4,
    column: str = "embedding",
    id_column: str = "vec_id",
):
    """Distributed PCA over an embedding column: the covariance fold is the
    textbook one-pass combiner (per-batch ``n, Σq, Σ q qᵀ`` partials — a
    k(d²+d)-byte row per batch, never the vectors), with the same
    determinism contract as ``kmeans_fit``:

    * vectors L2-normalized in float64, then QUANTIZED ``q = round(x·1e3)``
      (int64, half away from zero) — the folded quantities are integer
      sums/outer-products, immune to summation order; int64 holds
      Σ q qᵀ exactly to ~10¹² rows (|q| ≤ 1000);
    * covariance from the exact integer moments:
      ``Cov = (C/1e6 − outer(S,S)/(1e6·n)) / (n−1)`` in float64;
    * components: top ``top_k`` eigenvectors of Cov by descending
      eigenvalue (``np.linalg.eigh`` — deterministic on identical input
      bits), sign pinned so each component is positive at its
      largest-|loading| dim (first index on ties);
    * loadings/eigenvalues rounded to 9 decimals at the edge (repo round-9
      contract).

    Returns ``(component, dim, loading, eigenvalue)`` — ``top_k × d``
    rows.  The driver folds one small partial row per batch (the same
    driver-fold shape as ``kmeans_fit``; at extreme batch counts fold the
    partials in a fixed-order remote tree instead).
    """
    _QP = 1_000.0

    def partial(batch: pa.Table) -> pa.Table:
        m = _unit_rows(batch, column)
        q = (np.sign(m) * np.floor(np.abs(m) * _QP + 0.5)).astype(np.int64)
        c = q.T @ q  # integer matmul — numpy's own kernels, exact, no BLAS
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "s": pa.array([q.sum(axis=0)], pa.list_(pa.int64())),
                "c": pa.array([c.reshape(-1)], pa.list_(pa.int64())),
            }
        )

    parts = (
        ds.select_columns([id_column, column])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    empty = pa.table(
        {
            "component": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "loading": pa.array([], pa.float64()),
            "eigenvalue": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    n = sum(r["n"] for r in parts)
    if n < 2:  # covariance needs n-1 > 0
        return empty
    d = int(np.sqrt(len(parts[0]["c"])))
    s = np.zeros(d, dtype=np.int64)
    c = np.zeros(d * d, dtype=np.int64)
    for r in parts:
        s += np.asarray(r["s"], dtype=np.int64)
        c += np.asarray(r["c"], dtype=np.int64)
    c = c.reshape(d, d)
    cov = (c / (_QP * _QP) - np.outer(s, s) / (_QP * _QP * n)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:top_k]
    comps, dims, loads, eigs = [], [], [], []
    for rank, j in enumerate(order):
        v = evecs[:, j]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.extend([rank] * d)
        dims.extend(range(d))
        loads.extend(np.round(v, 9).tolist())
        eigs.extend([round(float(evals[j]), 9)] * d)
    return pa.table(
        {
            "component": pa.array(comps, pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "loading": pa.array(loads, pa.float64()),
            "eigenvalue": pa.array(eigs, pa.float64()),
        }
    )


def kcenter_coreset(ds, k: int = 8, column: str = "embedding",
                    id_column: str = "vec_id"):
    """Greedy k-center (farthest-point) coreset selection — the classic
    2-approximation for diverse subset selection over an embedding
    column.  Returns ``(sel_order, vec_id)``: the k selected ids in
    selection order.

    Deterministic spec (sequential golden recomputes it verbatim):
    vectors L2-normalize in float64; the first center is the smallest
    vec_id; each round selects the point whose ROUND-9 cosine to its
    nearest already-picked center is SMALLEST (i.e. the farthest point),
    ties by smaller vec_id.  Round-9 before comparison because BLAS GEMM
    blocking varies with batch shape (repo round-9 contract).

    Scale shape: the slim (id, unit-vector) dataset materializes once;
    each of the k rounds is ONE ``map_batches`` pass computing a
    per-batch ``(min round-9 best-sim, id)`` candidate against the
    broadcast ≤k×d center matrix, folded driver-side over O(blocks)
    rows.  k passes × O(n·k) flops total; the dataset never gathers.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data

    def slim(batch: pa.Table) -> pa.Table:
        m = _unit_rows(batch, column)
        return pa.table(
            {
                id_column: pc.cast(batch.column(id_column), pa.int64()),
                "unit": pa.array(list(m), pa.list_(pa.float64())),
            }
        )

    unit = ds.select_columns([id_column, column]).map_batches(
        slim, batch_format="pyarrow"
    ).materialize()

    # first center: globally smallest id — per-block (min id, vector)
    # partials, O(blocks) driver rows (NOT a driver stream of every block)
    def first_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "unit": pa.array([], pa.list_(pa.float64()))})
        ids = np.asarray(batch.column(id_column))
        j = int(np.argmin(ids))
        return pa.table({"id": pa.array([int(ids[j])], pa.int64()),
                         "unit": pa.array([batch.column("unit")[j].as_py()],
                                          pa.list_(pa.float64()))})

    first_rows = unit.map_batches(first_partial, batch_format="pyarrow").take_all()
    if not first_rows:
        return ray.data.from_arrow(
            pa.table({"sel_order": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64())})
        )
    fr = min(first_rows, key=lambda r: r["id"])
    centers_ids = [int(fr["id"])]
    centers_mat = np.asarray(fr["unit"], dtype=np.float64).reshape(1, -1)

    for _ in range(1, k):
        cref = ray.put(centers_mat)
        cids = pa.array(centers_ids, pa.int64())

        def candidate(batch: pa.Table, cref=cref, cids=cids) -> pa.Table:
            sub = batch.filter(
                pa.compute.invert(
                    pa.compute.is_in(batch.column(id_column), value_set=cids)
                )
            )
            if sub.num_rows == 0:
                return pa.table({"best": pa.array([], pa.float64()),
                                 "id": pa.array([], pa.int64()),
                                 "unit": pa.array([], pa.list_(pa.float64()))})
            flat = np.asarray(
                sub.column("unit").combine_chunks().flatten(), dtype=np.float64
            )
            m = flat.reshape(sub.num_rows, -1)
            sims = np.round(m @ ray.get(cref).T, 9).max(axis=1)
            ids = np.asarray(sub.column(id_column))
            # per-batch lexicographic min of (best, id); the winner's
            # VECTOR rides along so no per-center fetch scan is needed
            j = np.lexsort((ids, sims))[0]
            return pa.table({"best": pa.array([float(sims[j])], pa.float64()),
                             "id": pa.array([int(ids[j])], pa.int64()),
                             "unit": pa.array([sub.column("unit")[j].as_py()],
                                              pa.list_(pa.float64()))})

        # O(blocks) candidate rows fold on the driver
        best, bid, bvec = None, None, None
        for r in unit.map_batches(candidate, batch_format="pyarrow").take_all():
            s, i = r["best"], r["id"]
            if best is None or (s, i) < (best, bid):
                best, bid, bvec = s, i, r["unit"]
        if bid is None:
            break  # fewer than k points
        centers_ids.append(int(bid))
        centers_mat = np.vstack(
            [centers_mat, np.asarray(bvec, dtype=np.float64)]
        )

    return ray.data.from_arrow(
        pa.table(
            {
                "sel_order": pa.array(range(len(centers_ids)), pa.int64()),
                "vec_id": pa.array(centers_ids, pa.int64()),
            }
        )
    )
