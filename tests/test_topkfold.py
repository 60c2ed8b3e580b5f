"""The shared partial-top-k fold (ops/topkfold.py) and the r5 driver
discipline of the block-pair similarity ops.

1. mode parity — ``fold_mode="driver"`` and ``fold_mode="cogroup"`` are
   bit-identical for brute_force_top_k and pq_top_k (same total-order
   spec, different fold topology).
2. bounded driver — during knn_graph CONSTRUCTION no candidate
   ``pa.Table`` is ever ``ray.get``-ed into the driver: pair-task
   outputs flow object-store -> ``from_arrow_refs`` -> co-group, and
   empty input blocks are skipped by metadata row counts (the r4 code
   fetched every block AND every pair result).
3. the empty-input edge of the helper (schema-preserving empty fold).
"""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n: int = 240, dim: int = 8, seed: int = 11) -> pa.Table:
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float64)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(vecs.tolist(),
                                  pa.list_(pa.float64())),
        }
    )


@pytest.fixture()
def emb_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_emb_table()).repartition(6)


def test_brute_force_fold_mode_parity(emb_ds):
    from spider_ray.ops.similarity import brute_force_top_k

    q = np.asarray(_emb_table().column("embedding").to_pylist()[:4])
    a = brute_force_top_k(emb_ds, q, k=7, fold_mode="driver")
    b = brute_force_top_k(emb_ds, q, k=7, fold_mode="cogroup")
    assert a.equals(b)
    assert a.num_rows == 4 * 7


def test_pq_fold_mode_parity(emb_ds):
    from spider_ray.ops.similarity import pq_top_k

    q = np.asarray(_emb_table().column("embedding").to_pylist()[:3])
    a = pq_top_k(emb_ds, q, k=5, m=4, nbits=4, fold_mode="driver")
    b = pq_top_k(emb_ds, q, k=5, m=4, nbits=4, fold_mode="cogroup")
    assert a.equals(b)
    assert a.num_rows == 3 * 5


def test_fold_unknown_mode_raises(emb_ds):
    from spider_ray.ops.topkfold import fold_partial_topk

    with pytest.raises(ValueError):
        fold_partial_topk(emb_ds, 3, [("vec_id", "ascending")],
                          mode="shuffle")


def test_fold_empty_input(ray_session):
    import ray.data as rd

    from spider_ray.ops.topkfold import fold_partial_topk

    empty = pa.table(
        {"g": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}
    )
    out = fold_partial_topk(rd.from_arrow(empty), 3,
                            [("v", "descending")], group_col="g")
    assert out.num_rows == 0
    assert set(out.column_names) == {"g", "v", "rank"}


def test_auto_mode_routing(emb_ds, monkeypatch):
    """fold_mode='auto': est_rows above DRIVER_ROW_BOUND routes through
    the cogroup fold (proven by forbidding the driver-path iter_batches),
    below or absent stays on the driver path; results bit-identical."""
    from spider_ray.ops import topkfold
    from spider_ray.ops.similarity import brute_force_top_k

    q = np.asarray(_emb_table().column("embedding").to_pylist()[:3])
    want = brute_force_top_k(emb_ds, q, k=5, fold_mode="driver")

    calls = {"cogroup": 0}
    orig = topkfold._cogroup_fold

    def spy(*a, **k):
        calls["cogroup"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(topkfold, "_cogroup_fold", spy)
    low = brute_force_top_k(emb_ds, q, k=5, fold_mode="auto", est_rows=10)
    assert calls["cogroup"] == 0
    high = brute_force_top_k(
        emb_ds, q, k=5, fold_mode="auto",
        est_rows=topkfold.DRIVER_ROW_BOUND + 1,
    )
    assert calls["cogroup"] == 1
    assert low.equals(want) and high.equals(want)


def test_cogroup_fold_bounded_driver(emb_ds, monkeypatch):
    """On the cogroup path the only tables ray.get pulls to the driver are
    the O(groups·k) winner tables — never the partial volume."""
    import ray

    from spider_ray.ops.similarity import brute_force_top_k

    q = np.asarray(_emb_table().column("embedding").to_pylist()[:4])
    k = 7
    fetched = []
    orig_get = ray.get

    def guard_get(refs, *a, **kw):
        out = orig_get(refs, *a, **kw)
        for o in out if isinstance(out, list) else [out]:
            if isinstance(o, pa.Table):
                fetched.append(o.num_rows)
        return out

    monkeypatch.setattr(ray, "get", guard_get)
    res = brute_force_top_k(emb_ds, q, k=k, fold_mode="cogroup")
    monkeypatch.setattr(ray, "get", orig_get)
    bound = len(q) * k
    assert all(r <= bound for r in fetched), fetched
    assert res.num_rows == bound


def test_knn_graph_bounded_driver(ray_session, monkeypatch):
    """knn_graph construction must not ray.get any pyarrow.Table into the
    driver — candidates go object-store -> from_arrow_refs, empty blocks
    are skipped via block METADATA."""
    import ray
    import ray.data as rd

    from spider_ray.ops import similarity

    ds = rd.from_arrow(_emb_table(n=200)).repartition(4)

    fetched_tables = []
    orig_get = ray.get

    def guard_get(refs, *a, **k):
        out = orig_get(refs, *a, **k)
        objs = out if isinstance(out, list) else [out]
        for o in objs:
            if isinstance(o, pa.Table):
                fetched_tables.append(o.num_rows)
        return out

    monkeypatch.setattr(ray, "get", guard_get)
    # small blocks force a multi-block pair fan-out (several pair tasks)
    graph_ds = similarity.knn_graph(ds, k=5, target_block_rows=32)
    monkeypatch.setattr(ray, "get", orig_get)

    assert fetched_tables == [], (
        f"driver fetched candidate tables of sizes {fetched_tables}"
    )

    # and the result is still the exact graph: every vector has k ranked
    # neighbors, ranks 1..k, no self-edges
    out = graph_ds.take_all()
    assert len(out) == 200 * 5
    by_vec = {}
    for r in out:
        assert r["vec_id"] != r["neighbor_id"]
        by_vec.setdefault(r["vec_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_vec.values())
