"""semi_join_ids: broadcast vs cogroup parity, semi vs anti, table id side."""

from __future__ import annotations

import pyarrow as pa
import pytest

from spider_ray.ops.joins import semi_join_ids


@pytest.fixture()
def docs(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": ["a", "b", "c", "d", "e"],
                "lang": ["en", "en", "fr", "fr", "de"],
            }
        )
    )


IDS = pa.table({"doc_id": pa.array([2, 4, 4, 9], pa.int64())})  # dup + miss


def _sorted(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_semi_broadcast_vs_cogroup(docs):
    want = _sorted(semi_join_ids(docs, IDS, mode="broadcast"))
    got = _sorted(semi_join_ids(docs, IDS, mode="cogroup"))
    assert want["doc_id"].tolist() == [2, 4]
    assert got.equals(want)
    assert list(got.columns) == ["doc_id", "text", "lang"]


def test_anti_broadcast_vs_cogroup(docs):
    want = _sorted(semi_join_ids(docs, IDS, anti=True, mode="broadcast"))
    got = _sorted(semi_join_ids(docs, IDS, anti=True, mode="cogroup"))
    assert want["doc_id"].tolist() == [1, 3, 5]
    assert got.equals(want)


def test_empty_id_side(docs):
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    assert semi_join_ids(docs, empty, mode="broadcast").count() == 0
    assert semi_join_ids(docs, empty, anti=True, mode="broadcast").count() == 5
    assert semi_join_ids(docs, empty, mode="cogroup").count() == 0
    assert semi_join_ids(docs, empty, anti=True, mode="cogroup").count() == 5


def test_dedup_against_corpus_modes(ray_session):
    """New-vs-reference exact dedup drops exactly the texts the reference
    already holds, in both filter shapes."""
    import ray.data

    from spider_ray.ops.dedup import dedup_against_corpus

    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                "text": ["seen one", "fresh a", "seen two", "fresh b"],
            }
        )
    )
    ref = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["seen one", "seen two", "seen three"],
            }
        )
    )
    for mode in ("broadcast", "cogroup"):
        out = (
            dedup_against_corpus(new, ref, mode=mode)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [11, 13], mode
        assert list(out.columns) == ["doc_id", "text"]


def test_dataset_id_side(docs, ray_session):
    import ray.data

    ids_ds = ray.data.from_arrow(IDS)
    got = _sorted(semi_join_ids(docs, ids_ds, mode="auto"))
    assert got["doc_id"].tolist() == [2, 4]


def test_bloom_tier_matches_broadcast_and_cogroup(ray_session):
    """Bloom semi/anti == frozenset broadcast == cogroup on the same input
    (the verify pass makes the bloom tier exact despite false positives)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from spider_ray.ops.joins import semi_join_ids, semi_join_ids_bloom

    rng = np.random.default_rng(3)
    wide = pa.table(
        {
            "doc_id": pa.array(np.arange(5000, dtype=np.int64)),
            "payload": pa.array([f"p{i}" for i in range(5000)], pa.string()),
        }
    )
    ids = pa.table(
        {"doc_id": pa.array(rng.choice(5000, size=700, replace=False).astype(np.int64))}
    )
    for anti in (False, True):
        got = sorted(
            r["doc_id"]
            for r in semi_join_ids_bloom(
                rd.from_arrow(wide).repartition(5), ids, anti=anti
            ).take_all()
        )
        want_b = sorted(
            r["doc_id"]
            for r in semi_join_ids(
                rd.from_arrow(wide).repartition(5), ids, anti=anti, mode="broadcast"
            ).take_all()
        )
        want_c = sorted(
            r["doc_id"]
            for r in semi_join_ids(
                rd.from_arrow(wide).repartition(5), ids, anti=anti, mode="cogroup"
            ).take_all()
        )
        assert got == want_b == want_c, anti


def test_bloom_negative_never_lies(ray_session):
    """A bloom NEGATIVE must be a true absence: every actual member tests
    positive (no false negatives, the property the fast path relies on)."""
    import numpy as np

    from spider_ray.ops.joins import _bloom_hash, build_id_bloom
    import pyarrow as pa
    import ray.data as rd

    ids = np.arange(0, 100_000, 7, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    bits, m = build_id_bloom(ds, "doc_id", len(ids))
    member = np.ones(len(ids), dtype=bool)
    for i in range(4):
        h = _bloom_hash(ids, i, m)
        member &= ((bits[h >> 3] >> (h & 7).astype(np.uint8)) & 1).astype(bool)
    assert member.all()
