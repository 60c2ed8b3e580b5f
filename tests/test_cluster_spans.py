"""Unit tests for the round-3 additions: duplicate n-gram spans,
deterministic k-means, SemDeDup, heuristic filter, unigram log-prob.

The sf0.01 oracle equality for each is covered by tests/test_goldens.py;
these tests pin the operator semantics on tiny hand-built inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _rows(ds):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in ds.take_all()
    )


class TestDupNgramSpans:
    def test_shared_run_marks_both_docs(self, ray_session):
        from spider_ray.ops.spans import dup_ngram_spans

        shared = "a b c d e f g h"  # exactly one 8-gram
        ds = _docs_ds([f"{shared} tail0 only0", f"head1 {shared} tail1"])
        rows = _rows(dup_ngram_spans(ds, k=8))
        # doc0: tokens 0..8 duplicated; doc1: tokens 1..9
        assert rows == [(0, 0, 8), (1, 1, 9)]

    def test_overlapping_hits_merge(self, ray_session):
        from spider_ray.ops.spans import dup_ngram_spans

        shared = "a b c d e f g h i j"  # three overlapping 8-grams
        ds = _docs_ds([shared, f"x {shared} y"])
        rows = _rows(dup_ngram_spans(ds, k=8))
        assert rows == [(0, 0, 10), (1, 1, 11)]

    def test_unique_text_emits_nothing(self, ray_session):
        from spider_ray.ops.spans import dup_ngram_spans

        ds = _docs_ds(["u0 u1 u2 u3 u4 u5 u6 u7 u8", "v0 v1 v2 v3 v4 v5 v6 v7 v8"])
        assert dup_ngram_spans(ds, k=8).count() == 0

    def test_within_doc_repeat_counts(self, ray_session):
        from spider_ray.ops.spans import dup_ngram_spans

        # the same 8 tokens twice INSIDE one doc -> count 2 corpus-wide
        run = "a b c d e f g h"
        ds = _docs_ds([f"{run} zz {run}", "unrelated words only here nothing shared at all"])
        rows = _rows(dup_ngram_spans(ds, k=8))
        assert rows == [(0, 0, 8), (0, 9, 17)]

    def test_case_insensitive_tokens(self, ray_session):
        from spider_ray.ops.spans import dup_ngram_spans

        ds = _docs_ds(["A b C d E f G h", "a B c D e F g H"])
        rows = _rows(dup_ngram_spans(ds, k=8))
        assert rows == [(0, 0, 8), (1, 0, 8)]

    def test_remove_dup_spans_cleans_symmetrically(self, ray_session):
        from spider_ray.ops.spans import remove_dup_spans

        shared = "a b c d e f g h"
        ds = _docs_ds([f"{shared} tail0 only0", f"head1 {shared} tail1"])
        rows = {r["doc_id"]: r for r in remove_dup_spans(ds, k=8).take_all()}
        assert rows[0]["clean_text"] == "tail0 only0"
        assert rows[1]["clean_text"] == "head1 tail1"
        assert rows[0]["n_removed"] == 8 and rows[0]["n_tokens"] == 10
        # docs without spans pass through (whitespace-normalized)
        ds2 = _docs_ds(["No Duplicates Here at all", "and a different doc"])
        rows2 = {r["doc_id"]: r for r in remove_dup_spans(ds2, k=8).take_all()}
        assert rows2[0]["clean_text"] == "no duplicates here at all"
        assert rows2[0]["n_removed"] == 0


def _emb_ds(vecs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    )


class TestKmeansSemdedup:
    def test_two_obvious_clusters(self, ray_session):
        from spider_ray.ops.cluster import kmeans_assign

        vecs = [(1, 0, 0), (0.9, 0.1, 0), (0, 0, 1), (0, 0.1, 0.9)]
        out = {r["vec_id"]: r["cluster"] for r in kmeans_assign(_emb_ds(vecs), k=2, iters=3).take_all()}
        assert out[0] == out[1]
        assert out[2] == out[3]
        assert out[0] != out[2]

    def test_semdedup_drops_near_identical(self, ray_session):
        from spider_ray.ops.cluster import semdedup

        vecs = [(1, 0, 0), (1, 0.001, 0), (0, 1, 0), (0, 0, 1)]
        rows = {r["vec_id"]: r["keep"] for r in semdedup(_emb_ds(vecs), k=2, iters=2, tau=0.99).take_all()}
        assert rows[0] is True  # smallest id in its cluster always kept
        assert rows[1] is False  # cos ~1 with vec 0
        assert rows[2] is True and rows[3] is True

    def test_assignment_batch_size_invariant(self, ray_session):
        """Centroids/assignments must not depend on how rows are batched."""
        import ray.data

        from spider_ray.ops.cluster import kmeans_assign

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(64, 8)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(range(64), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            }
        )
        one = ray.data.from_arrow(t)
        many = ray.data.from_arrow(t).repartition(13)
        a = sorted((r["vec_id"], r["cluster"]) for r in kmeans_assign(one, k=4, iters=3).take_all())
        b = sorted((r["vec_id"], r["cluster"]) for r in kmeans_assign(many, k=4, iters=3).take_all())
        assert a == b


class TestTextHeuristics:
    def test_heuristic_filter_gates(self, ray_session):
        from spider_ray.ops.textstats import heuristic_filter

        texts = [
            "short doc",  # n_words 2 < 10 -> drop
            "spam " * 20,  # one term 100% -> drop (max_tf, distinct gates)
            " ".join(f"w{i}" for i in range(30)),  # clean -> keep
        ]
        rows = {r["doc_id"]: r for r in heuristic_filter(_docs_ds(texts)).take_all()}
        assert rows[0]["keep"] is False and rows[0]["n_words"] == 2
        assert rows[1]["keep"] is False and rows[1]["max_tf"] == 20
        assert rows[2]["keep"] is True and rows[2]["n_distinct"] == 30

    def test_unigram_logprob_hapax_elision_exact(self, ray_session):
        """The pruned-broadcast path must equal the full-vocab direct sum."""
        import math

        from spider_ray.ops.textstats import unigram_logprob

        texts = ["the cat sat", "the dog sat down", "unique words here"]
        out = {r["doc_id"]: r for r in unigram_logprob(_docs_ds(texts)).take_all()}
        from collections import Counter

        c = Counter(w for t in texts for w in t.split())
        total = sum(c.values())

        def lp(term):
            x = math.log(c[term] / total) * 1e6
            return int(math.copysign(math.floor(abs(x) + 0.5), x))

        for doc_id, t in enumerate(texts):
            assert out[doc_id]["sum_logp_x1e6"] == sum(lp(w) for w in t.split())
            assert out[doc_id]["n_tokens"] == len(t.split())


class TestRelationalShapes:
    def test_revenue_forecast_empty_window(self, ray_session):
        import ray.data

        from spider_ray.ops.relational import revenue_forecast

        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_shipdate": pa.array([], pa.timestamp("us")),
                    "l_discount": pa.array([], pa.float64()),
                    "l_quantity": pa.array([], pa.float64()),
                    "l_extendedprice": pa.array([], pa.float64()),
                }
            )
        )
        out = revenue_forecast(li)
        assert out.column("revenue_x10000").to_pylist() == [0]
        assert out.column("n_rows").to_pylist() == [0]
