"""Unit tests for corpus-statistics operators (ops/corpusstats.py):
quantile rank semantics, posting-list cap, decontamination edges."""

from __future__ import annotations

import math
import random

import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_group_quantiles_rank_semantics(ray_session):
    """Histogram-fold quantiles == value at 1-based rank ceil(q*n) of the
    sorted group (the quantile_disc definition)."""
    from spider_ray.ops.corpusstats import group_quantiles

    rng = random.Random(11)
    rows = []
    for lang in ("aa", "bb"):
        for i in range(rng.randint(5, 60)):
            rows.append({"doc_id": len(rows), "lang": lang, "n_chars": rng.randint(0, 50)})
    out = group_quantiles(_docs_ds(rows), qs=(0.5, 0.9, 0.99))
    by_lang = {r["lang"]: r for r in out.to_pylist()}
    for lang in ("aa", "bb"):
        vals = sorted(r["n_chars"] for r in rows if r["lang"] == lang)
        n = len(vals)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert by_lang[lang][name] == vals[max(1, math.ceil(q * n)) - 1]


def test_posting_lists_cap_and_df(ray_session):
    """df counts ALL docs containing the term; posting is capped at max_ids."""
    from spider_ray.ops.corpusstats import posting_lists

    rows = [{"doc_id": i, "text": "common word" if i % 2 == 0 else "common"} for i in range(20)]
    out = {r["term"]: r for r in posting_lists(_docs_ds(rows), max_ids=3).take_all()}
    assert out["common"]["df"] == 20
    assert out["common"]["posting"] == "0,1,2"
    assert out["word"]["df"] == 10
    assert out["word"]["posting"] == "0,2,4"


def test_posting_lists_dedups_within_doc(ray_session):
    from spider_ray.ops.corpusstats import posting_lists

    rows = [{"doc_id": 7, "text": "x x x y"}]
    out = {r["term"]: r for r in posting_lists(_docs_ds(rows)).take_all()}
    assert out["x"]["df"] == 1 and out["x"]["posting"] == "7"


def test_decontaminate_planted_overlap(ray_session):
    """A doc sharing a 3-gram with the benchmark split is flagged; a doc
    with no shared 3-gram (even sharing unigrams) is not; short docs
    (< n tokens) are never flagged."""
    from spider_ray.ops.corpusstats import decontaminate

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},        # benchmark (0 % 5 == 0)
        {"doc_id": 1, "text": "zzz alpha beta gamma qqq"},      # shares "alpha beta gamma"
        {"doc_id": 2, "text": "gamma beta alpha"},               # same words, no shared 3-gram
        {"doc_id": 3, "text": "alpha beta"},                     # too short for a 3-gram
    ]
    out = {r["doc_id"]: r["contaminated"] for r in
           decontaminate(_docs_ds(rows), n=3, bench_mod=5, concurrency=1).take_all()}
    assert 0 not in out  # benchmark rows excluded from output
    assert out == {1: True, 2: False, 3: False}


def test_repetition_stats_counts(ray_session):
    """'a b a b a' has bigrams [ab, ba, ab, ba] -> 4 total, all duplicated;
    a no-repeat doc has zero dup mass; short docs report zeros."""
    from spider_ray.ops.corpusstats import repetition_stats

    rows = [
        {"doc_id": 0, "text": "a b a b a"},
        {"doc_id": 1, "text": "x y z"},
        {"doc_id": 2, "text": "solo"},
    ]
    out = {r["doc_id"]: (r["n_bigrams"], r["n_dup_bigrams"])
           for r in repetition_stats(_docs_ds(rows)).take_all()}
    assert out == {0: (4, 4), 1: (2, 0), 2: (0, 0)}


def test_top_terms_ties_break_on_term(ray_session):
    from spider_ray.ops.corpusstats import top_terms_per_group

    rows = [{"doc_id": 0, "lang": "en", "text": "b a b a c"}]
    out = top_terms_per_group(_docs_ds(rows), k=2).take_all()
    out.sort(key=lambda r: r["rank"])
    assert [(r["term"], r["n"], r["rank"]) for r in out] == [("a", 2, 1), ("b", 2, 2)]


def test_dataset_split_deterministic_and_partition(ray_session):
    from spider_ray.ops.sampling import dataset_split, KNUTH

    rows = [{"doc_id": i, "text": ""} for i in range(500)]
    out = {r["doc_id"]: r["split"] for r in dataset_split(_docs_ds(rows)).take_all()}
    assert len(out) == 500
    for i, s in out.items():
        b = (i * KNUTH) % (1 << 32) % 100
        assert s == ("train" if b < 80 else "val" if b < 90 else "test")


def test_class_balance_minority_size_and_determinism(ray_session):
    from spider_ray.ops.sampling import class_balance

    rows = [{"doc_id": i, "lang": "en" if i < 40 else "fr"} for i in range(50)]
    out = class_balance(_docs_ds(rows)).take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 10 and len(by_lang["fr"]) == 10  # minority = 10
    out2 = class_balance(_docs_ds(rows)).take_all()
    assert sorted((r["lang"], r["doc_id"]) for r in out) == \
           sorted((r["lang"], r["doc_id"]) for r in out2)


def test_decontaminate_external_eval_set(ray_session):
    """bench_texts path: every corpus doc checked against the external set,
    none excluded."""
    from spider_ray.ops.corpusstats import decontaminate

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 1, "text": "unrelated words here"},
    ]
    out = {r["doc_id"]: r["contaminated"] for r in decontaminate(
        _docs_ds(rows), n=3, concurrency=1,
        bench_texts=["xxx alpha beta gamma yyy"],
    ).take_all()}
    assert out == {0: True, 1: False}


def test_posting_partial_merge_lossless(ray_session):
    """Property: capped per-batch smallest-ids merge == brute-force posting
    over any repartitioning."""
    import random

    from spider_ray.ops.corpusstats import posting_lists

    rng = random.Random(5)
    vocab = ["w%d" % i for i in range(6)]
    rows = [{"doc_id": i, "text": " ".join(rng.sample(vocab, rng.randint(1, 4)))}
            for i in range(200)]
    brute: dict[str, list[int]] = {}
    for r in rows:
        for t in set(r["text"].split()):
            brute.setdefault(t, []).append(r["doc_id"])
    for parts in (1, 7):
        ds = _docs_ds(rows).repartition(parts)
        out = {r["term"]: r for r in posting_lists(ds, max_ids=5).take_all()}
        assert set(out) == set(brute)
        for t, ids in brute.items():
            assert out[t]["df"] == len(ids)
            assert out[t]["posting"] == ",".join(map(str, sorted(ids)[:5]))
