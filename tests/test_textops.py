"""Unit tests for the webtext curation ops: PII scrub, Gopher quality,
stratified sampling, bigram top-k, sequence packing."""

import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_pii_scrubber_order_and_counts(ray_session):
    from spider_ray.ops.textclean import PiiScrubber

    # the URL embeds an email-shaped userinfo: URL masking first means the
    # email inside it is NOT double-counted
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": [
                "see http://user@host.example.com/x and mail me a@b.io from 1.2.3.4",
                "no pii here",
            ],
        }
    )
    out = _ds(t).map_batches(PiiScrubber(), batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_urls"] == 1
    assert out.loc[0, "n_emails"] == 1  # only a@b.io; the URL one was masked
    assert out.loc[0, "n_ips"] == 1
    assert out.loc[1, ["n_urls", "n_emails", "n_ips"]].tolist() == [0, 0, 0]
    assert out.loc[1, "clean_len"] == len("no pii here")


def test_gopher_quality_bounds(ray_session):
    from spider_ray.ops.textclean import GopherQuality

    good = " ".join(["the", "and", "a", "of"] * 5 + ["quality"] * 40)  # 60 words
    short = "too short"
    longwords = " ".join(["verylongword" + str(i) for i in range(60)])  # mean len > 10
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [good, short, longwords],
        }
    )
    out = _ds(t).map_batches(GopherQuality(), batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["keep"].tolist() == [True, False, False]
    assert out.loc[0, "n_words"] == 60
    assert out.loc[0, "n_stop"] == 20


def test_stratified_sample_deterministic(ray_session):
    from spider_ray.ops.sampling import KNUTH, MOD, stratified_sample

    n = 1000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": ["en" if i % 2 == 0 else "xx" for i in range(n)],
        }
    )
    out = stratified_sample(_ds(t), {"en": 0.5}).to_pandas()
    # xx stratum absent from rates -> dropped entirely
    assert set(out["lang"]) == {"en"}
    expect = {
        i for i in range(0, n, 2) if (i * KNUTH) % MOD < int(0.5 * MOD)
    }
    assert set(out["doc_id"]) == expect
    # re-run identical (no RNG state)
    out2 = stratified_sample(_ds(t), {"en": 0.5}).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_bigram_topk_ties_and_counts(ray_session):
    from spider_ray.ops.ngrams import bigram_topk

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["a b a b c", "A B z z"],  # "a b" x3 (case-folded), "b a" 1, ...
        }
    )
    out = bigram_topk(_ds(t), k=2).to_pandas()
    assert out.iloc[0].tolist() == ["a b", 3]
    # tie at n=1 broken by bigram string ascending
    assert out.iloc[1].tolist() == ["b a", 1]


def test_pack_sequences_spec(ray_session):
    from spider_ray.ops.packing import pack_sequences

    # part 0: docs 0,2,4 with 3,3,5 tokens, budget 6 -> bins [0,0,1]
    # oversized doc (8 tokens > budget) gets its own bin
    texts = {0: "x x x", 2: "y y y", 4: "z z z z z", 1: "w " * 8, 3: "v"}
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": [texts[i].strip() for i in sorted(texts)],
        }
    )
    out = (
        pack_sequences(_ds(t), budget=6, n_parts=2)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[0, "bin_id"] == 0 and out.loc[2, "bin_id"] == 0
    assert out.loc[4, "bin_id"] == 1
    # part 1: doc 1 (8 tokens, oversized) bin 0 alone; doc 3 starts bin 1
    assert out.loc[1, "bin_id"] == 0 and out.loc[3, "bin_id"] == 1
    assert out.loc[1, "n_tokens"] == 8


def test_broadcast_join(ray_session):
    from spider_ray.ops.relational import broadcast_join

    left = pa.table(
        {"k": pa.array([1, 2, 3, 2], pa.int64()), "v": pa.array([10, 20, 30, 21], pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array([1, 2], pa.int64()), "name": ["one", "two"]}
    )
    out = (
        broadcast_join(_ds(left), right, keys="k", right_keys="rk", concurrency=2)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    # inner join drops k=3; both k=2 rows joined
    assert out["k"].tolist() == [1, 2, 2]
    assert out["name"].tolist() == ["one", "two", "two"]


def test_tfidf_top_terms(ray_session):
    import math

    from spider_ray.ops.tfidf import tfidf_top_terms

    # "rare" appears in 1 of 3 docs -> highest idf; "common" in all 3
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "common rare rare other",
                "common other xx",
                "common yy zz",
            ],
        }
    )
    out = (
        tfidf_top_terms(_ds(t), k=2, concurrency=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert d0.iloc[0]["term"] == "rare"  # tf=2 x highest idf
    n, df_rare = 3, 1
    expect = round(2 * (math.log((1 + n) / (1 + df_rare)) + 1.0), 9)
    assert d0.iloc[0]["score"] == expect
    assert (out.groupby("doc_id")["rank"].max() == 2).all()


def test_shard_shuffle_deterministic(ray_session):
    from spider_ray.ops.sampling import KNUTH, MOD, shard_shuffle

    n = 200
    t = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    out = shard_shuffle(_ds(t), n_shards=4).to_pandas().sort_values("pos")
    # permutation is the (knuth-hash, id) order
    expect = sorted(range(n), key=lambda i: ((i * KNUTH) % MOD, i))
    assert out["doc_id"].tolist() == expect
    assert out["shard"].tolist() == [p % 4 for p in range(n)]
    # shards are balanced
    assert out.groupby("shard").size().tolist() == [50, 50, 50, 50]
    # identical on re-run (no RNG state)
    out2 = shard_shuffle(_ds(t), n_shards=4).to_pandas().sort_values("pos")
    assert out2["doc_id"].tolist() == expect


def test_tfidf_hapax_elision_bounded_broadcast(ray_session):
    """The broadcast DF map holds only repeated terms (df>=2) — hapax terms
    are elided with zero score change (exactness vs the sequential spec)."""
    import ray

    from spider_ray.goldens import seq_tfidf
    from spider_ray.ops.tfidf import repeated_term_df_map, tfidf_top_terms

    ids = list(range(40))
    # each doc: 1 shared term + 5 unique hapax terms → vocab is ~86% hapax
    texts = [f"shared uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e" for i in ids]
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                       "text": texts}))
    df_map = repeated_term_df_map(ds)
    assert df_map == {"shared": 40}  # 200 hapax terms elided from broadcast

    got = (
        tfidf_top_terms(ds, k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        seq_tfidf(ids, texts, k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
