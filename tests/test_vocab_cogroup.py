"""Partitioned repeated-vocab scoring (VERDICT r3 #1).

Contracts:

1. mode parity — ``tfidf_top_terms`` / ``unigram_logprob`` /
   ``bigram_logprob`` produce BIT-IDENTICAL results in broadcast and
   cogroup modes (the cogroup partitions route every occurrence of a
   term / first-token to one place, so exact counts are local; distinct
   count values map through the same scalar ``math.log``).
2. bounded driver — on a high-vocabulary corpus with ``mode="auto"`` and
   a low ``broadcast_max_terms``, the engine switches to cogroup and NO
   vocabulary-sized dict is ever ``ray.put`` from the driver (guarded by
   a patched ``ray.put`` that rejects dicts above a fixed entry count).
"""

import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    import ray.data

    return ray.data.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )


def _canon(ds):
    df = ds.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("op", ["tfidf", "unigram", "bigram"])
def test_cogroup_matches_broadcast(ray_session, op):
    from spider_ray.ops.textstats import bigram_logprob, unigram_logprob
    from spider_ray.ops.tfidf import tfidf_top_terms

    fn = {"tfidf": tfidf_top_terms, "unigram": unigram_logprob,
          "bigram": bigram_logprob}[op]
    docs = _docs()
    a = _canon(fn(docs, mode="broadcast"))
    b = _canon(fn(docs, mode="cogroup"))
    assert len(a) and len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


@pytest.fixture()
def high_vocab_dir(tmp_path):
    # 400 docs x 25 unique terms, term t_k lives in docs 2m and 2m+1
    # -> every term has df == 2: repeated vocabulary of 5000 terms
    n_docs, per = 400, 25
    texts = [
        " ".join(f"t{(i // 2) * per + j}" for j in range(per))
        for i in range(n_docs)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    p = tmp_path / "docs.parquet"
    pq.write_table(t, p)
    return str(p)


@pytest.mark.parametrize("op", ["tfidf", "unigram", "bigram"])
def test_auto_high_vocab_bounded_driver(ray_session, monkeypatch,
                                        high_vocab_dir, op):
    import ray
    import ray.data

    from spider_ray.ops.textstats import bigram_logprob, unigram_logprob
    from spider_ray.ops.tfidf import tfidf_top_terms

    fn = {"tfidf": tfidf_top_terms, "unigram": unigram_logprob,
          "bigram": bigram_logprob}[op]
    docs = ray.data.read_parquet(high_vocab_dir)
    want = _canon(fn(docs, mode="broadcast"))

    orig_put = ray.put

    def guard_put(obj, *a, **k):
        if isinstance(obj, dict) and len(obj) > 1000:
            raise AssertionError(f"driver-side vocab dict of {len(obj)} entries")
        if isinstance(obj, tuple) and any(
            isinstance(x, dict) and len(x) > 1000 for x in obj
        ):
            raise AssertionError("driver-side vocab dict tuple")
        return orig_put(obj, *a, **k)

    monkeypatch.setattr(ray, "put", guard_put)
    got = _canon(fn(docs, mode="auto", broadcast_max_terms=100))
    pd.testing.assert_frame_equal(got, want, check_exact=True)
