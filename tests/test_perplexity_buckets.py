"""CCNet-style perplexity bucketing: ntile parity with SQL semantics,
block-split invariance of the ordered-prefix rank assignment."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("n,k", [(1, 3), (2, 3), (3, 3), (4, 3), (7, 3),
                                 (100, 3), (10, 4), (17, 5), (5, 10)])
def test_ntile_matches_duckdb(n, k):
    import duckdb

    from spider_ray.ops.textstats import _ntile

    got = _ntile(np.arange(1, n + 1, dtype=np.int64), n, k)
    want = duckdb.sql(
        f"SELECT ntile({k}) OVER (ORDER BY r) AS b "
        f"FROM (SELECT unnest(generate_series(1, {n})) AS r) ORDER BY r"
    ).fetchnumpy()["b"]
    assert got.tolist() == want.tolist()


def test_block_split_invariance(ray_session):
    """The ordered-prefix rank assignment must not depend on how the
    sorted slim rows land in blocks."""
    import os

    import ray.data

    from spider_ray.ops.textstats import perplexity_buckets

    docs = ray.data.read_parquet(
        os.path.join("/root/testdata/sf0.001", "documents.parquet")
    )

    def canon(ds):
        df = ds.to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
        return df

    a = canon(perplexity_buckets(docs))
    b = canon(perplexity_buckets(docs.repartition(13)))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    # every (lang) group uses buckets 1..min(3, n) with sizes within 1
    for lang, g in a.groupby("lang"):
        sizes = g.bucket.value_counts()
        assert set(sizes.index) == set(range(1, min(3, len(g)) + 1))
        if len(g) >= 3:
            assert sizes.max() - sizes.min() <= 1
