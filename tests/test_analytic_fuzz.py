"""Randomized-parameter oracle fuzz for the round-3 analytic ops
(inter-arrival quantiles, token-budget gate, event trigram top-k) —
Ray vs parameterized DuckDB SQL at sf0.001."""

import random
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
N_TRIALS = 5


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_interarrival_quantiles(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.windows import interarrival_quantiles

    rng = random.Random(5000 + trial)
    qs = tuple(sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.9, 0.95], 2)))
    names = tuple(f"q{int(q * 100)}" for q in qs)
    events = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    got = _canon(interarrival_quantiles(events, qs=qs, q_names=names).to_pandas())
    want = _canon(con.sql(f"""
        WITH d AS (SELECT event_type,
            epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS dt_us
            FROM events),
        g AS (SELECT event_type, dt_us::BIGINT AS dt_us FROM d
            WHERE dt_us IS NOT NULL)
        SELECT event_type, count(*)::BIGINT AS n_gaps,
            quantile_disc(dt_us, {qs[0]})::BIGINT AS {names[0]},
            quantile_disc(dt_us, {qs[1]})::BIGINT AS {names[1]}
        FROM g GROUP BY 1""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_token_budget_trim(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.sampling import token_budget_trim

    rng = random.Random(6000 + trial)
    budget = rng.choice([200, 800, 2_000, 6_000, 20_000])
    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    got = _canon(token_budget_trim(docs, budget_tokens=budget).to_pandas())
    want = _canon(con.sql(rf"""
        WITH t AS (SELECT doc_id, source,
            length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS tok
            FROM documents),
        c AS (SELECT doc_id, source, tok, sum(tok) OVER
            (PARTITION BY source ORDER BY doc_id) AS cum FROM t)
        SELECT source, count(*)::BIGINT AS n_docs_kept,
            sum(tok)::BIGINT AS n_tokens_kept,
            max(doc_id)::BIGINT AS last_doc_id
        FROM c WHERE cum <= {budget} GROUP BY 1""").df())
    assert len(got) == len(want), budget
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_event_trigrams(ray_session, con, trial):
    import ray.data

    from spider_ray.ops.behavior import event_trigrams

    rng = random.Random(7000 + trial)
    k = rng.choice([3, 8, 15, 40])
    events = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    got = _canon(event_trigrams(events, k=k).to_pandas())
    want = _canon(con.sql(f"""
        WITH o AS (SELECT event_type AS t0,
            lead(event_type, 1) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
            lead(event_type, 2) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS t2 FROM events)
        SELECT t0 || '>' || t1 || '>' || t2 AS trigram,
            count(*)::BIGINT AS n FROM o
        WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, trigram ASC LIMIT {k}""").df())
    assert len(got) == len(want), k
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_fuzz_temperature_mix(ray_session, con, trial):
    """Randomized (alpha, budget) parity for the α-sampling weights —
    the pow→round-1e6 quantization plus all-integer arithmetic must track
    the identical SQL expression for every parameter draw."""
    import ray.data

    from spider_ray.ops.sampling import temperature_mix

    rng = random.Random(8800 + trial)
    alpha = rng.choice([0.2, 0.3, 0.5, 0.7, 0.9])
    budget = rng.choice([500, 2_000, 5_000, 20_000])
    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
    )
    got = _canon(temperature_mix(docs, alpha=alpha, budget=budget).to_pandas())
    want = _canon(con.sql(f"""
        WITH n AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1),
        a AS (SELECT source, n,
              CAST(round(power(n, {alpha}) * 1e6) AS BIGINT) AS am FROM n),
        s AS (SELECT sum(am)::BIGINT AS tot FROM a),
        w AS (SELECT source,
              (({budget}::BIGINT * am * 100) // (tot * n))::BIGINT AS wx
              FROM a, s),
        c AS (SELECT d.doc_id, d.source, (wx // 100) +
              (CASE WHEN (d.doc_id * 2654435761) % 4294967296 <
               ((wx % 100) * 4294967296) // 100 THEN 1 ELSE 0 END) AS nrep
              FROM documents d JOIN w USING (source))
        SELECT doc_id, source,
          unnest(generate_series(0, (nrep - 1)::INT))::BIGINT AS copy_id
        FROM c WHERE nrep > 0""").df())
    assert len(got) == len(want), (alpha, budget)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
