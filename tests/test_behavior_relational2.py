"""Unit tests for the funnel / retention / Q4 / Q13 / Q5 / heavy-hitter ops
— edge cases the sf-level oracle compare can't isolate."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _events(rows):
    """rows: (user_id, ts_us, event_type)"""
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


HOUR = 3_600_000_000


def test_funnel_window_boundaries(ray_session):
    from spider_ray.ops.behavior import funnel_counts

    rows = [
        # u1: converts fully inside windows
        (1, 0, "view"), (1, HOUR, "signup"), (1, 2 * HOUR, "purchase"),
        # u2: signup exactly AT window end (excluded: [t, t+win))
        (2, 0, "view"), (2, 24 * HOUR, "signup"),
        # u3: signup BEFORE first view never counts
        (3, HOUR, "signup"), (3, 2 * HOUR, "view"),
        # u4: reaches signup (2h after view) but its only purchase precedes
        # the signup, so the purchase stage is not reached
        (4, 0, "view"), (4, HOUR, "purchase"), (4, 2 * HOUR, "signup"),
        # u5: second signup inside window rescues a too-late first one? no —
        # first signup >= view is at 25h, outside; the 1h one is pre-view
        (5, 2 * HOUR, "view"), (5, HOUR, "signup"), (5, 27 * HOUR, "signup"),
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(_events(rows), window_s=86400).take_all()
    }
    assert got == {"view": 5, "signup": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(ray_session):
    from spider_ray.ops.behavior import funnel_counts

    rows = [(1, 5, "view"), (1, 5, "signup"), (1, 5, "purchase")]
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(_events(rows), window_s=60).take_all()
    }
    assert got == {"view": 1, "signup": 1, "purchase": 1}


def test_retention_offsets(ray_session):
    from spider_ray.ops.behavior import retention_cohorts

    day = 86_400_000_000
    rows = [
        (1, 0, "view"), (1, day + 5, "view"), (1, day + 9, "view"),  # d0, d1
        (2, day, "view"), (2, 3 * day, "view"),                      # cohort d1
        (3, 0, "view"),                                              # d0 only
    ]
    got = {
        (r["cohort_day_s"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(_events(rows)).take_all()
    }
    assert got == {
        (0, 0): 2, (0, 1): 1,
        (86400, 0): 1, (86400, 2): 1,
    }


def _orders(rows):
    """rows: (orderkey, custkey, date_us, priority)"""
    return rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def test_order_priority_check_semantics(ray_session):
    from spider_ray.ops.relational import order_priority_check

    in_win = 838_857_600_000_000  # 1996-08-01 (inside the default window)
    out_win = 0
    orders = _orders(
        [
            (1, 1, in_win, "1-URGENT"),   # qualifies (one heavy line)
            (2, 1, in_win, "1-URGENT"),   # no heavy lineitem
            (3, 1, out_win, "1-URGENT"),  # heavy line but outside window
            (4, 1, in_win, "5-LOW"),      # two heavy lines -> counted ONCE
        ]
    )
    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
                "l_quantity": pa.array([50.0, 10.0, 50.0, 46.0, 49.0]),
            }
        )
    )
    got = {
        r["o_orderpriority"]: r["n_orders"]
        for r in order_priority_check(orders, li).take_all()
    }
    assert got == {"1-URGENT": 1, "5-LOW": 1}


def test_customer_distribution_includes_zero_and_drops_orphans(ray_session):
    from spider_ray.ops.relational import customer_order_distribution

    cust = rd.from_arrow(pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}))
    # cust 1 -> 2 orders, cust 2 -> 1, cust 3/4 -> 0; custkey 99 is an orphan
    orders = rd.from_arrow(
        pa.table({"o_custkey": pa.array([1, 1, 2, 99], pa.int64())})
    )
    got = {
        r["c_count"]: r["n_custs"]
        for r in customer_order_distribution(cust, orders).take_all()
    }
    assert got == {0: 2, 1: 1, 2: 1}


def test_regional_revenue_dim_chain(ray_session):
    from spider_ray.ops.relational import regional_revenue

    dims = pa.table(
        {
            "l_suppkey": pa.array([1, 2], pa.int64()),
            "n_name": pa.array(["A", "B"], pa.string()),
        }
    )
    li = rd.from_arrow(
        pa.table(
            {
                "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),  # 3 not in dims
                "l_extendedprice": pa.array([1.0, 2.0, 10.0, 5.0]),
                "l_discount": pa.array([0.0, 0.5, 0.1, 0.0]),
            }
        )
    )
    got = {r["n_name"]: (r["n_items"], r["revenue_x10000"])
           for r in regional_revenue(li, dims).take_all()}
    # A: 100*100 + 200*50 = 20000 ; B: 1000*90 = 90000
    assert got == {"A": (2, 20000), "B": (1, 90000)}


def test_heavy_hitters_exact_vs_bruteforce(ray_session):
    from collections import Counter

    from spider_ray.ops.heavyhitters import heavy_hitter_ngrams

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(400):
        toks = list(rng.choice(vocab, size=30))
        if i % 3 == 0:
            toks[0:3] = ["hot", "hot", "hot"]  # plant a heavy trigram
        texts.append(" ".join(toks))
    docs = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))

    # brute-force truth
    truth: Counter = Counter()
    for t in texts:
        toks = t.lower().split()
        truth.update(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
    total = sum(truth.values())
    want = {g: c for g, c in truth.items() if c * 200 >= total}
    assert want  # the planted gram must be heavy

    got = {
        r["gram"]: r["n"]
        for r in heavy_hitter_ngrams(docs, n=3, inv_phi=200, capacity=256).take_all()
    }
    assert got == want


def test_heavy_hitters_guarantee_guard(ray_session):
    from spider_ray.ops.heavyhitters import heavy_hitter_ngrams

    docs = rd.from_arrow(pa.table({"text": pa.array(["a b c"], pa.string())}))
    with pytest.raises(ValueError):
        heavy_hitter_ngrams(docs, inv_phi=5000, capacity=5000)


def test_event_transitions_ordering_and_boundaries(ray_session):
    from spider_ray.ops.behavior import event_transitions

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            # u1 out-of-order rows; tie on ts broken by event_id
            "ts": pa.array([30, 10, 20, 5, 5, 9], pa.timestamp("us")),
            "event_id": pa.array([3, 1, 2, 11, 10, 99], pa.int64()),
            "event_type": pa.array(["c", "a", "b", "y", "x", "solo"], pa.string()),
        }
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(rd.from_arrow(t)).take_all()
    }
    # u1: a->b->c ; u2: x->y (event_id tiebreak) ; u3: no pair
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("x", "y"): 1}


def test_rolling_active_users_window(ray_session):
    from spider_ray.ops.behavior import rolling_active_users

    day = 86_400_000_000
    t = pa.table(
        {
            "user_id": pa.array([1, 2, 1, 3, 1], pa.int64()),
            # days: u1 on d0 and d7 (outside window of each other), u2 d0,
            # u3 d6 (inside d0..d6? window end d6 covers d0..d6)
            "ts": pa.array([0, 5, 7 * day, 6 * day, 6 * day + 3],
                           pa.timestamp("us")),
        }
    )
    got = {
        r["day_s"]: (r["dau"], r["wau"])
        for r in rolling_active_users(rd.from_arrow(t)).take_all()
    }
    # d0: dau {1,2}; wau window d-6..d0 = {1,2}
    # d6: dau {1,3}; wau d0..d6 = {1,2,3}
    # d7: dau {1};   wau d1..d7 = {1,3}
    assert got == {0: (2, 2), 6 * 86400: (2, 3), 7 * 86400: (1, 2)}


def test_promo_revenue_integer_share(ray_session):
    from spider_ray.ops.relational import promo_revenue

    dims = pa.table(
        {
            "l_partkey": pa.array([1, 2], pa.int64()),
            "is_promo": pa.array([1, 0], pa.int8()),
        }
    )
    li = rd.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 1, 9], pa.int64()),  # 9: orphan
                "l_shipdate": pa.array(
                    [0, 0, 40 * 86_400_000_000, 0], pa.timestamp("us")
                ),  # Jan-1970 / Feb-1970
                "l_extendedprice": pa.array([1.0, 2.0, 3.0, 4.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
            }
        )
    )
    got = {
        r["ym"]: (r["promo_revenue_x10000"], r["total_revenue_x10000"])
        for r in promo_revenue(li, dims).take_all()
    }
    assert got == {197001: (10000, 30000), 197002: (30000, 30000)}


def test_skew_hot_user_transitions_linear(ray_session):
    """A single user holding 90% of events must not blow up any partition:
    the fold is one sort + one mask regardless of user skew."""
    from spider_ray.ops.behavior import event_transitions

    n = 20_000
    users = np.where(np.arange(n) % 10 == 0, np.arange(n), 7).astype(np.int64)
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(np.arange(n, dtype=np.int64), pa.timestamp("us")),
            "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "event_type": pa.array(
                np.where(np.arange(n) % 2 == 0, "a", "b"), pa.string()
            ),
        }
    )
    out = event_transitions(rd.from_arrow(t)).to_pandas()
    assert out["n"].sum() == n - len(np.unique(users))


def test_props_stats_malformed_and_missing(ray_session):
    from spider_ray.ops.semistruct import props_stats

    t = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "a", "a", "b"], pa.string()),
            "props": pa.array(
                ['{"k": 3}', '{"k": 3}', '{"x": 9}', "not json", None,
                 '{"k": -2}'],
                pa.string(),
            ),
        }
    )
    got = {
        r["event_type"]: (r["n_events"], r["k_sum"], r["k_min"], r["k_max"],
                          r["n_distinct_k"])
        for r in props_stats(rd.from_arrow(t)).take_all()
    }
    assert got == {"a": (2, 6, 3, 3, 1), "b": (1, -2, -2, -2, 1)}


def test_skew_heavy_hitters_degenerate_identical_docs(ray_session):
    """10^4 identical docs (the empty-doc/boilerplate collision case that
    kills naive LSH-style bucketing): every gram is heavy, summaries stay
    at capacity, output is exactly the distinct grams of the one text."""
    from spider_ray.ops.heavyhitters import heavy_hitter_ngrams

    text = "alpha beta gamma delta alpha beta"
    docs = rd.from_arrow(
        pa.table({"text": pa.array([text] * 10_000, pa.string())})
    )
    got = {
        r["gram"]: r["n"]
        for r in heavy_hitter_ngrams(docs, n=3, inv_phi=200, capacity=256).take_all()
    }
    # 4 distinct trigrams per doc ("alpha beta gamma", "beta gamma delta",
    # "gamma delta alpha", "delta alpha beta"), each once per doc
    assert got == {
        "alpha beta gamma": 10_000,
        "beta gamma delta": 10_000,
        "gamma delta alpha": 10_000,
        "delta alpha beta": 10_000,
    }


def test_session_stats_composition(ray_session):
    from spider_ray.ops.windows import session_stats

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            # u1: one 2-event session (gap 10 s) + one singleton; u2 singleton
            "ts": pa.array([0, 10_000_000, 7_200_000_000, 0], pa.timestamp("us")),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    row = session_stats(rd.from_arrow(t), gap_s=1800).to_pylist()[0]
    assert row == {
        "n_sessions": 3,
        "p50_events": 1,
        "p99_events": 2,
        "p50_duration_s": 0,
        "p99_duration_s": 10,
    }


def test_best_line_per_order_tiebreak(ray_session):
    from spider_ray.ops.relational import best_line_per_order

    li = rd.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
                # order 1: lines 2 and 15 tie on revenue -> lowest line wins
                "l_linenumber": pa.array([2, 15, 7, 1, 3], pa.int32()),
                "l_extendedprice": pa.array([5.0, 5.0, 1.0, 2.0, 9.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.1]),
            }
        )
    )
    got = {
        r["l_orderkey"]: (r["l_linenumber"], r["revenue_x10000"])
        for r in best_line_per_order(li).take_all()
    }
    # order 1: rev 50000 lines {2, 15} -> line 2; order 2: 900*90=81000 line 3
    assert got == {1: (2, 50000), 2: (3, 81000)}


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_event_ops_vs_bruteforce(ray_session, seed):
    """Randomized parity: engine vs sequential Python fold on the same
    event set (users/timestamps/types drawn adversarially small so ties
    and window edges actually occur)."""
    from collections import Counter, defaultdict

    from spider_ray.ops.behavior import (
        event_transitions,
        funnel_counts,
        retention_cohorts,
        rolling_active_users,
    )

    rng = np.random.default_rng(seed)
    n = 3000
    users = rng.integers(0, 40, n)
    ts = rng.integers(0, 10 * 86_400_000_000, n)  # 10 days, us
    types = rng.choice(["view", "signup", "purchase", "click"], n)
    eids = np.arange(n, dtype=np.int64)
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_id": pa.array(eids, pa.int64()),
                "event_type": pa.array(types, pa.string()),
            }
        )
    ).repartition(7)

    win = 86_400_000_000

    # --- funnel brute force
    per_user = defaultdict(list)
    for u, t, ty in zip(users, ts, types):
        per_user[int(u)].append((int(t), ty))
    f_want = {"view": 0, "signup": 0, "purchase": 0}
    for evs in per_user.values():
        v = min((t for t, ty in evs if ty == "view"), default=None)
        if v is None:
            continue
        f_want["view"] += 1
        s = min((t for t, ty in evs if ty == "signup" and v <= t < v + win),
                default=None)
        if s is None:
            continue
        f_want["signup"] += 1
        p = min((t for t, ty in evs if ty == "purchase" and s <= t < s + win),
                default=None)
        if p is not None:
            f_want["purchase"] += 1
    f_got = {r["stage"]: r["n_users"] for r in funnel_counts(ev).take_all()}
    assert f_got == f_want

    # --- retention brute force
    day_us = 86_400_000_000
    udays = defaultdict(set)
    for u, t in zip(users, ts):
        udays[int(u)].add(int(t) // day_us)
    r_want: Counter = Counter()
    for ds_ in udays.values():
        c = min(ds_)
        for d in ds_:
            r_want[(c * 86400, d - c)] += 1
    r_got = {
        (r["cohort_day_s"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).take_all()
    }
    assert r_got == dict(r_want)

    # --- transitions brute force
    t_want: Counter = Counter()
    for u in per_user:
        seq = sorted(
            ((int(t), int(e), ty) for t, e, ty in
             zip(ts[users == u], eids[users == u], types[users == u])),
        )
        for a, b in zip(seq, seq[1:]):
            t_want[(a[2], b[2])] += 1
    t_got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in event_transitions(ev).take_all()
    }
    assert t_got == dict(t_want)

    # --- rolling DAU/WAU brute force
    all_days = sorted({d for ds_ in udays.values() for d in ds_})
    ra_want = {}
    for d in all_days:
        dau = sum(1 for ds_ in udays.values() if d in ds_)
        wau = sum(1 for ds_ in udays.values()
                  if any(d - 6 <= x <= d for x in ds_))
        ra_want[d * 86400] = (dau, wau)
    ra_got = {
        r["day_s"]: (r["dau"], r["wau"])
        for r in rolling_active_users(ev).take_all()
    }
    assert ra_got == ra_want


def test_funnel_empty_input_keeps_stage_scaffold(ray_session):
    from spider_ray.ops.behavior import funnel_counts

    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1], pa.int64()),
                "ts": pa.array([0], pa.timestamp("us")),
                "event_type": pa.array(["click"], pa.string()),  # no funnel types
            }
        )
    )
    got = {r["stage"]: r["n_users"] for r in funnel_counts(ev).take_all()}
    assert got == {"view": 0, "signup": 0, "purchase": 0}


def test_session_stats_empty_input(ray_session):
    from spider_ray.ops.windows import session_stats

    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_id": pa.array([], pa.int64()),
            }
        )
    )
    row = session_stats(ev).to_pylist()[0]
    assert row["n_sessions"] == 0
    assert row["p50_events"] is None and row["p99_duration_s"] is None
