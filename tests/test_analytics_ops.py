"""functions/analytics.py edge cases — the oracle-parity gate covers
the happy path at sf0.001/sf0.01; these pin the degenerate shapes
(duplicate frontier points, single-user cohorts, cross-block dedup,
the >64-item guard, OHLC single-row bars) against brute-force Python
references on seeded random inputs."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from kafka_connect_mongo_ray.functions.analytics import (
    cohort_retention,
    cooccurrence_counts,
    ohlc_bars,
    skyline_2d,
    weighted_priority_sample,
)

_US_PER_DAY = 86_400_000_000


def _events(n=400, users=25, days=9, types=5, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, users, n).astype(np.int64)
    day = rng.integers(0, days, n).astype(np.int64)
    ts = ((np.int64(20_000) + day) * _US_PER_DAY
          + rng.integers(0, _US_PER_DAY, n))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(u),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array([f"t{int(x)}" for x in
                                rng.integers(0, types, n)], pa.string()),
        "value": pa.array(rng.normal(size=n), pa.float64()),
    })


def test_cohort_retention_matches_pandas_reference():
    t = _events()
    # repartition so per-batch dedup + cross-block merge are exercised
    out = cohort_retention(ray.data.from_arrow(t).repartition(7),
                           user_col="user_id", ts_col="ts",
                           num_partitions=4).to_pandas()
    df = pd.DataFrame({"u": np.asarray(t["user_id"]),
                       "day": (np.asarray(t["ts"]).astype(np.int64)
                               // _US_PER_DAY)})
    a = df.drop_duplicates()
    d0 = a.groupby("u")["day"].transform("min")
    ref = (pd.DataFrame({"cohort": d0, "off": a["day"] - d0})
           .groupby(["cohort", "off"]).size().reset_index(name="n"))
    ref["cohort_day"] = ref["cohort"].astype("int64").astype(
        "datetime64[D]").astype(str)
    got = {(r.cohort_day, int(r.day_offset)): int(r.n_users)
           for r in out.itertuples()}
    want = {(r.cohort_day, int(r.off)): int(r.n) for r in ref.itertuples()}
    assert got == want
    # every user's cohort has an offset-0 row covering them exactly once
    assert (out[out.day_offset == 0].n_users.sum()
            == df["u"].nunique())


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts)
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force_with_duplicates():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 30, 200).astype(np.float64)
    y = rng.integers(0, 30, 200).astype(np.int64)
    # force duplicate points, some on the frontier
    x[10:14] = 0.0
    y[10:14] = y.max()
    t = pa.table({"id": pa.array(np.arange(200, dtype=np.int64)),
                  "x": pa.array(x, pa.float64()),
                  "y": pa.array(y, pa.int64())})
    out = skyline_2d(ray.data.from_arrow(t).repartition(6),
                     x_col="x", y_col="y").to_pandas()
    got = sorted(zip(out.x, out.y.astype(float)))
    want = _brute_skyline(list(zip(x, y.astype(float))))
    assert got == want
    # all four duplicated frontier twins survive
    assert (out.id.isin(range(10, 14))).sum() == 4


def test_weighted_sample_is_deterministic_and_weight_biased():
    n = 3000
    w = np.where(np.arange(n) < 100, 1_000_000, 100).astype(np.int64)
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                  "w": pa.array(w, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)
    out = weighted_priority_sample(ds, id_col="id", weight_cents_col="w",
                                   k=120, num_partitions=4).to_pandas()
    out2 = weighted_priority_sample(ds, id_col="id", weight_cents_col="w",
                                    k=120, num_partitions=4).to_pandas()
    assert list(out.id) == list(out2.id)          # pure function of keys
    assert len(out) == 120
    # the 100 heavy rows (10,000x weight) essentially all make the cut
    assert (out.id < 100).sum() >= 95
    # priorities are exactly (w * 2^33) / (2h+1) — spot-check one row
    import hashlib
    r = out.iloc[0]
    h = int(hashlib.md5(str(int(r.id)).encode()).hexdigest()[:8], 16)
    assert r.priority == (float(int(r.cents)) * 8589934592.0) / (2 * h + 1)


def test_cooccurrence_matches_itertools_reference():
    t = _events(n=600, users=40, types=6, seed=3)
    out = cooccurrence_counts(
        ray.data.from_arrow(t).repartition(8), user_col="user_id",
        item_col="event_type", num_partitions=4).to_pandas()
    sets = (pd.DataFrame({"u": np.asarray(t["user_id"]),
                          "i": np.asarray(t["event_type"]).astype(object)})
            .drop_duplicates().groupby("u")["i"].apply(set))
    want = {}
    for s in sets:
        for a, b in itertools.combinations(sorted(s), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r.type_a, r.type_b): int(r.n_users) for r in out.itertuples()}
    assert got == want


def test_cooccurrence_rejects_wide_item_domains():
    t = pa.table({"u": pa.array([1] * 70, pa.int64()),
                  "i": pa.array([f"x{i:03d}" for i in range(70)],
                                pa.string())})
    with pytest.raises(Exception, match="64 distinct items"):
        cooccurrence_counts(ray.data.from_arrow(t), user_col="u",
                            item_col="i", num_partitions=2).to_pandas()


def test_ohlc_matches_pandas_reference_and_handles_single_row_bars():
    t = _events(n=500, users=10, days=2, seed=19)
    out = ohlc_bars(ray.data.from_arrow(t).repartition(9),
                    key_col="event_type", ts_col="ts", val_col="value",
                    id_col="event_id", num_partitions=4).to_pandas()
    df = pd.DataFrame({
        "k": np.asarray(t["event_type"]).astype(object),
        "ts": np.asarray(t["ts"]).astype(np.int64),
        "id": np.asarray(t["event_id"]),
        "v": np.asarray(t["value"])})
    df["bar"] = (df.ts // 3_600_000_000) * 3_600_000_000
    ref = {}
    for (k, bar), g in df.groupby(["k", "bar"]):
        g = g.sort_values(["ts", "id"])
        ref[(k, int(bar))] = (g.v.iloc[0], g.v.max(), g.v.min(),
                              g.v.iloc[-1], len(g))
    got = {(r.event_type, int(r.bar_us)):
           (r.open, r.high, r.low, r.close, int(r.n))
           for r in out.itertuples()}
    assert got == ref
    # single-row bars exist in this fixture and have open==close==hi==lo
    singles = [v for v in ref.values() if v[4] == 1]
    assert singles and all(v[0] == v[1] == v[2] == v[3] for v in singles)


def test_rolling_active_users_matches_pandas_reference():
    from kafka_connect_mongo_ray.functions.analytics import (
        rolling_active_users,
    )

    t = _events(n=500, users=18, days=12, seed=23)
    out = rolling_active_users(
        ray.data.from_arrow(t).repartition(7), user_col="user_id",
        ts_col="ts", window_days=7, num_partitions=4).to_pandas()
    df = pd.DataFrame({"u": np.asarray(t["user_id"]),
                       "day": (np.asarray(t["ts"]).astype(np.int64)
                               // _US_PER_DAY)}).drop_duplicates()
    days = sorted(df.day.unique())
    want = {np.datetime64(int(d), "D").astype(str):
            df[(df.day >= d - 6) & (df.day <= d)].u.nunique()
            for d in days}
    got = dict(zip(out.day, out.wau.astype(int)))
    assert got == want
    # a window covering every active day must equal total distinct users
    wide = rolling_active_users(
        ray.data.from_arrow(t), user_col="user_id", ts_col="ts",
        window_days=12, num_partitions=4).to_pandas()
    assert int(wide.wau.max()) == df.u.nunique()


def test_gini_zero_for_equal_and_known_for_skewed():
    from kafka_connect_mongo_ray.functions.analytics import (
        gini_concentration,
    )

    eq = pa.table({"k": pa.array(np.arange(10, dtype=np.int64)),
                   "c": pa.array(np.full(10, 7, dtype=np.int64))})
    out = gini_concentration(ray.data.from_arrow(eq), key_col="k",
                             cents_col="c").to_pandas()
    assert out.gini.iloc[0] == 0.0 and int(out.n.iloc[0]) == 10
    # one key owns everything: G = (n-1)/n
    skew = pa.table({"k": pa.array(np.arange(5, dtype=np.int64)),
                     "c": pa.array([0, 0, 0, 0, 100], pa.int64())})
    out = gini_concentration(ray.data.from_arrow(skew), key_col="k",
                             cents_col="c").to_pandas()
    assert out.gini.iloc[0] == (5 - 1) / 5
    # per-key pre-aggregation: duplicate key rows sum before ranking
    dup = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                    "c": pa.array([3, 4, 7], pa.int64())})
    out = gini_concentration(ray.data.from_arrow(dup), key_col="k",
                             cents_col="c").to_pandas()
    assert out.gini.iloc[0] == 0.0 and int(out.total_cents.iloc[0]) == 14


def test_transition_counts_matches_lead_reference():
    from kafka_connect_mongo_ray.functions.analytics import (
        transition_counts,
    )

    t = _events(n=400, users=12, types=4, seed=31)
    prep = pa.table({"user_id": t["user_id"],
                     "ts_us": np.asarray(t["ts"]).astype(np.int64),
                     "event_id": t["event_id"],
                     "event_type": t["event_type"]})
    out = transition_counts(
        ray.data.from_arrow(prep).repartition(6), key_col="user_id",
        order_cols=["ts_us", "event_id"], state_col="event_type",
        num_partitions=4).to_pandas()
    df = (pd.DataFrame({"u": np.asarray(t["user_id"]),
                        "ts": np.asarray(t["ts"]).astype(np.int64),
                        "id": np.asarray(t["event_id"]),
                        "s": np.asarray(t["event_type"]).astype(object)})
          .sort_values(["u", "ts", "id"]))
    want = {}
    for _, g in df.groupby("u"):
        s = list(g.s)
        for a, b in zip(s, s[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r.from_type, r.to_type): int(r.n) for r in out.itertuples()}
    assert got == want
    # total transitions = rows - distinct users
    assert out.n.sum() == len(df) - df.u.nunique()


def test_chi2_zero_for_independent_and_known_for_dependent():
    from kafka_connect_mongo_ray.functions.analytics import (
        chi2_independence,
    )

    # perfectly proportional table -> chi2 == 0
    a = ["x"] * 40 + ["y"] * 20 + ["x"] * 20 + ["y"] * 10
    b = [0] * 60 + [1] * 30
    t = pa.table({"a": pa.array(a, pa.string()),
                  "b": pa.array(np.array(b, dtype=np.int64))})
    out = chi2_independence(ray.data.from_arrow(t).repartition(4),
                            a_col="a", b_col="b").to_pandas()
    assert out.chi2.iloc[0] == 0.0
    assert int(out.n.iloc[0]) == 90 and int(out.dof.iloc[0]) == 1
    # perfect dependence on a 2x2 with balanced margins -> chi2 == n
    a = ["x"] * 30 + ["y"] * 30
    b = [0] * 30 + [1] * 30
    t = pa.table({"a": pa.array(a, pa.string()),
                  "b": pa.array(np.array(b, dtype=np.int64))})
    out = chi2_independence(ray.data.from_arrow(t).repartition(3),
                            a_col="a", b_col="b").to_pandas()
    assert out.chi2.iloc[0] == 60.0


def test_new_ops_survive_extreme_user_skew():
    """One user owns 50% of all events (one bucket holds a fact-sized
    group): the bucketed kernels must stay correct — and the per-batch
    dedup bounds what that hot bucket receives for the pair-based ops."""
    from kafka_connect_mongo_ray.functions.analytics import (
        cohort_retention,
        cooccurrence_counts,
        transition_counts,
    )

    rng = np.random.default_rng(41)
    n = 20000
    u = rng.integers(1, 200, n).astype(np.int64)
    u[: n // 2] = 0  # the hot user
    day = rng.integers(0, 5, n).astype(np.int64)
    ts = (np.int64(20_000) + day) * _US_PER_DAY + rng.integers(
        0, _US_PER_DAY, n)
    types = np.array([f"t{i}" for i in range(6)], dtype=object)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(u),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "ts_us": pa.array(ts, pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 6, n)], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(16)

    ret = cohort_retention(ds, user_col="user_id", ts_col="ts",
                           num_partitions=8).to_pandas()
    df = pd.DataFrame({"u": u, "day": day}).drop_duplicates()
    d0 = df.groupby("u")["day"].transform("min")
    want_rows = (pd.DataFrame({"c": d0, "o": df.day - d0})
                 .groupby(["c", "o"]).size())
    assert int(ret.n_users.sum()) == int(want_rows.sum())

    co = cooccurrence_counts(ds, user_col="user_id",
                             item_col="event_type",
                             num_partitions=8).to_pandas()
    # the hot user has all 6 types -> contributes to every pair once
    assert len(co) == 15 and (co.n_users >= 1).all()

    tr = transition_counts(ds, key_col="user_id",
                           order_cols=["ts_us", "event_id"],
                           state_col="event_type",
                           num_partitions=8).to_pandas()
    assert int(tr.n.sum()) == n - pd.Series(u).nunique()


def test_transitions_and_chi2_keep_null_categories_like_sql():
    """SQL GROUP BY keeps NULL as a category; WHERE nxt IS NOT NULL
    filters only the TO side of a transition."""
    from kafka_connect_mongo_ray.functions.analytics import (
        chi2_independence,
        transition_counts,
    )

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "s": pa.array(["a", None, "b", None, None], pa.string())})
    out = transition_counts(ray.data.from_arrow(t), key_col="u",
                            order_cols=["o"], state_col="s",
                            num_partitions=2).to_pandas()
    got = {(r.from_type, r.to_type): int(r.n) for r in out.itertuples()}
    # user1: a->NULL dropped (to side), NULL->b kept; user2: NULL->NULL
    # dropped (to side)
    assert got == {(None, "b"): 1}

    t2 = pa.table({"a": pa.array(["x", "x", None, None], pa.string()),
                   "b": pa.array([0, 1, 0, 1], pa.int64())})
    out = chi2_independence(ray.data.from_arrow(t2), a_col="a",
                            b_col="b").to_pandas()
    # NULL is its own row category: 2x2 perfectly proportional table
    assert int(out.n.iloc[0]) == 4 and int(out.dof.iloc[0]) == 1
    assert out.chi2.iloc[0] == 0.0


def test_exact_rank_weighted_sums_vectorized_matches_python_ints():
    """The chunked int64 kernel equals the arbitrary-precision
    per-element reference on a 10^6-element domain whose Σ i·x is far
    beyond int64 (values up to 2^40 force small proof-bounded chunks),
    including negatives and zeros."""
    import numpy as np

    from kafka_connect_mongo_ray.functions.analytics import (
        _exact_rank_weighted_sums,
    )

    rng = np.random.default_rng(11)
    x = rng.integers(-(2**40), 2**40, size=1_000_000, dtype=np.int64)
    x[::1000] = 0
    x.sort()
    s0, s1 = _exact_rank_weighted_sums(x)
    assert s0 == sum(map(int, x))
    assert s1 == sum(int(v) * (i + 1) for i, v in enumerate(x))
    assert s1 > 2**63  # the naive int64 path would have overflowed
    assert _exact_rank_weighted_sums(np.array([], np.int64)) == (0, 0)
    assert _exact_rank_weighted_sums(np.zeros(5, np.int64)) == (0, 0)
