"""Eleventh-session operator family: SCD Type-2 validity intervals,
per-key time-weighted averages, grouped Shannon entropy, and the Welch
t-test components.

Each test checks the DISTRIBUTED result against an independent local
ground truth (DuckDB window SQL or a direct closed form) on inputs
chosen to exercise the partitioning seams: keys split across input
blocks, tombstone-only keys, single-observation keys, zero-duration
ties, and cross-batch partial-count merges."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


# ---------------------------------------------------------------------------
# validity_intervals (SCD2)


def _scd2(t: pa.Table, **kw):
    from kafka_connect_mongo_ray.functions.ranking import validity_intervals

    df = validity_intervals(_ds(t, 6), key_cols=["k"],
                            order_cols=["ts", "inc"], ts_col="ts",
                            op_col="op", num_partitions=4, **kw).to_pandas()
    if len(df) == 0:
        return df  # schema-less empty (all rows filtered)
    return df.sort_values(["k", "valid_from"]).reset_index(drop=True)


def test_scd2_intervals_match_sql_lead():
    rng = np.random.default_rng(5)
    n = 3000
    k = rng.integers(0, 200, size=n)
    # unique ts so the (k, valid_from) test sort is deterministic; the
    # tied-ts seam is pinned by test_twa_single_row_and_all_tied_keys
    ts = rng.choice(1_000_000, size=n, replace=False).astype(np.int64)
    inc = np.arange(n)  # unique log position breaks ts ties
    op = np.where(rng.random(n) < 0.1, "d", "u").astype(object)
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "inc": pa.array(inc, pa.int64()),
                  "op": pa.array(op, pa.string()),
                  "payload": pa.array(inc, pa.int64())})
    got = _scd2(t)[["k", "valid_from", "valid_to", "is_current"]]
    want = duckdb.sql("""
        WITH w AS (SELECT k, ts, op,
                          LEAD(ts) OVER (PARTITION BY k
                                         ORDER BY ts, inc) AS nxt,
                          ROW_NUMBER() OVER (PARTITION BY k
                                             ORDER BY ts DESC, inc DESC)
                          AS rdesc
                   FROM t)
        SELECT k, ts AS valid_from, nxt AS valid_to,
               (rdesc = 1) AS is_current
        FROM w WHERE op <> 'd'
        ORDER BY k, valid_from
    """).df().reset_index(drop=True)
    got["valid_to"] = got["valid_to"].astype("float64")
    want["valid_to"] = want["valid_to"].astype("float64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_scd2_tombstone_only_key_emits_nothing_and_closes():
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array([10, 20, 30, 5, 7], pa.int64()),
        "inc": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "op": pa.array(["i", "u", "d", "d", "i"], pa.string()),
    })
    got = _scd2(t)
    # key 2 (tombstone only) emits nothing; key 1's last upsert is
    # CLOSED by its tombstone; key 3 stays open/current
    assert got["k"].tolist() == [1, 1, 3]
    assert got["valid_to"].tolist()[:2] == [20, 30]
    assert got["is_current"].tolist() == [False, False, True]


# ---------------------------------------------------------------------------
# time_weighted_avg


def _twa(t: pa.Table):
    from kafka_connect_mongo_ray.functions.ranking import time_weighted_avg

    return (time_weighted_avg(_ds(t, 6), key="k",
                              order_cols=["ts", "i"], ts_col="ts",
                              val_col="v", out_col="twa",
                              num_partitions=4)
            .to_pandas().sort_values("k").reset_index(drop=True))


def test_twa_matches_sql_and_drops_degenerate_keys():
    rng = np.random.default_rng(7)
    n = 4000
    k = rng.integers(0, 150, size=n)
    ts = rng.integers(0, 1_000_000, size=n)
    v = rng.integers(-500, 500, size=n)
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "ts": pa.array(ts, pa.int64()),
                  "i": pa.array(np.arange(n), pa.int64()),
                  "v": pa.array(v, pa.int64())})
    got = _twa(t)
    want = duckdb.sql("""
        WITH l AS (SELECT k, v,
                          LEAD(ts) OVER (PARTITION BY k
                                         ORDER BY ts, i) - ts AS dur
                   FROM t)
        SELECT k, CAST(SUM(v*dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE)
               AS twa
        FROM l WHERE dur IS NOT NULL
        GROUP BY k HAVING SUM(dur) > 0
        ORDER BY k
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_twa_single_row_and_all_tied_keys_emit_nothing():
    t = pa.table({"k": pa.array([1, 2, 2, 3, 3], pa.int64()),
                  "ts": pa.array([5, 9, 9, 1, 4], pa.int64()),
                  "i": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "v": pa.array([7, 3, 9, 10, 20], pa.int64())})
    got = _twa(t)
    # key 1: single obs; key 2: two obs at the SAME ts (den=0) — both
    # dropped. key 3: v=10 held for 3 ticks -> twa = 10.0
    assert got["k"].tolist() == [3]
    assert got["twa"].tolist() == [10.0]


# ---------------------------------------------------------------------------
# grouped_entropy


def test_grouped_entropy_merges_cross_batch_partials():
    rng = np.random.default_rng(13)
    n = 5000
    g = rng.integers(0, 80, size=n)
    v = rng.choice(list("abcde"), size=n).astype(object)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.string())})

    from kafka_connect_mongo_ray.functions.stats import grouped_entropy

    got = (grouped_entropy(_ds(t, 8), group_col="g", val_col="v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT g, ROUND(entropy(v), 6) AS ent FROM t GROUP BY g ORDER BY g"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_entropy_single_value_group_is_zero():
    t = pa.table({"g": pa.array([1] * 10 + [2] * 4, pa.int64()),
                  "v": pa.array(["x"] * 10 + ["a", "b", "a", "b"],
                                pa.string())})

    from kafka_connect_mongo_ray.functions.stats import grouped_entropy

    got = (grouped_entropy(_ds(t, 3), group_col="g", val_col="v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert got["ent"].tolist() == [0.0, 1.0]


# ---------------------------------------------------------------------------
# welch_t_components


def test_welch_t_matches_direct_closed_form():
    rng = np.random.default_rng(17)
    a = rng.normal(10.0, 2.0, size=900).round(2)
    b = rng.normal(9.5, 3.0, size=1100).round(2)
    t = pa.table({
        "lab": pa.array(["A"] * 900 + ["B"] * 1100, pa.string()),
        "x": pa.array(np.concatenate([a, b]), pa.float64()),
    })

    from kafka_connect_mongo_ray.functions.stats import welch_t_components

    got = welch_t_components(_ds(t, 7), label_col="lab", int_col="x",
                             label_a="A", label_b="B", scale=100)
    ca = np.rint(a * 100).astype(np.int64)
    cb = np.rint(b * 100).astype(np.int64)
    va = ca.var(ddof=1) / len(ca)
    vb = cb.var(ddof=1) / len(cb)
    t_ref = (ca.mean() - cb.mean()) / np.sqrt(va + vb)
    df_ref = (va + vb) ** 2 / (va * va / (len(ca) - 1)
                               + vb * vb / (len(cb) - 1))
    row = got.iloc[0]
    assert row["n_a"] == 900 and row["n_b"] == 1100
    assert abs(row["t_stat"] - t_ref) < 1e-6
    assert abs(row["df_w"] - df_ref) < 1e-3


# ---------------------------------------------------------------------------
# property tests: arbitrary inputs vs pandas references

from hypothesis import given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.integers(0, 5),            # key
              st.integers(-1000, 1000),     # ts
              st.sampled_from(["i", "u", "d"]),
              st.integers(-50, 50)),        # value
    min_size=1, max_size=40)


def _table(rows):
    k, ts, op, v = zip(*rows)
    return pa.table({"k": pa.array(k, pa.int64()),
                     "ts": pa.array(ts, pa.int64()),
                     "inc": pa.array(range(len(rows)), pa.int64()),
                     "op": pa.array(op, pa.string()),
                     "v": pa.array(v, pa.int64())})


@settings(max_examples=20, deadline=None)
@given(_rows)
def test_scd2_property_matches_pandas_lead(rows):
    t = _table(rows)
    got = _scd2(t)
    df = t.to_pandas().sort_values(["k", "ts", "inc"])
    if len(got) == 0:
        # an all-filtered result loses its schema through to_pandas —
        # assert the reference is empty too and stop
        assert (df.op != "d").sum() == 0
        return
    got = got.sort_values(["k", "valid_from", "valid_to"],
                          na_position="last")
    df["nxt"] = df.groupby("k")["ts"].shift(-1)
    want = df[df.op != "d"].rename(columns={"ts": "valid_from",
                                            "nxt": "valid_to"})
    want["is_current"] = want["valid_to"].isna()
    want = want.sort_values(["k", "valid_from", "valid_to"],
                            na_position="last")
    assert got["k"].tolist() == want["k"].tolist()
    assert (got["valid_to"].astype("float64").fillna(-1).tolist()
            == want["valid_to"].astype("float64").fillna(-1).tolist())
    assert got["is_current"].tolist() == want["is_current"].tolist()


@settings(max_examples=20, deadline=None)
@given(_rows)
def test_twa_property_matches_pandas_weighted_mean(rows):
    from kafka_connect_mongo_ray.functions.ranking import time_weighted_avg

    t = _table(rows)
    out = time_weighted_avg(_ds(t, 6), key="k",
                            order_cols=["ts", "inc"], ts_col="ts",
                            val_col="v", out_col="twa",
                            num_partitions=4).to_pandas()
    got = (out.set_index("k")["twa"].to_dict() if len(out) else {})
    df = t.to_pandas().sort_values(["k", "ts", "inc"])
    df["dur"] = df.groupby("k")["ts"].shift(-1) - df["ts"]
    d = df[df["dur"].notna()]
    want = {}
    for k, g in d.groupby("k"):
        den = int(g["dur"].sum())
        if den > 0:
            want[k] = float(int((g["v"] * g["dur"].astype(np.int64))
                                .sum())) / float(den)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]  # bit-exact: one division of exact ints


# ---------------------------------------------------------------------------
# review-hardening regressions


def test_grouped_linreg_intercepts_stay_aligned_past_degenerate_groups():
    """A constant-x group sorting BEFORE a varying group must not shift
    the later groups' intercepts (the two-pass append bug): row i's
    intercept comes from row i's slope."""
    t = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 3 + ["c"] * 4, pa.string()),
        # group a: constant x (degenerate); b and c: clean lines
        "x": pa.array([5, 5, 5, 5, 1, 2, 3, 1, 2, 3, 4], pa.float64()),
        "y": pa.array([1, 2, 3, 4, 10, 20, 30, 5, 4, 3, 2], pa.float64()),
    })

    from kafka_connect_mongo_ray.functions.stats import grouped_linreg

    got = (grouped_linreg(_ds(t, 3), group_col="g", x_col="x", y_col="y")
           .to_pandas().set_index("g"))
    assert pd.isna(got.loc["a", "slope"]) and pd.isna(got.loc["a",
                                                              "intercept"])
    assert got.loc["b", "slope"] == 10.0 and got.loc["b", "intercept"] == 0.0
    assert got.loc["c", "slope"] == -1.0 and got.loc["c", "intercept"] == 6.0


def test_grouped_entropy_ignores_null_values_like_duckdb():
    t = pa.table({"g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array(["x", "y", None, None, None, "z"],
                                pa.string())})

    from kafka_connect_mongo_ray.functions.stats import grouped_entropy

    got = (grouped_entropy(_ds(t, 2), group_col="g", val_col="v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT g, ROUND(entropy(v), 6) AS ent FROM t GROUP BY g ORDER BY g"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_welch_t_refuses_missing_label_and_tiny_sides():
    import pytest

    from kafka_connect_mongo_ray.functions.stats import welch_t_components

    t = pa.table({"lab": pa.array(["A", "A", "B"], pa.string()),
                  "x": pa.array([1.0, 2.0, 3.0], pa.float64())})
    with pytest.raises(ValueError, match="no rows labelled"):
        welch_t_components(_ds(t, 1), label_col="lab", int_col="x",
                           label_a="A", label_b="absent")
    with pytest.raises(ValueError, match="n=1 < 2"):
        welch_t_components(_ds(t, 1), label_col="lab", int_col="x",
                           label_a="A", label_b="B")
