"""Ordered-analytics operators (functions/ranking.py) and the
semi/anti existence joins (stages/join.py) against in-process pandas
references on randomized keyed inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(seed: int, n: int = 400, n_keys: int = 17) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_keys, n).astype(np.int64),
        # duplicate timestamps on purpose: the order tie-break is event_id
        "ts_us": rng.integers(0, n // 2, n).astype(np.int64) * 1_000_000,
        "val": rng.integers(-50, 50, n).astype(np.int64),
    })


@pytest.mark.parametrize("seed", [0, 7])
def test_lag_delta_matches_pandas(seed):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import lag_delta

    df = _events(seed)
    ds = rd.from_pandas(df).repartition(5)
    got = lag_delta(ds, key="user_id", order_cols=["ts_us", "event_id"],
                    ts_col="ts_us", out_col="d", num_partitions=4).to_pandas()
    want = df.sort_values(["ts_us", "event_id"])
    want["d"] = want.groupby("user_id")["ts_us"].diff()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["d"].astype("float64"),
                                   want["d"], check_names=False)
    # first row per key is null, all others are not
    assert got["d"].isna().sum() == df["user_id"].nunique()


@pytest.mark.parametrize("seed", [1, 8])
def test_running_sum_matches_pandas(seed):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import running_sum

    df = _events(seed)
    ds = rd.from_pandas(df).repartition(5)
    got = running_sum(ds, key="user_id", order_cols=["ts_us", "event_id"],
                      val_col="val", out_col="cs", num_partitions=4).to_pandas()
    want = df.sort_values(["ts_us", "event_id"])
    want["cs"] = want.groupby("user_id")["val"].cumsum()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["cs"].dtype == np.int64
    pd.testing.assert_series_equal(got["cs"], want["cs"], check_names=False)


@pytest.mark.parametrize("seed,window", [(3, 1), (6, 4)])
def test_rolling_mean_matches_pandas(seed, window):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import rolling_mean

    df = _events(seed)
    ds = rd.from_pandas(df).repartition(5)
    got = rolling_mean(ds, key="user_id", order_cols=["ts_us", "event_id"],
                       val_col="val", window=window, out_col="m",
                       num_partitions=4).to_pandas()
    want = df.sort_values(["ts_us", "event_id"])
    want["m"] = (want.groupby("user_id")["val"]
                 .rolling(window, min_periods=1).mean()
                 .reset_index(level=0, drop=True))
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["m"], want["m"], check_names=False)


@pytest.mark.parametrize("seed,buckets", [(2, 4), (9, 1)])
def test_global_row_number_is_a_permutation_in_order(seed, buckets):
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import global_row_number

    df = _events(seed)
    ds = rd.from_pandas(df).repartition(5)
    got = global_row_number(ds, order_cols=["ts_us", "event_id"],
                            rank_col="rn", num_buckets=buckets,
                            sample_per_block=16).to_pandas()
    want = df.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
    want["rn"] = np.arange(1, len(want) + 1, dtype=np.int64)
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["rn"].dtype == np.int64
    pd.testing.assert_series_equal(got["rn"], want["rn"], check_names=False)


def _sides(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300).astype(np.int64),
        "payload": rng.integers(0, 1000, 300).astype(np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(20, 60, 500).astype(np.int64),
        # right payload must be ignored by existence joins
        "other": rng.integers(0, 9, 500).astype(np.int64),
    })
    return left, right


@pytest.mark.parametrize("how", ["semi", "anti"])
@pytest.mark.parametrize("hot", [None, "auto"])
def test_semi_anti_join_matches_pandas(how, hot):
    import ray.data as rd

    from kafka_connect_mongo_ray.stages.join import hash_join

    left, right = _sides(3)
    out = hash_join(rd.from_pandas(left).repartition(4),
                    rd.from_pandas(right).repartition(4),
                    on=["k"], num_buckets=6, how=how,
                    hot_keys=hot).to_pandas()
    present = left["k"].isin(set(right["k"]))
    want = left[present if how == "semi" else ~present]
    assert list(out.columns) == ["k", "payload"]
    assert out["k"].dtype == np.int64 and out["payload"].dtype == np.int64
    key = lambda d: d.sort_values(["k", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(want))
    # a left row with N matches is emitted exactly once
    assert len(out) == len(want)


def test_window_join_matches_pandas_reference_and_bounds_inclusive():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.stages.join import window_join

    rng = np.random.default_rng(13)
    n = 800
    mk = lambda ids: pa.table({
        "user_id": pa.array(rng.integers(0, 30, len(ids)).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10_000, len(ids)).astype(np.int64)),
        "rid": pa.array(np.asarray(ids, dtype=np.int64))})
    lt = mk(np.arange(n))
    rt = mk(np.arange(n, 2 * n))
    lts = ray.data.from_arrow(lt.rename_columns(
        ["user_id", "ts", "purchase_id"])).repartition(5)
    rts = ray.data.from_arrow(rt.rename_columns(
        ["user_id", "ts", "click_id"])).repartition(4)
    out = window_join(lts, rts, key_col="user_id", ts_col="ts",
                      left_id="purchase_id", right_id="click_id",
                      before_us=500, after_us=100,
                      num_buckets=4).to_pandas()
    ldf = lt.to_pandas().rename(columns={"rid": "pid"})
    rdf = rt.to_pandas().rename(columns={"rid": "cid"})
    ref = ldf.merge(rdf, on="user_id", suffixes=("_l", "_r"))
    ref = ref[(ref.ts_r >= ref.ts_l - 500) & (ref.ts_r <= ref.ts_l + 100)]
    want = set(zip(ref.pid, ref.cid))
    got = set(zip(out.purchase_id, out.click_id))
    assert got == want and len(out) == len(ref)
    # gap sign: positive when the right event precedes the left
    m = out.merge(ldf, left_on="purchase_id", right_on="pid").merge(
        rdf, left_on="click_id", right_on="cid")
    assert (m.gap_us == m.ts_x - m.ts_y).all()
    # inclusive boundaries: pairs exactly at -500 and +100 exist in ref
    edges = ref[(ref.ts_r == ref.ts_l - 500) | (ref.ts_r == ref.ts_l + 100)]
    assert len(edges) == 0 or set(zip(edges.pid, edges.cid)) <= got


def test_window_join_overflow_fallback_matches_fast_path():
    import numpy as np
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.stages.join import window_join

    rng = np.random.default_rng(29)

    def build(kvals):
        n = 300
        return pa.table({
            "k": pa.array(kvals[rng.integers(0, len(kvals), n)], pa.int64()),
            "ts": pa.array(rng.integers(0, 5_000, n).astype(np.int64)),
            "i": pa.array(np.arange(n, dtype=np.int64))})

    small = np.array([1, 2, 3], dtype=np.int64)
    huge = np.array([1, 2, (1 << 61)], dtype=np.int64)  # forces fallback
    for keys in (small, huge):
        lt, rt = build(keys), build(keys)
        out = window_join(
            ray.data.from_arrow(lt.rename_columns(["k", "ts", "lid"])),
            ray.data.from_arrow(rt.rename_columns(["k", "ts", "rid2"])),
            key_col="k", ts_col="ts", left_id="lid", right_id="rid2",
            before_us=200, after_us=0, num_buckets=2).to_pandas()
        ldf, rdf = lt.to_pandas(), rt.to_pandas()
        ref = ldf.merge(rdf, on="k", suffixes=("_l", "_r"))
        ref = ref[(ref.ts_r >= ref.ts_l - 200) & (ref.ts_r <= ref.ts_l)]
        assert set(zip(out.lid, out.rid2)) == set(zip(ref.i_l, ref.i_r))


def test_throttle_matches_lag_reference():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.functions.ranking import throttle

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "u": pa.array(rng.integers(0, 10, n).astype(np.int64)),
        "ty": pa.array([f"t{int(x)}" for x in rng.integers(0, 3, n)],
                       pa.string()),
        "ts": pa.array(rng.integers(0, 2_000, n).astype(np.int64)),
        "i": pa.array(np.arange(n, dtype=np.int64))})
    out = throttle(ray.data.from_arrow(t).repartition(6),
                   keys=["u", "ty"], order_cols=["ts", "i"], ts_col="ts",
                   min_gap_us=100, num_partitions=4).to_pandas()
    df = t.to_pandas().sort_values(["u", "ty", "ts", "i"])
    d = df.groupby(["u", "ty"]).ts.diff()
    want = df[d.isna() | (d > 100)]
    assert sorted(out.i) == sorted(want.i)
    # boundary: exactly min_gap apart is SUPPRESSED (strict >)
    edge = pa.table({"u": pa.array([1, 1], pa.int64()),
                     "ty": pa.array(["a", "a"], pa.string()),
                     "ts": pa.array([0, 100], pa.int64()),
                     "i": pa.array([0, 1], pa.int64())})
    out2 = throttle(ray.data.from_arrow(edge), keys=["u", "ty"],
                    order_cols=["ts", "i"], ts_col="ts",
                    min_gap_us=100, num_partitions=2).to_pandas()
    assert sorted(out2.i) == [0]


def test_window_join_negative_key_magnitude_uses_fallback():
    import numpy as np
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.stages.join import window_join

    # a large NEGATIVE key must not slip past the overflow guard: the
    # composite k*span would wrap and silently corrupt the bounds
    keys = np.array([5, -(1 << 61)], dtype=np.int64)
    rng = np.random.default_rng(7)
    n = 200
    lt = pa.table({"k": pa.array(keys[rng.integers(0, 2, n)], pa.int64()),
                   "ts": pa.array(rng.integers(0, 3_000, n).astype(np.int64)),
                   "lid": pa.array(np.arange(n, dtype=np.int64))})
    rt = pa.table({"k": pa.array(keys[rng.integers(0, 2, n)], pa.int64()),
                   "ts": pa.array(rng.integers(0, 3_000, n).astype(np.int64)),
                   "rid2": pa.array(np.arange(n, dtype=np.int64))})
    out = window_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                      key_col="k", ts_col="ts", left_id="lid",
                      right_id="rid2", before_us=150, after_us=0,
                      num_buckets=2).to_pandas()
    ldf, rdf = lt.to_pandas(), rt.to_pandas()
    ref = ldf.merge(rdf, on="k", suffixes=("_l", "_r"))
    ref = ref[(ref.ts_r >= ref.ts_l - 150) & (ref.ts_r <= ref.ts_l)]
    assert set(zip(out.lid, out.rid2)) == set(zip(ref.lid, ref.rid2))


def test_throttle_null_keys_share_one_partition():
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.functions.ranking import throttle

    t = pa.table({"k": pa.array([None, None, 1, 1], pa.int64()),
                  "ts": pa.array([0, 10, 0, 10], pa.int64()),
                  "i": pa.array([0, 1, 2, 3], pa.int64())})
    out = throttle(ray.data.from_arrow(t), keys=["k"],
                   order_cols=["ts", "i"], ts_col="ts",
                   min_gap_us=100, num_partitions=2).to_pandas()
    # SQL LAG PARTITION BY k groups NULLs together: the second null-key
    # row (10us later) is suppressed exactly like the int-key pair
    assert sorted(out.i) == [0, 2]


def test_fill_forward_resets_at_key_boundaries(ray_session):
    """LOCF edge cases: leading nulls stay null, carries never cross
    key boundaries, an all-null key stays all-null, and the filled
    value is the raw float64 observation (selection, no arithmetic)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import fill_forward

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "o": pa.array([1, 2, 3, 4, 1, 2, 1, 2], pa.int64()),
        "v": pa.array([None, 1.5, None, 2.5, None, None, 7.25, None],
                      pa.float64()),
    })
    out = (fill_forward(rd.from_arrow(t), key="k", order_cols=["o"],
                        val_col="v", num_partitions=2)
           .to_pandas().sort_values(["k", "o"]))
    got = [None if np.isnan(x) else x for x in out["filled"]]
    # k=1: null, 1.5, 1.5, 2.5; k=2 (all null — no carry from k=1):
    # null, null; k=3: 7.25, 7.25
    assert got == [None, 1.5, 1.5, 2.5, None, None, 7.25, 7.25]


def test_interpolate_linear_edges_and_values(ray_session):
    """Interpolation edge cases: exact midpoint/quarter fractions,
    leading/trailing nulls stay null, no carry across keys, duplicate-
    ts degenerate gaps stay null, observed rows keep raw values."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import interpolate_linear

    t = pa.table({
        "k": pa.array([1] * 5 + [2] * 3 + [3] * 3, pa.int64()),
        "o": pa.array(list(range(5)) + list(range(3)) + list(range(3)),
                      pa.int64()),
        # k=1: obs 10@ts0, gap@ts25, gap@ts75, obs 30@ts100, trailing
        # gap; k=2: leading gap, obs 5@ts10, trailing gap; k=3:
        # duplicate-ts degenerate gap between two obs at the same ts
        "ts": pa.array([0, 25, 75, 100, 150, 0, 10, 20, 50, 50, 50],
                       pa.int64()),
        "v": pa.array([10.0, None, None, 30.0, None,
                       None, 5.0, None,
                       4.0, None, 8.0], pa.float64()),
    })
    out = (interpolate_linear(rd.from_arrow(t), key="k", order_col="o",
                              ts_col="ts", val_col="v",
                              num_partitions=2)
           .to_pandas().sort_values(["k", "o"]))
    got = [None if np.isnan(x) else x for x in out["interp"]]
    assert got == [10.0, 15.0, 25.0, 30.0, None,
                   None, 5.0, None,
                   4.0, None, 8.0]


def test_longest_streak_gaps_and_islands():
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.ranking import longest_streak

    t = pa.table({
        # k=1: days 1,2,3 then 7,8 (dup 2) → best 3; k=2: single day;
        # k=3: all isolated days → best 1; k=4: one long run straddling
        # a duplicate in the middle → 5
        "k": pa.array([1, 1, 1, 1, 1, 1, 2, 3, 3, 3, 4, 4, 4, 4, 4, 4],
                      pa.int64()),
        "d": pa.array([1, 2, 2, 3, 7, 8, 5, 1, 3, 9,
                       10, 11, 12, 12, 13, 14], pa.int64()),
    })
    out = (longest_streak(rd.from_arrow(t), key="k", day_col="d",
                          num_partitions=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["streak_days"].tolist() == [3, 1, 1, 5]
