"""Round-4 operators: exact correlation components, recall-complete
frequent items, distributed dense_rank, and distinct set operations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def test_corr_components_exact_and_partition_invariant():
    from kafka_connect_mongo_ray.functions.stats import corr_components

    rng = np.random.default_rng(5)
    x = rng.integers(1, 50, 5000).astype(np.float64)
    y = (x * 0.5 + rng.normal(0, 5, 5000)).round(2)
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})

    a = corr_components(_rd(t), "x", "y", y_scale=100).to_pandas()
    b = corr_components(_rd(t).repartition(13), "x", "y",
                        y_scale=100).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # moments bit-exact under repart

    xs = np.rint(x).astype(np.int64)
    ys = np.rint(y * 100).astype(np.int64)
    assert int(a["sxy"].iloc[0]) == int((xs * ys).sum())
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(a["corr"].iloc[0] - want) < 1e-9


def test_corr_components_overflow_guard():
    from kafka_connect_mongo_ray.functions.stats import corr_components

    big = 3.2e9  # big^2 > 2^62: the moment sum must refuse, not wrap
    t = pa.table({"x": pa.array([big, big]), "y": pa.array([1.0, 2.0])})
    # the OverflowError surfaces wrapped in Ray's task-error envelope
    with pytest.raises(Exception, match="overflowed int64"):
        corr_components(_rd(t), "x", "x")


def test_frequent_items_recall_complete_with_spread_value():
    from kafka_connect_mongo_ray.functions.stats import frequent_items

    # value 7 holds exactly 10% globally but is spread evenly so no
    # batch sees it above 10% by more than rounding — the pigeonhole
    # candidate rule must still find it
    n = 4000
    vals = np.arange(n) % 10  # each of 0..9 exactly 10%
    t = pa.table({"v": pa.array(vals, pa.int64())})
    out = frequent_items(_rd(t).repartition(8), "v",
                         min_frac=(1, 10)).to_pandas()
    assert sorted(out["value"]) == list(range(10))
    assert (out["cnt"] == n // 10).all()

    # threshold above 10% excludes everything
    out2 = frequent_items(_rd(t).repartition(8), "v",
                          min_frac=(11, 100)).to_pandas()
    assert len(out2) == 0


def test_dense_rank_ties_and_gaps():
    from kafka_connect_mongo_ray.functions.ranking import dense_rank

    vals = np.array([5, 3, 3, 9, 5, 5, 1], dtype=np.int64)
    t = pa.table({"v": pa.array(vals), "i": pa.array(range(len(vals)))})
    out = (dense_rank(_rd(t).repartition(3), order_col="v", num_buckets=4)
           .to_pandas().sort_values("i"))
    # DENSE_RANK over [5,3,3,9,5,5,1] asc -> 1:1, 3:2, 5:3, 9:4
    want = {1: 1, 3: 2, 5: 3, 9: 4}
    assert [want[v] for v in vals] == out["dr"].tolist()


def test_set_op_distinct_matches_sql_with_nulls():
    import duckdb

    from kafka_connect_mongo_ray.functions.setops import set_op_distinct

    l = pa.table({"k": pa.array(["a", "b", None, "c", "a"], pa.string())})
    r = pa.table({"k": pa.array(["b", None, "d"], pa.string())})
    con = duckdb.connect()
    con.register("l", l.to_pandas())
    con.register("r", r.to_pandas())

    for op, sql in (("intersect", "SELECT k FROM l INTERSECT "
                                  "SELECT k FROM r"),
                    ("except", "SELECT k FROM l EXCEPT SELECT k FROM r")):
        got = sorted(set_op_distinct(_rd(l), _rd(r), on=["k"], op=op,
                                     num_buckets=4)
                     .to_pandas()["k"].fillna("<null>"))
        want = sorted(con.sql(sql).df()["k"].fillna("<null>"))
        assert got == want, (op, got, want)


def test_set_op_all_bag_semantics_match_duckdb():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.functions.setops import set_op_all

    rng = np.random.default_rng(17)
    a = pa.table({"k": pa.array(rng.integers(0, 12, 400).astype(np.int64))})
    b = pa.table({"k": pa.array(rng.integers(0, 12, 300).astype(np.int64))})
    for op, sql in [("except_all", "EXCEPT ALL"),
                    ("intersect_all", "INTERSECT ALL")]:
        out = set_op_all(ray.data.from_arrow(a).repartition(5),
                         ray.data.from_arrow(b).repartition(4),
                         on=["k"], op=op, num_buckets=3).to_pandas()
        want = duckdb.sql(
            f"SELECT k FROM a {sql} SELECT k FROM b").df()
        assert sorted(out.k) == sorted(want.k)
    # NULL keys participate as their own key (set-op semantics)
    an = pa.table({"k": pa.array([1, None, None], pa.int64())})
    bn = pa.table({"k": pa.array([None], pa.int64())})
    t = pa.concat_tables(list(
        set_op_all(ray.data.from_arrow(an), ray.data.from_arrow(bn),
                   on=["k"], op="except_all",
                   num_buckets=2).iter_batches(batch_size=None,
                                               batch_format="pyarrow")))
    got = sorted(t["k"].to_pylist(), key=lambda v: (v is None, v or 0))
    assert got == [1, None]
