"""Unit tests for the round-3 operators: distributed exact quantiles,
deterministic md5 sampling, per-group HLL, and the broadcast interval
(range) join — each checked against an independent recomputation
(numpy / DuckDB / exact distinct)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks)


# ---------------------------------------------------------------------------
# exact_quantiles


def test_quantile_disc_index_matches_duckdb():
    from kafka_connect_mongo_ray.functions.quantiles import quantile_disc_index

    con = duckdb.connect()
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=101)
    con.sql("CREATE TABLE t AS SELECT unnest(?::BIGINT[]) AS v",
            params=[vals.tolist()])
    s = np.sort(vals)
    for q in [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]:
        want = con.sql(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert s[quantile_disc_index(q, len(s))] == want


def test_exact_quantiles_distributed_vs_numpy():
    from kafka_connect_mongo_ray.functions.quantiles import (
        exact_quantiles, quantile_disc_index)

    rng = np.random.default_rng(11)
    v = np.round(rng.exponential(scale=40.0, size=5000), 2)
    out = exact_quantiles(
        _ds(pa.table({"x": pa.array(v, pa.float64())}), blocks=7),
        "x", [0.1, 0.5, 0.9], scale=100).to_pandas()
    s = np.sort(np.rint(v * 100).astype(np.int64))
    for _, row in out.iterrows():
        assert row["value_scaled"] == s[quantile_disc_index(row["q"], len(s))]


# ---------------------------------------------------------------------------
# sample_by_md5


def test_sample_by_md5_membership_is_pure_function_of_key():
    from kafka_connect_mongo_ray.functions.quantiles import sample_by_md5

    t = pa.table({"id": pa.array(range(2000), pa.int64()),
                  "payload": pa.array([f"p{i}" for i in range(2000)])})
    a = sample_by_md5(_ds(t, 3), "id", threshold_hex="4000").to_pandas()
    b = sample_by_md5(_ds(t, 9), "id", threshold_hex="4000").to_pandas()
    want = {i for i in range(2000)
            if hashlib.md5(str(i).encode()).hexdigest()[:4] < "4000"}
    assert set(a["id"]) == want
    assert set(b["id"]) == want  # partitioning-independent
    # threshold 0x4000/0x10000 = 25%: binomial(2000, .25) stays well inside
    assert 0.18 < len(want) / 2000 < 0.32


# ---------------------------------------------------------------------------
# approx_distinct_by


def test_approx_distinct_by_within_bound_across_blocks():
    from kafka_connect_mongo_ray.functions.sketch import approx_distinct_by

    rng = np.random.default_rng(3)
    groups = np.repeat(["a", "b", "c"], 4000)
    # distinct cardinalities per group: ~300 / ~2000 / 1 (degenerate)
    vals = np.concatenate([
        rng.integers(0, 300, 4000),
        10_000 + rng.integers(0, 2000, 4000),
        np.zeros(4000, dtype=np.int64),
    ])
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals, pa.int64())})
    out = approx_distinct_by(_ds(t, 6), "v", "g", p=12).to_pandas()
    exact = pd.DataFrame({"g": groups, "v": vals}).groupby("g")["v"].nunique()
    assert set(out["g"]) == {"a", "b", "c"}
    for _, row in out.iterrows():
        rel = abs(row["approx_distinct"] / exact[row["g"]] - 1.0)
        assert rel <= 0.05, (row["g"], row["approx_distinct"], exact[row["g"]])


# ---------------------------------------------------------------------------
# interval_join


@pytest.fixture()
def intervals():
    return pa.table({
        "bracket": pa.array(["low", "mid", "high"]),
        "lo": pa.array([0.0, 10.0, 100.0], pa.float64()),
        "hi": pa.array([10.0, 20.0, 200.0], pa.float64()),
    })


def test_interval_join_inner_drops_misses(intervals):
    from kafka_connect_mongo_ray.stages.join import interval_join

    t = pa.table({"id": pa.array(range(6), pa.int64()),
                  "x": pa.array([-1.0, 0.0, 9.999, 10.0, 50.0, 199.0])})
    out = interval_join(_ds(t, 2), intervals, on="x").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # -1 (below) and 50 (gap) drop; hi bound exclusive, lo inclusive
    assert out["id"].tolist() == [1, 2, 3, 5]
    assert out["bracket"].tolist() == ["low", "low", "mid", "high"]


def test_interval_join_left_keeps_misses_with_typed_nulls(intervals):
    from kafka_connect_mongo_ray.stages.join import interval_join

    t = pa.table({"id": pa.array(range(4), pa.int64()),
                  "x": pa.array([5.0, 50.0, 150.0, -3.0])})
    ds = interval_join(_ds(t, 2), intervals, on="x", how="left")
    assert dict(zip(ds.schema().names, ds.schema().types))["bracket"] == pa.string()
    out = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == 4
    assert out["bracket"].tolist()[0] == "low"
    assert pd.isna(out["bracket"][1]) and pd.isna(out["bracket"][3])
    assert out["bracket"][2] == "high"


def test_interval_join_rejects_overlap(intervals):
    from kafka_connect_mongo_ray.stages.join import interval_join

    bad = pa.table({"bracket": pa.array(["a", "b"]),
                    "lo": pa.array([0.0, 5.0]), "hi": pa.array([10.0, 15.0])})
    with pytest.raises(ValueError, match="non-overlapping"):
        interval_join(_ds(pa.table({"x": pa.array([1.0])})), bad, on="x")


def test_stratified_sample_membership_and_rates():
    from kafka_connect_mongo_ray.functions.quantiles import (
        md5_hex,
        stratified_sample_by_md5,
    )

    n = 400
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "g": pa.array(["a", "b", "c", "d"] * (n // 4))})
    thresholds = {"a": "33333333", "b": "ffffffff"}  # ~20%, all; c/d drop
    out = stratified_sample_by_md5(_ds(t, 3), "id", "g",
                                   thresholds=thresholds).to_pandas()
    # pure-function reference membership
    want = [(i, g) for i, g in zip(range(n), ["a", "b", "c", "d"] * (n // 4))
            if md5_hex(i)[:8] < thresholds.get(g, "00000000")]
    got = sorted(map(tuple, out[["id", "g"]].values.tolist()))
    assert got == sorted(want)
    by_g = out.groupby("g").size()
    assert by_g.get("b") == n // 4 and "c" not in by_g and "d" not in by_g
    assert 0 < by_g.get("a") < n // 4


def test_stratified_sample_rejects_mixed_prefix_lengths():
    from kafka_connect_mongo_ray.functions.quantiles import (
        stratified_sample_by_md5,
    )

    t = pa.table({"id": pa.array([1], pa.int64()), "g": pa.array(["a"])})
    with pytest.raises(ValueError, match="same hex length"):
        stratified_sample_by_md5(_ds(t), "id", "g",
                                 thresholds={"a": "3333", "b": "333333"})


def test_grouped_exact_quantiles_matches_per_group_reference():
    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_exact_quantiles,
        quantile_disc_index,
    )

    rng = np.random.default_rng(11)
    n = 600
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y", "z"], n)),
        "v": pa.array(np.round(rng.uniform(0, 50, n), 2)),
    })
    qs = [0.25, 0.5, 0.9]
    out = grouped_exact_quantiles(_ds(t, 4), "g", "v", qs,
                                  scale=100, num_partitions=3).to_pandas()
    df = t.to_pandas()
    df["s"] = np.rint(df["v"] * 100).astype(np.int64)
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["s"].to_numpy())
        for q in qs:
            want = int(vals[quantile_disc_index(q, len(vals))])
            got = out[(out["g"] == g) & (out["q"] == q)]["value_scaled"]
            assert len(got) == 1 and int(got.iloc[0]) == want, (g, q)


def test_grouped_quantiles_2pass_matches_one_pass():
    """Coarse-then-refine (NEXT.md #3) is bit-exact vs the one-pass
    operator — including null groups (kept, GROUP BY semantics),
    negative values (floor-division binning), and a coarse_bin small
    enough that every quantile refines through a real second pass."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_exact_quantiles,
        grouped_quantiles_2pass,
    )

    rng = np.random.default_rng(11)
    n = 5000
    g = rng.choice(["a", "b", None], size=n, p=[0.6, 0.3, 0.1]).astype(object)
    v = rng.normal(0, 500, size=n)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "x": pa.array(v, pa.float64())})
    qs = [0.1, 0.5, 0.99]
    one = grouped_exact_quantiles(rd.from_arrow(t), "g", "x", qs).to_pandas()
    two = grouped_quantiles_2pass(rd.from_arrow(t), "g", "x", qs,
                                  coarse_bin=32).to_pandas()
    c = lambda d: (d.sort_values(["g", "q"], na_position="first")
                   .reset_index(drop=True))
    pd.testing.assert_frame_equal(c(one), c(two)[c(one).columns],
                                  check_dtype=False)
    # drop_null_groups excludes the null band on both paths
    one_nn = grouped_exact_quantiles(rd.from_arrow(t), "g", "x", qs,
                                     drop_null_groups=True).to_pandas()
    two_nn = grouped_quantiles_2pass(rd.from_arrow(t), "g", "x", qs,
                                     coarse_bin=32,
                                     drop_null_groups=True).to_pandas()
    assert set(two_nn.g) == {"a", "b"}
    pd.testing.assert_frame_equal(c(one_nn), c(two_nn)[c(one_nn).columns],
                                  check_dtype=False)


def test_grouped_mad_2pass_matches_one_pass():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_mad,
        grouped_mad_2pass,
    )

    rng = np.random.default_rng(5)
    n = 8000
    g = rng.choice(["x", "y", None], size=n, p=[0.5, 0.4, 0.1]).astype(object)
    v = rng.normal(100, 300, size=n)
    t = pa.table({"g": pa.array(g, pa.string()),
                  "x": pa.array(v, pa.float64())})
    a = grouped_mad(rd.from_arrow(t), "g", "x").to_pandas()
    b = grouped_mad_2pass(rd.from_arrow(t), "g", "x",
                          coarse_bin=64).to_pandas()
    assert set(b.g) == {"x", "y"}  # NULL groups excluded on both paths
    c = lambda d: d.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(c(a), c(b)[c(a).columns],
                                  check_dtype=False)


def test_balanced_sample_exact_k_per_group_and_deterministic():
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from kafka_connect_mongo_ray.functions.quantiles import (
        balanced_sample_by_md5,
    )

    rng = np.random.default_rng(7)
    n = 600
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array([f"s{int(x)}" for x in rng.integers(0, 5, n)],
                      pa.string())})
    ds = ray.data.from_arrow(t).repartition(7)
    out = balanced_sample_by_md5(ds, "id", "g", k=20,
                                 num_partitions=4).to_pandas()
    df = pd.DataFrame({"id": np.asarray(t["id"]),
                       "g": np.asarray(t["g"]).astype(object)})
    df["h"] = [hashlib.md5(str(i).encode()).hexdigest() for i in df.id]
    want = (df.sort_values(["g", "h", "id"])
            .groupby("g").head(20))
    assert sorted(out.id) == sorted(want.id)
    assert (out.groupby("g").size() == 20).all()
    # groups smaller than k keep everything
    small = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "g": pa.array(["only", "only"], pa.string())})
    out2 = balanced_sample_by_md5(ray.data.from_arrow(small), "id", "g",
                                  k=20, num_partitions=2).to_pandas()
    assert sorted(out2.id) == [1, 2]
