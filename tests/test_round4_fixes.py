"""Round-4 hardening: SQL NULL-key semantics for joins and grouped
aggregates, recall-complete ngram AllPairs by default, bounded ANN
bucket groups, and the structural kmeans `improved` guarantee."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _to_pd(ds) -> pd.DataFrame:
    """Dataset → pandas, preserving columns for all-empty results
    (Ray's to_pandas returns a column-less frame when no rows exist
    even though ds.schema() knows the columns)."""
    df = ds.to_pandas()
    if df.shape[1] == 0:
        schema = ds.schema()
        df = pd.DataFrame({n: pd.Series(dtype="object")
                           for n in schema.names})
    return df


# ---------------------------------------------------------------------------
# join null-key semantics (SQL equality never matches NULL)

LEFT = pa.table({
    "k": pa.array(["a", "b", None, "c", None], pa.string()),
    "lv": pa.array([1, 2, 3, 4, 5], pa.int64()),
})
RIGHT = pa.table({
    "k": pa.array(["a", None, "d"], pa.string()),
    "rv": pa.array([10, 20, 30], pa.int64()),
})


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("l", LEFT.to_pandas())
    con.register("r", RIGHT.to_pandas())
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("object").where(df[c].notna(), None)
    return df.sort_values(sorted(df.columns), kind="mergesort",
                          na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT l.k, lv, rv FROM l JOIN r USING (k)"),
    ("left", "SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k)"),
    ("right", "SELECT r.k, lv, rv FROM l RIGHT JOIN r ON l.k = r.k"),
    ("outer", "SELECT COALESCE(l.k, r.k) AS k, lv, rv "
              "FROM l FULL OUTER JOIN r ON l.k = r.k"),
    ("semi", "SELECT k, lv FROM l WHERE EXISTS "
             "(SELECT 1 FROM r WHERE r.k = l.k)"),
    ("anti", "SELECT k, lv FROM l WHERE NOT EXISTS "
             "(SELECT 1 FROM r WHERE r.k = l.k)"),
])
def test_hash_join_null_keys_match_sql(how, sql):
    from kafka_connect_mongo_ray.stages.join import hash_join

    got = hash_join(_rd(LEFT), _rd(RIGHT), on=["k"], num_buckets=4,
                    how=how).to_pandas()
    want = _oracle(sql)
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


# ---------------------------------------------------------------------------
# rollup / pivot / grouped quantiles keep NULL-key groups

EV = pa.table({
    "etype": pa.array(["x", "x", None, "y", None, "y"], pa.string()),
    "day": pa.array(["d1", "d2", "d1", "d1", "d2", "d1"], pa.string()),
    "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
})


def test_rollup_keeps_null_key_groups_and_exact_grand_total():
    from kafka_connect_mongo_ray.functions.rollup import rollup_aggregate

    out = rollup_aggregate(_rd(EV), keys=["etype"], sum_cols=["v"],
                           count_col="n").to_pandas()
    # grand total equals COUNT(*) / SUM(v) over ALL rows incl. null keys
    total = out[out["etype"] == "ALL"]
    assert int(total["n"].iloc[0]) == 6
    assert int(total["v"].iloc[0]) == 21
    # the NULL-key group survives at the finest level, distinct from ALL
    nullg = out[out["etype"].isna()]
    assert len(nullg) == 1
    assert int(nullg["n"].iloc[0]) == 2 and int(nullg["v"].iloc[0]) == 8


def test_pivot_counts_null_key_and_null_category():
    from kafka_connect_mongo_ray.functions.rollup import pivot_counts

    out = pivot_counts(_rd(EV), key="day", pivot_col="etype",
                       prefix="n_").to_pandas().set_index("day")
    # null categories land in the n_None column; counts cover all rows
    assert int(out.loc["d1", "n_None"]) == 1
    assert int(out.loc["d2", "n_None"]) == 1
    assert int(out[["n_None", "n_x", "n_y"]].to_numpy().sum()) == 6
    # and a null KEY keeps its own row
    ev2 = pa.table({"day": pa.array([None, "d1"], pa.string()),
                    "etype": pa.array(["x", "x"], pa.string())})
    out2 = pivot_counts(_rd(ev2), key="day", pivot_col="etype",
                        prefix="n_").to_pandas()
    assert len(out2) == 2 and int(out2["n_x"].sum()) == 2


def test_grouped_quantiles_keep_null_group():
    from kafka_connect_mongo_ray.functions.quantiles import (
        grouped_exact_quantiles)

    t = pa.table({"g": pa.array(["a", None, "a", None], pa.string()),
                  "x": pa.array([1.0, 10.0, 3.0, 20.0], pa.float64())})
    out = grouped_exact_quantiles(_rd(t), "g", "x", [0.5],
                                  scale=1).to_pandas()
    assert len(out) == 2
    nullrow = out[out["g"].isna()]
    assert int(nullrow["value_scaled"].iloc[0]) == 10


# ---------------------------------------------------------------------------
# ngram AllPairs: default is recall-complete (no silent cap degrade)

def test_ngram_allpairs_default_uncapped_recovers_capped_losses():
    from kafka_connect_mongo_ray.functions.dedup import (
        ngram_allpairs_candidates)

    # template-heavy corpus: every doc shares the rare gram "zz yy xx"
    # but docs are NOT mutually near-identical — under a tiny cap the
    # star+chain topology drops true candidate pairs
    n_docs = 12
    texts = [f"zz yy xx unique{i} filler{i} tail{i}" for i in range(n_docs)]
    docs = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts, pa.string())})

    def pairs(bucket_cap):
        df = ngram_allpairs_candidates(
            _rd(docs), n=3, threshold=0.1,
            bucket_cap=bucket_cap, num_partitions=4).to_pandas()
        return set(zip(df["id_a"], df["id_b"]))

    capped = pairs(4)
    uncapped = pairs(None)  # the default
    assert capped < uncapped  # the cap provably lost candidates
    assert len(uncapped) == n_docs * (n_docs - 1) // 2


# ---------------------------------------------------------------------------
# ANN: oversized bucket groups are hash-split with identical output

def _skewed_embeddings(n=600, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    # force ~half the corpus into ONE lsh bucket: copy a single base
    # direction with tiny jitter so all hyperplane signs agree
    base = rng.standard_normal(dim)
    v[: n // 2] = base + 0.01 * rng.standard_normal((n // 2, dim))
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in v],
                              pa.list_(pa.float64())),
    }), v


def test_subsplit_bounds_group_sizes():
    from kafka_connect_mongo_ray.functions.similarity import (
        LshBucketer, _subsplit_oversized_groups)

    t, _ = _skewed_embeddings()
    bucketed = _rd(t).map_batches(LshBucketer(dim=8, num_planes=4),
                                  batch_format="pyarrow")
    cap = 50
    split, keys = _subsplit_oversized_groups(bucketed, "lsh_bucket",
                                             "vec_id", cap)
    assert keys == ["lsh_bucket", "__sub"]
    sizes = split.to_pandas().groupby(keys).size()
    # hash split is probabilistic: allow 2x headroom over the cap
    assert int(sizes.max()) <= 2 * cap
    assert int(sizes.sum()) == t.num_rows


def test_lsh_and_ivf_topk_identical_under_subsplit():
    from kafka_connect_mongo_ray.functions.similarity import ivf_topk, lsh_topk

    t, v = _skewed_embeddings()
    q = v[:3] + 0.001
    qids = np.array([900, 901, 902])

    a = lsh_topk(_rd(t), q, qids, k=5, dim=8, num_planes=4,
                 group_row_cap=None)
    b = lsh_topk(_rd(t), q, qids, k=5, dim=8, num_planes=4,
                 group_row_cap=40)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))

    c = ivf_topk(_rd(t), q, qids, k=5, num_cells=4, nprobe=2,
                 group_row_cap=None)
    d = ivf_topk(_rd(t), q, qids, k=5, num_cells=4, nprobe=2,
                 group_row_cap=40)
    pd.testing.assert_frame_equal(c.reset_index(drop=True),
                                  d.reset_index(drop=True))


# ---------------------------------------------------------------------------
# kmeans summary: improved holds by construction, even out-of-sample

def test_kmeans_improved_structural_on_drifted_distribution():
    from kafka_connect_mongo_ray.functions.similarity import (
        kmeans_cluster_summary)

    rng = np.random.default_rng(3)
    # sample window (first rows) is one cluster; the rest drifts to an
    # opposite direction the fitted centroids never saw
    a = rng.standard_normal((300, 6)) + np.array([5, 0, 0, 0, 0, 0])
    b = rng.standard_normal((300, 6)) + np.array([-5, 0, 0, 0, 0, 0])
    v = np.vstack([a, b])
    t = pa.table({"embedding": pa.array([r.tolist() for r in v],
                                        pa.list_(pa.float64()))})
    out = kmeans_cluster_summary(_rd(t), k=2, sample_size=300).to_pandas()
    assert bool(out["improved"].iloc[0]) is True


# ---------------------------------------------------------------------------
# seeded randomized oracle checks (DuckDB ground truth, 3 seeds each)

def _rand_tables(seed):
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(30, 120)), int(rng.integers(10, 60))
    keys = np.array(["k%d" % i for i in range(12)] + [None], dtype=object)
    l = pa.table({
        "k": pa.array(rng.choice(keys, nl), pa.string()),
        "lv": pa.array(rng.integers(0, 100, nl), pa.int64()),
    })
    r = pa.table({
        "k": pa.array(rng.choice(keys, nr), pa.string()),
        "rv": pa.array(rng.integers(0, 100, nr), pa.int64()),
    })
    return l, r


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_randomized_joins_and_setops_match_duckdb(seed):
    from kafka_connect_mongo_ray.functions.setops import set_op_distinct
    from kafka_connect_mongo_ray.stages.join import hash_join

    l, r = _rand_tables(seed)
    con = duckdb.connect()
    con.register("l", l.to_pandas())
    con.register("r", r.to_pandas())

    cases = [
        ("inner", "SELECT l.k, lv, rv FROM l JOIN r USING (k)"),
        ("left", "SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k)"),
        ("right", "SELECT r.k, lv, rv FROM l RIGHT JOIN r ON l.k = r.k"),
        ("outer", "SELECT COALESCE(l.k, r.k) AS k, lv, rv "
                  "FROM l FULL OUTER JOIN r ON l.k = r.k"),
        ("semi", "SELECT k, lv FROM l WHERE EXISTS "
                 "(SELECT 1 FROM r WHERE r.k = l.k)"),
        ("anti", "SELECT k, lv FROM l WHERE NOT EXISTS "
                 "(SELECT 1 FROM r WHERE r.k = l.k)"),
    ]
    for how, sql in cases:
        got = hash_join(_rd(l), _rd(r), on=["k"], num_buckets=4,
                        how=how).to_pandas()
        want = con.sql(sql).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False), how

    for op, sql in (("intersect", "SELECT k FROM l INTERSECT "
                                  "SELECT k FROM r"),
                    ("except", "SELECT k FROM l EXCEPT SELECT k FROM r")):
        got = _to_pd(set_op_distinct(_rd(l), _rd(r), on=["k"], op=op,
                                     num_buckets=4))
        want = con.sql(sql).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False), op


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_randomized_dense_rank_and_frequent_items_match_duckdb(seed):
    from kafka_connect_mongo_ray.functions.ranking import dense_rank
    from kafka_connect_mongo_ray.functions.stats import frequent_items

    rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 800))
    # zipf-ish skewed ints: plenty of ties and a few heavy values
    vals = (rng.zipf(1.7, n) % 50).astype(np.int64)
    t = pa.table({"v": pa.array(vals), "i": pa.array(range(n), pa.int64())})
    con = duckdb.connect()
    con.register("t", t.to_pandas())

    got = (dense_rank(_rd(t).repartition(5), order_col="v", num_buckets=4)
           .to_pandas())
    want = con.sql("SELECT v, i, CAST(DENSE_RANK() OVER (ORDER BY v) "
                   "AS BIGINT) AS dr FROM t").df()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(want[sorted(want.columns)]), check_dtype=False)

    fi = frequent_items(_rd(t).repartition(5), "v",
                        min_frac=(1, 20)).to_pandas()
    want_fi = con.sql(
        "SELECT v AS value, CAST(COUNT(*) AS BIGINT) AS cnt FROM t "
        "GROUP BY v HAVING 20 * COUNT(*) >= (SELECT COUNT(*) FROM t)").df()
    pd.testing.assert_frame_equal(_canon(fi), _canon(want_fi),
                                  check_dtype=False)


def test_grouped_hll_bucket_merge_matches_per_key_estimate():
    """The vectorized reduceat merge must be bit-identical to merging
    and estimating each key's sketches with the HyperLogLog class."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.sketch import (
        HyperLogLog,
        approx_distinct_by,
    )

    rng = np.random.default_rng(41)
    n = 20_000
    keys = rng.integers(0, 37, n)
    vals = rng.integers(0, 5_000, n)
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    got = (approx_distinct_by(rd.from_arrow(t).repartition(9), "v", "k",
                              p=10).to_pandas()
           .set_index("k")["approx_distinct"].to_dict())

    want = {}
    for k in np.unique(keys):
        hll = HyperLogLog(10)
        hll.add_values(vals[keys == k])
        want[k] = hll.estimate()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_stable_hash_buckets_immune_to_null_dtype_flip():
    """np.asarray turns an int64 Arrow column into float64 when the
    batch has any null; the stable hash must give the SAME bucket for
    a key either way (a split key silently breaks per-key windows)."""
    import pyarrow as pa

    from kafka_connect_mongo_ray.utils import stable_hash_buckets

    clean = pa.table({"k": pa.array([5, 7, 9], pa.int64())})
    dirty = pa.table({"k": pa.array([5, None, 9], pa.int64())})
    b_clean = stable_hash_buckets(clean, ["k"], 32)
    b_dirty = stable_hash_buckets(dirty, ["k"], 32)
    assert b_clean[0] == b_dirty[0]  # key 5
    assert b_clean[2] == b_dirty[2]  # key 9


def test_grouped_hll_null_keys_excluded_not_corrupting():
    """A null group key must neither crash (all-null batch) nor
    max-merge its rows into another key's registers."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.sketch import (
        HyperLogLog,
        approx_distinct_by,
    )

    t = pa.table({"k": pa.array(["a", None, "a", None], pa.string()),
                  "v": pa.array([1, 999, 2, 998], pa.int64())})
    out = approx_distinct_by(rd.from_arrow(t), "v", "k",
                             p=10).to_pandas()
    assert out["k"].tolist() == ["a"]
    want = HyperLogLog(10)
    want.add_values(np.array([1, 2], dtype=np.int64))
    assert out["approx_distinct"].iloc[0] == want.estimate()

    # all-null batch: no crash, empty result
    t2 = pa.table({"k": pa.array([None, None], pa.string()),
                   "v": pa.array([1, 2], pa.int64())})
    assert approx_distinct_by(rd.from_arrow(t2), "v", "k", p=10).count() == 0


def test_memory_derived_row_cap_auto():
    """The 'auto' group_row_cap (NEXT.md #2): derived from cluster
    memory / CPUs and measured bytes-per-row, clamped, and the default
    'auto' path produces output identical to an explicit cap."""
    from kafka_connect_mongo_ray.functions.similarity import (
        lsh_topk,
        memory_derived_row_cap,
    )

    # monotone in available memory, inverse in row width, clamped
    cap_wide = memory_derived_row_cap(1_000_000.0)   # 1 MB rows
    cap_narrow = memory_derived_row_cap(100.0)       # 100 B rows
    assert 10_000 <= cap_wide <= cap_narrow <= 2_000_000
    assert memory_derived_row_cap(0.0) == 100_000    # degenerate fallback
    assert memory_derived_row_cap(1e18) == 10_000    # floor clamp

    t, v = _skewed_embeddings()
    q = v[:3] + 0.001
    qids = np.array([900, 901, 902])
    a = lsh_topk(_rd(t), q, qids, k=5, dim=8, num_planes=4,
                 group_row_cap=None)
    b = lsh_topk(_rd(t), q, qids, k=5, dim=8, num_planes=4)  # "auto"
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
