"""Round-4 late operators: grouped argmax, OLS regression components,
NTILE, per-group percent_rank/cume_dist, fixed-width histograms, and
word-repetition stats — each against a DuckDB ground truth (the same
shape the driver gate checks)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _rd(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_group_argmax_matches_qualify_rownumber_with_ties():
    from kafka_connect_mongo_ray.functions.stats import group_argmax

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        # few distinct values => plenty of within-group ties on v
        "v": rng.integers(0, 5, n).astype(np.float64),
        "id": np.arange(n, dtype=np.int64),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = group_argmax(_rd(t).repartition(7), keys=["k"],
                       order=[("v", "descending"), ("id", "ascending")],
                       num_partitions=4).to_pandas()
    want = duckdb.connect().execute("""
        SELECT k, v, id FROM df QUALIFY
        ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC, id ASC) = 1
    """).fetchdf()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_group_argmax_multi_key():
    from kafka_connect_mongo_ray.functions.stats import group_argmax

    rng = np.random.default_rng(12)
    n = 1000
    df = pd.DataFrame({
        "a": rng.integers(0, 5, n),
        "b": rng.integers(0, 4, n),
        "v": rng.integers(0, 100, n),
        "id": np.arange(n, dtype=np.int64),
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = group_argmax(_rd(t).repartition(5), keys=["a", "b"],
                       order=[("v", "ascending"), ("id", "ascending")]
                       ).to_pandas()
    want = duckdb.connect().execute("""
        SELECT a, b, v, id FROM df QUALIFY
        ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY v ASC, id ASC) = 1
    """).fetchdf()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_linreg_components_exact_and_partition_invariant():
    from kafka_connect_mongo_ray.functions.stats import linreg_components

    rng = np.random.default_rng(13)
    x = rng.integers(1, 50, 4000).astype(np.float64)
    y = np.floor(x * 3.25 + rng.normal(0, 10, 4000))
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})

    a = linreg_components(_rd(t), "x", "y").to_pandas()
    b = linreg_components(_rd(t).repartition(11), "x", "y").to_pandas()
    pd.testing.assert_frame_equal(a, b)  # bit-exact under repartition

    slope_np, intercept_np = np.polyfit(x, y, 1)
    assert abs(a["slope"].iloc[0] - slope_np) < 1e-6
    assert abs(a["intercept"].iloc[0] - intercept_np) < 1e-4
    r = np.corrcoef(x, y)[0, 1]
    assert abs(a["r2"].iloc[0] - r * r) < 1e-9


def test_ntile_matches_sql_all_remainders():
    from kafka_connect_mongo_ray.functions.ranking import global_row_number

    con = duckdb.connect()
    for n, k in [(1000, 8), (1003, 8), (5, 8), (8, 8), (17, 4)]:
        rng = np.random.default_rng(n + k)
        df = pd.DataFrame({
            "o": rng.permutation(n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
        })
        t = pa.Table.from_pandas(df, preserve_index=False)
        got = global_row_number(_rd(t).repartition(4),
                                order_cols=["o", "id"],
                                num_buckets=4, ntile=(k, "tile")
                                ).to_pandas()
        want = con.execute(f"""
            SELECT o, id,
                   CAST(ROW_NUMBER() OVER (ORDER BY o, id) AS BIGINT) AS rn,
                   CAST(NTILE({k}) OVER (ORDER BY o, id) AS BIGINT) AS tile
            FROM df
        """).fetchdf()
        pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                      check_dtype=False)


def test_group_percent_rank_and_cume_dist_with_ties():
    from kafka_connect_mongo_ray.functions.ranking import group_percent_rank

    rng = np.random.default_rng(17)
    n = 2500
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n),
        # small integer domain forces heavy ties inside groups
        "v": rng.integers(0, 7, n).astype(np.float64),
        "id": np.arange(n, dtype=np.int64),
    })
    # one single-row group: PERCENT_RANK must be 0.0, CUME_DIST 1.0
    df.loc[0, "k"] = 999
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = group_percent_rank(_rd(t).repartition(6), key="k", order_col="v",
                             num_partitions=4).to_pandas()
    want = duckdb.connect().execute("""
        SELECT k, v, id,
               PERCENT_RANK() OVER (PARTITION BY k ORDER BY v) AS pr,
               CUME_DIST() OVER (PARTITION BY k ORDER BY v) AS cd
        FROM df
    """).fetchdf()
    g, w = _sorted(got), _sorted(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # bit-identical, not just close: both sides divide the same ints
    assert (g["pr"].to_numpy() == w["pr"].to_numpy()).all()
    assert (g["cd"].to_numpy() == w["cd"].to_numpy()).all()


def test_fixed_width_histogram_with_negatives():
    from kafka_connect_mongo_ray.functions.stats import fixed_width_histogram

    rng = np.random.default_rng(19)
    v = np.round(rng.normal(0, 250, 4000), 2)
    cents = np.rint(v * 100).astype(np.int64)
    t = pa.table({"v": pa.array(v), "cents": pa.array(cents)})
    df = t.to_pandas()
    got = fixed_width_histogram(_rd(t).repartition(5), "v", width=100.0,
                                cents_col="cents",
                                num_partitions=4).to_pandas()
    want = duckdb.connect().execute("""
        SELECT CAST(FLOOR(v / 100.0) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM df GROUP BY 1
    """).fetchdf()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want),
                                  check_dtype=False)


def test_repetition_stats_matches_sql_and_tie_break():
    from kafka_connect_mongo_ray.functions.text import repetition_stats_batch

    rng = np.random.default_rng(23)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee", "zz"])
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 40)))
             for _ in range(200)]
    # forced tie: 'aa' and 'bb' twice each -> top word must be 'aa'
    texts.append("bb aa bb aa cc")
    # single-token doc and empty text (SQL split('') -> [''])
    texts.append("solo")
    texts.append("")
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = repetition_stats_batch(t).to_pandas()
    want = duckdb.connect().execute("""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM df),
        c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
        t AS (SELECT doc_id, tok AS top_word, cnt AS top_cnt FROM c
              QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY cnt DESC, tok ASC) = 1),
        a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct
              FROM c GROUP BY doc_id)
        SELECT a.doc_id, a.n_words, a.n_distinct, t.top_word,
               CAST(t.top_cnt AS BIGINT) AS top_cnt,
               1.0 - CAST(a.n_distinct AS DOUBLE)
                     / CAST(a.n_words AS DOUBLE) AS dup_frac,
               CAST(t.top_cnt AS DOUBLE)
                   / CAST(a.n_words AS DOUBLE) AS top_frac
        FROM a JOIN t USING (doc_id)
    """).fetchdf()
    g, w = _sorted(got), _sorted(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    tie_row = got[got["doc_id"] == 200].iloc[0]
    assert tie_row["top_word"] == "aa" and tie_row["top_cnt"] == 2


def test_deterministic_sample_spans_full_id_range():
    from kafka_connect_mongo_ray.functions.similarity import (
        _deterministic_sample,
    )
    import ray.data as rd

    # n just under 2x sample_size: a floor stride would keep EVERY row
    # and the cut would truncate to the smallest ids; the ceiling
    # stride must instead spread picks across the whole id range
    n, size = 3999, 2000
    t = pa.table({"vec_id": pa.array(range(n), pa.int64())})
    out = _deterministic_sample(rd.from_arrow(t).repartition(7),
                                id_col="vec_id", sample_size=size)
    ids = out["vec_id"].to_pylist()
    assert len(ids) == size
    assert max(ids) > n * 0.9  # tail of the corpus is represented
    # identical under a different partitioning (order-independence)
    out2 = _deterministic_sample(rd.from_arrow(t).repartition(3),
                                 id_col="vec_id", sample_size=size)
    assert out2["vec_id"].to_pylist() == ids
