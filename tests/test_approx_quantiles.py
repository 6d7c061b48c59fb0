"""Approximate quantiles: mergeable equi-depth summaries with a
machine-checkable rank-error bound, and the one-pass exact-rank
helper they are verified against."""

import duckdb
import numpy as np
import pyarrow as pa


def _rd(t: pa.Table, parts: int):
    import ray.data as rd

    return rd.from_arrow(t).repartition(parts)


def test_approx_quantiles_rank_error_within_bound():
    from kafka_connect_mongo_ray.functions.quantiles import approx_quantiles

    rng = np.random.default_rng(29)
    n = 50_000
    # heavy-tailed: percentile spacing varies by orders of magnitude
    vals = np.exp(rng.normal(0, 2, n))
    t = pa.table({"v": pa.array(vals, pa.float64())})
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    cap = 256
    est = approx_quantiles(_rd(t, 16), "v", qs, per_block_cap=cap)
    s = np.sort(vals)
    for q in qs:
        # bound: ≤ N/cap per level × 2 levels (plus slack for the
        # final pick's half-step)
        rank = np.searchsorted(s, est[q], side="right")
        assert abs(rank - q * n) <= 2.5 * n / cap, (q, rank, q * n)


def test_approx_quantiles_bounded_summary_with_many_blocks():
    from kafka_connect_mongo_ray.functions.quantiles import approx_quantiles

    # many more blocks than fanin: the two-level merge must still hold
    # the bound (driver sees ≤ fanin × cap pairs regardless)
    rng = np.random.default_rng(31)
    n = 20_000
    vals = rng.uniform(-1000, 1000, n)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    est = approx_quantiles(_rd(t, 40), "v", [0.5], per_block_cap=128,
                           fanin=4)
    rank = np.searchsorted(np.sort(vals), est[0.5], side="right")
    assert abs(rank - 0.5 * n) <= 2.5 * n / 128


def test_exact_ranks_matches_sql_one_pass():
    from kafka_connect_mongo_ray.functions.quantiles import exact_ranks

    rng = np.random.default_rng(37)
    vals = np.round(rng.normal(0, 100, 8000), 3)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    df = t.to_pandas()
    cuts = [-150.0, 0.0, 42.5, 260.0]
    ranks, total = exact_ranks(_rd(t, 9), "v", cuts)
    con = duckdb.connect()
    for c, r in zip(cuts, ranks):
        want = con.execute(
            f"SELECT COUNT(*) FROM df WHERE v <= {c}").fetchone()[0]
        assert r == want
    assert total == len(vals)


def test_exact_ranks_empty_input():
    from kafka_connect_mongo_ray.functions.quantiles import exact_ranks

    t = pa.table({"v": pa.array([], pa.float64())})
    ranks, total = exact_ranks(_rd(t, 1), "v", [0.0, 10.0])
    assert ranks == [0, 0] and total == 0
