"""Standalone repro for the chained Dataset.join flake (NEXT.md #5).

Symptom (Ray 2.49.2): chaining TWO native ``Dataset.join`` hops in one
plan intermittently fails inside ``HashShuffleAggregator.finalize``
with::

    ValueError: No match or multiple matches for key field 'k1'
    on left side

Observed twice in long-lived pytest sessions (200+ prior Dataset
executions), never in a fresh process — which is exactly what makes it
worth an upstream issue: some aggregator-pool state appears to survive
between executions.

This script makes the session long-lived on purpose: it runs
``--churn`` unrelated shuffle executions (groupbys/sorts over random
data) to age the cluster, then ``--iters`` chained two-hop native
joins, verifying each against a DuckDB oracle. Any failure prints the
full exception and the iteration number, and the script exits nonzero.

Usage::

    python tools/repro_native_join_chain.py --iters 50 --churn 30
    # clean run -> "no flake reproduced"; nonzero exit -> got it

The engine's gate queries default to ONE native hop + the portable
bucketed hash_join for the remaining hops (pipelines/queries.py), so
this flake cannot bite the gate; the script exists to (a) demonstrate
the repro recipe for an upstream report and (b) re-test new Ray
versions before re-enabling chained native hops.
"""

from __future__ import annotations

import argparse
import random
import sys

import numpy as np
import pyarrow as pa


def make_tables(seed: int):
    rng = np.random.default_rng(seed)
    n_fact, n_d1, n_d2 = 20_000, 500, 200
    fact = pa.table({
        "k1": pa.array(rng.integers(0, n_d1, n_fact), pa.int64()),
        "k2": pa.array(rng.integers(0, n_d2, n_fact), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, n_fact), pa.int64()),
    })
    d1 = pa.table({
        "k1": pa.array(np.arange(n_d1), pa.int64()),
        "a": pa.array(rng.integers(0, 50, n_d1), pa.int64()),
    })
    d2 = pa.table({
        "k2": pa.array(np.arange(n_d2), pa.int64()),
        "b": pa.array(rng.integers(0, 50, n_d2), pa.int64()),
    })
    return fact, d1, d2


def oracle_sum(fact: pa.Table, d1: pa.Table, d2: pa.Table) -> int:
    import duckdb

    con = duckdb.connect()
    con.register("fact", fact.to_pandas())
    con.register("d1", d1.to_pandas())
    con.register("d2", d2.to_pandas())
    return int(con.sql(
        "SELECT COALESCE(SUM(v + a + b), 0) FROM fact "
        "JOIN d1 USING (k1) JOIN d2 USING (k2)").fetchone()[0])


def chained_native_join_sum(fact, d1, d2, num_partitions: int) -> int:
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = (rd.from_arrow(fact)
          .join(rd.from_arrow(d1), "inner", num_partitions, on=("k1",))
          .join(rd.from_arrow(d2), "inner", num_partitions, on=("k2",)))
    row = ds.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(np.asarray(t["v"]).sum() + np.asarray(t["a"]).sum()
                 + np.asarray(t["b"]).sum())], pa.int64())}),
        batch_format="pyarrow").aggregate(Sum("s", alias_name="s"))
    return int(row["s"] or 0)


def churn_once(i: int):
    """One unrelated shuffle execution to age the session (the flake
    never shows in a fresh process)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    rng = np.random.default_rng(1000 + i)
    t = pa.table({"g": pa.array(rng.integers(0, 97, 50_000), pa.int64()),
                  "x": pa.array(rng.standard_normal(50_000))})
    if i % 2:
        rd.from_arrow(t).groupby("g").aggregate(Count()).count()
    else:
        rd.from_arrow(t).sort("x").limit(5).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--churn", type=int, default=30)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    random.seed(args.seed)
    print(f"churning session with {args.churn} unrelated shuffle "
          f"executions...", flush=True)
    for i in range(args.churn):
        churn_once(i)

    failures = 0
    for i in range(args.iters):
        fact, d1, d2 = make_tables(args.seed + i)
        want = oracle_sum(fact, d1, d2)
        try:
            got = chained_native_join_sum(fact, d1, d2, args.partitions)
        except Exception as e:  # the flake is a raised ValueError
            failures += 1
            print(f"iter {i}: FLAKE REPRODUCED -> {type(e).__name__}: {e}",
                  flush=True)
            continue
        if got != want:
            failures += 1
            print(f"iter {i}: WRONG RESULT {got} != {want}", flush=True)
        # interleave churn so aggregator pools keep cycling
        if i % 5 == 4:
            churn_once(10_000 + i)

    ray.shutdown()
    if failures:
        print(f"{failures}/{args.iters} chained native-join executions "
              f"failed")
        return 1
    print(f"no flake reproduced in {args.iters} chained native-join "
          f"executions (ray {ray.__version__})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
