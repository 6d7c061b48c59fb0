"""Product-analytics operators: cohort retention, Pareto-frontier
skyline, weighted priority sampling, co-occurrence counts, OHLC bars.

Reference analog: none (the reference has no aggregates at all —
SURVEY.md §2.5); these are the analytics shapes a curation/BI layer on
the same change-stream tables needs, each expressed Ray-Data-first.

Scale shapes (one line each; details on the functions):
- ``cohort_retention``: batch-local (user, day) dedup → ONE user-keyed
  bucket shuffle (vectorized per-bucket kernel, volume bounded by
  distinct (user, day) per block) → cohort×offset-domain final sum.
- ``skyline_2d``: per-batch local skyline (associative: the global
  skyline is the skyline of local-skyline unions) → one single-task
  final pass over the tiny candidate set. Zero all-to-all.
- ``weighted_priority_sample``: Duffield–Lund–Thorup priority sampling
  (q_i = w_i / u_i), embarrassingly parallel per-block top-k + the
  shared two-level reduce. Priorities use ONLY IEEE-exact ops
  (dyadic-rational u, one multiply, one divide) so the SQL mirror is
  bit-identical — no libm transcendentals.
- ``cooccurrence_counts``: batch-local (user, item) dedup → one
  user-keyed bucket shuffle → per-bucket BITMASK kernel (per-user OR
  of item bits, pair counts via vectorized bit tests) → item²-domain
  final sum. Requires ≤ 64 distinct items per bucket by design (it is
  an operator for small categorical domains, e.g. event types).
- ``ohlc_bars``: per-batch partial {argmin/argmax ts carrier, min,
  max, count} per (key, bar) → one bar-domain-sized bucket shuffle →
  same kernel as the merge (the partial is associative). open/close/
  high/low are SELECTIONS of raw float64 values (never arithmetic),
  so the oracle mirror is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import (
    key_bucketed,
    limit_worker_threads,
    two_level_pick,
)

__all__ = [
    "cohort_retention",
    "skyline_2d",
    "weighted_priority_sample",
    "cooccurrence_counts",
    "ohlc_bars",
    "rolling_active_users",
    "gini_concentration",
    "transition_counts",
    "chi2_independence",
]

_US_PER_DAY = 86_400_000_000


def _day_str(days: np.ndarray) -> pa.Array:
    """Epoch-day int64 → 'YYYY-MM-DD' strings, vectorized through
    numpy datetime64 (no per-row strftime)."""
    d = days.astype("datetime64[D]")
    return pa.array(np.datetime_as_string(d, unit="D"), pa.string())


def _str_col(series) -> pa.Array:
    """pandas groupby(dropna=False) represents a NULL key as NaN;
    restore it to an Arrow null string. Domain-sized inputs only."""
    vals = series.to_numpy(dtype=object)
    return pa.array([None if (v is None or (isinstance(v, float)
                                            and np.isnan(v))) else str(v)
                     for v in vals], pa.string())


def _distinct_user_day(batch: pa.Table, user_col: str,
                       ts_col: str) -> pa.Table:
    """Batch-local distinct (user, epoch-day) pairs — the shared
    pre-dedup partial of cohort_retention and rolling_active_users."""
    import pandas as pd

    limit_worker_threads()
    u = np.asarray(batch[user_col], dtype=np.int64)
    day = (np.asarray(batch[ts_col]).astype("datetime64[us]")
           .astype(np.int64) // _US_PER_DAY)
    df = pd.DataFrame({"u": u, "day": day}).drop_duplicates()
    return pa.table({"u": pa.array(df["u"].to_numpy(), pa.int64()),
                     "day": pa.array(df["day"].to_numpy(), pa.int64())})


def cohort_retention(ds, *, user_col: str, ts_col: str,
                     num_partitions: int | None = None):
    """Daily cohort retention: cohort = the user's FIRST active day,
    one output row per (cohort_day, day_offset) with the count of
    distinct users from that cohort active at that offset — the
    standard retention-triangle query.

    SQL mirror: first-day per user via GROUP BY, DISTINCT (user, day)
    activity, join, COUNT(*) per (cohort, offset).

    Scale shape: each batch first dedups to its distinct (user, day)
    pairs (activity is heavily repeated within a block), so the ONE
    user-keyed bucket shuffle moves ≤ distinct-(user, day)-per-block
    rows, never events. The per-bucket kernel is one vectorized pandas
    pass (min-day transform + offset + local (cohort, offset) count),
    and the final exchange is cohort×offset-domain-sized."""
    from ray.data.aggregate import Sum

    def bucket_kernel(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"u": np.asarray(t["u"], dtype=np.int64),
                           "day": np.asarray(t["day"], dtype=np.int64)})
        # cross-batch duplicates of the same (user, day) meet here
        df = df.drop_duplicates(["u", "day"])
        d0 = df.groupby("u")["day"].transform("min")
        out = pd.DataFrame({"cohort": d0.to_numpy(),
                            "off": (df["day"] - d0).to_numpy()})
        g = out.groupby(["cohort", "off"], as_index=False).size()
        return pa.table({
            "cohort": pa.array(g["cohort"].to_numpy(), pa.int64()),
            "day_offset": pa.array(g["off"].to_numpy(), pa.int64()),
            "n": pa.array(g["size"].to_numpy(), pa.int64())})

    nparts = num_partitions or 32
    pairs = ds.map_batches(_distinct_user_day,
                           fn_kwargs={"user_col": user_col,
                                      "ts_col": ts_col},
                           batch_format="pyarrow")
    partial = key_bucketed(pairs, ["u"], nparts).map_groups(
        lambda t: bucket_kernel(t.drop_columns(["__gb"])),
        batch_format="pyarrow")
    summed = (partial.groupby(["cohort", "day_offset"],
                              num_partitions=min(nparts, 8))
              .aggregate(Sum("n", alias_name="n_users")))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": _day_str(np.asarray(t["cohort"], dtype=np.int64)),
            "day_offset": t["day_offset"],
            "n_users": pc.cast(t["n_users"], pa.int64())})

    return summed.map_batches(fmt, batch_format="pyarrow")


def _local_skyline(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Rows not dominated within ``t``: minimize x, maximize y; q
    dominates p iff q.x <= p.x AND q.y >= p.y AND (q.x < p.x OR
    q.y > p.y). Vectorized: sort by (x asc, y desc); within an equal-x
    run only the max-y rows can survive; across runs a row survives
    iff its y strictly exceeds the best y at any strictly smaller x."""
    if t.num_rows == 0:
        return t
    if "__gb" in t.column_names:
        t = t.drop_columns(["__gb"])
    order = pc.sort_indices(t, sort_keys=[(x_col, "ascending"),
                                          (y_col, "descending")])
    t = t.take(order)
    x = np.asarray(t[x_col], dtype=np.float64)
    y = np.asarray(t[y_col], dtype=np.float64)
    # run starts of equal-x groups
    starts = np.flatnonzero(np.concatenate([[True], x[1:] != x[:-1]]))
    run_id = np.cumsum(np.concatenate([[False], x[1:] != x[:-1]]))
    gmax = y[starts]          # max y per run (sorted y desc within run)
    # best y over all runs with strictly smaller x
    prev_best = np.concatenate([[-np.inf],
                                np.maximum.accumulate(gmax)[:-1]])
    run_alive = gmax > prev_best
    keep = run_alive[run_id] & (y == gmax[run_id])
    return t.filter(pa.array(keep))


def skyline_2d(ds, *, x_col: str, y_col: str):
    """2-D skyline (Pareto frontier): rows where no other row is ≤ on
    ``x_col`` AND ≥ on ``y_col`` with at least one strict — SQL's
    NOT EXISTS dominance anti-join. Duplicate (x, y) points on the
    frontier all survive (none strictly dominates its twin).

    Scale shape: the skyline operator is ASSOCIATIVE — the global
    skyline is the skyline of the union of per-block skylines — so
    each block reduces locally first (the survivors of an n-row block
    are typically O(log n) under any smooth distribution) and the
    single-task final pass sees only candidates. No shuffle at all."""
    cand = ds.map_batches(lambda t: _local_skyline(t, x_col, y_col),
                          batch_format="pyarrow")
    return two_level_pick(
        cand, lambda t: _local_skyline(t, x_col, y_col), None)


def weighted_priority_sample(ds, *, id_col: str, weight_cents_col: str,
                             k: int, num_partitions: int | None = None):
    """Deterministic weighted priority sample (Duffield–Lund–Thorup,
    "Priority sampling for estimation of arbitrary subset sums", JACM
    2007): each row gets priority q = w / u with u a uniform hash of
    its id, and the k highest-priority rows are the sample — inclusion
    probability rises with weight, membership is a pure function of
    the row key (reproducible across engines and re-runs).

    Bit-exactness contract: u = (2·h + 1) / 2^33 with h the first 8
    md5 hex digits of str(id) (a dyadic rational, exact in float64),
    so q = (w · 2^33) / (2h+1) is ONE IEEE multiply + ONE IEEE divide
    of exactly-representable integers — correctly rounded and
    therefore bit-identical in any IEEE engine; the SQL mirror
    computes the same two ops on the same operands. No ln/pow.

    Scale shape: priorities are embarrassingly parallel (the per-row
    Python md5 is the documented portable-hash cost shared with
    ``sample_by_md5``); selection is per-block top-k + the shared
    two-level reduce — never a global sort."""
    from kafka_connect_mongo_ray.functions.quantiles import md5_hex

    def prio(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = np.array([int(md5_hex(i)[:8], 16) for i in ids],
                     dtype=np.int64)
        w = np.asarray(batch[weight_cents_col], dtype=np.int64)
        q = (w.astype(np.float64) * 8589934592.0) / (2.0 * h + 1.0)
        return pa.table({id_col: batch[id_col],
                         "cents": pa.array(w, pa.int64()),
                         "priority": pa.array(q, pa.float64())})

    def pick(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("priority", "descending"),
                                              (id_col, "ascending")])
        return t.take(order[:k])

    cand = (ds.map_batches(prio, batch_format="pyarrow")
            .map_batches(pick, batch_format="pyarrow"))
    return two_level_pick(cand, pick, num_partitions)


def cooccurrence_counts(ds, *, user_col: str, item_col: str,
                        num_partitions: int | None = None):
    """Co-occurrence counts over a SMALL categorical item domain: for
    every unordered item pair (a < b), the number of distinct users
    that touched BOTH — the market-basket / co-view matrix at the
    granularity where it is dense.

    Scale shape: batches dedup to their distinct (user, item) pairs,
    ONE user-keyed bucket shuffle co-locates each user, and the
    per-bucket kernel is bitset algebra: factorize items (≤ 64 per
    bucket by contract — this is an operator for type-like domains),
    OR each user's item bits into one uint64 via ``np.bitwise_or.
    reduceat``, then count each pair with two vectorized bit tests.
    Output volume is items²-domain-sized; users never leave their
    bucket."""
    from ray.data.aggregate import Sum

    def dedup_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        limit_worker_threads()
        # NULL items never co-occur (SQL: the pair join's < never
        # matches NULL) — drop them up front
        batch = batch.filter(pc.is_valid(batch[item_col]))
        df = pd.DataFrame({
            "u": np.asarray(batch[user_col], dtype=np.int64),
            "item": np.asarray(batch[item_col]).astype(object)})
        df = df.drop_duplicates()
        return pa.table({"u": pa.array(df["u"].to_numpy(), pa.int64()),
                         "item": pa.array(df["item"], pa.string())})

    def bucket_kernel(t: pa.Table) -> pa.Table:
        import pandas as pd

        if "__gb" in t.column_names:
            t = t.drop_columns(["__gb"])
        u = np.asarray(t["u"], dtype=np.int64)
        codes, cats = pd.factorize(np.asarray(t["item"]).astype(object),
                                   sort=True)
        if len(cats) > 64:
            raise ValueError(
                f"cooccurrence_counts requires <= 64 distinct items per "
                f"bucket, saw {len(cats)} — this operator is for small "
                f"categorical domains")
        order = np.argsort(u, kind="stable")
        u, codes = u[order], codes[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        bits = np.left_shift(np.uint64(1), codes.astype(np.uint64))
        masks = np.bitwise_or.reduceat(bits, starts)
        pa_, pb_, n_ = [], [], []
        for i in range(len(cats)):
            hi = (masks >> np.uint64(i)) & np.uint64(1)
            for j in range(i + 1, len(cats)):
                c = int(np.sum(hi & ((masks >> np.uint64(j))
                                     & np.uint64(1))))
                if c:
                    pa_.append(str(cats[i]))
                    pb_.append(str(cats[j]))
                    n_.append(c)
        return pa.table({"type_a": pa.array(pa_, pa.string()),
                         "type_b": pa.array(pb_, pa.string()),
                         "n": pa.array(n_, pa.int64())})

    nparts = num_partitions or 32
    pairs = ds.map_batches(dedup_partial, batch_format="pyarrow")
    partial = key_bucketed(pairs, ["u"], nparts).map_groups(
        bucket_kernel, batch_format="pyarrow")
    return (partial.groupby(["type_a", "type_b"],
                            num_partitions=min(nparts, 8))
            .aggregate(Sum("n", alias_name="n_users")))


def _ohlc_reduce(t: pa.Table, key_cols: list[str]) -> pa.Table:
    """Associative OHLC combine over partial rows (a raw row is the
    trivial partial): per key group, keep open/close from the rows
    with the extreme (ts, id) carriers and min/max/sum the rest. One
    vectorized pass: sort by key + (o_ts, o_id), take group firsts for
    the open side; mirror for close; pandas groupby for min/max/n."""
    import pandas as pd

    if "__gb" in t.column_names:
        t = t.drop_columns(["__gb"])
    df = t.to_pandas()
    g = df.groupby(key_cols, sort=False, dropna=False)
    base = g.agg(high=("high", "max"), low=("low", "min"),
                 n=("n", "sum")).reset_index()
    first = (df.sort_values(key_cols + ["o_ts", "o_id"], kind="mergesort")
             .drop_duplicates(key_cols, keep="first"))
    last = (df.sort_values(key_cols + ["c_ts", "c_id"], kind="mergesort")
            .drop_duplicates(key_cols, keep="last"))
    out = base.merge(first[key_cols + ["o_ts", "o_id", "open"]],
                     on=key_cols)
    out = out.merge(last[key_cols + ["c_ts", "c_id", "close"]],
                    on=key_cols)
    cols = {c: out[c] for c in key_cols}
    for c in ["o_ts", "o_id", "c_ts", "c_id", "n"]:
        cols[c] = pa.array(out[c].to_numpy(), pa.int64())
    for c in ["open", "high", "low", "close"]:
        cols[c] = pa.array(out[c].to_numpy(), pa.float64())
    return pa.table(cols)


def ohlc_bars(ds, *, key_col: str, ts_col: str, val_col: str,
              id_col: str, bar_us: int = 3_600_000_000,
              num_partitions: int | None = None):
    """OHLC time bars per (key, bar): open = value at the earliest
    (ts, id), close = at the latest, high/low = extremes, n = count —
    the classic candlestick aggregation, with (ts, id) as the total
    order so ties are deterministic. open/high/low/close are
    SELECTIONS of raw float64 inputs (no arithmetic), so results are
    bit-exact against any engine.

    Scale shape: the OHLC state is associative, so each batch reduces
    to ≤ bars-present-per-block partial rows before the ONE bucket
    shuffle (bar-domain-sized), and the per-bucket merge is the same
    vectorized kernel."""
    def partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        ts = (np.asarray(batch[ts_col]).astype("datetime64[us]")
              .astype(np.int64))
        bar = (ts // bar_us) * bar_us
        raw = pa.table({
            key_col: batch[key_col],
            "bar_us": pa.array(bar, pa.int64()),
            "o_ts": pa.array(ts, pa.int64()),
            "o_id": pc.cast(batch[id_col], pa.int64()),
            "open": pc.cast(batch[val_col], pa.float64()),
            "c_ts": pa.array(ts, pa.int64()),
            "c_id": pc.cast(batch[id_col], pa.int64()),
            "close": pc.cast(batch[val_col], pa.float64()),
            "high": pc.cast(batch[val_col], pa.float64()),
            "low": pc.cast(batch[val_col], pa.float64()),
            "n": pa.array(np.ones(len(ts), dtype=np.int64), pa.int64()),
        })
        return _ohlc_reduce(raw, [key_col, "bar_us"])

    nparts = num_partitions or 32
    part = ds.map_batches(partial, batch_format="pyarrow")
    merged = key_bucketed(part, [key_col, "bar_us"], nparts).map_groups(
        lambda t: _ohlc_reduce(t, [key_col, "bar_us"]),
        batch_format="pyarrow")
    return merged.select_columns(
        [key_col, "bar_us", "open", "high", "low", "close", "n"])


def rolling_active_users(ds, *, user_col: str, ts_col: str,
                         window_days: int = 7,
                         num_partitions: int | None = None):
    """Rolling W-day active users per observed day (the WAU-per-day /
    stickiness denominator): for each day that has any activity, the
    count of distinct users active in the trailing ``window_days``
    window ending that day.

    Scale shape: batches dedup to distinct (user, day); ONE user-keyed
    bucket shuffle co-locates each user's days, and the per-bucket
    kernel expands each (user, day) to its ≤ W covered target days,
    dedups per user LOCALLY (all of a user's rows are in the bucket,
    so a user contributes exactly once per target day globally) and
    emits per-target partial counts — the final exchange and the
    observed-day filter are calendar-domain-sized. Fact rows cross the
    wire once, deduped, never W-fold."""
    from ray.data.aggregate import Sum

    def bucket_kernel(t: pa.Table) -> pa.Table:
        import pandas as pd

        if "__gb" in t.column_names:
            t = t.drop_columns(["__gb"])
        df = (pd.DataFrame({"u": np.asarray(t["u"], dtype=np.int64),
                            "day": np.asarray(t["day"], dtype=np.int64)})
              .drop_duplicates(["u", "day"]))
        u = np.repeat(df["u"].to_numpy(), window_days)
        tgt = (np.repeat(df["day"].to_numpy(), window_days)
               + np.tile(np.arange(window_days, dtype=np.int64), len(df)))
        cov = pd.DataFrame({"u": u, "tgt": tgt}).drop_duplicates()
        g = cov.groupby("tgt", as_index=False).size()
        return pa.table({"tgt": pa.array(g["tgt"].to_numpy(), pa.int64()),
                         "n": pa.array(g["size"].to_numpy(), pa.int64())})

    nparts = num_partitions or 32
    pairs = ds.map_batches(_distinct_user_day,
                           fn_kwargs={"user_col": user_col,
                                      "ts_col": ts_col},
                           batch_format="pyarrow")
    pairs = pairs.materialize()  # two consumers below (counts + days)
    counts = (key_bucketed(pairs, ["u"], nparts)
              .map_groups(bucket_kernel, batch_format="pyarrow")
              .groupby("tgt", num_partitions=min(nparts, 8))
              .aggregate(Sum("n", alias_name="wau")))
    # observed-day filter: the day domain is calendar-bounded, so the
    # broadcast set is tiny by construction
    def day_partial(t: pa.Table) -> pa.Table:
        d = np.unique(np.asarray(t["day"], dtype=np.int64))
        return pa.table({"day": pa.array(d, pa.int64())})

    observed = set(
        np.asarray(pairs.map_batches(day_partial, batch_format="pyarrow")
                   .unique("day"), dtype=np.int64).tolist())

    def fmt(t: pa.Table) -> pa.Table:
        tgt = np.asarray(t["tgt"], dtype=np.int64)
        keep = np.array([d in observed for d in tgt], dtype=bool)
        t = t.filter(pa.array(keep))
        return pa.table({
            "day": _day_str(np.asarray(t["tgt"], dtype=np.int64)),
            "wau": pc.cast(t["wau"], pa.int64())})

    return counts.map_batches(fmt, batch_format="pyarrow")


def _exact_rank_weighted_sums(x: np.ndarray) -> tuple[int, int]:
    """Exact ``(Σx, Σ i·x)`` over an int64 array with 1-based ranks —
    chunked vectorized int64 partials accumulated in Python ints
    (arbitrary precision), so the result is exact at ANY domain size
    without a per-element interpreter loop.

    Overflow proof: with ``C = floor(sqrt(2^62 / max|x|))`` every
    in-chunk partial is bounded — ``Σ|chunk| ≤ C·max|x| ≤ 2^62`` and
    ``Σ local_rank·|chunk| ≤ C²·max|x| ≤ 2^62`` — both below the int64
    limit; the global-rank offset contribution ``start·Σchunk`` and
    the running totals multiply/add exact Python ints."""
    n = len(x)
    if n == 0:
        return 0, 0
    max_abs = int(np.abs(x).max())
    if max_abs == 0:
        return 0, 0
    chunk = max(1, int((2**62 // max_abs) ** 0.5))
    s0 = 0
    s1 = 0
    for start in range(0, n, chunk):
        c = x[start:start + chunk]
        sc = int(c.sum())
        lw = np.arange(1, len(c) + 1, dtype=np.int64)
        s1 += start * sc + int(np.dot(lw, c))
        s0 += sc
    return s0, s1


def gini_concentration(ds, *, key_col: str, cents_col: str,
                       num_partitions: int | None = None):
    """Gini coefficient of the per-key distribution of an exact-cents
    measure (revenue concentration — the inequality complement of the
    Pareto cut): G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with x sorted
    ascending and 1-based ranks. Tie order cannot change the result
    (equal x within a tie block contribute the same Σ i·x for any
    permutation), so the statistic is deterministic.

    Exactness: the sorted scan accumulates CHUNKED int64 numpy partials
    in PYTHON ints (arbitrary precision — a single int64 Σ i·x would
    overflow at ~10^9 keys, while a per-element Python loop is a
    multi-minute single-task straggler at a 10^8-key domain); the
    chunk size is derived from max|x| so every vectorized partial is
    provably below 2^62 (see ``_exact_rank_weighted_sums``). Mirrored
    by HUGEINT sums in SQL; both sides round to float64 once, in the
    same two casts and one division. Scale shape: one groupby-sum
    collapses facts to the key domain; the cumulative scan is a single
    task over that dimension-sized table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "k": np.asarray(batch[key_col], dtype=np.int64),
            "x": np.asarray(batch[cents_col], dtype=np.int64)})
        g = df.groupby("k", as_index=False)["x"].sum()
        return pa.table({"k": pa.array(g["k"].to_numpy(), pa.int64()),
                         "x": pa.array(g["x"].to_numpy(), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("k", num_partitions=num_partitions or 32)
           .aggregate(Sum("x", alias_name="x")))

    def scan(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("x", "ascending"),
                                              ("k", "ascending")])
        x = np.asarray(t.take(order)["x"], dtype=np.int64)
        n = len(x)
        s0, s1 = _exact_rank_weighted_sums(x)
        gini = (float(2 * s1 - (n + 1) * s0) / float(n * s0)
                if n and s0 else float("nan"))
        return pa.table({"n": pa.array([n], pa.int64()),
                         "total_cents": pa.array([s0], pa.int64()),
                         "gini": pa.array([gini], pa.float64())})

    return agg.repartition(1).map_batches(scan, batch_format="pyarrow")


def transition_counts(ds, *, key_col: str, order_cols: list[str],
                      state_col: str,
                      num_partitions: int | None = None):
    """First-order transition matrix: counts of consecutive
    (state → next state) pairs per key under ``order_cols`` — SQL's
    LEAD(state) OVER (PARTITION BY key ORDER BY ...) join-free. The
    behavioral "next action" matrix over a categorical column.

    Scale shape: one key-bucketed shuffle; the per-bucket kernel is a
    key-sorted segment pass (the repo's window-family pattern —
    np boundary arithmetic, one pandas value_counts on the pair
    codes), emitting state²-domain partials into a tiny final sum."""
    from ray.data.aggregate import Sum

    def bucket_kernel(t: pa.Table) -> pa.Table:
        import pandas as pd

        if "__gb" in t.column_names:
            t = t.drop_columns(["__gb"])
        t = t.sort_by([(key_col, "ascending")]
                      + [(c, "ascending") for c in order_cols])
        k = np.asarray(t[key_col])
        s = np.asarray(t[state_col]).astype(object)
        n = len(k)
        if n < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = k[1:] == k[:-1]
        df = pd.DataFrame({"a": s[:-1][same], "b": s[1:][same]})
        # SQL mirror: WHERE nxt IS NOT NULL filters only the TO side;
        # a NULL from-state keeps its row (dropna=False)
        df = df[df["b"].notna()]
        g = df.groupby(["a", "b"], as_index=False, dropna=False).size()
        return pa.table({
            "from_type": _str_col(g["a"]),
            "to_type": _str_col(g["b"]),
            "n": pa.array(g["size"].to_numpy(), pa.int64())})

    nparts = num_partitions or 32
    bucketed = key_bucketed(ds, [key_col], nparts)
    partial = bucketed.map_groups(bucket_kernel, batch_format="pyarrow")
    return (partial.groupby(["from_type", "to_type"],
                            num_partitions=min(nparts, 8))
            .aggregate(Sum("n", alias_name="n")))


def chi2_independence(ds, *, a_col: str, b_col: str,
                      num_partitions: int | None = None):
    """Pearson chi-squared test of independence between two
    categorical columns: χ² = Σ (O − E)² / E over the contingency
    table, E = row_total · col_total / n. Returns one row
    (n, dof, chi2) with dof = (R−1)(C−1) and chi2 rounded to 9 dp —
    the float is a short chain of IEEE +,·,/ over exact int64 counts
    computed cell-by-cell on both sides; only the cross-cell summation
    order differs from SQL, and 9-dp rounding absorbs that ULP slack
    (the repo's closed-form-float convention, see linreg_components).

    Scale shape: batches pre-aggregate to cells-present partials, the
    one exchange is contingency-domain-sized, and the statistic is a
    single task over that tiny table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        limit_worker_threads()
        df = pd.DataFrame({
            "a": np.asarray(batch[a_col]).astype(object),
            "b": np.asarray(batch[b_col], dtype=np.int64)})
        # SQL GROUP BY keeps NULL as its own category (dropna=False)
        g = df.groupby(["a", "b"], as_index=False, dropna=False).size()
        return pa.table({"a": _str_col(g["a"]),
                         "b": pa.array(g["b"].to_numpy(), pa.int64()),
                         "o": pa.array(g["size"].to_numpy(), pa.int64())})

    cont = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["a", "b"], num_partitions=min(num_partitions or 8, 8))
            .aggregate(Sum("o", alias_name="o")))

    def stat(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        n = int(df.o.sum())
        # densify to the FULL R×C cross product (unobserved cells have
        # O = 0 but E > 0 and contribute E) via a cross merge — pandas
        # merge matches NaN==NaN, so a NULL category stays a category
        # exactly as SQL GROUP BY treats it
        rt = df.groupby("a", dropna=False, as_index=False).o.sum() \
               .rename(columns={"o": "rt"})
        ct = df.groupby("b", dropna=False, as_index=False).o.sum() \
               .rename(columns={"o": "ct"})
        full = rt.merge(ct, how="cross").merge(df, on=["a", "b"],
                                               how="left")
        full["o"] = full["o"].fillna(0)
        e = (full.rt.to_numpy().astype(np.float64)
             * full.ct.to_numpy().astype(np.float64)) / float(n)
        o = full.o.to_numpy().astype(np.float64)
        chi2 = round(float(np.sum((o - e) ** 2 / e)), 9)
        dof = (len(rt) - 1) * (len(ct) - 1)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "dof": pa.array([dof], pa.int64()),
                         "chi2": pa.array([chi2], pa.float64())})

    return cont.repartition(1).map_batches(stat, batch_format="pyarrow")
