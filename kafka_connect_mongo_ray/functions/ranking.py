"""Ordered / window operators: per-key lag deltas, running sums, and a
distributed global ROW_NUMBER.

The reference engine exposes only per-namespace `$natural` ordering
(``database/OplogReader.kt:55``); a lake-side engine needs the full
ordered-analytics family over that ordered stream. All operators here
avoid any driver-side iteration:

- per-key window functions (:func:`lag_delta`, :func:`running_sum`,
  :func:`rolling_mean`, :func:`group_percent_rank`) shuffle by a HASH
  BUCKET of the key and run ONE segment-vectorized numpy kernel per
  bucket: a ``groupby(key).map_groups`` call per distinct key is a
  fixed cost that scales with key count (millions of users at corpus
  scale), while the bucketed kernel costs one sort + O(n) boundary
  arithmetic regardless of how many keys share the bucket;
- :func:`global_row_number` is the classic distributed rank: sample
  order-key boundaries (bounded driver sample), range-bucket every row
  by broadcast ``searchsorted``, count rows per bucket (a tiny
  aggregate), then sort each bucket locally and add the exclusive
  prefix-sum offset. Two small shuffles, no global sort funnel, no
  block-metadata introspection — scales to any row count because the
  only driver state is ``num_buckets`` counts + ``sample_size`` keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["lag_delta", "running_sum", "rolling_mean", "global_row_number",
           "dense_rank", "group_percent_rank", "rank_with_ties",
           "group_string_agg", "funnel_counts", "throttle",
           "validity_intervals", "time_weighted_avg", "longest_streak"]


def _sort_key_arrays(t: pa.Table, order_cols: list[str]) -> pa.Table:
    return t.sort_by([(c, "ascending") for c in order_cols])


def _key_bucketed(ds, key: str, num_partitions: int | None):
    """Append a dtype-stable hash bucket of ``key`` and group by it —
    all rows of a key share its bucket, so per-key windows stay intact
    while the per-group fixed cost is paid per BUCKET, not per key.
    Delegates to utils.key_bucketed (the string-cast hash: a raw numpy
    hash flips int64→float64 on null-bearing batches and would split
    keys across buckets)."""
    from kafka_connect_mongo_ray.utils import key_bucketed

    return key_bucketed(ds, [key], num_partitions or 32)


def _segments(k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Boundary arithmetic over a KEY-SORTED array: returns
    (first-row-of-key mask, per-row segment-start index, per-row
    segment length)."""
    n = len(k)
    first = np.zeros(n, dtype=bool)
    if n:
        first[0] = True
        first[1:] = k[1:] != k[:-1]
    idx_first = np.flatnonzero(first)
    counts = np.diff(np.append(idx_first, n))
    seg_start = np.repeat(idx_first, counts)
    seg_len = np.repeat(counts, counts)
    return first, seg_start, seg_len


def lag_delta(ds, *, key: str, order_cols: list[str], ts_col: str,
              out_col: str = "delta", num_partitions: int | None = None):
    """Per-``key`` difference between each row's ``ts_col`` and the
    previous row's (ordered by ``order_cols``); first row per key is
    null — LAG(ts) OVER (PARTITION BY key ORDER BY ...) subtraction.

    ``ts_col`` must be an integer column (e.g. epoch microseconds);
    the delta is emitted as int64 so the result is bit-stable."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending")] + [(c, "ascending") for c in order_cols])
        k = np.asarray(t[key])
        ts = np.asarray(t[ts_col], dtype=np.int64)
        first, _, _ = _segments(k)
        delta = np.zeros(len(ts), dtype=np.int64)
        if len(ts) > 1:
            delta[1:] = ts[1:] - ts[:-1]
        delta[first] = 0  # LAG of the first row per key is NULL
        return t.append_column(out_col,
                               pa.array(delta, pa.int64(), mask=first))

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def fill_forward(ds, *, key: str, order_cols: list[str], val_col: str,
                 out_col: str = "filled",
                 num_partitions: int | None = None):
    """Per-``key`` last-observation-carried-forward imputation of a
    null-bearing float column ordered by ``order_cols`` —
    ``last_value(val IGNORE NULLS) OVER (PARTITION BY key ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``. Rows before a key's first observation
    stay null. The filled value is a SELECTION of raw float64 (no
    arithmetic), so the SQL mirror is bit-exact.

    In-group kernel is loop-free: one ``np.maximum.accumulate`` over
    valid-row indices carries each row's latest observation pointer,
    and the segment-start arithmetic cuts carries at key boundaries —
    the same one-exchange shape as the rest of the window family."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending")] + [(c, "ascending") for c in order_cols])
        k = np.asarray(t[key])
        col = t[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        vals = np.asarray(col, dtype=np.float64)
        n = len(k)
        _, seg_start, _ = _segments(k)
        src = np.where(valid, np.arange(n, dtype=np.int64),
                       np.int64(-1))
        carried = np.maximum.accumulate(src)
        # a carry from BEFORE this key's segment is not an observation
        has = carried >= seg_start
        out = np.where(has, vals[np.maximum(carried, 0)], 0.0)
        return t.append_column(out_col,
                               pa.array(out, pa.float64(), mask=~has))

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def interpolate_linear(ds, *, key: str, order_col: str, ts_col: str,
                       val_col: str, out_col: str = "interp",
                       round_to: int = 9,
                       num_partitions: int | None = None):
    """Per-``key`` LINEAR interpolation of a null-bearing float column
    between its neighboring observations on the ``ts_col`` axis — the
    gap-filling complement of :func:`fill_forward`. Observed rows keep
    their value; a gap row between observations (pv@pt, nv@nt) fills
    as ``pv + (nv - pv) * ((t - pt) / (nt - pt))`` (that literal
    float64 op order — mirror it verbatim in SQL and round both sides
    to ``round_to``); rows outside the observed span, and degenerate
    pt == nt gaps, stay null. Rows are ordered by (ts_col, order_col)
    within the key.

    Kernel is loop-free: the LOCF maximum.accumulate carries the
    previous-observation pointer, its reverse carries the next, and
    segment arithmetic cuts both at key boundaries."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending"), (ts_col, "ascending"),
             (order_col, "ascending")])
        k = np.asarray(t[key])
        col = t[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        vals = np.asarray(col, dtype=np.float64)
        ts = np.asarray(t[ts_col], dtype=np.int64)
        n = len(k)
        _, seg_start, seg_len = _segments(k)
        idx = np.arange(n, dtype=np.int64)
        prev = np.maximum.accumulate(np.where(valid, idx, np.int64(-1)))
        has_prev = prev >= seg_start
        # next observation: the SMALLEST valid index >= row — a
        # minimum.accumulate over the reversed array (sentinel n)
        nxt_rev = np.minimum.accumulate(
            np.where(valid[::-1], idx[::-1], np.int64(n)))
        nxt = nxt_rev[::-1]
        # cut at the segment END: nxt must stay inside this key
        seg_end = seg_start + seg_len - 1
        has_next = nxt <= seg_end
        p = np.maximum(prev, 0)
        q = np.minimum(nxt, n - 1)  # sentinel n clamps; unused when masked
        pt, nt = ts[p], ts[q]
        fillable = (~valid) & has_prev & has_next & (nt > pt)
        frac = np.zeros(n, dtype=np.float64)
        np.divide((ts - pt).astype(np.float64),
                  (nt - pt).astype(np.float64), out=frac, where=fillable)
        interp = vals[p] + (vals[q] - vals[p]) * frac
        # DuckDB ROUND is half-away-from-zero; np.round is half-even —
        # pin Arrow's mode (the repo's standing float-mirror rule)
        interp = np.asarray(pc.round(pa.array(interp, pa.float64()),
                                     round_to,
                                     round_mode="half_towards_infinity"))
        out = np.where(valid, vals, interp)
        keep = valid | fillable
        return t.append_column(out_col,
                               pa.array(out, pa.float64(), mask=~keep))

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def running_sum(ds, *, key: str, order_cols: list[str], val_col: str,
                out_col: str = "running_sum",
                num_partitions: int | None = None):
    """Per-``key`` cumulative sum of integer ``val_col`` ordered by
    ``order_cols`` — SUM(val) OVER (PARTITION BY key ORDER BY ... ROWS
    UNBOUNDED PRECEDING). Integer-only on purpose: a float cumsum's
    value depends on addition order, an int64 one does not."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending")] + [(c, "ascending") for c in order_cols])
        k = np.asarray(t[key])
        vals = np.asarray(t[val_col], dtype=np.int64)
        _, seg_start, _ = _segments(k)
        cs = np.cumsum(vals)
        # subtract the cumsum just BEFORE each row's segment start
        run = cs - (cs[seg_start] - vals[seg_start])
        return t.append_column(out_col, pa.array(run, pa.int64()))

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def rolling_mean(ds, *, key: str, order_cols: list[str], val_col: str,
                 window: int, out_col: str = "rolling_mean",
                 num_partitions: int | None = None):
    """Per-``key`` trailing mean of integer ``val_col`` over the last
    ``window`` rows ordered by ``order_cols`` — AVG(val) OVER
    (PARTITION BY key ORDER BY ... ROWS window-1 PRECEDING). The
    windowed sum is an exact int64 difference of prefix sums; only the
    final division is float, so the result is bit-stable for any
    partitioning."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending")] + [(c, "ascending") for c in order_cols])
        k = np.asarray(t[key])
        vals = np.asarray(t[val_col], dtype=np.int64)
        _, seg_start, _ = _segments(k)
        pos = np.arange(len(vals))
        cs = np.concatenate(([0], np.cumsum(vals)))
        lo = np.maximum(pos - window + 1, seg_start)
        wsum = cs[pos + 1] - cs[lo]
        cnt = pos + 1 - lo
        return t.append_column(out_col, pa.array(wsum / cnt, pa.float64()))

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def group_percent_rank(ds, *, key: str, order_col: str,
                       pr_col: str = "pr", cd_col: str = "cd",
                       num_partitions: int | None = None):
    """Per-``key`` PERCENT_RANK() and CUME_DIST() OVER (PARTITION BY
    key ORDER BY ``order_col``) in one groupby shuffle.

    The kernel is segment-vectorized numpy over the (key, value)-sorted
    bucket: rank-with-gaps is the first index of each equal-value run
    within its key segment + 1, cume_dist is the run's last index + 1
    over the segment length, percent_rank is ``(rank − 1) / (n − 1)``
    (0.0 for a single-row group, matching SQL). Both divisions are
    int-derived float64 ops, so a SQL oracle over the same doubles is
    bit-identical. Ties share identical outputs, so result determinism
    doesn't need a total order."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending"), (order_col, "ascending")])
        k = np.asarray(t[key])
        v = np.asarray(t[order_col])
        n = len(v)
        first, seg_start, seg_len = _segments(k)
        # start of each equal-(key, value) run
        new_run = first.copy()
        if n > 1:
            new_run[1:] |= v[1:] != v[:-1]
        pos = np.arange(n)
        run_first = np.maximum.accumulate(np.where(new_run, pos, 0))
        run_starts = np.flatnonzero(new_run)
        run_counts = np.diff(np.append(run_starts, n))
        run_last = np.repeat(run_starts + run_counts - 1, run_counts)
        rank = run_first - seg_start + 1
        cd = (run_last - seg_start + 1) / seg_len
        pr = np.where(seg_len > 1, (rank - 1) / np.maximum(seg_len - 1, 1),
                      0.0)
        out = t.append_column(pr_col, pa.array(pr, pa.float64()))
        return out.append_column(cd_col, pa.array(cd, pa.float64()))

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def _spaced_sample(order_col: str, per_block: int):
    """Deterministic per-batch evenly-spaced sample of the
    range-partitioning column (no RNG: resumable replays must see
    identical boundaries). Emits at most ``per_block`` values per
    batch regardless of batch size."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = np.unique(np.linspace(0, n - 1, min(per_block, n),
                                    dtype=np.int64)) if n else np.array([], np.int64)
        return batch.select([order_col]).take(pa.array(idx))

    return fn


def _range_bounds(base, lead: str, num_buckets: int,
                  sample_per_block: int) -> np.ndarray:
    """Two-level evenly-spaced sample of ``lead`` → ``num_buckets - 1``
    range boundaries; driver state capped at sample_per_block ×
    num_buckets scalars regardless of row count. Shared by the rank
    operators (row_number, dense_rank)."""
    sample = (base.map_batches(_spaced_sample(lead, sample_per_block),
                               batch_format="pyarrow")
              .repartition(num_buckets)
              .map_batches(_spaced_sample(lead, sample_per_block),
                           batch_format="pyarrow")
              .take_all())
    keys = np.sort(np.array([r[lead] for r in sample]))
    if len(keys):
        qs = np.linspace(0, 1, num_buckets + 1)[1:-1]
        return np.unique(keys[(qs * (len(keys) - 1)).astype(np.int64)])
    return np.array([], dtype=np.int64)


def _bucket_assigner(bounds: np.ndarray, lead: str):
    def assign(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[lead])
        b = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return batch.append_column("__rbucket", pa.array(b))

    return assign


def global_row_number(ds, *, order_cols: list[str], rank_col: str = "rn",
                      num_buckets: int = 32, sample_per_block: int = 64,
                      start: int = 1,
                      ntile: tuple[int, str] | None = None):
    """Distributed ROW_NUMBER() OVER (ORDER BY ``order_cols``).

    Range partitioning is driven by the FIRST order column only, so all
    ties on it land in one bucket and the within-bucket sort over the
    full ``order_cols`` settles them; the remaining columns must make
    the order total for a deterministic result (same contract as any
    rank over a non-unique leading key).

    Driver state is bounded INDEPENDENT of row count: stage 1 samples
    ≤ ``sample_per_block`` evenly-spaced keys per block, stage 2
    coalesces that sample to ``num_buckets`` blocks and samples again,
    so at most ``sample_per_block × num_buckets`` scalars reach the
    driver (then reduce to ``num_buckets - 1`` boundaries), plus one
    count per bucket. Skewed leading keys cost nothing here — ties all
    land in one bucket by construction — but a single value spanning
    a large fraction of all rows makes that bucket's local sort the
    straggler (same contract as any range partitioning).

    The input lineage executes EXACTLY ONCE: ``ds`` is materialized up
    front (the multi-consumer staging rule — see functions/graph.py),
    so the boundary sample, the per-bucket counts, and the rank pass
    all start from the same cached blocks. The counts pass never
    shuffles row data either: each batch reduces to a ≤num_buckets-row
    bincount and only those partials move.

    ``ntile=(k, col)`` additionally emits SQL's NTILE(k) OVER (same
    ORDER BY) in ``col`` at zero extra passes: the total row count is
    already on the driver (the sum of the per-bucket counts), and the
    tile is a pure integer function of (rn, total, k) computed inside
    the same rank pass — the first ``total % k`` tiles get
    ``total // k + 1`` rows, the rest ``total // k``."""
    lead = order_cols[0]

    base = ds.materialize()
    bounds = _range_bounds(base, lead, num_buckets, sample_per_block)
    bucketed = base.map_batches(_bucket_assigner(bounds, lead),
                                batch_format="pyarrow")

    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[lead])
        b = np.searchsorted(bounds, v, side="right")
        c = np.bincount(b, minlength=len(bounds) + 1)
        nz = np.flatnonzero(c)
        return pa.table({"__rbucket": pa.array(nz.astype(np.int32)),
                         "n": pa.array(c[nz], pa.int64())})

    counts = {int(r["__rbucket"]): int(r["n"])
              for r in base.map_batches(partial_counts, batch_format="pyarrow")
              .groupby("__rbucket").aggregate(Sum("n", alias_name="n"))
              .take_all()}
    offsets = {}
    acc = start
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    total = sum(counts.values())

    def rank_bucket(g: pa.Table) -> pa.Table:
        t = _sort_key_arrays(g, order_cols)
        b = int(t["__rbucket"][0].as_py())
        rn = offsets[b] + np.arange(t.num_rows, dtype=np.int64)
        out = t.drop_columns(["__rbucket"]).append_column(
            rank_col, pa.array(rn, pa.int64()))
        if ntile is not None:
            k, tile_col = ntile
            base_sz, rem = divmod(total, k)
            # 0-based position within the global order
            pos = rn - start
            big_span = rem * (base_sz + 1)
            tile = np.where(
                pos < big_span,
                pos // (base_sz + 1) + 1,
                # base_sz == 0 implies total < k, so every pos is in
                # the big-tile span and this branch never evaluates on
                # real data — max(base_sz, 1) only silences the /0
                rem + (pos - big_span) // max(base_sz, 1) + 1)
            out = out.append_column(tile_col,
                                    pa.array(tile.astype(np.int64),
                                             pa.int64()))
        return out

    return bucketed.groupby("__rbucket",
                            num_partitions=min(num_buckets, max(len(counts), 1))
                            ).map_groups(rank_bucket, batch_format="pyarrow")


def rank_with_ties(ds, *, order_col: str, rank_col: str = "rnk",
                   num_buckets: int = 32, sample_per_block: int = 64):
    """Distributed RANK() OVER (ORDER BY ``order_col`` ASC): equal
    values share a rank and the next distinct value's rank jumps by
    the tie count (SQL RANK, completing the family next to
    :func:`global_row_number` and :func:`dense_rank`).

    ``rank(v) = 1 + #rows with value < v``, so the shape is the
    row-count variant of :func:`dense_rank`: sampled range boundaries
    (bounded driver state), per-bucket ROW counts from per-batch
    bincount partials (no row data shuffles in the counts pass), then
    one rank-pass shuffle where each bucket sorts its values once and
    ranks every row via ``searchsorted(side='left')`` plus the
    exclusive prefix-sum offset of earlier buckets. Ties never split
    across buckets — every equal value lands in exactly one bucket by
    the same ``side='right'`` boundary rule in both passes."""
    base = ds.materialize()
    bounds = _range_bounds(base, order_col, num_buckets, sample_per_block)

    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[order_col])
        b = np.searchsorted(bounds, v, side="right")
        c = np.bincount(b, minlength=len(bounds) + 1)
        nz = np.flatnonzero(c)
        return pa.table({"__rbucket": pa.array(nz.astype(np.int32)),
                         "n": pa.array(c[nz], pa.int64())})

    counts = {int(r["__rbucket"]): int(r["n"])
              for r in base.map_batches(partial_counts,
                                        batch_format="pyarrow")
              .groupby("__rbucket").aggregate(Sum("n", alias_name="n"))
              .take_all()}
    offsets = {}
    acc = 1
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["__rbucket"][0].as_py())
        v = np.asarray(g[order_col])
        sv = np.sort(v)
        rnk = offsets[b] + np.searchsorted(sv, v, side="left")
        return g.drop_columns(["__rbucket"]).append_column(
            rank_col, pa.array(rnk.astype(np.int64), pa.int64()))

    return (base.map_batches(_bucket_assigner(bounds, order_col),
                             batch_format="pyarrow")
            .groupby("__rbucket",
                     num_partitions=min(num_buckets, max(len(counts), 1)))
            .map_groups(rank_bucket, batch_format="pyarrow"))


def group_string_agg(ds, *, key: str, order_cols: list[str], val_col: str,
                     sep: str, out_col: str = "agg",
                     num_partitions: int | None = None):
    """Per-``key`` ordered string aggregation — SQL's
    ``STRING_AGG(val, sep ORDER BY order_cols)`` — one row per key.

    Same hash-bucketed shape as the window family: one shuffle by a
    bucket of the key, then a per-bucket kernel that sorts once by
    (key, order) and joins each key's run (the join itself is
    inherently per-key string work; everything around it is
    vectorized). Contract: a single giant key produces a single giant
    string — the output row IS the concatenation, so per-key output
    size equals per-key input size (same straggler contract as any
    SQL STRING_AGG)."""
    import pandas as pd

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending")] + [(c, "ascending") for c in order_cols])
        df = pd.DataFrame({key: np.asarray(t[key]),
                           "v": np.asarray(t[val_col]).astype(object)})
        # dropna=False: SQL STRING_AGG ... GROUP BY keeps the NULL-key
        # group (key_bucketed already routes null keys to one bucket)
        agg = df.groupby(key, sort=True, dropna=False)["v"].agg(
            sep.join).reset_index()
        key_type = t.schema.field(key).type
        keys_out = [None if pd.isna(v) else v
                    for v in agg[key].to_numpy(dtype=object)]
        return pa.table({key: pa.array(keys_out, key_type),
                         out_col: pa.array(agg["v"].tolist(), pa.string())})

    return _key_bucketed(ds, key, num_partitions).map_groups(
        per_bucket, batch_format="pyarrow")


def funnel_counts(ds, *, key: str, ts_col: str, type_col: str,
                  steps: list[str], num_partitions: int | None = None):
    """Ordered funnel analysis: how many ``key`` entities performed
    ``steps[0]``, then ``steps[1]`` STRICTLY after it, then
    ``steps[2]`` strictly after that, … — each step anchored at the
    EARLIEST qualifying time (the standard product-analytics funnel:
    step_i time = min ts of type_i with ts > step_{i-1} time).

    One shuffle: rows bucket by a hash of the key (a key's events stay
    together), then a per-bucket vectorized pass computes each step's
    per-key anchor via INNER MERGES against the previous step's anchor
    table (int64 end-to-end: a ``map``/reindex would promote the
    anchor to float64 whenever any key missed the prior step and lose
    the strict ``ts > anchor`` comparison past 2^53 — epoch-ns scale)
    and emits a ≤len(steps)-row partial (step, users); a Sum-reduce
    produces the final counts. NULL keys count in step 1 (SQL GROUP BY
    keeps the null group) and can never advance past it (SQL equality
    joins never match NULL). Driver state is len(steps) scalars.
    Returns a Dataset (step int64 1-based, users int64)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def per_bucket(g: pa.Table) -> pa.Table:
        karr = g[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        # null-free batches stay int64; null-bearing ones take pandas'
        # nullable path so the null group survives step 1
        k = (karr.to_pandas() if karr.null_count
             else pd.Series(np.asarray(karr)))
        df = pd.DataFrame({
            "k": k.to_numpy() if karr.null_count else k,
            "ts": np.asarray(g[ts_col], dtype=np.int64),
            "ty": np.asarray(g[type_col]).astype(object),
        })
        reached = []
        prev = None  # per-key anchor Series, indexed by key
        for s in steps:
            rows = df[df["ty"] == s]
            if prev is None:
                cur = rows.groupby("k", dropna=False)["ts"].min()
            else:
                rows = rows[rows["k"].notna()]
                pf = prev.reset_index()
                pf.columns = ["k", "t0"]
                m = rows.merge(pf, on="k", how="inner")
                cur = m[m["ts"] > m["t0"]].groupby("k")["ts"].min()
            reached.append(len(cur))
            prev = cur
        return pa.table({
            "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
            "users": pa.array(reached, pa.int64()),
        })

    return (_key_bucketed(ds, key, num_partitions)
            .map_groups(per_bucket, batch_format="pyarrow")
            .groupby("step").aggregate(Sum("users", alias_name="users")))


def dense_rank(ds, *, order_col: str, rank_col: str = "dr",
               num_buckets: int = 32, sample_per_block: int = 64):
    """Distributed DENSE_RANK() OVER (ORDER BY ``order_col`` ASC):
    equal values share a rank and ranks have no gaps. For descending
    semantics, negate the column upstream.

    Same range-partitioned shape as :func:`global_row_number`, with the
    offsets derived from per-bucket DISTINCT-value counts instead of
    row counts. The counts pass is distinct-pruned per batch before
    its (tiny) shuffle — it moves at most the distinct-value domain,
    never row data; the one full shuffle is the rank pass. The input
    lineage executes once (materialized up front)."""
    base = ds.materialize()
    bounds = _range_bounds(base, order_col, num_buckets, sample_per_block)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(batch[order_col]))
        b = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return pa.table({"__rbucket": pa.array(b),
                         order_col: pa.array(v)})

    def count_distinct(g: pa.Table) -> pa.Table:
        return pa.table({
            "__rbucket": pa.array([int(g["__rbucket"][0].as_py())],
                                  pa.int32()),
            "nd": pa.array([len(np.unique(np.asarray(g[order_col])))],
                           pa.int64()),
        })

    counts = {int(r["__rbucket"]): int(r["nd"])
              for r in base.map_batches(distinct_partial,
                                        batch_format="pyarrow")
              .groupby("__rbucket").map_groups(count_distinct,
                                               batch_format="pyarrow")
              .take_all()}
    offsets = {}
    acc = 1
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["__rbucket"][0].as_py())
        v = np.asarray(g[order_col])
        uniq = np.unique(v)
        dr = offsets[b] + np.searchsorted(uniq, v)
        return g.drop_columns(["__rbucket"]).append_column(
            rank_col, pa.array(dr.astype(np.int64), pa.int64()))

    return (base.map_batches(_bucket_assigner(bounds, order_col),
                             batch_format="pyarrow")
            .groupby("__rbucket",
                     num_partitions=min(num_buckets, max(len(counts), 1)))
            .map_groups(rank_bucket, batch_format="pyarrow"))


def throttle(ds, *, keys: list[str], order_cols: list[str], ts_col: str,
             min_gap_us: int, num_partitions: int | None = None):
    """Time-based throttle (rate-limit dedup): drop a row if the
    PREVIOUS row of its key group (under ``order_cols``) is within
    ``min_gap_us`` — SQL ``LAG(ts) OVER (PARTITION BY keys ORDER BY
    ...)`` with ``d IS NULL OR d > min_gap_us``. Suppression is
    relative to the previous EVENT (not the previous kept event), so
    the predicate is windowless and exactly SQL-mirrorable; true
    debounce-to-last-kept is a sequential scan by design and
    deliberately not this operator.

    Same scale shape as the window family: one key-bucketed shuffle,
    key-sorted segment arithmetic per bucket."""
    from kafka_connect_mongo_ray.utils import key_bucketed

    def per_bucket(g: pa.Table) -> pa.Table:
        if "__gb" in g.column_names:
            g = g.drop_columns(["__gb"])
        t = g.sort_by([(c, "ascending") for c in keys]
                      + [(c, "ascending") for c in order_cols])
        ts = np.asarray(t[ts_col], dtype=np.int64)
        n = len(ts)
        if n == 0:
            return t
        same = np.ones(n - 1, dtype=bool)
        for c in keys:
            col = t[c].combine_chunks()
            valid = np.asarray(col.is_valid())
            k = np.asarray(col.to_pandas())
            eq = k[1:] == k[:-1]
            # SQL PARTITION BY groups NULLs into ONE partition: two
            # nulls are the same key (a raw numpy compare would make
            # every NULL row its own partition via NaN != NaN)
            same &= (eq & valid[1:] & valid[:-1]) \
                | (~valid[1:] & ~valid[:-1])
        delta = ts[1:] - ts[:-1]
        keep = np.ones(n, dtype=bool)
        keep[1:] = ~same | (delta > min_gap_us)
        return t.filter(pa.array(keep))

    return key_bucketed(ds, keys, num_partitions or 32).map_groups(
        per_bucket, batch_format="pyarrow")


def longest_streak(ds, *, key: str, day_col: str,
                   out_col: str = "streak_days",
                   num_partitions: int | None = None):
    """Longest run of CONSECUTIVE integer days per ``key`` — the
    gaps-and-islands pattern (``day − ROW_NUMBER() OVER (PARTITION BY
    key ORDER BY day)`` is constant within an island; the answer is
    the longest island). Input rows are (key, day) with ``day_col``
    integer (e.g. epoch days); duplicate (key, day) pairs are deduped
    in-group, mirroring SQL's ``SELECT DISTINCT`` head.

    One keys-only exchange (the window family's hash-bucketed
    map_groups), loop-free in-group kernel: sort, pairwise dedup,
    island id via position-within-key subtraction, run lengths from
    boundary diffs, per-key max via ``np.maximum.reduceat``. Output is
    one row per key — dimension-sized."""

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending"), (day_col, "ascending")])
        k = np.asarray(t[key])
        d = np.asarray(t[day_col], dtype=np.int64)
        if len(k) == 0:
            return pa.table({key: t[key],
                             out_col: pa.array([], pa.int64())})
        # dedup consecutive (key, day) duplicates
        keep = np.ones(len(k), dtype=bool)
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        first, _, _ = _segments(k)
        # position within key: 0,1,2,... per segment
        pos = np.arange(len(k)) - np.repeat(np.flatnonzero(first),
                                            np.diff(np.append(
                                                np.flatnonzero(first),
                                                len(k))))
        island = d - pos
        run_start = np.ones(len(k), dtype=bool)
        run_start[1:] = first[1:] | (island[1:] != island[:-1])
        starts = np.flatnonzero(run_start)
        run_len = np.diff(np.append(starts, len(k)))
        run_key_first = first[starts]  # run starts a new key?
        key_starts = np.flatnonzero(run_key_first)
        best = np.maximum.reduceat(run_len, key_starts)
        return pa.table({key: pa.array(k[starts][key_starts]),
                         out_col: pa.array(best, pa.int64())})

    from kafka_connect_mongo_ray.utils import key_bucketed

    return key_bucketed(ds, [key], num_partitions or 32).map_groups(
        per_bucket, batch_format="pyarrow")


def validity_intervals(ds, *, key_cols: list[str], order_cols: list[str],
                       ts_col: str, op_col: str, delete_op: str = "d",
                       from_col: str = "valid_from", to_col: str = "valid_to",
                       current_col: str = "is_current",
                       num_partitions: int | None = None):
    """SCD Type-2 dimension history from a change stream: every upsert
    opens a validity interval ``[ts, next_change_ts)`` for its key, the
    key's next event (upsert OR tombstone) closes it, and the last
    un-closed interval is the current row (``valid_to`` NULL) — the
    lake-side history table a CDC consumer materializes instead of the
    LWW head (``LEAD(ts) OVER (PARTITION BY key ORDER BY ...)`` with
    tombstones consuming, not emitting, a row).

    Same one-exchange shape as the rest of the window family: hash
    bucket of ``key_cols``, per-bucket sort, loop-free boundary
    arithmetic. Tombstone rows close the preceding interval and emit
    nothing; a key whose only events are tombstones emits nothing.
    ``ts_col`` must be integer (the change-log position); ``op_col``
    is compared against ``delete_op`` as a string."""
    from kafka_connect_mongo_ray.utils import key_bucketed

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(c, "ascending") for c in key_cols]
            + [(c, "ascending") for c in order_cols])
        n = t.num_rows
        if n == 0:
            empty = t.append_column(from_col, pa.array([], pa.int64()))
            empty = empty.append_column(to_col, pa.array([], pa.int64()))
            return empty.append_column(current_col, pa.array([], pa.bool_()))
        ks = [np.asarray(t[c]) for c in key_cols]
        same_key = np.ones(n - 1, dtype=bool)
        for k in ks:
            same_key &= k[1:] == k[:-1]
        ts = np.asarray(t[ts_col], dtype=np.int64)
        lead = np.empty(n, dtype=np.int64)
        lead[:-1] = ts[1:]
        lead[-1] = 0
        open_end = np.ones(n, dtype=bool)  # True ⇒ valid_to NULL
        open_end[:-1] = ~same_key
        out = t.append_column(from_col, pa.array(ts, pa.int64()))
        out = out.append_column(
            to_col, pa.array(np.where(open_end, 0, lead), pa.int64(),
                             mask=open_end))
        out = out.append_column(current_col,
                                pa.array(open_end, pa.bool_()))
        keep = np.asarray(t[op_col]).astype(object) != delete_op
        return out.filter(pa.array(keep, pa.bool_()))

    return key_bucketed(ds, key_cols, num_partitions or 32).map_groups(
        per_bucket, batch_format="pyarrow")


def time_weighted_avg(ds, *, key: str, order_cols: list[str], ts_col: str,
                      val_col: str, out_col: str = "twa",
                      num_partitions: int | None = None):
    """Per-``key`` TIME-weighted mean of an integer-valued series: each
    observation is held until the key's next observation, so the mean
    weights each value by its holding duration — the standard metric
    for irregularly-sampled gauges (price, queue depth, balance). The
    last observation per key has no duration and contributes nothing;
    keys with a single observation (or zero total duration) emit no
    row, mirroring SQL's ``WHERE dur IS NOT NULL ... HAVING SUM(dur)
    > 0``.

    ``val_col`` and ``ts_col`` must be integer columns (e.g. cents and
    epoch µs): numerator and denominator are EXACT int64 sums
    (``Σ vᵢ·(tᵢ₊₁−tᵢ)`` via one ``np.add.reduceat`` over the
    key-sorted products) and the single float op is the final
    division, so the SQL mirror is bit-exact. Caller owns the int64
    bound: ``max|v| · key_time_span`` per key must stay inside int64
    (cents ≤ 10⁵ over a 30-year µs span holds with 3 decades of
    headroom). One keys-only hash-bucket exchange, one row per key."""
    from kafka_connect_mongo_ray.utils import key_bucketed

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(key, "ascending")] + [(c, "ascending") for c in order_cols])
        k = np.asarray(t[key])
        n = len(k)
        if n == 0:
            return pa.table({key: t[key],
                             out_col: pa.array([], pa.float64())})
        ts = np.asarray(t[ts_col], dtype=np.int64)
        v = np.asarray(t[val_col], dtype=np.int64)
        first, _, _ = _segments(k)
        dur = np.zeros(n, dtype=np.int64)
        dur[:-1] = ts[1:] - ts[:-1]
        # the last row of each key holds to "now" = excluded (dur 0)
        last = np.empty(n, dtype=bool)
        last[:-1] = first[1:]
        last[-1] = True
        dur[last] = 0
        starts = np.flatnonzero(first)
        num = np.add.reduceat(v * dur, starts)
        den = np.add.reduceat(dur, starts)
        keep = den > 0
        twa = num[keep].astype(np.float64) / den[keep].astype(np.float64)
        return pa.table({key: pa.array(k[starts][keep]),
                         out_col: pa.array(twa, pa.float64())})

    return key_bucketed(ds, [key], num_partitions or 32).map_groups(
        per_bucket, batch_format="pyarrow")
