"""Distributed quantiles and deterministic sampling.

Reference analog: none (the reference has no aggregates at all —
SURVEY.md §2.5) — these are the training-data-pipeline additions a
100-TB corpus needs: exact percentiles of a bounded-granularity metric
without a global sort, and a reproducible sample whose membership is a
pure function of the row key (so every re-run, every engine, and every
debugging session sees the same rows).

Scale shapes:
- ``exact_quantiles``: per-batch value→count compaction (rows collapse
  to DISTINCT scaled values immediately), one small groupby-sum whose
  volume is bounded by the value domain's granularity — never by row
  count — and a driver-side cumulative pick over that bounded table.
  No sort, no all-to-all of row data.
- ``sample_by_md5``: embarrassingly parallel filter; membership =
  md5(key) hex prefix < threshold, portable across engines (mirrored
  1:1 in SQL by DuckDB's md5()).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import limit_worker_threads


def quantile_disc_index(q: float, n: int) -> int:
    """DuckDB ``quantile_disc`` element index (0-based, ascending):
    ``max(0, ceil(q*n) - 1)`` — probed against DuckDB 1.x and mirrored
    here so engine and oracle pick identical elements."""
    return max(0, math.ceil(q * n) - 1)


def exact_quantiles(ds, col: str, qs: list[float], *, scale: int = 100):
    """EXACT discrete quantiles of ``round(col * scale)`` as int64.

    Returns a pyarrow Table ``(q, value_scaled)`` — one row per
    requested quantile. The count table shipped to the driver has one
    row per DISTINCT scaled value (value-domain-bounded; for a metric
    with 2 decimal digits of granularity that is ~100×range rows no
    matter how many billions of input rows)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        v = np.asarray(batch[col], dtype=np.float64)
        s = np.rint(v * scale).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("v").aggregate(Sum("c", alias_name="c"))
              .to_pandas().sort_values("v"))
    n = int(counts["c"].sum())
    cum = counts["c"].cumsum().to_numpy()
    vals = counts["v"].to_numpy()
    picked = [int(vals[int(np.searchsorted(cum, quantile_disc_index(q, n) + 1))])
              for q in qs]
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value_scaled": pa.array(picked, pa.int64())})


def exact_quantiles_cont(ds, col: str, qs: list[float], *,
                         scale: int = 100, round_to: int = 9):
    """EXACT interpolated quantiles (SQL ``quantile_cont`` /
    PERCENTILE_CONT) of ``round(col · scale)``: the two straddling
    order statistics at ``h = q·(n−1)`` come from the same
    value→count compaction as :func:`exact_quantiles` (driver state is
    value-domain-bounded, never row-count-bounded), and the one float
    operation is linear interpolation in DuckDB's OWN operand order
    ``v_lo·(1−d) + v_hi·d`` (d = h − ⌊h⌋) — the convex-combination
    form, NOT ``v_lo + d·(v_hi − v_lo)``: the two differ in the last
    ULP (observed at q=0.99 on sf0.001 lineitem, where round-to-9dp
    cannot mask it because ULP(1e7) ≈ 1.9e−9 > 1e−9), so matching
    DuckDB bit-for-bit requires matching its operand order. Returns
    (q, value_cont)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        v = np.asarray(batch[col], dtype=np.float64)
        s = np.rint(v * scale).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("v").aggregate(Sum("c", alias_name="c"))
              .to_pandas().sort_values("v"))
    n = int(counts["c"].sum())
    cum = counts["c"].cumsum().to_numpy()
    vals = counts["v"].to_numpy().astype(np.float64)

    def order_stat(i: int) -> float:
        return float(vals[int(np.searchsorted(cum, i + 1))])

    out = []
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        hi = int(np.ceil(h))
        v_lo = order_stat(lo)
        v_hi = v_lo if hi == lo else order_stat(hi)
        d = h - lo
        out.append(round(v_lo * (1.0 - d) + v_hi * d, round_to))
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value_cont": pa.array(out, pa.float64())})


def _grouped_value_counts(ds, group_col: str, col: str, *, scale: int,
                          num_partitions: int | None,
                          drop_null_groups: bool = False):
    """The shared per-group value→count histogram: batch-local
    compaction to DISTINCT (group, scaled value) pairs, then ONE
    groupby-sum whose volume is bounded by groups × distinct scaled
    values, never by row count. Every grouped order-statistic operator
    (quantiles, MAD, winsorize) builds on this one exchange.

    ``drop_null_groups=True`` excludes NULL-group rows up front — the
    SQL equi-join semantics the join-mirrored consumers (MAD,
    winsorize, band filter) need; the default keeps NULL groups as
    their own group (SQL GROUP BY semantics)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd

        if drop_null_groups:
            batch = batch.filter(pc.is_valid(batch[group_col]))
        v = np.asarray(batch[col], dtype=np.float64)
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "v": np.rint(v * scale).astype(np.int64)})
        g = df.groupby([group_col, "v"], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([group_col, "v"], **kwargs)
            .aggregate(Sum("c", alias_name="c")))


def _sorted_hist(t: pa.Table):
    """(vals ascending, counts) int64 arrays from one group's
    histogram table."""
    order = pc.sort_indices(t, sort_keys=[("v", "ascending")])
    t = t.take(order)
    return (t, np.asarray(t["v"], dtype=np.int64),
            np.asarray(t["c"], dtype=np.int64))


def _disc_pick(vals: np.ndarray, cum: np.ndarray, q: float) -> int:
    """quantile_disc pick from a sorted histogram (duplicate values in
    ``vals`` are fine — searchsorted lands inside the run at the
    correct value)."""
    n = int(cum[-1])
    return int(vals[int(np.searchsorted(cum, quantile_disc_index(q, n) + 1))])


def grouped_exact_quantiles(ds, group_col: str, col: str, qs: list[float],
                            *, scale: int = 100,
                            num_partitions: int | None = None,
                            drop_null_groups: bool = False):
    """EXACT per-group discrete quantiles of ``round(col * scale)`` —
    quantile_disc(...) GROUP BY ``group_col``, fully distributed.

    Same value→count compaction as :func:`exact_quantiles`, but the
    cumulative pick runs INSIDE a per-group ``map_groups`` instead of
    on the driver: the one shuffle moves (group, value, count) rows —
    bounded by groups × distinct scaled values, never by row count —
    and nothing is materialized driver-side. NULL-group rows keep
    their own quantile row (SQL GROUP BY semantics) unless
    ``drop_null_groups=True`` (an optimization for consumers that
    discard the null band anyway). Returns a Dataset
    ``(group_col, q, value_scaled)``."""
    counts = _grouped_value_counts(ds, group_col, col, scale=scale,
                                   num_partitions=num_partitions,
                                   drop_null_groups=drop_null_groups)

    def pick(g: pa.Table) -> pa.Table:
        t, vals, c = _sorted_hist(g)
        cum = np.cumsum(c)
        picked = [_disc_pick(vals, cum, q) for q in qs]
        return pa.table({
            group_col: pa.array([t[group_col][0].as_py()] * len(qs),
                                t.schema.field(group_col).type),
            "q": pa.array([float(q) for q in qs], pa.float64()),
            "value_scaled": pa.array(picked, pa.int64()),
        })

    return counts.groupby(group_col).map_groups(pick, batch_format="pyarrow")


def grouped_quantiles_2pass(ds, group_col: str, col: str, qs: list[float],
                            *, scale: int = 100, coarse_bin: int = 1024,
                            num_partitions: int | None = None,
                            drop_null_groups: bool = False,
                            value_fn=None):
    """EXACT per-group discrete quantiles via coarse-then-refine — the
    scale path for NEAR-CONTINUOUS columns, where the one-pass
    :func:`grouped_exact_quantiles` histogram has ~one distinct value
    per row and its "compacted" exchange is row-sized.

    Pass 1 exchanges the histogram of ``v // coarse_bin`` (volume cut
    ~coarse_bin×), and per group derives each quantile's WINNING coarse
    bin plus the exact 0-based rank offset inside it — a groups × qs
    table collected to the driver and shipped in the refine task spec.
    Pass 2 re-scans the fact table keeping ONLY rows in winning
    (group, bin) pairs (≈ rows/coarse_bin per quantile), builds exact
    per-(group, bin) value histograms, and picks the value at the
    offset. Identical result to the one-pass operator (same
    ``quantile_disc`` semantics, bit-exact), traded as: two fact
    scans + two small exchanges instead of one fact scan + one
    row-sized exchange — the right trade whenever the exchange, not
    the scan, is the bound (NEXT.md #3; lineitem price columns at
    sf0.1 measured exchange-bound).

    ``ds`` is deliberately NOT materialized: at 100 TB the second
    lineage execution (a pruned re-read) is cheaper than caching the
    fact table in the object store. ``value_fn`` (batch → int64 array,
    applied AFTER the null-group filter) replaces the default
    ``rint(col·scale)`` scaling — the hook :func:`grouped_mad_2pass`
    uses for its |v − med| pass. Returns
    ``(group_col, q, value_scaled)``."""
    from ray.data.aggregate import Sum

    def coarse_partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd

        if drop_null_groups:
            batch = batch.filter(pc.is_valid(batch[group_col]))
        v = (value_fn(batch) if value_fn is not None else
             np.rint(np.asarray(batch[col], dtype=np.float64)
                     * scale).astype(np.int64))
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "b": v // coarse_bin})
        g = df.groupby([group_col, "b"], as_index=False,
                       dropna=False).size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    coarse = (ds.map_batches(coarse_partial, batch_format="pyarrow")
              .groupby([group_col, "b"], **kwargs)
              .aggregate(Sum("c", alias_name="c")))

    def pick_bins(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("b", "ascending")])
        g = g.take(order)
        bins = np.asarray(g["b"], dtype=np.int64)
        cum = np.cumsum(np.asarray(g["c"], dtype=np.int64))
        n = int(cum[-1])
        out_q, out_b, out_off = [], [], []
        for q in qs:
            idx = quantile_disc_index(q, n)  # 0-based global rank
            j = int(np.searchsorted(cum, idx + 1))
            below = int(cum[j - 1]) if j > 0 else 0
            out_q.append(float(q))
            out_b.append(int(bins[j]))
            out_off.append(idx - below)  # 0-based rank inside the bin
        return pa.table({
            group_col: pa.array([g[group_col][0].as_py()] * len(qs),
                                g.schema.field(group_col).type),
            "q": pa.array(out_q, pa.float64()),
            "b": pa.array(out_b, pa.int64()),
            "off": pa.array(out_off, pa.int64()),
        })

    targets = (coarse.groupby(group_col)
               .map_groups(pick_bins, batch_format="pyarrow").to_pandas())

    def _k(g):
        # normalize a group value for dict keys: pandas NaN / Arrow
        # None both land on None so the two sides always agree
        return None if (g is None or (isinstance(g, float)
                                      and np.isnan(g))) else g

    # groups × qs rows — closure-sized; (group, bin) -> [(q, off), ...]
    want: dict = {}
    for r in targets.itertuples():
        want.setdefault((_k(getattr(r, group_col)), int(r.b)),
                        []).append((float(r.q), int(r.off)))
    winners = targets[[group_col, "b"]].drop_duplicates()

    def refine_partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd

        if drop_null_groups:
            batch = batch.filter(pc.is_valid(batch[group_col]))
        v = (value_fn(batch) if value_fn is not None else
             np.rint(np.asarray(batch[col], dtype=np.float64)
                     * scale).astype(np.int64))
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "b": v // coarse_bin, "v": v})
        # vectorized winning-(group, bin) filter; pandas merge matches
        # NaN==NaN on keys, which here is exactly GROUP BY null
        # semantics (null groups keep their quantile rows)
        df = df.merge(winners, on=[group_col, "b"], how="inner")
        g = df.groupby([group_col, "b", "v"], as_index=False,
                       dropna=False).size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (ds.map_batches(refine_partial, batch_format="pyarrow")
            .groupby([group_col, "b", "v"], **kwargs)
            .aggregate(Sum("c", alias_name="c")))

    def pick_value(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("v", "ascending")])
        g = g.take(order)
        key = (_k(g[group_col][0].as_py()), int(g["b"][0].as_py()))
        vals = np.asarray(g["v"], dtype=np.int64)
        cum = np.cumsum(np.asarray(g["c"], dtype=np.int64))
        pairs = want.get(key, [])
        picked = [int(vals[int(np.searchsorted(cum, off + 1))])
                  for _, off in pairs]
        return pa.table({
            group_col: pa.array([key[0]] * len(pairs),
                                g.schema.field(group_col).type),
            "q": pa.array([q for q, _ in pairs], pa.float64()),
            "value_scaled": pa.array(picked, pa.int64()),
        })

    return fine.groupby([group_col, "b"]).map_groups(
        pick_value, batch_format="pyarrow")


def grouped_mad_2pass(ds, group_col: str, col: str, *, scale: int = 100,
                      coarse_bin: int = 1024,
                      num_partitions: int | None = None):
    """:func:`grouped_mad` on the coarse-then-refine plan — for
    near-continuous columns where the one-pass histogram exchange is
    row-sized. Two :func:`grouped_quantiles_2pass` rounds (med of v,
    then med of |v − med|), four pruned fact scans, every exchange
    coarse-bin-bounded. Identical contract and bit-identical output to
    :func:`grouped_mad` (NULL groups excluded — equi-join mirror); the
    med table is collected to the driver and shipped in the deviation
    pass's task spec, so group cardinality must be broadcast-sized
    (the same constraint every med-consuming caller already has).
    Returns ``(group_col, med_scaled, mad_scaled)``.

    Measured crossover: at sf0.1 the four scans' fixed costs make this
    a WASH against the one-pass operator (11.6–12.5 s vs 9.8–12.3 s,
    identical output) — use :func:`grouped_mad` until the histogram
    exchange, not the scan, is the bound (row-sized compaction on a
    near-continuous column at ≥10× this scale)."""
    import pandas as pd
    import ray.data as rd

    med = grouped_quantiles_2pass(
        ds, group_col, col, [0.5], scale=scale, coarse_bin=coarse_bin,
        num_partitions=num_partitions, drop_null_groups=True).to_pandas()
    med_map = dict(zip(med[group_col], med.value_scaled))

    def d_fn(batch: pa.Table) -> np.ndarray:
        import pandas as pd

        v = np.rint(np.asarray(batch[col], dtype=np.float64)
                    * scale).astype(np.int64)
        g = batch[group_col].to_pandas()
        return np.abs(v - g.map(med_map).to_numpy(dtype=np.int64))

    mad = grouped_quantiles_2pass(
        ds, group_col, col, [0.5], scale=scale, coarse_bin=coarse_bin,
        num_partitions=num_partitions, drop_null_groups=True,
        value_fn=d_fn).to_pandas()
    out = med.merge(mad, on=group_col, suffixes=("_med", "_mad"))
    return rd.from_arrow(pa.table({
        group_col: pa.array(out[group_col]),
        "med_scaled": pa.array(out["value_scaled_med"].to_numpy(np.int64),
                               pa.int64()),
        "mad_scaled": pa.array(out["value_scaled_mad"].to_numpy(np.int64),
                               pa.int64()),
    }))


def md5_hex(value) -> str:
    return hashlib.md5(str(value).encode()).hexdigest()


def sample_by_md5(ds, id_col: str, *, threshold_hex: str = "33333333"):
    """Deterministic ~(threshold/16^len) sample: keep rows whose
    ``md5(str(id))`` hex prefix is lexicographically below
    ``threshold_hex`` (default "33333333" ≈ 20%). Membership is a pure
    function of the key — stable across runs, partitionings, and
    engines (DuckDB: ``md5(CAST(id AS VARCHAR)) < '<threshold>'`` with
    the same prefix comparison)."""
    k = len(threshold_hex)

    def keep(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        ids = batch[id_col].to_pylist()
        mask = pa.array([md5_hex(i)[:k] < threshold_hex for i in ids])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_by_md5(ds, id_col: str, group_col: str, *,
                             thresholds: dict, default_hex: str = "00000000"):
    """Per-group deterministic sampling — the "balance the corpus by
    language" primitive: a row is kept iff ``md5(str(id))``'s hex
    prefix is below its GROUP's threshold (groups absent from
    ``thresholds`` get ``default_hex``; "00000000" drops them).

    Embarrassingly parallel: the per-group threshold table is
    dimension-sized by definition and travels inside the task closure;
    membership stays a pure function of (key, group) — identical across
    runs, partitionings, and engines (mirror in SQL with a CASE over
    the same prefix comparison). All thresholds must share one prefix
    length."""
    lens = {len(h) for h in thresholds.values()} | {len(default_hex)}
    if len(lens) != 1:
        raise ValueError("all thresholds must have the same hex length")
    k = lens.pop()

    def keep(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        ids = batch[id_col].to_pylist()
        groups = batch[group_col].to_pylist()
        mask = pa.array([
            md5_hex(i)[:k] < thresholds.get(g, default_hex)
            for i, g in zip(ids, groups)
        ])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")



def _equi_depth_summary(values: "np.ndarray", weights: "np.ndarray",
                        cap: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Evenly-spaced weighted order statistics: compress a sorted
    (value, weight) run to ≤ ``cap`` picks, each carrying total_weight
    / k — the rank error this step adds is ≤ total_weight / k."""
    order = np.argsort(values, kind="mergesort")
    v = values[order]
    w = weights[order]
    total = float(w.sum())
    k = int(min(cap, len(v)))
    if k == 0:
        return v, w
    targets = (np.arange(k) + 0.5) * (total / k)
    cum = np.cumsum(w)
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx], np.full(k, total / k, np.float64)


def approx_quantiles(ds, col: str, qs: list[float], *,
                     per_block_cap: int = 256, fanin: int = 16):
    """Approximate quantiles of a CONTINUOUS / unbounded value domain
    with bounded memory everywhere — the scale path where
    :func:`exact_quantiles`'s value→count compaction does not apply
    (its shuffle volume is bounded by the DISTINCT-value domain, which
    for raw doubles is the row count).

    Mergeable equi-depth summaries, two levels:

    1. each block sorts locally and keeps ``per_block_cap``
       evenly-spaced order statistics, each weighted n/k
       (rank error ≤ n_block / cap, summing to ≤ N / cap);
    2. summaries repartition to ``fanin`` blocks and re-compress the
       same way (adds ≤ N / cap more), so the driver sees at most
       ``fanin × per_block_cap`` (value, weight) pairs no matter how
       many rows or blocks the input has.

    Total rank error ≤ 2N / per_block_cap (≈0.8% at the default 256).
    Deterministic for a given block partitioning (no RNG). Returns
    ``{q: estimate}``."""
    import pyarrow as _pa

    def block_summary(batch: _pa.Table) -> _pa.Table:
        c = batch[col]
        if isinstance(c, _pa.ChunkedArray):
            c = c.combine_chunks()
        vals = np.asarray(c.drop_null(), dtype=np.float64)
        v, w = _equi_depth_summary(vals, np.ones(len(vals), np.float64),
                                   per_block_cap)
        return _pa.table({"v": _pa.array(v, _pa.float64()),
                          "w": _pa.array(w, _pa.float64())})

    def merge_summary(batch: _pa.Table) -> _pa.Table:
        v, w = _equi_depth_summary(np.asarray(batch["v"], dtype=np.float64),
                                   np.asarray(batch["w"], dtype=np.float64),
                                   per_block_cap)
        return _pa.table({"v": _pa.array(v, _pa.float64()),
                          "w": _pa.array(w, _pa.float64())})

    rows = (ds.map_batches(block_summary, batch_format="pyarrow",
                           batch_size=None)
            .repartition(fanin)
            .map_batches(merge_summary, batch_format="pyarrow",
                         batch_size=None)
            .take_all())
    v = np.array([r["v"] for r in rows], np.float64)
    w = np.array([r["w"] for r in rows], np.float64)
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1] if len(cum) else 0.0
    out = {}
    for q in qs:
        if not len(v):
            out[q] = float("nan")
            continue
        i = int(np.searchsorted(cum, q * total, side="left"))
        out[q] = float(v[min(i, len(v) - 1)])
    return out


def exact_ranks(ds, col: str, cutpoints: list[float]):
    """Exact global rank (COUNT of rows ≤ cutpoint) for each cutpoint
    in ONE pass: each batch emits a len(cutpoints) searchsorted
    partial, Sum-reduced — only cutpoint-sized partials move."""
    import pyarrow as _pa
    from ray.data.aggregate import Sum

    cuts = np.asarray(cutpoints, np.float64)

    def partial(batch: _pa.Table) -> _pa.Table:
        c = batch[col]
        if isinstance(c, _pa.ChunkedArray):
            c = c.combine_chunks()
        vals = np.sort(np.asarray(c.drop_null(), dtype=np.float64))
        n = np.searchsorted(vals, cuts, side="right")
        return _pa.table({"i": _pa.array(np.arange(len(cuts)), _pa.int64()),
                          "le": _pa.array(n.astype(np.int64), _pa.int64()),
                          "n": _pa.array(np.full(len(cuts), len(vals),
                                                 np.int64), _pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("i").aggregate(Sum("le", alias_name="le"),
                                   Sum("n", alias_name="n"))
           .take_all())
    by_i = {int(r["i"]): (int(r["le"]), int(r["n"])) for r in agg}
    # empty input produces no partials at all: every rank is 0
    ranks = [by_i.get(i, (0, 0))[0] for i in range(len(cuts))]
    total = by_i[0][1] if by_i else 0
    return ranks, total


def _group_value_map(bounds_pdf, group_col: str, q: float) -> dict:
    sel = bounds_pdf[bounds_pdf["q"] == q]
    return dict(zip(sel[group_col], sel["value_scaled"]))


def quantile_band_filter(ds, group_col: str, col: str, *, lo_q: float,
                         hi_q: float, scale: int = 1,
                         num_partitions: int | None = None):
    """Keep rows whose ``round(col*scale)`` lies inside the row's
    group's ``[quantile_disc(lo_q), quantile_disc(hi_q)]`` band — the
    per-source length-trim shape of corpus curation (drop each source's
    outlier-short and outlier-long documents rather than applying one
    global threshold to heterogeneous sources).

    Two passes over a column-pruned read: the grouped exact-quantile
    pass (shuffle volume bounded by groups × distinct scaled values),
    whose group-domain-sized result lands on the driver and broadcasts
    into the filter pass as a plain closure dict. Assumes the group
    domain is dimension-sized (sources, languages, shards — not keys).
    NULL-group rows are DROPPED (the SQL mirror joins the bounds table
    back with an equi-join, which never matches NULL keys). Returns
    ``ds`` filtered, original columns/order preserved."""
    # drop_null_groups: the keep pass excludes NULL-group rows, so
    # computing the null band's bounds would be wasted exchange volume
    bounds = grouped_exact_quantiles(
        ds.select_columns([group_col, col]), group_col, col,
        [lo_q, hi_q], scale=scale, num_partitions=num_partitions,
        drop_null_groups=True).to_pandas()
    lo = _group_value_map(bounds, group_col, lo_q)
    hi = _group_value_map(bounds, group_col, hi_q)

    def keep(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd

        batch = batch.filter(pc.is_valid(batch[group_col]))
        v = np.rint(np.asarray(batch[col], dtype=np.float64)
                    * scale).astype(np.int64)
        g = batch[group_col].to_pandas()
        lo_a = g.map(lo).to_numpy(dtype=np.int64)
        hi_a = g.map(hi).to_numpy(dtype=np.int64)
        return batch.filter(pa.array((v >= lo_a) & (v <= hi_a)))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_mad(ds, group_col: str, col: str, *, scale: int = 100,
                num_partitions: int | None = None):
    """Per-group median absolute deviation (robust spread) of
    ``round(col*scale)`` — both medians are EXACT quantile_disc picks,
    so the result is integer-exact and SQL-mirrorable:

        med = quantile_disc(x, 0.5) GROUP BY g
        mad = quantile_disc(abs(x - med), 0.5) GROUP BY g

    Returns a Dataset ``(group_col, med_scaled, mad_scaled)``.

    ONE pass over the fact table: both medians are order statistics of
    the same per-group value→count histogram (|v - med| is a
    reweighting of the histogram, not of the rows), so the med AND the
    mad come out of a single per-group pick over the one compacted
    exchange — bounded by groups × distinct scaled values, never rows.
    NULL-group rows are EXCLUDED (the SQL mirror joins the median
    table back with an equi-join, which never matches NULL keys)."""
    counts = _grouped_value_counts(ds, group_col, col, scale=scale,
                                   num_partitions=num_partitions,
                                   drop_null_groups=True)

    def pick(t: pa.Table) -> pa.Table:
        t, vals, c = _sorted_hist(t)
        med = _disc_pick(vals, np.cumsum(c), 0.5)
        d = np.abs(vals - med)
        d_order = np.argsort(d, kind="stable")
        mad = _disc_pick(d[d_order], np.cumsum(c[d_order]), 0.5)
        return pa.table({
            group_col: pa.array([t[group_col][0].as_py()],
                                t.schema.field(group_col).type),
            "med_scaled": pa.array([med], pa.int64()),
            "mad_scaled": pa.array([mad], pa.int64()),
        })

    return counts.groupby(group_col).map_groups(pick,
                                                batch_format="pyarrow")


def winsorized_sum(ds, group_col: str, col: str, *, lo_q: float = 0.05,
                   hi_q: float = 0.95, scale: int = 100,
                   num_partitions: int | None = None):
    """Per-group winsorized sum: clamp ``round(col*scale)`` into the
    group's exact ``[quantile_disc(lo_q), quantile_disc(hi_q)]`` band
    (outliers saturate instead of dropping — the robust-aggregation
    complement of :func:`quantile_band_filter`), then COUNT and SUM.

    Returns a Dataset ``(group_col, n, winsorized)``; integer-exact.

    ONE pass: bounds and the clamped sum are both functions of the
    per-group value→count histogram (Σ c·clip(v, lo, hi)), so a single
    compacted exchange feeds a single per-group pick — no second scan
    of the fact table. NULL-group rows are EXCLUDED (equi-join
    semantics, matching the SQL mirror)."""
    counts = _grouped_value_counts(ds, group_col, col, scale=scale,
                                   num_partitions=num_partitions,
                                   drop_null_groups=True)

    def pick(t: pa.Table) -> pa.Table:
        t, vals, c = _sorted_hist(t)
        cum = np.cumsum(c)
        lo = _disc_pick(vals, cum, lo_q)
        hi = _disc_pick(vals, cum, hi_q)
        return pa.table({
            group_col: pa.array([t[group_col][0].as_py()],
                                t.schema.field(group_col).type),
            "n": pa.array([int(cum[-1])], pa.int64()),
            "winsorized": pa.array([int(np.dot(np.clip(vals, lo, hi), c))],
                                   pa.int64()),
        })

    return counts.groupby(group_col).map_groups(pick,
                                                batch_format="pyarrow")


def balanced_sample_by_md5(ds, id_col: str, group_col: str, *, k: int = 0,
                           quotas: dict | None = None,
                           num_partitions: int | None = None):
    """Per-group FIXED-SIZE deterministic sample: exactly min(k, group
    size) rows per group, chosen by ascending md5(str(id)) — SQL's
    ``QUALIFY ROW_NUMBER() OVER (PARTITION BY group ORDER BY md5(id),
    id) <= k``. The balanced-dataset construction primitive
    (:func:`stratified_sample_by_md5` keeps a FRACTION; this keeps a
    COUNT). Pass ``quotas`` (group value → count; missing groups get
    0) for a DIFFERENT count per group — the corpus-mixture shape; the
    dict is group-domain-bounded, a closure broadcast.

    Scale shape: selection by md5-priority is associative, so each
    batch first reduces locally to its own per-group top-k (≤ groups ×
    k rows leave every block) and ONE group-bucketed exchange merges
    with the same kernel — the group's full row set never gathers."""
    import pandas as pd

    from kafka_connect_mongo_ray.utils import key_bucketed

    def topk_per_group(t: pa.Table) -> pa.Table:
        limit_worker_threads()
        if "__gb" in t.column_names:
            t = t.drop_columns(["__gb"])
        if "__md5" not in t.column_names:
            ids = t[id_col].to_pylist()
            t = t.append_column(
                "__md5", pa.array([md5_hex(i) for i in ids], pa.string()))
        df = pd.DataFrame({
            "g": np.asarray(t[group_col]).astype(object),
            "h": np.asarray(t["__md5"]).astype(object),
            "i": np.arange(t.num_rows)})
        df = df.sort_values(["g", "h", "i"], kind="mergesort")
        if quotas is None:
            keep = df.groupby("g", dropna=False).cumcount() < k
        else:
            kvec = df["g"].map(lambda g_: int(quotas.get(g_, 0)))
            keep = df.groupby("g", dropna=False).cumcount() < kvec
        keep_idx = df[keep]["i"]
        return t.take(pa.array(np.sort(keep_idx.to_numpy()), pa.int64()))

    cand = ds.map_batches(topk_per_group, batch_format="pyarrow")
    merged = key_bucketed(cand, [group_col],
                          num_partitions or 32).map_groups(
        topk_per_group, batch_format="pyarrow")
    return merged.map_batches(lambda t: t.drop_columns(["__md5"]),
                              batch_format="pyarrow")
