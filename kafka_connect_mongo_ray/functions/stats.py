"""Distributed statistics: exact correlation / regression components,
recall-complete frequent-item (heavy-hitter) mining, grouped argmax,
and fixed-width histograms.

Reference analog: none (the reference has no aggregates at all —
SURVEY.md §2.5); these are the corpus-analytics primitives a
training-data pipeline needs at 100 TB. All are single-pass shapes
whose driver state is scalars, never data-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["corr_components", "frequent_items", "group_argmax",
           "linreg_components", "fixed_width_histogram",
           "group_count_distinct", "group_zscore_outliers",
           "grouped_corr", "grouped_skew_kurt", "grouped_entropy",
           "welch_t_components", "grouped_linreg"]


def corr_components(ds, x_col: str, y_col: str, *, x_scale: int = 1,
                    y_scale: int = 1, round_to: int = 9) -> pa.Table:
    """Pearson correlation from EXACT integer moment sums.

    Each batch reduces to six int64 partials (n, Σx, Σy, Σxy, Σx², Σy²)
    over ``round(col·scale)`` — the same integer-scaling trick as
    ``exact_quantiles``, so the moments are bit-exact under ANY
    partitioning and the only float operation is the final closed-form
    correlation, reproducible in SQL from the same integers::

        (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx²̂) · sqrt(n·Σy² − Σy²̂))

    Pick scales so ``max|x·scale| · max|y·scale| · rows`` stays inside
    int64 — the caller owns that bound (an overflow raises, never
    wraps: numpy sums are checked against the float approximation).
    Returns one row: the six components plus ``corr`` rounded to
    ``round_to``."""
    row = _moment_sums(ds, x_col, y_col, x_scale=x_scale, y_scale=y_scale,
                       what="corr_components")
    n, sx, sy = row["n"], row["sx"], row["sy"]
    sxy, sx2, sy2 = row["sxy"], row["sx2"], row["sy2"]
    denom = float(np.sqrt(n * sx2 - sx * sx) * np.sqrt(n * sy2 - sy * sy))
    corr = (n * sxy - sx * sy) / denom if denom else float("nan")
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "sx": pa.array([sx], pa.int64()),
        "sy": pa.array([sy], pa.int64()),
        "sxy": pa.array([sxy], pa.int64()),
        "sx2": pa.array([sx2], pa.int64()),
        "sy2": pa.array([sy2], pa.int64()),
        "corr": pa.array([round(corr, round_to)], pa.float64()),
    })


def _int_moment_partial(x_col: str, y_col: str, x_scale: int, y_scale: int):
    """Per-batch exact integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²)
    over ``round(col·scale)`` — shared by :func:`corr_components` and
    :func:`linreg_components`. int64 wrap is detected by a float64
    shadow sum (silent corruption becomes a loud error)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(np.asarray(batch[x_col], dtype=np.float64)
                    * x_scale).astype(np.int64)
        y = np.rint(np.asarray(batch[y_col], dtype=np.float64)
                    * y_scale).astype(np.int64)

        def checked(ints: np.ndarray, floats: np.ndarray, what: str) -> int:
            # int64 multiplies wrap silently; a float64 shadow sum
            # diverges wildly on any wrap, so a loose relative check
            # turns silent corruption into a loud error
            iv, fv = int(ints.sum()), float(floats.sum())
            if abs(iv - fv) > 1e-6 * abs(fv) + 16:
                raise OverflowError(
                    f"corr_components {what} overflowed int64 — reduce "
                    f"x_scale/y_scale")
            return iv

        xf = x.astype(np.float64)
        yf = y.astype(np.float64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([checked(x, xf, "sum(x)")], pa.int64()),
            "sy": pa.array([checked(y, yf, "sum(y)")], pa.int64()),
            "sxy": pa.array([checked(x * y, xf * yf, "sum(x*y)")],
                            pa.int64()),
            "sx2": pa.array([checked(x * x, xf * xf, "sum(x^2)")],
                            pa.int64()),
            "sy2": pa.array([checked(y * y, yf * yf, "sum(y^2)")],
                            pa.int64()),
        })

    return partial


def _moment_sums(ds, x_col: str, y_col: str, *, x_scale: int, y_scale: int,
                 what: str) -> dict:
    """Partial → Sum-reduce → overflow-guard for the six integer
    moments — the shared trunk of :func:`corr_components` and
    :func:`linreg_components` (each public function is then just its
    closed-form formula). The guard: the exact int result must
    round-trip through float64 within the rounding the final formula
    can absorb."""
    from ray.data.aggregate import Sum

    partial = _int_moment_partial(x_col, y_col, x_scale, y_scale)
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy",
                                         "sx2", "sy2")])
    for c in ("sxy", "sx2", "sy2"):
        if abs(row[c]) > (1 << 62):
            raise OverflowError(
                f"{what} moment sum too large for exact int64 — "
                f"reduce x_scale/y_scale")
    return row


def linreg_components(ds, x_col: str, y_col: str, *, x_scale: int = 1,
                      y_scale: int = 1, round_to: int = 9) -> pa.Table:
    """Simple (OLS) linear regression of ``y`` on ``x`` from the same
    EXACT integer moment sums as :func:`corr_components` — slope,
    intercept, and r² in the SCALED integer domain, each a closed-form
    float expression over bit-exact int64 components::

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
        intercept = (Σy − slope·Σx) / n            (slope pre-rounded)
        r²        = (n·Σxy − Σx·Σy)² / ((n·Σx²−ΣxΣx)·(n·Σy²−ΣyΣy))

    Every operand is explicitly converted int → float64 before the
    arithmetic (matching SQL's ``CAST(... AS DOUBLE)``), so a DuckDB
    oracle computing the same expressions over the same integers is
    bit-identical before the final ``round(·, round_to)``. Returns one
    row: the six components plus slope/intercept/r2."""
    row = _moment_sums(ds, x_col, y_col, x_scale=x_scale, y_scale=y_scale,
                       what="linreg_components")
    n, sx, sy = row["n"], row["sx"], row["sy"]
    sxy, sx2, sy2 = row["sxy"], row["sx2"], row["sy2"]
    num = n * sxy - sx * sy
    denx = n * sx2 - sx * sx
    deny = n * sy2 - sy * sy
    slope = round(float(num) / float(denx), round_to) if denx else float("nan")
    intercept = round((float(sy) - slope * float(sx)) / float(n),
                      round_to) if n else float("nan")
    r2 = round(float(num) * float(num) / (float(denx) * float(deny)),
               round_to) if denx and deny else float("nan")
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "sx": pa.array([sx], pa.int64()),
        "sy": pa.array([sy], pa.int64()),
        "sxy": pa.array([sxy], pa.int64()),
        "sx2": pa.array([sx2], pa.int64()),
        "sy2": pa.array([sy2], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([intercept], pa.float64()),
        "r2": pa.array([r2], pa.float64()),
    })


def group_argmax(ds, *, keys: list[str], order: list[tuple[str, str]],
                 num_partitions: int | None = None):
    """Grouped argmax/argmin: for each ``keys`` group, the single row
    that sorts FIRST under ``order`` (``[(col, 'ascending'|'descending'),
    ...]`` — SQL's ``QUALIFY ROW_NUMBER() OVER (PARTITION BY keys ORDER
    BY order) = 1``). The caller must make ``order`` total within a
    group (include a tiebreaker column) for a deterministic result.

    Scale shape: each batch first reduces LOCALLY to at most one row
    per key present in it (argmax is associative), so the one shuffle
    moves ≤ distinct-keys-per-block rows, never the fact table; the
    final pick groups by a HASH BUCKET of the key (one vectorized
    sort-and-take-first per bucket — a map_groups call per distinct
    key would cost linearly in key count) and the kernel handles any
    number of keys per table. All columns pass through."""
    import pandas as pd

    sort_spec = [(c, d) for c, d in order]

    def best_per_key(t: pa.Table) -> pa.Table:
        if "__gb" in t.column_names:
            t = t.drop_columns(["__gb"])
        s = t.sort_by(sort_spec)
        # stable first-row-per-key over the sorted table: a key's first
        # occurrence index, computed vectorially via pandas duplicated
        kdf = pd.DataFrame({k: np.asarray(s[k]) for k in keys})
        first = ~kdf.duplicated(keep="first")
        return s.filter(pa.array(first.to_numpy()))

    from kafka_connect_mongo_ray.utils import key_bucketed

    partial = ds.map_batches(best_per_key, batch_format="pyarrow")
    return key_bucketed(partial, keys, num_partitions or 32).map_groups(
        best_per_key, batch_format="pyarrow")


def fixed_width_histogram(ds, val_col: str, *, width: float,
                          cents_col: str | None = None,
                          num_partitions: int | None = None):
    """Fixed-width histogram: ``bin = FLOOR(val / width)`` (an IEEE
    double division + floor, mirrored verbatim in SQL) with an exact
    row count and, optionally, an exact int64 sum of ``cents_col`` per
    bin. Each batch pre-aggregates to ≤ bins-present rows, so the one
    shuffle is bin-domain-sized, never data-sized."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = np.asarray(batch[val_col], dtype=np.float64)
        b = np.floor(v / width).astype(np.int64)
        cols = {"bin": b}
        if cents_col is not None:
            cols["cents"] = np.asarray(batch[cents_col], dtype=np.int64)
        df = pd.DataFrame(cols)
        df["n"] = 1
        agg = df.groupby("bin", sort=False, dropna=False).sum().reset_index()
        out = {"bin": pa.array(agg["bin"].to_numpy(), pa.int64()),
               "n": pa.array(agg["n"].to_numpy(), pa.int64())}
        if cents_col is not None:
            out["cents"] = pa.array(agg["cents"].to_numpy(), pa.int64())
        return pa.table(out)

    aggs = [Sum("n", alias_name="n")]
    if cents_col is not None:
        aggs.append(Sum("cents", alias_name="cents"))
    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin", **kwargs).aggregate(*aggs))


def _shadow_check(int_vals, float_vals, what: str) -> None:
    """The repo-wide int64-wrap guard (see ``_int_moment_partial``):
    numpy int64 products/sums wrap silently; a float64 shadow diverges
    wildly on any wrap, so a loose relative comparison turns silent
    corruption into a loud error. Accepts scalars or arrays/Series —
    one shared implementation so the grouped moment kernels cannot
    drift from the global ones."""
    iv = np.asarray(int_vals, dtype=np.float64)
    fv = np.asarray(float_vals, dtype=np.float64)
    if bool(np.any(np.abs(iv - fv) > 1e-6 * np.abs(fv) + 16)):
        raise OverflowError(f"{what} overflowed int64 — reduce the "
                            f"integer scale")


def grouped_corr(ds, *, group_col: str, x_col: str, y_col: str,
                 x_scale: int = 1, y_scale: int = 1, round_to: int = 9):
    """Per-group Pearson correlation — :func:`corr_components`
    generalized to ``GROUP BY group_col``: each batch reduces to ≤
    groups-present rows of exact int64 moment partials (same float
    shadow-sum overflow guard), one group-domain-sized Sum exchange,
    then the closed-form float per group computed batch-side (the
    group table is already dimension-sized). Returns one row per
    group: (group, n, corr)."""
    from ray.data.aggregate import Sum

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(np.asarray(batch[x_col], dtype=np.float64)
                    * x_scale).astype(np.int64)
        y = np.rint(np.asarray(batch[y_col], dtype=np.float64)
                    * y_scale).astype(np.int64)
        df = pd.DataFrame({group_col: np.asarray(batch[group_col]),
                           "n": 1, "sx": x, "sy": y, "sxy": x * y,
                           "sx2": x * x, "sy2": y * y})
        shadow = pd.DataFrame({group_col: df[group_col],
                               "fxy": x.astype(np.float64) * y,
                               "fx2": x.astype(np.float64) * x,
                               "fy2": y.astype(np.float64) * y})
        agg = df.groupby(group_col, sort=False, dropna=False).sum()
        sagg = shadow.groupby(group_col, sort=False, dropna=False).sum()
        for ic, fc in (("sxy", "fxy"), ("sx2", "fx2"), ("sy2", "fy2")):
            _shadow_check(agg[ic], sagg[fc], f"grouped_corr {ic}")
        agg = agg.reset_index()
        return pa.table({group_col: pa.array(agg[group_col].to_numpy()),
                         **{c: pa.array(agg[c].to_numpy(), pa.int64())
                            for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")}})

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.float64)
        sx = np.asarray(batch["sx"], dtype=np.float64)
        sy = np.asarray(batch["sy"], dtype=np.float64)
        sxy = np.asarray(batch["sxy"], dtype=np.float64)
        sx2 = np.asarray(batch["sx2"], dtype=np.float64)
        sy2 = np.asarray(batch["sy2"], dtype=np.float64)
        denom = np.sqrt(n * sx2 - sx * sx) * np.sqrt(n * sy2 - sy * sy)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = np.where(denom != 0.0, (n * sxy - sx * sy) / denom,
                            np.nan)
        return pa.table({
            group_col: batch[group_col],
            "n": batch["n"],
            "corr": pc.round(pa.array(corr, pa.float64()), round_to,
                             round_mode="half_towards_infinity"),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")])
            .map_batches(finish, batch_format="pyarrow"))


def group_count_distinct(ds, *, group_col: str, val_col: str,
                         out_col: str = "nd",
                         num_partitions: int | None = None):
    """EXACT ``COUNT(DISTINCT val) GROUP BY group`` — the precise
    complement of the mergeable-HLL estimate in ``functions/sketch``.

    Shape: each batch first drops to its LOCAL distinct (group, val)
    pairs (bounded by distinct-pairs-per-batch, never batch rows),
    then ONE shuffle co-locates pairs by a hash bucket of the pair so
    cross-batch duplicates meet; the per-bucket kernel deduplicates
    and emits per-group partial counts (a pair's bucket is a function
    of the pair, so no distinct pair is counted twice across buckets),
    and a final group-domain-sized Sum closes it. The all-to-all moves
    the distinct-pair domain — the information-theoretic minimum for
    an exact answer."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.utils import key_bucketed

    def local_distinct(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, val_col]).group_by(
            [group_col, val_col]).aggregate([])

    def bucket_counts(g: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: np.asarray(g[group_col]),
                           "v": np.asarray(g[val_col])})
        nd = (df.drop_duplicates()
              .groupby(group_col, sort=False, dropna=False)
              .size().reset_index(name="n"))
        return pa.table({group_col: pa.array(nd[group_col].to_numpy()),
                         "n": pa.array(nd["n"].to_numpy(), pa.int64())})

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow")
    partials = key_bucketed(pairs, [group_col, val_col],
                            num_partitions or 32).map_groups(
        bucket_counts, batch_format="pyarrow")
    return partials.groupby(group_col).aggregate(
        Sum("n", alias_name=out_col))


def group_zscore_outliers(ds, *, group_col: str, int_col: str,
                          id_cols: list[str], z_thresh: float = 2.0,
                          z_col: str = "z", round_to: int = 9):
    """Per-group z-score outlier filter: rows whose integer ``int_col``
    sits more than ``z_thresh`` population standard deviations from
    its group's mean (|v − μ_g| / σ_g > z_thresh).

    Two passes over one materialized lineage: (1) per-batch int64
    moment partials (n, Σv, Σv²) per group — bit-exact under any
    partitioning — Sum-reduce to a GROUP-DOMAIN-sized driver table
    that broadcasts back as closure scalars (the caller owns the
    bounded-group-domain contract, same as any broadcast dimension);
    (2) a streaming filter pass computes z with a fixed float operand
    order (μ = Σv/n, σ² = Σv²/n − μ·μ, z = (v − μ)/σ — each operand
    explicitly int→float64, reproducible verbatim in SQL) and keeps
    |z| > z_thresh rows. The filter compares RAW z; ``z_col`` is then
    rounded to ``round_to`` for hash-stable output."""
    from ray.data.aggregate import Sum

    def moment_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = np.asarray(batch[int_col], dtype=np.int64)
        df = pd.DataFrame({group_col: np.asarray(batch[group_col]),
                           "n": 1, "s1": v, "s2": v * v,
                           "f2": v.astype(np.float64) ** 2})
        agg = df.groupby(group_col, sort=False, dropna=False).sum().reset_index()
        # per-batch wrap guard: v*v wraps silently in int64; the final
        # |s2| < 2^62 check alone can alias back under the bound
        _shadow_check(agg["s2"], agg["f2"], "group_zscore_outliers s2")
        return pa.table({group_col: pa.array(agg[group_col].to_numpy()),
                         "n": pa.array(agg["n"].to_numpy(), pa.int64()),
                         "s1": pa.array(agg["s1"].to_numpy(), pa.int64()),
                         "s2": pa.array(agg["s2"].to_numpy(), pa.int64())})

    base = ds.materialize()
    stats = {}
    for r in (base.map_batches(moment_partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("s1", alias_name="s1"),
                         Sum("s2", alias_name="s2"))
              .take_all()):
        n, s1, s2 = float(r["n"]), float(r["s1"]), float(r["s2"])
        if abs(r["s2"]) > (1 << 62):
            raise OverflowError("group_zscore_outliers moment sum too "
                                "large for exact int64 — pre-scale down")
        mean = s1 / n
        var = s2 / n - mean * mean
        stats[r[group_col]] = (mean, np.sqrt(var))

    def zfilter(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = np.asarray(batch[int_col], dtype=np.int64).astype(np.float64)
        # factorize: the Python-level stats lookup runs once per
        # DISTINCT group in the batch, never per row
        codes, uniques = pd.factorize(np.asarray(batch[group_col]))
        mean_u = np.array([stats[u][0] for u in uniques], dtype=np.float64)
        std_u = np.array([stats[u][1] for u in uniques], dtype=np.float64)
        z = (v - mean_u[codes]) / std_u[codes]
        keep = np.abs(z) > z_thresh
        out = batch.select(id_cols + [group_col]).filter(pa.array(keep))
        return out.append_column(
            z_col, pc.round(pa.array(z[keep], pa.float64()), round_to,
                            round_mode="half_towards_infinity"))

    return base.map_batches(zfilter, batch_format="pyarrow")


def frequent_items(ds, col: str, *, min_frac: tuple[int, int],
                   num_partitions: int | None = None):
    """EXACT frequent items: every value with global frequency ≥
    ``p/q`` of all rows (``min_frac=(p, q)`` — a RATIONAL, so the
    threshold comparison ``q·cnt ≥ p·total`` is pure integer math and
    reproducible bit-for-bit in SQL), with its exact count. Two
    passes, both recall-complete:

    1. *Candidates*: each batch emits the values whose LOCAL share
       satisfies ``q·cnt_b ≥ p·rows_b``. Pigeonhole guarantee: if a
       value misses that bound in EVERY batch then summing the strict
       inequalities gives ``q·cnt < p·total`` — so no globally
       qualifying value can be missed; per-batch output is ≤ q/p rows
       regardless of batch size.
    2. *Verify*: exact per-batch counts are emitted ONLY for candidate
       rows (a broadcast set of ≤ blocks·q/p entries, tiny) and
       Sum-reduced; a final integer filter applies the global bound.

    The only all-to-alls move candidate-bounded rows, never data. The
    driver holds the candidate set and the total row count: at most
    ``min(distinct-value domain, blocks·q/p)`` entries. That bound
    GROWS with block count — at extreme scale (say 10^6 blocks at
    φ = 1/100, up to 10^8 candidates) the broadcast set would be the
    bottleneck; exactness fundamentally needs every candidate's count
    from every batch (the 2-round Misra–Gries shape), so at that scale
    raise φ, pre-aggregate into fewer/larger blocks, or accept the
    one-pass approximate top-k (space-saving) instead. For the
    φ ≥ 1/1000, ≤10^4-block regime this targets, the set is ≤ a few
    hundred thousand scalars. NULL counts as a value of its own (SQL
    GROUP BY semantics: the mirror's NULL group is reported too).
    Returns a Dataset (value, cnt) with q·cnt ≥ p·total."""
    from ray.data.aggregate import Sum

    p, q = min_frac
    if p <= 0 or q <= 0:
        raise ValueError("min_frac must be a positive (p, q) fraction")

    def local_candidates(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        # value_counts skips nulls in some arrow versions and emits a
        # null row in others: count nulls explicitly either way, and
        # emit the null candidate as a null VALUE row (the value column
        # is nullable by construction)
        vc = pc.value_counts(c.drop_null())
        cnts = np.asarray(vc.field("counts"), dtype=np.int64)
        keep = q * cnts >= p * batch.num_rows
        vals = vc.field("values").filter(pa.array(keep))
        if q * c.null_count >= p * batch.num_rows:
            vals = pa.concat_arrays([vals.combine_chunks() if isinstance(
                vals, pa.ChunkedArray) else vals, pa.nulls(1, vals.type)])
        return pa.table({"value": vals})

    # one materialization of the pruned column: the candidates pass,
    # the exact total, and the exact-counts pass are three consumers
    # of one lineage (the multi-consumer staging rule) — and the
    # candidate sets then describe the exact block partitioning the
    # counting pass sees. batch_size=None pins one batch per block.
    pruned = ds.select_columns([col]).materialize()
    summary = (pruned.map_batches(local_candidates, batch_format="pyarrow",
                                  batch_size=None)
               .to_pandas())
    # the exact total must count batches that emitted no candidates
    # too, so it comes from the (free, metadata) count
    total = pruned.count()
    null_candidate = ("value" in summary.columns
                      and bool(summary["value"].isna().any()))
    cand = (set(summary["value"].dropna().tolist())
            if "value" in summary.columns else set())
    if not cand and not null_candidate:
        import ray.data as rd

        schema = pruned.schema()
        col_type = dict(zip(schema.names, schema.types))[col]
        if not isinstance(col_type, pa.DataType):
            col_type = pa.from_numpy_dtype(col_type)
        return rd.from_arrow(pa.table({
            "value": pa.array([], col_type),
            "cnt": pa.array([], pa.int64())}))

    cand_arr = pa.array(sorted(cand)) if cand else None

    def exact_counts(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vc = pc.value_counts(c.drop_null())
        vals = vc.field("values")
        if cand_arr is not None:
            mask = pc.is_in(vals, value_set=cand_arr)
            vals = vals.filter(mask)
            cnts = pc.cast(vc.field("counts"), pa.int64()).filter(mask)
        else:
            vals = vals.slice(0, 0)
            cnts = pa.array([], pa.int64())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if isinstance(cnts, pa.ChunkedArray):
            cnts = cnts.combine_chunks()
        if null_candidate and c.null_count:
            vals = pa.concat_arrays([vals, pa.nulls(1, vals.type)])
            cnts = pa.concat_arrays(
                [cnts, pa.array([c.null_count], pa.int64())])
        return pa.table({"value": vals, "cnt": cnts})

    # q·cnt ≥ p·total as an integer bound: cnt ≥ ceil(p·total / q)
    threshold = -(-(p * total) // q)
    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    counts = (pruned.map_batches(exact_counts, batch_format="pyarrow",
                                 batch_size=None)
              .groupby("value", **kwargs)
              .aggregate(Sum("cnt", alias_name="cnt")))
    return counts.filter(expr=f"cnt >= {threshold}")


def grouped_skew_kurt(ds, *, group_col: str, int_col: str,
                      scale: int = 1, round_to: int = 9):
    """Per-group skewness and excess kurtosis from EXACT int64 moment
    partials — :func:`grouped_corr`'s machinery extended to the third
    and fourth powers: each batch reduces to ≤ groups-present rows of
    (n, Σx, Σx², Σx³, Σx⁴) over ``round(col·scale)`` (float shadow
    sums guard the wrap), ONE group-domain Sum exchange, then the
    population closed forms per group::

        m1 = Σx/n;  e2 = Σx²/n;  e3 = Σx³/n;  e4 = Σx⁴/n
        m2 = e2 − m1·m1
        m3 = e3 − (3·m1)·e2 + (2·(m1·m1))·m1
        m4 = e4 − (4·m1)·e3 + (6·(m1·m1))·e2 − 3·((m1·m1)·(m1·m1))
        skew = m3 / (sqrt(m2)·m2);  kurt = m4/(m2·m2) − 3

    The float chain is longer than the repo's usual single-division
    rule allows, so bit-parity relies on the OPERAND-ORDER discipline
    (NEXT.md fifth-session rule): the oracle mirrors this exact
    parenthesization — every multiply/divide/subtract happens in the
    same order on the same exact integers, and ``sqrt(m2)·m2``
    replaces ``pow(m2, 1.5)`` because sqrt is correctly rounded IEEE
    in both engines while libm pow is not. Statistic magnitudes are
    O(1–10), nine decades above the ULP at the 9-dp rounding grid.
    Caller owns the int64 bound: ``max|x·scale|⁴ · rows`` must stay
    inside int64 (qty ≤ 50 scale 1 holds to ~2^40 rows)."""
    from ray.data.aggregate import Sum

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(np.asarray(batch[int_col], dtype=np.float64)
                    * scale).astype(np.int64)
        x2 = x * x
        df = pd.DataFrame({group_col: np.asarray(batch[group_col]),
                           "n": 1, "s1": x, "s2": x2, "s3": x2 * x,
                           "s4": x2 * x2})
        fx = x.astype(np.float64)
        shadow = pd.DataFrame({group_col: df[group_col],
                               "f2": fx * fx, "f3": fx * fx * fx,
                               "f4": (fx * fx) * (fx * fx)})
        agg = df.groupby(group_col, sort=False, dropna=False).sum()
        sagg = shadow.groupby(group_col, sort=False, dropna=False).sum()
        for ic, fc in (("s2", "f2"), ("s3", "f3"), ("s4", "f4")):
            _shadow_check(agg[ic], sagg[fc], f"grouped_skew_kurt {ic}")
        agg = agg.reset_index()
        return pa.table({group_col: pa.array(agg[group_col].to_numpy()),
                         **{c: pa.array(agg[c].to_numpy(), pa.int64())
                            for c in ("n", "s1", "s2", "s3", "s4")}})

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.float64)
        s1 = np.asarray(batch["s1"], dtype=np.float64)
        s2 = np.asarray(batch["s2"], dtype=np.float64)
        s3 = np.asarray(batch["s3"], dtype=np.float64)
        s4 = np.asarray(batch["s4"], dtype=np.float64)
        m1 = s1 / n
        e2 = s2 / n
        e3 = s3 / n
        e4 = s4 / n
        m2 = e2 - m1 * m1
        m3 = e3 - (3.0 * m1) * e2 + (2.0 * (m1 * m1)) * m1
        m4 = (e4 - (4.0 * m1) * e3 + (6.0 * (m1 * m1)) * e2
              - 3.0 * ((m1 * m1) * (m1 * m1)))
        with np.errstate(divide="ignore", invalid="ignore"):
            skew = np.where(m2 > 0.0, m3 / (np.sqrt(m2) * m2), np.nan)
            kurt = np.where(m2 > 0.0, m4 / (m2 * m2) - 3.0, np.nan)
        return pa.table({
            group_col: batch[group_col],
            "n": batch["n"],
            "skew": pc.round(pa.array(skew, pa.float64()), round_to,
                             round_mode="half_towards_infinity"),
            "kurt": pc.round(pa.array(kurt, pa.float64()), round_to,
                             round_mode="half_towards_infinity"),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ("n", "s1", "s2", "s3", "s4")])
            .map_batches(finish, batch_format="pyarrow"))


def grouped_entropy(ds, *, group_col: str, val_col: str,
                    out_col: str = "ent", round_to: int = 6):
    """Per-group Shannon entropy (base 2) of a categorical column's
    instance distribution — DuckDB's ``entropy(val) GROUP BY group``
    and the grouped sibling of ``text.py::char_entropy_batch`` (which
    is batch-local per document; this one shuffles, so a group's
    instances may span the whole corpus).

    Two count-domain stages, no row-domain exchange: each batch
    reduces to ≤ distinct-(group,val)-present rows of partial counts,
    ONE hash-bucket exchange co-locates a group's partials, and the
    in-bucket kernel re-reduces with ``np.unique`` + two ``reduceat``
    sweeps (final counts per (group,val), then Σc·log₂c per group).
    The float path mirrors the batch-local kernel exactly —
    ``log2(n) − Σ c·log₂c / n`` at the same 6-dp grid — so the SQL
    oracle transfers."""
    from kafka_connect_mongo_ray.utils import key_bucketed

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        # DuckDB entropy() IGNORES null values — drop them before the
        # count (a NaN group key would also break the string cast)
        col = batch[val_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        df = pd.DataFrame({
            group_col: np.asarray(batch[group_col])[valid],
            val_col: np.asarray(col).astype(object)[valid]})
        agg = (df.groupby([group_col, val_col], sort=False, dropna=False)
               .size().reset_index(name="__c"))
        return pa.table({group_col: pa.array(agg[group_col].to_numpy()),
                         val_col: pa.array(agg[val_col].to_numpy(object),
                                           pa.string()),
                         "__c": pa.array(agg["__c"].to_numpy(), pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["__gb"]).sort_by(
            [(group_col, "ascending"), (val_col, "ascending")])
        k = np.asarray(t[group_col])
        v = np.asarray(t[val_col]).astype(object)
        c = np.asarray(t["__c"], dtype=np.int64)
        n = len(k)
        if n == 0:
            return pa.table({group_col: t[group_col],
                             out_col: pa.array([], pa.float64())})
        # merge cross-batch partials of the same (group, val)
        pair_first = np.ones(n, dtype=bool)
        pair_first[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        pstart = np.flatnonzero(pair_first)
        cnt = np.add.reduceat(c, pstart)
        gk = k[pstart]
        gfirst = np.ones(len(gk), dtype=bool)
        gfirst[1:] = gk[1:] != gk[:-1]
        gstart = np.flatnonzero(gfirst)
        clogc = cnt * np.log2(cnt)
        sums = np.add.reduceat(clogc, gstart)
        tot = np.add.reduceat(cnt, gstart).astype(np.float64)
        ent = np.round(np.log2(tot) - sums / tot, round_to)
        return pa.table({group_col: pa.array(gk[gstart]),
                         out_col: pa.array(ent, pa.float64())})

    return key_bucketed(ds.map_batches(partial, batch_format="pyarrow"),
                        [group_col], 32).map_groups(
        per_bucket, batch_format="pyarrow")


def welch_t_components(ds, *, label_col: str, int_col: str,
                       label_a: str, label_b: str, scale: int = 1,
                       round_to: int = 9):
    """Welch's unequal-variance t statistic between two labelled
    populations of an integer-valued metric — the A/B-test primitive.
    Each batch reduces to ≤ 2 rows of exact int64 ``(n, Σx, Σx²)``
    partials over ``round(col·scale)`` (float shadow sums guard the
    wrap, same contract as :func:`grouped_skew_kurt`), one 2-row Sum
    exchange, then the closed form on the driver-side 2-row table::

        m  = s1/n                       (per side)
        q  = s2/n − m·m                 (population variance)
        v  = q · (n/(n−1))              (sample correction)
        t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))   (Welch–S.)

    Bit-parity relies on the operand-order discipline: the SQL oracle
    mirrors this exact parenthesization over the same exact integer
    sums. Returns a ONE-ROW pandas DataFrame (n_a, n_b, mean_a,
    mean_b, t_stat, df) — scalar output, so driver-side finishing is
    metrics-bounded by design."""
    from ray.data.aggregate import Sum

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch[label_col]).astype(object)
        keep = (lab == label_a) | (lab == label_b)
        v = np.asarray(batch[int_col], dtype=np.float64)[keep] * scale
        # DuckDB ROUND is half-away-from-zero; np.rint is half-even —
        # pin the oracle's mode (the _events_ts_us cents rule)
        x = np.copysign(np.floor(np.abs(v) + 0.5), v).astype(np.int64)
        lab = lab[keep]
        df = pd.DataFrame({label_col: lab, "n": 1, "s1": x, "s2": x * x})
        fx = x.astype(np.float64)
        shadow = pd.DataFrame({label_col: lab, "f2": fx * fx})
        agg = df.groupby(label_col, sort=False).sum()
        sagg = shadow.groupby(label_col, sort=False).sum()
        _shadow_check(agg["s2"], sagg["f2"], "welch_t s2")
        agg = agg.reset_index()
        return pa.table({label_col: pa.array(agg[label_col].to_numpy(object),
                                             pa.string()),
                         **{c: pa.array(agg[c].to_numpy(), pa.int64())
                            for c in ("n", "s1", "s2")}})

    sums = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(label_col)
            .aggregate(*[Sum(c, alias_name=c) for c in ("n", "s1", "s2")])
            .to_pandas())  # exactly 2 rows
    by = {r[label_col]: r for _, r in sums.iterrows()}
    for lab in (label_a, label_b):
        if lab not in by:
            raise ValueError(f"welch_t_components: no rows labelled "
                             f"{lab!r}")
        if int(by[lab]["n"]) < 2:
            raise ValueError(f"welch_t_components: label {lab!r} has "
                             f"n={int(by[lab]['n'])} < 2 — the sample "
                             "variance is undefined")
    out: dict = {}
    vn: dict = {}
    for side, lab in (("a", label_a), ("b", label_b)):
        r = by[lab]
        n = float(r["n"])
        m = float(r["s1"]) / n
        q = float(r["s2"]) / n - m * m
        out[f"n_{side}"] = int(r["n"])
        out[f"mean_{side}"] = m
        vn[side] = (q * (n / (n - 1.0))) / n  # v/n
    se2 = vn["a"] + vn["b"]
    t = (out["mean_a"] - out["mean_b"]) / np.sqrt(se2)
    df_w = (se2 * se2) / ((vn["a"] * vn["a"]) / (out["n_a"] - 1.0)
                          + (vn["b"] * vn["b"]) / (out["n_b"] - 1.0))

    def _r(x: float) -> float:  # DuckDB ROUND = half away from zero
        return pc.round(pa.scalar(float(x), pa.float64()), round_to,
                        round_mode="half_towards_infinity").as_py()

    out["mean_a"] = _r(out["mean_a"])
    out["mean_b"] = _r(out["mean_b"])
    return pd.DataFrame([{**out, "t_stat": _r(t), "df_w": _r(df_w)}])


def grouped_linreg(ds, *, group_col: str, x_col: str, y_col: str,
                   x_scale: int = 1, y_scale: int = 1, round_to: int = 9):
    """Per-group OLS regression (slope, intercept, r²) —
    :func:`linreg_components` generalized to ``GROUP BY group_col``:
    the same exact int64 moment partials and shadow wrap guard as
    :func:`grouped_corr`, one group-domain Sum exchange, then the
    closed forms per group with the cross products ``n·Σxy − Σx·Σy``
    computed in PYTHON ints (the group table is dimension-sized, so
    the per-row exact arithmetic is free; the SQL mirror uses HUGEINT
    for the same step). The intercept uses the ROUNDED slope,
    mirroring the oracle's staged CTE. Groups with constant x emit
    null stats."""
    from ray.data.aggregate import Sum

    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        x = np.rint(np.asarray(batch[x_col], dtype=np.float64)
                    * x_scale).astype(np.int64)
        y = np.rint(np.asarray(batch[y_col], dtype=np.float64)
                    * y_scale).astype(np.int64)
        df = pd.DataFrame({group_col: np.asarray(batch[group_col]),
                           "n": 1, "sx": x, "sy": y, "sxy": x * y,
                           "sx2": x * x, "sy2": y * y})
        shadow = pd.DataFrame({group_col: df[group_col],
                               "fxy": x.astype(np.float64) * y,
                               "fx2": x.astype(np.float64) * x,
                               "fy2": y.astype(np.float64) * y})
        agg = df.groupby(group_col, sort=False, dropna=False).sum()
        sagg = shadow.groupby(group_col, sort=False, dropna=False).sum()
        for ic, fc in (("sxy", "fxy"), ("sx2", "fx2"), ("sy2", "fy2")):
            _shadow_check(agg[ic], sagg[fc], f"grouped_linreg {ic}")
        agg = agg.reset_index()
        return pa.table({group_col: pa.array(agg[group_col].to_numpy()),
                         **{c: pa.array(agg[c].to_numpy(), pa.int64())
                            for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")}})

    def finish(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        slopes, r2s = [], []
        for r in rows:
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            num = n * int(r["sxy"]) - sx * sy
            denx = n * int(r["sx2"]) - sx * sx
            deny = n * int(r["sy2"]) - sy * sy
            if denx == 0 or deny == 0:
                slopes.append(None)
                r2s.append(None)
                continue
            slopes.append(float(num) / float(denx))
            r2s.append(float(num) * float(num)
                       / (float(denx) * float(deny)))
        slope_r = pc.round(pa.array(slopes, pa.float64()), round_to,
                           round_mode="half_towards_infinity")
        # one aligned pass: row i's intercept comes from row i's
        # ROUNDED slope (a degenerate row stays None at position i)
        intercepts = [
            None if slopes[i] is None else
            (float(int(r["sy"])) - slope_r[i].as_py() * float(int(r["sx"])))
            / float(int(r["n"]))
            for i, r in enumerate(rows)]
        return pa.table({
            group_col: batch[group_col],
            "n": batch["n"],
            "slope": slope_r,
            "intercept": pc.round(pa.array(intercepts, pa.float64()),
                                  round_to,
                                  round_mode="half_towards_infinity"),
            "r2": pc.round(pa.array(r2s, pa.float64()), round_to,
                           round_mode="half_towards_infinity"),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")])
            .map_batches(finish, batch_format="pyarrow"))
