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


def grouped_exact_quantiles(ds, group_col: str, col: str, qs: list[float],
                            *, scale: int = 100,
                            num_partitions: int | None = None):
    """EXACT per-group discrete quantiles of ``round(col * scale)`` —
    quantile_disc(...) GROUP BY ``group_col``, fully distributed.

    Same value→count compaction as :func:`exact_quantiles`, but the
    cumulative pick runs INSIDE a per-group ``map_groups`` instead of
    on the driver: the one shuffle moves (group, value, count) rows —
    bounded by groups × distinct scaled values, never by row count —
    and nothing is materialized driver-side. Returns a Dataset
    ``(group_col, q, value_scaled)``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        import pandas as pd

        v = np.asarray(batch[col], dtype=np.float64)
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "v": np.rint(v * scale).astype(np.int64)})
        # dropna=False: NULL-group rows keep their own quantile row
        # (SQL GROUP BY keeps NULL groups; Ray's groupby does too)
        g = df.groupby([group_col, "v"], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "c"})
        return pa.Table.from_pandas(g, preserve_index=False)

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "v"], **kwargs)
              .aggregate(Sum("c", alias_name="c")))

    def pick(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("v", "ascending")])
        t = g.take(order)
        c = np.asarray(t["c"], dtype=np.int64)
        vals = np.asarray(t["v"], dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        picked = [int(vals[int(np.searchsorted(cum, quantile_disc_index(q, n) + 1))])
                  for q in qs]
        return pa.table({
            group_col: pa.array([t[group_col][0].as_py()] * len(qs),
                                t.schema.field(group_col).type),
            "q": pa.array([float(q) for q in qs], pa.float64()),
            "value_scaled": pa.array(picked, pa.int64()),
        })

    return counts.groupby(group_col).map_groups(pick, batch_format="pyarrow")


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
