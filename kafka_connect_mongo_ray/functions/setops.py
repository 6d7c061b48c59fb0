"""Distinct set operations (SQL INTERSECT / EXCEPT) over key columns.

Composition, not new machinery: both sides reduce to per-batch
DISTINCT keys first (the exchange only ever moves distinct keys, the
same prune the existence joins use — stages/join.py), then ONE
bucketed shuffle co-locates equal keys and a membership test per
bucket emits the result. NULL keys follow SQL set semantics: INTERSECT
and EXCEPT treat NULLs as equal (unlike join equality), so a NULL key
present on both sides intersects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_connect_mongo_ray.utils import hash_buckets

__all__ = ["set_op_distinct", "set_op_all"]

_SIDE = "__side"
_BUCKET = "__bucket"


def _distinct_tag(side: int, cols: list[str], num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.select(cols).group_by(cols).aggregate([])
        t = t.append_column(
            _BUCKET, pa.array(hash_buckets(t, cols, num_buckets), pa.int32()))
        return t.append_column(
            _SIDE, pa.array(np.full(t.num_rows, side, np.int8)))

    return fn


def set_op_distinct(left_ds, right_ds, *, on: list[str], op: str,
                    num_buckets: int = 32):
    """``op='intersect'`` → SELECT DISTINCT keys present on BOTH sides;
    ``op='except'`` → DISTINCT left keys absent from the right
    (SQL INTERSECT / EXCEPT). Returns a Dataset of the key columns.

    Scale shape: per-batch distinct prune on both sides, one shuffle
    of distinct keys, per-bucket pandas membership resolve. NaN keys
    compare equal here (SQL set-op semantics — DISTINCT grouping, not
    join equality)."""
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    schema = left_ds.schema()
    key_types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([pa.field(c, key_types[c]) for c in on])

    lt = left_ds.map_batches(_distinct_tag(0, on, num_buckets),
                             batch_format="pyarrow")
    rt = right_ds.map_batches(_distinct_tag(1, on, num_buckets),
                              batch_format="pyarrow")
    both = lt.union(rt)

    def resolve(g: pd.DataFrame) -> pa.Table:
        l = g[g[_SIDE] == 0][on].drop_duplicates()
        r = g[g[_SIDE] == 1][on].drop_duplicates()
        m = l.merge(r, on=on, how="left", indicator="__in_r")
        want = "both" if op == "intersect" else "left_only"
        out = m.loc[m["__in_r"] == want, on]
        # explicit schema so an all-empty result still carries columns
        return pa.Table.from_pandas(
            out, preserve_index=False).cast(out_schema)

    return both.groupby(_BUCKET, num_partitions=num_buckets).map_groups(
        resolve, batch_format="pandas")


def set_op_all(left_ds, right_ds, *, on: list[str], op: str,
               num_buckets: int = 32):
    """BAG (multiset) set operations — SQL ``EXCEPT ALL`` /
    ``INTERSECT ALL``: result multiplicity per key is
    ``max(count_left − count_right, 0)`` or
    ``min(count_left, count_right)``. NULL keys participate as a key
    of their own (SQL set-operation semantics, same as the DISTINCT
    variants).

    Scale shape: each batch pre-counts its keys (the exchange moves
    (key, count) partials — distinct-keys-per-block, never rows), one
    bucketed groupby-sum per side folds into the same exchange via a
    side tag, and the per-bucket kernel replicates each key
    ``multiplicity`` times with np.repeat."""
    from ray.data.aggregate import Sum

    from kafka_connect_mongo_ray.utils import key_bucketed

    if op not in ("intersect_all", "except_all"):
        raise ValueError(f"unknown op {op!r}")

    # an all-null partition leaves the exchange with a null-typed key
    # column; pin the output to the left input's key types
    base = left_ds.schema().base_schema
    key_schema = pa.schema([pa.field(c, base.field(c).type) for c in on])

    def counted(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            # pure-Arrow group_by: keeps key dtypes (a numpy round trip
            # flips null-bearing int64 to float64 — the ranking.py
            # pitfall) and counts NULL keys as their own group
            g = batch.select(on).group_by(on).aggregate([([], "count_all")])
            n = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
            zero = np.zeros(len(n), np.int64)
            cols = {c: g[c] for c in on}
            cols["__cl"] = pa.array(n if side == 0 else zero, pa.int64())
            cols["__cr"] = pa.array(n if side == 1 else zero, pa.int64())
            return pa.table(cols)
        return fn

    both = (left_ds.map_batches(counted(0), batch_format="pyarrow")
            .union(right_ds.map_batches(counted(1), batch_format="pyarrow")))
    counts = (both.groupby(on, num_partitions=num_buckets)
              .aggregate(Sum("__cl", alias_name="__cl"),
                         Sum("__cr", alias_name="__cr")))

    def replicate(t: pa.Table) -> pa.Table:
        cl = np.asarray(t["__cl"], dtype=np.int64)
        cr = np.asarray(t["__cr"], dtype=np.int64)
        mult = (np.minimum(cl, cr) if op == "intersect_all"
                else np.maximum(cl - cr, 0))
        idx = np.repeat(np.arange(t.num_rows), mult)
        return t.select(on).take(pa.array(idx, pa.int64())).cast(key_schema)

    return counts.map_batches(replicate, batch_format="pyarrow")
