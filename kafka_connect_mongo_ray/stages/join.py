"""Partitioned (bucketed) hash join for two large Datasets.

The reference needs no large-side join (its one join is the broadcast
point-lookup, stages/enrich.py), but a training-data engine does. The
portable Ray-Data pattern: add ``__bucket = hash(key) % B`` to both
sides, tag each side, union, ``groupby(__bucket)`` (ONE shuffle moving
each row once), and pandas-merge the two sides inside each bucket
group. Skewed keys split across sub-buckets by salting the SMALLER
side's bucket only when needed (callers pick B ≫ cores so no group
exceeds worker memory).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc

from kafka_connect_mongo_ray.utils import hash_buckets, limit_worker_threads

_SIDE = "__side"
_BUCKET = "__bucket"


def _restore_types(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``t`` back to the exact input types column by column,
    keeping the pandas-upcast type only where the cast would lose data
    (a genuinely null-bearing float column stays float64)."""
    cols = []
    for f in schema:
        col = t[f.name]
        try:
            cols.append(pc.cast(col, f.type))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            cols.append(col)
    return pa.table(dict(zip(schema.names, cols)))


def _tag(side: int, key_cols, num_buckets):
    def fn(batch: pa.Table) -> pa.Table:
        limit_worker_threads()
        b = pa.array(hash_buckets(batch, key_cols, num_buckets), pa.int32())
        t = batch.append_column(_BUCKET, b)
        return t.append_column(_SIDE, pa.array(np.full(batch.num_rows, side, dtype=np.int8)))

    return fn


def native_join(left_ds, right_ds, *, on: list[str], num_buckets: int = 32,
                how: str = "inner"):
    """Ray's built-in hash-partitioned ``Dataset.join`` (Ray ≥2.46).
    Same semantics as :func:`hash_join`; prefer it when the installed
    Ray exposes it — our explicit bucketed implementation remains the
    portable fallback and the reference for its shuffle mechanics.

    num_partitions is capped at the cluster CPU count: the join's
    HashShuffleAggregator pool allocates one actor per partition
    up-front, and demanding more actors than grantable CPUs deadlocks
    the streaming executor (reproduced at 16 partitions on 4 CPUs)."""
    import ray

    join_type = {"inner": "inner", "left": "left_outer",
                 "right": "right_outer", "outer": "full_outer"}[how]
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    num_buckets = max(1, min(num_buckets, cpus))
    return left_ds.join(right_ds, join_type, num_buckets, on=tuple(on))


def asof_join(left_ds, right_ds, *, by: list[str], on: str,
              num_buckets: int = 32, direction: str = "backward",
              tolerance: int | None = None):
    """As-of join — the time-series lookup Ray Data lacks natively: for
    every left row, attach the right row with the greatest ``on`` value
    ≤ the left's (``direction='backward'``; ``'forward'`` = smallest ≥)
    within the same ``by`` group. Left join semantics: unmatched left
    rows keep null right columns.

    Composition (no raw actors): both sides bucket-hash on ``by`` and
    union (ONE shuffle moving each row once); inside every bucket group
    a pandas ``merge_asof`` (sorted merge) resolves the per-key nearest
    match. Partitioning assumption: all rows of a ``by`` key land in
    one group — guaranteed by the bucket hash. Column sets must be
    disjoint apart from ``by``/``on``; the right's ``on`` column is not
    emitted (standard merge_asof contract).

    ``tolerance`` bounds the match distance on ``on`` (same integer
    unit): a nearest match farther than the bound is dropped — the
    left row keeps null right columns. SQL mirror: a plain ASOF join
    with the out-of-bound match CASE'd to NULL (equivalent — if the
    nearest is out of bound, every other candidate is too)."""
    left_cols = list(left_ds.schema().names)
    right_schema = right_ds.schema()
    right_cols = list(right_schema.names)
    r_payload = [c for c in right_cols if c not in by and c != on]
    right_types = dict(zip(right_schema.names, right_schema.types))

    lt = left_ds.map_batches(_tag(0, by, num_buckets), batch_format="pyarrow")
    rt = right_ds.map_batches(_tag(1, by, num_buckets), batch_format="pyarrow")

    def pad(cols_missing, types):
        def fn(batch: pa.Table) -> pa.Table:
            for c in cols_missing:
                batch = batch.append_column(c, pa.nulls(batch.num_rows, types[c]))
            return batch

        return fn

    left_types = dict(zip(left_ds.schema().names, left_ds.schema().types))
    l_missing = [c for c in right_cols if c not in left_cols]
    r_missing = [c for c in left_cols if c not in right_cols]
    types = {c: right_types[c] for c in l_missing}
    types.update({c: left_types[c] for c in r_missing})
    lt = lt.map_batches(pad(l_missing, types), batch_format="pyarrow")
    rt = rt.map_batches(pad(r_missing, types), batch_format="pyarrow")
    ordered = [_BUCKET, _SIDE] + sorted(set(left_cols + right_cols))
    lt = lt.select_columns(ordered)
    rt = rt.select_columns(ordered)
    both = lt.union(rt)

    l_payload = [c for c in left_cols if c not in by]

    # Exact output schema from the INPUT datasets: the null padding before
    # the union makes every column nullable, and the pandas group
    # conversion upcasts int64→float64(+NaN). Left columns are never null
    # after a left asof join, so their cast always succeeds; right payload
    # columns restore where lossless (from_pandas maps NaN→null, and a
    # null-bearing float column of integral values casts back to int).
    all_types = dict(left_types)
    all_types.update({c: right_types[c] for c in r_payload})
    out_cols = by + l_payload + r_payload
    out_schema = pa.schema([pa.field(c, all_types[c]) for c in out_cols])

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        l = g[g[_SIDE] == 0][by + l_payload].sort_values(on, kind="mergesort")
        r = g[g[_SIDE] == 1][by + [on] + r_payload].sort_values(on, kind="mergesort")
        if len(r) == 0:
            t = pa.Table.from_pandas(l, preserve_index=False)
            t = _restore_types(t, pa.schema(
                [pa.field(c, all_types[c]) for c in by + l_payload]))
            for c in r_payload:
                t = t.append_column(c, pa.nulls(t.num_rows, all_types[c]))
            return t.select(out_cols)
        out = pd.merge_asof(l, r, on=on, by=by, direction=direction,
                            tolerance=tolerance)
        t = pa.Table.from_pandas(out[out_cols], preserve_index=False)
        return _restore_types(t, out_schema)

    return both.groupby(_BUCKET, num_partitions=num_buckets).map_groups(
        merge_bucket, batch_format="pandas")


def interval_join(ds, intervals: pa.Table, *, on: str, lo_col: str = "lo",
                  hi_col: str = "hi", how: str = "inner"):
    """Range join against a SMALL interval table (the lookup side of a
    bucketing / validity-window join — Ray Data has no native range
    join). Intervals must be non-overlapping; rows match the interval
    with ``lo <= value < hi``. ``how='inner'`` drops non-matching rows,
    ``'left'`` keeps them with null interval columns.

    Scale shape: the interval table is broadcast ONCE via ``ray.put``
    (it is dimension-sized by definition — validity windows, price
    brackets, time buckets) and every batch resolves its rows with two
    vectorized ``np.searchsorted`` calls; the fact stream never
    shuffles. For interval tables too large to broadcast, bucket both
    sides by a coarse grid of the range and use :func:`hash_join` on
    the grid key."""
    import ray

    lo = np.asarray(intervals[lo_col], dtype=np.float64)
    hi = np.asarray(intervals[hi_col], dtype=np.float64)
    order = np.argsort(lo, kind="mergesort")
    lo, hi = lo[order], hi[order]
    if (lo[1:] < hi[:-1]).any():
        raise ValueError("interval_join requires non-overlapping intervals")
    payload_cols = [c for c in intervals.column_names if c not in (lo_col, hi_col)]
    payload = intervals.take(pa.array(order)).select(payload_cols)
    iv_ref = ray.put((lo, hi, payload))

    class Resolver:
        def __init__(self):
            self.lo, self.hi, self.payload = ray.get(iv_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            limit_worker_threads()
            v = np.asarray(batch[on], dtype=np.float64)
            idx = np.searchsorted(self.lo, v, side="right") - 1
            ok = (idx >= 0) & (v < self.hi[np.clip(idx, 0, None)])
            if how == "inner":
                out = batch.filter(pa.array(ok))
                take = pa.array(idx[ok], pa.int64())
                attach = self.payload.take(take)
            else:
                out = batch
                # null payload for misses: a masked index array makes
                # Table.take emit a null row wherever the index is null
                attach = self.payload.take(pa.array(idx, pa.int64(), mask=~ok))
            for c in attach.column_names:
                out = out.append_column(c, attach[c])
            return out

    return ds.map_batches(Resolver, batch_format="pyarrow", concurrency=(1, 8))


def detect_hot_keys(ds, key: str, num_buckets: int, *, frac: float = 0.5,
                    per_batch_k: int = 16, max_keys: int = 16) -> list:
    """Sample-free heavy-hitter pass over the key column: each batch
    reports its top-``per_batch_k`` key counts plus its row count
    (space-saving style — a globally hot key is hot in the batches it
    appears in), the driver combines the bounded summaries, and a key
    is hot when its (under)estimated global count exceeds ``frac`` ×
    the average bucket's row budget (total/num_buckets). One cheap
    column-pruned extra pass; the summary shipped to the driver is
    O(per_batch_k × blocks), never data-sized."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        cnts = np.asarray(vc.field("counts"))
        top = np.argsort(cnts)[-per_batch_k:]
        ks = vc.field("values").take(pa.array(top, pa.int64()))
        # one null-key row per batch carries the batch's row count so
        # the driver can compute the global total without a second pass
        return pa.table({
            "k": pa.concat_arrays([ks, pa.nulls(1, ks.type)]),
            "c": pa.array(np.append(cnts[top], batch.num_rows), pa.int64()),
        })

    summary = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    total = int(summary.loc[summary["k"].isna(), "c"].sum())
    per_key = summary.dropna(subset=["k"]).groupby("k")["c"].sum()
    threshold = max(2.0, frac * total / max(1, num_buckets))
    hot = per_key[per_key >= threshold]
    return hot.nlargest(max_keys).index.tolist()


def hash_join(left_ds, right_ds, *, on: list[str], num_buckets: int = 32,
              how: str = "inner", hot_keys: list | str | None = None,
              num_salts: int = 8):
    """Join two Datasets on equality keys ``on``; column sets must be
    disjoint apart from the keys (standard star-schema usage).

    **Skew handling (salted split)**: pass ``hot_keys`` (values of the
    single join key that are known/measured hot) — or ``"auto"`` to
    measure them with :func:`detect_hot_keys` (one extra column-pruned
    pass over the left side) — and the LEFT (large)
    side's hot rows are sprayed across ``num_salts`` sub-buckets while
    the RIGHT side's matching rows are replicated into every sub-bucket
    — the classic salted-replicate join. A hot key's group shrinks from
    |left_hot| to |left_hot|/num_salts rows; the replication cost is
    |right_hot| × num_salts (keep the small side right). Only valid for
    single-column keys and inner/left/semi/anti joins (replicating the
    right side would duplicate right-only rows under right/outer
    semantics).

    ``how='semi'`` / ``how='anti'`` return the LEFT side's columns for
    rows with ≥1 / 0 key matches on the right — the right side is
    pruned to its key columns before the shuffle, so only keys move."""
    if how in ("semi", "anti"):
        # existence joins never read right payloads: ship keys only,
        # deduplicated per batch to shrink the exchange further.
        # drop_null first: SQL EXISTS/NOT EXISTS never matches NULL
        # keys (pandas merge would match NaN==NaN), so a null-key left
        # row always survives anti and never survives semi
        right_ds = right_ds.select_columns(on).map_batches(
            lambda t: t.drop_null().group_by(on).aggregate([]),
            batch_format="pyarrow")
    if hot_keys is not None:
        if len(on) != 1:
            raise ValueError("salted join supports a single join key")
        if how not in ("inner", "left", "semi", "anti"):
            raise ValueError("salted join supports inner/left/semi/anti "
                             "joins only")
    if isinstance(hot_keys, str):
        if hot_keys != "auto":
            raise ValueError(f"hot_keys must be a list, 'auto', or None, "
                             f"got {hot_keys!r}")
        hot_keys = detect_hot_keys(left_ds, on[0], num_buckets) or None
    return _hash_join_impl(left_ds, right_ds, on=on, num_buckets=num_buckets,
                           how=how, hot_keys=hot_keys, num_salts=num_salts)


def _hash_join_impl(left_ds, right_ds, *, on, num_buckets, how,
                    hot_keys=None, num_salts=8):
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))

    if hot_keys is None:
        lt = left_ds.map_batches(_tag(0, on, num_buckets), batch_format="pyarrow")
        rt = right_ds.map_batches(_tag(1, on, num_buckets), batch_format="pyarrow")
    else:
        key = on[0]
        hot_list = list(hot_keys)

        def tag_left_salted(batch: pa.Table) -> pa.Table:
            limit_worker_threads()
            b = hash_buckets(batch, on, num_buckets)
            vals = np.asarray(batch[key])
            for hi, hk in enumerate(hot_list):
                m = vals == hk
                nm = int(m.sum())
                if nm:
                    # spray the hot key's rows across its salt range
                    b[m] = (num_buckets + hi * num_salts
                            + (np.arange(nm) % num_salts))
            t = batch.append_column(_BUCKET, pa.array(b, pa.int32()))
            return t.append_column(
                _SIDE, pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

        def tag_right_salted(batch: pa.Table) -> pa.Table:
            limit_worker_threads()
            b = hash_buckets(batch, on, num_buckets)
            vals = np.asarray(batch[key])
            hot_any = np.zeros(len(vals), dtype=bool)
            idx_parts: list[np.ndarray] = []
            bkt_parts: list[np.ndarray] = []
            for hi, hk in enumerate(hot_list):
                m = vals == hk
                hot_any |= m
                rows = np.flatnonzero(m)
                if len(rows):
                    # replicate matching right rows into EVERY salt bucket
                    idx_parts.append(np.repeat(rows, num_salts))
                    bkt_parts.append(np.tile(
                        num_buckets + hi * num_salts
                        + np.arange(num_salts, dtype=np.int64), len(rows)))
            cold = np.flatnonzero(~hot_any)
            idx = np.concatenate([cold] + idx_parts) if idx_parts else cold
            bkt = np.concatenate([b[cold]] + bkt_parts) if bkt_parts else b[cold]
            t = batch.take(pa.array(idx))
            t = t.append_column(_BUCKET, pa.array(bkt.astype(np.int32)))
            return t.append_column(
                _SIDE, pa.array(np.ones(t.num_rows, dtype=np.int8)))

        lt = left_ds.map_batches(tag_left_salted, batch_format="pyarrow")
        rt = right_ds.map_batches(tag_right_salted, batch_format="pyarrow")

    # pad each side with the other's non-key columns (null) so union has
    # one schema; nulls never survive the merge
    def pad(cols_missing, types):
        def fn(batch: pa.Table) -> pa.Table:
            for c in cols_missing:
                batch = batch.append_column(
                    c, pa.nulls(batch.num_rows, types[c])
                )
            return batch

        return fn

    l_missing = [c for c in right_cols if c not in left_cols]
    r_missing = [c for c in left_cols if c not in right_cols]
    types = {c: right_types[c] for c in l_missing}
    types.update({c: left_types[c] for c in r_missing})
    lt = lt.map_batches(pad(l_missing, types), batch_format="pyarrow")
    rt = rt.map_batches(pad(r_missing, types), batch_format="pyarrow")
    ordered = [_BUCKET, _SIDE] + on + sorted(
        c for c in set(left_cols + right_cols) if c not in on
    )
    lt = lt.select_columns(ordered)
    rt = rt.select_columns(ordered)

    both = lt.union(rt)
    l_payload = [c for c in left_cols if c not in on]
    r_payload = [c for c in right_cols if c not in on]
    all_types = dict(left_types)
    all_types.update(right_types)
    out_schema = pa.schema(
        [pa.field(c, all_types[c]) for c in on + l_payload + r_payload]
    )

    if how in ("semi", "anti"):
        # existence joins emit the left side's columns only
        out_schema = pa.schema(
            [pa.field(c, left_types[c]) for c in on + l_payload]
        )

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        l = g[g[_SIDE] == 0][on + l_payload]
        r = g[g[_SIDE] == 1][on + r_payload]
        if how in ("semi", "anti"):
            m = l.merge(r.drop_duplicates(), on=on, how="left",
                        indicator="__exists")
            keep = m["__exists"] == ("both" if how == "semi" else "left_only")
            out = m.loc[keep, on + l_payload]
            # left rows carry no join-introduced nulls: exact-type cast
            return pa.Table.from_pandas(
                out, preserve_index=False).cast(out_schema)
        # SQL equality never matches NULL keys, pandas merge matches
        # NaN==NaN: drop null-key rows from any side whose unmatched
        # rows are not emitted; sides that keep unmatched rows keep
        # their null-key rows, which then match nothing by construction
        l_null = l[on].isna().any(axis=1)
        r_null = r[on].isna().any(axis=1)
        if how == "inner":
            out = l[~l_null].merge(r[~r_null], on=on, how="inner")
        elif how == "left":
            out = l.merge(r[~r_null], on=on, how="left")
        elif how == "right":
            out = l[~l_null].merge(r, on=on, how="right")
        else:  # full outer: keep both sides' null-key rows unmatched
            out = l.merge(r[~r_null], on=on, how="outer")
            if r_null.any():
                out = pd.concat(
                    [out, r[r_null].reindex(columns=out.columns)],
                    ignore_index=True)
        t = pa.Table.from_pandas(out, preserve_index=False)
        if how == "inner":
            # the null padding upcasts ints to float64 in pandas; restore
            # the exact input types (inner join ⇒ no remaining nulls)
            return t.cast(out_schema)
        # outer-ish joins carry real nulls: restore types only where the
        # cast is lossless (float64 with nulls stays float64)
        return _restore_types(t, out_schema)

    return both.groupby(_BUCKET, num_partitions=num_buckets).map_groups(
        merge_bucket, batch_format="pandas"
    )


def window_join(left_ds, right_ds, *, key_col: str, ts_col: str,
                left_id: str, right_id: str, before_us: int,
                after_us: int = 0, num_buckets: int = 32):
    """Stream-stream windowed equi-join (the click→purchase
    attribution shape): emit every pair of a left row l and right row
    r with ``l.key == r.key`` and ``r.ts ∈ [l.ts − before_us,
    l.ts + after_us]`` (both bounds inclusive — SQL BETWEEN). Returns
    (key, left_id, right_id, gap_us) with gap_us = l.ts − r.ts.

    Scale shape: ONE key-bucketed shuffle per side co-locates each
    key; the per-bucket kernel sorts the right side once by
    (key, ts), finds each left row's window bounds with two
    vectorized ``np.searchsorted`` calls over an int64
    (key, ts)-composite encoding (exact — the encoding is guarded
    against overflow and falls back to per-key-segment searches), and
    expands pairs with the cumsum/arange range trick — no Python loop
    over rows or pairs. Output volume is the true join cardinality;
    as with any window join, a key whose rows all share one window
    produces quadratic pairs — bound the window, not the operator."""

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            limit_worker_threads()
            idc = left_id if side == 0 else right_id
            return pa.table({
                "k": pc.cast(batch[key_col], pa.int64()),
                "ts": pc.cast(batch[ts_col], pa.int64()),
                "rid": pc.cast(batch[idc], pa.int64()),
                "side": pa.array(
                    np.full(batch.num_rows, side, np.int8), pa.int8()),
            })
        return fn

    from kafka_connect_mongo_ray.utils import key_bucketed

    both = (left_ds.map_batches(prep(0), batch_format="pyarrow")
            .union(right_ds.map_batches(prep(1), batch_format="pyarrow")))

    def bucket_kernel(t: pa.Table) -> pa.Table:
        if "__gb" in t.column_names:
            t = t.drop_columns(["__gb"])
        side = np.asarray(t["side"], dtype=np.int8)
        k = np.asarray(t["k"], dtype=np.int64)
        ts = np.asarray(t["ts"], dtype=np.int64)
        rid = np.asarray(t["rid"], dtype=np.int64)
        L, R = side == 0, side == 1
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          left_id: pa.array([], pa.int64()),
                          right_id: pa.array([], pa.int64()),
                          "gap_us": pa.array([], pa.int64())})
        if not (L.any() and R.any()):
            return empty
        rk, rts, rrid = k[R], ts[R], rid[R]
        order = np.lexsort((rts, rk))
        rk, rts, rrid = rk[order], rts[order], rrid[order]
        lk, lts, lrid = k[L], ts[L], rid[L]

        tmin = int(min(rts.min(), lts.min()))
        span = int(max(rts.max(), lts.max())) - tmin + before_us + after_us + 2
        # the guard must bound the key MAGNITUDE on both signs: a large
        # negative key would wrap k*span just as silently as a large
        # positive one and break enc monotonicity
        kmag = max(abs(int(rk.min())), abs(int(rk.max())),
                   abs(int(lk.min())), abs(int(lk.max())))
        if kmag < (1 << 62) // span:
            enc_r = rk * span + (rts - tmin)
            lo = np.searchsorted(enc_r,
                                 lk * span + (lts - tmin - before_us),
                                 side="left")
            hi = np.searchsorted(enc_r,
                                 lk * span + (lts - tmin + after_us),
                                 side="right")
        else:  # composite would overflow int64: per-key-segment bounds
            seg_lo = np.searchsorted(rk, lk, side="left")
            seg_hi = np.searchsorted(rk, lk, side="right")
            lo = np.empty(len(lk), np.int64)
            hi = np.empty(len(lk), np.int64)
            for i in range(len(lk)):
                s, e = seg_lo[i], seg_hi[i]
                lo[i] = s + np.searchsorted(rts[s:e], lts[i] - before_us,
                                            side="left")
                hi[i] = s + np.searchsorted(rts[s:e], lts[i] + after_us,
                                            side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        l_rep = np.repeat(np.arange(len(lk)), counts)
        offs = np.concatenate([[0], np.cumsum(counts)])
        r_idx = (np.arange(total) - np.repeat(offs[:-1], counts)
                 + np.repeat(lo, counts))
        return pa.table({
            key_col: pa.array(lk[l_rep], pa.int64()),
            left_id: pa.array(lrid[l_rep], pa.int64()),
            right_id: pa.array(rrid[r_idx], pa.int64()),
            "gap_us": pa.array(lts[l_rep] - rts[r_idx], pa.int64())})

    return key_bucketed(both, ["k"], num_buckets).map_groups(
        bucket_kernel, batch_format="pyarrow")
