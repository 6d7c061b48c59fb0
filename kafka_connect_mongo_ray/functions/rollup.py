"""Hierarchical ROLLUP aggregation (GROUP BY ROLLUP(k1, k2, ...)).

The reference has no group-by at all (its reduction is the sink upsert,
``sink/MongoSinkTask.kt:34-90``); a lake engine needs the OLAP rollup
family. The distributed shape matters more than the operator: only the
FINEST level touches fact-sized data (per-batch partial pre-aggregation
followed by one ``groupby`` shuffle). Every coarser level re-aggregates
the finest aggregate — dimension-sized data, materialized once — so a
rollup over N fact rows costs exactly one fact-sized exchange no matter
how many levels the key hierarchy has.

Rolled-up key columns are filled with caller-supplied sentinels instead
of SQL's NULL markers: the output stays join-able and deterministic
without a GROUPING() side channel (mirror the sentinels with COALESCE
in any SQL oracle).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["rollup_aggregate", "pivot_counts", "melt"]


def _cat_name(c) -> str:
    """Stable string label for a pivot category; NULL categories (None
    or NaN group keys out of pandas) all label as ``"None"``."""
    import pandas as pd

    if c is None or (not isinstance(c, (str, bytes)) and pd.isna(c)):
        return "None"
    return str(c)


def _arrow_type(t) -> pa.DataType:
    # pandas-block datasets report numpy dtypes; object means string
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def melt(ds, *, key: str, value_cols: list[str], var_col: str = "variable",
         value_col: str = "value", var_names: dict | None = None,
         drop_zero: bool = False):
    """Unpivot — the inverse reshaping of :func:`pivot_counts`: each
    input row becomes one output row per entry of ``value_cols``
    (key, variable, value). Embarrassingly parallel ``map_batches``
    (no shuffle: long form preserves the input partitioning).
    ``var_names`` optionally maps column name → emitted variable label;
    ``drop_zero`` drops zero-valued cells (pivot fill)."""
    import numpy as np

    names = [str((var_names or {}).get(c, c)) for c in value_cols]

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch[key]
        key_idx = pa.array(np.tile(np.arange(n, dtype=np.int64),
                                   len(value_cols)))
        var = pa.array(np.repeat(np.asarray(names, dtype=object), n))
        vals = pa.concat_arrays([
            batch[c].combine_chunks().cast(pa.int64())
            for c in value_cols])
        out = pa.table({key: keys.take(key_idx), var_col: var,
                        value_col: vals})
        if drop_zero:
            out = out.filter(pa.compute.not_equal(out[value_col], 0))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def pivot_counts(ds, *, key: str, pivot_col: str, categories: list | None = None,
                 prefix: str = "", num_partitions: int | None = None):
    """Wide reshaping: one row per ``key`` with one count column per
    ``pivot_col`` category (PIVOT ... USING COUNT(*)). If ``categories``
    is None they are discovered with a distinct pass — the category set
    is dimension-sized by definition (it becomes the output schema), so
    the driver-side list is bounded by design.

    Shuffle volume is keys × categories partial rows, never fact-sized:
    each batch pre-aggregates to its local (key → per-category counts)
    before the one groupby."""
    from ray.data.aggregate import Count, Sum

    key_type = _arrow_type(
        dict(zip(ds.schema().names, ds.schema().types))[key])

    if categories is None:
        cats_rows = (ds.select_columns([pivot_col])
                     .groupby(pivot_col).aggregate(Count()).take_all())
        # None sorts last; everything else by its string form so the
        # discovered column order is deterministic even for mixed types
        categories = sorted((r[pivot_col] for r in cats_rows),
                            key=lambda v: (v is None, str(v)))
    cats = list(categories)
    cat_labels = [_cat_name(c) for c in cats]
    if len(set(cat_labels)) != len(cat_labels):
        # e.g. a NULL category alongside the literal string "None", or
        # int 1 alongside "1": their count columns would collide —
        # fail loudly here instead of deep inside every partial task
        dupes = sorted({l for l in cat_labels if cat_labels.count(l) > 1})
        raise ValueError(
            f"pivot categories collide after labeling: {dupes} — "
            f"disambiguate the pivot column upstream (e.g. cast or "
            f"fill nulls) or pass explicit distinct categories")
    col_names = [f"{prefix}{lbl}" for lbl in cat_labels]

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        df = pd.DataFrame({key: batch[key].to_pandas(),
                           "_c": batch[pivot_col].to_pandas()})
        # dropna=False keeps NULL-key rows in their own group (SQL
        # GROUP BY semantics); null CATEGORIES surface as the "None"
        # count column via the same labeling as the discovery pass
        wide = (df.groupby([key, "_c"], dropna=False).size()
                .unstack(fill_value=0))
        wide.columns = [_cat_name(c) for c in wide.columns]
        wide = wide.reindex(columns=cat_labels, fill_value=0)
        keys_out = [None if pd.isna(v) else v
                    for v in wide.index.to_numpy(dtype=object)]
        cols = {key: pa.array(keys_out, key_type)}
        cols.update({name: pa.array(wide[lbl].to_numpy(dtype=np.int64),
                                    pa.int64())
                     for lbl, name in zip(cat_labels, col_names)})
        return pa.table(cols)

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key, **kwargs)
            .aggregate(*[Sum(n, alias_name=n) for n in col_names]))


def _partial(keys: list[str], sum_cols: list[str], count_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        # pure-Arrow batch-local combine; Arrow group_by keeps NULL-key
        # groups natively (SQL GROUP BY semantics — the grand total
        # must equal COUNT(*)), and Ray's groupby downstream keeps
        # them too, so null keys flow through every level
        g = batch.group_by(keys).aggregate(
            [([], "count_all")] + [(c, "sum") for c in sum_cols])
        return g.rename_columns(keys + [count_col] + sum_cols)

    return fn


def rollup_aggregate(ds, *, keys: list[str], sum_cols: list[str],
                     count_col: str = "n", sentinels: dict | None = None,
                     num_partitions: int | None = None,
                     mode: str = "rollup",
                     grouping_sets: list[list[str]] | None = None):
    """COUNT(*) + SUM(sum_cols) at every ROLLUP level of ``keys``
    (finest → grand total), at every subset with ``mode="cube"``, or
    at exactly the listed subsets with ``grouping_sets`` (SQL GROUP BY
    GROUPING SETS — e.g. two marginals without the cross product; each
    set must be a subset of ``keys``; the full key set is included
    only if listed). Sum columns must be integers or otherwise
    order-independent under addition — levels are sums of partial
    sums. Whatever the level list, the plan shape is the same: ONE
    fact-sized exchange at the finest level, then one dimension-sized
    exchange for all other levels together.

    ``sentinels`` maps key column → fill value for levels where that
    key is rolled up (defaults: ``"ALL"`` for strings, ``-1`` for
    numerics). Rows whose key value is genuinely NULL form their own
    group at every level they survive to (SQL GROUP BY semantics) and
    stay distinct from the rolled-up sentinel — cleaner than SQL's
    NULL-marker ROLLUP, which needs GROUPING() to tell them apart."""
    from ray.data.aggregate import Sum

    sentinels = dict(sentinels or {})
    schema = ds.schema()
    types = {n: _arrow_type(t) for n, t in zip(schema.names, schema.types)}
    for k in keys:
        if k not in sentinels:
            sentinels[k] = "ALL" if pa.types.is_string(types[k]) else -1

    kwargs = {"num_partitions": num_partitions} if num_partitions else {}
    measures = [count_col] + sum_cols
    sums = [Sum(c, alias_name=c) for c in measures]

    # ONE fact-sized exchange: batch-local pre-aggregation, then the
    # finest-level groupby; materialized because the coarser levels
    # re-read it (it is dimension-sized by construction)
    finest = ds.map_batches(
        _partial(keys, sum_cols, count_col), batch_format="pyarrow"
    ).groupby(keys, **kwargs).aggregate(*sums).materialize()

    include_finest = True
    empty_result = False
    if grouping_sets is not None:
        norm = []
        for s in grouping_sets:
            extra = set(s) - set(keys)
            if extra:
                raise ValueError(f"grouping set {s} has non-key columns "
                                 f"{sorted(extra)}")
            norm.append([k for k in keys if k in set(s)])
        # SQL emits a duplicated set as a second copy of the level; the
        # explode-then-one-groupby plan would instead MERGE the copies
        # and double every measure — refuse loudly rather than be
        # silently wrong (order variants normalize to the same set)
        seen = set()
        for s in norm:
            t = tuple(s)
            if t in seen:
                raise ValueError(
                    f"duplicate grouping set {list(s)}: this plan "
                    f"collapses levels by sentinel pattern and cannot "
                    f"emit a level twice — deduplicate the sets")
            seen.add(t)
        include_finest = any(set(s) == set(keys) for s in norm)
        keysets = [s for s in norm if set(s) != set(keys)]
        empty_result = not norm
    elif mode == "rollup":
        keysets = [keys[:depth] for depth in range(len(keys) - 1, -1, -1)]
    elif mode == "cube":
        from itertools import combinations

        keysets = [list(c)
                   for r in range(len(keys) - 1, -1, -1)
                   for c in combinations(keys, r)]
    else:
        raise ValueError(f"mode must be 'rollup' or 'cube', got {mode!r}")

    out_cols = keys + measures

    # ALL coarser levels in ONE dimension-sized exchange: each finest
    # row is emitted once per keyset with its rolled-up keys already
    # sentineled, then a single groupby over the full key tuple
    # collapses every level at once (the sentinel pattern itself
    # identifies the level, so levels cannot merge — sentinels are
    # distinct from real key values by contract). This replaces one
    # all-to-all PER level (K groupbys + a K-branch union chain whose
    # per-operator fixed costs dominated gate-scale runs) with exactly
    # one, at a shuffle volume of |keysets| x dimension rows.
    def explode(batch: pa.Table) -> pa.Table:
        batch = batch.select(out_cols)
        parts = []
        for kept in keysets:
            t = batch
            for c in keys:
                if c not in kept:
                    t = t.set_column(
                        t.column_names.index(c), c,
                        pa.array([sentinels[c]] * t.num_rows, types[c]))
            parts.append(t)
        return pa.concat_tables(parts)

    if empty_result:
        # GROUPING SETS () of nothing: zero rows, stable schema
        return finest.select_columns(out_cols).limit(0)
    if not keysets:
        return finest.select_columns(out_cols)
    coarser = (finest.map_batches(explode, batch_format="pyarrow")
               .groupby(keys, **kwargs).aggregate(*sums)
               .map_batches(lambda t: t.select(out_cols),
                            batch_format="pyarrow"))
    if not include_finest:
        return coarser
    return finest.select_columns(out_cols).union(coarser)
