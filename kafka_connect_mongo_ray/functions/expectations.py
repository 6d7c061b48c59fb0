"""Declarative data-quality expectations over Ray Datasets.

A 100 TB ingest pipeline needs a validation pass before data is
admitted: null/range/domain checks on every row, primary-key
uniqueness, referential integrity against a dimension table. The
reference connector validates per-record shape only (malformed JSON is
skipped and counted — `JSONHandler`, cited at
`src/main/kotlin/org/apache/kafka/connect/mongo/JSONHandler.kt`);
this module generalizes that into a declarative TABLE-level audit that
returns one row per expectation: ``(check_name, n_checked,
n_violations)``.

Execution shape (deliberate, sized for 100 TB):

- all BATCH-LOCAL expectations on one table (not_null / in_range /
  in_set) fuse into a SINGLE ``map_batches`` scan that emits one
  partial-count row per batch; a tiny global ``Sum`` finishes them.
  One streaming pass per table, no shuffle, no driver-side rows.
- ``unique`` is a keys-only exchange: select the column, drop nulls,
  batch-local pre-aggregate to (key, cnt) pairs, one ``groupby`` sum,
  then violations = Σ(cnt−1) via a second tiny Sum. Only the key
  column ever moves.
- ``foreign_key`` is the tagged-union single-shuffle plan (the same
  shape as ``functions/graph.py``): child keys carry (l=cnt, r=0),
  referenced keys carry (l=0, r=1); one ``groupby(key)`` sums both
  tags and a key with ``r == 0`` contributes its ``l`` count to the
  violations. NULL child keys are excluded (SQL referential semantics:
  a NULL FK is not a violation — pair with ``not_null`` to forbid it).

Violation semantics match SQL CHECK constraints: NULL never violates a
range/domain check (``not_null`` is its own expectation), so the audit
composes exactly with the UNION-ALL-of-scalar-aggregates oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Expectation:
    """One declarative check. ``name`` must be unique per audit."""

    name: str
    table: str
    kind: str  # not_null | in_range | in_set | unique | foreign_key
    column: str
    lo: object = None
    hi: object = None
    values: tuple = ()
    ref_table: str | None = None
    ref_column: str | None = None


def not_null(name: str, table: str, column: str) -> Expectation:
    return Expectation(name, table, "not_null", column)


def in_range(name: str, table: str, column: str, lo=None, hi=None) -> Expectation:
    """Violated by non-null values outside the inclusive [lo, hi]
    window (either bound may be None = unbounded)."""
    return Expectation(name, table, "in_range", column, lo=lo, hi=hi)


def in_set(name: str, table: str, column: str, values) -> Expectation:
    """Violated by non-null values outside the allowed domain."""
    return Expectation(name, table, "in_set", column, values=tuple(values))


def unique(name: str, table: str, column: str) -> Expectation:
    """Violations = non-null rows beyond the first per key
    (``COUNT(col) - COUNT(DISTINCT col)``)."""
    return Expectation(name, table, "unique", column)


def foreign_key(name: str, table: str, column: str,
                ref_table: str, ref_column: str) -> Expectation:
    """Violations = non-null child keys with no match in the
    referenced column (NOT EXISTS semantics)."""
    return Expectation(name, table, "foreign_key", column,
                       ref_table=ref_table, ref_column=ref_column)


_KIND_EXTRA_REQUIRED = {
    "not_null": (),
    "in_range": (),
    "in_set": ("values",),
    "unique": (),
    "foreign_key": ("ref_table", "ref_column"),
}


def expectation_from_dict(d: dict) -> Expectation:
    """Validate and build an :class:`Expectation` from one JSON spec
    entry — the config-driven surface behind the ``dq`` CLI. Fails
    fast on a typo'd kind or a missing field, the same posture the
    reference takes for connector configs (cited in ``config.py``:
    `MongoSourceConnector.kt:43-60`)."""
    kind = d.get("kind")
    if kind not in _KIND_EXTRA_REQUIRED:
        raise ValueError(
            f"unknown expectation kind {kind!r} (one of "
            f"{sorted(_KIND_EXTRA_REQUIRED)})")
    missing = [k for k in ("name", "table", "column")
               + _KIND_EXTRA_REQUIRED[kind] if not d.get(k)]
    if missing:
        raise ValueError(f"expectation {d.get('name') or d!r}: "
                         f"missing field(s) {missing}")
    if kind == "in_range" and d.get("lo") is None and d.get("hi") is None:
        raise ValueError(
            f"expectation {d['name']}: in_range needs lo and/or hi")
    return Expectation(
        name=d["name"], table=d["table"], kind=kind, column=d["column"],
        lo=d.get("lo"), hi=d.get("hi"), values=tuple(d.get("values", ())),
        ref_table=d.get("ref_table"), ref_column=d.get("ref_column"))


def _batch_local_partial(exps):
    """Compile one table's batch-local expectations into a single
    vectorized per-batch partial: one output row with a violation
    count per expectation plus the batch row count."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {"__rows": pa.array([batch.num_rows], pa.int64())}
        for i, e in enumerate(exps):
            col = batch[e.column]
            if e.kind == "not_null":
                n = batch.num_rows - pc.sum(pc.is_valid(col)).as_py()
            elif e.kind == "in_range":
                bad = None
                if e.lo is not None:
                    bad = pc.less(col, pa.scalar(e.lo))
                if e.hi is not None:
                    over = pc.greater(col, pa.scalar(e.hi))
                    bad = over if bad is None else pc.or_(bad, over)
                # comparisons propagate null; nulls never violate range
                n = 0 if bad is None else (pc.sum(bad).as_py() or 0)
            elif e.kind == "in_set":
                ok = pc.is_in(col, value_set=pa.array(list(e.values)))
                bad = pc.and_(pc.is_valid(col), pc.invert(ok))
                n = pc.sum(bad).as_py() or 0
            else:  # pragma: no cover - filtered by caller
                raise ValueError(e.kind)
            out[f"__v{i}"] = pa.array([int(n)], pa.int64())
        return pa.table(out)

    return partial


def _unique_counts(ds, column: str):
    """(n_checked, n_violations) for a uniqueness expectation — a
    keys-only exchange with batch-local pre-aggregation."""
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        keys = batch[column].filter(pc.is_valid(batch[column]))
        g = pa.table({column: keys}).group_by(column).aggregate([([], "count_all")])
        return pa.table({column: g[column],
                         "__c": pc.cast(g["count_all"], pa.int64())})

    per_key = (ds.map_batches(pre, batch_format="pyarrow")
               .groupby(column).aggregate(Sum("__c", alias_name="__c")))

    def fin(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch["__c"], pa.int64())
        total = pc.sum(c).as_py() or 0
        extra = total - batch.num_rows  # Σ(cnt−1) over this batch's keys
        return pa.table({"n": pa.array([total], pa.int64()),
                         "v": pa.array([extra], pa.int64())})

    row = per_key.map_batches(fin, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("v", alias_name="v"))
    return int(row["n"] or 0), int(row["v"] or 0)


def _foreign_key_counts(ds, column, ref_ds, ref_column):
    """(n_checked, n_violations) for a referential expectation — a
    tagged keys-only union into ONE groupby (no join operator).
    Comparison happens in the CHILD column's native type (string FK
    columns are legal for this declarative API); the referenced side
    is cast to it when the two differ — an impossible cast (e.g.
    non-numeric strings → int) raises a clear config error."""
    from ray.data.aggregate import Sum

    child_schema = ds.schema(fetch_if_missing=True)
    ktype = dict(zip(child_schema.names, child_schema.types))[column]

    def child(batch: pa.Table) -> pa.Table:
        keys = batch[column].filter(pc.is_valid(batch[column]))
        g = pa.table({"__k": keys}).group_by("__k").aggregate([([], "count_all")])
        return pa.table({"__k": g["__k"],
                         "__l": pc.cast(g["count_all"], pa.int64()),
                         "__r": pa.array([0] * g.num_rows, pa.int64())})

    def ref(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch[ref_column].filter(
            pc.is_valid(batch[ref_column])))
        if keys.type != ktype:
            try:
                keys = pc.cast(keys, ktype)
            except pa.ArrowInvalid as e:
                raise ValueError(
                    f"foreign_key: referenced column {ref_column!r} "
                    f"({keys.type}) is not castable to the child "
                    f"column {column!r}'s type ({ktype})") from e
        return pa.table({"__k": keys,
                         "__l": pa.array([0] * len(keys), pa.int64()),
                         "__r": pa.array([1] * len(keys), pa.int64())})

    tagged = ds.map_batches(child, batch_format="pyarrow").union(
        ref_ds.map_batches(ref, batch_format="pyarrow"))
    per_key = tagged.groupby("__k").aggregate(
        Sum("__l", alias_name="__l"), Sum("__r", alias_name="__r"))

    def fin(batch: pa.Table) -> pa.Table:
        l = pc.cast(batch["__l"], pa.int64())
        r = pc.cast(batch["__r"], pa.int64())
        total = pc.sum(l).as_py() or 0
        viol = pc.sum(pc.if_else(pc.equal(r, 0), l,
                                 pa.scalar(0, pa.int64()))).as_py() or 0
        return pa.table({"n": pa.array([total], pa.int64()),
                         "v": pa.array([viol], pa.int64())})

    row = per_key.map_batches(fin, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("v", alias_name="v"))
    return int(row["n"] or 0), int(row["v"] or 0)


def run_expectations(datasets: dict, expectations) -> pa.Table:
    """Audit ``expectations`` against ``datasets`` (table name →
    ``ray.data.Dataset``). Returns an Arrow table ``(check_name,
    n_checked, n_violations)`` sorted by check name — dimension-sized
    (one row per expectation), never fact-sized."""
    from ray.data.aggregate import Sum

    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")

    results: dict[str, tuple[int, int]] = {}

    by_table: dict[str, list[Expectation]] = {}
    for e in expectations:
        if e.kind in ("not_null", "in_range", "in_set"):
            by_table.setdefault(e.table, []).append(e)

    for table, exps in by_table.items():
        row = (datasets[table]
               .map_batches(_batch_local_partial(exps), batch_format="pyarrow")
               .aggregate(Sum("__rows", alias_name="__rows"),
                          *[Sum(f"__v{i}", alias_name=f"__v{i}")
                            for i in range(len(exps))]))
        n = int(row["__rows"] or 0)
        for i, e in enumerate(exps):
            results[e.name] = (n, int(row[f"__v{i}"] or 0))

    for e in expectations:
        if e.kind == "unique":
            results[e.name] = _unique_counts(datasets[e.table], e.column)
        elif e.kind == "foreign_key":
            results[e.name] = _foreign_key_counts(
                datasets[e.table], e.column,
                datasets[e.ref_table], e.ref_column)

    ordered = sorted(results)
    return pa.table({
        "check_name": pa.array(ordered, pa.string()),
        "n_checked": pa.array([results[k][0] for k in ordered], pa.int64()),
        "n_violations": pa.array([results[k][1] for k in ordered], pa.int64()),
    })
