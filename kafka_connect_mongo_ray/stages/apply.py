"""Last-writer-wins reduce and the merge-apply stage.

The reference's only reduction is the sink's idempotent bulk apply
(``sink/MongoSinkTask.kt:34-90``): group records by namespace, turn
``object == null`` into a delete and everything else into an
``UpdateOneModel(_id, {$set: doc}, upsert=true)``, ordered bulkWrite ⇒
last writer wins within a batch, convergence under at-least-once
replay (``MongoSinkTaskTest.kt:92-117``).

Re-expressed Ray-Data-first as a key-grouped order-insensitive reduce:
LWW by the total order ``(ts, inc, op_rank, sha256(content))`` is
commutative and associative, so it splits into a **partial per-batch
pre-reduce** (this module, stateless ``map_batches``) followed by a
**final per-bucket merge** — the salted/partial-then-final answer to
hot keys (SURVEY.md §4): shuffle volume is bounded by distinct keys
per batch, not by event count.

Everything here is vectorized Arrow: sort_by + dictionary-encoded key
boundary detection; the sha256 tie-break runs only on the (rare) rows
that tie on ``(key, ts, inc, op_rank)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA
from kafka_connect_mongo_ray.utils import key_strings

_SORT_KEYS = [
    ("repo", "ascending"),
    ("path", "ascending"),
    ("ts", "ascending"),
    ("inc", "ascending"),
    ("op_rank", "ascending"),
]

# Sentinel op_rank for in-band per-partition resume-token rows (see
# normalize.py); they bypass the LWW reduce.
TOKEN_OP_RANK = -1


def _sha_hex(content) -> str:
    return "" if content is None else hashlib.sha256(content.encode()).hexdigest()


def lww_reduce(table: pa.Table) -> pa.Table:
    """Winner row per (repo, path) under (ts, inc, op_rank, sha256(content)).

    Output is sorted by (repo, path) — the canonical snapshot row
    order required for byte-stable Parquet (SURVEY.md §7.4).
    """
    if table.num_rows == 0:
        return table
    t = table.sort_by(_SORT_KEYS)
    keys = key_strings(t, ["repo", "path"])
    kidx = np.asarray(pc.dictionary_encode(keys).indices)
    n = len(kidx)
    last = np.ones(n, dtype=bool)
    last[:-1] = kidx[:-1] != kidx[1:]
    winners = np.flatnonzero(last)

    # Tie detection: winner's predecessor has the same key AND the same
    # (ts, inc, op_rank) — resolve by max sha256(content) hex
    # (FIXTURES.md §Oracle tie-break; the reference leaves this
    # undefined — ordered bulk arrival order wins — so we define it
    # deterministically and the oracle uses the same rule).
    ts = np.asarray(t["ts"])
    inc = np.asarray(t["inc"])
    opr = np.asarray(t["op_rank"])
    w = winners[winners > 0]
    tied = w[
        (kidx[w - 1] == kidx[w])
        & (ts[w - 1] == ts[w])
        & (inc[w - 1] == inc[w])
        & (opr[w - 1] == opr[w])
    ]
    if len(tied):
        content = t["content"]
        resolved = {}
        for i in tied.tolist():
            j = i
            cands = [i]
            while (
                j > 0
                and kidx[j - 1] == kidx[i]
                and ts[j - 1] == ts[i]
                and inc[j - 1] == inc[i]
                and opr[j - 1] == opr[i]
            ):
                j -= 1
                cands.append(j)
            best = max(cands, key=lambda r: _sha_hex(content[r].as_py()))
            resolved[i] = best
        winners = np.array([resolved.get(int(i), int(i)) for i in winners], dtype=np.int64)
    return t.take(winners)


def partial_lww(batch: pa.Table) -> pa.Table:
    """Per-batch pre-reduce: one surviving event per key per batch.

    Keeps the ``bucket`` column for the downstream shuffle. Token rows
    (``op_rank == TOKEN_OP_RANK``) pass through reduced to their
    per-partition max.
    """
    if batch.num_rows == 0:
        return batch
    is_token = pc.equal(batch["op_rank"], pa.scalar(TOKEN_OP_RANK, pa.int8()))
    if pc.any(is_token).as_py():
        tokens = batch.filter(is_token)
        events = batch.filter(pc.invert(is_token))
        tokens = _reduce_tokens(tokens)
        return pa.concat_tables([lww_reduce(events), tokens])
    return lww_reduce(batch)


def _reduce_tokens(tokens: pa.Table) -> pa.Table:
    """Max (ts, inc) per partition among token rows (path = partition id)."""
    t = tokens.sort_by([("path", "ascending"), ("ts", "ascending"), ("inc", "ascending")])
    pidx = np.asarray(pc.dictionary_encode(t["path"].combine_chunks()).indices)
    last = np.ones(len(pidx), dtype=bool)
    last[:-1] = pidx[:-1] != pidx[1:]
    return t.take(np.flatnonzero(last))


def split_tokens(group: pa.Table) -> tuple[pa.Table, pa.Table]:
    is_token = pc.equal(group["op_rank"], pa.scalar(TOKEN_OP_RANK, pa.int8()))
    return group.filter(pc.invert(is_token)), group.filter(is_token)


_NUMERIC_WIDEN = {
    pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3,
    pa.float32(): 4, pa.float64(): 5,
}


def unify_payload_schemas(old: pa.Schema, new: pa.Schema) -> pa.Schema:
    """Arrow re-expression of the reference's evolution contract
    (``SchemaMapper.kt:199-235``, SURVEY.md §1.4):

    - new field → nullable add;
    - numeric vs numeric → widen (int up to int64, any float → float64,
      mirroring everything-numeric→float64 at ``SchemaMapper.kt:173``);
    - any other conflict → OLD type wins (values that can't cast are
      nulled by ``conform_table``);
    - canonical order: old fields keep their position, added fields
      appended sorted by name (deterministic output).
    """
    fields = {f.name: f.type for f in old}
    added = []
    for f in new:
        if f.name not in fields:
            added.append(f.name)
            fields[f.name] = f.type
            continue
        cur = fields[f.name]
        if cur.equals(f.type):
            continue
        if cur in _NUMERIC_WIDEN and f.type in _NUMERIC_WIDEN:
            mx = max(_NUMERIC_WIDEN[cur], _NUMERIC_WIDEN[f.type])
            # mixed int/float always widens to float64
            if (cur in _NUMERIC_WIDEN and f.type in _NUMERIC_WIDEN
                    and ((_NUMERIC_WIDEN[cur] >= 4) != (_NUMERIC_WIDEN[f.type] >= 4))):
                fields[f.name] = pa.float64()
            else:
                fields[f.name] = [t for t, r in _NUMERIC_WIDEN.items() if r == mx][0]
        # else: old type wins (fields[f.name] already = cur)
    names = [f.name for f in old] + sorted(added)
    return pa.schema([pa.field(n, fields[n]) for n in names])


def conform_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: missing columns → nulls (nullable
    add); castable type changes cast; uncastable conflicts → the whole
    column nulls for this batch (the reference nulls each unconvertible
    value, ``SchemaMapper.kt:137-162`` — Arrow columns are homogeneous,
    so per-batch column nulling is the exact vectorized equivalent)."""
    cols = []
    for f in target:
        if f.name not in table.column_names:
            cols.append(pa.nulls(table.num_rows, f.type))
            continue
        col = table[f.name]
        if col.type.equals(f.type):
            cols.append(col)
            continue
        try:
            cols.append(pc.cast(col, f.type))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            cols.append(pa.nulls(table.num_rows, f.type))
    return pa.table(dict(zip(target.names, cols)), schema=target)


def concat_with_evolution(tables: list[pa.Table]) -> pa.Table:
    """Concat batches whose payload schemas evolved (driver-side helper
    for reading mixed-schema snapshot buckets)."""
    tables = [t for t in tables if t is not None]
    if not tables:
        return SNAPSHOT_SCHEMA.empty_table()
    target = tables[0].schema
    for t in tables[1:]:
        target = unify_payload_schemas(target, t.schema)
    return pa.concat_tables([conform_table(t, target) for t in tables])


def merge_with_snapshot(events: pa.Table, prev_state: pa.Table | None) -> pa.Table:
    """Final merge for one bucket: previous snapshot rows are replayed
    as events at their stored version — LWW decides, so re-applying an
    already-applied event is a no-op (idempotence) and a stale event
    never overwrites a newer stored row or tombstone (the reorder
    tolerance the reference only gets from single-threaded per-ns
    order, SURVEY.md §2.9).

    Tombstones are KEPT in the snapshot (content null, op_rank 2) so
    that a late event older than the delete cannot resurrect the key;
    they are filtered out only in the exported final-state view.

    Payload schema evolution happens HERE: extra event columns beyond
    the canonical set become nullable-added snapshot columns; numeric
    type changes widen; other conflicts keep the stored (old) type and
    null the unconvertible batch (§1.4 contract).
    """
    base = set(SNAPSHOT_SCHEMA.names)
    extras = sorted(c for c in events.column_names if c not in base and c != "bucket")
    ev_schema = pa.schema(
        list(SNAPSHOT_SCHEMA)
        + [pa.field(c, events.schema.field(c).type) for c in extras]
    )
    ev = conform_table(events, ev_schema)
    if prev_state is not None and prev_state.num_rows:
        if "bucket" in prev_state.column_names:
            prev_state = prev_state.drop_columns(["bucket"])
        target = unify_payload_schemas(prev_state.schema, ev.schema)
        ev = pa.concat_tables(
            [conform_table(prev_state, target), conform_table(ev, target)]
        )
    return lww_reduce(ev)


def live_rows(state: pa.Table) -> pa.Table:
    """Final-state view: tombstones dropped."""
    return state.filter(pc.invert(pc.and_(
        pc.equal(state["op_rank"], pa.scalar(2, pa.int8())),
        pc.is_null(state["content"]),
    )))
