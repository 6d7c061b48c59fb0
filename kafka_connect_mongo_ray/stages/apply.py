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
    """
    ev = events.select(SNAPSHOT_SCHEMA.names).cast(SNAPSHOT_SCHEMA)
    if prev_state is not None and prev_state.num_rows:
        ev = pa.concat_tables([prev_state.select(SNAPSHOT_SCHEMA.names).cast(SNAPSHOT_SCHEMA), ev])
    return lww_reduce(ev)


def live_rows(state: pa.Table) -> pa.Table:
    """Final-state view: tombstones dropped."""
    return state.filter(pc.invert(pc.and_(
        pc.equal(state["op_rank"], pa.scalar(2, pa.int8())),
        pc.is_null(state["content"]),
    )))
