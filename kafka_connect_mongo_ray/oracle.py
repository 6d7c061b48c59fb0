"""Pure-Python single-process replay oracle (FIXTURES.md §Oracle).

Replays change events into a dict keyed by ``(repo, path)`` with
last-writer-wins by the total order ``(ts, inc, op_rank,
sha256(content))`` and tombstone deletes — the semantics of the
reference sink's ordered idempotent bulk upsert
(``sink/MongoSinkTask.kt:34-90``; convergence demonstrated by
``MongoSinkTaskTest.putSubtle`` at ``MongoSinkTaskTest.kt:92-117``).

This is the correctness judge for the engine: final-state equality,
per-row ``content`` sha256, on sorted ``(repo, path)``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from kafka_connect_mongo_ray.schema import OP_RANK, SNAPSHOT_SCHEMA


def _content_tiebreak(content) -> str:
    if content is None:
        return ""
    return hashlib.sha256(content.encode()).hexdigest()


def replay(events: pa.Table, initial: dict | None = None) -> dict:
    """Apply events in arbitrary input order; LWW decides. Returns
    ``{(repo, path): {"version": tuple, "row": dict | None}}`` where
    ``row=None`` means the key was deleted (tombstone won)."""
    state: dict = dict(initial) if initial else {}
    cols = ("ts", "inc", "op", "repo", "path", "commit", "lang", "content")
    data = {c: events[c].to_pylist() for c in cols}
    for i in range(events.num_rows):
        ts, inc, op = data["ts"][i], data["inc"][i], data["op"][i]
        key = (data["repo"][i], data["path"][i])
        content = data["content"][i]
        version = (ts, inc, OP_RANK[op], _content_tiebreak(content))
        cur = state.get(key)
        if cur is not None and cur["version"] >= version:
            continue  # stale event — idempotent replay / reorder tolerance
        if op == "d":
            state[key] = {"version": version, "row": None}
        else:
            state[key] = {
                "version": version,
                "row": {
                    "repo": key[0],
                    "path": key[1],
                    "commit": data["commit"][i],
                    "lang": data["lang"][i],
                    "content": content,
                    "ts": ts,
                    "inc": inc,
                    "op_rank": OP_RANK[op],
                },
            }
    return state


def final_table(state: dict) -> pa.Table:
    """Surviving rows (tombstones dropped), sorted by (repo, path)."""
    rows = [v["row"] for _, v in sorted(state.items()) if v["row"] is not None]
    if not rows:
        return SNAPSHOT_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=SNAPSHOT_SCHEMA)


def content_sha256_map(table: pa.Table) -> dict:
    """{(repo, path): sha256(content)} — the parity check currency."""
    out = {}
    repo = table["repo"].to_pylist()
    path = table["path"].to_pylist()
    content = table["content"].to_pylist()
    for r, p, c in zip(repo, path, content):
        out[(r, p)] = hashlib.sha256((c or "").encode()).hexdigest()
    return out
