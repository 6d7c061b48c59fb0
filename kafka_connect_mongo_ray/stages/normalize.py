"""Normalize stage (SURVEY.md §2.2 T1–T4) — stateless, vectorized Arrow.

Mirrors the reference's record formatting path
(``AbstractMongoSourceTask.getBasicStruct``,
``AbstractMongoSourceTask.kt:162-180``) plus the oplog predicate
(``op ∈ {i,u,d}``, ``OplogReader.kt:137-141``) and the offset encoding
(``MongoSourceOffset.toOffsetString``, ``MongoSourceOffset.kt:23-26``):

1. drop rows whose op is not i/u/d;
2. drop rows at or below the per-partition resume token (checkpoint
   filter — the ``ts' > ts`` resume predicate of ``OplogReader.kt:136``);
3. enforce the tombstone invariant (``op='d' ⇔ content null``);
4. attach ``op_rank`` (i<u<d LWW tie rank) and ``bucket``
   (deterministic hash of ``(repo, path)``);
5. emit one in-band token row per (batch, partition) carrying the max
   applied ``(ts, inc)`` so the commit layer learns new resume tokens
   without a second pass over the stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.schema import OPS
from kafka_connect_mongo_ray.stages.apply import TOKEN_OP_RANK
from kafka_connect_mongo_ray.utils import compact_array, hash_buckets

_SHUFFLE_COLS = ["bucket", "repo", "path", "commit", "lang", "content", "ts", "inc", "op_rank"]


def encode_resume_token(ts: int, inc: int, key: str, finished_backfill: bool) -> str:
    """``"{ts},{inc},{key},{1|-1}"`` — format of ``MongoSourceOffset.kt:23-26``."""
    return f"{ts},{inc},{key},{1 if finished_backfill else -1}"


def decode_resume_token(token: str) -> tuple[int, int, str, bool]:
    ts, inc, rest = token.split(",", 2)
    key, fin = rest.rsplit(",", 1)
    return int(ts), int(inc), key, fin == "1"


def normalize_batch(
    batch: pa.Table,
    *,
    num_buckets: int,
    tokens: dict[int, tuple[int, int]] | None = None,
) -> pa.Table:
    """Pure function — see module docstring. Returns shuffle-ready rows."""
    if batch.num_rows == 0:
        return _empty_out()

    # 1. op predicate (OplogReader.kt:137-141) + malformed-record skip:
    #    a row without key, timestamp, inc or a valid partition id
    #    cannot be applied — the reference logs & skips malformed docs
    #    in the poll loop (AbstractMongoSourceTask.kt:118-120). inc and
    #    op nullity are checked explicitly (a null inc would otherwise
    #    poison-pill the token-row emission below on every retry), and
    #    negative partition ids are malformed (they would wrap around
    #    the dense checkpoint LUT and silently borrow another
    #    partition's resume token).
    valid = pc.and_(
        pc.and_(
            pc.is_in(batch["op"], value_set=pa.array(OPS)),
            pc.and_(pc.is_valid(batch["op"]), pc.is_valid(batch["inc"])),
        ),
        pc.and_(
            pc.and_(pc.is_valid(batch["repo"]), pc.is_valid(batch["path"])),
            pc.and_(
                pc.is_valid(batch["ts"]),
                pc.greater_equal(batch["partition_id"], 0),
            ),
        ),
    )
    valid = pc.fill_null(valid, False)
    if not pc.all(valid).as_py():
        batch = batch.filter(valid)
    if batch.num_rows == 0:
        return _empty_out()

    # 2. checkpoint filter: (ts, inc) > token[partition_id] —
    #    vectorized via a dense partition-indexed lookup (a per-token
    #    python loop is O(partitions × rows) and collapses at thousands
    #    of partitions)
    if tokens:
        pid = np.asarray(batch["partition_id"]).astype(np.int64)
        max_p = max(int(pid.max()), max(tokens))
        lut_ts = np.full(max_p + 1, np.iinfo(np.int64).min, dtype=np.int64)
        lut_inc = np.full(max_p + 1, np.iinfo(np.int32).min, dtype=np.int64)
        for p, (t_ts, t_inc) in tokens.items():
            if 0 <= p <= max_p:
                lut_ts[p] = t_ts
                lut_inc[p] = t_inc
        tok_ts = lut_ts[pid]
        tok_inc = lut_inc[pid]
        ts = np.asarray(batch["ts"])
        inc = np.asarray(batch["inc"])
        fresh = (ts > tok_ts) | ((ts == tok_ts) & (inc > tok_inc))
        if not fresh.all():
            batch = batch.filter(pa.array(fresh))
    if batch.num_rows == 0:
        return _empty_out()

    # 3. tombstone invariant: delete ⇒ content null (getBasicStruct's
    #    `object=null`, AbstractMongoSourceTask.kt:174-175).
    # compact_array: pyarrow 16.1 `if_else` corrupts offsets when fed a
    # sliced large_string chunk (as Ray's block slicing produces).
    is_del = pc.equal(batch["op"], "d")
    content = pc.if_else(
        compact_array(pc.cast(is_del, pa.bool_())),
        pa.scalar(None, pa.large_string()),
        compact_array(pc.cast(batch["content"], pa.large_string())),
    )

    # 4. op_rank + bucket
    op_rank = pc.cast(
        pc.index_in(batch["op"], value_set=pa.array(OPS)), pa.int8()
    )
    bucket = pa.array(hash_buckets(batch, ["repo", "path"], num_buckets), pa.int32())

    cols = {
        "bucket": bucket,
        "repo": pc.cast(batch["repo"], pa.string()),
        "path": pc.cast(batch["path"], pa.string()),
        "commit": pc.cast(batch["commit"], pa.string()),
        "lang": pc.cast(batch["lang"], pa.string()),
        "content": content,
        "ts": pc.cast(batch["ts"], pa.int64()),
        "inc": pc.cast(batch["inc"], pa.int32()),
        "op_rank": op_rank,
    }
    # extra payload columns (schema evolution, §1.4) pass through to the
    # merge stage, which nullable-adds / widens them into the snapshot
    from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA

    extras = sorted(c for c in batch.column_names
                    if c not in CHANGE_EVENT_SCHEMA.names and c not in cols)
    for c in extras:
        cols[c] = compact_array(batch[c].combine_chunks()
                                if hasattr(batch[c], "combine_chunks") else batch[c])
    out = pa.table(cols)

    # 5. in-band per-partition token rows (routed to bucket pid % B)
    pid = np.asarray(batch["partition_id"])
    ts = np.asarray(batch["ts"])
    inc = np.asarray(batch["inc"])
    parts, idx = np.unique(pid, return_index=False), None
    tok_rows = []
    for p in parts.tolist():
        m = pid == p
        mts = ts[m]
        top = np.flatnonzero(mts == mts.max())
        j = top[np.argmax(inc[m][top])]
        sel = np.flatnonzero(m)[j]
        tok_rows.append((int(p), int(ts[sel]), int(inc[sel])))
    tok_cols = {
        "bucket": pa.array([p % num_buckets for p, _, _ in tok_rows], pa.int32()),
        "repo": pa.array([""] * len(tok_rows), pa.string()),
        "path": pa.array([str(p) for p, _, _ in tok_rows], pa.string()),
        "commit": pa.array([""] * len(tok_rows), pa.string()),
        "lang": pa.array([""] * len(tok_rows), pa.string()),
        "content": pa.array([None] * len(tok_rows), pa.large_string()),
        "ts": pa.array([t for _, t, _ in tok_rows], pa.int64()),
        "inc": pa.array([i for _, _, i in tok_rows], pa.int32()),
        "op_rank": pa.array([TOKEN_OP_RANK] * len(tok_rows), pa.int8()),
    }
    for c in extras:
        tok_cols[c] = pa.nulls(len(tok_rows), out.schema.field(c).type)
    token_tbl = pa.table(tok_cols)
    return pa.concat_tables([out, token_tbl])


def _empty_out() -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([], pa.int32()),
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.large_string()),
            "ts": pa.array([], pa.int64()),
            "inc": pa.array([], pa.int32()),
            "op_rank": pa.array([], pa.int8()),
        }
    )


