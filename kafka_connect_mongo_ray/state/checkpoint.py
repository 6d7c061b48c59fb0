"""Per-partition resume-token checkpoints (reference §1.6 semantics).

The reference stores one offset string
``"{ts},{inc},{objectId},{finishedImport}"`` per partition key
``{"mongo": "db.collection"}`` in Kafka Connect's offset topic
(``MongoSourceOffset.kt:15-43``, ``AbstractMongoSourceTask.kt:137-139``)
and on restart resumes the snapshot scan from ``_id > objectId`` or
the tail from ``ts' > ts``.

Ours: the authoritative tokens live inside the committed snapshot
manifest (single atomic visibility event — see snapshot.py); this
module mirrors them to one human-readable JSON file per partition
under ``checkpoint_dir`` (the ST5 analog) and implements the merge of
old and new tokens.
"""

from __future__ import annotations

import os

from kafka_connect_mongo_ray.stages.normalize import encode_resume_token
from kafka_connect_mongo_ray.utils import atomic_write_json, read_json


def merge_tokens(
    old: dict[int, tuple[int, int]], new: dict[int, tuple[int, int]]
) -> dict[int, tuple[int, int]]:
    out = dict(old)
    for p, v in new.items():
        cur = out.get(p)
        out[p] = v if cur is None or tuple(v) > tuple(cur) else cur
    return out


def mirror_checkpoints(
    checkpoint_dir: str,
    tokens: dict[int, tuple[int, int]],
    *,
    version: int,
    finished_backfill: bool = True,
) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    for p, (ts, inc) in tokens.items():
        atomic_write_json(
            os.path.join(checkpoint_dir, f"partition={p}.json"),
            {
                "partition": p,
                "ts": ts,
                "inc": inc,
                "token": encode_resume_token(ts, inc, f"partition-{p}", finished_backfill),
                "snapshot_version": version,
            },
        )


def load_checkpoints(checkpoint_dir: str) -> dict[int, tuple[int, int]]:
    if not os.path.isdir(checkpoint_dir):
        return {}
    out: dict[int, tuple[int, int]] = {}
    for f in os.listdir(checkpoint_dir):
        if f.startswith("partition=") and f.endswith(".json"):
            obj = read_json(os.path.join(checkpoint_dir, f))
            if obj:
                out[int(obj["partition"])] = (obj["ts"], obj["inc"])
    return out
