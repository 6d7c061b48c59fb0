"""Canonical Arrow schemas for the engine.

Data model derives from the reference's flat change-event record
("basic schema", ``AbstractMongoSourceTask.kt:85-91``): ``{ts, inc,
id, database, op, object}`` with key = stringified ``_id``
(``AbstractMongoSourceTask.kt:103-116``) and ``object = null`` as the
delete tombstone (``AbstractMongoSourceTask.kt:174-178``). Our key is
the pair ``(repo, path)`` and the row image is the structured columns
``(commit, lang, content)`` with ``content IS NULL ⇔ tombstone``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input table (BASELINE.json input_hint): source-code repository files.
REPO_FILE_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]
)

# ---------------------------------------------------------------------------
# Change-event table (the oplog analog, FIXTURES.md F2).
#
#   ts   — epoch seconds, monotone non-decreasing per partition
#          (reference: BsonTimestamp.time, MongoSourceOffset.kt:31-33)
#   inc  — same-second sequence number (BsonTimestamp.inc)
#   op   — i / u / d (OplogReader.kt:137-141 filter)
#   content NULL ⇔ tombstone (AbstractMongoSourceTask.kt:174-175)
#   partition_id — generator shard = unit of checkpointing
#          (reference partition key {"mongo": "db.collection"},
#           AbstractMongoSourceTask.kt:137-139)
CHANGE_EVENT_SCHEMA = pa.schema(
    [
        pa.field("ts", pa.int64()),
        pa.field("inc", pa.int32()),
        pa.field("op", pa.string()),
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
        pa.field("partition_id", pa.int32()),
    ]
)

# Columns added by the normalize stage (T2/T3/T4 in SURVEY.md §2.2).
NORMALIZED_EXTRA_FIELDS = [
    pa.field("bucket", pa.int32()),  # hash((repo,path)) % num_buckets
    pa.field("op_rank", pa.int8()),  # i=0 < u=1 < d=2 — LWW tie-break rank
    pa.field("resume_token", pa.string()),
]

NORMALIZED_EVENT_SCHEMA = pa.schema(
    list(CHANGE_EVENT_SCHEMA) + NORMALIZED_EXTRA_FIELDS
)

# Final snapshot row: the surviving full image per key + its version.
SNAPSHOT_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
        pa.field("ts", pa.int64()),
        pa.field("inc", pa.int32()),
        pa.field("op_rank", pa.int8()),
    ]
)

OPS = ("i", "u", "d")
OP_RANK = {"i": 0, "u": 1, "d": 2}


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
