"""Version diff — the read side of CDC: the change feed BETWEEN two
committed snapshot versions (what a downstream incremental consumer
reads instead of rescanning the table).

Distributed per bucket: one task per bucket id reads that bucket in
both manifests (COW means unchanged buckets point at the SAME file —
detected by path equality and skipped without reading a byte) and
emits the per-key changes: op 'i' (key appeared), 'u' (version
advanced), 'd' (tombstone appeared).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

DIFF_SCHEMA = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("content", pa.large_string()),
        pa.field("ts", pa.int64()),
        pa.field("inc", pa.int32()),
    ]
)

# with include_old=True: the PRE-image content (null for 'i') — what an
# incremental aggregate maintainer needs to retract (state/ivm.py)
DIFF_SCHEMA_OLD = DIFF_SCHEMA.append(pa.field("content_old",
                                              pa.large_string()))


def _bucket_rels(store: SnapshotStore, version: int) -> dict[str, list[str]]:
    m = store.manifest(version)
    if not m:
        return {}
    return {b: ([r] if isinstance(r, str) else r) for b, r in m["buckets"].items()}


def _diff_schema(include_old: bool,
                 attr_cols: list[str] | None = None) -> pa.Schema:
    schema = DIFF_SCHEMA_OLD if include_old else DIFF_SCHEMA
    for a in attr_cols or []:
        schema = schema.append(pa.field(a, pa.string()))
        if include_old:
            schema = schema.append(pa.field(f"{a}_old", pa.string()))
    return schema


def diff_bucket_tables(old: pa.Table | None, new: pa.Table | None,
                       include_old: bool = False,
                       attr_cols: list[str] | None = None) -> pa.Table:
    """``attr_cols`` carries extra stored attribute columns (cast to
    string) through the diff — post-image always, pre-image as
    ``<col>_old`` when ``include_old`` — so attribute-level consumers
    (the secondary index) see what a changed key's value WAS without a
    second bucket read. The default wire schema is unchanged."""
    attr_cols = list(attr_cols or [])
    cols = ["repo", "path", "ts", "inc", "op_rank", "content"] + attr_cols

    def frame(t):
        if t is None or t.num_rows == 0:
            return pd.DataFrame(columns=cols)
        return t.select(cols).to_pandas()

    o, n = frame(old), frame(new)
    merged = n.merge(o, on=["repo", "path"], how="outer", suffixes=("", "_old"),
                     indicator=True)
    appeared = merged["_merge"] == "left_only"
    both = merged["_merge"] == "both"
    changed = both & (
        (merged["ts"] != merged["ts_old"])
        | (merged["inc"] != merged["inc_old"])
        | (merged["op_rank"] != merged["op_rank_old"])
    )
    keep = merged[appeared | changed]
    is_tomb = (keep["op_rank"] == 2) & keep["content"].isna()
    op = np.where(is_tomb, "d", np.where(appeared[appeared | changed], "i", "u"))
    out = pd.DataFrame(
        {
            "op": op,
            "repo": keep["repo"],
            "path": keep["path"],
            "content": keep["content"],
            "ts": keep["ts"].astype("int64"),
            "inc": keep["inc"].astype("int32"),
        }
    )
    if include_old:
        # a key that appeared has no pre-image; a tombstoned key's
        # pre-image may itself be a tombstone (stays null)
        out["content_old"] = keep["content_old"]
    for a in attr_cols:
        out[a] = keep[a].astype(object)
        if include_old:
            out[f"{a}_old"] = keep[f"{a}_old"].astype(object)
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        _diff_schema(include_old, attr_cols))


def changes_between(snapshot_dir: str, v_old: int, v_new: int,
                    include_old: bool = False,
                    attr_cols: list[str] | None = None):
    """Dataset of per-key changes from v_old to v_new.

    ``include_old=True`` appends the pre-image ``content_old`` column
    (null for appeared keys) — the retraction side an incremental
    aggregate maintainer needs; the default keeps the wire schema the
    downstream feed consumers already parse. ``attr_cols`` carries
    extra stored attribute columns through (see
    :func:`diff_bucket_tables`)."""
    import ray.data as rd

    store = SnapshotStore(snapshot_dir, create=False)
    old_rels = _bucket_rels(store, v_old)
    new_rels = _bucket_rels(store, v_new)
    work = []
    for b in sorted(set(old_rels) | set(new_rels), key=int):
        o, n = old_rels.get(b), new_rels.get(b)
        if o == n:
            continue  # COW: identical file list ⇒ bucket unchanged, skip
        work.append({"bucket": b, "old": ",".join(o or []), "new": ",".join(n or [])})
    schema = _diff_schema(include_old, attr_cols)
    if not work:
        return rd.from_arrow(schema.empty_table())

    root = store.root

    def diff_task(batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        outs = []
        for row in batch.to_pylist():
            def read(rels):
                if not rels:
                    return None
                ts = [pq.read_table(os.path.join(root, r)) for r in rels.split(",")]
                return ts[0] if len(ts) == 1 else pa.concat_tables(ts)

            outs.append(diff_bucket_tables(read(row["old"]), read(row["new"]),
                                           include_old=include_old,
                                           attr_cols=attr_cols))
        return pa.concat_tables(outs) if outs else schema.empty_table()

    return rd.from_items(work).map_batches(diff_task, batch_size=1, batch_format="pyarrow")
