"""Snapshot backfill source (S2/S4): base table → synthetic insert events.

Analog of ``database/ExportReader.kt:33-90``: a full scan ordered by
``_id``, resumable from ``_id > offset``, with an optional additional
filter ANDed in (``ExportReader.kt:78-90``, config
``MongoSourceConnector.kt:52-55``); every row wrapped as a synthetic
``op="i"`` event (``ExportReader.kt:68-76``) so the same envelope
serves backfill and tail. The ``initialImport`` marker becomes the
fixed backfill timestamp ``ts = backfill_ts`` (strictly below every
tail event), mirroring the semantics that any tail event beats the
backfill image under LWW.

Resumability: deterministic key order + the ``key > last_key``
predicate pushed into the scan, exactly ``MongoSourceOffset``'s
``finishedImport=false`` phase (``MongoSourceOffset.kt:10-14``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA
from kafka_connect_mongo_ray.utils import key_strings, limit_worker_threads


def snapshot_to_insert_events(
    batch: pa.Table,
    *,
    backfill_ts: int = 0,
    num_partitions: int = 8,
    last_key: str | None = None,
    filter_expr=None,
) -> pa.Table:
    """Vectorized: one insert event per surviving base row."""
    limit_worker_threads()
    if filter_expr is not None:
        batch = batch.filter(filter_expr)
    if last_key is not None and batch.num_rows:
        keys = key_strings(batch, ["repo", "path"])
        batch = batch.filter(pc.greater(keys, last_key))
    n = batch.num_rows
    if n == 0:
        return CHANGE_EVENT_SCHEMA.empty_table()
    keys = np.asarray(key_strings(batch, ["repo", "path"])).astype(object)
    import pandas as pd

    pid = (pd.util.hash_array(keys, categorize=False) % np.uint64(num_partitions)).astype(np.int32)
    return pa.table(
        {
            "ts": pa.array(np.full(n, backfill_ts, dtype=np.int64)),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array(np.full(n, "i", dtype=object), pa.string()),
            "repo": pc.cast(batch["repo"], pa.string()),
            "path": pc.cast(batch["path"], pa.string()),
            "commit": pc.cast(batch["commit"], pa.string()),
            "lang": pc.cast(batch["lang"], pa.string()),
            "content": pc.cast(batch["content"], pa.large_string()),
            "partition_id": pa.array(pid),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def backfill_dataset(base_path_or_ds, *, backfill_ts: int = 0, num_partitions: int = 8,
                     last_key: str | None = None, columns=None, parquet_filter=None):
    """Backfill event Dataset from a Parquet path (with column pruning
    and row-group filter pushdown — S4) or an existing Dataset."""
    import ray.data as rd

    if isinstance(base_path_or_ds, str):
        ds = rd.read_parquet(
            base_path_or_ds,
            columns=columns or ["repo", "path", "commit", "lang", "content"],
            filter=parquet_filter,
        )
    else:
        ds = base_path_or_ds
    return ds.map_batches(
        snapshot_to_insert_events,
        fn_kwargs={"backfill_ts": backfill_ts, "num_partitions": num_partitions,
                   "last_key": last_key},
        batch_format="pyarrow",
    )
