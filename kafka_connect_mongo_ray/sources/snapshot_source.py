"""Custom Ray Datasource for committed COW snapshots.

Replaces the ``from_items(paths) → map_batches(read+conform)`` shim:
a real :class:`ray.data.Datasource` exposes per-file row counts and
byte sizes to the optimizer (parallelism, memory budgeting, progress)
while still conforming every bucket file to the manifest-recorded
union schema — evolved (mixed-schema) snapshots stream without any
driver-side materialization.

Reference analog: the sink's collection handles are opened lazily per
task (``sink/MongoSinkTask.kt:111-117``); here each read task opens
only its own bucket files.
"""

from __future__ import annotations

import base64

import pyarrow as pa

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


class SnapshotDatasource(Datasource):
    """Reads a committed snapshot version's bucket files.

    ``union_schema_b64``: the manifest's serialized union schema; files
    written before a schema evolution are nullable-conformed to it.
    ``live_only``: drop tombstone rows (the exported final-state view).
    """

    def __init__(self, files: list[str], union_schema_b64: str | None,
                 live_only: bool = True):
        self._files = list(files)
        self._union_b64 = union_schema_b64
        self._live_only = live_only
        import pyarrow.parquet as pq

        self._meta = []
        for f in self._files:
            md = pq.ParquetFile(f).metadata
            self._meta.append((md.num_rows, md.serialized_size))

    def estimate_inmemory_data_size(self) -> int | None:
        import os

        # zstd parquet of text ≈ 3x smaller than in-memory Arrow
        return sum(os.path.getsize(f) for f in self._files) * 3

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        if not self._files:
            return []
        union_b64 = self._union_b64
        live_only = self._live_only
        schema = (pa.ipc.read_schema(
            pa.BufferReader(base64.b64decode(union_b64)))
            if union_b64 else None)

        # group files into at most `parallelism` tasks, preserving
        # bucket order
        k = max(1, min(parallelism, len(self._files)))
        groups: list[list[int]] = [[] for _ in range(k)]
        for i in range(len(self._files)):
            groups[i * k // len(self._files)].append(i)

        def make_read_fn(paths: list[str]):
            def read_fn():
                import pyarrow.parquet as pq

                from kafka_connect_mongo_ray.stages.apply import (
                    conform_table,
                    live_rows,
                )

                union = (pa.ipc.read_schema(
                    pa.BufferReader(base64.b64decode(union_b64)))
                    if union_b64 else None)
                for p in paths:
                    t = pq.read_table(p)
                    if union is not None and not t.schema.equals(union):
                        t = conform_table(t, union)
                    yield live_rows(t) if live_only else t

            return read_fn

        tasks = []
        for g in groups:
            if not g:
                continue
            paths = [self._files[i] for i in g]
            # live_only filters tombstones at read time → the exact row
            # count is unknown at plan time; report None rather than a
            # wrong hint (count() may trust plan-time metadata)
            rows = (None if self._live_only
                    else sum(self._meta[i][0] for i in g))
            import os

            size = sum(os.path.getsize(p) for p in paths) * 3
            meta = BlockMetadata(num_rows=rows, size_bytes=size,
                                 input_files=paths, exec_stats=None)
            tasks.append(ReadTask(make_read_fn(paths), meta, schema=schema))
        return tasks
