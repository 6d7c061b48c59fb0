"""kafka_connect_mongo_ray — a Ray-Data-native CDC / incremental-ingest engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of ``alibaba-archive/kafka-connect-mongo``: an
oplog-shaped change-event stream (insert / update-with-full-image /
delete-tombstone, per-partition monotone ``(ts, inc)`` offsets,
resume-token checkpoints) applied as key-partitioned last-writer-wins
idempotent upserts into copy-on-write Parquet snapshots.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` →
``map_batches`` over zero-copy Arrow batches → one bucket-hash shuffle
→ stateful merge-appliers. See SURVEY.md for the structural analysis
of the reference and the mapping table.
"""

from kafka_connect_mongo_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
