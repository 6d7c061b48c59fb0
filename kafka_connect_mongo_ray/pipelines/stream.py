"""Micro-batch tail runner: continuous CDC as repeated bounded replays.

Ray Data has no unbounded streaming; the reference's tailable-await
cursor (``OplogReader.kt:51-88``) maps to a sequence of bounded replay
jobs, each resuming from the previous commit's per-partition resume
tokens — the same two-phase backfill→tail lifecycle as
``MongoSourceTask.start`` (``MongoSourceTask.kt:15-34``), with the
idle-backoff loop (``AbstractMongoSourceTask.kt:123-128``) replaced by
whatever scheduler re-invokes the job. Effective exactly-once holds
across micro-batches: each commit is atomic and replaying any suffix
is idempotent (LWW).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import run_replay


def run_micro_batches(
    batch_factories: Iterable[Callable[[], "ray.data.Dataset"]],
    cfg: EngineConfig,
) -> list[dict]:
    """Run each bounded event Dataset as one committed replay. A factory
    per micro-batch (datasets are single-use). Returns the per-job
    summaries; ``summary['tokens']`` advances monotonically."""
    summaries = []
    for factory in batch_factories:
        summaries.append(run_replay(factory(), cfg))
    return summaries


def run_replay_tables(
    table_events: dict[str, Callable[[], "ray.data.Dataset"]],
    base_cfg: EngineConfig,
) -> dict[str, dict]:
    """Multi-namespace connector analog: the reference runs one reader
    per database and routes each namespace to its own topic/collection
    (``MongoSourceConnector.taskConfigs``, ``StructUtil.getTopic``).
    Here each logical table gets its own snapshot/checkpoint subtree
    (``{snapshot_dir}/{table}``) and an independent committed replay —
    tables never share buckets, so a hot table cannot delay another's
    commit."""
    import dataclasses

    out = {}
    for table, factory in table_events.items():
        cfg = dataclasses.replace(
            base_cfg,
            snapshot_dir=f"{base_cfg.snapshot_dir}/{table}",
            checkpoint_dir=f"{base_cfg.checkpoint_dir}/{table}",
        )
        out[table] = run_replay(factory(), cfg)
    return out


def backfill_then_tail(
    backfill_factory: Callable[[], "ray.data.Dataset"],
    tail_factories: Iterable[Callable[[], "ray.data.Dataset"]],
    cfg: EngineConfig,
) -> list[dict]:
    """The reference's two-phase start: snapshot export first (synthetic
    op='i', ts below every tail event), then the tail micro-batches.
    Overlap between the phases is harmless — idempotent key-upsert
    neutralizes duplicates (SURVEY.md §2.7)."""
    return run_micro_batches([backfill_factory, *tail_factories], cfg)
