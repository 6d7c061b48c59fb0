"""Engine configuration.

Analog of the reference's config surface (9 source keys at
``MongoSourceConfig.kt:13-81``, 3 sink keys at
``MongoSinkConfig.kt:13-41``) re-expressed for a Parquet-lake engine:
Mongo URI → input path, ``databases`` → logical tables,
``batch.size`` → Arrow batch size, Kafka offset topic → checkpoint
directory.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """All knobs for one replay / backfill job.

    Attributes mirror reference config keys where one exists:

    - ``batch_size``       ← ``batch.size`` (``AbstractMongoSourceTask.kt:33``)
    - ``num_buckets``      ← unit of apply parallelism; the reference's
      unit is one thread per namespace (``MongoSourceConnector.kt:65-85``),
      ours is a hash bucket of the ``(repo, path)`` key space so a hot
      namespace no longer saturates one thread (SURVEY.md §4).
    - ``checkpoint_dir``   ← Kafka Connect offset topic (``MongoSourceOffset.kt``)
    - ``analyze_schema``   ← ``analyze.schema`` (``MongoSourceConfig.kt:62-67``)
    """

    snapshot_dir: str = "/tmp/kcm_ray/snapshot"
    checkpoint_dir: str = "/tmp/kcm_ray/checkpoints"
    num_buckets: int = 64
    batch_size: int | None = None
    # "tasks" (default): one elastic Ray task per bucket group — full
    # parallelism the moment the shuffle finishes. "actors": an
    # autoscaling actor pool (for appliers holding heavy state).
    apply_mode: str = "tasks"
    # Actor-pool size for apply_mode="actors"; None → (1, min(buckets, 16)).
    apply_concurrency: tuple | int | None = None
    analyze_schema: bool = False
    # Coalesce pre-reduced blocks and run a second partial-LWW combine
    # before the global shuffle — cuts shuffle volume ~keys/blocks-fold
    # on high-dup / hot-key streams. int = explicit block count (THE
    # performance path; size so coalesced blocks land ~150k rows, see
    # BASELINE.md); "auto" = row-targeted repartition (convenient but
    # measured far slower at ≥100M events — Ray's row-based
    # repartition takes a costly path); None = single pre-reduce round.
    prereduce_coalesce: int | str | None = None
    # Ray Data shuffle strategy for the bucket exchange; push-based
    # sort measured ~2x faster than the default pull-based on this
    # workload. None = leave the session default untouched.
    shuffle_strategy: str | None = None
    # Max rows per written snapshot file (resumable, many-file layout).
    snapshot_rows_per_file: int = 1_000_000
    # Free-form extension bag for pipeline-specific knobs (the
    # reference's properties-file passthrough).
    extra: dict = field(default_factory=dict)
