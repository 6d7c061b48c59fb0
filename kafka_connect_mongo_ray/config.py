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


class ConfigError(ValueError):
    """A knob failed validation at job start — the analog of the
    reference's fail-fast connector validation
    (``MongoSourceConnector.kt:43-60`` raising on missing/invalid
    props, ``MongoSinkConnector.kt:54-71`` enforcing topics↔databases
    1:1) instead of a deep in-job failure."""


_APPLY_MODES = ("tasks", "actors")
_SHUFFLE_STRATEGIES = (
    "SORT_SHUFFLE_PULL_BASED", "SORT_SHUFFLE_PUSH_BASED", "HASH_SHUFFLE",
)


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
    # "tasks" (default): the analyze stage runs as elastic tasks with a
    # fresh per-batch analyzer — instant full parallelism (measured
    # 1.7-4.5 s vs 4.8-6.2 s for a (4,30) actor pool on the same 1M-
    # event batch set) and batch-deterministic schema decisions instead
    # of actor-arrival-order-dependent ones. "actors": the autoscaling
    # pool, for when a cross-batch schema memo matters more than ramp.
    analyze_mode: str = "tasks"
    # Dead-letter sink for analyzed mode: when set, malformed payload
    # rows are ALSO written raw (key cols + offending text) as small
    # per-batch parquet files under this dir — a diagnostic side
    # channel; the main path's skip/substitute semantics are unchanged.
    quarantine_dir: str | None = None
    # Coalesce pre-reduced blocks and run a second partial-LWW combine
    # before the global shuffle — cuts shuffle volume ~keys/blocks-fold
    # on high-dup / hot-key streams. int = explicit block count (size so
    # coalesced blocks land ~150k rows, see BASELINE.md); "auto" = learn
    # the count from the previous commit's manifest metrics (pre-reduced
    # rows last window / 150k; first window runs a single pre-reduce
    # round); None = single pre-reduce round always.
    prereduce_coalesce: int | str | None = None
    # Ray Data shuffle strategy for the bucket exchange; push-based
    # sort measured ~2x faster than the default pull-based on this
    # workload. None = leave the session default untouched.
    shuffle_strategy: str | None = None
    # DataContext.op_resource_reservation_ratio override. The default
    # (0.5) reserves half the cluster per operator, which starves the
    # map stage behind the exchange on small clusters; 0.3 measured
    # tp8 239k→258k ev/s and tp32 813k→1.03M on the 10M-event job,
    # bringing 8→32-CPU scaling efficiency into a 0.93–1.15 band.
    # "auto" = size to the cluster: below _SMALL_CLUSTER_CPUS the
    # reservation machinery itself is the bottleneck (round-4 four-
    # quadrant measurement, BASELINE.md: the SAME 8-CPU 10M-event job
    # runs 185k ev/s with reservation vs 1.07M without — 5.8×; still
    # 3.8× at 50M events), so "auto" DISABLES reservation on small
    # sessions and applies 0.3 on large ones (where reservation
    # protects big runs: 32 CPUs / 50M events measured 519k on vs
    # 391k off). "off" = disable reservation outright (the plain
    # regime the scaling artifact reports alongside the default).
    # None = leave the session default untouched.
    op_reservation_ratio: float | str | None = None
    # Max rows per written snapshot file (resumable, many-file layout).
    snapshot_rows_per_file: int = 1_000_000
    # Free-form extension bag for pipeline-specific knobs (the
    # reference's properties-file passthrough).
    extra: dict = field(default_factory=dict)

    def validate(self) -> "EngineConfig":
        """Fail fast on invalid knobs (called at every job start).
        Returns self so call sites can chain."""
        if not self.snapshot_dir or not isinstance(self.snapshot_dir, str):
            raise ConfigError("snapshot_dir must be a non-empty path")
        if not self.checkpoint_dir or not isinstance(self.checkpoint_dir, str):
            raise ConfigError("checkpoint_dir must be a non-empty path")
        if self.snapshot_dir == self.checkpoint_dir:
            raise ConfigError("snapshot_dir and checkpoint_dir must differ "
                              "(both atomically rename into their root)")
        if not isinstance(self.num_buckets, int) or self.num_buckets < 1:
            raise ConfigError(f"num_buckets must be a positive int, got "
                              f"{self.num_buckets!r}")
        if self.batch_size is not None and (
                not isinstance(self.batch_size, int) or self.batch_size < 1):
            raise ConfigError(f"batch_size must be None or a positive int, "
                              f"got {self.batch_size!r}")
        if self.apply_mode not in _APPLY_MODES:
            raise ConfigError(f"apply_mode must be one of {_APPLY_MODES}, "
                              f"got {self.apply_mode!r}")
        if self.analyze_mode not in _APPLY_MODES:
            raise ConfigError(f"analyze_mode must be one of {_APPLY_MODES}, "
                              f"got {self.analyze_mode!r}")
        pc = self.prereduce_coalesce
        if pc is not None and pc != "auto" and (
                not isinstance(pc, int) or isinstance(pc, bool) or pc < 1):
            raise ConfigError("prereduce_coalesce must be None, 'auto' or a "
                              f"positive int, got {pc!r}")
        if (self.shuffle_strategy is not None
                and self.shuffle_strategy not in _SHUFFLE_STRATEGIES):
            raise ConfigError(f"shuffle_strategy must be None or one of "
                              f"{_SHUFFLE_STRATEGIES}, got "
                              f"{self.shuffle_strategy!r}")
        if self.op_reservation_ratio is not None and (
                self.op_reservation_ratio not in ("auto", "off")) and not (
                isinstance(self.op_reservation_ratio, (int, float))
                and not isinstance(self.op_reservation_ratio, bool)
                and 0 < self.op_reservation_ratio <= 1):
            raise ConfigError("op_reservation_ratio must be None, 'auto', "
                              "'off', or in (0, 1], got "
                              f"{self.op_reservation_ratio!r}")
        if (not isinstance(self.snapshot_rows_per_file, int)
                or self.snapshot_rows_per_file < 1):
            raise ConfigError("snapshot_rows_per_file must be a positive int, "
                              f"got {self.snapshot_rows_per_file!r}")
        ac = self.apply_concurrency
        if ac is not None:
            ok = (isinstance(ac, int) and not isinstance(ac, bool) and ac >= 1) or (
                isinstance(ac, tuple) and len(ac) == 2
                and all(isinstance(x, int) and x >= 1 for x in ac)
                and ac[0] <= ac[1])
            if not ok:
                raise ConfigError("apply_concurrency must be None, a positive "
                                  f"int or an (lo, hi) tuple, got {ac!r}")
        return self
