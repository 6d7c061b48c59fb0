"""Config fail-fast validation, task-count balancing, schema-registry
bootstrap retry, and learned prereduce coalescing."""

import pytest

from kafka_connect_mongo_ray.config import ConfigError, EngineConfig


def test_config_validate_rejects_bad_knobs(tmp_path):
    good = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                        checkpoint_dir=str(tmp_path / "c"))
    assert good.validate() is good
    cases = [
        dict(num_buckets=0),
        dict(num_buckets="64"),
        dict(batch_size=-1),
        dict(apply_mode="threads"),
        dict(prereduce_coalesce="fast"),
        dict(prereduce_coalesce=0),
        dict(shuffle_strategy="TURBO"),
        dict(snapshot_rows_per_file=0),
        dict(apply_concurrency=(4, 2)),
        dict(apply_concurrency=0),
    ]
    import dataclasses

    for kw in cases:
        bad = dataclasses.replace(good, **kw)
        with pytest.raises(ConfigError):
            bad.validate()
    with pytest.raises(ConfigError):
        EngineConfig(snapshot_dir=str(tmp_path / "x"),
                     checkpoint_dir=str(tmp_path / "x")).validate()


def test_run_replay_fails_fast_on_bad_config(tmp_path):
    """The typo'd knob surfaces as a named error at job start, not deep
    inside a Ray task."""
    import pyarrow as pa

    from kafka_connect_mongo_ray.pipelines.cdc import run_replay

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       apply_mode="actor")  # typo
    with pytest.raises(ConfigError, match="apply_mode"):
        run_replay(None, cfg)  # validation precedes any dataset use


def test_group_tables_balancing_math():
    """Mirror of MongoSourceConnectorTest.kt:34-52: groups = min(N,
    max_tasks), sizes differ by at most 1, order preserved."""
    from kafka_connect_mongo_ray.pipelines.stream import group_tables

    assert group_tables(["a", "b", "c"], 2) == [["a", "b"], ["c"]]
    assert group_tables(["a", "b", "c"], 5) == [["a"], ["b"], ["c"]]
    assert group_tables(["a", "b", "c", "d", "e"], 2) == [["a", "b", "c"], ["d", "e"]]
    assert group_tables([], 3) == []
    sizes = [len(g) for g in group_tables([str(i) for i in range(10)], 4)]
    assert sum(sizes) == 10 and max(sizes) - min(sizes) <= 1
    with pytest.raises(ConfigError):
        group_tables(["a"], 0)


def test_parallel_table_replay(tmp_engine_dirs):
    """max_parallel_tables > 1: tables run in concurrent driver threads,
    each committing its own subtree correctly."""
    from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset
    from kafka_connect_mongo_ray.pipelines.stream import run_replay_tables
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
    from tests.test_replay_e2e import ds_from_table, engine_sha_map

    import dataclasses

    cfg = tmp_engine_dirs
    events = {}
    for t, seed in [("alpha", 11), ("beta", 12), ("gamma", 13)]:
        base = synth_repo_files(3, 8, seed=seed)
        spec = GenSpec(num_partitions=2, events_per_partition=150, seed=seed)
        events[t] = gen_all_events(spec, base)

    out = run_replay_tables(
        {t: (lambda ev=ev: ds_from_table(ev)) for t, ev in events.items()},
        cfg, max_parallel_tables=2,
    )
    assert set(out) == set(events)
    for t, ev in events.items():
        sub = dataclasses.replace(
            cfg, snapshot_dir=f"{cfg.snapshot_dir}/{t}",
            checkpoint_dir=f"{cfg.checkpoint_dir}/{t}")
        got = engine_sha_map(final_state_dataset(sub))
        want = content_sha256_map(final_table(replay(ev)))
        assert got == want, t


def test_schema_registry_bootstrap_retry():
    from kafka_connect_mongo_ray.stages.schema_evolve import (
        SchemaAnalyzer,
        bootstrap_schema_from_registry,
    )

    avro = ('{"type": "record", "name": "User", "fields": ['
            '{"name": "Name", "type": ["null", "string"]},'
            '{"name": "age", "type": "long"},'
            '{"name": "active", "type": "boolean"}]}')
    calls = {"n": 0}

    def flaky_fetch():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("registry down")
        return avro

    schema = bootstrap_schema_from_registry(flaky_fetch, max_retries=5)
    assert schema == {"name": "string", "age": "float64", "active": "bool"}
    assert calls["n"] == 3
    # exhausted retries re-raise the transport error
    with pytest.raises(ConnectionError):
        bootstrap_schema_from_registry(
            lambda: (_ for _ in ()).throw(ConnectionError("down")),
            max_retries=2)
    # the bootstrapped schema seeds the analyzer (ST1 analog)
    an = SchemaAnalyzer(json_col="o", initial_schema=schema)
    assert set(an.schema) == {"name", "age", "active"}


def test_prereduce_auto_learns_from_manifest(tmp_engine_dirs):
    """prereduce_coalesce='auto': window 1 has no history (single
    pre-reduce round); window 2 coalesces using the recorded manifest
    metrics. Correctness must be unaffected either way."""
    import dataclasses

    from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset, run_replay
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
    from tests.test_replay_e2e import ds_from_table, engine_sha_map

    cfg = dataclasses.replace(tmp_engine_dirs, prereduce_coalesce="auto")
    base = synth_repo_files(4, 10, seed=21)
    ev1 = gen_all_events(GenSpec(num_partitions=4, events_per_partition=200,
                                 seed=21), base)
    ev2 = gen_all_events(GenSpec(num_partitions=4, events_per_partition=200,
                                 seed=22, base_ts=2_000_000_000), base)
    s1 = run_replay(ds_from_table(ev1), cfg)
    s2 = run_replay(ds_from_table(ev2), cfg)
    assert s2["version"] == 2 and s2["events_in"] > 0
    import pyarrow as pa

    want = content_sha256_map(final_table(replay(pa.concat_tables([ev1, ev2]))))
    assert engine_sha_map(final_state_dataset(cfg)) == want


def test_periodic_reexport(tmp_engine_dirs):
    """S5 cron re-export analog: scheduled backfill re-runs converge to
    the latest snapshot content; the injected clock/sleep make the
    schedule deterministic."""
    import pyarrow as pa

    from kafka_connect_mongo_ray.pipelines.cdc import final_state_table
    from kafka_connect_mongo_ray.pipelines.stream import run_periodic_reexport
    from kafka_connect_mongo_ray.sources.backfill import snapshot_to_insert_events
    from kafka_connect_mongo_ray.sources.gen import synth_repo_files
    from tests.test_replay_e2e import ds_from_table

    cfg = tmp_engine_dirs
    runs = {"n": 0}
    base = synth_repo_files(3, 5, seed=9)

    def factory():
        runs["n"] += 1
        # each export snapshots newer source content at a later ts
        upd = base.set_column(
            base.schema.get_field_index("content"), "content",
            pa.array([f"{c}:v{runs['n']}" for c in base["content"].to_pylist()],
                     pa.large_string()))
        return ds_from_table(
            snapshot_to_insert_events(upd, backfill_ts=runs["n"] * 1000,
                                      num_partitions=2), 2)

    slept = []
    t = {"now": 100.0}

    def fake_sleep(s):
        slept.append(round(s, 6))
        t["now"] += s

    summaries = run_periodic_reexport(
        factory, cfg, interval_s=60.0, max_runs=3,
        sleep=fake_sleep, clock=lambda: t["now"])
    assert [s["version"] for s in summaries] == [1, 2, 3]
    state = final_state_table(cfg)
    assert all(c.endswith(":v3") for c in state["content"].to_pylist())
    # ticks waited for the schedule (first fires immediately)
    assert len(slept) == 2 and all(abs(s - 60.0) < 1e-6 for s in slept)


def test_op_reservation_auto_small_cluster(tmp_path):
    """op_reservation_ratio='auto' validates, and on this 4-CPU test
    session (below the small-cluster boundary) a replay disables the
    per-operator reservation outright (BASELINE.md round-4 four-
    quadrant measurement: 5.8x on the same 8-CPU job)."""
    from ray.data.context import DataContext

    from kafka_connect_mongo_ray.config import ConfigError, EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import (
        GenSpec,
        change_event_dataset,
        synth_repo_files,
    )

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=4, op_reservation_ratio="auto")
    cfg.validate()
    import pytest

    with pytest.raises(ConfigError):
        EngineConfig(snapshot_dir="x", checkpoint_dir="y",
                     op_reservation_ratio="bogus").validate()
    with pytest.raises(ConfigError):
        EngineConfig(snapshot_dir="x", checkpoint_dir="y",
                     op_reservation_ratio=True).validate()

    from kafka_connect_mongo_ray.pipelines.cdc import (
        _apply_execution_context,
        _restore_execution_context,
    )

    spec = GenSpec(num_partitions=2, events_per_partition=500, seed=11)
    base = synth_repo_files(5, 20, seed=11)

    # the applied (in-flight) setting goes on the DATASET's plan-bound
    # context (a global mutation would be a no-op for an
    # already-created dataset): 4-CPU session < _SMALL_CLUSTER_CPUS ->
    # auto disables the reservation
    probe_ds = change_event_dataset(spec, base)
    before_enabled = probe_ds.context.op_resource_reservation_enabled
    before_ratio = probe_ds.context.op_resource_reservation_ratio
    saved = _apply_execution_context(cfg, probe_ds)
    try:
        assert probe_ds.context.op_resource_reservation_enabled is False
    finally:
        _restore_execution_context(saved, probe_ds)
    assert probe_ds.context.op_resource_reservation_enabled == before_enabled
    assert probe_ds.context.op_resource_reservation_ratio == before_ratio

    gctx = DataContext.get_current()
    g_before = (gctx.shuffle_strategy, gctx.op_resource_reservation_enabled,
                gctx.op_resource_reservation_ratio)
    ev = change_event_dataset(spec, base)
    out = run_replay(ev, cfg)
    assert out["live_rows"] > 0
    # neither the global context nor the caller's dataset handle may be
    # left mutated after the replay
    assert (gctx.shuffle_strategy, gctx.op_resource_reservation_enabled,
            gctx.op_resource_reservation_ratio) == g_before
    assert ev.context.op_resource_reservation_enabled == before_enabled
    assert ev.context.op_resource_reservation_ratio == before_ratio
