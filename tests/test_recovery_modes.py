"""Crash-window recovery + actor-pool apply-mode parity."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset, run_replay
from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
from tests.test_replay_e2e import ds_from_table, engine_sha_map


def fixture_events(seed=41):
    base = synth_repo_files(4, 10, seed=seed)
    spec = GenSpec(num_partitions=4, events_per_partition=200, seed=seed, dup_frac=0.1)
    return gen_all_events(spec, base)


def test_crash_window_stale_staging_recovered(tmp_engine_dirs):
    """A crashed attempt left garbage in the v1 staging dir; the rerun
    must not publish it."""
    cfg = tmp_engine_dirs
    ev = fixture_events()
    # simulate the crashed attempt: stale staging with a poisoned bucket
    staging = os.path.join(cfg.snapshot_dir, ".staging-v000001")
    os.makedirs(staging, exist_ok=True)
    poison = pa.table(
        {
            "repo": ["POISON"], "path": ["x"], "commit": [""], "lang": [""],
            "content": pa.array(["stale"], pa.large_string()),
            "ts": pa.array([0], pa.int64()), "inc": pa.array([0], pa.int32()),
            "op_rank": pa.array([0], pa.int8()),
        }
    )
    pq.write_table(poison, os.path.join(staging, "bucket=999.parquet"))

    run_replay(ds_from_table(ev), cfg)
    got = engine_sha_map(final_state_dataset(cfg))
    want = content_sha256_map(final_table(replay(ev)))
    assert got == want  # poison bucket gone


def test_crash_after_staging_before_commit_rerun(tmp_engine_dirs, monkeypatch):
    """Crash between staging write and commit: CURRENT still points at
    v0; rerunning the whole job converges to the correct state."""
    cfg = tmp_engine_dirs
    ev = fixture_events()

    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    real_commit = SnapshotStore.commit
    calls = {"n": 0}

    def crashing_commit(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before commit")
        return real_commit(self, *a, **kw)

    monkeypatch.setattr(SnapshotStore, "commit", crashing_commit)
    try:
        run_replay(ds_from_table(ev), cfg)
    except RuntimeError:
        pass
    store = SnapshotStore(cfg.snapshot_dir)
    assert store.current_version() == 0  # nothing published
    run_replay(ds_from_table(ev), cfg)  # full rerun (idempotent)
    assert store.current_version() == 1
    got = engine_sha_map(final_state_dataset(cfg))
    want = content_sha256_map(final_table(replay(ev)))
    assert got == want


def test_multi_file_buckets_and_export(tmp_path):
    """snapshot_rows_per_file splits bucket state into many files; the
    manifest tracks them all and reads/exports stay correct."""
    ev = fixture_events()
    cfg = EngineConfig(
        snapshot_dir=str(tmp_path / "s"),
        checkpoint_dir=str(tmp_path / "c"),
        num_buckets=4,
        snapshot_rows_per_file=3,  # force splitting
    )
    run_replay(ds_from_table(ev), cfg)
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    store = SnapshotStore(cfg.snapshot_dir)
    m = store.manifest(1)
    assert any(len(files) > 1 for files in m["buckets"].values())
    want = content_sha256_map(final_table(replay(ev)))
    assert engine_sha_map(final_state_dataset(cfg)) == want
    # partitioned export round-trips
    from kafka_connect_mongo_ray.pipelines.cdc import export_final_state

    n = export_final_state(cfg, str(tmp_path / "export"))
    assert n == len(want)


def test_actor_mode_apply_parity(tmp_path):
    """apply_mode='actors' (stateful merge-applier pool) produces the
    identical committed state as the task mode."""
    ev = fixture_events()
    want = content_sha256_map(final_table(replay(ev)))
    for mode in ("tasks", "actors"):
        cfg = EngineConfig(
            snapshot_dir=str(tmp_path / mode / "s"),
            checkpoint_dir=str(tmp_path / mode / "c"),
            num_buckets=8,
            apply_mode=mode,
            apply_concurrency=(1, 2),
        )
        run_replay(ds_from_table(ev), cfg)
        assert engine_sha_map(final_state_dataset(cfg)) == want, mode


def test_byte_stable_snapshots(tmp_path):
    """Determinism for sha256 parity (SURVEY §7.4): the same event
    stream replayed into two fresh stores produces byte-identical
    bucket files (canonical row order, canonical field order, fixed
    codec)."""
    import hashlib

    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    ev = fixture_events()

    def run(name):
        cfg = EngineConfig(
            snapshot_dir=str(tmp_path / name / "s"),
            checkpoint_dir=str(tmp_path / name / "c"),
            num_buckets=8,
        )
        run_replay(ds_from_table(ev), cfg)
        store = SnapshotStore(cfg.snapshot_dir)
        return {
            os.path.basename(f): hashlib.sha256(open(f, "rb").read()).hexdigest()
            for f in store.bucket_files(1)
        }

    a, b = run("a"), run("b")
    assert a == b and len(a) > 0


def test_concurrent_commit_refused(tmp_engine_dirs, monkeypatch):
    """Optimistic concurrency: a replay that planned against v0 must
    refuse to commit after another job published v1 in the meantime —
    then succeed on retry (idempotent)."""
    import pytest

    from kafka_connect_mongo_ray.state.snapshot import ConcurrentCommitError, SnapshotStore

    cfg = tmp_engine_dirs
    ev = fixture_events()
    real_commit = SnapshotStore.commit
    interfered = {"done": False}

    def racing_commit(self, new_version, **kw):
        if not interfered["done"]:
            interfered["done"] = True
            # a competing job commits v1 first, via a separate handle
            other = SnapshotStore(self.root)
            import shutil

            shutil.copytree(self.staging_dir(new_version),
                            other.staging_dir(99), dirs_exist_ok=True)
            real_commit(other, 1, tokens={}, prev_version=0)
        return real_commit(self, new_version, **kw)

    monkeypatch.setattr(SnapshotStore, "commit", racing_commit)
    with pytest.raises(ConcurrentCommitError):
        run_replay(ds_from_table(ev), cfg)
    monkeypatch.setattr(SnapshotStore, "commit", real_commit)
    # retry: plans against the interloper's v1, commits v2 cleanly
    s = run_replay(ds_from_table(ev), cfg)
    assert s["version"] == 2


def test_compaction_rewrites_fragmented_buckets_state_identical(tmp_path):
    """run_compaction collapses multi-file buckets into one file in a
    new COW version: state bytes identical, tokens carried verbatim,
    single-file buckets untouched (path equality), idempotent no-op
    when nothing is fragmented."""
    ev = fixture_events()
    cfg = EngineConfig(
        snapshot_dir=str(tmp_path / "s"),
        checkpoint_dir=str(tmp_path / "c"),
        num_buckets=4,
        snapshot_rows_per_file=3,
    )
    run_replay(ds_from_table(ev), cfg)
    from kafka_connect_mongo_ray.state.snapshot import (
        SnapshotStore,
        run_compaction,
    )

    store = SnapshotStore(cfg.snapshot_dir)
    before = engine_sha_map(final_state_dataset(cfg))
    m1 = store.manifest(1)
    frag = [b for b, f in m1["buckets"].items()
            if not isinstance(f, str) and len(f) > 1]
    assert frag
    out = run_compaction(cfg.snapshot_dir)
    assert out["new_version"] == 2 and out["compacted"] == len(frag)
    m2 = store.manifest(2)
    for b in frag:
        assert len(m2["buckets"][b]) == 1
    # state and tokens identical
    assert engine_sha_map(final_state_dataset(cfg, version=2)) == before
    assert store.tokens(2) == store.tokens(1)
    # second run: nothing fragmented -> no new version
    again = run_compaction(cfg.snapshot_dir)
    assert again["compacted"] == 0 and store.current_version() == 2


def test_compaction_respects_target_rows_per_file(tmp_path):
    """A bucket already at the configured split is NOT fragmentation;
    a rewrite honors the target split instead of one giant file."""
    ev = fixture_events()
    cfg = EngineConfig(
        snapshot_dir=str(tmp_path / "s"),
        checkpoint_dir=str(tmp_path / "c"),
        num_buckets=4,
        snapshot_rows_per_file=3,
    )
    run_replay(ds_from_table(ev), cfg)
    from kafka_connect_mongo_ray.state.snapshot import (
        SnapshotStore,
        run_compaction,
    )

    store = SnapshotStore(cfg.snapshot_dir)
    # target == the config's own split: nothing qualifies, no churn
    out = run_compaction(cfg.snapshot_dir, rows_per_file=3)
    assert out["compacted"] == 0 and store.current_version() == 1
    # a coarser target (6 rows/file) halves the file count per bucket
    out = run_compaction(cfg.snapshot_dir, rows_per_file=6)
    assert out["compacted"] >= 1 and store.current_version() == 2
    import math

    import pyarrow.parquet as pq
    m2 = store.manifest(2)
    import os as _os
    for b, rels in m2["buckets"].items():
        rels = [rels] if isinstance(rels, str) else rels
        rows = sum(pq.read_metadata(
            _os.path.join(cfg.snapshot_dir, r)).num_rows for r in rels)
        assert len(rels) <= max(1, math.ceil(rows / 3))  # never denser
