"""End-to-end replay through Ray Data vs the pure-Python oracle.

Covers FIXTURES.md F3 (subtle), F4 (randomized bulk + dups), F6 (hot
key skew) and F7 (checkpoint resume + re-run of a committed stream).
Parity currency: per-key content sha256 on sorted (repo, path)."""

import pyarrow as pa
import pytest

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
from kafka_connect_mongo_ray.pipelines.cdc import (
    final_state_dataset,
    replay_collect,
    run_replay,
)
from kafka_connect_mongo_ray.sources.gen import (
    GenSpec,
    change_event_dataset,
    gen_all_events,
    synth_repo_files,
)
from tests.test_oracle_and_gen import subtle_events


def ds_from_table(tbl, blocks=4):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


def engine_sha_map(ds):
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    ) if ds.count() else final_table({})
    return content_sha256_map(tbl)


def assert_parity(events_tbl, num_buckets=8):
    oracle_map = content_sha256_map(final_table(replay(events_tbl)))
    out = replay_collect(ds_from_table(events_tbl), num_buckets=num_buckets, batch_size=257)
    got = engine_sha_map(out)
    assert got == oracle_map


def test_subtle_e2e():
    assert_parity(subtle_events())


def test_bulk_random_with_dups_e2e():
    base = synth_repo_files(10, 20, seed=13)
    spec = GenSpec(num_partitions=4, events_per_partition=500, seed=13, dup_frac=0.2)
    assert_parity(gen_all_events(spec, base))


def test_hot_key_skew_e2e():
    # zipf-ish: skew=6 concentrates ~half the events on few keys (F6)
    base = synth_repo_files(5, 10, seed=17)
    spec = GenSpec(num_partitions=4, events_per_partition=800, seed=17, skew=6.0)
    ev = gen_all_events(spec, base)
    assert_parity(ev, num_buckets=4)
    # salted path: different bucket counts must give identical state
    a = engine_sha_map(replay_collect(ds_from_table(ev), num_buckets=2))
    b = engine_sha_map(replay_collect(ds_from_table(ev), num_buckets=16))
    assert a == b


def test_generator_dataset_matches_local():
    base = synth_repo_files(4, 5, seed=19)
    spec = GenSpec(num_partitions=3, events_per_partition=100, seed=19)
    local = gen_all_events(spec, base)
    ds = change_event_dataset(spec, base)
    remote = pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("partition_id", "ascending"), ("ts", "ascending")])
    assert remote.sort_by([("partition_id", "ascending"), ("ts", "ascending")]).equals(
        local.sort_by([("partition_id", "ascending"), ("ts", "ascending")])
    )


@pytest.fixture()
def bulk_fixture():
    base = synth_repo_files(6, 10, seed=23)
    spec = GenSpec(num_partitions=4, events_per_partition=400, seed=23, dup_frac=0.1)
    return gen_all_events(spec, base)


def test_persistent_replay_and_commit(tmp_engine_dirs, bulk_fixture):
    cfg = tmp_engine_dirs
    summary = run_replay(ds_from_table(bulk_fixture), cfg)
    assert summary["version"] == 1
    oracle_map = content_sha256_map(final_table(replay(bulk_fixture)))
    got = engine_sha_map(final_state_dataset(cfg))
    assert got == oracle_map
    assert summary["live_rows"] == len(oracle_map)


def test_checkpoint_resume_prefix_suffix(tmp_engine_dirs, bulk_fixture):
    """F7: run on a prefix, commit, then feed the FULL stream — the
    checkpoint filter must apply only the suffix; final state equals
    the single-shot replay."""
    cfg = tmp_engine_dirs
    ev = bulk_fixture
    # prefix = events with ts below the median
    import numpy as np
    import pyarrow.compute as pc

    cut = int(np.median(np.asarray(ev["ts"])))
    prefix = ev.filter(pc.less_equal(ev["ts"], cut))
    s1 = run_replay(ds_from_table(prefix), cfg)
    assert s1["version"] == 1
    s2 = run_replay(ds_from_table(ev), cfg)  # full stream, token-filtered
    assert s2["version"] == 2
    # suffix-only application: fewer events in than the full stream
    assert s2["events_in"] < ev.num_rows
    oracle_map = content_sha256_map(final_table(replay(ev)))
    assert engine_sha_map(final_state_dataset(cfg)) == oracle_map


def test_rerun_committed_stream_is_noop(tmp_engine_dirs, bulk_fixture):
    """F7 variant: at-least-once re-run of an already-committed stream
    leaves the state unchanged (idempotence)."""
    cfg = tmp_engine_dirs
    run_replay(ds_from_table(bulk_fixture), cfg)
    before = engine_sha_map(final_state_dataset(cfg))
    s2 = run_replay(ds_from_table(bulk_fixture), cfg)
    assert s2["events_in"] == 0
    assert engine_sha_map(final_state_dataset(cfg)) == before


def test_wide_content_records_e2e():
    """F1 long-tail knob: multi-KB content payloads through the full
    path (generation -> shuffle -> merge) with parity."""
    base = synth_repo_files(3, 5, seed=71)
    spec = GenSpec(num_partitions=2, events_per_partition=150, seed=71,
                   content_words=800)  # ~4-5 KB per row image
    ev = gen_all_events(spec, base)
    lens = [len(c) for c in ev["content"].to_pylist() if c is not None]
    assert max(lens) > 4000
    assert_parity(ev, num_buckets=4)


def test_replay_hash_shuffle_strategy_matches_default(tmp_path):
    """HASH_SHUFFLE (the bench strategy since round 4: 995k vs 763k
    ev/s on the 2M headline, 762k vs 519k at 50M events / 32 CPUs)
    must produce the identical committed state as the default
    shuffle."""
    from ray.data.context import DataContext

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import (
        GenSpec,
        change_event_dataset,
        synth_repo_files,
    )
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    ctx = DataContext.get_current()
    before = ctx.shuffle_strategy
    spec = GenSpec(num_partitions=4, events_per_partition=2000, seed=23,
                   dup_frac=0.05)
    base = synth_repo_files(10, 40, seed=23)

    def run(strategy, sub):
        cfg = EngineConfig(snapshot_dir=str(tmp_path / sub / "s"),
                           checkpoint_dir=str(tmp_path / sub / "c"),
                           num_buckets=8, shuffle_strategy=strategy)
        out = run_replay(change_event_dataset(spec, base), cfg)
        store = SnapshotStore(cfg.snapshot_dir)
        import pyarrow as pa

        tables = [store.read_bucket(out["version"], b)
                  for b in range(cfg.num_buckets)]
        rows = pa.concat_tables(
            [t for t in tables if t is not None]).to_pandas()
        key = [c for c in ("repo", "path") if c in rows.columns]
        return out, rows.sort_values(key).reset_index(drop=True)

    try:
        out_h, rows_h = run("HASH_SHUFFLE", "hash")
        out_d, rows_d = run(None, "default")
    finally:
        ctx.shuffle_strategy = before
    assert out_h["live_rows"] == out_d["live_rows"]
    import pandas as pd

    pd.testing.assert_frame_equal(rows_h[sorted(rows_h.columns)],
                                  rows_d[sorted(rows_d.columns)])


def test_run_replay_restores_data_context(tmp_path):
    """Config-driven DataContext overrides must not leak past the
    replay (success AND failure paths): a HASH_SHUFFLE replay once
    left the process-global context flipped, making every later
    range-partitioned groupby in the same session 2-3x slower."""
    from ray.data.context import DataContext

    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    ctx = DataContext.get_current()
    before = (ctx.shuffle_strategy, ctx.op_resource_reservation_enabled,
              ctx.op_resource_reservation_ratio)

    spec = GenSpec(num_partitions=2, events_per_partition=200, seed=31)
    base = synth_repo_files(5, 10, seed=31)
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=4, shuffle_strategy="HASH_SHUFFLE",
                       op_reservation_ratio=0.2)
    run_replay(change_event_dataset(spec, base), cfg)
    after = (ctx.shuffle_strategy, ctx.op_resource_reservation_enabled,
             ctx.op_resource_reservation_ratio)
    assert after == before

    # failure path: a version-conflict abort must restore too
    store = SnapshotStore(cfg.snapshot_dir)
    assert store.current_version() == 1
    import pytest as _pt

    class Boom(Exception):
        pass

    def explode(*a, **k):
        raise Boom()

    orig = SnapshotStore.commit
    SnapshotStore.commit = explode
    try:
        with _pt.raises(Exception):
            run_replay(change_event_dataset(
                GenSpec(num_partitions=2, events_per_partition=200, seed=32),
                base), cfg)
    finally:
        SnapshotStore.commit = orig
    assert (ctx.shuffle_strategy, ctx.op_resource_reservation_enabled,
            ctx.op_resource_reservation_ratio) == before


def test_point_lookup_reads_only_touched_buckets(tmp_path, monkeypatch):
    """GET semantics over the Parquet store: present keys return their
    live row, tombstoned and absent keys return nothing, and only the
    buckets the keys hash to are opened (file-read accounting)."""
    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import point_lookup, run_replay
    from kafka_connect_mongo_ray.state import snapshot as snap_mod
    from kafka_connect_mongo_ray.utils import hash_buckets

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=8)
    base = dict(commit="", lang="py", partition_id=0, inc=0)
    rows = [dict(ts=1, op="i", repo="r0", path=f"p{i}",
                 content=f"c{i}", **base) for i in range(40)]
    rows.append(dict(ts=2, op="d", repo="r0", path="p7", content=None,
                     **base))
    from tests.test_oracle_and_gen import make_events

    run_replay(ds_from_table(make_events(rows)), cfg)

    opened = []
    real = snap_mod.SnapshotStore.read_bucket

    def counting(self, version, bucket):
        opened.append(int(bucket))
        return real(self, version, bucket)

    monkeypatch.setattr(snap_mod.SnapshotStore, "read_bucket", counting)
    keys = [("r0", "p3"), ("r0", "p7"), ("r0", "nope")]
    t = point_lookup(cfg, keys)
    got = {r["path"]: r["content"] for r in t.to_pylist()}
    assert got == {"p3": "c3"}  # p7 tombstoned, nope absent
    kt = pa.table({"repo": pa.array([k[0] for k in keys]),
                   "path": pa.array([k[1] for k in keys])})
    expect = set(int(b) for b in hash_buckets(kt, ["repo", "path"], 8))
    assert set(opened) <= expect and len(opened) <= len(expect)
