"""Predicate delete over the snapshot store
(state/snapshot.py::run_delete_where): retention by ts cutoff and
right-to-erasure by repo, tombstone vs purge semantics, zone-map bucket
pruning, COW carry-forward of untouched buckets, and the LWW
suppression contract for redelivered images."""

import pytest

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import final_state_table, run_replay
from kafka_connect_mongo_ray.state.snapshot import (
    SnapshotStore,
    run_delete_where,
)
from tests.test_oracle_and_gen import make_events
from tests.test_replay_e2e import ds_from_table

BASE = dict(commit="c", lang="l", inc=0, partition_id=0)


def _store(tmp_path, rows=None, num_buckets=2):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=num_buckets, snapshot_rows_per_file=7)
    if rows is None:
        rows = [dict(ts=i + 1, op="i", repo=f"r{i % 3}", path=f"p{i:03d}",
                     content=f"c{i}", **BASE) for i in range(40)]
    run_replay(ds_from_table(make_events(rows), 1), cfg)
    return cfg


def test_retention_tombstone_removes_old_rows(tmp_path, ray_session):
    cfg = _store(tmp_path)
    before = final_state_table(cfg).to_pandas()
    assert len(before) == 40

    res = run_delete_where(cfg.snapshot_dir, ts_before=21)
    assert res["mode"] == "tombstone"
    assert res["rows_deleted"] == 20
    assert res["new_version"] == res["version"] + 1

    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v = store.current_version()
    after = final_state_table(cfg, version=v).to_pandas()
    assert len(after) == 20
    assert set(after["content"]) == {f"c{i}" for i in range(20, 40)}
    # tombstone mode keeps the rows as suppression state
    raw = sum(store.read_bucket(v, b).num_rows for b in range(2)
              if store.read_bucket(v, b) is not None)
    assert raw == 40
    # progress carried verbatim
    assert store.tokens(v) == store.tokens(res["version"])


def test_purge_physically_removes_rows(tmp_path, ray_session):
    cfg = _store(tmp_path)
    res = run_delete_where(cfg.snapshot_dir, ts_before=21, mode="purge")
    assert res["rows_deleted"] == 20
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v = store.current_version()
    raw = sum(store.read_bucket(v, b).num_rows for b in range(2)
              if store.read_bucket(v, b) is not None)
    assert raw == 20
    assert len(final_state_table(cfg, version=v).to_pandas()) == 20


def test_zone_map_prunes_to_noop(tmp_path, ray_session):
    cfg = _store(tmp_path)
    # every stored ts >= 1, so a cutoff of 1 matches nothing — the ts
    # zone maps prove it without reading a single bucket
    res = run_delete_where(cfg.snapshot_dir, ts_before=1)
    assert res["rows_deleted"] == 0
    assert res["new_version"] == res["version"]  # no commit
    assert res["buckets_pruned"] == 2
    # same for a repo outside every file's key range
    res = run_delete_where(cfg.snapshot_dir, repo_equals="zzz")
    assert res["rows_deleted"] == 0 and res["buckets_pruned"] == 2


def test_untouched_buckets_carry_forward(tmp_path, ray_session):
    # one extra repo that sorts BELOW r0 so key-range zone maps can
    # exclude it from buckets that don't hold it
    rows = [dict(ts=i + 1, op="i", repo=f"r{i % 3}", path=f"p{i:03d}",
                 content=f"c{i}", **BASE) for i in range(40)]
    rows.append(dict(ts=100, op="i", repo="aaa", path="x",
                     content="erase-me", **BASE))
    cfg = _store(tmp_path, rows=rows)
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v0 = store.current_version()
    m0 = store.manifest(v0)

    res = run_delete_where(cfg.snapshot_dir, repo_equals="aaa")
    assert res["rows_deleted"] == 1
    assert res["buckets_rewritten"] + res["buckets_pruned"] == 2
    assert res["buckets_pruned"] >= 1

    m1 = store.manifest(store.current_version())
    carried = [b for b in m1["buckets"]
               if m1["buckets"][b] == m0["buckets"][b]]
    assert len(carried) == res["buckets_pruned"]  # identical file refs
    after = final_state_table(cfg).to_pandas()
    assert "erase-me" not in set(after["content"])
    assert len(after) == 40


def test_redelivered_image_stays_dead_then_new_data_resurrects(
        tmp_path, ray_session):
    cfg = _store(tmp_path)
    res = run_delete_where(cfg.snapshot_dir, repo_equals="r1")
    assert res["rows_deleted"] > 0
    dts = res["delete_ts"]
    assert dts is not None

    # an at-least-once REDELIVERY of an erased image (its original ts
    # ranks below the tombstone) must stay dead ...
    dup = [dict(ts=2, op="i", repo="r1", path="p001", content="c1",
                **BASE)]
    # ... while genuinely new data (ts above the tombstone) resurrects
    fresh = [dict(ts=dts + 5, op="i", repo="r1", path="p004",
                  content="new", **BASE)]
    cfg2 = EngineConfig(snapshot_dir=cfg.snapshot_dir,
                        checkpoint_dir=str(tmp_path / "c2"),
                        num_buckets=2, snapshot_rows_per_file=7)
    run_replay(ds_from_table(make_events(dup + fresh), 1), cfg2)

    after = final_state_table(cfg2).to_pandas()
    keyed = {(r, p): c for r, p, c in
             zip(after["repo"], after["path"], after["content"])}
    assert ("r1", "p001") not in keyed
    assert keyed.get(("r1", "p004")) == "new"


def test_idempotent_rerun_and_arg_validation(tmp_path, ray_session):
    cfg = _store(tmp_path)
    run_delete_where(cfg.snapshot_dir, ts_before=21)
    res = run_delete_where(cfg.snapshot_dir, ts_before=21)
    assert res["rows_deleted"] == 0  # already tombstoned

    with pytest.raises(ValueError):
        run_delete_where(cfg.snapshot_dir)
    with pytest.raises(ValueError):
        run_delete_where(cfg.snapshot_dir, ts_before=1, mode="nuke")
