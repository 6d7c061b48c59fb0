"""Store rollback (state/snapshot.py::run_rollback): restore an
earlier version as a manifest-sized COW commit, rewind resume tokens so
replays redeliver, survive gc, and refuse impossible targets."""

import pandas as pd
import pytest

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import final_state_table, run_replay
from kafka_connect_mongo_ray.state.snapshot import SnapshotStore, run_rollback
from tests.test_oracle_and_gen import make_events
from tests.test_replay_e2e import ds_from_table

BASE = dict(commit="c", lang="l", inc=0, partition_id=0)


def _rows(lo, hi, op="i"):
    return [dict(ts=i + 1, op=op, repo=f"r{i % 3}", path=f"p{i % 20:03d}",
                 content=f"c{i}", **BASE) for i in range(lo, hi)]


@pytest.fixture()
def two_version_store(tmp_path):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=2, snapshot_rows_per_file=7)
    run_replay(ds_from_table(make_events(_rows(0, 40)), 1), cfg)
    # second batch overwrites some keys and adds new ones
    run_replay(ds_from_table(make_events(_rows(40, 60)), 1), cfg)
    return cfg


def _state(cfg, version=None) -> pd.DataFrame:
    return final_state_table(cfg, version=version).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)


def test_rollback_restores_state_and_tokens(two_version_store):
    cfg = two_version_store
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    assert store.current_version() == 2
    v1_state = _state(cfg, version=1)
    v2_state = _state(cfg, version=2)
    assert not v1_state.equals(v2_state)

    res = run_rollback(cfg.snapshot_dir, 1)
    assert res["rolled_back"] and res["new_version"] == 3
    assert store.current_version() == 3
    pd.testing.assert_frame_equal(_state(cfg), v1_state)
    assert store.tokens(3) == store.tokens(1)
    m = store.manifest(3)
    assert m["rollback_of"] == 1 and m["parent"] == 2
    # contract + zone maps carried verbatim
    assert m["num_buckets"] == store.manifest(1).get("num_buckets")
    assert m["file_stats"] == store.manifest(1).get("file_stats")


def test_replay_after_rollback_redelivers(two_version_store):
    cfg = two_version_store
    v2_state = _state(cfg, version=2)
    run_rollback(cfg.snapshot_dir, 1)
    # the rolled-back tokens sit at batch 1's high point, so replaying
    # the full event stream redelivers exactly batch 2
    res = run_replay(ds_from_table(make_events(_rows(0, 60)), 1), cfg)
    assert res["events_in"] == 20
    pd.testing.assert_frame_equal(_state(cfg), v2_state)


def test_rollback_survives_gc(two_version_store):
    cfg = two_version_store
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v1_state = _state(cfg, version=1)
    run_rollback(cfg.snapshot_dir, 1)  # v3 references v1's files
    gc = store.gc(keep_last=1)
    # v1's part files are referenced by the kept v3 manifest: the
    # version dir may lose only its manifest, never a referenced file
    assert 1 not in gc["deleted_versions"]
    pd.testing.assert_frame_equal(_state(cfg), v1_state)


def test_rollback_refusals(two_version_store):
    cfg = two_version_store
    with pytest.raises(ValueError, match="garbage-collected"):
        run_rollback(cfg.snapshot_dir, 99)
    res = run_rollback(cfg.snapshot_dir, 2)
    assert res["rolled_back"] is False
    assert SnapshotStore(cfg.snapshot_dir, create=False).current_version() == 2


def test_rollback_is_itself_undoable(two_version_store):
    cfg = two_version_store
    v2_state = _state(cfg, version=2)
    run_rollback(cfg.snapshot_dir, 1)   # v3 = v1 content
    run_rollback(cfg.snapshot_dir, 2)   # v4 = v2 content again
    store = SnapshotStore(cfg.snapshot_dir, create=False)
    assert store.current_version() == 4
    pd.testing.assert_frame_equal(_state(cfg), v2_state)
