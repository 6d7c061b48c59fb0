"""Round-2 hardening (ADVICE.md): malformed-row tolerance, staging
clobber detection, gc reporting, explicit-version errors."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA
from kafka_connect_mongo_ray.stages.normalize import normalize_batch
from kafka_connect_mongo_ray.state.snapshot import SnapshotStore, StagingClobberedError


def _events(rows):
    """rows: list of (ts, inc, op, repo, path, content, partition_id)."""
    return pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.int64()),
            "inc": pa.array([r[1] for r in rows], pa.int32()),
            "op": pa.array([r[2] for r in rows], pa.string()),
            "repo": pa.array([r[3] for r in rows], pa.string()),
            "path": pa.array([r[4] for r in rows], pa.string()),
            "commit": pa.array(["" for _ in rows], pa.string()),
            "lang": pa.array(["" for _ in rows], pa.string()),
            "content": pa.array([r[5] for r in rows], pa.large_string()),
            "partition_id": pa.array([r[6] for r in rows], pa.int32()),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def test_null_inc_and_op_rows_skipped():
    """A row with null inc (or null op) is malformed → skipped like any
    other malformed record, not a poison pill for the whole window."""
    tbl = _events(
        [
            (10, 1, "i", "r", "a", "x", 0),
            (11, None, "u", "r", "a", "y", 0),  # null inc — must be skipped
            (12, 2, None, "r", "b", "z", 0),    # null op — must be skipped
            (13, 3, "u", "r", "a", "y2", 0),
        ]
    )
    out = normalize_batch(tbl, num_buckets=4)
    events = out.filter(pc.not_equal(out["repo"], ""))
    assert events.num_rows == 2
    assert set(events["content"].to_pylist()) == {"x", "y2"}


def test_negative_partition_id_skipped():
    """Negative partition ids (reachable from external WAL producers)
    must be treated as malformed — NOT wrap around the checkpoint LUT
    and borrow another partition's resume token."""
    tbl = _events(
        [
            (10, 1, "i", "r", "a", "x", 0),
            (99, 9, "i", "r", "b", "bad", -3),  # negative pid — skipped
        ]
    )
    # tokens for partition 3 would be hit by -3 via numpy wraparound
    out = normalize_batch(tbl, num_buckets=4, tokens={0: (5, 0), 3: (100, 0)})
    events = out.filter(pc.not_equal(out["repo"], ""))
    assert events["content"].to_pylist() == ["x"]


def test_staging_nonce_isolated_and_clobber_detected(tmp_path):
    """Two drivers racing toward the same version stage into private
    dirs; a clobbered staged file fails the commit loudly instead of
    silently committing with advanced tokens."""
    store = SnapshotStore(str(tmp_path / "snap"))
    state = pa.table(
        {
            "repo": ["r"], "path": ["p"], "commit": [""], "lang": [""],
            "content": pa.array(["c"], pa.large_string()),
            "ts": pa.array([1], pa.int64()), "inc": pa.array([0], pa.int32()),
            "op_rank": pa.array([0], pa.int8()),
        }
    )
    path_a = store.write_bucket_staging(1, 0, state, nonce="joba")
    # driver B cleaning its own staging must not touch A's files
    store.clean_staging(1, nonce="jobb")
    for p in path_a.split(","):
        assert os.path.isfile(p)
    # simulate a clobber: delete A's staged file, then commit with audit
    for p in path_a.split(","):
        os.unlink(p)
    with pytest.raises(StagingClobberedError):
        store.commit(1, tokens={}, prev_version=0, nonce="joba",
                     expected_files=path_a.split(","))
    # CURRENT must not have advanced
    assert store.current_version() == 0


def test_gc_reports_partial_versions(tmp_path):
    """gc() must only report versions as deleted when their dir was
    actually removed; versions kept alive by carried-forward files are
    reported separately."""
    store = SnapshotStore(str(tmp_path / "snap"))
    state = pa.table(
        {
            "repo": ["r"], "path": ["p"], "commit": [""], "lang": [""],
            "content": pa.array(["c"], pa.large_string()),
            "ts": pa.array([1], pa.int64()), "inc": pa.array([0], pa.int32()),
            "op_rank": pa.array([0], pa.int8()),
        }
    )
    # v1 writes bucket 0; v2 and v3 carry it forward (commit merges the
    # previous manifest), so v1's file stays referenced by kept manifests
    f1 = store.write_bucket_staging(1, 0, state)
    store.commit(1, tokens={}, prev_version=0, expected_files=f1.split(","))
    store.staging_dir(2)
    store.commit(2, tokens={}, prev_version=1)
    store.staging_dir(3)
    store.commit(3, tokens={}, prev_version=2)
    out = store.gc(keep_last=2)
    assert out["kept_versions"] == [2, 3]
    assert 1 in out["partially_cleaned"]
    assert 1 not in out["deleted_versions"]
    # and the carried-forward file still exists + is readable
    assert store.read_bucket(3, 0).num_rows == 1


def test_missing_version_raises(tmp_path):
    from kafka_connect_mongo_ray.pipelines.cdc import (
        final_state_dataset,
        final_state_table,
    )

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "snap"),
                       checkpoint_dir=str(tmp_path / "ckpt"))
    SnapshotStore(cfg.snapshot_dir)  # empty store
    with pytest.raises(ValueError, match="no manifest"):
        final_state_dataset(cfg, version=7)
    with pytest.raises(ValueError, match="no manifest"):
        final_state_table(cfg, version=7)


def test_stale_staging_swept_after_commit(tmp_path):
    """Orphaned staging dirs of already-committed versions are removed;
    dirs targeting future versions (possibly a live job) survive."""
    store = SnapshotStore(str(tmp_path / "snap"))
    store.staging_dir(1, nonce="dead")
    store.staging_dir(1)
    store.commit(1, tokens={}, prev_version=0)
    live = store.staging_dir(2, nonce="live")
    removed = store.clean_stale_staging()
    assert any(".staging-v000001.dead" in r for r in removed)
    assert os.path.isdir(live)
