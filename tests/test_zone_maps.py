"""Zone-map file pruning for key-range scans over the snapshot store.

Part files are contiguous slices of the canonically (repo, path)-sorted
bucket, so their first/last rows are exact key bounds; commit() records
them in the manifest (state/snapshot.py::write_bucket_staging /
commit) and key_range_dataset prunes on pure manifest arithmetic.
"""

import json
import os

import pyarrow.compute as pc
import pytest

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import (
    final_state_table,
    key_range_dataset,
    run_replay,
)
from kafka_connect_mongo_ray.state.snapshot import SnapshotStore
from tests.test_oracle_and_gen import make_events
from tests.test_replay_e2e import ds_from_table

BASE = dict(commit="c", lang="l", inc=0, partition_id=0)


@pytest.fixture()
def split_store(tmp_path, ray_session):
    """A store whose buckets split into several part files (small
    rows_per_file) over 60 keys across 3 repos."""
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=2, snapshot_rows_per_file=5)
    rows = [dict(ts=i + 1, op="i", repo=f"r{i % 3}", path=f"p{i:03d}",
                 content=f"c{i}", **BASE) for i in range(60)]
    run_replay(ds_from_table(make_events(rows), 1), cfg)
    return cfg


def _range_rows(cfg, lo, hi):
    full = final_state_table(cfg)
    repo, path = full["repo"], full["path"]
    ge = pc.or_(pc.greater(repo, lo[0]),
                pc.and_(pc.equal(repo, lo[0]),
                        pc.greater_equal(path, lo[1])))
    le = pc.or_(pc.less(repo, hi[0]),
                pc.and_(pc.equal(repo, hi[0]), pc.less_equal(path, hi[1])))
    return full.filter(pc.and_(ge, le))


def test_manifest_carries_file_stats(split_store):
    store = SnapshotStore(split_store.snapshot_dir, create=False)
    m = store.manifest(store.current_version())
    rels = [r for rs in m["buckets"].values()
            for r in ([rs] if isinstance(rs, str) else rs)]
    assert len(rels) > 4  # the point of rows_per_file=5
    stats = m["file_stats"]
    assert set(stats) == set(rels)
    for r in rels:
        st = stats[r]
        assert st["rows"] > 0
        assert tuple(st["first_key"]) <= tuple(st["last_key"])
        assert st["ts"][0] <= st["ts"][1]
    # no sidecars survive the commit
    vdir = os.path.join(store.root, f"v{store.current_version():06d}")
    assert not [f for f in os.listdir(vdir) if f.endswith(".zmap.json")]


def test_range_scan_prunes_and_matches_full_filter(split_store):
    lo, hi = ("r1", "p000"), ("r1", "p999")
    ds = key_range_dataset(split_store, lo, hi)
    got = ds.to_pandas().sort_values(["repo", "path"], ignore_index=True)
    want = (_range_rows(split_store, lo, hi).to_pandas()
            .sort_values(["repo", "path"], ignore_index=True))
    assert got[["repo", "path", "content"]].equals(
        want[["repo", "path", "content"]])
    assert len(got) == 20  # one repo of three
    # pruning must actually skip files: r1 spans ~1/3 of each sorted
    # bucket, so interior r0/r2 part files never open
    assert ds.files_scanned < ds.files_total


def test_empty_range_scans_nothing(split_store):
    ds = key_range_dataset(split_store, ("zzz", "a"), ("zzz", "z"))
    assert ds.files_scanned == 0
    assert ds.count() == 0


def test_stats_missing_falls_back_to_full_scan(split_store):
    store = SnapshotStore(split_store.snapshot_dir, create=False)
    v = store.current_version()
    mp = os.path.join(store.root, f"v{v:06d}", "manifest.json")
    m = json.load(open(mp))
    m.pop("file_stats")
    json.dump(m, open(mp, "w"))
    lo, hi = ("r1", "p000"), ("r1", "p999")
    ds = key_range_dataset(split_store, lo, hi)
    assert ds.files_scanned == ds.files_total  # conservative
    assert ds.count() == 20  # residual filter still correct


def test_point_lookup_prunes_part_files(split_store):
    from kafka_connect_mongo_ray.pipelines.cdc import point_lookup
    from kafka_connect_mongo_ray.utils import hash_buckets
    import pyarrow as pa

    t = point_lookup(split_store, [("r1", "p010")])
    assert t.num_rows == 1 and t["content"][0].as_py() == "c10"

    # the pruned bucket read must open fewer rows than the full bucket
    store = SnapshotStore(split_store.snapshot_dir, create=False)
    v = store.current_version()
    key_t = pa.table({"repo": ["r1"], "path": ["p010"]})
    b = int(hash_buckets(key_t, ["repo", "path"],
                         split_store.num_buckets)[0])
    pruned = store.read_bucket_for_keys(v, b, [("r1", "p010")])
    full = store.read_bucket(v, b)
    assert pruned.num_rows <= 5 < full.num_rows  # one part file of 5

    # absent key outside every part file's bounds: nothing opened
    assert store.read_bucket_for_keys(v, b, [("zz", "x")]) is None


def test_compaction_preserves_zone_maps(split_store):
    from kafka_connect_mongo_ray.state.snapshot import run_compaction

    res = run_compaction(split_store.snapshot_dir, min_files=2,
                         rows_per_file=50)
    assert res["compacted"] > 0
    store = SnapshotStore(split_store.snapshot_dir, create=False)
    m = store.manifest(store.current_version())
    rels = [r for rs in m["buckets"].values()
            for r in ([rs] if isinstance(rs, str) else rs)]
    assert set(m["file_stats"]) == set(rels)
    lo, hi = ("r1", "p000"), ("r1", "p999")
    assert key_range_dataset(split_store, lo, hi).count() == 20
