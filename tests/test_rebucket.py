"""Store re-bucketing (state/snapshot.py::run_rebucket): one hash
exchange to a new bucket count, rows (including tombstones) preserved,
manifest-recorded num_buckets drives readers afterwards."""

import pyarrow as pa

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import (
    final_state_table,
    point_lookup,
    run_replay,
)
from kafka_connect_mongo_ray.state.snapshot import SnapshotStore, run_rebucket
from tests.test_oracle_and_gen import make_events
from tests.test_replay_e2e import ds_from_table

BASE = dict(commit="c", lang="l", inc=0, partition_id=0)


def _store(tmp_path, num_buckets=2):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=num_buckets, snapshot_rows_per_file=7)
    rows = [dict(ts=i + 1, op="i", repo=f"r{i % 3}", path=f"p{i:03d}",
                 content=f"c{i}", **BASE) for i in range(40)]
    # one tombstone: rebucket must move suppression state too
    rows.append(dict(ts=100, op="d", repo="r0", path="p000",
                     content=None, **BASE))
    run_replay(ds_from_table(make_events(rows), 1), cfg)
    return cfg


def test_rebucket_preserves_state_and_records_contract(
        tmp_path, ray_session):
    cfg = _store(tmp_path)
    before = final_state_table(cfg).to_pandas()
    tokens_before = SnapshotStore(cfg.snapshot_dir,
                                  create=False).tokens(1)

    res = run_rebucket(cfg.snapshot_dir, 5, rows_per_file=7)
    assert res["num_buckets"] == 5 and res["rebucketed"] == 5

    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v = store.current_version()
    m = store.manifest(v)
    assert m["num_buckets"] == 5
    assert store.tokens(v) == tokens_before  # progress carried verbatim

    after = final_state_table(cfg, version=v).to_pandas()
    assert before.equals(after)

    # tombstone moved: raw state row count = live + 1
    raw = sum(store.read_bucket(v, b).num_rows for b in range(5)
              if store.read_bucket(v, b) is not None)
    assert raw == len(after) + 1

    # fresh files carry zone maps
    rels = [r for rs in m["buckets"].values()
            for r in ([rs] if isinstance(rs, str) else rs)]
    assert set(m["file_stats"]) == set(rels)

    # point GET uses the MANIFEST's bucket count even when cfg still
    # says the old one (the contract the rebucket exists to protect)
    t = point_lookup(cfg, [("r1", "p010")])  # cfg.num_buckets == 2
    assert t is not None and t.num_rows == 1
    assert t["content"][0].as_py() == "c10"
    # the tombstoned key answers absent
    assert point_lookup(cfg, [("r0", "p000")]) is None


def test_shrink_rebucket_drops_old_modulus_buckets(tmp_path, ray_session):
    """Shrinking (5 → 2) must NOT carry forward old buckets 2-4: a
    surviving old-modulus file would double every row it holds in
    scans (the code-review repro)."""
    cfg = _store(tmp_path, num_buckets=5)
    before = final_state_table(cfg).to_pandas()

    run_rebucket(cfg.snapshot_dir, 2, rows_per_file=7)

    store = SnapshotStore(cfg.snapshot_dir, create=False)
    m = store.manifest(store.current_version())
    assert set(m["buckets"]) <= {"0", "1"}
    after = final_state_table(cfg, version=store.current_version()
                              ).to_pandas()
    assert before.equals(after)  # no duplicates, nothing lost
    # lineage metrics describe the NEW layout only, and healthcheck's
    # live_rows sum stays truthful
    assert {mm["bucket"] for mm in m["metrics"]} <= {0, 1}
    assert sum(mm["live_rows"] for mm in m["metrics"]) == len(after)


def test_replay_refuses_stale_bucket_config(tmp_path, ray_session):
    """An incremental replay with a pre-rebucket config must refuse:
    merging mod-2 events into a mod-5 store resurfaces superseded
    rows and breaks tombstone suppression (the code-review repro)."""
    import pytest

    from kafka_connect_mongo_ray.config import ConfigError

    cfg = _store(tmp_path, num_buckets=2)
    run_rebucket(cfg.snapshot_dir, 5, rows_per_file=7)

    rows = [dict(ts=200, op="u", repo="r0", path="p001",
                 content="new", **BASE)]
    with pytest.raises(ConfigError, match="store layout is 5 buckets"):
        run_replay(ds_from_table(make_events(rows), 1), cfg)

    # with the matching config the same window applies cleanly
    cfg5 = EngineConfig(snapshot_dir=cfg.snapshot_dir,
                        checkpoint_dir=cfg.checkpoint_dir,
                        num_buckets=5, snapshot_rows_per_file=7)
    run_replay(ds_from_table(make_events(rows), 1), cfg5)
    t = point_lookup(cfg5, [("r0", "p001")])
    assert t["content"][0].as_py() == "new"
