"""Zero-copy store branching (state/snapshot.py::run_branch):
hardlinked part files, carried manifest/tokens/zone-maps, and full
independence of the two roots afterwards (divergence both ways, gc
safety through the hardlinks)."""

import os

import pytest

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.pipelines.cdc import final_state_table, run_replay
from kafka_connect_mongo_ray.state.snapshot import (
    SnapshotStore,
    run_branch,
    run_delete_where,
)
from tests.test_oracle_and_gen import make_events
from tests.test_replay_e2e import ds_from_table

BASE = dict(commit="c", lang="l", inc=0, partition_id=0)


def _store(tmp_path):
    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"),
                       num_buckets=2, snapshot_rows_per_file=7)
    rows = [dict(ts=i + 1, op="i", repo=f"r{i % 3}", path=f"p{i:03d}",
                 content=f"c{i}", **BASE) for i in range(40)]
    run_replay(ds_from_table(make_events(rows), 1), cfg)
    return cfg


def _cfg_for(tmp_path, root, name):
    return EngineConfig(snapshot_dir=root,
                        checkpoint_dir=str(tmp_path / name),
                        num_buckets=2, snapshot_rows_per_file=7)


def test_branch_equals_source_and_carries_metadata(tmp_path, ray_session):
    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    res = run_branch(cfg.snapshot_dir, bdir)
    assert res["files_linked"] > 0 and res["buckets"] == 2

    src = SnapshotStore(cfg.snapshot_dir, create=False)
    br = SnapshotStore(bdir, create=False)
    assert br.current_version() == 1
    m = br.manifest(1)
    assert m["num_buckets"] == src.manifest(src.current_version()).get(
        "num_buckets")
    assert br.tokens(1) == src.tokens(src.current_version())
    # zone maps re-keyed onto the branch's own rels
    rels = [r for rs in m["buckets"].values()
            for r in ([rs] if isinstance(rs, str) else rs)]
    assert set(m["file_stats"]) == set(rels)

    a = final_state_table(cfg).to_pandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    b = final_state_table(_cfg_for(tmp_path, bdir, "cb")).to_pandas(
        ).sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b)


def test_branches_diverge_independently(tmp_path, ray_session):
    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    run_branch(cfg.snapshot_dir, bdir)

    # mutate the BRANCH: delete a repo there
    run_delete_where(bdir, repo_equals="r1")
    # mutate the SOURCE: ingest one more row
    cfg2 = _cfg_for(tmp_path, cfg.snapshot_dir, "c2")
    run_replay(ds_from_table(make_events(
        [dict(ts=200, op="i", repo="zz", path="new", content="src-only",
              **BASE)]), 1), cfg2)

    src_state = final_state_table(cfg2).to_pandas()
    br_state = final_state_table(_cfg_for(tmp_path, bdir, "cb")).to_pandas()
    assert "src-only" in set(src_state["content"])
    assert "src-only" not in set(br_state["content"])
    assert not (br_state["repo"] == "r1").any()
    assert (src_state["repo"] == "r1").any()


def test_branch_survives_source_gc(tmp_path, ray_session):
    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    run_branch(cfg.snapshot_dir, bdir)

    # advance the source twice, then gc down to the last version —
    # the files the branch hardlinked may vanish from the source tree
    for i in range(2):
        cfg2 = _cfg_for(tmp_path, cfg.snapshot_dir, f"cg{i}")
        run_delete_where(cfg.snapshot_dir, repo_equals=f"r{i}",
                         mode="purge")
    SnapshotStore(cfg.snapshot_dir, create=False).gc(keep_last=1)

    br_state = final_state_table(_cfg_for(tmp_path, bdir, "cb")).to_pandas()
    assert len(br_state) == 40  # every original row still readable


def test_branch_refuses_nonempty_target(tmp_path, ray_session):
    cfg = _store(tmp_path)
    bdir = tmp_path / "b"
    bdir.mkdir()
    (bdir / "junk").write_text("x")
    with pytest.raises(ValueError):
        run_branch(cfg.snapshot_dir, str(bdir))
    # and an uncommitted source
    empty = tmp_path / "nosnap"
    os.makedirs(empty / "vx", exist_ok=True)
    with pytest.raises(Exception):
        run_branch(str(empty), str(tmp_path / "b2"))


def test_store_diff_aligned_and_exchange(tmp_path, ray_session):
    from kafka_connect_mongo_ray.state.snapshot import (
        run_rebucket,
        run_store_diff,
    )

    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    run_branch(cfg.snapshot_dir, bdir)

    same = run_store_diff(cfg.snapshot_dir, bdir)
    assert same["identical"] and same["mode"] == "aligned"
    assert same["equal"] == 40

    # diverge: delete r1 on the branch, add a row + update a row on
    # the source
    run_delete_where(bdir, repo_equals="r1")
    cfg2 = _cfg_for(tmp_path, cfg.snapshot_dir, "cd")
    run_replay(ds_from_table(make_events([
        dict(ts=200, op="i", repo="zz", path="new", content="x", **BASE),
        dict(ts=201, op="u", repo="r0", path="p000", content="changed",
             **BASE)]), 1), cfg2)

    d = run_store_diff(cfg.snapshot_dir, bdir)
    assert d["mode"] == "aligned" and not d["identical"]
    n_r1 = sum(1 for i in range(40) if i % 3 == 1)
    assert d["only_a"] == n_r1 + 1  # deleted on branch + source-only new
    assert d["only_b"] == 0
    assert d["differ"] == 1 and d["examples"]["differ"] == ["r0/p000"]

    # mismatched bucket contracts take the exchange path, same answer
    run_rebucket(bdir, 5)
    d2 = run_store_diff(cfg.snapshot_dir, bdir)
    assert d2["mode"] == "exchange"
    assert (d2["only_a"], d2["only_b"], d2["differ"]) == (
        d["only_a"], d["only_b"], d["differ"])


def test_store_sync_ships_only_changed_buckets(tmp_path, ray_session):
    from kafka_connect_mongo_ray.state.snapshot import (
        run_store_diff,
        run_store_sync,
    )

    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    run_branch(cfg.snapshot_dir, bdir)

    # replica in sync already → no-op
    res = run_store_sync(cfg.snapshot_dir, bdir)
    assert res["identical"] and res["buckets_shipped"] == 0

    # advance the source: one new key (touches one bucket)
    cfg2 = _cfg_for(tmp_path, cfg.snapshot_dir, "cs")
    run_replay(ds_from_table(make_events(
        [dict(ts=300, op="i", repo="zz", path="sync-me",
              content="fresh", **BASE)]), 1), cfg2)

    res = run_store_sync(cfg.snapshot_dir, bdir)
    assert not res["identical"]
    assert res["buckets_shipped"] == 1  # only the touched bucket moved

    d = run_store_diff(cfg.snapshot_dir, bdir)
    assert d["identical"]
    # replica adopted the source's progress
    src = SnapshotStore(cfg.snapshot_dir, create=False)
    br = SnapshotStore(bdir, create=False)
    assert br.tokens(br.current_version()) == src.tokens(
        src.current_version())

    # a second sync is a no-op
    res = run_store_sync(cfg.snapshot_dir, bdir)
    assert res["identical"]


def test_store_sync_overwrites_replica_divergence(tmp_path, ray_session):
    from kafka_connect_mongo_ray.state.snapshot import (
        run_store_diff,
        run_store_sync,
    )

    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    run_branch(cfg.snapshot_dir, bdir)
    # replica diverges locally; sync restores the source's state
    run_delete_where(bdir, repo_equals="r1")
    res = run_store_sync(cfg.snapshot_dir, bdir)
    assert res["buckets_shipped"] >= 1
    assert run_store_diff(cfg.snapshot_dir, bdir)["identical"]


def test_store_sync_refuses_contract_mismatch(tmp_path, ray_session):
    from kafka_connect_mongo_ray.state.snapshot import (
        run_rebucket,
        run_store_sync,
    )

    cfg = _store(tmp_path)
    bdir = str(tmp_path / "b")
    run_branch(cfg.snapshot_dir, bdir)
    run_rebucket(bdir, 5)
    with pytest.raises(ValueError):
        run_store_sync(cfg.snapshot_dir, bdir)
