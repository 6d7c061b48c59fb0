"""WAL tailer: file-offset resume, late-appended files, crash window."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset
from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
from kafka_connect_mongo_ray.sources.wal import WalTailer, tail_wal
from tests.test_replay_e2e import engine_sha_map


@pytest.fixture()
def wal_setup(tmp_path, tmp_engine_dirs):
    base = synth_repo_files(4, 10, seed=101)
    ev = gen_all_events(GenSpec(num_partitions=4, events_per_partition=300,
                                seed=101, dup_frac=0.1), base)
    log = tmp_path / "wal"
    log.mkdir()
    # three log segments in ts order (monotone file names)
    n = ev.num_rows
    for i, (off, ln) in enumerate([(0, n // 3), (n // 3, n // 3), (2 * (n // 3), n)]):
        seg = ev.sort_by([("ts", "ascending")]).slice(off, ln - off if i < 2 else n - off)
        pq.write_table(seg, str(log / f"{i:012d}-seg.parquet"))
    return str(log), tmp_engine_dirs, ev


def test_tail_wal_drains_and_resumes(wal_setup):
    log, cfg, ev = wal_setup
    sums = tail_wal(log, cfg, max_files_per_window=2)
    assert [len(s["wal_files"]) for s in sums] == [2, 1]
    want = content_sha256_map(final_table(replay(ev)))
    assert engine_sha_map(final_state_dataset(cfg)) == want
    # fully drained: another tail call is a no-op
    assert tail_wal(log, cfg) == []


def test_tail_wal_picks_up_appended_files(wal_setup, tmp_path):
    log, cfg, ev = wal_setup
    tail_wal(log, cfg)
    # producer appends a late segment with newer events
    base = synth_repo_files(4, 10, seed=101)
    late = gen_all_events(
        GenSpec(num_partitions=4, events_per_partition=100, seed=202,
                base_ts=1_700_000_000), base)
    pq.write_table(late, os.path.join(log, "000000000099-late.parquet"))
    sums = tail_wal(log, cfg)
    assert len(sums) == 1 and sums[0]["wal_files"] == ["000000000099-late.parquet"]
    want = content_sha256_map(final_table(replay(pa.concat_tables([ev, late]))))
    assert engine_sha_map(final_state_dataset(cfg)) == want


def test_tail_wal_crash_between_commits_replays_idempotently(wal_setup, monkeypatch):
    """Crash AFTER snapshot commit but BEFORE the file-offset write:
    the window's files replay next time; engine tokens make it a no-op."""
    log, cfg, ev = wal_setup
    crashed = {"done": False}
    real = WalTailer.commit_files

    def crashing(self, files):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("crash before file-offset commit")
        return real(self, files)

    monkeypatch.setattr(WalTailer, "commit_files", crashing)
    with pytest.raises(RuntimeError):
        tail_wal(log, cfg, max_files_per_window=2)
    monkeypatch.setattr(WalTailer, "commit_files", real)
    sums = tail_wal(log, cfg, max_files_per_window=2)  # replay window + final window
    # the replayed window (files 0,1 — already applied) is token-filtered to zero
    assert sums[0]["wal_files"] == ["000000000000-seg.parquet", "000000000001-seg.parquet"]
    assert sums[0]["events_in"] == 0
    want = content_sha256_map(final_table(replay(ev)))
    assert engine_sha_map(final_state_dataset(cfg)) == want
