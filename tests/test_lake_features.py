"""Lake-layer features: time travel, version diff (CDC read side),
COW-aware garbage collection."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.pipelines.cdc import final_state_table, run_replay
from kafka_connect_mongo_ray.state.diff import changes_between, diff_bucket_tables
from kafka_connect_mongo_ray.state.snapshot import SnapshotStore
from tests.test_oracle_and_gen import make_events
from tests.test_replay_e2e import ds_from_table


def _events(rows):
    return make_events(rows)


BASE = dict(commit="c", lang="l", inc=0, partition_id=0)


def three_committed_versions(cfg):
    run_replay(ds_from_table(_events([
        dict(ts=1, op="i", repo="r", path="a", content="a1", **BASE),
        dict(ts=2, op="i", repo="r", path="b", content="b1", **BASE),
        dict(ts=3, op="i", repo="r", path="c", content="c1", **BASE),
    ]), 1), cfg)
    run_replay(ds_from_table(_events([
        dict(ts=4, op="u", repo="r", path="a", content="a2", **BASE),
        dict(ts=5, op="d", repo="r", path="b", content=None, **BASE),
    ]), 1), cfg)
    run_replay(ds_from_table(_events([
        dict(ts=6, op="i", repo="r", path="d", content="d1", **BASE),
    ]), 1), cfg)


def test_time_travel_reads(tmp_engine_dirs):
    cfg = tmp_engine_dirs
    three_committed_versions(cfg)
    v1 = final_state_table(cfg, version=1)
    v2 = final_state_table(cfg, version=2)
    v3 = final_state_table(cfg, version=3)
    assert v1["path"].to_pylist() == ["a", "b", "c"]
    assert v2["path"].to_pylist() == ["a", "c"]
    assert v2.filter(pc.equal(v2["path"], "a"))["content"][0].as_py() == "a2"
    assert v3["path"].to_pylist() == ["a", "c", "d"]


def test_changes_between_versions(tmp_engine_dirs):
    cfg = tmp_engine_dirs
    three_committed_versions(cfg)
    d12 = changes_between(cfg.snapshot_dir, 1, 2).to_pandas()
    got = {(r.op, r.path) for r in d12.itertuples()}
    assert got == {("u", "a"), ("d", "b")}
    d13 = changes_between(cfg.snapshot_dir, 1, 3).to_pandas()
    got13 = {(r.op, r.path) for r in d13.itertuples()}
    assert got13 == {("u", "a"), ("d", "b"), ("i", "d")}
    # identical versions → empty feed (COW short-circuit, no reads)
    d33 = changes_between(cfg.snapshot_dir, 3, 3).to_pandas()
    assert len(d33) == 0


def test_diff_bucket_tables_unit():
    old = pa.table({"repo": ["r"], "path": ["x"], "ts": pa.array([1], pa.int64()),
                    "inc": pa.array([0], pa.int32()), "op_rank": pa.array([0], pa.int8()),
                    "content": pa.array(["v1"], pa.large_string())})
    new = pa.table({"repo": ["r", "r"], "path": ["x", "y"],
                    "ts": pa.array([5, 6], pa.int64()),
                    "inc": pa.array([0, 0], pa.int32()),
                    "op_rank": pa.array([2, 0], pa.int8()),
                    "content": pa.array([None, "y1"], pa.large_string())})
    out = diff_bucket_tables(old, new).to_pandas().sort_values("path")
    assert list(out["op"]) == ["d", "i"]


def test_gc_cow_aware(tmp_engine_dirs):
    cfg = tmp_engine_dirs
    three_committed_versions(cfg)
    store = SnapshotStore(cfg.snapshot_dir)
    before = final_state_table(cfg, version=3)
    res = store.gc(keep_last=1)
    assert res["kept_versions"] == [3]
    # versions whose dirs actually went away land in deleted_versions;
    # versions kept alive by carried-forward files are reported as
    # partially_cleaned (ADVICE: the summary must not misreport)
    gone = set(res["deleted_versions"]) | set(res["partially_cleaned"])
    assert {1, 2} <= gone
    for v in res["deleted_versions"]:
        assert store.manifest(v) is None
    # v3 must still read fully — including buckets carried forward from
    # v1/v2 files (those files must have survived)
    after = final_state_table(cfg, version=3)
    assert after.equals(before)
    # expired manifests are gone → time travel to v1 now fails cleanly
    assert store.manifest(1) is None


def test_snapshot_datasource_evolved_streaming_read(tmp_engine_dirs):
    """The custom SnapshotDatasource streams a MIXED-schema snapshot
    (bucket files written before and after a payload-column evolution),
    conforming every file to the manifest union schema per read task."""
    import ray.data as rd

    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset

    cfg = tmp_engine_dirs

    def ev(rows, with_stars=False):
        cols = {
            "ts": pa.array([r[0] for r in rows], pa.int64()),
            "inc": pa.array([0] * len(rows), pa.int32()),
            "op": pa.array([r[1] for r in rows]),
            "repo": pa.array(["r"] * len(rows)),
            "path": pa.array([r[2] for r in rows]),
            "commit": pa.array([""] * len(rows)),
            "lang": pa.array([""] * len(rows)),
            "content": pa.array([r[3] for r in rows], pa.large_string()),
            "partition_id": pa.array([0] * len(rows), pa.int32()),
        }
        if with_stars:
            cols["stars"] = pa.array([r[4] for r in rows], pa.float64())
        return pa.table(cols)

    run_replay(rd.from_arrow(ev([(1, "i", "a", "ca"), (1, "i", "b", "cb")])), cfg)
    run_replay(rd.from_arrow(ev([(2, "u", "a", "ca2", 4.5)], with_stars=True)), cfg)
    ds = final_state_dataset(cfg)
    df = ds.to_pandas().sort_values("path").reset_index(drop=True)
    assert list(df["content"]) == ["ca2", "cb"]
    assert df["stars"][0] == 4.5 and pd.isna(df["stars"][1])
    # plan-time metadata flows: schema visible without execution
    assert "stars" in [f for f in ds.schema().names]


def test_export_atomic(tmp_engine_dirs, monkeypatch):
    """A crashed export leaves the previous export intact; a successful
    one replaces it atomically."""
    import ray.data as rd

    from kafka_connect_mongo_ray.pipelines.cdc import export_final_state

    cfg = tmp_engine_dirs
    ev = make_events(
        [dict(ts=1, inc=0, op="i", repo="r", path="a", commit="", lang="",
              content="c1", partition_id=0)])
    run_replay(ds_from_table(ev, 1), cfg)
    out = f"{cfg.snapshot_dir}-export"
    n = export_final_state(cfg, out)
    assert n == 1

    # second replay updates the row; a crashing write must not damage
    # the existing export
    ev2 = make_events(
        [dict(ts=2, inc=0, op="u", repo="r", path="a", commit="", lang="",
              content="c2", partition_id=0)])
    run_replay(ds_from_table(ev2, 1), cfg)

    import ray.data

    real_write = ray.data.Dataset.write_parquet

    def boom(self, path, **kw):
        raise RuntimeError("simulated export crash")

    monkeypatch.setattr(ray.data.Dataset, "write_parquet", boom)
    import pytest

    with pytest.raises(RuntimeError):
        export_final_state(cfg, out)
    monkeypatch.setattr(ray.data.Dataset, "write_parquet", real_write)
    # previous export survived the crash
    assert rd.read_parquet(out).count() == 1
    tbl = pa.concat_tables(rd.read_parquet(out).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    assert tbl["content"][0].as_py() == "c1"
    # retry succeeds and replaces atomically
    assert export_final_state(cfg, out) == 1
    tbl = pa.concat_tables(rd.read_parquet(out).iter_batches(
        batch_size=None, batch_format="pyarrow"))
    assert tbl["content"][0].as_py() == "c2"
    # an existing regular FILE at the destination is replaced too
    # (os.replace(dir, file) alone would raise NotADirectoryError)
    import os
    import shutil

    shutil.rmtree(out)
    with open(out, "w") as f:
        f.write("stale non-directory export")
    assert export_final_state(cfg, out) == 1
    assert os.path.isdir(out)
    assert rd.read_parquet(out).count() == 1


def test_export_csv_and_json_formats(tmp_engine_dirs):
    """`export --format csv|json`: the sink counterparts of the
    file-source round trips — same rows, readable back by the matching
    Ray reader."""
    import ray.data as rd

    from kafka_connect_mongo_ray.pipelines.cdc import export_final_state

    cfg = tmp_engine_dirs
    ev = make_events(
        [dict(ts=1, inc=0, op="i", repo="r", path=p, commit="", lang="",
              content=f"c{p}", partition_id=0) for p in ("a", "b", "c")])
    run_replay(ds_from_table(ev, 1), cfg)

    out_c = f"{cfg.snapshot_dir}-csv"
    assert export_final_state(cfg, out_c, fmt="csv") == 3
    back = rd.read_csv(out_c).to_pandas().sort_values("path")
    assert list(back["content"]) == ["ca", "cb", "cc"]

    out_j = f"{cfg.snapshot_dir}-json"
    assert export_final_state(cfg, out_j, fmt="json") == 3
    back = rd.read_json(out_j).to_pandas().sort_values("path")
    assert list(back["content"]) == ["ca", "cb", "cc"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown export format"):
        export_final_state(cfg, f"{cfg.snapshot_dir}-x", fmt="orc")
