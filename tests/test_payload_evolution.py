"""Payload schema evolution through the CDC path (SURVEY.md §1.4):
nullable-add, numeric widen, old-type-wins null-on-conflict — across
committed micro-batches (the realistic evolution boundary)."""

import pyarrow as pa
import pytest

from kafka_connect_mongo_ray.pipelines.cdc import final_state_table, run_replay
from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA
from kafka_connect_mongo_ray.stages.apply import (
    conform_table,
    unify_payload_schemas,
)


def ds_of(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


def events_with(extra_cols: dict, *, ts0: int, n: int = 3) -> pa.Table:
    base = {
        "ts": pa.array([ts0 + i for i in range(n)], pa.int64()),
        "inc": pa.array([0] * n, pa.int32()),
        "op": pa.array(["i"] * n, pa.string()),
        "repo": pa.array(["r"] * n, pa.string()),
        "path": pa.array([f"p{i}" for i in range(n)], pa.string()),
        "commit": pa.array(["c"] * n, pa.string()),
        "lang": pa.array(["l"] * n, pa.string()),
        "content": pa.array([f"v@{ts0 + i}" for i in range(n)], pa.large_string()),
        "partition_id": pa.array([0] * n, pa.int32()),
    }
    base.update(extra_cols)
    return pa.table(base)


def test_unify_rules():
    a = pa.schema([("x", pa.int32()), ("s", pa.string())])
    b = pa.schema([("x", pa.int64()), ("s", pa.float64()), ("new", pa.bool_())])
    u = unify_payload_schemas(a, b)
    assert u.field("x").type == pa.int64()      # numeric widen
    assert u.field("s").type == pa.string()     # conflict → old wins
    assert u.field("new").type == pa.bool_()    # nullable add
    assert u.names == ["x", "s", "new"]
    # int vs float → float64
    c = pa.schema([("x", pa.float32())])
    assert unify_payload_schemas(a, c).field("x").type == pa.float64()


def test_conform_nulls_uncastable():
    t = pa.table({"x": pa.array(["abc", "def"], pa.string())})
    out = conform_table(t, pa.schema([("x", pa.int64()), ("y", pa.string())]))
    assert out["x"].null_count == 2  # uncastable strings → nulled, type kept
    assert out["y"].null_count == 2  # nullable add


def test_evolution_across_committed_micro_batches(tmp_engine_dirs):
    cfg = tmp_engine_dirs

    # job 1: extra column stars:int32
    ev1 = events_with({"stars": pa.array([1, 2, 3], pa.int32())}, ts0=10)
    run_replay(ds_of(ev1), cfg)
    s1 = final_state_table(cfg)
    assert s1.schema.field("stars").type == pa.int32()
    assert s1["stars"].to_pylist() == [1, 2, 3]

    # job 2: stars widens to int64, new column meta:string appears
    ev2 = events_with(
        {"stars": pa.array([10, 20, 30], pa.int64()),
         "meta": pa.array(["a", "b", "c"], pa.string())},
        ts0=20,
    )
    run_replay(ds_of(ev2), cfg)
    s2 = final_state_table(cfg)
    assert s2.schema.field("stars").type == pa.int64()
    assert s2["stars"].to_pylist() == [10, 20, 30]
    assert s2["meta"].to_pylist() == ["a", "b", "c"]

    # job 3: stars arrives as non-numeric strings → old type (int64)
    # wins, batch values nulled; meta arrives as double → cast to the
    # stored string type (VARCHAR accepts any rendering)
    ev3 = events_with(
        {"stars": pa.array(["x", "y", "z"], pa.string()),
         "meta": pa.array([1.5, 2.5, 3.5], pa.float64())},
        ts0=30,
    )
    run_replay(ds_of(ev3), cfg)
    s3 = final_state_table(cfg)
    assert s3.schema.field("stars").type == pa.int64()
    assert s3["stars"].null_count == 3
    assert s3["meta"].to_pylist() == ["1.5", "2.5", "3.5"]

    # job 4: canonical-only events — evolved columns survive as nulls
    ev4 = events_with({}, ts0=40, n=1)
    run_replay(ds_of(ev4), cfg)
    s4 = final_state_table(cfg)
    assert set(s4.schema.names) >= {"stars", "meta"}
    assert s4.num_rows == 3
    row0 = s4.filter(pa.compute.equal(s4["path"], "p0"))
    assert row0["content"][0].as_py() == "v@40"
    assert row0["stars"][0].as_py() is None


def test_final_state_dataset_streams_mixed_schemas(tmp_engine_dirs):
    """The streaming reader conforms each bucket to the manifest's
    union schema — evolved snapshots read without driver-side concat."""
    import pyarrow.compute as pc

    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset

    cfg = tmp_engine_dirs
    run_replay(ds_of(events_with({"stars": pa.array([1, 2, 3], pa.int32())}, ts0=10)), cfg)
    run_replay(ds_of(events_with(
        {"stars": pa.array([10, 20, 30], pa.int64()),
         "meta": pa.array(["a", "b", "c"], pa.string())}, ts0=20)), cfg)
    ds = final_state_dataset(cfg)
    tbl = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    tbl = tbl.sort_by([("path", "ascending")])
    assert tbl.schema.field("stars").type == pa.int64()
    assert tbl["stars"].to_pylist() == [10, 20, 30]
    assert tbl["meta"].to_pylist() == ["a", "b", "c"]
