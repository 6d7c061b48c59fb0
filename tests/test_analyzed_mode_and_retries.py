"""Analyzed-schema source mode through the full replay path, and
transient-task-failure convergence (Ray retries)."""

import os

import pyarrow as pa
import pytest

from kafka_connect_mongo_ray.pipelines.cdc import final_state_table, run_replay


def analyzed_events(rows):
    cols = {
        "ts": pa.array([r["ts"] for r in rows], pa.int64()),
        "inc": pa.array([0] * len(rows), pa.int32()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "repo": pa.array(["r"] * len(rows), pa.string()),
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "commit": pa.array([""] * len(rows), pa.string()),
        "lang": pa.array([""] * len(rows), pa.string()),
        "content": pa.array(
            [r.get("object") for r in rows], pa.large_string()
        ),
        "partition_id": pa.array([0] * len(rows), pa.int32()),
        "object": pa.array([r.get("object") for r in rows], pa.large_string()),
    }
    return pa.table(cols)


def ds_of(tbl):
    import ray.data as rd

    return rd.from_arrow(tbl)


def test_analyzed_mode_full_replay(tmp_engine_dirs):
    """JSON object payloads → analyzed flat columns in the committed
    snapshot, with lattice typing, add-only evolution and LWW."""
    cfg = tmp_engine_dirs
    cfg.analyze_schema = True
    ev = analyzed_events(
        [
            dict(ts=1, op="i", path="a", object='{"Name": "x", "num": 3, "flag": true}'),
            dict(ts=2, op="i", path="b", object='{"name": "y", "num": 4.5}'),
            # update a with an added field + a type conflict (num as string)
            dict(ts=3, op="u", path="a",
                 object='{"name": "x2", "num": "oops", "extra": [1, 2]}'),
            # malformed JSON → payload nulled, row still applied (LWW on key b)
            dict(ts=4, op="u", path="b", object="{broken"),
        ]
    )
    run_replay(ds_of(ev), cfg)
    state = final_state_table(cfg)
    assert state.num_rows == 2
    a = state.filter(pa.compute.equal(state["path"], "a"))
    b = state.filter(pa.compute.equal(state["path"], "b"))
    assert a["name"][0].as_py() == "x2"
    assert a["num"][0].as_py() is None        # "oops" under float64 → null
    assert a["extra"][0].as_py() == "[1,2]"   # nested → JSON text
    assert b["name"][0].as_py() is None       # malformed update nulled payload
    assert state.schema.field("num").type == pa.float64()
    assert state.schema.field("flag").type == pa.bool_()


def _stage_pair():
    from kafka_connect_mongo_ray.pipelines.cdc import AnalyzeObjectStage

    return (AnalyzeObjectStage(arrow_fast_path=True),
            AnalyzeObjectStage(arrow_fast_path=False))


def _batch_of(objects):
    n = len(objects)
    return pa.table({
        "ts": pa.array(range(n), pa.int64()),
        "object": pa.array(objects, pa.large_string()),
    })


@pytest.mark.parametrize("objects,expect_fast", [
    # clean uniform batch → fast path
    (['{"name": "a", "size": 1, "active": true}',
      '{"name": "b", "size": 2.5, "active": false}'], True),
    # new field evolves (int → float64 lattice) on the fast path
    (['{"name": "a"}', '{"name": "b", "added": 7}'], True),
    # capital spelling of a known field (coalesce branch) → fast
    (['{"Name": "a", "size": 1}', '{"name": "b", "size": 2}'], True),
    # ISO date string NEW field infers timestamp → pinned-to-string
    # re-parse keeps the verbatim STRING on the fast path
    (['{"d": "2024-01-01T00:00:00Z"}'], True),
    # mixed ISO timestamp + plain date + a second normal new field
    (['{"d": "2024-01-01T00:00:00Z", "x": 1}',
      '{"d": "2024-02-03T04:05:06.789Z", "e": "2023-05-06"}'], True),
    # ISO strings mixed with non-ISO strings under one new field still
    # parse as plain string (no pin needed) → fast
    (['{"d": "2024-01-01T00:00:00Z"}', '{"d": "not a date"}'], True),
    # malformed row → fallback (skip-and-count semantics)
    (['{"name": "a"}', '{broken'], False),
    # number under a known string field → fallback (str() coercion)
    (['{"name": "a"}', '{"name": 5}'], False),
    # nested object → fallback (JSON-text re-stringify)
    (['{"name": {"x": 1}}'], False),
    # bool under a known float64 field → fallback (null-on-conflict)
    (['{"size": 1}', '{"size": true}'], False),
    # null row image → empty payload, fast
    (['{"name": "a"}', None], True),
    # invalid key dropped either way
    (['{"9bad": 1, "ok": 2}'], True),
])
def test_arrow_ndjson_parity(objects, expect_fast):
    """The NDJSON fast path returns byte-identical tables to the
    per-row Python lattice, and falls back exactly when it must."""
    fast, slow = _stage_pair()
    # seed both with the same known schema so the explicit_schema
    # covers name/size/active
    for stage in (fast, slow):
        stage.analyzer.schema.update(
            {"name": "string", "size": "float64", "active": "bool"})
    got = fast(_batch_of(objects))
    want = slow(_batch_of(objects))
    assert got.schema == want.schema
    assert got.equals(want)
    assert fast.fast_batches == (1 if expect_fast else 0)
    assert fast.analyzer.schema == slow.analyzer.schema


def test_arrow_ndjson_parity_empty_schema_start():
    """From a cold schema, the first batch evolves identically on both
    paths and later batches reuse the evolved explicit schema."""
    fast, slow = _stage_pair()
    b1 = _batch_of(['{"a": 1, "b": "x"}', '{"a": 2}'])
    b2 = _batch_of(['{"a": 3, "b": "y", "c": true}'])
    for b in (b1, b2):
        got, want = fast(b), slow(b)
        assert got.equals(want)
    assert fast.fast_batches == 2
    assert fast.analyzer.schema == {"a": "float64", "b": "string", "c": "bool"}


_FLAKY_FLAG = "/tmp/kcm_flaky_test_flag"


def test_transient_task_failure_converges(tmp_engine_dirs):
    import ray.data as rd

    from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
    from kafka_connect_mongo_ray.pipelines.cdc import _collect_merge
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
    from tests.test_replay_e2e import engine_sha_map

    # defined inside the test: cloudpickle then serializes it by value,
    # so workers don't need the test module importable
    def flaky_normalize(batch, *, num_buckets, tokens=None):
        import os as _os

        from kafka_connect_mongo_ray.pipelines.cdc import normalize_prereduce

        if not _os.path.exists(_FLAKY_FLAG):
            open(_FLAKY_FLAG, "w").write("tripped")
            raise RuntimeError("injected transient failure")
        return normalize_prereduce(batch, num_buckets=num_buckets, tokens=tokens)

    if os.path.exists(_FLAKY_FLAG):
        os.unlink(_FLAKY_FLAG)
    base = synth_repo_files(3, 5, seed=51)
    ev = gen_all_events(GenSpec(num_partitions=2, events_per_partition=100, seed=51), base)
    # retry_exceptions: Ray retries SYSTEM failures automatically but
    # user-code exceptions only when opted in — the engine's transient
    # -error story (network blips inside a stage) uses this knob
    ds = rd.from_arrow(ev).repartition(4).map_batches(
        flaky_normalize, fn_kwargs={"num_buckets": 4, "tokens": None},
        batch_format="pyarrow", retry_exceptions=True,
    )
    out = ds.groupby("bucket", num_partitions=4).map_groups(
        _collect_merge, batch_format="pyarrow")
    got = engine_sha_map(out)
    want = content_sha256_map(final_table(replay(ev)))
    assert got == want
    assert os.path.exists(_FLAKY_FLAG)  # the failure really fired
    os.unlink(_FLAKY_FLAG)


# ---------------------------------------------------------------------------
# split-retry: dirty batches stay on the Arrow path around isolated dirt


def _clean_obj(i):
    import json as _j

    return _j.dumps({"name": f"user{i % 97}", "count": i % 50,
                     "score": (i % 13) / 7.0, "active": bool(i % 2)})


DIRT_MAKERS = [
    lambda i: '{"name": "x", "count": 3, broken',          # malformed
    lambda i: '[1, 2, 3]',                                 # non-dict JSON
    lambda i: '5',                                         # scalar JSON
    lambda i: '{"name": 7, "count": 1}',                   # known-field conflict
    lambda i: '{"count": true}',                           # bool under float64
    lambda i: None,                                        # null row image
    lambda i: '\n{"name": "lead-newline", "count": 1}',    # frame smear
]


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_split_retry_differential_random_dirt(seed):
    """The split-retry path must be byte-identical to the per-row
    Python lattice — output rows, evolved schema, AND the malformed
    counter — across every dirt species at light density."""
    import random

    from kafka_connect_mongo_ray.pipelines.cdc import AnalyzeObjectStage

    rng = random.Random(seed)
    fast = AnalyzeObjectStage(arrow_fast_path=True)
    slow = AnalyzeObjectStage(arrow_fast_path=False)
    for b in range(4):
        objects = []
        for i in range(2000):
            if rng.random() < 0.004:
                objects.append(rng.choice(DIRT_MAKERS)(i))
            else:
                objects.append(_clean_obj(b * 2000 + i))
        batch = pa.table({
            "ts": pa.array(range(len(objects)), pa.int64()),
            "object": pa.array(objects, pa.large_string()),
        })
        got, want = fast(batch), slow(batch)
        assert got.schema == want.schema
        assert got.equals(want), f"batch {b} differs"
    assert fast.analyzer.schema == slow.analyzer.schema
    assert fast.analyzer.malformed == slow.analyzer.malformed
    assert fast.split_batches + fast.fast_batches + fast.slow_batches == 4


def test_split_retry_new_field_on_dirty_row_bails_exact():
    """A spliceable (valid-JSON) dirty row that carries a NEW field
    must fall back wholesale — first-occurrence order decides the
    field's lattice type, so splicing out of order would be wrong."""
    from kafka_connect_mongo_ray.pipelines.cdc import AnalyzeObjectStage

    fast = AnalyzeObjectStage(arrow_fast_path=True)
    slow = AnalyzeObjectStage(arrow_fast_path=False)
    for stage in (fast, slow):
        stage.analyzer.schema.update({"name": "string"})
    objects = (['{"name": "a"}'] * 40
               # conflict on the known field AND a brand-new field: the
               # new field's type must come from THIS row (float64), not
               # from the later string occurrence
               + ['{"name": 7, "fresh": 1}']
               + ['{"name": "b", "fresh": "s"}'] * 40)
    batch = pa.table({"object": pa.array(objects, pa.large_string())})
    got, want = fast(batch), slow(batch)
    assert got.equals(want)
    assert fast.analyzer.schema == slow.analyzer.schema
    assert fast.slow_batches == 1 and fast.split_batches == 0


def test_split_retry_dense_dirt_goes_wholesale():
    """Past the density bail the whole batch takes the per-row path —
    and the result is still exact."""
    from kafka_connect_mongo_ray.pipelines.cdc import AnalyzeObjectStage

    fast = AnalyzeObjectStage(arrow_fast_path=True)
    slow = AnalyzeObjectStage(arrow_fast_path=False)
    objects = []
    for i in range(2000):
        objects.append('{bad' if i % 10 == 0 else _clean_obj(i))
    batch = pa.table({"object": pa.array(objects, pa.large_string())})
    got, want = fast(batch), slow(batch)
    assert got.equals(want)
    assert fast.analyzer.malformed == slow.analyzer.malformed == 200
    assert fast.slow_batches == 1 and fast.split_batches == 0


def test_quarantine_captures_malformed_rows_on_both_paths(tmp_path):
    """quarantine_dir: malformed payloads land raw in the dead-letter
    dir on BOTH the split-retry fast path (sparse dirt) and the
    wholesale Python path (dense dirt); clean batches write nothing;
    main-path outputs are unchanged."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.pipelines.cdc import AnalyzeObjectStage

    def batch_with_dirt(n, bad_every):
        obj = [f'{{"name": "r{i}", "size": {i}}}' for i in range(n)]
        off = bad_every - 100 if bad_every > 100 else 3
        bad = [i for i in range(n) if bad_every and i % bad_every == off]
        for i in bad:
            obj[i] = '{"name": broken'
        return pa.table({
            "repo": pa.array([f"rp{i % 4}" for i in range(n)]),
            "path": pa.array([f"p{i}" for i in range(n)]),
            "ts": pa.array(np.arange(n, dtype=np.int64)),
            "object": pa.array(obj, pa.large_string())}), bad

    # sparse dirt -> split-retry path
    qd = str(tmp_path / "q1")
    t, bad = batch_with_dirt(4000, bad_every=1500)  # rows 1400, 2900
    st = AnalyzeObjectStage(json_col="object", quarantine_dir=qd)
    out = st(t)
    assert st.analyzer.malformed == len(bad) and st.split_batches == 1
    got = pq.read_table(glob.glob(qd + "/part-*.parquet")[0])
    assert sorted(got["path"].to_pylist()) == sorted(
        f"p{i}" for i in bad)
    assert all("broken" in s for s in got["object"].to_pylist())
    assert out.num_rows == 4000  # substitution semantics unchanged

    # dense dirt -> wholesale python path
    qd2 = str(tmp_path / "q2")
    t, bad = batch_with_dirt(2000, bad_every=7)
    st = AnalyzeObjectStage(json_col="object", quarantine_dir=qd2)
    st(t)
    files = glob.glob(qd2 + "/part-*.parquet")
    rows = pa.concat_tables([pq.read_table(f) for f in files])
    assert sorted(rows["path"].to_pylist()) == sorted(f"p{i}" for i in bad)

    # clean batch, quarantine configured -> no files
    qd3 = str(tmp_path / "q3")
    t, _ = batch_with_dirt(1000, bad_every=0)
    AnalyzeObjectStage(json_col="object", quarantine_dir=qd3)(t)
    assert not glob.glob(qd3 + "/part-*.parquet")
