"""Tests: S3 enrichment lookup, bucketed hash join, backfill source,
micro-batch streaming, CLI healthcheck."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA
from tests.test_oracle_and_gen import make_events

SF = "/root/testdata/sf0.001"


def ds_of(tbl, blocks=2):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(blocks)


def test_update_enricher_substitutes_and_drops():
    from kafka_connect_mongo_ray.stages.enrich import enrich_updates

    base = pa.table(
        {
            "repo": ["r"], "path": ["a.py"], "commit": ["c9"],
            "lang": ["python"],
            "content": pa.array(["full image"], pa.large_string()),
        }
    )
    events = make_events(
        [
            dict(ts=1, inc=0, op="i", repo="r", path="a.py", commit="c1", lang="l",
                 content="insert image", partition_id=0),
            # image-less update → enriched from base
            dict(ts=2, inc=0, op="u", repo="r", path="a.py", commit="", lang="",
                 content=None, partition_id=0),
            # update on a key missing from base → dropped (OplogReader.kt:102)
            dict(ts=3, inc=0, op="u", repo="r", path="gone.py", commit="", lang="",
                 content=None, partition_id=0),
            # delete passes through untouched
            dict(ts=4, inc=0, op="d", repo="r", path="a.py", commit="", lang="",
                 content=None, partition_id=0),
        ]
    )
    out = pa.concat_tables(
        enrich_updates(ds_of(events, 1), base, concurrency=1)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by([("ts", "ascending")])
    assert out.num_rows == 3
    assert out["op"].to_pylist() == ["i", "u", "d"]
    u = out.filter(pc.equal(out["op"], "u"))
    assert u["content"][0].as_py() == "full image"
    assert u["commit"][0].as_py() == "c9"


def test_enrich_updates_join_matches_broadcast():
    """The scale (join-based) enrichment path returns exactly what the
    broadcast path returns: substituted images, miss⇒drop, i/d and
    image-bearing-u pass-through — with identical column types."""
    from kafka_connect_mongo_ray.stages.enrich import (
        enrich_updates,
        enrich_updates_join,
    )

    base = pa.table(
        {
            "repo": ["r", "r"], "path": ["a.py", "b.py"],
            "commit": ["c9", "c8"], "lang": ["python", "go"],
            "content": pa.array(["image a", "image b"], pa.large_string()),
        }
    )
    events = make_events(
        [
            dict(ts=1, inc=0, op="i", repo="r", path="a.py", commit="c1",
                 lang="l", content="insert image", partition_id=0),
            dict(ts=2, inc=0, op="u", repo="r", path="a.py", commit="",
                 lang="", content=None, partition_id=0),
            dict(ts=3, inc=0, op="u", repo="r", path="gone.py", commit="",
                 lang="", content=None, partition_id=0),
            dict(ts=4, inc=0, op="d", repo="r", path="a.py", commit="",
                 lang="", content=None, partition_id=0),
            # image-bearing update passes through unchanged
            dict(ts=5, inc=0, op="u", repo="r", path="b.py", commit="c5",
                 lang="go", content="own image", partition_id=0),
        ]
    )

    def collect(ds):
        return pa.concat_tables(
            ds.iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("ts", "ascending")])

    got = collect(enrich_updates_join(ds_of(events), ds_of(base),
                                      num_buckets=4))
    want = collect(enrich_updates(ds_of(events), base, concurrency=1))
    assert got.schema == want.schema
    assert got.select(want.column_names).equals(want)
    assert got["ts"].to_pylist() == [1, 2, 4, 5]  # ts=3 miss dropped
    u = got.filter(pc.equal(got["ts"], 2))
    assert u["content"][0].as_py() == "image a"
    assert u["commit"][0].as_py() == "c9"


def test_hash_join_matches_pandas():
    from kafka_connect_mongo_ray.stages.join import hash_join

    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    o = orders.rename_columns(["o_orderkey", "custkey"])
    c = cust.rename_columns(["custkey", "c_mktsegment"])
    got = hash_join(ds_of(o, 3), ds_of(c, 2), on=["custkey"], num_buckets=8).to_pandas()
    want = o.to_pandas().merge(c.to_pandas(), on="custkey", how="inner")
    key = ["custkey", "o_orderkey", "c_mktsegment"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    want_s = want[key].sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s)


def test_backfill_dataset_resume(tmp_path):
    from kafka_connect_mongo_ray.sources.backfill import backfill_dataset
    from kafka_connect_mongo_ray.sources.gen import synth_repo_files
    from kafka_connect_mongo_ray.utils import KEY_SEP

    base = synth_repo_files(4, 10, seed=3)
    p = str(tmp_path / "base.parquet")
    pq.write_table(base, p)
    full = pa.concat_tables(
        backfill_dataset(p, num_partitions=4)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert full.num_rows == base.num_rows
    assert set(full["op"].to_pylist()) == {"i"}
    assert full.schema.equals(CHANGE_EVENT_SCHEMA)
    # resume from the 20th key (sorted): only keys strictly greater survive
    keys = sorted(f"{r}{KEY_SEP}{pp}" for r, pp in
                  zip(base["repo"].to_pylist(), base["path"].to_pylist()))
    resumed = pa.concat_tables(
        backfill_dataset(p, num_partitions=4, last_key=keys[19])
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert resumed.num_rows == base.num_rows - 20
    # filter pushdown (S4): additional predicate ANDed in
    filtered = pa.concat_tables(
        backfill_dataset(p, num_partitions=4,
                         parquet_filter=pc.equal(pc.field("lang"), "rust"))
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert filtered.num_rows == base.filter(pc.equal(base["lang"], "rust")).num_rows


def test_micro_batch_stream_converges(tmp_engine_dirs):
    from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset
    from kafka_connect_mongo_ray.pipelines.stream import backfill_then_tail
    from kafka_connect_mongo_ray.sources.backfill import snapshot_to_insert_events
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
    from tests.test_replay_e2e import engine_sha_map

    cfg = tmp_engine_dirs
    base = synth_repo_files(5, 10, seed=31)
    spec = GenSpec(num_partitions=4, events_per_partition=300, seed=31, dup_frac=0.1)
    tail_events = gen_all_events(spec, base)
    backfill_events = snapshot_to_insert_events(base, backfill_ts=0, num_partitions=4)
    # three micro-batches: backfill, first half of the tail, full tail
    # (overlap on purpose: at-least-once)
    cut = int(np.median(np.asarray(tail_events["ts"])))
    first = tail_events.filter(pc.less_equal(tail_events["ts"], cut))

    summaries = backfill_then_tail(
        lambda: ds_of(backfill_events),
        [lambda: ds_of(first), lambda: ds_of(tail_events)],
        cfg,
    )
    assert [s["version"] for s in summaries] == [1, 2, 3]
    oracle_map = content_sha256_map(
        final_table(replay(pa.concat_tables([backfill_events, tail_events])))
    )
    assert engine_sha_map(final_state_dataset(cfg)) == oracle_map


def test_cli_healthcheck(tmp_path, capsys):
    import json

    from kafka_connect_mongo_ray.__main__ import main

    rc = main(["healthcheck", "--snapshot", str(tmp_path / "s"),
               "--checkpoints", str(tmp_path / "c")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok" and out["current_version"] == 0


def test_lsh_topk_runs_and_self_hit():
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.functions.similarity import lsh_topk

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"][:2].to_pylist()])
    ids = np.asarray(t["vec_id"])[:2]
    out = lsh_topk(ds_of(t, 2), q, ids, k=3, dim=q.shape[1], num_planes=3, seed=5)
    # every query's own vector hashes to its own bucket → rank-1 self hit
    top1 = out[out["rank"] == 1]
    assert set(top1["query_id"]) == set(ids.tolist())
    assert (top1["query_id"].to_numpy() == top1["neighbor_id"].to_numpy()).all()


def test_cli_validate(capsys):
    """The operational parity self-test command (in-process: the test
    session already owns the Ray instance)."""
    import json

    from kafka_connect_mongo_ray.__main__ import main

    rc = main(["validate", "--events", "2000", "--partitions", "2"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["status"] == "ok" and out["keys"] > 0


def test_multi_table_replay(tmp_engine_dirs):
    """One namespace per table subtree (the multi-database connector
    shape); each commits independently with its own tokens."""
    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset
    from kafka_connect_mongo_ray.pipelines.stream import run_replay_tables
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
    from tests.test_replay_e2e import engine_sha_map
    import dataclasses

    cfg = tmp_engine_dirs
    streams = {}
    for i, table in enumerate(["db1_files", "db2_files"]):
        base = synth_repo_files(3, 5, seed=80 + i)
        ev = gen_all_events(GenSpec(num_partitions=2, events_per_partition=150,
                                    seed=80 + i), base)
        streams[table] = ev
    summaries = run_replay_tables(
        {t: (lambda e=e: ds_of(e)) for t, e in streams.items()}, cfg
    )
    assert set(summaries) == {"db1_files", "db2_files"}
    for table, ev in streams.items():
        sub = dataclasses.replace(cfg, snapshot_dir=f"{cfg.snapshot_dir}/{table}")
        want = content_sha256_map(final_table(replay(ev)))
        assert engine_sha_map(final_state_dataset(sub)) == want


def test_hash_join_left():
    from kafka_connect_mongo_ray.stages.join import hash_join

    l = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "lv": pa.array(["a", "b", "c"], pa.string())})
    r = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                  "rv": pa.array([20, 30, 40], pa.int64())})
    got = hash_join(ds_of(l, 1), ds_of(r, 1), on=["k"], num_buckets=4,
                    how="left").to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [1, 2, 3]
    assert got["rv"].isna().tolist() == [True, False, False]


def test_native_join_matches_bucketed():
    from kafka_connect_mongo_ray.stages.join import hash_join, native_join

    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    o = orders.rename_columns(["o_orderkey", "custkey"])
    c = cust.rename_columns(["custkey", "c_mktsegment"])
    ours = hash_join(ds_of(o, 3), ds_of(c, 2), on=["custkey"], num_buckets=8).to_pandas()
    theirs = native_join(ds_of(o, 3), ds_of(c, 2), on=["custkey"], num_buckets=8).to_pandas()
    key = ["custkey", "o_orderkey", "c_mktsegment"]
    a = ours[key].sort_values(key).reset_index(drop=True)
    b = theirs[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_salted_join_skewed_key():
    """Salted split for a deliberately skewed key: half of the left
    side shares one key. Result must equal a plain pandas merge, and
    the hot key's rows must be spread across num_salts sub-buckets."""
    import pandas as pd

    from kafka_connect_mongo_ray.stages.join import hash_join

    n = 20_000
    rng = np.random.default_rng(0)
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n))
    left = pa.table({"custkey": pa.array(keys, pa.int64()),
                     "val": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({"custkey": pa.array(np.arange(500, dtype=np.int64)),
                      "seg": pa.array([f"s{i%5}" for i in range(500)])})
    got = hash_join(ds_of(left, 4), ds_of(right, 2), on=["custkey"],
                    num_buckets=8, hot_keys=[7], num_salts=4).to_pandas()
    want = left.to_pandas().merge(right.to_pandas(), on="custkey", how="inner")
    key = ["custkey", "val", "seg"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    want_s = want[key].sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s)
    # invalid salted forms fail fast
    import pytest

    with pytest.raises(ValueError):
        hash_join(ds_of(left, 2), ds_of(right, 2), on=["custkey"],
                  how="outer", hot_keys=[7])

    # hot_keys="auto" measures the heavy hitter itself: same result,
    # no hand-written list
    from kafka_connect_mongo_ray.stages.join import detect_hot_keys

    detected = detect_hot_keys(ds_of(left, 4), "custkey", 8)
    assert 7 in detected and len(detected) <= 16
    got_auto = hash_join(ds_of(left, 4), ds_of(right, 2), on=["custkey"],
                         num_buckets=8, hot_keys="auto",
                         num_salts=4).to_pandas()
    auto_s = got_auto[key].sort_values(key).reset_index(drop=True)
    assert auto_s.equals(want_s)
    # a uniform key column detects nothing (falls back to unsalted)
    uni = pa.table({"custkey": pa.array(np.arange(5000) % 500, pa.int64()),
                    "val": pa.array(np.arange(5000, dtype=np.int64))})
    assert detect_hot_keys(ds_of(uni, 4), "custkey", 8) == []


def test_cli_gc_and_export(tmp_path, capsys):
    """Operational CLI: gc expires versions, export materializes the
    live state as parquet part files (in-process: the test session owns
    the Ray instance)."""
    import json

    from kafka_connect_mongo_ray.__main__ import main
    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files
    from tests.test_replay_e2e import ds_from_table

    snap, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    cfg = EngineConfig(snapshot_dir=snap, checkpoint_dir=ckpt, num_buckets=4)
    base = synth_repo_files(2, 6, seed=5)
    for seed in (5, 6, 7):
        ev = gen_all_events(GenSpec(num_partitions=2, events_per_partition=80,
                                    seed=seed, base_ts=1_600_000_000 + seed * 10**6), base)
        run_replay(ds_from_table(ev, 2), cfg)

    rc = main(["export", "--snapshot", snap, "--checkpoints", ckpt,
               "--out", str(tmp_path / "exported")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["rows"] > 0

    rc = main(["gc", "--snapshot", snap, "--keep-last", "1"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["kept_versions"] == [3]
    # the current version still reads after gc
    rc = main(["healthcheck", "--snapshot", snap, "--checkpoints", ckpt])
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "ok" and out["current_version"] == 3
