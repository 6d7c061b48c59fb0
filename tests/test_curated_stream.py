"""Streaming curation (pipelines/curate.py): the CDC micro-batch loop
driving the persisted fingerprint index — admission semantics, the
write-before-append crash-recovery contract, and summary accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kafka_connect_mongo_ray.pipelines.curate import (
    curate_version,
    run_curated_stream,
    upserts_to_candidates,
)
from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA


def _events(rows):
    """rows = [(ts, op, path, content)] → CHANGE_EVENT table."""
    n = len(rows)
    ids = np.array([int(r[2]) for r in rows], dtype=np.int64)
    return pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.int64()),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "repo": pa.array(["r"] * n, pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
            "commit": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "content": pa.array([r[3] for r in rows], pa.large_string()),
            "partition_id": pa.array((ids % 4).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def _factory(rows):
    def make():
        import ray.data as rd

        return rd.from_arrow(_events(rows))

    return make


@pytest.fixture()
def dirs(tmp_path):
    from kafka_connect_mongo_ray.config import EngineConfig

    cfg = EngineConfig(snapshot_dir=str(tmp_path / "s"),
                       checkpoint_dir=str(tmp_path / "c"), num_buckets=4)
    return cfg, str(tmp_path / "idx"), str(tmp_path / "cur")


def _read_curated(curated_dir):
    import os

    import pyarrow.parquet as pq

    out = {}
    for w in sorted(os.listdir(curated_dir)):
        v = int(w.split("=")[1])
        files = [f for f in os.listdir(f"{curated_dir}/{w}")
                 if f.endswith(".parquet")]
        if files:
            t = pa.concat_tables([pq.read_table(f"{curated_dir}/{w}/{f}")
                                  for f in files])
            out[v] = set(zip(t["doc_id"].to_pylist(), t["fp"].to_pylist()))
        else:
            out[v] = set()
    return out


def test_curated_stream_admission_semantics(dirs):
    cfg, idx, cur = dirs
    # w1: docs 1,2 (2 and 3 share content "dup" across windows);
    # w2: doc 3 duplicates doc 2's content, doc 4 is new, doc 2 updated;
    # w3: tombstone doc 1, re-insert of already-seen content from w2
    summaries = run_curated_stream(
        [
            _factory([(0, "i", "1", "alpha"), (0, "i", "2", "dup")]),
            _factory([(1, "i", "3", "dup"), (1, "i", "4", "beta"),
                      (1, "u", "2", "dup2")]),
            _factory([(2, "d", "1", None), (2, "i", "5", "dup2")]),
        ],
        cfg, index_dir=idx, curated_dir=cur)
    assert [s["version"] for s in summaries] == [1, 2, 3]
    got = _read_curated(cur)
    ids = {v: {d for d, _ in s} for v, s in got.items()}
    # w1 admits both; w2 drops doc 3 (content seen in w1), admits 4 and
    # the UPDATED doc 2 (new content); w3's re-insert of "dup2" drops,
    # the tombstone is not curated
    assert ids == {1: {1, 2}, 2: {4, 2}, 3: set()}
    assert summaries[2]["curation"]["tombstones"] == 1
    assert summaries[1]["curation"]["admitted"] == 2
    # changes feed counts: w3 = 1 tombstone + 1 dropped insert
    assert summaries[2]["curation"]["changes"] == 2


def test_curate_version_rerun_is_idempotent(dirs):
    """The crash-recovery contract: re-curating an already-curated
    version (index already holds its fps) must leave the window
    directory IDENTICAL, because the screen is replayed against the
    index state that now includes the window's own fps — admission of
    a row already appended is harmless only because the curated dir is
    rewritten from the SAME survivor set... assert the stronger fact:
    the recomputed output equals the original."""
    cfg, idx, cur = dirs
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay

    run_replay(_factory([(0, "i", "1", "alpha"), (0, "i", "2", "beta")])(),
               cfg)
    s1 = curate_version(cfg, 1, index_dir=idx, curated_dir=cur,
                        index_buckets=4)
    first = _read_curated(cur)
    # crash-after-append re-run: same version, index already populated.
    # The marker routes this to the re-append path — the directory must
    # NOT be truncated by a re-screen against its own fingerprints.
    s2 = curate_version(cfg, 1, index_dir=idx, curated_dir=cur,
                        index_buckets=4)
    assert _read_curated(cur) == first
    assert s1["admitted"] == 2
    assert s2["admitted"] == 2 and s2["recovered"] is True


def test_crash_between_write_and_append_recovers(dirs):
    """Simulate the crash window: screen + curated write WITHOUT the
    index append (the ordering the module guarantees), then run the
    full curate_version — the survivor set must be identical and the
    next window must still dedup against it."""
    import os
    import shutil

    cfg, idx, cur = dirs
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.state.diff import changes_between
    from kafka_connect_mongo_ray.state.dedup_index import screen_window

    run_replay(_factory([(0, "i", "1", "alpha"), (0, "i", "2", "beta")])(),
               cfg)
    diff = changes_between(cfg.snapshot_dir, 0, 1)
    cand = diff.map_batches(upserts_to_candidates, batch_format="pyarrow")
    survivors = screen_window(cand, idx, id_col="doc_id", text_col="text",
                              num_buckets=4)
    os.makedirs(f"{cur}/window=1", exist_ok=True)
    (survivors.map_batches(
        lambda t: t.select(["doc_id", "repo", "path", "fp"]),
        batch_format="pyarrow").write_parquet(f"{cur}/window=1"))
    partial = _read_curated(cur)
    assert not os.path.isdir(idx) or not os.listdir(idx)  # append skipped
    # recovery: the documented re-run of curation for the same version
    curate_version(cfg, 1, index_dir=idx, curated_dir=cur, index_buckets=4)
    assert _read_curated(cur) == partial
    # and the index now screens the next window correctly
    run_replay(_factory([(1, "i", "3", "alpha"), (1, "i", "4", "new")])(),
               cfg)
    curate_version(cfg, 2, index_dir=idx, curated_dir=cur, index_buckets=4)
    ids2 = {d for d, _ in _read_curated(cur)[2]}
    assert ids2 == {4}  # doc 3 duplicates window-1 content


def test_null_content_upsert_fingerprints_as_empty(dirs):
    """op='i' with null content is NOT a tombstone (those are op='d');
    it must flow through curation fingerprinted as md5('') — the same
    coalesce the SQL mirror applies."""
    cfg, idx, cur = dirs
    import hashlib

    summaries = run_curated_stream(
        [_factory([(0, "i", "7", None), (0, "i", "8", "x")])],
        cfg, index_dir=idx, curated_dir=cur)
    got = _read_curated(cur)[1]
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert (7, empty_md5) in got and len(got) == 2
    assert summaries[0]["curation"]["tombstones"] == 0
