"""Unit tests for the LWW reduce kernel and normalize stage."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.stages.apply import (
    TOKEN_OP_RANK,
    live_rows,
    lww_reduce,
    merge_with_snapshot,
    partial_lww,
    split_tokens,
)
from kafka_connect_mongo_ray.stages.normalize import (
    decode_resume_token,
    encode_resume_token,
    normalize_batch,
)
from tests.test_oracle_and_gen import make_events, subtle_events


def norm(events, num_buckets=4, tokens=None):
    return normalize_batch(events, num_buckets=num_buckets, tokens=tokens)


def test_normalize_filters_invalid_ops_and_ranks():
    ev = make_events(
        [
            dict(ts=1, inc=0, op="i", repo="r", path="p", commit="c", lang="l",
                 content="x", partition_id=0),
            dict(ts=2, inc=0, op="n", repo="r", path="p", commit="c", lang="l",
                 content="x", partition_id=0),  # "n" (noop) must be dropped
            dict(ts=3, inc=0, op="d", repo="r", path="p", commit="c", lang="l",
                 content="should-be-nulled", partition_id=0),
        ]
    )
    out = norm(ev)
    events, tokens = split_tokens(out)
    assert events.num_rows == 2
    assert events["op_rank"].to_pylist() == [0, 2]
    # tombstone content forced to null even if supplied
    assert events["content"].to_pylist() == ["x", None]
    # one token row for partition 0 with the max applied (ts, inc)
    assert tokens.num_rows == 1
    assert tokens["path"][0].as_py() == "0"
    assert tokens["ts"][0].as_py() == 3


def test_normalize_checkpoint_filter():
    ev = subtle_events()
    out = norm(ev, tokens={0: (2, 0)})
    events, tokens = split_tokens(out)
    assert sorted(events["ts"].to_pylist()) == [3, 4]
    assert tokens["ts"][0].as_py() == 4


def test_bucket_assignment_deterministic_and_consistent():
    ev = subtle_events()
    a, _ = split_tokens(norm(ev))
    b, _ = split_tokens(norm(ev))
    assert a["bucket"].to_pylist() == b["bucket"].to_pylist()
    # same key always lands in the same bucket
    t = a.to_pydict()
    seen = {}
    for key, bucket in zip(zip(t["repo"], t["path"]), t["bucket"]):
        assert seen.setdefault(key, bucket) == bucket


def test_lww_reduce_picks_max_version_and_tiebreak():
    ev = make_events(
        [
            dict(ts=1, inc=0, op="i", repo="r", path="p", commit="c1", lang="l",
                 content="v1", partition_id=0),
            dict(ts=1, inc=1, op="u", repo="r", path="p", commit="c2", lang="l",
                 content="v2", partition_id=0),
            # tie on (ts, inc, op): sha256 tie-break decides
            dict(ts=1, inc=1, op="u", repo="r", path="p", commit="c3", lang="l",
                 content="v3", partition_id=0),
        ]
    )
    events, _ = split_tokens(norm(ev))
    out = lww_reduce(events)
    assert out.num_rows == 1
    import hashlib

    expected = max(["v2", "v3"], key=lambda c: hashlib.sha256(c.encode()).hexdigest())
    assert out["content"][0].as_py() == expected


def test_partial_then_final_equals_single_reduce():
    from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files

    base = synth_repo_files(3, 5, seed=11)
    ev = gen_all_events(GenSpec(num_partitions=2, events_per_partition=300, seed=11), base)
    events, _ = split_tokens(norm(ev, num_buckets=1))
    single = lww_reduce(events)
    # split into arbitrary sub-batches, pre-reduce each, then final reduce
    parts = [events.slice(0, 100), events.slice(100, 250), events.slice(350)]
    pre = pa.concat_tables([partial_lww(p) for p in parts])
    assert pre.num_rows <= events.num_rows
    assert lww_reduce(pre).equals(single)


def test_merge_with_snapshot_tombstone_blocks_stale_event():
    ev1 = make_events(
        [dict(ts=5, inc=0, op="d", repo="r", path="p", commit="c", lang="l",
              content=None, partition_id=0)]
    )
    e1, _ = split_tokens(norm(ev1))
    state = merge_with_snapshot(e1, None)
    assert state.num_rows == 1 and live_rows(state).num_rows == 0
    # a stale update (older ts) replayed later must NOT resurrect the key
    ev2 = make_events(
        [dict(ts=3, inc=0, op="u", repo="r", path="p", commit="c", lang="l",
              content="old", partition_id=0)]
    )
    e2, _ = split_tokens(norm(ev2))
    state2 = merge_with_snapshot(e2, state)
    assert live_rows(state2).num_rows == 0


def test_resume_token_roundtrip():
    tok = encode_resume_token(123, 4, "repo0/src/a.py", True)
    assert tok == "123,4,repo0/src/a.py,1"
    assert decode_resume_token(tok) == (123, 4, "repo0/src/a.py", True)


def test_normalize_skips_malformed_rows():
    """Rows without key/ts are malformed — skipped, not crashed
    (AbstractMongoSourceTask.kt:118-120 log & skip)."""
    ev = make_events(
        [
            dict(ts=1, inc=0, op="i", repo="r", path="p", commit="c", lang="l",
                 content="ok", partition_id=0),
            dict(ts=None, inc=0, op="i", repo="r", path="p2", commit="c", lang="l",
                 content="no-ts", partition_id=0),
            dict(ts=3, inc=0, op="i", repo=None, path="p3", commit="c", lang="l",
                 content="no-repo", partition_id=0),
            dict(ts=4, inc=0, op="i", repo="r", path=None, commit="c", lang="l",
                 content="no-path", partition_id=0),
        ]
    )
    events, tokens = split_tokens(norm(ev))
    assert events.num_rows == 1
    assert events["content"][0].as_py() == "ok"
