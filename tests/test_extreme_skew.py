"""F6 extreme: one dominant hot key; parity and bounded group sizes."""

import numpy as np
import pyarrow as pa

from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA
from kafka_connect_mongo_ray.stages.apply import partial_lww, split_tokens
from kafka_connect_mongo_ray.stages.normalize import normalize_batch
from tests.test_replay_e2e import assert_parity, ds_from_table, engine_sha_map


def hot_key_events(n=4000, n_cold=50, seed=61):
    """~70% of events hit ONE key (the reference's unscalable hot
    namespace); the rest spread over n_cold keys."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < 0.7
    key_idx = np.where(hot, 0, rng.integers(1, n_cold + 1, size=n))
    ts = np.arange(n, dtype=np.int64)
    op = np.where(rng.random(n) < 0.1, "d", np.where(rng.random(n) < 0.5, "u", "i"))
    content = np.where(op == "d", None,
                       np.char.add("v", ts.astype(str)).astype(object))
    return pa.table(
        {
            "ts": pa.array(ts),
            "inc": pa.array(np.zeros(n, dtype=np.int32)),
            "op": pa.array(op.astype(object), pa.string()),
            "repo": pa.array(np.full(n, "hotrepo", dtype=object), pa.string()),
            "path": pa.array(np.char.add("k", key_idx.astype(str)).astype(object), pa.string()),
            "commit": pa.array(np.full(n, "", dtype=object), pa.string()),
            "lang": pa.array(np.full(n, "", dtype=object), pa.string()),
            "content": pa.array(content, pa.large_string()),
            "partition_id": pa.array((ts % 4).astype(np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )


def test_extreme_hot_key_parity():
    assert_parity(hot_key_events(), num_buckets=8)


def test_pre_reduce_bounds_hot_key_volume():
    """After per-batch partial LWW, the hot key contributes at most ONE
    row per input batch to the shuffle — the skew bound (SURVEY §4)."""
    ev = hot_key_events()
    batches = [ev.slice(i, 500) for i in range(0, 4000, 500)]
    total_hot = 0
    for b in batches:
        out = partial_lww(normalize_batch(b, num_buckets=8))
        events, _ = split_tokens(out)
        hot_rows = events.filter(pa.compute.equal(events["path"], "k0")).num_rows
        assert hot_rows <= 1
        total_hot += hot_rows
    assert total_hot <= len(batches)
