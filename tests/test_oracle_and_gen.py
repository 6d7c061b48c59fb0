"""Generator determinism + oracle semantics (FIXTURES.md F1-F4).

The golden CURD sequence mirrors MongoSourceTaskTest.subtleInsert /
MongoSinkTaskTest.putSubtle (MongoSourceTaskTest.kt:160-175,
MongoSinkTaskTest.kt:92-117): i A, i B, u A, d B ⇒ exactly one final
row (A) carrying the updated image.
"""

import pyarrow as pa

from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA
from kafka_connect_mongo_ray.sources.gen import GenSpec, gen_all_events, synth_repo_files


def make_events(rows) -> pa.Table:
    cols = {name: [] for name in CHANGE_EVENT_SCHEMA.names}
    for r in rows:
        for name in CHANGE_EVENT_SCHEMA.names:
            cols[name].append(r.get(name))
    return pa.table(cols, schema=CHANGE_EVENT_SCHEMA)


def subtle_events():
    base = dict(commit="c0", lang="python", partition_id=0, inc=0)
    return make_events(
        [
            dict(ts=1, op="i", repo="repo0", path="a.py", content="doc1", **base),
            dict(ts=2, op="i", repo="repo0", path="b.py", content="doc2", **base),
            dict(ts=3, op="u", repo="repo0", path="a.py", content="doc1 name=Stephen", **base),
            dict(ts=4, op="d", repo="repo0", path="b.py", content=None, **base),
        ]
    )


def test_subtle_curd_sequence():
    state = replay(subtle_events())
    final = final_table(state)
    assert final.num_rows == 1
    assert final["path"][0].as_py() == "a.py"
    assert final["content"][0].as_py() == "doc1 name=Stephen"


def test_oracle_idempotent_and_order_insensitive():
    ev = subtle_events()
    twice = pa.concat_tables([ev, ev])
    reversed_ = ev.take(list(range(ev.num_rows - 1, -1, -1)))
    base = content_sha256_map(final_table(replay(ev)))
    assert content_sha256_map(final_table(replay(twice))) == base
    assert content_sha256_map(final_table(replay(reversed_))) == base


def test_synth_repo_files_deterministic():
    a = synth_repo_files(5, 10, seed=7)
    b = synth_repo_files(5, 10, seed=7)
    assert a.equals(b)
    assert a.num_rows == 50
    assert len(set(zip(a["repo"].to_pylist(), a["path"].to_pylist()))) == 50


def test_gen_events_deterministic_and_monotone():
    base = synth_repo_files(5, 10, seed=7)
    spec = GenSpec(num_partitions=4, events_per_partition=200, seed=7, dup_frac=0.1)
    a = gen_all_events(spec, base)
    b = gen_all_events(spec, base)
    assert a.equals(b)
    # monotone (ts) within each partition, before the dup tail
    import numpy as np

    for p in range(spec.num_partitions):
        part = a.filter(pa.compute.equal(a["partition_id"], p))
        ts = np.asarray(part["ts"])[: spec.events_per_partition]
        assert (np.diff(ts) > 0).all()
    # tombstone invariant
    import pyarrow.compute as pc

    deletes = a.filter(pc.equal(a["op"], "d"))
    assert pc.all(pc.is_null(deletes["content"])).as_py()
