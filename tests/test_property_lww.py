"""Property-based check: for ARBITRARY event streams the engine's pure
reduce kernel (normalize → partial → final LWW) agrees with the
single-process oracle replay. Pure-local (no Ray round trips per
example) so hypothesis can hammer it."""

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay
from kafka_connect_mongo_ray.stages.apply import (
    live_rows,
    lww_reduce,
    merge_with_snapshot,
    partial_lww,
    split_tokens,
)
from kafka_connect_mongo_ray.stages.normalize import normalize_batch
from tests.test_oracle_and_gen import make_events

event_strategy = st.fixed_dictionaries(
    {
        "ts": st.integers(min_value=0, max_value=50),
        "inc": st.integers(min_value=0, max_value=3),
        "op": st.sampled_from(["i", "u", "d", "n"]),  # "n" must be filtered
        "repo": st.sampled_from(["r0", "r1"]),
        "path": st.sampled_from(["a", "b", "c"]),
        "commit": st.just("c"),
        "lang": st.just("l"),
        "content": st.one_of(st.none(), st.sampled_from(["x", "y", "z", "w"])),
        "partition_id": st.integers(min_value=0, max_value=2),
    }
)


def engine_final(events: pa.Table, split_at: int) -> dict:
    norm = normalize_batch(events, num_buckets=4)
    ev, _tok = split_tokens(norm)
    if ev.num_rows == 0:
        return {}
    # arbitrary partial-reduce split points exercise merge associativity
    parts = [p for p in (ev.slice(0, split_at), ev.slice(split_at)) if p.num_rows]
    pre = pa.concat_tables([partial_lww(p) for p in parts])
    state = merge_with_snapshot(pre, None)
    return content_sha256_map(live_rows(state))


@settings(max_examples=200, deadline=None)
@given(st.lists(event_strategy, min_size=0, max_size=40), st.integers(0, 40))
def test_engine_matches_oracle(rows, split_at):
    events = make_events(rows)
    valid = events.filter(pa.compute.is_in(events["op"], value_set=pa.array(["i", "u", "d"])))
    # oracle must see the tombstone invariant the engine enforces
    fixed = []
    for r in valid.to_pylist():
        if r["op"] == "d":
            r["content"] = None
        fixed.append(r)
    oracle_map = content_sha256_map(final_table(replay(make_events(fixed))))
    got = engine_final(events, min(split_at, events.num_rows))
    assert got == oracle_map


@settings(max_examples=100, deadline=None)
@given(st.lists(event_strategy, min_size=1, max_size=30))
def test_reduce_idempotent_and_commutative(rows):
    import numpy as np

    from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA

    events = make_events(rows)
    norm = normalize_batch(events, num_buckets=2)
    ev, _ = split_tokens(norm)
    if ev.num_rows == 0:  # every op may have been invalid
        return
    once = lww_reduce(ev)
    assert lww_reduce(once).equals(once)  # idempotent
    rev = ev.take(np.arange(ev.num_rows - 1, -1, -1))
    assert lww_reduce(rev).equals(once)  # input-order insensitive
    # replay the reduced state as events again (at-least-once) → no change
    snap = once.select(SNAPSHOT_SCHEMA.names).cast(SNAPSHOT_SCHEMA)
    assert merge_with_snapshot(once, snap).equals(snap)


# ---------------------------------------------------------------------------
# payload-evolution properties

_TYPES = [None, "int32", "int64", "float64", "string", "bool"]
_ARROW_T = {"int32": pa.int32(), "int64": pa.int64(), "float64": pa.float64(),
            "string": pa.string(), "bool": pa.bool_()}

schema_strategy = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.sampled_from([t for t in _TYPES if t]),
    max_size=3,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(schema_strategy, min_size=1, max_size=5))
def test_unify_payload_schemas_properties(schemas):
    from kafka_connect_mongo_ray.stages.apply import unify_payload_schemas

    pa_schemas = [
        pa.schema([(k, _ARROW_T[v]) for k, v in s.items()]) for s in schemas
    ]
    acc = pa_schemas[0]
    for s in pa_schemas[1:]:
        nxt = unify_payload_schemas(acc, s)
        # add-only: every already-known field survives with a type that
        # never narrows (same, or widened within numerics)
        for f in acc:
            g = nxt.field(f.name)
            if f.type.equals(g.type):
                continue
            assert pa.types.is_floating(g.type) or (
                pa.types.is_integer(f.type) and pa.types.is_integer(g.type)
            ), (f.type, g.type)
        # every new field was added
        for f in s:
            assert f.name in nxt.names
        # idempotent: unifying with itself is a no-op
        assert unify_payload_schemas(nxt, nxt).equals(nxt)
        acc = nxt


nonempty_schema = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.sampled_from([t for t in _TYPES if t]),
    min_size=1, max_size=3,
)


@settings(max_examples=100, deadline=None)
@given(nonempty_schema, nonempty_schema)
def test_conform_then_unify_roundtrip(s1, s2):
    """conform_table output always matches the target schema exactly and
    never errors, whatever the type conflict. (Non-empty schemas only:
    a zero-column Arrow table cannot carry a row count — engine tables
    always include the canonical columns.)"""
    from kafka_connect_mongo_ray.stages.apply import conform_table, unify_payload_schemas

    def mk(s):
        cols = {}
        for k, t in s.items():
            if t == "string":
                cols[k] = pa.array(["x", "7"], _ARROW_T[t])
            elif t == "bool":
                cols[k] = pa.array([True, False], _ARROW_T[t])
            else:
                cols[k] = pa.array([1, 2], _ARROW_T[t])
        return pa.table(cols)

    t1, t2 = mk(s1), mk(s2)
    target = unify_payload_schemas(t1.schema, t2.schema)
    for t in (t1, t2):
        out = conform_table(t, target)
        assert out.schema.equals(target)
        assert out.num_rows == t.num_rows
