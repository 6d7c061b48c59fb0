"""Avro schema-registry bootstrap (SchemaParser analog) + TaskUtil
retry policy."""

import json

import pytest

from kafka_connect_mongo_ray.stages.schema_evolve import (
    BOOL,
    FLOAT64,
    STRING,
    SchemaAnalyzer,
    parse_avro_schema,
)
from kafka_connect_mongo_ray.utils import run_try

AVRO = {
    "type": "record",
    "name": "User",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "Age", "type": ["null", "long"]},
        {"name": "score", "type": "double"},
        {"name": "active", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "__ts", "type": "string"},
        {"name": "1bad", "type": "string"},
    ],
}


def test_parse_avro_schema():
    s = parse_avro_schema(json.dumps(AVRO))
    assert s == {"name": STRING, "age": FLOAT64, "score": FLOAT64,
                 "active": BOOL, "tags": STRING}


def test_bootstrap_seeds_analyzer_old_type_wins():
    s = parse_avro_schema(AVRO)
    a = SchemaAnalyzer(pkey_cols=None, op_col=None, ts_col=None, initial_schema=s)
    # a conflicting later observation cannot flip the bootstrapped type
    out = a.analyze_docs([{"age": True, "score": 3}])
    assert a.schema["age"] == FLOAT64
    assert out["age"][0].as_py() is None  # bool under DOUBLE → null
    assert out["score"][0].as_py() == 3.0


def test_parse_avro_rejects_non_record():
    with pytest.raises(ValueError):
        parse_avro_schema('{"type": "enum"}')


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_run_try_consecutive_limit():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        raise RuntimeError("boom")

    clock = FakeClock()
    with pytest.raises(RuntimeError):
        run_try(flaky, max_consecutive_errors=5, clock=clock)
    assert calls["n"] == 6  # 5 tolerated + the fatal 6th (TaskUtil.kt:12-13)


def test_run_try_healthy_reset_and_success():
    clock = FakeClock()
    state = {"n": 0}

    def eventually():
        state["n"] += 1
        clock.t += 700  # every attempt 700 s apart → healthy reset each time
        if state["n"] < 20:
            raise RuntimeError("transient")
        return "done"

    # 20 failures but never >5 consecutive within the healthy window
    assert run_try(eventually, max_consecutive_errors=5,
                   healthy_reset_s=600, clock=clock) == "done"


def test_naming_rules():
    from kafka_connect_mongo_ray.functions.naming import (
        analyzed_table_name,
        get_topic,
        namespace_of,
    )

    # StructUtil.kt:13-16 semantics
    assert get_topic("mydb.users", "mongo") == "mongo_mydb_users"
    assert namespace_of("mydb", "users") == "mydb.users"
    # SchemaMapper.kt:108-114: default-db special case
    assert analyzed_table_name("teambition", "tasks") == "base_tasks"
    assert analyzed_table_name("other", "tasks") == "base_other_tasks"
