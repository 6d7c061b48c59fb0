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


def test_http_schema_fetcher_against_local_registry():
    """The real urllib transport against an in-process HTTP server:
    Confluent-style envelope unwrap, bare-document passthrough, and a
    flaky-then-healthy server healed by the bootstrap retry policy."""
    import http.server
    import json
    import threading

    from kafka_connect_mongo_ray.stages.schema_evolve import (
        bootstrap_schema_from_registry,
        http_schema_fetcher,
    )

    avro = json.dumps({
        "type": "record", "name": "Doc",
        "fields": [{"name": "name", "type": ["null", "string"]},
                   {"name": "size", "type": "double"},
                   {"name": "active", "type": "boolean"}],
    })
    fail_first = {"n": 2}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/flaky") and fail_first["n"] > 0:
                fail_first["n"] -= 1
                self.send_response(503)
                self.end_headers()
                return
            if self.path.startswith("/subjects/"):
                body = json.dumps({"schema": avro, "id": 7, "version": 1})
            else:
                body = avro  # bare Avro document endpoint
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        want = {"name": "string", "size": "float64", "active": "bool"}
        # Confluent envelope endpoint
        got = bootstrap_schema_from_registry(http_schema_fetcher(
            f"{base}/subjects/docs-value/versions/latest"))
        assert got == want
        # bare Avro document endpoint
        got2 = bootstrap_schema_from_registry(http_schema_fetcher(
            f"{base}/schema.avsc"))
        assert got2 == want
        # two 503s then healthy: healed by the retry policy
        got3 = bootstrap_schema_from_registry(
            http_schema_fetcher(f"{base}/flaky/subjects/d/versions/latest"),
            max_retries=4)
        assert got3 == want
    finally:
        srv.shutdown()
        srv.server_close()
