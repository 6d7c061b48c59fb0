"""Schema analysis / evolution tests (FIXTURES.md F5), mirroring
SchemaMapperTest.kt:17-175: lattice mapping, invalid-name drop,
add-only evolution, old-type-wins null-on-conflict, numeric widening,
canonical sorted order, meta columns."""

import pyarrow as pa

from kafka_connect_mongo_ray.stages.schema_evolve import (
    BOOL,
    FLOAT64,
    STRING,
    SchemaAnalyzer,
    arrow_schema,
    coerce,
    evolve,
    infer_lattice_type,
    normalize_key,
    unify_analyzed_schemas,
)


def test_lattice_and_name_rules():
    # SchemaMapper.kt:171-176: Number → float64, Boolean → bool, else → string
    assert infer_lattice_type(3) == FLOAT64
    assert infer_lattice_type(3.5) == FLOAT64
    assert infer_lattice_type(True) == BOOL
    assert infer_lattice_type("x") == STRING
    assert infer_lattice_type(None) is None
    # SchemaMapper.kt:41-49 (verified SchemaMapperTest.kt:67,72)
    assert normalize_key("CamelCase") == "camelcase"
    assert normalize_key("ok_name2") == "ok_name2"
    assert normalize_key("1bad") is None
    assert normalize_key("bad-name") is None


def test_analyze_batch1_full_type_table():
    a = SchemaAnalyzer(json_col="object", op_col="op", pkey_cols=None, ts_col="ts")
    tbl = a.analyze_docs(
        [
            {
                "name": "Stephen",
                "Num": 3,
                "flag": True,
                "ratio": 0.5,
                "nested": {"b": 2, "a": 1},
                "arr": [1, "two"],
                "1invalid": "dropped",
                "vacuum": None,
            }
        ],
        ops=["i"],
        pkeys=None,
        tss=[1600000000],
    )
    names = tbl.column_names
    # sorted analyzed fields then meta columns
    assert names == ["arr", "flag", "name", "nested", "num", "ratio",
                     "__op", "__pkey", "__sql", "__ts"]
    assert tbl["num"].type == pa.float64() and tbl["num"][0].as_py() == 3.0
    assert tbl["flag"].type == pa.bool_()
    assert tbl["nested"][0].as_py() == '{"a":1,"b":2}'
    assert tbl["arr"][0].as_py() == '[1, "two"]'.replace(", ", ",")
    assert tbl["__op"][0].as_py() == "i"
    assert tbl["__sql"][0].as_py() is None
    assert tbl["__ts"][0].as_py() == "2020-09-13T12:26:40.000Z"


def test_add_only_evolution_and_old_type_wins():
    a = SchemaAnalyzer(pkey_cols=None, op_col=None, ts_col=None)
    a.analyze_docs([{"x": 1.0}])
    assert a.schema == {"x": FLOAT64}
    # batch 2 adds a field → nullable add (SchemaMapper.kt:216-235)
    a.analyze_docs([{"x": 2.0, "name": 1.5}])
    assert a.schema == {"x": FLOAT64, "name": FLOAT64}
    # batch 3: name arrives as bool → old type (float64) wins, value null
    t3 = a.analyze_docs([{"x": 3.0, "name": False}])
    assert a.schema["name"] == FLOAT64
    assert t3["name"][0].as_py() is None  # SchemaMapperTest.kt:139-159
    # batch 4: name arrives as int → widened to float64 value 20.0
    t4 = a.analyze_docs([{"name": 20}])
    assert t4["name"][0].as_py() == 20.0


def test_malformed_json_skipped_and_counted():
    a = SchemaAnalyzer(pkey_cols=None, op_col=None, ts_col=None)
    out = a.analyze_docs(['{"a": 1}', "{not json", '["top-level array"]'])
    assert out.num_rows == 1
    assert a.malformed == 2  # MongoSinkTask.kt:62-70 skip semantics


def test_coerce_rules():
    assert coerce("3", FLOAT64) is None  # strings never silently parse
    assert coerce(True, FLOAT64) is None
    assert coerce(1, BOOL) is None
    assert coerce(True, STRING) == "true"
    assert coerce(7, STRING) == "7"


def test_unify_deterministic_conflict_to_string():
    s = unify_analyzed_schemas([{"a": FLOAT64, "b": BOOL}, {"a": BOOL, "c": STRING}])
    assert s == {"a": STRING, "b": BOOL, "c": STRING}
    # order-insensitive
    s2 = unify_analyzed_schemas([{"a": BOOL, "c": STRING}, {"a": FLOAT64, "b": BOOL}])
    assert s2 == s


def test_arrow_schema_sorted_with_sqltype():
    sch = arrow_schema({"b": BOOL, "a": FLOAT64})
    assert sch.names == ["a", "b", "__op", "__pkey", "__sql", "__ts"]
    assert sch.field("a").metadata[b"sqlType"] == b"DOUBLE"


def test_evolve_via_map_batches_over_ray():
    """The analyzer as an actor-pool stage over a Ray dataset of JSON
    payloads (the reference's analyzed-struct source mode)."""
    import ray.data as rd

    rows = [{"object": '{"k": %d, "extra": "e%d"}' % (i, i), "op": "i",
             "repo": "r", "path": f"p{i}", "ts": 1600000000 + i} for i in range(100)]
    ds = rd.from_items(rows).map_batches(
        SchemaAnalyzer,
        fn_constructor_kwargs={"json_col": "object"},
        batch_format="pyarrow",
        concurrency=1,
        batch_size=32,
    )
    out = ds.take_all()
    assert len(out) == 100
    assert {r["k"] for r in out} == set(float(i) for i in range(100))
    assert all(r["__pkey"].startswith("r/") for r in out)
