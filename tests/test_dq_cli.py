"""The `dq` CLI subcommand: config-driven expectations audit over
parquet tables — report shape, exit-code contract (0 clean / 2
violated / 1 config error), and --table path overrides."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _run(capsys, argv):
    from kafka_connect_mongo_ray.__main__ import main

    rc = main(argv)
    return rc, json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _spec(tmp_path, expectations, tables=None):
    p = tmp_path / "spec.json"
    p.write_text(json.dumps({
        "tables": tables if tables is not None else {
            "lineitem": f"{SF}/lineitem.parquet",
            "orders": f"{SF}/orders.parquet"},
        "expectations": expectations,
    }))
    return str(p)


def test_dq_clean_audit_exits_zero(ray_session, tmp_path, capsys):
    spec = _spec(tmp_path, [
        {"name": "qty_not_null", "kind": "not_null",
         "table": "lineitem", "column": "l_quantity"},
        {"name": "fk", "kind": "foreign_key", "table": "lineitem",
         "column": "l_orderkey", "ref_table": "orders",
         "ref_column": "o_orderkey"},
    ])
    rc, out = _run(capsys, ["dq", "--spec", spec])
    assert rc == 0 and out["ok"] is True
    assert {c["name"]: c["n_violations"] for c in out["checks"]} == {
        "qty_not_null": 0, "fk": 0}


def test_dq_violations_exit_two(ray_session, tmp_path, capsys):
    spec = _spec(tmp_path, [
        {"name": "disc_policy", "kind": "in_range", "table": "lineitem",
         "column": "l_discount", "lo": 0.0, "hi": 0.05},
    ])
    rc, out = _run(capsys, ["dq", "--spec", spec])
    assert rc == 2 and out["ok"] is False
    assert out["violations_total"] > 0


def test_dq_table_override_and_config_errors(ray_session, tmp_path, capsys):
    dirty = tmp_path / "dirty.parquet"
    pq.write_table(pa.table({"k": pa.array([1, None], pa.int64())}), dirty)
    spec = _spec(tmp_path, [
        {"name": "k_nn", "kind": "not_null", "table": "t", "column": "k"},
    ], tables={})
    # path supplied by --table instead of the spec
    rc, out = _run(capsys, ["dq", "--spec", spec,
                            "--table", f"t={dirty}"])
    assert rc == 2 and out["checks"][0]["n_violations"] == 1
    # missing table path is a config error (exit 1), not a crash
    rc, out = _run(capsys, ["dq", "--spec", spec])
    assert rc == 1 and "no path" in out["error"]
    # typo'd kind is a config error
    bad = _spec(tmp_path, [{"name": "x", "kind": "nope",
                            "table": "t", "column": "k"}])
    rc, out = _run(capsys, ["dq", "--spec", bad, "--table", f"t={dirty}"])
    assert rc == 1 and "unknown expectation kind" in out["error"]
