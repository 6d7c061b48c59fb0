"""Data-quality expectations audit: violation paths on dirty data.

The parquet fixtures are clean (PKs unique, FKs intact), so the
oracle-gate run of ``dq_audit`` only proves zero-counting for the
relational checks; these tests feed deliberately dirty in-memory
tables through every expectation kind and pin exact counts.
"""

import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


@pytest.fixture()
def dirty():
    from kafka_connect_mongo_ray.functions import expectations as ex

    child = pa.table({
        "k": pa.array([1, 1, 2, 3, 9, None, 9], pa.int64()),
        "v": pa.array([0.5, -1.0, None, 2.5, 0.0, 1.5, 7.0]),
        "flag": pa.array(["A", "B", None, "A", "Z", "A", "B"]),
    })
    ref = pa.table({"rk": pa.array([1, 2, 2, 3, None], pa.int64())})
    return ex, {"child": _ds(child), "ref": _ds(ref)}


def _counts(table: pa.Table) -> dict:
    return {n: (c, v) for n, c, v in zip(
        table["check_name"].to_pylist(),
        table["n_checked"].to_pylist(),
        table["n_violations"].to_pylist())}


def test_batch_local_kinds_count_violations(dirty):
    ex, datasets = dirty
    out = _counts(ex.run_expectations(datasets, [
        ex.not_null("v_not_null", "child", "v"),
        ex.not_null("k_not_null", "child", "k"),
        ex.in_range("v_range", "child", "v", lo=0.0, hi=2.0),
        ex.in_range("v_lo_only", "child", "v", lo=0.0),
        ex.in_set("flag_domain", "child", "flag", ["A", "B"]),
    ]))
    assert out["v_not_null"] == (7, 1)
    assert out["k_not_null"] == (7, 1)
    # nulls never violate a range check: -1.0, 2.5, 7.0 out of [0, 2]
    assert out["v_range"] == (7, 3)
    assert out["v_lo_only"] == (7, 1)
    # null flag doesn't violate the domain; 'Z' does
    assert out["flag_domain"] == (7, 1)


def test_unique_counts_extra_rows_per_key(dirty):
    ex, datasets = dirty
    out = _counts(ex.run_expectations(datasets, [
        ex.unique("k_unique", "child", "k"),
        ex.unique("rk_unique", "ref", "rk"),
    ]))
    # 6 non-null child keys, 1 and 9 duplicated once each
    assert out["k_unique"] == (6, 2)
    assert out["rk_unique"] == (4, 1)


def test_foreign_key_not_exists_semantics(dirty):
    ex, datasets = dirty
    out = _counts(ex.run_expectations(datasets, [
        ex.foreign_key("k_fk", "child", "k", "ref", "rk"),
    ]))
    # 6 non-null child keys checked; the two k=9 rows dangle; the
    # NULL child key is excluded (SQL referential semantics)
    assert out["k_fk"] == (6, 2)


def test_single_scan_fusion_and_name_collision(dirty):
    ex, datasets = dirty
    with pytest.raises(ValueError):
        ex.run_expectations(datasets, [
            ex.not_null("dup", "child", "v"),
            ex.not_null("dup", "child", "k"),
        ])
    # all-kind mix returns one row per expectation, sorted by name
    out = ex.run_expectations(datasets, [
        ex.unique("b_unique", "child", "k"),
        ex.not_null("a_null", "child", "v"),
        ex.foreign_key("c_fk", "child", "k", "ref", "rk"),
    ])
    assert out["check_name"].to_pylist() == ["a_null", "b_unique", "c_fk"]


def test_foreign_key_on_string_columns(ray_session):
    """A string-typed FK column is legal for the declarative API; the
    check runs in the child column's NATIVE type (no int64 coercion).
    A mixed pair (int ref, string child) casts the ref side to the
    child's type."""
    from kafka_connect_mongo_ray.functions import expectations as ex

    child = pa.table({"k": pa.array(["a", "a", "b", None, "z"])})
    ref = pa.table({"rk": pa.array(["a", "b", "c"])})
    out = ex.run_expectations(
        {"child": _ds(child), "ref": _ds(ref)},
        [ex.foreign_key("s_fk", "child", "k", "ref", "rk")])
    assert _counts(out) == {"s_fk": (4, 1)}  # NULL skipped, 'z' dangles

    # int ref → string child: ref casts to the child's type; the
    # canonical int→string image makes matching exact
    child2 = pa.table({"k": pa.array(["1", "2", "7"])})
    ref2 = pa.table({"rk": pa.array([1, 2, 3], pa.int64())})
    out2 = ex.run_expectations(
        {"child": _ds(child2), "ref": _ds(ref2)},
        [ex.foreign_key("m_fk", "child", "k", "ref", "rk")])
    assert _counts(out2) == {"m_fk": (3, 1)}
