"""Mirror of the driver correctness gate: run every queries() entry at
sf0.001 and compare against its oracle_sql() via DuckDB — row count,
column names, and values (order-insensitive)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def registries():
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries(), mod.oracle_sql()


# derive the parametrization from the registries so every new queries()
# entry is covered automatically
from kafka_connect_mongo_ray.pipelines.queries import build_oracle_sql, build_queries

_QUERIES = build_queries()
_ORACLES = build_oracle_sql()
ORACLE_CHECKED = sorted(_ORACLES)
ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(name, con, registries):
    queries, oracles = registries
    assert name in queries and name in oracles
    got = canon(to_pandas(queries[name](SF)))
    want = canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, registries):
    queries, oracles = registries
    assert name in queries and name not in oracles
    got = to_pandas(queries[name](SF))
    assert got is not None and len(got) >= 0


def test_entry_smoke():
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__2", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = to_pandas(mod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"repo", "path", "lang", "content"}
