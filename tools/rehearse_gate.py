"""Strict driver-gate rehearsal: run every queries() entry against its
oracle_sql() via DuckDB at a given sf dir and compare with the driver's
semantics PLUS a strict dtype check.

The driver sorts columns by name and hashes values order-insensitively;
a dtype drift (e.g. DuckDB HUGEINT -> pandas float64 vs our int64) can
pass a loose compare but flip the driver hash.  This tool fails on any
dtype-kind mismatch (int vs float vs object) so drift is caught before
the driver sees it.

Usage:
    python tools/rehearse_gate.py [--sf /root/testdata/sf0.01] [--cpus 8] \
        [--only name1,name2]
Prints one line per query and a final summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()[:16]


def dtype_kind(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if "datetime" in s:
        return "datetime"
    return "object"


def to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--only", default=None)
    ap.add_argument("--greens", action="store_true",
                    help="restrict to the driver-green set (the union "
                    "of CORRECTNESS_r*.json rows) — the mandatory fast "
                    "regression sweep after any pipelines/ or "
                    "functions/ change")
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")

    from kafka_connect_mongo_ray.pipelines.queries import (
        build_oracle_sql,
        build_queries,
    )

    queries, oracles = build_queries(), build_oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = sorted(queries)
    if args.greens:
        import glob
        import json as _json

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        green = set()
        for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
            green |= set(_json.load(open(f)))
        names = [n for n in names if n in green]
        print(f"greens: {len(names)} driver-green queries")
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    failures, rows_only = [], []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(queries[name](args.sf)))
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                gk, wk = dtype_kind(got[c].dtype), dtype_kind(want[c].dtype)
                if gk != wk:
                    problems.append(
                        f"dtype drift {c}: ray={got[c].dtype}({gk}) vs oracle={want[c].dtype}({wk})"
                    )
            if not problems:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, rtol=1e-9, atol=1e-12
                    )
                except AssertionError as e:
                    problems.append(f"values differ: {str(e)[:200]}")
                else:
                    gh, wh = value_hash(got), value_hash(want)
                    if gh != wh:
                        problems.append(f"value-hash {gh} != {wh} (formatting drift)")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(got)} rows [{time.time()-t0:.1f}s]")

    summary = {
        "sf": args.sf,
        "checked": len(names),
        "ok": len(names) - len(failures) - len(rows_only),
        "rows_only": len(rows_only),
        "failed": failures,
        "wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
