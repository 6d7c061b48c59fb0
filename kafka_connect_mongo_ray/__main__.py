"""CLI entry point — analog of the reference's tools application
(``tools/Application.kt:10-64``: ``healthcheck`` / ``help``).

Usage:
    python -m kafka_connect_mongo_ray healthcheck [--snapshot DIR] [--checkpoints DIR]
    python -m kafka_connect_mongo_ray replay --snapshot DIR --checkpoints DIR \
        [--events N] [--partitions P] [--buckets B] [--seed S]
    python -m kafka_connect_mongo_ray help

Owns its Ray session (the driver contract in ``__ray_entry__`` never
initialises Ray; CLI entry points do).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def healthcheck(args) -> int:
    from kafka_connect_mongo_ray.state.checkpoint import load_checkpoints
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    store = SnapshotStore(args.snapshot, create=False)  # probe, no side effects
    version = store.current_version()
    manifest = store.manifest(version)
    tokens = load_checkpoints(args.checkpoints)
    out = {
        "status": "ok" if manifest or version == 0 else "corrupt",
        "snapshot_dir": args.snapshot,
        "current_version": version,
        "buckets": len(manifest["buckets"]) if manifest else 0,
        "live_rows": sum(m.get("live_rows", 0) for m in (manifest or {}).get("metrics", [])),
        "checkpoint_partitions": len(tokens),
    }
    print(json.dumps(out, sort_keys=True))
    return 0 if out["status"] == "ok" else 1


def replay(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay
    from kafka_connect_mongo_ray.sources.gen import (
        GenSpec,
        change_event_dataset,
        synth_repo_files,
    )

    spec = GenSpec(
        num_partitions=args.partitions,
        events_per_partition=max(1, args.events // args.partitions),
        seed=args.seed,
    )
    base = synth_repo_files(50, 100, seed=args.seed)
    cfg = EngineConfig(snapshot_dir=args.snapshot, checkpoint_dir=args.checkpoints,
                       num_buckets=args.buckets)
    summary = run_replay(change_event_dataset(spec, base), cfg)
    rc = 0
    if args.index:
        # keep the attribute→key secondary index fresh in the same
        # driver pass. catch_up folds every committed window the index
        # has not absorbed (applied_through-tracked, so reruns cost
        # O(new windows)); a fresh index against a gc'd store
        # bootstraps from the oldest kept version. The replay's summary
        # prints regardless — an index failure must not hide the
        # committed version.
        try:
            from kafka_connect_mongo_ray.state.secondary_index import (
                SecondaryIndex,
            )

            idx = SecondaryIndex(args.index, column=args.index_column,
                                 num_buckets=args.index_buckets)
            summary["index"] = idx.catch_up(
                args.snapshot, int(summary["version"]))
        except ValueError as e:
            summary["index_error"] = str(e)
            rc = 1
    print(json.dumps(summary, sort_keys=True))
    ray.shutdown()
    return rc


def validate(args) -> int:
    """Self-test: replay a deterministic synthetic stream through the
    full engine and compare the final state with the pure-Python oracle
    (per-key content sha256) — the operational parity check."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import shutil
    import tempfile

    import pyarrow as pa

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.oracle import content_sha256_map, final_table, replay as oracle_replay
    from kafka_connect_mongo_ray.pipelines.cdc import final_state_dataset, run_replay
    from kafka_connect_mongo_ray.sources.gen import (
        GenSpec,
        change_event_dataset,
        gen_all_events,
        synth_repo_files,
    )

    tmp = tempfile.mkdtemp(prefix="kcm_validate_")
    try:
        base = synth_repo_files(10, 20, seed=args.seed)
        spec = GenSpec(num_partitions=args.partitions,
                       events_per_partition=max(1, args.events // args.partitions),
                       seed=args.seed, dup_frac=0.1)
        cfg = EngineConfig(snapshot_dir=f"{tmp}/s", checkpoint_dir=f"{tmp}/c",
                           num_buckets=16)
        run_replay(change_event_dataset(spec, base), cfg)
        got_tbl = pa.concat_tables(
            final_state_dataset(cfg).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        got = content_sha256_map(got_tbl)
        want = content_sha256_map(final_table(oracle_replay(gen_all_events(spec, base))))
        ok = got == want
        print(json.dumps({"status": "ok" if ok else "PARITY-MISMATCH",
                          "keys": len(want), "engine_keys": len(got)}))
        ray.shutdown()
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def gc(args) -> int:
    """Lake maintenance: expire snapshot versions beyond the retention
    window (COW-aware — carried-forward files referenced by kept
    manifests survive) and sweep orphaned staging dirs."""
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    store = SnapshotStore(args.snapshot, create=False)
    out = store.gc(keep_last=args.keep_last)
    out["swept_staging"] = store.clean_stale_staging()
    print(json.dumps(out, sort_keys=True))
    return 0


def export(args) -> int:
    """Materialize the live final state (tombstones dropped) as a
    directory of part files (--format parquet|csv|json) — streaming
    write, never one giant file."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import export_final_state

    cfg = EngineConfig(snapshot_dir=args.snapshot, checkpoint_dir=args.checkpoints)
    rows = export_final_state(cfg, args.out, version=args.version or None,
                              fmt=args.fmt)
    print(json.dumps({"out_dir": args.out, "rows": rows, "format": args.fmt,
                      "version": args.version or "current"}, sort_keys=True))
    ray.shutdown()
    return 0


def query(args) -> int:
    """Run one registry pipeline by name over a parquet table dir —
    the switch-over surface for reference users: every operator the
    engine implements is reachable headlessly, with resumable
    partitioned-parquet output via ``--out``."""
    import ray

    started = not ray.is_initialized()
    if started:
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kafka_connect_mongo_ray.pipelines.queries import build_queries

    registry = build_queries()
    if args.name not in registry:
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "available": sorted(registry)}, sort_keys=True))
        return 1
    result = registry[args.name](args.sf)
    if isinstance(result, pa.Table):
        result = rd.from_arrow(result)
    elif isinstance(result, pd.DataFrame):
        result = rd.from_pandas(result)
    if args.out:
        # partitioned parquet (one file per block): a failed run can
        # re-run into a fresh dir and skip finished partitions
        result.write_parquet(args.out)
        n = sum(1 for _ in __import__("os").listdir(args.out))
        print(json.dumps({"query": args.name, "out_dir": args.out,
                          "files": n}, sort_keys=True))
    else:
        if args.stats:
            result = result.materialize()
        head = result.take(args.limit)
        print(json.dumps({"query": args.name, "rows_shown": len(head),
                          "sample": [{k: str(v) for k, v in r.items()}
                                     for r in head]}, sort_keys=True))
    if args.stats:
        # the measure-don't-guess surface: per-operator wall/CPU/rows
        # for exactly the plan that ran (stderr keeps stdout one JSON
        # line for scripts)
        print(result.stats(), file=sys.stderr)
    if started:  # an embedding caller (tests) keeps its session
        ray.shutdown()
    return 0


def list_queries(_args) -> int:
    from kafka_connect_mongo_ray.pipelines.queries import (
        build_oracle_sql,
        build_queries,
    )

    q, o = build_queries(), build_oracle_sql()
    print(json.dumps({"count": len(q),
                      "queries": {n: ("oracle" if n in o else "rows-only")
                                  for n in q}}, sort_keys=True))
    return 0


def ivm(args) -> int:
    """Fold committed snapshot windows into the persisted per-repo
    aggregate (state/ivm.py): catches the state up from its current
    version to the snapshot's, one idempotent fold per window."""
    import ray
    from ray.data import DataContext

    from kafka_connect_mongo_ray.state.ivm import IvmState
    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started = True
    # clean machine-parseable stdout (same contract as `query`)
    DataContext.get_current().enable_progress_bars = False
    store = SnapshotStore(args.snapshot, create=False)
    latest = store.current_version()
    st = IvmState(args.state)
    folds = []
    for v in range(st.current_version() + 1, latest + 1):
        folds.append(st.fold_window(args.snapshot, v))
    state = st.read()
    print(json.dumps({"snapshot_version": latest,
                      "state_version": st.current_version(),
                      "folds": folds, "groups": state.num_rows,
                      "n_live": int(sum(state["n_live"].to_pylist()))},
                     sort_keys=True))
    if started:
        ray.shutdown()
    return 0


def compact(args) -> int:
    """Rewrite fragmented multi-file buckets as one file each in a new
    COW version (state/snapshot.py::run_compaction); untouched buckets
    carry forward byte-free and resume tokens are preserved."""
    import ray
    from ray.data import DataContext

    from kafka_connect_mongo_ray.state.snapshot import run_compaction

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started = True
    DataContext.get_current().enable_progress_bars = False
    print(json.dumps(run_compaction(args.snapshot,
                                    min_files=args.min_files,
                                    rows_per_file=args.rows_per_file),
                     sort_keys=True))
    if started:
        ray.shutdown()
    return 0


def delete_cmd(args) -> int:
    """Predicate delete over the snapshot store
    (state/snapshot.py::run_delete_where): retention (--ts-before) and
    right-to-erasure (--repo), tombstone or purge mode, zone-map
    pruned, COW carry-forward of untouched buckets."""
    import ray
    from ray.data import DataContext

    from kafka_connect_mongo_ray.state.snapshot import run_delete_where

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started = True
    DataContext.get_current().enable_progress_bars = False
    try:
        res = run_delete_where(args.snapshot, ts_before=args.ts_before,
                               repo_equals=args.repo, mode=args.mode,
                               delete_ts=args.delete_ts,
                               rows_per_file=args.rows_per_file)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    finally:
        if started:
            ray.shutdown()
    print(json.dumps(res, sort_keys=True))
    return 0


def dq_cmd(args) -> int:
    """Config-driven data-quality audit
    (functions/expectations.py::run_expectations): a JSON spec names
    parquet tables and declarative checks; the report is one JSON line
    with per-check violation counts. Exit 2 when any check is violated
    (scripting contract, like `diff`)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from kafka_connect_mongo_ray.functions.expectations import (
        expectation_from_dict,
        run_expectations,
    )

    try:
        with open(args.spec) as f:
            spec = json.load(f)
        tables = dict(spec.get("tables", {}))
        for t in args.table or []:
            name, _, path = t.partition("=")
            if not path:
                raise ValueError(f"--table wants name=path, got {t!r}")
            tables[name] = path
        exps = [expectation_from_dict(d)
                for d in spec.get("expectations", [])]
        if not exps:
            raise ValueError("spec has no expectations")
        need = {e.table for e in exps} | {
            e.ref_table for e in exps if e.ref_table}
        missing = sorted(need - set(tables))
        if missing:
            raise ValueError(f"no path for table(s) {missing} "
                             "(spec 'tables' or --table name=path)")
        datasets = {n: rd.read_parquet(tables[n]) for n in need}
        report = run_expectations(datasets, exps)
    except (ValueError, OSError, json.JSONDecodeError) as e:
        print(json.dumps({"error": str(e)}))
        return 1
    checks = [{"name": n, "n_checked": c, "n_violations": v}
              for n, c, v in zip(report["check_name"].to_pylist(),
                                 report["n_checked"].to_pylist(),
                                 report["n_violations"].to_pylist())]
    total = sum(c["n_violations"] for c in checks)
    print(json.dumps({"checks": checks, "violations_total": total,
                      "ok": total == 0}, sort_keys=True))
    return 0 if total == 0 else 2


def rollback_cmd(args) -> int:
    """Restore an earlier committed version as a new COW commit
    (state/snapshot.py::run_rollback): manifest-sized, zero data
    movement; the restored tokens make the next replay redeliver
    everything after that point. With --checkpoints the token mirror
    is refreshed too so both resume surfaces agree immediately."""
    from kafka_connect_mongo_ray.state.checkpoint import mirror_checkpoints
    from kafka_connect_mongo_ray.state.snapshot import (SnapshotStore,
                                                        run_rollback)

    try:
        res = run_rollback(args.snapshot, args.to_version)
        if res.get("rolled_back") and args.checkpoints:
            store = SnapshotStore(args.snapshot, create=False)
            mirror_checkpoints(args.checkpoints,
                               store.tokens(res["new_version"]),
                               version=res["new_version"])
            res["checkpoints_mirrored"] = True
        print(json.dumps(res, sort_keys=True))
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    return 0


def branch_cmd(args) -> int:
    """Zero-copy branch of the store's current version into an
    independent root (state/snapshot.py::run_branch): hardlinked part
    files, carried manifest, instantly divergeable."""
    from kafka_connect_mongo_ray.state.snapshot import run_branch

    try:
        print(json.dumps(run_branch(args.snapshot, args.to),
                         sort_keys=True))
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    return 0


def diff_cmd(args) -> int:
    """Anti-entropy comparison of two stores' live states
    (state/snapshot.py::run_store_diff): aligned-bucket fast path when
    the bucket contracts match, one hash exchange otherwise."""
    import ray
    from ray.data import DataContext

    from kafka_connect_mongo_ray.state.snapshot import run_store_diff

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started = True
    DataContext.get_current().enable_progress_bars = False
    try:
        res = run_store_diff(args.snapshot, args.other, sample=args.sample)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    finally:
        if started:
            ray.shutdown()
    print(json.dumps(res, sort_keys=True))
    return 0 if res["identical"] else 2


def sync_cmd(args) -> int:
    """One-way incremental replication
    (state/snapshot.py::run_store_sync): ship only the buckets whose
    part files differ from the source, hardlinked when possible."""
    import ray
    from ray.data import DataContext

    from kafka_connect_mongo_ray.state.snapshot import run_store_sync

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
        started = True
    DataContext.get_current().enable_progress_bars = False
    try:
        res = run_store_sync(args.snapshot, args.to)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    finally:
        if started:
            ray.shutdown()
    print(json.dumps(res, sort_keys=True))
    return 0


def get_cmd(args) -> int:
    """Point reads from the snapshot store: O(touched buckets), never
    a scan (pipelines/cdc.py::point_lookup). --key is repeatable as
    repo/path; --buckets must match the store's replay bucket count
    (the hash rule)."""
    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import point_lookup

    for k in args.key:
        if not k.partition("/")[2]:
            print(json.dumps({"error": f"--key must be repo/path, got {k!r}"}))
            return 1
    keys = [tuple(k.partition("/")[::2]) for k in args.key]
    buckets = args.buckets
    if not buckets:
        from kafka_connect_mongo_ray.state.snapshot import SnapshotStore

        store = SnapshotStore(args.snapshot, create=False)
        m = store.manifest(store.current_version())
        buckets = (m or {}).get("num_buckets") or 0
        if not buckets:
            print(json.dumps({"error": "--buckets required: this store's "
                              "manifest predates the num_buckets contract"}))
            return 1
    cfg = EngineConfig(snapshot_dir=args.snapshot,
                       checkpoint_dir=args.snapshot + "/../checkpoints",
                       num_buckets=buckets)
    t = point_lookup(cfg, keys)
    rows = [] if t is None else [
        {k: (str(v) if v is not None else None) for k, v in r.items()}
        for r in t.to_pylist()]
    print(json.dumps({"requested": len(keys), "found": len(rows),
                      "rows": rows}, sort_keys=True))
    return 0


def scan_cmd(args) -> int:
    """Key-range scan with zone-map pruning
    (pipelines/cdc.py::key_range_dataset): only part files whose
    manifest-recorded [first_key, last_key] overlaps [--from, --to]
    are opened. Prints the pruning counters plus the row count so the
    effectiveness is observable from the CLI."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.cdc import key_range_dataset

    def parse_key(s: str, what: str):
        repo, sep, path = s.partition("/")
        if not sep:
            raise SystemExit(json.dumps(
                {"error": f"{what} must be repo/path, got {s!r}"}))
        return repo, path

    lo = parse_key(args.from_key, "--from")
    hi = parse_key(args.to_key, "--to")
    cfg = EngineConfig(snapshot_dir=args.snapshot,
                       checkpoint_dir=args.snapshot + "/../checkpoints")
    ds = key_range_dataset(cfg, lo, hi,
                           version=args.version or None)
    out = {"from": list(lo), "to": list(hi),
           "files_scanned": ds.files_scanned,
           "files_total": ds.files_total}
    if args.out:
        # single pass: write, then count from the written footers
        # (ds.count() + write_parquet would scan every part file twice)
        ds.write_parquet(args.out)
        import pyarrow.parquet as pq

        out["rows"] = sum(
            pq.read_metadata(os.path.join(args.out, f)).num_rows
            for f in os.listdir(args.out) if f.endswith(".parquet"))
        out["out"] = args.out
    else:
        out["rows"] = ds.count()
    print(json.dumps(out, sort_keys=True))
    return 0


def rebucket_cmd(args) -> int:
    """Re-partition the store to a new bucket count
    (state/snapshot.py::run_rebucket): one distributed hash exchange,
    atomic commit, new num_buckets recorded in the manifest so GET
    derives the hash rule without a flag."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kafka_connect_mongo_ray.state.snapshot import run_rebucket

    res = run_rebucket(args.snapshot, args.buckets,
                       rows_per_file=args.rows_per_file)
    print(json.dumps(res, sort_keys=True))
    return 0


def curate(args) -> int:
    """Streaming curation end-to-end (pipelines/curate.py): N synthetic
    CDC windows with monotone (ts,inc), each committed as a replay and
    its change feed screened against the persisted fingerprint index;
    admissions land under --curated/window={version}. One JSON line
    with the per-window replay + curation summaries — the CLI face of
    the `cdc_curated_stream` gate query."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kafka_connect_mongo_ray.config import EngineConfig
    from kafka_connect_mongo_ray.pipelines.curate import run_curated_stream
    from kafka_connect_mongo_ray.sources.gen import (
        GenSpec,
        change_event_dataset,
        synth_repo_files,
    )

    base = synth_repo_files(50, 100, seed=args.seed)
    cfg = EngineConfig(snapshot_dir=args.snapshot,
                       checkpoint_dir=args.checkpoints,
                       num_buckets=args.buckets)

    def factory(w: int):
        def make():
            spec = GenSpec(
                num_partitions=args.partitions,
                events_per_partition=max(1, args.events // args.partitions),
                seed=args.seed + w,
                # windows must advance monotonically in (ts, inc) for
                # checkpoint-token resume: give each window its own
                # disjoint ts range
                base_ts=1_600_000_000 + w * 10_000_000,
            )
            return change_event_dataset(spec, base)
        return make

    def candidates(batch):
        # the synthetic stream keys on (repo, path) strings, not the
        # numeric paths the default mapping expects: derive the
        # in-window tie-break doc_id as a stable 63-bit key hash
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        b = batch.filter(pc.invert(pc.equal(batch["op"], pa.scalar("d"))))
        keys = [f"{r}/{p}" for r, p in zip(b["repo"].to_pylist(),
                                           b["path"].to_pylist())]
        ids = [int.from_bytes(hashlib.md5(k.encode()).digest()[:8],
                              "big") >> 1 for k in keys]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "repo": pc.cast(b["repo"], pa.string()),
            "path": pc.cast(b["path"], pa.string()),
            # carrying ts gives each window its exact event-time zone
            # map in the _CURATED marker (read_curated prunes on it)
            "ts": pc.cast(b["ts"], pa.int64()),
            "text": pc.cast(b["content"], pa.string()),
        })

    dq_exps = None
    if args.dq_spec:
        from kafka_connect_mongo_ray.functions.expectations import (
            expectation_from_dict,
        )

        try:
            with open(args.dq_spec) as f:
                entries = json.load(f).get("expectations", [])
            for d in entries:
                d.setdefault("table", "admitted")
                if d["table"] != "admitted":
                    raise ValueError(
                        f"curate dq expectations audit the 'admitted' "
                        f"table only, got {d['table']!r}")
            dq_exps = [expectation_from_dict(d) for d in entries]
        except (ValueError, OSError, json.JSONDecodeError) as e:
            print(json.dumps({"error": str(e)}))
            return 1

    summaries = run_curated_stream(
        [factory(w) for w in range(args.windows)], cfg,
        index_dir=args.index, curated_dir=args.curated,
        index_buckets=args.index_buckets, candidates_fn=candidates,
        screen=args.screen, ann_dir=args.ann_dir,
        dq_expectations=dq_exps)
    print(json.dumps({"windows": summaries}, sort_keys=True, default=str))
    ray.shutdown()
    return 0


def bm25_cmd(args) -> int:
    """Persisted BM25 index face (state/text_index.py): ``--build``
    tokenizes a documents Parquet into term-bucketed postings;
    ``--terms`` answers top-k reading only the probed bucket
    directories. One JSON line each."""
    import ray

    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    try:
        import ray.data as rd

        if args.build:
            from kafka_connect_mongo_ray.state.text_index import (
                build_bm25_index,
            )

            ds = rd.read_parquet(args.docs,
                                 columns=[args.id_col, args.text_col])
            manifest = build_bm25_index(ds, args.index,
                                        num_buckets=args.buckets,
                                        id_col=args.id_col,
                                        text_col=args.text_col)
            print(json.dumps({"built": args.index, **manifest},
                             sort_keys=True))
            return 0
        if not args.terms:
            print(json.dumps({"error": "pass --build or --terms"}))
            return 2
        from kafka_connect_mongo_ray.state.text_index import bm25_index_topk

        terms = [t for t in args.terms.split(",") if t]
        out = bm25_index_topk(args.index, terms, k=args.k).to_pandas()
        print(json.dumps({"terms": terms, "rows": len(out),
                          "results": out.to_dict(orient="records")},
                         sort_keys=True, default=str))
        return 0
    finally:
        ray.shutdown()


def ann_cmd(args) -> int:
    """Persisted IVF index face (state/ann_index.py): ``--build``
    quantizes an embeddings Parquet into the cell-partitioned index;
    ``--query-ids`` answers top-k for the vectors with those ids,
    reading only the probed cells' directories. One JSON line each."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from kafka_connect_mongo_ray.utils import embedding_matrix

    ray.init(address="local", include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    try:
        if args.build:
            import ray.data as rd

            from kafka_connect_mongo_ray.state.ann_index import build_ivf_index

            ds = rd.read_parquet(args.embeddings,
                                 columns=[args.id_col, args.vec_col])
            manifest = build_ivf_index(ds, args.index, num_cells=args.cells,
                                       seed=args.seed, id_col=args.id_col,
                                       vec_col=args.vec_col)
            print(json.dumps({"built": args.index, **manifest},
                             sort_keys=True))
            return 0
        if args.append:
            import ray.data as rd

            from kafka_connect_mongo_ray.state.ann_index import append_ivf_index

            ds = rd.read_parquet(args.embeddings,
                                 columns=[args.id_col, args.vec_col])
            manifest = append_ivf_index(ds, args.index, vec_col=args.vec_col)
            print(json.dumps({"appended": args.index, **manifest},
                             sort_keys=True))
            return 0
        if args.compact:
            from kafka_connect_mongo_ray.state.ann_index import (
                compact_ivf_index,
            )

            out = compact_ivf_index(args.index)
            print(json.dumps({"index": args.index, **out}, sort_keys=True))
            return 0
        if not args.query_ids:
            print(json.dumps({"error": "pass --build, --append, --compact "
                                       "or --query-ids"}))
            return 2
        from kafka_connect_mongo_ray.state.ann_index import ivf_index_topk

        want = [int(x) for x in args.query_ids.split(",")]
        t = pq.read_table(args.embeddings,
                          columns=[args.id_col, args.vec_col])
        t = t.filter(pc.is_in(t[args.id_col], pa.array(want, pa.int64()))
                     ).sort_by(args.id_col)
        q = embedding_matrix(t[args.vec_col])
        ids = np.asarray(t[args.id_col])
        out = ivf_index_topk(args.index, q, ids, k=args.k,
                             nprobe=args.nprobe)
        print(json.dumps({
            "queries": len(ids), "rows": int(len(out)),
            "results": out.head(args.limit).to_dict(orient="records")},
            sort_keys=True))
        return 0
    finally:
        ray.shutdown()


def alter_cmd(args) -> int:
    """Schema-migration face (state/snapshot.py::run_alter_add_column):
    add a column to EVERY stored row — constant via --const, or a
    built-in content derivation via --derive chars|tokens. Shuffle-free
    per-bucket rewrite, full_rewrite commit, OCC. One JSON line."""
    import ray

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
        started = True
    try:
        from kafka_connect_mongo_ray.state.snapshot import (
            run_alter_add_column,
        )

        if args.drop:
            if args.const is not None or args.derive is not None:
                print(json.dumps({"error": "--drop takes no --const/"
                                  "--derive"}))
                return 1
            from kafka_connect_mongo_ray.state.snapshot import (
                run_alter_drop_column,
            )

            try:
                out = run_alter_drop_column(args.snapshot, args.column)
            except ValueError as e:
                print(json.dumps({"error": str(e)}))
                return 1
            print(json.dumps(out, sort_keys=True))
            return 0
        if (args.const is None) == (args.derive is None):
            print(json.dumps({"error": "pass exactly one of --const "
                              "or --derive"}))
            return 1
        const = args.const
        if const is not None and args.const_type == "int":
            try:
                const = int(const)
            except ValueError:
                print(json.dumps({"error": f"--const {const!r} is not "
                                  "an integer (--const-type int)"}))
                return 1
        try:
            out = run_alter_add_column(args.snapshot, args.column,
                                       const=const, derive=args.derive)
        except ValueError as e:
            print(json.dumps({"error": str(e)}))
            return 1
        print(json.dumps(out, sort_keys=True))
        return 0
    finally:
        if started:
            ray.shutdown()


def index_cmd(args) -> int:
    """Secondary-index face (state/secondary_index.py): ``--apply``
    folds every committed window's change feed into the persisted
    attribute→key index (idempotent — deterministic per-window file
    names), ``--value`` answers a single-bucket lookup, ``--counts``
    reports per-value live-key counts, ``--compact`` folds history
    into a new generation with an atomic manifest swap. One JSON
    line."""
    import ray

    started = False
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
        started = True
    try:
        from kafka_connect_mongo_ray.state.secondary_index import (
            SecondaryIndex,
        )

        idx = SecondaryIndex(args.index, column=args.column,
                             num_buckets=args.buckets,
                             auto_compact_after=args.auto_compact)
        out = {"index": args.index, "column": args.column}
        if (args.apply or (args.value and args.fetch)) and not args.snapshot:
            print(json.dumps({"error": "--snapshot is required with "
                              "--apply and with --value --fetch"}))
            return 1
        if args.apply:
            try:
                out["applied"] = idx.catch_up(args.snapshot)
            except ValueError as e:
                print(json.dumps({"error": str(e)}))
                return 1
        if args.compact:
            out["compact"] = idx.compact()
        if args.value:
            t = idx.lookup(args.value).to_pandas()
            out["lookup"] = {"value": args.value, "rows": len(t),
                             "keys": t.head(20).to_dict(orient="records")}
            if args.fetch:
                # index-accelerated row retrieval: the lookup's keys
                # feed the store's bucket-pruned point reads — full
                # rows without a scan, O(touched buckets)
                from kafka_connect_mongo_ray.config import EngineConfig
                from kafka_connect_mongo_ray.pipelines.cdc import (
                    point_lookup,
                )
                from kafka_connect_mongo_ray.state.snapshot import (
                    SnapshotStore,
                )

                store = SnapshotStore(args.snapshot, create=False)
                m = store.manifest(store.current_version()) or {}
                nb = m.get("num_buckets")
                if not nb:
                    print(json.dumps({"error": "--fetch needs a store "
                                      "with the num_buckets contract"}))
                    return 1
                cfg = EngineConfig(
                    snapshot_dir=args.snapshot,
                    checkpoint_dir=args.snapshot + "/../checkpoints",
                    num_buckets=int(nb))
                keys = list(zip(t["repo"], t["path"]))
                rows = point_lookup(cfg, keys)
                out["fetch"] = {
                    "rows": 0 if rows is None else rows.num_rows,
                    "sample": [] if rows is None else [
                        {k: (str(v) if v is not None else None)
                         for k, v in r.items()}
                        for r in rows.slice(0, 5).to_pylist()]}
        if args.counts:
            out["counts"] = idx.counts().to_pandas().to_dict(
                orient="records")
        print(json.dumps(out, sort_keys=True, default=str))
        return 0
    finally:
        if started:
            ray.shutdown()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kafka_connect_mongo_ray")
    sub = p.add_subparsers(dest="cmd")
    hc = sub.add_parser("healthcheck")
    hc.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    hc.add_argument("--checkpoints", default="/tmp/kcm_ray/checkpoints")
    rp = sub.add_parser("replay")
    rp.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    rp.add_argument("--checkpoints", default="/tmp/kcm_ray/checkpoints")
    rp.add_argument("--events", type=int, default=100_000)
    rp.add_argument("--partitions", type=int, default=8)
    rp.add_argument("--buckets", type=int, default=32)
    rp.add_argument("--seed", type=int, default=42)
    rp.add_argument("--index", default=None,
                    help="also catch the secondary index at DIR up to "
                    "this commit (idempotent per-window folds)")
    rp.add_argument("--index-column", default="lang", dest="index_column")
    rp.add_argument("--index-buckets", type=int, default=16,
                    dest="index_buckets",
                    help="index bucket count (the `index` command's "
                    "default; independent of the store's --buckets)")
    va = sub.add_parser("validate")
    va.add_argument("--events", type=int, default=20_000)
    va.add_argument("--partitions", type=int, default=4)
    va.add_argument("--seed", type=int, default=42)
    g = sub.add_parser("gc")
    g.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    g.add_argument("--keep-last", type=int, default=2, dest="keep_last")
    ex = sub.add_parser("export")
    ex.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    ex.add_argument("--checkpoints", default="/tmp/kcm_ray/checkpoints")
    ex.add_argument("--out", required=True)
    ex.add_argument("--version", type=int, default=0)
    ex.add_argument("--format", choices=("parquet", "csv", "json"),
                    default="parquet", dest="fmt",
                    help="part-file format for the export directory")
    q = sub.add_parser("query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None)
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--stats", action="store_true",
                   help="also print the executed plan's per-operator "
                        "wall/CPU stats (ds.stats()) to stderr")
    sub.add_parser("queries")
    iv = sub.add_parser("ivm")
    iv.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    iv.add_argument("--state", required=True)
    cp = sub.add_parser("compact")
    cp.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    cp.add_argument("--min-files", type=int, default=2, dest="min_files")
    cp.add_argument("--rows-per-file", type=int, default=None,
                    dest="rows_per_file")
    dl = sub.add_parser("delete")
    dl.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    dl.add_argument("--ts-before", type=int, default=None, dest="ts_before",
                    help="delete rows whose stored version ts < cutoff")
    dl.add_argument("--repo", default=None,
                    help="delete rows of this repo (erasure by subject)")
    dl.add_argument("--mode", choices=("tombstone", "purge"),
                    default="tombstone")
    dl.add_argument("--delete-ts", type=int, default=None, dest="delete_ts",
                    help="tombstone version; default max token ts + 1")
    dl.add_argument("--rows-per-file", type=int, default=None,
                    dest="rows_per_file")
    dq = sub.add_parser("dq")
    dq.add_argument("--spec", required=True,
                    help="JSON file: {tables: {name: path}, "
                         "expectations: [{name, kind, table, column, ...}]}")
    dq.add_argument("--table", action="append", default=None,
                    help="name=path override/addition (repeatable)")
    ro = sub.add_parser("rollback")
    ro.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    ro.add_argument("--to-version", type=int, required=True,
                    dest="to_version",
                    help="committed version to restore as a new commit")
    ro.add_argument("--checkpoints", default=None,
                    help="also refresh this token-mirror directory")
    br = sub.add_parser("branch")
    br.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    br.add_argument("--to", required=True,
                    help="empty directory for the new branch root")
    df = sub.add_parser("diff")
    df.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    df.add_argument("--other", required=True,
                    help="second store root to compare against")
    df.add_argument("--sample", type=int, default=5,
                    help="example keys reported per category")
    sy = sub.add_parser("sync")
    sy.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot",
                    help="source store")
    sy.add_argument("--to", required=True, help="replica store root")
    gt = sub.add_parser("get")
    gt.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    gt.add_argument("--buckets", type=int, default=0,
                    help="hash modulus; omit to read it from the manifest")
    gt.add_argument("--key", action="append", required=True,
                    help="repo/path (repeatable)")
    rb = sub.add_parser("rebucket")
    rb.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    rb.add_argument("--buckets", type=int, required=True)
    rb.add_argument("--rows-per-file", type=int, default=None,
                    dest="rows_per_file")
    sc = sub.add_parser("scan")
    sc.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    sc.add_argument("--from", required=True, dest="from_key",
                    help="range start as repo/path (inclusive)")
    sc.add_argument("--to", required=True, dest="to_key",
                    help="range end as repo/path (inclusive)")
    sc.add_argument("--version", type=int, default=0)
    sc.add_argument("--out", default=None)
    cu = sub.add_parser("curate")
    cu.add_argument("--snapshot", default="/tmp/kcm_ray/snapshot")
    cu.add_argument("--checkpoints", default="/tmp/kcm_ray/checkpoints")
    cu.add_argument("--index", required=True)
    cu.add_argument("--curated", required=True)
    cu.add_argument("--windows", type=int, default=3)
    cu.add_argument("--events", type=int, default=20_000)
    cu.add_argument("--partitions", type=int, default=4)
    cu.add_argument("--buckets", type=int, default=16)
    cu.add_argument("--index-buckets", type=int, default=16,
                    dest="index_buckets")
    cu.add_argument("--screen", choices=["exact", "minhash"],
                    default="exact",
                    help="membership test: exact md5 or LSH near-dup")
    cu.add_argument("--ann", default=None, dest="ann_dir",
                    help="also ingest each window's admitted docs into a "
                         "persisted IVF index at this directory")
    cu.add_argument("--dq-spec", default=None, dest="dq_spec",
                    help="JSON expectations over the 'admitted' table; "
                         "per-window counts ride in the summaries and "
                         "the _CURATED markers")
    cu.add_argument("--seed", type=int, default=42)
    an = sub.add_parser("ann")
    an.add_argument("--embeddings", required=True,
                    help="embeddings parquet file")
    an.add_argument("--index", required=True)
    an.add_argument("--build", action="store_true")
    an.add_argument("--append", action="store_true",
                    help="incrementally add the embeddings to a committed "
                         "index (new generation; frozen centroids)")
    an.add_argument("--compact", action="store_true",
                    help="fold committed append generations into one "
                         "base cell set (answers unchanged)")
    an.add_argument("--cells", type=int, default=16)
    an.add_argument("--seed", type=int, default=42)
    an.add_argument("--id-col", default="vec_id", dest="id_col")
    an.add_argument("--vec-col", default="embedding", dest="vec_col")
    an.add_argument("--query-ids", default=None, dest="query_ids",
                    help="comma-separated vec ids to query")
    an.add_argument("--k", type=int, default=10)
    an.add_argument("--nprobe", type=int, default=4)
    an.add_argument("--limit", type=int, default=20)
    bm = sub.add_parser("bm25")
    bm.add_argument("--docs", required=True, help="documents parquet file")
    bm.add_argument("--index", required=True)
    bm.add_argument("--build", action="store_true")
    bm.add_argument("--buckets", type=int, default=16)
    bm.add_argument("--id-col", default="doc_id", dest="id_col")
    bm.add_argument("--text-col", default="text", dest="text_col")
    bm.add_argument("--terms", default=None,
                    help="comma-separated query terms")
    bm.add_argument("--k", type=int, default=10)
    al = sub.add_parser("alter")
    al.add_argument("--snapshot", required=True)
    al.add_argument("--column", required=True)
    al.add_argument("--const", default=None)
    al.add_argument("--const-type", default="str", dest="const_type",
                    choices=["str", "int"])
    al.add_argument("--derive", default=None, choices=["chars", "tokens"])
    al.add_argument("--drop", action="store_true",
                    help="drop --column instead of adding one")
    ix = sub.add_parser("index")
    ix.add_argument("--snapshot", default=None,
                    help="snapshot store root (required with --apply)")
    ix.add_argument("--index", required=True)
    ix.add_argument("--column", default="lang")
    ix.add_argument("--buckets", type=int, default=16)
    ix.add_argument("--apply", action="store_true")
    ix.add_argument("--compact", action="store_true")
    ix.add_argument("--value", default=None)
    ix.add_argument("--fetch", action="store_true",
                    help="with --value: point-read the full rows of the "
                    "matched keys from --snapshot")
    ix.add_argument("--counts", action="store_true")
    ix.add_argument("--auto-compact", type=int, default=None,
                    dest="auto_compact", metavar="N",
                    help="fold the index when any bucket exceeds N "
                    "window files")
    sub.add_parser("help")
    args = p.parse_args(argv)
    if args.cmd == "healthcheck":
        return healthcheck(args)
    if args.cmd == "replay":
        return replay(args)
    if args.cmd == "validate":
        return validate(args)
    if args.cmd == "gc":
        return gc(args)
    if args.cmd == "export":
        return export(args)
    if args.cmd == "query":
        return query(args)
    if args.cmd == "queries":
        return list_queries(args)
    if args.cmd == "ivm":
        return ivm(args)
    if args.cmd == "compact":
        return compact(args)
    if args.cmd == "delete":
        return delete_cmd(args)
    if args.cmd == "dq":
        return dq_cmd(args)
    if args.cmd == "rollback":
        return rollback_cmd(args)
    if args.cmd == "branch":
        return branch_cmd(args)
    if args.cmd == "diff":
        return diff_cmd(args)
    if args.cmd == "sync":
        return sync_cmd(args)
    if args.cmd == "get":
        return get_cmd(args)
    if args.cmd == "scan":
        return scan_cmd(args)
    if args.cmd == "rebucket":
        return rebucket_cmd(args)
    if args.cmd == "curate":
        return curate(args)
    if args.cmd == "ann":
        return ann_cmd(args)
    if args.cmd == "bm25":
        return bm25_cmd(args)
    if args.cmd == "index":
        return index_cmd(args)
    if args.cmd == "alter":
        return alter_cmd(args)
    p.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
