"""Copy-on-write Parquet snapshot store with atomic manifest commit.

The reference sink writes straight into MongoDB collections and relies
on upsert idempotence alone — a failed bulk write is logged and its
offsets still advance (``sink/MongoSinkTask.kt:85-88``, the "@todo
Retry" at-most-once hole SURVEY.md §3.3 tells us NOT to copy). This
store replaces that with an exactly-once-on-final-state protocol:

- state lives in per-bucket Parquet files,
  ``root/v{N:06d}/bucket={b}.parquet``;
- a version's **manifest** maps every bucket to the FILE that holds
  its current state — buckets untouched by a job point at an older
  version's file (true copy-on-write: commit cost is O(changed
  buckets), not O(key space));
- appliers write into a staging dir; ``commit()`` renames it into
  place, writes the manifest (with per-bucket lineage/metrics and
  per-partition resume tokens), then atomically flips ``CURRENT`` —
  the single visibility event. A crash anywhere before the flip
  leaves the previous version live; replaying the job is idempotent
  (LWW), so the crash window is safe.

Layout is resumable and shardable: one file per bucket (split into
``rows_per_file`` parts when large), never one giant file. Each part
file's exact (repo, path) key bounds and ts min/max ride the manifest
(zone maps — see ``files_for_key_range`` / ``read_bucket_for_keys``),
and ``run_rebucket`` re-partitions the whole store to a new bucket
count in one distributed exchange, recording the new ``num_buckets``
contract in the manifest.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA
from kafka_connect_mongo_ray.utils import atomic_write_json, read_json


class ConcurrentCommitError(RuntimeError):
    """Another job committed since this one planned its version —
    optimistic concurrency control refused the second commit (replaying
    the refused job is idempotent, so the caller can simply retry)."""


class StagingClobberedError(RuntimeError):
    """A staged bucket file recorded by this job's appliers is missing
    at commit time — some other process deleted or moved the staging
    dir mid-run. Committing anyway would silently carry forward stale
    bucket state while resume tokens advance (permanent event loss),
    so the commit fails loudly instead; the replay is idempotent and
    can simply be rerun."""


class SnapshotStore:
    def __init__(self, root: str, *, create: bool = True):
        self.root = root
        if create:
            os.makedirs(root, exist_ok=True)

    # -- versions ----------------------------------------------------------
    def current_version(self) -> int:
        cur = read_json(os.path.join(self.root, "CURRENT"))
        return cur["version"] if cur else 0

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def manifest(self, version: int) -> dict | None:
        if version <= 0:
            return None
        return read_json(os.path.join(self._vdir(version), "manifest.json"))

    # -- read --------------------------------------------------------------
    def read_bucket(self, version: int, bucket: int) -> pa.Table | None:
        m = self.manifest(version)
        if not m:
            return None
        rels = m["buckets"].get(str(bucket))
        if rels is None:
            return None
        if isinstance(rels, str):  # single-file entry
            rels = [rels]
        tables = [pq.read_table(os.path.join(self.root, r)) for r in rels]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    def read_bucket_for_keys(self, version: int, bucket: int,
                             keys: list[tuple[str, str]]) -> pa.Table | None:
        """Bucket read pruned to the part files whose zone-map
        [first_key, last_key] interval could contain one of ``keys`` —
        a point GET on a rows_per_file-split bucket opens one part
        file instead of all of them. Files without stats are kept
        (legacy manifests degrade to the full-bucket read)."""
        m = self.manifest(version)
        if not m:
            return None
        rels = m["buckets"].get(str(bucket))
        if rels is None:
            return None
        if isinstance(rels, str):
            rels = [rels]
        stats = m.get("file_stats", {})
        ks = sorted(tuple(k) for k in keys)

        def may_hold(rel: str) -> bool:
            st = stats.get(rel)
            if st is None:
                return True
            if st.get("rows", 1) == 0:
                return False
            fk, lk = st.get("first_key"), st.get("last_key")
            if fk is None or lk is None:
                return True
            fk, lk = tuple(fk), tuple(lk)
            return any(fk <= k <= lk for k in ks)

        hit = [r for r in rels if may_hold(r)]
        if not hit:
            return None
        tables = [pq.read_table(os.path.join(self.root, r)) for r in hit]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    def bucket_files(self, version: int) -> list[str]:
        m = self.manifest(version)
        if not m:
            return []
        out = []
        for rels in m["buckets"].values():
            for r in ([rels] if isinstance(rels, str) else rels):
                out.append(os.path.join(self.root, r))
        return out

    def files_for_key_range(self, version: int,
                            lo_key: tuple[str, str],
                            hi_key: tuple[str, str]) -> tuple[list[str], int]:
        """Zone-map pruning for a composite-key range scan: relative
        paths of the part files whose [first_key, last_key] interval
        (recorded at write time — each part file is a contiguous slice
        of its canonically sorted bucket) overlaps [lo_key, hi_key],
        plus the TOTAL live file count for observability. Files
        without stats (pre-zone-map commits) are conservatively kept;
        empty files are skipped. Pure manifest arithmetic — no file,
        not even a footer, is opened."""
        m = self.manifest(version)
        if not m:
            return [], 0
        stats = m.get("file_stats", {})
        lo, hi = tuple(lo_key), tuple(hi_key)
        out, total = [], 0
        for rels in m["buckets"].values():
            for r in ([rels] if isinstance(rels, str) else rels):
                total += 1
                st = stats.get(r)
                if st is None:
                    out.append(r)  # unknown bounds: must scan
                    continue
                if st.get("rows", 1) == 0:
                    continue
                fk, lk = st.get("first_key"), st.get("last_key")
                if fk is None or lk is None:
                    out.append(r)
                    continue
                if tuple(lk) < lo or tuple(fk) > hi:
                    continue
                out.append(r)
        return out, total

    def tokens(self, version: int) -> dict[int, tuple[int, int]]:
        """Per-partition resume tokens recorded at the given commit."""
        m = self.manifest(version)
        if not m:
            return {}
        return {int(p): (t[0], t[1]) for p, t in m.get("tokens", {}).items()}

    # -- write path --------------------------------------------------------
    def staging_dir(self, new_version: int, nonce: str | None = None) -> str:
        """Per-job staging dir. ``nonce`` stamps the dir with a job-unique
        suffix so two drivers racing toward the same version each stage
        into a PRIVATE dir — neither can clobber the other's staged
        files (the OCC check at commit then refuses the loser)."""
        suffix = f".{nonce}" if nonce else ""
        d = os.path.join(self.root, f".staging-v{new_version:06d}{suffix}")
        os.makedirs(d, exist_ok=True)
        return d

    def clean_staging(self, new_version: int, nonce: str | None = None) -> None:
        """Called at job start: a crashed prior attempt may have left
        partial staging files; committing would sweep them into the
        manifest. With a nonce this only removes THIS job's dir (a
        fresh nonce makes it a no-op) — never another job's staging."""
        suffix = f".{nonce}" if nonce else ""
        d = os.path.join(self.root, f".staging-v{new_version:06d}{suffix}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    def clean_stale_staging(self) -> list[str]:
        """Remove orphaned staging dirs whose target version has already
        been committed (their job either finished — staging renamed
        away — or lost the OCC race; either way the leftovers are
        garbage). Same-or-future-version dirs are left alone: they may
        belong to a live concurrent job."""
        current = self.current_version()
        removed = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith(".staging-v"):
                continue
            try:
                v = int(name[len(".staging-v"):].split(".")[0])
            except ValueError:
                continue
            if v <= current:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
                removed.append(name)
        return removed

    def write_bucket_staging(self, new_version: int, bucket: int, state: pa.Table,
                             rows_per_file: int | None = None,
                             nonce: str | None = None) -> str:
        """Called by applier actors; rows must already be in canonical
        (repo, path) order for byte-stable output (SURVEY.md §7.4).
        Large buckets split into multiple files of ``rows_per_file``
        (never one giant file); returns the paths joined by ','."""
        d = self.staging_dir(new_version, nonce)
        # schema may carry evolved payload columns beyond SNAPSHOT_SCHEMA;
        # the canonical columns must lead and be exactly typed
        assert state.schema.names[: len(SNAPSHOT_SCHEMA.names)] == SNAPSHOT_SCHEMA.names
        n = state.num_rows
        step = rows_per_file if rows_per_file and rows_per_file > 0 else max(n, 1)
        finals = []
        for i, off in enumerate(range(0, max(n, 1), step)):
            chunk = state.slice(off, step)
            fname = f"bucket={bucket}-{i:04d}.parquet"
            tmp = os.path.join(d, fname + ".tmp")
            pq.write_table(chunk, tmp, compression="zstd")
            final = os.path.join(d, fname)
            os.replace(tmp, final)
            # zone-map sidecar: the chunk is a contiguous slice of the
            # canonically (repo, path)-sorted bucket, so its first/last
            # rows ARE its exact key bounds — free at write time, and
            # commit() folds them into the manifest so range readers
            # prune part files without opening any footer
            stats: dict = {"rows": chunk.num_rows}
            if chunk.num_rows:
                last = chunk.num_rows - 1
                stats["first_key"] = [chunk["repo"][0].as_py(),
                                      chunk["path"][0].as_py()]
                stats["last_key"] = [chunk["repo"][last].as_py(),
                                     chunk["path"][last].as_py()]
                import pyarrow.compute as _pc

                ts_mm = _pc.min_max(chunk["ts"]).as_py()
                stats["ts"] = [ts_mm["min"], ts_mm["max"]]
            atomic_write_json(final + ".zmap.json", stats)
            finals.append(final)
        return ",".join(finals)

    def gc(self, *, keep_last: int = 2) -> dict:
        """Garbage-collect versions older than the last ``keep_last``.

        COW-aware: a bucket file in an old version dir may still be
        referenced (carried forward) by a kept manifest — such files
        survive; everything else in expired version dirs is deleted.
        CURRENT is never touched, so the operation is safe to run
        concurrently with readers of kept versions."""
        current = self.current_version()
        keep_versions = [v for v in range(max(1, current - keep_last + 1), current + 1)]
        referenced: set[str] = set()
        for v in keep_versions:
            m = self.manifest(v)
            if m:
                for rels in m["buckets"].values():
                    for r in ([rels] if isinstance(rels, str) else rels):
                        referenced.add(os.path.normpath(r))
        deleted_files = 0
        deleted_versions = []
        partially_cleaned = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("v"):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v in keep_versions or v > current:
                continue
            vdir = os.path.join(self.root, name)
            survivors = 0
            for f in sorted(os.listdir(vdir)):
                rel = os.path.normpath(os.path.join(name, f))
                if rel in referenced:
                    survivors += 1
                    continue
                os.unlink(os.path.join(vdir, f))
                deleted_files += 1
            # only report a version as deleted when its dir actually
            # went away; versions whose files are still referenced
            # (carried forward into kept manifests) are partial
            if survivors == 0:
                os.rmdir(vdir)
                deleted_versions.append(v)
            else:
                partially_cleaned.append(v)
        return {"deleted_versions": deleted_versions, "deleted_files": deleted_files,
                "partially_cleaned": partially_cleaned, "kept_versions": keep_versions}

    def commit(
        self,
        new_version: int,
        *,
        tokens: dict[int, tuple[int, int]],
        metrics: list[dict] | None = None,
        prev_version: int | None = None,
        union_schema: str | None = None,
        nonce: str | None = None,
        expected_files: list[str] | None = None,
        num_buckets: int | None = None,
        full_rewrite: bool = False,
    ) -> dict:
        """Atomic publish: staging → v{N}, manifest, CURRENT flip.

        Optimistic concurrency: the flip only happens if CURRENT still
        equals the version this job planned against; a concurrent
        commit in the meantime raises ``ConcurrentCommitError``. This
        is check-then-act, not a mutex — it catches the realistic
        failure (two sequential jobs stepping on each other), while
        truly simultaneous committers need an external lock (one
        driver per table is the intended deployment, as in the
        reference's one-connector-per-namespace model)."""
        prev = self.current_version() if prev_version is None else prev_version
        live = self.current_version()
        if live != prev:
            raise ConcurrentCommitError(
                f"planned against v{prev} but CURRENT is v{live}; "
                "retry the replay (idempotent)"
            )
        # staged-file audit: every bucket file the appliers reported
        # must still exist — a missing one means the staging dir was
        # clobbered mid-run; committing would silently lose events
        # while resume tokens advance (ADVICE: fail loudly instead)
        missing = [p for p in (expected_files or []) if not os.path.isfile(p)]
        if missing:
            raise StagingClobberedError(
                f"{len(missing)} staged bucket file(s) vanished before commit "
                f"(first: {missing[0]}); staging was clobbered — rerun the "
                "replay (idempotent)"
            )
        staging = self.staging_dir(new_version, nonce)
        vdir = self._vdir(new_version)
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
        os.replace(staging, vdir)

        buckets: dict[str, list] = {}
        prev_manifest = self.manifest(prev)
        if prev_manifest and not full_rewrite:
            # COW carry-forward — suppressed for full rewrites
            # (rebucket): carrying an old-modulus bucket whose id the
            # new layout doesn't overwrite would leave every row it
            # holds live TWICE (its relocated copy plus the stale file)
            buckets.update(prev_manifest["buckets"])
        vname = os.path.basename(vdir)
        fresh: dict[str, list] = {}
        fresh_stats: dict[str, dict] = {}
        for f in sorted(os.listdir(vdir)):
            if f.startswith("bucket=") and f.endswith(".parquet"):
                b = f[len("bucket="):-len(".parquet")].split("-")[0]
                rel = os.path.join(vname, f)
                fresh.setdefault(b, []).append(rel)
                zmap = os.path.join(vdir, f + ".zmap.json")
                st = read_json(zmap)
                if st is not None:
                    fresh_stats[rel] = st
                    os.unlink(zmap)  # manifest is the source of truth
        buckets.update(fresh)

        # zone maps: fresh files bring their sidecar stats; COW
        # carry-forward files keep the stats their own commit recorded
        # (rel paths are stable across versions). Files without stats
        # simply stay unprunable — readers treat missing as "scan".
        file_stats: dict[str, dict] = {}
        if prev_manifest:
            file_stats.update(prev_manifest.get("file_stats", {}))
        file_stats.update(fresh_stats)
        live_rels = {r for rels in buckets.values()
                     for r in ([rels] if isinstance(rels, str) else rels)}
        file_stats = {r: s for r, s in file_stats.items() if r in live_rels}

        # lineage metrics: fresh rows for touched buckets; untouched
        # (carried-forward) buckets keep their previous metrics so
        # cumulative views (healthcheck live_rows) stay truthful
        merged_metrics: dict[str, dict] = {}
        if prev_manifest and not full_rewrite:
            # a full rewrite's metrics describe the NEW layout only;
            # old per-bucket lineage rows would report buckets that no
            # longer hold those rows
            for m in prev_manifest.get("metrics", []):
                merged_metrics[str(m.get("bucket"))] = m
        for m in metrics or []:
            mm = dict(m)
            if mm.get("carried_forward") and str(mm.get("bucket")) in merged_metrics:
                continue  # keep the previous (informative) row
            merged_metrics[str(mm.get("bucket"))] = mm
        if union_schema is None and prev_manifest:
            union_schema = prev_manifest.get("union_schema")
        if num_buckets is None and prev_manifest:
            # carry the bucket-count contract so readers (point GET's
            # hash rule) can derive it from the manifest instead of
            # trusting a CLI flag; absent on pre-contract manifests
            num_buckets = prev_manifest.get("num_buckets")
        manifest = {
            "version": new_version,
            "parent": prev,
            "union_schema": union_schema,
            "buckets": buckets,
            "tokens": {str(p): [t[0], t[1]] for p, t in sorted(tokens.items())},
            "metrics": sorted(merged_metrics.values(), key=lambda m: m.get("bucket", -1)),
            "file_stats": file_stats,
            "num_buckets": num_buckets,
        }
        atomic_write_json(os.path.join(vdir, "manifest.json"), manifest)
        atomic_write_json(os.path.join(self.root, "CURRENT"), {"version": new_version})
        return manifest


def run_compaction(snapshot_dir: str, *, min_files: int = 2,
                   rows_per_file: int | None = None,
                   nonce: str | None = None) -> dict:
    """Compact fragmented buckets into the TARGET layout
    ``rows_per_file`` (pass the deployment's
    ``EngineConfig.snapshot_rows_per_file``; None ⇒ one file): a
    bucket is rewritten only when it holds ≥ ``min_files`` part files
    AND the rewrite would actually reduce its file count — so a bucket
    already at the configured split is left alone and compaction
    cannot churn against the apply path's own splitting. Untouched
    buckets are COW carry-forwards (zero bytes). Rows are unchanged —
    part files are ordered slices of the canonically sorted bucket
    state, so concatenation preserves the byte-stable order — and the
    new manifest carries the previous version's resume tokens
    verbatim, so an interrupted compaction is simply re-run (the OCC
    commit refuses a racing writer).

    Distributed one task per fragmented bucket (the diff.py pattern);
    the driver sees only the bucket list and the commit."""
    import math

    import ray.data as rd

    store = SnapshotStore(snapshot_dir, create=False)
    v = store.current_version()
    m = store.manifest(v)
    if not m:
        return {"version": v, "compacted": 0, "new_version": v}

    def target_files(rels: list[str]) -> int:
        if rows_per_file is None:
            return 1
        rows = sum(pq.read_metadata(os.path.join(snapshot_dir, r)).num_rows
                   for r in rels)
        return max(1, math.ceil(rows / rows_per_file))

    frag = sorted(int(b) for b, rels in m["buckets"].items()
                  if not isinstance(rels, str) and len(rels) >= min_files
                  and target_files(rels) < len(rels))
    if not frag:
        return {"version": v, "compacted": 0, "new_version": v}
    new_v = v + 1
    store.clean_staging(new_v, nonce)

    root = snapshot_dir

    def compact_task(batch):
        import pyarrow as _pa

        st = SnapshotStore(root, create=False)
        out_files, out_b = [], []
        for b in batch["bucket"].to_pylist():
            t = st.read_bucket(v, int(b))
            rel = st.write_bucket_staging(new_v, int(b), t,
                                          rows_per_file=rows_per_file,
                                          nonce=nonce)
            out_b.append(int(b))
            out_files.append(rel)
        return _pa.table({"bucket": _pa.array(out_b, _pa.int64()),
                          "files": _pa.array(out_files, _pa.string())})

    res = (rd.from_items([{"bucket": b} for b in frag])
           .map_batches(compact_task, batch_size=1,
                        batch_format="pyarrow").take_all())
    expected = [p for r in res for p in r["files"].split(",")]
    store.commit(new_v, tokens=store.tokens(v), prev_version=v,
                 union_schema=(m.get("union_schema")), nonce=nonce,
                 expected_files=expected)
    return {"version": v, "new_version": new_v, "compacted": len(frag),
            "buckets": frag}


def run_rebucket(snapshot_dir: str, new_buckets: int, *,
                 rows_per_file: int | None = None,
                 nonce: str | None = None) -> dict:
    """Re-partition the store to a different bucket count — the
    operational move when a table outgrows (or rattles around in) its
    original layout. Every key moves to ``hash64(key) % new_buckets``
    via ONE distributed hash exchange (the same rule the apply shuffle
    and the point GET use), each new bucket's rows re-sorted to the
    canonical (repo, path) order inside its own task, written through
    the staging/zone-map path, and committed atomically with the NEW
    ``num_buckets`` recorded in the manifest — readers switch rules at
    the CURRENT flip, never mid-read. Resume tokens carry verbatim
    (re-bucketing moves rows, not progress). A full rewrite by nature:
    every row relocates, so there is no COW carry-forward to exploit.

    The reference has no analog (MongoDB reshards server-side); this
    is the Ray-native equivalent of `sh.reshardCollection`."""
    import ray.data as rd

    from kafka_connect_mongo_ray.sources.snapshot_source import SnapshotDatasource
    from kafka_connect_mongo_ray.utils import hash_buckets

    if new_buckets < 1:
        raise ValueError(f"new_buckets must be >= 1, got {new_buckets}")
    store = SnapshotStore(snapshot_dir, create=False)
    v = store.current_version()
    m = store.manifest(v)
    if not m:
        return {"version": v, "new_version": v, "rebucketed": 0}
    new_v = v + 1
    store.clean_staging(new_v, nonce)

    files = store.bucket_files(v)
    union_b64 = m.get("union_schema")
    # live_only=False: the store's state INCLUDES tombstone rows (they
    # suppress late duplicates); a rebucket must move them too
    ds = rd.read_datasource(SnapshotDatasource(files, union_b64,
                                               live_only=False))

    def assign(batch):
        b = hash_buckets(batch, ["repo", "path"], new_buckets)
        return batch.append_column("__bucket", pa.array(b))

    root = snapshot_dir

    def write_group(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        b = int(batch["__bucket"][0].as_py())
        t = batch.drop_columns(["__bucket"]).sort_by(
            [("repo", "ascending"), ("path", "ascending")])
        st = SnapshotStore(root, create=False)
        rel = st.write_bucket_staging(new_v, b, t,
                                      rows_per_file=rows_per_file,
                                      nonce=nonce)
        live = int(_pc.sum(_pc.is_valid(t["content"]).cast(pa.int64())
                           ).as_py() or 0)
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "files": pa.array([rel], pa.string()),
                         "state_rows": pa.array([t.num_rows], pa.int64()),
                         "live_rows": pa.array([live], pa.int64())})

    res = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("__bucket", num_partitions=new_buckets)
           .map_groups(write_group, batch_format="pyarrow").take_all())
    expected = [p for r in res for p in r["files"].split(",")]
    metrics = [{"bucket": int(r["bucket"]), "events_in": 0,
                "state_rows": int(r["state_rows"]),
                "live_rows": int(r["live_rows"])} for r in res]
    # full_rewrite: every row relocated, so NO carry-forward — a stale
    # old-modulus bucket (or its lineage row) surviving the commit
    # would double every row it holds in scans and break healthcheck
    store.commit(new_v, tokens=store.tokens(v), prev_version=v,
                 union_schema=union_b64, nonce=nonce,
                 expected_files=expected, num_buckets=new_buckets,
                 metrics=metrics, full_rewrite=True)
    return {"version": v, "new_version": new_v,
            "rebucketed": len(res), "num_buckets": new_buckets}


ALTER_DERIVATIONS = ("chars", "tokens")


def _load_union_schema(store: "SnapshotStore", m: dict, v: int):
    """The manifest-recorded union schema, or the first bucket file's
    schema on pre-contract stores; plus its base64 form helper."""
    import base64

    union_b64 = m.get("union_schema")
    if union_b64:
        return pa.ipc.read_schema(
            pa.BufferReader(base64.b64decode(union_b64)))
    import pyarrow.parquet as pq

    return pq.read_schema(store.bucket_files(v)[0])


def _rewrite_all_buckets(snapshot_dir: str, column: str, *,
                         transform, new_schema: pa.Schema,
                         rows_per_file: int | None, nonce: str | None,
                         store: "SnapshotStore", m: dict, v: int) -> dict:
    """The shared trunk of the ALTER family: one task per bucket reads
    its own part files, applies ``transform(table) -> table``, and
    rewrites through the staging / zone-map path — SHUFFLE-FREE (rows
    never leave their bucket). Committed with ``full_rewrite=True``
    (every bucket rewritten — the rebucket footgun rule: a
    carried-forward old bucket would resurrect the un-altered schema),
    the given union schema recorded, tokens carried verbatim.
    Re-running after a crash restarts cleanly (staging swept, OCC
    commit)."""
    import base64

    import ray.data as rd

    new_union_b64 = base64.b64encode(
        new_schema.serialize().to_pybytes()).decode()
    new_v = v + 1
    store.clean_staging(new_v, nonce)
    work = [{"bucket": b, "files": ",".join([r] if isinstance(r, str)
                                            else r)}
            for b, r in m["buckets"].items()]
    root = snapshot_dir

    def rewrite(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq

        out = []
        for row in batch.to_pylist():
            b = int(row["bucket"])
            parts = [pq.read_table(os.path.join(root, r))
                     for r in row["files"].split(",")]
            t = parts[0] if len(parts) == 1 else pa.concat_tables(
                parts, promote_options="permissive")
            t = transform(t)
            t = t.sort_by([("repo", "ascending"), ("path", "ascending")])
            st = SnapshotStore(root, create=False)
            rel = st.write_bucket_staging(new_v, b, t,
                                          rows_per_file=rows_per_file,
                                          nonce=nonce)
            live = int(_pc.sum(_pc.is_valid(t["content"]).cast(pa.int64())
                               ).as_py() or 0)
            out.append({"bucket": b, "files": rel,
                        "state_rows": t.num_rows, "live_rows": live})
        return pa.Table.from_pylist(out)

    res = (rd.from_items(work)
           .map_batches(rewrite, batch_size=1, batch_format="pyarrow")
           .take_all())
    expected = [p for r in res for p in r["files"].split(",")]
    metrics = [{"bucket": int(r["bucket"]), "events_in": 0,
                "state_rows": int(r["state_rows"]),
                "live_rows": int(r["live_rows"])} for r in res]
    store.commit(new_v, tokens=store.tokens(v), prev_version=v,
                 union_schema=new_union_b64, nonce=nonce,
                 expected_files=expected,
                 num_buckets=m.get("num_buckets"),
                 metrics=metrics, full_rewrite=True)
    return {"version": v, "new_version": new_v, "column": column,
            "buckets_rewritten": len(res),
            "rows": int(sum(r["state_rows"] for r in res))}


def run_alter_add_column(snapshot_dir: str, column: str, *,
                         const: str | int | None = None,
                         derive: str | None = None,
                         rows_per_file: int | None = None,
                         nonce: str | None = None) -> dict:
    """ALTER TABLE ADD COLUMN with distributed backfill — the schema
    migration a lake table needs when a new attribute must exist on
    EVERY historical row (not just rows the change stream touches from
    now on; organic evolution via events already works —
    ``stages/apply.py::unify_payload_schemas``).

    Exactly one of ``const`` (a literal applied to every row) or
    ``derive`` (a built-in derivation of the content column: "chars" =
    UTF-8 length, "tokens" = whitespace token count; NULL content —
    tombstones — derives NULL). Execution and commit semantics:
    :func:`_rewrite_all_buckets`. Refuses a column that already exists
    anywhere in the store's schema — altering types or overwriting
    values is out of scope (drop+re-add is the explicit path)."""
    if (const is None) == (derive is None):
        raise ValueError("pass exactly one of const= or derive=")
    if derive is not None and derive not in ALTER_DERIVATIONS:
        raise ValueError(f"unknown derivation {derive!r}; "
                         f"one of {ALTER_DERIVATIONS}")
    store = SnapshotStore(snapshot_dir, create=False)
    v = store.current_version()
    m = store.manifest(v)
    if not m:
        raise ValueError(f"no committed version at {snapshot_dir}")
    schema = _load_union_schema(store, m, v)
    if column in schema.names:
        raise ValueError(f"column {column!r} already exists; altering "
                         "existing columns is refused by design")
    if const is not None:
        new_field = pa.field(
            column, pa.int64() if isinstance(const, int) else pa.string())
    else:
        new_field = pa.field(column, pa.int64())

    def add_col(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        if const is not None:
            col = pa.array([const] * t.num_rows, new_field.type)
        elif derive == "chars":
            col = _pc.cast(_pc.utf8_length(t["content"]), pa.int64())
        else:  # tokens
            col = _pc.cast(
                _pc.count_substring_regex(t["content"], r"\S+"),
                pa.int64())
        return t.append_column(column, col)

    return _rewrite_all_buckets(snapshot_dir, column, transform=add_col,
                                new_schema=schema.append(new_field),
                                rows_per_file=rows_per_file, nonce=nonce,
                                store=store, m=m, v=v)


def run_alter_drop_column(snapshot_dir: str, column: str, *,
                          rows_per_file: int | None = None,
                          nonce: str | None = None) -> dict:
    """ALTER TABLE DROP COLUMN — the add-column inverse, same
    :func:`_rewrite_all_buckets` execution / commit semantics with the
    union schema contracted. Core-schema columns (the engine's own row
    contract) are refused; so is a column absent from the union
    schema. A bucket whose files predate the column simply rewrites
    unchanged (the drop is a no-op select). Drop+re-add is the
    sanctioned path for changing a backfilled column's values."""
    from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA

    if column in SNAPSHOT_SCHEMA.names:
        raise ValueError(f"column {column!r} is part of the engine's "
                         "core row contract; refusing to drop it")
    store = SnapshotStore(snapshot_dir, create=False)
    v = store.current_version()
    m = store.manifest(v)
    if not m:
        raise ValueError(f"no committed version at {snapshot_dir}")
    schema = _load_union_schema(store, m, v)
    if column not in schema.names:
        raise ValueError(f"column {column!r} does not exist")
    keep = [n for n in schema.names if n != column]

    def drop_col(t: pa.Table) -> pa.Table:
        return (t.drop_columns([column]) if column in t.column_names
                else t)

    return _rewrite_all_buckets(
        snapshot_dir, column, transform=drop_col,
        new_schema=pa.schema([schema.field(n) for n in keep]),
        rows_per_file=rows_per_file, nonce=nonce, store=store, m=m, v=v)


def run_delete_where(snapshot_dir: str, *, ts_before: int | None = None,
                     repo_equals: str | None = None,
                     mode: str = "tombstone",
                     delete_ts: int | None = None,
                     rows_per_file: int | None = None,
                     nonce: str | None = None) -> dict:
    """Predicate delete over the snapshot store — the retention /
    right-to-erasure maintenance op (reference analog: none; MongoDB
    users run TTL indexes or deleteMany server-side). Conditions are
    ANDed; at least one is required:

    - ``ts_before``: rows whose stored version ``ts`` is older than
      the cutoff (retention).
    - ``repo_equals``: rows of one repo (erasure by subject).

    Two modes:

    - ``tombstone`` (default): matched LIVE rows become tombstones —
      ``content`` and every evolved payload column nulled, version
      bumped to ``delete_ts`` (default: max resume-token ts + 1) so
      any at-least-once redelivery of the erased images ranks BELOW
      the tombstone and stays dead (the LWW contract); new events
      with ``ts > delete_ts`` still resurrect the key, which is the
      correct CDC semantics. Change feed and IVM see ordinary
      deletions (retraction is null-driven).
    - ``purge``: matched rows (live AND tombstone) are physically
      removed — the lake op for expiring old tombstones; redelivery
      suppression for purged rows is explicitly given up.

    Execution shape: candidate buckets are chosen by the manifest's
    zone maps (a part file whose ``ts`` range or key range cannot
    match is skipped for free; a bucket none of whose files may match
    is never read), one distributed task per candidate bucket rewrites
    it through the staging/zone-map path (row order is untouched, so
    output stays byte-stable), untouched buckets are COW
    carry-forwards, and the commit is the same OCC manifest flip every
    other maintenance op uses. Resume tokens carry verbatim — deleting
    state does not rewind progress."""
    import ray.data as rd

    if ts_before is None and repo_equals is None:
        raise ValueError("delete needs ts_before and/or repo_equals")
    if mode not in ("tombstone", "purge"):
        raise ValueError(f"unknown delete mode {mode!r}")
    store = SnapshotStore(snapshot_dir, create=False)
    v = store.current_version()
    m = store.manifest(v)
    if not m:
        return {"version": v, "new_version": v, "rows_deleted": 0,
                "buckets_rewritten": 0, "buckets_pruned": 0, "mode": mode}
    tokens = store.tokens(v)
    if delete_ts is None:
        delete_ts = (max(t[0] for t in tokens.values()) + 1) if tokens else 0
    stats_map = m.get("file_stats", {})

    def file_may_match(rel: str) -> bool:
        st = stats_map.get(rel)
        if not st or not st.get("rows"):
            return st is None or bool(st.get("rows"))
        if ts_before is not None:
            ts_range = st.get("ts")
            if ts_range is not None and ts_range[0] >= ts_before:
                return False
        if repo_equals is not None:
            fk, lk = st.get("first_key"), st.get("last_key")
            if (fk is not None and lk is not None
                    and not (fk[0] <= repo_equals <= lk[0])):
                return False
        return True

    candidates, pruned = [], 0
    for b, rels in m["buckets"].items():
        rels = [rels] if isinstance(rels, str) else rels
        if any(file_may_match(r) for r in rels):
            candidates.append(int(b))
        else:
            pruned += 1
    if not candidates:
        return {"version": v, "new_version": v, "rows_deleted": 0,
                "buckets_rewritten": 0, "buckets_pruned": pruned,
                "mode": mode}

    new_v = v + 1
    store.clean_staging(new_v, nonce)
    root = snapshot_dir
    n_canon = len(SNAPSHOT_SCHEMA.names)

    def delete_task(batch):
        import pyarrow.compute as _pc

        st = SnapshotStore(root, create=False)
        out = {"bucket": [], "files": [], "deleted": [],
               "state_rows": [], "live_rows": []}
        for b in batch["bucket"].to_pylist():
            t = st.read_bucket(v, int(b))
            mask = pa.array(np.ones(t.num_rows, bool))
            if ts_before is not None:
                mask = _pc.and_(mask, _pc.less(
                    t["ts"], pa.scalar(ts_before, pa.int64())))
            if repo_equals is not None:
                mask = _pc.and_(mask, _pc.equal(
                    t["repo"], pa.scalar(repo_equals)))
            if mode == "tombstone":
                mask = _pc.and_(mask, _pc.is_valid(t["content"]))
            hits = int(_pc.sum(_pc.cast(mask, pa.int64())).as_py() or 0)
            if hits == 0:
                continue  # zone-map false positive: carry forward
            if mode == "purge":
                t = t.filter(_pc.invert(mask))
            else:
                t = t.set_column(
                    t.schema.get_field_index("content"), "content",
                    _pc.if_else(mask, pa.scalar(None, pa.large_string()),
                                t["content"]))
                t = t.set_column(
                    t.schema.get_field_index("ts"), "ts",
                    _pc.if_else(mask, pa.scalar(delete_ts, pa.int64()),
                                t["ts"]))
                t = t.set_column(
                    t.schema.get_field_index("inc"), "inc",
                    _pc.if_else(mask, pa.scalar(0, pa.int32()), t["inc"]))
                t = t.set_column(
                    t.schema.get_field_index("op_rank"), "op_rank",
                    _pc.if_else(mask, pa.scalar(2, pa.int8()),
                                t["op_rank"]))
                # erase evolved payload columns too — the payload is
                # what the erasure contract is about
                for name in t.schema.names[n_canon:]:
                    i = t.schema.get_field_index(name)
                    t = t.set_column(i, name, _pc.if_else(
                        mask, pa.scalar(None, t.schema.field(i).type),
                        t[name]))
            rel = st.write_bucket_staging(new_v, int(b), t,
                                          rows_per_file=rows_per_file,
                                          nonce=nonce)
            live = int(_pc.sum(_pc.is_valid(t["content"]).cast(pa.int64())
                               ).as_py() or 0)
            out["bucket"].append(int(b))
            out["files"].append(rel)
            out["deleted"].append(hits)
            out["state_rows"].append(t.num_rows)
            out["live_rows"].append(live)
        return pa.table({
            "bucket": pa.array(out["bucket"], pa.int64()),
            "files": pa.array(out["files"], pa.string()),
            "deleted": pa.array(out["deleted"], pa.int64()),
            "state_rows": pa.array(out["state_rows"], pa.int64()),
            "live_rows": pa.array(out["live_rows"], pa.int64())})

    res = (rd.from_items([{"bucket": b} for b in sorted(candidates)])
           .map_batches(delete_task, batch_size=1,
                        batch_format="pyarrow").take_all())
    if not res:
        store.clean_staging(new_v, nonce)
        return {"version": v, "new_version": v, "rows_deleted": 0,
                "buckets_rewritten": 0, "buckets_pruned": pruned,
                "mode": mode}
    expected = [p for r in res for p in r["files"].split(",")]
    metrics = [{"bucket": int(r["bucket"]), "events_in": 0,
                "state_rows": int(r["state_rows"]),
                "live_rows": int(r["live_rows"])} for r in res]
    store.commit(new_v, tokens=tokens, prev_version=v,
                 union_schema=m.get("union_schema"), nonce=nonce,
                 expected_files=expected, metrics=metrics)
    return {"version": v, "new_version": new_v, "mode": mode,
            "rows_deleted": int(sum(r["deleted"] for r in res)),
            "buckets_rewritten": len(res), "buckets_pruned": pruned,
            "delete_ts": delete_ts if mode == "tombstone" else None}


def run_branch(snapshot_dir: str, branch_dir: str) -> dict:
    """Zero-copy BRANCH of the store's current version into an
    independent root — the experiment/dev-table workflow (Iceberg/
    Delta branch analog; the reference has none). Every part file of
    the current manifest is HARDLINKED into the branch's v1 dir (same
    bytes on disk once, instantly divergeable, and safe against the
    source's gc: a hardlink keeps the inode alive even after the
    source unlinks it), the manifest is rewritten with the branch's
    own relative paths (zone maps re-keyed, union schema / bucket
    contract / lineage metrics / resume tokens carried verbatim), and
    the branch becomes a fully independent store: replays, deletes,
    compactions and gc on either side never see the other. Falls back
    to a real copy when the filesystem refuses links (cross-device).

    Driver-side work is manifest-sized (one link syscall per part
    file); no data moves through the object store."""
    src = SnapshotStore(snapshot_dir, create=False)
    v = src.current_version()
    m = src.manifest(v)
    if not m:
        raise ValueError(f"{snapshot_dir} has no committed version")
    if os.path.exists(branch_dir) and os.listdir(branch_dir):
        raise ValueError(f"branch target {branch_dir} is not empty")
    dst = SnapshotStore(branch_dir, create=True)
    vdir = dst._vdir(1)
    vname = os.path.basename(vdir)
    os.makedirs(vdir, exist_ok=True)

    new_buckets: dict[str, list] = {}
    new_stats: dict[str, dict] = {}
    linked = 0
    stats_map = m.get("file_stats", {})
    for b, rels in m["buckets"].items():
        rels = [rels] if isinstance(rels, str) else rels
        out = []
        for rel in rels:
            srcf = os.path.join(snapshot_dir, rel)
            new_rel = os.path.join(vname, os.path.basename(rel))
            dstf = os.path.join(branch_dir, new_rel)
            try:
                os.link(srcf, dstf)
            except OSError:
                shutil.copy2(srcf, dstf)
            linked += 1
            out.append(new_rel)
            st = stats_map.get(rel)
            if st is not None:
                new_stats[new_rel] = st
        new_buckets[b] = out

    manifest = {
        "version": 1,
        "parent": 0,
        "union_schema": m.get("union_schema"),
        "buckets": new_buckets,
        "tokens": m.get("tokens", {}),
        "metrics": m.get("metrics", []),
        "file_stats": new_stats,
        "num_buckets": m.get("num_buckets"),
        "branched_from": {"root": os.path.abspath(snapshot_dir),
                          "version": v},
    }
    atomic_write_json(os.path.join(vdir, "manifest.json"), manifest)
    atomic_write_json(os.path.join(branch_dir, "CURRENT"), {"version": 1})
    return {"source_version": v, "branch": branch_dir,
            "files_linked": linked, "buckets": len(new_buckets)}


def run_rollback(snapshot_dir: str, to_version: int) -> dict:
    """Roll the store back to an earlier committed version as a NEW
    COW commit (Iceberg/Delta `RESTORE` analog; the reference has
    none). The new manifest re-publishes ``to_version``'s bucket
    references, resume tokens, zone maps, lineage metrics, union
    schema and bucket contract verbatim, with ``parent`` = the version
    being undone — history is preserved (the bad commits stay
    inspectable until gc) and the operation is itself undoable by a
    second rollback. Because the manifest's tokens rewind with the
    data, the next replay RE-CONSUMES everything after the restored
    point (that is the point of a rollback: undo a bad ingest and
    redeliver).

    Zero data movement: no part file is read, written or linked — the
    commit is manifest-sized, and gc's COW-aware reference scan keeps
    every re-referenced old file alive. Refuses if the target manifest
    is gone (gc'd) or any part file it references was physically
    deleted. Rolling back to the current version is a no-op (no
    commit)."""
    store = SnapshotStore(snapshot_dir, create=False)
    current = store.current_version()
    if current == 0:
        raise ValueError(f"{snapshot_dir} has no committed version")
    target = store.manifest(to_version)
    if target is None:
        raise ValueError(
            f"snapshot version v{to_version} has no manifest under "
            f"{snapshot_dir} (never committed, or garbage-collected)")
    if to_version == current:
        return {"rolled_back": False, "new_version": current,
                "restored_version": to_version,
                "reason": "target is already CURRENT"}
    rels = [r for rs in target["buckets"].values()
            for r in ([rs] if isinstance(rs, str) else rs)]
    missing = [r for r in rels
               if not os.path.isfile(os.path.join(snapshot_dir, r))]
    if missing:
        raise ValueError(
            f"cannot roll back to v{to_version}: {len(missing)} referenced "
            f"part file(s) are gone (first: {missing[0]}); run gc with a "
            "larger --keep-last next time")

    new_version = current + 1
    vdir = store._vdir(new_version)
    if os.path.exists(vdir):
        shutil.rmtree(vdir)  # debris of a crashed attempt
    os.makedirs(vdir, exist_ok=True)
    manifest = {
        "version": new_version,
        "parent": current,
        "union_schema": target.get("union_schema"),
        "buckets": target["buckets"],
        "tokens": target.get("tokens", {}),
        "metrics": target.get("metrics", []),
        "file_stats": target.get("file_stats", {}),
        "num_buckets": target.get("num_buckets"),
        "rollback_of": to_version,
    }
    atomic_write_json(os.path.join(vdir, "manifest.json"), manifest)
    # OCC: refuse the flip if another committer won the race meanwhile
    live = store.current_version()
    if live != current:
        shutil.rmtree(vdir)
        raise ConcurrentCommitError(
            f"planned rollback against v{current} but CURRENT is v{live}")
    atomic_write_json(os.path.join(snapshot_dir, "CURRENT"),
                      {"version": new_version})
    return {"rolled_back": True, "new_version": new_version,
            "restored_version": to_version, "buckets": len(target["buckets"]),
            "files_referenced": len(rels)}


def run_store_diff(snapshot_a: str, snapshot_b: str, *,
                   sample: int = 5) -> dict:
    """Anti-entropy comparison of two stores' LIVE states — the
    validation pass after a branch diverges, a migration lands, or a
    replica is rebuilt. Compares per logical key (repo, path): rows
    present only in A, only in B, and keys live in both whose
    ``content`` differs.

    Execution shape: when the two stores share a bucket contract
    (same ``num_buckets``), the key space is ALREADY co-partitioned —
    one task per bucket id reads both sides' bucket and diffs locally,
    NO shuffle at any scale (the aligned-bucket fast path). Mismatched
    contracts fall back to one hash exchange of (key, content-hash)
    rows from each side. Driver sees counts plus ≤ ``sample`` example
    keys per category."""
    import hashlib

    import ray.data as rd

    a = SnapshotStore(snapshot_a, create=False)
    b = SnapshotStore(snapshot_b, create=False)
    va, vb = a.current_version(), b.current_version()
    ma, mb = a.manifest(va), b.manifest(vb)
    if not ma or not mb:
        raise ValueError("both stores need a committed version")
    nba, nbb = ma.get("num_buckets"), mb.get("num_buckets")

    def live_keyed(t: pa.Table | None) -> dict:
        if t is None or t.num_rows == 0:
            return {}
        import pyarrow.compute as _pc

        t = t.filter(_pc.is_valid(t["content"]))
        out = {}
        for r, p, c in zip(t["repo"].to_pylist(), t["path"].to_pylist(),
                           t["content"].to_pylist()):
            out[(r, p)] = hashlib.sha256(c.encode()).hexdigest()
        return out

    ra, rb = snapshot_a, snapshot_b

    if nba is not None and nba == nbb:
        ids = sorted({int(k) for k in ma["buckets"]}
                     | {int(k) for k in mb["buckets"]})

        def diff_task(batch):
            sa = SnapshotStore(ra, create=False)
            sb = SnapshotStore(rb, create=False)
            only_a = only_b = differ = equal = 0
            ex_a, ex_b, ex_d = [], [], []
            for bid in batch["bucket"].to_pylist():
                ka = live_keyed(sa.read_bucket(va, int(bid)))
                kb = live_keyed(sb.read_bucket(vb, int(bid)))
                for k in ka.keys() - kb.keys():
                    only_a += 1
                    if len(ex_a) < sample:
                        ex_a.append("/".join(k))
                for k in kb.keys() - ka.keys():
                    only_b += 1
                    if len(ex_b) < sample:
                        ex_b.append("/".join(k))
                for k in ka.keys() & kb.keys():
                    if ka[k] != kb[k]:
                        differ += 1
                        if len(ex_d) < sample:
                            ex_d.append("/".join(k))
                    else:
                        equal += 1
            return pa.table({
                "only_a": pa.array([only_a], pa.int64()),
                "only_b": pa.array([only_b], pa.int64()),
                "differ": pa.array([differ], pa.int64()),
                "equal": pa.array([equal], pa.int64()),
                "ex_a": pa.array([",".join(ex_a)], pa.string()),
                "ex_b": pa.array([",".join(ex_b)], pa.string()),
                "ex_d": pa.array([",".join(ex_d)], pa.string())})

        rows = (rd.from_items([{"bucket": i} for i in ids])
                .map_batches(diff_task, batch_size=1,
                             batch_format="pyarrow").take_all())
        mode = "aligned"
    else:
        # contract mismatch: ship (key, sha) rows through ONE hash
        # exchange and diff per key group
        from ray.data.aggregate import Max, Min
        from kafka_connect_mongo_ray.sources.snapshot_source import (
            SnapshotDatasource,
        )

        def keyed_ds(store, v, m, tag):
            ds = rd.read_datasource(SnapshotDatasource(
                store.bucket_files(v), m.get("union_schema"),
                live_only=True))

            def prep(t: pa.Table) -> pa.Table:
                import pyarrow.compute as _pc

                key = _pc.binary_join_element_wise(t["repo"], t["path"],
                                                   "/")
                sha = pa.array([hashlib.sha256(c.encode()).hexdigest()
                                for c in t["content"].to_pylist()],
                               pa.string())
                return pa.table({"key": key, f"sha_{tag}": sha})

            return ds.map_batches(prep, batch_format="pyarrow")

        from kafka_connect_mongo_ray.stages.join import hash_join

        j = hash_join(keyed_ds(a, va, ma, "a"), keyed_ds(b, vb, mb, "b"),
                      on=["key"], how="outer", num_buckets=16)

        def agg(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            av, bv = _pc.is_valid(t["sha_a"]), _pc.is_valid(t["sha_b"])
            both = _pc.and_(av, bv)
            eq = _pc.and_(both, _pc.equal(t["sha_a"], t["sha_b"]))
            df = _pc.and_(both, _pc.invert(_pc.equal(t["sha_a"],
                                                     t["sha_b"])))
            oa = _pc.and_(av, _pc.invert(bv))
            ob = _pc.and_(bv, _pc.invert(av))

            def cnt(m):
                return int(_pc.sum(_pc.cast(m, pa.int64())).as_py() or 0)

            def ex(m):
                return ",".join(t.filter(m)["key"].to_pylist()[:sample])

            return pa.table({
                "only_a": pa.array([cnt(oa)], pa.int64()),
                "only_b": pa.array([cnt(ob)], pa.int64()),
                "differ": pa.array([cnt(df)], pa.int64()),
                "equal": pa.array([cnt(eq)], pa.int64()),
                "ex_a": pa.array([ex(oa)], pa.string()),
                "ex_b": pa.array([ex(ob)], pa.string()),
                "ex_d": pa.array([ex(df)], pa.string())})

        rows = j.map_batches(agg, batch_format="pyarrow").take_all()
        mode = "exchange"

    out = {"mode": mode, "version_a": va, "version_b": vb,
           "only_a": 0, "only_b": 0, "differ": 0, "equal": 0,
           "examples": {"only_a": [], "only_b": [], "differ": []}}
    for r in rows:
        out["only_a"] += int(r["only_a"])
        out["only_b"] += int(r["only_b"])
        out["differ"] += int(r["differ"])
        out["equal"] += int(r["equal"])
        for field, key in (("ex_a", "only_a"), ("ex_b", "only_b"),
                           ("ex_d", "differ")):
            got = [x for x in r[field].split(",") if x]
            room = sample - len(out["examples"][key])
            out["examples"][key].extend(got[:room])
    out["identical"] = (out["only_a"] == out["only_b"]
                        == out["differ"] == 0)
    return out


def run_store_sync(src_dir: str, dst_dir: str) -> dict:
    """One-way incremental replication: make the replica ``dst_dir``
    byte-equal to the source's current version, shipping ONLY the
    buckets whose part files differ — the restore/catch-up op behind
    `diff` (a replica rebuilt from scratch would re-copy everything;
    sync touches the changed slice). Both stores must share the bucket
    contract (``num_buckets``) — rebucket first otherwise.

    Change detection is at the FILE level — (basename, size) then a
    sha256 of the bytes, hashed in distributed tasks — so detection
    never parses a row; byte-different-but-logically-equal buckets
    (e.g. different part-file splits after a local compaction) are
    shipped anyway, which is harmless over-copy, never under-copy.
    Differing buckets hardlink the source's part files into the
    replica's next version (zero-copy on one filesystem, copy across
    devices — the `run_branch` trick), zone maps re-keyed from the
    source manifest; equal buckets are COW carry-forwards of the
    REPLICA's own files. Resume tokens adopt the source's (a replica
    mirrors progress); dst-local divergence in a differing bucket is
    overwritten by design (one-way)."""
    import hashlib

    import ray.data as rd

    src = SnapshotStore(src_dir, create=False)
    dst = SnapshotStore(dst_dir, create=False)
    vs, vd = src.current_version(), dst.current_version()
    ms, md = src.manifest(vs), dst.manifest(vd)
    if not ms or not md:
        raise ValueError("both stores need a committed version "
                         "(branch the source to create a replica)")
    if ms.get("num_buckets") != md.get("num_buckets") or \
            ms.get("num_buckets") is None:
        raise ValueError("bucket contracts differ (or are unrecorded); "
                         "rebucket the replica first")

    def rels_of(m, b):
        rels = m["buckets"].get(str(b), [])
        return [rels] if isinstance(rels, str) else list(rels)

    ids = sorted({int(k) for k in ms["buckets"]}
                 | {int(k) for k in md["buckets"]})
    sroot, droot = src_dir, dst_dir
    srels = {b: rels_of(ms, b) for b in ids}
    drels = {b: rels_of(md, b) for b in ids}
    orphan = [b for b in ids if drels[b] and not srels[b]]
    if orphan:
        # a replica-only bucket cannot be removed by the COW
        # carry-forward commit; under a shared contract it only occurs
        # on unsupported divergence — fail loudly instead of silently
        # keeping rows the source does not have
        raise ValueError(f"replica holds buckets absent from the source "
                         f"({orphan[:5]}...); rebuild it with `branch`")

    def compare_task(batch):
        out_b, out_eq = [], []
        for b in batch["bucket"].to_pylist():
            sa, da = srels[int(b)], drels[int(b)]
            eq = len(sa) == len(da)
            if eq:
                for s_rel, d_rel in zip(sa, da):
                    sp = os.path.join(sroot, s_rel)
                    dp = os.path.join(droot, d_rel)
                    if (os.path.basename(sp) != os.path.basename(dp)
                            or os.path.getsize(sp) != os.path.getsize(dp)):
                        eq = False
                        break
                    ha, hb = hashlib.sha256(), hashlib.sha256()
                    with open(sp, "rb") as f:
                        ha.update(f.read())
                    with open(dp, "rb") as f:
                        hb.update(f.read())
                    if ha.digest() != hb.digest():
                        eq = False
                        break
            out_b.append(int(b))
            out_eq.append(eq)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         "equal": pa.array(out_eq, pa.bool_())})

    rows = (rd.from_items([{"bucket": b} for b in ids])
            .map_batches(compare_task, batch_size=1,
                         batch_format="pyarrow").take_all())
    changed = sorted(int(r["bucket"]) for r in rows if not r["equal"])
    if not changed:
        return {"source_version": vs, "replica_version": vd,
                "buckets_shipped": 0, "files_shipped": 0,
                "identical": True}

    new_v = vd + 1
    dst.clean_staging(new_v)
    staging = dst.staging_dir(new_v)
    src_stats = ms.get("file_stats", {})
    expected, shipped = [], 0
    for b in changed:
        for rel in srels[b]:
            name = os.path.basename(rel)
            target = os.path.join(staging, name)
            try:
                os.link(os.path.join(sroot, rel), target)
            except OSError:
                shutil.copy2(os.path.join(sroot, rel), target)
            st = src_stats.get(rel)
            if st is not None:
                atomic_write_json(target + ".zmap.json", st)
            expected.append(target)
            shipped += 1

    # lineage metrics for shipped buckets come from the source's rows
    src_metrics = {str(m.get("bucket")): m for m in ms.get("metrics", [])}
    metrics = [dict(src_metrics[str(b)]) for b in changed
               if str(b) in src_metrics]
    dst.commit(new_v, tokens=src.tokens(vs), prev_version=vd,
               union_schema=ms.get("union_schema"),
               expected_files=expected, metrics=metrics)
    return {"source_version": vs, "replica_version": new_v,
            "buckets_shipped": len(changed), "files_shipped": shipped,
            "identical": False}
