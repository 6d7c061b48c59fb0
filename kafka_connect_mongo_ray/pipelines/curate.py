"""Streaming curation: CDC micro-batches drive a persisted dedup index.

The full streaming-curation story in one pipeline: each micro-batch
window is (1) committed as a normal replay (LWW state + resume tokens,
``pipelines/cdc.py::run_replay``), (2) read back as the CHANGE FEED
between the two commits (``state/diff.py::changes_between`` — COW skips
untouched buckets without reading a byte), and (3) the window's
upserted documents are screened against the persisted fingerprint
index (``state/dedup_index.py``): content never seen in ANY earlier
window is admitted to the curated corpus under
``curated_dir/window={version}/``, everything else is dropped forever.

Reference analog: none — the reference ships records at-least-once
(SURVEY.md §2.7, ``MongoSourceTask.kt``); this composes its
key-idempotent apply with content-idempotent curation, the operation a
training-data ingest actually needs.

Scale shape per window (nothing here is window-count dependent):
- the replay is the audited one-exchange pipeline (VERDICT r3);
- the change feed is bucket-parallel and bounded by CHANGED buckets;
- the screen's one all-to-all moves only the WINDOW's fingerprints,
  bucket-aligned with the on-disk index (the index never moves).

Crash recovery contract (:func:`curate_version` is idempotent per
version, in every crash window):
- the curated directory + a ``_CURATED`` marker are written BEFORE the
  index append, and admission is a pure function of (window, index
  state) — the index cannot hold any of the window's fps until after
  the marker exists;
- no marker yet ⇒ a re-run recomputes the IDENTICAL survivor set
  (screen against the unchanged index state) and overwrites the
  directory;
- marker present ⇒ the admissions are authoritative; the re-run skips
  the screen and RE-APPENDS the directory's own fingerprints to the
  index (bucket is derivable from the fp, and duplicate fps inside the
  index never change the anti join's verdict) — covering a crash
  between marker and append without ever re-screening against an
  index that already contains the window's fps (which would admit
  nothing and truncate the window).

Tombstones are NOT retracted from the curated corpus: curation is an
append-only admission log (window = snapshot version), and the change
feed itself is the retraction channel for consumers that need one
(read ``op = 'd'`` keys from ``changes_between``). Their count is
reported per window in the summary.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Iterable

import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.config import EngineConfig

__all__ = ["upserts_to_candidates", "curate_version", "run_curated_stream",
           "read_curated"]

# ordered superset of the columns a curated window persists; ts is
# optional (custom candidates_fn may not carry one)
_CURATED_COLS = ("doc_id", "repo", "path", "ts", "fp")


def upserts_to_candidates(batch: pa.Table) -> pa.Table:
    """Default change-feed → candidate-document mapping: keep upserts
    (``op != 'd'``; null content fingerprints as '' downstream, same
    coalesce as the SQL mirror), derive the integer ``doc_id`` the
    in-window first-occurrence tie-break orders by from the numeric
    ``path`` (the repo's event streams use ``path = str(doc_id)`` —
    callers with non-numeric paths pass their own ``candidates_fn``).
    Carries the change's ``ts`` through so the curated window records
    its event-time bounds (the :func:`read_curated` zone map)."""
    b = batch.filter(pc.invert(pc.equal(batch["op"], pa.scalar("d"))))
    return pa.table({
        "doc_id": pc.cast(b["path"], pa.int64()),
        "repo": pc.cast(b["repo"], pa.string()),
        "path": pc.cast(b["path"], pa.string()),
        "ts": pc.cast(b["ts"], pa.int64()),
        "text": pc.cast(b["content"], pa.string()),
    })


def _ann_ingest(vecs_ds, ann_dir: str, version: int, *, ann_cells: int,
                admitted: int) -> None:
    """Ingest a window's (doc_id, embedding) vectors into the persisted
    IVF index at ``ann_dir``: BUILD on the first committed window,
    tagged APPEND afterwards. The tag is the window version, so
    recovery can replay the ingest idempotently (a committed tag is a
    no-op in ``append_ivf_index``). Vectors are NOT derivable from the
    curated columns (text is not stored), so the window persists them
    under ``wdir/_vecs/`` BEFORE the marker — the minhash band-sidecar
    contract."""
    import os as _os

    from kafka_connect_mongo_ray.state.ann_index import (
        append_ivf_index,
        build_ivf_index,
    )

    if not admitted:
        return
    tag = f"window={version}"
    if _os.path.exists(_os.path.join(ann_dir, "manifest.json")):
        append_ivf_index(vecs_ds, ann_dir, total_rows=admitted, tag=tag)
    else:
        build_ivf_index(vecs_ds, ann_dir, num_cells=ann_cells,
                        id_col="doc_id", total_rows=admitted, tag=tag)


def curate_version(cfg: EngineConfig, version: int, *, index_dir: str,
                   curated_dir: str, index_buckets: int = 32,
                   candidates_fn: Callable[[pa.Table], pa.Table] | None = None,
                   screen: str = "exact",
                   minhash_opts: dict | None = None,
                   ann_dir: str | None = None, ann_cells: int = 8,
                   encoder: type | None = None, encoder_actors: int = 2,
                   dq_expectations: list | None = None,
                   ) -> dict:
    """Curate ONE committed window: change feed (version-1 → version) →
    screen against the index → write ``curated_dir/window={version}/``
    → append the survivors' fingerprints. Idempotent per version (see
    module docstring); returns the window summary.

    ``screen="minhash"`` swaps the exact fingerprint membership test
    for the persisted LSH band index
    (``state/dedup_index.py::screen_window_minhash``): a window doc
    NEAR-duplicate (sharing ≥1 band) to anything ever admitted is
    dropped. Exact copies always drop (identical text ⇒ identical
    bands); in-window near-dups are NOT collapsed (the incremental-
    minhash contract). The crash story differs only in what re-appends
    on recovery: band rows are NOT derivable from the curated columns,
    so the admitted docs' band rows persist under ``wdir/_bands/``
    BEFORE the marker and recovery re-appends from there (its presence
    also tells recovery which mode wrote the window).
    ``minhash_opts`` forwards num_hashes/num_bands/seed.

    ``encoder`` (with ``ann_dir``) injects the embedding stage: a
    ``functions/text.py::Encoder`` subclass run as an ACTOR POOL of
    ``encoder_actors`` (model loaded once per actor in ``__init__``,
    batches encoded in ``__call__``). Default: the deterministic
    blake2b stub.

    ``dq_expectations`` (a list of
    ``functions/expectations.py::Expectation`` over the table name
    ``"admitted"``) audits each window's ADMITTED docs — validation at
    ingest. The per-check counts ride in the window summary AND in the
    ``_CURATED`` marker, so the audit is replay-durable: a recovered
    window reports the counts its original run measured without
    re-scanning. The audit never blocks admission (curation is the
    screen; dq is the report) — gate on the counts in the caller if a
    violated window must stop the stream."""
    from kafka_connect_mongo_ray.state.dedup_index import (
        _bucket_of,
        append_band_rows,
        append_fingerprints,
        fingerprint_batch,
        screen_window,
        screen_window_minhash,
    )
    from kafka_connect_mongo_ray.state.diff import changes_between

    wdir = os.path.join(curated_dir, f"window={version}")
    marker = os.path.join(wdir, "_CURATED")
    bands_dir = os.path.join(wdir, "_bands")
    if os.path.exists(marker):
        # already curated: the directory is authoritative — re-append
        # its index rows (idempotent) to cover a crash between marker
        # and append, and never re-screen (see module docstring). A
        # `_bands/` sidecar means the window was minhash-screened and
        # the band rows re-append verbatim; otherwise the exact mode's
        # fps re-derive their bucket from the fp itself.
        import ray.data as rd

        admitted = 0
        files = [os.path.join(wdir, f) for f in os.listdir(wdir)
                 if f.endswith(".parquet")]
        if os.path.isdir(bands_dir) and any(
                f.endswith(".parquet") for f in os.listdir(bands_dir)):
            append_band_rows(rd.read_parquet(bands_dir), index_dir)
            admitted = rd.read_parquet(files).count() if files else 0
        elif files:
            fps = rd.read_parquet(files, columns=["fp"])

            def with_bucket(t: pa.Table) -> pa.Table:
                return t.append_column("bucket", pa.array(
                    _bucket_of(t["fp"], index_buckets), pa.int64()))

            fps = fps.map_batches(with_bucket,
                                  batch_format="pyarrow").materialize()
            admitted = fps.count()
            append_fingerprints(fps, index_dir)
        vecs_dir = os.path.join(wdir, "_vecs")
        if (ann_dir is not None and admitted and os.path.isdir(vecs_dir)
                and any(f.endswith(".parquet")
                        for f in os.listdir(vecs_dir))):
            # re-ingest from the vector sidecar; the window tag makes
            # the replay a no-op when it already committed
            _ann_ingest(rd.read_parquet(vecs_dir), ann_dir, version,
                        ann_cells=ann_cells, admitted=admitted)
        out = {"version": version, "changes": None, "tombstones": None,
               "admitted": admitted, "recovered": True}
        prior = _window_stats(wdir) or {}
        if "dq" in prior:
            out["dq"] = prior["dq"]
        return out

    # the diff feeds the tombstone count AND the candidate screen —
    # window-bounded, so staging it is the multi-consumer rule
    diff = changes_between(cfg.snapshot_dir, version - 1, version).materialize()
    n_changes = diff.count()

    def tomb_count(batch: pa.Table) -> pa.Table:
        n = pc.sum(pc.equal(batch["op"], pa.scalar("d"))).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    tombstones = sum(r["n"] for r in
                     diff.map_batches(tomb_count, batch_format="pyarrow")
                     .take_all())
    cand = diff.map_batches(candidates_fn or upserts_to_candidates,
                            batch_format="pyarrow")
    keep_bands = None
    if screen == "minhash":
        admitted_ds, keep_bands = screen_window_minhash(
            cand, index_dir, id_col="doc_id", text_col="text",
            num_buckets=index_buckets, **(minhash_opts or {}))
        # fp is lineage metadata here (the INDEX holds band rows); it
        # keeps the curated schema identical across screen modes
        survivors = admitted_ds.map_batches(
            fingerprint_batch, batch_format="pyarrow").materialize()
    elif screen == "exact":
        survivors = screen_window(cand, index_dir, id_col="doc_id",
                                  text_col="text",
                                  num_buckets=index_buckets)
    else:
        raise ValueError(f"unknown screen mode {screen!r} "
                         f"(expected 'exact' or 'minhash')")
    admitted = survivors.count()
    # an empty survivor set has a NONE schema (the dataset-level
    # column-op trap, NEXT.md) — nothing is written for it anyway
    names = survivors.schema().names if admitted else []
    cols = [c for c in _CURATED_COLS if c in names]
    shutil.rmtree(wdir, ignore_errors=True)  # overwrite = re-run idempotence
    if admitted:
        (survivors
         .map_batches(lambda t: t.select(cols), batch_format="pyarrow")
         .write_parquet(wdir))
    else:
        os.makedirs(wdir, exist_ok=True)  # an empty window is still a window
    # the window IS the time partition: record its event-ts bounds as a
    # zone map inside the marker (free — survivors is already
    # materialized), so a time-scoped reader can prune whole windows.
    # Legacy empty markers just mean "scan" (the snapshot-store rule).
    stats: dict = {"rows": admitted}
    dq_report: list[dict] | None = None
    if dq_expectations is not None:
        from kafka_connect_mongo_ray.functions.expectations import (
            run_expectations,
        )

        dq_report = []
        if admitted:
            rep = run_expectations({"admitted": survivors},
                                   dq_expectations)
            dq_report = [
                {"name": n, "n_checked": c, "n_violations": v}
                for n, c, v in zip(rep["check_name"].to_pylist(),
                                   rep["n_checked"].to_pylist(),
                                   rep["n_violations"].to_pylist())]
        stats["dq"] = dq_report
    if admitted and "ts" in cols:
        from ray.data.aggregate import Max, Min

        agg = survivors.aggregate(Min("ts", alias_name="ts_min"),
                                  Max("ts", alias_name="ts_max"))
        stats["ts_min"], stats["ts_max"] = int(agg["ts_min"]), int(agg["ts_max"])
    # minhash mode: band rows are not derivable from the curated
    # columns — persist them BEFORE the marker so recovery can
    # re-append them (and detect the mode)
    if keep_bands is not None and admitted:
        (keep_bands.map_batches(
            lambda t: t.select(["band_id", "band_hash", "bucket"]),
            batch_format="pyarrow").write_parquet(bands_dir))
    # ANN mode: embeddings are likewise not derivable from the curated
    # columns — persist the (doc_id, embedding) sidecar BEFORE the
    # marker so recovery can replay the index ingest
    vecs_dir = os.path.join(wdir, "_vecs")
    if ann_dir is not None and admitted:
        from kafka_connect_mongo_ray.functions.text import Encoder

        # encoder is an ACTOR-POOL stage: model setup once per actor in
        # __init__, batch encode in __call__ (the default Encoder is the
        # deterministic blake2b stub — a real model is a subclass swap,
        # same (doc_id, embedding) schema)
        (survivors.map_batches(encoder or Encoder,
                               concurrency=(1, encoder_actors),
                               batch_format="pyarrow")
         .write_parquet(vecs_dir))
    # marker BEFORE append: once it exists the directory is
    # authoritative and re-runs take the re-append path above
    with open(marker, "w") as f:
        json.dump(stats, f)
    if keep_bands is not None:
        if admitted:
            append_band_rows(keep_bands, index_dir)
    else:
        append_fingerprints(survivors, index_dir)
    if ann_dir is not None and admitted:
        import ray.data as rd

        _ann_ingest(rd.read_parquet(vecs_dir), ann_dir, version,
                    ann_cells=ann_cells, admitted=admitted)
    out = {"version": version, "changes": n_changes,
           "tombstones": tombstones, "admitted": admitted}
    if dq_report is not None:
        out["dq"] = dq_report
    return out


def run_curated_stream(
    window_factories: Iterable[Callable[[], "ray.data.Dataset"]],
    cfg: EngineConfig,
    *,
    index_dir: str,
    curated_dir: str,
    index_buckets: int = 32,
    candidates_fn: Callable[[pa.Table], pa.Table] | None = None,
    screen: str = "exact",
    minhash_opts: dict | None = None,
    ann_dir: str | None = None,
    ann_cells: int = 8,
    encoder: type | None = None,
    encoder_actors: int = 2,
    dq_expectations: list | None = None,
) -> list[dict]:
    """Run each bounded event Dataset as one committed replay AND curate
    its change feed against the persisted fingerprint index. Returns
    per-window summaries (the replay summary plus the curation counts);
    ``summary['tokens']`` advances monotonically across windows exactly
    as in :func:`pipelines.stream.run_micro_batches`."""
    from kafka_connect_mongo_ray.pipelines.cdc import run_replay

    summaries = []
    for factory in window_factories:
        rep = run_replay(factory(), cfg)
        cur = curate_version(cfg, rep["version"], index_dir=index_dir,
                             curated_dir=curated_dir,
                             index_buckets=index_buckets,
                             candidates_fn=candidates_fn,
                             screen=screen, minhash_opts=minhash_opts,
                             ann_dir=ann_dir, ann_cells=ann_cells,
                             encoder=encoder,
                             encoder_actors=encoder_actors,
                             dq_expectations=dq_expectations)
        summaries.append({**rep, "curation": cur})
    return summaries


def _window_stats(wdir: str) -> dict | None:
    """Parse a window's ``_CURATED`` marker as zone-map stats. Missing
    marker ⇒ the window never committed (a crashed run) ⇒ not
    authoritative; empty/legacy marker ⇒ ``{}`` (committed, no stats —
    scan). Returns None only for the uncommitted case."""
    marker = os.path.join(wdir, "_CURATED")
    if not os.path.exists(marker):
        return None
    try:
        with open(marker) as f:
            raw = f.read().strip()
        return json.loads(raw) if raw else {}
    except (OSError, ValueError):
        return {}


def read_curated(curated_dir: str, *, ts_min: int | None = None,
                 ts_max: int | None = None, columns: list[str] | None = None,
                 include_window: bool = False):
    """Time-scoped read over the curated corpus.

    ``window={version}`` IS the time partition: each committed window's
    ``_CURATED`` marker carries the exact event-ts bounds of its
    admitted rows (recorded at curation time — no footer reads, no
    stats pass; the snapshot-store zone-map contract,
    ``state/snapshot.py``). A read scoped to ``[ts_min, ts_max]``
    prunes every non-overlapping window on pure marker arithmetic —
    their part files are never opened — and pushes the exact row-level
    ``ts`` filter into the Parquet scan of the windows that remain
    (row-group stats prune inside the file). Windows with a legacy
    empty marker have no bounds and are scanned (the "missing stats ⇒
    scan" rule); windows without a marker never committed and are
    skipped as non-authoritative.

    ``include_window=True`` appends the window version as ``win``.
    Raises FileNotFoundError when the corpus has no committed windows
    at all; a range that prunes everything returns an EMPTY dataset
    with the full curated schema (one false-filter scan of the first
    committed window keeps the schema without reading data rows)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    windows = []  # (version, wdir, stats)
    for name in os.listdir(curated_dir) if os.path.isdir(curated_dir) else []:
        if not name.startswith("window="):
            continue
        wdir = os.path.join(curated_dir, name)
        stats = _window_stats(wdir)
        if stats is None:
            continue
        windows.append((int(name.split("=", 1)[1]), wdir, stats))
    windows.sort()
    if not windows:
        raise FileNotFoundError(f"no committed curated windows under "
                                f"{curated_dir}")

    def overlaps(stats: dict) -> bool:
        if "ts_min" not in stats or "ts_max" not in stats:
            return True  # no zone map ⇒ scan
        if ts_max is not None and stats["ts_min"] > ts_max:
            return False
        return not (ts_min is not None and stats["ts_max"] < ts_min)

    flt = None
    if ts_min is not None:
        flt = pads.field("ts") >= ts_min
    if ts_max is not None:
        hi = pads.field("ts") <= ts_max
        flt = hi if flt is None else (flt & hi)

    def window_ds(v: int, wdir: str, read_filter):
        files = sorted(os.path.join(wdir, f) for f in os.listdir(wdir)
                       if f.endswith(".parquet"))
        if not files:
            return None
        # explicit columns always: with none given, project the file's
        # own footer schema — otherwise Ray's hive path inference
        # surfaces the `window=` path component as a redundant STRING
        # column (the reader's `win`, int64, is the typed version).
        # (partitioning=None would be cleaner but trips an
        # UnboundLocalError in ray 2.49's parquet datasource when
        # combined with an explicit column list.)
        cols = columns
        if cols is None:
            import pyarrow.parquet as pq

            cols = pq.read_schema(files[0]).names
        ds = rd.read_parquet(files, columns=cols, filter=read_filter)
        if include_window:
            ds = ds.map_batches(
                lambda t, v=v: t.append_column(
                    "win", pa.array([v] * t.num_rows, pa.int64())),
                batch_format="pyarrow")
        return ds

    kept = [d for v, wdir, stats in windows if overlaps(stats)
            if (d := window_ds(v, wdir, flt)) is not None]
    if not kept:
        # everything pruned (or only empty windows): preserve the
        # schema via a false-filter scan of the first non-empty window
        for v, wdir, _ in windows:
            d = window_ds(v, wdir, pads.scalar(False))
            if d is not None:
                return d
        raise FileNotFoundError(f"no curated rows under {curated_dir}")
    return kept[0].union(*kept[1:]) if len(kept) > 1 else kept[0]
