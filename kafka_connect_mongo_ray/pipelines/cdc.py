"""End-to-end CDC replay pipeline (SURVEY.md §3.4 lifecycle).

``events Dataset → map_batches(normalize + partial LWW, zero-copy
Arrow) → groupby(bucket) shuffle → actor-pool FinalMergeApplier
(read prev COW bucket, final LWW merge, write staging Parquet) →
atomic commit (manifest + per-partition resume tokens + per-bucket
lineage/metrics)``.

Exactly one all-to-all exchange (the bucket groupby); its volume is
bounded by distinct-keys-per-batch thanks to the partial pre-reduce,
not by raw event count — the scale answer to the reference's
one-thread-per-namespace ceiling (``MongoSourceConnector.kt:65-85``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from kafka_connect_mongo_ray.config import EngineConfig
from kafka_connect_mongo_ray.stages.apply import (
    live_rows,
    merge_with_snapshot,
    partial_lww,
    split_tokens,
)
from kafka_connect_mongo_ray.stages.normalize import normalize_batch
from kafka_connect_mongo_ray.state.checkpoint import merge_tokens, mirror_checkpoints
from kafka_connect_mongo_ray.state.snapshot import SnapshotStore
from kafka_connect_mongo_ray.utils import limit_worker_threads

#: op_reservation_ratio="auto" boundary: below this many cluster CPUs
#: the streaming executor's per-operator reservation is disabled
#: outright (BASELINE.md round-4 measurement), at or above it the
#: measured-best 0.3 ratio applies
_SMALL_CLUSTER_CPUS = 16

METRICS_SCHEMA = pa.schema(
    [
        pa.field("bucket", pa.int32()),
        pa.field("events_in", pa.int64()),
        pa.field("state_rows", pa.int64()),
        pa.field("live_rows", pa.int64()),
        pa.field("tombstones", pa.int64()),
        pa.field("carried_forward", pa.bool_()),
        pa.field("tokens_json", pa.string()),
        pa.field("file", pa.string()),
        pa.field("schema_b64", pa.string()),
    ]
)


def normalize_prereduce(batch: pa.Table, *, num_buckets: int, tokens=None) -> pa.Table:
    """Stateless fused stage: normalize (T1–T4 + checkpoint filter) then
    per-batch partial LWW. Plain function → elastic Ray tasks; there is
    genuinely no per-worker state to amortize here."""
    limit_worker_threads()
    return partial_lww(normalize_batch(batch, num_buckets=num_buckets, tokens=tokens))


def apply_bucket_group(
    group: pa.Table, store: SnapshotStore, prev_version: int, new_version: int,
    rows_per_file: int | None = None, nonce: str | None = None,
) -> pa.Table:
    """Merge-apply one bucket group: merge pre-reduced events with the
    previous snapshot bucket (LWW, tombstone-aware), write the new
    copy-on-write bucket file to staging, return one metrics/lineage
    row — applied counts plus the per-partition max ``(ts, inc)`` seen,
    from which the driver derives resume tokens."""
    bucket = group["bucket"][0].as_py()
    events, token_rows = split_tokens(group)
    tokens: dict[str, tuple[int, int]] = {}
    for i in range(token_rows.num_rows):
        p = token_rows["path"][i].as_py()
        v = (token_rows["ts"][i].as_py(), token_rows["inc"][i].as_py())
        if p not in tokens or v > tokens[p]:
            tokens[p] = v

    prev = store.read_bucket(prev_version, bucket) if prev_version else None
    carried = False
    if events.num_rows == 0 and prev is not None:
        state = prev  # COW carry-forward: manifest keeps pointing at the old file
        carried = True
        path = ""
    else:
        state = merge_with_snapshot(events, prev)
        path = store.write_bucket_staging(new_version, bucket, state,
                                          rows_per_file=rows_per_file, nonce=nonce)
    live = live_rows(state)
    import base64

    schema_b64 = base64.b64encode(state.schema.serialize().to_pybytes()).decode()
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int32()),
            "events_in": pa.array([events.num_rows], pa.int64()),
            "state_rows": pa.array([state.num_rows], pa.int64()),
            "live_rows": pa.array([live.num_rows], pa.int64()),
            "tombstones": pa.array([state.num_rows - live.num_rows], pa.int64()),
            "carried_forward": pa.array([carried], pa.bool_()),
            "tokens_json": pa.array(
                [json.dumps({p: list(v) for p, v in sorted(tokens.items())})], pa.string()
            ),
            "file": pa.array([path], pa.string()),
            "schema_b64": pa.array([schema_b64], pa.string()),
        },
        schema=METRICS_SCHEMA,
    )


def _apply_bucket_task(group: pa.Table, *, snapshot_root: str,
                       prev_version: int, new_version: int,
                       rows_per_file: int | None = None,
                       nonce: str | None = None) -> pa.Table:
    limit_worker_threads()
    return apply_bucket_group(group, SnapshotStore(snapshot_root), prev_version,
                              new_version, rows_per_file=rows_per_file, nonce=nonce)


class FinalMergeApplier:
    """Actor-pool form of the merge-applier: the store handle is built
    once per actor in ``__init__`` (the analog of the reference sink
    task's cached client/collection handles,
    ``MongoSinkTask.kt:97-117`` / ST2-ST3). The default execution path
    uses elastic *tasks* (``_apply_bucket_task``) instead: measured 4×
    faster end-to-end because an autoscaling actor pool ramps up after
    the shuffle barrier while tasks get full parallelism instantly;
    use actors (``EngineConfig.apply_mode='actors'``) when the applier
    must hold heavier state (open remote connections, caches)."""

    def __init__(self, snapshot_root: str, prev_version: int, new_version: int,
                 nonce: str | None = None):
        self.store = SnapshotStore(snapshot_root)
        self.prev_version = prev_version
        self.new_version = new_version
        self.nonce = nonce

    def __call__(self, group: pa.Table) -> pa.Table:
        return apply_bucket_group(group, self.store, self.prev_version,
                                  self.new_version, nonce=self.nonce)


class AnalyzeObjectStage:
    """Analyzed-schema source mode (``analyze.schema=true``,
    ``MongoSourceConfig.kt:62-67``): events arrive with the row image as
    a JSON text column (the reference's ``object`` field) instead of
    structured payload columns. This actor-pool stage flattens each
    JSON document through the SchemaMapper-analog lattice (T5–T11) and
    emits the canonical event columns plus the analyzed payload columns
    — which then flow through the engine's schema-evolving merge.
    Malformed JSON nulls the payload for that row (skip-and-count
    semantics of ``MongoSinkTask.kt:62-70``)."""

    #: patch budget per batch: beyond this many dirty rows the batch
    #: goes wholesale to the per-row Python lattice — the sweep's parse
    #: work is linear regardless (each validation parse aborts at the
    #: next dirty row), but per-row splice calls and suffix re-joins
    #: stop paying for themselves when dirt is dense
    MAX_BAD_ROWS = 64
    #: projected-dirty-rows-per-batch threshold for the density bail
    DENSITY_BAIL = 16

    def __init__(self, json_col: str = "object", initial_schema: dict | None = None,
                 arrow_fast_path: bool = True,
                 quarantine_dir: str | None = None):
        from kafka_connect_mongo_ray.stages.schema_evolve import SchemaAnalyzer

        self.json_col = json_col
        self.analyzer = SchemaAnalyzer(
            json_col=json_col, op_col=None, pkey_cols=None, ts_col=None,
            initial_schema=initial_schema,
        )
        self.arrow_fast_path = arrow_fast_path
        self.quarantine_dir = quarantine_dir
        self.fast_batches = 0
        self.slow_batches = 0
        self.split_batches = 0
        self._last_error_row: int | None = None

    def _quarantine(self, batch: pa.Table, rows: list[int]) -> None:
        """Dead-letter sink: when ``quarantine_dir`` is set, malformed
        rows are ALSO written raw (key columns + the offending payload
        text) as one small parquet per dirty batch — append-only,
        uuid-named, diagnostic-grade at-least-once (a retried batch
        re-quarantines its rows; consumers dedupe on the key+ts if
        they must). The substitution semantics of the main path are
        unchanged — this is a side channel, zero cost on clean
        batches."""
        if not self.quarantine_dir or not rows:
            return
        import os as _os
        import uuid as _uuid

        import pyarrow.parquet as _pq

        keep = [c for c in ("repo", "path", "ts", self.json_col)
                if c in batch.column_names]
        t = batch.select(keep).take(pa.array(sorted(rows), pa.int64()))
        _os.makedirs(self.quarantine_dir, exist_ok=True)
        _pq.write_table(t, _os.path.join(
            self.quarantine_dir, f"part-{_uuid.uuid4().hex}.parquet"))

    def _capture_error_row(self, exc: Exception) -> None:
        """Remember the 0-based NDJSON line the parser rejected (Arrow
        formats parse errors as '... in row N'); drives the
        split-retry sweep in :meth:`_split_retry`."""
        import re as _re

        m = _re.search(r"in row (\d+)", str(exc))
        self._last_error_row = int(m.group(1)) if m else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.arrow_fast_path:
            self.slow_batches += 1
            return self._python_path(batch)
        texts = batch[self.json_col].to_pylist()
        self._last_error_row = None
        out = self._arrow_ndjson(batch, texts=texts)
        if out is not None:
            self.fast_batches += 1
            return out
        parts = self._split_retry(batch, texts)
        if parts is None:  # non-localizable or dense dirt
            self.slow_batches += 1
            return self._python_path(batch, texts=texts)
        if len(parts) == 1:
            return parts[0]
        return self._concat_conformed(parts, batch)

    def _split_retry(self, batch: pa.Table,
                     texts: list) -> list[pa.Table] | None:
        """Isolate the dirt after a failed whole-batch fast path using
        the PARSER's own error position: Arrow reports ``... in row N``
        for malformed JSON, non-object rows, and known-field type
        conflicts. Sweep the suffix once — each validation parse aborts
        at the NEXT dirty row, so total parse work stays linear in the
        batch — patching each dirty row out of the NDJSON framing:

        - a row whose text is not a JSON object is replaced by ``{}``,
          which IS the per-row Python lattice's semantics for it
          (skip-and-count: all payload fields null), so no extra work;
        - a row that is valid JSON but unparseable in-frame (known-
          field type conflict, embedded-newline smear) is replaced by
          ``{}`` for framing and its exact output spliced back from
          the per-row Python path afterwards.

        Then ONE full Arrow parse + conform runs on the patched texts.
        Schema-evolution order (a new field's lattice type is set by
        its first occurrence in row order) is preserved by bailing out
        to the wholesale Python path whenever a spliced row carries a
        field the running schema did not already know — the only case
        where splicing could reorder first occurrences. Returns None
        (wholesale fallback) when a failure carries no row position,
        the patch budget is exhausted, or the final conform rejects."""
        import json as _json

        from kafka_connect_mongo_ray.stages.schema_evolve import normalize_key

        if self._last_error_row is None:
            return None
        n = len(texts)
        # upfront density probe, before any buffer is built: dirt
        # appearing in the first 1/DENSITY_BAIL of the batch projects
        # to >= DENSITY_BAIL dirty rows — go wholesale immediately
        if self._last_error_row < n // self.DENSITY_BAIL:
            return None
        texts = list(texts)  # patched locally; caller keeps the original
        schema_before = set(self.analyzer.schema)
        # the parser numbers NDJSON *lines*; only when some text bears
        # an embedded raw newline does line != row and the mapping
        # needs a cumulative walk
        has_nl = any(t is not None and "\n" in t for t in texts)

        def line_to_row(pos: int, line: int) -> int | None:
            if not has_nl:
                j = pos + line
                return j if j < n else None
            acc = 0
            for i in range(pos, n):
                t = texts[i]
                acc += 1 + (t.count("\n") if t is not None else 0)
                if acc > line:
                    return i
            return None

        # validation parses slice the ORIGINAL byte buffer at row
        # offsets (suffixes never contain a patched row, which is
        # always behind the cursor), so the sweep does zero re-joins
        enc = [b"{}" if t is None else t.encode() for t in texts]
        data0 = b"\n".join(enc)
        byte_off = [0] * (n + 1)
        for i, e in enumerate(enc):
            byte_off[i + 1] = byte_off[i] + len(e) + 1

        malformed_found = 0
        malformed_rows: list[int] = []
        splice_rows: list[int] = []
        patched = 0
        pos, err = 0, self._last_error_row
        while True:
            j = line_to_row(pos, err)
            if j is None:
                return None
            t = texts[j]
            try:
                doc = _json.loads(t) if t is not None else None
                parsed_ok = True
            except (ValueError, TypeError):
                parsed_ok, doc = False, None
            if not parsed_ok:
                malformed_found += 1  # {} substitution is exact here
                malformed_rows.append(j)
            elif not isinstance(doc, dict):
                pass  # non-dict JSON maps to {} WITHOUT a malformed
                # count on the per-row path — substitution is exact
            else:
                # splicing must not reorder a new field's first
                # occurrence — bail if this row carries an unknown key
                if any(normalize_key(k) not in schema_before for k in doc):
                    return None
                splice_rows.append(j)
            texts[j] = "{}"
            patched += 1
            pos = j + 1
            # budget + density bail: project total dirt from the
            # share of the batch swept so far — each validation parse
            # has a fixed call cost, so past ~16 projected dirty rows
            # per batch the wholesale per-row path is cheaper
            # (measured crossover ~0.2% dirt at 8k-row batches)
            if (patched > self.MAX_BAD_ROWS
                    or (patched >= 4
                        and patched * n > self.DENSITY_BAIL * pos)):
                return None
            if pos >= n:
                break
            err = self._validate_suffix(data0, byte_off[pos])
            if err == -1:  # suffix parses clean
                break
            if err is None:  # no row position in the error
                return None
        self._last_error_row = None
        out = self._arrow_ndjson(batch, texts=texts)
        if out is None:  # conform rejection on the patched batch
            return None
        self.analyzer.malformed += malformed_found
        self._quarantine(batch, malformed_rows)
        self.split_batches += 1
        if not splice_rows:
            return [out]
        parts: list[pa.Table] = []
        prev = 0
        for j in splice_rows:
            if j > prev:
                parts.append(out.slice(prev, j - prev))
            parts.append(self._python_path(batch.slice(j, 1)))
            prev = j + 1
        if prev < n:
            parts.append(out.slice(prev))
        return parts

    def _validate_suffix(self, data0: bytes, off: int) -> int | None:
        """Parse-validate the byte suffix ``data0[off:]`` (zero-copy
        buffer slice) against the running explicit schema — no
        conform. Returns -1 when it parses clean, the 0-based error
        LINE relative to the suffix when the parser rejects a row, or
        None when the error carries no position."""
        import pyarrow.json as pj

        from kafka_connect_mongo_ray.stages.schema_evolve import _ARROW

        schema = self.analyzer.schema
        explicit = pa.schema([(k, _ARROW[schema[k]]) for k in sorted(schema)])
        buf = pa.py_buffer(data0).slice(off)
        try:
            pj.read_json(
                pa.BufferReader(buf),
                read_options=pj.ReadOptions(
                    use_threads=False,
                    block_size=max(1 << 20, min(buf.size + 1, (1 << 31) - 1))),
                parse_options=pj.ParseOptions(
                    explicit_schema=explicit,
                    unexpected_field_behavior="infer"),
            )
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
            self._capture_error_row(e)
            return self._last_error_row
        return -1

    def _concat_conformed(self, parts: list[pa.Table], batch: pa.Table) -> pa.Table:
        """Align split outputs to the final (post-batch) schema — the
        running schema only grows, so earlier slices may simply lack
        payload columns discovered later; absent means null, exactly
        as the per-row path emits for rows without the field."""
        from kafka_connect_mongo_ray.stages.schema_evolve import _ARROW

        passthrough = [c for c in batch.column_names if c != self.json_col]
        schema = self.analyzer.schema
        final_cols = passthrough + sorted(schema)
        aligned = []
        for p in parts:
            cols = []
            for name in final_cols:
                if name in p.column_names:
                    cols.append(p[name])
                else:
                    cols.append(pa.nulls(p.num_rows, _ARROW[schema[name]]))
            aligned.append(pa.table(dict(zip(final_cols, cols))))
        return pa.concat_tables(aligned)

    def _arrow_ndjson(self, batch: pa.Table,
                      texts: list | None = None) -> pa.Table | None:
        """Arrow NDJSON fast path for clean uniform batches: one
        ``pyarrow.json.read_json`` with the running schema pinned as
        ``explicit_schema`` (so known fields never hit type inference —
        the ISO-string→timestamp hazard) and ``unexpected_field_
        behavior='infer'`` for evolution. A NEW field Arrow infers as a
        timestamp/date (an ISO-looking string the Python lattice keeps
        as raw STRING text) triggers ONE re-parse with that raw field
        pinned to string, so ISO-date-bearing corpora stay on the fast
        path. Returns None — fall back to the exact per-row Python
        lattice — whenever the batch is not cleanly expressible:
        malformed JSON, a value conflicting with a known field's
        lattice type, a new field inferring to a struct/list,
        mixed-type raw spellings of
        one normalized key, or a row carrying two spellings at once.
        Every fallback batch reproduces the reference semantics
        byte-for-byte, so the fast path only ever changes speed."""
        import io

        import pyarrow.json as pj

        from kafka_connect_mongo_ray.stages.schema_evolve import (
            _ARROW,
            BOOL,
            FLOAT64,
            STRING,
            normalize_key,
        )

        if texts is None:
            texts = batch[self.json_col].to_pylist()
        data = "\n".join("{}" if t is None else t for t in texts).encode()
        schema = self.analyzer.schema
        explicit = pa.schema([(k, _ARROW[schema[k]]) for k in sorted(schema)])

        def parse(explicit_schema):
            return pj.read_json(
                io.BytesIO(data),
                read_options=pj.ReadOptions(
                    use_threads=False,
                    block_size=max(1 << 20, min(len(data) + 1, (1 << 31) - 1))),
                parse_options=pj.ParseOptions(
                    explicit_schema=explicit_schema,
                    unexpected_field_behavior="infer"),
            )

        try:
            tbl = parse(explicit)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
            self._capture_error_row(e)
            return None
        # per-column conform: NEW raw fields Arrow inferred as
        # timestamp/date were ISO-looking STRINGS in the source (the
        # Python lattice keeps the raw spelling); pin them to string
        # and re-parse once so the exact text survives — ISO-date-
        # bearing corpora stay on the fast path instead of falling
        # back to the per-row Python parser
        pin = [raw for raw in tbl.schema.names
               if normalize_key(raw) not in schema
               and (pa.types.is_timestamp(tbl.schema.field(raw).type)
                    or pa.types.is_date(tbl.schema.field(raw).type))]
        if pin:
            pinned = pa.schema(
                list(explicit) + [pa.field(r, _ARROW[STRING]) for r in pin])
            try:
                tbl = parse(pinned)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                self._capture_error_row(e)
                return None
        if tbl.num_rows != len(texts):
            return None  # an embedded raw newline smeared the row count

        def lattice_of(typ):
            if pa.types.is_boolean(typ):
                return BOOL
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                return FLOAT64
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                return STRING
            return None

        groups: dict[str, list[str]] = {}
        for raw in tbl.schema.names:
            k = normalize_key(raw)
            if k is not None:
                groups.setdefault(k, []).append(raw)

        cols: dict[str, pa.ChunkedArray] = {}
        new_fields: dict[str, str] = {}
        for k, raws in groups.items():
            if k in schema:
                lt = schema[k]
            else:
                lt = None
                for raw in raws:
                    typ = tbl[raw].type
                    if pa.types.is_null(typ):
                        continue
                    cand = lattice_of(typ)
                    if cand is None or (lt is not None and lt != cand):
                        return None
                    lt = cand
                if lt is None:
                    continue  # all-null new field: skipped, like coerce(None)
                new_fields[k] = lt
            want = _ARROW[lt]
            resolved = []
            for raw in raws:
                c = tbl[raw]
                typ = c.type
                if typ.equals(want):
                    resolved.append(c)
                elif pa.types.is_null(typ):
                    continue
                elif lt == FLOAT64 and (pa.types.is_integer(typ)
                                        or pa.types.is_floating(typ)):
                    resolved.append(pc.cast(c, want))
                else:
                    return None
            if not resolved:
                cols[k] = pa.nulls(tbl.num_rows, want)
            elif len(resolved) == 1:
                cols[k] = resolved[0]
            else:
                # distinct raw spellings ("Name"/"name") of one field:
                # coalescing is exact only while no single row carries
                # two values (the Python path resolves those by
                # document key order, which Arrow cannot see)
                total_nonnull = sum(len(c) - c.null_count for c in resolved)
                merged = resolved[0]
                for c in resolved[1:]:
                    merged = pc.coalesce(merged, c)
                if len(merged) - merged.null_count != total_nonnull:
                    return None
                cols[k] = merged

        schema.update(new_fields)
        out = batch.drop_columns([self.json_col])
        for name in sorted(schema):
            arr = cols.get(name)
            if arr is None:
                arr = pa.nulls(batch.num_rows, _ARROW[schema[name]])
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            out = out.append_column(name, arr)
        return out

    def _python_path(self, batch: pa.Table,
                     texts: list | None = None) -> pa.Table:
        import json as _json

        from kafka_connect_mongo_ray.stages.schema_evolve import (
            _ARROW,
            coerce,
            infer_lattice_type,
            normalize_key,
        )

        docs = batch[self.json_col].to_pylist() if texts is None else texts
        schema = self.analyzer.schema
        # ONE pass per row: parse, normalize keys (memoized), evolve the
        # running schema in-line — the key-normalized dict is built once
        # per row, not once per (field × row)
        lowered_docs: list[dict] = []
        bad_rows: list[int] = []
        for row_i, text in enumerate(docs):
            try:
                d = _json.loads(text) if text is not None else {}
                if not isinstance(d, dict):
                    d = {}
            except (ValueError, TypeError):
                self.analyzer.malformed += 1
                bad_rows.append(row_i)
                d = {}
            lowered: dict = {}
            for rk, v in d.items():
                k = normalize_key(rk)
                if k is not None and k not in lowered:
                    lowered[k] = v
                    if k not in schema:
                        t = infer_lattice_type(v)
                        if t is not None:
                            schema[k] = t
            lowered_docs.append(lowered)
        out = batch.drop_columns([self.json_col])
        for name in sorted(schema):
            t = schema[name]
            # exact-type fast paths skip the coerce() call for the
            # overwhelmingly common already-conformant values (type()
            # is exact: bool never sneaks into the float path, NaN is
            # screened with v == v)
            if t == "string":
                vals = [v if type(v := d.get(name)) is str else coerce(v, t)
                        for d in lowered_docs]
            elif t == "float64":
                vals = [v if (type(v := d.get(name)) is float and v == v)
                        else coerce(v, t) for d in lowered_docs]
            else:
                vals = [v if type(v := d.get(name)) is bool else coerce(v, t)
                        for d in lowered_docs]
            out = out.append_column(name, pa.array(vals, _ARROW[t]))
        self._quarantine(batch, bad_rows)
        return out


#: per-stage ds.stats() text of the most recent run_replay in this
#: process (profiling / BASELINE capture; not used by the engine)
LAST_REPLAY_STATS: str | None = None


def _apply_execution_context(cfg: EngineConfig, ds) -> dict:
    """Apply cfg's Ray DataContext overrides (shuffle strategy,
    reservation ratio) to the INPUT DATASET's plan-bound context and
    return the fields they replaced.

    Two hard-won facts drive this shape (both verified empirically
    against the installed Ray 2.49):

    1. A Dataset binds its DataContext at SOURCE CREATION and derived
       datasets inherit that same object — mutating the process-global
       context after the source exists is a NO-OP for this run. The
       overrides therefore go on ``ds.context`` (the plan-bound
       object), which all of run_replay's derived stages share, so the
       bucket exchange actually runs the configured strategy.
    2. The process-global context, once mutated, leaks into every later
       dataset in the process — measured 2-3× slower on the
       range-partitioned rank/rollup groupbys HASH_SHUFFLE was never
       tuned for. Scoping to the plan-bound context avoids the global
       leak entirely; run_replay still restores the dataset's own
       context via try/finally so a caller-held handle isn't left
       mutated after the run (exceptions included)."""
    from ray.data.context import ShuffleStrategy

    ctx = ds.context
    saved = {
        "shuffle_strategy": ctx.shuffle_strategy,
        "op_resource_reservation_enabled": ctx.op_resource_reservation_enabled,
        "op_resource_reservation_ratio": ctx.op_resource_reservation_ratio,
    }
    if cfg.shuffle_strategy:
        ctx.shuffle_strategy = getattr(ShuffleStrategy, cfg.shuffle_strategy)
    if cfg.op_reservation_ratio is not None:
        ratio = cfg.op_reservation_ratio
        if ratio == "auto":
            # small sessions: the reservation machinery itself is the
            # bottleneck (BASELINE.md round-4 four-quadrant: the same
            # 8-CPU job runs 5.8x faster with it off), large sessions:
            # it protects big runs — size the decision to the cluster
            import ray as _r

            cpus = (int(_r.cluster_resources().get("CPU", 8))
                    if _r.is_initialized() else 8)
            if cpus < _SMALL_CLUSTER_CPUS:
                ctx.op_resource_reservation_enabled = False
            else:
                ctx.op_resource_reservation_enabled = True
                ctx.op_resource_reservation_ratio = 0.3
        elif ratio == "off":
            ctx.op_resource_reservation_enabled = False
        else:
            ctx.op_resource_reservation_enabled = True
            ctx.op_resource_reservation_ratio = ratio
    return saved


def _restore_execution_context(saved: dict, ds) -> None:
    ctx = ds.context
    for k, v in saved.items():
        setattr(ctx, k, v)


def run_replay(events_ds, cfg: EngineConfig) -> dict:
    """One committed replay job; resumable — events at or below the
    previous commit's per-partition resume tokens are filtered at the
    source (§1.6 two-phase semantics)."""
    import uuid

    cfg.validate()  # fail fast on typo'd knobs (MongoSourceConnector.kt:43-60)
    store = SnapshotStore(cfg.snapshot_dir)
    prev = store.current_version()
    new = prev + 1
    # per-job staging nonce: concurrent drivers racing toward the same
    # version stage into private dirs (neither can wipe the other's
    # files); the commit-time OCC check + staged-file audit settle the
    # race loudly instead of losing events silently
    nonce = uuid.uuid4().hex[:12]
    store.clean_staging(new, nonce)  # no-op for a fresh nonce, kept for safety
    store.clean_stale_staging()  # crash-window hygiene: orphans of committed versions
    old_tokens = store.tokens(prev)

    # layout-contract check: after a rebucket the manifest's recorded
    # num_buckets is authoritative; replaying with a stale config would
    # merge mod-K events into a mod-N store — superseded rows resurface
    # next to their LWW replacements and tombstone suppression breaks.
    # Refuse loudly instead (the operator fixes the config or reruns
    # run_rebucket); pre-contract manifests record nothing and pass.
    prev_m = store.manifest(prev)
    recorded = (prev_m or {}).get("num_buckets")
    if recorded and recorded != cfg.num_buckets:
        from kafka_connect_mongo_ray.config import ConfigError

        raise ConfigError(
            f"store layout is {recorded} buckets (manifest v{prev}) but "
            f"cfg.num_buckets={cfg.num_buckets}; set the config to match "
            f"or run_rebucket({cfg.num_buckets}) first")

    saved_ctx = _apply_execution_context(cfg, events_ds)
    try:

        if cfg.analyze_schema:
            if cfg.analyze_mode == "tasks":
                # elastic tasks get full parallelism the moment input blocks
                # exist — no pool ramp (measured 1.7-4.5 s vs 4.8-6.2 s for
                # the (4,30) actor pool on the same 1M-event batch set; the
                # same finding that made apply_mode="tasks" the default).
                # A fresh analyzer per batch also makes schema decisions a
                # function of the BATCH, not of actor arrival order.
                qdir = cfg.quarantine_dir

                def analyze_batch(batch: pa.Table) -> pa.Table:
                    return AnalyzeObjectStage(
                        json_col="object", quarantine_dir=qdir)(batch)

                events_ds = events_ds.map_batches(
                    analyze_batch, batch_format="pyarrow")
            else:
                import ray as _r

                # the Python-parse-bound stage: give the pool most of the
                # machine up front (autoscaling from 1 ramps too slowly on
                # short windows — measured 177k vs 300k+ ev/s at 32 CPUs)
                hi = max(2, int(_r.cluster_resources().get("CPU", 8)) - 2) \
                    if _r.is_initialized() else 8
                events_ds = events_ds.map_batches(
                    AnalyzeObjectStage,
                    fn_constructor_kwargs={"json_col": "object",
                                           "quarantine_dir":
                                               cfg.quarantine_dir},
                    batch_format="pyarrow",
                    concurrency=(min(4, hi), hi),
                )

        ds = events_ds.map_batches(
            normalize_prereduce,
            fn_kwargs={"num_buckets": cfg.num_buckets, "tokens": old_tokens or None},
            batch_format="pyarrow",
            zero_copy_batch=True,
            # batch_size=None → one task per upstream block. CRITICAL when
            # this stage fuses with a generator whose input rows are
            # partition IDS (1 row = tens of thousands of events): a row
            # -count batch_size makes the fused operator bundle every
            # input block into one giant serial task.
            batch_size=cfg.batch_size,
        )
        # second combine round: coalesce pre-reduced blocks and LWW again —
        # shuffle volume drops ~blocks/coalesce-fold when keys repeat across
        # blocks (hot keys, replays). The operative variable is ROWS PER
        # COALESCED BLOCK (~150k sweet spot, BASELINE.md). "auto" learns the
        # block count from the PREVIOUS commit's manifest metrics (events_in
        # = pre-reduced rows that reached the merge last window — recorded
        # lineage, no extra pass); the first window has no history and runs
        # a single pre-reduce round.
        coalesce = cfg.prereduce_coalesce
        if coalesce == "auto":
            prev_manifest = store.manifest(prev)
            prev_rows = sum(int(m.get("events_in") or 0)
                            for m in (prev_manifest or {}).get("metrics", []))
            if prev_rows > 0:
                import ray as _ray

                cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
                coalesce = min(4096, max(cpus, round(prev_rows / 150_000)))
            else:
                coalesce = None
        if coalesce:
            ds = ds.repartition(coalesce)
            ds = ds.map_batches(
                partial_lww, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=cfg.batch_size,
            )
        grouped = ds.groupby("bucket", num_partitions=cfg.num_buckets)
        if cfg.apply_mode == "actors":
            merged = grouped.map_groups(
                FinalMergeApplier,
                fn_constructor_args=(cfg.snapshot_dir, prev, new, nonce),
                batch_format="pyarrow",
                # autoscaling pool: never demand more actors than the cluster
                # can grant (a fixed pool larger than available CPUs stalls)
                concurrency=cfg.apply_concurrency or (1, min(cfg.num_buckets, 16)),
                num_cpus=1,
            )
        else:
            merged = grouped.map_groups(
                _apply_bucket_task,
                fn_kwargs={"snapshot_root": cfg.snapshot_dir,
                           "prev_version": prev, "new_version": new,
                           "rows_per_file": cfg.snapshot_rows_per_file,
                           "nonce": nonce},
                batch_format="pyarrow",
            )
        metrics = merged.take_all()  # one small row per bucket
        # per-stage ds.stats() of the whole replay plan, for profiling /
        # BASELINE capture (string; assigning it costs nothing)
        global LAST_REPLAY_STATS
        LAST_REPLAY_STATS = merged.stats()

        new_tokens: dict[int, tuple[int, int]] = {}
        for row in metrics:
            for p, v in json.loads(row["tokens_json"]).items():
                p = int(p)
                v = (int(v[0]), int(v[1]))
                if p not in new_tokens or v > new_tokens[p]:
                    new_tokens[p] = v
        all_tokens = merge_tokens(old_tokens, new_tokens)

        # union snapshot schema (canonical + evolved payload columns): the
        # per-bucket schemas unified with the previous commit's union —
        # recorded in the manifest so readers can stream mixed buckets
        import base64

        from kafka_connect_mongo_ray.stages.apply import unify_payload_schemas

        schemas = []
        prev_union = (store.manifest(prev) or {}).get("union_schema")
        if prev_union:
            schemas.append(pa.ipc.read_schema(
                pa.BufferReader(base64.b64decode(prev_union))))
        for row in metrics:
            schemas.append(pa.ipc.read_schema(
                pa.BufferReader(base64.b64decode(row["schema_b64"]))))
        union = schemas[0] if schemas else None
        for s in schemas[1:]:
            union = unify_payload_schemas(union, s)
        union_b64 = (base64.b64encode(union.serialize().to_pybytes()).decode()
                     if union is not None else None)

        clean_metrics = [
            {k: v for k, v in row.items() if k not in ("tokens_json", "schema_b64")}
            for row in metrics
        ]
        staged_files = [p for row in metrics if row["file"]
                        for p in row["file"].split(",")]
        store.commit(new, tokens=all_tokens, metrics=clean_metrics, prev_version=prev,
                     union_schema=union_b64, nonce=nonce, expected_files=staged_files,
                     num_buckets=cfg.num_buckets)
        mirror_checkpoints(cfg.checkpoint_dir, all_tokens, version=new)
        return {
            "version": new,
            "buckets": len(metrics),
            "events_in": sum(r["events_in"] for r in metrics),
            "state_rows": sum(r["state_rows"] for r in metrics),
            "live_rows": sum(r["live_rows"] for r in metrics),
            "tombstones": sum(r["tombstones"] for r in metrics),
            "tokens": {p: list(v) for p, v in sorted(all_tokens.items())},
        }
    finally:
        _restore_execution_context(saved_ctx, events_ds)


def final_state_dataset(cfg: EngineConfig, version: int | None = None):
    """Committed snapshot as a streaming Dataset (tombstones dropped).

    Evolved-schema-safe: a custom :class:`SnapshotDatasource` conforms
    each bucket file to the manifest-recorded union schema
    (nullable-add for columns the bucket predates), so mixed-schema
    snapshots stream without a driver-side materialization — and the
    optimizer sees real per-file size metadata."""
    import ray.data as rd

    from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA
    from kafka_connect_mongo_ray.sources.snapshot_source import SnapshotDatasource

    store = SnapshotStore(cfg.snapshot_dir)
    v = version or store.current_version()
    if version is not None and store.manifest(version) is None:
        # distinguish "version does not exist" (typo / GC'd) from
        # "table is empty" for explicit time-travel reads
        raise ValueError(
            f"snapshot version v{version} has no manifest under "
            f"{cfg.snapshot_dir} (never committed, or garbage-collected)"
        )
    files = store.bucket_files(v)
    if not files:
        return rd.from_arrow(SNAPSHOT_SCHEMA.empty_table())
    union_b64 = (store.manifest(v) or {}).get("union_schema")
    return rd.read_datasource(
        SnapshotDatasource(files, union_b64, live_only=True))


def key_range_dataset(cfg: EngineConfig, lo_key: tuple[str, str],
                      hi_key: tuple[str, str],
                      version: int | None = None):
    """Composite-key RANGE scan over a committed snapshot with
    zone-map file pruning: the manifest's per-part-file
    [first_key, last_key] bounds (free at write time — part files are
    contiguous slices of the (repo, path)-sorted bucket) select the
    overlapping files BEFORE any read is scheduled, complementing the
    hash-bucket point GET (``point_lookup``) with the ordered access
    path. A residual vectorized filter inside ``map_batches`` trims
    the boundary files' out-of-range rows; interior files pass it
    untouched. Returns a streaming Dataset of live rows in
    [lo_key, hi_key]; attaches ``files_scanned`` / ``files_total``
    counters on the returned dataset object for observability."""
    import ray.data as rd

    from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA
    from kafka_connect_mongo_ray.sources.snapshot_source import SnapshotDatasource

    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v = store.current_version() if version is None else version
    rels, total = store.files_for_key_range(v, lo_key, hi_key)
    if not rels:
        ds = rd.from_arrow(SNAPSHOT_SCHEMA.empty_table())
        ds.files_scanned, ds.files_total = 0, total
        return ds
    union_b64 = (store.manifest(v) or {}).get("union_schema")
    files = [os.path.join(store.root, r) for r in rels]
    ds = rd.read_datasource(SnapshotDatasource(files, union_b64,
                                               live_only=True))
    lo_r, lo_p = lo_key
    hi_r, hi_p = hi_key

    def residual(batch: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        ge_lo = pc.or_(pc.greater(batch["repo"], pa.scalar(lo_r)),
                       pc.and_(pc.equal(batch["repo"], pa.scalar(lo_r)),
                               pc.greater_equal(batch["path"],
                                                pa.scalar(lo_p))))
        le_hi = pc.or_(pc.less(batch["repo"], pa.scalar(hi_r)),
                       pc.and_(pc.equal(batch["repo"], pa.scalar(hi_r)),
                               pc.less_equal(batch["path"],
                                             pa.scalar(hi_p))))
        return batch.filter(pc.and_(ge_lo, le_hi))

    out = ds.map_batches(residual, batch_format="pyarrow")
    out.files_scanned, out.files_total = len(rels), total
    return out


def export_final_state(cfg: EngineConfig, out_dir: str, version: int | None = None,
                       min_rows_per_file: int | None = None,
                       fmt: str = "parquet") -> int:
    """Materialize the live final state as a directory of part files
    (streaming write — never one giant file). ``fmt`` selects parquet
    (default), headered ``csv``, or line-delimited ``json`` — the sink
    counterparts of the registry's file-source round trips. Atomic at
    the directory level: parts stream into a temp sibling that is
    renamed into place only after the write completes, so readers
    never see a half-written export and a crashed export leaves the
    previous one intact. Returns row count."""
    import os
    import shutil
    import uuid

    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"unknown export format {fmt!r} "
                         "(parquet, csv or json)")
    ds = final_state_dataset(cfg, version)
    kwargs = {"min_rows_per_file": min_rows_per_file} if min_rows_per_file else {}
    tmp = f"{out_dir.rstrip('/')}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        if fmt == "csv":
            ds.write_csv(tmp, **kwargs)
        elif fmt == "json":
            ds.write_json(tmp, **kwargs)
        else:
            ds.write_parquet(tmp, **kwargs)
        # Move any existing export aside (never rmtree-before-replace: a
        # crash in that window would destroy the previous export), swing
        # tmp into place, then drop the old one; restore it on failure.
        old = None
        if os.path.lexists(out_dir):
            old = f"{out_dir.rstrip('/')}.old-{uuid.uuid4().hex[:8]}"
            os.replace(out_dir, old)
        try:
            os.replace(tmp, out_dir)
        except BaseException:
            if old is not None:
                os.replace(old, out_dir)
            raise
        if old is not None:
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.unlink(old)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    import ray.data as rd

    reader = {"parquet": rd.read_parquet, "csv": rd.read_csv,
              "json": rd.read_json}[fmt]
    return reader(out_dir).count()


def final_state_table(cfg: EngineConfig, version: int | None = None,
                      live_only: bool = True) -> pa.Table:
    """Driver-side read of a committed snapshot tolerating evolved
    (mixed) bucket schemas; rows sorted by (repo, path)."""
    import pyarrow.parquet as pq

    from kafka_connect_mongo_ray.stages.apply import concat_with_evolution

    store = SnapshotStore(cfg.snapshot_dir)
    v = version or store.current_version()
    if version is not None and store.manifest(version) is None:
        raise ValueError(
            f"snapshot version v{version} has no manifest under "
            f"{cfg.snapshot_dir} (never committed, or garbage-collected)"
        )
    tables = [pq.read_table(f) for f in store.bucket_files(v)]
    state = concat_with_evolution(tables)
    if live_only:
        state = live_rows(state)
    return state.sort_by([("repo", "ascending"), ("path", "ascending")])


def _collect_merge(group: pa.Table) -> pa.Table:
    limit_worker_threads()
    events, _tokens = split_tokens(group)
    return live_rows(merge_with_snapshot(events, None))


def _collect_merge_all(group: pa.Table) -> pa.Table:
    events, _tokens = split_tokens(group)
    return merge_with_snapshot(events, None)


def replay_collect(events_ds, num_buckets: int = 64, batch_size: int | None = None,
                   live_only: bool = True):
    """Ephemeral replay (no persistence): Dataset of the final state
    (``live_only=False`` keeps tombstone rows). Used by tests and the
    driver-facing ``queries()`` entries."""
    ds = events_ds.map_batches(
        normalize_prereduce,
        fn_kwargs={"num_buckets": num_buckets, "tokens": None},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    fn = _collect_merge if live_only else _collect_merge_all
    # num_partitions: without it the sort shuffle can emit a handful of
    # large blocks and the merge stage loses its parallelism
    return ds.groupby("bucket", num_partitions=num_buckets).map_groups(
        fn, batch_format="pyarrow")


def point_lookup(cfg: EngineConfig, keys: list[tuple[str, str]],
                 version: int | None = None) -> "pa.Table":
    """Serve point reads from the Parquet store in O(touched buckets):
    each (repo, path) key hashes to exactly one bucket (the same
    ``hash_buckets`` rule the apply shuffle uses), so only those
    bucket files are opened — never a table scan. Tombstoned and
    absent keys simply return no row (the sink-DB GET semantics the
    reference's downstream store serves). Driver-side by design: the
    result is ≤ len(keys) rows and the touched file set is
    len(distinct buckets)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kafka_connect_mongo_ray.state.snapshot import SnapshotStore
    from kafka_connect_mongo_ray.utils import hash_buckets

    store = SnapshotStore(cfg.snapshot_dir, create=False)
    v = store.current_version() if version is None else version
    key_t = pa.table({
        "repo": pa.array([k[0] for k in keys], pa.string()),
        "path": pa.array([k[1] for k in keys], pa.string())})
    m = store.manifest(v)
    if key_t.num_rows == 0 or m is None:
        return None
    # the manifest's recorded bucket count is authoritative (survives
    # a rebucket); cfg is the fallback for pre-contract manifests
    nb = m.get("num_buckets") or cfg.num_buckets
    buckets = hash_buckets(key_t, ["repo", "path"], nb)
    out = []
    for b in sorted(set(int(x) for x in buckets)):
        want = key_t.filter(pa.array(buckets == b))
        # zone-map pruned: a split bucket opens only the part files
        # whose key bounds could hold one of this bucket's keys
        t = store.read_bucket_for_keys(
            v, b, list(zip(want["repo"].to_pylist(),
                           want["path"].to_pylist())))
        if t is None:
            continue
        from kafka_connect_mongo_ray.utils import key_strings

        member = pc.is_in(key_strings(t, ["repo", "path"]),
                          value_set=key_strings(want, ["repo", "path"]))
        hit = t.filter(member)
        # live rows only: tombstones answer "absent"
        hit = hit.filter(pc.is_valid(hit["content"]))
        if hit.num_rows:
            # canonical columns only: buckets may carry independently
            # evolved payload columns; a GET answers with the stable
            # core schema
            from kafka_connect_mongo_ray.schema import SNAPSHOT_SCHEMA

            out.append(hit.select(SNAPSHOT_SCHEMA.names))
    if not out:
        return None
    return pa.concat_tables(out)
