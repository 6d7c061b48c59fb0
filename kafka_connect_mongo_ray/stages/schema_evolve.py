"""Dynamic schema analysis + evolution (T5–T10, ST1).

Re-expresses the reference's ``analyze.schema=true`` mode
(``source/SchemaMapper.kt``) over Arrow:

- **Type lattice** (``SchemaMapper.kt:171-176``): Number → float64,
  Boolean → bool, everything else → string (dates become ISO-8601
  strings, nested docs/arrays become JSON text,
  ``SchemaMapper.kt:137-157``).
- **Field-name normalization** (``SchemaMapper.kt:41-49``): keys
  lower-cased; dropped unless they match ``^[a-z_][a-z0-9_]*$``
  (case-insensitive).
- **Evolution** (``SchemaMapper.kt:199-235``): new field → nullable
  add; type conflict → OLD TYPE WINS, unconvertible value nulled
  (``SchemaMapperTest.kt:139-159``); numeric values always widen to
  float64 (``SchemaMapper.kt:173``).
- **Meta columns** (``SchemaMapper.kt:54-91``): ``__op``, ``__pkey``,
  ``__sql`` (always null), ``__ts`` ISO-8601 string.
- **Canonical order** (``SchemaMapper.kt:240-250``): fields sorted by
  name.

The running schema is the per-actor analog of the process-global
``CachedSchema`` map (``source/CachedSchema.kt:9-26``). Because the
reference is single-threaded per topic while our stage is a parallel
actor pool, per-actor schemas can disagree on first-seen types; the
deterministic commit-time rule is ``unify_analyzed_schemas``:
conflicting lattice types resolve to ``string`` (the lattice top —
every value has a string rendering), independent of arrival order.
"""

from __future__ import annotations

import json
import math
import re

import pyarrow as pa

from kafka_connect_mongo_ray.functions.dates import iso_from_epoch_s

_NAME_RE = re.compile(r"^[a-z_][a-z0-9_]*$", re.IGNORECASE)

FLOAT64, BOOL, STRING = "float64", "bool", "string"
_ARROW = {FLOAT64: pa.float64(), BOOL: pa.bool_(), STRING: pa.string()}
# Parallel sqlType annotation (SchemaMapper.kt:186-192)
SQL_TYPE = {FLOAT64: "DOUBLE", BOOL: "BOOLEAN", STRING: "VARCHAR"}
META_COLS = ("__op", "__pkey", "__sql", "__ts")


from functools import lru_cache


@lru_cache(maxsize=65536)
def normalize_key(key: str) -> str | None:
    """Lowercase; None if invalid (dropped) — ``SchemaMapper.kt:41-49``.
    Memoized: field names repeat across millions of rows, the regex
    match + lower() only run once per distinct raw key per process."""
    if not _NAME_RE.match(key):
        return None
    return key.lower()


def infer_lattice_type(value) -> str | None:
    """Lattice type of a JSON value; None → field skipped (null/undefined)."""
    if value is None:
        return None
    if isinstance(value, bool):
        return BOOL
    if isinstance(value, (int, float)):
        return FLOAT64
    return STRING


def coerce(value, lattice_type: str):
    """Cast a value to a lattice type; None on conflict (old type wins,
    ``SchemaMapper.kt:137-162``)."""
    if value is None:
        return None
    if lattice_type == FLOAT64:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        f = float(value)
        return None if math.isnan(f) else f
    if lattice_type == BOOL:
        return value if isinstance(value, bool) else None
    # STRING: nested containers → JSON text (SchemaMapper.kt:151-152);
    # booleans render lowercase (JSON), numbers via repr, rest via str.
    if isinstance(value, (dict, list)):
        return json.dumps(value, sort_keys=True, separators=(",", ":"))
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def evolve(schema: dict[str, str], doc: dict) -> dict[str, str]:
    """Add-only merge of one document into the running schema
    (``SchemaMapper.kt:216-235``): new valid fields appended with their
    inferred type; existing fields keep their type."""
    for raw_key, value in doc.items():
        key = normalize_key(raw_key)
        if key is None or key in schema:
            continue
        t = infer_lattice_type(value)
        if t is not None:
            schema[key] = t
    return schema


def unify_analyzed_schemas(schemas: list[dict[str, str]]) -> dict[str, str]:
    """Deterministic commit-time union of per-actor running schemas:
    nullable-add for new fields; type conflict → string (lattice top)."""
    out: dict[str, str] = {}
    for s in schemas:
        for k, t in s.items():
            if k in out and out[k] != t:
                out[k] = STRING
            else:
                out.setdefault(k, t)
    return out


def arrow_schema(schema: dict[str, str], *, with_meta: bool = True) -> pa.Schema:
    """Sorted canonical Arrow schema + meta columns (all nullable)."""
    fields = [
        pa.field(name, _ARROW[t], metadata={"sqlType": SQL_TYPE[t]})
        for name, t in sorted(schema.items())
    ]
    if with_meta:
        fields += [
            pa.field("__op", pa.string()),
            pa.field("__pkey", pa.string()),
            pa.field("__sql", pa.string()),  # always null (SchemaMapper.kt:67)
            pa.field("__ts", pa.string()),
        ]
    return pa.schema(fields)


def parse_avro_schema(avro_json: str | dict) -> dict[str, str]:
    """Schema-registry bootstrap (``source/SchemaParser.kt:12-92``,
    hook at ``AbstractMongoSourceTask.kt:65-80``): parse an Avro record
    schema (JSON) into an initial lattice schema for the analyzer.

    Avro type → lattice: int/long/float/double → float64, boolean →
    bool, everything else → string; union types take the first
    non-null branch; meta columns (``__*``) are skipped (re-added by
    the analyzer itself)."""
    schema = json.loads(avro_json) if isinstance(avro_json, str) else avro_json
    if schema.get("type") != "record":
        raise ValueError("expected an Avro record schema")
    out: dict[str, str] = {}
    for field in schema.get("fields", []):
        name = normalize_key(field["name"])
        if name is None or name.startswith("__"):
            continue
        t = field["type"]
        if isinstance(t, list):  # union — first non-null branch
            branches = [b for b in t if b != "null"]
            t = branches[0] if branches else "null"
        if isinstance(t, dict):  # nested record/array/map → JSON text
            t = t.get("type", "string")
        if t in ("int", "long", "float", "double"):
            out[name] = FLOAT64
        elif t == "boolean":
            out[name] = BOOL
        elif t == "null":
            continue
        else:
            out[name] = STRING
    return out


def bootstrap_schema_from_registry(fetch, *, max_retries: int = 5,
                                   backoff_s: float = 0.0,
                                   parse=parse_avro_schema) -> dict[str, str]:
    """Schema-registry bootstrap with retry — the analog of the
    reference's registry fetch at task start
    (``AbstractMongoSourceTask.kt:65-80``: fetch latest Avro schema,
    parse it into the initial cached schema, retrying transient
    failures under the ``TaskUtil.runTry`` policy).

    ``fetch`` is any zero-arg callable returning the Avro-JSON schema
    text (an HTTP client in a networked deployment, a file read or a
    stub here — the transport is injected, the retry/parse contract is
    the engine's). Retries up to ``max_retries`` consecutive failures
    with linear backoff, then re-raises. Returns the initial lattice
    schema for :class:`SchemaAnalyzer` (``initial_schema=``)."""
    import time

    last = None
    for attempt in range(max_retries + 1):
        try:
            return parse(fetch())
        except Exception as e:  # noqa: BLE001 — transport errors are opaque
            last = e
            if attempt < max_retries and backoff_s:
                time.sleep(backoff_s * (attempt + 1))
    raise last


def http_schema_fetcher(url: str, *, timeout_s: float = 10.0,
                        headers: dict | None = None):
    """Real HTTP transport for :func:`bootstrap_schema_from_registry` —
    the live analog of the reference's registry client call at task
    start (``AbstractMongoSourceTask.kt:65-80``; it asks the Confluent
    registry for the latest schema of a subject).

    Returns a zero-arg callable that GETs ``url`` (stdlib urllib — no
    extra dependency) and returns the Avro-JSON schema text. Confluent
    registry endpoints (``/subjects/<s>/versions/latest``) wrap the
    schema in a JSON envelope ``{"schema": "<escaped avro json>"}``;
    that envelope is unwrapped when present, a bare Avro document body
    is returned as-is. Compose with the bootstrap's retry policy::

        fetch = http_schema_fetcher("http://registry:8081/subjects/"
                                    "events-value/versions/latest")
        schema = bootstrap_schema_from_registry(fetch, backoff_s=1.0)
    """
    import json as _json
    import urllib.request

    def fetch() -> str:
        req = urllib.request.Request(url, headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = resp.read().decode("utf-8")
        try:
            envelope = _json.loads(body)
        except ValueError:
            return body
        if isinstance(envelope, dict) and isinstance(
                envelope.get("schema"), str):
            return envelope["schema"]
        return body

    return fetch


class SchemaAnalyzer:
    """Actor-pool stage: JSON documents → analyzed flat Arrow rows.

    ``map_batches(SchemaAnalyzer, fn_constructor_kwargs=..., concurrency=N)``
    over a table carrying a JSON-text column (the reference's ``o``
    document / our ``props``-style payload), plus op / pkey / ts
    columns for the meta fields. The running schema lives in the actor
    (ST1 analog) and only grows; emitted batches always carry every
    field seen so far by this actor, so downstream unification is a
    nullable-add.

    Malformed JSON ⇒ row skipped and counted (the reference logs and
    skips at ``MongoSinkTask.kt:62-70`` / T11).
    """

    def __init__(
        self,
        json_col: str = "object",
        op_col: str | None = "op",
        pkey_cols: tuple[str, ...] | None = ("repo", "path"),
        ts_col: str | None = "ts",
        initial_schema: dict[str, str] | None = None,
    ):
        self.json_col = json_col
        self.op_col = op_col
        self.pkey_cols = tuple(pkey_cols) if pkey_cols else None
        self.ts_col = ts_col
        self.schema: dict[str, str] = dict(initial_schema or {})
        self.malformed = 0

    def analyze_docs(self, docs, ops=None, pkeys=None, tss=None) -> pa.Table:
        parsed = []
        meta = []
        for i, text in enumerate(docs):
            if isinstance(text, dict):
                doc = text
            else:
                try:
                    doc = json.loads(text) if text is not None else {}
                    if not isinstance(doc, dict):
                        raise ValueError("not an object")
                except (ValueError, TypeError):
                    self.malformed += 1
                    continue
            self.schema = evolve(self.schema, doc)
            parsed.append(doc)
            meta.append(
                (
                    ops[i] if ops is not None else None,
                    pkeys[i] if pkeys is not None else None,
                    iso_from_epoch_s(tss[i]) if tss is not None and tss[i] is not None else None,
                )
            )
        names = sorted(self.schema)
        cols: dict[str, list] = {n: [] for n in names}
        for doc in parsed:
            lowered = {}
            for rk, v in doc.items():
                k = normalize_key(rk)
                if k is not None and k not in lowered:
                    lowered[k] = v
            for n in names:
                cols[n].append(coerce(lowered.get(n), self.schema[n]))
        out = {n: pa.array(cols[n], _ARROW[self.schema[n]]) for n in names}
        out["__op"] = pa.array([m[0] for m in meta], pa.string())
        out["__pkey"] = pa.array([m[1] for m in meta], pa.string())
        out["__sql"] = pa.array([None] * len(meta), pa.string())
        out["__ts"] = pa.array([m[2] for m in meta], pa.string())
        return pa.table(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch[self.json_col].to_pylist()
        ops = batch[self.op_col].to_pylist() if self.op_col and self.op_col in batch.column_names else None
        if self.pkey_cols and all(c in batch.column_names for c in self.pkey_cols):
            parts = [batch[c].to_pylist() for c in self.pkey_cols]
            pkeys = ["/".join(str(x) for x in tup) for tup in zip(*parts)]
        else:
            pkeys = None
        tss = batch[self.ts_col].to_pylist() if self.ts_col and self.ts_col in batch.column_names else None
        return self.analyze_docs(docs, ops, pkeys, tss)
