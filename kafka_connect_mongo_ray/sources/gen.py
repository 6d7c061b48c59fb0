"""Deterministic oplog-shaped change-event generation (sources S1/S2).

The reference tails ``local.oplog.rs`` with a tailable cursor
(``database/OplogReader.kt:51-88``) and emits one ``{ts, op, ns, o,
o2}`` document per change; the snapshot exporter wraps full-scan rows
as synthetic ``op="i"`` events (``database/ExportReader.kt:68-76``) so
one envelope serves both backfill and tail. We reproduce that shape as
a seeded, fully deterministic generator over a synthetic repo-file
key universe:

- per-partition monotone ``(ts, inc)`` — the oplog's ``$natural``
  order per namespace (``OplogReader.kt:55``);
- ``op ∈ {i,u,d}`` with a configurable mix
  (``OplogReader.kt:137-141``);
- updates carry the FULL row image, never a delta — mirroring the
  reference's post-lookup enrichment (``OplogReader.kt:99-125``);
- deletes are tombstones: ``content = null``
  (``AbstractMongoSourceTask.kt:174-178``);
- a zipf-ish hot-key knob (the "hot namespace" the reference cannot
  parallelize, SURVEY.md §4) and a duplicate-injection knob
  (at-least-once replay, ``MongoSourceTaskTest.kt:192,213``).

No wall clock anywhere: everything derives from ``seed`` and
``partition_id`` (the reference uses ``Date()`` at
``ExportReader.kt:70``; we must not, for sha256 parity).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from kafka_connect_mongo_ray.schema import CHANGE_EVENT_SCHEMA, REPO_FILE_SCHEMA

_EXTS = ["py", "rs", "go", "js", "md"]
_LANGS = {"py": "python", "rs": "rust", "go": "go", "js": "javascript", "md": "markdown"}
_WORDS = np.array(
    "def fn let mut pub return import from class struct impl match if else for while "
    "range len append push map filter reduce hash key value table row batch stream "
    "shuffle merge apply commit offset token snapshot parquet arrow ray data".split()
)


def _hex40(parts: str) -> str:
    return hashlib.sha1(parts.encode()).hexdigest()


_POOL_SIZE = 1024
_pool_cache: dict = {}


def _commit_pool(seed: int) -> np.ndarray:
    """Precomputed 40-hex commit ids; one pool per seed, built once per
    process and indexed vectorized per event."""
    key = ("commit", seed)
    if key not in _pool_cache:
        rng = np.random.default_rng(seed ^ 0xC0FFEE)
        vals = rng.integers(0, 1 << 30, size=_POOL_SIZE)
        _pool_cache[key] = np.array([f"{v:08x}" * 5 for v in vals], dtype=object)
    return _pool_cache[key]


def _body_pool(seed: int, content_words: int) -> np.ndarray:
    """Precomputed pseudo-code text bodies (seed-deterministic)."""
    key = ("body", seed, content_words)
    if key not in _pool_cache:
        rng = np.random.default_rng(seed ^ 0xB0D1E5)
        idx = rng.integers(0, len(_WORDS), size=(_POOL_SIZE, content_words))
        _pool_cache[key] = np.array([" ".join(w) for w in _WORDS[idx]], dtype=object)
    return _pool_cache[key]


def synth_repo_files(n_repos: int = 100, paths_per_repo: int = 100, seed: int = 42) -> pa.Table:
    """Deterministic base table (FIXTURES.md F1): the snapshot source."""
    rng = np.random.default_rng(seed)
    n = n_repos * paths_per_repo
    ri = np.repeat(np.arange(n_repos), paths_per_repo)
    pj = np.tile(np.arange(paths_per_repo), n_repos)
    exts = [_EXTS[j % len(_EXTS)] for j in range(paths_per_repo)]
    repo = [f"repo{i:04d}" for i in ri]
    path = [f"src/d{j // 10}/f{j:03d}.{exts[j]}" for j in pj]
    commit = [_hex40(f"{seed}:{r}/{p}:0") for r, p in zip(repo, path)]
    lang = [_LANGS[exts[j]] for j in pj]
    n_words = rng.integers(30, 120, size=n)
    word_idx = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    bounds = np.concatenate([[0], np.cumsum(n_words)])
    content = [
        " ".join(_WORDS[word_idx[bounds[i]:bounds[i + 1]]]) for i in range(n)
    ]
    return pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.large_string()),
        },
        schema=REPO_FILE_SCHEMA,
    )


@dataclass
class GenSpec:
    """All generation knobs; fully determines the event stream given seed."""

    num_partitions: int = 8
    events_per_partition: int = 1000
    seed: int = 42
    p_insert: float = 0.4
    p_update: float = 0.45
    p_delete: float = 0.15
    skew: float = 1.0  # 1.0 = uniform keys; >1 concentrates on low key ids
    base_ts: int = 1_600_000_000  # ts origin; raise for delta/tail streams
    dup_frac: float = 0.0  # fraction of events re-emitted verbatim (at-least-once)
    content_words: int = 40


def gen_partition_events(
    spec: GenSpec,
    part_id: int,
    keys_repo: np.ndarray,
    keys_path: np.ndarray,
    keys_lang: np.ndarray,
) -> pa.Table:
    """Events for one partition: monotone (ts, inc) within the partition.

    Global version order across partitions is well defined because
    ``ts`` values interleave round-robin (``ts = base + k*P + p``), so
    no two partitions produce the same ``(ts, inc)`` for any key —
    LWW by ``(ts, inc)`` is unambiguous, matching the reference's
    per-namespace total order + idempotent-upsert convergence
    (``MongoSinkTaskTest.kt:92-117``).
    """
    rng = np.random.default_rng(spec.seed * 1_000_003 + part_id)
    n = spec.events_per_partition
    n_keys = len(keys_repo)
    base_ts = spec.base_ts

    u = rng.random(n)
    key_idx = np.minimum((n_keys * (u ** spec.skew)).astype(np.int64), n_keys - 1)
    ts = base_ts + np.arange(n, dtype=np.int64) * spec.num_partitions + part_id
    inc = np.full(n, part_id, dtype=np.int32)

    opr = rng.random(n)
    op = np.where(opr < spec.p_insert, "i", np.where(opr < spec.p_insert + spec.p_update, "u", "d"))

    repo = keys_repo[key_idx]
    path = keys_path[key_idx]
    lang = keys_lang[key_idx]
    # vectorized string synthesis: index precomputed pools instead of
    # per-row join/format loops (the hot path of generation)
    commit = _commit_pool(spec.seed)[rng.integers(0, _POOL_SIZE, size=n)]
    body = _body_pool(spec.seed, spec.content_words)[rng.integers(0, _POOL_SIZE, size=n)]
    import pandas as pd

    content = (
        pd.Series(repo, dtype=object)
        .str.cat(path, sep="/")
        .str.cat(pd.Series(ts).astype(str), sep="@")
        .str.cat(pd.Series(inc).astype(str), sep=".")
        .str.cat(body, sep=":")
        .to_numpy(dtype=object)
    )
    is_del = op == "d"
    content_arr = pa.array(np.where(is_del, None, content), pa.large_string())

    table = pa.table(
        {
            "ts": pa.array(ts, pa.int64()),
            "inc": pa.array(inc, pa.int32()),
            "op": pa.array(op, pa.string()),
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": content_arr,
            "partition_id": pa.array(np.full(n, part_id, dtype=np.int32)),
        },
        schema=CHANGE_EVENT_SCHEMA,
    )

    if spec.dup_frac > 0:
        n_dup = int(n * spec.dup_frac)
        dup_idx = rng.integers(0, n, size=n_dup)
        table = pa.concat_tables([table, table.take(np.sort(dup_idx))])
    return table


def gen_all_events(spec: GenSpec, base: pa.Table) -> pa.Table:
    """Single-process reference path for tests/oracle: all partitions concat."""
    kr = np.asarray(base["repo"])
    kp = np.asarray(base["path"])
    kl = np.asarray(base["lang"])
    return pa.concat_tables(
        [gen_partition_events(spec, p, kr, kp, kl) for p in range(spec.num_partitions)]
    )


_base_cache: dict = {}


def _gen_task(batch: pa.Table, *, spec: GenSpec, base_ref) -> pa.Table:
    """Stateless generation task. The key universe is broadcast once via
    ``ray.put`` on the driver; ``ray.get`` here is a zero-copy plasma
    read, memoized per worker process — never re-shipped per batch."""
    import ray

    from kafka_connect_mongo_ray.utils import limit_worker_threads

    limit_worker_threads()

    key = base_ref.hex() if hasattr(base_ref, "hex") else id(base_ref)
    if key not in _base_cache:
        base: pa.Table = ray.get(base_ref)
        _base_cache.clear()
        _base_cache[key] = (
            np.asarray(base["repo"]),
            np.asarray(base["path"]),
            np.asarray(base["lang"]),
        )
    kr, kp, kl = _base_cache[key]
    parts = [
        gen_partition_events(spec, int(p), kr, kp, kl)
        for p in batch["id"].to_pylist()
    ]
    return pa.concat_tables(parts) if parts else CHANGE_EVENT_SCHEMA.empty_table()


def change_event_dataset(spec: GenSpec, base: pa.Table, *, concurrency: int | None = None):
    """Ray Dataset of change events: one input block per partition id.

    Elastic tasks (full parallelism instantly) rather than an actor
    pool — generation state is just the broadcast key universe, which
    tasks read zero-copy from the object store."""
    import ray
    import ray.data as rd

    base_ref = ray.put(base)
    ds = rd.range(spec.num_partitions, override_num_blocks=spec.num_partitions)
    return ds.map_batches(
        _gen_task,
        fn_kwargs={"spec": spec, "base_ref": base_ref},
        batch_size=1,
        batch_format="pyarrow",
    )
