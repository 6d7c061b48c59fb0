"""Shared helpers: deterministic vectorized key hashing, atomic writes.

The bucket hash must be deterministic across processes and Python
versions (no builtin ``hash``: PYTHONHASHSEED). We use pandas'
vectorized 64-bit string hasher (``pd.util.hash_array``) with its
fixed default hash key, applied to the NUL-joined key columns.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

KEY_SEP = "\x00"


def key_strings(table: pa.Table, key_cols: list[str]) -> pa.Array:
    """NUL-joined composite key column, vectorized in Arrow."""
    cols = [table[c] for c in key_cols]
    if len(cols) == 1:
        arr = cols[0]
        return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    joined = pc.binary_join_element_wise(*[pc.cast(c, pa.string()) for c in cols], KEY_SEP)
    return joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined


def hash_buckets(table: pa.Table, key_cols: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic int32 bucket id per row: hash64(key) % num_buckets."""
    keys = key_strings(table, key_cols)
    h = pd.util.hash_array(np.asarray(keys), categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def stable_hash_buckets(table: pa.Table, key_cols: list[str],
                        num_buckets: int) -> np.ndarray:
    """Dtype-STABLE bucket ids for per-key co-location: every key
    column is cast to STRING in Arrow BEFORE the numpy conversion.

    Rationale: ``np.asarray`` materializes an int64 Arrow column as
    int64 for null-free batches but float64 (NaN) for batches with any
    null, and ``pd.util.hash_array`` hashes 5 and 5.0 differently — so
    hashing the raw numpy values can route the SAME key to DIFFERENT
    buckets in different batches, silently splitting a key's window /
    group. The Arrow-side string cast is independent of the batch's
    null pattern. Null keys hash as a consistent null bucket. (This is
    deliberately a separate function from :func:`hash_buckets`, whose
    hash feeds the committed snapshot layout and must stay stable
    across versions.)"""
    cols = [pc.cast(table[c] if not isinstance(table[c], pa.ChunkedArray)
                    else table[c].combine_chunks(), pa.string())
            for c in key_cols]
    joined = cols[0] if len(cols) == 1 else pc.binary_join_element_wise(
        *cols, KEY_SEP)
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    h = pd.util.hash_array(np.asarray(joined, dtype=object),
                           categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def key_bucketed(ds, key_cols: list[str], num_partitions: int):
    """Append a dtype-stable ``__gb`` hash bucket of ``key_cols`` and
    group by it: all rows of a key share one bucket, so per-key kernels
    stay intact while the per-group fixed cost is paid per BUCKET, not
    per distinct key. ``num_partitions`` is captured ONCE at plan-build
    time — deriving it inside the per-batch closure (e.g. from live
    cluster resources) can change the modulus mid-stage and split
    keys."""

    def assign(batch: pa.Table) -> pa.Table:
        return batch.append_column("__gb", pa.array(
            stable_hash_buckets(batch, key_cols, num_partitions)))

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("__gb", num_partitions=num_partitions))


_threads_limited = False


def limit_worker_threads() -> None:
    """Cap Arrow's internal thread pool inside Ray worker processes.

    Every Ray worker would otherwise spawn a hardware-concurrency-sized
    Arrow pool (32 threads × 32 workers = thrashing); Ray already caps
    OMP/numpy via OMP_NUM_THREADS=1 but Arrow's pool is separate. Call
    lazily at the top of hot stage functions — no-op on the driver and
    after the first call."""
    global _threads_limited
    if _threads_limited:
        return
    try:
        import ray

        if ray.is_initialized() and ray.get_runtime_context().worker.mode == ray.WORKER_MODE:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass
    _threads_limited = True


def compact_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Single zero-offset Array, copying only when needed.

    Ray Data's block slicing can deliver chunks with a nonzero slice
    offset; pyarrow 16.1's ``if_else`` kernel mishandles such
    (large_)string inputs and emits arrays with out-of-bounds offsets.
    ``take`` forces a compacted copy for exactly the offending chunks.
    """
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    if len(chunks) == 1 and chunks[0].offset == 0:
        return chunks[0]
    fixed = [
        c if c.offset == 0 else c.take(np.arange(len(c), dtype=np.int64))
        for c in chunks
    ]
    return fixed[0] if len(fixed) == 1 else pa.concat_arrays(fixed)


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<float>`` column → dense (n, dim) matrix, zero-copy.

    The per-row ``to_pylist()`` + ``np.stack`` idiom costs a Python
    loop per row; Arrow list columns flatten zero-copy instead:
    ``values`` is one contiguous buffer, reshaped via the (verified
    fixed) list length. Accepts Array / ChunkedArray; raises on ragged
    lists (an embedding column must be fixed-dim)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError(
            f"embedding column has {col.null_count} null rows; embeddings "
            "must be dense (filter or impute nulls upstream)")
    if isinstance(col, pa.FixedSizeListArray):
        dim = col.type.list_size
        # flatten() honors slice offsets; .values would misalign a
        # sliced array (and read garbage under null slots, guarded above)
        flat = np.asarray(col.flatten(), dtype=dtype)
        return flat.reshape(n, dim)
    lengths = pc.list_value_length(col)
    mn, mx = pc.min_max(lengths).values()
    if mn.as_py() != mx.as_py():
        raise ValueError("ragged embedding column: lengths vary "
                         f"({mn.as_py()}..{mx.as_py()})")
    dim = int(mx.as_py())
    # flatten() respects slice offsets/nulls; values does not — use
    # flatten for correctness, it is still vectorized C, not per-row
    flat = np.asarray(col.flatten(), dtype=dtype)
    return flat.reshape(n, dim)


def atomic_write_json(path: str, obj) -> None:
    """Write-temp-then-rename: the commit protocol primitive (SURVEY.md §7.4)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def run_try(fn, *, max_consecutive_errors: int = 5, healthy_reset_s: float = 600.0,
            sleep_s: float = 0.0, clock=None):
    """Driver-side retry policy — analog of ``utils/TaskUtil.kt:10-34``:
    tolerate up to N CONSECUTIVE failures; a stretch of
    ``healthy_reset_s`` since the last failure resets the counter; the
    (N+1)th consecutive failure re-raises (task death). Within Ray,
    per-task/actor retries are handled by Ray itself (max_retries);
    this guards whole-job loops such as micro-batch tailing."""
    import time as _time

    now = clock or _time.monotonic
    errors = 0
    last_error_at = None
    while True:
        try:
            return fn()
        except Exception:
            t = now()
            if last_error_at is not None and t - last_error_at > healthy_reset_s:
                errors = 0
            errors += 1
            last_error_at = t
            if errors > max_consecutive_errors:
                raise
            if sleep_s:
                _time.sleep(sleep_s)


def read_json(path: str, default=None):
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


#: two-level candidate-reduce fan-in: above this many candidate
#: blocks/partitions, prune through an intermediate coalesce so the
#: final single-task pick sees <= TOPK_FANIN * per-task-top-k rows
TOPK_FANIN = 64


def two_level_pick(cand, pick_fn, width: int | None):
    """Collapse per-block top-k candidates to the final answer without
    the Sort operator (its per-block fixed costs dwarf the <= blocks*k
    candidate rows at every scale — measured 2.6 s -> 0.3 s on a
    64-block corpus). ``width`` is the candidate block/partition count
    (None when unknown and known small); above ``TOPK_FANIN`` an
    intermediate coalesce prunes before the final single-task pick.
    Shared by the BM25/TF-IDF family and the vocabulary ops."""
    if width and width > TOPK_FANIN:
        cand = (cand.repartition(TOPK_FANIN)
                .map_batches(pick_fn, batch_format="pyarrow"))
    return (cand.repartition(1)
            .map_batches(pick_fn, batch_format="pyarrow"))
