"""Mergeable sketches: distributed approximate aggregates.

Pattern (ray_guide §Aggregation at scale): emit ONE serialized sketch
per batch inside ``map_batches`` (vectorized build), merge the handful
of sketches in a tiny final step — distinct-count over any volume with
O(2^p) state and no all-to-all of raw values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: idx = top p bits, rank =
    leading zeros of the remaining bits + 1 — vectorized over rows."""
    h = h.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest
    mask = np.uint64(1 << 63)
    done = np.zeros(len(h), dtype=bool)
    for r in range(64 - p + 1):
        hit = (~done) & ((cur & mask) != 0)
        lz[hit] = r
        done |= hit
        cur = cur << np.uint64(1)
    return idx, lz + 1


class HyperLogLog:
    """Classic HLL (Flajolet et al.) with numpy-vectorized add."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx, rank = _hash_ranks(h, self.p)
        np.maximum.at(self.registers, idx, rank)

    def add_values(self, values) -> None:
        h = pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)
        self.add_hashes(h)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes) -> "HyperLogLog":
        out = cls(b[0])
        out.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return out


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT column)."""

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_values(np.asarray(batch[column]).astype(object))
        return pa.table({"sketch": pa.array([hll.serialize()], pa.binary())})

    merged = None
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        s = HyperLogLog.deserialize(row["sketch"])
        merged = s if merged is None else merged.merge(s)
    return 0.0 if merged is None else merged.estimate()


def approx_distinct_by(ds, column: str, by: str, *, p: int = 12):
    """Per-group approximate COUNT(DISTINCT column) GROUP BY ``by``.

    Each batch emits one serialized sketch PER GROUP IT CONTAINS (the
    values are hashed once for the whole batch, then sliced by group
    code), so the only thing that shuffles is O(groups × blocks)
    fixed-size sketches — never the raw values. The final merge is a
    tiny per-group register max. Returns a Dataset of
    ``(by, approx_distinct)``."""

    def partial(batch: pa.Table) -> pa.Table:
        # null group keys are EXCLUDED (factorize's -1 sentinel would
        # otherwise negative-index into the last key's registers;
        # COALESCE upstream to count a NULL group)
        col = batch[by]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            batch = batch.filter(col.is_valid())
        keys = np.asarray(batch[by]).astype(object)
        codes, uniq = pd.factorize(keys)
        h = pd.util.hash_array(
            np.asarray(batch[column]).astype(object), categorize=False)
        # all keys' registers in ONE flat maximum.at (no Python loop
        # over the batch's distinct keys)
        m = 1 << p
        idx, rank = _hash_ranks(h, p)
        flat = np.zeros(len(uniq) * m, dtype=np.uint8)
        np.maximum.at(flat, codes.astype(np.int64) * m + idx, rank)
        regs = flat.reshape(len(uniq), m)
        pb = bytes([p])
        sketches = [pb + row.tobytes() for row in regs]
        return pa.table({by: pa.array(list(uniq)),
                         "sketch": pa.array(sketches, pa.binary())})

    # merge per HASH BUCKET of the key, not per key: one
    # maximum.reduceat over the stacked register matrix merges every
    # key's sketches in a single vectorized pass (a map_groups call
    # per distinct key scales with the key domain). The estimate
    # arithmetic below reduces each merged row along the same axis
    # length as HyperLogLog.estimate()'s 1-D sum, so the two paths are
    # bit-identical.
    nb = 32

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__gb").sort_values(by, kind="mergesort")
        m = 1 << p
        raw = np.frombuffer(b"".join(g["sketch"]), dtype=np.uint8
                            ).reshape(len(g), m + 1)
        regs = raw[:, 1:]  # strip the leading p byte
        keys = g[by].to_numpy()
        first = np.zeros(len(keys), dtype=bool)
        first[0] = True
        first[1:] = keys[1:] != keys[:-1]
        idx = np.flatnonzero(first)
        merged = np.maximum.reduceat(regs, idx, axis=0)
        mf = float(m)
        alpha = 0.7213 / (1 + 1.079 / mf)
        est = alpha * mf * mf / np.sum(2.0 ** -merged.astype(np.float64),
                                       axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * mf) & (zeros > 0)
        est = np.where(small, mf * np.log(mf / np.maximum(zeros, 1)), est)
        return pd.DataFrame({by: keys[idx], "approx_distinct": est})

    from kafka_connect_mongo_ray.utils import key_bucketed

    return key_bucketed(ds.map_batches(partial, batch_format="pyarrow"),
                        [by], nb).map_groups(merge_bucket,
                                             batch_format="pandas")


# ---------------------------------------------------------------------------
# Bloom filter: shuffle-volume prefilter for big-big existence joins


def _bloom_indexes(keys, num_bits: int, num_hashes: int) -> np.ndarray:
    """(rows × num_hashes) bit positions via double hashing
    (Kirsch–Mitzenmacher: h_i = h1 + i·h2 — two 64-bit hashes simulate
    any k with no per-hash rehash).

    Keys are cast to string IN ARROW before hashing — the same
    dtype-stability rule as utils.stable_hash_buckets: converting an
    int64 Arrow column through numpy first materializes null-bearing
    batches as float64 ('5.0') and null-free ones as int64 ('5'),
    which would put the SAME key at DIFFERENT bit positions per batch
    and turn the no-false-negatives guarantee into silent row loss.
    Null keys hash as a fixed sentinel (they cannot match in SQL
    existence semantics; the exact join behind the filter drops
    them)."""
    arr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) \
        else pa.array(keys)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import pyarrow.compute as pc

    s = np.asarray(
        pc.fill_null(pc.cast(arr, pa.string()), "\x00null")).astype(object)
    h1 = pd.util.hash_array(s, categorize=False)
    h2 = pd.util.hash_array(s, hash_key="bloom2ndhashkey0",
                            categorize=False)  # 16-byte key required
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(num_bits)).astype(np.int64)


def build_bloom(ds, key_col: str, *, num_bits: int = 1 << 22,
                num_hashes: int = 4, fanin: int = 64) -> np.ndarray:
    """Bloom filter of every value of ``key_col`` as a packed uint64
    bitmap (``num_bits / 8`` bytes — 512 KiB at the default 4M bits).

    Mergeable-sketch shape: each batch builds its local bitmap
    vectorized (np.bitwise_or.at over the hash positions), a two-level
    OR-reduce collapses block bitmaps (≤ ``fanin`` bitmaps per task,
    so no task nor the driver ever holds blocks × bitmap), and the
    driver receives exactly one bitmap. False-positive rate for n keys:
    (1 − e^(−k·n/m))^k — size ``num_bits`` ≥ ~10 bits/key for ~1%."""
    words = (num_bits + 63) // 64

    def local(batch: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        keys = batch[key_col]
        if len(keys):
            pos = _bloom_indexes(keys, num_bits, num_hashes).ravel()
            np.bitwise_or.at(bits, pos >> 6,
                             np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def orfold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for b in batch["bits"].to_pylist():
            acc |= np.frombuffer(b, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    # unconditional two-level fold: the intermediate coalesce caps any
    # task at ~blocks/fanin bitmaps and costs one near-no-op
    # repartition when there are fewer (bitmap rows are tiny)
    out = (ds.select_columns([key_col])
           .map_batches(local, batch_format="pyarrow", batch_size=None)
           .repartition(fanin)
           .map_batches(orfold, batch_format="pyarrow", batch_size=None)
           .repartition(1)
           .map_batches(orfold, batch_format="pyarrow", batch_size=None)
           .take_all())
    if not out:
        return np.zeros(words, dtype=np.uint64)
    return np.frombuffer(out[0]["bits"], dtype=np.uint64).copy()


def bloom_contains(bits: np.ndarray, keys, *,
                   num_hashes: int = 4) -> np.ndarray:
    """Vectorized membership probe (no false negatives): True where
    ALL ``num_hashes`` positions are set."""
    num_bits = len(bits) * 64
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_indexes(keys, num_bits, num_hashes)
    hit = (bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return (hit != 0).all(axis=1)


def bloom_semi_join(left_ds, right_ds, *, on: str, how: str = "semi",
                    num_bits: int = 1 << 22, num_hashes: int = 4,
                    num_buckets: int = 32):
    """Existence join with a Bloom prefilter — the scale path for
    BIG-BIG semi joins where neither side broadcasts: the right side's
    keys collapse to one ``num_bits``-bit bitmap (a two-level
    OR-reduce, never a shuffle), the bitmap broadcasts once via
    ``ray.put``, and the left side drops every non-matching row
    BEFORE the join shuffle. False positives pass the prefilter but
    are removed by the exact bucketed hash join behind it, so the
    result is EXACTLY the semi join at any filter size; false
    negatives cannot occur. Shuffle volume: matched rows + the FP rate
    × non-matching rows, instead of the whole left side.

    ``how='semi'`` only (an anti join cannot prune with a Bloom of the
    right side: a negative probe proves absence, but a positive one
    doesn't prove presence — pruning would need the exact join for
    every row anyway)."""
    import ray

    from kafka_connect_mongo_ray.stages.join import hash_join

    if how != "semi":
        raise ValueError("bloom_semi_join supports how='semi' only")
    bits = build_bloom(right_ds, on, num_bits=num_bits,
                       num_hashes=num_hashes)
    if not bits.any():
        # empty right side: the semi join is empty by definition (and
        # an empty right Dataset has no schema for the join to infer)
        return left_ds.limit(0)
    bits_ref = ray.put(bits)

    class Prefilter:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = bloom_contains(self.bits, batch[on],
                                  num_hashes=num_hashes)
            return batch.filter(pa.array(keep))

    pruned = left_ds.map_batches(Prefilter, batch_format="pyarrow",
                                 concurrency=(1, 8))
    return hash_join(pruned, right_ds, on=[on], how="semi",
                     num_buckets=num_buckets)
