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


class HyperLogLog:
    """Classic HLL (Flajolet et al.) with numpy-vectorized add."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest
        mask = np.uint64(1 << 63)
        done = np.zeros(len(h), dtype=bool)
        for r in range(64 - self.p + 1):
            hit = (~done) & ((cur & mask) != 0)
            lz[hit] = r
            done |= hit
            cur = cur << np.uint64(1)
        rank = lz + 1
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
        keys = np.asarray(batch[by]).astype(object)
        codes, uniq = pd.factorize(keys)
        h = pd.util.hash_array(
            np.asarray(batch[column]).astype(object), categorize=False)
        sketches = []
        for gi in range(len(uniq)):
            hll = HyperLogLog(p)
            hll.add_hashes(h[codes == gi])
            sketches.append(hll.serialize())
        return pa.table({by: pa.array(list(uniq)),
                         "sketch": pa.array(sketches, pa.binary())})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for b in g["sketch"]:
            s = HyperLogLog.deserialize(b)
            merged = s if merged is None else merged.merge(s)
        return pd.DataFrame({by: [g[by].iloc[0]],
                             "approx_distinct": [merged.estimate()]})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(by).map_groups(
        merge_group, batch_format="pandas")
