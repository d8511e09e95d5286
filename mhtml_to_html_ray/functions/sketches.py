"""Mergeable sketches for distributed aggregation (the guide's pattern: one
serialized sketch per batch, merged in a tiny second stage — sketches are
designed to be mergeable).

HyperLogLog (dense, 2^b registers, 64-bit hashing with the standard bias
corrections): approximate COUNT DISTINCT whose partials union losslessly, so
the shuffle carries 2^b bytes per batch instead of the key universe.
"""

from __future__ import annotations

import numpy as np

from ..frontier.canon import stable_hash64


class HyperLogLog:
    __slots__ = ("b", "m", "registers")

    def __init__(self, b: int = 12):
        self.b = b
        self.m = 1 << b
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, value: str) -> None:
        h = stable_hash64(value)
        index = h & (self.m - 1)
        rest = h >> self.b
        # rank = 1 + number of leading zeros of the remaining 64-b bits
        rank = (64 - self.b) - rest.bit_length() + 1 if rest else (64 - self.b) + 1
        if rank > self.registers[index]:
            self.registers[index] = rank

    def add_many(self, values) -> None:
        for value in values:
            self.add(value)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.m == other.m
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / float(np.sum(np.exp2(-self.registers.astype(np.float64))))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting for small n
        return raw

    # --- wire format for map_batches partials ---
    def dumps(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def loads(cls, blob: bytes, b: int = 12) -> "HyperLogLog":
        sketch = cls(b)
        sketch.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        sketch.m = len(sketch.registers)
        return sketch


def hll_distinct(ds, value_fn, b: int = 12) -> float:
    """Approximate distinct count over a Dataset: one HLL partial per batch
    (2^b bytes each), merged on the driver. ``value_fn(batch) -> iterable of
    strings``."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        sketch = HyperLogLog(b)
        sketch.add_many(value_fn(batch))
        return pa.table({"sketch": pa.array([sketch.dumps()], pa.binary())})

    merged = HyperLogLog(b)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged.merge(HyperLogLog.loads(row["sketch"], b))
    return merged.estimate()
