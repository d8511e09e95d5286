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


def _tree_reduce(partials_ds, merge_batch, fanin: int = 64):
    """Hierarchical sketch merge: each level folds up to ``fanin`` sketch
    rows into one inside map_batches, so the DRIVER only ever take_all()s
    O(fanin) rows no matter how many input batches there were — at 100 TB a
    million 4 KB HLL partials would otherwise be 4 GB of driver traffic.
    Merges must be associative+commutative (max/add/union are)."""
    level = partials_ds.materialize()
    n = level.count()
    while n > fanin:
        level = level.map_batches(
            merge_batch, batch_format="pyarrow", batch_size=fanin
        ).materialize()
        n = level.count()
    return level.take_all()


def hll_distinct(ds, value_fn, b: int = 12, fanin: int = 64) -> float:
    """Approximate distinct count over a Dataset: one HLL partial per batch
    (2^b bytes each), tree-merged distributed; the driver folds only the
    final fan-in. ``value_fn(batch) -> iterable of strings``."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        sketch = HyperLogLog(b)
        sketch.add_many(value_fn(batch))
        return pa.table({"sketch": pa.array([sketch.dumps()], pa.binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        merged_level = HyperLogLog(b)
        for blob in batch.column("sketch").to_pylist():
            merged_level.merge(HyperLogLog.loads(blob, b))
        return pa.table({"sketch": pa.array([merged_level.dumps()], pa.binary())})

    merged = HyperLogLog(b)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    for row in _tree_reduce(partials, merge_batch, fanin=fanin):
        merged.merge(HyperLogLog.loads(row["sketch"], b))
    return merged.estimate()


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan): d rows × w counters,
    point query = min over rows — overestimates only, mergeable by
    element-wise addition. The heavy-hitter companion to HyperLogLog: at
    100 TB the shuffle carries d×w int64 counters per batch instead of a
    (token, count) row per distinct token."""

    __slots__ = ("depth", "width", "table")

    def __init__(self, depth: int = 4, width: int = 1 << 12):
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _indexes(self, value: str) -> np.ndarray:
        # d pairwise-independent-ish hashes from one 64-bit hash (Kirsch-
        # Mitzenmacher double hashing: h1 + i*h2)
        h = stable_hash64(value)
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) | 1
        return (h1 + np.arange(self.depth, dtype=np.uint64) * h2) % np.uint64(self.width)

    def add(self, value: str, count: int = 1) -> None:
        self.table[np.arange(self.depth), self._indexes(value)] += count

    def add_many(self, values) -> None:
        rows = np.arange(self.depth)
        for value in values:
            self.table[rows, self._indexes(value)] += 1

    def query(self, value: str) -> int:
        return int(self.table[np.arange(self.depth), self._indexes(value)].min())

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.table.shape == other.table.shape
        self.table += other.table
        return self

    def dumps(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def loads(cls, blob: bytes, depth: int = 4, width: int = 1 << 12) -> "CountMinSketch":
        sketch = cls(depth, width)
        sketch.table = np.frombuffer(blob, dtype=np.int64).reshape(depth, width).copy()
        return sketch


def cms_heavy_hitters(ds, value_fn, k: int = 20,
                      depth: int = 4, width: int = 1 << 12, fanin: int = 64):
    """Approximate top-k: one CMS partial per batch (tree-merged distributed,
    candidates capped per level) plus a SMALL per-batch candidate set (each
    batch's local top keys — a heavy hitter globally is a heavy hitter in
    some batch), then the merged sketch ranks the candidate union. Returns
    [(key, approx_count)] sorted by (-count, key). ``value_fn(batch) ->
    iterable of strings``."""
    import collections

    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        sketch = CountMinSketch(depth, width)
        counts: collections.Counter = collections.Counter()
        for value in value_fn(batch):
            counts[value] += 1
        for value, count in counts.items():
            sketch.add(value, count)
        local_top = [key for key, _ in counts.most_common(k * 4)]
        return pa.table(
            {
                "sketch": pa.array([sketch.dumps()], pa.binary()),
                "candidates": pa.array([local_top], pa.list_(pa.string())),
            }
        )

    candidate_cap = k * 64

    def merge_batch(batch: pa.Table) -> pa.Table:
        merged_level = CountMinSketch(depth, width)
        keys: set[str] = set()
        for blob, cands in zip(batch.column("sketch").to_pylist(),
                               batch.column("candidates").to_pylist()):
            merged_level.merge(CountMinSketch.loads(blob, depth, width))
            keys.update(cands)
        # bound the carried candidate set: rank by the level's merged sketch
        # (covers exactly the candidates' batches) and keep a k*64 margin —
        # a global heavy hitter is level-heavy long before it nears rank k
        if len(keys) > candidate_cap:
            ranked_keys = sorted(keys, key=lambda key: (-merged_level.query(key), key))
            keys = set(ranked_keys[:candidate_cap])
        return pa.table(
            {
                "sketch": pa.array([merged_level.dumps()], pa.binary()),
                "candidates": pa.array([sorted(keys)], pa.list_(pa.string())),
            }
        )

    merged = CountMinSketch(depth, width)
    candidates: set[str] = set()
    partials = ds.map_batches(partial, batch_format="pyarrow")
    for row in _tree_reduce(partials, merge_batch, fanin=fanin):
        merged.merge(CountMinSketch.loads(row["sketch"], depth, width))
        candidates.update(row["candidates"])
    ranked = sorted(((key, merged.query(key)) for key in candidates),
                    key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
