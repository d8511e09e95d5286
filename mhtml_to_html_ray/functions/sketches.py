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


class TDigest:
    """Merging t-digest (Dunning & Ertl, arXiv:1902.04023): a mergeable
    quantile sketch for CONTINUOUS columns — the scale path the exact
    value-counts quantiles (functions/quantiles.py) can't take when the
    value domain is unbounded. Clusters are (mean, weight) centroids bounded
    by the arcsine scale function, so accuracy concentrates at the tails;
    size is O(compression) regardless of input count. Deterministic: no
    RNG, stable mean-ordered merging."""

    __slots__ = ("compression", "means", "weights", "_buffer", "_min", "_max")

    def __init__(self, compression: int = 200):
        self.compression = compression
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self._buffer: list[np.ndarray] = []
        self._min = np.inf
        self._max = -np.inf

    # --- scale function (k1, arcsine): k(q) = c/(2π)·asin(2q−1) ---
    def _k(self, q: np.ndarray | float):
        return self.compression / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)

    def add_array(self, values) -> None:
        arr = np.asarray(values, np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return
        self._min = min(self._min, float(arr.min()))
        self._max = max(self._max, float(arr.max()))
        self._buffer.append(arr)
        if sum(a.size for a in self._buffer) > 10 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        other._compress()
        self._compress()
        self._merge_weighted(other.means, other.weights)
        return self

    def _merge_weighted(self, means: np.ndarray, weights: np.ndarray) -> None:
        all_means = np.concatenate([self.means, means])
        all_weights = np.concatenate([self.weights, weights])
        order = np.argsort(all_means, kind="stable")
        self.means, self.weights = self._cluster(all_means[order], all_weights[order])

    def _compress(self) -> None:
        if not self._buffer:
            return
        buffered = np.concatenate(self._buffer)
        self._buffer = []
        self._merge_weighted(buffered, np.ones(buffered.size, np.float64))

    def _cluster(self, means: np.ndarray, weights: np.ndarray):
        total = weights.sum()
        if total == 0:
            return means[:0], weights[:0]
        out_means: list[float] = []
        out_weights: list[float] = []
        cum = 0.0
        cur_sum = means[0] * weights[0]
        cur_w = weights[0]
        k_start = self._k(0.0)
        for m, w in zip(means[1:], weights[1:]):
            if self._k((cum + cur_w + w) / total) - k_start <= 1.0:
                cur_sum += m * w
                cur_w += w
            else:
                out_means.append(cur_sum / cur_w)
                out_weights.append(cur_w)
                cum += cur_w
                cur_sum, cur_w = m * w, w
                k_start = self._k(cum / total)
        out_means.append(cur_sum / cur_w)
        out_weights.append(cur_w)
        return np.asarray(out_means), np.asarray(out_weights)

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        total = self.weights.sum()
        target = q * total
        # cumulative weight at each centroid MIDPOINT, interpolate between
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return self._min if total >= 2 and target <= self.weights[0] / 2.0 else float(self.means[0])
        if target >= cum[-1]:
            return self._max if target >= total - self.weights[-1] / 2.0 else float(self.means[-1])
        pos = int(np.searchsorted(cum, target) - 1)
        span = cum[pos + 1] - cum[pos]
        frac = (target - cum[pos]) / span if span > 0 else 0.0
        return float(self.means[pos] + frac * (self.means[pos + 1] - self.means[pos]))

    def dumps(self) -> bytes:
        import struct

        self._compress()
        head = struct.pack("<idd i", self.compression, self._min, self._max,
                           self.means.size)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def loads(cls, blob: bytes) -> "TDigest":
        import struct

        head_size = struct.calcsize("<idd i")
        compression, lo, hi, n = struct.unpack("<idd i", blob[:head_size])
        digest = cls(compression)
        digest._min, digest._max = lo, hi
        digest.means = np.frombuffer(
            blob, np.float64, count=n, offset=head_size).copy()
        digest.weights = np.frombuffer(
            blob, np.float64, count=n, offset=head_size + 8 * n).copy()
        return digest


def tdigest_quantiles(ds, col: str, qs: list[float], compression: int = 200,
                      fanin: int = 64) -> dict[float, float]:
    """Approximate quantiles of a continuous column: one t-digest partial
    per block (O(compression) bytes), tree-merged like the HLL/CMS partials
    — the driver folds only the final fan-in."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        sketch = TDigest(compression)
        sketch.add_array(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sketch.dumps()], pa.binary())})

    def merge_batch(batch: pa.Table) -> pa.Table:
        merged_level = TDigest(compression)
        for blob in batch.column("sketch").to_pylist():
            merged_level.merge(TDigest.loads(blob))
        return pa.table({"sketch": pa.array([merged_level.dumps()], pa.binary())})

    merged = TDigest(compression)
    partials = ds.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    for row in _tree_reduce(partials, merge_batch, fanin=fanin):
        merged.merge(TDigest.loads(row["sketch"]))
    return {float(q): merged.quantile(q) for q in qs}
