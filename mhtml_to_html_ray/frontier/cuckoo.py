"""Cuckoo filter: the approximate-membership sketch fronting the exact
URL-seen set (BASELINE.json north_star; cuckoo-filter literature per
PAPERS.md — partial-key cuckoo hashing, 4-slot buckets, 16-bit fingerprints
≈ 18 bits/key at 95% load).

The filter is a NEGATIVE-path accelerator only: "not in filter" proves a URL
is new without touching the exact set; "maybe in filter" falls through to the
exact set (SURVEY.md §7 hard part 5 — a false positive must never drop a
URL). Deletion is supported (cuckoo's advantage over Bloom) for retired
frontier entries.
"""

from __future__ import annotations

import numpy as np

from .canon import stable_hash64

_EMPTY = 0  # fingerprints are forced non-zero so 0 marks a free slot


class CuckooFilter:
    __slots__ = ("n_buckets", "slots", "table", "max_kicks", "count", "_rng")

    def __init__(self, capacity: int, slots_per_bucket: int = 4, max_kicks: int = 500,
                 seed: int = 42):
        n_buckets = 1
        while n_buckets * slots_per_bucket < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.slots = slots_per_bucket
        self.table = np.zeros((n_buckets, slots_per_bucket), dtype=np.uint16)
        self.max_kicks = max_kicks
        self.count = 0
        self._rng = np.random.RandomState(seed)

    def _fingerprint_and_bucket(self, key: str) -> tuple[int, int]:
        h = stable_hash64(key)
        fingerprint = (h & 0xFFFF) or 1  # never 0
        bucket = (h >> 16) & (self.n_buckets - 1)
        return fingerprint, bucket

    def _alt_bucket(self, bucket: int, fingerprint: int) -> int:
        # partial-key cuckoo hashing: alt = bucket XOR hash(fingerprint)
        return (bucket ^ stable_hash64(str(fingerprint))) & (self.n_buckets - 1)

    def add(self, key: str) -> bool:
        fingerprint, bucket = self._fingerprint_and_bucket(key)
        for candidate in (bucket, self._alt_bucket(bucket, fingerprint)):
            row = self.table[candidate]
            free = np.nonzero(row == _EMPTY)[0]
            if len(free):
                row[free[0]] = fingerprint
                self.count += 1
                return True
        # evict: random walk up to max_kicks
        current = bucket
        fp = fingerprint
        for _ in range(self.max_kicks):
            slot = self._rng.randint(self.slots)
            fp, self.table[current][slot] = int(self.table[current][slot]), fp
            current = self._alt_bucket(current, fp)
            row = self.table[current]
            free = np.nonzero(row == _EMPTY)[0]
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        return False  # table over capacity — caller's exact set still holds truth

    def might_contain(self, key: str) -> bool:
        fingerprint, bucket = self._fingerprint_and_bucket(key)
        if fingerprint in self.table[bucket]:
            return True
        return fingerprint in self.table[self._alt_bucket(bucket, fingerprint)]

    def remove(self, key: str) -> bool:
        fingerprint, bucket = self._fingerprint_and_bucket(key)
        for candidate in (bucket, self._alt_bucket(bucket, fingerprint)):
            row = self.table[candidate]
            hits = np.nonzero(row == fingerprint)[0]
            if len(hits):
                row[hits[0]] = _EMPTY
                self.count -= 1
                return True
        return False

    # --- checkpointing ---
    def dump(self) -> dict:
        return {
            "table": self.table.copy(),
            "count": self.count,
            "slots": self.slots,
            "max_kicks": self.max_kicks,
        }

    @classmethod
    def load(cls, state: dict) -> "CuckooFilter":
        table = state["table"]
        instance = cls(capacity=table.size, slots_per_bucket=state["slots"],
                       max_kicks=state["max_kicks"])
        instance.table = table.copy()
        instance.n_buckets = table.shape[0]
        instance.count = state["count"]
        return instance
