"""The sharded URL-seen set: exact first-wins membership at frontier scale.

Shard actors each hold a cuckoo filter (fast negative path) backed by an
exact set (truth — the north rule requires the seen set to MATCH the
reference scheduler exactly, so approximate membership alone would be wrong:
a false positive would silently drop a URL). A failed-URL set rides along —
the reference never re-fetches a URL that failed (convert.js:136,
retry.test.js:88-96).

Sharding is by ``stable_hash64(canon_url) % n_shards`` — a pure function of
the canonical URL, so any cluster size produces the same shard assignment and
the same final seen set. At 10^10 URLs: 64-bit-hash exact sets ≈ 80 GB
spread over shards; the cuckoo filter (~2 bytes/key) absorbs the negative
lookups that dominate a crawl.
"""

from __future__ import annotations

import pyarrow as pa

from .canon import stable_hash64
from .cuckoo import CuckooFilter


class SeenShard:
    """One shard's state — plain object; wrapped in a Ray actor below."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.exact: set[str] = set()
        self.failed: set[str] = set()
        self.filter = CuckooFilter(capacity)
        # Truth lives in self.exact. The cuckoo filter is ONLY a negative-path
        # accelerator, and only while every insert has succeeded: a failed
        # add() loses an evicted victim fingerprint, after which
        # might_contain() can false-negative for arbitrary keys — so the
        # first failed insert degrades the shard to exact-set-only probes.
        self.filter_ok = True

    def _probe(self, url: str) -> bool:
        """Seen-before test with the filter as a safe fast negative path."""
        if self.filter_ok and not self.filter.might_contain(url):
            return False
        return url in self.exact

    def check_and_add(self, urls: list[str]) -> list[bool]:
        """True per url when newly added (first-wins dedup)."""
        out = []
        for url in urls:
            if self._probe(url):
                out.append(False)
            else:
                self.exact.add(url)
                if self.filter_ok and not self.filter.add(url):
                    self.filter_ok = False
                out.append(True)
        return out

    # --- distributed-admit offer protocol (frontier/admit.py) ---
    def offer(self, table: pa.Table, tag) -> int:
        """Buffer a batch of wave candidates (zero per-row work here — all
        dedup is deferred to commit_offers, which makes re-offering the same
        rows from a Ray-retried task naturally idempotent: duplicates
        collapse in the commit's drop_duplicates). An offer carrying an
        OLDER tag than the current one (a zombie retry of a prior wave,
        possible on a real cluster after a false-dead node rejoins) is
        dropped — it must not reset the buffer holding the current wave."""
        current = getattr(self, "_offer_tag", None)
        if current is not None and tag != current:
            try:
                if tag < current:
                    return 0  # stale wave's zombie task: ignore outright
            except TypeError:
                pass  # unordered tags fall back to reset-on-change
        if tag != current:
            self._offer_tag = tag
            self._offer_tables: list[pa.Table] = []
        self._offer_tables.append(table)
        return table.num_rows

    def commit_offers(self, tag) -> pa.Table | None:
        """First-wins resolution, vectorized: min-(parent_index, ordinal)
        per url (stable sort + drop_duplicates — the row the sequential
        loop keeps), already-seen urls rejected in one isin, winners enter
        the exact set. Clears the buffer — memory stays one-wave-bounded."""
        if tag != getattr(self, "_offer_tag", None) or not getattr(self, "_offer_tables", None):
            return None
        combined = pa.concat_tables(self._offer_tables)
        self._offer_tables = []
        frame = combined.to_pandas()
        frame = frame.sort_values(["parent_index", "ordinal"], kind="stable")
        frame = frame.drop_duplicates("canon_url", keep="first")
        # O(wave) set probes — NOT Series.isin(self.exact), which would
        # materialize the shard's entire seen set per wave (O(total_seen))
        import numpy as np

        seen_mask = np.fromiter(
            (url in self.exact for url in frame["canon_url"].values),
            dtype=bool, count=len(frame),
        )
        fresh = frame[~seen_mask]
        if not len(fresh):
            return None
        urls = fresh["canon_url"].tolist()
        self.exact.update(urls)
        if self.filter_ok:
            for url in urls:
                if not self.filter.add(url):
                    self.filter_ok = False
                    break
        from .admit import CANDIDATE_SCHEMA

        return pa.Table.from_pandas(fresh, schema=CANDIDATE_SCHEMA,
                                    preserve_index=False)

    def contains(self, urls: list[str]) -> list[bool]:
        return [self._probe(u) for u in urls]

    def count_urls(self) -> int:
        """Seen-URL count excluding the "content:" mirror-registry keys —
        O(shard) in the shard process, never materialized on the driver."""
        return sum(1 for url in self.exact if not url.startswith("content:"))

    def add_failed(self, urls: list[str]) -> None:
        self.failed.update(urls)

    def filter_failed(self, urls: list[str]) -> list[bool]:
        """True per url when NOT in the failed set (safe to fetch)."""
        return [u not in self.failed for u in urls]

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "seen": len(self.exact),
            "failed": len(self.failed),
            "filter_count": self.filter.count,
            "filter_ok": self.filter_ok,
        }

    # --- checkpointing ---
    def snapshot(self) -> pa.Table:
        seen = sorted(self.exact)
        failed_sorted = sorted(self.failed)
        return pa.table(
            {
                "url": pa.array(seen + failed_sorted, pa.string()),
                "failed": pa.array([False] * len(seen) + [True] * len(failed_sorted), pa.bool_()),
            }
        )

    def restore(self, table: pa.Table) -> None:
        self.exact = set()
        self.failed = set()
        # 2x headroom: re-adding at load factor ~1 would fail immediately
        self.filter = CuckooFilter(max(2 * len(table), 1 << 10))
        self.filter_ok = True
        for url, failed in zip(table.column("url").to_pylist(), table.column("failed").to_pylist()):
            if failed:
                self.failed.add(url)
            else:
                self.exact.add(url)
                if self.filter_ok and not self.filter.add(url):
                    self.filter_ok = False


def _shard_actor_class():
    import ray

    @ray.remote(num_cpus=0.1)
    class SeenShardActor(SeenShard):
        pass

    return SeenShardActor


class ShardedSeenSet:
    """Driver-side facade over the shard actors: batch routing by
    hash(canon_url) % n_shards, order-preserving reassembly."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 16):
        actor_class = _shard_actor_class()
        self.n_shards = n_shards
        self.shards = [
            actor_class.remote(shard_id, capacity_per_shard) for shard_id in range(n_shards)
        ]

    def _route(self, urls: list[str]) -> list[list[tuple[int, str]]]:
        routed: list[list[tuple[int, str]]] = [[] for _ in range(self.n_shards)]
        for index, url in enumerate(urls):
            routed[stable_hash64(url) % self.n_shards].append((index, url))
        return routed

    def _fan_out(self, urls: list[str], method: str) -> list[bool]:
        import ray

        routed = self._route(urls)
        futures = []
        for shard, entries in enumerate(routed):
            if entries:
                futures.append(
                    (entries,
                     getattr(self.shards[shard], method).remote(
                         [u for _, u in entries]))
                )
        out = [False] * len(urls)
        # ONE ray.get over every shard future — a per-shard get would wait
        # for each shard serially and the slowest-shard latency would stack
        results = ray.get([future for _, future in futures])
        for (entries, _), values in zip(futures, results):
            for (index, _), value in zip(entries, values):
                out[index] = value
        return out

    def check_and_add(self, urls: list[str]) -> list[bool]:
        return self._fan_out(urls, "check_and_add")

    def contains(self, urls: list[str]) -> list[bool]:
        return self._fan_out(urls, "contains")

    def filter_failed(self, urls: list[str]) -> list[bool]:
        return self._fan_out(urls, "filter_failed")

    def add_failed(self, urls: list[str]) -> None:
        import ray

        routed = self._route(urls)
        ray.get(
            [
                self.shards[shard].add_failed.remote([u for _, u in entries])
                for shard, entries in enumerate(routed)
                if entries
            ]
        )

    def stats(self) -> list[dict]:
        import ray

        return ray.get([shard.stats.remote() for shard in self.shards])

    def snapshot_tables(self) -> list[pa.Table]:
        import ray

        return ray.get([shard.snapshot.remote() for shard in self.shards])

    def restore_tables(self, tables: list[pa.Table]) -> None:
        import ray

        assert len(tables) == self.n_shards
        ray.get(
            [shard.restore.remote(table) for shard, table in zip(self.shards, tables)]
        )

    def total_seen(self) -> int:
        return sum(s["seen"] for s in self.stats())

    def total_urls(self) -> int:
        """Count of seen URLs (content-hash registry keys excluded),
        computed shard-side — the scale-safe summary counter."""
        import ray

        return sum(ray.get([shard.count_urls.remote() for shard in self.shards]))

    def all_seen_urls(self) -> set[str]:
        """Test/checkpoint helper — the full exact set (small scales only)."""
        out: set[str] = set()
        for table in self.snapshot_tables():
            for url, failed in zip(table.column("url").to_pylist(),
                                   table.column("failed").to_pylist()):
                if not failed:
                    out.add(url)
        return out
