"""Per-host politeness: a token-bucket gate shared by every fetch worker.

One actor (shardable by host_hash at cluster scale) serializes requests per
host and enforces a minimum inter-request gap. Workers call
``acquire(host)`` before fetching and ``release(host)`` after — a host is
never fetched by two workers at once, whatever block/actor boundary its URLs
landed on (the skew problem in SURVEY.md §4: hot hosts are irreducible
stragglers; the scheduler's wave budget caps them instead).
"""

from __future__ import annotations

import collections
import threading
import time


class HostGate:
    """Plain object (wrapped in a Ray actor below): per-host lock + min-gap.

    Grants are LEASES (``lease_s``, default 120 s): a fetch worker that dies
    between acquire and release — OOM-killed actor, lost node — would
    otherwise hold its host busy forever and every later acquire() would
    poll for eternity. A lease past its expiry is stolen by the next
    acquirer; 120 s comfortably exceeds any single fetch (transport timeout
    is 30 s × retries)."""

    def __init__(self, min_gap_ms: float = 0.0, clock=None, lease_s: float = 120.0):
        self.min_gap_s = min_gap_ms / 1000.0
        self.lease_s = lease_s
        self.clock = clock or time.monotonic
        self.lock = threading.Lock()
        self.busy: dict[str, float] = {}  # host -> grant time (lease start)
        self.last_release: dict[str, float] = {}
        self.grants: collections.defaultdict[str, int] = collections.defaultdict(int)

    def try_acquire(self, host: str) -> float:
        """0 → granted; >0 → retry after that many seconds."""
        with self.lock:
            now = self.clock()
            granted_at = self.busy.get(host)
            if granted_at is not None and now - granted_at < self.lease_s:
                return max(self.min_gap_s, 0.001)
            # free, or the holder's lease expired (dead worker) — steal
            wait = self.last_release.get(host, -1e18) + self.min_gap_s - now
            if wait > 0:
                return wait
            self.busy[host] = now
            self.grants[host] += 1
            return 0.0

    def release(self, host: str) -> None:
        with self.lock:
            self.busy.pop(host, None)
            self.last_release[host] = self.clock()

    def stats(self) -> dict:
        with self.lock:
            return dict(self.grants)


def make_gate_actor(min_gap_ms: float = 0.0):
    return make_gate_actors(1, min_gap_ms)


def make_gate_actors(n_shards: int, min_gap_ms: float = 0.0) -> list:
    """Gate actors sharded by host hash: per-host state is independent, so
    sharding is exact — and a single gate actor would be the cluster-wide
    RPC bottleneck at 10^10-URL scale."""
    import ray

    @ray.remote(num_cpus=0)
    class HostGateActor(HostGate):
        pass

    return [HostGateActor.remote(min_gap_ms) for _ in range(max(1, n_shards))]


class GateClient:
    """Worker-side blocking wrapper over the gate shard(s); a host always
    routes to the same shard (stable hash)."""

    def __init__(self, gate_handles, poll_cap_s: float = 0.05):
        self.gates = gate_handles if isinstance(gate_handles, list) else [gate_handles]
        self.poll_cap_s = poll_cap_s

    def _gate(self, host: str):
        if len(self.gates) == 1:
            return self.gates[0]
        from .canon import stable_hash64

        return self.gates[stable_hash64(host) % len(self.gates)]

    def acquire(self, host: str) -> None:
        import ray

        gate = self._gate(host)
        while True:
            wait = ray.get(gate.try_acquire.remote(host))
            if wait <= 0:
                return
            time.sleep(min(wait, self.poll_cap_s))

    def release(self, host: str) -> None:
        self._gate(host).release.remote(host)
