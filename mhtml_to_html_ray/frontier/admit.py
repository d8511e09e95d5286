"""Distributed wave admission — the last driver-side O(discoveries) term.

The admit phase (enumerate each fetched page's discovered links, first-wins
dedup within the wave, membership-check against the sharded seen set, assign
the deterministic discovery_index) ran as a driver Python loop over every
discovery — at 100k pages × ~50 links that is ~5M serial dict ops per wave,
the crawl path's remaining Amdahl term (VERDICT r2 item 1).

Physical plan (NO shuffle — the seen shards already ARE a hash partitioning
of url space, so they double as the dedup reducers):

  results (5 narrow columns, parent-filtered on the driver, vectorized)
    → map_batches(enumerate children + priority + host_hash; each task
      routes its candidates straight to the owning shard actors — the
      q_url_seen_antijoin worker→actor pattern)                 [parallel]
    → SeenShard.offer(): BUFFER the candidate rows (no per-row work —
      stale-tag zombies dropped)                                [parallel]
    → SeenShard.commit_offers(): per-url min-(parent_index, ordinal)
      MIN-REDUCE in one vectorized pass (Ray-retried tasks re-offering the
      same rows are naturally idempotent), already-seen urls rejected by
      O(wave) exact-set probes; winners enter the exact set and return to
      the driver as Arrow — ADMITTED rows only, not the discovery stream
    → driver sorts by (parent_index, ordinal) and assigns
      discovery_index = base + arange                           [vectorized]

The result is bit-identical to the sequential loop: the dedup winner, the
membership outcome, the priority floats and the index sequence are all pure
functions of the same inputs. Equivalence is pinned by
tests/test_frontier.py::test_admit_distributed_matches_driver (memory and
parquet stores) plus the parallelism-invariance and reference-fetch-order
suites.

An earlier draft ran dedup as a hash-bucket groupby().map_groups — correct,
but the per-wave sort shuffle cost ~7 s/wave at 100k-url budgets on this
box; the shard min-reduce needs only one map_batches job per wave.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.schemas import FRONTIER_SCHEMA

_NARROW = ["depth", "discovery_index", "canon_url", "discovered", "discovered_canon"]

# FRONTIER_SCHEMA columns + the wave-local dedup/sort key
CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("parent_url", pa.string()),
        ("parent_index", pa.int64()),
        ("ordinal", pa.int64()),
    ]
)


def distributed_admit(
    results_table: pa.Table,
    seen,
    host_stats: dict[str, dict],
    expand: dict[int, bool],
    config,
    wave: int,
    base_index: int,
    tag=None,
) -> pa.Table:
    """Returns the admitted frontier rows (FRONTIER_SCHEMA, discovery_index
    assigned, index-sorted) for ``store.add_table``.

    ``seen`` is the ShardedSeenSet facade — its actor handles serialize into
    the worker tasks, so candidate traffic goes worker→shard without a
    driver round trip. ``expand`` is the content-dedup gate (parent ids that
    must NOT expand map to False)."""
    import ray
    import ray.data

    narrow = results_table.select(_NARROW)
    # parent-level gates, vectorized on the (wave-bounded) driver table:
    # depth cap + the content-mirror expand gate
    depth_ok = pc.less_equal(pc.add(narrow.column("depth"), 1), config.max_depth)
    narrow = narrow.filter(depth_ok)
    blocked = [parent for parent, keep in expand.items() if not keep]
    if blocked:
        narrow = narrow.filter(
            pc.invert(
                pc.is_in(
                    narrow.column("discovery_index"),
                    value_set=pa.array(blocked, pa.int64()),
                )
            )
        )
    if narrow.num_rows == 0:
        return _empty_frontier()

    ok_rate_ref = ray.put(
        {host: stats["ok_rate"] for host, stats in host_stats.items()}
    )
    depth_penalty = config.depth_penalty
    if tag is None:
        tag = wave  # offer() min-reduce key: retries of this wave's tasks merge
    shards = seen.shards
    n_shards = seen.n_shards

    # slice into blocks driver-side (zero-copy) so the enumerate stage
    # parallelizes even though the wave arrived as one Arrow table
    n_chunks = max(1, min(64, narrow.num_rows // 256 or 1))
    step = -(-narrow.num_rows // n_chunks)
    chunks = [narrow.slice(i, step) for i in range(0, narrow.num_rows, step)]
    ds = ray.data.from_arrow(chunks)

    from .canon import stable_hash64

    def enumerate_and_offer(batch: pa.Table) -> pa.Table:
        """Vectorized child enumeration: flatten the list columns with
        pyarrow kernels, derive (parent_index, ordinal, depth, priority,
        host_hash) as array ops; the only per-row Python left is the
        blake2b shard routing + one hash per UNIQUE host."""
        import pandas as pd

        if batch.num_rows == 0 or pc.sum(
            pc.list_value_length(batch.column("discovered"))
        ).as_py() in (0, None):
            return pa.table({"n": pa.array([0], pa.int64())})
        ok_rate = ray.get(ok_rate_ref)
        batch = batch.combine_chunks()
        lists = batch.column("discovered").chunk(0)
        parent_pos = pc.list_parent_indices(lists).to_numpy()
        flat_url = pc.list_flatten(lists)
        canon_struct = pc.list_flatten(batch.column("discovered_canon").chunk(0))
        # ordinal = position within the parent's list, COUNTING null canons
        # (the sequential loop's enumerate() does too)
        offsets = lists.offsets.to_numpy()
        ordinal = np.arange(len(parent_pos), dtype=np.int64) - offsets[parent_pos]
        valid = pc.is_valid(canon_struct).to_numpy(zero_copy_only=False)
        if not valid.all():
            keep = np.flatnonzero(valid)
            parent_pos, ordinal = parent_pos[keep], ordinal[keep]
            keep_arr = pa.array(keep)
            flat_url = flat_url.take(keep_arr)
            canon_struct = canon_struct.take(keep_arr)
        canon_url = canon_struct.field("canon_url")
        host = canon_struct.field("host")
        depth_child = batch.column("depth").to_numpy()[parent_pos].astype(np.int32) + 1
        parent_index = batch.column("discovery_index").to_numpy()[parent_pos]
        parent_canon = batch.column("canon_url").take(pa.array(parent_pos))
        # per-UNIQUE-host rate lookup + hash (hosts repeat heavily)
        codes, uniques = pd.factorize(host.to_pandas())
        rate_u = np.array([ok_rate.get(u, 1.0) for u in uniques], dtype=np.float64)
        hash_u = np.array([stable_hash64(u) for u in uniques], dtype=np.uint64)
        priority = rate_u[codes] - depth_penalty * depth_child
        host_hash = hash_u[codes]
        candidates = pa.table(
            {
                "url": flat_url,
                "canon_url": canon_url,
                "host": host,
                "host_hash": pa.array(host_hash, pa.uint64()),
                "depth": pa.array(depth_child, pa.int32()),
                "priority": pa.array(priority, pa.float64()),
                "parent_url": parent_canon,
                "parent_index": pa.array(parent_index, pa.int64()),
                "ordinal": pa.array(ordinal, pa.int64()),
            }
        )
        # within-batch first-wins dedup BEFORE routing: flatten order is
        # already (parent_pos asc, ordinal asc) — chunks preserve the
        # results table's discovery_index sort — so keep="first" selects
        # the min key. Duplicate-heavy waves (the common crawl case) route
        # and hash far fewer rows; cross-batch duplicates still collapse in
        # the shard's commit.
        first = np.unique(
            pd.factorize(candidates.column("canon_url").to_pandas())[0],
            return_index=True,
        )[1]
        if len(first) < candidates.num_rows:
            first.sort()
            candidates = candidates.take(pa.array(first))
        shard_of = np.fromiter(
            (stable_hash64(u) % n_shards for u in candidates.column("canon_url").to_pylist()),
            dtype=np.int64, count=candidates.num_rows,
        )
        futures = []
        for shard_index in range(n_shards):
            mask = shard_of == shard_index
            if not mask.any():
                continue
            sub = candidates.take(pa.array(np.flatnonzero(mask)))
            futures.append(shards[shard_index].offer.remote(sub, tag))
        ray.get(futures)  # the task completes only once its offers landed
        return pa.table({"n": pa.array([candidates.num_rows], pa.int64())})

    # one map_batches job per wave: no shuffle, the shards are the reducers
    ds.map_batches(enumerate_and_offer, batch_format="pyarrow").count()

    committed = ray.get([shard.commit_offers.remote(tag) for shard in shards])
    parts = [t for t in committed if t is not None and t.num_rows]
    if not parts:
        return _empty_frontier()
    admitted = pa.concat_tables(parts).combine_chunks()
    admitted = admitted.sort_by(
        [("parent_index", "ascending"), ("ordinal", "ascending")]
    )
    n = admitted.num_rows
    return pa.table(
        {
            "url": admitted.column("url"),
            "canon_url": admitted.column("canon_url"),
            "host": admitted.column("host"),
            "host_hash": admitted.column("host_hash"),
            "depth": admitted.column("depth"),
            "priority": admitted.column("priority"),
            "discovered_ts": pa.array(np.full(n, base_index), pa.int64()),
            "wave": pa.array(np.full(n, wave + 1, dtype=np.int32), pa.int32()),
            "parent_url": admitted.column("parent_url"),
            "discovery_index": pa.array(base_index + np.arange(n), pa.int64()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _empty_frontier() -> pa.Table:
    return pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
