"""Iterative graph computation over an edge Dataset: integer fixed-point
PageRank.

The classic 100-TB iteration shape — the rank table (one row per node) is a
Dataset that is re-derived each superstep by ONE distributed equijoin
(edges ⋈ ranks on the source node, via the engine ``hash_join``) and ONE
groupby over (dst, contribution) rows, then materialized (node-sized — the
thing a production job checkpoints between supersteps). Nothing
corpus-sized ever reaches the driver; per-superstep traffic is edge rows
carrying a single int64.

Determinism contract (what makes an ITERATIVE float algorithm fully
SQL-oracle-checkable): all arithmetic is int64 —

* total mass 10**12 "units", split evenly: r0 = 10**12 // N;
* r_{t+1}(v) = base + (85 * Σ_{u→v} (r_t(u) // od(u))) // 100
  with base = (15 * (10**12 // N)) // 100 and floor divisions throughout.

Integer sums commute, so the result is bit-identical across any shuffle
order / block layout, and a SQL engine restates the same expression
exactly. Dangling-node mass is dropped by design (this is a RANKING
contract, not a probability distribution) and damping is fixed at 85/100.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pagerank_units(edges_ds, n_iter: int = 2, src: str = "src",
                   dst: str = "dst"):
    """Fixed-point PageRank (see module docstring). Returns a Dataset of
    (node, rank_units) — int64 — for every node appearing as a source or
    destination of any edge. Null endpoints are rejected."""
    import ray
    from ray.data.aggregate import Sum

    from .joins import hash_join

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    unit = 10 ** 12

    # node set + out-degree via per-batch combiners: each batch emits one
    # (node, od_partial) row per distinct endpoint, so the groupby shuffles
    # node-sized partials, never edges
    def degree_partials(batch: pa.Table) -> pa.Table:
        if batch.column(src).null_count or batch.column(dst).null_count:
            raise ValueError("pagerank_units: null edge endpoint")
        s = batch.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        s_uniq, s_counts = np.unique(s, return_counts=True)
        d_uniq = np.unique(d)
        return pa.table({
            "node": pa.array(np.concatenate([s_uniq, d_uniq]), pa.int64()),
            "od_partial": pa.array(
                np.concatenate([s_counts.astype(np.int64),
                                np.zeros(len(d_uniq), np.int64)]),
                pa.int64()),
        })

    nodes = (
        edges_ds.select_columns([src, dst])
        .map_batches(degree_partials, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("od_partial", alias_name="od"))
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_units": pa.array([], pa.int64()),
        }))
    r0 = unit // n_nodes
    base = (15 * r0) // 100

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "od": batch.column("od"),
            "rank_units": pa.array(
                np.full(batch.num_rows, r0, np.int64), pa.int64()),
        })

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    # materialize: the (possibly expensive) upstream edge derivation would
    # otherwise re-execute once per superstep plus once for the degree pass
    edges_nodes = edges_ds.select_columns([src, dst]).map_batches(
        lambda b: pa.table({
            "node": b.column(src).cast(pa.int64()),
            "dst": b.column(dst).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    def zero_contribs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "dst": batch.column("node"),
            "contrib": pa.array(np.zeros(batch.num_rows, np.int64),
                                pa.int64()),
        })

    zeros = nodes.map_batches(zero_contribs, batch_format="pyarrow")

    for _ in range(n_iter):
        joined = hash_join(edges_nodes, ranks, key="node")

        def contribs(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "contrib": pa.array([], pa.int64())})
            r = batch.column("rank_units").to_numpy(zero_copy_only=False)
            od = batch.column("od").to_numpy(zero_copy_only=False)
            return pa.table({
                "dst": batch.column("dst"),
                "contrib": pa.array(r // od, pa.int64()),
            })

        summed = (
            joined.map_batches(contribs, batch_format="pyarrow")
            .union(zeros)  # every node present even with no in-edges
            .groupby("dst")
            .aggregate(Sum("contrib", alias_name="s"))
        )
        ranks_only = summed.map_batches(
            lambda b: pa.table({
                "node": b.column("dst"),
                "rank_units": pa.array(
                    base + (85 * b.column("s").to_numpy(
                        zero_copy_only=False)) // 100,
                    pa.int64()),
            }),
            batch_format="pyarrow",
        )
        # re-attach the static out-degree for the next superstep, then
        # materialize: the node-sized rank table is the superstep checkpoint
        ranks = hash_join(ranks_only, nodes, key="node").materialize()

    return ranks.select_columns(["node", "rank_units"])
