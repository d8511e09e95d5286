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


def hits_units(edges_ds, n_iter: int = 2, src: str = "src",
               dst: str = "dst"):
    """Integer fixed-point HITS (Kleinberg 1999) hubs-and-authorities over
    an edge Dataset, under the same determinism contract as
    :func:`pagerank_units` — all arithmetic is exact integers, so the
    iterative result is bit-identical across any shuffle order and a SQL
    engine restates it verbatim.

    Per full iteration t (classic HITS with sum-normalization instead of
    L2, which keeps the arithmetic integral):

    * a_t(v)  = Σ_{u→v} h_{t-1}(u)           (authority from hub mass)
    * a'_t    = (a_t * T) // Σ_v a_t(v)      (rescale to total mass T)
    * h_t(u)  = Σ_{u→v} a'_t(v)              (hub from authority mass)
    * h'_t    = (h_t * T) // Σ_u h_t(u)

    with T = 10**12 and h'_0 = T // N for every node. Parallel edges count
    with multiplicity (a multigraph contract, same as the reference
    scheduler counting repeated links per wave). The a*T products exceed
    int64, so the node-sized rescale step runs in Python big-int space
    (the oracle's CAST(.. AS HUGEINT) is the same widening); everything
    edge-sized stays int64 numpy.

    Each superstep is two distributed equijoins (edges ⋈ scores) + two
    node-keyed groupbys; the only driver-resident values are the two scalar
    mass sums per iteration. Returns a Dataset of
    (node, auth_units, hub_units), one row per endpoint node.
    """
    import ray
    from ray.data.aggregate import Sum

    from .joins import hash_join

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    unit = 10 ** 12

    def normalize_edges(batch: pa.Table) -> pa.Table:
        if batch.column(src).null_count or batch.column(dst).null_count:
            raise ValueError("hits_units: null edge endpoint")
        return pa.table({
            "src": batch.column(src).cast(pa.int64()),
            "dst": batch.column(dst).cast(pa.int64()),
        })

    # materialized once: re-read every superstep (2 joins each)
    edges = (
        edges_ds.select_columns([src, dst])
        .map_batches(normalize_edges, batch_format="pyarrow")
        .materialize()
    )

    def endpoint_nodes(batch: pa.Table) -> pa.Table:
        both = np.unique(np.concatenate([
            batch.column("src").to_numpy(zero_copy_only=False),
            batch.column("dst").to_numpy(zero_copy_only=False),
        ]))
        return pa.table({"node": pa.array(both, pa.int64()),
                         "one": pa.array(np.zeros(len(both), np.int64))})

    nodes = (
        edges.map_batches(endpoint_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("one", alias_name="_z"))
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "auth_units": pa.array([], pa.int64()),
                          "hub_units": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty)
    h0 = unit // n_nodes

    def init_hubs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "score": pa.array(np.full(batch.num_rows, h0, np.int64)),
        })

    # pin the superstep block count (see _pagerank_core for the rationale)
    rows_per_block = 1_000_000
    target_blocks = max(1, min(nodes.num_blocks(), -(-n_nodes // rows_per_block)))

    hubs = (nodes.map_batches(init_hubs, batch_format="pyarrow")
            .repartition(target_blocks).materialize())

    def zero_scores(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "raw": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    zeros = nodes.map_batches(zero_scores, batch_format="pyarrow")

    def propagate(score_ds, edge_key: str, out_key: str):
        """Σ over edges of the neighbor's score: join edges to scores on
        ``edge_key``, group the carried score by ``out_key``. Every node
        appears via the zeros union (no-in-edge nodes score 0)."""
        joined = hash_join(
            edges.map_batches(
                lambda b: pa.table({"node": b.column(edge_key),
                                    "peer": b.column(out_key)}),
                batch_format="pyarrow"),
            score_ds, key="node")

        def carried(batch: pa.Table) -> pa.Table:
            if batch.num_columns == 0 or batch.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "raw": pa.array([], pa.int64())})
            return pa.table({"node": batch.column("peer"),
                             "raw": batch.column("score")})

        return (
            joined.map_batches(carried, batch_format="pyarrow")
            .union(zeros)
            .groupby("node")
            .aggregate(Sum("raw", alias_name="raw"))
        )

    def rescale(raw_ds):
        """(raw * T) // Σraw per node. Python big-int per row — the table
        is node-sized and the product exceeds int64 by design."""
        total = raw_ds.sum("raw")
        if not total:
            # degenerate all-zero mass (no edges contributed)
            return raw_ds.map_batches(
                lambda b: pa.table({"node": b.column("node"),
                                    "score": b.column("raw")}),
                batch_format="pyarrow").repartition(target_blocks).materialize()

        def scale(batch: pa.Table) -> pa.Table:
            raws = batch.column("raw").to_pylist()
            return pa.table({
                "node": batch.column("node"),
                "score": pa.array([(r * unit) // total for r in raws],
                                  pa.int64()),
            })

        return (raw_ds.map_batches(scale, batch_format="pyarrow")
                .repartition(target_blocks).materialize())

    auths = None
    for _ in range(n_iter):
        auths = rescale(propagate(hubs, "src", "dst"))
        hubs = rescale(propagate(auths, "dst", "src"))

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "auth_units": pa.array([], pa.int64()),
                             "hub_units": pa.array([], pa.int64())})
        return pa.table({
            "node": batch.column("node"),
            "auth_units": batch.column("score"),
            "hub_units": batch.column("score_hub"),
        })

    paired = hash_join(
        auths,
        hubs.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "score_hub": b.column("score")}),
            batch_format="pyarrow"),
        key="node")
    return paired.map_batches(merge, batch_format="pyarrow")


def _pagerank_core(edges_ds, n_iter, src, dst, init_units, fold_base,
                   err_prefix):
    """Shared fixed-point PageRank superstep machinery (uniform and
    personalized variants differ ONLY in the restart arithmetic):

    * ``init_units(node_array, n_nodes) -> int64 array`` — rank at t=0;
    * ``fold_base(node_array, n_nodes) -> int64 array`` — the per-node
      restart term added as ``base + (85 * Σ contribs) // 100``.

    One hash_join + one groupby per superstep; the node-sized rank table is
    materialized between supersteps (the production checkpoint unit).
    """
    import ray
    from ray.data.aggregate import Sum

    from .joins import hash_join

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    # node set + out-degree via per-batch combiners: each batch emits one
    # (node, od_partial) row per distinct endpoint, so the groupby shuffles
    # node-sized partials, never edges
    def degree_partials(batch: pa.Table) -> pa.Table:
        if batch.column(src).null_count or batch.column(dst).null_count:
            raise ValueError(f"{err_prefix}: null edge endpoint")
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

    def init_ranks(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch.column("node"),
            "od": batch.column("od"),
            "rank_units": pa.array(init_units(node, n_nodes), pa.int64()),
        })

    # Pin the superstep block count, data-proportionally: union() and the
    # join/groupby ops emit one block per input block, so the node-sized
    # rank table's block count otherwise COMPOUNDS across supersteps and
    # per-block fixed costs dominate (round-5 profile: 5 supersteps over
    # 2k edges took 57 s before pinning, ~3 s after).
    rows_per_block = 1_000_000
    target_blocks = max(1, min(nodes.num_blocks(), -(-n_nodes // rows_per_block)))

    ranks = (nodes.map_batches(init_ranks, batch_format="pyarrow")
             .repartition(target_blocks).materialize())

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

        def fold(batch: pa.Table) -> pa.Table:
            node = batch.column("dst").to_numpy(zero_copy_only=False)
            s = batch.column("s").to_numpy(zero_copy_only=False)
            base = fold_base(node, n_nodes)
            return pa.table({
                "node": batch.column("dst"),
                "rank_units": pa.array(base + (85 * s) // 100, pa.int64()),
            })

        ranks_only = summed.map_batches(fold, batch_format="pyarrow")
        # re-attach the static out-degree for the next superstep, then
        # materialize: the node-sized rank table is the superstep checkpoint
        ranks = (hash_join(ranks_only, nodes, key="node")
                 .repartition(target_blocks).materialize())

    return ranks.select_columns(["node", "rank_units"])


def pagerank_units(edges_ds, n_iter: int = 2, src: str = "src",
                   dst: str = "dst"):
    """Fixed-point PageRank (see module docstring). Returns a Dataset of
    (node, rank_units) — int64 — for every node appearing as a source or
    destination of any edge. Null endpoints are rejected.

    Arithmetic (unchanged from the oracled contract): r0 = 10**12 // N
    everywhere, base = (15 * r0) // 100 everywhere."""
    unit = 10 ** 12

    def init_units(node, n_nodes):
        return np.full(len(node), unit // n_nodes, np.int64)

    def fold_base(node, n_nodes):
        return np.full(len(node), (15 * (unit // n_nodes)) // 100, np.int64)

    return _pagerank_core(edges_ds, n_iter, src, dst, init_units, fold_base,
                          err_prefix="pagerank_units")


def personalized_pagerank_units(edges_ds, seeds, n_iter: int = 2,
                                src: str = "src", dst: str = "dst"):
    """Personalized PageRank under the same integer fixed-point contract as
    :func:`pagerank_units`, with the restart mass concentrated on ``seeds``
    instead of spread uniformly — the host-reputation / trust-propagation
    operator (seed a handful of known-good nodes, rank everything by
    random-walk-with-restart proximity to them).

    Arithmetic (all int64, SQL-restatable exactly):

    * r0 = 10**12 // n_seeds; r_init(v) = r0 if v ∈ seeds else 0
    * base(v) = (15 * r0) // 100 if v ∈ seeds else 0
    * r_{t+1}(v) = base(v) + (85 * Σ_{u→v} (r_t(u) // od(u))) // 100

    ``seeds`` is a small Python iterable of node ids (trust lists are small
    by nature) — broadcast inside closures, never a shuffle side. Shares
    the superstep machinery with pagerank_units via _pagerank_core; only
    the two restart callbacks differ."""
    seed_list = sorted({int(s) for s in seeds})
    if not seed_list:
        raise ValueError("personalized_pagerank_units: empty seed set")
    unit = 10 ** 12
    r0 = unit // len(seed_list)
    seed_base = (15 * r0) // 100
    seed_arr = np.asarray(seed_list, dtype=np.int64)

    def init_units(node, n_nodes):
        return np.where(np.isin(node, seed_arr), np.int64(r0), np.int64(0))

    def fold_base(node, n_nodes):
        return np.where(np.isin(node, seed_arr), np.int64(seed_base),
                        np.int64(0))

    return _pagerank_core(edges_ds, n_iter, src, dst, init_units, fold_base,
                          err_prefix="personalized_pagerank_units")
