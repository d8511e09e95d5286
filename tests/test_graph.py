"""Integer fixed-point PageRank (functions/graph.py): the iterative
hash_join + groupby superstep loop, pinned against a single-process
reference of the same int64 contract."""

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import graph


def _edges_ds(ray, pairs, parts=1):
    t = pa.table({
        "src": pa.array([a for a, _ in pairs], pa.int64()),
        "dst": pa.array([b for _, b in pairs], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _reference(pairs, n_iter):
    """The same integer contract, plain Python dicts."""
    unit = 10 ** 12
    od: dict = {}
    nodes = set()
    for a, b in pairs:
        od[a] = od.get(a, 0) + 1
        nodes.update((a, b))
    n = len(nodes)
    r0 = unit // n
    base = (15 * r0) // 100
    ranks = {v: r0 for v in nodes}
    for _ in range(n_iter):
        sums = {v: 0 for v in nodes}
        for a, b in pairs:
            sums[b] += ranks[a] // od[a]
        ranks = {v: base + (85 * s) // 100 for v, s in sums.items()}
    return ranks


PAIRS = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2)]  # multi-edge, dangling-free except 4←nothing


def test_pagerank_matches_reference(ray_session):
    import ray

    got = {r["node"]: r["rank_units"]
           for r in graph.pagerank_units(_edges_ds(ray, PAIRS), n_iter=3).take_all()}
    assert got == _reference(PAIRS, 3)


def test_pagerank_layout_independent_bit_exact(ray_session):
    import ray

    rng = np.random.default_rng(2)
    pairs = [(int(a), int(100 + b)) for a, b in
             zip(rng.integers(0, 40, 500), rng.integers(0, 25, 500))]
    a = sorted(graph.pagerank_units(_edges_ds(ray, pairs), n_iter=2).take_all(),
               key=lambda r: r["node"])
    b = sorted(graph.pagerank_units(_edges_ds(ray, pairs, parts=9), n_iter=2).take_all(),
               key=lambda r: r["node"])
    assert a == b
    assert a == sorted(({"node": k, "rank_units": v}
                        for k, v in _reference(pairs, 2).items()),
                       key=lambda r: r["node"])


def test_pagerank_sink_only_node_gets_base_plus_inflow(ray_session):
    import ray

    # node 9 has no out-edges (dangling sink): present in output, receives
    # in-flow; node 1's rank after iter 1 is pure base (no in-edges)
    out = {r["node"]: r["rank_units"]
           for r in graph.pagerank_units(_edges_ds(ray, [(1, 9)]), n_iter=1).take_all()}
    unit = 10 ** 12
    r0 = unit // 2
    base = (15 * r0) // 100
    assert out[1] == base
    assert out[9] == base + (85 * (r0 // 1)) // 100


def test_pagerank_null_endpoint_raises(ray_session):
    import ray

    t = pa.table({"src": pa.array([1, None], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    with pytest.raises(Exception, match="null edge endpoint"):
        graph.pagerank_units(ray.data.from_arrow(t)).take_all()


def test_pagerank_validates_n_iter(ray_session):
    import ray

    with pytest.raises(ValueError, match="n_iter"):
        graph.pagerank_units(_edges_ds(ray, PAIRS), n_iter=0)


def test_pagerank_empty_edges(ray_session):
    import ray

    out = graph.pagerank_units(_edges_ds(ray, []), n_iter=2)
    assert out.take_all() == []
