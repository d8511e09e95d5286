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


def _hits_reference(pairs, n_iter):
    """Single-process restatement of the hits_units integer contract."""
    unit = 10 ** 12
    nodes = set()
    for a, b in pairs:
        nodes.update((a, b))
    hubs = {v: unit // len(nodes) for v in nodes}

    def prop(score, forward):
        out = {v: 0 for v in nodes}
        for a, b in pairs:
            if forward:
                out[b] += score[a]
            else:
                out[a] += score[b]
        return out

    def rescale(raw):
        s = sum(raw.values())
        return dict(raw) if not s else {v: (r * unit) // s
                                        for v, r in raw.items()}

    auths = {}
    for _ in range(n_iter):
        auths = rescale(prop(hubs, True))
        hubs = rescale(prop(auths, False))
    return auths, hubs


def test_hits_matches_reference(ray_session):
    import ray

    auths, hubs = _hits_reference(PAIRS, 2)
    got = graph.hits_units(_edges_ds(ray, PAIRS), n_iter=2).take_all()
    assert {r["node"]: r["auth_units"] for r in got} == auths
    assert {r["node"]: r["hub_units"] for r in got} == hubs


def test_hits_layout_independent_bit_exact(ray_session):
    import ray

    rng = np.random.default_rng(7)
    pairs = [(int(a), int(100 + b)) for a, b in
             zip(rng.integers(0, 40, 500), rng.integers(0, 25, 500))]
    key = lambda r: r["node"]
    a = sorted(graph.hits_units(_edges_ds(ray, pairs), n_iter=2).take_all(),
               key=key)
    b = sorted(graph.hits_units(_edges_ds(ray, pairs, parts=9),
                                n_iter=2).take_all(), key=key)
    assert a == b
    auths, hubs = _hits_reference(pairs, 2)
    assert a == sorted(({"node": k, "auth_units": v, "hub_units": hubs[k]}
                        for k, v in auths.items()), key=key)


def test_hits_pure_hub_and_pure_authority(ray_session):
    import ray

    # star 1→{2,3}: node 1 is the only hub (auth 0), nodes 2/3 are pure
    # authorities (hub 0); multiplicity doubles node 2's authority share
    out = {r["node"]: r for r in graph.hits_units(
        _edges_ds(ray, [(1, 2), (1, 2), (1, 3)]), n_iter=1).take_all()}
    unit = 10 ** 12
    assert out[1]["auth_units"] == 0
    assert out[2]["hub_units"] == 0 and out[3]["hub_units"] == 0
    # raw a1: node2 = 2*h0, node3 = h0 → rescaled to 2/3 and 1/3 of mass
    assert out[2]["auth_units"] == (2 * (unit // 3) * unit) // (3 * (unit // 3))
    assert out[3]["auth_units"] == ((unit // 3) * unit) // (3 * (unit // 3))
    # hub of 1 carries the whole authority mass back → rescales to ~unit
    assert out[1]["hub_units"] > 0


def test_hits_null_endpoint_raises(ray_session):
    import ray

    t = pa.table({"src": pa.array([1, None], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    with pytest.raises(Exception, match="null edge endpoint"):
        graph.hits_units(ray.data.from_arrow(t)).take_all()


def test_hits_empty_edges_and_n_iter(ray_session):
    import ray

    assert graph.hits_units(_edges_ds(ray, []), n_iter=1).take_all() == []
    with pytest.raises(ValueError, match="n_iter"):
        graph.hits_units(_edges_ds(ray, PAIRS), n_iter=0)


def test_personalized_pagerank_hand_computed(ray_session):
    """2 seeds, chain 1→2→3 plus 4→2: mass restarts at the seeds only;
    non-seed sources contribute nothing at t=0."""
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions.graph import personalized_pagerank_units

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2, 4], pa.int64()),
        "dst": pa.array([2, 3, 2], pa.int64()),
    }))
    got = {r["node"]: r["rank_units"]
           for r in personalized_pagerank_units(edges, [1, 4],
                                                n_iter=1).take_all()}
    unit = 10 ** 12
    r0 = unit // 2
    base = (15 * r0) // 100
    # node 1: seed, no in-edges → base; node 4: same
    # node 2: in from seeds 1 and 4 (od=1 each) → 85% of (r0 + r0)
    # node 3: in from non-seed 2 (rank 0 at t=0) → 0
    assert got == {
        1: base,
        4: base,
        2: (85 * (r0 + r0)) // 100,
        3: 0,
    }


def test_personalized_pagerank_rejects_empty_seeds(ray_session):
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from mhtml_to_html_ray.functions.graph import personalized_pagerank_units

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())}))
    with _pytest.raises(ValueError):
        personalized_pagerank_units(edges, [])
