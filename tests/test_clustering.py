"""Distributed k-means invariants (functions/clustering.py).

The fit has no SQL oracle (iterative float refit), so these tests pin the
semantics the `embedding_kmeans` query relies on:

* blob recovery — Lloyd's over well-separated Gaussian blobs recovers one
  centroid per blob and labels every point with its blob;
* partial-fold exactness — the distributed partial-sum fold produces the
  same centroids as a single-process numpy Lloyd's on the same data
  (float64, same seeding contract), to tight tolerance;
* layout independence — labels from `kmeans_assign` do not change when the
  dataset is repartitioned into a different block layout;
* rounded-assign tie contract — with `digits` set, equal rounded distances
  go to the LOWER cluster id (the oracle's array_agg(... ORDER BY dist,
  cid)[1] contract).
"""

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import clustering


def _blob_table(rng, centers, n_per, spread=0.05):
    vecs, ids = [], []
    i = 0
    # the k smallest ids seed the fit — make them one per blob so the
    # deterministic init starts near distinct blobs
    for c in centers:
        vecs.append(np.asarray(c, dtype=np.float64))
        ids.append(i)
        i += 1
    for c in centers:
        for _ in range(n_per):
            vecs.append(np.asarray(c) + rng.normal(0, spread, len(c)))
            ids.append(i)
            i += 1
    arr = np.asarray(vecs, dtype=np.float32)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(arr), pa.list_(pa.float32())),
        }
    ), np.asarray(vecs, dtype=np.float64)


def _numpy_lloyds(matrix, k, n_iter):
    """Single-process reference implementing the same contract as
    kmeans_fit: init = vectors of the k smallest ids (rows 0..k-1),
    float64 sums, empty clusters keep their centroid."""
    cents = matrix[:k].copy()
    for _ in range(n_iter):
        d2 = ((matrix[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        labels = np.argmin(d2, axis=1)
        new = cents.copy()
        for j in range(k):
            members = matrix[labels == j]
            if len(members):
                new[j] = members.mean(axis=0)
        cents = new
    return cents


CENTERS = [(0.0, 0.0, 0.0), (10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0)]


@pytest.fixture()
def blobs(ray_session):
    import ray

    rng = np.random.default_rng(7)
    table, matrix = _blob_table(rng, CENTERS, n_per=40)
    return ray.data.from_arrow(table), matrix


def test_kmeans_recovers_blobs(blobs):
    ds, matrix = blobs
    cents = clustering.kmeans_fit(ds, k=4, n_iter=8)
    # each true center has exactly one fitted centroid within the blob radius
    for c in CENTERS:
        dists = np.linalg.norm(cents - np.asarray(c), axis=1)
        assert (dists < 0.5).sum() == 1, f"center {c}: {dists}"
    labeled = clustering.kmeans_assign(ds, cents).take_all()
    by_id = {r["vec_id"]: r["cluster_id"] for r in labeled}
    # points of one blob share a label, different blobs differ
    n_per = 40
    first_label = {}
    for blob_idx in range(4):
        ids = [4 + blob_idx * n_per + j for j in range(n_per)]
        labels = {by_id[i] for i in ids}
        assert len(labels) == 1, f"blob {blob_idx} split: {labels}"
        first_label[blob_idx] = labels.pop()
    assert len(set(first_label.values())) == 4


def test_kmeans_fit_matches_numpy_reference(blobs):
    ds, matrix = blobs
    got = clustering.kmeans_fit(ds, k=4, n_iter=5)
    want = _numpy_lloyds(matrix, k=4, n_iter=5)
    # partial sums fold in block order (float addition reorder) and the
    # reference uses numpy's pairwise-summation mean, so agreement is to
    # accumulated-rounding tolerance, not bit-exact
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_assign_labels_layout_independent(blobs):
    import ray

    ds, matrix = blobs
    cents = clustering.kmeans_fit(ds, k=4, n_iter=3)
    a = sorted(
        clustering.kmeans_assign(ds, cents, digits=4).take_all(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        clustering.kmeans_assign(ds.repartition(7), cents, digits=4).take_all(),
        key=lambda r: r["vec_id"],
    )
    assert [r["cluster_id"] for r in a] == [r["cluster_id"] for r in b]
    assert [r["dist2"] for r in a] == [r["dist2"] for r in b]


def test_rounded_assign_ties_go_to_lower_cid(ray_session):
    import ray

    # a point exactly between two centroids: rounded distances tie, so the
    # label must be the lower centroid id
    table = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array([[0.5, 0.0]], pa.list_(pa.float32())),
        }
    )
    cents = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=np.float64)
    out = clustering.kmeans_assign(
        ray.data.from_arrow(table), cents, digits=4
    ).take_all()
    assert out[0]["cluster_id"] == 0


def test_kmeans_summary_counts_total(blobs):
    ds, matrix = blobs
    out = clustering.kmeans_summary(ds, k=4, n_iter=5)
    assert out.num_rows == 4
    assert sum(out.column("n_vectors").to_pylist()) == len(matrix)
    assert all(v >= 0 for v in out.column("inertia").to_pylist())


def test_kmeans_k_exceeds_dataset_raises(ray_session):
    import ray

    table = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0], [1.0]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="exceeds"):
        clustering.kmeans_fit(ray.data.from_arrow(table), k=5, n_iter=1)


def _vec_table(vecs):
    arr = np.asarray(vecs, dtype=np.float32)
    return pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array(list(arr), pa.list_(pa.float32())),
        }
    )


def test_semdedup_drops_higher_id_duplicate(ray_session):
    import ray

    # two clusters at x=0 / x=10; ids 2 and 3 duplicate id 0's direction
    table = _vec_table([
        [1.0, 0.0], [10.0, 0.3], [2.0, 0.0], [1.0, 0.001], [10.0, -4.0],
    ])
    cents = np.array([[1.0, 0.0], [10.0, 0.0]], dtype=np.float64)
    out = sorted(
        clustering.semdedup(ray.data.from_arrow(table), cents,
                            threshold=0.99).take_all(),
        key=lambda r: r["vec_id"],
    )
    keep = [r["keep"] for r in out]
    # id 0 is the smallest-id representative of the colinear group {0, 2, 3};
    # ids 1 and 4 share a cluster but are far apart in angle
    assert keep == [True, True, False, False, True]


def test_semdedup_exists_rule_not_transitive_keep(ray_session):
    """b duplicates a (dropped); c duplicates b but NOT a — the EXISTS rule
    (any earlier member, kept or not) drops c too."""
    import ray

    a = np.array([1.0, 0.0, 0.0])

    def rot(deg):
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r)), 0.0]

    # threshold 0.995 ≈ 5.7°; a@0°, b@5°, c@10°: cos(a,b)=cos(b,c)=0.996>t,
    # cos(a,c)=0.985<t
    table = _vec_table([list(a), rot(5.0), rot(10.0)])
    cents = np.array([[1.0, 0.0, 0.0]], dtype=np.float64)
    out = sorted(
        clustering.semdedup(ray.data.from_arrow(table), cents,
                            threshold=0.995).take_all(),
        key=lambda r: r["vec_id"],
    )
    assert [r["keep"] for r in out] == [True, False, False]


def test_semdedup_layout_independent(ray_session):
    import ray

    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (200, 8))
    table = _vec_table(list(vecs))
    cents = vecs[:4].astype(np.float64)
    ds = ray.data.from_arrow(table)
    a = sorted(
        clustering.semdedup(ds, cents, threshold=0.6,
                            digits=4, sim_digits=6).take_all(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        clustering.semdedup(ds.repartition(7), cents, threshold=0.6,
                            digits=4, sim_digits=6).take_all(),
        key=lambda r: r["vec_id"],
    )
    assert a == b
    keeps = [r["keep"] for r in a]
    assert any(keeps) and not all(keeps), (
        "seed/threshold must produce a keep/drop mix or the prune path "
        "is not exercised")


def test_semdedup_chunked_matches_unchunked(ray_session):
    """A cluster bigger than the 2048-column chunk takes the chunked path;
    the dup mask must equal the single-matmul reference."""
    import ray

    rng = np.random.default_rng(3)
    n = 2600
    vecs = rng.normal(0, 1, (n, 4))
    cents = np.zeros((1, 4), dtype=np.float64)  # one cluster: all together
    out = sorted(
        clustering.semdedup(ray.data.from_arrow(_vec_table(list(vecs))),
                            cents, threshold=0.9).take_all(),
        key=lambda r: r["vec_id"],
    )
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    want = [not (sims[j, :j] >= 0.9).any() for j in range(n)]
    got = [r["keep"] for r in out]
    assert got == want
    assert not all(want), "reference must contain drops for the test to bite"
