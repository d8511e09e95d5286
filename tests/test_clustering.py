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
