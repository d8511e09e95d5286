"""Distributed k-means over the embeddings table (list<float> column).

Lloyd's iterations in the classic scale shape: centroids are broadcast
(``ray.put`` once per round, read per task), each ``map_batches`` task emits
k partial rows (per-cluster float64 sums + counts), and the driver folds the
tiny partials — the only data that ever leaves a block is k×dim numbers per
batch, so the fit streams at 100 TB. The IVF quantizer in similarity.py
trains on a driver-side SAMPLE; this module is the full-corpus path that
feeds it (and semantic clustering / cluster-balanced sampling in general).

Determinism: initial centroids are the vectors of the k smallest ids (no
RNG); each Lloyd's round runs a fixed iteration count. Assignment is a pure
per-row float64 computation, so it is batch-layout-independent; the fitted
centroids can differ in the last ulp across block layouts (float sums are
order-sensitive), which only matters for points near a Voronoi boundary —
``kmeans_assign(digits=...)`` additionally rounds distances (DuckDB ROUND
semantics, functions/rounding.py) and tie-breaks on centroid index so the
label is reproducible and oracle-comparable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rounding import round_half_away
from .similarity import _matrix


def _init_centroids(embeddings_ds, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic seed: the embeddings of the k smallest ids.

    Combiner shape, not a sort: each block keeps only its k smallest rows
    (a per-batch ``sort_indices`` slice), so at most k × n_blocks rows reach
    the driver fold — the full-table ``Dataset.sort`` this replaces shuffled
    the entire corpus before the first Lloyd's round."""
    import pyarrow.compute as pc

    def k_smallest(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch.column(id_col))[:k]
        return batch.select([id_col, vec_col]).take(order)

    partials = [
        b
        for b in embeddings_ds.map_batches(
            k_smallest, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    n_rows = sum(b.num_rows for b in partials)
    if n_rows < k:
        raise ValueError(f"k={k} exceeds dataset size {n_rows}")
    folded = pa.concat_tables(partials)
    order = pc.sort_indices(folded.column(id_col))[:k]
    seeds = folded.take(order).column(vec_col)
    return np.array(
        [np.asarray(v.as_py(), dtype=np.float64) for v in seeds]
    )


def _assign_block(matrix: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(labels, squared distances) — argmin over ||x-c||²; ties go to the
    lower centroid index (np.argmin's contract)."""
    # ||x-c||² = ||x||² - 2 x·c + ||c||²; the ||x||² term is argmin-invariant
    # but kept so the reported distance is a true squared distance.
    cross = matrix @ centroids.T
    d2 = (
        np.sum(matrix * matrix, axis=1, keepdims=True)
        - 2.0 * cross
        + np.sum(centroids * centroids, axis=1)[None, :]
    )
    np.maximum(d2, 0.0, out=d2)
    labels = np.argmin(d2, axis=1)
    return labels, d2[np.arange(len(matrix)), labels]


def _labels(m: np.ndarray, cents: np.ndarray, digits: int | None) -> tuple[np.ndarray, np.ndarray]:
    """The ONE home of the assignment contract both kmeans_assign and
    semdedup (and their SQL oracles) depend on. With ``digits``: direct
    Σ(x_i-c_i)² — numerically closest to the oracle's
    list_sum(list_transform(...)) so the rounded values agree — then
    DuckDB-ROUND and argmin (first minimum == lowest centroid id). Without:
    the fast expanded form via _assign_block."""
    if digits is not None:
        diff = m[:, None, :] - cents[None, :, :]
        d2 = np.einsum("nkd,nkd->nk", diff, diff)
        d2 = round_half_away(d2, digits)
        labels = np.argmin(d2, axis=1)
        return labels, d2[np.arange(len(m)), labels]
    return _assign_block(m, cents)


def kmeans_fit(embeddings_ds, k: int = 8, n_iter: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Full-corpus Lloyd's: returns the (k, dim) float64 centroid matrix.

    Per round: one streaming pass; each batch contributes a (k, dim+1)
    partial (sums + counts) and the driver reduces partials that total
    k × n_blocks rows. Empty clusters keep their previous centroid."""
    import ray

    centroids = _init_centroids(embeddings_ds, k, id_col, vec_col)
    dim = centroids.shape[1]

    for _ in range(n_iter):
        ref = ray.put(centroids)

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            cents = ray.get(_ref)
            m = _matrix(batch, vec_col)
            labels, _ = _assign_block(m, cents)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, labels, m)
            counts = np.bincount(labels, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster_id": pa.array(np.arange(k, dtype=np.int64)),
                    "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        folded_sums = np.zeros((k, dim), dtype=np.float64)
        folded_counts = np.zeros(k, dtype=np.int64)
        for block in ray.get(
            embeddings_ds.map_batches(partials, batch_format="pyarrow").to_arrow_refs()
        ):
            if block.num_rows == 0:
                continue
            ids = block.column("cluster_id").to_numpy(zero_copy_only=False)
            sums = _matrix(block, "vec_sum")
            np.add.at(folded_sums, ids, sums)
            np.add.at(folded_counts, ids, block.column("n").to_numpy(zero_copy_only=False))
        nonempty = folded_counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = folded_sums[nonempty] / folded_counts[nonempty, None]

    return centroids


def kmeans_assign(embeddings_ds, centroids: np.ndarray,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  digits: int | None = None):
    """Label every vector with its nearest centroid (squared L2, float64).

    With ``digits`` set, distances are rounded (DuckDB ROUND parity) before
    the argmin and ties break on the LOWER cluster id — the exact contract
    the SQL oracle can reproduce with array_agg(cid ORDER BY dist, cid)[1].
    Returns (id_col, cluster_id, dist2) — ``dist2`` rounded when requested."""
    import ray

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        m = _matrix(batch, vec_col)
        labels, best = _labels(m, cents, digits)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster_id": pa.array(labels.astype(np.int64)),
                "dist2": pa.array(best, pa.float64()),
            }
        )

    return embeddings_ds.map_batches(assign, batch_format="pyarrow")


def semdedup(embeddings_ds, centroids: np.ndarray, threshold: float = 0.95,
             vec_col: str = "embedding", id_col: str = "vec_id",
             digits: int | None = None, sim_digits: int | None = None):
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): assign every vector to
    its nearest centroid, then within each cluster mark as duplicate any
    vector whose cosine similarity to SOME lower-id vector of the same
    cluster reaches ``threshold``. Returns (id_col, cluster_id, keep).

    Contract notes (what makes the labeling deterministic and oracled):
    * a vector is dropped if ANY earlier (lower-id) cluster member is within
      threshold — not only earlier *kept* members. This is the EXISTS rule a
      SQL oracle can state directly, it is layout-independent, and it keeps
      at least one representative per duplicate neighborhood (the smallest
      id, the paper's "keep one per group" intent with id as the rank).
    * with ``digits`` set, assignment distances round like DuckDB ROUND and
      tie-break to the lower centroid id (same contract as kmeans_assign);
      with ``sim_digits`` set, cosines round before the threshold compare.

    Scale shape: one broadcast-assign pass (centroids via ray.put), one
    groupby shuffle keyed on cluster_id carrying (id, vector) rows, then
    O(m²) cosine work per cluster computed in fixed-size column chunks so
    peak memory is chunk × m, never m × m. The m² term is the published
    algorithm's own cost model — k is chosen so clusters stay small
    (the paper uses k in the tens of thousands for web scale)."""
    import ray

    cent = np.asarray(centroids, dtype=np.float64)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        labels, _ = _labels(_matrix(batch, vec_col), cents, digits)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster_id": pa.array(labels.astype(np.int64)),
                vec_col: batch.column(vec_col),
            }
        )

    labeled = embeddings_ds.map_batches(assign, batch_format="pyarrow")

    def prune(group: pa.Table) -> pa.Table:
        from .similarity import _normalize

        if group.num_columns == 0 or group.num_rows == 0:
            return pa.schema([(id_col, pa.int64()),
                              ("cluster_id", pa.int64()),
                              ("keep", pa.bool_())]).empty_table()
        import pyarrow.compute as pc

        rows = group.take(pc.sort_indices(group.column(id_col)))
        ids = rows.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(rows, vec_col))
        n = len(ids)
        dup = np.zeros(n, dtype=bool)
        chunk = 2048
        for s in range(1, n, chunk):
            e = min(s + chunk, n)
            sims = m[s:e] @ m[:e].T  # rows: global [s, e); cols: [0, e)
            if sim_digits is not None:
                sims = round_half_away(sims, sim_digits)
            earlier = np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dup[s:e] = ((sims >= threshold) & earlier).any(axis=1)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64), pa.int64()),
                "cluster_id": rows.column("cluster_id"),
                "keep": pa.array(~dup, pa.bool_()),
            }
        )

    return labeled.groupby("cluster_id").map_groups(prune, batch_format="pyarrow")


def kmeans_summary(embeddings_ds, k: int = 8, n_iter: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Fit + one labeling pass, aggregated to k rows:
    (cluster_id, n_vectors, inertia). Inertia partials fold on the driver
    (k rows per block)."""
    import ray

    centroids = kmeans_fit(embeddings_ds, k=k, n_iter=n_iter,
                           vec_col=vec_col, id_col=id_col)
    labeled = kmeans_assign(embeddings_ds, centroids, vec_col=vec_col, id_col=id_col)

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        d2 = batch.column("dist2").to_numpy(zero_copy_only=False)
        counts = np.bincount(ids, minlength=k).astype(np.int64)
        inertia = np.zeros(k, dtype=np.float64)
        np.add.at(inertia, ids, d2)
        return pa.table(
            {
                "cluster_id": pa.array(np.arange(k, dtype=np.int64)),
                "n_vectors": pa.array(counts, pa.int64()),
                "inertia": pa.array(inertia, pa.float64()),
            }
        )

    n_vectors = np.zeros(k, dtype=np.int64)
    inertia = np.zeros(k, dtype=np.float64)
    for block in ray.get(
        labeled.map_batches(partials, batch_format="pyarrow").to_arrow_refs()
    ):
        if block.num_rows == 0:
            continue
        ids = block.column("cluster_id").to_numpy(zero_copy_only=False)
        np.add.at(n_vectors, ids, block.column("n_vectors").to_numpy(zero_copy_only=False))
        np.add.at(inertia, ids, block.column("inertia").to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "cluster_id": pa.array(np.arange(k, dtype=np.int64)),
            "n_vectors": pa.array(n_vectors, pa.int64()),
            "inertia": pa.array(round_half_away(inertia, 2), pa.float64()),
        }
    )
