"""Similarity search over the embeddings table (list<float> column).

* brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (``ray.put`` once, read per task), per-batch partial top-k, tiny
  final merge — the exact baseline.
* LSH-bucketed ANN: seeded random-hyperplane signatures bucket the corpus;
  search probes the query's bucket (+ multi-probe neighbors), trading recall
  for touching a fraction of the rows — the scale path.
* embedding-cosine near-dup: hyperplane buckets → exact-cosine verify.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch: pa.Table, column: str = "embedding") -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix without a Python list of
    lists: flatten() is a zero-copy view of the child values, so the only
    copy is the float32→float64 widening.

    Nulls and ragged lists raise immediately with the column name — the old
    ``np.array(to_pylist())`` "fallback" crashed anyway (inhomogeneous
    sequences), just with an unreadable error deep inside a Ray task. Empty
    batches return a (0, 0) matrix; callers guard num_rows == 0 before any
    axis-1 math."""
    values = batch.column(column)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if values.null_count:
        raise ValueError(f"column {column!r} contains null embeddings")
    if pa.types.is_fixed_size_list(values.type):
        return np.asarray(values.flatten(), dtype=np.float64).reshape(
            -1, values.type.list_size
        )
    if pa.types.is_list(values.type) or pa.types.is_large_list(values.type):
        widths = np.diff(np.asarray(values.offsets))
        if len(widths) == 0:
            return np.zeros((0, 0), dtype=np.float64)
        if not (widths == widths[0]).all():
            raise ValueError(f"column {column!r} has ragged embedding lists")
        return np.asarray(values.flatten(), dtype=np.float64).reshape(
            -1, int(widths[0])
        )
    raise TypeError(f"column {column!r} is not a list<float> column")


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_rows(ids: np.ndarray, sims: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-batch partial top-k on the ROUNDED cosine with
    vec_id tie-break — the same (-cosine, vec_id) order the driver merge
    uses, so within-batch truncation can never drop a row the global sort
    would have kept (ties at the k boundary were previously arbitrary via
    argpartition over unrounded floats)."""
    from .rounding import round_half_away

    rounded = round_half_away(sims, 6)
    order = np.lexsort((ids, -rounded))[: min(k, len(ids))]
    return ids[order], rounded[order]


def brute_force_topk(embeddings_ds, query_vec, k: int = 10):
    """Exact cosine top-k: per-batch matmul + partial top-k, merged on the
    driver (k rows per batch ≪ data size). Returns (vec_id, cosine) sorted by
    (-cosine, vec_id)."""
    import ray

    query = np.asarray(query_vec, dtype=np.float64)
    query = query / (np.linalg.norm(query) or 1.0)
    query_ref = ray.put(query)

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        q = ray.get(query_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(_matrix(batch))
        sims = m @ q
        ids_k, cos_k = _topk_rows(ids, sims, k)
        return pa.table(
            {
                "vec_id": pa.array(ids_k, pa.int64()),
                "cosine": pa.array(cos_k, pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    partials.sort(key=lambda row: (-row["cosine"], row["vec_id"]))
    top = partials[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


class HyperplaneLSH:
    """Seeded random-hyperplane signatures: b-bit bucket ids."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(bits, dim)
        self.bits = bits

    def bucket(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes.T) > 0
        weights = (1 << np.arange(self.bits, dtype=np.int64))
        return signs @ weights

    def probes(self, vec: np.ndarray, n_flip: int = 1) -> list[int]:
        """Multi-probe: the home bucket plus every bucket 1 bit-flip away."""
        base = int(self.bucket(vec[None, :])[0])
        out = [base]
        if n_flip >= 1:
            out.extend(base ^ (1 << i) for i in range(self.bits))
        return out


class _LSHProbeBatch:
    """Actor-pool probe kernel: planes are built ONCE in __init__ (per
    actor), not per batch — per-batch state setup was the round-1
    anti-pattern flagged at similarity.py:117."""

    def __init__(self, dim: int, bits: int, seed: int, probes: frozenset, query: np.ndarray,
                 k: int):
        self.lsh = HyperplaneLSH(dim, bits, seed)
        self.probes = np.fromiter(probes, dtype=np.int64, count=len(probes))
        self.query = query
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(_matrix(batch))
        buckets = self.lsh.bucket(m)
        mask = np.isin(buckets, self.probes)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = m[mask] @ self.query
        ids = ids[mask]
        # per-batch partial top-k (mirrors brute_force_topk): a hot bucket
        # must not flood the driver with every matching row
        ids_k, cos_k = _topk_rows(ids, sims, self.k)
        return pa.table(
            {
                "vec_id": pa.array(ids_k, pa.int64()),
                "cosine": pa.array(cos_k, pa.float64()),
            }
        )


def lsh_topk(embeddings_ds, query_vec, k: int = 10, bits: int = 8, seed: int = 42,
             concurrency: int | tuple = 2):
    """ANN top-k: probe the query's LSH bucket neighborhood only. Returns the
    same schema as brute_force_topk; recall measured against it in tests."""
    query = np.asarray(query_vec, dtype=np.float64)
    query = query / (np.linalg.norm(query) or 1.0)
    dim = len(query)
    lsh = HyperplaneLSH(dim, bits, seed)
    probe_set = frozenset(lsh.probes(query))

    rows = embeddings_ds.map_batches(
        _LSHProbeBatch,
        fn_constructor_kwargs={"dim": dim, "bits": bits, "seed": seed,
                               "probes": probe_set, "query": query, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    rows.sort(key=lambda row: (-row["cosine"], row["vec_id"]))
    top = rows[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


class IVFIndex:
    """Coarse quantizer for IVF search: k-means centroids trained on a seeded
    sample (a few Lloyd iterations — deterministic), vectors assigned to
    their nearest centroid's inverted list."""

    def __init__(self, n_centroids: int = 16, n_iter: int = 5, seed: int = 42):
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def train(self, sample: np.ndarray) -> "IVFIndex":
        rng = np.random.RandomState(self.seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        k = min(self.n_centroids, len(sample))
        centroids = sample[rng.choice(len(sample), size=k, replace=False)]
        for _ in range(self.n_iter):
            assignment = np.argmax(sample @ centroids.T, axis=1)
            for centroid_index in range(k):
                members = sample[assignment == centroid_index]
                if len(members):
                    centroids[centroid_index] = members.mean(axis=0)
            centroids = _normalize(centroids)
        self.centroids = centroids
        return self

    def assign(self, m: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(m) @ self.centroids.T, axis=1)

    def probe_lists(self, query: np.ndarray, nprobe: int) -> np.ndarray:
        sims = self.centroids @ (query / (np.linalg.norm(query) or 1.0))
        return np.argsort(-sims)[:nprobe]


def _train_matrix(embeddings_ds, train_sample: int, seed: int) -> np.ndarray:
    """Deterministic hash-spread training sample for the IVF quantizer: the
    train_sample rows with the smallest seeded multiplicative hash of
    vec_id. Each batch keeps only its own top-n (a combiner — at most
    train_sample × n_blocks rows reach the driver fold), so the sample is
    spread across the WHOLE corpus regardless of row order; the previous
    ``limit(train_sample)`` took the first rows, a biased prefix that
    collapses the centroids when the input is ordered by source/cluster."""
    mask63 = np.uint64(0x7FFFFFFFFFFFFFFF)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "embedding": batch.column("embedding")})
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.uint64)
        h = (ids + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(33)
        h &= mask63
        order = np.argsort(h, kind="stable")[:train_sample]
        return pa.table(
            {"h": pa.array(h[order].astype(np.int64), pa.int64()),
             "embedding": batch.column("embedding").take(pa.array(order))}
        )

    parts = [
        b for b in embeddings_ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        raise ValueError("cannot train an IVF quantizer on an empty dataset")
    folded = pa.concat_tables(parts)
    order = np.argsort(
        folded.column("h").to_numpy(zero_copy_only=False), kind="stable"
    )[:train_sample]
    return _matrix(folded.take(pa.array(order)))


def ivf_topk(embeddings_ds, query_vec, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, train_sample: int = 1024, seed: int = 42):
    """IVF ANN top-k (the scale path next to lsh_topk): train the coarse
    quantizer once on a seeded sample (driver-side — centroids are tiny),
    broadcast it, then each batch scores only rows whose centroid is among
    the query's nprobe nearest lists. Deterministic; recall vs brute force
    asserted in tests."""
    import ray

    sample = _train_matrix(embeddings_ds, train_sample, seed)
    index = IVFIndex(n_centroids=n_centroids, seed=seed).train(sample)
    query = np.asarray(query_vec, dtype=np.float64)
    query = query / (np.linalg.norm(query) or 1.0)
    probes = set(int(p) for p in index.probe_lists(query, nprobe))
    index_ref = ray.put(index.centroids)
    query_ref = ray.put(query)
    probes_ref = ray.put(probes)

    def probe_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        centroids = ray.get(index_ref)
        q = ray.get(query_ref)
        wanted = ray.get(probes_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(_matrix(batch))
        assignment = np.argmax(m @ centroids.T, axis=1)
        mask = np.isin(assignment, list(wanted))
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = m[mask] @ q
        ids = ids[mask]
        ids_k, cos_k = _topk_rows(ids, sims, k)  # bound rows per batch at k
        return pa.table(
            {
                "vec_id": pa.array(ids_k, pa.int64()),
                "cosine": pa.array(cos_k, pa.float64()),
            }
        )

    rows = embeddings_ds.map_batches(probe_batch, batch_format="pyarrow").take_all()
    rows.sort(key=lambda row: (-row["cosine"], row["vec_id"]))
    top = rows[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


class _HyperplaneBucketBatch:
    """Actor-pool bucketing kernel: the LSH planes are built once per actor
    on the first batch (the dim is only known from data) and reused —
    deterministic because (bits, seed) pin the planes for any dim."""

    def __init__(self, bits: int, seed: int):
        self.bits = bits
        self.seed = seed
        self.lsh: HyperplaneLSH | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64()),
                 "embedding": pa.array([], pa.list_(pa.float64()))}
            )
        m = _normalize(_matrix(batch))
        if self.lsh is None:
            self.lsh = HyperplaneLSH(m.shape[1], self.bits, self.seed)
        buckets = self.lsh.bucket(m)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(buckets, pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )


def ivf_build(embeddings_ds, index_dir: str, n_centroids: int = 16, n_iter: int = 5,
              train_sample: int = 1024, seed: int = 42) -> "IVFIndex":
    """Build a PERSISTED, PARTITIONED IVF index (the actual scale path —
    round-1 ivf_topk re-scanned the full corpus per query): centroids train
    on a seeded sample, every vector is assigned distributed, and the corpus
    is written as one Parquet partition per inverted list
    (``list_id=N/``). A query then reads ONLY its nprobe partitions — at
    10^10 vectors that is nprobe/n_centroids of the data instead of all of
    it. Centroids persist next to the lists."""
    import os

    import ray
    import ray.data

    sample = _train_matrix(embeddings_ds, train_sample, seed)
    index = IVFIndex(n_centroids=n_centroids, n_iter=n_iter, seed=seed).train(sample)
    centroids_ref = ray.put(index.centroids)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("list_id", pa.array([], pa.int32()))
        centroids = ray.get(centroids_ref)
        m = _normalize(_matrix(batch))
        list_ids = np.argmax(m @ centroids.T, axis=1)
        return batch.append_column("list_id", pa.array(list_ids, pa.int32()))

    os.makedirs(index_dir, exist_ok=True)
    embeddings_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), index.centroids)
    return index


def ivf_query(index_dir: str, query_vec, k: int = 10, nprobe: int = 4):
    """Query a persisted IVF index: rank centroids, read ONLY the nprobe
    matching ``list_id=N`` partitions (partition pruning at the read), exact
    cosine within them. Same output schema as brute_force_topk."""
    import os

    import ray
    import ray.data

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    query = np.asarray(query_vec, dtype=np.float64)
    query = query / (np.linalg.norm(query) or 1.0)
    import glob as _glob

    order = np.argsort(-(centroids @ query))[:nprobe]
    paths = [
        f
        for list_id in order
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"list_id={int(list_id)}", "*.parquet"))
        )
    ]
    if not paths:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    query_ref = ray.put(query)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        q = ray.get(query_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sims = _normalize(_matrix(batch)) @ q
        ids_k, cos_k = _topk_rows(ids, sims, k)
        return pa.table(
            {
                "vec_id": pa.array(ids_k, pa.int64()),
                "cosine": pa.array(cos_k, pa.float64()),
            }
        )

    rows = ds.map_batches(score, batch_format="pyarrow").take_all()
    rows.sort(key=lambda row: (-row["cosine"], row["vec_id"]))
    top = rows[:k]
    return pa.table(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


def cosine_near_dup_pairs(embeddings_ds, threshold: float = 0.95, bits: int = 10,
                          seed: int = 42, bucket_cap: int = 256):
    """Embedding near-dup: bucket by hyperplane signature, exact cosine within
    buckets, emit (a, b, cosine ≥ threshold) pairs sorted."""
    import pandas as pd
    import ray.data

    bucketed = embeddings_ds.map_batches(
        _HyperplaneBucketBatch,
        fn_constructor_kwargs={"bits": bits, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        from .rounding import round_half_away

        # sort before capping: head() on shuffle arrival order would make
        # WHICH vectors survive a hot bucket nondeterministic across runs
        rows = group.sort_values("vec_id").head(bucket_cap)
        ids = rows["vec_id"].to_numpy()
        m = _normalize(np.array([np.asarray(e, dtype=np.float64) for e in rows["embedding"]]))
        sims = m @ m.T
        out_a, out_b, out_c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = int(ids[i]), int(ids[j])
                    out_a.append(min(a, b))
                    out_b.append(max(a, b))
                    # the shared DuckDB-ROUND kernel, like every other
                    # rounded output in this module
                    out_c.append(float(round_half_away(sims[i, j], 6)))
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64"),
                             "cosine": pd.Series(out_c, dtype="float64")})

    # materialize: count() + the later sort must not run the actor-pool
    # bucketing and O(bucket²) verification twice
    pairs_ds = bucketed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    ).materialize()
    if pairs_ds.count() == 0:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
        )
    # every vector lands in exactly ONE bucket (no multi-probe on this
    # path), so a pair can never surface twice — the sort alone suffices
    return pairs_ds.sort(["a", "b"])


def label_norm_stats(embeddings_ds):
    """Per-label mean L2 norm (rounded): a per-batch partial aggregate then a
    tiny groupby over (label, sum, count) partials — the combiner pattern.
    Each batch emits ONE row per distinct label (bincount over the
    factorized labels), so the shuffle carries n_labels × n_blocks rows,
    never the dataset."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        label_type = batch.schema.field("label").type
        if batch.num_rows == 0:
            return pa.table({"label": pa.array([], label_type),
                             "norm_sum": pa.array([], pa.float64()),
                             "n_partial": pa.array([], pa.int64())})
        labels = np.asarray(batch.column("label").to_pylist(), dtype=object)
        norms = np.linalg.norm(_matrix(batch), axis=1)
        uniq, inverse = np.unique(labels, return_inverse=True)
        sums = np.bincount(inverse, weights=norms, minlength=len(uniq))
        counts = np.bincount(inverse, minlength=len(uniq))
        return pa.table({"label": pa.array(uniq.tolist(), label_type),
                         "norm_sum": pa.array(sums, pa.float64()),
                         "n_partial": pa.array(counts, pa.int64())})

    partials = embeddings_ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("label").aggregate(
        Sum("norm_sum", alias_name="sum_norm"), Sum("n_partial", alias_name="n")
    )


def pq_encode_codes(m: np.ndarray, codebooks: np.ndarray,
                    digits: int = 4) -> np.ndarray:
    """Product-quantization encode: (n, D) matrix → (n, m_sub) int64 codes.
    ``codebooks`` is (m_sub, n_codes, d_sub) with m_sub·d_sub == D. Nearest
    codeword per subspace by ROUNDED squared L2 (the kmeans_assign
    determinism contract: round_half_away(·, digits), ties to the lower
    codeword id — np.argmin on the rounded matrix picks the first
    minimum)."""
    from .rounding import round_half_away

    m_sub, n_codes, d_sub = codebooks.shape
    if m.shape[1] != m_sub * d_sub:
        raise ValueError(
            f"pq: dim {m.shape[1]} != {m_sub} subspaces x {d_sub}")
    codes = np.empty((m.shape[0], m_sub), np.int64)
    for j in range(m_sub):
        sub = m[:, j * d_sub:(j + 1) * d_sub]
        d2 = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(round_half_away(d2, digits), axis=1)
    return codes


def pq_topk(embeddings_ds, query_vec, codebooks: np.ndarray, k: int = 10,
            digits: int = 4):
    """Product-quantization ANN (Jégou et al. 2011): encode every vector to
    m_sub codebook ids, score with asymmetric distance computation — the
    query's per-(subspace, codeword) distance table is built ONCE and each
    vector costs m_sub table lookups instead of a D-dim multiply.

    Scale shape: the codebooks and the m_sub×n_codes ADC table are tiny
    fixed-size state (broadcast once via ray.put, loaded per actor);
    the corpus pass is one map_batches with per-batch top-k, so the final
    exchange is n_blocks×k rows. At 10^10 vectors the codes (m_sub bytes
    per vector) are what you'd persist; re-ranking survivors with exact
    distances is a second brute_force_topk over k' candidates.

    Determinism contract (what makes an ANN variant fully SQL-oracled,
    unlike the recall-pinned LSH/IVF paths): codebooks are FIXED (the
    caller passes them — the query uses the vec_id<8 vectors), every
    distance is rounded (round_half_away, ``digits``), argmin ties go to
    the lower codeword id, and the ADC total re-rounds the j-ordered sum.
    Returns (vec_id, code_0..code_{m-1}, approx_dist) sorted by
    (approx_dist asc, vec_id asc), k rows.
    """
    import ray

    from .rounding import round_half_away

    query = np.asarray(query_vec, dtype=np.float64)
    m_sub, n_codes, d_sub = codebooks.shape
    # ADC table: t[j, c] = rounded squared L2 of (query subvector j,
    # codeword c) — built once, driver-side, m_sub×n_codes doubles
    table = np.empty((m_sub, n_codes), np.float64)
    for j in range(m_sub):
        qsub = query[j * d_sub:(j + 1) * d_sub]
        table[j] = round_half_away(
            ((codebooks[j] - qsub[None, :]) ** 2).sum(axis=1), digits)
    state_ref = ray.put((codebooks, table))

    code_names = [f"code_{j}" for j in range(m_sub)]

    def empty() -> pa.Table:
        cols = {"vec_id": pa.array([], pa.int64())}
        cols.update({nm: pa.array([], pa.int64()) for nm in code_names})
        cols["approx_dist"] = pa.array([], pa.float64())
        return pa.table(cols)

    class Score:
        def __init__(self):
            self.codebooks, self.table = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty()
            ids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
            codes = pq_encode_codes(_matrix(batch), self.codebooks, digits)
            # j-ordered left-associated sum, then re-round: the oracle's
            # SUM() over 4 rounded doubles can associate differently, but
            # the values are identical and the final ROUND absorbs the
            # last-ulp difference (the established rounded-contract risk)
            dist = self.table[0][codes[:, 0]]
            for j in range(1, codes.shape[1]):
                dist = dist + self.table[j][codes[:, j]]
            dist = round_half_away(dist, digits)
            order = np.lexsort((ids, dist))[: min(k, len(ids))]
            cols = {"vec_id": pa.array(ids[order], pa.int64())}
            for j, nm in enumerate(code_names):
                cols[nm] = pa.array(codes[order, j], pa.int64())
            cols["approx_dist"] = pa.array(dist[order], pa.float64())
            return pa.table(cols)

    partials = embeddings_ds.map_batches(
        Score, concurrency=(1, 8), batch_format="pyarrow").take_all()
    partials.sort(key=lambda r: (r["approx_dist"], r["vec_id"]))
    top = partials[:k]
    cols = {"vec_id": pa.array([r["vec_id"] for r in top], pa.int64())}
    for nm in code_names:
        cols[nm] = pa.array([r[nm] for r in top], pa.int64())
    cols["approx_dist"] = pa.array(
        [r["approx_dist"] for r in top], pa.float64())
    return pa.table(cols)
