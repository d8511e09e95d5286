"""Deduplication operators over the documents table (SURVEY.md engine-new ops).

Every variant follows the scale pattern from the Ray Data guide: vectorized
per-batch signature computation inside ``map_batches``, then ONE small
shuffle over signatures (never over full documents):

* exact        — md5(text) → groupby(hash).min(doc_id)  (hash-partitioned)
* minhash-LSH  — k-shingles → minhash sigs → (band, band_hash) explode →
                 groupby band bucket → candidate pairs → exact-Jaccard verify
                 → connected components (min-label propagation)
* simhash      — 64-bit simhash, 4×16-bit block blocking for hamming ≤ 3
* ngram-jaccard— exact Jaccard on LSH candidates (the verify step exposed)
* embedding    — cosine near-dup via random-hyperplane LSH buckets + exact
                 cosine verify (see similarity.py for the ANN search path)

At 100 TB the only all-to-all traffic is (hash, doc_id)-sized rows; documents
stay columnar in their blocks. Hot LSH buckets are capped (``bucket_cap``) —
a pathological bucket degrades to sampling instead of an O(n²) blow-up.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .planning import plan_switch


def _md5_u64(token: str) -> int:
    return struct.unpack("<Q", hashlib.md5(token.encode("utf-8")).digest()[:8])[0]


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, content_hash) — the map side of exact dedup."""
    texts = batch.column("text").to_pylist()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(hashes, pa.string())],
        names=["doc_id", "content_hash"],
    )


def exact_dedup(documents_ds):
    """Keeper per distinct text: groupby(content_hash) → min(doc_id).
    The groupby shuffles only (hash, doc_id) pairs."""
    from ray.data.aggregate import Min

    hashed = documents_ds.map_batches(content_hash_batch, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="keeper_doc_id"))


# ---------------------------------------------------------------------------
# MinHash + LSH


def shingle_set(text: str, k: int = 3) -> set[int]:
    """Hashed k-token shingles (word shingles — robust to whitespace)."""
    tokens = text.split()
    if len(tokens) < k:
        return {_md5_u64(" ".join(tokens))} if tokens else set()
    return {_md5_u64(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)}


class MinHasher:
    """Seeded universal-hash minhash signatures (num_perm permutations)."""

    _MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, self._MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, self._MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        values = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        # (a*x + b) mod p, vectorized over shingles × permutations
        products = (
            values[None, :] * self.a[:, None] + self.b[:, None]
        ) % self._MERSENNE
        return products.min(axis=1)


class MinHashLSHBatch:
    """Actor-pool kernel: documents → exploded (band_id, band_hash, doc_id)
    rows. Construct once per actor (permutations built in __init__)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 42):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            signature = self.hasher.signature(shingle_set(text, self.shingle_k))
            for band in range(self.bands):
                chunk = signature[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                # hashlib, not hash(): Python's hash of bytes is salted per
                # process and would break cross-worker bucketing
                band_hash = (
                    struct.unpack("<Q", hashlib.md5(chunk.tobytes()).digest()[:8])[0]
                    & 0x7FFFFFFFFFFFFFFF
                )
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(band_hash)
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.int64()),
                pa.array(out_band, pa.int32()),
                pa.array(out_hash, pa.int64()),
            ],
            names=["doc_id", "band_id", "band_hash"],
        )


def _pairs_from_buckets(bucket_rows, bucket_cap: int):
    """Candidate pairs from one LSH bucket, capped against blow-up."""
    docs = sorted(set(bucket_rows))[:bucket_cap]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            yield docs[i], docs[j]


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    union = len(a | b)
    return len(a & b) / union if union else 0.0



def _candidate_pairs_from_lsh(lsh_rows_ds, bucket_cap: int, strategy: str = "auto",
                              n_docs: int | None = None):
    """Candidate pairs from exploded (band_id, band_hash, doc_id) rows.

    Two physical plans, same result:
    * "driver"  — collect the signature rows (3 ints/doc/band) and bucket in a
      dict. Right whenever bands×docs fits the driver (≲ millions of rows);
      signature rows are ~1000× smaller than the documents they stand for.
    * "groupby" — the distributed plan: hash-shuffle the signature rows by
      (band_id, band_hash) and emit pairs per group, then dedup the pairs
      with a second (a, b) groupby — the result stays a DATASET end to end
      (VERDICT round 3: a duplicate-heavy 100-TB crawl has an unbounded
      corpus-wide pair count, so pairs must never aggregate on the driver).
      Right at corpus scale where even signatures don't fit one machine.
    "auto" picks by document count (groupby beyond 200k docs).

    Returns a pandas DataFrame (driver plan) or a ``ray.data.Dataset``
    (groupby plan), both with int64 columns (a, b); downstream consumers
    accept either.
    """
    import pandas as pd

    if strategy == "auto":
        strategy = "groupby" if plan_switch(None, n_rows=n_docs or 0) else "driver"
    if strategy == "driver":
        buckets: dict = {}
        for row in lsh_rows_ds.take_all():
            buckets.setdefault((row["band_id"], row["band_hash"]), []).append(row["doc_id"])
        pairs = set()
        for bucket in buckets.values():
            if len(bucket) > 1:
                pairs.update(_pairs_from_buckets(bucket, bucket_cap))
        ordered = sorted(pairs)
        return pd.DataFrame({"a": pd.Series([p[0] for p in ordered], dtype="int64"),
                             "b": pd.Series([p[1] for p in ordered], dtype="int64")})

    # Distributed plan, two vectorized rounds. Pair emission hash-partitions
    # the (band_id, band_hash) key space into a BOUNDED number of coarse
    # partitions and self-merges each partition in pandas: one Python call
    # per partition instead of per bucket. (groupby(bucket_key).map_groups
    # costs ~1 ms of per-group scaffolding; the bucket count is corpus-sized
    # at web scale, which made the old shape ~200x the driver plan even at
    # bench scale — round 5.) Cross-partition pair dedup (the same pair
    # surfaces from every band whose hashes collide) is a native Count
    # aggregate, not Python-per-pair; pairs never leave the cluster as a
    # driver-side structure.
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(
            batch.column("band_hash"), pa.scalar(n_partitions - 1, pa.int64())
        )
        return batch.append_column("part", pc.cast(part, pa.int32()))

    def partition_pairs(part_df: pd.DataFrame) -> pa.Table:
        # identical semantics to _pairs_from_buckets per bucket: distinct
        # doc_ids, ascending, first bucket_cap, all i<j pairs. Returns
        # ARROW so the downstream Count aggregate stays on Arrow blocks.
        df = part_df[["band_id", "band_hash", "doc_id"]].drop_duplicates()
        df = df.sort_values(["band_id", "band_hash", "doc_id"])
        df = df.groupby(["band_id", "band_hash"], sort=False).head(bucket_cap)
        merged = df.merge(df, on=["band_id", "band_hash"])
        merged = merged[merged["doc_id_x"] < merged["doc_id_y"]]
        pairs = merged[["doc_id_x", "doc_id_y"]].drop_duplicates()
        return pa.table({"a": pa.array(pairs["doc_id_x"].astype("int64").to_numpy(), pa.int64()),
                         "b": pa.array(pairs["doc_id_y"].astype("int64").to_numpy(), pa.int64())})

    from ray.data.aggregate import Count

    def strip_count(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("a").cast(pa.int64()),
                         "b": batch.column("b").cast(pa.int64())})

    return (
        lsh_rows_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_bands"))
        .map_batches(strip_count, batch_format="pyarrow")
    )


def _candidate_shingles_ds(documents_ds, candidate_ids, shingle_k: int):
    """(doc_id, shingles) for candidate docs only: the id set (small by LSH
    construction) broadcasts once as an Arrow array; the filter is a
    vectorized pc.is_in, not a per-row membership loop."""
    import ray

    ids_ref = ray.put(pa.array(sorted(candidate_ids), pa.int64()))

    def collect(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=ray.get(ids_ref))
        kept = batch.filter(mask)
        # packed uint64 bytes, not list<uint64>: Arrow's hash join rejects
        # list-typed payload columns but carries binary fine
        shingles = [
            _pack_shingles(shingle_set(t, shingle_k))
            for t in kept.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "shingles": pa.array(shingles, pa.large_binary()),
            }
        )

    return documents_ds.map_batches(collect, batch_format="pyarrow")


def _pack_shingles(shingles: set[int]) -> bytes:
    return np.fromiter(sorted(shingles), dtype=np.uint64, count=len(shingles)).tobytes()


def _unpack_shingles(packed: bytes) -> set[int]:
    return set(np.frombuffer(packed, dtype=np.uint64).tolist())


def _verified_pairs_ds(documents_ds, candidate_pairs, threshold: float, shingle_k: int,
                       emit_jaccard: bool = False):
    """Distributed Jaccard verify: candidate pairs meet their endpoints'
    shingle sets through two union + groupby(key).map_groups equijoin rounds
    (shingles travel as packed-uint64 binary payloads); the verify itself
    runs inside the second round's groups. Nothing aggregates on the driver.

    ``candidate_pairs`` is a pandas DataFrame (driver pair plan) or a
    ``ray.data.Dataset`` (distributed pair plan). With a Dataset the pair
    set NEVER lands on the driver — only the distinct endpoint ids do
    (linear in candidate docs, 8 bytes each; the broadcast-small-side
    shape), never the quadratic pair table (VERDICT round 3 #1).

    Implemented over groupby rather than ``Dataset.join`` deliberately: Ray's
    hash join emits its empty partitions as zero-column blocks, which poison
    every later schema-dependent operator in the chain — groupby.map_groups
    keeps the schema explicit in our own hands."""
    import pandas as pd
    import ray.data

    if isinstance(candidate_pairs, ray.data.Dataset):
        # materialize: the pair lineage (LSH groupby) otherwise re-executes
        # for each of unique(a), unique(b) and the join rounds below
        pairs_ds = candidate_pairs.materialize()
        wanted = set(pairs_ds.unique("a")).union(pairs_ds.unique("b"))
    else:
        pairs_ds = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array(candidate_pairs["a"], pa.int64()),
                    "b": pa.array(candidate_pairs["b"], pa.int64()),
                }
            )
        )
        wanted = set(candidate_pairs["a"]).union(candidate_pairs["b"])
    docs = _candidate_shingles_ds(documents_ds, wanted, shingle_k)

    # Round-5 shape: both union-equijoin rounds hash-partition the doc-id
    # key space into coarse partitions and run one VECTORIZED pandas merge
    # per partition (per-endpoint map_groups scaffolding was the scale
    # bottleneck — see _candidate_pairs_from_lsh). The jaccard itself stays
    # a per-candidate set intersection (intrinsic work), but over the whole
    # partition in one call.
    n_partitions = 256
    part_mask = pa.scalar(n_partitions - 1, pa.int64())

    def _key_part(table: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(table.column("key"), part_mask)
        return table.append_column("part", pc.cast(part, pa.int32()))

    # shared union schema: key + pair payloads + doc payload (nulls mark side)
    def pair_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _key_part(pa.table(
            {
                "key": batch.column("a").cast(pa.int64()),
                "other": batch.column("b").cast(pa.int64()),
                "sh_pair": pa.nulls(n, pa.large_binary()),
                "sh_doc": pa.nulls(n, pa.large_binary()),
            }
        ))

    def doc_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return _key_part(pa.table(
            {
                "key": batch.column("doc_id").cast(pa.int64()),
                "other": pa.nulls(n, pa.int64()),
                "sh_pair": pa.nulls(n, pa.large_binary()),
                "sh_doc": batch.column("shingles").cast(pa.large_binary()),
            }
        ))

    # materialize: side_docs feeds BOTH join rounds, and the full corpus
    # scan + per-doc shingling behind it must not execute twice
    side_docs = docs.map_batches(doc_side, batch_format="pyarrow").materialize()

    def attach_a_part(part_df: pd.DataFrame) -> pa.Table:
        doc_rows = part_df.loc[part_df["sh_doc"].notna(), ["key", "sh_doc"]]
        pair_rows = part_df.loc[part_df["sh_doc"].isna(), ["key", "other"]]
        if doc_rows.empty or pair_rows.empty:
            merged = None
        else:
            merged = pair_rows.merge(doc_rows.drop_duplicates("key"),
                                     on="key", how="inner")
        if merged is None or merged.empty:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "other": pa.array([], pa.int64()),
                    "sh_pair": pa.array([], pa.large_binary()),
                    "sh_doc": pa.array([], pa.large_binary()),
                    "part": pa.array([], pa.int32()),
                }
            )
        n = len(merged)
        new_key = merged["other"].to_numpy(np.int64)
        # re-key by the pair's OTHER endpoint (b) for round 2
        return pa.table(
            {
                "key": pa.array(new_key, pa.int64()),
                "other": pa.array(merged["key"].to_numpy(np.int64), pa.int64()),
                "sh_pair": pa.array(list(merged["sh_doc"]), pa.large_binary()),
                "sh_doc": pa.nulls(n, pa.large_binary()),
                "part": pa.array((new_key & (n_partitions - 1)).astype(np.int32),
                                 pa.int32()),
            }
        )

    round1 = (
        pairs_ds.map_batches(pair_side, batch_format="pyarrow")
        .union(side_docs)
        .groupby("part")
        .map_groups(attach_a_part, batch_format="pandas")
    )

    def verify_b_part(part_df: pd.DataFrame) -> pa.Table:
        doc_rows = part_df.loc[part_df["sh_doc"].notna(), ["key", "sh_doc"]]
        pair_rows = part_df.loc[part_df["sh_doc"].isna(),
                                ["key", "other", "sh_pair"]]
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        if not doc_rows.empty and not pair_rows.empty:
            merged = pair_rows.merge(doc_rows.drop_duplicates("key"),
                                     on="key", how="inner")
            cache: dict[int, set] = {}
            for key_b, other, sh_pair, sh_doc in zip(
                    merged["key"], merged["other"], merged["sh_pair"],
                    merged["sh_doc"]):
                shingles_b = cache.get(key_b)
                if shingles_b is None:
                    shingles_b = cache[key_b] = _unpack_shingles(sh_doc)
                sim = jaccard(_unpack_shingles(sh_pair), shingles_b)
                if sim >= threshold:
                    out_a.append(int(other))
                    out_b.append(int(key_b))
                    out_j.append(sim)
        cols = {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
        if emit_jaccard:
            cols["jaccard"] = pa.array(out_j, pa.float64())
        return pa.table(cols)

    return round1.union(side_docs).groupby("part").map_groups(
        verify_b_part, batch_format="pandas"
    )


def connected_components_ds(pairs_ds, max_iter: int = 50, n_partitions: int = 256):
    """Distributed connected components by min-label propagation with
    POINTER DOUBLING: each iteration first spreads labels one hop along
    edges, then shortcuts label(node) -> label(label(node)) - so label
    distances halve per round and convergence is O(log diameter) shuffle
    rounds, not O(diameter) (ADVICE round 2: a long chain of
    sliding-boilerplate near-dups previously needed one round per hop).
    Replaces the driver union-find the day near-dup pairs stop fitting one
    process (VERDICT round-1 item 9).

    Round-5 shape: the equijoins hash-partition the node-id key space into
    ``n_partitions`` coarse partitions and run VECTORIZED pandas merges per
    partition (one Python call per partition, not per node - per-node
    map_groups scaffolding was the scale bottleneck), emit Arrow, and the
    hop's partials feed the shortcut directly (duplicate candidate labels
    are resolved by the per-partition partial-min plus the one canonical
    Min aggregate per iteration) - 3 all-to-alls per iteration instead of
    the previous 4. Built on groupby rather than ``Dataset.join``
    deliberately (see _verified_pairs_ds for why)."""
    import pandas as pd
    from ray.data.aggregate import Min

    part_mask = pa.scalar(n_partitions - 1, pa.int64())

    def _with_part(table: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(table.column("key"), part_mask)
        return table.append_column("part", pc.cast(part, pa.int32()))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return _with_part(pa.table(
            {
                "key": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
                "label": pa.nulls(2 * batch.num_rows, pa.int64()),
            }
        ))

    edge_side = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    # Pin the block count for the iteration state, data-proportionally.
    # union() concatenates block lists and the shuffle ops emit one block
    # per input block, so without this the label table's block count
    # COMPOUNDS across iterations (48 -> 192 -> 480 ... in the round-5
    # profile) and per-block fixed costs swamp the tiny per-iteration data.
    rows_per_block = 1_000_000  # ~16 MB of (int64, int64) rows
    target_blocks = max(1, min(edge_side.num_blocks(),
                               -(-edge_side.count() // rows_per_block)))
    if edge_side.num_blocks() > target_blocks:
        edge_side = edge_side.repartition(target_blocks).materialize()

    labels = (
        edge_side.map_batches(
            lambda b: pa.table({"node": b.column("key"), "label": b.column("key")}),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .repartition(target_blocks)
        .materialize()
    )
    previous_sum = labels.sum("label")

    def label_side(batch: pa.Table) -> pa.Table:
        # (node, label) rows keyed by the node itself
        return _with_part(pa.table(
            {
                "key": batch.column("node").cast(pa.int64()),
                "dst": pa.nulls(batch.num_rows, pa.int64()),
                "label": batch.column("label").cast(pa.int64()),
            }
        ))

    def shortcut_request(batch: pa.Table) -> pa.Table:
        # a (node, label) row asks node `label` for ITS label
        return _with_part(pa.table(
            {
                "key": batch.column("label").cast(pa.int64()),
                "dst": batch.column("node").cast(pa.int64()),
                "label": pa.nulls(batch.num_rows, pa.int64()),
            }
        ))

    def _node_label_table(nodes, labs) -> pa.Table:
        out = pd.DataFrame({"node": nodes, "label": labs})
        # partial min per node inside the partition: shrinks the rows the
        # next shuffle carries without changing the final Min
        out = out.groupby("node", sort=False)["label"].min().reset_index()
        return pa.table({"node": pa.array(out["node"].to_numpy(np.int64), pa.int64()),
                         "label": pa.array(out["label"].to_numpy(np.int64), pa.int64())})

    def propagate_part(part_df: pd.DataFrame) -> pa.Table:
        """One coarse partition: label rows spread each node's best known
        label to all its neighbors (vectorized merge), nodes keep their own
        best label."""
        has_label = part_df["label"].notna()
        labels_df = (part_df.loc[has_label, ["key", "label"]]
                     .groupby("key", sort=False)["label"].min().reset_index())
        edges_df = part_df.loc[part_df["dst"].notna(), ["key", "dst"]]
        merged = edges_df.merge(labels_df, on="key", how="inner")
        nodes = np.concatenate([labels_df["key"].to_numpy(np.int64),
                                merged["dst"].to_numpy(np.int64)])
        labs = np.concatenate([labels_df["label"].to_numpy(np.int64),
                               merged["label"].to_numpy(np.int64)])
        return _node_label_table(nodes, labs)

    def shortcut_part(part_df: pd.DataFrame) -> pa.Table:
        """key = some node k; label rows carry candidate labels of k; dst
        rows are nodes whose current label is k -> their new label is
        label(k) (k itself when k is a minimal label with no label row)."""
        has_label = part_df["label"].notna()
        labels_df = (part_df.loc[has_label, ["key", "label"]]
                     .groupby("key", sort=False)["label"].min().reset_index())
        req = part_df.loc[part_df["dst"].notna(), ["key", "dst"]]
        merged = req.merge(labels_df, on="key", how="left")
        new_label = merged["label"].fillna(merged["key"]).astype("int64")
        nodes = np.concatenate([labels_df["key"].to_numpy(np.int64),
                                merged["dst"].to_numpy(np.int64)])
        labs = np.concatenate([labels_df["label"].to_numpy(np.int64),
                               new_label.to_numpy(np.int64)])
        return _node_label_table(nodes, labs)

    converged = False
    for _ in range(max_iter):
        # one hop along edges -> (node, label) candidate partials (dupes OK:
        # every consumer takes a min)
        hop = (
            edge_side.union(labels.map_batches(label_side, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(propagate_part, batch_format="pandas")
            .materialize()
        )
        # pointer doubling straight off the hop partials, then ONE canonical
        # Min aggregate per iteration
        labels = (
            hop.map_batches(shortcut_request, batch_format="pyarrow")
            .union(hop.map_batches(label_side, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(shortcut_part, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(target_blocks)  # keep the iteration block count flat
            .materialize()
        )
        # labels only ever decrease, so an unchanged sum means a fixpoint
        current_sum = labels.sum("label")
        if current_sum == previous_sum:
            converged = True
            break
        previous_sum = current_sum
    if not converged:
        # a component with diameter > max_iter would exit here mid-propagation
        # and silently split one cluster into several - say so loudly
        import warnings

        warnings.warn(
            f"connected_components_ds: min-label propagation did not converge "
            f"within max_iter={max_iter} rounds; a component with diameter > "
            f"{max_iter} exists and its cluster labels are split. Raise "
            f"max_iter or pre-contract long chains.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def minhash_dedup(documents_ds, threshold: float = 0.8, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 3, seed: int = 42, bucket_cap: int = 64,
                  concurrency: int | tuple | None = None, pair_strategy: str = "auto",
                  cluster_strategy: str = "auto"):
    """Near-dup clusters: returns a Dataset of (doc_id, cluster_id) where
    cluster_id = min doc_id of the component. Candidate generation shuffles
    only signature rows; Jaccard verification touches only candidate docs.

    ``cluster_strategy``: "driver" verifies+clusters on the driver (right
    while candidate pairs fit one process), "distributed" routes verify
    through shingle joins and clusters by min-label propagation
    (connected_components_ds) — the 10^10-URL-scale path. "auto" switches on
    corpus size like the pair strategy. Both are equivalence-tested."""
    import ray
    import ray.data

    # stateless tasks by default (the MinHasher costs microseconds to build);
    # pass concurrency for an actor pool when batches are huge
    kwargs = dict(batch_format="pyarrow")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        lsh_rows = documents_ds.map_batches(
            MinHashLSHBatch,
            fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                                   "shingle_k": shingle_k, "seed": seed},
            **kwargs,
        )
    else:
        hasher = MinHashLSHBatch(num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed)
        lsh_rows = documents_ds.map_batches(hasher, **kwargs)

    n_docs = documents_ds.count()
    candidate_pairs = _candidate_pairs_from_lsh(lsh_rows, bucket_cap, pair_strategy, n_docs=n_docs)
    if cluster_strategy == "auto":
        cluster_strategy = "distributed" if plan_switch(documents_ds, n_rows=n_docs) else "driver"

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )
    pairs_are_ds = isinstance(candidate_pairs, ray.data.Dataset)
    if pairs_are_ds:
        # count() on the materialized pair Dataset is a metadata read; the
        # pair rows themselves stay in the object store
        candidate_pairs = candidate_pairs.materialize()
        n_pairs = candidate_pairs.count()
    else:
        n_pairs = len(candidate_pairs)
    if n_pairs == 0:
        return ray.data.from_arrow(empty)
    if pairs_are_ds and cluster_strategy == "driver":
        # explicit driver clustering over a distributed pair plan: the
        # caller chose to collect — do it here, where the choice is visible
        candidate_pairs = candidate_pairs.to_pandas()
        pairs_are_ds = False

    if cluster_strategy == "distributed":
        # materialize once: .count() below would otherwise execute the full
        # two-round shingle-join verify, then connected_components_ds would
        # re-execute the same lazy lineage from scratch (ADVICE round 2)
        verified = _verified_pairs_ds(
            documents_ds, candidate_pairs, threshold, shingle_k
        ).materialize()
        if verified.count() == 0:
            return ray.data.from_arrow(empty)
        labels = connected_components_ds(verified)
        return labels.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("node"), "cluster_id": b.column("label")}
            ),
            batch_format="pyarrow",
        ).sort("doc_id")

    candidate_ids = set(candidate_pairs["a"]).union(candidate_pairs["b"])
    candidate_docs = _candidate_shingles_ds(
        documents_ds, candidate_ids, shingle_k
    ).take_all()
    shingles = {row["doc_id"]: _unpack_shingles(row["shingles"]) for row in candidate_docs}

    # union-find over verified pairs (candidate set is small by construction)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        root_x, root_y = find(x), find(y)
        if root_x != root_y:
            parent[max(root_x, root_y)] = min(root_x, root_y)

    for a, b in candidate_pairs.itertuples(index=False):
        if jaccard(shingles.get(a, set()), shingles.get(b, set())) >= threshold:
            union(int(a), int(b))

    members = sorted(parent)
    table = pa.Table.from_arrays(
        [
            pa.array(members, pa.int64()),
            pa.array([find(m) for m in members], pa.int64()),
        ],
        names=["doc_id", "cluster_id"],
    )
    return ray.data.from_arrow(table)


# ---------------------------------------------------------------------------
# SimHash


# np.unpackbits over little-endian u64 bytes yields bit index i ← source bit
# position 8*(i//8) + 7 - (i%8); the permutation preserves that historical
# (test-pinned) bit layout in the vectorized kernel below
_SIMHASH_BIT_PERM = np.array([8 * (i // 8) + 7 - (i % 8) for i in range(64)], dtype=np.int64)
_SIMHASH_SHIFTS = np.arange(64, dtype=np.uint64)
_SIMHASH_WEIGHTS = (np.uint64(1) << _SIMHASH_SHIFTS)


class SimHashBatch:
    """64-bit simhash per document + 4×16-bit blocks for hamming blocking."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    @staticmethod
    def simhash(text: str) -> int:
        """Vectorized: one (n_tokens × 64) bit matrix per document instead of
        a per-token np.unpackbits Python loop (round-1 hot spot). Tokenizes
        with the shared whitespace contract (textstats._lm_tokens — the
        exact RE2 \\s class), so the simhash_blocks oracle's
        regexp_extract_all('\\S+') agrees on EVERY input, not just ASCII
        (str.split() would diverge on \\v and Unicode spaces)."""
        from .textstats import _lm_tokens

        tokens = _lm_tokens(text)
        if not tokens:
            return 0
        hashes = np.fromiter((_md5_u64(t) for t in tokens), dtype=np.uint64,
                             count=len(tokens))
        bits = ((hashes[:, None] >> _SIMHASH_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
        counts = (2 * bits - 1).sum(axis=0)
        signs = counts[_SIMHASH_BIT_PERM] > 0
        return int(np.bitwise_or.reduce(np.where(signs, _SIMHASH_WEIGHTS, np.uint64(0))))

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        hashes = [self.simhash(t) for t in texts]
        arrays = [pa.array(doc_ids, pa.int64()), pa.array(hashes, pa.uint64())]
        names = ["doc_id", "simhash"]
        for block in range(4):
            arrays.append(pa.array([(h >> (block * 16)) & 0xFFFF for h in hashes], pa.int32()))
            names.append(f"block{block}")
        return pa.Table.from_arrays(arrays, names=names)


def simhash_pairs(documents_ds, max_hamming: int = 3, concurrency: int | tuple | None = None,
                  bucket_cap: int = 512):
    """Near-dup pairs by simhash: block on each 16-bit quarter (a pair within
    hamming ≤ 3 shares at least one block exactly), verify hamming.

    ONE shuffle: the 4 blocks explode to long-format (block_id, block_value)
    rows and a single groupby covers all of them (round 1 ran 4 separate
    groupby passes); pair dedup across blocks is a second, pair-sized
    groupby — nothing lands on the driver. ``bucket_cap`` bounds the O(n²)
    in-bucket pair loop: a degenerate block value (e.g. simhash 0 from empty
    documents) takes its bucket_cap smallest doc_ids deterministically
    instead of blowing up one map_groups task."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Count

    if concurrency is not None:
        hashed = documents_ds.map_batches(SimHashBatch, batch_format="pyarrow",
                                          concurrency=concurrency)
    else:
        hashed = documents_ds.map_batches(SimHashBatch(), batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_id = pa.concat_arrays([batch.column("doc_id").combine_chunks()] * 4)
        simhash = pa.concat_arrays([batch.column("simhash").combine_chunks()] * 4)
        block_id = pa.array(np.repeat(np.arange(4, dtype=np.int32), n), pa.int32())
        block_value = pa.concat_arrays(
            [batch.column(f"block{b}").combine_chunks() for b in range(4)]
        )
        return pa.Table.from_arrays(
            [doc_id, simhash, block_id, block_value],
            names=["doc_id", "simhash", "block_id", "block_value"],
        )

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    # Vectorized distributed pair emission (round 5): hash-partition the
    # block-value key space into a bounded number of coarse partitions and
    # self-merge each partition in pandas — one Python call per PARTITION,
    # not per (block_id, block_value) bucket, with the hamming verify as a
    # numpy popcount over the merged columns. Arrow out: pandas blocks make
    # the downstream Count aggregate ~15x slower (round-5 profile).
    n_partitions = 256

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(
            pc.cast(batch.column("block_value"), pa.int64()),
            pa.scalar(n_partitions - 1, pa.int64()),
        )
        return batch.append_column("part", pc.cast(part, pa.int32()))

    def partition_block_pairs(part_df: pd.DataFrame) -> pa.Table:
        df = part_df[["block_id", "block_value", "doc_id", "simhash"]]
        df = df.drop_duplicates(["block_id", "block_value", "doc_id"])
        df = df.sort_values(["block_id", "block_value", "doc_id"])
        df = df.groupby(["block_id", "block_value"], sort=False).head(bucket_cap)
        merged = df.merge(df, on=["block_id", "block_value"])
        merged = merged[merged["doc_id_x"] < merged["doc_id_y"]]
        # NEVER mix the int64 doc ids and uint64 hashes in one .values
        # array: numpy promotes to float64, corrupting the hash low bits
        # (caught by the dedup_simhash SQL oracle in round 4) — keep the
        # hash columns uint64 end to end and popcount the xor vectorized
        hx = merged["simhash_x"].to_numpy(dtype=np.uint64)
        hy = merged["simhash_y"].to_numpy(dtype=np.uint64)
        xor = np.bitwise_xor(hx, hy)
        ham = np.unpackbits(xor.view(np.uint8)).reshape(len(xor), 8 * 8).sum(axis=1) \
            if len(xor) else np.array([], dtype=np.int64)
        keep = ham <= max_hamming
        a = merged["doc_id_x"].to_numpy(dtype=np.int64)[keep]
        b = merged["doc_id_y"].to_numpy(dtype=np.int64)[keep]
        # dedupe within the partition; cross-partition dedup is the Count
        # aggregate below
        pairs = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return pa.table({"a": pa.array(pairs["a"].to_numpy(), pa.int64()),
                         "b": pa.array(pairs["b"].to_numpy(), pa.int64())})

    # materialize: the count() empty-check below would otherwise execute
    # the full simhash + shuffle lineage, then the groupby would re-run it
    pairs_ds = (
        exploded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_block_pairs, batch_format="pandas")
        .materialize()
    )
    if pairs_ds.count() == 0:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
    unique = (
        pairs_ds.groupby(["a", "b"])
        .aggregate(Count(alias_name="_blocks"))
        .drop_columns(["_blocks"])
        .sort(["a", "b"])
    )
    return unique


def ngram_jaccard_pairs(documents_ds, threshold: float = 0.5, shingle_k: int = 3,
                        num_perm: int = 64, bands: int = 32, seed: int = 42,
                        strategy: str = "auto"):
    """Exact n-gram Jaccard similarity for LSH candidate pairs — the verify
    stage exposed as its own operator: (a, b, jaccard) for pairs ≥ threshold.

    ``strategy``: "driver" collects candidate shingle sets and verifies in
    one process (fine while LSH candidates fit); "distributed" routes the
    verify through the same shingle-equijoin rounds as minhash_dedup
    (_verified_pairs_ds) so nothing doc-sized lands on the driver — the
    100-TB path. "auto" switches on corpus size. Equivalence-tested."""
    import ray
    import ray.data
    import pandas as pd

    lsh_rows = documents_ds.map_batches(
        MinHashLSHBatch(num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow",
    )

    n_docs = documents_ds.count()
    pairs = _candidate_pairs_from_lsh(lsh_rows, 64, "auto", n_docs=n_docs)
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    pairs_are_ds = isinstance(pairs, ray.data.Dataset)
    if pairs_are_ds:
        pairs = pairs.materialize()
        if pairs.count() == 0:
            return ray.data.from_arrow(empty)
    elif not len(pairs):
        return ray.data.from_arrow(empty)
    if strategy == "auto":
        strategy = "distributed" if plan_switch(documents_ds, n_rows=n_docs) else "driver"
    if pairs_are_ds and strategy == "driver":
        pairs = pairs.to_pandas()  # explicit driver verify over a distributed plan

    if strategy == "distributed":
        verified = _verified_pairs_ds(
            documents_ds, pairs, threshold, shingle_k, emit_jaccard=True
        )

        def normalize(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or batch.num_columns == 0:
                return empty
            a = batch.column("a")
            b = batch.column("b")
            return pa.table(
                {
                    "a": pc.min_element_wise(a, b),
                    "b": pc.max_element_wise(a, b),
                    "jaccard": pc.round(batch.column("jaccard"), ndigits=6),
                }
            )

        return verified.map_batches(normalize, batch_format="pyarrow").sort(["a", "b"])

    wanted = set(pairs["a"]).union(pairs["b"])
    docs = _candidate_shingles_ds(documents_ds, wanted, shingle_k).take_all()
    shingles = {row["doc_id"]: _unpack_shingles(row["shingles"]) for row in docs}
    out = []
    for a, b in pairs.itertuples(index=False):
        sim = jaccard(shingles.get(int(a), set()), shingles.get(int(b), set()))
        if sim >= threshold:
            out.append((int(min(a, b)), int(max(a, b)), round(sim, 6)))
    out.sort()

    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([o[0] for o in out], pa.int64()),
                "b": pa.array([o[1] for o in out], pa.int64()),
                "jaccard": pa.array([o[2] for o in out], pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash document fingerprints, MOSS-style)


_WINNOW_BASE = np.uint64(257)
# 257 is odd → invertible mod 2^64; the inverse lets the rolling hash become
# a prefix-sum difference, fully vectorized under uint64 wraparound
_WINNOW_BASE_INV = np.uint64(pow(257, -1, 1 << 64))


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> set[int]:
    """Local document fingerprints: Rabin-Karp rolling hash (mod 2^64) over
    character k-grams, winnowed (minimum per window of ``window`` hashes,
    rightmost wins ties). Two documents sharing any sizable passage share
    fingerprints even when the global hash differs — the partial-overlap
    detector next to the whole-document md5.

    Vectorized (VERDICT r1: the per-character Python loop was the CPU sink):
    window hash h_i = Σ c_{i+j}·B^{k-1-j} is computed for ALL i at once as
    (T_{i+k} − T_i)·B^{i+k-1} where T is the prefix sum of c_j·B^{−j}; every
    product/sum wraps naturally in uint64."""
    n = len(text)
    if n < k:
        return {_md5_u64(text)} if text else set()
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    inv_powers = np.full(n, _WINNOW_BASE_INV, dtype=np.uint64)
    inv_powers[0] = 1
    np.cumprod(inv_powers, out=inv_powers)  # B^{-i}, wrapping
    powers = np.full(n, _WINNOW_BASE, dtype=np.uint64)
    powers[0] = 1
    np.cumprod(powers, out=powers)  # B^{i}, wrapping
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(codes * inv_powers, out=prefix[1:])
    hashes = (prefix[k:] - prefix[:-k]) * powers[k - 1 :]
    if len(hashes) <= window:
        return {int(hashes.min())}
    windows = np.lib.stride_tricks.sliding_window_view(hashes, window)
    # rightmost minimal hash per window (standard winnowing tie rule):
    # argmin on the REVERSED window finds the right-most minimum first
    from_right = np.argmin(windows[:, ::-1], axis=1)
    picked = hashes[np.arange(len(windows)) + (window - 1 - from_right)]
    return set(np.unique(picked).tolist())


def winnow_overlap_pairs(documents_ds, min_shared: int = 3, k: int = 8, window: int = 4,
                         bucket_cap: int = 64, strategy: str = "auto"):
    """Passage-overlap candidate pairs: explode (fingerprint, doc_id) rows,
    bucket by fingerprint (only fingerprint-sized rows ever shuffle), count
    shared fingerprints per pair, keep pairs sharing ≥ min_shared.

    Same dual plan as the minhash path: "driver" dict-buckets the exploded
    rows (right while they fit one process), "groupby" is the distributed
    plan — groupby(fingerprint) → per-bucket pair emission → groupby(pair)
    count. "auto" switches on document count."""
    import collections

    import pandas as pd
    import ray.data

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, fps = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for fp in winnow_fingerprints(text, k, window):
                doc_ids.append(doc_id)
                fps.append(fp & 0x7FFFFFFFFFFFFFFF)
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.int64()), pa.array(fps, pa.int64())],
            names=["doc_id", "fingerprint"],
        )

    exploded = documents_ds.map_batches(explode, batch_format="pyarrow")
    if strategy == "auto":
        strategy = "groupby" if plan_switch(documents_ds) else "driver"

    if strategy == "driver":
        buckets: dict[int, list[int]] = {}
        for row in exploded.take_all():
            buckets.setdefault(row["fingerprint"], []).append(row["doc_id"])
        pair_counts: collections.Counter = collections.Counter()
        for docs in buckets.values():
            docs = sorted(set(docs))[:bucket_cap]
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    pair_counts[(docs[i], docs[j])] += 1
        out = sorted((a, b, c) for (a, b), c in pair_counts.items() if c >= min_shared)
    else:
        # vectorized distributed plan (round 5): hash-partition fingerprints
        # into a bounded number of coarse partitions, self-merge each
        # partition in pandas (one Python call per PARTITION — the old
        # groupby(fingerprint).map_groups paid ~1 ms scaffolding per
        # fingerprint, 200x the driver plan at bench scale), emit per-pair
        # PARTIAL shared counts, then one native Sum aggregate. A
        # fingerprint lives in exactly one partition, so the partial counts
        # sum to the exact shared-fingerprint count.
        n_partitions = 256

        def add_part(batch: pa.Table) -> pa.Table:
            part = pc.bit_wise_and(
                batch.column("fingerprint"), pa.scalar(n_partitions - 1, pa.int64())
            )
            return batch.append_column("part", pc.cast(part, pa.int32()))

        def partition_pair_counts(part_df: pd.DataFrame) -> pa.Table:
            # returns ARROW: the downstream Sum aggregate is ~15x faster
            # over Arrow blocks than pandas blocks (round-5 profile)
            df = part_df[["fingerprint", "doc_id"]].drop_duplicates()
            df = df.sort_values(["fingerprint", "doc_id"])
            df = df.groupby("fingerprint", sort=False).head(bucket_cap)
            merged = df.merge(df, on="fingerprint")
            merged = merged[merged["doc_id_x"] < merged["doc_id_y"]]
            out = (merged.groupby(["doc_id_x", "doc_id_y"], sort=False)
                   .size().reset_index(name="shared_partial"))
            return pa.table(
                {"a": pa.array(out["doc_id_x"].astype("int64").to_numpy(), pa.int64()),
                 "b": pa.array(out["doc_id_y"].astype("int64").to_numpy(), pa.int64()),
                 "shared_partial": pa.array(out["shared_partial"].astype("int64").to_numpy(), pa.int64())})

        from ray.data.aggregate import Sum

        counted = (
            exploded.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(partition_pair_counts, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Sum("shared_partial", alias_name="shared"))
        )

        # threshold filter stays distributed: the counted pair table on a
        # duplicate-heavy corpus is pair-sized, so it must never take_all()
        # to the driver (VERDICT round 3 #2) — filter per batch, sort in Ray
        def threshold(batch: pa.Table) -> pa.Table:
            kept = batch.filter(
                pc.greater_equal(batch.column("shared"), pa.scalar(min_shared))
            )
            return pa.table(
                {
                    "a": kept.column("a").cast(pa.int64()),
                    "b": kept.column("b").cast(pa.int64()),
                    "shared_fingerprints": kept.column("shared").cast(pa.int64()),
                }
            )

        return counted.map_batches(threshold, batch_format="pyarrow").sort(["a", "b"])
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([o[0] for o in out], pa.int64()),
                "b": pa.array([o[1] for o in out], pa.int64()),
                "shared_fingerprints": pa.array([o[2] for o in out], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Line-level exact dedup (CCNet / RefinedWeb-style boilerplate removal)


def frequent_lines(documents_ds, text_col: str = "text", max_count: int = 1):
    """Lines whose corpus-wide occurrence count exceeds ``max_count``.

    Scale shape: per-batch ``value_counts`` pre-aggregates to DISTINCT lines
    per block before the one groupby — the shuffle carries (line, n) partials,
    never documents. The result is the boilerplate set (nav bars, cookie
    banners, footers), which is low-cardinality by construction: a line only
    qualifies by repeating across documents."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        lines = pc.list_flatten(pc.split_pattern(batch.column(text_col), pattern="\n"))
        counts = lines.value_counts()
        return pa.table(
            {
                "line": counts.field("values"),
                "n": pc.cast(counts.field("counts"), pa.int64()),
            }
        )

    counted = documents_ds.map_batches(partials, batch_format="pyarrow").groupby(
        "line"
    ).aggregate(Sum("n", alias_name="total"))

    out_schema = pa.schema([("line", pa.string())])

    def keep_frequent(batch: pa.Table) -> pa.Table:
        # Ray's groupby can emit zero-column empty partitions; return a
        # typed empty table so downstream concat sees one schema.
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        mask = pc.greater(batch.column("total"), max_count)
        return batch.filter(mask).select(["line"]).cast(out_schema)

    return counted.map_batches(keep_frequent, batch_format="pyarrow")


def line_dedup(documents_ds, text_col: str = "text", max_count: int = 1,
               id_col: str = "doc_id"):
    """Remove every line that occurs more than ``max_count`` times across the
    corpus, preserving the in-document order of the survivors (CCNet's
    duplicate-line filter; the standard boilerplate scrub of web-text
    pipelines).

    Two passes over ``documents_ds``:

    1. :func:`frequent_lines` — the only shuffle, over (line, n) partials.
    2. A broadcast (``ray.put`` once, read per task) of the frequent-line set
       into a vectorized per-batch scrub: ``split_pattern`` → ``is_in`` mask
       → rebuild the kept lists from new offsets → ``binary_join``. Documents
       never leave their blocks, so the pass streams at 100 TB.

    The broadcast assumes the boilerplate set fits a worker heap; that holds
    because membership requires a repeat count > max_count, so its size is
    bounded by corpus_lines / max_count and in practice by the (small) set of
    truly shared lines. Returns (id_col, text_dedup, n_kept, n_removed);
    ``text_dedup`` is null when every line of a document was scrubbed.
    """
    import ray

    # Ray's groupby can emit zero-column empty partitions that bypass the
    # keep_frequent transform — drop schema-less blocks before concat.
    blocks = [
        b
        for b in ray.get(
            frequent_lines(documents_ds, text_col, max_count).to_arrow_refs()
        )
        if b.num_columns > 0
    ]
    if blocks:
        freq_lines = pa.concat_tables(blocks).column("line").combine_chunks()
    else:
        freq_lines = pa.array([], pa.string())
    freq_ref = ray.put(freq_lines)

    def scrub(batch: pa.Table) -> pa.Table:
        frequent = ray.get(freq_ref)
        parts = pc.split_pattern(batch.column(text_col), pattern="\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        if len(frequent):
            keep = pc.invert(pc.is_in(flat, value_set=frequent))
        else:
            keep = pa.array(np.ones(len(flat), dtype=bool))
        keep_np = keep.to_numpy(zero_copy_only=False)
        n_docs = len(batch)
        kept_counts = np.bincount(parents[keep_np], minlength=n_docs)
        removed_counts = np.bincount(parents[~keep_np], minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_values = pc.cast(flat.filter(keep), pa.large_string())
        if isinstance(kept_values, pa.ChunkedArray):
            kept_values = kept_values.combine_chunks()
        kept_lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_values
        )
        joined = pc.binary_join(kept_lists, pa.scalar("\n", pa.large_string()))
        joined = pc.if_else(
            pa.array(kept_counts > 0), pc.cast(joined, pa.string()),
            pa.scalar(None, pa.string()),
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_dedup": joined,
                "n_kept": pa.array(kept_counts, pa.int64()),
                "n_removed": pa.array(removed_counts, pa.int64()),
            }
        )

    return documents_ds.map_batches(scrub, batch_format="pyarrow")


def self_dedup_lines(documents_ds, text_col: str = "text",
                     id_col: str = "doc_id"):
    """WITHIN-document duplicate-line removal: keep the FIRST occurrence of
    each line inside a document, drop later repeats, rebuild the text
    (C4's intra-page cleanup step, the per-document complement of the
    corpus-wide :func:`line_dedup`).

    Pure per-batch work, zero shuffle, zero broadcast — the scrub is the
    same vectorized split → mask → offsets-rebuild → binary_join shape as
    line_dedup, with the keep mask computed by a first-occurrence
    ``duplicated`` test on (row, line) instead of a corpus-frequency
    lookup. A document always keeps its first line, so ``text_dedup`` is
    never null (empty text splits to one empty line, which survives).
    Returns (id_col, text_dedup, n_kept, n_removed).
    """
    import pandas as pd

    def scrub(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column(text_col), pattern="\n")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        keep_np = ~pd.DataFrame(
            {"row": parents, "line": flat.to_pandas()}
        ).duplicated(["row", "line"]).to_numpy()
        n_docs = len(batch)
        kept_counts = np.bincount(parents[keep_np], minlength=n_docs)
        removed_counts = np.bincount(parents[~keep_np], minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_values = pc.cast(
            flat.filter(pa.array(keep_np)), pa.large_string())
        if isinstance(kept_values, pa.ChunkedArray):
            kept_values = kept_values.combine_chunks()
        kept_lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_values
        )
        joined = pc.cast(
            pc.binary_join(kept_lists, pa.scalar("\n", pa.large_string())),
            pa.string())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_dedup": joined,
                "n_kept": pa.array(kept_counts, pa.int64()),
                "n_removed": pa.array(removed_counts, pa.int64()),
            }
        )

    return documents_ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental exact dedup against a persisted corpus hash index


_HASH_INDEX_ROUTING = "int(md5_hex[:8], 16) % n_partitions"


def _hash_with_partition(batch: pa.Table, n_partitions: int) -> pa.Table:
    """(doc_id, content_hash, part) in ONE pass — the md5 hex is uniform, so
    its leading 32 bits ARE the partition hash (no second per-row hash loop).
    This helper is the single home of the index routing contract
    (:data:`_HASH_INDEX_ROUTING`): build and probe both call it, so the two
    sides can never disagree on where a hash lives."""
    texts = batch.column("text").to_pylist()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    parts = [int(h[:8], 16) % n_partitions for h in hashes]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(hashes, pa.string()),
            pa.array(parts, pa.int64()),
        ],
        names=["doc_id", "content_hash", "part"],
    )


def build_hash_index(documents_ds, index_dir: str, n_partitions: int = 16):
    """Persist the corpus's content-hash set as Parquet partitioned by
    the hash's own leading 32 bits mod n_partitions — the "what have we
    already got" side of incremental ingestion. Each partition holds
    (content_hash, keeper_doc_id) with one row per DISTINCT hash, so
    re-ingesting a new crawl shard never rescans the existing corpus:
    lookups read only the partitions the new shard's hashes route to.
    Partition count + routing are recorded in index_meta.json (same layout
    contract as the inverted index). Refuses to write into a directory that
    already holds index partitions: Parquet files are uuid-named, so an
    in-place rebuild would silently MERGE stale hashes from the previous
    build into the new index."""
    import glob
    import json
    import os

    from ray.data.aggregate import Min

    if glob.glob(os.path.join(index_dir, "part=*")):
        raise ValueError(
            f"index_dir {index_dir!r} already contains index partitions; "
            "write to a fresh directory (or delete the old index) — an "
            "in-place rebuild would merge stale hashes from the prior build"
        )
    os.makedirs(index_dir, exist_ok=True)
    (
        documents_ds.map_batches(
            _hash_with_partition,
            batch_format="pyarrow",
            fn_kwargs={"n_partitions": n_partitions},
        )
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keeper_doc_id"),
                   Min("part", alias_name="part"))
        .write_parquet(index_dir, partition_cols=["part"])
    )
    with open(os.path.join(index_dir, "index_meta.json"), "w") as handle:
        json.dump(
            {"n_partitions": n_partitions, "routing": _HASH_INDEX_ROUTING},
            handle,
        )


def dedup_against_index(new_ds, index_dir: str, mode: str = "mark"):
    """Mark (or drop) rows of a NEW shard whose content hash already exists
    in a persisted :func:`build_hash_index` directory.

    Scale shape: the new shard is hashed per batch, reduced to (hash,
    doc_id, part) rows, and grouped by index partition; each group task
    reads ONLY its one index partition (partition-pruned — the existing
    corpus is never scanned) and membership-tests with a vectorized
    ``is_in``. ``mode="mark"`` returns (doc_id, content_hash, is_duplicate)
    for every new row; ``mode="filter"`` additionally drops duplicates.
    Within-shard duplicates are NOT collapsed here — run :func:`exact_dedup`
    on the survivors for that."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    if mode not in ("mark", "filter"):
        raise ValueError(f"mode must be 'mark' or 'filter', got {mode!r}")
    with open(os.path.join(index_dir, "index_meta.json")) as handle:
        meta = json.load(handle)
    n_partitions = meta["n_partitions"]
    routing = meta.get("routing", _HASH_INDEX_ROUTING)
    if routing != _HASH_INDEX_ROUTING:
        raise ValueError(
            f"index at {index_dir!r} was built with routing {routing!r}; "
            f"this engine probes with {_HASH_INDEX_ROUTING!r} — rebuild the "
            "index (probing a mismatched layout reports duplicates as unique)"
        )

    def probe(group: pa.Table) -> pa.Table:
        part = group.column("part")[0].as_py()
        paths = glob.glob(os.path.join(index_dir, f"part={part}", "*.parquet"))
        if paths:
            existing = pa.concat_tables(
                pq.read_table(p, columns=["content_hash"]) for p in paths
            ).column("content_hash")
            if isinstance(existing, pa.ChunkedArray):
                existing = existing.combine_chunks()
            dup = pc.is_in(group.column("content_hash"), value_set=existing)
        else:
            dup = pa.array(np.zeros(len(group), dtype=bool))
        out = pa.table(
            {
                "doc_id": group.column("doc_id"),
                "content_hash": group.column("content_hash"),
                "is_duplicate": dup,
            }
        )
        if mode == "filter":
            out = out.filter(pc.invert(out.column("is_duplicate")))
        return out

    return (
        new_ds.map_batches(
            _hash_with_partition,
            batch_format="pyarrow",
            fn_kwargs={"n_partitions": n_partitions},
        )
        .groupby("part")
        .map_groups(probe, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Exact substring (k-token span) duplication audit


def substring_dup_stats(documents_ds, k: int = 5, hashed: bool = False):
    """Per-document exact substring duplication, Lee-et-al-2022 style: a
    k-token window is *duplicated* when the identical window occurs anywhere
    else in the corpus (another document OR another position of the same
    document). Reports, per doc: token/window counts, how many of its
    windows are duplicated, and how many of its TOKENS are covered by at
    least one duplicated window (union of [pos, pos+k) intervals — the mass
    substring-dedup would remove).

    Scale shape: one tokenize pass emits (gram_key, doc_id, pos) rows plus a
    per-doc sentinel row carrying n_tokens — nothing else ever leaves a
    block. Shuffle 1 groups by gram and keeps only groups of ≥2 (the
    duplicated occurrences, a small fraction of gram rows); shuffle 2 groups
    those by doc and unions the fixed-length intervals vectorized
    (sum(min(diff(pos), k)) + k). Stats and coverage meet in a zero-filled
    union + one Sum groupby — no join, no broadcast.

    ``hashed=True`` is the 100-TB knob: gram keys become 64-bit md5 hashes
    (8 bytes/row instead of the gram text), trading a vanishing collision
    probability for a ~k× smaller shuffle; equivalence-tested against the
    exact string keys. Tokenization is textstats._lm_tokens — the same RE2
    ``\\s`` contract every token-level oracle uses.

    Output: (doc_id, n_tokens, n_grams, n_dup_grams, n_dup_tokens,
    dup_token_frac) with dup_token_frac = round6(n_dup_tokens /
    max(n_tokens, 1)), one row per input doc.
    """
    from ray.data.aggregate import Sum

    from .rounding import round_half_away
    from .textstats import _lm_tokens

    key_field = pa.int64() if hashed else pa.string()

    def gram_rows(batch: pa.Table) -> pa.Table:
        keys, docs, poss, ntoks = [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            tokens = _lm_tokens(text)
            # sentinel row (pos = -1) carries the doc's token count so the
            # final stats need no second tokenize pass over the corpus
            keys.append(0 if hashed else "")
            docs.append(doc_id)
            poss.append(-1)
            ntoks.append(len(tokens))
            for i in range(max(len(tokens) - k + 1, 0)):
                gram = " ".join(tokens[i : i + k])
                # 63-bit mask: _md5_u64 is unsigned and would overflow the
                # int64 key column (same convention as the LSH band hash)
                keys.append(
                    (_md5_u64(gram) & 0x7FFFFFFFFFFFFFFF) if hashed else gram
                )
                docs.append(doc_id)
                poss.append(i)
                ntoks.append(0)
        return pa.table(
            {
                "key": pa.array(keys, key_field),
                "doc_id": pa.array(docs, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
            }
        )

    rows = documents_ds.map_batches(gram_rows, batch_format="pyarrow")
    grams = rows.filter(expr="pos >= 0")
    stats = rows.filter(expr="pos < 0")

    # coarse hash partitions + vectorized per-partition folds: one Python
    # call per PARTITION, not per gram key / per doc (round 5 — see
    # _candidate_pairs_from_lsh for the map_groups-scaffolding rationale)
    n_partitions = 256

    def add_key_part(batch: pa.Table) -> pa.Table:
        if hashed:
            part = pc.cast(
                pc.bit_wise_and(batch.column("key"),
                                pa.scalar(n_partitions - 1, pa.int64())),
                pa.int32())
        else:
            import zlib

            part = pa.array(
                np.fromiter(
                    (zlib.crc32(g.encode("utf-8")) % n_partitions
                     for g in batch.column("key").to_pylist()),
                    dtype=np.int64, count=batch.num_rows,
                ), pa.int32())
        return batch.append_column("part", part)

    def dup_members_part(part_df) -> pa.Table:
        if part_df.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        sizes = part_df.groupby("key")["doc_id"].transform("size")
        kept = part_df[sizes >= 2]
        return pa.table({"doc_id": pa.array(kept["doc_id"].to_numpy(np.int64), pa.int64()),
                         "pos": pa.array(kept["pos"].to_numpy(np.int64), pa.int64())})

    dup_occ = (
        grams.map_batches(add_key_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_members_part, batch_format="pandas")
    )

    def add_doc_part(batch: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(batch.column("doc_id"),
                               pa.scalar(n_partitions - 1, pa.int64()))
        return batch.append_column("part", pc.cast(part, pa.int32()))

    def coverage_part(part_df) -> pa.Table:
        if part_df.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_dup_grams": pa.array([], pa.int64()),
                             "n_dup_tokens": pa.array([], pa.int64())})
        frame = part_df.sort_values(["doc_id", "pos"], kind="mergesort")
        d = frame["doc_id"].to_numpy(np.int64)
        p = frame["pos"].to_numpy(np.int64)
        n = len(d)
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        # covered tokens = Σ min(gap, k) over within-doc gaps, + k
        gap = np.minimum(np.r_[0, p[1:] - p[:-1]], k)
        gap[starts] = 0
        csum = np.cumsum(gap)
        ends = np.r_[starts[1:] - 1, n - 1]
        covered = (csum[ends] - csum[starts]) + k
        n_dup = np.r_[starts[1:], n] - starts
        return pa.table(
            {
                "doc_id": pa.array(d[starts], pa.int64()),
                "n_tokens": pa.array(np.zeros(len(starts), np.int64), pa.int64()),
                "n_grams": pa.array(np.zeros(len(starts), np.int64), pa.int64()),
                "n_dup_grams": pa.array(n_dup, pa.int64()),
                "n_dup_tokens": pa.array(covered, pa.int64()),
            }
        )

    cov = (
        dup_occ.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(coverage_part, batch_format="pandas")
    )

    def stat_rows(batch: pa.Table) -> pa.Table:
        n_tokens = batch.column("n_tokens")
        n_grams = pc.max_element_wise(
            pc.subtract(n_tokens, pa.scalar(k - 1, pa.int64())),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tokens,
                "n_grams": n_grams,
                "n_dup_grams": pa.nulls(len(batch), pa.int64()).fill_null(0),
                "n_dup_tokens": pa.nulls(len(batch), pa.int64()).fill_null(0),
            }
        )

    folded = (
        stats.map_batches(stat_rows, batch_format="pyarrow")
        .union(cov)
        .groupby("doc_id")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("n_grams", alias_name="n_grams"),
                   Sum("n_dup_grams", alias_name="n_dup_grams"),
                   Sum("n_dup_tokens", alias_name="n_dup_tokens"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "n_grams": pa.array([], pa.int64()),
                 "n_dup_grams": pa.array([], pa.int64()),
                 "n_dup_tokens": pa.array([], pa.int64()),
                 "dup_token_frac": pa.array([], pa.float64())}
            )
        n_tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        n_dup = batch.column("n_dup_tokens").to_numpy(zero_copy_only=False)
        frac = round_half_away(
            n_dup.astype(np.float64) / np.maximum(n_tok, 1).astype(np.float64), 6
        )
        return batch.append_column("dup_token_frac", pa.array(frac, pa.float64()))

    return folded.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental NEAR-dup against a persisted MinHash-LSH band index


_MINHASH_INDEX_ROUTING = "band_hash % n_partitions; signatures doc_id % n_partitions"


def _signature_rows(batch: pa.Table, hasher: "MinHasher", shingle_k: int,
                    n_partitions: int) -> pa.Table:
    """(doc_id, sig, sig_part) — one packed-uint64 minhash signature per doc."""
    doc_ids = batch.column("doc_id").to_pylist()
    sigs = [
        hasher.signature(shingle_set(t, shingle_k)).tobytes()
        for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sig": pa.array(sigs, pa.large_binary()),
            "sig_part": pa.array([d % n_partitions for d in doc_ids], pa.int64()),
        }
    )


def build_minhash_index(documents_ds, index_dir: str, num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 3, seed: int = 42,
                        n_partitions: int = 16):
    """Persist the corpus's MinHash-LSH state so a NEW crawl shard can be
    near-dup-checked against the existing 100-TB corpus without rescanning
    it (the fuzzy sibling of :func:`build_hash_index`):

    * ``bands/``      — exploded (doc_id, band_id, band_hash) rows, Parquet-
      partitioned by ``band_hash % n_partitions`` so a probe reads ONLY the
      partitions its own band hashes route to;
    * ``signatures/`` — one packed num_perm×uint64 signature per doc,
      partitioned by ``doc_id % n_partitions`` (the verify side reads only
      the partitions its candidate old-docs live in);
    * ``index_meta.json`` — every parameter a probe must reuse (permutation
      seed included: signatures from a different seed are incomparable) plus
      the routing contract, fail-fast-checked like the exact hash index.

    Refuses a non-empty index_dir for the same reason build_hash_index does
    (uuid-named parquet would silently merge stale state)."""
    import glob
    import json
    import os

    if glob.glob(os.path.join(index_dir, "bands")) or glob.glob(
        os.path.join(index_dir, "signatures")
    ):
        raise ValueError(
            f"index_dir {index_dir!r} already contains a minhash index; "
            "write to a fresh directory — an in-place rebuild would merge "
            "stale band/signature rows from the prior build"
        )
    os.makedirs(index_dir, exist_ok=True)

    def band_rows(batch: pa.Table) -> pa.Table:
        out = MinHashLSHBatch(num_perm, bands, shingle_k, seed)(batch)
        part = [h % n_partitions for h in out.column("band_hash").to_pylist()]
        return out.append_column("part", pa.array(part, pa.int64()))

    documents_ds.map_batches(band_rows, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "bands"), partition_cols=["part"]
    )
    hasher = MinHasher(num_perm, seed)
    documents_ds.map_batches(
        _signature_rows, batch_format="pyarrow",
        fn_kwargs={"hasher": hasher, "shingle_k": shingle_k,
                   "n_partitions": n_partitions},
    ).write_parquet(
        os.path.join(index_dir, "signatures"), partition_cols=["sig_part"]
    )
    with open(os.path.join(index_dir, "index_meta.json"), "w") as handle:
        json.dump(
            {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
             "seed": seed, "n_partitions": n_partitions,
             "routing": _MINHASH_INDEX_ROUTING},
            handle,
        )


def neardup_against_index(new_ds, index_dir: str, threshold: float = 0.5):
    """(new_doc_id, match_doc_id, est_jaccard) for every NEW-shard doc whose
    LSH bands collide with an indexed doc and whose signature agreement
    (the standard MinHash Jaccard estimate: fraction of equal components)
    is ≥ threshold.

    Scale shape — three grouped stages, no broadcast, corpus never rescanned:

    1. new band rows group by owning band partition; each probe task reads
       ONLY its ``bands/part=N`` files and equi-joins on (band_id,
       band_hash) → candidate pairs (deduped across bands by a groupby);
    2. candidates group by the OLD doc's signature partition; each task
       reads only its ``signatures/sig_part=N`` files → pairs carry the old
       signature out;
    3. pairs union with the new shard's own signature rows and group by
       new_doc_id — the verify runs inside the group with one numpy
       compare per candidate.
    """
    import glob
    import json
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    with open(os.path.join(index_dir, "index_meta.json")) as handle:
        meta = json.load(handle)
    routing = meta.get("routing", _MINHASH_INDEX_ROUTING)
    if routing != _MINHASH_INDEX_ROUTING:
        raise ValueError(
            f"minhash index at {index_dir!r} uses routing {routing!r}; this "
            f"engine probes with {_MINHASH_INDEX_ROUTING!r} — rebuild it"
        )
    num_perm = meta["num_perm"]
    n_partitions = meta["n_partitions"]

    def band_rows(batch: pa.Table) -> pa.Table:
        out = MinHashLSHBatch(meta["num_perm"], meta["bands"],
                              meta["shingle_k"], meta["seed"])(batch)
        part = [h % n_partitions for h in out.column("band_hash").to_pylist()]
        return out.append_column("part", pa.array(part, pa.int64()))

    def probe(group: pa.Table) -> pa.Table:
        import pandas as pd

        part = group.column("part")[0].as_py()
        paths = glob.glob(os.path.join(index_dir, "bands", f"part={part}",
                                       "*.parquet"))
        empty = pa.table({"new_doc_id": pa.array([], pa.int64()),
                          "old_doc_id": pa.array([], pa.int64())})
        if not paths:
            return empty
        index_rows = pa.concat_tables(
            pq.read_table(p, columns=["doc_id", "band_id", "band_hash"])
            for p in paths
        ).to_pandas()
        mine = group.select(["doc_id", "band_id", "band_hash"]).to_pandas()
        hit = mine.merge(index_rows, on=["band_id", "band_hash"],
                         suffixes=("_new", "_old"))
        if hit.empty:
            return empty
        pairs = hit[["doc_id_new", "doc_id_old"]].drop_duplicates()
        return pa.table(
            {"new_doc_id": pa.array(pairs["doc_id_new"].to_numpy(), pa.int64()),
             "old_doc_id": pa.array(pairs["doc_id_old"].to_numpy(), pa.int64())}
        )

    candidates = (
        new_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(probe, batch_format="pyarrow")
        # a pair can collide in several bands whose hashes land in
        # DIFFERENT partitions — dedup across partitions with a native
        # Count aggregate (not one Python call per pair)
        .groupby(["new_doc_id", "old_doc_id"])
        .aggregate(Count(alias_name="_bands"))
        .map_batches(
            lambda t: t.select(["new_doc_id", "old_doc_id"]),
            batch_format="pyarrow")
    )

    def attach_old_sig(group: pa.Table) -> pa.Table:
        part = group.column("old_doc_id")[0].as_py() % n_partitions
        paths = glob.glob(os.path.join(index_dir, "signatures",
                                       f"sig_part={part}", "*.parquet"))
        sig_map = {}
        for p in paths:
            t = pq.read_table(p, columns=["doc_id", "sig"])
            sig_map.update(zip(t.column("doc_id").to_pylist(),
                               t.column("sig").to_pylist()))
        return pa.table(
            {
                "new_doc_id": group.column("new_doc_id"),
                "old_doc_id": group.column("old_doc_id"),
                "payload": pa.array(
                    [sig_map[d] for d in group.column("old_doc_id").to_pylist()],
                    pa.large_binary(),
                ),
                "role": pa.array([1] * len(group), pa.int8()),
            }
        )

    def old_part_col(batch: pa.Table) -> pa.Table:
        part = [d % n_partitions for d in batch.column("old_doc_id").to_pylist()]
        return batch.append_column("old_part", pa.array(part, pa.int64()))

    with_old_sig = (
        candidates.map_batches(old_part_col, batch_format="pyarrow")
        .groupby("old_part")
        .map_groups(attach_old_sig, batch_format="pyarrow")
    )

    hasher = MinHasher(num_perm, meta["seed"])

    def new_sig_rows(batch: pa.Table) -> pa.Table:
        sigs = _signature_rows(batch, hasher, meta["shingle_k"], n_partitions)
        return pa.table(
            {
                "new_doc_id": sigs.column("doc_id"),
                "old_doc_id": pa.array([-1] * len(sigs), pa.int64()),
                "payload": sigs.column("sig"),
                "role": pa.array([0] * len(sigs), pa.int8()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        from .rounding import round_half_away

        roles = group.column("role").to_pylist()
        payloads = group.column("payload").to_pylist()
        new_sig = None
        for role, payload in zip(roles, payloads):
            if role == 0:
                new_sig = np.frombuffer(payload, dtype=np.uint64)
                break
        out_new, out_old, out_est = [], [], []
        if new_sig is not None:
            olds = group.column("old_doc_id").to_pylist()
            news = group.column("new_doc_id").to_pylist()
            for role, payload, old, new in zip(roles, payloads, olds, news):
                if role != 1:
                    continue
                old_sig = np.frombuffer(payload, dtype=np.uint64)
                est = float((new_sig == old_sig).mean())
                if est >= threshold:
                    out_new.append(new)
                    out_old.append(old)
                    out_est.append(float(round_half_away(est, 6)))
        return pa.table(
            {
                "new_doc_id": pa.array(out_new, pa.int64()),
                "match_doc_id": pa.array(out_old, pa.int64()),
                "est_jaccard": pa.array(out_est, pa.float64()),
            }
        )

    return (
        new_ds.map_batches(new_sig_rows, batch_format="pyarrow")
        .union(with_old_sig)
        .groupby("new_doc_id")
        .map_groups(verify, batch_format="pyarrow")
    )


def substring_scrub(documents_ds, k: int = 5, hashed: bool = False):
    """Exact substring-duplication REMOVAL (the rewrite step of Lee et al.
    2022 — ``substring_dup_stats`` is the audit): every occurrence of a
    corpus-duplicated k-token window is removed except one canonical copy.

    Deterministic contract (restatable in SQL, so the driver hash-checks
    the rewrite end to end):

    * a k-gram is *duplicated* when its exact text occurs ≥ 2 times in the
      corpus (any doc, any position);
    * the CANONICAL occurrence of each duplicated gram is the (doc_id, pos)
      minimum — first position of the first document;
    * a token is dropped iff some non-canonical duplicated occurrence
      covers it AND no canonical occurrence does (canonical spans protect
      their tokens, so the kept copy always survives intact);
    * the document rebuilds from its kept tokens joined by single spaces —
      the standard tokenized-rebuild contract shared with ``line_dedup``.

    Scale shape: one tokenize pass emits (gram, doc_id, pos) rows; shuffle
    1 groups by gram, keeps only ≥2-occurrence groups and flags the
    canonical row (groups sort internally — gram groups are tiny); the doc
    rows and the flagged occurrences meet in a union + ONE groupby(doc_id)
    — no join, no broadcast, nothing driver-sized. Output: (doc_id,
    n_tokens, n_kept, text_out) for every doc with ≥ 1 token.

    ``hashed=True`` is the 100-TB knob, as in ``substring_dup_stats``:
    63-bit md5 gram keys (8 bytes/row) instead of the gram text — a
    vanishing collision probability for a ~k× smaller shuffle;
    equivalence-tested against exact string keys.

    NOTE: ``documents_ds`` is consumed TWICE (gram census + doc rebuild);
    Ray re-executes lazy lineage per consumer, so pass a materialized
    dataset when the upstream is more than a parquet read (a plain re-read
    is usually cheaper than materializing the corpus into the object
    store — the composed ``curation_prep`` materializes its gated
    survivors for exactly this reason).
    """
    from .textstats import _lm_tokens

    key_field = pa.int64() if hashed else pa.string()

    def gram_rows(batch: pa.Table) -> pa.Table:
        grams, docs, poss = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            tokens = _lm_tokens(text)
            for i in range(max(len(tokens) - k + 1, 0)):
                gram = " ".join(tokens[i : i + k])
                grams.append(
                    (_md5_u64(gram) & 0x7FFFFFFFFFFFFFFF) if hashed else gram
                )
                docs.append(doc_id)
                poss.append(i)
        return pa.table(
            {
                "key": pa.array(grams, key_field),
                "doc_id": pa.array(docs, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
            }
        )

    # coarse hash partitions + one vectorized pandas fold per partition
    # (round 5): unique grams drop, the first (doc_id, pos) occurrence per
    # duplicated gram is canonical — same semantics as the old per-gram
    # map_groups at a fraction of the scaffolding
    n_partitions = 256

    def add_key_part(batch: pa.Table) -> pa.Table:
        if hashed:
            part = pc.cast(
                pc.bit_wise_and(batch.column("key"),
                                pa.scalar(n_partitions - 1, pa.int64())),
                pa.int32())
        else:
            import zlib

            part = pa.array(
                np.fromiter(
                    (zlib.crc32(g.encode("utf-8")) % n_partitions
                     for g in batch.column("key").to_pylist()),
                    dtype=np.int64, count=batch.num_rows,
                ), pa.int32())
        return batch.append_column("part", part)

    def flag_part(part_df) -> pa.Table:
        if part_df.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "canon": pa.array([], pa.bool_())})
        sizes = part_df.groupby("key")["doc_id"].transform("size")
        dup = part_df[sizes >= 2]
        frame = dup.sort_values(["key", "doc_id", "pos"], kind="mergesort")
        canon = ~frame.duplicated("key").to_numpy()
        return pa.table({
            "doc_id": pa.array(frame["doc_id"].to_numpy(np.int64), pa.int64()),
            "pos": pa.array(frame["pos"].to_numpy(np.int64), pa.int64()),
            "canon": pa.array(canon, pa.bool_()),
        })

    occurrences = (
        documents_ds.map_batches(gram_rows, batch_format="pyarrow")
        .map_batches(add_key_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(flag_part, batch_format="pandas")
    )

    def occ_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
                "canon": batch.column("canon"),
                "text": pa.nulls(n, pa.string()),
            }
        )

    def doc_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": pa.nulls(n, pa.int64()),
                "canon": pa.nulls(n, pa.bool_()),
                "text": batch.column("text"),
            }
        )

    import pandas as pd

    def rebuild(group: pd.DataFrame) -> pa.Table:
        schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                            ("n_kept", pa.int64()), ("text_out", pa.string())])
        doc_rows = group[group["text"].notna()]
        if doc_rows.empty:
            return schema.empty_table()
        tokens = _lm_tokens(str(doc_rows["text"].iloc[0]))
        n = len(tokens)
        if n == 0:
            return schema.empty_table()
        occ = group[group["text"].isna()]
        drop_cover = np.zeros(n + 1, dtype=np.int64)
        keep_cover = np.zeros(n + 1, dtype=np.int64)
        for pos, canon in zip(occ["pos"].astype("int64"),
                              occ["canon"].astype("bool")):
            lo, hi = int(pos), min(int(pos) + k, n)
            if canon:
                keep_cover[lo] += 1
                keep_cover[hi] -= 1
            else:
                drop_cover[lo] += 1
                drop_cover[hi] -= 1
        dropped = (np.cumsum(drop_cover[:n]) > 0) & ~(
            np.cumsum(keep_cover[:n]) > 0)
        kept = [t for t, d in zip(tokens, dropped) if not d]
        return pa.table(
            {
                "doc_id": pa.array([int(doc_rows["doc_id"].iloc[0])],
                                   pa.int64()),
                "n_tokens": pa.array([n], pa.int64()),
                "n_kept": pa.array([len(kept)], pa.int64()),
                "text_out": pa.array([" ".join(kept)], pa.string()),
            }
        )

    return (
        occurrences.map_batches(occ_side, batch_format="pyarrow")
        .union(documents_ds.map_batches(doc_side, batch_format="pyarrow"))
        .groupby("doc_id")
        .map_groups(rebuild, batch_format="pandas")
    )
