"""Distributed prefix-sum (scan) and fixed-length sequence packing.

The last stage of a training-data pipeline: documents, already tokenized,
filtered, and deduplicated, are concatenated in a deterministic key order
(doc_id) with a separator token between docs, and the resulting token
stream is cut into fixed ``seq_len`` training sequences. Knowing where each
document lands requires an EXCLUSIVE PREFIX SUM of token counts in key
order — a global scan, which a 100-TB corpus cannot compute by
sort-then-iterate on one machine, and which Ray Data has no primitive for
(blocks carry no global order). The classic two-level scan applies:

1. one pass computes the key range (per-block min/max partials, folded on
   the driver);
2. keys are RANGE-bucketed — ``bucket = (key - lo) // width`` — so bucket
   order == key order; a per-block combiner emits at most one
   (bucket, partial_sum) row per bucket per block, one small groupby folds
   them, and the driver exclusive-prefix-sums the ``n_buckets`` bucket
   totals (O(n_buckets) driver rows, never corpus rows);
3. the bucket base offsets broadcast back (a few KB) inside one
   ``groupby(bucket).map_groups`` pass: each group sorts by key and
   cumsums locally.

The only all-to-all traffic is the narrow (key, count) projection — which
is materialized once so the (possibly expensive) upstream lineage, e.g. a
tokenizer, runs exactly once across the three passes.

Layout-independence: every output number is a pure function of the
(key, count) multiset, pinned in tests across repartitions. Contract: the
key column is integer and UNIQUE (duplicates make "prefix" ambiguous —
fail-fast), counts are non-null and non-negative. A skewed key distribution
still gives correct results, just uneven groups; doc ids are near-dense in
practice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _empty(schema: pa.Schema):
    import ray.data

    return ray.data.from_arrow(schema.empty_table())


def _key_range(proj, key: str):
    """(lo, hi) of ``key`` via per-block partials — one row per block to
    the driver. Returns None on an empty dataset."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        column = batch.column(key)
        if column.null_count:
            raise ValueError(f"prefix_offsets: null {key!r} value")
        if len(column) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({
            "lo": pa.array([pc.min(column).as_py()], pa.int64()),
            "hi": pa.array([pc.max(column).as_py()], pa.int64()),
        })

    blocks = [
        b
        for b in ray.get(
            proj.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_columns > 0 and b.num_rows > 0
    ]
    if not blocks:
        return None
    folded = pa.concat_tables(blocks)
    return (pc.min(folded.column("lo")).as_py(),
            pc.max(folded.column("hi")).as_py())


def prefix_offsets(ds, key: str, count_col: str, n_buckets: int = 256,
                   extra_per_row: int = 0):
    """Exclusive prefix sum of ``count_col + extra_per_row`` in ``key``
    order: adds ``start_offset`` (int64). Output rows are
    (key, count_col, start_offset); join back on ``key`` for payloads.

    ``extra_per_row`` models a fixed per-row overhead in the stream (e.g.
    one end-of-document separator token) that widens the stride without
    appearing in the stored count.
    """
    offsets, _ = _prefix_offsets_impl(ds, key, count_col, n_buckets,
                                      extra_per_row)
    return offsets


def _prefix_offsets_impl(ds, key: str, count_col: str, n_buckets: int,
                         extra_per_row: int):
    """(offsets dataset, is_empty) — the emptiness flag comes free from the
    key-range probe, so callers that must special-case an empty corpus
    (pack_sequences: Ray drops zero-row blocks, losing the schema) don't
    pay a count() that would re-execute the scan lineage."""
    import ray
    from ray.data.aggregate import Sum

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    proj = ds.select_columns([key, count_col]).materialize()
    out_schema = pa.schema([
        (key, pa.int64()), (count_col, pa.int64()),
        ("start_offset", pa.int64()),
    ])
    rng = _key_range(proj, key)
    if rng is None:
        return _empty(out_schema), True
    lo, hi = rng
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def _counts(batch: pa.Table) -> np.ndarray:
        column = batch.column(count_col)
        if column.null_count:
            raise ValueError(f"prefix_offsets: null {count_col!r} value")
        c = column.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) and c.min() < 0:
            raise ValueError(f"prefix_offsets: negative {count_col!r} value")
        return c + extra_per_row

    def partial_sums(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        c = _counts(batch)
        buckets = (k - lo) // width
        uniq, inverse = np.unique(buckets, return_inverse=True)
        # int64 accumulator — np.bincount(weights=...) would round through
        # float64, which stops being exact past 2^53 total tokens
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inverse, c)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "psum": pa.array(sums, pa.int64())})

    folded = (
        proj.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("psum", alias_name="total"))
    )
    blocks = [
        b for b in ray.get(folded.to_arrow_refs())
        if b.num_columns > 0 and b.num_rows > 0
    ]
    totals = pa.concat_tables(blocks).sort_by("bucket")
    bucket_ids = totals.column("bucket").to_numpy(zero_copy_only=False)
    bucket_totals = totals.column("total").to_numpy(zero_copy_only=False)
    # exclusive prefix over bucket totals, in bucket (== key-range) order
    bases = np.concatenate(([0], np.cumsum(bucket_totals[:-1]))).astype(np.int64)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((k - lo) // width, pa.int64()))

    def scan_group(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return out_schema.empty_table()
        g = group.take(pc.sort_indices(group, sort_keys=[(key, "ascending")]))
        k = g.column(key).to_numpy(zero_copy_only=False)
        if len(k) > 1 and (k[1:] == k[:-1]).any():
            dup = int(k[1:][k[1:] == k[:-1]][0])
            raise ValueError(
                f"prefix_offsets: duplicate {key!r} value {dup} — the scan "
                "order is ambiguous; deduplicate or use a unique key")
        c = _counts(g)
        bucket = int(g.column("bucket")[0].as_py())
        base = bases[np.searchsorted(bucket_ids, bucket)]
        starts = base + np.concatenate(([0], np.cumsum(c[:-1])))
        return pa.table({
            key: g.column(key),
            count_col: pc.cast(g.column(count_col), pa.int64()),
            "start_offset": pa.array(starts, pa.int64()),
        })

    return (
        proj.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan_group, batch_format="pyarrow")
    ), False


def chunk_spans(ds, key: str, count_col: str, chunk_len: int,
                overlap: int = 0):
    """Sliding-window chunking for retrieval / context windows: split each
    document's token stream into chunks of ``chunk_len`` tokens advancing by
    ``chunk_len - overlap`` (so consecutive chunks share ``overlap`` tokens).
    Emits one row per chunk: (key, chunk_id, start_tok, end_tok, n_chunks)
    with end exclusive and the final chunk clamped to the doc length.

    Contract: a doc with 0 tokens emits no chunks; a doc with
    n <= overlap tokens emits exactly one chunk [0, n); otherwise
    n_chunks = ceil((n - overlap) / stride). Pure per-batch math — no
    shuffle, no driver state; the 100-TB shape is a single streaming pass
    (actual chunk TEXT is a later gather against these offsets)."""
    if chunk_len < 1:
        raise ValueError("chunk_len must be >= 1")
    if overlap < 0 or overlap >= chunk_len:
        raise ValueError("overlap must be in [0, chunk_len)")
    stride = chunk_len - overlap
    out_schema = pa.schema([
        (key, pa.int64()), ("chunk_id", pa.int64()),
        ("start_tok", pa.int64()), ("end_tok", pa.int64()),
        ("n_chunks", pa.int64()),
    ])

    def spans(batch: pa.Table) -> pa.Table:
        if batch.column(key).null_count:
            raise ValueError(f"chunk_spans: null {key!r} value")
        column = batch.column(count_col)
        if column.null_count:
            raise ValueError(f"chunk_spans: null {count_col!r} value")
        n = column.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n) and n.min() < 0:
            raise ValueError(f"chunk_spans: negative {count_col!r} value")
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        mask = n > 0
        n, keys = n[mask], keys[mask]
        if len(n) == 0:
            return out_schema.empty_table()
        n_chunks = np.maximum(1, (n - overlap + stride - 1) // stride)
        reps = np.repeat(np.arange(len(n)), n_chunks)
        total = int(n_chunks.sum())
        chunk_id = (np.arange(total)
                    - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        start = chunk_id * stride
        end = np.minimum(start + chunk_len, n[reps])
        return pa.table({
            key: pa.array(keys[reps].astype(np.int64), pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "end_tok": pa.array(end, pa.int64()),
            "n_chunks": pa.array(n_chunks[reps], pa.int64()),
        })

    return ds.map_batches(spans, batch_format="pyarrow")


def pack_sequences(ds, key: str, count_col: str, seq_len: int,
                   doc_sep: int = 1, n_buckets: int = 256):
    """Assign each document its slice of the packed fixed-length training
    sequences: concatenate docs in ``key`` order, ``doc_sep`` separator
    tokens after each doc, cut the stream every ``seq_len`` tokens.

    Output per row: (key, count_col, start_offset, first_seq, last_seq,
    n_seqs) — ``first_seq``/``last_seq`` index the sequences holding the
    doc's own tokens (separators excluded); an empty doc occupies no tokens
    and reports its insertion point (first_seq == last_seq, n_seqs = 1).
    """
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    if doc_sep < 0:
        raise ValueError("doc_sep must be >= 0")
    out_schema = pa.schema([
        (key, pa.int64()), (count_col, pa.int64()),
        ("start_offset", pa.int64()), ("first_seq", pa.int64()),
        ("last_seq", pa.int64()), ("n_seqs", pa.int64()),
    ])
    offsets, is_empty = _prefix_offsets_impl(ds, key, count_col, n_buckets,
                                             doc_sep)
    if is_empty:
        # Ray drops zero-row map_batches outputs, which would leave the
        # result schema-less and break downstream sorts on an empty corpus
        return _empty(out_schema)

    def seqs(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        start = batch.column("start_offset").to_numpy(zero_copy_only=False)
        c = batch.column(count_col).to_numpy(zero_copy_only=False)
        first = start // seq_len
        last = np.where(c > 0, (start + c - 1) // seq_len, first)
        return pa.table({
            key: batch.column(key),
            count_col: batch.column(count_col),
            "start_offset": batch.column("start_offset"),
            "first_seq": pa.array(first, pa.int64()),
            "last_seq": pa.array(last, pa.int64()),
            "n_seqs": pa.array(last - first + 1, pa.int64()),
        })

    return offsets.map_batches(seqs, batch_format="pyarrow")


def shard_manifest(ds, key: str, count_col: str, shard_size: int,
                   n_buckets: int = 256):
    """Deterministic size-balanced output sharding — the planning step of
    resumable partitioned writes (SURVEY.md §4 / run.py's part_ dirs):
    concatenate rows in ``key`` order and open a new shard every
    ``shard_size`` counted units (shard = start_offset // shard_size, the
    running-total rule, so assignment is layout-independent and a rerun
    reproduces the same manifest bit-for-bit).

    Returns one row per shard: (shard, n_rows, total_<count_col>,
    first_<key>, last_<key>) — the manifest a writer consults to skip
    already-written shards on resume. No row is split: a row belongs to
    the shard its START offset lands in, so a shard can exceed
    ``shard_size`` by up to one row's width (running-total bucketing, not
    next-fit) and a row wider than ``shard_size`` leaves the following
    shard indices empty.

    Scale shape: the two-level range-bucketed scan (prefix_offsets) plus
    ONE shard-keyed groupby of per-block combiner partials; the manifest is
    output-sized (corpus_bytes / shard_size rows), never corpus-sized.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    out_schema = pa.schema([
        ("shard", pa.int64()), ("n_rows", pa.int64()),
        (f"total_{count_col}", pa.int64()),
        (f"first_{key}", pa.int64()), (f"last_{key}", pa.int64()),
    ])
    offsets, is_empty = _prefix_offsets_impl(ds, key, count_col, n_buckets, 0)
    if is_empty:
        return _empty(out_schema)

    def tag_shard(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema([
                ("shard", pa.int64()), (key, pa.int64()),
                (count_col, pa.int64()),
            ]).empty_table()
        start = batch.column("start_offset").to_numpy(zero_copy_only=False)
        return pa.table({
            "shard": pa.array(start // shard_size, pa.int64()),
            key: batch.column(key),
            count_col: batch.column(count_col),
        })

    agg = (
        offsets.map_batches(tag_shard, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Count(alias_name="n_rows"),
            Sum(count_col, alias_name=f"total_{count_col}"),
            Min(key, alias_name=f"first_{key}"),
            Max(key, alias_name=f"last_{key}"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "shard": batch.column("shard"),
            "n_rows": batch.column("n_rows").cast(pa.int64()),
            f"total_{count_col}":
                batch.column(f"total_{count_col}").cast(pa.int64()),
            f"first_{key}": batch.column(f"first_{key}").cast(pa.int64()),
            f"last_{key}": batch.column(f"last_{key}").cast(pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def epoch_shuffle(ds, key: str = "doc_id", epoch: int = 0,
                  n_shards: int = 8, salt: str = ""):
    """Deterministic EPOCH SHUFFLE — the training-order step between
    curation and the data loader: give every row a pseudo-random but fully
    reproducible position inside one of ``n_shards`` loader shards, so the
    same (epoch, salt) always yields the same byte-identical order on any
    cluster, any block layout, any retry (no RNG, no seed state to ship —
    the md5 of ``epoch:<epoch>:<salt>:<key>`` IS the permutation).

    Output: one row per input row — (key, shard, pos, shuffle_key) with
    ``pos`` the 0-based rank of the row inside its shard ordered by
    (shuffle_key, key).

    Scale shape (the reason this isn't ``random_shuffle()``): ranking
    within a shard is a global sort, which at corpus scale must not funnel
    a shard's rows into one task. The shuffle key is a 32-hex md5, so its
    FIRST 3 HEX CHARS are an order-preserving range bucket (hex strings of
    equal length sort lexicographically == numerically): per-(shard,
    bucket) counts fold through one combiner-bounded groupby
    (≤ n_shards·4096 rows reach the driver — bounded, never corpus-sized,
    the same contract as prefix_offsets), the driver exclusive-scans each
    shard's bucket counts, and one ``groupby(shard, bucket).map_groups``
    pass sorts each ~1/4096-of-a-shard slice locally and adds its bucket
    base. The shard id comes from the full first-8-hex value mod n_shards
    (for power-of-two n_shards that is the LOW bits — independent of the
    bucket's top 12 bits, so shard×bucket groups stay balanced). The
    stamped projection is materialized once so the md5 pass runs once
    across the two consumers.
    """
    import hashlib

    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    prefix = f"epoch:{epoch}:{salt}:"

    def stamp(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_pylist()
        full = [
            hashlib.md5((prefix + str(v)).encode("utf-8")).hexdigest()
            for v in vals
        ]
        shard = (
            np.array([int(h[:8], 16) for h in full], dtype=np.int64)
            % n_shards
        )
        bucket = np.array([int(h[:3], 16) for h in full], dtype=np.int64)
        return pa.table({
            key: batch.column(key),
            "shuffle_key": pa.array(full, pa.string()),
            "shard": pa.array(shard, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        })

    stamped = ds.map_batches(stamp, batch_format="pyarrow").materialize()
    count_rows = (
        stamped.groupby(["shard", "bucket"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    count_rows.sort(key=lambda r: (r["shard"], r["bucket"]))
    offsets: dict = {}
    running: dict = {}
    for r in count_rows:
        s = r["shard"]
        offsets[(s, r["bucket"])] = running.get(s, 0)
        running[s] = running.get(s, 0) + r["n"]
    offsets_ref = ray.put(offsets)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(offsets_ref)[
            (int(df["shard"].iloc[0]), int(df["bucket"].iloc[0]))
        ]
        df = df.sort_values(["shuffle_key", key]).reset_index(drop=True)
        return pd.DataFrame({
            key: df[key],
            "shard": df["shard"],
            "pos": base + np.arange(len(df), dtype=np.int64),
            "shuffle_key": df["shuffle_key"],
        })

    return stamped.groupby(["shard", "bucket"]).map_groups(
        rank, batch_format="pandas")
