"""Benchmark decontamination: mark/drop training documents that share a
word n-gram with an evaluation set (the GPT-3/PaLM-style 13-gram overlap
filter every LLM training pipeline runs before training).

Scale shape: the eval set is benchmark-sized (thousands to low millions of
n-grams), so its DISTINCT n-gram hash set is computed once, sorted, and
broadcast (``ray.put`` once, read per task); the training corpus streams
through one ``map_batches`` pass that computes token n-gram hashes with a
vectorized rolling polynomial over per-token 64-bit hashes (polars string
hash — no Python token loop) and membership-tests them with
``np.searchsorted`` against the broadcast array. Documents never shuffle;
the only driver-side materialization is the eval hash set.

Semantics (mirrored by the SQL oracle in pipelines/queries.py):

* tokenization = regex ``\s``-whitespace split with empty tokens dropped
  (DuckDB ``list_filter(string_split_regex(text,'\s+'), x -> x <> '')``)
  — the SAME RE2 ``\s`` class on both sides, so Unicode-only whitespace
  (e.g. NBSP) stays inside tokens in the engine exactly as it does in the
  oracle;
* an n-gram is a contiguous window of n tokens; a document is contaminated
  when any of its n-grams equals any eval-set n-gram;
* ``n_hits`` counts DISTINCT eval n-grams found in the document.

Matching is on 64-bit n-gram hashes, so two distinct grams collide with
probability ~2^-64 — negligible, and irrelevant for the drop decision's
recall (collisions only ever ADD contamination flags).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HASH_SEED = 42
_POLY = np.uint64(1099511628211)  # FNV-1a prime; uint64 wraparound


def _token_hashes(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat token u64 hashes, parent doc index per token) for a string
    array, with the whitespace-split-drop-empties tokenization contract."""
    import polars as pl

    # collapse and trim with the SAME RE2 \s class the SQL oracle's
    # string_split_regex uses — utf8_trim_whitespace would also strip
    # Unicode-only whitespace (NBSP) that \s does not match, silently
    # changing the n-gram stream vs the oracle
    collapsed = pc.utf8_trim(
        pc.replace_substring_regex(texts, r"\s+", " "), " "
    )
    parts = pc.split_pattern(collapsed, " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    # a fully-whitespace doc collapses to "" and splits to [""] — drop it
    nonempty = pc.not_equal(flat, "")
    keep = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    parents = parents[keep]
    if len(flat) == 0:
        return np.empty(0, np.uint64), parents
    hashes = pl.from_arrow(flat).hash(seed=_HASH_SEED).to_numpy()
    return hashes.astype(np.uint64, copy=False), parents


def _ngram_hashes(texts: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(window hash, parent doc index) for every token-aligned n-gram.
    Rolling polynomial: h = ((t0*P + t1)*P + t2)... — n vector ops total."""
    tok, parents = _token_hashes(texts)
    if len(tok) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    m = len(tok) - n + 1
    acc = tok[:m].copy()
    for j in range(1, n):
        acc *= _POLY
        acc += tok[j : m + j]
    valid = parents[:m] == parents[n - 1 :]
    return acc[valid], parents[:m][valid]


def eval_ngram_hashes(eval_ds, n: int = 13, text_col: str = "text") -> np.ndarray:
    """Sorted distinct n-gram hash array of the evaluation set (the
    broadcast side). Eval sets are benchmark-sized, so the driver-side
    unique of per-block partials is small by construction."""
    import ray

    def partials(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hashes, _ = _ngram_hashes(col, n)
        return pa.table({"h": pa.array(np.unique(hashes), pa.uint64())})

    blocks = ray.get(
        eval_ds.map_batches(partials, batch_format="pyarrow").to_arrow_refs()
    )
    parts = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in blocks
        if b.num_columns > 0 and b.num_rows > 0
    ]
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(train_ds, eval_ds, n: int = 13, text_col: str = "text",
                  id_col: str = "doc_id", mode: str = "mark"):
    """Mark (or drop) training documents sharing any word n-gram with
    ``eval_ds``.

    ``mode="mark"`` returns (id_col, n_hits, contaminated) for every
    training document; ``mode="filter"`` returns the surviving training
    rows with their original columns. Both are a single streaming pass
    over the training corpus against the broadcast eval hash set."""
    import ray

    if mode not in ("mark", "filter"):
        raise ValueError(f"mode must be 'mark' or 'filter', got {mode!r}")
    eval_ref = ray.put(eval_ngram_hashes(eval_ds, n, text_col))

    def doc_hits(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        eval_hashes = ray.get(eval_ref)
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        grams, parents = _ngram_hashes(col, n)
        n_docs = len(batch)
        if len(grams) == 0 or len(eval_hashes) == 0:
            return np.zeros(n_docs, np.int64), np.zeros(n_docs, bool)
        idx = np.searchsorted(eval_hashes, grams)
        idx[idx == len(eval_hashes)] = 0
        member = eval_hashes[idx] == grams
        # distinct eval grams per doc: unique (parent, hash) pairs
        hit_pairs = np.unique(
            np.stack([parents[member].astype(np.uint64), grams[member]], axis=1),
            axis=0,
        )
        n_hits = np.bincount(hit_pairs[:, 0].astype(np.int64), minlength=n_docs)
        return n_hits.astype(np.int64), n_hits > 0

    if mode == "mark":

        def mark(batch: pa.Table) -> pa.Table:
            n_hits, contaminated = doc_hits(batch)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_hits": pa.array(n_hits, pa.int64()),
                    "contaminated": pa.array(contaminated),
                }
            )

        return train_ds.map_batches(mark, batch_format="pyarrow")

    def keep_clean(batch: pa.Table) -> pa.Table:
        _, contaminated = doc_hits(batch)
        return batch.filter(pa.array(~contaminated))

    return train_ds.map_batches(keep_clean, batch_format="pyarrow")
