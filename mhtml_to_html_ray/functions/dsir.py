"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much its hashed n-gram
feature counts look like a TARGET corpus rather than the RAW corpus, then
keep the top-k. The public recipe: hash bigrams into a FIXED number of
buckets, fit two bag-of-buckets unigram models (target vs raw, add-1
smoothed), and weight each document by its log-likelihood ratio.

Scale shape (the reason hashed features exist): the learned state is
exactly ``n_buckets`` log-ratio integers — bounded by construction, unlike
a vocabulary — so the two corpus passes are

1. bucket-count partials per batch (B-sized rows) → one B-row groupby;
   the B-row result is the ONLY thing the driver ever holds, and it is
   broadcast once via ``ray.put``;
2. a stateless map_batches scoring pass (factorize bigrams per batch, md5
   once per distinct bigram, fold with one bincount), then per-block top-k
   so the final exchange is ``n_blocks × k`` rows, never corpus-sized.

Determinism contract (what makes a log-ratio score SQL-oracle-checkable):
the per-bucket ratio is quantized to integer micros —

    r_b = floor(1e6 * (ln((tc_b+1)/(tt+B)) - ln((rc_b+1)/(rt+B))))

computed with the same libm doubles DuckDB's LN uses (the ccnet/tfidf
precedent), and the per-doc weight Σ c_b·r_b is then an integer sum, so it
commutes across any shuffle order. |r_b| < ~40·1e6 and per-doc bigram
counts are < 2^20, so the float64 bincount accumulator stays exact
(every partial sum is an integer far below 2^53) before the int64 cast.

Tokenizer + hashing are shared with ``hashed_bigram_classifier``:
``_lm_tokens`` whitespace tokens, ``"a b"`` bigram strings, md5-hex-prefix
buckets — the oracle restates the identical arithmetic in SQL.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _bigram_buckets(uniques, n_buckets: int) -> np.ndarray:
    """THE md5-hex-prefix bucket map — the single home of the hashing
    contract both corpus passes and the SQL oracles restate
    (int(md5(bigram)[:8], 16) % n_buckets)."""
    return np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % n_buckets
         for u in uniques),
        dtype=np.int64, count=len(uniques))


def _bucket_partials(n_buckets: int, target_col: str, target_value: str):
    """Per-batch combiner: (bucket, raw_n, tgt_n) counts, ≤ B rows out."""

    def partials(batch: pa.Table) -> pa.Table:
        from .textstats import _lm_tokens

        texts = batch.column("text").to_pylist()
        flags = [v == target_value
                 for v in batch.column(target_col).to_pylist()]
        raw = np.zeros(n_buckets, np.int64)
        tgt = np.zeros(n_buckets, np.int64)
        bigrams: list[str] = []
        spans: list[tuple[int, bool]] = []
        for text, is_tgt in zip(texts, flags):
            tokens = _lm_tokens(text) if text is not None else []
            pairs = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
            bigrams.extend(pairs)
            spans.append((len(pairs), is_tgt))
        if bigrams:
            codes, uniques = pd.factorize(pd.Series(bigrams))
            buckets = _bigram_buckets(uniques, n_buckets)[codes]
            doc_tgt = np.repeat(
                np.fromiter((t for _, t in spans), dtype=bool,
                            count=len(spans)),
                np.fromiter((n for n, _ in spans), dtype=np.int64,
                            count=len(spans)))
            raw += np.bincount(buckets, minlength=n_buckets).astype(np.int64)
            tgt += np.bincount(buckets[doc_tgt],
                               minlength=n_buckets).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "raw_n": pa.array(raw),
            "tgt_n": pa.array(tgt),
        })

    return partials


def dsir_ratios(documents_ds, n_buckets: int = 64,
                target_col: str = "lang", target_value: str = "en"):
    """Fit the two hashed-bigram bag models and return the quantized
    per-bucket log-ratio as an int64 numpy array of length ``n_buckets``
    (plus the raw/target occurrence totals). One corpus pass, one B-row
    groupby; only B rows reach the driver."""
    from ray.data.aggregate import Sum

    counts = (
        documents_ds.select_columns(["text", target_col])
        .map_batches(_bucket_partials(n_buckets, target_col, target_value),
                     batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("raw_n", alias_name="rc"), Sum("tgt_n", alias_name="tc"))
        .take_all()
    )
    raw_c = np.zeros(n_buckets, np.int64)
    tgt_c = np.zeros(n_buckets, np.int64)
    for row in counts:
        raw_c[row["bucket"]] = row["rc"]
        tgt_c[row["bucket"]] = row["tc"]
    rt, tt = int(raw_c.sum()), int(tgt_c.sum())
    # floor AFTER the full double expression — the oracle's
    # FLOOR(1e6 * (LN(..) - LN(..))) evaluates the identical libm sequence
    ratios = np.fromiter(
        (math.floor(1_000_000 * (
            math.log((int(tc) + 1) / (tt + n_buckets))
            - math.log((int(rc) + 1) / (rt + n_buckets))))
         for rc, tc in zip(raw_c, tgt_c)),
        dtype=np.int64, count=n_buckets)
    return ratios, rt, tt


def dsir_select(documents_ds, n_buckets: int = 64, top_k: int = 50,
                target_col: str = "lang", target_value: str = "en"):
    """Top-k documents by DSIR importance weight (see module docstring).
    Returns a Dataset of (doc_id, n_bigrams, weight) — the k kept docs,
    ordered (weight desc, doc_id asc). Docs with < 2 tokens have no
    features and never score (SQL join semantics)."""
    import ray

    ratios, _, _ = dsir_ratios(documents_ds, n_buckets,
                               target_col, target_value)
    ratios_ref = ray.put(ratios)

    class ScoreBatch:
        """Actor-pool stage: the ratio table loads once per actor."""

        def __init__(self):
            self.ratios = ray.get(ratios_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .textstats import _lm_tokens

            doc_ids = batch.column("doc_id").to_pylist()
            bigrams: list[str] = []
            out_ids: list[int] = []
            lengths: list[int] = []
            for doc_id, text in zip(doc_ids,
                                    batch.column("text").to_pylist()):
                tokens = _lm_tokens(text) if text is not None else []
                pairs = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
                if not pairs:
                    continue
                bigrams.extend(pairs)
                out_ids.append(doc_id)
                lengths.append(len(pairs))
            if not bigrams:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                })
            codes, uniques = pd.factorize(pd.Series(bigrams))
            w = self.ratios[
                _bigram_buckets(uniques, n_buckets)[codes]].astype(np.float64)
            doc_idx = np.repeat(np.arange(len(out_ids)),
                                np.asarray(lengths, dtype=np.int64))
            # integer-valued float64 partial sums stay exact (< 2^53)
            sums = np.bincount(doc_idx, weights=w,
                               minlength=len(out_ids)).astype(np.int64)
            t = pa.table({
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_bigrams": pa.array(lengths, pa.int64()),
                "weight": pa.array(sums),
            })
            # per-block top-k: the global sort then sees ≤ blocks×k rows
            order = pa.compute.sort_indices(
                t, sort_keys=[("weight", "descending"),
                              ("doc_id", "ascending")])
            return t.take(order[:top_k])

    scored = documents_ds.select_columns(["doc_id", "text"]).map_batches(
        ScoreBatch, concurrency=(1, 8), batch_format="pyarrow")
    return scored.sort(["weight", "doc_id"],
                       descending=[True, False]).limit(top_k)
