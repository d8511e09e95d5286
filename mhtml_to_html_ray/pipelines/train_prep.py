"""The end-to-end training-data preparation pipeline: raw web pages →
LM-ready packed sequences, composed ENTIRELY from the engine's own
operators — the "a user of the reference could run their whole pipeline
here" demonstration.

Stages (each individually oracled/test-pinned elsewhere; this module owns
only the composition):

1. **Extract** — the fused MIME+DOM kernel over the pages table
   (pipelines/flagship.extract_pages), keep text only.
2. **Quality gate** — C4-style length window + stopword floor + duplicate
   bigram ceiling (functions/textstats kernels), one map_batches pass.
3. **Exact dedup** — content-hash groupby, keeper = min doc_id; survivors
   via a distributed semi join on the keeper ids (hash_join how="semi").
4. **Near dedup** — MinHash-LSH clustering (functions/dedup.minhash_dedup),
   keep each cluster's representative (cluster_id == doc_id).
5. **Pack** — whitespace token counts → distributed prefix-sum scan →
   fixed-length sequence assignment (functions/packing.pack_sequences).

Every shuffle in the composition carries id/hash-sized rows, never text,
except the one semi join that filters the corpus itself — the 100-TB shape
end to end. The pipeline is deterministic: same input → same packed layout.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup, textstats
from ..functions.joins import hash_join
from .flagship import extract_pages, pages_from_documents


def _quality_gate(docs_ds):
    """C4-ish keep mask (thresholds shared with q_c4_filter)."""

    def keep(batch: pa.Table) -> pa.Table:
        sw = textstats.stopword_stats_batch(batch)
        rep = textstats.repetition_stats_batch(batch)
        n_chars = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False)
        ratio = sw.column("stopword_ratio").to_numpy(zero_copy_only=False)
        dup = rep.column("dup_bigram_frac").to_numpy(zero_copy_only=False)
        mask = (n_chars >= 150) & (n_chars <= 450) & (ratio >= 0.03) & (dup <= 0.06)
        return batch.filter(pa.array(mask))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def train_prep(sf_dir: str, seq_len: int = 128):
    """documents.parquet → packed-sequence assignment table. Returns the
    (doc_id, n_tokens, start_offset, first_seq, last_seq, n_seqs) Dataset —
    the layout a sequence-packing data loader consumes."""
    pages = pages_from_documents(f"{sf_dir}/documents.parquet")
    extracted = extract_pages(pages, keep_html=False)

    def to_docs(batch: pa.Table) -> pa.Table:
        # stable doc ids: the synthetic page url ends in the source doc_id
        ids = [int(u.rsplit("/", 1)[-1]) for u in batch.column("url").to_pylist()]
        kept = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": batch.column("text_out"),
        })
        return kept.filter(pc.is_valid(kept.column("text")))

    docs = extracted.map_batches(to_docs, batch_format="pyarrow")
    gated = _quality_gate(docs)

    # exact dedup: survivors = semi join against the keeper-id set (the
    # right side ships distinct ids only)
    keepers = dedup.exact_dedup(gated).map_batches(
        lambda b: pa.table({"doc_id": b.column("keeper_doc_id")}),
        batch_format="pyarrow",
    )
    unique_docs = hash_join(gated, keepers, key="doc_id",
                            num_buckets=32, how="semi")

    # near dedup: keep each cluster's representative
    clusters = dedup.minhash_dedup(unique_docs, threshold=0.85)
    # doc_ids in a cluster but NOT its representative (cluster_id == doc_id)
    # are dropped; docs in no cluster pass through — one anti join against
    # the non-representative members
    dropped = clusters.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id")}).filter(
            pc.not_equal(b.column("doc_id"), b.column("cluster_id"))),
        batch_format="pyarrow",
    )
    survivors = hash_join(unique_docs, dropped, key="doc_id",
                          num_buckets=32, how="anti")

    def token_counts(batch: pa.Table) -> pa.Table:
        counted = textstats.token_count_batch(batch)
        return pa.table({"doc_id": counted.column("doc_id"),
                         "n_tokens": counted.column("n_tokens")})

    counts = survivors.map_batches(token_counts, batch_format="pyarrow")
    from ..functions.packing import pack_sequences

    return pack_sequences(counts, key="doc_id", count_col="n_tokens",
                          seq_len=seq_len)
