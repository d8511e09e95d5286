"""Text-analysis batch kernels for the documents table.

All hot paths are vectorized (pyarrow.compute) or hash small per-row strings;
each kernel is a plain function usable in ``map_batches(fn,
batch_format="pyarrow")`` (stateless — no model assets to amortize).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic; deterministic and dependency-free
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "para", "en"},
    "zh": {"的", "是", "不", "了", "在", "有", "我", "他", "这", "中"},
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace tokens), n_chars."""
    text = batch.column("text")
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_chars = pc.utf8_length(text)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_tokens.cast(pa.int64()), n_chars.cast(pa.int64())],
        names=["doc_id", "n_tokens", "n_chars"],
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring signals: lengths, alpha/space/punct ratios, mean token
    length — the usual cheap filters of a web-text pipeline."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.float64())
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).cast(pa.float64())
    n_alpha = pc.count_substring_regex(text, "[A-Za-z]").cast(pa.float64())
    n_space = pc.count_substring_regex(text, " ").cast(pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_tokens = pc.max_element_wise(n_tokens, pa.scalar(1.0))

    def _round6(column):
        # DuckDB-ROUND-compatible: nearbyint(x * 1e6) / 1e6
        import numpy as np

        values = np.asarray(column.to_numpy(zero_copy_only=False), dtype=np.float64)
        # half away from zero, matching DuckDB's std::round
        return pa.array(np.copysign(np.floor(np.abs(values) * 1e6 + 0.5), values) / 1e6,
                        pa.float64())

    alpha_ratio = _round6(pc.divide(n_alpha, safe_chars))
    space_ratio = _round6(pc.divide(n_space, safe_chars))
    mean_token_len = _round6(pc.divide(pc.subtract(n_chars, n_space), safe_tokens))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            n_chars.cast(pa.int64()),
            n_tokens.cast(pa.int64()),
            alpha_ratio,
            space_ratio,
            mean_token_len,
        ],
        names=["doc_id", "n_chars", "n_tokens", "alpha_ratio", "space_ratio", "mean_token_len"],
    )


# BPE-style pretokenization (GPT-2-shaped, simplified to an RE2-compatible
# subset so the DuckDB oracle can run the IDENTICAL pattern: no lookahead)
BPE_TOKEN_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+|[ ]+"

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_bpe_tokens — the BPE-ish pretokenizer count next to the
    whitespace count (token_count_batch); same regex as the SQL oracle."""
    text = batch.column("text")
    n_bpe = pc.count_substring_regex(text, BPE_TOKEN_RE)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_bpe.cast(pa.int64())],
        names=["doc_id", "n_bpe_tokens"],
    )


def stopword_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_stopwords, stopword_ratio (fixed 10-word list,
    space-split tokens — the classic quality filter signal)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    stop = set(STOPWORDS)
    n_tokens, n_stop, ratio = [], [], []
    for text in texts:
        tokens = text.split(" ")
        tokens = [t for t in tokens if t]
        hits = sum(1 for t in tokens if t in stop)
        n_tokens.append(len(tokens))
        n_stop.append(hits)
        denominator = max(len(tokens), 1)
        value = hits / denominator
        import numpy as np

        ratio.append(float(np.floor(abs(value) * 1e6 + 0.5) / 1e6))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_tokens, pa.int64()),
            pa.array(n_stop, pa.int64()),
            pa.array(ratio, pa.float64()),
        ],
        names=["doc_id", "n_tokens", "n_stopwords", "stopword_ratio"],
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint per document (md5 hex — matches DuckDB's md5()
    oracle; the rolling-hash variant lives in dedup.simhash/minhash)."""
    texts = batch.column("text").to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(digests, pa.string())],
        names=["doc_id", "fingerprint"],
    )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-profile language ID: argmax of profile-hit ratios, 'und' when
    nothing matches. A heuristic scorer, not a model — deterministic."""
    texts = batch.column("text").to_pylist()
    langs = []
    scores = []
    for text in texts:
        tokens = text.lower().split()
        if not tokens:
            langs.append("und")
            scores.append(0.0)
            continue
        best_lang, best = "und", 0.0
        for lang, profile in _LANG_PROFILES.items():
            hits = sum(1 for token in tokens if token in profile)
            score = hits / len(tokens)
            if score > best:
                best_lang, best = lang, score
        langs.append(best_lang if best > 0 else "und")
        scores.append(round(best, 6))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(langs, pa.string()), pa.array(scores, pa.float64())],
        names=["doc_id", "pred_lang", "confidence"],
    )
