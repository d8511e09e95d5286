"""Text-analysis batch kernels for the documents table.

All hot paths are vectorized (pyarrow.compute) or hash small per-row strings;
each kernel is a plain function usable in ``map_batches(fn,
batch_format="pyarrow")`` (stateless — no model assets to amortize).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
from .planning import guard_small_plan, plan_switch

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
        from .rounding import round_half_away

        values = column.to_numpy(zero_copy_only=False)
        return pa.array(round_half_away(values, 6),
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


def _space_isolated(text_column, pattern: str = " "):
    """Every token flanked by its OWN spaces: double each delimiter and pad
    the ends, so counting ``" word "`` finds adjacent stopwords too (Arrow's
    RE2 has no lookahead, and plain ``" word "`` counting misses "the the"
    because the shared space is consumed by the first match)."""
    doubled = (
        pc.replace_substring(text_column, pattern, "  ")
        if pattern == " "
        else pc.replace_substring_regex(text_column, pattern, "  ")
    )
    n = len(text_column)
    pad = pa.array([" "] * n, pa.string())
    return pc.binary_join_element_wise(pad, doubled, pad, "")


def stopword_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_stopwords, stopword_ratio (fixed 10-word list,
    space-split tokens — the classic quality filter signal). Fully
    vectorized: token counts by regex, stopword hits by per-word substring
    counts over space-isolated text (10 SIMD scans, no Python token loop)."""
    import numpy as np

    text = batch.column("text")
    n_tokens = pc.count_substring_regex(text, "[^ ]+").cast(pa.int64())
    isolated = _space_isolated(text)
    hits = pc.count_substring(isolated, f" {STOPWORDS[0]} ").cast(pa.int64())
    for word in STOPWORDS[1:]:
        hits = pc.add(hits, pc.count_substring(isolated, f" {word} ").cast(pa.int64()))
    tokens_np = np.asarray(n_tokens.to_numpy(zero_copy_only=False), dtype=np.float64)
    hits_np = np.asarray(hits.to_numpy(zero_copy_only=False), dtype=np.float64)
    from .rounding import round_half_away

    value = hits_np / np.maximum(tokens_np, 1.0)
    ratio = round_half_away(value, 6)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            n_tokens,
            hits,
            pa.array(ratio, pa.float64()),
        ],
        names=["doc_id", "n_tokens", "n_stopwords", "stopword_ratio"],
    )


# Gopher (Rae et al. 2021, arXiv:2112.11446 table A1) quality-rule subset —
# the deterministic, SQL-expressible rules; thresholds tuned to this corpus
# so keeps and drops both occur (the paper's 50-word floor would reject the
# whole synthetic table).
GOPHER_STOPSET = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 30, 90
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 4.3, 4.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORDS = 1


def gopher_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-rule quality gate, fully vectorized (RE2 kernels only, so the
    DuckDB oracle runs the IDENTICAL patterns): word-count window, mean
    word length window, symbol-to-word ratio ceiling (# and ... marks),
    distinct-stopword floor. keep + FIRST-failing-rule drop_reason, the
    same contract as the C4 filter. Threshold comparisons use the raw
    float ratios (bit-identical int divisions on both sides); only the
    REPORTED ratios are rounded."""
    import numpy as np

    from .rounding import round_half_away

    text = batch.column("text")
    n_words = pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64())
    words_np = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
    safe_words = np.maximum(words_np, 1.0)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_ws = pc.count_substring_regex(text, r"\s").cast(pa.int64())
    nonws_np = (
        n_chars.to_numpy(zero_copy_only=False)
        - n_ws.to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    mwl = nonws_np / safe_words

    n_hash = pc.count_substring(text, "#").cast(pa.int64())
    n_ellipsis = pc.count_substring(text, "...").cast(pa.int64())
    symbols_np = (
        n_hash.to_numpy(zero_copy_only=False)
        + n_ellipsis.to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    symbol_ratio = symbols_np / safe_words

    isolated = _space_isolated(text, r"[\t\n\f\r ]")
    n_stop = np.zeros(len(words_np), dtype=np.int64)
    for word in GOPHER_STOPSET:
        present = pc.greater(
            pc.count_substring(isolated, f" {word} "), 0
        ).to_numpy(zero_copy_only=False)
        n_stop += present.astype(np.int64)

    ints = n_words.to_numpy(zero_copy_only=False)
    ok_words = (ints >= GOPHER_MIN_WORDS) & (ints <= GOPHER_MAX_WORDS)
    ok_mwl = (mwl >= GOPHER_MIN_MWL) & (mwl <= GOPHER_MAX_MWL)
    ok_sym = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    ok_stop = n_stop >= GOPHER_MIN_STOPWORDS
    keep = ok_words & ok_mwl & ok_sym & ok_stop
    reasons = np.where(
        ~ok_words, "words",
        np.where(~ok_mwl, "word_length",
                 np.where(~ok_sym, "symbols",
                          np.where(~ok_stop, "stopwords", ""))))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": n_words,
        "mean_word_len": pa.array(round_half_away(mwl, 6), pa.float64()),
        "symbol_ratio": pa.array(round_half_away(symbol_ratio, 6), pa.float64()),
        "n_stop_distinct": pa.array(n_stop, pa.int64()),
        "keep": pa.array(keep, pa.bool_()),
        "drop_reason": pa.array(
            [r if r else None for r in reasons.tolist()], pa.string()),
    })


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher/C4-style repetition signal: fraction of duplicate word bigrams
    per document (high → boilerplate/spam). doc_id, n_bigrams,
    n_distinct_bigrams, dup_bigram_frac (round-6, DuckDB-compatible)."""
    import numpy as np

    texts = batch.column("text").to_pylist()
    n_bigrams, n_distinct = [], []
    for text in texts:
        # _lm_tokens, NOT str.split(): the oracle extracts RE2 \S+ runs, and
        # str.split() additionally splits on \v/NBSP/U+2000… — a web document
        # containing an NBSP would bigram differently than the SQL side
        tokens = _lm_tokens(text)
        grams = list(zip(tokens, tokens[1:]))
        n_bigrams.append(len(grams))
        n_distinct.append(len(set(grams)))
    total = np.asarray(n_bigrams, dtype=np.float64)
    distinct = np.asarray(n_distinct, dtype=np.float64)
    # (t-d)/max(t,1), not 1-d/max(t,1): an EMPTY document has no repetition
    from .rounding import round_half_away

    frac = (total - distinct) / np.maximum(total, 1.0)
    frac = round_half_away(frac, 6)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_bigrams, pa.int64()),
            pa.array(n_distinct, pa.int64()),
            pa.array(frac, pa.float64()),
        ],
        names=["doc_id", "n_bigrams", "n_distinct_bigrams", "dup_bigram_frac"],
    )


def fineweb_stats_batch(batch: pa.Table) -> pa.Table:
    """FineWeb-style LINE-SHAPE quality gate (Penedo et al. 2024) — the
    line-based complement of the token-based C4/Gopher rules: a page whose
    lines rarely end in terminal punctuation, are mostly short, or carry a
    large fraction of their characters in within-page duplicated lines is
    boilerplate/listing spam rather than prose.

    Per document (lines = text split on ``\\n``):

    * ``n_punct``  — lines whose last char is one of ``. ! ? " '``
    * ``n_short``  — lines shorter than 30 codepoints
    * ``dup_chars`` — total chars in lines occurring ≥2× WITHIN the page
      (every occurrence counted, FineWeb's "fraction of characters in
      duplicated lines")

    Keep rule, evaluated first-failing in FineWeb's order and entirely in
    INTEGER cross-multiplied form so both the engine and the DuckDB oracle
    compare exact integers (no float ratio ever materializes):

    * punct ratio ≥ 0.12 → ``100*n_punct >= 12*n_lines``  else 'punct'
    * short ratio < 0.67 → ``100*n_short <  67*n_lines``  else 'short_lines'
    * dup-char frac < 0.1 → ``10*dup_chars < total_chars`` else 'dup_lines'

    Pure per-batch work, zero shuffle — the same split → flatten →
    parent-index bincount shape as dedup.self_dedup_lines. Output:
    (doc_id, n_lines, n_punct, n_short, dup_chars, total_chars, keep,
    drop_reason).
    """
    import numpy as np
    import pandas as pd

    parts = pc.split_pattern(batch.column("text"), pattern="\n")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    parents = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    n_docs = len(batch)

    lens = pc.utf8_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
    # RE2 on both sides: the oracle tests regexp_matches(line, '[.!?"'']$')
    punct = pc.match_substring_regex(flat, r"""[.!?"']$""").to_numpy(
        zero_copy_only=False)
    short = lens < 30
    # every occurrence of a line duplicated within its page (keep=False
    # marks ALL copies, matching the oracle's HAVING COUNT(*) >= 2 group)
    dup_mask = pd.DataFrame({"row": parents, "line": flat.to_pandas()}).duplicated(
        ["row", "line"], keep=False).to_numpy()

    n_lines = np.bincount(parents, minlength=n_docs).astype(np.int64)
    n_punct = np.bincount(parents[punct], minlength=n_docs).astype(np.int64)
    n_short = np.bincount(parents[short], minlength=n_docs).astype(np.int64)
    # float64 bincount sums are exact far beyond any per-page char total
    total_chars = np.bincount(
        parents, weights=lens, minlength=n_docs).astype(np.int64)
    dup_chars = np.bincount(
        parents[dup_mask], weights=lens[dup_mask], minlength=n_docs
    ).astype(np.int64)

    ok_punct = 100 * n_punct >= 12 * n_lines
    ok_short = 100 * n_short < 67 * n_lines
    ok_dup = 10 * dup_chars < total_chars
    keep = ok_punct & ok_short & ok_dup
    reasons = np.where(
        ~ok_punct, "punct",
        np.where(~ok_short, "short_lines", np.where(~ok_dup, "dup_lines", "")),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "n_short": pa.array(n_short, pa.int64()),
            "dup_chars": pa.array(dup_chars, pa.int64()),
            "total_chars": pa.array(total_chars, pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
            "drop_reason": pa.array(
                [r if r else None for r in reasons.tolist()], pa.string()),
        }
    )


def bpe_pair_count_partials(batch: pa.Table) -> pa.Table:
    """Per-block partial counts of ADJACENT CHARACTER PAIRS inside words —
    the first merge-candidate census of BPE tokenizer training. Fully
    vectorized: the batch's words join under a NUL separator, the string
    views as a uint32 codepoint array (utf-32), shifted arrays pair up
    neighbors, and pairs crossing a word boundary mask out; np.unique
    folds the block to one (pair, n) row per distinct pair. Only distinct
    pairs ever leave the task, so the downstream groupby shuffles
    vocabulary-sized rows no matter how large the corpus block is.

    Caveat: U+0000 is the separator, so a NUL inside a word (legal to RE2's
    ``\\S``) would split it; the extraction kernel upstream already maps
    NULs per the HTML spec, and the oracle-side SQL sees none either."""
    import numpy as np

    text = batch.column("text")
    joined = "\x00".join(
        t for t in text.to_pylist() if t
    )
    # words under one separator: collapse runs of whitespace to NUL
    joined = _re_ws().sub("\x00", joined)
    if not joined:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n_part": pa.array([], pa.int64())})
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    a, b = cp[:-1], cp[1:]
    mask = (a != 0) & (b != 0)
    if not mask.any():
        return pa.table({"pair": pa.array([], pa.string()),
                         "n_part": pa.array([], pa.int64())})
    packed = (a[mask].astype(np.uint64) << 32) | b[mask].astype(np.uint64)
    uniq, counts = np.unique(packed, return_counts=True)
    pairs = [chr(v >> 32) + chr(v & 0xFFFFFFFF) for v in map(int, uniq)]
    return pa.table({"pair": pa.array(pairs, pa.string()),
                     "n_part": pa.array(counts.astype(np.int64), pa.int64())})


_WS_RUN_RE = None


def _re_ws():
    global _WS_RUN_RE
    if _WS_RUN_RE is None:
        import re

        # the exact RE2 \s class (see _lm_tokens): no \v, no NBSP
        _WS_RUN_RE = re.compile(r"[\t\n\f\r ]+")
    return _WS_RUN_RE


def compression_stats_batch(batch: pa.Table, level: int = 6) -> pa.Table:
    """zlib compression-ratio quality signal (the Gopher/RefinedWeb-family
    redundancy detector): machine-generated or boilerplate-repetitive text
    compresses far below natural prose, so a LOW ratio flags junk that
    token-level repetition stats can miss (long-range duplication). Per-row
    zlib is C-speed; no SQL oracle exists (DuckDB ships no zlib UDF), so
    the query is rows-only and the semantics are test-pinned."""
    import zlib

    ratios = []
    sizes = []
    for text in batch.column("text").to_pylist():
        raw = (text or "").encode("utf-8")
        if not raw:
            ratios.append(None)
            sizes.append(0)
            continue
        compressed = len(zlib.compress(raw, level))
        sizes.append(len(raw))
        ratios.append(compressed / len(raw))
    import numpy as np

    from .rounding import round_half_away

    ratio_col = pa.array(
        [None if r is None else float(round_half_away(np.array([r]), 6)[0])
         for r in ratios],
        pa.float64(),
    )
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bytes": pa.array(sizes, pa.int64()),
        "compression_ratio": ratio_col,
    })


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
    nothing matches. A heuristic scorer, not a model — deterministic.

    Vectorized: one (n_docs × n_langs) hit matrix from per-word substring
    counts over lowercased, whitespace-isolated text; argmax ordering matches
    the original dict-iteration tie-break (first profile wins ties)."""
    import numpy as np

    text = batch.column("text")
    lowered = pc.utf8_lower(text)
    n_tokens = pc.count_substring_regex(lowered, r"\S+").cast(pa.int64())
    isolated = _space_isolated(lowered, pattern=r"\s")
    langs = list(_LANG_PROFILES)
    hit_matrix = np.zeros((len(text), len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        for word in _LANG_PROFILES[lang]:
            hit_matrix[:, j] += np.asarray(
                pc.count_substring(isolated, f" {word} ").to_numpy(zero_copy_only=False)
            )
    tokens_np = np.asarray(n_tokens.to_numpy(zero_copy_only=False), dtype=np.float64)
    scores = hit_matrix / np.maximum(tokens_np, 1.0)[:, None]
    # strict argmax with first-profile tie-break — but only a strictly
    # positive best counts as identified (original: score > best starts at 0)
    best_index = np.argmax(scores, axis=1)
    best_score = scores[np.arange(len(scores)), best_index]
    pred = np.where(best_score > 0, np.array(langs, dtype=object)[best_index], "und")
    from .rounding import round_half_away

    # the shared DuckDB-ROUND kernel, not np.round (half-to-even)
    confidence = round_half_away(best_score, 6)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(pred.tolist(), pa.string()),
            pa.array(confidence, pa.float64()),
        ],
        names=["doc_id", "pred_lang", "confidence"],
    )


# ---------------------------------------------------------------------------
# Unigram language-model quality scoring (the perplexity-style filter a
# training-data pipeline ranks documents with)


_LM_TOKEN_RE = None  # compiled lazily; the exact RE2 \s class, see below


def _lm_tokens(text: str) -> list[str]:
    global _LM_TOKEN_RE
    if _LM_TOKEN_RE is None:
        import re

        # THE tokenizer whitespace contract, shared by the LM scorer,
        # repetition stats, and corpusstats (tf-idf / inverted index / BM25):
        # the oracles tokenize with DuckDB regexp_split_to_array(text,'\s+')
        # and RE2's \s is exactly [\t\n\f\r ] (probed empirically — NO \v,
        # unlike Python's re.ASCII \s, and none of the Unicode whitespace
        # str.split() uses), so spell the class out rather than trusting
        # any engine's \s.
        _LM_TOKEN_RE = re.compile(r"[\t\n\f\r ]+")
    return [tok for tok in _LM_TOKEN_RE.split(text) if tok]


def _flatten_batch(batch: pa.Table):
    """Tokenize every doc in a batch once: (doc_ids, flat tokens, bounds)
    with bounds as (start, length) per doc. Shared by the LM scorer here and
    the tf/df/postings kernels in corpusstats."""
    doc_ids = batch.column("doc_id").to_pylist()
    all_tokens: list[str] = []
    bounds: list[tuple[int, int]] = []
    for text in batch.column("text").to_pylist():
        tokens = _lm_tokens(text)
        bounds.append((len(all_tokens), len(tokens)))
        all_tokens.extend(tokens)
    return doc_ids, all_tokens, bounds


def unigram_lm_scores(documents_ds, vocab_cap: int | None = None,
                      strategy: str = "auto"):
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — low scores flag unnatural/rare-token documents
    (the classic LM quality filter).

    Two passes: (1) distributed token counts (per-batch Counter combiner →
    one groupby over (token, n) partials — never raw tokens); (2) the vocab
    log-probs broadcast once via ray.put, per-batch scoring vectorized with
    pandas factorize + one numpy gather. Log-probs are computed with
    math.log (libm) per DISTINCT token so they match DuckDB's LN bit-exact.

    ``vocab_cap`` is the 100-TB path: keep only the top-V tokens by count
    (ties by token, deterministic) and pool everything else into one UNK
    bucket whose probability is the pooled tail mass — Zipf makes top-1M
    cover >99.9% of web-scale mass, so the broadcast stays MBs while the
    default (None = exact vocab) remains the oracle-checkable reference
    semantics. cap ≥ vocab is equivalence-tested against exact.

    ``strategy``: "broadcast" collects the (tok, n) counts to the driver and
    ships the log-prob table via ray.put (right while the vocabulary fits
    one process); "join" is the EXACT plan with NO vocabulary-sized driver
    structure (VERDICT round 3 #3) — (doc_id, tok, k) rows equijoin the
    counts Dataset by token, then fold per doc_id; two hash-sized shuffles.
    "auto" switches to join beyond 200k docs. Equivalence-tested.
    """
    import math

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    if strategy == "auto":
        strategy = "join" if plan_switch(documents_ds) else "broadcast"
    elif strategy == "broadcast":
        guard_small_plan("unigram_lm_scores", documents_ds)
    if strategy == "join":
        return _unigram_lm_scores_join(documents_ds)

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        for text in batch.column("text").to_pylist():
            counter.update(_lm_tokens(text))
        return pa.table(
            {
                "tok": pa.array(list(counter.keys()), pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    counts = (
        documents_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    total = float(sum(row["n"] for row in counts))
    unk_logp = None
    if vocab_cap is not None and len(counts) > vocab_cap:
        counts.sort(key=lambda row: (-row["n"], row["tok"]))
        kept, tail = counts[:vocab_cap], counts[vocab_cap:]
        tail_mass = sum(row["n"] for row in tail)
        unk_logp = math.log(tail_mass / total)
        counts = kept
    logp = {row["tok"]: math.log(row["n"] / total) for row in counts}
    logp_ref = ray.put((logp, unk_logp))

    def score(batch: pa.Table) -> pa.Table:
        table, unk = ray.get(logp_ref)
        doc_ids, all_tokens, bounds = _flatten_batch(batch)
        out_ids: list[int] = []
        out_n: list[int] = []
        out_score: list[float] = []
        if all_tokens:
            codes, uniques = pd.factorize(pd.Series(all_tokens))
            unique_logp = np.fromiter(
                (table.get(u, unk) if unk is not None else table[u]
                 for u in uniques),
                dtype=np.float64, count=len(uniques),
            )
            token_logp = unique_logp[codes]
        else:
            token_logp = np.array([], dtype=np.float64)
        from .rounding import round_half_away

        for doc_id, (start, length) in zip(doc_ids, bounds):
            if length == 0:
                continue  # tokenless docs are absent, like the oracle's join
            segment = token_logp[start : start + length]
            out_ids.append(doc_id)
            out_n.append(length)
            out_score.append(float(round_half_away(segment.sum() / length, 6)))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "lm_score": pa.array(out_score, pa.float64()),
            }
        )

    return documents_ds.map_batches(score, batch_format="pyarrow")


def _unigram_lm_scores_join(documents_ds):
    """unigram_lm_scores(strategy="join"): the exact semantics with the
    vocabulary kept distributed end to end. Token counts fold in a
    groupby(tok); (doc_id, tok, k) rows meet them in a union-equijoin by
    token (log-prob attached per group with the same math.log calls as the
    broadcast plan); a final groupby(doc_id) folds Σ k·logp / Σ k."""
    import math

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        for text in batch.column("text").to_pylist():
            counter.update(_lm_tokens(text))
        return pa.table(
            {
                "tok": pa.array(list(counter.keys()), pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    counts_ds = (
        documents_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    total = float(counts_ds.sum("n") or 0)

    def doc_side(batch: pa.Table) -> pa.Table:
        doc_ids, all_tokens, bounds = _flatten_batch(batch)
        rows_doc: list[int] = []
        rows_tok: list[str] = []
        rows_k: list[int] = []
        if all_tokens:
            codes, uniques = pd.factorize(pd.Series(all_tokens))
            lengths = np.fromiter((ln for _, ln in bounds), dtype=np.int64,
                                  count=len(bounds))
            doc_idx = np.repeat(np.arange(len(bounds)), lengths)
            grouped = (
                pd.DataFrame({"d": doc_idx, "c": codes})
                .groupby(["d", "c"], sort=False)
                .size()
                .reset_index(name="k")
            )
            rows_doc = [doc_ids[d] for d in grouped["d"]]
            rows_tok = [uniques[c] for c in grouped["c"]]
            rows_k = grouped["k"].tolist()
        n = len(rows_doc)
        return pa.table(
            {
                "tok": pa.array(rows_tok, pa.string()),
                "doc_id": pa.array(rows_doc, pa.int64()),
                "k": pa.array(rows_k, pa.int64()),
                "n": pa.nulls(n, pa.int64()),
            }
        )

    def count_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "tok": batch.column("tok"),
                "doc_id": pa.nulls(n, pa.int64()),
                "k": pa.nulls(n, pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    # Round-5 shape: coarse hash partitions + vectorized per-partition
    # merges instead of per-token / per-doc map_groups (see corpusstats
    # _tfidf_topk_join for the rationale — ~1 ms scaffolding per GROUP made
    # the join plan far slower than broadcast right at the switch point).
    n_partitions = 256
    attach_schema = pa.schema(
        [("doc_id", pa.int64()), ("k", pa.int64()), ("klogp", pa.float64())]
    )

    def add_tok_part(batch: pa.Table) -> pa.Table:
        import zlib

        part = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) % n_partitions
             for t in batch.column("tok").to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return batch.append_column("part", pa.array(part, pa.int32()))

    def attach_logp_part(part_df: pd.DataFrame) -> pa.Table:
        count_rows = part_df.loc[part_df["n"].notna(), ["tok", "n"]]
        doc_rows = part_df.loc[part_df["n"].isna(), ["tok", "doc_id", "k"]]
        if count_rows.empty or doc_rows.empty:
            return attach_schema.empty_table()
        count_rows = count_rows.drop_duplicates("tok")
        merged = doc_rows.merge(count_rows, on="tok", how="inner")
        if merged.empty:
            return attach_schema.empty_table()
        # logp per DISTINCT token with the same math.log calls as broadcast
        uniq = merged[["tok", "n"]].drop_duplicates("tok")
        logp_map = {tok: math.log(int(n_val) / total)
                    for tok, n_val in zip(uniq["tok"], uniq["n"])}
        logp = merged["tok"].map(logp_map).to_numpy(dtype=np.float64)
        k = merged["k"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(merged["doc_id"].to_numpy(np.int64), pa.int64()),
                "k": pa.array(merged["k"].to_numpy(np.int64), pa.int64()),
                "klogp": pa.array(k * logp, pa.float64()),
            }
        )

    joined = (
        documents_ds.map_batches(doc_side, batch_format="pyarrow")
        .union(counts_ds.map_batches(count_side, batch_format="pyarrow"))
        .map_batches(add_tok_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_logp_part, batch_format="pandas")
    )

    import pyarrow.compute as pc

    def add_doc_part(batch: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(batch.column("doc_id"),
                               pa.scalar(n_partitions - 1, pa.int64()))
        return batch.append_column("part", pc.cast(part, pa.int32()))

    def fold_part(part_df: pd.DataFrame) -> pa.Table:
        from .rounding import round_half_away

        grouped = (part_df.groupby("doc_id", sort=False)
                   .agg(n_tokens=("k", "sum"), klogp=("klogp", "sum"))
                   .reset_index())
        score = round_half_away(
            grouped["klogp"].to_numpy(np.float64)
            / grouped["n_tokens"].to_numpy(np.float64), 6)
        return pa.table(
            {
                "doc_id": pa.array(grouped["doc_id"].to_numpy(np.int64), pa.int64()),
                "n_tokens": pa.array(grouped["n_tokens"].to_numpy(np.int64), pa.int64()),
                "lm_score": pa.array(score, pa.float64()),
            }
        )

    return (
        joined.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_part, batch_format="pandas")
    )


def ccnet_bucket_scores(documents_ds, strategy: str = "auto"):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document under ITS OWN LANGUAGE's unigram distribution, then split each
    language into head / middle / tail thirds by per-language score
    quantiles — the standard pre-training curation step that keeps the
    most-natural third of each language's crawl.

    Plan (three bounded stages, no full materialization of raw tokens):

    1. (lang, tok, n) counts: per-batch Counter combiner → ONE
       groupby(lang, tok) over partial rows — raw tokens never shuffle.
    2. Per-doc scores — two interchangeable plans, like
       ``unigram_lm_scores``: ``strategy="broadcast"`` ships the folded
       count table once via ray.put and scores each batch with one
       factorize + numpy gather (fastest while the vocabulary fits one
       process; the oracle-reference semantics); ``strategy="join"`` keeps
       the vocabulary distributed end to end — (lang-newline-tok, doc_id,
       k) rows equijoin the counts by key, log-prob attached per group
       with the same math.log calls, one groupby(doc) fold. Only the
       per-language totals (n_langs floats) ever reach the driver.
       ``"auto"`` switches to join past 200k docs. Equivalence-tested.
    3. Thresholds: exact per-language discrete quantiles (1/3, 2/3) via
       ``quantiles.exact_quantiles_by`` over the materialized score table
       (4 scalar columns per doc — bounded), broadcast back (n_langs × 2
       floats), vectorized CASE bucket assign.

    Tokenless documents are absent (the oracle's join semantics), and so
    are NULL-lang documents — SQL's equijoin on lang never matches NULL, and
    filtering them up front keeps the broadcast and join plans identical
    instead of one crashing and the other silently dropping. Higher
    mean log-prob = lower perplexity, so ``head`` is the
    above-2/3-quantile stratum, ``tail`` the at-or-below-1/3 one.
    """
    import numpy as np
    import ray

    from .quantiles import exact_quantiles_by

    def _drop_null_lang(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("lang")))

    documents_ds = documents_ds.map_batches(_drop_null_lang,
                                            batch_format="pyarrow")
    if strategy == "auto":
        strategy = "join" if plan_switch(documents_ds) else "broadcast"
    elif strategy == "broadcast":
        guard_small_plan("ccnet_bucket_scores", documents_ds)
    if strategy == "join":
        scores = _ccnet_scores_join(documents_ds).materialize()
    else:
        scores = _ccnet_scores_broadcast(documents_ds).materialize()

    th = exact_quantiles_by(scores, key="lang", col="lm_score",
                            qs=[1.0 / 3.0, 2.0 / 3.0])
    cuts: dict[str, list[float]] = {}
    for lang, q, value in zip(th.column("lang").to_pylist(),
                              th.column("q").to_pylist(),
                              th.column("value").to_pylist()):
        cuts.setdefault(lang, [None, None])[0 if q < 0.5 else 1] = value
    cuts_ref = ray.put(cuts)

    def assign(batch: pa.Table) -> pa.Table:
        table = ray.get(cuts_ref)
        langs = batch.column("lang").to_pylist()
        s = batch.column("lm_score").to_numpy(zero_copy_only=False)
        t1 = np.fromiter((table[l][0] for l in langs), dtype=np.float64,
                         count=len(langs))
        t2 = np.fromiter((table[l][1] for l in langs), dtype=np.float64,
                         count=len(langs))
        bucket = np.where(s <= t1, "tail", np.where(s <= t2, "middle", "head"))
        return batch.append_column("bucket", pa.array(bucket, pa.string()))

    return scores.map_batches(assign, batch_format="pyarrow")


def _ccnet_lang_counts(documents_ds):
    """(lang, tok, n) dataset: per-batch Counter combiner → one
    groupby(lang, tok) — raw tokens never shuffle."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        langs = batch.column("lang").to_pylist()
        for lang, text in zip(langs, batch.column("text").to_pylist()):
            for tok in _lm_tokens(text):
                counter[(lang, tok)] += 1
        keys = list(counter.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "tok": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    return (
        documents_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("n", alias_name="n"))
    )


def _ccnet_scores_broadcast(documents_ds):
    import math

    import numpy as np
    import pandas as pd
    import ray

    from .rounding import round_half_away

    counts = _ccnet_lang_counts(documents_ds).take_all()
    totals: dict[str, float] = {}
    for row in counts:
        totals[row["lang"]] = totals.get(row["lang"], 0.0) + row["n"]
    # math.log per DISTINCT (lang, tok) so the DuckDB LN(n/t) oracle matches
    logp = {
        (row["lang"], row["tok"]): math.log(row["n"] / totals[row["lang"]])
        for row in counts
    }
    logp_ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        table = ray.get(logp_ref)
        langs = batch.column("lang").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        out_ids: list[int] = []
        out_lang: list[str] = []
        out_n: list[int] = []
        out_score: list[float] = []
        keys: list[str] = []
        bounds: list[tuple[int, int]] = []
        # "\n" never appears in a token (the tokenizer splits on it) or a
        # lang code, so it is a collision-free join key — NOT "\x00":
        # pandas' StringHashTable compares C strings, so NUL-embedded keys
        # silently collide at the first NUL
        for lang, text in zip(langs, batch.column("text").to_pylist()):
            tokens = _lm_tokens(text)
            bounds.append((len(keys), len(tokens)))
            keys.extend(f"{lang}\n{tok}" for tok in tokens)
        if keys:
            codes, uniques = pd.factorize(pd.Series(keys))
            unique_logp = np.fromiter(
                (table[tuple(u.split("\n", 1))] for u in uniques),
                dtype=np.float64, count=len(uniques),
            )
            token_logp = unique_logp[codes]
        else:
            token_logp = np.array([], dtype=np.float64)
        for doc_id, lang, (start, length) in zip(doc_ids, langs, bounds):
            if length == 0:
                continue
            segment = token_logp[start : start + length]
            out_ids.append(doc_id)
            out_lang.append(lang)
            out_n.append(length)
            out_score.append(float(round_half_away(segment.sum() / length, 6)))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "lm_score": pa.array(out_score, pa.float64()),
            }
        )

    return documents_ds.map_batches(score, batch_format="pyarrow")


def _ccnet_scores_join(documents_ds):
    """ccnet scores with the vocabulary distributed end to end — the same
    union + groupby(key).map_groups equijoin as
    ``unigram_lm_scores(strategy="join")``, keyed by the newline-joined
    (lang, tok) pair so each language's distribution stays separate. The
    only driver-side state is the per-language token totals (n_langs
    floats)."""
    import math

    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    counts_ds = _ccnet_lang_counts(documents_ds).materialize()
    totals = {
        row["lang"]: float(row["n"])
        for row in counts_ds.groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    }
    totals_ref = ray.put(totals)

    def doc_side(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        keys: list[str] = []
        bounds: list[tuple[int, int]] = []
        for lang, text in zip(langs, batch.column("text").to_pylist()):
            tokens = _lm_tokens(text)
            bounds.append((len(keys), len(tokens)))
            keys.extend(f"{lang}\n{tok}" for tok in tokens)
        rows_key: list[str] = []
        rows_doc: list[int] = []
        rows_k: list[int] = []
        if keys:
            codes, uniques = pd.factorize(pd.Series(keys))
            lengths = np.fromiter((ln for _, ln in bounds), dtype=np.int64,
                                  count=len(bounds))
            doc_idx = np.repeat(np.arange(len(bounds)), lengths)
            grouped = (
                pd.DataFrame({"d": doc_idx, "c": codes})
                .groupby(["d", "c"], sort=False)
                .size()
                .reset_index(name="k")
            )
            rows_doc = [doc_ids[d] for d in grouped["d"]]
            rows_key = [uniques[c] for c in grouped["c"]]
            rows_k = grouped["k"].tolist()
        n = len(rows_doc)
        return pa.table(
            {
                "key": pa.array(rows_key, pa.string()),
                "doc_id": pa.array(rows_doc, pa.int64()),
                "k": pa.array(rows_k, pa.int64()),
                "n": pa.nulls(n, pa.int64()),
            }
        )

    def count_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        n = batch.num_rows
        key = _pc.binary_join_element_wise(
            batch.column("lang"), batch.column("tok"), "\n")
        return pa.table(
            {
                "key": key,
                "doc_id": pa.nulls(n, pa.int64()),
                "k": pa.nulls(n, pa.int64()),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    # coarse hash partitions + vectorized per-partition merges (see
    # _unigram_lm_scores_join / _tfidf_topk_join for the rationale)
    n_partitions = 256
    attach_schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("k", pa.int64()), ("klogp", pa.float64())]
    )

    def add_key_part(batch: pa.Table) -> pa.Table:
        import zlib

        part = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) % n_partitions
             for t in batch.column("key").to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return batch.append_column("part", pa.array(part, pa.int32()))

    def attach_logp_part(part_df: pd.DataFrame) -> pa.Table:
        count_rows = part_df.loc[part_df["n"].notna(), ["key", "n"]]
        doc_rows = part_df.loc[part_df["n"].isna(), ["key", "doc_id", "k"]]
        if count_rows.empty or doc_rows.empty:
            return attach_schema.empty_table()
        count_rows = count_rows.drop_duplicates("key")
        merged = doc_rows.merge(count_rows, on="key", how="inner")
        if merged.empty:
            return attach_schema.empty_table()
        all_totals = ray.get(totals_ref)
        uniq = merged[["key", "n"]].drop_duplicates("key")
        logp_map = {}
        lang_map = {}
        for key_val, n_val in zip(uniq["key"], uniq["n"]):
            lang = str(key_val).split("\n", 1)[0]
            lang_map[key_val] = lang
            logp_map[key_val] = math.log(int(n_val) / all_totals[lang])
        logp = merged["key"].map(logp_map).to_numpy(dtype=np.float64)
        k = merged["k"].to_numpy(dtype=np.float64)
        return pa.table(
            {
                "doc_id": pa.array(merged["doc_id"].to_numpy(np.int64), pa.int64()),
                "lang": pa.array(merged["key"].map(lang_map), pa.string()),
                "k": pa.array(merged["k"].to_numpy(np.int64), pa.int64()),
                "klogp": pa.array(k * logp, pa.float64()),
            }
        )

    joined = (
        documents_ds.map_batches(doc_side, batch_format="pyarrow")
        .union(counts_ds.map_batches(count_side, batch_format="pyarrow"))
        .map_batches(add_key_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_logp_part, batch_format="pandas")
    )

    import pyarrow.compute as _pc2

    def add_doc_part(batch: pa.Table) -> pa.Table:
        part = _pc2.bit_wise_and(batch.column("doc_id"),
                                 pa.scalar(n_partitions - 1, pa.int64()))
        return batch.append_column("part", _pc2.cast(part, pa.int32()))

    def fold_part(part_df: pd.DataFrame) -> pa.Table:
        from .rounding import round_half_away

        grouped = (part_df.groupby("doc_id", sort=False)
                   .agg(lang=("lang", "first"), n_tokens=("k", "sum"),
                        klogp=("klogp", "sum"))
                   .reset_index())
        score = round_half_away(
            grouped["klogp"].to_numpy(np.float64)
            / grouped["n_tokens"].to_numpy(np.float64), 6)
        return pa.table(
            {
                "doc_id": pa.array(grouped["doc_id"].to_numpy(np.int64), pa.int64()),
                "lang": pa.array(grouped["lang"], pa.string()),
                "n_tokens": pa.array(grouped["n_tokens"].to_numpy(np.int64), pa.int64()),
                "lm_score": pa.array(score, pa.float64()),
            }
        )

    return (
        joined.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_part, batch_format="pandas")
    )


def hashed_bigram_classifier(documents_ds, n_buckets: int = 64):
    """fastText-shaped quality classifier: hashed word-bigram features
    through a linear layer. The production version loads trained weights;
    this reference instance derives the weight of hash bucket ``b``
    deterministically as ``b - n_buckets//2`` so every stage — tokenize,
    bigram, hash, embed, reduce — is real and the end-to-end score is
    exactly checkable (the DuckDB oracle recomputes the identical
    md5-prefix bucket arithmetic in SQL).

    One map_batches pass, zero shuffle: bigrams are factorized per batch so
    md5 runs once per DISTINCT bigram, weights gather through the code
    array, per-doc sums fold with one bincount. Docs with fewer than two
    tokens have no features and are absent (SQL join semantics).
    ``keep`` = positive score, the usual classifier gate.
    """
    import numpy as np
    import pandas as pd

    half = n_buckets // 2

    def score(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        bigrams: list[str] = []
        bounds: list[tuple[int, int]] = []
        for text in batch.column("text").to_pylist():
            tokens = _lm_tokens(text)
            pairs = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
            bounds.append((len(bigrams), len(pairs)))
            bigrams.extend(pairs)
        out_ids: list[int] = []
        out_n: list[int] = []
        starts: list[int] = []
        lengths: list[int] = []
        for doc_id, (start, length) in zip(doc_ids, bounds):
            if length == 0:
                continue
            out_ids.append(doc_id)
            out_n.append(length)
            starts.append(start)
            lengths.append(length)
        if bigrams:
            codes, uniques = pd.factorize(pd.Series(bigrams))
            unique_w = np.fromiter(
                (int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % n_buckets
                 - half for u in uniques),
                dtype=np.float64, count=len(uniques),
            )
            w = unique_w[codes]
            doc_idx = np.repeat(np.arange(len(starts)),
                                np.asarray(lengths, dtype=np.int64))
            sums = np.bincount(doc_idx, weights=w,
                               minlength=len(starts)).astype(np.int64)
        else:
            sums = np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_bigrams": pa.array(out_n, pa.int64()),
                "score_sum": pa.array(sums, pa.int64()),
                "keep": pa.array(sums > 0, pa.bool_()),
            }
        )

    return documents_ds.map_batches(score, batch_format="pyarrow")


def _apply_bpe_merge(syms: list, left: str, right: str) -> list:
    """One BPE merge rule applied left-to-right over a symbol sequence —
    THE merge semantics, shared by training (bpe_train's per-round rewrite)
    and encoding (bpe_encode's replay) so the two can never drift."""
    merged = left + right
    i, new = 0, []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            new.append(merged)
            i += 2
        else:
            new.append(syms[i])
            i += 1
    return new


def bpe_train(documents_ds, n_merges: int = 8):
    """Distributed BPE tokenizer training (Sennrich et al. 2016): the
    iterative merge loop, run over the corpus's DISTINCT-WORD working set.

    Shape: the corpus collapses once to a (word, n) table — Zipf makes this
    vocabulary-sized (~10⁶ rows at web scale) however many documents feed
    it, so every later round shuffles vocabulary rows, never corpus rows.
    Each round is (a) weighted adjacent-pair partials per block →
    groupby(left, right) fold, (b) per-block top-1 combiner so the driver
    sees ≤ n_blocks candidate rows and picks the global argmax (count desc,
    then left/right lexicographic — deterministic), (c) one map_batches
    rewriting the symbol sequences that contain the merged pair, then
    materialize for the next round — the same materialize-between-supersteps
    discipline as ``pagerank``/``embedding_kmeans``.

    Word symbol sequences start as codepoints plus a terminal "</w>" marker
    (merges never cross word boundaries; a word-final merge stays distinct
    from the same pair mid-word). Returns a driver-side pa.Table of
    (rank, left, right, n) merge rules — k rows, the trained artifact.
    Parity with a single-process reference trainer is pinned in tests.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def word_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        for text in batch.column("text").to_pylist():
            counter.update(_lm_tokens(text))
        return pa.table(
            {
                "word": pa.array(list(counter.keys()), pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    def to_symbols(batch: pa.Table) -> pa.Table:
        syms = [list(w) + ["</w>"] for w in batch.column("word").to_pylist()]
        return pa.table(
            {
                "syms": pa.array(syms, pa.list_(pa.string())),
                "n": batch.column("n").cast(pa.int64()),
            }
        )

    words = (
        documents_ds.map_batches(word_partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(to_symbols, batch_format="pyarrow")
        .materialize()
    )

    def pair_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter = Counter()
        ns = batch.column("n").to_pylist()
        for syms, n in zip(batch.column("syms").to_pylist(), ns):
            for a, b in zip(syms, syms[1:]):
                counter[(a, b)] += n
        keys = list(counter.keys())
        return pa.table(
            {
                "left": pa.array([k[0] for k in keys], pa.string()),
                "right": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    def local_top1(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        rows = sorted(
            zip(batch.column("n").to_pylist(),
                batch.column("left").to_pylist(),
                batch.column("right").to_pylist()),
            key=lambda r: (-r[0], r[1], r[2]),
        )
        n, left, right = rows[0]
        return pa.table({"left": pa.array([left], pa.string()),
                         "right": pa.array([right], pa.string()),
                         "n": pa.array([n], pa.int64())})

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        candidates = (
            words.map_batches(pair_partials, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(local_top1, batch_format="pyarrow")
            .take_all()
        )
        if not candidates:
            break
        best = min(candidates, key=lambda r: (-r["n"], r["left"], r["right"]))
        left, right = best["left"], best["right"]
        merges.append((rank, left, right, int(best["n"])))

        def apply_merge(batch: pa.Table, left=left, right=right) -> pa.Table:
            out = [
                _apply_bpe_merge(syms, left, right)
                for syms in batch.column("syms").to_pylist()
            ]
            return pa.table(
                {
                    "syms": pa.array(out, pa.list_(pa.string())),
                    "n": batch.column("n").cast(pa.int64()),
                }
            )

        words = words.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def bpe_encode(documents_ds, merges, n_merges: int | None = None):
    """Apply a trained BPE merge table (the output of ``bpe_train``) to the
    corpus — the encode half of the tokenizer story. Each document's words
    re-run the merges in rank order; the output is the per-document
    BPE token count plus the whitespace word count (the compression the
    learned vocabulary buys).

    The merge table is broadcast once via ray.put (k rules — bytes, not a
    vocabulary). Words are factorized per batch so each DISTINCT word is
    encoded once per batch and its token count gathered back — Zipf makes
    this ~10× fewer encodes than naive per-occurrence encoding.
    """
    import numpy as np
    import pandas as pd
    import ray

    if not isinstance(merges, pa.Table):
        raise TypeError("merges must be the pa.Table returned by bpe_train")
    rules = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    if n_merges is not None:
        rules = rules[:n_merges]
    rules_ref = ray.put(rules)

    def encode_word(word: str, rules) -> int:
        syms = list(word) + ["</w>"]
        for left, right in rules:
            syms = _apply_bpe_merge(syms, left, right)
        return len(syms)

    def encode(batch: pa.Table) -> pa.Table:
        rules = ray.get(rules_ref)
        doc_ids = batch.column("doc_id").to_pylist()
        words: list[str] = []
        bounds: list[tuple[int, int]] = []
        for text in batch.column("text").to_pylist():
            tokens = _lm_tokens(text)
            bounds.append((len(words), len(tokens)))
            words.extend(tokens)
        if words:
            codes, uniques = pd.factorize(pd.Series(words))
            unique_len = np.fromiter(
                (encode_word(u, rules) for u in uniques),
                dtype=np.int64, count=len(uniques),
            )
            word_tokens = unique_len[codes]
        else:
            word_tokens = np.array([], dtype=np.int64)
        out_ids, out_words, out_bpe = [], [], []
        for doc_id, (start, length) in zip(doc_ids, bounds):
            out_ids.append(doc_id)
            out_words.append(length)
            out_bpe.append(int(word_tokens[start : start + length].sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_words": pa.array(out_words, pa.int64()),
                "n_bpe_tokens": pa.array(out_bpe, pa.int64()),
            }
        )

    return documents_ds.map_batches(encode, batch_format="pyarrow")


def bigram_lm_scores(documents_ds):
    """Per-document mean CONDITIONAL bigram log-probability — the next LM
    quality filter up from :func:`unigram_lm_scores`: for every adjacent
    token pair, p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), Laplace-smoothed,
    with c(w1·) the corpus count of w1 as a bigram CONTEXT and V the
    corpus's distinct-token count. Low scores flag word-salad documents
    that pass unigram filters (every token common, transitions absurd).

    JOIN-ONLY plan: a bigram vocabulary is vocab²-bounded, so there is no
    broadcastable table at web scale even with a cap — the counts stay
    distributed end to end (the VERDICT r3 #3 discipline). Three hash
    shuffles: (doc_id, bigram, k) rows union-equijoin the (bigram, n12)
    counts (log-prob math.log'd per DISTINCT (doc, bigram) — the same libm
    doubles DuckDB's LN produces), the result union-equijoins the
    (w1, n1) context counts, and a final groupby(doc_id) folds
    round(Σ k·logp / Σ k, 6). The only driver scalar is V. Bigram keys
    join the two tokens on newline, provably absent from _lm_tokens output
    (the ccnet_buckets collision lesson: NUL keys collide inside pandas'
    C-string hash table).

    Returns (doc_id, n_bigrams, bigram_lm_score); docs with fewer than two
    tokens have no bigrams and are absent (SQL join semantics).
    """
    import math

    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    SEP = "\n"

    def doc_bigram_rows(batch: pa.Table) -> pa.Table:
        """(doc_id, bigram-key, k) — distinct per doc with multiplicity."""
        doc_ids = batch.column("doc_id").to_pylist()
        keys: list[str] = []
        owner: list[int] = []
        for doc_id, text in zip(doc_ids, batch.column("text").to_pylist()):
            tokens = _lm_tokens(text)
            for a, b in zip(tokens, tokens[1:]):
                keys.append(a + SEP + b)
                owner.append(doc_id)
        if not keys:
            return pa.table({"key": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64())})
        grouped = (
            pd.DataFrame({"doc_id": owner, "key": keys})
            .groupby(["doc_id", "key"], sort=False)
            .size()
            .reset_index(name="k")
        )
        return pa.table({
            "key": pa.array(grouped["key"], pa.string()),
            "doc_id": pa.array(grouped["doc_id"], pa.int64()),
            "k": pa.array(grouped["k"], pa.int64()),
        })

    doc_rows = documents_ds.map_batches(
        doc_bigram_rows, batch_format="pyarrow").materialize()

    # corpus bigram counts: fold the per-doc multiplicities (Σk)
    c12 = (
        doc_rows.groupby("key").aggregate(Sum("k", alias_name="n12"))
    )

    # context counts c(w1·) = Σ over bigrams starting with w1
    def context_partials(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        ks = batch.column("k").to_numpy(zero_copy_only=False)
        w1s = [key.split(SEP, 1)[0] for key in keys]
        grouped = (
            pd.DataFrame({"w1": w1s, "k": ks})
            .groupby("w1", sort=False)["k"].sum().reset_index()
        )
        return pa.table({"w1": pa.array(grouped["w1"], pa.string()),
                         "n1": pa.array(grouped["k"], pa.int64())})

    c1 = (
        doc_rows.map_batches(context_partials, batch_format="pyarrow")
        .groupby("w1").aggregate(Sum("n1", alias_name="n1"))
    )

    # V: distinct tokens corpus-wide (one scalar to the driver)
    def token_partials(batch: pa.Table) -> pa.Table:
        toks = set()
        for text in batch.column("text").to_pylist():
            toks.update(_lm_tokens(text))
        return pa.table({"tok": pa.array(sorted(toks), pa.string()),
                         "one": pa.array(np.zeros(len(toks), np.int64))})

    vocab = (
        documents_ds.map_batches(token_partials, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("one", alias_name="_z"))
        .count()
    )

    # join 1: attach n12 per bigram key
    def tag_doc(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("key"),
            "doc_id": batch.column("doc_id"),
            "k": batch.column("k"),
            "n12": pa.nulls(n, pa.int64()),
        })

    def tag_c12(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("key"),
            "doc_id": pa.nulls(n, pa.int64()),
            "k": pa.nulls(n, pa.int64()),
            "n12": batch.column("n12").cast(pa.int64()),
        })

    # coarse hash partitions + vectorized per-partition merges for all
    # three equijoin rounds (see _tfidf_topk_join for the rationale)
    n_partitions = 256

    def _crc_part_column(batch: pa.Table, col: str) -> pa.Table:
        import zlib

        part = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) % n_partitions
             for t in batch.column(col).to_pylist()),
            dtype=np.int64, count=batch.num_rows,
        )
        return batch.append_column("part", pa.array(part, pa.int32()))

    def attach_n12_part(part_df: pd.DataFrame) -> pa.Table:
        counts = part_df.loc[part_df["n12"].notna(), ["key", "n12"]]
        docs = part_df.loc[part_df["doc_id"].notna(), ["key", "doc_id", "k"]]
        if docs.empty or counts.empty:
            return pa.table({"w1": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "n12": pa.array([], pa.int64())})
        merged = docs.merge(counts.drop_duplicates("key"), on="key", how="inner")
        w1 = [str(key).split(SEP, 1)[0] for key in merged["key"]]
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "doc_id": pa.array(merged["doc_id"].to_numpy(np.int64), pa.int64()),
            "k": pa.array(merged["k"].to_numpy(np.int64), pa.int64()),
            "n12": pa.array(merged["n12"].to_numpy(np.int64), pa.int64()),
        })

    with_n12 = (
        doc_rows.map_batches(tag_doc, batch_format="pyarrow")
        .union(c12.map_batches(tag_c12, batch_format="pyarrow"))
        .map_batches(lambda b: _crc_part_column(b, "key"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_n12_part, batch_format="pandas")
    )

    # join 2: attach n1 per context w1, compute k·logp per row
    def tag_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "w1": batch.column("w1"),
            "doc_id": batch.column("doc_id"),
            "k": batch.column("k"),
            "n12": batch.column("n12"),
            "n1": pa.nulls(n, pa.int64()),
        })

    def tag_c1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "w1": batch.column("w1"),
            "doc_id": pa.nulls(n, pa.int64()),
            "k": pa.nulls(n, pa.int64()),
            "n12": pa.nulls(n, pa.int64()),
            "n1": batch.column("n1").cast(pa.int64()),
        })

    def attach_logp_part(part_df: pd.DataFrame) -> pa.Table:
        counts = part_df.loc[part_df["n1"].notna(), ["w1", "n1"]]
        docs = part_df.loc[part_df["doc_id"].notna(),
                           ["w1", "doc_id", "k", "n12"]]
        if docs.empty or counts.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "klp": pa.array([], pa.float64())})
        merged = docs.merge(counts.drop_duplicates("w1"), on="w1", how="inner")
        # logp per DISTINCT (n12, n1) — identical math.log args (and so
        # identical bits) to the old per-row loop
        pairs = merged[["n12", "n1"]].drop_duplicates()
        logp_map = {(int(a), int(b)): math.log((int(a) + 1) / (int(b) + vocab))
                    for a, b in zip(pairs["n12"], pairs["n1"])}
        logp = np.fromiter(
            (logp_map[(int(a), int(b))]
             for a, b in zip(merged["n12"], merged["n1"])),
            dtype=np.float64, count=len(merged),
        )
        klp = merged["k"].to_numpy(np.float64) * logp
        return pa.table({
            "doc_id": pa.array(merged["doc_id"].to_numpy(np.int64), pa.int64()),
            "k": pa.array(merged["k"].to_numpy(np.int64), pa.int64()),
            "klp": pa.array(klp, pa.float64()),
        })

    scored = (
        with_n12.map_batches(tag_rows, batch_format="pyarrow")
        .union(c1.map_batches(tag_c1, batch_format="pyarrow"))
        .map_batches(lambda b: _crc_part_column(b, "w1"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_logp_part, batch_format="pandas")
    )

    import pyarrow.compute as _pc3

    def add_doc_part(batch: pa.Table) -> pa.Table:
        part = _pc3.bit_wise_and(batch.column("doc_id"),
                                 pa.scalar(n_partitions - 1, pa.int64()))
        return batch.append_column("part", _pc3.cast(part, pa.int32()))

    def fold_part(part_df: pd.DataFrame) -> pa.Table:
        from .rounding import round_half_away

        grouped = (part_df.groupby("doc_id", sort=False)
                   .agg(n_bigrams=("k", "sum"), klp=("klp", "sum"))
                   .reset_index())
        score = round_half_away(
            grouped["klp"].to_numpy(np.float64)
            / grouped["n_bigrams"].to_numpy(np.float64), 6)
        return pa.table({
            "doc_id": pa.array(grouped["doc_id"].to_numpy(np.int64), pa.int64()),
            "n_bigrams": pa.array(grouped["n_bigrams"].to_numpy(np.int64), pa.int64()),
            "bigram_lm_score": pa.array(score, pa.float64()),
        })

    return (
        scored.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_part, batch_format="pandas")
    )


def char_entropy_batch(batch: pa.Table) -> pa.Table:
    """Character-distribution entropy quality signal (low entropy flags
    keyword-stuffed / template / single-char-run junk that length and
    repetition stats miss). Integer contract so the SQL oracle hash-matches
    exactly: each DISTINCT character contributes
    count × FLOOR(1e6 × −ln(count/n)) — the float log is quantized PER
    DISTINCT CHARACTER before the (integer, order-free) sum, the same
    trick dsir.py uses for its log-ratios, so shuffle order can never
    perturb the result. entropy_units / (1e6 × n_chars) ≈ nats/char."""
    import math

    import numpy as np

    ids = batch.column("doc_id")
    n_chars, n_distinct, units = [], [], []
    for text in batch.column("text").to_pylist():
        text = text or ""
        n = len(text)
        if n == 0:
            n_chars.append(0)
            n_distinct.append(0)
            units.append(0)
            continue
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        _, counts = np.unique(codes, return_counts=True)
        total = 0
        for c in counts.tolist():
            total += c * math.floor(1_000_000 * -math.log(c / n))
        n_chars.append(n)
        n_distinct.append(len(counts))
        units.append(total)
    return pa.table({
        "doc_id": ids,
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "entropy_units": pa.array(units, pa.int64()),
    })
