"""Blocklist gates — the two filters every production crawl/curation
pipeline runs that the reference leaves to its caller (SURVEY.md §2 covers
the protocol gate at frontier/canon.py:53; these are the content/host
analogues, UT1-style):

* ``host_blocklist_gate`` — drop URLs whose REGISTERED host matches a
  domain-suffix blocklist (``ads.example`` blocks ``ads.example`` and any
  ``*.ads.example``). Hosts come from the engine's real WHATWG
  canonicalizer (frontier/canon.py host_of), so IDNA/case/port forms all
  normalize before matching — the same host key the seen-set shards on.
* ``word_blocklist_gate`` — per-document blocked-token fraction over the
  shared ``_lm_tokens`` whitespace contract, keep iff the fraction stays
  under a threshold (the C4 "dirty word" gate generalized to any list).

Scale shape: both lists are SMALL-side state (UT1 is ~4M domains ≈ 100 MB;
word lists are KBs) — broadcast once via ``ray.put``, loaded per actor in
``__init__``, looked up vectorized per batch. Zero shuffle in either gate;
the suffix match factorizes per batch so the host parse + suffix walk runs
once per DISTINCT host (crawl batches are host-contiguous after the wave
sort, so this is ~1 parse per batch in steady state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _suffix_blocked(host: str, suffixes: frozenset[str]) -> bool:
    """True iff host equals a blocklist entry or sits under one. Walk the
    host's own suffix chain (a.b.c → a.b.c, b.c, c) instead of scanning
    the list — O(labels) per host however big the blocklist."""
    if host.endswith("."):
        # the canonicalizer keeps FQDN trailing dots (WHATWG); a blocklist
        # must treat 'tracker.net.' as 'tracker.net' or it's bypassable
        host = host[:-1]
    if not host:
        return False
    parts = host.split(".")
    return any(".".join(parts[i:]) in suffixes for i in range(len(parts)))


def host_blocklist_gate(ds, suffixes, url_col: str = "url"):
    """Adds ``host`` (canonicalized registered host, '' when unparsable)
    and ``blocked`` (bool) to ``ds``. ``suffixes`` is any iterable of
    lowercase domain suffixes."""
    import ray

    suffixes_ref = ray.put(frozenset(suffixes))

    class Gate:
        def __init__(self):
            self.suffixes = ray.get(suffixes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..frontier.canon import canonicalize

            urls = batch.column(url_col).to_pylist()
            codes, uniques = pd.factorize(pd.Series(urls))
            hosts_u = []
            blocked_u = []
            for u in uniques:
                try:
                    host = canonicalize(u).host
                except Exception:
                    host = ""
                hosts_u.append(host)
                blocked_u.append(_suffix_blocked(host, self.suffixes))
            # null URLs factorize to code -1, which would NEGATIVE-INDEX
            # into the unique arrays (silently copying the last unique's
            # verdict); append the null sentinel ('' host, not blocked)
            # and route -1 there instead
            hosts_u.append("")
            blocked_u.append(False)
            codes = np.where(codes < 0, len(hosts_u) - 1, codes)
            hosts = np.asarray(hosts_u, dtype=object)[codes]
            blocked = np.asarray(blocked_u, dtype=bool)[codes]
            return batch.append_column(
                "host", pa.array(hosts, pa.string())
            ).append_column("blocked", pa.array(blocked, pa.bool_()))

    return ds.map_batches(Gate, concurrency=(1, 8), batch_format="pyarrow")


def word_blocklist_gate(documents_ds, words, max_frac: float = 0.1):
    """Per-document blocked-token stats over ``_lm_tokens``: adds
    (n_tokens, n_blocked, blocked_frac rounded to 6, keep). Matching is
    case-insensitive exact-token. Zero-token docs keep (frac 0)."""
    import ray

    from .rounding import round_half_away

    words_ref = ray.put(frozenset(w.lower() for w in words))

    class Gate:
        def __init__(self):
            self.words = ray.get(words_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from .textstats import _lm_tokens

            tokens: list[str] = []
            lengths: list[int] = []
            for text in batch.column("text").to_pylist():
                # null text gates like empty (0 tokens, kept) instead of
                # aborting the whole task inside the regex split
                toks = _lm_tokens(text) if text is not None else []
                tokens.extend(toks)
                lengths.append(len(toks))
            n_docs = batch.num_rows
            if tokens:
                codes, uniques = pd.factorize(
                    pd.Series(tokens).str.lower())
                bad_u = np.fromiter((u in self.words for u in uniques),
                                    dtype=bool, count=len(uniques))
                doc_idx = np.repeat(np.arange(n_docs),
                                    np.asarray(lengths, dtype=np.int64))
                n_blocked = np.bincount(doc_idx, weights=bad_u[codes],
                                        minlength=n_docs).astype(np.int64)
            else:
                n_blocked = np.zeros(n_docs, np.int64)
            n_tokens = np.asarray(lengths, dtype=np.int64)
            frac = round_half_away(
                np.where(n_tokens > 0,
                         n_blocked / np.maximum(n_tokens, 1), 0.0), 6)
            return batch.append_column(
                "n_tokens", pa.array(n_tokens)
            ).append_column(
                "n_blocked", pa.array(n_blocked)
            ).append_column(
                "blocked_frac", pa.array(frac, pa.float64())
            ).append_column(
                "keep", pa.array(frac <= max_frac, pa.bool_()))

    return documents_ds.map_batches(Gate, concurrency=(1, 8),
                                    batch_format="pyarrow")
