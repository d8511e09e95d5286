"""PII detection/redaction for web-text corpora — the scrubbing pass every
training-data pipeline runs before anything else sees the text.

Scale shape: pure per-batch map, zero shuffle, zero state. The regex
kernels are pyarrow.compute's RE2 engine (``replace_substring_regex`` /
``count_substring_regex``) — vectorized C++, no Python loop over rows, and
the SAME RE2 dialect DuckDB's regexp functions use, so an SQL oracle
reproduces the redaction byte-for-byte (parity probed in tests).

Patterns are deliberately conservative, high-precision forms (the
standard production posture: a missed weird email beats mangling code
snippets). Match counts are taken on the ORIGINAL text per category, and
redactions apply in a fixed order (email → phone → ipv4) so overlapping
matches resolve identically everywhere.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

# applied in this order; counts always on the pre-redaction text
_RULES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One-batch kernel: adds redacted ``text`` plus n_email/n_phone/n_ipv4
    counts; keeps every other column untouched."""
    original = batch.column(text_col)
    out = batch
    redacted = original
    for name, pattern, replacement in _RULES:
        counts = pc.count_substring_regex(original, pattern=pattern)
        out = out.append_column(
            f"n_{name}", pc.cast(counts, pa.int64()))
        redacted = pc.replace_substring_regex(
            redacted, pattern=pattern, replacement=replacement)
    idx = out.schema.get_field_index(text_col)
    return out.set_column(idx, text_col, redacted)


def redact_pii(ds, text_col: str = "text"):
    """Dataset-level PII scrub: text redacted in place, per-category match
    counts appended. Embarrassingly parallel at any corpus size."""
    def kernel(batch: pa.Table) -> pa.Table:
        return redact_batch(batch, text_col=text_col)

    return ds.map_batches(kernel, batch_format="pyarrow")
