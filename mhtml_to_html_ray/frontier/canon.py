"""URL canonicalization for the frontier — the same WHATWG canonicalizer the
extraction kernel uses for resource matching (SURVEY.md P22: one function
serves both), plus host extraction and the stable 64-bit key the seen-set
shards and the politeness partitioner hash on.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

from ..kernel.urlutil import normalize_location, parse_absolute, resolve_path

_HOST_RE = re.compile(r"^[a-z][a-z0-9+.\-]*://(?:[^/@]*@)?(\[[^\]]*\]|[^/:?#]*)", re.IGNORECASE)


@dataclass(frozen=True)
class CanonUrl:
    url: str
    canon_url: str
    host: str
    host_hash: int
    url_hash: int


def stable_hash64(value: str) -> int:
    """Process-independent 64-bit hash (Python's hash() is salted)."""
    return int.from_bytes(hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "little")


def host_of(canon_url: str) -> str:
    m = _HOST_RE.match(canon_url)
    return m.group(1) if m else ""


def canonicalize(url: str, base: str | None = None) -> CanonUrl:
    """Resolve (optionally against a base) and normalize; the canonical form
    is the seen-set key, so two cluster sizes dedupe identically by
    construction (a pure function of the input string)."""
    resolved = resolve_path(url, base) if base else url
    canon = normalize_location(resolved)
    host = host_of(canon) if parse_absolute(canon) is not None else ""
    return CanonUrl(
        url=url,
        canon_url=canon,
        host=host,
        host_hash=stable_hash64(host),
        url_hash=stable_hash64(canon),
    )


def is_fetchable(url: str) -> bool:
    """Admission filter: only http/https/urn are ever fetched
    (convert.js:810-814 / fetch.test.js:66-79)."""
    return url.startswith(("http:", "https:", "urn:"))


def unwrap_urn(url: str) -> str:
    """``urn:<nid>:<url>`` unwraps before fetching (convert.js:167-171)."""
    m = re.match(r"^urn:[^:]+:(.+)$", url)
    return m.group(1) if m else url
