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


_SURT_AUTH_RE = re.compile(
    r"^[a-z][a-z0-9+.\-]*://(?:[^/@]*@)?([^/?#]*)([^#]*)", re.IGNORECASE)


def surt_key(url: str, base: str | None = None) -> str:
    """Simplified SURT (Sort-friendly URI Reordering Transform) — the
    web-archive capture-index key: canonical host labels reversed and
    comma-joined, then ``)`` + path[?query].

        https://news.example.com/a/b?q=1  →  com,example,news)/a/b?q=1

    Built on the shared WHATWG canonicalizer (host lowercased, default port
    dropped), then: userinfo and fragment drop, one trailing host dot
    strips (FQDN form, the url_blocklist discipline), a non-default port
    stays after the reversed host (``com,example:8080)``), IPv6 literals
    are not reversed. Documented SUBSET of pywb's SURT: no query-param
    sorting or session-id stripping. Returns "" for non-absolute or
    hostless inputs.
    """
    canon = canonicalize(url, base).canon_url
    m = _SURT_AUTH_RE.match(canon)
    if not m:
        return ""
    authority, rest = m.group(1), m.group(2)
    if authority.startswith("["):
        end = authority.find("]")
        if end < 0:
            return ""
        key_host, port = authority[:end + 1], authority[end + 1:]
    else:
        host, _, port_digits = authority.partition(":")
        port = f":{port_digits}" if port_digits else ""
        host = host.rstrip(".")
        if not host:
            return ""
        key_host = ",".join(reversed(host.split(".")))
    path = rest if rest.startswith("/") else "/" + rest
    return f"{key_host}{port}){path}"


# the tracking/click-id query parameters every crawl canonicalizer strips
# before seen-set dedup (two captures differing only in ad-click ids are the
# same page); list kept small + documented — a gate, not a registry
TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "yclid", "mc_eid", "igshid", "ref_src",
})


def strip_tracking(url: str) -> str:
    """Canonicalize, then drop tracking query parameters (TRACKING_PARAMS,
    case-insensitive names) preserving the order of the rest; a query left
    empty drops its ``?``. Fragments and non-absolute URLs pass through
    canonicalization unchanged. Dedup discipline: URLs differing only in
    click ids collapse to one seen-set key."""
    canon = canonicalize(url).canon_url
    # fragment FIRST: WHATWG fragments legally contain '?' (SPA hash
    # routes), so a '?'-first split would strip params out of the fragment
    before_frag, hash_sep, fragment = canon.partition("#")
    head, sep, query = before_frag.partition("?")
    if not sep:
        return canon
    kept = [
        pair for pair in query.split("&")
        if pair.partition("=")[0].lower() not in TRACKING_PARAMS
    ]
    rebuilt = head + ("?" + "&".join(kept) if kept else "")
    return rebuilt + (hash_sep + fragment if hash_sep else "")
