"""Byte-level primitives of the MIME kernel.

Semantics mirror the reference implementation (`/root/reference/lib/util.js`,
`/root/reference/lib/parse.js`) — quoted-printable decode with invalid-escape
passthrough (util.js:172-193), WHATWG "forgiving base64" (atob) semantics
(util.js:204-216), BOM sniffing (util.js:395-403), literal boundary-delimiter
matching (parse.js:497-512) — re-expressed as plain Python over ``bytes``.
"""

from __future__ import annotations

import base64
import binascii
import re

LF = 0x0A
CR = 0x0D
HYPHEN = 0x2D
SPACE = 0x20
TAB = 0x09
EQUALS = 0x3D
LESS_THAN = 0x3C
NUL = 0x00

_HEX_DIGITS = frozenset(b"0123456789ABCDEFabcdef")
_B64_ALPHABET = frozenset(b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/")
_ASCII_WS = b" \t\n\x0c\r"


def decode_quoted_printable(data: bytes) -> bytes:
    """Decode ``=XX`` escapes; invalid escapes pass through verbatim.

    Mirrors util.js:172-193 including the fast path when no ``=`` is present.
    Soft line breaks (``=\\r\\n``) are NOT handled here — the caller resolves
    them across line boundaries exactly like parse.js:313-318.
    """
    if b"=" not in data:
        return data
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if (
            b == EQUALS
            and i + 2 < n
            and data[i + 1] in _HEX_DIGITS
            and data[i + 2] in _HEX_DIGITS
        ):
            out.append(int(data[i + 1 : i + 3], 16))
            i += 3
        else:
            out.append(b)
            i += 1
    return bytes(out)


def decode_base64_bytes(value: str) -> bytes | None:
    """WHATWG forgiving-base64 (``atob``): strip ASCII whitespace, tolerate
    missing padding, return None for anything invalid (util.js:204-216)."""
    data = value.encode("ascii", "replace").translate(None, _ASCII_WS)
    if data.endswith(b"=="):
        data = data[:-2]
    elif data.endswith(b"="):
        data = data[:-1]
    if len(data) % 4 == 1:
        return None
    if not _B64_ALPHABET.issuperset(data):
        return None
    pad = (-len(data)) % 4
    try:
        return base64.b64decode(data + b"=" * pad)
    except (binascii.Error, ValueError):
        return None


def encode_base64(data: bytes) -> str:
    """``btoa`` equivalent: base64 with no line breaks (util.js:195-201)."""
    return base64.b64encode(data).decode("ascii")


def get_bom_charset(data: bytes) -> str | None:
    """BOM sniff: UTF-16LE/BE and UTF-8 marks outrank every declaration
    (util.js:395-403)."""
    if data[:2] == b"\xff\xfe":
        return "utf-16le"
    if data[:2] == b"\xfe\xff":
        return "utf-16be"
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    return None


def find_boundary_delimiter(line: bytes, boundary: bytes | None) -> int:
    """Index of ``boundary`` within ``line`` when the line is a delimiter line:
    ``--`` + boundary, optional closing ``--``, then only transport padding to
    end of line (parse.js:497-512). Returns -1 otherwise.

    The match is a literal byte search — boundaries may contain regex
    metacharacters (malformed.test.js pins this).
    """
    if not boundary:
        return -1
    idx = line.find(boundary)
    if idx < 2 or line[idx - 2] != HYPHEN or line[idx - 1] != HYPHEN:
        return -1
    i = idx + len(boundary)
    n = len(line)
    if i + 1 < n and line[i] == HYPHEN and line[i + 1] == HYPHEN:
        i += 2
    while i < n and (line[i] == SPACE or line[i] == TAB):
        i += 1
    if i >= n or line[i] == CR or line[i] == LF:
        return idx
    return -1


def is_line_feed(line: bytes) -> bool:
    """True when the line is nothing but its terminator (util.js:486-488)."""
    if len(line) == 2:
        return line[0] == CR and line[1] == LF
    if len(line) == 1:
        return line[0] == LF
    return False


def ends_with_crlf(data: bytes) -> bool:
    # mirrors util.js:490-492 including the one-byte CR case
    if len(data) >= 2:
        return data[-2] == CR and data[-1] == LF
    if len(data) == 1:
        return data[0] == CR
    return False


def ends_with_lf(data: bytes) -> bool:
    return len(data) >= 1 and data[-1] == LF


def starts_with_boundary(line: bytes) -> bool:
    return len(line) >= 2 and line[0] == HYPHEN and line[1] == HYPHEN


def starts_with_markup(data: bytes) -> bool:
    """A document begins with a tag, whitespace (and BOM / UTF-16 NUL halves)
    aside (parse.js:549-574)."""
    bom = get_bom_charset(data)
    index = 0
    skip_nul = False
    if bom == "utf-8":
        index = 3
    elif bom is not None:
        index = 2
        skip_nul = True
    for i in range(index, len(data)):
        b = data[i]
        if b == LESS_THAN:
            return True
        if skip_nul and b == NUL:
            continue
        if b not in (SPACE, TAB, CR, LF):
            return False
    return False


# ---------------------------------------------------------------------------
# content-type predicates (util.js:413-461)

_CHARSET_RE = re.compile(r"charset=([^;]+)", re.IGNORECASE)


def _test_content_type(content_type: str | None, prefix: str) -> bool:
    return bool(content_type) and content_type.lower().startswith(prefix)


def is_document(content_type: str | None) -> bool:
    return _test_content_type(content_type, "text/html") or _test_content_type(
        content_type, "application/xhtml+xml"
    )


def is_stylesheet(content_type: str | None) -> bool:
    return _test_content_type(content_type, "text/css")


def is_text(content_type: str | None) -> bool:
    return _test_content_type(content_type, "text/")


def is_image(content_type: str | None) -> bool:
    return _test_content_type(content_type, "image/")


def is_plain_text(content_type: str | None) -> bool:
    return _test_content_type(content_type, "text/plain")


def is_media(content_type: str | None) -> bool:
    """Media a frame can display but that can never be markup (util.js:436-439).
    Deliberately not the complement of is_document — mislabeled documents
    (application/octet-stream) must still be converted."""
    return (
        _test_content_type(content_type, "image/")
        or _test_content_type(content_type, "audio/")
        or _test_content_type(content_type, "video/")
        or _test_content_type(content_type, "font/")
    )


def is_multipart(content_type: str | None) -> bool:
    return _test_content_type(content_type, "multipart/")


def is_multipart_alternative(content_type: str | None) -> bool:
    return _test_content_type(content_type, "multipart/alternative")


def _remove_quotes(value: str) -> str:
    value = re.sub(r'^"(.*)"$', r"\1", value)
    value = re.sub(r"^'(.*)'$", r"\1", value)
    return value.strip()


def get_charset(content_type: str) -> str | None:
    m = _CHARSET_RE.search(content_type)
    if m:
        return _remove_quotes(m.group(1)).lower()
    return None


def replace_charset(content_type: str, charset: str) -> str:
    return _CHARSET_RE.sub(f"charset={charset}", content_type, count=1)


def get_boundary(content_type: str) -> str | None:
    """``boundary=`` parameter from a Content-Type, quotes stripped
    (util.js:454-461)."""
    params = content_type.split(";")[1:]
    for param in params:
        param = param.strip()
        if param.startswith("boundary="):
            return _remove_quotes(param[len("boundary=") :])
    return None


_QUOTED_PARAMETER_RE = re.compile(r'^([^=]+)=\s*"([^"]*)"\s*$')


def get_media_type(content_type: str | None) -> str | None:
    """Sanitize a content type for use inside a data: URI — no whitespace, no
    quotes around parameter values (util.js:508-512)."""
    if not content_type:
        return content_type
    return ";".join(
        _QUOTED_PARAMETER_RE.sub(r"\1=\2", parameter.strip())
        for parameter in content_type.split(";")
    )
