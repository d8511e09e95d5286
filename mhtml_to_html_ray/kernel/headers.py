"""RFC 5322 header-line parsing and RFC 2047 encoded-word decoding.

Mirrors parse.js:576-585 (header line + folded continuation) and
util.js:227-300 (encoded words, with adjacent same-charset words merged
before decoding so a multi-byte character split across words survives).
"""

from __future__ import annotations

import re

from .bytesops import decode_base64_bytes, decode_quoted_printable
from .charsets import decode_string, encode_string

HEADER_NAME_RE = re.compile(r"^[!-9;-~]+:")
HEADER_CONTINUATION_RE = re.compile(r"^[ \t]")

_ENCODED_WORD_START = "=?"
_ENCODED_WORD_END = "?="


def parse_header_line(line: str, obj: dict[str, str], header_key: str | None) -> str | None:
    """``name: value`` split with lowercased key; a continuation line appends
    its trimmed text to the previous header (parse.js:576-585)."""
    index = line.find(":")
    if index > -1:
        header_key = line[:index].strip().lower()
        obj[header_key] = line[index + 1 :].strip()
    elif header_key is not None and obj.get(header_key) is not None:
        obj[header_key] += line.strip()
    return header_key


def is_header_line(line: str, count_headers: int) -> bool:
    """A printable-ASCII-no-colon field name, or an indented continuation when
    at least one header has been read (parse.js:246-249)."""
    return bool(HEADER_NAME_RE.match(line)) or (
        count_headers > 0 and bool(HEADER_CONTINUATION_RE.match(line))
    )


def _decode_encoded_word(header: str, start: int):
    """Return (charset, bytes, end) for the encoded word at ``start``, or None
    when malformed (util.js:275-300). The bytes are returned undecoded so a
    character split across words can be reassembled first."""
    end_charset = header.find("?", start + len(_ENCODED_WORD_START))
    if end_charset == -1:
        return None
    end_encoding = header.find("?", end_charset + 1)
    if end_encoding == -1:
        return None
    end_value = header.find(_ENCODED_WORD_END, end_encoding + 1)
    if end_value == -1:
        return None
    charset = header[start + len(_ENCODED_WORD_START) : end_charset].lower()
    encoding = header[end_charset + 1 : end_encoding].lower()
    value = header[end_encoding + 1 : end_value]
    end = end_value + len(_ENCODED_WORD_END)
    if encoding == "q":
        # in encoded words, "_" stands for a space
        return charset, decode_quoted_printable(encode_string(value.replace("_", " "))), end
    if encoding == "b":
        decoded = decode_base64_bytes(value)
        # an unusable value is kept as it was written, as if never encoded
        return charset, (encode_string(value) if decoded is None else decoded), end
    return None


def decode_mime_header(header: str | None) -> str:
    """Decode the ``=?charset?Q/B?...?=`` words of a header, keeping the text
    around them; adjacent words sharing a charset decode as one group
    (util.js:227-271)."""
    if not header:
        return ""
    parts: list[str] = []
    index = 0
    pending: dict | None = None

    def flush() -> None:
        nonlocal pending
        if pending is not None:
            parts.append(decode_string(b"".join(pending["chunks"]), pending["charset"]))
            pending = None

    while index < len(header):
        start = header.find(_ENCODED_WORD_START, index)
        if start == -1:
            break
        text = header[index:start]
        word = _decode_encoded_word(header, start)
        if word is None:
            flush()
            parts.append(text + _ENCODED_WORD_START)
            index = start + len(_ENCODED_WORD_START)
        else:
            charset, chunk, end = word
            # linear whitespace separating two adjacent encoded words is ignored
            if text and (pending is None or text.strip()):
                flush()
                parts.append(text)
            if pending is not None and pending["charset"] != charset:
                flush()
            if pending is None:
                pending = {"charset": charset, "chunks": []}
            pending["chunks"].append(chunk)
            index = end
    flush()
    parts.append(header[index:])
    return "".join(parts)
