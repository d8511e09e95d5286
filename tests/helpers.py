"""In-memory MHTML builders + fetch doubles, ported from the reference's test
helpers (test/helpers/mhtml.js, page.js, fetch.js) so the suites pin the same
byte-level semantics. No fixture files on disk."""

from __future__ import annotations

import base64
import threading
import time

from mhtml_to_html_ray.kernel.bytesops import decode_base64_bytes
from mhtml_to_html_ray.kernel.charsets import encode_single_byte_charset

CRLF = "\r\n"
DEFAULT_BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
_BASE64_LINE_LENGTH = 76


def encode_latin1(value: str) -> bytes:
    return bytes(ord(c) & 0xFF for c in value)


def encode_utf8(value: str) -> bytes:
    return value.encode("utf-8")


def concat_bytes(*values) -> bytes:
    parts = []
    for value in values:
        if isinstance(value, str):
            parts.append(encode_latin1(value))
        elif isinstance(value, (bytes, bytearray)):
            parts.append(bytes(value))
        else:
            parts.append(bytes(value))
    return b"".join(parts)


def encode_base64(data, line_length: int = _BASE64_LINE_LENGTH) -> str:
    encoded = base64.b64encode(concat_bytes(data)).decode("ascii")
    if not line_length:
        return encoded
    chunks = [encoded[i : i + line_length] for i in range(0, len(encoded), line_length)]
    result = CRLF.join(chunks)
    if chunks and len(chunks[-1]) == line_length:
        result += CRLF  # the JS helper's regex leaves a trailing CRLF here
    return result


def encode_quoted_printable(data) -> str:
    out = []
    for byte in concat_bytes(data):
        if byte == 0x3D or byte > 0x7E:
            out.append(f"={byte:02X}")
        else:
            out.append(chr(byte))
    return "".join(out)


def part(
    content_type=None,
    transfer_encoding=None,
    location=None,
    content_id=None,
    headers=None,
    body="",
    encode=None,
    eol=CRLF,
    boundary=DEFAULT_BOUNDARY,
) -> bytes:
    header_lines = []
    if content_type is not None:
        header_lines.append(f"Content-Type: {content_type}")
    if transfer_encoding is not None:
        header_lines.append(f"Content-Transfer-Encoding: {transfer_encoding}")
    if location is not None:
        header_lines.append(f"Content-Location: {location}")
    if content_id is not None:
        header_lines.append(f"Content-ID: {content_id}")
    for name, value in (headers or {}).items():
        header_lines.append(f"{name}: {value}")
    return concat_bytes(
        f"--{boundary}{eol}",
        (eol.join(header_lines) + eol) if header_lines else "",
        eol,
        encode(body) if encode else body,
    )


def mhtml_doc(
    headers=None,
    parts=(),
    boundary=DEFAULT_BOUNDARY,
    preamble=None,
    closing=True,
    eol=CRLF,
    content_type=None,
) -> bytes:
    default_content_type = (
        f'multipart/related;{eol}\tboundary="{boundary}";{eol}\ttype="text/html"'
    )
    if headers is None:
        header_bytes = concat_bytes(
            f"MIME-Version: 1.0{eol}Content-Type: {content_type or default_content_type}{eol}"
        )
    else:
        header_bytes = concat_bytes(headers)
    pieces = [header_bytes, eol]
    if preamble is not None:
        pieces.extend([concat_bytes(preamble), eol, eol])
    for item in parts:
        pieces.extend([item, eol])
    if closing:
        pieces.append(f"--{boundary}--{eol}")
    return concat_bytes(*pieces)


def decode_resource_data(resource) -> str:
    """Bytes of a parsed part as a Latin-1 string (base64 parts decoded)."""
    data = str(resource.data)
    if resource.transfer_encoding == "base64":
        decoded = decode_base64_bytes(data)
        assert decoded is not None, f"invalid base64 in resource data: {data!r}"
        return decoded.decode("latin-1")
    return data


# --- one-page builder (test/helpers/page.js) ---

PAGE_BOUNDARY = "----=_B"
ORIGIN = "https://example.com"
DOCUMENT_LOCATION = f"{ORIGIN}/"


def resource(location, content_type, body, transfer_encoding="8bit") -> str:
    return CRLF.join(
        [
            f"--{PAGE_BOUNDARY}",
            f"Content-Type: {content_type}",
            f"Content-Transfer-Encoding: {transfer_encoding}",
            f"Content-Location: {location}",
            "",
            body,
        ]
    )


def page(head="", body="", parts=()) -> bytes:
    document = resource(
        DOCUMENT_LOCATION,
        "text/html; charset=utf-8",
        f"<html><head>{head}</head><body>{body}</body></html>",
    )
    return CRLF.join(
        [
            "MIME-Version: 1.0",
            f'Content-Type: multipart/related; boundary="{PAGE_BOUNDARY}"',
            "",
            document,
            *parts,
            f"--{PAGE_BOUNDARY}--",
            "",
        ]
    ).encode("utf-8")


# --- fetch doubles (test/helpers/fetch.js) ---


class _Headers:
    def __init__(self, mapping=None):
        self._mapping = mapping or {}

    def get(self, name):
        for key, value in self._mapping.items():
            if key.lower() == name.lower():
                return value
        return None


class _Response:
    def __init__(self, ok, status, headers=None, body="", include_bytes=True):
        self.ok = ok
        self.status = status
        self.headers = _Headers(headers)
        self._body = body
        if not include_bytes:
            self.bytes = None  # attribute exists but unusable — callers must use text()

    def text(self):
        return self._body

    def bytes(self):
        return self._body.encode("utf-8")


def stub_fetch(routes, omit_content_type=False):
    """routes: url → {contentType, body} | 'throw' | missing (404)."""
    log = []

    def fetch(url):
        log.append(url)
        route = routes.get(url)
        if route is None or route == "404":
            return _Response(False, 404)
        if route == "throw":
            raise OSError("network down")
        headers = {} if omit_content_type else {"Content-Type": route["contentType"]}
        return _Response(True, 200, headers, route["body"])

    return fetch, log


def scripted_fetch(script, now=time.time):
    """script: sequence of outcomes per attempt — status int, 'throw', 'ok',
    or {'status': s, 'retryAfter': v}; the last entry repeats."""
    log = []
    state = {"index": 0}
    lock = threading.Lock()

    def fetch(url):
        with lock:
            log.append({"url": url, "at": now()})
            step = script[min(state["index"], len(script) - 1)]
            state["index"] += 1
        if step == "throw":
            raise OSError("fetch failed")
        if isinstance(step, int):
            return _Response(False, step)
        if isinstance(step, dict) and step.get("status"):
            return _Response(False, step["status"], {"Retry-After": step.get("retryAfter")})
        return _Response(True, 200, {"Content-Type": "image/png"}, "OK")

    return fetch, log


def tracking_fetch(hold_s=0.005, fail=False):
    state = {"peak": 0, "in_flight": 0, "calls": 0}
    lock = threading.Lock()

    def fetch(url):
        with lock:
            state["calls"] += 1
            state["in_flight"] += 1
            state["peak"] = max(state["peak"], state["in_flight"])
        time.sleep(hold_s)
        with lock:
            state["in_flight"] -= 1
        if fail:
            return _Response(False, 503)
        return _Response(True, 200, {"Content-Type": "image/png"}, "OK")

    return fetch, state


__all__ = [
    "CRLF",
    "DEFAULT_BOUNDARY",
    "PAGE_BOUNDARY",
    "ORIGIN",
    "DOCUMENT_LOCATION",
    "concat_bytes",
    "decode_resource_data",
    "encode_base64",
    "encode_latin1",
    "encode_quoted_printable",
    "encode_single_byte_charset",
    "encode_utf8",
    "mhtml_doc",
    "page",
    "part",
    "resource",
    "stub_fetch",
    "scripted_fetch",
    "tracking_fetch",
]
