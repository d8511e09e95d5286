"""Deterministic synthetic pages-table generator (FIXTURES.md).

The reference ships no fixture files — every test document is built in
memory by byte-level builders (test/helpers/mhtml.js). This module is the
engine-side equivalent: a pure function of (family, case, seed) producing
the Parquet ``pages`` table of BASELINE.json's ``input_hint`` shape:

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

plus a companion expectations table used by tests and the correctness gate.
No wall clock, no unseeded RNG anywhere.
"""

from __future__ import annotations

import base64
import random
from dataclasses import dataclass, field
from datetime import datetime

import pyarrow as pa

from ..kernel.charsets import encode_single_byte_charset

CRLF = "\r\n"
BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
EPOCH = datetime(2026, 1, 1, 0, 0, 0)
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
PNG_BASE64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
PNG_URI = f"data:image/png;base64,{PNG_BASE64}"


def _latin1(value: str) -> bytes:
    return bytes(ord(c) & 0xFF for c in value)


def _concat(*values) -> bytes:
    return b"".join(v if isinstance(v, (bytes, bytearray)) else _latin1(v) for v in values)


def _b64(data, line_length=76) -> str:
    if isinstance(data, str):
        data = _latin1(data)
    encoded = base64.b64encode(bytes(data)).decode()
    if not line_length:
        return encoded
    chunks = [encoded[i : i + line_length] for i in range(0, len(encoded), line_length)]
    out = CRLF.join(chunks)
    if chunks and len(chunks[-1]) == line_length:
        out += CRLF
    return out


def _qp(data) -> str:
    if isinstance(data, str):
        data = _latin1(data)
    return "".join(f"={b:02X}" if b == 0x3D or b > 0x7E else chr(b) for b in data)


def _part(content_type=None, transfer_encoding=None, location=None, content_id=None, body=b"", boundary=BOUNDARY, eol=CRLF):
    headers = []
    if content_type is not None:
        headers.append(f"Content-Type: {content_type}")
    if transfer_encoding is not None:
        headers.append(f"Content-Transfer-Encoding: {transfer_encoding}")
    if location is not None:
        headers.append(f"Content-Location: {location}")
    if content_id is not None:
        headers.append(f"Content-ID: {content_id}")
    return _concat(
        f"--{boundary}{eol}",
        (eol.join(headers) + eol) if headers else "",
        eol,
        body,
    )


def _mhtml(parts, boundary=BOUNDARY, eol=CRLF, headers=None, closing=True):
    head = headers if headers is not None else _concat(
        f"MIME-Version: 1.0{eol}Content-Type: multipart/related; boundary=\"{boundary}\"{eol}"
    )
    pieces = [head, eol]
    for part in parts:
        pieces.extend([part, eol])
    if closing:
        pieces.append(f"--{boundary}--{eol}")
    return _concat(*pieces)


def _doc_part(location, body_text, head="", charset="utf-8", boundary=BOUNDARY):
    html = f"<html><head>{head}</head><body>{body_text}</body></html>"
    return _part(
        f"text/html; charset={charset}", "8bit", location, body=html, boundary=boundary
    )


@dataclass
class FixtureCase:
    family: str
    case: str
    html: bytes
    text: str  # expected extract_text() of the converted page
    lang: str = "und"
    title: str | None = None
    resources_count: int | None = None
    anomalies: list = field(default_factory=list)
    unfound_resources: list = field(default_factory=list)
    must_contain: list = field(default_factory=list)
    must_not_contain: list = field(default_factory=list)
    expect_error: str = ""


def _page_case(family, case, body_text, head="", extra_parts=(), text=None, **kwargs):
    origin = f"https://{family}.fixture.invalid"
    parts = [_doc_part(f"{origin}/{case}", f"<p>{body_text}</p>", head)] + list(extra_parts)
    return FixtureCase(
        family=family,
        case=case,
        html=_mhtml(parts),
        text=text if text is not None else body_text,
        **kwargs,
    )


def build_cases() -> list[FixtureCase]:
    """One deterministic case list mirroring the reference suites 1:1
    (seed-free: everything is literal)."""
    cases: list[FixtureCase] = []
    image = _part("image/png", "base64", "https://img.fixture.invalid/i.png", body=PNG_BASE64)

    # --- boundary family: body shapes around the delimiter ---
    for name, body in [
        ("plain", "AB"), ("trailing-crlf", "AB\r\n"), ("interior-blank", "A\r\n\r\nB"),
        ("single-break", "\r\n"), ("empty", ""),
    ]:
        octet = _part("application/octet-stream", "8bit",
                      "https://boundary.fixture.invalid/blob", body=body)
        cases.append(_page_case("boundary", name, f"body-{name}", extra_parts=[octet],
                                resources_count=2))

    # --- delimiter family ---
    cases.append(_page_case("delimiter", "padding", "padded", extra_parts=[
        _part("application/octet-stream", "8bit", "https://delimiter.fixture.invalid/a", body="A")
    ], resources_count=2))
    # WebKit glues the delimiter to the markup with nothing in between
    glued = _concat(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; charset=utf-8\r\n",
        "Content-Location: https://delimiter.fixture.invalid/glued\r\n\r\n",
        f"<html><body><p>GLUED</p></body></html>--{BOUNDARY}--\r\n",
    )
    cases.append(FixtureCase("delimiter", "glued", glued, "GLUED", resources_count=1))

    # --- transfer-encoding family ---
    for encoding in ("7bit", "8bit", "base64", "quoted-printable"):
        html = f"<html><head></head><body><p>enc-{encoding}</p></body></html>"
        doc = _part(
            "text/html; charset=utf-8", encoding,
            f"https://encoding.fixture.invalid/{encoding}",
            body={"base64": _b64(html), "quoted-printable": _qp(html)}.get(encoding, html),
        )
        cases.append(FixtureCase("transfer-encoding", encoding, _mhtml([doc]),
                                 f"enc-{encoding}", resources_count=1))

    # --- ids family: anonymous parts get deterministic _N ids ---
    anon_doc = _part("text/html; charset=utf-8", "8bit", body="<html><body><p>anon</p></body></html>")
    anon_img = _part("image/png", "8bit", body="P1")
    cases.append(FixtureCase("ids", "anonymous", _mhtml([anon_doc, anon_img]), "anon",
                             resources_count=2))

    # --- urls family ---
    cases.append(_page_case(
        "urls", "normalized",
        "match", head='<link rel="icon" href="i.png">',
        extra_parts=[_part("image/png", "base64", "https://urls.fixture.invalid:443/sub/../i.png",
                           body=PNG_BASE64)],
        # doc + image under its normalized id + the as-written alias = 3 keys
        must_contain=[PNG_URI], resources_count=3,
    ))

    # --- charset family ---
    for charset, lang, hello in [("koi8-r", "ru", "Привет"), ("windows-1251", "ru", "Мир")]:
        body = _concat(
            "<html><head><meta charset=\"", charset, "\"></head><body><p>",
            encode_single_byte_charset(hello, charset), "</p></body></html>",
        )
        doc = _part("text/html", "8bit", f"https://charset.fixture.invalid/{charset}", body=body)
        cases.append(FixtureCase("charset", charset, _mhtml([doc]), hello, lang=lang,
                                 must_not_contain=[f"charset={charset}"]))
    jp = "日本"
    jp_doc = _part(
        'text/html; charset="iso-2022-jp"', "base64",
        "https://charset.fixture.invalid/iso-2022-jp",
        body=_b64(b"<html><head><title></title></head><body><p>\x1b$BF|K\\\x1b(B</p></body></html>"),
    )
    cases.append(FixtureCase("charset", "iso-2022-jp", _mhtml([jp_doc]), jp, lang="ja"))

    # --- headers family: RFC 2047 subject → JSON-LD name ---
    title = "Архитектура"
    subject_word = f"=?koi8-r?B?{_b64(encode_single_byte_charset(title, 'koi8-r'), 0)}?="
    header_block = _concat(
        "From: <Saved by Fixture>\r\n", f"Subject: {subject_word}\r\n", "MIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related; boundary="{BOUNDARY}"\r\n',
    )
    cases.append(FixtureCase(
        "headers", "rfc2047",
        _mhtml([_doc_part("https://headers.fixture.invalid/p", "<p>hdr</p>")], headers=header_block),
        "hdr", must_contain=[title], resources_count=1,
    ))

    # --- malformed family ---
    cases.append(FixtureCase(
        "malformed", "wrong-boundary",
        _concat(
            'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_DECLARED"\r\n\r\n',
            "------=_ACTUAL\r\nContent-Type: text/html; charset=utf-8\r\n",
            "Content-Location: https://malformed.fixture.invalid/a\r\n\r\n",
            "<html><body><p>RECOVERED</p></body></html>\r\n------=_ACTUAL--\r\n",
        ),
        "RECOVERED", anomalies=[{"type": "declared-boundary-unused"}],
    ))
    cases.append(FixtureCase(
        "malformed", "plain-html",
        _concat("<html><head><title>PLAIN</title></head><body><p>WORD</p></body></html>"),
        "WORD", title="PLAIN", anomalies=[{"type": "document-mislabeled-as-archive"}],
    ))
    cases.append(FixtureCase(
        "malformed", "image-only",
        _concat(
            'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
            "------=_B\r\nContent-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n",
            f"Content-Location: https://malformed.fixture.invalid/i.png\r\n\r\n{PNG_BASE64}\r\n------=_B--\r\n",
        ),
        "", anomalies=[{"type": "index-synthesized", "id": "https://malformed.fixture.invalid/i.png"}],
        must_contain=[PNG_URI],
    ))
    cases.append(FixtureCase(
        "malformed", "not-an-archive",
        _concat(bytes([0x00, 0x05, 0x16, 0x07]), " rubbish"),
        "", expect_error="Index page not found",
    ))

    # --- document family ---
    cases.append(_page_case(
        "document", "img-inline", "IMG",
        extra_parts=[_part("image/png", "base64", "https://document.fixture.invalid/i.png",
                           body=PNG_BASE64)],
        must_contain=[PNG_URI, "data-original-src"], resources_count=2,
    ))
    cases[-1].html = _mhtml([
        _doc_part("https://document.fixture.invalid/img-inline", '<p>IMG</p><img src="i.png">'),
        _part("image/png", "base64", "https://document.fixture.invalid/i.png", body=PNG_BASE64),
    ])
    cases.append(_page_case(
        "document", "script-removed", "KEPT",
        head="<script>removeme()</script>",
        must_not_contain=["removeme()"], resources_count=1,
    ))
    cases.append(_page_case(
        "document", "unfound", "HOLE",
        unfound_resources=["https://document.fixture.invalid/missing.png"],
        resources_count=1,
    ))
    cases[-1].html = _mhtml([
        _doc_part("https://document.fixture.invalid/unfound", '<p>HOLE</p><img src="missing.png">'),
    ])

    # --- stylesheet family ---
    css_part = _part("text/css", "8bit", "https://stylesheet.fixture.invalid/s.css",
                     body="p{background:url(i.png)}")
    cases.append(FixtureCase(
        "stylesheet", "url-inline",
        _mhtml([
            _doc_part("https://stylesheet.fixture.invalid/page",
                      "<p>CSS</p>", head='<link rel="stylesheet" href="s.css">'),
            css_part,
            _part("image/png", "base64", "https://stylesheet.fixture.invalid/i.png", body=PNG_BASE64),
        ]),
        "CSS", must_contain=["/* original URL: https://stylesheet.fixture.invalid/i.png */", PNG_URI],
        resources_count=3,
    ))

    # --- frames family ---
    cases.append(FixtureCase(
        "frames", "srcdoc",
        _mhtml([
            _doc_part("https://frames.fixture.invalid/outer",
                      '<p>OUTER</p><iframe src="cid:f1"></iframe>'),
            _part("text/html", "8bit", "https://frames.fixture.invalid/frame", "<f1>",
                  body="<html><body><p>INNER</p></body></html>"),
        ]),
        "OUTER", must_contain=["srcdoc=", "INNER"], resources_count=3,
    ))

    # --- srcset family ---
    cases.append(FixtureCase(
        "srcset", "density",
        _mhtml([
            _doc_part("https://srcset.fixture.invalid/page",
                      '<p>SRCSET</p><img srcset="a.png 1x" src="a.png">'),
            _part("image/png", "base64", "https://srcset.fixture.invalid/a.png", body=PNG_BASE64),
        ]),
        "SRCSET", must_contain=[f"{PNG_URI} 1x"], resources_count=2,
    ))
    return cases


def case_url(case: FixtureCase) -> str:
    return f"https://{case.family}.fixture.invalid/{case.case}"


def pages_table(cases: list[FixtureCase] | None = None) -> pa.Table:
    """The pages table (input_hint shape) for the full case matrix."""
    cases = cases if cases is not None else build_cases()
    return pa.table(
        {
            "url": [case_url(c) for c in cases],
            "warc_ts": pa.array(
                [EPOCH_US + i * 1_000_000 for i in range(len(cases))], pa.int64()
            ).cast(pa.timestamp("us")),
            "html": pa.array([c.html for c in cases], pa.binary()),
            "text": [c.text for c in cases],
            "lang": [c.lang for c in cases],
        }
    )


def corpus_pages_table(n_rows: int, n_hosts: int = 16, seed: int = 42) -> pa.Table:
    """Bench-scale corpus: the case matrix replicated to ``n_rows`` unique
    urls across ``n_hosts`` synthetic hosts (H ≪ N forces host skew on
    purpose — the politeness path needs it)."""
    rng = random.Random(seed)
    cases = build_cases()
    usable = [c for c in cases if not c.expect_error]
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i in range(n_rows):
        case = usable[rng.randrange(len(usable))]
        host = f"host-{rng.randrange(n_hosts)}.fixture.invalid"
        urls.append(f"https://{host}/{case.family}/{case.case}/{i}")
        ts.append(EPOCH_US + i)
        htmls.append(case.html)
        texts.append(case.text)
        langs.append(case.lang)
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": texts,
            "lang": langs,
        }
    )


def write_pages_parquet(path: str, table: pa.Table | None = None) -> str:
    import pyarrow.parquet as pq

    pq.write_table(table if table is not None else pages_table(), path)
    return path
