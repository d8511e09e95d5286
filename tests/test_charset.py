"""Charset cascade matrix (ported from reference test/charset.test.js):
{koi8-r, windows-1251} × {meta http-equiv, meta charset, part header} ×
{8bit, QP, base64, binary}, CJK codepages × encodings, BOM precedence, and
the selective-decode byte-exactness rules."""

import re

import pytest

from mhtml_to_html_ray.kernel.convert import convert
from mhtml_to_html_ray.kernel.mime import parse
from tests.helpers import (
    concat_bytes,
    decode_resource_data,
    encode_base64,
    encode_quoted_printable,
    encode_single_byte_charset,
)

BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
LOCATION = "https://example.invalid/page.htm"
CHARSETS = ["koi8-r", "windows-1251"]
HELLO = "Привет"
WORLD = "Мир"
REPLACEMENT = "�"

ENCODINGS = {
    "8bit": lambda data: data,
    "quoted-printable": encode_quoted_printable,
    "base64": encode_base64,
    "binary": lambda data: data,
}

DECLARATIONS = {
    "meta http-equiv": lambda charset: f'<META http-equiv="Content-Type" content="text/html; charset={charset}">',
    "meta charset": lambda charset: f'<meta charset="{charset}">',
    "part header alone": lambda charset: "",
}


def build(charset, declaration, encoding):
    document = concat_bytes(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.0 Transitional//EN">\r\n<HTML><HEAD><TITLE>',
        encode_single_byte_charset(HELLO, charset),
        f"</TITLE>\r\n{DECLARATIONS[declaration](charset)}\r\n</HEAD>\r\n<BODY><P>",
        encode_single_byte_charset(WORLD, charset),
        "</P></BODY></HTML>",
    )
    part_charset = f';\r\n\tcharset="{charset}"' if declaration == "part header alone" else ""
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related;\r\n\tboundary="{BOUNDARY}";\r\n\ttype="text/html"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html{part_charset}\r\n",
        f"Content-Transfer-Encoding: {encoding}\r\nContent-Location: {LOCATION}\r\n\r\n",
        ENCODINGS[encoding](document),
        f"\r\n--{BOUNDARY}--\r\n",
    )


@pytest.mark.parametrize("charset", CHARSETS)
@pytest.mark.parametrize("declaration", list(DECLARATIONS))
@pytest.mark.parametrize("encoding", list(ENCODINGS))
def test_single_byte_matrix(charset, declaration, encoding):
    data = convert(build(charset, declaration, encoding)).data
    assert HELLO in data, "the title was not decoded"
    assert WORLD in data, "the body was not decoded"
    assert REPLACEMENT not in data, "decoded with the wrong charset"
    assert not re.search(r"charset=(koi8-r|windows-1251)", data, re.I), "stale charset declaration"


MULTI_BYTE = [
    ("shift_jis", bytes([0x93, 0xFA, 0x96, 0x7B, 0x8C, 0xEA]), "日本語"),
    ("euc-jp", bytes([0xC6, 0xFC, 0xCB, 0xDC]), "日本"),
    ("gb2312", bytes([0xD6, 0xD0, 0xCE, 0xC4]), "中文"),
    ("big5", bytes([0xA4, 0xA4, 0xA4, 0xE5]), "中文"),
    ("euc-kr", bytes([0xC7, 0xD1, 0xB1, 0xB9]), "한국"),
    ("iso-2022-jp", bytes([0x1B, 0x24, 0x42, 0x46, 0x7C, 0x4B, 0x5C, 0x1B, 0x28, 0x42]), "日本"),
]


@pytest.mark.parametrize("charset,raw_bytes,text", MULTI_BYTE, ids=[m[0] for m in MULTI_BYTE])
@pytest.mark.parametrize("encoding", list(ENCODINGS))
def test_multi_byte_matrix(charset, raw_bytes, text, encoding):
    document = concat_bytes(
        "<html><head><title>", raw_bytes, "</title></head><body><p>", raw_bytes, "</p></body></html>"
    )
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="{charset}"\r\n',
        f"Content-Transfer-Encoding: {encoding}\r\nContent-Location: {LOCATION}\r\n\r\n",
        ENCODINGS[encoding](document),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    result = convert(raw)
    assert text in result.data, f"the body was not decoded as {charset}"
    assert result.title == text, "the title was not decoded"
    assert REPLACEMENT not in result.data, "decoded with the wrong charset"


def test_base64_part_mislabeled_as_text_stays_byte_exact():
    jpeg = bytes([0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00, 0x01, 0xFF, 0xDB])
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: 8bit\r\n",
        f'Content-Location: {LOCATION}\r\n\r\n<html><body><img src="photo.jpg"></body></html>\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; name=photo.jpg\r\nContent-Transfer-Encoding: base64\r\n",
        "Content-Location: https://example.invalid/photo.jpg\r\n\r\n",
        encode_base64(jpeg),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    resource = parse(raw).resources["https://example.invalid/photo.jpg"]
    assert resource.transfer_encoding == "base64", "a mislabeled binary part was decoded as text"
    assert bytes(ord(c) for c in decode_resource_data(resource)) == jpeg


def test_kept_encoded_part_keeps_declared_charset_in_data_uri():
    text = encode_single_byte_charset("Привет", "windows-1251")
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: 8bit\r\n",
        f'Content-Location: {LOCATION}\r\n\r\n<html><body><img src="t.txt"></body></html>\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/plain; charset="windows-1251"\r\nContent-Transfer-Encoding: base64\r\n',
        "Content-Location: https://example.invalid/t.txt\r\n\r\n",
        encode_base64(text),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    data = convert(raw).data
    expected = f"data:text/plain;charset=windows-1251;base64,{encode_base64(text, line_length=0)}"
    assert expected in data, "the charset the bytes were written in was not kept in the data URI"


NUL = "\u0000"


def encode_utf16(value: str, little_endian: bool) -> bytes:
    bom = b"\xff\xfe" if little_endian else b"\xfe\xff"
    return bom + value.encode("utf-16-le" if little_endian else "utf-16-be")


def page_linking_stylesheet(stylesheet_headers, stylesheet_body):
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: {LOCATION}\r\n\r\n",
        '<html><head><link rel="stylesheet" href="s.css"></head><body>x</body></html>\r\n',
        f"--{BOUNDARY}\r\n{stylesheet_headers}\r\n",
        "Content-Location: https://example.invalid/s.css\r\n\r\n",
        stylesheet_body,
        f"\r\n--{BOUNDARY}--\r\n",
    )


@pytest.mark.parametrize("little_endian", [True, False], ids=["little-endian", "big-endian"])
def test_utf16_stylesheet_decoded_by_bom(little_endian):
    data = convert(
        page_linking_stylesheet("Content-Type: text/css", encode_utf16("p{color:red}", little_endian))
    ).data
    assert "p{color:red}" in data, "the stylesheet was not decoded with its byte order mark"
    assert REPLACEMENT not in data, "the mark itself was read as text"
    assert NUL not in data, "the sheet was read one byte at a time"


def test_bom_outranks_declared_charset():
    data = convert(
        page_linking_stylesheet(
            'Content-Type: text/css; charset="windows-1251"', encode_utf16("p{color:red}", True)
        )
    ).data
    assert "p{color:red}" in data, "the declared charset was preferred over the mark"


def test_bom_outranks_disagreeing_charset_rule():
    data = convert(
        page_linking_stylesheet(
            "Content-Type: text/css", encode_utf16('@charset "koi8-r";p{color:red}', True)
        )
    ).data
    assert "p{color:red}" in data
    assert "@charset" not in data, "the rule was left in the output"


def test_every_charset_declaration_removed():
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="windows-1251"\r\n',
        f"Content-Transfer-Encoding: 8bit\r\nContent-Location: {LOCATION}\r\n\r\n",
        '<html><head><meta http-equiv="Content-Type" content="text/html; charset=windows-1251">',
        '<meta http-equiv="content-type" name="other" content="text/html; charset=windows-1251">',
        "</head><body><p>",
        encode_single_byte_charset(HELLO, "windows-1251"),
        f"</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    data = convert(raw).data
    assert HELLO in data, "the body was not decoded"
    assert not re.search(r"charset=windows-1251", data, re.I), "a declaration survived"


def test_meta_charset_plus_http_equiv_leaves_nothing_behind():
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html\r\n",
        f"Content-Transfer-Encoding: 8bit\r\nContent-Location: {LOCATION}\r\n\r\n",
        '<html><head><meta charset="windows-1251">',
        '<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">',
        "</head><body><p>",
        encode_single_byte_charset(HELLO, "windows-1251"),
        f"</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    data = convert(raw).data
    assert HELLO in data
    assert not re.search(r"windows-1251", data, re.I), "a declaration survived"


def test_unknown_charset_label_falls_back_to_utf8():
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="x-not-a-real-charset"\r\n',
        f"Content-Transfer-Encoding: 8bit\r\nContent-Location: {LOCATION}\r\n\r\n",
        f"<html><body><p>plain ascii</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    assert "plain ascii" in convert(raw).data


def test_whatwg_c1_fallback_matches_textdecoder():
    """WHATWG windows-125x indexes map the Microsoft-undefined 0x80-0x9F
    slots to C1 controls (TextDecoder emits the control, not U+FFFD);
    genuine index holes outside that range stay errors; windows-1255's
    0xCA is the one extra WHATWG mapping (U+05BA). The single-byte encoder
    inverts all of it."""
    from mhtml_to_html_ray.kernel.charsets import (
        decode_string,
        encode_single_byte_charset,
    )

    assert decode_string(b"\x80\x81\x8d\x8f\x90\x9d", "windows-1252") == \
        "€\x81\x8d\x8f\x90\x9d"
    assert decode_string(b"\x98", "windows-1250") == "\x98"
    # real WHATWG decode errors remain U+FFFD
    assert decode_string(b"\xaa", "windows-1253") == "�"
    assert decode_string(b"\xff", "windows-1253") == "�"
    # the 1255 extra mapping, and 0xCA untouched elsewhere
    assert decode_string(b"\xca", "windows-1255") == "ֺ"
    assert decode_string(b"\xca", "windows-1252") == "Ê"
    # encoder round trip through the same mapping
    assert encode_single_byte_charset("\x81", "windows-1252") == b"\x81"
    assert encode_single_byte_charset("ֺ", "windows-1255") == b"\xca"
