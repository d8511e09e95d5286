"""Raw-byte header recovery + RFC 2047 matrix (ported from reference
test/headers.test.js)."""

import json
import re

import pytest

from mhtml_to_html_ray.kernel.convert import convert
from mhtml_to_html_ray.kernel.mime import parse
from tests.helpers import (
    concat_bytes,
    encode_base64,
    encode_quoted_printable,
    encode_single_byte_charset,
    encode_utf8,
)

BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
LOCATION = "http://example.invalid/p.htm"
CHARSETS = ["koi8-r", "windows-1251"]
SAVED = "Сохранено"
TITLE = "Архитектура"
REPLACEMENT = "�"

ENCODINGS = {
    "8bit": lambda data: data,
    "quoted-printable": encode_quoted_printable,
    "base64": encode_base64,
}


def build(charset, declared_in="the part", encoding="8bit", ascii_from=False, folded=False):
    title = encode_single_byte_charset(TITLE, charset)
    meta = (
        f'<META http-equiv="Content-Type" content="text/html; charset={charset}">'
        if declared_in == "a meta"
        else ""
    )
    document = concat_bytes(
        f"<html><head>{meta}<title>", title, "</title></head><body><p>body</p></body></html>"
    )
    if ascii_from:
        from_header = concat_bytes("From: <Saved by Microsoft Internet Explorer 5>\r\n")
    else:
        from_header = concat_bytes(
            "From: <",
            encode_single_byte_charset(SAVED, charset),
            " Microsoft\r\n\tInternet Explorer 5>\r\n" if folded else " Microsoft Internet Explorer 5>\r\n",
        )
    return concat_bytes(
        from_header,
        f"Subject: =?{charset}?B?{encode_base64(title, line_length=0)}?=\r\n",
        "Date: Fri, 31 Mar 2006 19:25:16 +0400\r\nMIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related;\r\n\tboundary="{BOUNDARY}";\r\n\ttype="text/html"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html",
        f';\r\n\tcharset="{charset}"' if declared_in == "the part" else "",
        f"\r\nContent-Transfer-Encoding: {encoding}\r\nContent-Location: {LOCATION}\r\n\r\n",
        ENCODINGS[encoding](document),
        f"\r\n--{BOUNDARY}--\r\n",
    )


def page_info(data):
    match = re.search(r'<script type="application/ld\+json">([\s\S]*?)</script>', data)
    assert match, "no JSON-LD block in the output"
    return json.loads(match.group(1))


@pytest.mark.parametrize("charset", CHARSETS)
@pytest.mark.parametrize("declared_in", ["the part", "a meta"])
@pytest.mark.parametrize("encoding", list(ENCODINGS))
def test_raw_header_bytes_recovered(charset, declared_in, encoding):
    info = page_info(convert(build(charset, declared_in, encoding)).data)
    assert info["additionalProperty"]["value"] == f"<{SAVED} Microsoft Internet Explorer 5>"
    assert info["name"] == TITLE, "the RFC 2047 encoded Subject was not decoded"


def test_folded_header_recovered_whole():
    value = page_info(convert(build("koi8-r", folded=True)).data)["additionalProperty"]["value"]
    assert SAVED in value, f"lost the raw bytes: {value}"
    assert "Internet Explorer 5" in value, f"lost the continuation line: {value}"


def test_ascii_header_untouched():
    info = page_info(convert(build("koi8-r", ascii_from=True)).data)
    assert info["additionalProperty"]["value"] == "<Saved by Microsoft Internet Explorer 5>"
    assert info["name"] == TITLE


def test_utf8_document_leaves_headers_alone():
    raw = concat_bytes(
        "From: <Saved by Microsoft Internet Explorer 5>\r\nSubject: plain\r\nMIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="utf-8"\r\nContent-Transfer-Encoding: 8bit\r\n',
        f"Content-Location: {LOCATION}\r\n\r\n",
        encode_utf8(f"<html><head><title>{TITLE}</title></head><body><p>body</p></body></html>"),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    info = page_info(convert(raw).data)
    assert info["additionalProperty"]["value"] == "<Saved by Microsoft Internet Explorer 5>"
    assert info["name"] == "plain"


def test_unrepairable_bytes_do_not_break_conversion():
    raw = concat_bytes(
        "From: <",
        bytes([0x80, 0x81]),
        ">\r\nMIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="utf-8"\r\nContent-Transfer-Encoding: 8bit\r\n',
        f"Content-Location: {LOCATION}\r\n\r\n<html><body><p>body</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    info = page_info(convert(raw).data)
    assert REPLACEMENT in info["additionalProperty"]["value"]


def quoted_printable_word(data: bytes, charset: str) -> str:
    return f"=?{charset}?Q?" + "".join(f"={b:02X}" for b in data) + "?="


def base64_word(data: bytes, charset: str) -> str:
    return f"=?{charset}?B?{encode_base64(data, line_length=0)}?="


def with_subject(subject: str) -> bytes:
    return concat_bytes(
        "From: <Saved by Test>\r\n",
        f"Subject: {subject}\r\n",
        "MIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="utf-8"\r\nContent-Transfer-Encoding: 8bit\r\n',
        f"Content-Location: {LOCATION}\r\n\r\n<html><body><p>body</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )


def subject_of(raw) -> str:
    return page_info(convert(raw).data)["name"]


SPLIT = "イオン"
SPLIT_BYTES = SPLIT.encode("utf-8")


@pytest.mark.parametrize("word", [quoted_printable_word, base64_word], ids=["quoted-printable", "base64"])
def test_character_split_across_two_words(word):
    subject = word(SPLIT_BYTES[:5], "utf-8") + "\r\n " + word(SPLIT_BYTES[5:], "utf-8")
    assert subject_of(with_subject(subject)) == SPLIT


def test_character_split_across_three_words():
    subject = "\r\n ".join(
        quoted_printable_word(chunk, "utf-8")
        for chunk in (SPLIT_BYTES[:4], SPLIT_BYTES[4:5], SPLIT_BYTES[5:])
    )
    assert subject_of(with_subject(subject)) == SPLIT


def test_adjacent_words_in_different_charsets():
    subject = (
        base64_word(encode_single_byte_charset(SAVED, "koi8-r"), "koi8-r")
        + " "
        + base64_word(encode_single_byte_charset(TITLE, "windows-1251"), "windows-1251")
    )
    assert subject_of(with_subject(subject)) == SAVED + TITLE


def test_text_around_and_between_words_preserved():
    word = base64_word(SPLIT.encode("utf-8"), "utf-8")
    assert subject_of(with_subject(f"before {word} after")) == f"before {SPLIT} after"


def test_single_encoded_word():
    assert subject_of(with_subject(base64_word(TITLE.encode("utf-8"), "utf-8"))) == TITLE


def test_malformed_word_left_as_written():
    assert subject_of(with_subject("=?utf-8?B?no-terminator")) == "=?utf-8?B?no-terminator"


@pytest.mark.parametrize("subject", ["cut =?utf-8", "cut =?utf-8?B"])
def test_cut_off_word_left_as_written(subject):
    assert subject_of(with_subject(subject)) == subject


def test_unusable_base64_word_keeps_value_as_text():
    assert subject_of(with_subject("=?utf-8?B?%%%?=")) == "%%%"


def test_parse_exposes_documented_shape_with_decoded_headers():
    parsed = parse(build("koi8-r"))
    assert parsed.headers is not None
    assert parsed.frames is not None
    assert parsed.resources is not None
    assert parsed.index is not None
    assert isinstance(parsed.headers.get("from"), str)
    assert SAVED in parsed.headers["from"]
