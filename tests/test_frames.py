"""Frame handling (ported from reference test/frames.test.js)."""

import re

from mhtml_to_html_ray.kernel.convert import convert
from tests.helpers import concat_bytes, encode_base64, encode_single_byte_charset

BOUNDARY = "----=_B"
LOCATION = "https://example.invalid/"
CONTENT_ID = "<frame-1@mhtml.blink>"
FRAME_LOCATION = "https://example.invalid/frame"
GIF = bytes([0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80, 0xFF, 0x00, 0x3B])


def build(markup, content_type=None, body="", transfer_encoding="8bit"):
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: {LOCATION}\r\n\r\n<html><body>{markup}</body></html>\r\n",
        f"--{BOUNDARY}\r\n",
        "" if content_type is None else f"Content-Type: {content_type}\r\n",
        f"Content-Transfer-Encoding: {transfer_encoding}\r\nContent-ID: {CONTENT_ID}\r\n",
        f"Content-Location: {FRAME_LOCATION}\r\n\r\n",
        body,
        f"\r\n--{BOUNDARY}--\r\n",
    )


IFRAME = f'<iframe src="cid:{CONTENT_ID[1:-1]}"></iframe>'


def test_document_frame_inlined_as_srcdoc():
    data = convert(
        build(IFRAME, "text/html", "<html><body><p>INNER</p></body></html>")
    ).data
    assert re.search(r"srcdoc=", data), "the frame was not inlined"
    assert "INNER" in data


def test_image_frame_becomes_data_uri():
    data = convert(
        build(IFRAME, "image/gif", encode_base64(GIF), "base64")
    ).data
    assert "GIF89a" not in data, "the bytes of the image were parsed as markup"
    assert not re.search(r"srcdoc=", data), "an image was inlined as a document"
    assert f'src="data:image/gif;base64,{encode_base64(GIF, line_length=0)}"' in data


def test_diverted_frame_keeps_original_url():
    data = convert(build(IFRAME, "image/gif", encode_base64(GIF), "base64")).data
    assert f'data-original-src="cid:{CONTENT_ID[1:-1]}"' in data


def test_octet_stream_document_frame_converted():
    data = convert(
        build(IFRAME, "application/octet-stream", "<html><body><p>INNER</p></body></html>")
    ).data
    assert re.search(r"srcdoc=", data), "a mislabeled document was inlined as raw data"
    assert "INNER" in data


def test_frame_with_no_content_type_converted():
    data = convert(build(IFRAME, None, "<html><body><p>INNER</p></body></html>")).data
    assert re.search(r"srcdoc=", data)
    assert "INNER" in data


def test_base64_frame_decoded_with_meta_charset():
    inner = "Привет"
    frame_document = concat_bytes(
        '<html><head><meta charset="windows-1251"></head><body><p>',
        encode_single_byte_charset(inner, "windows-1251"),
        "</p></body></html>",
    )
    data = convert(
        build(IFRAME, "text/html", encode_base64(frame_document), "base64")
    ).data
    assert re.search(r"srcdoc=", data), "the frame was not inlined"
    assert inner in data, "the frame content was not decoded with its charset"
    assert not re.search(r"windows-1251", data, re.I), "a stale charset declaration survived"


def test_object_with_image_part_inlined():
    data = convert(
        build(
            f'<object data="cid:{CONTENT_ID[1:-1]}"></object>',
            "image/gif",
            encode_base64(GIF),
            "base64",
        )
    ).data
    assert "data:image/gif;base64," in data
    assert "GIF89a" not in data
