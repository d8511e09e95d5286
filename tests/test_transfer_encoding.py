"""Byte round-trips per transfer encoding (ported from reference
test/transfer-encoding.test.js)."""

import pytest

from mhtml_to_html_ray.kernel.mime import parse
from tests.helpers import concat_bytes, decode_resource_data

BOUNDARY = "----=_B"

CASES = [
    ("7bit", "7bit", "AB", "AB"),
    ("8bit", "8bit", "AB", "AB"),
    ("binary", "binary", "AB", "AB"),
    ("base64", "base64", "QUI=", "AB"),
    ("quoted-printable", "quoted-printable", "AB", "AB"),
    ("8bit interior line break", "8bit", "A\r\nB", "A\r\nB"),
    ("quoted-printable soft line break", "quoted-printable", "A=\r\nB", "AB"),
    ("8bit empty body", "8bit", "", ""),
]

RAW = concat_bytes(
    f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
    *[
        f"--{BOUNDARY}\r\nContent-Type: application/octet-stream\r\n"
        f"Content-Transfer-Encoding: {encoding}\r\nContent-Location: https://e/r{index}\r\n\r\n{body}\r\n"
        for index, (_, encoding, body, _expected) in enumerate(CASES)
    ],
    f"--{BOUNDARY}--\r\n",
)

RESOURCES = parse(RAW).resources


@pytest.mark.parametrize(
    "index,expected",
    [(index, expected) for index, (_, _, _, expected) in enumerate(CASES)],
    ids=[c[0] for c in CASES],
)
def test_round_trip_exact(index, expected):
    resource = RESOURCES.get(f"https://e/r{index}")
    assert resource is not None, "the part was not found"
    assert decode_resource_data(resource) == expected
