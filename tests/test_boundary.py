"""RFC 2046 5.1.1: the line break before a boundary delimiter belongs to the
delimiter, not the body (ported from reference test/boundary.test.js)."""

import pytest

from mhtml_to_html_ray.kernel.mime import parse
from tests.helpers import DEFAULT_BOUNDARY as BOUNDARY, concat_bytes, decode_resource_data

LOCATION = "https://example.invalid/r"


def build(body, eol="\r\n"):
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}{eol}Content-Type: application/octet-stream{eol}",
        f"Content-Transfer-Encoding: 8bit{eol}Content-Location: {LOCATION}{eol}{eol}",
        body,
        f"{eol}--{BOUNDARY}--{eol}",
    )


BODIES = [
    ("no trailing line break", "AB", "AB"),
    ("really ends with CRLF", "AB\r\n", "AB\r\n"),
    ("really ends with two CRLF", "AB\r\n\r\n", "AB\r\n\r\n"),
    ("interior blank line", "A\r\n\r\nB", "A\r\n\r\nB"),
    ("single line break", "\r\n", "\r\n"),
    ("empty body", "", ""),
]


@pytest.mark.parametrize("name,body,expected", BODIES, ids=[b[0] for b in BODIES])
def test_body_bytes_exact(name, body, expected):
    resource = parse(build(body)).resources[LOCATION]
    assert resource is not None, "the part was not found"
    assert decode_resource_data(resource) == expected


def test_lf_only_document_keeps_body():
    resource = parse(build("AB", "\n")).resources[LOCATION]
    assert decode_resource_data(resource) == "AB"


def test_lf_only_document_keeps_trailing_lf_of_body():
    resource = parse(build("AB\n", "\n")).resources[LOCATION]
    assert decode_resource_data(resource) == "AB\n"


def test_line_merely_starting_with_boundary_is_body():
    body = f"A\r\n--{BOUNDARY}xyz\r\nB"
    resource = parse(build(body)).resources[LOCATION]
    assert decode_resource_data(resource) == body
