"""Reference ↔ Content-Location matching (ported from reference
test/urls.test.js)."""

import pytest

from mhtml_to_html_ray.kernel.convert import convert
from mhtml_to_html_ray.kernel.mime import parse
from tests.helpers import encode_utf8

BOUNDARY = "----=_B"
DOCUMENT_LOCATION = "https://e/dir/page.html"
PNG = "iVBORw0KGgo="
PNG_URI = f"data:image/png;base64,{PNG}"


def build(reference=None, location=None, content_id=None, document_location=DOCUMENT_LOCATION, parts=()):
    image = "\r\n".join(
        [
            f"--{BOUNDARY}",
            "Content-Type: image/png",
            "Content-Transfer-Encoding: base64",
            *([] if location is None else [f"Content-Location: {location}"]),
            *([] if content_id is None else [f"Content-ID: {content_id}"]),
            "",
            PNG,
        ]
    )
    return encode_utf8(
        "\r\n".join(
            [
                "MIME-Version: 1.0",
                f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
                "",
                f"--{BOUNDARY}",
                "Content-Type: text/html; charset=utf-8",
                "Content-Transfer-Encoding: 8bit",
                f"Content-Location: {document_location}",
                "",
                f'<html><body><img src="{reference}"></body></html>',
                image,
                *parts,
                f"--{BOUNDARY}--",
                "",
            ]
        )
    )


def matches(**options):
    return PNG_URI in convert(build(**options)).data


MATCHING = [
    ("plain relative reference", "i.png", "https://e/dir/i.png"),
    ("relative Content-Location", "i.png", "i.png"),
    ("dot segments in the Content-Location", "i.png", "https://e/dir/sub/../i.png"),
    ("dot segments in the reference", "sub/../i.png", "https://e/dir/i.png"),
    ("explicit default port", "i.png", "https://e:443/dir/i.png"),
    ("upper case host", "i.png", "https://E/dir/i.png"),
    ("space encoded on both sides", "my%20image.png", "https://e/dir/my%20image.png"),
    ("space raw in the Content-Location", "my%20image.png", "https://e/dir/my image.png"),
    ("space raw on both sides", "my image.png", "https://e/dir/my image.png"),
    ("non-ASCII raw on both sides", "café.png", "https://e/dir/café.png"),
    ("non-ASCII encoded in reference only", "caf%C3%A9.png", "https://e/dir/café.png"),
    ("Cyrillic encoded in reference only", "%D1%84.png", "https://e/dir/ф.png"),
    ("same query on both sides", "i.png?v=2", "https://e/dir/i.png?v=2"),
]


@pytest.mark.parametrize("name,reference,location", MATCHING, ids=[m[0] for m in MATCHING])
def test_reference_matched(name, reference, location):
    assert matches(reference=reference, location=location), f"{reference} did not find {location}"


NOT_MATCHING = [
    ("fragment the part does not carry", "i.png#icon", "https://e/dir/i.png"),
    ("query the part does not carry", "i.png?v=2", "https://e/dir/i.png"),
    ("escapes differing only in case", "a%2Fb.png", "https://e/dir/a%2fb.png"),
]


@pytest.mark.parametrize("name,reference,location", NOT_MATCHING, ids=[m[0] for m in NOT_MATCHING])
def test_reference_deliberately_not_matched(name, reference, location):
    assert not matches(reference=reference, location=location), f"behaviour changed for {reference}"


def test_cid_reference_outside_frame():
    assert matches(reference="cid:x@y", content_id="<x@y>")


def test_cid_reference_inside_stylesheet():
    raw = encode_utf8(
        "\r\n".join(
            [
                "MIME-Version: 1.0",
                f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
                "",
                f"--{BOUNDARY}",
                "Content-Type: text/html; charset=utf-8",
                "Content-Transfer-Encoding: 8bit",
                f"Content-Location: {DOCUMENT_LOCATION}",
                "",
                "<html><head><style>p{background:url(cid:x@y)}</style></head><body><p>x</p></body></html>",
                f"--{BOUNDARY}",
                "Content-Type: image/png",
                "Content-Transfer-Encoding: base64",
                "Content-ID: <x@y>",
                "",
                PNG,
                f"--{BOUNDARY}--",
                "",
            ]
        )
    )
    assert PNG_URI in convert(raw).data, "the stylesheet reference was not resolved"


def test_location_identifies_part_even_with_content_id():
    parsed = parse(build(reference="i.png", location="https://e/dir/i.png", content_id="<x@y>"))
    resources = parsed.resources
    assert resources.get("https://e/dir/i.png") is not None, "not keyed by location"
    assert resources.get("<x@y>") is not None, "not reachable by Content-ID"
    assert resources["https://e/dir/i.png"] is resources["<x@y>"], "two addresses gave different parts"
    assert resources["https://e/dir/i.png"].id == "https://e/dir/i.png"


def test_address_stored_as_reference_resolves():
    parsed = parse(build(reference="i.png", location="https://E:443/dir/sub/../i.png"))
    assert parsed.resources.get("https://e/dir/i.png") is not None, "not normalized"
    assert parsed.resources.get("https://E:443/dir/sub/../i.png") is not None, "as-written form lost"


def test_first_of_two_parts_sharing_address_wins():
    raw = encode_utf8(
        "\r\n".join(
            [
                "MIME-Version: 1.0",
                f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
                "",
                f"--{BOUNDARY}",
                "Content-Type: text/html; charset=utf-8",
                "Content-Transfer-Encoding: 8bit",
                f"Content-Location: {DOCUMENT_LOCATION}",
                "",
                '<html><body><img src="i.png"></body></html>',
                f"--{BOUNDARY}",
                "Content-Type: text/plain",
                "Content-Transfer-Encoding: 8bit",
                "Content-Location: https://e/dir/i.png",
                "",
                "FIRST",
                f"--{BOUNDARY}",
                "Content-Type: text/plain",
                "Content-Transfer-Encoding: 8bit",
                "Content-Location: https://e/dir/i.png",
                "",
                "SECOND",
                f"--{BOUNDARY}--",
                "",
            ]
        )
    )
    parsed = parse(raw)
    assert parsed.resources["https://e/dir/i.png"].data == "FIRST"
    import base64

    assert base64.b64encode(b"FIRST").decode() in convert(raw).data, "the second part was inlined"


def test_whatwg_input_preprocessing():
    """new URL trims C0/space and strips tab/LF/CR before parsing — stray
    whitespace in a Content-Location must normalize to the clean form."""
    from mhtml_to_html_ray.kernel.urlutil import parse_absolute, resolve_path

    assert parse_absolute("http://a.example/p\nath") == "http://a.example/path"
    assert parse_absolute(" http://a.example/x\t") == "http://a.example/x"
    assert parse_absolute("\nhttp://a.example/x") == "http://a.example/x"
    assert resolve_path(" i.png\n", "https://e/dir/page.html") == "https://e/dir/i.png"


def test_backslash_only_in_path_states():
    """WHATWG: '\\' becomes '/' in path states only; query and fragment keep
    backslashes verbatim (new URL parity)."""
    from mhtml_to_html_ray.kernel.urlutil import parse_absolute

    assert parse_absolute("https://a.example/p#c\\d") == "https://a.example/p#c\\d"
    assert parse_absolute("https://a.example/p?x=a\\b") == "https://a.example/p?x=a\\b"
    assert parse_absolute("https://a.example\\p\\q") == "https://a.example/p/q"
