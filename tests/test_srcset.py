"""srcset round trips (ported from reference test/srcset.test.js)."""

import re

from mhtml_to_html_ray.kernel.convert import convert
from tests.helpers import ORIGIN, page, resource

SMALL = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
LARGE = (
    "iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAYAAABytg0kAAAAEklEQVR42mNk+M9QzwAFjDAGACzOAv/QMkKYAAAAAElFTkSuQmCC"
)


def uri(data):
    return f"data:image/png;base64,{data}"


def part(name, data):
    return resource(f"{ORIGIN}/{name}", "image/png", data, "base64")


def srcset_of(srcset, parts, tag="img"):
    body = (
        f'<picture><source srcset="{srcset}"><img src="a.png"></picture>'
        if tag == "source"
        else f'<img srcset="{srcset}" src="a.png">'
    )
    data = convert(page(body=body, parts=parts)).data
    match = re.search(rf'<{tag}[^>]*\ssrcset="([^"]*)"', data)
    return match.group(1) if match else None


def test_width_candidates_inlined():
    result = srcset_of("a.png 1w, b.png 2w", [part("a.png", SMALL), part("b.png", LARGE)])
    assert result == f"{uri(SMALL)} 1w, {uri(LARGE)} 2w"


def test_density_descriptors_survive():
    result = srcset_of("a.png 1x, b.png 2x", [part("a.png", SMALL), part("b.png", LARGE)])
    assert result == f"{uri(SMALL)} 1x, {uri(LARGE)} 2x"


def test_zero_density_survives():
    result = srcset_of("a.png 0x, b.png 2x", [part("a.png", SMALL), part("b.png", LARGE)])
    assert result == f"{uri(SMALL)} 0x, {uri(LARGE)} 2x"


def test_width_and_height_together():
    assert srcset_of("a.png 100w 50h", [part("a.png", SMALL)]) == f"{uri(SMALL)} 100w 50h"


def test_invalid_descriptor_kept_as_written():
    assert srcset_of("a.png 5q", [part("a.png", SMALL)]) == f"{uri(SMALL)} 5q"


def test_parenthesized_descriptor_kept_whole():
    assert srcset_of("a.png calc(1x + 1x)", [part("a.png", SMALL)]) == f"{uri(SMALL)} calc(1x + 1x)"


def test_descriptorless_candidate():
    assert srcset_of("a.png", [part("a.png", SMALL)]) == uri(SMALL)


def test_unmatched_candidate_keeps_address():
    result = srcset_of("a.png 1x, gone.png 2x", [part("a.png", SMALL)])
    assert result == f"{uri(SMALL)} 1x, {ORIGIN}/gone.png 2x"


def test_source_element_srcset_rewritten():
    assert srcset_of("a.png 1x", [part("a.png", SMALL)], "source") == f"{uri(SMALL)} 1x"


def test_sizes_untouched():
    data = convert(
        page(
            body='<img srcset="a.png 100w" sizes="(max-width: 600px) 100vw, 50vw" src="a.png">',
            parts=[part("a.png", SMALL)],
        )
    ).data
    assert 'sizes="(max-width: 600px) 100vw, 50vw"' in data


def test_comma_in_url_not_split():
    name = "a,b.png"
    assert srcset_of(f"{name} 1x", [part(name, SMALL)]) == f"{uri(SMALL)} 1x"


def test_extra_whitespace_tolerated():
    result = srcset_of("  a.png   1x  ,\n  b.png   2x  ", [part("a.png", SMALL), part("b.png", LARGE)])
    assert result == f"{uri(SMALL)} 1x, {uri(LARGE)} 2x"


def test_duplicate_candidate_inlined_twice():
    result = srcset_of("a.png 1x, a.png 2x", [part("a.png", SMALL)])
    assert result == f"{uri(SMALL)} 1x, {uri(SMALL)} 2x"
