"""Property-based tests (hypothesis) over the byte-level kernel and the
frontier primitives — the reference's suites pin examples; these pin the
algebra (round trips, idempotence, no false negatives)."""

import base64

from hypothesis import given, settings, strategies as st

from mhtml_to_html_ray.frontier.canon import canonicalize, stable_hash64
from mhtml_to_html_ray.frontier.cuckoo import CuckooFilter
from mhtml_to_html_ray.kernel import srcset
from mhtml_to_html_ray.kernel.bytesops import (
    decode_base64_bytes,
    decode_quoted_printable,
    encode_base64,
)
from mhtml_to_html_ray.kernel.charsets import decode_string, encode_string
from mhtml_to_html_ray.kernel.dom import parse_dom, parse_html, serialize
from mhtml_to_html_ray.kernel.urlutil import normalize_location


@given(st.binary(max_size=512))
def test_base64_round_trip(data):
    assert decode_base64_bytes(encode_base64(data)) == data


@given(st.binary(max_size=512))
def test_base64_forgiving_whitespace(data):
    encoded = encode_base64(data)
    noisy = "\r\n".join(encoded[i : i + 7] for i in range(0, len(encoded), 7))
    assert decode_base64_bytes(noisy) == data


@given(st.binary(max_size=256))
def test_quoted_printable_decodes_reference_encoding(data):
    # the reference test-helper encoding: =XX for '=' and >0x7E
    encoded = "".join(
        f"={b:02X}" if b == 0x3D or b > 0x7E else chr(b) for b in data
    ).encode("latin-1")
    assert decode_quoted_printable(encoded) == data


@given(st.text(max_size=256))
def test_utf8_decode_round_trip(text):
    assert decode_string(encode_string(text)) == text


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=128))
def test_normalize_location_idempotent(value):
    once = normalize_location(value)
    assert normalize_location(once) == once


@given(st.from_regex(r"https?://[a-z][a-z0-9.\-]{0,20}(:[0-9]{1,4})?(/[a-zA-Z0-9._~%/\-]{0,30})?", fullmatch=True))
def test_canonicalize_idempotent_and_stable(url):
    first = canonicalize(url)
    second = canonicalize(first.canon_url)
    assert second.canon_url == first.canon_url
    assert stable_hash64(first.canon_url) == first.url_hash


@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z0-9./\-]{1,12}", fullmatch=True),
            st.sampled_from(["", "1x", "2w", "100w 50h", "0.5x", "bogus"]),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_srcset_serialize_parse_fixpoint(candidates):
    value = ", ".join(f"{url} {desc}".strip() for url, desc in candidates)
    once = srcset.serialize(srcset.parse(value))
    twice = srcset.serialize(srcset.parse(once))
    assert once == twice, "srcset round trip must reach a fixpoint"


@settings(max_examples=25)
@given(st.lists(st.text(alphabet="abcdefg/:.", min_size=1, max_size=20), max_size=200))
def test_cuckoo_never_false_negative(keys):
    filt = CuckooFilter(capacity=4 * max(len(keys), 1) + 16)
    inserted = []
    for key in keys:
        if filt.add(key):
            inserted.append(key)
    for key in inserted:
        assert filt.might_contain(key)


@settings(max_examples=30)
@given(st.text(max_size=400))
def test_dom_parse_serialize_terminates_and_is_stable(source):
    dom = parse_dom(source)
    once = dom.serialize()
    # serializing the reparse of the output reaches a fixpoint (the
    # serializer's escaping idempotence guard, dom-parser-node.js:70-75)
    twice = parse_dom(once).serialize()
    thrice = parse_dom(twice).serialize()
    assert twice == thrice


def test_b64_helpers_match_stdlib():
    payload = bytes(range(256))
    assert encode_base64(payload) == base64.b64encode(payload).decode()


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=600))
def test_mime_parse_never_crashes_and_is_deterministic(raw):
    from mhtml_to_html_ray.kernel.convert import ConvertError, convert
    from mhtml_to_html_ray.kernel.mime import parse

    first = parse(raw)
    second = parse(raw)
    assert list(first.resources) == list(second.resources)
    assert first.anomalies == second.anomalies
    try:
        a = convert(raw).data
    except ConvertError:
        a = None
    try:
        b = convert(raw).data
    except ConvertError:
        b = None
    assert a == b, "conversion of the same bytes differed between runs"


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_fetch_rounds_reach_fixpoint_and_fetch_once(data):
    """Generative version of the fetch-round suites: a random subresource
    graph (images + css chains, some URLs missing) always terminates, fetches
    every reachable URL exactly once, and never fetches unreachable ones."""
    from mhtml_to_html_ray.kernel.convert import Config, convert
    from tests.helpers import ORIGIN, page, stub_fetch

    n_images = data.draw(st.integers(0, 4))
    n_css = data.draw(st.integers(0, 3))
    missing = data.draw(st.sets(st.integers(0, 6), max_size=3))
    routes = {}
    body_parts = []
    for i in range(n_images):
        body_parts.append(f'<img src="img{i}.png">')
        if i not in missing:
            routes[f"{ORIGIN}/img{i}.png"] = {"contentType": "image/png", "body": f"I{i}"}
    head = ""
    for c in range(n_css):
        head += f'<link rel="stylesheet" href="c{c}.css">'
        target = f"c{c + 1}.css" if c + 1 < n_css else f"deep{c}.png"
        routes[f"{ORIGIN}/c{c}.css"] = {
            "contentType": "text/css", "body": f'p{{background:url("{target}")}}'}
        routes[f"{ORIGIN}/deep{c}.png"] = {"contentType": "image/png", "body": f"D{c}"}
    fetch, log = stub_fetch(routes)
    result = convert(
        page(head=head, body="".join(body_parts)),
        Config(fetch_missing_resources=True, fetch=fetch, sleep_ms=lambda ms: None),
    )
    assert isinstance(result.data, str)
    assert len(log) == len(set(log)), f"a URL was fetched twice: {log}"
    for url in log:
        assert url.startswith(ORIGIN)
    # every present, referenced url was fetched
    referenced = {f"{ORIGIN}/img{i}.png" for i in range(n_images)}
    referenced |= {f"{ORIGIN}/c{c}.css" for c in range(n_css)}
    for url in referenced & set(routes):
        assert url in log, f"{url} reachable but never fetched"


def test_tag_soup_fuzz_never_crashes():
    """Random tag soup through parse+serialize: no exceptions, a body always
    comes back, and the output re-parses. (Strict serialize idempotence is
    NOT asserted — the reference itself documents that serialization is not
    idempotent, parse.js:466-470 comment.)"""
    import random

    from mhtml_to_html_ray.kernel.dom import parse_html, serialize

    rng = random.Random(7)
    tags = ["b", "i", "u", "p", "div", "span", "li", "ul", "table", "tr",
            "td", "h1", "h2", "select", "option", "svg", "a", "em", "dl",
            "dt", "dd", "template", "button"]
    for _ in range(800):
        n = rng.randint(1, 40)
        parts = []
        for _ in range(n):
            tag = rng.choice(tags)
            kind = rng.random()
            if kind < 0.45:
                parts.append(f"<{tag}>")
            elif kind < 0.8:
                parts.append(f"</{tag}>")
            else:
                parts.append(rng.choice(["x", " ", "y z", "&amp;"]))
        source = "<body>" + "".join(parts) + "</body>"
        once = serialize(parse_html(source).body)
        assert once.startswith("<body>")
        serialize(parse_html(once).body)  # must re-parse cleanly too


_AAA_TOKENS = st.sampled_from(
    ["<b>", "</b>", "<i>", "</i>", "<a>", "</a>", "<nobr>", "</nobr>",
     "<div>", "</div>", "<p>", "</p>", "<button>", "</button>",
     "<table>", "</table>", "<tr>", "<td>", "</td>", "<span>", "</span>",
     "x", "y"]
)


@given(st.lists(_AAA_TOKENS, max_size=30))
@settings(max_examples=300, deadline=None)
def test_adoption_agency_structural_integrity(tokens):
    """Random formatting/block misnesting through the full adoption agency:
    parsing terminates, the serialize fixpoint holds, and — because the
    algorithm MOVES nodes between parents — the resulting tree is a real
    tree: every reachable node appears exactly once and every child's
    parent_node points at its actual parent."""
    source = "".join(tokens)
    doc = parse_html(source)

    seen = set()

    def walk(node, parent):
        assert id(node) not in seen, "node appears twice in the tree"
        seen.add(id(node))
        if parent is not None:
            assert node.parent_node is parent, "broken parent pointer"
        for child in (getattr(node, "child_nodes", None) or []):
            walk(child, node)
        content = getattr(node, "content", None)
        if content is not None:
            walk(content, None)

    walk(doc, None)
    once = serialize(doc.body) if doc.body is not None else ""
    twice_doc = parse_html(once)
    twice = serialize(twice_doc.body) if twice_doc.body is not None else ""
    thrice_doc = parse_html(twice)
    thrice = serialize(thrice_doc.body) if thrice_doc.body is not None else ""
    assert twice == thrice


_SOUP_TOKENS = [
    "<table>", "</table>", "<td>", "</td>", "<tr>", "</tr>", "<tbody>",
    "</tbody>", "<caption>", "</caption>", "<template>", "</template>",
    "<select>", "</select>", "<option>", "<optgroup>", "</optgroup>",
    "<head>", "</head>", "<body>", "</body>", "<b>", "</b>", "<i>", "</i>",
    "<p>", "</p>", "<li>", "<form>", "</form>", "<input type=hidden>",
    "<input>", "<frameset>", "</frameset>", "<svg>", "</svg>", "<math>",
    "</math>", "x", " ", "\n", "<!--c-->", "<col>", "<colgroup>", "<div>",
    "</div>", "<a>", "</a>", "<button>",
]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(_SOUP_TOKENS), max_size=24))
def test_structured_soup_reparse_fixpoint(tokens):
    # targeted stress over the mode machinery (table scope, templates,
    # select gates, frameset-ok, pre-body whitespace): any soup must parse
    # without raising and reach a serialize fixpoint after one reparse
    source = "".join(tokens)
    once = parse_dom(source).serialize()
    twice = parse_dom(once).serialize()
    thrice = parse_dom(twice).serialize()
    assert twice == thrice
