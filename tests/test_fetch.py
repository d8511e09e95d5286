"""Missing-resource fetching with injected fetch doubles (ported from
reference test/fetch.test.js)."""

import base64

from mhtml_to_html_ray.kernel.convert import Config, convert
from tests.helpers import ORIGIN, page, resource, stub_fetch


def b64(text):
    return base64.b64encode(text.encode()).decode()


def inlined(body):
    return f"data:image/png;base64,{b64(body)}"


def fetch_config(fetch, **kwargs):
    return Config(fetch_missing_resources=True, fetch=fetch, sleep_ms=lambda ms: None, **kwargs)


def test_missing_image_fetched_and_inlined():
    fetch, log = stub_fetch({f"{ORIGIN}/missing.png": {"contentType": "image/png", "body": "PNGBYTES"}})
    data = convert(page(body='<img src="missing.png">'), fetch_config(fetch)).data
    assert log == [f"{ORIGIN}/missing.png"]
    assert inlined("PNGBYTES") in data


def test_fetched_stylesheet_references_followed():
    fetch, log = stub_fetch(
        {
            f"{ORIGIN}/missing.css": {"contentType": "text/css", "body": 'body{background:url("deep.png")}'},
            f"{ORIGIN}/deep.png": {"contentType": "image/png", "body": "DEEP"},
        }
    )
    data = convert(
        page(head='<link rel="stylesheet" href="missing.css">', body="x"), fetch_config(fetch)
    ).data
    assert f"{ORIGIN}/missing.css" in log
    assert f"{ORIGIN}/deep.png" in log, f"the nested reference was not discovered: {log}"
    assert b64("DEEP") in data


def test_import_target_in_existing_stylesheet_fetched():
    fetch, log = stub_fetch(
        {f"{ORIGIN}/missing-import.css": {"contentType": "text/css", "body": "p{color:blue}"}}
    )
    data = convert(
        page(
            head='<link rel="stylesheet" href="a.css">',
            body="x",
            parts=[resource(f"{ORIGIN}/a.css", "text/css", '@import url("missing-import.css");')],
        ),
        fetch_config(fetch),
    ).data
    assert f"{ORIGIN}/missing-import.css" in log
    assert b64("p{color:blue}") in data


def test_every_srcset_candidate_fetched():
    fetch, log = stub_fetch(
        {
            f"{ORIGIN}/a.png": {"contentType": "image/png", "body": "A"},
            f"{ORIGIN}/b.png": {"contentType": "image/png", "body": "B"},
        }
    )
    data = convert(page(body='<img srcset="a.png 1x, b.png 2x">'), fetch_config(fetch)).data
    assert sorted(log) == [f"{ORIGIN}/a.png", f"{ORIGIN}/b.png"]
    assert b64("A") in data and b64("B") in data


def test_404_attempted_once_keeps_url():
    fetch, log = stub_fetch({})
    data = convert(
        page(body='<img src="gone.png"><img src="alsogone.png">'), fetch_config(fetch)
    ).data
    assert len(log) == 2, f"retried a permanent failure: {log}"
    assert 'src="gone.png"' in data or f'src="{ORIGIN}/gone.png"' in data


def test_throwing_fetch_retried_then_gives_up():
    fetch, log = stub_fetch({f"{ORIGIN}/boom.png": "throw"})
    data = convert(page(body='<img src="boom.png">'), fetch_config(fetch)).data
    assert isinstance(data, str)
    assert len(log) == 3, "expected the initial attempt plus two retries"


def test_cid_and_non_http_never_fetched():
    fetch, log = stub_fetch({})
    convert(
        page(body='<img src="cid:abc123"><img src="ftp://example.com/x.png">'), fetch_config(fetch)
    )
    assert log == []


def test_urn_payload_unwrapped():
    fetch, log = stub_fetch({"https://cdn.example.com/x.png": {"contentType": "image/png", "body": "URN"}})
    data = convert(
        page(body='<img src="urn:uuid:https://cdn.example.com/x.png">'), fetch_config(fetch)
    ).data
    assert log == ["https://cdn.example.com/x.png"]
    assert b64("URN") in data


def test_nothing_fetched_unless_opted_in():
    fetch, log = stub_fetch({f"{ORIGIN}/missing.png": {"contentType": "image/png", "body": "X"}})
    convert(page(body='<img src="missing.png">'), Config(fetch=fetch))
    assert log == []


def test_stylesheet_without_content_type_still_css():
    fetch, _log = stub_fetch(
        {f"{ORIGIN}/x.css": {"contentType": "text/css", "body": 'p{background:url("z.png")}'}},
        omit_content_type=True,
    )
    data = convert(
        page(head='<link rel="stylesheet" href="x.css">', body="y"), fetch_config(fetch)
    ).data
    assert "application/octet-stream" not in data or "z.png" in data
