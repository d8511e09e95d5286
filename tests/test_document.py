"""Every inline/removal/injection rule of the convert walk (ported from
reference test/document.test.js)."""

import re

import pytest

from mhtml_to_html_ray.kernel.convert import Config, ConvertError, convert
from tests.helpers import DOCUMENT_LOCATION, ORIGIN, concat_bytes, page, resource

PNG_BASE64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
PNG_URI = f"data:image/png;base64,{PNG_BASE64}"
IMAGE_LOCATION = f"{ORIGIN}/i.png"


def image_part(location=IMAGE_LOCATION):
    return resource(location, "image/png", PNG_BASE64, "base64")


def data_of(**options):
    return convert(page(**options)).data


def body_of(**options):
    return re.search(r"<body[^>]*>[\s\S]*</body>", data_of(**options)).group(0)


def head_of(**options):
    return re.search(r"<head[^>]*>[\s\S]*</head>", data_of(**options)).group(0)


def test_image_inlined_and_original_url_kept():
    body = body_of(body='<img src="i.png">', parts=[image_part()])
    assert f'src="{PNG_URI}"' in body, "the image was not inlined"
    assert 'data-original-src="i.png"' in body, "the original URL was dropped"


@pytest.mark.parametrize("tag", ["audio", "video", "source"])
def test_src_inlined(tag):
    body = body_of(body=f'<{tag} src="i.png"></{tag}>', parts=[image_part()])
    assert PNG_URI in body, f"the src of {tag} was not inlined"


def test_script_src_inlined_when_scripts_enabled():
    data = convert(
        page(body='<script src="i.png"></script>', parts=[image_part()]),
        Config(enable_scripts=True),
    ).data
    assert PNG_URI in data


def test_image_input_inlined_text_input_alone():
    body = body_of(
        body='<input type="image" src="i.png"><input type="text" src="i.png">', parts=[image_part()]
    )
    assert body.count(PNG_URI) == 1, "only the image input should be inlined"


@pytest.mark.parametrize("tag", ["table", "td", "th"])
def test_background_attribute_inlined(tag):
    markup = (
        '<table background="i.png"><tr><td>x</td></tr></table>'
        if tag == "table"
        else f'<table><tr><{tag} background="i.png">x</{tag}></tr></table>'
    )
    assert PNG_URI in data_of(body=markup, parts=[image_part()])


def test_body_background_inlined():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        resource(
            DOCUMENT_LOCATION,
            "text/html; charset=utf-8",
            '<html><head></head><body background="i.png">x</body></html>',
        ),
        "\r\n",
        image_part(),
        "\r\n------=_B--\r\n",
    )
    assert PNG_URI in convert(raw).data


def test_base_element_changes_resolution_and_is_removed():
    data = data_of(
        head='<base href="https://other.example/assets/">',
        body='<img src="i.png">',
        parts=[image_part("https://other.example/assets/i.png")],
    )
    assert PNG_URI in data, "the reference did not resolve against the base"
    assert not re.search(r"<base", data, re.I), "the base element was left in the document"


def test_unmatched_reference_keeps_absolute_url():
    body = body_of(body='<img src="missing.png">')
    assert f'src="{ORIGIN}/missing.png"' in body, "the reference was not made absolute"


def test_unfound_resources_reported():
    result = convert(
        page(body=f'<img src="missing.png"><img src="i.png"><img src="{PNG_URI}">', parts=[image_part()])
    )
    assert result.unfound_resources == [f"{ORIGIN}/missing.png"]
    complete = convert(page(body='<img src="i.png">', parts=[image_part()]))
    assert complete.unfound_resources == []


def test_unfound_resources_in_document_order():
    """unfoundResources is a JS Set in the reference → insertion (discovery)
    order; the port must not leak Python set hash order."""
    body = (
        '<img src="zzz-first.png"><img src="aaa-second.png">'
        '<img src="mmm-third.png">'
    )
    result = convert(page(body=body))
    assert result.unfound_resources == [
        f"{ORIGIN}/zzz-first.png",
        f"{ORIGIN}/aaa-second.png",
        f"{ORIGIN}/mmm-third.png",
    ], "unfound order must be discovery order, not lexical/hash order"


def test_template_content_hidden_from_tag_scans():
    """parse5 keeps template content out of childNodes, so the reference's
    getElementsByTagName (dom-parser-node.js:237-248) never sees inside
    <template>; a <title>/<base>/<meta> there must be ignored."""
    from mhtml_to_html_ray.kernel.dom import parse_html

    doc = parse_html(
        "<html><head><title>real</title></head><body>"
        "<template><title>hidden</title><base href='https://evil.example/'>"
        "</template></body></html>"
    )
    titles = doc.get_elements_by_tag_name("title")
    assert [t.text_content for t in titles] == ["real"]
    assert doc.get_elements_by_tag_name("base") == []


def test_data_uri_left_as_is():
    body = body_of(body=f'<img src="{PNG_URI}">')
    assert f'src="{PNG_URI}"' in body
    assert "data-original-src" not in body


def test_self_link_keeps_only_fragment():
    body = body_of(body=f'<a href="{DOCUMENT_LOCATION}#section">a</a><a href="/other">b</a>')
    assert 'href="#section"' in body, "the same-page link was not shortened"
    assert f'href="{ORIGIN}/other"' in body, "the other link was not made absolute"


def test_tracking_and_integrity_removed():
    body = body_of(
        body='<a href="/x" ping="https://tracker.example/p">a</a>',
        head='<link rel="stylesheet" href="s.css" integrity="sha384-abc">',
        parts=[resource(f"{ORIGIN}/s.css", "text/css", "p{color:red}")],
    )
    assert "ping=" not in body
    data = data_of(
        head='<link rel="stylesheet" href="s.css" integrity="sha384-abc">',
        parts=[resource(f"{ORIGIN}/s.css", "text/css", "p{color:red}")],
    )
    assert "integrity" not in data


def test_event_handlers_removed_unless_scripts_enabled():
    options = dict(body='<p onclick="boom()" onmouseover="boom()">x</p>')
    assert "onclick" not in body_of(**options)
    enabled = convert(page(**options), Config(enable_scripts=True)).data
    assert "onclick" in enabled


def test_scripts_removed_unless_enabled_jsonld_stays():
    options = dict(
        head='<script>boom()</script><script type="application/ld+json">{"@type":"Thing"}</script>'
    )
    removed = data_of(**options)
    assert "boom()" not in removed, "a script survived"
    assert '"@type":"Thing"' in removed, "the JSON-LD block was removed"
    enabled = convert(page(**options), Config(enable_scripts=True)).data
    assert "boom()" in enabled


def test_script_text_escaped_once_across_serializations():
    options = dict(
        head='<meta charset="utf-8">',
        body='<script>document.write("<img src=x />");</script>',
    )
    enabled = convert(page(**options), Config(enable_scripts=True)).data
    assert "document.write" in enabled
    assert "\\\\/>" not in enabled, "the self-closing marker was escaped twice"


def test_invalid_attribute_name_leaves_no_gap():
    body = body_of(body='<p a="1" "x" b="2">first</p><p c="3" "y">second</p>')
    assert "  " not in body, "a dropped attribute left a gap between its neighbours"
    assert " >" not in body, "a dropped attribute left a gap before the closing bracket"


def test_shadow_root_template_renamed_and_converted():
    data = data_of(
        body='<div><template shadowmode="open"><img src="i.png"></template></div>',
        parts=[image_part()],
    )
    assert 'shadowrootmode="open"' in data
    assert 'shadowmode="open"' not in data
    assert PNG_URI in data, "a reference inside the template was not inlined"


def test_refresh_and_existing_policy_removed():
    head = head_of(
        head='<meta http-equiv="refresh" content="0;url=https://elsewhere.example/">'
        '<meta http-equiv="Content-Security-Policy" content="default-src *">'
    )
    assert "refresh" not in head
    assert "default-src *" not in head


def test_policy_added_with_script_gating():
    assert re.search(r"content-security-policy", head_of(), re.I)
    assert "script-src 'none'" in data_of()
    enabled = convert(page(), Config(enable_scripts=True)).data
    assert "script-src 'self' 'unsafe-inline' data:" in enabled


def test_head_starts_with_utf8_declaration():
    assert re.match(r'^<head><meta charset="utf-8">', head_of())


def test_canonical_link_added_or_kept():
    assert f'rel="canonical" href="{DOCUMENT_LOCATION}"' in data_of()
    data = data_of(head='<link rel="canonical" href="https://canonical.example/">')
    assert data.count("canonical") == 2, "the existing canonical link was duplicated"
    assert "https://canonical.example/" in data


def test_title_from_head_first_wins():
    result = convert(page(head="<title>FIRST</title><title>SECOND</title>"))
    assert result.title == "FIRST"


def test_title_outside_head_not_reported():
    result = convert(page(body="<svg><title>NOT THE PAGE TITLE</title></svg>"))
    assert result.title is None


def test_favicons_reported_and_inlined():
    result = convert(
        page(
            head='<link rel="icon" href="i.png" type="image/png" sizes="16x16" media="(min-width: 0px)">',
            parts=[image_part()],
        )
    )
    assert len(result.favicons) == 1
    favicon = result.favicons[0]
    assert (favicon["href"], favicon["type"], favicon["sizes"], favicon["originalHref"]) == (
        PNG_URI,
        "image/png",
        "16x16",
        IMAGE_LOCATION,
    )
    assert PNG_URI in result.data


def test_shortcut_icon_reported():
    result = convert(page(head='<link rel="shortcut icon" href="i.png">', parts=[image_part()]))
    assert len(result.favicons) == 1


def test_hints_dropped():
    head = head_of(
        head='<link rel="preload prefetch" href="/a"><link rel="dns-prefetch" href="/b">'
    )
    assert "preload" not in head
    assert "dns-prefetch" not in head
    assert "/a" not in head and "/b" not in head, "a link that was nothing but a hint was kept"


def test_stylesheet_recognized_any_rel_case():
    head = head_of(
        head='<link rel="STYLESHEET" href="s.css">',
        parts=[resource(f"{ORIGIN}/s.css", "text/css", "p{color:red}")],
    )
    assert "<style" in head


def test_unshowable_archive_rejected():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: application/octet-stream\r\nContent-Transfer-Encoding: base64\r\n",
        f"Content-Location: {IMAGE_LOCATION}\r\n\r\n{PNG_BASE64}\r\n------=_B--\r\n",
    )
    with pytest.raises(ConvertError, match="Index page not found"):
        convert(raw)


def test_json_ld_date_created_present_when_date_header():
    raw = concat_bytes(
        "Date: Fri, 31 Mar 2006 19:25:16 +0400\r\nMIME-Version: 1.0\r\n",
        'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        resource(DOCUMENT_LOCATION, "text/html; charset=utf-8",
                 "<html><head></head><body>x</body></html>"),
        "\r\n------=_B--\r\n",
    )
    data = convert(raw).data
    assert '"dateCreated": "Fri, 31 Mar 2006 19:25:16 +0400"' in data


def test_json_ld_no_date_created_without_header():
    assert '"dateCreated"' not in data_of()


def test_data_uri_favicon_keeps_no_original():
    result = convert(page(head=f'<link rel="icon" href="{PNG_URI}">'))
    # a data: href resolves nowhere (data: is not fetched/matched) but must
    # not gain a data-original-href (setAttribute guard, convert.js:685-693)
    assert "data-original-href" not in result.data


def test_template_without_shadowmode_content_converted():
    data = data_of(
        body='<div><template><img src="i.png"></template></div>',
        parts=[image_part()],
    )
    assert PNG_URI in data, "a reference inside a plain template was not inlined"
    assert "shadowrootmode" not in data
