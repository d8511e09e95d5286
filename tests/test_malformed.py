"""Archives that break the rules: recovery or the one allowed error
(ported from reference test/malformed.test.js)."""

import pytest

from mhtml_to_html_ray.kernel.convert import ConvertError, convert
from mhtml_to_html_ray.kernel.mime import parse
from tests.helpers import concat_bytes, encode_base64, encode_single_byte_charset

LOCATION = "https://example.invalid/a"
DOCUMENT = "<html><body><p>RECOVERED</p></body></html>"


def document(boundary, location=LOCATION):
    return (
        f"--{boundary}\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n"
        f"Content-Location: {location}\r\n\r\n{DOCUMENT}\r\n"
    )


def build(declared, used=None, closing=True):
    used = used or declared
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{declared}"\r\n\r\n',
        document(used),
        f"--{used}--\r\n" if closing else "",
    )


def no_boundary(body):
    return concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_NEVER"\r\n\r\n', body
    )


def test_wrong_boundary_recovered():
    assert "RECOVERED" in convert(build("----=_DECLARED", "----=_ACTUAL")).data


def test_declared_boundary_nowhere_body_read_on_its_own():
    data = convert(
        no_boundary(f"Content-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n")
    ).data
    assert "RECOVERED" in data, "the part left behind was lost"


def test_markup_body_with_no_headers_read_as_document():
    assert "RECOVERED" in convert(no_boundary(DOCUMENT)).data


def test_headers_running_into_text_keep_first_line():
    data = convert(
        no_boundary("Content-Type: text/plain\r\nfirst line of the text\r\nsecond line")
    ).data
    assert "first line of the text" in data, "the line after the headers was eaten"
    assert "second line" in data


def test_folded_header_in_leftover_body():
    data = convert(
        no_boundary(
            f'Content-Type: text/html;\r\n\tcharset="utf-8"\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n'
        )
    ).data
    assert "RECOVERED" in data


def test_leftover_body_that_is_not_a_document_presented():
    data = convert(
        no_boundary("Content-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n\r\niVBORw0KGgo=\r\n")
    ).data
    assert '<img src="data:image/png;base64,iVBORw0KGgo=">' in data


def test_body_neither_markup_nor_headers_reported():
    with pytest.raises(ConvertError, match="Index page not found"):
        convert(no_boundary(concat_bytes(bytes([0x00, 0x01, 0x02]), " rubbish\r\n")))


def test_single_part_archive_takes_type_from_top_headers():
    data = convert(
        concat_bytes(
            f"MIME-Version: 1.0\r\nContent-Type: text/html; charset=utf-8\r\nContent-Location: {LOCATION}\r\n\r\n",
            DOCUMENT,
        )
    ).data
    assert "RECOVERED" in data


def test_empty_boundary_parameter_still_gives_document():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary=""\r\n\r\n',
        f"--\r\nContent-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n----\r\n",
    )
    assert "RECOVERED" in convert(raw).data


def test_regex_characters_in_boundary_matched_literally():
    assert "RECOVERED" in convert(build("a.*b[c]+d")).data


def test_maximum_length_boundary():
    assert "RECOVERED" in convert(build("a" * 70)).data


def test_file_ending_on_header_blank_line_keeps_part():
    raw = concat_bytes(
        'MIME-Version: 1.0\nContent-Type: multipart/related; boundary="----=_B"\n\n',
        f"------=_B\nContent-Type: text/html\nContent-Location: {LOCATION}\n\n",
    )
    assert len(parse(raw).resources) == 1, "the part was dropped"
    assert "<html" in convert(raw).data.lower(), "no document was produced"


def test_nested_multipart_cut_off_after_headers():
    raw = concat_bytes(
        'MIME-Version: 1.0\nContent-Type: multipart/related;\n\tboundary="----=_OUTER"\n\n',
        '------=_OUTER\nContent-Type: multipart/alternative;\n\tboundary="----=_INNER"\n\n',
        '------=_INNER\nContent-Type: text/html;\n\tcharset="x-user-defined"\n',
        "Content-Transfer-Encoding: quoted-printable\n\n",
    )
    assert "<html" in convert(raw).data.lower(), "the innermost part was lost"


def test_file_cut_off_mid_part_keeps_what_it_had():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: {LOCATION}\r\n\r\n<html><body><p>TRUNCATED",
    )
    assert "TRUNCATED" in convert(raw).data


PNG = "iVBORw0KGgo="


def single_part(content_type, body, transfer_encoding="8bit"):
    return concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        f"------=_B\r\nContent-Type: {content_type}\r\nContent-Transfer-Encoding: {transfer_encoding}\r\n",
        f"Content-Location: https://e/thing\r\n\r\n{body}\r\n------=_B--\r\n",
    )


def test_image_only_archive_becomes_page():
    data = convert(single_part("image/png", PNG, "base64")).data
    assert f'<img src="data:image/png;base64,{PNG}">' in data


def test_text_only_archive_becomes_page():
    assert "<pre>Hello World</pre>" in convert(single_part("text/plain", "Hello World")).data


def test_base64_plain_text_decoded_before_shown():
    data = convert(single_part("text/plain", encode_base64("Hello World"), "base64")).data
    assert "<pre>Hello World</pre>" in data, "the base64 was shown instead of the text"


def test_base64_plain_text_with_charset():
    data = convert(
        single_part(
            "text/plain; charset=windows-1251",
            encode_base64(encode_single_byte_charset("Привет", "windows-1251")),
            "base64",
        )
    ).data
    assert "<pre>Привет</pre>" in data


def test_text_looking_like_markup_shown_not_interpreted():
    data = convert(single_part("text/plain", "a <b>&amp; c")).data
    assert "&lt;b&gt;" in data, "a tag in the text was left to be parsed"
    assert "<b>" not in data


def test_nothing_presentable_rejected():
    with pytest.raises(ConvertError, match="Index page not found"):
        convert(single_part("application/octet-stream", "AQID"))


def test_real_document_preferred_over_synthesis():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n",
        f"Content-Location: https://e/i.png\r\n\r\n{PNG}\r\n",
        "------=_B\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: https://e/\r\n\r\n{DOCUMENT}\r\n------=_B--\r\n",
    )
    assert "RECOVERED" in convert(raw).data, "the page was passed over for the image"


def test_plain_html_as_mht_converted():
    data = convert(
        concat_bytes(
            '<html xmlns:o="urn:schemas-microsoft-com:office:office"><head>\r\n',
            '<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">\r\n',
            "<title>PLAIN</title></head><body><p>RECOVERED</p></body></html>\r\n",
        )
    ).data
    assert "RECOVERED" in data
    assert "charset=windows-1252" not in data.lower(), "a stale charset declaration survived"


def test_plain_html_reported_with_title():
    result = convert(concat_bytes("<html><head><title>PLAIN</title></head><body>x</body></html>"))
    assert result.title == "PLAIN"


def test_leading_whitespace_does_not_hide_plain_html():
    assert "RECOVERED" in convert(concat_bytes("\r\n  \r\n<html><body><p>RECOVERED</p></body></html>")).data


def test_bom_does_not_hide_plain_html():
    data = convert(
        concat_bytes(bytes([0xEF, 0xBB, 0xBF]), "<html><body><p>RECOVERED</p></body></html>")
    ).data
    assert "RECOVERED" in data


@pytest.mark.parametrize("little_endian", [True, False], ids=["little-endian", "big-endian"])
def test_utf16_plain_html_decoded_by_bom(little_endian):
    text = "<html><body><p>RECOVERED</p></body></html>"
    bom = b"\xff\xfe" if little_endian else b"\xfe\xff"
    raw = bom + text.encode("utf-16-le" if little_endian else "utf-16-be")
    assert "RECOVERED" in convert(raw).data


def test_false_base64_declaration_read_as_is():
    data = convert(single_part("text/html", DOCUMENT, "base64")).data
    assert "RECOVERED" in data, "the document was lost behind its false declaration"


def test_whitespace_only_file_reported():
    with pytest.raises(ConvertError, match="Index page not found"):
        convert(concat_bytes("  \r\n\t\r\n  "))


def test_appledouble_sidecar_reported():
    with pytest.raises(ConvertError, match="Index page not found"):
        convert(
            concat_bytes(
                bytes([0x00, 0x05, 0x16, 0x07, 0x00, 0x02, 0x00, 0x00]),
                "Mac OS X        ",
                bytes([0x00, 0x02, 0x00, 0x00]),
            )
        )


def test_headerless_part_still_gets_id():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        f"------=_B\r\nContent-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n",
        "------=_B\r\n\r\nno headers here\r\n------=_B--\r\n",
    )
    assert len(parse(raw).resources) == 2, "the headerless part was lost"


def test_duplicate_content_id_resolves_consistently():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html\r\nContent-Location: https://e/index\r\n\r\n",
        '<html><body><iframe src="cid:dup"></iframe></body></html>\r\n',
        "------=_B\r\nContent-Type: text/html\r\nContent-ID: <dup>\r\nContent-Location: https://e/one\r\n\r\n",
        "<html><body>FIRST</body></html>\r\n",
        "------=_B\r\nContent-Type: text/html\r\nContent-ID: <dup>\r\nContent-Location: https://e/two\r\n\r\n",
        "<html><body>SECOND</body></html>\r\n------=_B--\r\n",
    )
    first = convert(parse(raw)).data
    second = convert(parse(raw)).data
    assert first == second, "the same archive converted differently twice"
    assert "FIRST" in first or "SECOND" in first, "neither part was used"


def test_part_addressed_by_cid_and_location_reachable_both_ways():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html\r\nContent-Location: https://e/index\r\n\r\n",
        '<html><body><img src="https://e/p.png"><iframe src="cid:both"></iframe></body></html>\r\n',
        "------=_B\r\nContent-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n",
        "Content-ID: <both>\r\nContent-Location: https://e/p.png\r\n\r\niVBORw0KGgo=\r\n------=_B--\r\n",
    )
    data = convert(raw).data
    assert data.count("data:image/png;base64,iVBORw0KGgo=") == 2


def test_non_archive_reports_anomaly():
    result = convert(concat_bytes(DOCUMENT))
    assert result.anomalies == [{"type": "document-mislabeled-as-archive"}]


def test_recovered_boundary_reports_declared_unused():
    result = convert(build("----=_DECLARED", "----=_ACTUAL"))
    assert result.anomalies == [{"type": "declared-boundary-unused"}]


def test_missing_delimiters_reported():
    result = convert(
        no_boundary(f"Content-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n")
    )
    assert result.anomalies == [{"type": "multipart-without-delimiters"}]


def test_synthesized_index_reported():
    result = convert(single_part("image/png", PNG, "base64"))
    assert result.anomalies == [{"type": "index-synthesized", "id": "https://e/thing"}]


def test_undecodable_base64_reported():
    result = convert(single_part("text/html", "@@ not base64 @@", "base64"))
    assert result.anomalies == [{"type": "base64-left-encoded", "id": "https://e/thing"}]


def test_nothing_wrong_reports_nothing():
    mhtml = parse(build("----=_B"))
    assert mhtml.anomalies == [], "parsing reported an anomaly"
    assert convert(mhtml).anomalies == [], "converting reported an anomaly"
