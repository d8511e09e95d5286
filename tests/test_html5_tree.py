"""HTML5 tree-construction parity for the wild-page constructs VERDICT r1
ranked #1 (kernel/dom.py vs parse5 semantics, lib/util.js:315-334 +
lib/dom-parser-node.js:84-261): simplified adoption agency, table foster
parenting + implied tbody/tr, select scoping, and foreign-content (SVG)
name adjustment. Expected strings are the HTML-spec (= parse5) trees run
through the reference's serializer rules (tags lowercased, attr case kept,
dom-parser-node.js:315-336)."""

import pytest

from mhtml_to_html_ray.kernel.dom import parse_dom, parse_html, serialize


def body_html(source: str) -> str:
    return serialize(parse_html(source).body)


# ---------------------------------------------------------------------------
# adoption agency (formatting-element reconstruction)


@pytest.mark.parametrize(
    "source, expected",
    [
        # the canonical misnest: </b> with <i> still open reopens <i>
        (
            "<body><p>1<b>2<i>3</b>4</i>5</p></body>",
            "<body><p>1<b>2<i>3</i></b><i>4</i>5</p></body>",
        ),
        (
            "<body><b><i>x</b>y</i>z</body>",
            "<body><b><i>x</i></b><i>y</i>z</body>",
        ),
        # two formatting levels reconstructed in order
        (
            "<body><b><i><u>x</b>y</body>",
            "<body><b><i><u>x</u></i></b><i><u>y</u></i></body>",
        ),
        # attributes survive reconstruction on the clone
        (
            '<body><b><i class="k">x</b>y</body>',
            '<body><b><i class="k">x</i></b><i class="k">y</i></body>',
        ),
        # properly nested formatting is untouched
        (
            "<body><b><i>x</i></b>y</body>",
            "<body><b><i>x</i></b>y</body>",
        ),
    ],
)
def test_adoption_agency_reconstruction(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# implied end tags with scope (headings, list items, p in button scope)


@pytest.mark.parametrize(
    "source, expected",
    [
        # <li> closes across a wrapper <div> (list-item scope)
        (
            "<body><ul><li>one<div><li>two</ul></body>",
            "<body><ul><li>one<div></div></li><li>two</li></ul></body>",
        ),
        # a heading start tag closes an open heading
        (
            "<body><h1>a<h2>b</h2></body>",
            "<body><h1>a</h1><h2>b</h2></body>",
        ),
        # <div> closes an open <p> even with phrasing content open
        (
            "<body><p>x<span>y<div>z</div></body>",
            "<body><p>x<span>y</span></p><div>z</div></body>",
        ),
        # but a <button> blocks the p-scope close
        (
            "<body><p><button>x<div>y</div></button></p></body>",
            "<body><p><button>x<div>y</div></button></p></body>",
        ),
        # dd/dt close each other across wrappers (bounded by dl scope rules)
        (
            "<body><dl><dt>t<dd>d1<div><dd>d2</dl></body>",
            "<body><dl><dt>t</dt><dd>d1<div></div></dd><dd>d2</dd></dl></body>",
        ),
        # nested lists: an inner <ul> bounds the li scope
        (
            "<body><ul><li>a<ul><li>b</ul></ul></body>",
            "<body><ul><li>a<ul><li>b</li></ul></li></ul></body>",
        ),
    ],
)
def test_implied_end_tags_with_scope(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# tables: foster parenting + implied structure


@pytest.mark.parametrize(
    "source, expected",
    [
        # implied tbody for a bare row
        (
            "<body><table><tr><td>y</td></tr></table></body>",
            "<body><table><tbody><tr><td>y</td></tr></tbody></table></body>",
        ),
        # implied tbody + tr for a bare cell
        (
            "<body><table><td>c</td></table></body>",
            "<body><table><tbody><tr><td>c</td></tr></tbody></table></body>",
        ),
        # a div inside <table> (not in a cell) foster-parents before it
        (
            "<body><table><div>x</div><tr><td>y</td></tr></table></body>",
            "<body><div>x</div><table><tbody><tr><td>y</td></tr></tbody></table></body>",
        ),
        # stray character tokens foster-parent too
        (
            "<body><table><tr><td>y</td></tr>stray</table></body>",
            "<body>stray<table><tbody><tr><td>y</td></tr></tbody></table></body>",
        ),
        # thead/tfoot stay as written; cells inside get their tr
        (
            "<body><table><thead><td>h</td></thead></table></body>",
            "<body><table><thead><tr><td>h</td></tr></thead></table></body>",
        ),
        # caption/colgroup are legal table children — not fostered
        (
            "<body><table><caption>c</caption><col span=\"2\"><tr><td>y</td></tr></table></body>",
            # parse5 wraps a bare <col> in an implied <colgroup>
            "<body><table><caption>c</caption><colgroup><col span=\"2\"></colgroup><tbody><tr><td>y</td></tr></tbody></table></body>",
        ),
        # text inside a cell is NOT fostered
        (
            "<body><table><tr><td>keep me</td></tr></table></body>",
            "<body><table><tbody><tr><td>keep me</td></tr></tbody></table></body>",
        ),
    ],
)
def test_table_foster_parenting(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# active-formatting reconstruction (the other half of the adoption agency)


@pytest.mark.parametrize(
    "source, expected",
    [
        # THE canonical case: formatting reopens inside the block that
        # implicitly closed its ancestors
        (
            "<body><p><b>x<div>y</div></body>",
            "<body><p><b>x</b></p><div><b>y</b></div></body>",
        ),
        # reconstruction across sibling paragraphs
        (
            "<body><p><b>x</p><p>y</p></body>",
            "<body><p><b>x</b></p><p><b>y</b></p></body>",
        ),
        # an explicit close ends it — no reconstruction afterwards
        ("<body><b>x</b>y</body>", "<body><b>x</b>y</body>"),
        # <a> implicitly closes an open <a>
        (
            '<body><a href="1">one<a href="2">two</body>',
            '<body><a href="1">one</a><a href="2">two</a></body>',
        ),
        # formatting inside list items reopens in the next item
        (
            "<body><li><b>x<li>y</body>",
            "<body><li><b>x</b></li><li><b>y</b></li></body>",
        ),
        # formatting before a table fosters out; the table structure survives
        (
            "<body><table><b><tr><td>aha</td></tr></table></body>",
            "<body><b></b><table><tbody><tr><td>aha</td></tr></tbody></table></body>",
        ),
        # stray row/cell tags outside any table are ignored (in-body rule)
        ("<body><tr><td>bare</td></tr></body>", "<body>bare</body>"),
    ],
)
def test_formatting_reconstruction(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# select scoping


def test_select_ignores_flow_content():
    assert body_html("<body><select><div>no</div><option>a</option></select></body>") == (
        "<body><select>no<option>a</option></select></body>"
    )


def test_nested_select_closes_outer():
    out = body_html("<body><select><option>a<select><p>out</p></body>")
    assert out == "<body><select><option>a</option></select><p>out</p></body>"


def test_select_option_optgroup_autoclose():
    out = body_html(
        '<body><select><option>a<option>b<optgroup label="g"><option>c</select></body>'
    )
    assert out == (
        '<body><select><option>a</option><option>b</option>'
        '<optgroup label="g"><option>c</option></optgroup></select></body>'
    )


def test_input_pops_select():
    out = body_html('<body><select><option>a<input name="n"></body>')
    assert out == '<body><select><option>a</option></select><input name="n"></body>'


# ---------------------------------------------------------------------------
# foreign content (SVG / MathML)


def test_svg_self_closing_honored():
    out = body_html("<body><svg><path/><circle/></svg>after</body>")
    assert out == "<body><svg><path></path><circle></circle></svg>after</body>"


def test_svg_attr_case_adjusted():
    out = body_html('<body><svg viewbox="0 0 1 1" preserveaspectratio="x"></svg></body>')
    assert out == '<body><svg viewBox="0 0 1 1" preserveAspectRatio="x"></svg></body>'


def test_svg_nested_adjusted_names():
    out = body_html(
        '<body><svg><lineargradient gradienttransform="t"><stop/></lineargradient></svg></body>'
    )
    # tag names lowercase in output (reference serializer), attr case kept
    assert out == (
        '<body><svg><lineargradient gradientTransform="t">'
        "<stop></stop></lineargradient></svg></body>"
    )


def test_foreign_object_div_roundtrip():
    out = body_html("<body><svg><foreignobject><div>d</div></foreignobject></svg>x</body>")
    assert out == "<body><svg><foreignobject><div>d</div></foreignobject></svg>x</body>"


def test_math_attrs_not_svg_cased_outside_svg():
    # plain HTML keeps lowercased attribute names — adjustment is
    # foreign-content-only
    assert body_html('<body><div viewbox="v">x</div></body>') == (
        '<body><div viewbox="v">x</div></body>'
    )


# ---------------------------------------------------------------------------
# idempotence: re-parsing the serialized output is a fixpoint


@pytest.mark.parametrize(
    "source",
    [
        "<body><p>1<b>2<i>3</b>4</i>5</p></body>",
        "<body><table><div>x</div><tr><td>y</td></tr>stray</table></body>",
        "<body><select><option>a<select><p>out</p></body>",
        '<body><svg viewbox="0 0 1 1"><path/></svg></body>',
    ],
)
def test_reparse_fixpoint(source):
    once = body_html(source)
    assert body_html(once) == once


# ---------------------------------------------------------------------------
# round-3 tranche: foreign-content integration points + breakout (HTML spec
# "tree construction dispatcher" / "rules for parsing tokens in foreign
# content" — parse5's dispatcher)


@pytest.mark.parametrize(
    "source, expected",
    [
        # breakout: an HTML phrasing tag pops the open foreign elements
        ("<body><svg><b>x</b></svg></body>", "<body><svg></svg><b>x</b></body>"),
        (
            "<body><svg><g><div>d</div></svg></body>",
            "<body><svg><g></g></svg><div>d</div></body>",
        ),
        # <font> breaks out only when it carries color/face/size
        (
            '<body><svg><font color="red">t</font></svg></body>',
            '<body><svg></svg><font color="red">t</font></body>',
        ),
        ("<body><svg><font>t</font></svg></body>", "<body><svg><font>t</font></svg></body>"),
        # MathML text integration points: HTML rules apply inside mi/mo/mn/ms/mtext
        ("<body><math><mi><b>x</b></mi></math></body>",
         "<body><math><mi><b>x</b></mi></math></body>"),
        ("<body><math><mtext>hi</mtext></math></body>",
         "<body><math><mtext>hi</mtext></math></body>"),
        # mglyph/malignmark stay MathML at a text integration point
        ("<body><math><mi><mglyph/>x</mi></math></body>",
         "<body><math><mi><mglyph></mglyph>x</mi></math></body>"),
        # annotation-xml is an HTML integration point ONLY with an HTML encoding
        (
            '<body><math><annotation-xml encoding="text/html"><div>d</div></annotation-xml></math></body>',
            '<body><math><annotation-xml encoding="text/html"><div>d</div></annotation-xml></math></body>',
        ),
        (
            "<body><math><annotation-xml><div>d</div></annotation-xml></math></body>",
            "<body><math><annotation-xml></annotation-xml></math><div>d</div></body>",
        ),
        # svg desc/title are HTML integration points like foreignObject
        ("<body><svg><desc><b>bold</b></desc></svg></body>",
         "<body><svg><desc><b>bold</b></desc></svg></body>"),
        # HTML rules (p closed by div) apply inside foreignObject
        (
            "<body><svg><foreignobject><p>a<div>b</div></foreignobject></svg></body>",
            "<body><svg><foreignobject><p>a</p><div>b</div></foreignobject></svg></body>",
        ),
        # MathML attribute adjustment
        ('<body><math definitionurl="u"><mrow>x</mrow></math></body>',
         '<body><math definitionURL="u"><mrow>x</mrow></math></body>'),
    ],
)
def test_foreign_integration_points_and_breakout(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# round-3 tranche: "in caption" / "in cell" closing + in-table character runs


@pytest.mark.parametrize(
    "source, expected",
    [
        # a row start tag implies </caption>
        (
            "<body><table><caption>cap<tr><td>x</td></tr></table></body>",
            "<body><table><caption>cap</caption><tbody><tr><td>x</td></tr></tbody></table></body>",
        ),
        # a second <caption> implies the first's end
        (
            "<body><table><caption>a<caption>b<tr><td>c</table></body>",
            "<body><table><caption>a</caption><caption>b</caption><tbody><tr><td>c</td></tr></tbody></table></body>",
        ),
        # </table> closes an open cell and row
        (
            "<body><table><tr><td>x</table>after</body>",
            "<body><table><tbody><tr><td>x</td></tr></tbody></table>after</body>",
        ),
        # a new <tr> closes the open cell and row
        (
            "<body><table><tbody><tr><td>1<tr><td>2</table></body>",
            "<body><table><tbody><tr><td>1</td></tr><tr><td>2</td></tr></tbody></table></body>",
        ),
        # formatting opened inside a CELL does not reconstruct outside the
        # table (the cell pushes a formatting marker)
        (
            "<body><table><tr><td><b>x</td></tr></table>y</body>",
            "<body><table><tbody><tr><td><b>x</b></td></tr></tbody></table>y</body>",
        ),
        # likewise for a CAPTION marker
        (
            "<body><table><caption><b>x</table>y</body>",
            "<body><table><caption><b>x</b></caption></table>y</body>",
        ),
        # non-ws character run in table context foster-parents out whole
        ("<body><table>a b<td>y</table></body>",
         "<body>a b<table><tbody><tr><td>y</td></tr></tbody></table></body>"),
        # ASCII-whitespace-only runs stay inside the table
        ("<body><table> <tr><td>a</table></body>",
         "<body><table> <tbody><tr><td>a</td></tr></tbody></table></body>"),
        # &nbsp; is NOT ASCII whitespace — it fosters out like content
        ("<body><table>&nbsp;<tr><td>a</table></body>",
         "<body>&nbsp;<table><tbody><tr><td>a</td></tr></tbody></table></body>"),
        # a bare <col> gets an implied <colgroup>; a second col joins it
        (
            "<body><table><col><col><tr><td>x</table></body>",
            "<body><table><colgroup><col><col></colgroup><tbody><tr><td>x</td></tr></tbody></table></body>",
        ),
        # explicit colgroup unchanged; closed by the row start
        (
            '<body><table><colgroup><col span="2"></colgroup><tr><td>x</table></body>',
            '<body><table><colgroup><col span="2"></colgroup><tbody><tr><td>x</td></tr></tbody></table></body>',
        ),
    ],
)
def test_caption_cell_and_table_text(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# round-3 tranche: frameset modes


def doc_html(source: str) -> str:
    from mhtml_to_html_ray.kernel.dom import parse_html, serialize

    return serialize(parse_html(source))


@pytest.mark.parametrize(
    "source, expected",
    [
        # the canonical frameset document: head implied, body replaced
        (
            '<html><frameset cols="50%,50%"><frame src="a"><frame src="b"></frameset></html>',
            '<html><head></head><frameset cols="50%,50%"><frame src="a"><frame src="b"></frameset></html>',
        ),
        # nested framesets
        (
            '<frameset rows="2"><frameset cols="2"><frame></frameset><frame></frameset>',
            '<html><head></head><frameset rows="2"><frameset cols="2"><frame></frameset><frame></frameset></html>',
        ),
        # frameset-ok: real body content makes a later frameset (and its
        # frames) a no-op
        ("<body>text<frameset><frame></frameset></body>",
         "<html><head></head><body>text</body></html>"),
        ("<body><table></table><frameset><frame></frameset></body>",
         "<html><head></head><body><table></table></body></html>"),
        # an element that does NOT flip frameset-ok (div) is discarded with
        # the body when the frameset takes over (spec "in body" frameset rule)
        ("<div></div><frameset></frameset>",
         "<html><head></head><frameset></frameset></html>"),
        # noframes fallback content (raw text) inside and after the frameset
        ("<frameset><noframes>fallback</noframes></frameset>",
         "<html><head></head><frameset><noframes>fallback</noframes></frameset></html>"),
        ("<frameset></frameset><noframes>x</noframes>",
         "<html><head></head><frameset></frameset><noframes>x</noframes></html>"),
        # stray text inside a frameset is dropped; frames survive
        ("<frameset>junk<frame></frameset>",
         "<html><head></head><frameset><frame></frameset></html>"),
        # <frame> outside a frameset never inserts
        ("<body><frame>x</body>", "<html><head></head><body>x</body></html>"),
    ],
)
def test_frameset_modes(source, expected):
    assert doc_html(source) == expected


# ---------------------------------------------------------------------------
# round-3 tranche 2: pre/textarea leading newline, html/body attr merging


@pytest.mark.parametrize(
    "source, expected",
    [
        # a newline immediately after <pre>/<textarea>/<listing> is ignored
        ("<body><pre>\nkeep</pre></body>", "<body><pre>keep</pre></body>"),
        ("<body><pre>\n\ntwo</pre></body>", "<body><pre>\ntwo</pre></body>"),
        ("<body><textarea>\nkeep</textarea></body>",
         "<body><textarea>keep</textarea></body>"),
        # only IMMEDIATELY after the start tag: other first content keeps it
        ("<body><pre>x\ny</pre></body>", "<body><pre>x\ny</pre></body>"),
        ("<body><pre><!--c-->\nz</pre></body>", "<body><pre><!--c-->\nz</pre></body>"),
    ],
)
def test_pre_textarea_leading_newline(source, expected):
    assert body_html(source) == expected


def test_second_html_body_tags_merge_attrs():
    out = doc_html('<html><body class="a">x<body id="b" class="c">y</html>')
    # class already present on body → kept; id is new → merged
    assert out == '<html><head></head><body class="a" id="b">xy</body></html>'
    out2 = doc_html('<html lang="en"><body>x</body></html><html lang="de" dir="ltr">')
    assert out2 == '<html lang="en" dir="ltr"><head></head><body>x</body></html>'


# ---------------------------------------------------------------------------
# round-3 review regressions (self-review of the tranche)


@pytest.mark.parametrize(
    "source, expected",
    [
        # formatting opened BEFORE the table survives the cell marker and
        # reconstructs after it (markers truncate, not wipe, the list)
        (
            "<body><div><b>bold</div><table><tr><td>c</td></tr></table>after</body>",
            "<body><div><b>bold</b></div><table><tbody><tr><td>c</td></tr></tbody></table><b>after</b></body>",
        ),
        # a newline right after <pre> is dropped even when formatting
        # reconstruction reparents the text into a clone inside the pre
        (
            "<body><div><b>x</div><pre>\nY</pre></body>",
            "<body><div><b>x</b></div><pre><b>Y</b></pre></body>",
        ),
    ],
)
def test_marker_truncation_and_pre_newline_with_reconstruction(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # <body> after a closed frameset is ignored ("after frameset" mode)
        ("<frameset><frame></frameset><body>x</body>",
         "<html><head></head><frameset><frame></frameset></html>"),
        # foreign roots are ignored inside a frameset too
        ("<frameset><svg></svg><frame></frameset>",
         "<html><head></head><frameset><frame></frameset></html>"),
        # a stray <frame> after the frameset closed is ignored
        ("<frameset></frameset><frame>",
         "<html><head></head><frameset></frameset></html>"),
    ],
)
def test_frameset_mode_ignores(source, expected):
    assert doc_html(source) == expected


# ---------------------------------------------------------------------------
# round-3 kernel-review regressions


def test_attribute_entity_legacy_exception():
    """html.unescape's legacy no-semicolon decoding must NOT apply inside
    attribute values when followed by '=' or an alphanumeric (HTML spec
    attribute exception; parse5/browsers keep the URL intact)."""
    from mhtml_to_html_ray.kernel.dom import parse_dom

    doc = parse_dom('<a href="http://e.com/?id=1&region=US&para=2">x</a>').document
    link = doc.get_elements_by_tag_name("a")[0]
    assert link.get_attribute("href") == "http://e.com/?id=1&region=US&para=2"
    # with a semicolon (or a non-alnum follower) decoding still happens
    doc2 = parse_dom('<a href="a&amp;b" title="c&reg d">x</a>').document
    link2 = doc2.get_elements_by_tag_name("a")[0]
    assert link2.get_attribute("href") == "a&b"
    assert link2.get_attribute("title") == "c® d"


def test_plaintext_content_lands_inside_element():
    out = doc_html("<body><p>a<plaintext><div>raw")
    assert "<plaintext><div>raw</plaintext>" in out
    assert "&lt;div&gt;" not in out


def test_foreign_content_script_is_not_raw():
    # self-closed script inside svg closes immediately (parse5 dispatcher);
    # the rest of the document must survive
    out = doc_html("<svg><script href=x /></svg><p>hi</p>")
    assert out.endswith("<p>hi</p></body></html>")
    # a non-self-closed svg script is an ordinary foreign element
    out2 = doc_html("<svg><script>a</script></svg><p>ok</p>")
    assert "<p>ok</p>" in out2


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec: the <image> start tag is renamed to img (HTML content only)
        ('<body><image src="x.png"></body>', '<body><img src="x.png"></body>'),
        ('<body><svg><image href="i"/></svg></body>',
         '<body><svg><image href="i"></image></svg></body>'),
        # spec: </br> acts as a <br> start tag — including foster-parenting
        ("<body>a</br>b</body>", "<body>a<br>b</body>"),
        ("<body><table></br></table></body>", "<body><br><table></table></body>"),
        ("<body><b>x</br>y</b></body>", "<body><b>x<br>y</b></body>"),
        # spec: </p> with no p in button scope inserts an empty p
        ("<body></p>x</body>", "<body><p></p>x</body>"),
        ("<body><p><button></p>x</button></body>",
         "<body><p><button><p></p>x</button></p></body>"),
    ],
)
def test_image_br_p_end_tag_rules(source, expected):
    assert body_html(source) == expected


def test_comment_bang_close():
    """Spec: '--!>' closes a comment (the incorrectly-closed-comment rule)."""
    assert body_html("<body><!-- x --!>after</body>") == "<body><!-- x -->after</body>"


def test_select_in_table_popped_by_row_tags():
    """Spec 'in select in table': a <tr> pops the open select and the table
    rules process it — the second row must not be swallowed by the select."""
    out = body_html("<body><table><tr><td><select><option>a<tr><td>b</table></body>")
    assert out == (
        "<body><table><tbody><tr><td><select><option>a</option></select></td></tr>"
        "<tr><td>b</td></tr></tbody></table></body>"
    )


def test_abrupt_comment_and_cdata():
    """Spec: '<!-->' / '<!--->' are empty comments; CDATA sections are
    character data in FOREIGN content and bogus comments in HTML content."""
    assert body_html("<body><!-->rest</body>") == "<body><!---->rest</body>"
    assert body_html("<body><!--->rest</body>") == "<body><!---->rest</body>"
    assert body_html("<body><svg><text><![CDATA[a<b]]></text></svg></body>") == (
        "<body><svg><text>a&lt;b</text></svg></body>"
    )
    assert body_html("<body><![CDATA[x]]></body>") == "<body><!--[CDATA[x]]--></body>"


def test_cdata_content_is_literal():
    """Character references are NOT parsed inside CDATA sections: the
    DOM text is the literal source, so '&amp;' re-escapes on serialize."""
    assert body_html("<body><svg><text><![CDATA[a&amp;b]]></text></svg></body>") == (
        "<body><svg><text>a&amp;amp;b</text></svg></body>"
    )


def test_cdata_follows_tree_builder_namespace():
    """CDATA recognition is tree-builder feedback, not a lexical svg depth:
    after a breakout tag re-enters HTML content the section is a bogus
    comment; directly inside an SVG integration point (still an SVG-namespace
    node) it stays a CDATA section."""
    assert body_html("<body><svg><div><![CDATA[x]]></div></svg></body>") == (
        "<body><svg></svg><div><!--[CDATA[x]]--></div></body>"
    )
    assert body_html(
        "<body><svg><foreignObject><![CDATA[y]]></foreignObject></svg></body>"
    ) == "<body><svg><foreignobject>y</foreignobject></svg></body>"


def test_raw_mode_follows_tree_builder_namespace():
    """script/style raw-content modes resume once an integration point
    re-enters HTML content (a lexical svg counter would keep suppressing)."""
    out = body_html(
        "<body><svg><foreignObject><style>a<b</style></foreignObject></svg></body>"
    )
    assert "a<b</style>" in out  # raw content, '<b' not parsed as a tag


def test_br_p_end_tags_ignored_in_select():
    """Spec 'in select': any other end tag is ignored — the </br>/</p>
    aliases must not insert elements into an open select."""
    assert body_html("<body><select></br>x</select></body>") == (
        "<body><select>x</select></body>"
    )
    assert body_html("<body><select></p>x</select></body>") == (
        "<body><select>x</select></body>"
    )


def test_br_p_end_tags_ignored_in_frameset():
    """Spec 'in frameset' ignores these tokens outright."""
    doc = parse_dom("<frameset></br><frame></frameset>").serialize()
    assert doc == "<html><head></head><frameset><frame></frameset></html>"
    doc2 = parse_dom("<frameset></p><frame></frameset>").serialize()
    assert doc2 == "<html><head></head><frameset><frame></frameset></html>"


def test_end_br_sets_frameset_not_ok():
    """</br> acts as the <br> start tag, which flips frameset-ok — a
    following <frameset> must be ignored, keeping the br."""
    doc = parse_dom("<head></head></br><frameset></frameset>").serialize()
    assert doc == "<html><head></head><body><br></body></html>"


def test_end_p_fosters_out_of_table():
    """</p> with no p in scope inserts an empty p; in table structure it
    foster-parents before the table like any other insertion."""
    assert body_html("<body><table></p></table></body>") == (
        "<body><p></p><table></table></body>"
    )


@pytest.mark.parametrize(
    "source, expected",
    [
        # "clear the stack back to a table context" is PER TAG: a section
        # start closes any open section/row/cell back to the table itself
        ("<body><table><thead><tr><th>h<tbody><tr><td>b<tfoot><tr><td>f</table></body>",
         "<body><table><thead><tr><th>h</th></tr></thead><tbody><tr><td>b</td>"
         "</tr></tbody><tfoot><tr><td>f</td></tr></tfoot></table></body>"),
        # <col> after rows clears to the table and opens a fresh colgroup
        ("<body><table><tr><td>a</tr><col></table></body>",
         "<body><table><tbody><tr><td>a</td></tr></tbody><colgroup><col>"
         "</colgroup></table></body>"),
        # <table> in table structure acts as </table>: SIBLING, not fostered
        ("<body><table><table><tr><td>x</table></body>",
         "<body><table></table><table><tbody><tr><td>x</td></tr></tbody>"
         "</table></body>"),
        # ... but a table inside a cell nests normally
        ("<body><table><tr><td><table><tr><td>i</table>o</table></body>",
         "<body><table><tbody><tr><td><table><tbody><tr><td>i</td></tr>"
         "</tbody></table>o</td></tr></tbody></table></body>"),
        # spec "in table": a hidden input stays in the table; others foster
        ('<body><table><input type="hidden" name="h"><tr><td>a</table></body>',
         '<body><table><input type="hidden" name="h"><tbody><tr><td>a</td>'
         "</tr></tbody></table></body>"),
        ('<body><table><input type="text"><tr><td>a</table></body>',
         '<body><input type="text"><table><tbody><tr><td>a</td></tr></tbody>'
         "</table></body>"),
    ],
)
def test_table_context_clearing(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec: a new <nobr> runs the adoption agency on the open one
        ("<body><nobr>a<nobr>b</body>", "<body><nobr>a</nobr><nobr>b</nobr></body>"),
        # spec: a <button> with a button in scope closes it — never nests
        ("<body><button>a<button>b</button></body>",
         "<body><button>a</button><button>b</button></body>"),
        # spec form-element pointer: a nested <form> is ignored outright
        ("<body><form><div><form><input></form></div></form></body>",
         "<body><form><div><input></div></form></body>"),
        # ... but </form> clears the pointer, so siblings are fine
        ("<body><form></form><form><input></form></body>",
         "<body><form></form><form><input></form></body>"),
        # ruby: rt/rp imply the end tag of an open rt/rp sibling
        ("<body><ruby>a<rt>b<rp>(</rp></ruby></body>",
         "<body><ruby>a<rt>b</rt><rp>(</rp></ruby></body>"),
    ],
)
def test_nobr_button_form_ruby(source, expected):
    assert body_html(source) == expected


def test_after_body_comments():
    """'after body' comments become children of the html element; 'after
    after body' comments children of the Document (dropped by the
    doctype+documentElement serialization, like the reference); any other
    content switches back to in-body."""
    assert parse_dom("<body>a</body><!--c-->").serialize() == (
        "<html><head></head><body>a</body><!--c--></html>"
    )
    assert parse_dom("<html><body>a</body></html><!--d-->").serialize() == (
        "<html><head></head><body>a</body></html>"
    )
    assert parse_dom("<body>a</body><!--c-->b<!--e-->").serialize() == (
        "<html><head></head><body>ab<!--e--></body><!--c--></html>"
    )


def test_after_frameset_comments():
    """Spec 'after frameset': comments become children of the html element;
    'after after frameset' (past </html>): children of the Document, which
    the doctype+documentElement serialization drops — mirroring the
    after-body pair above for frameset documents."""
    assert parse_dom(
        "<html><frameset></frameset><!--f--></html>"
    ).serialize() == (
        "<html><head></head><frameset></frameset><!--f--></html>"
    )
    assert parse_dom(
        "<html><frameset></frameset></html><!--g-->"
    ).serialize() == (
        "<html><head></head><frameset></frameset></html>"
    )
    # and the Document-level placement is real, not a dropped token
    doc = parse_html("<html><frameset></frameset></html><!--g-->")
    kinds = [type(node).__name__ for node in doc.child_nodes]
    assert kinds[-1] == "Comment" and doc.child_nodes[-1].data == "g"


# ---------------------------------------------------------------------------
# NULL-character handling (tokenizer U+FFFD states + tree-builder drop rules)


@pytest.mark.parametrize(
    "source, expected",
    [
        # "in body": NULL character tokens are DROPPED
        ("<body>a\x00b", "<body>ab</body>"),
        # foreign content: NULL → U+FFFD
        ("<svg>a\x00b</svg>", "<body><svg>a�b</svg></body>"),
        # CDATA exists only in foreign content → U+FFFD
        ("<svg><![CDATA[a\x00b]]></svg>",
         "<body><svg>a�b</svg></body>"),
        # attribute values: U+FFFD at the tokenizer
        ('<div class="a\x00b"></div>',
         '<body><div class="a�b"></div></body>'),
        # numeric reference to NULL is already U+FFFD
        ("<body>a&#0;b", "<body>a�b</body>"),
    ],
)
def test_null_characters(source, expected):
    assert body_html(source) == expected


def test_null_in_rcdata_rawtext_comment():
    doc = parse_dom("<title>a\x00b</title><body><!--c\x00d-->"
                    "<style>e\x00f</style></body>")
    out = doc.serialize()
    assert "<title>a�b</title>" in out
    assert "<!--c�d-->" in out
    assert "e�f" in out
    assert "\x00" not in out


# ---------------------------------------------------------------------------
# implied <body> at EOF (parse5 emits html/head/body for every document)


@pytest.mark.parametrize(
    "source, expected",
    [
        ("", "<html><head></head><body></body></html>"),
        ("<title>t</title>",
         "<html><head><title>t</title></head><body></body></html>"),
        ("<head><meta></head>",
         "<html><head><meta></head><body></body></html>"),
        ("<!-- c -->", "<html><head></head><body></body></html>"),
    ],
)
def test_implied_body_at_eof(source, expected):
    assert parse_dom(source).serialize() == expected


def test_frameset_document_has_no_implied_body():
    out = parse_dom("<frameset><frame></frameset>").serialize()
    assert "<body" not in out


# ---------------------------------------------------------------------------
# in-body auto-close battery (spec rules pinned after a probe sweep)


@pytest.mark.parametrize(
    "source, expected",
    [
        # li closes THROUGH a div (the stop-list excepts address/div/p)
        ("<ul><li><div>a<li>b</ul>",
         "<body><ul><li><div>a</div></li><li>b</li></ul></body>"),
        # heading auto-close
        ("<h1>a<h2>b", "<body><h1>a</h1><h2>b</h2></body>"),
        # optgroup/option outside select: spec "in body" optgroup/option
        # start tags pop ONLY an open <option> — the second <optgroup>
        # NESTS inside the first (pop-the-optgroup-too is an "in select"
        # rule; see test_select_optgroup_never_nests)
        ("<body><optgroup><option>a<optgroup><option>b",
         "<body><optgroup><option>a</option>"
         "<optgroup><option>b</option></optgroup></optgroup></body>"),
        # duplicate attribute: first wins
        ('<div id="a" id="b"></div>', '<body><div id="a"></div></body>'),
        # <a> in <a> runs the adoption agency
        ("<a>1<a>2", "<body><a>1</a><a>2</a></body>"),
        # annotation-xml WITHOUT an html encoding is NOT an integration
        # point: <div> is a breakout tag and pops the math subtree
        ("<math><annotation-xml><div>x</div></annotation-xml></math>",
         "<body><math><annotation-xml></annotation-xml></math>"
         "<div>x</div></body>"),
        # script in svg is NOT raw; <b> breaks out of foreign content
        ("<svg><script>a<b>c</b></script></svg>",
         "<body><svg><script>a</script></svg><b>c</b></body>"),
        # formatting opened in a cell must not leak into the next cell
        ("<table><tr><td><b>x<td>y</table>",
         "<body><table><tbody><tr><td><b>x</b></td><td>y</td></tr>"
         "</tbody></table></body>"),
    ],
)
def test_in_body_auto_close_battery(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # self-closing flag is IGNORED on html-namespace elements — known,
        # unknown and custom-element names alike stay open
        ("<my-widget/>x", "<body><my-widget>x</my-widget></body>"),
        ("<foo/>x</foo>y", "<body><foo>x</foo>y</body>"),
        ("<div/>x</div>y", "<body><div>x</div>y</body>"),
        # ... but honored in foreign content
        ("<svg><circle/><rect/></svg>x",
         "<body><svg><circle></circle><rect></rect></svg>x</body>"),
    ],
)
def test_self_closing_flag_ignored_in_html(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # windows-1252 remap of C1 numeric references
        ("&#128;", "<body>€</body>"),
        ("&#x80;", "<body>€</body>"),
        # surrogate / out-of-range numeric references → U+FFFD
        ("&#xD800;", "<body>�</body>"),
        ("&#x110000;", "<body>�</body>"),
        # legacy named references without semicolon, longest-prefix
        ("a&notit;b", "<body>a¬it;b</body>"),
        ("x&lty", "<body>x&lt;y</body>"),
    ],
)
def test_character_reference_edge_cases(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# adoption agency, furthest-block half (the full spec algorithm, round 3)


@pytest.mark.parametrize(
    "source, expected",
    [
        # the classic: a block intervenes — <b> splits around the <p>
        (
            "<body><b>1<p>2</b>3</p></body>",
            "<body><b>1</b><p><b>2</b>3</p></body>",
        ),
        # the famous misnested-div chain: one <a> clone per block level
        (
            "<body><a>1<div>2<div>3</a>4</body>",
            "<body><a>1</a><div><a>2</a><div><a>3</a>4</div></div></body>",
        ),
        # html5lib adoption01 shape: the <i> between <b> and the block
        # reopens OUTSIDE and the block moves into it
        (
            "<body><b>1<i>2<p>3</b>4</body>",
            "<body><b>1<i>2</i></b><i><p><b>3</b>4</p></i></body>",
        ),
        # button is special: it is the furthest block
        (
            "<body><b><button>1</b>2</button></body>",
            "<body><b></b><button><b>1</b>2</button></body>",
        ),
        # no furthest block: pop through, NO eager empty clone; the stray
        # </i> then REMOVES the stale entry (not on the stack), so "x" has
        # nothing to reconstruct
        (
            "<body><b><i></b></i>x</body>",
            "<body><b><i></i></b>x</body>",
        ),
        (
            "<body><b><i></b></i></body>",
            "<body><b><i></i></b></body>",
        ),
        # second <a> start implies adoption of the first
        (
            '<body><a href="1">a<a href="2">b</body>',
            '<body><a href="1">a</a><a href="2">b</a></body>',
        ),
    ],
)
def test_adoption_agency_furthest_block(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# ruby implied end tags, quirks-mode gating, after-body resume (round 3)


@pytest.mark.parametrize(
    "source, expected",
    [
        # rt implies </rb>; rb/rt siblings chain
        (
            "<body><ruby><rb>a<rt>b</ruby></body>",
            "<body><ruby><rb>a</rb><rt>b</rt></ruby></body>",
        ),
        (
            "<body><ruby><rb>a<rb>b<rt>c<rp>(<rt>d<rp>)</ruby></body>",
            "<body><ruby><rb>a</rb><rb>b</rb><rt>c</rt><rp>(</rp>"
            "<rt>d</rt><rp>)</rp></ruby></body>",
        ),
        # rt nests INSIDE an open rtc (the except-rtc clause); rb closes it
        (
            "<body><ruby><rtc><rt>a<rt>b</rtc><rb>c</ruby></body>",
            "<body><ruby><rtc><rt>a</rt><rt>b</rt></rtc><rb>c</rb>"
            "</ruby></body>",
        ),
        # content after a stray </body> / </html> resumes inside the still
        # open element — the stack is not popped by the mode switch
        (
            "<body><p>a</body>b</body>",
            "<body><p>ab</p></body>",
        ),
        (
            "<body><p>a</html>b</body>",
            "<body><p>ab</p></body>",
        ),
    ],
)
def test_ruby_and_after_body(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected_body",
    [
        # no doctype → quirks: <table> does NOT close the open <p>
        (
            "<p>1<table></table>2",
            "<body><p>1<table></table>2</p></body>",
        ),
        # standards doctype → the p closes first
        (
            "<!DOCTYPE html><p>1<table></table>2",
            "<body><p>1</p><table></table>2</body>",
        ),
        # HTML 3.2 public id → quirks
        (
            '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 3.2 Final//EN">'
            "<p>1<table></table>",
            "<body><p>1<table></table></p></body>",
        ),
        # 4.01 Transitional WITH a system id → limited-quirks (not quirks)
        (
            '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN"'
            ' "http://www.w3.org/TR/html4/loose.dtd"><p>1<table></table>',
            "<body><p>1</p><table></table></body>",
        ),
        # 4.01 Transitional WITHOUT a system id → quirks
        (
            '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN">'
            "<p>1<table></table>",
            "<body><p>1<table></table></p></body>",
        ),
    ],
)
def test_quirks_mode_table_in_p(source, expected_body):
    assert body_html(source) == expected_body


def full_html(source: str) -> str:
    doc = parse_html(source)
    return serialize(doc.child_nodes[-1])


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "after head": metadata between </head> and <body> is pushed
        # back INTO the head
        (
            '<head></head><meta charset="x"><body>hi',
            '<html><head><meta charset="x"></head><body>hi</body></html>',
        ),
        (
            "<head></head><title>t</title><body>hi",
            "<html><head><title>t</title></head><body>hi</body></html>",
        ),
        (
            "<head></head><style>s</style><body>hi",
            "<html><head><style>s</style></head><body>hi</body></html>",
        ),
        # noscript is NOT in the after-head push-back list — it implies body
        (
            "<head></head><noscript>n</noscript>hi",
            "<html><head></head><body><noscript>n</noscript>hi</body></html>",
        ),
        # metadata after body content stays in place (in-body in-head rules)
        (
            '<body>x<meta name="a">',
            '<html><head></head><body>x<meta name="a"></body></html>',
        ),
    ],
)
def test_after_head_metadata_pushback(source, expected):
    assert full_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # </body> while the head is still open: pop head, imply body (in
        # head "anything else"), content lands in body
        (
            "<head></body><p>hi",
            "<html><head></head><body><p>hi</p></body></html>",
        ),
        # metadata AFTER </body> reprocesses in body, not after-head
        (
            "<head></head></body><meta>x",
            "<html><head></head><body><meta>x</body></html>",
        ),
    ],
)
def test_stray_body_end_with_open_head(source, expected):
    assert full_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # a SECOND <a> start tag runs the full adoption agency, splitting
        # around the open block instead of tearing it out
        (
            "<body><a>1<div>2<a>3</body>",
            "<body><a>1</a><div><a>2</a><a>3</a></div></body>",
        ),
        # an end tag whose target lies OUTSIDE the open cell is ignored at
        # the cell boundary — the table survives
        (
            "<body><b>x<table><tr><td></b>y</table></body>",
            "<body><b>x<table><tbody><tr><td>y</td></tr></tbody></table>"
            "</b></body>",
        ),
        (
            "<body><div>x<table><tr><td></div>y</table></body>",
            "<body><div>x<table><tbody><tr><td>y</td></tr></tbody></table>"
            "</div></body>",
        ),
    ],
)
def test_boundary_hidden_end_tags(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # applet/marquee/object push formatting MARKERS: formatting opened
        # inside never reconstructs outside
        (
            "<body><applet><b>1</applet>2</body>",
            "<body><applet><b>1</b></applet>2</body>",
        ),
        (
            "<body><marquee><b>1</marquee>2</body>",
            "<body><marquee><b>1</b></marquee>2</body>",
        ),
        (
            "<body><object><b>1</object>2</body>",
            "<body><object><b>1</b></object>2</body>",
        ),
        # ...while formatting opened BEFORE survives past the boundary
        (
            "<body><b>0<applet>1</applet>2</body>",
            "<body><b>0<applet>1</applet>2</b></body>",
        ),
    ],
)
def test_marker_elements_bound_formatting(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected_text",
    [
        # noncharacters and C0 controls are parse ERRORS but the character
        # is still emitted (html.unescape silently drops them — spec/parse5
        # keep them)
        ("&#x10FFFF;x", "\U0010FFFFx"),
        ("&#1;x", "\x01x"),
        # C1 range maps through windows-1252
        ("&#128;", "€"),
        ("&#x94;", "”"),
        # NUL / surrogates / out-of-range → U+FFFD
        ("&#0;", "�"),
        ("&#xD800;", "�"),
        ("&#x110000;", "�"),
        # single-pass decode: &#38;amp; is the TEXT '&amp;', not '&'
        ("&#38;amp;", "&amp;"),
    ],
)
def test_numeric_charref_spec_table(source, expected_text):
    doc = parse_html(f"<body>{source}</body>")
    texts = [n.value for n in doc.body.child_nodes
             if getattr(n, "value", None) is not None]
    assert "".join(texts) == expected_text


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec script-data DOUBLE-escaped state: inside <!-- ... --> an
        # inner <script>…</script> does NOT close the outer script (the
        # document.write pattern). Serialized </ becomes <\/ per the
        # reference serializer (dom-parser-node.js:71).
        (
            "<body><script><!--<script>a</script>b--></script>c</body>",
            "<body><script><!--<script>a<\\/script>b--></script>c</body>",
        ),
        (
            "<body><script><!--<script></script></script>z</body>",
            "<body><script><!--<script><\\/script></script>z</body>",
        ),
        # single-escaped: --> exits, the next </script> closes
        (
            "<body><script><!-- x --></script>y</body>",
            "<body><script><!-- x --></script>y</body>",
        ),
        # plain script content with < and --> is untouched
        (
            "<body><script>if (a<b) x()</script>y</body>",
            "<body><script>if (a<b) x()</script>y</body>",
        ),
        (
            "<body><script>a --> b</script>y</body>",
            "<body><script>a --> b</script>y</body>",
        ),
    ],
)
def test_script_data_escape_states(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # the li/dd/dt auto-close loop stops at ANY special element except
        # address/div/p: a <dl>/<blockquote> wrapper keeps the item nested
        (
            "<body><dl><dd><dl><dt>x</dl></dd></dl></body>",
            "<body><dl><dd><dl><dt>x</dt></dl></dd></dl></body>",
        ),
        (
            "<body><ul><li>one<blockquote><li>two</blockquote></li></ul></body>",
            "<body><ul><li>one<blockquote><li>two</li></blockquote></li>"
            "</ul></body>",
        ),
        # ...while address/div/p wrappers do NOT stop the close
        (
            "<body><ul><li>one<address><li>two</ul></body>",
            "<body><ul><li>one<address></address></li><li>two</li></ul>"
            "</body>",
        ),
    ],
)
def test_li_dd_dt_stop_at_specials(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # pop_scoped is namespace-aware: a foreign integration point stops
        # the li auto-close walk (foreignObject is special) — serialized
        # lowercase per the reference serializer
        (
            "<body><ul><li>a<svg><foreignObject><li>b</foreignObject>"
            "</svg></li></ul></body>",
            "<body><ul><li>a<svg><foreignobject><li>b</li></foreignobject>"
            "</svg></li></ul></body>",
        ),
        # a FOREIGN <object> pushes no formatting marker, so popping it
        # must not consume one — <b> still reconstructs in the next li
        (
            "<body><ul><li><b>x<svg><object></object></svg></li><li>y</li>"
            "</ul></body>",
            "<body><ul><li><b>x<svg><object></object></svg></b></li>"
            "<li><b>y</b></li></ul></body>",
        ),
        # <!--> / <!---> enter-and-exit the script escape state in one
        # stroke (the opener's dashes ARE the closer's)
        (
            "<body><script><!--<script a> <!--> </script>x</body>",
            "<body><script><!--<script a> <!--> </script>x</body>",
        ),
        (
            "<body><script><!--><script>a</script>b</body>",
            "<body><script><!--><script>a</script>b</body>",
        ),
    ],
)
def test_namespace_aware_scopes_and_script_overlap(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected_text",
    [
        # digits are consumed unboundedly like the spec — no mid-number
        # split leaking trailing digits
        ("&#1234567890123;x", "�x"),
        ("&#x11000000000;x", "�x"),
        ("&#0000038;", "&"),
    ],
)
def test_numeric_charref_long_digits(source, expected_text):
    doc = parse_html(f"<body>{source}</body>")
    texts = [n.value for n in doc.body.child_nodes
             if getattr(n, "value", None) is not None]
    assert "".join(texts) == expected_text


@pytest.mark.parametrize(
    "source, expected",
    [
        # "in select" gates on the CONTEXT namespace: an <svg>/<math> start
        # tag is ignored like any other disallowed tag (text still lands)
        (
            "<body><select><svg><circle></circle></svg><option>a</select>"
            "</body>",
            "<body><select><option>a</option></select></body>",
        ),
        (
            "<body><select><math><mi>x</mi></math><option>a</select></body>",
            "<body><select>x<option>a</option></select></body>",
        ),
        # hr is allowed in select (2023 spec addition parse5 follows)
        (
            "<body><select><hr><option>a</select></body>",
            "<body><select><hr><option>a</option></select></body>",
        ),
    ],
)
def test_select_ignores_foreign_roots(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "in table" <form>: insert, set the pointer, pop IMMEDIATELY —
        # the form stays empty and the non-hidden <input> fosters out
        (
            "<body><table><form><input type=text></form></table></body>",
            '<body><input type="text"><table><form></form></table></body>',
        ),
        (
            "<body><table><form><tr><td><input></td></tr></form></table></body>",
            "<body><table><form></form><tbody><tr><td><input></td></tr>"
            "</tbody></table></body>",
        ),
        # ... but a form inside a CELL is the plain in-body rule: stays open
        (
            "<body><table><tr><td><form><input></form></td></tr></table></body>",
            "<body><table><tbody><tr><td><form><input></form></td></tr>"
            "</tbody></table></body>",
        ),
        # hidden input after the popped form stays inside the table
        (
            "<body><form a=1></form><table><form b=2>"
            "<input type=hidden></form></table></body>",
            '<body><form a="1"></form><table><form b="2"></form>'
            '<input type="hidden"></table></body>',
        ),
        # pointer already set: the in-table <form> is ignored outright
        (
            "<body><form><table><form><tr><td>x</table></form></body>",
            "<body><form><table><tbody><tr><td>x</td></tr></tbody>"
            "</table></form></body>",
        ),
    ],
)
def test_form_in_table_pops_immediately(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # "in table text": ONE non-ws char makes the whole pending run
        # foster (the leading space travels with it) ...
        (
            "<body><table> a<td>x</td></table></body>",
            "<body> a<table><tbody><tr><td>x</td></tr></tbody></table></body>",
        ),
        # ... an all-whitespace run stays inside the table
        (
            "<body><table>\t\n<tr><td>x</td></tr></table></body>",
            "<body><table>\t\n<tbody><tr><td>x</td></tr></tbody></table></body>",
        ),
        # "in select in table": td / tr / </table> tokens close the select
        (
            "<body><table><tr><td><select><option>a<td>b</table></body>",
            "<body><table><tbody><tr><td><select><option>a</option></select>"
            "</td><td>b</td></tr></tbody></table></body>",
        ),
        (
            "<body><table><tr><td><select><option>a<tr><td>b</table></body>",
            "<body><table><tbody><tr><td><select><option>a</option></select>"
            "</td></tr><tr><td>b</td></tr></tbody></table></body>",
        ),
        (
            "<body><table><tr><td><select><option>a</table>x</body>",
            "<body><table><tbody><tr><td><select><option>a</option></select>"
            "</td></tr></tbody></table>x</body>",
        ),
        # a select fostered out of the table still closes on table tokens
        (
            "<body><table><select><option>a<tr><td>b</table></body>",
            "<body><select><option>a</option></select><table><tbody><tr>"
            "<td>b</td></tr></tbody></table></body>",
        ),
        # "in caption": td closes the caption; </table> closes it too; a
        # nested <table> start tag NESTS (it is not in the caption list)
        (
            "<body><table><caption>cap<td>c</td></table></body>",
            "<body><table><caption>cap</caption><tbody><tr><td>c</td></tr>"
            "</tbody></table></body>",
        ),
        (
            "<body><table><caption>cap</table>after</body>",
            "<body><table><caption>cap</caption></table>after</body>",
        ),
        (
            "<body><table><caption>a<table><tr><td>b</td></tr></table></body>",
            "<body><table><caption>a<table><tbody><tr><td>b</td></tr></tbody>"
            "</table></caption></table></body>",
        ),
        # <table> in "in table" acts as </table> + reprocess (sibling)
        (
            "<body><table><table><tr><td>a</table></body>",
            "<body><table></table><table><tbody><tr><td>a</td></tr></tbody>"
            "</table></body>",
        ),
    ],
)
def test_table_text_select_caption_modes(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # <image> is retagged <img> (spec "in body")
        ("<body><image src=x>y</body>", '<body><img src="x">y</body>'),
        # xmp closes an open p and is RAW text; no leading-newline skip
        (
            "<body><p>a<xmp><b>raw</xmp>z</body>",
            "<body><p>a</p><xmp><b>raw</xmp>z</body>",
        ),
        ("<body><xmp>\nkeep</xmp></body>", "<body><xmp>\nkeep</xmp></body>"),
        # listing skips the leading newline like pre
        ("<body><listing>\nkeep</listing></body>",
         "<body><listing>keep</listing></body>"),
        # textarea: RCDATA + leading-newline skip (serializer escaping is
        # the REFERENCE contract, dom-parser-node.js:329)
        (
            "<body><textarea>\na<b>c</textarea>x</body>",
            "<body><textarea>a&lt;b&gt;c</textarea>x</body>",
        ),
        # iframe / noembed are raw text containers
        ("<body><iframe>a<b>c</iframe>x</body>",
         "<body><iframe>a<b>c</iframe>x</body>"),
        ("<body><noembed>a<b>c</noembed>x</body>",
         "<body><noembed>a<b>c</noembed>x</body>"),
        # Noah's-ark clause: at most 3 identical active-formatting entries
        # survive to reconstruct in the next block
        (
            "<body><p><b><b><b><b>x</p><p>y</p></body>",
            "<body><p><b><b><b><b>x</b></b></b></b></p>"
            "<p><b><b><b>y</b></b></b></p></body>",
        ),
    ],
)
def test_image_rawtext_noahs_ark(source, expected):
    assert body_html(source) == expected


def doc_html(source: str) -> str:
    doc = parse_html(source)
    return serialize(doc.document_element)


@pytest.mark.parametrize(
    "source, expected",
    [
        # a second <body> token merges only the NEW attributes
        ("<body a=1>x<body b=2>y",
         '<html><head></head><body a="1" b="2">xy</body></html>'),
        # a second <html> token merges attrs onto the root
        ("<html lang=en><body>x</body><html class=c>",
         '<html lang="en" class="c"><head></head><body>x</body></html>'),
        # <head> in body is ignored; its metadata inserts in place
        ("<body>x<head><meta charset=utf-8>y</body>",
         '<html><head></head><body>x<meta charset="utf-8">y</body></html>'),
        # metadata start tags in body insert at the CURRENT position
        ("<body><p>a<link href=x>b</p></body>",
         '<html><head></head><body><p>a<link href="x">b</p></body></html>'),
        ("<body><p>a<title>t</title>b</p></body>",
         "<html><head></head><body><p>a<title>t</title>b</p></body></html>"),
        # a mid-document doctype is ignored
        ("<body>a<!DOCTYPE html>b</body>",
         "<html><head></head><body>ab</body></html>"),
    ],
)
def test_attr_merge_and_metadata_in_body(source, expected):
    assert doc_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # noscript is RAW text with scripting enabled (parse5 default —
        # the reference's configuration): content stays verbatim
        ("<body><noscript><b class=q>x</b></noscript>y</body>",
         "<body><noscript><b class=q>x</b></noscript>y</body>"),
        ("<body><noscript><p>a<p>b</noscript>y</body>",
         "<body><noscript><p>a<p>b</noscript>y</body>"),
        # <tr> after an explicit </tbody> opens a NEW tbody
        ("<body><table><tbody><tr><td>a</tbody><tr><td>b</table></body>",
         "<body><table><tbody><tr><td>a</td></tr></tbody>"
         "<tbody><tr><td>b</td></tr></tbody></table></body>"),
        # <caption> after a cell clears back to table context
        ("<body><table><tr><td>a<caption>b</caption></table></body>",
         "<body><table><tbody><tr><td>a</td></tr></tbody>"
         "<caption>b</caption></table></body>"),
        # <col> in table body: clear to table, implied colgroup
        ("<body><table><tbody><col><tr><td>a</table></body>",
         "<body><table><tbody></tbody><colgroup><col></colgroup>"
         "<tbody><tr><td>a</td></tr></tbody></table></body>"),
        # <tfoot> closes the open tbody
        ("<body><table><tbody><tr><td>a<tfoot><tr><td>f</table></body>",
         "<body><table><tbody><tr><td>a</td></tr></tbody>"
         "<tfoot><tr><td>f</td></tr></tfoot></table></body>"),
    ],
)
def test_noscript_raw_and_table_section_transitions(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # foreign "any other end tag": a FOREIGN <a> above the nearest HTML
        # element pops alone — the outer html <a> stays open (the adoption
        # agency must not run)
        ("<body><a>1<svg><a>2</a></svg>3</a></body>",
         "<body><a>1<svg><a>2</a></svg>3</a></body>"),
        # ... the walk pops through non-matching foreign nodes above it
        ("<body><a>1<svg><a><circle></circle>2</a></svg>3</a></body>",
         "<body><a>1<svg><a><circle></circle>2</a></svg>3</a></body>"),
        # </svg> with the foreign a still open pops the whole subtree
        ("<body><a>1<svg><a>2</svg>3</a></body>",
         "<body><a>1<svg><a>2</a></svg>3</a></body>"),
        # <a> is NOT a foreign breakout tag
        ("<body><svg><a href=x>t</a></svg>y</body>",
         '<body><svg><a href="x">t</a></svg>y</body>'),
        # table nests inside an HTML integration point (svg desc)
        ("<body><svg><desc><table><tr><td>a</table></desc></svg></body>",
         "<body><svg><desc><table><tbody><tr><td>a</td></tr></tbody>"
         "</table></desc></svg></body>"),
        # self-closing <td/> keeps the cell open (flag ignored in html)
        ("<body><table><tr><td/>x</table></body>",
         "<body><table><tbody><tr><td>x</td></tr></tbody></table></body>"),
    ],
)
def test_foreign_end_tag_formatting(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, attrs, expected",
    [
        # spec "before attribute name" =: the equals sign STARTS the name;
        # the reference serializer drops unwritable names (quotes, =, /)
        ("<body><a =x>y</a></body>", [["=x", ""]], "<body><a>y</a></body>"),
        ("<body><a =x=1 b=2>y</a></body>", [["=x", "1"], ["b", "2"]],
         '<body><a b="2">y</a></body>'),
        ("<body><a 'q'=1 b=2>y</a></body>", [["'q'", "1"], ["b", "2"]],
         '<body><a b="2">y</a></body>'),
        # name "=" then before-attribute-value: the unquoted value keeps
        # its embedded equals sign
        ("<body><a == c=3>y</a></body>", [["=", "c=3"]],
         "<body><a>y</a></body>"),
        # duplicate attribute: first wins
        ("<body><div a=1 a=2>x</div></body>", [["a", "1"]],
         '<body><div a="1">x</div></body>'),
    ],
)
def test_attr_name_edge_tokenization(source, attrs, expected):
    doc = parse_html(source)
    assert doc.body.child_nodes[0].attrs == attrs
    assert serialize(doc.body) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # bogus comments: <? … > and </ + non-letter keep their content
        ("<body><?php echo 1 ?>x</body>", "<body><!--?php echo 1 ?-->x</body>"),
        ("<body></ div>x</body>", "<body><!-- div-->x</body>"),
        ("<body></3>x</body>", "<body><!--3-->x</body>"),
        # < before a non-letter is TEXT
        ("<body>a<3 b</body>", "<body>a&lt;3 b</body>"),
        # a slash joins an UNQUOTED value; with a space it self-closes
        # (flag ignored on html elements either way)
        ("<body><a href=x/>y</a></body>", '<body><a href="x/">y</a></body>'),
        ("<body><a href=x />y</a></body>", '<body><a href="x">y</a></body>'),
        # empty numeric charrefs stay literal
        ("<body>&#;x &# y &#x; z</body>",
         "<body>&amp;#;x &amp;# y &amp;#x; z</body>"),
    ],
)
def test_bogus_comments_and_unquoted_values(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec input preprocessing: CRLF and lone CR both normalize to LF
        # before tokenization — text, raw text and attribute values alike
        ("<body><pre>a\r\nb\rc</pre></body>", "<body><pre>a\nb\nc</pre></body>"),
        ('<body><div title="a\r\nb\rc">t</div></body>',
         '<body><div title="a\nb\nc">t</div></body>'),
        # a leading CRLF after <pre> normalizes to LF, then the pre rule
        # drops it
        ("<body><pre>\r\nkept</pre></body>", "<body><pre>kept</pre></body>"),
        ("<body><textarea>\rkept</textarea></body>",
         "<body><textarea>kept</textarea></body>"),
    ],
)
def test_newline_preprocessing(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "in select" <hr>: pop an open option, then an open optgroup —
        # the rule is the spec's only way an hr becomes a select child
        ("<body><select><option>a<hr><option>b</select></body>",
         "<body><select><option>a</option><hr><option>b</option></select></body>"),
        ("<body><select><optgroup><option>a<hr><option>b</select></body>",
         "<body><select><optgroup><option>a</option></optgroup><hr>"
         "<option>b</option></select></body>"),
        # outside a select, hr does NOT close an option
        ("<body><select></select><option>a<hr>b</body>",
         "<body><select></select><option>a<hr>b</option></body>"),
    ],
)
def test_hr_in_select(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec eof-in-tag: a start or end tag truncated by EOF is dropped
        ("<body>x<div foo", "<body>x</body>"),
        ('<body>x<div foo="bar', "<body>x</body>"),
        ("<body>x</div", "<body>x</body>"),
        ("<body>x<sp", "<body>x</body>"),
        # spec missing-end-tag-name: "</>" vanishes without a comment,
        # while "</3>" is a bogus comment
        ("<body>x</>y</body>", "<body>xy</body>"),
        ("<body>x</3>y</body>", "<body>x<!--3-->y</body>"),
    ],
)
def test_eof_in_tag_dropped(source, expected):
    assert body_html(source) == expected


def test_null_in_names_becomes_replacement_char():
    # spec: U+0000 in tag and attribute names → U+FFFD at the tokenizer
    doc = parse_html("<body><di\x00v a\x00b=1>x</di\x00v></body>")
    el = doc.body.child_nodes[0]
    assert el.tag_name == "di�v"
    assert el.attrs == [["a�b", "1"]]


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "in table" <input type=hidden>: inserted IN the table (not
        # fostered) — any other input fosters out
        ('<body><table><input type="hidden" name="x"><tr><td>c</td></tr></table></body>',
         '<body><table><input type="hidden" name="x"><tbody><tr><td>c</td></tr>'
         "</tbody></table></body>"),
        ('<body><table><input type="text"><tr><td>c</td></tr></table></body>',
         '<body><input type="text"><table><tbody><tr><td>c</td></tr></tbody>'
         "</table></body>"),
    ],
)
def test_hidden_input_in_table(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "in column group" anything-else: non-ws text pops the
        # colgroup and reprocesses in table → fosters out; the popped
        # (empty) colgroup STAYS and <col> opens a fresh implied one
        ("<body><table><colgroup>x<col></colgroup><tr><td>c</td></table></body>",
         "<body>x<table><colgroup></colgroup><colgroup><col></colgroup>"
         "<tbody><tr><td>c</td></tr></tbody></table></body>"),
        # whitespace stays inside the colgroup
        ("<body><table><colgroup> <col></colgroup><tr><td>c</td></table></body>",
         "<body><table><colgroup> <col></colgroup>"
         "<tbody><tr><td>c</td></tr></tbody></table></body>"),
        # <col> in a table body pops the tbody (which stays, empty) and a
        # colgroup is implied; the later <tr> opens a NEW tbody
        ("<body><table><tbody><col><tr><td>c</td></table></body>",
         "<body><table><tbody></tbody><colgroup><col></colgroup>"
         "<tbody><tr><td>c</td></tr></tbody></table></body>"),
        # style/script in a row stay in the tr (in-head rules at the
        # current node — NOT fostered)
        ("<body><table><tr><style>.c{}</style><td>x</td></table></body>",
         "<body><table><tbody><tr><style>.c{}</style><td>x</td></tr>"
         "</tbody></table></body>"),
        # a nested <table> inside a caption is flow content (the in-caption
        # close-and-reprocess list has td/tr/sections — not table)
        ("<body><table><caption>a<table><tr><td>i</td></table>b</table></body>",
         "<body><table><caption>a<table><tbody><tr><td>i</td></tr></tbody>"
         "</table>b</caption></table></body>"),
    ],
)
def test_colgroup_text_and_table_mode_corners(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "in body" <xmp>: close p → RECONSTRUCT active formatting →
        # raw text. xmp is the one p-closer that reconstructs, so the open
        # <b> reopens around it
        ("<body><p><b>x<xmp>raw</xmp>y</body>",
         "<body><p><b>x</b></p><b><xmp>raw</xmp>y</b></body>"),
        # the raw content is still unescaped markup
        ("<body><xmp><b>not bold</b></xmp></body>",
         "<body><xmp><b>not bold</b></xmp></body>"),
        # no open formatting: plain p close only
        ("<body><p>x<xmp>raw</xmp></body>",
         "<body><p>x</p><xmp>raw</xmp></body>"),
    ],
)
def test_xmp_reconstructs_formatting(source, expected):
    assert body_html(source) == expected


def test_search_element_closes_p():
    # <search> (2023 addition, parse5 8.x) is a p-closer like section/nav
    assert body_html("<body><p>x<search>y</search>z</body>") == \
        "<body><p>x</p><search>y</search>z</body>"


@pytest.mark.parametrize(
    "source, expected",
    [
        # canonical html5lib tests1.dat adoption-agency trees
        ('<body><p>1<s id="A">2<b id="B">3</p>4</s>5</b>6</body>',
         '<body><p>1<s id="A">2<b id="B">3</b></s></p>'
         '<s id="A"><b id="B">4</b></s><b id="B">5</b>6</body>'),
        ("<body><a><b><big><em><strong><div>X</a>Y</body>",
         "<body><a><b><big><em><strong></strong></em></big></b></a>"
         "<big><em><strong><div><a>X</a>Y</div></strong></em></big></body>"),
        ("<body><p><b><div><marquee></p></b></div>X</body>",
         "<body><p><b></b></p><div><b><marquee><p></p>X</marquee></b></div></body>"),
        ('<body><a href="a">a<table><a href="b">b</table>x</body>',
         '<body><a href="a">a<a href="b">b</a><table></table></a>'
         '<a href="b">x</a></body>'),
    ],
)
def test_html5lib_canonical_adoption_trees(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "doctype, quirks",
    [
        ("", True),                                  # no doctype
        ("<!DOCTYPE html>", False),
        ('<!DOCTYPE html SYSTEM "about:legacy-compat">', False),
        ('<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 3.2 Final//EN">', True),
        # HTML 4.01 Transitional: quirks WITHOUT a system id,
        # limited-quirks (standards parsing) WITH one
        ('<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN">', True),
        ('<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
         '"http://www.w3.org/TR/html4/loose.dtd">', False),
        ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" '
         '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">', False),
        ('<!DOCTYPE html SYSTEM '
         '"http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">', True),
    ],
)
def test_quirks_mode_doctype_matrix(doctype, quirks):
    """Quirks-mode detection across the spec's public/system-id lists,
    observed through the one tree-construction rule it gates: <table>
    nests inside an open <p> only in quirks mode."""
    out = body_html(doctype + "<body><p><table><td>x</td></table></body>")
    nested = "<p><table>" in out
    assert nested == quirks


def test_serialize_document_includes_doctype():
    """serialize() on a whole Document must render the DocumentType child
    (the DOM.serialize wrapper handles it separately; the generic walk used
    to crash on it — round-4 regression guard)."""
    from mhtml_to_html_ray.kernel.dom import parse_html, serialize

    out = serialize(parse_html("<!DOCTYPE html><p>x"))
    assert out == "<!DOCTYPE html><html><head></head><body><p>x</p></body></html>"
    out = serialize(
        parse_html('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN"><p>x')
    )
    assert out.startswith('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN">')
    assert out.endswith("<html><head></head><body><p>x</p></body></html>")


# ---------------------------------------------------------------------------
# active-formatting markers: formatting from BEFORE a cell/caption must not
# leak INTO it, but must be restored AFTER the table closes (spec 13.2.4.3
# markers; parse5 does the same)


@pytest.mark.parametrize(
    "source, expected",
    [
        # <b> opened before the table, closed implicitly by </div> AFTER it:
        # the cell's content is not bold (marker), the post-div text IS
        # (the entry survives the cell and reconstructs)
        (
            "<div><b>1<table><td>3</td></table></div>4",
            "<body><div><b>1<table><tbody><tr><td>3</td></tr></tbody>"
            "</table></b></div><b>4</b></body>",
        ),
        # same through a <caption> boundary
        (
            "<div><b>1<table><caption>c</caption><td>3</td></table></div>4",
            "<body><div><b>1<table><caption>c</caption><tbody><tr><td>3"
            "</td></tr></tbody></table></b></div><b>4</b></body>",
        ),
        # formatting INSIDE one cell never leaks to the next cell or out of
        # the table
        (
            "<table><td><b>x</td><td>y</td></table>z",
            "<body><table><tbody><tr><td><b>x</b></td><td>y</td></tr>"
            "</tbody></table>z</body>",
        ),
        # marquee/object are marker boundaries too: inner formatting stays
        # inner, outer formatting spans across
        (
            "<b>pre<marquee>in</marquee>post",
            "<body><b>pre<marquee>in</marquee>post</b></body>",
        ),
    ],
)
def test_formatting_marker_boundaries(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# select-in-table, form pointer, frameset-ok, SVG integration points —
# the round-4 late-session probe set (spec 13.2.6.4.16 in-select-in-table,
# 13.2.6.4.7 "form" / "frameset", 13.2.6.5 integration points)


@pytest.mark.parametrize(
    "source, expected",
    [
        # a <table> start tag inside a select-in-table pops the select and
        # reopens table parsing; the trailing text foster-parents BEFORE
        # the inner table, inside the cell (13.2.6.4.16)
        (
            "<table><tr><td><select><option>a<table>x</table></table>",
            "<body><table><tbody><tr><td><select><option>a</option>"
            "</select>x<table></table></td></tr></tbody></table></body>",
        ),
        # optgroup/option implied end tags inside select
        (
            "<select><optgroup><option>1<optgroup><option>2</select>",
            "<body><select><optgroup><option>1</option></optgroup>"
            "<optgroup><option>2</option></optgroup></select></body>",
        ),
        # the form element pointer: a nested <form> start tag is ignored,
        # its contents land in the OUTER form (13.2.6.4.7 "form")
        (
            "<form><div><form><input></form></div></form>",
            "<body><form><div><input></div></form></body>",
        ),
        # frameset-ok stays true across whitespace-only body text ... (the
        # frameset REPLACES the body — asserted on the whole document)
        # ... but any non-whitespace character flips it off and the
        # frameset start tag is ignored
        (
            "<body>x<frameset><frame>",
            "<body>x</body>",
        ),
        # svg foreignObject is an HTML integration point: inner content
        # parses with HTML rules (a real <p> element, implied end works);
        # the reference serializer lowercases tag names on output
        (
            "<svg><foreignObject><p>hi<p>bye</foreignObject></svg>",
            "<body><svg><foreignobject><p>hi</p><p>bye</p>"
            "</foreignobject></svg></body>",
        ),
        # foreign content opened directly in a table foster-parents before
        # the table like any non-table content
        (
            "<table><svg><circle></svg><tr><td>x</table>",
            "<body><svg><circle></circle></svg><table><tbody><tr><td>x"
            "</td></tr></tbody></table></body>",
        ),
    ],
)
def test_select_form_frameset_and_integration_points(source, expected):
    assert body_html(source) == expected


def test_whitespace_keeps_frameset_ok():
    # spec 13.2.6.4.7: whitespace-only in-body text does not clear the
    # frameset-ok flag, so the frameset replaces the body entirely
    doc = parse_html("<body> <frameset><frame></frameset>")
    assert doc.body is None
    out = serialize(doc)
    assert out == ("<html><head></head><frameset><frame></frameset></html>")


# ---------------------------------------------------------------------------
# probe-pass pins (round 4 final session): behaviors verified against the
# spec by direct probing, now locked


@pytest.mark.parametrize(
    "source,expected",
    [
        # text after the last row foster-parents BEFORE the table
        ("<body><table><tr><td>cell</td></tr>x</table></body>",
         "<body>x<table><tbody><tr><td>cell</td></tr></tbody></table></body>"),
        # in QUIRKS mode (no doctype) <table> does NOT close an open <p> —
        # the one quirks-dependent rule in the "in body" table branch
        ("<body><p>1<table><td>2</table>3</body>",
         "<body><p>1<table><tbody><tr><td>2</td></tr></tbody></table>3"
         "</p></body>"),
        # a second <a> inside an open one: adoption agency splits both
        ("<body><a>1<p>2<a>3</body>",
         "<body><a>1</a><p><a>2</a><a>3</a></p></body>"),
        # caption sits before the synthesized tbody
        ("<body><table><caption>c</caption><tr><td>d</body>",
         "<body><table><caption>c</caption><tbody><tr><td>d</td></tr>"
         "</tbody></table></body>"),
        # colgroup auto-closes when a cell starts the implied row
        ("<body><table><colgroup><col><td>x</body>",
         "<body><table><colgroup><col></colgroup><tbody><tr><td>x</td></tr>"
         "</tbody></table></body>"),
        # svg <desc> is an HTML integration point
        ("<body><svg><desc><div>html</div></desc></svg></body>",
         "<body><svg><desc><div>html</div></desc></svg></body>"),
        # math <mtext> likewise
        ("<body><math><mtext><p>h</p></mtext></math></body>",
         "<body><math><mtext><p>h</p></mtext></math></body>"),
    ],
)
def test_probe_pins_structural(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source,expected",
    [
        # legacy named ref without ';' ('&amp' matches, 'x' follows);
        # the serializer re-escapes the bare ampersand
        ("<body>&ampx</body>", "<body>&amp;x</body>"),
        # out-of-range and NUL numeric refs become U+FFFD
        ("<body>&#x110000;</body>", "<body>\N{REPLACEMENT CHARACTER}</body>"),
        ("<body>&#0;</body>", "<body>\N{REPLACEMENT CHARACTER}</body>"),
        # longest legacy match: '&not' + 'it;' vs the full '&notin;'
        ("<body>&notit;</body>", "<body>¬it;</body>"),
        ("<body>&notin;</body>", "<body>∉</body>"),
    ],
)
def test_probe_pins_entities(source, expected):
    assert body_html(source) == expected


def test_probe_pin_nested_form_ignored():
    # a <form> while a form element pointer is set is ignored entirely
    assert body_html("<body><form><div><form><input></body>") == \
        "<body><form><div><input></div></form></body>"


def test_probe_pin_table_closes_p_standards_mode_only():
    # the same input WITH a doctype (standards mode): <table> closes <p>
    out = doc_html("<!DOCTYPE html><body><p>1<table><td>2</table>3")
    assert ("<body><p>1</p><table><tbody><tr><td>2</td></tr></tbody>"
            "</table>3</body>") in out


@pytest.mark.parametrize(
    "source,expected",
    [
        # CDATA sections are literal text in foreign content; the
        # serializer re-escapes on output
        ("<body><svg><![CDATA[<b>&amp;]]></svg></body>",
         "<body><svg>&lt;b&gt;&amp;amp;</svg></body>"),
        # duplicate attribute: the FIRST occurrence wins
        ("<body><div a='1' a='2'></div></body>",
         '<body><div a="1"></div></body>'),
        # a stray '/' before an attribute is dropped and parsing resumes
        ("<body><div/ x=1></div></body>", '<body><div x="1"></div></body>'),
        # svg <title> is an HTML integration point (next to desc and
        # foreignObject)
        ("<body><svg><title>t</title></svg></body>",
         "<body><svg><title>t</title></svg></body>"),
        # template INSIDE a table keeps its row content in the template
        # fragment instead of foster-parenting it
        ("<body><table><template><tr><td>x</td></tr></template></table>"
         "</body>",
         "<body><table><template><tr><td>x</td></tr></template></table>"
         "</body>"),
    ],
)
def test_probe_pins_tokenizer_and_foreign(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source,inner",
    [
        # script-data ESCAPED state: '</script>' inside <!-- --> still
        # closes the element (only double-escaped passes it through)
        ("<body><script><!--</script>after", "<!--"),
        # DOUBLE-escaped: '<script' seen inside the comment lets the inner
        # '</script>' pass as content; the outer one closes
        ("<body><script><!--<script>a</script>b--></script>c",
         "<!--<script>a</script>b-->"),
        # a split '</scr' + 'ipt>' is not an end tag
        ("<body><script>var a = '</scr' + 'ipt>';</script>d",
         "var a = '</scr' + 'ipt>';"),
    ],
)
def test_probe_pins_script_data_states(source, inner):
    from mhtml_to_html_ray.kernel.dom import parse_html

    doc = parse_html(source)
    script = doc.body.get_elements_by_tag_name("script")[0]
    text = "".join(c.value for c in script.child_nodes)
    assert text == inner


def test_probe_pin_rawtext_and_rcdata():
    from mhtml_to_html_ray.kernel.dom import parse_html

    # style is RAWTEXT with NO escape states: a quoted '</style>' closes
    doc = parse_html("<body><style>a { content: '</style>'; }</style>e")
    style = doc.body.get_elements_by_tag_name("style")[0]
    assert "".join(c.value for c in style.child_nodes) == "a { content: '"
    # textarea is RCDATA: markup is text, entities decode
    doc2 = parse_html("<body><textarea><!--&amp;</textarea>f")
    ta = doc2.body.get_elements_by_tag_name("textarea")[0]
    assert "".join(c.value for c in ta.child_nodes) == "<!--&"


@pytest.mark.parametrize(
    "source,expected",
    [
        # a second <html> start tag merges only MISSING attributes
        ("<html lang=en><body><html class=x lang=de>text",
         '<html lang="en" class="x"><head></head><body>text</body></html>'),
        # same rule for a second <body>
        ("<body bgcolor=a>x<body bgcolor=b class=c>y",
         '<html><head></head><body bgcolor="a" class="c">xy</body></html>'),
        # text between </head> and <body> lands in body
        ("<head><meta></head>stray<body>x",
         "<html><head><meta></head><body>strayx</body></html>"),
        # content after </body> reparents into body
        ("<body>x</body><p>after",
         "<html><head></head><body>x<p>after</p></body></html>"),
        # a head-only element after </head> goes back INTO head
        ("<head></head><title>late</title>",
         "<html><head><title>late</title></head><body></body></html>"),
        # a second doctype is ignored
        ("<!DOCTYPE html><!DOCTYPE html><p>x",
         "<!DOCTYPE html><html><head></head><body><p>x</p></body></html>"),
        # text after </html> reparents into body
        ("<html><head></head><body>a</html>b",
         "<html><head></head><body>ab</body></html>"),
        # input type=hidden inside a table is NOT fostered; any other
        # input is
        ("<body><table><input type=hidden name=x><td>y",
         '<html><head></head><body><table><input type="hidden" name="x">'
         "<tbody><tr><td>y</td></tr></tbody></table></body></html>"),
        ("<body><table><input type=text><td>y",
         '<html><head></head><body><input type="text"><table><tbody><tr>'
         "<td>y</td></tr></tbody></table></body></html>"),
        # "in select" ignores a <table> start tag (parse5 generation rule)
        ("<body><select><table><td>x",
         "<html><head></head><body><select>x</select></body></html>"),
    ],
)
def test_probe_pins_document_modes(source, expected):
    from mhtml_to_html_ray.kernel.dom import parse_html, serialize

    assert serialize(parse_html(source)) == expected


@pytest.mark.parametrize(
    "source,expected",
    [
        # bogus comments: <? and <! become comments, </> drops
        ("<body><?php echo ?>x", "<body><!--?php echo ?-->x</body>"),
        ("<body><!x>y", "<body><!--x-->y</body>"),
        ("<body></>z", "<body>z</body>"),
        # ATTRIBUTE values: a legacy (semicolon-less) named ref followed by
        # an alphanumeric or '=' must NOT expand — but expands in TEXT
        ("<body><a href='a&notin'>t</a>",
         '<body><a href="a&amp;notin">t</a></body>'),
        ("<body><a href='a&not;b'>t</a>",
         '<body><a href="a¬b">t</a></body>'),
        ("<body><a href='x&amp=1'>t</a>",
         '<body><a href="x&amp;amp=1">t</a></body>'),
        ("<body>a&notx", "<body>a¬x</body>"),
        # numeric refs expand in attributes
        ("<body><div data-x='&#65;'>q", '<body><div data-x="A">q</div></body>'),
        # empty and abruptly-closed comments
        ("<body><!---->e", "<body><!---->e</body>"),
        ("<body><!--->f", "<body><!---->f</body>"),
    ],
)
def test_probe_pins_bogus_comments_and_attr_entities(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# round-4 probe pass 7: every behavior probed spec-correct, pinned here


@pytest.mark.parametrize(
    "source,expected",
    [
        # xmp is RAWTEXT (no entity decode, no tags) AND on the literal-text
        # serialization list (no re-escaping)
        ("<body><xmp>a <b> &amp; c</xmp></body>",
         "<body><xmp>a <b> &amp; c</xmp></body>"),
        # marquee is special (own scope) but nests inside open formatting
        ("<body><b>x<marquee>y</marquee>z</body>",
         "<body><b>x<marquee>y</marquee>z</b></body>"),
        # an <a> start tag with an open <a> runs the adoption agency
        ("<body><a>1<a>2</a></body>", "<body><a>1</a><a>2</a></body>"),
        # the form element pointer ignores a nested <form> start tag
        ("<body><form><div><form><input></form></div></form></body>",
         "<body><form><div><input></div></form></body>"),
        # out-of-range / NUL / surrogate numeric refs all yield U+FFFD
        ("<body>&#x110000; &#0; &#xD800;</body>",
         "<body>\N{REPLACEMENT CHARACTER} \N{REPLACEMENT CHARACTER} "
         "\N{REPLACEMENT CHARACTER}</body>"),
        # the </br> end tag is re-tokenized as <br>
        ("<body>a</br>b</body>", "<body>a<br>b</body>"),
        # a <select> inside a select acts as </select>
        ("<body><select><option>a<select><option>b</select></body>",
         "<body><select><option>a</option></select><option>b</option></body>"),
        # a <button> start tag with a button in scope implies </button>
        ("<body><button><p>x<button>y</body>",
         "<body><button><p>x</p></button><button>y</button></body>"),
        # li scope: a nested list stays inside the open li
        ("<body><li>a<li>b<ul><li>c</ul><li>d</body>",
         "<body><li>a</li><li>b<ul><li>c</li></ul></li><li>d</li></body>"),
        ("<body><dt>a<dd>b<dt>c</body>",
         "<body><dt>a</dt><dd>b</dd><dt>c</dt></body>"),
        # headings close an open p and never nest in each other
        ("<body><p>x<h1>y</h1><h2>z</body>",
         "<body><p>x</p><h1>y</h1><h2>z</h2></body>"),
        # ruby: rb closed by rt, rt closed by rtc, rp legal inside rtc
        ("<body><ruby>a<rb>b<rt>c<rtc>d<rp>e</ruby></body>",
         "<body><ruby>a<rb>b</rb><rt>c</rt><rtc>d<rp>e</rp></rtc></ruby>"
         "</body>"),
        ("<body><table><tr><td>a<td>b<th>c</table></body>",
         "<body><table><tbody><tr><td>a</td><td>b</td><th>c</th></tr>"
         "</tbody></table></body>"),
        # svg foreignObject is an HTML integration point; the serializer
        # lowercases tag names (reference parity, dom.py _SVG_TAG_ADJUST
        # comment) while the DOM keeps the camelCase adjusted name
        ("<body><svg><foreignObject><p>h</p></foreignObject></svg></body>",
         "<body><svg><foreignobject><p>h</p></foreignobject></svg></body>"),
        # template inside tbody keeps row content inside its fragment
        ("<body><table><tbody><template><tr><td>t</td></tr></template>"
         "</tbody></table></body>",
         "<body><table><tbody><template><tr><td>t</td></tr></template>"
         "</tbody></table></body>"),
        # textarea RCDATA: leading newline dropped, entities decode, tags
        # stay text (and re-escape on serialization)
        ("<body><textarea>\n&amp;<b></textarea></body>",
         "<body><textarea>&amp;&lt;b&gt;</textarea></body>"),
    ],
)
def test_probe_pins_pass7(source, expected):
    assert body_html(source) == expected


def test_probe_pins_pass7_head_noscript():
    from mhtml_to_html_ray.kernel.dom import parse_html, serialize

    assert serialize(parse_html('<head><noscript><link href="x"></noscript>'
                                "</head>")) == (
        '<html><head><noscript><link href="x"></noscript></head>'
        "<body></body></html>")


def test_probe_pins_pass7_svg_camelcase_dom_names():
    """The DOM itself carries the ADJUSTED camelCase names (what a
    tree-walking consumer sees) even though serialization lowercases."""
    from mhtml_to_html_ray.kernel.dom import Element, parse_html

    doc = parse_html("<body><svg><foreignObject></foreignObject>"
                     "<textPath/><clipPath/><linearGradient/></svg></body>")
    names = []
    stack = list(doc.body.child_nodes)
    while stack:
        node = stack.pop()
        if isinstance(node, Element):
            names.append(node.tag_name)
            stack.extend(node.child_nodes)
    assert sorted(names) == ["clipPath", "foreignObject", "linearGradient",
                             "svg", "textPath"]


@pytest.mark.parametrize(
    "source,expected",
    [
        # svg script is a generic foreign element — content stays text
        ("<body><svg><script>var x;</script></svg></body>",
         "<body><svg><script>var x;</script></svg></body>"),
        # "in table" form rule: inserted and immediately popped (form
        # pointer set), NOT fostered; the hidden input stays in the table
        ("<body><table><form><input type=hidden name=x><tr><td>c</table>"
         "</body>",
         '<body><table><form></form><input type="hidden" name="x">'
         "<tbody><tr><td>c</td></tr></tbody></table></body>"),
        # </optgroup> closes the open option first
        ("<body><select><optgroup><option>a</optgroup><option>b</select>"
         "</body>",
         "<body><select><optgroup><option>a</option></optgroup>"
         "<option>b</option></select></body>"),
        # title is RCDATA wherever it appears — entities decode
        ("<body><title>&notin;</title></body>",
         "<body><title>∉</title></body>"),
        # address closes an open p (implied end in button scope)
        ("<body><p>x<address>y</address></body>",
         "<body><p>x</p><address>y</address></body>"),
        # EOF inside RAWTEXT keeps the accumulated text
        ("<body><style>unterminated {",
         "<body><style>unterminated {</style></body>"),
        # an SVG <a> nests inside an open HTML <a> (no adoption in foreign)
        ("<body><a href=o><svg><a href=i>y</a></svg></a></body>",
         '<body><a href="o"><svg><a href="i">y</a></svg></a></body>'),
        # template content keeps raw table parts (fragment context)
        ("<body><template><tr><td>x</td></tr></template></body>",
         "<body><template><tr><td>x</td></tr></template></body>"),
        ("<body><math><mo>+</mo><mn>1</mn></math></body>",
         "<body><math><mo>+</mo><mn>1</mn></math></body>"),
    ],
)
def test_probe_pins_pass8(source, expected):
    assert body_html(source) == expected


# ---------------------------------------------------------------------------
# probe pass 9: select/body optgroup split, form pointer, foreign attribute
# adjustment, integration points, numeric-reference corners, serializer
# reference-parity (document-level comments, unwritable attribute names)


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # spec "in select" <optgroup>: pop an open option, then an open
        # optgroup — optgroups never nest inside a select
        ("<body><select><optgroup><optgroup>x</select></body>",
         "<body><select><optgroup></optgroup><optgroup>x</optgroup>"
         "</select></body>"),
        ("<body><select><optgroup><option>a<optgroup><option>b</select></body>",
         "<body><select><optgroup><option>a</option></optgroup>"
         "<optgroup><option>b</option></optgroup></select></body>"),
        # spec "in body" optgroup/option: ONLY an open option is popped —
        # outside a select a second <optgroup> nests inside the first
        ("<body><optgroup><option>a<optgroup><option>b</body>",
         "<body><optgroup><option>a</option>"
         "<optgroup><option>b</option></optgroup></optgroup></body>"),
        # <image> start tag is renamed to img (in body rule)
        ("<body><p><image src=x></body>",
         '<body><p><img src="x"></p></body>'),
        # in table: <input type=hidden> is NOT foster-parented (spec
        # exception); any other input is
        ("<body><table><input type=hidden></table></body>",
         '<body><table><input type="hidden"></table></body>'),
        ("<body><table><input type=text></table></body>",
         '<body><input type="text"><table></table></body>'),
        # a second <form> is ignored while the form pointer is set
        ("<body><form><div><form><input></div></form></body>",
         "<body><form><div><input></div></form></body>"),
        # foreign attribute adjustment: xml:/xlink: prefixes round-trip,
        # ordinary attributes stay bare
        ("<body><svg xml:lang=en xlink:href=x foo=1></svg></body>",
         '<body><svg xml:lang="en" xlink:href="x" foo="1"></svg></body>'),
        # MathML definitionURL case adjustment
        ("<body><math definitionurl=x></math></body>",
         '<body><math definitionURL="x"></math></body>'),
        # annotation-xml: text/html and application/xhtml+xml are HTML
        # integration points (div stays inside); anything else breaks out
        ("<body><math><annotation-xml encoding='text/html'><div>x</div>"
         "</annotation-xml></math></body>",
         '<body><math><annotation-xml encoding="text/html"><div>x</div>'
         "</annotation-xml></math></body>"),
        ("<body><math><annotation-xml><div>x</div></annotation-xml></math>"
         "</body>",
         "<body><math><annotation-xml></annotation-xml></math>"
         "<div>x</div></body>"),
        # svg desc/title are HTML integration points
        ("<body><svg><desc><div>x</div></desc></svg></body>",
         "<body><svg><desc><div>x</div></desc></svg></body>"),
        ("<body><svg><title><div>x</div></title></svg></body>",
         "<body><svg><title><div>x</div></title></svg></body>"),
        # numeric reference corners: out-of-range and NUL become U+FFFD,
        # C1 controls remap through the windows-1252 table
        ("<body>&#x110000;&#0;</body>", "<body>��</body>"),
        ("<body>&#x80;&#x9F;</body>", "<body>€Ÿ</body>"),
        # named references: longest-prefix match without a semicolon
        ("<body>&notin; &not;x &nota</body>",
         "<body>∉ ¬x ¬a</body>"),
        ("<body>&AMP; &amp &LT;x</body>", "<body>&amp; &amp; &lt;x</body>"),
        # listing skips a leading newline like pre
        ("<body><listing>\nX</listing></body>",
         "<body><listing>X</listing></body>"),
        # a <button> start tag closes a button in scope (never nests)
        ("<body><button>a<button>b</body>",
         "<body><button>a</button><button>b</button></body>"),
        # the cell marker keeps the outer <a> from reconstructing inside
        # the cell; the inner <a> is its own formatting entry
        ("<body><a href=1>x<table><tr><td><a href=2>y</table></body>",
         '<body><a href="1">x<table><tbody><tr><td><a href="2">y</a>'
         "</td></tr></tbody></table></a></body>"),
        # solidus mid-tag restarts attribute parsing; duplicate attribute
        # names keep the first value
        ("<body><a/ b>x</body>", '<body><a b="">x</a></body>'),
        ("<body><a b=1 b=2>x</body>", '<body><a b="1">x</a></body>'),
        # unquoted attribute values may carry '='
        ("<body><div a=b=c></div></body>", '<body><div a="b=c"></div></body>'),
        # col outside a table/colgroup context is ignored
        ("<body><col>x</body>", "<body>x</body>"),
        ("<body><table><colgroup><col span=2><td>x</table></body>",
         '<body><table><colgroup><col span="2"></colgroup>'
         "<tbody><tr><td>x</td></tr></tbody></table></body>"),
        # a <tr> token while a caption is open closes the caption (implied
        # end tags + pop), a second <caption> likewise
        ("<body><table><caption><div>x<tr><td>y</table></body>",
         "<body><table><caption><div>x</div></caption>"
         "<tbody><tr><td>y</td></tr></tbody></table></body>"),
        ("<body><table><caption>x<caption>y</table></body>",
         "<body><table><caption>x</caption><caption>y</caption>"
         "</table></body>"),
        # bogus comments (<! and <?) become real comment nodes in body
        ("<body>x<!y>z</body>", "<body>x<!--y-->z</body>"),
        # empty end tag is dropped
        ("<body></>x</body>", "<body>x</body>"),
        # CR and CRLF normalize to LF
        ("<body>a\rb\r\nc</body>", "<body>a\nb\nc</body>"),
        # form feed is tag whitespace
        ("<body><div\fclass=x>y</div></body>", '<body><div class="x">y</div></body>'),
    ],
)
def test_probe_pins_pass9(source, expected):
    assert body_html(source) == expected


def test_select_optgroup_never_nests():
    # regression for the in-select/in-body optgroup split: before the fix
    # the select plan nested sibling optgroups and the body plan split
    # nested ones — each mode borrowed the other's rule
    assert body_html("<body><select><optgroup>a<optgroup>b</select></body>") == (
        "<body><select><optgroup>a</optgroup><optgroup>b</optgroup>"
        "</select></body>"
    )


def test_document_level_comments_not_serialized():
    # reference parity (util.js:325-332): serialize() writes the doctype
    # plus documentElement.outerHTML — comments that are CHILDREN OF THE
    # DOCUMENT (before <html>, or after </html> in after-after-body mode)
    # never reach the output, while comments inside <html> do
    from mhtml_to_html_ray.kernel.dom import parse_dom

    assert parse_dom("<!--before--><html><body>x", "text/html").serialize() == (
        "<html><head></head><body>x</body></html>"
    )
    assert "<!--in-->" in parse_dom("<html><body>x<!--in-->", "text/html").serialize()


def test_unwritable_attribute_names_dropped():
    # reference parity (dom-parser-node.js INVALID_TAG_NAME_REGEXP):
    # attribute names carrying " ' > / or = cannot be re-serialized and
    # are dropped; names with other oddities (e.g. '<') are kept verbatim
    assert body_html("<body><div a\">x</body>") == "<body><div>x</div></body>"
    assert body_html("<body><div =x>y</body>") == "<body><div>y</div></body>"
    assert body_html("<body><div a<b>x</body>") == '<body><div a<b="">x</div></body>'


# ---------------------------------------------------------------------------
# probe pass 10: Noah's Ark clause, MathML text integration points, RAWTEXT
# coverage, doctype round-trips, table-section ordering


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # Noah's Ark clause: pushing a 4th identical <b> evicts the
        # earliest entry, so the last <p> reconstructs only three
        ("<body><p><b>1<p><b>2<p><b>3<p><b>4<p>x</body>",
         "<body><p><b>1</b></p><p><b><b>2</b></b></p>"
         "<p><b><b><b>3</b></b></b></p><p><b><b><b><b>4</b></b></b></b></p>"
         "<p><b><b><b>x</b></b></b></p></body>"),
        # mtext/ms are MathML text integration points: children parse as HTML
        ("<body><math><mtext><p>x</p></mtext></math></body>",
         "<body><math><mtext><p>x</p></mtext></math></body>"),
        ("<body><math><ms><b>x</b></ms></math></body>",
         "<body><math><ms><b>x</b></ms></math></body>"),
        # basefont/bgsound are head-insertable voids
        ("<basefont><bgsound><link>x",
         "<basefont><bgsound><link>x"),
        # table sections appear in token order (no reordering), each closed
        # by the next section start
        ("<body><table><tbody><tr><td>a<tfoot><tr><td>b<thead></table></body>",
         "<body><table><tbody><tr><td>a</td></tr></tbody>"
         "<tfoot><tr><td>b</td></tr></tfoot><thead></thead></table></body>"),
        # stray end tags after </table> are ignored
        ("<body><table><tr><td>a</table></td>x</body>",
         "<body><table><tbody><tr><td>a</td></tr></tbody></table>x</body>"),
        # an open <b> wraps a table and survives it (cell marker scopes the
        # inner <b> to the cell)
        ("<body><b>1<table><tr><td><b>2</table>3</body>",
         "<body><b>1<table><tbody><tr><td><b>2</b></td></tr></tbody>"
         "</table>3</b></body>"),
        # EOF inside a comment keeps the accumulated data
        ("<body>x<!--unterminated", "<body>x<!--unterminated--></body>"),
        ("<body><wbr>x<keygen>y</body>", "<body><wbr>x<keygen>y</body>"),
    ],
)
def test_probe_pins_pass10(source, expected):
    # pass-10 cases where the whole serialization matters use parse_dom below
    if source.startswith("<basefont"):
        from mhtml_to_html_ray.kernel.dom import parse_dom
        assert parse_dom(source, "text/html").serialize() == (
            "<html><head><basefont><bgsound><link></head>"
            "<body>x</body></html>"
        )
    else:
        assert body_html(source) == expected


def test_rawtext_elements_hold_single_text_node():
    # noembed/iframe/noframes switch the tokenizer to RAWTEXT: markup
    # inside them is literal text, not elements
    from mhtml_to_html_ray.kernel.dom import parse_dom

    for tag in ("noembed", "iframe", "noframes"):
        doc = parse_dom(f"<{tag}><b>x</b></{tag}>", "text/html").document
        el = doc.get_elements_by_tag_name(tag)[0]
        kinds = [type(c).__name__ for c in el.child_nodes]
        assert kinds == ["Text"], (tag, kinds)


def test_doctype_public_system_roundtrip():
    from mhtml_to_html_ray.kernel.dom import parse_dom

    src = ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
           '"http://www.w3.org/TR/html4/strict.dtd"><html><body>x')
    assert parse_dom(src, "text/html").serialize().startswith(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd">\n<html>'
    )
    # reference parity (util.js serializeDocType): a SYSTEM-only doctype is
    # written WITHOUT the SYSTEM keyword — the systemId is quoted bare
    src = '<!DOCTYPE html SYSTEM "about:legacy-compat"><html><body>x'
    assert parse_dom(src, "text/html").serialize().startswith(
        '<!DOCTYPE html "about:legacy-compat">\n<html>'
    )


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # adoption agency: formatting elements reconstructed after </b>
        ("<body><b><em><i>x</b>y</body>",
         "<body><b><em><i>x</i></em></b><em><i>y</i></em></body>"),
        # a-in-a through b (html5lib adoption01 family)
        ("<body><a><b><a>x</body>",
         "<body><a><b></b></a><b><a>x</a></b></body>"),
        # block-boundary adoption: the furthest block moves to the common
        # ancestor and receives a clone of <b>; following text stays in it
        ("<body><div><b><div>x</b>y</body>",
         "<body><div><b></b><div><b>x</b>y</div></div></body>"),
        # deep cite/i chain (adoption01.dat final case shape)
        ("<body><cite><b><cite><i><cite><i><cite><i><div>x</b>y</body>",
         "<body><cite><b><cite><i><cite><i><cite><i></i></cite></i>"
         "</cite></i></cite></b><i><i><div><b>x</b>y</div></i></i>"
         "</cite></body>"),
        # </tbody> in a cell closes cell+row+section; trailing text fosters
        ("<body><table><td></tbody>a</body>",
         "<body>a<table><tbody><tr><td></td></tr></tbody></table></body>"),
        ("<body><svg><g></g><g>y</svg></body>",
         "<body><svg><g></g><g>y</g></svg></body>"),
        # attribute entities decode at parse; serialization escapes only
        # & / nbsp / quote (reference ATTRIBUTE_ESCAPE_REGEXP) — '<' raw
        ('<body><input value="&lt;&amp;"></body>',
         '<body><input value="<&amp;"></body>'),
        ('<body><div title="a&#10;b"></div></body>',
         '<body><div title="a\nb"></div></body>'),
        ('<body><div title="a&nbsp;b"></div></body>',
         '<body><div title="a&nbsp;b"></div></body>'),
        ("<body><p>a&nbsp;b</p></body>", "<body><p>a&nbsp;b</p></body>"),
        # script double-escaped state: <!-- <script> suspends the close tag;
        # serializer writes </ as <\/ inside script (reference escapeTextNode)
        ("<body><script><!-- <script> a </script> b</script></body>",
         "<body><script><!-- <script> a <\\/script> b</script></body>"),
        ("<body><script>a<!--b--></script></body>",
         "<body><script>a<!--b--></script></body>"),
    ],
)
def test_probe_pins_pass10_adoption_entities(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # whitespace is IGNORED before a <head> exists (initial /
        # before-html / before-head modes)
        (" x", "<html><head></head><body>x</body></html>"),
        ("<html> <head></head>x", "<html><head></head><body>x</body></html>"),
        # between </head> and <body>, whitespace is a child of <html>
        ("<head></head> x", "<html><head></head> <body>x</body></html>"),
        ("<head></head>   ", "<html><head></head>   <body></body></html>"),
        # inside an open <head>, whitespace stays in the head but the
        # first non-whitespace character pops it and opens the body
        ("<head> x", "<html><head> </head><body>x</body></html>"),
        ("<head>x", "<html><head></head><body>x</body></html>"),
        ("<head>x</head>y", "<html><head></head><body>xy</body></html>"),
        # after the forced pop, metadata tags follow the in-body rules
        # (inserted at the current position, i.e. the body)
        ("<head><meta>x<link>",
         "<html><head><meta></head><body>x<link></body></html>"),
        # template content keeps its own insertion point
        ("<head><template>x</template>y",
         "<html><head><template>x</template></head><body>y</body></html>"),
    ],
)
def test_pre_body_whitespace_modes(source, expected):
    from mhtml_to_html_ray.kernel.dom import parse_dom

    assert parse_dom(source, "text/html").serialize() == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # whitespace and hidden inputs leave frameset-ok set: a following
        # <frameset> replaces the body (spec in-body frameset rule)
        ("<body> <frameset>x</frameset>",
         "<html><head></head><frameset></frameset></html>"),
        ("<input type=hidden><frameset>",
         "<html><head></head><frameset></frameset></html>"),
        # any other input / br / text flips frameset-ok — frameset ignored
        ("<input><frameset>",
         "<html><head></head><body><input></body></html>"),
        ("<br><frameset>",
         "<html><head></head><body><br></body></html>"),
        ("<body>t<frameset>",
         "<html><head></head><body>t</body></html>"),
    ],
)
def test_frameset_ok_flag(source, expected):
    from mhtml_to_html_ray.kernel.dom import parse_dom

    assert parse_dom(source, "text/html").serialize() == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # in select: non-control start tags (svg here) are ignored outright,
        # their text content still lands in the select
        ("<body><select><svg><g>x</g></svg></select></body>",
         "<body><select>x</select></body>"),
        # a <form> inside a template does not set the form pointer
        ("<body><template><form>x</form></template><form>y</form></body>",
         "<body><template><form>x</form></template><form>y</form></body>"),
        ("<body><select><template><option>a</template><option>b</select></body>",
         "<body><select><template><option>a</option></template>"
         "<option>b</option></select></body>"),
    ],
)
def test_select_template_gates(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # td/th/tr/section end tags use TABLE scope: a nested table hides
        # the target — the token is ignored, and following text fosters
        # into the CELL (before the inner table), not out of the outer one
        ("<body><table><td><table></td>y</body>",
         "<body><table><tbody><tr><td>y<table></table></td></tr></tbody>"
         "</table></body>"),
        ("<body><table><td><table></tr>z</body>",
         "<body><table><tbody><tr><td>z<table></table></td></tr></tbody>"
         "</table></body>"),
        # an open template hides </table> and </td> (template scope)
        ("<body><table><template></table>x</template>y</body>",
         "<body>y<table><template>x</template></table></body>"),
        ("<body><table><td><template></td>a</template>b</body>",
         "<body><table><tbody><tr><td><template>a</template>b</td></tr>"
         "</tbody></table></body>"),
        # unhidden closes keep working: row/cell end tags, table end from
        # inside a cell, caption close by </table>
        ("<body><table><td>a<td>b</td>c</body>",
         "<body>c<table><tbody><tr><td>a</td><td>b</td></tr></tbody>"
         "</table></body>"),
        ("<body><table><td>x</table>done</body>",
         "<body><table><tbody><tr><td>x</td></tr></tbody></table>done</body>"),
        ("<body><table><caption>x</table>after</body>",
         "<body><table><caption>x</caption></table>after</body>"),
    ],
)
def test_table_scope_end_tags(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # caption pushes a formatting marker: <i> opened inside does not
        # reconstruct after; fostered y merges into the open outer <b>
        ("<body><b>o<table><caption><i>x</caption>y</body>",
         "<body><b>oy<table><caption><i>x</i></caption></table></b></body>"),
        # </table> from inside a caption closes the caption first
        ("<body><table><caption><b>x</table>z</body>",
         "<body><table><caption><b>x</b></caption></table>z</body>"),
        # li start under an open table: the outer li is hidden by the
        # special-element stop, the new li fosters into it before the table
        ("<body><ul><li>a<table><li>b</table>c</body>",
         "<body><ul><li>a<li>b</li><table></table>c</li></ul></body>"),
        # in-table <form> inserts-and-pops; </form> clears the pointer so
        # a second form is allowed
        ("<body><table><form></form><form><td>x</body>",
         "<body><table><form></form><form></form>"
         "<tbody><tr><td>x</td></tr></tbody></table></body>"),
        # template content accepts orphan cells at EOF
        ("<body><template><td>x</body>",
         "<body><template><td>x</td></template></body>"),
        # in column group, text pops the colgroup and fosters; a later
        # <col> opens a fresh colgroup
        ("<body><table><colgroup>x<col></body>",
         "<body>x<table><colgroup></colgroup><colgroup><col></colgroup>"
         "</table></body>"),
        # caption in select without an open table is ignored
        ("<body><select><caption></body>", "<body><select></select></body>"),
        # fostered <p> nests into the outer p (button scope hidden by table)
        ("<body><p><table><p>x</body>",
         "<body><p><p>x</p><table></table></p></body>"),
    ],
)
def test_probe_pins_pass14(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # a slash inside an unquoted attribute value is value text; after
        # whitespace it is the (ignored) self-closing flag
        ("<body><div a=b/>x</body>", '<body><div a="b/">x</div></body>'),
        ("<body><div a=b />x</body>", '<body><div a="b">x</div></body>'),
        # comment termination variants: empty, abrupt (<!--->, <!-->),
        # trailing dash, inner double dash, nested opener
        ("<body>x<!---->y</body>", "<body>x<!---->y</body>"),
        ("<body>x<!--->y</body>", "<body>x<!---->y</body>"),
        ("<body>x<!-->y</body>", "<body>x<!---->y</body>"),
        ("<body>x<!-- --->y</body>", "<body>x<!-- --->y</body>"),
        ("<body>x<!-- a--b -->y</body>", "<body>x<!-- a--b -->y</body>"),
        ("<body>x<!--a<!--b-->y</body>", "<body>x<!--a<!--b-->y</body>"),
        # malformed references stay literal text; '<' joins the tag name
        # (so a<b</body> opens a 'b<' element whose '/' restarts attribute
        # parsing — 'body' becomes an attribute)
        ("<body>&#xg; &#; & &x <3 a<b</body>",
         '<body>&amp;#xg; &amp;#; &amp; &amp;x &lt;3 a<b< body=""></b<></body>'),
        # </ + non-letter opens a bogus comment
        ("<body></ x>y</body>", "<body><!-- x-->y</body>"),
        # NUL bytes: U+FFFD inside tag/attribute names and values,
        # dropped from ordinary body text
        ("<body><di\x00v>x</body>", "<body><di�v>x</di�v></body>"),
        ("<body><div a\x00b=1>x</body>",
         '<body><div a�b="1">x</div></body>'),
        ('<body><div a="b\x00">x</body>',
         '<body><div a="b�">x</div></body>'),
        ("<body>x\x00y</body>", "<body>xy</body>"),
    ],
)
def test_probe_pins_pass15_tokenizer(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # an IGNORED raw-container start tag must not switch the tokenizer
        # (parse5 switches only when the element is inserted): in frameset
        # modes the content re-parses as markup and is itself ignored —
        # no body text node ever appears next to a frameset
        ("<frameset></frameset><style>a{}</style><noframes>n</noframes>",
         "<html><head></head><frameset></frameset>"
         "<noframes>n</noframes></html>"),
        ("<frameset><style>x</style><frame></frameset>",
         "<html><head></head><frameset><frame></frameset></html>"),
        ("<frameset></frameset><textarea>t</textarea>",
         "<html><head></head><frameset></frameset></html>"),
    ],
)
def test_ignored_raw_containers_in_frameset(source, expected):
    from mhtml_to_html_ray.kernel.dom import parse_dom

    assert parse_dom(source, "text/html").serialize() == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # in select, style/title/xmp are NOT in the allow-list (parse5
        # startTagInSelect): the tag is ignored, the tokenizer stays in
        # data state, and the content lands in the select as text
        ("<body><select><style>s</style>x</select></body>",
         "<body><select>sx</select></body>"),
        ("<body><select><title>t</title>y</select></body>",
         "<body><select>ty</select></body>"),
        ("<body><select><xmp>z</xmp>w</select></body>",
         "<body><select>zw</select></body>"),
        # script stays allowed (spec in-select handles it)
        ("<body><select><script>s</script>x</select></body>",
         "<body><select><script>s</script>x</select></body>"),
    ],
)
def test_ignored_raw_containers_in_select(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # with an explicitly open <head>, any start tag the head cannot
        # hold pops it (in-head anything-else) — nothing non-metadata is
        # ever appended inside the head
        ("<head><div>x",
         "<html><head></head><body><div>x</div></body></html>"),
        ("<head><wbr>x",
         "<html><head></head><body><wbr>x</body></html>"),
        ("<head><svg>s</svg>",
         "<html><head></head><body><svg>s</svg></body></html>"),
        ("<head><table><td>t",
         "<html><head></head><body><table><tbody><tr><td>t</td></tr>"
         "</tbody></table></body></html>"),
        # in-head end tags: body/html/br act as anything-else (<head></br>x
        # puts the br quirk in the body); any other end tag is IGNORED —
        # the </p> empty-insert quirk never fires inside the head
        ("<head></br>x",
         "<html><head></head><body><br>x</body></html>"),
        ("<head></p>x",
         "<html><head></head><body>x</body></html>"),
        ("<head></button>x",
         "<html><head></head><body>x</body></html>"),
        # metadata stays in the head; template keeps its own content
        ("<head><meta>x",
         "<html><head><meta></head><body>x</body></html>"),
        ("<head><template><div>d</div></template>m",
         "<html><head><template><div>d</div></template></head>"
         "<body>m</body></html>"),
    ],
)
def test_open_head_non_head_tokens(source, expected):
    from mhtml_to_html_ray.kernel.dom import parse_dom

    assert parse_dom(source, "text/html").serialize() == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # foreign elements that HAPPEN to carry table names are ordinary
        # foreign containers: no table-context clearing, no foster
        # parenting, no implied-end sibling rules
        ("<body><table><svg><math><colgroup>a<caption>b</body>",
         "<body><svg><math><colgroup>a<caption>b</caption></colgroup>"
         "</math></svg><table></table></body>"),
        ("<body><table><tr><svg><tr>z</body>",
         "<body><svg><tr>z</tr></svg><table><tbody><tr></tr></tbody>"
         "</table></body>"),
        ("<body><svg><option>a<option>b</svg></body>",
         "<body><svg><option>a<option>b</option></option></svg></body>"),
        ("<body><svg><td>a<td>b</svg></body>",
         "<body><svg><td>a<td>b</td></td></svg></body>"),
        # breakout names (h1, li) still leave foreign content and follow
        # the HTML implied-end rules; integration points parse as HTML
        ("<body><svg><h1>x<h2>y</svg></body>",
         "<body><svg></svg><h1>x</h1><h2>y</h2></body>"),
        ("<body><svg><desc><option>a<option>b</desc></svg></body>",
         "<body><svg><desc><option>a</option><option>b</option></desc>"
         "</svg></body>"),
    ],
)
def test_foreign_table_names_are_plain_foreign(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # formatting reconstructs at select/svg/math/option START tags (the
        # in-body rules), so a closed-but-active <b>/<a> wraps the subtree
        ("<body><p><b>t</p><select>u</select>v</body>",
         "<body><p><b>t</b></p><b><select>u</select>v</b></body>"),
        ("<body><p><b>t</p><svg>s</svg></body>",
         "<body><p><b>t</b></p><b><svg>s</svg></b></body>"),
        ("<body><p><b>t</p><math>m</math></body>",
         "<body><p><b>t</b></p><b><math>m</math></b></body>"),
        ("<body><p><b>t</p><option>u</body>",
         "<body><p><b>t</b></p><b><option>u</option></b></body>"),
        ("<body><p><a href=x></p><select>z</body>",
         '<body><p><a href="x"></a></p><a href="x"><select>z</select></a>'
         "</body>"),
        # but NEVER inside an open select: characters insert plainly and
        # any other end tag is ignored (no adoption, no reconstruction)
        ("<body><b><b><select></b></body>",
         "<body><b><b><select></select></b></b></body>"),
        ("<body><select>a</option>b</select>c</body>",
         "<body><select>ab</select>c</body>"),
        ("<body><select>a</body>b</body>",
         "<body><select>ab</select></body>"),
        # "in select in table": a table-family end tag with a real table
        # open pops the select and closes the table element
        ("<body><table><td><select>y</table>z</body>",
         "<body><table><tbody><tr><td><select>y</select></td></tr>"
         "</tbody></table>z</body>"),
        # foreign text never reconstructs (the <b> clone goes around the
        # svg root at its start tag, not around the text inside)
        ("<body><b>1<table><svg>s</svg><td>2</body>",
         "<body><b>1<svg>s</svg><table><tbody><tr><td>2</td></tr>"
         "</tbody></table></b></body>"),
    ],
)
def test_reconstruction_context_gates(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # a FOREIGN (svg-namespace) select never triggers "in select":
        # integration-point content under it parses as HTML and its end
        # tags close normally
        ("<body><svg><select><foreignObject>y</foreignObject></svg>z</body>",
         "<body><svg><select><foreignobject>y</foreignobject></select>"
         "</svg>z</body>"),
        # suppress_raw must be consumed before the tokenizer's foreign
        # check: a suppression requested under an integration point must
        # not leak onto a later textarea
        ("<body><svg><select><foreignObject><style>.a{}</style>"
         "</foreignObject></svg></select><textarea><b>t</b></textarea></body>",
         "<body><svg><select><foreignobject><style>.a{}</style>"
         "</foreignobject></select></svg>"
         "<textarea>&lt;b&gt;t&lt;/b&gt;</textarea></body>"),
        # select scope terminates at template: inside the template the
        # in-select gates are OFF (div inserts) and </select> is hidden
        ("<body><select><template><div>x</div></template></select></body>",
         "<body><select><template><div>x</div></template></select></body>"),
        ("<body><select><template>a</select>x</body>",
         "<body><select><template>ax</template></select></body>"),
    ],
)
def test_select_scope_and_foreign_select(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    ("source", "expected"),
    [
        # spec "any other end tag": a SPECIAL-category element between the
        # current node and the match ignores the token — span/abbr/option/
        # optgroup/rb never close through an open div/p
        ("<body><span><div>x</span>y</body>",
         "<body><span><div>xy</div></span></body>"),
        ("<body><abbr><p>x</abbr>y</body>",
         "<body><abbr><p>xy</p></abbr></body>"),
        ("<body><option><div>x</option>y</body>",
         "<body><option><div>xy</div></option></body>"),
        ("<body><optgroup><div>x</optgroup>y</body>",
         "<body><optgroup><div>xy</div></optgroup></body>"),
        ("<body><ruby><rb><div>x</rb>y</body>",
         "<body><ruby><rb><div>xy</div></rb></ruby></body>"),
        # non-special separators still close through (b is formatting)
        ("<body><option><b>x</option>y</body>",
         "<body><option><b>x</b></option><b>y</b></body>"),
        # own-rule end tags keep popping through non-boundaries
        ("<body><li><div>x</li>y</body>",
         "<body><li><div>x</div></li>y</body>"),
        ("<body><button><div>x</button>y</body>",
         "<body><button><div>x</div></button>y</body>"),
        # heading end tags close the nearest open heading of ANY rank
        ("<body><h1>x</h2>y</body>", "<body><h1>x</h1>y</body>"),
        ("<body><h1><div>x</h2>y</body>",
         "<body><h1><div>x</div></h1>y</body>"),
    ],
)
def test_any_other_end_tag_special_stop(source, expected):
    assert body_html(source) == expected


@pytest.mark.parametrize(
    "source, expected",
    [
        # spec "in body" </form> (no template open): the POINTED form is
        # REMOVED from the stack in place — elements above it stay open,
        # so x keeps flowing into the div (parse5 does the same; the old
        # pop-to-form closed the div too)
        ("<body><form><div></form>x</body>",
         "<body><form><div>x</div></form></body>"),
        # ... but implied-end-tag elements (p, li, ...) above the form DO
        # pop first ("generate implied end tags" precedes the removal)
        ("<body><form><p><li></form>x</body>",
         "<body><form><p><li></li></p></form>x</body>"),
        # a table boundary hides the pointed form from scope: the token is
        # ignored BUT the pointer still nulls, so the next <form> in table
        # inserts (insert-and-pop) instead of being pointer-ignored
        ("<body><form><table></form><form><tr><td>x</table></body>",
         "<body><form><table><form></form><tbody><tr><td>x</td></tr>"
         "</tbody></table></form></body>"),
        # a form inside template content does NOT set the form element
        # pointer: a later top-level <form> still inserts
        ('<body><template><form a=1>x</form></template><form b=2>y</body>',
         '<body><template><form a="1">x</form></template>'
         '<form b="2">y</form></body>'),
        # in-template the form token is plain in-body (mode is "in
        # template", not "in table"), so it nests normally
        ("<body><table><template><form>z</template></table></body>",
         "<body><table><template><form>z</form></template></table></body>"),
        # stray </form> with a null pointer is ignored outright
        ("<body></form>x<form>y</body>",
         "<body>x<form>y</form></body>"),
        # "in table" <form> with a template on the stack is ignored
        # OUTRIGHT (no insert-and-pop): dom-parser parity with parse5's
        # in-table form rule
        ("<body><template><table><form></table>t</template></body>",
         "<body><template><table></table>t</template></body>"),
    ],
)
def test_form_pointer_spec_semantics(source, expected):
    """Round-5 tranche: form element pointer semantics across tables and
    templates (WHATWG 13.2.6.4.7 <form>/</form>, 13.2.6.4.9 in-table
    <form>); found by the structured soak's new composite tokens."""
    assert body_html(source) == expected
