"""HTML DOM kernel: a lightweight html5-shaped parser plus a serializer that
replicates the reference's custom serializer byte-for-byte
(`/root/reference/lib/dom-parser-node.js`).

The parser is NOT a full HTML5 tree-construction implementation — it covers
the constructs the reference's own test corpus exercises (implicit
html/head/body, raw-text elements, RCDATA, comments, doctypes, entities,
templates with content fragments, simple auto-closing) plus the conformance
tranches the wild web hits: adoption-agency reconstruction, table foster
parenting with implied tbody/tr/colgroup and cell/caption formatting
markers, scoped implied end tags, select scoping, frameset modes, and
foreign content with SVG/MathML name adjustment, integration points and
breakout — while keeping the node API surface the convert walk needs
(dom-parser-node.js:125-261).

The serializer is a faithful port of dom-parser-node.js:263-371:
* void tags, lowercased tag names, attributes double-quoted
* text escaped per parent element (raw-text parents skip entity escaping;
  style/script text gets ``</`` → ``<\\/`` with an idempotence guard)
* attributes with unwritable names dropped gapless
* doctype reconstructed on its own line before the root element
"""

from __future__ import annotations

import re

VOID_TAGS = frozenset(
    "area base basefont bgsound br col command embed frame hr img input "
    "keygen link meta param source track wbr".split()
)
RAW_TEXT_TAGS = frozenset(
    "style script xmp iframe noembed noframes plaintext noscript".split()
)
# tokenizer-level raw containers (spec RAWTEXT + script data); RCDATA decodes entities
_TOKENIZER_RAW = frozenset(
    "style script xmp iframe noembed noframes noscript".split()
)
_TOKENIZER_RCDATA = frozenset(("title", "textarea"))
_HEAD_TAGS = frozenset(
    "base basefont bgsound link meta title style script template noscript noframes".split()
)
_P_CLOSERS = frozenset(
    """address article aside blockquote center details dialog dir div dl
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr
    listing main menu nav ol p plaintext pre search section summary table ul
    xmp""".split()
)

_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
_TABLE_STRUCTURE_TAGS = frozenset(
    ("caption", "colgroup", "col", "tbody", "thead", "tfoot", "tr", "td", "th")
)
# start tags that do NOT reconstruct active formatting before insertion (the
# spec gives these their own insertion rules without the reconstruct step)
_NO_RECONSTRUCT_TAGS = (_P_CLOSERS | frozenset(
    ("html", "head", "body", "frameset", "frame", "caption", "colgroup",
     "col", "tbody", "thead", "tfoot", "tr", "td", "th", "li", "dd", "dt",
     "script", "style", "template", "title",
     "meta", "link", "base", "noscript", "noframes", "textarea")
    # xmp is the one p-closer whose spec rule DOES reconstruct active
    # formatting (close p → reconstruct → raw text); select/svg/math and
    # (outside a select) option/optgroup all reconstruct per their in-body
    # rules — a closed-but-active <b> wraps the new select/svg subtree
)) - frozenset(("xmp",))
_P_TARGET = frozenset(("p",))
# HTML spec "tree construction dispatcher": MathML text integration points —
# tokens at these parse as HTML unless the tag is mglyph/malignmark
_MATHML_TEXT_INTEGRATION = frozenset(("mi", "mo", "mn", "ms", "mtext"))
# HTML spec foreign-content "breakout" start tags: these pop the open foreign
# elements and reprocess in the HTML namespace (plus <font> with
# color/face/size, handled inline)
_BREAKOUT_TAGS = frozenset(
    """b big blockquote body br center code dd div dl dt em embed h1 h2 h3 h4
    h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s small span
    strong strike sub sup table tt u ul var""".split()
)
_MATHML_ATTR_ADJUST = {"definitionurl": "definitionURL"}
# formatting-marker sentinel pushed onto the active-formatting list at
# cell/caption/template boundaries (HTML spec "insert a marker"); clears
# truncate to the last marker instead of wiping pre-table formatting
_AF_MARKER = object()
# elements at which the spec "inserts a marker" onto the active-formatting
# list (formatting opened inside never reconstructs outside them)
_MARKER_TAGS = frozenset(
    ("td", "th", "caption", "template", "applet", "marquee", "object"))
# start tags that flip the spec's frameset-ok flag to "not ok" ("in body")
_FRAMESET_NOT_OK_TAGS = frozenset(
    """pre listing li dd dt button applet marquee object table area br embed
    img keygen wbr input hr textarea xmp iframe select""".split()
)
# the spec's "button scope" / "list item scope" boundaries (elements whose
# presence between the target and the top blocks the implied end tag)
_BUTTON_SCOPE_BOUNDARY = frozenset(
    ("button", "html", "table", "td", "th", "caption", "applet", "marquee",
     "object", "template", "select")
)
# the spec's li/dd/dt auto-close loop stops at ANY special element except
# address/div/p ("in body" <li>/<dd>/<dt> start-tag rules) — a <dl> or
# <blockquote> wrapper keeps the inner item nested (_LI_DD_DT_STOP, defined
# after _SPECIAL_TAGS below)
# the spec's default "has an element in scope" boundary set
_DEFAULT_SCOPE_BOUNDARY = frozenset(
    ("html", "table", "td", "th", "caption", "applet", "marquee", "object",
     "template")
)

_JAVASCRIPT_MIME_TYPE = "text/javascript"
_TEXT_ESCAPE_RE = re.compile(r"[& <>]")
_TEXT_ESCAPE_ENTITIES = {"&": "&amp;", " ": "&nbsp;", "<": "&lt;", ">": "&gt;"}
_ATTRIBUTE_ESCAPE_RE = re.compile(r'[& "]')
_ATTRIBUTE_ESCAPE_ENTITIES = {"&": "&amp;", " ": "&nbsp;", '"': "&quot;"}
_INVALID_ATTR_NAME_RE = re.compile(r"[\"'>/=]")
_CLOSING_TAG_MARKER_RE = re.compile(r"</", re.IGNORECASE)
# a marker already carrying its backslash is left alone: serializing twice
# writes the same text as serializing once (dom-parser-node.js:70-75)
_SELF_CLOSING_TAG_MARKER_RE = re.compile(r"(?<!\\)/>", re.IGNORECASE)


class Node:
    __slots__ = ("parent_node",)
    node_name = "#node"
    child_nodes: list | None = None

    def __init__(self) -> None:
        self.parent_node = None

    # --- tree manipulation (dom-parser-node.js:197-235) ---
    def remove(self) -> None:
        parent = self.parent_node
        if parent is not None and self in parent.child_nodes:
            parent.child_nodes.remove(self)
            self.parent_node = None

    def replace_with(self, *nodes: "Node") -> None:
        parent = self.parent_node
        if parent is not None and self in parent.child_nodes:
            index = parent.child_nodes.index(self)
            parent.child_nodes[index : index + 1] = list(nodes)
            for node in nodes:
                node.parent_node = parent
            self.parent_node = None

    def after(self, *nodes: "Node") -> None:
        parent = self.parent_node
        if parent is not None and self in parent.child_nodes:
            index = parent.child_nodes.index(self)
            parent.child_nodes[index + 1 : index + 1] = list(nodes)
            for node in nodes:
                node.parent_node = parent


class Text(Node):
    __slots__ = ("value",)
    node_name = "#text"

    def __init__(self, value: str) -> None:
        super().__init__()
        self.value = value


class Comment(Node):
    __slots__ = ("data",)
    node_name = "#comment"

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data


class DocumentType(Node):
    __slots__ = ("name", "public_id", "system_id")
    node_name = "#documentType"

    def __init__(self, name: str, public_id: str = "", system_id: str = "") -> None:
        super().__init__()
        self.name = name
        self.public_id = public_id
        self.system_id = system_id


class _ParentNode(Node):
    __slots__ = ("child_nodes",)

    def __init__(self) -> None:
        super().__init__()
        self.child_nodes: list[Node] = []

    def append_child(self, child: Node) -> Node:
        self.child_nodes.append(child)
        child.parent_node = self
        return child

    def prepend(self, *nodes: Node) -> None:
        self.child_nodes[0:0] = list(nodes)
        for node in nodes:
            node.parent_node = self

    @property
    def first_child(self) -> Node | None:
        return self.child_nodes[0] if self.child_nodes else None

    def get_elements_by_tag_name(self, tag_name: str) -> list["Element"]:
        found: list[Element] = []
        tag_name = tag_name.lower()
        # childNodes only — parse5 templates keep their content OUT of
        # childNodes, so the reference's getElementsByTagName
        # (dom-parser-node.js:237-248) never sees inside <template>; the
        # convert walk reaches template content explicitly instead.
        for node in self.child_nodes:
            if isinstance(node, Element):
                if node.tag_name.lower() == tag_name:
                    found.append(node)
                found.extend(node.get_elements_by_tag_name(tag_name))
        return found


class Fragment(_ParentNode):
    __slots__ = ()
    node_name = "#document-fragment"


class Element(_ParentNode):
    __slots__ = ("tag_name", "attrs", "content", "namespace")

    def __init__(self, tag_name: str, attrs: list[list[str]] | None = None,
                 namespace: str = "html") -> None:
        super().__init__()
        self.tag_name = tag_name
        self.attrs: list[list[str]] = attrs if attrs is not None else []
        # template elements carry their children in a separate fragment
        self.content: Fragment | None = Fragment() if tag_name == "template" else None
        # "html" | "svg" | "math" — drives foreign-content token handling
        # (integration points, breakout) during parsing only
        self.namespace = namespace

    @property
    def node_name(self) -> str:  # type: ignore[override]
        return self.tag_name

    # --- attributes (dom-parser-node.js:158-195) ---
    def _find_attr(self, name: str) -> int:
        lowered = name.lower()
        for index, attr in enumerate(self.attrs):
            if attr[0] == name or attr[0].lower() == lowered:
                return index
        return -1

    def get_attribute(self, name: str) -> str | None:
        index = self._find_attr(name)
        return self.attrs[index][1] if index != -1 else None

    def get_attribute_names(self) -> list[str]:
        return [attr[0] for attr in self.attrs]

    def set_attribute(self, name: str, value: str) -> None:
        index = self._find_attr(name)
        if index == -1:
            self.attrs.append([name, value])
        else:
            self.attrs[index][1] = value

    def remove_attribute(self, name: str) -> None:
        index = self._find_attr(name)
        if index != -1:
            del self.attrs[index]

    @property
    def text_content(self) -> str:
        return "".join(
            node.value for node in self.child_nodes if isinstance(node, Text)
        )

    @property
    def outer_html(self) -> str:
        return serialize(self)


class Document(_ParentNode):
    __slots__ = ()
    node_name = "#document"

    def create_element(self, tag_name: str) -> Element:
        return Element(tag_name.lower())

    def create_text_node(self, data: str) -> Text:
        return Text(data)

    @property
    def doctype(self) -> DocumentType | None:
        first = self.first_child
        return first if isinstance(first, DocumentType) else None

    @property
    def document_element(self) -> Element | None:
        for node in self.child_nodes:
            if isinstance(node, Element) and node.tag_name.lower() == "html":
                return node
        return None

    @property
    def head(self) -> Element | None:
        root = self.document_element
        if root is None:
            return None
        for node in root.child_nodes:
            if isinstance(node, Element) and node.tag_name.lower() == "head":
                return node
        return None

    @property
    def body(self) -> Element | None:
        root = self.document_element
        if root is None:
            return None
        for node in root.child_nodes:
            if isinstance(node, Element) and node.tag_name.lower() == "body":
                return node
        return None


# ---------------------------------------------------------------------------
# tokenizer


_TAG_NAME_RE = re.compile(r"[A-Za-z][^\s/>]*")
_ATTR_NAME_RE = re.compile(r"[^\s/>=]+")
_WS_RE = re.compile(r"[\s]+")
_DOCTYPE_RE = re.compile(
    r"""^\s*([^\s>]*)\s*(?:(PUBLIC)\s+(["'])(.*?)\3\s*(?:(["'])(.*?)\5)?|(SYSTEM)\s+(["'])(.*?)\8)?""",
    re.IGNORECASE | re.DOTALL,
)


# the HTML spec's numeric-character-reference overrides ("Numeric character
# reference end state" table): C1 controls map through windows-1252
_WIN1252_CHARREFS = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}


def _decode_numeric_charref(cp: int) -> str:
    """Spec numeric charref mapping: NUL / surrogates / out-of-range →
    U+FFFD, C1 range through the windows-1252 table, everything else —
    INCLUDING noncharacters and C0 controls — emitted as-is (parse errors
    only; html.unescape silently DROPS those, parse5/browsers keep them)."""
    if cp == 0 or 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return "�"
    return _WIN1252_CHARREFS.get(cp, chr(cp))


def _unescape(text: str) -> str:
    return _unescape_entities(text, in_attr=False) if "&" in text else text


def _unescape_attr(text: str) -> str:
    """Entity decoding with the HTML-spec ATTRIBUTE exception: a legacy
    (no-semicolon) named reference followed by '=' or an alphanumeric stays
    VERBATIM — html.unescape would turn href="?id=1&region=US" into
    "?id=1®ion=US" (parse5/browsers do not)."""
    if "&" not in text:
        return text
    return _unescape_entities(text, in_attr=True)


# numeric digits UNBOUNDED like the spec's "consume all digits" (a capped
# quantifier split long references mid-number, leaking trailing digits)
_ATTR_ENTITY_RE = re.compile(r"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[a-zA-Z][a-zA-Z0-9]{0,31};?)")


def _unescape_entities(text: str, in_attr: bool) -> str:
    """ONE single-pass decoder for text and attribute values (a two-phase
    numeric-then-named pass would double-decode &#38;amp; into '&')."""
    from html.entities import html5 as _html5

    out: list[str] = []
    pos = 0
    for m in _ATTR_ENTITY_RE.finditer(text):
        out.append(text[pos : m.start()])
        entity = m.group(0)
        name = m.group(1)
        if name[0] == "#":
            digits = name[1:-1] if name.endswith(";") else name[1:]
            if digits[:1] in ("x", "X"):
                digits = digits[1:].lstrip("0")
                cp = 0x110000 if len(digits) > 6 else int(digits or "0", 16)
            else:
                digits = digits.lstrip("0")
                # > 7 digits is certainly out of range — skip int() so a
                # megabyte of 9s can't hit the bigint conversion limit
                cp = 0x110000 if len(digits) > 7 else int(digits or "0")
            out.append(_decode_numeric_charref(cp))
        elif name.endswith(";") and name in _html5:
            out.append(_html5[name])
        else:
            # longest legacy (semicolon-less) named reference prefix
            bare = name[:-1] if name.endswith(";") else name
            best = 0
            for length in range(min(len(bare), 8), 1, -1):
                if bare[:length] in _html5:  # html5 legacy keys carry no ';'
                    best = length
                    break
            if not best:
                out.append(entity)
            else:
                rest = entity[1 + best :]
                following = rest[0] if rest else text[m.end() : m.end() + 1]
                if in_attr and following and (
                        following.isalnum() or following == "="):
                    out.append(entity)  # the attribute exception
                else:
                    out.append(_html5[bare[:best]] + rest)
        pos = m.end()
    out.append(text[pos:])
    return "".join(out)


_SCRIPT_SCAN_RE = re.compile(
    # `<!---*>` is the spec's enter-then-immediately-exit path (the opener's
    # own dashes reach the escaped-dash-dash state, `>` exits) — matched as
    # ONE token so the overlapping dashes can't strand the scanner escaped
    r"<!---*>|<!--|-->|</script(?=[\t\n\f\r />])|</script$"
    r"|<script(?=[\t\n\f\r />])",
    re.IGNORECASE,
)


class _Tokenizer:
    """``foreign`` is TREE-BUILDER FEEDBACK (the spec's tokenizer/tree-
    construction coupling): the parse loop updates it after every token to
    "the adjusted current node is not in the HTML namespace". It gates CDATA
    sections and suppresses raw-content modes (script/style/title...) inside
    foreign content — a lexical svg/math depth counter cannot do this, since
    breakout tags and integration points re-enter HTML content without a
    closing </svg>."""

    def __init__(self, source: str) -> None:
        # spec input-stream preprocessing (also what parse5 sees): CRLF and
        # lone CR both become LF before tokenization — text nodes, attribute
        # values and raw content all observe normalized newlines
        if "\r" in source:
            source = source.replace("\r\n", "\n").replace("\r", "\n")
        self.source = source
        self.pos = 0
        self.foreign = False
        # tree-builder feedback like ``foreign``: set while processing a
        # raw-container start tag the builder IGNORED (frameset modes,
        # in-select) — parse5 only switches the tokenizer when the element
        # is actually inserted, so the content must parse as markup
        self.suppress_raw = False

    def tokens(self):
        source = self.source
        n = len(source)
        while self.pos < n:
            lt = source.find("<", self.pos)
            if lt == -1:
                yield ("text", source[self.pos :])
                self.pos = n
                return
            if lt > self.pos:
                yield ("text", source[self.pos : lt])
            self.pos = lt
            if source.startswith("<!--", lt):
                # spec abrupt closes: "<!-->" and "<!--->" are EMPTY comments
                if source.startswith(">", lt + 4):
                    yield ("comment", "")
                    self.pos = lt + 5
                    continue
                if source.startswith("->", lt + 4):
                    yield ("comment", "")
                    self.pos = lt + 6
                    continue
                end = source.find("-->", lt + 4)
                # spec: "--!>" also closes a comment (incorrectly-closed
                # form). Only a match BEFORE the "-->" matters, so bound the
                # scan by it (no "--!>" can straddle a "-->": the characters
                # conflict at every overlapping offset) — an unbounded find
                # would rescan to EOF for every comment.
                end_bang = (
                    source.find("--!>", lt + 4, end)
                    if end != -1
                    else source.find("--!>", lt + 4)
                )
                if end_bang != -1:
                    yield ("comment", source[lt + 4 : end_bang])
                    self.pos = end_bang + 4
                elif end == -1:
                    yield ("comment", source[lt + 4 :])
                    self.pos = n
                else:
                    yield ("comment", source[lt + 4 : end])
                    self.pos = end + 3
            elif source.startswith("<![CDATA[", lt) and self.foreign:
                # CDATA sections are character data in foreign content only
                # (in HTML content the generic <! branch makes them a bogus
                # comment, like parse5); a distinct token kind because the
                # content is LITERAL — character references are not parsed
                # inside CDATA
                end = source.find("]]>", lt + 9)
                if end == -1:
                    yield ("cdata", source[lt + 9 :])
                    self.pos = n
                else:
                    yield ("cdata", source[lt + 9 : end])
                    self.pos = end + 3
            elif source.startswith("<!", lt) or source.startswith("<?", lt):
                gt = source.find(">", lt + 2)
                content = source[lt + 2 : gt if gt != -1 else n]
                if content[:7].lower() == "doctype":
                    yield ("doctype", content[7:])
                else:
                    yield ("comment", ("?" if source[lt + 1] == "?" else "") + content)
                self.pos = n if gt == -1 else gt + 1
            elif source.startswith("</", lt):
                if source.startswith("</>", lt):
                    # spec missing-end-tag-name: "</>" is ignored outright —
                    # no token, no comment (unlike "</1>", a bogus comment)
                    self.pos = lt + 3
                    continue
                m = _TAG_NAME_RE.match(source, lt + 2)
                if m is None:
                    # "</" not followed by a letter is a bogus comment / text
                    gt = source.find(">", lt + 2)
                    if gt == -1:
                        yield ("text", source[lt:])
                        self.pos = n
                    else:
                        yield ("comment", source[lt + 2 : gt])
                        self.pos = gt + 1
                else:
                    gt = source.find(">", m.end())
                    if gt == -1:
                        # spec eof-in-tag: the truncated token is dropped
                        self.pos = n
                        continue
                    yield ("endtag", m.group(0).lower().replace("\x00", "�"))
                    self.pos = gt + 1
            else:
                m = _TAG_NAME_RE.match(source, lt + 1)
                if m is None:
                    yield ("text", "<")
                    self.pos = lt + 1
                    continue
                tag = m.group(0).lower().replace("\x00", "�")
                attrs, self_closing, end, terminated = self._read_attributes(m.end())
                self.pos = end
                if not terminated:
                    continue  # spec eof-in-tag: dropped, not emitted
                yield ("starttag", tag, attrs, self_closing)
                if self.suppress_raw:
                    # consume the flag BEFORE the foreign check — a
                    # suppression requested in foreign context must not
                    # leak onto a later unrelated raw container
                    self.suppress_raw = False
                    continue  # builder ignored the tag — content is markup
                if self.foreign:
                    continue  # no raw-content modes inside foreign content
                if tag == "plaintext":
                    # spec: NULLs in RAWTEXT/RCDATA/script-data/PLAINTEXT
                    # states become U+FFFD at the tokenizer
                    yield ("rawtext", source[self.pos :].replace("\x00", "�"))
                    self.pos = n
                elif tag in _TOKENIZER_RAW or tag in _TOKENIZER_RCDATA:
                    raw, self.pos = self._read_raw_content(tag, self.pos)
                    if tag in _TOKENIZER_RCDATA:
                        raw = _unescape(raw)
                    raw = raw.replace("\x00", "�")
                    if raw:
                        yield ("rawtext", raw)
                    yield ("endtag", tag)

    def _read_attributes(self, pos: int):
        source = self.source
        n = len(source)
        attrs: list[list[str]] = []
        self_closing = False
        while pos < n:
            m = _WS_RE.match(source, pos)
            if m:
                pos = m.end()
            if pos >= n:
                break
            c = source[pos]
            if c == ">":
                return attrs, self_closing, pos + 1, True
            if c == "/":
                if source.startswith("/>", pos):
                    return attrs, True, pos + 2, True
                pos += 1
                continue
            if c == "=":
                # spec "before attribute name" U+003D: parse error, the
                # equals sign STARTS the attribute name (<a =x> → name "=x",
                # which the reference serializer then drops as unwritable)
                m = _ATTR_NAME_RE.match(source, pos + 1)
                name = "=" + (m.group(0).lower() if m else "")
                pos = (m.end() if m else pos + 1)
            else:
                m = _ATTR_NAME_RE.match(source, pos)
                if m is None:
                    pos += 1
                    continue
                name = m.group(0).lower()
                pos = m.end()
            # spec: NULL in an attribute name → U+FFFD at the tokenizer
            name = name.replace("\x00", "�")
            m = _WS_RE.match(source, pos)
            if m:
                pos = m.end()
            value = ""
            if pos < n and source[pos] == "=":
                pos += 1
                m = _WS_RE.match(source, pos)
                if m:
                    pos = m.end()
                if pos < n and source[pos] in "\"'":
                    quote = source[pos]
                    end = source.find(quote, pos + 1)
                    if end == -1:
                        value = source[pos + 1 :]
                        pos = n
                    else:
                        value = source[pos + 1 : end]
                        pos = end + 1
                else:
                    start = pos
                    while pos < n and source[pos] not in ">\t\n\f\r ":
                        pos += 1
                    value = source[start:pos]
            if not any(attr[0] == name for attr in attrs):
                # spec: NULL in an attribute value → U+FFFD at the tokenizer
                attrs.append([name, _unescape_attr(value).replace("\x00", "�")])
        # ran off the end of the input without seeing ">" — eof-in-tag
        return attrs, self_closing, n, False

    def _read_raw_content(self, tag: str, pos: int):
        source = self.source
        if tag == "script":
            return self._read_script_data(pos)
        pattern = re.compile(rf"</{re.escape(tag)}(?=[\s/>])|</{re.escape(tag)}$", re.IGNORECASE)
        m = pattern.search(source, pos)
        if m is None:
            return source[pos:], len(source)
        content = source[pos : m.start()]
        gt = source.find(">", m.start())
        return content, (len(source) if gt == -1 else gt + 1)

    def _read_script_data(self, pos: int):
        """Script data with the spec's ESCAPE states (condensed): after
        ``<!--`` the sequence ``<script`` enters the DOUBLE-escaped state,
        where ``</script>`` returns to escaped instead of closing the
        element — so document.write('<script>…</script>') payloads stay
        inside the outer script like parse5/browsers keep them; ``-->``
        leaves both escaped states."""
        source = self.source
        escaped = False
        double = False
        i = pos
        while True:
            m = _SCRIPT_SCAN_RE.search(source, i)
            if m is None:
                return source[pos:], len(source)
            token = m.group(0).lower()
            if token == "<!--":
                escaped = True
                i = m.end()
            elif token == "-->" or (
                    token.startswith("<!--") and token.endswith(">")):
                # `-->` exits both escape levels; `<!---*>` enters and exits
                # in one stroke (and exits if already escaped)
                escaped = False
                double = False
                i = m.end()
            elif token.startswith("</script"):
                if double:
                    double = False
                    i = m.end()
                else:
                    content = source[pos : m.start()]
                    gt = source.find(">", m.start())
                    return content, (len(source) if gt == -1 else gt + 1)
            else:  # <script…
                if escaped:
                    double = True
                i = m.end()


# ---------------------------------------------------------------------------
# tree builder


# the active formatting elements of the HTML spec's adoption agency; when one
# is closed while later formatting elements are still open, those are
# reconstructed (cloned and reopened) — matching parse5's tree for the common
# misnesting cases like <b><i></b></i>
_FORMATTING_TAGS = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)

# the HTML spec's "special" element category (tree construction §13.2.4.2) —
# the adoption agency's furthest-block candidates; foreign (svg/math)
# elements are handled by namespace in _is_special_element
_SPECIAL_TAGS = frozenset(
    """address applet area article aside base basefont bgsound blockquote
    body br button caption center col colgroup dd details dir div dl dt
    embed fieldset figcaption figure footer form frame frameset h1 h2 h3 h4
    h5 h6 head header hgroup hr html iframe img input keygen li link listing
    main marquee menu meta nav noembed noframes noscript object ol p param
    plaintext pre script search section select source style summary table
    tbody td template textarea tfoot th thead title tr track ul wbr
    xmp""".split()
)

_LI_DD_DT_STOP = _SPECIAL_TAGS - frozenset(("address", "div", "p"))

# end tags WITH their own "in body" rules (block closers, list items,
# headings, form/p/br, applet-marquee-object, body/html/template/head and
# the formatting tags, which run the adoption agency first): these keep the
# default-scope walk below. Every OTHER end tag follows the spec's "any
# other end tag" loop, which IGNORES the token as soon as it meets a
# SPECIAL-category element (</span> never closes through an open <div>).
# spec "generate implied end tags" set (no exclusions)
_IMPLIED_END_TAGS = frozenset(
    ("dd", "dt", "li", "optgroup", "option", "p", "rb", "rp", "rt", "rtc")
)

_OWN_RULE_END_TAGS = frozenset(
    """address article aside blockquote button center details dialog dir
    div dl fieldset figcaption figure footer header hgroup listing main
    menu nav ol pre search section summary ul form p li dd dt h1 h2 h3 h4
    h5 h6 applet marquee object br template body html head""".split()
)

# foreign-content boundary/special sets shared by _is_special_element and
# _scope_hides (SVG HTML-integration points; MathML text IPs +
# annotation-xml)
_SVG_INTEGRATION_TAGS = frozenset(("foreignobject", "desc", "title"))
_MATH_BOUNDARY_TAGS = frozenset(
    ("mi", "mo", "mn", "ms", "mtext", "annotation-xml"))

_TABLE_SECTION_TAGS = frozenset(("table", "tbody", "thead", "tfoot", "tr"))


def _is_table_context(node) -> bool:
    """HTML-namespace table structure only: a FOREIGN element that happens
    to be named table/tr/tbody (e.g. <svg><tr>) is an ordinary foreign
    container — text and inserts inside it must never foster-parent."""
    return (isinstance(node, Element) and node.namespace == "html"
            and node.tag_name in _TABLE_SECTION_TAGS)
# start tags legal at each table-context insertion point; everything else is
# FOSTER-PARENTED before the table (HTML spec "in table" mode, as parse5 does)
_TABLE_ALLOWED = {
    "table": frozenset(
        ("caption", "colgroup", "col", "tbody", "thead", "tfoot", "tr", "td",
         "th", "script", "style", "template", "form")
    ),
    "tbody": frozenset(("tr", "td", "th", "script", "style", "template", "form")),
    "thead": frozenset(("tr", "td", "th", "script", "style", "template", "form")),
    "tfoot": frozenset(("tr", "td", "th", "script", "style", "template", "form")),
    "tr": frozenset(("td", "th", "script", "style", "template", "form")),
}

# parse5 adjusts these SVG tag names back to their camelCase form
# (HTML spec "adjust SVG attributes" / "SVG tag name adjustments")
_SVG_TAG_ADJUST = {
    "altglyph": "altGlyph", "altglyphdef": "altGlyphDef",
    "altglyphitem": "altGlyphItem", "animatecolor": "animateColor",
    "animatemotion": "animateMotion", "animatetransform": "animateTransform",
    "clippath": "clipPath", "feblend": "feBlend",
    "fecolormatrix": "feColorMatrix", "fecomponenttransfer": "feComponentTransfer",
    "fecomposite": "feComposite", "feconvolvematrix": "feConvolveMatrix",
    "fediffuselighting": "feDiffuseLighting",
    "fedisplacementmap": "feDisplacementMap", "fedistantlight": "feDistantLight",
    "fedropshadow": "feDropShadow", "feflood": "feFlood", "fefunca": "feFuncA",
    "fefuncb": "feFuncB", "fefuncg": "feFuncG", "fefuncr": "feFuncR",
    "fegaussianblur": "feGaussianBlur", "feimage": "feImage",
    "femerge": "feMerge", "femergenode": "feMergeNode",
    "femorphology": "feMorphology", "feoffset": "feOffset",
    "fepointlight": "fePointLight", "fespecularlighting": "feSpecularLighting",
    "fespotlight": "feSpotLight", "fetile": "feTile",
    "feturbulence": "feTurbulence", "foreignobject": "foreignObject",
    "glyphref": "glyphRef", "lineargradient": "linearGradient",
    "radialgradient": "radialGradient", "textpath": "textPath",
}

# likewise camelCase SVG attribute names (HTML spec list, abbreviated to the
# ones that appear in real pages)
_SVG_ATTR_ADJUST = {
    "attributename": "attributeName", "attributetype": "attributeType",
    "basefrequency": "baseFrequency", "baseprofile": "baseProfile",
    "calcmode": "calcMode", "clippathunits": "clipPathUnits",
    "diffuseconstant": "diffuseConstant", "edgemode": "edgeMode",
    "filterunits": "filterUnits", "glyphref": "glyphRef",
    "gradienttransform": "gradientTransform", "gradientunits": "gradientUnits",
    "kernelmatrix": "kernelMatrix", "kernelunitlength": "kernelUnitLength",
    "keypoints": "keyPoints", "keysplines": "keySplines", "keytimes": "keyTimes",
    "lengthadjust": "lengthAdjust", "limitingconeangle": "limitingConeAngle",
    "markerheight": "markerHeight", "markerunits": "markerUnits",
    "markerwidth": "markerWidth", "maskcontentunits": "maskContentUnits",
    "maskunits": "maskUnits", "numoctaves": "numOctaves",
    "pathlength": "pathLength", "patterncontentunits": "patternContentUnits",
    "patterntransform": "patternTransform", "patternunits": "patternUnits",
    "pointsatx": "pointsAtX", "pointsaty": "pointsAtY", "pointsatz": "pointsAtZ",
    "preservealpha": "preserveAlpha", "preserveaspectratio": "preserveAspectRatio",
    "primitiveunits": "primitiveUnits", "refx": "refX", "refy": "refY",
    "repeatcount": "repeatCount", "repeatdur": "repeatDur",
    "requiredextensions": "requiredExtensions", "requiredfeatures": "requiredFeatures",
    "specularconstant": "specularConstant", "specularexponent": "specularExponent",
    "spreadmethod": "spreadMethod", "startoffset": "startOffset",
    "stddeviation": "stdDeviation", "stitchtiles": "stitchTiles",
    "surfacescale": "surfaceScale", "systemlanguage": "systemLanguage",
    "tablevalues": "tableValues", "targetx": "targetX", "targety": "targetY",
    "textlength": "textLength", "viewbox": "viewBox", "viewtarget": "viewTarget",
    "xchannelselector": "xChannelSelector", "ychannelselector": "yChannelSelector",
    "zoomandpan": "zoomAndPan",
}


# legacy public-id prefixes that force quirks mode (HTML spec "the initial
# insertion mode" doctype table; same families parse5's doctype module keys
# on — the exhaustive list's remaining entries are museum pieces)
_QUIRKY_PUBLIC_PREFIXES = (
    "+//silmaril//", "-//advasoft ltd//", "-//as//dtd html 3.0",
    "-//ietf//dtd html", "-//microsoft//", "-//netscape comm. corp.//",
    "-//o'reilly and associates//", "-//softquad software//",
    "-//softquad//", "-//spyglass//", "-//sq//", "-//sun microsystems corp.//",
    "-//w3c//dtd html 3", "-//w3c//dtd html 4.0 frameset//",
    "-//w3c//dtd html 4.0 transitional//", "-//w3c//dtd html experimental",
    "-//w3c//dtd w3 html//", "-//w3o//dtd w3 html//",
    "-//webtechs//dtd mozilla html",
)
_QUIRKY_PUBLIC_EXACT = (
    "-//w3o//dtd w3 html strict 3.0//en//", "-/w3c/dtd html 4.0 transitional/en",
    "html",
)
# quirks only when the system identifier is ABSENT
_QUIRKY_PUBLIC_IF_NO_SYSTEM = (
    "-//w3c//dtd html 4.01 frameset//", "-//w3c//dtd html 4.01 transitional//",
)


def _doctype_is_quirky(name: str, public_id: str, system_id: str) -> bool:
    if name != "html":
        return True
    pub = public_id.lower()
    if pub in _QUIRKY_PUBLIC_EXACT:
        return True
    if system_id.lower() == (
            "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd"):
        return True
    if any(pub.startswith(p) for p in _QUIRKY_PUBLIC_PREFIXES):
        return True
    if not system_id and any(
            pub.startswith(p) for p in _QUIRKY_PUBLIC_IF_NO_SYSTEM):
        return True
    return False


def parse_html(source: str) -> Document:
    """Parse an HTML string into a Document with implied html/head/body."""
    document = Document()
    html_el: Element | None = None
    head_el: Element | None = None
    body_el: Element | None = None
    head_closed = False
    # stack of open elements once we're in the body (or head content)
    stack: list[_ParentNode] = []

    def current() -> _ParentNode:
        if stack:
            top = stack[-1]
            if isinstance(top, Element) and top.content is not None:
                return top.content
            return top
        return document

    def ensure_html() -> Element:
        nonlocal html_el
        if html_el is None:
            html_el = Element("html")
            document.append_child(html_el)
        return html_el

    def ensure_head() -> Element:
        nonlocal head_el
        ensure_html()
        if head_el is None:
            head_el = Element("head")
            html_el.append_child(head_el)
        return head_el

    def ensure_body() -> Element:
        nonlocal body_el, head_closed
        ensure_head()
        head_closed = True
        if body_el is None:
            body_el = Element("body")
            html_el.append_child(body_el)
        return body_el

    def insertion_parent(for_text: bool = False, ws: bool = False) -> _ParentNode:
        if stack:
            return current()
        if body_el is not None:
            return body_el
        if head_closed:
            # between </head> and <body>: whitespace rides along inside <html>
            if ws:
                return ensure_html()
            return ensure_body()
        if for_text and not ws:
            return ensure_body()
        if head_el is not None:
            return head_el
        if ws:
            return document if html_el is None else html_el
        return ensure_body()

    def prune_stack(index: int) -> None:
        """del stack[index:], clearing active formatting UP TO THE LAST
        MARKER for each marker-bearing element (cell/caption/template — the
        spec pushes a formatting marker at these) among the popped:
        formatting opened inside a cell must not reconstruct outside it,
        while formatting opened BEFORE the table still does."""
        removed = stack[index:]
        del stack[index:]
        n_markers = sum(
            1
            for node in removed
            if isinstance(node, Element)
            and node.namespace == "html"  # marker push is gated the same way
            and node.tag_name.lower() in _MARKER_TAGS
        )
        for _ in range(n_markers):
            for af_index in range(len(active_formatting) - 1, -1, -1):
                if active_formatting[af_index] is _AF_MARKER:
                    del active_formatting[af_index:]
                    break
            else:
                active_formatting.clear()
                break

    def pop_scoped(target_tags: frozenset, boundary_tags: frozenset) -> bool:
        """Implied end tag with SCOPE: pop to the nearest open target unless a
        boundary element intervenes first (the HTML spec's 'has an element in
        (list-item/button) scope' checks, which the top-of-stack-only round-1
        version missed for <li><div><li> / <p><span><div> shapes)."""
        for index in range(len(stack) - 1, -1, -1):
            node = stack[index]
            if not isinstance(node, Element):
                return False
            name = node.tag_name.lower()
            if node.namespace != "html":
                # every spec scope list includes the foreign integration
                # points as boundaries; other foreign elements neither
                # match targets nor stop the walk
                if (node.namespace == "svg" and name in _SVG_INTEGRATION_TAGS) or (
                        node.namespace == "math" and name in _MATH_BOUNDARY_TAGS):
                    return False
                continue
            if name in target_tags:
                prune_stack(index)
                return True
            if name in boundary_tags:
                return False
        return False

    def auto_close(tag: str) -> None:
        if not stack:
            return
        top = stack[-1]
        if not isinstance(top, Element):
            return
        top_tag = top.tag_name
        if tag in _P_CLOSERS:
            if tag == "table" and quirks_mode:
                # spec "in body" <table>: the p-in-button-scope close is
                # gated on the Document NOT being in quirks mode — a
                # doctype-less page keeps its table inside the open <p>
                return
            # close an open <p> anywhere in button scope (spec: "if the stack
            # of open elements has a p element in button scope")
            pop_scoped(_P_TARGET, _BUTTON_SCOPE_BOUNDARY)
            top = stack[-1] if stack else None
            top_tag = top.tag_name if isinstance(top, Element) else ""
            if tag in _HEADING_TAGS and top_tag in _HEADING_TAGS:
                # <h1><h2> implies </h1> (spec "in body" heading rule)
                stack.pop()
            return
        if tag == "li":
            pop_scoped(frozenset(("li",)), _LI_DD_DT_STOP)
        elif tag in ("dd", "dt"):
            pop_scoped(frozenset(("dd", "dt")), _LI_DD_DT_STOP)
        elif tag in ("td", "th") and top_tag in ("td", "th"):
            prune_stack(len(stack) - 1)
        elif tag == "tr" and top_tag in ("td", "th"):
            prune_stack(len(stack) - 1)
            if stack and isinstance(stack[-1], Element) and stack[-1].tag_name == "tr":
                stack.pop()
        elif tag in ("option", "optgroup") and top_tag == "option":
            # spec "in body" option/optgroup: only an open <option> is
            # popped — a second <optgroup> NESTS inside the first (the
            # pop-optgroup-too rule belongs to "in select" and is applied
            # at the select gate before this helper runs)
            stack.pop()
        elif tag == "button":
            # spec: a <button> with a button in scope closes it first —
            # buttons never nest
            pop_scoped(frozenset(("button",)), _DEFAULT_SCOPE_BOUNDARY)
        elif tag in ("rt", "rp", "rb", "rtc"):
            # spec ruby rules: with a <ruby> in scope, rb/rtc generate
            # implied end tags; rt/rp generate implied end tags except rtc
            for node in reversed(stack):
                if not isinstance(node, Element):
                    break
                name = node.tag_name.lower()
                if name == "ruby":
                    implied = frozenset(
                        ("dd", "dt", "li", "optgroup", "option", "p",
                         "rb", "rp", "rt", "rtc"))
                    keep = ("rtc",) if tag in ("rt", "rp") else ()
                    while stack and isinstance(stack[-1], Element) and (
                            stack[-1].tag_name.lower() in implied
                            and stack[-1].tag_name.lower() not in keep):
                        stack.pop()
                    break
                if name in _DEFAULT_SCOPE_BOUNDARY:
                    break

    def open_select() -> Element | None:
        """The select whose "in select" rules govern the CURRENT insertion
        point, or None. Emulates the insertion-mode machine with select
        scope: only option/optgroup may sit between the top and the select
        (spec "has a select in select scope" — every OTHER element type,
        template and foreign elements included, terminates the search), and
        a foreign-namespace element named select (<svg><select>) is not a
        select at all."""
        for node in reversed(stack):
            if not isinstance(node, Element) or node.namespace != "html":
                return None
            if node.tag_name == "select":
                return node
            if node.tag_name not in ("option", "optgroup"):
                return None
        return None

    def pop_stack_to(element: Element) -> None:
        """Pop the open-element stack through ``element`` (inclusive)."""
        for index in range(len(stack) - 1, -1, -1):
            if stack[index] is element:
                del stack[index:]
                break

    def top_element() -> Element | None:
        for node in reversed(stack):
            if isinstance(node, Element):
                return node
        return None

    def is_html_integration_point(element: Element) -> bool:
        """SVG foreignObject/desc/title; MathML annotation-xml carrying an
        HTML encoding (HTML spec 'tree construction dispatcher')."""
        tag = element.tag_name.lower()
        if element.namespace == "svg" and tag in ("foreignobject", "desc", "title"):
            return True
        if element.namespace == "math" and tag == "annotation-xml":
            encoding = (element.get_attribute("encoding") or "").lower()
            return encoding in ("text/html", "application/xhtml+xml")
        return False

    def token_namespace(tag: str | None = None) -> str:
        """Namespace the next start tag is processed in, per the spec
        dispatcher: decided by the ADJUSTED CURRENT NODE — html namespace, a
        MathML text integration point (for anything but mglyph/malignmark),
        or an HTML integration point all dispatch to the HTML rules."""
        top = top_element()
        if top is None or top.namespace == "html":
            return "html"
        if (
            top.namespace == "math"
            and top.tag_name.lower() in _MATHML_TEXT_INTEGRATION
            and tag not in ("mglyph", "malignmark")
        ):
            return "html"
        if is_html_integration_point(top):
            return "html"
        return top.namespace

    def breakout_foreign() -> None:
        """Foreign-content breakout: pop foreign elements until the current
        node is an HTML element, a MathML text integration point, or an HTML
        integration point; the token then reprocesses as HTML."""
        while stack:
            top = stack[-1]
            if not isinstance(top, Element) or top.namespace == "html":
                return
            if (
                top.tag_name.lower() in _MATHML_TEXT_INTEGRATION
                and top.namespace == "math"
            ) or is_html_integration_point(top):
                return
            stack.pop()

    def foster_parent_target() -> tuple[_ParentNode, int] | None:
        """(parent, index) slot immediately before the deepest open table."""
        for node in reversed(stack):
            if isinstance(node, Element) and node.tag_name == "table":
                table_parent = node.parent_node
                if table_parent is not None and node in table_parent.child_nodes:
                    return table_parent, table_parent.child_nodes.index(node)
                return None
        return None

    def insert_fostered(node: Node) -> bool:
        slot = foster_parent_target()
        if slot is None:
            return False
        parent, index = slot
        if isinstance(node, Text):
            before = parent.child_nodes[index - 1] if index > 0 else None
            if isinstance(before, Text):
                before.value += node.value
                return True
        parent.child_nodes.insert(index, node)
        node.parent_node = parent
        return True

    def synthesize_table_structure(parent: Element, tag: str) -> _ParentNode:
        """Implied <tbody>/<tr>/<colgroup> like parse5: <table><tr> gets a
        tbody, <table><td> gets tbody+tr, <table><col> gets a colgroup."""
        if parent.tag_name == "table" and tag == "col":
            colgroup = Element("colgroup")
            parent.append_child(colgroup)
            stack.append(colgroup)
            return colgroup
        if parent.tag_name == "table" and tag in ("tr", "td", "th"):
            tbody = Element("tbody")
            parent.append_child(tbody)
            stack.append(tbody)
            parent = tbody
        if parent.tag_name in ("tbody", "thead", "tfoot") and tag in ("td", "th"):
            tr = Element("tr")
            parent.append_child(tr)
            stack.append(tr)
            parent = tr
        return parent

    # the spec's list of active formatting elements (simplified: no markers —
    # cleared outright at cell/caption/template boundaries). An entry whose
    # element was popped implicitly (e.g. a block start closing <p> took the
    # open <b> with it) is REOPENED as a clone before the next character
    # token / phrasing start tag — the reconstruction half of the adoption
    # agency that makes <p><b>x<div>y parse as parse5 does.
    active_formatting: list[Element] = []

    def remove_active(tag: str) -> None:
        # search stops at the last marker (spec: the <a>/adoption lookups
        # consider only entries after it)
        for index in range(len(active_formatting) - 1, -1, -1):
            entry = active_formatting[index]
            if entry is _AF_MARKER:
                return
            if entry.tag_name.lower() == tag:
                del active_formatting[index]
                return

    def reconstruct_active() -> None:
        if not active_formatting:
            return
        target_now = current() if stack else None
        if _is_table_context(target_now):
            return  # formatting never reconstructs into table structure here
        open_ids = {id(node) for node in stack}
        start = len(active_formatting)
        for index in range(len(active_formatting) - 1, -1, -1):
            entry = active_formatting[index]
            # reconstruction never crosses a marker or an already-open entry
            if entry is _AF_MARKER or id(entry) in open_ids:
                break
            start = index
        for index in range(start, len(active_formatting)):
            entry = active_formatting[index]
            clone = Element(entry.tag_name, [list(a) for a in entry.attrs])
            target = current() if stack else insertion_parent()
            target.append_child(clone)
            stack.append(clone)
            active_formatting[index] = clone

    def _special_or_boundary(node: Node, html_set: frozenset,
                             non_element: bool) -> bool:
        """Shared body of the spec 'special' category and the default-scope
        boundary test — identical foreign-content sets, differing only in
        the HTML-namespace tag list."""
        if not isinstance(node, Element):
            return non_element
        tag = node.tag_name.lower()
        if node.namespace == "svg":
            return tag in _SVG_INTEGRATION_TAGS
        if node.namespace == "math":
            return tag in _MATH_BOUNDARY_TAGS
        return tag in html_set

    def _is_special_element(node: Node) -> bool:
        """The spec 'special' category — furthest-block candidates."""
        return _special_or_boundary(node, _SPECIAL_TAGS, True)

    def _scope_hides(node: Node) -> bool:
        """Default-scope boundary test (spec 'has an element in scope')."""
        return _special_or_boundary(node, _DEFAULT_SCOPE_BOUNDARY, False)

    def _af_clone(element: Element) -> Element:
        return Element(element.tag_name, [list(a) for a in element.attrs])

    def _af_index(element: Element) -> int | None:
        for index, entry in enumerate(active_formatting):
            if entry is element:
                return index
        return None

    def _append_adopted(parent: _ParentNode, node: Node) -> None:
        """Insert at the 'appropriate place' for the adoption agency: honor
        template content and table foster-parenting."""
        if isinstance(parent, Element) and parent.content is not None:
            parent.content.append_child(node)
        elif _is_table_context(parent) and insert_fostered(node):
            pass
        else:
            parent.append_child(node)

    def adoption_agency(tag: str) -> bool:
        """The HTML spec adoption agency algorithm (tree construction
        'in body' formatting end tags), including the furthest-block half
        the round-2 simplification lacked — <b>1<p>2</b>3</p> now parses as
        <b>1</b><p><b>2</b>3</p> like parse5/browsers. Returns False only
        when no active entry matches (caller falls back to the generic
        'any other end tag' pop)."""
        # spec fast path: current node matches and has no active entry
        top = stack[-1] if stack else None
        if (isinstance(top, Element) and top.namespace == "html"
                and top.tag_name.lower() == tag
                and _af_index(top) is None):
            stack.pop()
            return True
        for _ in range(8):  # outer loop
            fmt = None
            for index in range(len(active_formatting) - 1, -1, -1):
                entry = active_formatting[index]
                if entry is _AF_MARKER:
                    break
                if entry.tag_name.lower() == tag:
                    fmt = entry
                    break
            if fmt is None:
                return False
            fmt_idx = next((i for i in range(len(stack) - 1, -1, -1)
                            if stack[i] is fmt), None)
            if fmt_idx is None:
                del active_formatting[_af_index(fmt)]
                return True  # parse error; token ignored
            if any(_scope_hides(n) for n in stack[fmt_idx + 1:]):
                return True  # not in scope; token ignored
            # furthest block: the first special element above fmt
            fb_idx = next((i for i in range(fmt_idx + 1, len(stack))
                           if _is_special_element(stack[i])), None)
            if fb_idx is None:
                # no furthest block: pop through fmt; entries for popped
                # formatting elements above it STAY active (they reopen
                # lazily at the next insertion — no eager empty clones)
                del stack[fmt_idx:]
                del active_formatting[_af_index(fmt)]
                return True
            fb = stack[fb_idx]
            common = stack[fmt_idx - 1] if fmt_idx > 0 else ensure_body()
            bookmark = _af_index(fmt)
            node_idx = fb_idx
            last_node: Node = fb
            inner = 0
            while True:
                inner += 1
                node_idx -= 1
                node = stack[node_idx]
                if node is fmt:
                    break
                af_idx = _af_index(node)
                if inner > 3 and af_idx is not None:
                    del active_formatting[af_idx]
                    if af_idx < bookmark:
                        bookmark -= 1
                    af_idx = None
                if af_idx is None:
                    # not actively formatting: drop from the stack; the
                    # element above it now sits at node_idx - 1 as before
                    del stack[node_idx]
                    fb_idx -= 1
                    continue
                clone = _af_clone(node)
                active_formatting[af_idx] = clone
                stack[node_idx] = clone
                if last_node is fb:
                    bookmark = af_idx + 1
                last_node.remove()
                clone.append_child(last_node)
                last_node = clone
            last_node.remove()
            _append_adopted(common, last_node)
            fclone = _af_clone(fmt)
            children = fb.child_nodes[:]
            fb.child_nodes.clear()
            for child in children:
                fclone.append_child(child)
            fb.append_child(fclone)
            fmt_af = _af_index(fmt)
            del active_formatting[fmt_af]
            if fmt_af < bookmark:
                bookmark -= 1
            active_formatting.insert(bookmark, fclone)
            del stack[fmt_idx]
            fb_idx -= 1
            stack.insert(fb_idx + 1, fclone)
        return True

    # spec "frameset-ok" flag + the open <frameset> (None = not in frameset
    # modes); while set with no body, only frameset/frame/noframes tokens land
    frameset_ok = True
    frameset_el: Element | None = None
    # spec form-element pointer: while set (and no template is open), further
    # <form> start tags are ignored
    form_el: Element | None = None
    # "after body" / "after-after body" insertion modes: comments land on the
    # html element / the Document; any other content switches back to in-body
    post_body: str | None = None
    # spec quirks mode: no doctype (or a legacy one) → quirks; the one tree
    # construction rule this gates is <table> NOT closing an open <p>
    quirks_mode = True

    tokenizer = _Tokenizer(source)

    def feedback_tokens():
        """Resume the tokenizer only after the tree builder has processed
        the previous token, with ``tokenizer.foreign`` refreshed to the
        adjusted-current-node namespace (spec tokenizer/tree coupling)."""
        for token in tokenizer.tokens():
            yield token
            top = top_element()
            tokenizer.foreign = top is not None and top.namespace != "html"

    for token in feedback_tokens():
        kind = token[0]
        if kind == "text" or kind == "cdata":
            # CDATA content is literal — character references are not
            # parsed inside CDATA sections
            text = token[1] if kind == "cdata" else _unescape(token[1])
            if "\x00" in text:
                # spec: the tree builder drops NULL character tokens in HTML
                # content ("in body" anything-else) but replaces them with
                # U+FFFD in foreign content (and CDATA only exists there)
                top = top_element()
                if kind == "cdata" or (
                    top is not None and top.namespace != "html"
                ):
                    text = text.replace("\x00", "�")
                else:
                    text = text.replace("\x00", "")
            if not text:
                continue
            # ASCII whitespace only (spec): &nbsp; and unicode spaces are
            # CONTENT — they must foster-parent out of tables, keep ws-only
            # runs out of <head>, etc.
            is_ws = text.strip(" \t\n\r\f") == ""
            if frameset_el is not None and body_el is None:
                # "in/after frameset": whitespace stays, content is dropped
                if is_ws and stack:
                    parent = current()
                    last = parent.child_nodes[-1] if parent.child_nodes else None
                    if isinstance(last, Text):
                        last.value += text
                    else:
                        parent.append_child(Text(text))
                continue
            if not is_ws:
                frameset_ok = False
                post_body = None  # non-ws text resumes in-body
            if is_ws and not stack and body_el is None and head_el is None:
                # "initial" / "before html" / "before head" all IGNORE
                # whitespace — before a <head> exists, ws-only runs vanish
                continue
            head_is_target = (
                body_el is None
                and (not stack
                     or (head_el is not None and stack[-1] is head_el))
            )
            if not is_ws and head_is_target:
                # a mixed run straddles the mode switch: its leading
                # whitespace still falls under the pre-body rules (ignored
                # before <head>, inserted into an open <head>, a child of
                # <html> between </head> and <body>), and only the
                # remainder leaves "in head" (popping an explicitly open
                # <head>, spec in-head anything-else) and opens the body
                rest = text.lstrip(" \t\n\r\f")
                prefix = text[: len(text) - len(rest)]
                if prefix and head_el is not None:
                    ws_parent = ensure_html() if head_closed else head_el
                    last = (ws_parent.child_nodes[-1]
                            if ws_parent.child_nodes else None)
                    if isinstance(last, Text):
                        last.value += prefix
                    else:
                        ws_parent.append_child(Text(prefix))
                text = rest
                if stack and head_el is not None and stack[-1] is head_el:
                    stack.pop()
            parent = insertion_parent(for_text=True, ws=is_ws)
            if not is_ws and parent is head_el and not stack:
                parent = ensure_body()
            if (
                not is_ws
                and isinstance(parent, Element)
                and parent.tag_name == "colgroup"
                and parent.namespace == "html"
            ):
                # spec "in column group" anything-else: pop the colgroup and
                # reprocess "in table" — the character tokens foster out
                if stack and stack[-1] is parent:
                    stack.pop()
                parent = insertion_parent(for_text=True, ws=is_ws)
            if (
                not is_ws
                and _is_table_context(parent)
                and insert_fostered(Text(text))
            ):
                continue  # character tokens in a table foster-parent out
            # spec: a newline IMMEDIATELY after <pre>/<listing> is ignored —
            # checked BEFORE formatting reconstruction, which may reparent
            # the text into a reopened clone inside the pre
            if (
                text.startswith("\n")
                and isinstance(parent, Element)
                and parent.tag_name in ("pre", "listing")
                and not parent.child_nodes
            ):
                text = text[1:]
                if not text:
                    continue
            if (active_formatting and parent is not head_el
                    and open_select() is None
                    and token_namespace() == "html"):
                # character tokens reconstruct active formatting (spec in
                # body; "in select" and foreign content insert characters
                # WITHOUT the reconstruct step — integration points count
                # as HTML here, which token_namespace() encodes)
                reconstruct_active()
                if stack:
                    parent = current()
            last = parent.child_nodes[-1] if parent.child_nodes else None
            if isinstance(last, Text):
                last.value += text
            else:
                parent.append_child(Text(text))
        elif kind == "rawtext":
            if token[1]:
                current_parent = current() if stack else insertion_parent(True, False)
                raw = token[1]
                # spec: a newline immediately after <textarea> is ignored
                if (
                    raw.startswith("\n")
                    and isinstance(current_parent, Element)
                    and current_parent.tag_name == "textarea"
                    and not current_parent.child_nodes
                ):
                    raw = raw[1:]
                if raw:
                    current_parent.append_child(Text(raw))
        elif kind == "comment":
            # "after body": comments become children of the html element;
            # "after after body": children of the Document (the reference's
            # doctype + documentElement.outerHTML serialization drops the
            # latter, like parse5's consumers see)
            if post_body == "after_html":
                parent: _ParentNode = document
            elif post_body == "after_body" and html_el is not None:
                parent = html_el
            elif html_el is None and not stack:
                parent = document
            else:
                parent = insertion_parent(ws=True)
            # spec: NULL inside a comment → U+FFFD at the tokenizer
            parent.append_child(Comment(token[1].replace("\x00", "�")))
        elif kind == "doctype":
            if html_el is None and document.doctype is None:
                m = _DOCTYPE_RE.match(token[1])
                if m:
                    name = (m.group(1) or "").lower()
                    public_id = m.group(4) or ""
                    system_id = m.group(6) or m.group(9) or ""
                    document.append_child(DocumentType(name, public_id, system_id))
                    quirks_mode = _doctype_is_quirky(name, public_id, system_id)
        elif kind == "starttag":
            _, tag, attrs, self_closing = token
            post_body = None  # any start tag resumes in-body
            if tag == "html":
                if html_el is None:
                    html_el = Element("html", attrs)
                    document.append_child(html_el)
                else:
                    # spec: a second <html> merges attrs NOT already present
                    for name, value in attrs:
                        if html_el.get_attribute(name) is None:
                            html_el.attrs.append([name, value])
                continue
            if tag == "head":
                if head_el is None and not head_closed:
                    ensure_head()
                    stack.append(head_el)
                continue
            if tag == "body":
                if frameset_el is not None and body_el is None:
                    continue  # "in/after frameset": <body> is ignored
                while stack:
                    stack.pop()
                if body_el is None:
                    ensure_head()
                    body_el = Element("body", attrs)
                    ensure_html().append_child(body_el)
                else:
                    # spec: a second <body> merges attrs not already present
                    for name, value in attrs:
                        if body_el.get_attribute(name) is None:
                            body_el.attrs.append([name, value])
                head_closed = True
                continue
            # "in/after frameset": only frameset/frame/noframes insert — ANY
            # other start tag (foreign roots included) is ignored outright,
            # before namespace dispatch can route it elsewhere
            if frameset_el is not None and body_el is None:
                if tag == "frameset":
                    if stack:  # nested frameset inside the open one
                        element = Element("frameset", attrs)
                        current().append_child(element)
                        stack.append(element)
                elif tag == "frame":
                    if stack:  # "after frameset" ignores stray <frame>
                        current().append_child(Element("frame", attrs))
                elif tag == "noframes":
                    parent = current() if stack else ensure_html()
                    element = Element("noframes", attrs)
                    parent.append_child(element)
                    stack.append(element)  # its rawtext token follows
                elif (tag in _TOKENIZER_RAW or tag in _TOKENIZER_RCDATA
                        or tag == "plaintext"):
                    # ignored raw container: the tokenizer must NOT switch —
                    # its content parses as markup (and is itself ignored
                    # by the frameset modes), never as a body text node
                    tokenizer.suppress_raw = True
                continue
            if (body_el is None and stack and head_el is not None
                    and stack[-1] is head_el and tag not in _HEAD_TAGS):
                # spec "in head" anything-else: any start tag the head
                # cannot hold pops it (→ after head, reprocess) — it must
                # never be appended inside an explicitly open <head>
                stack.pop()
                head_closed = True
            context_ns = token_namespace(tag)
            foreign = context_ns != "html"
            if foreign and (
                tag in _BREAKOUT_TAGS
                or (
                    tag == "font"
                    and any(a[0].lower() in ("color", "face", "size") for a in attrs)
                )
            ):
                # spec breakout: pop the foreign elements, reprocess as HTML
                breakout_foreign()
                context_ns = "html"
                foreign = False
            if not foreign and tag == "image":
                tag = "img"  # spec: change the token's tag name to img
            if tag == "svg":
                element_ns = "svg"
            elif tag == "math":
                element_ns = "math"
            elif foreign:
                element_ns = context_ns
            else:
                element_ns = "html"
            if element_ns == "svg":
                # parse5 re-camelCases SVG tag/attribute names (the attr case
                # survives into serialized output — the reference serializer
                # lowercases TAGS only, dom-parser-node.js:315) and honors
                # self-closing inside foreign content
                tag_out = _SVG_TAG_ADJUST.get(tag, tag)
                attrs = [[_SVG_ATTR_ADJUST.get(a[0], a[0]), a[1]] for a in attrs]
            elif element_ns == "math":
                tag_out = tag
                attrs = [[_MATHML_ATTR_ADJUST.get(a[0], a[0]), a[1]] for a in attrs]
            else:
                tag_out = tag
            foreign = element_ns != "html"

            # "in body" frameset rules (the in/after-frameset modes are
            # handled before namespace dispatch above)
            if not foreign and tag == "frameset":
                if not frameset_ok:
                    continue  # spec: ignored once real body content exists
                if body_el is not None:
                    body_el.remove()
                    body_el = None
                while stack:
                    stack.pop()
                active_formatting.clear()
                ensure_head()  # frameset docs still carry an (empty) head
                frameset_el = Element("frameset", attrs)
                ensure_html().append_child(frameset_el)
                head_closed = True
                stack.append(frameset_el)
                continue
            if not foreign and tag == "frame":
                continue  # <frame> only exists inside a frameset
            if not foreign and tag in _FRAMESET_NOT_OK_TAGS:
                # spec "in body" <input>: a type=hidden input does NOT
                # flip frameset-ok (the one exemption in the list)
                if not (tag == "input" and any(
                        name == "type" and value.lower() == "hidden"
                        for name, value in attrs)):
                    frameset_ok = False

            # "in select" mode: a nested <select> acts as </select>; form
            # controls pop the select first; everything but option/optgroup/
            # script/style/template is ignored outright
            # gate on the CONTEXT namespace (the new element's own namespace
            # is "svg" for an <svg> start tag in HTML content, but the token
            # is still processed by the "in select" rules — which ignore it)
            select_el = open_select()
            if select_el is not None and context_ns == "html":
                if tag == "select":
                    pop_stack_to(select_el)
                    continue
                if tag in ("input", "keygen", "textarea"):
                    pop_stack_to(select_el)
                elif tag in ("caption", "table", "tbody", "tfoot", "thead",
                             "tr", "td", "th") and any(
                    isinstance(node, Element) and node.tag_name == "table"
                    for node in stack
                ):
                    # spec "in select in table": these pop the select, then
                    # the token is processed by the table rules
                    pop_stack_to(select_el)
                elif tag == "hr" or tag == "optgroup":
                    # spec "in select" <hr> / <optgroup>: pop an open
                    # option, then an open optgroup — optgroups never nest
                    # inside a select (unlike "in body", where a second
                    # <optgroup> after </option> DOES nest)
                    if (stack and isinstance(stack[-1], Element)
                            and stack[-1].tag_name == "option"):
                        stack.pop()
                    if (stack and isinstance(stack[-1], Element)
                            and stack[-1].tag_name == "optgroup"):
                        stack.pop()
                elif tag not in ("option", "optgroup", "script", "template"):
                    # spec/parse5 "in select" allow-list: option, optgroup,
                    # script, template (style is NOT allowed — parse5
                    # startTagInSelect ignores it). An ignored raw container
                    # keeps the tokenizer in data state: its content parses
                    # as markup and lands in the select as text
                    if (tag in _TOKENIZER_RAW or tag in _TOKENIZER_RCDATA
                            or tag == "plaintext"):
                        tokenizer.suppress_raw = True
                    continue

            if (
                tag in _TABLE_STRUCTURE_TAGS
                and not foreign
                and not any(
                    isinstance(node, Element)
                    and node.tag_name in ("table", "template")
                    for node in stack
                )
            ):
                continue  # spec "in body": stray td/th/tr/sections are ignored

            if tag == "form" and not foreign:
                template_open = any(
                    isinstance(node, Element) and node.tag_name == "template"
                    for node in stack
                )
                if form_el is not None and not template_open:
                    # spec form-element pointer: a nested <form> is ignored
                    continue
                if template_open and stack and isinstance(stack[-1], Element) \
                        and stack[-1].namespace == "html" \
                        and stack[-1].tag_name in (
                            "table", "tbody", "thead", "tfoot", "tr"):
                    # spec "in table" <form>: with a template on the stack
                    # the token is ignored OUTRIGHT (no insert-and-pop)
                    continue

            element = Element(tag_out, attrs, namespace=element_ns)
            in_head_insert = False
            if not stack:
                # spec "after head": metadata start tags between </head> and
                # <body> are pushed BACK into the head (everything in
                # _HEAD_TAGS except noscript, which implies <body> there)
                if (body_el is None and tag in _HEAD_TAGS
                        and not (head_closed and tag == "noscript")):
                    parent = ensure_head()
                    in_head_insert = True
                else:
                    parent = ensure_body()
            else:
                if not foreign:
                    # foreign-dispatched tokens insert plain foreign
                    # elements — the in-body implied-end rules (option
                    # pops option, td pops td, …) are HTML-content only
                    auto_close(tag)
                if tag == "table" and not foreign:
                    # spec "in table" <table>: acts as </table> then
                    # reprocesses — the new table becomes a SIBLING after
                    # the closed one (never a fostered child before it).
                    # Only from table-structure context: a table inside a
                    # cell/caption nests normally.
                    for index in range(len(stack) - 1, -1, -1):
                        node = stack[index]
                        if not isinstance(node, Element):
                            break
                        name = node.tag_name
                        if name == "table":
                            prune_stack(index)
                            break
                        if name not in ("tbody", "thead", "tfoot", "tr", "colgroup"):
                            break
                if tag in _TABLE_STRUCTURE_TAGS and not foreign:
                    # (foreign-dispatched table tags — e.g. <colgroup>
                    # inside <svg><math> — are ordinary foreign elements
                    # and must not clear the HTML table context)
                    # "clear the stack back to" the spec context for THIS
                    # tag: sections/caption/colgroup clear to the table
                    # itself (closing any open section/row/cell), <tr>
                    # clears to a section, td/th to a row; a <col> while its
                    # colgroup is open stays there ("in column group").
                    if tag in ("td", "th"):
                        table_context = ("table", "tbody", "thead", "tfoot",
                                         "tr", "template")
                    elif tag == "tr":
                        table_context = ("table", "tbody", "thead", "tfoot",
                                         "template")
                    elif tag == "col":
                        table_context = ("table", "template", "colgroup")
                    else:  # caption colgroup tbody thead tfoot
                        table_context = ("table", "template")
                    for index in range(len(stack) - 1, -1, -1):
                        node = stack[index]
                        if isinstance(node, Element) and node.tag_name in table_context:
                            prune_stack(index + 1)
                            break
                # auto_close may have emptied the stack (an implied end tag
                # at body level); document is never the insertion point
                parent = current() if stack else insertion_parent()
            if tag in ("a", "nobr") and not foreign:
                # spec: a new <a>/<nobr> with an ACTIVE entry runs the full
                # adoption agency for its own tag first (so <a>1<div>2<a>3
                # splits around the div instead of tearing it out), then any
                # remaining entry/stack element is removed before the new
                # one is placed
                has_entry = False
                for entry in reversed(active_formatting):
                    if entry is _AF_MARKER:
                        break
                    if entry.tag_name.lower() == tag:
                        has_entry = True
                        break
                if has_entry:
                    adoption_agency(tag)
                    remove_active(tag)
                    for index in range(len(stack) - 1, -1, -1):
                        node = stack[index]
                        if isinstance(node, Element) and node.tag_name == tag:
                            del stack[index]
                            break
                    parent = current() if stack else insertion_parent()
            if (
                active_formatting
                # dispatch-context gate, NOT the element namespace: an
                # <svg>/<math> ROOT in HTML content follows the in-body
                # rule (reconstruct, THEN insert the foreign element) even
                # though the element itself is foreign
                and context_ns == "html"
                and not in_head_insert
                and tag not in _NO_RECONSTRUCT_TAGS
                # "in select" has its own option/optgroup rules WITHOUT the
                # reconstruct step (formatting never reconstructs into an
                # open select)
                and (tag not in ("option", "optgroup")
                     or open_select() is None)
            ):
                # phrasing start tags reconstruct active formatting (spec
                # "any other start tag" + the formatting tags themselves)
                reconstruct_active()
                if stack:
                    parent = current()

            fostered = False
            if _is_table_context(parent):
                allowed = _TABLE_ALLOWED[parent.tag_name]
                if tag in allowed:
                    parent = synthesize_table_structure(parent, tag)
                elif tag == "input" and any(
                    name == "type" and value.lower() == "hidden"
                    for name, value in attrs
                ):
                    pass  # spec "in table": a hidden input stays in place
                else:
                    fostered = insert_fostered(element)
            if not fostered:
                parent.append_child(element)
            form_in_table = False
            if tag == "form" and not foreign:
                # spec form-element pointer: set ONLY when no template is on
                # the stack (a form inside template content must not make
                # later top-level <form> tokens be ignored)
                if not any(
                    isinstance(node, Element) and node.tag_name == "template"
                    for node in stack
                ):
                    form_el = element
                # spec "in table" <form>: insert, set the pointer, and pop
                # IMMEDIATELY — the form stays empty and following content
                # (e.g. a non-hidden <input>) fosters out of the table
                # instead of nesting inside the form
                form_in_table = not fostered and _is_table_context(parent)

            if not foreign:
                if tag in _FORMATTING_TAGS:
                    # Noah's-ark clause: at most 3 identical entries
                    identical = [
                        e for e in active_formatting
                        if e is not _AF_MARKER
                        and e.tag_name == element.tag_name and e.attrs == element.attrs
                    ]
                    if len(identical) >= 3:
                        active_formatting.remove(identical[0])
                    active_formatting.append(element)
                elif tag in _MARKER_TAGS:
                    # spec "insert a marker": formatting never crosses INTO a
                    # cell/caption/template/applet/marquee/object;
                    # pre-boundary formatting survives past it (the marker
                    # is popped with the element in prune_stack)
                    active_formatting.append(_AF_MARKER)

            is_void = tag in VOID_TAGS
            # spec: the self-closing flag is ignored on EVERY html-namespace
            # element (custom elements like <x-app/> stay open, as parse5
            # does); it is honored only in foreign content
            closes_itself = self_closing and foreign
            if not is_void and not closes_itself and not form_in_table and tag not in _TOKENIZER_RAW and tag != "plaintext" and tag not in _TOKENIZER_RCDATA:
                stack.append(element)
            elif not closes_itself and (
                tag in _TOKENIZER_RAW or tag in _TOKENIZER_RCDATA or tag == "plaintext"
            ):
                # raw content is delivered as a single following rawtext token;
                # push so it lands inside, popped by the implicit end tag below
                # (plaintext never gets one — it stays open to EOF per spec)
                stack.append(element)
        elif kind == "endtag":
            tag = token[1]
            if tag not in ("body", "html"):
                post_body = None  # any other end tag resumes in-body
            if (body_el is None and stack and head_el is not None
                    and stack[-1] is head_el and tag != "head"):
                # spec "in head" end tags: body/html/br act as anything
                # else (pop the head, reprocess after head); any other end
                # tag is a parse error and IGNORED — never the in-body
                # </p>/</br> quirks inside the head
                if tag in ("body", "html", "br"):
                    stack.pop()
                    head_closed = True
                else:
                    continue
            if tag in ("br", "p") and token_namespace(tag) == "html":
                if frameset_el is not None and body_el is None:
                    continue  # "in/after frameset": ignored
            if (open_select() is not None
                    and token_namespace(tag) == "html"
                    and tag not in ("option", "optgroup", "select",
                                    "template", "script")):
                # spec "in select": any other end tag is IGNORED — no
                # adoption agency, no formatting reconstruction into the
                # select. Exception ("in select in table"): table-family
                # end tags with a real table open pop the select and close
                # the table element (the generic walk below does both).
                if not (tag in ("table", "tbody", "tfoot", "thead", "tr",
                                "td", "th", "caption")
                        and any(isinstance(node, Element)
                                and node.tag_name == "table"
                                and node.namespace == "html"
                                for node in stack)):
                    continue
            if tag == "br" and token_namespace("br") == "html":
                # spec: </br> acts as a <br> START tag (no end-tag form) —
                # including its frameset-ok effect
                frameset_ok = False
                if active_formatting:
                    reconstruct_active()
                parent = current() if stack else insertion_parent()
                element = Element("br")
                if not (_is_table_context(parent)
                        and insert_fostered(element)):
                    parent.append_child(element)
                continue
            if tag == "p" and token_namespace("p") == "html":
                # spec: </p> with no p in button scope inserts an EMPTY p
                # (foster-parented out of table structure like any insert);
                # otherwise it closes the scoped p (never one beyond the
                # button-scope boundary)
                if not pop_scoped(_P_TARGET, _BUTTON_SCOPE_BOUNDARY):
                    parent = current() if stack else insertion_parent()
                    element = Element("p")
                    if not (_is_table_context(parent)
                            and insert_fostered(element)):
                        parent.append_child(element)
                continue
            if tag == "head":
                if stack and stack[-1] is head_el:
                    stack.pop()
                head_closed = True
                continue
            if tag in ("body", "html"):
                # spec: in body these only switch insertion mode — the stack
                # is NOT popped, so content after a stray </body>/</html>
                # resumes inside the still-open element (<p>a</body>b →
                # <p>ab). But while the HEAD is still open they reprocess
                # through "in head" anything-else: pop the head, imply the
                # body, and later content lands in <body>, not <head>.
                if body_el is None and frameset_el is None:
                    if head_el is not None and any(
                            n is head_el for n in stack):
                        pop_stack_to(head_el)
                    ensure_body()
                head_closed = True
                # </body> → "after body"; </html> → "after after body"
                post_body = "after_html" if tag == "html" else "after_body"
                continue
            if tag == "form" and token_namespace("form") == "html":
                template_open = any(
                    isinstance(node, Element) and node.tag_name == "template"
                    for node in stack
                )
                if not template_open:
                    # spec "in body" </form> (no template on the stack):
                    # take the POINTED form, null the pointer, and — only if
                    # that node is in default scope — generate implied end
                    # tags and REMOVE it from the stack in place (elements
                    # above it stay open: <form><div></form>x keeps x in the
                    # div). A pointer hidden behind a table boundary means
                    # the token is ignored (<form><table></form> keeps the
                    # form open in the tree), and a null pointer ignores the
                    # token outright.
                    node = form_el
                    form_el = None
                    in_scope = False
                    for entry in reversed(stack):
                        if entry is node:
                            in_scope = True
                            break
                        if _scope_hides(entry):
                            break
                    if node is None or not in_scope:
                        continue  # spec: ignore the token
                    while (stack and isinstance(stack[-1], Element)
                           and stack[-1] is not node
                           and stack[-1].namespace == "html"
                           and stack[-1].tag_name in _IMPLIED_END_TAGS):
                        prune_stack(len(stack) - 1)
                    for index in range(len(stack) - 1, -1, -1):
                        if stack[index] is node:
                            del stack[index]
                            break
                    continue
                # template on the stack: fall through to the generic
                # pop-to-form-in-scope handling (the template boundary in
                # the loop below hides a form outside the template)
            if tag in _FORMATTING_TAGS:
                # spec foreign-content "any other end tag": when a FOREIGN
                # element matching the tag sits above the nearest HTML
                # element (only <a> can — every other formatting name is a
                # breakout tag), the token just pops it; the HTML adoption
                # agency must not run (it would close the OUTER html <a>:
                # <a>1<svg><a>2</a></svg>3 keeps 3 inside the outer a)
                foreign_match = False
                for node in reversed(stack):
                    if not isinstance(node, Element) or node.namespace == "html":
                        break
                    if node.tag_name.lower() == tag:
                        foreign_match = True
                        break
                if not foreign_match and adoption_agency(tag):
                    continue
            # spec "any other end tag" / block end tags: a scope-boundary
            # element (cell, caption, table, template, foreign integration
            # point) between the top and the match HIDES the target — the
            # token is ignored instead of destroying the open structure.
            # Table-structure end tags keep prune-through (they emulate the
            # "in table"/"in row"/"in cell" pop-to rules).
            boundary_stop = tag not in (
                "table", "tbody", "thead", "tfoot", "tr", "td", "th",
                "caption", "colgroup", "col", "select")
            # option/optgroup end tags are "any other end tag" in body
            # (special-category stop); in a select only option/optgroup can
            # separate them from their match, so the same loop serves both
            # table-structure end tags use TABLE scope (html/table/template
            # boundaries): a nested table or an open template hides the
            # target and the token is ignored — "in table" ignores stray
            # td/th/tr/section end tags instead of destroying the inner
            # structure. </table> itself matches the nearest table but is
            # still hidden by a template.
            if tag in ("tbody", "thead", "tfoot", "tr", "td", "th",
                       "caption", "colgroup", "col"):
                table_scope_stop = ("table", "template")
            elif tag == "table":
                table_scope_stop = ("template",)
            else:
                table_scope_stop = ()
            # </select> uses SELECT scope: every element type except
            # option/optgroup hides the target (spec "has a select in
            # select scope") — in particular an open template, so
            # <select><template>a</select> keeps both open
            select_scope = tag == "select"
            any_other = (boundary_stop and tag not in _OWN_RULE_END_TAGS
                         and tag not in _FORMATTING_TAGS)
            for index in range(len(stack) - 1, -1, -1):
                node = stack[index]
                # .lower(): foreign-content tag names are stored camelCase
                if isinstance(node, Element) and (
                        node.tag_name.lower() == tag
                        # spec heading end tags close the NEAREST open
                        # heading of any rank (</h2> pops an open <h1>)
                        or (tag in _HEADING_TAGS
                            and node.namespace == "html"
                            and node.tag_name in _HEADING_TAGS)):
                    prune_stack(index)
                    break
                if boundary_stop and _scope_hides(node):
                    break  # target hidden by the boundary — ignore token
                if (any_other and isinstance(node, Element)
                        and _is_special_element(node)):
                    # spec "any other end tag": a special-category element
                    # between the current node and the match IGNORES the
                    # token (</span>/<\/option> never close through <div>)
                    break
                if (table_scope_stop and isinstance(node, Element)
                        and node.namespace == "html"
                        and node.tag_name in table_scope_stop):
                    break  # hidden by table scope — ignore token
                if select_scope and isinstance(node, Element) and not (
                        node.namespace == "html"
                        and node.tag_name in ("option", "optgroup")):
                    break  # hidden by select scope — ignore token

    # rawtext elements pushed above may remain if their end tag never came

    # EOF: every non-frameset document gets an implied <body> (spec "after
    # head"/"in head" EOF reprocessing; parse5 emits html/head/body even for
    # empty input)
    if frameset_el is None and body_el is None:
        ensure_body()
    return document


# ---------------------------------------------------------------------------
# serializer (dom-parser-node.js:263-371)


def _should_escape_entities(text_node: Text) -> bool:
    parent = text_node.parent_node
    tag = getattr(parent, "tag_name", None)
    return bool(tag) and tag.lower() not in RAW_TEXT_TAGS


def _should_escape_text(text_node: Text) -> bool:
    parent = text_node.parent_node
    tag = getattr(parent, "tag_name", None)
    if not tag:
        return False
    tag = tag.lower()
    if tag == "style":
        return True
    if tag == "script":
        parent_type = parent.get_attribute("type") if isinstance(parent, Element) else None
        return not parent_type or parent_type == _JAVASCRIPT_MIME_TYPE
    return False


def _serialize_text(text_node: Text) -> str:
    if _should_escape_entities(text_node):
        return _TEXT_ESCAPE_RE.sub(
            lambda m: _TEXT_ESCAPE_ENTITIES[m.group(0)], text_node.value
        )
    if _should_escape_text(text_node):
        value = _CLOSING_TAG_MARKER_RE.sub("<\\/", text_node.value)
        return _SELF_CLOSING_TAG_MARKER_RE.sub("\\/>", value)
    return text_node.value


def _escape_attribute(value: str) -> str:
    return _ATTRIBUTE_ESCAPE_RE.sub(
        lambda m: _ATTRIBUTE_ESCAPE_ENTITIES[m.group(0)], value
    )


def _serialize_element(element: Element) -> str:
    tag = element.tag_name.lower()
    parts = ["<", tag]
    # an attribute whose name cannot be written is dropped before joining, so
    # it does not leave a gap between the ones around it
    attributes = " ".join(
        f'{name}="{_escape_attribute(value)}"'
        for name, value in element.attrs
        if not _INVALID_ATTR_NAME_RE.search(name)
    )
    if attributes:
        parts.extend([" ", attributes])
    parts.append(">")
    children = (
        element.content.child_nodes
        if tag == "template" and element.content is not None
        else element.child_nodes
    )
    parts.extend(serialize(child) for child in children)
    if tag not in VOID_TAGS:
        parts.extend(["</", tag, ">"])
    return "".join(parts)


def serialize(node: Node) -> str:
    if isinstance(node, Text):
        return _serialize_text(node)
    if isinstance(node, Comment):
        return f"<!--{node.data}-->"
    if isinstance(node, (Fragment, Document)):
        return "".join(serialize(child) for child in node.child_nodes)
    if isinstance(node, DocumentType):
        return serialize_doctype(node)
    return _serialize_element(node)  # type: ignore[arg-type]


def serialize_doctype(doctype: DocumentType) -> str:
    result = f"<!DOCTYPE {doctype.name}"
    if doctype.public_id:
        result += f' PUBLIC "{doctype.public_id}"'
    if doctype.system_id:
        result += f' "{doctype.system_id}"'
    return result + ">"


class DOM:
    """parseDOM result shape (util.js:315-334): a document plus serialize()."""

    __slots__ = ("document",)

    def __init__(self, document: Document) -> None:
        self.document = document

    def serialize(self) -> str:
        result = ""
        doctype = self.document.doctype
        if doctype is not None:
            result += serialize_doctype(doctype) + "\n"
        root = self.document.document_element
        if root is not None:
            result += root.outer_html
        return result


def parse_dom(source: str, content_type: str | None = "text/html") -> DOM:
    """Parse markup; like the reference's injected DOMParser the content type
    is accepted but everything parses as HTML, and a missing head is created
    (dom-parser-node.js:147-156)."""
    document = parse_html(source)
    if document.document_element is None:
        # ensure a root exists even for pathological input
        document.append_child(Element("html"))
    if document.head is None:
        head = document.create_element("head")
        document.document_element.prepend(head)
    return DOM(document)
