"""MHTML / MIME-multipart archive parser.

A faithful re-expression of the reference's parse state machine
(`/root/reference/lib/parse.js:68-473`): four states HEADERS → CONTENT →
DATA → END, line-oriented scanning, recovery paths for the malformed shapes
browsers actually produce, the selective decode policy (only the index
document, Content-ID'd documents and stylesheets are text-decoded; everything
else stays encoded byte-exact for data-URI inlining), and the charset cascade
(BOM > meta charset > meta http-equiv > declared header charset > UTF-8).

Runs per row inside the Ray extraction stage; no Ray imports here.
"""

from __future__ import annotations

from . import css as cssmod
from .bytesops import (
    decode_base64_bytes,
    encode_base64,
    ends_with_crlf,
    ends_with_lf,
    find_boundary_delimiter,
    get_bom_charset,
    get_boundary,
    get_charset,
    is_document,
    is_line_feed,
    is_multipart,
    is_multipart_alternative,
    is_stylesheet,
    is_text,
    replace_charset,
    starts_with_boundary,
    starts_with_markup,
)
from .charsets import decode_string, encode_string
from .dom import DOM, parse_dom
from .headers import is_header_line, parse_header_line
from .urlutil import normalize_location

MHTML_HEADERS = 0
MHTML_CONTENT = 1
MHTML_DATA = 2
MHTML_END = 3

QUOTED_PRINTABLE = "quoted-printable"
BASE64 = "base64"
BINARY = "binary"
CONTENT_TYPE = "content-type"
CONTENT_TRANSFER_ENCODING = "content-transfer-encoding"
CONTENT_ID = "content-id"
CONTENT_LOCATION = "content-location"
UTF8 = "utf-8"
GENERATED_ID_PREFIX = "_"
TEXT_HTML = "text/html"

ANOMALY_MISLABELED_DOCUMENT = "document-mislabeled-as-archive"
ANOMALY_UNUSED_BOUNDARY = "declared-boundary-unused"
ANOMALY_MISSING_DELIMITERS = "multipart-without-delimiters"
ANOMALY_UNDECODABLE_BASE64 = "base64-left-encoded"
ANOMALY_INDEX_SYNTHESIZED = "index-synthesized"

REPLACEMENT_CHARACTER = "�"

_EQUALS = 0x3D
_CR = 0x0D
_LF = 0x0A


class Resource:
    """One MIME part (parse.js:251-296 / mod.d.ts:251-268). ``data`` is a str
    after processing: decoded text, or a base64 string when the part stays
    encoded (transfer_encoding == 'base64')."""

    __slots__ = (
        "id",
        "content_type",
        "transfer_encoding",
        "data",
        "used",
        "not_found",
        "raw_data",
        "dom",
        "dom_data",
    )

    def __init__(self, id: str | None, content_type: str | None, transfer_encoding: str | None):
        self.id = id
        self.content_type = content_type
        self.transfer_encoding = transfer_encoding
        self.data: object = _ChunkData()
        self.used = False
        self.not_found = False
        self.raw_data: bytes | None = None
        self.dom: DOM | None = None
        self.dom_data: object = None


class MHTML:
    """Parse result: top-level headers, resources keyed by every address a
    reference may use, frames keyed by Content-ID, the index id, anomalies."""

    __slots__ = ("headers", "frames", "resources", "index", "anomalies", "id", "unfound_resources")

    def __init__(self, headers, frames, resources, index, anomalies):
        self.headers = headers
        self.frames = frames
        self.resources = resources
        self.index = index
        self.anomalies = anomalies
        self.id: str | None = None
        self.unfound_resources: set | None = None


class _ChunkData:
    """Chunked body accumulator with suffix ops (parse.js:476-545)."""

    __slots__ = ("chunks", "length")

    def __init__(self) -> None:
        self.chunks: list[bytes] = []
        self.length = 0

    def append(self, chunk: bytes) -> None:
        if len(chunk):
            self.chunks.append(chunk)
            self.length += len(chunk)

    def byte_from_end(self, offset_from_end: int) -> int | None:
        offset = offset_from_end
        for chunk in reversed(self.chunks):
            if len(chunk) >= offset:
                return chunk[len(chunk) - offset]
            offset -= len(chunk)
        return None

    def truncate(self, count: int) -> None:
        self.length -= count
        remaining = count
        while remaining:
            chunk = self.chunks[-1]
            if len(chunk) > remaining:
                self.chunks[-1] = chunk[: len(chunk) - remaining]
                remaining = 0
            else:
                self.chunks.pop()
                remaining -= len(chunk)

    def truncate_line_terminator(self) -> None:
        # the line break before a delimiter belongs to the delimiter
        if self.length > 1 and self.byte_from_end(2) == _CR and self.byte_from_end(1) == _LF:
            self.truncate(2)
        elif self.length > 0 and self.byte_from_end(1) == _LF:
            self.truncate(1)

    def flatten(self) -> bytes:
        return b"".join(self.chunks)


class _Context:
    __slots__ = ("resources", "frames", "anomalies", "index", "dom_parser")

    def __init__(self, resources=None, frames=None, anomalies=None, index=None,
                 dom_parser=None):
        self.resources = resources if resources is not None else {}
        self.frames = frames if frames is not None else {}
        self.anomalies = anomalies if anomalies is not None else []
        self.index = index
        # injectable HTML parser backend (the reference's DOMParser option,
        # mod.d.ts:125-195): anything with parse_dom's (data, content_type)
        # → DOM contract
        self.dom_parser = dom_parser or parse_dom


def parse(mhtml: bytes | str, context: _Context | None = None,
          dom_parser=None) -> MHTML:
    if isinstance(mhtml, str):
        mhtml = encode_string(mhtml)
    if context is None:
        context = _Context(dom_parser=dom_parser)
    elif dom_parser is not None:
        context.dom_parser = dom_parser
    parser = _Parser(mhtml, context)
    return parser.run()


class _Parser:
    def __init__(self, mhtml: bytes, context: _Context) -> None:
        self.m = mhtml
        self.ctx = context
        self.headers: dict[str, str] = {}
        self.raw_header_lines: list[bytes] = []
        self.resource: Resource | None = None
        self.transfer_encoding: str | None = None
        self.content_id: str | None = None
        self.boundary: str | None = None
        self.boundary_bytes: bytes | None = None
        self.header_key: str | None = None
        self.declared_boundary_unused = False
        self.content: dict[str, str] = {}
        self.i = 0
        self.index_generated_id = 0
        self.index_start_embedded: int | None = None

    # --- line scanning (parse.js:185-196) ---
    def get_line(self, transfer_encoding: str | None = None) -> bytes:
        m = self.m
        start = self.i
        lf = m.find(b"\n", start)
        self.i = len(m) + 1 if lf == -1 else lf + 1
        line = m[start : min(self.i, len(m))]
        if transfer_encoding == QUOTED_PRINTABLE:
            from .bytesops import decode_quoted_printable

            return decode_quoted_printable(line)
        return line

    def split_headers(self, line: bytes, obj: dict[str, str]) -> None:
        self.header_key = parse_header_line(decode_string(line), obj, self.header_key)

    def run(self) -> MHTML:
        m = self.m
        ctx = self.ctx
        resources, frames, anomalies = ctx.resources, ctx.frames, ctx.anomalies
        # Word saves plain HTML as .mht; its markup would otherwise be read as
        # headers (parse.js:87-96)
        if starts_with_markup(m):
            anomalies.append({"type": ANOMALY_MISLABELED_DOCUMENT})
            self.headers[CONTENT_TYPE] = TEXT_HTML
            self.init_resource(self.headers)
            self.resource.data.append(m)
            self.process_resource()
            return MHTML(self.headers, frames, resources, ctx.index, anomalies)

        state = MHTML_HEADERS
        # a part whose body is empty ends the file on the blank line closing
        # its headers; the resource still has to be recorded (parse.js:97-100)
        while state != MHTML_END and (self.i < len(m) or state == MHTML_DATA):
            if state == MHTML_HEADERS:
                next_line = self.get_line()
                if not is_line_feed(next_line):
                    self.raw_header_lines.append(next_line)
                    self.split_headers(next_line, self.headers)
                else:
                    content_type = self.headers.get(CONTENT_TYPE)
                    if content_type:
                        self.set_boundary(get_boundary(content_type))
                    if self.boundary:
                        index_start_body = self.i
                        while (
                            find_boundary_delimiter(next_line, self.boundary_bytes) == -1
                            and self.i < len(m) - 1
                        ):
                            next_line = self.get_line()
                        # the declared boundary is not always the one the body
                        # uses: rewind and take the one it does (parse.js:115-123)
                        if find_boundary_delimiter(next_line, self.boundary_bytes) == -1:
                            self.i = index_start_body
                            self.set_boundary(None)
                            self.declared_boundary_unused = True
                    if not self.boundary:
                        previous_index = self.i
                        next_line = self.get_line(self.transfer_encoding)
                        if starts_with_boundary(next_line):
                            self.set_boundary(decode_string(next_line)[2:].rstrip())
                            # only reported when a replacement was found
                            if self.declared_boundary_unused:
                                anomalies.append({"type": ANOMALY_UNUSED_BOUNDARY})
                        else:
                            self.i = previous_index
                    self.content = {}
                    state = MHTML_CONTENT
            elif state == MHTML_CONTENT:
                if self.boundary:
                    # NOTE deliberate reference-parity bug: after an embedded
                    # multipart/alternative conversion the start offset is
                    # only cleared by a NON-alternative part, so a second
                    # consecutive alternative part re-parses a span covering
                    # both (parse.js indexStartEmbeddedMhtml behaves the
                    # same; byte-parity outranks the fix)
                    if self.index_start_embedded is None:
                        self.index_start_embedded = self.i
                    next_line = self.get_line()
                    if not is_line_feed(next_line):
                        self.split_headers(next_line, self.content)
                    else:
                        self.init_resource(self.content)
                        if not self.resource.content_type or not is_multipart_alternative(
                            self.resource.content_type
                        ):
                            self.index_start_embedded = None
                        state = MHTML_DATA
                else:
                    # with no boundary the body is everything that is left
                    # (parse.js:156-165)
                    missing_delimiters = is_multipart(self.headers.get(CONTENT_TYPE))
                    if missing_delimiters:
                        anomalies.append({"type": ANOMALY_MISSING_DELIMITERS})
                    self.init_resource(
                        self.read_body_headers() if missing_delimiters else self.headers
                    )
                    state = MHTML_DATA
            else:  # MHTML_DATA
                index_end_data = self.parse_resource_data()
                if self.index_start_embedded is not None and index_end_data is not None:
                    self.resource.data = self.resource.data.flatten()
                    self.resource.used = True
                    ctx.index = self.convert_embedded_mhtml(index_end_data)
                else:
                    self.process_resource()
                state = MHTML_END if self.i >= len(m) - 1 else MHTML_CONTENT
        return MHTML(self.headers, frames, resources, ctx.index, anomalies)

    def set_boundary(self, value: str | None) -> None:
        self.boundary = value
        self.boundary_bytes = None if value is None else encode_string(value)

    def decode_raw_headers(self, charset: str | None) -> None:
        """Re-decode raw header lines once the document charset is known,
        keeping survivors (parse.js:198-216)."""
        if charset is None or charset == UTF8:
            return
        if not any(REPLACEMENT_CHARACTER in value for value in self.headers.values()):
            return
        decoded_headers: dict[str, str] = {}
        decoded_key: str | None = None
        for line in self.raw_header_lines:
            decoded_key = parse_header_line(decode_string(line, charset), decoded_headers, decoded_key)
        for name, value in self.headers.items():
            if REPLACEMENT_CHARACTER in value and decoded_headers.get(name) is not None:
                self.headers[name] = decoded_headers[name]

    def read_body_headers(self) -> dict[str, str]:
        """The promised delimiters never turned up: what follows is either the
        headers of the one part left, or its body already (parse.js:218-244)."""
        m = self.m
        index_start_body = self.i
        if starts_with_markup(m[self.i :]):
            return {CONTENT_TYPE: TEXT_HTML}
        body_headers: dict[str, str] = {}
        self.header_key = None
        index_before_line = self.i
        next_line = self.get_line()
        while (
            len(next_line)
            and not is_line_feed(next_line)
            and is_header_line(decode_string(next_line), len(body_headers))
        ):
            self.split_headers(next_line, body_headers)
            index_before_line = self.i
            next_line = self.get_line()
        if body_headers.get(CONTENT_TYPE) is None:
            self.i = index_start_body
            return self.headers
        if not is_line_feed(next_line):
            # the line was already part of the body
            self.i = index_before_line
        return body_headers

    def init_resource(self, resource_data: dict[str, str]) -> None:
        """Id precedence Content-Location → Content-ID → deterministic ``_N``;
        registers normalized, as-written and cid aliases; first document
        becomes the index; first part per id wins (parse.js:251-296)."""
        ctx = self.ctx
        resources, frames = ctx.resources, ctx.frames
        self.transfer_encoding = resource_data.get(CONTENT_TRANSFER_ENCODING)
        content_type = resource_data.get(CONTENT_TYPE)
        self.content_id = resource_data.get(CONTENT_ID)
        id_value = resource_data.get(CONTENT_LOCATION)
        if self.transfer_encoding:
            self.transfer_encoding = self.transfer_encoding.lower()
        resource = Resource(id_value, content_type, self.transfer_encoding)
        if id_value is None:
            if self.content_id is not None:
                id_value = self.content_id
            else:
                while True:
                    id_value = GENERATED_ID_PREFIX + str(self.index_generated_id)
                    self.index_generated_id += 1
                    if id_value not in resources:
                        break
        written_id = id_value
        id_value = normalize_location(id_value)
        resource.id = id_value
        if ctx.index is None and is_document(content_type):
            ctx.index = id_value
        if self.content_id is not None:
            frames[self.content_id] = resource
            # also reachable as a resource, so a cid: reference outside a
            # frame finds it
            if self.content_id not in resources:
                resources[self.content_id] = resource
        if id_value not in resources:
            resources[id_value] = resource
        # the address as written stays reachable, for a reference that is
        # never normalized
        if written_id != id_value and written_id not in resources:
            resources[written_id] = resource
        self.resource = resource
        self.content = {}
        self.header_key = None

    def parse_resource_data(self) -> int | None:
        """Accumulate body lines, resolving QP soft breaks and base64 line
        breaks inline; the terminator before the delimiter belongs to the
        delimiter (parse.js:298-336)."""
        resource = self.resource
        data: _ChunkData = resource.data
        next_line = self.get_line(self.transfer_encoding)
        index_end_data: int | None = None
        boundary_found = False
        while not boundary_found and len(next_line):
            index_end_data = self.i
            index_boundary = find_boundary_delimiter(next_line, self.boundary_bytes)
            if index_boundary != -1:
                index_end_data = index_end_data - len(next_line) + index_boundary - 2
                if index_boundary > 2:
                    next_line = next_line[: index_boundary - 2]
                else:
                    next_line = b""
                boundary_found = True
            if resource.transfer_encoding == QUOTED_PRINTABLE:
                if (
                    data.length > 2
                    and data.byte_from_end(3) == _EQUALS
                    and ends_with_crlf(next_line)
                ):
                    data.truncate(3)
                elif (
                    data.length > 1
                    and data.byte_from_end(2) == _EQUALS
                    and ends_with_lf(next_line)
                ):
                    data.truncate(2)
            elif resource.transfer_encoding == BASE64:
                if ends_with_crlf(next_line):
                    next_line = next_line[:-2]
                elif ends_with_lf(next_line):
                    next_line = next_line[:-1]
            data.append(next_line)
            if not boundary_found:
                next_line = self.get_line(self.transfer_encoding)
        data.truncate_line_terminator()
        if not boundary_found and self.boundary:
            index_end_data = self.i
        return index_end_data

    def convert_embedded_mhtml(self, index_end: int) -> str | None:
        """multipart/alternative part → recursive parse over the sub-span,
        sharing resources/frames/anomalies; child index wins (parse.js:338-348)."""
        sub_context = _Context(self.ctx.resources, self.ctx.frames, self.ctx.anomalies,
                               dom_parser=self.ctx.dom_parser)
        embedded = self.m[self.index_start_embedded : index_end]
        if ends_with_crlf(embedded):
            index_end -= 2
        elif ends_with_lf(embedded):
            index_end -= 1
        parse(self.m[self.index_start_embedded : index_end], sub_context)
        return sub_context.index

    def process_resource(self) -> None:
        """Selective decode policy + charset cascade (parse.js:350-399)."""
        resource = self.resource
        ctx = self.ctx
        data_bytes = resource.data.flatten()
        resource.raw_data = data_bytes
        declared_charset = get_charset(resource.content_type) if resource.content_type else None
        # only parts shown as text — the index, Content-ID'd documents, and
        # stylesheets — are decoded here; everything else stays encoded
        # byte-exact for data-URI inlining, mislabeled text/* included
        if (
            resource.transfer_encoding == BASE64
            and resource.content_type
            and (
                resource.id == ctx.index
                or (self.content_id is not None and is_document(resource.content_type))
                or is_stylesheet(resource.content_type)
            )
        ):
            decoded = decode_base64_bytes(decode_string(data_bytes))
            if decoded is not None:
                resource.transfer_encoding = None
                data_bytes = decoded
                resource.raw_data = decoded
            else:
                ctx.anomalies.append({"type": ANOMALY_UNDECODABLE_BASE64, "id": resource.id})
        bom_charset = get_bom_charset(data_bytes)
        charset = bom_charset or declared_charset
        if resource.transfer_encoding == BINARY and (
            not resource.content_type or not is_text(resource.content_type)
        ):
            resource.transfer_encoding = BASE64
            resource.data = encode_base64(data_bytes)
        else:
            resource.data = decode_string(data_bytes, charset)
        if resource.content_type:
            # relabel only transcoded bytes: a part kept encoded still carries
            # the bytes as written
            if resource.transfer_encoding != BASE64:
                resource.content_type = replace_charset(resource.content_type, UTF8)
            if is_stylesheet(resource.content_type):
                self.process_stylesheet_charset(charset, bom_charset)
            elif is_document(resource.content_type):
                document_charset = self.process_document_charset(charset, bom_charset)
                if resource.id == ctx.index:
                    self.decode_raw_headers(document_charset)
        resource.raw_data = None

    def process_stylesheet_charset(self, charset: str | None, bom_charset: str | None) -> None:
        """@charset handling (parse.js:404-421): the rule is removed whatever
        happens; re-decoding is refused when a BOM already settled it."""
        resource = self.resource
        css_charset = cssmod.read_leading_charset(resource.data)
        if css_charset is None:
            return
        if bom_charset is None and css_charset != UTF8 and css_charset != charset:
            resource.data = decode_string(resource.raw_data, css_charset)
        resource.data = cssmod.rewrite_stylesheet(
            cssmod.remove_leading_charset(resource.data),
            lambda value: None,
            lambda value: None,
        )

    def process_document_charset(self, charset: str | None, bom_charset: str | None) -> str | None:
        """Meta charset cascade (parse.js:423-473): the first declaration
        decides how the bytes are read; ALL declarations are removed; one
        serialize at the end, then a re-parse because serialization is not
        idempotent."""
        resource = self.resource
        document_charset = charset
        modified = False
        content_type = resource.content_type.split(";")[0]
        dom_parser = self.ctx.dom_parser
        dom = dom_parser(resource.data, content_type)
        charset_metas = _meta_charset_elements(dom.document)
        if charset_metas:
            html_charset = charset_metas[0].get_attribute("charset")
            if html_charset:
                html_charset = html_charset.lower()
                if bom_charset is None and html_charset != UTF8 and html_charset != charset:
                    resource.data = decode_string(resource.raw_data, html_charset)
                    document_charset = html_charset
                    dom = dom_parser(resource.data, content_type)
                    charset_metas = _meta_charset_elements(dom.document)
            for meta in charset_metas:
                meta.remove()
            modified = True
        content_type_metas = _meta_content_type_elements(dom.document)
        if content_type_metas:
            meta_content = content_type_metas[0].get_attribute("content")
            html_charset = get_charset(meta_content) if meta_content else None
            # measured against document_charset: a document saying the same
            # thing twice has already been re-read above
            if (
                bom_charset is None
                and html_charset
                and html_charset != UTF8
                and html_charset != document_charset
            ):
                resource.data = decode_string(resource.raw_data, html_charset)
                document_charset = html_charset
                dom = dom_parser(resource.data, content_type)
                content_type_metas = _meta_content_type_elements(dom.document)
                # the re-read brought back the meta charset elements
                for meta in _meta_charset_elements(dom.document):
                    meta.remove()
            for meta in content_type_metas:
                meta.remove()
            modified = True
        if modified:
            resource.data = dom.serialize()
            dom = dom_parser(resource.data, content_type)
        cache_resource_dom(resource, dom)
        return document_charset


def _meta_charset_elements(document) -> list:
    root = document.document_element
    if root is None:
        return []
    return [meta for meta in root.get_elements_by_tag_name("meta") if meta.get_attribute("charset")]


def _meta_content_type_elements(document) -> list:
    root = document.document_element
    if root is None:
        return []
    return [
        meta
        for meta in root.get_elements_by_tag_name("meta")
        if meta.get_attribute("http-equiv")
        and meta.get_attribute("http-equiv").lower() == CONTENT_TYPE
    ]


# --- resource DOM cache (util.js:341-358) ---


def get_resource_dom(resource: Resource, content_type: str | None,
                     dom_parser=None) -> DOM:
    if resource.dom is None or resource.dom_data != resource.data:
        parser = dom_parser or parse_dom
        cache_resource_dom(resource, parser(resource.data, content_type))
    return resource.dom


def cache_resource_dom(resource: Resource, dom: DOM) -> None:
    resource.dom = dom
    resource.dom_data = resource.data


def release_resource_dom(resource: Resource) -> None:
    resource.dom = None
    resource.dom_data = None
