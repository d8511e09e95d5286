"""Deterministic URL discovery from a fetched page.

Two modes, both pure functions of the page bytes (SURVEY.md §7 hard part 4 —
crawl ordering must be a function of data, never of task completion order):

* ``subresources`` — the reference scheduler's discovery: the collecting
  convert walk (convert.js:283-284,605-606) lists a page's unresolved
  http/https/urn references in DOM-walk order. This is exactly what
  ``fetchAndConvert`` fetches, so wave-by-wave the engine requests the same
  URLs in the same order as the reference given the same pages.
* ``hyperlinks`` — crawl mode: a/area hrefs in the same breadth-first walk
  order, resolved absolute, http/https only.
"""

from __future__ import annotations

from ..kernel.convert import Config, convert_walk
from ..kernel.dom import Element
from ..kernel.mime import parse
from .canon import is_fetchable


def discover_subresources(body: bytes, base_url: str | None = None) -> list[str]:
    """Missing-resource ids of the page, in collecting-walk order."""
    from ..kernel.urlutil import parse_absolute

    try:
        mhtml = parse(body)
        if mhtml.index is None and base_url is not None:
            # a bare HTML page fetched by url: its single resource is the index
            first = next(iter(mhtml.resources.values()), None)
            if first is not None:
                mhtml.index = first.id
        # a fetched plain-HTML page carries no Content-Location: its index id
        # is a generated "_0", useless as a base — rebind it to the fetch URL
        # so relative references resolve (the crawler's analogue of the
        # archive's Content-Location)
        if (
            base_url is not None
            and mhtml.index is not None
            and parse_absolute(mhtml.index) is None
        ):
            resource = mhtml.resources.get(mhtml.index)
            if resource is not None:
                resource.id = base_url
                mhtml.resources[base_url] = resource
                mhtml.index = base_url
        missing = convert_walk(mhtml, Config(fetch_missing_resources=True))
    except Exception:
        return []
    return [resource.id for resource in missing if is_fetchable(resource.id)]


def discover_hyperlinks(body: bytes, base_url: str | None = None) -> list[str]:
    """a/area hrefs in breadth-first walk order (the convert walk's order),
    absolute http/https only, document-order deterministic. One walk shared
    with ``discover_anchor_texts`` so the two can never diverge."""
    return [href for href, _ in discover_anchor_texts(body, base_url)]


def discover_css_references(body: bytes, base_url: str | None) -> list[str]:
    """url()/@import targets of a fetched stylesheet, in token order — the
    reference reaches these when the next round's collecting walk descends
    into the merged sheet (convert.js:722-752, fetch.test.js 'a fetched
    stylesheet has its own references followed')."""
    from ..kernel.charsets import decode_string
    from ..kernel.css import rewrite_stylesheet
    from ..kernel.urlutil import resolve_path

    found: list[str] = []

    def record(path: str):
        if not path.startswith("data:"):
            resolved = resolve_path(path, base_url)
            if is_fetchable(resolved) and resolved not in found:
                found.append(resolved)
        return None

    rewrite_stylesheet(decode_string(body), record, record)
    return found


DISCOVERY_MODES = {
    "subresources": discover_subresources,
    "hyperlinks": discover_hyperlinks,
}


def discover(body: bytes, base_url: str | None, mode: str,
             content_type: str | None = None) -> list[str]:
    """Dispatch on the response content type: stylesheets expose CSS
    references; everything page-like goes through the DOM/archive walk."""
    if content_type and content_type.split(";")[0].strip().lower() == "text/css":
        return discover_css_references(body, base_url)
    if content_type and not content_type.split(";")[0].strip().lower() in (
        "text/html", "application/xhtml+xml", "multipart/related", "message/rfc822",
        "application/x-mimearchive", "application/octet-stream",
    ):
        return []  # images/fonts/media carry no references
    if mode == "both":
        return discover_subresources(body, base_url) + discover_hyperlinks(body, base_url)
    return DISCOVERY_MODES[mode](body, base_url)


def anchor_texts_from_document(document,
                               base: str | None) -> list[tuple[str, str]]:
    """The anchor walk over an ALREADY-PARSED document — factored out so
    consumers that built the DOM for other reasons (write_wat's metadata
    pass) never parse the page twice. Honors the page's FIRST <base>
    element exactly like the convert walk: convert.js:265-269 takes
    getElementsByTagName("base")[0] even when it carries no href (a
    href-less first base leaves the document base unchanged — WHATWG would
    take the first base WITH an href; the deviation is deliberate
    reference parity, shared by both walks)."""
    from ..kernel.urlutil import resolve_path

    base_elements = document.get_elements_by_tag_name("base")
    if base_elements:
        href_attr = base_elements[0].get_attribute("href")
        if href_attr:
            base = resolve_path(href_attr, base)
    out: list[tuple[str, str]] = []
    nodes = [document]
    cursor = 0
    while cursor < len(nodes):
        node = nodes[cursor]
        cursor += 1
        if node.child_nodes is None:
            continue
        for child in node.child_nodes:
            if isinstance(child, Element):
                if child.tag_name in ("a", "area"):
                    href = child.get_attribute("href")
                    if href:
                        resolved = resolve_path(href, base)
                        if resolved.startswith(("http:", "https:")):
                            out.append((resolved, child.text_content))
                if child.content is not None:
                    nodes.append(child.content)
            nodes.append(child)
    return out


def discover_anchor_texts(body: bytes,
                          base_url: str | None = None) -> list[tuple[str, str]]:
    """(resolved href, anchor text) pairs for every a/area with an href, in
    the same breadth-first walk order as ``discover_hyperlinks`` — the raw
    relation an anchor-text corpus (link-graph training data, anchor-based
    retrieval labels) aggregates. Anchor text is the element's direct text
    content (the common plain-text-anchor case; nested markup anchors keep
    only their top-level text nodes)."""
    try:
        mhtml = parse(body)
        index = mhtml.index
        if index is None:
            first = next(iter(mhtml.resources.values()), None)
            index = first.id if first is not None else None
        resource = mhtml.resources.get(index) if index is not None else None
        if resource is None:
            return []
        from ..kernel.mime import get_resource_dom

        content_type = resource.content_type.split(";")[0] if resource.content_type else None
        dom = get_resource_dom(resource, content_type)
    except Exception:
        return []
    base = base_url or (index if isinstance(index, str) else None)
    return anchor_texts_from_document(dom.document, base)
