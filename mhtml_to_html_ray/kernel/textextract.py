"""Plain-text extraction from converted HTML.

The engine's per-row invariant (BASELINE.json ``input_hint``) is
byte-identical extracted text per url: the deterministic function below is
that contract. It is intentionally simple — the concatenated character data
of the body, skipping non-rendered containers — so the fixture generator can
compute the expected value exactly.
"""

from __future__ import annotations

from .dom import Comment, Document, Element, Text, parse_dom

_SKIPPED_TAGS = frozenset(("script", "style", "template", "noscript", "head", "title"))


def extract_text(html: str) -> str:
    """Concatenated text of the document body (scripts/styles skipped)."""
    return extract_text_from_document(parse_dom(html).document)


def extract_text_from_document(document) -> str:
    """Same contract, straight off an in-memory Document — the extraction
    stage uses this on the converted tree instead of re-parsing its own
    serialized output (a whole second parse per page)."""
    body = document.body
    root = body if body is not None else document
    out: list[str] = []
    _collect(root, out)
    return "".join(out)


def _collect(node, out: list[str]) -> None:
    if isinstance(node, Text):
        out.append(node.value)
        return
    if isinstance(node, Comment):
        return
    if isinstance(node, Element) and node.tag_name.lower() in _SKIPPED_TAGS:
        return
    children = getattr(node, "child_nodes", None)
    if children:
        for child in children:
            _collect(child, out)


def extract_title_text(html: str) -> str | None:
    dom = parse_dom(html)
    head = dom.document.head
    if head is None:
        return None
    for element in head.get_elements_by_tag_name("title"):
        if element.text_content:
            return element.text_content
    return None
