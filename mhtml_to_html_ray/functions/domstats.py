"""DOM structural statistics — the tree-shape signals web-quality
classifiers use next to text-shape ones (element count, nesting depth, link
count, <pre> text mass). Runs the ENGINE's HTML5 tree builder
(kernel/dom.parse_html — the parse5-parity kernel, SURVEY.md C15) over any
html column, so the driver's oracle gate exercises the parser itself via
generatively-predictable fixtures (the boilerplate/extract oracle style).

Scale shape: one stateless map_batches; per-row parsing is intrinsic
per-document work (the extraction stage's own discipline), nothing
shuffles, nothing lands on the driver.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernel.dom import Element, Text, parse_html


def _tree_stats(document) -> tuple[int, int, int, int]:
    """(n_elements, max_depth, n_links, pre_chars) by one iterative walk
    (no recursion — real pages nest deep). Depth counts element nesting
    from 1 at <html>; pre_chars sums text-node lengths inside <pre>
    subtrees; template content fragments are walked at their host's
    child depth."""
    n_elements = 0
    max_depth = 0
    n_links = 0
    pre_chars = 0
    stack = [(child, 1, False) for child in document.child_nodes]
    while stack:
        node, depth, in_pre = stack.pop()
        if isinstance(node, Element):
            n_elements += 1
            if depth > max_depth:
                max_depth = depth
            tag = node.tag_name.lower()
            if tag == "a":
                n_links += 1
            child_in_pre = in_pre or tag == "pre"
            stack.extend((c, depth + 1, child_in_pre)
                         for c in node.child_nodes)
            if node.content is not None:
                stack.extend((c, depth + 1, child_in_pre)
                             for c in node.content.child_nodes)
        elif isinstance(node, Text) and in_pre:
            pre_chars += len(node.value)
    return n_elements, max_depth, n_links, pre_chars


def dom_tree_stats(pages_ds, html_col: str = "html", id_col: str = "doc_id"):
    """Per-page DOM shape stats over an html (string or utf-8 binary)
    column: doc_id, n_elements, max_depth, n_links, pre_chars."""

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        n_el, depth, links, prec = [], [], [], []
        for raw in batch.column(html_col).to_pylist():
            # errors="replace": one mislabeled-charset page must not kill
            # the batch (the kernel/charsets decode posture)
            source = raw.decode("utf-8", errors="replace") \
                if isinstance(raw, bytes) else (raw or "")
            e, d, a, p = _tree_stats(parse_html(source))
            n_el.append(e)
            depth.append(d)
            links.append(a)
            prec.append(p)
        return pa.table(
            {
                id_col: ids,
                "n_elements": pa.array(n_el, pa.int64()),
                "max_depth": pa.array(depth, pa.int64()),
                "n_links": pa.array(links, pa.int64()),
                "pre_chars": pa.array(prec, pa.int64()),
            }
        )

    return pages_ds.map_batches(stats, batch_format="pyarrow")


def _head_meta(document) -> tuple[str | None, str | None, str | None, int]:
    """(title, meta[name=description].content, meta[property=og:title]
    .content, n_meta) from one parsed tree. Attribute values arrive
    entity-DECODED from the tokenizer (the WHATWG attribute-value state),
    so what a consumer reads here is what a browser's DOM reports."""
    title: str | None = None
    description: str | None = None
    og_title: str | None = None
    n_meta = 0
    # reversed pushes keep the pop order = document order, so the
    # first-wins captures match what a streaming consumer would read
    stack = list(reversed(document.child_nodes))
    while stack:
        node = stack.pop()
        if not isinstance(node, Element):
            continue
        tag = node.tag_name.lower()
        if tag == "title" and title is None:
            title = "".join(
                c.value for c in node.child_nodes if isinstance(c, Text))
        elif tag == "meta":
            n_meta += 1
            if (node.get_attribute("name") or "").lower() == "description" \
                    and description is None:
                description = node.get_attribute("content")
            if (node.get_attribute("property") or "").lower() == "og:title" \
                    and og_title is None:
                og_title = node.get_attribute("content")
        if node.content is not None:
            stack.extend(reversed(node.content.child_nodes))
        stack.extend(reversed(node.child_nodes))
    return title, description, og_title, n_meta


def head_meta(pages_ds, html_col: str = "html", id_col: str = "doc_id"):
    """Per-page head metadata (title / description / og:title / meta count)
    by the production HTML5 parser — the WAT-style metadata product next to
    WET's text. Same scale shape as dom_tree_stats: stateless map_batches,
    no shuffle."""

    def extract(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        titles, descs, ogs, counts = [], [], [], []
        for raw in batch.column(html_col).to_pylist():
            source = raw.decode("utf-8", errors="replace") \
                if isinstance(raw, bytes) else (raw or "")
            t, d, o, n = _head_meta(parse_html(source))
            titles.append(t)
            descs.append(d)
            ogs.append(o)
            counts.append(n)
        return pa.table(
            {
                id_col: ids,
                "title": pa.array(titles, pa.string()),
                "description": pa.array(descs, pa.string()),
                "og_title": pa.array(ogs, pa.string()),
                "n_meta": pa.array(counts, pa.int64()),
            }
        )

    return pages_ds.map_batches(extract, batch_format="pyarrow")
