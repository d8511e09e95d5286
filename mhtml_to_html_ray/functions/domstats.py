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
