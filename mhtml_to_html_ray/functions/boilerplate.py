"""Boilerplate removal — block-level link-density main-content extraction
(the Kohlschütter/boilerpipe family, public algorithm), run on the REAL
converted DOM: nav bars, footers and link farms are text blocks whose
characters mostly sit inside anchors; article prose is not.

Algorithm (deterministic, no floats in the output contract):

1. parse the converted page with the engine's HTML5 parser (kernel/dom.py)
   and collect LEAF BLOCKS — elements whose tag is block-level and that
   contain no nested block-level element (text directly inside a non-leaf
   container belongs to no block, the standard boilerpipe segmentation);
2. per block, count text characters and the subset inside <a> descendants
   (scripts/styles/templates skipped, same rules as kernel/textextract);
3. keep a block iff it has any non-whitespace text AND
   anchor_chars <= max_link_density * text_chars (the comparison is done
   on integers — ``anchor * 2 <= text`` at the default 0.5 — so the keep
   decision is exact and SQL-restatable);
4. main_text = kept blocks' text joined by newline, document order.

Scale shape: pure per-row work inside one ``map_batches`` actor-pool stage
(the MIME parse → convert → DOM walk kernel is the same fused shape as
stages/extract.py); zero shuffle, zero driver state.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernel.dom import Comment, Element, Text, parse_dom
from ..kernel.textextract import _SKIPPED_TAGS

BLOCK_TAGS = frozenset((
    "p", "pre", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "blockquote", "article", "section", "main", "nav", "footer", "header",
    "aside", "div", "figcaption", "dd", "dt",
))


def _block_stats(el, under_anchor: bool = False) -> tuple[str, int]:
    """(text, anchor_chars) for a leaf block: concatenated Text descendants
    with the textextract skip rules; anchor_chars counts those inside an
    <a> — descendant OR ancestor (``under_anchor``: a link-card block like
    <a><div>headline</div></a> is ALL anchor text, the exact pattern the
    density rule exists to drop)."""
    parts: list[str] = []
    anchor_chars = 0

    def rec(node, in_anchor: bool) -> None:
        nonlocal anchor_chars
        if isinstance(node, Text):
            parts.append(node.value)
            if in_anchor:
                anchor_chars += len(node.value)
            return
        if isinstance(node, Comment):
            return
        if isinstance(node, Element):
            tag = node.tag_name.lower()
            if tag in _SKIPPED_TAGS:
                return
            in_anchor = in_anchor or tag == "a"
        for child in getattr(node, "child_nodes", ()) or ():
            rec(child, in_anchor)

    for child in el.child_nodes:
        rec(child, under_anchor)
    return "".join(parts), anchor_chars


def content_blocks(html: str) -> list[dict]:
    """Leaf blocks of the page body in document order:
    [{tag, text, text_chars, anchor_chars}]."""
    document = parse_dom(html).document
    root = document.body if document.body is not None else document
    blocks: list = []

    def walk(node, under_anchor: bool) -> bool:
        """Collect (leaf block, has-anchor-ancestor) under ``node``; True
        iff the subtree contains any block element."""
        if not isinstance(node, Element):
            contains = False
            for child in getattr(node, "child_nodes", ()) or ():
                contains = walk(child, under_anchor) or contains
            return contains
        tag = node.tag_name.lower()
        if tag in _SKIPPED_TAGS:
            return False
        under_anchor = under_anchor or tag == "a"
        child_has_block = False
        for child in node.child_nodes:
            child_has_block = walk(child, under_anchor) or child_has_block
        if tag in BLOCK_TAGS and not child_has_block:
            # under_anchor here is pure ancestor state: "a" is never a
            # block tag, so the OR above can't have set it for node itself
            blocks.append((node, under_anchor))
            return True
        return child_has_block or tag in BLOCK_TAGS

    walk(root, False)
    out = []
    for el, under_anchor in blocks:
        text, anchor_chars = _block_stats(el, under_anchor)
        out.append({
            "tag": el.tag_name.lower(),
            "text": text,
            "text_chars": len(text),
            "anchor_chars": anchor_chars,
        })
    return out


def main_content(html: str, density_num: int = 1,
                 density_den: int = 2) -> tuple[str, int, int]:
    """(main_text, n_blocks, n_kept) with keep iff the block has
    non-whitespace text and ``anchor_chars * density_den <=
    text_chars * density_num`` (default 1/2 → link density ≤ 0.5),
    integer-exact."""
    blocks = content_blocks(html)
    # the non-whitespace test strips exactly RE2's \s class [\t\n\f\r ]
    # (see textstats._lm_tokens) so the oracle's regexp_matches(text,'\S')
    # agrees — Python str.strip() would also strip \v and Unicode spaces
    kept = [
        b["text"] for b in blocks
        if b["text"].strip("\t\n\f\r ")
        and b["anchor_chars"] * density_den <= b["text_chars"] * density_num
    ]
    return "\n".join(kept), len(blocks), len(kept)


class BoilerplateBatch:
    """Actor-pool kernel: MHTML pages (url, html) → main-content rows
    (url, n_blocks, n_kept, main_text). Same fused MIME→convert→DOM shape
    as stages/extract.ExtractBatch; rows that fail to convert land with
    error set, never a task failure."""

    def __init__(self, density_num: int = 1, density_den: int = 2):
        from ..kernel.convert import Config

        self.config = Config()
        self.density = (density_num, density_den)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernel.convert import ConvertError, convert
        from ..kernel.mime import parse

        urls = batch.column("url")
        texts, n_blocks, n_kept, errors = [], [], [], []
        for blob in batch.column("html").to_pylist():
            try:
                result = convert(parse(bytes(blob)), self.config)
                main, nb, nk = main_content(result.data, *self.density)
                texts.append(main)
                n_blocks.append(nb)
                n_kept.append(nk)
                errors.append(None)
            except (ConvertError, RecursionError) as exc:
                texts.append("")
                n_blocks.append(0)
                n_kept.append(0)
                errors.append(str(exc) or type(exc).__name__)
        return pa.table({
            "url": urls,
            "n_blocks": pa.array(n_blocks, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "main_text": pa.array(texts, pa.string()),
            "error": pa.array(errors, pa.string()),
        })


def extract_main_content(pages_ds, density_num: int = 1,
                         density_den: int = 2, batch_size: int = 64,
                         concurrency=(1, 8)):
    """Boilerplate-removal stage over a pages Dataset (url, html MHTML
    blobs) — small batches for blob rows, actor pool for codec caches."""
    return pages_ds.map_batches(
        BoilerplateBatch,
        fn_constructor_kwargs={"density_num": density_num,
                               "density_den": density_den},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)
