"""DOM tree-shape stats (functions/domstats): the iterative walk over the
engine's own parser output — element/link counts, nesting depth, <pre> text
mass, template content, and the HTML5 pre-leading-newline rule."""

import pyarrow as pa

from mhtml_to_html_ray.functions.domstats import _tree_stats, dom_tree_stats
from mhtml_to_html_ray.kernel.dom import parse_html


def test_tree_stats_counts_and_depth():
    doc = parse_html(
        "<html><head><title>t</title></head><body>"
        "<nav><a href='/1'>x</a><a href='/2'>y</a></nav>"
        "<div><div><span>z</span></div></div>"
        "<pre>ab&lt;c</pre></body></html>")
    n_elements, max_depth, n_links, pre_chars = _tree_stats(doc)
    # html head title body nav a a div div span pre = 11
    assert n_elements == 11
    assert max_depth == 5          # html>body>div>div>span
    assert n_links == 2
    assert pre_chars == 4          # entity unescapes to 'ab<c'


def test_tree_stats_pre_leading_newline_dropped():
    doc = parse_html("<html><body><pre>\nxy</pre></body></html>")
    assert _tree_stats(doc)[3] == 2  # HTML5: one newline after <pre> drops


def test_tree_stats_template_content_walked():
    doc = parse_html(
        "<html><body><template><a href='/t'>q</a></template></body></html>")
    n_elements, _, n_links, _ = _tree_stats(doc)
    assert n_links == 1            # template content fragment is reached
    assert n_elements == 5         # html head body template a


def test_dom_tree_stats_dataset(ray_session):
    import ray.data

    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "html": [b"<html><body><pre>abc</pre></body></html>"],  # binary ok
    }))
    rows = dom_tree_stats(pages).take_all()
    assert rows == [{"doc_id": 7, "n_elements": 4, "max_depth": 3,
                     "n_links": 0, "pre_chars": 3}]
