"""Boilerplate removal (functions/boilerplate.py): leaf-block segmentation
and the integer link-density keep rule, pinned on hand-built pages."""

import pyarrow as pa

from mhtml_to_html_ray.functions import boilerplate
from mhtml_to_html_ray.functions.boilerplate import content_blocks, main_content


def test_leaf_block_segmentation():
    html = ("<body><article><p>one</p><p>two</p></article>"
            "<div>stray</div></body>")
    blocks = content_blocks(html)
    # article contains blocks → not a leaf; both p's and the div are
    assert [(b["tag"], b["text"]) for b in blocks] == [
        ("p", "one"), ("p", "two"), ("div", "stray")]


def test_density_rule_integer_boundary():
    # anchor 5 of 10 chars → density exactly 0.5 → kept (<=);
    # anchor 6 of 10 → dropped
    at_limit = "<body><p><a href='#'>aaaaa</a>bbbbb</p></body>"
    over = "<body><p><a href='#'>aaaaaa</a>bbbb</p></body>"
    assert main_content(at_limit) == ("aaaaabbbbb", 1, 1)
    assert main_content(over) == ("", 1, 0)


def test_nav_dropped_article_kept():
    html = ("<body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
            "<article><pre>the real story</pre></article>"
            "<footer><a href='/c'>Contact</a> <a href='/t'>Terms</a>"
            "</footer></body>")
    main, n_blocks, n_kept = main_content(html)
    assert (main, n_blocks, n_kept) == ("the real story", 3, 1)


def test_whitespace_only_and_script_blocks():
    html = ("<body><p>   \n\t </p>"
            "<div><script>var x = 'not text';</script></div>"
            "<p>keep me</p></body>")
    main, n_blocks, n_kept = main_content(html)
    assert main == "keep me" and n_blocks == 3 and n_kept == 1


def test_anchor_wrapped_block_is_all_anchor_text():
    # link-card markup: the <a> ANCESTOR makes the whole block anchor text
    # (density 1.0 → dropped); a sibling prose block survives
    html = ("<body><a href='/story'><div>Full story headline</div></a>"
            "<p>actual prose</p></body>")
    blocks = content_blocks(html)
    assert [(b["tag"], b["anchor_chars"], b["text_chars"])
            for b in blocks] == [("div", 19, 19), ("p", 0, 12)]
    assert main_content(html) == ("actual prose", 2, 1)


def test_table_cells_are_blocks():
    html = ("<body><table><tr><td>cell one</td>"
            "<td><a href='#'>linked</a></td></tr></table></body>")
    blocks = content_blocks(html)
    assert [(b["tag"], b["text"], b["anchor_chars"]) for b in blocks] == [
        ("td", "cell one", 0), ("td", "linked", 6)]
    assert main_content(html)[0] == "cell one"


def test_stage_over_mhtml_pages(ray_session):
    import ray

    from mhtml_to_html_ray.pipelines.flagship import wrap_mhtml

    good = wrap_mhtml(1, "<html><body><nav><a href='/'>x y z w</a></nav>"
                         "<p>prose here</p></body></html>")
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array([good, b"not an archive"], pa.binary()),
    }))
    out = {r["url"]: r for r in
           boilerplate.extract_main_content(ds).take_all()}
    assert out["u1"]["main_text"] == "prose here"
    assert out["u1"]["n_blocks"] == 2 and out["u1"]["n_kept"] == 1
    assert out["u1"]["error"] is None
    # corrupt archive: error row, never a task failure
    assert out["u2"]["error"] is not None and out["u2"]["main_text"] == ""
