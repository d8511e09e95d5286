"""Offline DOM soak: random structured tag soup → parse/serialize fixpoint.

The property: serialize(parse(serialize(parse(s)))) is a fixpoint after one
round trip (the reference serializer's idempotence guard). <plaintext> is
excluded — the reference itself is non-idempotent there (content to EOF is
written verbatim followed by a synthetic </plaintext>, so each reparse
swallows the previous close; dom-parser-node.js escapes only script/style).

Usage: PYTHONPATH=/root/repo python scripts/soak_dom.py [n_cases] [seed]
"""

from __future__ import annotations

import random
import re
import sys

from mhtml_to_html_ray.kernel.dom import parse_dom

TOKENS = [
    "<table>", "</table>", "<td>", "</td>", "<th>", "<tr>", "</tr>",
    "<tbody>", "</tbody>", "<thead>", "<tfoot>", "<caption>", "</caption>",
    "<template>", "</template>", "<select>", "</select>", "<option>",
    "</option>", "<optgroup>", "</optgroup>", "<head>", "</head>", "<body>",
    "</body>", "<html>", "</html>", "<b>", "</b>", "<i>", "</i>", "<em>",
    "</em>", "<a href=x>", "</a>", "<p>", "</p>", "<li>", "</li>", "<ul>",
    "</ul>", "<dd>", "<dt>", "<form>", "</form>", "<input type=hidden>",
    "<input>", "<button>", "</button>", "<frameset>", "</frameset>",
    "<frame>", "<noframes>", "</noframes>", "<svg>", "</svg>", "<math>",
    "</math>", "<mi>", "</mi>", "<mtext>", "</mtext>", "<foreignObject>",
    "</foreignObject>", "<annotation-xml encoding=text/html>",
    "</annotation-xml>", "<div>", "</div>", "<span a=1 b='2'>", "</span>",
    "<col>", "<colgroup>", "</colgroup>", "<style>", "</style>", "<script>",
    "</script>", "<title>", "</title>", "<textarea>", "</textarea>",
    "<xmp>", "</xmp>", "<noscript>", "</noscript>", "<iframe>", "</iframe>",
    "<noembed>", "</noembed>", "<pre>", "</pre>", "<listing>", "<image>",
    "<br>", "<hr>", "<wbr>", "<marquee>", "</marquee>", "<object>",
    "</object>", "<ruby>", "<rb>", "<rt>", "<rtc>", "<rp>", "</ruby>",
    "<h1>", "</h1>", "<h2>", "<nobr>", "</nobr>", "<!DOCTYPE html>",
    "x", "y z", " ", "\n", "\t", "&amp;", "&notin;", "&#65;", "&#x2f;",
    "&bogus;", "&", "<", ">", "<!--c-->", "<!--", "<![CDATA[d]]>", "<?pi?>",
    "<!bogus>", "</>", "</ junk>", "\x00",
    "<select multiple>", "<keygen>", "<base href=b>", "<body class=c>",
    "<html lang=l>", "<head>", "<meta charset=utf-8>", "<link rel=r>",
    "<mglyph>", "<malignmark>", "<annotation-xml>", "<desc>", "</desc>",
    "<mo>", "</mo>", "<applet>", "</applet>", "<bdi>", "<summary>",
    "<details>", "<fieldset>", "</fieldset>", "<label>", "<legend>",
    "<address>", "</address>", "<center>", "</center>", "<font color=f>",
    "</font>", "<small>", "</small>", "<strike>", "</strike>", "<tt>",
    "</tt>", "<u>", "</u>", "<s>", "</s>", "<big>", "</big>", "<code>",
    "</code>", "&#xD800;", "&#55296;", "&#x10FFFF;", "a=b", '"quoted"',
    # round-5 composite tokens: raise the hit rate of the interactions
    # where round-4's fixes clustered (VERDICT #5) — template-in-table
    # fostering, <form> pointer semantics across tables, and
    # after-frameset / after-after-frameset comment+space placement
    "<table><template>", "</template></table>", "<table><form>",
    "</form></table>", "<form><table><form>", "<table><tr><td><form>",
    "<table>x<template>", "<template><tr><td>", "<template><col>",
    "<template><caption>", "<table><template><tr>", "<table><input>",
    "<form></form><form>", "<td><form><div>", "<table><form><input type=hidden>",
    "<frameset></frameset><!--after-->", "</frameset><!--c--> ",
    "<html><frameset></frameset></html><!--aaf-->",
    "<frameset><frame></frameset> \n<!--tail-->", "<table><tr><template><td>",
    "<caption><template>", "<colgroup><template>", "<select><template>",
]


def main() -> int:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = random.Random(seed)
    failures = 0
    skipped = 0
    for i in range(n_cases):
        source = "".join(rng.choices(TOKENS, k=rng.randint(1, 40)))
        if "<script>" in source and "<!--" in source:
            # known reference-faithful non-idempotence: a script holding
            # '<!--' plus a nested '<script>' enters the double-escaped
            # tokenizer state on reparse, where the serializer's appended
            # </script> no longer closes (parse5's serializer has the same
            # hole — it escapes only '</' -> '<\\/'); each reparse then
            # swallows one close tag. Behavior parity is pinned in
            # test_html5_tree (script double-escaped state); skip here.
            skipped += 1
            continue
        try:
            once = parse_dom(source).serialize()
            # known reference-faithful non-idempotence #2: a form element
            # DESCENDANT of another form in the tree (possible when </form>
            # removes the outer form from the STACK while its subtree stays
            # open: <form><div></form><form> nests form2 inside the div).
            # The serialization cannot express "the outer form was closed
            # first", so any spec parser (parse5 included) drops the inner
            # form on reparse via the form-element-pointer ignore rule.
            # Behavior parity is pinned in test_html5_tree
            # (test_form_pointer_spec_semantics); skip the fixpoint here.
            depth, nested_form = 0, False
            for m in re.finditer(r"<(/?)form[ >]", once):
                depth += -1 if m.group(1) else 1
                if depth >= 2:
                    nested_form = True
                    break
            if nested_form:
                skipped += 1
                continue
            twice = parse_dom(once).serialize()
            thrice = parse_dom(twice).serialize()
        except Exception as exc:  # noqa: BLE001 — report and keep going
            failures += 1
            print(f"RAISE #{i}: {source!r}\n  {type(exc).__name__}: {exc}")
            if failures >= 5:
                break
            continue
        if twice != thrice:
            failures += 1
            print(f"FIXPOINT #{i}: {source!r}\n  twice:  {twice!r}"
                  f"\n  thrice: {thrice!r}")
            if failures >= 5:
                break
    ran = i + 1 if n_cases else 0
    print(f"soak done: {ran} cases ({skipped} known-nonidempotent cases skipped), "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
