"""CSS tokenizer + rewriter for the stylesheet pipeline.

Replaces the reference's css-tree usage (convert.js:695-768 `replaceStylesheetUrls`,
parse.js:404-421 `processStylesheetCharset`) with a token-level transformer:

* ``url(...)`` values and ``@import`` targets are rewritten through callbacks
  (the convert walk supplies resolveReference-backed ones) and the original
  URL is recorded as a ``/* original URL: ... */`` comment, exactly the output
  shape the reference produces after its marker-function regex pass
  (convert.js:98-99,756)
* output is minified css-tree-style: comments dropped, whitespace collapsed,
  spaces removed around ``{ } ; ,`` (and around ``:`` inside blocks)
* a leading ``@charset`` rule is read (for charset re-decode) and removed

Unlike css-tree this is not an AST round-trip: unparsable input cannot
"fail", it just passes through token-wise — which matches the reference's
catch-and-passthrough behavior for broken sheets (convert.js:705-709).
"""

from __future__ import annotations

import re
from typing import Callable

_URL_RE = re.compile(r"url\(", re.IGNORECASE)
_WS = "\t\n\f\r "


def tokenize(css: str) -> list[tuple[str, str]]:
    """Tokens: ('comment', text) ('string', raw-with-quotes) ('url', full
    url(...) text) ('ws', run) ('word', run) ('char', one char)."""
    tokens: list[tuple[str, str]] = []
    i = 0
    n = len(css)
    while i < n:
        c = css[i]
        if c == "/" and css.startswith("/*", i):
            end = css.find("*/", i + 2)
            end = n if end == -1 else end + 2
            tokens.append(("comment", css[i:end]))
            i = end
        elif c == "<" and css.startswith("<!--", i):
            tokens.append(("cdx", "<!--"))  # CDO — css-tree's generate() omits it
            i += 4
        elif c == "-" and css.startswith("-->", i):
            tokens.append(("cdx", "-->"))  # CDC
            i += 3
        elif c in "\"'":
            j = i + 1
            while j < n:
                if css[j] == "\\":
                    j += 2
                elif css[j] == c:
                    j += 1
                    break
                else:
                    j += 1
            else:
                j = n
            tokens.append(("string", css[i:j]))
            i = j
        elif c in _WS:
            j = i
            while j < n and css[j] in _WS:
                j += 1
            tokens.append(("ws", css[i:j]))
            i = j
        elif css[i : i + 4].lower() == "url(" and (
            not tokens or tokens[-1][0] != "word" or not tokens[-1][1][-1:].isalnum()
        ):
            j = i + 4
            depth = 1
            while j < n:
                cj = css[j]
                if cj == "\\":
                    j += 2
                    continue
                if cj in "\"'":
                    quote = cj
                    j += 1
                    while j < n:
                        if css[j] == "\\":
                            j += 2
                        elif css[j] == quote:
                            j += 1
                            break
                        else:
                            j += 1
                    continue
                if cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
            tokens.append(("url", css[i:j]))
            i = j
        else:
            m = _WORD_RE.match(css, i)
            if m and m.end() > i:
                tokens.append(("word", m.group(0)))
                i = m.end()
            else:
                tokens.append(("char", c))
                i += 1
    return tokens


_WORD_RE = re.compile(r"[A-Za-z0-9_\-@#.%!]+")


# CSS syntax spec escape: backslash + 1-6 hex digits consumes one trailing
# whitespace; otherwise backslash + any char is that char literally
_CSS_ESCAPE_RE = re.compile(r"\\([0-9a-fA-F]{1,6})[ \t\n\r\f]?|\\(.)", re.DOTALL)


def _css_unescape(text: str) -> str:
    def repl(m: "re.Match[str]") -> str:
        hex_digits = m.group(1)
        if hex_digits is not None:
            codepoint = int(hex_digits, 16)
            if codepoint == 0 or codepoint > 0x10FFFF or 0xD800 <= codepoint <= 0xDFFF:
                return "�"
            return chr(codepoint)
        return m.group(2)

    return _CSS_ESCAPE_RE.sub(repl, text)


def url_value(token_text: str) -> str:
    """Inner value of a url(...) token, quotes stripped and trimmed; escapes
    decoded per the CSS syntax spec (hex escapes become their codepoint —
    url(\\2018foo) is '‘foo', not '2018foo' — matching css-tree)."""
    inner = token_text[4:-1] if token_text.endswith(")") else token_text[4:]
    inner = inner.strip(_WS)
    if len(inner) >= 2 and inner[0] in "\"'" and inner[-1] == inner[0]:
        inner = inner[1:-1]
    return _css_unescape(inner)


_URL_ESCAPE_RE = re.compile(r"([\s\"'()\\])")


def serialize_url(value: str) -> str:
    """css-tree-style unquoted url token with backslash escapes."""
    return "url(" + _URL_ESCAPE_RE.sub(lambda m: "\\" + m.group(1), value) + ")"


def original_url_rewrite(original: str, uri: str) -> str:
    """The reference's output shape for a rewritten reference: the original
    URL as a comment, then the inlined target (convert.js:98-99)."""
    return f"/* original URL: {original} */ {serialize_url(uri)}"


def string_value(token_text: str) -> str:
    inner = token_text
    if len(inner) >= 2 and inner[0] in "\"'" and inner[-1] == inner[0]:
        inner = inner[1:-1]
    return _css_unescape(inner)


def read_leading_charset(css: str) -> str | None:
    """The string value of a leading ``@charset "..."`` rule, or None
    (covers the css-tree prelude access in parse.js:407-410; a broken
    prelude means None)."""
    tokens = tokenize(css)
    index = 0
    while index < len(tokens) and tokens[index][0] in ("ws", "comment"):
        index += 1
    if index >= len(tokens):
        return None
    kind, text = tokens[index]
    if kind != "word" or text.lower() != "@charset":
        return None
    index += 1
    while index < len(tokens) and tokens[index][0] == "ws":
        index += 1
    if index < len(tokens) and tokens[index][0] == "string":
        return string_value(tokens[index][1]).lower()
    return None


def remove_leading_charset(css: str) -> str:
    """Drop the leading @charset rule (through its ``;``) — skipping the
    same whitespace AND comments read_leading_charset skips, so a sheet
    whose charset triggered a re-decode never keeps the (now wrong)
    declaration in the transcoded output."""
    m = re.match(
        r"^(?:\s|/\*.*?\*/)*@charset\s+(\"[^\"]*\"|'[^']*')\s*;",
        css, re.IGNORECASE | re.DOTALL,
    )
    if m:
        return css[m.end() :]
    return css


# at-rules whose block contains RULES (selectors live inside — a ':' there
# is a pseudo-class, not a declaration separator)
_RULE_BLOCK_AT = frozenset(
    ("@media", "@supports", "@document", "@-moz-document", "@layer",
     "@container", "@scope", "@keyframes", "@-webkit-keyframes",
     "@-moz-keyframes", "@-o-keyframes")
)


def _minify(tokens: list[tuple[str, str]]) -> str:
    """css-tree generate()-style compact output: comments dropped (rewrite
    comments injected as 'raw' tokens survive), whitespace collapsed, spaces
    removed next to structural punctuation. Colon spacing is CONTEXT-aware:
    spaces drop around ':' only inside declaration blocks — inside nested
    RULE blocks (@media/@supports/...), 'a :hover' keeps its descendant
    combinator exactly as css-tree generate() does."""
    out: list[str] = []
    # block contexts: "rules" (selectors between colons matter) vs "decls"
    context: list[str] = ["rules"]
    prelude_at: str | None = None  # at-keyword opening the current prelude
    pending_ws = False

    def last_char() -> str:
        return out[-1][-1] if out else ""

    for kind, text in tokens:
        if kind in ("comment", "cdx"):
            continue
        if kind == "ws":
            pending_ws = True
            continue
        first = text[0]
        if kind == "word" and first == "@":
            prelude_at = text.lower()
        if kind == "char" and first in "{};,":
            if first == "{":
                if context[-1] == "decls":
                    context.append("decls")  # nested braces inside a value
                else:
                    context.append(
                        "rules" if prelude_at in _RULE_BLOCK_AT else "decls"
                    )
                prelude_at = None
            elif first == "}":
                if len(context) > 1:
                    context.pop()
                prelude_at = None
                # trailing ; before } is dropped, like css-tree
                while out and out[-1] == ";":
                    out.pop()
            elif first == ";":
                prelude_at = None
            pending_ws = False
            out.append(text)
            continue
        in_decls = context[-1] == "decls"
        if kind == "char" and first == ":" and in_decls:
            pending_ws = False
            out.append(text)
            continue
        if pending_ws:
            if last_char() not in "{};,(" and last_char() != "" and not (
                last_char() == ":" and in_decls
            ):
                out.append(" ")
            pending_ws = False
        out.append(text)
    return "".join(out).strip()


def rewrite_stylesheet(
    css: str,
    handle_url: Callable[[str], str | None],
    handle_import: Callable[[str], str | None],
    minify: bool = True,
) -> str:
    """Walk the token stream: every ``url(...)`` goes through ``handle_url``
    and every ``@import <url|string>`` target through ``handle_import``; a
    callback returning None leaves the value in place (normalized), returning
    a string substitutes that raw CSS text. ``data:`` URIs are skipped by the
    caller's callbacks, matching convert.js:713-752."""
    tokens = tokenize(css)
    out: list[tuple[str, str]] = []
    index = 0
    n = len(tokens)
    while index < n:
        kind, text = tokens[index]
        if kind == "url":
            value = url_value(text)
            replacement = handle_url(value)
            out.append(("raw", replacement) if replacement is not None else ("url", serialize_url(value)))
            index += 1
            continue
        if kind == "word" and text.lower() == "@import":
            # find the import target: first non-ws token after @import
            j = index + 1
            while j < n and tokens[j][0] in ("ws", "comment"):
                j += 1
            if j < n and tokens[j][0] in ("url", "string"):
                target_kind, target_text = tokens[j]
                value = url_value(target_text) if target_kind == "url" else string_value(target_text)
                replacement = handle_import(value)
                out.append(("word", "@import"))
                out.append(("ws", " "))
                if replacement is not None:
                    out.append(("raw", replacement))
                else:
                    # a bare string prelude is turned into url() before writing
                    out.append(("url", serialize_url(value)))
                index = j + 1
                continue
            # broken @import (no url/string prelude): left alone
            out.append((kind, text))
            index += 1
            continue
        out.append((kind, text))
        index += 1
    if minify:
        return _minify(out)
    return "".join(text for kind, text in out if kind not in ("comment", "cdx"))
