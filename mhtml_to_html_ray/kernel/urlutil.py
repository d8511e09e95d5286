"""WHATWG-flavoured URL normalization and resolution.

One canonicalizer serves two masters (SURVEY.md §2.2 P22): resource matching
inside the extraction kernel (util.js:518-547 ``normalizeLocation`` /
``resolvePath``) and the frontier's URL-seen keys. Semantics follow the
WHATWG URL Standard as observed through ``new URL(...)`` in the reference:

* absolute URLs: lowercased scheme/host, IDNA host, default port dropped,
  dot segments removed, path/query/fragment percent-encoded (existing
  ``%XX`` escapes preserved verbatim, case included — urls.test.js:54-68)
* anything that does not parse as an absolute URL is returned unchanged
* relative references resolve RFC 3986-style against a hierarchical base;
  with an opaque base (``cid:``…) resolution fails and the reference's
  protocol-relative fallback applies (util.js:527-547)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

try:
    import idna as _idna
except ImportError:  # pragma: no cover
    _idna = None

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")
_SPECIAL_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}
_HEX = "0123456789ABCDEFabcdef"

# characters (beyond non-ASCII and C0/DEL) that each component percent-encodes
_PATH_ENCODE = set(' "<>`{}')
_QUERY_ENCODE = set(' "<>#')
_SPECIAL_QUERY_ENCODE = _QUERY_ENCODE | {"'"}
_FRAGMENT_ENCODE = set(' "<>`')
_USERINFO_ENCODE = _PATH_ENCODE | set("/:;=@[\\]^|")
_FORBIDDEN_HOST = set("\x00\t\n\r #/:<>?@[\\]^|")


class URLParseError(ValueError):
    pass


def _percent_encode(text: str, encode_set: set[str]) -> str:
    out: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "%" and i + 2 < n and text[i + 1] in _HEX and text[i + 2] in _HEX:
            out.append(text[i : i + 3])  # existing escapes pass through untouched
            i += 3
            continue
        code = ord(c)
        if code < 0x20 or code == 0x7F or code > 0x7E or c in encode_set:
            out.extend(f"%{b:02X}" for b in c.encode("utf-8"))
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    output: list[str] = []
    for segment in path.split("/"):
        if segment == ".":
            continue
        if segment == "..":
            if output:
                output.pop()
        else:
            output.append(segment)
    # preserve a trailing slash implied by ./.. at the end
    if path.endswith(("/.", "/..")) or path.endswith("/"):
        if not output or output[-1] != "":
            output.append("")
    # keep the leading empty segment (absolute path)
    if path.startswith("/") and (not output or output[0] != ""):
        output.insert(0, "")
    return "/".join(output)


def _canonical_host(host: str) -> str:
    if not host:
        raise URLParseError("empty host")
    # percent-decode before interpretation, as the WHATWG host parser does
    if "%" in host:
        try:
            host = re.sub(
                r"%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), host
            ).encode("latin-1").decode("utf-8")
        except UnicodeDecodeError as exc:
            raise URLParseError("bad host escape") from exc
    if host.startswith("[") and host.endswith("]"):
        return host.lower()  # IPv6 literal, kept as written (lowercased)
    for ch in host:
        if ch in _FORBIDDEN_HOST:
            raise URLParseError(f"forbidden host character {ch!r}")
    host = host.lower()
    if any(ord(ch) > 0x7E for ch in host):
        if _idna is None:
            raise URLParseError("non-ASCII host without idna support")
        try:
            host = _idna.encode(host, uts46=True).decode("ascii")
        except _idna.IDNAError as exc:
            raise URLParseError(str(exc)) from exc
    return host


_C0_SPACE = "".join(chr(c) for c in range(0x21)) + " "


def parse_absolute(value: str) -> str | None:
    """Normalized href for an absolute URL, or None when the value does not
    parse as one (→ ``normalizeLocation`` leaves it alone). WHATWG input
    preprocessing applies first, as ``new URL`` does in the reference:
    leading/trailing C0-control/space trimmed, ASCII tab/LF/CR removed."""
    value = value.strip(_C0_SPACE)
    if "\t" in value or "\n" in value or "\r" in value:
        value = value.replace("\t", "").replace("\n", "").replace("\r", "")
    m = _SCHEME_RE.match(value)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = value[m.end() :]
    special = scheme in _SPECIAL_PORTS
    try:
        if special:
            return _parse_special(scheme, rest)
        if scheme == "file":
            return _parse_file(rest)
        return _parse_opaque(scheme, rest)
    except URLParseError:
        return None


def _split_fragment_query(rest: str) -> tuple[str, str | None, str | None]:
    fragment = None
    query = None
    hash_index = rest.find("#")
    if hash_index != -1:
        fragment = rest[hash_index + 1 :]
        rest = rest[:hash_index]
    q_index = rest.find("?")
    if q_index != -1:
        query = rest[q_index + 1 :]
        rest = rest[:q_index]
    return rest, query, fragment


def _parse_special(scheme: str, rest: str) -> str:
    # special schemes treat \ like / in PATH states only (query/fragment
    # keep backslashes verbatim, per new URL) and tolerate any number of
    # leading slashes
    rest, query, fragment = _split_fragment_query(rest)
    rest = rest.replace("\\", "/")
    rest = rest.lstrip("/")
    slash = rest.find("/")
    if slash == -1:
        authority, path = rest, ""
    else:
        authority, path = rest[:slash], rest[slash:]
    userinfo = ""
    if "@" in authority:
        userinfo, authority = authority.rsplit("@", 1)
    port: int | None = None
    host = authority
    if host.startswith("["):
        close = host.find("]")
        if close == -1:
            raise URLParseError("unclosed IPv6 literal")
        if ":" in host[close:]:
            host, port_text = host[: close + 1], host[close + 2 :]
            port = _parse_port(port_text)
    elif ":" in host:
        host, port_text = host.split(":", 1)
        port = _parse_port(port_text)
    host = _canonical_host(host)
    if port == _SPECIAL_PORTS[scheme]:
        port = None
    path = _percent_encode(_remove_dot_segments(path), _PATH_ENCODE)
    if not path.startswith("/"):
        path = "/" + path
    out = [scheme, "://"]
    if userinfo:
        out.extend([_percent_encode(userinfo, _USERINFO_ENCODE), "@"])
    out.append(host)
    if port is not None:
        out.append(f":{port}")
    out.append(path)
    if query is not None:
        out.extend(["?", _percent_encode(query, _SPECIAL_QUERY_ENCODE)])
    if fragment is not None:
        out.extend(["#", _percent_encode(fragment, _FRAGMENT_ENCODE)])
    return "".join(out)


def _parse_port(port_text: str) -> int | None:
    if port_text == "":
        return None
    if not port_text.isdigit():
        raise URLParseError(f"invalid port {port_text!r}")
    port = int(port_text)
    if port > 65535:
        raise URLParseError("port out of range")
    return port


def _parse_file(rest: str) -> str:
    rest, query, fragment = _split_fragment_query(rest)
    rest = rest.replace("\\", "/")
    if rest.startswith("//"):
        rest = rest[2:]
        slash = rest.find("/")
        if slash == -1:
            host, path = rest, ""
        else:
            host, path = rest[:slash], rest[slash:]
        host = "" if host in ("", "localhost") else _canonical_host(host)
    else:
        host, path = "", rest
    path = _percent_encode(_remove_dot_segments(path), _PATH_ENCODE)
    if not path.startswith("/"):
        path = "/" + path
    out = ["file://", host, path]
    if query is not None:
        out.extend(["?", _percent_encode(query, _SPECIAL_QUERY_ENCODE)])
    if fragment is not None:
        out.extend(["#", _percent_encode(fragment, _FRAGMENT_ENCODE)])
    return "".join(out)


def _parse_opaque(scheme: str, rest: str) -> str:
    # non-special scheme: the path is opaque — only C0 controls and non-ASCII
    # are percent-encoded; nothing else is touched
    rest, query, fragment = _split_fragment_query(rest)
    encoded = _percent_encode(rest, set())
    out = [scheme, ":", encoded]
    if query is not None:
        out.extend(["?", _percent_encode(query, _QUERY_ENCODE)])
    if fragment is not None:
        out.extend(["#", _percent_encode(fragment, _FRAGMENT_ENCODE)])
    return "".join(out)


def is_hierarchical(value: str) -> bool:
    """True when the URL has a host-rooted (non-opaque) path a relative
    reference can resolve against."""
    m = _SCHEME_RE.match(value)
    if not m:
        return False
    scheme = m.group(1).lower()
    return scheme in _SPECIAL_PORTS or (
        scheme == "file" or value[m.end() : m.end() + 2] == "//"
    )


def normalize_location(value: str) -> str:
    """An absolute URL is stored the way a reference to it will resolve;
    anything else — relative location, Content-ID, generated id — is left
    alone (util.js:518-525)."""
    href = parse_absolute(value)
    return value if href is None else href


def resolve_path(path: str, base: str | None) -> str:
    """``new URL(path, base).href`` with the reference's fallbacks
    (util.js:527-547): ``data:`` passes through, an unresolvable reference is
    returned as written, and a protocol-relative ``//`` path borrows the
    base's scheme."""
    # WHATWG input preprocessing applies to the relative input too
    path = path.strip(_C0_SPACE)
    if "\t" in path or "\n" in path or "\r" in path:
        path = path.replace("\t", "").replace("\n", "").replace("\r", "")
    if not base or path.startswith("data:"):
        return path
    href = parse_absolute(path)
    if href is not None:
        return href
    base_href = parse_absolute(base)
    if base_href is not None and is_hierarchical(base):
        joined = urljoin(base_href, path)
        norm = parse_absolute(joined)
        return joined if norm is None else norm
    if path.startswith("//"):
        m = re.match(r"^[^:]+", base)
        return f"{m.group(0)}:{path}" if m else path
    return path
