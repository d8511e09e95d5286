"""WHATWG srcset attribute parser/serializer.

Implements the HTML spec "parse a srcset attribute" algorithm with the
reference's one deliberate deviation (srcset-parser.js:329-334): an invalid
descriptor keeps the candidate with its descriptors verbatim, because this
parser rewrites attributes rather than selecting an image — dropping the
candidate would lose the URL from the rewritten attribute.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_LEADING_COMMAS_OR_SPACES = re.compile(r"^[, \t\n\r\f]+")
_LEADING_SPACES = re.compile(r"^[ \t\n\r\f]+")
_LEADING_NOT_SPACES = re.compile(r"^[^ \t\n\r\f]+")
_TRAILING_COMMAS = re.compile(r",+$")
_NON_NEGATIVE_INT = re.compile(r"^\d+$")
_FLOAT = re.compile(r"^-?(?:[0-9]+|[0-9]*\.[0-9]+)(?:[eE][+-]?[0-9]+)?$")
_SPACE_CHARS = " \t\n\f\r"


@dataclass
class Candidate:
    url: str
    w: int | None = None
    d: float | None = None
    h: int | None = None
    descriptors: list[str] | None = None


def parse(input_value: str) -> list[Candidate]:
    pos = 0
    n = len(input_value)
    candidates: list[Candidate] = []

    def collect(regex: re.Pattern) -> str | None:
        nonlocal pos
        m = regex.match(input_value[pos:])
        if m:
            pos += len(m.group(0))
            return m.group(0)
        return None

    while True:
        collect(_LEADING_COMMAS_OR_SPACES)
        if pos >= n:
            return candidates
        url = collect(_LEADING_NOT_SPACES) or ""
        descriptors: list[str] = []
        if url.endswith(","):
            url = _TRAILING_COMMAS.sub("", url)
            _parse_descriptors(candidates, url, descriptors)
        else:
            collect(_LEADING_SPACES)
            current = ""
            state = "in descriptor"
            while True:
                c = input_value[pos] if pos < n else ""
                if state == "in descriptor":
                    if c and c in _SPACE_CHARS:
                        if current:
                            descriptors.append(current)
                            current = ""
                            state = "after descriptor"
                    elif c == ",":
                        pos += 1
                        if current:
                            descriptors.append(current)
                        _parse_descriptors(candidates, url, descriptors)
                        break
                    elif c == "(":
                        current += c
                        state = "in parens"
                    elif c == "":
                        if current:
                            descriptors.append(current)
                        _parse_descriptors(candidates, url, descriptors)
                        break
                    else:
                        current += c
                elif state == "in parens":
                    if c == ")":
                        current += c
                        state = "in descriptor"
                    elif c == "":
                        descriptors.append(current)
                        _parse_descriptors(candidates, url, descriptors)
                        break
                    else:
                        current += c
                else:  # after descriptor
                    if c and c in _SPACE_CHARS:
                        pass
                    elif c == "":
                        _parse_descriptors(candidates, url, descriptors)
                        break
                    else:
                        state = "in descriptor"
                        pos -= 1
                pos += 1


def _parse_descriptors(candidates: list[Candidate], url: str, descriptors: list[str]) -> None:
    error = False
    w = d = h = None
    for desc in descriptors:
        last_char = desc[-1] if desc else ""
        value = desc[:-1]
        int_val = int(value) if _NON_NEGATIVE_INT.match(value) else None
        float_val = float(value) if _FLOAT.match(value) else None
        if _NON_NEGATIVE_INT.match(value) and last_char == "w":
            if w or d is not None:
                error = True
            if int_val == 0:
                error = True
            else:
                w = int_val
        elif _FLOAT.match(value) and last_char == "x":
            if w or d is not None or h:
                error = True
            if float_val < 0:
                error = True
            else:
                d = float_val
        elif _NON_NEGATIVE_INT.match(value) and last_char == "h":
            if h or d is not None:
                error = True
            if int_val == 0:
                error = True
            else:
                h = int_val
        else:
            error = True
    candidate = Candidate(url=url)
    if error:
        candidate.descriptors = list(descriptors)
    else:
        if w:
            candidate.w = w
        if d is not None:
            candidate.d = d
        if h:
            candidate.h = h
    candidates.append(candidate)


def _format_density(d: float) -> str:
    # JS Number stringification: 2.0 prints as "2", 1.5 as "1.5"
    return str(int(d)) if d == int(d) else repr(d)


def serialize(candidates: list[Candidate]) -> str:
    parts = []
    for candidate in candidates:
        descriptors = list(candidate.descriptors) if candidate.descriptors else []
        if candidate.w:
            descriptors.append(f"{candidate.w}w")
        if candidate.h:
            descriptors.append(f"{candidate.h}h")
        if candidate.d is not None:
            descriptors.append(f"{_format_density(candidate.d)}x")
        parts.append(" ".join([candidate.url] + descriptors))
    return ", ".join(parts)
