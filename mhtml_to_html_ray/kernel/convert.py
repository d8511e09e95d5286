"""Per-document conversion: the DOM/CSS rewrite walk and the fetch rounds.

Faithful re-expression of `/root/reference/lib/convert.js`:

* ``convert()`` — one breadth-first walk (growing cursor, convert.js:288-604)
  that either collects missing references or rewrites in place: inlining as
  data URIs, stylesheet rewriting, frame recursion, link hygiene, head
  injection (CSP / charset / JSON-LD / canonical), title + favicon
  extraction, unfound-resource reporting.
* ``fetch_and_convert()`` — the round loop (convert.js:129-146): collect →
  filter failed → fetch with a bounded worker pool (shared cursor,
  convert.js:148-163) → merge → repeat to fixpoint → final rewrite.
* retry policy (convert.js:165-232): transient = 429/5xx/raised error,
  exponential backoff 500·2^k capped 5000 ms, Retry-After honored but beyond
  the cap gives up at once, permanent statuses attempted once.

The fetch scheduler here is the single-document seed of the engine-level
frontier (mhtml_to_html_ray.frontier); both share these exact semantics.
"""

from __future__ import annotations

import json
import re
import threading
import time
from dataclasses import dataclass, field
from typing import Callable
from urllib.parse import quote

from . import srcset as srcset_parser
from .bytesops import (
    decode_base64_bytes,
    encode_base64,
    get_charset,
    get_media_type,
    is_image,
    is_media,
    is_plain_text,
    is_stylesheet,
)
from .charsets import decode_string, encode_string
from .css import original_url_rewrite, rewrite_stylesheet
from .dom import Element
from .headers import decode_mime_header
from .mime import (
    ANOMALY_INDEX_SYNTHESIZED,
    MHTML,
    Resource,
    get_resource_dom,
    parse,
    release_resource_dom,
)
from .urlutil import parse_absolute, resolve_path

INDEX_PAGE_NOT_FOUND_ERROR = "Index page not found"

# the stylesheet descent (replace_stylesheet_urls → @import → descend) is
# recursive like the reference's css-tree walk; ~7 frames per import level
# means Python's default 1000-frame limit caps chains near 140. Raise it so
# deep-but-legitimate chains convert; a truly pathological page still lands
# in the extraction stage's per-row error column (RecursionError is trapped
# there), never a crashed task.
import sys as _sys

if _sys.getrecursionlimit() < 20_000:
    _sys.setrecursionlimit(20_000)

EVENT_HANDLER_ATTRIBUTES = frozenset(
    """onafterprint onbeforeprint onbeforeunload onhashchange onlanguagechange
    onmessage onmessageerror onoffline ononline onpagehide onpageshow
    onpopstate onrejectionhandled onstorage onunhandledrejection onunload
    ongamepadconnected ongamepaddisconnected onabort onblur onfocus oncancel
    onauxclick onbeforeinput onbeforetoggle oncanplay oncanplaythrough
    onchange onclick onclose oncontentvisibilityautostatechange oncontextlost
    oncontextmenu oncontextrestored oncopy oncuechange oncut ondblclick
    ondrag ondragend ondragenter ondragleave ondragover ondragstart ondrop
    ondurationchange onemptied onended onformdata oninput oninvalid onkeydown
    onkeypress onkeyup onload onloadeddata onloadedmetadata onloadstart
    onmousedown onmouseenter onmouseleave onmousemove onmouseout onmouseover
    onmouseup onwheel onpaste onpause onplay onplaying onprogress
    onratechange onreset onresize onscroll onscrollend
    onsecuritypolicyviolation onseeked onseeking onselect onslotchange
    onstalled onsubmit onsuspend ontimeupdate onvolumechange onwaiting
    onselectstart onselectionchange ontoggle onpointercancel onpointerdown
    onpointerup onpointermove onpointerout onpointerover onpointerenter
    onpointerleave ongotpointercapture onlostpointercapture
    onanimationcancel onanimationend onanimationiteration onanimationstart
    ontransitioncancel ontransitionend ontransitionrun ontransitionstart
    onerror onfullscreenchange onfullscreenerror""".split()
)

_REL_REMOVED_VALUES_RE = re.compile(
    r"(preconnect|prerender|dns-prefetch|preload|prefetch|manifest|modulepreload)",
    re.IGNORECASE,
)
_URN_ERROR_RE = re.compile(r"^urn:[^:]+:(.+)$")
DEFAULT_CSP = (
    "default-src 'none'; connect-src 'self' data:; font-src 'self' data:; "
    "img-src 'self' data:; style-src 'self' 'unsafe-inline' data:; "
    "frame-src 'self' data:; media-src 'self' data:; object-src 'self' data:; "
)
JS_ENABLED_CSP = "script-src 'self' 'unsafe-inline' data:;"
JS_DISABLED_CSP = "script-src 'none';"
_CID_RE = re.compile(r"^<.+>$")
JSON_LD_CONTENT_TYPE = "application/ld+json"

TOO_MANY_REQUESTS_STATUS = 429
SERVER_ERROR_STATUS = 500
SERVER_ERROR_MAX_STATUS = 599
DEFAULT_MAX_RETRIES = 2
DEFAULT_MAX_PARALLEL_REQUESTS = 16
RETRY_BASE_DELAY_MS = 500.0
MAX_RETRY_DELAY_MS = 5000.0


class ConvertError(Exception):
    pass


@dataclass
class Config:
    enable_scripts: bool = False
    fetch_missing_resources: bool = False
    fetch: Callable | None = None
    # injectable HTML parser backend (the reference's DOMParser option,
    # mod.d.ts:125-195): (data, content_type) -> DOM; None = kernel parser
    dom_parser: Callable | None = None
    max_retries: int = DEFAULT_MAX_RETRIES
    max_parallel_requests: int = DEFAULT_MAX_PARALLEL_REQUESTS
    # injectable clocks so retry timing is testable at any speed
    sleep_ms: Callable[[float], None] = field(default=lambda ms: time.sleep(ms / 1000.0))
    now_ms: Callable[[], float] = field(default=lambda: time.time() * 1000.0)


@dataclass
class PageData:
    """convert() output (convert.js:647-657 / mod.d.ts:273-317).

    ``text`` is engine-side (not in the reference's PageData): the extracted
    plain text of the final tree, captured before serialization so the
    extraction stage needn't re-parse its own output."""

    data: str
    title: str | None
    favicons: list[dict]
    unfound_resources: list[str]
    anomalies: list[dict]
    text: str | None = None


def get_resource_uri(resource) -> str:
    """data: URI for a part (util.js:502-504)."""
    content_type = getattr(resource, "content_type", None)
    transfer_encoding = getattr(resource, "transfer_encoding", None)
    data = getattr(resource, "data", "")
    payload = data if transfer_encoding == "base64" else encode_base64(encode_string(str(data)))
    return f"data:{get_media_type(content_type)};base64,{payload}"


def _decode_base64_text(value: str, charset: str | None) -> str:
    decoded = decode_base64_bytes(value)
    return value if decoded is None else decode_string(decoded, charset)


# ---------------------------------------------------------------------------
# fetch scheduler (convert.js:129-232)


def is_transient_status(status: int) -> bool:
    return status == TOO_MANY_REQUESTS_STATUS or (
        SERVER_ERROR_STATUS <= status <= SERVER_ERROR_MAX_STATUS
    )


def get_backoff_delay_ms(index_attempt: int) -> float:
    return min(RETRY_BASE_DELAY_MS * (2**index_attempt), MAX_RETRY_DELAY_MS)


def parse_retry_after_ms(retry_after: str, now_ms: Callable[[], float]) -> float | None:
    try:
        seconds = float(retry_after)
        return max(0.0, seconds * 1000.0)
    except ValueError:
        pass
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime(retry_after)
    except (TypeError, ValueError):
        return None
    return max(0.0, dt.timestamp() * 1000.0 - now_ms())


def _get_retry_delay_ms(response, index_attempt: int, now_ms) -> float | None:
    headers = getattr(response, "headers", None)
    retry_after = headers.get("Retry-After") if headers is not None else None
    if retry_after:
        delay = parse_retry_after_ms(retry_after, now_ms)
        if delay is None or delay > MAX_RETRY_DELAY_MS:
            return None
        return delay
    return get_backoff_delay_ms(index_attempt)


def fetch_resource(resource, fetch: Callable, config: Config) -> bool:
    """One URL through the retry state machine (convert.js:165-200)."""
    url = resource.id
    urn_match = _URN_ERROR_RE.match(url)
    if urn_match:
        url = urn_match.group(1)
    index_attempt = 0
    while True:
        delay: float | None = None
        try:
            response = fetch(url)
            if response.ok:
                resource.content_type = (
                    response.headers.get("Content-Type") or "application/octet-stream"
                )
                if resource.transfer_encoding == "base64":
                    resource.data = encode_base64(bytes(response.bytes()))
                else:
                    resource.data = response.text()
                return True
            if not is_transient_status(response.status):
                return False
            delay = _get_retry_delay_ms(response, index_attempt, config.now_ms)
        except Exception:
            delay = get_backoff_delay_ms(index_attempt)
        if delay is None or index_attempt >= config.max_retries:
            return False
        config.sleep_ms(delay)
        index_attempt += 1


def fetch_resources(missing_resources, mhtml: MHTML, fetch, config: Config, failed_resources) -> None:
    """Bounded worker pool pulling from a shared cursor (convert.js:148-163):
    peak concurrency equals min(cap, n) exactly; 0/negative caps fall back to
    one worker."""
    count_workers = max(1, min(config.max_parallel_requests, len(missing_resources)))
    lock = threading.Lock()
    cursor = [0]

    def worker() -> None:
        while True:
            with lock:
                if cursor[0] >= len(missing_resources):
                    return
                resource = missing_resources[cursor[0]]
                cursor[0] += 1
            if fetch_resource(resource, fetch, config):
                mhtml.resources[resource.id] = resource
            else:
                with lock:
                    if resource.id not in failed_resources:
                        failed_resources.append(resource.id)

    if count_workers == 1:
        worker()
        return
    threads = [threading.Thread(target=worker) for _ in range(count_workers)]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()


def fetch_and_convert(mhtml, config: Config | None = None, failed_resources=None) -> PageData:
    """The round loop (convert.js:129-146): collect → filter failed → fetch →
    merge → recurse; final rewrite with fetching disabled."""
    config = config or Config()
    if isinstance(mhtml, (bytes, str)):
        mhtml = parse(mhtml, dom_parser=config.dom_parser)
    if failed_resources is None:
        failed_resources = []
    if config.fetch_missing_resources:
        fetch = config.fetch
        # the reference recurses per round (convert.js:139); a loop here so a
        # pathological 1000-deep reference chain can't hit the recursion limit
        while True:
            missing = convert_walk(mhtml, config)
            missing = [resource for resource in missing if resource.id not in failed_resources]
            if not missing:
                break
            fetch_resources(missing, mhtml, fetch, config, failed_resources)
        final_config = Config(
            enable_scripts=config.enable_scripts,
            fetch_missing_resources=False,
            fetch=config.fetch,
            dom_parser=config.dom_parser,
            max_retries=config.max_retries,
            max_parallel_requests=config.max_parallel_requests,
            sleep_ms=config.sleep_ms,
            now_ms=config.now_ms,
        )
        return convert_walk(mhtml, final_config)
    return convert_walk(mhtml, config)


def convert(data, config: Config | None = None) -> PageData:
    """Public entry (lib/mod.js:35-43): bytes/str are parsed first."""
    return fetch_and_convert(data, config)


# ---------------------------------------------------------------------------
# the walk


class _Reference:
    __slots__ = ("id", "raw_id", "encoding", "resource", "has_resource", "descend", "found", "not_found")

    def __init__(self, id, raw_id=None, encoding=None, resource=None, has_resource=False,
                 descend=None, found=None, not_found=None):
        self.id = id
        self.raw_id = raw_id
        self.encoding = encoding
        self.resource = resource
        self.has_resource = has_resource
        self.descend = descend
        self.found = found
        self.not_found = not_found


def get_resource(resources: dict, id: str | None, raw_id: str | None):
    """id → resource via normalized id, raw id, then cid:→<id> fallback; a
    fragment-carrying reference deliberately does not match the bare resource
    (convert.js:794-808)."""
    resource = resources.get(id)
    if resource is None and raw_id is not None:
        resource = resources.get(raw_id)
    if resource is None and id and id.startswith("cid:"):
        resource = resources.get(f"<{id[len('cid:'):]}>")
    return resource


def add_missing_resource(missing_resources: list, id: str, transfer_encoding=None) -> None:
    """Only http/https/urn are fetched; a URL already queued is not added
    again (convert.js:810-814)."""
    if id.startswith(("http:", "https:", "urn:")) and not any(
        resource.id == id for resource in missing_resources
    ):
        resource = Resource(id, None, transfer_encoding)
        resource.data = ""
        missing_resources.append(resource)


class OrderedStrSet:
    """Insertion-ordered string set. The reference's unfoundResources is a JS
    Set, which iterates in insertion (first-encounter) order
    (convert.js:639-645); a Python set's iteration order is
    PYTHONHASHSEED-dependent and would make the unfound_resources output
    column flap across workers/runs."""

    __slots__ = ("_entries",)

    def __init__(self) -> None:
        self._entries: dict[str, None] = {}

    def add(self, value: str) -> None:
        self._entries[value] = None

    def __contains__(self, value: str) -> bool:
        return value in self._entries

    def __iter__(self):
        return iter(self._entries)

    def __len__(self) -> int:
        return len(self._entries)


def resolve_reference(resources, missing_resources, unfound_resources, reference: _Reference) -> None:
    """The one place where the collecting and rewriting walks part ways
    (convert.js:776-792)."""
    if reference.has_resource:
        resource = reference.resource
    else:
        resource = get_resource(resources, reference.id, reference.raw_id)
    if resource is not None:
        if reference.descend:
            reference.descend(resource)
        if missing_resources is None:
            resource.used = True
            if reference.found:
                reference.found(resource)
    elif missing_resources is not None:
        add_missing_resource(missing_resources, reference.id, reference.encoding)
    else:
        unfound_resources.add(reference.id)
        if reference.not_found:
            reference.not_found()


def set_attribute(element: Element, attribute: str, new_value: str | None = ...) -> None:
    """Record the original URL as data-original-* before overwriting
    (convert.js:685-693)."""
    value = element.get_attribute(attribute)
    if value and not value.startswith("data:") and value != new_value:
        element.set_attribute("data-original-" + attribute, value)
    if new_value is not ...:
        element.set_attribute(attribute, new_value)


def _escape_text(value: str) -> str:
    return value.replace("&", "&amp;").replace("<", "&lt;")


def create_document(resources: dict):
    """Build the page a browser would show for an archive holding no page
    (convert.js:663-679): first image as <img>, or first plain text as
    <pre>; anything else is left for the caller to reject."""
    seen = set()
    for resource in resources.values():
        if id(resource) in seen:
            continue
        seen.add(id(resource))
        content_type = resource.content_type
        if is_image(content_type):
            copy = Resource(resource.id, "text/html", None)
            copy.data = f'<html><body><img src="{get_resource_uri(resource)}"></body></html>'
            return copy
        if is_plain_text(content_type):
            if resource.transfer_encoding == "base64":
                text = _decode_base64_text(str(resource.data), get_charset(content_type))
            else:
                text = str(resource.data)
            copy = Resource(resource.id, "text/html", None)
            copy.data = f"<html><body><pre>{_escape_text(text)}</pre></body></html>"
            return copy
    return None


def replace_stylesheet_urls(
    resources, base, resource_like, stylesheets, missing_resources, unfound_resources
) -> str:
    """CSS url()/@import rewriting with per-id memo doubling as the cycle
    breaker (convert.js:695-768)."""
    resource_id = getattr(resource_like, "id", None)
    if resource_id is not None:
        memo = stylesheets.get(resource_id)
        if memo is not None:
            return resource_like.data if memo.get("data") is None else memo["data"]
        stylesheets[resource_id] = {}
    data = resource_like.data if isinstance(resource_like.data, str) else str(resource_like.data)

    def handle_url(path: str) -> str | None:
        if path.startswith("data:"):
            return None
        target_id = resolve_path(path, base)
        result: dict[str, str] = {}

        def found(resource) -> None:
            if is_stylesheet(resource.content_type):
                resource.data = replace_stylesheet_urls(
                    resources, resource.id, resource, stylesheets, missing_resources, unfound_resources
                )
            result["text"] = original_url_rewrite(target_id, get_resource_uri(resource))

        def not_found() -> None:
            result["text"] = original_url_rewrite(target_id, target_id)

        resolve_reference(
            resources,
            missing_resources,
            unfound_resources,
            _Reference(id=target_id, raw_id=path, encoding="base64", found=found, not_found=not_found),
        )
        return result.get("text")

    def handle_import(path: str) -> str | None:
        if path.startswith("data:"):
            return None
        target_id = resolve_path(path, base)
        result: dict[str, str] = {}

        def descend(resource) -> None:
            resource.data = replace_stylesheet_urls(
                resources, resource.id, resource, stylesheets, missing_resources, unfound_resources
            )

        def found(resource) -> None:
            result["text"] = original_url_rewrite(target_id, get_resource_uri(resource))

        def not_found() -> None:
            result["text"] = original_url_rewrite(target_id, target_id)

        resolve_reference(
            resources,
            missing_resources,
            unfound_resources,
            _Reference(id=target_id, raw_id=path, descend=descend, found=found, not_found=not_found),
        )
        return result.get("text")

    rewritten = rewrite_stylesheet(data, handle_url, handle_import)
    if resource_id is not None:
        stylesheets[resource_id]["data"] = rewritten
    return rewritten


def _get_page_info(headers: dict, index: str) -> dict:
    info = {
        "@context": "https://schema.org",
        "@type": "WebPage",
        "additionalProperty": {
            "@type": "PropertyValue",
            "name": "savedBy",
            "value": decode_mime_header(headers.get("from")),
        },
        "url": index,
        "name": decode_mime_header(headers.get("subject")),
    }
    date = headers.get("date")
    if date is not None:
        info["dateCreated"] = date
    return info


def _json_stringify(obj, indent: int = 2) -> str:
    # JSON.stringify(value, null, 2): no ASCII escaping of non-ASCII
    return json.dumps(obj, indent=indent, ensure_ascii=False)


def convert_walk(mhtml: MHTML, config: Config):
    """The walk itself — collecting (returns missing list) or rewriting
    (returns PageData). convert.js:234-659."""
    resources = mhtml.resources
    frames = mhtml.frames
    headers = mhtml.headers
    index = mhtml.index
    anomalies = mhtml.anomalies if mhtml.anomalies is not None else []
    unfound_resources = (
        mhtml.unfound_resources if mhtml.unfound_resources is not None else OrderedStrSet()
    )
    enable_scripts = config.enable_scripts
    fetch_missing = config.fetch_missing_resources
    mhtml_id = mhtml.id

    resource = resources.get(index) if index is not None else None
    if resource is None:
        resource = create_document(resources)
        if resource is None:
            raise ConvertError(INDEX_PAGE_NOT_FOUND_ERROR)
        index = resource.id
        if not fetch_missing:
            # reported on a copy so converting the same archive again reports
            # it once again instead of twice (convert.js:245-248)
            anomalies = [*anomalies, {"type": ANOMALY_INDEX_SYNTHESIZED, "id": index}]
    base = resource.id
    if resource.transfer_encoding == "base64":
        resource.transfer_encoding = None
        charset = get_charset(resource.content_type) if resource.content_type else None
        resource.data = _decode_base64_text(str(resource.data), charset)
    content_type = resource.content_type.split(";")[0] if resource.content_type else None
    dom = get_resource_dom(resource, content_type, config.dom_parser)
    if not fetch_missing:
        # the rewrite mutates the tree, so the cached one is given up
        release_resource_dom(resource)
    document = dom.document
    nodes: list = [document]
    base_elements = document.get_elements_by_tag_name("base")
    if base_elements:
        base_element = base_elements[0]
        href = base_element.get_attribute("href")
        if href:
            base = resolve_path(href, base)
        if not fetch_missing:
            base_element.remove()
    if not fetch_missing:
        resource.used = True

    canonical_link_element = None
    stylesheets: dict = {}
    missing_resources: list | None = [] if fetch_missing else None
    removed_nodes: list = []
    favicons: list[dict] = []
    title: str | None = None

    index_node = 0
    while index_node < len(nodes):
        child_node = nodes[index_node]
        index_node += 1
        if child_node.child_nodes is None:
            continue
        parent_tag = (child_node.tag_name.upper() if isinstance(child_node, Element) else None)
        child_index = 0
        child_list = child_node.child_nodes
        while child_index < len(child_list):
            child = child_list[child_index]
            child_index += 1
            tag = child.tag_name.upper() if isinstance(child, Element) else None
            href = src = None
            if isinstance(child, Element):
                href = child.get_attribute("href")
                if href:
                    href = resolve_path(href, base)
                src = child.get_attribute("src")
                if src:
                    src = resolve_path(src, base)
                style = child.get_attribute("style")
                if style:
                    declarations = replace_stylesheet_urls(
                        resources, base, _StyleLike(style), stylesheets,
                        missing_resources, unfound_resources,
                    )
                    if not fetch_missing:
                        child.set_attribute("style", declarations)
                if child.get_attribute("integrity"):
                    child.remove_attribute("integrity")
                if not enable_scripts:
                    # driven by the attributes the element carries
                    for attribute_name in list(child.get_attribute_names()):
                        if attribute_name.lower() in EVENT_HANDLER_ATTRIBUTES:
                            child.remove_attribute(attribute_name)

            if tag == "LINK" and href:
                rel = child.get_attribute("rel")
                if rel:
                    rel = rel.lower()
                    rel_tokens = rel.strip().split()
                    if "stylesheet" in rel_tokens:
                        state: dict = {}

                        def descend(resource_found, _child=child, _state=state) -> None:
                            sheet_base = resource_found.id
                            if sheet_base.startswith("cid:"):
                                if index is not None and _CID_RE.match(index):
                                    sheet_base = mhtml_id
                                else:
                                    sheet_base = index
                            _state["stylesheet"] = replace_stylesheet_urls(
                                resources, sheet_base, resource_found, stylesheets,
                                missing_resources, unfound_resources,
                            )

                        def found(resource_found, _child=child, _state=state,
                                  _rel_tokens=rel_tokens, _href=href) -> None:
                            resource_found.data = _state.get("stylesheet")
                            media = _child.get_attribute("media")
                            # a titled/alternate sheet belongs to a style set:
                            # it stays a link, only the address changes
                            if _child.get_attribute("title") or "alternate" in _rel_tokens:
                                set_attribute(_child, "href", get_resource_uri(resource_found))
                            else:
                                style_element = document.create_element("style")
                                if media:
                                    style_element.set_attribute("media", media)
                                if not _href.startswith("data:"):
                                    style_element.set_attribute("data-original-href", _href)
                                style_element.append_child(
                                    document.create_text_node(resource_found.data)
                                )
                                _child.replace_with(style_element)

                        def not_found(_child=child, _href=href) -> None:
                            set_attribute(_child, "href", _href)

                        resolve_reference(
                            resources, missing_resources, unfound_resources,
                            _Reference(id=href, raw_id=child.get_attribute("href"),
                                       descend=descend, found=found, not_found=not_found),
                        )
                    elif "icon" in rel:
                        media = child.get_attribute("media")
                        icon_type = child.get_attribute("type")
                        sizes = child.get_attribute("sizes")

                        def icon_found(resource_found, _child=child, _href=href,
                                       _media=media, _type=icon_type, _sizes=sizes) -> None:
                            resource_uri = get_resource_uri(resource_found)
                            set_attribute(_child, "href", resource_uri)
                            favicons.append({
                                "href": resource_uri, "media": _media, "type": _type,
                                "sizes": _sizes, "originalHref": _href,
                            })

                        def icon_not_found(_child=child, _href=href, _media=media,
                                           _type=icon_type, _sizes=sizes) -> None:
                            set_attribute(_child, "href", _href)
                            favicons.append({
                                "href": _href, "media": _media, "type": _type, "sizes": _sizes,
                            })

                        resolve_reference(
                            resources, missing_resources, unfound_resources,
                            _Reference(id=href, raw_id=child.get_attribute("href"),
                                       encoding="base64", found=icon_found,
                                       not_found=icon_not_found),
                        )
                    elif rel == "canonical" and not fetch_missing:
                        canonical_link_element = child
                    if not fetch_missing:
                        rel_value = _REL_REMOVED_VALUES_RE.sub("", rel).strip()
                        if rel_value:
                            child.set_attribute("rel", rel_value)
                        else:
                            removed_nodes.append(child)
            elif tag == "STYLE":
                style_text = replace_stylesheet_urls(
                    resources, base, _StyleLike(child.text_content), stylesheets,
                    missing_resources, unfound_resources,
                )
                if not fetch_missing:
                    style_element = document.create_element("style")
                    media = child.get_attribute("media")
                    if media:
                        style_element.set_attribute("media", media)
                    # a titled style element belongs to a style set
                    style_title = child.get_attribute("title")
                    if style_title:
                        style_element.set_attribute("title", style_title)
                    style_element.append_child(document.create_text_node(style_text))
                    child.replace_with(style_element)
            elif tag in ("IMG", "AUDIO", "VIDEO", "SOURCE", "SCRIPT"):
                if src:
                    resolve_reference(
                        resources, missing_resources, unfound_resources,
                        _Reference(
                            id=src, raw_id=child.get_attribute("src"), encoding="base64",
                            found=lambda r, _c=child: set_attribute(_c, "src", get_resource_uri(r)),
                            not_found=lambda _c=child, _s=src: set_attribute(_c, "src", _s),
                        ),
                    )
                if tag in ("IMG", "SOURCE"):
                    srcset_value = child.get_attribute("srcset")
                    if srcset_value:
                        candidates = srcset_parser.parse(srcset_value)
                        for candidate in candidates:
                            candidate_src = resolve_path(candidate.url, base)

                            def srcset_found(resource_found, _candidate=candidate) -> None:
                                _candidate.url = get_resource_uri(resource_found)

                            def srcset_not_found(_candidate=candidate, _src=candidate_src) -> None:
                                _candidate.url = _src

                            resolve_reference(
                                resources, missing_resources, unfound_resources,
                                _Reference(id=candidate_src, raw_id=candidate.url,
                                           encoding="base64", found=srcset_found,
                                           not_found=srcset_not_found),
                            )
                        if not fetch_missing:
                            set_attribute(child, "srcset", srcset_parser.serialize(candidates))
                elif tag == "SCRIPT" and not fetch_missing:
                    script_type = child.get_attribute("type")
                    if script_type:
                        script_type = script_type.lower()
                    if not enable_scripts and (not script_type or script_type != JSON_LD_CONTENT_TYPE):
                        removed_nodes.append(child)
            elif tag in ("BODY", "TABLE", "TD", "TH"):
                background = child.get_attribute("background")
                if background and not background.startswith("data:"):
                    resolved_background = resolve_path(background, base)
                    resolve_reference(
                        resources, missing_resources, unfound_resources,
                        _Reference(
                            id=resolved_background, raw_id=background, encoding="base64",
                            found=lambda r, _c=child: set_attribute(_c, "background", get_resource_uri(r)),
                            not_found=lambda _c=child, _b=resolved_background: set_attribute(_c, "background", _b),
                        ),
                    )
            elif tag == "INPUT":
                input_type = child.get_attribute("type")
                if input_type and input_type.lower() == "image" and src:
                    resolve_reference(
                        resources, missing_resources, unfound_resources,
                        _Reference(
                            id=src, raw_id=child.get_attribute("src"), encoding="base64",
                            found=lambda r, _c=child: set_attribute(_c, "src", get_resource_uri(r)),
                            not_found=lambda _c=child, _s=src: set_attribute(_c, "src", _s),
                        ),
                    )
            elif tag in ("IFRAME", "FRAME", "EMBED", "OBJECT"):
                if tag == "OBJECT":
                    attribute = "data"
                    src = child.get_attribute("data")
                    if src:
                        src = resolve_path(src, base)
                else:
                    attribute = "src"
                if src:
                    if src.startswith("cid:"):
                        frame_id = f"<{src.split('cid:', 1)[1]}>"
                        frame_resource = frames.get(frame_id)
                    else:
                        frame_id = src
                        frame_resource = get_resource(resources, src, child.get_attribute(attribute))
                    # a frame does not always hold a document: an image part
                    # must never be parsed as markup (convert.js:525-527)
                    if frame_resource is not None and not (
                        tag in ("EMBED", "OBJECT") or is_media(frame_resource.content_type)
                    ):
                        sub = MHTML(None, frames, {**resources, frame_id: frame_resource},
                                    frame_id, [])
                        sub.id = frame_resource.id
                        sub.unfound_resources = unfound_resources
                        result = convert_walk(sub, config)
                        if fetch_missing:
                            for missing_resource in result:
                                if not any(r.id == missing_resource.id for r in missing_resources):
                                    missing_resources.append(missing_resource)
                        else:
                            frame_resource.used = True
                            if tag == "IFRAME":
                                set_attribute(child, "src")
                                child.remove_attribute("src")
                                child.set_attribute("srcdoc", result.data)
                            else:
                                set_attribute(
                                    child, attribute,
                                    "data:text/html," + quote(result.data, safe="!'()*-._~"),
                                )
                    else:
                        resolve_reference(
                            resources, missing_resources, unfound_resources,
                            _Reference(
                                id=src, resource=frame_resource, has_resource=True,
                                found=lambda r, _c=child, _a=attribute: set_attribute(_c, _a, get_resource_uri(r)),
                                not_found=lambda _c=child, _a=attribute, _s=src: set_attribute(_c, _a, _s),
                            ),
                        )
            elif tag in ("A", "AREA") and not fetch_missing:
                if href:
                    raw_href = child.get_attribute("href")
                    resolved = _resolve_strict(raw_href, base)
                    if resolved is not None:
                        without_fragment, fragment = _split_fragment(resolved)
                        if fragment and without_fragment == base:
                            child.set_attribute("href", "#" + fragment)
                        else:
                            child.set_attribute("href", href)
                    else:
                        child.set_attribute("href", href)
                child.remove_attribute("ping")
            elif tag == "META" and not fetch_missing:
                http_equiv = child.get_attribute("http-equiv")
                if http_equiv:
                    http_equiv = http_equiv.lower()
                    if http_equiv in ("refresh", "content-security-policy"):
                        removed_nodes.append(child)
            # NOTE deliberate reference-parity inconsistency: the COLLECT
            # walk (fetch_missing=True) never descends into template content
            # (so template assets are not queued for fetching), while the
            # rewrite walk does and reports them unfound — convert.js:589
            # gates identically; byte-parity outranks the fix
            elif tag == "TEMPLATE" and not fetch_missing:
                shadow_mode = child.get_attribute("shadowmode")
                if shadow_mode:
                    child.remove_attribute("shadowmode")
                    child.set_attribute("shadowrootmode", shadow_mode)
                if child.content is not None:
                    nodes.append(child.content)
            elif (
                tag == "TITLE"
                and not fetch_missing
                and parent_tag == "HEAD"
                and title is None
                and child.text_content
            ):
                title = child.text_content
            nodes.append(child)

    if fetch_missing:
        return missing_resources

    for node in removed_nodes:
        node.remove()
    head = document.head
    if canonical_link_element is None:
        link_element = document.create_element("link")
        link_element.set_attribute("rel", "canonical")
        link_element.set_attribute("href", index)
        head.append_child(link_element)
    meta_element = document.create_element("meta")
    meta_element.set_attribute("http-equiv", "content-security-policy")
    csp = DEFAULT_CSP + (JS_ENABLED_CSP if enable_scripts else JS_DISABLED_CSP)
    meta_element.set_attribute("content", csp)
    if head.first_child is not None:
        head.prepend(meta_element)
    else:
        head.append_child(meta_element)
    meta_element = document.create_element("meta")
    meta_element.set_attribute("charset", "utf-8")
    head.prepend(meta_element)
    if headers is not None:
        page_info_element = document.create_element("script")
        page_info_element.set_attribute("type", JSON_LD_CONTENT_TYPE)
        page_info_element.append_child(
            document.create_text_node(_json_stringify(_get_page_info(headers, index)))
        )
        head.first_child.after(page_info_element)
    unfound_resource_ids: list[str] = []
    for unfound_id in unfound_resources:
        if not unfound_id.startswith("data:"):
            placeholder = Resource(unfound_id, None, None)
            placeholder.not_found = True
            placeholder.used = True
            placeholder.data = ""
            resources[unfound_id] = placeholder
            unfound_resource_ids.append(unfound_id)
    from .textextract import extract_text_from_document

    return PageData(
        data=dom.serialize(),
        title=title,
        favicons=favicons,
        unfound_resources=unfound_resource_ids,
        anomalies=anomalies,
        text=extract_text_from_document(document),
    )


class _StyleLike:
    """A transient data-holder for style attributes / elements (no id →
    no memoization), mirroring the `{ data: style }` literals in convert.js."""

    __slots__ = ("data", "id")

    def __init__(self, data: str) -> None:
        self.data = data
        self.id = None


def _resolve_strict(path: str, base: str) -> str | None:
    """``new URL(path, base)`` without fallbacks: None on failure."""
    href = parse_absolute(path)
    if href is not None:
        return href
    base_href = parse_absolute(base)
    if base_href is None:
        return None
    resolved = resolve_path(path, base)
    return resolved if parse_absolute(resolved) is not None else None


def _split_fragment(href: str) -> tuple[str, str]:
    hash_index = href.find("#")
    if hash_index == -1:
        return href, ""
    return href[:hash_index], href[hash_index + 1 :]
