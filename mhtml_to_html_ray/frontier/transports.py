"""Pluggable fetch transports (the injected-fetch extension surface,
mod.d.ts:85). DictTransport serves a routes map (the scripted/stub doubles
of the reference suites, picklable so it ships to fetch actors);
HttpTransport is the real-network implementation with the same signature
(convert.js:165-200 semantics: content-type from the response header, thrown
network errors count as transient, Retry-After surfaced for the retry state
machine). Tests exercise it against a loopback HTTP server.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class TransportHeaders:
    def __init__(self, mapping: dict | None = None):
        self.mapping = mapping or {}

    def get(self, name: str):
        for key, value in self.mapping.items():
            if key.lower() == name.lower():
                return value
        return None


@dataclass
class TransportResponse:
    ok: bool
    status: int
    body: bytes = b""
    content_type: str | None = None
    retry_after: str | None = None
    final_url: str | None = None  # post-redirect URL (None = no redirect /
    # transport doesn't track it); discovery resolves relative links here

    @property
    def headers(self) -> TransportHeaders:
        mapping = {}
        if self.content_type is not None:
            mapping["Content-Type"] = self.content_type
        if self.retry_after is not None:
            mapping["Retry-After"] = self.retry_after
        return TransportHeaders(mapping)

    def text(self) -> str:
        return self.body.decode("utf-8", "replace")

    def bytes(self) -> bytes:
        return self.body


@dataclass
class DictTransport:
    """routes: url → (content_type, body bytes/str) | int status | 'throw' |
    list of outcomes consumed per attempt (last repeats)."""

    routes: dict = field(default_factory=dict)
    attempt_counts: dict = field(default_factory=dict)

    def __call__(self, url: str) -> TransportResponse:
        self.attempt_counts[url] = self.attempt_counts.get(url, 0) + 1
        route = self.routes.get(url)
        if isinstance(route, list):
            route = route[min(self.attempt_counts[url] - 1, len(route) - 1)]
        if route is None:
            return TransportResponse(ok=False, status=404)
        if route == "throw":
            raise OSError("network down")
        if isinstance(route, int):
            return TransportResponse(ok=False, status=route)
        content_type, body = route
        if isinstance(body, str):
            body = body.encode("utf-8")
        return TransportResponse(ok=True, status=200, body=body, content_type=content_type)


class DictTransportFactory:
    """Picklable factory: each fetch actor builds its own transport over the
    shared routes map."""

    def __init__(self, routes: dict):
        self.routes = routes

    def __call__(self) -> DictTransport:
        return DictTransport(dict(self.routes))


class SyntheticSiteTransport:
    """Soak/bench double: a deterministic synthetic web of
    ``n_hosts × pages_per_host`` pages generated on the fly (no routes dict
    to ship). Page j of a host links to pages 2j+1 and 2j+2 (binary tree →
    BFS reaches every page in ~log2 waves); urls look like
    https://h{i}.soak.example/p{j}."""

    def __init__(self, n_hosts: int, pages_per_host: int):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host

    def __call__(self, url: str) -> TransportResponse:
        try:
            host_part, page_part = url.split("//", 1)[1].split("/", 1)
            host_index = int(host_part.split(".", 1)[0][1:])
            page_index = int(page_part[1:])
        except (ValueError, IndexError):
            return TransportResponse(ok=False, status=404)
        if not (0 <= host_index < self.n_hosts and 0 <= page_index < self.pages_per_host):
            return TransportResponse(ok=False, status=404)
        links = "".join(
            f'<a href="https://h{host_index}.soak.example/p{child}">c</a>'
            for child in (2 * page_index + 1, 2 * page_index + 2)
            if child < self.pages_per_host
        )
        body = f"<html><body><p>page {page_index}</p>{links}</body></html>".encode()
        return TransportResponse(ok=True, status=200, body=body, content_type="text/html")


class SyntheticSiteFactory:
    def __init__(self, n_hosts: int, pages_per_host: int):
        self.n_hosts = n_hosts
        self.pages_per_host = pages_per_host

    def __call__(self) -> SyntheticSiteTransport:
        return SyntheticSiteTransport(self.n_hosts, self.pages_per_host)


@dataclass
class HttpTransport:
    """Real HTTP GET over urllib (stdlib only — no extra deps).

    Contract match with the reference's fetch usage (convert.js:165-200):
    * 2xx → ok; other statuses → ok=False with the status surfaced so the
      retry state machine classifies transient (429/5xx) vs permanent
    * network-level failures RAISE — fetch_resource/fetch_with_retry treat a
      thrown error as transient, exactly like the reference's try/catch
    * Content-Type / Retry-After come straight from the response headers
    """

    timeout_s: float = 30.0
    user_agent: str = "mhtml-to-html-ray"
    max_bytes: int | None = None  # optional body-size guard for crawls

    def __call__(self, url: str) -> TransportResponse:
        import urllib.error
        import urllib.request

        # scheme allowlist: crawled content controls these URLs (urn:
        # unwrapping included) and urllib's default opener would happily
        # serve file:// and ftp:// — never let a page read the local disk
        scheme = url.split(":", 1)[0].lower() if ":" in url else ""
        if scheme not in ("http", "https"):
            return TransportResponse(ok=False, status=-2)

        request = urllib.request.Request(url, headers={"User-Agent": self.user_agent})
        try:
            with urllib.request.urlopen(request, timeout=self.timeout_s) as response:
                body = (
                    response.read()
                    if self.max_bytes is None
                    else response.read(self.max_bytes)
                )
                status = response.status
                final = response.geturl()
                return TransportResponse(
                    ok=200 <= status < 300,
                    status=status,
                    body=body,
                    content_type=response.headers.get("Content-Type"),
                    retry_after=response.headers.get("Retry-After"),
                    final_url=final if final != url else None,
                )
        except urllib.error.HTTPError as error:
            try:
                body = error.read() or b""
            except Exception:
                body = b""
            headers = error.headers
            return TransportResponse(
                ok=False,
                status=error.code,
                body=body,
                content_type=headers.get("Content-Type") if headers else None,
                retry_after=headers.get("Retry-After") if headers else None,
            )
        # urllib.error.URLError (DNS failure, refused connection, timeout)
        # intentionally propagates: thrown errors are the transient path


class HttpTransportFactory:
    """Picklable factory for fetch actors crawling the real network."""

    def __init__(self, timeout_s: float = 30.0, user_agent: str = "mhtml-to-html-ray",
                 max_bytes: int | None = None):
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.max_bytes = max_bytes

    def __call__(self) -> HttpTransport:
        return HttpTransport(self.timeout_s, self.user_agent, self.max_bytes)
