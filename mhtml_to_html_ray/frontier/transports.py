"""Pluggable fetch transports (the injected-fetch extension surface,
mod.d.ts:85). The sandbox has no network: DictTransport serves a routes map
(the scripted/stub doubles of the reference suites, picklable so it ships to
fetch actors); a real HTTP transport would slot in with the same signature.
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
