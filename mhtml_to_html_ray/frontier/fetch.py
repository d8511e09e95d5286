"""The frontier's per-URL fetch: the reference's retry state machine
(convert.js:165-232), instrumented for the engine — statuses, attempt
counts and timing come back as data instead of vanishing into a boolean.

Semantics replicated exactly (pinned by tests/test_retry.py at kernel level
and tests/test_frontier.py at engine level):
* transient = 429, 500-599, or a raised error
* backoff 500·2^attempt ms capped at 5000 ms
* Retry-After honored (seconds or HTTP-date); beyond the cap → give up NOW
* permanent statuses: one attempt
* max_retries bounds retries (attempts = retries + 1)
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

from ..kernel.convert import (
    get_backoff_delay_ms,
    is_transient_status,
    parse_retry_after_ms,
    MAX_RETRY_DELAY_MS,
)


@dataclass
class FetchOutcome:
    url: str
    ok: bool
    status: int
    attempts: int
    content_type: str | None
    body: bytes
    fetch_ms: float
    error: str | None = None
    final_url: str | None = None  # post-redirect URL from the transport


def fetch_with_retry(
    url: str,
    transport: Callable,
    max_retries: int = 2,
    sleep_ms: Callable[[float], None] | None = None,
    now_ms: Callable[[], float] | None = None,
) -> FetchOutcome:
    sleep_ms = sleep_ms or (lambda ms: time.sleep(ms / 1000.0))
    now_ms = now_ms or (lambda: time.time() * 1000.0)
    started = now_ms()
    attempts = 0
    last_status = 0
    last_error: str | None = None
    while True:
        attempts += 1
        delay: float | None = None
        # per-attempt: a final status-based failure must not carry a stale
        # exception message from an earlier attempt
        last_error = None
        try:
            response = transport(url)
            last_status = getattr(response, "status", 0)
            if response.ok:
                content_type = response.headers.get("Content-Type") if response.headers else None
                body = bytes(response.bytes()) if getattr(response, "bytes", None) else response.text().encode("utf-8")
                return FetchOutcome(
                    url=url, ok=True, status=last_status, attempts=attempts,
                    content_type=content_type or "application/octet-stream",
                    body=body, fetch_ms=now_ms() - started,
                    final_url=getattr(response, "final_url", None),
                )
            if not is_transient_status(response.status):
                return FetchOutcome(url=url, ok=False, status=last_status, attempts=attempts,
                                    content_type=None, body=b"", fetch_ms=now_ms() - started)
            retry_after = response.headers.get("Retry-After") if response.headers else None
            if retry_after:
                delay = parse_retry_after_ms(retry_after, now_ms)
                if delay is None or delay > MAX_RETRY_DELAY_MS:
                    delay = None  # a Retry-After beyond the cap gives up at once
            else:
                delay = get_backoff_delay_ms(attempts - 1)
        except Exception as exc:
            last_error = f"{type(exc).__name__}: {exc}"
            delay = get_backoff_delay_ms(attempts - 1)
        if delay is None or attempts > max_retries:
            return FetchOutcome(url=url, ok=False, status=last_status, attempts=attempts,
                                content_type=None, body=b"", fetch_ms=now_ms() - started,
                                error=last_error)
        sleep_ms(delay)
