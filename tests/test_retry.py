"""Retry policy timing (ported from reference test/retry.test.js). A virtual
clock replaces wall-time sleeps so backoff windows are asserted exactly."""

import base64

from mhtml_to_html_ray.kernel.convert import Config, convert
from tests.helpers import page, scripted_fetch


class VirtualClock:
    """sleep_ms advances time instead of waiting; scripted_fetch logs it."""

    def __init__(self):
        self.now = 0.0

    def sleep_ms(self, ms):
        self.now += ms

    def now_ms(self):
        return self.now

    def now_s(self):
        return self.now / 1000.0


def run(script, markup='<img src="x.png">', **kwargs):
    clock = VirtualClock()
    fetch, log = scripted_fetch(script, now=clock.now_s)
    config = Config(
        fetch_missing_resources=True,
        fetch=fetch,
        sleep_ms=clock.sleep_ms,
        now_ms=clock.now_ms,
        max_parallel_requests=1,
        **kwargs,
    )
    result = convert(page(body=markup), config)
    return result, log, clock


def is_inlined(data):
    return f"data:image/png;base64,{base64.b64encode(b'OK').decode()}" in data


def gap_ms(log):
    return (log[1]["at"] - log[0]["at"]) * 1000.0


def test_503_retried_and_succeeds():
    result, log, _ = run([503, "ok"])
    assert len(log) == 2
    assert is_inlined(result.data)
    assert gap_ms(log) >= 400, f"the retry was not delayed: {gap_ms(log)}ms"


def test_429_retried_and_succeeds():
    result, log, _ = run([429, "ok"])
    assert len(log) == 2
    assert is_inlined(result.data)


def test_network_error_retried_and_succeeds():
    result, log, _ = run(["throw", "ok"])
    assert len(log) == 2
    assert is_inlined(result.data)


def test_404_not_retried():
    result, log, _ = run([404, "ok"])
    assert len(log) == 1
    assert not is_inlined(result.data)


def test_permanent_failure_stops_after_max_retries_plus_one():
    result, log, clock = run([503])
    assert len(log) == 3
    assert isinstance(result.data, str), "exhausted retries must not reject the conversion"
    assert clock.now >= 1400, "the backoff between attempts did not grow"


def test_max_retries_zero_disables_retrying():
    _, log, _ = run([503], max_retries=0)
    assert len(log) == 1


def test_max_retries_four_allows_five_attempts():
    _, log, _ = run(["throw"], max_retries=4)
    assert len(log) == 5


def test_retry_after_seconds_honored():
    result, log, _ = run([{"status": 429, "retryAfter": "1"}, "ok"])
    assert len(log) == 2
    assert is_inlined(result.data)
    assert 900 <= gap_ms(log) < 1600, f"waited {gap_ms(log)}ms instead of about 1000ms"


def test_retry_after_beyond_cap_gives_up_at_once():
    _, log, clock = run([{"status": 503, "retryAfter": "3600"}, "ok"])
    assert len(log) == 1
    assert clock.now < 500, "waited for an unreasonable Retry-After"


def test_failed_url_not_attempted_in_later_rounds():
    _, log, _ = run([503], markup='<img src="x.png"><img src="y.png">')
    attempts = {}
    for entry in log:
        attempts[entry["url"]] = attempts.get(entry["url"], 0) + 1
    assert all(count <= 3 for count in attempts.values()), attempts
