"""Fetch pool bounds (ported from reference test/concurrency.test.js): peak
in-flight equals the cap exactly, no configuration stalls the pool."""

import re
import time

import pytest

from mhtml_to_html_ray.kernel.convert import Config, convert
from tests.helpers import page, tracking_fetch


def images(count):
    return page(body="".join(f'<img src="i{i}.png">' for i in range(count)))


def count_inlined(data):
    return len(re.findall(r"data:image/png;base64,", data))


def fetch_config(fetch, **kwargs):
    return Config(fetch_missing_resources=True, fetch=fetch, sleep_ms=lambda ms: None, **kwargs)


def test_default_cap_saturates_at_16():
    fetch, state = tracking_fetch()
    data = convert(images(200), fetch_config(fetch)).data
    assert state["peak"] == 16, f"peak {state['peak']}"
    assert state["calls"] == 200
    assert count_inlined(data) == 200, "some resources were dropped under the cap"


@pytest.mark.parametrize("cap", [1, 4, 32])
def test_cap_respected_exactly(cap):
    # a hold long enough that every pool thread is in flight at once, so the
    # exact-peak assertion is deterministic despite thread start-up staggering
    fetch, state = tracking_fetch(hold_s=0.05)
    data = convert(images(100), fetch_config(fetch, max_parallel_requests=cap)).data
    assert state["peak"] == cap, f"peak {state['peak']}"
    assert count_inlined(data) == 100


def test_cap_larger_than_workload():
    fetch, state = tracking_fetch()
    data = convert(images(3), fetch_config(fetch, max_parallel_requests=100)).data
    assert state["peak"] == 3
    assert count_inlined(data) == 3


@pytest.mark.parametrize("cap", [0, -5])
def test_nonpositive_cap_falls_back_to_one_worker(cap):
    fetch, state = tracking_fetch()
    result = convert(images(5), fetch_config(fetch, max_parallel_requests=cap))
    assert state["peak"] == 1
    assert count_inlined(result.data) == 5


def test_cap_holds_while_retrying():
    fetch, state = tracking_fetch(fail=True)
    convert(images(50), fetch_config(fetch, max_parallel_requests=4, max_retries=1))
    assert state["peak"] <= 4, f"peak {state['peak']}"
    assert state["calls"] == 100, "50 resources should be attempted twice each"


def test_work_spread_across_pool():
    fetch, _state = tracking_fetch(hold_s=0.02)
    start = time.monotonic()
    convert(images(64), fetch_config(fetch, max_parallel_requests=16))
    elapsed = (time.monotonic() - start) * 1000
    # 64 requests at 16 in flight is four rounds of 20ms; serialized would be
    # 64 rounds (~1280ms). The reference allows 700ms; this VM shows CPU
    # steal, so the window is widened while still ruling out serialization.
    assert 60 <= elapsed < 1100, f"{elapsed}ms for four rounds of 20ms"
