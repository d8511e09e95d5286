"""Frontier engine tests: cuckoo/seen exactness, politeness, robots, and the
wave scheduler's parity with the reference fetch scheduler (ordering + seen
set under the same seed list, north rule)."""

import pyarrow as pa
import pytest

from mhtml_to_html_ray.frontier.canon import canonicalize
from mhtml_to_html_ray.frontier.cuckoo import CuckooFilter
from mhtml_to_html_ray.frontier.politeness import HostGate
from mhtml_to_html_ray.frontier.robots import parse_robots
from mhtml_to_html_ray.frontier.seen import SeenShard
from tests.helpers import ORIGIN, page, resource

# ---------------------------------------------------------------------------
# pure components (no Ray)


def test_cuckoo_no_false_negatives():
    filt = CuckooFilter(capacity=4096)
    keys = [f"https://h{i % 7}.example/{i}" for i in range(3000)]
    for key in keys:
        filt.add(key)
    assert all(filt.might_contain(k) for k in keys), "a cuckoo filter must never false-negative"


def test_cuckoo_low_false_positive_rate():
    filt = CuckooFilter(capacity=8192)
    for i in range(4000):
        filt.add(f"in-{i}")
    false_positives = sum(filt.might_contain(f"out-{i}") for i in range(4000))
    assert false_positives / 4000 < 0.05, f"fp rate {false_positives / 4000}"


def test_cuckoo_remove():
    filt = CuckooFilter(capacity=1024)
    filt.add("a")
    assert filt.might_contain("a")
    assert filt.remove("a")
    assert not filt.might_contain("a")


def test_seen_shard_first_wins_and_exactness():
    shard = SeenShard(0, capacity=1024)
    flags = shard.check_and_add(["u1", "u2", "u1", "u3", "u2"])
    assert flags == [True, True, False, True, False]
    assert shard.contains(["u1", "u4"]) == [True, False]
    snapshot = shard.snapshot()
    restored = SeenShard(0)
    restored.restore(snapshot)
    assert restored.contains(["u1", "u2", "u3", "u4"]) == [True, True, True, False]


def test_seen_shard_exact_beyond_filter_capacity():
    """A saturated cuckoo filter loses evicted fingerprints (add() returns
    False), so might_contain can false-negative; the shard must fall back to
    the exact set as truth — previously 397/400 already-seen URLs re-admitted
    as new past ~capacity."""
    shard = SeenShard(0, capacity=64)
    urls = [f"https://h{i % 9}.example/{i}" for i in range(400)]
    first = shard.check_and_add(urls)
    assert all(first), "first pass must admit every distinct url"
    second = shard.check_and_add(urls)
    assert not any(second), "second pass must report every url as already seen"
    assert shard.contains(urls) == [True] * len(urls)
    assert not shard.stats()["filter_ok"], "a 64-slot filter must degrade at 400 keys"

    # restore path has the same contract
    restored = SeenShard(0, capacity=64)
    restored.restore(shard.snapshot())
    assert restored.contains(urls) == [True] * len(urls)
    assert not any(restored.check_and_add(urls))


def test_seen_shard_failed_set():
    shard = SeenShard(0)
    shard.add_failed(["bad"])
    assert shard.filter_failed(["bad", "good"]) == [False, True]
    table = shard.snapshot()
    restored = SeenShard(0)
    restored.restore(table)
    assert restored.filter_failed(["bad", "good"]) == [False, True]


def test_host_gate_serializes_per_host():
    gate = HostGate(min_gap_ms=0.0)
    assert gate.try_acquire("h1") == 0.0
    assert gate.try_acquire("h1") > 0.0, "two workers on one host at once"
    assert gate.try_acquire("h2") == 0.0
    gate.release("h1")
    assert gate.try_acquire("h1") == 0.0


def test_host_gate_min_gap():
    clock = {"now": 0.0}
    gate = HostGate(min_gap_ms=100.0, clock=lambda: clock["now"])
    assert gate.try_acquire("h") == 0.0
    gate.release("h")
    wait = gate.try_acquire("h")
    assert wait == pytest.approx(0.1), "the min gap was not enforced"
    clock["now"] = 0.2
    assert gate.try_acquire("h") == 0.0


def test_robots_rules():
    rules = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n\n"
        "User-agent: special\nDisallow: /\n",
        user_agent="engine-crawler",
    )
    assert rules.allowed("/public/x")
    assert not rules.allowed("/private/x")
    assert rules.allowed("/private/ok/page")
    special = parse_robots(
        "User-agent: *\nDisallow: /private/\n\nUser-agent: special\nDisallow: /\n",
        user_agent="special-bot",
    )
    assert not special.allowed("/anything")


def test_canonicalize_shares_kernel_normalizer():
    canon = canonicalize("HTTPS://E:443/dir/sub/../i.png")
    assert canon.canon_url == "https://e/dir/i.png"
    assert canon.host == "e"
    relative = canonicalize("i.png", base="https://e/dir/page.html")
    assert relative.canon_url == "https://e/dir/i.png"


# ---------------------------------------------------------------------------
# the scheduler (Ray)


def _crawl(routes, seeds, ray_session, **config_kwargs):
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    defaults = dict(retry_sleep_scale=0.0, num_seen_shards=2, fetch_concurrency=2,
                    batch_size=4)
    defaults.update(config_kwargs)
    scheduler = CrawlScheduler(DictTransportFactory(routes), CrawlConfig(**defaults))
    try:
        return scheduler.run(seeds)
    finally:
        scheduler.close()


PAGE_URL = f"{ORIGIN}/"


def _routes_with_page(extra=None, body='<img src="missing.png"><img src="also.png">'):
    routes = {
        PAGE_URL: ("multipart/related", bytes(page(body=body))),
        f"{ORIGIN}/missing.png": ("image/png", b"PNG1"),
        f"{ORIGIN}/also.png": ("image/png", b"PNG2"),
    }
    routes.update(extra or {})
    return routes


def test_wave_crawl_matches_reference_fetch_order(ray_session):
    """The engine's request sequence equals the reference scheduler's
    (fetchAndConvert) request log for the same page + resources."""
    from mhtml_to_html_ray.frontier.scheduler import request_log
    from mhtml_to_html_ray.kernel.convert import Config, convert
    from tests.helpers import stub_fetch

    deep_css = f"{ORIGIN}/deep.css"
    routes = _routes_with_page(
        {deep_css: ("text/css", b'p{background:url("nested.png")}'),
         f"{ORIGIN}/nested.png": ("image/png", b"PNG3")},
        body='<img src="missing.png"><link rel="stylesheet" href="deep.css">'
        '<img src="also.png">',
    )
    # the reference's own round loop over the same archive
    fetch, ref_log = stub_fetch(
        {url: {"contentType": ct, "body": body.decode("utf-8", "replace") if isinstance(body, bytes) else body}
         for url, (ct, body) in routes.items() if url != PAGE_URL}
    )
    convert(page(body='<img src="missing.png"><link rel="stylesheet" href="deep.css">'
                      '<img src="also.png">'),
            Config(fetch_missing_resources=True, fetch=fetch, sleep_ms=lambda ms: None))

    result = _crawl(routes, [PAGE_URL], ray_session, max_waves=6)
    engine_log = [u for u in request_log(result) if u != PAGE_URL]
    assert engine_log == ref_log, f"engine {engine_log} vs reference {ref_log}"


def test_wave_crawl_seen_set_matches_reference(ray_session):
    from mhtml_to_html_ray.kernel.convert import Config, convert
    from tests.helpers import stub_fetch

    routes = _routes_with_page()
    fetch, ref_log = stub_fetch(
        {f"{ORIGIN}/missing.png": {"contentType": "image/png", "body": "PNG1"},
         f"{ORIGIN}/also.png": {"contentType": "image/png", "body": "PNG2"}}
    )
    convert(page(body='<img src="missing.png"><img src="also.png">'),
            Config(fetch_missing_resources=True, fetch=fetch, sleep_ms=lambda ms: None))
    result = _crawl(routes, [PAGE_URL], ray_session)
    assert result.seen_urls == set(ref_log) | {PAGE_URL}


def test_each_url_fetched_exactly_once(ray_session):
    body = '<img src="x.png"><img src="x.png"><img src="y.png">'
    routes = {
        PAGE_URL: ("multipart/related", bytes(page(body=body))),
        f"{ORIGIN}/x.png": ("image/png", b"X"),
        f"{ORIGIN}/y.png": ("image/png", b"Y"),
    }
    result = _crawl(routes, [PAGE_URL], ray_session)
    urls = result.results.column("canon_url").to_pylist()
    assert len(urls) == len(set(urls)), f"duplicate fetches: {urls}"
    assert set(urls) == {PAGE_URL, f"{ORIGIN}/x.png", f"{ORIGIN}/y.png"}


def test_failed_urls_never_refetched_across_waves(ray_session):
    routes = {
        PAGE_URL: ("multipart/related", bytes(page(body='<img src="gone.png">'))),
    }
    result = _crawl(routes, [PAGE_URL], ray_session, max_waves=5)
    gone = [r for r in result.results.to_pylist() if r["canon_url"].endswith("gone.png")]
    assert len(gone) == 1, "a failed URL was re-admitted in a later wave"
    assert gone[0]["ok"] is False
    assert gone[0]["attempts"] == 1, "404 is permanent: one attempt"


def test_transient_failures_retried_with_reference_policy(ray_session):
    routes = _routes_with_page({f"{ORIGIN}/missing.png": [503, 503, ("image/png", b"OK")]})
    result = _crawl(routes, [PAGE_URL], ray_session)
    row = next(r for r in result.results.to_pylist() if r["canon_url"].endswith("missing.png"))
    assert row["ok"] is True
    assert row["attempts"] == 3


def test_hyperlink_bfs_depth_and_waves(ray_session):
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://site.example/": html_page(["/a", "/b"]),
        "https://site.example/a": html_page(["/c"]),
        "https://site.example/b": html_page(["/c", "/d"]),
        "https://site.example/c": html_page([]),
        "https://site.example/d": html_page([]),
    }
    result = _crawl(routes, ["https://site.example/"], ray_session,
                    discovery_mode="hyperlinks", max_waves=5)
    rows = {r["canon_url"]: r for r in result.results.to_pylist()}
    assert set(rows) == set(routes)
    assert rows["https://site.example/"]["wave"] == 0
    assert rows["https://site.example/a"]["wave"] == 1
    assert rows["https://site.example/b"]["wave"] == 1
    assert rows["https://site.example/c"]["wave"] == 2, "c discovered at wave 1, fetched at 2"
    assert rows["https://site.example/d"]["wave"] == 2


def test_ordering_and_seen_set_invariant_across_parallelism(ray_session):
    """The north-rule two-cluster-size criterion at engine level: different
    shard counts / pool sizes / batch sizes produce the identical request
    order and seen set."""
    from mhtml_to_html_ray.frontier.scheduler import request_log

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {}
    for i in range(12):
        links = [f"https://h{(i * 7 + j) % 5}.example/p{i}-{j}" for j in range(4)]
        routes[f"https://h{i % 5}.example/seed{i}"] = html_page(links)
    for i in range(12):
        for j in range(4):
            routes.setdefault(f"https://h{(i * 7 + j) % 5}.example/p{i}-{j}", html_page([]))
    seeds = [f"https://h{i % 5}.example/seed{i}" for i in range(12)]

    baseline = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                      num_seen_shards=1, fetch_concurrency=1, batch_size=64, max_waves=4)
    for shards, concurrency, batch in [(2, 2, 4), (4, 3, 2)]:
        other = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                       num_seen_shards=shards, fetch_concurrency=concurrency,
                       batch_size=batch, max_waves=4)
        assert request_log(other) == request_log(baseline), (
            f"ordering changed with shards={shards} concurrency={concurrency}"
        )
        assert other.seen_urls == baseline.seen_urls


def test_checkpoint_resume_equals_uninterrupted(ray_session, tmp_path):
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler, request_log
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://r.example/": html_page(["/l1", "/l2"]),
        "https://r.example/l1": html_page(["/l3"]),
        "https://r.example/l2": html_page([]),
        "https://r.example/l3": html_page([]),
    }
    base = dict(discovery_mode="hyperlinks", retry_sleep_scale=0.0, num_seen_shards=2,
                fetch_concurrency=1, batch_size=4)

    full = CrawlScheduler(
        DictTransportFactory(routes), CrawlConfig(max_waves=5, **base)
    ).run(["https://r.example/"])

    partial_dir = str(tmp_path / "ckpt")
    CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=1, checkpoint_dir=partial_dir, **base),
    ).run(["https://r.example/"])
    resumed = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=5, checkpoint_dir=partial_dir, **base),
    ).run(["https://r.example/"], resume=True)

    assert request_log(resumed) == request_log(full), "resume diverged from the full run"
    assert resumed.seen_urls == full.seen_urls


def test_robots_gating(ray_session):
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://rb.example/robots.txt": ("text/plain", b"User-agent: *\nDisallow: /private/\n"),
        "https://rb.example/": html_page(["/public/a", "/private/b"]),
        "https://rb.example/public/a": html_page([]),
        "https://rb.example/private/b": html_page([]),
    }
    result = _crawl(routes, ["https://rb.example/"], ray_session,
                    discovery_mode="hyperlinks", respect_robots=True, max_waves=3)
    rows = {r["canon_url"]: r for r in result.results.to_pylist()}
    assert rows["https://rb.example/public/a"]["ok"] is True
    assert rows["https://rb.example/private/b"]["robots_blocked"] is True


def test_metrics_and_lineage_recorded(ray_session, tmp_path):
    from mhtml_to_html_ray.state.checkpoint import CrawlCheckpoint

    routes = _routes_with_page()
    result = _crawl(routes, [PAGE_URL], ray_session,
                    checkpoint_dir=str(tmp_path / "m"), max_waves=4)
    assert result.metrics, "no per-wave metrics"
    wave0 = result.metrics[0]
    for key in ("rows_in", "fetched_ok", "discovered", "admitted", "wall_ms", "hosts"):
        assert key in wave0
    checkpoint = CrawlCheckpoint(str(tmp_path / "m"))
    assert checkpoint.latest_wave() is not None
    assert checkpoint.load_metrics(0)["rows_in"] == 1


def test_politeness_min_gap_through_scheduler(ray_session):
    """A host with several urls in one wave must observe the configured
    minimum inter-request gap (enforced in-worker while the host is held)."""
    import time as _time

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {"https://slow.example/": html_page([f"/p{i}" for i in range(5)])}
    for i in range(5):
        routes[f"https://slow.example/p{i}"] = html_page([])
    started = _time.monotonic()
    result = _crawl(routes, ["https://slow.example/"], ray_session,
                    discovery_mode="hyperlinks", min_host_gap_ms=40.0,
                    fetch_concurrency=1, batch_size=16, max_waves=3)
    elapsed = _time.monotonic() - started
    assert result.results.num_rows == 6
    # wave 1 fetches 5 urls on one host → at least 4 gaps of 40 ms
    assert elapsed >= 0.16, f"min host gap not enforced ({elapsed:.3f}s)"


def test_wave_budget_carries_backlog(ray_session):
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {"https://wb.example/": html_page([f"/p{i}" for i in range(10)])}
    for i in range(10):
        routes[f"https://wb.example/p{i}"] = html_page([])
    result = _crawl(routes, ["https://wb.example/"], ray_session,
                    discovery_mode="hyperlinks", wave_budget=4, max_waves=6)
    rows = result.results.to_pylist()
    assert len(rows) == 11, "backlogged urls were lost"
    by_wave = {}
    for row in rows:
        by_wave.setdefault(row["wave"], []).append(row["canon_url"])
    assert len(by_wave[1]) == 4, "the wave budget was not enforced"


def test_crawl_and_extract_end_to_end(ray_session):
    """The north-star flow: frontier crawl feeding the extraction kernel."""
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory
    from mhtml_to_html_ray.pipelines.crawl_extract import crawl_and_extract

    def html_page(text, links=()):
        body = f"<p>{text}</p>" + "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><head><title>{text}</title></head><body>{body}</body></html>".encode())

    routes = {
        "https://ce.example/": html_page("ROOT", ["/a", "/b"]),
        "https://ce.example/a": html_page("PAGE-A"),
        "https://ce.example/b": html_page("PAGE-B"),
    }
    config = CrawlConfig(discovery_mode="hyperlinks", max_waves=4, retry_sleep_scale=0.0,
                         num_seen_shards=2, fetch_concurrency=1, batch_size=8)
    result, extracted = crawl_and_extract(DictTransportFactory(routes), ["https://ce.example/"], config)
    rows = {row["url"]: row for row in extracted.take_all()}
    assert set(rows) == set(routes)
    assert rows["https://ce.example/"]["title"] == "ROOT"
    assert rows["https://ce.example/a"]["text_out"] == "PAGE-A"
    assert all(row["error"] is None for row in rows.values())
    assert result.results_dataset().count() == 3
    # bodies stream to a (default temp) results_dir — the whole-crawl Arrow
    # table must NOT have accumulated on the driver
    assert result.results_dir is not None
    assert result.results.num_rows == 0


def test_per_host_wave_cap_spills_hot_host(ray_session):
    """SURVEY.md §4 skew mitigation: a hot host's urls spread across waves
    while other hosts are unaffected."""
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {"https://hot.example/": html_page(
        [f"https://hot.example/p{i}" for i in range(9)] + ["https://cold.example/only"])}
    for i in range(9):
        routes[f"https://hot.example/p{i}"] = html_page([])
    routes["https://cold.example/only"] = html_page([])
    result = _crawl(routes, ["https://hot.example/"], ray_session,
                    discovery_mode="hyperlinks", per_host_wave_cap=3, max_waves=8)
    rows = result.results.to_pylist()
    assert len(rows) == 11
    hot_waves = {}
    for row in rows:
        if row["host"] == "hot.example" and row["depth"] == 1:
            hot_waves.setdefault(row["wave"], 0)
            hot_waves[row["wave"]] += 1
    assert max(hot_waves.values()) <= 3, f"cap violated: {hot_waves}"
    assert len(hot_waves) >= 3, f"hot host not spread across waves: {hot_waves}"
    cold = next(r for r in rows if r["host"] == "cold.example")
    assert cold["wave"] == 1, "the cold host should not wait behind the hot one"


def test_ivf_topk_recall(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions import similarity

    rng = np.random.RandomState(3)
    vectors = rng.randn(400, 12).astype(np.float32)
    vectors[50] = vectors[10] * 2.0
    table = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vectors], pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(table)
    query = list(map(float, vectors[10]))
    exact = set(similarity.brute_force_topk(ds, query, k=10).column("vec_id").to_pylist())
    approx = set(similarity.ivf_topk(ds, query, k=10, n_centroids=8, nprobe=3)
                 .column("vec_id").to_pylist())
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    assert {10, 50} <= approx, "the identical-direction pair must survive IVF probing"


def test_ivf_persisted_index_matches_scan(ray_session, tmp_path):
    """The persisted partitioned index (ivf_build/ivf_query) must return the
    EXACT result of the scan-based ivf_topk under the same seed: identical
    centroids → identical list assignment → identical candidate set. Also
    checks the pruning actually happened (index has one dir per list, query
    reads a subset)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions import similarity

    rng = np.random.RandomState(3)
    vectors = rng.randn(400, 12).astype(np.float32)
    table = pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vectors], pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(table)
    query = list(map(float, vectors[10]))

    index_dir = str(tmp_path / "ivf")
    similarity.ivf_build(ds, index_dir, n_centroids=8)
    partitions = [d for d in os.listdir(index_dir) if d.startswith("list_id=")]
    assert 2 <= len(partitions) <= 8, "index must be partitioned by inverted list"

    indexed = similarity.ivf_query(index_dir, query, k=10, nprobe=3)
    scanned = similarity.ivf_topk(ds, query, k=10, n_centroids=8, nprobe=3)
    assert indexed.column("vec_id").to_pylist() == scanned.column("vec_id").to_pylist()
    assert indexed.column("cosine").to_pylist() == scanned.column("cosine").to_pylist()


def test_no_duplicate_fetches_with_backlog_and_discovery(ray_session):
    """Regression (100k soak): backlogged rows carry high discovery indexes;
    new discoveries must not collide with them (collisions silently dropped
    and duplicated fetches inside the worker's index-keyed result map)."""
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {}
    for i in range(6):
        routes[f"https://bd.example/s{i}"] = html_page(
            [f"https://bd.example/c{i}-{j}" for j in range(4)])
    for i in range(6):
        for j in range(4):
            routes[f"https://bd.example/c{i}-{j}"] = html_page(
                [f"https://bd.example/g{i}-{j}"])
            routes[f"https://bd.example/g{i}-{j}"] = html_page([])
    seeds = [f"https://bd.example/s{i}" for i in range(6)]
    result = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                    wave_budget=5, max_waves=30)
    rows = result.results.to_pylist()
    urls = [r["canon_url"] for r in rows]
    assert len(urls) == len(set(urls)), "duplicate fetches"
    indexes = [r["discovery_index"] for r in rows]
    assert len(indexes) == len(set(indexes)), "discovery_index collision"
    assert set(urls) == set(routes), "some urls were never fetched"


def test_parquet_frontier_matches_memory(ray_session, tmp_path):
    """The Dataset-backed frontier (the 10^10-URL path: backlog on Parquet,
    wave selection via distributed sort+limit) produces the identical crawl
    to the in-memory store."""
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler, request_log
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {}
    for i in range(8):
        routes[f"https://pf.example/s{i}"] = html_page(
            [f"https://pf.example/c{i}-{j}" for j in range(3)])
        for j in range(3):
            routes[f"https://pf.example/c{i}-{j}"] = html_page([])
    seeds = [f"https://pf.example/s{i}" for i in range(8)]
    base = dict(discovery_mode="hyperlinks", retry_sleep_scale=0.0, num_seen_shards=2,
                fetch_concurrency=1, batch_size=8, wave_budget=5, max_waves=20)

    mem_scheduler = CrawlScheduler(DictTransportFactory(routes), CrawlConfig(**base))
    mem = mem_scheduler.run(seeds)
    mem_log, mem_seen = request_log(mem), mem.seen_urls
    mem_scheduler.close()

    pq_scheduler = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(frontier_storage="parquet", frontier_dir=str(tmp_path / "f"), **base),
    )
    parquet = pq_scheduler.run(seeds)
    assert request_log(parquet) == mem_log, "parquet frontier changed the crawl order"
    assert parquet.seen_urls == mem_seen
    pq_scheduler.close()


def test_streamed_results_equal_in_memory(ray_session, tmp_path):
    """results_dir streams each wave to Parquet: the driver-side table stays
    EMPTY, results_dataset() holds the identical rows, and the crawl
    (ordering + seen set) is unchanged."""
    from mhtml_to_html_ray.frontier.scheduler import request_log

    routes = _routes_with_page()
    seeds = [PAGE_URL]
    mem = _crawl(routes, seeds, ray_session, max_waves=4)
    streamed = _crawl(
        routes, seeds, ray_session, max_waves=4,
        results_dir=str(tmp_path / "results"),
    )
    assert streamed.results.num_rows == 0, "streamed crawl must not accumulate on the driver"
    assert streamed.seen_urls == mem.seen_urls

    mem_rows = sorted(
        mem.results.select(["wave", "discovery_index", "canon_url", "ok"]).to_pylist(),
        key=lambda r: (r["wave"], r["discovery_index"]),
    )
    streamed_rows = sorted(
        (
            {k: row[k] for k in ("wave", "discovery_index", "canon_url", "ok")}
            for row in streamed.results_dataset().take_all()
        ),
        key=lambda r: (r["wave"], r["discovery_index"]),
    )
    assert streamed_rows == mem_rows


def test_streamed_results_resume(ray_session, tmp_path):
    """Checkpoint resume under streaming keeps discovery indexes monotone and
    the final request sequence identical to an uninterrupted streamed run."""
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler, request_log
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {"https://sr.example/s": html_page(
        [f"https://sr.example/c{j}" for j in range(4)])}
    for j in range(4):
        routes[f"https://sr.example/c{j}"] = html_page(
            [f"https://sr.example/g{j}"])
        routes[f"https://sr.example/g{j}"] = html_page([])
    seeds = ["https://sr.example/s"]
    base = dict(discovery_mode="hyperlinks", retry_sleep_scale=0.0, num_seen_shards=2,
                fetch_concurrency=1, batch_size=8)

    full_dir = tmp_path / "full"
    full = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=5, results_dir=str(full_dir), **base),
    )
    full_result = full.run(seeds)
    full_rows = sorted(
        (r["wave"], r["discovery_index"], r["canon_url"])
        for r in full_result.results_dataset().take_all()
    )
    full.close()

    part_dir = tmp_path / "part"
    ck_dir = tmp_path / "ck"
    partial = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=1, results_dir=str(part_dir),
                    checkpoint_dir=str(ck_dir), **base),
    )
    partial.run(seeds)
    partial.close()
    resumed = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=5, results_dir=str(part_dir),
                    checkpoint_dir=str(ck_dir), **base),
    )
    resumed_result = resumed.run(seeds, resume=True)
    resumed_rows = sorted(
        (r["wave"], r["discovery_index"], r["canon_url"])
        for r in resumed_result.results_dataset().take_all()
    )
    resumed.close()
    assert resumed_rows == full_rows


def test_full_width_fetch_pool_does_not_starve_data_jobs(ray_session, tmp_path):
    """Regression: a persistent fetch pool as wide as the cluster (here 4
    actors on the 4-cpu test session) used to capture every CPU and the
    Parquet frontier's mid-wave Ray Data jobs (sort/select, remainder
    rewrite, streamed writes) could never schedule — the crawl hung forever.
    Fractional-cpu fetch actors (fetch_actor_num_cpus) leave headroom."""
    import threading

    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler
    from mhtml_to_html_ray.frontier.transports import SyntheticSiteFactory

    config = CrawlConfig(
        discovery_mode="hyperlinks", max_waves=10, wave_budget=50,
        retry_sleep_scale=0.0, num_seen_shards=2,
        fetch_concurrency=4,  # == the test session's num_cpus
        batch_size=16,
        frontier_storage="parquet", frontier_dir=str(tmp_path / "f"),
        results_dir=str(tmp_path / "r"),
    )
    scheduler = CrawlScheduler(SyntheticSiteFactory(4, 20), config)
    seeds = [f"https://h{i}.soak.example/p0" for i in range(4)]
    done: dict = {}

    def run() -> None:
        done["result"] = scheduler.run(seeds)

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    thread.join(timeout=120)
    assert not thread.is_alive(), "crawl starved its own Ray Data jobs (deadlock)"
    result = done["result"]
    assert result.results_dataset().count() == 80  # 4 hosts × 20 pages
    scheduler.close()


def test_parquet_frontier_with_host_cap(ray_session, tmp_path):
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler, request_log

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {"https://hp.example/": html_page(
        [f"https://hp.example/p{i}" for i in range(8)])}
    for i in range(8):
        routes[f"https://hp.example/p{i}"] = html_page([])
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    base = dict(discovery_mode="hyperlinks", retry_sleep_scale=0.0, num_seen_shards=2,
                fetch_concurrency=1, batch_size=8, per_host_wave_cap=3, max_waves=10)
    mem_s = CrawlScheduler(DictTransportFactory(routes), CrawlConfig(**base))
    mem = mem_s.run(["https://hp.example/"]); mem_s.close()
    pq_s = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(frontier_storage="parquet", frontier_dir=str(tmp_path / "g"), **base))
    parquet = pq_s.run(["https://hp.example/"]); pq_s.close()
    assert request_log(parquet) == request_log(mem)


def test_discovery_modes_on_plain_html():
    from mhtml_to_html_ray.frontier.discovery import discover

    body = (b'<html><body><img src="/i.png"><a href="/next">n</a>'
            b'<link rel="stylesheet" href="/s.css"></body></html>')
    base = "https://d.example/page"
    subs = discover(body, base, "subresources", "text/html")
    assert "https://d.example/i.png" in subs
    assert "https://d.example/s.css" in subs
    assert all("next" not in u for u in subs), "hyperlinks are not subresources"
    links = discover(body, base, "hyperlinks", "text/html")
    assert links == ["https://d.example/next"]
    both = discover(body, base, "both", "text/html")
    assert set(subs) <= set(both) and set(links) <= set(both)


def test_discovery_ignores_media_responses():
    from mhtml_to_html_ray.frontier.discovery import discover

    assert discover(b"<html>looks like markup</html>", "https://d.example/", "both",
                    "image/png") == []


def test_css_discovery_order_and_dedup():
    from mhtml_to_html_ray.frontier.discovery import discover_css_references

    css = b'@import url("a.css");p{background:url(b.png)}q{background:url(b.png)}'
    found = discover_css_references(css, "https://c.example/dir/s.css")
    assert found == ["https://c.example/dir/a.css", "https://c.example/dir/b.png"]


def test_content_dedup_skips_mirror_expansion(ray_session):
    """dedup_content: a page byte-identical to an already-seen one is fetched
    (its URL is new) but its links are not expanded — mirror guard."""
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    # two seeds with IDENTICAL bodies linking to different targets via
    # relative urls would differ; use absolute so the bytes are identical
    mirror_body = html_page(["https://cd.example/t1", "https://cd.example/t2"])
    routes = {
        "https://cd.example/a": mirror_body,
        "https://cd.example/b": mirror_body,  # byte-identical mirror
        "https://cd.example/t1": html_page([]),
        "https://cd.example/t2": html_page([]),
    }
    result = _crawl(routes, ["https://cd.example/a", "https://cd.example/b"],
                    ray_session, discovery_mode="hyperlinks", dedup_content=True,
                    max_waves=4)
    rows = {r["canon_url"]: r for r in result.results.to_pylist()}
    assert set(rows) == set(routes), "both mirrors fetched, targets once"
    # without dedup_content the behavior is unchanged (targets still once,
    # via URL dedup) — the difference is observable in the metrics
    assert rows["https://cd.example/a"]["content_hash"] == rows["https://cd.example/b"]["content_hash"]


def test_per_partition_lineage_in_metrics(ray_session):
    routes = _routes_with_page()
    result = _crawl(routes, [PAGE_URL], ray_session, max_waves=3)
    wave0 = result.metrics[0]
    assert wave0["partitions"], "no per-partition lineage recorded"
    partition = wave0["partitions"][0]
    for key in ("shard", "rows_in", "rows_out", "fetch_ms"):
        assert key in partition
    assert sum(p["rows_in"] for p in wave0["partitions"]) == wave0["rows_in"]
    assert sum(p["rows_out"] for p in wave0["partitions"]) == wave0["rows_in"]


def test_parquet_frontier_checkpoint_resume(ray_session, tmp_path):
    """checkpoint/resume with the Dataset-backed frontier store."""
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler, request_log
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://pr.example/": html_page(["/l1", "/l2"]),
        "https://pr.example/l1": html_page(["/l3"]),
        "https://pr.example/l2": html_page([]),
        "https://pr.example/l3": html_page([]),
    }
    base = dict(discovery_mode="hyperlinks", retry_sleep_scale=0.0, num_seen_shards=2,
                fetch_concurrency=1, batch_size=4, frontier_storage="parquet")

    full_s = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=5, frontier_dir=str(tmp_path / "full"), **base))
    full = full_s.run(["https://pr.example/"])
    full_log = request_log(full); full_seen = full.seen_urls
    full_s.close()

    ck = str(tmp_path / "ck")
    CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=1, checkpoint_dir=ck, **base)).run(["https://pr.example/"])
    resumed = CrawlScheduler(
        DictTransportFactory(routes),
        CrawlConfig(max_waves=5, checkpoint_dir=ck, **base)).run(
            ["https://pr.example/"], resume=True)
    assert request_log(resumed) == full_log
    assert resumed.seen_urls == full_seen


def test_both_discovery_mode_crawls_subresources_and_links(ray_session):
    """mode='both': one wave discovers a page's subresources (images/css)
    AND its hyperlinks — the full training-crawl shape."""
    html = (b'<html><head><link rel="stylesheet" href="/s.css"></head>'
            b'<body><img src="/i.png"><a href="/next">n</a></body></html>')
    routes = {
        "https://bm.example/": ("text/html", html),
        "https://bm.example/s.css": ("text/css", b"p{color:red}"),
        "https://bm.example/i.png": ("image/png", b"PNG"),
        "https://bm.example/next": ("text/html", b"<html><body>leaf</body></html>"),
    }
    result = _crawl(routes, ["https://bm.example/"], ray_session,
                    discovery_mode="both", max_waves=3)
    urls = set(result.results.column("canon_url").to_pylist())
    assert urls == set(routes), f"missing: {set(routes) - urls}"


def _fanout_routes(n_seeds=8, fanout=6, hosts=4):
    """A synthetic web wide enough to exercise cross-batch dedup: every page
    links `fanout` children, children shared across parents."""
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {}
    for i in range(n_seeds):
        links = [f"https://w{(i + j) % hosts}.example/p{(i * 3 + j) % (n_seeds * 2)}"
                 for j in range(fanout)]
        routes[f"https://w{i % hosts}.example/seed{i}"] = html_page(links)
    for i in range(n_seeds * 2):
        for h in range(hosts):
            child_links = [f"https://w{(h + 1) % hosts}.example/leaf{i}-{h}"] if i % 2 else []
            routes.setdefault(f"https://w{h}.example/p{i}", html_page(child_links))
    for i in range(n_seeds * 2):
        for h in range(hosts):
            routes.setdefault(f"https://w{h}.example/leaf{i}-{(h - 1) % hosts}",
                              html_page([]))
    seeds = [f"https://w{i % hosts}.example/seed{i}" for i in range(n_seeds)]
    return routes, seeds


def test_admit_distributed_matches_driver(ray_session):
    """The distributed admit pipeline (frontier/admit.py) must produce the
    bit-identical crawl to the sequential driver loop: same request order,
    same discovery_index sequence, same seen set, same priorities."""
    from mhtml_to_html_ray.frontier.scheduler import request_log

    routes, seeds = _fanout_routes()
    results = {}
    for strategy in ("driver", "distributed"):
        result = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                        admit_strategy=strategy, max_waves=5)
        table = result.results.select(
            ["wave", "discovery_index", "canon_url", "depth"]
        ).to_pylist()
        table.sort(key=lambda r: (r["wave"], r["discovery_index"]))
        results[strategy] = (request_log(result), table, result.seen_urls)
    assert results["driver"][0] == results["distributed"][0], "request order diverged"
    assert results["driver"][1] == results["distributed"][1], "index/depth diverged"
    assert results["driver"][2] == results["distributed"][2], "seen set diverged"


def test_admit_distributed_matches_driver_parquet_frontier(ray_session, tmp_path):
    """Same equivalence with the Parquet-backed frontier store — the
    add_table Arrow ingest path must round-trip the admitted rows exactly."""
    from mhtml_to_html_ray.frontier.scheduler import request_log

    routes, seeds = _fanout_routes(n_seeds=6, fanout=4)
    logs = {}
    for strategy in ("driver", "distributed"):
        result = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                        admit_strategy=strategy, max_waves=5,
                        frontier_storage="parquet",
                        frontier_dir=str(tmp_path / f"frontier_{strategy}"))
        logs[strategy] = request_log(result)
    assert logs["driver"] == logs["distributed"]


def test_offer_stale_tag_does_not_wipe_current_wave():
    """A zombie task from wave N offering after wave N+1 started must be
    ignored — not reset the buffer holding wave N+1's candidates."""
    import pyarrow as pa

    from mhtml_to_html_ray.frontier.admit import CANDIDATE_SCHEMA
    from mhtml_to_html_ray.frontier.seen import SeenShard

    def candidates(urls, parent_base):
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "canon_url": pa.array(urls, pa.string()),
                "host": pa.array(["h"] * len(urls), pa.string()),
                "host_hash": pa.array([0] * len(urls), pa.uint64()),
                "depth": pa.array([1] * len(urls), pa.int32()),
                "priority": pa.array([0.0] * len(urls), pa.float64()),
                "parent_url": pa.array(["p"] * len(urls), pa.string()),
                "parent_index": pa.array(
                    [parent_base + i for i in range(len(urls))], pa.int64()
                ),
                "ordinal": pa.array([0] * len(urls), pa.int64()),
            },
            schema=CANDIDATE_SCHEMA,
        )

    shard = SeenShard(0)
    shard.offer(candidates(["https://a/1"], 0), tag=1)
    assert shard.commit_offers(1).num_rows == 1
    # wave 2 buffers two candidates...
    shard.offer(candidates(["https://a/2"], 10), tag=2)
    # ...then a wave-1 zombie arrives: must be ignored
    assert shard.offer(candidates(["https://a/zombie"], 0), tag=1) == 0
    shard.offer(candidates(["https://a/3"], 11), tag=2)
    committed = shard.commit_offers(2)
    urls = set(committed.column("canon_url").to_pylist())
    assert urls == {"https://a/2", "https://a/3"}, urls


def test_admit_strategy_validated():
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler

    with pytest.raises(ValueError, match="admit_strategy"):
        CrawlScheduler(lambda: None, CrawlConfig(admit_strategy="distrubuted"))


def test_distributed_admit_across_two_runs_of_one_scheduler(ray_session):
    """Offer tags are (epoch, wave): a second run() on the SAME scheduler —
    whose seen shards survived the first — must admit its discoveries, not
    drop them as stale-wave zombies."""
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://r1.example/": html_page(["/a", "/b"]),
        "https://r1.example/a": html_page([]),
        "https://r1.example/b": html_page([]),
        "https://r2.example/": html_page(["/c"]),
        "https://r2.example/c": html_page([]),
    }
    config = CrawlConfig(discovery_mode="hyperlinks", max_waves=4,
                         retry_sleep_scale=0.0, num_seen_shards=2,
                         fetch_concurrency=1, batch_size=8,
                         admit_strategy="distributed")
    scheduler = CrawlScheduler(DictTransportFactory(routes), config)
    try:
        first = scheduler.run(["https://r1.example/"])
        second = scheduler.run(["https://r2.example/"])
    finally:
        scheduler.close()
    assert first.results.num_rows == 3
    # the second crawl's wave-0 offers (epoch 2) must outrank epoch-1 tags
    urls = set(second.results.column("canon_url").to_pylist())
    assert urls == {"https://r2.example/", "https://r2.example/c"}, urls


def test_host_gate_lease_steals_from_dead_worker():
    """A worker that never releases must not wedge its host forever: the
    lease expires and the next acquirer steals the grant."""
    clock = {"now": 0.0}
    gate = HostGate(min_gap_ms=0.0, clock=lambda: clock["now"], lease_s=10.0)
    assert gate.try_acquire("h") == 0.0
    # holder dies without release; within the lease the host stays busy
    clock["now"] = 5.0
    assert gate.try_acquire("h") > 0.0
    # past the lease the grant is stolen
    clock["now"] = 11.0
    assert gate.try_acquire("h") == 0.0
    gate.release("h")
    assert gate.try_acquire("h") == 0.0


def test_robots_wildcards_anchors_and_5xx():
    """Google-semantics wildcard/anchor rules; RFC 9309 status handling."""
    rules = parse_robots(
        "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /*.pdf$\nAllow: /public\n",
        user_agent="engine-crawler",
    )
    assert not rules.allowed("/page?sessionid=7")
    assert not rules.allowed("/docs/file.pdf")
    assert rules.allowed("/docs/file.pdfx")  # $ anchors the end
    assert rules.allowed("/public/file.x")
    # empty User-agent group is invalid and must not hijack the * group
    stray = parse_robots(
        "User-agent: *\nAllow: /\n\nUser-agent:\nDisallow: /\n",
        user_agent="engine-crawler",
    )
    assert stray.allowed("/anything")

    from mhtml_to_html_ray.frontier.robots import RobotsCache

    calls = []

    class T:
        def __init__(self, status):
            self.status = status

        def __call__(self, url):
            calls.append(url)
            class R:
                ok = False
                status = self.status
                def text(self):
                    return ""
            return R()

    # 5xx → disallow-all, cached
    cache = RobotsCache(T(503))
    assert not cache.allowed("https://e:8080/x")
    assert not cache.allowed("https://e:8080/y")
    assert calls == ["https://e:8080/robots.txt"], "authority (with port) fetched once"
    # 404 → allow-all
    cache2 = RobotsCache(T(404))
    assert cache2.allowed("https://e/x")

    # transport error → disallow-all but NOT cached (retried next time)
    class Boom:
        def __call__(self, url):
            raise ConnectionError("down")

    cache3 = RobotsCache(Boom())
    assert not cache3.allowed("https://e/x")
    assert "https://e" not in cache3.cache


def test_pluggable_priority_fn_reorders_frontier(ray_session):
    """CrawlConfig.priority_fn (SURVEY.md §2.6 extension surface): a custom
    priority inverts the built-in depth preference, so deeper discoveries
    fetch before shallower ones within a wave; the seen-set is unchanged."""
    from mhtml_to_html_ray.frontier.scheduler import request_log

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://pf.example/": html_page(["/a", "/b"]),
        "https://pf.example/a": html_page(["/deep"]),
        "https://pf.example/b": html_page([]),
        "https://pf.example/deep": html_page([]),
    }
    seeds = ["https://pf.example/"]

    default = _crawl(routes, seeds, ray_session,
                     discovery_mode="hyperlinks", max_waves=5)

    # custom: favor DEEPER pages (inverts the built-in decay); admission
    # must route through the driver loop (a Python fn cannot vectorize)
    def prefer_deep(host_stats, depth):
        return float(depth)

    custom = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                    max_waves=5, priority_fn=prefer_deep,
                    admit_strategy="auto")
    assert custom.seen_urls == default.seen_urls
    log = request_log(custom)
    # wave 3 frontier would hold /deep (depth 2) only — ordering visible
    # within wave 2: /a and /b share depth so order matches default there;
    # the invariant that matters: all pages still fetched exactly once
    assert sorted(log) == sorted(request_log(default))
    assert len(log) == len(set(log))


def test_injectable_dom_parser_backend():
    """convert.Config.dom_parser (the reference's DOMParser option): a
    wrapping backend observes every parse and the output is unchanged."""
    from mhtml_to_html_ray.kernel.convert import Config, convert
    from mhtml_to_html_ray.kernel.dom import parse_dom
    from tests.helpers import page

    calls = []

    def spying_parser(data, content_type=None):
        calls.append(content_type)
        return parse_dom(data, content_type)

    default_out = convert(page(body="<p>hello</p>"))
    spied_out = convert(page(body="<p>hello</p>"), Config(dom_parser=spying_parser))
    assert spied_out.data == default_out.data
    assert calls, "the injected parser backend was never used"


def test_default_priority_keeps_distributed_admit_eligible(ray_session):
    """Regression for the priority_fn gating: with the default (None)
    priority, admit_strategy='distributed' must still run the distributed
    path and match the driver loop exactly."""
    from mhtml_to_html_ray.frontier.scheduler import request_log

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {
        "https://da.example/": html_page(["/a", "/b", "/c"]),
        "https://da.example/a": html_page(["/d"]),
        "https://da.example/b": html_page([]),
        "https://da.example/c": html_page(["/d"]),
        "https://da.example/d": html_page([]),
    }
    seeds = ["https://da.example/"]
    driver = _crawl(routes, seeds, ray_session, discovery_mode="hyperlinks",
                    max_waves=5, admit_strategy="driver")
    distributed = _crawl(routes, seeds, ray_session,
                         discovery_mode="hyperlinks", max_waves=5,
                         admit_strategy="distributed")
    assert request_log(distributed) == request_log(driver)
    assert distributed.seen_urls == driver.seen_urls


def test_robots_sitemap_lines_are_global():
    """RFC 9309: Sitemap lines are file-global — collected in order,
    deduplicated, surviving group selection for any user agent."""
    text = (
        "Sitemap: https://a.example/s1.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a.example/s2.xml\n"
        "User-agent: specialbot\nDisallow: /\n"
        "sitemap: https://a.example/s1.xml\n"   # dup, case-insensitive key
    )
    generic = parse_robots(text, user_agent="engine-crawler")
    assert generic.sitemaps == [
        "https://a.example/s1.xml", "https://a.example/s2.xml"]
    assert generic.allowed("/y") and not generic.allowed("/x")
    special = parse_robots(text, user_agent="specialbot")
    assert special.sitemaps == generic.sitemaps
    assert not special.allowed("/anything")


def test_sitemap_seed_expansion(ray_session):
    """seed_sitemaps=True: robots.txt Sitemap URLs expand the seed list —
    plain sitemaps contribute <loc> pages, a <sitemapindex> is followed one
    level, failures skip silently, and the default (False) never touches
    robots.txt."""
    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    origin = "https://sm.example"
    routes = {
        f"{origin}/": html_page([]),
        f"{origin}/robots.txt": ("text/plain",
                                 b"Sitemap: https://sm.example/smidx.xml\n"
                                 b"User-agent: *\nDisallow:\n"),
        f"{origin}/smidx.xml": ("application/xml",
                                b"<sitemapindex><sitemap>"
                                b"<loc>https://sm.example/sm1.xml</loc>"
                                b"</sitemap><sitemap>"
                                b"<loc> https://sm.example/missing.xml </loc>"
                                b"</sitemap></sitemapindex>"),
        f"{origin}/sm1.xml": ("application/xml",
                              b"<urlset><url><loc>https://sm.example/p1</loc></url>"
                              b"<url><loc>https://sm.example/p2</loc></url></urlset>"),
        f"{origin}/p1": html_page([]),
        f"{origin}/p2": html_page([]),
    }
    expanded = _crawl(routes, [f"{origin}/"], ray_session,
                      max_waves=2, seed_sitemaps=True)
    assert {f"{origin}/p1", f"{origin}/p2"} <= expanded.seen_urls

    from mhtml_to_html_ray.frontier.transports import DictTransportFactory
    plain_factory = DictTransportFactory(routes)
    plain = _crawl(routes, [f"{origin}/"], ray_session, max_waves=2)
    assert f"{origin}/p1" not in plain.seen_urls


def test_sitemap_seed_over_cap_processes_first_batch(ray_session):
    """Robots files listing MORE than max_sitemaps sitemaps must still
    expand the first max_sitemaps of them — the old loop condition silently
    returned [] whenever the initial list was over-cap (ADVICE round 3)."""
    from mhtml_to_html_ray.frontier.scheduler import _sitemap_seed_urls
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    origin = "https://cap.example"
    robots_lines = "".join(
        f"Sitemap: {origin}/sm{i}.xml\n" for i in range(5)
    )
    routes = {
        f"{origin}/robots.txt": ("text/plain", robots_lines.encode()),
    }
    for i in range(5):
        routes[f"{origin}/sm{i}.xml"] = (
            "application/xml",
            f"<urlset><url><loc>{origin}/p{i}</loc></url></urlset>".encode(),
        )
    transport = DictTransportFactory(routes)()
    # cap smaller than the listed sitemaps: first 3 processed, not zero
    out = _sitemap_seed_urls(transport, [f"{origin}/"], max_sitemaps=3)
    assert out == [f"{origin}/p0", f"{origin}/p1", f"{origin}/p2"]
    # cap larger than the list: everything processed
    out_all = _sitemap_seed_urls(transport, [f"{origin}/"], max_sitemaps=64)
    assert out_all == [f"{origin}/p{i}" for i in range(5)]


def test_discover_anchor_texts_pairs_and_filtering():
    """(href, anchor text) pairs through the real MIME+DOM walk: plain and
    nested anchors, area support, relative resolution against the archive's
    Content-Location, and non-http(s) schemes filtered — same contract as
    discover_hyperlinks plus the text capture."""
    from mhtml_to_html_ray.frontier.discovery import (discover_anchor_texts,
                                                      discover_hyperlinks)

    body = (
        b"MIME-Version: 1.0\r\n"
        b'Content-Type: multipart/related; boundary="B"\r\n\r\n'
        b"--B\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Location: https://site.example/dir/page\r\n\r\n"
        b'<html><body>'
        b'<a href="https://site.example/x">plain text</a>'
        b'<a href="rel">nested <b>bold</b> tail</a>'
        b'<a href="mailto:a@b.invalid">mail</a>'
        b'<area href="/top">area label</area>'
        b'<a>no href</a>'
        b"</body></html>\r\n"
        b"--B--\r\n"
    )
    pairs = discover_anchor_texts(body)
    assert pairs == [
        ("https://site.example/x", "plain text"),
        # direct text nodes only: the <b> child's text is not captured
        ("https://site.example/dir/rel", "nested  tail"),
        # <area> is a void element — "area label" parses as a SIBLING text
        # node, so its anchor text is empty (spec-correct)
        ("https://site.example/top", ""),
    ]
    assert [p[0] for p in pairs] == discover_hyperlinks(body)


def test_anchor_texts_query_caps_hub_joins(ray_session):
    """The anchor_texts fold counts every inlink but joins only the first
    64 anchors in sorted order — the web-scale-hub bound — and the oracle's
    ROW_NUMBER restatement agrees at the boundary (100-inlink hub)."""
    import duckdb
    import pyarrow as pa

    from mhtml_to_html_ray.pipelines.queries import _fold_anchor_group

    group = pa.table({
        "target_url": pa.array(["https://hub.example/"] * 100, pa.string()),
        "anchor": pa.array([f"anchor-{i:03d}" for i in range(100)][::-1],
                           pa.string()),
    })
    folded = _fold_anchor_group(group)
    anchors_sorted = sorted(group.column("anchor").to_pylist())
    assert folded.column("n_anchors")[0].as_py() == 100
    assert folded.column("anchors")[0].as_py() == "|".join(anchors_sorted[:64])

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE links AS SELECT 'https://hub.example/' AS target_url, "
        "'anchor-' || lpad(CAST(i AS VARCHAR), 3, '0') AS anchor "
        "FROM generate_series(0, 99) t(i)")
    got = con.execute("""
        WITH ranked AS (
            SELECT target_url, anchor,
                   ROW_NUMBER() OVER (PARTITION BY target_url
                                      ORDER BY anchor) AS rn
            FROM links)
        SELECT CAST(COUNT(*) AS BIGINT),
               string_agg(anchor, '|' ORDER BY anchor)
                   FILTER (WHERE rn <= 64)
        FROM ranked GROUP BY target_url
    """).fetchone()
    assert got[0] == folded.column("n_anchors")[0].as_py()
    assert got[1] == folded.column("anchors")[0].as_py()


def test_robots_gate_batch(ray_session):
    """Offline robots audit: per-ORIGIN rules (a :8080 site is not the
    :443 site), longest-match precedence, query kept in the match input,
    unknown origins allow (4xx posture)."""
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.frontier.robots import robots_gate

    pages = ray.data.from_arrow(pa.table({
        "url": [
            "https://a.test/private/x",       # blocked
            "https://a.test/private/ok/x",    # longer Allow wins
            "https://a.test/pub?page=2",      # query kept in match input
            "https://a.test:8080/private/y",  # port must not corrupt path
            "https://other.test/private/x",   # no rules → allowed
        ],
    }))
    robots = ("User-agent: decoy\nDisallow: /\n\n"
              "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n")
    rows = robots_gate(pages, {
        "https://a.test": robots,
        # the :8080 origin serves DIFFERENT rules — must not be conflated
        "https://a.test:8080": "User-agent: *\nDisallow: /blocked\n",
    }).take_all()
    got = {r["url"]: (r["allowed"], r["path"]) for r in rows}
    assert got["https://a.test/private/x"] == (False, "/private/x")
    assert got["https://a.test/private/ok/x"] == (True, "/private/ok/x")
    assert got["https://a.test/pub?page=2"] == (True, "/pub?page=2")
    # judged by the :8080 origin's own robots, not a.test:443's
    assert got["https://a.test:8080/private/y"] == (True, "/private/y")
    assert got["https://other.test/private/x"][0] is True


def test_strip_tracking_params():
    from mhtml_to_html_ray.frontier.canon import strip_tracking

    assert strip_tracking(
        "https://a.test/p?utm_source=x&page=2&gclid=z") == \
        "https://a.test/p?page=2"
    # all params tracking → the '?' drops too
    assert strip_tracking("https://a.test/p?UTM_Source=x&fbclid=1") == \
        "https://a.test/p"
    # order of survivors preserved; fragment survives
    assert strip_tracking(
        "https://a.test/p?b=2&utm_term=t&a=1#frag") == \
        "https://a.test/p?b=2&a=1#frag"
    # no query: canonicalization only
    assert strip_tracking("HTTPS://A.test/x") == "https://a.test/x"
    # a bare tracking key without '=' still drops
    assert strip_tracking("https://a.test/p?gclid&x=1") == \
        "https://a.test/p?x=1"


def test_strip_tracking_fragment_with_question_mark():
    """WHATWG fragments legally contain '?' (SPA hash routes): the
    fragment must pass through untouched, and a real query before it is
    still stripped."""
    from mhtml_to_html_ray.frontier.canon import strip_tracking

    assert strip_tracking("https://a.test/p#x?gclid=1") == \
        "https://a.test/p#x?gclid=1"
    assert strip_tracking("https://a.test/p#/route?page=2&gclid=abc") == \
        "https://a.test/p#/route?page=2&gclid=abc"
    assert strip_tracking(
        "https://a.test/p?utm_term=t&k=1#/route?gclid=abc") == \
        "https://a.test/p?k=1#/route?gclid=abc"


def _frontier_row(index: int, priority: float, host: str = "h.test") -> dict:
    return {
        "url": f"https://{host}/p{index}",
        "canon_url": f"https://{host}/p{index}",
        "host": host,
        "host_hash": hash(host) & 0x7FFFFFFF,
        "depth": 0,
        "priority": priority,
        "discovered_ts": 0,
        "wave": 0,
        "parent_url": "",
        "discovery_index": index,
    }


def test_parquet_prefetch_select_parity(ray_session, tmp_path):
    """prefetch_wave + later adds + select_wave(prefetch=...) must select
    EXACTLY the rows the unprefetched path would — including when the
    post-prefetch adds outrank the prefetched window (the merge trims the
    union back to the window before the host cap)."""
    from mhtml_to_html_ray.frontier.store import ParquetFrontier

    def build(root):
        store = ParquetFrontier(str(root))
        store.add([_frontier_row(i, priority=0.1 + (i % 7) / 10.0,
                                 host=f"h{i % 3}.test") for i in range(40)])
        return store

    plain = build(tmp_path / "plain")
    overlapped = build(tmp_path / "ovl")

    handle = overlapped.prefetch_wave(10, per_host_cap=4)
    assert handle is not None and len(handle["rows"]) > 0
    # admits land AFTER the prefetch — some outrank everything prefetched
    late = [_frontier_row(100 + i, priority=5.0, host="h9.test") for i in range(6)]
    plain.add(late)
    overlapped.add(late)

    expect = plain.select_wave(10, per_host_cap=4)
    got = overlapped.select_wave(10, per_host_cap=4, prefetch=handle)
    assert [r["discovery_index"] for r in got] == \
        [r["discovery_index"] for r in expect]
    # and the surviving backlogs are identical too
    remaining_plain = sorted(r["discovery_index"] for r in plain._read_table().to_pylist())
    remaining_ovl = sorted(r["discovery_index"] for r in overlapped._read_table().to_pylist())
    assert remaining_ovl == remaining_plain


def test_overlap_select_crawl_parity(ray_session, tmp_path):
    """A parquet-frontier crawl with overlap_select produces the identical
    fetch order and seen set as overlap_select=False, and the wave metrics
    record that later waves actually consumed a prefetched window."""
    from mhtml_to_html_ray.frontier.scheduler import (
        CrawlConfig, CrawlScheduler, request_log)
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    def html_page(links):
        body = "".join(f'<a href="{link}">x</a>' for link in links)
        return ("text/html", f"<html><body>{body}</body></html>".encode())

    routes = {}
    for i in range(12):
        routes[f"https://ov.example/s{i}"] = html_page(
            [f"https://ov.example/c{i}-{j}" for j in range(3)])
        for j in range(3):
            routes[f"https://ov.example/c{i}-{j}"] = html_page([])
    seeds = [f"https://ov.example/s{i}" for i in range(12)]
    base = dict(discovery_mode="hyperlinks", retry_sleep_scale=0.0,
                num_seen_shards=2, fetch_concurrency=1, batch_size=8,
                wave_budget=5, max_waves=20, frontier_storage="parquet")

    runs = {}
    for label, overlap in (("off", False), ("on", True)):
        scheduler = CrawlScheduler(
            DictTransportFactory(routes),
            CrawlConfig(frontier_dir=str(tmp_path / label), overlap_select=overlap,
                        **base),
        )
        result = scheduler.run(seeds)
        runs[label] = (request_log(result), result.seen_urls, result.metrics)
        scheduler.close()

    assert runs["on"][0] == runs["off"][0], "overlap changed the crawl order"
    assert runs["on"][1] == runs["off"][1]
    overlapped_waves = [m for m in runs["on"][2] if m.get("select_overlapped")]
    assert overlapped_waves, "no wave ever consumed a prefetched window"
