"""Engine benchmark: headline pipelines over $GRAFT_SF_DIR at
$RAY_GRAFT_CPUS cpus, one JSON line on stdout.

Pipelines timed:
  * extract        — fixture corpus (N pages across H hosts, every family) →
                     fused MIME+DOM extraction → count  [pages/sec]
  * flagship       — documents → synthetic MHTML → extraction  [pages/sec]
  * crawl          — synthetic link graph → wave scheduler  [urls/sec]
  * a relational + training-data query sample (per-query seconds)

``--scaling`` runs the same benchmark at 8 and 32 cpus in fresh processes
and reports throughput at both plus scaling efficiency (the sandbox stand-in
for the N→4N-node criterion, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXTRACT_ROWS = int(os.environ.get("BENCH_EXTRACT_ROWS", "6000"))
CRAWL_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "64"))
CRAWL_PAGES_PER_HOST = int(os.environ.get("BENCH_CRAWL_PAGES", "40"))

QUERY_SAMPLE = [
    "q1_pricing_summary",
    "events_tumbling",
    "frontier_host_budget",
    "dedup_exact",
    "token_count",
    "quality_score",
    "embedding_topk",
    "dedup_minhash",
]


def _sf_value(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_extract() -> tuple[float, int]:
    import ray.data

    from mhtml_to_html_ray.sources.fixtures import corpus_pages_table
    from mhtml_to_html_ray.stages.extract import ExtractBatch

    table = corpus_pages_table(EXTRACT_ROWS, n_hosts=32, seed=42)
    ds = ray.data.from_arrow(table).repartition(NUM_CPUS * 2)
    started = time.monotonic()
    count = (
        ds.map_batches(ExtractBatch(keep_html=False), batch_format="pyarrow",
                       batch_size=32, zero_copy_batch=True)
        .filter(lambda row: row["error"] is None)
        .count()
    )
    elapsed = time.monotonic() - started
    assert count > 0
    return elapsed, count


def bench_flagship() -> tuple[float, int]:
    from mhtml_to_html_ray.pipelines.flagship import run_flagship

    started = time.monotonic()
    count = run_flagship(SF_DIR, keep_html=False).count()
    elapsed = time.monotonic() - started
    return elapsed, count


def _crawl_routes() -> dict:
    routes = {}
    for host_index in range(CRAWL_HOSTS):
        host = f"h{host_index}.bench.invalid"
        for page_index in range(CRAWL_PAGES_PER_HOST):
            links = [
                f"https://h{(host_index + offset) % CRAWL_HOSTS}.bench.invalid/"
                f"p{(page_index * 3 + offset) % CRAWL_PAGES_PER_HOST}"
                for offset in range(1, 4)
            ]
            body = "".join(f'<a href="{link}">x</a>' for link in links)
            routes[f"https://{host}/p{page_index}"] = (
                "text/html",
                f"<html><body>{body}</body></html>".encode(),
            )
    return routes


def bench_crawl() -> tuple[float, int]:
    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler
    from mhtml_to_html_ray.frontier.transports import DictTransportFactory

    routes = _crawl_routes()
    seeds = [f"https://h{i}.bench.invalid/p0" for i in range(CRAWL_HOSTS)]
    config = CrawlConfig(
        discovery_mode="hyperlinks",
        max_waves=20,
        fetch_concurrency=max(2, NUM_CPUS // 2),
        batch_size=32,
        num_seen_shards=8,
        retry_sleep_scale=0.0,
    )
    scheduler = CrawlScheduler(DictTransportFactory(routes), config)
    started = time.monotonic()
    try:
        result = scheduler.run(seeds)
    finally:
        scheduler.close()
    elapsed = time.monotonic() - started
    return elapsed, result.results.num_rows


def bench_queries() -> dict[str, float]:
    from mhtml_to_html_ray.pipelines.queries import QUERIES

    timings = {}
    for name in QUERY_SAMPLE:
        started = time.monotonic()
        result = QUERIES[name](SF_DIR)
        # force lazy results
        if hasattr(result, "count") and not hasattr(result, "columns"):
            result.count()
        timings[name] = round(time.monotonic() - started, 3)
    return timings


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    extract_sec, extract_rows = bench_extract()
    flagship_sec, flagship_rows = bench_flagship()
    crawl_sec, crawl_urls = bench_crawl()
    queries = bench_queries()
    ray.shutdown()

    total = round(extract_sec + flagship_sec + crawl_sec + sum(queries.values()), 3)
    return {
        "metric": "headline_wall_sec (extract corpus + flagship + crawl + query sample)",
        "value": total,
        "unit": "sec",
        "queries": {
            **queries,
            "extract_corpus": round(extract_sec, 3),
            "flagship": round(flagship_sec, 3),
            "crawl": round(crawl_sec, 3),
        },
        "sf": _sf_value(SF_DIR),
        "num_cpus": NUM_CPUS,
        "pages_extracted_per_sec": round(extract_rows / extract_sec, 1),
        "flagship_pages_per_sec": round(flagship_rows / flagship_sec, 1),
        "frontier_urls_per_sec": round(crawl_urls / crawl_sec, 1),
        "extract_rows": extract_rows,
        "crawl_urls": crawl_urls,
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (the sandbox
    protocol for the two-cluster-size criterion, BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    low, high = 8, 32
    r_low = run(low)
    r_high = run(high)
    tp_low = r_low["pages_extracted_per_sec"]
    tp_high = r_high["pages_extracted_per_sec"]
    efficiency = (tp_high / tp_low) / (high / low)
    crawl_eff = (
        (r_high["frontier_urls_per_sec"] / r_low["frontier_urls_per_sec"]) / (high / low)
    )
    return {
        "metric": "scaling_efficiency (pages extracted/sec, 8→32 cpus)",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "cpus": [low, high],
        "pages_per_sec": [tp_low, tp_high],
        "frontier_urls_per_sec": [r_low["frontier_urls_per_sec"], r_high["frontier_urls_per_sec"]],
        "crawl_scaling_efficiency": round(crawl_eff, 3),
        "sec": [r_low["value"], r_high["value"]],
        "sf": r_low["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
