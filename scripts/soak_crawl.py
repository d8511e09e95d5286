"""Crawl soak at beyond-bench scale with driver-RSS tracking.

Drives the wave scheduler over a synthetic web (SyntheticSiteTransport — no
routes dict, pages generated in the fetch actors) with the two 10^10-URL
paths enabled: Parquet-backed frontier backlog + streamed per-wave results.
A sampler thread records driver RSS per wave; the success criteria are
(a) every URL fetched exactly once and (b) driver RSS flat across waves
(VERDICT r1 item 4 "Done =" condition).

Usage: python scripts/soak_crawl.py [--hosts 1000] [--pages 500]
       [--wave-budget 100000] [--cpus 32] [--shards 16] [--concurrency 16]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as handle:
        for line in handle:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hosts", type=int, default=1000)
    parser.add_argument("--no-overlap", action="store_true",
                        help="disable overlapped frontier selection (A/B lane)")
    parser.add_argument("--pages", type=int, default=500)
    parser.add_argument("--wave-budget", type=int, default=100_000)
    parser.add_argument("--cpus", type=int, default=32)
    parser.add_argument("--shards", type=int, default=16)
    parser.add_argument("--concurrency", type=int, default=16)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--admit-strategy", default="auto",
                        choices=["auto", "driver", "distributed"])
    args = parser.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from mhtml_to_html_ray.frontier.scheduler import CrawlConfig, CrawlScheduler
    from mhtml_to_html_ray.frontier.transports import SyntheticSiteFactory

    total_urls = args.hosts * args.pages
    work = tempfile.mkdtemp(prefix="soak_crawl_")
    config = CrawlConfig(
        discovery_mode="hyperlinks",
        max_waves=200,
        wave_budget=args.wave_budget,
        max_depth=64,
        num_seen_shards=args.shards,
        fetch_concurrency=args.concurrency,
        batch_size=args.batch_size,
        retry_sleep_scale=0.0,
        admit_strategy=args.admit_strategy,
        frontier_storage="parquet",
        overlap_select=not args.no_overlap,
        frontier_dir=os.path.join(work, "frontier"),
        results_dir=os.path.join(work, "results"),
    )
    scheduler = CrawlScheduler(
        SyntheticSiteFactory(args.hosts, args.pages), config
    )
    seeds = [f"https://h{i}.soak.example/p0" for i in range(args.hosts)]

    samples: list[float] = []
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            samples.append(rss_mb())
            stop.wait(0.5)

    thread = threading.Thread(target=sampler, daemon=True)
    thread.start()
    started = time.monotonic()
    scheduler.warmup()
    result = scheduler.run(seeds)
    wall = time.monotonic() - started
    stop.set()
    thread.join(timeout=2)
    scheduler.close()

    results_ds = result.results_dataset()
    n_rows = results_ds.count()
    n_distinct = results_ds.unique("canon_url")
    n_distinct = len(n_distinct)

    # RSS series: one representative sample per wave-sized slice of the run
    per_wave = max(1, len(samples) // max(result.waves, 1))
    series = [round(samples[i], 1) for i in range(0, len(samples), per_wave)]

    print(json.dumps({
        "target_urls": total_urls,
        "fetched_rows": n_rows,
        "distinct_urls": n_distinct,
        "exactly_once": n_rows == n_distinct == total_urls,
        "waves": result.waves,
        "phase_ms": {
            phase: round(sum(m.get(phase, 0.0) for m in result.metrics), 1)
            for phase in ("select_ms", "fetch_ms_wall", "admit_ms")
        },
        "urls_per_sec": round(n_rows / wall, 1),
        "wall_sec": round(wall, 1),
        "driver_rss_mb_series": series[:40],
        "driver_rss_mb_max": round(max(samples), 1) if samples else None,
        "driver_rss_mb_first": round(samples[0], 1) if samples else None,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
