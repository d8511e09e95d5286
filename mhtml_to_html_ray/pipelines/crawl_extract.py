"""The full north-star flow in one pipeline: frontier crawl → fetched page
bodies → fused MIME+DOM extraction → extraction output Dataset.

    crawl (wave-synchronous scheduler, bodies kept)        — actors
      └→ results table (url, wave, body, …)                — Arrow
           └→ map_batches(ExtractBatch)                    — task pool
                └→ html_out / text_out / title / anomalies

At cluster scale the crawl writes per-wave body partitions to Parquet and
extraction streams over them (see run.py / state.checkpoint); here the wave
results flow straight into the extraction stage.
"""

from __future__ import annotations

import pyarrow as pa

from ..frontier.scheduler import CrawlConfig, CrawlResult, CrawlScheduler
from ..stages.extract import ExtractBatch


def crawl_and_extract(
    transport_factory,
    seeds: list[str],
    crawl_config: CrawlConfig | None = None,
    batch_size: int = 64,
):
    """Run a crawl (bodies kept), then extract every successfully fetched
    page. Returns (CrawlResult, extraction Dataset)."""
    import ray.data

    config = crawl_config or CrawlConfig()
    config.keep_bodies = True
    scheduler = CrawlScheduler(transport_factory, config)
    try:
        result: CrawlResult = scheduler.run(seeds)
    finally:
        scheduler.close()

    fetched = result.results
    ok_mask = fetched.column("ok")
    pages = fetched.filter(ok_mask)
    pages_table = pa.table(
        {
            "url": pages.column("canon_url"),
            "warc_ts": pa.array([0] * pages.num_rows, pa.int64()).cast(pa.timestamp("us")),
            "html": pages.column("body").cast(pa.binary()),
            "text": pa.array([""] * pages.num_rows, pa.string()),
            "lang": pa.array(["und"] * pages.num_rows, pa.string()),
        }
    )
    ds = ray.data.from_arrow(pages_table)
    extracted = ds.map_batches(
        ExtractBatch(keep_html=True),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    return result, extracted
