"""Print ray.data stage stats for the engine's headline pipelines — the
measure-don't-guess loop (`ds.stats()`): per-stage wall time, task counts,
block sizes. Run after changing a stage to see where time actually goes.

Usage: python scripts/stats_report.py [sf_dir] [num_cpus]
"""

from __future__ import annotations

import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray
    import ray.data
    from ray.data import DataContext

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from mhtml_to_html_ray.pipelines.flagship import run_flagship
    from mhtml_to_html_ray.sources.fixtures import corpus_pages_table
    from mhtml_to_html_ray.stages.extract import ExtractBatch

    print("=== flagship (documents → synth pages → extract) ===")
    ds = run_flagship(sf_dir, keep_html=False).materialize()
    print(ds.stats())

    print("\n=== extract over fixture corpus (10k rows) ===")
    table = corpus_pages_table(10_000, n_hosts=32, seed=42)
    step = max(1, table.num_rows // (num_cpus * 4))
    blocks = [table.slice(i, step) for i in range(0, table.num_rows, step)]
    out = ray.data.from_arrow(blocks).map_batches(
        ExtractBatch(keep_html=False), batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True,
    )
    out = out.materialize()
    print(out.stats())

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
