"""Framework-free scaling ceiling probe: the SAME extraction kernel
(ExtractBatch over the deterministic fixture corpus) under plain
multiprocessing — no Ray anywhere. Each worker GENERATES its own slice of
the corpus (nothing pickled/shipped) and extracts it, so the measurement is
pure kernel + box: whatever efficiency this loses between N and 4N procs is
the machine's shared-resource (memory-bandwidth/LLC) term, not framework
overhead. bench.py --scaling numbers should be read against this ceiling.

Usage: python scripts/mp_ceiling.py [--rows 200000] [--levels 4,16,32]
       [--trials 3]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(task: tuple[int, int, int]) -> int:
    worker_id, rows, _nonce = task
    from mhtml_to_html_ray.sources.fixtures import corpus_pages_table
    from mhtml_to_html_ray.stages.extract import ExtractBatch

    table = corpus_pages_table(rows, n_hosts=8, seed=1000 + worker_id)
    extract = ExtractBatch(keep_html=False)
    done = 0
    for start in range(0, table.num_rows, 256):
        out = extract(table.slice(start, 256))
        done += out.num_rows
    return done


def run_level(n_procs: int, total_rows: int, nonce: int) -> float:
    rows_per_proc = total_rows // n_procs
    with mp.Pool(n_procs) as pool:
        # warm the pool (imports + fixture builders) before the clock
        pool.map(_work, [(i, 64, nonce) for i in range(n_procs)])
        started = time.monotonic()
        counts = pool.map(_work, [(i, rows_per_proc, nonce) for i in range(n_procs)])
        elapsed = time.monotonic() - started
    assert sum(counts) == rows_per_proc * n_procs
    return sum(counts) / elapsed


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=200_000)
    parser.add_argument("--levels", default="4,16,32")
    parser.add_argument("--trials", type=int, default=3)
    args = parser.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    trials = {
        n: [run_level(n, args.rows, t) for t in range(args.trials)] for n in levels
    }
    medians = {n: statistics.median(v) for n, v in trials.items()}

    def eff(low: int, high: int):
        if low in medians and high in medians:
            return round((medians[high] / medians[low]) / (high / low), 3)
        return None

    print(json.dumps({
        "metric": "mp_ceiling pages/sec (no Ray), median of %d" % args.trials,
        "pages_per_sec": {n: round(m, 1) for n, m in medians.items()},
        "trials": {n: [round(v, 1) for v in vs] for n, vs in trials.items()},
        "efficiency_4_to_16": eff(4, 16),
        "efficiency_8_to_32": eff(8, 32),
        "efficiency_4_to_32": eff(4, 32) if {4, 32} <= set(levels) else None,
        "rows_per_level": args.rows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
