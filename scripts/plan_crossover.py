"""Driver-vs-distributed plan crossover at above-the-switch scale.

The committed BENCH runs at sf0.1 (5,000-doc query corpora), below the
200k-row auto switch, so the bench's distributed_plans lane measures the
distributed plans' FIXED costs (a dozen ~0.1-1 s all-to-all rounds), not
their scaling. This script synthesizes a corpus ABOVE the switch
(replicating the sf documents table with fresh doc_ids, deterministic) and
times both plan families on it — the evidence that the auto switch points
the right way on both sides of the boundary.

Usage: python scripts/plan_crossover.py [--docs 200000] [--cpus 16]
       [--sf-dir /root/testdata/sf0.1] [--ops minhash,tfidf,lm,winnow]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# allow forcing the driver/broadcast plans above the switch for the A/B —
# the documented escape hatch (must be set before planning.py is imported)
os.environ.setdefault("MHTML_RAY_PLAN_SWITCH_ROWS", str(10**9))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=200_000)
    parser.add_argument("--cpus", type=int, default=16)
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    parser.add_argument("--ops", default="minhash,tfidf,lm,winnow")
    args = parser.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mhtml_to_html_ray.functions import corpusstats, dedup, textstats

    base = pq.read_table(os.path.join(args.sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    n_base = base.num_rows
    copies = max(1, -(-args.docs // n_base))
    blocks = []
    for c in range(copies):
        shifted = pa.table({
            "doc_id": pa.compute.add(base.column("doc_id"),
                                     pa.scalar(c * 10_000_000, pa.int64())),
            "text": base.column("text"),
        })
        blocks.append(shifted)
    total = sum(b.num_rows for b in blocks)
    docs = ray.data.from_arrow(blocks).materialize()

    def timed(thunk):
        started = time.monotonic()
        result = thunk()
        if isinstance(result, ray.data.Dataset):
            result.count()
        return round(time.monotonic() - started, 2)

    lanes = {
        "minhash": {
            "driver": lambda: dedup.minhash_dedup(
                docs, threshold=0.8, pair_strategy="driver",
                cluster_strategy="driver"),
            "distributed": lambda: dedup.minhash_dedup(
                docs, threshold=0.8, pair_strategy="groupby",
                cluster_strategy="distributed"),
        },
        "tfidf": {
            "driver": lambda: corpusstats.tfidf_topk(docs, k=5, strategy="broadcast"),
            "distributed": lambda: corpusstats.tfidf_topk(docs, k=5, strategy="join"),
        },
        "lm": {
            "driver": lambda: textstats.unigram_lm_scores(docs, strategy="broadcast"),
            "distributed": lambda: textstats.unigram_lm_scores(docs, strategy="join"),
        },
        "winnow": {
            "driver": lambda: dedup.winnow_overlap_pairs(
                docs, min_shared=25, strategy="driver"),
            "distributed": lambda: dedup.winnow_overlap_pairs(
                docs, min_shared=25, strategy="groupby"),
        },
    }
    wanted = set(args.ops.split(","))
    out = {"docs": total, "cpus": args.cpus, "plans": {}}
    for name, plans in lanes.items():
        if name not in wanted:
            continue
        out["plans"][name] = {k: timed(v) for k, v in plans.items()}
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
