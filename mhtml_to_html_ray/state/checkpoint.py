"""Wave-atomic crawl checkpoints: frontier + seen-set snapshots + metrics,
one directory per wave, completed atomically (write then ``_COMPLETE``
marker) so a resumed run trusts only finished waves — Ray task retries or a
killed driver can never leave a half-written wave looking done
(SURVEY.md §4 checkpoint/resume, §7 hard part 6).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class CrawlCheckpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave_{wave:05d}")

    def save_wave(
        self,
        wave: int,
        frontier: pa.Table,
        results: pa.Table | None,
        seen_tables: list[pa.Table],
        metrics: dict,
    ) -> None:
        wave_dir = self._wave_dir(wave)
        tmp_dir = wave_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        pq.write_table(frontier, os.path.join(tmp_dir, "frontier.parquet"))
        if results is not None:
            pq.write_table(results, os.path.join(tmp_dir, "results.parquet"))
        for shard_id, table in enumerate(seen_tables):
            pq.write_table(table, os.path.join(tmp_dir, f"seen_shard_{shard_id:04d}.parquet"))
        with open(os.path.join(tmp_dir, "metrics.json"), "w") as handle:
            json.dump(metrics, handle, indent=2, sort_keys=True)
        open(os.path.join(tmp_dir, "_COMPLETE"), "w").close()
        if os.path.exists(wave_dir):
            import shutil

            shutil.rmtree(wave_dir)
        os.rename(tmp_dir, wave_dir)

    def latest_wave(self) -> int | None:
        waves = []
        for name in os.listdir(self.root):
            if name.startswith("wave_") and not name.endswith(".tmp"):
                if os.path.exists(os.path.join(self.root, name, "_COMPLETE")):
                    waves.append(int(name.split("_")[1]))
        return max(waves) if waves else None

    def load_frontier(self, wave: int) -> pa.Table:
        return pq.read_table(os.path.join(self._wave_dir(wave), "frontier.parquet"))

    def load_results(self, wave: int) -> pa.Table | None:
        path = os.path.join(self._wave_dir(wave), "results.parquet")
        return pq.read_table(path) if os.path.exists(path) else None

    def load_seen_tables(self, wave: int) -> list[pa.Table]:
        wave_dir = self._wave_dir(wave)
        tables = []
        shard_id = 0
        while True:
            path = os.path.join(wave_dir, f"seen_shard_{shard_id:04d}.parquet")
            if not os.path.exists(path):
                break
            tables.append(pq.read_table(path))
            shard_id += 1
        return tables

    def load_metrics(self, wave: int) -> dict:
        with open(os.path.join(self._wave_dir(wave), "metrics.json")) as handle:
            return json.load(handle)

    def reset(self) -> None:
        """Remove every existing wave dir: a FRESH (non-resume) crawl into a
        reused checkpoint dir must not leave stale higher-numbered waves
        that a later --resume would mistake for this crawl's progress."""
        import shutil

        for name in os.listdir(self.root):
            if name.startswith("wave_"):
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
