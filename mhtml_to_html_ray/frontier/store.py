"""Frontier storage backends for the wave scheduler.

The scheduler only ever materializes ONE wave (budget-bounded) on the
driver; where the rest of the frontier lives is this abstraction:

* MemoryFrontier  — a driver-side list. Right at sandbox scale and for
  tests; at 10^10 URLs the backlog would not fit one process.
* ParquetFrontier — the scale path: the backlog is a Parquet-backed Ray
  Dataset. Wave selection is a distributed ``sort(priority desc,
  discovery_index asc).limit(budget)``; the un-selected remainder plus the
  wave's admitted discoveries are written back (atomic directory swap).
  Nothing but the selected wave ever lands on the driver.

Both backends produce the identical wave sequence (selection is a pure
function of (priority, discovery_index)) — pinned by
tests/test_frontier.py::test_parquet_frontier_matches_memory.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

from ..stages.schemas import FRONTIER_SCHEMA


def _frontier_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)


def _apply_host_cap(rows: list[dict], cap: int | None, budget: int) -> tuple[list[dict], list[dict]]:
    """Priority-ordered rows → (selected, spilled) under budget + per-host cap."""
    if cap is None:
        return rows[:budget], rows[budget:]
    host_counts: dict[str, int] = {}
    selected: list[dict] = []
    spilled: list[dict] = []
    for row in rows:
        count = host_counts.get(row["host"], 0)
        if count < cap and len(selected) < budget:
            host_counts[row["host"]] = count + 1
            selected.append(row)
        else:
            spilled.append(row)
    return selected, spilled


class MemoryFrontier:
    def __init__(self) -> None:
        self.rows: list[dict] = []

    def add(self, rows: list[dict]) -> None:
        self.rows.extend(rows)

    def add_table(self, table: pa.Table) -> None:
        """Arrow ingest (distributed admit path). MemoryFrontier is
        driver-resident by definition, so the pylist conversion is fine."""
        self.rows.extend(table.to_pylist())

    def size(self) -> int:
        return len(self.rows)

    def select_wave(self, budget: int, per_host_cap: int | None = None,
                    prefetch: dict | None = None) -> list[dict]:
        self.rows.sort(key=lambda row: (-row["priority"], row["discovery_index"]))
        selected, self.rows = _apply_host_cap(self.rows, per_host_cap, budget)
        return selected

    def prefetch_wave(self, budget: int, per_host_cap: int | None = None) -> None:
        """No-op: in-memory selection is microseconds, nothing to overlap."""
        return None

    def snapshot_table(self) -> pa.Table:
        return _frontier_table(self.rows)

    def restore(self, table: pa.Table) -> None:
        self.rows = table.to_pylist()

    def max_discovery_index(self) -> int:
        return max((row["discovery_index"] for row in self.rows), default=-1)


class ParquetFrontier:
    """Backlog on Parquet, selection via Ray Data sort+limit.

    The per-host cap runs AFTER the distributed top-(budget × headroom)
    selection: the cap only reorders within the candidate window, so pulling
    ``budget × headroom`` rows (instead of exactly budget) keeps the result
    identical to MemoryFrontier whenever any single host holds fewer than
    (headroom-1)×budget of the top rows — the hot-host regimes the cap
    exists for. Spilled rows go back to the store."""

    def __init__(self, root: str, headroom: int = 4):
        self.root = root
        self.headroom = headroom
        os.makedirs(root, exist_ok=True)
        self.current = os.path.join(root, "frontier")
        self._fragment_counter = 0
        # crash recovery: a kill between _swap_in's two renames leaves the
        # live backlog under .old with no current — restore it first
        old = self.current + ".old"
        if not os.path.exists(self.current) and os.path.exists(old):
            os.rename(old, self.current)
        self._write(_frontier_table([]))

    # -- storage primitives --
    def _swap_in(self, tmp: str) -> None:
        """Replace the current dir with ``tmp`` WITHOUT a destroy-first
        window: rename current aside, rename tmp in, then delete the old —
        a crash at any point leaves the backlog recoverable (see __init__)."""
        old = self.current + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(self.current):
            os.rename(self.current, old)
        os.rename(tmp, self.current)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _write(self, table: pa.Table) -> None:
        import pyarrow.parquet as pq

        tmp = self.current + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        self._swap_in(tmp)

    def _read_table(self) -> pa.Table:
        import pyarrow.parquet as pq

        return pq.read_table(self.current)

    # -- frontier API --
    def add(self, rows: list[dict]) -> None:
        """Append as a new fragment file — admitting a wave's discoveries
        must not rewrite the whole backlog (O(frontier) io per wave)."""
        if not rows:
            return
        import pyarrow.parquet as pq

        self._fragment_counter += 1
        pq.write_table(
            _frontier_table(rows),
            os.path.join(self.current, f"part-add-{self._fragment_counter:06d}.parquet"),
        )

    def add_table(self, table: pa.Table) -> None:
        """Arrow ingest (distributed admit path): the admitted wave goes
        straight Arrow→Parquet — zero Python rows on the driver."""
        if table.num_rows == 0:
            return
        import pyarrow.parquet as pq

        self._fragment_counter += 1
        pq.write_table(
            table.cast(FRONTIER_SCHEMA),
            os.path.join(self.current, f"part-add-{self._fragment_counter:06d}.parquet"),
        )

    def _fragment_paths(self) -> list[str]:
        return [
            os.path.join(self.current, name)
            for name in sorted(os.listdir(self.current))
            if name.endswith(".parquet")
        ]

    def size(self) -> int:
        """Backlog row count from Parquet FILE METADATA only — the round-1
        version read the entire backlog into the driver per call."""
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(p).metadata.num_rows for p in self._fragment_paths())

    def _top_rows(self, paths: list[str], window: int) -> list[dict]:
        """Top-``window`` rows (priority desc, discovery_index asc) of the
        given fragment files. Small fragment sets are read directly (the
        Ray job's fixed cost would dominate); large ones run the
        distributed sort+limit so only ``window`` rows reach the driver."""
        import pyarrow.parquet as pq

        if not paths:
            return []
        total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
        if total <= max(window, 100_000):
            rows: list[dict] = []
            for path in paths:
                rows.extend(pq.read_table(path).to_pylist())
        else:
            import ray.data

            rows = (
                ray.data.read_parquet(paths)
                .sort(["priority", "discovery_index"], descending=[True, False])
                .limit(window)
                .take_all()
            )
        rows.sort(key=lambda row: (-row["priority"], row["discovery_index"]))
        return rows[:window]

    def prefetch_wave(self, budget: int, per_host_cap: int | None = None) -> dict | None:
        """Compute the NEXT wave's candidate window from the CURRENT backlog
        without mutating anything — safe to run concurrently with fetching
        (the scheduler only ADDS fragments between this call and the
        select_wave that consumes the handle; select_wave merges those).

        Correctness: top-K of (frozen ∪ later-adds) ⊆ top-K(frozen) ∪
        top-K(later-adds), so merging the two windows and trimming to K
        reproduces exactly the candidate pool the unprefetched path
        computes."""
        backlog_size = self.size()
        if backlog_size <= budget:
            return None  # select_wave's local path is already cheap
        window = budget if per_host_cap is None else budget * self.headroom
        paths = self._fragment_paths()
        return {
            "rows": self._top_rows(paths, window),
            "paths": set(paths),
            "window": window,
        }

    def select_wave(self, budget: int, per_host_cap: int | None = None,
                    prefetch: dict | None = None) -> list[dict]:
        import ray
        import ray.data
        import pyarrow.compute as pc

        backlog_size = self.size()
        if backlog_size <= budget:
            # the whole backlog fits the wave budget — the bound we already
            # accept driver-resident — so both Ray Data jobs (distributed
            # sort+limit AND remainder rewrite) are pure fixed cost here
            # (~0.8 s/wave measured); select locally, write back the spill
            # (a stale prefetch handle is simply ignored: this path reads
            # the live backlog in full)
            rows = self._read_table().to_pylist()
            rows.sort(key=lambda row: (-row["priority"], row["discovery_index"]))
            selected, spilled = _apply_host_cap(rows, per_host_cap, budget)
            self._write(_frontier_table(spilled))
            return selected

        window = budget if per_host_cap is None else budget * self.headroom
        if prefetch is not None and prefetch.get("window") == window:
            # overlap path: the backlog-wide sort already ran during the
            # previous wave's fetch; only the fragments ADDED since (the
            # wave's admits — small next to the backlog) sort serially here
            new_paths = [
                p for p in self._fragment_paths() if p not in prefetch["paths"]
            ]
            candidate_rows = list(prefetch["rows"]) + self._top_rows(new_paths, window)
            candidate_rows.sort(
                key=lambda row: (-row["priority"], row["discovery_index"])
            )
            candidate_rows = candidate_rows[:window]
        else:
            # the distributed part: only the top-`window` rows reach the driver
            candidate_rows = self._top_rows(self._fragment_paths(), window)
        selected, spilled = _apply_host_cap(candidate_rows, per_host_cap, budget)
        selected_ids = {row["discovery_index"] for row in selected}
        if selected_ids:
            # remainder rewrite is DISTRIBUTED: the (budget-sized) selected-id
            # set broadcasts once, every backlog block anti-filters itself and
            # the remainder streams straight back to Parquet — the backlog
            # never passes through the driver (round-1 scale-killer 4b)
            ds = ray.data.read_parquet(self.current)
            ids_ref = ray.put(pa.array(sorted(selected_ids), pa.int64()))

            def drop_selected(batch: pa.Table) -> pa.Table:
                return batch.filter(
                    pc.invert(
                        pc.is_in(
                            batch.column("discovery_index"), value_set=ray.get(ids_ref)
                        )
                    )
                )

            remainder_ds = ds.map_batches(drop_selected, batch_format="pyarrow")
            tmp = self.current + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            remainder_ds.write_parquet(tmp)
            os.makedirs(tmp, exist_ok=True)  # an all-empty write creates nothing
            if not any(name.endswith(".parquet") for name in os.listdir(tmp)):
                import pyarrow.parquet as pq

                pq.write_table(_frontier_table([]), os.path.join(tmp, "part-0.parquet"))
            self._swap_in(tmp)
        return selected

    def snapshot_table(self) -> pa.Table:
        return self._read_table()

    def restore(self, table: pa.Table) -> None:
        self._write(table)

    def max_discovery_index(self) -> int:
        """Max via Parquet row-group column statistics (no data read); falls
        back to a single-column scan for files without stats."""
        return max(
            (_stats_column_max(p, "discovery_index") for p in self._fragment_paths()),
            default=-1,
        )


def _stats_column_max(path: str, column: str) -> int:
    import pyarrow.parquet as pq

    parquet_file = pq.ParquetFile(path)
    metadata = parquet_file.metadata
    if metadata.num_rows == 0:
        return -1
    best: int | None = None
    for rg in range(metadata.num_row_groups):
        row_group = metadata.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            if col.path_in_schema != column:
                continue
            stats = col.statistics
            if stats is None or not stats.has_min_max:
                best = None
                break
            best = stats.max if best is None else max(best, stats.max)
        else:
            continue
        break
    if best is not None:
        return int(best)
    import pyarrow.compute as pc

    table = pq.read_table(path, columns=[column])
    return int(pc.max(table.column(column)).as_py()) if table.num_rows else -1
