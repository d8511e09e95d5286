"""Exact distributed quantiles over a (typically integer) stats column.

The classic value-counts shape: each block pre-aggregates to DISTINCT
(value, count) partials, ONE groupby folds them, and the driver walks the
cumulative distribution — so the shuffle and driver footprint scale with
the number of DISTINCT values, not rows. For bounded discrete columns
(lengths, token counts, status codes, scores) that is thousands of rows at
any corpus size; for unbounded continuous columns use a sketch (t-digest)
instead — this operator is the exact path.

Quantile definition = DuckDB ``quantile_disc``: the element at sorted
0-based index ``max(0, ceil(q*n) - 1)`` (lower discrete quantile), so the
SQL oracle reproduces results bit-for-bit, including the float
``q * n`` rounding behavior (both sides compute it in IEEE double).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def value_counts_ds(ds, col: str):
    """(value, n) dataset — distinct-value counts via per-block
    pre-aggregation + one groupby over (value, n) partials."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        column = batch.column(col)
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        # NULLs are excluded from the distribution (DuckDB aggregate
        # semantics) — value_counts would otherwise emit a null entry
        counts = column.drop_null().value_counts()
        return pa.table(
            {
                "value": counts.field("values"),
                "n": pc.cast(counts.field("counts"), pa.int64()),
            }
        )

    return (
        ds.select_columns([col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )


def exact_quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles of ``ds[col]`` — returns (q, value), one
    row per requested quantile, DuckDB ``quantile_disc`` parity."""
    import ray

    blocks = [
        b
        for b in ray.get(value_counts_ds(ds, col).to_arrow_refs())
        if b.num_columns > 0 and b.num_rows > 0
    ]
    if not blocks:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.nulls(len(qs), pa.int64())})
    folded = pa.concat_tables(blocks)
    order = pc.sort_indices(folded, sort_keys=[("value", "ascending")])
    folded = folded.take(order)
    values = folded.column("value")
    cum = np.cumsum(folded.column("n").to_numpy(zero_copy_only=False))
    total = int(cum[-1])
    picked = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        idx = max(0, math.ceil(q * total) - 1)
        pos = int(np.searchsorted(cum, idx, side="right"))
        picked.append(pos)
    return pa.table(
        {"q": pa.array([float(q) for q in qs], pa.float64()),
         "value": values.take(pa.array(picked, pa.int64()))}
    )


def grouped_value_counts_ds(ds, key: str, col: str):
    """(key, value, n) dataset — per-group distinct-value counts, same
    per-block pre-aggregation shape as value_counts_ds."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select([key, col])
        # NULL values are excluded from the distribution; null KEYS form
        # their own group in SQL GROUP BY, but quantile callers group by
        # non-null dimensions — drop both for one consistent contract
        mask = pc.and_(pc.is_valid(t.column(key)), pc.is_valid(t.column(col)))
        t = t.filter(mask)
        g = t.group_by([key, col]).aggregate([([], "count_all")])
        return pa.table({
            "key": g.column(key),
            "value": g.column(col),
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })

    return (
        ds.select_columns([key, col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["key", "value"])
        .aggregate(Sum("n", alias_name="n"))
    )


def exact_quantiles_by(ds, key: str, col: str, qs: list[float],
                       key_name: str | None = None) -> pa.Table:
    """Per-group exact discrete quantiles: (key, q, value) rows, DuckDB
    ``quantile_disc`` parity per group. The driver folds DISTINCT
    (key, value) pairs only — bounded by group count × distinct values,
    independent of row count."""
    import ray

    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    key_name = key_name or key
    blocks = [
        b
        for b in ray.get(grouped_value_counts_ds(ds, key, col).to_arrow_refs())
        if b.num_columns > 0 and b.num_rows > 0
    ]
    if not blocks:
        return pa.table({key_name: pa.array([], pa.string()),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    folded = pa.concat_tables(blocks)
    order = pc.sort_indices(
        folded, sort_keys=[("key", "ascending"), ("value", "ascending")]
    )
    folded = folded.take(order)
    keys = folded.column("key").to_pylist()
    values = folded.column("value")
    counts = folded.column("n").to_numpy(zero_copy_only=False)
    out_keys, out_qs, out_pos = [], [], []
    start = 0
    for end in range(1, len(keys) + 1):
        if end < len(keys) and keys[end] == keys[start]:
            continue
        cum = np.cumsum(counts[start:end])
        total = int(cum[-1])
        for q in qs:
            idx = max(0, math.ceil(q * total) - 1)
            pos = start + int(np.searchsorted(cum, idx, side="right"))
            out_keys.append(keys[start])
            out_qs.append(float(q))
            out_pos.append(pos)
        start = end
    return pa.table({
        key_name: pa.array(out_keys),
        "q": pa.array(out_qs, pa.float64()),
        "value": values.take(pa.array(out_pos, pa.int64())),
    })
