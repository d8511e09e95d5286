"""Deterministic, resumable sampling for training-data pipelines.

A 100-TB corpus cannot be sampled with RNG state: the sample must be a pure
function of each row (so re-runs, retried tasks, and incremental reruns
over new shards agree), it must never shuffle, and the decision must be
auditable from SQL. The standard trick: hash a stable key per row and keep
the row iff the hash falls under ``rate`` of the hash space.

* The hash is md5 (present in DuckDB, Python, and every warehouse), and
  the comparison happens on the FIRST 8 HEX CHARS as a string — for
  fixed-length lowercase hex, lexicographic order == numeric order, so the
  engine and any SQL oracle agree byte-for-byte with no integer-parsing
  dialect differences.
* ``salt`` derives independent samples from the same key (sample A for
  eval, sample B for train) without correlation.
* Stratified sampling broadcasts one threshold per stratum (a handful of
  rows) — no shuffle, no groupby; each batch filters locally, so the
  operator is embarrassingly parallel at any scale.

md5-per-row is a Python loop by necessity (the hash IS the operator, and
it must match SQL's md5); each call is C code on a short string.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_HASH_SPACE = 16 ** 8  # first 8 hex chars


def _threshold_hex(rate: float) -> str:
    """Keep-threshold for ``rate`` as 8 lowercase hex chars. Callers must
    short-circuit rate <= 0 / >= 1 (a 9-char threshold would break the
    fixed-length string comparison)."""
    return format(int(rate * _HASH_SPACE), "08x")


def _key_hex(values, salt: str):
    return [
        hashlib.md5((salt + str(v)).encode("utf-8")).hexdigest()[:8]
        for v in values
    ]


def bernoulli_sample(ds, key: str = "doc_id", rate: float = 0.1,
                     salt: str = ""):
    """Deterministic rate-sample: keep rows where
    md5(salt || key)[:8] < hex(rate * 16^8). Same row set on every run,
    every retry, every engine that can evaluate md5."""
    if rate <= 0.0:
        schema = pa.schema(
            list(zip(ds.schema().names, ds.schema().types)))
        empty = schema.empty_table()
        import ray.data

        return ray.data.from_arrow(empty)
    if rate >= 1.0:
        return ds
    threshold = _threshold_hex(rate)

    def keep(batch: pa.Table) -> pa.Table:
        hexes = _key_hex(batch.column(key).to_pylist(), salt)
        mask = pa.array([h < threshold for h in hexes], pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, key: str, strata_col: str, rates: dict,
                      default_rate: float = 0.0, salt: str = ""):
    """Per-stratum deterministic sampling (e.g. per-language rates when
    rebalancing a multilingual corpus). ``rates`` maps stratum value →
    rate; strata absent from the map use ``default_rate``. The threshold
    table is tiny and ships inside the closure — each batch filters
    locally, no shuffle."""
    def clamp(rate: float) -> str:
        if rate <= 0.0:
            return "00000000"          # below every hash → drop stratum
        if rate >= 1.0:
            return "ffffffffX"         # above every 8-char hex → keep all
        return _threshold_hex(rate)

    thresholds = {stratum: clamp(r) for stratum, r in rates.items()}
    default_threshold = clamp(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        hexes = _key_hex(batch.column(key).to_pylist(), salt)
        strata = batch.column(strata_col).to_pylist()
        mask = pa.array(
            [h < thresholds.get(s, default_threshold)
             for h, s in zip(hexes, strata)],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# mixture sampling (rebalance a corpus to target source/language weights)


def mixture_rates(ds, strata_col: str, weights: dict) -> dict:
    """Per-stratum acceptance rates that rebalance the corpus to the target
    mixture ``weights`` (stratum → target share) with MAXIMAL retention:
    the binding stratum (smallest count/weight) keeps everything (rate 1)
    and every other stratum downsamples to match its proportion —
    ``rate_s = weight_s * scale / count_s`` with
    ``scale = min_s(count_s / weight_s)``. Strata absent from ``weights``
    rate 0 (dropped).

    The counts come from per-block value_counts partials + one small
    groupby (distinct-strata rows only — a handful at any corpus size); the
    rate arithmetic is plain IEEE-double expressions a SQL engine
    reproduces bit-for-bit, so the whole operator stays auditable from SQL.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    for stratum, w in weights.items():
        if not (w > 0.0):
            raise ValueError(
                f"mixture_rates: weight for {stratum!r} must be > 0")

    def partials(batch: pa.Table) -> pa.Table:
        column = batch.column(strata_col)
        if isinstance(column, pa.ChunkedArray):
            column = column.combine_chunks()
        counts = column.drop_null().value_counts()
        return pa.table({
            "stratum": counts.field("values"),
            "n": pc.cast(counts.field("counts"), pa.int64()),
        })

    folded = (
        ds.select_columns([strata_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("stratum")
        .aggregate(Sum("n", alias_name="n"))
    )
    counts: dict = {}
    for block in ray.get(folded.to_arrow_refs()):
        if block.num_columns == 0:
            continue
        for stratum, n in zip(block.column("stratum").to_pylist(),
                              block.column("n").to_pylist()):
            counts[stratum] = counts.get(stratum, 0) + n

    present = {s: n for s, n in counts.items() if s in weights and n > 0}
    if not present:
        return {}
    scale = min(n / weights[s] for s, n in present.items())
    return {s: min(weights[s] * scale / n, 1.0) for s, n in present.items()}


def mixture_sample(ds, key: str, strata_col: str, weights: dict,
                   salt: str = ""):
    """Deterministically rebalance ``ds`` to the target mixture ``weights``:
    derive per-stratum rates with :func:`mixture_rates` (one tiny count
    aggregate), then hash-filter each batch locally — no shuffle of the
    data itself, same row set on every run/retry/layout."""
    rates = mixture_rates(ds, strata_col, weights)
    return stratified_sample(ds, key, strata_col, rates,
                             default_rate=0.0, salt=salt)


# ---------------------------------------------------------------------------
# per-key cap (docs-per-domain limit)


def per_key_cap(ds, key: str, max_per_key: int, order_col: str,
                columns: list[str] | None = None):
    """Keep at most ``max_per_key`` rows per ``key`` value, chosen as the
    smallest ``order_col`` values (deterministic — no RNG, no run-order
    dependence). The docs-per-domain cap of Common-Crawl-style pipelines.

    Determinism contract: the surviving (key, order_col) multiset is always
    layout-independent. When ``columns`` carries payload AND (key,
    order_col) pairs are not unique, ties at the cap boundary are broken by
    the carried columns in their given order (the full sort key is (key,
    order_col, *columns)), so the surviving ROWS are also
    layout-independent as long as full rows are distinct; exact duplicate
    rows are interchangeable by definition. Prefer a unique order_col (e.g.
    doc_id) when joining payloads back.

    Scale shape: rows are projected to (key, order_col) before any shuffle,
    then a per-block COMBINER keeps at most max_per_key rows per key within
    each block, so the one groupby shuffles at most max_per_key × n_blocks
    rows per key — a hot domain cannot flood its reducer. The final
    ``map_groups`` re-applies the cap on the combined partials. Returns the
    capped (key, order_col[, columns...]) rows; join back on order_col for
    full payloads.
    """
    import numpy as np
    import pyarrow.compute as pc

    cols = [key, order_col] + [c for c in (columns or []) if c not in (key, order_col)]
    sort_keys = [(c, "ascending") for c in cols]

    def cap_block(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return batch
        order = pc.sort_indices(batch, sort_keys=sort_keys)
        sorted_batch = batch.take(order)
        keys = sorted_batch.column(key).to_numpy(zero_copy_only=False)
        # rank within key run: position − start-of-run position
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        run_id = np.cumsum(np.concatenate(([0], (keys[1:] != keys[:-1]).astype(np.int64))))
        rank = np.arange(len(keys)) - starts[run_id]
        return sorted_batch.filter(pa.array(rank < max_per_key))

    projected = ds.select_columns(cols).map_batches(cap_block, batch_format="pyarrow")

    def finalize(group: pa.Table) -> pa.Table:
        return cap_block(group)

    return projected.groupby(key).map_groups(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# group-level quality curation (drop low-quality sources/domains wholesale)


def group_mean_filter(ds, group_col: str, micros_col: str,
                      threshold: float, digits: int = 6):
    """RefinedWeb-style source-level curation: compute each group's MEAN
    quality signal and keep/drop entire groups against ``threshold``.

    The per-row signal must arrive as integer MICROS (int64, signal×10⁶
    rounded) so the group sum is order-independent and bit-identical to a
    SQL oracle regardless of shuffle order; the mean is then ONE float
    division ``sum_micros / (n × 1e6)`` rounded with the shared DuckDB
    kernel. Per-block combiner partials (one row per distinct group per
    block) feed one tiny groupby, the group→mean map broadcasts once
    (groups ≪ rows; at 10⁷-host web scale swap the broadcast for the
    engine hash_join on ``group_col``), and each batch tags locally.

    Output: input columns + ``group_mean`` (rounded) + ``keep``
    (mean >= threshold). No shuffle of the data itself.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .rounding import round_half_away

    # two consumers (mean pass + tag pass): materialize so a possibly
    # expensive upstream lineage (e.g. a full-corpus regex scan computing
    # the micros) runs exactly once — same rationale as _prefix_offsets_impl
    ds = ds.materialize()

    def partials(batch: pa.Table) -> pa.Table:
        if batch.column(group_col).null_count:
            raise ValueError(
                f"group_mean_filter: null {group_col!r} value — a null "
                "group has no mean; filter or fill upstream")
        groups = batch.column(group_col).to_pylist()
        micros = batch.column(micros_col).to_numpy(zero_copy_only=False)
        if micros.dtype.kind != "i":
            raise ValueError(
                f"group_mean_filter: {micros_col!r} must be integer micros")
        uniq, inverse = np.unique(np.asarray(groups, dtype=object),
                                  return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inverse, micros.astype(np.int64))
        counts = np.bincount(inverse, minlength=len(uniq))
        group_type = batch.schema.field(group_col).type
        return pa.table({
            "group": pa.array(uniq.tolist(), group_type),
            "sum_micros": pa.array(sums, pa.int64()),
            "n": pa.array(counts, pa.int64()),
        })

    folded = (
        ds.select_columns([group_col, micros_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("group")
        .aggregate(Sum("sum_micros", alias_name="sum_micros"),
                   Sum("n", alias_name="n"))
    )
    means: dict = {}
    for block in ray.get(folded.to_arrow_refs()):
        if block.num_columns == 0:
            continue
        for group, total, n in zip(block.column("group").to_pylist(),
                                   block.column("sum_micros").to_pylist(),
                                   block.column("n").to_pylist()):
            means[group] = float(
                round_half_away(total / (n * 1000000.0), digits))
    broadcast = ray.put(means)

    def tag(batch: pa.Table) -> pa.Table:
        mean_map = ray.get(broadcast)
        groups = batch.column(group_col).to_pylist()
        mean = np.fromiter((mean_map[g] for g in groups),
                           dtype=np.float64, count=len(groups))
        return batch.append_column(
            "group_mean", pa.array(mean, pa.float64())
        ).append_column("keep", pa.array(mean >= threshold, pa.bool_()))

    return ds.map_batches(tag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic split assignment (train / validation / test)


def split_assign(ds, key: str = "doc_id", fractions=None, salt: str = "split"):
    """Assign every row to a named split by hash fraction — the
    train/val/test partition step between curation and the data loader.

    ``fractions`` is an ordered (name, fraction) list summing to ≤ 1 (the
    last split absorbs any remainder): md5(salt || key)'s first 8 hex chars
    as an integer land in cumulative integer thresholds
    ``floor(cum_frac · 16^8)`` — the bernoulli_sample discipline, so the
    assignment is identical on every run/retry/engine and any SQL that can
    evaluate md5. Membership is a pure function of (salt, key): adding or
    removing OTHER rows never reassigns a row, so splits stay stable as the
    corpus grows (the property shuffling-based splitters lack). Zero
    shuffle: one vectorizable hash per row inside map_batches.

    Output: the input columns + ``split`` (string).
    """
    from fractions import Fraction

    if fractions is None:
        fractions = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    names = [n for n, _ in fractions]
    # exact decimal accumulation: float += drifts (0.1 summed nine times is
    # 0.8999999999999999, one BELOW floor(0.9·16^8)) and would silently
    # disagree with any SQL restating the documented thresholds
    total = sum(Fraction(str(f)) for _, f in fractions)
    if total > 1:
        raise ValueError(f"fractions sum to {float(total)} > 1")
    cum = Fraction(0)
    bounds: list[int] = []
    for _, frac in fractions[:-1]:
        cum += Fraction(str(frac))
        bounds.append(int(cum * _HASH_SPACE))

    def tag(batch: pa.Table) -> pa.Table:
        values = batch.column(key).to_pylist()
        splits = []
        for h in _key_hex(values, salt):  # one hash contract, see top
            hv = int(h, 16)
            idx = 0
            while idx < len(bounds) and hv >= bounds[idx]:
                idx += 1
            splits.append(names[idx])
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def token_budget_sample(ds, budget_tokens: int, key: str = "doc_id",
                        strata_col: str = "source", text_col: str = "text",
                        salt: str = "budget"):
    """Token-budget mixture selection: per stratum, take documents in
    deterministic md5(salt || key) order until ``budget_tokens`` is
    reached — how real training mixtures are specified (tokens per source,
    not documents per source). A document is kept iff the tokens BEFORE it
    in hash order total < budget, so exactly the boundary-crossing doc is
    the last one in; membership is reproducible on any layout/retry (no
    RNG, no count-dependent rates).

    Plan: one tokenize pass emits (stratum, order_hex, key, n_tokens) —
    narrow rows, text never shuffles — then ONE groupby(stratum) computes
    the running sum per group (the standard per-key window shape; if one
    stratum outgrows a task, pre-bucket by order_hex prefix exactly like
    epoch_shuffle's rank step). Output: key, stratum, n_tokens, cum_before,
    keep.
    """
    import numpy as np
    import pandas as pd

    from .textstats import _flatten_batch

    def rows(batch: pa.Table) -> pa.Table:
        doc_ids, _, bounds = _flatten_batch(
            batch.select([key, text_col]).rename_columns(["doc_id", "text"]))
        strata = batch.column(strata_col).to_pylist()
        n_tokens = [length for _, length in bounds]
        order = _key_hex(doc_ids, salt)
        return pa.table(
            {
                "stratum": pa.array(strata, pa.string()),
                "order_hex": pa.array(order, pa.string()),
                "key": pa.array([int(d) for d in doc_ids], pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )

    def scan(group: pd.DataFrame) -> pa.Table:
        frame = group.sort_values(["order_hex", "key"],
                                  kind="mergesort").reset_index(drop=True)
        n = frame["n_tokens"].to_numpy(dtype=np.int64)
        cum_before = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                "key": pa.array(frame["key"].astype("int64"), pa.int64()),
                "stratum": pa.array(frame["stratum"], pa.string()),
                "n_tokens": pa.array(n, pa.int64()),
                "cum_before": pa.array(cum_before, pa.int64()),
                "keep": pa.array(cum_before < budget_tokens, pa.bool_()),
            }
        )

    return (
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("stratum")
        .map_groups(scan, batch_format="pandas")
    )
