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
