"""Temporal join operators Ray Data lacks, built as the composition
SURVEY.md §2 prescribes (map_batches + groupby(by).map_groups + sort):

* asof_join    — for every left row, the LATEST right row with
  right.on <= left.on within the same ``by`` group (the classic "state as
  of event time" join). One hash shuffle on ``by``; within each group a
  vectorized np.searchsorted merge — never a per-row scan.
* range_join_count — per left row, HOW MANY right rows fall inside
  [on - before, on + after] in the same group (windowed containment —
  the counting form of a band/range join, same physical plan).

Both are exact and deterministic; q_events_asof / q_events_range_count run
them against DuckDB's ASOF JOIN / explicit range-join SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_NULLABLE_INT = {
    "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
    "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32",
    "uint64": "UInt64",
}


def _restore_dtypes(frame: pd.DataFrame, restore: dict[str, str]) -> pd.DataFrame:
    """Cast widened float columns back to their recorded int dtypes. A
    column carrying a genuine null (an unmatched/null right payload) casts
    to the pandas NULLABLE integer dtype instead — plain astype would raise
    'cannot convert non-finite values', and Arrow converts Int64-with-NA
    back to int64-with-null cleanly."""
    for name, dtype in restore.items():
        if name not in frame:
            continue
        if frame[name].isna().any():
            frame[name] = frame[name].astype(_NULLABLE_INT.get(dtype, dtype))
        else:
            frame[name] = frame[name].astype(dtype)
    return frame


def _suffixed_names(right_payload, left_schema, key_names, right_suffix):
    """Output names for right payload columns; fails fast when a suffixed
    name collides with an existing left column (the silent alternative is
    overwriting real left data with nulls)."""
    out_right = []
    for name in right_payload:
        out = name + right_suffix if name in left_schema else name
        if (out != name and out in left_schema) or out in key_names or out in out_right:
            raise ValueError(
                f"join output column {out!r} collides with an existing "
                "column; rename the input or pass a different right_suffix"
            )
        out_right.append(out)
    return out_right


def _sides_union(left_ds, right_ds, by: str, on: str, right_suffix: str):
    """Union the two inputs under one schema: shared (by, on, _side) plus
    each side's payload columns (nulls on the other side).

    Caveat (temporal joins only): the null padding makes pandas widen int
    payload columns to float64 inside map_groups; the recorded ``restore``
    dtypes cast back, which is exact up to 2**53 — int64 payloads beyond
    that (e.g. 64-bit hash ids) would lose low bits. hash_join avoids this
    entirely by joining Arrow-native; route such payloads through it."""
    left_names = [n for n in left_ds.schema().names]
    right_names = [n for n in right_ds.schema().names]
    right_payload = [n for n in right_names if n not in (by, on)]
    left_payload = [n for n in left_names if n not in (by, on)]
    out_right = [n + right_suffix for n in right_payload]
    for out in out_right:
        # silent alternative: the suffixed right column would overwrite a
        # real left column with nulls
        if out in left_names or out in (by, on, "_side") or out_right.count(out) > 1:
            raise ValueError(
                f"join output column {out!r} collides with an existing "
                "column; rename the input or pass a different right_suffix"
            )

    left_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    right_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))

    def tag_left(batch: pa.Table) -> pa.Table:
        columns = {by: batch.column(by), on: batch.column(on),
                   "_side": pa.array([0] * batch.num_rows, pa.int8())}
        for name in left_payload:
            columns[name] = batch.column(name)
        for name, out in zip(right_payload, out_right):
            columns[out] = pa.nulls(batch.num_rows, right_schema[name])
        return pa.table(columns)

    def tag_right(batch: pa.Table) -> pa.Table:
        columns = {by: batch.column(by), on: batch.column(on),
                   "_side": pa.array([1] * batch.num_rows, pa.int8())}
        for name in left_payload:
            columns[name] = pa.nulls(batch.num_rows, left_schema[name])
        for name, out in zip(right_payload, out_right):
            columns[out] = batch.column(name)
        return pa.table(columns)

    union = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    # the union's null padding makes pandas widen integer columns to float64
    # inside map_groups — record the dtypes to restore on the way out
    restore: dict[str, str] = {}
    for name in (by, on, *left_payload):
        if pa.types.is_integer(left_schema[name]):
            restore[name] = left_schema[name].to_pandas_dtype().__name__
    for name, out in zip(right_payload, out_right):
        if pa.types.is_integer(right_schema[name]):
            restore[out] = right_schema[name].to_pandas_dtype().__name__
    return union, left_payload, out_right, restore


def asof_join(left_ds, right_ds, by: str, on: str, right_suffix: str = "_r"):
    """Inner as-of join: left columns + the matching right payload
    (suffixed). Left rows with no prior right row are dropped."""
    union, left_payload, out_right, restore = _sides_union(
        left_ds, right_ds, by, on, right_suffix
    )
    out_columns = [by, on, *left_payload, *out_right]

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # SQL ASOF semantics: a null probe matches nothing and a null right
        # `on` is never a match target (NaN/NaT would also break
        # searchsorted's sortedness contract — NaN sorts last and shadows
        # real rows near the end)
        left_rows = group[(group["_side"] == 0) & group[on].notna()]
        # payload columns as tiebreakers: among right rows sharing the same
        # `on` value, searchsorted(side="right")-1 picks the LAST one, so the
        # sort must fix which row that is regardless of shuffle arrival order
        right_rows = group[
            (group["_side"] == 1) & group[on].notna()
        ].sort_values([on, *out_right])
        if left_rows.empty or right_rows.empty:
            frame = pd.DataFrame({c: group[c][0:0] for c in out_columns})
        else:
            # latest right.on <= left.on — vectorized over the whole group
            positions = np.searchsorted(
                right_rows[on].values, left_rows[on].values, side="right"
            ) - 1
            matched = positions >= 0
            kept = left_rows[matched]
            source = right_rows.iloc[positions[matched]]
            out = {c: kept[c].values for c in (by, on, *left_payload)}
            for name in out_right:
                out[name] = source[name].values
            frame = pd.DataFrame(out)
        return _restore_dtypes(frame, restore)

    return union.groupby(by).map_groups(merge, batch_format="pandas")


def range_join_count(left_ds, right_ds, by: str, on: str,
                     before, after, count_name: str = "n_in_range"):
    """Per left row: count of right rows with on in [left.on - before,
    left.on + after] within the group (before/after must be subtractable
    from the ``on`` dtype, e.g. np.timedelta64 for timestamps)."""
    union, left_payload, _, restore = _sides_union(left_ds, right_ds, by, on, "_r")
    out_columns = [by, on, *left_payload, count_name]
    restore = {k: v for k, v in restore.items() if k in out_columns}

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # null `on` values: a null probe emits no row, a null right `on`
        # counts in no window (same rationale as asof_join's merge)
        left_rows = group[(group["_side"] == 0) & group[on].notna()]
        right_rows = group[
            (group["_side"] == 1) & group[on].notna()
        ].sort_values(on)
        if left_rows.empty:
            frame = pd.DataFrame(
                {**{c: group[c][0:0] for c in out_columns[:-1]},
                 count_name: pd.Series([], dtype="int64")}
            )
        else:
            values = right_rows[on].values
            low = np.searchsorted(values, left_rows[on].values - before, side="left")
            high = np.searchsorted(values, left_rows[on].values + after, side="right")
            out = {c: left_rows[c].values for c in (by, on, *left_payload)}
            out[count_name] = (high - low).astype("int64")
            frame = pd.DataFrame(out)
        return _restore_dtypes(frame, restore)

    return union.groupby(by).map_groups(merge, batch_format="pandas")

def hash_join(left_ds, right_ds, key: str, num_buckets: int = 64,
              right_suffix: str = "_r", how: str = "inner"):
    """Distributed partitioned equijoin on ``key``.

    ``how`` selects SQL join semantics:

    * ``"inner"`` — left + right payload columns; unmatched rows dropped;
      null keys never match (both sides' null-key rows pruned at the tag).
    * ``"left"``  — left outer: every left row survives, unmatched right
      payload is null; left rows with a NULL key are kept (they match
      nothing) exactly like SQL ``LEFT JOIN``.
    * ``"semi"``  — ``WHERE EXISTS``: left rows with at least one right
      match, left columns only, each left row emitted at most once even
      when the right side has duplicate keys.
    * ``"anti"``  — ``WHERE NOT EXISTS``: left rows with no right match,
      left columns only; null-key left rows are kept (the EXISTS predicate
      can never be true for them).
    * ``"full"``  — full outer: every row of BOTH sides survives; unmatched
      payload on the other side is null; null-key rows of either side are
      kept unmatched, per SQL FULL JOIN.

    Deliberately NOT ray.data.Dataset.join: Ray 2.49's hash join emits empty
    partitions as zero-column blocks that poison schema-dependent downstream
    operators (see functions/dedup.py:_verified_pairs_ds for the original
    write-up).  Physical plan instead: tag each side with ``_side`` and
    ``_bucket = hash(key) % num_buckets``, union under one schema, ONE
    shuffle (groupby _bucket), then one Arrow-native (Acero) join per
    bucket — typed end-to-end (no pandas float widening; int64 ids above
    2**53 survive bit-exact).  100-TB shape: only the projected join
    columns move, parallelism is num_buckets, nothing touches the driver;
    for semi/anti the right side is projected down to DISTINCT keys per
    batch before the shuffle, so an arbitrarily wide right table ships
    key-sized rows only.  Right payload columns that collide with left
    names get ``right_suffix``.
    """
    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"unknown join mode {how!r}")
    left_schema = dict(zip(left_ds.schema().names, left_ds.schema().types))
    right_schema = dict(zip(right_ds.schema().names, right_ds.schema().types))
    left_payload = [n for n in left_schema if n != key]
    # semi/anti emit left columns only — the right side contributes bare keys
    right_payload = [] if how in ("semi", "anti") \
        else [n for n in right_schema if n != key]
    out_right = _suffixed_names(right_payload, left_schema,
                                {key, "_bucket", "_side"}, right_suffix)
    keep_null_left = how in ("left", "anti", "full")
    keep_null_right = how == "full"

    def bucket_of(column: pa.ChunkedArray) -> pa.Array:
        values = column.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(column, pa.ChunkedArray) \
            else column.to_numpy(zero_copy_only=False)
        hashed = pd.util.hash_array(np.asarray(values)) % num_buckets
        return pa.array(hashed.astype(np.int64), pa.int64())

    def tag_left(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def build(part: pa.Table, buckets: pa.Array) -> pa.Table:
            columns = {key: part.column(key), "_bucket": buckets,
                       "_side": pa.array([0] * part.num_rows, pa.int8())}
            for name in left_payload:
                columns[name] = part.column(name)
            for name, out in zip(right_payload, out_right):
                columns[out] = pa.nulls(part.num_rows, right_schema[name])
            return pa.table(columns)

        # split null keys out up front: they never match, and a null in the
        # batch would convert the key column to float64 whose hashes disagree
        # with the other side's int64 hashes (silently mis-bucketing every
        # key in the batch)
        valid = pc.is_valid(batch.column(key))
        nonnull = batch.filter(valid)
        parts = [build(nonnull, bucket_of(nonnull.column(key)))]
        if keep_null_left:
            # left/anti keep null-key left rows; they match nothing, so any
            # fixed bucket preserves them (the merge passes them through)
            nulls = batch.filter(pc.invert(valid))
            if nulls.num_rows:
                parts.append(
                    build(nulls, pa.array([0] * nulls.num_rows, pa.int64()))
                )
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    def tag_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        valid = pc.is_valid(batch.column(key))
        null_rows = batch.filter(pc.invert(valid)) if keep_null_right else None
        batch = batch.filter(valid)
        key_col = batch.column(key)
        if how in ("semi", "anti"):
            # existence is all that matters — distinct keys per batch bound
            # the shuffle at |distinct| regardless of right-side width/dups
            if isinstance(key_col, pa.ChunkedArray):
                key_col = key_col.combine_chunks()
            key_col = pc.unique(key_col)
            columns = {key: key_col, "_bucket": bucket_of(key_col),
                       "_side": pa.array([1] * len(key_col), pa.int8())}
            for name in left_payload:
                columns[name] = pa.nulls(len(key_col), left_schema[name])
            return pa.table(columns)

        def build(part: pa.Table, buckets: pa.Array) -> pa.Table:
            columns = {key: part.column(key), "_bucket": buckets,
                       "_side": pa.array([1] * part.num_rows, pa.int8())}
            for name in left_payload:
                columns[name] = pa.nulls(part.num_rows, left_schema[name])
            for name, out in zip(right_payload, out_right):
                columns[out] = part.column(name)
            return pa.table(columns)

        parts = [build(batch, bucket_of(key_col))]
        if null_rows is not None and null_rows.num_rows:
            # full outer keeps null-key right rows unmatched
            parts.append(
                build(null_rows, pa.array([0] * null_rows.num_rows, pa.int64()))
            )
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    union = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    out_columns = [key, *left_payload, *out_right]

    def merge(group: pa.Table) -> pa.Table:
        # Arrow-native per-bucket join (Acero): payloads keep their exact
        # types end-to-end (no pandas float64 widening — an int64 id above
        # 2**53 survives bit-exact), and null join keys never match,
        # matching SQL equijoin semantics for every mode.
        import pyarrow.compute as pc

        side = group.column("_side")
        left_rows = group.filter(pc.equal(side, 0)).select([key, *left_payload])

        def typed_empty() -> pa.Table:
            return pa.table(
                {name: pa.array([], group.schema.field(name).type) for name in out_columns}
            )

        if left_rows.num_rows == 0:
            if how == "full":
                # full outer with an empty left bucket: right rows survive
                # with null left payload (already padded in the union schema)
                right_only = group.filter(pc.equal(side, 1))
                return right_only.select(out_columns) if right_only.num_rows \
                    else typed_empty()
            return typed_empty()
        if how in ("semi", "anti"):
            right_keys = group.filter(pc.equal(side, 1)).select([key])
            if right_keys.num_rows == 0:
                return left_rows.select(out_columns) if how == "anti" \
                    else typed_empty()
            join_type = "left semi" if how == "semi" else "left anti"
            return left_rows.join(
                right_keys, keys=key, join_type=join_type
            ).select(out_columns)
        right_rows = group.filter(pc.equal(side, 1)).select([key, *out_right])
        if right_rows.num_rows == 0:
            if how == "inner":
                return typed_empty()
            # left outer against an empty bucket: left rows + null payload
            columns = {name: left_rows.column(name) for name in (key, *left_payload)}
            for name in out_right:
                columns[name] = pa.nulls(
                    left_rows.num_rows, group.schema.field(name).type
                )
            return pa.table(columns).select(out_columns)
        join_type = {"inner": "inner", "left": "left outer",
                     "full": "full outer"}[how]
        return left_rows.join(
            right_rows, keys=key, join_type=join_type
        ).select(out_columns)

    return union.groupby("_bucket").map_groups(merge, batch_format="pyarrow")
