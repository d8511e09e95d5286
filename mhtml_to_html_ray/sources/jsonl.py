"""JSONL source + sink — the interchange format LLM training pipelines
standardize on (one JSON object per line, gzip-shard friendly).

The reference writes one .html per input (mod.js per-file outputs); the
engine's tabular sinks are partitioned Parquet (run.py), WET shards
(sources/warc.py write_wet) and — here — sharded JSONL with the same two
disciplines the other sinks follow:

* **rerun-idempotent shard names**: each input block serializes to bytes
  once and the shard file is named by the content hash of those bytes, so
  a re-run (or a retried task) re-derives the same name and skips the
  write instead of duplicating data — resumability without a manifest.
* **no driver accumulation**: blocks write themselves inside
  ``map_batches``; only per-shard counts flow back.

Serialization is deterministic: keys in column order, ``ensure_ascii``
off (UTF-8 bytes), compact separators, NaN rejected (JSON has no NaN) —
so the same block always produces the same bytes and therefore the same
shard name. Timestamps render as epoch microseconds.
"""

from __future__ import annotations

import pyarrow as pa


def _json_default(value):
    import datetime

    if isinstance(value, datetime.datetime):
        if value.tzinfo is None:
            # Arrow timestamp('us') round-trips tz-naive but STORES UTC
            # (the write_wet lesson): pin to UTC before epoch conversion
            value = value.replace(tzinfo=datetime.timezone.utc)
        return int(value.timestamp() * 1_000_000)
    if isinstance(value, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(value)).decode("ascii")
    raise TypeError(f"jsonl: unserializable type {type(value).__name__}")


def write_jsonl(ds, output_dir: str, compress: bool = True) -> int:
    """Write a Dataset as content-hash-named JSONL shards (one per input
    block). Returns the number of rows written. Rerun-idempotent; see
    module docstring."""
    import gzip
    import hashlib
    import json
    import os

    os.makedirs(output_dir, exist_ok=True)
    suffix = ".jsonl.gz" if compress else ".jsonl"

    def write_block(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        if not rows:
            return pa.table({"n": pa.array([0], pa.int64())})
        lines = [
            json.dumps(row, ensure_ascii=False, allow_nan=False,
                       separators=(",", ":"), default=_json_default)
            for row in rows
        ]
        blob = ("\n".join(lines) + "\n").encode("utf-8")
        if compress:
            blob = gzip.compress(blob, mtime=0)
        name = hashlib.sha1(blob).hexdigest()[:16] + suffix
        path = os.path.join(output_dir, name)
        if not os.path.exists(path):  # rerun-idempotent
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as handle:
                handle.write(blob)
            os.replace(tmp, path)
        return pa.table({"n": pa.array([len(rows)], pa.int64())})

    counts = ds.map_batches(write_block, batch_format="pyarrow")
    return sum(row["n"] for row in counts.take_all())


def read_jsonl(paths, **kwargs):
    """JSONL/JSONL.gz shards → Dataset. Ray's native JSON reader handles
    line-delimited JSON and gzip transparently via Arrow."""
    import ray.data

    return ray.data.read_json(paths, **kwargs)
