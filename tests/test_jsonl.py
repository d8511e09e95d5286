"""JSONL sink/source (sources/jsonl.py): round trip, rerun idempotence,
deterministic shard naming."""

import gzip
import json
import os

import pyarrow as pa
import pytest

from mhtml_to_html_ray.sources import jsonl


def _docs(ray, parts=2):
    t = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"doc {i} — naïve café" for i in range(20)],
                         pa.string()),
        "ts": pa.array([1_767_225_600_000_000 + i for i in range(20)],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    return ray.data.from_arrow(t).repartition(parts)


def test_write_read_round_trip(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "shards")
    n = jsonl.write_jsonl(_docs(ray), out)
    assert n == 20
    shards = sorted(os.listdir(out))
    assert shards and all(s.endswith(".jsonl.gz") for s in shards)
    back = jsonl.read_jsonl(out)
    rows = sorted(back.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == list(range(20))
    assert rows[3]["text"] == "doc 3 — naïve café"
    # timestamps serialized as epoch micros (UTC-pinned)
    assert rows[0]["ts"] == 1_767_225_600_000_000


def test_rerun_is_idempotent(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "shards")
    jsonl.write_jsonl(_docs(ray), out)
    first = {s: os.path.getmtime(os.path.join(out, s))
             for s in os.listdir(out)}
    n = jsonl.write_jsonl(_docs(ray), out)
    assert n == 20
    second = {s: os.path.getmtime(os.path.join(out, s))
              for s in os.listdir(out)}
    # same shard names, none rewritten
    assert first == second


def test_shard_bytes_are_deterministic(ray_session, tmp_path):
    import ray

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    jsonl.write_jsonl(_docs(ray), a)
    jsonl.write_jsonl(_docs(ray), b)
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))
    for name in os.listdir(a):
        with open(os.path.join(a, name), "rb") as fa, \
             open(os.path.join(b, name), "rb") as fb:
            assert fa.read() == fb.read()


def test_nan_rejected_and_binary_b64(ray_session, tmp_path):
    import ray

    out = str(tmp_path / "bin")
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "payload": pa.array([b"\x00\xff"], pa.binary())})
    jsonl.write_jsonl(ray.data.from_arrow(t), out, compress=False)
    name = os.listdir(out)[0]
    row = json.loads(open(os.path.join(out, name)).read())
    assert row["payload"] == "AP8="  # base64 of b"\x00\xff"

    bad = pa.table({"v": pa.array([float("nan")], pa.float64())})
    with pytest.raises(Exception, match="[Nn]a[Nn]|allow_nan|not allowed"):
        jsonl.write_jsonl(ray.data.from_arrow(bad),
                          str(tmp_path / "nan"), compress=False)
