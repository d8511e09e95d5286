"""WARC source: record walking, HTTP envelope stripping, gzip members,
and the Ray read path feeding the extraction stage end-to-end."""

import gzip

import pyarrow as pa
import pytest

from mhtml_to_html_ray.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_response_rows,
)


def _record(record_type, url=None, payload=b"", date="2026-01-02T03:04:05Z",
            extra=()):
    headers = [f"WARC-Type: {record_type}", f"WARC-Date: {date}"]
    if url:
        headers.append(f"WARC-Target-URI: {url}")
    headers.extend(extra)
    head = "WARC/1.0\r\n" + "\r\n".join(headers) + \
        f"\r\nContent-Length: {len(payload)}\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def _http(body: bytes, extra_headers=b"") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + extra_headers
            + b"\r\n" + body)


def _warc_bytes():
    return b"".join([
        _record("warcinfo", payload=b"software: test\r\n"),
        _record("request", url="https://w.example/a",
                payload=b"GET /a HTTP/1.1\r\n\r\n"),
        _record("response", url="https://w.example/a",
                payload=_http(b"<html>alpha</html>")),
        _record("resource", url="https://w.example/raw",
                payload=b"<html>raw resource</html>",
                date="2026-01-02T03:04:05.123456Z"),
        _record("response", url="https://w.example/chunked",
                payload=_http(b"7\r\n<html>c\r\n9\r\n</html>xx\r\n0\r\n\r\n",
                              extra_headers=b"Transfer-Encoding: chunked\r\n")),
    ])


def test_warc_record_walk_and_response_rows():
    data = _warc_bytes()
    records = list(parse_warc_records(data))
    assert [h["warc-type"] for h, _ in records] == [
        "warcinfo", "request", "response", "resource", "response"]

    rows = warc_response_rows(data)
    assert [r["url"] for r in rows] == [
        "https://w.example/a", "https://w.example/raw",
        "https://w.example/chunked"]
    assert rows[0]["html"] == b"<html>alpha</html>"
    assert rows[1]["html"] == b"<html>raw resource</html>"
    # chunked body de-chunked, trailing chunk dropped
    assert rows[2]["html"] == b"<html>c</html>xx"
    # WARC-Date with and without fractional seconds
    assert rows[0]["warc_ts"] == 1767323045000000
    assert rows[1]["warc_ts"] == 1767323045123456


def test_warc_gzip_members_and_truncation():
    # the .warc.gz convention: each record its own gzip member
    data = _warc_bytes()
    members = b"".join(
        gzip.compress(_record("response", url=f"https://w.example/{i}",
                              payload=_http(f"<p>{i}</p>".encode())))
        for i in range(3)
    )
    rows = warc_response_rows(members)
    assert [r["html"] for r in rows] == [b"<p>0</p>", b"<p>1</p>", b"<p>2</p>"]

    # a truncated final record yields the complete prefix, never raises
    cut = data[: len(data) - 30]
    assert len(warc_response_rows(cut)) <= 3
    assert warc_response_rows(data[:10]) == []
    assert warc_response_rows(b"") == []


def test_read_warc_feeds_extraction(ray_session, tmp_path):
    """read_warc → input_hint schema → ExtractBatch end-to-end: the WARC
    payloads are real MHTML from the fixture builder, so the kernel's
    extracted titles come back through the Ray path."""
    from mhtml_to_html_ray.sources.fixtures import pages_table
    from mhtml_to_html_ray.stages.extract import ExtractBatch

    fixture = pages_table().slice(0, 4)
    records = []
    for i in range(fixture.num_rows):
        records.append(_record(
            "response", url=fixture.column("url")[i].as_py(),
            payload=_http(fixture.column("html")[i].as_py())))
    path = tmp_path / "shard-00000.warc"
    path.write_bytes(b"".join(records))

    ds = read_warc([str(path)])
    assert ds.schema().names == ["url", "warc_ts", "html", "text", "lang"]
    out = ds.map_batches(ExtractBatch, fn_constructor_kwargs={"keep_html": False},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=1).take_all()
    assert len(out) == 4
    by_url = {row["url"]: row for row in out}
    assert set(by_url) == set(fixture.column("url").to_pylist())
    for row in out:
        assert row["error"] is None
        assert row["text_out"]


def test_warc_http_payload_edge_cases():
    # no HTTP envelope separator → empty body; non-HTTP payload passes raw
    assert warc_response_rows(_record(
        "response", url="https://w.example/x",
        payload=b"HTTP/1.1 200 OK\r\nno-terminator"))[0]["html"] == b""
    bad_date = warc_response_rows(_record(
        "response", url="https://w.example/y", payload=_http(b"z"),
        date="not-a-date"))
    assert bad_date[0]["warc_ts"] is None


def test_write_wet_roundtrip(ray_session, tmp_path):
    """Extraction output → WET shards → parse back: conversion records
    round-trip url/date/text; shards are deterministic and rerun-idempotent;
    gzip members concatenate."""
    import glob

    import ray.data

    from mhtml_to_html_ray.sources.warc import write_wet

    extracted = ray.data.from_arrow(pa.table({
        "url": pa.array([f"https://w.example/{i}" for i in range(5)],
                        pa.string()),
        "text_out": pa.array(["alpha text", "beta", None, "delta", "épsilon"],
                             pa.string()),
    }))
    out_dir = tmp_path / "wet"
    n = write_wet(extracted, str(out_dir))
    assert n == 4  # the null text row is skipped

    shards = sorted(glob.glob(str(out_dir / "*.warc.wet.gz")))
    assert shards
    records = []
    for shard in shards:
        with open(shard, "rb") as handle:
            records.extend(parse_warc_records(handle.read()))
    assert len(records) == 4
    by_url = {h["warc-target-uri"]: p for h, p in records}
    assert by_url["https://w.example/0"] == b"alpha text"
    assert by_url["https://w.example/4"] == "épsilon".encode()
    for headers, _ in records:
        assert headers["warc-type"] == "conversion"
        assert headers["content-type"] == "text/plain"

    # rerun writes nothing new (same content hashes)
    before = {s: open(s, "rb").read() for s in shards}
    assert write_wet(extracted, str(out_dir)) == 4
    after = sorted(glob.glob(str(out_dir / "*.warc.wet.gz")))
    assert after == shards
    for shard in shards:
        assert open(shard, "rb").read() == before[shard]


def test_warc_content_encoding_gzip_and_deflate():
    """Common Crawl response records preserve Content-Encoding as delivered
    (ADVICE round 3): gzip, zlib-wrapped and raw deflate bodies all
    decompress; a corrupt stream falls back to the raw bytes."""
    import zlib

    body = b"<html>compressed alpha</html>"
    gz = warc_response_rows(_record(
        "response", url="https://w.example/gz",
        payload=_http(gzip.compress(body),
                      extra_headers=b"Content-Encoding: gzip\r\n")))
    assert gz[0]["html"] == body
    zl = warc_response_rows(_record(
        "response", url="https://w.example/zl",
        payload=_http(zlib.compress(body),
                      extra_headers=b"Content-Encoding: deflate\r\n")))
    assert zl[0]["html"] == body
    raw = warc_response_rows(_record(
        "response", url="https://w.example/raw-deflate",
        payload=_http(zlib.compress(body)[2:-4],
                      extra_headers=b"Content-Encoding: deflate\r\n")))
    assert raw[0]["html"] == body
    corrupt = warc_response_rows(_record(
        "response", url="https://w.example/corrupt",
        payload=_http(b"\x00not-gzip",
                      extra_headers=b"Content-Encoding: gzip\r\n")))
    assert corrupt[0]["html"] == b"\x00not-gzip"


def test_write_wet_ts_col_utc_and_mandatory_headers(ray_session, tmp_path, monkeypatch):
    """ts_col datetimes (Arrow timestamp('us') → tz-naive UTC) must emit the
    UTC WARC-Date regardless of the host timezone (ADVICE round 3), and
    every record carries the ISO 28500-mandatory WARC-Record-ID plus a
    WARC-Block-Digest — deterministically (same record → same id)."""
    import glob
    import os
    import time

    import ray.data

    from mhtml_to_html_ray.sources.warc import write_wet

    monkeypatch.setenv("TZ", "America/New_York")  # UTC-5: would shift a naive stamp
    time.tzset()
    try:
        extracted = ray.data.from_arrow(pa.table({
            "url": pa.array(["https://w.example/t"], pa.string()),
            "text_out": pa.array(["stamped text"], pa.string()),
            "warc_ts": pa.array([1767323045000000], pa.timestamp("us")),
        }))
        out_dir = tmp_path / "wet-ts"
        assert write_wet(extracted, str(out_dir), ts_col="warc_ts") == 1
        shard = glob.glob(str(out_dir / "*.warc.wet.gz"))[0]
        with open(shard, "rb") as handle:
            (headers, payload), = parse_warc_records(handle.read())
        # 1767323045 epoch-s == 2026-01-02T03:04:05Z exactly
        assert headers["warc-date"] == "2026-01-02T03:04:05Z"
        assert headers["warc-record-id"].startswith("<urn:uuid:")
        assert headers["warc-block-digest"].startswith("sha1:")
        first_name = os.path.basename(shard)
        # determinism: a fresh write of the same rows produces the same shard
        out_dir2 = tmp_path / "wet-ts-2"
        assert write_wet(extracted, str(out_dir2), ts_col="warc_ts") == 1
        assert os.path.basename(
            glob.glob(str(out_dir2 / "*.warc.wet.gz"))[0]) == first_name
    finally:
        monkeypatch.delenv("TZ", raising=False)
        time.tzset()


# ---------------------------------------------------------------------------
# SURT + CDX capture index


def test_surt_key_forms():
    from mhtml_to_html_ray.frontier.canon import surt_key

    assert surt_key("https://news.example.com/a/b?q=1#frag") == \
        "com,example,news)/a/b?q=1"          # host reversed, fragment drops
    assert surt_key("http://EXAMPLE.com./x") == "com,example)/x"  # case+FQDN dot
    assert surt_key("https://example.com") == "com,example)/"     # bare host
    assert surt_key("https://example.com:8080/p") == "com,example:8080)/p"
    assert surt_key("https://example.com:443/x") == "com,example)/x"  # default port
    assert surt_key("https://user:pw@example.com/z") == "com,example)/z"
    assert surt_key("http://[2001:db8::1]:8080/v6") == "[2001:db8::1]:8080)/v6"
    assert surt_key("not a url") == ""
    assert surt_key("b.html", base="https://example.com/a/") == \
        "com,example)/a/b.html"              # relative resolution via base


def test_cdx_index_sorted_digests(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.sources.warc import cdx_index

    pages = ray.data.from_arrow(pa.table({
        "url": ["https://b.test/x", "https://a.test/y", "https://a.test/y",
                "", "https://a.test/z"],
        "ts": pa.array([5, 2, 1, 0, 3], pa.int64()),
        "html": ["xx", "yy", "yy", "", "é"],  # é: 2 utf-8 bytes
    }))
    rows = cdx_index(pages, ts_col="ts").take_all()
    # globally sorted by (surt, ts); hostless row first with surt=""
    assert [(r["surt"], r["ts"]) for r in rows] == [
        ("", 0),
        ("test,a)/y", 1), ("test,a)/y", 2), ("test,a)/z", 3),
        ("test,b)/x", 5),
    ]
    by = {(r["surt"], r["ts"]): r for r in rows}
    assert by[("test,a)/y", 1)]["digest"] == hashlib.md5(b"yy").hexdigest()
    # same payload → same digest (the replay-dedup property)
    assert by[("test,a)/y", 1)]["digest"] == by[("test,a)/y", 2)]["digest"]
    assert by[("test,a)/z", 3)]["n_bytes"] == 2  # utf-8 bytes, not chars
    assert by[("", 0)]["n_bytes"] == 0


def test_cdx_dedup_stats(ray_session):
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.sources.warc import cdx_dedup_stats

    cdx = ray.data.from_arrow(pa.table({
        "surt": ["a)/", "a)/", "a)/", "b)/"],
        "ts": pa.array([1, 2, 3, 9], pa.int64()),
        "digest": ["d1", "d1", "d2", "d3"],  # a)/ has 2 distinct versions
    }))
    rows = sorted(cdx_dedup_stats(cdx).take_all(), key=lambda r: r["surt"])
    assert [(r["surt"], r["n_captures"], r["n_versions"], r["last_ts"])
            for r in rows] == [("a)/", 3, 2, 3), ("b)/", 1, 1, 9)]


def test_write_cdx_two_level_index_and_idempotence(ray_session, tmp_path):
    import json
    import os

    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.sources.warc import cdx_index, write_cdx

    pages = ray.data.from_arrow(pa.table({
        "url": [f"https://h{i % 3}.test/p{i}" for i in range(30)],
        "ts": pa.array(list(range(30)), pa.int64()),
        "html": [f"body{i}" for i in range(30)],
    }))
    out = str(tmp_path / "cdx")
    index = write_cdx(cdx_index(pages, ts_col="ts"), out)
    # secondary index covers every capture, in key order
    assert sum(s["n"] for s in index) == 30
    firsts = [s["first_key"] for s in index]
    assert firsts == sorted(firsts)
    # shards: lines sorted within each shard, ts zero-padded to 14
    shard_files = [f for f in os.listdir(out) if f.endswith(".cdxj")]
    assert set(shard_files) == {s["shard"] for s in index}
    for shard in index:
        with open(os.path.join(out, shard["shard"])) as fh:
            lines = fh.read().splitlines()
        assert lines == sorted(lines)
        assert len(lines) == shard["n"]
        key, ts20, meta = lines[0].split(" ", 2)
        assert key == shard["first_key"] and len(ts20) == 20
        assert set(json.loads(meta)) == {"url", "digest", "length"}
    # rerun-idempotent: same shards, no duplicates, same secondary index
    again = write_cdx(cdx_index(pages, ts_col="ts"), out)
    assert again == index
    assert sorted(os.listdir(out)) == sorted(shard_files + ["_index.json"])


def test_write_warc_read_warc_roundtrip(ray_session, tmp_path):
    """The write half inverts the read half: url, warc_ts and payload
    bytes round-trip through gzip-member response records; re-running the
    writer adds no duplicate shards."""
    import os

    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.sources.warc import read_warc, write_warc

    pages = ray.data.from_arrow(pa.table({
        "url": [f"https://rt.test/p{i}" for i in range(5)],
        "warc_ts": pa.array([1_700_000_000_000_000 + i for i in range(5)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": [f"<html><body>b{i}</body></html>".encode() for i in range(5)],
    }))
    out = str(tmp_path / "warc")
    assert write_warc(pages, out, ts_col="warc_ts") == 5
    shards = sorted(os.listdir(out))
    rows = sorted(read_warc([os.path.join(out, s) for s in shards])
                  .take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [f"https://rt.test/p{i}"
                                        for i in range(5)]
    assert [bytes(r["html"]) for r in rows] == \
        [f"<html><body>b{i}</body></html>".encode() for i in range(5)]
    import datetime
    for i, r in enumerate(rows):
        ts = r["warc_ts"]
        if isinstance(ts, datetime.datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=datetime.timezone.utc)
            ts = int(ts.timestamp() * 1_000_000)
        # WARC-Date has second precision: µs truncate to the second
        assert ts == (1_700_000_000_000_000 + i) // 1_000_000 * 1_000_000
    # rerun-idempotent
    assert write_warc(pages, out, ts_col="warc_ts") == 5
    assert sorted(os.listdir(out)) == shards


def test_write_cdx_wide_ts_keeps_lexicographic_order(ray_session, tmp_path):
    """Timestamps spanning digit-count boundaries (15 vs 16 digits — real
    epoch-µs capture times) must still sort lexicographically; negative
    stamps clamp to zero."""
    import os

    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.sources.warc import cdx_index, write_cdx

    pages = ray.data.from_arrow(pa.table({
        "url": ["https://o.test/a"] * 3,
        "ts": pa.array([-5, 999_999_999_999_999, 1_000_000_000_000_000],
                       pa.int64()),
        "html": ["x", "y", "z"],
    }))
    out = str(tmp_path / "cdx")
    index = write_cdx(cdx_index(pages, ts_col="ts"), out)
    lines = []
    for shard in index:
        with open(os.path.join(out, shard["shard"])) as fh:
            lines += fh.read().splitlines()
    assert lines == sorted(lines)
    stamps = [line.split(" ", 2)[1] for line in sorted(lines)]
    assert stamps == ["0" * 20, f"{999_999_999_999_999:020d}",
                      f"{10 ** 15:020d}"]
