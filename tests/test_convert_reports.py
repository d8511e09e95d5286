"""Round-4 continuation batch: WET reader round trip, the converter report
surfaces (unfound/favicon) and the host-graph fold — unit pins plus the
committed oracle SQL run side-by-side at sf0.001 (the same comparison the
driver's gate performs)."""

import duckdb
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# read_wet / wet_conversion_rows


def test_wet_conversion_rows_roundtrip():
    from mhtml_to_html_ray.sources.warc import (_wet_record,
                                                wet_conversion_rows)

    ts = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z
    rec = _wet_record("https://a.example/1", ts, "hello wet\nline2")
    rows = wet_conversion_rows(rec)
    assert rows == [
        {"url": "https://a.example/1", "wet_ts": ts, "text": "hello wet\nline2"}
    ]


def test_wet_conversion_rows_skips_warcinfo_and_replaces_bad_utf8():
    from mhtml_to_html_ray.sources.warc import wet_conversion_rows

    warcinfo = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\n"
        b"robots: x\r\n\r\n"
    )
    bad_payload = b"ok \xff\xfe end"
    conv = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://b.example/2\r\n"
        b"WARC-Date: 1970-01-01T00:00:01Z\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(bad_payload)}\r\n\r\n".encode()
        + bad_payload + b"\r\n\r\n"
    )
    rows = wet_conversion_rows(warcinfo + conv)
    assert len(rows) == 1
    assert rows[0]["url"] == "https://b.example/2"
    assert rows[0]["wet_ts"] == 1_000_000
    assert rows[0]["text"] == "ok �� end"


def test_read_wet_reads_write_wet_shards(ray_session, tmp_path):
    import glob

    import ray.data

    from mhtml_to_html_ray.sources.warc import read_wet, write_wet

    extracted = ray.data.from_arrow(pa.table({
        "url": pa.array([f"https://w.example/{i}" for i in range(6)]),
        "text_out": pa.array([f"text-{i}" for i in range(6)]),
        "warc_ts": pa.array([1_767_225_600_000_000 + i * 1_000_000
                             for i in range(6)], pa.int64()).cast(
                                 pa.timestamp("us")),
    }))
    out_dir = str(tmp_path / "wet")
    n = write_wet(extracted, out_dir, ts_col="warc_ts")
    assert n == 6
    wet = read_wet(sorted(glob.glob(f"{out_dir}/*.warc.wet.gz")))
    rows = sorted(wet.take_all(), key=lambda r: r["url"])
    assert [r["text"] for r in rows] == [f"text-{i}" for i in range(6)]
    # whole-second stamps round-trip exactly, pinned UTC
    import datetime as _dt

    assert rows[0]["wet_ts"] == _dt.datetime(2026, 1, 1, 0, 0, 0)
    assert rows[5]["wet_ts"] == _dt.datetime(2026, 1, 1, 0, 0, 5)


# ---------------------------------------------------------------------------
# the missing-resource lattice (unfound/favicon report kernels, no oracle)


def test_convert_report_lattice_kernel():
    from mhtml_to_html_ray.pipelines.queries import _convert_report_pages
    from mhtml_to_html_ray.stages.extract import ExtractBatch

    batch = pa.table({"doc_id": pa.array([0, 1, 2, 3, 12], pa.int64())})
    out = ExtractBatch(keep_html=False)(_convert_report_pages(batch))
    by_id = {
        int(out.column("url")[i].as_py().rsplit("/", 1)[1]): i
        for i in range(out.num_rows)
    }

    def unfound(d):
        return sorted(out.column("unfound_resources")[by_id[d]].as_py())

    p = "https://convert.fixture.invalid/"
    # d=0: fav missing (0%4), stylesheet missing (0%5) — children unreported
    assert unfound(0) == [f"{p}fav0.png", f"{p}style0.css"]
    # d=1: css url() target missing (odd), everything else present
    assert unfound(1) == [f"{p}img1.png"]
    # d=2: fully present
    assert unfound(2) == []
    # d=3: @import missing (3%3) AND url() missing (odd)
    assert unfound(3) == [f"{p}img3.png", f"{p}imp3.css"]
    # d=12: fav missing (12%4), @import missing (12%3)
    assert unfound(12) == [f"{p}fav12.png", f"{p}imp12.css"]

    # favicon surfaces: found → data URI + originalHref; missing → raw URL
    fav1 = out.column("favicons")[by_id[1]].as_py()[0]
    assert fav1["href"] == "data:image/png;base64,QkJCQg=="  # 'B'*4
    assert fav1["originalHref"] == f"{p}fav1.png"
    assert fav1["sizes"] is None and fav1["type"] is None
    fav0 = out.column("favicons")[by_id[0]].as_py()[0]
    assert fav0["href"] == f"{p}fav0.png"
    assert fav0["originalHref"] is None
    assert fav0["sizes"] == "16x16" and fav0["type"] == "image/png"

    # resources_count counts every parsed MIME part incl. the root
    res = {d: out.column("resources_count")[i].as_py() for d, i in by_id.items()}
    assert res == {0: 2, 1: 4, 2: 5, 3: 3, 12: 3}


# ---------------------------------------------------------------------------
# committed oracle SQL side-by-side (the driver gate's comparison)


@pytest.mark.parametrize(
    "name",
    ["wet_extract", "unfound_report", "favicon_report", "host_graph",
     "meta_extract", "script_gate_report", "srcset_report", "char_entropy",
     "base_href_links", "transfer_decode", "frame_report",
     "synth_index", "mhtml_recursion", "quality_ensemble",
     "sitemap_extract", "wat_roundtrip", "cdx_lookup", "host_pagerank",
     "extract_errors", "charset_bom_report", "sft_format", "span_corruption",
     "meta_robots_gate"],
)
def test_report_queries_match_oracle_sql(ray_session, name):
    from mhtml_to_html_ray.pipelines.queries import ORACLE_SQL, QUERIES

    out = QUERIES[name](SF_DIR)
    ray_df = out.to_pandas() if hasattr(out, "to_pandas") else out
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sql_df = con.execute(ORACLE_SQL[name]).df()
    cols = sorted(sql_df.columns)
    assert sorted(ray_df.columns) == cols
    ray_df = ray_df[cols].sort_values(cols).reset_index(drop=True)
    sql_df = sql_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(ray_df) == len(sql_df) and len(ray_df) > 0
    for col in cols:
        assert ray_df[col].tolist() == sql_df[col].tolist(), col


def test_host_graph_degree_conservation(ray_session):
    """Every page emits exactly two edges — the folded graph must conserve
    them (sum of counts == 2 × documents)."""
    import pyarrow.parquet as pq

    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["host_graph"](SF_DIR)
    rows = (out.take_all() if hasattr(out, "take_all")
            else out.to_dict("records"))
    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert sum(r["n_links"] for r in rows) == 2 * n_docs
    assert all(r["src_host"].endswith(".fixture.invalid") for r in rows)


# ---------------------------------------------------------------------------
# head_meta / char_entropy kernels


def test_head_meta_first_wins_and_entity_states():
    from mhtml_to_html_ray.functions.domstats import _head_meta
    from mhtml_to_html_ray.kernel.dom import parse_html

    doc = parse_html(
        "<html><head><title>A&#66;C</title><title>second</title>"
        '<meta name="description" content="D &amp; x">'
        '<meta name="description" content="later">'
        '<meta property="og:title" content="&ampx raw">'
        "</head><body></body></html>")
    title, desc, og, n = _head_meta(doc)
    assert title == "ABC"          # numeric entity in text state
    assert desc == "D & x"         # named entity in attribute-value state
    # &ampx in an attribute must NOT expand (WHATWG legacy no-expand rule)
    assert og == "&ampx raw"
    assert n == 3


def test_char_entropy_hand_computed():
    import math

    from mhtml_to_html_ray.functions.textstats import char_entropy_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["aab", "", "aaaa"]})
    out = char_entropy_batch(t).to_pydict()
    want_aab = 2 * math.floor(1e6 * -math.log(2 / 3)) \
        + 1 * math.floor(1e6 * -math.log(1 / 3))
    assert out["entropy_units"] == [want_aab, 0, 0]
    assert out["n_chars"] == [3, 0, 4]
    assert out["n_distinct"] == [2, 0, 1]


# ---------------------------------------------------------------------------
# base-aware hyperlink discovery (shared with the convert walk)


def test_discover_hyperlinks_honors_base_href():
    from mhtml_to_html_ray.frontier.discovery import discover_hyperlinks

    root = ('<html><head><base href="https://b.example/sub/dir/"></head>'
            '<body><a href="../up.html">1</a><a href="/root.html">2</a>'
            '<a href="#f">3</a></body></html>')
    blob = ("MIME-Version: 1.0\r\n"
            'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
            "------=_B\r\nContent-Type: text/html\r\n"
            "Content-Location: https://lh.fixture.invalid/1\r\n\r\n" + root +
            "\r\n------=_B--\r\n").encode()
    assert discover_hyperlinks(blob) == [
        "https://b.example/sub/up.html",
        "https://b.example/root.html",
        # browsers resolve fragment-only hrefs against <base> too
        "https://b.example/sub/dir/#f",
    ]


def test_discover_hyperlinks_without_base_uses_content_location():
    from mhtml_to_html_ray.frontier.discovery import discover_hyperlinks

    blob = ("MIME-Version: 1.0\r\n"
            'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
            "------=_B\r\nContent-Type: text/html\r\n"
            "Content-Location: https://lh.fixture.invalid/a/1\r\n\r\n"
            '<html><body><a href="../up.html">1</a></body></html>'
            "\r\n------=_B--\r\n").encode()
    assert discover_hyperlinks(blob) == ["https://lh.fixture.invalid/up.html"]


def test_wat_roundtrip_utc_and_idempotent(ray_session, tmp_path, monkeypatch):
    """WAT shards: deterministic names (rerun-idempotent), UTC stamps even
    on a non-UTC host (the write_wet ADVICE fix applies here too)."""
    import glob
    import os
    import time

    import ray.data

    from mhtml_to_html_ray.pipelines.flagship import wrap_mhtml
    from mhtml_to_html_ray.sources.warc import read_wat, write_wat

    monkeypatch.setenv("TZ", "America/New_York")
    time.tzset()
    try:
        body = ('<html><head><title>w</title></head><body>'
                '<a href="https://t.example/x">x</a></body></html>')
        pages = ray.data.from_arrow(pa.table({
            "url": pa.array(["https://docs.fixture.invalid/3"]),
            "warc_ts": pa.array([1_767_225_600_000_000], pa.int64()).cast(
                pa.timestamp("us")),
            "html": pa.array([wrap_mhtml(3, body)], pa.binary()),
        }))
        out_dir = str(tmp_path / "wat")
        assert write_wat(pages, out_dir, ts_col="warc_ts") == 1
        first = sorted(os.listdir(out_dir))
        assert write_wat(pages, out_dir, ts_col="warc_ts") == 1
        assert sorted(os.listdir(out_dir)) == first  # same content-hash name

        rows = read_wat(sorted(glob.glob(f"{out_dir}/*.warc.wat.gz"))).take_all()
        assert len(rows) == 1
        import datetime as _dt

        assert rows[0]["wat_ts"] == _dt.datetime(2026, 1, 1, 0, 0, 0)
        assert rows[0]["title"] == "w"
        assert rows[0]["links"] == "https://t.example/x"
    finally:
        monkeypatch.delenv("TZ", raising=False)
        time.tzset()


def test_first_base_without_href_is_reference_parity():
    """convert.js:265-269 takes getElementsByTagName('base')[0] even when
    it has no href — a leading href-less <base> leaves the document base
    unchanged (WHATWG would use the first base WITH an href; the deviation
    is deliberate parity, shared by discovery and the convert walk)."""
    from mhtml_to_html_ray.frontier.discovery import discover_hyperlinks

    root = ('<html><head><base target="_b">'
            '<base href="https://b.example/s/"></head>'
            '<body><a href="x.html">x</a></body></html>')
    blob = ("MIME-Version: 1.0\r\n"
            'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
            "------=_B\r\nContent-Type: text/html\r\n"
            "Content-Location: https://lh.fixture.invalid/a/1\r\n\r\n" + root +
            "\r\n------=_B--\r\n").encode()
    assert discover_hyperlinks(blob) == ["https://lh.fixture.invalid/a/x.html"]


def test_cdx_shard_bisect_seeks_not_scans(tmp_path):
    """_shard_bisect_lines: correct first/middle/last/absent lookups via
    offset bisection over a multi-thousand-line shard."""
    from mhtml_to_html_ray.sources.warc import _shard_bisect_lines

    lines = []
    for i in range(5000):
        key = f"key{i:06d}"
        reps = 3 if i % 1000 == 0 else 1  # some keys carry several captures
        for j in range(reps):
            lines.append(f"{key} {j:020d} {{\"url\":\"u{i}\"}}")
    path = tmp_path / "shard.cdxj"
    path.write_bytes(("\n".join(lines) + "\n").encode())

    assert len(_shard_bisect_lines(str(path), b"key000000")) == 3
    assert len(_shard_bisect_lines(str(path), b"key002500")) == 1
    assert len(_shard_bisect_lines(str(path), b"key004999")) == 1
    assert _shard_bisect_lines(str(path), b"key999999") == []
    assert _shard_bisect_lines(str(path), b"aaa") == []
    got = _shard_bisect_lines(str(path), b"key001000")
    assert [g.split(b" ")[1] for g in got] == [
        b"0" * 19 + b"0", b"0" * 19 + b"1", b"0" * 18 + b"02"]
