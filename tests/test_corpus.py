"""Corpus-style conformance (reference test/corpus.test.js): content-
independent invariants over the whole fixture corpus, idempotence on a
sample, snapshot-hash regression, plus the CLI's resumable partitioned
output."""

import hashlib
import json
import os
import re

import pytest

from mhtml_to_html_ray.kernel.convert import ConvertError, convert
from mhtml_to_html_ray.sources.fixtures import build_cases, corpus_pages_table

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "snapshots.json")


def _convert_ok(html_bytes):
    try:
        return convert(html_bytes)
    except ConvertError:
        return None


def assert_invariants(data: str):
    # test/corpus.test.js:103-116: html element present, no internal marker,
    # no undefined data URI, no stale charset meta
    assert re.search(r"<html", data, re.I), "no html element"
    assert "--mhtml-to-html-url" not in data, "internal marker leaked"
    assert "data:undefined" not in data and "data:None" not in data, "broken data URI"
    # allow both raw and srcdoc-escaped (&quot;) attribute quoting
    assert not re.search(
        r'<meta[^>]*charset=(?!("|&quot;)?utf-8)', data, re.I
    ), "stale charset meta survived"


def test_corpus_invariants_hold():
    for case in build_cases():
        result = _convert_ok(case.html)
        if case.expect_error:
            assert result is None, f"{case.family}/{case.case} should have been rejected"
            continue
        assert result is not None, f"{case.family}/{case.case} was rejected"
        assert_invariants(result.data)


def test_conversion_idempotent_on_sample():
    # converting the converted page again must not change it (modulo the
    # injected head content appearing once more is NOT allowed)
    sample = [case for case in build_cases() if not case.expect_error][:5]
    for case in sample:
        first = convert(case.html).data
        second = convert(first.encode("utf-8")).data
        # the second pass re-injects nothing destructive: script text must
        # not be double-escaped and markers must not stack
        assert "<\\\\/" not in second, f"double escaping in {case.family}/{case.case}"
        assert second.count('<meta charset="utf-8">') <= first.count('<meta charset="utf-8">') + 1


def test_snapshot_hashes_stable():
    """SHA-256 per fixture output, recorded once (UPDATE_SNAPSHOTS=1) and
    compared forever after — the regression net for serializer changes."""
    hashes = {}
    for case in build_cases():
        result = _convert_ok(case.html)
        key = f"{case.family}/{case.case}"
        hashes[key] = (
            hashlib.sha256(result.data.encode("utf-8")).hexdigest() if result else "ERROR"
        )
    if os.environ.get("UPDATE_SNAPSHOTS") == "1" or not os.path.exists(SNAPSHOT_PATH):
        with open(SNAPSHOT_PATH, "w") as handle:
            json.dump(hashes, handle, indent=2, sort_keys=True)
        pytest.skip("snapshots recorded")
    with open(SNAPSHOT_PATH) as handle:
        recorded = json.load(handle)
    assert hashes == recorded, "converted output changed vs recorded snapshots"


def test_corpus_table_determinism():
    a = corpus_pages_table(200, n_hosts=8, seed=42)
    b = corpus_pages_table(200, n_hosts=8, seed=42)
    assert a.equals(b), "corpus generation is not deterministic"
    c = corpus_pages_table(200, n_hosts=8, seed=7)
    assert not a.equals(c), "seed has no effect"


def test_cli_extract_resumable(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mhtml_to_html_ray.run import main
    from mhtml_to_html_ray.sources.fixtures import pages_table

    inputs = []
    table = pages_table()
    half = table.num_rows // 2
    for index, piece in enumerate((table.slice(0, half), table.slice(half))):
        path = str(tmp_path / f"pages_{index}.parquet")
        pq.write_table(piece, path)
        inputs.append(path)
    out_dir = str(tmp_path / "out")

    assert main(["extract", "--input", *inputs, "--output", out_dir, "--no-html"]) == 0
    # partition names derive from the input path (stem + path hash), not the
    # list position — resume must survive input-set changes
    parts = sorted(
        name for name in os.listdir(out_dir)
        if os.path.exists(os.path.join(out_dir, name, "_SUCCESS"))
    )
    assert len(parts) == 2
    assert parts[0].startswith("part_pages_0_") and parts[1].startswith("part_pages_1_")

    # second run skips everything
    import io
    from contextlib import redirect_stdout

    buffer = io.StringIO()
    with redirect_stdout(buffer):
        assert main(["extract", "--input", *inputs, "--output", out_dir, "--no-html"]) == 0
    summary = json.loads(buffer.getvalue().strip().splitlines()[-1])
    assert summary["partitions_skipped"] == 2
    assert summary["partitions_done"] == 0

    # adding a NEW input leaves the finished partitions skipped and converts
    # only the new file (index-keyed naming would have remapped markers)
    extra = str(tmp_path / "pages_0b.parquet")
    pq.write_table(table.slice(0, 3), extra)
    buffer = io.StringIO()
    with redirect_stdout(buffer):
        assert main(["extract", "--input", inputs[0], extra, inputs[1],
                     "--output", out_dir, "--no-html"]) == 0
    summary = json.loads(buffer.getvalue().strip().splitlines()[-1])
    assert summary["partitions_skipped"] == 2
    assert summary["partitions_done"] == 1


def test_cli_crawl_checkpoint(ray_session, tmp_path):
    from mhtml_to_html_ray.run import main

    routes = {
        "https://cli.example/": {
            "content_type": "text/html",
            "body": '<html><body><a href="/next">n</a></body></html>',
        },
        "https://cli.example/next": {
            "content_type": "text/html",
            "body": "<html><body>end</body></html>",
        },
    }
    seeds_path = str(tmp_path / "seeds.txt")
    routes_path = str(tmp_path / "routes.json")
    with open(seeds_path, "w") as handle:
        handle.write("https://cli.example/\n")
    with open(routes_path, "w") as handle:
        json.dump(routes, handle)

    import io
    from contextlib import redirect_stdout

    buffer = io.StringIO()
    with redirect_stdout(buffer):
        assert main([
            "crawl", "--seeds", seeds_path, "--routes", routes_path,
            "--discovery", "hyperlinks", "--checkpoint", str(tmp_path / "ck"),
        ]) == 0
    summary = json.loads(buffer.getvalue().strip().splitlines()[-1])
    assert summary["urls_fetched"] == 2
    assert summary["seen"] == 2
    assert os.path.exists(str(tmp_path / "ck" / "wave_00000" / "_COMPLETE"))


def test_cli_convert_files(ray_session, tmp_path):
    """The reference CLI's own job (mod.js:46-75): .mht in, .html out,
    per-file errors logged without failing the run, forced .html suffix."""
    import io
    from contextlib import redirect_stdout

    from mhtml_to_html_ray.run import main

    good = tmp_path / "page.mht"
    good.write_bytes(
        b"MIME-Version: 1.0\r\n"
        b'Content-Type: multipart/related; boundary="----=_B"\r\n\r\n'
        b"------=_B\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Location: https://cf.example/\r\n\r\n"
        b"<html><head><title>CF</title></head><body><p>FILECONV</p></body></html>\r\n"
        b"------=_B--\r\n"
    )
    bad = tmp_path / "broken.mht"
    bad.write_bytes(b"\x00\x05\x16\x07 rubbish")

    buffer = io.StringIO()
    with redirect_stdout(buffer):
        assert main(["convert-files", str(good), str(bad)]) == 0
    summary = json.loads(buffer.getvalue().strip().splitlines()[-1])
    assert summary == {"converted": 1, "failed": 1}
    output = (tmp_path / "page.html").read_text(encoding="utf-8")
    assert "FILECONV" in output and '<meta charset="utf-8">' in output
    assert not (tmp_path / "broken.html").exists()

    # single input honors --output as the target file
    target = tmp_path / "custom.html"
    buffer = io.StringIO()
    with redirect_stdout(buffer):
        assert main(["convert-files", str(good), "--output", str(target)]) == 0
    assert "FILECONV" in target.read_text(encoding="utf-8")


def test_cli_convert_files_empty_usage(ray_session, capsys):
    from mhtml_to_html_ray.run import main

    assert main(["convert-files"]) == 1
    captured = capsys.readouterr()
    assert "usage" in captured.err
