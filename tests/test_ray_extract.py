"""Ray Data extraction stage end-to-end (fixture corpus + flagship)."""

import pyarrow as pa
import pytest

from mhtml_to_html_ray.sources.fixtures import build_cases, case_url, pages_table
from mhtml_to_html_ray.stages.extract import ExtractBatch


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    import ray.data

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    import pyarrow.parquet as pq

    pq.write_table(pages_table(), path)
    ds = ray.data.read_parquet(path)
    out = ds.map_batches(ExtractBatch(), batch_format="pyarrow", batch_size=8,
                         zero_copy_batch=True)
    return {row["url"]: row for row in out.take_all()}


def test_every_fixture_row_extracts(extracted):
    cases = build_cases()
    assert len(extracted) == len(cases)
    for case in cases:
        row = extracted[case_url(case)]
        if case.expect_error:
            assert row["error"] and case.expect_error in row["error"]
            continue
        assert row["error"] is None, f"{case.family}/{case.case}: {row['error']}"
        assert row["text_out"] == case.text, f"{case.family}/{case.case} text mismatch"
        html = row["html_out"].decode("utf-8")
        for needle in case.must_contain:
            assert needle in html, f"{case.family}/{case.case} missing {needle!r}"
        for needle in case.must_not_contain:
            assert needle not in html, f"{case.family}/{case.case} contains {needle!r}"
        if case.title is not None:
            assert row["title"] == case.title
        if case.resources_count is not None:
            assert row["resources_count"] == case.resources_count
        if case.anomalies:
            assert row["anomalies"] == [
                {"type": a["type"], "id": a.get("id")} for a in case.anomalies
            ]
        if case.unfound_resources:
            assert row["unfound_resources"] == case.unfound_resources


def test_extraction_is_deterministic(extracted, ray_session):
    import ray.data

    ds = ray.data.from_arrow(pages_table())
    out = ds.map_batches(ExtractBatch(), batch_format="pyarrow", batch_size=4).take_all()
    again = {row["url"]: row["html_out"] for row in out}
    for url, row in extracted.items():
        assert again[url] == row["html_out"], f"non-deterministic output for {url}"


def test_flagship_round_trips_document_text(ray_session):
    from mhtml_to_html_ray.pipelines.flagship import run_flagship

    out = run_flagship("/root/testdata/sf0.001").take_all()
    assert len(out) == 500
    import duckdb

    expected = dict(
        duckdb.connect().execute(
            "select doc_id, text from read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    )
    for row in out:
        doc_id = int(row["url"].rsplit("/", 1)[1])
        assert row["error"] is None
        assert row["text_out"] == expected[doc_id], f"doc {doc_id} text did not round-trip"
        assert row["title"] == f"doc-{doc_id}"


def test_actor_pool_extraction_matches_task_pool(ray_session):
    """extract_pages(concurrency=N) — the stateful actor-pool branch —
    produces identical output to the stateless task pool."""
    import ray.data

    from mhtml_to_html_ray.pipelines.flagship import extract_pages

    table = pages_table()
    tasks = extract_pages(ray.data.from_arrow(table), batch_size=8).take_all()
    actors = extract_pages(ray.data.from_arrow(table), batch_size=8, concurrency=2).take_all()
    by_url_tasks = {row["url"]: row["html_out"] for row in tasks}
    by_url_actors = {row["url"]: row["html_out"] for row in actors}
    assert by_url_tasks == by_url_actors
