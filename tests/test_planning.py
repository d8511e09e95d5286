"""plan_switch / guard_small_plan — the shared dual-plan crossover knob.

Pins the switch inputs (VERDICT round 4 #3) and the forced-broadcast guard
(#7): metadata-sourced rows/bytes, env-tunable thresholds, and a raise when
strategy="broadcast" is forced above the threshold in tfidf / unigram LM /
ccnet.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import corpusstats, planning, textstats
from mhtml_to_html_ray.functions.planning import (
    dataset_size_hint,
    guard_small_plan,
    plan_switch,
)


def _docs_ds(n: int = 8):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array([f"alpha beta doc {i}" for i in range(n)], pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )
    )


def test_size_hint_bare_read_no_execution(ray_session, tmp_path):
    """A bare read_parquet reports rows AND bytes from file metadata."""
    import pyarrow.parquet as pq
    import ray

    pq.write_table(pa.table({"x": pa.array(range(100), pa.int64())}),
                   str(tmp_path / "t.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "t.parquet"))
    rows, size = dataset_size_hint(ds)
    assert rows == 100
    assert size is not None and size > 0
    # and the plan has not started executing
    assert not ds._plan.has_started_execution


def test_size_hint_mapped_unknown(ray_session):
    ds = _docs_ds().map_batches(lambda b: b)
    assert dataset_size_hint(ds) == (None, None)


def test_plan_switch_rows_threshold(ray_session):
    ds = _docs_ds(8)
    assert plan_switch(ds, threshold_rows=8) is True       # >= is inclusive
    assert plan_switch(ds, threshold_rows=9) is False
    # explicit n_rows wins over metadata and needs no dataset at all
    assert plan_switch(None, n_rows=10, threshold_rows=10) is True
    assert plan_switch(None, n_rows=9, threshold_rows=10) is False


def test_plan_switch_bytes_threshold(ray_session):
    ds = _docs_ds(8)
    # tiny byte threshold → distributed even though rows are far below
    assert plan_switch(ds, threshold_rows=10**9, threshold_bytes=1) is True


def test_plan_switch_mapped_falls_back_to_count(ray_session):
    ds = _docs_ds(8).map_batches(lambda b: b)
    assert plan_switch(ds, threshold_rows=8) is True
    assert plan_switch(ds, threshold_rows=9) is False


def test_plan_switch_requires_some_size():
    with pytest.raises(ValueError):
        plan_switch(None)


def test_plan_switch_env_defaults_pinned():
    assert planning.PLAN_SWITCH_ROWS == 200_000
    assert planning.PLAN_SWITCH_BYTES == 256 * 1024 * 1024


@pytest.fixture
def tiny_threshold(monkeypatch):
    """Make every corpus look 'big' so the guards trip on 8 rows."""
    monkeypatch.setattr(planning, "PLAN_SWITCH_ROWS", 4)
    monkeypatch.setattr(planning, "PLAN_SWITCH_BYTES", 1)


def test_guard_tfidf_forced_broadcast(ray_session, tiny_threshold):
    with pytest.raises(ValueError, match="tfidf_topk"):
        corpusstats.tfidf_topk(_docs_ds(), k=3, strategy="broadcast")


def test_guard_unigram_forced_broadcast(ray_session, tiny_threshold):
    with pytest.raises(ValueError, match="unigram_lm_scores"):
        textstats.unigram_lm_scores(_docs_ds(), strategy="broadcast")


def test_guard_ccnet_forced_broadcast(ray_session, tiny_threshold):
    with pytest.raises(ValueError, match="ccnet_bucket_scores"):
        textstats.ccnet_bucket_scores(_docs_ds(), strategy="broadcast")


def test_guard_small_plan_passes_below_threshold(ray_session):
    guard_small_plan("x", _docs_ds())  # default thresholds: no raise
    # and the auto paths still work end to end below the threshold
    out = corpusstats.tfidf_topk(_docs_ds(), k=2, strategy="auto")
    assert out.count() > 0
