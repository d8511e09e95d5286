"""The driver contract: __ray_entry__ exposes entry()/queries()/oracle_sql()
with matching keys, none of them initializing Ray themselves."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entry_module  # noqa: E402


def test_registry_shape():
    queries = entry_module.queries()
    oracles = entry_module.oracle_sql()
    assert len(queries) >= 90, "query registry shrank — a pipeline was lost"
    assert set(oracles) <= set(queries), "oracle for a query that does not exist"
    assert len(oracles) >= 75, "most queries should be oracle-checked"
    for name, fn in queries.items():
        assert callable(fn), name


def test_entry_smoke(ray_session):
    result = entry_module.entry()
    rows = result.take(5) if hasattr(result, "take") else result[:5]
    assert len(rows) > 0
    first = rows[0]
    for column in ("url", "html_out", "text_out", "title", "error"):
        assert column in first, f"entry() schema missing {column}"
    assert first["error"] is None


def test_queries_never_init_ray():
    import ast
    import inspect

    import mhtml_to_html_ray.pipelines.queries as queries_module

    source = inspect.getsource(queries_module)
    tree = ast.parse(source)
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and node.attr in ("init", "shutdown"):
            if isinstance(node.value, ast.Name) and node.value.id == "ray":
                raise AssertionError("queries module calls ray.init/shutdown")


def test_events_hopping_multiplicity(ray_session):
    """Hopping windows (1h every 15min): every event lands in exactly 4
    windows, so the per-window counts sum to 4x the event count."""
    import pyarrow.parquet as pq

    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["events_hopping"]("/root/testdata/sf0.001")
    n_events = pq.read_metadata(
        "/root/testdata/sf0.001/events.parquet").num_rows
    assert sum(out["n"]) == 4 * n_events
    # window ids within one event_type are dense-ish and sorted ascending
    wins = list(out["win"])
    types = list(out["event_type"])
    for i in range(1, len(wins)):
        if types[i] == types[i - 1]:
            assert wins[i] > wins[i - 1]


def test_c4_filter_reasons(ray_session):
    """The composed quality filter drops by FIRST failing rule; keeps carry a
    null reason."""
    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["c4_filter"]("/root/testdata/sf0.001")
    keep = list(out["keep"])
    reasons = [None if (r is None or (isinstance(r, float))) else r
               for r in out["drop_reason"]]
    assert any(keep) and not all(keep), "thresholds must produce a mix"
    for kept, reason in zip(keep, reasons):
        assert (reason is None) == kept
        if reason is not None:
            assert reason in ("length", "stopwords", "repetition")


def test_event_type_pivot_row_sums(ray_session):
    """Pivot invariant: the wide count columns per user sum to that user's
    event count, and the grand total equals the table row count."""
    import pyarrow.parquet as pq

    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["event_type_pivot"]("/root/testdata/sf0.001")
    n_events = pq.read_metadata(
        "/root/testdata/sf0.001/events.parquet").num_rows
    wide = [c for c in out.columns if c.startswith("n_")]
    assert sorted(wide) == ["n_click", "n_error", "n_purchase", "n_signup",
                            "n_view"]
    assert int(out[wide].sum().sum()) == n_events
    assert (out[wide].sum(axis=1) > 0).all()


def test_events_moving_avg_prefix_rows(ray_session):
    """Frame-window invariant: each user's first event averages only itself,
    the second averages two rows — spot-check against a driver recompute."""
    import duckdb

    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["events_moving_avg"]("/root/testdata/sf0.001").set_index(
        "event_id")["avg3"]
    first_two = duckdb.sql("""
        SELECT event_id, value, rn FROM (
            SELECT event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM '/root/testdata/sf0.001/events.parquet')
        WHERE rn <= 1
    """).df()
    for _, row in first_two.iterrows():
        assert abs(out[row["event_id"]] - round(row["value"], 6)) < 1e-9


def test_sales_rollup_levels_consistent(ray_session):
    """ROLLUP invariant: each level's totals re-aggregate the level below —
    per-flag rows sum their (flag, status) children, the grand total sums
    the per-flag rows; NULL marks the rolled-up dimension."""
    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["sales_rollup"]("/root/testdata/sf0.001")
    finest = out[out["l_returnflag"].notna() & out["l_linestatus"].notna()]
    by_flag = out[out["l_returnflag"].notna() & out["l_linestatus"].isna()]
    total = out[out["l_returnflag"].isna()]
    assert len(total) == 1 and total["l_linestatus"].isna().all()
    for _, row in by_flag.iterrows():
        children = finest[finest["l_returnflag"] == row["l_returnflag"]]
        assert row["n_rows"] == children["n_rows"].sum()
        assert row["sum_qty"] == children["sum_qty"].sum()
    assert total["n_rows"].iloc[0] == by_flag["n_rows"].sum()
    assert total["sum_qty"].iloc[0] == by_flag["sum_qty"].sum()


def test_train_prep_composition_invariants(ray_session):
    """The composed pipeline: every surviving doc appears once, the packed
    token stream is gapless (each doc starts where the previous one ended
    plus the separator), sequence indexes are consistent with seq_len, and
    the filters actually dropped something."""
    import pyarrow.parquet as pq

    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["train_prep"]("/root/testdata/sf0.001")
    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    assert 0 < len(out) < n_docs, "quality gate + dedup must drop some docs"
    assert out["doc_id"].is_unique
    # gapless packing in doc_id order: next start = start + n_tokens + 1 sep
    starts = out["start_offset"].to_numpy()
    tokens = out["n_tokens"].to_numpy()
    assert (starts[1:] == starts[:-1] + tokens[:-1] + 1).all()
    assert (out["first_seq"] == starts // 128).all()
    last_token = starts + (tokens - 1).clip(0)
    assert (out["last_seq"] == last_token // 128).all()
