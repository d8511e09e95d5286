"""The driver contract: __ray_entry__ exposes entry()/queries()/oracle_sql()
with matching keys, none of them initializing Ray themselves."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entry_module  # noqa: E402


def test_registry_shape():
    queries = entry_module.queries()
    oracles = entry_module.oracle_sql()
    assert len(queries) >= 35
    assert set(oracles) <= set(queries), "oracle for a query that does not exist"
    assert len(oracles) >= 28, "most queries should be oracle-checked"
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
