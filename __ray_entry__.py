"""Driver contract for the Ray-Data engine (see mhtml_to_html_ray/).

The driver calls ``ray.init`` itself before importing this module: nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

* ``entry()``   — flagship pipeline on /root/testdata/sf0.001: documents →
  synthetic MHTML pages (input_hint shape) → fused MIME+DOM extraction.
* ``queries()`` — one entry per implemented operator/pipeline from
  SURVEY.md §2 + the engine-new training-data ops.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry
  (125 of 138, incl. exact restatements of langid and the minhash family);
  the rest (embedding dedup, LSH/IVF ANN, sketches, BPE training)
  are approximate/iterative and covered by tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001; ≥0 rows with a stable schema."""
    from mhtml_to_html_ray.pipelines.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001", keep_html=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from mhtml_to_html_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mhtml_to_html_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
