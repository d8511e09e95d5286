"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side by side over one sf dir, compare row count,
column names and (order-insensitive) values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result.reset_index(drop=True)
    if hasattr(result, "to_pandas"):
        return result.to_pandas().reset_index(drop=True)
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: {len(ray_df)} vs {len(sql_df)}")
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    for col in a.columns:
        # the driver's value hash is dtype-sensitive (150 != 150.0) — flag
        # dtype drift even when the values compare equal
        if a[col].dtype != b[col].dtype:
            problems.append(
                f"dtype mismatch col={col}: {a[col].dtype} vs {b[col].dtype}"
            )
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (
                (x is None and y is None)
                or (isinstance(x, float) and isinstance(y, float) and (
                    (math.isnan(x) and math.isnan(y)) or x == y))
                or x == y
            )
            if not same or type(x) is not type(y):
                problems.append(f"value mismatch col={col} row={i}: {x!r} vs {y!r}")
                if len(problems) > 5:
                    return problems
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 runtime_env={"env_vars": {"PYTHONPATH": repo_root}})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from mhtml_to_html_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(ray_df)} (no oracle — rows-only)")
            continue
        try:
            sql_df = con.execute(sql).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name}: rows={len(ray_df)}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
