"""Parity pins for the round-4 near-dup oracles (dedup_minhash,
ngram_jaccard, train_prep).

These oracles restate an LSH-fronted pipeline as all-pairs exact Jaccard in
SQL. That restatement is exact only because (a) the engine's keep decision
is exact Jaccard over LSH candidates, and (b) at the configured band
settings every true pair is a candidate on these corpora (miss probability
≤ ~1e-5 per pair at the thresholds used). This module asserts (b) directly:
the pipeline output equals a from-scratch all-pairs computation on the real
sf0.001 table — if the fixtures or band settings ever drift such that LSH
misses a true pair, these tests fail before the driver's gate does.
"""

import itertools

import pyarrow.parquet as pq
import pytest

from mhtml_to_html_ray.functions.dedup import jaccard, shingle_set

SF_DIR = "/root/testdata/sf0.001"


def _all_pairs(threshold: float):
    table = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    shingles = {
        i: shingle_set(t, 3)
        for i, t in zip(table.column("doc_id").to_pylist(),
                        table.column("text").to_pylist())
    }
    pairs = []
    for a, b in itertools.combinations(sorted(shingles), 2):
        sim = jaccard(shingles[a], shingles[b])
        if sim >= threshold:
            pairs.append((a, b, sim))
    return pairs


def _components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {m: find(m) for m in sorted(parent)}


def test_ngram_jaccard_query_equals_all_pairs(ray_session):
    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["ngram_jaccard"](SF_DIR)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    got = sorted((r["a"], r["b"], r["jaccard"]) for r in rows)
    want = sorted((a, b, round(s, 6)) for a, b, s in _all_pairs(0.5))
    assert got == want
    assert got, "sf0.001 must contain at least one near-dup pair"


def test_dedup_minhash_query_equals_all_pairs_components(ray_session):
    from mhtml_to_html_ray.pipelines.queries import QUERIES

    out = QUERIES["dedup_minhash"](SF_DIR)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    got = {r["doc_id"]: r["cluster_id"] for r in rows}
    want = _components(_all_pairs(0.8))
    assert got == want
    assert got, "sf0.001 must contain at least one cluster"


def test_train_prep_matches_oracle_sql(ray_session):
    """The full composed pipeline vs its DuckDB restatement, end to end."""
    import duckdb

    from mhtml_to_html_ray.pipelines.queries import ORACLE_SQL, QUERIES

    out = QUERIES["train_prep"](SF_DIR)
    ray_df = out.to_pandas() if hasattr(out, "to_pandas") else out
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sql_df = con.execute(ORACLE_SQL["train_prep"]).df()
    cols = list(sql_df.columns)
    ray_df = ray_df[cols].reset_index(drop=True)
    for col in cols:
        ray_df[col] = ray_df[col].astype("int64")
        sql_df[col] = sql_df[col].astype("int64")
    assert len(ray_df) == len(sql_df) and len(ray_df) > 0
    assert ray_df.equals(sql_df)


@pytest.mark.parametrize("name", ["ngram_jaccard", "dedup_minhash"])
def test_near_dup_oracle_sql_runs_and_matches(ray_session, name):
    """The committed SQL itself (not just its Python restatement) against
    the live query output, column-for-column."""
    import duckdb

    from mhtml_to_html_ray.pipelines.queries import ORACLE_SQL, QUERIES

    out = QUERIES[name](SF_DIR)
    ray_df = (out.to_pandas() if hasattr(out, "to_pandas") else out)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sql_df = con.execute(ORACLE_SQL[name]).df()
    cols = sorted(sql_df.columns)
    ray_df = ray_df[cols].sort_values(cols).reset_index(drop=True)
    sql_df = sql_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(ray_df) == len(sql_df) and len(ray_df) > 0
    for col in cols:
        assert ray_df[col].tolist() == sql_df[col].tolist(), col
