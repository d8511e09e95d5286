"""DSIR importance resampling (functions/dsir.py): bucket-count ratios and
top-k selection, pinned against a single-process restatement of the same
md5-bucket + integer-micros contract."""

import hashlib
import math

import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import dsir
from mhtml_to_html_ray.functions.textstats import _lm_tokens

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the dog ran over the hill and far away", "en"),
    (3, "le chat noir dort sur le lit", "fr"),
    (4, "der hund läuft schnell durch den wald", "de"),
    (5, "the quick brown fox jumps over the lazy dog", "en"),
    (6, "one", "en"),          # single token: no bigrams, never scored
    (7, "", "fr"),             # empty: no bigrams
]


def _docs_ds(ray, docs=DOCS, parts=1):
    t = pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([t for _, t, _ in docs], pa.string()),
        "lang": pa.array([l for _, _, l in docs], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _bucket(bigram: str, n_buckets: int) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:8], 16) % n_buckets


def _reference(docs, n_buckets, target_value):
    """Plain-Python restatement of ratios + per-doc weights."""
    raw = [0] * n_buckets
    tgt = [0] * n_buckets
    per_doc = {}
    for doc_id, text, lang in docs:
        tokens = _lm_tokens(text)
        pairs = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
        if pairs:
            per_doc[doc_id] = [_bucket(p, n_buckets) for p in pairs]
        for b in (per_doc.get(doc_id) or []):
            raw[b] += 1
            if lang == target_value:
                tgt[b] += 1
    rt, tt = sum(raw), sum(tgt)
    ratios = [
        math.floor(1_000_000 * (
            math.log((tc + 1) / (tt + n_buckets))
            - math.log((rc + 1) / (rt + n_buckets))))
        for rc, tc in zip(raw, tgt)
    ]
    weights = {d: sum(ratios[b] for b in bs) for d, bs in per_doc.items()}
    return ratios, rt, tt, weights


def test_ratios_match_reference(ray_session):
    import ray

    ratios, rt, tt = dsir.dsir_ratios(_docs_ds(ray), n_buckets=16,
                                      target_value="en")
    ref_ratios, ref_rt, ref_tt, _ = _reference(DOCS, 16, "en")
    assert ratios.tolist() == ref_ratios
    assert (rt, tt) == (ref_rt, ref_tt)


def test_select_matches_reference_weights(ray_session):
    import ray

    _, _, _, weights = _reference(DOCS, 16, "en")
    got = dsir.dsir_select(_docs_ds(ray), n_buckets=16, top_k=10,
                           target_value="en").take_all()
    assert {r["doc_id"]: r["weight"] for r in got} == weights
    # ordered (weight desc, doc_id asc), featureless docs absent
    order = [(r["weight"], r["doc_id"]) for r in got]
    assert order == sorted(order, key=lambda p: (-p[0], p[1]))
    assert {6, 7}.isdisjoint({r["doc_id"] for r in got})


def test_select_layout_independent(ray_session):
    import ray

    a = dsir.dsir_select(_docs_ds(ray), n_buckets=16, top_k=3).take_all()
    b = dsir.dsir_select(_docs_ds(ray, parts=5), n_buckets=16,
                         top_k=3).take_all()
    assert a == b and len(a) == 3


def test_per_block_topk_cannot_drop_global_winner(ray_session):
    import ray

    # 40 docs across 8 blocks with top_k=2: per-block pruning keeps 2 per
    # block, and the global top-2 must equal the single-block answer
    docs = [(i, f"tok{i % 7} tok{(i + 1) % 5} tok{i % 3} alpha beta", "en"
             if i % 2 else "fr") for i in range(40)]
    one = dsir.dsir_select(_docs_ds(ray, docs), n_buckets=8,
                           top_k=2).take_all()
    many = dsir.dsir_select(_docs_ds(ray, docs, parts=8), n_buckets=8,
                            top_k=2).take_all()
    assert one == many and len(one) == 2


def test_target_column_value_changes_ranking(ray_session):
    import ray

    en = {r["doc_id"]: r["weight"] for r in dsir.dsir_select(
        _docs_ds(ray), n_buckets=16, top_k=10, target_value="en").take_all()}
    fr = {r["doc_id"]: r["weight"] for r in dsir.dsir_select(
        _docs_ds(ray), n_buckets=16, top_k=10, target_value="fr").take_all()}
    # the French doc must outrank under the fr target vs the en target
    assert fr[3] > en[3]


def test_empty_corpus(ray_session):
    import ray

    out = dsir.dsir_select(_docs_ds(ray, [(1, "", "en")]), n_buckets=8,
                           top_k=5)
    assert out.take_all() == []


def test_null_text_rows_are_featureless(ray_session):
    import ray
    import pyarrow as _pa

    t = _pa.table({
        "doc_id": _pa.array([1, 2], _pa.int64()),
        "text": _pa.array(["alpha beta gamma", None], _pa.string()),
        "lang": _pa.array(["en", "en"], _pa.string()),
    })
    got = dsir.dsir_select(ray.data.from_arrow(t), n_buckets=8,
                           top_k=5).take_all()
    # the null-text doc contributes nothing and is absent; no task crash
    assert [r["doc_id"] for r in got] == [1]


def test_web_curation_composition_matches_oracle(ray_session):
    """The composed boilerplate → blocklist → DSIR pipeline equals its
    DuckDB restatement on the real sf0.001 table — the stage BOUNDARIES
    (ratio fitting over the FILTERED corpus, lang rejoin) are what this
    pins; the per-stage kernels have their own oracles."""
    import duckdb

    from mhtml_to_html_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["web_curation"](sf)
    got = got.sort_values(["weight", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(ORACLE_SQL["web_curation"]).fetchdf()
    assert got.columns.tolist() == want.columns.tolist()
    assert got.values.tolist() == want.values.tolist()
