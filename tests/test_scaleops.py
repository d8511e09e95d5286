"""Scale-path operators added round 3: per-key cap, exact distributed
quantiles, and incremental dedup against a persisted hash index."""

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import dedup, quantiles, sampling


# ---------------------------------------------------------------------------
# per_key_cap


def _keyed_table(pairs):
    return pa.table({
        "source": pa.array([p[0] for p in pairs], pa.string()),
        "doc_id": pa.array([p[1] for p in pairs], pa.int64()),
    })


def test_per_key_cap_keeps_smallest(ray_session):
    import ray

    rows = [("a", 5), ("a", 1), ("a", 3), ("b", 9), ("b", 2), ("c", 7)]
    ds = ray.data.from_arrow(_keyed_table(rows))
    out = sorted(
        (r["source"], r["doc_id"])
        for r in sampling.per_key_cap(ds, "source", 2, "doc_id").take_all()
    )
    assert out == [("a", 1), ("a", 3), ("b", 2), ("b", 9), ("c", 7)]


def test_per_key_cap_combiner_matches_across_layouts(ray_session):
    import ray

    rng = np.random.default_rng(3)
    ids = rng.permutation(200)
    rows = [(f"s{i % 5}", int(ids[i])) for i in range(200)]
    ds = ray.data.from_arrow(_keyed_table(rows))
    a = sorted((r["source"], r["doc_id"])
               for r in sampling.per_key_cap(ds, "source", 4, "doc_id").take_all())
    b = sorted((r["source"], r["doc_id"])
               for r in sampling.per_key_cap(
                   ds.repartition(13), "source", 4, "doc_id").take_all())
    assert a == b
    assert len(a) == 20
    # per-key results really are the 4 smallest
    want = {}
    for s, d in rows:
        want.setdefault(s, []).append(d)
    expect = sorted((s, d) for s, ds_ in want.items() for d in sorted(ds_)[:4])
    assert a == expect


# ---------------------------------------------------------------------------
# exact_quantiles


def test_exact_quantiles_duckdb_parity(ray_session):
    import duckdb
    import ray

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, size=1000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = quantiles.exact_quantiles(ds, "v", qs)
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(vals, pa.int64())}))
    want = con.execute(
        "SELECT unnest(quantile_disc(v, ?)) FROM t", [qs]
    ).fetchall()
    assert got.column("value").to_pylist() == [w[0] for w in want]


def test_exact_quantiles_by_group_parity(ray_session):
    """Grouped quantiles equal per-group single-column quantiles and are
    independent of block layout."""
    import duckdb
    import ray

    rng = np.random.default_rng(13)
    keys = rng.choice(["a", "b", "c"], size=900).tolist()
    vals = rng.integers(0, 40, size=900)
    tbl = pa.table({"k": pa.array(keys, pa.string()),
                    "v": pa.array(vals, pa.int64())})
    qs = [0.25, 0.5, 0.9]
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = quantiles.exact_quantiles_by(ds, "k", "v", qs)
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(
            "SELECT k, unnest(quantile_disc(v, ?)) FROM t GROUP BY k ORDER BY k",
            [qs],
        ).fetchall()
        rows = sorted(zip(got.column("k").to_pylist(),
                          got.column("q").to_pylist(),
                          got.column("value").to_pylist()))
        assert [(k, v) for k, _, v in rows] == [(w[0], w[1]) for w in want]

    with pytest.raises(ValueError, match="outside"):
        quantiles.exact_quantiles_by(ds, "k", "v", [2.0])


def test_exact_quantiles_rejects_out_of_range(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="outside"):
        quantiles.exact_quantiles(ds, "v", [1.5])


# ---------------------------------------------------------------------------
# persisted hash index


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_dedup_against_index_marks_known_hashes(ray_session, tmp_path):
    import ray

    existing = ray.data.from_arrow(_docs(["alpha", "beta", "gamma"]))
    index_dir = str(tmp_path / "idx")
    dedup.build_hash_index(existing, index_dir, n_partitions=4)

    new = ray.data.from_arrow(_docs(["beta", "delta", "alpha", "epsilon"]))
    rows = {r["doc_id"]: r["is_duplicate"]
            for r in dedup.dedup_against_index(new, index_dir).take_all()}
    assert rows == {0: True, 1: False, 2: True, 3: False}

    kept = sorted(r["doc_id"] for r in
                  dedup.dedup_against_index(new, index_dir, mode="filter").take_all())
    assert kept == [1, 3]


def test_dedup_against_index_empty_index(ray_session, tmp_path):
    import ray

    index_dir = str(tmp_path / "idx")
    dedup.build_hash_index(
        ray.data.from_arrow(_docs([])), index_dir, n_partitions=4)
    new = ray.data.from_arrow(_docs(["anything"]))
    rows = dedup.dedup_against_index(new, index_dir).take_all()
    assert [r["is_duplicate"] for r in rows] == [False]


def test_dedup_against_index_mode_validated(ray_session, tmp_path):
    import ray

    index_dir = str(tmp_path / "idx")
    dedup.build_hash_index(
        ray.data.from_arrow(_docs(["x"])), index_dir, n_partitions=2)
    with pytest.raises(ValueError, match="mode"):
        dedup.dedup_against_index(
            ray.data.from_arrow(_docs(["y"])), index_dir, mode="bad")


def test_build_hash_index_refuses_in_place_rebuild(ray_session, tmp_path):
    import ray

    index_dir = str(tmp_path / "idx")
    dedup.build_hash_index(
        ray.data.from_arrow(_docs(["x", "y"])), index_dir, n_partitions=2)
    with pytest.raises(ValueError, match="already contains"):
        dedup.build_hash_index(
            ray.data.from_arrow(_docs(["z"])), index_dir, n_partitions=2)


def test_dedup_against_index_rejects_routing_mismatch(ray_session, tmp_path):
    import json
    import ray

    index_dir = str(tmp_path / "idx")
    dedup.build_hash_index(
        ray.data.from_arrow(_docs(["x"])), index_dir, n_partitions=2)
    meta_path = tmp_path / "idx" / "index_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["routing"] = "crc32(hash) % n_partitions"
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="routing"):
        dedup.dedup_against_index(
            ray.data.from_arrow(_docs(["y"])), index_dir)


def test_per_key_cap_payload_ties_layout_independent(ray_session):
    import ray

    # duplicate (key, order_col) pairs straddling the cap boundary, with a
    # payload column: the tie must break on the payload, not block layout
    table = pa.table({
        "source": pa.array(["a"] * 4, pa.string()),
        "doc_id": pa.array([1, 1, 1, 0], pa.int64()),
        "payload": pa.array(["p3", "p1", "p2", "p0"], pa.string()),
    })
    ds = ray.data.from_arrow(table)
    want = [("a", 0, "p0"), ("a", 1, "p1")]
    for layout in (ds, ds.repartition(4)):
        got = sorted(
            (r["source"], r["doc_id"], r["payload"])
            for r in sampling.per_key_cap(
                layout, "source", 2, "doc_id", columns=["payload"]
            ).take_all()
        )
        assert got == want


# ---------------------------------------------------------------------------
# substring (k-token window) duplication audit


_SUBSTR_TEXTS = [
    "a b c d e f g h",        # grams shared with docs 1 and 3
    "a b c d e x y z",        # one shared gram ('a b c d e')
    "q r s",                  # too short for k=5: zero grams
    "a b c d e f g h",        # exact duplicate of doc 0
    "",                       # empty
    "m m m m m m m m m m",    # self-repeating gram (within-doc duplication)
]


def _substr_ds():
    import ray

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(_SUBSTR_TEXTS)), pa.int64()),
                  "text": pa.array(_SUBSTR_TEXTS, pa.string())}))


def test_substring_dup_stats_hand_computed(ray_session):
    out = {r["doc_id"]: r for r in
           dedup.substring_dup_stats(_substr_ds(), k=5).take_all()}
    # doc 0 ≡ doc 3: every one of their 4 windows is duplicated, full cover
    for d in (0, 3):
        assert (out[d]["n_grams"], out[d]["n_dup_grams"],
                out[d]["n_dup_tokens"]) == (4, 4, 8)
        assert out[d]["dup_token_frac"] == 1.0
    # doc 1 shares only 'a b c d e' (pos 0) -> 5 covered tokens of 8
    assert (out[1]["n_dup_grams"], out[1]["n_dup_tokens"]) == (1, 5)
    assert out[1]["dup_token_frac"] == 0.625
    # short / empty docs still appear with zeros
    assert (out[2]["n_tokens"], out[2]["n_grams"], out[2]["n_dup_tokens"]) == (3, 0, 0)
    assert (out[4]["n_tokens"], out[4]["dup_token_frac"]) == (0, 0.0)
    # within-doc repetition counts: all 6 'm'*5 windows equal -> full cover
    assert (out[5]["n_dup_grams"], out[5]["n_dup_tokens"]) == (6, 10)


def test_substring_dup_stats_hashed_and_layout_equivalence(ray_session):
    ds = _substr_ds()
    base = sorted((tuple(r.values()) for r in
                   dedup.substring_dup_stats(ds, k=5).take_all()))
    hashed = sorted((tuple(r.values()) for r in
                     dedup.substring_dup_stats(ds, k=5, hashed=True).take_all()))
    relay = sorted((tuple(r.values()) for r in
                    dedup.substring_dup_stats(ds.repartition(5), k=5).take_all()))
    assert base == hashed == relay


# ---------------------------------------------------------------------------
# persisted MinHash-LSH index (incremental near-dup)


_MH_CORPUS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "completely different text about ray data pipelines and arrow batches here",
    "another unrelated document mentioning politeness budgets and robots files",
]
_MH_NEW = [
    "the quick brown fox jumps over the lazy dog near the river bank tonight",
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "totally novel content that matches nothing in the existing corpus at all",
]


def _mh_ds(texts, base_id):
    import ray

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([base_id + i for i in range(len(texts))],
                                     pa.int64()),
                  "text": pa.array(texts, pa.string())}))


def test_neardup_against_index(ray_session, tmp_path):
    idx = str(tmp_path / "mh")
    dedup.build_minhash_index(_mh_ds(_MH_CORPUS, 100), idx, n_partitions=4)
    rows = sorted(
        (r["new_doc_id"], r["match_doc_id"], r["est_jaccard"])
        for r in dedup.neardup_against_index(
            _mh_ds(_MH_NEW, 1), idx, threshold=0.5).take_all()
    )
    # exact duplicate estimates 1.0; one-word edit lands in (0.5, 1.0);
    # the novel doc matches nothing
    assert (2, 100, 1.0) in rows
    assert any(n == 1 and m == 100 and 0.5 <= e < 1.0 for n, m, e in rows)
    assert not any(n == 3 for n, _, _ in rows)


def test_neardup_index_matches_direct_estimate(ray_session, tmp_path):
    """The index path must reproduce the driver-computed signature-agreement
    estimate for every pair it reports (same permutations, same shingles)."""
    import numpy as np

    idx = str(tmp_path / "mh")
    dedup.build_minhash_index(_mh_ds(_MH_CORPUS, 100), idx, n_partitions=4)
    hasher = dedup.MinHasher(64, 42)
    sigs_old = {100 + i: hasher.signature(dedup.shingle_set(t, 3))
                for i, t in enumerate(_MH_CORPUS)}
    sigs_new = {1 + i: hasher.signature(dedup.shingle_set(t, 3))
                for i, t in enumerate(_MH_NEW)}
    for r in dedup.neardup_against_index(_mh_ds(_MH_NEW, 1), idx,
                                         threshold=0.0).take_all():
        want = float((sigs_new[r["new_doc_id"]]
                      == sigs_old[r["match_doc_id"]]).mean())
        assert abs(r["est_jaccard"] - want) < 1e-9


def test_build_minhash_index_refuses_in_place_rebuild(ray_session, tmp_path):
    idx = str(tmp_path / "mh")
    dedup.build_minhash_index(_mh_ds(_MH_CORPUS, 100), idx)
    with pytest.raises(ValueError, match="already contains"):
        dedup.build_minhash_index(_mh_ds(_MH_CORPUS, 100), idx)


def test_neardup_index_rejects_routing_mismatch(ray_session, tmp_path):
    import json

    idx = str(tmp_path / "mh")
    dedup.build_minhash_index(_mh_ds(_MH_CORPUS, 100), idx)
    meta_path = tmp_path / "mh" / "index_meta.json"
    meta = json.loads(meta_path.read_text())
    meta["routing"] = "something else"
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="routing"):
        dedup.neardup_against_index(_mh_ds(_MH_NEW, 1), idx)


def test_substring_scrub_canonical_copy_survives(ray_session):
    """Lee-et-al removal: the (min doc_id, pos) occurrence of a duplicated
    5-gram keeps its tokens; every other occurrence's span is dropped;
    untouched docs rebuild byte-identically."""
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a b c d e f",            # canonical home of "a b c d e"
            "z a b c d e y",          # non-canonical occurrence → scrubbed
            "unique words only here now",
        ], pa.string()),
    })
    rows = {r["doc_id"]: r for r in
            dedup.substring_scrub(ray.data.from_arrow(tbl), k=5).take_all()}
    assert rows[0]["text_out"] == "a b c d e f" and rows[0]["n_kept"] == 6
    assert rows[1]["text_out"] == "z y" and rows[1]["n_kept"] == 2
    assert rows[1]["n_tokens"] == 7
    assert rows[2]["text_out"] == "unique words only here now"


def test_substring_scrub_within_doc_and_protection(ray_session):
    """A gram duplicated WITHIN one document scrubs its own repeat, and the
    canonical span protects tokens even when a non-canonical span overlaps
    them."""
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["a b c d e a b c d e"], pa.string()),
    })
    rows = dedup.substring_scrub(ray.data.from_arrow(tbl), k=5).take_all()
    assert len(rows) == 1
    # occurrences of "a b c d e" at pos 0 (canonical, protected) and pos 5
    # (dropped); the in-between grams ("b c d e a", ...) are unique
    assert rows[0]["text_out"] == "a b c d e"
    assert rows[0]["n_tokens"] == 10 and rows[0]["n_kept"] == 5


def test_substring_scrub_hashed_equivalence(ray_session):
    """hashed=True (63-bit md5 gram keys — the small-shuffle 100-TB knob)
    rewrites identically to exact string keys."""
    import ray.data

    texts = [
        "a b c d e f g", "q a b c d e h", "x y z w v u t",
        "x y z w v u t",  # whole-doc duplicate
        "one two three four five six one two three four five six",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)

    def rows(**kw):
        return sorted(
            (r["doc_id"], r["n_tokens"], r["n_kept"], r["text_out"])
            for r in dedup.substring_scrub(ds, k=5, **kw).take_all())

    assert rows(hashed=False) == rows(hashed=True)


def test_substring_scrub_properties(ray_session):
    """Algebraic properties on a collision-heavy corpus (tiny alphabet):
    every output doc's tokens are an order-preserving subsequence of its
    input; every duplicated 5-gram still appears at least once in the
    rebuilt corpus (the kept canonical copy survives intact); docs whose
    grams are all corpus-unique rebuild unchanged."""
    import random

    import ray.data

    from mhtml_to_html_ray.functions.textstats import _lm_tokens

    rng = random.Random(42)
    texts = [
        " ".join(rng.choice(["a", "b", "c"])
                 for _ in range(rng.randint(1, 24)))
        for _ in range(30)
    ] + ["q w e r t y u i o p"]  # an all-unique doc
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = {r["doc_id"]: r for r in
           dedup.substring_scrub(ray.data.from_arrow(tbl), k=5).take_all()}

    # reference gram census
    from collections import Counter
    gram_count: Counter = Counter()
    doc_tokens = {}
    for i, text in enumerate(texts):
        toks = _lm_tokens(text)
        doc_tokens[i] = toks
        for j in range(max(len(toks) - 4, 0)):
            gram_count[" ".join(toks[j:j+5])] += 1
    dup_grams = {g for g, n in gram_count.items() if n >= 2}

    rebuilt_all = " \x00 ".join(out[i]["text_out"] for i in sorted(out))
    for doc_id, toks in doc_tokens.items():
        row = out[doc_id]
        kept = row["text_out"].split() if row["text_out"] else []
        # subsequence check
        it = iter(toks)
        assert all(any(t == k for t in it) for k in kept), \
            f"doc {doc_id}: output is not a subsequence"
        assert row["n_kept"] == len(kept) and row["n_tokens"] == len(toks)
        # untouched docs rebuild identically
        grams = {" ".join(toks[j:j+5]) for j in range(max(len(toks)-4, 0))}
        if not (grams & dup_grams):
            assert kept == toks
    for gram in dup_grams:
        assert gram in rebuilt_all, f"duplicated gram vanished: {gram!r}"
