"""Deterministic sampling semantics (hash-prefix predicate, stratified
thresholds, salt independence) and the PII redaction kernels (RE2 parity
with DuckDB, count-before-redact ordering)."""

import hashlib

import pyarrow as pa

from mhtml_to_html_ray.functions import pii, sampling


def _ds(table):
    import ray.data

    return ray.data.from_arrow(table)


def _docs(n=200):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([("en", "de", "zh")[i % 3] for i in range(n)],
                         pa.string()),
    })


def test_bernoulli_sample_matches_predicate(ray_session):
    out = sampling.bernoulli_sample(_ds(_docs()), rate=0.3).to_pandas()
    threshold = format(int(0.3 * 16 ** 8), "08x")
    expected = [i for i in range(200)
                if hashlib.md5(str(i).encode()).hexdigest()[:8] < threshold]
    assert sorted(out["doc_id"]) == expected
    assert 0 < len(expected) < 200  # the rate actually bites


def test_bernoulli_sample_deterministic_across_runs(ray_session):
    first = sorted(sampling.bernoulli_sample(
        _ds(_docs()), rate=0.5).to_pandas()["doc_id"])
    second = sorted(sampling.bernoulli_sample(
        _ds(_docs()), rate=0.5).to_pandas()["doc_id"])
    assert first == second


def test_bernoulli_sample_nested_rates(ray_session):
    # a 10% sample is a SUBSET of the 30% sample (same salt): the predicate
    # is monotone in rate, which is what makes downsampling resumable
    small = set(sampling.bernoulli_sample(
        _ds(_docs()), rate=0.1).to_pandas()["doc_id"])
    large = set(sampling.bernoulli_sample(
        _ds(_docs()), rate=0.3).to_pandas()["doc_id"])
    assert small <= large


def test_bernoulli_salt_decorrelates(ray_session):
    a = set(sampling.bernoulli_sample(
        _ds(_docs()), rate=0.5, salt="a").to_pandas()["doc_id"])
    b = set(sampling.bernoulli_sample(
        _ds(_docs()), rate=0.5, salt="b").to_pandas()["doc_id"])
    assert a != b  # different salts → different samples


def test_bernoulli_rate_edges(ray_session):
    assert sampling.bernoulli_sample(_ds(_docs()), rate=0.0).count() == 0
    assert sampling.bernoulli_sample(_ds(_docs()), rate=1.0).count() == 200
    empty = sampling.bernoulli_sample(_ds(_docs()), rate=-0.5)
    assert empty.schema().names == ["doc_id", "lang"]


def test_stratified_rates_and_default(ray_session):
    out = sampling.stratified_sample(
        _ds(_docs()), key="doc_id", strata_col="lang",
        rates={"en": 0.0, "zh": 1.0}, default_rate=0.5).to_pandas()
    assert not (out["lang"] == "en").any()          # rate 0 drops stratum
    zh_total = sum(1 for i in range(200) if i % 3 == 2)
    assert (out["lang"] == "zh").sum() == zh_total  # rate 1 keeps all
    # default stratum (de) uses the hash predicate at 0.5
    threshold = format(int(0.5 * 16 ** 8), "08x")
    expected_de = [i for i in range(200) if i % 3 == 1 and
                   hashlib.md5(str(i).encode()).hexdigest()[:8] < threshold]
    assert sorted(out[out["lang"] == "de"]["doc_id"]) == expected_de


def test_mixture_rates_binding_stratum_kept_whole(ray_session):
    # counts: en 120, de 50, zh 30; weights .5/.25/.25 →
    # scale = min(240, 200, 120) = 120 (zh binding)
    n = 200
    langs = ["en"] * 120 + ["de"] * 50 + ["zh"] * 30
    ds = _ds(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(langs, pa.string()),
    }))
    rates = sampling.mixture_rates(ds, "lang",
                                   {"en": 0.5, "de": 0.25, "zh": 0.25})
    assert rates["zh"] == 1.0
    assert rates["en"] == min(0.5 * (30 / 0.25) / 120, 1.0)
    assert rates["de"] == min(0.25 * (30 / 0.25) / 50, 1.0)


def test_mixture_sample_hits_target_proportions(ray_session):
    # survivors per stratum ≈ weight * scale; exact expectation from the
    # same hash predicate the engine uses
    n = 200
    langs = ["en"] * 120 + ["de"] * 50 + ["zh"] * 30
    ds = _ds(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(langs, pa.string()),
    }))
    weights = {"en": 0.5, "de": 0.25, "zh": 0.25}
    out = sampling.mixture_sample(ds, "doc_id", "lang", weights).to_pandas()
    rates = sampling.mixture_rates(ds, "lang", weights)
    expected = []
    for i, lang in enumerate(langs):
        r = rates[lang]
        if r >= 1.0 or hashlib.md5(str(i).encode()).hexdigest()[:8] < \
                format(int(r * 16 ** 8), "08x"):
            expected.append(i)
    assert sorted(out["doc_id"]) == expected
    assert (out["lang"] == "zh").sum() == 30  # binding stratum kept whole


def test_mixture_sample_unweighted_stratum_dropped(ray_session):
    out = sampling.mixture_sample(
        _ds(_docs()), "doc_id", "lang", {"en": 0.5, "zh": 0.5}).to_pandas()
    assert not (out["lang"] == "de").any()


def test_mixture_rates_layout_independent(ray_session):
    ds = _ds(_docs(300))
    a = sampling.mixture_rates(ds, "lang", {"en": 0.6, "de": 0.4})
    b = sampling.mixture_rates(ds.repartition(7), "lang",
                               {"en": 0.6, "de": 0.4})
    assert a == b


def test_redact_batch_counts_and_text():
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "mail a@b.com and c.d@e.org call 123-456-7890 from 1.2.3.4",
            "clean text",
        ], pa.string()),
    })
    out = pii.redact_batch(batch)
    assert out.column("text").to_pylist() == [
        "mail <EMAIL> and <EMAIL> call <PHONE> from <IP>", "clean text"]
    assert out.column("n_email").to_pylist() == [2, 0]
    assert out.column("n_phone").to_pylist() == [1, 0]
    assert out.column("n_ipv4").to_pylist() == [1, 0]


def test_redact_counts_on_original_text():
    # the IP-looking digits inside an already-redacted phone must not be
    # double counted: counts come from the ORIGINAL text per category
    batch = pa.table({
        "text": pa.array(["ip inside phone-ish 127.0.0.1 555-123-4567"],
                         pa.string()),
    })
    out = pii.redact_batch(batch)
    assert out.column("n_ipv4").to_pylist() == [1]
    assert out.column("n_phone").to_pylist() == [1]
    assert out.column("text").to_pylist() == \
        ["ip inside phone-ish <IP> <PHONE>"]


def test_redact_matches_duckdb_re2():
    # pyarrow's RE2 and DuckDB's RE2 must agree byte-for-byte — this is the
    # invariant the pii_redact oracle relies on
    import duckdb

    texts = [
        "contact user5@example.com or call 555-123-4567 now",
        "ips 10.0.0.1 and 192.168.10.254, mail a.b-c_d%e@sub.domain.org",
        "edge email@edge.co 1.2.3.4 999-999-9999 trailing",
        "nothing here",
    ]
    out = pii.redact_batch(pa.table({"text": pa.array(texts, pa.string())}))
    con = duckdb.connect()
    for i, text in enumerate(texts):
        row = con.execute(
            """
            SELECT regexp_replace(regexp_replace(regexp_replace(?,
                       ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g'),
                       ?, '<IP>', 'g'),
                   length(regexp_extract_all(?, ?)),
                   length(regexp_extract_all(?, ?)),
                   length(regexp_extract_all(?, ?))
            """,
            [text, pii.EMAIL_RE, pii.PHONE_RE, pii.IPV4_RE,
             text, pii.EMAIL_RE, text, pii.PHONE_RE, text, pii.IPV4_RE],
        ).fetchone()
        assert out.column("text")[i].as_py() == row[0]
        assert out.column("n_email")[i].as_py() == row[1]
        assert out.column("n_phone")[i].as_py() == row[2]
        assert out.column("n_ipv4")[i].as_py() == row[3]


def test_redact_pii_dataset(ray_session):
    ds = _ds(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["reach me x@y.io"], pa.string()),
    }))
    out = pii.redact_pii(ds).to_pandas()
    assert list(out.columns) == ["doc_id", "text", "n_email", "n_phone",
                                 "n_ipv4"]
    assert out["text"][0] == "reach me <EMAIL>"


# ---------------------------------------------------------------------------
# group-level quality curation


def _quality_ds(ray, groups, micros):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(groups)), pa.int64()),
        "source": pa.array(groups, pa.string()),
        "alpha_micros": pa.array(micros, pa.int64()),
    }))


def test_group_mean_filter_keeps_whole_groups(ray_session):
    import ray

    # src a: mean 0.8 (800000); src b: mean 0.5 — threshold 0.6 drops all b
    out = sampling.group_mean_filter(
        _quality_ds(ray, ["a", "a", "b", "b"],
                    [700000, 900000, 400000, 600000]),
        "source", "alpha_micros", threshold=0.6).take_all()
    by_doc = {r["doc_id"]: (r["group_mean"], r["keep"]) for r in out}
    assert by_doc == {0: (0.8, True), 1: (0.8, True),
                      2: (0.5, False), 3: (0.5, False)}


def test_group_mean_filter_layout_independent(ray_session):
    import ray
    import numpy as np

    rng = np.random.default_rng(5)
    groups = [f"s{i % 7}" for i in range(200)]
    micros = rng.integers(0, 1000000, 200).tolist()
    a = sorted(sampling.group_mean_filter(
        _quality_ds(ray, groups, micros), "source", "alpha_micros",
        threshold=0.5).take_all(), key=lambda r: r["doc_id"])
    b = sorted(sampling.group_mean_filter(
        _quality_ds(ray, groups, micros).repartition(9), "source",
        "alpha_micros", threshold=0.5).take_all(),
        key=lambda r: r["doc_id"])
    assert a == b


def test_group_mean_filter_rejects_float_signal(ray_session):
    import ray
    import pytest

    ds = ray.data.from_arrow(pa.table({
        "source": pa.array(["a"], pa.string()),
        "alpha_micros": pa.array([0.5], pa.float64()),
    }))
    with pytest.raises(Exception, match="integer micros"):
        sampling.group_mean_filter(ds, "source", "alpha_micros",
                                   threshold=0.5).take_all()


# ---------------------------------------------------------------------------
# split_assign


def test_split_assign_stable_under_growth(ray_session):
    """Membership is a pure function of (salt, key): a row keeps its split
    when other rows are added — the property shuffle-splitters lack."""
    import ray.data

    from mhtml_to_html_ray.functions.sampling import split_assign

    small = ray.data.range(50)
    big = ray.data.range(500)
    frac = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    assign_small = {r["id"]: r["split"]
                    for r in split_assign(small, key="id", fractions=frac,
                                          salt="s").take_all()}
    assign_big = {r["id"]: r["split"]
                  for r in split_assign(big, key="id", fractions=frac,
                                        salt="s").take_all()}
    assert all(assign_big[k] == v for k, v in assign_small.items())
    # every named split non-empty at 500 rows, remainder absorbs correctly
    assert set(assign_big.values()) == {"train", "val", "test"}


def test_split_assign_matches_hash_thresholds(ray_session):
    """Exact md5-threshold semantics: recompute the assignment by hand."""
    import hashlib

    import ray.data

    from mhtml_to_html_ray.functions.sampling import split_assign

    rows = split_assign(ray.data.range(64), key="id",
                        fractions=[("a", 0.25), ("b", 0.5), ("c", 0.25)],
                        salt="z").take_all()
    t1, t2 = int(0.25 * 16 ** 8), int(0.75 * 16 ** 8)
    for r in rows:
        hv = int(hashlib.md5(f"z{r['id']}".encode()).hexdigest()[:8], 16)
        want = "a" if hv < t1 else ("b" if hv < t2 else "c")
        assert r["split"] == want


def test_split_assign_rejects_oversum(ray_session):
    import pytest as _pytest
    import ray.data

    from mhtml_to_html_ray.functions.sampling import split_assign

    with _pytest.raises(ValueError):
        split_assign(ray.data.range(1), key="id",
                     fractions=[("a", 0.8), ("b", 0.4)])


def test_split_assign_exact_thresholds_many_splits(ray_session):
    """Cumulative thresholds accumulate exactly: ten 0.1 fractions give
    floor(k/10 · 16^8) boundaries, not float-drifted ones."""
    from fractions import Fraction

    import ray.data

    from mhtml_to_html_ray.functions.sampling import split_assign

    frac = [(f"s{i}", 0.1) for i in range(10)]
    rows = split_assign(ray.data.range(256), key="id", fractions=frac,
                        salt="q").take_all()
    bounds = [int(Fraction(k, 10) * 16 ** 8) for k in range(1, 10)]
    import hashlib
    for r in rows:
        hv = int(hashlib.md5(f"q{r['id']}".encode()).hexdigest()[:8], 16)
        idx = sum(1 for b in bounds if hv >= b)
        assert r["split"] == f"s{idx}"


def test_token_budget_sample_boundary_doc_included(ray_session):
    """The doc that CROSSES the budget is the last one in (cum_before <
    budget admits it); everything after is out; strata are independent."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions.sampling import token_budget_sample

    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": ["a b c", "d e", "f", "g h i j", "k", "l m"],
        "source": ["s1", "s1", "s1", "s2", "s2", "s2"],
    })
    rows = token_budget_sample(ray.data.from_arrow(docs), budget_tokens=4,
                               salt="z").take_all()
    by_key = {r["key"]: r for r in rows}
    # recompute the hash order per stratum by hand
    for stratum, ids in (("s1", [0, 1, 2]), ("s2", [3, 4, 5])):
        order = sorted(ids, key=lambda d: (
            hashlib.md5(f"z{d}".encode()).hexdigest()[:8], d))
        cum = 0
        for d in order:
            assert by_key[d]["cum_before"] == cum
            assert by_key[d]["keep"] == (cum < 4)
            cum += by_key[d]["n_tokens"]
    # the kept token totals: each stratum admits docs while cum_before < 4
    for stratum in ("s1", "s2"):
        kept = [r for r in rows if r["stratum"] == stratum and r["keep"]]
        assert kept, stratum
        assert min(r["cum_before"] for r in kept) == 0
