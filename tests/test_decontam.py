"""Benchmark-decontamination semantics (functions/decontam.py)."""

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import decontam


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.fixture()
def corpora(ray_session):
    import ray

    eval_texts = ["alpha beta gamma delta", "one two three four five"]
    train_texts = [
        "clean document with no overlap at all here",
        "prefix alpha beta gamma delta suffix",            # contains eval 1-gram window
        "one two three four five and alpha beta gamma delta",  # hits both eval docs
        "alpha beta gamma",                                 # sub-n fragment: NOT a 4-gram hit
        "   ",                                              # whitespace-only
    ]
    return (ray.data.from_arrow(_docs(train_texts)),
            ray.data.from_arrow(_docs(eval_texts)))


def test_mark_counts_distinct_eval_grams(corpora):
    train, evals = corpora
    rows = {r["doc_id"]: r
            for r in decontam.decontaminate(train, evals, n=4).take_all()}
    assert rows[0]["contaminated"] is False and rows[0]["n_hits"] == 0
    assert rows[1]["contaminated"] is True and rows[1]["n_hits"] == 1
    # doc 2 contains "one two three four", "two three four five",
    # and "alpha beta gamma delta" = 3 distinct eval 4-grams
    assert rows[2]["n_hits"] == 3
    assert rows[3]["contaminated"] is False, "3-token fragment is not a 4-gram"
    assert rows[4]["n_hits"] == 0


def test_filter_drops_contaminated(corpora):
    train, evals = corpora
    kept = sorted(r["doc_id"] for r in
                  decontam.decontaminate(train, evals, n=4, mode="filter").take_all())
    assert kept == [0, 3, 4]


def test_repeated_gram_counts_once(ray_session):
    import ray

    evals = ray.data.from_arrow(_docs(["spam ham eggs"]))
    train = ray.data.from_arrow(_docs(["spam ham eggs and spam ham eggs again"]))
    rows = decontam.decontaminate(train, evals, n=3).take_all()
    assert rows[0]["n_hits"] == 1, "same eval gram twice in one doc counts once"


def test_empty_eval_set_marks_nothing(ray_session):
    import ray

    evals = ray.data.from_arrow(_docs(["ab"]))  # 1 token < n: no grams
    train = ray.data.from_arrow(_docs(["ab cd ef gh"]))
    rows = decontam.decontaminate(train, evals, n=3).take_all()
    assert rows[0]["contaminated"] is False


def test_tokenization_collapses_whitespace(ray_session):
    import ray

    evals = ray.data.from_arrow(_docs(["a b c"]))
    train = ray.data.from_arrow(_docs(["x  a \t b \n c  y"]))
    rows = decontam.decontaminate(train, evals, n=3).take_all()
    assert rows[0]["contaminated"] is True


def test_layout_independent(corpora):
    train, evals = corpora
    a = sorted(decontam.decontaminate(train, evals, n=4).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(decontam.decontaminate(train.repartition(3), evals, n=4).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b


def test_mode_validated(corpora):
    train, evals = corpora
    with pytest.raises(ValueError, match="mode"):
        decontam.decontaminate(train, evals, mode="bogus")
