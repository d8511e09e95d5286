"""Blocklist gates (functions/blocklist.py): host-suffix and blocked-token
filters, pinned by hand-computed expectations."""

import pyarrow as pa

from mhtml_to_html_ray.functions import blocklist
from mhtml_to_html_ray.functions.blocklist import _suffix_blocked

SUFFIXES = frozenset({"ads.example", "tracker.net"})


def test_suffix_walk_semantics():
    assert _suffix_blocked("ads.example", SUFFIXES)
    assert _suffix_blocked("cdn.ads.example", SUFFIXES)
    assert _suffix_blocked("a.b.tracker.net", SUFFIXES)
    # a host that merely ENDS with the text is not under the domain
    assert not _suffix_blocked("badads.example", SUFFIXES)
    assert not _suffix_blocked("example", SUFFIXES)
    assert not _suffix_blocked("", SUFFIXES)


def test_host_gate_canonicalizes_then_matches(ray_session):
    import ray

    urls = [
        "HTTPS://CDN.Ads.Example:443/x",   # case+port normalize → blocked
        "https://good.org/x",
        "not a url at all",                # unparsable → host '', kept
        "https://tracker.net./x",          # trailing dot normalizes away
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = {r["url"]: r for r in
           blocklist.host_blocklist_gate(ds, SUFFIXES).take_all()}
    assert out[urls[0]]["host"] == "cdn.ads.example"
    assert out[urls[0]]["blocked"] is True
    assert out[urls[1]]["blocked"] is False
    assert out[urls[2]]["host"] == "" and out[urls[2]]["blocked"] is False
    assert out[urls[3]]["blocked"] is True


def test_null_url_and_null_text_rows(ray_session):
    import ray

    # a null URL must get the '' host / not-blocked verdict, not a copy of
    # another row's (factorize codes a null as -1, which would negative-index)
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([None, "https://ads.example/x"], pa.string())}))
    out = blocklist.host_blocklist_gate(ds, SUFFIXES).take_all()
    by_host = {r["host"]: r for r in out}
    assert by_host[""]["blocked"] is False
    assert by_host["ads.example"]["blocked"] is True

    # a null text gates like empty instead of crashing the task
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the the", None], pa.string())}))
    rows = {r["doc_id"]: r for r in
            blocklist.word_blocklist_gate(docs, ("the",),
                                          max_frac=0.4).take_all()}
    assert rows[1]["keep"] is False
    assert rows[2]["n_tokens"] == 0 and rows[2]["keep"] is True


def test_word_gate_fractions(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["THE cat the dog", "clean text here dude", ""],
                         pa.string()),
    }))
    out = {r["doc_id"]: r for r in
           blocklist.word_blocklist_gate(ds, ("the",), max_frac=0.4)
           .take_all()}
    # case-insensitive: THE + the = 2 of 4
    assert out[1]["n_blocked"] == 2 and out[1]["blocked_frac"] == 0.5
    assert out[1]["keep"] is False
    assert out[2]["n_blocked"] == 0 and out[2]["keep"] is True
    # zero tokens: frac 0, kept
    assert out[3]["n_tokens"] == 0 and out[3]["keep"] is True
