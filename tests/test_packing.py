"""Distributed prefix-sum / sequence packing (functions/packing.py)."""

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import packing


def _ds(ray, keys, counts, parts=1):
    t = pa.table({"doc_id": pa.array(keys, pa.int64()),
                  "n_tokens": pa.array(counts, pa.int64())})
    ds = ray.data.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _reference_offsets(keys, counts, extra=0):
    order = np.argsort(keys, kind="stable")
    k = np.asarray(keys)[order]
    c = np.asarray(counts)[order] + extra
    starts = np.concatenate(([0], np.cumsum(c[:-1])))
    return dict(zip(k.tolist(), starts.tolist()))


def _collect(ds):
    return {r["doc_id"]: r["start_offset"] for r in ds.take_all()}


def test_prefix_matches_numpy_reference(ray_session):
    import ray

    rng = np.random.default_rng(7)
    keys = rng.permutation(500).tolist()
    counts = rng.integers(0, 40, 500).tolist()
    out = _collect(packing.prefix_offsets(
        _ds(ray, keys, counts, parts=9), "doc_id", "n_tokens", n_buckets=16))
    assert out == _reference_offsets(keys, counts)


def test_prefix_layout_independent(ray_session):
    import ray

    rng = np.random.default_rng(11)
    keys = rng.permutation(300).tolist()
    counts = rng.integers(0, 25, 300).tolist()
    a = _collect(packing.prefix_offsets(
        _ds(ray, keys, counts, parts=1), "doc_id", "n_tokens", n_buckets=8))
    b = _collect(packing.prefix_offsets(
        _ds(ray, keys, counts, parts=13), "doc_id", "n_tokens", n_buckets=8))
    assert a == b


def test_prefix_single_bucket_and_sparse_keys(ray_session):
    import ray

    keys = [10, 1_000_000, 5, -3]          # sparse + negative keys
    counts = [4, 7, 1, 2]
    out = _collect(packing.prefix_offsets(
        _ds(ray, keys, counts, parts=2), "doc_id", "n_tokens", n_buckets=1))
    assert out == _reference_offsets(keys, counts)
    out4 = _collect(packing.prefix_offsets(
        _ds(ray, keys, counts, parts=2), "doc_id", "n_tokens", n_buckets=500))
    assert out4 == out


def test_prefix_extra_per_row_widens_stride(ray_session):
    import ray

    keys = [0, 1, 2]
    counts = [3, 0, 5]
    out = _collect(packing.prefix_offsets(
        _ds(ray, keys, counts), "doc_id", "n_tokens", extra_per_row=1))
    assert out == {0: 0, 1: 4, 2: 5}


def test_prefix_empty_dataset(ray_session):
    import ray

    out = packing.prefix_offsets(
        _ds(ray, [], []), "doc_id", "n_tokens")
    assert out.take_all() == []
    assert set(out.schema().names) == {"doc_id", "n_tokens", "start_offset"}


def test_prefix_duplicate_key_raises(ray_session):
    import ray

    with pytest.raises(Exception, match="duplicate"):
        packing.prefix_offsets(
            _ds(ray, [1, 2, 2], [5, 5, 5]), "doc_id", "n_tokens").take_all()


def test_prefix_null_and_negative_counts_raise(ray_session):
    import ray

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "n_tokens": pa.array([3, None], pa.int64())})
    with pytest.raises(Exception, match="null"):
        packing.prefix_offsets(
            ray.data.from_arrow(t), "doc_id", "n_tokens").take_all()
    with pytest.raises(Exception, match="negative"):
        packing.prefix_offsets(
            _ds(ray, [1, 2], [3, -1]), "doc_id", "n_tokens").take_all()


def test_pack_sequences_formula(ray_session):
    import ray

    # stream with sep=1: doc0 [0,10) sep@10, doc1 [11,11) empty, doc2 [12,30)
    keys = [0, 1, 2]
    counts = [10, 0, 18]
    rows = {r["doc_id"]: r for r in packing.pack_sequences(
        _ds(ray, keys, counts, parts=2), "doc_id", "n_tokens",
        seq_len=8, doc_sep=1).take_all()}
    assert rows[0] == {"doc_id": 0, "n_tokens": 10, "start_offset": 0,
                       "first_seq": 0, "last_seq": 1, "n_seqs": 2}
    # empty doc: insertion point only
    assert rows[1]["start_offset"] == 11
    assert rows[1]["first_seq"] == rows[1]["last_seq"] == 1
    assert rows[1]["n_seqs"] == 1
    assert rows[2] == {"doc_id": 2, "n_tokens": 18, "start_offset": 12,
                       "first_seq": 1, "last_seq": 3, "n_seqs": 3}


def test_pack_sequences_layout_independent_and_covering(ray_session):
    import ray

    rng = np.random.default_rng(23)
    keys = rng.permutation(200).tolist()
    counts = rng.integers(1, 64, 200).tolist()
    a = sorted(map(tuple, (
        (r["doc_id"], r["first_seq"], r["last_seq"]) for r in
        packing.pack_sequences(_ds(ray, keys, counts, parts=1),
                               "doc_id", "n_tokens", 32).take_all())))
    b = sorted(map(tuple, (
        (r["doc_id"], r["first_seq"], r["last_seq"]) for r in
        packing.pack_sequences(_ds(ray, keys, counts, parts=11),
                               "doc_id", "n_tokens", 32).take_all())))
    assert a == b
    # consecutive docs tile the stream: doc k+1 starts in doc k's last
    # sequence or the next one (separator = 1 token)
    ref = _reference_offsets(keys, counts, extra=1)
    by_key = {r[0]: r for r in a}
    for k in range(199):
        assert by_key[k + 1][1] - by_key[k][2] in (0, 1, 2)
        assert ref[k + 1] // 32 >= by_key[k][1]


def test_pack_empty_dataset_keeps_schema(ray_session):
    """Ray drops zero-row map_batches blocks; the typed empty short-circuit
    must keep the full packed schema so downstream sorts don't KeyError."""
    import ray

    out = packing.pack_sequences(
        _ds(ray, [], []), "doc_id", "n_tokens", seq_len=8)
    assert out.take_all() == []
    assert set(out.schema().names) == {
        "doc_id", "n_tokens", "start_offset", "first_seq", "last_seq",
        "n_seqs"}


def test_pack_negative_doc_sep_raises(ray_session):
    import ray

    with pytest.raises(ValueError, match="doc_sep"):
        packing.pack_sequences(
            _ds(ray, [0, 1], [3, 3]), "doc_id", "n_tokens",
            seq_len=8, doc_sep=-3)


def test_chunk_spans_hand_computed(ray_session):
    import ray

    # C=4, O=1, stride 3: n=10 -> [0,4)[3,7)[6,10); n=11 adds [9,11);
    # n=3 (< C) -> one clamped chunk; n=1 (<= O) -> one chunk; n=0 -> none
    out = packing.chunk_spans(
        _ds(ray, [0, 1, 2, 3, 4], [10, 11, 3, 1, 0]), "doc_id", "n_tokens",
        chunk_len=4, overlap=1).take_all()
    spans = {}
    for r in out:
        spans.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["end_tok"], r["n_chunks"]))
    for v in spans.values():
        v.sort()
    assert spans == {
        0: [(0, 0, 4, 3), (1, 3, 7, 3), (2, 6, 10, 3)],
        1: [(0, 0, 4, 4), (1, 3, 7, 4), (2, 6, 10, 4), (3, 9, 11, 4)],
        2: [(0, 0, 3, 1)],
        3: [(0, 0, 1, 1)],
    }


def test_chunk_spans_zero_overlap_covers_exactly(ray_session):
    import ray

    out = packing.chunk_spans(
        _ds(ray, [0], [10]), "doc_id", "n_tokens",
        chunk_len=5, overlap=0).take_all()
    assert sorted((r["start_tok"], r["end_tok"]) for r in out) == [
        (0, 5), (5, 10)]


def test_chunk_spans_validates_params(ray_session):
    import ray

    with pytest.raises(ValueError, match="overlap"):
        packing.chunk_spans(_ds(ray, [0], [5]), "doc_id", "n_tokens",
                            chunk_len=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_len"):
        packing.chunk_spans(_ds(ray, [0], [5]), "doc_id", "n_tokens",
                            chunk_len=0)


def _reference_manifest(keys, counts, shard_size):
    starts = _reference_offsets(keys, counts)
    shards: dict = {}
    for k in sorted(starts):
        c = dict(zip(keys, counts))[k]
        s = starts[k] // shard_size
        row = shards.setdefault(s, {"n_rows": 0, "total": 0,
                                    "first": k, "last": k})
        row["n_rows"] += 1
        row["total"] += c
        row["last"] = k
    return shards


def test_shard_manifest_matches_reference(ray_session):
    import ray

    keys = [3, 1, 7, 2, 9, 5]
    counts = [10, 25, 5, 30, 40, 12]
    got = {r["shard"]: r for r in packing.shard_manifest(
        _ds(ray, keys, counts), "doc_id", "n_tokens",
        shard_size=32).take_all()}
    want = _reference_manifest(keys, counts, 32)
    assert set(got) == set(want)
    for s, row in want.items():
        assert got[s]["n_rows"] == row["n_rows"]
        assert got[s]["total_n_tokens"] == row["total"]
        assert got[s]["first_doc_id"] == row["first"]
        assert got[s]["last_doc_id"] == row["last"]


def test_shard_manifest_layout_independent(ray_session):
    import ray

    rng = np.random.default_rng(5)
    keys = list(range(200))
    counts = rng.integers(0, 50, 200).tolist()
    a = sorted(packing.shard_manifest(_ds(ray, keys, counts), "doc_id",
                                      "n_tokens", shard_size=100).take_all(),
               key=lambda r: r["shard"])
    b = sorted(packing.shard_manifest(_ds(ray, keys, counts, parts=9),
                                      "doc_id", "n_tokens",
                                      shard_size=100).take_all(),
               key=lambda r: r["shard"])
    assert a == b
    # every row lands in exactly one shard; totals tile the corpus
    assert sum(r["n_rows"] for r in a) == 200
    assert sum(r["total_n_tokens"] for r in a) == sum(counts)


def test_shard_manifest_wide_row_running_total_semantics(ray_session):
    import ray

    # running-total bucketing, not next-fit: row 2 (width 100) STARTS at
    # offset 10 → it joins shard 0 (which then totals 110 > shard_size)
    # and pushes row 3 to shard 3 (offset 110 // 32); shards 1-2 are empty
    got = {r["shard"]: r for r in packing.shard_manifest(
        _ds(ray, [1, 2, 3], [10, 100, 5]), "doc_id", "n_tokens",
        shard_size=32).take_all()}
    assert set(got) == {0, 3}
    assert got[0]["n_rows"] == 2 and got[0]["last_doc_id"] == 2
    assert got[0]["total_n_tokens"] == 110
    assert got[3]["n_rows"] == 1 and got[3]["first_doc_id"] == 3


def test_shard_manifest_empty_and_validation(ray_session):
    import ray

    out = packing.shard_manifest(_ds(ray, [], []), "doc_id", "n_tokens",
                                 shard_size=8)
    assert out.take_all() == []
    with pytest.raises(ValueError, match="shard_size"):
        packing.shard_manifest(_ds(ray, [1], [1]), "doc_id", "n_tokens",
                               shard_size=0)


# ---------------------------------------------------------------------------
# epoch_shuffle


def _shuffle_rows(out):
    rows = out.take_all()
    return sorted((r["doc_id"], r["shard"], r["pos"], r["shuffle_key"])
                  for r in rows)


def _ids_ds(ray, ids, parts=1):
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    return ds.repartition(parts) if parts > 1 else ds


def test_epoch_shuffle_matches_md5_reference(ray_session):
    """Every row's shard/pos equals the single-process md5-sort reference:
    shard = int(md5[:8], 16) % n_shards, pos = rank within the shard by
    (full md5 hex, doc_id)."""
    import hashlib

    import ray

    ids = list(range(200))
    got = _shuffle_rows(packing.epoch_shuffle(
        _ids_ds(ray, ids, parts=7), epoch=3, n_shards=4, salt="s"))
    full = {i: hashlib.md5(f"epoch:3:s:{i}".encode()).hexdigest()
            for i in ids}
    expect = []
    for shard in range(4):
        members = sorted(
            (full[i], i) for i in ids
            if int(full[i][:8], 16) % 4 == shard)
        expect += [(i, shard, pos, h)
                   for pos, (h, i) in enumerate(members)]
    assert got == sorted(expect)


def test_epoch_shuffle_layout_independent_and_deterministic(ray_session):
    """Same (epoch, salt) → identical output whatever the block layout;
    changing the epoch produces a different permutation of the same rows."""
    import ray

    ids = list(range(300))
    a = _shuffle_rows(packing.epoch_shuffle(_ids_ds(ray, ids, parts=1)))
    b = _shuffle_rows(packing.epoch_shuffle(_ids_ds(ray, ids, parts=11)))
    assert a == b
    c = _shuffle_rows(packing.epoch_shuffle(
        _ids_ds(ray, ids, parts=3), epoch=1))
    assert c != a
    # both epochs are permutations: every shard's positions are 0..n-1
    for rows in (a, c):
        by_shard = {}
        for _, shard, pos, _ in rows:
            by_shard.setdefault(shard, []).append(pos)
        assert {i for _, i, _, _ in rows} == set(by_shard)
        for positions in by_shard.values():
            assert sorted(positions) == list(range(len(positions)))


def test_epoch_shuffle_validates_n_shards(ray_session):
    import ray

    with pytest.raises(ValueError):
        packing.epoch_shuffle(_ids_ds(ray, [1, 2]), n_shards=0)
