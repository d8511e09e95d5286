"""Training-data op semantics: dedup variants, similarity search (recall of
the ANN path vs brute force), text stats, multimodal plumbing."""

import contextlib

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions import dedup, similarity, textstats


def _docs_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


# ---------------------------------------------------------------------------
# pure kernels


def test_gopher_stats_rules_and_reason_precedence():
    """Every Gopher rule fires, in first-failing order: words before
    word_length before symbols before stopwords; a clean doc keeps."""
    # 41 words, mwl = (3 + 100 + 80) / 41 ≈ 4.46 — inside every window
    good = "the " + " ".join(["query"] * 20 + ["data"] * 20)
    too_short = "the query"                             # words
    # in-window word count but words too long → word_length
    long_words = "that " + " ".join(["elephants"] * 40)
    # word count + mwl ok (208/46 ≈ 4.52), saturated with '#' → symbols
    symbols = "the " + " ".join(["####"] * 20 + ["query"] * 25)
    # everything ok except no stopword from the 8-set → stopwords
    no_stop = " ".join(["query"] * 35 + ["a"] * 5)
    # word-count failure outranks a simultaneous word_length failure
    short_and_long = "supercalifragilistic"
    out = textstats.gopher_stats_batch(_docs_table([
        good, too_short, long_words, symbols, no_stop, short_and_long,
    ]))
    assert out["keep"].to_pylist() == [True, False, False, False, False, False]
    assert out["drop_reason"].to_pylist() == [
        None, "words", "word_length", "symbols", "stopwords", "words",
    ]
    # distinct stopword counting: 'the the the' is ONE distinct stopword
    rep = textstats.gopher_stats_batch(_docs_table(["the the the", "the and of"]))
    assert rep["n_stop_distinct"].to_pylist() == [1, 3]
    # ellipsis marks count into the symbol ratio (non-overlapping '...')
    ell = textstats.gopher_stats_batch(_docs_table(["wait... what... no"]))
    assert ell["symbol_ratio"].to_pylist()[0] == pytest.approx(2 / 3)


def test_fineweb_stats_rules_and_reason_precedence():
    """FineWeb line-shape gate: every rule fires, reasons resolve in
    punct → short_lines → dup_lines order, and dup_chars counts EVERY
    occurrence of a within-page duplicated line."""
    dup_line = "This duplicated line is long enough to dominate chars."
    docs = [
        # keep: 2/3 punct-ending, 1/3 short, no dups
        "Hello there, this is a fine long prose line.\n"
        "Another long and thoughtful sentence about the web.\nshort",
        # punct: zero of three lines ends in terminal punctuation
        "this line just ends with a word and keeps going on\n"
        "a second line that also trails off without any stop\n"
        "third line likewise ending plain",
        # short_lines: all punct-ending but 3/3 short (≥ 0.67)
        "Hi.\nNo!\nOk?",
        # dup_lines: punct+short pass, duplicated line carries most chars
        f"{dup_line}\n{dup_line}\nUnique closing line, also fairly long.",
        # precedence: fails punct AND short_lines → first rule wins
        "no punct here but quite a long line overall yes\ntiny\nmini",
        # empty text → one empty line: fails punct, never divides by zero
        "",
    ]
    out = textstats.fineweb_stats_batch(_docs_table(docs))
    assert out["keep"].to_pylist() == [True, False, False, False, False, False]
    assert out["drop_reason"].to_pylist() == [
        None, "punct", "short_lines", "dup_lines", "punct", "punct",
    ]
    assert out["n_lines"].to_pylist() == [3, 3, 3, 3, 3, 1]
    assert out["n_punct"].to_pylist() == [2, 0, 3, 3, 0, 0]
    assert out["n_short"].to_pylist() == [1, 0, 3, 0, 2, 1]
    # both copies of the duplicated line count, nothing else
    assert out["dup_chars"].to_pylist()[3] == 2 * len(dup_line)
    assert out["dup_chars"].to_pylist()[:3] == [0, 0, 0]
    assert out["total_chars"].to_pylist()[5] == 0


def test_bpe_pair_count_partials():
    """Adjacent-pair census: pairs never cross word or document boundaries,
    counts fold per block, astral codepoints survive the utf-32 packing."""
    out = textstats.bpe_pair_count_partials(_docs_table(["ab ab  cd", "bc"]))
    got = dict(zip(out["pair"].to_pylist(), out["n_part"].to_pylist()))
    assert got == {"ab": 2, "cd": 1, "bc": 1}
    # no pair spans the doc boundary (b-of-doc1 + b-of-doc2 absent), and
    # leading/trailing whitespace contributes nothing
    out2 = textstats.bpe_pair_count_partials(_docs_table([" xy", "yx "]))
    got2 = dict(zip(out2["pair"].to_pylist(), out2["n_part"].to_pylist()))
    assert got2 == {"xy": 1, "yx": 1}
    out3 = textstats.bpe_pair_count_partials(_docs_table(["h😀o"]))
    assert set(out3["pair"].to_pylist()) == {"h😀", "😀o"}
    empty = textstats.bpe_pair_count_partials(_docs_table(["", "a", " "]))
    assert empty["pair"].to_pylist() == []


def test_shingles_and_jaccard():
    a = dedup.shingle_set("the quick brown fox jumps", 3)
    b = dedup.shingle_set("the quick brown fox leaps", 3)
    sim = dedup.jaccard(a, b)
    assert 0 < sim < 1
    assert dedup.jaccard(a, a) == 1.0
    assert dedup.jaccard(set(), set()) == 1.0


def test_minhash_estimates_jaccard():
    hasher = dedup.MinHasher(num_perm=256)
    a = dedup.shingle_set(" ".join(f"w{i}" for i in range(100)), 3)
    b = dedup.shingle_set(" ".join(f"w{i}" for i in range(20, 120)), 3)
    sig_a, sig_b = hasher.signature(a), hasher.signature(b)
    estimate = float(np.mean(sig_a == sig_b))
    exact = dedup.jaccard(a, b)
    assert abs(estimate - exact) < 0.12, f"minhash estimate {estimate} vs exact {exact}"


def test_simhash_similar_texts_close():
    h1 = dedup.SimHashBatch.simhash("the quick brown fox jumps over the lazy dog")
    h2 = dedup.SimHashBatch.simhash("the quick brown fox jumps over the lazy cat")
    h3 = dedup.SimHashBatch.simhash("completely different words entirely here now")
    near = bin(h1 ^ h2).count("1")
    far = bin(h1 ^ h3).count("1")
    assert near < far, f"similar texts not closer: {near} vs {far}"


def test_token_count_batch():
    out = textstats.token_count_batch(_docs_table(["a b  c", "", "one"]))
    assert out.column("n_tokens").to_pylist() == [3, 0, 1]
    assert out.column("n_chars").to_pylist() == [6, 0, 3]


def test_langid_batch():
    out = textstats.langid_batch(_docs_table([
        "the cat and the dog of the house",
        "der Hund und die Katze ist nicht da",
        "xxxx yyyy zzzz",
    ]))
    assert out.column("pred_lang").to_pylist()[:2] == ["en", "de"]
    assert out.column("pred_lang").to_pylist()[2] == "und"


def test_hyperplane_lsh_deterministic():
    lsh_a = similarity.HyperplaneLSH(dim=8, bits=10, seed=7)
    lsh_b = similarity.HyperplaneLSH(dim=8, bits=10, seed=7)
    m = np.random.RandomState(0).randn(32, 8)
    assert (lsh_a.bucket(m) == lsh_b.bucket(m)).all()


# ---------------------------------------------------------------------------
# Ray pipelines


@pytest.fixture(scope="module")
def near_dup_docs(ray_session):
    import ray.data

    base = " ".join(f"tok{i}" for i in range(60))
    variant = " ".join(f"tok{i}" for i in range(59)) + " tokX"  # ~97% shingle overlap
    unrelated = " ".join(f"other{i}" for i in range(60))
    texts = [base, variant, unrelated, base]  # doc 3 is an exact dup of doc 0
    return ray.data.from_arrow(_docs_table(texts))


def test_exact_dedup_keeps_first(near_dup_docs):
    out = {row["content_hash"]: row["keeper_doc_id"] for row in dedup.exact_dedup(near_dup_docs).take_all()}
    assert len(out) == 3, "exact dup not collapsed"
    assert 0 in out.values() and 3 not in out.values(), "first-wins violated"


def test_minhash_clusters_near_dups(near_dup_docs):
    clusters = {row["doc_id"]: row["cluster_id"] for row in dedup.minhash_dedup(
        near_dup_docs, threshold=0.8, concurrency=1).take_all()}
    assert clusters.get(0) == clusters.get(3) == 0, "exact dups not clustered"
    assert clusters.get(1) == 0, "near dup not clustered with base"
    assert clusters.get(2, 2) == 2, "unrelated doc clustered"


def test_minhash_cluster_strategies_agree(near_dup_docs):
    """The distributed path (shingle joins + min-label propagation) must
    produce exactly the driver union-find clusters."""
    driver = sorted(
        (row["doc_id"], row["cluster_id"])
        for row in dedup.minhash_dedup(
            near_dup_docs, threshold=0.8, cluster_strategy="driver"
        ).take_all()
    )
    distributed = sorted(
        (row["doc_id"], row["cluster_id"])
        for row in dedup.minhash_dedup(
            near_dup_docs, threshold=0.8, cluster_strategy="distributed"
        ).take_all()
    )
    assert driver == distributed
    assert driver, "fixture must produce at least one cluster"


def test_connected_components_ds_matches_union_find(ray_session):
    """Min-label propagation on a multi-component graph with a chain (forces
    >1 propagation round) vs the obvious driver answer."""
    import ray.data

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (5, 6)]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.int64()),
                "b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    labels = {
        row["node"]: row["label"]
        for row in dedup.connected_components_ds(pairs).take_all()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_simhash_pairs_find_dups(near_dup_docs):
    pairs = {(row["a"], row["b"]) for row in dedup.simhash_pairs(
        near_dup_docs, max_hamming=3, concurrency=1).take_all()}
    assert (0, 3) in pairs, "exact dup pair missed by simhash"


def test_ngram_jaccard_pairs(near_dup_docs):
    rows = dedup.ngram_jaccard_pairs(near_dup_docs, threshold=0.5).take_all()
    pairs = {(row["a"], row["b"]): row["jaccard"] for row in rows}
    assert pairs.get((0, 3)) == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5


def test_ngram_jaccard_strategies_agree(near_dup_docs):
    """The distributed verify (shingle equijoin rounds, nothing doc-sized on
    the driver) must produce exactly the driver path's (a, b, jaccard)."""
    driver = [
        (row["a"], row["b"], row["jaccard"])
        for row in dedup.ngram_jaccard_pairs(
            near_dup_docs, threshold=0.5, strategy="driver"
        ).take_all()
    ]
    distributed = [
        (row["a"], row["b"], row["jaccard"])
        for row in dedup.ngram_jaccard_pairs(
            near_dup_docs, threshold=0.5, strategy="distributed"
        ).take_all()
    ]
    assert driver == distributed
    assert driver, "fixture must produce at least one verified pair"


def test_connected_components_nonconvergence_warns(ray_session):
    """A chain longer than max_iter rounds must raise a RuntimeWarning rather
    than silently returning split cluster labels (ADVICE round 2)."""
    import warnings

    import ray.data

    # pointer doubling covers distance ~2^r+... per round; 60 hops is well
    # beyond what max_iter=2 rounds can reach
    chain = [(i, i + 1) for i in range(60)]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in chain], pa.int64()),
                "b": pa.array([b for _, b in chain], pa.int64()),
            }
        )
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        dedup.connected_components_ds(pairs, max_iter=2).take_all()
    assert any(
        issubclass(w.category, RuntimeWarning) and "did not converge" in str(w.message)
        for w in caught
    )


@pytest.fixture(scope="module")
def embeddings_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(0)
    vectors = rng.randn(300, 16).astype(np.float32)
    vectors[7] = vectors[3] * 1.5  # same direction → cosine 1 with 3
    table = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vectors],
                                  pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(300)], pa.int32()),
        }
    )
    return ray.data.from_arrow(table)


def test_brute_force_topk_exact(embeddings_ds):
    import pyarrow.parquet  # noqa: F401

    query = embeddings_ds.take(4)[3]["embedding"]
    top = similarity.brute_force_topk(embeddings_ds, query, k=5)
    ids = top.column("vec_id").to_pylist()
    assert ids[0] in (3, 7) and ids[1] in (3, 7), "the identical-direction pair must lead"
    cosines = top.column("cosine").to_pylist()
    assert cosines == sorted(cosines, reverse=True)
    assert cosines[0] == pytest.approx(1.0)


def test_pq_topk_matches_single_process_reference(embeddings_ds):
    from mhtml_to_html_ray.functions.rounding import round_half_away

    rows = embeddings_ds.take(300)
    vecs = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    # 16-dim vectors → 4 subspaces × 4 dims; codebooks = vec_id<6 subvectors
    codebooks = vecs[:6].reshape(6, 4, 4).transpose(1, 0, 2)
    query = vecs[3]

    # plain reference: encode + ADC, same rounding/tie contract
    def d2(a, b):
        return float(round_half_away(((a - b) ** 2).sum(), 4))

    table = [[d2(query[j * 4:(j + 1) * 4], codebooks[j][c])
              for c in range(6)] for j in range(4)]
    dists = {}
    for i, v in zip(ids, vecs):
        total = 0.0
        for j in range(4):
            cds = [d2(v[j * 4:(j + 1) * 4], codebooks[j][c])
                   for c in range(6)]
            total = total + table[j][int(np.argmin(cds))]
        dists[int(i)] = float(round_half_away(total, 4))
    want = sorted(dists.items(), key=lambda p: (p[1], p[0]))[:10]

    got = similarity.pq_topk(embeddings_ds, query, codebooks, k=10)
    assert list(zip(got.column("vec_id").to_pylist(),
                    got.column("approx_dist").to_pylist())) == want
    # vec 3 is its own nearest code path: distance 0 at the top
    assert got.column("vec_id")[0].as_py() == 3
    assert got.column("approx_dist")[0].as_py() == 0.0


def test_pq_topk_layout_independent(embeddings_ds):
    rows = embeddings_ds.take(6)
    vecs = np.array([r["embedding"] for r in rows], np.float64)
    codebooks = vecs.reshape(6, 4, 4).transpose(1, 0, 2)
    query = vecs[3]
    a = similarity.pq_topk(embeddings_ds, query, codebooks, k=7)
    b = similarity.pq_topk(embeddings_ds.repartition(9), query, codebooks,
                           k=7)
    assert a.equals(b)


def test_pq_encode_validates_dim():
    with pytest.raises(ValueError, match="dim"):
        similarity.pq_encode_codes(np.zeros((2, 10)), np.zeros((4, 3, 4)))


def test_lsh_ann_recall(embeddings_ds):
    query = embeddings_ds.take(4)[3]["embedding"]
    exact = set(similarity.brute_force_topk(embeddings_ds, query, k=10).column("vec_id").to_pylist())
    approx = set(similarity.lsh_topk(embeddings_ds, query, k=10, bits=6).column("vec_id").to_pylist())
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"ANN recall too low: {recall}"
    assert {3, 7} <= approx, "the top matches must survive bucketing"


def test_cosine_near_dup_pairs(embeddings_ds):
    pairs = similarity.cosine_near_dup_pairs(embeddings_ds, threshold=0.99).take_all()
    assert any((row["a"], row["b"]) == (3, 7) for row in pairs), "identical-direction pair missed"


def test_media_decode_stub_plumbing(ray_session):
    import ray.data

    from mhtml_to_html_ray.functions.multimodal import MediaDecodeBatch, decode_media

    docs = ray.data.from_arrow(_docs_table(["hello world", "abc", "x" * 1000]))
    out = decode_media(docs, batch_size=2, concurrency=1).take_all()
    assert len(out) == 3
    assert out[0]["n_bytes"] == len("hello world")
    assert out[0]["width"] == len("hello world") % 640 + 1


def _png_bytes(width: int, height: int) -> bytes:
    import struct

    ihdr = struct.pack(">II", width, height) + bytes([8, 6, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00")


def _gif_bytes(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def _jpeg_bytes(width: int, height: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", height, width) + b"\x03" + bytes(9))
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav_bytes(channels: int, rate: int, n_frames: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as handle:
        handle.setnchannels(channels)
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def test_media_decode_real_stdlib(ray_session):
    """The real=True path decodes PNG/GIF/JPEG/WAV metadata with stdlib only;
    codec-requiring containers and garbage surface as error rows."""
    import ray.data

    from mhtml_to_html_ray.functions.multimodal import MediaDecodeBatch

    payloads = [
        _png_bytes(640, 480),
        _gif_bytes(320, 200),
        _jpeg_bytes(800, 600),
        _wav_bytes(2, 8000, 8000),
        b"\x1a\x45\xdf\xa3" + bytes(32),  # webm/EBML: needs a codec
        b"not media at all",
        b"\x00\x00\x00\x18ftypmp42" + bytes(32),  # mp4 with no moov: corrupt
    ]
    types = ["image/png", "image/gif", "image/jpeg", "audio/wav", "video/webm",
             "application/octet-stream", "video/mp4"]
    media = pa.table(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )
    out = (
        ray.data.from_arrow(media)
        .map_batches(MediaDecodeBatch, fn_constructor_kwargs={"real": True},
                     batch_format="pyarrow", batch_size=2, concurrency=1)
        .take_all()
    )
    rows = {row["doc_id"]: row for row in out}
    assert (rows[0]["width"], rows[0]["height"], rows[0]["frames"]) == (640, 480, 1)
    assert (rows[1]["width"], rows[1]["height"]) == (320, 200)
    assert (rows[2]["width"], rows[2]["height"]) == (800, 600)
    assert rows[3]["channels"] == 2
    assert rows[3]["sample_rate_hz"] == 8000
    assert rows[3]["frames"] == 8000
    assert rows[3]["duration_ms"] == 1000
    for i in range(4):
        assert rows[i]["error"] is None
    assert rows[4]["error"].startswith("NotImplementedError")
    assert rows[4]["width"] is None
    assert rows[5]["error"].startswith("ValueError")
    # mp4 is a REAL decoder now (box walk): a moov-less stub is corrupt,
    # not codec-blocked
    assert rows[6]["error"] == "ValueError: mp4 without moov box"


def test_media_decode_real_on_error_raise():
    from mhtml_to_html_ray.functions.multimodal import MediaDecodeBatch

    batch = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["video/webm"], pa.string()),
            "payload": pa.array([b"\x1a\x45\xdf\xa3" + bytes(8)], pa.large_binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        MediaDecodeBatch(real=True, on_error="raise")(batch)
    # truncated/corrupt image payloads are ValueError, not a crash
    bad = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["image/png"], pa.string()),
            "payload": pa.array([b"\x89PNG\r\n\x1a\n\x00\x00"], pa.large_binary()),
        }
    )
    out = MediaDecodeBatch(real=True)(bad)
    assert out.column("error")[0].as_py().startswith("ValueError")


def test_hll_accuracy_and_merge():
    from mhtml_to_html_ray.functions.sketches import HyperLogLog

    full = HyperLogLog(b=12)
    left, right = HyperLogLog(b=12), HyperLogLog(b=12)
    n = 20000
    for i in range(n):
        value = f"token-{i}"
        full.add(value)
        (left if i % 2 else right).add(value)
    estimate = full.estimate()
    assert abs(estimate - n) / n < 0.05, f"HLL estimate {estimate} vs {n}"
    merged = left.merge(right)
    assert abs(merged.estimate() - estimate) < 1e-9, "merge must equal the union sketch"
    round_trip = HyperLogLog.loads(full.dumps())
    assert round_trip.estimate() == estimate


def test_hll_small_cardinality_linear_counting():
    from mhtml_to_html_ray.functions.sketches import HyperLogLog

    sketch = HyperLogLog(b=12)
    for i in range(50):
        sketch.add(f"v{i}")
    assert abs(sketch.estimate() - 50) < 3


def test_approx_distinct_tokens_close_to_exact(ray_session):
    import duckdb

    from mhtml_to_html_ray.pipelines.queries import q_approx_distinct_tokens

    estimate = q_approx_distinct_tokens("/root/testdata/sf0.001").column(
        "approx_distinct_tokens")[0].as_py()
    exact = duckdb.connect().execute(
        "SELECT COUNT(DISTINCT token) FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) "
        "AS token FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))"
    ).fetchone()[0]
    assert abs(estimate - exact) / max(exact, 1) < 0.05, f"{estimate} vs exact {exact}"


def test_winnow_fingerprints_detect_shared_passage(ray_session):
    import ray.data

    from mhtml_to_html_ray.functions.dedup import winnow_overlap_pairs

    passage = "a long shared passage of text that appears verbatim in two documents"
    texts = [
        f"intro one {passage} outro one",
        f"different intro {passage} and a different ending entirely",
        "nothing in common with the others at all in any way",
    ]
    ds = ray.data.from_arrow(_docs_table(texts))
    pairs = {(row["a"], row["b"]): row["shared_fingerprints"]
             for row in winnow_overlap_pairs(ds, min_shared=3).take_all()}
    assert (0, 1) in pairs, "shared passage not detected"
    assert all(pair == (0, 1) for pair in pairs), f"false positives: {pairs}"


def test_winnow_strategies_agree(ray_session):
    import ray.data

    from mhtml_to_html_ray.functions.dedup import winnow_overlap_pairs

    passage = "a long shared passage of text that appears verbatim in two documents"
    texts = [f"intro {passage} one", f"other {passage} two", "unrelated text entirely"]
    ds = ray.data.from_arrow(_docs_table(texts))
    driver = winnow_overlap_pairs(ds, min_shared=3, strategy="driver").take_all()
    grouped = winnow_overlap_pairs(ds, min_shared=3, strategy="groupby").take_all()
    assert driver == grouped, "the two physical plans must agree"


@contextlib.contextmanager
def _ban_driver_collect():
    """Fail the test if Dataset.take_all/to_pandas runs inside the block —
    the pin that a distributed plan keeps pair-sized data off the driver
    (VERDICT round 3 #1/#2)."""
    import ray.data

    def banned(self, *a, **k):  # pragma: no cover - the assertion IS the point
        raise AssertionError("driver-side collect inside a distributed plan")

    orig_take_all = ray.data.Dataset.take_all
    orig_to_pandas = ray.data.Dataset.to_pandas
    ray.data.Dataset.take_all = banned
    ray.data.Dataset.to_pandas = banned
    try:
        yield
    finally:
        ray.data.Dataset.take_all = orig_take_all
        ray.data.Dataset.to_pandas = orig_to_pandas


def test_winnow_groupby_plan_never_collects_pairs(ray_session):
    """strategy="groupby" must build (and threshold-filter) the counted pair
    table as a Dataset — no take_all/to_pandas during plan construction."""
    import ray.data

    from mhtml_to_html_ray.functions.dedup import winnow_overlap_pairs

    passage = "a long shared passage of text that appears verbatim in two documents"
    texts = [f"intro {passage} one", f"other {passage} two", "unrelated text entirely"]
    ds = ray.data.from_arrow(_docs_table(texts))
    with _ban_driver_collect():
        out = winnow_overlap_pairs(ds, min_shared=3, strategy="groupby")
        assert isinstance(out, ray.data.Dataset)
    rows = out.take_all()
    assert {(r["a"], r["b"]) for r in rows} == {(0, 1)}


def test_minhash_groupby_pairs_stay_dataset(near_dup_docs):
    """pair_strategy="groupby" + cluster_strategy="distributed" is the
    100-TB plan: candidate pairs, verify, and clustering must all run as
    Datasets — the whole plan builds AND materializes without a single
    take_all/to_pandas (the driver holds nothing pair-sized)."""
    import ray.data

    from mhtml_to_html_ray.functions.dedup import _candidate_pairs_from_lsh, MinHashLSHBatch

    lsh_rows = near_dup_docs.map_batches(MinHashLSHBatch(), batch_format="pyarrow")
    with _ban_driver_collect():
        pairs = _candidate_pairs_from_lsh(lsh_rows, 64, strategy="groupby")
        assert isinstance(pairs, ray.data.Dataset)
        pairs = pairs.materialize()
    got = sorted((r["a"], r["b"]) for r in pairs.take_all())
    assert (0, 3) in got and got == sorted(set(got)), got

    with _ban_driver_collect():
        clusters = dedup.minhash_dedup(
            near_dup_docs, threshold=0.8,
            pair_strategy="groupby", cluster_strategy="distributed",
        ).materialize()
    labels = {r["doc_id"]: r["cluster_id"] for r in clusters.take_all()}
    assert labels.get(0) == labels.get(3) == 0 and labels.get(1) == 0
    # and the distributed plan agrees with the driver plan exactly
    driver = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.minhash_dedup(
            near_dup_docs, threshold=0.8,
            pair_strategy="driver", cluster_strategy="driver",
        ).take_all()
    }
    assert labels == driver


def test_repetition_stats_batch():
    import pyarrow as pa

    from mhtml_to_html_ray.functions import textstats

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a b a b a b",      # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            "w x y z",           # 3 distinct of 3
            "",                  # no bigrams
        ], pa.string()),
    })
    out = textstats.repetition_stats_batch(batch)
    assert out.column("n_bigrams").to_pylist() == [5, 3, 0]
    assert out.column("n_distinct_bigrams").to_pylist() == [2, 3, 0]
    assert out.column("dup_bigram_frac").to_pylist() == [0.6, 0.0, 0.0]


def test_stopword_stats_adjacent_stopwords_counted():
    """The space-isolation trick must count back-to-back stopwords ('the the')
    that a plain substring count would miss."""
    import pyarrow as pa

    from mhtml_to_html_ray.functions import textstats

    batch = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["the the and of x"], pa.string()),
    })
    out = textstats.stopword_stats_batch(batch)
    assert out.column("n_tokens").to_pylist() == [5]
    assert out.column("n_stopwords").to_pylist() == [4]


def test_asof_join_small(ray_session):
    import numpy as np
    import ray.data

    from mhtml_to_html_ray.functions.joins import asof_join, range_join_count

    def ts(minute):
        return np.datetime64("2024-01-01T00:00", "us") + np.timedelta64(minute, "m")

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "t": pa.array([ts(10), ts(5), ts(1), ts(10)], pa.timestamp("us")),
        "lid": pa.array([100, 101, 102, 103], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "t": pa.array([ts(2), ts(7), ts(20)], pa.timestamp("us")),
        "rid": pa.array([200, 201, 202], pa.int64()),
    }))
    rows = sorted(
        (r["lid"], r["rid_r"])
        for r in asof_join(left, right, by="k", on="t", right_suffix="_r").take_all()
    )
    # lid 100 (t=10) -> rid 201 (t=7); lid 101 (t=5) -> rid 200 (t=2);
    # lid 102 (t=1) has no prior right row; k=2's right row is later -> dropped
    assert rows == [(100, 201), (101, 200)]
    counts = {
        r["lid"]: r["n"]
        for r in range_join_count(
            left, right, by="k", on="t",
            before=np.timedelta64(4, "m"), after=np.timedelta64(4, "m"),
            count_name="n",
        ).take_all()
    }
    # lid 100 (t=10): right t=7 within ±4 -> 1; lid 101 (t=5): t=2 and t=7 -> 2
    # lid 102 (t=1): t=2 -> 1; lid 103 (k=2, t=10): t=20 outside -> 0
    assert counts == {100: 1, 101: 2, 102: 1, 103: 0}


def test_count_min_sketch_accuracy_and_merge():
    from mhtml_to_html_ray.functions.sketches import CountMinSketch

    full = CountMinSketch()
    left, right = CountMinSketch(), CountMinSketch()
    for i in range(5000):
        value = f"tok-{i % 37}"  # skewed: 37 keys, ~135 each
        full.add(value)
        (left if i % 2 else right).add(value)
    assert full.query("tok-0") >= 136  # CMS never underestimates
    assert full.query("tok-0") <= 160  # and stays tight at this load
    merged = left.merge(right)
    assert merged.query("tok-5") == full.query("tok-5"), "merge must equal the union sketch"
    round_trip = CountMinSketch.loads(full.dumps())
    assert round_trip.query("tok-7") == full.query("tok-7")


def test_cms_heavy_hitters_match_exact_topk(ray_session):
    import collections

    import ray.data

    from mhtml_to_html_ray.functions.sketches import cms_heavy_hitters

    rng_texts = []
    exact: collections.Counter = collections.Counter()
    for i in range(200):
        words = [f"hot{j}" for j in range(10) for _ in range(10 - j)] + [f"cold{i}-{j}" for j in range(5)]
        rng_texts.append(" ".join(words))
        exact.update(words)
    ds = ray.data.from_arrow(_docs_table(rng_texts))

    def tokens(batch):
        for text in batch.column("text").to_pylist():
            yield from text.split()

    approx = cms_heavy_hitters(ds, tokens, k=10)
    approx_keys = {key for key, _ in approx}
    exact_keys = {key for key, _ in exact.most_common(10)}
    assert approx_keys == exact_keys, f"heavy hitters missed: {exact_keys - approx_keys}"
    # counts are close (CMS overestimates only, bounded by the skew here)
    exact_map = dict(exact)
    for key, count in approx:
        assert count >= exact_map[key]
        assert count <= exact_map[key] * 1.1 + 50


def test_hash_join_matches_pandas_merge(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "key": rng.integers(0, 50, 200),
        "lv": rng.integers(0, 1000, 200),
    })
    right = pd.DataFrame({
        "key": rng.integers(0, 80, 120),          # some keys match, some don't
        "rv": rng.integers(0, 1000, 120),
        "lv": rng.integers(0, 9, 120),            # name collision -> suffixed
    })
    got = (
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            key="key", num_buckets=8,
        )
        .to_pandas()
        .sort_values(["key", "lv", "rv", "lv_r"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="key", how="inner", suffixes=("", "_r"))
        .sort_values(["key", "lv", "rv", "lv_r"])
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["key"].dtype == np.int64 and got["rv"].dtype == np.int64


def test_hash_join_string_key_and_empty_side(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    left = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.com", "b.com", "a.com"], pa.string()),
        "n": pa.array([1, 2, 3], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.com", "z.com"], pa.string()),
        "rank": pa.array([10, 99], pa.int64()),
    }))
    got = hash_join(left, right, key="host", num_buckets=4).to_pandas()
    got = got.sort_values(["host", "n"]).reset_index(drop=True)
    assert got["host"].tolist() == ["a.com", "a.com"]
    assert got["n"].tolist() == [1, 3]
    assert got["rank"].tolist() == [10, 10]

    empty_right = ray.data.from_arrow(pa.table({
        "host": pa.array([], pa.string()),
        "rank": pa.array([], pa.int64()),
    }))
    assert hash_join(left, empty_right, key="host", num_buckets=4).count() == 0


def test_asof_join_deterministic_on_right_ties(ray_session):
    """Two right rows at the SAME timestamp: the matched payload must be
    the same whichever shuffle order the rows arrive in (ADVICE r2)."""
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "t": pa.array([100], pa.int64()),
        "lid": pa.array([1], pa.int64()),
    }))
    results = set()
    for order in ([200, 201], [201, 200]):
        right = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "t": pa.array([50, 50], pa.int64()),
            "rid": pa.array(order, pa.int64()),
        }))
        rows = asof_join(left, right, by="k", on="t").take_all()
        results.add(rows[0]["rid_r"])
    assert results == {201}, "tie must resolve to the max payload both times"


def test_sketch_tree_reduce_matches_flat_merge(ray_session):
    """The hierarchical sketch merge (fanin-bounded driver traffic) must be
    exactly equivalent to folding every partial on the driver — max/add/union
    merges are associative+commutative, so a tiny fanin is a pure topology
    change."""
    import ray.data

    from mhtml_to_html_ray.functions import sketches

    texts = [f"tok{i % 37} tok{i % 11} tok{i}" for i in range(200)]
    docs = ray.data.from_arrow(_docs_table(texts)).repartition(16)

    def values(batch):
        for text in batch.column("text").to_pylist():
            yield from text.split()

    flat = sketches.hll_distinct(docs, values, fanin=10_000)
    tree = sketches.hll_distinct(docs, values, fanin=2)
    assert tree == flat

    flat_top = sketches.cms_heavy_hitters(docs, values, k=10, fanin=10_000)
    tree_top = sketches.cms_heavy_hitters(docs, values, k=10, fanin=2)
    assert tree_top == flat_top


def test_connected_components_long_chain_converges_fast(ray_session):
    """Pointer doubling: a 100-hop chain converges well inside max_iter=10
    (min-label-only propagation would need 100 rounds)."""
    import warnings

    import ray.data

    chain = [(i, i + 1) for i in range(100)]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in chain], pa.int64()),
                "b": pa.array([b for _, b in chain], pa.int64()),
            }
        )
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = {
            row["node"]: row["label"]
            for row in dedup.connected_components_ds(pairs, max_iter=10).take_all()
        }
    assert not any(issubclass(w.category, RuntimeWarning) for w in caught)
    assert labels == {i: 0 for i in range(101)}


def test_media_decode_oversized_dims_error_row():
    """A corrupt PNG declaring u32 dimensions beyond int32 must surface as a
    ValueError row, not crash the batch after the decode try/except."""
    import struct

    from mhtml_to_html_ray.functions.multimodal import MediaDecodeBatch

    ihdr = struct.pack(">II", 0x80000000, 10) + bytes([8, 6, 0, 0, 0])
    bad_png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
               + b"\x00\x00\x00\x00")
    batch = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["image/png"], pa.string()),
            "payload": pa.array([bad_png], pa.large_binary()),
        }
    )
    out = MediaDecodeBatch(real=True)(batch)
    assert out.column("error")[0].as_py().startswith("ValueError")
    assert out.column("width")[0].as_py() is None


def test_topk_rows_tie_break_deterministic():
    """Ties at the k boundary resolve by smallest vec_id on the ROUNDED
    cosine — matching the driver's (-cosine, vec_id) merge order."""
    from mhtml_to_html_ray.functions.similarity import _topk_rows

    ids = np.array([9, 3, 7, 1, 5], dtype=np.int64)
    sims = np.array([1.0, 1.0, 1.0, 1.0, 1.0])
    out_ids, out_cos = _topk_rows(ids, sims, 3)
    assert out_ids.tolist() == [1, 3, 5]
    assert out_cos.tolist() == [1.0, 1.0, 1.0]
    # sub-1e-6 noise must not reorder ties
    noisy = np.array([1.0, 1.0 - 2e-8, 1.0 + 2e-8, 1.0, 1.0 - 1e-8])
    out_ids2, _ = _topk_rows(ids, noisy, 3)
    assert out_ids2.tolist() == [1, 3, 5]


def test_hash_join_big_int64_payload_and_null_keys(ray_session):
    """Arrow-native bucket join: int64 payloads above 2**53 survive
    bit-exact (no pandas float widening) and null keys never match (SQL
    inner-join semantics)."""
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    big = 2**53 + 1
    left = ray.data.from_arrow(pa.table(
        {"key": pa.array([1, 2, None], pa.int64()),
         "big_id": pa.array([big, big + 2, big + 4], pa.int64())}))
    right = ray.data.from_arrow(pa.table(
        {"key": pa.array([1, None], pa.int64()),
         "tag": pa.array(["x", "y"], pa.string())}))
    rows = hash_join(left, right, key="key").take_all()
    assert len(rows) == 1, rows  # null keys must not pair up
    assert rows[0]["key"] == 1
    assert rows[0]["big_id"] == big  # exact — 2**53+1, not 2**53
    assert rows[0]["tag"] == "x"


def test_hash_join_null_key_in_batch_does_not_misbucket(ray_session):
    """A batch containing a null key must not float-widen the key column and
    hash every key in that batch into the wrong bucket (silent match loss)."""
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    left = ray.data.from_arrow(pa.table(
        {"key": pa.array([1, None, 2, 3], pa.int64()),
         "lv": pa.array([10, 0, 20, 30], pa.int64())}))
    right = ray.data.from_arrow(pa.table(
        {"key": pa.array([1, 2, 3], pa.int64()),
         "rv": pa.array(["a", "b", "c"], pa.string())}))
    rows = sorted((r["key"], r["lv"], r["rv"])
                  for r in hash_join(left, right, key="key").take_all())
    assert rows == [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")]


def test_hash_join_modes_match_pandas_semantics(ray_session):
    """left / semi / anti agree with the pandas reference on a random frame
    with partial key overlap and duplicate keys on both sides."""
    import numpy as np
    import pandas as pd
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "key": rng.integers(0, 40, 150),
        "lv": rng.integers(0, 1000, 150),
    })
    right = pd.DataFrame({
        "key": rng.integers(20, 60, 90),          # half the range overlaps
        "rv": rng.integers(0, 1000, 90),
    })
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)

    got_left = (
        hash_join(lds, rds, key="key", num_buckets=8, how="left")
        .to_pandas().sort_values(["key", "lv", "rv"]).reset_index(drop=True)
    )
    want_left = (
        left.merge(right, on="key", how="left")
        .sort_values(["key", "lv", "rv"]).reset_index(drop=True)[got_left.columns]
    )
    # unmatched rv is null → pandas float64 on the reference side; compare values
    assert got_left["key"].tolist() == want_left["key"].tolist()
    assert got_left["lv"].tolist() == want_left["lv"].tolist()
    assert got_left["rv"].fillna(-1).astype("int64").tolist() == \
        want_left["rv"].fillna(-1).astype("int64").tolist()

    matched = set(right["key"])
    got_semi = (
        hash_join(lds, rds, key="key", num_buckets=8, how="semi")
        .to_pandas().sort_values(["key", "lv"]).reset_index(drop=True)
    )
    want_semi = (
        left[left["key"].isin(matched)]
        .sort_values(["key", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_semi, want_semi[got_semi.columns])
    # semi emits each left row exactly once despite duplicate right keys
    assert len(got_semi) == int(left["key"].isin(matched).sum())

    got_anti = (
        hash_join(lds, rds, key="key", num_buckets=8, how="anti")
        .to_pandas().sort_values(["key", "lv"]).reset_index(drop=True)
    )
    want_anti = (
        left[~left["key"].isin(matched)]
        .sort_values(["key", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_anti, want_anti[got_anti.columns])


def test_hash_join_modes_null_key_semantics(ray_session):
    """SQL null-key contract per mode: inner/semi drop null-key left rows,
    left/anti keep them (the equality predicate can never be true)."""
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    left = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2, 3, None, 5], pa.int64()),
         "lv": pa.array(list("abcde"), pa.string())}))
    right = ray.data.from_arrow(pa.table(
        {"k": pa.array([2, 2, 3, None, 9], pa.int64()),
         "rv": pa.array([20, 21, 30, 99, 90], pa.int64())}))

    def rows(how):
        out = hash_join(left, right, key="k", num_buckets=4, how=how).take_all()
        return sorted((r["lv"], r["k"], r.get("rv")) for r in out)

    assert rows("inner") == [("b", 2, 20), ("b", 2, 21), ("c", 3, 30)]
    assert rows("left") == [
        ("a", 1, None), ("b", 2, 20), ("b", 2, 21), ("c", 3, 30),
        ("d", None, None), ("e", 5, None),
    ]
    assert rows("semi") == [("b", 2, None), ("c", 3, None)]
    assert rows("anti") == [("a", 1, None), ("d", None, None), ("e", 5, None)]


def test_hash_join_modes_empty_right_and_bad_mode(ray_session):
    import pytest
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    left = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2], pa.int64()),
         "lv": pa.array(["a", "b"], pa.string())}))
    empty_right = ray.data.from_arrow(pa.table(
        {"k": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())}))

    # anti against an empty right keeps everything; semi keeps nothing;
    # left keeps everything with null payload
    assert hash_join(left, empty_right, key="k", how="semi").count() == 0
    anti = hash_join(left, empty_right, key="k", how="anti").take_all()
    assert sorted(r["lv"] for r in anti) == ["a", "b"]
    left_out = hash_join(left, empty_right, key="k", how="left").take_all()
    assert sorted((r["lv"], r["rv"]) for r in left_out) == [("a", None), ("b", None)]

    with pytest.raises(ValueError, match="join mode"):
        hash_join(left, empty_right, key="k", how="cross")


def test_simhash_bucket_cap_bounds_degenerate_blocks(ray_session):
    """Many empty documents share simhash 0 in every block — the in-bucket
    pair loop must be capped (deterministically by doc_id), not O(n^2)."""
    import ray.data

    texts = [""] * 40 + ["real content here"]
    docs = ray.data.from_arrow(_docs_table(texts))
    pairs = dedup.simhash_pairs(docs, max_hamming=3, concurrency=1,
                                bucket_cap=10).take_all()
    involved = {p["a"] for p in pairs} | {p["b"] for p in pairs}
    # only the 10 smallest doc_ids of the degenerate bucket participate
    assert involved <= set(range(10))
    assert len(pairs) == 45  # C(10,2) — capped, not C(40,2)


def test_unigram_lm_scores(ray_session):
    """Mean unigram log-prob under the corpus's own distribution: repeated
    tokens score higher than rare ones; tokenless docs are absent."""
    import math

    import ray.data

    docs = ray.data.from_arrow(_docs_table(["a a a b", "c", "  "]))
    rows = {row["doc_id"]: row for row in textstats.unigram_lm_scores(docs).take_all()}
    assert set(rows) == {0, 1}  # the whitespace-only doc is absent
    # corpus: a×3, b×1, c×1 → total 5
    expected0 = (3 * math.log(3 / 5) + math.log(1 / 5)) / 4
    assert rows[0]["n_tokens"] == 4
    assert abs(rows[0]["lm_score"] - expected0) < 1e-6
    assert rows[1]["lm_score"] == round(math.log(1 / 5), 6)
    assert rows[0]["lm_score"] > rows[1]["lm_score"], "common tokens must score higher"


def test_bigram_lm_scores_hand_computed(ray_session):
    """Laplace-smoothed p(w2|w1) means: corpus 'a b a b' + 'a b c' + 'x' —
    bigram counts (a,b)=3, (b,a)=1, (b,c)=1, contexts a·=3, b·=2, V=4."""
    import math

    import ray.data

    docs = ray.data.from_arrow(_docs_table(["a b a b", "a b c", "x"]))
    rows = {r["doc_id"]: r for r in
            textstats.bigram_lm_scores(docs).take_all()}
    assert set(rows) == {0, 1}  # the single-token doc has no bigrams
    lp_ab = math.log((3 + 1) / (3 + 4))
    lp_ba = math.log((1 + 1) / (2 + 4))
    lp_bc = math.log((1 + 1) / (2 + 4))
    assert rows[0]["n_bigrams"] == 3
    assert abs(rows[0]["bigram_lm_score"] - (2 * lp_ab + lp_ba) / 3) < 1e-6
    assert rows[1]["n_bigrams"] == 2
    assert abs(rows[1]["bigram_lm_score"] - (lp_ab + lp_bc) / 2) < 1e-6
    # the common transition scores above the rare one
    assert rows[0]["bigram_lm_score"] > rows[1]["bigram_lm_score"]


def test_bigram_lm_scores_layout_independent(ray_session):
    import ray.data

    texts = [f"tok{i % 5} tok{(i + 2) % 7} tok{i % 3} tok{i % 2}"
             for i in range(60)]
    a = sorted(textstats.bigram_lm_scores(
        ray.data.from_arrow(_docs_table(texts))).take_all(),
        key=lambda r: r["doc_id"])
    b = sorted(textstats.bigram_lm_scores(
        ray.data.from_arrow(_docs_table(texts)).repartition(7)).take_all(),
        key=lambda r: r["doc_id"])
    assert a == b


def test_unigram_lm_vocab_cap(ray_session):
    """vocab_cap >= vocab size is exactly the uncapped scorer; a tight cap
    pools rare tokens into UNK and still scores every doc."""
    import ray.data

    texts = [f"common common tok{i}" for i in range(20)]
    docs = ray.data.from_arrow(_docs_table(texts))
    exact = sorted((r["doc_id"], r["lm_score"])
                   for r in textstats.unigram_lm_scores(docs).take_all())
    capped_loose = sorted((r["doc_id"], r["lm_score"])
                          for r in textstats.unigram_lm_scores(docs, vocab_cap=10_000).take_all())
    assert exact == capped_loose
    capped = {r["doc_id"]: r["lm_score"]
              for r in textstats.unigram_lm_scores(docs, vocab_cap=1).take_all()}
    assert len(capped) == 20
    # with only "common" in-vocab, every doc scores identically via UNK
    assert len(set(capped.values())) == 1


# ---------------------------------------------------------------------------
# line-level exact dedup (CCNet-style boilerplate scrub)


def test_frequent_lines_threshold(ray_session):
    import ray.data

    docs = ray.data.from_arrow(_docs_table([
        "nav\nbody one\nfooter",
        "nav\nbody two\nfooter",
        "nav\nbody three",
    ]))
    freq = sorted(r["line"] for r in dedup.frequent_lines(docs).take_all())
    assert freq == ["footer", "nav"]
    # max_count=2 keeps lines needing >2 occurrences
    freq2 = sorted(r["line"] for r in dedup.frequent_lines(docs, max_count=2).take_all())
    assert freq2 == ["nav"]


def test_line_dedup_scrubs_and_preserves_order(ray_session):
    import ray.data

    docs = ray.data.from_arrow(_docs_table([
        "nav\nalpha\nfooter\nbeta",
        "nav\ngamma\nfooter",
        "delta",
    ]))
    rows = {r["doc_id"]: r for r in dedup.line_dedup(docs).take_all()}
    assert rows[0]["text_dedup"] == "alpha\nbeta"
    assert (rows[0]["n_kept"], rows[0]["n_removed"]) == (2, 2)
    assert rows[1]["text_dedup"] == "gamma"
    assert rows[2]["text_dedup"] == "delta"
    assert rows[2]["n_removed"] == 0


def test_line_dedup_fully_scrubbed_doc_is_null(ray_session):
    import ray.data

    docs = ray.data.from_arrow(_docs_table(["same\nsame2", "same\nsame2", "keep"]))
    rows = {r["doc_id"]: r for r in dedup.line_dedup(docs).take_all()}
    assert rows[0]["text_dedup"] is None
    assert rows[0]["n_kept"] == 0 and rows[0]["n_removed"] == 2
    assert rows[2]["text_dedup"] == "keep"


def test_self_dedup_lines_keeps_first_in_order(ray_session):
    import ray.data

    docs = ray.data.from_arrow(_docs_table([
        "nav\nalpha\nnav\nbeta\nalpha",
        "one\ntwo",
        "",
    ]))
    rows = {r["doc_id"]: r for r in dedup.self_dedup_lines(docs).take_all()}
    assert rows[0]["text_dedup"] == "nav\nalpha\nbeta"
    assert (rows[0]["n_kept"], rows[0]["n_removed"]) == (3, 2)
    # no internal repeats → identity
    assert rows[1]["text_dedup"] == "one\ntwo"
    assert rows[1]["n_removed"] == 0
    # empty text: the single empty line survives, never null
    assert rows[2]["text_dedup"] == "" and rows[2]["n_kept"] == 1


def test_self_dedup_lines_is_per_document(ray_session):
    import ray.data

    # the SAME line in two different docs survives in both (the corpus-wide
    # frequency is line_dedup's job, not this one's)
    docs = ray.data.from_arrow(_docs_table(["shared\nx", "shared\ny"]))
    rows = {r["doc_id"]: r for r in dedup.self_dedup_lines(docs).take_all()}
    assert rows[0]["text_dedup"] == "shared\nx"
    assert rows[1]["text_dedup"] == "shared\ny"


def test_line_dedup_no_duplicates_is_identity(ray_session):
    import ray.data

    texts = [f"unique line {i}\nsecond {i}" for i in range(10)]
    docs = ray.data.from_arrow(_docs_table(texts))
    rows = sorted(dedup.line_dedup(docs).take_all(), key=lambda r: r["doc_id"])
    assert [r["text_dedup"] for r in rows] == texts
    assert all(r["n_removed"] == 0 for r in rows)


def test_line_dedup_layout_independent(ray_session):
    import ray.data

    texts = [f"nav\nbody {i}\nfooter" for i in range(30)]
    docs = ray.data.from_arrow(_docs_table(texts))
    a = sorted(dedup.line_dedup(docs).take_all(), key=lambda r: r["doc_id"])
    b = sorted(dedup.line_dedup(docs.repartition(7)).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b
    assert a[0]["text_dedup"] == "body 0"


def test_asof_join_drops_null_on_values(ray_session):
    """SQL ASOF semantics: a NULL probe matches nothing; a NULL right `on`
    is never a match target (and must not shadow real rows near the end of
    the sorted array)."""
    import ray

    from mhtml_to_html_ray.functions.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a"], pa.string()),
        "t": pa.array([10, None, 30], pa.int64()),
        "ev": pa.array([1, 2, 3], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a"], pa.string()),
        "t": pa.array([5, None], pa.int64()),
        "v": pa.array([100, 999], pa.int64()),
    }))
    rows = sorted(
        (r["ev"], r["v_r"]) for r in
        asof_join(left, right, by="k", on="t").take_all()
    )
    # null-probe row (ev=2) emits nothing; null right row (v=999) matches no one
    assert rows == [(1, 100), (3, 100)]


def test_asof_join_nullable_int_payload(ray_session):
    """A null in an int payload column must survive the join as a null, not
    crash the dtype restore."""
    import ray

    from mhtml_to_html_ray.functions.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a"], pa.string()),
        "t": pa.array([10, 20], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a"], pa.string()),
        "t": pa.array([5, 15], pa.int64()),
        "v": pa.array([None, 7], pa.int64()),
    }))
    rows = {r["t"]: r["v_r"] for r in
            asof_join(left, right, by="k", on="t").take_all()}
    assert rows == {10: None, 20: 7}


def test_join_suffix_collision_fails_fast(ray_session):
    import ray

    from mhtml_to_html_ray.functions.joins import asof_join, hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"], pa.string()),
        "t": pa.array([1], pa.int64()),
        "x_r": pa.array([1], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"], pa.string()),
        "t": pa.array([1], pa.int64()),
        "x": pa.array([2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, by="k", on="t")
    left2 = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"], pa.string()),
        "x": pa.array([1], pa.int64()),
        "x_r": pa.array([9], pa.int64()),
    }))
    right2 = ray.data.from_arrow(pa.table({
        "k": pa.array(["a"], pa.string()),
        "x": pa.array([2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="collides"):
        hash_join(left2, right2, key="k")


def test_matrix_rejects_nulls_and_ragged(ray_session):
    from mhtml_to_html_ray.functions.similarity import _matrix

    with pytest.raises(ValueError, match="null"):
        _matrix(pa.table({"embedding": pa.array([[1.0, 2.0], None],
                                                pa.list_(pa.float64()))}))
    with pytest.raises(ValueError, match="ragged"):
        _matrix(pa.table({"embedding": pa.array([[1.0, 2.0], [1.0]],
                                                pa.list_(pa.float64()))}))
    empty = _matrix(pa.table({"embedding": pa.array([], pa.list_(pa.float64()))}))
    assert empty.shape == (0, 0)


def test_label_norm_stats_is_a_combiner(ray_session):
    """Each batch emits one row per distinct label, not per input row."""
    import ray

    from mhtml_to_html_ray.functions.similarity import label_norm_stats

    tbl = pa.table({
        "label": pa.array(["x", "y", "x", "x"], pa.string()),
        "embedding": pa.array([[3.0, 4.0]] * 4, pa.list_(pa.float64())),
    })
    rows = {r["label"]: (r["sum_norm"], r["n"]) for r in
            label_norm_stats(ray.data.from_arrow(tbl)).take_all()}
    assert rows == {"x": (15.0, 3), "y": (5.0, 1)}


def test_tdigest_accuracy_merge_and_roundtrip():
    """Rank error ≤ 0.005 at compression 200 on uniform and heavy-tailed
    data, through both the single-digest and the merged-block paths;
    dumps/loads round-trips; size stays O(compression)."""
    from mhtml_to_html_ray.functions.sketches import TDigest

    rng = np.random.default_rng(7)
    for data in (rng.uniform(0, 100, 50_000), rng.lognormal(0, 2, 50_000)):
        srt = np.sort(data)

        def rank_err(digest, q):
            return abs(np.searchsorted(srt, digest.quantile(q)) / len(srt) - q)

        single = TDigest(200)
        for chunk in np.array_split(data, 13):
            single.add_array(chunk)
        merged = TDigest(200)
        for chunk in np.array_split(data, 8):
            part = TDigest(200)
            part.add_array(chunk)
            merged.merge(TDigest.loads(part.dumps()))
        for digest in (single, merged):
            for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
                assert rank_err(digest, q) <= 0.005
            assert digest.means.size < 4 * 200
        restored = TDigest.loads(single.dumps())
        assert restored.quantile(0.5) == single.quantile(0.5)
    # extremes are exact
    d = TDigest(100)
    d.add_array(np.arange(1000, dtype=float))
    assert d.quantile(0.0) == 0.0 and d.quantile(1.0) == 999.0
    with pytest.raises(ValueError, match="outside"):
        d.quantile(1.5)


def test_tdigest_distributed_matches_local(ray_session):
    """tdigest_quantiles over a Dataset ≈ a local digest over the same
    values: both within the same rank-error bound, fanin-independent."""
    import ray.data

    from mhtml_to_html_ray.functions.sketches import TDigest, tdigest_quantiles

    rng = np.random.default_rng(3)
    vals = rng.normal(50, 10, 20_000)
    ds = ray.data.from_arrow(
        pa.table({"value": pa.array(vals, pa.float64())})).repartition(9)
    srt = np.sort(vals)
    for fanin in (2, 64):
        est = tdigest_quantiles(ds, "value", [0.1, 0.5, 0.9], fanin=fanin)
        for q, v in est.items():
            assert abs(np.searchsorted(srt, v) / len(srt) - q) <= 0.005


def test_hash_join_full_outer_semantics(ray_session):
    """FULL JOIN: matched rows, unmatched left, unmatched right, and
    null-key rows of BOTH sides all survive with null padding."""
    import ray.data

    from mhtml_to_html_ray.functions.joins import hash_join

    left = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2, 3, None], pa.int64()),
         "lv": pa.array(list("abcd"), pa.string())}))
    right = ray.data.from_arrow(pa.table(
        {"k": pa.array([2, 2, 9, None], pa.int64()),
         "rv": pa.array([20, 21, 90, 99], pa.int64())}))
    rows = sorted(
        ((r["lv"] or ""), (-1 if r["k"] is None else r["k"]), r.get("rv"))
        for r in hash_join(left, right, key="k", num_buckets=4, how="full").take_all()
    )
    assert rows == [
        ("", -1, 99),          # null-key right row, unmatched
        ("", 9, 90),           # right-only key
        ("a", 1, None),
        ("b", 2, 20), ("b", 2, 21),
        ("c", 3, None),
        ("d", -1, None),       # null-key left row, unmatched
    ]


def test_media_decode_bmp_headers():
    """BMP: BITMAPINFOHEADER (i32 dims, negative height = top-down) and the
    ancient BITMAPCOREHEADER (u16 dims); truncated/invalid payloads raise."""
    import struct

    from mhtml_to_html_ray.functions.multimodal import decode_media_meta

    def bmp_info(width, height):
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0,
                          2835, 2835, 0, 0)
        head = b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, 14 + len(dib))
        return head + dib

    def bmp_core(width, height):
        dib = struct.pack("<IHHHH", 12, width, height, 1, 24)
        head = b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, 14 + len(dib))
        return head + dib

    assert decode_media_meta(bmp_info(640, 480)) == {"width": 640, "height": 480}
    # top-down bitmap: negative height encodes |height| rows
    assert decode_media_meta(bmp_info(640, -480)) == {"width": 640, "height": 480}
    assert decode_media_meta(bmp_core(31, 17)) == {"width": 31, "height": 17}
    with pytest.raises(ValueError, match="non-positive"):
        decode_media_meta(bmp_info(0, 10))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_media_meta(b"BMxx")
    with pytest.raises(ValueError, match="unsupported DIB"):
        decode_media_meta(bmp_info(1, 1)[:14] + struct.pack("<I", 16) + bytes(24))


def test_media_decode_webp_variants():
    """WebP: VP8X canvas dims, VP8 lossy key-frame dims, VP8L packed dims."""
    from mhtml_to_html_ray.functions.multimodal import (
        decode_media_meta, decode_webp_meta)

    def riff(fourcc, payload):
        chunk = fourcc + len(payload).to_bytes(4, "little") + payload
        return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk

    vp8x = riff(b"VP8X", bytes(4)
                + (799).to_bytes(3, "little") + (599).to_bytes(3, "little")
                + bytes(8))
    assert decode_webp_meta(vp8x) == {"width": 800, "height": 600, "frames": 1}

    vp8 = riff(b"VP8 ", bytes(3) + b"\x9d\x01\x2a"
               + (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
               + bytes(8))
    assert decode_media_meta(vp8) == {"width": 320, "height": 240, "frames": 1}

    bits = (127 - 1) | ((63 - 1) << 14)  # width 127, height 63
    vp8l = riff(b"VP8L", b"\x2f" + bits.to_bytes(4, "little") + bytes(8))
    assert decode_webp_meta(vp8l) == {"width": 127, "height": 63, "frames": 1}

    with pytest.raises(ValueError, match="not a WebP"):
        decode_webp_meta(b"RIFF\x00\x00\x00\x00WAVE" + bytes(20))
    with pytest.raises(ValueError, match="sync code"):
        decode_webp_meta(riff(b"VP8 ", bytes(16)))
    with pytest.raises(ValueError, match="signature byte"):
        decode_webp_meta(riff(b"VP8L", bytes(16)))
    with pytest.raises(ValueError, match="unknown payload chunk"):
        decode_webp_meta(riff(b"ANMF", bytes(16)))


def test_webp_synthesis_round_trips_all_variants(ray_session):
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions.multimodal import decode_webp

    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(30), pa.int64())}))
    frame = decode_webp(docs).to_pandas().sort_values("doc_id")
    assert len(frame) == 30
    assert frame["error"].isna().all()
    assert (frame["width"] == frame["doc_id"] % 1024 + 1).all()
    assert (frame["height"] == frame["doc_id"] % 512 + 1).all()


def test_media_decode_mp4_box_walk():
    """ISO BMFF: the box walk reads mvhd duration, tkhd 16.16 dimensions and
    stsz sample count from a synthesized container; version-1 mvhd, largesize
    boxes and corrupt structures are handled."""
    import struct

    import pyarrow as pa

    from mhtml_to_html_ray.functions.multimodal import (
        _mp4_box, decode_media_meta, decode_mp4_meta, synthesize_mp4_batch)

    batch = pa.table({"doc_id": pa.array([0, 5, 29, 77, 200], pa.int64())})
    mp4s = synthesize_mp4_batch(batch)
    for doc_id, payload in zip(
        mp4s.column("doc_id").to_pylist(), mp4s.column("payload").to_pylist()
    ):
        meta = decode_mp4_meta(payload)
        assert meta == {
            "duration_ms": (doc_id % 30 + 1) * 40,
            "width": doc_id % 64 + 16,
            "height": doc_id % 48 + 9,
            "frames": doc_id % 30 + 1,
        }
        # sniffed through the generic dispatcher too
        assert decode_media_meta(payload, "video/mp4") == meta

    # version-1 mvhd (64-bit times/duration)
    mvhd_v1 = _mp4_box(
        b"mvhd",
        b"\x01\x00\x00\x00" + bytes(16) + struct.pack(">I", 1000)
        + struct.pack(">Q", 2500) + bytes(80),
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + bytes(8))
    v1 = ftyp + _mp4_box(b"moov", mvhd_v1)
    assert decode_mp4_meta(v1)["duration_ms"] == 2500

    # largesize box header (size==1 + u64)
    moov_payload = mvhd_v1
    large_moov = (struct.pack(">I", 1) + b"moov"
                  + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload)
    assert decode_mp4_meta(ftyp + large_moov)["duration_ms"] == 2500

    with pytest.raises(ValueError, match="not an ISO BMFF"):
        decode_mp4_meta(b"\x00" * 16)
    with pytest.raises(ValueError, match="without moov"):
        decode_mp4_meta(ftyp)
    # child box claiming to overrun its container
    bad = ftyp + _mp4_box(b"moov", struct.pack(">I", 99) + b"mvhd" + bytes(8))
    with pytest.raises(ValueError, match="overruns"):
        decode_mp4_meta(bad)


def test_decode_video_meta_pipeline(ray_session):
    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions.multimodal import decode_video_meta

    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(25), pa.int64())}))
    frame = decode_video_meta(docs).to_pandas().sort_values("doc_id")
    assert len(frame) == 25
    assert frame["error"].isna().all()
    assert (frame["frames"] == frame["doc_id"] % 30 + 1).all()
    assert (frame["width"] == frame["doc_id"] % 64 + 16).all()


def test_compression_ratio_orders_repetitive_below_prose():
    """The zlib-ratio signal: repeated boilerplate compresses far below
    varied prose; empty text yields a null ratio."""
    repetitive = "click here to subscribe " * 50
    prose = ("the quick brown fox jumps over the lazy dog while seventeen "
             "archaeologists examine quartz formations beneath volcanic "
             "outcrops discussing jurisprudence and marmalade")
    out = textstats.compression_stats_batch(_docs_table([repetitive, prose, ""]))
    ratios = out["compression_ratio"].to_pylist()
    assert ratios[0] < 0.15 < ratios[1]
    assert ratios[2] is None
    assert out["n_bytes"].to_pylist() == [
        len(repetitive.encode()), len(prose.encode()), 0]


def test_unigram_lm_join_strategy_matches_broadcast(ray_session):
    """strategy="join" (no vocabulary-sized driver structure) must match the
    broadcast plan on rounded scores exactly."""
    import ray.data

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat",
        "unique words here only once",
        "",
    ]
    docs = ray.data.from_arrow(_docs_table(texts))
    broadcast = sorted(
        (r["doc_id"], r["n_tokens"], r["lm_score"])
        for r in textstats.unigram_lm_scores(docs, strategy="broadcast").take_all()
    )
    joined = sorted(
        (r["doc_id"], r["n_tokens"], r["lm_score"])
        for r in textstats.unigram_lm_scores(docs, strategy="join").take_all()
    )
    assert broadcast == joined
    assert broadcast and broadcast[0][0] == 0


def test_ccnet_buckets_score_per_language(ray_session):
    """Every doc is scored under ITS OWN language's unigram distribution:
    the same token has different log-probs in different languages, and the
    per-doc means match hand-computed values (this also pins the factorize
    key fix — NUL-joined keys silently collide in pandas' C-string
    hash table, which made all tokens of a language share one log-prob)."""
    import math

    import ray.data

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "de", "de"], pa.string()),
        "text": pa.array(["x x y", "y z", "x w", "  "], pa.string()),
    })
    rows = {r["doc_id"]: r for r in
            textstats.ccnet_bucket_scores(ray.data.from_arrow(tbl)).take_all()}
    assert set(rows) == {0, 1, 2}  # the whitespace-only doc is absent
    # en corpus: x×2 y×2 z×1 (total 5); de corpus: x×1 w×1 (total 2)
    exp0 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp1 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    exp2 = (math.log(1 / 2) + math.log(1 / 2)) / 2
    assert abs(rows[0]["lm_score"] - exp0) < 1e-6
    assert abs(rows[1]["lm_score"] - exp1) < 1e-6
    assert abs(rows[2]["lm_score"] - exp2) < 1e-6  # "x" ≠ its en log-prob
    assert all(r["bucket"] in {"head", "middle", "tail"} for r in rows.values())


def test_ccnet_buckets_thirds_are_quantile_exact(ray_session):
    """Within one language the head/middle/tail split follows the exact
    discrete 1/3 and 2/3 quantiles of the rounded scores: at-or-below t1 is
    tail, at-or-below t2 is middle, above is head — and the split is
    monotone in lm_score."""
    import ray.data

    # 6 docs, engineered distinct scores: doc i = i+1 copies of a common
    # token plus one rare token unique to the doc — more common mass =
    # higher mean log-prob, so scores strictly increase with i
    texts = [" ".join(["the"] * (i + 1)) + f" rare{i}" for i in range(6)]
    tbl = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    rows = sorted(
        textstats.ccnet_bucket_scores(ray.data.from_arrow(tbl)).take_all(),
        key=lambda r: r["lm_score"],
    )
    assert [r["bucket"] for r in rows] == ["tail"] * 2 + ["middle"] * 2 + ["head"] * 2
    scores = [r["lm_score"] for r in rows]
    assert scores == sorted(scores) and len(set(scores)) == 6


def test_hashed_bigram_classifier_exact_and_join_semantics(ray_session):
    """Bucket arithmetic matches hashlib exactly; docs with fewer than two
    tokens (no bigram features) are absent, mirroring the oracle's join."""
    import hashlib as _hl

    import ray.data

    docs = ray.data.from_arrow(_docs_table(
        ["the quick  brown fox", "one", "", "b a b a b"]))
    rows = {r["doc_id"]: r for r in
            textstats.hashed_bigram_classifier(docs).take_all()}
    assert set(rows) == {0, 3}

    def w(bg):
        return int(_hl.md5(bg.encode()).hexdigest()[:8], 16) % 64 - 32

    exp0 = w("the quick") + w("quick brown") + w("brown fox")
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["score_sum"] == exp0
    assert rows[0]["keep"] == (exp0 > 0)
    # repeated bigrams weigh once per OCCURRENCE (4 bigrams, 2 distinct)
    exp3 = 2 * w("b a") + 2 * w("a b")
    assert rows[3]["n_bigrams"] == 4
    assert rows[3]["score_sum"] == exp3


def _bpe_train_reference(texts, n_merges):
    """Single-process Sennrich-style BPE trainer: the parity oracle for the
    distributed loop (same tie-break: count desc, then left/right asc)."""
    from collections import Counter

    from mhtml_to_html_ray.functions.textstats import _lm_tokens

    words = Counter()
    for text in texts:
        words.update(_lm_tokens(text))
    vocab = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, n in words.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, n))
        for w, syms in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    new.append(left + right)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return merges


def test_bpe_train_matches_reference(ray_session):
    """The distributed merge loop reproduces the single-process trainer
    exactly — ranks, pairs, weighted counts — on a corpus with repeated
    words (weighting matters) and a word-final merge (</w> handling)."""
    import ray.data

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wider wide wide new",
    ]
    docs = ray.data.from_arrow(_docs_table(texts))
    got = textstats.bpe_train(docs, n_merges=6)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("left").to_pylist(),
                    got.column("right").to_pylist(),
                    got.column("n").to_pylist()))
    assert rows == _bpe_train_reference(texts, 6)
    # sanity: the corpus's dominant pattern ("lo" in low×4 + lower + lowest)
    assert rows[0][1:3] == ("l", "o") and rows[0][3] == 6


def test_bpe_train_stops_when_dry(ray_session):
    """Fewer distinct pairs than requested merges: the loop stops early
    instead of emitting degenerate rules."""
    import ray.data

    docs = ray.data.from_arrow(_docs_table(["ab ab", "ab"]))
    got = textstats.bpe_train(docs, n_merges=50)
    # "ab" exhausts after 3 merges: (a,b), (ab,</w>) — then nothing with
    # count > 0 remains... the loop must terminate on an empty pair table
    assert 0 < got.num_rows <= 3
    lefts = got.column("left").to_pylist()
    rights = got.column("right").to_pylist()
    assert (lefts[0], rights[0]) == ("a", "b")


def test_ccnet_join_strategy_matches_broadcast(ray_session):
    """ccnet_bucket_scores(strategy="join") — the plan with no
    vocabulary-sized driver structure — must match the broadcast plan
    exactly: scores, thresholds, buckets."""
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "lang": pa.array(["en", "en", "en", "en", "de", "de", "de", "zh"],
                         pa.string()),
        "text": pa.array([
            "the cat sat on the mat", "the dog ate the cat",
            "rare words entirely here", "the the the",
            "der hund", "der der katze", "einzig", "一 二 一",
        ], pa.string()),
    })
    docs = ray.data.from_arrow(tbl)

    def rows(strategy):
        return sorted(
            (r["doc_id"], r["lang"], r["n_tokens"], r["lm_score"], r["bucket"])
            for r in textstats.ccnet_bucket_scores(docs, strategy=strategy).take_all()
        )

    broadcast, joined = rows("broadcast"), rows("join")
    assert broadcast == joined
    assert len(broadcast) == 8


def test_ccnet_join_never_builds_broadcast_map(ray_session):
    """The join plan must produce buckets WITHOUT ever invoking the
    broadcast scorer (whose logp map is vocabulary-sized on the driver) —
    same discipline pin as tfidf/lm join (VERDICT round 3 #3). The join
    path's only driver-side collects are the per-language totals and the
    n_langs × 2 thresholds."""
    from unittest import mock

    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "lang": pa.array(["en", "en", "de", "de"], pa.string()),
        "text": pa.array(["a b a", "b c", "x y", "y y z"], pa.string()),
    })
    with mock.patch.object(
        textstats, "_ccnet_scores_broadcast",
        side_effect=AssertionError("broadcast logp map built in join plan"),
    ):
        out = textstats.ccnet_bucket_scores(
            ray.data.from_arrow(tbl), strategy="join")
        rows = out.take_all()
    assert len(rows) == 4
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}


def test_ccnet_null_lang_rows_dropped_by_both_strategies(ray_session):
    """NULL-lang documents are absent from ccnet output under BOTH plans —
    SQL's equijoin on lang never matches NULL; previously the broadcast
    scorer crashed on them while the join scorer silently dropped them."""
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["en", None, "en", "en"], pa.string()),
        "text": pa.array(["a b", "x y", "a c", "b c"], pa.string()),
    })
    docs = ray.data.from_arrow(tbl)
    for strategy in ("broadcast", "join"):
        rows = textstats.ccnet_bucket_scores(docs, strategy=strategy).take_all()
        assert sorted(r["doc_id"] for r in rows) == [0, 2, 3], strategy


def test_bpe_encode_matches_reference(ray_session):
    """Encoding with the trained merges reproduces a single-process
    train-then-encode exactly: per-doc BPE token counts shrink as merges
    apply, and words unseen at training time still encode (char fallback)."""
    import ray.data

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wider wide wide new",
        "",  # tokenless doc: 0 words, 0 tokens
    ]
    docs = ray.data.from_arrow(_docs_table(texts))
    merges = textstats.bpe_train(docs, n_merges=6)
    got = {r["doc_id"]: r for r in
           textstats.bpe_encode(docs, merges).take_all()}

    # single-process reference: replay the merge rules per distinct word
    rules = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))

    def ref_encode(word):
        syms = list(word) + ["</w>"]
        for left, right in rules:
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    new.append(left + right)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        return len(syms)

    from mhtml_to_html_ray.functions.textstats import _lm_tokens
    for doc_id, text in enumerate(texts):
        toks = _lm_tokens(text)
        assert got[doc_id]["n_words"] == len(toks)
        assert got[doc_id]["n_bpe_tokens"] == sum(ref_encode(w) for w in toks)
    # merges compress: "low" (3 chars + </w>) must encode in < 4 symbols
    assert ref_encode("low") < 4
    # unseen word still encodes via character fallback
    docs2 = ray.data.from_arrow(_docs_table(["zzz unseen"]))
    rows = textstats.bpe_encode(docs2, merges).take_all()
    assert rows[0]["n_bpe_tokens"] == sum(ref_encode(w) for w in ("zzz", "unseen"))


def test_bpe_encode_hand_computed_fixed_rules(ray_session):
    """Independent pin of the merge-replay semantics (not a clone of the
    implementation): a FIXED hand-written merge table with hand-computed
    expected token counts, including a word-final </w> merge."""
    import ray.data

    merges = pa.table({
        "rank": pa.array([0, 1, 2], pa.int64()),
        "left": pa.array(["l", "lo", "low"], pa.string()),
        "right": pa.array(["o", "w", "</w>"], pa.string()),
        "n": pa.array([9, 9, 9], pa.int64()),
    })
    docs = ray.data.from_arrow(_docs_table(["low lower lot ox"]))
    rows = textstats.bpe_encode(docs, merges).take_all()
    # "low"   → l o w </w> → lo w </w> → low </w> → low</w>      = 1
    # "lower" → l o w e r </w> → lo w e r </w> → low e r </w>    = 4
    # "lot"   → l o t </w> → lo t </w> (no further rule)         = 3
    # "ox"    → o x </w> (no rule matches)                       = 3
    assert rows[0]["n_words"] == 4
    assert rows[0]["n_bpe_tokens"] == 1 + 4 + 3 + 3


def test_simhash_tokenizer_matches_oracle_contract():
    """SimHashBatch tokenizes with the shared _lm_tokens whitespace
    contract, so its signature agrees with the simhash_blocks oracle's
    regexp_extract_all('\\S+') on EVERY input — including \\v and Unicode
    spaces, where str.split() (the old tokenizer) would diverge."""
    import re

    from mhtml_to_html_ray.functions.dedup import SimHashBatch
    from mhtml_to_html_ray.functions.textstats import _lm_tokens

    for text in ["a  b\tc\nd", " lead trail ", "", "x\r\ny", "a\fb",
                 "a\vb", "x\u00a0y"]:
        assert _lm_tokens(text) == re.findall(r"[^\t\n\f\r ]+", text), text
    # \v stays inside a token under the contract (str.split would cut it)
    assert _lm_tokens("a\vb") == ["a\vb"]
    assert SimHashBatch.simhash("a\vb") == SimHashBatch.simhash("a\vb")


def test_simhash_pairs_uint64_not_float_corrupted(ray_session):
    """Regression (round-4 oracle catch): hashes differing ONLY in low bits
    must still pair — the old mixed-dtype .values path promoted uint64
    hashes to float64, corrupting low bits and mis-verifying hamming."""
    from unittest import mock

    import pyarrow as pa
    import ray.data

    from mhtml_to_html_ray.functions import dedup

    # two docs whose simhashes differ in exactly the low 2 bits: force
    # via a stubbed SimHashBatch so the test controls the bit pattern
    h0 = (1 << 63) | (1 << 62) | 0b01    # float64 cannot hold these exactly
    h1 = (1 << 63) | (1 << 62) | 0b10    # hamming(h0, h1) = 2

    class _Stub:
        def __init__(self, *a, **k):
            pass

        def __call__(self, batch):
            doc_ids = batch.column("doc_id").to_pylist()
            hashes = [h0 if d == 0 else h1 for d in doc_ids]
            arrays = [pa.array(doc_ids, pa.int64()),
                      pa.array(hashes, pa.uint64())]
            names = ["doc_id", "simhash"]
            for block in range(4):
                arrays.append(pa.array(
                    [(h >> (block * 16)) & 0xFFFF for h in hashes],
                    pa.int32()))
                names.append(f"block{block}")
            return pa.Table.from_arrays(arrays, names=names)

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["a", "b"],
    }))
    with mock.patch.object(dedup, "SimHashBatch", _Stub):
        pairs = dedup.simhash_pairs(docs, max_hamming=3).take_all()
    assert [(r["a"], r["b"]) for r in pairs] == [(0, 1)]
