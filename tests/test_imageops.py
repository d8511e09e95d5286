"""Pixel-level image operators: PNG codec round-trip, the five scanline
filters, nearest-neighbor resize, feature extraction, GIF block walk and
frame sampling — the multimodal family's decode/resize/feature/frame-sample
stages (functions/imageops.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions.imageops import (
    FrameSampleBatch,
    ImageFeaturesBatch,
    ImageResizeBatch,
    _gradient_pixels,
    decode_png_pixels,
    encode_png,
    frame_sample,
    image_features,
    image_resize,
    synthesize_gif_batch,
    synthesize_png_pixel_batch,
)
from mhtml_to_html_ray.functions.multimodal import (
    _PNG_SIG,
    decode_gif_meta,
    gif_frame_count,
)


def _docs_batch(doc_ids):
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64())})


# ---------------------------------------------------------------------------
# PNG codec


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 17, 100, 255, 1234, 99999])
def test_png_round_trip(doc_id):
    pixels = _gradient_pixels(doc_id)
    decoded = decode_png_pixels(encode_png(pixels))
    assert decoded.shape == pixels.shape
    assert (decoded == pixels).all()


def test_png_round_trip_shapes():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (1, 1, 3), (5, 3, 4), (2, 16, 1), (12, 1, 3)]:
        pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
        decoded = decode_png_pixels(encode_png(pixels))
        expect = pixels[:, :, None] if pixels.ndim == 2 else pixels
        assert (decoded == expect).all()


def _png_with_filters(rows_and_filters, width, channels):
    """Hand-build a PNG whose scanlines use explicit filter types; rows are
    the FILTERED bytes (what the decoder must reverse)."""
    height = len(rows_and_filters)
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(row) for f, row in rows_and_filters)

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_all_five_filters():
    """One scanline per filter type; expected reconstruction computed by the
    spec formulas by hand (grayscale, width 4, bpp 1)."""
    png = _png_with_filters(
        [
            (0, [10, 20, 30, 40]),          # None   -> 10 20 30 40
            (1, [5, 5, 5, 5]),              # Sub    -> 5 10 15 20
            (2, [1, 2, 3, 4]),              # Up     -> 6 12 18 24
            (3, [10, 10, 10, 10]),          # Average: left/2+prior/2 floor
            (4, [1, 1, 1, 1]),              # Paeth
        ],
        width=4,
        channels=1,
    )
    out = decode_png_pixels(png)[:, :, 0]
    assert out[0].tolist() == [10, 20, 30, 40]
    assert out[1].tolist() == [5, 10, 15, 20]
    assert out[2].tolist() == [6, 12, 18, 24]
    # Average row: x0: 10+(0+6)//2=13; x1: 10+(13+12)//2=22; x2: 10+(22+18)//2=30; x3: 10+(30+24)//2=37
    assert out[3].tolist() == [13, 22, 30, 37]
    # Paeth row against prior [13,22,30,37]: x0 pred=b=13 ->14; x1: a=14,b=22,c=13,
    # p=23 -> pb=1 smallest ->23; x2: a=23,b=30,c=22,p=31 -> pb=1 ->31;
    # x3: a=31,b=37,c=30,p=38 -> pb=1 ->38
    assert out[4].tolist() == [14, 23, 31, 38]


def test_png_filter_round_trip_against_reference_filterer():
    """Encode rows with every filter type using a straightforward spec
    implementation, decode with the engine, require pixel identity."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    height, width, channels = img.shape
    flat = img.reshape(height, width * channels).astype(np.int32)
    rows = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros_like(cur)
        filt = np.zeros_like(cur)
        for x in range(len(cur)):
            a = cur[x - channels] if x >= channels else 0
            b = prior[x]
            c = prior[x - channels] if x >= channels else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)
            filt[x] = (cur[x] - pred) & 0xFF
        rows.append((ftype, filt.tolist()))
    png = _png_with_filters(rows, width=width, channels=channels)
    assert (decode_png_pixels(png) == img).all()


def test_png_paletted_decode():
    """Color type 3: indexes expand through PLTE; tRNS upgrades to RGBA."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"\x00\x00\x01\x02" + b"\x00\x02\x01\x00"  # filter 0 rows of indexes

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    base = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette)
    tail = chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    out = decode_png_pixels(base + tail)
    assert out.shape == (2, 3, 3)
    assert out[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert out[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]
    # with tRNS: entry 0 transparent, others default opaque
    with_trns = (base + chunk(b"tRNS", b"\x00") + tail)
    out = decode_png_pixels(with_trns)
    assert out.shape == (2, 3, 4)
    assert out[0, 0].tolist() == [255, 0, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0, 255]
    # palette index beyond PLTE is corrupt
    bad_raw = b"\x00\x05\x01\x02" + b"\x00\x02\x01\x00"
    bad = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette) \
        + chunk(b"IDAT", zlib.compress(bad_raw)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png_pixels(bad)
    # paletted without PLTE is corrupt
    no_plte = _PNG_SIG + chunk(b"IHDR", ihdr) + tail
    with pytest.raises(ValueError):
        decode_png_pixels(no_plte)


def test_png_unsupported_payloads_raise():
    pixels = np.zeros((2, 2), np.uint8)
    good = encode_png(pixels)
    # 16-bit depth
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bytes(bad))
    # interlaced
    bad = bytearray(good)
    bad[28] = 1
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bytes(bad))
    # color type 7 does not exist
    bad = bytearray(good)
    bad[25] = 7
    with pytest.raises(NotImplementedError):
        decode_png_pixels(bytes(bad))
    with pytest.raises(ValueError):
        decode_png_pixels(b"not a png at all")
    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 4), np.uint8))


# ---------------------------------------------------------------------------
# GIF block walk


def test_gif_frame_count_and_meta():
    gifs = synthesize_gif_batch(_docs_batch([0, 1, 2, 3, 4, 9, 14]))
    for doc_id, payload in zip(
        gifs.column("doc_id").to_pylist(), gifs.column("payload").to_pylist()
    ):
        assert gif_frame_count(payload) == doc_id % 5 + 1
        meta = decode_gif_meta(payload)
        assert meta["frames"] == doc_id % 5 + 1
        assert meta["width"] == doc_id % 8 + 1
        assert meta["height"] == doc_id % 6 + 1


def test_gif_frame_count_skips_extensions_and_local_tables():
    """Graphic-control extension before a frame, and a frame with its own
    local color table, both counted once."""
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # ext + label + block(4) + term
    frame_lct = (
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x80"  # descriptor, LCT flag
        + b"\x00\x00\x00\xff\xff\xff"  # 2-entry local table
        + b"\x02\x02\x44\x01\x00"
    )
    gif = (
        b"GIF89a" + struct.pack("<HH", 1, 1) + b"\x00\x00\x00"  # no GCT
        + gce + frame_lct + gce + frame_lct + b"\x3b"
    )
    assert gif_frame_count(gif) == 2
    with pytest.raises(ValueError):
        gif_frame_count(gif[:-1])  # missing trailer
    with pytest.raises(ValueError):
        gif_frame_count(b"GIF89a" + b"\x00" * 7 + b"\xaa")  # unknown marker


# ---------------------------------------------------------------------------
# Stages (pure batch level)


def test_resize_checksum_matches_manual():
    batch = synthesize_png_pixel_batch(_docs_batch([0, 5, 9, 100]))
    out = ImageResizeBatch(8, 6)(batch)
    assert out.column("error").to_pylist() == [None] * 4
    for doc_id, checksum, n_bytes, channels in zip(
        out.column("doc_id").to_pylist(),
        out.column("checksum_c0").to_pylist(),
        out.column("n_bytes").to_pylist(),
        out.column("channels").to_pylist(),
    ):
        img = _gradient_pixels(doc_id)
        ys = (np.arange(6) * img.shape[0]) // 6
        xs = (np.arange(8) * img.shape[1]) // 8
        resized = img[ys][:, xs]
        assert checksum == int(resized[:, :, 0].astype(np.int64).sum())
        assert n_bytes == resized.nbytes
        assert channels == img.shape[2]


def test_resize_upscales_and_handles_errors():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "payload": pa.array(
                [encode_png(np.arange(4, dtype=np.uint8).reshape(2, 2)),
                 b"corrupt"],
                pa.large_binary(),
            ),
        }
    )
    out = ImageResizeBatch(4, 4)(batch)
    pixels = np.frombuffer(out.column("pixels").to_pylist()[0], np.uint8)
    # 2x2 [[0,1],[2,3]] -> each source pixel repeated 2x2
    assert pixels.reshape(4, 4).tolist() == [
        [0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]
    ]
    assert out.column("error").to_pylist()[1].startswith("ValueError")
    assert out.column("checksum_c0").to_pylist()[1] is None


def test_features_exact():
    batch = synthesize_png_pixel_batch(_docs_batch([0, 1, 2, 13]))
    out = ImageFeaturesBatch(8)(batch)
    rows = out.to_pylist()
    for row in rows:
        img = _gradient_pixels(row["doc_id"])
        c0 = img[:, :, 0].astype(np.int64)
        assert row["width"] == img.shape[1]
        assert row["height"] == img.shape[0]
        assert row["n_px"] == img.shape[0] * img.shape[1]
        assert row["mean_c0"] == round(float(c0.sum()) / c0.size, 6)
        assert row["hist_c0"] == np.bincount((c0 // 32).ravel(), minlength=8).tolist()
        assert sum(row["hist_c0"]) == row["n_px"]
    with pytest.raises(ValueError):
        ImageFeaturesBatch(7)  # must divide 256


def test_frame_sample_strides():
    gifs = synthesize_gif_batch(_docs_batch([0, 4, 9]))
    out = FrameSampleBatch(2)(gifs).to_pylist()
    assert [(r["doc_id"], r["frame_idx"]) for r in out] == [
        (0, 0), (4, 0), (4, 2), (4, 4), (9, 0), (9, 2), (9, 4)
    ]
    out3 = FrameSampleBatch(3)(gifs).to_pylist()
    assert [(r["doc_id"], r["frame_idx"]) for r in out3] == [
        (0, 0), (4, 0), (4, 3), (9, 0), (9, 3)
    ]
    with pytest.raises(ValueError):
        FrameSampleBatch(0)


# ---------------------------------------------------------------------------
# Ray pipeline level (actor pools, Arrow batches)


def test_image_pipelines_over_dataset(ray_session):
    import ray.data

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64())})
    )
    feats = image_features(docs).to_pandas().sort_values("doc_id")
    assert len(feats) == 40
    assert feats["error"].isna().all()
    assert (feats["n_px"] == (feats["doc_id"] % 16 + 1) * (feats["doc_id"] % 12 + 1)).all()

    resized = image_resize(docs, out_w=4, out_h=4).to_pandas()
    assert len(resized) == 40
    assert (resized["n_bytes"] == 16 * resized["channels"]).all()

    sampled = frame_sample(docs, stride=2).to_pandas()
    expect = sum((d % 5 + 1 + 1) // 2 for d in range(40))
    assert len(sampled) == expect


def test_phash_uniform_image_is_zero():
    # strict "v·64 > Σv" threshold: a constant image sets no bits
    import numpy as np
    import pyarrow as pa

    from mhtml_to_html_ray.functions.imageops import ImagePHashBatch, encode_png

    img = np.full((5, 7, 1), 99, dtype=np.uint8)
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([encode_png(img)], pa.large_binary())})
    out = ImagePHashBatch()(batch)
    assert out.column("hash_lo").to_pylist() == [0]
    assert out.column("hash_hi").to_pylist() == [0]
    assert out.column("error").to_pylist() == [None]


def test_phash_known_bits():
    # 8×8 image, one bright pixel at (y=0, x=0): only bit 0 is set for the
    # bright pixel; all-dark rest stay 0 (mean pulled up by the spike)
    import numpy as np
    import pyarrow as pa

    from mhtml_to_html_ray.functions.imageops import ImagePHashBatch, encode_png

    img = np.zeros((8, 8, 1), dtype=np.uint8)
    img[0, 0, 0] = 255
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([encode_png(img)], pa.large_binary())})
    out = ImagePHashBatch()(batch)
    assert out.column("hash_lo").to_pylist() == [1]
    assert out.column("hash_hi").to_pylist() == [0]


def test_phash_bad_payload_error_row():
    import pyarrow as pa

    from mhtml_to_html_ray.functions.imageops import ImagePHashBatch

    batch = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "payload": pa.array([b"not a png"], pa.large_binary())})
    out = ImagePHashBatch()(batch)
    assert out.column("hash_lo").to_pylist() == [None]
    assert out.column("error").to_pylist()[0]


def test_phash_dedup_keeps_min_doc(ray_session):
    import ray.data

    from mhtml_to_html_ray.functions.imageops import phash_dedup

    # doc_ids 10 and 10+48·? share the gradient period only when the %256
    # shift preserves thresholds; just assert cluster invariants instead:
    ds = ray.data.range(64).map_batches(
        lambda b: __import__("pyarrow").table({"doc_id": b["id"]}),
        batch_format="numpy")
    rows = phash_dedup(ds).to_pandas()
    assert (rows.groupby(["hash_hi", "hash_lo"]).size() == 1).all()
    assert rows["n_docs"].sum() == 64
    assert (rows["keeper_doc_id"] >= 0).all()


def test_phash_neardup_matches_all_pairs(ray_session):
    # banding must find exactly the all-pairs hamming<=3 set (pigeonhole
    # exactness), each pair once even when it agrees on several bands
    import numpy as np
    import ray.data

    from mhtml_to_html_ray.functions.imageops import (
        _popcount64, image_phash, phash_neardup)

    ds = ray.data.range(200).map_batches(
        lambda b: __import__("pyarrow").table({"doc_id": b["id"]}),
        batch_format="numpy")
    got = phash_neardup(ds, max_hamming=3).to_pandas()
    got = set(map(tuple, got[["doc_a", "doc_b", "hamming"]].to_numpy()))

    hashes = image_phash(ds).to_pandas()
    uniq = hashes.groupby(["hash_hi", "hash_lo"], as_index=False)["doc_id"].min()
    lo = uniq["hash_lo"].to_numpy(np.uint64)
    hi = uniq["hash_hi"].to_numpy(np.uint64)
    keeper = uniq["doc_id"].to_numpy(np.int64)
    expect = set()
    for i in range(len(lo)):
        for j in range(i + 1, len(lo)):
            ham = int(_popcount64(np.array([lo[i] ^ lo[j]], np.uint64))[0]
                      + _popcount64(np.array([hi[i] ^ hi[j]], np.uint64))[0])
            if ham <= 3:
                a, b = sorted((int(keeper[i]), int(keeper[j])))
                expect.add((a, b, ham))
    assert got == expect and expect  # non-trivial fixture
