"""Pixel-level image operators: decode → resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

The container has no Pillow/ffmpeg, so the codec layer is built here from
the specs directly, real and complete for the formats a training pipeline
meets most:

* PNG: a spec-correct encoder/decoder for 8-bit greyscale / RGB / RGBA and
  8-bit-paletted images (PLTE + optional tRNS alpha), non-interlaced —
  zlib-inflated IDAT, all five scanline filters (None/Sub/Up/Average/Paeth)
  implemented and round-trip tested. 16-bit, sub-byte-palette and Adam7
  payloads raise ``NotImplementedError`` (surfaced as an ``error`` row by
  the stages, never a silent fake).
* GIF: block-structure walk (no LZW decode needed) to count frames for
  sampling — see ``multimodal.gif_frame_count``.

Payload synthesis is deterministic from ``doc_id`` (mirroring
``multimodal.synthesize_real_media_batch``), so resize checksums, pixel
features and sampled frame indexes are all exactly SQL-oracle-able.

The Ray shape follows the engine's stateful-stage rule: decode state is
per-actor (``__init__``), batches stay Arrow, ``batch_size`` is small
because rows carry whole images (the memory rule for binary payloads).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .multimodal import _PNG_SIG, gif_frame_count

# ---------------------------------------------------------------------------
# PNG codec (8-bit grey / RGB / RGBA, non-interlaced)

_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(chunk_type: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + chunk_type
        + payload
        + struct.pack(">I", zlib.crc32(chunk_type + payload))
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C ∈ {1, 3, 4}) as a valid
    non-interlaced PNG with filter-0 scanlines and one IDAT chunk."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _CHANNELS_COLOR_TYPE:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    height, width, channels = arr.shape
    if not height or not width:
        raise ValueError("zero-dimension image")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _CHANNELS_COLOR_TYPE[channels], 0, 0, 0
    )
    # filter byte 0 in front of every scanline
    raw = np.concatenate(
        [np.zeros((height, 1), np.uint8), arr.reshape(height, width * channels)],
        axis=1,
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter_scanlines(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse the PNG scanline filters (spec §9): each row starts with a
    filter-type byte; Sub/Up/Average/Paeth reconstruct against the prior
    byte (per channel), prior row, or both."""
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    data = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = data[:, 0]
    rows = data[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # 8-bit depth → bytes per pixel == channels
    for y in range(height):
        ftype = int(filters[y])
        cur = rows[y]
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            line = cur
        elif ftype == 1:  # Sub — sequential in x, vectorize per channel lane
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = (cur + prior) & 0xFF
        elif ftype == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc_:
                    pred = a
                elif pb <= pc_:
                    pred = b
                else:
                    pred = c
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG scanline with invalid filter type {ftype}")
        out[y] = line.astype(np.uint8)
    return out.reshape(height, width, channels)


def decode_png_pixels(data: bytes) -> np.ndarray:
    """Full pixel decode for 8-bit grey/RGB/RGBA and 8-bit-paletted
    non-interlaced PNGs: returns an (H, W, C) uint8 array (palette entries
    expand to RGB; a tRNS chunk upgrades them to RGBA). Interlaced, 16-bit
    and sub-byte-palette payloads raise NotImplementedError (more branches,
    no new math — out of scope until a corpus needs them)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = -1
    color_type = -1
    palette: bytes | None = None
    trns: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth}")
            if color_type not in _COLOR_TYPE_CHANNELS and color_type != 3:
                raise NotImplementedError(f"PNG color type {color_type}")
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG")
            channels = 1 if color_type == 3 else _COLOR_TYPE_CHANNELS[color_type]
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if width <= 0 or channels <= 0:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG without IDAT pixel data")
    raw = zlib.decompress(bytes(idat))
    pixels = _unfilter_scanlines(raw, width, height, channels)
    if color_type != 3:
        return pixels
    if palette is None:
        raise ValueError("paletted PNG without PLTE chunk")
    lut = np.frombuffer(palette, np.uint8).reshape(-1, 3)
    indexes = pixels[:, :, 0]
    if indexes.max(initial=0) >= len(lut):
        raise ValueError("palette index out of range")
    rgb = lut[indexes]
    if trns is None:
        return rgb
    alpha_lut = np.full(len(lut), 255, np.uint8)
    alpha_lut[: len(trns)] = np.frombuffer(trns, np.uint8)
    return np.concatenate([rgb, alpha_lut[indexes][:, :, None]], axis=2)


# ---------------------------------------------------------------------------
# Deterministic synthesis (doc_id → real encoded payloads)


def _gradient_pixels(doc_id: int) -> np.ndarray:
    """W = doc_id%16+1, H = doc_id%12+1, channels cycle 1/3/4 by doc_id%3;
    pixel[y, x, c] = (doc_id + 3x + 7y + 11c) % 256 — every downstream
    statistic is closed-form in doc_id, which is what the SQL oracles
    recompute."""
    width = doc_id % 16 + 1
    height = doc_id % 12 + 1
    channels = (1, 3, 4)[doc_id % 3]
    x = 3 * np.arange(width, dtype=np.int64)[None, :, None]
    y = 7 * np.arange(height, dtype=np.int64)[:, None, None]
    c = 11 * np.arange(channels, dtype=np.int64)[None, None, :]
    return ((doc_id + x + y + c) % 256).astype(np.uint8)


def synthesize_png_pixel_batch(batch: pa.Table) -> pa.Table:
    """documents → real PNG payloads carrying the gradient pixels."""
    doc_ids = batch.column("doc_id").to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["image/png"] * len(doc_ids), pa.string()),
            "payload": pa.array(
                [encode_png(_gradient_pixels(d)) for d in doc_ids], pa.large_binary()
            ),
        }
    )


_GIF_MIN_FRAME = (
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"  # 1×1 descriptor, no LCT
    b"\x02\x02\x44\x01\x00"  # LZW min 2; codes: clear, index 0, EOI
)


def synthesize_gif_batch(batch: pa.Table) -> pa.Table:
    """documents → real multi-frame GIF89a payloads, frames = doc_id%5+1.
    Each frame is the canonical minimal 1×1 LZW unit, so the payload is a
    valid animation whose frame count is closed-form in doc_id."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads = []
    for doc_id in doc_ids:
        frames = doc_id % 5 + 1
        head = (
            b"GIF89a"
            + struct.pack("<HH", doc_id % 8 + 1, doc_id % 6 + 1)
            + b"\x80\x00\x00"  # GCT flag, 2 entries
            + b"\x00\x00\x00\xff\xff\xff"  # palette: black, white
        )
        payloads.append(head + _GIF_MIN_FRAME * frames + b"\x3b")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["image/gif"] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


# ---------------------------------------------------------------------------
# Actor-pool stages


class ImageResizeBatch:
    """Decode → nearest-neighbor resize to (out_w, out_h) → resized bytes +
    a channel-0 checksum (the scalar the SQL oracle recomputes). Nearest
    neighbor is pure integer index math (src = (dst · src_dim) // dst_dim),
    fully vectorized; undecodable payloads become error rows."""

    def __init__(self, out_w: int = 8, out_h: int = 6):
        if out_w <= 0 or out_h <= 0:
            raise ValueError("resize target must be positive")
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {
            "doc_id": doc_ids,
            "out_w": [], "out_h": [], "channels": [], "n_bytes": [],
            "checksum_c0": [], "pixels": [], "error": [],
        }
        for payload in payloads:
            try:
                img = decode_png_pixels(payload)
            except (ValueError, NotImplementedError) as exc:
                for key in ("out_w", "out_h", "channels", "n_bytes", "checksum_c0", "pixels"):
                    out[key].append(None)
                out["error"].append(f"{type(exc).__name__}: {exc}")
                continue
            height, width, channels = img.shape
            ys = (np.arange(self.out_h, dtype=np.int64) * height) // self.out_h
            xs = (np.arange(self.out_w, dtype=np.int64) * width) // self.out_w
            resized = img[ys][:, xs]
            out["out_w"].append(self.out_w)
            out["out_h"].append(self.out_h)
            out["channels"].append(channels)
            out["n_bytes"].append(resized.nbytes)
            out["checksum_c0"].append(int(resized[:, :, 0].astype(np.int64).sum()))
            out["pixels"].append(resized.tobytes())
            out["error"].append(None)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "out_w": pa.array(out["out_w"], pa.int32()),
                "out_h": pa.array(out["out_h"], pa.int32()),
                "channels": pa.array(out["channels"], pa.int32()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "checksum_c0": pa.array(out["checksum_c0"], pa.int64()),
                "pixels": pa.array(out["pixels"], pa.large_binary()),
                "error": pa.array(out["error"], pa.string()),
            }
        )


class ImageFeaturesBatch:
    """Decode → per-image features: dimensions, pixel count, channel-0 mean
    and a ``bins``-bucket channel-0 histogram (list<int64>). The shape a
    quality/near-dup model consumes; every value is exact arithmetic over
    the decoded pixels."""

    def __init__(self, bins: int = 8):
        if bins <= 0 or 256 % bins:
            raise ValueError("bins must divide 256")
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        width, height, channels, n_px, mean_c0, hist, errors = [], [], [], [], [], [], []
        bucket = 256 // self.bins
        for payload in payloads:
            try:
                img = decode_png_pixels(payload)
            except (ValueError, NotImplementedError) as exc:
                for col in (width, height, channels, n_px, mean_c0, hist):
                    col.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
                continue
            h, w, c = img.shape
            c0 = img[:, :, 0].astype(np.int64)
            width.append(w)
            height.append(h)
            channels.append(c)
            n_px.append(h * w)
            mean_c0.append(round(float(c0.sum()) / (h * w), 6))
            hist.append(np.bincount((c0 // bucket).ravel(), minlength=self.bins).tolist())
            errors.append(None)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "channels": pa.array(channels, pa.int32()),
                "n_px": pa.array(n_px, pa.int64()),
                "mean_c0": pa.array(mean_c0, pa.float64()),
                "hist_c0": pa.array(hist, pa.list_(pa.int64())),
                "error": pa.array(errors, pa.string()),
            }
        )


class FrameSampleBatch:
    """GIF frame sampling without decoding pixel data: walk the block
    structure for the frame count, emit one row per sampled frame index
    (every ``stride``-th). A video pipeline swaps the walker for a
    container parser; the Ray plumbing (1→N flat_map shape, actor pool,
    binary-safe batches) is what this stage pins."""

    def __init__(self, stride: int = 2):
        if stride <= 0:
            raise ValueError("stride must be positive")
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ids, out_idx = [], []
        for doc_id, payload in zip(doc_ids, payloads):
            for idx in range(0, gif_frame_count(payload), self.stride):
                out_ids.append(doc_id)
                out_idx.append(idx)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# Pipeline entry points (documents table → stage output)


def image_resize(documents_ds, out_w: int = 8, out_h: int = 6,
                 batch_size: int = 32, concurrency=2):
    """documents → synthesized gradient PNGs → decode + nearest resize."""
    media = documents_ds.map_batches(synthesize_png_pixel_batch, batch_format="pyarrow")
    return media.map_batches(
        ImageResizeBatch,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_features(documents_ds, bins: int = 8, batch_size: int = 32, concurrency=2):
    """documents → synthesized gradient PNGs → decode + feature extraction."""
    media = documents_ds.map_batches(synthesize_png_pixel_batch, batch_format="pyarrow")
    return media.map_batches(
        ImageFeaturesBatch,
        fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(documents_ds, stride: int = 2, batch_size: int = 64, concurrency=2):
    """documents → synthesized multi-frame GIFs → sampled frame indexes."""
    media = documents_ds.map_batches(synthesize_gif_batch, batch_format="pyarrow")
    return media.map_batches(
        FrameSampleBatch,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImagePHashBatch:
    """Decode → 8×8 nearest-neighbor downsample of channel 0 → average hash
    (aHash): bit i = 1 iff pixel_i · 64 > Σ pixels (the integer form of
    "above the mean", so the threshold is exact — no float division). The
    64 bits are returned as two int64 halves (hash_lo = bits 0-31,
    hash_hi = bits 32-63) so DuckDB's xor/bit_count can restate hamming
    distance without unsigned-overflow games.

    100-TB shape: one actor-pool map_batches, ~16 B of hash per image out;
    near-dup search then runs over hashes only (phash_dedup below), never
    re-reading pixels."""

    GRID = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        grid = self.GRID
        lo_col, hi_col, errors = [], [], []
        weights_lo = (1 << np.arange(32, dtype=np.int64))
        for payload in payloads:
            try:
                img = decode_png_pixels(payload)
            except (ValueError, NotImplementedError) as exc:
                lo_col.append(None)
                hi_col.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
                continue
            height, width, _ = img.shape
            ys = (np.arange(grid, dtype=np.int64) * height) // grid
            xs = (np.arange(grid, dtype=np.int64) * width) // grid
            cells = img[ys][:, xs, 0].astype(np.int64).ravel()  # row-major: idx = y*8+x
            total = int(cells.sum())
            bits = (cells * (grid * grid) > total).astype(np.int64)
            lo_col.append(int((bits[:32] * weights_lo).sum()))
            hi_col.append(int((bits[32:] * weights_lo).sum()))
            errors.append(None)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "hash_lo": pa.array(lo_col, pa.int64()),
                "hash_hi": pa.array(hi_col, pa.int64()),
                "error": pa.array(errors, pa.string()),
            }
        )


def image_phash(documents_ds, batch_size: int = 32, concurrency=2):
    """documents → synthesized gradient PNGs → decode + 64-bit average hash."""
    media = documents_ds.map_batches(synthesize_png_pixel_batch, batch_format="pyarrow")
    return media.map_batches(
        ImagePHashBatch,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def phash_dedup(documents_ds, batch_size: int = 32, concurrency=2):
    """Perceptual-hash exact-duplicate clusters: hash every image, group by
    the 64-bit hash, keep the minimum doc_id per cluster. The groupby
    shuffles 16-byte hash rows (never pixels); at 100 TB the hash table is
    ~0.02% of the corpus, and near-dup variants band the same hashes
    (simhash_blocks machinery) instead of widening this exact groupby."""
    import pyarrow.compute as pc

    hashes = image_phash(documents_ds, batch_size=batch_size, concurrency=concurrency)
    hashes = hashes.map_batches(
        lambda t: t.filter(pc.is_null(t.column("error"))).select(
            ["doc_id", "hash_lo", "hash_hi"]),
        batch_format="pyarrow",
    )

    def per_group(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        return pa.table(
            {
                "hash_hi": group.column("hash_hi")[:1],
                "hash_lo": group.column("hash_lo")[:1],
                "n_docs": pa.array([len(ids)], pa.int64()),
                "keeper_doc_id": pa.array([min(ids)], pa.int64()),
            }
        )

    return hashes.groupby(["hash_hi", "hash_lo"]).map_groups(
        per_group, batch_format="pyarrow")


def phash_neardup(documents_ds, max_hamming: int = 3,
                  batch_size: int = 32, concurrency=2,
                  bucket_cap: int = 512):
    """Perceptual near-duplicate pairs: hamming distance ≤ ``max_hamming``
    between DISTINCT 64-bit aHashes, reported between cluster keepers.

    Plan: collapse to unique hashes first (phash_dedup — the mega-cluster
    guard: a million byte-identical logos are ONE row here), then band each
    hash into 4 disjoint 16-bit keys. By pigeonhole, two hashes within
    hamming ≤ 3 agree on at least one whole band, so a per-band groupby
    finds EVERY qualifying pair — banding is exact candidate generation,
    not approximation. Within-band pair emission is vectorized XOR/popcount
    over the band's hash matrix; a final (doc_a, doc_b) groupby dedups
    pairs that met in several bands. Nothing pair-sized touches the driver."""
    if not 0 <= max_hamming <= 3:
        raise ValueError("4 x 16-bit bands guarantee exactness only to hamming 3")

    uniq = phash_dedup(documents_ds, batch_size=batch_size,
                       concurrency=concurrency)

    def band_rows(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch.column("hash_lo"), dtype=np.int64)
        hi = np.asarray(batch.column("hash_hi"), dtype=np.int64)
        keeper = np.asarray(batch.column("keeper_doc_id"), dtype=np.int64)
        n = len(lo)
        bands = np.stack([lo & 0xFFFF, (lo >> 16) & 0xFFFF,
                          hi & 0xFFFF, (hi >> 16) & 0xFFFF])
        return pa.table(
            {
                "band_idx": pa.array(np.repeat(np.arange(4, dtype=np.int64), n)),
                "band_val": pa.array(bands.ravel()),
                "hash_lo": pa.array(np.tile(lo, 4)),
                "hash_hi": pa.array(np.tile(hi, 4)),
                "keeper": pa.array(np.tile(keeper, 4)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows > bucket_cap:
            # degenerate band values (all-zero / all-one bands from flat
            # images) can collect huge buckets; the n×n XOR matrices below
            # are quadratic, so cap one map_groups task's work the same way
            # dedup.simhash_pairs does. Deterministic: keep the bucket_cap
            # smallest keepers.
            group = group.sort_by("keeper").slice(0, bucket_cap)
        lo = np.asarray(group.column("hash_lo"), dtype=np.uint64)
        hi = np.asarray(group.column("hash_hi"), dtype=np.uint64)
        keeper = np.asarray(group.column("keeper"), dtype=np.int64)
        n = len(lo)
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if n < 2:
            return empty
        xor_lo = lo[:, None] ^ lo[None, :]
        xor_hi = hi[:, None] ^ hi[None, :]
        ham = (_popcount64(xor_lo) + _popcount64(xor_hi)).astype(np.int64)
        ia, ib = np.triu_indices(n, k=1)
        ham_pairs = ham[ia, ib]
        keep = ham_pairs <= max_hamming
        ia, ib, ham_pairs = ia[keep], ib[keep], ham_pairs[keep]
        if not len(ia):
            return empty
        a = np.minimum(keeper[ia], keeper[ib])
        b = np.maximum(keeper[ia], keeper[ib])
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b),
                         "hamming": pa.array(ham_pairs)})

    def first_row(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    candidates = (
        uniq.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_idx", "band_val"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return candidates.groupby(["doc_a", "doc_b"]).map_groups(
        first_row, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR, Hacker's Delight fig. 5-2)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
