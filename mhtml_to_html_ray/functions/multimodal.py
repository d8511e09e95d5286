"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Two decode paths behind one actor-pool stage (``MediaDecodeBatch``):

* ``real=False`` (default) — a deterministic fake decoder whose outputs are
  derivable from byte lengths, so the whole stage is SQL-oracle-able
  (octet_length etc.). All the Ray-side plumbing (binary column in, struct
  metadata out, actor pool, small batch sizes for large payloads) is real.
* ``real=True`` — a REAL metadata decoder built on stdlib only (no Pillow /
  ffmpeg in this container): PNG IHDR, GIF logical screen + block-walk frame
  count, JPEG SOF scan, WAV via the ``wave`` module, BMP DIB headers, and
  ISO BMFF (mp4/mov) via a box-structure walk (mvhd/tkhd/stsz). Containers
  that genuinely need a codec (webm/mkv/...) raise NotImplementedError per
  payload, surfaced as an ``error`` row (``on_error="null"``, default) or
  raised (``on_error="raise"``) — the stage never silently fakes a real
  decode.

The payload synthesis is deterministic from the documents table so the fake
decode is SQL-oracle-able.
"""

from __future__ import annotations

import io
import struct
import wave as _wave

import pyarrow as pa

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """documents → fake media rows: payload = UTF-8 bytes of text, media_type
    cycled deterministically by doc_id."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    kinds = ["image/png", "audio/wav", "video/mp4"]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array([kinds[d % 3] for d in doc_ids], pa.string()),
            "payload": pa.array([t.encode("utf-8") for t in texts], pa.large_binary()),
        }
    )


# ---------------------------------------------------------------------------
# Real (stdlib-only) metadata decoders: one dict per payload, keys drawn from
# {width, height, frames, channels, sample_rate_hz, duration_ms}


def decode_png_meta(data: bytes) -> dict:
    """PNG signature + IHDR chunk (always first per the PNG spec): width and
    height are the two big-endian u32s at bytes 16..24."""
    if len(data) < 24 or not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    chunk_type = data[12:16]
    if chunk_type != b"IHDR":
        raise ValueError("PNG missing leading IHDR chunk")
    width, height = struct.unpack(">II", data[16:24])
    if not width or not height:
        raise ValueError("PNG with zero dimension")
    if width > 0x7FFFFFFF or height > 0x7FFFFFFF:
        # the PNG spec caps dimensions at 2^31-1; larger u32 values are
        # corrupt AND would overflow the int32 metadata columns
        raise ValueError("PNG with out-of-spec dimension")
    return {"width": width, "height": height, "frames": 1}


def _skip_gif_subblocks(data: bytes, pos: int) -> int:
    """Advance past a chain of GIF data sub-blocks (length byte + payload,
    terminated by a zero-length block)."""
    while pos < len(data):
        block_len = data[pos]
        pos += 1
        if block_len == 0:
            return pos
        pos += block_len
    raise ValueError("GIF truncated inside data sub-blocks")


def gif_frame_count(data: bytes) -> int:
    """Count GIF frames by walking the block structure (GIF89a spec
    appendix): extensions (0x21) and image descriptors (0x2C) up to the
    trailer (0x3B). No LZW decode needed — frame sampling only requires the
    count and descriptor offsets."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 × 2^(depth+1) bytes
        pos += 3 * (2 << (flags & 0x07))
    frames = 0
    while pos < len(data):
        marker = data[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            return frames
        if marker == 0x21:  # extension: label + sub-blocks
            pos = _skip_gif_subblocks(data, pos + 1)
        elif marker == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("GIF truncated in image descriptor")
            local_flags = data[pos + 8]
            pos += 9
            if local_flags & 0x80:
                pos += 3 * (2 << (local_flags & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_gif_subblocks(data, pos)
            frames += 1
        else:
            raise ValueError(f"GIF with unknown block marker 0x{marker:02x}")
    raise ValueError("GIF without trailer")


def decode_gif_meta(data: bytes) -> dict:
    """GIF87a/GIF89a logical screen descriptor (little-endian u16 pair) plus
    a real frame count from the block walk."""
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", data[6:10])
    if not width or not height:
        raise ValueError("GIF with zero dimension")
    try:
        frames = gif_frame_count(data)
    except ValueError:
        frames = 1  # dimensions were readable; a truncated tail degrades soft
    return {"width": width, "height": height, "frames": frames}


def decode_jpeg_meta(data: bytes) -> dict:
    """Walk JPEG marker segments to the first SOFn (baseline/progressive
    frame header) and read its height/width; skips tables and APPn blocks by
    declared length."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:  # standalone markers
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any frame header
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        # SOF0..SOF15 minus the table/extension markers C4/C8/CC
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(data):
                raise ValueError("truncated SOF")
            height, width = struct.unpack(">HH", data[pos + 5 : pos + 9])
            if not width or not height:
                raise ValueError("JPEG with zero dimension")
            return {"width": width, "height": height, "frames": 1}
        pos += 2 + seg_len
    raise ValueError("JPEG without SOF frame header")


def decode_wav_meta(data: bytes) -> dict:
    """RIFF/WAVE via the stdlib ``wave`` module: channels, sample rate, frame
    count, duration."""
    try:
        with _wave.open(io.BytesIO(data), "rb") as handle:
            channels = handle.getnchannels()
            rate = handle.getframerate()
            frames = handle.getnframes()
    except (_wave.Error, EOFError) as exc:
        raise ValueError(f"not a decodable WAV: {exc}") from exc
    if channels > 0x7FFFFFFF or rate > 0x7FFFFFFF:
        raise ValueError("WAV with out-of-range header fields")
    duration_ms = int(round(frames / rate * 1000)) if rate else 0
    return {
        "frames": frames,
        "channels": channels,
        "sample_rate_hz": rate,
        "duration_ms": duration_ms,
    }


def decode_webp_meta(data: bytes) -> dict:
    """WebP dimensions from the first payload chunk — all three container
    variants (RFC 9649): VP8X extended header (24-bit canvas dims), VP8
    lossy key-frame header (14-bit dims after the 0x9D012A sync code), VP8L
    lossless signature byte + packed 14+14-bit dims."""
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    fourcc = data[12:16]
    if fourcc == b"VP8X":
        width = 1 + int.from_bytes(data[24:27], "little")
        height = 1 + int.from_bytes(data[27:30], "little")
    elif fourcc == b"VP8 ":
        if data[23:26] != b"\x9d\x01\x2a":
            raise ValueError("VP8 key frame sync code missing")
        width = int.from_bytes(data[26:28], "little") & 0x3FFF
        height = int.from_bytes(data[28:30], "little") & 0x3FFF
    elif fourcc == b"VP8L":
        if data[20] != 0x2F:
            raise ValueError("VP8L signature byte missing")
        bits = int.from_bytes(data[21:25], "little")
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
    else:
        raise ValueError(f"WebP with unknown payload chunk {fourcc!r}")
    if not width or not height:
        raise ValueError("WebP with zero dimension")
    return {"width": width, "height": height, "frames": 1}


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, box_end) for each ISO BMFF box in
    [start, end): u32 size + fourcc, size==1 → u64 largesize follows,
    size==0 → box extends to the end."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4 largesize box truncated")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError("mp4 box overruns its container")
        yield btype, pos + header, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, btype: bytes):
    for found, s, e in _mp4_boxes(data, start, end):
        if found == btype:
            return s, e
    return None


def decode_mp4_meta(data: bytes) -> dict:
    """ISO BMFF (mp4/mov) metadata via a real box-structure walk — no codec
    required: mvhd gives duration (timescale-normalized), the first video
    trak gives width/height (tkhd 16.16 fixed point) and the frame count
    (stbl/stsz sample_count). Spec: ISO/IEC 14496-12 §8.2-8.7."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF container")
    moov = _mp4_find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4 without moov box")
    meta: dict = {}
    for btype, s, e in _mp4_boxes(data, *moov):
        if btype == b"mvhd":
            version = data[s]
            if version == 1:
                (timescale,) = struct.unpack_from(">I", data, s + 20)
                (duration,) = struct.unpack_from(">Q", data, s + 24)
            else:
                timescale, duration = struct.unpack_from(">II", data, s + 12)
            if timescale:
                meta["duration_ms"] = int(round(duration / timescale * 1000))
        elif btype == b"trak" and "frames" not in meta:
            tkhd = _mp4_find(data, s, e, b"tkhd")
            mdia = _mp4_find(data, s, e, b"mdia")
            if mdia is None:
                continue
            hdlr = _mp4_find(data, *mdia, b"hdlr")
            if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
                continue
            if tkhd is not None:
                ts, _te = tkhd
                offset = ts + (88 if data[ts] == 1 else 76)
                width_fx, height_fx = struct.unpack_from(">II", data, offset)
                if width_fx and height_fx:
                    meta["width"] = width_fx >> 16
                    meta["height"] = height_fx >> 16
            minf = _mp4_find(data, *mdia, b"minf")
            stbl = _mp4_find(data, *minf, b"stbl") if minf else None
            stsz = _mp4_find(data, *stbl, b"stsz") if stbl else None
            if stsz is not None:
                (sample_count,) = struct.unpack_from(">I", data, stsz[0] + 8)
                meta["frames"] = sample_count
    if not meta:
        raise ValueError("mp4 moov without readable mvhd/trak metadata")
    return meta


def decode_bmp_meta(data: bytes) -> dict:
    """BMP file header + BITMAPINFOHEADER (and the ancient BITMAPCOREHEADER):
    signed little-endian dimensions; a negative height encodes a top-down
    bitmap of |height| rows."""
    import struct

    if len(data) < 26 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (header_size,) = struct.unpack_from("<I", data, 14)
    if header_size == 12:  # BITMAPCOREHEADER: u16 dimensions
        width, height = struct.unpack_from("<HH", data, 18)
    elif header_size >= 40:  # BITMAPINFOHEADER and successors: i32
        width, height = struct.unpack_from("<ii", data, 18)
        height = abs(height)
    else:
        raise ValueError(f"BMP with unsupported DIB header size {header_size}")
    if width <= 0 or height == 0:
        raise ValueError("BMP with non-positive dimension")
    if width > 0x7FFFFFFF or height > 0x7FFFFFFF:
        raise ValueError("BMP with out-of-range dimension")
    return {"width": width, "height": height}


_SNIFFERS = (
    (lambda d: d.startswith(_PNG_SIG), decode_png_meta),
    (lambda d: d[:6] in (b"GIF87a", b"GIF89a"), decode_gif_meta),
    (lambda d: d[:2] == b"\xff\xd8", decode_jpeg_meta),
    (lambda d: d[:4] == b"RIFF" and d[8:12] == b"WAVE", decode_wav_meta),
    (lambda d: d[:4] == b"RIFF" and d[8:12] == b"WEBP", decode_webp_meta),
    (lambda d: d[:2] == b"BM", decode_bmp_meta),
    (lambda d: len(d) >= 12 and d[4:8] == b"ftyp", decode_mp4_meta),
)


def decode_media_meta(data: bytes, media_type: str = "") -> dict:
    """Dispatch on sniffed magic bytes (declared media_type is advisory only,
    like the MIME kernel's markup sniffing — cf. reference lib/parse.js
    content-type fallbacks). Raises NotImplementedError for container types
    that genuinely need a codec, ValueError for corrupt payloads."""
    for sniff, decoder in _SNIFFERS:
        if sniff(data):
            return decoder(data)
    if media_type.startswith(("video/", "audio/")) or media_type == "image/avif":
        raise NotImplementedError(
            f"decoding {media_type or 'this container'} requires a codec "
            "library not present in this environment"
        )
    raise ValueError("unrecognized media payload (no known magic bytes)")


_REAL_FIELDS = (
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("frames", pa.int64()),
    ("channels", pa.int32()),
    ("sample_rate_hz", pa.int32()),
    ("duration_ms", pa.int64()),
)


class MediaDecodeBatch:
    """Actor-pool decode stage. ``real=False`` (default) runs the
    deterministic fake decoder (oracle-able); ``real=True`` runs the stdlib
    metadata decoder above. ``on_error`` (real path only): "null" emits an
    ``error`` string and null metadata for undecodable payloads, "raise"
    propagates — per-payload failures must not be able to kill a 100-TB job
    unless the caller opts in."""

    def __init__(self, real: bool = False, on_error: str = "null"):
        self.real = real
        if on_error not in ("null", "raise"):
            raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        media_types = batch.column("media_type").to_pylist()
        n_bytes = [len(p) for p in payloads]
        if self.real:
            metas: list[dict] = []
            errors: list[str | None] = []
            for payload, media_type in zip(payloads, media_types):
                try:
                    metas.append(decode_media_meta(payload, media_type))
                    errors.append(None)
                except (ValueError, NotImplementedError) as exc:
                    if self.on_error == "raise":
                        raise
                    metas.append({})
                    errors.append(f"{type(exc).__name__}: {exc}")
            cols = {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "media_type": pa.array(media_types, pa.string()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
            }
            for name, dtype in _REAL_FIELDS:
                cols[name] = pa.array([m.get(name) for m in metas], dtype)
            cols["error"] = pa.array(errors, pa.string())
            return pa.table(cols)
        # fake "decode": dimensions derived deterministically from the bytes
        width = [(n % 640) + 1 for n in n_bytes]
        height = [(n % 480) + 1 for n in n_bytes]
        frames = [1 if mt.startswith("image/") else (n % 100) + 1
                  for mt, n in zip(media_types, n_bytes)]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "media_type": pa.array(media_types, pa.string()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "frames": pa.array(frames, pa.int32()),
            }
        )


def synthesize_real_media_batch(batch: pa.Table) -> pa.Table:
    """documents → REAL media payloads (valid PNG / WAV bytes) with metadata
    a pure function of doc_id — so decoding them back with the real stdlib
    decoder is SQL-oracle-able:

    * even doc_id → PNG, width = doc_id % 640 + 1, height = doc_id % 480 + 1
    * odd  doc_id → WAV, channels = (doc_id >> 1) % 2 + 1, rate 8000 Hz,
      frames = (doc_id % 100 + 1) * 80 → duration_ms = frames / 8 exactly
    """
    doc_ids = batch.column("doc_id").to_pylist()
    types: list[str] = []
    payloads: list[bytes] = []
    for doc_id in doc_ids:
        if doc_id % 2 == 0:
            width = doc_id % 640 + 1
            height = doc_id % 480 + 1
            ihdr = struct.pack(">II", width, height) + bytes([8, 6, 0, 0, 0])
            payloads.append(
                _PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
            )
            types.append("image/png")
        else:
            channels = (doc_id >> 1) % 2 + 1
            frames = (doc_id % 100 + 1) * 80
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as handle:
                handle.setnchannels(channels)
                handle.setsampwidth(2)
                handle.setframerate(8000)
                handle.writeframes(b"\x00\x00" * (channels * frames))
            payloads.append(buf.getvalue())
            types.append("audio/wav")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


_MP4_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def synthesize_mp4_batch(batch: pa.Table) -> pa.Table:
    """documents → REAL minimal ISO BMFF payloads (ftyp + moov with one
    video trak; no mdat — metadata only) whose fields are arithmetic on
    doc_id: frames = doc_id%30+1 at 25 fps (duration_ms = frames·40),
    width = doc_id%64+16, height = doc_id%48+9."""
    doc_ids = batch.column("doc_id").to_pylist()
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    payloads = []
    for doc_id in doc_ids:
        frames = doc_id % 30 + 1
        width = doc_id % 64 + 16
        height = doc_id % 48 + 9
        duration = frames * 40  # timescale 1000 → exact milliseconds
        mvhd = _mp4_box(
            b"mvhd",
            bytes(4) + bytes(8) + struct.pack(">II", 1000, duration)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10) + _MP4_MATRIX + bytes(24) + struct.pack(">I", 2),
        )
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07" + bytes(8) + struct.pack(">I", 1) + bytes(4)
            + struct.pack(">I", duration) + bytes(8) + bytes(8) + _MP4_MATRIX
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = _mp4_box(
            b"mdhd", bytes(4) + bytes(8) + struct.pack(">II", 1000, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _mp4_box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"Video\x00")
        stsz = _mp4_box(b"stsz", bytes(4) + struct.pack(">II", 0, frames))
        stbl = _mp4_box(b"stbl", stsz)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        payloads.append(ftyp + _mp4_box(b"moov", mvhd + trak))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["video/mp4"] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def synthesize_webp_batch(batch: pa.Table) -> pa.Table:
    """documents → REAL WebP payloads cycling the three container variants
    by doc_id%3 (VP8X extended / VP8 lossy / VP8L lossless), dimensions
    arithmetic on doc_id: width = doc_id%1024+1, height = doc_id%512+1."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads = []
    for doc_id in doc_ids:
        width = doc_id % 1024 + 1
        height = doc_id % 512 + 1
        variant = doc_id % 3
        if variant == 0:
            body = (b"VP8X" + (10).to_bytes(4, "little") + bytes(4)
                    + (width - 1).to_bytes(3, "little")
                    + (height - 1).to_bytes(3, "little"))
        elif variant == 1:
            frame = (bytes(3) + b"\x9d\x01\x2a"
                     + width.to_bytes(2, "little") + height.to_bytes(2, "little")
                     + bytes(4))
            body = b"VP8 " + len(frame).to_bytes(4, "little") + frame
        else:
            bits = (width - 1) | ((height - 1) << 14)
            frame = b"\x2f" + bits.to_bytes(4, "little") + bytes(5)
            body = b"VP8L" + len(frame).to_bytes(4, "little") + frame
        payloads.append(
            b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["image/webp"] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def decode_webp(documents_ds, batch_size: int = 64, concurrency=2):
    """documents → synthesized VALID WebP payloads (all three variants) →
    real dimension decode through the sniffing dispatcher."""
    media = documents_ds.map_batches(synthesize_webp_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaDecodeBatch,
        fn_constructor_kwargs={"real": True, "on_error": "null"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_video_meta(documents_ds, batch_size: int = 64, concurrency=2):
    """documents → synthesized VALID mp4 containers → real box-walk decode.
    Every row must decode; the metadata round-trips the synthesis arithmetic
    (the SQL oracle's check)."""
    media = documents_ds.map_batches(synthesize_mp4_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaDecodeBatch,
        fn_constructor_kwargs={"real": True, "on_error": "null"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_media_real(documents_ds, batch_size: int = 32, concurrency=2):
    """documents → synthesized VALID PNG/WAV payloads → real stdlib decode.
    Every row must decode (error stays null); the metadata round-trips the
    synthesis arithmetic, which is what the SQL oracle checks."""
    media = documents_ds.map_batches(synthesize_real_media_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaDecodeBatch,
        fn_constructor_kwargs={"real": True, "on_error": "null"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_media(documents_ds, batch_size: int = 32, concurrency=2, real: bool = False,
                 on_error: str = "null"):
    """documents → synthesized media → actor-pool decode. Small batches:
    real media payloads are MBs each, so batch × concurrency must fit the
    worker heap (the guide's memory rule)."""
    media = documents_ds.map_batches(synthesize_media_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaDecodeBatch,
        fn_constructor_kwargs={"real": real, "on_error": on_error},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
