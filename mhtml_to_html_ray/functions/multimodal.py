"""Multimodal column plumbing: opaque binary payloads with typed metadata.

The image/audio decode libraries are not available in this container, so the
decode kernels are STUBS behind a clearly-marked switch:

* ``decode_media_batch(..., real=True)`` raises NotImplementedError — the
  place a Pillow/ffmpeg-backed decoder plugs in.
* the default deterministic fake decoder exercises ALL the Ray-side plumbing
  for real: binary column in, struct metadata out, actor-pool stage, small
  batch sizes for large payloads.

The payload synthesis is deterministic from the documents table so the fake
decode is SQL-oracle-able (octet_length etc.).
"""

from __future__ import annotations

import pyarrow as pa


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


class MediaDecodeBatch:
    """Actor-pool decode stage. ``real=False`` (default) runs the
    deterministic fake decoder; ``real=True`` raises NotImplementedError
    where a real decoder (PIL.Image.open / soundfile / pyav) would load —
    keeping the actor signature, schema and batch sizing identical."""

    def __init__(self, real: bool = False):
        self.real = real
        if real:
            # the import-try gate a real deployment would use
            raise NotImplementedError(
                "media decode requires image/audio libs not present in this "
                "environment; construct with real=False for the fake decoder"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        media_types = batch.column("media_type").to_pylist()
        n_bytes = [len(p) for p in payloads]
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


def decode_media(documents_ds, batch_size: int = 32, concurrency=2):
    """documents → synthesized media → actor-pool fake decode. Small batches:
    real media payloads are MBs each, so batch × concurrency must fit the
    worker heap (the guide's memory rule)."""
    media = documents_ds.map_batches(synthesize_media_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaDecodeBatch,
        fn_constructor_kwargs={"real": False},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
