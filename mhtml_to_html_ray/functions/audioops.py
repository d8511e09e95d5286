"""Sample-level audio operators: WAV PCM decode → windowed feature
extraction as an actor-pool ``map_batches`` stage — the audio counterpart of
``imageops`` (decode real bytes, window them, emit exact integer features).

The decoder is the stdlib ``wave`` module plus numpy reinterpretation —
real 16-bit PCM decode, no codec library needed. Synthesis is a
deterministic sawtooth in ``doc_id`` (sample_i = ((doc_id·31 + i·17) mod
4096) − 2048), so per-window sums, maxima and zero-crossing counts are all
closed-form integers the DuckDB oracle recomputes.

Features per (doc, window): sum of |s|, max |s|, and sign-change count —
the integer skeleton of RMS/peak/ZCR used by audio quality filters; kept
integer-exact so the correctness gate hashes match bit-for-bit.
"""

from __future__ import annotations

import io
import struct
import wave as _wave

import numpy as np
import pyarrow as pa


def decode_wav_samples(data: bytes) -> tuple[np.ndarray, int]:
    """Real PCM decode: (frames, channels) int16 array + sample rate.
    Non-16-bit widths raise NotImplementedError (no other width is
    synthesized or common in speech corpora)."""
    try:
        with _wave.open(io.BytesIO(data), "rb") as handle:
            width = handle.getsampwidth()
            if width != 2:
                raise NotImplementedError(f"{8 * width}-bit PCM")
            channels = handle.getnchannels()
            rate = handle.getframerate()
            frames = handle.readframes(handle.getnframes())
    except (_wave.Error, EOFError, struct.error) as exc:
        raise ValueError(f"not a decodable WAV: {exc}") from exc
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, channels)
    return samples, rate


def synthesize_wav_pcm_batch(batch: pa.Table) -> pa.Table:
    """documents → real mono 16-bit WAV payloads, frames = (doc_id%50+2)·40,
    8 kHz, sawtooth samples closed-form in (doc_id, i)."""
    doc_ids = batch.column("doc_id").to_pylist()
    payloads = []
    for doc_id in doc_ids:
        n = (doc_id % 50 + 2) * 40
        i = np.arange(n, dtype=np.int64)
        samples = ((doc_id * 31 + i * 17) % 4096 - 2048).astype("<i2")
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(8000)
            handle.writeframes(samples.tobytes())
        payloads.append(buf.getvalue())
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(["audio/wav"] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


class AudioFeaturesBatch:
    """Decode → fixed-width windows → integer features per (doc, window):
    ``sum_abs``, ``max_abs``, ``zero_crossings`` (sign changes between
    consecutive samples WITHIN the window, negative vs non-negative).
    Frame counts that don't divide evenly drop the tail remainder — the
    contract a windowed featurizer needs stated, and the one the oracle
    restates. Undecodable payloads emit an error row (window −1)."""

    def __init__(self, window: int = 40):
        if window <= 0:
            raise ValueError("window must be positive")
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_win, out_sum, out_max, out_zc, out_err = [], [], [], [], [], []
        for doc_id, payload in zip(doc_ids, payloads):
            try:
                samples, _rate = decode_wav_samples(payload)
            except (ValueError, NotImplementedError) as exc:
                out_id.append(doc_id)
                out_win.append(-1)
                out_sum.append(None)
                out_max.append(None)
                out_zc.append(None)
                out_err.append(f"{type(exc).__name__}: {exc}")
                continue
            mono = samples[:, 0].astype(np.int64)
            n_windows = len(mono) // self.window
            if not n_windows:
                continue
            trimmed = mono[: n_windows * self.window].reshape(n_windows, self.window)
            neg = trimmed < 0
            out_id.extend([doc_id] * n_windows)
            out_win.extend(range(n_windows))
            out_sum.extend(np.abs(trimmed).sum(axis=1).tolist())
            out_max.extend(np.abs(trimmed).max(axis=1).tolist())
            out_zc.extend((neg[:, 1:] != neg[:, :-1]).sum(axis=1).tolist())
            out_err.extend([None] * n_windows)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "window_idx": pa.array(out_win, pa.int64()),
                "sum_abs": pa.array(out_sum, pa.int64()),
                "max_abs": pa.array(out_max, pa.int64()),
                "zero_crossings": pa.array(out_zc, pa.int64()),
                "error": pa.array(out_err, pa.string()),
            }
        )


def audio_features(documents_ds, window: int = 40, batch_size: int = 64,
                   concurrency=2):
    """documents → synthesized PCM WAVs → windowed integer features."""
    media = documents_ds.map_batches(synthesize_wav_pcm_batch, batch_format="pyarrow")
    return media.map_batches(
        AudioFeaturesBatch,
        fn_constructor_kwargs={"window": window},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
