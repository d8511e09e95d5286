"""Sample-level audio operators: real 16-bit PCM decode, windowed integer
features, error rows, Ray pipeline shape (functions/audioops.py)."""

from __future__ import annotations

import io
import wave as _wave

import numpy as np
import pyarrow as pa
import pytest

from mhtml_to_html_ray.functions.audioops import (
    AudioFeaturesBatch,
    audio_features,
    decode_wav_samples,
    synthesize_wav_pcm_batch,
)


def _docs_batch(doc_ids):
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64())})


def _wav_bytes(samples: np.ndarray, channels: int = 1, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as handle:
        handle.setnchannels(channels)
        handle.setsampwidth(2)
        handle.setframerate(rate)
        handle.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_round_trips_pcm():
    samples = np.array([-2048, -1, 0, 1, 2047, 123], dtype=np.int16)
    decoded, rate = decode_wav_samples(_wav_bytes(samples))
    assert rate == 8000
    assert decoded.shape == (6, 1)
    assert decoded[:, 0].tolist() == samples.tolist()
    # stereo keeps channel separation
    stereo = np.array([[1, -1], [2, -2]], dtype=np.int16)
    decoded, _ = decode_wav_samples(_wav_bytes(stereo.ravel(), channels=2))
    assert decoded.tolist() == stereo.tolist()


def test_decode_rejects_non_pcm16_and_corrupt():
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(1)  # 8-bit
        handle.setframerate(8000)
        handle.writeframes(b"\x00\x01")
    with pytest.raises(NotImplementedError):
        decode_wav_samples(buf.getvalue())
    with pytest.raises(ValueError):
        decode_wav_samples(b"RIFFgarbage")


def test_synthesis_matches_closed_form():
    batch = synthesize_wav_pcm_batch(_docs_batch([0, 7, 49, 123]))
    for doc_id, payload in zip(
        batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
    ):
        samples, rate = decode_wav_samples(payload)
        n = (doc_id % 50 + 2) * 40
        assert rate == 8000 and samples.shape == (n, 1)
        i = np.arange(n, dtype=np.int64)
        expect = (doc_id * 31 + i * 17) % 4096 - 2048
        assert (samples[:, 0] == expect).all()


def test_window_features_exact():
    batch = synthesize_wav_pcm_batch(_docs_batch([3, 12]))
    out = AudioFeaturesBatch(40)(batch)
    frame = out.to_pylist()
    for doc_id in (3, 12):
        rows = [r for r in frame if r["doc_id"] == doc_id]
        assert [r["window_idx"] for r in rows] == list(range(doc_id % 50 + 2))
        n = (doc_id % 50 + 2) * 40
        i = np.arange(n, dtype=np.int64)
        v = (doc_id * 31 + i * 17) % 4096 - 2048
        win = v.reshape(-1, 40)
        neg = win < 0
        assert [r["sum_abs"] for r in rows] == np.abs(win).sum(axis=1).tolist()
        assert [r["max_abs"] for r in rows] == np.abs(win).max(axis=1).tolist()
        assert [r["zero_crossings"] for r in rows] == (
            (neg[:, 1:] != neg[:, :-1]).sum(axis=1).tolist()
        )
        assert all(r["error"] is None for r in rows)


def test_window_tail_drop_and_errors():
    # 90 samples at window 40 -> 2 windows, 10-sample tail dropped
    samples = np.arange(90, dtype=np.int16) - 45
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [_wav_bytes(samples), b"not audio"], pa.large_binary()
            ),
        }
    )
    out = AudioFeaturesBatch(40)(batch).to_pylist()
    good = [r for r in out if r["doc_id"] == 1]
    assert [r["window_idx"] for r in good] == [0, 1]
    assert good[0]["sum_abs"] == int(np.abs(samples[:40].astype(np.int64)).sum())
    bad = [r for r in out if r["doc_id"] == 2]
    assert len(bad) == 1 and bad[0]["window_idx"] == -1
    assert bad[0]["error"].startswith("ValueError")
    with pytest.raises(ValueError):
        AudioFeaturesBatch(0)


def test_audio_pipeline_over_dataset(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(range(30), pa.int64())}))
    frame = audio_features(docs).to_pandas()
    assert len(frame) == sum(d % 50 + 2 for d in range(30))
    assert frame["error"].isna().all()
    assert (frame.groupby("doc_id")["window_idx"].max().sort_index().to_numpy()
            == np.arange(30) % 50 + 1).all()
