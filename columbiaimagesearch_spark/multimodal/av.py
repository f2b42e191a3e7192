"""Audio / video columns — opaque binary + typed metadata, Arrow plumbing.

Extends the reference's image-extraction contract (V14-V17, see
``images.py``) to the other training-data modalities: media rides as a
``binary`` column with a typed metadata struct; decode / feature-extract /
frame-sample run as ``mapInPandas`` stages with per-executor state. The
actual codecs are STUBBED (no av libs in this container) behind
``NotImplementedError`` with deterministic fakes — the Spark-side contract
(schemas, batch shapes, partitioning, failure tolerance) is real and tested.

Scale shape: decode+featurize is one Arrow pass over binary content; frame
sampling explodes to (id, frame_idx, feature) rows — features are small
fixed-dim vectors, so the post-extract shuffle carries vectors ~100x smaller
than the media bytes, which never shuffle (binaryFile splits are map-side
only).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEAT_DIM = 16
FRAME_FEAT_DIM = 24

AUDIO_META_SCHEMA = "struct<sample_rate:int,n_samples:bigint,channels:int>"
VIDEO_META_SCHEMA = "struct<fps:double,n_frames:int,width:int,height:int>"


# ---------------------------------------------------------------------------
# Decode boundary: STUBs + deterministic fakes
# ---------------------------------------------------------------------------


def decode_audio(data: bytes) -> np.ndarray:
    """Decode audio bytes to a float32 waveform (n_samples,).

    STUB: requires an audio codec library not present in this container."""
    raise NotImplementedError(
        "audio decoding requires a codec library (soundfile/ffmpeg); "
        "use fake_decode_audio for deterministic tests"
    )


def decode_video_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Decode one video frame to HxWx3 uint8.

    STUB: requires a video codec library not present in this container."""
    raise NotImplementedError(
        "video decoding requires a codec library (opencv/ffmpeg); "
        "use fake_decode_video_frame for deterministic tests"
    )


def fake_decode_audio(data: bytes, n_samples: int = 256) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha1(b"aud:" + (data or b"")).digest()[:4], "big")
    return np.random.RandomState(seed).randn(n_samples).astype(np.float32)


def fake_decode_video_frame(data: bytes, frame_idx: int) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.sha1(b"vid:%d:" % frame_idx + (data or b"")).digest()[:4], "big"
    )
    return np.random.RandomState(seed).randint(0, 256, size=(8, 8, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Audio featurization: one Arrow pass, windowed energy features
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "media_id string, duration_s double, rms double, n_windows int, "
    f"feature array<float>"
)


def extract_audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
    decode=fake_decode_audio,
    n_windows: int = AUDIO_FEAT_DIM,
) -> DataFrame:
    """(id, content, meta) -> per-clip features: duration from metadata, RMS
    + per-window energy vector from the decoded waveform. Failure tolerance
    follows V17: a row that fails to decode yields NaN features, not a dead
    task."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, durs, rmss, nw, feats = [], [], [], [], []
            for mid, blob, meta in zip(pdf[id_col], pdf[content_col], pdf[meta_col]):
                ids.append(mid)
                sr = meta["sample_rate"] if meta is not None else 0
                n = meta["n_samples"] if meta is not None else 0
                durs.append(float(n) / sr if sr else float("nan"))
                try:
                    wav = decode(bytes(blob) if blob is not None else b"")
                    w = np.array_split(wav.astype(np.float64), n_windows)
                    energy = np.array([float(np.sqrt((x**2).mean())) for x in w])
                    rmss.append(float(np.sqrt((wav.astype(np.float64) ** 2).mean())))
                    nw.append(len(w))
                    feats.append(energy.astype(np.float32).tolist())
                except Exception:  # noqa: BLE001 — per-row tolerance (V17)
                    rmss.append(float("nan"))
                    nw.append(0)
                    feats.append([float("nan")] * n_windows)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "duration_s": durs,
                    "rms": rmss,
                    "n_windows": nw,
                    "feature": feats,
                }
            )

    cols = media.select(id_col, content_col, meta_col)
    return cols.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Video frame sampling: explode to (id, frame_idx, feature)
# ---------------------------------------------------------------------------

FRAME_FEATURES_SCHEMA = (
    "media_id string, frame_idx int, feature array<float>"
)


def sample_frame_features(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
    decode=fake_decode_video_frame,
) -> DataFrame:
    """Sample every ``every_n``-th frame (from metadata frame count), decode,
    featurize to a FRAME_FEAT_DIM unit vector. One Arrow pass; output rows
    carry small vectors, never media bytes.

    Failure tolerance follows V17 like the audio pass (r14 — previously a
    single corrupt video raised out of the Arrow stage and killed the whole
    task, a stage-retry loop at 100 TB): a media whose decode/featurize
    raises emits ONE marker row (frame_idx = -1, NaN feature) instead; its
    already-decoded frames are discarded so a failed media is always
    exactly its marker row."""

    def featurize(frame: np.ndarray) -> np.ndarray:
        key = hashlib.sha1(b"frame:" + frame.tobytes()).digest()
        seed = int.from_bytes(key[:4], "big")
        v = np.random.RandomState(seed).randn(FRAME_FEAT_DIM)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_feat = [], [], []
            for mid, blob, meta in zip(pdf[id_col], pdf[content_col], pdf[meta_col]):
                n_frames = int(meta["n_frames"]) if meta is not None else 0
                data = bytes(blob) if blob is not None else b""
                rows: list[tuple[int, list[float]]] = []
                try:
                    for idx in range(0, n_frames, every_n):
                        frame = decode(data, idx)
                        rows.append((idx, featurize(frame).tolist()))
                except Exception:  # noqa: BLE001 — per-media tolerance (V17)
                    rows = [(-1, [float("nan")] * FRAME_FEAT_DIM)]
                for idx, feat in rows:
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_feat.append(feat)
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "feature": out_feat}
            )

    cols = media.select(id_col, content_col, meta_col)
    return cols.mapInPandas(fn, FRAME_FEATURES_SCHEMA)
