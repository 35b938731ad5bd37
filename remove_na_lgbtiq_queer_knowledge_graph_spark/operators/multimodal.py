"""Multimodal column plumbing (BASELINE.json scale extensions).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the
actual codec decode is STUBBED (no image/audio libs in this container)
behind ``decode_stub``: a deterministic fake that derives pseudo
metadata from the byte content, so plumbing and oracles stay checkable.
Swapping in a real decoder (PIL/librosa/ffmpeg) changes only the body
of the pandas function, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, fmt string"
)


def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a binary media column: (id, payload binary).  In production
    this is the raw image/audio bytes column of the lakehouse table."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder over Arrow batches.

    Real decoders (PIL.Image.open etc.) are unavailable here —
    the pseudo width/height/format derive from byte length so results
    are reproducible and SQL-checkable.  Raises on null payloads like a
    real decoder would on corrupt bytes.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": n_bytes % 640,
                "height": (n_bytes * 7) % 480,
                "fmt": (n_bytes % 2).map({0: "png", 1: "jpeg"}),
            }
        )


def decode_metadata(payloads: DataFrame, decode_fn=decode_stub,
                    schema: str = DECODED_SCHEMA) -> DataFrame:
    """mapInPandas decode: binary payload → typed metadata rows.
    Arrow-batched, partition-parallel — the shape of every multimodal
    feature-extraction stage (resize, frame-sample, spectrogram).

    ``decode_fn`` is the injection seam: a real deployment passes a
    batches→batches function that opens the payload with PIL/ffmpeg —
    nothing else in the plan changes (dependency-injection tested in
    tests/test_llm_ops.py)."""
    return payloads.mapInPandas(decode_fn, schema=schema)


def not_implemented_real_decode() -> None:
    """Marker for the real codec path."""
    raise NotImplementedError(
        "real image/audio decode requires PIL/librosa; container ships neither"
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, t_ms bigint, frame_sig string"

RESIZED_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, scale double, resized_sig string"
)


def frame_sample_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame sampling: one input row → N frame rows (the 1→N Arrow
    batch shape every frame/segment extractor has).  Frame count and
    timestamps derive deterministically from the payload (stub for an
    ffmpeg keyframe walk); frame content is fingerprinted, not stored —
    at 100 TB you write frame refs + sigs, not frame bytes, back to the
    lake."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "t_ms": [], "frame_sig": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload) % 8 + 1
            for i in range(n):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["t_ms"].append(i * 1000)
                out["frame_sig"].append(
                    hashlib.md5(bytes(payload) + f":{i}".encode()).hexdigest()
                )
        yield pd.DataFrame(out)


def frame_sample(payloads: DataFrame, sample_fn=frame_sample_stub,
                 schema: str = FRAME_SCHEMA) -> DataFrame:
    """mapInPandas frame sampler (1 video row → N frame rows).
    ``sample_fn`` is the real-codec injection seam."""
    return payloads.mapInPandas(sample_fn, schema=schema)


def resize_stub(
    target_w: int, target_h: int,
):
    """Image resize plan: metadata math is real (fit-scale), pixel work is
    the stubbed codec.  Emits a content signature of the would-be resized
    payload so downstream exact-dedup over resized media stays testable."""
    import hashlib

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            width = n_bytes % 640
            height = (n_bytes * 7) % 480
            scale = (
                pd.concat(
                    [target_w / width.clip(lower=1), target_h / height.clip(lower=1)],
                    axis=1,
                )
                .min(axis=1)
                .round(6)
            )
            sig = [
                hashlib.md5(bytes(p) + f"@{target_w}x{target_h}".encode()).hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "scale": scale,
                    "resized_sig": sig,
                }
            )

    return _run


def resize_plan(payloads: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """mapInPandas resize stage (binary in → typed metadata + signature)."""
    return payloads.mapInPandas(resize_stub(target_w, target_h), schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = "doc_id bigint, window_idx bigint, n_samples bigint, rms double"


def audio_energy_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Windowed audio energy over the fake-PCM decode: every payload
    byte is one unsigned 8-bit sample (the deterministic stand-in for a
    librosa/ffmpeg decode — container ships neither), centered at 128;
    per fixed 16-sample window emit the RMS.  1 payload row → N window
    rows, vectorized numpy per Arrow batch — the exact shape of a real
    segment-energy / VAD pre-filter stage over an audio lake column."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "window_idx": [],
                                "n_samples": [], "rms": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(bytes(payload), dtype=np.uint8) \
                  .astype(np.float64) - 128.0
            for w in range((len(a) + 15) // 16):
                seg = a[w * 16:(w + 1) * 16]
                out["doc_id"].append(doc_id)
                out["window_idx"].append(w)
                out["n_samples"].append(len(seg))
                out["rms"].append(round(float(np.sqrt(np.mean(seg * seg))), 6))
        yield pd.DataFrame(out)


def audio_energy(payloads: DataFrame, energy_fn=audio_energy_stub,
                 schema: str = AUDIO_SCHEMA) -> DataFrame:
    """mapInPandas windowed-energy extractor; ``energy_fn`` is the
    real-codec injection seam (same contract as decode_metadata)."""
    return payloads.mapInPandas(energy_fn, schema=schema)
