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


def decode_metadata(payloads: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payload → typed metadata rows.
    Arrow-batched, partition-parallel — the shape of every multimodal
    feature-extraction stage (resize, frame-sample, spectrogram)."""
    return payloads.mapInPandas(decode_stub, schema=DECODED_SCHEMA)


def not_implemented_real_decode() -> None:
    """Marker for the real codec path."""
    raise NotImplementedError(
        "real image/audio decode requires PIL/librosa; container ships neither"
    )
