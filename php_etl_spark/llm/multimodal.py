"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched
mapInPandas.

The decode step is STUBBED — the real image/audio libraries are not
in this container. ``decode_features(..., fake=True)`` substitutes a
deterministic fake so the Spark-side contract (schema, batching,
partition behavior) is fully real and tested;; ``fake=False`` raises
NotImplementedError at the point a real decoder (PIL/ffmpeg/torchcodec)
would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata (here derived
    from text since the synthetic corpus has no media; in production
    the payload is the image/audio bytes and metadata rides along)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a media decoder: n_features values
    derived from byte statistics. Stable across runs/machines."""
    if not payload:
        return [0.0] * n_features
    return [
        float(sum(payload[i::n_features]) % 997) / 997.0 for i in range(n_features)
    ]


def decode_features(
    df: DataFrame,
    n_features: int = 8,
    fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload, mime)
    yielding fixed-width feature vectors. The UDF boundary transfers
    columnar Arrow batches — the right shape for real image decode
    (PIL per batch) or audio frame sampling.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; "
                    "run with fake=True in this environment"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(
                        lambda p: _fake_decode(bytes(p), n_features)
                    ),
                }
            )

    src = df.select("doc_id", "payload", "mime")
    return src.mapInPandas(decode_batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", StringType()),  # hex; binary in production
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 64,
    every: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling for video-like payloads: split the binary into
    fixed-size frames, keep every ``every``-th — a one-to-many
    mapInPandas (UDTF shape; each Arrow batch yields a frame table).
    The splitter is the STUB; a real pipeline seeks keyframes with
    ffmpeg/torchcodec per batch. Output rows ∝ payload bytes /
    (frame_size * every) — the partition-size math a 100 TB video
    corpus needs (frames explode row counts; keep frame batches
    bounded)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg/torchcodec; "
                    "run with fake=True in this environment"
                )
            out = {"doc_id": [], "frame_idx": [], "frame": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for j, start in enumerate(range(0, len(raw), frame_size)):
                    if j % every:
                        continue
                    chunk = raw[start : start + frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(j)
                    out["frame"].append(chunk.hex())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(frames, FRAME_SCHEMA)
