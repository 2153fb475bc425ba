"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container — clearly marked
below); the Spark-side plumbing — schema, batch shape, partition-size
control, null propagation — is real and tested.

At 100 TB the rules are: (1) binary columns ride their own tables
keyed by content hash so text-only stages never scan them; (2)
maxPartitionBytes sizes batches, not row counts; (3) extraction
emits fixed-width feature arrays, never re-emits payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, feature array<float>"
)


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation would Pillow/turbojpeg-decode to HxWxC.

    Deterministic fake: derive a pseudo-pixel array from the payload
    bytes so downstream shapes/statistics are exercised end-to-end."""
    raise NotImplementedError(
        "image decoding requires Pillow/libjpeg — not available in this "
        "container; use extract_media_features(deterministic_fake=True)"
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake embedding: byte-histogram moments. Stands in
    for a real CNN/CLIP feature so partitioning/schema/batching are
    tested with real shapes."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """media table -> (media_id, kind, n_bytes, feature[dim]).

    mapInPandas so each Arrow batch is one vectorized pass; payloads are
    dropped from the output (never re-shuffle binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if deterministic_fake:
                    feats.append(_fake_feature(payload, dim))
                else:  # pragma: no cover - requires decode libs
                    feats.append(_decode_image(payload).mean(axis=(0, 1)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows via sequence/explode — pure built-ins; the actual frame decode
    would plug into extract_media_features per frame."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def attach_media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata projection useful for filtering before any decode:
    payload size, aspect ratio, bytes-per-pixel — all JVM-side."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.length("payload").alias("n_bytes"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
        F.when(
            (F.col("width") > 0) & (F.col("height") > 0),
            F.col("width") / F.col("height"),
        ).alias("aspect_ratio"),
        F.when(
            (F.col("width") > 0) & (F.col("height") > 0),
            F.length("payload") / (F.col("width") * F.col("height")),
        ).alias("bytes_per_pixel"),
    )
