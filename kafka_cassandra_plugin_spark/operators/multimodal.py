"""Multimodal column handling (SURVEY.md §2.2 G62; BASELINE.json north
star: "multimodal columns").

Design: media are *opaque binary columns* plus a typed metadata struct,
side-by-side with relational columns in one schema - the lakehouse
pattern that survives 100 TB (media bytes stay columnar-compressed in
parquet; metadata predicates prune row groups without touching bytes).

    media_schema = media_id bigint, kind string, payload binary,
                   meta struct<width int, height int, sample_rate int,
                              duration_ms int, codec string>

Decode / feature-extraction run as Arrow-batched ``mapInPandas`` so each
Python worker amortizes per-batch overhead and memory stays bounded by
the batch size, not the partition size.  The image/audio codecs are NOT
in this container, so the decode kernels are deterministic STUBS (clearly
marked): they synthesize pixel/sample features from the payload bytes.
The Spark-side plumbing - schema, batching, partitioning, null handling -
is real and tested (tests/test_multimodal.py); swapping a stub for
PIL/librosa changes one inner function, nothing in the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import ensure_min_parallelism
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("codec", StringType()),
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", StructType(META_FIELDS)),
    ]
)

FEATURE_DIM = 16


def _stub_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB decode kernel: deterministic pseudo-features from payload
    bytes (sha256 expand -> [0,1) floats).  Replace with a real decoder
    (PIL / torchvision / librosa) in deployments - same signature, same
    plan."""
    if payload is None:
        return [0.0] * dim
    out: list[float] = []
    h = payload
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h[:8])
    return out[:dim]


def decode_features(media: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id",
                    batch_note_col: str | None = "_batch_rows") -> DataFrame:
    """Per-media feature vector via Arrow-batched mapInPandas.

    Output: (media_id, features array<double>[, _batch_rows]) -
    ``_batch_rows`` records the Arrow batch size each row traveled in
    (observability for the batching the tests assert on)."""
    schema = f"{id_col} bigint, features array<double>"
    if batch_note_col:
        schema += f", {batch_note_col} int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [_stub_features(p) for p in pdf[payload_col]],
                }
            )
            if batch_note_col:
                out[batch_note_col] = len(pdf)
            yield out

    media = ensure_min_parallelism(media.select(id_col, payload_col))
    return media.mapInPandas(kernel, schema)


def resize_plan(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize *planning* is pure metadata arithmetic (JVM-side): compute
    the target dims + scale factor per image without touching payload
    bytes; only rows that actually need resizing reach the (stubbed)
    decode kernel downstream.  This metadata-prune-then-decode split is
    the 100 TB-critical part."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(max_w) / w, F.lit(max_h) / h, F.lit(1.0)
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        w.alias("src_w"),
        h.alias("src_h"),
        scale.alias("scale"),
        # least() clamp: w * (max_w/w) can overshoot max_w by one ulp,
        # and ceil would then round past the bound
        F.least(F.ceil(w * scale), F.lit(max_w)).cast("int").alias("dst_w"),
        F.least(F.ceil(h * scale), F.lit(max_h)).cast("int").alias("dst_h"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: explode each video row into the frame
    timestamps to decode (metadata-only; the decode of each frame is the
    stub kernel).  Output one row per (media_id, frame_ts_ms)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def audio_window_plan(media: DataFrame, window_ms: int = 500) -> DataFrame:
    """Audio feature-window plan: (media_id, win_start_ms, n_samples) per
    analysis window from sample_rate/duration metadata."""
    a = media.filter(F.col("kind") == "audio")
    return a.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(window_ms),
            )
        ).alias("win_start_ms"),
        (F.col("meta.sample_rate") * window_ms / 1000).cast("int").alias("n_samples"),
    )


def synth_media_table(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Build a deterministic media table from any text table (test
    substrate: payload = utf-8 bytes of the text; kind/meta derived from
    the id).  Exercises the full schema incl. binary + struct columns."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col(id_col) % 5000 + 100).cast("int").alias("duration_ms"),
        F.lit("stub").alias("codec"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        meta.alias("meta"),
    )
