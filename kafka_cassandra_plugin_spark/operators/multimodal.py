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
the batch size, not the partition size.  TWO kernels share the same
plan (``kernel=`` on :func:`decode_features`):

- ``"stub"`` (default): deterministic pseudo-features from payload
  bytes — the oracle/test kernel, byte-format-agnostic;
- ``"codec"``: a REAL decode via :mod:`.media_codecs` (pure-stdlib
  PNG — full chunk walk, CRC, all five scanline filters — and PCM-16
  WAV), producing actual pixel/sample statistics.  Pillow/librosa are
  not in this container; where present they slot behind the same
  signature for the formats the stdlib codec declines (palette PNG,
  JPEG, interlace).

:func:`resize_images` executes the :func:`resize_plan` for real:
decode → box-mean resample → re-encode, only for rows the metadata
plan marked ``needs_resize`` (the prune-before-decode split).
The Spark-side plumbing - schema, batching, partitioning, null handling -
is tested in tests/test_multimodal.py for both kernels.
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
    plan.

    Each round consumes the FULL 32-byte digest (round-14; previously
    8 bytes/round), so the default ``FEATURE_DIM=16`` needs exactly ONE
    sha256 of the payload - which a SQL oracle can re-derive from hex
    output (the declared ``media_decode_features`` row hash-matches on
    it; DuckDB's sha256 only accepts VARCHAR, so a digest-CHAINED
    expansion could not be cross-checked).  Dims above 32 still chain
    sha256 over the previous digest."""
    if payload is None:
        return [0.0] * dim
    out: list[float] = []
    h = payload
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h[: dim - len(out)])
    return out[:dim]


def _codec_features(payload: bytes | None,
                    dim: int = FEATURE_DIM) -> list[float] | None:
    """REAL decode kernel (pure-stdlib codecs): sniff the payload's
    magic bytes, decode, and emit ``dim`` pixel/sample statistics.

    PNG → [meanR, meanG, meanB, stdR, stdG, stdB (each /255),
           8-bin luminance histogram shares, log1p(w)/10, log1p(h)/10]
    WAV → [mean, std, rms, zero-crossing rate, peak |amplitude|,
           8-bin |amplitude| histogram shares, log1p(rate)/20,
           log1p(frames)/20, channels/8]
    (both exactly 16 = FEATURE_DIM, so the two kernels are
    plan-compatible).  Returns None for undecodable payloads — the
    caller's ``on_error`` policy decides whether that raises."""
    import numpy as np

    from . import media_codecs as mc

    kind = mc.sniff_kind(payload)
    if kind == "png":
        px = mc.decode_png(payload)
        c = px.shape[2]
        if c == 1:
            rgb = np.repeat(px, 3, axis=2)
        elif c == 2:  # grey + alpha: drop alpha
            rgb = np.repeat(px[:, :, :1], 3, axis=2)
        else:  # RGB / RGBA
            rgb = px[:, :, :3]
        maxv = 65535.0 if px.dtype == np.uint16 else 255.0
        f = rgb.reshape(-1, 3).astype(np.float64) / maxv
        luma = f @ np.array([0.299, 0.587, 0.114])
        hist = np.histogram(luma, bins=8, range=(0.0, 1.0))[0]
        out = [
            *f.mean(axis=0), *f.std(axis=0),
            *(hist / max(1, luma.size)),
            float(np.log1p(px.shape[1]) / 10.0),
            float(np.log1p(px.shape[0]) / 10.0),
        ]
    elif kind == "wav":
        rate, frames = mc.decode_wav(payload)
        x = frames.astype(np.float64).mean(axis=1) / 32768.0
        n = max(1, x.size)
        zc = float(np.count_nonzero(np.diff(np.signbit(x)))) / n
        hist = np.histogram(np.abs(x), bins=8, range=(0.0, 1.0))[0]
        out = [
            float(x.mean()), float(x.std()),
            float(np.sqrt((x * x).mean())) if x.size else 0.0, zc,
            float(np.abs(x).max()) if x.size else 0.0,
            *(hist / n),
            float(np.log1p(rate) / 20.0),
            float(np.log1p(x.size) / 20.0),
            frames.shape[1] / 8.0,
        ]
    else:
        return None
    assert len(out) == dim
    return [float(v) for v in out]


def decode_features(media: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id",
                    batch_note_col: str | None = "_batch_rows",
                    kernel: str = "stub",
                    on_error: str = "raise") -> DataFrame:
    """Per-media feature vector via Arrow-batched mapInPandas.

    Output: (media_id, features array<double>[, _batch_rows]) -
    ``_batch_rows`` records the Arrow batch size each row traveled in
    (observability for the batching the tests assert on).

    ``kernel="stub"`` (default) hashes payload bytes into
    deterministic pseudo-features — format-agnostic, the oracle/test
    kernel.  ``kernel="codec"`` REALLY decodes (stdlib PNG/WAV,
    :mod:`.media_codecs`); payloads neither codec recognizes follow
    ``on_error``: ``"raise"`` fails the job (data-quality posture),
    ``"null"`` emits a NULL feature row so one bad object out of
    billions cannot kill a 100 TB pass (filter nulls downstream)."""
    if kernel not in ("stub", "codec"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error {on_error!r}")
    schema = f"{id_col} bigint, features array<double>"
    if batch_note_col:
        schema += f", {batch_note_col} int"
    use_codec = kernel == "codec"
    null_ok = on_error == "null"

    def one(p: bytes | None) -> list[float] | None:
        if not use_codec:
            return _stub_features(p)
        try:
            feats = _codec_features(p)
        except Exception as exc:
            if null_ok:
                return None
            raise ValueError(f"undecodable payload: {exc}") from exc
        if feats is None and not null_ok:
            raise ValueError("payload is neither PNG nor WAV")
        return feats

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [one(p) for p in pdf[payload_col]],
                }
            )
            if batch_note_col:
                out[batch_note_col] = len(pdf)
            yield out

    media = ensure_min_parallelism(media.select(id_col, payload_col))
    return media.mapInPandas(kern, schema)


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


def resize_images(media: DataFrame, max_w: int = 224, max_h: int = 224,
                  method: str = "area") -> DataFrame:
    """EXECUTE the :func:`resize_plan` with the real PNG codec:
    decode → aspect-preserving resample (box mean by default) →
    re-encode, producing (media_id, payload, width, height, resized).

    The 100 TB shape is the plan/execute split: target dims come from
    the metadata-only :func:`resize_plan` (JVM arithmetic, zero bytes
    touched), the plan joins back to payloads on media_id, and ONLY
    rows marked ``needs_resize`` enter the Python decode kernel —
    already-small images pass through byte-identical without ever
    being decoded.  The join is a self-join on the media table's key
    (co-partitioned input makes it shuffle-free in a real deployment;
    at worst it is one hash shuffle on media_id)."""
    plan = resize_plan(media, max_w, max_h)
    joined = media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).join(plan.select("media_id", "src_w", "src_h", "dst_w", "dst_h",
                       "needs_resize"),
           "media_id")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import media_codecs as mc

        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p, sw, sh, w, h, need in zip(
                    pdf["payload"], pdf["src_w"], pdf["src_h"],
                    pdf["dst_w"], pdf["dst_h"], pdf["needs_resize"]):
                if not need:
                    # metadata says it already fits: bytes pass through
                    # untouched, dims come from the plan — no decode
                    payloads.append(p)
                    heights.append(int(sh))
                    widths.append(int(sw))
                else:
                    px = mc.resize_image(mc.decode_png(p), int(w), int(h),
                                         method=method)
                    payloads.append(mc.encode_png(px))
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "resized": pdf["needs_resize"],
                }
            )

    return ensure_min_parallelism(joined).mapInPandas(
        kern,
        "media_id bigint, payload binary, width int, height int, "
        "resized boolean",
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


def synth_codec_media_table(df: DataFrame, id_col: str = "doc_id",
                            max_px: int = 48) -> DataFrame:
    """A media table whose payloads are REAL bytes the stdlib codecs
    decode: even ids carry an RGB PNG (dims and pixels seeded by the
    id), odd ids a PCM-16 WAV (seeded sine + noise).  Generated
    executor-side via mapInPandas — no driver loop, deterministic
    per id regardless of partitioning — so tests and benches can
    exercise the ``kernel="codec"`` path end to end at any SF."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import media_codecs as mc

        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                rng = np.random.RandomState(mid % (2**31 - 1))
                if mid % 2 == 0:
                    w = mid % max_px + 8
                    h = mid % (max_px - 11) + 8
                    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                    rows.append(
                        (mid, "image", mc.encode_png(px),
                         {"width": w, "height": h, "sample_rate": None,
                          "duration_ms": None, "codec": "png"}))
                else:
                    rate = 8000
                    n = mid % 1600 + 160
                    t = np.arange(n) / rate
                    freq = 100.0 + mid % 900
                    x = (0.5 * np.sin(2 * np.pi * freq * t)
                         + 0.1 * rng.standard_normal(n))
                    s = np.clip(x * 32767, -32768, 32767).astype(np.int16)
                    rows.append(
                        (mid, "audio", mc.encode_wav(s, rate),
                         {"width": None, "height": None,
                          "sample_rate": rate,
                          "duration_ms": int(1000 * n / rate),
                          "codec": "pcm16"}))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"])

    return ensure_min_parallelism(df.select(id_col)).mapInPandas(
        gen, MEDIA_SCHEMA)


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
