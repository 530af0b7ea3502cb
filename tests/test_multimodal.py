"""Multimodal plumbing tests (G62): schema round-trip through parquet,
Arrow batch shapes in mapInPandas, metadata-only planning ops, stub
decode determinism."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    return M.synth_media_table(docs)


class TestSchema:
    def test_media_schema_shape(self, media):
        assert [f.name for f in media.schema.fields] == [
            "media_id", "kind", "payload", "meta",
        ]
        assert media.schema["payload"].dataType.typeName() == "binary"
        assert media.schema["meta"].dataType.typeName() == "struct"

    def test_parquet_roundtrip(self, spark, media):
        d = tempfile.mkdtemp(prefix="kcp_media_")
        try:
            media.write.mode("overwrite").parquet(f"{d}/media")
            back = spark.read.parquet(f"{d}/media")
            # parquet round-trip relaxes nullability; compare names+types
            assert back.schema.simpleString() == media.schema.simpleString()
            assert back.count() == media.count()
            a = media.select("media_id", F.md5(F.col("payload")).alias("h"))
            b = back.select("media_id", F.md5(F.col("payload")).alias("h"))
            assert a.exceptAll(b).count() == 0
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestDecode:
    def test_features_deterministic_and_total(self, media):
        out = M.decode_features(media)
        assert out.count() == media.count()
        row = out.orderBy("media_id").first()
        again = M.decode_features(media).orderBy("media_id").first()
        assert row.features == again.features
        assert len(row.features) == M.FEATURE_DIM

    def test_arrow_batching_bounded(self, spark, media):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        try:
            out = M.decode_features(media)
            max_batch = out.agg(F.max("_batch_rows")).collect()[0][0]
            assert max_batch <= 64  # memory stays bounded by batch size
        finally:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


class TestMetadataPlans:
    def test_resize_plan_is_metadata_only(self, media):
        plan = M.resize_plan(media, 224, 224)
        rows = plan.collect()
        assert all(r.dst_w <= 224 and r.dst_h <= 224 for r in rows)
        for r in rows:
            if r.needs_resize:
                assert r.dst_w < r.src_w or r.dst_h < r.src_h

    def test_frame_sample_counts(self, media):
        frames = M.frame_sample_plan(media, every_ms=1000)
        joined = (
            frames.groupBy("media_id")
            .count()
            .join(
                media.filter(F.col("kind") == "video").select(
                    "media_id", F.col("meta.duration_ms").alias("dur")
                ),
                "media_id",
            )
        )
        bad = joined.filter(
            F.col("count") != (F.floor((F.col("dur") - 1) / 1000) + 1)
        )
        assert bad.count() == 0

    def test_audio_windows(self, media):
        w = M.audio_window_plan(media, window_ms=500)
        assert w.filter(F.col("n_samples") != 8000).count() == 0  # 16kHz * 0.5s
