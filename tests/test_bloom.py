"""D18 Bloom membership filter: the cross-run exact-dedup sketch.

Gates the two sides of the Bloom contract - ZERO false negatives (no
duplicate ever passes ``filter_new``) and a bounded false-positive rate
(the documented recall tax on new keys) - plus exact merge/build
equivalence, geometry validation, persistence, and the plan shapes the
100 TB story depends on (built-in-only build with one shuffle;
broadcast probe under the dense-bound threshold).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators.bloom import (
    BloomIndex,
    bloom_parameters,
)


@pytest.fixture(scope="module")
def seen(spark):
    """5 000 'previously accepted' keys."""
    return spark.range(0, 5_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
    )


@pytest.fixture(scope="module")
def bloom(seen):
    return BloomIndex.build(seen, "doc_id", expected_items=5_000, fpp=0.01)


class TestParameters:
    def test_classic_formulas(self):
        m, k = bloom_parameters(1_000_000, 0.01)
        # -n ln p / ln2^2 for n=1e6, p=0.01 is ~9.585e6 bits, k ~ 7
        assert abs(m - 9_585_059) < 128  # word-rounded
        assert k == 7

    def test_word_aligned_and_positive(self):
        for n, p in [(1, 0.5), (10, 0.001), (10**9, 0.01)]:
            m, k = bloom_parameters(n, p)
            assert m % 64 == 0 and m >= 64 and k >= 1

    def test_lower_fpp_means_more_bits(self):
        m1, _ = bloom_parameters(10_000, 0.1)
        m2, _ = bloom_parameters(10_000, 0.001)
        assert m2 > m1

    def test_arg_guards(self):
        with pytest.raises(ValueError):
            bloom_parameters(0, 0.01)
        with pytest.raises(ValueError):
            bloom_parameters(100, 1.5)


class TestMembership:
    def test_zero_false_negatives(self, bloom, seen):
        """Every inserted key answers maybe - the hard guarantee."""
        got = bloom.might_contain(seen)
        assert got.filter(~F.col("might_contain")).count() == 0
        assert got.count() == 5_000

    def test_false_positive_rate_bounded(self, bloom, spark):
        """Disjoint probe keys: observed fpr within 3x the configured
        1% (binomial slack on 5 000 draws)."""
        fresh = spark.range(100_000, 105_000).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id")
        )
        got = bloom.might_contain(fresh)
        fp = got.filter(F.col("might_contain")).count()
        assert fp / 5_000 <= 0.03

    def test_filter_new_drops_all_seen_keeps_most_new(self, bloom, spark):
        batch = spark.range(4_900, 5_200).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            (F.col("id") * 2).alias("payload"),
        )
        out = bloom.filter_new(batch)
        ids = {r["doc_id"] for r in out.collect()}
        # ids 4900-4999 are inserted: NONE may survive
        assert not any(int(i.split("-")[1]) < 5_000 for i in ids)
        # ids 5000-5199 are new: at least 1-3*fpp survive
        assert len(ids) >= math.floor(200 * 0.97)
        # payload columns ride through the semi join
        assert set(out.columns) == {"doc_id", "payload"}


class TestComposition:
    def test_merge_equals_union_build(self, spark):
        """build(A) ∪ build(B) is bit-for-bit build(A ∪ B)."""
        a = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
        b = spark.range(200, 500).select(F.col("id").cast("string").alias("k"))
        geo = dict(expected_items=1_000, fpp=0.01, seed=7)
        merged = BloomIndex.build(a, "k", **geo).merge(
            BloomIndex.build(b, "k", **geo)
        )
        direct = BloomIndex.build(a.unionByName(b), "k", **geo)
        assert merged.words.exceptAll(direct.words).count() == 0
        assert direct.words.exceptAll(merged.words).count() == 0

    def test_add_sees_old_and_new(self, spark):
        a = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        b = spark.range(100, 200).select(F.col("id").cast("string").alias("k"))
        grown = BloomIndex.build(a, "k", expected_items=500).add(b, "k")
        got = grown.might_contain(a.unionByName(b), "k")
        assert got.filter(~F.col("might_contain")).count() == 0

    def test_geometry_mismatch_raises(self, spark):
        a = spark.range(0, 10).select(F.col("id").cast("string").alias("k"))
        x = BloomIndex.build(a, "k", expected_items=100, fpp=0.01)
        y = BloomIndex.build(a, "k", expected_items=100, fpp=0.01, seed=99)
        with pytest.raises(ValueError, match="geometry mismatch"):
            x.merge(y)

    def test_save_load_probe_identical(self, bloom, seen, spark, tmp_path):
        loaded = bloom.save(str(tmp_path / "bloom"))
        assert (loaded.m, loaded.k, loaded.seed) == (
            bloom.m, bloom.k, bloom.seed,
        )
        mem = bloom.might_contain(seen)
        dsk = loaded.might_contain(seen)
        assert mem.exceptAll(dsk).count() == 0
        assert dsk.exceptAll(mem).count() == 0


class TestStreamingMaintenance:
    def test_compact_exclude_batch_stays_hideable(self, spark, tmp_path):
        """compact(exclude_batch=N) folds committed predecessors into
        batch=-1 but leaves batch=N's partition intact, so a subsequent
        load(exclude_batch=N) still hides exactly N's contribution -
        the invariant a foreachBatch replay's pre-batch compaction
        depends on."""
        path = str(tmp_path / "bloom")
        idx = BloomIndex.init(spark, path, expected_items=1_000)
        a = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        b = spark.range(100, 200).select(F.col("id").cast("string").alias("k"))
        c = spark.range(200, 300).select(F.col("id").cast("string").alias("k"))
        idx = idx.append_batch(a, 0, "k")
        idx = idx.append_batch(b, 1, "k")
        idx = idx.append_batch(c, 2, "k")  # the uncommitted in-flight batch
        idx.compact(exclude_batch=2)

        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        glob = jvm.org.apache.hadoop.fs.Path(f"{path}/words/batch=*")
        names = sorted(
            s.getPath().getName()
            for s in glob.getFileSystem(conf).globStatus(glob)
        )
        assert names == ["batch=-1", "batch=2"]

        # replay view: batch 2's keys invisible, history fully visible
        replay = BloomIndex.load(spark, path, exclude_batch=2)
        assert replay.might_contain(
            a.unionByName(b), "k"
        ).filter(~F.col("might_contain")).count() == 0
        assert replay.might_contain(c, "k").filter(
            F.col("might_contain")
        ).count() <= 3  # fpp-bounded false positives only

        # committed view: everything visible
        full = BloomIndex.load(spark, path)
        assert full.might_contain(
            a.unionByName(b).unionByName(c), "k"
        ).filter(~F.col("might_contain")).count() == 0

    def test_save_onto_stale_path_replaces_history(self, spark, tmp_path):
        """save() to a path already holding batch=N partitions must
        REPLACE them, not merge: the overwrite only targets batch=-1,
        so without the pre-write cleanup a fresh filter saved over a
        previous filter's path would silently OR the stale batches
        into its loaded view (r6 ADVICE)."""
        path = str(tmp_path / "bloom")
        idx = BloomIndex.init(spark, path, expected_items=1_000)
        old = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        idx.append_batch(old, 0, "k")
        fresh_keys = spark.range(500, 550).select(
            F.col("id").cast("string").alias("k")
        )
        loaded = BloomIndex.build(
            fresh_keys, "k", expected_items=1_000
        ).save(path)
        # the stale batch's keys must be gone (fpp-bounded FPs only)
        assert loaded.might_contain(old, "k").filter(
            F.col("might_contain")
        ).count() <= 3
        assert loaded.might_contain(fresh_keys, "k").filter(
            ~F.col("might_contain")
        ).count() == 0

    def test_save_onto_own_path_preserves_membership(self, spark, tmp_path):
        """``BloomIndex.load(p).save(p)``: the loaded word table is a
        LAZY read of the partitions save() replaces - a
        delete-before-write save() would destroy the files its own
        write plan reads (r7 ADVICE medium).  The staged-sibling swap
        makes this a lossless consolidation."""
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        path = str(tmp_path / "bloom")
        idx = BloomIndex.init(spark, path, expected_items=1_000)
        a = spark.range(0, 60).select(F.col("id").cast("string").alias("k"))
        b = spark.range(60, 120).select(F.col("id").cast("string").alias("k"))
        idx = idx.append_batch(a, 0, "k")
        idx.append_batch(b, 1, "k")
        resaved = BloomIndex.load(spark, path).save(path)
        assert resaved.might_contain(
            a.unionByName(b), "k"
        ).filter(~F.col("might_contain")).count() == 0
        assert list_batch_ids(spark, f"{path}/words") == [-1]

    def test_compact_without_exclusion_folds_everything(self, spark, tmp_path):
        path = str(tmp_path / "bloom")
        idx = BloomIndex.init(spark, path, expected_items=1_000)
        a = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
        idx = idx.append_batch(a, 0, "k").compact()
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        glob = jvm.org.apache.hadoop.fs.Path(f"{path}/words/batch=*")
        names = [
            s.getPath().getName()
            for s in glob.getFileSystem(conf).globStatus(glob)
        ]
        assert names == ["batch=-1"]
        assert idx.might_contain(a, "k").filter(
            ~F.col("might_contain")
        ).count() == 0


class TestPlans:
    """The scale shapes: pure built-ins (no Python eval nodes anywhere),
    ONE shuffle to build, broadcast probe under the dense bound and
    shuffle probe above it."""

    def test_build_one_exchange_no_python(self, seen):
        from kafka_cassandra_plugin_spark import plans as P

        plan = P.formatted_plan(
            BloomIndex.build(seen, "doc_id", expected_items=5_000).words
        )
        assert plan.count(") Exchange") == 1
        assert "EvalPython" not in plan

    def test_probe_broadcasts_small_filter(self, bloom, seen):
        from kafka_cassandra_plugin_spark import plans as P

        plan = P.formatted_plan(bloom.might_contain(seen))
        assert "BroadcastHashJoin" in plan
        assert "EvalPython" not in plan

    def test_probe_shuffles_when_filter_too_big(self, bloom, seen):
        from kafka_cassandra_plugin_spark import plans as P

        plan = P.formatted_plan(
            bloom.might_contain(seen, max_broadcast_bytes=0)
        )
        assert "BroadcastHashJoin" not in plan
        assert "ShuffledHashJoin" in plan
