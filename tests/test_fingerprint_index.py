"""D26 FingerprintIndex: persisted cross-run MOSS probing.

Gates (the D18/D19/D22 incremental-store standard): probe equivalence
with the in-frame overlap on the union corpus; accumulate ==
whole-build; replay overwrites not double-counts; load(exclude_batch)
as-of view; compact keeps the in-flight batch hideable; save-onto-own-
path lossless; fpbucket reaches PartitionFilters + planted-corrupt-file
proof of file-level pruning; broadcast probe plan; guards.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.fingerprint import (
    fingerprint_overlap,
    winnow_fingerprints,
)
from kafka_cassandra_plugin_spark.operators.fingerprint_index import (
    FingerprintIndex,
)

VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen",
         "ibis", "jay"]


def _synth(doc_id: int, n: int) -> tuple[int, str]:
    toks = [VOCAB[int(hashlib.md5(f"{doc_id}:{i}".encode())
                      .hexdigest()[:4], 16) % len(VOCAB)]
            for i in range(n)]
    return doc_id, " ".join(toks)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [_synth(d, 20 + (d * 3) % 25) for d in range(1, 21)]
    return _docs(spark, rows)


@pytest.fixture(scope="module")
def batch(spark, corpus):
    """Probe batch: two verbatim partial copies of corpus docs plus two
    fresh docs (ids disjoint from the corpus)."""
    rows = [r for r in corpus.collect() if r.doc_id in (3, 7)]
    out = [(100 + r.doc_id,
            " ".join(r.text.split()[:18]) + f" zz{r.doc_id}")
           for r in rows]
    out += [_synth(900, 25), _synth(901, 3)]
    return _docs(spark, out)


class TestProbe:
    def test_match_equals_inframe_overlap(self, spark, corpus, batch,
                                          tmp_path):
        """match_batch against the saved index == fingerprint_overlap
        over the UNION frame, restricted to (corpus, batch) pairs -
        winnowing is per-document, so the split computation must be
        exact, not approximate."""
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=16)
        got = {
            (r.batch_id, r.corpus_id, r.shared, r.n_batch, r.n_corpus,
             round(r.overlap, 9))
            for r in idx.match_batch(batch).collect()
        }
        union = corpus.unionByName(batch)
        fps = winnow_fingerprints(union, k=3, w=4)
        corpus_ids = {r.doc_id for r in corpus.collect()}
        exp = set()
        for r in fingerprint_overlap(fps).collect():
            a, b = r.id_a, r.id_b
            if a in corpus_ids and b not in corpus_ids:
                exp.add((b, a, r.shared, r.n_b, r.n_a,
                         round(r.overlap, 9)))
            elif b in corpus_ids and a not in corpus_ids:
                exp.add((a, b, r.shared, r.n_a, r.n_b,
                         round(r.overlap, 9)))
        assert got == exp and got  # non-empty: the copies must collide

    def test_threshold_keeps_only_copies(self, spark, corpus, batch,
                                         tmp_path):
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=16)
        hits = idx.match_batch(batch, threshold=0.6).collect()
        assert {(r.batch_id, r.corpus_id) for r in hits} == \
            {(103, 3), (107, 7)}

    def test_shuffle_probe_same_results(self, spark, corpus, batch,
                                        tmp_path):
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=16)
        a = {(r.batch_id, r.corpus_id, r.shared)
             for r in idx.match_batch(batch).collect()}
        b = {(r.batch_id, r.corpus_id, r.shared)
             for r in idx.match_batch(batch,
                                      broadcast_batch=False).collect()}
        assert a == b

    def test_max_fp_docs_governor(self, spark, tmp_path):
        header = "alpha beta gamma delta epsilon zeta eta"
        rows = [(d, header + " " + _synth(d, 15)[1]) for d in range(10)]
        idx = FingerprintIndex.build(_docs(spark, rows), k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=16)
        probe = _docs(spark, [(500, header + " " + _synth(500, 15)[1])])
        free = idx.match_batch(probe)
        governed = idx.match_batch(probe, max_fp_docs=5)
        assert free.count() == 10  # header fps pair the probe with all
        assert governed.filter(F.col("overlap") >= 0.5).count() == 0


class TestIncrementalMaintenance:
    def _probe_set(self, idx, batch):
        return {(r.batch_id, r.corpus_id, r.shared, round(r.overlap, 9))
                for r in idx.match_batch(batch).collect()}

    def _eq(self, a, b):
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_accumulate_equals_whole_build(self, spark, corpus, batch,
                                           tmp_path):
        whole = FingerprintIndex.build(corpus, k=3, w=4)
        inc = FingerprintIndex.init(spark, str(tmp_path / "fpi"), k=3,
                                    w=4, bucket_partitions=16)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") <= 10), 0)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") > 10), 1)
        self._eq(inc.fps.select("doc_id", "fp"),
                 whole.fps.select("doc_id", "fp"))
        self._eq(inc.sizes, whole.sizes)
        saved_whole = whole.save(str(tmp_path / "w"),
                                 bucket_partitions=16)
        assert self._probe_set(inc, batch) == \
            self._probe_set(saved_whole, batch)

    def test_replay_overwrites_not_doublecounts(self, spark, corpus,
                                                batch, tmp_path):
        b0 = corpus.filter(F.col("doc_id") <= 10)
        idx = FingerprintIndex.init(spark, str(tmp_path / "fpi"), k=3,
                                    w=4, bucket_partitions=16)
        once = idx.append_batch(b0, 0)
        before = self._probe_set(once, batch)
        rows_before = sorted(map(tuple, once.fps.collect()))
        again = once.append_batch(b0, 0)  # foreachBatch replay
        assert self._probe_set(again, batch) == before
        assert sorted(map(tuple, again.fps.collect())) == rows_before

    def test_exclude_batch_hides_inflight(self, spark, corpus, batch,
                                          tmp_path):
        path = str(tmp_path / "fpi")
        idx = FingerprintIndex.init(spark, path, k=3, w=4,
                                    bucket_partitions=16)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") <= 10), 0)
        idx.append_batch(corpus.filter(F.col("doc_id") > 10), 1)
        asof = FingerprintIndex.load(spark, path, exclude_batch=1)
        committed = FingerprintIndex.init(
            spark, str(tmp_path / "ctl"), k=3, w=4, bucket_partitions=16
        ).append_batch(corpus.filter(F.col("doc_id") <= 10), 0)
        self._eq(asof.fps.select("doc_id", "fp"),
                 committed.fps.select("doc_id", "fp"))
        assert self._probe_set(asof, batch) == \
            self._probe_set(committed, batch)

    def test_compact_exclude_batch_stays_hideable(self, spark, corpus,
                                                  batch, tmp_path):
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        path = str(tmp_path / "fpi")
        idx = FingerprintIndex.init(spark, path, k=3, w=4,
                                    bucket_partitions=16)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") <= 7), 0)
        idx = idx.append_batch(
            corpus.filter((F.col("doc_id") > 7)
                          & (F.col("doc_id") <= 14)), 1)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") > 14), 2)
        before = self._probe_set(
            FingerprintIndex.load(spark, path, exclude_batch=2), batch)
        idx.compact(exclude_batch=2)
        for table in ("fps", "sizes"):
            assert list_batch_ids(spark, f"{path}/{table}") == [-1, 2]
        after = self._probe_set(
            FingerprintIndex.load(spark, path, exclude_batch=2), batch)
        assert after == before
        full = FingerprintIndex.load(spark, path)
        whole = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "w"), bucket_partitions=16)
        assert self._probe_set(full, batch) == \
            self._probe_set(whole, batch)

    def test_save_onto_own_path_lossless(self, spark, corpus, batch,
                                         tmp_path):
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        path = str(tmp_path / "fpi")
        idx = FingerprintIndex.init(spark, path, k=3, w=4,
                                    bucket_partitions=16)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") <= 10), 0)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") > 10), 1)
        before = self._probe_set(idx, batch)
        resaved = FingerprintIndex.load(spark, path).save(
            path, bucket_partitions=16)
        assert self._probe_set(resaved, batch) == before
        for table in ("fps", "sizes"):
            assert list_batch_ids(spark, f"{path}/{table}") == [-1]

    def test_init_empty_probe_empty(self, spark, batch, tmp_path):
        idx = FingerprintIndex.init(spark, str(tmp_path / "fpi"), k=3,
                                    w=4, bucket_partitions=16)
        assert idx.match_batch(batch).count() == 0

    def test_guards(self, spark, corpus, tmp_path):
        mem = FingerprintIndex.build(corpus, k=3, w=4)
        with pytest.raises(ValueError, match="saved index"):
            mem.append_batch(corpus, 0)
        disk = FingerprintIndex.init(spark, str(tmp_path / "fpi"), k=3,
                                     w=4, bucket_partitions=16)
        with pytest.raises(ValueError, match=">= 0"):
            disk.append_batch(corpus, -1)
        with pytest.raises(ValueError, match="geometry"):
            mem.merge(FingerprintIndex.build(corpus, k=4, w=4))
        with pytest.raises(TypeError, match="integral"):
            FingerprintIndex.build(spark.createDataFrame(
                [("a", "x y z")], "doc_id string, text string"))
        with pytest.raises(ValueError, match="meta"):
            FingerprintIndex.load(spark, str(tmp_path / "nothere"))
        with pytest.raises(ValueError, match="hash_fn"):
            FingerprintIndex.init(spark, str(tmp_path / "h"),
                                  hash_fn="sha1")

    def test_merge_equals_whole_build(self, spark, corpus):
        half_a = corpus.filter(F.col("doc_id") <= 10)
        half_b = corpus.filter(F.col("doc_id") > 10)
        merged = FingerprintIndex.build(half_a, k=3, w=4).merge(
            FingerprintIndex.build(half_b, k=3, w=4))
        whole = FingerprintIndex.build(corpus, k=3, w=4)
        self._eq(merged.fps.select("doc_id", "fp"),
                 whole.fps.select("doc_id", "fp"))
        self._eq(merged.sizes, whole.sizes)


class TestFilePruning:
    def test_fpbucket_reaches_partition_filters(self, spark, corpus,
                                                batch, tmp_path):
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=64)
        pf = P.partition_filters(idx.match_batch(batch))
        assert any("fpbucket" in f for f in pf), pf

    def test_wide_probe_skips_pruning(self, spark, corpus, tmp_path):
        """A probe with more distinct fingerprints than buckets would
        touch essentially every bucket (coupon-collector) - the
        governor must skip the collect + isin instead of paying pure
        overhead (measured at sf10, BASELINE.md round 9)."""
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=4)
        pf = P.partition_filters(idx.match_batch(corpus))
        assert not any("fpbucket" in f for f in pf), pf

    def test_untouched_bucket_files_never_opened(self, spark, corpus,
                                                 batch, tmp_path):
        import os

        path = str(tmp_path / "fpi")
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            path, bucket_partitions=64)
        expected = {(r.batch_id, r.corpus_id, r.shared)
                    for r in idx.match_batch(batch).collect()}
        touched = {
            r.b for r in winnow_fingerprints(batch, k=3, w=4).select(
                F.pmod(F.col("fp"), F.lit(64)).alias("b")
            ).distinct().collect()
        }
        planted = 0
        base = f"{path}/fps/batch=-1"
        for d in os.listdir(base):
            if not d.startswith("fpbucket="):
                continue
            if int(d.split("=", 1)[1]) in touched:
                continue
            with open(f"{base}/{d}/zz_corrupt.parquet", "w") as f:
                f.write("not parquet")
            planted += 1
        assert planted > 0
        fresh = FingerprintIndex.load(spark, path)
        got = {(r.batch_id, r.corpus_id, r.shared)
               for r in fresh.match_batch(batch).collect()}
        assert got == expected
        with pytest.raises(Exception):
            fresh.fps.count()  # full scan opens the plants

    def test_probe_broadcasts_no_python(self, spark, corpus, batch,
                                        tmp_path):
        idx = FingerprintIndex.build(corpus, k=3, w=4).save(
            str(tmp_path / "fpi"), bucket_partitions=64)
        plan = P.formatted_plan(idx.match_batch(batch))
        assert "BroadcastHashJoin" in plan
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan
