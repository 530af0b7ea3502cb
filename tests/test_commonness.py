"""D35 CommonnessIndex: incremental SoftDedup state.

Gates the full replay-discipline standard every disk-backed model in
this repo meets (bloom/LM/bm25/fingerprint/word-histogram):
accumulate == one-shot on the union, replay overwrites (never double
counts), load(exclude_batch) as-of, compact (plain, excluded,
doubled) lossless with bounded partitions, save-path hygiene, plus
the weights() semantics (never-seen keeps full weight; hash-family
agreement; broadcast-only plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.operators.commonness import CommonnessIndex
from kafka_cassandra_plugin_spark.operators.dedup import soft_dedup_weights


@pytest.fixture(scope="module")
def batches(spark, sf_dir):
    from kafka_cassandra_plugin_spark.catalog import Catalog

    d = Catalog(spark, sf_dir).documents.select("doc_id", "text").limit(300)
    d = d.localCheckpoint()
    b0 = d.filter(F.col("doc_id") % 3 == 0)
    b1 = d.filter(F.col("doc_id") % 3 == 1)
    # b2 re-accepts copies of some b0 content under new ids - the
    # cross-batch duplication the index exists to price
    b2 = d.filter(F.col("doc_id") % 3 == 2).unionByName(
        b0.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return b0, b1, b2


def _wmap(idx, docs):
    return {r.doc_id: (r.commonness, round(r.weight, 9))
            for r in idx.weights(docs).collect()}


class TestCommonnessIndex:
    def test_accumulate_equals_one_shot(self, spark, batches, tmp_path):
        b0, b1, b2 = batches
        idx = CommonnessIndex.init(spark, str(tmp_path / "ci"))
        for i, b in enumerate((b0, b1, b2)):
            idx = idx.append_batch(b, i)
        union = b0.unionByName(b1).unionByName(b2)
        got = _wmap(idx, union)
        want = {r.doc_id: (r.commonness, round(r.weight, 9))
                for r in soft_dedup_weights(union).collect()}
        assert got == want

    def test_replay_overwrites_not_double_counts(self, spark, batches,
                                                 tmp_path):
        b0, b1, _ = batches
        idx = CommonnessIndex.init(spark, str(tmp_path / "ci"))
        idx = idx.append_batch(b0, 0)
        idx = idx.append_batch(b1, 1)
        idx = idx.append_batch(b1, 1)  # replayed attempt
        union = b0.unionByName(b1)
        assert _wmap(idx, union) == {
            r.doc_id: (r.commonness, round(r.weight, 9))
            for r in soft_dedup_weights(union).collect()}

    def test_exclude_batch_is_as_of(self, spark, batches, tmp_path):
        b0, b1, b2 = batches
        path = str(tmp_path / "ci")
        idx = CommonnessIndex.init(spark, path)
        for i, b in enumerate((b0, b1, b2)):
            idx = idx.append_batch(b, i)
        asof = CommonnessIndex.load(spark, path, exclude_batch=2)
        union01 = b0.unionByName(b1)
        assert _wmap(asof, union01) == {
            r.doc_id: (r.commonness, round(r.weight, 9))
            for r in soft_dedup_weights(union01).collect()}

    def test_compact_lossless_and_keeps_inflight_hideable(
            self, spark, batches, tmp_path):
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        b0, b1, b2 = batches
        path = str(tmp_path / "ci")
        idx = CommonnessIndex.init(spark, path)
        idx = idx.append_batch(b0, 0)
        idx = idx.append_batch(b1, 1)
        before = {r.fp: r["count"] for r in idx.table().collect()}
        idx = idx.append_batch(b2, 2)          # in-flight attempt
        idx = idx.compact(exclude_batch=2)     # fold committed history
        ids = list_batch_ids(spark, f"{path}/counts")
        assert set(ids) == {-1, 2}
        # replay-exclusion still hides the in-flight batch post-compact
        asof = CommonnessIndex.load(spark, path, exclude_batch=2)
        assert {r.fp: r["count"] for r in asof.table().collect()} == before
        # and the full view includes it
        full = {r.fp: r["count"] for r in idx.table().collect()}
        union = b0.unionByName(b1).unionByName(b2)
        assert sum(full.values()) == union.count()
        # double compact is lossless
        again = idx.compact()
        assert {r.fp: r["count"] for r in again.table().collect()} == full

    def test_never_seen_keeps_full_weight(self, spark, batches, tmp_path):
        b0, _, _ = batches
        idx = CommonnessIndex.init(spark, str(tmp_path / "ci"))
        idx = idx.append_batch(b0, 0)
        probe = spark.createDataFrame(
            [(99, "entirely novel content never accepted")],
            "doc_id int, text string",
        )
        got = _wmap(idx, probe)[99]
        assert got == (0, 1.0)

    def test_md5_matches_xxhash64(self, spark, batches, tmp_path):
        b0, b1, _ = batches
        a = CommonnessIndex.init(spark, str(tmp_path / "a"))
        b = CommonnessIndex.init(spark, str(tmp_path / "b"), hash_fn="md5")
        for i, batch in enumerate((b0, b1)):
            a = a.append_batch(batch, i)
            b = b.append_batch(batch, i)
        union = b0.unionByName(b1)
        assert _wmap(a, union) == _wmap(b, union)

    def test_normalize_convention_pinned_in_meta(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(1, "The cat"), (2, "the  CAT ")],
            "doc_id int, text string",
        )
        norm = CommonnessIndex.init(spark, str(tmp_path / "n"))
        norm = norm.append_batch(docs, 0)
        assert _wmap(norm, docs)[1][0] == 2  # reflow+case folded
        raw = CommonnessIndex.init(spark, str(tmp_path / "r"),
                                   normalize=False)
        raw = raw.append_batch(docs, 0)
        assert _wmap(raw, docs)[1][0] == 1
        # the flag survives persistence: a bare load re-reads meta
        again = CommonnessIndex.load(spark, str(tmp_path / "r"))
        assert _wmap(again, docs)[1][0] == 1

    def test_null_text_agrees_across_hash_families_and_paths(
            self, spark, tmp_path):
        """NULL text hashes to the NUL-byte sentinel under BOTH hash
        families, so (a) md5 == xxhash64 weights and (b) the
        accumulate (join) path == the one-shot (window) path — the
        round-9 ADVICE bug was md5 mapping NULL to NULL (join never
        matches) while xxhash64 mapped it to the seed hash (does
        match)."""
        docs = spark.createDataFrame(
            [(1, None), (2, None), (3, "real text")],
            "doc_id int, text string",
        )
        a = CommonnessIndex.init(spark, str(tmp_path / "a"))
        b = CommonnessIndex.init(spark, str(tmp_path / "b"), hash_fn="md5")
        a = a.append_batch(docs, 0)
        b = b.append_batch(docs, 0)
        got_a, got_b = _wmap(a, docs), _wmap(b, docs)
        assert got_a == got_b
        # the two NULL docs form one duplicate cluster
        assert got_a[1] == (2, 0.5) and got_a[2] == (2, 0.5)
        assert got_a[3] == (1, 1.0)
        # and the join path agrees with the one-shot window path
        want = {r.doc_id: (r.commonness, round(r.weight, 9))
                for r in soft_dedup_weights(docs).collect()}
        assert got_a == want

    def test_load_rolls_forward_interrupted_compact(self, spark, batches,
                                                    tmp_path):
        """Crash window: compact() writes the counts__compacting
        sibling fully, then deletes counts/, then renames.  A crash
        between delete and rename must leave the index loadable —
        load() completes the rename (roll-forward), losslessly."""
        from kafka_cassandra_plugin_spark.fsutil import delete_dir

        b0, b1, _ = batches
        path = str(tmp_path / "ci")
        idx = CommonnessIndex.init(spark, path)
        idx = idx.append_batch(b0, 0)
        idx = idx.append_batch(b1, 1)
        before = {r.fp: r["count"] for r in idx.table().collect()}
        # simulate compact() dying right after delete_dir(src): the
        # sibling is complete, counts/ is gone
        consolidated = CommonnessIndex.load(spark, path)
        tmp = f"{path}/counts__compacting"
        consolidated.table().write.mode("overwrite").parquet(
            f"{tmp}/batch={CommonnessIndex.COMPACT_BATCH}")
        delete_dir(spark, f"{path}/counts")
        recovered = CommonnessIndex.load(spark, path)
        assert {r.fp: r["count"]
                for r in recovered.table().collect()} == before
        # idempotent: a second load sees the renamed-in-place counts/
        again = CommonnessIndex.load(spark, path)
        assert {r.fp: r["count"] for r in again.table().collect()} == before

    def test_load_requires_init(self, spark, tmp_path):
        with pytest.raises(ValueError, match="init"):
            CommonnessIndex.load(spark, str(tmp_path / "missing"))

    def test_negative_batch_id_rejected(self, spark, batches, tmp_path):
        b0, _, _ = batches
        idx = CommonnessIndex.init(spark, str(tmp_path / "ci"))
        with pytest.raises(ValueError, match="batch_id"):
            idx.append_batch(b0, -1)

    def test_weights_plan_is_broadcast_only(self, spark, batches,
                                            tmp_path):
        b0, b1, _ = batches
        idx = CommonnessIndex.init(spark, str(tmp_path / "ci"))
        idx = idx.append_batch(b0, 0)
        idx = idx.append_batch(b1, 1)
        plan = idx.weights(
            b1.localCheckpoint()
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
        # the batch-bounded claim rests on Catalyst pushing the
        # LeftSemi BELOW the consolidating sum (PushDownLeftSemi...):
        # the semi must filter the raw counts BEFORE the partial
        # aggregate, so only batch-relevant rows ever shuffle.  In the
        # printed tree children sit below parents, so the LeftSemi
        # line must come after the partial_sum line.
        lines = plan.splitlines()
        part = next(i for i, l in enumerate(lines) if "partial_sum" in l)
        semi = next(i for i, l in enumerate(lines) if "LeftSemi" in l)
        assert semi > part, (
            "LeftSemi no longer pushed below the consolidating "
            "aggregate - weights() would shuffle the full history"
        )
