"""MinHashIndex: incremental batch-vs-corpus near-dup detection.

Gates: (1) probing a batch against the index finds exactly the pairs the
one-shot pipeline (:func:`dedup.minhash_lsh_dedup_pairs`) finds on
corpus+batch - the index is an incremental refactoring, not a different
algorithm; (2) save/load round-trips results and parameters; (3)
add_batch makes accepted rows visible to later batches; (4) the probe
plan broadcasts the batch side (the corpus band table never shuffles).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark.catalog import Catalog
from kafka_cassandra_plugin_spark.operators import dedup as D
from kafka_cassandra_plugin_spark.operators.dedup_index import MinHashIndex


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return Catalog(spark, sf_dir).documents.select("doc_id", "text")


@pytest.fixture(scope="module")
def corpus(docs):
    return docs.filter(F.col("doc_id") % 2 == 0)


@pytest.fixture(scope="module")
def batch(spark, docs):
    """New batch: exact dups of some corpus docs (+1M ids), some
    corpus-odd docs (not indexed - near-dup only of themselves), and
    synthetic novel docs."""
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(2_000_000 + i,
          f"zq{i} xv{i} kk{i} jj{i} ww{i} qq{i} ptk{i} mrg{i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    return dups.unionByName(novel)


@pytest.fixture(scope="module")
def index(corpus):
    return MinHashIndex.build(corpus)


class TestMatchBatch:
    def test_equivalent_to_one_shot_pipeline(self, corpus, batch, index):
        incremental = {
            (r.corpus_id, r.new_id)
            for r in index.match_batch(batch).collect()
        }
        batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
        one_shot = {
            (r.id_a, r.id_b)
            for r in D.minhash_lsh_dedup_pairs(
                corpus.unionByName(batch)
            ).collect()
            if (r.id_a in batch_ids) != (r.id_b in batch_ids)
        }
        # one-shot pairs are (min, max) = (corpus, batch) because batch
        # ids start at 1M
        assert incremental == one_shot

    def test_planted_dups_matched_at_one(self, batch, index):
        matched = index.match_batch(batch)
        planted = {
            r.doc_id for r in batch.filter(F.col("doc_id") < 2_000_000).collect()
        }
        # every planted dup links back to its source doc at jaccard 1.0
        # (it may ALSO near-match other corpus docs below 1.0 - fine)
        exact_links = {
            r.new_id
            for r in matched.filter(F.col("jaccard") == 1.0).collect()
            if r.corpus_id == r.new_id - 1_000_000
        }
        assert planted <= exact_links

    def test_novel_docs_unmatched(self, batch, index):
        matched = index.match_batch(batch)
        assert matched.filter(F.col("new_id") >= 2_000_000).count() == 0

    def test_probe_broadcasts_batch_side(self, batch, index):
        from kafka_cassandra_plugin_spark import plans as P

        plan = P.formatted_plan(index.match_batch(batch))
        assert "BroadcastHashJoin" in plan

    def test_broadcast_guard_fallback_same_results(self, batch, index):
        """max_broadcast_rows=0 forces the shuffle-join fallback; links
        must be identical to the broadcast path."""
        bcast = {(r.corpus_id, r.new_id, r.jaccard)
                 for r in index.match_batch(batch).collect()}
        shuffle = {(r.corpus_id, r.new_id, r.jaccard)
                   for r in index.match_batch(
                       batch, max_broadcast_rows=0).collect()}
        assert bcast == shuffle and len(bcast) > 0

    def test_broadcast_guard_plan_shapes(self, spark, batch, index):
        """With auto-broadcast disabled, the guarded-off path must not
        broadcast (no hint is planted), while the default path still
        broadcast-joins via the explicit hint."""
        from kafka_cassandra_plugin_spark import plans as P

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            off = P.formatted_plan(index.match_batch(batch, max_broadcast_rows=0))
            on = P.formatted_plan(index.match_batch(batch))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" not in off
        assert "BroadcastHashJoin" in on

    def test_readded_id_changed_text_keeps_max_jaccard(self, spark, corpus,
                                                       tmp_path_factory):
        """An id re-added with different text leaves two index rows; the
        surviving link similarity is the deterministic max."""
        path = str(tmp_path_factory.mktemp("mhidx_readd"))
        seed = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        idx = MinHashIndex.build(seed).save(path)
        # re-add id 1 with changed (but overlapping) text: duplicate
        # index rows for the same id, different shingle sets
        idx = idx.add_batch(spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta CHANGED")],
            "doc_id long, text string",
        ))
        probe = spark.createDataFrame(
            [(99, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        # threshold=0.1 against the stored default 16x4 banding is the
        # low-recall-geometry warning path - assert the warning instead
        # of leaking it, so the suite runs warning-clean (-W error ok)
        with pytest.warns(UserWarning, match="MinHash banding"):
            links = idx.match_batch(probe, threshold=0.1).collect()
        assert len(links) == 1
        # probe matches the ORIGINAL text exactly -> max survives at 1.0
        assert links[0].jaccard == 1.0

    def test_dedup_batch_keeps_novel_drops_dups(self, batch, index):
        kept = {r.doc_id for r in index.dedup_batch(batch).collect()}
        novel = {r.doc_id for r in batch.filter(F.col("doc_id") >= 2_000_000).collect()}
        planted = {r.doc_id for r in batch.filter(F.col("doc_id") < 2_000_000).collect()}
        assert novel <= kept
        assert not (planted & kept)


class TestPersistence:
    def test_roundtrip_same_results_and_params(self, batch, index, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("mhidx"))
        loaded = index.save(path)
        assert loaded.params == index.params
        mem = {(r.corpus_id, r.new_id, r.jaccard)
               for r in index.match_batch(batch).collect()}
        disk = {(r.corpus_id, r.new_id, r.jaccard)
                for r in loaded.match_batch(batch).collect()}
        assert mem == disk

    def test_band_partitioned_layout(self, index, tmp_path_factory):
        import os
        path = str(tmp_path_factory.mktemp("mhidx_layout"))
        index.save(path)
        # round-13 layout: batch=<id>/band=<b> - save() consolidates
        # into the COMPACT_BATCH (-1) partition
        base = f"{path}/bands/batch=-1"
        parts = {d for d in os.listdir(base) if d.startswith("band=")}
        assert len(parts) == index.params["bands"]

    def test_add_batch_visible_to_next_batch(self, spark, batch, index,
                                             tmp_path_factory):
        path = str(tmp_path_factory.mktemp("mhidx_add"))
        loaded = index.save(path)
        accepted = loaded.dedup_batch(batch)
        loaded = loaded.add_batch(accepted)
        # a second batch duplicating an accepted novel doc now matches it
        dup_of_novel = accepted.filter(F.col("doc_id") >= 2_000_000).select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
        )
        n_novel = dup_of_novel.count()
        assert n_novel > 0
        matched = loaded.match_batch(dup_of_novel)
        assert matched.filter(F.col("corpus_id") >= 2_000_000).count() >= n_novel

    def test_in_memory_add_batch_refused(self, index, batch):
        with pytest.raises(ValueError):
            index.add_batch(batch)

    def test_compact_same_results_bounded_files(self, spark, batch, index,
                                                tmp_path_factory):
        """After K appends + compact: match_batch output identical, and
        each band partition holds a bounded file count (appends pile up
        one+ file per batch; compaction collapses them)."""
        import os

        path = str(tmp_path_factory.mktemp("mhidx_compact"))
        loaded = index.save(path)
        # K=3 small appends -> >=4 files per band partition
        for i in range(3):
            add = batch.filter(F.col("doc_id") >= 2_000_000).select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text",
            )
            loaded = loaded.add_batch(add)

        def files_per_band():
            # (batch_dir, band_dir) -> parquet file count, across all
            # batch partitions of the round-13 layout
            out = {}
            for bd in os.listdir(f"{path}/bands"):
                if not bd.startswith("batch="):
                    continue
                for d in os.listdir(f"{path}/bands/{bd}"):
                    if d.startswith("band="):
                        out[(bd, d)] = len(
                            [f for f in os.listdir(f"{path}/bands/{bd}/{d}")
                             if f.endswith(".parquet")])
            return out

        before_links = {(r.corpus_id, r.new_id, r.jaccard)
                        for r in loaded.match_batch(batch).collect()}
        # 1 save + 3 appends = 4 batch partitions before compaction
        assert len({bd for bd, _ in files_per_band()}) == 4
        compacted = loaded.compact()
        after = files_per_band()
        assert {bd for bd, _ in after} == {"batch=-1"}
        assert max(after.values()) <= 2
        assert len(after) == index.params["bands"]
        after_links = {(r.corpus_id, r.new_id, r.jaccard)
                       for r in compacted.match_batch(batch).collect()}
        assert after_links == before_links and len(after_links) > 0

    def test_compact_in_memory_refused(self, index):
        with pytest.raises(ValueError):
            index.compact()


class TestExactlyOnceLayout:
    """Round-13 batch-partitioned layout: overwrite-per-batch appends
    (a replayed add_batch duplicates nothing), as-of-predecessors
    probes via load(exclude_batch=), from-scratch init, and the tiered
    compaction path."""

    def _rows(self, df):
        return sorted(map(tuple, df.collect()))

    def test_replayed_add_batch_duplicates_nothing(self, spark, batch,
                                                   index, tmp_path):
        path = str(tmp_path / "idx")
        loaded = index.save(path)
        add = batch.filter(F.col("doc_id") >= 2_000_000)
        loaded.add_batch(add, batch_id=7, reload=False)
        once = self._rows(MinHashIndex.load(spark, path).bands)
        # at-least-once replay: same batch id lands again
        MinHashIndex.load(spark, path).add_batch(add, batch_id=7,
                                                 reload=False)
        twice = self._rows(MinHashIndex.load(spark, path).bands)
        assert twice == once
        sh = self._rows(
            MinHashIndex.load(spark, path).shingles.select("id"))
        assert len(sh) == len(set(sh))

    def test_exclude_batch_hides_partition(self, spark, batch, index,
                                           tmp_path):
        path = str(tmp_path / "idx")
        loaded = index.save(path)
        add = batch.filter(F.col("doc_id") >= 2_000_000)
        loaded.add_batch(add, batch_id=3, reload=False)
        n_add = add.count()
        full = MinHashIndex.load(spark, path)
        hidden = MinHashIndex.load(spark, path, exclude_batch=3)
        assert (full.shingles.count() - hidden.shingles.count()) == n_add
        # a replayed batch probing with its own id excluded sees the
        # corpus exactly as its predecessors left it
        base = self._rows(index.shingles.select("id"))
        assert self._rows(hidden.shingles.select("id")) == base

    def test_init_empty_then_probe_and_grow(self, spark, batch, tmp_path):
        path = str(tmp_path / "idx")
        idx = MinHashIndex.init(spark, path, n=3, num_hashes=16, bands=8)
        assert idx.params["num_hashes"] == 16
        # probing an empty index matches nothing and raises nothing
        assert idx.match_batch(batch).count() == 0
        add = batch.filter(F.col("doc_id") >= 2_000_000)
        idx = idx.add_batch(add, batch_id=0)
        dup = add.select((F.col("doc_id") + 9_000_000).alias("doc_id"),
                         "text")
        matched = idx.match_batch(dup)
        assert matched.count() >= add.count()

    def test_auto_batch_id_assignment(self, spark, batch, index, tmp_path):
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        path = str(tmp_path / "idx")
        loaded = index.save(path)
        add = batch.filter(F.col("doc_id") >= 2_000_000)
        loaded = loaded.add_batch(add)   # auto: 0
        loaded.add_batch(add.select((F.col("doc_id") + 1).alias("doc_id"),
                                    "text"))  # auto: 1
        ids = list_batch_ids(spark, f"{path}/bands")
        assert ids == [-1, 0, 1]

    def test_compact_tiered_lossless_and_fallback(self, spark, batch,
                                                  index, tmp_path):
        path = str(tmp_path / "idx")
        loaded = index.save(path)
        for i in range(3):
            add = batch.filter(F.col("doc_id") >= 2_000_000).select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text")
            loaded.add_batch(add, batch_id=i, reload=False)
        before = {(r.corpus_id, r.new_id, r.jaccard)
                  for r in MinHashIndex.load(spark, path)
                  .match_batch(batch).collect()}
        tiered = MinHashIndex.load(spark, path).compact_tiered()
        after = {(r.corpus_id, r.new_id, r.jaccard)
                 for r in tiered.match_batch(batch).collect()}
        assert after == before and len(after) > 0
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids
        ids = list_batch_ids(spark, f"{path}/bands")
        assert all(i < 0 for i in ids) and len(ids) == 2  # -1 save + level
        # max_levels=1 already exceeded -> fallback to the full merge
        MinHashIndex.load(spark, path).add_batch(
            batch.filter(F.col("doc_id") >= 2_000_000).select(
                (F.col("doc_id") + 77_000_000).alias("doc_id"), "text"),
            batch_id=9, reload=False)
        full = MinHashIndex.load(spark, path).compact_tiered(max_levels=1)
        ids = list_batch_ids(spark, f"{path}/bands")
        assert ids == [-1]
        again = {(r.corpus_id, r.new_id, r.jaccard)
                 for r in full.match_batch(batch).collect()}
        # batch 9 added 77M-shifted copies of the novel docs, so the
        # full merge legitimately adds those links; everything else is
        # byte-identical to the pre-compaction link set
        assert {l for l in again if l[0] < 77_000_000} == before
        assert len(again) > len(before)
