"""D22 BM25 retrieval: inverted-index build + top-k search.

Gates: hand-computed BM25 scores exact to the ulp; rank protocol
(round-6 score, doc_id tiebreak); raw and xxhash64 term keys agree;
save/load and document-disjoint merge both reproduce the one-shot
build; collection stats count zero-token docs; plan shapes (no
cartesian, no Python eval, broadcast query side); DuckDB oracle at
sf0.01 under the §2.4 canonical protocol.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_cassandra_plugin_spark import plans as P
from kafka_cassandra_plugin_spark.operators.retrieval import (
    Bm25Index,
    bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(spark, [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat cat cat"),
        (4, "unrelated words entirely"),
    ])


class TestScoring:
    def test_hand_computed_scores_exact(self, spark, corpus):
        """N=4, avgdl=(6+3+3+3)/4=3.75; query 'cat sat' (df=2 each)."""
        q = _queries(spark, [(10, "cat sat")])
        got = {
            r.doc_id: (r.score, r.rank)
            for r in bm25_topk(corpus, q, k=4).collect()
        }

        def idf(df, n=4):
            return math.log(1 + (n - df + 0.5) / (df + 0.5))

        def tfn(tf, dl, k1=1.2, b=0.75, avgdl=3.75):
            return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        exp = {
            1: idf(2) * tfn(1, 6) + idf(2) * tfn(1, 6),  # cat + sat
            2: idf(2) * tfn(1, 3),                        # sat
            3: idf(2) * tfn(3, 3),                        # cat x3
        }
        assert set(got) == set(exp)  # doc 4 matches no term
        for d, s in exp.items():
            assert got[d][0] == pytest.approx(s, abs=1e-12)
        # rank protocol: doc 3 (1.138) > doc 1 (1.113) > doc 2 (0.755)
        assert [got[d][1] for d in (3, 1, 2)] == [1, 2, 3]

    def test_qtf_multiplicity(self, spark, corpus):
        """A term repeated in the query multiplies its contribution."""
        q1 = _queries(spark, [(1, "cat")])
        q2 = _queries(spark, [(1, "cat cat")])
        s1 = bm25_topk(corpus, q1, k=1).collect()[0].score
        s2 = bm25_topk(corpus, q2, k=1).collect()[0].score
        assert s2 == pytest.approx(2 * s1, abs=1e-12)

    def test_lowercase_fold(self, spark, corpus):
        q = _queries(spark, [(1, "CAT Sat")])
        assert bm25_topk(corpus, q, k=4).count() == 3

    def test_k_truncates_with_doc_id_tiebreak(self, spark):
        """Identical docs tie exactly -> doc_id breaks the tie."""
        docs = _docs(spark, [(i, "same text here") for i in range(1, 6)])
        q = _queries(spark, [(1, "same")])
        got = bm25_topk(docs, q, k=3).orderBy("rank").collect()
        assert [r.doc_id for r in got] == [1, 2, 3]

    def test_shuffle_query_path_same_results(self, spark, corpus):
        """broadcast_queries=False (the huge-query-set escape hatch)
        must return identical results through plain shuffle joins."""
        q = _queries(spark, [(10, "cat sat"), (11, "dog")])
        idx = Bm25Index.build(corpus)
        a = {(r.query_id, r.doc_id, round(r.score, 9), r.rank)
             for r in idx.topk(q, k=4).collect()}
        b = {(r.query_id, r.doc_id, round(r.score, 9), r.rank)
             for r in idx.topk(q, k=4, broadcast_queries=False).collect()}
        assert a == b

    def test_max_df_ratio_prunes_stopwords(self, spark, corpus):
        """'the' appears in 2/4 docs (df ratio 0.5): with
        max_df_ratio=0.4 it stops scoring, so only 'mat' (df 0.25)
        contributes and doc 2 (which matched via 'the' alone) drops."""
        q = _queries(spark, [(1, "the mat")])
        idx = Bm25Index.build(corpus)
        full = {r.doc_id for r in idx.topk(q, k=4).collect()}
        pruned = idx.topk(q, k=4, max_df_ratio=0.4)
        got = {r.doc_id for r in pruned.collect()}
        assert full == {1, 2}
        assert got == {1}
        # surviving scores equal the mat-only query exactly
        mat_only = {(r.doc_id, round(r.score, 9))
                    for r in idx.topk(_queries(spark, [(1, "mat")]),
                                      k=4).collect()}
        assert {(r.doc_id, round(r.score, 9))
                for r in pruned.collect()} == mat_only

    def test_raw_and_xxhash_agree(self, spark, corpus):
        q = _queries(spark, [(10, "cat sat"), (11, "dog")])
        a = {(r.query_id, r.doc_id, round(r.score, 9), r.rank)
             for r in bm25_topk(corpus, q, k=4, hash_fn="raw").collect()}
        b = {(r.query_id, r.doc_id, round(r.score, 9), r.rank)
             for r in bm25_topk(corpus, q, k=4).collect()}
        assert a == b


class TestIndexLifecycle:
    def test_save_load_roundtrip(self, spark, corpus, tmp_path):
        q = _queries(spark, [(10, "cat sat")])
        idx = Bm25Index.build(corpus)
        idx.save(str(tmp_path / "bm25"))
        back = Bm25Index.load(spark, str(tmp_path / "bm25"))
        assert back.hash_fn == "xxhash64" and back.lowercase is True
        a = {(r.doc_id, round(r.score, 9)) for r in idx.topk(q).collect()}
        b = {(r.doc_id, round(r.score, 9)) for r in back.topk(q).collect()}
        assert a == b

    def test_merge_equals_whole_build(self, spark, corpus):
        """Document-disjoint halves merge to the one-shot index: same
        df, same stats, same scores (the distributive-counts claim)."""
        half_a = corpus.filter(F.col("doc_id") <= 2)
        half_b = corpus.filter(F.col("doc_id") > 2)
        merged = Bm25Index.build(half_a).merge(Bm25Index.build(half_b))
        whole = Bm25Index.build(corpus)
        q = _queries(spark, [(10, "cat sat the")])
        a = {(r.doc_id, round(r.score, 9), r.rank)
             for r in merged.topk(q, k=4).collect()}
        b = {(r.doc_id, round(r.score, 9), r.rank)
             for r in whole.topk(q, k=4).collect()}
        assert a == b
        sm, sw = merged.stats.first(), whole.stats.first()
        assert sm.n_docs == sw.n_docs
        assert sm.avgdl == pytest.approx(sw.avgdl, abs=1e-12)

    def test_merge_hash_fn_mismatch_raises(self, corpus):
        with pytest.raises(ValueError, match="hash_fn"):
            Bm25Index.build(corpus).merge(
                Bm25Index.build(corpus, hash_fn="raw"))

    def test_zero_token_docs_count_in_stats(self, spark):
        docs = _docs(spark, [(1, "two words"), (2, "   ")])
        st = Bm25Index.build(docs).stats.first()
        assert st.n_docs == 2
        assert st.avgdl == pytest.approx(1.0)  # (2 + 0) / 2


class TestPlans:
    def test_no_cartesian_no_python(self, spark, corpus):
        q = _queries(spark, [(10, "cat sat")])
        plan = P.formatted_plan(bm25_topk(corpus, q, k=4))
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan

    def test_query_side_broadcasts(self, spark, corpus):
        """The postings join against query terms must be broadcast —
        a corpus-wide shuffle there would defeat the whole design."""
        q = _queries(spark, [(10, "cat sat")])
        plan = P.formatted_plan(bm25_topk(corpus, q, k=4))
        assert "BroadcastHashJoin" in plan


class TestOracle:
    def test_bm25_oracle_sf001(self, spark, duck, oracle_sf_dir):
        from kafka_cassandra_plugin_spark import oracle
        from kafka_cassandra_plugin_spark.queries.llm_ops import (
            BM25_TOPK_SQL,
            bm25_search,
        )

        df = bm25_search(spark, oracle_sf_dir)
        n = oracle.compare(df, duck, BM25_TOPK_SQL, "bm25_topk")
        n_queries = duck.execute(
            "SELECT count(*) FROM documents WHERE doc_id % 97 = 3"
        ).fetchone()[0]
        # each query's own document scores (it contains the query
        # verbatim), so every query returns rows
        assert n >= n_queries > 0


class TestMergeLowercaseGuard:
    def test_lowercase_mismatch_raises(self, corpus):
        with pytest.raises(ValueError, match="lowercase"):
            Bm25Index.build(corpus).merge(
                Bm25Index.build(corpus, lowercase=False))


class TestBuildGuards:
    def test_string_doc_id_raises(self, spark):
        """A string-id corpus must fail LOUDLY at build: the pinned
        on-disk schema casts doc_id to long, and a silent cast would
        null every id and collapse all documents into one posting
        group (r8 ADVICE medium)."""
        docs = spark.createDataFrame(
            [("a", "some text"), ("b", "more text")],
            "doc_id string, text string",
        )
        with pytest.raises(TypeError, match="integral"):
            Bm25Index.build(docs)

    def test_int_doc_id_accepted(self, spark):
        docs = spark.createDataFrame([(1, "x y"), (2, "y z")],
                                     "doc_id int, text string")
        assert Bm25Index.build(docs).stats.first().n_docs == 2

    def test_load_without_meta_raises_clear_error(self, spark, tmp_path):
        """A pre-incremental-layout index (no meta dir) must raise a
        message pointing at the format change, not an opaque parquet
        AnalysisException (r8 ADVICE low)."""
        (tmp_path / "oldidx").mkdir()
        with pytest.raises(ValueError, match="meta"):
            Bm25Index.load(spark, str(tmp_path / "oldidx"))


def _batch_names(spark, path: str) -> list[str]:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/batch=*")
    return sorted(
        s.getPath().getName()
        for s in glob.getFileSystem(conf).globStatus(glob) or []
    )


class TestBm25Incremental:
    """The D18/D19 replay discipline applied to the BM25 index: tf, df
    and the collection stats are distributive over document-disjoint
    batches, so batch-partitioned accumulation must be BIT-EXACT
    against the whole-corpus build - no drift tolerance - and the
    overwrite-per-batch layout must keep foreachBatch replays
    exactly-once (r8 VERDICT top item)."""

    def _eq(self, a, b):
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def _tops(self, idx, q, k=6):
        return {(r.query_id, r.doc_id, round(r.score, 9), r.rank)
                for r in idx.topk(q, k=k).collect()}

    def test_accumulate_equals_whole_build(self, spark, corpus, tmp_path):
        """init -> append_batch x 2 over document-disjoint halves ==
        one-shot build: same postings, same consolidated df, same exact
        stats longs (avgdl by the same one division), same scores."""
        whole = Bm25Index.build(corpus)
        inc = Bm25Index.init(spark, str(tmp_path / "bm25"),
                             bucket_partitions=8)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") <= 2), 0)
        inc = inc.append_batch(corpus.filter(F.col("doc_id") > 2), 1)
        cols = ("term", "doc_id", "tf", "dl")
        self._eq(inc.postings.select(*cols), whole.postings.select(*cols))
        self._eq(inc.docfreq.select("term", "df"),
                 whole.docfreq.select("term", "df"))
        si, sw = inc.stats.first(), whole.stats.first()
        assert (si.n_docs, si.total_dl) == (sw.n_docs, sw.total_dl)
        assert si.avgdl == sw.avgdl  # bit-exact: same long/long division
        q = _queries(spark, [(10, "cat sat the")])
        assert self._tops(inc, q) == self._tops(whole, q)

    def test_replay_overwrites_not_doublecounts(self, spark, corpus,
                                                tmp_path):
        b0 = corpus.filter(F.col("doc_id") <= 2)
        idx = Bm25Index.init(spark, str(tmp_path / "bm25"),
                             bucket_partitions=8)
        once = idx.append_batch(b0, 0)
        q = _queries(spark, [(10, "cat sat")])
        before = self._tops(once, q)
        st = once.stats.first()
        # capture rows EAGERLY: `once` is a lazy view over the very
        # files the replay's overwrite replaces (a stale handle after
        # the rewrite, by design)
        rows_before = sorted(map(tuple, once.postings.collect()))
        again = once.append_batch(b0, 0)  # foreachBatch replay
        assert self._tops(again, q) == before
        st2 = again.stats.first()
        assert (st2.n_docs, st2.total_dl) == (st.n_docs, st.total_dl)
        assert sorted(map(tuple, again.postings.collect())) == rows_before

    def test_exclude_batch_hides_inflight_attempt(self, spark, corpus,
                                                  tmp_path):
        """load(exclude_batch=N) searches as of batch N's PREDECESSORS
        - what a replayed foreachBatch caller needs so its first failed
        attempt's partitions are invisible."""
        b0 = corpus.filter(F.col("doc_id") <= 2)
        b1 = corpus.filter(F.col("doc_id") > 2)
        path = str(tmp_path / "bm25")
        idx = Bm25Index.init(spark, path, bucket_partitions=8)
        idx = idx.append_batch(b0, 0)
        idx.append_batch(b1, 1)  # uncommitted first attempt
        asof = Bm25Index.load(spark, path, exclude_batch=1)
        committed = Bm25Index.init(
            spark, str(tmp_path / "ctl"), bucket_partitions=8
        ).append_batch(b0, 0)
        q = _queries(spark, [(10, "cat sat the")])
        assert self._tops(asof, q) == self._tops(committed, q)
        sa, sc = asof.stats.first(), committed.stats.first()
        assert (sa.n_docs, sa.total_dl) == (sc.n_docs, sc.total_dl)
        self._eq(asof.postings, committed.postings)
        self._eq(asof.docfreq.select("term", "df"),
                 committed.docfreq.select("term", "df"))

    def test_exclude_batch_prunes_at_scan(self, spark, corpus, tmp_path):
        """The batch exclusion is a PARTITION filter, not a row filter
        - replay hiding costs zero reads of the hidden batch."""
        from kafka_cassandra_plugin_spark import plans as P

        path = str(tmp_path / "bm25")
        idx = Bm25Index.init(spark, path, bucket_partitions=8)
        idx = idx.append_batch(corpus, 0)
        asof = Bm25Index.load(spark, path, exclude_batch=1)
        pf = P.partition_filters(asof.postings)
        assert any("batch" in f for f in pf)

    def test_compact_exclude_batch_stays_hideable(self, spark, corpus,
                                                  tmp_path):
        """compact(exclude_batch=N) folds committed predecessors into
        batch=-1 but moves batch=N through the swap verbatim, so a
        subsequent load(exclude_batch=N) still hides exactly N - the
        invariant a pre-batch compaction inside a foreachBatch replay
        depends on (the round-6 bloom replay-edge bug class)."""
        path = str(tmp_path / "bm25")
        b = [corpus.filter(F.col("doc_id") == i) for i in (1, 2, 3)]
        idx = Bm25Index.init(spark, path, bucket_partitions=8)
        idx = idx.append_batch(b[0], 0).append_batch(b[1], 1)
        idx = idx.append_batch(b[2], 2)  # the in-flight batch
        q = _queries(spark, [(10, "cat sat the dog")])
        before = self._tops(Bm25Index.load(spark, path, exclude_batch=2), q)
        idx.compact(exclude_batch=2)
        for table in ("postings", "docfreq", "stats"):
            assert _batch_names(spark, f"{path}/{table}") == \
                ["batch=-1", "batch=2"]
        after_asof = Bm25Index.load(spark, path, exclude_batch=2)
        assert self._tops(after_asof, q) == before
        # committed view: everything visible, equal to the whole build
        full = Bm25Index.load(spark, path)
        whole = Bm25Index.build(b[0].unionByName(b[1]).unionByName(b[2]))
        assert self._tops(full, q) == self._tops(whole, q)
        sf_, sw = full.stats.first(), whole.stats.first()
        assert (sf_.n_docs, sf_.total_dl) == (sw.n_docs, sw.total_dl)

    def test_compact_without_exclusion_folds_everything(self, spark,
                                                        corpus, tmp_path):
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        path = str(tmp_path / "bm25")
        idx = Bm25Index.init(spark, path, bucket_partitions=8)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") <= 2), 0)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") > 2), 1)
        q = _queries(spark, [(10, "cat sat the")])
        before = self._tops(idx, q)
        idx = idx.compact()
        for table in ("postings", "docfreq", "stats"):
            assert list_batch_ids(spark, f"{path}/{table}") == [-1]
        assert self._tops(idx, q) == before

    def test_save_onto_own_path_preserves_index(self, spark, corpus,
                                                tmp_path):
        """``Bm25Index.load(p).save(p)``: the loaded tables are LAZY
        reads of the very partitions save() replaces - a
        delete-before-write save() would destroy the files its own
        write plan reads (the r7 bloom/lm ADVICE bug class).  The
        staged-sibling swap must make this a lossless consolidation."""
        from kafka_cassandra_plugin_spark.fsutil import list_batch_ids

        path = str(tmp_path / "bm25")
        idx = Bm25Index.init(spark, path, bucket_partitions=8)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") <= 2), 0)
        idx = idx.append_batch(corpus.filter(F.col("doc_id") > 2), 1)
        q = _queries(spark, [(10, "cat sat the")])
        before = self._tops(idx, q)
        st = idx.stats.first()
        resaved = Bm25Index.load(spark, path).save(path,
                                                   bucket_partitions=8)
        assert self._tops(resaved, q) == before
        st2 = resaved.stats.first()
        assert (st2.n_docs, st2.total_dl) == (st.n_docs, st.total_dl)
        for table in ("postings", "docfreq", "stats"):
            assert list_batch_ids(spark, f"{path}/{table}") == [-1]

    def test_save_onto_stale_path_replaces_history(self, spark, corpus,
                                                   tmp_path):
        """save() to a path already holding batch=N partitions must
        REPLACE them, not merge: without the pre-write cleanup a fresh
        index saved over a previous index's path would silently union
        the stale postings into its loaded view (r6 ADVICE bug
        class)."""
        path = str(tmp_path / "bm25")
        stale = Bm25Index.init(spark, path, bucket_partitions=8)
        stale.append_batch(corpus, 0)
        fresh_docs = _docs(spark, [(9, "zebra quokka"),
                                   (10, "quokka lemur")])
        loaded = Bm25Index.build(fresh_docs).save(path)
        assert loaded.stats.first().n_docs == 2
        # the stale corpus's vocabulary is gone
        q = _queries(spark, [(1, "cat sat")])
        assert loaded.topk(q, k=4).count() == 0
        assert loaded.topk(
            _queries(spark, [(1, "quokka")]), k=4).count() == 2

    def test_init_empty_index_searches_empty(self, spark, tmp_path):
        idx = Bm25Index.init(spark, str(tmp_path / "bm25"),
                             bucket_partitions=8)
        st = idx.stats.first()
        assert (st.n_docs, st.total_dl, st.avgdl) == (0, 0, 0.0)
        q = _queries(spark, [(1, "anything")])
        assert idx.topk(q, k=4).count() == 0

    def test_append_guards(self, spark, corpus, tmp_path):
        mem = Bm25Index.build(corpus)
        with pytest.raises(ValueError, match="saved index"):
            mem.append_batch(corpus, 0)
        disk = Bm25Index.init(spark, str(tmp_path / "bm25"),
                              bucket_partitions=8)
        with pytest.raises(ValueError, match=">= 0"):
            disk.append_batch(corpus, -1)


class TestFilePruning:
    """The round-8 headline claim, gated: a loaded-index search prunes
    at FILE level - the tbucket isin filter reaches the parquet scan's
    PartitionFilters for BOTH postings and docfreq (through docfreq's
    consolidation aggregate), and bucket directories the query does not
    touch are never opened."""

    @pytest.fixture()
    def saved(self, spark, tmp_path):
        docs = _docs(spark, [
            (i, f"word{i % 40} shared{i % 5} filler{i}")
            for i in range(120)
        ])
        path = str(tmp_path / "bm25")
        return Bm25Index.build(docs).save(path, bucket_partitions=16), path

    def test_tbucket_reaches_partition_filters_both_scans(self, spark,
                                                          saved):
        from kafka_cassandra_plugin_spark import plans as P

        idx, _ = saved
        q = _queries(spark, [(1, "word3 shared2")])
        pf = P.partition_filters(idx.topk(q, k=5))
        tb = [f for f in pf if "tbucket" in f]
        # postings scan AND docfreq scan (pushed through the groupBy)
        assert len(tb) >= 2, pf

    def test_untouched_bucket_files_never_opened(self, spark, saved):
        """Behavioral proof of file-level pruning: plant a corrupt
        (non-parquet) file in every bucket directory the query does NOT
        touch.  If the scan prunes at file level the search still
        succeeds; a full scan over the same tables fails on the planted
        files."""
        import os

        idx, path = saved
        q = _queries(spark, [(1, "word3 shared2")])
        expected = {(r.doc_id, round(r.score, 9))
                    for r in idx.topk(q, k=5).collect()}
        touched = {
            r.tb for r in spark.createDataFrame(
                [("word3",), ("shared2",)], "term string"
            ).select(
                F.pmod(F.xxhash64("term"), F.lit(16)).alias("tb")
            ).collect()
        }
        planted = 0
        for table in ("postings", "docfreq"):
            base = f"{path}/{table}/batch=-1"
            for d in os.listdir(base):
                if not d.startswith("tbucket="):
                    continue
                if int(d.split("=", 1)[1]) in touched:
                    continue
                with open(f"{base}/{d}/zz_corrupt.parquet", "w") as f:
                    f.write("this is not parquet")
                planted += 1
        assert planted > 0
        fresh = Bm25Index.load(spark, path)
        got = {(r.doc_id, round(r.score, 9))
               for r in fresh.topk(q, k=5).collect()}
        assert got == expected  # pruned search never opened the plants
        with pytest.raises(Exception):
            fresh.postings.count()  # a full scan does open them
