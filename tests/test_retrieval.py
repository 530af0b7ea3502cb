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
